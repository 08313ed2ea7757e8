package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DecimalType, DoubleType, LongType}
import graft.Tables
import graft.queries.Relational.{Fn, Q}

/** Round-9 batch 27: curation forensics — once dedup/quality gates run,
  * the pipeline owner's next questions are WHO caused the duplication
  * (u28), what the chain actually saved in tokens (p33), how sources
  * differ stylistically (t41), whether embedding neighborhoods respect
  * labels (s33), and what near-dups actually differ by (d28). Each
  * composes the registered pools (d08 clusters, s10 kNN graph) rather
  * than re-deriving them.
  */
object ExtraQueries25 {

  private def docs(s: SparkSession, d: String): DataFrame = Tables.documents(s, d)

  // --------------------- u28 per-source duplication blame

  /** u28: duplication BLAME attribution — p22 reports what dedup saves
    * globally; the follow-up a pipeline owner actually asks is "which
    * source is producing the duplicates, and is it re-posting its own
    * content or mirroring someone else's?" Every non-keeper member of a
    * d08 near-dup family is charged to ITS OWN source (the doc that
    * would be dropped), split into within-source (keeper shares the
    * source — internal re-posts) and cross-source (mirroring). All 20
    * sources report, including zero-blame ones — an audit that silently
    * drops the innocent can't prove innocence.
    *
    * Exactness: BIGINT counts off the pooled exact closure; ONE rounded
    * division per source (share of total duplication, total floored at
    * 1 so a dup-free corpus reports 0.0 rather than NaN). Scale shape:
    * the cluster map explodes at the FAMILY grain (duplication-sized,
    * not corpus-sized), two id-keyed joins pin member/keeper sources,
    * one group-by source; the only corpus-wide pass is the per-source
    * doc count. */
  private val u28: Fn = (s, d) => {
    val members = DedupQueries.clusterPool(s, d)
      .select(col("cluster"), explode(split(col("members"), ",")).as("m"))
      .select(col("m").cast(LongType).as("doc_id"), col("cluster"))
      .filter(col("doc_id") =!= col("cluster"))
    val src = docs(s, d).select(col("doc_id"), col("source"))
    val blamed = members
      .join(src, Seq("doc_id"))
      .join(src.select(col("doc_id").as("cluster"), col("source").as("ksrc")), Seq("cluster"))
    val per = blamed.groupBy("source")
      .agg(count(lit(1)).as("n_dup"),
        sum(when(col("source") =!= col("ksrc"), 1L).otherwise(0L)).as("n_cross"))
    val tot = blamed.agg(count(lit(1)).as("t"))
    docs(s, d).groupBy("source").agg(count(lit(1)).as("n_docs"))
      .join(per, Seq("source"), "left")
      .crossJoin(broadcast(tot))
      .select(col("source"), col("n_docs"),
        coalesce(col("n_dup"), lit(0L)).cast(LongType).as("n_dup"),
        coalesce(col("n_cross"), lit(0L)).cast(LongType).as("n_cross"),
        round(coalesce(col("n_dup"), lit(0L)).cast(DoubleType) /
          greatest(col("t"), lit(1L)).cast(DoubleType), 4).as("dup_share"))
      .orderBy("source")
  }
  private val u28Sql =
    s"""WITH RECURSIVE ${DedupQueries.closureCtes},
       |m AS (SELECT id AS doc_id, cluster FROM comp WHERE id <> cluster),
       |blamed AS (
       |  SELECT md.source AS source, kd.source AS ksrc
       |  FROM m
       |  JOIN documents md ON m.doc_id = md.doc_id
       |  JOIN documents kd ON m.cluster = kd.doc_id),
       |per AS (
       |  SELECT source, CAST(count(*) AS BIGINT) AS n_dup,
       |         CAST(sum(CASE WHEN source <> ksrc THEN 1 ELSE 0 END) AS BIGINT) AS n_cross
       |  FROM blamed GROUP BY 1),
       |tot AS (SELECT CAST(count(*) AS BIGINT) AS t FROM blamed),
       |nd AS (SELECT source, CAST(count(*) AS BIGINT) AS n_docs FROM documents GROUP BY 1)
       |SELECT nd.source, nd.n_docs,
       |       COALESCE(p.n_dup, 0) AS n_dup,
       |       COALESCE(p.n_cross, 0) AS n_cross,
       |       round(CAST(COALESCE(p.n_dup, 0) AS DOUBLE) /
       |             CAST(greatest(t.t, 1) AS DOUBLE), 4) AS dup_share
       |FROM nd LEFT JOIN per p ON nd.source = p.source CROSS JOIN tot t
       |ORDER BY nd.source""".stripMargin

  // --------------------- p33 token-budget accounting through the chain

  /** p33: EFFECTIVE token accounting — "we crawled N tokens" is the
    * vanity number; what a training run can actually consume is what
    * survives the dedup chain, and the budget review wants that per
    * source: raw tokens → after exact dedup (d01 keepers) → after
    * near-dup dedup (d08 keepers on top), with the kept fraction. The
    * chain order is the production one: exact first (cheap hash),
    * near-dup on the survivors; the min-id keeper discipline of both
    * stages makes the composition well-defined (a family's keeper
    * always survives the earlier stage too).
    *
    * Exactness: BIGINT token counts (whitespace tokens — the t01
    * convention), ONE rounded division per source. Scale shape: one
    * corpus pass builds (doc, tokens, exact-keeper flag) with a
    * hash-keyed min window (family-sized partitions); the near-dup
    * flag is a LEFT join against the family-grain cluster map; one
    * group-by source closes it. */
  private val p33: Fn = (s, d) => {
    val wf = Window.partitionBy("fh")
    val base = docs(s, d)
      .select(col("doc_id"), col("source"),
        size(split(col("text"), " ")).cast(LongType).as("n_toks"),
        md5(col("text")).as("fh"))
      .withColumn("exact_keeper", col("doc_id") === min(col("doc_id")).over(wf))
    val members = DedupQueries.clusterPool(s, d)
      .select(col("cluster"), explode(split(col("members"), ",")).as("m"))
      .select(col("m").cast(LongType).as("doc_id"), col("cluster"))
    base.join(members, Seq("doc_id"), "left")
      .withColumn("near_keeper", col("cluster").isNull || col("doc_id") === col("cluster"))
      .groupBy("source")
      .agg(
        sum(col("n_toks")).cast(LongType).as("tokens_raw"),
        sum(when(col("exact_keeper"), col("n_toks")).otherwise(0L)).cast(LongType)
          .as("tokens_exact"),
        sum(when(col("exact_keeper") && col("near_keeper"), col("n_toks")).otherwise(0L))
          .cast(LongType).as("tokens_near"))
      .withColumn("pct_kept",
        round(col("tokens_near").cast(DoubleType) / col("tokens_raw").cast(DoubleType), 4))
      .orderBy("source")
  }
  private val p33Sql =
    s"""WITH RECURSIVE ${DedupQueries.closureCtes},
       |base AS (
       |  SELECT doc_id, source,
       |         CAST(len(string_split(text, ' ')) AS BIGINT) AS n_toks,
       |         (doc_id = min(doc_id) OVER (PARTITION BY md5(text))) AS exact_keeper
       |  FROM documents),
       |flagged AS (
       |  SELECT b.*, (c.id IS NULL OR b.doc_id = c.cluster) AS near_keeper
       |  FROM base b LEFT JOIN comp c ON b.doc_id = c.id)
       |SELECT source,
       |       CAST(sum(n_toks) AS BIGINT) AS tokens_raw,
       |       CAST(sum(CASE WHEN exact_keeper THEN n_toks ELSE 0 END) AS BIGINT) AS tokens_exact,
       |       CAST(sum(CASE WHEN exact_keeper AND near_keeper THEN n_toks ELSE 0 END) AS BIGINT) AS tokens_near,
       |       round(CAST(sum(CASE WHEN exact_keeper AND near_keeper THEN n_toks ELSE 0 END) AS DOUBLE) /
       |             CAST(sum(n_toks) AS DOUBLE), 4) AS pct_kept
       |FROM flagged
       |GROUP BY source
       |ORDER BY source""".stripMargin

  // --------------------- t41 stylometric source fingerprint

  /** Corpus-global top tokens that serve as the function-word basis. */
  val StyleF = 10

  /** t41: stylometric source fingerprint — authorship analysis's oldest
    * robust signal is FUNCTION-WORD frequency (content words track
    * topic; function words track the generator), and for a training
    * corpus the same vector answers "which sources are the same
    * generator/pipeline in disguise?" — mirrored sites, templated
    * farms, and shared scrapers show up as near-identical profiles.
    * Basis = the corpus-global top-[[StyleF]] tokens (frequency desc,
    * token asc — deterministic); each source's fingerprint is its count
    * vector over that basis; output = all source-pair cosines.
    *
    * Exactness: the cosine numerator is a BIGINT dot product and each
    * norm a BIGINT sum of squares, so the only float ops are one sqrt
    * of an exact product and one division, rounded once — IEEE-
    * identical (squared sums stay far under 2^53 at every SF). Scale
    * shape: one tokenize pass, the basis is an Aggregate+Limit
    * broadcast, counts collapse to (source × ≤F) rows, and the pair
    * join runs on that tiny relation — sources², never the corpus. */
  private val t41: Fn = (s, d) => {
    val toks = docs(s, d)
      .select(col("source"), explode(split(col("text"), " ")).as("tok"))
    val basis = toks.groupBy("tok").agg(count(lit(1)).as("c"))
      .orderBy(desc("c"), col("tok")).limit(StyleF).select("tok")
    val cnt = toks.join(broadcast(basis), Seq("tok"))
      .groupBy("source", "tok").agg(count(lit(1)).as("c"))
    // dec-lift (overflow lint): per-token count products fit in long;
    // the vocabulary-wide sums accumulate in DECIMAL(38,0)
    val norms = cnt.groupBy("source")
      .agg(sum((col("c") * col("c")).cast(DecimalType(38, 0))).cast(LongType).as("nrm"))
    val a = cnt.select(col("source").as("src_a"), col("tok"), col("c").as("ca"))
    val b = cnt.select(col("source").as("src_b"), col("tok"), col("c").as("cb"))
    a.join(b, Seq("tok")).filter(col("src_a") < col("src_b"))
      .groupBy("src_a", "src_b")
      .agg(sum((col("ca") * col("cb")).cast(DecimalType(38, 0))).cast(LongType).as("num"))
      .join(norms.select(col("source").as("src_a"), col("nrm").as("na")), Seq("src_a"))
      .join(norms.select(col("source").as("src_b"), col("nrm").as("nb")), Seq("src_b"))
      .select(col("src_a"), col("src_b"),
        round(col("num").cast(DoubleType) /
          sqrt((col("na") * col("nb")).cast(DoubleType)), 4).as("style_cos"))
      .orderBy("src_a", "src_b")
  }
  private val t41Sql =
    s"""WITH toks AS (
       |  SELECT source, unnest(string_split(text, ' ')) AS tok FROM documents),
       |basis AS (
       |  SELECT tok FROM (
       |    SELECT tok, count(*) AS c FROM toks GROUP BY 1
       |    ORDER BY c DESC, tok LIMIT $StyleF)),
       |cnt AS (
       |  SELECT t.source, t.tok, CAST(count(*) AS BIGINT) AS c
       |  FROM toks t JOIN basis b ON t.tok = b.tok
       |  GROUP BY 1, 2),
       |norms AS (SELECT source, CAST(sum(c * c) AS BIGINT) AS nrm FROM cnt GROUP BY 1),
       |pairs AS (
       |  SELECT a.source AS src_a, b.source AS src_b, CAST(sum(a.c * b.c) AS BIGINT) AS num
       |  FROM cnt a JOIN cnt b ON a.tok = b.tok AND a.source < b.source
       |  GROUP BY 1, 2)
       |SELECT p.src_a, p.src_b,
       |       round(CAST(p.num AS DOUBLE) / sqrt(CAST(na.nrm * nb.nrm AS DOUBLE)), 4) AS style_cos
       |FROM pairs p
       |JOIN norms na ON na.source = p.src_a
       |JOIN norms nb ON nb.source = p.src_b
       |ORDER BY p.src_a, p.src_b""".stripMargin

  // --------------------- s33 kNN label purity

  /** s33: embedding-space LABEL purity — before trusting an embedding
    * column for semantic dedup (d11) or kNN classification (s14), the
    * QA question is whether neighborhoods respect labels AT ALL: per
    * label, the pooled fraction of kNN edges that stay inside the
    * label, with the per-vector extremes. Low purity for one label
    * means its region of the space is entangled — exactly the labels
    * whose near-dup verdicts and votes (s14) should not be trusted.
    *
    * Exactness: everything is BIGINT edge counting over the pooled
    * 4dp-exact s10 graph; the pooled purity is ONE rounded division of
    * exact sums (never an average of per-vector doubles, whose
    * summation order would be engine-dependent); min/max per-vector
    * purity are order-free over exact doubles. Scale shape: the K·n
    * edge list joins the label column twice (id-keyed), one vector-
    * grain aggregate, one label-grain close — never touches vectors. */
  private val s33: Fn = (s, d) => {
    val lab = Tables.embeddings(s, d).select(col("vec_id"), col("label"))
    val edges = SimilarityQueries.knnPool(s, d)
      .join(lab.select(col("vec_id").as("a_id"), col("label").as("la")), Seq("a_id"))
      .join(lab.select(col("vec_id").as("b_id"), col("label").as("lb")), Seq("b_id"))
    val perVec = edges.groupBy("a_id", "la")
      .agg(count(lit(1)).as("deg"),
        sum(when(col("la") === col("lb"), 1L).otherwise(0L)).as("same"))
      .withColumn("purity", col("same").cast(DoubleType) / col("deg").cast(DoubleType))
    perVec.groupBy(col("la").as("label"))
      .agg(count(lit(1)).cast(LongType).as("n_vecs"),
        round(sum(col("same")).cast(DoubleType) / sum(col("deg")).cast(DoubleType), 4)
          .as("pooled_purity"),
        round(min(col("purity")), 4).as("min_purity"),
        round(max(col("purity")), 4).as("max_purity"))
      .orderBy("label")
  }
  private val s33Sql =
    s"""WITH knn AS (SELECT * FROM (${SimilarityQueries.s10Sql}) t),
       |edges AS (
       |  SELECT k.a_id, ea.label AS la, eb.label AS lb
       |  FROM knn k
       |  JOIN embeddings ea ON k.a_id = ea.vec_id
       |  JOIN embeddings eb ON k.b_id = eb.vec_id),
       |pv AS (
       |  SELECT a_id, la,
       |         CAST(count(*) AS BIGINT) AS deg,
       |         CAST(sum(CASE WHEN la = lb THEN 1 ELSE 0 END) AS BIGINT) AS same
       |  FROM edges GROUP BY 1, 2)
       |SELECT la AS label,
       |       CAST(count(*) AS BIGINT) AS n_vecs,
       |       round(CAST(sum(same) AS DOUBLE) / CAST(sum(deg) AS DOUBLE), 4) AS pooled_purity,
       |       round(min(CAST(same AS DOUBLE) / CAST(deg AS DOUBLE)), 4) AS min_purity,
       |       round(max(CAST(same AS DOUBLE) / CAST(deg AS DOUBLE)), 4) AS max_purity
       |FROM pv
       |GROUP BY la
       |ORDER BY la""".stripMargin

  // --------------------- d28 near-dup variance profile

  /** d28: what near-dups actually DIFFER by — dedup thresholds get
    * tuned blind unless someone inspects the families: for every
    * non-keeper member of a d08 family, the token-multiset distance to
    * its keeper (shared tokens counted with multiplicity, the diff =
    * union − intersection, ratio = diff/union). Families at ratio ≈ 0
    * are exact re-posts the cheaper d01 should have caught upstream;
    * families near the threshold are the ones a tighter threshold
    * would split — this table is the evidence either way.
    *
    * Exactness: multiset intersection = Σ_tok min(count_member,
    * count_keeper) — pure BIGINT; one rounded division per pair.
    * Scale shape: token counts are computed ONLY for docs that appear
    * in some family (semi-join first — duplication-sized, not
    * corpus-sized), and the intersection join runs per (member,
    * keeper) pair on token keys bounded by doc length. */
  private val d28: Fn = (s, d) => {
    val pairs = DedupQueries.clusterPool(s, d)
      .select(col("cluster"), explode(split(col("members"), ",")).as("m"))
      .select(col("m").cast(LongType).as("doc_id"), col("cluster"))
      .filter(col("doc_id") =!= col("cluster"))
    val inFamily = pairs.select(col("doc_id"))
      .union(pairs.select(col("cluster"))).distinct()
    val cnts = docs(s, d)
      .join(inFamily, Seq("doc_id")) // semi-shape: only family docs tokenize
      .select(col("doc_id"), explode(split(col("text"), " ")).as("tok"))
      .groupBy("doc_id", "tok").agg(count(lit(1)).as("c"))
    val sizes = cnts.groupBy("doc_id").agg(sum(col("c")).cast(LongType).as("n"))
    val inter = pairs
      .join(cnts.select(col("doc_id"), col("tok"), col("c").as("cm")), Seq("doc_id"))
      .join(cnts.select(col("doc_id").as("cluster"), col("tok"), col("c").as("ck")),
        Seq("cluster", "tok"))
      .groupBy("doc_id", "cluster")
      .agg(sum(least(col("cm"), col("ck"))).cast(LongType).as("inter"))
    pairs
      .join(sizes.select(col("doc_id"), col("n").as("n_member")), Seq("doc_id"))
      .join(sizes.select(col("doc_id").as("cluster"), col("n").as("n_keeper")), Seq("cluster"))
      .join(inter, Seq("doc_id", "cluster"), "left")
      .withColumn("inter", coalesce(col("inter"), lit(0L)))
      .withColumn("union_toks", col("n_member") + col("n_keeper") - col("inter"))
      .select(col("doc_id"), col("cluster").as("keeper"),
        col("n_member"), col("n_keeper"),
        (col("union_toks") - col("inter")).cast(LongType).as("diff_toks"),
        round((col("union_toks") - col("inter")).cast(DoubleType) /
          greatest(col("union_toks"), lit(1L)).cast(DoubleType), 4).as("diff_ratio"))
      .orderBy("doc_id")
  }
  private val d28Sql =
    s"""WITH RECURSIVE ${DedupQueries.closureCtes},
       |prs AS (SELECT id AS doc_id, cluster FROM comp WHERE id <> cluster),
       |fam AS (SELECT doc_id FROM prs UNION SELECT cluster FROM prs),
       |cnts AS (
       |  SELECT d.doc_id, tok, CAST(count(*) AS BIGINT) AS c
       |  FROM (SELECT doc_id, unnest(string_split(text, ' ')) AS tok
       |        FROM documents WHERE doc_id IN (SELECT doc_id FROM fam)) d
       |  GROUP BY 1, 2),
       |dsz AS (SELECT doc_id, CAST(sum(c) AS BIGINT) AS n FROM cnts GROUP BY 1),
       |pint AS (
       |  SELECT p.doc_id, p.cluster, CAST(sum(least(cm.c, ck.c)) AS BIGINT) AS inter
       |  FROM prs p
       |  JOIN cnts cm ON cm.doc_id = p.doc_id
       |  JOIN cnts ck ON ck.doc_id = p.cluster AND ck.tok = cm.tok
       |  GROUP BY 1, 2)
       |SELECT p.doc_id, p.cluster AS keeper,
       |       sm.n AS n_member, sk.n AS n_keeper,
       |       CAST(sm.n + sk.n - 2 * COALESCE(i.inter, 0) AS BIGINT) AS diff_toks,
       |       round(CAST(sm.n + sk.n - 2 * COALESCE(i.inter, 0) AS DOUBLE) /
       |             CAST(greatest(sm.n + sk.n - COALESCE(i.inter, 0), 1) AS DOUBLE), 4) AS diff_ratio
       |FROM prs p
       |JOIN dsz sm ON sm.doc_id = p.doc_id
       |JOIN dsz sk ON sk.doc_id = p.cluster
       |LEFT JOIN pint i ON i.doc_id = p.doc_id AND i.cluster = p.cluster
       |ORDER BY p.doc_id""".stripMargin

  val all: Seq[Q] = Seq(
    Q("u28_dedup_blame", u28, Some(u28Sql)),
    Q("p33_token_accounting", p33, Some(p33Sql)),
    Q("t41_style_fingerprint", t41, Some(t41Sql)),
    Q("s33_label_purity", s33, Some(s33Sql)),
    Q("d28_neardup_variance", d28, Some(d28Sql)))
}
