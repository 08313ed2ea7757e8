package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DecimalType, DoubleType, LongType}
import graft.Tables
import graft.functions.VectorOps
import graft.queries.Relational.{Fn, Q}

/** Round-9 batch 30: trend/validity/audit closers — the nonparametric
  * trend TEST that pairs with r119's robust slope (is the trend real,
  * not just how steep), the Davies–Bouldin validity index that closes
  * the IVF tuning loop (s35 asks "how good is each C", this scores the
  * shipped codebook), the fingerprint-width audit every hash-keyed
  * dedup design implicitly assumes, shard-stability QA on token ranks,
  * and the funnel drop-attribution report a 100-TB curation pipeline
  * debugs with.
  */
object ExtraQueries28 {

  private def docs(s: SparkSession, d: String): DataFrame = Tables.documents(s, d)

  // --------------------- r125 Mann–Kendall trend test

  /** r125: Mann–Kendall trend test per event type over the daily count
    * series — r119's companion: Theil–Sen gives the robust slope, MK
    * gives the distribution-free SIGNIFICANCE (S = Σ sign over ordered
    * pairs, tie-corrected variance, continuity-corrected Z). The pair a
    * monitoring stack ships together: "volume is drifting" needs both a
    * magnitude and a p-line.
    *
    * Exactness: S, n, and the tie term Σt(t−1)(2t+5) are BIGINT; the
    * variance NUMERATOR n(n−1)(2n+5) − ties is published as an exact
    * integer column; Z is ONE double division + sqrt of exact operands
    * (÷18 folded into the numerator double — IEEE-identical on both
    * engines), rounded 4dp. Scale shape: the pair relation is the r119
    * class — C(days,2) per type, calendar-bounded squared, never
    * corpus-sized; ties and S reduce at the (type, day-count) grain. */
  private val r125: Fn = (s, d) => {
    val daily = Tables.events(s, d)
      .groupBy(col("event_type"), to_date(col("ts")).as("day"))
      .agg(count(lit(1)).as("c"))
    val a = daily.select(col("event_type"), col("day").as("day_a"), col("c").as("c_a"))
    val b = daily.select(col("event_type").as("et_b"), col("day").as("day_b"), col("c").as("c_b"))
    val sRel = a.join(b, col("event_type") === col("et_b") && col("day_a") < col("day_b"))
      .groupBy("event_type")
      .agg(sum(when(col("c_b") > col("c_a"), 1L)
        .when(col("c_b") < col("c_a"), -1L).otherwise(0L)).cast(LongType).as("s_stat"))
    val ties = daily.groupBy("event_type", "c").agg(count(lit(1)).as("t"))
      .groupBy("event_type")
      .agg(sum(col("t")).cast(LongType).as("n_days"),
        // dec-lift (overflow lint): one tie group's cubic term fits in
        // long; the tie-domain sum accumulates in DECIMAL(38,0)
        sum((col("t") * (col("t") - 1) * (lit(2L) * col("t") + 5))
          .cast(DecimalType(38, 0))).cast(LongType).as("tie_term"))
      .withColumn("var_num",
        col("n_days") * (col("n_days") - 1) * (lit(2L) * col("n_days") + 5) - col("tie_term"))
    sRel.join(ties, Seq("event_type"))
      .withColumn("z", round(
        when(col("s_stat") > 0,
          (col("s_stat") - 1).cast(DoubleType) / sqrt(col("var_num").cast(DoubleType) / 18.0))
          .when(col("s_stat") < 0,
            (col("s_stat") + 1).cast(DoubleType) / sqrt(col("var_num").cast(DoubleType) / 18.0))
          .otherwise(lit(0.0)), 4))
      .select("event_type", "n_days", "s_stat", "var_num", "z")
      .orderBy("event_type")
  }
  private val r125Sql =
    """WITH daily AS (
      |  SELECT event_type, CAST(ts AS DATE) AS day, CAST(count(*) AS BIGINT) AS c
      |  FROM events GROUP BY 1, 2),
      |srel AS (
      |  SELECT a.event_type,
      |         CAST(sum(CASE WHEN b.c > a.c THEN 1 WHEN b.c < a.c THEN -1 ELSE 0 END) AS BIGINT) AS s_stat
      |  FROM daily a JOIN daily b
      |    ON a.event_type = b.event_type AND a.day < b.day
      |  GROUP BY 1),
      |ties AS (
      |  SELECT event_type, CAST(sum(t) AS BIGINT) AS n_days,
      |         CAST(sum(t * (t - 1) * (2 * t + 5)) AS BIGINT) AS tie_term
      |  FROM (SELECT event_type, c, CAST(count(*) AS BIGINT) AS t FROM daily GROUP BY 1, 2) g
      |  GROUP BY 1)
      |SELECT s.event_type, t.n_days, s.s_stat,
      |       t.n_days * (t.n_days - 1) * (2 * t.n_days + 5) - t.tie_term AS var_num,
      |       round(CASE
      |         WHEN s.s_stat > 0 THEN CAST(s.s_stat - 1 AS DOUBLE) /
      |           sqrt(CAST(t.n_days * (t.n_days - 1) * (2 * t.n_days + 5) - t.tie_term AS DOUBLE) / 18.0)
      |         WHEN s.s_stat < 0 THEN CAST(s.s_stat + 1 AS DOUBLE) /
      |           sqrt(CAST(t.n_days * (t.n_days - 1) * (2 * t.n_days + 5) - t.tie_term AS DOUBLE) / 18.0)
      |         ELSE 0.0 END, 4) AS z
      |FROM srel s JOIN ties t ON s.event_type = t.event_type
      |ORDER BY s.event_type""".stripMargin

  // --------------------- s36 Davies–Bouldin validity index

  /** s36: Davies–Bouldin validity report for the shipped C=8 IVF
    * codebook (the s34 cells verbatim) — the standard "is this
    * clustering any good" score: per cell its intra-spread S_i (mean
    * cosine distance to the seed) and its WORST separation ratio
    * max_j (S_i+S_j)/M_ij over other cells, with the offending partner
    * named. s35 sweeps C, s34 plans maintenance, this grades the
    * result — low terms mean tight, well-separated cells; the mean of
    * the term column is the textbook DB index.
    *
    * Exactness: distances live on the 4dp micro-int grid (d = 10⁴ −
    * round(sim·10⁴), BIGINT); each ratio is the exact integer rational
    * (ssum_i·n_j + ssum_j·n_i) / (n_i·n_j·m_ij) evaluated in ONE double
    * division and rounded 4dp BEFORE the argmax ordering, so both
    * engines rank identical values (partner id breaks 4dp ties).
    * Scale shape: assignment is the s03 map-only broadcast rank; the
    * ratio relation is C² rows — constant next to the corpus. */
  private val s36: Fn = (s, d) => {
    val C = 8
    val e = Tables.embeddings(s, d)
    val seeds = e.orderBy("vec_id").limit(C)
      .select(col("vec_id").as("seed_id"), col("embedding").as("sv"))
    val assign = e.crossJoin(broadcast(seeds))
      .withColumn("csim", round(VectorOps.cosine(col("embedding"), col("sv")), 4))
      .withColumn("ark", row_number().over(
        Window.partitionBy("vec_id").orderBy(desc("csim"), col("seed_id"))))
      .filter(col("ark") === 1)
      .withColumn("dmicro", lit(10000L) - round(col("csim") * 10000).cast(LongType))
    val intra = assign.groupBy(col("seed_id").as("cell"))
      .agg(count(lit(1)).cast(LongType).as("n"), sum(col("dmicro")).cast(LongType).as("ssum"))
    val pairs = seeds.select(col("seed_id").as("cell"), col("sv").as("v1"))
      .join(seeds.select(col("seed_id").as("partner_cell"), col("sv").as("v2")),
        col("cell") =!= col("partner_cell"))
      .withColumn("m", greatest(
        lit(10000L) - round(round(VectorOps.cosine(col("v1"), col("v2")), 4) * 10000)
          .cast(LongType), lit(1L)))
      .select("cell", "partner_cell", "m")
    val ratios = pairs
      .join(intra.select(col("cell"), col("n").as("n_i"), col("ssum").as("s_i")), Seq("cell"))
      .join(intra.select(col("cell").as("partner_cell"), col("n").as("n_j"),
        col("ssum").as("s_j")), Seq("partner_cell"))
      .withColumn("ratio", round(
        (col("s_i") * col("n_j") + col("s_j") * col("n_i")).cast(DoubleType) /
          (col("n_i") * col("n_j") * col("m")).cast(DoubleType), 4))
    ratios.withColumn("wrk", row_number().over(
        Window.partitionBy("cell").orderBy(desc("ratio"), col("partner_cell"))))
      .filter(col("wrk") === 1)
      .select(col("cell"), col("n_i").as("n"),
        round(col("s_i").cast(DoubleType) / (col("n_i") * 10000).cast(DoubleType), 4)
          .as("mean_intra"),
        col("partner_cell").as("worst_partner"), col("ratio").as("db_term"))
      .orderBy("cell")
  }
  private val s36Sql = {
    val cos = (x: String, y: String) =>
      s"round(list_dot_product($x::DOUBLE[], $y::DOUBLE[]) / " +
        s"sqrt(list_dot_product($x::DOUBLE[], $x::DOUBLE[]) * " +
        s"list_dot_product($y::DOUBLE[], $y::DOUBLE[])), 4)"
    s"""WITH seeds AS (
       |  SELECT vec_id AS seed_id, embedding AS sv FROM embeddings ORDER BY vec_id LIMIT 8),
       |assign AS (
       |  SELECT vec_id, seed_id, 10000 - CAST(round(csim * 10000) AS BIGINT) AS dmicro FROM (
       |    SELECT e.vec_id, s.seed_id, ${cos("e.embedding", "s.sv")} AS csim,
       |           row_number() OVER (PARTITION BY e.vec_id
       |             ORDER BY ${cos("e.embedding", "s.sv")} DESC, s.seed_id) AS ark
       |    FROM embeddings e CROSS JOIN seeds s) t
       |  WHERE ark = 1),
       |intra AS (
       |  SELECT seed_id AS cell, CAST(count(*) AS BIGINT) AS n,
       |         CAST(sum(dmicro) AS BIGINT) AS ssum
       |  FROM assign GROUP BY 1),
       |pairs AS (
       |  SELECT a.seed_id AS cell, b.seed_id AS partner_cell,
       |         greatest(10000 - CAST(round(${cos("a.sv", "b.sv")} * 10000) AS BIGINT), 1) AS m
       |  FROM seeds a JOIN seeds b ON a.seed_id <> b.seed_id),
       |ratios AS (
       |  SELECT p.cell, p.partner_cell, i.n AS n_i, i.ssum AS s_i,
       |         round(CAST(i.ssum * j.n + j.ssum * i.n AS DOUBLE) /
       |               CAST(i.n * j.n * p.m AS DOUBLE), 4) AS ratio
       |  FROM pairs p
       |  JOIN intra i ON p.cell = i.cell
       |  JOIN intra j ON p.partner_cell = j.cell)
       |SELECT cell, n_i AS n,
       |       round(CAST(s_i AS DOUBLE) / CAST(n_i * 10000 AS DOUBLE), 4) AS mean_intra,
       |       partner_cell AS worst_partner, ratio AS db_term
       |FROM (
       |  SELECT *, row_number() OVER (PARTITION BY cell
       |    ORDER BY ratio DESC, partner_cell) AS wrk
       |  FROM ratios) t
       |WHERE wrk = 1
       |ORDER BY cell""".stripMargin
  }

  // --------------------- u31 fingerprint-width audit

  val HashWidths: Seq[Int] = Seq(4, 6, 8)

  /** u31: fingerprint-WIDTH audit — every hash-keyed design in this
    * registry (d01 exact families, d26 horizon prefixes, the p01 coin
    * discipline) implicitly assumes its digest slice is wide enough
    * that accidental collisions are negligible next to true matches;
    * this measures it. Over the DISTINCT texts (so real duplicates
    * can't masquerade as hash collisions): per candidate prefix width,
    * observed collisions (n − distinct prefixes) vs the birthday
    * expectation C(n,2)/16^w, and their ratio — a ratio ≫ 1 means the
    * slice (or the hash) is biased, ≈ 1 means the width budget is
    * spent exactly as theory prices it.
    *
    * Exactness: n / distinct-prefix / collision counts are BIGINT; the
    * expectation is ONE double expression over exact integers (16^w is
    * dyadic — exact in double), rounded 8dp for display; the ratio
    * divides the BIGINT observed by the UNROUNDED expectation, 4dp.
    * Scale shape: one distinct at the text grain (hash-keyed shuffle),
    * one explode×|widths|, then width-grain distinct aggregates — no
    * pair relation anywhere (the audit prices pairs without building
    * them). */
  private val u31: Fn = (s, d) => {
    val dtexts = docs(s, d).select(col("text")).distinct()
    dtexts
      .withColumn("w", explode(array(HashWidths.map(lit): _*)))
      .select(col("w"), expr("substring(md5(text), 1, w)").as("p"))
      .groupBy("w")
      .agg(count(lit(1)).cast(LongType).as("n_texts"),
        countDistinct(col("p")).cast(LongType).as("n_prefixes"))
      .withColumn("collisions", col("n_texts") - col("n_prefixes"))
      .withColumn("eraw",
        (col("n_texts") * (col("n_texts") - 1)).cast(DoubleType) / 2.0 /
          pow(lit(16.0), col("w")))
      .select(col("w").as("width"), col("n_texts"), col("n_prefixes"), col("collisions"),
        round(col("eraw"), 8).as("expected_collisions"),
        round(col("collisions").cast(DoubleType) / col("eraw"), 4).as("excess_ratio"))
      .orderBy("width")
  }
  private val u31Sql = {
    val ws = HashWidths.mkString(", ")
    s"""WITH dt AS (SELECT DISTINCT text FROM documents),
       |per AS (
       |  SELECT w.w AS width, CAST(count(*) AS BIGINT) AS n_texts,
       |         CAST(count(DISTINCT substring(md5(dt.text), 1, w.w)) AS BIGINT) AS n_prefixes
       |  FROM dt CROSS JOIN (SELECT unnest(ARRAY[$ws]) AS w) w
       |  GROUP BY 1)
       |SELECT width, n_texts, n_prefixes, n_texts - n_prefixes AS collisions,
       |       round(CAST(n_texts * (n_texts - 1) AS DOUBLE) / 2.0 / power(16.0, width), 8)
       |         AS expected_collisions,
       |       round(CAST(n_texts - n_prefixes AS DOUBLE) /
       |             (CAST(n_texts * (n_texts - 1) AS DOUBLE) / 2.0 / power(16.0, width)), 4)
       |         AS excess_ratio
       |FROM per
       |ORDER BY width""".stripMargin
  }

  // --------------------- t42 token rank drift across corpus halves

  val DriftKs: Seq[Int] = Seq(10, 20)

  /** t42: token-rank DRIFT between two deterministic corpus halves
    * (doc_id parity — any engine-portable split works) — the shard
    * stability QA behind every "train on shard 0, validate on shard 1"
    * assumption: if the top-K token ranks disagree across halves, the
    * shards are not exchangeable and frequency-derived features (t04
    * tf-idf, t14 logprobs) won't transfer. Per K: the top-K overlap,
    * its Jaccard, and Spearman's footrule Σ|rank₁−rank₂| over the
    * common tokens (0 = identical orderings).
    *
    * Exactness: ranks are row_number over exact counts (token breaks
    * ties), footrule is a BIGINT sum, Jaccard is ONE rounded division.
    * Scale shape: the word-count shuffle (map-side partial agg) at the
    * (half, token) grain, a 2K-row rank relation after the per-half
    * top-K windows, then a K-grain close — the corpus is touched
    * once. */
  private val t42: Fn = (s, d) => {
    val maxK = DriftKs.max
    val ranked = docs(s, d)
      .select(pmod(col("doc_id"), lit(2)).cast(LongType).as("half"),
        explode(split(col("text"), " ")).as("token"))
      .groupBy("half", "token").agg(count(lit(1)).as("n"))
      .withColumn("rk", row_number().over(
        Window.partitionBy("half").orderBy(desc("n"), col("token"))).cast(LongType))
      .filter(col("rk") <= maxK)
    val a = ranked.filter(col("half") === 0).select(col("token"), col("rk").as("rk0"))
    val b = ranked.filter(col("half") === 1).select(col("token"), col("rk").as("rk1"))
    a.join(b, Seq("token"))
      .withColumn("k", explode(array(DriftKs.map(lit): _*)))
      .filter(col("rk0") <= col("k") && col("rk1") <= col("k"))
      .groupBy("k")
      .agg(count(lit(1)).cast(LongType).as("n_common"),
        sum(abs(col("rk0") - col("rk1"))).cast(LongType).as("footrule"))
      .withColumn("jaccard", round(
        col("n_common").cast(DoubleType) /
          (lit(2.0) * col("k") - col("n_common").cast(DoubleType)), 4))
      .select("k", "n_common", "jaccard", "footrule")
      .orderBy("k")
  }
  private val t42Sql = {
    val maxK = DriftKs.max
    val ks = DriftKs.mkString(", ")
    s"""WITH ranked AS (
       |  SELECT half, token, row_number() OVER (PARTITION BY half ORDER BY n DESC, token) AS rk
       |  FROM (
       |    SELECT half, token, count(*) AS n FROM (
       |      SELECT doc_id % 2 AS half, unnest(string_split(text, ' ')) AS token
       |      FROM documents) u
       |    GROUP BY 1, 2) c
       |  QUALIFY rk <= $maxK),
       |j AS (
       |  SELECT a.token, a.rk AS rk0, b.rk AS rk1
       |  FROM ranked a JOIN ranked b ON a.token = b.token
       |  WHERE a.half = 0 AND b.half = 1)
       |SELECT k.k, CAST(count(*) AS BIGINT) AS n_common,
       |       round(CAST(count(*) AS DOUBLE) / (2.0 * k.k - CAST(count(*) AS DOUBLE)), 4) AS jaccard,
       |       CAST(sum(abs(rk0 - rk1)) AS BIGINT) AS footrule
       |FROM j CROSS JOIN (SELECT unnest(ARRAY[$ks]) AS k) k
       |WHERE rk0 <= k.k AND rk1 <= k.k
       |GROUP BY k.k
       |ORDER BY k.k""".stripMargin
  }

  // --------------------- p36 funnel drop attribution

  val MinChars = 150
  val SourceCap = 16
  val ContamToken = "dup"

  /** p36: funnel drop ATTRIBUTION — when a curation pipeline (quality
    * gate → exact dedup → contamination screen → per-source cap) emits
    * fewer docs than expected, the first question is WHERE each loss
    * happened; this report answers it with first-failing-stage
    * attribution per source: every doc is labeled quality / dup /
    * contam / cap / kept by the FIRST stage that would drop it, with
    * later stages evaluated only on survivors (the cap ranks over
    * post-screen rows, exactly as the serial pipeline would see them).
    * Constants are chosen so every arm BINDS at every SF (a funnel
    * stage that never fires is compiled, not graded).
    *
    * Exactness: all flags are integer/string predicates; counts are
    * BIGINT; no floating point anywhere. Scale shape: one dup-family
    * window (hash-keyed, the d01 class), one source-partitioned
    * running-count window that computes the conditional survivor rank
    * WITHOUT a self-join, then a (source × stage)-grain close. */
  private val p36: Fn = (s, d) => {
    val wDup = Window.partitionBy("h").orderBy("doc_id")
    val wSrc = Window.partitionBy("source").orderBy("doc_id")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    docs(s, d)
      .select(col("doc_id"), col("source"), col("n_chars"), col("text"))
      .withColumn("h", md5(substring(col("text"), 1, 100)))
      .withColumn("duprk", row_number().over(wDup))
      .withColumn("s1", col("n_chars") < MinChars)
      .withColumn("s3", col("text").contains(ContamToken))
      .withColumn("surv", !col("s1") && col("duprk") === 1 && !col("s3"))
      .withColumn("cap_pos", sum(when(col("surv"), 1L).otherwise(0L)).over(wSrc))
      .withColumn("first_drop",
        when(col("s1"), "quality")
          .when(col("duprk") > 1, "dup")
          .when(col("s3"), "contam")
          .when(col("cap_pos") > SourceCap, "cap")
          .otherwise("kept"))
      .groupBy("source", "first_drop")
      .agg(count(lit(1)).cast(LongType).as("n"))
      .orderBy("source", "first_drop")
  }
  private val p36Sql =
    s"""WITH base AS (
       |  SELECT doc_id, source, n_chars, text,
       |         row_number() OVER (PARTITION BY md5(substring(text, 1, 100))
       |                            ORDER BY doc_id) AS duprk
       |  FROM documents),
       |flagged AS (
       |  SELECT doc_id, source,
       |         n_chars < $MinChars AS s1, duprk,
       |         text LIKE '%$ContamToken%' AS s3,
       |         (n_chars >= $MinChars AND duprk = 1 AND text NOT LIKE '%$ContamToken%') AS surv
       |  FROM base),
       |pos AS (
       |  SELECT *, sum(CASE WHEN surv THEN 1 ELSE 0 END)
       |              OVER (PARTITION BY source ORDER BY doc_id
       |                    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cap_pos
       |  FROM flagged)
       |SELECT source,
       |       CASE WHEN s1 THEN 'quality'
       |            WHEN duprk > 1 THEN 'dup'
       |            WHEN s3 THEN 'contam'
       |            WHEN cap_pos > $SourceCap THEN 'cap'
       |            ELSE 'kept' END AS first_drop,
       |       CAST(count(*) AS BIGINT) AS n
       |FROM pos
       |GROUP BY 1, 2
       |ORDER BY source, first_drop""".stripMargin

  val all: Seq[Q] = Seq(
    Q("r125_mann_kendall", r125, Some(r125Sql)),
    Q("s36_davies_bouldin", s36, Some(s36Sql)),
    Q("u31_hash_width_audit", u31, Some(u31Sql)),
    Q("t42_token_rank_drift", t42, Some(t42Sql)),
    Q("p36_drop_attribution", p36, Some(p36Sql)))
}
