package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DecimalType, DoubleType, LongType, StringType}
import graft.Tables
import graft.functions.DetHash
import graft.queries.Relational.{Fn, Q}

/** Round-9 batch 26: structural dedup + corpus hygiene + data-movement
  * planning — token-length-skeleton template dedup, consecutive-token
  * run compression (the crawl-artifact cleanup), a minimal-movement
  * shard rebalancing plan, year-over-year price/volume revenue
  * decomposition, and mutual-kNN filtering over the registered graph.
  */
object ExtraQueries24 {

  private def docs(s: SparkSession, d: String): DataFrame = Tables.documents(s, d)

  // --------------------- d27 structural (skeleton) template dedup

  /** Leading tokens whose length sequence forms the structural
    * fingerprint. Full-length skeletons are too discriminative on this
    * fixture (zero collisions); the 8-token prefix yields ~23 families
    * at sf0.01, all with non-identical full texts — both arms graded. */
  val SkeletonK = 8

  /** d27: structural TEMPLATE dedup — machine-generated boilerplate
    * (form letters, templated product pages, log-derived text) shares
    * the SHAPE of its template while the slot words vary, so exact-hash
    * dedup (d01) misses it entirely and shingle dedup (d03/d04) pays
    * full tokenization cost to find it. The structural fingerprint is
    * the md5 of the first-[[SkeletonK]]-token LENGTH sequence: two docs
    * that open with the same word-length pattern collapse into one
    * family regardless of wording, the min-id member is the keeper,
    * and everything else reports its keeper + family size (the d01
    * output contract, so downstream keep-lists compose unchanged).
    *
    * Exactness: integer token lengths, md5 fingerprint, BIGINT ids —
    * every value engine-portable. Scale shape: ONE projection builds
    * the fingerprint (a bounded prefix of each doc — the blob is never
    * fully tokenized), then one hash-keyed window family ranking;
    * family partitions are duplication-depth-sized, never the corpus. */
  private val d27: Fn = (s, d) => {
    val skel = md5(concat_ws(",",
      transform(slice(split(col("text"), " "), 1, SkeletonK),
        w => length(w).cast(StringType))))
    val wf = Window.partitionBy("skel")
    docs(s, d).select(col("doc_id"), skel.as("skel"))
      .withColumn("keeper", min(col("doc_id")).over(wf))
      .withColumn("fam_size", count(lit(1)).over(wf).cast(LongType))
      .filter(col("doc_id") =!= col("keeper"))
      .select("doc_id", "keeper", "fam_size")
      .orderBy("doc_id")
  }
  private val d27Sql =
    s"""WITH sk AS (
       |  SELECT doc_id,
       |         md5(array_to_string(list_transform(string_split(text, ' ')[1:$SkeletonK],
       |             w -> CAST(len(w) AS VARCHAR)), ',')) AS skel
       |  FROM documents)
       |SELECT doc_id, keeper, fam_size FROM (
       |  SELECT doc_id,
       |         min(doc_id) OVER (PARTITION BY skel) AS keeper,
       |         CAST(count(*) OVER (PARTITION BY skel) AS BIGINT) AS fam_size
       |  FROM sk) t
       |WHERE doc_id <> keeper
       |ORDER BY doc_id""".stripMargin

  // --------------------- t40 consecutive-token run compression

  /** t40: consecutive-duplicate-token collapse — the crawl-artifact
    * cleanup (stutter from OCR, scraped menus, and copy-paste echo
    * produces "the the", "click click click") that quality filters
    * score (t10) but curation must actually REMOVE. Each doc's token
    * stream keeps a token only where it differs from its predecessor;
    * the output reports the before/after token counts and the md5 of
    * the reassembled text, so the driver hash-compares the full cleaned
    * corpus without shipping megabytes of text through the dump.
    *
    * Exactness: integer counts + md5 of a deterministically reassembled
    * string (single-space joins on both engines, null-skipping ordered
    * aggregation on both). Scale shape: one posexplode (linear in
    * corpus tokens), ONE doc-keyed lag window (partition = document,
    * bounded by doc length), one doc-keyed re-aggregation — the same
    * cost class as tokenizing the corpus once, never a join. */
  private val t40: Fn = (s, d) => {
    val toks = docs(s, d)
      .select(col("doc_id"), posexplode(split(col("text"), " ")).as(Seq("pos", "tok")))
    val w = Window.partitionBy("doc_id").orderBy("pos")
    toks
      .withColumn("keep", !(lag(col("tok"), 1).over(w) <=> col("tok")))
      .groupBy("doc_id")
      .agg(
        count(lit(1)).as("n_toks"),
        sum(when(col("keep"), 1L).otherwise(0L)).cast(LongType).as("n_kept"),
        md5(concat_ws(" ",
          transform(
            array_sort(collect_list(when(col("keep"), struct(col("pos"), col("tok"))))),
            x => x.getField("tok")))).as("compressed_md5"))
      .orderBy("doc_id")
  }
  private val t40Sql =
    """WITH w AS (
      |  SELECT doc_id,
      |         unnest(string_split(text, ' ')) AS tok,
      |         generate_subscripts(string_split(text, ' '), 1) AS pos
      |  FROM documents),
      |f AS (
      |  SELECT doc_id, pos, tok,
      |         (lag(tok) OVER (PARTITION BY doc_id ORDER BY pos) IS DISTINCT FROM tok) AS keep
      |  FROM w)
      |SELECT doc_id,
      |       CAST(count(*) AS BIGINT) AS n_toks,
      |       CAST(sum(CASE WHEN keep THEN 1 ELSE 0 END) AS BIGINT) AS n_kept,
      |       md5(string_agg(CASE WHEN keep THEN tok END, ' ' ORDER BY pos)) AS compressed_md5
      |FROM f
      |GROUP BY doc_id
      |ORDER BY doc_id""".stripMargin

  // --------------------- p32 shard rebalancing plan

  val RebShards = 16

  /** p32: minimal-movement shard REBALANCING plan — after months of
    * ingest a hash-sharded corpus drifts off balance (deletes, skewed
    * sources), and recomputing every shard from scratch moves ~all the
    * data; the operator a storage layer actually wants is the MOVE
    * PLAN: which shard sends how many docs to which shard so that every
    * shard lands exactly on its largest-remainder quota while total
    * movement equals only the imbalance (Σ surplus — provably minimal,
    * since every over-quota doc must move somewhere and no under-quota
    * shard needs more than its deficit). The classic FIFO
    * cumulative-interval rewrite (r108's kernel) makes the donor →
    * receiver matching set-based: donor k covers the cumulative surplus
    * interval [Σsurplus<k, Σsurplus≤k) in shard order, receiver j its
    * deficit interval likewise, and the moves are exactly the interval
    * OVERLAPS — no loop, no driver.
    *
    * Exactness: pure BIGINT counts, md5 shard assignment (DetHash
    * discipline — rerun-stable at any parallelism, oracle-replayable).
    * Scale shape: one corpus aggregation to the ≤[[RebShards]]-row
    * shard-size relation; every window below runs on that aggregate
    * (PlanLint AggBounded), and the plan itself is shards²-bounded at
    * worst. At 100 TB the move plan feeds a copy job; planning cost
    * stays the cost of ONE count per shard. */
  private val p32: Fn = (s, d) => {
    val sizes = docs(s, d)
      .select(DetHash.mdBucket(col("doc_id"), "shard:", RebShards).as("shard"))
      .groupBy("shard").agg(count(lit(1)).as("sz"))
    // full shard domain: md5 may leave small-SF shards empty, and an
    // empty shard is still owed its quota (it only ever receives)
    val dom = s.range(RebShards).select(col("id").cast("int").as("shard"))
    val tot = docs(s, d).agg(count(lit(1)).as("n"))
    val quota = dom.join(sizes, Seq("shard"), "left")
      .select(col("shard"), coalesce(col("sz"), lit(0L)).as("sz"))
      .crossJoin(broadcast(tot))
      .withColumn("quota",
        floor(col("n") / lit(RebShards)).cast(LongType) +
          when(col("shard") < pmod(col("n"), lit(RebShards)), 1L).otherwise(0L))
      .withColumn("surplus", col("sz") - col("quota"))
    def cum(df: DataFrame, flt: org.apache.spark.sql.Column, amt: org.apache.spark.sql.Column,
            lo: String, hi: String): DataFrame = {
      val w = Window.orderBy("shard").rowsBetween(Window.unboundedPreceding, Window.currentRow)
      df.filter(flt).withColumn("amt", amt)
        .withColumn(hi, sum(col("amt")).over(w))
        .withColumn(lo, col(hi) - col("amt"))
    }
    val donors = cum(quota, col("surplus") > 0, col("surplus"), "dlo", "dhi")
      .select(col("shard").as("from_shard"), col("dlo"), col("dhi"))
    val recv = cum(quota, col("surplus") < 0, -col("surplus"), "rlo", "rhi")
      .select(col("shard").as("to_shard"), col("rlo"), col("rhi"))
    donors.join(recv, col("dlo") < col("rhi") && col("rlo") < col("dhi"))
      .withColumn("moved",
        (least(col("dhi"), col("rhi")) - greatest(col("dlo"), col("rlo"))).cast(LongType))
      .select("from_shard", "to_shard", "moved")
      .orderBy("from_shard", "to_shard")
  }
  private val p32Sql = {
    val b = DetHash.mdBucketSql("doc_id", "shard:", RebShards)
    s"""WITH sizes AS (
       |  SELECT $b AS shard, CAST(count(*) AS BIGINT) AS sz FROM documents GROUP BY 1),
       |tot AS (SELECT CAST(count(*) AS BIGINT) AS n FROM documents),
       |quota AS (
       |  SELECT d.range AS shard, COALESCE(s.sz, 0) AS sz,
       |         t.n // $RebShards + CASE WHEN d.range < t.n % $RebShards THEN 1 ELSE 0 END AS quota
       |  FROM range(0, $RebShards) d LEFT JOIN sizes s ON d.range = s.shard CROSS JOIN tot t),
       |donors AS (
       |  SELECT shard AS from_shard,
       |         sum(sz - quota) OVER (ORDER BY shard ROWS UNBOUNDED PRECEDING) - (sz - quota) AS dlo,
       |         sum(sz - quota) OVER (ORDER BY shard ROWS UNBOUNDED PRECEDING) AS dhi
       |  FROM quota WHERE sz > quota),
       |recv AS (
       |  SELECT shard AS to_shard,
       |         sum(quota - sz) OVER (ORDER BY shard ROWS UNBOUNDED PRECEDING) - (quota - sz) AS rlo,
       |         sum(quota - sz) OVER (ORDER BY shard ROWS UNBOUNDED PRECEDING) AS rhi
       |  FROM quota WHERE sz < quota)
       |SELECT from_shard, to_shard,
       |       CAST(least(dhi, rhi) - greatest(dlo, rlo) AS BIGINT) AS moved
       |FROM donors JOIN recv ON dlo < rhi AND rlo < dhi
       |ORDER BY from_shard, to_shard""".stripMargin
  }

  // --------------------- r122 price/volume revenue waterfall

  /** r122: year-over-year price/volume revenue DECOMPOSITION — the
    * waterfall every revenue review renders: how much of each nation's
    * revenue change came from selling MORE (volume at last year's
    * price) vs charging MORE (price change on this year's volume).
    * The algebra is exact: Δrev = Δqty·p₀ + Δp·q₁ with p = rev/qty,
    * so the two effects partition the delta with no residual — the
    * spec asserts the reconciliation law through the 4dp rounding.
    *
    * Exactness: revenue/quantity sums in DECIMAL(24,2) (the q01 money
    * discipline); each avg price is ONE double division of exact
    * operands, each effect ONE double product, rounded once at 4dp —
    * IEEE-identical across engines. Scale shape: one fact-table
    * aggregation to the (nation × year) grain (≤ 25·7 rows), then a
    * consecutive-year self-join ON that aggregate — series-sized,
    * never the fact table; the join keys carry the shuffle. */
  private val r122: Fn = (s, d) => {
    val grain = Tables.lineitem(s, d)
      .join(Tables.orders(s, d), col("l_orderkey") === col("o_orderkey"))
      .join(Tables.customer(s, d), col("o_custkey") === col("c_custkey"))
      .join(broadcast(Tables.nation(s, d)), col("c_nationkey") === col("n_nationkey"))
      .groupBy(col("n_name").as("nation"), year(col("o_orderdate")).as("yr"))
      .agg(
        sum(col("l_extendedprice").cast(DecimalType(24, 2))).as("rev"),
        sum(col("l_quantity").cast(DecimalType(24, 2))).as("qty"))
    val cur = grain.select(col("nation"), col("yr"),
      col("rev").as("rev1"), col("qty").as("qty1"))
    val prior = grain.select(col("nation"), (col("yr") + 1).as("yr"),
      col("rev").as("rev0"), col("qty").as("qty0"))
    cur.join(prior, Seq("nation", "yr"))
      .withColumn("p0", col("rev0").cast(DoubleType) / col("qty0").cast(DoubleType))
      .withColumn("p1", col("rev1").cast(DoubleType) / col("qty1").cast(DoubleType))
      .select(col("nation"), col("yr"),
        col("rev1").cast(DoubleType).as("revenue"),
        (col("rev1") - col("rev0")).cast(DoubleType).as("rev_delta"),
        round((col("qty1") - col("qty0")).cast(DoubleType) * col("p0"), 4).as("volume_effect"),
        round((col("p1") - col("p0")) * col("qty1").cast(DoubleType), 4).as("price_effect"))
      .orderBy("nation", "yr")
  }
  private val r122Sql =
    """WITH grain AS (
      |  SELECT n.n_name AS nation, year(o.o_orderdate) AS yr,
      |         sum(CAST(l.l_extendedprice AS DECIMAL(24,2))) AS rev,
      |         sum(CAST(l.l_quantity AS DECIMAL(24,2))) AS qty
      |  FROM lineitem l
      |  JOIN orders o ON l.l_orderkey = o.o_orderkey
      |  JOIN customer c ON o.o_custkey = c.c_custkey
      |  JOIN nation n ON c.c_nationkey = n.n_nationkey
      |  GROUP BY 1, 2)
      |SELECT g1.nation, g1.yr,
      |       CAST(g1.rev AS DOUBLE) AS revenue,
      |       CAST(g1.rev - g0.rev AS DOUBLE) AS rev_delta,
      |       round(CAST(g1.qty - g0.qty AS DOUBLE) * (CAST(g0.rev AS DOUBLE) / CAST(g0.qty AS DOUBLE)), 4) AS volume_effect,
      |       round((CAST(g1.rev AS DOUBLE) / CAST(g1.qty AS DOUBLE) - CAST(g0.rev AS DOUBLE) / CAST(g0.qty AS DOUBLE)) * CAST(g1.qty AS DOUBLE), 4) AS price_effect
      |FROM grain g1 JOIN grain g0 ON g1.nation = g0.nation AND g1.yr = g0.yr + 1
      |ORDER BY g1.nation, g1.yr""".stripMargin

  // --------------------- s32 mutual-kNN filter

  /** s32: mutual-kNN filter over the registered s10 graph — a directed
    * kNN edge a→b only says b is close to a; hubness makes popular
    * vectors everyone's neighbor while they reciprocate almost no one,
    * and training on those asymmetric pairs is how hard-negative mining
    * (s08) and semantic dedup (d11) pick up junk. The RECIPROCAL graph
    * keeps only pairs where each endpoint ranks the other in its own
    * top-k, annotated with both ranks, the shared-neighbor count, and
    * the neighborhood Jaccard — the standard edge-confidence weights a
    * mutual-kNN clustering consumes.
    *
    * Exactness: the pooled s10 graph is already 4dp-grid exact; counts
    * are BIGINT; the Jaccard is one rounded division of exact integers
    * (denominator floored at 1 — it can only vanish if both
    * neighborhoods are exactly {each other}, where shared = 0 anyway).
    * Scale shape: every input is the K·n edge list, never vectors —
    * the mutual join is one hash self-join on the normalized pair key,
    * the shared-neighbor count is s19's bounded triangle shape (per
    * mutual pair, ≤K candidates from each side). */
  private val s32: Fn = (s, d) => {
    val knn = SimilarityQueries.knnPool(s, d)
    val e1 = knn.select(col("a_id"), col("b_id"), col("sim"), col("rk").as("rk_ab"))
    val e2 = knn.select(col("a_id").as("r_b"), col("b_id").as("r_a"), col("rk").as("rk_ba"))
    val mut = e1.join(e2, col("a_id") === col("r_a") && col("b_id") === col("r_b"))
      .filter(col("a_id") < col("b_id"))
      .select("a_id", "b_id", "sim", "rk_ab", "rk_ba")
    val deg = knn.groupBy(col("a_id")).agg(count(lit(1)).as("deg"))
    val na = knn.select(col("a_id").as("m_a"), col("b_id").as("nb_a"))
    val nbr = knn.select(col("a_id").as("m_b"), col("b_id").as("nb_b"))
    val shared = mut.select(col("a_id"), col("b_id"))
      .join(na, col("a_id") === col("m_a"))
      .join(nbr, col("b_id") === col("m_b") && col("nb_a") === col("nb_b"))
      .filter(col("nb_a") =!= col("a_id") && col("nb_a") =!= col("b_id"))
      .groupBy("a_id", "b_id").agg(count(lit(1)).as("shared"))
    mut
      .join(deg.select(col("a_id"), col("deg").as("deg_a")), Seq("a_id"))
      .join(deg.select(col("a_id").as("b_id"), col("deg").as("deg_b")), Seq("b_id"))
      .join(shared, Seq("a_id", "b_id"), "left")
      .select(col("a_id"), col("b_id"), col("sim"), col("rk_ab"), col("rk_ba"),
        coalesce(col("shared"), lit(0L)).cast(LongType).as("shared"),
        round(coalesce(col("shared"), lit(0L)).cast(DoubleType) /
          greatest(col("deg_a") - 1 + col("deg_b") - 1 - coalesce(col("shared"), lit(0L)), lit(1L))
            .cast(DoubleType), 4).as("nb_jaccard"))
      .orderBy("a_id", "b_id")
  }
  private val s32Sql =
    s"""WITH knn AS (SELECT * FROM (${SimilarityQueries.s10Sql}) t),
       |mut AS (
       |  SELECT e1.a_id, e1.b_id, e1.sim, e1.rk AS rk_ab, e2.rk AS rk_ba
       |  FROM knn e1 JOIN knn e2 ON e1.a_id = e2.b_id AND e1.b_id = e2.a_id
       |  WHERE e1.a_id < e1.b_id),
       |deg AS (SELECT a_id, CAST(count(*) AS BIGINT) AS deg FROM knn GROUP BY 1),
       |sh AS (
       |  SELECT m.a_id, m.b_id, CAST(count(*) AS BIGINT) AS shared
       |  FROM mut m
       |  JOIN knn na ON na.a_id = m.a_id
       |  JOIN knn nb ON nb.a_id = m.b_id AND nb.b_id = na.b_id
       |  WHERE na.b_id <> m.a_id AND na.b_id <> m.b_id
       |  GROUP BY 1, 2)
       |SELECT m.a_id, m.b_id, m.sim, m.rk_ab, m.rk_ba,
       |       COALESCE(s.shared, 0) AS shared,
       |       round(CAST(COALESCE(s.shared, 0) AS DOUBLE) /
       |             CAST(greatest(da.deg - 1 + db.deg - 1 - COALESCE(s.shared, 0), 1) AS DOUBLE), 4) AS nb_jaccard
       |FROM mut m
       |JOIN deg da ON da.a_id = m.a_id
       |JOIN deg db ON db.a_id = m.b_id
       |LEFT JOIN sh s ON s.a_id = m.a_id AND s.b_id = m.b_id
       |ORDER BY m.a_id, m.b_id""".stripMargin

  val all: Seq[Q] = Seq(
    Q("d27_skeleton_dedup", d27, Some(d27Sql)),
    Q("t40_run_compress", t40, Some(t40Sql)),
    Q("p32_shard_rebalance", p32, Some(p32Sql)),
    Q("r122_price_volume_waterfall", r122, Some(r122Sql)),
    Q("s32_mutual_knn", s32, Some(s32Sql)))
}
