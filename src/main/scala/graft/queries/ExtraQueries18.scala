package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DecimalType, DoubleType, LongType}
import graft.Tables
import graft.queries.Relational.{Fn, Q, money}

/** Round-8 batch 20: calendar-aware latency, snapshot row accounting,
  * weighted bounded-hop shortest paths, and the modality-balance plan
  * over the media capstone.
  *
  * Same determinism discipline as ExtraQueries3–17.
  */
object ExtraQueries18 {

  // ------------------------------- r117 business-day shipping latency

  /** r117: order-to-ship latency in BUSINESS days per priority — the
    * SLA number ops teams actually quote (a Friday order shipped Monday
    * is 1 business day, not 3; r107's calendar-day percentiles
    * overstate weekend-spanning latencies). Weekday math is pure
    * integer arithmetic on epoch days — NO engine dow/weekofyear
    * functions, whose week-start and locale conventions differ across
    * engines: with m = epochday + 3 (so m ≡ 0 mod 7 ⇔ Monday), the
    * weekday count in [0, x) is W(x) = 5·(x div 7) + min(x mod 7, 5),
    * and business days in (d1, d2] is W(m2+1) − W(m1+1).
    *
    * Exactness: all-integer epoch-day algebra; the mean is one rounded
    * division from exact BIGINT sums; weekend-ship counts are integer.
    * Scale shape: one orders⋈lineitem equi-join (the fact tables'
    * natural key), map-side latency arithmetic, one 5-row aggregate —
    * no windows, nothing series-sized even. */
  private val r117: Fn = (s, d) => {
    val epoch = lit(java.sql.Date.valueOf("1970-01-01"))
    def m(c: org.apache.spark.sql.Column) = datediff(c, epoch) + lit(3)
    def wdays(x: org.apache.spark.sql.Column) =
      lit(5) * (x.cast(LongType) / 7).cast(LongType) + least(x.cast(LongType) % 7, lit(5L))
    val j = Tables.orders(s, d)
      .join(Tables.lineitem(s, d), col("o_orderkey") === col("l_orderkey"))
      .withColumn("m1", m(to_date(col("o_orderdate"))))
      .withColumn("m2", m(to_date(col("l_shipdate"))))
      .withColumn("bd", (wdays(col("m2") + 1) - wdays(col("m1") + 1)).cast(LongType))
      .withColumn("wknd_ship", ((col("m2") % 7) >= 5).cast(LongType))
    j.groupBy(col("o_orderpriority"))
      .agg(count(lit(1)).as("n_lines"),
        sum(col("bd")).cast(LongType).as("sum_bd"),
        max(col("bd")).as("max_bd"),
        sum(col("wknd_ship")).cast(LongType).as("n_weekend_ship"))
      .withColumn("avg_bd",
        round(col("sum_bd").cast(DoubleType) / col("n_lines").cast(DoubleType), 4))
      .orderBy("o_orderpriority")
  }

  private val r117Sql =
    """WITH j AS (
      |  SELECT o_orderpriority,
      |         date_diff('day', DATE '1970-01-01', CAST(o_orderdate AS DATE)) + 3 AS m1,
      |         date_diff('day', DATE '1970-01-01', CAST(l_shipdate AS DATE)) + 3 AS m2
      |  FROM orders JOIN lineitem ON o_orderkey = l_orderkey),
      |bd AS (
      |  SELECT o_orderpriority,
      |         (5 * ((m2 + 1) // 7) + least((m2 + 1) % 7, 5))
      |       - (5 * ((m1 + 1) // 7) + least((m1 + 1) % 7, 5)) AS bd,
      |         CASE WHEN m2 % 7 >= 5 THEN 1 ELSE 0 END AS wknd_ship
      |  FROM j)
      |SELECT o_orderpriority,
      |       count(*) AS n_lines,
      |       CAST(sum(bd) AS BIGINT) AS sum_bd,
      |       CAST(max(bd) AS BIGINT) AS max_bd,
      |       CAST(sum(wknd_ship) AS BIGINT) AS n_weekend_ship,
      |       round(CAST(sum(bd) AS DOUBLE) / count(*), 4) AS avg_bd
      |FROM bd
      |GROUP BY 1 ORDER BY 1""".stripMargin

  // ------------------------------- p29 snapshot diff (row accounting)

  /** Snapshot cutoffs: lineitems shipped strictly before each. */
  val DiffCutA = "1998-01-01"
  val DiffCutB = "1998-06-01"

  /** p29: snapshot-to-snapshot diff — per-order state (shipped line
    * count, shipped revenue) materialized at two ship-date cutoffs and
    * FULL-OUTER reconciled into added / changed / unchanged classes
    * with exact revenue deltas per priority. This is the row-accounting
    * audit every incremental pipeline publishes next to its output
    * ("what changed since the last run, and does the delta explain the
    * totals") — p10/r100 maintain aggregates incrementally; p29 is the
    * independent diff that PROVES a maintenance run moved exactly what
    * it claims. Insert-only facts mean no 'removed' class (asserted
    * structurally: snapshot A's rows are a subset of B's keys).
    *
    * Exactness: counts are integers, revenue rides the exact money
    * grid, deltas are DECIMAL subtractions; class assignment is pure
    * integer comparison.
    * Scale shape: two cutoff-filtered scans of ONE fact table collapse
    * to order-grain aggregates (the same keyed shuffle), full-outer
    * join on the order key, then a bounded per-(priority, class)
    * census. At 100 TB both snapshot aggregates come off the same scan
    * via conditional aggregation — which is exactly how it's written:
    * one pass, two filtered sums. */
  private val p29: Fn = (s, d) => {
    val l = Tables.lineitem(s, d)
      .filter(col("l_shipdate") < lit(DiffCutB).cast("timestamp"))
      .withColumn("in_a", (col("l_shipdate") < lit(DiffCutA).cast("timestamp")).cast(LongType))
    val state = l.groupBy(col("l_orderkey"))
      .agg(sum(col("in_a")).cast(LongType).as("n_a"),
        count(lit(1)).cast(LongType).as("n_b"),
        sum(money(col("l_extendedprice")) * col("in_a")).cast(DecimalType(38, 2)).as("rev_a"),
        sum(money(col("l_extendedprice"))).cast(DecimalType(38, 2)).as("rev_b"))
    val classed = state.withColumn("diff_class",
      when(col("n_a") === 0, "added")
        .when(col("n_b") > col("n_a"), "changed")
        .otherwise("unchanged"))
    classed.join(Tables.orders(s, d).select(col("o_orderkey"), col("o_orderpriority")),
        col("l_orderkey") === col("o_orderkey"))
      .groupBy(col("o_orderpriority"), col("diff_class"))
      .agg(count(lit(1)).as("n_orders"),
        sum(col("rev_b") - coalesce(col("rev_a"), lit(0))).cast(DecimalType(38, 2))
          .as("rev_delta"))
      .orderBy("o_orderpriority", "diff_class")
  }

  private val p29Sql =
    s"""WITH l AS (
       |  SELECT l_orderkey,
       |         CASE WHEN l_shipdate < TIMESTAMP '$DiffCutA' THEN 1 ELSE 0 END AS in_a,
       |         CAST(l_extendedprice AS DECIMAL(12,2)) AS e
       |  FROM lineitem
       |  WHERE l_shipdate < TIMESTAMP '$DiffCutB'),
       |state AS (
       |  SELECT l_orderkey,
       |         CAST(sum(in_a) AS BIGINT) AS n_a,
       |         CAST(count(*) AS BIGINT) AS n_b,
       |         CAST(sum(e * in_a) AS DECIMAL(38,2)) AS rev_a,
       |         CAST(sum(e) AS DECIMAL(38,2)) AS rev_b
       |  FROM l GROUP BY 1),
       |classed AS (
       |  SELECT *,
       |         CASE WHEN n_a = 0 THEN 'added'
       |              WHEN n_b > n_a THEN 'changed'
       |              ELSE 'unchanged' END AS diff_class
       |  FROM state)
       |SELECT o_orderpriority, diff_class,
       |       count(*) AS n_orders,
       |       CAST(sum(rev_b - COALESCE(rev_a, 0)) AS DECIMAL(38,2)) AS rev_delta
       |FROM classed JOIN orders ON l_orderkey = o_orderkey
       |GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin

  // --------------------- s29 bounded-hop weighted shortest paths

  /** Relaxation rounds = max path length in edges. */
  val SsspRounds = 3

  /** Number of seed sources (lowest graph ids — deterministic). */
  val SsspSeeds = 4

  /** s29: multi-source weighted shortest paths, bounded to
    * [[SsspRounds]] hops, over the s10 kNN graph with integer edge
    * costs w = 10000 − 10000·cosine — Bellman–Ford's "shortest path
    * using ≤ k edges" recurrence, which IS the iterated relax step
    * (round r state = exact min-cost over paths of ≤ r edges, no
    * negative-cycle concerns since costs ≥ 0). The weighted companion
    * to s27's hop-count BFS: a 2-hop path through tight neighbors can
    * be CHEAPER than a loose direct edge, and this is the query that
    * shows where (graph-ANN entry-point quality, s21's walk costs).
    *
    * Exactness: costs are exact integers (sim is stored on the 4dp
    * grid, so 10000·sim is integral); every round is a keyed join +
    * MIN aggregation over integers.
    * Scale shape: per round ONE join of the (seed, node) state against
    * the degree-bounded edge list + one min-agg; state ≤ seeds ·
    * (k^[[SsspRounds]]) nodes, never n²; the two-refs-per-round loop
    * state is lineage-truncated via localCheckpoint (the s26/s27
    * discipline). The DuckDB twin enumerates paths in a depth-bounded
    * recursive CTE and min-reduces — exponential in the CTE, which is
    * exactly why the engine side iterates the linear relaxation
    * instead. */
  private val s29: Fn = (s, d) => {
    val edges = SimilarityQueries.knnPool(s, d)
      .select(col("a_id"), col("b_id"),
        (lit(10000L) - round(col("sim") * 10000).cast(LongType)).as("w"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val seeds = edges.select(col("a_id")).distinct()
      .orderBy("a_id").limit(SsspSeeds)
      .select(col("a_id").as("seed"))
    var best = seeds.select(col("seed"), col("seed").as("node"), lit(0L).as("dist"))
      .localCheckpoint(true)
    (1 to SsspRounds).foreach { _ =>
      val grown = best.join(edges, col("node") === col("a_id"))
        .select(col("seed"), col("b_id").as("node"), (col("dist") + col("w")).as("dist"))
      val next = best.unionAll(grown)
        .groupBy("seed", "node").agg(min(col("dist")).cast(LongType).as("dist"))
        .localCheckpoint(true)
      best.unpersist()
      best = next
    }
    val out = best.orderBy("seed", "node")
    edges.unpersist()
    out
  }

  private def s29Sql: String =
    s"""WITH RECURSIVE knn AS (${SimilarityQueries.s10Sql}),
       |edges AS (
       |  SELECT a_id, b_id,
       |         CAST(10000 - round(sim * 10000, 0) AS BIGINT) AS w
       |  FROM knn),
       |seeds AS (
       |  SELECT DISTINCT a_id AS seed FROM edges ORDER BY seed LIMIT $SsspSeeds),
       |walk(seed, node, dist, depth) AS (
       |  SELECT seed, seed, CAST(0 AS BIGINT), 0 FROM seeds
       |  UNION ALL
       |  SELECT w.seed, e.b_id, w.dist + e.w, w.depth + 1
       |  FROM walk w JOIN edges e ON e.a_id = w.node
       |  WHERE w.depth < $SsspRounds)
       |SELECT seed, node, CAST(min(dist) AS BIGINT) AS dist
       |FROM walk GROUP BY 1, 2
       |ORDER BY seed, node""".stripMargin

  // --------------------- m18 modality-balanced selection plan

  /** Target modality mix weights (image : audio : video). */
  val MixWeights: Seq[(String, Long)] =
    Seq("image/png" -> 2L, "audio/wav" -> 1L, "video/mp4" -> 1L)

  /** m18: modality-balanced selection plan over the m17 manifest — the
    * final assembly step of a multimodal training set: from the assets
    * m17 KEEPS, select a [[MixWeights]]-proportioned subset, quota per
    * modality by r94's largest-remainder law (exact conservation:
    * Σquota = budget by construction), lowest-doc_id-first within each
    * modality (deterministic, and the keeper ids are m14's cluster
    * minima already). Modalities short of their quota keep everything
    * they have — the shortfall is REPORTED, not silently reallocated
    * (reallocation is p16's waterfill; a selection plan must show the
    * gap so the mix decision is explicit). A configured modality with
    * ZERO kept assets still gets its quota row (weights-side outer
    * join, r8 advice) and surfaces in the output as a null-rk/null-doc
    * row with shortfall = quota — previously it vanished from the join
    * while its weight still counted in w_total, silently
    * under-allocating Σquota < budget.
    *
    * Exactness: quotas are BIGINT div/mod largest-remainder (r88/r94
    * discipline); selection is an integer rank comparison.
    * Scale shape: composes the REGISTERED m17 plan (the s11/m16
    * composition precedent); the quota algebra runs on a 3-row
    * aggregate; selection is one modality-partitioned rank window over
    * the keeper relation (per-mime parallelism — at scale the rank
    * window is the standard per-group top-N shape). */
  private val m18: Fn = (s, d) => {
    val budgetFrac = 2L // select half the kept assets
    val kept = CoverageQueries.mediaManifestFn(s, d)
      .filter(col("verdict") === "keep")
      .select(col("doc_id"), col("mime"))
    val avail0 = kept.groupBy("mime").agg(count(lit(1)).cast(LongType).as("avail"))
    import s.implicits._
    val weights = MixWeights.toDF("mime", "wt")
    // every configured modality keeps its row even with ZERO kept assets
    // (r8 advice): the old inner join dropped empty modalities while
    // their weight still counted in w_total, so largest-remainder
    // under-allocated (Σquota < budget) and the gap was never reported —
    // contradicting the 'shortfall is REPORTED' contract
    val avail = weights.select("mime").join(avail0, Seq("mime"), "left")
      .select(col("mime"), coalesce(col("avail"), lit(0L)).as("avail"))
    val totals = avail.agg(sum(col("avail")).cast(LongType).as("k_total"))
    val planned = avail.join(broadcast(weights), Seq("mime"))
      .crossJoin(broadcast(totals))
      .withColumn("budget", (col("k_total") / budgetFrac).cast(LongType))
      .withColumn("w_total", lit(MixWeights.map(_._2).sum))
      .withColumn("base", (col("budget") * col("wt") / col("w_total")).cast(LongType))
      .withColumn("rem", (col("budget") * col("wt") % col("w_total")).cast(LongType))
    val wRem = Window.orderBy(desc("rem"), col("mime"))
    val quota = planned
      .withColumn("extra_rank", row_number().over(wRem))
      .withColumn("n_extra", (col("budget") - sum(col("base")).over(
        Window.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing))).cast(LongType))
      .withColumn("quota",
        (col("base") + when(col("extra_rank") <= col("n_extra"), 1L).otherwise(0L))
          .cast(LongType))
      .select(col("mime"), col("avail"), col("quota"))
    val wMime = Window.partitionBy("mime").orderBy("doc_id")
    val selected = kept.withColumn("rk", row_number().over(wMime).cast(LongType))
      .join(broadcast(quota), Seq("mime"))
      .filter(col("rk") <= col("quota"))
      .select("mime", "rk", "doc_id", "avail", "quota")
    // an empty modality has no ranked rows to select, so it surfaces as
    // one null-rk/null-doc row carrying its quota and (fully unmet)
    // shortfall — reported, not silently dropped. The union side is a
    // ≤|modalities|-row anti-join, so the hot selection path keeps its
    // broadcast inner join (an outer join from the big preserved side
    // could not broadcast the quota relation).
    val unmet = quota.join(avail0, Seq("mime"), "left_anti")
      .select(col("mime"), lit(null).cast(LongType).as("rk"),
        lit(null).cast(LongType).as("doc_id"), col("avail"), col("quota"))
    selected.unionByName(unmet)
      .withColumn("shortfall", greatest(col("quota") - col("avail"), lit(0L)))
      .select("mime", "rk", "doc_id", "avail", "quota", "shortfall")
      .orderBy("mime", "rk")
  }

  private def m18Sql: String = {
    val weights = MixWeights.map { case (m, w) => s"('$m', $w)" }.mkString(", ")
    val wTotal = MixWeights.map(_._2).sum
    s"""WITH manifest AS (${CoverageQueries.mediaManifestSql}),
       |kept AS (
       |  SELECT doc_id, mime FROM manifest WHERE verdict = 'keep'),
       |weights(mime, wt) AS (VALUES $weights),
       |avail AS (
       |  SELECT w.mime, CAST(COALESCE(k.avail, 0) AS BIGINT) AS avail
       |  FROM weights w LEFT JOIN
       |    (SELECT mime, count(*) AS avail FROM kept GROUP BY 1) k
       |    ON w.mime = k.mime),
       |totals AS (SELECT CAST(sum(avail) AS BIGINT) AS k_total FROM avail),
       |planned AS (
       |  SELECT a.mime, a.avail, w.wt,
       |         t.k_total // 2 AS budget,
       |         (t.k_total // 2) * w.wt // $wTotal AS base,
       |         (t.k_total // 2) * w.wt % $wTotal AS rem
       |  FROM avail a JOIN weights w ON a.mime = w.mime CROSS JOIN totals t),
       |quota AS (
       |  SELECT mime, avail,
       |         CAST(base + CASE WHEN row_number() OVER (ORDER BY rem DESC, mime)
       |                       <= budget - sum(base) OVER () THEN 1 ELSE 0 END AS BIGINT)
       |           AS quota
       |  FROM planned),
       |ranked AS (
       |  SELECT mime, doc_id,
       |         CAST(row_number() OVER (PARTITION BY mime ORDER BY doc_id) AS BIGINT) AS rk
       |  FROM kept),
       |sel AS (
       |  SELECT r.mime, r.rk, r.doc_id, q.avail, q.quota
       |  FROM ranked r JOIN quota q ON r.mime = q.mime
       |  WHERE r.rk <= q.quota
       |  UNION ALL
       |  SELECT q.mime, CAST(NULL AS BIGINT), CAST(NULL AS BIGINT), q.avail, q.quota
       |  FROM quota q WHERE q.avail = 0)
       |SELECT mime, rk, doc_id, avail, quota,
       |       greatest(quota - avail, 0) AS shortfall
       |FROM sel
       |ORDER BY mime, rk NULLS FIRST""".stripMargin
  }

  val all: Seq[Q] = Seq(
    Q("r117_business_days", r117, Some(r117Sql)),
    Q("p29_snapshot_diff", p29, Some(p29Sql)),
    Q("s29_bounded_sssp", s29, Some(s29Sql)),
    Q("m18_modality_balance", m18, Some(m18Sql)))
}
