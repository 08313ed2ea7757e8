package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DecimalType, DoubleType, IntegerType, LongType, StringType}
import graft.Tables
import graft.functions.DetHash
import graft.queries.Relational.{Fn, Q}

/** Round-7 coverage sweep: behavioral/event analytics (sessionization,
  * experiment read-out, conversion latency, range-frame moving windows),
  * OLAP shape operators the registry lacked (ROLLUP subtotals, PIVOT),
  * and a key-continuity audit.
  *
  * Same determinism discipline as ExtraQueries3: exact integer/decimal
  * sufficient statistics, transcendentals only per-scalar or after
  * order-independent reduction, every window partitioned (or provably
  * aggregate-bounded), unique-key tiebreaks everywhere an order matters.
  */
object ExtraQueries4 {

  private def events(s: SparkSession, d: String) = Tables.events(s, d)
  private def orders(s: SparkSession, d: String) = Tables.orders(s, d)

  // ------------------------------------------------- r70 sessionization

  /** Gap-based sessions of the event log (30-minute inactivity splits),
    * the canonical behavioral-analytics primitive. Shared with the
    * streaming twin's spec: one row per (user, session) with count and
    * bounds.
    *
    * Scale design: every window is PARTITIONED BY user_id — the lag and
    * the running session counter both ride one user-keyed shuffle, and
    * no stage ever holds more than one user's events in order. Session
    * ids are per-user dense integers (cumulative sum of gap flags), so
    * the result is identical at any parallelism. */
  private[queries] def sessions(ev: DataFrame): DataFrame = {
    val w = Window.partitionBy("user_id").orderBy("us", "event_id")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val wl = Window.partitionBy("user_id").orderBy("us", "event_id")
    ev.select(col("user_id"), col("event_id"), unix_micros(col("ts")).as("us"))
      .withColumn("new_sess",
        when(col("us") - lag(col("us"), 1).over(wl) > 1800L * 1000000L || lag(col("us"), 1).over(wl).isNull, 1L)
          .otherwise(0L))
      .withColumn("sid", sum(col("new_sess")).over(w))
      .groupBy("user_id", "sid")
      .agg(count(lit(1)).as("n_events"), min(col("us")).as("start_us"), max(col("us")).as("end_us"))
  }

  /** r70: per-user session summary over [[sessions]] — session count,
    * total events, longest session, and total in-session dwell time.
    * All statistics reduce from exact micros/longs; the only doubles
    * are the two final per-user divisions. */
  private val r70: Fn = (s, d) =>
    sessions(events(s, d))
      .groupBy("user_id")
      .agg(
        count(lit(1)).as("n_sessions"),
        sum(col("n_events")).as("n_events"),
        max(col("n_events")).as("longest_session"),
        sum(col("end_us") - col("start_us")).as("dwell_us"))
      .select(
        col("user_id"), col("n_sessions"), col("n_events"), col("longest_session"),
        round(col("dwell_us").cast(DoubleType) / 1e6, 3).as("dwell_sec"),
        round(col("n_events").cast(DoubleType) / col("n_sessions").cast(DoubleType), 4)
          .as("events_per_session"))
      .orderBy("user_id")
  private val r70Sql =
    """WITH e AS (
      |  SELECT user_id, event_id, epoch_us(ts) AS us FROM events),
      |flagged AS (
      |  SELECT user_id, us,
      |         CASE WHEN lag(us) OVER w IS NULL
      |                OR us - lag(us) OVER w > 1800 * 1000000 THEN 1 ELSE 0 END AS new_sess
      |  FROM e WINDOW w AS (PARTITION BY user_id ORDER BY us, event_id)),
      |sess AS (
      |  SELECT user_id, us,
      |         sum(new_sess) OVER (PARTITION BY user_id ORDER BY us
      |                             ROWS UNBOUNDED PRECEDING) AS sid
      |  FROM flagged),
      |agg AS (
      |  SELECT user_id, sid, count(*) AS n_events,
      |         min(us) AS start_us, max(us) AS end_us
      |  FROM sess GROUP BY user_id, sid)
      |SELECT user_id, count(*) AS n_sessions,
      |       CAST(sum(n_events) AS BIGINT) AS n_events,
      |       max(n_events) AS longest_session,
      |       round(CAST(sum(end_us - start_us) AS DOUBLE) / 1e6, 3) AS dwell_sec,
      |       round(CAST(sum(n_events) AS DOUBLE) / count(*), 4) AS events_per_session
      |FROM agg GROUP BY user_id ORDER BY user_id""".stripMargin

  // Oracle nuance: the flagged CTE orders by (us, event_id) but only
  // carries us forward — safe because (us) ties within a user do not
  // occur in the generator's micros-resolution stream; the Spark side
  // nevertheless orders by the unique pair for belt-and-braces.

  // --------------------------------------------- r71 A/B experiment read

  /** r71: two-proportion z-test between deterministic experiment arms —
    * the experiment read-out primitive. Arm assignment is the portable
    * md5 bucket of the user id (no RNG — re-runnable and auditable, the
    * p01 split discipline); "conversion" = the user fired ≥1 purchase
    * event.
    *
    * Scale design: one user-keyed aggregation (partial-agg'd), then a
    * 2-row → 1-row conditional aggregate; the z statistic is computed
    * from four exact integers with an identical double expression on
    * both engines. At 100 TB the plan is one shuffle of user partials.
    */
  private val r71: Fn = (s, d) => {
    val perUser = events(s, d)
      .groupBy("user_id")
      .agg(
        sum(when(col("event_type") === "purchase", 1L).otherwise(0L)).as("pc"),
        sum(when(col("event_type") === "view", 1L).otherwise(0L)).as("vc"))
      .select(col("user_id"),
        when(col("pc") > col("vc"), 1L).otherwise(0L).as("converted"))
      .withColumn("arm", DetHash.mdBucket(col("user_id"), "exp:", 2))
    val g = perUser.agg(
      sum(when(col("arm") === 0, 1L).otherwise(0L)).as("n0"),
      sum(when(col("arm") === 0, col("converted")).otherwise(0L)).as("c0"),
      sum(when(col("arm") === 1, 1L).otherwise(0L)).as("n1"),
      sum(when(col("arm") === 1, col("converted")).otherwise(0L)).as("c1"))
    val (n0, c0, n1, c1) =
      (col("n0").cast(DoubleType), col("c0").cast(DoubleType),
        col("n1").cast(DoubleType), col("c1").cast(DoubleType))
    val p0 = c0 / n0
    val p1 = c1 / n1
    val pp = (c0 + c1) / (n0 + n1)
    val z = (p1 - p0) / sqrt(pp * (lit(1.0) - pp) * (lit(1.0) / n0 + lit(1.0) / n1))
    g.select(col("n0"), col("c0"), col("n1"), col("c1"),
      round(p0, 6).as("p0"), round(p1, 6).as("p1"),
      round(z, 6).as("z_score"),
      (abs(z) >= 1.959964).as("significant_95"))
  }
  private val r71Sql = {
    val arm = DetHash.mdBucketSql("user_id", "exp:", 2)
    """WITH pu AS (
      |  SELECT user_id, ARM AS arm,
      |         CASE WHEN sum(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END)
      |                 > sum(CASE WHEN event_type = 'view' THEN 1 ELSE 0 END)
      |              THEN 1 ELSE 0 END AS converted
      |  FROM events GROUP BY user_id, ARM),
      |g AS (
      |  SELECT CAST(sum(CASE WHEN arm = 0 THEN 1 ELSE 0 END) AS BIGINT) AS n0,
      |         CAST(sum(CASE WHEN arm = 0 THEN converted ELSE 0 END) AS BIGINT) AS c0,
      |         CAST(sum(CASE WHEN arm = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n1,
      |         CAST(sum(CASE WHEN arm = 1 THEN converted ELSE 0 END) AS BIGINT) AS c1
      |  FROM pu)
      |SELECT n0, c0, n1, c1,
      |  round(CAST(c0 AS DOUBLE) / CAST(n0 AS DOUBLE), 6) AS p0,
      |  round(CAST(c1 AS DOUBLE) / CAST(n1 AS DOUBLE), 6) AS p1,
      |  round((CAST(c1 AS DOUBLE) / CAST(n1 AS DOUBLE) - CAST(c0 AS DOUBLE) / CAST(n0 AS DOUBLE))
      |        / sqrt((CAST(c0 AS DOUBLE) + CAST(c1 AS DOUBLE)) / (CAST(n0 AS DOUBLE) + CAST(n1 AS DOUBLE))
      |               * (1.0 - (CAST(c0 AS DOUBLE) + CAST(c1 AS DOUBLE)) / (CAST(n0 AS DOUBLE) + CAST(n1 AS DOUBLE)))
      |               * (1.0 / CAST(n0 AS DOUBLE) + 1.0 / CAST(n1 AS DOUBLE))), 6) AS z_score,
      |  abs((CAST(c1 AS DOUBLE) / CAST(n1 AS DOUBLE) - CAST(c0 AS DOUBLE) / CAST(n0 AS DOUBLE))
      |      / sqrt((CAST(c0 AS DOUBLE) + CAST(c1 AS DOUBLE)) / (CAST(n0 AS DOUBLE) + CAST(n1 AS DOUBLE))
      |             * (1.0 - (CAST(c0 AS DOUBLE) + CAST(c1 AS DOUBLE)) / (CAST(n0 AS DOUBLE) + CAST(n1 AS DOUBLE)))
      |             * (1.0 / CAST(n0 AS DOUBLE) + 1.0 / CAST(n1 AS DOUBLE)))) >= 1.959964 AS significant_95
      |FROM g""".stripMargin.replace("ARM", arm)
  }

  // --------------------------------------------- r72 conversion latency

  /** r72: signup→purchase conversion latency, bucketed by whole days —
    * the funnel-timing read-out (r53's funnel counts WHO converts; this
    * measures HOW FAST). First signup per user, first purchase strictly
    * after it, exact micros difference.
    *
    * Scale design: two user-keyed aggregations and one user-keyed join
    * — all partial-agg'd shuffles on user_id; no window at all. The
    * per-bucket stats reduce exact longs; doubles appear only in the
    * four final per-bucket divisions. */
  private val r72: Fn = (s, d) => {
    val e = events(s, d).select(col("user_id"), col("event_type"), unix_micros(col("ts")).as("us"))
    val su = e.filter(col("event_type") === "signup")
      .groupBy("user_id").agg(min(col("us")).as("su_us"))
    val conv = e.filter(col("event_type") === "purchase")
      .join(su, "user_id")
      .filter(col("us") > col("su_us"))
      .groupBy("user_id").agg(min(col("us") - col("su_us")).as("lat_us"))
    conv
      .withColumn("day_bucket", (col("lat_us") / lit(86400000000L)).cast(LongType))
      .groupBy("day_bucket")
      .agg(count(lit(1)).as("n_users"),
        min(col("lat_us")).as("min_us"), max(col("lat_us")).as("max_us"),
        sum(col("lat_us")).as("sum_us"))
      .select(
        col("day_bucket").cast(IntegerType).as("day_bucket"), col("n_users"),
        round(col("min_us").cast(DoubleType) / 1e6, 3).as("min_latency_sec"),
        round(col("max_us").cast(DoubleType) / 1e6, 3).as("max_latency_sec"),
        round(col("sum_us").cast(DoubleType) / 1e6 / col("n_users").cast(DoubleType), 3)
          .as("avg_latency_sec"))
      .orderBy("day_bucket")
  }
  private val r72Sql =
    """WITH e AS (SELECT user_id, event_type, epoch_us(ts) AS us FROM events),
      |su AS (SELECT user_id, min(us) AS su_us FROM e WHERE event_type = 'signup' GROUP BY user_id),
      |conv AS (
      |  SELECT e.user_id, min(e.us - su.su_us) AS lat_us
      |  FROM e JOIN su USING (user_id)
      |  WHERE e.event_type = 'purchase' AND e.us > su.su_us
      |  GROUP BY e.user_id)
      |SELECT CAST(lat_us // 86400000000 AS INTEGER) AS day_bucket,
      |       count(*) AS n_users,
      |       round(CAST(min(lat_us) AS DOUBLE) / 1e6, 3) AS min_latency_sec,
      |       round(CAST(max(lat_us) AS DOUBLE) / 1e6, 3) AS max_latency_sec,
      |       round(CAST(sum(lat_us) AS DOUBLE) / 1e6 / count(*), 3) AS avg_latency_sec
      |FROM conv GROUP BY 1 ORDER BY day_bucket""".stripMargin

  // ------------------------------------------------- r73 ROLLUP subtotal

  /** r73: ROLLUP subtotals — order counts and exact revenue by
    * (year, priority), by year, and grand total, in one pass. The OLAP
    * report shape (drill-down with subtotals) the registry lacked;
    * Spark plans ROLLUP as a single Expand + one keyed aggregation, so
    * the 3 grouping sets cost one shuffle, not three scans.
    *
    * Level/labels are derived from the grouping NULLs identically on
    * both engines (no reliance on grouping_id bit order, which is the
    * one cross-engine hazard in rollup queries). */
  private val r73: Fn = (s, d) => {
    val base = orders(s, d).select(
      year(col("o_orderdate")).as("y"),
      col("o_orderpriority").as("p"),
      col("o_totalprice").cast(DecimalType(18, 2)).as("price"))
    base.rollup("y", "p")
      .agg(count(lit(1)).as("n_orders"),
        sum(col("price")).cast(DecimalType(28, 2)).as("revenue"))
      .select(
        (when(col("y").isNull, 1).otherwise(0) * 2 + when(col("p").isNull, 1).otherwise(0))
          .cast(IntegerType).as("lvl"),
        coalesce(col("y").cast(StringType), lit("ALL")).as("year"),
        coalesce(col("p"), lit("ALL")).as("priority"),
        col("n_orders"), col("revenue"))
      .orderBy("lvl", "year", "priority")
  }
  private val r73Sql =
    """WITH base AS (
      |  SELECT year(o_orderdate) AS y, o_orderpriority AS p,
      |         CAST(o_totalprice AS DECIMAL(18,2)) AS price
      |  FROM orders)
      |SELECT CAST(CASE WHEN y IS NULL THEN 1 ELSE 0 END * 2
      |            + CASE WHEN p IS NULL THEN 1 ELSE 0 END AS INTEGER) AS lvl,
      |       coalesce(CAST(y AS VARCHAR), 'ALL') AS year,
      |       coalesce(p, 'ALL') AS priority,
      |       count(*) AS n_orders,
      |       CAST(sum(price) AS DECIMAL(28,2)) AS revenue
      |FROM base GROUP BY ROLLUP (y, p)
      |ORDER BY lvl, year, priority""".stripMargin

  // ------------------------------------------------------- r74 PIVOT

  /** r74: PIVOT — priority classes as columns, one row per order year.
    * The wide report shape BI layers emit; Spark's pivot with an
    * EXPLICIT value list stays a single groupBy (no value-discovery
    * pre-pass) and each cell is a partial-agg'd conditional count, so
    * the whole pivot is one shuffle of 5 longs per (mapper, year). */
  private val r74: Fn = (s, d) =>
    orders(s, d)
      .select(year(col("o_orderdate")).as("year"), col("o_orderpriority").as("p"))
      .groupBy("year")
      .pivot("p", Seq("1-URGENT", "2-HIGH", "3-MEDIUM", "4-NOT SPECIFIED", "5-LOW"))
      .agg(count(lit(1)))
      .select(col("year"),
        coalesce(col("`1-URGENT`"), lit(0L)).as("n_urgent"),
        coalesce(col("`2-HIGH`"), lit(0L)).as("n_high"),
        coalesce(col("`3-MEDIUM`"), lit(0L)).as("n_medium"),
        coalesce(col("`4-NOT SPECIFIED`"), lit(0L)).as("n_notspec"),
        coalesce(col("`5-LOW`"), lit(0L)).as("n_low"))
      .orderBy("year")
  private val r74Sql =
    """SELECT year(o_orderdate) AS year,
      |  count(*) FILTER (WHERE o_orderpriority = '1-URGENT') AS n_urgent,
      |  count(*) FILTER (WHERE o_orderpriority = '2-HIGH') AS n_high,
      |  count(*) FILTER (WHERE o_orderpriority = '3-MEDIUM') AS n_medium,
      |  count(*) FILTER (WHERE o_orderpriority = '4-NOT SPECIFIED') AS n_notspec,
      |  count(*) FILTER (WHERE o_orderpriority = '5-LOW') AS n_low
      |FROM orders GROUP BY 1 ORDER BY year""".stripMargin

  // ------------------------------------- r75 RANGE-frame moving window

  /** r75: 7-day moving aggregates per event type over the daily rollup
    * — the monitoring-dashboard smoothing query, and the registry's
    * first RANGE frame (value-based window bounds; every prior window
    * op used ROWS or the default frame). The frame must be RANGE, not
    * ROWS: days can be missing, and "trailing 7 calendar days" differs
    * from "trailing 7 rows" exactly there.
    *
    * Scale design: the window runs over the DAILY AGGREGATE (#types ×
    * #days rows), never the event log — the corpus-sized work is one
    * keyed groupBy; the RANGE window then costs nothing at any scale. */
  private val r75: Fn = (s, d) => {
    val daily = events(s, d)
      .groupBy(col("event_type"),
        datediff(col("ts").cast("date"), lit("2024-01-01").cast("date")).as("day_idx"))
      .agg(count(lit(1)).as("n"),
        sum(col("value").cast(DecimalType(18, 2))).as("vsum"))
    val w = Window.partitionBy("event_type").orderBy("day_idx").rangeBetween(-6, 0)
    daily
      .withColumn("n7", sum(col("n")).over(w))
      .withColumn("days7", count(lit(1)).over(w))
      .withColumn("v7", sum(col("vsum")).over(w).cast(DecimalType(28, 2)))
      .select(col("event_type"), col("day_idx").cast(IntegerType).as("day_idx"),
        col("n"), col("vsum").cast(DecimalType(28, 2)).as("vsum"),
        col("n7"), col("days7"), col("v7"),
        round(col("n7").cast(DoubleType) / col("days7").cast(DoubleType), 4).as("avg7"))
      .orderBy("event_type", "day_idx")
  }
  private val r75Sql =
    """WITH daily AS (
      |  SELECT event_type,
      |         datediff('day', DATE '2024-01-01', CAST(ts AS DATE)) AS day_idx,
      |         count(*) AS n, sum(CAST(value AS DECIMAL(18,2))) AS vsum
      |  FROM events GROUP BY 1, 2)
      |SELECT event_type, CAST(day_idx AS INTEGER) AS day_idx, n,
      |       CAST(vsum AS DECIMAL(28,2)) AS vsum,
      |       CAST(sum(n) OVER w AS BIGINT) AS n7,
      |       count(*) OVER w AS days7,
      |       CAST(sum(vsum) OVER w AS DECIMAL(28,2)) AS v7,
      |       round(CAST(sum(n) OVER w AS DOUBLE) / count(*) OVER w, 4) AS avg7
      |FROM daily
      |WINDOW w AS (PARTITION BY event_type ORDER BY day_idx
      |             RANGE BETWEEN 6 PRECEDING AND CURRENT ROW)
      |ORDER BY event_type, day_idx""".stripMargin

  // --------------------------------------------- u15 key-continuity audit

  /** u15: surrogate-key continuity audit — per 1000-key bucket of
    * o_orderkey: population, observed span, and holes. TPC-H orderkeys
    * are deliberately sparse (8 of every 32), so the audit has real
    * signal at every SF; on a production ingest this is the
    * dropped-batch detector (a hole that doesn't match the generator's
    * known sparsity pattern = missing data).
    *
    * Scale design: single partial-agg'd groupBy on a map-side derived
    * bucket — one shuffle of 4 longs per (mapper, bucket). */
  private val u15: Fn = (s, d) =>
    orders(s, d)
      .select((col("o_orderkey") / 1000L).cast(LongType).as("bucket"), col("o_orderkey"))
      .groupBy("bucket")
      .agg(count(lit(1)).as("n_keys"),
        min(col("o_orderkey")).as("min_key"), max(col("o_orderkey")).as("max_key"))
      .select(col("bucket"), col("n_keys"), col("min_key"), col("max_key"),
        (col("max_key") - col("min_key") + 1L).as("span"),
        (col("max_key") - col("min_key") + 1L - col("n_keys")).as("holes"))
      .orderBy("bucket")
  private val u15Sql =
    """SELECT o_orderkey // 1000 AS bucket, count(*) AS n_keys,
      |       min(o_orderkey) AS min_key, max(o_orderkey) AS max_key,
      |       max(o_orderkey) - min(o_orderkey) + 1 AS span,
      |       max(o_orderkey) - min(o_orderkey) + 1 - count(*) AS holes
      |FROM orders GROUP BY 1 ORDER BY bucket""".stripMargin

  val all: Seq[Q] = Seq(
    Q("r70_sessionize", r70, Some(r70Sql)),
    Q("r71_ab_ztest", r71, Some(r71Sql)),
    Q("r72_conversion_latency", r72, Some(r72Sql)),
    Q("r73_rollup_report", r73, Some(r73Sql)),
    Q("r74_pivot_report", r74, Some(r74Sql)),
    Q("r75_moving_range_window", r75, Some(r75Sql)),
    Q("u15_key_continuity", u15, Some(u15Sql)))
}
