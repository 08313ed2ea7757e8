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

  /** Gap-based sessions of the event log (30-minute inactivity splits)
    * at MICROSECOND resolution — q23's gaps-and-islands machinery, but
    * on exact epoch-micros longs rather than q23's second-truncated
    * timestamps (sub-second gaps count here), feeding r70's per-user
    * rollup rather than q23's per-session listing.
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

  /** r70: per-user engagement rollup over [[sessions]] — session count,
    * total events, longest session, dwell time, events/session: the
    * user-grain table product analytics reads (q23 emits the
    * session-grain listing; this is its second-order reduction, the
    * DAU-engagement shape). All statistics reduce from exact
    * micros/longs; the only doubles are the two final divisions. */
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

  // ------------------------------------- t22 language-ID confusion matrix

  /** t22: confusion matrix of the t07 language-ID heuristic against the
    * labeled `lang` column — the classifier-evaluation readout (t07
    * emits per-doc guesses; this measures them). Per (lang, guess):
    * count and within-lang share, plus the correctness flag.
    *
    * Scale design: one map-side guess expression + one keyed groupBy;
    * the share window runs over the (#langs × #guesses ≤ 20-row)
    * AGGREGATE, partitioned by lang — never the corpus. */
  private val t22: Fn = (s, d) => {
    val g = Tables.documents(s, d)
      .select(col("lang"), TextQueries.langGuessCol.as("lang_guess"))
      .groupBy("lang", "lang_guess")
      .agg(count(lit(1)).as("n"))
    val w = Window.partitionBy("lang")
    g.withColumn("lang_total", sum(col("n")).over(w))
      .select(col("lang"), col("lang_guess"), col("n"),
        (col("lang") === col("lang_guess")).as("correct"),
        round(col("n").cast(DoubleType) / col("lang_total").cast(DoubleType), 6).as("share"))
      .orderBy("lang", "lang_guess")
  }
  private val t22Sql =
    s"""WITH g AS (
       |  SELECT lang, ${TextQueries.langGuessSqlExpr} AS lang_guess, count(*) AS n
       |  FROM documents GROUP BY 1, 2)
       |SELECT lang, lang_guess, n, lang = lang_guess AS correct,
       |       round(CAST(n AS DOUBLE) / CAST(sum(n) OVER (PARTITION BY lang) AS DOUBLE), 6) AS share
       |FROM g ORDER BY lang, lang_guess""".stripMargin

  // ----------------------------------- d17 TF-IDF cosine near-dup pairs

  /** d17: TF-IDF-weighted cosine near-duplicates over the BIGRAM term
    * space, with rare-term blocking — the lexical-vector complement to
    * d02 (binary bag Jaccard) and d06 (dense embeddings): weighting by
    * idf makes shared RARE phrasing dominate the score, which is what
    * separates true near-copies from same-template boilerplate. Bigrams,
    * not unigrams, because the fixture's unigram vocabulary is 31 tokens
    * with df≈0.8N — zero selectivity for either weighting or blocking.
    *
    * Scale design: candidates come ONLY from terms with df ∈ [2,20]
    * (a term contributes ≤ C(20,2) pairs — the d03 prefix-filter
    * discipline, never n²); the full cosine for the surviving pairs is
    * two keyed joins on (doc, term). Parity: weights are exact longs
    * (tf × trunc(ln(N/df)·1e6)), dots/norms are exact decimal sums;
    * the single double division + sqrt happens per surviving pair. */
  private val d17: Fn = (s, d) => {
    val ws = split(col("text"), " ")
    val bigrams = zip_with(
      slice(ws, lit(1), size(ws) - 1), slice(ws, lit(2), size(ws) - 1),
      (a, b) => concat(a, lit(" "), b))
    val tf = Tables.documents(s, d)
      .select(col("doc_id"), explode(bigrams).as("bg"))
      .groupBy("doc_id", "bg").agg(count(lit(1)).as("tf"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val df = tf.groupBy("bg").agg(count(lit(1)).as("df"))
    val nd = Tables.documents(s, d).agg(count(lit(1)).cast(DoubleType).as("nd"))
    val wt = tf.join(df, "bg").crossJoin(broadcast(nd))
      .select(col("doc_id"), col("bg"),
        (col("tf") * (log(col("nd") / col("df").cast(DoubleType)) * 1e6).cast(LongType)).as("wfp"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val norms = wt.groupBy("doc_id")
      .agg(sum(col("wfp").cast(DecimalType(38, 0)) * col("wfp")).as("n2"))
    val rare = tf.join(df.filter(col("df").between(2, 20)), "bg").select("doc_id", "bg")
    val cand = rare.select(col("doc_id").as("da"), col("bg"))
      .join(rare.select(col("doc_id").as("db"), col("bg")), "bg")
      .filter(col("da") < col("db"))
      .select("da", "db").distinct()
    val dots = cand
      .join(wt.select(col("doc_id").as("da"), col("bg"), col("wfp").as("wa")), "da")
      .join(wt.select(col("doc_id").as("db"), col("bg"), col("wfp").as("wb")), Seq("db", "bg"))
      .groupBy("da", "db")
      .agg(sum(col("wa").cast(DecimalType(38, 0)) * col("wb")).as("dot"))
    dots
      .join(norms.select(col("doc_id").as("da"), col("n2").as("na2")), "da")
      .join(norms.select(col("doc_id").as("db"), col("n2").as("nb2")), "db")
      .select(col("da").as("doc_a"), col("db").as("doc_b"),
        round(col("dot").cast(DoubleType)
          / sqrt(col("na2").cast(DoubleType) * col("nb2").cast(DoubleType)), 6).as("cosine"))
      .filter(col("cosine") >= 0.6)
      .orderBy("doc_a", "doc_b")
  }
  private val d17Sql =
    """WITH w AS (SELECT doc_id, string_split(text, ' ') AS ws FROM documents),
      |tf AS (SELECT doc_id, bg, count(*) AS tf
      |       FROM (SELECT doc_id, unnest(list_transform(range(1, len(ws)),
      |                                   i -> ws[i] || ' ' || ws[i+1])) AS bg FROM w)
      |       GROUP BY 1, 2),
      |df AS (SELECT bg, count(*) AS df FROM tf GROUP BY 1),
      |n AS (SELECT CAST(count(*) AS DOUBLE) AS nd FROM documents),
      |wt AS (SELECT tf.doc_id, tf.bg,
      |              CAST(tf.tf AS HUGEINT)
      |              * CAST(trunc(ln(n.nd / CAST(df.df AS DOUBLE)) * 1e6) AS HUGEINT) AS wfp
      |       FROM tf JOIN df USING (bg), n),
      |norms AS (SELECT doc_id, sum(wfp * wfp) AS n2 FROM wt GROUP BY 1),
      |rare AS (SELECT tf.doc_id, tf.bg FROM tf JOIN df USING (bg) WHERE df.df BETWEEN 2 AND 20),
      |cand AS (SELECT DISTINCT a.doc_id AS da, b.doc_id AS db
      |         FROM rare a JOIN rare b ON a.bg = b.bg AND a.doc_id < b.doc_id),
      |dots AS (SELECT c.da, c.db, sum(wa.wfp * wb.wfp) AS dot
      |         FROM cand c
      |         JOIN wt wa ON wa.doc_id = c.da
      |         JOIN wt wb ON wb.doc_id = c.db AND wb.bg = wa.bg
      |         GROUP BY 1, 2)
      |SELECT da AS doc_a, db AS doc_b, cs AS cosine
      |FROM (SELECT dots.da, dots.db,
      |             round(CAST(dot AS DOUBLE)
      |                   / sqrt(CAST(na.n2 AS DOUBLE) * CAST(nb.n2 AS DOUBLE)), 6) AS cs
      |      FROM dots
      |      JOIN norms na ON na.doc_id = dots.da
      |      JOIN norms nb ON nb.doc_id = dots.db) t
      |WHERE cs >= 0.6 ORDER BY doc_a, doc_b""".stripMargin

  // --------------------------------------- s15 cluster exemplar selection

  /** s15: exemplar selection — the 3 vectors nearest their label's
    * centroid, per label; the "show me a prototype of each cluster"
    * primitive data-curation UIs and active-learning loops run after
    * any clustering (here the given labels; d11's kmeans at scale).
    *
    * Parity is the hard part: a naive double centroid (avg of floats)
    * is partition-order-dependent. Instead every coordinate is
    * fixed-pointed to 1e-7 (exact long), the centroid rides as
    * (Σxfp, n) — never divided — and the squared distance is computed
    * in the n-scaled integer lattice: Σ(xfp·n − Σxfp)², an exact
    * decimal both engines reduce identically in any order. The single
    * sqrt+divide happens on the 3·#labels winners.
    *
    * Scale design: explode to (vec, dim) rows → one keyed groupBy for
    * centroids (#labels × dim rows, broadcastable) → map-side join +
    * one keyed distance groupBy → per-label top-3 window (partitioned;
    * #labels reducers, each ranking its own cluster's members). */
  private val s15: Fn = (s, d) => {
    val x = Tables.embeddings(s, d)
      .select(col("vec_id"), col("label"), posexplode(col("embedding")))
      .select(col("vec_id"), col("label"), (col("pos") + 1).as("pos"),
        (col("col").cast(DoubleType) * lit(1e7)).cast(LongType).as("xfp"))
    val cent = x.groupBy("label", "pos")
      .agg(sum(col("xfp").cast(DecimalType(38, 0))).as("sfp"), count(lit(1)).as("n"))
    val diff = col("xfp").cast(DecimalType(38, 0)) * col("n") - col("sfp")
    val d2 = x.join(broadcast(cent), Seq("label", "pos"))
      .groupBy("vec_id", "label")
      .agg(sum(diff * diff).as("dist2"), max(col("n")).as("n"))
    val w = Window.partitionBy("label").orderBy(col("dist2"), col("vec_id"))
    d2.withColumn("rk", row_number().over(w).cast(LongType))
      .filter(col("rk") <= 3)
      .select(col("label"), col("rk"), col("vec_id"),
        round(sqrt(col("dist2").cast(DoubleType))
          / (col("n").cast(DoubleType) * lit(1e7)), 6).as("rms_dist"))
      .orderBy("label", "rk")
  }
  private val s15Sql =
    """WITH x AS (
      |  SELECT vec_id, label, (u).pos AS pos,
      |         CAST(trunc((u).x * 1e7) AS HUGEINT) AS xfp
      |  FROM (SELECT vec_id, label,
      |               unnest(list_transform(range(1, len(embedding) + 1),
      |                      i -> {'pos': i, 'x': embedding[i]::DOUBLE})) AS u
      |        FROM embeddings)),
      |cent AS (SELECT label, pos, sum(xfp) AS sfp, count(*) AS n FROM x GROUP BY 1, 2),
      |d2 AS (SELECT x.vec_id, x.label,
      |              sum((x.xfp * c.n - c.sfp) * (x.xfp * c.n - c.sfp)) AS dist2,
      |              max(c.n) AS n
      |       FROM x JOIN cent c ON c.label = x.label AND c.pos = x.pos
      |       GROUP BY 1, 2)
      |SELECT label, rk, vec_id,
      |       round(sqrt(CAST(dist2 AS DOUBLE)) / (CAST(n AS DOUBLE) * 1e7), 6) AS rms_dist
      |FROM (SELECT label, vec_id, dist2, n,
      |             row_number() OVER (PARTITION BY label ORDER BY dist2, vec_id) AS rk
      |      FROM d2) t
      |WHERE rk <= 3 ORDER BY label, rk""".stripMargin

  val all: Seq[Q] = Seq(
    Q("r70_sessionize", r70, Some(r70Sql)),
    Q("r71_ab_ztest", r71, Some(r71Sql)),
    Q("r72_conversion_latency", r72, Some(r72Sql)),
    Q("r73_rollup_report", r73, Some(r73Sql)),
    Q("r74_pivot_report", r74, Some(r74Sql)),
    Q("r75_moving_range_window", r75, Some(r75Sql)),
    Q("u15_key_continuity", u15, Some(u15Sql)),
    Q("t22_langid_confusion", t22, Some(t22Sql)),
    Q("d17_tfidf_cosine_dedup", d17, Some(d17Sql)),
    Q("s15_cluster_exemplars", s15, Some(s15Sql)))
}
