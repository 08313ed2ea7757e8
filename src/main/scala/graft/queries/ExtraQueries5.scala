package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DecimalType, DoubleType, IntegerType, LongType}
import graft.Tables
import graft.queries.Relational.{Fn, Q}

/** Round-7 continuation: order-statistics and monitoring operators the
  * registry still lacked — exact weighted median, CUSUM changepoint
  * detection, RFM customer segmentation (the quantile-cutoff map-side
  * pattern), and last-touch marketing attribution.
  *
  * Same determinism discipline as ExtraQueries3/4: money rides DECIMAL
  * from first touch (q01's `money` idiom), counts and cumulative
  * statistics stay integer (CUSUM is multiplied through by the day
  * count so no mean is ever subtracted in floating point), every
  * window is partitioned, unique-key tiebreaks wherever order matters.
  */
object ExtraQueries5 {

  private def events(s: SparkSession, d: String) = Tables.events(s, d)
  private def orders(s: SparkSession, d: String) = Tables.orders(s, d)
  private def lineitem(s: SparkSession, d: String) = Tables.lineitem(s, d)

  /** Order-independent exact decimal sum (Relational.dsum twin). */
  private def dsum(c: Column, scale: Int): Column =
    sum(c.cast(DecimalType(24, scale))).cast(DecimalType(38, scale))

  // ------------------------------------------------ r80 weighted median

  /** r80: exact WEIGHTED median — l_extendedprice weighted by
    * l_quantity per return flag: the "median price paid per unit"
    * statistic a pricing team wants, which plain `median` (row-weighted)
    * gets wrong. Lower weighted median: the smallest price whose
    * cumulative weight reaches half the group's total.
    *
    * Scale design: one l_returnflag-keyed shuffle carries BOTH the
    * running cumulative weight (ordered window) and the group total
    * (unordered full-frame window over the same partition key — no
    * second shuffle, no join). Quantities are exact longs (fixture
    * integrality asserted in the spec), so the running sum is
    * associative-exact at any parallelism; the qualifying rows form a
    * suffix of the price order, so `min(price)` over them IS the
    * crossing row — no per-group sort materialized at the driver, and
    * the window never sees more than one flag's rows in order. */
  private val r80: Fn = (s, d) => {
    val li = lineitem(s, d).select(
      col("l_returnflag").as("flag"),
      col("l_extendedprice").cast(DecimalType(12, 2)).as("price"),
      col("l_quantity").cast(LongType).as("qty"),
      col("l_orderkey"), col("l_linenumber"))
    val wOrd = Window.partitionBy("flag")
      .orderBy(col("price"), col("l_orderkey"), col("l_linenumber"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val wAll = Window.partitionBy("flag")
    li.withColumn("cumw", sum(col("qty")).over(wOrd))
      .withColumn("wtot", sum(col("qty")).over(wAll))
      .withColumn("n", count(lit(1)).over(wAll))
      .filter(col("cumw") * 2 >= col("wtot"))
      .groupBy("flag")
      .agg(
        min(col("price")).cast(DecimalType(12, 2)).as("w_median_price"),
        max(col("wtot")).as("total_qty"),
        max(col("n")).as("n_items"))
      .orderBy("flag")
  }
  private val r80Sql =
    """WITH li AS (
      |  SELECT l_returnflag AS flag,
      |         CAST(l_extendedprice AS DECIMAL(12,2)) AS price,
      |         CAST(l_quantity AS BIGINT) AS qty, l_orderkey, l_linenumber
      |  FROM lineitem),
      |cum AS (
      |  SELECT flag, price, qty,
      |         sum(qty) OVER (PARTITION BY flag ORDER BY price, l_orderkey, l_linenumber
      |                        ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cumw,
      |         sum(qty) OVER (PARTITION BY flag) AS wtot,
      |         count(*) OVER (PARTITION BY flag) AS n
      |  FROM li)
      |SELECT flag, CAST(min(price) AS DECIMAL(12,2)) AS w_median_price,
      |       CAST(max(wtot) AS BIGINT) AS total_qty, max(n) AS n_items
      |FROM cum WHERE cumw * 2 >= wtot
      |GROUP BY flag ORDER BY flag""".stripMargin

  // -------------------------------------------- r81 CUSUM changepoint

  /** r81: CUSUM changepoint detection over the daily event-volume
    * series, per event type — the classic Page (1954) cumulative-sum
    * scan: the day where the running deviation from the series mean
    * peaks is the single most likely level-shift point, and the peak
    * magnitude is the shift evidence a monitor alerts on.
    *
    * Exactness: the mean is never subtracted in floating point — the
    * deviation is multiplied through by the day count D, so
    * CUSUM_k = Σ_{i≤k}(cnt_i·D − T) is pure BIGINT algebra (T = total
    * events of the type) and identical at any parallelism or engine.
    * Scale shape: the corpus-sized work is one (type, day) partial-agg
    * shuffle; everything downstream operates on the tiny daily series
    * (types × days), where partitioned windows carry D, T, the running
    * sum and the peak without further shuffles of the raw events. */
  private val r81: Fn = (s, d) => {
    val daily = events(s, d)
      .groupBy(col("event_type"), to_date(col("ts")).as("day"))
      .agg(count(lit(1)).as("cnt"))
    val wAll = Window.partitionBy("event_type")
    val wOrd = Window.partitionBy("event_type").orderBy("day")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val dev = daily
      .withColumn("dd", count(lit(1)).over(wAll))
      .withColumn("tt", sum(col("cnt")).over(wAll))
      .withColumn("cusum", sum(col("cnt") * col("dd") - col("tt")).over(wOrd))
    dev.withColumn("max_abs", max(abs(col("cusum"))).over(wAll))
      .filter(abs(col("cusum")) === col("max_abs"))
      .groupBy("event_type")
      .agg(
        min(col("day")).as("changepoint_day"),
        max(col("dd")).as("n_days"),
        round(max(col("max_abs")).cast(DoubleType) / max(col("dd")).cast(DoubleType), 4)
          .as("peak_dev_events"))
      .orderBy("event_type")
  }
  private val r81Sql =
    """WITH daily AS (
      |  SELECT event_type, CAST(ts AS DATE) AS day, count(*) AS cnt
      |  FROM events GROUP BY 1, 2),
      |dev AS (
      |  SELECT event_type, day,
      |         count(*) OVER (PARTITION BY event_type) AS dd,
      |         sum(cnt) OVER (PARTITION BY event_type) AS tt,
      |         cnt
      |  FROM daily),
      |cus AS (
      |  SELECT event_type, day, dd,
      |         sum(cnt * dd - tt) OVER (PARTITION BY event_type ORDER BY day
      |                                  ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cusum
      |  FROM dev),
      |peak AS (
      |  SELECT event_type, day, dd, cusum,
      |         max(abs(cusum)) OVER (PARTITION BY event_type) AS max_abs
      |  FROM cus)
      |SELECT event_type, min(day) AS changepoint_day, max(dd) AS n_days,
      |       round(CAST(max(max_abs) AS DOUBLE) / CAST(max(dd) AS DOUBLE), 4) AS peak_dev_events
      |FROM peak WHERE abs(cusum) = max_abs
      |GROUP BY event_type ORDER BY event_type""".stripMargin

  // ------------------------------------------------ r82 RFM segmentation

  /** r82: RFM customer segmentation — recency/frequency/monetary
    * quintile scores (Hughes' classic direct-marketing model), reduced
    * to segment-level counts and value. The quantile machinery is the
    * scale-safe p14 pattern: per-customer statistics take ONE
    * custkey-keyed shuffle; the twelve quintile cutoffs come from one
    * tiny percentile aggregation over the per-customer relation and
    * ride back as a broadcast 1-row relation; every customer lands in
    * its 3-digit segment by twelve comparisons, map-side — no ntile,
    * no global sort, no single-partition window at any customer count.
    *
    * Determinism: monetary is an exact DECIMAL sum (q01's discipline);
    * recency/frequency are integers; `percentile` (Spark) and
    * `quantile_cont` (DuckDB) both linearly interpolate over doubles
    * from identical inputs (p14's precedent); score boundaries use <=
    * on the interpolated cutoffs identically in both engines. */
  private val r82: Fn = (s, d) => {
    val o = orders(s, d)
    val anchor = o.agg(max(to_date(col("o_orderdate"))).as("maxd"))
    val perCust = o
      .groupBy("o_custkey")
      .agg(
        max(to_date(col("o_orderdate"))).as("lastd"),
        count(lit(1)).as("freq"),
        dsum(col("o_totalprice"), 2).as("mon"))
      .crossJoin(broadcast(anchor))
      .select(
        col("o_custkey"),
        datediff(col("maxd"), col("lastd")).cast(LongType).as("rec"),
        col("freq"),
        col("mon"),
        col("mon").cast(DoubleType).as("mond"))
    val cuts = perCust.agg(
      percentile(col("rec").cast(DoubleType), lit(0.2)).as("r1"),
      percentile(col("rec").cast(DoubleType), lit(0.4)).as("r2"),
      percentile(col("rec").cast(DoubleType), lit(0.6)).as("r3"),
      percentile(col("rec").cast(DoubleType), lit(0.8)).as("r4"),
      percentile(col("freq").cast(DoubleType), lit(0.2)).as("f1"),
      percentile(col("freq").cast(DoubleType), lit(0.4)).as("f2"),
      percentile(col("freq").cast(DoubleType), lit(0.6)).as("f3"),
      percentile(col("freq").cast(DoubleType), lit(0.8)).as("f4"),
      percentile(col("mond"), lit(0.2)).as("m1"),
      percentile(col("mond"), lit(0.4)).as("m2"),
      percentile(col("mond"), lit(0.6)).as("m3"),
      percentile(col("mond"), lit(0.8)).as("m4"))
    def quint(v: Column, c1: Column, c2: Column, c3: Column, c4: Column): Column =
      when(v <= c1, 1).when(v <= c2, 2).when(v <= c3, 3).when(v <= c4, 4).otherwise(5)
    perCust.crossJoin(broadcast(cuts))
      .withColumn("r_score",
        (lit(6) - quint(col("rec").cast(DoubleType), col("r1"), col("r2"), col("r3"), col("r4")))
          .cast(IntegerType))
      .withColumn("f_score",
        quint(col("freq").cast(DoubleType), col("f1"), col("f2"), col("f3"), col("f4"))
          .cast(IntegerType))
      .withColumn("m_score",
        quint(col("mond"), col("m1"), col("m2"), col("m3"), col("m4")).cast(IntegerType))
      .groupBy("r_score", "f_score", "m_score")
      .agg(
        count(lit(1)).as("n_customers"),
        sum(col("mon")).cast(DecimalType(38, 2)).as("segment_value"))
      .orderBy("r_score", "f_score", "m_score")
  }
  private val r82Sql =
    """WITH per AS (
      |  SELECT o_custkey, max(CAST(o_orderdate AS DATE)) AS lastd,
      |         count(*) AS freq,
      |         CAST(sum(CAST(o_totalprice AS DECIMAL(24,2))) AS DECIMAL(38,2)) AS mon
      |  FROM orders GROUP BY 1),
      |anchored AS (
      |  SELECT o_custkey,
      |         CAST(date_diff('day', lastd, (SELECT max(CAST(o_orderdate AS DATE)) FROM orders)) AS BIGINT) AS rec,
      |         freq, mon, CAST(mon AS DOUBLE) AS mond
      |  FROM per),
      |cuts AS (
      |  SELECT quantile_cont(CAST(rec AS DOUBLE), 0.2) AS r1, quantile_cont(CAST(rec AS DOUBLE), 0.4) AS r2,
      |         quantile_cont(CAST(rec AS DOUBLE), 0.6) AS r3, quantile_cont(CAST(rec AS DOUBLE), 0.8) AS r4,
      |         quantile_cont(CAST(freq AS DOUBLE), 0.2) AS f1, quantile_cont(CAST(freq AS DOUBLE), 0.4) AS f2,
      |         quantile_cont(CAST(freq AS DOUBLE), 0.6) AS f3, quantile_cont(CAST(freq AS DOUBLE), 0.8) AS f4,
      |         quantile_cont(mond, 0.2) AS m1, quantile_cont(mond, 0.4) AS m2,
      |         quantile_cont(mond, 0.6) AS m3, quantile_cont(mond, 0.8) AS m4
      |  FROM anchored)
      |SELECT CAST(6 - (CASE WHEN CAST(rec AS DOUBLE) <= r1 THEN 1 WHEN CAST(rec AS DOUBLE) <= r2 THEN 2
      |                      WHEN CAST(rec AS DOUBLE) <= r3 THEN 3 WHEN CAST(rec AS DOUBLE) <= r4 THEN 4
      |                      ELSE 5 END) AS INTEGER) AS r_score,
      |       CAST(CASE WHEN CAST(freq AS DOUBLE) <= f1 THEN 1 WHEN CAST(freq AS DOUBLE) <= f2 THEN 2
      |                 WHEN CAST(freq AS DOUBLE) <= f3 THEN 3 WHEN CAST(freq AS DOUBLE) <= f4 THEN 4
      |                 ELSE 5 END AS INTEGER) AS f_score,
      |       CAST(CASE WHEN mond <= m1 THEN 1 WHEN mond <= m2 THEN 2
      |                 WHEN mond <= m3 THEN 3 WHEN mond <= m4 THEN 4
      |                 ELSE 5 END AS INTEGER) AS m_score,
      |       count(*) AS n_customers,
      |       CAST(sum(mon) AS DECIMAL(38,2)) AS segment_value
      |FROM anchored CROSS JOIN cuts
      |GROUP BY 1, 2, 3 ORDER BY r_score, f_score, m_score""".stripMargin

  // --------------------------------------- r84 last-touch attribution

  /** r84: last-touch marketing attribution — every purchase's value is
    * credited to the channel (click or view) the user touched most
    * recently BEFORE the purchase; purchases with no prior touch are
    * 'direct'. The canonical attribution model, and the window shape
    * matters: a carry-forward `last(..., ignoreNulls)` over a frame
    * ending at 1 PRECEDING — one user-keyed shuffle, each user's
    * timeline scanned once in order, never a self-join of events to
    * events (the n² temptation).
    *
    * Determinism: timeline order is (ts, event_id) — event_id is
    * unique, so the carry-forward value is total-ordered; revenue is
    * the q01 decimal discipline (value arrives on a 2-decimal grid,
    * asserted in the spec). */
  private val r84: Fn = (s, d) => {
    val w = Window.partitionBy("user_id").orderBy(col("ts"), col("event_id"))
      .rowsBetween(Window.unboundedPreceding, -1)
    events(s, d)
      .withColumn("touch",
        last(when(col("event_type").isin("click", "view"), col("event_type")), ignoreNulls = true)
          .over(w))
      .filter(col("event_type") === "purchase")
      .select(coalesce(col("touch"), lit("direct")).as("channel"), col("value"))
      .groupBy("channel")
      .agg(
        count(lit(1)).as("n_purchases"),
        dsum(col("value"), 2).as("revenue"))
      .orderBy("channel")
  }
  private val r84Sql =
    """WITH touched AS (
      |  SELECT event_type, value,
      |         last_value(CASE WHEN event_type IN ('click', 'view') THEN event_type END IGNORE NULLS)
      |           OVER (PARTITION BY user_id ORDER BY ts, event_id
      |                 ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS touch
      |  FROM events)
      |SELECT coalesce(touch, 'direct') AS channel, count(*) AS n_purchases,
      |       CAST(sum(CAST(value AS DECIMAL(24,2))) AS DECIMAL(38,2)) AS revenue
      |FROM touched WHERE event_type = 'purchase'
      |GROUP BY 1 ORDER BY channel""".stripMargin

  val all: Seq[Q] = Seq(
    Q("r80_weighted_median", r80, Some(r80Sql)),
    Q("r81_cusum_changepoint", r81, Some(r81Sql)),
    Q("r82_rfm_segments", r82, Some(r82Sql)),
    Q("r84_attribution", r84, Some(r84Sql)))
}
