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
  /** Daily-count kernel shared with the streaming CUSUM monitor — the
    * mergeable state (counts are additive across arrival waves). */
  private[graft] def dailyCounts(events: DataFrame): DataFrame =
    events.groupBy(col("event_type"), to_date(col("ts")).as("day"))
      .agg(count(lit(1)).as("cnt"))

  /** CUSUM layer over the tiny (type, day) series — r81's published
    * shape, also the per-wave report of the streaming twin. */
  private[graft] def cusumFromDaily(daily: DataFrame): DataFrame = {
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

  private val r81: Fn = (s, d) => cusumFromDaily(dailyCounts(events(s, d)))
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
    // ONE orders scan/shuffle: the per-customer relation is persisted
    // and feeds all three consumers (anchor, cutoffs, scoring) — the
    // global anchor date is just max(lastd) over it, so no separate
    // corpus-sized aggregation exists at all (r46/s19 persist discipline)
    val perCust0 = orders(s, d)
      .groupBy("o_custkey")
      .agg(
        max(to_date(col("o_orderdate"))).as("lastd"),
        count(lit(1)).as("freq"),
        dsum(col("o_totalprice"), 2).as("mon"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val anchor = perCust0.agg(max(col("lastd")).as("maxd"))
    val perCust = perCust0
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

  // ------------------------------------------------ t24 Heaps-law fit

  private def docs(s: SparkSession, d: String) = Tables.documents(s, d)
  private val toks: Column = split(col("text"), " ")

  /** t24: Heaps'-law vocabulary-growth fit — V(n) ≈ K·n^β, the
    * corpus-health diagnostic (β far outside its natural band signals
    * boilerplate flooding or synthetic text). The engine measures
    * TRIGRAM-type vocabulary V and trigram count n at 10 FIXED
    * checkpoints (doc-id deciles) and fits ln V = ln K + β·ln n by
    * least squares. Trigram types, not unigrams: the fixture's unigram
    * vocabulary (31 words) saturates inside the first decile, making
    * the unigram curve degenerate (cyy = 0 → 0/0); n-gram type growth
    * is the standard instrument for small-vocabulary corpora, and the
    * operator is unchanged for natural text (set the n-gram order).
    *
    * Scale design: the corpus-sized work is one doc-partitioned window
    * (trigram stream) + two keyed shuffles (type → first-occurrence
    * doc; doc → trigram count); the checkpoint curve never materializes
    * a per-doc running vocabulary (the unpartitioned-cumsum temptation,
    * which funnels all docs through one reducer). Instead each type/doc
    * row meets the broadcast 10-row checkpoint relation and contributes
    * map-side to the 10 conditional counts — constant-size state at any
    * corpus size.
    *
    * Determinism: counts are exact; each checkpoint's (ln n, ln V) is
    * truncated to 1e-6 fixed point (1e-9 would overflow the Σxy BIGINT
    * at ln-scale magnitudes), the regression's sufficient statistics
    * are exact BIGINT algebra (r60's discipline), and each term is cast
    * to double once for the final divisions. */
  private val t24: Fn = (s, d) => {
    val tokPos = docs(s, d).select(col("doc_id"), posexplode(toks).as(Seq("pos", "token")))
    val w = Window.partitionBy("doc_id").orderBy("pos")
    val tok = tokPos
      .withColumn("p1", lag(col("token"), 1).over(w))
      .withColumn("p2", lag(col("token"), 2).over(w))
      .filter(col("p2").isNotNull)
      .select(col("doc_id"),
        concat_ws(" ", col("p2"), col("p1"), col("token")).as("token"))
    val fdoc = tok.groupBy("token").agg(min(col("doc_id")).as("fdoc"))
    val perdoc = tok.groupBy("doc_id").agg(count(lit(1)).as("ntok"))
    val cps = docs(s, d).agg(max(col("doc_id")).as("maxid"))
      .select(explode(sequence(lit(1), lit(10))).as("k"), col("maxid"))
      .select(col("k"), (col("maxid") * col("k") / 10).cast(LongType).as("ck"))
    val vk = fdoc.crossJoin(broadcast(cps))
      .filter(col("fdoc") <= col("ck"))
      .groupBy("k").agg(count(lit(1)).as("v"))
    val nk = perdoc.crossJoin(broadcast(cps))
      .filter(col("doc_id") <= col("ck"))
      .groupBy("k").agg(sum(col("ntok")).as("n"))
    val pts = vk.join(nk, "k").select(
      (log(col("n").cast(DoubleType)) * 1e6).cast(LongType).as("x"),
      (log(col("v").cast(DoubleType)) * 1e6).cast(LongType).as("y"))
    val st = pts.agg(
      count(lit(1)).as("np"), sum(col("x")).as("sx"), sum(col("y")).as("sy"),
      // dec-lift (overflow lint): one squared fixed-point log fits in
      // long; the point-set sums accumulate in DECIMAL(38,0)
      sum((col("x") * col("x")).cast(DecimalType(38, 0))).cast(LongType).as("sxx"),
      sum((col("x") * col("y")).cast(DecimalType(38, 0))).cast(LongType).as("sxy"),
      sum((col("y") * col("y")).cast(DecimalType(38, 0))).cast(LongType).as("syy"))
    val (np, sx, sy, sxx, sxy, syy) =
      (col("np"), col("sx"), col("sy"), col("sxx"), col("sxy"), col("syy"))
    val cxy = (np * sxy - sx * sy).cast(DoubleType)
    val cxx = (np * sxx - sx * sx).cast(DoubleType)
    val cyy = (np * syy - sy * sy).cast(DoubleType)
    st.select(
      np.cast(LongType).as("n_points"),
      round(cxy / cxx, 6).as("beta"),
      round((sy.cast(DoubleType) - (cxy / cxx) * sx.cast(DoubleType)) / np.cast(DoubleType) / 1e6, 6)
        .as("ln_k"),
      round(cxy * cxy / (cxx * cyy), 6).as("r2"))
  }
  private val t24Sql =
    """WITH tokpos AS (
      |  SELECT doc_id, unnest(string_split(text, ' ')) AS token,
      |         CAST(unnest(range(1, len(string_split(text, ' ')) + 1)) AS INTEGER) AS pos
      |  FROM documents),
      |tri AS (
      |  SELECT doc_id, lag(token, 2) OVER w AS p2, lag(token, 1) OVER w AS p1, token
      |  FROM tokpos WINDOW w AS (PARTITION BY doc_id ORDER BY pos)),
      |tok AS (SELECT doc_id, concat(p2, ' ', p1, ' ', token) AS token FROM tri WHERE p2 IS NOT NULL),
      |fdoc AS (SELECT token, min(doc_id) AS fdoc FROM tok GROUP BY 1),
      |perdoc AS (SELECT doc_id, count(*) AS ntok FROM tok GROUP BY 1),
      |cps AS (SELECT k, CAST((SELECT max(doc_id) FROM documents) * k // 10 AS BIGINT) AS ck
      |        FROM (SELECT unnest(range(1, 11)) AS k)),
      |vk AS (SELECT k, count(*) AS v FROM fdoc CROSS JOIN cps WHERE fdoc <= ck GROUP BY 1),
      |nk AS (SELECT k, CAST(sum(ntok) AS BIGINT) AS n FROM perdoc CROSS JOIN cps WHERE doc_id <= ck GROUP BY 1),
      |pts AS (SELECT CAST(trunc(ln(CAST(n AS DOUBLE)) * 1e6) AS BIGINT) AS x,
      |               CAST(trunc(ln(CAST(v AS DOUBLE)) * 1e6) AS BIGINT) AS y
      |        FROM vk JOIN nk USING (k)),
      |st AS (SELECT count(*) AS np, CAST(sum(x) AS BIGINT) AS sx, CAST(sum(y) AS BIGINT) AS sy,
      |              CAST(sum(x * x) AS BIGINT) AS sxx, CAST(sum(x * y) AS BIGINT) AS sxy,
      |              CAST(sum(y * y) AS BIGINT) AS syy
      |       FROM pts)
      |SELECT CAST(np AS BIGINT) AS n_points,
      |       round(CAST(np * sxy - sx * sy AS DOUBLE) / CAST(np * sxx - sx * sx AS DOUBLE), 6) AS beta,
      |       round((CAST(sy AS DOUBLE) - (CAST(np * sxy - sx * sy AS DOUBLE) / CAST(np * sxx - sx * sx AS DOUBLE)) * CAST(sx AS DOUBLE)) / CAST(np AS DOUBLE) / 1e6, 6) AS ln_k,
      |       round(CAST(np * sxy - sx * sy AS DOUBLE) * CAST(np * sxy - sx * sy AS DOUBLE) /
      |             (CAST(np * sxx - sx * sx AS DOUBLE) * CAST(np * syy - sy * sy AS DOUBLE)), 6) AS r2
      |FROM st""".stripMargin

  // --------------------------------------------- t25 PMI collocations

  /** t25: pointwise-mutual-information collocation mining — the top-20
    * adjacent word pairs whose co-occurrence most exceeds chance
    * (Church & Hanks 1990), with a min-count floor of 5 so rare-pair
    * PMI noise can't dominate. PMI = ln(c_xy·N / (c_x·c_y)) over the
    * bigram stream's own marginals.
    *
    * Scale shape: t16's bigram machinery — one doc-partitioned window
    * builds adjacency, three keyed partial-agg shuffles count pairs and
    * marginals, the marginal joins are vocabulary-sized, and the final
    * top-20 plans as TakeOrderedAndProject (per-partition heaps, no
    * global sort). Parity: the PMI argument is formed from exact BIGINT
    * products divided once (both well inside 2^63), its ln truncated to
    * 1e-9 fixed point; rank ties break on the pair itself. */
  private val t25: Fn = (s, d) => {
    val tokPos = docs(s, d).select(col("doc_id"), posexplode(toks).as(Seq("pos", "token")))
    val w = Window.partitionBy("doc_id").orderBy("pos")
    val bg = tokPos
      .withColumn("prev", lag(col("token"), 1).over(w))
      .filter(col("prev").isNotNull)
      .select(col("prev").as("x"), col("token").as("y"))
    val tot = bg.agg(count(lit(1)).as("nn"))
    val pair = bg.groupBy("x", "y").agg(count(lit(1)).as("cxy")).filter(col("cxy") >= 5)
    val mx = bg.groupBy("x").agg(count(lit(1)).as("cx"))
    val my = bg.groupBy("y").agg(count(lit(1)).as("cy"))
    pair.join(mx, "x").join(my, "y").crossJoin(broadcast(tot))
      .withColumn("pmi_fp",
        (log((col("cxy") * col("nn")).cast(DoubleType) / (col("cx") * col("cy")).cast(DoubleType)) * 1e9)
          .cast(LongType))
      .orderBy(desc("pmi_fp"), col("x"), col("y"))
      .limit(20)
      .select(col("x"), col("y"), col("cxy").as("n_pair"),
        round(col("pmi_fp").cast(DoubleType) / 1e9, 6).as("pmi"))
  }
  private val t25Sql =
    """WITH tokpos AS (
      |  SELECT doc_id, unnest(string_split(text, ' ')) AS token,
      |         CAST(unnest(range(1, len(string_split(text, ' ')) + 1)) AS INTEGER) AS pos
      |  FROM documents),
      |bg AS (
      |  SELECT prev AS x, token AS y FROM (
      |    SELECT token, lag(token) OVER (PARTITION BY doc_id ORDER BY pos) AS prev
      |    FROM tokpos) t WHERE prev IS NOT NULL),
      |tot AS (SELECT count(*) AS nn FROM bg),
      |pair AS (SELECT x, y, count(*) AS cxy FROM bg GROUP BY 1, 2 HAVING count(*) >= 5),
      |mx AS (SELECT x, count(*) AS cx FROM bg GROUP BY 1),
      |my AS (SELECT y, count(*) AS cy FROM bg GROUP BY 1)
      |SELECT x, y, cxy AS n_pair,
      |       round(CAST(CAST(trunc(ln(CAST(cxy * nn AS DOUBLE) / CAST(cx * cy AS DOUBLE)) * 1e9) AS BIGINT) AS DOUBLE) / 1e9, 6) AS pmi
      |FROM pair JOIN mx USING (x) JOIN my USING (y), tot
      |ORDER BY CAST(trunc(ln(CAST(cxy * nn AS DOUBLE) / CAST(cx * cy AS DOUBLE)) * 1e9) AS BIGINT) DESC, x, y
      |LIMIT 20""".stripMargin

  // ----------------------------------------- t26 LLR keyword extraction

  /** t26: per-source characteristic-term extraction by Dunning's
    * log-likelihood ratio (Dunning 1993) — the statistically sound
    * "what words make this source different" test that raw TF-IDF
    * over-weights rare noise on. For each (source, token), G² = 2·Σ
    * O·ln(O·N/(R·C)) over the 2×2 contingency cells; the top-3
    * positively-associated tokens (min count 5) per source.
    *
    * Scale shape: two keyed count shuffles (source×token cells, token
    * margins) + a broadcast source-margin/total relation (source count
    * is a fixed catalog, not corpus-sized); the per-source top-3 is a
    * window PARTITIONED by source. Parity: every cell term is exact
    * BIGINT products (all ≤ N² < 2^63 at any fixture SF) divided once
    * in double, ln truncated to 1e-9 fixed point per CELL before the
    * 4-term sum, so association order can't move the hash. */
  private val t26: Fn = (s, d) => {
    val tok = docs(s, d).select(col("source"), explode(toks).as("token"))
    val cell = tok.groupBy("source", "token").agg(count(lit(1)).as("a"))
    val srcm = tok.groupBy("source").agg(count(lit(1)).as("ns"))
    val tokm = tok.groupBy("token").agg(count(lit(1)).as("ct"))
    val tot = tok.agg(count(lit(1)).as("nn"))
    def term(o: Column, row: Column, colm: Column, nn: Column): Column =
      when(o > 0,
        o * (log((o * nn).cast(DoubleType) / (row * colm).cast(DoubleType)) * 1e9).cast(LongType))
        .otherwise(0L)
    val j = cell.join(tokm, "token").join(broadcast(srcm), "source").crossJoin(broadcast(tot))
      .filter(col("a") >= 5 && col("a") * col("nn") > col("ns") * col("ct"))
      .withColumn("b", col("ns") - col("a"))
      .withColumn("c", col("ct") - col("a"))
      .withColumn("dd", col("nn") - col("ns") - col("ct") + col("a"))
      .withColumn("g2_fp",
        lit(2L) * (term(col("a"), col("ns"), col("ct"), col("nn")) +
          term(col("b"), col("ns"), col("nn") - col("ct"), col("nn")) +
          term(col("c"), col("nn") - col("ns"), col("ct"), col("nn")) +
          term(col("dd"), col("nn") - col("ns"), col("nn") - col("ct"), col("nn"))))
    val wr = Window.partitionBy("source").orderBy(desc("g2_fp"), col("token"))
    j.withColumn("rk", row_number().over(wr).cast(LongType))
      .filter(col("rk") <= 3)
      .select(col("source"), col("rk"), col("token"), col("a").as("n_in_source"),
        round(col("g2_fp").cast(DoubleType) / 1e9, 4).as("llr"))
      .orderBy("source", "rk")
  }
  private val t26Sql =
    """WITH tok AS (SELECT source, unnest(string_split(text, ' ')) AS token FROM documents),
      |cell AS (SELECT source, token, count(*) AS a FROM tok GROUP BY 1, 2),
      |srcm AS (SELECT source, count(*) AS ns FROM tok GROUP BY 1),
      |tokm AS (SELECT token, count(*) AS ct FROM tok GROUP BY 1),
      |tot AS (SELECT count(*) AS nn FROM tok),
      |j AS (
      |  SELECT source, token, a, ns, ct, nn,
      |         ns - a AS b, ct - a AS c, nn - ns - ct + a AS dd
      |  FROM cell JOIN tokm USING (token) JOIN srcm USING (source), tot
      |  WHERE a >= 5 AND a * nn > ns * ct),
      |scored AS (
      |  SELECT source, token, a,
      |         2 * (CASE WHEN a > 0 THEN a * CAST(trunc(ln(CAST(a * nn AS DOUBLE) / CAST(ns * ct AS DOUBLE)) * 1e9) AS BIGINT) ELSE 0 END
      |            + CASE WHEN b > 0 THEN b * CAST(trunc(ln(CAST(b * nn AS DOUBLE) / CAST(ns * (nn - ct) AS DOUBLE)) * 1e9) AS BIGINT) ELSE 0 END
      |            + CASE WHEN c > 0 THEN c * CAST(trunc(ln(CAST(c * nn AS DOUBLE) / CAST((nn - ns) * ct AS DOUBLE)) * 1e9) AS BIGINT) ELSE 0 END
      |            + CASE WHEN dd > 0 THEN dd * CAST(trunc(ln(CAST(dd * nn AS DOUBLE) / CAST((nn - ns) * (nn - ct) AS DOUBLE)) * 1e9) AS BIGINT) ELSE 0 END) AS g2_fp
      |  FROM j),
      |ranked AS (
      |  SELECT source, token, a, g2_fp,
      |         row_number() OVER (PARTITION BY source ORDER BY g2_fp DESC, token) AS rk
      |  FROM scored)
      |SELECT source, rk, token, a AS n_in_source,
      |       round(CAST(g2_fp AS DOUBLE) / 1e9, 4) AS llr
      |FROM ranked WHERE rk <= 3 ORDER BY source, rk""".stripMargin

  // ------------------------------------------------- s18 range search

  /** s18: radius (range) similarity search — "everything within cosine
    * τ of the probe", the retrieval mode top-k can't express (dedup
    * sweeps and recall-oriented RAG want ALL sufficiently-close items,
    * however many there are). τ = 0.2 against the shared 5-probe set;
    * output is the per-probe result-set profile (count, mean/max sim)
    * rather than an unbounded listing.
    *
    * Scale shape: probes broadcast, ONE scan of the corpus scores and
    * filters map-side, then a probe-keyed partial aggregation — no
    * window, no sort, no shuffle of the corpus itself. The mean rides
    * as a 4dp-fixed-point integer sum (sim is already rounded to the
    * 4dp grid, so the scaled values are exact integers and the sum is
    * order-independent). */
  private val s18: Fn = (s, d) => {
    val base = Tables.embeddings(s, d)
    val probes = base.filter(col("vec_id") < 5)
      .select(col("vec_id").as("q_id"), col("embedding").as("qv"))
    base.join(broadcast(probes), col("vec_id") =!= col("q_id"))
      .withColumn("sim", round(graft.functions.VectorOps.cosine(col("qv"), col("embedding")), 4))
      .filter(col("sim") >= 0.2)
      // round, not truncate: 0.2001*1e4 is 2000.999… in binary — trunc
      // would drop a grid step where DuckDB's round() does not
      .withColumn("sim_fp", round(col("sim") * 1e4, 0).cast(LongType))
      .groupBy("q_id")
      .agg(
        count(lit(1)).as("n_in_range"),
        round(sum(col("sim_fp")).cast(DoubleType) / 1e4 / count(lit(1)), 6).as("mean_sim"),
        max(col("sim")).as("max_sim"))
      .orderBy("q_id")
  }
  private val s18Sql =
    """WITH q AS (SELECT vec_id AS q_id, embedding AS qv FROM embeddings WHERE vec_id < 5),
      |scored AS (
      |  SELECT q.q_id,
      |         round(list_dot_product(q.qv::DOUBLE[], e.embedding::DOUBLE[]) /
      |               sqrt(list_dot_product(q.qv::DOUBLE[], q.qv::DOUBLE[]) *
      |                    list_dot_product(e.embedding::DOUBLE[], e.embedding::DOUBLE[])), 4) AS sim
      |  FROM embeddings e JOIN q ON e.vec_id <> q.q_id),
      |inr AS (SELECT q_id, sim, CAST(round(sim * 1e4) AS BIGINT) AS sim_fp FROM scored WHERE sim >= 0.2)
      |SELECT q_id, count(*) AS n_in_range,
      |       round(CAST(sum(sim_fp) AS DOUBLE) / 1e4 / count(*), 6) AS mean_sim,
      |       max(sim) AS max_sim
      |FROM inr GROUP BY 1 ORDER BY q_id""".stripMargin

  // ---------------------------------------------- u17 join-fanout audit

  /** u17: join-cardinality (fan-out) audit — the per-key multiplicity
    * profile of the fact table against each join dimension, i.e. the
    * numbers a query planner's join-size estimate lives or dies on and
    * the first thing to check before shipping a new join at 100 TB
    * (a hidden 10⁵-row hot key turns a "small" join into a skew
    * incident). Per join axis: key count, max/avg fan-out, p50/p99
    * fan-out, and the row share of the single hottest key.
    *
    * Shape: one keyed partial-agg shuffle per axis over the fact table;
    * the percentile/aggregate layer runs on the per-key count relation
    * (dimension-sized, not fact-sized). The orders axis measures true
    * fan-out including fanout-0 keys via a right join to the dimension.
    * All counts exact; avg/p-quantiles are the p14 percentile parity
    * pairing; shares are one double division rounded once. */
  private val u17: Fn = (s, d) => {
    val li = lineitem(s, d)
    def axis(name: String, keyed: DataFrame): DataFrame = {
      keyed.agg(
        count(lit(1)).as("n_keys"),
        sum(col("fo")).as("n_rows"),
        max(col("fo")).as("max_fanout"),
        round(sum(col("fo")).cast(DoubleType) / count(lit(1)).cast(DoubleType), 4)
          .as("avg_fanout"),
        percentile(col("fo").cast(DoubleType), lit(0.5)).as("p50_fanout"),
        percentile(col("fo").cast(DoubleType), lit(0.99)).as("p99_fanout"))
        .select(lit(name).as("axis"), col("n_keys"), col("n_rows"), col("max_fanout"),
          col("avg_fanout"), col("p50_fanout"), col("p99_fanout"),
          round(col("max_fanout").cast(DoubleType) / col("n_rows").cast(DoubleType), 6)
            .as("hottest_key_share"))
    }
    val byOrder = orders(s, d).select(col("o_orderkey"))
      .join(li.select(col("l_orderkey")), col("o_orderkey") === col("l_orderkey"), "left")
      .groupBy("o_orderkey").agg(count(col("l_orderkey")).as("fo"))
    val byPart = li.groupBy("l_partkey").agg(count(lit(1)).as("fo"))
    val bySupp = li.groupBy("l_suppkey").agg(count(lit(1)).as("fo"))
    axis("order", byOrder).unionAll(axis("part", byPart)).unionAll(axis("supplier", bySupp))
      .orderBy("axis")
  }
  private val u17Sql =
    """WITH byorder AS (
      |  SELECT o.o_orderkey, count(l.l_orderkey) AS fo
      |  FROM orders o LEFT JOIN lineitem l ON o.o_orderkey = l.l_orderkey
      |  GROUP BY 1),
      |bypart AS (SELECT l_partkey, count(*) AS fo FROM lineitem GROUP BY 1),
      |bysupp AS (SELECT l_suppkey, count(*) AS fo FROM lineitem GROUP BY 1),
      |u AS (
      |  SELECT 'order' AS axis, count(*) AS n_keys, CAST(sum(fo) AS BIGINT) AS n_rows,
      |         max(fo) AS max_fanout,
      |         round(CAST(sum(fo) AS DOUBLE) / CAST(count(*) AS DOUBLE), 4) AS avg_fanout,
      |         quantile_cont(CAST(fo AS DOUBLE), 0.5) AS p50_fanout,
      |         quantile_cont(CAST(fo AS DOUBLE), 0.99) AS p99_fanout
      |  FROM byorder
      |  UNION ALL
      |  SELECT 'part', count(*), CAST(sum(fo) AS BIGINT), max(fo),
      |         round(CAST(sum(fo) AS DOUBLE) / CAST(count(*) AS DOUBLE), 4),
      |         quantile_cont(CAST(fo AS DOUBLE), 0.5), quantile_cont(CAST(fo AS DOUBLE), 0.99)
      |  FROM bypart
      |  UNION ALL
      |  SELECT 'supplier', count(*), CAST(sum(fo) AS BIGINT), max(fo),
      |         round(CAST(sum(fo) AS DOUBLE) / CAST(count(*) AS DOUBLE), 4),
      |         quantile_cont(CAST(fo AS DOUBLE), 0.5), quantile_cont(CAST(fo AS DOUBLE), 0.99)
      |  FROM bysupp)
      |SELECT axis, n_keys, n_rows, max_fanout, avg_fanout, p50_fanout, p99_fanout,
      |       round(CAST(max_fanout AS DOUBLE) / CAST(n_rows AS DOUBLE), 6) AS hottest_key_share
      |FROM u ORDER BY axis""".stripMargin

  // --------------------------------------------- m12 audio clipping QA

  /** m12: audio QA — clipping and silence detection over the DECODED
    * sample grid: per audio document, how many of the 32 resampled
    * amplitude points sit at the rails (≥250 of 255: clipping) or the
    * floor (≤5: silence), plus the RMS level — the three numbers an
    * ingest QA gate alerts on before bad audio poisons a training mix.
    * Runs through the real batched decode path
    * ([[graft.multimodal.Multimodal.audioResample]], m06's operator),
    * so the oracle's relational replay of the interpolation doubles as
    * an independent end-to-end check of the decode stage.
    *
    * Determinism: the resampled v's are bitwise-portable doubles (m06's
    * contract); threshold comparisons are exact; v² is truncated to
    * 1e-6 fixed point per sample BEFORE the per-doc sum (t14's
    * discipline), and the RMS takes one sqrt of the same double on both
    * engines. */
  private val m12: Fn = (s, d) => {
    val res = graft.multimodal.Multimodal.audioResample(
      graft.multimodal.Multimodal.attachPayload(
        docs(s, d).filter(col("source") === "src1"))
        .filter(col("meta.mime") === "audio/wav"))
    res
      .withColumn("v2_fp", (col("v") * col("v") * 1e6).cast(LongType))
      .groupBy("doc_id")
      .agg(
        count(lit(1)).as("n_samples"),
        sum(when(col("v") >= 250.0, 1L).otherwise(0L)).as("n_clipped"),
        sum(when(col("v") <= 5.0, 1L).otherwise(0L)).as("n_silent"),
        round(sqrt(sum(col("v2_fp")).cast(DoubleType) / 1e6 / count(lit(1)).cast(DoubleType)), 6)
          .as("rms"))
      .orderBy("doc_id")
  }
  private val m12Sql = {
    val S = 32
    val p = s"CAST(t * (len - 1) AS DOUBLE) / ${S - 1}.0"
    val i0 = s"CAST(floor($p) AS INTEGER)"
    val b0 = s"CAST(arr[$i0 + 1] AS DOUBLE)"
    val b1 = s"CAST(arr[least($i0 + 1, len - 1) + 1] AS DOUBLE)"
    s"""WITH a AS (
       |  SELECT doc_id, list_transform(split(text, ''), c -> ascii(c)) AS arr,
       |         length(text) AS len
       |  FROM documents WHERE source = 'src1' AND length(text) > 0),
       |g AS (SELECT doc_id, arr, len, CAST(unnest(range($S)) AS INTEGER) AS t FROM a),
       |v AS (
       |  SELECT doc_id,
       |    CASE WHEN len = 1 THEN CAST(arr[1] AS DOUBLE)
       |         ELSE $b0 + ($b1 - $b0) * ($p - floor($p)) END AS v
       |  FROM g)
       |SELECT doc_id, count(*) AS n_samples,
       |       CAST(sum(CASE WHEN v >= 250.0 THEN 1 ELSE 0 END) AS BIGINT) AS n_clipped,
       |       CAST(sum(CASE WHEN v <= 5.0 THEN 1 ELSE 0 END) AS BIGINT) AS n_silent,
       |       round(sqrt(CAST(sum(CAST(trunc(v * v * 1e6) AS BIGINT)) AS DOUBLE) / 1e6 / count(*)), 6) AS rms
       |FROM v GROUP BY 1 ORDER BY doc_id""".stripMargin
  }

  // --------------------------------- p21 point-in-time label assembly

  /** p21: point-in-time-correct training-label assembly — every
    * purchase (label event) is joined to the user's state attribute AS
    * OF the purchase instant, the feature-store discipline that
    * prevents label leakage (using any later attribute value would let
    * the future leak into training features). State = the user's
    * last-seen non-purchase event type (r49's SCD2 attribute), but the
    * join is implemented the scalable way: NOT label⋈interval (the
    * range-join temptation, which re-shuffles per feature table) — the
    * state stream and the label stream ride ONE user-partitioned
    * window, and a carry-forward `last(..., ignoreNulls)` over the
    * strictly-preceding frame delivers the as-of value in a single
    * pass. Exactly the r84 window shape; what differs is the output
    * grain (row-level labeled examples, the training-set contract) and
    * the leakage guarantee being pinned.
    *
    * Scale: one user-keyed shuffle, timeline scanned once per user;
    * deterministic order (ts, event_id). 2% user slice (the r49 cohort
    * discipline) keeps the registered result review-sized. */
  private val p21: Fn = (s, d) => {
    val w = Window.partitionBy("user_id").orderBy(col("ts"), col("event_id"))
      .rowsBetween(Window.unboundedPreceding, -1)
    events(s, d)
      .filter(col("user_id") % 50 === 0)
      .withColumn("state_asof",
        last(when(col("event_type") =!= "purchase", col("event_type")), ignoreNulls = true)
          .over(w))
      .filter(col("event_type") === "purchase")
      .select(col("user_id"), col("event_id"),
        unix_micros(col("ts")).as("label_us"),
        coalesce(col("state_asof"), lit("none")).as("state_asof"),
        col("value").cast(DecimalType(12, 2)).as("label_value"))
      .orderBy("user_id", "event_id")
  }
  private val p21Sql =
    """WITH cohort AS (
      |  SELECT user_id, event_id, ts, event_type, value FROM events WHERE user_id % 50 = 0),
      |st AS (
      |  SELECT user_id, event_id, ts, event_type, value,
      |         last_value(CASE WHEN event_type <> 'purchase' THEN event_type END IGNORE NULLS)
      |           OVER (PARTITION BY user_id ORDER BY ts, event_id
      |                 ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS state_asof
      |  FROM cohort)
      |SELECT user_id, event_id, epoch_us(ts) AS label_us,
      |       coalesce(state_asof, 'none') AS state_asof,
      |       CAST(value AS DECIMAL(12,2)) AS label_value
      |FROM st WHERE event_type = 'purchase'
      |ORDER BY user_id, event_id""".stripMargin

  // ---------------------------------------------- r85 seasonality lift

  /** r85: weekday×hour seasonality profile — observed traffic per
    * (dow, hour) cell against the independence expectation
    * E = rowtot·coltot/N, reported as lift (the r68 contingency algebra
    * at calendar grain): the heatmap capacity planning and anomaly
    * baselines are built from.
    *
    * Shape: ONE corpus-sized partial-agg shuffle to the 7×24 cell
    * relation, which is then persisted (r46's precedent: the margin
    * branches are column-pruned differently, so exchange reuse can't
    * dedup them — without the persist each margin re-scans the events)
    * and re-aggregated three ways (7-row, 24-row, 1-row), all riding
    * back as broadcasts. Lift is exact-integer products (n·N, row·col)
    * divided once; dow is pinned to DuckDB's Sunday=0 convention
    * (Spark's dayofweek is Sunday=1, hence the −1). */
  private val r85: Fn = (s, d) => {
    val cells = events(s, d)
      .groupBy((dayofweek(col("ts")) - 1).as("dow"), hour(col("ts")).as("hr"))
      .agg(count(lit(1)).as("n"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val rowm = cells.groupBy("dow").agg(sum(col("n")).as("rowtot"))
    val colm = cells.groupBy("hr").agg(sum(col("n")).as("coltot"))
    val tot = cells.agg(sum(col("n")).as("nn"))
    cells
      .join(broadcast(rowm), "dow")
      .join(broadcast(colm), "hr")
      .crossJoin(broadcast(tot))
      .select(col("dow"), col("hr"), col("n"),
        round((col("rowtot") * col("coltot")).cast(DoubleType) / col("nn").cast(DoubleType), 4)
          .as("expected"),
        round((col("n") * col("nn")).cast(DoubleType) / (col("rowtot") * col("coltot")).cast(DoubleType), 4)
          .as("lift"))
      .orderBy("dow", "hr")
  }
  private val r85Sql =
    """WITH cells AS (
      |  SELECT dayofweek(ts) AS dow, hour(ts) AS hr, count(*) AS n
      |  FROM events GROUP BY 1, 2),
      |rowm AS (SELECT dow, CAST(sum(n) AS BIGINT) AS rowtot FROM cells GROUP BY 1),
      |colm AS (SELECT hr, CAST(sum(n) AS BIGINT) AS coltot FROM cells GROUP BY 1),
      |tot AS (SELECT CAST(sum(n) AS BIGINT) AS nn FROM cells)
      |SELECT dow, hr, n,
      |       round(CAST(rowtot * coltot AS DOUBLE) / CAST(nn AS DOUBLE), 4) AS expected,
      |       round(CAST(n * nn AS DOUBLE) / CAST(rowtot * coltot AS DOUBLE), 4) AS lift
      |FROM cells JOIN rowm USING (dow) JOIN colm USING (hr), tot
      |ORDER BY dow, hr""".stripMargin

  // ------------------------------------------ r86 hypothetical-set rank

  /** r86: hypothetical-set rank — SQL's `RANK(x) WITHIN GROUP (ORDER BY
    * …)` ordered-set aggregate, which Spark has no native form of:
    * where WOULD a 150,000.00 order rank inside each priority class if
    * inserted now? The canonical what-if primitive for pricing/SLA
    * dashboards.
    *
    * Implemented the scale-safe way: hyp_rank = 1 + count(v > x) is a
    * pure conditional aggregation — one keyed partial-agg shuffle, no
    * sort, no window, no per-group materialization, identical at any
    * group size. percent_rank/cume_dist derive from the same exact
    * integers with one rounded division each (the SQL-standard
    * definitions: (rank−1)/n and (n_le+1)/(n+1)). Money compares on
    * the DECIMAL grid (q01 discipline) so ties are exact. */
  private val r86: Fn = (s, d) => {
    val x = lit(java.math.BigDecimal.valueOf(150000.00)).cast(DecimalType(12, 2))
    orders(s, d)
      .select(col("o_orderpriority"), col("o_totalprice").cast(DecimalType(12, 2)).as("v"))
      .groupBy("o_orderpriority")
      .agg(
        count(lit(1)).as("n_orders"),
        (sum(when(col("v") > x, 1L).otherwise(0L)) + 1L).as("hyp_rank"),
        sum(when(col("v") <= x, 1L).otherwise(0L)).as("n_le"))
      .select(col("o_orderpriority"), col("n_orders"), col("hyp_rank"),
        round((col("hyp_rank") - 1).cast(DoubleType) / col("n_orders").cast(DoubleType), 6)
          .as("hyp_percent_rank"),
        round((col("n_le") + 1).cast(DoubleType) / (col("n_orders") + 1).cast(DoubleType), 6)
          .as("hyp_cume_dist"))
      .orderBy("o_orderpriority")
  }
  private val r86Sql =
    """WITH o AS (
      |  SELECT o_orderpriority, CAST(o_totalprice AS DECIMAL(12,2)) AS v FROM orders)
      |SELECT o_orderpriority, count(*) AS n_orders,
      |       CAST(sum(CASE WHEN v > CAST(150000.00 AS DECIMAL(12,2)) THEN 1 ELSE 0 END) + 1 AS BIGINT) AS hyp_rank,
      |       round(CAST(sum(CASE WHEN v > CAST(150000.00 AS DECIMAL(12,2)) THEN 1 ELSE 0 END) AS DOUBLE)
      |             / CAST(count(*) AS DOUBLE), 6) AS hyp_percent_rank,
      |       round(CAST(sum(CASE WHEN v <= CAST(150000.00 AS DECIMAL(12,2)) THEN 1 ELSE 0 END) + 1 AS DOUBLE)
      |             / CAST(count(*) + 1 AS DOUBLE), 6) AS hyp_cume_dist
      |FROM o GROUP BY 1 ORDER BY o_orderpriority""".stripMargin

  // ------------------------------------------------ t27 token burstiness

  /** t27: token burstiness — the Fano factor (variance-to-mean ratio of
    * per-document counts, zero-docs included) of each frequent token:
    * uniformly-scattered function words sit near 1, topically bursty
    * content words far above (Church & Gale 1995) — the signal that
    * separates them without a stopword list.
    *
    * Exactness: with D docs, total count ct and Σc² = s2, Fano =
    * (D·s2 − ct²)/(D·ct) — pure BIGINT numerator/denominator from two
    * keyed count shuffles, divided ONCE (the r39 exact-moments
    * discipline; zero-count docs enter through D without being
    * materialized). Products stay far under 2^63 at any fixture SF
    * (ct, s2 ≤ corpus tokens; D ≤ docs). Top-15 plans as
    * TakeOrderedAndProject on (fano desc, token). */
  private val t27: Fn = (s, d) => {
    val perDoc = docs(s, d).select(col("doc_id"), explode(toks).as("token"))
      .groupBy("token", "doc_id").agg(count(lit(1)).as("c"))
    val dTot = docs(s, d).agg(count(lit(1)).as("dd"))
    val stats = perDoc.groupBy("token")
      // dec-lift (overflow lint): one doc's squared token count fits in
      // long; the per-token sum of squares accumulates in DECIMAL(38,0)
      .agg(sum(col("c")).as("ct"),
        sum((col("c") * col("c")).cast(DecimalType(38, 0))).cast(LongType).as("s2"),
        count(lit(1)).as("df"))
      .filter(col("ct") >= 50)
      .crossJoin(broadcast(dTot))
    stats
      .withColumn("fano",
        round((col("dd") * col("s2") - col("ct") * col("ct")).cast(DoubleType)
          / (col("dd") * col("ct")).cast(DoubleType), 6))
      .orderBy(desc("fano"), col("token"))
      .limit(15)
      .select("token", "ct", "df", "fano")
  }
  private val t27Sql =
    """WITH perdoc AS (
      |  SELECT token, doc_id, count(*) AS c FROM (
      |    SELECT doc_id, unnest(string_split(text, ' ')) AS token FROM documents) t
      |  GROUP BY 1, 2),
      |dtot AS (SELECT count(*) AS dd FROM documents),
      |stats AS (
      |  SELECT token, CAST(sum(c) AS BIGINT) AS ct, CAST(sum(c * c) AS BIGINT) AS s2,
      |         count(*) AS df
      |  FROM perdoc GROUP BY 1 HAVING CAST(sum(c) AS BIGINT) >= 50)
      |SELECT token, ct, df,
      |       round(CAST(dd * s2 - ct * ct AS DOUBLE) / CAST(dd * ct AS DOUBLE), 6) AS fano
      |FROM stats, dtot
      |ORDER BY fano DESC, token LIMIT 15""".stripMargin

  // ------------------------------------------- r87 interval coverage

  /** r87: interval-union coverage — per event type, the total wall time
    * covered by the union of the [ts, ts+5min) activity intervals, plus
    * utilization of the observed span: "how much of the month was this
    * system actually active", which naive Σ durations OVERCOUNTS
    * wherever intervals overlap (r76 measures the overlap peak; this
    * measures the union). Same sweep-line marks and tie discipline as
    * r76 — one type-partitioned ordered window carries the running
    * occupancy AND the gap to the next mark; covered time = Σ gaps
    * where occupancy > 0. All micros stay BIGINT; the only doubles are
    * the two final reported divisions. */
  private val r87: Fn = (s, d) => {
    val e = events(s, d).select(col("event_type"), col("event_id"), unix_micros(col("ts")).as("us"))
    val marks = e.select(col("event_type"), col("us").as("t"), lit(1L).as("delta"), col("event_id"))
      .unionAll(e.select(col("event_type"), (col("us") + 300L * 1000000L).as("t"),
        lit(-1L).as("delta"), col("event_id")))
    val wOrd = Window.partitionBy("event_type").orderBy("t", "delta", "event_id")
    val swept = marks
      .withColumn("occ", sum(col("delta")).over(wOrd.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .withColumn("nxt", lead(col("t"), 1).over(wOrd))
    swept.groupBy("event_type")
      .agg(
        (count(lit(1)) / 2).cast(LongType).as("n_events"),
        sum(when(col("occ") > 0 && col("nxt").isNotNull, col("nxt") - col("t")).otherwise(0L))
          .as("covered_us"),
        (max(col("t")) - min(col("t"))).as("span_us"))
      .select(col("event_type"), col("n_events"),
        round(col("covered_us").cast(DoubleType) / 1e6, 3).as("covered_sec"),
        round(col("covered_us").cast(DoubleType) / col("span_us").cast(DoubleType), 6)
          .as("utilization"))
      .orderBy("event_type")
  }
  private val r87Sql =
    """WITH e AS (SELECT event_type, event_id, epoch_us(ts) AS us FROM events),
      |marks AS (
      |  SELECT event_type, us AS t, CAST(1 AS BIGINT) AS delta, event_id FROM e
      |  UNION ALL
      |  SELECT event_type, us + 300 * 1000000 AS t, CAST(-1 AS BIGINT) AS delta, event_id FROM e),
      |swept AS (
      |  SELECT event_type, t,
      |         sum(delta) OVER (PARTITION BY event_type ORDER BY t, delta, event_id
      |                          ROWS UNBOUNDED PRECEDING) AS occ,
      |         lead(t) OVER (PARTITION BY event_type ORDER BY t, delta, event_id) AS nxt
      |  FROM marks)
      |SELECT event_type, CAST(count(*) // 2 AS BIGINT) AS n_events,
      |       round(CAST(sum(CASE WHEN occ > 0 AND nxt IS NOT NULL THEN nxt - t ELSE 0 END) AS DOUBLE) / 1e6, 3) AS covered_sec,
      |       round(CAST(sum(CASE WHEN occ > 0 AND nxt IS NOT NULL THEN nxt - t ELSE 0 END) AS DOUBLE)
      |             / CAST(max(t) - min(t) AS DOUBLE), 6) AS utilization
      |FROM swept GROUP BY event_type ORDER BY event_type""".stripMargin

  val all: Seq[Q] = Seq(
    Q("t27_burstiness", t27, Some(t27Sql)),
    Q("r87_interval_coverage", r87, Some(r87Sql)),
    Q("r85_seasonality_lift", r85, Some(r85Sql)),
    Q("r86_hypothetical_rank", r86, Some(r86Sql)),
    Q("u17_fanout_audit", u17, Some(u17Sql)),
    Q("m12_audio_clipping", m12, Some(m12Sql)),
    Q("p21_pit_labels", p21, Some(p21Sql)),
    Q("r80_weighted_median", r80, Some(r80Sql)),
    Q("r81_cusum_changepoint", r81, Some(r81Sql)),
    Q("r82_rfm_segments", r82, Some(r82Sql)),
    Q("r84_attribution", r84, Some(r84Sql)),
    Q("t24_heaps_fit", t24, Some(t24Sql)),
    Q("t25_pmi_collocations", t25, Some(t25Sql)),
    Q("t26_llr_keywords", t26, Some(t26Sql)),
    Q("s18_range_search", s18, Some(s18Sql)))
}
