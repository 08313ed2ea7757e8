package graft.etl

import org.apache.spark.sql.{Column, DataFrame, Row}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{IntegerType, LongType, StringType, StructField, StructType}

/** The reference's enrichment gating, reproduced deliberately
  * (SURVEY.md O15-O17; `/root/reference/etl.py:336-423`):
  *
  *   1. head-`maxRows` slice FIRST (`etl.py:355-364`),
  *   2. THEN the tuning-set membership split (`etl.py:366-378`) — a row
  *      outside the first `maxRows` is bypassed even if it is in the
  *      tuning set (slice-then-filter order matters),
  *   3. bypassed / failed rows get `'N/A'` (`etl.py:400-414`),
  *   4. output order is processed-rows-first, bypassed-after
  *      (`etl.py:409-414`) — made explicit here since Spark frames have
  *      no implicit order.
  *
  * Spark has no implicit row order either, so the reference's "first N
  * rows in API order" becomes `row_number` over an explicit order key.
  * Scale note: a global row_number needs a single-partition window — fine
  * for the head-N gate's own semantics (N is small: the reference caps at
  * 100k rows) but the ungated classifier path below is the one meant for
  * 100 TB runs (pure per-row expression, no window, no shuffle).
  */
object Enrich {

  final case class GateConfig(
      maxRows: Option[Long],
      tuningSet: Option[Seq[String]],
      aiColumn: String = "ai_determined_value")

  /** Vectorized gated enrichment (deterministic classifier path). */
  def gated(flat: DataFrame, cfg: GateConfig, orderKey: String = "nct_id"): DataFrame = {
    val rn = row_number().over(Window.orderBy(col(orderKey))).cast(LongType)
    val sliced = cfg.maxRows.map(n => rn <= n).getOrElse(lit(true))
    val inSet = cfg.tuningSet
      .map(ks => col(orderKey).isin(ks: _*))
      .getOrElse(lit(true))
    val processed = sliced && inSet
    flat
      .withColumn("processed", processed.cast(IntegerType))
      .withColumn(cfg.aiColumn,
        when(col("processed") === 1, RuleClassifier.classifyCol(col("criteria")))
          .otherwise(lit("N/A")))
      // reference output order: processed first, bypassed after (etl.py:409-414)
      .orderBy(desc("processed"), col(orderKey))
  }

  /** Success/bypass counters (SURVEY.md O18; `etl.py:390-421`'s running
    * counts) as observed metrics: zero extra passes — the counts ride on
    * whatever action consumes the frame. Read them from the returned
    * Observation after an action. */
  def withMetrics(gated: DataFrame): (DataFrame, org.apache.spark.sql.Observation) = {
    val obs = org.apache.spark.sql.Observation("ai_metrics")
    val observed = gated.observe(obs,
      sum(col("processed")).cast(LongType).as("processed"),
      sum(when(col("processed") === 0, 1L).otherwise(0L)).as("bypassed"))
    (observed, obs)
  }

  /** Ungated full-table enrichment — the 100 TB path: two chained
    * codegen'd projections, no window, no shuffle. The lowered/split
    * parts are materialized as real columns first so the classifier CASE
    * references attributes, not ~10 copies of the `split_part(lower(…))`
    * subtree (Catalyst keeps multi-use non-cheap aliases un-inlined). */
  def enrichAll(flat: DataFrame, aiColumn: String = "ai_determined_value"): DataFrame =
    flat
      .withColumn("_lc", lower(col("criteria")))
      .withColumn("_incl", split_part(col("_lc"), lit("exclusion criteria"), lit(1)))
      .withColumn("_excl", split_part(col("_lc"), lit("exclusion criteria"), lit(2)))
      .withColumn(aiColumn,
        RuleClassifier.classifyParts(col("_lc"), col("_incl"), col("_excl")))
      .drop("_lc", "_incl", "_excl")

  /** The remote-classifier operator shape (SURVEY.md O13-O14): the
    * reference calls the LLM once per row, strictly serially, sleeping
    * `api_delay` between calls (`etl.py:329-331`) — ≤2 rows/s. Here the
    * same black-box call runs on executors via `mapPartitions` with
    *   - one client per partition (the reference re-creates none, we
    *     amortize setup; `etl.py:236-273` init-once semantics preserved),
    *   - a per-partition token bucket so aggregate QPS is bounded by
    *     `partitions × perPartitionQps` (tune partition count to the
    *     provider quota),
    *   - transient failures retry up to `maxRetries` times with
    *     exponential backoff, THEN fall to 'N/A' (the reference swallows
    *     every exception into the default fill, `etl.py:400-407`; a
    *     production transport retries first — bounded, so one poisoned
    *     row can never wedge a partition). Every retry attempt is one
    *     more remote call against the same provider quota, so the token
    *     bucket paces ATTEMPTS, not rows: backoff widens the bucket gap
    *     by 2^attempt and the row after a retried row still waits the
    *     full interval behind the last real call,
    *   - `globalQps`, when set, is the CLUSTER-level budget — the O14
    *     semantics at scale (the provider quota is per API key, not per
    *     executor): the per-partition rate derives as
    *     `globalQps / plannedPartitions`, so aggregate attempt rate is
    *     bounded by the budget REGARDLESS of parallelism — doubling the
    *     partition count halves each partition's rate instead of
    *     doubling the aggregate (r9 verdict item 7). The law this buys:
    *     the wall-clock floor for N rows is N/globalQps whatever the
    *     partitioning (EnrichSpec pins it at 2 and 4 partitions).
    * Called with [[RuleRowClassifier]] in tests; a real LLM impl plugs in
    * without touching the operator. Retries preserve the oracled output
    * (`etl_enrich_seam`): seam failures are deterministic per row
    * content, so exhaustion lands in the same 'N/A' the no-retry form
    * produced. */
  def mapPartitionsEnrich(
      flat: DataFrame,
      classifier: RowClassifier,
      aiColumn: String = "ai_determined_value",
      perPartitionQps: Double = 2.0,
      maxRetries: Int = 2,
      globalQps: Option[Double] = None): DataFrame = {
    val schema = StructType(flat.schema.fields :+ StructField(aiColumn, StringType, nullable = false))
    val criteriaIdx = flat.schema.fieldIndex("criteria")
    // planned parallelism is known at plan time; deriving the rate here
    // (not inside the task) keeps one source of truth per job even under
    // speculative re-execution of individual partitions
    val effectiveQps = globalQps
      .map(q => q / math.max(1, flat.rdd.getNumPartitions))
      .getOrElse(perPartitionQps)
    val minIntervalNanos = (1e9 / effectiveQps).toLong
    val enriched = flat.rdd.mapPartitions { iter =>
      // client-per-partition seam: a remote impl opens its connection here
      var lastCall = 0L
      def throttle(backoffExp: Int): Unit = {
        val gap = minIntervalNanos << math.min(backoffExp, 20)
        val wait = lastCall + gap - System.nanoTime()
        if (lastCall != 0L && wait > 0) Thread.sleep(wait / 1000000, (wait % 1000000).toInt)
        lastCall = System.nanoTime()
      }
      iter.map { row =>
        val criteria = if (row.isNullAt(criteriaIdx)) "N/A" else row.getString(criteriaIdx)
        var label = "N/A"
        var attempt = 0
        var done = false
        while (!done) {
          throttle(attempt) // attempt 0 waits 1 interval, retry k waits 2^k
          try { label = classifier.classify(criteria).getOrElse("N/A"); done = true }
          catch { case _: Exception => // error-to-default fill, etl.py:400-407
            attempt += 1
            if (attempt > maxRetries) done = true // bounded: exhausted -> 'N/A'
          }
        }
        Row.fromSeq(row.toSeq :+ label)
      }
    }
    flat.sparkSession.createDataFrame(enriched, schema)
  }
}
