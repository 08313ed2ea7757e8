package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Shuffle-shaping utilities for the 100 TB posture: key salting for
  * skewed joins/aggregations and bucketed-layout helpers for
  * shuffle-free co-located joins.
  *
  * AQE's skew-join handling (on by default in our sessions) covers most
  * skew at runtime by splitting oversized partitions; explicit salting
  * remains the tool when one key dominates so heavily that even split
  * partitions hot-spot, or for skewed AGGREGATIONS (AQE does not split
  * those): the classic two-phase partial→final rewrite below.
  */
object ScaleOps {

  /** Two-phase (salted) aggregation: groupBy(key, salt) partial → drop
    * salt, final combine. Correct for decomposable aggregates expressed
    * as (partialExprs, finalExprs) pairs over the salted intermediates.
    * Simplified to counts/sums — the shapes skewed pipelines actually
    * hot-spot on. */
  def saltedCountSum(df: DataFrame, key: Column, valueCol: Column,
                     saltBuckets: Int = 16): DataFrame = {
    val salted = df.withColumn("__salt", pmod(spark_partition_id() + monotonically_increasing_id(), lit(saltBuckets)))
    salted
      .groupBy(key.as("key"), col("__salt"))
      .agg(count(lit(1)).as("__n"), sum(valueCol).as("__s"))
      .groupBy(col("key"))
      .agg(sum(col("__n")).as("n"), sum(col("__s")).as("s"))
  }

  /** Salted join for a skewed LEFT side against a small-ish right side:
    * left gets a random-ish deterministic salt, right is replicated
    * `saltBuckets` times, join key becomes (key, salt). Row-for-row
    * equivalent to the plain join; spreads one hot key over
    * `saltBuckets` reducers. */
  def saltedJoin(skewedLeft: DataFrame, right: DataFrame, leftKey: String,
                 rightKey: String, saltBuckets: Int = 8): DataFrame = {
    val saltedL = skewedLeft.withColumn("__salt",
      pmod(xxhash64(monotonically_increasing_id()), lit(saltBuckets)).cast("int"))
    val replicatedR = right.withColumn("__salt",
      explode(sequence(lit(0), lit(saltBuckets - 1))))
    saltedL.join(replicatedR,
        saltedL(leftKey) === replicatedR(rightKey) && saltedL("__salt") === replicatedR("__salt"))
      .drop("__salt")
  }

  /** Write both sides bucketed by the join key so subsequent joins are
    * exchange-free (co-located). Requires a session with a warehouse dir
    * (saveAsTable); at 100 TB this is the standing layout for
    * fact-to-fact joins reused across runs. */
  def writeBucketed(df: DataFrame, table: String, key: String, buckets: Int): Unit =
    df.write.mode("overwrite")
      .bucketBy(buckets, key).sortBy(key)
      .format("parquet").saveAsTable(table)
}
