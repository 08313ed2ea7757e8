package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{LongType, StringType}

/** Manifest-audited sharded export — the delivery step of a training-set
  * build: data lands as one directory per deterministic shard, next to
  * a manifest recording each shard's row count and an order-independent
  * content fingerprint. A consumer (or a later re-run) recomputes the
  * manifest from the files alone and compares — byte-level provenance
  * without trusting the producer.
  *
  * Fingerprint design: per-row md5 over the stringified row keyed by a
  * salt (engine-portable, no xxhash), folded per shard with BIT_XOR —
  * commutative and associative, so the fold is partition- and
  * order-independent (a sum could also carry counts but wraps under
  * ANSI; XOR cannot overflow). Collision-finding XOR cancellation needs
  * adversarial row pairs, not the accidental corruption/truncation the
  * manifest exists to catch.
  */
object Export {

  /** Order-independent shard fingerprint: leading 15 hex digits of the
    * salted row md5 as a BIGINT, XOR-folded. */
  def rowFp(row: Column): Column =
    conv(substring(md5(concat(lit("manifest:"), row.cast(StringType))), 1, 15), 16, 10)
      .cast(LongType)

  /** Manifest relation for `df` keyed by `idCol`: (shard, n_rows, fp).
    * Deterministic at any parallelism — also a registry query (p11). */
  def manifest(df: DataFrame, idCol: String): DataFrame =
    df.withColumn("shard", graft.functions.DetHash.shardOf(col(idCol)))
      .withColumn("__fp", rowFp(col(idCol)))
      .groupBy("shard")
      .agg(count(lit(1)).as("n_rows"), expr("bit_xor(__fp)").as("fp"))
      .orderBy("shard")

  /** Write `df` sharded + its manifest JSON; returns the manifest. */
  def shardedExport(df: DataFrame, idCol: String, path: String): DataFrame = {
    df.withColumn("shard", graft.functions.DetHash.shardOf(col(idCol)))
      .repartition(col("shard"))
      .write.mode("overwrite").partitionBy("shard").parquet(s"$path/data")
    val m = manifest(df, idCol)
    m.coalesce(1).write.mode("overwrite").json(s"$path/manifest")
    m
  }

  /** Recompute the manifest from the written files (the audit). */
  def audit(spark: SparkSession, idCol: String, path: String): DataFrame =
    spark.read.parquet(s"$path/data")
      .withColumn("__fp", rowFp(col(idCol)))
      .groupBy("shard")
      .agg(count(lit(1)).as("n_rows"), expr("bit_xor(__fp)").as("fp"))
      .orderBy("shard")
}
