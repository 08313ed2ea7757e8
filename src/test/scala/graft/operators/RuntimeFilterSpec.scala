package graft.operators

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.SparkTestSession

/** Runtime-filter receipt: with a selective dimension-side predicate,
  * Spark injects a bloom filter that prunes fact-side rows BEFORE the
  * join shuffle — at 100 TB this is the difference between shuffling
  * the whole fact table and shuffling the matching slice. Thresholds
  * are lowered so the fixture-sized build side qualifies; production
  * defaults (10 MB creation side) fire on real dimension tables.
  */
class RuntimeFilterSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  private val sf = "/root/testdata/sf0.001"

  test("selective dim filter injects a bloom filter on the fact side") {
    val conf = spark.conf
    val saved = Seq(
      "spark.sql.optimizer.runtime.bloomFilter.enabled",
      "spark.sql.optimizer.runtime.bloomFilter.creationSideThreshold",
      "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold",
      "spark.sql.autoBroadcastJoinThreshold").map(k => k -> conf.getOption(k))
    try {
      conf.set("spark.sql.optimizer.runtime.bloomFilter.enabled", "true")
      conf.set("spark.sql.optimizer.runtime.bloomFilter.creationSideThreshold", "10GB")
      conf.set("spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold", "0")
      // force a shuffle join: broadcast joins don't need runtime filters
      conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      val o = graft.Tables.orders(spark, sf).filter(col("o_orderpriority") === "1-URGENT")
      val l = graft.Tables.lineitem(spark, sf)
      val joined = l.join(o, col("l_orderkey") === col("o_orderkey"))
        .groupBy("o_orderpriority").agg(sum(col("l_quantity")).as("q"))
      val plan = joined.queryExecution.optimizedPlan.toString
      assert(plan.contains("might_contain") && plan.contains("bloom_filter_agg"),
        s"expected an injected runtime bloom filter, got:\n${plan.take(800)}")
      assert(joined.collect().nonEmpty)
    } finally saved.foreach { case (k, v) =>
      v.fold(conf.unset(k))(conf.set(k, _))
    }
  }
}
