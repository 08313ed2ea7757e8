package graft.operators

import org.apache.spark.sql.functions._
import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
import org.scalatest.funsuite.AnyFunSuite
import graft.SparkTestSession

/** The scale design leaves mid-size dimensions to AQE's runtime
  * decision (ARCHITECTURE.md §Scale design). This pins the mechanism:
  * with static broadcast planning disabled, the runtime statistics must
  * still convert the sort-merge join of a small dimension to a
  * broadcast join inside the adaptive plan.
  */
class AdaptiveExecSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  private val sf = "/root/testdata/sf0.001"

  test("AQE converts SMJ to broadcast at runtime when the dim side is small") {
    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    // static planning may NOT broadcast; the runtime decision uses the
    // adaptive threshold (which otherwise falls back to the static one)
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    spark.conf.set("spark.sql.adaptive.autoBroadcastJoinThreshold", "10MB")
    try {
      val li = graft.Tables.lineitem(spark, sf).select("l_orderkey", "l_partkey", "l_quantity")
      val part = graft.Tables.part(spark, sf).select("p_partkey", "p_brand")
      val joined = li.join(part, col("l_partkey") === col("p_partkey"))
        .groupBy("p_brand").agg(sum("l_quantity").as("q"))
      joined.collect() // materialize so AQE finalizes the plan
      val adaptive = joined.queryExecution.executedPlan.collectFirst {
        case a: AdaptiveSparkPlanExec => a
      }
      assert(adaptive.isDefined, "adaptive execution expected")
      val finalPlan = adaptive.get.executedPlan.toString
      assert(finalPlan.contains("BroadcastHashJoin"),
        s"runtime stats should have converted the join:\n$finalPlan")
      assert(!finalPlan.contains("SortMergeJoin"))
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
      spark.conf.unset("spark.sql.adaptive.autoBroadcastJoinThreshold")
    }
  }
}
