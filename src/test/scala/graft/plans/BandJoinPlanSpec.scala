package graft.plans

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.SparkTestSession

/** The band-join rewrite's contract: a naive `abs(a-b) <= C` theta-join
  * must execute as a bucketized equi-join (no nested-loop / cartesian
  * operator), produce exactly the naive join's rows, and leave joins
  * that already have an equi key alone. */
class BandJoinPlanSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  private val sf = "/root/testdata/sf0.001"

  private def physical(df: org.apache.spark.sql.DataFrame): String =
    df.queryExecution.executedPlan.toString

  test("r57's naive band join plans as an equi-join, not a nested loop") {
    val p = physical(graft.SparkEntry.queries("r57_band_join_auto")(spark, sf))
    assert(!p.contains("BroadcastNestedLoopJoin") && !p.contains("CartesianProduct"),
      s"band join not rewritten:\n$p")
    assert(p.contains("Generate explode"), "bucket explode missing from the plan")
  }

  test("rewritten output equals the rule-disabled naive join exactly") {
    val run = () => graft.SparkEntry.queries("r57_band_join_auto")(spark, sf).collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2))).toSeq
    val rewritten = run()
    spark.conf.set("spark.graft.bandJoinRewrite.enabled", "false")
    try {
      val naive = run()
      assert(rewritten == naive && rewritten.nonEmpty)
    } finally spark.conf.set("spark.graft.bandJoinRewrite.enabled", "true")
  }

  test("negative-value bands survive the truncating-div zero bucket") {
    import spark.implicits._
    // values straddling zero: the truncated zero bucket is 2C-1 wide —
    // every |x-y| <= C pair must still be found
    val a = Seq(-15L, -10L, -5L, -1L, 0L, 1L, 5L, 10L, 15L).toDF("x")
    val b = a.select(col("x").as("y"))
    val got = a.join(b, abs(col("x") - col("y")) <= 7).collect().length
    val want = (for { x <- Seq(-15L, -10L, -5L, -1L, 0L, 1L, 5L, 10L, 15L)
                      y <- Seq(-15L, -10L, -5L, -1L, 0L, 1L, 5L, 10L, 15L)
                      if math.abs(x - y) <= 7 } yield 1).size
    assert(got == want, s"got $got want $want")
  }

  test("joins with an equi key are left alone") {
    import spark.implicits._
    val a = Seq((1L, 10L), (2L, 20L)).toDF("k", "t")
    val b = Seq((1L, 12L), (2L, 90L)).toDF("k2", "t2")
    val j = a.join(b, col("k") === col("k2") && abs(col("t") - col("t2")) <= 5)
    assert(!physical(j).contains("__graft_band_bk"), "rule fired on an equi join")
    assert(j.collect().map(r => r.getLong(0)).toSeq == Seq(1L))
  }
}
