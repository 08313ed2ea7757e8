package graft.queries

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.SparkTestSession

/** Bounds for the rows-only coverage queries. */
class CoverageSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  private val sf = "/root/testdata/sf0.001"

  test("approx_count_distinct within 10% of q11's exact distinct counts") {
    val approx = graft.SparkEntry.queries("r28_approx_distinct")(spark, sf).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap
    // parts side: the oracled q11 query IS the exact ground truth
    val exactParts = graft.SparkEntry.queries("q11_distinct_agg")(spark, sf).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val exactOrders = graft.Tables.lineitem(spark, sf)
      .groupBy(col("l_returnflag")).agg(countDistinct(col("l_orderkey")).as("o"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    exactParts.foreach { case (k, p) =>
      val (ap, ao) = approx(k)
      val o = exactOrders(k)
      assert(math.abs(ap - p).toDouble / p < 0.10, s"$k parts: $ap vs $p")
      assert(math.abs(ao - o).toDouble / o < 0.10, s"$k orders: $ao vs $o")
    }
  }

  test("as-of join: every error's matched signup precedes it (same user)") {
    val rows = graft.SparkEntry.queries("r24_asof_join")(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.filter(!_.isNullAt(3)).foreach { r =>
      assert(!r.getTimestamp(3).after(r.getTimestamp(2)))
    }
  }

  test("session_window batch equals gaps-and-islands session count") {
    val viaWindow = graft.SparkEntry.queries("st1_session_window")(spark, sf).count()
    val viaIslands = graft.SparkEntry.queries("q23_sessionization")(spark, sf).count()
    assert(viaWindow == viaIslands)
  }
}
