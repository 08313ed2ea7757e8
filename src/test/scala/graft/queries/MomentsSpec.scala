package graft.queries

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.SparkTestSession

/** The exact-sum moment computation must agree with Spark's built-in
  * (online) stddev/variance to statistical tolerance. */
class MomentsSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  private val sf = "/root/testdata/sf0.001"

  test("exact-moment variance matches built-in var_samp/stddev_samp") {
    val exact = graft.SparkEntry.queries("r39_exact_moments")(spark, sf)
      .collect().map(r => r.getString(0) -> (r.getDouble(2), r.getDouble(3))).toMap
    val builtin = graft.Tables.lineitem(spark, sf)
      .groupBy(col("l_returnflag"))
      .agg(var_samp(col("l_quantity")).as("v"), stddev_samp(col("l_quantity")).as("s"))
      .collect().map(r => r.getString(0) -> (r.getDouble(1), r.getDouble(2))).toMap
    builtin.foreach { case (k, (v, s)) =>
      assert(math.abs(exact(k)._1 - v) / v < 1e-9, s"$k var")
      assert(math.abs(exact(k)._2 - s) / s < 1e-9, s"$k stddev")
    }
  }
}
