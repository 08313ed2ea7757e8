package graft.functions

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.SparkTestSession

/** The Misra-Gries guarantees, checked against exact counts — these are
  * the properties that make the t13 two-pass heavy-hitters exact:
  * estimates never exceed truth, undershoot by at most n/(k+1), and no
  * item above that bound can be absent, under any partitioning.
  */
class MisraGriesSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  private val sf = "/root/testdata/sf0.001"

  private def tokens = graft.Tables.documents(spark, sf)
    .select(explode(split(col("text"), " ")).as("token"))

  private def exactCounts: Map[String, Long] =
    tokens.groupBy("token").count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap

  test("estimate bounds: exact - n/(k+1) <= est <= exact, all partitionings") {
    val exact = exactCounts
    val n = exact.values.sum
    for (k <- Seq(64, 256); parts <- Seq(3, 17)) {
      val sk = tokens.repartition(parts)
        .agg(MisraGries.sketch(k)(col("token")))
        .head.getMap[String, Long](0)
      val slack = n / (k + 1)
      sk.foreach { case (item, est) =>
        val t = exact(item)
        assert(est <= t, s"k=$k parts=$parts: $item overestimated ($est > $t)")
        assert(est >= t - slack, s"k=$k parts=$parts: $item est $est < $t - $slack")
      }
      // completeness: every item heavier than n/(k+1) must be present
      exact.foreach { case (item, t) =>
        if (t > slack) assert(sk.contains(item),
          s"k=$k parts=$parts: heavy item $item (count $t > $slack) missing")
      }
      assert(sk.size <= k, s"summary exceeded capacity: ${sk.size} > $k")
    }
  }

  test("t13 output is exact and partition-invariant (confirm pass)") {
    val q = graft.SparkEntry.queries("t13_heavy_hitters")
    val out = q(spark, sf).collect().map(r => (r.getString(0), r.getLong(1))).toSeq
    val n = exactCounts.values.sum
    val expected = exactCounts.filter(_._2 > n / 200).toSeq
      .sortBy { case (t, c) => (-c, t) }
    assert(out == expected, "two-pass heavy hitters must equal the exact answer")
    assert(out.nonEmpty, "fixture should contain heavy tokens")
  }
}
