package graft.functions

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.SparkTestSession

/** Typed UDAF agreement with the decimal-exact centroid query. */
class AggregatorSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  private val sf = "/root/testdata/sf0.001"

  test("Aggregator centroid matches the oracled s04 centroids to 1e-6") {
    val viaUdaf = graft.Tables.embeddings(spark, sf)
      .groupBy(col("label"))
      .agg(CentroidAggregator(col("embedding")).as("c"))
      .collect().map(r => r.getInt(0) -> r.getSeq[Double](1)).toMap
    val viaQuery = graft.SparkEntry.queries("s04_label_centroids")(spark, sf)
      .collect().groupBy(_.getInt(0))
      .map { case (l, rows) => l -> rows.sortBy(_.getInt(1)).map(_.getDouble(2)).toSeq }
    viaQuery.foreach { case (label, cs) =>
      cs.zipWithIndex.foreach { case (c, i) =>
        assert(math.abs(viaUdaf(label)(i) - c) < 1e-6, s"label $label dim $i")
      }
    }
  }

  test("merge handles empty partitions (zero buffer)") {
    import spark.implicits._
    val one = Seq((1, Array(1f, 3f)), (1, Array(3f, 5f))).toDF("k", "v")
      .groupBy($"k").agg(CentroidAggregator($"v").as("c"))
      .collect().head.getSeq[Double](1)
    assert(one == Seq(2.0, 4.0))
  }
}
