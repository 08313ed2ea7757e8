package graft.queries

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.SparkTestSession

/** Oracle-independent invariants for r112: a driver-side cosine replay
  * and recommender-structure laws. */
class ExtraQueries16Spec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  private val sf = "/root/testdata/sf0.001"

  test("r112: item-item cosine matches a driver-side replay; structure laws hold") {
    val inter = graft.Tables.events(spark, sf)
      .select(col("user_id"),
        get_json_object(col("props"), "$.k").cast("int").as("item"))
      .filter(col("item").isNotNull).distinct()
      .collect().map(r => (r.getLong(0), r.getInt(1)))
    val byItem = inter.groupBy(_._2).map { case (i, v) => i -> v.map(_._1).toSet }
    val got = graft.SparkEntry.queries("r112_item_cf")(spark, sf).collect()
      .map(r => (r.getInt(0), r.getLong(1), r.getInt(2), r.getLong(3), r.getDouble(4)))
    assert(got.nonEmpty)
    got.foreach { case (item, rk, nb, co, cos) =>
      val expCo = byItem(item).intersect(byItem(nb)).size.toLong
      assert(co == expCo, s"($item,$nb): co $co vs replay $expCo")
      val expCos = co.toDouble / math.sqrt(byItem(item).size.toDouble * byItem(nb).size)
      assert(math.abs(cos - expCos) < 1e-5, s"($item,$nb): cosine")
      assert(rk >= 1 && rk <= ExtraQueries16.CfTopK)
      assert(item != nb, "an item is not its own neighbor")
      assert(cos > 0.0 && cos <= 1.0, "cosine range for binary vectors with co > 0")
    }
    // per-item neighbor lists are ranked descending
    got.groupBy(_._1).foreach { case (item, rs) =>
      val ordered = rs.sortBy(_._2).map(_._5)
      assert(ordered.zip(ordered.tail).forall { case (a, b) => a >= b },
        s"item $item: neighbor ranking must be descending in cosine")
    }
  }
}
