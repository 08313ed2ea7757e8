package graft.operators

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.SparkTestSession

/** Salting preserves semantics; bucketing removes the join exchange. */
class ScaleOpsSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  private val sf = "/root/testdata/sf0.001"

  test("salted aggregation equals plain aggregation") {
    val li = graft.Tables.lineitem(spark, sf)
    val salted = ScaleOps.saltedCountSum(li, col("l_returnflag"),
        col("l_quantity").cast("decimal(24,2)"))
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getDecimal(2).doubleValue())).toMap
    val plain = li.groupBy(col("l_returnflag"))
      .agg(count(lit(1)).as("n"), sum(col("l_quantity").cast("decimal(24,2)")).as("s"))
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getDecimal(2).doubleValue())).toMap
    assert(salted == plain)
  }

  test("salted join is row-equivalent to the plain join") {
    val li = graft.Tables.lineitem(spark, sf).limit(2000)
    val part = graft.Tables.part(spark, sf)
    val plain = li.join(part, li("l_partkey") === part("p_partkey"))
      .select("l_orderkey", "l_linenumber", "p_name").collect()
      .map(_.toSeq).sortBy(_.toString())
    val salted = ScaleOps.saltedJoin(li, part, "l_partkey", "p_partkey")
      .select("l_orderkey", "l_linenumber", "p_name").collect()
      .map(_.toSeq).sortBy(_.toString())
    assert(salted.toSeq == plain.toSeq && plain.nonEmpty)
  }

  test("bucketed join plans without a shuffle exchange on either side") {
    val o = graft.Tables.orders(spark, sf)
    val l = graft.Tables.lineitem(spark, sf)
    ScaleOps.writeBucketed(o, "orders_b", "o_orderkey", 4)
    ScaleOps.writeBucketed(l.withColumnRenamed("l_orderkey", "lo_key"), "lineitem_b", "lo_key", 4)
    val joined = spark.table("orders_b")
      .join(spark.table("lineitem_b"), col("o_orderkey") === col("lo_key"))
    val plan = joined.queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange hashpartitioning"),
      s"expected exchange-free co-located join, got:\n$plan")
    assert(joined.count() == l.count())
  }
}
