package graft.queries

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.SparkTestSession

/** Oracle-independent invariants for round-8 batch 23. */
class Batch21Spec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  private val sf = "/root/testdata/sf0.001"

  test("r119: Theil-Sen median matches a driver replay of all pairwise slopes") {
    val out = graft.SparkEntry.queries("r119_theil_sen")(spark, sf).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2), r.getDouble(3))).toMap
    val daily = graft.Tables.orders(spark, sf)
      .groupBy(col("o_orderpriority"), to_date(col("o_orderdate")).as("day"))
      .agg(sum(col("o_totalprice").cast("decimal(12,2)") * 100).cast("long").as("y"))
      .collect().map(r => (r.getString(0), r.getDate(1).toLocalDate.toEpochDay, r.getLong(2)))
    daily.groupBy(_._1).foreach { case (p, xs) =>
      val pts = xs.map(t => (t._2, t._3)).sortBy(_._1)
      val slopes = for {
        i <- pts.indices; j <- (i + 1) until pts.length
      } yield ((pts(j)._2 - pts(i)._2).toDouble / (pts(j)._1 - pts(i)._1),
        pts(i)._1, pts(j)._1)
      val sorted = slopes.sortBy(t => (t._1, t._2, t._3))
      val median = sorted((sorted.length + 1) / 2 - 1)._1
      val (nDays, nPairs, ts) = out(p)
      assert(nDays == pts.length.toLong, s"$p n_days")
      assert(nPairs == (pts.length.toLong * (pts.length - 1)) / 2, s"$p n_pairs = C(n,2)")
      val want = BigDecimal(median).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
      assert(math.abs(ts - want) < 1e-9, s"$p theil-sen median")
    }
  }

  test("u27: value accounting nests strictly and counts agree with st6") {
    val out = graft.SparkEntry.queries("u27_late_impact")(spark, sf).collect()
      .map(r => (r.getString(0), r.getDate(1)) ->
        (r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5)))
      .toMap
    out.values.foreach { case (_, all, onTime, accepted) =>
      assert(onTime <= accepted && accepted <= all, "status buckets must nest")
    }
    val st6 = graft.SparkEntry.queries("st6_watermark_audit")(spark, sf).collect()
      .map(r => (r.getString(0), r.getDate(1)) -> r.getLong(2)).toMap
    assert(out.keySet == st6.keySet, "u27 covers exactly st6's (type, day) cells")
    out.foreach { case (k, (n, _, _, _)) =>
      assert(n == st6(k), s"cell $k event count matches st6")
    }
  }
}
