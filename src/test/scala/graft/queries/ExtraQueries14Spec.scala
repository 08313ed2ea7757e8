package graft.queries

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.SparkTestSession

/** Oracle-independent invariants for batch 15: a driver-side empirical-
  * CDF replay of the KS statistic and FD-audit verdict checks.
  */
class ExtraQueries14Spec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  private val sf = "/root/testdata/sf0.001"

  test("r109: KS statistic matches a driver-side ECDF replay") {
    val vals = graft.Tables.orders(spark, sf)
      .join(graft.Tables.customer(spark, sf), col("o_custkey") === col("c_custkey"))
      .join(graft.Tables.nation(spark, sf), col("c_nationkey") === col("n_nationkey"))
      .join(graft.Tables.region(spark, sf), col("n_regionkey") === col("r_regionkey"))
      .select(col("r_name"),
        (col("o_totalprice").cast(org.apache.spark.sql.types.DecimalType(12, 2)) * 100)
          .cast("long"))
      .collect().map(r => (r.getString(0), r.getLong(1)))
    val got = graft.SparkEntry.queries("r109_ks_test")(spark, sf).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2), r.getLong(3))).toMap
    val regions = vals.map(_._1).distinct
    assert(got.keySet == regions.toSet)
    regions.foreach { reg =>
      val a = vals.filter(_._1 == reg).map(_._2)
      val b = vals.filter(_._1 != reg).map(_._2)
      val axis = (a ++ b).distinct.sorted
      val dNum = axis.map { v =>
        math.abs(a.count(_ <= v).toLong * b.length - b.count(_ <= v).toLong * a.length)
      }.max
      assert(got(reg) == ((a.length.toLong, b.length.toLong, dNum)),
        s"$reg: ${got(reg)} vs replay (${a.length}, ${b.length}, $dNum)")
    }
  }

  test("u25: FD verdicts — the key-determined FD holds, a genuine relationship fails") {
    val got = graft.SparkEntry.queries("u25_fd_audit")(spark, sf).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2), r.getBoolean(4))).toMap
    assert(got.keySet == ExtraQueries14.FdCandidates.map(_._1).toSet)
    assert(got("orders_key_priority")._3, "a key trivially determines every column")
    assert(got("orders_key_priority")._2 == 0L)
    assert(!got("orders_cust_priority")._3,
      "customers place orders at many priorities — the FD must fail")
    got.foreach { case (fd, (groups, violating, holds)) =>
      assert(violating <= groups, s"$fd: violation bound")
      assert(holds == (violating == 0L), s"$fd: verdict consistency")
    }
  }
}
