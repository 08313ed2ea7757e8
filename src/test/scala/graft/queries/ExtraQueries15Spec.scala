package graft.queries

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.SparkTestSession

/** Oracle-independent invariants for batch 16: a driver replay of the
  * Wilcoxon signed-rank statistic, curriculum-schedule conservation
  * laws, and SRM assignment replay.
  */
class ExtraQueries15Spec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  private val sf = "/root/testdata/sf0.001"

  test("r110: signed-rank statistic matches a driver-side replay") {
    val cells = graft.Tables.orders(spark, sf)
      .filter(year(col("o_orderdate")).isin(ExtraQueries15.WsrYearA, ExtraQueries15.WsrYearB))
      .join(graft.Tables.customer(spark, sf), col("o_custkey") === col("c_custkey"))
      .join(graft.Tables.nation(spark, sf), col("c_nationkey") === col("n_nationkey"))
      .join(graft.Tables.region(spark, sf), col("n_regionkey") === col("r_regionkey"))
      .groupBy(col("o_orderpriority"), col("r_name"), month(col("o_orderdate")).as("m"))
      .agg(sum(when(year(col("o_orderdate")) === ExtraQueries15.WsrYearA,
          col("o_totalprice").cast(org.apache.spark.sql.types.DecimalType(12, 2)) * 100)
          .otherwise(0)).cast("long").as("ra"),
        sum(when(year(col("o_orderdate")) === ExtraQueries15.WsrYearB,
          col("o_totalprice").cast(org.apache.spark.sql.types.DecimalType(12, 2)) * 100)
          .otherwise(0)).cast("long").as("rb"))
      .collect().map(r => (r.getString(0), r.getLong(4) - r.getLong(3)))
    val got = graft.SparkEntry.queries("r110_wilcoxon")(spark, sf).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap
    cells.groupBy(_._1).foreach { case (pri, rows) =>
      val ds = rows.map(_._2).filter(_ != 0)
      // tie-averaged doubled ranks of |d|
      val sorted = ds.map(math.abs).sorted
      val rank2 = sorted.zipWithIndex.groupBy(_._1).map { case (v, idx) =>
        v -> (idx.map(_._2 + 1).sum * 2L / idx.length)
      }
      val wPlus2 = ds.filter(_ > 0).map(d => rank2(math.abs(d))).sum
      assert(got(pri) == ((ds.length.toLong, wPlus2)),
        s"$pri: ${got(pri)} vs replay (${ds.length}, $wPlus2)")
    }
  }

  test("p28: every stage's allocations conserve the budget and tilt toward quality") {
    val rows = graft.SparkEntry.queries("p28_curriculum_schedule")(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
    assert(rows.map(_._1).distinct.sorted.toSeq == (1L to ExtraQueries15.CurrStages).toSeq)
    rows.groupBy(_._1).foreach { case (stage, rs) =>
      assert(rs.map(_._5).sum == ExtraQueries15.CurrBudget, s"stage $stage: budget conservation")
      val byQ = rs.sortBy(_._2)
      assert(byQ.zip(byQ.tail).forall { case (a, b) => a._5 <= b._5 },
        s"stage $stage: allocation must be monotone in quality tier")
    }
    // progressive concentration: the top tier's share grows with stage
    val top = rows.filter(_._2 == 4L).sortBy(_._1).map(_._5)
    assert(top.zip(top.tail).forall { case (a, b) => a <= b },
      "the best tier's budget must not shrink across stages")
    // quartile accounting: bins partition the corpus
    val nDocs = graft.Tables.documents(spark, sf).count()
    assert(rows.filter(_._1 == 1L).map(_._3).sum == nDocs, "bins partition the corpus")
  }

  test("r111: SRM counts match an independent MessageDigest assignment replay") {
    val users = graft.Tables.events(spark, sf)
      .select(col("user_id"), col("event_type")).distinct()
      .collect().map(r => (r.getLong(0), r.getString(1)))
    def grp(u: Long): Long = {
      val md = java.security.MessageDigest.getInstance("MD5")
        .digest(s"ab:$u".getBytes("UTF-8"))
      java.lang.Long.parseLong(md.take(4).map("%02x".format(_)).mkString, 16) % 2
    }
    val got = graft.SparkEntry.queries("r111_srm_check")(spark, sf).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap
    users.groupBy(_._2).foreach { case (seg, us) =>
      val na = us.count(u => grp(u._1) == 0).toLong
      val nb = us.length - na
      assert(got(seg) == ((na, nb)), s"$seg: ${got(seg)} vs replay ($na, $nb)")
    }
    val distinctUsers = users.map(_._1).distinct
    val na = distinctUsers.count(grp(_) == 0).toLong
    assert(got("_overall") == ((na, distinctUsers.length - na)), "_overall replay")
  }
}
