package graft.queries

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.SparkTestSession

/** Oracle-independent invariants for round-10 batch 37 (cohort
  * retention, per-group OLS, Benford audit, referential integrity,
  * degree assortativity): offset-0 law, moment replays in exact
  * integers, conservation, all-edges-clean manifest, and the
  * correlation bound.
  */
class Batch34Spec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  private val sf = "/root/testdata/sf0.001"

  private def run(name: String) = graft.SparkEntry.queries(name)(spark, sf)

  private def r6(x: Double): Double =
    BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
  private def r4(x: Double): Double =
    BigDecimal(x).setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble

  test("r137: offset-0 retention is exactly 1.0, cells replay, cohorts partition the users") {
    val ev = graft.Tables.events(spark, sf)
      .select(col("user_id"), to_date(col("ts")).as("day"))
      .collect().map(r => (r.getLong(0), r.getDate(1).toLocalDate))
    val firstDay = ev.groupBy(_._1).view.mapValues(_.map(_._2).min).toMap
    val got = run("r137_cohort_retention").collect()
      .map(r => ((r.getDate(0).toLocalDate, r.getLong(1)), (r.getLong(2), r.getLong(3), r.getDouble(4))))
      .toMap
    // cohorts partition the user set
    assert(got.filter(_._1._2 == 0L).values.map(_._2).sum == firstDay.size.toLong,
      "cohort sizes must sum to the distinct-user count")
    // the offset-0 law: every cohort's first day contains the whole cohort
    got.filter(_._1._2 == 0L).foreach { case (k, (na, sz, ret)) =>
      assert(na == sz && ret == 1.0, s"cohort $k offset 0 must retain 1.0")
    }
    // full replay of every cell
    val want = ev.map { case (u, day) =>
      (firstDay(u), java.time.temporal.ChronoUnit.DAYS.between(firstDay(u), day), u)
    }.distinct.groupBy(t => (t._1, t._2)).view.mapValues(_.map(_._3).distinct.length.toLong)
    want.foreach { case (k, na) =>
      val (gna, gsz, gret) = got(k)
      assert(gna == na, s"cell $k n_active diverges")
      assert(gret == r4(na.toDouble / gsz), s"cell $k retention diverges")
    }
    assert(got.size == want.size, "cell set diverges")
  }

  test("r138: one brand's OLS replays from exact integer moments; r2 in [0,1]") {
    val rows = graft.Tables.lineitem(spark, sf)
      .join(graft.Tables.part(spark, sf), col("l_partkey") === col("p_partkey"))
      .select(col("p_brand"), col("l_quantity"), col("l_extendedprice"))
      .collect().map(r => (r.getString(0), r.getDouble(1), r.getDouble(2)))
    val got = run("r138_ols_loglog").collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getDouble(2), r.getDouble(3), r.getDouble(4)))
      .toMap
    assert(got.nonEmpty)
    got.values.foreach { case (_, slope, _, r2) =>
      assert(!slope.isNaN && r2 >= 0.0 && r2 <= 1.0 + 1e-12)
    }
    val brand = rows.head._1
    def cents(v: Double): Long =
      (BigDecimal(v).setScale(2, BigDecimal.RoundingMode.HALF_UP) * 100).toLongExact
    def lnfp(c: Long): Long = (math.log(c.toDouble) * 1e9).toLong
    val pts = rows.filter(_._1 == brand).map(t => (lnfp(cents(t._3)), lnfp(cents(t._2))))
    val n = BigInt(pts.length)
    val sx = pts.map(p => BigInt(p._1)).sum; val sy = pts.map(p => BigInt(p._2)).sum
    val sxy = pts.map(p => BigInt(p._1) * BigInt(p._2)).sum
    val sxx = pts.map(p => BigInt(p._1) * BigInt(p._1)).sum
    val syy = pts.map(p => BigInt(p._2) * BigInt(p._2)).sum
    val covN = (n * sxy - sx * sy).toDouble
    val varX = (n * sxx - sx * sx).toDouble
    val varY = (n * syy - sy * sy).toDouble
    val (gn, gSlope, gInt, gR2) = got(brand)
    assert(gn == pts.length.toLong)
    assert(math.abs(gSlope - r6(covN / varX)) < 1e-9, s"$brand slope diverges")
    assert(math.abs(gInt - r6((sy.toDouble - covN / varX * sx.toDouble) / pts.length / 1e9)) < 1e-9,
      s"$brand intercept diverges")
    assert(math.abs(gR2 - r6(covN * covN / (varX * varY))) < 1e-9, s"$brand r2 diverges")
  }

  test("u37: 9 rows always, counts conserve, shares and chi2 replay") {
    val cents = graft.Tables.events(spark, sf).select(col("value"))
      .collect().map(r => (BigDecimal(r.getDouble(0))
        .setScale(2, BigDecimal.RoundingMode.HALF_UP) * 100).toLongExact)
      .filter(_ > 0L)
    val got = run("u37_benford_digits").collect()
      .map(r => (r.getInt(0), r.getLong(1), r.getDouble(2), r.getDouble(3), r.getDouble(4)))
    assert(got.map(_._1).toSeq == (1 to 9), "all nine digits must emit")
    assert(got.map(_._2).sum == cents.length.toLong, "digit counts must conserve")
    val byDigit = cents.groupBy(c => c.toString.head.asDigit).view.mapValues(_.length.toLong)
    got.foreach { case (d, n, share, bshare, chi2) =>
      assert(n == byDigit.getOrElse(d, 0L), s"digit $d count diverges")
      assert(share == r6(n.toDouble / cents.length), s"digit $d share diverges")
      val bfp = (math.log(1.0 + 1.0 / d) / math.log(10.0) * 1e9).toLong
      assert(bshare == r6(bfp / 1e9), s"digit $d benford share diverges")
      val exp = cents.length * bfp / 1e9
      assert(math.abs(chi2 - r6((n - exp) * (n - exp) / exp)) < 1e-9, s"digit $d chi2 diverges")
    }
    // Benford shares are a probability vector (up to the 1e-9 truncation grid)
    assert(math.abs(got.map(_._4).sum - 1.0) < 1e-4)
  }

  test("u38: the fixture star is referentially clean and child counts are exact") {
    val got = run("u38_referential_integrity").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getBoolean(3)))
    assert(got.length == 7, "seven FK edges")
    got.foreach { case (edge, _, orphans, ok) =>
      assert(orphans == 0L && ok, s"edge $edge reports orphans on the clean fixture")
    }
    val counts = Map(
      "lineitem" -> graft.Tables.lineitem(spark, sf).count(),
      "orders" -> graft.Tables.orders(spark, sf).count(),
      "customer" -> graft.Tables.customer(spark, sf).count(),
      "supplier" -> graft.Tables.supplier(spark, sf).count(),
      "nation" -> graft.Tables.nation(spark, sf).count())
    got.foreach { case (edge, nChild, _, _) =>
      val child = edge.split('.').head
      assert(nChild == counts(child), s"edge $edge n_child diverges from count($child)")
    }
  }

  test("s38: assortativity replays from exact degree moments and sits in [-1, 1]") {
    val und = SimilarityQueries.knnPool(spark, sf)
      .select(least(col("a_id"), col("b_id")).as("u"), greatest(col("a_id"), col("b_id")).as("v"))
      .distinct().collect().map(r => (r.getLong(0), r.getLong(1)))
    val sym = und.flatMap(e => Seq(e, (e._2, e._1)))
    val deg = sym.groupBy(_._1).view.mapValues(_.length.toLong).toMap
    val pts = sym.map { case (x, y) => (deg(x), deg(y)) }
    val m2 = BigInt(pts.length)
    val sx = pts.map(p => BigInt(p._1)).sum; val sy = pts.map(p => BigInt(p._2)).sum
    val sxy = pts.map(p => BigInt(p._1) * BigInt(p._2)).sum
    val sxx = pts.map(p => BigInt(p._1) * BigInt(p._1)).sum
    val syy = pts.map(p => BigInt(p._2) * BigInt(p._2)).sum
    val want = r6((m2 * sxy - sx * sy).toDouble /
      (math.sqrt((m2 * sxx - sx * sx).toDouble) * math.sqrt((m2 * syy - sy * sy).toDouble)))
    val Seq(row) = run("s38_degree_assortativity").collect().toSeq
    assert(row.getLong(0) == und.length.toLong, "edge count diverges")
    val r = row.getDouble(1)
    assert(math.abs(r - want) < 1e-9, "assortativity diverges from the exact replay")
    assert(r >= -1.0 - 1e-12 && r <= 1.0 + 1e-12)
  }
}
