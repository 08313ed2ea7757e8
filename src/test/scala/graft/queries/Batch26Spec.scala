package graft.queries

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.SparkTestSession

/** Oracle-independent invariants for round-9 batch 29 (tuning sweeps +
  * estimator audits): sweep monotonicity, cross-query consistency with
  * s34, capture-coin replays, the independence pin the capture design
  * assumes, and quota-exact eval-split conservation.
  */
class Batch26Spec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  private val sf = "/root/testdata/sf0.001"

  private def run(name: String) = graft.SparkEntry.queries(name)(spark, sf)

  private def md5hex(s: String): String =
    java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString

  private def coin(s: String): Long =
    java.lang.Long.parseLong(md5hex(s).substring(0, 6), 16)

  test("d29: drops replay the d26 gap relation and are strictly monotone in the horizon") {
    val docs = graft.Tables.documents(spark, sf)
      .select(col("doc_id"), md5(substring(col("text"), 1, 100)).as("h"))
      .collect().map(r => (r.getLong(0), r.getString(1))).sortBy(_._1)
    val gaps = docs.groupBy(_._2).values.flatMap { fam =>
      val ids = fam.map(_._1).sorted
      ids.zip(ids.drop(1)).map(p => p._2 - p._1)
    }.toSeq
    val got = run("d29_horizon_sweep").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
    assert(got.map(_._1).toSeq == ExtraQueries27.SweepHorizons)
    got.foreach { case (h, drops, reps, rate) =>
      assert(reps == gaps.length.toLong, "repeat denominator diverges")
      assert(drops == gaps.count(_ <= h).toLong, s"horizon $h drops diverge")
      assert(math.abs(rate - math.rint(drops.toDouble / reps * 1e4) / 1e4) < 1e-9)
    }
    val ds = got.map(_._2)
    assert(ds.zip(ds.drop(1)).forall(p => p._1 < p._2),
      "sweep must strictly bind between consecutive horizons on this fixture")
    assert(ds.last < gaps.length, "largest horizon catches everything — widen the sweep")
  }

  test("s35: assignment quality rises with C; the C=8 row agrees with s34's cells") {
    val got = run("s35_codebook_sweep").collect()
      .map(r => (r.getInt(0), r.getDouble(1), r.getLong(2), r.getLong(3)))
    assert(got.map(_._1).toSeq == ExtraQueries27.SweepCs)
    val sims = got.map(_._2)
    assert(sims.zip(sims.drop(1)).forall(p => p._1 < p._2),
      "mean similarity to the chosen centroid must rise with codebook size")
    got.foreach(t => assert(t._3 <= t._4 && t._3 > 0))
    // cross-query consistency: C=8 is exactly s34's codebook, so the
    // cell-size extremes must agree between the two registered queries
    val s34Sizes = run("s34_ivf_maintenance").collect().map(_.getLong(1))
    val c8 = got.find(_._1 == 8).get
    assert(c8._3 == s34Sizes.min && c8._4 == s34Sizes.max,
      "s35's C=8 extremes disagree with s34's cells")
  }

  test("r124: capture counts replay the coins; the estimate formula is exact") {
    val docs = graft.Tables.documents(spark, sf).select(col("doc_id"), col("lang"))
      .collect().map(r => (r.getLong(0), r.getString(1)))
    val got = run("r124_capture_recapture").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4),
        r.getDouble(5), r.getDouble(6)))
    assert(got.map(_._1).toSet == docs.map(_._2).toSet)
    got.foreach { case (lang, n, n1, n2, m, est, relErr) =>
      val ids = docs.filter(_._2 == lang).map(_._1)
      val c1 = ids.filter(id => coin(s"cap1:$id") % 1000 < ExtraQueries27.CapRate).toSet
      val c2 = ids.filter(id => coin(s"cap2:$id") % 1000 < ExtraQueries27.CapRate).toSet
      assert((n, n1, n2, m) == (ids.length.toLong, c1.size.toLong, c2.size.toLong,
        (c1 intersect c2).size.toLong), s"$lang capture counts diverge")
      assert(m > 0, s"$lang has zero overlap — estimator arm degenerate at this SF")
      // Spark/DuckDB round() is HALF_UP — rint's half-even diverges on
      // exact .xx5 boundaries, which n1·n2/m does hit
      val wantEst = BigDecimal(n1.toDouble * n2 / math.max(m, 1L))
        .setScale(2, BigDecimal.RoundingMode.HALF_UP).toDouble
      assert(math.abs(est - wantEst) < 1e-9)
      val wantErr = BigDecimal((wantEst - n) / n)
        .setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble
      assert(math.abs(relErr - wantErr) < 1e-9)
    }
  }

  test("u30: contingency cells replay; every language passes the 5% independence line") {
    val got = run("u30_coin_independence").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4),
        r.getDouble(5)))
    val docs = graft.Tables.documents(spark, sf).select(col("doc_id"), col("lang"))
      .collect().map(r => (r.getLong(0), r.getString(1)))
    got.foreach { case (lang, n11, n10, n01, n00, chi2) =>
      val ids = docs.filter(_._2 == lang).map(_._1)
      def s1(id: Long) = coin(s"cap1:$id") % 1000 < ExtraQueries27.CapRate
      def s2(id: Long) = coin(s"cap2:$id") % 1000 < ExtraQueries27.CapRate
      val want = (
        ids.count(i => s1(i) && s2(i)).toLong, ids.count(i => s1(i) && !s2(i)).toLong,
        ids.count(i => !s1(i) && s2(i)).toLong, ids.count(i => !s1(i) && !s2(i)).toLong)
      assert((n11, n10, n01, n00) == want, s"$lang cells diverge")
      val n = n11 + n10 + n01 + n00
      val d = (n11 * n00 - n10 * n01).toDouble
      val den = math.max((n11 + n10) * (n01 + n00) * (n11 + n01) * (n10 + n00), 1L).toDouble
      assert(math.abs(chi2 - math.rint(n * d * d / den * 1e4) / 1e4) < 1e-9)
      // the design assumption r124 rests on: differently-salted md5
      // coins behave independently (1-dof chi-square 5% line)
      assert(chi2 < 3.841, s"$lang coins fail independence ($chi2) — salt scheme broken")
    }
  }

  test("p35: quotas are largest-remainder exact, the budget conserves, the roster replays") {
    val docs = graft.Tables.documents(spark, sf).select(col("doc_id"), col("source"))
      .collect().map(r => (r.getLong(0), r.getString(1)))
    val per = docs.groupBy(_._2).view.mapValues(_.length.toLong).toMap
    val nn = docs.length.toLong
    val B = ExtraQueries27.EvalBudget
    val base = per.map { case (s, cn) => s -> B * cn / nn }
    val rem = (B - base.values.sum).toInt
    val extra = per.keys.toSeq
      .sortBy(s => (-(B * per(s) % nn), s)).take(rem).toSet
    val quota = per.keys.map(s => s -> (base(s) + (if (extra(s)) 1L else 0L))).toMap
    assert(quota.values.sum == B.toLong, "quotas must conserve the budget")
    val want = quota.toSeq.flatMap { case (src, q) =>
      docs.filter(_._2 == src).map(t => (t._1, coin(s"eval:${t._1}")))
        .sortBy(t => (t._2, t._1)).take(q.toInt).zipWithIndex
        .map { case ((id, _), i) => (src, (i + 1).toLong, id) }
    }.sortBy(t => (t._1, t._2))
    val got = run("p35_quota_eval_split").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    assert(got.length == B)
    assert(got.toSeq == want, "roster diverges from quota + coin replay")
    // the remainder arm binds: someone got +1 and someone did not
    assert(rem > 0 && rem < per.size, "degenerate remainder — fixture change broke the arm")
  }
}
