package graft.queries

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.SparkTestSession

/** Oracle-independent invariants for round-9 batch 31 (conformal
  * intervals, midrank AUC, coverage curve, prefix sweep, shuffle QA):
  * full driver replays, the O(n²) pair-count AUC cross-check, curve
  * monotonicity, cross-query consistency with d29's repeat kernel, and
  * the shuffled-vs-sorted clumping contrast.
  */
class Batch28Spec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  private val sf = "/root/testdata/sf0.001"

  private def run(name: String) = graft.SparkEntry.queries(name)(spark, sf)

  private def md5hex(s: String): String =
    java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString

  private def r4(x: Double): Double =
    BigDecimal(x).setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble

  test("r126: qhat is the counting-method order statistic and coverage replays exactly") {
    val ev = graft.Tables.events(spark, sf)
      .select(col("event_id"), col("event_type"), col("value"))
      .collect().map(r => (r.getLong(0), r.getString(1), r.getDouble(2)))
    val got = run("r126_split_conformal").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getDouble(2), r.getLong(3),
        r.getLong(4), r.getDouble(5)))
    got.foreach { case (et, nCalib, qhatR, nEval, covered, coverage) =>
      val calib = ev.filter(e => e._2 == et && e._1 % 2 == 0)
      val eval_ = ev.filter(e => e._2 == et && e._1 % 2 != 0)
      assert(nCalib == calib.length.toLong && nEval == eval_.length.toLong)
      val mu = calib.map(e => BigDecimal(e._3).setScale(2, BigDecimal.RoundingMode.HALF_UP))
        .sum.toDouble / calib.length
      val resids = calib.map(e => math.abs(e._3 - mu)).sorted
      val k = math.min(math.ceil(0.9 * (calib.length + 1)).toLong, calib.length.toLong).toInt
      val qhat = resids(k - 1)
      assert(math.abs(qhatR - r4(qhat)) < 1e-9, s"$et qhat diverges")
      val wantCov = eval_.count(e => math.abs(e._3 - mu) <= qhat).toLong
      assert(covered == wantCov, s"$et coverage count diverges")
      assert(math.abs(coverage - r4(wantCov.toDouble / eval_.length)) < 1e-9)
      // the conformal guarantee holds in expectation; on one fixed
      // split it can undershoot — pin a loose honesty band instead
      assert(coverage > 0.7 && coverage <= 1.0, s"$et coverage $coverage out of band")
    }
  }

  test("u32: midrank AUC equals the O(n²) concordance count with half-credit ties") {
    val ev = graft.Tables.events(spark, sf)
      .select(col("event_type"), col("value"))
      .collect().map(r => (r.getString(0) == "purchase", r.getDouble(1)))
    val pos = ev.filter(_._1).map(_._2); val neg = ev.filterNot(_._1).map(_._2)
    val Seq(row) = run("u32_rank_auc").collect().toSeq
    val (nPos, nNeg, r2, auc, gini) =
      (row.getLong(0), row.getLong(1), row.getLong(2), row.getDouble(3), row.getDouble(4))
    assert(nPos == pos.length.toLong && nNeg == neg.length.toLong)
    // brute-force concordance in doubled units: 2 per win, 1 per tie
    var conc2 = 0L
    for (p <- pos; n <- neg)
      conc2 += (if (p > n) 2L else if (p == n) 1L else 0L)
    val wantAuc = r4(conc2.toDouble / (2.0 * pos.length * neg.length))
    assert(math.abs(auc - wantAuc) < 1e-9, "midrank AUC diverges from the pair count")
    // the rank-sum identity: R2 = 2*conc + n_pos(n_pos+1) over doubled units
    assert(r2 - nPos * (nPos + 1) == conc2, "rank-sum identity broken")
    assert(math.abs(gini - r4(conc2.toDouble / (pos.length.toDouble * neg.length) - 1.0)) < 1e-9)
  }

  test("t43: coverage replays from the bigram counts and is strictly monotone in M") {
    val bigrams = graft.Tables.documents(spark, sf)
      .select(col("text")).collect().flatMap { r =>
        val ts = r.getString(0).split(" ", -1)
        ts.zip(ts.drop(1)).map(p => p._1 + " " + p._2)
      }
    val counts = bigrams.groupBy(identity).view.mapValues(_.length.toLong).toMap
    val ranked = counts.toSeq.sortBy { case (bg, n) => (-n, bg) }
    val total = counts.values.sum
    val got = run("t43_coverage_curve").collect()
      .map(r => (r.getInt(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getDouble(4)))
    assert(got.map(_._1).toSeq == ExtraQueries29.CoverageMs)
    got.foreach { case (m, covered, tot, nTypes, cov) =>
      assert(tot == total && nTypes == counts.size.toLong)
      val want = ranked.take(m).map(_._2).sum
      assert(covered == want, s"M=$m covered mass diverges")
      assert(math.abs(cov - r4(want.toDouble / total)) < 1e-9)
    }
    val covs = got.map(_._2)
    assert(covs.zip(covs.drop(1)).forall(p => p._1 < p._2),
      "coverage must strictly grow across the swept table sizes on this fixture")
    assert(got.last._5 < 1.0, "largest M covers everything — widen the sweep")
  }

  test("d31: family stats replay per prefix length; repeats shrink; L=100 matches d29's kernel") {
    val texts = graft.Tables.documents(spark, sf).select(col("text"))
      .collect().map(_.getString(0))
    val got = run("d31_prefix_sweep").collect()
      .map(r => (r.getInt(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
    assert(got.map(_._1).toSeq == ExtraQueries29.PrefixLens)
    got.foreach { case (l, nDocs, nFam, nRep, maxFam) =>
      val fams = texts.groupBy(t => md5hex(t.substring(0, math.min(l, t.length))))
      assert(nDocs == texts.length.toLong)
      assert(nFam == fams.size.toLong, s"L=$l families diverge")
      assert(nRep == (texts.length - fams.size).toLong)
      assert(maxFam == fams.values.map(_.length).max.toLong)
    }
    val reps = got.map(_._4)
    assert(reps.zip(reps.drop(1)).forall(p => p._1 >= p._2),
      "repeats must be nonincreasing in prefix length (families only split)")
    // cross-query: the L=100 row is the live d01/d26/d29 kernel — its
    // repeat count must equal d29's denominator
    val d29Reps = run("d29_horizon_sweep").collect().head.getLong(2)
    assert(got.find(_._1 == 100).get._4 == d29Reps, "L=100 repeats disagree with d29")
  }

  test("p37: adjacency replays in both orders; shuffled is unclumped, sorted is anti-clumped") {
    val docs = graft.Tables.documents(spark, sf)
      .select(col("doc_id"), col("source"))
      .collect().map(r => (r.getLong(0), r.getString(1)))
    // shuffled: bucket = first 2 hex of the p05 coin, order by (skey, doc_id)
    val shuf = docs.map { case (id, src) => (md5hex(s"shuffle:$id"), id, src) }
      .groupBy(_._1.substring(0, 2)).values.flatMap { b =>
        val s = b.toSeq.sortBy(t => (t._1, t._2)); s.zip(s.drop(1))
      }.toSeq
    val (wantShufPairs, wantShufSame) =
      (shuf.size.toLong, shuf.count { case (a, b) => a._3 == b._3 }.toLong)
    val srt = docs.groupBy(t => t._1 / 50).values.flatMap { b =>
      val s = b.toSeq.sortBy(_._1); s.zip(s.drop(1))
    }.toSeq
    val (wantSrtPairs, wantSrtSame) =
      (srt.size.toLong, srt.count { case (a, b) => a._2 == b._2 }.toLong)
    val per = docs.groupBy(_._2).view.mapValues(_.length.toLong).toMap
    val n = docs.length.toLong
    val expRate = per.values.map(c => c * (c - 1)).sum.toDouble / (n * (n - 1)).toDouble
    val got = run("p37_shuffle_qa").collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2), r.getDouble(3),
        r.getDouble(4), r.getDouble(5))).toMap
    val (sp, ss, sor, ser, srat) = got("shuffled")
    assert((sp, ss) == (wantShufPairs, wantShufSame), "shuffled adjacency diverges")
    assert(math.abs(sor - r4(wantShufSame.toDouble / wantShufPairs)) < 1e-9)
    assert(math.abs(ser - r4(expRate)) < 1e-9)
    assert(srat > 0.3 && srat < 2.0,
      s"shuffled clump ratio $srat far from 1 — the p05 coin is clumping sources")
    val (tp, ts, _, _, trat) = got("sorted")
    assert((tp, ts) == (wantSrtPairs, wantSrtSame), "sorted adjacency diverges")
    assert(trat == 0.0,
      "round-robin fixture sources must never collide in id order — the metric lost its teeth")
  }
}
