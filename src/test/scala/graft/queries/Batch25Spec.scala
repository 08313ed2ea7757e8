package graft.queries

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.SparkTestSession

/** Oracle-independent invariants for round-9 batch 28 (estimator
  * machinery): full driver replays of the Poisson coin chain, the
  * histogram interpolation, cell actions, the sampling chi-square, and
  * the tray selection — plus the law-level checks (CI brackets, action
  * arms all firing, checksum integrity).
  */
class Batch25Spec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  private val sf = "/root/testdata/sf0.001"

  private def run(name: String) = graft.SparkEntry.queries(name)(spark, sf)

  private def md5hex(s: String): String =
    java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString

  private def coin(s: String): Long =
    java.lang.Long.parseLong(md5hex(s).substring(0, 6), 16)

  test("r123: replicate means replay from the integer Poisson coins; CI brackets the mean") {
    val events = graft.Tables.events(spark, sf)
      .select(col("event_id"), col("event_type"),
        col("value").cast("decimal(18,2)").as("v"))
      .collect().map(r => (r.getLong(0), r.getString(1), r.getDecimal(2)))
    val got = run("r123_poisson_bootstrap").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getDouble(2), r.getDouble(3), r.getDouble(4)))
    assert(got.nonEmpty)
    got.foreach { case (tpe, n, mean, lo, hi) =>
      val es = events.filter(_._2 == tpe)
      assert(n == es.length.toLong)
      // replay all B replicate means with the exact windowed-slice coins
      val perHash = ExtraQueries26.BootRepsPerHash
      val means = (0 until ExtraQueries26.BootB).map { b =>
        var wsum = java.math.BigDecimal.ZERO
        var wn = 0L
        es.foreach { case (id, _, v) =>
          val hex = md5hex(s"boot:${b / perHash}:$id")
          val u = java.lang.Long.parseLong(
            hex.substring((b % perHash) * 4, (b % perHash) * 4 + 4), 16)
          val w = ExtraQueries26.PoisThresholds.count(u >= _)
          wsum = wsum.add(v.multiply(java.math.BigDecimal.valueOf(w.toLong)))
          wn += w
        }
        (wsum.doubleValue() / wn.toDouble, b)
      }.sorted
      val wantLo = means(math.ceil(0.05 * ExtraQueries26.BootB).toInt - 1)._1
      val wantHi = means(math.ceil(0.95 * ExtraQueries26.BootB).toInt - 1)._1
      assert(math.abs(lo - math.rint(wantLo * 1e4) / 1e4) < 1e-9, s"$tpe lo95 diverges")
      assert(math.abs(hi - math.rint(wantHi * 1e4) / 1e4) < 1e-9, s"$tpe hi95 diverges")
      assert(lo < hi, s"$tpe degenerate CI")
      assert(lo <= mean && mean <= hi, s"$tpe CI does not bracket the point estimate")
    }
  }

  test("u29: estimates replay the interpolation; the offset grid forces partial buckets") {
    val vals = graft.Tables.orders(spark, sf)
      .select(col("o_totalprice").cast("decimal(18,2)").cast("double")).collect()
      .map(_.getDouble(0))
    val (lo, hi) = (vals.min, vals.max)
    val w = (hi - lo) / ExtraQueries26.SelBuckets
    val counts = vals.groupBy(v =>
      math.min(ExtraQueries26.SelBuckets - 1, math.floor((v - lo) / w).toInt))
      .view.mapValues(_.length.toLong).toMap
    val got = run("u29_selectivity_audit").collect()
      .map(r => (r.getInt(0), r.getDouble(1), r.getDouble(2), r.getDouble(3),
        r.getLong(4), r.getDouble(5)))
    assert(got.length == ExtraQueries26.SelPreds)
    got.foreach { case (pid, _, _, est, tru, relErr) =>
      val plo = lo + (pid * 2 + 1) * (hi - lo) / 16
      val phi = lo + (pid * 2 + 3) * (hi - lo) / 16
      val wantEst = (0 until ExtraQueries26.SelBuckets).map { b =>
        val (blo, bhi) = (lo + b * w, lo + (b + 1) * w)
        counts.getOrElse(b, 0L) * math.max(0.0, math.min(bhi, phi) - math.max(blo, plo)) / w
      }.sum
      val wantTrue = vals.count(v => v >= plo && v < phi).toLong
      assert(math.abs(est - math.rint(wantEst * 1e4 / 1e2) / 1e2) < 1e-6,
        s"pred $pid estimate diverges")
      assert(tru == wantTrue, s"pred $pid truth diverges")
      assert(math.abs(relErr - math.rint((wantEst - tru) / math.max(tru, 1L) * 1e4) / 1e4) < 1e-9)
    }
    // the half-bucket offset must force interpolation somewhere: some
    // estimate is fractional (a whole-bucket-only estimate is integral)
    assert(got.exists(t => t._4 != math.floor(t._4)), "no partial-bucket estimate — grid broken")
  }

  test("s34: sizes and actions replay; all three verdicts fire; partner is nearest other seed") {
    val got = run("s34_ivf_maintenance").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getString(3),
        r.getLong(4), r.getDouble(5)))
    assert(got.map(_._4).toSet == Set("split", "merge", "ok"),
      "all three maintenance verdicts must fire on this fixture")
    val n = got.map(_._2).sum
    got.foreach { case (cell, size, load, action, partner, _) =>
      assert(math.abs(load - math.rint(size.toDouble * 8 / n * 1e4) / 1e4) < 1e-9)
      val want = if (size * 80 > n * 11) "split" else if (size * 80 < n * 9) "merge" else "ok"
      assert(action == want, s"cell $cell action diverges")
      assert(partner != cell, "partner must be another cell")
    }
    // every vector lands in exactly one cell: sizes partition the corpus
    assert(n == graft.Tables.embeddings(spark, sf).count())
  }

  test("p34: counts replay the sampling coin; chi-square contributions are exact") {
    val docs = graft.Tables.documents(spark, sf).select(col("doc_id"), col("source"))
      .collect().map(r => (r.getLong(0), r.getString(1)))
    val kept = docs.filter(t => coin(s"sample:${t._1}") % 1000 < 120).groupBy(_._2)
      .view.mapValues(_.length.toLong).toMap
    val corpus = docs.groupBy(_._2).view.mapValues(_.length.toLong).toMap
    val (nn, ss) = (docs.length.toLong, kept.values.sum)
    val got = run("p34_sample_representativeness").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getDouble(3), r.getDouble(4)))
    assert(got.map(_._1).toSet == corpus.keySet)
    got.foreach { case (src, cn, sn, expd, contrib) =>
      assert(cn == corpus(src) && sn == kept.getOrElse(src, 0L), s"$src counts diverge")
      val e = cn.toDouble * ss / nn
      assert(math.abs(expd - math.rint(e * 1e4) / 1e4) < 1e-9)
      assert(math.abs(contrib - math.rint((sn - e) * (sn - e) / e * 1e4) / 1e4) < 1e-9)
      assert(contrib >= 0.0)
    }
    assert(got.map(_._3).sum == ss, "sampled counts must partition the sample")
    assert(got.exists(_._5 > 0.0), "zero deviation everywhere — coin degenerate")
  }

  test("m21: tray replays the coin ranking; checksums match the payload bytes") {
    val docs = graft.Tables.documents(spark, sf)
      .select(col("doc_id"), col("source"), col("text")).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2)))
    def mime(src: String) =
      if (src == "src0") "image/png" else if (src == "src1") "audio/wav" else "video/mp4"
    val want = docs.groupBy(t => mime(t._2)).toSeq.flatMap { case (m, ds) =>
      ds.map(t => (t._1, coin(s"tray:${t._1}"), t._3)).sortBy(t => (t._2, t._1))
        .take(ExtraQueries26.TrayPerMime).zipWithIndex
        .map { case ((id, _, text), i) => (m, (i + 1).toLong, id, md5hex(text)) }
    }.toSet
    val got = run("m21_eval_tray").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getString(4))).toSet
    assert(got == want, "tray selection diverges from coin replay")
    assert(got.size == 3 * ExtraQueries26.TrayPerMime)
  }
}
