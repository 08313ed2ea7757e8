package graft.queries

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.SparkTestSession

/** Oracle-independent invariants for round-9 batch 34 (odds ratio,
  * centroid drift, expectation suite, HT cluster sampling, EB
  * shrinkage): 2×2 replays, the healthy>null drift margin, suite
  * verdict wiring with a deliberately red check, HT unbiasedness
  * mechanics, and the shrinkage-toward-prior law.
  */
class Batch31Spec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  private val sf = "/root/testdata/sf0.001"

  private def run(name: String) = graft.SparkEntry.queries(name)(spark, sf)

  private def md5hex(s: String): String =
    java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString

  private def r4(x: Double): Double =
    BigDecimal(x).setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble

  test("r130: the 2x2 replays; CI brackets the OR; RR and OR sit on the same side of 1") {
    val ev = graft.Tables.events(spark, sf)
      .select(col("user_id"), col("event_type"))
      .collect().map(r => (r.getLong(0) % 2 == 0, r.getString(1) == "purchase"))
    val (a, b) = (ev.count(t => t._1 && t._2).toLong, ev.count(t => t._1 && !t._2).toLong)
    val (c, d) = (ev.count(t => !t._1 && t._2).toLong, ev.count(t => !t._1 && !t._2).toLong)
    val Seq(row) = run("r130_odds_ratio").collect().toSeq
    assert((row.getLong(0), row.getLong(1), row.getLong(2), row.getLong(3)) == (a, b, c, d))
    val or = a.toDouble * d / (b.toDouble * c)
    val se = math.sqrt(1.0 / a + 1.0 / b + 1.0 / c + 1.0 / d)
    assert(math.abs(row.getDouble(4) - r4(or)) < 1e-9)
    assert(math.abs(row.getDouble(5) - r4(math.exp(math.log(or) - 1.96 * se))) < 1e-9)
    assert(math.abs(row.getDouble(6) - r4(math.exp(math.log(or) + 1.96 * se))) < 1e-9)
    val rr = (a.toDouble / (a + b)) / (c.toDouble / (c + d))
    assert(math.abs(row.getDouble(7) - r4(rr)) < 1e-9)
    assert(row.getDouble(5) < row.getDouble(4) && row.getDouble(4) < row.getDouble(6))
    assert((or > 1) == (rr > 1), "OR and RR must agree on direction")
  }

  test("s37: memberships replay and the healthy cosine beats the null for every label") {
    val emb = graft.Tables.embeddings(spark, sf)
      .select(col("vec_id"), col("label"), col("embedding"))
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getSeq[Float](2).toArray))
    def centroid(rows: Seq[Array[Float]]): Array[Double] = {
      val dim = rows.head.length
      val fp = Array.fill(dim)(0L)
      rows.foreach(v => (0 until dim).foreach(i => fp(i) += (v(i).toDouble * 1e9).toLong))
      fp.map(_.toDouble / 1e9 / rows.size)
    }
    def cos(x: Array[Double], y: Array[Double]): Double = {
      var dp = 0.0; var nx = 0.0; var ny = 0.0
      for (i <- x.indices) { dp += x(i) * y(i); nx += x(i) * x(i); ny += y(i) * y(i) }
      dp / math.sqrt(nx * ny)
    }
    val got = run("s37_centroid_drift").collect()
      .map(r => (r.getInt(0), r.getLong(1), r.getLong(2), r.getDouble(3), r.getDouble(4)))
    assert(got.map(_._1).toSeq == emb.map(_._2).distinct.sorted.toSeq)
    got.foreach { case (label, nA, nB, healthy, nul) =>
      val l = emb.filter(_._2 == label)
      val sa = l.filter(_._1 % 10 < 9).map(_._3); val sb = l.filter(_._1 % 10 > 0).map(_._3)
      assert((nA, nB) == (sa.length.toLong, sb.length.toLong))
      // tolerance: the engine truncates each float once; the replay does
      // the same, so agreement is on the 6dp grid
      assert(math.abs(healthy - BigDecimal(cos(centroid(sa), centroid(sb)))
        .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble) < 1e-9, s"label $label healthy")
      val h0 = l.filter(_._1 % 2 == 0).map(_._3); val h1 = l.filter(_._1 % 2 == 1).map(_._3)
      assert(math.abs(nul - BigDecimal(cos(centroid(h0), centroid(h1)))
        .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble) < 1e-9, s"label $label null")
      assert(healthy > nul + 0.3,
        s"label $label: healthy $healthy must clear the null $nul by a detection margin")
    }
  }

  test("u35: observations replay; exactly one check is red and the verdict wiring is honest") {
    val docs = graft.Tables.documents(spark, sf)
      .select(col("doc_id"), col("text"), col("n_chars"), col("lang"), col("source"))
      .collect()
    val got = run("u35_expectation_suite").collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2), r.getBoolean(3))).toMap
    assert(got.size == 8)
    assert(got("min_row_count") == ((docs.length.toLong, ExtraQueries32.MinRows, true)))
    assert(got("pk_unique")._1 == docs.length - docs.map(_.getLong(0)).distinct.length)
    val dups = docs.length - docs.map(r => md5hex(r.getString(1).take(100))).distinct.length
    assert(got("dup_prefixes_zero") == ((dups.toLong, 0L, dups == 0)))
    assert(!got("dup_prefixes_zero")._3,
      "the planted-dup check must be RED on this corpus — the suite's fail path is the point")
    assert(got("source_cardinality") ==
      ((docs.map(_.getString(4)).distinct.length.toLong, ExtraQueries32.ExpectedSources, true)))
    got.foreach { case (name, (obs, thr, passed)) =>
      val want = name match {
        case "min_row_count" => obs >= thr
        case "source_cardinality" => obs == thr
        case _ => obs == thr
      }
      assert(passed == want, s"$name verdict wiring broken")
    }
    assert(got.values.count(!_._3) == 1, "exactly one red check expected on this fixture")
  }

  test("p39: families replay, whole families travel together, and the HT estimate is close") {
    val docs = graft.Tables.documents(spark, sf).select(col("text"))
      .collect().map(_.getString(0))
    val fams = docs.groupBy(t => md5hex(t.take(100))).view.mapValues(_.length.toLong).toMap
    def sampled(h: String): Boolean =
      java.lang.Long.parseLong(md5hex(s"fam:$h").substring(0, 6), 16) % 1000 <
        ExtraQueries32.FamRate
    val Seq(row) = run("p39_cluster_sampling").collect().toSeq
    assert(row.getLong(0) == fams.size.toLong)
    assert(row.getLong(1) == docs.length.toLong)
    val sfams = fams.filter(kv => sampled(kv._1))
    assert(row.getLong(2) == sfams.size.toLong, "sampled-family count diverges")
    assert(row.getLong(3) == sfams.values.sum, "member expansion diverges — a family split")
    val est = sfams.values.sum.toDouble * 1000.0 / ExtraQueries32.FamRate
    assert(math.abs(row.getDouble(4) -
      BigDecimal(est).setScale(2, BigDecimal.RoundingMode.HALF_UP).toDouble) < 1e-9)
    assert(math.abs(row.getDouble(5)) < 0.25,
      "HT estimate implausibly far from truth at a 30% family rate")
  }

  test("r131: shrinkage replays and every user moves toward the prior, small-n users most") {
    val ev = graft.Tables.events(spark, sf)
      .select(col("user_id"), col("event_type"))
      .collect().map(r => (r.getLong(0), r.getString(1) == "purchase"))
    val per = ev.groupBy(_._1).view.mapValues(v => (v.size.toLong, v.count(_._2).toLong)).toMap
    val micro = per.view.mapValues { case (n, x) => math.round(x * 1000000 / n.toDouble) }.toMap
    val nu = per.size.toLong
    val (sr, sr2) = (micro.values.sum, micro.values.map(r => r * r).sum)
    val m = sr.toDouble / nu / 1e6
    val v = (nu * sr2 - sr * sr).toDouble / (nu * (nu - 1)).toDouble / 1e12
    val k = m * (1 - m) / v - 1.0
    val (alpha, beta) = (m * k, (1 - m) * k)
    assert(alpha > 0 && beta > 0, "MoM prior degenerate on this fixture")
    val got = run("r131_eb_shrinkage").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3), r.getDouble(4),
        r.getDouble(5)))
    got.foreach { case (u, n, x, raw, shrunk, pm) =>
      assert((n, x) == per(u), s"user $u counts diverge")
      assert(math.abs(raw - r4(x.toDouble / n)) < 1e-9)
      assert(math.abs(shrunk - r4((alpha + x) / (alpha + beta + n))) < 1e-9)
      assert(math.abs(pm - r4(m)) < 1e-9)
      // shrinkage law on unrounded values: strictly between raw and prior
      val sh = (alpha + x) / (alpha + beta + n); val rw = x.toDouble / n
      if (math.abs(rw - m) > 1e-12)
        assert((sh - rw).sign == (m - rw).sign && math.abs(sh - m) < math.abs(rw - m),
          s"user $u did not shrink toward the prior")
    }
  }
}
