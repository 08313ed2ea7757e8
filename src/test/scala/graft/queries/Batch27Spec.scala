package graft.queries

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.SparkTestSession

/** Oracle-independent invariants for round-9 batch 30 (trend test,
  * cluster validity, fingerprint-width audit, shard-stability QA,
  * funnel attribution): full driver replays of every statistic, the
  * tie-corrected variance law, s34 cross-consistency, the birthday
  * bound, and funnel conservation with every arm binding.
  */
class Batch27Spec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  private val sf = "/root/testdata/sf0.001"

  private def run(name: String) = graft.SparkEntry.queries(name)(spark, sf)

  private def md5hex(s: String): String =
    java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString

  private def r4(x: Double): Double =
    BigDecimal(x).setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble

  test("r125: S, ties, variance numerator and Z replay exactly from the daily series") {
    val daily = graft.Tables.events(spark, sf)
      .groupBy(col("event_type"), to_date(col("ts")).as("day"))
      .agg(count(lit(1)).as("c"))
      .collect().map(r => (r.getString(0), r.getDate(1).toString, r.getLong(2)))
    val got = run("r125_mann_kendall").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getDouble(4)))
    assert(got.map(_._1).toSet == daily.map(_._1).toSet)
    got.foreach { case (et, nDays, sStat, varNum, z) =>
      val series = daily.filter(_._1 == et).sortBy(_._2).map(_._3)
      val n = series.length.toLong
      assert(nDays == n)
      val wantS = (for {
        i <- series.indices; j <- (i + 1) until series.length
      } yield java.lang.Long.signum(series(j) - series(i)).toLong).sum
      assert(sStat == wantS, s"$et S diverges")
      val tieTerm = series.groupBy(identity).values
        .map(g => { val t = g.length.toLong; t * (t - 1) * (2 * t + 5) }).sum
      val wantVar = n * (n - 1) * (2 * n + 5) - tieTerm
      assert(varNum == wantVar, s"$et variance numerator diverges")
      assert(varNum > 0, s"$et degenerate variance — series is all ties")
      val wantZ =
        if (wantS > 0) r4((wantS - 1).toDouble / math.sqrt(wantVar.toDouble / 18.0))
        else if (wantS < 0) r4((wantS + 1).toDouble / math.sqrt(wantVar.toDouble / 18.0))
        else 0.0
      assert(math.abs(z - wantZ) < 1e-9, s"$et Z diverges")
    }
  }

  test("s36: cells match s34, every column replays from the embeddings, terms are positive") {
    val emb = graft.Tables.embeddings(spark, sf)
      .select(col("vec_id"), col("embedding"))
      .collect().map(r => r.getLong(0) -> r.getSeq[Float](1).toArray).toMap
    def cos(a: Array[Float], b: Array[Float]): Double = {
      var d = 0.0; var na = 0.0; var nb = 0.0
      for (i <- a.indices) {
        d += a(i).toDouble * b(i); na += a(i).toDouble * a(i); nb += b(i).toDouble * b(i)
      }
      d / math.sqrt(na * nb)
    }
    val seedIds = emb.keys.toSeq.sorted.take(8)
    // replay the assignment on the 4dp grid with the query's tie-break
    val assign = emb.keys.toSeq.sorted.map { vid =>
      val best = seedIds.map(sid => (r4(cos(emb(vid), emb(sid))), sid))
        .minBy { case (sim, sid) => (-sim, sid) }
      vid -> best
    }.toMap
    val intra = assign.values.groupBy(_._2).view.mapValues { vs =>
      val ds = vs.map { case (sim, _) => 10000L - math.round(sim * 10000) }
      (vs.size.toLong, ds.sum)
    }.toMap
    val got = run("s36_davies_bouldin").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getLong(3), r.getDouble(4)))
    // cross-query: same codebook as s34, so cell populations must agree
    val s34Sizes = run("s34_ivf_maintenance").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got.map(t => t._1 -> t._2).toMap == s34Sizes, "s36 cells disagree with s34")
    got.foreach { case (cell, n, meanIntra, partner, dbTerm) =>
      val (wn, wsum) = intra(cell)
      assert(n == wn, s"cell $cell population diverges")
      assert(math.abs(meanIntra - r4(wsum.toDouble / (wn * 10000.0))) < 1e-9)
      assert(partner != cell, "a cell cannot be its own worst partner")
      assert(dbTerm > 0.0, "separation ratio must be positive")
      // replay the argmax over partners
      val ratios = seedIds.filter(_ != cell).map { j =>
        val m = math.max(10000L - math.round(r4(cos(emb(cell), emb(j))) * 10000), 1L)
        val (nj, sj) = intra(j)
        (r4((wsum * nj + sj * wn).toDouble / (wn * nj * m).toDouble), j)
      }
      val want = ratios.minBy { case (ratio, j) => (-ratio, j) }
      assert((dbTerm, partner) == want, s"cell $cell worst pair diverges")
    }
  }

  test("u31: prefix collisions replay; collisions shrink with width; birthday math is exact") {
    val texts = graft.Tables.documents(spark, sf).select(col("text"))
      .collect().map(_.getString(0)).distinct
    val got = run("u31_hash_width_audit").collect()
      .map(r => (r.getInt(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getDouble(4), r.getDouble(5)))
    assert(got.map(_._1).toSeq == ExtraQueries28.HashWidths)
    got.foreach { case (w, n, np, coll, expd, ratio) =>
      assert(n == texts.length.toLong)
      val wantNp = texts.map(t => md5hex(t).substring(0, w)).distinct.length.toLong
      assert(np == wantNp, s"width $w distinct prefixes diverge")
      assert(coll == n - np)
      val eraw = n.toDouble * (n - 1) / 2.0 / math.pow(16.0, w)
      assert(math.abs(expd - BigDecimal(eraw).setScale(8, BigDecimal.RoundingMode.HALF_UP)
        .toDouble) < 1e-12)
      assert(math.abs(ratio - r4(coll.toDouble / eraw)) < 1e-9)
    }
    val colls = got.map(_._4)
    assert(colls.zip(colls.drop(1)).forall(p => p._1 >= p._2),
      "collisions must be nonincreasing in prefix width")
    assert(got.head._4 > 0, "width 4 must collide on this fixture — else the audit is vacuous")
    assert(got.last._4 == 0, "width 8 must be collision-free on this fixture")
  }

  test("t42: per-half ranks, overlap, Jaccard and footrule replay from the token counts") {
    val toks = graft.Tables.documents(spark, sf)
      .select(col("doc_id"), col("text")).collect()
      .flatMap(r => r.getString(1).split(" ", -1).map(t => (r.getLong(0) % 2, t)))
    def top(half: Long, k: Int): Map[String, Long] =
      toks.filter(_._1 == half).groupBy(_._2).view.mapValues(_.length.toLong).toSeq
        .sortBy { case (t, n) => (-n, t) }.take(k).zipWithIndex
        .map { case ((t, _), i) => t -> (i + 1).toLong }.toMap
    val got = run("t42_token_rank_drift").collect()
      .map(r => (r.getInt(0), r.getLong(1), r.getDouble(2), r.getLong(3)))
    assert(got.map(_._1).toSeq == ExtraQueries28.DriftKs)
    got.foreach { case (k, nCommon, jac, foot) =>
      val (a, b) = (top(0, k), top(1, k))
      val common = a.keySet intersect b.keySet
      assert(nCommon == common.size.toLong, s"k=$k overlap diverges")
      assert(nCommon > 0, s"k=$k no common tokens — fixture degenerate")
      assert(math.abs(jac - r4(common.size.toDouble / (2.0 * k - common.size))) < 1e-9)
      assert(foot == common.toSeq.map(t => math.abs(a(t) - b(t))).sum, s"k=$k footrule diverges")
    }
    assert(got.exists(_._4 > 0),
      "footrule must be nonzero at some K — else rank drift is never exercised")
  }

  test("p36: attribution replays the serial funnel; conservation holds; every arm binds") {
    val docs = graft.Tables.documents(spark, sf)
      .select(col("doc_id"), col("source"), col("n_chars"), col("text"))
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getString(3)))
      .sortBy(_._1)
    val dupRk = docs.groupBy(t => md5hex(t._4.substring(0, math.min(100, t._4.length))))
      .values.flatMap { fam =>
        fam.sortBy(_._1).zipWithIndex.map { case (t, i) => t._1 -> (i + 1) }
      }.toMap
    var capPos = Map.empty[String, Long]
    val labels = docs.map { case (id, src, nc, text) =>
      val s1 = nc < ExtraQueries28.MinChars
      val dup = dupRk(id) > 1
      val s3 = text.contains(ExtraQueries28.ContamToken)
      val surv = !s1 && !dup && !s3
      if (surv) capPos = capPos.updated(src, capPos.getOrElse(src, 0L) + 1)
      val label =
        if (s1) "quality" else if (dup) "dup" else if (s3) "contam"
        else if (capPos(src) > ExtraQueries28.SourceCap) "cap" else "kept"
      ((src, label), 1L)
    }
    val want = labels.groupBy(_._1).view.mapValues(_.map(_._2).sum).toMap
    val got = run("p36_drop_attribution").collect()
      .map(r => (r.getString(0), r.getString(1)) -> r.getLong(2)).toMap
    assert(got == want, "attribution counts diverge from the serial replay")
    assert(got.values.sum == docs.length.toLong, "funnel must conserve the corpus")
    val arms = got.keys.map(_._2).toSet
    assert(arms == Set("quality", "dup", "contam", "cap", "kept"),
      s"every funnel arm must bind at this SF — got $arms")
    // kept per source never exceeds the cap
    got.filter(_._1._2 == "kept").foreach { case ((src, _), n) =>
      assert(n <= ExtraQueries28.SourceCap, s"$src kept $n exceeds the cap")
    }
  }
}
