package graft.queries

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.SparkTestSession

/** Oracle-independent invariants for round-9 batch 35 (CUPED, SPRT,
  * similarity scatter, stoplist sweep, XOR checksums): moment replays,
  * the fixed-point walk replay with both verdict arms, population
  * separation/overlap structure, the t45 p_o cross-pin, and checksum
  * commutativity plus tamper sensitivity.
  */
class Batch32Spec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  private val sf = "/root/testdata/sf0.001"

  private def run(name: String) = graft.SparkEntry.queries(name)(spark, sf)

  private def md5hex(s: String): String =
    java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString

  private def r4(x: Double): Double =
    BigDecimal(x).setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble

  test("r132: theta and both variances replay from exact cent totals; adjustment never hurts much") {
    val cut = java.sql.Timestamp.valueOf("2024-01-16 00:00:00")
    val ev = graft.Tables.events(spark, sf)
      .select(col("user_id"), col("ts"), col("value"))
      .collect().map(r => (r.getLong(0), r.getTimestamp(1), r.getDouble(2)))
    def cents(v: Double): Long =
      (BigDecimal(v).setScale(2, BigDecimal.RoundingMode.HALF_UP) * 100).toLongExact
    val per = ev.groupBy(_._1).view.mapValues { es =>
      (es.filter(_._2.before(cut)).map(e => cents(e._3)).sum,
        es.filterNot(_._2.before(cut)).map(e => cents(e._3)).sum)
    }.toMap
    val nu = per.size.toLong
    val (sx, sy) = (per.values.map(_._1).sum, per.values.map(_._2).sum)
    val sxx = per.values.map(p => p._1 * p._1).sum
    val sxy = per.values.map(p => p._1 * p._2).sum
    val syy = per.values.map(p => p._2 * p._2).sum
    val theta = (nu * sxy - sx * sy).toDouble / (nu * sxx - sx.toDouble * sx)
    val meanPre = sx.toDouble / nu
    val adj = per.values.map(p => math.round(p._2 - theta * (p._1 - meanPre))).toSeq
    val (sa, saa) = (adj.sum, adj.map(a => a * a).sum)
    val Seq(row) = run("r132_cuped").collect().toSeq
    assert(row.getLong(0) == nu)
    assert(math.abs(row.getDouble(1) - BigDecimal(theta)
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble) < 1e-9)
    val varPost = (nu * syy - sy.toDouble * sy) / (nu * (nu - 1)) / 1e4
    val varAdj = (nu * saa - sa.toDouble * sa) / (nu * (nu - 1)) / 1e4
    assert(math.abs(row.getDouble(2) - BigDecimal(varPost)
      .setScale(2, BigDecimal.RoundingMode.HALF_UP).toDouble) < 1e-9)
    assert(math.abs(row.getDouble(3) - BigDecimal(varAdj)
      .setScale(2, BigDecimal.RoundingMode.HALF_UP).toDouble) < 1e-9)
    assert(math.abs(row.getDouble(4) - r4(1.0 - varAdj / varPost)) < 1e-9)
    // CUPED with the OLS theta cannot increase variance beyond rounding slack
    assert(row.getDouble(4) > -0.01, "adjustment increased variance — theta is not the OLS slope")
  }

  test("r133: the fixed-point walk replays day by day and both verdict arms are reachable") {
    val ev = graft.Tables.events(spark, sf)
      .select(to_date(col("ts")).as("day"), col("event_type"))
      .collect().map(r => (r.getDate(0).toString, r.getString(1) == "purchase"))
    val daily = ev.groupBy(_._1).view
      .mapValues(v => (v.size.toLong, v.count(_._2).toLong)).toSeq.sortBy(_._1)
    val c1 = (math.log(ExtraQueries33.SprtP1 / ExtraQueries33.SprtP0) * 1e9).toLong
    val c2 = (math.log((1 - ExtraQueries33.SprtP1) / (1 - ExtraQueries33.SprtP0)) * 1e9).toLong
    val got = run("r133_sprt").collect()
      .map(r => (r.getDate(0).toString, r.getLong(1), r.getLong(2), r.getDouble(3),
        r.getDouble(4), r.getString(5)))
    assert(got.map(_._1).toSeq == daily.map(_._1))
    var cum = 0L
    got.zip(daily).foreach { case ((day, n, x, inc, cumLlr, state), (_, (wn, wx))) =>
      assert((n, x) == (wn, wx), s"$day counts diverge")
      val wantInc = wx * c1 + (wn - wx) * c2
      cum += wantInc
      assert(math.abs(inc - BigDecimal(wantInc.toDouble / 1e9)
        .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble) < 1e-9)
      assert(math.abs(cumLlr - BigDecimal(cum.toDouble / 1e9)
        .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble) < 1e-9)
      val wantState =
        if (cum > ExtraQueries33.SprtBarrierFp) "accept_h1"
        else if (cum < -ExtraQueries33.SprtBarrierFp) "accept_h0" else "continue"
      assert(state == wantState, s"$day verdict diverges")
    }
    val states = got.map(_._6).toSet
    assert(states.contains("continue") && (states.contains("accept_h1") ||
      states.contains("accept_h0")),
      "the walk must both continue and cross a barrier on this fixture")
  }

  test("d33: pair populations replay; dup pairs live in the top cell; background overlaps it") {
    val docs = graft.Tables.documents(spark, sf)
      .select(col("doc_id"), col("text"))
      .collect().map(r => (r.getLong(0), r.getString(1)))
    val got = run("d33_sim_scatter").collect()
      .map(r => ((r.getString(0), r.getLong(1), r.getLong(2)), r.getLong(3))).toMap
    val famTotal = got.collect { case ((p, _, _), n) if p == "dup_family" => n }.sum
    val bgTotal = got.collect { case ((p, _, _), n) if p == "background" => n }.sum
    // family pairs: adjacent within md5(prefix-100) families
    val wantFam = docs.groupBy(t => md5hex(t._2.take(100))).values
      .map(f => (f.size - 1).toLong).sum
    assert(famTotal == wantFam, "dup_family pair count diverges")
    // background: bucketed shuffled successors, n - #nonempty buckets
    val buckets = docs.map(t => md5hex(s"shuffle:${t._1}").substring(0, 2)).distinct.length
    assert(bgTotal == docs.length.toLong - buckets, "background pair count diverges")
    // the planted families are near-identical: every pair in the top cell
    assert(got.getOrElse(("dup_family", 9L, 9L), 0L) == famTotal,
      "a planted dup pair fell out of the (9,9) cell")
    // the fixture's shared vocabulary pushes background mass INTO the top
    // deciles — the weakness this table exists to expose
    assert(got.contains(("background", 9L, 9L)),
      "no background mass in the top cell — the overlap story no longer holds")
    val bgJacDeciles = got.keys.collect { case ("background", j, _) => j }.toSet
    assert(bgJacDeciles.size >= 4, "background spread collapsed — the scatter lost its range")
  }

  test("t46: accuracy replays per list size and the N=5 row equals t45's observed agreement") {
    val m = TextQueries.langStops.toMap
    val docs = graft.Tables.documents(spark, sf)
      .select(col("lang"), col("text"))
      .collect().map(r => (r.getString(0), r.getString(1)))
    def guess(text: String, n: Int): String = {
      val ts = text.split(" ", -1)
      def c(l: String) = ts.count(m(l).take(n).contains)
      if (c("es") >= c("en") && c("es") >= c("de") && c("es") >= c("fr")) "es"
      else if (c("de") >= c("en") && c("de") >= c("fr")) "de"
      else if (c("fr") >= c("en")) "fr" else "en"
    }
    val got = run("t46_stoplist_sweep").collect()
      .map(r => (r.getInt(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
    assert(got.map(_._1).toSeq == ExtraQueries33.StopNs)
    got.foreach { case (n, nd, nc, acc) =>
      assert(nd == docs.length.toLong)
      val correct = docs.count { case (lang, text) => guess(text, n) == lang }.toLong
      assert(nc == correct, s"N=$n correct count diverges")
      assert(math.abs(acc - r4(correct.toDouble / docs.length)) < 1e-9)
    }
    // cross-pin: the N=5 rule IS t07/t22/t45's rule, so accuracy == p_o
    val po = run("t45_langid_kappa").collect().head.getDouble(3)
    val acc5 = got.find(_._1 == 5).get._4
    assert(math.abs(acc5 - BigDecimal(po).setScale(4, BigDecimal.RoundingMode.HALF_UP)
      .toDouble) < 5e-5 + 1e-9, "N=5 accuracy disagrees with t45's p_o")
  }

  test("u36: checksums replay, commute under reordering, and flip on a single tampered row") {
    val docs = graft.Tables.documents(spark, sf)
      .select(col("doc_id"), col("source"), col("text"))
      .collect().map(r => (r.getLong(0), r.getString(1), r.getString(2)))
    def h(id: Long, text: String): Long =
      java.lang.Long.parseLong(md5hex(s"$id:$text").substring(0, 15), 16)
    val got = run("u36_transfer_checksums").collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap
    docs.groupBy(_._2).foreach { case (src, rows) =>
      val (n, x) = got(src)
      assert(n == rows.size.toLong)
      val fwd = rows.sortBy(_._1).map(r => h(r._1, r._3)).foldLeft(0L)(_ ^ _)
      val rev = rows.sortBy(-_._1).map(r => h(r._1, r._3)).foldLeft(0L)(_ ^ _)
      assert(fwd == rev, "XOR must commute — order independence is the point")
      assert(x == fwd, s"$src checksum diverges")
      // tamper sensitivity: flipping one row's text changes the checksum
      val tampered = rows.sortBy(_._1).zipWithIndex.map { case ((id, _, t), i) =>
        if (i == 0) h(id, t + "!") else h(id, t)
      }.foldLeft(0L)(_ ^ _)
      assert(tampered != fwd, s"$src checksum blind to a tampered row")
    }
  }
}
