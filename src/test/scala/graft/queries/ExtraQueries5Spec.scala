package graft.queries

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.SparkTestSession

/** Oracle-independent invariants for ExtraQueries5 (weighted median,
  * CUSUM changepoint, RFM segmentation, last-touch attribution):
  * brute-force equivalence on the tiny SF and the fixture-integrality
  * assumptions the scaladocs cite.
  */
class ExtraQueries5Spec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  private val sf = "/root/testdata/sf0.001"

  test("fixture integrality: quantities are whole and event values sit on a 2-decimal grid") {
    val li = graft.Tables.lineitem(spark, sf)
    assert(li.filter(col("l_quantity") =!= floor(col("l_quantity"))).count() == 0,
      "r80 casts l_quantity to LONG — requires integral quantities")
    val ev = graft.Tables.events(spark, sf)
    // DECIMAL(24,2) rounding of value is unambiguous iff the double is
    // within half an ulp of a 2-decimal grid point (r84's revenue sums)
    assert(ev.filter(abs(col("value") * 100 - round(col("value") * 100)) > lit(1e-6)).count() == 0,
      "r84 sums value as DECIMAL(_,2) — requires 2-decimal grid values")
  }

  test("r80 weighted median matches a brute-force per-group recompute") {
    val rows = graft.SparkEntry.queries("r80_weighted_median")(spark, sf).collect()
    assert(rows.nonEmpty)
    val li = graft.Tables.lineitem(spark, sf)
      .select(col("l_returnflag"), col("l_extendedprice"), col("l_quantity")).collect()
      .map(r => (r.getString(0), BigDecimal(r.getDouble(1)).setScale(2, BigDecimal.RoundingMode.HALF_UP), r.getDouble(2).toLong))
    rows.foreach { r =>
      val grp = li.filter(_._1 == r.getString(0)).sortBy(_._2)
      val wtot = grp.map(_._3).sum
      var cum = 0L
      val med = grp.find { g => cum += g._3; cum * 2 >= wtot }.get._2
      val got = r.getDecimal(1)
      assert(BigDecimal(got) == med, s"${r.getString(0)}: engine $got vs brute $med")
      assert(r.getLong(2) == wtot)
    }
  }

  test("r81 CUSUM peak day and magnitude match a brute-force scan") {
    val rows = graft.SparkEntry.queries("r81_cusum_changepoint")(spark, sf).collect()
    assert(rows.nonEmpty)
    val daily = graft.Tables.events(spark, sf)
      .groupBy(col("event_type"), to_date(col("ts")).as("day"))
      .agg(count(lit(1)).as("cnt")).collect()
      .map(r => (r.getString(0), r.getDate(1).toString, r.getLong(2)))
    rows.foreach { r =>
      val series = daily.filter(_._1 == r.getString(0)).sortBy(_._2)
      val dd = series.length.toLong
      val tt = series.map(_._3).sum
      var cum = 0L
      val cusums = series.map { case (_, day, cnt) => cum += cnt * dd - tt; (day, math.abs(cum)) }
      val maxAbs = cusums.map(_._2).max
      val cpDay = cusums.filter(_._2 == maxAbs).map(_._1).min
      assert(r.getDate(1).toString == cpDay, s"${r.getString(0)}: engine ${r.getDate(1)} vs brute $cpDay")
      // peak_dev_events is published 4dp-rounded: tolerance half an ulp of that grid
      assert(math.abs(r.getDouble(3) - maxAbs.toDouble / dd) <= 5.01e-5)
    }
  }

  test("r82 segments partition the customer base with valid 1..5 scores") {
    val rows = graft.SparkEntry.queries("r82_rfm_segments")(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert((1 to 5).contains(r.getInt(0)) && (1 to 5).contains(r.getInt(1)) &&
        (1 to 5).contains(r.getInt(2)), s"scores out of range: $r")
    }
    val nBuyers = graft.Tables.orders(spark, sf).select("o_custkey").distinct().count()
    assert(rows.map(_.getLong(3)).sum == nBuyers, "segment counts must partition the buyers")
    // segment value conserves total order value (exact decimal algebra)
    val total = graft.Tables.orders(spark, sf)
      .agg(sum(col("o_totalprice").cast(org.apache.spark.sql.types.DecimalType(24, 2))))
      .collect().head.getDecimal(0)
    val segSum = rows.map(r => BigDecimal(r.getDecimal(4))).sum
    assert(segSum == BigDecimal(total), s"segment value $segSum vs corpus $total")
  }

  test("r84 attribution conserves purchase revenue and matches a brute-force timeline") {
    val rows = graft.SparkEntry.queries("r84_attribution")(spark, sf).collect()
    assert(rows.nonEmpty)
    assert(rows.map(_.getString(0)).toSet.subsetOf(Set("click", "view", "direct")))
    val evs = graft.Tables.events(spark, sf)
      .select(col("user_id"), unix_micros(col("ts")), col("event_id"), col("event_type"), col("value"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getString(3), r.getDouble(4)))
    val brute = evs.groupBy(_._1).toSeq.flatMap { case (_, es) =>
      val ordered = es.sortBy(e => (e._2, e._3))
      var touch: String = null
      ordered.flatMap { e =>
        val out = if (e._4 == "purchase")
          Some((if (touch == null) "direct" else touch,
            BigDecimal(e._5).setScale(2, BigDecimal.RoundingMode.HALF_UP))) else None
        if (e._4 == "click" || e._4 == "view") touch = e._4
        out
      }
    }.groupBy(_._1).map { case (ch, vs) => ch -> (vs.size.toLong, vs.map(_._2).sum) }
    rows.foreach { r =>
      val (n, rev) = brute(r.getString(0))
      assert(r.getLong(1) == n, s"${r.getString(0)}: engine ${r.getLong(1)} vs brute $n purchases")
      assert(BigDecimal(r.getDecimal(2)) == rev, s"${r.getString(0)}: engine ${r.getDecimal(2)} vs brute $rev")
    }
    assert(rows.map(_.getLong(1)).sum == evs.count(_._4 == "purchase"),
      "every purchase must be attributed exactly once")
  }

  test("t24 Heaps fit is a plausible sublinear growth law with near-perfect r2") {
    val r = graft.SparkEntry.queries("t24_heaps_fit")(spark, sf).collect().head
    assert(r.getLong(0) == 10, "ten checkpoints")
    val beta = r.getDouble(1)
    // vocabulary grows, but strictly sublinearly, on any natural-ish corpus
    assert(beta > 0.0 && beta < 1.0, s"beta $beta outside (0,1)")
    assert(r.getDouble(3) > 0.9, s"r2 ${r.getDouble(3)} — ln-ln fit should be near-linear")
  }

  test("t25 PMI values reproduce from corpus bigram counts") {
    val rows = graft.SparkEntry.queries("t25_pmi_collocations")(spark, sf).collect()
    assert(rows.length <= 20 && rows.nonEmpty)
    // brute-force the bigram stream and its marginals
    val docsTok = graft.Tables.documents(spark, sf)
      .select(col("doc_id"), split(col("text"), " ").as("t")).collect()
      .map(r => r.getSeq[String](1))
    val bigrams = docsTok.flatMap(t => t.sliding(2).filter(_.length == 2).map(p => (p(0), p(1))))
    val nn = bigrams.length.toLong
    val cxy = bigrams.groupBy(identity).map { case (k, v) => k -> v.length.toLong }
    val cx = bigrams.groupBy(_._1).map { case (k, v) => k -> v.length.toLong }
    val cy = bigrams.groupBy(_._2).map { case (k, v) => k -> v.length.toLong }
    rows.foreach { r =>
      val (x, y, n) = (r.getString(0), r.getString(1), r.getLong(2))
      assert(cxy((x, y)) == n, s"pair ($x,$y): engine $n vs brute ${cxy((x, y))}")
      val pmi = math.log(n.toDouble * nn / (cx(x).toDouble * cy(y)))
      assert(math.abs(r.getDouble(3) - pmi) < 1e-6, s"($x,$y): pmi ${r.getDouble(3)} vs $pmi")
      assert(n >= 5, "min-count floor")
    }
    // published list must be the global maxima: no unlisted pair may beat the last listed PMI
    val floor = rows.map(_.getDouble(3)).min - 1e-9
    val better = cxy.count { case ((x, y), n) =>
      n >= 5 && math.log(n.toDouble * nn / (cx(x).toDouble * cy(y))) > floor + 1e-6 }
    assert(better <= 20, s"$better pairs exceed the published floor — top-20 not maximal")
  }

  test("t26 keywords are positively associated and per-source ranks are dense") {
    val rows = graft.SparkEntry.queries("t26_llr_keywords")(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.groupBy(_.getString(0)).foreach { case (src, rs) =>
      assert(rs.map(_.getLong(1)).sorted.toSeq == (1L to rs.length).toSeq, s"$src ranks not dense")
    }
    rows.foreach { r =>
      assert(r.getLong(3) >= 5, "min-count floor")
      assert(r.getDouble(4) > 0.0, s"${r.getString(0)}/${r.getString(2)}: LLR must be positive")
    }
  }

  test("s19 triangle census matches a brute-force count over the same kNN graph") {
    val r = graft.SparkEntry.queries("s19_triangle_census")(spark, sf).collect().head
    val edges = graft.SparkEntry.queries("s10_knn_graph")(spark, sf)
      .select("a_id", "b_id").collect()
      .map(x => (math.min(x.getLong(0), x.getLong(1)), math.max(x.getLong(0), x.getLong(1))))
      .toSet
    val verts = edges.flatMap(e => Seq(e._1, e._2))
    assert(r.getLong(0) == verts.size, "n_vertices")
    assert(r.getLong(1) == edges.size, "n_edges")
    val adj = edges.groupBy(_._1).map { case (k, v) => k -> v.map(_._2) }
    var tri = 0L
    edges.foreach { case (u, v) =>
      adj.getOrElse(v, Set.empty).foreach { w => if (edges.contains((u, w))) tri += 1 }
    }
    assert(r.getLong(2) == tri, s"engine ${r.getLong(2)} vs brute $tri triangles")
    val triads = verts.toSeq.map { x => val d = edges.count(e => e._1 == x || e._2 == x).toLong; d * (d - 1) / 2 }.sum
    assert(math.abs(r.getDouble(3) - 3.0 * tri / triads) < 1e-6, "global clustering")
  }

  test("u17 fan-out audit conserves fact rows on every axis") {
    val rows = graft.SparkEntry.queries("u17_fanout_audit")(spark, sf).collect()
    assert(rows.map(_.getString(0)).toSeq.sorted == Seq("order", "part", "supplier"))
    val nLi = graft.Tables.lineitem(spark, sf).count()
    rows.foreach { r =>
      assert(r.getLong(2) == nLi, s"${r.getString(0)}: n_rows ${r.getLong(2)} != lineitem count $nLi")
      assert(r.getLong(3) >= 1 && r.getLong(3) <= nLi)
      assert(r.getDouble(7) > 0 && r.getDouble(7) <= 1.0, "hottest-key share in (0,1]")
    }
    // the order axis must include zero-fanout orders in its key count
    val nOrders = graft.Tables.orders(spark, sf).count()
    assert(rows.find(_.getString(0) == "order").get.getLong(1) == nOrders)
  }

  test("m12 clipping counts match direct byte-threshold recomputation") {
    val rows = graft.SparkEntry.queries("m12_audio_clipping")(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getLong(1) == 32, "32-sample grid")
      assert(r.getLong(2) + r.getLong(3) <= 32)
      assert(r.getDouble(4) >= 0.0 && r.getDouble(4) <= 255.0, "RMS within byte range")
    }
    // ASCII payload bytes are all printable (32..126): nothing can clip
    // at >=250 and nothing can be silent at <=5 — the QA gate must agree
    assert(rows.forall(r => r.getLong(2) == 0 && r.getLong(3) == 0),
      "printable-ASCII fixture cannot clip or be silent")
  }

  test("p21 as-of state never leaks the future and covers every cohort purchase") {
    val rows = graft.SparkEntry.queries("p21_pit_labels")(spark, sf).collect()
    assert(rows.nonEmpty)
    val evs = graft.Tables.events(spark, sf).filter(col("user_id") % 50 === 0)
      .select(col("user_id"), unix_micros(col("ts")), col("event_id"), col("event_type"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getString(3)))
    assert(rows.length == evs.count(_._4 == "purchase"), "one labeled row per cohort purchase")
    rows.foreach { r =>
      val (uid, eid, labelUs, state) = (r.getLong(0), r.getLong(1), r.getLong(2), r.getString(3))
      val timeline = evs.filter(_._1 == uid).sortBy(e => (e._2, e._3))
      val before = timeline.takeWhile(e => e._2 < labelUs || (e._2 == labelUs && e._3 < eid))
        .filter(_._4 != "purchase")
      val expected = if (before.isEmpty) "none" else before.last._4
      assert(state == expected, s"user $uid purchase $eid: engine $state vs brute $expected")
    }
  }

  test("d18 matrix conserves the d04 pair set and its denominators") {
    val rows = graft.SparkEntry.queries("d18_crosssource_matrix")(spark, sf).collect()
    assert(rows.nonEmpty)
    val nPairs = graft.SparkEntry.queries("d04_minhash_lsh")(spark, sf).count()
    assert(rows.map(_.getLong(2)).sum == nPairs, "matrix must conserve every d04 pair")
    val nd = graft.Tables.documents(spark, sf).groupBy("source").count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    rows.foreach { r =>
      val (sa, sb) = (r.getString(0), r.getString(1))
      val want = if (sa == sb) nd(sa) * (nd(sa) - 1) / 2 else nd(sa) * nd(sb)
      assert(r.getLong(3) == want, s"($sa,$sb): possible_pairs ${r.getLong(3)} vs $want")
      assert(r.getLong(2) <= r.getLong(3), "pairs cannot exceed the possible count")
    }
  }

  test("r85 cells conserve events and lift reproduces from published margins") {
    val rows = graft.SparkEntry.queries("r85_seasonality_lift")(spark, sf).collect()
    val total = graft.Tables.events(spark, sf).count()
    assert(rows.map(_.getLong(2)).sum == total, "cells must conserve every event")
    val rowtot = rows.groupBy(_.getInt(0)).map { case (k, v) => k -> v.map(_.getLong(2)).sum }
    val coltot = rows.groupBy(_.getInt(1)).map { case (k, v) => k -> v.map(_.getLong(2)).sum }
    rows.foreach { r =>
      val lift = r.getLong(2).toDouble * total / (rowtot(r.getInt(0)).toDouble * coltot(r.getInt(1)))
      assert(math.abs(r.getDouble(4) - lift) <= 5.01e-5, s"cell ${r.getInt(0)}x${r.getInt(1)} lift")
    }
  }

  test("r86 hypothetical ranks match a brute-force insert per group") {
    val rows = graft.SparkEntry.queries("r86_hypothetical_rank")(spark, sf).collect()
    val orders = graft.Tables.orders(spark, sf)
      .select(col("o_orderpriority"), col("o_totalprice")).collect()
      .map(r => (r.getString(0), BigDecimal(r.getDouble(1)).setScale(2, BigDecimal.RoundingMode.HALF_UP)))
    val x = BigDecimal("150000.00")
    rows.foreach { r =>
      val grp = orders.filter(_._1 == r.getString(0)).map(_._2)
      assert(r.getLong(1) == grp.length)
      assert(r.getLong(2) == 1 + grp.count(_ > x), s"${r.getString(0)}: hyp_rank")
      val pr = grp.count(_ > x).toDouble / grp.length
      assert(math.abs(r.getDouble(3) - pr) < 1e-6)
    }
  }

  test("t27 Fano factors reproduce from brute-force per-doc count moments") {
    val rows = graft.SparkEntry.queries("t27_burstiness")(spark, sf).collect()
    assert(rows.nonEmpty && rows.length <= 15)
    val docsTok = graft.Tables.documents(spark, sf)
      .select(split(col("text"), " ")).collect().map(_.getSeq[String](0))
    val dd = docsTok.length.toLong
    rows.foreach { r =>
      val tok = r.getString(0)
      val counts = docsTok.map(_.count(_ == tok).toLong)
      val ct = counts.sum
      val s2 = counts.map(c => c * c).sum
      assert(r.getLong(1) == ct, s"$tok: ct")
      assert(r.getLong(2) == counts.count(_ > 0), s"$tok: df")
      val fano = (dd * s2 - ct * ct).toDouble / (dd * ct)
      assert(math.abs(r.getDouble(3) - fano) < 1e-5, s"$tok: fano ${r.getDouble(3)} vs $fano")
      assert(ct >= 50, "min-count floor")
    }
  }

  test("r87 covered time matches a brute-force interval union and never exceeds the span") {
    val rows = graft.SparkEntry.queries("r87_interval_coverage")(spark, sf).collect()
    val evs = graft.Tables.events(spark, sf)
      .select(col("event_type"), unix_micros(col("ts"))).collect()
      .map(r => (r.getString(0), r.getLong(1)))
    rows.foreach { r =>
      val starts = evs.filter(_._1 == r.getString(0)).map(_._2).sorted
      // union length by merging sorted [t, t+300s) intervals
      var (covered, curStart, curEnd) = (0L, Long.MinValue, Long.MinValue)
      starts.foreach { t =>
        if (t > curEnd) { if (curEnd > curStart) covered += curEnd - curStart; curStart = t; curEnd = t + 300000000L }
        else curEnd = math.max(curEnd, t + 300000000L)
      }
      if (curEnd > curStart) covered += curEnd - curStart
      assert(math.abs(r.getDouble(2) - covered / 1e6) < 2e-3,
        s"${r.getString(0)}: engine ${r.getDouble(2)} vs brute ${covered / 1e6} covered sec")
      assert(r.getDouble(3) > 0 && r.getDouble(3) <= 1.0, "utilization in (0,1]")
    }
  }

  test("p22 savings conserve the d08 cluster membership") {
    val rows = graft.SparkEntry.queries("p22_dedup_savings")(spark, sf).collect()
    val nDocs = graft.Tables.documents(spark, sf).count()
    assert(rows.map(_.getLong(1)).sum == nDocs, "per-source totals conserve the corpus")
    val clusters = graft.SparkEntry.queries("d08_dedup_clusters")(spark, sf).collect()
    val expectRemoved = clusters.map(_.getLong(1) - 1).sum
    assert(rows.map(_.getLong(3)).sum == expectRemoved,
      "every non-exemplar cluster member is removed exactly once")
    rows.foreach { r =>
      assert(r.getLong(4) <= r.getLong(2), "bytes removed cannot exceed source bytes")
      assert(r.getDouble(5) >= 0.0 && r.getDouble(5) < 1.0)
    }
  }

  test("s18 range-search counts match a brute-force scan") {
    val rows = graft.SparkEntry.queries("s18_range_search")(spark, sf).collect()
    val vecs = graft.Tables.embeddings(spark, sf)
      .select(col("vec_id"), col("embedding")).collect()
      .map(r => (r.getLong(0), r.getSeq[Float](1).toArray))
    def cos(a: Array[Float], b: Array[Float]): Double = {
      var (d, na, nb) = (0.0, 0.0, 0.0)
      a.indices.foreach { i => d += a(i).toDouble * b(i); na += a(i).toDouble * a(i); nb += b(i).toDouble * b(i) }
      d / math.sqrt(na * nb)
    }
    rows.foreach { r =>
      val q = vecs.find(_._1 == r.getLong(0)).get._2
      val inRange = vecs.filter(v => v._1 != r.getLong(0))
        .map(v => math.rint(cos(q, v._2) * 1e4) / 1e4).filter(_ >= 0.2)
      assert(r.getLong(1) == inRange.length,
        s"probe ${r.getLong(0)}: engine ${r.getLong(1)} vs brute ${inRange.length}")
      assert(math.abs(r.getDouble(3) - inRange.max) < 1e-9, "max_sim")
    }
  }
}
