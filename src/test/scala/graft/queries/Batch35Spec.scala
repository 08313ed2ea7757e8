package graft.queries

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.SparkTestSession

/** Batch-38 laws (r139/p40/s39/t48/d35): driver replays + invariants
  * the oracle hash can't articulate (conservation, bounds, estimator
  * definitions re-derived independently in Scala).
  */
class Batch35Spec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  private val sf = "/root/testdata/sf0.001"

  private def run(name: String) = graft.SparkEntry.queries(name)(spark, sf)

  test("r139: the PH statistic replays from the daily cents series and is non-negative") {
    // independent replay: daily cents per (type, day) in plain Scala
    val rows = graft.Tables.events(spark, sf)
      .select(col("event_type"), to_date(col("ts")).as("day"),
        (col("value").cast("decimal(18,2)") * 100).cast("long").as("cents"))
      .collect().map(r => (r.getString(0), r.getDate(1).toLocalDate, r.getLong(2)))
    val d0 = rows.map(_._2).min
    val daily = rows.groupBy(t => (t._1, java.time.temporal.ChronoUnit.DAYS.between(d0, t._2)))
      .view.mapValues(_.map(_._3).sum).toMap
    val want = daily.keys.map(_._1).toSeq.distinct.sorted.map { et =>
      val series = daily.filter(_._1._1 == et).toSeq.map { case ((_, day), s) => (day, s) }.sortBy(_._1)
      val n = series.size.toLong
      val t = series.map(_._2).sum
      // the running min ranges over the WALK VALUES m_1..m_t (the
      // query's window min), not the walk's origin 0
      var m = BigInt(0); var mn: Option[BigInt] = None
      var best = BigInt(-1); var peak = -1L
      series.foreach { case (day, sc) =>
        m += BigInt(sc) * n - t - 50 * n
        mn = Some(mn.fold(m)(_.min(m)))
        val ph = m - mn.get
        if (ph > best) { best = ph; peak = day }
      }
      (et, n, BigDecimal(best) / (BigDecimal(100) * n), peak)
    }
    val got = run("r139_page_hinkley").collect()
      .map(r => (r.getString(0), r.getLong(1), BigDecimal(r.getDouble(2)), r.getLong(3)))
    assert(got.length == want.length)
    got.zip(want).foreach { case ((et, n, ph, peak), (wet, wn, wph, wpeak)) =>
      assert(et == wet && n == wn && peak == wpeak, s"$et series mismatch")
      assert((ph - wph.setScale(4, BigDecimal.RoundingMode.HALF_UP)).abs <= BigDecimal("0.0001"),
        s"$et: ph $ph vs replay $wph")
      assert(ph >= 0, s"$et: PH must be non-negative")
    }
  }

  test("p40: token conservation across the grid, monotone bins, recomputable fill rate") {
    val rows = run("p40_packing_curve").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4), r.getDouble(5)))
    assert(rows.map(_._1).toSeq == Seq(256L, 512L, 1024L, 2048L))
    // every grid point packs the same corpus
    assert(rows.map(t => (t._2, t._3)).distinct.size == 1,
      "n_docs/total_tokens must not depend on ctx_len")
    // halving the bin width can never need fewer bins
    rows.sliding(2).foreach { case Array(a, b) =>
      assert(a._4 >= b._4, s"n_bins must be non-increasing in ctx_len: $a vs $b")
    }
    rows.foreach { case (l, nd, tot, bins, straddlers, fill) =>
      assert(straddlers <= nd)
      val recomputed = BigDecimal(tot) / (BigDecimal(bins) * l)
      assert((BigDecimal(fill) - recomputed.setScale(6, BigDecimal.RoundingMode.HALF_UP))
        .abs <= BigDecimal("0.000001"), s"ctx $l fill_rate")
      assert(fill > 0 && fill <= 1.0, s"ctx $l fill_rate in (0,1]")
    }
  }

  test("s39: exactly the top-50 pairs of the full cosine ranking, replayed in Scala") {
    val counts = graft.Tables.events(spark, sf)
      .groupBy("user_id", "event_type").agg(count(lit(1)).as("c"))
      .collect().map(r => ((r.getLong(0), r.getString(1)), r.getLong(2))).toMap
    val users = counts.keys.map(_._1).toSeq.distinct.sorted
    val types = counts.keys.map(_._2).toSeq.distinct.sorted
    def vec(u: Long) = types.map(t => counts.getOrElse((u, t), 0L))
    def cos(a: Long, b: Long): Double = {
      val (va, vb) = (vec(a), vec(b))
      val num = va.zip(vb).map { case (x, y) => x * y }.sum.toDouble
      num / math.sqrt(va.map(x => x * x).sum.toDouble * vb.map(x => x * x).sum.toDouble)
    }
    val all = for (i <- users.indices; j <- i + 1 until users.size)
      yield (users(i), users(j),
        BigDecimal(cos(users(i), users(j))).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble)
    val want = all.sortBy(t => (-t._3, t._1, t._2)).take(50)
    val got = run("s39_bipartite_projection").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSeq
    assert(got.size == math.min(50, all.size))
    got.zip(want).foreach { case (g, w) =>
      assert(g._1 == w._1 && g._2 == w._2, s"pair order: $g vs $w")
      assert(math.abs(g._3 - w._3) <= 1e-6, s"cosine: $g vs $w")
    }
  }

  test("t48: unique <= types, novelty recomputes, spread bounded by the source domain") {
    val rows = run("t48_source_novelty").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getDouble(3), r.getLong(4)))
    val nSources = graft.Tables.documents(spark, sf)
      .select("source").distinct().count()
    assert(rows.length == nSources, "every source reports")
    rows.foreach { case (src, types, uniq, novelty, spread) =>
      assert(uniq <= types, s"$src unique <= types")
      assert(spread >= 1 && spread <= nSources, s"$src spread in [1, #sources]")
      val recomputed = BigDecimal(uniq) / BigDecimal(types)
      assert((BigDecimal(novelty) - recomputed.setScale(6, BigDecimal.RoundingMode.HALF_UP))
        .abs <= BigDecimal("0.000001"), s"$src novelty recompute")
    }
  }

  test("d35: the bottom-k estimator replays exactly and flags the planted dup families") {
    // independent replay of the sketch + estimator from raw shingle hashes
    val sh = DedupQueries.shingledOf(graft.Tables.documents(spark, sf))
      .select(col("doc_id"), explode(col("shingles")).as("sg"))
      .select(col("doc_id"),
        conv(substring(md5(col("sg")), 1, 15), 16, 10).cast("long").as("sk"))
      .distinct().collect().map(r => (r.getLong(0), r.getLong(1)))
    val bk: Map[Long, Seq[Long]] = sh.groupBy(_._1).view
      .mapValues(_.map(_._2).distinct.sorted.take(8).toSeq).toMap
    def est(a: Long, b: Long): Long = {
      val union = (bk(a) ++ bk(b)).distinct.sorted.take(8)
      union.count(h => bk(a).contains(h) && bk(b).contains(h)).toLong
    }
    val got = run("d35_bottomk_resemblance").collect()
      .map(r => ((r.getLong(0), r.getLong(1)), (r.getLong(2), r.getDouble(3)))).toMap
    assert(got.nonEmpty, "the planted prefix-dup families must surface")
    got.foreach { case ((d1, d2), (shared, res)) =>
      assert(d1 < d2)
      assert(shared >= 4 && shared <= 8)
      assert(est(d1, d2) == shared, s"($d1,$d2) estimator replay")
      assert(math.abs(res - shared / 8.0) < 1e-9, "dyadic division is exact")
    }
    // completeness: every pair the replayed estimator puts at >= 4 is reported
    val docs = bk.keys.toSeq.sorted
    val wantPairs = (for {
      i <- docs.indices; j <- i + 1 until docs.size
      if bk(docs(i)).intersect(bk(docs(j))).nonEmpty
      if est(docs(i), docs(j)) >= 4
    } yield (docs(i), docs(j))).toSet
    assert(got.keySet == wantPairs, "reported set == replayed candidate set at the 0.5 gate")
  }
}
