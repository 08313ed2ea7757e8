package graft.queries

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.SparkTestSession

/** Oracle-independent invariants for the round-7 behavioral/OLAP sweep
  * (ExtraQueries4). The DuckDB hash compare is the primary gate; these
  * pin the properties a hash can't express — conservation laws,
  * brute-force equivalence on the tiny SF, and bound checks.
  */
class ExtraQueries4Spec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  private val sf = "/root/testdata/sf0.001"

  test("r70 sessions conserve events and split exactly at >30min gaps") {
    val rows = graft.SparkEntry.queries("r70_sessionize")(spark, sf).collect()
    val nEvents = graft.Tables.events(spark, sf).count()
    assert(rows.map(_.getLong(2)).sum == nEvents, "per-user event totals must conserve the fixture")
    // brute-force the session count for the heaviest user
    val heavy = rows.maxBy(_.getLong(2))
    val uid = heavy.getLong(0)
    val ts = graft.Tables.events(spark, sf).filter(col("user_id") === uid)
      .select(unix_micros(col("ts"))).collect().map(_.getLong(0)).sorted
    val brute = 1 + ts.sliding(2).count(p => p.length == 2 && p(1) - p(0) > 1800L * 1000000L)
    assert(heavy.getLong(1) == brute, s"user $uid: engine ${heavy.getLong(1)} vs brute $brute sessions")
  }

  test("r71 z-score reproduces from its own published counts") {
    val r = graft.SparkEntry.queries("r71_ab_ztest")(spark, sf).collect().head
    val (n0, c0, n1, c1) = (r.getLong(0).toDouble, r.getLong(1).toDouble,
      r.getLong(2).toDouble, r.getLong(3).toDouble)
    val pp = (c0 + c1) / (n0 + n1)
    val z = (c1 / n1 - c0 / n0) / math.sqrt(pp * (1 - pp) * (1 / n0 + 1 / n1))
    assert(math.abs(r.getDouble(6) - z) < 1e-3, s"z ${r.getDouble(6)} vs recomputed $z")
    assert(r.getBoolean(7) == (math.abs(z) > 1.96))
  }

  test("r76 peak concurrency matches a brute-force interval sweep") {
    val rows = graft.SparkEntry.queries("r76_peak_concurrency")(spark, sf).collect()
    val evs = graft.Tables.events(spark, sf)
      .select(col("event_type"), unix_micros(col("ts"))).collect()
      .map(r => (r.getString(0), r.getLong(1)))
    rows.foreach { r =>
      val starts = evs.filter(_._1 == r.getString(0)).map(_._2).sorted
      // concurrency(t) = active 5-minute intervals; peak via sweep
      val ends = starts.map(_ + 300L * 1000000L).sorted
      var (i, j, cur, peak) = (0, 0, 0L, 0L)
      while (i < starts.length) {
        // ends win ties (the engine sorts delta=-1 before +1 at equal t),
        // so back-to-back intervals never double-count
        if (ends(j) <= starts(i)) { cur -= 1; j += 1 }
        else { cur += 1; i += 1; peak = math.max(peak, cur) }
      }
      assert(r.getLong(1) == peak, s"${r.getString(0)}: engine ${r.getLong(1)} vs brute $peak")
    }
  }

  test("r77 MAD outlier counts match a brute-force recompute") {
    val rows = graft.SparkEntry.queries("r77_mad_outliers")(spark, sf).collect()
    val vals = graft.Tables.events(spark, sf)
      .select(col("event_type"), col("value")).collect()
      .map(r => (r.getString(0), r.getDouble(1)))
    def median(xs: Array[Double]): Double = {
      val s = xs.sorted
      if (s.length % 2 == 1) s(s.length / 2) else (s(s.length / 2 - 1) + s(s.length / 2)) / 2
    }
    rows.foreach { r =>
      val xs = vals.filter(_._1 == r.getString(0)).map(_._2)
      val med = median(xs)
      val mad = median(xs.map(x => math.abs(x - med)))
      val n = xs.count(x => math.abs(x - med) > 3.0 * 1.4826 * mad)
      assert(r.getLong(4) == n, s"${r.getString(0)}: engine ${r.getLong(4)} vs brute $n outliers")
    }
  }

  test("r79 second-order transition probabilities sum to 1 per kept context") {
    val rows = graft.SparkEntry.queries("r79_markov2_contexts")(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.groupBy(r => (r.getString(0), r.getString(1))).foreach { case (ctx, rs) =>
      val pSum = rs.map(_.getDouble(5)).sum
      // each context lists only its top-3 next states; the partial mass
      // must be a valid sub-distribution and ranks must be 1..k unique
      assert(pSum <= 1.0 + 1e-9, s"$ctx: ΣP = $pSum > 1")
      assert(rs.map(_.getLong(2)).sorted.toSeq == (1L to rs.length).toSeq, s"$ctx: ranks not dense")
    }
  }

  test("s16 margins are consistent with their published distances") {
    val rows = graft.SparkEntry.queries("s16_centroid_margin")(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (own, other, margin) = (r.getDouble(3), r.getDouble(4), r.getDouble(5))
      // own/other/margin are each independently 6dp-rounded from exact
      // values, so the recomputed difference can drift up to 1.5e-6
      assert(math.abs(margin - (other - own)) < 2e-6)
      assert(r.getBoolean(6) == (margin < 0), "misfit flag must equal margin<0")
    }
  }

  test("t23 novelty fractions are consistent ratios in [0,1]") {
    val rows = graft.SparkEntry.queries("t23_ngram_novelty")(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getLong(2) >= 0 && r.getLong(2) <= r.getLong(1))
      val frac = if (r.getLong(1) == 0) 0.0 else r.getLong(2).toDouble / r.getLong(1)
      assert(math.abs(r.getDouble(3) - frac) < 1e-4)
    }
  }

  test("m11 entropies stay within [0, ln 256] and byte totals conserve") {
    val rows = graft.SparkEntry.queries("m11_payload_entropy")(spark, sf).collect()
    assert(rows.nonEmpty)
    val maxEntropy = math.log(256.0)
    rows.foreach { r =>
      assert(r.getDouble(3) >= 0.0 && r.getDouble(3) <= maxEntropy + 1e-9,
        s"${r.getString(0)}: entropy ${r.getDouble(3)} outside [0, ln 256]")
    }
    val total = graft.Tables.documents(spark, sf).agg(sum(col("n_chars"))).collect().head.getLong(0)
    assert(rows.map(_.getLong(2)).sum == total, "per-mime byte totals must conserve the corpus")
  }

  test("r73 Gini coefficients stay in [0,1) and customer counts conserve") {
    val rows = graft.SparkEntry.queries("r73_gini_concentration")(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getDouble(3) >= 0.0 && r.getDouble(3) < 1.0, s"${r.getString(0)}: gini ${r.getDouble(3)}")
    }
    val nCust = graft.Tables.orders(spark, sf).select("o_custkey").distinct().count()
    assert(rows.map(_.getLong(1)).sum == nCust, "per-nation customer counts must conserve buyers")
  }
}
