package graft.queries

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.SparkTestSession

/** Oracle-independent invariants for ExtraQueries6 (Hare apportionment,
  * runs test, Simpson diversity, candidate keys) and s20 assortativity:
  * brute-force equivalence on the tiny SF plus the conservation laws the
  * scaladocs claim (Σseats exact, runs algebra, degree symmetry).
  */
class ExtraQueries6Spec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  private val sf = "/root/testdata/sf0.001"

  test("r88 seats sum to exactly 1000 and each nation gets floor or floor+1") {
    val rows = graft.SparkEntry.queries("r88_apportionment")(spark, sf).collect()
    assert(rows.nonEmpty)
    assert(rows.map(_.getLong(4)).sum == 1000L, "largest-remainder must allocate the full budget")
    rows.foreach { r =>
      val bump = r.getLong(4) - r.getLong(3)
      assert(bump == 0L || bump == 1L, s"nation ${r.get(0)}: seats must be floor or floor+1")
    }
    // quota property: every seat count is within 1 of the exact share
    val t = rows.map(_.getLong(2)).sum
    rows.foreach { r =>
      val exact = 1000.0 * r.getLong(2) / t
      assert(math.abs(r.getLong(4) - exact) < 1.0, s"nation ${r.get(0)}: off-quota seat count")
    }
  }

  test("r89 runs statistics match a brute-force scan of the daily series") {
    val rows = graft.SparkEntry.queries("r89_runs_test")(spark, sf).collect()
    assert(rows.nonEmpty)
    val daily = graft.Tables.orders(spark, sf)
      .groupBy(col("o_orderpriority").as("grp"), col("o_orderdate").as("day"))
      .agg(sum(col("o_totalprice").cast(org.apache.spark.sql.types.DecimalType(24, 2))).as("rev"))
      .collect()
      .map(r => (r.getString(0), r.get(1).toString, BigDecimal(r.getDecimal(2))))
    rows.foreach { r =>
      val series = daily.filter(_._1 == r.getString(0)).sortBy(_._2).map(_._3)
      val signs = series.sliding(2).collect {
        case Array(a, b) if a != b => if (b > a) 1 else -1
      }.toArray
      val runsBrute = if (signs.isEmpty) 0
        else 1 + signs.sliding(2).count { case Array(a, b) => a != b; case _ => false }
      assert(r.getLong(1) == runsBrute, s"${r.getString(0)}: runs")
      assert(r.getLong(2) == signs.count(_ == 1), s"${r.getString(0)}: n1")
      assert(r.getLong(3) == signs.count(_ == -1), s"${r.getString(0)}: n2")
      assert(r.getLong(4) == signs.length, s"${r.getString(0)}: n")
      val (rr, n1, n2, n) = (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))
      val zBrute = (rr * n - n - 2.0 * n1 * n2) /
        math.sqrt(2.0 * n1 * n2 * (2.0 * n1 * n2 - n) / (n - 1.0))
      assert(math.abs(r.getDouble(5) - zBrute) < 1e-6, s"${r.getString(0)}: z")
    }
  }

  test("t28 diversity reproduces from brute-force token counts") {
    val rows = graft.SparkEntry.queries("t28_simpson_diversity")(spark, sf).collect()
    assert(rows.nonEmpty)
    val docs = graft.Tables.documents(spark, sf)
      .select(col("lang"), col("text")).collect()
      .map(r => (r.getString(0), r.getString(1)))
    rows.foreach { r =>
      val counts = docs.filter(_._1 == r.getString(0))
        .flatMap(_._2.split(" ", -1)).groupBy(identity).map(_._2.length.toLong)
      val n = counts.sum
      assert(r.getLong(1) == n, s"${r.getString(0)}: N")
      assert(r.getLong(2) == counts.size.toLong, s"${r.getString(0)}: V")
      val simpson = 1.0 - counts.map(c => c.toDouble * (c - 1)).sum / (n.toDouble * (n - 1))
      assert(math.abs(r.getDouble(3) - simpson) < 1e-6, s"${r.getString(0)}: simpson")
      assert(r.getDouble(3) >= 0.0 && r.getDouble(3) <= 1.0)
      assert(math.abs(r.getDouble(4) - counts.size.toDouble / n) < 1e-6, s"${r.getString(0)}: ttr")
    }
  }

  test("u18 distinct counts match direct recomputation and o_orderkey is a key") {
    val rows = graft.SparkEntry.queries("u18_candidate_keys")(spark, sf).collect()
      .map(r => r.getString(0) -> r).toMap
    assert(rows.size == 5)
    val o = graft.Tables.orders(spark, sf)
      .select("o_orderkey", "o_custkey", "o_orderdate", "o_totalprice").collect()
    val n = o.length.toLong
    assert(rows("o_orderkey").getBoolean(3), "o_orderkey must be a key")
    assert(rows("o_orderkey").getLong(1) == o.map(_.get(0)).distinct.length.toLong)
    assert(rows("o_custkey").getLong(1) == o.map(_.get(1)).distinct.length.toLong)
    assert(rows("o_custkey+o_orderdate").getLong(1) ==
      o.map(r => (r.get(1), r.get(2))).distinct.length.toLong)
    rows.values.foreach { r =>
      assert(r.getLong(2) == n)
      assert(r.getBoolean(3) == (r.getLong(1) == n))
    }
  }

  test("r90 seasonal indices reproduce from a brute-force decomposition") {
    val rows = graft.SparkEntry.queries("r90_seasonal_decompose")(spark, sf).collect()
    assert(rows.nonEmpty)
    val daily = graft.Tables.orders(spark, sf)
      .groupBy(col("o_orderpriority").as("grp"), col("o_orderdate").as("day"))
      .agg(sum(col("o_totalprice").cast(org.apache.spark.sql.types.DecimalType(24, 2))).as("rev"),
        (dayofweek(col("day")) - 1).cast(org.apache.spark.sql.types.LongType).as("dow"))
      .collect()
      .map(r => (r.getString(0), r.get(1).toString, BigDecimal(r.getDecimal(2)), r.getLong(3)))
    val byGrp = daily.groupBy(_._1).map { case (g, xs) => g -> xs.sortBy(_._2) }
    rows.foreach { r =>
      val series = byGrp(r.getString(0))
      val cells = series.indices.filter(i => i >= 3 && i + 3 < series.length)
        .map(i => (series(i)._4, 7 * series(i)._3 - (i - 3 to i + 3).map(j => series(j)._3).sum))
        .filter(_._1 == r.getLong(1))
      assert(r.getLong(2) == cells.length.toLong, s"${r.getString(0)}/${r.getLong(1)}: n_days")
      val brute = (cells.map(_._2).sum / (7.0 * cells.length)).toDouble
      assert(math.abs(r.getDouble(3) - brute) < 5e-4, s"${r.getString(0)}/${r.getLong(1)}: seasonal")
    }
  }

  test("u19 containment is 1.0 on every declared FK edge and counts reproduce") {
    val rows = graft.SparkEntry.queries("u19_fk_containment")(spark, sf).collect()
    assert(rows.length == 4)
    rows.foreach { r =>
      // the fixture's FK edges are all valid: every child key must appear
      assert(r.getDouble(4) == 1.0, s"${r.getString(0)}: containment")
      assert(r.getLong(3) == r.getLong(1), s"${r.getString(0)}: contained = child_d")
      assert(r.getLong(3) <= r.getLong(2), s"${r.getString(0)}: contained <= parent_d")
      assert(r.getDouble(5) > 0.0 && r.getDouble(5) <= 1.0, s"${r.getString(0)}: coverage")
    }
    val o = graft.Tables.orders(spark, sf)
    val custD = o.select("o_custkey").distinct().count()
    val edge = rows.find(_.getString(0).startsWith("orders.o_custkey")).get
    assert(edge.getLong(1) == custD)
  }

  test("t29 keywords: ids are splittable, ranks dense per lang, scores positive") {
    val rows = graft.SparkEntry.queries("t29_textrank_keywords")(spark, sf).collect()
    assert(rows.nonEmpty)
    // the lang|token id scheme requires '|'-free tokens in the fixture
    val bad = graft.Tables.documents(spark, sf)
      .select(explode(split(col("text"), " ")).as("t"))
      .filter(col("t").contains("|")).count()
    assert(bad == 0, "fixture tokens must not contain the id separator")
    rows.groupBy(_.getString(0)).foreach { case (lang, rs) =>
      assert(rs.map(_.getLong(1)).sorted.toSeq == (1L to rs.length).toSeq, s"$lang: dense ranks")
      assert(rs.length <= 10)
      // fixed-point ranks are positive and ordered with the rank
      val sorted = rs.sortBy(_.getLong(1))
      assert(sorted.forall(_.getLong(3) > 0), s"$lang: positive scores")
      assert(sorted.sliding(2).forall {
        case Array(a, b) => a.getLong(3) >= b.getLong(3); case _ => true
      }, s"$lang: scores non-increasing in rank")
    }
  }

  test("r95 growth accounting balances and matches a brute-force user timeline") {
    val rows = graft.SparkEntry.queries("r95_growth_accounting")(spark, sf).collect()
    assert(rows.nonEmpty)
    val act = graft.Tables.events(spark, sf)
      .select(col("user_id"), to_date(col("ts")).as("day")).distinct()
      .collect().map(r => (r.getLong(0), r.getDate(1).toLocalDate))
    val byUser = act.groupBy(_._1).map { case (u, xs) => u -> xs.map(_._2).sorted.toVector }
    val activeByDay = act.groupBy(_._2).map { case (d, xs) => d -> xs.length.toLong }
    rows.foreach { r =>
      val day = r.getDate(0).toLocalDate
      var nNew = 0L; var nRet = 0L; var nRes = 0L
      byUser.values.foreach { days =>
        val i = days.indexOf(day)
        if (i >= 0) {
          if (i == 0) nNew += 1
          else if (days(i - 1) == day.minusDays(1)) nRet += 1
          else nRes += 1
        }
      }
      assert(r.getLong(1) == nNew, s"$day: new")
      assert(r.getLong(2) == nRet, s"$day: retained")
      assert(r.getLong(3) == nRes, s"$day: resurrected")
      assert(r.getLong(4) == nNew + nRet + nRes, s"$day: active identity")
      val churnBrute = activeByDay.getOrElse(day.minusDays(1), 0L) - nRet
      assert(r.getLong(5) == churnBrute, s"$day: churn identity")
    }
    // totals: every first activity is counted new exactly once
    assert(rows.map(_.getLong(1)).sum == byUser.size.toLong, "Σnew = distinct users")
  }

  test("r93 Lindley closed form equals the procedural clamp on every supplier") {
    val rows = graft.SparkEntry.queries("r93_clamped_balance")(spark, sf).collect()
    assert(rows.nonEmpty)
    val daily = graft.Tables.lineitem(spark, sf)
      .groupBy(col("l_suppkey").as("supp"), col("l_shipdate").as("day"))
      .agg(sum(when(col("l_returnflag") === "R", col("l_quantity").cast(org.apache.spark.sql.types.LongType))
        .otherwise(-col("l_quantity").cast(org.apache.spark.sql.types.LongType))).as("net"))
      .collect().map(r => (r.getLong(0), r.get(1).toString, r.getLong(2)))
    rows.foreach { r =>
      val series = daily.filter(_._1 == r.getLong(0)).sortBy(_._2).map(_._3)
      var bal = 0L; var peak = 0L; var stockouts = 0L
      series.foreach { net =>
        bal = math.max(0L, bal + net)
        peak = math.max(peak, bal)
        if (bal == 0L) stockouts += 1
      }
      assert(r.getLong(1) == series.length.toLong, s"supp ${r.getLong(0)}: n_days")
      assert(r.getLong(2) == bal, s"supp ${r.getLong(0)}: final")
      assert(r.getLong(3) == peak, s"supp ${r.getLong(0)}: peak")
      assert(r.getLong(4) == stockouts, s"supp ${r.getLong(0)}: stockouts")
    }
  }

  test("r94 proration conserves every cent and emits exactly 3 slices per order") {
    val rows = graft.SparkEntry.queries("r94_revenue_proration")(spark, sf).collect()
    assert(rows.nonEmpty)
    val o = graft.Tables.orders(spark, sf)
      .agg(sum((col("o_totalprice").cast(org.apache.spark.sql.types.DecimalType(12, 2)) * 100)
        .cast(org.apache.spark.sql.types.LongType)).as("cents"),
        count(lit(1)).as("n")).collect().head
    assert(rows.map(_.getLong(1)).sum == o.getLong(0),
      "recognized revenue must conserve order totals to the cent")
    assert(rows.map(_.getLong(2)).sum == 3L * o.getLong(1), "3 slices per order")
  }

  test("r91 Theil reproduces from a brute-force recompute and is non-negative") {
    val rows = graft.SparkEntry.queries("r91_theil_index")(spark, sf).collect()
    assert(rows.nonEmpty)
    val base = graft.Tables.orders(spark, sf)
      .join(graft.Tables.customer(spark, sf),
        col("o_custkey") === col("c_custkey"))
      .join(graft.Tables.nation(spark, sf), col("c_nationkey") === col("n_nationkey"))
      .groupBy(col("n_regionkey").as("region"), col("o_custkey"))
      .agg((sum(col("o_totalprice").cast(org.apache.spark.sql.types.DecimalType(24, 2))) * 100)
        .cast(org.apache.spark.sql.types.LongType).as("xc"))
      .collect().map(r => (r.getInt(0), r.getLong(2)))
    rows.foreach { r =>
      val xs = base.filter(_._1 == r.getInt(0)).map(_._2.toDouble)
      val t = xs.sum
      val brute = xs.map(x => x * math.log(x)).sum / t - math.log(t / xs.length)
      assert(math.abs(r.getDouble(3) - brute) < 1e-4, s"region ${r.getInt(0)}: theil")
      assert(r.getDouble(3) >= 0.0, "Theil T is non-negative for positive inputs")
      assert(r.getLong(1) == xs.length.toLong)
    }
  }

  test("r92 Spearman matches a brute-force average-rank Pearson") {
    val rows = graft.SparkEntry.queries("r92_spearman")(spark, sf).collect()
    assert(rows.nonEmpty)
    val base = graft.Tables.orders(spark, sf)
      .join(graft.Tables.customer(spark, sf), col("o_custkey") === col("c_custkey"))
      .join(graft.Tables.nation(spark, sf), col("c_nationkey") === col("n_nationkey"))
      .groupBy(col("n_regionkey").as("region"), col("o_custkey"))
      .agg(count(lit(1)).as("x"),
        (sum(col("o_totalprice").cast(org.apache.spark.sql.types.DecimalType(24, 2))) * 100)
          .cast(org.apache.spark.sql.types.LongType).as("y"))
      .collect().map(r => (r.getInt(0), r.getLong(2), r.getLong(3)))
    def avgRanks(vs: Array[Long]): Map[Long, Double] =
      vs.groupBy(identity).map { case (v, g) =>
        v -> (vs.count(_ < v) + (g.length + 1) / 2.0)
      }
    rows.foreach { r =>
      val grp = base.filter(_._1 == r.getInt(0))
      val rx = avgRanks(grp.map(_._2)); val ry = avgRanks(grp.map(_._3))
      val ps = grp.map(g => (rx(g._2), ry(g._3)))
      val n = ps.length.toDouble
      val (sx, sy) = (ps.map(_._1).sum, ps.map(_._2).sum)
      val sxx = ps.map(p => p._1 * p._1).sum
      val syy = ps.map(p => p._2 * p._2).sum
      val sxy = ps.map(p => p._1 * p._2).sum
      val brute = (n * sxy - sx * sy) / math.sqrt((n * sxx - sx * sx) * (n * syy - sy * sy))
      assert(math.abs(r.getDouble(2) - brute) < 1e-6, s"region ${r.getInt(0)}: rho")
      assert(r.getDouble(2) >= -1.0 && r.getDouble(2) <= 1.0)
    }
  }

  test("m13 drift is a symmetric-complete pair table with L1 in [0,2], brute-checked") {
    val rows = graft.SparkEntry.queries("m13_histogram_drift")(spark, sf).collect()
    val origins = graft.Tables.documents(spark, sf)
      .select("source").distinct().collect().map(_.getString(0)).sorted
    assert(rows.length == origins.length * (origins.length - 1) / 2, "all unordered pairs present")
    rows.foreach(r => assert(r.getDouble(2) >= 0.0 && r.getDouble(2) <= 2.0))
    // brute-force one pair from raw text bytes
    val (oa, ob) = (origins(0), origins(1))
    val hist = graft.Tables.documents(spark, sf)
      .filter(col("source").isin(oa, ob)).select("source", "text").collect()
      .groupBy(_.getString(0))
      .map { case (src, ds) =>
        val cnts = new Array[Long](16)
        ds.foreach(_.getString(1).foreach(ch => cnts(ch.toInt / 16) += 1))
        src -> cnts
      }
    val (ca, cb) = (hist(oa), hist(ob))
    val (ta, tb) = (ca.sum.toDouble, cb.sum.toDouble)
    val brute = (0 until 16).map(b => math.abs(ca(b) / ta - cb(b) / tb)).sum
    val got = rows.find(r => r.getString(0) == oa && r.getString(1) == ob).get.getDouble(2)
    assert(math.abs(got - brute) < 1e-5, s"$oa vs $ob: L1")
  }

  test("d19 sweep: counts consistent, truth matches d03, coarser banding never beats (32,2) recall") {
    val rows = graft.SparkEntry.queries("d19_lsh_sweep")(spark, sf).collect()
    assert(rows.length == 3)
    val truth = graft.SparkEntry.queries("d03_ngram_jaccard")(spark, sf).count()
    rows.foreach { r =>
      assert(r.getLong(4) == truth, "n_truth must equal the registered d03 pair count")
      assert(r.getLong(3) <= r.getLong(2), "tp <= candidates")
      assert(r.getLong(3) <= r.getLong(4), "tp <= truth")
    }
    val byCfg = rows.map(r => (r.getLong(0), r.getLong(1)) -> r).toMap
    assert(byCfg.keySet == Set((32L, 2L), (16L, 4L), (8L, 8L)))
    // banding theory: fewer rows per band can only ADD candidates, so the
    // shipped (32,2) recall dominates the stricter configs
    assert(byCfg((32L, 2L)).getDouble(6) >= byCfg((16L, 4L)).getDouble(6))
    assert(byCfg((32L, 2L)).getDouble(6) >= byCfg((8L, 8L)).getDouble(6))
  }

  test("p23 allocations respect eligibility, budget conservation and brute-force quality means") {
    val rows = graft.SparkEntry.queries("p23_quality_waterfill")(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getLong(2) <= r.getLong(1), "eligible <= total docs")
      assert(r.getLong(5) <= r.getLong(3), "alloc <= eligible tokens")
      if (!r.isNullAt(7)) assert(r.getDouble(7) >= 0.18, "mean quality of gated docs >= threshold")
    }
    val totalEligible = rows.map(_.getLong(3)).sum
    val budget = totalEligible * 19 / 20
    val alloc = rows.map(_.getLong(5)).sum
    assert(alloc <= budget, "total allocation within budget")
    assert(alloc >= budget - rows.length, "floor loss bounded by one token per source")
    // brute-force the gate per source
    val brute = graft.Tables.documents(spark, sf)
      .select(col("source"), col("n_chars"), graft.queries.TextQueries.qualityScore.as("q"))
      .collect()
      .groupBy(_.getString(0))
      .map { case (src, xs) =>
        src -> (xs.length.toLong, xs.count(_.getDouble(2) >= 0.18).toLong,
          xs.filter(_.getDouble(2) >= 0.18).map(_.getLong(1)).sum)
      }
    rows.foreach { r =>
      val (nTot, nElig, tok) = brute(r.getString(0))
      assert(r.getLong(1) == nTot && r.getLong(2) == nElig && r.getLong(3) == tok,
        s"${r.getString(0)}: gate counts")
    }
  }

  test("s20 assortativity matches a brute-force Pearson over the same graph") {
    val row = graft.SparkEntry.queries("s20_assortativity")(spark, sf).collect().head
    val edges = graft.SparkEntry.queries("s10_knn_graph")(spark, sf)
      .select(least(col("a_id"), col("b_id")), greatest(col("a_id"), col("b_id")))
      .distinct().collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(row.getLong(0) == edges.length.toLong, "edge count")
    val deg = edges.flatMap(e => Seq(e._1, e._2)).groupBy(identity).map { case (k, v) => k -> v.length }
    val xs = edges.flatMap(e => Seq((deg(e._1), deg(e._2)), (deg(e._2), deg(e._1))))
    val m = xs.length.toDouble
    val sx = xs.map(_._1.toDouble).sum
    val sxx = xs.map(p => p._1.toDouble * p._1).sum
    val sxy = xs.map(p => p._1.toDouble * p._2).sum
    val brute = (m * sxy - sx * sx) / (m * sxx - sx * sx)
    assert(math.abs(row.getDouble(1) - brute) < 1e-6, s"engine ${row.getDouble(1)} vs brute $brute")
    assert(row.getDouble(1) >= -1.0 && row.getDouble(1) <= 1.0)
  }
}
