package graft.queries

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.SparkTestSession

/** Oracle-independent invariants for the batch-9 queries: the IVM
  * correctness identity proven inside Spark (delta algebra vs direct
  * recompute-minus-old), driver-side brute-force replays of the
  * Mann–Whitney and Kendall statistics, zone-map soundness/efficiency
  * laws, and a driver BFS replay of the harmonic centralities.
  */
class ExtraQueries9Spec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  private val sf = "/root/testdata/sf0.001"

  test("r100: delta algebra equals direct full-minus-old recompute") {
    import org.apache.spark.sql.types.DecimalType
    val got = graft.SparkEntry.queries("r100_join_ivm")(spark, sf)
    val o = graft.Tables.orders(spark, sf)
      .select(col("o_orderkey"), col("o_orderpriority"), col("o_orderdate"))
    val l = graft.Tables.lineitem(spark, sf).filter(col("l_quantity") > 10)
      .select(col("l_orderkey"), col("l_shipdate"), col("l_extendedprice"))
    def agg(oo: org.apache.spark.sql.DataFrame, ll: org.apache.spark.sql.DataFrame) =
      oo.join(ll, col("o_orderkey") === col("l_orderkey"))
        .groupBy(col("o_orderpriority"),
          to_date(date_trunc("month", col("l_shipdate"))).as("ship_month"))
        .agg(count(lit(1)).as("c"),
          sum(col("l_extendedprice").cast(DecimalType(12, 2))).cast(DecimalType(38, 2)).as("r"))
    val oc = lit(ExtraQueries9.IvmOrderCutoff).cast("timestamp")
    val sc = lit(ExtraQueries9.IvmShipCutoff).cast("timestamp")
    val full = agg(o, l).select(col("o_orderpriority"), col("ship_month"),
      col("c").as("fc"), col("r").as("fr"))
    val old = agg(o.filter(col("o_orderdate") < oc), l.filter(col("l_shipdate") < sc))
      .select(col("o_orderpriority").as("op"), col("ship_month").as("sm"),
        col("c").as("oc_"), col("r").as("or_"))
    val direct = full.join(old,
        col("o_orderpriority") === col("op") && col("ship_month") === col("sm"), "left")
      .select(col("o_orderpriority"), col("ship_month"),
        (col("fc") - coalesce(col("oc_"), lit(0L))).as("d_cnt"),
        (col("fr") - coalesce(col("or_"), lit(0).cast(DecimalType(38, 2))))
          .cast(DecimalType(38, 2)).as("d_rev"))
      .filter(col("d_cnt") > 0)
    assert(got.count() > 0, "delta batch must be non-empty at sf0.001")
    assert(direct.exceptAll(got).isEmpty && got.exceptAll(direct).isEmpty,
      "IVM delta algebra must equal the direct full-minus-old recompute")
  }

  test("r101: Mann-Whitney U matches a driver-side brute-force replay") {
    val vals = graft.Tables.orders(spark, sf)
      .select(col("o_orderpriority"),
        (col("o_totalprice").cast(org.apache.spark.sql.types.DecimalType(12, 2)) * 100)
          .cast("long").as("cents"))
      .collect().map(r => (r.getString(0), r.getLong(1)))
    val byPri = vals.groupBy(_._1).map { case (k, v) => k -> v.map(_._2) }
    val got = graft.SparkEntry.queries("r101_mannwhitney")(spark, sf).collect()
      .map(r => (r.getString(0), r.getString(1)) ->
        (r.getLong(2), r.getLong(3), r.getLong(4))).toMap
    val pris = byPri.keys.toSeq.sorted
    val expectPairs = for (a <- pris; b <- pris if a < b) yield (a, b)
    assert(got.keySet == expectPairs.toSet)
    expectPairs.foreach { case (a, b) =>
      val (xs, ys) = (byPri(a), byPri(b))
      // brute force 2*U1 = sum over (x, y) of 2*[x>y] + 1*[x==y]
      var u2 = 0L
      xs.foreach(x => ys.foreach(y => u2 += (if (x > y) 2L else if (x == y) 1L else 0L)))
      val (n1, n2, u1x2) = got((a, b))
      assert(n1 == xs.length.toLong && n2 == ys.length.toLong, s"($a,$b) sizes")
      assert(u1x2 == u2, s"($a,$b): u1_x2 $u1x2 vs brute-force $u2")
      assert(u1x2 >= 0 && u1x2 <= 2L * n1 * n2, s"($a,$b): U range law")
    }
  }

  test("r102: Kendall counts match a driver-side brute-force replay") {
    val daily = graft.Tables.orders(spark, sf)
      .join(graft.Tables.customer(spark, sf), col("o_custkey") === col("c_custkey"))
      .join(graft.Tables.nation(spark, sf), col("c_nationkey") === col("n_nationkey"))
      .join(graft.Tables.region(spark, sf), col("n_regionkey") === col("r_regionkey"))
      .groupBy(col("r_name"), to_date(col("o_orderdate")).as("day"))
      .agg(sum(col("o_totalprice").cast(org.apache.spark.sql.types.DecimalType(12, 2)) * 100)
          .cast("long").as("x"), count(lit(1)).as("y"))
      .collect().map(r => (r.getString(0), r.getDate(1).toLocalDate, r.getLong(2), r.getLong(3)))
    val got = graft.SparkEntry.queries("r102_kendall_tau")(spark, sf).collect()
      .map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5), r.getLong(6)))
      .toMap
    daily.groupBy(_._1).foreach { case (region, rows) =>
      val series = rows.sortBy(_._2.toEpochDay).map(t => (t._3, t._4))
      var (nc, nd, tx, ty, n0) = (0L, 0L, 0L, 0L, 0L)
      for (i <- series.indices; j <- (i + 1) until series.length) {
        val dx = series(j)._1 - series(i)._1
        val dy = series(j)._2 - series(i)._2
        n0 += 1
        if (dx == 0) tx += 1
        if (dy == 0) ty += 1
        if (dx != 0 && dy != 0) { if ((dx > 0) == (dy > 0)) nc += 1 else nd += 1 }
      }
      val (gDays, gN0, gNc, gNd, gTx, gTy) = got(region)
      assert(gDays == series.length.toLong, s"$region days")
      assert((gN0, gNc, gNd, gTx, gTy) == ((n0, nc, nd, tx, ty)),
        s"$region: pair counts vs replay")
    }
  }

  test("u21: zone-map soundness and the layout lesson hold") {
    val rows = graft.SparkEntry.queries("u21_zonemap_pruning")(spark, sf).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5)))
    assert(rows.nonEmpty)
    rows.foreach { case (layout, mid, nFiles, scanned, rowsScanned, rowsMatched) =>
      assert(scanned <= nFiles, s"$layout/$mid: files_scanned <= n_files")
      // soundness: a zone-map scanner never skips a file containing matches
      assert(rowsMatched <= rowsScanned, s"$layout/$mid: matched rows must be scanned")
      if (layout == "timeclust")
        // month-partitioned files prune perfectly: scan exactly the matches
        assert(rowsScanned == rowsMatched, s"timeclust/$mid: perfect pruning")
    }
    val byMonth = rows.groupBy(_._2)
    byMonth.foreach { case (mid, rs) =>
      val key = rs.find(_._1 == "keyclust").get
      val time = rs.find(_._1 == "timeclust").get
      assert(key._5 >= time._5, s"$mid: keyclust must scan at least as many rows")
    }
    // the audit is non-vacuous: keyclust scans strictly more somewhere
    assert(rows.filter(_._1 == "keyclust").map(_._5).sum >
      rows.filter(_._1 == "timeclust").map(_._5).sum,
      "layout contrast must show keyclust scanning more than timeclust")
  }

  test("s27: harmonic centralities match a driver-side BFS replay") {
    val knn = graft.SparkEntry.queries("s10_knn_graph")(spark, sf)
      .select("a_id", "b_id").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val mutual = knn.filter { case (a, b) => a < b && knn.contains((b, a)) }
    val adj = (mutual.toSeq ++ mutual.toSeq.map(e => (e._2, e._1)))
      .groupBy(_._1).map { case (k, v) => k -> v.map(_._2).toSet }
    val radius = SimilarityQueries.HarmonicRadius
    val expect = adj.keys.map { src =>
      var dist = Map(src -> 0)
      var frontier = Set(src)
      (1 to radius).foreach { r =>
        val next = frontier.flatMap(adj(_)).filterNot(dist.contains)
        dist ++= next.map(_ -> r)
        frontier = next
      }
      val n = (1 to 3).map(k => dist.count(_._2 == k).toLong)
      src -> (n(0), n(1), n(2), 6 * n(0) + 3 * n(1) + 2 * n(2))
    }.toMap
    val got = graft.SparkEntry.queries("s27_harmonic_centrality")(spark, sf).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
      .toMap
    assert(got.keySet == expect.keySet, "node sets differ")
    expect.foreach { case (src, e) =>
      assert(got(src) == e, s"node $src: ${got(src)} vs replay $e")
    }
  }
}
