package graft.queries

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.SparkTestSession

/** Bounds for the rows-only coverage queries. */
class CoverageSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  private val sf = "/root/testdata/sf0.001"

  test("approx_count_distinct within 10% of q11's exact distinct counts") {
    val approx = graft.SparkEntry.queries("r28_approx_distinct")(spark, sf).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap
    // parts side: the oracled q11 query IS the exact ground truth
    val exactParts = graft.SparkEntry.queries("q11_distinct_agg")(spark, sf).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val exactOrders = graft.Tables.lineitem(spark, sf)
      .groupBy(col("l_returnflag")).agg(countDistinct(col("l_orderkey")).as("o"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    exactParts.foreach { case (k, p) =>
      val (ap, ao) = approx(k)
      val o = exactOrders(k)
      assert(math.abs(ap - p).toDouble / p < 0.10, s"$k parts: $ap vs $p")
      assert(math.abs(ao - o).toDouble / o < 0.10, s"$k orders: $ao vs $o")
    }
  }

  test("approx_percentile brackets the exact rank-error bound vs r26") {
    // accuracy=10000 guarantees rank error <= n/10000; at fixture size
    // that means the approx value must lie between the exact values at
    // ranks floor(q*n) +- ceil(n/10000) + 1 — check via exact percentile
    // of the same column at slightly perturbed quantiles
    val li = graft.Tables.lineitem(spark, sf)
    val approx = graft.SparkEntry.queries("r47_approx_percentiles")(spark, sf).collect()
      .map(r => r.getString(0) -> (r.getDouble(1), r.getDouble(2), r.getDouble(3))).toMap
    // the accuracy guarantee is PER GROUP: rank error <= ceil(n_g/10000),
    // plus 1 rank of slack because exact percentile() interpolates
    // between adjacent values while the sketch returns a data value
    val counts = li.groupBy(col("l_returnflag")).count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    for ((q, pick, colName) <- Seq(
        (0.5, (t: (Double, Double, Double)) => t._1, "l_quantity"),
        (0.9, (t: (Double, Double, Double)) => t._2, "l_quantity"),
        (0.99, (t: (Double, Double, Double)) => t._3, "l_extendedprice"))) {
      approx.foreach { case (k, t) =>
        val nG = counts(k).toDouble
        val eps = (math.ceil(nG / 10000.0) + 1.0) / nG
        val Array(lo, hi) = li.filter(col("l_returnflag") === k)
          .agg(percentile(col(colName), lit(math.max(0.0, q - eps))),
               percentile(col(colName), lit(math.min(1.0, q + eps))))
          .collect().head.toSeq.map(_.asInstanceOf[Double]).toArray
        val a = pick(t)
        assert(a >= lo - 1e-9 && a <= hi + 1e-9, s"$k q=$q: $a outside [$lo, $hi]")
      }
    }
  }

  test("as-of join: every error's matched signup precedes it (same user)") {
    val rows = graft.SparkEntry.queries("r24_asof_join")(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.filter(!_.isNullAt(3)).foreach { r =>
      assert(!r.getTimestamp(3).after(r.getTimestamp(2)))
    }
  }

  test("session_window batch equals gaps-and-islands session count") {
    val viaWindow = graft.SparkEntry.queries("st1_session_window")(spark, sf).count()
    val viaIslands = graft.SparkEntry.queries("q23_sessionization")(spark, sf).count()
    assert(viaWindow == viaIslands)
  }

  test("stored HLL sketch columns: per-source and union estimates within 5%") {
    val out = graft.SparkEntry.queries("r52_hll_sketch_columns")(spark, sf).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val docs = graft.Tables.documents(spark, sf)
    val exact = docs.groupBy("source").agg(countDistinct(col("doc_id")).as("n"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val exactTotal = docs.select(countDistinct(col("doc_id"))).head.getLong(0)
    exact.foreach { case (src, n) =>
      assert(math.abs(out(src) - n).toDouble / n < 0.05, s"$src: ${out(src)} vs $n")
    }
    // the union answer comes from MERGING the stored sketches, never
    // from re-scanning raw rows — and must still bound the true total
    assert(math.abs(out("__union__") - exactTotal).toDouble / exactTotal < 0.05,
      s"union: ${out("__union__")} vs $exactTotal")
  }
}
