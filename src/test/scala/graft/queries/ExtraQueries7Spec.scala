package graft.queries

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.SparkTestSession

/** Oracle-independent invariants for ExtraQueries7: brute-force
  * equivalence on the tiny SF for the ACF estimator, the Flesch formula,
  * and the counting-method percentiles.
  */
class ExtraQueries7Spec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  private val sf = "/root/testdata/sf0.001"

  private def round6(x: Double) =
    BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
  private def round4(x: Double) =
    BigDecimal(x).setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble

  test("r96 acf matches a brute-force BigInt evaluation of the estimator") {
    val series = graft.Tables.orders(spark, sf)
      .groupBy(to_date(col("o_orderdate")).as("day"))
      .agg(sum(round(col("o_totalprice") * 100, 0).cast("long")).as("x"))
      .orderBy("day").collect().map(r => BigInt(r.getLong(1)))
    val n = BigInt(series.length)
    val sx = series.sum
    val qx = series.map(x => x * x).sum
    val den = (n * n * qx - n * sx * sx).toDouble
    val rows = graft.SparkEntry.queries("r96_autocorrelation")(spark, sf).collect()
    assert(rows.length == ExtraQueries7.AcfMaxLag)
    rows.foreach { r =>
      val k = r.getLong(0).toInt
      val pairs = series.dropRight(k).zip(series.drop(k))
      assert(r.getLong(1) == (series.length - k).toLong, s"lag $k: n_pairs")
      val pk = pairs.map { case (a, b) => a * b }.sum
      val hk = pairs.map(_._1).sum
      val tk = pairs.map(_._2).sum
      val num = (n * n * pk - n * sx * (hk + tk) + (n - k) * sx * sx).toDouble
      assert(r.getDouble(2) == round6(num / den), s"lag $k: acf")
    }
    // lag-0 autocorrelation is definitionally 1; all reported lags bounded
    rows.foreach(r => assert(math.abs(r.getDouble(2)) <= 1.0 + 1e-9))
  }

  test("t30 readability matches a per-document scala recomputation") {
    val docs = graft.Tables.documents(spark, sf)
      .select("doc_id", "text").collect().map(r => (r.getLong(0), r.getString(1))).toMap
    val rows = graft.SparkEntry.queries("t30_readability")(spark, sf).collect()
    assert(rows.length == docs.size && rows.nonEmpty)
    rows.foreach { r =>
      val text = docs(r.getLong(0))
      val words = text.split(" ", -1)
      val nWords = math.max(1, words.length).toLong
      val nSents = math.max(1,
        text.split("[.!?]+", -1).count(_.trim.nonEmpty)).toLong
      val nSyll = words.map(w =>
        math.max(1, "[aeiouy]+".r.findAllIn(w.toLowerCase).length).toLong).sum
      assert(r.getLong(1) == nWords, s"doc ${r.getLong(0)}: words")
      assert(r.getLong(2) == nSents, s"doc ${r.getLong(0)}: sentences")
      assert(r.getLong(3) == nSyll, s"doc ${r.getLong(0)}: syllables")
      val fre = 206.835 - 1.015 * (nWords.toDouble / nSents.toDouble) -
        84.6 * (nSyll.toDouble / nWords.toDouble)
      assert(r.getDouble(4) == round4(fre), s"doc ${r.getLong(0)}: fre")
    }
  }

  test("r97 backtest matches a brute-force BigInt OLS + holdout evaluation") {
    val daily = graft.Tables.orders(spark, sf)
      .groupBy(col("o_orderpriority").as("g"), to_date(col("o_orderdate")).as("day"))
      .agg(sum(round(col("o_totalprice") * 100, 0).cast("long")).as("y"))
      .orderBy("g", "day").collect()
      .map(r => (r.getString(0), BigInt(r.getLong(2))))
      .groupBy(_._1).map { case (g, xs) => g -> xs.map(_._2) }
    val rows = graft.SparkEntry.queries("r97_forecast_backtest")(spark, sf).collect()
    assert(rows.length == daily.size && rows.nonEmpty)
    rows.foreach { r =>
      val ys = daily(r.getString(0))
      val n = ys.length
      val nTr = 8 * n / 10
      assert(r.getLong(1) == nTr.toLong && r.getLong(2) == (n - nTr).toLong)
      val train = ys.take(nTr).zipWithIndex.map { case (y, i) => (BigInt(i + 1), y) }
      val sx = train.map(_._1).sum; val sy = train.map(_._2).sum
      val sxx = train.map(t => t._1 * t._1).sum; val sxy = train.map(t => t._1 * t._2).sum
      val dd = nTr * sxx - sx * sx
      val bb = nTr * sxy - sx * sy
      val aa = dd * sy - bb * sx
      val test = ys.zipWithIndex.drop(nTr).map { case (y, i) => (BigInt(i + 1), y) }
      val nums = test.map { case (t, y) => nTr * dd * y - aa - nTr * bb * t }
      val den = test.length.toDouble * nTr.toDouble * dd.toDouble
      assert(r.getDouble(3) == round6(bb.toDouble / dd.toDouble), "slope")
      assert(r.getDouble(4) ==
        BigDecimal(nums.map(_.abs).sum.toDouble / den)
          .setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble, "mae")
      assert(r.getDouble(5) ==
        BigDecimal(nums.sum.toDouble / den)
          .setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble, "me")
    }
  }

  test("u20 percentiles equal the rank-definition values per event type") {
    val ev = graft.Tables.events(spark, sf)
      .select(col("event_type"), unix_micros(col("ts")).as("us")).collect()
      .map(r => (r.getString(0), r.getLong(1)))
    val gmax = ev.map(_._2).max
    val ages = ev.groupBy(_._1).map { case (t, xs) =>
      t -> xs.map(x => (gmax - x._2) / 60000000L).sorted
    }
    val rows = graft.SparkEntry.queries("u20_freshness_audit")(spark, sf).collect()
    assert(rows.length == ages.size && rows.nonEmpty)
    rows.foreach { r =>
      val a = ages(r.getString(0))
      assert(r.getLong(1) == a.length.toLong, "n_events")
      assert(r.getLong(2) == a.head, "staleness = min age")
      assert(r.getLong(3) == a.last, "max age")
      // value at cumulative rank ceil(q*n): index ceil(q*n)-1 in sorted order
      assert(r.getLong(4) == a(math.ceil(a.length * 0.5).toInt - 1), "p50")
      assert(r.getLong(5) == a(math.ceil(a.length * 0.95).toInt - 1), "p95")
    }
  }
}
