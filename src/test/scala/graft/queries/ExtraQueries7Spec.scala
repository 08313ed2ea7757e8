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

  test("p24 LOO encoding matches brute force and never uses the row's own target") {
    val base = graft.Tables.orders(spark, sf)
      .join(graft.Tables.customer(spark, sf),
        col("o_custkey") === col("c_custkey"))
      .select(col("o_orderkey"), col("c_mktsegment"),
        round(col("o_totalprice") * 100, 0).cast("long").as("y"))
      .collect().map(r => (r.getLong(0), r.getString(1), BigInt(r.getLong(2))))
    val segSum = base.groupBy(_._2).map { case (g, xs) => g -> xs.map(_._3).sum }
    val segN = base.groupBy(_._2).map { case (g, xs) => g -> xs.length }
    val rows = graft.SparkEntry.queries("p24_target_encoding")(spark, sf).collect()
    assert(rows.length == base.count(_._1 < 1000) && rows.nonEmpty)
    val byKey = base.map(b => b._1 -> b).toMap
    rows.foreach { r =>
      val (_, g, y) = byKey(r.getLong(0))
      assert(r.getString(1) == g)
      val expect = (segSum(g) - y).toDouble / (segN(g) - 1).toDouble
      assert(r.getDouble(2) ==
        BigDecimal(expect).setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble,
        s"order ${r.getLong(0)}")
    }
  }

  test("r98 winsorized mean matches brute force and sits inside the fences") {
    val vals = graft.Tables.orders(spark, sf)
      .select(col("o_orderpriority"),
        round(col("o_totalprice") * 100, 0).cast("long").as("y"))
      .collect().map(r => (r.getString(0), r.getLong(1)))
      .groupBy(_._1).map { case (g, xs) => g -> xs.map(_._2).sorted }
    val rows = graft.SparkEntry.queries("r98_winsorize")(spark, sf).collect()
    assert(rows.length == vals.size && rows.nonEmpty)
    rows.foreach { r =>
      val ys = vals(r.getString(0))
      val n = ys.length
      val lo = ys(math.ceil(n * 0.05).toInt - 1)
      val hi = ys(math.ceil(n * 0.95).toInt - 1)
      assert(r.getLong(1) == n.toLong && r.getLong(2) == lo && r.getLong(3) == hi)
      assert(r.getLong(4) == ys.count(y => y < lo || y > hi).toLong, "n_clipped")
      val wsum = ys.map(y => BigInt(math.max(lo, math.min(hi, y)))).sum
      assert(r.getDouble(6) ==
        BigDecimal(wsum.toDouble / n.toDouble)
          .setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble, "winsorized mean")
      assert(r.getDouble(6) >= lo.toDouble && r.getDouble(6) <= hi.toDouble)
    }
  }

  test("p25 reshard movement is confined to the new shard (HRW minimal-motion law)") {
    val rows = graft.SparkEntry.queries("p25_rendezvous_shards")(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(rows.nonEmpty)
    val total = rows.map(_._3).sum
    val moved = rows.filter(r => r._1 != r._2)
    // the defining HRW property: adding shard k can only move keys TO k
    moved.foreach { case (o, n, c) =>
      assert(n == (ExtraQueries7.ShardsNew - 1).toLong, s"illegal move $o->$n ($c docs)")
    }
    // ~1/new of keys move; allow wide slack on the small fixture
    val frac = moved.map(_._3).sum.toDouble / total
    assert(frac > 0.05 && frac < 0.40, s"moved fraction $frac")
    // brute-force a handful of assignments through the same md5 weights
    val md = java.security.MessageDigest.getInstance("MD5")
    def h(doc: Long, s: Int): Long =
      BigInt(md.digest(s"$doc:$s".getBytes("UTF-8")).take(8).map("%02x".format(_)).mkString
        .take(15), 16).toLong
    val docs = graft.Tables.documents(spark, sf).select("doc_id")
      .limit(20).collect().map(_.getLong(0))
    val assigns = graft.SparkEntry.queries("p25_rendezvous_shards")(spark, sf)
    docs.foreach { doc =>
      val old = (0 until ExtraQueries7.ShardsOld).maxBy(s => (h(doc, s), -s))
      val nw = (0 until ExtraQueries7.ShardsNew).maxBy(s => (h(doc, s), -s))
      assert(old == nw || nw == ExtraQueries7.ShardsNew - 1, s"doc $doc: $old -> $nw")
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
