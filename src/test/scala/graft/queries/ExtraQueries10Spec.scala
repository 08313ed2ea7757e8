package graft.queries

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.SparkTestSession

/** Oracle-independent invariants for the batch-10 queries: an
  * independent MessageDigest replay of the permutation test, a
  * driver-side replay of the Markov backtest, brute-force MATTR
  * recomputation, run-length accounting laws, and the watermark
  * classification laws (conservation + monotone-lateness).
  */
class ExtraQueries10Spec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  private val sf = "/root/testdata/sf0.001"

  private def md5Mod(s: String, m: Long): Long = {
    val md = java.security.MessageDigest.getInstance("MD5").digest(s.getBytes("UTF-8"))
    val hex = md.take(4).map("%02x".format(_)).mkString
    java.lang.Long.parseLong(hex, 16) % m
  }

  test("r103: permutation exceedance matches an independent MessageDigest replay") {
    val rows = graft.Tables.orders(spark, sf)
      .join(graft.Tables.customer(spark, sf)
          .filter(col("c_mktsegment").isin(ExtraQueries10.PermSegA, ExtraQueries10.PermSegB)),
        col("o_custkey") === col("c_custkey"))
      .select(col("o_orderkey"), col("c_mktsegment"),
        (col("o_totalprice").cast(org.apache.spark.sql.types.DecimalType(12, 2)) * 100)
          .cast("long"))
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
    val (sa, na) = (rows.filter(_._2 == ExtraQueries10.PermSegA).map(_._3).sum,
      rows.count(_._2 == ExtraQueries10.PermSegA).toLong)
    val (sb, nb) = (rows.filter(_._2 == ExtraQueries10.PermSegB).map(_._3).sum,
      rows.count(_._2 == ExtraQueries10.PermSegB).toLong)
    val obsAbs = BigInt(sa) * nb - BigInt(sb) * na
    var exceed = 0L
    (1 to ExtraQueries10.PermB).foreach { b =>
      var (psa, pna, psb, pnb) = (0L, 0L, 0L, 0L)
      rows.foreach { case (id, _, cents) =>
        if (md5Mod(s"$b:$id", 2) == 0) { psa += cents; pna += 1 }
        else { psb += cents; pnb += 1 }
      }
      val permAbs = BigInt(psa) * pnb - BigInt(psb) * pna
      if (permAbs.abs * na * nb >= obsAbs.abs * pna * pnb) exceed += 1
    }
    val got = graft.SparkEntry.queries("r103_permutation_test")(spark, sf).head()
    assert(got.getLong(0) == na && got.getLong(1) == nb, "group sizes")
    assert(got.getLong(4) == exceed, s"b_exceed ${got.getLong(4)} vs replay $exceed")
    val p = got.getDouble(5)
    assert(p > 0.0 && p <= 1.0, "p-value range")
  }

  test("r104: backtest accuracy matches a driver-side replay") {
    val ev = graft.Tables.events(spark, sf)
      .select(col("user_id"), col("ts"), col("event_id"), col("event_type"))
      .collect()
      .map(r => (r.getLong(0), r.getTimestamp(1), r.getLong(2), r.getString(3)))
    val cutoff = java.sql.Timestamp.valueOf(ExtraQueries10.MarkovCutoff)
    val trans = ev.groupBy(_._1).toSeq.flatMap { case (_, rows) =>
      val sorted = rows.sortBy(t => (t._2.getTime, t._3))
      sorted.sliding(2).collect { case Array(a, b) =>
        (a._4, b._4, b._2.before(cutoff))
      }
    }
    val trainCnt = trans.filter(_._3).groupBy(t => (t._1, t._2))
      .map { case (k, v) => k -> v.size }
    val model = trainCnt.groupBy(_._1._1).map { case (prev, m) =>
      prev -> m.toSeq.map { case ((_, cur), c) => (cur, c) }
        .sortBy { case (cur, c) => (-c, cur) }.head._1
    }
    val gpred = trainCnt.groupBy(_._1._2).map { case (cur, m) => cur -> m.values.sum }
      .toSeq.sortBy { case (cur, c) => (-c, cur) }.head._1
    val test = trans.filterNot(_._3)
    val expect = test.groupBy(_._1).map { case (prev, ts) =>
      prev -> (ts.size.toLong,
        ts.count(t => model.get(prev).contains(t._2)).toLong,
        ts.count(_._2 == gpred).toLong)
    }
    val got = graft.SparkEntry.queries("r104_markov_backtest")(spark, sf).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2), r.getLong(4))).toMap
    assert(got.keySet == expect.keySet)
    expect.foreach { case (prev, e) =>
      assert(got(prev) == e, s"$prev: ${got(prev)} vs replay $e")
    }
  }

  test("t33: MATTR matches a brute-force window recomputation") {
    val texts = graft.Tables.documents(spark, sf).select("doc_id", "text")
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    val got = graft.SparkEntry.queries("t33_mattr")(spark, sf).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getLong(3), r.getDouble(4)))
      .toMap
    assert(got.keySet == texts.keySet)
    val w = ExtraQueries10.MattrW
    texts.foreach { case (id, text) =>
      val toks = text.split(" ", -1)
      val nWin = math.max(toks.length - w + 1, 1)
      val sumD = (1 to nWin).map(i => toks.slice(i - 1, i - 1 + w).distinct.length.toLong).sum
      val (gn, gw, gs, gm) = got(id)
      assert(gn == toks.length.toLong && gw == nWin.toLong && gs == sumD, s"doc $id stats")
      assert(gm >= 0.0 && gm <= 1.0, s"doc $id: MATTR in [0,1]")
    }
  }

  test("u22: run accounting laws hold (runs <= rows, distinct <= runs, replay)") {
    val got = graft.SparkEntry.queries("u22_encoding_audit")(spark, sf).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2), r.getLong(3))).toMap
    assert(got.keySet == Set("returnflag", "linestatus", "ship_month", "quantity"))
    got.foreach { case (c, (rows, runs, distinct)) =>
      assert(runs >= 1 && runs <= rows, s"$c: run count bounds")
      assert(distinct <= runs, s"$c: each distinct value needs at least one run")
    }
    // independent replay of one column's run count
    val li = graft.Tables.lineitem(spark, sf)
      .select(col("l_orderkey"), col("l_linenumber"), col("l_returnflag"))
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getString(2)))
    val runs = li.groupBy(t => t._1 / ExtraQueries10.EncShardKeys).values.map { shard =>
      val vs = shard.sortBy(t => (t._1, t._2, t._3)).map(_._3)
      1L + vs.sliding(2).count(p => p.length == 2 && p(0) != p(1))
    }.sum
    assert(got("returnflag")._2 == runs, s"returnflag runs: ${got("returnflag")._2} vs $runs")
  }

  test("st6: two-level prefix scan equals the naive per-type running max") {
    import org.apache.spark.sql.expressions.Window
    val arr = ExtraQueries10.wmArrivals(graft.Tables.events(spark, sf))
    val w = Window.partitionBy("event_type").orderBy("arrival_seq", "event_id")
      .rowsBetween(Window.unboundedPreceding, -1)
    val naive = arr.withColumn("hi", max(col("mts")).over(w))
      .withColumn("status",
        when(col("hi").isNull || col("mts") >= col("hi"), "on_time")
          .when(col("mts") >= col("hi") - ExtraQueries10.WmDelayUs, "late_accepted")
          .otherwise("dropped"))
      .groupBy(col("event_type"), to_date(col("ts")).as("day"))
      .agg(count(lit(1)).as("n_events"),
        sum(when(col("status") === "on_time", 1L).otherwise(0L)).as("on_time"),
        sum(when(col("status") === "late_accepted", 1L).otherwise(0L)).as("late_accepted"),
        sum(when(col("status") === "dropped", 1L).otherwise(0L)).as("dropped"))
      .collect().map(_.toSeq).toSet
    val got = graft.SparkEntry.queries("st6_watermark_audit")(spark, sf)
      .collect().map(_.toSeq).toSet
    assert(got == naive, "chunked scan diverged from the naive single-window watermark")
  }

  test("st6: watermark classification conserves counts and tightens with delay") {
    val rows = graft.SparkEntry.queries("st6_watermark_audit")(spark, sf).collect()
      .map(r => (r.getString(0), r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5)))
    assert(rows.nonEmpty)
    rows.foreach { case (et, n, on, late, drop) =>
      assert(n == on + late + drop, s"$et: conservation")
    }
    val total = rows.map(_._2).sum
    val events = graft.Tables.events(spark, sf).count()
    assert(total == events, "every event classified exactly once")
    assert(rows.map(_._4).sum + rows.map(_._5).sum > 0, "reorder jitter must produce lateness")
    assert(rows.map(_._3).sum > 0, "some events must be on time")
  }
}
