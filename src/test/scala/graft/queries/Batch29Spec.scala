package graft.queries

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.SparkTestSession

/** Oracle-independent invariants for round-9 batch 32 (dyadic SES
  * backtest, session-gap sweep, ABR ladder plan, TTR curve, bucket
  * balance): recursive-vs-closed-form equality, the q23 cross-pin,
  * ladder conservation, the TTR length confound, and the chi-square
  * replay with empty buckets counted.
  */
class Batch29Spec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  private val sf = "/root/testdata/sf0.001"

  private def run(name: String) = graft.SparkEntry.queries(name)(spark, sf)

  private def md5hex(s: String): String =
    java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString

  private def r4(x: Double): Double =
    BigDecimal(x).setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble

  test("r127: the closed form equals the textbook recursion exactly (dyadic α), MAE replays") {
    val daily = graft.Tables.events(spark, sf)
      .groupBy(col("event_type"), to_date(col("ts")).as("day"))
      .agg(count(lit(1)).as("x"))
      .collect().map(r => (r.getString(0), r.getDate(1).toString, r.getLong(2)))
    val got = run("r127_ses_backtest").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getDouble(2), r.getDouble(3)))
    got.foreach { case (et, nDays, mae, fcast) =>
      val xs = daily.filter(_._1 == et).sortBy(_._2).map(_._3)
      assert(nDays == xs.length.toLong)
      // textbook recursion l_1 = x_1; l_t = x_t/2 + l_(t-1)/2 — with
      // α = 1/2 every intermediate is a dyadic exactly held by a double,
      // so closed form and recursion must agree to the LAST BIT
      var l = xs.head.toDouble
      var errSum = 0.0
      xs.drop(1).foreach { x =>
        errSum += math.abs(x.toDouble - l)
        l = x.toDouble / 2 + l / 2
      }
      assert(math.abs(mae - r4(errSum / (xs.length - 1))) < 1e-9, s"$et MAE diverges")
      assert(math.abs(fcast - r4(l)) < 1e-9, s"$et final level diverges from the recursion")
    }
  }

  test("r128: session counts replay, shrink monotonically, and the 30m row matches q23") {
    val ev = graft.Tables.events(spark, sf)
      .select(col("event_id"), col("user_id"), col("ts"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getTimestamp(2)))
    val got = run("r128_session_gap_sweep").collect()
      .map(r => (r.getInt(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getDouble(4)))
    assert(got.map(_._1).toSeq == ExtraQueries30.GapMinutes)
    got.foreach { case (gap, nEvents, nSess, nUsers, mean) =>
      assert(nEvents == ev.length.toLong)
      assert(nUsers == ev.map(_._2).distinct.length.toLong)
      val want = ev.groupBy(_._2).values.map { u =>
        val ts = u.sortBy(e => (e._3.getTime, e._1)).map(_._3.getTime / 1000)
        1L + ts.zip(ts.drop(1)).count { case (a, b) => b - a > gap * 60L }
      }.sum
      assert(nSess == want, s"gap=$gap session count diverges")
      assert(math.abs(mean - r4(nEvents.toDouble / nSess)) < 1e-9)
    }
    val sess = got.map(_._3)
    assert(sess.zip(sess.drop(1)).forall(p => p._1 > p._2),
      "sessions must strictly merge as the gap grows on this fixture")
    // cross-pin: q23 sessionizes at the same 30-minute timeout — its
    // session count (rows of the q23 output) must equal the 30m row
    val q23Sessions = run("q23_sessionization").count()
    assert(got.find(_._1 == 30).get._3 == q23Sessions,
      "r128's 30m row disagrees with q23's sessionization")
  }

  test("m22: ladder conservation — every video appears on exactly the rungs its tier allows") {
    val vids = graft.Tables.documents(spark, sf)
      .filter(col("source") =!= "src0" && col("source") =!= "src1")
      .select(col("n_chars")).collect().map(_.getLong(0))
    def tier(nb: Long): Int =
      if (nb < 200) 240 else if (nb < 300) 360 else if (nb < 400) 480 else 720
    val got = run("m22_bitrate_ladder").collect()
      .map(r => (r.getInt(0), r.getInt(1), r.getLong(2), r.getLong(3), r.getLong(4)))
    assert(got.map(_._1).toSeq == ExtraQueries30.LadderHeights,
      "every rung must appear — a rung with zero renditions means the tiers never reach it")
    got.foreach { case (h, kbps, n, bytes, cost) =>
      val eligible = vids.filter(v => tier(v) >= h)
      assert(n == eligible.length.toLong, s"rung $h rendition count diverges")
      assert(bytes == eligible.sum, s"rung $h byte total diverges")
      assert(cost == eligible.map(_ * h).sum, s"rung $h cost diverges")
      assert(kbps == ExtraQueries30.LadderKbps(ExtraQueries30.LadderHeights.indexOf(h)))
    }
    val ns = got.map(_._3)
    assert(ns.zip(ns.drop(1)).forall(p => p._1 >= p._2), "rung population must shrink upward")
    assert(ns.head > ns.last, "top rung must be scarcer than the base on this fixture")
  }

  test("t44: TTR replays on the micro grid and falls strictly with document length") {
    val docs = graft.Tables.documents(spark, sf)
      .select(col("n_chars"), col("text")).collect()
      .map(r => (r.getLong(0), r.getString(1)))
    def bin(nc: Long): String =
      if (nc < 150) "a_short" else if (nc < 250) "b_mid"
      else if (nc < 350) "c_long" else "d_xlong"
    val micro = docs.map { case (nc, text) =>
      val ts = text.split(" ", -1)
      (bin(nc), math.round(ts.distinct.length * 10000.0 / ts.length))
    }
    val got = run("t44_ttr_curve").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getDouble(2), r.getDouble(3), r.getDouble(4)))
    assert(got.map(_._1).toSeq == Seq("a_short", "b_mid", "c_long", "d_xlong"),
      "every length bin must bind at this SF")
    got.foreach { case (b, n, mean, mn, mx) =>
      val ms = micro.filter(_._1 == b).map(_._2)
      assert(n == ms.length.toLong)
      assert(math.abs(mean - r4(ms.sum.toDouble / (ms.length * 10000.0))) < 1e-9)
      assert(math.abs(mn - r4(ms.min / 10000.0)) < 1e-9)
      assert(math.abs(mx - r4(ms.max / 10000.0)) < 1e-9)
    }
    val means = got.map(_._3)
    assert(means.zip(means.drop(1)).forall(p => p._1 > p._2),
      "mean TTR must fall strictly with length — the confound this table exists to show")
  }

  test("u33: chi-square replays with empty buckets counted; balance sits at its dof") {
    val docs = graft.Tables.documents(spark, sf).select(col("doc_id"))
      .collect().map(_.getLong(0))
    val occ = docs.groupBy(id => java.lang.Long.parseLong(
      md5hex(s"shuffle:$id").substring(0, 2), 16)).view.mapValues(_.length.toLong).toMap
    val counts = (0L until 256L).map(b => occ.getOrElse(b, 0L))
    val n = docs.length.toLong
    val wantChi = r4(counts.map(o => { val d = 256 * o - n; d * d }).sum.toDouble / (256.0 * n))
    val Seq(row) = run("u33_bucket_balance").collect().toSeq
    assert(row.getLong(0) == n && row.getLong(1) == 256L)
    assert(row.getLong(2) == occ.size.toLong, "used-bucket count diverges")
    assert(row.getLong(3) == counts.min && row.getLong(4) == counts.max)
    assert(row.getLong(3) == 0L,
      "fixture must leave some buckets empty — else the empties-counted contract is untested")
    assert(math.abs(row.getDouble(5) - wantChi) < 1e-9, "chi-square diverges")
    // 255-dof chi-square: far outside [150, 400] would mean a biased slice
    assert(row.getDouble(5) > 150.0 && row.getDouble(5) < 400.0,
      s"bucket balance ${row.getDouble(5)} far from the 255-dof expectation")
  }
}
