package graft.queries

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.SparkTestSession

/** Oracle-independent invariants for the batch-11 queries: brute-force
  * replays of the rolling-distinct curve and the window funnel, and
  * structural laws of the held-out LM sweep.
  */
class ExtraQueries11Spec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  private val sf = "/root/testdata/sf0.001"

  test("r105: rolling distinct matches a driver-side set replay") {
    val ud = graft.Tables.events(spark, sf)
      .select(col("user_id"), to_date(col("ts")).as("day")).distinct()
      .collect().map(r => (r.getLong(0), r.getDate(1).toLocalDate))
    val days = ud.map(_._2).distinct
    val got = graft.SparkEntry.queries("r105_rolling_distinct")(spark, sf).collect()
      .map(r => r.getDate(0).toLocalDate -> (r.getLong(1), r.getLong(2))).toMap
    assert(got.keySet == days.toSet)
    days.foreach { day =>
      val dau = ud.count(_._2 == day).toLong
      val wau = ud.filter { case (_, d) =>
        !d.isAfter(day) && d.isAfter(day.minusDays(ExtraQueries11.RollWindowDays))
      }.map(_._1).distinct.length.toLong
      assert(got(day) == ((dau, wau)), s"$day: ${got(day)} vs replay ($dau, $wau)")
      assert(dau <= wau, s"$day: DAU can never exceed the trailing WAU")
    }
  }

  test("r106: funnel stages match a driver-side replay and are monotone") {
    val ev = graft.Tables.events(spark, sf)
      .select(col("user_id"), col("event_type"), unix_micros(col("ts")).as("mts"))
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
    val h = ExtraQueries11.FunnelHorizonUs
    val steps = ExtraQueries11.FunnelSteps
    val expect = ev.groupBy(_._1).map { case (_, rows) =>
      val byType = rows.groupBy(_._2)
      def minAfter(tp: String, after: Long, cap: Long): Option[Long] =
        byType.getOrElse(tp, Array.empty[(Long, String, Long)])
          .map(_._3).filter(t => t > after && t <= cap).sorted.headOption
      val t1 = byType.getOrElse(steps.head, Array.empty[(Long, String, Long)])
        .map(_._3).sorted.headOption
      val t2 = t1.flatMap(a => minAfter(steps(1), a, a + h))
      val t3 = (t1, t2) match {
        case (Some(a), Some(b)) => minAfter(steps(2), b, a + h)
        case _ => None
      }
      Seq(t1, t2, t3).count(_.isDefined).toLong
    }.groupBy(identity).map { case (st, v) => st -> v.size.toLong }
    val got = graft.SparkEntry.queries("r106_window_funnel")(spark, sf).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got == expect, s"stage histogram $got vs replay $expect")
  }

  test("t34: sweep laws hold (unseen count constant, add-1 leg keeps lp finite)") {
    val rows = graft.SparkEntry.queries("t34_lm_heldout")(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
    assert(rows.map(_._1).toSeq == ExtraQueries11.LmLambdasPct.map(_.toLong))
    // unseen-trigram exposure is a property of the SPLIT, not of λ
    assert(rows.map(t => (t._2, t._3)).distinct.size == 1,
      "n_trigrams and n_unseen must be identical across the λ grid")
    assert(rows.head._3 > 0, "the trigram model must face unseen held-out contexts")
    rows.foreach { case (lam, _, _, lp) =>
      assert(!lp.isNaN && !lp.isInfinite && lp < 0.0, s"λ=$lam: finite negative log-lik")
    }
    // more weight on the sparse trigram leg must eventually hurt held-out
    // likelihood (the overfitting cliff the sweep exists to reveal)
    val byLam = rows.map(t => t._1 -> t._4).toMap
    assert(byLam(90L) < byLam(0L),
      "λ=0.9 must score worse than the smoothed bigram baseline on held-out data")
  }
}
