package graft.queries

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.SparkTestSession

/** Oracle-independent invariants for round-8 batch 23. */
class Batch21Spec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  private val sf = "/root/testdata/sf0.001"

  test("r119: Theil-Sen median matches a driver replay of all pairwise slopes") {
    val out = graft.SparkEntry.queries("r119_theil_sen")(spark, sf).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2), r.getDouble(3))).toMap
    val daily = graft.Tables.orders(spark, sf)
      .groupBy(col("o_orderpriority"), to_date(col("o_orderdate")).as("day"))
      .agg(sum(col("o_totalprice").cast("decimal(12,2)") * 100).cast("long").as("y"))
      .collect().map(r => (r.getString(0), r.getDate(1).toLocalDate.toEpochDay, r.getLong(2)))
    daily.groupBy(_._1).foreach { case (p, xs) =>
      val pts = xs.map(t => (t._2, t._3)).sortBy(_._1)
      val slopes = for {
        i <- pts.indices; j <- (i + 1) until pts.length
      } yield ((pts(j)._2 - pts(i)._2).toDouble / (pts(j)._1 - pts(i)._1),
        pts(i)._1, pts(j)._1)
      val sorted = slopes.sortBy(t => (t._1, t._2, t._3))
      val median = sorted((sorted.length + 1) / 2 - 1)._1
      val (nDays, nPairs, ts) = out(p)
      assert(nDays == pts.length.toLong, s"$p n_days")
      assert(nPairs == (pts.length.toLong * (pts.length - 1)) / 2, s"$p n_pairs = C(n,2)")
      val want = BigDecimal(median).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
      assert(math.abs(ts - want) < 1e-9, s"$p theil-sen median")
    }
  }

  test("u27: value accounting nests strictly and counts agree with st6") {
    val out = graft.SparkEntry.queries("u27_late_impact")(spark, sf).collect()
      .map(r => (r.getString(0), r.getDate(1)) ->
        (r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5)))
      .toMap
    out.values.foreach { case (_, all, onTime, accepted) =>
      assert(onTime <= accepted && accepted <= all, "status buckets must nest")
    }
    val st6 = graft.SparkEntry.queries("st6_watermark_audit")(spark, sf).collect()
      .map(r => (r.getString(0), r.getDate(1)) -> r.getLong(2)).toMap
    assert(out.keySet == st6.keySet, "u27 covers exactly st6's (type, day) cells")
    out.foreach { case (k, (n, _, _, _)) =>
      assert(n == st6(k), s"cell $k event count matches st6")
    }
  }

  test("p30: group-aware folds never split a cluster; naive split would") {
    val out = graft.SparkEntry.queries("p30_group_folds")(spark, sf).collect()
      .map(r => (r.getInt(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
    val nDocs = graft.Tables.documents(spark, sf).count()
    assert(out.map(_._2).sum == nDocs, "folds partition the corpus")
    assert(out.forall(_._4 == 0L), "the grouped assignment is the zero-leakage guarantee")
    // driver replay of the naive spanning count from the registered clusters
    val clusters = graft.SparkEntry.queries("d08_dedup_clusters")(spark, sf).collect()
      .map(r => r.getString(2).split(",").map(_.toLong))
    def bucket(key: Long): Int = {
      val md = java.security.MessageDigest.getInstance("MD5")
        .digest(s"fold:$key".getBytes("UTF-8")).map("%02x".format(_)).mkString
      (java.lang.Long.parseLong(md.take(6), 16) % DedupQueries.FoldK).toInt
    }
    val naiveSpanning = clusters.count(ms => ms.map(bucket).distinct.length > 1)
    assert(out.head._5 == naiveSpanning.toLong, "naive spanning replay")
  }

  test("r120: bursts partition the event log and keep-best is the max-cents min-id event") {
    val out = graft.SparkEntry.queries("r120_debounce")(spark, sf).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5)))
    val ev = graft.Tables.events(spark, sf)
      .select(col("event_id"), col("user_id"), col("event_type"),
        col("ts").cast("timestamp").cast("long").as("sec"),
        (col("value").cast("decimal(18,2)") * 100).cast("long").as("cents"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getString(2), r.getLong(3), r.getLong(4)))
    assert(out.map(_._4).sum == ev.length.toLong, "bursts partition the log")
    // driver replay on the busiest (user, type) slice
    val (bu, bt) = ev.groupBy(e => (e._2, e._3)).maxBy(_._2.size)._1
    val slice = ev.filter(e => e._2 == bu && e._3 == bt).sortBy(e => (e._4, e._1))
    var burst = 0L; var prev = Long.MinValue
    val assigned = slice.map { e =>
      if (prev == Long.MinValue || e._4 - prev > ExtraQueries21.DebounceGapS) burst += 1
      prev = e._4
      (burst, e)
    }
    assigned.groupBy(_._1).foreach { case (b, es) =>
      val best = es.map(_._2).minBy(e => (-e._5, e._1))
      val got = out.find(t => t._1 == bu && t._2 == bt && t._3 == b).get
      assert(got._4 == es.size.toLong && got._5 == best._1 && got._6 == best._5,
        s"burst ($bu,$bt,$b)")
    }
  }

  test("s30: dominance flags replay from the table; every method keeps a frontier") {
    val t = graft.SparkEntry.queries("s30_index_advisor")(spark, sf).collect()
      .map(r => (r.getString(0), r.getString(1), r.getDouble(2), r.getLong(3), r.getBoolean(4)))
    assert(t.nonEmpty)
    t.foreach { case (m, c, q, cost, dom) =>
      val want = t.exists { case (m2, c2, q2, cost2, _) =>
        m2 == m && c2 != c && q2 >= q && cost2 <= cost && (q2 > q || cost2 < cost)
      }
      assert(dom == want, s"dominance flag for ($m,$c)")
    }
    t.groupBy(_._1).foreach { case (m, xs) =>
      assert(xs.exists(!_._5), s"method $m must have a non-dominated config")
    }
  }
}
