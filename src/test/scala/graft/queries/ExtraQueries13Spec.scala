package graft.queries

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.SparkTestSession

/** Oracle-independent invariants for the batch-13 queries: FIFO
  * conservation laws plus a procedural-allocator replay, cascade
  * containment laws, keyframe-within-scene laws against the registered
  * m07 cuts, and a blocklist screening replay.
  */
class ExtraQueries13Spec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  private val sf = "/root/testdata/sf0.001"

  test("r108: FIFO laws hold and allocations match a procedural allocator") {
    val rows = graft.SparkEntry.queries("r108_fifo_allocation")(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4),
        r.getLong(5), r.getLong(6), r.getLong(7), r.getLong(8)))
    assert(rows.nonEmpty)
    rows.foreach { case (p, lots, issues, supply, demand, allocs, matched, unmet, unused) =>
      assert(matched == math.min(supply, demand), s"part $p: FIFO matches min(supply, demand)")
      assert(unmet == demand - matched && unused == supply - matched, s"part $p: conservation")
      assert(allocs <= lots + issues, s"part $p: interval-overlap pair bound")
    }
    // procedural FIFO replay on one part with both lots and issues
    val li = graft.Tables.lineitem(spark, sf)
      .select(col("l_partkey"), col("l_orderkey"), col("l_linenumber"),
        unix_micros(col("l_shipdate").cast("timestamp")).as("sd"), col("l_returnflag"),
        col("l_quantity").cast("long"))
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getInt(2), r.getLong(3),
        r.getString(4), r.getLong(5)))
    val target = rows.filter(t => t._2 > 2 && t._3 > 2).maxBy(_._6)._1
    val part = li.filter(_._1 == target)
    def ordered(rs: Array[(Long, Long, Int, Long, String, Long)]) =
      rs.sortBy(t => (t._4, t._2, t._3, t._6)).map(_._6)
    val lots = scala.collection.mutable.Queue(ordered(part.filter(_._5 == "R")): _*)
    var (allocs, matched) = (0L, 0L)
    ordered(part.filter(_._5 != "R")).foreach { need0 =>
      var need = need0
      while (need > 0 && lots.nonEmpty) {
        val take = math.min(need, lots.head)
        matched += take; allocs += 1; need -= take
        if (take == lots.head) lots.dequeue()
        else lots(0) = lots.head - take
      }
    }
    val got = rows.find(_._1 == target).get
    assert(got._7 == matched, s"part $target: matched qty vs procedural FIFO")
    assert(got._6 == allocs, s"part $target: allocation count vs procedural FIFO")
  }

  test("u24: cascade containment laws hold") {
    val got = graft.SparkEntry.queries("u24_delete_cascade")(spark, sf).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(got.keySet == Set("customer", "orders", "lineitem"))
    got.foreach { case (t, (total, deleted)) =>
      assert(deleted >= 0 && deleted <= total, s"$t: deletion bounds")
    }
    assert(got("customer")._2 > 0, "the deletion cohort must be non-empty")
    // independent replay of the cascade sizes
    val delC = graft.Tables.customer(spark, sf)
      .filter(col("c_custkey") % ExtraQueries13.DeleteMod === 0)
    val delO = graft.Tables.orders(spark, sf)
      .join(delC.select(col("c_custkey")), col("o_custkey") === col("c_custkey"), "left_semi")
    val delL = graft.Tables.lineitem(spark, sf)
      .join(delO.select(col("o_orderkey")), col("l_orderkey") === col("o_orderkey"), "left_semi")
    assert(got("customer")._2 == delC.count() && got("orders")._2 == delO.count() &&
      got("lineitem")._2 == delL.count(), "cascade sizes vs independent semi-join replay")
  }

  test("m16: exactly one keyframe per scene, maximal energy, consistent with m07 cuts") {
    val scenes = graft.SparkEntry.queries("m16_keyframes")(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
    assert(scenes.nonEmpty)
    val cuts = graft.SparkEntry.queries("m07_scene_cuts")(spark, sf).collect()
      .map(r => (r.getLong(0), r.getInt(1).toLong)).groupBy(_._1)
      .map { case (k, v) => k -> v.map(_._2).sorted }
    scenes.groupBy(_._1).foreach { case (doc, ss) =>
      val ids = ss.map(_._2).sorted
      assert(ids.toSeq == (0L until ids.length).toSeq, s"doc $doc: scene ids contiguous from 0")
      assert(ids.length == cuts.get(doc).map(_.length).getOrElse(0) + 1,
        s"doc $doc: #scenes = #cuts + 1")
      // the keyframe of scene k lies inside scene k's frame range
      cuts.get(doc).foreach { cs =>
        ss.foreach { case (_, scene, _, kf, _) =>
          val lo = if (scene == 0) 0L else cs(scene.toInt - 1)
          val hi = if (scene.toInt < cs.length) cs(scene.toInt) - 1 else Long.MaxValue
          assert(kf >= lo && kf <= hi, s"doc $doc scene $scene: keyframe $kf outside [$lo,$hi]")
        }
      }
      assert(ss.map(_._3).sum > 0, s"doc $doc: frames accounted")
    }
  }

  test("t35: blocklist screening matches a driver-side replay, zero-hit terms kept") {
    val texts = graft.Tables.documents(spark, sf).select("text")
      .collect().map(_.getString(0))
    val got = graft.SparkEntry.queries("t35_blocklist_screen")(spark, sf).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2), r.getLong(4)))
    assert(got.map(_._1).toSeq == ExtraQueries13.Blocklist.sorted,
      "every blocklist term must appear in the report, hit or not")
    val flaggedExpect = texts.count(t =>
      t.split(" ", -1).count(ExtraQueries13.Blocklist.contains) >= ExtraQueries13.FlagThreshold)
    got.foreach { case (term, (nDocs, occ, nFlagged)) =>
      val expOcc = texts.map(_.split(" ", -1).count(_ == term).toLong).sum
      val expDocs = texts.count(_.split(" ", -1).contains(term)).toLong
      assert((nDocs, occ) == ((expDocs, expOcc)), s"$term: ($nDocs, $occ) vs ($expDocs, $expOcc)")
      assert(nFlagged == flaggedExpect.toLong, s"flagged docs: $nFlagged vs $flaggedExpect")
    }
  }
}
