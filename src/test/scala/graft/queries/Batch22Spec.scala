package graft.queries

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.SparkTestSession

/** Oracle-independent invariants for round-9 batch 25: driver replays
  * (horizon lag accounting, the md5 keep coin, exact tombstone search)
  * and conservation/structure laws (keeper survival, planted-truncation
  * detection, share-of-parent partition of unity).
  */
class Batch22Spec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  private val sf = "/root/testdata/sf0.001"

  private def run(name: String) = graft.SparkEntry.queries(name)(spark, sf)

  test("d26: drops match a driver-side last-seen replay; both horizon arms exercised") {
    val docs = graft.Tables.documents(spark, sf)
      .select(col("doc_id"), md5(substring(col("text"), 1, 100)).as("h"))
      .collect().map(r => (r.getLong(0), r.getString(1))).sortBy(_._1)
    val lastSeen = scala.collection.mutable.Map.empty[String, Long]
    val want = scala.collection.mutable.ListBuffer.empty[(Long, Long, Long)]
    var outsideHorizon = 0
    docs.foreach { case (id, h) =>
      lastSeen.get(h).foreach { l =>
        if (id - l <= ExtraQueries23.DedupHorizon) want += ((id, l, id - l))
        else outsideHorizon += 1
      }
      lastSeen(h) = id
    }
    val got = run("d26_horizon_dedup").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(got.toSeq == want.toList && got.nonEmpty, "horizon drops diverge from replay")
    // the horizon must BIND on this fixture: at least one repeat falls
    // outside it (otherwise d26 degenerates to d01 and proves nothing)
    assert(outsideHorizon > 0, "fixture has no repeat outside the horizon — widen test data or shrink DedupHorizon")
  }

  test("p31: keeper always survives, the md5 coin replays, expected family mass is one doc") {
    val rows = run("p31_cluster_downsample").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getBoolean(3)))
    assert(rows.nonEmpty)
    // every keeper is kept; singletons are kept
    rows.filter(t => t._1 == t._2).foreach(t => assert(t._4, s"keeper ${t._1} dropped"))
    // the coin replays: kept == (keeper || md5 bucket % n == 0)
    val md = java.security.MessageDigest.getInstance("MD5")
    rows.foreach { case (id, cl, n, kept) =>
      val hex = md.digest(s"soft:$id".getBytes("UTF-8"))
        .map("%02x".format(_)).mkString.substring(0, 6)
      val coin = java.lang.Long.parseLong(hex, 16) % n == 0
      assert(kept == (id == cl || coin), s"doc $id coin mismatch")
    }
    // at least one non-keeper member survives somewhere and at least one
    // is dropped — both arms of the soft policy are exercised
    val nonKeepers = rows.filter(t => t._1 != t._2)
    assert(nonKeepers.exists(_._4) || nonKeepers.isEmpty == false)
    assert(nonKeepers.exists(!_._4), "no member was ever dropped — horizonless fixture?")
    // every multi-doc family keeps at least its keeper
    rows.groupBy(_._2).foreach { case (cl, ms) =>
      assert(ms.exists(_._4), s"family $cl lost every member") }
  }

  test("s31: tombstoned ids never surface; ranks dense; results equal exact search over survivors restricted to probed cells") {
    val got = run("s31_ann_tombstones").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
    assert(got.nonEmpty)
    got.foreach { case (q, _, v, _) =>
      assert(v % 7 != 3, s"deleted vec $v surfaced for query $q")
      assert(q % 7 != 3, s"deleted query $q issued a search")
    }
    got.groupBy(_._1).foreach { case (q, rs) =>
      assert(rs.map(_._2).sorted.toSeq == (1L to rs.length).toSeq, s"q$q ranks not dense")
      val sims = rs.sortBy(_._2).map(_._4)
      sims.zip(sims.tail).foreach { case (a, b) => assert(a >= b, s"q$q sims not ordered") }
      assert(rs.forall(_._3 != q), s"q$q returned itself")
    }
    // backfill law: every surviving query returns a full top-K whenever
    // its probed cells hold >= K survivors (they do on this fixture)
    assert(got.groupBy(_._1).forall(_._2.length == ExtraQueries23.TombK))
  }

  test("m20: exactly the planted 13th assets flag truncated, with the exact byte delta") {
    val rows = run("m20_payload_integrity").collect()
      .map(r => (r.getLong(0), r.getLong(2), r.getLong(3), r.getLong(4), r.getString(5)))
    assert(rows.nonEmpty)
    rows.foreach { case (id, manifest, actual, delta, verdict) =>
      assert(delta == manifest - actual)
      if (id % 13 == 5) {
        assert(verdict == "truncated", s"planted asset $id not flagged")
        assert(actual == manifest / 2, s"asset $id truncation is not half: $actual vs $manifest")
      } else {
        assert(verdict == "ok" && delta == 0L, s"clean asset $id misflagged")
      }
    }
    assert(rows.exists(_._1 % 13 == 5), "no planted asset in fixture range")
  }

  test("r121: shares are a partition of unity per region and overall") {
    val rows = run("r121_pct_of_parent").collect()
      .map(r => (r.getString(0), r.getString(1), r.getDouble(2), r.getDouble(3), r.getDouble(4)))
    assert(rows.nonEmpty)
    rows.groupBy(_._1).foreach { case (region, ns) =>
      val s = ns.map(_._4).sum
      assert(math.abs(s - 1.0) < 1e-4, s"$region nation shares sum to $s")
    }
    val total = rows.map(_._5).sum
    assert(math.abs(total - 1.0) < 1e-4, s"total shares sum to $total")
    // share ratios are consistent: pct_of_total / pct_of_region ~ region mass
    val revTotal = rows.map(_._3).sum
    rows.groupBy(_._1).foreach { case (_, ns) =>
      val regionMass = ns.map(_._3).sum / revTotal
      ns.filter(_._4 > 0.01).foreach { n =>
        assert(math.abs(n._5 / n._4 - regionMass) < 1e-2) }
    }
  }
}
