package graft.queries

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.SparkTestSession

/** Oracle-independent invariants for round-9 batch 26: driver replays
  * (skeleton fingerprints, run compression, the FIFO move plan) and
  * conservation/structure laws (dedup keeper rules, rebalance
  * conservation + post-state, waterfall reconciliation, mutual-kNN
  * symmetry).
  */
class Batch23Spec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  private val sf = "/root/testdata/sf0.001"

  private def run(name: String) = graft.SparkEntry.queries(name)(spark, sf)

  private def md5hex(s: String): String =
    java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString

  test("d27: families match a driver skeleton replay; families are non-identical texts") {
    val docs = graft.Tables.documents(spark, sf)
      .select(col("doc_id"), col("text")).collect()
      .map(r => (r.getLong(0), r.getString(1)))
    val skel = docs.map { case (id, text) =>
      val ls = text.split(" ", -1).take(ExtraQueries24.SkeletonK).map(_.length.toString)
      (id, md5hex(ls.mkString(",")), text)
    }
    val fams = skel.groupBy(_._2).filter(_._2.length > 1)
    val want = fams.values.flatMap { ms =>
      val keeper = ms.map(_._1).min
      ms.filter(_._1 != keeper).map(m => (m._1, keeper, ms.length.toLong))
    }.toSeq.sortBy(_._1)
    val got = run("d27_skeleton_dedup").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
    assert(got == want && got.nonEmpty, "skeleton families diverge from replay")
    // the operator must catch STRUCTURAL near-dups, not just exact
    // copies: at least one family has two distinct full texts
    assert(fams.values.exists(ms => ms.map(_._3).distinct.length > 1),
      "every skeleton family is an exact-dup family — d27 degenerates to d01 here")
  }

  test("t40: compression replays driver-side; runs exist and non-run docs keep everything") {
    val docs = graft.Tables.documents(spark, sf)
      .select(col("doc_id"), col("text")).collect()
      .map(r => (r.getLong(0), r.getString(1)))
    val want = docs.map { case (id, text) =>
      val toks = text.split(" ", -1)
      val kept = toks.zipWithIndex.filter { case (t, i) => i == 0 || toks(i - 1) != t }.map(_._1)
      (id, toks.length.toLong, kept.length.toLong, md5hex(kept.mkString(" ")))
    }.sortBy(_._1)
    val got = run("t40_run_compress").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getString(3)))
    assert(got.toSeq == want.toSeq, "run compression diverges from replay")
    assert(want.exists(t => t._3 < t._2), "fixture has no consecutive-token run — arm untested")
  }

  test("p32: moves replay FIFO matching; conservation + exact post-quota state") {
    val rows = run("p32_shard_rebalance").collect()
      .map(r => (r.getInt(0), r.getInt(1), r.getLong(2)))
    assert(rows.nonEmpty, "no imbalance on this fixture — rebalance arm untested")
    // driver replay: recompute sizes, quotas, and FIFO interval moves
    val sizes = graft.Tables.documents(spark, sf).select(col("doc_id")).collect()
      .map(r => {
        val hex = md5hex(s"shard:${r.getLong(0)}").substring(0, 6)
        (java.lang.Long.parseLong(hex, 16) % ExtraQueries24.RebShards).toInt
      })
      .groupBy(identity).view.mapValues(_.length.toLong).toMap
    val n = sizes.values.sum
    val S = ExtraQueries24.RebShards
    val all = (0 until S).map(sh => (sh, sizes.getOrElse(sh, 0L),
      n / S + (if (sh < n % S) 1L else 0L)))
    assert(all.map(_._3).sum == n, "quotas must partition the corpus")
    var dcum = 0L; var rcum = 0L
    val donors = all.filter(t => t._2 > t._3).map { t =>
      val lo = dcum; dcum += t._2 - t._3; (t._1, lo, dcum) }
    val recv = all.filter(t => t._2 < t._3).map { t =>
      val lo = rcum; rcum += t._3 - t._2; (t._1, lo, rcum) }
    val want = (for {
      (ds, dlo, dhi) <- donors; (rs, rlo, rhi) <- recv
      if dlo < rhi && rlo < dhi
    } yield (ds, rs, math.min(dhi, rhi) - math.max(dlo, rlo))).sorted
    assert(rows.toSeq.sorted == want, "move plan diverges from FIFO replay")
    // conservation: total moved equals total surplus equals total deficit
    assert(rows.map(_._3).sum == dcum && dcum == rcum, "moved != imbalance")
    // post-state: applying the plan lands every shard exactly on quota
    val post = scala.collection.mutable.Map(all.map(t => t._1 -> t._2): _*)
    rows.foreach { case (f, t, m) => post(f) -= m; post(t) += m }
    all.foreach { case (sh, _, q) => assert(post(sh) == q, s"shard $sh missed quota") }
  }

  test("r122: volume + price effects reconcile to the exact revenue delta") {
    val rows = run("r122_price_volume_waterfall").collect()
      .map(r => (r.getString(0), r.getInt(1), r.getDouble(2), r.getDouble(3),
        r.getDouble(4), r.getDouble(5)))
    assert(rows.nonEmpty)
    // Δrev = Δqty·p0 + Δp·q1 exactly; each effect is rounded at 4dp so
    // the reconciliation can drift at most 1e-4 total
    rows.foreach { case (nation, yr, _, drev, ve, pe) =>
      assert(math.abs(ve + pe - drev) < 2e-4,
        s"$nation/$yr: waterfall does not reconcile ($ve + $pe != $drev)")
    }
    // both effect signs occur somewhere — the decomposition separates
    // forces rather than mirroring the delta
    assert(rows.exists(r => r._5 * r._6 < 0), "volume and price effects never disagree")
    // every nation-year pair is consecutive by construction: yr-1 exists
    val have = rows.map(r => (r._1, r._2)).toSet
    val grain = rows.groupBy(_._1)
    assert(grain.values.forall(_.length >= 2), "each nation should have multiple year pairs")
    assert(rows.forall(r => r._2 >= 1996), "first fixture year has no prior")
    have.foreach { case (n, y) => assert(!have.contains((n, y)) || y > 1995) }
  }

  test("s32: mutual pairs are exactly the reciprocal edges; shared counts replay") {
    val knn = SimilarityQueries.knnPool(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(2), r.getLong(1), r.getDouble(3)))
    val edges = knn.map(t => (t._1, t._2)).toSet
    val nbrs = knn.groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    val got = run("s32_mutual_knn").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getLong(3),
        r.getLong(4), r.getLong(5), r.getDouble(6)))
    assert(got.nonEmpty, "no mutual pairs on this fixture")
    val wantPairs = edges.filter(e => e._1 < e._2 && edges.contains((e._2, e._1)))
    assert(got.map(t => (t._1, t._2)).toSet == wantPairs, "mutual pair set diverges")
    got.foreach { case (a, b, _, rkAb, rkBa, shared, jac) =>
      val rkA = knn.find(t => t._1 == a && t._2 == b).get._3
      val rkB = knn.find(t => t._1 == b && t._2 == a).get._3
      assert(rkAb == rkA && rkBa == rkB, s"($a,$b) rank annotation wrong")
      val common = (nbrs(a) intersect nbrs(b)) -- Set(a, b)
      assert(shared == common.size.toLong, s"($a,$b) shared-neighbor count wrong")
      val union = (nbrs(a) - b).size + (nbrs(b) - a).size - common.size
      val wantJ = math.rint(common.size.toDouble / math.max(union, 1).toDouble * 1e4) / 1e4
      assert(math.abs(jac - wantJ) < 1e-9, s"($a,$b) jaccard wrong: $jac vs $wantJ")
    }
    // asymmetric edges exist (hubness is real on this fixture): some
    // directed edge has no reciprocal — the filter actually filters
    assert(edges.exists(e => !edges.contains((e._2, e._1))),
      "every edge is reciprocal — mutual filter vacuous here")
  }
}
