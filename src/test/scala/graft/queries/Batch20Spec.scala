package graft.queries

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.SparkTestSession

/** Oracle-independent invariants for round-8 batch 22 + d25: estimator
  * identities, probe-structure laws, and driver formula replays.
  */
class Batch20Spec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  private val sf = "/root/testdata/sf0.001"

  test("d25: bit packing matches the signatures; identical docs agree on every bit") {
    val rows = graft.SparkEntry.queries("d25_bbit_minhash")(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getLong(3), r.getDouble(4)))
    assert(rows.nonEmpty)
    rows.foreach { case (_, _, j, agree, est) =>
      assert(agree >= 0 && agree <= 64)
      assert(est >= 0.0 && est <= 1.0)
      // exact duplicates have identical signatures, so all 64 bits agree
      if (j == 1.0) assert(agree == 64L, "jaccard-1 pair must agree on every bit")
      // estimate definition: max(0, 2*agree/64 - 1) rounded to 4dp
      val want = BigDecimal(math.max(0.0, agree.toDouble * 2 / 64 - 1))
        .setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble
      assert(math.abs(est - want) < 1e-12)
    }
    // replay the 1-bit packing from the registered signature relation
    val sigs = DedupQueries.minhashSignatures(spark, sf).collect()
      .map(r => r.getLong(0) -> r.getSeq[Long](1)).toMap
    val (d1, d2, _, agree, _) = rows.head
    val want = (0 until 64).count(j => sigs(d1)(j) % 2 == sigs(d2)(j) % 2)
    assert(agree == want.toLong, s"pair ($d1,$d2) agreement replay")
  }

  test("m19: planted probe structure is recovered and exact copies collide at hamming 0") {
    val pairs = graft.SparkEntry.queries("m19_audio_fingerprint")(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    val audioIds = graft.Tables.documents(spark, sf)
      .filter(col("source") === "src1").select("doc_id")
      .orderBy("doc_id").limit(2).collect().map(_.getLong(0))
    assert(audioIds.length == 2)
    audioIds.foreach { id =>
      assert(pairs.get((id, id + 1000000000L)).contains(0L),
        s"exact probe copy of $id must collide at hamming 0")
      assert(pairs.contains((id, id + 2000000000L)) &&
        pairs((id, id + 2000000000L)) <= 3L,
        s"perturbed probe copy of $id must be within the hamming radius")
    }
    // every emitted pair respects the radius (candidates are verified)
    pairs.values.foreach(h => assert(h >= 0L && h <= 3L))
  }

  test("u26: estimates and the true join size match a driver formula replay") {
    val out = graft.SparkEntry.queries("u26_join_estimate")(spark, sf).collect()
      .map(r => r.getString(0) -> r).toMap
    def hist(tab: String, key: String): Map[Long, Long] = {
      val df = tab match {
        case "events" => graft.Tables.events(spark, sf)
        case "lineitem" => graft.Tables.lineitem(spark, sf)
        case "orders" => graft.Tables.orders(spark, sf)
        case "customer" => graft.Tables.customer(spark, sf)
      }
      df.groupBy(col(key)).count().collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    }
    ExtraQueries20.EstEdges.foreach { case (name, lt, lk, rt, rk) =>
      val hl = hist(lt, lk); val hr = hist(rt, rk)
      val (nL, ndvL) = (hl.values.sum, hl.size.toLong)
      val (nR, ndvR) = (hr.values.sum, hr.size.toLong)
      val actual = hl.map { case (k, c) => c * hr.getOrElse(k, 0L) }.sum
      val topOf = (h: Map[Long, Long]) =>
        h.toSeq.sortBy { case (k, c) => (-c, k) }.take(ExtraQueries20.EstTopH).map(_._1)
      val topKeys = (topOf(hl) ++ topOf(hr)).distinct
      val exactPart = topKeys.map(k => hl.getOrElse(k, 0L) * hr.getOrElse(k, 0L)).sum
      val (topCl, topCr) = (topKeys.map(hl.getOrElse(_, 0L)).sum, topKeys.map(hr.getOrElse(_, 0L)).sum)
      val (kL, kR) = (topKeys.count(hl.contains).toLong, topKeys.count(hr.contains).toLong)
      val estU = math.round(nL.toDouble * nR / math.max(ndvL, ndvR))
      val tailNdv = math.max(ndvL - kL, ndvR - kR)
      val estH = exactPart + (if (tailNdv > 0)
        math.round((nL - topCl).toDouble * (nR - topCr) / tailNdv) else 0L)
      val r = out(name)
      assert(r.getLong(5) == actual, s"$name actual")
      assert(r.getLong(6) == estU, s"$name est_uniform")
      assert(r.getLong(7) == estH, s"$name est_hybrid")
    }
    // the self-join edge is the uniform estimator's failure mode: the
    // hybrid must be at least as accurate there
    val self = out("events_self_user")
    assert(math.abs(self.getDouble(9)) <= math.abs(self.getDouble(8)),
      "hybrid estimate should not be worse than uniform on the skew edge")
  }
}
