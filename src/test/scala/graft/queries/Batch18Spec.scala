package graft.queries

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.SparkTestSession

/** Oracle-independent invariants for batch 18: a driver replay of the
  * cross-correlation at spot lags, and the media manifest's consistency
  * with its component pipelines.
  */
class Batch18Spec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  private val sf = "/root/testdata/sf0.001"

  test("r113: lag-0 arm equals the r67-style Pearson on the dense grid; replay at lag 2") {
    val rows = graft.SparkEntry.queries("r113_crosscorr")(spark, sf).collect()
      .map(r => ((r.getString(0), r.getString(1), r.getLong(2)), (r.getLong(3), r.getDouble(4))))
      .toMap
    assert(rows.nonEmpty && rows.keySet.map(_._3) == (-3L to 3L).toSet)
    val daily = graft.Tables.orders(spark, sf)
      .join(graft.Tables.customer(spark, sf), col("o_custkey") === col("c_custkey"))
      .join(graft.Tables.nation(spark, sf), col("c_nationkey") === col("n_nationkey"))
      .join(graft.Tables.region(spark, sf), col("n_regionkey") === col("r_regionkey"))
      .groupBy(col("r_name"), to_date(col("o_orderdate")).as("day"))
      .agg(sum(col("o_totalprice").cast(org.apache.spark.sql.types.DecimalType(12, 2)) * 100)
        .cast("long").as("x"))
      .collect().map(r => (r.getString(0), r.getDate(1).toLocalDate, r.getLong(2)))
    val lo = daily.map(_._2.toEpochDay).min
    val hi = daily.map(_._2.toEpochDay).max
    val regions = daily.map(_._1).distinct.sorted
    val series = regions.map { rg =>
      val m = daily.filter(_._1 == rg).map(t => t._2.toEpochDay -> t._3).toMap
      rg -> (lo to hi).map(dd => m.getOrElse(dd, 0L)).toArray
    }.toMap
    def pearson(xs: Array[Long], ys: Array[Long]): Double = {
      val (sx, sy) = (xs.map(BigInt(_)).sum, ys.map(BigInt(_)).sum)
      val sxy = xs.zip(ys).map { case (a, b) => BigInt(a) * b }.sum
      val sxx = xs.map(a => BigInt(a) * a).sum
      val syy = ys.map(b => BigInt(b) * b).sum
      val num = (BigInt(xs.length) * sxy - sx * sy).toDouble
      val dx = (BigInt(xs.length) * sxx - sx * sx).toDouble
      val dy = (BigInt(xs.length) * syy - sy * sy).toDouble
      num / math.sqrt(dx * dy)
    }
    for (i <- regions.indices; j <- (i + 1) until regions.length) {
      val (ra, rb) = (regions(i), regions(j))
      val (a, b) = (series(ra), series(rb))
      val exp0 = pearson(a, b)
      assert(math.abs(rows((ra, rb, 0L))._2 - exp0) < 1e-5, s"($ra,$rb) lag 0")
      val exp2 = pearson(a.dropRight(2), b.drop(2))
      assert(math.abs(rows((ra, rb, 2L))._2 - exp2) < 1e-5, s"($ra,$rb) lag 2")
      assert(rows((ra, rb, 2L))._1 == a.length.toLong - 2, s"($ra,$rb) lag-2 overlap size")
    }
  }

  test("m17: every asset has exactly one verdict consistent with its component pipeline") {
    val manifest = graft.SparkEntry.queries("m17_media_manifest")(spark, sf).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2), r.getString(3)))
    val docs = graft.Tables.documents(spark, sf).select("doc_id", "source").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(manifest.map(_._1).toSet == docs.keySet, "one manifest row per asset")
    assert(manifest.length == docs.size, "no duplicate verdicts")
    // phash dedup applies to REAL duplicate structure only: replay the
    // closure over the registered pair relation with probe ids excluded
    // BEFORE components (a driver union-find — the expected duplicate
    // set is DERIVED from the fixture, never assumed non-empty; sf0.001
    // legitimately has zero real-real phash pairs).
    val realPairs = graft.SparkEntry.queries("m10_phash_pairs")(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1)))
      .filter { case (a, b) => a < 1000000000L && b < 1000000000L }
    val parent = scala.collection.mutable.Map[Long, Long]()
    def find(x: Long): Long = {
      val p = parent.getOrElse(x, x)
      if (p == x) x else { val r = find(p); parent(x) = r; r }
    }
    realPairs.foreach { case (a, b) =>
      val (ra, rb) = (find(a), find(b))
      if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
    }
    val members = (realPairs.map(_._1) ++ realPairs.map(_._2)).toSet
    val clusters = members.map(id => id -> find(id)).toMap
    val dupIds = clusters.filter { case (id, c) => c != id }.keySet
    assert(manifest.count(_._4 == "phash_duplicate") == dupIds.size,
      "every real duplicate member (and nothing else) carries the dedup reason")
    manifest.filter(t => dupIds(t._1)).foreach { case (id, _, verdict, reason) =>
      assert(verdict == "drop" && reason == "phash_duplicate", s"dup $id")
    }
    // image survivors: keeper/unique split matches the real-only closure
    manifest.filter(t => docs(t._1) == "src0" && !dupIds(t._1))
      .foreach { case (id, mime, verdict, reason) =>
        assert(mime == "image/png" && verdict == "keep", s"img $id")
        assert(reason == (if (clusters.contains(id)) "cluster_keeper" else "unique"), s"img $id")
      }
    // audio survivors follow the m15 silence rule
    val trims = graft.SparkEntry.queries("m15_silence_trim")(spark, sf).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(5))).toMap
    manifest.filter(t => docs(t._1) == "src1" && !dupIds(t._1))
      .foreach { case (id, mime, verdict, reason) =>
        assert(mime == "audio/wav")
        trims.get(id) match {
          case Some((nf, ret)) if ret * 2 >= nf =>
            assert(verdict == "keep" && reason == "voiced", s"aud $id")
          case Some(_) => assert(verdict == "drop" && reason == "mostly_silence", s"aud $id")
          case None => assert(verdict == "drop" && reason == "undecodable", s"aud $id")
        }
      }
    val byMime = manifest.groupBy(_._2)
    assert(byMime("image/png").exists(_._3 == "keep"))
    assert(byMime("video/mp4").exists(_._3 == "keep"))
  }
}
