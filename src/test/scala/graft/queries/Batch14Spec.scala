package graft.queries

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.SparkTestSession

/** Oracle-independent invariants for the batch-14 additions (s28 IVF
  * sweep, d24 closure dilution, t36 fertility, p27 padding waste).
  */
class Batch14Spec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  private val sf = "/root/testdata/sf0.001"

  test("s28: recall is monotone in nprobe and the nprobe=2 arm IS s11's ivf recall") {
    val rows = graft.SparkEntry.queries("s28_ivf_sweep")(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    val byProbe = rows.groupBy(_._1).map { case (np, v) =>
      np -> v.map(t => t._2 -> t._3).toMap
    }
    assert(byProbe.keySet == SimilarityQueries.IvfSweepProbes.map(_.toLong).toSet)
    // monotone: more probed cells can only add candidates, never lose them
    val probes = SimilarityQueries.IvfSweepProbes.map(_.toLong).sorted
    probes.zip(probes.tail).foreach { case (lo, hi) =>
      byProbe(lo).foreach { case (q, hits) =>
        assert(byProbe(hi)(q) >= hits, s"q$q: recall@$hi < recall@$lo")
      }
    }
    // the shipped config's arm reproduces s11's ivf rows exactly
    val s11Ivf = graft.SparkEntry.queries("s11_ann_recall")(spark, sf).collect()
      .filter(_.getString(0) == "ivf").map(r => r.getLong(1) -> r.getLong(2)).toMap
    assert(byProbe(2L) == s11Ivf, "nprobe=2 sweep arm must equal the registered s11 grade")
  }

  test("d24: dilution accounting matches the cluster structure") {
    val rows = graft.SparkEntry.queries("d24_cluster_dilution")(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(rows.nonEmpty)
    rows.foreach { case (c, n, pairs, measured) =>
      assert(pairs == n * (n - 1) / 2, s"cluster $c: implied pair count")
      assert(measured >= n - 1, s"cluster $c: a component needs a spanning set of edges")
      assert(measured <= pairs, s"cluster $c: measured edges bounded by implied pairs")
    }
    // totals: every d03 pair lands in exactly one cluster
    val d03Pairs = graft.SparkEntry.queries("d03_ngram_jaccard")(spark, sf).count()
    assert(rows.map(_._4).sum == d03Pairs, "per-cluster measured edges partition the pair set")
    // cluster set matches d08
    val d08 = graft.SparkEntry.queries("d08_dedup_clusters")(spark, sf).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(rows.map(t => t._1 -> t._2).toMap == d08, "cluster ids/sizes must match d08")
  }

  test("t36: fertility rollup is consistent with the per-doc t17 encode") {
    val enc = graft.SparkEntry.queries("t17_bpe_encode")(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    val langs = graft.Tables.documents(spark, sf).select("doc_id", "lang").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    val expect = enc.groupBy(t => langs(t._1)).map { case (lang, v) =>
      lang -> (v.size.toLong, v.map(_._2).sum, v.map(_._3).sum, v.map(_._4).sum)
    }
    val got = graft.SparkEntry.queries("t36_bpe_fertility")(spark, sf).collect()
      .map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4), r.getDouble(5)))
    assert(got.map(_._1).toSet == expect.keySet)
    got.foreach { case (lang, (docs, words, chars, toks, fert)) =>
      assert((docs, words, chars, toks) == expect(lang), s"$lang rollup")
      assert(fert >= 1.0, s"$lang: BPE cannot emit fewer tokens than words")
    }
  }

  test("p27: padding laws hold and sorting never pads more than arrival order") {
    val rows = graft.SparkEntry.queries("p27_padding_waste")(spark, sf).collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2), r.getLong(3), r.getLong(4)))
    assert(rows.nonEmpty)
    val bySrc = rows.groupBy(_._2)
    bySrc.foreach { case (src, rs) =>
      val arrival = rs.find(_._1 == "arrival").get
      val sorted = rs.find(_._1 == "sorted").get
      assert(arrival._3 == sorted._3, s"$src: batch count is policy-independent")
      assert(arrival._4 == sorted._4, s"$src: token total is policy-independent")
      assert(sorted._5 <= arrival._5,
        s"$src: length-sorted batching must not pad more (${sorted._5} vs ${arrival._5})")
    }
    assert(rows.filter(_._1 == "sorted").map(_._5).sum <
      rows.filter(_._1 == "arrival").map(_._5).sum,
      "the audit must show a strict global padding win for sorting")
  }
}
