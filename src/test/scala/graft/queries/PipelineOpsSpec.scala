package graft.queries

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.SparkTestSession

/** Adversarial properties for the training-set assembly operators
  * (split/sample/repetition/decontamination) beyond the oracle match. */
class PipelineOpsSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  private val sf = "/root/testdata/sf0.001"

  private def run(name: String) = graft.SparkEntry.queries(name)(spark, sf)

  test("hash split: ~80/10/10, exhaustive, and stable across executions") {
    val a = run("p01_hash_split").collect().map(r => r.getLong(0) -> r.getString(2))
    val b = run("p01_hash_split").collect().map(r => r.getLong(0) -> r.getString(2))
    assert(a.sameElements(b)) // deterministic: same doc -> same split, always
    val n = a.length.toDouble
    val frac = a.groupBy(_._2).view.mapValues(_.length / n).toMap
    assert(math.abs(frac("train") - 0.80) < 0.06, s"train=${frac("train")}")
    assert(math.abs(frac("val") - 0.10) < 0.05, s"val=${frac("val")}")
    assert(math.abs(frac("test") - 0.10) < 0.05, s"test=${frac("test")}")
    assert(a.length == graft.Tables.documents(spark, sf).count()) // no doc dropped
  }

  test("stratified sample: every stratum lands near the 12% target") {
    run("p02_stratified_sample").collect().foreach { r =>
      val rate = r.getDouble(3)
      val n = r.getLong(2).toDouble
      // binomial 4-sigma band: small fixture strata (~80 docs) wobble,
      // but a salt/threshold bug lands far outside this envelope
      val tol = 4 * math.sqrt(0.12 * 0.88 / n)
      assert(math.abs(rate - 0.12) < math.max(tol, 0.02),
        s"lang=${r.getString(0)} n=$n rate=$rate tol=$tol")
    }
  }

  test("split and sample buckets are independent (different salts)") {
    // If the salts collided, sampled docs would all fall in the same
    // splits-prefix; instead the sample must straddle train/val/test.
    val split = run("p01_hash_split").select("doc_id", "split").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    val sampledSplits = graft.Tables.documents(spark, sf)
      .select(col("doc_id"))
      .filter(conv(substring(md5(concat(lit("sample:"), col("doc_id").cast("string"))), 1, 6), 16, 10)
        .cast("long") % 1000 < 120)
      .collect().map(r => split(r.getLong(0))).toSet
    assert(sampledSplits.size > 1, "sample fell entirely inside one split")
  }

  test("repetition quality: hand-computed fractions for one document") {
    val row = run("t10_repetition_quality").filter(col("doc_id") === 0).collect().head
    val text = graft.Tables.documents(spark, sf).filter(col("doc_id") === 0)
      .select("text").collect().head.getString(0)
    val w = text.split(" ")
    val dup = 1.0 - w.distinct.length.toDouble / w.length
    val topBg = w.sliding(2).map(_.mkString(" ")).toSeq
      .groupBy(identity).values.map(_.size).max.toDouble / (w.length - 1)
    assert(math.abs(row.getDouble(1) - dup) < 1e-12)
    assert(math.abs(row.getDouble(2) - topBg) < 1e-12)
    assert(row.getBoolean(3) == (dup <= 0.6 && topBg <= 0.18))
  }

  test("sequence packing: bin assignment re-derived from a sequential fold") {
    val got = run("p03_sequence_packing").collect()
      .map(r => (r.getString(0), r.getLong(1)) -> (r.getLong(2), r.getLong(3))).toMap
    val docs = graft.Tables.documents(spark, sf)
      .select(col("source"), col("doc_id"), size(split(col("text"), " ")).cast("long").as("n"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    val assigned: Seq[((String, Long), Long)] = docs.groupBy(_._1).toSeq.flatMap {
      case (src, ds) =>
        var cum = 0L
        ds.sortBy(_._2).toSeq.map { case (_, _, n) =>
          val bin = cum / 2048; cum += n; ((src, bin), n)
        }
    }
    val want = assigned.groupBy(_._1).map { case (k, vs) =>
      k -> ((vs.size.toLong, vs.map(_._2).sum))
    }
    assert(got == want && got.nonEmpty)
    // bins are contiguous from 0 per source
    got.keys.groupBy(_._1).values.foreach { bins =>
      val ids = bins.map(_._2).toSeq.sorted
      assert(ids == (0L until ids.size).toSeq)
    }
  }

  test("decontamination: flagged docs truly share >=3 shingles with src0") {
    val flagged = run("d07_decontaminate").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(flagged.nonEmpty, "fixture has no contaminated doc; spec is vacuous")
    val docs = graft.Tables.documents(spark, sf)
      .select("doc_id", "source", "text").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2)))
    def shingles(t: String): Set[String] = {
      val w = t.split(" ")
      if (w.length < 5) Set.empty else w.sliding(5).map(_.mkString(" ")).toSet
    }
    val bench = docs.filter(_._2 == "src0").map(d => d._1 -> shingles(d._3))
    val byId = docs.map(d => d._1 -> d).toMap
    flagged.foreach { case (trainId, nHits, worst) =>
      assert(byId(trainId)._2 != "src0", s"$trainId is a benchmark doc")
      val overlaps = bench.map { case (_, bs) => (shingles(byId(trainId)._3) & bs).size }
        .filter(_ >= 3)
      assert(overlaps.size == nHits, s"$trainId hits: got $nHits want ${overlaps.size}")
      assert(overlaps.max == worst, s"$trainId worst: got $worst want ${overlaps.max}")
    }
  }
}
