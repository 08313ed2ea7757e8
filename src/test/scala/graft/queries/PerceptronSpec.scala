package graft.queries

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions.col
import graft.SparkTestSession

/** Hand-pins for the t18 batch-perceptron quality-classifier trainer
  * beyond the oracle match: an independent single-threaded replay of
  * the integer training contract on a constructed corpus, and
  * non-vacuity/determinism properties on the fixture. */
class PerceptronSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  private val sf = "/root/testdata/sf0.001"

  /** Independent replay — same arithmetic, zero shared code with the
    * distributed trainer. Features (1, n_tokens, n_distinct, n_chars);
    * label -1 iff 5*(n_tokens - n_distinct) >= n_tokens. */
  private def refTrain(docs: Seq[String], rounds: Int): Seq[(Int, Long, Long, Long, Long, Long)] = {
    val feats = docs.map { text =>
      val t = text.split(" ", -1)
      val x = Array(1L, t.length.toLong, t.distinct.length.toLong, text.length.toLong)
      val y = if (5L * (x(1) - x(2)) >= x(1)) -1L else 1L
      (x, y)
    }
    var w = Array(0L, 0L, 0L, 0L)
    val out = scala.collection.mutable.ArrayBuffer[(Int, Long, Long, Long, Long, Long)]()
    def nMis = feats.count { case (x, y) =>
      y * (0 to 3).map(j => w(j) * x(j)).sum <= 0
    }.toLong
    for (r <- 1 to rounds) {
      val mis = feats.filter { case (x, y) => y * (0 to 3).map(j => w(j) * x(j)).sum <= 0 }
      out += ((r - 1, w(0), w(1), w(2), w(3), mis.size.toLong))
      w = w.zipWithIndex.map { case (wj, j) => wj + mis.map { case (x, y) => y * x(j) }.sum }
    }
    out += ((rounds, w(0), w(1), w(2), w(3), nMis))
    out.toSeq
  }

  test("t18: distributed trainer matches the independent integer replay exactly") {
    import spark.implicits._
    val docsSeq = Seq(
      "a a a a a",        // 5 tokens, 1 distinct -> y = -1
      "b c d e",          // clean -> y = +1
      "x x y z",          // 4 tokens, 3 distinct: 5*1 >= 4 -> y = -1
      "p q r s t u v w",  // clean -> y = +1
      "m m m n n n")      // 6 tokens, 2 distinct -> y = -1
    val corpus = docsSeq.zipWithIndex.map { case (t, i) => (i.toLong, t) }.toDF("doc_id", "text")
    val got = TextQueries.perceptronTrain(corpus, 4).collect()
      .map(r => (r.getInt(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5))).toSeq
    val want = refTrain(docsSeq, 4)
    assert(got == want, s"got $got want $want")
    // training must actually move the weights off zero
    assert(got.last._2 != 0L || got.last._3 != 0L || got.last._4 != 0L || got.last._5 != 0L)
  }

  test("t31: calibration buckets partition the corpus and match brute force") {
    val feats = TextQueries.perceptronFeats(
      graft.Tables.documents(spark, sf).select(col("doc_id"), col("text")))
    val w = TextQueries.perceptronRun(feats, TextQueries.PerceptronRounds)
    val margins = feats.collect().map { r =>
      val xs = Array(r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))
      (xs.indices.map(i => w(i) * xs(i)).sum, r.getLong(5))
    }
    feats.unpersist()
    val n = margins.length
    // brute-force decile map: bucket(m) = ceil(10 * cum(m) / n)
    val cumByMargin = margins.map(_._1).groupBy(identity)
      .map { case (m, xs) => m -> xs.length }.toSeq.sortBy(_._1)
      .scanLeft((Long.MinValue, 0L)) { case ((_, acc), (m, c)) => (m, acc + c) }.drop(1).toMap
    def bucket(m: Long) = (10L * cumByMargin(m) + n - 1) / n
    val brute = margins.groupBy(t => bucket(t._1)).map { case (b, xs) =>
      b -> (xs.length.toLong, xs.count(_._2 == 1L).toLong)
    }
    val rows = graft.SparkEntry.queries("t31_calibration")(spark, sf).collect()
    assert(rows.map(_.getLong(1)).sum == n.toLong, "buckets partition the corpus")
    rows.foreach { r =>
      val (bn, bp) = brute(r.getLong(0))
      assert(r.getLong(0) >= 1 && r.getLong(0) <= 10)
      assert(r.getLong(1) == bn && r.getLong(2) == bp, s"bucket ${r.getLong(0)}")
      assert(r.getDouble(3) >= 0.0 && r.getDouble(3) <= 1.0)
    }
  }

  test("t18: fixture run is non-vacuous and rerun-stable") {
    def run() = graft.SparkEntry.queries("t18_perceptron_quality")(spark, sf).collect()
      .map(r => (r.getInt(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5))).toSeq
    val a = run()
    assert(a == run())
    assert(a.length == TextQueries.PerceptronRounds + 1)
    // round 0: zero weights classify every doc as a mistake
    val total = graft.Tables.documents(spark, sf).count()
    assert(a.head == ((0, 0L, 0L, 0L, 0L, total)))
    // both label classes survive training rounds (weights keep updating
    // on a non-empty error set, but never on the FULL corpus again)
    assert(a.tail.forall(r => r._6 > 0 && r._6 < total))
  }
}
