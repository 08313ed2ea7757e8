package graft.queries

import scala.concurrent.{Await, Future}
import scala.concurrent.duration._
import scala.concurrent.ExecutionContext.Implicits.global

import org.scalatest.funsuite.AnyFunSuite
import graft.SparkTestSession

/** Concurrent-registry smoke (r10 verdict stretch 9).
  *
  * LoopIsolationSpec proves one loop kernel and one window query
  * coexist; this widens the claim: FIXED pairs of registry queries run
  * concurrently on one SparkContext and must produce exactly their
  * serial results. The pairs are chosen adversarially — each includes
  * a session-conf-sensitive participant (a LoopSession private-conf
  * clone kernel, the r58 recursion-limit clone, a SharedPools consumer)
  * against a plain Catalyst query, because conf races and pool
  * first-touch races are the two ways concurrency has actually broken
  * engines of this shape. Pairs are FIXED, not sampled: a flaky
  * generator would turn a real race into an unreproducible report.
  */
class ConcurrentRegistrySpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  private val sf = "/root/testdata/sf0.001"

  private def rows(name: String): Seq[Seq[Any]] =
    graft.SparkEntry.queries(name)(spark, sf)
      .collect().map(_.toSeq.toList).toList

  private val pairs = Seq(
    // private-conf loop kernel (AQE off, loop-sized shuffle partitions
    // on a LoopSession clone) vs a windowed aggregate on session conf
    ("s12_pagerank", "q10_window_running"),
    // pool-of-pools consumer (jaccard -> clusters) vs a calendar window
    ("d08_dedup_clusters", "r96_autocorrelation"),
    // recursion-limit clone (execution-time conf read) vs packing cumsum
    ("r58_recursive_reach", "p03_sequence_packing"),
    // LPA loop vs the counting-method calibration (distinct-domain agg)
    ("s23_communities", "t31_calibration"))

  test("adversarial registry pairs produce serial-identical results when run concurrently") {
    pairs.foreach { case (a, b) =>
      val serialA = rows(a)
      val serialB = rows(b)
      val fa = Future(rows(a))
      val fb = Future(rows(b))
      val (ca, cb) = (Await.result(fa, 10.minutes), Await.result(fb, 10.minutes))
      assert(ca == serialA, s"$a diverged under concurrency with $b")
      assert(cb == serialB, s"$b diverged under concurrency with $a")
    }
  }
}
