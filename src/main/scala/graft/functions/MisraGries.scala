package graft.functions

import org.apache.spark.sql.{Column, Encoder}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions.udaf

/** Misra-Gries frequent-items sketch as a typed `Aggregator` — the
  * bounded-memory first pass of heavy-hitter detection at corpus scale,
  * next to r28's HLL in the sketch family.
  *
  * The buffer holds at most `k` counters regardless of input size.
  * `reduce` is the classic stream update (hit: +1; room: insert; full:
  * decrement every counter, dropping zeros). `merge` is the mergeable-
  * summaries form (Agarwal et al., PODS'12): pointwise-sum both maps,
  * then subtract the (k+1)-th largest count from everything and keep
  * the positive remainder — which preserves the error bound under ANY
  * combine tree, so map-side partial aggregation works exactly like a
  * built-in aggregate and the shuffle carries ≤ k counters per task.
  *
  * Guarantee (spec-pinned in MisraGriesSpec): with n total items,
  *   true_count − n/(k+1)  ≤  estimate  ≤  true_count
  * and every item with true_count > n/(k+1) is present in the summary.
  * The sketch itself is partitioning-dependent (which light items
  * survive varies), so query-level use is the two-pass shape: sketch →
  * candidate set (≤ k, driver-small by construction) → one exact
  * confirmation pass filtered to candidates — deterministic, oracled
  * end-to-end as t13.
  */
class MisraGries(k: Int) extends Aggregator[String, Map[String, Long], Map[String, Long]] {
  require(k > 0, "capacity must be positive")

  override def zero: Map[String, Long] = Map.empty

  override def reduce(b: Map[String, Long], item: String): Map[String, Long] =
    b.get(item) match {
      case Some(c) => b.updated(item, c + 1L)
      case None if b.size < k => b.updated(item, 1L)
      case None => b.collect { case (i, c) if c > 1L => i -> (c - 1L) }
    }

  override def merge(a: Map[String, Long], b: Map[String, Long]): Map[String, Long] = {
    if (a.isEmpty) b
    else if (b.isEmpty) a
    else {
      val sum = (a.keySet ++ b.keySet).iterator
        .map(i => i -> (a.getOrElse(i, 0L) + b.getOrElse(i, 0L))).toMap
      if (sum.size <= k) sum
      else {
        val kth = sum.values.toIndexedSeq.sorted(Ordering[Long].reverse)(k)
        sum.collect { case (i, c) if c > kth => i -> (c - kth) }
      }
    }
  }

  override def finish(b: Map[String, Long]): Map[String, Long] = b

  override def bufferEncoder: Encoder[Map[String, Long]] = MisraGries.mapEncoder
  override def outputEncoder: Encoder[Map[String, Long]] = MisraGries.mapEncoder
}

object MisraGries {
  private[functions] val mapEncoder: Encoder[Map[String, Long]] = {
    import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
    ExpressionEncoder[Map[String, Long]]()(scala.reflect.runtime.universe.typeTag[Map[String, Long]])
  }

  /** Column form: `df.agg(MisraGries.sketch(256)(col("token")))`. */
  def sketch(k: Int): Column => Column = {
    val u = udaf(new MisraGries(k))
    c => u(c)
  }
}
