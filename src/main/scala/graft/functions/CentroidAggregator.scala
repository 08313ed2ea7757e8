package graft.functions

import org.apache.spark.sql.{Column, Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions.udaf

/** Typed UDAF (SURVEY.md §2.3 UDAF row): element-wise mean of a
  * float-vector column via `Aggregator[IN, BUF, OUT]`.
  *
  * The buffer is (running sums, count); merge is element-wise — the
  * standard partial-aggregation shape, so Spark combines map-side before
  * the shuffle exactly like a built-in aggregate. Used for label
  * centroids (cluster representatives) in embedding pipelines; the
  * decimal-exact oracle variant lives in SimilarityQueries.s04, this is
  * the ergonomic API form.
  */
object CentroidAggregator extends Aggregator[Array[Float], (Array[Double], Long), Array[Double]] {

  override def zero: (Array[Double], Long) = (Array.empty[Double], 0L)

  override def reduce(b: (Array[Double], Long), v: Array[Float]): (Array[Double], Long) = {
    val sums = if (b._1.isEmpty) new Array[Double](v.length) else b._1
    var i = 0
    while (i < v.length) { sums(i) += v(i); i += 1 }
    (sums, b._2 + 1)
  }

  override def merge(a: (Array[Double], Long), b: (Array[Double], Long)): (Array[Double], Long) = {
    if (a._1.isEmpty) b
    else if (b._1.isEmpty) a
    else {
      var i = 0
      while (i < a._1.length) { a._1(i) += b._1(i); i += 1 }
      (a._1, a._2 + b._2)
    }
  }

  override def finish(r: (Array[Double], Long)): Array[Double] =
    if (r._2 == 0) Array.empty[Double] else r._1.map(_ / r._2)

  override def bufferEncoder: Encoder[(Array[Double], Long)] =
    Encoders.tuple(Encoders.javaSerialization[Array[Double]], Encoders.scalaLong)

  override def outputEncoder: Encoder[Array[Double]] = ExpressionEncoderHelper.doubleArray

  /** Column form for DataFrame use: `df.groupBy(...).agg(centroid($"v"))` */
  val centroid: org.apache.spark.sql.expressions.UserDefinedFunction = udaf(this)

  def apply(c: Column): Column = centroid(c)
}

private object ExpressionEncoderHelper {
  import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
  val doubleArray: Encoder[Array[Double]] =
    ExpressionEncoder[Array[Double]]()(scala.reflect.runtime.universe.typeTag[Array[Double]])
}
