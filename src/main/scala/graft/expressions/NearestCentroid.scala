package graft.expressions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, FloatType, IntegerType}

/** Argmin-centroid id over a vector column — the assignment step of
  * k-means / IVF / product-quantization encoding, as ONE loop.
  *
  * Why an Expression and not a column composition: the equivalent
  * `least(struct(sqDist, id), ...)` unrolls k×dim element_at terms into
  * generated Java. A PQ encode projection (8 subspaces × 16 centroids ×
  * 8 dims) produced a 17k-line generated file that janino refused to
  * compile, dropping the whole stage to interpreted mode. Here the
  * codebook rides along as a `double[]` reference object and both eval
  * paths run a constant ~20-line nested loop — codegen size is O(1) in
  * k and dim, and the projection stays inside whole-stage codegen at
  * any codebook size.
  *
  * Semantics (identical to the struct-least composition, spec-pinned):
  * squared-L2 distance in double over elements [offset, offset+dim);
  * ties break to the lowest centroid id (centroids are stored sorted by
  * id and the comparison is strict `<`). Null in → null out; an array
  * shorter than offset+dim → null. Element type may be float or double.
  *
  * `offset` lets PQ subspace encoding read a window of the full vector
  * in place — no `slice` copies feeding M separate expressions.
  */
case class NearestCentroid(
    child: Expression,
    ids: Seq[Int],
    cents: Seq[Seq[Double]],
    offset: Int) extends UnaryExpression {

  require(ids.nonEmpty && ids.length == cents.length, "ids/cents length mismatch")
  require(ids.sliding(2).forall(p => p.length < 2 || p(0) < p(1)),
    "centroid ids must be strictly ascending (tie-break contract)")

  @transient private lazy val dim: Int = cents.head.length
  @transient private lazy val idArr: Array[Int] = ids.toArray
  @transient private lazy val flat: Array[Double] = {
    require(cents.forall(_.length == dim), "ragged centroid matrix")
    cents.flatten.toArray
  }
  @transient private lazy val elemIsFloat: Boolean =
    child.dataType.asInstanceOf[ArrayType].elementType == FloatType

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(FloatType, _) | ArrayType(DoubleType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"nearest_centroid expects array<float|double>, got $other")
  }

  override def dataType: DataType = IntegerType
  override def nullable: Boolean = true

  override def nullSafeEval(input: Any): Any = {
    val v = input.asInstanceOf[ArrayData]
    if (v.numElements() < offset + dim) null
    else {
      var best = Double.PositiveInfinity
      var bestId = idArr(0)
      var c = 0
      while (c < idArr.length) {
        var d = 0.0
        var j = 0
        while (j < dim) {
          val x = (if (elemIsFloat) v.getFloat(offset + j).toDouble
                   else v.getDouble(offset + j)) - flat(c * dim + j)
          d += x * x
          j += 1
        }
        if (d < best) { best = d; bestId = idArr(c) }
        c += 1
      }
      bestId
    }
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a => {
      val flatRef = ctx.addReferenceObj("cents", flat, "double[]")
      val idsRef = ctx.addReferenceObj("ids", idArr, "int[]")
      val c = ctx.freshName("c"); val j = ctx.freshName("j")
      val d = ctx.freshName("d"); val x = ctx.freshName("x")
      val best = ctx.freshName("best"); val bestId = ctx.freshName("bestId")
      val getter = if (elemIsFloat) s"(double) $a.getFloat($offset + $j)"
                   else s"$a.getDouble($offset + $j)"
      s"""
         |if ($a.numElements() < ${offset + dim}) {
         |  ${ev.isNull} = true;
         |} else {
         |  double $best = Double.POSITIVE_INFINITY;
         |  int $bestId = $idsRef[0];
         |  for (int $c = 0; $c < ${idArr.length}; $c++) {
         |    double $d = 0.0;
         |    for (int $j = 0; $j < $dim; $j++) {
         |      final double $x = ($getter) - $flatRef[$c * $dim + $j];
         |      $d += $x * $x;
         |    }
         |    if ($d < $best) { $best = $d; $bestId = $idsRef[$c]; }
         |  }
         |  ${ev.value} = $bestId;
         |}
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)

  override def prettyName: String = "nearest_centroid"
}
