package graft.expressions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression, XXH64}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._

/** Fused signature kernels for the dedup operators.
  *
  * Both replicate the exact hash family of the built-in composition they
  * replace (`xxhash64` with Spark's default seed 42), so outputs are
  * bit-identical to the `transform`/`array_min` and explode/aggregate
  * formulations (asserted in SignatureExpressionsSpec) — the LSH recall
  * characteristics measured against exact Jaccard carry over unchanged.
  *
  * Why native expressions (SURVEY.md §4 preference order): MinHash via
  * built-ins materializes 64 intermediate arrays per document and SimHash
  * needs two aggregation shuffles (token weights, then bit votes); the
  * fused kernels are a single pass per document, allocate one output
  * array (MinHash) or nothing (SimHash), and stay inside whole-stage
  * codegen — at 100 TB the signature stage becomes pure map work with no
  * exchange at all.
  */
object SignatureKernels {
  val Perms = 64
  private[expressions] val seed = 42L
  /** Per-permutation seed chain: xxhash64(lit(j), h) == hashLong(h, hashInt(j, 42)). */
  private[expressions] val permSeeds: Array[Long] =
    Array.tabulate(Perms)(j => XXH64.hashInt(j, seed))

  /** All 64 MinHash mins in one traversal of the shingle array. */
  def minhash(arr: ArrayData, seeds: Array[Long]): ArrayData = {
    val n = arr.numElements()
    val mins = Array.fill(Perms)(Long.MaxValue)
    var i = 0
    while (i < n) {
      if (!arr.isNullAt(i)) {
        val h = XXH64.hashUTF8String(arr.getUTF8String(i), seed)
        var j = 0
        while (j < Perms) {
          val v = XXH64.hashLong(h, seeds(j))
          if (v < mins(j)) mins(j) = v
          j += 1
        }
      }
      i += 1
    }
    new GenericArrayData(mins)
  }

  /** 64-bit SimHash from token occurrences (±1 bit votes) in one pass. */
  def simhash(arr: ArrayData): Long = {
    val n = arr.numElements()
    val votes = new Array[Int](Perms)
    var i = 0
    while (i < n) {
      if (!arr.isNullAt(i)) {
        val h = XXH64.hashUTF8String(arr.getUTF8String(i), seed)
        var b = 0
        while (b < Perms) {
          votes(b) += (if (((h >>> b) & 1L) == 1L) 1 else -1)
          b += 1
        }
      }
      i += 1
    }
    var sig = 0L
    var b = 0
    while (b < Perms) {
      if (votes(b) > 0) sig |= (1L << b)
      b += 1
    }
    sig
  }
}

private[expressions] trait StringArrayInput { self: UnaryExpression =>
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"${self.prettyName} expects array<string>, got $t")
  }
}

/** 64-permutation MinHash signature of a shingle array; null for an
  * empty array (mirrors `array_min` of an empty array). */
case class MinHashSignature(child: Expression)
    extends UnaryExpression with StringArrayInput {

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = true

  override def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    if (arr.numElements() == 0) null
    else SignatureKernels.minhash(arr, SignatureKernels.permSeeds)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val seeds = ctx.addReferenceObj("permSeeds", SignatureKernels.permSeeds, "long[]")
    val kernels = SignatureKernels.getClass.getName.stripSuffix("$") + "$.MODULE$"
    nullSafeCodeGen(ctx, ev, a => s"""
       |if ($a.numElements() == 0) { ${ev.isNull} = true; }
       |else { ${ev.value} = $kernels.minhash($a, $seeds); }
     """.stripMargin)
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
  override def prettyName: String = "minhash_signature"
}

/** 64-bit SimHash of a token array (occurrence-weighted bit voting). */
case class SimHashSignature(child: Expression)
    extends UnaryExpression with StringArrayInput {

  override def dataType: DataType = LongType

  override def nullSafeEval(input: Any): Any =
    SignatureKernels.simhash(input.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val kernels = SignatureKernels.getClass.getName.stripSuffix("$") + "$.MODULE$"
    nullSafeCodeGen(ctx, ev, a => s"${ev.value} = $kernels.simhash($a);")
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
  override def prettyName: String = "simhash64"
}
