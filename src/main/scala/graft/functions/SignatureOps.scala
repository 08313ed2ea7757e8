package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftSqlBridge
import graft.expressions.{MinHashSignature, SimHashSignature, SlidingDistinctSum, WinnowFingerprints}

/** Column wrappers for the fused signature expressions (same pattern as
  * [[VectorOps]]: built-in compositions remain in `DedupQueries` as the
  * reference implementations the spec compares against bit-for-bit). */
object SignatureOps {

  /** 64-permutation MinHash signature of an array<string> of shingles. */
  def minhash(shingles: Column): Column =
    GraftSqlBridge.column(MinHashSignature(GraftSqlBridge.expression(shingles)))

  /** 64-bit SimHash of an array<string> of token occurrences. */
  def simhash(tokens: Column): Column =
    GraftSqlBridge.column(SimHashSignature(GraftSqlBridge.expression(tokens)))

  /** Distinct winnowing fingerprints (k-char grams, w windows) of a
    * string document. */
  def winnow(text: Column, k: Int, w: Int): Column =
    GraftSqlBridge.column(WinnowFingerprints(GraftSqlBridge.expression(text), k, w))

  /** Sum of per-sliding-window distinct counts (t33's MATTR numerator)
    * over an array<string> of tokens. */
  def slidingDistinctSum(tokens: Column, w: Int): Column =
    GraftSqlBridge.column(SlidingDistinctSum(GraftSqlBridge.expression(tokens), w))
}
