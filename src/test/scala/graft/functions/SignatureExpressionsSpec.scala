package graft.functions

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.SparkTestSession
import graft.queries.DedupQueries

/** The fused signature kernels must be BIT-IDENTICAL to the built-in
  * compositions they replace — same md5-prefix base hash and affine
  * permutation family (PortableHash) — so the LSH recall/precision
  * characteristics carry over unchanged AND the d04/d05 DuckDB oracles
  * replay the identical signatures. */
class SignatureExpressionsSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  private val sf = "/root/testdata/sf0.001"

  test("fused minhash == transform/array_min composition, every doc, every perm") {
    val fused = DedupQueries.minhashSignatures(spark, sf).collect()
      .map(r => r.getLong(0) -> r.getSeq[Long](1)).toMap
    val builtin = DedupQueries.minhashSignaturesBuiltin(spark, sf).collect()
      .map(r => r.getLong(0) -> r.getSeq[Long](1)).toMap
    assert(fused.keySet == builtin.keySet)
    assert(fused.nonEmpty)
    fused.foreach { case (id, sig) => assert(sig == builtin(id), s"doc $id") }
  }

  test("fused simhash == explode/aggregate composition, every doc") {
    val fused = DedupQueries.simhashSignatures(spark, sf).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val builtin = DedupQueries.simhashSignaturesBuiltin(spark, sf).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(fused == builtin)
    assert(fused.nonEmpty)
  }

  test("sql registration and edge cases: empty array, null input") {
    import org.apache.spark.sql.SparkSession
    val prev = spark // ensure the shared context exists
    SparkSession.clearActiveSession()
    SparkSession.clearDefaultSession()
    try {
      val s2 = SparkSession.builder()
        .master("local[4]")
        .withExtensions(new graft.GraftExtensions)
        .getOrCreate()
      runSqlCases(s2)
    } finally {
      SparkSession.setDefaultSession(prev)
      SparkSession.setActiveSession(prev)
    }
  }

  private def runSqlCases(spark: org.apache.spark.sql.SparkSession): Unit = {
    import spark.implicits._
    val out = spark.sql(
      """SELECT minhash_signature(array('a b c')) AS mh,
        |       minhash_signature(CAST(array() AS array<string>)) AS mh_empty,
        |       simhash64(array('x', 'x', 'y')) AS sh,
        |       simhash64(CAST(NULL AS array<string>)) AS sh_null""".stripMargin)
      .collect().head
    assert(out.getSeq[Long](0).size == 64)
    assert(out.isNullAt(1)) // empty shingle set has no min
    assert(out.isNullAt(3))
    // simhash of a token multiset: occurrence voting, not distinct —
    // 'x' voting twice must dominate every bit where 'x' and 'y' differ
    val hx = graft.functions.PortableHash.md5PrefixLong("x", 15)
    assert(out.getLong(2) == hx) // 2 x-votes vs 1 y-vote: sign(h_x bits) wins everywhere
  }
}
