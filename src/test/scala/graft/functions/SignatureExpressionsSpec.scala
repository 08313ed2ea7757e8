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

  test("fused winnow == posexplode/window-min composition, every doc (incl. multibyte)") {
    // Reference: the round-9..11 built-in formulation (per-gram rows,
    // doc-keyed sliding min over the packed key, distinct) — the plan
    // the fused kernel replaced in round 12. Run over the fixture docs
    // PLUS planted edge cases: multibyte text (UTF-8 char grams), text
    // exactly at the length threshold, repeated grams (hash ties test
    // the rightmost-position rule).
    import org.apache.spark.sql.expressions.Window
    val k = DedupQueries.WinnowK; val w = DedupQueries.WinnowW
    val extra = spark.createDataFrame(Seq(
      (900001L, "中文字符的测试文档内容重复内容重复内容"),
      (900002L, "abcabcabcabcabcabcabc"),
      (900003L, "x" * (k + w - 1)),
      (900004L, "päällekkäisyys käsittelyä varten tämä on testi"))).toDF("doc_id", "text")
    val docsDf = graft.Tables.documents(spark, sf).select(col("doc_id"), col("text"))
      .unionByName(extra)
      .filter(length(col("text")) >= k + w - 1)
    val fused = docsDf
      .select(col("doc_id"), explode(SignatureOps.winnow(col("text"), k, w)).as("h"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val g = docsDf
      .select(col("doc_id"), posexplode(expr(
        s"transform(sequence(1, length(text) - ${k - 1}), " +
          s"p -> CAST(conv(substring(md5(substring(text, p, $k)), 1, 7), 16, 10) AS BIGINT))"))
        .as(Seq("p0", "h")))
      .select(col("doc_id"), (col("p0") + 1).cast("long").as("p"), col("h"))
    val wmin = Window.partitionBy("doc_id").orderBy("p")
      .rowsBetween(-(w - 1), Window.currentRow)
    val builtin = g
      .withColumn("packed", shiftleft(col("h"), 32) + (lit(4294967295L) - col("p")))
      .withColumn("minp", min(col("packed")).over(wmin))
      .filter(col("p") >= w)
      .select(col("doc_id"), shiftrightunsigned(col("minp"), 32).as("h"))
      .distinct()
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(fused.nonEmpty)
    assert(fused == builtin)
  }

  test("fused slidingDistinctSum == aggregate/transform/slice composition, every doc") {
    // Reference: t33's round-8..11 built-in formulation. Fixture docs
    // plus planted edges: shorter than the window (degrades to one
    // whole-array window), exactly window-sized, all-identical tokens.
    val W = graft.queries.ExtraQueries10.MattrW
    val extra = spark.createDataFrame(Seq(
      (910001L, "a b c"),
      (910002L, (1 to W).map(i => s"t$i").mkString(" ")),
      (910003L, Seq.fill(W + 7)("same").mkString(" ")))).toDF("doc_id", "text")
    val docsDf = graft.Tables.documents(spark, sf).select(col("doc_id"), col("text"))
      .unionByName(extra)
    val toks = split(col("text"), " ")
    val nWin = greatest(size(toks) - W + 1, lit(1))
    val both = docsDf.select(col("doc_id"),
      SignatureOps.slidingDistinctSum(toks, W).as("fused"),
      aggregate(
        transform(sequence(lit(1), nWin),
          i => size(array_distinct(slice(toks, i, lit(W))))),
        lit(0L), (acc, x) => acc + x).as("builtin")).collect()
    assert(both.nonEmpty)
    both.foreach(r => assert(r.getLong(1) == r.getLong(2), s"doc ${r.getLong(0)}"))
  }

  test("winnow edge: below-threshold text yields an empty array") {
    val k = DedupQueries.WinnowK; val w = DedupQueries.WinnowW
    val out = spark.range(1).select(
      size(SignatureOps.winnow(lit("x" * (k + w - 2)), k, w)).as("n")).collect().head.getInt(0)
    assert(out == 0)
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
