package graft.expressions

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import org.apache.spark.unsafe.types.UTF8String
import graft.SparkTestSession

/** Pins the kernel to the textbook Jaro-Winkler values DuckDB 1.0's
  * `jaro_winkler_similarity` reproduces (the d16 oracle's function), and
  * the Expression's parity between interpreted eval, generated code, and
  * the SQL-registered surface. */
class JaroWinklerSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark

  private def jw(a: String, b: String): Double =
    JaroWinklerKernel.similarity(UTF8String.fromString(a), UTF8String.fromString(b))

  test("textbook values match DuckDB's jaro_winkler_similarity") {
    assert(math.abs(jw("MARTHA", "MARHTA") - 0.9611111111111111) < 1e-15)
    assert(math.abs(jw("DWAYNE", "DUANE") - 0.8400000000000001) < 1e-15)
    assert(jw("abc", "abc") == 1.0)
    assert(jw("", "abc") == 0.0)
    assert(jw("a", "b") == 0.0)
    assert(jw("ab", "ba") == 0.0) // window 0: no matches, textbook behavior
    // boost applies ONLY above the 0.7 jaro threshold (DuckDB-verified):
    assert(math.abs(jw("abcdefgh", "abzyxwvu") - 0.5) < 1e-15) // NOT 0.6
    assert(math.abs(jw("prefixAAAA", "prefixZZZZ") - 0.84) < 1e-15)
    assert(jw("martha", "MARTHA") < 1.0) // byte-exact, not case-folded
  }

  test("non-ASCII inputs: byte-level semantics are DuckDB's semantics") {
    // r6 verdict item 5. The kernel compares UTF-8 BYTES; so does DuckDB
    // 1.0's jaro_winkler_similarity (its kernel walks the raw string_t
    // bytes, not codepoints). Proof by disagreement with the codepoint
    // reading: for müller/muller the codepoint-level value is 0.9
    // (6-vs-6 chars, 5 matches, prefix 1) while the byte-level value is
    // 0.8642857142857143 (7-vs-6 bytes: ü is C3 BC) — DuckDB 1.0 returns
    // the BYTE value (verified on this machine, duckdb.connect():
    //   select jaro_winkler_similarity('müller','muller')
    //   = 0.8642857142857143). Every expectation below is a DuckDB
    // 1.0 output captured the same way, so d16-style oracled queries
    // stay hash-green on non-ASCII corpora too.
    val pinned = Seq(
      ("müller", "muller", 0.8642857142857143),   // 2-byte cp vs ASCII
      ("müller", "mūller", 0.8285714285714287),   // two different 2-byte cps
      ("café", "cafe", 0.8483333333333334),
      ("日本語", "日本誤", 0.9555555555555556),     // 3-byte cps, shared prefix bytes
      ("straße", "strasse", 0.8857142857142858),
      ("αβγδ", "αβγε", 0.95))
    for ((a, b, expected) <- pinned) {
      assert(jw(a, b) == expected, s"jw($a, $b)")
      assert(jw(b, a) == expected, s"jw($b, $a) symmetry")
    }
  }

  test("symmetry and range on fixture names") {
    val names = graft.Tables.supplier(spark, "/root/testdata/sf0.001")
      .select("s_name").collect().map(_.getString(0)).take(20)
    for (a <- names; b <- names) {
      val s = jw(a, b)
      assert(s >= 0.0 && s <= 1.0)
      assert(s == jw(b, a), s"asymmetric on $a / $b")
      if (a == b) assert(s == 1.0)
    }
  }

  test("generated and interpreted paths agree; SQL surface registered") {
    import spark.implicits._
    val df = Seq(("MARTHA", "MARHTA"), ("DWAYNE", "DUANE"), ("same", "same"))
      .toDF("a", "b")
    df.createOrReplaceTempView("jwpairs")
    val viaSql = spark.sql("SELECT jaro_winkler(a, b) AS s FROM jwpairs")
      .collect().map(_.getDouble(0)).toSeq
    assert(viaSql == Seq(0.9611111111111111, 0.8400000000000001, 1.0))
    // interpreted path (no codegen): same bits
    val prev = spark.conf.get("spark.sql.codegen.wholeStage")
    spark.conf.set("spark.sql.codegen.wholeStage", "false")
    try {
      val interp = spark.sql("SELECT jaro_winkler(a, b) AS s FROM jwpairs")
        .collect().map(_.getDouble(0)).toSeq
      assert(interp == viaSql)
    } finally spark.conf.set("spark.sql.codegen.wholeStage", prev)
    // null propagation (typed NULL: a bare NULL literal fails the
    // strict string-only type check, which is also worth pinning)
    assert(spark.sql("SELECT jaro_winkler(CAST(NULL AS STRING), 'x')")
      .collect().head.isNullAt(0))
    intercept[org.apache.spark.sql.AnalysisException] {
      spark.sql("SELECT jaro_winkler(1, 'x')").collect()
    }
  }
}
