package graft.operators

import org.scalatest.funsuite.AnyFunSuite
import graft.SparkTestSession

/** Hand-computed profile of a tiny mixed-type frame, incl. nulls. */
class ProfilerSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark

  test("profiler: exact stats per column on a known frame") {
    import spark.implicits._
    val df = Seq(
      (1L, Some(1.5), Some("b")),
      (2L, None, Some("a")),
      (2L, Some(-2.25), None)
    ).toDF("k", "x", "s")
    val got = Profiler.profile(df).collect()
      .map(r => r.getString(0) -> r).toMap
    assert(got.keySet == Set("k", "x", "s"))
    val k = got("k")
    assert(k.getString(1) == "bigint" && k.getLong(2) == 3 && k.getLong(3) == 0
      && k.getLong(4) == 2 && k.getLong(5) == 1000000L && k.getLong(6) == 2000000L)
    val x = got("x")
    assert(x.getLong(3) == 1 && x.getLong(4) == 2
      && x.getLong(5) == -2250000L && x.getLong(6) == 1500000L)
    assert(x.isNullAt(7) && x.isNullAt(8))
    val s = got("s")
    assert(s.getString(1) == "string" && s.getLong(3) == 1 && s.getLong(4) == 2
      && s.getString(7) == "a" && s.getString(8) == "b")
    assert(s.isNullAt(5) && s.isNullAt(6))
  }

  test("profiler: no distinct-rewrite Expand; distinct scans are column-pruned") {
    val p = graft.SparkEntry.queries("u01_profile_table")(spark, "/root/testdata/sf0.001")
      .queryExecution.explainString(org.apache.spark.sql.execution.FormattedMode)
    // the N-way count_distinct formulation plans an Expand that
    // amplifies the scan (N+1)x through SortAggregates — never again
    assert(!p.contains("Expand"), "distinct rewrite must not amplify the scan")
    // each distinct aggregate reads exactly one column
    val readSchemas = """ReadSchema: struct<([^>]*)>""".r
      .findAllMatchIn(p).map(_.group(1)).toSeq
    assert(readSchemas.count(s => !s.contains(",")) >= 11,
      s"expected 11 single-column pruned scans, got: $readSchemas")
  }
}
