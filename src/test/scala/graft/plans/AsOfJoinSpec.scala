package graft.plans

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.SparkTestSession

/** The native as-of join: agrees with the composable window-over-union
  * form at any parallelism, handles empty/missing groups, and plans as
  * the merge (no Window, no range-join nested loop).
  */
class AsOfJoinSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  private val sf = "/root/testdata/sf0.001"

  private def sides = {
    val e = graft.Tables.events(spark, sf)
    (e.filter(col("event_type") === "error").select("event_id", "user_id", "ts"),
      e.filter(col("event_type") === "signup")
        .select(col("user_id").as("s_user"), col("ts").as("s_ts")))
  }

  /** Reference implementation: union both sides, window per user ordered
    * by (ts, side) with signups before errors on equal ts (as-of is
    * inclusive), carry the last signup ts forward. */
  private def viaWindow: Map[Long, Option[java.sql.Timestamp]] = {
    val (errors, signups) = sides
    val u = signups.select(col("s_user").as("user_id"), col("s_ts").as("ts"),
        lit(0).as("side"), lit(-1L).as("event_id"))
      .unionByName(errors.select(col("user_id"), col("ts"), lit(1).as("side"), col("event_id")))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("user_id")).orderBy(col("ts"), col("side"))
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, 0)
    u.withColumn("last_signup",
        last(when(col("side") === 0, col("ts")), ignoreNulls = true).over(w))
      .filter(col("side") === 1)
      .collect().map(r => r.getLong(3) ->
        Option(r.getTimestamp(4))).toMap
  }

  private def viaNative(lparts: Int, rparts: Int): Map[Long, Option[java.sql.Timestamp]] = {
    val (errors, signups) = sides
    val l = errors.repartition(lparts)
    val r = signups.repartition(rparts)
    AsOfJoin.asof(l, r, l("user_id"), r("s_user"), l("ts"), r("s_ts"))
      .collect().map(row => row.getLong(0) ->
        Option(row.getTimestamp(4))).toMap
  }

  test("native as-of equals the window-over-union form at any parallelism") {
    val want = viaWindow
    assert(want.nonEmpty && want.values.exists(_.isEmpty),
      "fixture should include errors with no prior signup (null case)")
    assert(viaNative(3, 5) == want)
    assert(viaNative(11, 2) == want)
  }

  test("plans as the native merge: no Window, no nested loop, two clustered sorts") {
    val (errors, signups) = sides
    val df = AsOfJoin.asof(errors, signups,
      errors("user_id"), signups("s_user"), errors("ts"), signups("s_ts"))
    val p = df.queryExecution.executedPlan.toString
    assert(p.contains("AsOfJoin"))
    assert(!p.contains("WindowExec") && !p.contains("BroadcastNestedLoop") &&
      !p.contains("CartesianProduct"))
    val formatted = df.queryExecution.explainString(
      org.apache.spark.sql.execution.FormattedMode)
    assert("Exchange hashpartitioning\\(user_id".r.findAllIn(formatted).nonEmpty ||
      formatted.contains("hashpartitioning"))
    assert("Sort ".r.findAllIn(formatted).size >= 2, "both sides sorted by (key, time)")
  }

  test("bucketed standing side: its exchange is elided (delta-only shuffle)") {
    val (errors, signups) = sides
    spark.sql("DROP TABLE IF EXISTS asof_signups_spec")
    graft.operators.ScaleOps.writeBucketed(signups, "asof_signups_spec", "s_user", 8)
    try {
      val r = spark.table("asof_signups_spec")
      val df = AsOfJoin.asof(errors, r, errors("user_id"), r("s_user"), errors("ts"), r("s_ts"))
      val p = df.queryExecution.executedPlan.toString
      // ONE exchange (the delta/errors side); the standing side reads
      // its bucketed layout directly — the property no union plan has
      assert("Exchange hashpartitioning".r.findAllIn(p).size == 1, p)
      // and the result is still correct
      val got = df.collect().map(row => row.getLong(0) -> Option(row.getTimestamp(4))).toMap
      assert(got == viaWindow)
    } finally spark.sql("DROP TABLE IF EXISTS asof_signups_spec")
  }

  test("left rows with keys absent from the right side survive with nulls") {
    import scala.jdk.CollectionConverters._
    import org.apache.spark.sql.Row
    import org.apache.spark.sql.types._
    val lSchema = StructType(Seq(StructField("k", LongType), StructField("t", LongType)))
    val rSchema = StructType(Seq(StructField("rk", LongType), StructField("rt", LongType),
      StructField("v", StringType)))
    val l = spark.createDataFrame(Seq(Row(1L, 10L), Row(2L, 10L), Row(1L, 5L)).asJava, lSchema)
    val r = spark.createDataFrame(Seq(Row(1L, 6L, "a"), Row(1L, 9L, "b"), Row(3L, 1L, "z")).asJava, rSchema)
    val out = AsOfJoin.asof(l, r, l("k"), r("rk"), l("t"), r("rt"))
      .collect().map(row => (row.getLong(0), row.getLong(1),
        if (row.isNullAt(4)) null else row.getString(4))).toSet
    assert(out == Set((1L, 10L, "b"), (2L, 10L, null), (1L, 5L, null)))
  }
}
