package graft.streaming

import java.sql.Timestamp
import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import graft.SparkTestSession

/** Drives the streaming operators through MemoryStream and asserts the
  * unified-API property: streaming result == batch result on the same
  * rows (the batch forms are the DuckDB-oracled q21/st1). */
case class E(event_id: Long, ts: java.sql.Timestamp, user_id: Long, event_type: String, value: Double)

class StreamingSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  private val sf = "/root/testdata/sf0.001"

  private def eventsBatch = graft.Tables.events(spark, sf)

  private def feedAll(name: String, build: org.apache.spark.sql.DataFrame => org.apache.spark.sql.DataFrame,
                      outputMode: String): org.apache.spark.sql.DataFrame = {
    import spark.implicits._
    implicit val sq = spark.sqlContext
    val rows = eventsBatch
      .select(col("event_id"), col("ts"), col("user_id"), col("event_type"), col("value")).as[E].collect()
    val stream = MemoryStream[E]
    stream.addData(rows.toSeq)
    val q = build(stream.toDF()).writeStream
      .format("memory").queryName(name).outputMode(outputMode).start()
    try q.processAllAvailable() finally q.stop()
    spark.table(name)
  }

  test("streaming tumbling agg equals the oracled batch aggregation") {
    val got = feedAll("tumbling_out", df => StreamingOps.tumblingAgg(df), "complete")
      .select(col("w_start"), col("event_type"), col("n")).collect()
      .map(r => (r.getTimestamp(0), r.getString(1), r.getLong(2))).toSet
    val want = StreamingOps.tumblingAgg(eventsBatch)
      .select(col("w_start"), col("event_type"), col("n")).collect()
      .map(r => (r.getTimestamp(0), r.getString(1), r.getLong(2))).toSet
    assert(got == want && got.nonEmpty)
  }
  import spark.implicits._

  test("streaming session_window agg equals the oracled batch sessionization") {
    val got = feedAll("session_out", df => StreamingOps.sessionAgg(df), "complete")
      .collect().map(r => (r.getTimestamp(0), r.getLong(1), r.getLong(2))).toSet
    val want = StreamingOps.sessionAgg(eventsBatch)
      .collect().map(r => (r.getTimestamp(0), r.getLong(1), r.getLong(2))).toSet
    assert(got == want && got.nonEmpty)
  }

  test("dropDuplicatesWithinWatermark removes injected dupes") {
    import spark.implicits._
    implicit val sq = spark.sqlContext
    val rows = eventsBatch.limit(20)
      .select(col("event_id"), col("ts"), col("user_id"), col("event_type"), col("value")).as[E].collect()
    val stream = MemoryStream[E]
    stream.addData((rows ++ rows).toSeq) // every event twice
    val q = StreamingOps.dedupWithinWatermark(stream.toDF()).writeStream
      .format("memory").queryName("dedup_out").outputMode("append").start()
    try q.processAllAvailable() finally q.stop()
    assert(spark.table("dedup_out").count() == 20)
  }

  test("stream-stream interval join equals the oracled batch st2") {
    import spark.implicits._
    implicit val sq = spark.sqlContext
    val rows = eventsBatch
      .select(col("event_id"), col("ts"), col("user_id"), col("event_type"), col("value")).as[E].collect()
    val signups = MemoryStream[E]; val errors = MemoryStream[E]
    signups.addData(rows.filter(_.event_type == "signup").toSeq)
    errors.addData(rows.filter(_.event_type == "error").toSeq)
    val q = StreamingOps.intervalJoin(signups.toDF(), errors.toDF()).writeStream
      .format("memory").queryName("ssjoin_out").outputMode("append").start()
    try q.processAllAvailable() finally q.stop()
    val got = spark.table("ssjoin_out").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getTimestamp(2), r.getTimestamp(3))).toSet
    val want = graft.SparkEntry.queries("st2_interval_join")(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getTimestamp(2), r.getTimestamp(3))).toSet
    assert(got == want && got.nonEmpty)
  }

  test("custom flatMapGroupsWithState sessionizer matches q23 session structure") {
    import spark.implicits._
    val evs = eventsBatch.select(col("user_id"), col("ts")).as[StreamingOps.Ev]
    val got = StreamingOps.sessionize(evs).collect()
      .map(s => (s.user_id, s.session_id) -> (s.n_events, s.duration_s)).toMap
    val want = graft.SparkEntry.queries("q23_sessionization")(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> (r.getLong(2), r.getLong(4))).toMap
    assert(got == want && got.nonEmpty)
  }
}
