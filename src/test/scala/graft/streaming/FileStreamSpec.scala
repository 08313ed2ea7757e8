package graft.streaming

import java.nio.file.Files
import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger
import graft.SparkTestSession

/** File-to-file streaming e2e: readStream over a parquet directory →
  * windowed aggregation → parquet sink with checkpointing — the
  * production shape of a streaming ingest (restartable from the
  * checkpoint, append-mode with watermark-expired windows). */
class FileStreamSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  private val sf = "/root/testdata/sf0.001"

  test("parquet->parquet streaming window agg equals the batch result") {
    val srcDir = Files.createTempDirectory("stream_src").toString
    val outDir = Files.createTempDirectory("stream_out").toString
    val ckDir = Files.createTempDirectory("stream_ck").toString

    val events = graft.Tables.events(spark, sf)
    events.write.mode("overwrite").parquet(srcDir)

    val stream = spark.readStream
      .schema(events.schema)
      .parquet(srcDir)
      .withWatermark("ts", "10 minutes")
      .groupBy(window(col("ts"), "1 hour"), col("event_type"))
      .agg(count(lit(1)).as("n"))
      .select(col("window.start").as("w_start"), col("event_type"), col("n"))

    val q = stream.writeStream
      .format("parquet")
      .option("path", outDir)
      .option("checkpointLocation", ckDir)
      .outputMode("append")
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination(120000)

    val got = spark.read.parquet(outDir)
      .collect().map(r => (r.getTimestamp(0), r.getString(1), r.getLong(2))).toSet
    val want = events
      .groupBy(window(col("ts"), "1 hour"), col("event_type"))
      .agg(count(lit(1)).as("n"))
      .select(col("window.start").as("w_start"), col("event_type"), col("n"))
      .collect().map(r => (r.getTimestamp(0), r.getString(1), r.getLong(2))).toSet

    // append mode emits only watermark-closed windows: everything except
    // the windows still open at end-of-stream
    assert(got.nonEmpty && got.subsetOf(want))
    val openWindowStarts = want.map(_._1).toSeq.sortBy(_.getTime).takeRight(1).toSet
    val closed = want.filterNot(t => openWindowStarts.contains(t._1))
    assert(closed.subsetOf(got))
  }
}
