package graft.streaming

import java.nio.file.{Files, Paths}

import org.scalatest.funsuite.AnyFunSuite
import graft.SparkTestSession

/** The uniform versioned-state format contract (r9 verdict stretch 8):
  * every foreachBatch state dir carries a `_state_format` header; a dir
  * with versioned parquet but no header (a pre-header build), or with a
  * different header (an incompatible kernel/schema generation), is
  * refused loudly by EVERY kernel through the one shared helper —
  * never silently reinterpreted.
  */
class StateFormatSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  private val sf = "/root/testdata/sf0.001"

  private def batch = graft.Tables.events(spark, sf).limit(50)

  /** Plant a versioned parquet dir WITHOUT a header — byte-for-byte what
    * a pre-header build's writeVersion left behind. Contents are
    * irrelevant: the refusal must fire before any schema logic runs. */
  private def plantUnversioned(dir: String): Unit = {
    batch.limit(1).coalesce(1).write.mode("overwrite").parquet(f"$dir/v${0L}%012d")
  }

  private val steps: Seq[(String, (org.apache.spark.sql.DataFrame, String, Long) => Unit, String)] = Seq(
    ("decayedAggStep", StreamingOps.decayedAggStep, ""),
    ("cusumStep", StreamingOps.cusumStep, "/daily"),
    ("runsStep", StreamingOps.runsStep, "/daily_rev"),
    ("adoptionStep", StreamingOps.adoptionStep, "/first_days"),
    ("acfStep", StreamingOps.acfStep, "/daily_cents"),
    ("growthStep", StreamingOps.growthStep, "/active_days"),
    ("wauStep", StreamingOps.wauStep, "/active_days"),
    ("watermarkStep", StreamingOps.watermarkStep, "/wm_hi"))

  test("every state kernel refuses a versioned dir with no format header") {
    steps.foreach { case (name, step, stateLeaf) =>
      val dir = Files.createTempDirectory(s"fmt_$name").toString
      plantUnversioned(s"$dir$stateLeaf")
      val e = intercept[IllegalArgumentException] {
        step(batch, dir, 1L)
      }
      assert(e.getMessage.contains("unversioned state"),
        s"$name: expected the unversioned-state refusal, got: ${e.getMessage}")
      assert(e.getMessage.contains("replay the log from batch 0"),
        s"$name: refusal must name the remedy")
    }
  }

  test("every state kernel refuses a dir whose header names another format") {
    steps.foreach { case (name, step, stateLeaf) =>
      val dir = Files.createTempDirectory(s"fmtx_$name").toString
      Files.createDirectories(Paths.get(s"$dir$stateLeaf"))
      Files.writeString(Paths.get(s"$dir$stateLeaf/_state_format"), "alien_kernel:v9")
      val e = intercept[IllegalArgumentException] {
        step(batch, dir, 1L)
      }
      assert(e.getMessage.contains("format mismatch"),
        s"$name: expected the format-mismatch refusal, got: ${e.getMessage}")
    }
  }

  test("decayedReport refuses pre-header and alien-kernel state dirs (r10 ADVICE)") {
    // The REPORT path must enforce the same contract as the step path:
    // a published report over silently-reinterpreted state is worse than
    // a refused merge, because it escapes into downstream consumers.
    val noHeader = Files.createTempDirectory("fmt_report_nohdr").toString
    plantUnversioned(noHeader)
    val e1 = intercept[IllegalArgumentException] {
      StreamingOps.decayedReport(spark, noHeader)
    }
    assert(e1.getMessage.contains("unversioned state"))

    val alien = Files.createTempDirectory("fmt_report_alien").toString
    Files.writeString(Paths.get(s"$alien/_state_format"), "alien_kernel:v9")
    val e2 = intercept[IllegalArgumentException] {
      StreamingOps.decayedReport(spark, alien)
    }
    assert(e2.getMessage.contains("format mismatch"))
  }

  test("the format header is stamped before the first version rename (crash-safe order)") {
    // A crash between header write and version rename must leave a
    // header-only dir (reads as fresh — recoverable), never versioned
    // parquet without a header (refused — forced full replay). Proof by
    // the durable postcondition: header exists, alone in the dir, reads
    // as fresh state; then a later step accepts and versions normally.
    val dir = Files.createTempDirectory("fmt_hdr_first").toString
    StreamingOps.decayedAggStep(batch, dir, 0L)
    assert(Files.exists(Paths.get(s"$dir/_state_format")))
    // simulate the crash window's surviving prefix: header only
    val dir2 = Files.createTempDirectory("fmt_hdr_only").toString
    Files.writeString(Paths.get(s"$dir2/_state_format"), "decayed_partials:v1")
    // header-only dir reads as fresh (no versions) and accepts a write
    assert(StreamingOps.decayedState(spark, dir2).isEmpty)
    StreamingOps.decayedAggStep(batch, dir2, 0L)
    assert(StreamingOps.decayedReport(spark, dir2).collect().nonEmpty)
  }

  test("a fresh dir gets stamped on first write and replays accept the header") {
    val dir = Files.createTempDirectory("fmt_ok").toString
    StreamingOps.decayedAggStep(batch, dir, 0L)
    val header = Files.readString(Paths.get(s"$dir/_state_format")).trim
    assert(header == "decayed_partials:v1")
    // second batch and a replay of it both pass the header check
    StreamingOps.decayedAggStep(batch, dir, 1L)
    StreamingOps.decayedAggStep(batch, dir, 1L)
    assert(StreamingOps.decayedReport(spark, dir).collect().nonEmpty)
  }
}
