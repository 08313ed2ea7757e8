package graft

import java.nio.file.Files
import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.SparkSession
import graft.etl.{Enrich, Essie, Pipeline}

/** End-to-end pipeline composition + SQL extension registration. */
class PipelineSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark

  test("full pipeline: paged extract -> essie -> flatten -> gated enrich -> csv") {
    val out = Files.createTempDirectory("pipeline").toString
    val df = Pipeline.run(spark, Pipeline.Config(
      pagesDir = "/root/repo/fixtures/pages",
      essieTerms = Essie.referenceConfigTerms,
      gate = Enrich.GateConfig(maxRows = Some(100L), tuningSet = None),
      outputPath = Some(out + "/result")))
    val rows = df.collect()
    assert(rows.map(_.getAs[String]("nct_id")).toSet ==
      Set("NCT00000001", "NCT00000010", "NCT00000012"))
    assert(rows.forall(_.getAs[String]("ai_determined_value") != "N/A"))
    val files = Files.list(java.nio.file.Paths.get(out + "/result"))
      .filter(_.toString.endsWith(".csv")).toArray
    assert(files.nonEmpty)
  }

  test("empty extract fails fast like the reference") {
    intercept[IllegalArgumentException] {
      Pipeline.run(spark, Pipeline.Config(
        pagesDir = "/root/repo/fixtures/pages", firstPage = "page_empty.json"))
    }
  }

  test("cosine_similarity is usable from SQL via extensions") {
    val prev = spark // ensure the shared context exists
    SparkSession.clearActiveSession()
    SparkSession.clearDefaultSession()
    try {
      // builds a NEW session over the existing context, with extensions
      val s2 = SparkSession.builder()
        .master("local[4]")
        .withExtensions(new GraftExtensions)
        .getOrCreate()
      val r = s2.sql(
        "SELECT cosine_similarity(array(CAST(1.0 AS FLOAT), CAST(0.0 AS FLOAT)), " +
          "array(CAST(1.0 AS FLOAT), CAST(0.0 AS FLOAT))) AS sim").collect()
      assert(math.abs(r.head.getDouble(0) - 1.0) < 1e-12)
    } finally {
      SparkSession.setDefaultSession(prev)
      SparkSession.setActiveSession(prev)
    }
  }
}
