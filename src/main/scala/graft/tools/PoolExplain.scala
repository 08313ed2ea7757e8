package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Plan auditor for SharedPools BUILD plans: [[graft.Explain]] covers
  * registered queries, but a pool consumer's plan only shows the parquet
  * scan of the materialized pool — the build's own plan (the part a
  * `pool:<key>` bench line times) was not dumpable. This prints the
  * formatted physical plan of the raw (unmaterialized) build expression
  * for the named pools. Usage: runMain graft.tools.PoolExplain [key ...] */
object PoolExplain {
  def builds(spark: SparkSession, sf: String): Map[String, () => DataFrame] = Map(
    "contamination_pairs" -> (() => graft.queries.PipelineQueries.contaminationPairsBuild(spark, sf)),
    "containment_ranked" -> (() => graft.queries.DedupQueries.containmentRankedOf(
      graft.Tables.documents(spark, sf))))

  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[8]")
      .withExtensions(new graft.GraftExtensions)
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val sf = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
    val reg = builds(spark, sf)
    val names = if (args.nonEmpty) args.toSeq else reg.keys.toSeq.sorted
    names.foreach { n =>
      println(s"\n========== pool:$n ==========")
      println(reg(n)().queryExecution.explainString(
        org.apache.spark.sql.execution.FormattedMode))
    }
    spark.stop()
  }
}
