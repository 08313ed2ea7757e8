package graft

import org.apache.spark.sql.SparkSession
import graft.etl.{ConfigLoader, Enrich, Pipeline}

/** CLI entry (SURVEY.md O21; `/root/reference/etl.py:472-518`): run the
  * full pipeline from a JSON/YAML config file.
  *
  *   runMain graft.Main --config fixtures/config.yaml \
  *       [--pages fixtures/pages] [--out /tmp/out]
  *
  * Fail-fast guards mirror the reference: exit 1 on missing/invalid
  * config or empty extract.
  */
object Main {
  def main(args: Array[String]): Unit = {
    val opts = args.sliding(2, 2).collect { case Array(k, v) => k -> v }.toMap
    val configPath = opts.getOrElse("--config", {
      System.err.println("usage: graft.Main --config <file> [--pages <dir>] [--out <dir>]")
      sys.exit(1)
    })
    val cfg =
      try ConfigLoader.load(configPath)
      catch {
        case e: Exception => System.err.println(s"config error: ${e.getMessage}"); sys.exit(1)
      }
    val spark = SparkSession.builder()
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "8")}]")
      .config("spark.sql.shuffle.partitions", sys.env.getOrElse("SPARK_GRAFT_CPUS", "8"))
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .withExtensions(new GraftExtensions)
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    try {
      val (df, obs) = Enrich.withMetrics(
        Pipeline.run(spark, Pipeline.Config(
          pagesDir = opts.getOrElse("--pages", "/root/repo/fixtures/pages"),
          essieTerms = cfg.filterAdvanced,
          gate = cfg.gate,
          outputPath = opts.get("--out"))))
      val n = df.count()
      val m = obs.get
      println(s"rows=$n processed=${m("processed")} bypassed=${m("bypassed")}")
      if (n == 0) sys.exit(1) // etl.py:508-510
    } finally spark.stop()
  }
}
