package graft.tools

import org.apache.spark.sql.SparkSession
import graft.GraftExtensions

/** s12 PageRank reference curve (r5 verdict item 6): the 8.2–13.1 s
  * history band dominates the sf0.1 bench and its variance is the
  * biggest noise source, so this probe records the two axes a
  * regression triage needs — AQE on vs off inside the loop, and round
  * count — with everything else identical (same session, same s10
  * edge list, interleaved order, medians the caller reads off stdout).
  *
  * Usage: graft.tools.PrProbe [sfDir] (default /root/testdata/sf0.1)
  * Output: one line per (variant, rep) wall time; see the measured
  * table in the pageRank scaladoc / ARCHITECTURE.md.
  */
object PrProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .withExtensions(new GraftExtensions)
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark.range(1000000).selectExpr("sum(id)").collect()

    def edges = graft.queries.SimilarityQueries.s10Edges(spark, sfDir)
    val variants: Seq[(String, () => Long)] = Seq(
      "rounds=8 aqeLoop=off" -> (() =>
        graft.queries.SimilarityQueries.pageRank(edges, 8, disableAqeInLoop = true).count()),
      "rounds=8 aqeLoop=on " -> (() =>
        graft.queries.SimilarityQueries.pageRank(edges, 8, disableAqeInLoop = false).count()),
      "rounds=4 aqeLoop=off" -> (() =>
        graft.queries.SimilarityQueries.pageRank(edges, 4, disableAqeInLoop = true).count()),
      "rounds=4 aqeLoop=on " -> (() =>
        graft.queries.SimilarityQueries.pageRank(edges, 4, disableAqeInLoop = false).count()))
    // interleave reps so machine drift hits every variant equally
    for (rep <- 1 to 3; (name, run) <- variants) {
      val t0 = System.nanoTime()
      val rows = run()
      val dt = (System.nanoTime() - t0) / 1e9
      spark.catalog.clearCache()
      println(f"[prprobe] $name rep$rep: $dt%.2f s ($rows rows)")
    }
    spark.stop()
  }
}
