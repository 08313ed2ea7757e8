package graft.tools
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.plans.logical.{Aggregate, GlobalLimit, LeafNode, LocalLimit, Window => LWindow}

/** Dev probe: list every query with an unpartitioned Window in its
  * optimized plan, and classify each window's input (aggregate-bounded,
  * limit-bounded, or raw-relation = unguarded). Usage:
  * runMain graft.tools.WinProbe [sfDir] */
object WinProbe {
  def main(args: Array[String]): Unit = {
    val sf = if (args.nonEmpty) args(0) else "/root/testdata/sf0.001"
    val spark = SparkSession.builder().master("local[8]")
      .withExtensions(new graft.GraftExtensions)
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    graft.SparkEntry.queries.toSeq.sortBy(_._1).foreach { case (name, fn) =>
      try {
        val plan = fn(spark, sf).queryExecution.optimizedPlan
        val wins = plan.collect { case w: LWindow if w.partitionSpec.isEmpty => w }
        wins.foreach { w =>
          val agg = w.child.collectFirst { case a: Aggregate => a }.nonEmpty
          val lim = w.child.collectFirst { case l: GlobalLimit => l; case l: LocalLimit => l }.nonEmpty
          val leaves = w.child.collect { case l: LeafNode => l }
          val parquetLeaf = leaves.exists(_.toString.toLowerCase.contains("parquet"))
          println(s"GLOBALWIN $name agg=$agg lim=$lim leaves=${leaves.size} parquetLeaf=$parquetLeaf")
        }
      } catch { case e: Throwable => println(s"ERR $name ${e.getMessage.take(80)}") }
    }
    spark.stop()
  }
}
