package graft.tools
import org.apache.spark.sql.SparkSession
object QTime {
  def main(args: Array[String]): Unit = {
    if (args.length < 2) {
      System.err.println("usage: QTime <sfDir> <queryName> [queryName...]")
      sys.exit(2)
    }
    val spark = SparkSession.builder().master("local[32]")
      .withExtensions(new graft.GraftExtensions)
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    spark.range(1000000).selectExpr("sum(id)").collect()
    args.tail.foreach { q =>
      val t0 = System.nanoTime()
      graft.SparkEntry.queries(q)(spark, args(0)).write.format("noop").mode("overwrite").save()
      println(f"QTIME $q ${(System.nanoTime()-t0)/1e9}%.2f")
      spark.catalog.clearCache()
    }
    spark.stop()
  }
}
