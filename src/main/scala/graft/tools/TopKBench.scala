package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.{GraftExtensions, Tables}

/** Interleaved A/B micro-bench for the native TopKPerGroup operator vs
  * the built-in window plan, on the same warmed session (run-to-run
  * variance on a shared box swamps single runs — interleave and repeat).
  *
  * Usage: runMain graft.tools.TopKBench [sfDir] [k] [repeats]
  */
object TopKBench {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val k = args.lift(1).map(_.toInt).getOrElse(10)
    val reps = args.lift(2).map(_.toInt).getOrElse(3)
    val spark = SparkSession.builder()
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")}]")
      .appName("graft-topk-bench")
      .withExtensions(new GraftExtensions)
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    val li = Tables.lineitem(spark, sfDir)
      .select("l_suppkey", "l_orderkey", "l_linenumber", "l_extendedprice")
      .cache()
    li.count() // warm: materialize the cache so both variants read memory

    def query() = {
      val w = Window.partitionBy(col(sys.env.getOrElse("TOPK_GROUP", "l_suppkey")))
        .orderBy(col("l_extendedprice").desc, col("l_orderkey"), col("l_linenumber"))
      li.withColumn("rk", row_number().over(w)).filter(col("rk") <= k)
    }
    def time(body: => Unit): Double = {
      val t0 = System.nanoTime(); body; (System.nanoTime() - t0) / 1e9
    }
    // throwaway to settle JIT/codegen caches
    query().count(); spark.conf.set("spark.graft.topkRewrite.enabled", "false")
    query().count(); spark.conf.set("spark.graft.topkRewrite.enabled", "true")

    val (nat, win) = (Array.ofDim[Double](reps), Array.ofDim[Double](reps))
    for (i <- 0 until reps) {
      spark.conf.set("spark.graft.topkRewrite.enabled", "true")
      nat(i) = time(query().count())
      spark.conf.set("spark.graft.topkRewrite.enabled", "false")
      win(i) = time(query().count())
    }
    val n = query().count()
    println(f"TOPK_AB rows_out=$n native_med=${nat.sorted.apply(reps / 2)}%.3f " +
      f"window_med=${win.sorted.apply(reps / 2)}%.3f " +
      f"native=${nat.map(x => f"$x%.3f").mkString(",")} window=${win.map(x => f"$x%.3f").mkString(",")}")
    spark.stop()
  }
}
