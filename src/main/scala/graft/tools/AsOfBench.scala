package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.{GraftExtensions, Tables}

/** Interleaved A/B micro-bench: native AsOfJoinExec vs the composable
  * window-over-union as-of, same warmed session (same protocol as
  * TopKBench — interleave and take medians).
  *
  * Measured at sf0.1/local[32] (150k events, medians of 5): narrow
  * native 0.24s vs window 0.13s; wide-payload 0.21 vs 0.14; right side
  * bucketed 0.18 (plan shows ONE exchange — the standing side's is
  * elided) vs 0.09. Honest read: both plans move the same total bytes
  * (union pads schemas but columnar shuffle stores nulls cheaply), so
  * at toy scale the union's single stage wins on fixed overhead —
  * which is why r24 (window form) remains the default recommendation
  * for one-shot as-of. The native operator is the LAYOUT-AWARE path:
  * with the standing side bucketed it shuffles ONLY the delta side
  * (strictly fewer bytes, confirmed by the elided exchange), a
  * property no union plan can have because union destroys bucketing —
  * at 100 TB standing-quotes scale that is the whole cost.
  *
  * Usage: runMain graft.tools.AsOfBench [sfDir] [repeats]
  */
object AsOfBench {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val reps = args.lift(1).map(_.toInt).getOrElse(3)
    val spark = SparkSession.builder()
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")}]")
      .appName("graft-asof-bench")
      .withExtensions(new GraftExtensions)
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    val e = Tables.events(spark, sfDir)
      .select("event_id", "user_id", "ts", "event_type").cache()
    e.count()
    def errors = e.filter(col("event_type") === "error").select("event_id", "user_id", "ts")
    def signups = e.filter(col("event_type") === "signup")
      .select(col("user_id").as("s_user"), col("ts").as("s_ts"))

    def native() = {
      val (l, r) = (errors, signups)
      graft.plans.AsOfJoin.asof(l, r, l("user_id"), r("s_user"), l("ts"), r("s_ts"))
    }
    def window() = {
      val u = signups.select(col("s_user").as("user_id"), col("s_ts").as("ts"),
          lit(0).as("side"), lit(-1L).as("event_id"))
        .unionByName(errors.select(col("user_id"), col("ts"), lit(1).as("side"), col("event_id")))
      val w = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("side"))
        .rowsBetween(Window.unboundedPreceding, 0)
      u.withColumn("last_signup",
          last(when(col("side") === 0, col("ts")), ignoreNulls = true).over(w))
        .filter(col("side") === 1)
    }
    // WIDE variant: both sides carry a payload, the realistic as-of shape
    // (quotes with book state, events with context). The union form must
    // pad every row to the combined schema, so its one shuffle carries
    // (n_l + n_r) x (w_l + w_r) bytes vs the native n_l*w_l + n_r*w_r.
    def errorsW = errors.withColumn("e_payload", repeat(lit("e"), 200))
    def signupsW = signups.withColumn("s_payload", repeat(lit("s"), 200))
    def nativeW() = {
      val (l, r) = (errorsW, signupsW)
      graft.plans.AsOfJoin.asof(l, r, l("user_id"), r("s_user"), l("ts"), r("s_ts"))
    }
    def windowW() = {
      val u = signupsW.select(col("s_user").as("user_id"), col("s_ts").as("ts"),
          lit(0).as("side"), lit(-1L).as("event_id"),
          lit(null).cast("string").as("e_payload"), col("s_payload"))
        .unionByName(errorsW.select(col("user_id"), col("ts"), lit(1).as("side"),
          col("event_id"), col("e_payload"), lit(null).cast("string").as("s_payload")))
      val w = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("side"))
        .rowsBetween(Window.unboundedPreceding, 0)
      u.withColumn("last_signup",
          last(when(col("side") === 0, col("ts")), ignoreNulls = true).over(w))
        .withColumn("last_payload",
          last(when(col("side") === 0, col("s_payload")), ignoreNulls = true).over(w))
        .filter(col("side") === 1)
    }
    def time(body: => Unit): Double = {
      val t0 = System.nanoTime(); body; (System.nanoTime() - t0) / 1e9
    }
    native().count(); window().count(); nativeW().count(); windowW().count() // settle

    val (nat, win) = (Array.ofDim[Double](reps), Array.ofDim[Double](reps))
    val (natW, winW) = (Array.ofDim[Double](reps), Array.ofDim[Double](reps))
    for (i <- 0 until reps) {
      nat(i) = time(native().count())
      win(i) = time(window().count())
      natW(i) = time(nativeW().count())
      winW(i) = time(windowW().count())
    }
    def med(a: Array[Double]) = a.sorted.apply(reps / 2)

    // BUCKETED variant: the production time-series layout — the standing
    // side (signups/quotes) lives bucketed by key. The native join reads
    // it with NO exchange on that side; the union form destroys
    // bucketing unconditionally and reshuffles everything.
    spark.sql("DROP TABLE IF EXISTS asof_signups_b")
    graft.operators.ScaleOps.writeBucketed(signups, "asof_signups_b", "s_user", 32)
    def signupsB = spark.table("asof_signups_b")
    def nativeB() = {
      val (l, r) = (errors, signupsB)
      graft.plans.AsOfJoin.asof(l, r, l("user_id"), r("s_user"), l("ts"), r("s_ts"))
    }
    def windowB() = {
      val u = signupsB.select(col("s_user").as("user_id"), col("s_ts").as("ts"),
          lit(0).as("side"), lit(-1L).as("event_id"))
        .unionByName(errors.select(col("user_id"), col("ts"), lit(1).as("side"), col("event_id")))
      val w = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("side"))
        .rowsBetween(Window.unboundedPreceding, 0)
      u.withColumn("last_signup",
          last(when(col("side") === 0, col("ts")), ignoreNulls = true).over(w))
        .filter(col("side") === 1)
    }
    nativeB().count(); windowB().count()
    val (natB, winB) = (Array.ofDim[Double](reps), Array.ofDim[Double](reps))
    for (i <- 0 until reps) {
      natB(i) = time(nativeB().count())
      winB(i) = time(windowB().count())
    }
    val exchanges = "Exchange".r.findAllIn(nativeB().queryExecution.executedPlan.toString).size
    println(f"ASOF_AB rows_out=${native().count()} " +
      f"narrow: native_med=${med(nat)}%.3f window_med=${med(win)}%.3f | " +
      f"wide: native_med=${med(natW)}%.3f window_med=${med(winW)}%.3f | " +
      f"bucketed-right: native_med=${med(natB)}%.3f (exchanges=$exchanges) window_med=${med(winB)}%.3f")
    spark.stop()
  }
}
