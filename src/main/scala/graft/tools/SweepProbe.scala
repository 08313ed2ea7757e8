package graft.queries

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** One-off stage profiler for the d19 sweep — times each config's
  * candidate build separately against the pooled signature relation.
  * Usage: graft.queries.SweepProbe [sfDir]
  */
object SweepProbe {
  def main(args: Array[String]): Unit = {
    val sf = if (args.nonEmpty) args(0) else "/root/testdata/sf0.1"
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    def t[A](label: String)(f: => A): A = {
      val t0 = System.nanoTime()
      val r = f
      println(f"PROBE $label ${(System.nanoTime() - t0) / 1e9}%.2f s")
      r
    }
    val sigs = t("sig-pool")(SharedPools.materialized(spark, sf, "minhash_sigs")(
      DedupQueries.minhashSignatures(spark, sf)))
    t("sig-count")(println(sigs.count()))
    val truth = t("jaccard-pool")(DedupQueries.jaccardPool(spark, sf))
    t("truth-count")(println(truth.count()))
    for ((nb, nr) <- Seq((32, 2), (16, 4), (8, 8))) {
      val bands = sigs.select(col("doc_id"), posexplode(array((0 until nb).map { b =>
          concat_ws(",", (0 until nr).map(r => col("sig")(b * nr + r)): _*)
        }: _*)).as(Seq("band", "bucket")))
      val capped = DedupQueries.capBuckets(bands, Seq("band", "bucket"))
      val cand = capped.as("a").join(capped.as("b"),
          col("a.band") === col("b.band") && col("a.bucket") === col("b.bucket") &&
            col("a.doc_id") < col("b.doc_id"))
        .select(col("a.doc_id").as("d1"), col("b.doc_id").as("d2")).distinct()
      t(s"cand-$nb-$nr")(println(cand.count()))
      t(s"tp-$nb-$nr")(println(cand.join(truth, Seq("d1", "d2")).count()))
    }
    spark.stop()
  }
}
