package graft.tools
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
object RecallProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[16]")
      .withExtensions(new graft.GraftExtensions)
      .config("spark.sql.shuffle.partitions", "16")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    for (sf <- args) {
      val e = graft.Tables.embeddings(spark, sf)
      val n = e.count()
      val a = e.select(col("vec_id").as("a_id"), col("embedding").as("va"))
      val b = e.select(col("vec_id").as("b_id"), col("embedding").as("vb"))
      val exact = a.join(b, col("a_id") < col("b_id"))
        .withColumn("sim", round(graft.functions.VectorOps.cosine(col("va"), col("vb")), 4))
        .filter(col("sim") >= 0.4)
        .select("a_id", "b_id").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      val got = graft.SparkEntry.queries("d09_embedding_ivf_neardup")(spark, sf)
        .select("a_id", "b_id").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      val rec = if (exact.isEmpty) 1.0 else (exact & got).size.toDouble / exact.size
      println(f"RECALL sf=$sf n=$n C=${graft.queries.DedupQueries.ivfCodebookSize(n)} exact=${exact.size} got=${got.size} subset=${got.subsetOf(exact)} recall=$rec%.3f")
      spark.catalog.clearCache()
    }
    spark.stop()
  }
}
