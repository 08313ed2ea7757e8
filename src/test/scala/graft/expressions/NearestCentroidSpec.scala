package graft.expressions

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite
import graft.SparkTestSession
import graft.operators.KMeans

/** The loop-codegen argmin expression must agree exactly with the
  * built-in `least`-over-structs composition it replaced (which is the
  * semantics the k-means determinism contract is written against).
  */
class NearestCentroidSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark

  private val rnd = new scala.util.Random(42)
  private val cents: Seq[(Int, Seq[Double])] =
    (0 until 16).map(i => i -> Vector.fill(8)(rnd.nextDouble() * 2 - 1))

  private def floatDf = {
    import scala.jdk.CollectionConverters._
    val rows = (0 until 200).map { i =>
      Row(i, Array.fill(8)((rnd.nextFloat() * 2 - 1)))
    }
    spark.createDataFrame(rows.asJava, StructType(Seq(
      StructField("id", IntegerType), StructField("v", ArrayType(FloatType)))))
  }

  test("agrees with the built-in least-struct argmin on float vectors") {
    val df = floatDf
      .withColumn("fast", KMeans.assignExpr(col("v"), cents))
      .withColumn("slow", KMeans.assignExprBuiltin(col("v"), cents))
    assert(df.filter(col("fast") =!= col("slow")).count() === 0)
  }

  test("agrees on double vectors and under repartitioning") {
    val df = floatDf.withColumn("v", col("v").cast("array<double>")).repartition(5)
      .withColumn("fast", KMeans.assignExpr(col("v"), cents))
      .withColumn("slow", KMeans.assignExprBuiltin(col("v"), cents))
    assert(df.filter(col("fast") =!= col("slow")).count() === 0)
  }

  test("offset reads the subspace window in place (== slice + assign)") {
    val wide = floatDf.withColumn("v", flatten(array(col("v"), col("v"), col("v"))))
    val sub = cents.map { case (id, c) => id -> c }
    val df = wide
      .withColumn("fast", KMeans.assignExpr(col("v"), sub, offset = 8))
      .withColumn("slow", KMeans.assignExprBuiltin(slice(col("v"), 9, 8), sub))
    assert(df.filter(col("fast") =!= col("slow")).count() === 0)
  }

  test("ties break to the lowest centroid id") {
    import scala.jdk.CollectionConverters._
    val df = spark.createDataFrame(
      Seq(Row(Array(0.5, 0.5))).asJava,
      StructType(Seq(StructField("v", ArrayType(DoubleType)))))
    // centroids 3 and 7 equidistant from (0.5, 0.5)
    val tied = Seq(3 -> Seq(0.0, 0.0), 7 -> Seq(1.0, 1.0))
    assert(df.select(KMeans.assignExpr(col("v"), tied)).head.getInt(0) === 3)
  }

  test("SQL surface: nearest_centroid with a literal codebook and offset") {
    val r = spark.sql(
      """SELECT nearest_centroid(array(9D, 9D, 0.1D, 0.2D),
        |                        array(array(0D, 0D), array(1D, 1D)), 2) AS cell""".stripMargin)
      .head.getInt(0)
    assert(r === 0)
    val r2 = spark.sql(
      """SELECT nearest_centroid(array(0.9D, 1.1D), array(array(0D, 0D), array(1D, 1D))) AS cell""")
      .head.getInt(0)
    assert(r2 === 1)
  }

  test("null and too-short arrays yield null") {
    import scala.jdk.CollectionConverters._
    val df = spark.createDataFrame(
      Seq(Row(null), Row(Array(1.0))).asJava,
      StructType(Seq(StructField("v", ArrayType(DoubleType)))))
    val out = df.select(KMeans.assignExpr(col("v"), Seq(0 -> Seq(0.0, 0.0))).as("c"))
    assert(out.collect().forall(_.isNullAt(0)))
  }
}
