package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DoubleType, IntegerType, LongType}

/** Deterministic distributed k-means (Lloyd) — the codebook trainer
  * behind IVF cells (d09/s03) and product-quantization codebooks in a
  * production corpus.
  *
  * Spark-first iteration shape: each round is (a) one broadcast of the
  * k centroids (k is small by definition), (b) a map-only assignment —
  * argmin over the k squared-L2 distances, ties to the lowest cell id —
  * and (c) one keyed aggregation per (cell, dim) to recompute means.
  * Nothing shuffles except the partial-agg'd mean recompute, so a round
  * costs one pass over the data at any scale.
  *
  * Determinism (the property that makes the trained codebook a
  * versionable artifact): seeds are the k lowest-id vectors; argmin
  * ties break on cell id; per-dimension means use the scaled-long
  * fixed-point trick (trunc(x*1e9) summed as BIGINT) so the sum is
  * EXACT and order-independent — rerunning at any partitioning yields
  * bit-identical centroids. Plain double sums would drift with
  * reduction order and make every downstream assignment flap.
  */
object KMeans {

  /** Squared L2 between an embedding column and a centroid literal. */
  def sqDist(v: Column, centroid: Seq[Double]): Column =
    centroid.zipWithIndex.map { case (c, i) =>
      val d = element_at(v, i + 1).cast(DoubleType) - lit(c)
      d * d
    }.reduce(_ + _)

  /** One assignment pass: each row gets the id of its nearest centroid
    * (ties to the lowest id). Centroids ride in the plan as literals —
    * the broadcast of a k-means round. */
  def assign(e: DataFrame, centroids: Seq[(Int, Seq[Double])]): DataFrame =
    e.withColumn("cell", assignExpr(col("embedding"), centroids))

  /** Argmin-centroid id (ties to the lowest id) — reusable on any vector
    * column. Backed by the loop-codegen [[graft.expressions.NearestCentroid]];
    * `offset` reads a subspace window in place (PQ encode, no slice copy). */
  def assignExpr(v: Column, centroids: Seq[(Int, Seq[Double])], offset: Int = 0): Column = {
    val sorted = centroids.sortBy(_._1)
    org.apache.spark.sql.GraftSqlBridge.column(graft.expressions.NearestCentroid(
      org.apache.spark.sql.GraftSqlBridge.expression(v),
      sorted.map(_._1), sorted.map(_._2.toVector), offset))
  }

  /** The same argmin from built-ins only (`least` over (dist, id) structs) —
    * kept as the agreement oracle for NearestCentroidSpec. Unrolls k x dim
    * terms into codegen, so it must stay OFF the hot paths (a PQ-sized
    * instance blows the generated method past what janino will compile). */
  def assignExprBuiltin(v: Column, centroids: Seq[(Int, Seq[Double])]): Column =
    least(centroids.map { case (id, c) =>
      struct(sqDist(v, c).as("d"), lit(id).as("cell"))
    }: _*).getField("cell")

  /** Exact order-independent per-cell means over assigned rows. */
  private def means(assigned: DataFrame): DataFrame =
    assigned.select(col("cell"), posexplode(col("embedding")).as(Seq("pos", "x")))
      .groupBy("cell", "pos")
      .agg(((sum((col("x").cast(DoubleType) * lit(1e9)).cast(LongType)).cast(DoubleType) / lit(1e9))
        / count(lit(1))).as("c"))

  private def toDoubles(v: scala.collection.Seq[Any]): Vector[Double] =
    v.toVector.map {
      case f: Float => f.toDouble
      case d: Double => d
      case other => other.toString.toDouble
    }

  /** Runs `iters` Lloyd rounds; returns (finalCentroids, perRoundInertia).
    * Inertia (sum of squared distances to the assigned centroid) is the
    * monotone witness — it must never increase round over round — but it
    * costs one extra full pass per round, so it is off unless asked for
    * (the spec asks; the registry/encoding paths don't). */
  def fit(e: DataFrame, k: Int, iters: Int,
          trackInertia: Boolean = false): (Seq[(Int, Seq[Double])], Seq[Double]) = {
    var centroids: Seq[(Int, Seq[Double])] =
      e.orderBy("vec_id").limit(k).collect().zipWithIndex.map { case (r, i) =>
        i -> toDoubles(r.getAs[scala.collection.Seq[Any]]("embedding"))
      }.toSeq
    val inertias = scala.collection.mutable.ArrayBuffer[Double]()
    for (_ <- 0 until iters) {
      val assigned = assign(e, centroids)
      if (trackInertia) {
        inertias += assigned.select(
          sum(least(centroids.map { case (_, c) => sqDist(col("embedding"), c) }: _*)))
          .head.getDouble(0)
      }
      centroids = means(assigned).collect()
        .groupBy(_.getInt(0))
        .map { case (cell, rows) =>
          cell -> rows.sortBy(_.getInt(1)).map(_.getDouble(2)).toVector
        }.toSeq.sortBy(_._1)
    }
    (centroids, inertias.toSeq)
  }

  /** Trains M independent sub-vector codebooks IN ONE PLAN PER ROUND —
    * the product-quantization training shape. A per-subspace driver
    * loop costs M x iters x 2 jobs (each with its own codegen compile);
    * this fuses each round into ONE assignment projection computing all
    * M cells plus ONE exploded (m, cell, pos) aggregation, so a round
    * is a single pass regardless of M. Same determinism as `fit`.
    * `e` must expose vec_id + embedding with M*sub dimensions. */
  def fitSubspaces(e: DataFrame, m: Int, sub: Int, k: Int,
                   iters: Int): Seq[(Int, Seq[(Int, Seq[Double])])] = {
    val seeds = e.orderBy("vec_id").limit(k).collect().map(r =>
      toDoubles(r.getAs[scala.collection.Seq[Any]]("embedding")))
    var books: Seq[(Int, Seq[(Int, Seq[Double])])] = (0 until m).map { mm =>
      mm -> seeds.zipWithIndex.map { case (v, i) =>
        i -> v.slice(mm * sub, mm * sub + sub).toSeq
      }.toSeq
    }
    for (_ <- 0 until iters) {
      val assigned = books.foldLeft(e) { case (df, (mm, cents)) =>
        df.withColumn(s"__cell$mm",
          assignExpr(col("embedding"), cents, offset = mm * sub))
      }
      val exploded = assigned.select(
        explode(array((0 until m).map(mm => struct(
          lit(mm).as("m"), col(s"__cell$mm").as("cell"),
          slice(col("embedding"), mm * sub + 1, sub).as("sv"))): _*)).as("e"))
        .select(col("e.m"), col("e.cell"), posexplode(col("e.sv")).as(Seq("pos", "x")))
      val rows = exploded.groupBy("m", "cell", "pos")
        .agg(((sum((col("x").cast(DoubleType) * lit(1e9)).cast(LongType)).cast(DoubleType) / lit(1e9))
          / count(lit(1))).as("c"))
        .collect()
      books = rows.groupBy(_.getInt(0)).map { case (mm, mRows) =>
        mm -> mRows.groupBy(_.getInt(1)).map { case (cell, cRows) =>
          cell -> cRows.sortBy(_.getInt(2)).map(_.getDouble(3)).toVector.asInstanceOf[Seq[Double]]
        }.toSeq.sortBy(_._1)
      }.toSeq.sortBy(_._1)
    }
    books
  }

  /** Registry form: cluster audit after `iters` rounds — size and the
    * first centroid coordinate per cell (rounded for stable display). */
  def cells(e: DataFrame, k: Int, iters: Int): DataFrame = {
    val (centroids, _) = fit(e, k, iters)
    assign(e, centroids)
      .groupBy("cell")
      .agg(count(lit(1)).as("n_vecs"))
      .withColumn("c0", {
        val cases = centroids.map { case (id, c) => (id, c.head) }
        cases.tail.foldLeft(when(col("cell") === cases.head._1, round(lit(cases.head._2), 6))) {
          case (acc, (id, c0)) => acc.when(col("cell") === id, round(lit(c0), 6))
        }
      })
      .select(col("cell").cast(IntegerType).as("cell"), col("n_vecs"), col("c0"))
      .orderBy("cell")
  }
}
