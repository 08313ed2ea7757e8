package graft.operators

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.SparkTestSession

/** The deterministic k-means trainer: bit-stable under repartitioning
  * (the property a versionable codebook needs), Lloyd-monotone inertia,
  * and a consistent registry audit.
  */
class KMeansSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  private val sf = "/root/testdata/sf0.001"
  private def e = graft.Tables.embeddings(spark, sf)

  test("centroids are bit-identical at any parallelism") {
    val (c3, _) = KMeans.fit(e.repartition(3), 8, 3)
    val (c7, _) = KMeans.fit(e.repartition(7), 8, 3)
    assert(c3 == c7, "exact fixed-point means must make the fit order-independent")
  }

  test("inertia never increases across Lloyd rounds") {
    val (_, inertias) = KMeans.fit(e, 8, 4, trackInertia = true)
    inertias.sliding(2).foreach { case Seq(a, b) =>
      assert(b <= a + 1e-6, s"inertia rose: $a -> $b")
    }
    assert(inertias.last < inertias.head, "training must actually improve the fit")
  }

  test("fused subspace trainer equals M independent per-subspace fits") {
    import org.apache.spark.sql.functions._
    import org.apache.spark.sql.types.DoubleType
    val (m, sub, k, iters) = (4, 16, 8, 2)
    val ed = this.e.select(col("vec_id"), col("embedding").cast("array<double>").as("embedding"))
    val fused = KMeans.fitSubspaces(ed, m, sub, k, iters)
    val independent = (0 until m).map { mm =>
      val sdf = ed.select(col("vec_id"),
        slice(col("embedding"), mm * sub + 1, sub).as("embedding"))
      mm -> KMeans.fit(sdf, k, iters)._1
    }
    // exact fixed-point means -> the fused one-plan-per-round trainer must
    // be BIT-identical to training each subspace alone
    assert(fused == independent,
      "fitSubspaces must match independent fits exactly (same seeds, same algebra)")
  }

  test("registry audit: every vector lands in exactly one cell") {
    val out = graft.SparkEntry.queries("u02_kmeans_cells")(spark, sf)
    val total = out.agg(sum(col("n_vecs"))).head.getLong(0)
    assert(total == e.count())
    assert(out.select("cell").distinct().count() == out.count(), "one row per cell")
  }
}
