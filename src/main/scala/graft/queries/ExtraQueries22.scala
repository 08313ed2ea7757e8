package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DoubleType, LongType}
import graft.queries.Relational.{Fn, Q}

/** Round-8 batch 24b: the ANN index-selection advisor — the capstone
  * over the d19/s11/s28 tuning-harness family.
  */
object ExtraQueries22 {

  // --------------------- s30 ANN index advisor

  /** s30: index-selection advisor — every tuned ANN configuration the
    * registry ships (the d19 LSH band splits and the s28 IVF probe
    * counts), reduced to one (method, config, quality, cost) table
    * with per-method Pareto-dominance flags: a config is DOMINATED
    * when a sibling config is at least as accurate AND at least as
    * cheap (strictly better on one axis). This is the table a vector
    * store's auto-tuner reads to pick its operating point — d19 and
    * s28 measure the dials; s30 is the decision surface. COMPOSES the
    * registered sweeps through their [[SharedPools]] result pools (r8
    * verdict item 6): the advisor reads the materialized sweep tables —
    * the production shape, where the tuner consumes the sweeps' stored
    * outputs rather than re-running the measurement pipelines — and the
    * oracle embeds their oracle SQL as CTEs, so the pooled artifacts
    * stay hash-pinned to a full recomputation.
    *
    * Exactness: LSH quality/cost are d19's rounded recall and integer
    * candidate count; IVF quality is Σhits/(|Q|·K) — integer
    * numerators, one rounded division per config — with nprobe as the
    * integer scan-cost dial; dominance is pure comparison.
    * Scale shape: the sweeps are the registered plans; everything
    * after runs on a ≤|configs|-row relation (the 6-row advisor
    * table), where the dominance self-join is trivially bounded. */
  private val s30: Fn = (s, d) => {
    val lsh = DedupQueries.lshSweepPool(s, d).select(
      lit("lsh").as("method"),
      concat(col("bands"), lit("x"), col("rows_per_band")).as("config"),
      coalesce(col("recall"), lit(0.0)).as("quality"),
      col("n_cand").cast(LongType).as("cost"))
    val ivf = SimilarityQueries.ivfSweepPool(s, d).groupBy(col("nprobe"))
      .agg(sum(col("hits")).cast(LongType).as("sh"), count(lit(1)).cast(LongType).as("nq"))
      .select(lit("ivf").as("method"),
        concat(lit("nprobe="), col("nprobe")).as("config"),
        round(col("sh").cast(DoubleType) /
          (col("nq") * SimilarityQueries.K).cast(DoubleType), 6).as("quality"),
        col("nprobe").cast(LongType).as("cost"))
    val t = lsh.unionByName(ivf)
    val x = t.as("x"); val y = t.as("y")
    val dominated = x.join(y,
        col("x.method") === col("y.method") && col("x.config") =!= col("y.config") &&
          col("y.quality") >= col("x.quality") && col("y.cost") <= col("x.cost") &&
          (col("y.quality") > col("x.quality") || col("y.cost") < col("x.cost")),
        "left_semi")
      .select(col("method"), col("config")).distinct()
      .withColumn("dom", lit(true))
    t.join(dominated, Seq("method", "config"), "left")
      .select(col("method"), col("config"), col("quality"), col("cost"),
        coalesce(col("dom"), lit(false)).as("dominated"))
      .orderBy("method", "config")
  }

  private def s30Sql: String = {
    val d19Sql = DedupQueries.all.find(_.name == "d19_lsh_sweep").get.oracle.get
    val s28Sql = SimilarityQueries.all.find(_.name == "s28_ivf_sweep").get.oracle.get
    s"""WITH lshq AS ($d19Sql),
       |ivfq AS ($s28Sql),
       |t AS (
       |  SELECT 'lsh' AS method,
       |         CAST(bands AS VARCHAR) || 'x' || CAST(rows_per_band AS VARCHAR) AS config,
       |         COALESCE(recall, 0.0) AS quality, CAST(n_cand AS BIGINT) AS cost
       |  FROM lshq
       |  UNION ALL
       |  SELECT 'ivf', 'nprobe=' || CAST(nprobe AS VARCHAR),
       |         round(CAST(sum(hits) AS DOUBLE) / (count(*) * ${SimilarityQueries.K}), 6),
       |         nprobe
       |  FROM ivfq GROUP BY nprobe)
       |SELECT t.method, t.config, t.quality, t.cost,
       |       EXISTS (SELECT 1 FROM t o
       |               WHERE o.method = t.method AND o.config <> t.config
       |                 AND o.quality >= t.quality AND o.cost <= t.cost
       |                 AND (o.quality > t.quality OR o.cost < t.cost)) AS dominated
       |FROM t
       |ORDER BY method, config""".stripMargin
  }

  val all: Seq[Q] = Seq(
    Q("s30_index_advisor", s30, Some(s30Sql)))
}
