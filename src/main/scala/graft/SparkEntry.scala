package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.queries.{CoverageQueries, DedupQueries, EtlQueries, ExtraQueries, ExtraQueries2, ExtraQueries3, ExtraQueries4, ExtraQueries5, ExtraQueries6, ExtraQueries7, ExtraQueries8, ExtraQueries9, ExtraQueries10, ExtraQueries11, ExtraQueries12, ExtraQueries13, ExtraQueries14, ExtraQueries15, ExtraQueries16, ExtraQueries17, ExtraQueries18, ExtraQueries19, ExtraQueries20, ExtraQueries21, ExtraQueries22, ExtraQueries23, ExtraQueries24, ExtraQueries25, ExtraQueries26, ExtraQueries27, ExtraQueries28, ExtraQueries29, ExtraQueries30, ExtraQueries31, ExtraQueries32, ExtraQueries33, ExtraQueries34, ExtraQueries35, ExtraQueries36, PipelineQueries, Relational, SimilarityQueries, TextQueries}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * `queries` maps operator names (SURVEY.md §2 inventory + extension
  * surface) to DataFrame builders over a scale-factor directory; each
  * SQL-expressible query carries DuckDB-equivalent oracle SQL for the
  * driver's hash compare.
  */
object SparkEntry {

  private def registry: Seq[Relational.Q] =
    Relational.all ++ EtlQueries.all ++ TextQueries.all ++ DedupQueries.all ++
      SimilarityQueries.all ++ CoverageQueries.all ++ ExtraQueries.all ++
      ExtraQueries2.all ++ ExtraQueries3.all ++ ExtraQueries4.all ++ ExtraQueries5.all ++
      ExtraQueries6.all ++ ExtraQueries7.all ++ ExtraQueries8.all ++ ExtraQueries9.all ++
      ExtraQueries10.all ++ ExtraQueries11.all ++ ExtraQueries12.all ++ ExtraQueries13.all ++
      ExtraQueries14.all ++ ExtraQueries15.all ++ ExtraQueries16.all ++ ExtraQueries17.all ++ ExtraQueries18.all ++ ExtraQueries19.all ++ ExtraQueries20.all ++ ExtraQueries21.all ++ ExtraQueries22.all ++ ExtraQueries23.all ++ ExtraQueries24.all ++ ExtraQueries25.all ++ ExtraQueries26.all ++ ExtraQueries27.all ++ ExtraQueries28.all ++ ExtraQueries29.all ++ ExtraQueries30.all ++ ExtraQueries31.all ++ ExtraQueries32.all ++ ExtraQueries33.all ++ ExtraQueries34.all ++ ExtraQueries35.all ++ ExtraQueries36.all ++ PipelineQueries.all

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0.
    * A 6-table star join + aggregation (the reference pipeline has no joins
    * — this demonstrates the extension surface end-to-end). */
  def entry(spark: SparkSession): DataFrame =
    Relational.all.find(_.name == "q05_region_revenue").get.fn(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    registry.map(q => q.name -> q.fn).toMap

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omitted for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] =
    registry.flatMap(q => q.oracle.map(q.name -> _)).toMap

  /** Cross-engine BAND oracles (r8 verdict stretch 7) for sketch queries
    * whose internals are definitionally engine-specific: DuckDB's own
    * approximator over the same data, plus a relative tolerance. No hash
    * can match two different sketch implementations, but both estimates
    * must sit within a band of each other because each is spec-bounded
    * near the exact answer — `tools/check_oracle.py` enforces it. Value
    * = (DuckDB SQL, rel_tol). r52 stays spec-bounded only: its OUTPUT
    * columns are engine-private HLL sketch binaries, not estimates. */
  def bandOracleSql: Map[String, (String, Double)] = CoverageQueries.bandOracles
}
