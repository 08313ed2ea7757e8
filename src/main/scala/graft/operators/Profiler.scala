package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Schema-driven data profiler — the ANALYZE-style utility a user
  * points at ANY table before deciding layout, partitioning, or skew
  * strategy.
  *
  * Execution shape (chosen for columnar sources): the non-distinct
  * statistics (counts, null counts, min/max) for every column come from
  * ONE aggregation over one scan; each exact distinct count is its own
  * column-pruned single-column two-phase hash aggregate. Putting all N
  * `count_distinct`s into the single aggregation instead triggers
  * Catalyst's distinct-rewrite — an Expand that amplifies the scan N+1
  * times through SortAggregates (measured 33s vs 2s on this very query
  * at sf0.1). On parquet the N pruned scans re-read no extra bytes
  * (each touches one column), so per-column aggregates are strictly
  * better than one amplified pass; total bytes read ≈ one full scan.
  *
  * Cross-engine canonical forms (so the output is oracle-comparable):
  * numeric min/max are reported in 1e-6 fixed-point (trunc toward zero
  * is identical across engines; double→decimal/string formatting is
  * not), temporal and string min/max as strings (ISO rendering and
  * binary collation agree for this corpus' ASCII data).
  */
object Profiler {

  private def fp6(c: Column): Column =
    (c.cast(DoubleType) * 1e6).cast(LongType)

  def profile(df: DataFrame): DataFrame = {
    val cols = df.schema.fields.toSeq
    // one aggregation row with every column's non-distinct stats
    val aggs: Seq[Column] = cols.flatMap { f =>
      val c = col(f.name)
      val (minFp, maxFp, minStr, maxStr) = f.dataType match {
        case _: NumericType =>
          (min(fp6(c)), max(fp6(c)),
            lit(null).cast(StringType), lit(null).cast(StringType))
        case _ =>
          (lit(null).cast(LongType), lit(null).cast(LongType),
            min(c.cast(StringType)), max(c.cast(StringType)))
      }
      Seq(
        count(lit(1)).as(s"${f.name}__n"),
        sum(when(c.isNull, 1L).otherwise(0L)).as(s"${f.name}__nulls"),
        minFp.as(s"${f.name}__min_fp6"),
        maxFp.as(s"${f.name}__max_fp6"),
        minStr.as(s"${f.name}__min_str"),
        maxStr.as(s"${f.name}__max_str"))
    }
    val one = df.agg(aggs.head, aggs.tail: _*)
    val arms = cols.map { f =>
      struct(
        lit(f.name).as("column"),
        lit(f.dataType.simpleString).as("dtype"),
        col(s"${f.name}__n").as("n_rows"),
        col(s"${f.name}__nulls").as("n_nulls"),
        col(s"${f.name}__min_fp6").as("min_fp6"),
        col(s"${f.name}__max_fp6").as("max_fp6"),
        col(s"${f.name}__min_str").as("min_str"),
        col(s"${f.name}__max_str").as("max_str"))
    }
    val basic = one.select(explode(array(arms: _*)).as("p")).select("p.*")
    // exact distinct counts: one pruned single-column hash agg per column
    val distincts = cols.map { f =>
      df.select(col(f.name))
        .agg(count_distinct(col(f.name)).as("n_distinct"))
        .withColumn("column", lit(f.name))
    }.reduce(_.unionByName(_))
    basic.join(distincts, "column")
      .select("column", "dtype", "n_rows", "n_nulls", "n_distinct",
        "min_fp6", "max_fp6", "min_str", "max_str")
      .orderBy("column")
  }
}
