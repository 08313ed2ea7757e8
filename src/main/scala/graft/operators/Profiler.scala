package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Schema-driven one-pass data profiler — the ANALYZE-style utility a
  * user points at ANY table before deciding layout, partitioning, or
  * skew strategy. All per-column statistics (null count, exact distinct
  * count, min/max) are computed in a SINGLE aggregation over one scan —
  * profiling a 100 TB table costs one pass, not one pass per column —
  * then unpivoted to a row per column.
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
    // one aggregation row holding every column's stats
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
        count_distinct(c).as(s"${f.name}__distinct"),
        minFp.as(s"${f.name}__min_fp6"),
        maxFp.as(s"${f.name}__max_fp6"),
        minStr.as(s"${f.name}__min_str"),
        maxStr.as(s"${f.name}__max_str"))
    }
    val one = df.agg(aggs.head, aggs.tail: _*)
    // unpivot: one output row per column
    val arms = cols.map { f =>
      struct(
        lit(f.name).as("column"),
        lit(f.dataType.simpleString).as("dtype"),
        col(s"${f.name}__n").as("n_rows"),
        col(s"${f.name}__nulls").as("n_nulls"),
        col(s"${f.name}__distinct").as("n_distinct"),
        col(s"${f.name}__min_fp6").as("min_fp6"),
        col(s"${f.name}__max_fp6").as("max_fp6"),
        col(s"${f.name}__min_str").as("min_str"),
        col(s"${f.name}__max_str").as("max_str"))
    }
    one.select(explode(array(arms: _*)).as("p"))
      .select("p.*")
      .orderBy("column")
  }
}
