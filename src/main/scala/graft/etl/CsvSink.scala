package graft.etl

import org.apache.spark.sql.{DataFrame, functions => F}

/** The reference's CSV sink (SURVEY.md O19-O20;
  * `/root/reference/etl.py:432-469`): UTF-8, header row, and a FIXED
  * column order that includes two declared-but-never-produced columns,
  * `minimum_age` and `maximum_age` (`etl.py:451`) — `csv.DictWriter`'s
  * restval makes them always-empty in every reference output file, so the
  * engine reproduces them as empty-string literals rather than "fixing"
  * the schema. The AI column is appended iff present (conditional schema
  * evolution, `etl.py:456-460`).
  *
  * Known byte-level divergence, accepted: Python's csv module writes
  * `\r\n` line terminators; Spark's CSV writer only supports a
  * single-char lineSep and writes `\n`. Values and header order match.
  *
  * `numFiles=1` mirrors the reference's single local file; at scale leave
  * it 0 (one file per partition) — the header repeats per part-file,
  * which is the standard distributed-CSV contract.
  */
object CsvSink {

  /** Header order from `etl.py:449-454`. */
  val BaseColumns: Seq[String] = Seq(
    "nct_id", "brief_title", "official_title", "overall_status",
    "minimum_age", "maximum_age", "study_type", "start_date", "gender",
    "brief_summary", "detailed_description", "criteria", "start_year")

  /** Project to the fixed reference layout (adding the phantom empty
    * columns + optional AI column). */
  def layout(df: DataFrame, aiColumn: Option[String]): DataFrame = {
    val withPhantom = df
      .withColumn("minimum_age", F.lit(""))
      .withColumn("maximum_age", F.lit(""))
    val cols = BaseColumns ++ aiColumn.toSeq
    withPhantom.select(cols.map(F.col): _*)
  }

  def write(df: DataFrame, path: String, aiColumn: Option[String] = None,
            numFiles: Int = 1): Unit = {
    val out = layout(df, aiColumn)
    val sized = if (numFiles > 0) out.coalesce(numFiles) else out
    sized.write.mode("overwrite")
      .option("header", true)
      // Python csv (QUOTE_MINIMAL) writes empty fields unquoted; Spark's
      // default emptyValue is a quoted "" — align with the reference.
      .option("emptyValue", "")
      .csv(path)
  }
}
