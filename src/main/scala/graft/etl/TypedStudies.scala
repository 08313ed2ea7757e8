package graft.etl

import org.apache.spark.sql.{Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** The flattened study row as a case class (etl.py:217-229's dict keys,
  * SURVEY.md §1.1 "typed core rows as Dataset[Study]"). */
final case class FlatStudy(
    nct_id: String,
    brief_title: String,
    official_title: String,
    overall_status: String,
    study_type: String,
    start_date: String,
    gender: String,
    brief_summary: String,
    detailed_description: String,
    criteria: String,
    start_year: String)

/** Typed `Dataset[FlatStudy]` view of the pipeline: compile-time field
  * access where it helps (the ETL core's schema is fixed), while the
  * dynamic-schema query registry stays DataFrame-based. Typed transforms
  * still compile to the same Catalyst plans — `TypedStudiesSpec` asserts
  * typed and untyped aggregations agree. */
object TypedStudies {

  def dataset(spark: SparkSession, path: String): Dataset[FlatStudy] = {
    import spark.implicits._
    Flatten(StudiesSource.readStudies(spark, path)).as[FlatStudy]
  }

  /** Typed groupByKey aggregation: studies per start-year. */
  def countsByYear(ds: Dataset[FlatStudy]): Map[String, Long] =
    ds.groupByKey(_.start_year)(org.apache.spark.sql.Encoders.STRING)
      .count().collect().toMap

  /** Typed map: classifier applied through the case class (field access
    * checked at compile time; the vectorized Column path remains the
    * performance default). */
  def classified(ds: Dataset[FlatStudy]): Dataset[(String, String)] = {
    import ds.sparkSession.implicits._
    ds.map(s => (s.nct_id, RuleClassifier.classify(s.criteria)))
  }

  /** Typed filter + projection pipeline (interventional recruiting). */
  def activeInterventional(ds: Dataset[FlatStudy]): Dataset[FlatStudy] =
    ds.filter(s => s.study_type == "INTERVENTIONAL" && s.overall_status == "RECRUITING")
}
