package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.etl._
import graft.queries.Relational.{Fn, Q}

/** The reference pipeline's own operator surface (SURVEY.md §2.1),
  * registered as oracle-checked queries over the repo studies fixture
  * (`fixtures/studies.json`, shape per `/root/reference/etl.py:188-215`).
  *
  * These queries read the fixture path directly (not the sfDir) — the
  * reference's input is the CT.gov API, not the TPC-H tables; the DuckDB
  * oracle reads the same JSON via read_json_auto.
  */
object EtlQueries {

  val FixturePath = "/root/repo/fixtures/studies.json"

  private val oracleBase =
    s"""WITH s AS (SELECT unnest(studies) AS st FROM read_json_auto('$FixturePath')),
       |f AS (SELECT
       |  coalesce(st.protocolSection.identificationModule.nctId, 'N/A') AS nct_id,
       |  coalesce(st.protocolSection.identificationModule.briefTitle, 'N/A') AS brief_title,
       |  coalesce(st.protocolSection.identificationModule.officialTitle, 'N/A') AS official_title,
       |  coalesce(st.protocolSection.statusModule.overallStatus, 'N/A') AS overall_status,
       |  coalesce(st.protocolSection.designModule.studyType, 'N/A') AS study_type,
       |  coalesce(st.protocolSection.statusModule.startDateStruct."date", 'N/A') AS start_date,
       |  coalesce(st.protocolSection.eligibilityModule.sex, 'N/A') AS gender,
       |  coalesce(st.protocolSection.descriptionModule.briefSummary, 'N/A') AS brief_summary,
       |  coalesce(st.protocolSection.descriptionModule.detailedDescription, 'N/A') AS detailed_description,
       |  coalesce(st.protocolSection.eligibilityModule.eligibilityCriteria, 'N/A') AS criteria
       |FROM s),
       |flat AS (SELECT *,
       |  CASE WHEN start_date <> 'N/A' AND contains(start_date, '-')
       |       THEN split_part(start_date, '-', 1) ELSE 'N/A' END AS start_year
       |FROM f)""".stripMargin

  /** DuckDB twin of RuleClassifier.classifyCol — same cascade, same
    * split-at-'exclusion criteria' semantics. */
  private def classifierCase(criteria: String): String =
    s"""CASE
       |  WHEN NOT (lower($criteria) LIKE '%pregnan%' OR lower($criteria) LIKE '%postpartum%') THEN 'NOT MENTIONED'
       |  WHEN split_part(lower($criteria), 'exclusion criteria', 1) LIKE '%pregnant or postpartum%'
       |    OR split_part(lower($criteria), 'exclusion criteria', 1) LIKE '%postpartum or pregnant%' THEN 'PREGNANT OR POSTPARTUM'
       |  WHEN split_part(lower($criteria), 'exclusion criteria', 1) LIKE '%trying to get pregnant%' THEN 'FERTILITY'
       |  WHEN split_part(lower($criteria), 'exclusion criteria', 1) LIKE '%postpartum%'
       |   AND NOT split_part(lower($criteria), 'exclusion criteria', 1) LIKE '%pregnan%' THEN 'POSTPARTUM'
       |  WHEN split_part(lower($criteria), 'exclusion criteria', 2) LIKE '%pregnan%' THEN 'EXCLUDE_PREGNANCY'
       |  WHEN split_part(lower($criteria), 'exclusion criteria', 1) LIKE '%negative%pregnancy test%' THEN 'EXCLUDE_PREGNANCY'
       |  WHEN split_part(lower($criteria), 'exclusion criteria', 1) LIKE '%must be pregnant%' THEN 'ONLY_PREGNANCY'
       |  WHEN split_part(lower($criteria), 'exclusion criteria', 1) LIKE '%pregnan%' THEN 'INCLUDE_PREGNANCY'
       |  ELSE 'NOT MENTIONED'
       |END""".stripMargin

  // ------------------------------------------------------------- queries

  /** O6-O9: nested flatten + N/A sentinel + start_year derivation. */
  private val flattenQ: Fn = (s, _) =>
    Flatten(StudiesSource.readStudies(s, FixturePath)).orderBy("nct_id")
  private val flattenSql =
    s"""$oracleBase
       |SELECT * FROM flat ORDER BY nct_id""".stripMargin

  /** O13 generalized: classifier over every row (the ungated 100 TB path). */
  private val classifyAllQ: Fn = (s, _) =>
    Enrich.enrichAll(Flatten(StudiesSource.readStudies(s, FixturePath)))
      .select("nct_id", "ai_determined_value").orderBy("nct_id")
  private val classifyAllSql =
    s"""$oracleBase
       |SELECT nct_id, ${classifierCase("criteria")} AS ai_determined_value
       |FROM flat ORDER BY nct_id""".stripMargin

  private val tuningSet = Seq(
    "NCT00000001", "NCT00000003", "NCT00000006", "NCT00000007", "NCT00000011")

  /** O15+O16+O17: slice-then-filter gating with N/A fill and the
    * processed-first output order. NCT00000011 is IN the tuning set but
    * OUTSIDE the first 8 rows — it must come out bypassed ('N/A'), which
    * is exactly the composition-order semantic of etl.py:355-378. */
  private val enrichGatedQ: Fn = (s, _) =>
    Enrich.gated(
      Flatten(StudiesSource.readStudies(s, FixturePath)),
      Enrich.GateConfig(maxRows = Some(8L), tuningSet = Some(tuningSet)))
      .select("nct_id", "processed", "ai_determined_value")
  private val enrichGatedSql = {
    val set = tuningSet.map(t => s"'$t'").mkString(", ")
    s"""$oracleBase,
       |g AS (SELECT *, row_number() OVER (ORDER BY nct_id) AS rn FROM flat)
       |SELECT nct_id,
       |  CAST(CASE WHEN rn <= 8 AND nct_id IN ($set) THEN 1 ELSE 0 END AS INTEGER) AS processed,
       |  CASE WHEN rn <= 8 AND nct_id IN ($set)
       |       THEN ${classifierCase("criteria")} ELSE 'N/A' END AS ai_determined_value
       |FROM g ORDER BY processed DESC, nct_id""".stripMargin
  }

  /** §2.2: the reference's full Essie filter set compiled to native
    * Catalyst predicates over the raw nested studies. */
  private val essieQ: Fn = (s, _) =>
    StudiesSource.readStudies(s, FixturePath)
      .filter(Essie.compileAll(Essie.referenceConfigTerms))
      .select(col("protocolSection.identificationModule.nctId").as("nct_id"))
      .orderBy("nct_id")
  private val essieSql =
    s"""WITH s AS (SELECT unnest(studies) AS st FROM read_json_auto('$FixturePath')),
       |t AS (SELECT
       |  st.protocolSection.identificationModule.nctId AS nct_id,
       |  st.protocolSection.designModule.studyType AS study_type,
       |  st.protocolSection.statusModule.startDateStruct."date" AS sd,
       |  st.protocolSection.eligibilityModule.sex AS sex,
       |  st.protocolSection.eligibilityModule.minimumAge AS min_age,
       |  st.protocolSection.eligibilityModule.maximumAge AS max_age,
       |  st.protocolSection.designModule.phases AS phases,
       |  list_transform(st.protocolSection.contactsLocationsModule.locations, x -> x.country) AS countries,
       |  lower(concat_ws(' ',
       |    coalesce(st.protocolSection.identificationModule.briefTitle, ''),
       |    coalesce(st.protocolSection.identificationModule.officialTitle, ''),
       |    coalesce(st.protocolSection.descriptionModule.briefSummary, ''),
       |    coalesce(st.protocolSection.descriptionModule.detailedDescription, ''),
       |    coalesce(st.protocolSection.eligibilityModule.eligibilityCriteria, ''))) AS fulltext
       |FROM s)
       |SELECT nct_id FROM t
       |WHERE study_type = 'INTERVENTIONAL'
       |  AND (CASE WHEN length(sd) = 10 THEN sd
       |            WHEN length(sd) = 7 THEN sd || '-01'
       |            WHEN length(sd) = 4 THEN sd || '-01-01' END)
       |      BETWEEN '2013-05-01' AND '2024-12-31'
       |  AND coalesce(list_contains(countries, 'Canada'), false)
       |  AND (sex = 'FEMALE' OR sex = 'ALL')
       |  AND ((TRY_CAST(split_part(max_age, ' ', 1) AS INTEGER) *
       |        (CASE WHEN contains(max_age, 'Year') THEN 12 ELSE 1 END)) >= 216 OR max_age IS NULL)
       |  AND ((TRY_CAST(split_part(min_age, ' ', 1) AS INTEGER) *
       |        (CASE WHEN contains(min_age, 'Year') THEN 12 ELSE 1 END)) <= 768 OR min_age IS NULL)
       |  AND coalesce(list_has_any(phases, ['EARLY_PHASE1','PHASE1','PHASE2','PHASE3','PHASE4']), false)
       |  AND (contains(fulltext, 'pregnant') OR contains(fulltext, 'pregnancy'))
       |ORDER BY nct_id""".stripMargin

  /** O11+O13+O14+O17 end-to-end through the REAL seam (r6 verdict
    * stretch 7): the rate-limited `mapPartitions` remote-classifier path
    * — client-per-partition init, token-bucket pacing between calls,
    * error→'N/A' fill — driven by the deterministic SlowRowClassifier
    * instead of being short-circuited by the vectorized rule path. The
    * NCT00000009 row has no criteria, so the classifier THROWS on it and
    * the seam's catch fills 'N/A' (etl.py:400-407) — the oracle encodes
    * that as the criteria='N/A' CASE arm. qps=100/partition keeps the
    * bucket engaged (EnrichSpec asserts the pacing floor) without
    * dominating Verify wall-time on a 14-row fixture. */
  private val enrichSeamQ: Fn = (s, _) =>
    Enrich.mapPartitionsEnrich(
      Flatten(StudiesSource.readStudies(s, FixturePath)),
      new SlowRowClassifier(), perPartitionQps = 100.0)
      .select("nct_id", "ai_determined_value").orderBy("nct_id")
  private val enrichSeamSql =
    s"""$oracleBase
       |SELECT nct_id,
       |  CASE WHEN criteria = 'N/A' THEN 'N/A'
       |       ELSE ${classifierCase("criteria")} END AS ai_determined_value
       |FROM flat ORDER BY nct_id""".stripMargin

  val all: Seq[Q] = Seq(
    Q("etl_flatten", flattenQ, Some(flattenSql)),
    Q("etl_classify_all", classifyAllQ, Some(classifyAllSql)),
    Q("etl_enrich_gated", enrichGatedQ, Some(enrichGatedSql)),
    Q("etl_enrich_seam", enrichSeamQ, Some(enrichSeamSql)),
    Q("etl_essie_filter", essieQ, Some(essieSql)))
}
