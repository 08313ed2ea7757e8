package graft.queries

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.catalyst.plans.logical.{Window => LWindow}
import graft.SparkTestSession

/** Registry-WIDE plan lint: every registered query's plan is checked
  * against the scale invariants, so a new query cannot silently ship an
  * anti-pattern the per-query pins never look at. Exceptions are
  * explicit allowlists with the reason recorded here.
  */
class PlanLintSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  private val sf = "/root/testdata/sf0.001"

  private lazy val executions =
    graft.SparkEntry.queries.map { case (name, fn) =>
      name -> fn(spark, sf).queryExecution
    }

  private lazy val plans: Map[String, String] =
    executions.map { case (name, qe) =>
      name -> qe.explainString(org.apache.spark.sql.execution.FormattedMode)
    }

  test("no query plans a CartesianProduct") {
    val offenders = plans.filter(_._2.contains("CartesianProduct")).keys.toSeq.sorted
    assert(offenders.isEmpty, s"cartesian products in: $offenders")
  }

  // Global (unpartitioned) windows move every row to one reducer. The
  // allowlist is the operators where that is either the point or the
  // window input is bounded-tiny by construction:
  //  - etl_enrich_gated: the reference's head-N-in-global-order gate
  //    (etl.py:355-364); the module documents enrichAll as the scale path.
  //  - p05/p06: the final global shuffle-rank that materializes ONE
  //    training-set order; sharding immediately re-partitions it.
  //  - p04/p06 (mixtureCuts): grand-total window over the per-SOURCE
  //    aggregate — input rows = number of sources, never the corpus.
  //  - u04: ranks the 20 survivors of a TakeOrderedAndProject.
  //  - p16: the waterfill level needs a total order over the per-SOURCE
  //    availability aggregate — same #sources-rows class as p04.
  //  - p17: bin-packing cumsum over file METADATA (#sources × #shards
  //    rows) — the driver-side listing class Spark itself packs scan
  //    splits from, never the corpus.
  //  - t19: ranks the 1000 survivors of a TakeOrderedAndProject (u04
  //    class — bounded by the preceding limit, never the vocabulary).
  //  - r62: running max over the DISTINCT-PRICE aggregate (input rows =
  //    price domain, 1000 here, never the part table; the skyline
  //    reduction happens in the preceding partial-agg'd groupBy).
  //  - r66: exact equi-depth histogram — the global ntile IS the
  //    operator's definition; it exists as the exact ground truth for
  //    r47's mergeable quantile sketch, which is the scale path
  //    (scaladoc records the pairing).
  private val globalWindowAllowed = Set(
    "etl_enrich_gated", "p05_corpus_shuffle", "p06_assemble_training_set",
    "p04_mixture_sample", "u04_skew_report", "p16_mixture_waterfill",
    "p17_compaction_plan", "t19_zipf_fit", "r62_skyline", "r66_equidepth_hist")

  private def hasGlobalWindow(name: String): Boolean =
    executions(name).optimizedPlan.collect {
      case w: LWindow if w.partitionSpec.isEmpty => w
    }.nonEmpty

  test("no query plans an unpartitioned Window outside the allowlist") {
    val offenders = executions.keys.filter(n => !globalWindowAllowed(n) && hasGlobalWindow(n))
    assert(offenders.isEmpty, s"global windows in: ${offenders.toSeq.sorted}")
    // detector self-test: the allowlisted plans DO contain the global
    // window this lint exists to catch — an always-false detector (e.g.
    // after a plan-format change) fails here instead of passing silently
    assert(globalWindowAllowed.exists(hasGlobalWindow),
      "detector found no global window even in the allowlisted queries")
  }

  test("no dumped result schema contains a nested type") {
    // The driver's correctness harness sorts the dumped parquet with
    // pandas across ALL columns and hashes cell reprs; an array/map/
    // struct column is unhashable there (r2: m05 died on
    // `unhashable type: numpy.ndarray`). Queries that build nested
    // values must explode/flatten them before registering.
    import org.apache.spark.sql.types.{ArrayType, MapType, StructType}
    val offenders = executions.collect {
      case (name, qe) if qe.analyzed.schema.fields.exists(f => f.dataType match {
        case _: ArrayType | _: MapType | _: StructType => true
        case _ => false
      }) => name
    }.toSeq.sorted
    assert(offenders.isEmpty, s"nested types in dumped schema of: $offenders")
  }

  test("every fact-table query reaches the scan with a pruned schema") {
    // lineitem is 16 columns; any lineitem scan reading them all is an
    // unpruned projection. (q01-style wide aggregations read at most 8.)
    val offenders = plans.filter { case (_, p) =>
      p.linesIterator.exists(l => l.contains("ReadSchema") && l.contains("lineitem") &&
        l.count(_ == ',') >= 15)
    }.keys.toSeq.sorted
    assert(offenders.isEmpty, s"unpruned lineitem scans in: $offenders")
  }
}
