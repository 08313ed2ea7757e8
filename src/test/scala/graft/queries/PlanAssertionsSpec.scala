package graft.queries

import org.scalatest.funsuite.AnyFunSuite
import graft.SparkTestSession

/** Executable plan regressions: the physical-plan properties the scale
  * design depends on, asserted so a future refactor cannot silently
  * lose them. */
class PlanAssertionsSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  private val sf = "/root/testdata/sf0.001"

  private def planOf(name: String): String =
    graft.SparkEntry.queries(name)(spark, sf).queryExecution.explainString(
      org.apache.spark.sql.execution.FormattedMode)

  test("q02: predicates and column pruning reach the parquet scan") {
    val p = planOf("q02_filter_project")
    assert(p.contains("PushedFilters"))
    assert(p.contains("LessThan(l_quantity,10.0)"))
    // read schema is pruned: shipdate needed for the filter, but wide
    // money columns not projected must be absent
    assert(p.contains("ReadSchema"))
    assert(!p.contains("l_tax"))
  }

  test("q05: tiny dimensions broadcast; no cartesian product anywhere") {
    val p = planOf("q05_region_revenue")
    assert(p.contains("BroadcastHashJoin"))
    assert(!p.contains("CartesianProduct"))
  }

  test("q08: global top-k avoids a full sort (TakeOrderedAndProject)") {
    val p = planOf("q08_global_topk")
    assert(p.contains("TakeOrderedAndProject"))
  }

  test("q01: aggregation is partial (map-side) before the shuffle") {
    val p = planOf("q01_pricing_summary")
    // two HashAggregate phases around one exchange (formatted mode puts
    // the partitioning on the Arguments line)
    assert("HashAggregate".r.findAllIn(p).size >= 2)
    assert(p.contains("hashpartitioning"))
  }

  test("s01: query side is broadcast, not shuffled") {
    val p = planOf("s01_ann_bruteforce")
    assert(p.contains("Broadcast"))
    assert(!p.contains("CartesianProduct"))
  }

  test("dedup queries never plan a cartesian product") {
    Seq("d01_exact_dedup", "d02_bow_dedup", "d03_ngram_jaccard",
      "d04_minhash_lsh", "d05_simhash", "d06_embedding_neardup",
      "d07_decontaminate", "d09_embedding_ivf_neardup",
      "d10_duplicate_spans").foreach { q =>
      assert(!planOf(q).contains("CartesianProduct"), q)
    }
  }

  test("s24: the PPR loop state carries no dense seed x node scaffold") {
    // r8 verdict item 3: the state used to start from seeds CROSS JOIN
    // nodes and union a |Q|.|V| zero relation every round. The sparse
    // rewrite must keep ALL cross-join shapes out of the loop lineage —
    // the final DataFrame's plan chains every round, so one unkeyed
    // join anywhere in the iteration would surface here.
    val p = planOf("s24_personalized_pr")
    assert(!p.contains("CartesianProduct"), "dense scaffold: cartesian in s24 plan")
    assert(!p.contains("BroadcastNestedLoopJoin"), "dense scaffold: unkeyed join in s24 plan")
  }

  test("etl flatten plan is a single projection over the scan (no shuffle)") {
    val p = planOf("etl_classify_all")
    assert(!p.contains("hashpartitioning"))
  }

  test("signature stages are map-only: no exchange below the first join/window") {
    // the fused kernels moved MinHash/SimHash signatures into pure
    // projections — the ONLY exchanges left in d05 are the bucket-cap
    // window and the candidate join machinery, none for signatures
    val sig = DedupQueries.simhashSignatures(spark, sf)
      .queryExecution.explainString(org.apache.spark.sql.execution.FormattedMode)
    assert(!sig.contains("Exchange"), "simhash signature stage must not shuffle")
    val mh = DedupQueries.minhashSignatures(spark, sf)
      .queryExecution.explainString(org.apache.spark.sql.execution.FormattedMode)
    assert(!mh.contains("Exchange"), "minhash signature stage must not shuffle")
  }

  test("t10/p01: pipeline stats and split are map-only up to the output sort") {
    // one allowed exchange: the final total-order rangepartitioning
    Seq("t10_repetition_quality", "p01_hash_split").foreach { q =>
      val p = planOf(q)
      assert(!p.contains("hashpartitioning"), s"$q must not hash-shuffle")
    }
  }

  test("d07: decontamination joins on shingles, never all-pairs") {
    assert(!planOf("d07_decontaminate").contains("CartesianProduct"))
  }

  test("p06/d08: composed pipeline and cluster plans stay keyed (no cartesian)") {
    Seq("p06_assemble_training_set", "d08_dedup_clusters").foreach { q =>
      assert(!planOf(q).contains("CartesianProduct"), q)
    }
  }

  test("p02: stratified sample is one partial-agg shuffle, no join") {
    val p = planOf("p02_stratified_sample")
    assert("HashAggregate".r.findAllIn(p).size >= 2, "needs map-side partial agg")
    assert(!p.contains("Join"))
  }

  test("p03: packing window is partitioned by source — never a global window") {
    val p = planOf("p03_sequence_packing")
    assert(p.contains("Window"))
    // a partition-less window plans Exchange SinglePartition under WindowExec
    assert(!p.contains("SinglePartition"), "packing must not serialize the corpus")
  }

  test("st2: interval join stays an equi-hash join on user_id, not a loop join") {
    val p = planOf("st2_interval_join")
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"))
    assert(p.contains("Join"), "expected a keyed join on user_id")
  }

  test("p04: rate relation broadcasts back onto the corpus") {
    val p = planOf("p04_mixture_sample")
    assert(p.contains("BroadcastHashJoin"), "5-row rates must broadcast")
    assert(!p.contains("CartesianProduct"))
  }

  test("p05: shuffle-order window is partitioned by shard") {
    val p = planOf("p05_corpus_shuffle")
    assert(p.contains("hashpartitioning(shard"), "rank must window per shard")
  }

  test("s05: quantized scan broadcasts queries; no cartesian") {
    val p = planOf("s05_ann_quantized")
    assert(p.contains("Broadcast"))
    assert(!p.contains("CartesianProduct"))
  }

  test("prefix-jaccard strategy: no cartesian; candidate join is keyed") {
    val p = DedupQueries.jaccardPairsPrefix(spark, sf)
      .queryExecution.explainString(org.apache.spark.sql.execution.FormattedMode)
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"))
  }
  test("r43: top-k per group plans the native bounded-heap operator, no window sort") {
    val p = planOf("r43_topk_native")
    assert(p.contains("TopKPerGroup"), "native operator expected")
    assert(!p.contains("Window"), "no Window node should remain")
  }

  test("ANN top-k selection also goes through the native operator") {
    assert(planOf("s01_ann_bruteforce").contains("TopKPerGroup"))
  }
  test("s08: hard-negative mining broadcasts queries, ranks natively") {
    val p = planOf("s08_hard_negatives")
    assert(p.contains("TopKPerGroup"), "native operator expected")
    assert(p.contains("Broadcast"))
    assert(!p.contains("CartesianProduct"))
  }
  test("p12: per-source cap plans the native bounded-heap operator") {
    val p = planOf("p12_per_source_cap")
    assert(p.contains("TopKPerGroup"), "native operator expected")
    assert(!p.contains("CartesianProduct"))
  }
  test("r53: funnel stages stack on ONE user shuffle (no per-stage exchange)") {
    val p = planOf("r53_funnel")
    // exactly one hash exchange on user_id feeds all three Window nodes
    // and the per-user rollup; the only other exchange is the one-row
    // global total
    assert(p.sliding("hashpartitioning(user_id".length).count(
      _ == "hashpartitioning(user_id") == 1, p.take(600))
    assert(p.sliding(") Window".length).count(_ == ") Window") == 3)
  }
  test("r44: pure band join plans as a bucket equi-join, never a nested loop") {
    val p = planOf("r44_band_join")
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"), p.take(400))
  }
  test("r48: tie-aware rank top-k plans the native operator with the sorted partial") {
    val p = planOf("r48_rank_topk_native")
    assert(p.contains("TopKPerGroup"), "native operator expected")
    assert(p.contains("TopKPerGroupSortedPartial"), "tie-aware map-side bound expected")
    assert(!p.contains("Window"), "no Window node should remain")
  }

  test("s07: hybrid retrieval broadcasts the query sides; no cartesian") {
    val p = planOf("s07_hybrid_rrf")
    assert(p.contains("Broadcast"))
    assert(!p.contains("CartesianProduct"))
  }

  test("t13: the exact confirm pass filters map-side before its aggregation") {
    val p = planOf("t13_heavy_hitters")
    // candidate membership must be a scan-side Filter, not a join
    assert(p.contains("Filter"))
    assert("HashAggregate".r.findAllIn(p).size >= 2, "partial agg expected")
  }

  test("p10: incremental refresh never rescans more than partials + delta") {
    val p = planOf("p10_incremental_agg")
    assert(!p.contains("CartesianProduct"))
    assert(p.contains("Union"), "standing/delta partials merge via union")
  }

  test("r49: both SCD2 windows share one exchange on the history key") {
    val p = planOf("r49_scd2_history")
    // exactly two exchanges total: one hash (windows) + one range (output order)
    assert("Exchange".r.findAllIn(p).size <= 4, // formatted mode lists nodes twice
      "the two windows must reuse a single hash exchange")
  }

  test("r55: deep star join broadcasts the tiny dims, never goes cartesian") {
    val p = planOf("r55_market_share")
    assert(p.contains("BroadcastHashJoin"), "nation/region must broadcast")
    assert(!p.contains("CartesianProduct"))
    assert(!p.contains("BroadcastNestedLoopJoin"), "all joins have equi keys")
  }

  test("p13: global k-smallest priorities plan as TakeOrderedAndProject") {
    val p = planOf("p13_weighted_sample")
    assert(p.contains("TakeOrderedAndProject"),
      "weighted sample must use per-partition heaps, not a full sort")
    assert(!p.contains("Window"), "no single-partition window allowed")
  }

  test("p14: curriculum cutoffs broadcast back; no global sort or window") {
    val p = planOf("p14_curriculum_bins")
    assert(!p.contains("Window"), "quartile binning must not use ntile()")
    assert(p.contains("BroadcastNestedLoopJoin") || p.contains("BroadcastExchange"),
      "the one-row cutoff relation must broadcast")
  }

  test("u06: k-anonymity audit is one partial-agg'd groupBy, no join") {
    val p = planOf("u06_k_anonymity")
    assert("HashAggregate".r.findAllIn(p).size >= 2,
      "class-size count must partial-aggregate map-side")
    assert(!p.contains("Join"), "QI class audit needs no join")
  }

  test("t17: encode is join-free — merges ride the projection as literals") {
    val p = planOf("t17_bpe_encode")
    assert(!p.contains("Join"), "the merge table must fold into the map, not join")
    assert("HashAggregate".r.findAllIn(p).size >= 2,
      "per-doc counts must partial-aggregate map-side")
  }

  test("t18: each training round is one aggregation, never a join") {
    val p = planOf("t18_perceptron_quality")
    assert(!p.contains("Join"), "batch-perceptron rounds are single aggregations")
  }

  test("u12: embedding audit is one keyed partial agg, no join") {
    val p = planOf("u12_embedding_qa")
    assert(!p.contains("Join"))
    assert("HashAggregate".r.findAllIn(p).size >= 2)
  }

  test("m06/m08: the source pre-filter reaches the parquet scan") {
    // the registered plans hide behind the decode RDD boundary, so
    // assert on the exact pre-decode DataFrame the queries build: the
    // plain `source` predicate must be in PushedFilters (the mime
    // dispatch inside the decode path is a CASE over source, which
    // Parquet cannot evaluate — without the pre-filter the audio/video
    // slices would scan every source's row groups at 100 TB)
    import org.apache.spark.sql.functions.col
    val pre = graft.multimodal.Multimodal.attachPayload(
      graft.Tables.documents(spark, sf).filter(col("source") === "src1"))
    val p = pre.queryExecution.explainString(
      org.apache.spark.sql.execution.FormattedMode)
    assert(p.contains("PushedFilters") && p.contains("EqualTo(source,src1)"), p)
  }
}
