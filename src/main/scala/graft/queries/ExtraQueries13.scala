package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DoubleType, LongType}
import graft.Tables
import graft.queries.Relational.{Fn, Q}

/** Round-7 batch 12b: FIFO lot allocation (the classic interval-overlap
  * matching problem), a delete-cascade (right-to-be-forgotten) audit,
  * video keyframe selection over the m07 scene structure, and blocklist
  * term screening.
  *
  * Same determinism discipline as ExtraQueries3–12.
  */
object ExtraQueries13 {

  private def orders(s: SparkSession, d: String) = Tables.orders(s, d)
  private def lineitem(s: SparkSession, d: String) = Tables.lineitem(s, d)
  private def customer(s: SparkSession, d: String) = Tables.customer(s, d)
  private def docs(s: SparkSession, d: String) = Tables.documents(s, d)

  // ---------------------------------------- r108 FIFO allocation

  /** r108: FIFO lot allocation — treat each part's 'R'-flagged
    * lineitems as inventory receipts and the rest as issues, both in
    * (shipdate, orderkey, linenumber) arrival order, and match issue
    * demand against receipt lots first-in-first-out. The classic
    * cumulative-interval rewrite makes FIFO set-based instead of
    * procedural: receipt k covers the cumulative supply interval
    * [Σqty<k, Σqty≤k) and issue j the demand interval likewise, and the
    * FIFO allocation of (receipt, issue) is exactly the OVERLAP of the
    * two intervals — a per-part band join, no loop. This is the lot
    * costing / lineage-matching primitive warehouses run at close.
    *
    * Exactness: quantities are integral in this fixture (cast pinned),
    * so intervals and overlaps are pure BIGINT; ties in the arrival
    * order carry the quantity as final sort key (the u22 trick) so the
    * interval MULTISET — and therefore every per-part summary — is
    * invariant under residual tie resolution.
    * Scale shape: two part-keyed cumsum windows, then a part-keyed
    * equi-join whose band predicate only pairs overlapping intervals;
    * candidate pairs per part are ≤ receipts+issues−1 after the
    * predicate, and the whole thing shuffles on l_partkey — AQE-
    * splittable, skew-salvageable, never a global sort. */
  private val r108: Fn = (s, d) => {
    val base = lineitem(s, d).select(col("l_partkey"), col("l_orderkey"),
      col("l_linenumber"), col("l_shipdate"), col("l_returnflag"),
      col("l_quantity").cast(LongType).as("qty"))
    def cum(df: DataFrame, lo: String, hi: String): DataFrame = {
      val w = Window.partitionBy("l_partkey")
        .orderBy("l_shipdate", "l_orderkey", "l_linenumber", "qty")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      df.withColumn(hi, sum(col("qty")).over(w))
        .withColumn(lo, col(hi) - col("qty"))
    }
    val rec = cum(base.filter(col("l_returnflag") === "R"), "rlo", "rhi")
      .select(col("l_partkey"), col("rlo"), col("rhi"))
    val iss = cum(base.filter(col("l_returnflag") =!= "R"), "ilo", "ihi")
      .select(col("l_partkey").as("ipart"), col("ilo"), col("ihi"))
    val alloc = rec.join(iss,
      col("l_partkey") === col("ipart") &&
        col("rlo") < col("ihi") && col("ilo") < col("rhi"))
      .withColumn("alloc_qty",
        least(col("rhi"), col("ihi")) - greatest(col("rlo"), col("ilo")))
    val perPartAlloc = alloc.groupBy("l_partkey")
      .agg(count(lit(1)).as("n_allocations"),
        sum(col("alloc_qty")).cast(LongType).as("matched_qty"))
    val supply = rec.groupBy("l_partkey").agg(max(col("rhi")).cast(LongType).as("supply_qty"),
      count(lit(1)).as("n_lots"))
    val demand = iss.groupBy(col("ipart").as("l_partkey"))
      .agg(max(col("ihi")).cast(LongType).as("demand_qty"), count(lit(1)).as("n_issues"))
    supply.join(demand, Seq("l_partkey"), "full_outer")
      .join(perPartAlloc, Seq("l_partkey"), "left")
      .select(col("l_partkey"),
        coalesce(col("n_lots"), lit(0L)).as("n_lots"),
        coalesce(col("n_issues"), lit(0L)).as("n_issues"),
        coalesce(col("supply_qty"), lit(0L)).as("supply_qty"),
        coalesce(col("demand_qty"), lit(0L)).as("demand_qty"),
        coalesce(col("n_allocations"), lit(0L)).as("n_allocations"),
        coalesce(col("matched_qty"), lit(0L)).as("matched_qty"))
      .withColumn("unmet_demand", col("demand_qty") - col("matched_qty"))
      .withColumn("unused_supply", col("supply_qty") - col("matched_qty"))
      .orderBy("l_partkey")
  }

  private val r108Sql =
    """WITH base AS (
      |  SELECT l_partkey, l_orderkey, l_linenumber, l_shipdate, l_returnflag,
      |         CAST(l_quantity AS BIGINT) AS qty
      |  FROM lineitem),
      |rec AS (
      |  SELECT l_partkey,
      |         sum(qty) OVER w - qty AS rlo, sum(qty) OVER w AS rhi
      |  FROM base WHERE l_returnflag = 'R'
      |  WINDOW w AS (PARTITION BY l_partkey
      |               ORDER BY l_shipdate, l_orderkey, l_linenumber, qty
      |               ROWS UNBOUNDED PRECEDING)),
      |iss AS (
      |  SELECT l_partkey,
      |         sum(qty) OVER w - qty AS ilo, sum(qty) OVER w AS ihi
      |  FROM base WHERE l_returnflag <> 'R'
      |  WINDOW w AS (PARTITION BY l_partkey
      |               ORDER BY l_shipdate, l_orderkey, l_linenumber, qty
      |               ROWS UNBOUNDED PRECEDING)),
      |alloc AS (
      |  SELECT r.l_partkey, count(*) AS n_allocations,
      |         CAST(sum(least(r.rhi, i.ihi) - greatest(r.rlo, i.ilo)) AS BIGINT) AS matched_qty
      |  FROM rec r JOIN iss i
      |    ON r.l_partkey = i.l_partkey AND r.rlo < i.ihi AND i.ilo < r.rhi
      |  GROUP BY 1),
      |supply AS (SELECT l_partkey, CAST(max(rhi) AS BIGINT) AS supply_qty,
      |                  count(*) AS n_lots FROM rec GROUP BY 1),
      |demand AS (SELECT l_partkey, CAST(max(ihi) AS BIGINT) AS demand_qty,
      |                  count(*) AS n_issues FROM iss GROUP BY 1)
      |SELECT COALESCE(s.l_partkey, d.l_partkey) AS l_partkey,
      |       COALESCE(s.n_lots, 0) AS n_lots,
      |       COALESCE(d.n_issues, 0) AS n_issues,
      |       COALESCE(s.supply_qty, 0) AS supply_qty,
      |       COALESCE(d.demand_qty, 0) AS demand_qty,
      |       COALESCE(a.n_allocations, 0) AS n_allocations,
      |       COALESCE(a.matched_qty, 0) AS matched_qty,
      |       COALESCE(d.demand_qty, 0) - COALESCE(a.matched_qty, 0) AS unmet_demand,
      |       COALESCE(s.supply_qty, 0) - COALESCE(a.matched_qty, 0) AS unused_supply
      |FROM supply s
      |FULL OUTER JOIN demand d ON s.l_partkey = d.l_partkey
      |LEFT JOIN alloc a ON COALESCE(s.l_partkey, d.l_partkey) = a.l_partkey
      |ORDER BY 1""".stripMargin

  // ---------------------------------------- u24 delete cascade audit

  val DeleteMod = 20

  /** u24: delete-cascade (right-to-be-forgotten) audit — given a
    * deletion cohort (customers with c_custkey ≡ 0 mod [[DeleteMod]]),
    * size the cascade a compliant erasure must perform: the customers
    * themselves, their orders, and those orders' lineitems. Every
    * governance pipeline runs this BEFORE the delete (cost/blast-radius
    * estimate) and AFTER it (verification that counts went to zero);
    * u05/u19's FK edges are exactly the graph the cascade walks.
    *
    * Exactness: integer counts and one rounded fraction per table.
    * Scale shape: the cohort key set flows through the same keyed
    * semi-joins the delete itself would use — customer → orders is one
    * shuffle, orders → lineitem one more; nothing is collected, and at
    * 100 TB the semi-join sides are Bloom-prunable (d22's gate is the
    * probe-side optimization of exactly this walk). */
  private val u24: Fn = (s, d) => {
    val delC = customer(s, d).filter(col("c_custkey") % DeleteMod === 0)
      .select(col("c_custkey"))
    val delO = orders(s, d).join(delC, col("o_custkey") === col("c_custkey"), "left_semi")
      .select(col("o_orderkey"))
    val delL = lineitem(s, d).join(delO, col("l_orderkey") === col("o_orderkey"), "left_semi")
    // fully declarative — one (total, deleted) aggregate pair per table,
    // no driver-side count() actions (the eager-count lesson from r4)
    def row(name: String, total: DataFrame, deleted: DataFrame): DataFrame =
      total.agg(count(lit(1)).as("rows_total"))
        .crossJoin(deleted.agg(count(lit(1)).as("rows_deleted")))
        .select(lit(name).as("table_name"), col("rows_total"), col("rows_deleted"))
    row("customer", customer(s, d), delC)
      .unionByName(row("orders", orders(s, d), delO))
      .unionByName(row("lineitem", lineitem(s, d), delL))
      .withColumn("delete_frac", round(col("rows_deleted").cast(DoubleType) /
        col("rows_total").cast(DoubleType), 6))
      .orderBy("table_name")
  }

  private val u24Sql =
    s"""WITH delc AS (SELECT c_custkey FROM customer WHERE c_custkey % $DeleteMod = 0),
       |delo AS (SELECT o_orderkey FROM orders WHERE o_custkey IN (SELECT c_custkey FROM delc)),
       |dell AS (SELECT l_orderkey FROM lineitem WHERE l_orderkey IN (SELECT o_orderkey FROM delo)),
       |rows_ AS (
       |  SELECT 'customer' AS table_name,
       |         (SELECT count(*) FROM customer) AS rows_total,
       |         (SELECT count(*) FROM delc) AS rows_deleted
       |  UNION ALL
       |  SELECT 'orders', (SELECT count(*) FROM orders), (SELECT count(*) FROM delo)
       |  UNION ALL
       |  SELECT 'lineitem', (SELECT count(*) FROM lineitem), (SELECT count(*) FROM dell))
       |SELECT table_name, CAST(rows_total AS BIGINT) AS rows_total,
       |       CAST(rows_deleted AS BIGINT) AS rows_deleted,
       |       round(CAST(rows_deleted AS DOUBLE) / CAST(rows_total AS DOUBLE), 6) AS delete_frac
       |FROM rows_
       |ORDER BY table_name""".stripMargin

  // ---------------------------------------- m16 keyframe selection

  /** m16: keyframe selection — pick one representative frame per m07
    * scene (the maximal-energy frame, ties to the earliest), the
    * standard thumbnail/embedding-anchor step after shot detection: a
    * video corpus ships one keyframe per scene to the image tower, not
    * every frame. Composes the REGISTERED m07 plan as the scene
    * structure (s11's compose-what-ships discipline) over the same
    * 64-byte frame walk through the real batched decode path.
    *
    * Exactness: scene ids are integer counts of cuts at-or-before each
    * frame; energies are exact unsigned-byte sums; selection is a
    * (desc energy, asc frame) row_number — total order both engines.
    * Scale shape: decode is map-side; the cut relation is tiny (one row
    * per detected cut), joined doc-keyed onto frames; the argmax is a
    * (doc, scene)-partitioned window. */
  /** m16 exposed for composition (m17 media manifest counts frames and
    * scenes through it). */
  private[queries] def keyframesFn: Fn = m16

  private val m16: Fn = (s, d) => {
    val cuts = CoverageQueries.sceneCutsFn(s, d)
      .select(col("doc_id").as("c_doc"), col("frame_no").as("cut_fno"))
    val frames = graft.multimodal.Multimodal.frameByteSum(
      graft.multimodal.Multimodal.attachPayload(
        docs(s, d).filter(!col("source").isin("src0", "src1"))),
      "video/mp4", 64)
    val withScene = frames
      .join(cuts, col("doc_id") === col("c_doc") && col("cut_fno") <= col("frame_no"), "left")
      .groupBy(col("doc_id"), col("frame_no"), col("e_sum"))
      .agg(count(col("cut_fno")).as("scene_id"))
    val w = Window.partitionBy("doc_id", "scene_id").orderBy(desc("e_sum"), col("frame_no"))
    withScene.withColumn("rk", row_number().over(w))
      .groupBy(col("doc_id"), col("scene_id"))
      .agg(count(lit(1)).as("n_frames"),
        min(when(col("rk") === 1, col("frame_no"))).cast(LongType).as("keyframe_no"),
        min(when(col("rk") === 1, col("e_sum"))).cast(LongType).as("key_e_sum"))
      .orderBy("doc_id", "scene_id")
  }

  private[queries] def m16Sql: String =
    s"""WITH cuts0 AS (${CoverageQueries.m07Sql}),
       |cuts AS (SELECT doc_id AS c_doc, frame_no AS cut_fno FROM cuts0),
       |docs AS (SELECT doc_id, text FROM documents
       |         WHERE source NOT IN ('src0', 'src1') AND text IS NOT NULL),
       |fr AS (
       |  SELECT d.doc_id, unnest(range(0, (length(d.text) - 1) // 64 + 1)) AS fno FROM docs d),
       |en AS (
       |  SELECT f.doc_id, f.fno,
       |         CAST(list_sum(list_transform(split(substring(d.text, CAST(f.fno * 64 + 1 AS INTEGER), 64), ''),
       |                                      c -> ascii(c))) AS BIGINT) AS e_sum
       |  FROM fr f JOIN docs d ON f.doc_id = d.doc_id),
       |scened AS (
       |  SELECT e.doc_id, e.fno, e.e_sum, count(c.cut_fno) AS scene_id
       |  FROM en e LEFT JOIN cuts c ON e.doc_id = c.c_doc AND c.cut_fno <= e.fno
       |  GROUP BY 1, 2, 3),
       |ranked AS (
       |  SELECT doc_id, scene_id, fno, e_sum,
       |         row_number() OVER (PARTITION BY doc_id, scene_id
       |                            ORDER BY e_sum DESC, fno) AS rk
       |  FROM scened)
       |SELECT doc_id, scene_id, count(*) AS n_frames,
       |       CAST(min(CASE WHEN rk = 1 THEN fno END) AS BIGINT) AS keyframe_no,
       |       CAST(min(CASE WHEN rk = 1 THEN e_sum END) AS BIGINT) AS key_e_sum
       |FROM ranked
       |GROUP BY 1, 2
       |ORDER BY 1, 2""".stripMargin

  // ---------------------------------------- t35 blocklist screening

  val Blocklist: Seq[String] = Seq("slow", "dup", "null", "error", "drop")
  val FlagThreshold = 3

  /** t35: blocklist term screening — the multi-term content filter
    * every ingest pipeline runs before training (safety/compliance
    * lists scale to millions of terms; the mechanism is identical):
    * count exact-token blocklist hits per document, flag documents at
    * ≥[[FlagThreshold]] hits, and report per-term exposure including
    * zero-hit terms (a screening report that silently drops unmatched
    * terms can't prove the list was applied). t12 redacts PII by
    * regex shape; t35 screens by dictionary membership — the two
    * complementary halves of content filtering.
    *
    * Exactness: token-boundary equality on the same split, integer
    * counts, one rounded rate per term.
    * Scale shape: the blocklist is a broadcast dictionary joined
    * against the token stream (at production list sizes the same join
    * hash-partitions both sides); per-term and per-doc rollups are
    * keyed aggregations of the matched subset only. */
  private val t35: Fn = (s, d) => {
    import s.implicits._
    val terms = Blocklist.toDF("term")
    val tok = docs(s, d)
      .select(col("doc_id"), explode(split(col("text"), " ")).as("term"))
    val hits = tok.join(broadcast(terms), Seq("term"))
      .groupBy("doc_id", "term").agg(count(lit(1)).as("occ"))
    val docHits = hits.groupBy("doc_id").agg(sum(col("occ")).as("doc_occ"))
      .filter(col("doc_occ") >= FlagThreshold)
    // corpus size as a 1-row broadcast (the t14 idiom), not a driver count
    val nDocs = docs(s, d).agg(count(lit(1)).as("n_docs"))
    terms
      .join(hits.groupBy("term").agg(
        countDistinct(col("doc_id")).as("n_docs_hit"),
        sum(col("occ")).cast(LongType).as("total_occ")), Seq("term"), "left")
      .crossJoin(broadcast(docHits.agg(count(lit(1)).as("n_flagged_docs"))))
      .crossJoin(broadcast(nDocs))
      .select(col("term"),
        coalesce(col("n_docs_hit"), lit(0L)).as("n_docs_hit"),
        coalesce(col("total_occ"), lit(0L)).as("total_occ"),
        round(coalesce(col("n_docs_hit"), lit(0L)).cast(DoubleType) /
          col("n_docs").cast(DoubleType), 6).as("doc_hit_rate"),
        col("n_flagged_docs"))
      .orderBy("term")
  }

  private val t35Sql = {
    val termList = Blocklist.map(t => s"'$t'").mkString(", ")
    s"""WITH terms AS (SELECT unnest([$termList]) AS term),
       |tok AS (SELECT doc_id, unnest(string_split(text, ' ')) AS term FROM documents),
       |hits AS (
       |  SELECT t.doc_id, t.term, count(*) AS occ
       |  FROM tok t JOIN terms b ON t.term = b.term
       |  GROUP BY 1, 2),
       |flagged AS (
       |  SELECT count(*) AS n_flagged_docs FROM (
       |    SELECT doc_id FROM hits GROUP BY doc_id
       |    HAVING sum(occ) >= $FlagThreshold) f),
       |per_term AS (
       |  SELECT term, count(DISTINCT doc_id) AS n_docs_hit,
       |         CAST(sum(occ) AS BIGINT) AS total_occ
       |  FROM hits GROUP BY 1)
       |SELECT b.term,
       |       CAST(COALESCE(p.n_docs_hit, 0) AS BIGINT) AS n_docs_hit,
       |       COALESCE(p.total_occ, 0) AS total_occ,
       |       round(CAST(COALESCE(p.n_docs_hit, 0) AS DOUBLE) /
       |             (SELECT count(*) FROM documents), 6) AS doc_hit_rate,
       |       f.n_flagged_docs
       |FROM terms b
       |LEFT JOIN per_term p ON b.term = p.term
       |CROSS JOIN flagged f
       |ORDER BY 1""".stripMargin
  }

  val all: Seq[Q] = Seq(
    Q("r108_fifo_allocation", r108, Some(r108Sql)),
    Q("u24_delete_cascade", u24, Some(u24Sql)),
    Q("m16_keyframes", m16, Some(m16Sql)),
    Q("t35_blocklist_screen", t35, Some(t35Sql)))
}
