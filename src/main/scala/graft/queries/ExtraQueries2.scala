package graft.queries

import org.apache.spark.sql.Column
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DecimalType, DoubleType, LongType, StringType}
import graft.Tables
import graft.queries.Relational.{Fn, Q}

/** Second coverage sweep: multiset set operations, regex extraction,
  * boolean/conditional aggregates, and moment statistics computed from
  * order-independent exact sums. */
object ExtraQueries2 {

  /** INTERSECT ALL / EXCEPT ALL / UNION (distinct) — multiset semantics
    * summarized per operator as (row count, key checksum) so one output
    * covers all three. */
  private val r36: Fn = (s, d) => {
    val o = Tables.orders(s, d)
    val a = o.filter(col("o_orderdate") < lit("1998-01-01").cast("timestamp")).select("o_custkey")
    val b = o.filter(col("o_totalprice") > 100000).select("o_custkey")
    val ia = a.intersectAll(b).withColumn("op", lit("intersect_all"))
    val ea = a.exceptAll(b).withColumn("op", lit("except_all"))
    val ud = a.union(b).distinct().withColumn("op", lit("union_distinct"))
    ia.unionByName(ea).unionByName(ud)
      .groupBy("op").agg(count(lit(1)).as("n"), sum(col("o_custkey")).as("key_sum"))
      .orderBy("op")
  }
  private val r36Sql =
    """WITH a AS (SELECT o_custkey FROM orders WHERE o_orderdate < TIMESTAMP '1998-01-01'),
      |     b AS (SELECT o_custkey FROM orders WHERE o_totalprice > 100000)
      |SELECT op, count(*) AS n, CAST(sum(o_custkey) AS BIGINT) AS key_sum FROM (
      |  SELECT 'intersect_all' AS op, o_custkey FROM (SELECT * FROM a INTERSECT ALL SELECT * FROM b) t1
      |  UNION ALL
      |  SELECT 'except_all' AS op, o_custkey FROM (SELECT * FROM a EXCEPT ALL SELECT * FROM b) t2
      |  UNION ALL
      |  SELECT 'union_distinct' AS op, o_custkey FROM (SELECT * FROM a UNION SELECT * FROM b) t3) u
      |GROUP BY op ORDER BY op""".stripMargin

  /** Regex scalar functions: rlike filter + group extraction. */
  private val r37: Fn = (s, d) =>
    Tables.part(s, d)
      .filter(col("p_name").rlike("^[a-z]+ widget$"))
      .select(
        col("p_partkey"),
        regexp_extract(col("p_name"), "^([a-z]+) widget$", 1).as("adjective"),
        col("p_brand").rlike("Brand#1[0-9]").as("is_brand_1x"))
      .orderBy("p_partkey")
  private val r37Sql =
    """SELECT p_partkey,
      |  regexp_extract(p_name, '^([a-z]+) widget$', 1) AS adjective,
      |  regexp_matches(p_brand, 'Brand#1[0-9]') AS is_brand_1x
      |FROM part WHERE regexp_matches(p_name, '^[a-z]+ widget$')
      |ORDER BY p_partkey""".stripMargin

  /** Boolean / conditional aggregates. */
  private val r38: Fn = (s, d) =>
    Tables.orders(s, d)
      .groupBy(col("o_orderstatus"))
      .agg(
        count_if(col("o_totalprice") > 150000).as("n_big"),
        bool_or(col("o_orderpriority") === "1-URGENT").as("any_urgent"),
        bool_and(col("o_totalprice") > 0).as("all_positive"),
        max(col("o_orderpriority") === "1-URGENT").as("max_bool"))
      .orderBy("o_orderstatus")
  private val r38Sql =
    """SELECT o_orderstatus,
      |  count(*) FILTER (WHERE o_totalprice > 150000) AS n_big,
      |  bool_or(o_orderpriority = '1-URGENT') AS any_urgent,
      |  bool_and(o_totalprice > 0) AS all_positive,
      |  max(o_orderpriority = '1-URGENT') AS max_bool
      |FROM orders GROUP BY o_orderstatus ORDER BY o_orderstatus""".stripMargin

  /** Sample variance / stddev from order-independent exact sums
    * (sum and sum-of-squares in exact decimal, identical double
    * combining arithmetic on both sides — built-in stddev uses online
    * accumulation whose result depends on partitioning order). */
  private val r39: Fn = (s, d) => {
    val qDec = col("l_quantity").cast(DecimalType(24, 2))
    // square in DECIMAL, not double: a double product rounded onto the
    // scale-4 grid can land on a half-way point (engine-dependent tie).
    val qSqDec = (col("l_quantity").cast(DecimalType(12, 2)) *
      col("l_quantity").cast(DecimalType(12, 2))).cast(DecimalType(28, 4))
    Tables.lineitem(s, d)
      .groupBy(col("l_returnflag"))
      .agg(
        count(lit(1)).as("n"),
        sum(qDec).cast(DoubleType).as("s1"),
        sum(qSqDec).cast(DoubleType).as("s2"))
      .select(
        col("l_returnflag"), col("n"),
        ((col("s2") - col("s1") * col("s1") / col("n")) / (col("n") - 1)).as("var_qty"),
        sqrt((col("s2") - col("s1") * col("s1") / col("n")) / (col("n") - 1)).as("stddev_qty"))
      .orderBy("l_returnflag")
  }
  private val r39Sql =
    """SELECT l_returnflag, n,
      |  (s2 - s1 * s1 / n) / (n - 1) AS var_qty,
      |  sqrt((s2 - s1 * s1 / n) / (n - 1)) AS stddev_qty
      |FROM (
      |  SELECT l_returnflag, count(*) AS n,
      |    CAST(sum(CAST(l_quantity AS DECIMAL(24,2))) AS DOUBLE) AS s1,
      |    CAST(sum(CAST(CAST(l_quantity AS DECIMAL(12,2)) * CAST(l_quantity AS DECIMAL(12,2)) AS DECIMAL(28,4))) AS DOUBLE) AS s2
      |  FROM lineitem GROUP BY l_returnflag) t
      |ORDER BY l_returnflag""".stripMargin

  /** u01: the schema-driven one-pass profiler pointed at lineitem —
    * exercises [[graft.operators.Profiler]] against a hand-written
    * per-column oracle. */
  private val u01: Fn = (s, d) =>
    graft.operators.Profiler.profile(graft.Tables.lineitem(s, d))

  private val u01Sql = {
    def num(c: String, t: String) =
      s"""SELECT '$c' AS "column", '$t' AS dtype, count(*) AS n_rows,
         |  CAST(sum(CASE WHEN $c IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_nulls,
         |  count(DISTINCT $c) AS n_distinct,
         |  CAST(trunc(CAST(min($c) AS DOUBLE) * 1e6) AS BIGINT) AS min_fp6,
         |  CAST(trunc(CAST(max($c) AS DOUBLE) * 1e6) AS BIGINT) AS max_fp6,
         |  CAST(NULL AS VARCHAR) AS min_str, CAST(NULL AS VARCHAR) AS max_str
         |FROM lineitem""".stripMargin
    def str(c: String, t: String) =
      s"""SELECT '$c' AS "column", '$t' AS dtype, count(*) AS n_rows,
         |  CAST(sum(CASE WHEN $c IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_nulls,
         |  count(DISTINCT $c) AS n_distinct,
         |  CAST(NULL AS BIGINT) AS min_fp6, CAST(NULL AS BIGINT) AS max_fp6,
         |  CAST(min($c) AS VARCHAR) AS min_str, CAST(max($c) AS VARCHAR) AS max_str
         |FROM lineitem""".stripMargin
    Seq(
      num("l_orderkey", "bigint"), num("l_partkey", "bigint"),
      num("l_suppkey", "bigint"), num("l_linenumber", "int"),
      num("l_quantity", "double"), num("l_extendedprice", "double"),
      num("l_discount", "double"), num("l_tax", "double"),
      str("l_returnflag", "string"), str("l_linestatus", "string"),
      str("l_shipdate", "timestamp_ntz")).mkString("", "\nUNION ALL\n", "\nORDER BY \"column\"")
  }

  /** r41: MAP-typed columns in-plan — build priority→count maps per
    * order status (map_from_entries over a sorted entry list, so key
    * order is deterministic in both engines), then key lookup,
    * cardinality, key join, and a value fold. */
  private val r41: Fn = (s, d) => {
    val ent = Tables.orders(s, d)
      .groupBy(col("o_orderstatus"), col("o_orderpriority"))
      .agg(count(lit(1)).as("n"))
      .groupBy(col("o_orderstatus"))
      .agg(map_from_entries(
        array_sort(collect_list(struct(col("o_orderpriority"), col("n"))))).as("m"))
    ent.select(
        col("o_orderstatus"),
        size(map_keys(col("m"))).cast("int").as("n_keys"),
        element_at(col("m"), "1-URGENT").as("urgent"),
        array_join(map_keys(col("m")), ",").as("keys"),
        aggregate(map_values(col("m")), lit(0L), (a, x) => a + x).as("total"))
      .orderBy("o_orderstatus")
  }
  private val r41Sql =
    """WITH e AS (
      |  SELECT o_orderstatus, o_orderpriority, count(*) AS n
      |  FROM orders GROUP BY 1, 2),
      |mm AS (
      |  SELECT o_orderstatus,
      |         map_from_entries(list_sort(list((o_orderpriority, n)))) AS m
      |  FROM e GROUP BY o_orderstatus)
      |SELECT o_orderstatus,
      |  CAST(cardinality(m) AS INTEGER) AS n_keys,
      |  m['1-URGENT'][1] AS urgent,
      |  array_to_string(map_keys(m), ',') AS keys,
      |  list_reduce(list_prepend(CAST(0 AS BIGINT), map_values(m)), (a, x) -> a + x) AS total
      |FROM mm ORDER BY o_orderstatus""".stripMargin

  /** r42: MERGE/upsert semantics as one declarative plan — the batch
    * snapshot-maintenance pattern (Delta-style MERGE without a table
    * format): base FULL OUTER JOIN updates on the key, coalesce toward
    * the update, tag each row kept/updated/inserted. The join shuffles
    * once on the key — with the base bucketed by key
    * (ScaleOps.writeBucketed) the nightly upsert at 100 TB is
    * shuffle-free on the base side. Updates here are derived
    * deterministically from the base (every 97th key gets +100 price;
    * five synthetic inserts) so the query is self-contained and
    * oracle-able. */
  private val r42: Fn = (s, d) => {
    val base = Tables.orders(s, d)
      .select(col("o_orderkey"), col("o_totalprice"), col("o_orderstatus"))
    val upd = base.filter(col("o_orderkey") % 97 === 0)
      .select(col("o_orderkey"), (col("o_totalprice") + 100.0).as("o_totalprice"),
        lit("U").as("o_orderstatus"))
      .unionByName(s.range(1, 6).select(
        (col("id") + 10000000L).as("o_orderkey"),
        lit(1000.5).as("o_totalprice"), lit("N").as("o_orderstatus")))
    base.as("b").join(upd.as("u"), col("b.o_orderkey") === col("u.o_orderkey"), "full_outer")
      .select(
        coalesce(col("b.o_orderkey"), col("u.o_orderkey")).as("o_orderkey"),
        coalesce(col("u.o_totalprice"), col("b.o_totalprice")).as("o_totalprice"),
        coalesce(col("u.o_orderstatus"), col("b.o_orderstatus")).as("o_orderstatus"),
        when(col("b.o_orderkey").isNotNull && col("u.o_orderkey").isNotNull, "updated")
          .when(col("u.o_orderkey").isNotNull, "inserted")
          .otherwise("kept").as("action"))
      .orderBy("o_orderkey")
  }
  private val r42Sql =
    """WITH base AS (SELECT o_orderkey, o_totalprice, o_orderstatus FROM orders),
      |upd AS (
      |  SELECT o_orderkey, o_totalprice + 100.0 AS o_totalprice, 'U' AS o_orderstatus
      |  FROM base WHERE o_orderkey % 97 = 0
      |  UNION ALL
      |  SELECT i + 10000000, 1000.5, 'N' FROM range(1, 6) t(i))
      |SELECT coalesce(b.o_orderkey, u.o_orderkey) AS o_orderkey,
      |       coalesce(u.o_totalprice, b.o_totalprice) AS o_totalprice,
      |       coalesce(u.o_orderstatus, b.o_orderstatus) AS o_orderstatus,
      |       CASE WHEN b.o_orderkey IS NOT NULL AND u.o_orderkey IS NOT NULL THEN 'updated'
      |            WHEN u.o_orderkey IS NOT NULL THEN 'inserted'
      |            ELSE 'kept' END AS action
      |FROM base b FULL OUTER JOIN upd u ON b.o_orderkey = u.o_orderkey
      |ORDER BY o_orderkey""".stripMargin

  /** Per-group top-k through the native whole-operator path: the
    * row_number-filter idiom below is rewritten by
    * [[graft.plans.TopKRewriteRule]] to the bounded-heap
    * TopKPerGroup operator (plan-asserted in PlanAssertionsSpec) —
    * no per-group sort, map-side k-bound before the shuffle. The oracle
    * runs the ordinary window SQL; results must be identical. */
  private val r43: Fn = (s, d) => {
    val w = Window.partitionBy(col("c_nationkey"))
      .orderBy(col("c_acctbal").desc, col("c_custkey"))
    Tables.customer(s, d)
      .select("c_nationkey", "c_custkey", "c_acctbal")
      .withColumn("rk", row_number().over(w).cast(LongType))
      .filter(col("rk") <= 3)
      .orderBy("c_nationkey", "rk")
  }
  private val r43Sql =
    """SELECT c_nationkey, c_custkey, c_acctbal, rk FROM (
      |  SELECT c_nationkey, c_custkey, c_acctbal,
      |         CAST(row_number() OVER (PARTITION BY c_nationkey
      |              ORDER BY c_acctbal DESC, c_custkey) AS BIGINT) AS rk
      |  FROM customer) t
      |WHERE rk <= 3 ORDER BY c_nationkey, rk""".stripMargin

  /** Tie-aware top-k through the native path: rank() <= 2 keeps EVERY
    * row of the two leading quantity classes per return flag (heavy
    * ties by construction — quantities are small integers). Rewritten
    * by TopKRewriteRule in ByRank mode: local-sorted streaming partial
    * (shuffle bounded at k tie classes per group per partition) +
    * streaming final. Order key cast to BIGINT — the rewrite declines
    * float order keys for tie-aware modes, and the cast also makes the
    * tie classes engine-exact. */
  private val r48: Fn = (s, d) => {
    val w = Window.partitionBy(col("l_returnflag")).orderBy(col("qty").desc)
    Tables.lineitem(s, d)
      .select(col("l_returnflag"), col("l_orderkey"), col("l_linenumber"),
        col("l_quantity").cast(LongType).as("qty"))
      .withColumn("rk", rank().over(w).cast(LongType))
      .filter(col("rk") <= 2)
      .orderBy("l_returnflag", "rk", "l_orderkey", "l_linenumber", "qty")
  }
  private val r48Sql =
    """SELECT l_returnflag, l_orderkey, l_linenumber,
      |       CAST(l_quantity AS BIGINT) AS qty,
      |       CAST(rank() OVER (PARTITION BY l_returnflag
      |            ORDER BY CAST(l_quantity AS BIGINT) DESC) AS BIGINT) AS rk
      |FROM lineitem
      |QUALIFY rk <= 2
      |ORDER BY l_returnflag, rk, l_orderkey, l_linenumber, qty""".stripMargin

  /** r49: SCD type-2 history build from a change log — the warehouse
    * pattern for attribute history at scale: change-detect (keep an
    * event only when the tracked attribute differs from the previous
    * one), then close each version with the NEXT change's timestamp
    * (lead), leaving the latest open (is_current). Both windows key on
    * user_id with the same ordering, so Catalyst reuses one hash
    * exchange + sort for the pair — one shuffle total, partitioned by
    * the history key, nothing global. Filtered to a deterministic user
    * slice to keep the oracle output reviewable. */
  private val r49: Fn = (s, d) => {
    val e = Tables.events(s, d).filter(col("user_id") % 100 === 0)
      .select(col("user_id"), col("ts"), col("event_id"), col("event_type"))
    val ord = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
    val changed = e.withColumn("prev", lag(col("event_type"), 1).over(ord))
      .filter(col("prev").isNull || col("prev") =!= col("event_type"))
    changed
      .withColumn("valid_to", lead(col("ts"), 1).over(ord))
      .select(col("user_id"), col("event_type").as("attr_value"),
        col("ts").as("valid_from"), col("valid_to"),
        col("valid_to").isNull.as("is_current"))
      .orderBy("user_id", "valid_from", "attr_value")
  }
  private val r49Sql =
    """WITH e AS (
      |  SELECT user_id, ts, event_id, event_type
      |  FROM events WHERE user_id % 100 = 0),
      |ch AS (
      |  SELECT user_id, ts, event_id, event_type FROM (
      |    SELECT user_id, ts, event_id, event_type,
      |           lag(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev
      |    FROM e) t
      |  WHERE prev IS NULL OR prev <> event_type)
      |SELECT user_id, event_type AS attr_value, ts AS valid_from,
      |       lead(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS valid_to,
      |       lead(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) IS NULL AS is_current
      |FROM ch ORDER BY user_id, valid_from, attr_value""".stripMargin

  /** r50: higher-order array functions — filter / exists / forall over
    * the per-doc token array, all row-local (one projection, no shuffle
    * until the output sort). These are the codegen-friendly alternative
    * to exploding arrays into rows when the aggregation is per-row:
    * explode+groupBy(doc_id) would shuffle every token; the HOF form
    * shuffles nothing. (Per [[spark-lambda-reeval-pitfall]]: the lambda
    * input here is a materialized column, so no captured expression is
    * re-evaluated per element.) */
  private val r50: Fn = (s, d) =>
    Tables.documents(s, d)
      .filter(col("doc_id") < 100)
      .select(col("doc_id"), split(col("text"), " ").as("w"))
      .select(col("doc_id"),
        size(col("w")).cast(LongType).as("n_tokens"),
        size(filter(col("w"), t => length(t) > 7)).cast(LongType).as("n_long_tokens"),
        exists(col("w"), t => t === "the").as("has_the"),
        forall(col("w"), t => length(t) < 30).as("all_short"),
        aggregate(col("w"), lit(0L), (acc, t) => acc + length(t).cast(LongType)).as("sum_token_chars"))
      .orderBy("doc_id")
  private val r50Sql =
    """SELECT doc_id,
      |  CAST(len(w) AS BIGINT) AS n_tokens,
      |  CAST(len(list_filter(w, t -> length(t) > 7)) AS BIGINT) AS n_long_tokens,
      |  len(list_filter(w, t -> t = 'the')) > 0 AS has_the,
      |  len(list_filter(w, t -> NOT length(t) < 30)) = 0 AS all_short,
      |  CAST(list_sum(list_transform(w, t -> length(t))) AS BIGINT) AS sum_token_chars
      |FROM (SELECT doc_id, string_split(text, ' ') AS w FROM documents WHERE doc_id < 100)
      |ORDER BY doc_id""".stripMargin

  /** u03: declarative data-quality gate — the expectations firewall an
    * ingest pipeline runs before admitting a batch: every row-level
    * rule is one conditional counter inside ONE aggregation over ONE
    * scan (map-side partials, no per-rule passes), plus a separate
    * column-pruned two-phase distinct for the uniqueness rule (folding
    * it into the same agg would trigger the distinct-rewrite Expand —
    * the u01 lesson). Output: one row per rule with its violation
    * count and verdict; a scheduler gates the batch on `bool_and(passed)`. */
  private val u03: Fn = (s, d) => {
    val dd = Tables.documents(s, d)
    val rules = Seq(
      ("doc_id_not_null", col("doc_id").isNull),
      ("n_chars_positive", col("n_chars") <= 0),
      ("n_chars_matches_text", length(col("text")) =!= col("n_chars")),
      ("lang_in_dictionary", !col("lang").isin("de", "en", "es", "fr", "zh")),
      ("source_not_null", col("source").isNull))
    val aggs = rules.map { case (n, bad) =>
      sum(when(bad, 1L).otherwise(0L)).as(n)
    }
    val rowRules = dd.agg(aggs.head, aggs.tail: _*)
      .select(explode(array(rules.map { case (n, _) =>
        struct(lit(n).as("rule"), col(n).as("n_violations"))
      }: _*)).as("r"))
      .select(col("r.rule"), col("r.n_violations"))
    val unique = dd.select(col("doc_id"))
      .agg((count(lit(1)) - count_distinct(col("doc_id"))).as("n_violations"))
      .select(lit("doc_id_unique").as("rule"), col("n_violations"))
    rowRules.unionByName(unique)
      .withColumn("passed", col("n_violations") === 0L)
      .orderBy("rule")
  }
  private val u03Sql =
    """WITH row_rules AS (
      |  SELECT * FROM (
      |    SELECT
      |      CAST(sum(CASE WHEN doc_id IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS doc_id_not_null,
      |      CAST(sum(CASE WHEN n_chars <= 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_chars_positive,
      |      CAST(sum(CASE WHEN length(text) <> n_chars THEN 1 ELSE 0 END) AS BIGINT) AS n_chars_matches_text,
      |      CAST(sum(CASE WHEN lang NOT IN ('de','en','es','fr','zh') THEN 1 ELSE 0 END) AS BIGINT) AS lang_in_dictionary,
      |      CAST(sum(CASE WHEN source IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS source_not_null
      |    FROM documents) t
      |  UNPIVOT (n_violations FOR rule IN (doc_id_not_null, n_chars_positive,
      |           n_chars_matches_text, lang_in_dictionary, source_not_null))),
      |uniq AS (
      |  SELECT 'doc_id_unique' AS rule,
      |         CAST(count(*) - count(DISTINCT doc_id) AS BIGINT) AS n_violations
      |  FROM documents)
      |SELECT rule, n_violations, n_violations = 0 AS passed
      |FROM (SELECT * FROM row_rules UNION ALL SELECT * FROM uniq)
      |ORDER BY rule""".stripMargin

  /** u04: key-skew report — the diagnostic that decides salting /
    * AQE-skew settings before a big join: per-key counts (one partial-
    * agg shuffle), the key's share of rows, and its ratio vs a uniform
    * key (ratio >> 1 = the reducer hot spot). Totals ride in on a
    * broadcast of ONE row; the top-20 selection is orderBy+limit
    * (TakeOrderedAndProject — bounded at any key cardinality), and the
    * only global window ranks the 20 survivors. */
  private val u04: Fn = (s, d) => {
    val li = Tables.lineitem(s, d).select(col("l_suppkey").as("key"))
    val counts = li.groupBy("key").agg(count(lit(1)).as("n"))
    val totals = counts.agg(sum(col("n")).as("total"), count(lit(1)).as("n_keys"))
    val scored = counts.crossJoin(broadcast(totals))
      .withColumn("share_ppm", (col("n") * 1000000L / col("total")).cast(LongType))
      .withColumn("skew_ratio",
        round(col("n").cast(DoubleType) * col("n_keys") / col("total"), 4))
    val top = scored.orderBy(desc("n"), col("key")).limit(20)
    top.withColumn("rk",
        row_number().over(Window.orderBy(desc("n"), col("key"))).cast(LongType))
      .select("rk", "key", "n", "share_ppm", "skew_ratio")
      .orderBy("rk")
  }
  private val u04Sql =
    """WITH counts AS (SELECT l_suppkey AS key, count(*) AS n FROM lineitem GROUP BY 1),
      |totals AS (SELECT CAST(sum(n) AS BIGINT) AS total, count(*) AS n_keys FROM counts),
      |scored AS (
      |  SELECT key, n, CAST(n * 1000000 // total AS BIGINT) AS share_ppm,
      |         round(CAST(n AS DOUBLE) * n_keys / total, 4) AS skew_ratio
      |  FROM counts, totals)
      |SELECT CAST(row_number() OVER (ORDER BY n DESC, key) AS BIGINT) AS rk,
      |       key, n, share_ppm, skew_ratio
      |FROM scored QUALIFY rk <= 20 ORDER BY rk""".stripMargin

  /** u05: cross-table referential integrity — the multimodal-corpus
    * sanity gate: every document must have exactly one embedding and
    * vice versa, and every embedding must carry the expected dimension.
    * Anti joins both directions (shuffle-keyed on the id; broadcastable
    * when one side is a small delta) + one dimension scan. One verdict
    * row per rule, same contract as u03. */
  private val u05: Fn = (s, d) => {
    val dd = Tables.documents(s, d).select(col("doc_id"))
    val ee = Tables.embeddings(s, d).select(col("vec_id"), col("embedding"))
    val docsNoEmb = dd.join(ee, col("doc_id") === col("vec_id"), "left_anti").count()
    val embNoDoc = ee.join(dd, col("vec_id") === col("doc_id"), "left_anti").count()
    val badDim = ee.filter(size(col("embedding")) =!= 64).count()
    val dupEmb = ee.groupBy("vec_id").agg(count(lit(1)).as("c")).filter(col("c") > 1).count()
    import s.implicits._
    Seq(
      ("doc_has_embedding", docsNoEmb),
      ("embedding_dim_64", badDim),
      ("embedding_has_doc", embNoDoc),
      ("embedding_unique", dupEmb))
      .toDF("rule", "n_violations")
      .withColumn("passed", col("n_violations") === 0L)
      .orderBy("rule")
  }
  private val u05Sql =
    """SELECT rule, n_violations, n_violations = 0 AS passed FROM (
      |  SELECT 'doc_has_embedding' AS rule,
      |         (SELECT count(*) FROM documents d
      |          WHERE NOT EXISTS (SELECT 1 FROM embeddings e WHERE e.vec_id = d.doc_id)) AS n_violations
      |  UNION ALL
      |  SELECT 'embedding_dim_64',
      |         (SELECT count(*) FROM embeddings WHERE len(embedding) <> 64)
      |  UNION ALL
      |  SELECT 'embedding_has_doc',
      |         (SELECT count(*) FROM embeddings e
      |          WHERE NOT EXISTS (SELECT 1 FROM documents d WHERE d.doc_id = e.vec_id))
      |  UNION ALL
      |  SELECT 'embedding_unique',
      |         (SELECT count(*) FROM (SELECT vec_id FROM embeddings GROUP BY vec_id HAVING count(*) > 1) t)
      |) v
      |ORDER BY rule""".stripMargin

  /** u06: k-anonymity audit over quasi-identifiers — the privacy gate a
    * corpus release runs before shipping: any combination of
    * quasi-identifiers (here lang × source × length centile-bucket)
    * shared by fewer than K=5 documents is a re-identification risk
    * (Sweeney, IJUFKS'02 — k-anonymity). Output: every violating
    * equivalence class with its size, so remediation (generalize a
    * bucket, suppress a class) is actionable.
    *
    * Scale: one partial-agg'd groupBy on the QI tuple — count runs
    * map-side, only (class, count) rows shuffle; no distinct-rewrite
    * Expand, no join. The violating-class filter lands post-agg where
    * cardinality is already the number of classes, not documents. */
  private val u06: Fn = (s, d) =>
    Tables.documents(s, d)
      .select(col("lang"), col("source"),
        (col("n_chars") / 100).cast(LongType).as("len_bucket"))
      .groupBy("lang", "source", "len_bucket")
      .agg(count(lit(1)).as("class_size"))
      .filter(col("class_size") < 5)
      .orderBy("lang", "source", "len_bucket")
  private val u06Sql =
    """SELECT lang, source, CAST(n_chars // 100 AS BIGINT) AS len_bucket,
      |       count(*) AS class_size
      |FROM documents
      |GROUP BY lang, source, len_bucket
      |HAVING count(*) < 5
      |ORDER BY lang, source, len_bucket""".stripMargin

  /** u07: corpus version diff — the release-gate report comparing two
    * dataset versions: which documents were added, removed, changed
    * (same id, different content fingerprint), or carried unchanged.
    * The two "versions" derive deterministically from the fixture (md5
    * buckets select membership; a bucket band gets an appended edit) so
    * the diff is reproducible and oracled; in production the inputs are
    * two snapshot paths. Shape: ONE full-outer join on doc_id with
    * md5-fingerprint compare — shuffle-keyed on the id (co-located if
    * both snapshots are bucketed by id), counts partial-agg'd; no
    * full-content compare ever crosses the wire, only fingerprints. */
  private val u07: Fn = (s, d) => {
    val b = graft.functions.DetHash.mdBucket(col("doc_id"), "ver:", 1000)
    val base = Tables.documents(s, d).select(col("doc_id"), col("text"), b.as("vb"))
    val v1 = base.filter(col("vb") >= 5)
      .select(col("doc_id").as("id1"), md5(col("text")).as("fp1"))
    val v2 = base.filter(col("vb") < 995)
      .select(col("doc_id").as("id2"),
        md5(when(col("vb").between(500, 519), concat(col("text"), lit(" v2")))
          .otherwise(col("text"))).as("fp2"))
    v1.join(v2, col("id1") === col("id2"), "full_outer")
      .withColumn("status",
        when(col("id1").isNull, "added")
          .when(col("id2").isNull, "removed")
          .when(col("fp1") =!= col("fp2"), "changed")
          .otherwise("unchanged"))
      .groupBy("status")
      .agg(count(lit(1)).as("n_docs"),
        coalesce(min(coalesce(col("id1"), col("id2"))), lit(-1L)).as("first_id"))
      .orderBy("status")
  }
  private val u07Sql = {
    val b = graft.functions.DetHash.mdBucketSql("doc_id", "ver:", 1000)
    s"""WITH base AS (SELECT doc_id, text, $b AS vb FROM documents),
       |v1 AS (SELECT doc_id AS id1, md5(text) AS fp1 FROM base WHERE vb >= 5),
       |v2 AS (SELECT doc_id AS id2,
       |         md5(CASE WHEN vb BETWEEN 500 AND 519 THEN text || ' v2' ELSE text END) AS fp2
       |       FROM base WHERE vb < 995),
       |diff AS (
       |  SELECT CASE WHEN id1 IS NULL THEN 'added'
       |              WHEN id2 IS NULL THEN 'removed'
       |              WHEN fp1 <> fp2 THEN 'changed'
       |              ELSE 'unchanged' END AS status,
       |         coalesce(id1, id2) AS id
       |  FROM v1 FULL OUTER JOIN v2 ON id1 = id2)
       |SELECT status, count(*) AS n_docs,
       |       coalesce(min(id), -1) AS first_id
       |FROM diff GROUP BY status ORDER BY status""".stripMargin
  }

  /** r53: ordered-sequence funnel — did each user view, THEN click after
    * that view, THEN purchase after that click (the MATCH_RECOGNIZE /
    * funnel-analysis shape). Stage reachability is a chain of running-max
    * flags over ONE (user, ts, event_id) window ordering: s1 = seen a
    * view; s2 = seen a click while s1 held; s3 = seen a purchase while s2
    * held. The three Window projections share the same partitioning and
    * sort, so Spark plans one exchange + one sort with stacked Window
    * nodes, and the per-user rollup reuses that partitioning — single
    * shuffle end to end. Ties are impossible in the sort (event_id is
    * unique), so ROWS framing is deterministic and engine-portable. */
  private val r53: Fn = (s, d) => {
    def w = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val staged = Tables.events(s, d)
      .select(col("user_id"), col("ts"), col("event_id"), col("event_type"))
      .withColumn("s1",
        max(when(col("event_type") === "view", 1).otherwise(0)).over(w))
      .withColumn("s2",
        max(when(col("event_type") === "click" && col("s1") === 1, 1).otherwise(0)).over(w))
      .withColumn("s3",
        max(when(col("event_type") === "purchase" && col("s2") === 1, 1).otherwise(0)).over(w))
    val perUser = staged.groupBy("user_id")
      .agg(max("s1").as("r1"), max("s2").as("r2"), max("s3").as("r3"))
    val tot = perUser.agg(
      sum("r1").cast(LongType).as("u1"),
      sum("r2").cast(LongType).as("u2"),
      sum("r3").cast(LongType).as("u3"))
    tot.selectExpr(
      """stack(3,
        |  '1_view', u1, CAST(1.0 AS DOUBLE),
        |  '2_click_after_view', u2,
        |    CASE WHEN u1 = 0 THEN CAST(NULL AS DOUBLE)
        |         ELSE round(CAST(u2 AS DOUBLE) / u1, 6) END,
        |  '3_purchase_after_click', u3,
        |    CASE WHEN u2 = 0 THEN CAST(NULL AS DOUBLE)
        |         ELSE round(CAST(u3 AS DOUBLE) / u2, 6) END
        |) AS (stage, n_users, conv_from_prev)""".stripMargin)
      .orderBy("stage")
  }
  private val r53Sql =
    """WITH e1 AS (
      |  SELECT user_id, ts, event_id, event_type,
      |         max(CASE WHEN event_type = 'view' THEN 1 ELSE 0 END)
      |           OVER (PARTITION BY user_id ORDER BY ts, event_id
      |                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS s1
      |  FROM events),
      |e2 AS (
      |  SELECT *, max(CASE WHEN event_type = 'click' AND s1 = 1 THEN 1 ELSE 0 END)
      |           OVER (PARTITION BY user_id ORDER BY ts, event_id
      |                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS s2
      |  FROM e1),
      |e3 AS (
      |  SELECT *, max(CASE WHEN event_type = 'purchase' AND s2 = 1 THEN 1 ELSE 0 END)
      |           OVER (PARTITION BY user_id ORDER BY ts, event_id
      |                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS s3
      |  FROM e2),
      |u AS (SELECT user_id, max(s1) AS r1, max(s2) AS r2, max(s3) AS r3
      |      FROM e3 GROUP BY user_id),
      |tot AS (SELECT CAST(sum(r1) AS BIGINT) AS u1, CAST(sum(r2) AS BIGINT) AS u2,
      |               CAST(sum(r3) AS BIGINT) AS u3 FROM u)
      |SELECT stage, n_users, conv_from_prev FROM (
      |  SELECT '1_view' AS stage, u1 AS n_users, CAST(1.0 AS DOUBLE) AS conv_from_prev FROM tot
      |  UNION ALL
      |  SELECT '2_click_after_view', u2,
      |         CASE WHEN u1 = 0 THEN NULL ELSE round(CAST(u2 AS DOUBLE) / u1, 6) END FROM tot
      |  UNION ALL
      |  SELECT '3_purchase_after_click', u3,
      |         CASE WHEN u2 = 0 THEN NULL ELSE round(CAST(u3 AS DOUBLE) / u2, 6) END FROM tot) v
      |ORDER BY stage""".stripMargin

  /** r55: deep star-join market share (the TPC-H Q8 shape) — revenue
    * share of ASIA-origin suppliers within each customer-region market
    * by order year, over an 8-relation join tree (lineitem ⋈ orders ⋈
    * customer ⋈ nation ⋈ region on the demand side; supplier ⋈ nation ⋈
    * region on the supply side; part as a selective filter dim). The
    * depth is the point: Catalyst must broadcast the four tiny dims,
    * leave the two mid-size dims to AQE, and keep the one real shuffle
    * on the fact keys. Share = decimal-exact conditional volume over
    * decimal-exact total volume, divided once in double. */
  private val r55: Fn = (s, d) => {
    val vol = (Relational.money(col("l_extendedprice")) *
      (Relational.oneD - Relational.pct(col("l_discount")))).cast(DecimalType(24, 4))
    val n1 = Tables.nation(s, d)
      .select(col("n_nationkey").as("c_nk"), col("n_regionkey").as("c_rk"))
    val r1 = Tables.region(s, d)
      .select(col("r_regionkey").as("c_rk"), col("r_name").as("cust_region"))
    val n2 = Tables.nation(s, d)
      .select(col("n_nationkey").as("s_nk"), col("n_regionkey").as("s_rk"))
    val r2 = Tables.region(s, d)
      .select(col("r_regionkey").as("s_rk"), col("r_name").as("supp_region"))
    Tables.lineitem(s, d)
      .join(Tables.part(s, d).filter(col("p_type") === "PROMO").select("p_partkey"),
        col("l_partkey") === col("p_partkey"))
      .join(Tables.orders(s, d)
          .filter(col("o_orderdate") >= lit("1995-01-01").cast("timestamp") &&
            col("o_orderdate") < lit("1997-01-01").cast("timestamp")),
        col("l_orderkey") === col("o_orderkey"))
      .join(Tables.customer(s, d), col("o_custkey") === col("c_custkey"))
      .join(broadcast(n1), col("c_nationkey") === col("c_nk"))
      .join(broadcast(r1), "c_rk")
      .join(Tables.supplier(s, d), col("l_suppkey") === col("s_suppkey"))
      .join(broadcast(n2), col("s_nationkey") === col("s_nk"))
      .join(broadcast(r2), "s_rk")
      .groupBy(col("cust_region"), year(col("o_orderdate")).cast("int").as("o_year"))
      .agg(
        sum(when(col("supp_region") === "ASIA", vol)
          .otherwise(lit(0).cast(DecimalType(24, 4)))).cast(DecimalType(38, 4)).as("asia_vol"),
        sum(vol).cast(DecimalType(38, 4)).as("total_vol"))
      .withColumn("mkt_share",
        round(col("asia_vol").cast(DoubleType) / col("total_vol").cast(DoubleType), 6))
      .select("cust_region", "o_year", "asia_vol", "total_vol", "mkt_share")
      .orderBy("cust_region", "o_year")
  }
  private val r55Sql =
    """WITH vols AS (
      |  SELECT r1.r_name AS cust_region,
      |         CAST(year(o_orderdate) AS INTEGER) AS o_year,
      |         r2.r_name AS supp_region,
      |         CAST(CAST(l_extendedprice AS DECIMAL(12,2)) *
      |              (CAST(1 AS DECIMAL(4,2)) - CAST(l_discount AS DECIMAL(4,2))) AS DECIMAL(24,4)) AS vol
      |  FROM lineitem
      |  JOIN part ON l_partkey = p_partkey AND p_type = 'PROMO'
      |  JOIN orders ON l_orderkey = o_orderkey
      |    AND o_orderdate >= TIMESTAMP '1995-01-01' AND o_orderdate < TIMESTAMP '1997-01-01'
      |  JOIN customer ON o_custkey = c_custkey
      |  JOIN nation n1 ON c_nationkey = n1.n_nationkey
      |  JOIN region r1 ON n1.n_regionkey = r1.r_regionkey
      |  JOIN supplier ON l_suppkey = s_suppkey
      |  JOIN nation n2 ON s_nationkey = n2.n_nationkey
      |  JOIN region r2 ON n2.n_regionkey = r2.r_regionkey)
      |SELECT cust_region, o_year,
      |  CAST(sum(CASE WHEN supp_region = 'ASIA' THEN vol ELSE CAST(0 AS DECIMAL(24,4)) END) AS DECIMAL(38,4)) AS asia_vol,
      |  CAST(sum(vol) AS DECIMAL(38,4)) AS total_vol,
      |  round(CAST(sum(CASE WHEN supp_region = 'ASIA' THEN vol ELSE CAST(0 AS DECIMAL(24,4)) END) AS DOUBLE)
      |        / CAST(sum(vol) AS DOUBLE), 6) AS mkt_share
      |FROM vols GROUP BY cust_region, o_year
      |ORDER BY cust_region, o_year""".stripMargin

  /** r56: time-bucket OHLC resample — the finance/telemetry downsampling
    * shape: per (hour, event_type), open/close via composite-key
    * arg_min/arg_max, low/high/volume as plain extremes. The tie key is
    * a fixed-width zero-padded `(epoch_micros, event_id)` string —
    * lexicographic order = numeric order, and unlike the earlier
    * `seconds·1e6 + event_id` double it CANNOT collide (events 1 s
    * apart with ids 1e6 apart shared a key; DuckDB 1.0 arg_min takes
    * no struct keys, so a collision-free scalar encoding is required).
    * One partial-agg'd shuffle on the bucket key; at 100 TB the bucket
    * is also the natural partition column for the sink. */
  private val r56: Fn = (s, d) => {
    val key = concat(
      lpad(unix_micros(col("ts")).cast(StringType), 20, "0"),
      lpad(col("event_id").cast(StringType), 19, "0"))
    Tables.events(s, d)
      .groupBy(date_trunc("hour", col("ts")).as("bucket"), col("event_type"))
      .agg(
        min_by(col("value"), key).as("open"),
        max_by(col("value"), key).as("close"),
        min(col("value")).as("low"),
        max(col("value")).as("high"),
        count(lit(1)).as("volume"))
      .orderBy("bucket", "event_type")
  }
  private val r56Sql =
    """SELECT date_trunc('hour', ts) AS bucket, event_type,
      |  arg_min(value, lpad(CAST(epoch_us(ts) AS VARCHAR), 20, '0') || lpad(CAST(event_id AS VARCHAR), 19, '0')) AS open,
      |  arg_max(value, lpad(CAST(epoch_us(ts) AS VARCHAR), 20, '0') || lpad(CAST(event_id AS VARCHAR), 19, '0')) AS close,
      |  min(value) AS low, max(value) AS high,
      |  count(*) AS volume
      |FROM events GROUP BY 1, 2 ORDER BY bucket, event_type""".stripMargin

  /** u10: distribution-drift report (Population Stability Index) — the
    * standing monitor a corpus pipeline runs between two snapshots to
    * catch a scraper/source change before it trains: bin a per-doc
    * metric (length) into fixed-width bins, compare the two snapshots'
    * bin shares, PSI = Σ (p−q)·ln(p/q). Snapshots derive from the
    * [[graft.functions.DetHash]] arrival buckets (d12's idiom); the
    * "new" snapshot gets a deterministic injected shift (one arrival
    * band's docs doubled in length — a new source emitting longer docs)
    * so the report shows real drift and is never vacuous. Laplace
    * (+1) smoothing keeps every bin's share nonzero, so ln is total; a
    * static 0..9 bin scaffold keeps empty bins present in the report.
    * Portability: shares are exact-integer ratios (identical doubles in
    * both engines); each bin's PSI term is truncated to 1e-9 fixed
    * point BEFORE the total sum (t14's precedent) so the headline
    * number is an exact integer sum; the total row's shares are 1.0 by
    * the smoothing identity, emitted as literals rather than a
    * float-order-dependent sum. Scale shape: two keyed count
    * aggregations (partial-agg'd) + a 10-row broadcast join — the
    * report costs one scan regardless of corpus size. */
  private[graft] val DriftBins = 10

  /** Fixed-width length bin (shared by u10 and the streaming monitor). */
  private[graft] def driftBinOf(c: Column): Column =
    least(floor(c.cast(DoubleType) / lit(200.0)), lit((DriftBins - 1).toLong)).cast("int")

  /** Histogram + Laplace-smoothed shares of `metric` over the static
    * 0..DriftBins-1 scaffold: (bin, n, share). The scaffold join keeps
    * empty bins present; smoothing keeps every share nonzero so ln is
    * total downstream. */
  private[graft] def driftShares(df: org.apache.spark.sql.DataFrame, metric: Column): org.apache.spark.sql.DataFrame = {
    val s = df.sparkSession
    val binned = df.select(driftBinOf(metric).as("bin"))
    val counts = binned.groupBy("bin").agg(count(lit(1)).as("n"))
    val tot = binned.agg(count(lit(1)).as("t"))
    s.range(0, DriftBins).select(col("id").cast("int").as("bin"))
      .join(counts, Seq("bin"), "left")
      .crossJoin(broadcast(tot))
      .withColumn("n", coalesce(col("n"), lit(0L)))
      .withColumn("share", (col("n") + lit(1)) / (col("t") + lit(DriftBins)).cast(DoubleType))
      .select("bin", "n", "share")
  }

  /** Per-bin PSI rows + exact-integer total row from two (bin, n,
    * share) relations (a = reference, b = current). Each bin's term is
    * truncated to 1e-9 fixed point BEFORE the total sum (t14's
    * precedent); the total row's shares are 1.0 by the smoothing
    * identity, emitted as literals rather than a float-order-dependent
    * sum. */
  private[graft] def psiReport(a: org.apache.spark.sql.DataFrame, b: org.apache.spark.sql.DataFrame): org.apache.spark.sql.DataFrame = {
    val j = a.select(col("bin"), col("n").as("n_a"), col("share").as("p"))
      .join(b.select(col("bin"), col("n").as("n_b"), col("share").as("q")), Seq("bin"))
      .withColumn("psi_fp", ((col("p") - col("q")) * log(col("p") / col("q")) * lit(1e9)).cast(LongType))
    val perBin = j.select(col("bin"), col("n_a"), col("n_b"),
      round(col("p"), 6).as("share_a"), round(col("q"), 6).as("share_b"),
      round(col("psi_fp") / lit(1e9), 6).as("psi"))
    val total = j.agg(sum(col("n_a")).as("n_a"), sum(col("n_b")).as("n_b"),
        round(sum(col("psi_fp")) / lit(1e9), 6).as("psi"))
      .select(lit(-1).as("bin"), col("n_a"), col("n_b"),
        lit(1.0).as("share_a"), lit(1.0).as("share_b"), col("psi"))
    perBin.unionByName(total).orderBy("bin")
  }

  private val u10: Fn = (s, d) => {
    val ab = graft.functions.DetHash.mdBucket(col("doc_id"), "arrival:", 100)
    val base = Tables.documents(s, d).select(col("n_chars"), ab.as("ab"))
    val aa = base.filter(col("ab") < 50)
    val bb = base.filter(col("ab") >= 50)
    psiReport(
      driftShares(aa, col("n_chars")),
      driftShares(bb, when(col("ab").between(50, 59), col("n_chars") * 2)
        .otherwise(col("n_chars"))))
  }
  private val u10Sql = {
    val b = graft.functions.DetHash.mdBucketSql("doc_id", "arrival:", 100)
    s"""WITH base AS (SELECT doc_id, n_chars, $b AS ab FROM documents),
       |a AS (SELECT least(CAST(floor(n_chars / 200.0) AS BIGINT), 9) AS bin
       |      FROM base WHERE ab < 50),
       |bs AS (SELECT least(CAST(floor((CASE WHEN ab BETWEEN 50 AND 59
       |                                     THEN n_chars * 2 ELSE n_chars END) / 200.0) AS BIGINT), 9) AS bin
       |       FROM base WHERE ab >= 50),
       |bins AS (SELECT range AS bin FROM range(0, 10)),
       |ca AS (SELECT bin, count(*) AS n FROM a GROUP BY bin),
       |cb AS (SELECT bin, count(*) AS n FROM bs GROUP BY bin),
       |tot AS (SELECT (SELECT count(*) FROM a) AS ta, (SELECT count(*) FROM bs) AS tb),
       |j AS (
       |  SELECT b.bin, coalesce(ca.n, 0) AS n_a, coalesce(cb.n, 0) AS n_b,
       |         (coalesce(ca.n, 0) + 1) / CAST(ta + 10 AS DOUBLE) AS p,
       |         (coalesce(cb.n, 0) + 1) / CAST(tb + 10 AS DOUBLE) AS q
       |  FROM bins b
       |  LEFT JOIN ca ON b.bin = ca.bin
       |  LEFT JOIN cb ON b.bin = cb.bin
       |  CROSS JOIN tot),
       |f AS (SELECT bin, n_a, n_b, p, q,
       |        CAST(trunc((p - q) * ln(p / q) * 1e9) AS BIGINT) AS psi_fp FROM j)
       |SELECT CAST(bin AS INTEGER) AS bin, n_a, n_b,
       |       round(p, 6) AS share_a, round(q, 6) AS share_b,
       |       round(psi_fp / 1e9, 6) AS psi
       |FROM f
       |UNION ALL
       |SELECT CAST(-1 AS INTEGER), CAST(sum(n_a) AS BIGINT), CAST(sum(n_b) AS BIGINT), 1.0, 1.0,
       |       round(CAST(sum(psi_fp) AS DOUBLE) / 1e9, 6)
       |FROM f
       |ORDER BY bin""".stripMargin
  }

  /** u12: embedding-corpus QA audit — the health gate an embedding
    * pipeline runs after every encoder batch, because encoder bugs are
    * SILENT (a crashed shard of zero vectors or a fp16-overflow NaN
    * poisons every downstream cosine without a single error): per
    * label, vector count, zero-vector count, NaN count, and the
    * norm distribution (min/max/avg). Complements u05, which audits
    * doc↔vector referential integrity — this audits the VALUES. Scale
    * shape: one narrow map (per-row sequential-fold norm) + one keyed
    * agg; everything partial-aggregates map-side. Parity: the norm
    * fold is the s06 idiom (Spark `aggregate` from 0.0 ≡ DuckDB
    * `list_reduce` from x1², bit-equal for the shared prefix sums),
    * sqrt is IEEE correctly-rounded in both engines, and norms are
    * truncated to 1e-6 fixed point before min/max/avg. */
  private val u12: Fn = (s, d) => embeddingQa(Tables.embeddings(s, d))

  /** Audit body, factored so specs can drive a constructed table with
    * planted defects (zero vectors, NaNs). */
  private[queries] def embeddingQa(emb: org.apache.spark.sql.DataFrame): org.apache.spark.sql.DataFrame = {
    // aggregate from 0.0 returns 0.0 on an EMPTY array — the oracle's
    // CASE len=0 guard mirrors it (a bare list_reduce errors on empty)
    val sum2 = aggregate(
      transform(col("embedding"), x => x.cast(DoubleType) * x.cast(DoubleType)),
      lit(0.0), (a, b) => a + b)
    // a non-finite component (NaN OR ±Inf) or an overflowing norm must
    // take its row OUT of the norm stats EXPLICITLY (NULL): left to the
    // engines, Spark's floor(NaN) casts to 0 and its Long cast
    // SATURATES on overflow, while DuckDB errors on both casts — the
    // very defects the audit exists to catch would themselves diverge.
    // The 8e25 bound keeps norm*1e6 well under Long.MaxValue.
    val nBad = size(filter(col("embedding"), x =>
      isnan(x) || abs(x) === lit(Float.PositiveInfinity)))
    val bad = nBad > 0 || sum2 > lit(8e25)
    val v = emb.select(
      col("label"),
      when(bad, lit(null).cast(LongType))
        .otherwise(floor(sqrt(sum2) * lit(1e6)).cast(LongType)).as("norm_fp"),
      when(sum2 === 0.0, 1L).otherwise(0L).as("is_zero"),
      when(bad, 1L).otherwise(0L).as("is_bad"))
    v.groupBy("label")
      .agg(count(lit(1)).as("n_vecs"),
        sum(col("is_zero")).as("n_zero"),
        sum(col("is_bad")).as("n_nonfinite"),
        min(col("norm_fp")).as("mn"), max(col("norm_fp")).as("mx"),
        sum(col("norm_fp")).as("sm"), count(col("norm_fp")).as("n_normed"))
      .select(col("label").cast(LongType).as("label"), col("n_vecs"), col("n_zero"),
        col("n_nonfinite"),
        round(col("mn").cast(DoubleType) / 1e6, 6).as("min_norm"),
        round(col("mx").cast(DoubleType) / 1e6, 6).as("max_norm"),
        round(col("sm").cast(DoubleType) / 1e6 / col("n_normed").cast(DoubleType), 6).as("avg_norm"))
      .orderBy("label")
  }
  private val u12Sql =
    """WITH s AS (
      |  SELECT label,
      |         CASE WHEN len(embedding) = 0 THEN 0.0
      |              ELSE list_reduce(list_transform(embedding::DOUBLE[], x -> x * x),
      |                               (a, b) -> a + b) END AS s2,
      |         CASE WHEN len(list_filter(embedding, x -> isnan(x) OR isinf(x))) > 0
      |              THEN 1 ELSE 0 END AS nbad
      |  FROM embeddings),
      |v AS (
      |  SELECT label,
      |         CASE WHEN nbad > 0 OR s2 > 8e25 THEN NULL
      |              ELSE CAST(trunc(sqrt(s2) * 1e6) AS BIGINT) END AS norm_fp,
      |         CASE WHEN s2 = 0.0 THEN 1 ELSE 0 END AS is_zero,
      |         CASE WHEN nbad > 0 OR s2 > 8e25 THEN 1 ELSE 0 END AS is_bad
      |  FROM s)
      |SELECT CAST(label AS BIGINT) AS label, count(*) AS n_vecs,
      |       CAST(sum(is_zero) AS BIGINT) AS n_zero,
      |       CAST(sum(is_bad) AS BIGINT) AS n_nonfinite,
      |       round(CAST(min(norm_fp) AS DOUBLE) / 1e6, 6) AS min_norm,
      |       round(CAST(max(norm_fp) AS DOUBLE) / 1e6, 6) AS max_norm,
      |       round(CAST(sum(norm_fp) AS DOUBLE) / 1e6 / CAST(count(norm_fp) AS DOUBLE), 6) AS avg_norm
      |FROM v GROUP BY label ORDER BY label""".stripMargin

  /** r59: cohort retention matrix — the product-analytics staple the
    * reference's event log invites (and a shape every OLAP engine is
    * benchmarked on): users cohorted by first-activity day, then for
    * each (cohort, day-offset) the share of the cohort still active.
    * Two keyed shuffles at scale: the first-activity agg on user_id and
    * the (cohort, offset) distinct-count — both partial-aggregate
    * map-side. The first-activity relation is user-dimension sized
    * (<< event count), so AQE may broadcast it at bench scale while the
    * 100 TB plan falls back to a sort-merge join on user_id; nothing
    * here depends on which it picks. Retention = int/int divided once
    * in double, round 6 (exact parity — both engines' division is
    * correctly rounded). */
  private val r59: Fn = (s, d) => {
    // day as a midnight TIMESTAMP, not DATE: every other query dumps
    // timestamps, and the fixture ts is UTC-truncation-safe in both
    // engines; offsets are exact integer day differences.
    val ev = Tables.events(s, d)
      .select(col("user_id"), date_trunc("day", col("ts")).as("day"))
    val first = ev.groupBy("user_id").agg(min(col("day")).as("cohort_day"))
    val sizes = first.groupBy("cohort_day")
      .agg(count(lit(1)).as("cohort_users"))
    ev.join(first, "user_id")
      .groupBy(col("cohort_day"),
        datediff(col("day"), col("cohort_day")).cast(LongType).as("offset_days"))
      .agg(countDistinct(col("user_id")).as("active_users"))
      .join(sizes, "cohort_day")
      .select(col("cohort_day"), col("offset_days"), col("active_users"),
        col("cohort_users"),
        round(col("active_users").cast(DoubleType) /
          col("cohort_users").cast(DoubleType), 6).as("retention"))
      .orderBy("cohort_day", "offset_days")
  }
  private val r59Sql =
    """WITH ev AS (SELECT user_id, CAST(date_trunc('day', ts) AS TIMESTAMP) AS day FROM events),
      |first AS (SELECT user_id, min(day) AS cohort_day FROM ev GROUP BY user_id),
      |sizes AS (SELECT cohort_day, count(*) AS cohort_users FROM first GROUP BY cohort_day),
      |ret AS (
      |  SELECT f.cohort_day,
      |         CAST(date_diff('day', f.cohort_day, ev.day) AS BIGINT) AS offset_days,
      |         count(DISTINCT ev.user_id) AS active_users
      |  FROM ev JOIN first f ON ev.user_id = f.user_id
      |  GROUP BY f.cohort_day, offset_days)
      |SELECT r.cohort_day, r.offset_days, r.active_users, s.cohort_users,
      |       round(CAST(r.active_users AS DOUBLE) / CAST(s.cohort_users AS DOUBLE), 6) AS retention
      |FROM ret r JOIN sizes s ON r.cohort_day = s.cohort_day
      |ORDER BY r.cohort_day, r.offset_days""".stripMargin

  /** u11: per-source dataset card — the "datasheet for datasets" row a
    * curation pipeline publishes per source before a training run: doc/
    * token/char volume, exact-duplicate rate, short-doc share, and the
    * language-mix entropy (a mono-lingual source that suddenly reads
    * multilingual — or vice versa — is an ingest bug). One narrow
    * row-level projection, then two keyed shuffles (source and
    * source×lang), both partial-aggregated; the dedup signal uses
    * count(DISTINCT md5(text)) so the distinct shuffle key is a fixed
    * 32-byte hash, not the document body. Entropy parity: per-lang
    * −p·ln p terms floored to 1e-9 fixed point (non-negative, so floor
    * = trunc on both engines) and summed as exact ints — the u10 psi
    * idiom. */
  private val u11: Fn = (s, d) => {
    val base = Tables.documents(s, d).select(
      col("source"), col("lang"), col("n_chars"),
      size(split(col("text"), " ")).cast(LongType).as("n_toks"),
      md5(col("text")).as("h"))
    val perSrc = base.groupBy("source").agg(
      count(lit(1)).as("n_docs"),
      sum(col("n_toks")).as("n_tokens"),
      sum(col("n_chars")).as("n_chars"),
      countDistinct(col("h")).as("n_uniq"),
      sum(when(col("n_toks") < 20, 1L).otherwise(0L)).as("n_short"))
    val ent = base.groupBy("source", "lang").agg(count(lit(1)).as("nl"))
      .join(perSrc.select(col("source"), col("n_docs")), "source")
      .select(col("source"),
        floor(-(col("nl").cast(DoubleType) / col("n_docs").cast(DoubleType)) *
          log(col("nl").cast(DoubleType) / col("n_docs").cast(DoubleType)) * 1e9)
          .cast(LongType).as("term_fp"))
      .groupBy("source").agg(sum(col("term_fp")).as("ent_fp"))
    perSrc.join(ent, "source")
      .select(col("source"), col("n_docs"), col("n_tokens"), col("n_chars"),
        round(lit(1.0) - col("n_uniq").cast(DoubleType) / col("n_docs").cast(DoubleType), 6)
          .as("dup_rate"),
        round(col("n_short").cast(DoubleType) / col("n_docs").cast(DoubleType), 6)
          .as("short_share"),
        round(col("ent_fp").cast(DoubleType) / 1e9, 6).as("lang_entropy"))
      .orderBy("source")
  }
  private val u11Sql =
    """WITH base AS (
      |  SELECT source, lang, n_chars,
      |         CAST(len(string_split(text, ' ')) AS BIGINT) AS n_toks,
      |         md5(text) AS h
      |  FROM documents),
      |per_src AS (
      |  SELECT source, count(*) AS n_docs,
      |         CAST(sum(n_toks) AS BIGINT) AS n_tokens,
      |         CAST(sum(n_chars) AS BIGINT) AS n_chars,
      |         count(DISTINCT h) AS n_uniq,
      |         CAST(sum(CASE WHEN n_toks < 20 THEN 1 ELSE 0 END) AS BIGINT) AS n_short
      |  FROM base GROUP BY source),
      |ent AS (
      |  SELECT l.source, CAST(sum(CAST(floor(
      |           -(CAST(l.nl AS DOUBLE) / CAST(p.n_docs AS DOUBLE)) *
      |           ln(CAST(l.nl AS DOUBLE) / CAST(p.n_docs AS DOUBLE)) * 1e9) AS BIGINT)) AS BIGINT) AS ent_fp
      |  FROM (SELECT source, lang, count(*) AS nl FROM base GROUP BY source, lang) l
      |  JOIN per_src p ON l.source = p.source
      |  GROUP BY l.source)
      |SELECT p.source, p.n_docs, p.n_tokens, p.n_chars,
      |       round(1.0 - CAST(p.n_uniq AS DOUBLE) / CAST(p.n_docs AS DOUBLE), 6) AS dup_rate,
      |       round(CAST(p.n_short AS DOUBLE) / CAST(p.n_docs AS DOUBLE), 6) AS short_share,
      |       round(CAST(e.ent_fp AS DOUBLE) / 1e9, 6) AS lang_entropy
      |FROM per_src p JOIN ent e ON p.source = e.source
      |ORDER BY p.source""".stripMargin

  /** u13: robust volume-anomaly report — the ingest-monitoring pass that
    * flags days whose event volume deviates from the corpus median by
    * more than 3 robust standard deviations (MAD · 1.4826, the
    * estimator that one crazy day cannot poison the way a mean/stddev
    * z-score can). Shapes: one keyed daily rollup, then two TINY
    * aggregations (median, then MAD over broadcast-joined deviations)
    * broadcast back over the per-day relation — the p14 cutoff idiom
    * twice; nothing corpus-sized moves twice. Parity: counts are exact
    * ints; median/MAD use the same interpolated-percentile formula both
    * engines (p14 precedent); the flag compares |x−med| against
    * 4.4478·MAD with one double multiply on each side. */
  private val u13: Fn = (s, d) => volumeAnomaliesOf(Tables.events(s, d))

  /** u13 body over any relation with a `ts` column — factored so the
    * spec can plant a 10× flood day and a near-zero outage day and
    * assert they (and only they) trip the flag, which stays all-false
    * on the uniform fixture. */
  private[graft] def volumeAnomaliesOf(events: org.apache.spark.sql.DataFrame): org.apache.spark.sql.DataFrame = {
    val daily = events
      .groupBy(date_trunc("day", col("ts")).as("day"))
      .agg(count(lit(1)).as("n_events"))
    val med = daily.agg(percentile(col("n_events"), lit(0.5)).as("med"))
    val mad = daily.crossJoin(broadcast(med))
      .agg(percentile(abs(col("n_events").cast(DoubleType) - col("med")), lit(0.5)).as("mad"))
    daily.crossJoin(broadcast(med)).crossJoin(broadcast(mad))
      .select(col("day"), col("n_events"),
        round(col("med"), 4).as("med"), round(col("mad"), 4).as("mad"),
        (abs(col("n_events").cast(DoubleType) - col("med")) >
          col("mad") * lit(4.4478)).as("is_anomaly"))
      .orderBy("day")
  }
  private val u13Sql =
    """WITH daily AS (
      |  SELECT CAST(date_trunc('day', ts) AS TIMESTAMP) AS day, count(*) AS n_events
      |  FROM events GROUP BY 1),
      |med AS (SELECT quantile_cont(n_events, 0.5) AS med FROM daily),
      |mad AS (SELECT quantile_cont(abs(CAST(n_events AS DOUBLE) - med), 0.5) AS mad
      |        FROM daily CROSS JOIN med)
      |SELECT day, n_events, round(med, 4) AS med, round(mad, 4) AS mad,
      |       abs(CAST(n_events AS DOUBLE) - med) > mad * 4.4478 AS is_anomaly
      |FROM daily CROSS JOIN med CROSS JOIN mad
      |ORDER BY day""".stripMargin

  val all: Seq[Q] = Seq(
    Q("u13_volume_anomalies", u13, Some(u13Sql)),
    Q("u11_dataset_card", u11, Some(u11Sql)),
    Q("r59_retention_cohorts", r59, Some(r59Sql)),
    Q("u10_drift_psi", u10, Some(u10Sql)),
    Q("u12_embedding_qa", u12, Some(u12Sql)),
    Q("r55_market_share", r55, Some(r55Sql)),
    Q("r56_ohlc_resample", r56, Some(r56Sql)),
    Q("r53_funnel", r53, Some(r53Sql)),
    Q("u05_referential_check", u05, (Some(u05Sql))),
    Q("u06_k_anonymity", u06, Some(u06Sql)),
    Q("u07_corpus_diff", u07, Some(u07Sql)),
    Q("r50_hof_array_fns", r50, Some(r50Sql)),
    Q("u03_quality_gate", u03, Some(u03Sql)),
    Q("u04_skew_report", u04, Some(u04Sql)),
    Q("r49_scd2_history", r49, Some(r49Sql)),
    Q("r48_rank_topk_native", r48, Some(r48Sql)),
    Q("r43_topk_native", r43, Some(r43Sql)),
    Q("r42_merge_upsert", r42, Some(r42Sql)),
    Q("r41_map_fns", r41, Some(r41Sql)),
    Q("r36_setops_multiset", r36, Some(r36Sql)),
    Q("r37_regex_fns", r37, Some(r37Sql)),
    Q("r38_bool_aggs", r38, Some(r38Sql)),
    Q("r39_exact_moments", r39, Some(r39Sql)),
    Q("u01_profile_table", u01, Some(u01Sql)))
}
