package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DecimalType, DoubleType, IntegerType, LongType, StringType}
import graft.Tables
import graft.queries.Relational.{Fn, Q}

/** Round-10 batch 37: growth/quality closers — the cohort retention
  * triangle (the one classic growth table r95's flow accounting did not
  * ship), plain per-group OLS next to the robust r119/r132 machinery, a
  * Benford first-digit audit, the warehouse referential-integrity
  * manifest, and degree assortativity closing the s10-graph analytics
  * set (s19 triangles / s26 k-core / s27 centrality had no mixing
  * statistic).
  */
object ExtraQueries35 {

  private def dec(c: Column): Column = c.cast(DecimalType(38, 0))

  // --------------------- r137 cohort retention triangle

  /** r137: the cohort RETENTION triangle — users cohorted by first
    * active day, then per (cohort_day, day_offset) the share of the
    * cohort active exactly `day_offset` days after its first day —
    * offset 0 IS the cohort's first day, so it pins retention exactly
    * 1.0 (the law the spec holds). r95 accounts the
    * new/retained/resurrected/churned FLOWS between adjacent periods;
    * this is the other canonical growth table: each cohort followed
    * forward, the diagonal a product team actually reads.
    *
    * Exactness: pure BIGINT distinct counting (user first days via min,
    * activity via (user, day) distinct); retention is ONE rounded
    * division per cell. Scale shape: one user-grain min aggregate, one
    * (user, day)-grain distinct, a user-keyed join, a
    * (cohort, offset)-grain count — every shuffle fine-grained-keyed;
    * the close is ≤ |days|² rows (calendar-bounded). */
  private val r137: Fn = (s, d) => {
    val ev = Tables.events(s, d)
    val firstDay = ev.groupBy("user_id").agg(min(to_date(col("ts"))).as("cohort_day"))
    val activity = ev.select(col("user_id"), to_date(col("ts")).as("day")).distinct()
    val cells = activity.join(firstDay, "user_id")
      .select(col("user_id"), col("cohort_day"),
        expr("datediff(day, cohort_day)").cast(LongType).as("day_offset"))
      .distinct()
      .groupBy("cohort_day", "day_offset")
      .agg(countDistinct(col("user_id")).cast(LongType).as("n_active"))
    val sizes = firstDay.groupBy("cohort_day").agg(count(lit(1)).cast(LongType).as("cohort_size"))
    cells.join(sizes, "cohort_day")
      .select(col("cohort_day"), col("day_offset"), col("n_active"), col("cohort_size"),
        round(col("n_active").cast(DoubleType) / col("cohort_size").cast(DoubleType), 4)
          .as("retention"))
      .orderBy("cohort_day", "day_offset")
  }
  private val r137Sql =
    """WITH fd AS (
      |  SELECT user_id, min(CAST(ts AS DATE)) AS cohort_day FROM events GROUP BY 1),
      |act AS (SELECT DISTINCT user_id, CAST(ts AS DATE) AS day FROM events),
      |cells AS (
      |  SELECT cohort_day, day_offset, CAST(count(DISTINCT user_id) AS BIGINT) AS n_active
      |  FROM (
      |    SELECT DISTINCT a.user_id, f.cohort_day,
      |           CAST(a.day - f.cohort_day AS BIGINT) AS day_offset
      |    FROM act a JOIN fd f USING (user_id)) t
      |  GROUP BY 1, 2),
      |sizes AS (SELECT cohort_day, CAST(count(*) AS BIGINT) AS cohort_size FROM fd GROUP BY 1)
      |SELECT c.cohort_day, c.day_offset, c.n_active, s.cohort_size,
      |       round(CAST(c.n_active AS DOUBLE) / CAST(s.cohort_size AS DOUBLE), 4) AS retention
      |FROM cells c JOIN sizes s USING (cohort_day)
      |ORDER BY cohort_day, day_offset""".stripMargin

  // --------------------- r138 per-group log-log OLS

  /** r138: plain per-group OLS on the log-log price/volume relation —
    * the registry ships the ROBUST line (r119 Theil–Sen), the adjusted
    * line (r132 CUPED θ) and rank correlations (r92/r102), but not the
    * workhorse least-squares fit itself: per part brand, the slope,
    * intercept and R² of ln(quantity) on ln(extended price), both in
    * exact cents.
    *
    * Exactness: both variables lift to the r133 fixed-point grid —
    * trunc(ln(exact cents)·1e9) as BIGINT, from identical doubles on
    * both engines — and the OLS moments Σx, Σy, Σxy, Σx², Σy² lift
    * every product to DECIMAL(38,0)/HUGEINT before summing (the p38
    * discipline: lnfp² ≈ 5·10²⁰ per row overflows BIGINT immediately);
    * slope/intercept/R² are single divisions of exact-integer-derived
    * doubles (the DECIMAL→DOUBLE and HUGEINT→DOUBLE casts round the
    * same integer to the same double). Scale shape: one broadcast-dim
    * join (part), one brand-grain aggregate with map-side partials,
    * |brands|-row close. */
  private val r138: Fn = (s, d) => {
    val li = Tables.lineitem(s, d)
      .select(col("l_partkey"),
        (col("l_quantity").cast(DecimalType(18, 2)) * 100).cast(LongType).as("q_c"),
        (col("l_extendedprice").cast(DecimalType(18, 2)) * 100).cast(LongType).as("p_c"))
    val branded = li.join(broadcast(Tables.part(s, d).select(col("p_partkey"), col("p_brand"))),
      col("l_partkey") === col("p_partkey"))
      .withColumn("x_fp", (log(col("p_c").cast(DoubleType)) * 1e9).cast(LongType))
      .withColumn("y_fp", (log(col("q_c").cast(DoubleType)) * 1e9).cast(LongType))
    branded.groupBy(col("p_brand").as("brand"))
      .agg(count(lit(1)).cast(LongType).as("n"),
        sum(col("x_fp")).cast(LongType).as("sx"),
        sum(col("y_fp")).cast(LongType).as("sy"),
        sum(dec(col("x_fp")) * dec(col("y_fp"))).as("sxy"),
        sum(dec(col("x_fp")) * dec(col("x_fp"))).as("sxx"),
        sum(dec(col("y_fp")) * dec(col("y_fp"))).as("syy"))
      .withColumn("cov_n", (dec(col("n")) * col("sxy") - dec(col("sx")) * dec(col("sy")))
        .cast(DoubleType))
      .withColumn("var_x", (dec(col("n")) * col("sxx") - dec(col("sx")) * dec(col("sx")))
        .cast(DoubleType))
      .withColumn("var_y", (dec(col("n")) * col("syy") - dec(col("sy")) * dec(col("sy")))
        .cast(DoubleType))
      .withColumn("slope", col("cov_n") / col("var_x"))
      .select(col("brand"), col("n"), round(col("slope"), 6).as("slope"),
        round((col("sy").cast(DoubleType) - col("slope") * col("sx").cast(DoubleType)) /
          col("n").cast(DoubleType) / 1e9, 6).as("intercept"),
        round(col("cov_n") * col("cov_n") / (col("var_x") * col("var_y")), 6).as("r2"))
      .orderBy("brand")
  }
  private val r138Sql =
    """WITH base AS (
      |  SELECT p.p_brand AS brand,
      |         CAST(trunc(ln(CAST(CAST(l.l_extendedprice AS DECIMAL(18,2)) * 100 AS BIGINT)) * 1e9) AS BIGINT) AS x_fp,
      |         CAST(trunc(ln(CAST(CAST(l.l_quantity AS DECIMAL(18,2)) * 100 AS BIGINT)) * 1e9) AS BIGINT) AS y_fp
      |  FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey),
      |mom AS (
      |  SELECT brand, CAST(count(*) AS BIGINT) AS n,
      |         CAST(sum(x_fp) AS BIGINT) AS sx, CAST(sum(y_fp) AS BIGINT) AS sy,
      |         sum(CAST(x_fp AS HUGEINT) * CAST(y_fp AS HUGEINT)) AS sxy,
      |         sum(CAST(x_fp AS HUGEINT) * CAST(x_fp AS HUGEINT)) AS sxx,
      |         sum(CAST(y_fp AS HUGEINT) * CAST(y_fp AS HUGEINT)) AS syy
      |  FROM base GROUP BY 1),
      |fit AS (
      |  SELECT brand, n,
      |         CAST(n * sxy - CAST(sx AS HUGEINT) * CAST(sy AS HUGEINT) AS DOUBLE) AS cov_n,
      |         CAST(n * sxx - CAST(sx AS HUGEINT) * CAST(sx AS HUGEINT) AS DOUBLE) AS var_x,
      |         CAST(n * syy - CAST(sy AS HUGEINT) * CAST(sy AS HUGEINT) AS DOUBLE) AS var_y,
      |         CAST(sx AS DOUBLE) AS sxd, CAST(sy AS DOUBLE) AS syd
      |  FROM mom)
      |SELECT brand, n, round(cov_n / var_x, 6) AS slope,
      |       round((syd - cov_n / var_x * sxd) / CAST(n AS DOUBLE) / 1e9, 6) AS intercept,
      |       round(cov_n * cov_n / (var_x * var_y), 6) AS r2
      |FROM fit
      |ORDER BY brand""".stripMargin

  // --------------------- u37 Benford first-digit audit

  /** u37: Benford first-significant-digit audit over event value cents
    * — the forensic-accounting screen a revenue stream is graded
    * against (synthetic uniform-ish values will FAIL conformance;
    * reporting that honestly is the audit's job, and the spec pins the
    * replay, not conformance). Per digit 1–9: observed count, observed
    * share, the Benford share log10(1+1/d), and the χ² contribution;
    * digits with no mass still emit (0-count rows via the 1–9
    * scaffold).
    *
    * Exactness: the first digit is the first CHARACTER of the exact
    * cents BIGINT rendered as a string — no log10/pow-based digit
    * extraction, so no libm in the grouping key; Benford shares are
    * the r133 discipline (trunc(ln(1+1/d)/ln 10 · 1e9) from identical
    * doubles, once per digit literal); χ² contributions are single
    * IEEE expressions of exact ints + the fp share. Scale shape: one
    * map pass, a 9-key aggregate with map-side partials, a broadcast
    * 1-row total join, 9-row close. */
  private val u37: Fn = (s, d) => {
    val cents = Tables.events(s, d)
      .select((col("value").cast(DecimalType(18, 2)) * 100).cast(LongType).as("c"))
      .filter(col("c") > 0L)
      .select(substring(col("c").cast(StringType), 1, 1).cast(IntegerType).as("digit"))
    val counts = cents.groupBy("digit").agg(count(lit(1)).cast(LongType).as("n_obs"))
    val digits = s.range(1, 10).select(col("id").cast(IntegerType).as("digit"))
    val total = counts.agg(sum(col("n_obs")).cast(LongType).as("n_total"))
    digits.join(counts, Seq("digit"), "left")
      .withColumn("n_obs", coalesce(col("n_obs"), lit(0L)))
      .crossJoin(broadcast(total))
      .withColumn("benford_fp",
        (log(lit(1.0) + lit(1.0) / col("digit").cast(DoubleType)) / log(lit(10.0)) * 1e9)
          .cast(LongType))
      .withColumn("expected",
        col("n_total").cast(DoubleType) * col("benford_fp").cast(DoubleType) / 1e9)
      .select(col("digit"), col("n_obs"),
        round(col("n_obs").cast(DoubleType) / col("n_total").cast(DoubleType), 6)
          .as("obs_share"),
        round(col("benford_fp").cast(DoubleType) / 1e9, 6).as("benford_share"),
        round((col("n_obs").cast(DoubleType) - col("expected")) *
          (col("n_obs").cast(DoubleType) - col("expected")) / col("expected"), 6)
          .as("chi2_contrib"))
      .orderBy("digit")
  }
  private val u37Sql =
    """WITH cents AS (
      |  SELECT CAST(substring(CAST(c AS VARCHAR), 1, 1) AS INTEGER) AS digit FROM (
      |    SELECT CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT) AS c FROM events) t
      |  WHERE c > 0),
      |counts AS (SELECT digit, CAST(count(*) AS BIGINT) AS n_obs FROM cents GROUP BY 1),
      |tot AS (SELECT CAST(sum(n_obs) AS BIGINT) AS n_total FROM counts),
      |scaffold AS (SELECT CAST(range AS INTEGER) AS digit FROM range(1, 10)),
      |rows_b AS (
      |  SELECT s.digit, coalesce(c.n_obs, 0) AS n_obs, t.n_total,
      |         CAST(trunc(ln(1.0 + 1.0 / s.digit) / ln(10.0) * 1e9) AS BIGINT) AS benford_fp
      |  FROM scaffold s LEFT JOIN counts c USING (digit) CROSS JOIN tot t)
      |SELECT digit, n_obs,
      |       round(CAST(n_obs AS DOUBLE) / CAST(n_total AS DOUBLE), 6) AS obs_share,
      |       round(CAST(benford_fp AS DOUBLE) / 1e9, 6) AS benford_share,
      |       round((CAST(n_obs AS DOUBLE) - CAST(n_total AS DOUBLE) * CAST(benford_fp AS DOUBLE) / 1e9)
      |             * (CAST(n_obs AS DOUBLE) - CAST(n_total AS DOUBLE) * CAST(benford_fp AS DOUBLE) / 1e9)
      |             / (CAST(n_total AS DOUBLE) * CAST(benford_fp AS DOUBLE) / 1e9), 6) AS chi2_contrib
      |FROM rows_b
      |ORDER BY digit""".stripMargin

  // --------------------- u38 referential-integrity manifest

  /** u38: the referential-integrity MANIFEST — every FK edge of the
    * warehouse star checked for orphans (child rows whose FK matches no
    * parent PK): the audit a 100-TB ingest runs before anything joins,
    * because a broken edge silently drops rows in every inner join
    * downstream. Per edge: child row count, orphan count, verdict.
    *
    * Exactness: pure BIGINT counting over PK-unique left joins. Scale
    * shape: seven independent key joins (dims broadcast, fact-fact
    * shuffled fine-grained), each reduced to ONE row by a map-side
    * partial-agg'd count — no orphan ROWS ever ship, only counts. */
  private val u38: Fn = (s, d) => {
    def edge(name: String, child: DataFrame, fk: String, parent: DataFrame, pk: String,
        bcast: Boolean): DataFrame = {
      val p0 = parent.select(col(pk).as("__pk"))
      val p = if (bcast) broadcast(p0) else p0
      child.join(p, col(fk) === col("__pk"), "left")
        .agg(count(lit(1)).cast(LongType).as("n_child"),
          sum(when(col("__pk").isNull, 1L).otherwise(0L)).cast(LongType).as("n_orphans"))
        .select(lit(name).as("edge"), col("n_child"), col("n_orphans"),
          (col("n_orphans") === 0L).as("ok"))
    }
    val li = Tables.lineitem(s, d); val or = Tables.orders(s, d)
    val cu = Tables.customer(s, d); val su = Tables.supplier(s, d)
    val na = Tables.nation(s, d); val re = Tables.region(s, d)
    Seq(
      edge("lineitem.l_orderkey->orders", li, "l_orderkey", or, "o_orderkey", bcast = false),
      edge("lineitem.l_partkey->part", li, "l_partkey", Tables.part(s, d), "p_partkey", bcast = true),
      edge("lineitem.l_suppkey->supplier", li, "l_suppkey", su, "s_suppkey", bcast = true),
      edge("orders.o_custkey->customer", or, "o_custkey", cu, "c_custkey", bcast = true),
      edge("customer.c_nationkey->nation", cu, "c_nationkey", na, "n_nationkey", bcast = true),
      edge("supplier.s_nationkey->nation", su, "s_nationkey", na, "n_nationkey", bcast = true),
      edge("nation.n_regionkey->region", na, "n_regionkey", re, "r_regionkey", bcast = true))
      .reduce(_.unionAll(_)).orderBy("edge")
  }
  private val u38Sql = {
    def block(name: String, child: String, fk: String, parent: String, pk: String) =
      s"""SELECT '$name' AS edge, CAST(count(*) AS BIGINT) AS n_child,
         |       CAST(sum(CASE WHEN p.$pk IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_orphans,
         |       sum(CASE WHEN p.$pk IS NULL THEN 1 ELSE 0 END) = 0 AS ok
         |FROM $child c LEFT JOIN $parent p ON c.$fk = p.$pk""".stripMargin
    Seq(
      block("lineitem.l_orderkey->orders", "lineitem", "l_orderkey", "orders", "o_orderkey"),
      block("lineitem.l_partkey->part", "lineitem", "l_partkey", "part", "p_partkey"),
      block("lineitem.l_suppkey->supplier", "lineitem", "l_suppkey", "supplier", "s_suppkey"),
      block("orders.o_custkey->customer", "orders", "o_custkey", "customer", "c_custkey"),
      block("customer.c_nationkey->nation", "customer", "c_nationkey", "nation", "n_nationkey"),
      block("supplier.s_nationkey->nation", "supplier", "s_nationkey", "nation", "n_nationkey"),
      block("nation.n_regionkey->region", "nation", "n_regionkey", "region", "r_regionkey"))
      .mkString("\nUNION ALL\n") + "\nORDER BY edge"
  }

  // --------------------- s38 degree assortativity

  /** s38: degree ASSORTATIVITY of the s10 kNN graph (Newman 2002) —
    * the mixing statistic the graph set lacked: do high-degree vectors
    * link to high-degree vectors (hub cores, r > 0) or to leaves
    * (hub-and-spoke, r < 0)? Retrieval graphs skew disassortative as
    * hub vectors absorb edges — the health signal for the s10/s12
    * pipeline. Computed as the Pearson correlation of end degrees over
    * the SYMMETRIZED edge list (each undirected edge contributes both
    * orientations — exactly Newman's r).
    *
    * Exactness: degrees are BIGINT counts; the correlation moments
    * lift every product to DECIMAL(38,0)/HUGEINT before summing (the
    * p38 discipline); r is one division of exact-integer-derived
    * doubles. Scale shape: the degree relation is node-grain, the
    * moment pass is edge-grain with two fine-grained key joins and a
    * 1-row close; degrees are K-bounded on a kNN graph, so no skew. */
  private val s38: Fn = (s, d) => {
    val und = SimilarityQueries.knnPool(s, d)
      .select(least(col("a_id"), col("b_id")).as("u"),
        greatest(col("a_id"), col("b_id")).as("v"))
      .distinct()
    val sym = und.select(col("u").as("x"), col("v").as("y"))
      .unionAll(und.select(col("v").as("x"), col("u").as("y")))
    val deg = sym.groupBy(col("x").as("node")).agg(count(lit(1)).cast(LongType).as("deg"))
    val pairs = sym
      .join(deg.select(col("node").as("x"), col("deg").as("dx")), "x")
      .join(deg.select(col("node").as("y"), col("deg").as("dy")), "y")
    pairs.agg(
      count(lit(1)).cast(LongType).as("m2"),
      sum(col("dx")).cast(LongType).as("sx"),
      sum(col("dy")).cast(LongType).as("sy"),
      sum(dec(col("dx")) * dec(col("dy"))).as("sxy"),
      sum(dec(col("dx")) * dec(col("dx"))).as("sxx"),
      sum(dec(col("dy")) * dec(col("dy"))).as("syy"))
      .select(
        expr("m2 div 2").cast(LongType).as("n_edges"),
        round((dec(col("m2")) * col("sxy") - dec(col("sx")) * dec(col("sy"))).cast(DoubleType) /
          (sqrt((dec(col("m2")) * col("sxx") - dec(col("sx")) * dec(col("sx"))).cast(DoubleType)) *
            sqrt((dec(col("m2")) * col("syy") - dec(col("sy")) * dec(col("sy"))).cast(DoubleType))),
          6).as("assortativity"))
  }
  private val s38Sql =
    s"""WITH knn AS (${SimilarityQueries.s10Sql}),
       |und AS (
       |  SELECT DISTINCT least(a_id, b_id) AS u, greatest(a_id, b_id) AS v FROM knn),
       |sym AS (SELECT u AS x, v AS y FROM und UNION ALL SELECT v AS x, u AS y FROM und),
       |deg AS (SELECT x AS node, CAST(count(*) AS BIGINT) AS deg FROM sym GROUP BY 1),
       |pairs AS (
       |  SELECT dx.deg AS dx, dy.deg AS dy
       |  FROM sym s JOIN deg dx ON s.x = dx.node JOIN deg dy ON s.y = dy.node),
       |mom AS (
       |  SELECT CAST(count(*) AS BIGINT) AS m2,
       |         CAST(sum(dx) AS BIGINT) AS sx, CAST(sum(dy) AS BIGINT) AS sy,
       |         sum(CAST(dx AS HUGEINT) * CAST(dy AS HUGEINT)) AS sxy,
       |         sum(CAST(dx AS HUGEINT) * CAST(dx AS HUGEINT)) AS sxx,
       |         sum(CAST(dy AS HUGEINT) * CAST(dy AS HUGEINT)) AS syy
       |  FROM pairs)
       |SELECT CAST(m2 // 2 AS BIGINT) AS n_edges,
       |       round(CAST(m2 * sxy - CAST(sx AS HUGEINT) * CAST(sy AS HUGEINT) AS DOUBLE) /
       |             (sqrt(CAST(m2 * sxx - CAST(sx AS HUGEINT) * CAST(sx AS HUGEINT) AS DOUBLE)) *
       |              sqrt(CAST(m2 * syy - CAST(sy AS HUGEINT) * CAST(sy AS HUGEINT) AS DOUBLE))), 6)
       |         AS assortativity
       |FROM mom""".stripMargin

  val all: Seq[Q] = Seq(
    Q("r137_cohort_retention", r137, Some(r137Sql)),
    Q("r138_ols_loglog", r138, Some(r138Sql)),
    Q("u37_benford_digits", u37, Some(u37Sql)),
    Q("u38_referential_integrity", u38, Some(u38Sql)),
    Q("s38_degree_assortativity", s38, Some(s38Sql)))
}
