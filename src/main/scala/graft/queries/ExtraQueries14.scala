package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DoubleType, LongType}
import graft.Tables
import graft.queries.Relational.{Fn, Q, money}

/** Round-7 batch 15: the Kolmogorov–Smirnov two-sample statistic (the
  * whole-distribution companion to r101's rank-sum location test) and a
  * functional-dependency audit (the profiling step behind u18's
  * candidate keys and u19's FK edges).
  *
  * Same determinism discipline as ExtraQueries3–13.
  */
object ExtraQueries14 {

  private def orders(s: SparkSession, d: String) = Tables.orders(s, d)
  private def customer(s: SparkSession, d: String) = Tables.customer(s, d)
  private def nation(s: SparkSession, d: String) = Tables.nation(s, d)
  private def region(s: SparkSession, d: String) = Tables.region(s, d)
  private def lineitem(s: SparkSession, d: String) = Tables.lineitem(s, d)
  private def part(s: SparkSession, d: String) = Tables.part(s, d)

  // ---------------------------------------- r109 Kolmogorov–Smirnov

  /** r109: two-sample Kolmogorov–Smirnov statistic, each region's
    * order-value distribution against the rest of the corpus — the
    * whole-shape test that catches what r101's rank-sum misses (equal
    * medians with different spread/tails) and what u10's PSI bins blur
    * (D is the exact sup-norm gap, not a binned approximation). The
    * standing "is this segment drawn from the same distribution"
    * screen.
    *
    * Exactness: D's numerator is max |cumA·nB − cumB·nA| — a pure
    * BIGINT maximum over the merged value axis (the r101 histogram
    * discipline: cross-multiplied, so NO per-value division exists;
    * magnitudes ≤ n1·n2 ≈ 4e9 — exact in BIGINT); the one double
    * division happens once per region at the end.
    * Scale shape: ONE corpus-sized (region, cents) histogram
    * aggregation; the merged axis is the distinct-value relation
    * crossed with the ≤|regions|-row tag set, cumulated by
    * region-partitioned windows; group sizes ride in as a broadcast
    * |regions|-row join. At 100 TB the axis is value-domain-sized —
    * the same counting-method bound as r66/r101/r107. */
  private val r109: Fn = (s, d) => {
    val cents = orders(s, d)
      .join(customer(s, d), col("o_custkey") === col("c_custkey"))
      .join(broadcast(nation(s, d)), col("c_nationkey") === col("n_nationkey"))
      .join(broadcast(region(s, d)), col("n_regionkey") === col("r_regionkey"))
      .select(col("r_name"), (money(col("o_totalprice")) * 100).cast(LongType).as("cents"))
    val hist = cents.groupBy("r_name", "cents").agg(count(lit(1)).as("cr"))
    val total = cents.groupBy("cents").agg(count(lit(1)).as("ct"))
    val sizes = hist.groupBy("r_name").agg(sum(col("cr")).cast(LongType).as("n1"))
      .crossJoin(broadcast(total.agg(sum(col("ct")).cast(LongType).as("n"))))
      .select(col("r_name").as("reg"), col("n1"), (col("n") - col("n1")).as("n2"))
    val axis = total.crossJoin(broadcast(sizes.select(col("reg"))))
      .join(hist, col("reg") === hist("r_name") && total("cents") === hist("cents"), "left")
      .select(col("reg"), total("cents").as("v"),
        coalesce(col("cr"), lit(0L)).as("ca"),
        (col("ct") - coalesce(col("cr"), lit(0L))).as("cb"))
    val w = Window.partitionBy("reg").orderBy("v")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    axis
      .withColumn("cuma", sum(col("ca")).over(w))
      .withColumn("cumb", sum(col("cb")).over(w))
      .join(broadcast(sizes), Seq("reg"))
      .withColumn("gap", abs(col("cuma") * col("n2") - col("cumb") * col("n1")))
      .groupBy(col("reg").as("r_name"))
      .agg(first(col("n1")).as("n1"), first(col("n2")).as("n2"),
        max(col("gap")).cast(LongType).as("d_num"))
      .withColumn("ks_d", round(col("d_num").cast(DoubleType) /
        (col("n1").cast(DoubleType) * col("n2").cast(DoubleType)), 6))
      .select("r_name", "n1", "n2", "d_num", "ks_d")
      .orderBy("r_name")
  }

  private val r109Sql =
    """WITH cents AS (
      |  SELECT r_name, CAST(CAST(o_totalprice AS DECIMAL(12,2)) * 100 AS BIGINT) AS cents
      |  FROM orders
      |  JOIN customer ON o_custkey = c_custkey
      |  JOIN nation ON c_nationkey = n_nationkey
      |  JOIN region ON n_regionkey = r_regionkey),
      |hist AS (SELECT r_name, cents, count(*) AS cr FROM cents GROUP BY 1, 2),
      |total AS (SELECT cents, count(*) AS ct FROM cents GROUP BY 1),
      |sizes AS (
      |  SELECT h.r_name AS reg, CAST(sum(h.cr) AS BIGINT) AS n1,
      |         (SELECT CAST(sum(ct) AS BIGINT) FROM total) - CAST(sum(h.cr) AS BIGINT) AS n2
      |  FROM hist h GROUP BY 1),
      |axis AS (
      |  SELECT s.reg, t.cents AS v,
      |         COALESCE(h.cr, 0) AS ca, t.ct - COALESCE(h.cr, 0) AS cb
      |  FROM total t
      |  CROSS JOIN (SELECT reg FROM sizes) s
      |  LEFT JOIN hist h ON h.r_name = s.reg AND h.cents = t.cents),
      |cum AS (
      |  SELECT reg, v,
      |         sum(ca) OVER (PARTITION BY reg ORDER BY v ROWS UNBOUNDED PRECEDING) AS cuma,
      |         sum(cb) OVER (PARTITION BY reg ORDER BY v ROWS UNBOUNDED PRECEDING) AS cumb
      |  FROM axis)
      |SELECT s.reg AS r_name, s.n1, s.n2,
      |       CAST(max(abs(c.cuma * s.n2 - c.cumb * s.n1)) AS BIGINT) AS d_num,
      |       round(CAST(max(abs(c.cuma * s.n2 - c.cumb * s.n1)) AS DOUBLE) /
      |             (CAST(s.n1 AS DOUBLE) * CAST(s.n2 AS DOUBLE)), 6) AS ks_d
      |FROM cum c JOIN sizes s ON c.reg = s.reg
      |GROUP BY 1, 2, 3
      |ORDER BY 1""".stripMargin

  // ---------------------------------------- u25 functional-dependency audit

  /** The declared candidate dependencies: (name, table, determinant,
    * dependent). A mix that holds (key-determined) and fails (genuine
    * multi-valued relationships) so the audit demonstrates both
    * verdicts. */
  val FdCandidates: Seq[(String, String, String, String)] = Seq(
    ("orders_key_priority", "orders", "o_orderkey", "o_orderpriority"),
    ("orders_cust_priority", "orders", "o_custkey", "o_orderpriority"),
    ("lineitem_order_ship", "lineitem", "l_orderkey", "l_shipdate"),
    ("lineitem_part_supp", "lineitem", "l_partkey", "l_suppkey"),
    ("part_brand_type", "part", "p_brand", "p_type"),
    ("customer_nation_segment", "customer", "c_nationkey", "c_mktsegment"))

  /** u25: functional-dependency audit — for every declared candidate
    * A→B, count determinant groups whose dependent takes more than one
    * value. The profiling primitive between u18 (candidate keys = FDs
    * onto the whole row) and u19 (FK containment): modeling and
    * normalization decisions hang on which FDs actually hold, and a
    * "mostly holds" FD (violation_frac just above 0) is the classic
    * dirty-data smell this table surfaces.
    *
    * Exactness: per candidate, one (determinant)-keyed aggregation of
    * countDistinct(dependent) and a counts-only rollup; one rounded
    * fraction.
    * Scale shape: each candidate rides a 2-column projection through
    * one keyed two-phase distinct agg; candidates are independent
    * branches of one union (at 100 TB each is the cheapest possible
    * pass over its table). */
  private val u25: Fn = (s, d) => {
    def audit(name: String, tbl: DataFrame, det: String, dep: String): DataFrame =
      tbl.select(col(det).cast("string").as("det"), col(dep).cast("string").as("dep"))
        .groupBy("det").agg(countDistinct(col("dep")).as("nd"))
        .agg(count(lit(1)).as("n_groups"),
          sum(when(col("nd") > 1, 1L).otherwise(0L)).cast(LongType).as("n_violating"),
          max(col("nd")).cast(LongType).as("max_dep_distinct"))
        .select(lit(name).as("fd"), col("n_groups"), col("n_violating"),
          col("max_dep_distinct"))
    val tables: Map[String, DataFrame] = Map(
      "orders" -> orders(s, d), "lineitem" -> lineitem(s, d),
      "part" -> part(s, d), "customer" -> customer(s, d))
    FdCandidates.map { case (n, t, a, b) => audit(n, tables(t), a, b) }
      .reduce(_ unionByName _)
      .withColumn("holds", col("n_violating") === 0L)
      .withColumn("violation_frac", round(col("n_violating").cast(DoubleType) /
        col("n_groups").cast(DoubleType), 6))
      .select("fd", "n_groups", "n_violating", "max_dep_distinct", "holds",
        "violation_frac")
      .orderBy("fd")
  }

  private val u25Sql = {
    val arms = FdCandidates.map { case (n, t, a, b) =>
      s"""SELECT '$n' AS fd, count(*) AS n_groups,
         |       CAST(sum(CASE WHEN nd > 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_violating,
         |       CAST(max(nd) AS BIGINT) AS max_dep_distinct
         |FROM (SELECT CAST($a AS VARCHAR) AS det, count(DISTINCT CAST($b AS VARCHAR)) AS nd
         |      FROM $t GROUP BY 1) g""".stripMargin
    }
    s"""WITH armed AS (
       |${arms.mkString("\nUNION ALL\n")})
       |SELECT fd, n_groups, n_violating, max_dep_distinct,
       |       n_violating = 0 AS holds,
       |       round(CAST(n_violating AS DOUBLE) / CAST(n_groups AS DOUBLE), 6) AS violation_frac
       |FROM armed
       |ORDER BY fd""".stripMargin
  }

  val all: Seq[Q] = Seq(
    Q("r109_ks_test", r109, Some(r109Sql)),
    Q("u25_fd_audit", u25, Some(u25Sql)))
}
