package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.apache.spark.sql.expressions.Window
import graft.Tables

/** Relational operator coverage over the TPC-H-ish fixture tables.
  *
  * The reference pipeline (kevinj/ctgov-ai-etl, `/root/reference/etl.py`)
  * contains no joins, aggregations, windows, or set ops (SURVEY.md §2.3) —
  * this module is the extension surface that makes the engine a complete
  * analytics library, expressed entirely with `org.apache.spark.sql`
  * built-ins so Catalyst/Tungsten handle pushdown, pruning, codegen, AQE.
  *
  * == Oracle-parity rules (every query here is hash-compared vs DuckDB) ==
  *  - Money/double aggregates are cast to exact DECIMAL *before* SUM so the
  *    result is independent of partition/accumulation order, then cast back
  *    to double and rounded. Input doubles carry <=2 decimals, so per-row
  *    products have <=4 (x2 factors) or <=6 (x3) exact decimals — the
  *    decimal cast is exact in both engines.
  *  - Every query ends in a total ORDER BY (unique tiebreaker included).
  *  - Integer-ish derived columns are cast to the same width on both sides
  *    (Spark row_number is int32, DuckDB's is int64, etc.).
  *
  * == Scale notes (100 TB design) ==
  *  - lineitem/orders are the fact tables: joins between them shuffle on
  *    the join key (sort-merge + AQE); never broadcast.
  *  - region/nation/supplier are tiny dimensions at any scale → explicit
  *    `broadcast()` hints.
  *  - part/customer are mid-size dims: broadcastable at bench scale, and
  *    at 100 TB AQE decides from runtime stats; we leave them unhinted.
  *  - Aggregations use partial (map-side) aggregation automatically; the
  *    decimal-sum trick keeps them in whole-stage codegen.
  */
object Relational {

  type Fn = (SparkSession, String) => DataFrame
  final case class Q(name: String, fn: Fn, oracle: Option[String])

  /** Order-independent exact sum of a <=`scale`-decimal double expression.
    * Output stays DECIMAL: whole-table money sums overflow double's 15-16
    * significant digits at large scale factors, so a double conversion
    * (and any rounding of it) is ill-conditioned — the exact decimal is
    * hash-stable in both engines at any magnitude. */
  private def dsum(c: Column, scale: Int): Column =
    sum(c.cast(DecimalType(24, scale))).cast(DecimalType(38, scale))

  /** Exact money algebra: operands become DECIMAL *before* any multiply,
    * so both engines do pure fixed-point arithmetic and no double product
    * is ever rounded to a decimal grid (that rounding can land on a
    * half-way point and is engine-version-dependent). Casting the <=2-
    * decimal base columns themselves is unambiguous — the nearest scale-2
    * grid point is never a tie. money*(1±pct) → DECIMAL(18,4); a further
    * *(1±pct) → DECIMAL(24,6); both well inside 38 digits in Spark and
    * DuckDB, so every step is exact. */
  private[queries] def money(c: Column): Column = c.cast(DecimalType(12, 2))
  private[queries] def pct(c: Column): Column = c.cast(DecimalType(4, 2))
  private[queries] val oneD: Column = lit(1).cast(DecimalType(4, 2))

  private val ts = (s: String) => lit(s).cast(TimestampType)

  // ---------------------------------------------------------------- queries

  /** TPC-H Q1 shape: scan + filter + group-by with several exact aggregates.
    * Plan: single scan, filter pushed to parquet, partial agg before the
    * 2-key shuffle. Cardinality of the group-by output is tiny (RF x LS). */
  private val q01: Fn = (s, d) => {
    val li = Tables.lineitem(s, d)
    li.filter(col("l_shipdate") <= ts("2000-12-01"))
      .groupBy(col("l_returnflag"), col("l_linestatus"))
      .agg(
        dsum(col("l_quantity"), 2).as("sum_qty"),
        dsum(col("l_extendedprice"), 2).as("sum_base_price"),
        dsum(money(col("l_extendedprice")) * (oneD - pct(col("l_discount"))), 4).as("sum_disc_price"),
        dsum(money(col("l_extendedprice")) * (oneD - pct(col("l_discount"))) * (oneD + pct(col("l_tax"))), 6).as("sum_charge"),
        (sum(col("l_quantity").cast(DecimalType(24, 2))).cast(DoubleType) / count(lit(1))).as("avg_qty"),
        (sum(col("l_extendedprice").cast(DecimalType(24, 2))).cast(DoubleType) / count(lit(1))).as("avg_price"),
        count(lit(1)).as("count_order"))
      .orderBy(col("l_returnflag"), col("l_linestatus"))
  }
  private val q01Sql =
    """SELECT l_returnflag, l_linestatus,
      |  CAST(sum(CAST(l_quantity AS DECIMAL(24,2))) AS DECIMAL(38,2)) AS sum_qty,
      |  CAST(sum(CAST(l_extendedprice AS DECIMAL(24,2))) AS DECIMAL(38,2)) AS sum_base_price,
      |  CAST(sum(CAST(CAST(l_extendedprice AS DECIMAL(12,2)) * (CAST(1 AS DECIMAL(4,2)) - CAST(l_discount AS DECIMAL(4,2))) AS DECIMAL(24,4))) AS DECIMAL(38,4)) AS sum_disc_price,
      |  CAST(sum(CAST(CAST(l_extendedprice AS DECIMAL(12,2)) * (CAST(1 AS DECIMAL(4,2)) - CAST(l_discount AS DECIMAL(4,2))) * (CAST(1 AS DECIMAL(4,2)) + CAST(l_tax AS DECIMAL(4,2))) AS DECIMAL(24,6))) AS DECIMAL(38,6)) AS sum_charge,
      |  CAST(sum(CAST(l_quantity AS DECIMAL(24,2))) AS DOUBLE) / count(*) AS avg_qty,
      |  CAST(sum(CAST(l_extendedprice AS DECIMAL(24,2))) AS DOUBLE) / count(*) AS avg_price,
      |  count(*) AS count_order
      |FROM lineitem WHERE l_shipdate <= TIMESTAMP '2000-12-01'
      |GROUP BY l_returnflag, l_linestatus
      |ORDER BY l_returnflag, l_linestatus""".stripMargin

  /** Projection + selective filter; both the predicate and the 5-column
    * read schema must reach the parquet scan (PushedFilters/ReadSchema). */
  private val q02: Fn = (s, d) =>
    Tables.lineitem(s, d)
      .filter(col("l_shipdate").between(ts("1996-01-01"), ts("1996-12-31")) && col("l_quantity") < 10)
      .select("l_orderkey", "l_linenumber", "l_quantity", "l_extendedprice", "l_returnflag")
      .orderBy("l_orderkey", "l_linenumber")
  private val q02Sql =
    """SELECT l_orderkey, l_linenumber, l_quantity, l_extendedprice, l_returnflag
      |FROM lineitem
      |WHERE l_shipdate BETWEEN TIMESTAMP '1996-01-01' AND TIMESTAMP '1996-12-31' AND l_quantity < 10
      |ORDER BY l_orderkey, l_linenumber""".stripMargin

  /** TPC-H Q3 shape: 3-way join + agg + top-N. customer is the small side
    * (AQE broadcasts it at bench scale); orders⋈lineitem is the big
    * shuffle join on the orderkey. */
  private val q03: Fn = (s, d) => {
    val c = Tables.customer(s, d).filter(col("c_mktsegment") === "BUILDING")
    val o = Tables.orders(s, d).filter(col("o_orderdate") < ts("1998-01-01"))
    val l = Tables.lineitem(s, d).filter(col("l_shipdate") > ts("1998-01-01"))
    c.join(o, col("c_custkey") === col("o_custkey"))
      .join(l, col("o_orderkey") === col("l_orderkey"))
      .groupBy(col("l_orderkey"), col("o_orderdate"), col("o_orderpriority"))
      .agg(dsum(money(col("l_extendedprice")) * (oneD - pct(col("l_discount"))), 4).as("revenue"))
      .select("l_orderkey", "revenue", "o_orderdate", "o_orderpriority")
      .orderBy(desc("revenue"), col("l_orderkey"))
      .limit(10)
  }
  private val q03Sql =
    """SELECT l_orderkey,
      |  CAST(sum(CAST(CAST(l_extendedprice AS DECIMAL(12,2)) * (CAST(1 AS DECIMAL(4,2)) - CAST(l_discount AS DECIMAL(4,2))) AS DECIMAL(24,4))) AS DECIMAL(38,4)) AS revenue,
      |  o_orderdate, o_orderpriority
      |FROM customer JOIN orders ON c_custkey = o_custkey JOIN lineitem ON l_orderkey = o_orderkey
      |WHERE c_mktsegment = 'BUILDING' AND o_orderdate < TIMESTAMP '1998-01-01' AND l_shipdate > TIMESTAMP '1998-01-01'
      |GROUP BY l_orderkey, o_orderdate, o_orderpriority
      |ORDER BY revenue DESC, l_orderkey LIMIT 10""".stripMargin

  /** EXISTS as a left-semi join (SURVEY.md O16 generalized): no row
    * duplication, lineitem side reduced to the join key before shuffle. */
  private val q04: Fn = (s, d) => {
    val o = Tables.orders(s, d)
    val big = Tables.lineitem(s, d).filter(col("l_quantity") > 45).select(col("l_orderkey"))
    o.join(big, col("o_orderkey") === col("l_orderkey"), "left_semi")
      .groupBy(col("o_orderpriority")).agg(count(lit(1)).as("order_count"))
      .orderBy("o_orderpriority")
  }
  private val q04Sql =
    """SELECT o_orderpriority, count(*) AS order_count
      |FROM orders
      |WHERE EXISTS (SELECT 1 FROM lineitem WHERE l_orderkey = o_orderkey AND l_quantity > 45)
      |GROUP BY o_orderpriority ORDER BY o_orderpriority""".stripMargin

  /** TPC-H Q5 shape: 6-table star join. region/nation/supplier are
    * broadcast (tiny at any scale); the customer⋈orders⋈lineitem chain
    * shuffles on its keys. */
  private val q05: Fn = (s, d) => {
    val r = broadcast(Tables.region(s, d).filter(col("r_name") === "ASIA"))
    val n = broadcast(Tables.nation(s, d))
    val su = broadcast(Tables.supplier(s, d))
    val c = Tables.customer(s, d)
    val o = Tables.orders(s, d)
      .filter(col("o_orderdate") >= ts("1996-01-01") && col("o_orderdate") < ts("1997-01-01"))
    val l = Tables.lineitem(s, d)
    c.join(n, col("c_nationkey") === col("n_nationkey"))
      .join(r, col("n_regionkey") === col("r_regionkey"))
      .join(o, col("c_custkey") === col("o_custkey"))
      .join(l, col("o_orderkey") === col("l_orderkey"))
      .join(su, col("l_suppkey") === col("s_suppkey") && col("s_nationkey") === col("c_nationkey"))
      .groupBy(col("n_name"))
      .agg(dsum(money(col("l_extendedprice")) * (oneD - pct(col("l_discount"))), 4).as("revenue"))
      .orderBy(desc("revenue"), col("n_name"))
  }
  private val q05Sql =
    """SELECT n_name,
      |  CAST(sum(CAST(CAST(l_extendedprice AS DECIMAL(12,2)) * (CAST(1 AS DECIMAL(4,2)) - CAST(l_discount AS DECIMAL(4,2))) AS DECIMAL(24,4))) AS DECIMAL(38,4)) AS revenue
      |FROM customer
      |JOIN nation ON c_nationkey = n_nationkey
      |JOIN region ON n_regionkey = r_regionkey
      |JOIN orders ON c_custkey = o_custkey
      |JOIN lineitem ON o_orderkey = l_orderkey
      |JOIN supplier ON l_suppkey = s_suppkey AND s_nationkey = c_nationkey
      |WHERE r_name = 'ASIA' AND o_orderdate >= TIMESTAMP '1996-01-01' AND o_orderdate < TIMESTAMP '1997-01-01'
      |GROUP BY n_name ORDER BY revenue DESC, n_name""".stripMargin

  /** TPC-H Q6 shape: scalar aggregate, fully pushed-down scan. */
  private val q06: Fn = (s, d) =>
    Tables.lineitem(s, d)
      .filter(col("l_shipdate") >= ts("1996-01-01") && col("l_shipdate") < ts("1997-01-01") &&
        col("l_discount").between(0.05, 0.07) && col("l_quantity") < 24)
      .agg(dsum(money(col("l_extendedprice")) * pct(col("l_discount")), 4).as("revenue"))
  private val q06Sql =
    """SELECT CAST(sum(CAST(CAST(l_extendedprice AS DECIMAL(12,2)) * CAST(l_discount AS DECIMAL(4,2)) AS DECIMAL(24,4))) AS DECIMAL(38,4)) AS revenue
      |FROM lineitem
      |WHERE l_shipdate >= TIMESTAMP '1996-01-01' AND l_shipdate < TIMESTAMP '1997-01-01'
      |  AND l_discount BETWEEN 0.05 AND 0.07 AND l_quantity < 24""".stripMargin

  /** TPC-H Q13 shape: LEFT OUTER join preserving customers with zero
    * orders, then a second aggregation over the counts. */
  private val q07: Fn = (s, d) => {
    val c = Tables.customer(s, d)
    val o = Tables.orders(s, d)
    c.join(o, col("c_custkey") === col("o_custkey"), "left_outer")
      .groupBy(col("c_custkey")).agg(count(col("o_orderkey")).as("c_count"))
      .groupBy(col("c_count")).agg(count(lit(1)).as("custdist"))
      .orderBy(desc("custdist"), desc("c_count"))
  }
  private val q07Sql =
    """SELECT c_count, count(*) AS custdist
      |FROM (SELECT c_custkey, count(o_orderkey) AS c_count
      |      FROM customer LEFT JOIN orders ON c_custkey = o_custkey
      |      GROUP BY c_custkey) t
      |GROUP BY c_count ORDER BY custdist DESC, c_count DESC""".stripMargin

  /** Global top-K: orderBy+limit → Spark's TakeOrderedAndProject (no full
    * sort, per-partition heaps — the scalable top-k plan). */
  private val q08: Fn = (s, d) =>
    Tables.lineitem(s, d)
      .select("l_orderkey", "l_linenumber", "l_extendedprice")
      .orderBy(desc("l_extendedprice"), col("l_orderkey"), col("l_linenumber"))
      .limit(25)
  private val q08Sql =
    """SELECT l_orderkey, l_linenumber, l_extendedprice
      |FROM lineitem ORDER BY l_extendedprice DESC, l_orderkey, l_linenumber LIMIT 25""".stripMargin

  /** Windowed top-N per group (row_number + filter): one shuffle on the
    * partition key, sort within partitions. */
  private val q09: Fn = (s, d) => {
    val w = Window.partitionBy(col("o_custkey")).orderBy(desc("o_totalprice"), col("o_orderkey"))
    Tables.orders(s, d)
      .withColumn("rk", row_number().over(w).cast(LongType))
      .filter(col("rk") <= 3)
      .select("o_custkey", "o_orderkey", "o_totalprice", "rk")
      .orderBy("o_custkey", "rk")
  }
  private val q09Sql =
    """SELECT o_custkey, o_orderkey, o_totalprice, rk FROM (
      |  SELECT o_custkey, o_orderkey, o_totalprice,
      |         row_number() OVER (PARTITION BY o_custkey ORDER BY o_totalprice DESC, o_orderkey) AS rk
      |  FROM orders) t
      |WHERE rk <= 3 ORDER BY o_custkey, rk""".stripMargin

  /** Running aggregates + lag + row_number over one per-customer window.
    * The sum uses an explicit ROWS frame and decimal-exact accumulation. */
  private val q10: Fn = (s, d) => {
    val wOrd = Window.partitionBy(col("o_custkey")).orderBy(col("o_orderdate"), col("o_orderkey"))
    val wRun = wOrd.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    Tables.orders(s, d)
      .select(
        col("o_custkey"), col("o_orderkey"), col("o_orderdate"),
        round(sum(col("o_totalprice").cast(DecimalType(24, 2))).over(wRun).cast(DoubleType), 2).as("running_spend"),
        lag(col("o_orderkey"), 1).over(wOrd).as("prev_order"),
        row_number().over(wOrd).cast(LongType).as("rn"))
      .orderBy("o_custkey", "rn")
  }
  private val q10Sql =
    """SELECT o_custkey, o_orderkey, o_orderdate,
      |  round(CAST(sum(CAST(o_totalprice AS DECIMAL(24,2))) OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE), 2) AS running_spend,
      |  lag(o_orderkey, 1) OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey) AS prev_order,
      |  row_number() OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey) AS rn
      |FROM orders ORDER BY o_custkey, rn""".stripMargin

  /** Exact distinct counts per group (shuffle-heavy on purpose; the approx
    * HLL variant lives in PipelineQueries as a rows-only query). */
  private val q11: Fn = (s, d) =>
    Tables.lineitem(s, d)
      .groupBy(col("l_returnflag"))
      .agg(
        countDistinct(col("l_partkey")).as("distinct_parts"),
        countDistinct(col("l_suppkey")).as("distinct_supps"),
        count(lit(1)).as("n"))
      .orderBy("l_returnflag")
  private val q11Sql =
    """SELECT l_returnflag, count(DISTINCT l_partkey) AS distinct_parts,
      |       count(DISTINCT l_suppkey) AS distinct_supps, count(*) AS n
      |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin

  /** INTERSECT (distinct semantics in both engines). */
  private val q12: Fn = (s, d) => {
    val o = Tables.orders(s, d)
    val a = o.filter(col("o_orderdate") >= ts("1996-01-01") && col("o_orderdate") < ts("1997-01-01")).select("o_custkey")
    val b = o.filter(col("o_orderdate") >= ts("1997-01-01") && col("o_orderdate") < ts("1998-01-01")).select("o_custkey")
    a.intersect(b).orderBy("o_custkey")
  }
  private val q12Sql =
    """SELECT o_custkey FROM orders WHERE o_orderdate >= TIMESTAMP '1996-01-01' AND o_orderdate < TIMESTAMP '1997-01-01'
      |INTERSECT
      |SELECT o_custkey FROM orders WHERE o_orderdate >= TIMESTAMP '1997-01-01' AND o_orderdate < TIMESTAMP '1998-01-01'
      |ORDER BY o_custkey""".stripMargin

  /** EXCEPT — customers that never placed an URGENT-priority order;
    * equivalently a left-anti join (DuckDB side uses EXCEPT, Spark side
    * `except`). Round 3's subtrahend was "any order", which this
    * fixture's orders fully cover — both engines returned ZERO rows and
    * the oracle was vacuously green (the EXCEPT path never touched data
    * at the correctness SF). The priority predicate leaves real
    * survivors at every SF; check_oracle.py now also fails any query
    * whose dump is 0 rows, so a vacuous green cannot recur. */
  private val q13: Fn = (s, d) =>
    Tables.customer(s, d).select("c_custkey")
      .except(Tables.orders(s, d)
        .filter(col("o_orderpriority") === "1-URGENT")
        .select(col("o_custkey").as("c_custkey")))
      .orderBy("c_custkey")
  private val q13Sql =
    """SELECT c_custkey FROM customer
      |EXCEPT
      |SELECT o_custkey AS c_custkey FROM orders WHERE o_orderpriority = '1-URGENT'
      |ORDER BY c_custkey""".stripMargin

  /** UNION ALL of two branches then re-aggregate. */
  private val q14: Fn = (s, d) => {
    val o = Tables.orders(s, d)
    val hi = o.filter(col("o_totalprice") > 150000).select(lit("high").as("bucket"), col("o_orderkey"))
    val ur = o.filter(col("o_orderpriority") === "1-URGENT").select(lit("urgent").as("bucket"), col("o_orderkey"))
    hi.unionByName(ur).groupBy("bucket").agg(count(lit(1)).as("n")).orderBy("bucket")
  }
  private val q14Sql =
    """SELECT bucket, count(*) AS n FROM (
      |  SELECT 'high' AS bucket, o_orderkey FROM orders WHERE o_totalprice > 150000
      |  UNION ALL
      |  SELECT 'urgent' AS bucket, o_orderkey FROM orders WHERE o_orderpriority = '1-URGENT') t
      |GROUP BY bucket ORDER BY bucket""".stripMargin

  /** ROLLUP with grouping_id; subtotal NULLs coalesced so ordering is
    * NULL-free (Spark and DuckDB default NULL order differ). */
  private val q15: Fn = (s, d) =>
    Tables.orders(s, d)
      .rollup(col("o_orderstatus"), col("o_orderpriority"))
      .agg(count(lit(1)).as("n"), grouping_id().cast(LongType).as("gid"))
      .select(
        coalesce(col("o_orderstatus"), lit("(all)")).as("status"),
        coalesce(col("o_orderpriority"), lit("(all)")).as("priority"),
        col("n"), col("gid"))
      .orderBy("gid", "status", "priority")
  private val q15Sql =
    """SELECT coalesce(o_orderstatus, '(all)') AS status,
      |       coalesce(o_orderpriority, '(all)') AS priority,
      |       count(*) AS n,
      |       CAST(GROUPING(o_orderstatus, o_orderpriority) AS BIGINT) AS gid
      |FROM orders GROUP BY ROLLUP(o_orderstatus, o_orderpriority)
      |ORDER BY gid, status, priority""".stripMargin

  /** CUBE over a string and an int dimension with an exact average. */
  private val q16: Fn = (s, d) =>
    Tables.customer(s, d)
      .cube(col("c_mktsegment"), col("c_nationkey"))
      .agg(
        count(lit(1)).as("n"),
        (sum(col("c_acctbal").cast(DecimalType(24, 2))).cast(DoubleType) / count(lit(1))).as("avg_acctbal"),
        grouping_id().cast(LongType).as("gid"))
      .select(
        coalesce(col("c_mktsegment"), lit("(all)")).as("segment"),
        coalesce(col("c_nationkey"), lit(-1)).as("nationkey"),
        col("n"), col("avg_acctbal"), col("gid"))
      .orderBy("gid", "segment", "nationkey")
  private val q16Sql =
    """SELECT coalesce(c_mktsegment, '(all)') AS segment,
      |       coalesce(c_nationkey, -1) AS nationkey,
      |       count(*) AS n,
      |       CAST(sum(CAST(c_acctbal AS DECIMAL(24,2))) AS DOUBLE) / count(*) AS avg_acctbal,
      |       CAST(GROUPING(c_mktsegment, c_nationkey) AS BIGINT) AS gid
      |FROM customer GROUP BY CUBE(c_mktsegment, c_nationkey)
      |ORDER BY gid, segment, nationkey""".stripMargin

  /** GROUPING SETS via Spark SQL over a temp view. */
  private val q17: Fn = (s, d) => {
    Tables.orders(s, d).createOrReplaceTempView("orders_v")
    s.sql(
      """SELECT coalesce(o_orderstatus, '(all)') AS status,
        |       coalesce(o_orderpriority, '(all)') AS priority,
        |       count(1) AS n
        |FROM orders_v GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority), ())
        |ORDER BY status, priority""".stripMargin)
  }
  private val q17Sql =
    """SELECT coalesce(o_orderstatus, '(all)') AS status,
      |       coalesce(o_orderpriority, '(all)') AS priority,
      |       count(*) AS n
      |FROM orders GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority), ())
      |ORDER BY status, priority""".stripMargin

  /** String scalar functions (all codegen'd built-ins, no UDFs). */
  private val q18: Fn = (s, d) =>
    Tables.part(s, d)
      .select(
        col("p_partkey"),
        upper(col("p_name")).as("name_upper"),
        lower(col("p_brand")).as("brand_lower"),
        substring(col("p_name"), 1, 5).as("name_pfx"),
        length(col("p_name")).as("name_len"),
        concat_ws("-", col("p_brand"), col("p_type")).as("brand_type"),
        lpad(col("p_size").cast(StringType), 5, "0").as("size_pad"),
        regexp_replace(col("p_name"), "[aeiou]", "*").as("name_starred"),
        reverse(col("p_name")).as("name_rev"),
        trim(col("p_type")).as("type_trim"))
      .orderBy("p_partkey")
  private val q18Sql =
    """SELECT p_partkey,
      |  upper(p_name) AS name_upper,
      |  lower(p_brand) AS brand_lower,
      |  substring(p_name, 1, 5) AS name_pfx,
      |  CAST(length(p_name) AS INTEGER) AS name_len,
      |  concat_ws('-', p_brand, p_type) AS brand_type,
      |  lpad(CAST(p_size AS VARCHAR), 5, '0') AS size_pad,
      |  regexp_replace(p_name, '[aeiou]', '*', 'g') AS name_starred,
      |  reverse(p_name) AS name_rev,
      |  trim(p_type) AS type_trim
      |FROM part ORDER BY p_partkey""".stripMargin

  /** Date/time scalar functions; dow normalized to ISO (Mon=1) since the
    * engines' native day-of-week numbering differs. */
  private val q19: Fn = (s, d) =>
    Tables.orders(s, d)
      .select(
        col("o_orderkey"),
        year(col("o_orderdate")).as("y"),
        month(col("o_orderdate")).as("m"),
        dayofmonth(col("o_orderdate")).as("dom"),
        quarter(col("o_orderdate")).as("q"),
        (weekday(col("o_orderdate")) + 1).as("dow_iso"),
        date_trunc("month", col("o_orderdate")).as("month_start"),
        datediff(lit("2002-01-01").cast(DateType), col("o_orderdate").cast(DateType)).as("days_to_2002"))
      .orderBy("o_orderkey")
  private val q19Sql =
    """SELECT o_orderkey,
      |  CAST(year(o_orderdate) AS INTEGER) AS y,
      |  CAST(month(o_orderdate) AS INTEGER) AS m,
      |  CAST(day(o_orderdate) AS INTEGER) AS dom,
      |  CAST(quarter(o_orderdate) AS INTEGER) AS q,
      |  CAST(isodow(o_orderdate) AS INTEGER) AS dow_iso,
      |  CAST(date_trunc('month', o_orderdate) AS TIMESTAMP) AS month_start,
      |  CAST(date_diff('day', CAST(o_orderdate AS DATE), DATE '2002-01-01') AS INTEGER) AS days_to_2002
      |FROM orders ORDER BY o_orderkey""".stripMargin

  /** JSON extraction from the `events.props` JSON-string column, both via
    * path extraction and via from_json to a typed map. */
  private val q20: Fn = (s, d) =>
    Tables.events(s, d)
      .select(
        col("event_id"),
        get_json_object(col("props"), "$.k").as("k_str"),
        get_json_object(col("props"), "$.k").cast(IntegerType).as("k_int"),
        element_at(from_json(col("props"), MapType(StringType, IntegerType)), "k").as("k_map"))
      .filter(col("k_int") > 50)
      .orderBy("event_id")
  private val q20Sql =
    """SELECT event_id,
      |  json_extract_string(props, '$.k') AS k_str,
      |  CAST(json_extract_string(props, '$.k') AS INTEGER) AS k_int,
      |  CAST(json_extract_string(props, '$.k') AS INTEGER) AS k_map
      |FROM events
      |WHERE CAST(json_extract_string(props, '$.k') AS INTEGER) > 50
      |ORDER BY event_id""".stripMargin

  /** Tumbling time window (batch form of the streaming aggregation —
    * `window()` is epoch-aligned exactly like DuckDB's time_bucket). */
  private val q21: Fn = (s, d) =>
    Tables.events(s, d)
      .groupBy(window(col("ts"), "10 minutes"), col("event_type"))
      .agg(count(lit(1)).as("n"), dsum(col("value"), 2).as("sum_value"))
      .select(col("window.start").as("w_start"), col("event_type"), col("n"), col("sum_value"))
      .orderBy("w_start", "event_type")
  private val q21Sql =
    """SELECT time_bucket(INTERVAL '10 minutes', ts) AS w_start, event_type,
      |  count(*) AS n,
      |  CAST(sum(CAST(value AS DECIMAL(24,2))) AS DECIMAL(38,2)) AS sum_value
      |FROM events GROUP BY 1, 2 ORDER BY w_start, event_type""".stripMargin

  /** Sliding window (10 min length, 5 min slide): each event lands in two
    * windows; DuckDB mirror materializes both window-starts via unnest. */
  private val q22: Fn = (s, d) =>
    Tables.events(s, d)
      .groupBy(window(col("ts"), "10 minutes", "5 minutes"))
      .agg(count(lit(1)).as("n"), dsum(col("value"), 2).as("sum_value"))
      .select(col("window.start").as("w_start"), col("n"), col("sum_value"))
      .orderBy("w_start")
  private val q22Sql =
    """SELECT w_start, count(*) AS n,
      |  CAST(sum(CAST(value AS DECIMAL(24,2))) AS DECIMAL(38,2)) AS sum_value
      |FROM (SELECT unnest([time_bucket(INTERVAL '5 minutes', ts),
      |                     time_bucket(INTERVAL '5 minutes', ts) - INTERVAL '5 minutes']) AS w_start,
      |             value
      |      FROM events) t
      |GROUP BY w_start ORDER BY w_start""".stripMargin

  /** Sessionization (gaps-and-islands, 30-minute inactivity gap): lag +
    * running sum of gap markers, then per-session aggregates. One shuffle
    * on user_id; identical SQL shape on the DuckDB side. */
  private val q23: Fn = (s, d) => {
    val wU = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
    val secs = unix_timestamp(col("ts"))
    val gap = (secs - lag(secs, 1).over(wU)).as("gap_s")
    val marked = Tables.events(s, d)
      .select(col("user_id"), col("event_id"), col("ts"), gap)
      .withColumn("new_session", when(col("gap_s").isNull || col("gap_s") > 1800, 1L).otherwise(0L))
      .withColumn("session_id", sum(col("new_session")).over(wU.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
    marked.groupBy(col("user_id"), col("session_id"))
      .agg(
        count(lit(1)).as("n_events"),
        min(col("ts")).as("session_start"),
        (max(unix_timestamp(col("ts"))) - min(unix_timestamp(col("ts")))).as("duration_s"))
      .orderBy("user_id", "session_id")
  }
  private val q23Sql =
    """WITH marked AS (
      |  SELECT user_id, event_id, ts,
      |    CASE WHEN lag(ts) OVER w IS NULL
      |              OR (epoch(date_trunc('second', ts)) - epoch(date_trunc('second', lag(ts) OVER w))) > 1800
      |         THEN 1 ELSE 0 END AS new_session
      |  FROM events
      |  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
      |), sessions AS (
      |  SELECT user_id, ts,
      |    sum(new_session) OVER (PARTITION BY user_id ORDER BY ts, event_id
      |                           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS session_id
      |  FROM marked)
      |SELECT user_id, CAST(session_id AS BIGINT) AS session_id, count(*) AS n_events,
      |       min(ts) AS session_start,
      |       CAST(max(epoch(date_trunc('second', ts))) - min(epoch(date_trunc('second', ts))) AS BIGINT) AS duration_s
      |FROM sessions GROUP BY user_id, session_id ORDER BY user_id, session_id""".stripMargin

  // ------------------------------------------------------------- registry

  val all: Seq[Q] = Seq(
    Q("q01_pricing_summary", q01, Some(q01Sql)),
    Q("q02_filter_project", q02, Some(q02Sql)),
    Q("q03_shipping_priority", q03, Some(q03Sql)),
    Q("q04_exists_semi_join", q04, Some(q04Sql)),
    Q("q05_region_revenue", q05, Some(q05Sql)),
    Q("q06_scalar_agg", q06, Some(q06Sql)),
    Q("q07_outer_join_dist", q07, Some(q07Sql)),
    Q("q08_global_topk", q08, Some(q08Sql)),
    Q("q09_window_topn_per_group", q09, Some(q09Sql)),
    Q("q10_window_running", q10, Some(q10Sql)),
    Q("q11_distinct_agg", q11, Some(q11Sql)),
    Q("q12_intersect", q12, Some(q12Sql)),
    Q("q13_except_anti", q13, Some(q13Sql)),
    Q("q14_union_all", q14, Some(q14Sql)),
    Q("q15_rollup", q15, Some(q15Sql)),
    Q("q16_cube", q16, Some(q16Sql)),
    Q("q17_grouping_sets", q17, Some(q17Sql)),
    Q("q18_string_fns", q18, Some(q18Sql)),
    Q("q19_date_fns", q19, Some(q19Sql)),
    Q("q20_json_extract", q20, Some(q20Sql)),
    Q("q21_tumbling_window", q21, Some(q21Sql)),
    Q("q22_sliding_window", q22, Some(q22Sql)),
    Q("q23_sessionization", q23, Some(q23Sql)))
}
