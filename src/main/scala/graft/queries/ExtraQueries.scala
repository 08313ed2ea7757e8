package graft.queries

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType
import graft.Tables
import graft.queries.Relational.{Fn, Q}

/** Aggregation odds and ends: min_by/max_by, ordered string_agg
  * (listagg), and scalar/correlated subqueries via Spark SQL. */
object ExtraQueries {

  /** max_by / min_by with a tie-proof composite ordering key (price
    * scaled, orderkey as tiebreak — exact in doubles below 2^53).
    * BOUND: collision-free only while l_orderkey < 1e6 (two prices
    * 0.01 apart differ by 1e6 in the key; fixture max orderkey is
    * 149,999). Past that bound use r56's zero-padded string encoding,
    * which cannot collide at any scale. */
  private val r29: Fn = (s, d) =>
    Tables.lineitem(s, d)
      .groupBy(col("l_returnflag"))
      .agg(
        max_by(col("l_orderkey"), col("l_extendedprice") * 1e8 + col("l_orderkey")).as("max_price_order"),
        min_by(col("l_orderkey"), col("l_extendedprice") * 1e8 + col("l_orderkey")).as("min_price_order"),
        max(col("l_extendedprice")).as("max_price"))
      .orderBy("l_returnflag")
  private val r29Sql =
    """SELECT l_returnflag,
      |  arg_max(l_orderkey, l_extendedprice * 1e8 + l_orderkey) AS max_price_order,
      |  arg_min(l_orderkey, l_extendedprice * 1e8 + l_orderkey) AS min_price_order,
      |  max(l_extendedprice) AS max_price
      |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin

  /** Ordered listagg: distinct priorities per status, sorted then joined
    * (deterministic regardless of aggregation order). */
  private val r30: Fn = (s, d) =>
    Tables.orders(s, d)
      .groupBy(col("o_orderstatus"))
      .agg(array_join(array_sort(collect_set(col("o_orderpriority"))), ",").as("priorities"),
        countDistinct(col("o_orderpriority")).as("n_priorities"))
      .orderBy("o_orderstatus")
  private val r30Sql =
    """SELECT o_orderstatus,
      |  string_agg(DISTINCT o_orderpriority, ',' ORDER BY o_orderpriority) AS priorities,
      |  count(DISTINCT o_orderpriority) AS n_priorities
      |FROM orders GROUP BY o_orderstatus ORDER BY o_orderstatus""".stripMargin

  /** Scalar + correlated subqueries through the SQL front-end: customers
    * above the global average balance who have an open order. */
  private val r31: Fn = (s, d) => {
    Tables.customer(s, d).createOrReplaceTempView("customer_v")
    Tables.orders(s, d).createOrReplaceTempView("orders_v")
    s.sql(
      """SELECT c_custkey, c_acctbal
        |FROM customer_v
        |WHERE c_acctbal > (SELECT CAST(sum(CAST(c_acctbal AS DECIMAL(18,2))) AS DOUBLE) / count(*) FROM customer_v)
        |  AND EXISTS (SELECT 1 FROM orders_v WHERE o_custkey = c_custkey AND o_orderstatus = 'O')
        |ORDER BY c_custkey""".stripMargin)
  }
  private val r31Sql =
    """SELECT c_custkey, c_acctbal
      |FROM customer
      |WHERE c_acctbal > (SELECT CAST(sum(CAST(c_acctbal AS DECIMAL(18,2))) AS DOUBLE) / count(*) FROM customer)
      |  AND EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey AND o_orderstatus = 'O')
      |ORDER BY c_custkey""".stripMargin

  /** Time-range window frame (RANGE BETWEEN seconds): rolling 1-hour
    * per-user event count/sum — the rate-limit / rolling-feature
    * pattern. Peer-inclusive RANGE frames are tie-order-independent, so
    * the result is deterministic without a unique sort key. */
  private val r32: Fn = (s, d) => {
    import org.apache.spark.sql.expressions.Window
    val e = Tables.events(s, d)
    val sec = unix_timestamp(col("ts"))
    val w = Window.partitionBy(col("user_id")).orderBy(sec).rangeBetween(-3599, 0)
    e.select(
        col("event_id"), col("user_id"),
        count(lit(1)).over(w).as("n_last_hour"),
        round(sum(col("value").cast(org.apache.spark.sql.types.DecimalType(18, 2))).over(w)
          .cast(org.apache.spark.sql.types.DoubleType), 2).as("v_last_hour"))
      .orderBy("event_id")
  }
  private val r32Sql =
    """SELECT event_id, user_id,
      |  count(*) OVER w AS n_last_hour,
      |  round(CAST(sum(CAST(value AS DECIMAL(18,2))) OVER w AS DOUBLE), 2) AS v_last_hour
      |FROM events
      |WINDOW w AS (PARTITION BY user_id ORDER BY epoch(date_trunc('second', ts))
      |             RANGE BETWEEN 3599 PRECEDING AND CURRENT ROW)
      |ORDER BY event_id""".stripMargin

  /** The ranking-function family over one deterministic window. */
  private val r33: Fn = (s, d) => {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col("o_orderstatus")).orderBy(desc("o_totalprice"), col("o_orderkey"))
    Tables.orders(s, d)
      .select(
        col("o_orderkey"), col("o_orderstatus"),
        rank().over(w).cast("long").as("rk"),
        dense_rank().over(w).cast("long").as("drk"),
        ntile(4).over(w).cast("int").as("quartile"),
        percent_rank().over(w).as("pr"),
        cume_dist().over(w).as("cd"),
        first_value(col("o_orderkey")).over(w).as("top_order"),
        lead(col("o_orderkey"), 1).over(w).as("next_order"))
      .orderBy("o_orderkey")
  }
  private val r33Sql =
    """SELECT o_orderkey, o_orderstatus,
      |  CAST(rank() OVER w AS BIGINT) AS rk,
      |  CAST(dense_rank() OVER w AS BIGINT) AS drk,
      |  CAST(ntile(4) OVER w AS INTEGER) AS quartile,
      |  percent_rank() OVER w AS pr,
      |  cume_dist() OVER w AS cd,
      |  first_value(o_orderkey) OVER w AS top_order,
      |  lead(o_orderkey, 1) OVER w AS next_order
      |FROM orders
      |WINDOW w AS (PARTITION BY o_orderstatus ORDER BY o_totalprice DESC, o_orderkey)
      |ORDER BY o_orderkey""".stripMargin

  /** Array scalar functions over per-order collected lists. Quantities
    * are integer-valued doubles, so int casts keep string renderings
    * engine-identical. */
  private val r34: Fn = (s, d) => {
    val li = Tables.lineitem(s, d)
    val qties = li.groupBy(col("l_orderkey"))
      .agg(sort_array(collect_list(col("l_quantity").cast("int"))).as("q"))
    qties.select(
        col("l_orderkey"),
        size(col("q")).cast("int").as("n"),
        element_at(col("q"), 1).as("q_min"),
        element_at(col("q"), -1).as("q_max"),
        array_contains(col("q"), 25).as("has_25"),
        array_join(transform(slice(col("q"), 1, 3), _.cast("string")), ",").as("first3"),
        aggregate(col("q"), lit(0L), (acc, x) => acc + x).as("q_sum"))
      .filter(col("l_orderkey") < 500)
      .orderBy("l_orderkey")
  }
  private val r34Sql =
    """WITH qties AS (
      |  SELECT l_orderkey, list_sort(list(CAST(l_quantity AS INTEGER))) AS q
      |  FROM lineitem GROUP BY l_orderkey)
      |SELECT l_orderkey,
      |  CAST(len(q) AS INTEGER) AS n,
      |  q[1] AS q_min,
      |  q[-1] AS q_max,
      |  list_contains(q, 25) AS has_25,
      |  array_to_string(q[1:3], ',') AS first3,
      |  list_reduce(list_prepend(CAST(0 AS BIGINT), list_transform(q, x -> CAST(x AS BIGINT))),
      |              (acc, x) -> acc + x) AS q_sum
      |FROM qties WHERE l_orderkey < 500 ORDER BY l_orderkey""".stripMargin

  /** NULL semantics: nullif-generated nulls, null-safe equality, and
    * null-aware aggregation/coalesce (the fixture tables are null-free,
    * so nulls are synthesized deterministically). */
  private val r35: Fn = (s, d) =>
    Tables.orders(s, d)
      .select(
        col("o_orderkey"),
        nullif(col("o_orderstatus"), lit("P")).as("status_np"),
        coalesce(nullif(col("o_orderstatus"), lit("P")), lit("(was-P)")).as("status_filled"),
        (nullif(col("o_orderstatus"), lit("P")) <=> lit("O")).as("nse_o"),
        nullif(col("o_orderstatus"), lit("P")).isNull.as("is_p"))
      .orderBy("o_orderkey")
  private val r35Sql =
    """SELECT o_orderkey,
      |  nullif(o_orderstatus, 'P') AS status_np,
      |  coalesce(nullif(o_orderstatus, 'P'), '(was-P)') AS status_filled,
      |  nullif(o_orderstatus, 'P') IS NOT DISTINCT FROM 'O' AS nse_o,
      |  nullif(o_orderstatus, 'P') IS NULL AS is_p
      |FROM orders ORDER BY o_orderkey""".stripMargin

  /** r40: unpivot/melt — the wide→long reshape (`Dataset.unpivot`,
    * Spark's native melt; zero shuffle, row-local). Charges per line
    * item go long as (measure, value); values are cast to DECIMAL(12,2)
    * BEFORE unpivot so both engines agree exactly (parity rule 8). */
  private val r40: Fn = (s, d) =>
    graft.Tables.lineitem(s, d)
      .filter(col("l_orderkey") < 100)
      .select(col("l_orderkey"), col("l_linenumber"),
        col("l_extendedprice").cast(DecimalType(12, 2)).as("extendedprice"),
        col("l_discount").cast(DecimalType(12, 2)).as("discount"),
        col("l_tax").cast(DecimalType(12, 2)).as("tax"))
      .unpivot(
        Array(col("l_orderkey"), col("l_linenumber")),
        Array(col("extendedprice"), col("discount"), col("tax")),
        "measure", "amount")
      // the synthetic fixture does NOT keep (orderkey, linenumber)
      // unique, so amount is needed for a total order (parity rule 4)
      .orderBy("l_orderkey", "l_linenumber", "measure", "amount")
  private val r40Sql =
    """SELECT l_orderkey, l_linenumber, measure, amount FROM (
      |  SELECT l_orderkey, l_linenumber,
      |         CAST(l_extendedprice AS DECIMAL(12,2)) AS extendedprice,
      |         CAST(l_discount AS DECIMAL(12,2)) AS discount,
      |         CAST(l_tax AS DECIMAL(12,2)) AS tax
      |  FROM lineitem WHERE l_orderkey < 100) t
      |UNPIVOT (amount FOR measure IN (extendedprice, discount, tax))
      |ORDER BY l_orderkey, l_linenumber, measure, amount""".stripMargin

  val all: Seq[Q] = Seq(
    Q("r40_unpivot", r40, Some(r40Sql)),
    Q("r29_minmax_by", r29, Some(r29Sql)),
    Q("r30_string_agg", r30, Some(r30Sql)),
    Q("r31_subqueries", r31, Some(r31Sql)),
    Q("r32_rolling_range_frame", r32, Some(r32Sql)),
    Q("r33_rank_functions", r33, Some(r33Sql)),
    Q("r34_array_fns", r34, Some(r34Sql)),
    Q("r35_null_semantics", r35, Some(r35Sql)))
}
