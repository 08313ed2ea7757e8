package graft.queries

import org.apache.spark.sql.functions._
import graft.Tables
import graft.queries.Relational.{Fn, Q}

/** Aggregation odds and ends: min_by/max_by, ordered string_agg
  * (listagg), and scalar/correlated subqueries via Spark SQL. */
object ExtraQueries {

  /** max_by / min_by with a tie-proof composite ordering key (price
    * scaled, orderkey as tiebreak — exact in doubles below 2^53). */
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

  val all: Seq[Q] = Seq(
    Q("r29_minmax_by", r29, Some(r29Sql)),
    Q("r30_string_agg", r30, Some(r30Sql)),
    Q("r31_subqueries", r31, Some(r31Sql)))
}
