package graft.queries

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DecimalType, DoubleType, LongType}
import graft.Tables
import graft.queries.Relational.{Fn, Q}

/** Round-7 batch 6: allocation, randomness-testing, lexical-diversity
  * and key-discovery operators — largest-remainder apportionment of a
  * fixed sampling budget, the Wald–Wolfowitz runs test on a revenue
  * series, Simpson diversity / type-token ratio per language, and a
  * candidate-key uniqueness audit.
  *
  * Same determinism discipline as ExtraQueries3/4/5: every corpus-sized
  * relation is reduced by a keyed partial aggregation before any window
  * touches it, integer/decimal algebra end-to-end with ONE final rounded
  * double per statistic, unique-key tiebreaks wherever order matters.
  */
object ExtraQueries6 {

  private def orders(s: SparkSession, d: String) = Tables.orders(s, d)
  private def documents(s: SparkSession, d: String) = Tables.documents(s, d)

  /** Order-independent exact decimal sum (Relational.dsum twin). */
  private def dsum(c: Column, scale: Int): Column =
    sum(c.cast(DecimalType(24, scale))).cast(DecimalType(38, scale))

  // -------------------------------------------- r88 apportionment

  /** r88: largest-remainder (Hare-quota) apportionment — allocate a
    * fixed budget of 1000 sampling slots across nations proportionally
    * to their exact order counts: floor seats from the quota, then the
    * leftover seats go to the largest remainders (nation key breaks
    * remainder ties). The canonical exact way to turn fractional
    * per-group shares into an integer budget that sums EXACTLY to the
    * total — what p04/p19's rate-based mixtures cannot guarantee.
    *
    * Scale shape: the corpus-sized work is one orders⋈customer join
    * (AQE-planned; customer is the mid-size dim left unhinted per the
    * Relational module rules) + a broadcast nation join + one keyed
    * count. Everything after operates on the #nations-row aggregate:
    * the remainder-rank window is global but AggBounded (PlanLintSpec
    * allowlist) — its input can never exceed the nation domain. All
    * arithmetic integer: `1000·c div T` and `1000·c mod T` are pure
    * BIGINT in both engines, so seats are engine-exact and
    * Σseats = 1000 by construction. */
  private val r88: Fn = (s, d) => {
    val cust = Tables.customer(s, d).select(col("c_custkey"), col("c_nationkey"))
    val nat = Tables.nation(s, d).select(col("n_nationkey"), col("n_name"))
    val cnt = orders(s, d).select(col("o_custkey"))
      .join(cust, col("o_custkey") === col("c_custkey"))
      .join(broadcast(nat), col("c_nationkey") === col("n_nationkey"))
      .groupBy(col("n_nationkey").as("nation"), col("n_name").as("name"))
      .agg(count(lit(1)).as("c"))
    // the budget total, floor seats and leftover all ride full-frame
    // windows over the SAME #nations-row aggregate — one computation of
    // the corpus join, no cache, no second scan (the windows are global
    // but AggBounded: their input can never exceed the nation domain)
    val wAll = Window.partitionBy()
    val wRem = Window.orderBy(desc("rem"), col("nation"))
    cnt.withColumn("t", sum(col("c")).over(wAll))
      .select(col("nation"), col("name"), col("c"),
        expr("1000 * c div t").as("floor_seats"),
        expr("1000 * c % t").as("rem"))
      .withColumn("k", lit(1000L) - sum(col("floor_seats")).over(wAll))
      .withColumn("rk", rank().over(wRem))
      .select(col("nation"), col("name"), col("c"), col("floor_seats"),
        (col("floor_seats") + when(col("rk") <= col("k"), 1L).otherwise(0L)).as("seats"))
      .orderBy("nation")
  }
  private val r88Sql =
    """WITH cnt AS (
      |  SELECT cu.c_nationkey AS nation, n.n_name AS name, CAST(count(*) AS BIGINT) AS c
      |  FROM orders o JOIN customer cu ON o.o_custkey = cu.c_custkey
      |  JOIN nation n ON cu.c_nationkey = n.n_nationkey
      |  GROUP BY 1, 2),
      |base AS (
      |  SELECT nation, name, c,
      |         CAST(1000 * c // sum(c) OVER () AS BIGINT) AS floor_seats,
      |         CAST(1000 * c % sum(c) OVER () AS BIGINT) AS rem
      |  FROM cnt),
      |wk AS (
      |  SELECT nation, name, c, floor_seats,
      |         CAST(1000 - sum(floor_seats) OVER () AS BIGINT) AS k,
      |         rank() OVER (ORDER BY rem DESC, nation) AS rk
      |  FROM base)
      |SELECT nation, name, c, floor_seats,
      |       floor_seats + CASE WHEN rk <= k THEN 1 ELSE 0 END AS seats
      |FROM wk ORDER BY nation""".stripMargin

  // -------------------------------------------- r89 runs test

  /** r89: Wald–Wolfowitz runs test for randomness of the daily-revenue
    * direction series, per order priority — the nonparametric monitor
    * that flags a series as trending (too few runs) or oscillating (too
    * many) without assuming any distribution. Ties (equal consecutive
    * revenue) are dropped per the classical treatment.
    *
    * Exactness: daily revenue is an exact DECIMAL sum, so up/down signs
    * and run boundaries are engine-exact; R, n1, n2, n are pure BIGINT.
    * z = (R − μ)/σ with μ = 2n1n2/n + 1 and
    * σ² = 2n1n2(2n1n2−n)/(n²(n−1)) is algebraically rearranged so the
    * numerator (R·n − n − 2n1n2) and every factor under the sqrt are
    * exact integers — ONE double division + sqrt + round(6) at the end
    * (sqrt is IEEE correctly-rounded, so both engines agree bitwise).
    *
    * Scale shape: the corpus-sized work is the (priority, day) partial
    * aggregation; all windows ride the tiny daily series partitioned by
    * priority (r81's CUSUM discipline). */
  private val r89: Fn = (s, d) => {
    val wOrd = Window.partitionBy("grp").orderBy("day")
    val daily = orders(s, d)
      .groupBy(col("o_orderpriority").as("grp"), col("o_orderdate").as("day"))
      .agg(dsum(col("o_totalprice"), 2).as("rev"))
    val sgn = daily.withColumn("prev", lag(col("rev"), 1).over(wOrd))
      .filter(col("prev").isNotNull && col("rev") =!= col("prev"))
      .select(col("grp"), col("day"),
        when(col("rev") > col("prev"), 1).otherwise(-1).as("s"))
    val runs = sgn.withColumn("ps", lag(col("s"), 1).over(wOrd))
      .withColumn("new_run",
        when(col("ps").isNull || col("s") =!= col("ps"), 1).otherwise(0))
    val st = runs.groupBy("grp").agg(
      sum(col("new_run")).cast(LongType).as("r"),
      sum(when(col("s") === 1, 1).otherwise(0)).cast(LongType).as("n1"),
      sum(when(col("s") === -1, 1).otherwise(0)).cast(LongType).as("n2"),
      count(lit(1)).as("n"))
    st.select(col("grp"), col("r"), col("n1"), col("n2"), col("n"),
      round(
        (col("r") * col("n") - col("n") - lit(2) * col("n1") * col("n2")).cast(DoubleType) /
          sqrt((lit(2) * col("n1") * col("n2")).cast(DoubleType) *
            (lit(2) * col("n1") * col("n2") - col("n")).cast(DoubleType) /
            (col("n") - 1).cast(DoubleType)), 6).as("z"))
      .orderBy("grp")
  }
  private val r89Sql =
    """WITH daily AS (
      |  SELECT o_orderpriority AS grp, o_orderdate AS day,
      |         CAST(sum(CAST(o_totalprice AS DECIMAL(24,2))) AS DECIMAL(38,2)) AS rev
      |  FROM orders GROUP BY 1, 2),
      |mov AS (SELECT grp, day, rev,
      |               lag(rev) OVER (PARTITION BY grp ORDER BY day) AS prev FROM daily),
      |sgn AS (SELECT grp, day, CASE WHEN rev > prev THEN 1 ELSE -1 END AS s
      |        FROM mov WHERE prev IS NOT NULL AND rev <> prev),
      |runs AS (
      |  SELECT grp, s,
      |         CASE WHEN lag(s) OVER (PARTITION BY grp ORDER BY day) IS NULL
      |                OR s <> lag(s) OVER (PARTITION BY grp ORDER BY day) THEN 1 ELSE 0 END AS new_run
      |  FROM sgn),
      |st AS (
      |  SELECT grp, CAST(sum(new_run) AS BIGINT) AS r,
      |         CAST(sum(CASE WHEN s = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n1,
      |         CAST(sum(CASE WHEN s = -1 THEN 1 ELSE 0 END) AS BIGINT) AS n2,
      |         CAST(count(*) AS BIGINT) AS n
      |  FROM runs GROUP BY grp)
      |SELECT grp, r, n1, n2, n,
      |       round(CAST(r*n - n - 2*n1*n2 AS DOUBLE) /
      |             sqrt(CAST(2*n1*n2 AS DOUBLE) * CAST(2*n1*n2 - n AS DOUBLE)
      |                  / CAST(n - 1 AS DOUBLE)), 6) AS z
      |FROM st ORDER BY grp""".stripMargin

  // -------------------------------------------- t28 Simpson diversity

  /** t28: lexical-diversity profile per language — Simpson diversity
    * 1 − Σ nᵢ(nᵢ−1)/(N(N−1)) (the probability two random tokens
    * differ; the exact, sample-size-unbiased companion to t21's
    * entropy) and the type-token ratio V/N. Both are exact rationals
    * over token counts, so unlike the entropy family no fixed-point ln
    * discipline is needed — pure integer algebra until ONE rounded
    * division each.
    *
    * Scale shape: two keyed shuffles — (lang, token) count then the
    * per-lang reduction; identical to t21. The nᵢ(nᵢ−1) products ride
    * DECIMAL(38,0) so a 100 TB head token (nᵢ ~ 10¹⁰) cannot overflow
    * the summation in either engine. */
  private val t28: Fn = (s, d) => {
    val dec = (c: Column) => c.cast(DecimalType(38, 0))
    val cnt = documents(s, d)
      .select(col("lang"), explode(split(col("text"), " ")).as("token"))
      .groupBy("lang", "token").agg(count(lit(1)).as("c"))
    cnt.groupBy("lang").agg(
      sum(col("c")).cast(LongType).as("n"),
      count(lit(1)).as("v"),
      sum(dec(col("c")) * dec(col("c") - 1)).cast(DecimalType(38, 0)).as("rep"))
      .select(col("lang"), col("n"), col("v"),
        round(lit(1.0) - col("rep").cast(DoubleType) /
          (col("n").cast(DoubleType) * (col("n") - 1).cast(DoubleType)), 6).as("simpson"),
        round(col("v").cast(DoubleType) / col("n").cast(DoubleType), 6).as("ttr"))
      .orderBy("lang")
  }
  private val t28Sql =
    """WITH tok AS (SELECT lang, unnest(string_split(text, ' ')) AS token FROM documents),
      |cnt AS (SELECT lang, token, CAST(count(*) AS BIGINT) AS c FROM tok GROUP BY 1, 2),
      |st AS (SELECT lang, CAST(sum(c) AS BIGINT) AS n, CAST(count(*) AS BIGINT) AS v,
      |              CAST(sum(CAST(c AS DECIMAL(38,0)) * (c - 1)) AS DECIMAL(38,0)) AS rep
      |       FROM cnt GROUP BY lang)
      |SELECT lang, n, v,
      |       round(1.0 - CAST(rep AS DOUBLE) / (CAST(n AS DOUBLE) * CAST(n - 1 AS DOUBLE)), 6) AS simpson,
      |       round(CAST(v AS DOUBLE) / CAST(n AS DOUBLE), 6) AS ttr
      |FROM st ORDER BY lang""".stripMargin

  // -------------------------------------------- u18 candidate keys

  /** u18: candidate-key discovery audit — exact distinct-value counts
    * for a declared lattice of column combinations on orders, flagging
    * which are true keys (distinct = rowcount) and the uniqueness ratio
    * of the rest. The profiling primitive behind key inference, upsert
    * key validation (r42) and fan-out debugging (u17).
    *
    * Scale shape: ONE scan — all five distincts and the row count are
    * computed in a single Aggregate (Spark plans multi-distinct via its
    * Expand operator: 5× row multiplication map-side, each branch then
    * partially aggregated before the shuffle). At 100 TB you would
    * first screen with approx_count_distinct (r28) and reserve this
    * exact pass for the survivors; the audit itself stays one job
    * either way. Composite tuples contain no NULLs in any column here
    * (u05 asserts referential/null integrity) — NULL-tuple semantics
    * differ between engines' composite count-distinct and are
    * deliberately not relied on. */
  private val u18: Fn = (s, d) => {
    val a = orders(s, d).agg(
      countDistinct(col("o_orderkey")).as("k1"),
      countDistinct(col("o_custkey")).as("k2"),
      countDistinct(col("o_orderdate")).as("k3"),
      countDistinct(col("o_custkey"), col("o_orderdate")).as("k4"),
      countDistinct(col("o_custkey"), col("o_orderdate"), col("o_totalprice")).as("k5"),
      count(lit(1)).as("n"))
    a.select(expr(
      "stack(5, 'o_orderkey', k1, 'o_custkey', k2, 'o_orderdate', k3, " +
        "'o_custkey+o_orderdate', k4, 'o_custkey+o_orderdate+o_totalprice', k5)")
      .as(Seq("cand", "dv")), col("n"))
      .select(col("cand"), col("dv"), col("n"),
        (col("dv") === col("n")).as("is_key"),
        round(col("dv").cast(DoubleType) / col("n").cast(DoubleType), 6).as("uniq_ratio"))
      .orderBy("cand")
  }
  private val u18Sql =
    """WITH t AS (SELECT CAST(count(*) AS BIGINT) AS n FROM orders)
      |SELECT cand, dv, n, dv = n AS is_key,
      |       round(CAST(dv AS DOUBLE) / CAST(n AS DOUBLE), 6) AS uniq_ratio
      |FROM (
      |  SELECT 'o_orderkey' AS cand, CAST(count(DISTINCT o_orderkey) AS BIGINT) AS dv FROM orders
      |  UNION ALL SELECT 'o_custkey', count(DISTINCT o_custkey) FROM orders
      |  UNION ALL SELECT 'o_orderdate', count(DISTINCT o_orderdate) FROM orders
      |  UNION ALL SELECT 'o_custkey+o_orderdate', count(DISTINCT (o_custkey, o_orderdate)) FROM orders
      |  UNION ALL SELECT 'o_custkey+o_orderdate+o_totalprice',
      |                   count(DISTINCT (o_custkey, o_orderdate, o_totalprice)) FROM orders
      |) u, t ORDER BY cand""".stripMargin

  val all: Seq[Q] = Seq(
    Q("r88_apportionment", r88, Some(r88Sql)),
    Q("r89_runs_test", r89, Some(r89Sql)),
    Q("t28_simpson_diversity", t28, Some(t28Sql)),
    Q("u18_candidate_keys", u18, Some(u18Sql)))
}
