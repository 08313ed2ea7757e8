package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DecimalType, DoubleType, LongType}
import graft.Tables
import graft.queries.Relational.{Fn, Q}

/** Round-8 batch 21: multi-touch attribution and Kneser–Ney language
  * modeling. Same determinism discipline as ExtraQueries3–18.
  */
object ExtraQueries19 {

  private def events(s: SparkSession, d: String) = Tables.events(s, d)
  private def docs(s: SparkSession, d: String) = Tables.documents(s, d)

  // --------------------- r118 time-decay multi-touch attribution

  /** Attribution window in days; decay halves per day of age. */
  val AttribWindowDays = 7

  /** r118: time-decay multi-touch attribution — each purchase's revenue
    * is split across the user's clicks/views in the prior
    * [[AttribWindowDays]] days with weight 2^(−age_days), the standard
    * middle ground between r84's winner-take-all last-touch and naive
    * equal-split (which over-credits stale touches). Purchases with no
    * prior touch report as an explicit 'unattributed' row — silently
    * dropping them would misstate total revenue.
    *
    * Exactness: weights ride as exact powers of two
    * 2^([[AttribWindowDays]]−1−age) (the r64 trick — no fractional
    * decay anywhere); per (purchase, touch-type) credit is ONE rounded
    * division to a 1e-6 fixed-point integer (numerator cents·weight·1e6
    * stays < 2^53), then exact BIGINT sums — so the total is
    * deterministic under any aggregation order, unlike summing
    * per-pair rounded doubles.
    * Scale shape: one user-keyed equi-join between the purchase and
    * touch slices of the SAME relation, banded by the window predicate
    * (per-user fan-out = purchases × in-window touches, the inherent
    * pair count); two keyed aggregations after; dimension-sized output. */
  private val r118: Fn = (s, d) => {
    val secs = (c: org.apache.spark.sql.Column) => unix_timestamp(c)
    val base = events(s, d).select(col("event_id"), col("user_id"),
      col("event_type"), col("ts"),
      (col("value").cast(DecimalType(18, 2)) * 100).cast(LongType).as("cents"))
    val purchases = base.filter(col("event_type") === "purchase")
      .select(col("user_id"), col("event_id").as("p_id"),
        col("ts").as("p_ts"), col("cents"))
    val touches = base.filter(col("event_type").isin("click", "view"))
      .select(col("user_id"), col("event_type").as("touch_type"), col("ts").as("t_ts"))
    val pairs = purchases.join(touches, Seq("user_id"))
      .withColumn("age_days",
        ((secs(col("p_ts")) - secs(col("t_ts"))) / 86400).cast(LongType))
      .filter(col("t_ts") <= col("p_ts") && col("age_days") < AttribWindowDays)
      .withColumn("w", expr(s"CAST(shiftleft(1L, CAST(${AttribWindowDays - 1} - age_days AS INT)) AS BIGINT)"))
    val byType = pairs.groupBy(col("p_id"), col("cents"), col("touch_type"))
      .agg(sum(col("w")).cast(LongType).as("w_type"), count(lit(1)).as("n_touches"))
    val byPurchase = pairs.groupBy(col("p_id")).agg(sum(col("w")).cast(LongType).as("w_total"))
    val credited = byType.join(byPurchase, Seq("p_id"))
      .withColumn("credit_fp",
        round(col("cents").cast(DoubleType) * col("w_type").cast(DoubleType) * 1e6 /
          col("w_total").cast(DoubleType)).cast(LongType))
      .groupBy(col("touch_type"))
      .agg(count(lit(1)).as("n_credits"),
        sum(col("n_touches")).cast(LongType).as("n_touches"),
        sum(col("credit_fp")).cast(LongType).as("sum_fp"))
      .withColumn("attributed_cents",
        round(col("sum_fp").cast(DoubleType) / 1e6).cast(LongType))
    val orphan = purchases.join(byPurchase, Seq("p_id"), "left_anti")
      .agg(count(lit(1)).as("n_credits"), lit(0L).as("n_touches"),
        (sum(col("cents")).cast(LongType) * 1000000L).as("sum_fp"),
        sum(col("cents")).cast(LongType).as("attributed_cents"))
      .withColumn("touch_type", lit("unattributed"))
      .select("touch_type", "n_credits", "n_touches", "sum_fp", "attributed_cents")
    credited.select("touch_type", "n_credits", "n_touches", "sum_fp", "attributed_cents")
      .unionByName(orphan)
      .orderBy("touch_type")
  }

  private val r118Sql =
    s"""WITH base AS (
       |  SELECT event_id, user_id, event_type, ts,
       |         CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT) AS cents
       |  FROM events),
       |purchases AS (
       |  SELECT user_id, event_id AS p_id, ts AS p_ts, cents
       |  FROM base WHERE event_type = 'purchase'),
       |touches AS (
       |  SELECT user_id, event_type AS touch_type, ts AS t_ts
       |  FROM base WHERE event_type IN ('click', 'view')),
       |pairs AS (
       |  SELECT p.p_id, p.cents, t.touch_type,
       |         (1::BIGINT << (${AttribWindowDays - 1} -
       |            ((CAST(epoch(date_trunc('second', p.p_ts)) AS BIGINT) - CAST(epoch(date_trunc('second', t.t_ts)) AS BIGINT)) // 86400)))
       |           AS w
       |  FROM purchases p JOIN touches t ON p.user_id = t.user_id
       |  WHERE t.t_ts <= p.p_ts
       |    AND (CAST(epoch(date_trunc('second', p.p_ts)) AS BIGINT) - CAST(epoch(date_trunc('second', t.t_ts)) AS BIGINT)) // 86400
       |        < $AttribWindowDays),
       |by_type AS (
       |  SELECT p_id, cents, touch_type,
       |         CAST(sum(w) AS BIGINT) AS w_type, count(*) AS n_touches
       |  FROM pairs GROUP BY 1, 2, 3),
       |by_purchase AS (
       |  SELECT p_id, CAST(sum(w) AS BIGINT) AS w_total FROM pairs GROUP BY 1),
       |credited AS (
       |  SELECT touch_type, count(*) AS n_credits,
       |         CAST(sum(n_touches) AS BIGINT) AS n_touches,
       |         CAST(sum(CAST(round(CAST(cents AS DOUBLE) * w_type * 1e6 / w_total, 0) AS BIGINT))
       |              AS BIGINT) AS sum_fp
       |  FROM by_type JOIN by_purchase USING (p_id)
       |  GROUP BY 1),
       |orphan AS (
       |  SELECT 'unattributed' AS touch_type, count(*) AS n_credits,
       |         CAST(0 AS BIGINT) AS n_touches,
       |         CAST(sum(cents) * 1000000 AS BIGINT) AS sum_fp,
       |         CAST(sum(cents) AS BIGINT) AS attributed_cents
       |  FROM purchases WHERE p_id NOT IN (SELECT p_id FROM by_purchase))
       |SELECT touch_type, n_credits, n_touches, sum_fp,
       |       CAST(round(CAST(sum_fp AS DOUBLE) / 1e6, 0) AS BIGINT) AS attributed_cents
       |FROM credited
       |UNION ALL
       |SELECT * FROM orphan
       |ORDER BY touch_type""".stripMargin

  // --------------------- t39 Kneser–Ney continuation model

  /** Absolute discount D = 3/4, carried as the exact rational (3, 4). */
  val KnDiscountNum = 3L
  val KnDiscountDen = 4L

  /** Next-word candidates reported per context. */
  val KnTopK = 5

  /** t39: Kneser–Ney smoothed bigram table — for each context word v,
    * the top-[[KnTopK]] next words by the interpolated KN probability
    * P(w|v) = max(c(vw)−D,0)/c(v·) + D·N₁₊(v·)/c(v·) · N₁₊(·w)/T,
    * where the continuation count N₁₊(·w) = "how many DISTINCT contexts
    * precede w" is the model's whole point: it down-ranks words that
    * are frequent only inside one fixed phrase (the "San Francisco"
    * effect) — exactly the templated-boilerplate signal a corpus LM
    * needs that raw bigram frequency (t16) misses. The production
    * smoothing of KenLM/SRILM, here as the relational table it
    * compiles to.
    *
    * Exactness: with D = [[KnDiscountNum]]/[[KnDiscountDen]], every
    * probability over one context v shares the denominator
    * 4·c(v·)·T, so the EXACT integer numerator
    * num = max(4·c(vw)−3, 0)·T + 3·N₁₊(v·)·N₁₊(·w)
    * ranks candidates with NO floating point anywhere in the ordering;
    * p_kn is one rounded division per emitted row, and Σ_w P(w|v) = 1
    * exactly in the integer algebra (the spec's conservation law).
    * Scale shape: bigram counts are one keyed shuffle of the token
    * stream; continuation counts and context totals are two aggregates
    * of the bigram-TYPE relation (vocabulary-sized); the top-k is a
    * context-partitioned rank window over that same relation. */
  private val t39: Fn = (s, d) => {
    val bg = docs(s, d)
      .select(split(col("text"), " ").as("w"))
      .filter(size(col("w")) >= 2)
      .select(col("w"), explode(sequence(lit(1), size(col("w")) - 1)).as("i"))
      .select(element_at(col("w"), col("i")).as("v"),
        element_at(col("w"), col("i") + 1).as("nw"))
      .groupBy("v", "nw").agg(count(lit(1)).as("c_vw"))
    val ctx = bg.groupBy("v").agg(sum(col("c_vw")).cast(LongType).as("c_v"),
      count(lit(1)).cast(LongType).as("n1p_fwd"))
    val cont = bg.groupBy("nw").agg(count(lit(1)).cast(LongType).as("n1p_bwd"))
    val tTypes = bg.agg(count(lit(1)).cast(LongType).as("t_types"))
    val scored = bg.join(ctx, Seq("v")).join(cont, Seq("nw"))
      .crossJoin(broadcast(tTypes))
      .withColumn("num",
        (greatest(lit(KnDiscountDen) * col("c_vw") - lit(KnDiscountNum), lit(0L))
          .cast(DecimalType(38, 0)) * col("t_types") +
          lit(KnDiscountNum) * col("n1p_fwd").cast(DecimalType(38, 0)) * col("n1p_bwd"))
          .cast(DecimalType(38, 0)))
      .withColumn("den",
        (lit(KnDiscountDen) * col("c_v").cast(DecimalType(38, 0)) * col("t_types"))
          .cast(DecimalType(38, 0)))
    val wCtx = Window.partitionBy("v").orderBy(desc("num"), col("nw"))
    scored.withColumn("rk", row_number().over(wCtx).cast(LongType))
      .filter(col("rk") <= KnTopK)
      .select(col("v"), col("rk"), col("nw"), col("c_vw"),
        col("n1p_bwd"), col("num").cast(DecimalType(38, 0)).as("num"),
        round(col("num").cast(DoubleType) / col("den").cast(DoubleType), 6).as("p_kn"))
      .orderBy("v", "rk")
  }

  private val t39Sql =
    s"""WITH w AS (
       |  SELECT string_split(text, ' ') AS w FROM documents
       |  WHERE len(string_split(text, ' ')) >= 2),
       |bg AS (
       |  SELECT w[i] AS v, w[i + 1] AS nw, count(*) AS c_vw
       |  FROM w, unnest(range(1, len(w))) AS u(i)
       |  GROUP BY 1, 2),
       |ctx AS (
       |  SELECT v, CAST(sum(c_vw) AS BIGINT) AS c_v,
       |         CAST(count(*) AS BIGINT) AS n1p_fwd
       |  FROM bg GROUP BY 1),
       |cont AS (SELECT nw, CAST(count(*) AS BIGINT) AS n1p_bwd FROM bg GROUP BY 1),
       |t AS (SELECT CAST(count(*) AS BIGINT) AS t_types FROM bg),
       |scored AS (
       |  SELECT b.v, b.nw, b.c_vw, c.c_v, c.n1p_fwd, n.n1p_bwd, t.t_types,
       |         CAST(greatest($KnDiscountDen * b.c_vw - $KnDiscountNum, 0) AS DECIMAL(38,0))
       |           * t.t_types
       |           + $KnDiscountNum * CAST(c.n1p_fwd AS DECIMAL(38,0)) * n.n1p_bwd AS num,
       |         CAST($KnDiscountDen AS DECIMAL(38,0)) * c.c_v * t.t_types AS den
       |  FROM bg b JOIN ctx c USING (v) JOIN cont n USING (nw) CROSS JOIN t),
       |ranked AS (
       |  SELECT *, CAST(row_number() OVER (PARTITION BY v ORDER BY num DESC, nw)
       |                 AS BIGINT) AS rk
       |  FROM scored)
       |SELECT v, rk, nw, c_vw, n1p_bwd, num,
       |       round(CAST(num AS DOUBLE) / CAST(den AS DOUBLE), 6) AS p_kn
       |FROM ranked WHERE rk <= $KnTopK
       |ORDER BY v, rk""".stripMargin

  val all: Seq[Q] = Seq(
    Q("r118_multitouch_attrib", r118, Some(r118Sql)),
    Q("t39_kneser_ney", t39, Some(t39Sql)))
}
