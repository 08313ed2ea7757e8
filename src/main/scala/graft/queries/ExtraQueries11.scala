package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DoubleType, LongType}
import graft.Tables
import graft.queries.Relational.{Fn, Q}

/** Round-7 batch 11: trailing-window distinct counting, time-horizon
  * funnel staging (the ClickHouse `windowFunnel` primitive), and
  * held-out tuning of the interpolated language model.
  *
  * Same determinism discipline as ExtraQueries3–10: exact integers
  * everywhere, fixed-point ln before any sum, one rounded double per
  * output cell with a mirrored expression tree.
  */
object ExtraQueries11 {

  private def events(s: SparkSession, d: String) = Tables.events(s, d)
  private def docs(s: SparkSession, d: String) = Tables.documents(s, d)

  // ---------------------------------------- r105 rolling distinct

  val RollWindowDays = 7

  /** r105: trailing-[[RollWindowDays]]-day distinct active users per
    * day (the WAU-style rolling-distinct every engagement dashboard
    * needs) — computed EXACTLY by the contribution-expansion method:
    * each distinct (user, day) activity contributes to the
    * [[RollWindowDays]] window endpoints it falls inside, and the
    * per-endpoint distinct count collapses the expansion. COUNT
    * DISTINCT over a sliding frame is not expressible as a window
    * aggregate (distinctness doesn't decompose over frame slides);
    * this is the standard exact rewrite, r28's HLL being the sketch
    * path when the 7× expansion is too dear.
    *
    * Exactness: pure date arithmetic and distinct counting on
    * integers — no floats anywhere.
    * Scale shape: the corpus collapses to the (user, day) distinct
    * relation FIRST (one keyed shuffle); the expansion is a bounded 7×
    * explode of that reduced relation followed by one (day)-keyed
    * distinct aggregation; endpoints are clamped to the observed day
    * domain by a broadcast semi-join so trailing windows never invent
    * days. At 100 TB the expansion factor stays [[RollWindowDays]] —
    * linear, shuffle-friendly, and AQE-splittable. */
  private val r105: Fn = (s, d) =>
    wauFromActivity(events(s, d)
      .select(col("user_id"), to_date(col("ts")).as("day")).distinct())

  /** The r105 derivation over any (user_id, day) distinct-activity
    * grain — factored so the streaming twin republishes from its
    * standing state via the SAME oracled code (the growthFlows
    * precedent). */
  private[graft] def wauFromActivity(ud: DataFrame): DataFrame = {
    val days = ud.select(col("day").as("tday")).distinct()
    val expanded = ud
      .select(col("user_id"),
        explode(sequence(lit(0), lit(RollWindowDays - 1))).as("off"), col("day"))
      .select(col("user_id"), date_add(col("day"), col("off")).as("tday"))
      .join(broadcast(days), Seq("tday"), "left_semi")
    val wau = expanded.groupBy("tday").agg(countDistinct(col("user_id")).as("wau"))
    val dau = ud.groupBy(col("day").as("tday")).agg(count(lit(1)).as("dau"))
    dau.join(wau, Seq("tday"))
      .withColumn("stickiness", round(col("dau").cast(DoubleType) /
        col("wau").cast(DoubleType), 6))
      .select(col("tday").as("day"), col("dau"), col("wau"), col("stickiness"))
      .orderBy("day")
  }

  private val r105Sql =
    s"""WITH ud AS (
       |  SELECT DISTINCT user_id, CAST(ts AS DATE) AS day FROM events),
       |days AS (SELECT DISTINCT day AS tday FROM ud),
       |expanded AS (
       |  SELECT DISTINCT ud.user_id, ud.day + CAST(off AS INTEGER) AS tday
       |  FROM ud CROSS JOIN (SELECT unnest(range(0, $RollWindowDays)) AS off) o
       |  WHERE ud.day + CAST(off AS INTEGER) IN (SELECT tday FROM days)),
       |wau AS (SELECT tday, count(DISTINCT user_id) AS wau FROM expanded GROUP BY 1),
       |dau AS (SELECT day AS tday, count(*) AS dau FROM ud GROUP BY 1)
       |SELECT d.tday AS day, d.dau, w.wau,
       |       round(CAST(d.dau AS DOUBLE) / CAST(w.wau AS DOUBLE), 6) AS stickiness
       |FROM dau d JOIN wau w ON d.tday = w.tday
       |ORDER BY day""".stripMargin

  // ---------------------------------------- r106 window funnel

  val FunnelHorizonUs: Long = 7L * 24 * 3600 * 1000000
  val FunnelSteps: Seq[String] = Seq("signup", "view", "purchase")

  /** r106: time-horizon funnel staging — for every user, the deepest
    * prefix of the ordered step sequence [[FunnelSteps]] completed
    * STRICTLY in order within [[FunnelHorizonUs]] of the first step
    * (ClickHouse's `windowFunnel`, the time-constrained upgrade of
    * r53's unconstrained ordered-conjunction funnel). Each stage
    * anchors on the EARLIEST qualifying event (min-chaining), the
    * standard greedy semantics: t₁ = first signup, t₂ = first view
    * after t₁, t₃ = first purchase after t₂, all ≤ t₁ + horizon.
    *
    * Exactness: stage timestamps are integer epoch-micros mins; the
    * output is a stage histogram — counts only.
    * Scale shape: three user-keyed aggregations, each over a relation
    * the previous stage already shrank (stage-k candidates are only
    * users who reached stage k−1, joined by broadcast once the funnel
    * narrows); no windows, no corpus re-scan per stage beyond the
    * type-filtered projections. */
  private val r106: Fn = (s, d) => {
    val ev = events(s, d).select(col("user_id"),
      col("event_type"), unix_micros(col("ts")).as("mts"))
    val users = ev.select("user_id").distinct()
    val s1 = ev.filter(col("event_type") === FunnelSteps.head)
      .groupBy("user_id").agg(min(col("mts")).as("t1"))
    val s2 = ev.filter(col("event_type") === FunnelSteps(1))
      .join(s1, Seq("user_id"))
      .filter(col("mts") > col("t1") && col("mts") <= col("t1") + FunnelHorizonUs)
      .groupBy("user_id").agg(first(col("t1")).as("t1"), min(col("mts")).as("t2"))
    val s3 = ev.filter(col("event_type") === FunnelSteps(2))
      .join(s2, Seq("user_id"))
      .filter(col("mts") > col("t2") && col("mts") <= col("t1") + FunnelHorizonUs)
      .groupBy("user_id").agg(min(col("mts")).as("t3"))
    val staged = users
      .join(s1.select(col("user_id"), lit(1).as("st1")), Seq("user_id"), "left")
      .join(s2.select(col("user_id"), lit(1).as("st2")), Seq("user_id"), "left")
      .join(s3.select(col("user_id"), lit(1).as("st3")), Seq("user_id"), "left")
      .select(col("user_id"),
        (coalesce(col("st1"), lit(0)) + coalesce(col("st2"), lit(0)) +
          coalesce(col("st3"), lit(0))).cast(LongType).as("stage"))
    staged.groupBy("stage").agg(count(lit(1)).as("n_users"))
      .orderBy("stage")
  }

  private val r106Sql =
    s"""WITH ev AS (
       |  SELECT user_id, event_type, epoch_us(ts) AS mts FROM events),
       |users AS (SELECT DISTINCT user_id FROM ev),
       |s1 AS (
       |  SELECT user_id, min(mts) AS t1 FROM ev
       |  WHERE event_type = '${FunnelSteps.head}' GROUP BY 1),
       |s2 AS (
       |  SELECT e.user_id, any_value(s.t1) AS t1, min(e.mts) AS t2
       |  FROM ev e JOIN s1 s ON e.user_id = s.user_id
       |  WHERE e.event_type = '${FunnelSteps(1)}'
       |    AND e.mts > s.t1 AND e.mts <= s.t1 + $FunnelHorizonUs
       |  GROUP BY 1),
       |s3 AS (
       |  SELECT e.user_id, min(e.mts) AS t3
       |  FROM ev e JOIN s2 s ON e.user_id = s.user_id
       |  WHERE e.event_type = '${FunnelSteps(2)}'
       |    AND e.mts > s.t2 AND e.mts <= s.t1 + $FunnelHorizonUs
       |  GROUP BY 1)
       |SELECT CAST((CASE WHEN s1.user_id IS NULL THEN 0 ELSE 1 END) +
       |            (CASE WHEN s2.user_id IS NULL THEN 0 ELSE 1 END) +
       |            (CASE WHEN s3.user_id IS NULL THEN 0 ELSE 1 END) AS BIGINT) AS stage,
       |       count(*) AS n_users
       |FROM users u
       |LEFT JOIN s1 ON u.user_id = s1.user_id
       |LEFT JOIN s2 ON u.user_id = s2.user_id
       |LEFT JOIN s3 ON u.user_id = s3.user_id
       |GROUP BY 1
       |ORDER BY stage""".stripMargin

  // ---------------------------------------- t34 LM held-out sweep

  val LmLambdasPct: Seq[Int] = Seq(0, 30, 50, 70, 90)
  val LmHoldoutMod = 5

  /** t34: held-out tuning of an interpolated TRIGRAM language model —
    * train trigram and add-1-smoothed bigram count relations on the
    * doc_id % [[LmHoldoutMod]] != 0 split, score the held-out docs at
    * every interpolation weight in [[LmLambdasPct]], and report
    * held-out log-likelihood plus unseen-trigram exposure per λ. This
    * is the missing half of t16 (which self-scores a fixed-λ bigram
    * model): smoothing weights chosen on training data overfit, so
    * production LM-quality filters pick λ on a held-out split exactly
    * like this — and at trigram order ~40% of held-out contexts are
    * genuinely unseen in this corpus, which is WHY interpolation
    * exists (the pure trigram model assigns the held-out set
    * probability zero, and the sweep shows the likelihood collapsing
    * toward λ→1).
    *
    * Exactness: all counts come from exact integer aggregations of the
    * train split; unseen trigrams/contexts coalesce to 0 and the
    * bigram leg is add-1 smoothed over the train vocabulary so every
    * probability is strictly positive; each position's ln is truncated
    * to 1e-9 fixed point BEFORE the sum (t14/t16 precedent) so
    * summation order cannot move the hash; one rounded division per
    * output cell.
    * Scale shape: identical to t16 — one doc-keyed window builds the
    * n-gram streams, the model relations are vocabulary-sized keyed
    * aggregates joined broadcast-style, and the λ grid is a broadcast
    * ≤5-row cross that scales the scoring map-side, never the data. */
  private val t34: Fn = (s, d) => {
    val toks = split(col("text"), " ")
    val tokPos = docs(s, d)
      .select(col("doc_id"), posexplode(toks).as(Seq("pos", "token")))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("doc_id")).orderBy(col("pos"))
    val tg = tokPos
      .withColumn("p1", lag(col("token"), 1).over(w))
      .withColumn("p2", lag(col("token"), 2).over(w))
      .filter(col("p2").isNotNull)
      .select(col("doc_id"), col("p2"), col("p1"), col("token").as("cur"))
    val isTrain = col("doc_id") % LmHoldoutMod =!= 0
    val trainTg = tg.filter(isTrain)
    val heldTg = tg.filter(!isTrain)
    val stats = tokPos.filter(isTrain).agg(countDistinct(col("token")).as("vocab"))
    val tri = trainTg.groupBy("p2", "p1", "cur").agg(count(lit(1)).as("ct"))
    val tctx = trainTg.groupBy("p2", "p1").agg(count(lit(1)).as("cc"))
    val big = trainTg.groupBy("p1", "cur").agg(count(lit(1)).as("cb"))
    val bctx = trainTg.groupBy("p1").agg(count(lit(1)).as("cp"))
    val lams = LmLambdasPct.map(p => s"($p)").mkString(", ")
    val grid = docs(s, d).sparkSession.sql(
      s"SELECT * FROM VALUES $lams AS t(lam_pct)")
    val ptri = when(col("cc").isNull || col("ct").isNull, lit(0.0))
      .otherwise(col("ct").cast(DoubleType) / col("cc").cast(DoubleType))
    val pbi = (coalesce(col("cb"), lit(0L)).cast(DoubleType) + 1.0) /
      (coalesce(col("cp"), lit(0L)).cast(DoubleType) + col("vocab").cast(DoubleType))
    val lam = col("lam_pct").cast(DoubleType) / 100.0
    val lpFp = (log(lam * ptri + (lit(1.0) - lam) * pbi) * 1e9).cast(LongType)
    heldTg
      .join(tri, Seq("p2", "p1", "cur"), "left")
      .join(tctx, Seq("p2", "p1"), "left")
      .join(big, Seq("p1", "cur"), "left")
      .join(bctx, Seq("p1"), "left")
      .crossJoin(broadcast(stats))
      .crossJoin(broadcast(grid))
      .groupBy("lam_pct")
      .agg(count(lit(1)).as("n_trigrams"),
        sum(when(col("ct").isNull, 1L).otherwise(0L)).cast(LongType).as("n_unseen"),
        sum(lpFp).as("lp_fp"))
      .withColumn("avg_logp", round(col("lp_fp").cast(DoubleType) / 1e9 /
        col("n_trigrams").cast(DoubleType), 4))
      .select(col("lam_pct").cast(LongType).as("lam_pct"), col("n_trigrams"),
        col("n_unseen"), col("avg_logp"))
      .orderBy("lam_pct")
  }

  private val t34Sql = {
    val lams = LmLambdasPct.mkString(", ")
    s"""WITH tokpos AS (
       |  SELECT doc_id, unnest(string_split(text, ' ')) AS token,
       |         CAST(unnest(range(1, len(string_split(text, ' ')) + 1)) AS INTEGER) AS pos
       |  FROM documents),
       |tg AS (
       |  SELECT doc_id, p2, p1, token AS cur FROM (
       |    SELECT doc_id, pos, token,
       |           lag(token, 1) OVER (PARTITION BY doc_id ORDER BY pos) AS p1,
       |           lag(token, 2) OVER (PARTITION BY doc_id ORDER BY pos) AS p2
       |    FROM tokpos) t WHERE p2 IS NOT NULL),
       |stats AS (
       |  SELECT CAST(count(DISTINCT token) AS BIGINT) AS vocab
       |  FROM tokpos WHERE doc_id % $LmHoldoutMod != 0),
       |tri AS (SELECT p2, p1, cur, count(*) AS ct FROM tg
       |        WHERE doc_id % $LmHoldoutMod != 0 GROUP BY 1, 2, 3),
       |tctx AS (SELECT p2, p1, count(*) AS cc FROM tg
       |         WHERE doc_id % $LmHoldoutMod != 0 GROUP BY 1, 2),
       |big AS (SELECT p1, cur, count(*) AS cb FROM tg
       |        WHERE doc_id % $LmHoldoutMod != 0 GROUP BY 1, 2),
       |bctx AS (SELECT p1, count(*) AS cp FROM tg
       |         WHERE doc_id % $LmHoldoutMod != 0 GROUP BY 1),
       |grid AS (SELECT unnest([$lams]) AS lam_pct),
       |held AS (SELECT doc_id, p2, p1, cur FROM tg WHERE doc_id % $LmHoldoutMod = 0)
       |SELECT CAST(g.lam_pct AS BIGINT) AS lam_pct, count(*) AS n_trigrams,
       |       CAST(sum(CASE WHEN t.ct IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_unseen,
       |       round(CAST(sum(CAST(trunc(ln(
       |           (CAST(g.lam_pct AS DOUBLE) / 100.0) *
       |             (CASE WHEN x.cc IS NULL OR t.ct IS NULL THEN 0.0
       |                   ELSE CAST(t.ct AS DOUBLE) / CAST(x.cc AS DOUBLE) END)
       |           + (1.0 - CAST(g.lam_pct AS DOUBLE) / 100.0) *
       |             ((CAST(COALESCE(b.cb, 0) AS DOUBLE) + 1.0) /
       |              (CAST(COALESCE(c.cp, 0) AS DOUBLE) + CAST(s.vocab AS DOUBLE)))
       |         ) * 1e9) AS BIGINT)) AS DOUBLE) / 1e9 / count(*), 4) AS avg_logp
       |FROM held h
       |LEFT JOIN tri t ON h.p2 = t.p2 AND h.p1 = t.p1 AND h.cur = t.cur
       |LEFT JOIN tctx x ON h.p2 = x.p2 AND h.p1 = x.p1
       |LEFT JOIN big b ON h.p1 = b.p1 AND h.cur = b.cur
       |LEFT JOIN bctx c ON h.p1 = c.p1
       |CROSS JOIN stats s
       |CROSS JOIN grid g
       |GROUP BY 1
       |ORDER BY lam_pct""".stripMargin
  }

  val all: Seq[Q] = Seq(
    Q("r105_rolling_distinct", r105, Some(r105Sql)),
    Q("r106_window_funnel", r106, Some(r106Sql)),
    Q("t34_lm_heldout", t34, Some(t34Sql)))
}
