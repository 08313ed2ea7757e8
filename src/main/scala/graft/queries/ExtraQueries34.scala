package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DecimalType, DoubleType, IntegerType, LongType, StringType}
import graft.Tables
import graft.queries.Relational.{Fn, Q}

/** Round-9 batch 36: closers on resampling, operating curves, and
  * curation accounting — the delete-one jackknife next to r123's
  * bootstrap, the precision/recall/F1 operating curve that picks the
  * dedup threshold (shingles succeeding exactly where d33 showed
  * token sets fail), temporal burstiness per event stream, the
  * before/after dedup datasheet, and a frame-sampling budget plan.
  */
object ExtraQueries34 {

  private def docs(s: SparkSession, d: String): DataFrame = Tables.documents(s, d)

  // --------------------- r134 delete-one-day jackknife

  /** r134: delete-one-GROUP jackknife standard error for the global
    * mean event value — r123's bootstrap sibling, and the resampling
    * scheme that needs NO coins at all: recompute the mean with each
    * DAY deleted (30 leave-one-out estimates from the day-grain
    * aggregate), then SE² = (g−1)/g · Σ(θ_i − θ̄)². Deleting whole
    * days (not rows) is deliberate: it is the grouped jackknife that
    * stays valid under within-day correlation.
    *
    * Exactness: day sums are exact cents (DECIMAL×100 → BIGINT);
    * each leave-one-out mean is ONE double division, then ROUNDED to
    * the 1e-6 grid (exact longs) so the spread uses the integer
    * moment form g·Σθ² − (Σθ)² — no unordered double sum — with the
    * squared-micro products lifted to DECIMAL(38,0) BEFORE
    * multiplying (the p38 discipline: θ_fp² ≈ 10¹⁵ per day, so a
    * calendar a few hundred days long puts Σθ² within reach of a
    * silently-wrapping non-ANSI BIGINT while DuckDB promotes to
    * HUGEINT); SE is one
    * sqrt. Scale shape: one day-grain aggregate, a broadcast 1-row
    * total join, a 30-row close. */
  private val r134: Fn = (s, d) => {
    val daily = Tables.events(s, d)
      .groupBy(to_date(col("ts")).as("day"))
      .agg(count(lit(1)).cast(LongType).as("n"),
        (sum(col("value").cast(DecimalType(18, 2))) * 100).cast(LongType).as("s_c"))
    val tot = daily.agg(sum(col("n")).cast(LongType).as("nn"),
      sum(col("s_c")).cast(LongType).as("ss"),
      count(lit(1)).cast(LongType).as("g"))
    daily.crossJoin(broadcast(tot))
      .withColumn("theta_fp", round((col("ss") - col("s_c")).cast(DoubleType) /
        (col("nn") - col("n")).cast(DoubleType) / 100.0 * 1e6).cast(LongType))
      .groupBy("nn", "ss", "g")
      .agg(sum(col("theta_fp")).cast(LongType).as("st"),
        sum(col("theta_fp").cast(DecimalType(38, 0)) *
          col("theta_fp").cast(DecimalType(38, 0))).as("stt"))
      .withColumn("jvar",
        (col("g") - 1).cast(DoubleType) / col("g").cast(DoubleType) *
          (col("g").cast(DecimalType(38, 0)) * col("stt") -
            col("st").cast(DecimalType(38, 0)) * col("st").cast(DecimalType(38, 0)))
            .cast(DoubleType) /
          col("g").cast(DoubleType) / 1e12)
      .withColumn("point", col("ss").cast(DoubleType) / col("nn").cast(DoubleType) / 100.0)
      .select(col("g").as("n_days"), round(col("point"), 4).as("point_mean"),
        round(sqrt(col("jvar")), 6).as("jackknife_se"),
        round(col("point") - lit(1.96) * sqrt(col("jvar")), 4).as("lo95"),
        round(col("point") + lit(1.96) * sqrt(col("jvar")), 4).as("hi95"))
  }
  private val r134Sql =
    """WITH daily AS (
      |  SELECT CAST(ts AS DATE) AS day, CAST(count(*) AS BIGINT) AS n,
      |         CAST(sum(CAST(value AS DECIMAL(18,2))) * 100 AS BIGINT) AS s_c
      |  FROM events GROUP BY 1),
      |tot AS (
      |  SELECT CAST(sum(n) AS BIGINT) AS nn, CAST(sum(s_c) AS BIGINT) AS ss,
      |         CAST(count(*) AS BIGINT) AS g
      |  FROM daily),
      |loo AS (
      |  SELECT t.nn, t.ss, t.g,
      |         CAST(round(CAST(t.ss - d.s_c AS DOUBLE) / CAST(t.nn - d.n AS DOUBLE)
      |                    / 100.0 * 1e6) AS BIGINT) AS theta_fp
      |  FROM daily d CROSS JOIN tot t),
      |mom AS (
      |  SELECT nn, ss, g, CAST(sum(theta_fp) AS BIGINT) AS st,
      |         sum(CAST(theta_fp AS HUGEINT) * CAST(theta_fp AS HUGEINT)) AS stt
      |  FROM loo GROUP BY 1, 2, 3)
      |SELECT g AS n_days,
      |       round(CAST(ss AS DOUBLE) / CAST(nn AS DOUBLE) / 100.0, 4) AS point_mean,
      |       round(sqrt(CAST(g - 1 AS DOUBLE) / CAST(g AS DOUBLE) *
      |                  CAST(g * stt - CAST(st AS HUGEINT) * CAST(st AS HUGEINT) AS DOUBLE) / CAST(g AS DOUBLE) / 1e12), 6)
      |         AS jackknife_se,
      |       round(CAST(ss AS DOUBLE) / CAST(nn AS DOUBLE) / 100.0 -
      |             1.96 * sqrt(CAST(g - 1 AS DOUBLE) / CAST(g AS DOUBLE) *
      |                         CAST(g * stt - CAST(st AS HUGEINT) * CAST(st AS HUGEINT) AS DOUBLE) / CAST(g AS DOUBLE) / 1e12), 4)
      |         AS lo95,
      |       round(CAST(ss AS DOUBLE) / CAST(nn AS DOUBLE) / 100.0 +
      |             1.96 * sqrt(CAST(g - 1 AS DOUBLE) / CAST(g AS DOUBLE) *
      |                         CAST(g * stt - CAST(st AS HUGEINT) * CAST(st AS HUGEINT) AS DOUBLE) / CAST(g AS DOUBLE) / 1e12), 4)
      |         AS hi95
      |FROM mom""".stripMargin

  // --------------------- d34 dedup threshold operating curve

  /** Dense near the top: the planted families score ≥ ~9100 bp, so
    * the interesting operating points (where recall starts trading
    * against precision) live above 9000 — a sweep stopping there
    * would show five identical rows. */
  val ThresholdsBp: Seq[Int] = Seq(1000, 5000, 9000, 9500, 9800)

  /** d34: the dedup threshold OPERATING curve — d33 showed token-set
    * Jaccard failing on this corpus; this closes the argument by
    * grading the registry's actual discriminator (3-word shingles, the
    * d03 kernel) as a classifier over the same two pair populations
    * (planted-family pairs = positives, shuffled-background pairs =
    * negatives): per threshold θ, TP/FP/FN and precision/recall/F1.
    * The curve is how a production threshold is actually chosen — and
    * the one background pair that genuinely IS a near-dup (label
    * noise) keeps precision honestly below 1 at low θ.
    *
    * Exactness: scores are basis-point integers inter·10⁴//union; the
    * confusion cells are BIGINT; P/R/F1 are single divisions with
    * F1 = 2TP/(2TP+FP+FN) (no P·R chaining). Scale shape: linear pair
    * relations (the d33 kernels), doc-grain set joins, |θ|-explode on
    * the scored pairs, |θ|-row close. */
  private val d34: Fn = (s, d) => {
    val base = docs(s, d).select(col("doc_id"), col("text"))
    val famPairs = base
      .withColumn("nid", lead(col("doc_id"), 1).over(
        Window.partitionBy(md5(substring(col("text"), 1, 100))).orderBy("doc_id")))
      .filter(col("nid").isNotNull)
      .select(lit("pos").as("label"), col("doc_id").as("id_a"), col("nid").as("id_b"))
    val shufPairs = base
      .withColumn("skey", graft.functions.DetHash.shuffleKey(col("doc_id")))
      .withColumn("nid", lead(col("doc_id"), 1).over(
        Window.partitionBy(substring(col("skey"), 1, 2)).orderBy("skey", "doc_id")))
      .filter(col("nid").isNotNull)
      .select(lit("neg").as("label"), col("doc_id").as("id_a"), col("nid").as("id_b"))
    val sh = base.select(col("doc_id"), expr(
      "CASE WHEN size(split(text, ' ')) >= 3 THEN " +
        "array_distinct(transform(sequence(1, size(split(text, ' ')) - 2), " +
        "i -> concat_ws(' ', slice(split(text, ' '), i, 3)))) ELSE array() END").as("tk"))
    famPairs.unionAll(shufPairs)
      .join(sh.select(col("doc_id").as("id_a"), col("tk").as("ta")), Seq("id_a"))
      .join(sh.select(col("doc_id").as("id_b"), col("tk").as("tb")), Seq("id_b"))
      .withColumn("inter", size(array_intersect(col("ta"), col("tb"))).cast(LongType))
      .withColumn("uni", (size(col("ta")) + size(col("tb"))).cast(LongType) - col("inter"))
      .withColumn("score_bp", floor(col("inter") * 10000 / col("uni")))
      .withColumn("thr", explode(array(ThresholdsBp.map(lit): _*)))
      .groupBy("thr")
      .agg(
        sum(when(col("label") === "pos" && col("score_bp") >= col("thr"), 1L).otherwise(0L))
          .cast(LongType).as("tp"),
        sum(when(col("label") === "neg" && col("score_bp") >= col("thr"), 1L).otherwise(0L))
          .cast(LongType).as("fp"),
        sum(when(col("label") === "pos" && col("score_bp") < col("thr"), 1L).otherwise(0L))
          .cast(LongType).as("fn"))
      .select(col("thr").as("thr_bp"), col("tp"), col("fp"), col("fn"),
        round(col("tp").cast(DoubleType) /
          greatest(col("tp") + col("fp"), lit(1L)).cast(DoubleType), 4).as("precision"),
        round(col("tp").cast(DoubleType) /
          greatest(col("tp") + col("fn"), lit(1L)).cast(DoubleType), 4).as("recall"),
        round((col("tp") * 2).cast(DoubleType) /
          greatest(col("tp") * 2 + col("fp") + col("fn"), lit(1L)).cast(DoubleType), 4)
          .as("f1"))
      .orderBy("thr_bp")
  }
  private val d34Sql = {
    val ts = ThresholdsBp.mkString(", ")
    s"""WITH base AS (SELECT doc_id, text FROM documents),
       |fam_pairs AS (
       |  SELECT 'pos' AS label, doc_id AS id_a, nid AS id_b FROM (
       |    SELECT doc_id, lead(doc_id) OVER (PARTITION BY md5(substring(text, 1, 100))
       |                                      ORDER BY doc_id) AS nid
       |    FROM base) t WHERE nid IS NOT NULL),
       |shuf_pairs AS (
       |  SELECT 'neg' AS label, doc_id AS id_a, nid AS id_b FROM (
       |    SELECT doc_id, lead(doc_id) OVER (PARTITION BY substring(skey, 1, 2)
       |                                      ORDER BY skey, doc_id) AS nid
       |    FROM (SELECT doc_id, md5(concat('shuffle:', CAST(doc_id AS VARCHAR))) AS skey
       |          FROM base) k) t WHERE nid IS NOT NULL),
       |sh AS (
       |  SELECT doc_id, list_distinct(list_transform(range(1, len(sp) - 1),
       |           i -> sp[i] || ' ' || sp[i + 1] || ' ' || sp[i + 2])) AS tk
       |  FROM (SELECT doc_id, string_split(text, ' ') AS sp FROM base) t),
       |scored AS (
       |  SELECT p.label,
       |         CAST(len(list_intersect(a.tk, b.tk)) AS BIGINT) * 10000 //
       |         (CAST(len(a.tk) + len(b.tk) AS BIGINT) -
       |          CAST(len(list_intersect(a.tk, b.tk)) AS BIGINT)) AS score_bp
       |  FROM (SELECT * FROM fam_pairs UNION ALL SELECT * FROM shuf_pairs) p
       |  JOIN sh a ON p.id_a = a.doc_id
       |  JOIN sh b ON p.id_b = b.doc_id)
       |SELECT t.thr AS thr_bp,
       |       CAST(sum(CASE WHEN label = 'pos' AND score_bp >= t.thr THEN 1 ELSE 0 END) AS BIGINT) AS tp,
       |       CAST(sum(CASE WHEN label = 'neg' AND score_bp >= t.thr THEN 1 ELSE 0 END) AS BIGINT) AS fp,
       |       CAST(sum(CASE WHEN label = 'pos' AND score_bp < t.thr THEN 1 ELSE 0 END) AS BIGINT) AS fn,
       |       round(CAST(sum(CASE WHEN label = 'pos' AND score_bp >= t.thr THEN 1 ELSE 0 END) AS DOUBLE) /
       |             CAST(greatest(sum(CASE WHEN score_bp >= t.thr THEN 1 ELSE 0 END), 1) AS DOUBLE), 4) AS precision,
       |       round(CAST(sum(CASE WHEN label = 'pos' AND score_bp >= t.thr THEN 1 ELSE 0 END) AS DOUBLE) /
       |             CAST(greatest(sum(CASE WHEN label = 'pos' THEN 1 ELSE 0 END), 1) AS DOUBLE), 4) AS recall,
       |       round(CAST(2 * sum(CASE WHEN label = 'pos' AND score_bp >= t.thr THEN 1 ELSE 0 END) AS DOUBLE) /
       |             CAST(greatest(2 * sum(CASE WHEN label = 'pos' AND score_bp >= t.thr THEN 1 ELSE 0 END) +
       |                           sum(CASE WHEN label = 'neg' AND score_bp >= t.thr THEN 1 ELSE 0 END) +
       |                           sum(CASE WHEN label = 'pos' AND score_bp < t.thr THEN 1 ELSE 0 END), 1) AS DOUBLE), 4) AS f1
       |FROM scored CROSS JOIN (SELECT unnest(ARRAY[$ts]) AS thr) t
       |GROUP BY t.thr
       |ORDER BY thr_bp""".stripMargin
  }

  // --------------------- r136 inter-arrival burstiness profile

  /** r136: inter-arrival PROFILE per event stream — t27 measures
    * burstiness of tokens in text; this measures it in TIME, the form
    * capacity planning reads: per event type the gap count, mean gap,
    * counting-method median and p90, and the coefficient of variation
    * (CoV > 1 = bursty, < 1 = regular, = 1 = Poisson).
    *
    * Exactness: gaps are whole seconds (the q23 truncation idiom);
    * mean/CoV use exact integer sums and the N·Σg²−(Σg)² variance
    * numerator; median/p90 select by cumulative exact counts over the
    * (type, gap)-domain aggregate — never an interpolation. Scale
    * shape: one type-partitioned lag pass, gap-domain aggregates,
    * type-grain close. */
  private val r136: Fn = (s, d) => {
    val w = Window.partitionBy("event_type").orderBy("ts", "event_id")
    val gaps = Tables.events(s, d)
      .select(col("event_type"), col("ts"), col("event_id"))
      .withColumn("gap", unix_timestamp(col("ts")) - unix_timestamp(lag(col("ts"), 1).over(w)))
      .filter(col("gap").isNotNull)
    val moments = gaps.groupBy("event_type")
      .agg(count(lit(1)).cast(LongType).as("n_gaps"),
        sum(col("gap")).cast(LongType).as("sg"),
        // dec-lift (overflow lint): one squared gap (seconds) fits in
        // long; the per-type SUM of squares accumulates in DECIMAL(38,0)
        sum((col("gap") * col("gap")).cast(DecimalType(38, 0)))
          .cast(LongType).as("sgg"))
    val dom = gaps.groupBy("event_type", "gap").agg(count(lit(1)).as("t"))
      .withColumn("cum", sum(col("t")).over(
        Window.partitionBy("event_type").orderBy("gap")
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)))
    def orderStat(name: String, num: Int, den: Int): DataFrame =
      dom.join(moments.select(col("event_type").as("et_m"), col("n_gaps")),
        col("event_type") === col("et_m"))
        // ceil(n·num/den) on INTEGERS: Spark's `/` is double division, so
        // floor() is load-bearing (DuckDB's // floors natively)
        .withColumn("k", floor((col("n_gaps") * num + den - 1) / den))
        .filter(col("cum") >= col("k") && col("cum") - col("t") < col("k"))
        .select(col("event_type").as(s"et_$name"), col("gap").as(name))
    val med = orderStat("median_gap_s", 1, 2)
    val p90 = orderStat("p90_gap_s", 9, 10)
    moments
      .join(med, col("event_type") === col("et_median_gap_s"))
      .join(p90, col("event_type") === col("et_p90_gap_s"))
      .withColumn("mean_g", col("sg").cast(DoubleType) / col("n_gaps").cast(DoubleType))
      .select(col("event_type"), col("n_gaps"),
        round(col("mean_g"), 4).as("mean_gap_s"),
        col("median_gap_s"), col("p90_gap_s"),
        round(sqrt((col("n_gaps") * col("sgg") - col("sg") * col("sg")).cast(DoubleType) /
          (col("n_gaps") * (col("n_gaps") - 1)).cast(DoubleType)) / col("mean_g"), 4)
          .as("cov"))
      .orderBy("event_type")
  }
  private val r136Sql =
    """WITH gaps AS (
      |  SELECT event_type,
      |         CAST(epoch(date_trunc('second', ts)) -
      |              epoch(date_trunc('second', lag(ts) OVER (PARTITION BY event_type
      |                                                       ORDER BY ts, event_id)))
      |              AS BIGINT) AS gap
      |  FROM events),
      |g AS (SELECT event_type, gap FROM gaps WHERE gap IS NOT NULL),
      |moments AS (
      |  SELECT event_type, CAST(count(*) AS BIGINT) AS n_gaps,
      |         CAST(sum(gap) AS BIGINT) AS sg, CAST(sum(gap * gap) AS BIGINT) AS sgg
      |  FROM g GROUP BY 1),
      |dom AS (
      |  SELECT event_type, gap, count(*) AS t,
      |         sum(count(*)) OVER (PARTITION BY event_type ORDER BY gap
      |                             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum
      |  FROM g GROUP BY 1, 2),
      |med AS (
      |  SELECT d.event_type, d.gap AS median_gap_s
      |  FROM dom d JOIN moments m ON d.event_type = m.event_type
      |  WHERE d.cum >= (m.n_gaps * 1 + 1) // 2 AND d.cum - d.t < (m.n_gaps * 1 + 1) // 2),
      |p90 AS (
      |  SELECT d.event_type, d.gap AS p90_gap_s
      |  FROM dom d JOIN moments m ON d.event_type = m.event_type
      |  WHERE d.cum >= (m.n_gaps * 9 + 9) // 10 AND d.cum - d.t < (m.n_gaps * 9 + 9) // 10)
      |SELECT m.event_type, m.n_gaps,
      |       round(CAST(m.sg AS DOUBLE) / CAST(m.n_gaps AS DOUBLE), 4) AS mean_gap_s,
      |       md.median_gap_s, p.p90_gap_s,
      |       round(sqrt(CAST(m.n_gaps * m.sgg - m.sg * m.sg AS DOUBLE) /
      |                  CAST(m.n_gaps * (m.n_gaps - 1) AS DOUBLE)) /
      |             (CAST(m.sg AS DOUBLE) / CAST(m.n_gaps AS DOUBLE)), 4) AS cov
      |FROM moments m
      |JOIN med md ON m.event_type = md.event_type
      |JOIN p90 p ON m.event_type = p.event_type
      |ORDER BY m.event_type""".stripMargin

  // --------------------- t47 dedup before/after datasheet

  /** t47: the before/after DEDUP datasheet — what did removing the
    * planted prefix families (the d01/d26 keeper rule) actually do to
    * the distribution a model trains on? Two rows, same statistics:
    * doc/token/vocab counts and the mean micro-grid TTR. On a healthy
    * corpus dedup removes mass but not vocabulary — the law the spec
    * pins (vocab unchanged here, tokens strictly down).
    *
    * Exactness: all counts BIGINT; TTR is the t44 micro-grid kernel
    * (one rounded division per doc, exact sums after). Scale shape:
    * the keeper rule is one hash-partitioned window; each stage is a
    * map pass + a token-grain distinct; 2-row close. */
  private val t47: Fn = (s, d) => {
    val toks = split(col("text"), " ")
    val base = docs(s, d)
      .withColumn("duprk", row_number().over(
        Window.partitionBy(md5(substring(col("text"), 1, 100))).orderBy("doc_id")))
      .withColumn("n_tok", size(toks).cast(LongType))
      .withColumn("ttr_micro",
        round(size(array_distinct(toks)).cast(LongType) * 10000 /
          size(toks).cast(DoubleType)).cast(LongType))
    def stage(df: DataFrame, tag: String): DataFrame = {
      val vocab = df.select(explode(toks).as("tok")).distinct()
        .agg(count(lit(1)).cast(LongType).as("vocab"))
      df.agg(count(lit(1)).cast(LongType).as("n_docs"),
        sum(col("n_tok")).cast(LongType).as("n_tokens"),
        round(sum(col("ttr_micro")).cast(DoubleType) / (count(lit(1)) * 10000)
          .cast(DoubleType), 4).as("mean_ttr"))
        .crossJoin(vocab)
        .select(lit(tag).as("stage"), col("n_docs"), col("n_tokens"), col("vocab"),
          col("mean_ttr"))
    }
    stage(base, "a_raw").unionAll(stage(base.filter(col("duprk") === 1), "b_deduped"))
      .orderBy("stage")
  }
  private val t47Sql =
    """WITH base AS (
      |  SELECT text,
      |         row_number() OVER (PARTITION BY md5(substring(text, 1, 100))
      |                            ORDER BY doc_id) AS duprk,
      |         CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tok,
      |         CAST(round(CAST(len(list_distinct(string_split(text, ' '))) AS BIGINT) * 10000
      |                    / CAST(len(string_split(text, ' ')) AS DOUBLE)) AS BIGINT) AS ttr_micro
      |  FROM documents)
      |SELECT 'a_raw' AS stage, CAST(count(*) AS BIGINT) AS n_docs,
      |       CAST(sum(n_tok) AS BIGINT) AS n_tokens,
      |       (SELECT CAST(count(DISTINCT tok) AS BIGINT) FROM (
      |          SELECT unnest(string_split(text, ' ')) AS tok FROM base) v) AS vocab,
      |       round(CAST(sum(ttr_micro) AS DOUBLE) / CAST(count(*) * 10000 AS DOUBLE), 4) AS mean_ttr
      |FROM base
      |UNION ALL
      |SELECT 'b_deduped', CAST(count(*) AS BIGINT), CAST(sum(n_tok) AS BIGINT),
      |       (SELECT CAST(count(DISTINCT tok) AS BIGINT) FROM (
      |          SELECT unnest(string_split(text, ' ')) AS tok FROM base WHERE duprk = 1) v),
      |       round(CAST(sum(ttr_micro) AS DOUBLE) / CAST(count(*) * 10000 AS DOUBLE), 4)
      |FROM base WHERE duprk = 1
      |ORDER BY stage""".stripMargin

  // --------------------- m23 frame-sampling budget plan

  /** Chosen well below the smallest SF's frame inventory (~1.9k at
    * sf0.001) so the allocation BINDS at every SF — a budget above
    * inventory would hand every source its whole inventory and the
    * remainder arm would never fire. */
  val FrameBudget = 1000L

  /** m23: frame-sampling BUDGET plan — video feature extraction is
    * priced per frame, so a fixed frame budget must be split across
    * sources before the m03/m16 samplers run: per video SOURCE the
    * frame inventory (the Multimodal frames rule: max(1, n_bytes/64)
    * per asset), a largest-remainder quota of [[FrameBudget]]
    * proportional to inventory (the p35 kernel at the source grain),
    * and the sampling stride ⌈frames/quota⌉ the extractor should use.
    *
    * Exactness: inventories and quotas are pure integer arithmetic
    * (base ⌊B·f/F⌋, remainders ranked by the exact B·f mod F);
    * strides are ceiling divisions of BIGINTs. Scale shape: one
    * asset-metadata map pass to the source grain; quota windows run
    * over the per-SOURCE aggregate (PlanLint AggBounded); payloads
    * never move. */
  private val m23: Fn = (s, d) => {
    val per = graft.multimodal.Multimodal.attachPayload(docs(s, d))
      .filter(col("meta.mime") === "video/mp4")
      .select(col("doc_id"), greatest(lit(1L), floor(col("meta.n_bytes") / 64)).as("frames"),
        col("meta.origin").as("source"))
      .groupBy("source")
      .agg(count(lit(1)).cast(LongType).as("n_videos"),
        sum(col("frames")).cast(LongType).as("frames"))
    val tot = per.agg(sum(col("frames")).cast(LongType).as("ff"))
    val wrem = Window.orderBy(desc("frac"), col("source"))
    val quotas = per.crossJoin(broadcast(tot))
      .withColumn("base", floor(lit(FrameBudget) * col("frames") / col("ff")).cast(LongType))
      .withColumn("frac", pmod(lit(FrameBudget) * col("frames"), col("ff")))
      .withColumn("rrk", row_number().over(wrem))
    val baseSum = quotas.agg(sum(col("base")).cast(LongType).as("bs"))
    quotas.crossJoin(broadcast(baseSum))
      .withColumn("quota",
        col("base") + when(col("rrk") <= lit(FrameBudget) - col("bs"), 1L).otherwise(0L))
      .withColumn("stride", ceil(col("frames").cast(DoubleType) /
        greatest(col("quota"), lit(1L)).cast(DoubleType)).cast(LongType))
      .select("source", "n_videos", "frames", "quota", "stride")
      .orderBy("source")
  }
  private val m23Sql =
    s"""WITH per AS (
       |  SELECT source, CAST(count(*) AS BIGINT) AS n_videos,
       |         CAST(sum(greatest(1, octet_length(CAST(text AS BLOB)) // 64)) AS BIGINT) AS frames
       |  FROM documents
       |  WHERE source <> 'src0' AND source <> 'src1'
       |  GROUP BY 1),
       |tot AS (SELECT CAST(sum(frames) AS BIGINT) AS ff FROM per),
       |q0 AS (
       |  SELECT p.source, p.n_videos, p.frames,
       |         CAST(floor($FrameBudget * p.frames / t.ff) AS BIGINT) AS base,
       |         ($FrameBudget * p.frames) % t.ff AS frac
       |  FROM per p CROSS JOIN tot t),
       |q1 AS (
       |  SELECT *, row_number() OVER (ORDER BY frac DESC, source) AS rrk,
       |         (SELECT sum(base) FROM q0) AS bs
       |  FROM q0)
       |SELECT source, n_videos, frames,
       |       base + CASE WHEN rrk <= $FrameBudget - bs THEN 1 ELSE 0 END AS quota,
       |       CAST(ceil(CAST(frames AS DOUBLE) /
       |            CAST(greatest(base + CASE WHEN rrk <= $FrameBudget - bs THEN 1 ELSE 0 END, 1)
       |                 AS DOUBLE)) AS BIGINT) AS stride
       |FROM q1
       |ORDER BY source""".stripMargin

  val all: Seq[Q] = Seq(
    Q("r134_jackknife", r134, Some(r134Sql)),
    Q("d34_threshold_sweep", d34, Some(d34Sql)),
    Q("r136_interarrival_profile", r136, Some(r136Sql)),
    Q("t47_dedup_effect", t47, Some(t47Sql)),
    Q("m23_frame_budget", m23, Some(m23Sql)))
}
