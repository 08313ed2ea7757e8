package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DecimalType, DoubleType, IntegerType, LongType, StringType}
import graft.Tables
import graft.queries.Relational.{Fn, Q}

/** Round-9 batch 31: uncertainty + eval machinery — split-conformal
  * prediction intervals with their coverage measured (the
  * distribution-free UQ a serving stack actually ships), the midrank
  * AUC every quality-classifier eval needs, the n-gram coverage curve
  * behind vocabulary truncation, the dedup fingerprint-prefix swept
  * like every other knob in this registry, and randomization QA on the
  * p05 shuffle itself.
  */
object ExtraQueries29 {

  private def docs(s: SparkSession, d: String): DataFrame = Tables.documents(s, d)

  // --------------------- r126 split-conformal interval + coverage

  /** r126: split-CONFORMAL prediction interval per event type — the
    * distribution-free UQ recipe: fit on the calibration half (here the
    * per-type mean), take the ceil(0.9(n+1))-th smallest absolute
    * residual as the radius qhat, and the exchangeability theorem
    * guarantees ≥90% coverage on the other half — which this query then
    * MEASURES instead of assuming (the r124/u29 estimator-with-its-
    * error discipline).
    *
    * Exactness: the split is event_id parity; mu is ONE double division
    * of a DECIMAL(18,2) sum by an exact count; residuals are IEEE
    * doubles of identical operands on both engines; qhat is selected by
    * the COUNTING method over the per-(type, value) domain aggregate —
    * cumulative exact counts, first residual whose cum reaches k —
    * never a percentile interpolation. Scale shape: both windows run
    * over the (type × distinct-value) DOMAIN aggregate (the r62
    * price-domain class, 2dp-grid bounded), partitioned by type; the
    * coverage pass joins a broadcast 5-row (mu, qhat) relation. */
  private val r126: Fn = (s, d) => {
    val ev = Tables.events(s, d)
      .select(col("event_id"), col("event_type"), col("value"),
        (pmod(col("event_id"), lit(2)) === 0).as("is_calib"))
    val mus = ev.filter(col("is_calib"))
      .groupBy("event_type")
      .agg(count(lit(1)).cast(LongType).as("n_calib"),
        (sum(col("value").cast(DecimalType(18, 2))).cast(DoubleType) /
          count(lit(1)).cast(DoubleType)).as("mu"))
    val dom = ev.filter(col("is_calib"))
      .groupBy(col("event_type"), col("value")).agg(count(lit(1)).as("t"))
      .join(broadcast(mus), Seq("event_type"))
      .withColumn("resid", abs(col("value") - col("mu")))
    val wcum = Window.partitionBy("event_type").orderBy(col("resid"), col("value"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val qhat = dom
      .withColumn("cum", sum(col("t")).over(wcum))
      .withColumn("k", least(ceil(lit(0.9) * (col("n_calib") + 1)), col("n_calib")))
      .filter(col("cum") >= col("k") && col("cum") - col("t") < col("k"))
      .select(col("event_type"), col("resid").as("qhat"))
    val cover = ev.filter(!col("is_calib"))
      .join(broadcast(mus.select("event_type", "mu")), Seq("event_type"))
      .join(broadcast(qhat), Seq("event_type"))
      .groupBy("event_type")
      .agg(count(lit(1)).cast(LongType).as("n_eval"),
        sum(when(abs(col("value") - col("mu")) <= col("qhat"), 1L).otherwise(0L))
          .cast(LongType).as("covered"))
    mus.join(qhat, Seq("event_type")).join(cover, Seq("event_type"))
      .select(col("event_type"), col("n_calib"), round(col("qhat"), 4).as("qhat"),
        col("n_eval"), col("covered"),
        round(col("covered").cast(DoubleType) / col("n_eval").cast(DoubleType), 4)
          .as("coverage"))
      .orderBy("event_type")
  }
  private val r126Sql =
    """WITH ev AS (
      |  SELECT event_id, event_type, value, event_id % 2 = 0 AS is_calib FROM events),
      |mus AS (
      |  SELECT event_type, CAST(count(*) AS BIGINT) AS n_calib,
      |         CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE) / CAST(count(*) AS DOUBLE) AS mu
      |  FROM ev WHERE is_calib GROUP BY 1),
      |dom AS (
      |  SELECT event_type, value, t, n_calib, mu, abs(value - mu) AS resid FROM (
      |    SELECT e.event_type, e.value, count(*) AS t, m.n_calib, m.mu
      |    FROM ev e JOIN mus m ON e.event_type = m.event_type
      |    WHERE e.is_calib GROUP BY 1, 2, 4, 5) g),
      |qh AS (
      |  SELECT event_type, resid AS qhat FROM (
      |    SELECT event_type, resid, t, n_calib,
      |           sum(t) OVER (PARTITION BY event_type ORDER BY resid, value
      |                        ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum,
      |           least(CAST(ceil(0.9 * (n_calib + 1)) AS BIGINT), n_calib) AS k
      |    FROM dom) q0
      |  WHERE cum >= k AND cum - q0.t < k),
      |cover AS (
      |  SELECT e.event_type, CAST(count(*) AS BIGINT) AS n_eval,
      |         CAST(sum(CASE WHEN abs(e.value - m.mu) <= q.qhat THEN 1 ELSE 0 END) AS BIGINT)
      |           AS covered
      |  FROM ev e
      |  JOIN mus m ON e.event_type = m.event_type
      |  JOIN qh q ON e.event_type = q.event_type
      |  WHERE NOT e.is_calib GROUP BY 1)
      |SELECT m.event_type, m.n_calib, round(q.qhat, 4) AS qhat,
      |       c.n_eval, c.covered,
      |       round(CAST(c.covered AS DOUBLE) / CAST(c.n_eval AS DOUBLE), 4) AS coverage
      |FROM mus m JOIN qh q ON m.event_type = q.event_type
      |JOIN cover c ON m.event_type = c.event_type
      |ORDER BY m.event_type""".stripMargin

  // --------------------- u32 midrank AUC

  /** u32: midrank AUC — does event value discriminate purchases? The
    * eval metric every quality classifier in this registry (t18/t31)
    * ultimately answers to, computed the way a database should: not by
    * enumerating pos×neg pairs but by the rank-sum identity
    * AUC = (R⁺ − n⁺(n⁺+1)/2) / (n⁺n⁻) with AVERAGE ranks for ties.
    *
    * Exactness: everything rides DOUBLED midranks to stay integer —
    * for a tie group at cumulative offset c with t members,
    * 2·midrank = 2c + t + 1, so R2 = Σ n⁺_group·(2c + t + 1) is BIGINT
    * and AUC = (R2 − n⁺(n⁺+1)) / (2n⁺n⁻) is ONE division of exact
    * integers, rounded 4dp (Gini = 2·AUC − 1 likewise from the exact
    * rational). Scale shape: one conditional aggregation to the
    * VALUE-domain grain (2dp-grid bounded, the r62 class), one
    * cumulative window over that aggregate, a 1-row close. */
  private val u32: Fn = (s, d) => {
    val grp = Tables.events(s, d)
      .groupBy(col("value"))
      .agg(count(lit(1)).as("t"),
        sum(when(col("event_type") === "purchase", 1L).otherwise(0L)).as("p"))
    val wcum = Window.orderBy("value")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    grp.withColumn("cum", sum(col("t")).over(wcum))
      .withColumn("r2g", col("p") * (lit(2L) * (col("cum") - col("t")) + col("t") + 1))
      .agg(sum(col("p")).cast(LongType).as("n_pos"),
        (sum(col("t")) - sum(col("p"))).cast(LongType).as("n_neg"),
        sum(col("r2g")).cast(LongType).as("r2"))
      .withColumn("auc", round(
        (col("r2") - col("n_pos") * (col("n_pos") + 1)).cast(DoubleType) /
          (lit(2L) * col("n_pos") * col("n_neg")).cast(DoubleType), 4))
      .withColumn("gini", round(
        (col("r2") - col("n_pos") * (col("n_pos") + 1)).cast(DoubleType) /
          (col("n_pos") * col("n_neg")).cast(DoubleType) - 1.0, 4))
      .select("n_pos", "n_neg", "r2", "auc", "gini")
  }
  private val u32Sql =
    """WITH grp AS (
      |  SELECT value, count(*) AS t,
      |         sum(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS p
      |  FROM events GROUP BY 1),
      |ranked AS (
      |  SELECT p, t,
      |         sum(t) OVER (ORDER BY value
      |                      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum
      |  FROM grp),
      |tot AS (
      |  SELECT CAST(sum(p) AS BIGINT) AS n_pos,
      |         CAST(sum(t) - sum(p) AS BIGINT) AS n_neg,
      |         CAST(sum(p * (2 * (cum - t) + t + 1)) AS BIGINT) AS r2
      |  FROM ranked)
      |SELECT n_pos, n_neg, r2,
      |       round(CAST(r2 - n_pos * (n_pos + 1) AS DOUBLE) /
      |             CAST(2 * n_pos * n_neg AS DOUBLE), 4) AS auc,
      |       round(CAST(r2 - n_pos * (n_pos + 1) AS DOUBLE) /
      |             CAST(n_pos * n_neg AS DOUBLE) - 1.0, 4) AS gini
      |FROM tot""".stripMargin

  // --------------------- t43 n-gram coverage curve

  val CoverageMs: Seq[Int] = Seq(10, 50, 100)

  /** t43: n-gram coverage CURVE — the sizing evidence behind every
    * truncated vocabulary (t15's merge count, a countable fraction of
    * corpus bigram mass): per candidate table size M, what fraction of
    * all bigram OCCURRENCES the top-M bigram types cover. The knee of
    * this curve is where a bigger table stops paying — the d19/s28/d29
    * sweep discipline applied to the vocabulary knob.
    *
    * Exactness: occurrence counts are BIGINT; ranks are row_number
    * over exact counts (bigram string breaks ties); coverage is ONE
    * rounded division per M. Scale shape: bigrams form per doc via a
    * doc-partitioned lead window (the corpus is touched once), reduce
    * to the bigram-TYPE grain with map-side partial agg; the rank
    * window runs over that bounded type aggregate (vocab², PlanLint
    * AggBounded), and the curve explodes only |Ms| × top rows. */
  private val t43: Fn = (s, d) => {
    val maxM = CoverageMs.max
    val wdoc = Window.partitionBy("doc_id").orderBy("pos")
    val bigrams = docs(s, d)
      .select(col("doc_id"), posexplode(split(col("text"), " ")).as(Seq("pos", "tok")))
      .withColumn("nxt", lead(col("tok"), 1).over(wdoc))
      .filter(col("nxt").isNotNull)
      .select(concat(col("tok"), lit(" "), col("nxt")).as("bigram"))
      .groupBy("bigram").agg(count(lit(1)).as("cnt"))
    val tot = bigrams.agg(sum(col("cnt")).cast(LongType).as("total"),
      count(lit(1)).cast(LongType).as("n_types"))
    bigrams
      .withColumn("rk", row_number().over(Window.orderBy(desc("cnt"), col("bigram"))))
      .filter(col("rk") <= maxM)
      .withColumn("m", explode(array(CoverageMs.map(lit): _*)))
      .filter(col("rk") <= col("m"))
      .groupBy("m").agg(sum(col("cnt")).cast(LongType).as("covered"))
      .crossJoin(broadcast(tot))
      .select(col("m"), col("covered"), col("total"), col("n_types"),
        round(col("covered").cast(DoubleType) / col("total").cast(DoubleType), 4)
          .as("coverage"))
      .orderBy("m")
  }
  private val t43Sql = {
    val ms = CoverageMs.mkString(", ")
    val maxM = CoverageMs.max
    s"""WITH bg AS (
       |  SELECT bigram, CAST(count(*) AS BIGINT) AS cnt FROM (
       |    SELECT unnest(list_transform(range(1, len(sp)),
       |                                 i -> sp[i] || ' ' || sp[i + 1])) AS bigram
       |    FROM (SELECT string_split(text, ' ') AS sp FROM documents) t0) t1
       |  GROUP BY 1),
       |tot AS (
       |  SELECT CAST(sum(cnt) AS BIGINT) AS total, CAST(count(*) AS BIGINT) AS n_types
       |  FROM bg),
       |ranked AS (
       |  SELECT bigram, cnt, row_number() OVER (ORDER BY cnt DESC, bigram) AS rk
       |  FROM bg QUALIFY rk <= $maxM)
       |SELECT m.m, CAST(sum(r.cnt) AS BIGINT) AS covered, t.total, t.n_types,
       |       round(CAST(sum(r.cnt) AS DOUBLE) / CAST(t.total AS DOUBLE), 4) AS coverage
       |FROM ranked r
       |JOIN (SELECT unnest(ARRAY[$ms]) AS m) m ON r.rk <= m.m
       |CROSS JOIN tot t
       |GROUP BY m.m, t.total, t.n_types
       |ORDER BY m.m""".stripMargin
  }

  // --------------------- d31 fingerprint-prefix sweep

  val PrefixLens: Seq[Int] = Seq(50, 100, 200)

  /** d31: fingerprint-PREFIX sweep — the d01/d26/d29 kernels all hash
    * `substring(text, 1, 100)`, a folk constant like every other knob
    * this registry sweeps (d19 bands, s28 probes, d29 horizons, s35
    * codebooks): per candidate prefix length, the family count, repeat
    * count and largest family. A short prefix over-merges (inflated
    * repeats), a long one only pays hash bytes — the knee is the
    * production pick, and the L=100 row is exactly the live kernel
    * (cross-pinned against d29's repeat denominator in the spec).
    *
    * Exactness: pure BIGINT counting at the (length, hash) grain.
    * Scale shape: one explode×|lengths| map pass, hash-grain reduce
    * with map-side partial agg, |lengths|-row close — the d01 shuffle
    * repeated |lengths| times, never a pair relation. */
  private val d31: Fn = (s, d) => {
    docs(s, d)
      .withColumn("plen", explode(array(PrefixLens.map(lit): _*)))
      .select(col("plen"), md5(expr("substring(text, 1, plen)")).as("h"))
      .groupBy("plen", "h").agg(count(lit(1)).as("t"))
      .groupBy("plen")
      .agg(sum(col("t")).cast(LongType).as("n_docs"),
        count(lit(1)).cast(LongType).as("n_families"),
        (sum(col("t")) - count(lit(1))).cast(LongType).as("n_repeats"),
        max(col("t")).cast(LongType).as("max_family"))
      .select(col("plen").as("prefix_len"), col("n_docs"), col("n_families"),
        col("n_repeats"), col("max_family"))
      .orderBy("prefix_len")
  }
  private val d31Sql = {
    val ls = PrefixLens.mkString(", ")
    s"""WITH fam AS (
       |  SELECT l.plen, md5(substring(d.text, 1, l.plen)) AS h, count(*) AS t
       |  FROM documents d CROSS JOIN (SELECT unnest(ARRAY[$ls]) AS plen) l
       |  GROUP BY 1, 2)
       |SELECT plen AS prefix_len, CAST(sum(t) AS BIGINT) AS n_docs,
       |       CAST(count(*) AS BIGINT) AS n_families,
       |       CAST(sum(t) - count(*) AS BIGINT) AS n_repeats,
       |       CAST(max(t) AS BIGINT) AS max_family
       |FROM fam
       |GROUP BY 1
       |ORDER BY prefix_len""".stripMargin
  }

  // --------------------- p37 shuffle randomization QA

  /** p37: shuffle randomization QA — grades the registered p05 shuffle
    * the way a statistician would: in the shuffled order, adjacent
    * docs should share a source no more often than a random
    * permutation predicts (rate ≈ Σc_s(c_s−1)/(n(n−1))); in doc_id
    * order the fixture's round-robin sources NEVER collide (ratio 0 —
    * the anti-clumped baseline that proves the metric has teeth). A
    * broken coin (p05's skey losing entropy) would push the shuffled
    * ratio away from 1 — u30's independence audit, applied to
    * ORDERING.
    *
    * Exactness: adjacency counts are BIGINT over lag comparisons;
    * observed/expected rates are single divisions of exact integers,
    * the ratio divides the UNROUNDED rates, all 4dp. Scale shape: both
    * orderings are scanned via BUCKET-partitioned lag windows (256
    * coin buckets / 50-doc id blocks — no global window; the ~1/bucket
    * boundary pairs are priced out of the denominator exactly), and
    * the expected rate reduces at the source grain. */
  private val p37: Fn = (s, d) => {
    val base = docs(s, d).select(col("doc_id"), col("source"))
    val exp = base.groupBy("source").agg(count(lit(1)).as("c"))
      .agg(sum(col("c")).cast(LongType).as("n"),
        // dec-lift (overflow lint): one source's pair count fits in
        // long; the cross-source sum accumulates in DECIMAL(38,0)
        sum((col("c") * (col("c") - 1)).cast(DecimalType(38, 0)))
          .cast(LongType).as("same_w"))
    def adj(df: DataFrame, kind: String, bucket: org.apache.spark.sql.Column,
            ord: Seq[org.apache.spark.sql.Column]): DataFrame = {
      val w = Window.partitionBy("bucket").orderBy(ord: _*)
      df.withColumn("bucket", bucket)
        .withColumn("prev_src", lag(col("source"), 1).over(w))
        .filter(col("prev_src").isNotNull)
        .agg(count(lit(1)).cast(LongType).as("n_pairs"),
          sum(when(col("source") === col("prev_src"), 1L).otherwise(0L))
            .cast(LongType).as("same_pairs"))
        .select(lit(kind).as("order_kind"), col("n_pairs"), col("same_pairs"))
    }
    val shuffled = adj(
      base.withColumn("skey", graft.functions.DetHash.shuffleKey(col("doc_id"))),
      "shuffled", substring(col("skey"), 1, 2), Seq(col("skey"), col("doc_id")))
    val sorted_ = adj(base, "sorted", floor(col("doc_id") / 50), Seq(col("doc_id")))
    shuffled.unionAll(sorted_)
      .crossJoin(broadcast(exp))
      .withColumn("obs_rate",
        col("same_pairs").cast(DoubleType) / col("n_pairs").cast(DoubleType))
      .withColumn("exp_rate",
        col("same_w").cast(DoubleType) / (col("n") * (col("n") - 1)).cast(DoubleType))
      .select(col("order_kind"), col("n_pairs"), col("same_pairs"),
        round(col("obs_rate"), 4).as("obs_rate"),
        round(col("exp_rate"), 4).as("exp_rate"),
        round(col("obs_rate") / col("exp_rate"), 4).as("clump_ratio"))
      .orderBy("order_kind")
  }
  private val p37Sql =
    """WITH exp AS (
      |  SELECT CAST(sum(c) AS BIGINT) AS n, CAST(sum(c * (c - 1)) AS BIGINT) AS same_w
      |  FROM (SELECT count(*) AS c FROM documents GROUP BY source) t),
      |shuf AS (
      |  SELECT 'shuffled' AS order_kind, CAST(count(*) AS BIGINT) AS n_pairs,
      |         CAST(sum(CASE WHEN source = prev_src THEN 1 ELSE 0 END) AS BIGINT) AS same_pairs
      |  FROM (
      |    SELECT source, lag(source) OVER (PARTITION BY substring(skey, 1, 2)
      |                                     ORDER BY skey, doc_id) AS prev_src
      |    FROM (SELECT doc_id, source,
      |                 md5(concat('shuffle:', CAST(doc_id AS VARCHAR))) AS skey
      |          FROM documents) k) t
      |  WHERE prev_src IS NOT NULL),
      |srt AS (
      |  SELECT 'sorted' AS order_kind, CAST(count(*) AS BIGINT) AS n_pairs,
      |         CAST(sum(CASE WHEN source = prev_src THEN 1 ELSE 0 END) AS BIGINT) AS same_pairs
      |  FROM (
      |    SELECT source, lag(source) OVER (PARTITION BY doc_id // 50
      |                                     ORDER BY doc_id) AS prev_src
      |    FROM documents) t
      |  WHERE prev_src IS NOT NULL),
      |both_k AS (SELECT * FROM shuf UNION ALL SELECT * FROM srt)
      |SELECT b.order_kind, b.n_pairs, b.same_pairs,
      |       round(CAST(b.same_pairs AS DOUBLE) / CAST(b.n_pairs AS DOUBLE), 4) AS obs_rate,
      |       round(CAST(e.same_w AS DOUBLE) / CAST(e.n * (e.n - 1) AS DOUBLE), 4) AS exp_rate,
      |       round((CAST(b.same_pairs AS DOUBLE) / CAST(b.n_pairs AS DOUBLE)) /
      |             (CAST(e.same_w AS DOUBLE) / CAST(e.n * (e.n - 1) AS DOUBLE)), 4) AS clump_ratio
      |FROM both_k b CROSS JOIN exp e
      |ORDER BY b.order_kind""".stripMargin

  val all: Seq[Q] = Seq(
    Q("r126_split_conformal", r126, Some(r126Sql)),
    Q("u32_rank_auc", u32, Some(u32Sql)),
    Q("t43_coverage_curve", t43, Some(t43Sql)),
    Q("d31_prefix_sweep", d31, Some(d31Sql)),
    Q("p37_shuffle_qa", p37, Some(p37Sql)))
}
