package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DecimalType, DoubleType, LongType}
import graft.Tables
import graft.queries.Relational.{Fn, Q}

/** Round-8 batch 22: audio fingerprint dedup and the optimizer-side
  * join-cardinality estimation audit. Same determinism discipline as
  * ExtraQueries3–19.
  */
object ExtraQueries20 {

  // --------------------- m19 audio delta-sign fingerprint dedup

  /** Samples per fingerprint — the m06 fixed resample grid. */
  val FpFrames = 32

  /** m19: audio fingerprint dedup — a Shazam-flavored delta-sign
    * signature per audio asset: bit i = (v[i+1] > v[i]) over the
    * [[FpFrames]]-point DURATION-NORMALIZED resample grid from the
    * REGISTERED batched decode path (m06's bitwise-portable lerp
    * kernel). Delta SIGNS, not values, because they survive uniform
    * gain changes — the transformation re-encoded audio actually
    * undergoes — and the fixed grid, not raw frames, because raw
    * frame sequences of different-length clips share a zero tail that
    * manufactures false matches (measured: 94 spurious pairs at
    * sf0.01 on the raw-frame variant; the resample grid fingerprints
    * the clip's SHAPE at any duration). The 31-bit signature joins by
    * the m09/m10 pigeonhole discipline: 4 chunks of ≤8 bits,
    * candidates share ≥1 chunk (lossless for Hamming ≤ 3 — 3 flipped
    * bits cannot touch all 4 chunks) under the capped-bucket bound,
    * exact popcount verification after. Probe payloads (ids ≥ 1e9:
    * one exact copy + one first-byte-perturbed copy of the two lowest
    * audio assets) keep the operator's recall graded at every SF —
    * the natural corpus has no audio duplicates.
    *
    * Exactness: resampled values are the m06-oracled bitwise-portable
    * doubles; bits, chunks, and Hamming distance are integer algebra.
    * Scale shape: ONE decode pass (map-side), one 32-column
    * conditional aggregation per asset, chunk-bucketed candidate join
    * under [[DedupQueries.MaxBucket]] — never all-pairs. */
  private val m19: Fn = (s, d) => {
    val aud = Tables.documents(s, d).filter(col("source") === "src1")
      .select("doc_id", "text", "source")
    val probes = aud.orderBy("doc_id").limit(2)
    val corpus = aud
      .unionByName(probes.select((col("doc_id") + 1000000000L).as("doc_id"),
        col("text"), col("source")))
      .unionByName(probes.select((col("doc_id") + 2000000000L).as("doc_id"),
        concat(lit("X"), expr("substring(text, 2)")).as("text"), col("source")))
    val en = graft.multimodal.Multimodal.audioResample(
      graft.multimodal.Multimodal.attachPayload(corpus), samples = FpFrames)
    val eCols = (0 until FpFrames).map(i =>
      coalesce(sum(when(col("t") === i, col("v"))), lit(0.0)).as(s"e$i"))
    val wide = en.groupBy("doc_id").agg(eCols.head, eCols.tail: _*)
    def chunk(c: Int): Column =
      (c * 8 until math.min(c * 8 + 8, FpFrames - 1)).map { i =>
        when(col(s"e${i + 1}") > col(s"e$i"), 1L).otherwise(0L) * (1L << (i - c * 8))
      }.reduce(_ + _).cast(LongType)
    val sig = wide.select(col("doc_id"), chunk(0).as("c0"), chunk(1).as("c1"),
      chunk(2).as("c2"), chunk(3).as("c3"))
    val chunks = DedupQueries.capBuckets(
      sig.select(col("doc_id"), col("c0"), col("c1"), col("c2"), col("c3"),
        posexplode(array(col("c0"), col("c1"), col("c2"), col("c3"))).as(Seq("ci", "cv"))),
      Seq("ci", "cv"))
    val a = chunks.as("a"); val b = chunks.as("b")
    a.join(b, col("a.ci") === col("b.ci") && col("a.cv") === col("b.cv") &&
        col("a.doc_id") < col("b.doc_id"))
      .select(col("a.doc_id").as("a_id"), col("b.doc_id").as("b_id"),
        (bit_count(col("a.c0").bitwiseXOR(col("b.c0"))) +
          bit_count(col("a.c1").bitwiseXOR(col("b.c1"))) +
          bit_count(col("a.c2").bitwiseXOR(col("b.c2"))) +
          bit_count(col("a.c3").bitwiseXOR(col("b.c3")))).cast(LongType).as("hamming"))
      .distinct()
      .filter(col("hamming") <= 3)
      .orderBy("a_id", "b_id")
  }

  private def m19Sql: String = {
    val S = FpFrames
    val p = s"CAST(t * (len - 1) AS DOUBLE) / ${S - 1}.0"
    val i0 = s"CAST(floor($p) AS INTEGER)"
    val b0 = s"CAST(arr[$i0 + 1] AS DOUBLE)"
    val b1 = s"CAST(arr[least($i0 + 1, len - 1) + 1] AS DOUBLE)"
    s"""WITH aud AS (
       |  SELECT doc_id, text FROM documents WHERE source = 'src1'),
       |probes AS (SELECT doc_id, text FROM aud ORDER BY doc_id LIMIT 2),
       |corpus AS (
       |  SELECT doc_id, text FROM aud
       |  UNION ALL SELECT doc_id + 1000000000, text FROM probes
       |  UNION ALL SELECT doc_id + 2000000000, 'X' || substr(text, 2) FROM probes),
       |a AS (
       |  SELECT doc_id, list_transform(split(text, ''), c -> ascii(c)) AS arr,
       |         length(text) AS len
       |  FROM corpus WHERE length(text) > 0),
       |g AS (SELECT doc_id, arr, len, CAST(unnest(range($S)) AS INTEGER) AS t FROM a),
       |e AS (
       |  SELECT doc_id, CAST(t AS BIGINT) AS i,
       |         CASE WHEN len = 1 THEN CAST(arr[1] AS DOUBLE)
       |              ELSE $b0 + ($b1 - $b0) * ($p - floor($p)) END AS e
       |  FROM g),
       |bits AS (
       |  SELECT a.doc_id, a.i AS bit,
       |         CASE WHEN b.e > a.e THEN 1 ELSE 0 END AS bv
       |  FROM e a JOIN e b ON b.doc_id = a.doc_id AND b.i = a.i + 1
       |  WHERE a.i < ${FpFrames - 1}),
       |sig AS (
       |  SELECT doc_id,
       |         CAST(sum(CASE WHEN bit // 8 = 0 THEN bv * (1::BIGINT << (bit % 8)) ELSE 0 END) AS BIGINT) AS c0,
       |         CAST(sum(CASE WHEN bit // 8 = 1 THEN bv * (1::BIGINT << (bit % 8)) ELSE 0 END) AS BIGINT) AS c1,
       |         CAST(sum(CASE WHEN bit // 8 = 2 THEN bv * (1::BIGINT << (bit % 8)) ELSE 0 END) AS BIGINT) AS c2,
       |         CAST(sum(CASE WHEN bit // 8 = 3 THEN bv * (1::BIGINT << (bit % 8)) ELSE 0 END) AS BIGINT) AS c3
       |  FROM bits GROUP BY 1),
       |chunks AS (
       |  SELECT doc_id, ci, cv FROM (
       |    SELECT doc_id, u.ci,
       |           CASE u.ci WHEN 0 THEN c0 WHEN 1 THEN c1 WHEN 2 THEN c2 ELSE c3 END AS cv,
       |           row_number() OVER (
       |             PARTITION BY u.ci,
       |               CASE u.ci WHEN 0 THEN c0 WHEN 1 THEN c1 WHEN 2 THEN c2 ELSE c3 END
       |             ORDER BY doc_id) AS rn
       |    FROM sig CROSS JOIN (SELECT CAST(unnest(range(4)) AS INTEGER) AS ci) u) t
       |  WHERE rn <= ${DedupQueries.MaxBucket}),
       |cand AS (
       |  SELECT DISTINCT a.doc_id AS a_id, b.doc_id AS b_id
       |  FROM chunks a JOIN chunks b
       |    ON a.ci = b.ci AND a.cv = b.cv AND a.doc_id < b.doc_id)
       |SELECT c.a_id, c.b_id,
       |       CAST(bit_count(xor(x.c0, y.c0)) + bit_count(xor(x.c1, y.c1))
       |          + bit_count(xor(x.c2, y.c2)) + bit_count(xor(x.c3, y.c3)) AS BIGINT) AS hamming
       |FROM cand c JOIN sig x ON x.doc_id = c.a_id JOIN sig y ON y.doc_id = c.b_id
       |WHERE bit_count(xor(x.c0, y.c0)) + bit_count(xor(x.c1, y.c1))
       |    + bit_count(xor(x.c2, y.c2)) + bit_count(xor(x.c3, y.c3)) <= 3
       |ORDER BY a_id, b_id""".stripMargin
  }

  // --------------------- u26 join-cardinality estimation audit

  /** Heavy hitters taken per side for the hybrid estimator. */
  val EstTopH = 5

  /** The audited join edges: (name, left table, left key, right table,
    * right key). The self-join edge is where the uniform estimator
    * breaks hardest (quadratic in per-key multiplicity). */
  val EstEdges: Seq[(String, String, String, String, String)] = Seq(
    ("events_self_user", "events", "user_id", "events", "user_id"),
    ("lineitem_orders", "lineitem", "l_orderkey", "orders", "o_orderkey"),
    ("orders_customer", "orders", "o_custkey", "customer", "c_custkey"))

  /** u26: join-cardinality estimation audit — the textbook uniform
    * estimate |R⋈S| ≈ |R|·|S|/max(ndv_R, ndv_S) and the heavy-hitter
    * hybrid (exact top-[[EstTopH]] key products + uniform tail) graded
    * against the TRUE join size, per declared edge. This is the
    * optimizer-statistics quality loop an engine runs on its own
    * stats: u17 profiles fan-out, u21/u22 audit layout; u26 closes the
    * triangle by measuring how far the standard cardinality formulas
    * drift on real key distributions — the number that decides whether
    * a planner's join ordering can be trusted (and the self-join edge
    * shows the uniform formula's known quadratic failure mode).
    *
    * Exactness: the true join size is Σ_k c_R(k)·c_S(k) computed from
    * the two key HISTOGRAMS (exact integers — no row join needed);
    * estimates are one rounded division each (numerators < 2^53 at
    * these SFs; at 100 TB the same audit runs per-partition);
    * relative errors are one rounded expression per row.
    * Scale shape: per edge two keyed histogram aggregations, two
    * TakeOrderedAndProject top-H passes, and histogram-sized joins —
    * the fact tables are touched once each. */
  private val u26: Fn = (s, d) => {
    def table(n: String): DataFrame = n match {
      case "events" => Tables.events(s, d)
      case "lineitem" => Tables.lineitem(s, d)
      case "orders" => Tables.orders(s, d)
      case "customer" => Tables.customer(s, d)
    }
    EstEdges.map { case (name, lt, lk, rt, rk) =>
      val hl = table(lt).groupBy(col(lk).as("k")).agg(count(lit(1)).as("c"))
      val hr = table(rt).groupBy(col(rk).as("k")).agg(count(lit(1)).as("c"))
      val sl = hl.agg(sum(col("c")).cast(LongType).as("n_l"),
        count(lit(1)).cast(LongType).as("ndv_l"))
      val sr = hr.agg(sum(col("c")).cast(LongType).as("n_r"),
        count(lit(1)).cast(LongType).as("ndv_r"))
      val topKeys = hl.orderBy(desc("c"), col("k")).limit(EstTopH).select("k")
        .union(hr.orderBy(desc("c"), col("k")).limit(EstTopH).select("k")).distinct()
      val topStats = topKeys
        .join(hl.select(col("k"), col("c").as("cl")), Seq("k"), "left")
        .join(hr.select(col("k"), col("c").as("cr")), Seq("k"), "left")
        // dec-lift (overflow lint): per-key frequency products fit in
        // long; the cross-key sums accumulate in DECIMAL(38,0)
        .agg(coalesce(sum((col("cl") * col("cr")).cast(DecimalType(38, 0))), lit(0L))
          .cast(LongType).as("exact_part"),
          coalesce(sum(col("cl")), lit(0L)).cast(LongType).as("top_cl"),
          coalesce(sum(col("cr")), lit(0L)).cast(LongType).as("top_cr"),
          count(col("cl")).cast(LongType).as("k_l"),
          count(col("cr")).cast(LongType).as("k_r"))
      val act = hl.join(hr.select(col("k"), col("c").as("cr")), Seq("k"))
        .agg(coalesce(sum((col("c") * col("cr")).cast(DecimalType(38, 0))), lit(0L))
          .cast(LongType).as("actual"))
      sl.crossJoin(sr).crossJoin(broadcast(topStats)).crossJoin(broadcast(act))
        .withColumn("edge", lit(name))
        .withColumn("est_uniform",
          round(col("n_l").cast(DoubleType) * col("n_r") /
            greatest(col("ndv_l"), col("ndv_r"))).cast(LongType))
        .withColumn("est_hybrid", (col("exact_part") +
          when(greatest(col("ndv_l") - col("k_l"), col("ndv_r") - col("k_r")) > 0,
            round((col("n_l") - col("top_cl")).cast(DoubleType) * (col("n_r") - col("top_cr")) /
              greatest(col("ndv_l") - col("k_l"), col("ndv_r") - col("k_r"))).cast(LongType))
            .otherwise(0L)).cast(LongType))
        .withColumn("err_uniform",
          round((col("est_uniform") - col("actual")).cast(DoubleType) / col("actual"), 4))
        .withColumn("err_hybrid",
          round((col("est_hybrid") - col("actual")).cast(DoubleType) / col("actual"), 4))
        .select("edge", "n_l", "ndv_l", "n_r", "ndv_r", "actual",
          "est_uniform", "est_hybrid", "err_uniform", "err_hybrid")
    }.reduce(_ unionByName _).orderBy("edge")
  }

  private def u26Sql: String = {
    val arms = EstEdges.map { case (name, lt, lk, rt, rk) =>
      s"""SELECT '$name' AS edge, sl.n_l, sl.ndv_l, sr.n_r, sr.ndv_r, act.actual,
         |  CAST(round(CAST(sl.n_l AS DOUBLE) * sr.n_r / greatest(sl.ndv_l, sr.ndv_r), 0) AS BIGINT) AS est_uniform,
         |  CAST(ts.exact_part + CASE
         |    WHEN greatest(sl.ndv_l - ts.k_l, sr.ndv_r - ts.k_r) > 0
         |    THEN CAST(round(CAST(sl.n_l - ts.top_cl AS DOUBLE) * (sr.n_r - ts.top_cr)
         |                    / greatest(sl.ndv_l - ts.k_l, sr.ndv_r - ts.k_r), 0) AS BIGINT)
         |    ELSE 0 END AS BIGINT) AS est_hybrid,
         |  round(CAST(CAST(round(CAST(sl.n_l AS DOUBLE) * sr.n_r / greatest(sl.ndv_l, sr.ndv_r), 0) AS BIGINT)
         |             - act.actual AS DOUBLE) / act.actual, 4) AS err_uniform,
         |  round(CAST(ts.exact_part + CASE
         |    WHEN greatest(sl.ndv_l - ts.k_l, sr.ndv_r - ts.k_r) > 0
         |    THEN CAST(round(CAST(sl.n_l - ts.top_cl AS DOUBLE) * (sr.n_r - ts.top_cr)
         |                    / greatest(sl.ndv_l - ts.k_l, sr.ndv_r - ts.k_r), 0) AS BIGINT)
         |    ELSE 0 END - act.actual AS DOUBLE) / act.actual, 4) AS err_hybrid
         |FROM
         |  (SELECT CAST(sum(c) AS BIGINT) AS n_l, CAST(count(*) AS BIGINT) AS ndv_l
         |   FROM (SELECT $lk AS k, count(*) AS c FROM $lt GROUP BY 1)) sl,
         |  (SELECT CAST(sum(c) AS BIGINT) AS n_r, CAST(count(*) AS BIGINT) AS ndv_r
         |   FROM (SELECT $rk AS k, count(*) AS c FROM $rt GROUP BY 1)) sr,
         |  (SELECT CAST(COALESCE(sum(l.c * r.c), 0) AS BIGINT) AS exact_part,
         |          CAST(COALESCE(sum(l.c), 0) AS BIGINT) AS top_cl,
         |          CAST(COALESCE(sum(r.c), 0) AS BIGINT) AS top_cr,
         |          CAST(count(l.c) AS BIGINT) AS k_l, CAST(count(r.c) AS BIGINT) AS k_r
         |   FROM (SELECT k FROM (SELECT $lk AS k, count(*) AS c FROM $lt GROUP BY 1
         |                        ORDER BY c DESC, k LIMIT $EstTopH)
         |         UNION
         |         SELECT k FROM (SELECT $rk AS k, count(*) AS c FROM $rt GROUP BY 1
         |                        ORDER BY c DESC, k LIMIT $EstTopH)) t
         |   LEFT JOIN (SELECT $lk AS k, count(*) AS c FROM $lt GROUP BY 1) l ON l.k = t.k
         |   LEFT JOIN (SELECT $rk AS k, count(*) AS c FROM $rt GROUP BY 1) r ON r.k = t.k) ts,
         |  (SELECT CAST(COALESCE(sum(l.c * r.c), 0) AS BIGINT) AS actual
         |   FROM (SELECT $lk AS k, count(*) AS c FROM $lt GROUP BY 1) l
         |   JOIN (SELECT $rk AS k, count(*) AS c FROM $rt GROUP BY 1) r ON l.k = r.k) act""".stripMargin
    }
    arms.mkString("", "\nUNION ALL\n", "\nORDER BY edge")
  }

  val all: Seq[Q] = Seq(
    Q("m19_audio_fingerprint", m19, Some(m19Sql)),
    Q("u26_join_estimate", u26, Some(u26Sql)))
}
