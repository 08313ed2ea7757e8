package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.apache.spark.sql.expressions.Window
import graft.Tables
import graft.queries.Relational.{Fn, Q}

/** Text-analysis operators over the `documents` table — the language-ID /
  * quality-scoring / token-counting / fingerprinting layer a training-data
  * pipeline needs (BASELINE.json north star). Everything is built-in
  * string/array functions (codegen'd, shuffle only where an aggregation
  * demands it), so the same plans run at 100 TB with filters and column
  * pruning pushed to the scan.
  *
  * Oracle parity notes: token ops assume the fixture's single-space
  * tokenization (verified: no leading/trailing/double spaces); tf-idf uses
  * ln() whose last-ulp may differ across libm implementations, so scores
  * are rounded to 4dp before use in ordering with a total tiebreaker.
  */
object TextQueries {

  private def docs(s: SparkSession, d: String) = Tables.documents(s, d)

  private val toks: Column = split(col("text"), " ")

  /** Per-document token/char statistics. avg word length is derived from
    * (chars - spaces) / tokens so both engines do the identical double
    * division. */
  private val t01: Fn = (s, d) =>
    docs(s, d).select(
      col("doc_id"),
      size(toks).cast(LongType).as("n_tokens"),
      size(array_distinct(toks)).cast(LongType).as("n_distinct"),
      length(col("text")).cast(LongType).as("n_chars_computed"),
      ((length(col("text")) - (size(toks) - 1)).cast(DoubleType) / size(toks).cast(DoubleType)).as("avg_word_len"))
      .orderBy("doc_id")
  private val t01Sql =
    """SELECT doc_id,
      |  CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens,
      |  CAST(len(list_distinct(string_split(text, ' '))) AS BIGINT) AS n_distinct,
      |  CAST(length(text) AS BIGINT) AS n_chars_computed,
      |  CAST(length(text) - (len(string_split(text, ' ')) - 1) AS DOUBLE)
      |    / CAST(len(string_split(text, ' ')) AS DOUBLE) AS avg_word_len
      |FROM documents ORDER BY doc_id""".stripMargin

  /** Grouped corpus statistics per language label. */
  private val t02: Fn = (s, d) =>
    docs(s, d).groupBy(col("lang"))
      .agg(
        count(lit(1)).as("n_docs"),
        sum(col("n_chars")).as("total_chars"),
        (sum(col("n_chars")).cast(DoubleType) / count(lit(1))).as("avg_chars"),
        countDistinct(col("source")).as("n_sources"))
      .orderBy("lang")
  private val t02Sql =
    """SELECT lang, count(*) AS n_docs, CAST(sum(n_chars) AS BIGINT) AS total_chars,
      |  CAST(sum(n_chars) AS DOUBLE) / count(*) AS avg_chars,
      |  count(DISTINCT source) AS n_sources
      |FROM documents GROUP BY lang ORDER BY lang""".stripMargin

  /** Corpus-wide token frequency top-K (explode → count → top-k; at scale
    * this is the classic word-count shuffle with map-side partial agg). */
  private val t03: Fn = (s, d) =>
    docs(s, d).select(explode(toks).as("token"))
      .groupBy("token").agg(count(lit(1)).as("n"))
      .orderBy(desc("n"), col("token")).limit(20)
  private val t03Sql =
    """SELECT token, count(*) AS n
      |FROM (SELECT unnest(string_split(text, ' ')) AS token FROM documents) t
      |GROUP BY token ORDER BY n DESC, token LIMIT 20""".stripMargin

  /** tf-idf: top-3 terms per document (first 20 docs to keep the oracle
    * output small). tf and df are exact integers; idf = ln(N/df) with the
    * corpus size read from the table itself (sf-dependent). */
  private val t04: Fn = (s, d) => {
    val dd = docs(s, d)
    // corpus size for idf as a 1-row broadcast (not a driver-side count():
    // that would be a separate eager job and break composability over
    // frames); the oracle uses the matching scalar subquery
    val tot = dd.agg(count(lit(1)).cast(DoubleType).as("corpus_n"))
    val tf = dd.select(col("doc_id"), explode(toks).as("term"))
      .groupBy("doc_id", "term").agg(count(lit(1)).as("tf"))
    val df = tf.groupBy("term").agg(count(lit(1)).as("df"))
    val scored = tf.join(df, "term").crossJoin(broadcast(tot))
      .withColumn("tfidf", round(col("tf") * log(col("corpus_n") / col("df")), 4))
    val w = Window.partitionBy(col("doc_id")).orderBy(desc("tfidf"), col("term"))
    scored.withColumn("rk", row_number().over(w).cast(LongType))
      .filter(col("rk") <= 3 && col("doc_id") < 20)
      .select("doc_id", "term", "tfidf", "rk")
      .orderBy("doc_id", "rk")
  }
  private val t04Sql =
    """WITH tf AS (
      |  SELECT doc_id, term, count(*) AS tf
      |  FROM (SELECT doc_id, unnest(string_split(text, ' ')) AS term FROM documents) t
      |  GROUP BY doc_id, term),
      |df AS (SELECT term, count(*) AS df FROM tf GROUP BY term),
      |scored AS (
      |  SELECT tf.doc_id, tf.term,
      |         round(tf.tf * ln(CAST((SELECT count(*) FROM documents) AS DOUBLE) / df.df), 4) AS tfidf
      |  FROM tf JOIN df ON tf.term = df.term),
      |ranked AS (
      |  SELECT doc_id, term, tfidf,
      |         row_number() OVER (PARTITION BY doc_id ORDER BY tfidf DESC, term) AS rk
      |  FROM scored)
      |SELECT doc_id, term, tfidf, rk FROM ranked
      |WHERE rk <= 3 AND doc_id < 20 ORDER BY doc_id, rk""".stripMargin

  private val stopwords = Seq("the", "a", "of", "and", "to", "in", "is")

  /** The combined 6dp quality score alone — shared with p14's
    * curriculum binning. */
  private[queries] def qualityScore: Column = {
    val nTok = size(toks).cast(DoubleType)
    val stopCount = size(filter(toks, t => t.isInCollection(stopwords))).cast(DoubleType)
    val punct = (length(col("text")) - length(regexp_replace(col("text"), "[^a-z0-9 ]", ""))).cast(DoubleType)
    val lenScore = least(col("n_chars").cast(DoubleType) / lit(1000.0), lit(1.0))
    round(lit(0.5) * lenScore + lit(0.5) * (stopCount / nTok)
      - lit(0.25) * (punct / length(col("text")).cast(DoubleType)), 6)
  }

  /** The same score as DuckDB SQL text (interpolated into oracle SQL). */
  private[queries] def qualityScoreSql: String = {
    val set = stopwords.map(w => s"'$w'").mkString(", ")
    s"""round(0.5 * least(CAST(n_chars AS DOUBLE) / 1000.0, 1.0)
       |      + 0.5 * (CAST(len(list_filter(string_split(text, ' '), t -> t IN ($set))) AS DOUBLE)
       |               / CAST(len(string_split(text, ' ')) AS DOUBLE))
       |      - 0.25 * (CAST(length(text) - length(regexp_replace(text, '[^a-z0-9 ]', '', 'g')) AS DOUBLE)
       |                / CAST(length(text) AS DOUBLE)), 6)""".stripMargin
  }

  /** Quality scoring: length / punctuation-ratio / stopword-ratio
    * heuristics combined into one score (identical double arithmetic on
    * both sides). */
  private val t05: Fn = (s, d) => {
    val nTok = size(toks).cast(DoubleType)
    val stopCount = size(filter(toks, t => t.isInCollection(stopwords))).cast(DoubleType)
    val punct = (length(col("text")) - length(regexp_replace(col("text"), "[^a-z0-9 ]", ""))).cast(DoubleType)
    val lenScore = least(col("n_chars").cast(DoubleType) / lit(1000.0), lit(1.0))
    val stopRatio = stopCount / nTok
    val punctRatio = punct / length(col("text")).cast(DoubleType)
    docs(s, d).select(
      col("doc_id"),
      round(lenScore, 6).as("len_score"),
      round(stopRatio, 6).as("stop_ratio"),
      round(punctRatio, 6).as("punct_ratio"),
      qualityScore.as("quality"))
      .orderBy("doc_id")
  }
  private val t05Sql = {
    val set = stopwords.map(w => s"'$w'").mkString(", ")
    s"""SELECT doc_id,
       |  round(least(CAST(n_chars AS DOUBLE) / 1000.0, 1.0), 6) AS len_score,
       |  round(CAST(len(list_filter(string_split(text, ' '), t -> t IN ($set))) AS DOUBLE)
       |        / CAST(len(string_split(text, ' ')) AS DOUBLE), 6) AS stop_ratio,
       |  round(CAST(length(text) - length(regexp_replace(text, '[^a-z0-9 ]', '', 'g')) AS DOUBLE)
       |        / CAST(length(text) AS DOUBLE), 6) AS punct_ratio,
       |  round(0.5 * least(CAST(n_chars AS DOUBLE) / 1000.0, 1.0)
       |      + 0.5 * (CAST(len(list_filter(string_split(text, ' '), t -> t IN ($set))) AS DOUBLE)
       |               / CAST(len(string_split(text, ' ')) AS DOUBLE))
       |      - 0.25 * (CAST(length(text) - length(regexp_replace(text, '[^a-z0-9 ]', '', 'g')) AS DOUBLE)
       |                / CAST(length(text) AS DOUBLE)), 6) AS quality
       |FROM documents ORDER BY doc_id""".stripMargin
  }

  /** Document fingerprinting: exact content hash + order-insensitive
    * bag-of-words hash (the dedup key for reordered near-copies). */
  private val t06: Fn = (s, d) =>
    docs(s, d).select(
      col("doc_id"),
      md5(col("text")).as("content_fp"),
      md5(array_join(array_sort(array_distinct(toks)), " ")).as("bow_fp"))
      .orderBy("doc_id")
  private val t06Sql =
    """SELECT doc_id, md5(text) AS content_fp,
      |  md5(array_to_string(list_sort(list_distinct(string_split(text, ' '))), ' ')) AS bow_fp
      |FROM documents ORDER BY doc_id""".stripMargin

  private[queries] val langStops: Seq[(String, Seq[String])] = Seq(
    "en" -> Seq("the", "and", "of", "to", "in"),
    "es" -> Seq("el", "la", "de", "que", "y"),
    "de" -> Seq("der", "die", "und", "das", "ist"),
    "fr" -> Seq("le", "la", "les", "et", "des"))

  /** t07's stopword-voting guess as a standalone expression over `text`
    * (shared with t22's confusion matrix). Same precedence CASE as t07;
    * the counts are inlined rather than materialized as columns. */
  private[queries] def langGuessCol: Column = {
    val m = langStops.toMap
    def cnt(ws: Seq[String]) = size(filter(toks, t => t.isInCollection(ws)))
    val (en, es, de, fr) = (cnt(m("en")), cnt(m("es")), cnt(m("de")), cnt(m("fr")))
    when(es >= en && es >= de && es >= fr, "es")
      .when(de >= en && de >= fr, "de")
      .when(fr >= en, "fr")
      .otherwise("en")
  }

  /** DuckDB twin of [[langGuessCol]]. */
  private[queries] def langGuessSqlExpr: String = {
    def cnt(ws: Seq[String]) = {
      val set = ws.map(w => s"'$w'").mkString(", ")
      s"len(list_filter(string_split(text, ' '), t -> t IN ($set)))"
    }
    val m = langStops.toMap
    val (en, es, de, fr) = (cnt(m("en")), cnt(m("es")), cnt(m("de")), cnt(m("fr")))
    s"""CASE WHEN $es >= $en AND $es >= $de AND $es >= $fr THEN 'es'
       |     WHEN $de >= $en AND $de >= $fr THEN 'de'
       |     WHEN $fr >= $en THEN 'fr'
       |     ELSE 'en' END""".stripMargin
  }

  /** Language-ID heuristic: stopword voting with a fixed precedence CASE.
    * (The fixture text is synthetic shared-vocab soup, so the interesting
    * property is determinism + operator shape, not linguistic accuracy.) */
  private val t07: Fn = (s, d) => {
    val counts = langStops.map { case (l, ws) =>
      size(filter(toks, t => t.isInCollection(ws))).cast(IntegerType).as(s"c_$l")
    }
    val withCounts = docs(s, d).select(col("doc_id") +: counts: _*)
    val guess =
      when(col("c_es") >= col("c_en") && col("c_es") >= col("c_de") && col("c_es") >= col("c_fr"), "es")
        .when(col("c_de") >= col("c_en") && col("c_de") >= col("c_fr"), "de")
        .when(col("c_fr") >= col("c_en"), "fr")
        .otherwise("en")
    withCounts.withColumn("lang_guess", guess)
      .orderBy("doc_id")
  }
  private val t07Sql = {
    def cnt(ws: Seq[String]) = {
      val set = ws.map(w => s"'$w'").mkString(", ")
      s"CAST(len(list_filter(string_split(text, ' '), t -> t IN ($set))) AS INTEGER)"
    }
    val m = langStops.toMap
    s"""SELECT doc_id,
       |  ${cnt(m("en"))} AS c_en, ${cnt(m("es"))} AS c_es,
       |  ${cnt(m("de"))} AS c_de, ${cnt(m("fr"))} AS c_fr,
       |  CASE WHEN ${cnt(m("es"))} >= ${cnt(m("en"))} AND ${cnt(m("es"))} >= ${cnt(m("de"))} AND ${cnt(m("es"))} >= ${cnt(m("fr"))} THEN 'es'
       |       WHEN ${cnt(m("de"))} >= ${cnt(m("en"))} AND ${cnt(m("de"))} >= ${cnt(m("fr"))} THEN 'de'
       |       WHEN ${cnt(m("fr"))} >= ${cnt(m("en"))} THEN 'fr'
       |       ELSE 'en' END AS lang_guess
       |FROM documents ORDER BY doc_id""".stripMargin
  }

  /** BPE-ish token counting: a simplified GPT-style pre-tokenizer regex
    * (letter runs / single digits / punctuation) alongside whitespace
    * tokens — the LLM-cost-estimation counter. */
  private val t08: Fn = (s, d) =>
    docs(s, d).select(
      col("doc_id"),
      size(split(col("text"), " ")).cast(LongType).as("ws_tokens"),
      size(regexp_extract_all(col("text"), lit("[a-z]+|[0-9]|[^a-z0-9 ]"), lit(0)))
        .cast(LongType).as("bpe_tokens"))
      .orderBy("doc_id")
  private val t08Sql =
    """SELECT doc_id,
      |  CAST(len(string_split(text, ' ')) AS BIGINT) AS ws_tokens,
      |  CAST(len(regexp_extract_all(text, '[a-z]+|[0-9]|[^a-z0-9 ]')) AS BIGINT) AS bpe_tokens
      |FROM documents ORDER BY doc_id""".stripMargin

  /** Rolling polynomial fingerprint over the first 64 chars (modular, so
    * overflow-free in both engines): the shift-friendly hash family used
    * for chunk-boundary detection in content-defined chunking. */
  private val t09: Fn = (s, d) =>
    docs(s, d).select(
      col("doc_id"),
      aggregate(
        transform(split(substring(col("text"), 1, 64), ""), c => ascii(c).cast(LongType)),
        lit(0L), (acc, c) => (acc * 31 + c) % 1000000007L).as("rolling_fp"))
      .orderBy("doc_id")
  private val t09Sql =
    """SELECT doc_id,
      |  list_reduce(
      |    list_prepend(CAST(0 AS BIGINT),
      |      list_transform(split(substr(text, 1, 64), ''), c -> CAST(ascii(c) AS BIGINT))),
      |    (acc, c) -> (acc * 31 + c) % 1000000007) AS rolling_fp
      |FROM documents ORDER BY doc_id""".stripMargin

  /** t11: boilerplate exposure per document — the fraction of a doc's
    * 5-gram shingles shared by ≥3 documents — C4-style boilerplate
    * removal at shingle level. (Production corpora use a relative cut,
    * e.g. df > 0.1%·N; this fixture's df tops out at 4 regardless of
    * scale factor, so the operator pins the absolute form.) Downstream, docs
    * above a boilerplate threshold are dropped or stripped; the operator
    * reports the per-doc fraction plus the flag. ONE full-width keyed
    * shuffle (shingle df): per-doc shingle counts come free from
    * `size(shingles)` (shingles are distinct within a doc), and the
    * per-doc regroup runs only over HOT-matched rows — a left-semi join
    * against the small hot set (AQE converts it to broadcast at
    * runtime) followed by an aggregation of the few survivors. The
    * earlier shape regrouped the entire exploded shingle set a second
    * time; at corpus scale that second 100 TB-wide string shuffle is
    * the whole cost. Integer-ratio double division for parity. */
  private val t11: Fn = (s, d) => {
    val shd = DedupQueries.shingled(s, d)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val ex = shd.select(col("doc_id"), explode(col("shingles")).as("sg"))
    val hot = ex.groupBy("sg").agg(count(lit(1)).as("df"))
      .filter(col("df") >= 3)
      .select(col("sg"))
    val hotPerDoc = ex.join(hot, Seq("sg"), "left_semi")
      .groupBy("doc_id").agg(count(lit(1)).as("n_hot"))
    shd.select(col("doc_id"), size(col("shingles")).cast(LongType).as("n_shingles"))
      .join(hotPerDoc, Seq("doc_id"), "left")
      .withColumn("n_hot", coalesce(col("n_hot"), lit(0L)))
      .withColumn("boilerplate_frac",
        col("n_hot").cast(DoubleType) / col("n_shingles").cast(DoubleType))
      .withColumn("flagged", col("boilerplate_frac") > 0.5)
      .select("doc_id", "n_shingles", "n_hot", "boilerplate_frac", "flagged")
      .orderBy("doc_id")
  }
  private val t11Sql =
    """WITH sh AS (
      |  SELECT doc_id,
      |         unnest(list_distinct(list_transform(range(1, len(w) - 3),
      |                i -> array_to_string(w[i:i+4], ' ')))) AS sg
      |  FROM (SELECT doc_id, string_split(text, ' ') AS w FROM documents)
      |  WHERE len(w) >= 5),
      |hot AS (
      |  SELECT sg FROM sh GROUP BY sg
      |  HAVING count(*) >= 3)
      |SELECT s.doc_id, count(*) AS n_shingles,
      |       CAST(sum(CASE WHEN h.sg IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_hot,
      |       CAST(sum(CASE WHEN h.sg IS NOT NULL THEN 1 ELSE 0 END) AS DOUBLE) / count(*) AS boilerplate_frac,
      |       (CAST(sum(CASE WHEN h.sg IS NOT NULL THEN 1 ELSE 0 END) AS DOUBLE) / count(*)) > 0.5 AS flagged
      |FROM sh s LEFT JOIN hot h USING (sg)
      |GROUP BY s.doc_id ORDER BY s.doc_id""".stripMargin

  // ---------------------------------------------------- t12 PII redaction

  /** PII redaction cascade — scrub emails, IPv4s, and phone numbers with
    * anchored regex classes before a corpus ships to training. The
    * fixture corpus contains no PII, so a deterministic synthetic tail
    * (email + IP + phone derived from doc_id) is appended first; the
    * redaction then runs on the combined text. Pure per-row regex work:
    * codegen'd, no shuffle, scales as a map-only stage. Output pins the
    * per-class match counts and the md5 of the scrubbed text, so a
    * pattern regression (missed or over-eager redaction) flips the hash.
    * Regex subset chosen to behave identically in Java regex and RE2
    * (character classes + bounded quantifiers; no lookaround). */
  /** The three PII patterns (shared with the spec so idempotence can be
    * asserted on the actual cascade, not a re-typed copy). */
  val piiPatterns: Seq[(String, String)] = Seq(
    "[a-z0-9._%]+@[a-z0-9.-]+\\.[a-z]{2,}" -> "<EMAIL>",
    "10\\.0\\.[0-9]{1,3}\\.[0-9]{1,3}" -> "<IP>",
    "555-[0-9]{4}" -> "<PHONE>")

  /** Applies the full redaction cascade to a text column. */
  def redact(c: Column): Column =
    piiPatterns.foldLeft(c) { case (acc, (pat, rep)) => regexp_replace(acc, pat, rep) }

  /** documents with the deterministic synthetic PII tail appended. */
  def withSyntheticPii(s: SparkSession, d: String): DataFrame =
    docs(s, d)
      .select(col("doc_id"),
        concat(col("text"),
          lit(" contact user"), col("doc_id").cast(StringType),
          lit("@example.com or 10.0."),
          (col("doc_id") % 256).cast(StringType), lit("."),
          expr("(doc_id DIV 256) % 256").cast(StringType),
          lit(" tel 555-"),
          lpad((col("doc_id") % 10000).cast(StringType), 4, "0")).as("raw"))

  private val t12: Fn = (s, d) =>
    withSyntheticPii(s, d)
      .select(col("doc_id"),
        size(regexp_extract_all(col("raw"),
          lit(piiPatterns(0)._1), lit(0))).cast(LongType).as("n_emails"),
        size(regexp_extract_all(col("raw"),
          lit(piiPatterns(1)._1), lit(0))).cast(LongType).as("n_ips"),
        size(regexp_extract_all(col("raw"),
          lit(piiPatterns(2)._1), lit(0))).cast(LongType).as("n_phones"),
        md5(redact(col("raw"))).as("redacted_fp"))
      .orderBy("doc_id")
  private val t12Sql =
    """WITH raw AS (
      |  SELECT doc_id,
      |    concat(text, ' contact user', CAST(doc_id AS VARCHAR),
      |           '@example.com or 10.0.', CAST(doc_id % 256 AS VARCHAR), '.',
      |           CAST((doc_id // 256) % 256 AS VARCHAR),
      |           ' tel 555-', lpad(CAST(doc_id % 10000 AS VARCHAR), 4, '0')) AS raw
      |  FROM documents)
      |SELECT doc_id,
      |  CAST(len(regexp_extract_all(raw, '[a-z0-9._%]+@[a-z0-9.-]+\.[a-z]{2,}')) AS BIGINT) AS n_emails,
      |  CAST(len(regexp_extract_all(raw, '10\.0\.[0-9]{1,3}\.[0-9]{1,3}')) AS BIGINT) AS n_ips,
      |  CAST(len(regexp_extract_all(raw, '555-[0-9]{4}')) AS BIGINT) AS n_phones,
      |  md5(regexp_replace(regexp_replace(regexp_replace(raw,
      |    '[a-z0-9._%]+@[a-z0-9.-]+\.[a-z]{2,}', '<EMAIL>', 'g'),
      |    '10\.0\.[0-9]{1,3}\.[0-9]{1,3}', '<IP>', 'g'),
      |    '555-[0-9]{4}', '<PHONE>', 'g')) AS redacted_fp
      |FROM raw ORDER BY doc_id""".stripMargin

  /** t13: heavy hitters — tokens with count > n/200 — in the production
    * two-pass shape: (1) a bounded-memory Misra-Gries sketch (capacity
    * 399 > 200, so NO true heavy hitter can be missed) reduces the
    * stream to ≤399 candidates; (2) one exact confirmation pass counts
    * only candidate tokens (the isin filter is map-side, the shuffle
    * carries ≤399 groups) and applies the threshold. The confirm pass
    * makes the output exact and deterministic at any partitioning —
    * which is what lets an approximate-sketch operator carry a full
    * DuckDB oracle. At 100 TB the sketch pass is one scan with ≤k
    * state per task; the naive alternative shuffles every distinct
    * token. The driver-side candidate set is ≤k rows by construction
    * (the same bounded-collect pattern as a k-means round). */
  private val t13: Fn = (s, d) => {
    val tok = docs(s, d).select(explode(toks).as("token"))
    val n = tok.count()
    val thr = n / 200L
    val cands = tok.agg(graft.functions.MisraGries.sketch(399)(col("token")).as("mg"))
      .head.getMap[String, Long](0).keys.toSeq
    tok.filter(col("token").isin(cands: _*))
      .groupBy("token").agg(count(lit(1)).as("n"))
      .filter(col("n") > thr)
      .orderBy(desc("n"), col("token"))
  }
  private val t13Sql =
    """WITH tok AS (SELECT unnest(string_split(text, ' ')) AS token FROM documents)
      |SELECT token, count(*) AS n FROM tok GROUP BY token
      |HAVING count(*) > (SELECT count(*) // 200 FROM tok)
      |ORDER BY n DESC, token""".stripMargin

  /** t14: unigram log-probability scoring — the shape of perplexity
    * filtering (score docs by how typical their tokens are under the
    * corpus's own unigram model; extreme scores = gibberish or
    * degenerate repetition). Two word-count-shaped shuffles (corpus
    * frequencies, per-doc regroup) + one frequency join the optimizer
    * is free to broadcast when the vocabulary is small. Parity: each
    * token's ln(count/total) is computed from identical exact integers
    * in both engines, truncated to 1e-9 fixed point BEFORE the per-doc
    * sum (t04/s07 ln-precedent), so summation order cannot move the
    * hash. */
  private val t14: Fn = (s, d) => {
    val tok = docs(s, d).select(col("doc_id"), explode(toks).as("token"))
    // corpus token total as a 1-row broadcast into the vocabulary-sized
    // freq relation (the p14/u13 cutoff idiom) — a driver-side count()
    // here would run a second corpus-sized job before the query starts
    val tot = tok.agg(count(lit(1)).cast(DoubleType).as("total"))
    val freq = tok.groupBy("token").agg(count(lit(1)).as("cnt"))
      .crossJoin(broadcast(tot))
    val lpFp = (log(col("cnt").cast(DoubleType) / col("total")) * 1e9).cast(LongType)
    tok.join(freq, "token")
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_tokens"), sum(lpFp).as("lp_fp"))
      .withColumn("avg_logp",
        round(col("lp_fp").cast(DoubleType) / 1e9 / col("n_tokens").cast(DoubleType), 4))
      .select("doc_id", "n_tokens", "avg_logp")
      .orderBy("doc_id")
  }
  private val t14Sql =
    """WITH tok AS (SELECT doc_id, unnest(string_split(text, ' ')) AS token FROM documents),
      |tot AS (SELECT CAST(count(*) AS DOUBLE) AS total FROM tok),
      |freq AS (SELECT token, count(*) AS cnt FROM tok GROUP BY token)
      |SELECT doc_id, count(*) AS n_tokens,
      |       round(CAST(sum(CAST(trunc(ln(CAST(cnt AS DOUBLE) / total) * 1e9) AS BIGINT)) AS DOUBLE)
      |             / 1e9 / count(*), 4) AS avg_logp
      |FROM tok JOIN freq USING (token), tot
      |GROUP BY doc_id ORDER BY doc_id""".stripMargin

  // --------------------------- t15 BPE merge mining (vocab induction)

  /** BPE tokenizer-vocabulary induction — the merge-mining loop that
    * turns a corpus into a subword vocabulary (Sennrich et al.,
    * ACL'16), as a distributed iterative trainer in the u02/s06 mold:
    * each round is one bigram-count aggregation over the distinct-word
    * table (weighted by word frequency), one tiny driver decision (the
    * best pair), and one map-only merge application; the corpus-sized
    * work happens once up front when documents collapse to distinct
    * words. Output: the merge table (round, lhs, rhs, pair_count) —
    * the artifact a tokenizer ships.
    *
    * Portability (this trainer is fully ORACLED — generated CTEs replay
    * every round):
    *  - pair counts are exact integer sums; the best pair breaks ties
    *    by (count desc, lhs, rhs) — total order in both engines;
    *  - self-pairs (lhs == rhs) are excluded: for distinct-symbol pairs
    *    exhaustive non-overlapping merging is CONFLUENT (occurrences
    *    are disjoint; merging one cannot create or destroy another), so
    *    any exhaustive strategy yields the same tokenization — a
    *    self-pair run like "a a a a a" is NOT confluent (leftmost-greedy
    *    and replace-scan bracket runs differently);
    *  - merges apply as 4 fixed `replace` passes of ' l r '→' lr ' on
    *    the padded char-sequence string; both engines resume scanning
    *    after the replacement, and 4 passes reach the exhaustive
    *    fixpoint for any alternation run the fixtures can hold
    *    (boundary-space sharing halves the remaining occurrences per
    *    pass). */
  val BpeRounds = 6

  /** The trainer body, factored so specs can drive a constructed corpus
    * (a DataFrame with a `text` column). Stops early when no two-symbol
    * pair with lhs != rhs remains — the SQL replay agrees because an
    * empty best-pair relation empties every later round's CTE. */
  private[queries] def bpeTrain(corpus: DataFrame, rounds: Int): DataFrame = {
    val s = corpus.sparkSession
    import s.implicits._
    val words = corpus
      .select(explode(split(col("text"), " ")).as("word"))
      .filter(length(col("word")) > 0)
      .groupBy("word").agg(count(lit(1)).as("cnt"))
      // (?s): '.' must match line terminators too — a word containing a
      // newline would otherwise keep it glued to the next char as one
      // bogus base symbol, diverging from the oracle's per-char split.
      // PORTABILITY BOUND: Java-regex '(.)' splits by CODE POINT while
      // the t15 oracle's string_split(text, '') splits by grapheme/
      // code-unit — identical only for single-code-unit text. The
      // documents fixture is ASCII; a non-BMP or combining character in
      // a future fixture would diverge silently. Normalize or filter to
      // single-byte symbols on both sides before lifting that bound.
      .select(concat(lit(" "), regexp_replace(col("word"), "(?s)(.)", "$1 ")).as("w"), col("cnt"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    var cur = words.select(col("w"), col("cnt"))
    val merges = scala.collection.mutable.ArrayBuffer[(Int, String, String, Long)]()
    var r = 1
    var exhausted = false
    while (r <= rounds && !exhausted) {
      val sp = split(trim(col("w")), " ")
      val bigrams = when(size(col("sp")) < 2, array().cast("array<struct<l:string,r:string>>"))
        .otherwise(transform(sequence(lit(1), size(col("sp")) - 1),
          i => struct(element_at(col("sp"), i).as("l"), element_at(col("sp"), i + 1).as("r"))))
      val top = cur.select(col("cnt"), sp.as("sp"))
        .select(col("cnt"), explode(bigrams).as("p"))
        .filter(col("p.l") =!= col("p.r"))
        .groupBy(col("p.l").as("l"), col("p.r").as("r"))
        .agg(sum(col("cnt")).as("pc"))
        .orderBy(desc("pc"), col("l"), col("r"))
        .limit(1).collect()
      if (top.isEmpty) exhausted = true
      else {
        val best = top.head
        val (l, rr) = (best.getString(0), best.getString(1))
        merges += ((r, l, rr, best.getLong(2)))
        val applied = (1 to 4).foldLeft(col("w"))((c, _) =>
          replace(c, lit(s" $l $rr "), lit(s" $l$rr ")))
        cur = cur.select(applied.as("w"), col("cnt"))
        r += 1
      }
    }
    words.unpersist()
    merges.toSeq.toDF("round", "lhs", "rhs", "pair_count")
      .select(col("round").cast(IntegerType).as("round"), col("lhs"), col("rhs"), col("pair_count"))
      .orderBy("round")
  }

  private val t15: Fn = (s, d) => bpeTrain(docs(s, d).select(col("text")), BpeRounds)

  /** The training-replay CTE block (w0 padded distinct words; per round
    * pR pair counts, bR best pair, wR merged words), shared by t15Sql
    * (emits the merge table) and t17Sql (applies it to the corpus). */
  private def bpeTrainCtes: String = {
    val rounds = (1 to BpeRounds).map { r =>
      s"""p$r AS (
         |  SELECT split_part(pair, ' ', 1) AS l, split_part(pair, ' ', 2) AS r,
         |         CAST(sum(cnt) AS BIGINT) AS pc
         |  FROM (SELECT cnt,
         |          unnest(list_transform(range(1, len(sp)), i -> sp[i] || ' ' || sp[i + 1])) AS pair
         |        FROM (SELECT cnt, string_split(trim(w), ' ') AS sp FROM w${r - 1}) s0) s
         |  WHERE split_part(pair, ' ', 1) <> split_part(pair, ' ', 2)
         |  GROUP BY 1, 2),
         |b$r AS (SELECT l, r, pc FROM p$r ORDER BY pc DESC, l, r LIMIT 1),
         |w$r AS (
         |  SELECT replace(replace(replace(replace(s.w, b.n, b.rp), b.n, b.rp), b.n, b.rp), b.n, b.rp) AS w,
         |         s.cnt
         |  FROM w${r - 1} s CROSS JOIN
         |       (SELECT ' ' || l || ' ' || r || ' ' AS n, ' ' || l || r || ' ' AS rp FROM b$r) b)""".stripMargin
    }
    s"""w0 AS (
       |  SELECT ' ' || array_to_string(string_split(word, ''), ' ') || ' ' AS w, cnt
       |  FROM (SELECT word, count(*) AS cnt
       |        FROM (SELECT unnest(string_split(text, ' ')) AS word FROM documents) t
       |        WHERE length(word) > 0 GROUP BY word) ww),
       |${rounds.mkString(",\n")}""".stripMargin
  }
  private val t15Sql: String = {
    val out = (1 to BpeRounds)
      .map(r => s"SELECT $r AS round, l AS lhs, r AS rhs, pc AS pair_count FROM b$r")
      .mkString("\nUNION ALL\n")
    s"""WITH $bpeTrainCtes
       |SELECT * FROM (
       |$out) m ORDER BY round""".stripMargin
  }

  /** t17: tokenizer APPLICATION — encode the corpus with the t15-trained
    * merge table, the deploy-side half of the BPE story: t15 mines the
    * vocabulary once; THIS is the op the pipeline then runs over every
    * shard to size sequences and price token budgets (p03 packing and
    * p04/p16 mixture budgets consume exactly these counts). Per word:
    * pad to the spaced char-sequence form, apply the merges IN TRAINING
    * ORDER (4 exhaustive replace passes each — t15's confluence/fixpoint
    * argument), count surviving symbols; per doc: words, chars, tokens,
    * and chars-per-token (the compression-ratio quality signal). Scale
    * shape: the merge table is a [[BpeRounds]]-row driver artifact
    * (trainer-argmax precedent) folded into the projection as LITERALS,
    * so the encode itself is a pure narrow map (codegen'd replace
    * chain, no shuffle, no join) + one keyed agg — at 100 TB the merges
    * come from the shipped tokenizer artifact and the cost is one scan.
    * Oracle: the shared training CTEs rebuild b1..bN; a LEFT JOIN +
    * CASE applies each round's merge so an early-exhausted bR leaves
    * text unchanged on both sides (the Spark fold just has fewer
    * rounds), never emptying the corpus. */
  private val t17: Fn = (s, d) =>
    bpeEncode(docs(s, d).select(col("doc_id"), col("text")), BpeRounds)

  /** The encode body, factored so specs can drive a constructed corpus
    * (a DataFrame with `doc_id` and `text`): train on the corpus, fold
    * the merge table into the projection, aggregate per document. */
  private[queries] def bpeEncode(corpus: DataFrame, rounds: Int): DataFrame = {
    val merges = bpeTrain(corpus.select(col("text")), rounds)
      .orderBy("round").collect().map(r => (r.getString(1), r.getString(2)))
    val words = corpus
      .select(col("doc_id"), explode(toks).as("word"))
      .filter(length(col("word")) > 0)
    val padded = concat(lit(" "), regexp_replace(col("word"), "(?s)(.)", "$1 "))
    val applied = merges.foldLeft(padded) { case (c, (l, r)) =>
      (1 to 4).foldLeft(c)((cc, _) => replace(cc, lit(s" $l $r "), lit(s" $l$r ")))
    }
    words.select(col("doc_id"), col("word"), applied.as("w"))
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_words"),
        sum(length(col("word"))).cast(LongType).as("n_chars"),
        sum(size(split(trim(col("w")), " "))).cast(LongType).as("n_tokens"))
      .withColumn("chars_per_token",
        round(col("n_chars").cast(DoubleType) / col("n_tokens").cast(DoubleType), 6))
      .select("doc_id", "n_words", "n_chars", "n_tokens", "chars_per_token")
      .orderBy("doc_id")
  }
  private def t17Sql: String = {
    val apply = (1 to BpeRounds).map { r =>
      s"""e$r AS (
         |  SELECT s.doc_id, s.word,
         |         CASE WHEN b.n IS NULL THEN s.w
         |              ELSE replace(replace(replace(replace(s.w, b.n, b.rp), b.n, b.rp), b.n, b.rp), b.n, b.rp) END AS w
         |  FROM e${r - 1} s LEFT JOIN
         |       (SELECT ' ' || l || ' ' || r || ' ' AS n, ' ' || l || r || ' ' AS rp FROM b$r) b ON TRUE)""".stripMargin
    }
    s"""WITH $bpeTrainCtes,
       |dw AS (
       |  SELECT doc_id, word
       |  FROM (SELECT doc_id, unnest(string_split(text, ' ')) AS word FROM documents) t
       |  WHERE length(word) > 0),
       |e0 AS (SELECT doc_id, word,
       |         ' ' || array_to_string(string_split(word, ''), ' ') || ' ' AS w FROM dw),
       |${apply.mkString(",\n")}
       |SELECT doc_id, count(*) AS n_words,
       |       CAST(sum(length(word)) AS BIGINT) AS n_chars,
       |       CAST(sum(len(string_split(trim(w), ' '))) AS BIGINT) AS n_tokens,
       |       round(CAST(sum(length(word)) AS DOUBLE) / CAST(sum(len(string_split(trim(w), ' '))) AS DOUBLE), 6) AS chars_per_token
       |FROM e$BpeRounds GROUP BY doc_id ORDER BY doc_id""".stripMargin
  }

  /** t16: interpolated bigram language-model scoring — the stronger
    * perplexity-style quality signal over t14's unigram: per bigram
    * position, ln(λ·P(cur|prev) + (1−λ)·P(cur)) with λ=0.7, averaged
    * per document. P(cur|prev) = bigram count / context count from the
    * corpus itself (self-scoring, as t14). Scale shape: ONE window
    * shuffle builds the bigram stream (lag over doc position), the
    * three frequency relations are keyed partial-agg'd shuffles
    * (broadcastable at vocabulary size), and the per-doc mean is a
    * final keyed agg. Parity: both probabilities are exact-integer
    * ratios divided identically, the interpolation is the fixed op
    * sequence 0.7·pb + 0.3·pu, and each position's ln is truncated to
    * 1e-9 fixed point BEFORE the sum (t14's precedent), so summation
    * order cannot move the hash. */
  private val t16: Fn = (s, d) => {
    val tokPos = docs(s, d).select(col("doc_id"), posexplode(toks).as(Seq("pos", "token")))
    val w = Window.partitionBy(col("doc_id")).orderBy(col("pos"))
    val bg = tokPos
      .withColumn("prev", lag(col("token"), 1).over(w))
      .filter(col("prev").isNotNull)
      .select(col("doc_id"), col("prev"), col("token").as("cur"))
    // corpus token total as a 1-row broadcast into the vocabulary-sized
    // unigram relation (t14's idiom) rather than an eager driver count()
    val tot = tokPos.agg(count(lit(1)).cast(DoubleType).as("total"))
    val uni = tokPos.groupBy(col("token").as("cur")).agg(count(lit(1)).as("cu"))
      .crossJoin(broadcast(tot))
    val big = bg.groupBy("prev", "cur").agg(count(lit(1)).as("cb"))
    val ctx = bg.groupBy("prev").agg(count(lit(1)).as("cp"))
    val pb = col("cb").cast(DoubleType) / col("cp").cast(DoubleType)
    val pu = col("cu").cast(DoubleType) / col("total")
    val lpFp = (log(lit(0.7) * pb + lit(0.3) * pu) * 1e9).cast(LongType)
    bg.join(big, Seq("prev", "cur")).join(ctx, Seq("prev")).join(uni, Seq("cur"))
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_bigrams"), sum(lpFp).as("lp_fp"))
      .withColumn("avg_logp",
        round(col("lp_fp").cast(DoubleType) / 1e9 / col("n_bigrams").cast(DoubleType), 4))
      .select("doc_id", "n_bigrams", "avg_logp")
      .orderBy("doc_id")
  }
  private val t16Sql =
    """WITH tokpos AS (
      |  SELECT doc_id, unnest(string_split(text, ' ')) AS token,
      |         CAST(unnest(range(1, len(string_split(text, ' ')) + 1)) AS INTEGER) AS pos
      |  FROM documents),
      |bg AS (
      |  SELECT doc_id, prev, token AS cur FROM (
      |    SELECT doc_id, pos, token,
      |           lag(token) OVER (PARTITION BY doc_id ORDER BY pos) AS prev
      |    FROM tokpos) t WHERE prev IS NOT NULL),
      |tot AS (SELECT CAST(count(*) AS DOUBLE) AS total FROM tokpos),
      |uni AS (SELECT token AS cur, count(*) AS cu FROM tokpos GROUP BY 1),
      |big AS (SELECT prev, cur, count(*) AS cb FROM bg GROUP BY 1, 2),
      |ctx AS (SELECT prev, count(*) AS cp FROM bg GROUP BY 1)
      |SELECT doc_id, count(*) AS n_bigrams,
      |       round(CAST(sum(CAST(trunc(ln(0.7 * (CAST(cb AS DOUBLE) / CAST(cp AS DOUBLE))
      |                                    + 0.3 * (CAST(cu AS DOUBLE) / total)) * 1e9) AS BIGINT)) AS DOUBLE)
      |             / 1e9 / count(*), 4) AS avg_logp
      |FROM bg JOIN big USING (prev, cur) JOIN ctx USING (prev) JOIN uni USING (cur), tot
      |GROUP BY doc_id ORDER BY doc_id""".stripMargin

  // ------------------- t18 weak-supervision quality classifier ---------

  val PerceptronRounds = 4

  /** t18: distributed BATCH-PERCEPTRON trainer for a document-quality
    * classifier — the "train the quality filter" half of the pipeline
    * story (t05/t10 SCORE with fixed rules; production filters LEARN
    * weights from weak labels, fastText-style, then sweep the corpus).
    * Weak labels come from a deterministic repetition rule (duplicate-
    * word fraction ≥ 0.2 ⇔ 5·(n_tokens − n_distinct) ≥ n_tokens,
    * integer-exact); features are the doc's (1, n_tokens, n_distinct,
    * n_chars). Each round is ONE aggregation: margins y·(w·x) under
    * the current weights, misclassified update Σ y·x and the error
    * count in the same pass; the 4-long weight vector is the only
    * thing the driver touches (u02/t15 trainer-artifact precedent).
    * The batch (not online) update makes the trainer PARTITION-
    * INVARIANT — the update is an exact integer sum over rows, so any
    * parallelism computes identical weights, which is what lets the
    * oracle replay every round as generated CTEs. Output: per round,
    * the weight vector after the round's update and the error count
    * under the PRE-update weights (round 0 = all-zero start, every
    * margin 0 ⇒ all docs count as errors — pinned so both engines
    * agree on the degenerate case). Overflow headroom: |w| grows ≤
    * Σ|x| per round (~1e8 at sf0.1), margins ≤ |w|·|x| (~1e12) —
    * Long-safe by 6 orders. */
  private val t18: Fn = (s, d) =>
    perceptronTrain(docs(s, d).select(col("doc_id"), col("text")), PerceptronRounds)

  /** The t18 feature/weak-label relation, factored so the calibration
    * audit (t31) scores the SAME features the trainer fits. Caller
    * unpersists. */
  private[queries] def perceptronFeats(corpus: DataFrame): DataFrame =
    corpus.select(
      col("doc_id"),
      lit(1L).as("x0"),
      size(toks).cast(LongType).as("x1"),
      size(array_distinct(toks)).cast(LongType).as("x2"),
      length(col("text")).cast(LongType).as("x3"))
      .withColumn("y",
        when(lit(5) * (col("x1") - col("x2")) >= col("x1"), lit(-1L)).otherwise(lit(1L)))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)

  /** The batch-perceptron update loop over a feats relation; returns
    * the FINAL weights (the artifact t31 calibrates). `trace` sees
    * (round, pre-update weights, error count) per round. */
  private[queries] def perceptronRun(feats: DataFrame, nRounds: Int,
      trace: (Int, Array[Long], Long) => Unit = (_, _, _) => ()): Array[Long] = {
    var w = Array(0L, 0L, 0L, 0L)
    for (r <- 1 to nRounds) {
      val margin = col("y") * (lit(w(0)) * col("x0") + lit(w(1)) * col("x1") +
        lit(w(2)) * col("x2") + lit(w(3)) * col("x3"))
      val mis = when(margin <= 0, lit(1L)).otherwise(lit(0L))
      val upd = feats.agg(
        sum(mis).as("n_mis"),
        sum(mis * col("y") * col("x0")).as("d0"),
        sum(mis * col("y") * col("x1")).as("d1"),
        sum(mis * col("y") * col("x2")).as("d2"),
        sum(mis * col("y") * col("x3")).as("d3")).head
      trace(r - 1, w, upd.getLong(0))
      w = Array(w(0) + upd.getLong(1), w(1) + upd.getLong(2),
        w(2) + upd.getLong(3), w(3) + upd.getLong(4))
    }
    w
  }

  /** Trainer body, factored so specs can drive a constructed corpus (a
    * DataFrame with `doc_id` and `text`). */
  private[queries] def perceptronTrain(corpus: DataFrame, nRounds: Int): DataFrame = {
    val s = corpus.sparkSession
    val feats = perceptronFeats(corpus)
    val rows = scala.collection.mutable.ArrayBuffer[(Int, Long, Long, Long, Long, Long)]()
    val w = perceptronRun(feats, nRounds,
      trace = (r, wr, nMis) => rows += ((r, wr(0), wr(1), wr(2), wr(3), nMis)))
    val finalMis = feats.agg(sum(when(col("y") * (lit(w(0)) * col("x0") + lit(w(1)) * col("x1") +
      lit(w(2)) * col("x2") + lit(w(3)) * col("x3")) <= 0, 1L).otherwise(0L))).head.getLong(0)
    rows += ((nRounds, w(0), w(1), w(2), w(3), finalMis))
    feats.unpersist()
    val s2 = s
    import s2.implicits._
    rows.toSeq.toDF("round", "w0", "w1", "w2", "w3", "n_mis")
      .select(col("round").cast(IntegerType).as("round"), col("w0"), col("w1"),
        col("w2"), col("w3"), col("n_mis"))
      .orderBy("round")
  }
  /** The t18 feats + per-round weight CTEs, shared with t31 so the
    * calibration oracle replays the SAME trained weights. */
  private def perceptronCtes: String = {
    val rounds = (1 to PerceptronRounds).map { r =>
      s"""u$r AS (
         |  SELECT CAST(sum(m) AS BIGINT) AS n_mis,
         |         CAST(sum(m * y * x0) AS BIGINT) AS d0, CAST(sum(m * y * x1) AS BIGINT) AS d1,
         |         CAST(sum(m * y * x2) AS BIGINT) AS d2, CAST(sum(m * y * x3) AS BIGINT) AS d3
         |  FROM (SELECT f.*, CASE WHEN f.y * (w.w0 * f.x0 + w.w1 * f.x1 + w.w2 * f.x2 + w.w3 * f.x3) <= 0
         |                         THEN 1 ELSE 0 END AS m
         |        FROM feats f, w${r - 1} w) t),
         |w$r AS (
         |  SELECT w.w0 + u.d0 AS w0, w.w1 + u.d1 AS w1, w.w2 + u.d2 AS w2, w.w3 + u.d3 AS w3
         |  FROM w${r - 1} w, u$r u)""".stripMargin
    }
    s"""feats AS (
       |  SELECT doc_id, CAST(1 AS BIGINT) AS x0,
       |         CAST(len(string_split(text, ' ')) AS BIGINT) AS x1,
       |         CAST(len(list_distinct(string_split(text, ' '))) AS BIGINT) AS x2,
       |         CAST(length(text) AS BIGINT) AS x3,
       |         CASE WHEN 5 * (len(string_split(text, ' ')) - len(list_distinct(string_split(text, ' '))))
       |                   >= len(string_split(text, ' '))
       |              THEN CAST(-1 AS BIGINT) ELSE CAST(1 AS BIGINT) END AS y
       |  FROM documents),
       |w0 AS (SELECT CAST(0 AS BIGINT) AS w0, CAST(0 AS BIGINT) AS w1,
       |              CAST(0 AS BIGINT) AS w2, CAST(0 AS BIGINT) AS w3),
       |${rounds.mkString(",\n")}""".stripMargin
  }

  private def t18Sql: String = {
    val out = (1 to PerceptronRounds)
      .map(r => s"SELECT ${r - 1} AS round, w.*, u.n_mis FROM w${r - 1} w, u$r u")
      .mkString("\nUNION ALL\n") +
      s"""\nUNION ALL\nSELECT $PerceptronRounds AS round, w.*,
         |  (SELECT CAST(sum(CASE WHEN f.y * (w.w0 * f.x0 + w.w1 * f.x1 + w.w2 * f.x2 + w.w3 * f.x3) <= 0
         |                        THEN 1 ELSE 0 END) AS BIGINT) FROM feats f) AS n_mis
         |FROM w$PerceptronRounds w""".stripMargin
    s"""WITH $perceptronCtes
       |SELECT round, w0, w1, w2, w3, n_mis FROM (
       |$out) m ORDER BY round""".stripMargin
  }

  // -------------------- t31 classifier calibration audit ---------------

  /** t31: calibration (reliability) audit of the t18 quality classifier
    * — bucket the corpus into margin deciles under the FINAL trained
    * weights and report each bucket's observed positive rate: a
    * well-calibrated score is monotone in the label rate, and the
    * decile where the rate crosses 50% is where a deployment would set
    * its keep threshold. The standard post-training eval every
    * production quality filter ships next to its accuracy number.
    *
    * Exactness: margins are exact integer dot products; decile
    * assignment is pure integer arithmetic, bucket = ⌈10·cum/n⌉ over
    * the margin histogram's cumulative counts (ties share one margin
    * value, hence one bucket — no ordering ambiguity); rate/mean close
    * with one rounded division each. Scale shape: corpus reduces to
    * the distinct-margin histogram before the cumulative window
    * (AggBounded in PlanLintSpec — the u20/r98 counting form); the
    * bucket map broadcasts back onto the scored relation. */
  private val t31: Fn = (s, d) => {
    val feats = perceptronFeats(docs(s, d).select(col("doc_id"), col("text")))
    val w = perceptronRun(feats, PerceptronRounds)
    val scored = feats.select(col("doc_id"), col("y"),
      (lit(w(0)) * col("x0") + lit(w(1)) * col("x1") +
        lit(w(2)) * col("x2") + lit(w(3)) * col("x3")).as("margin"))
    val hist = scored.groupBy("margin").agg(count(lit(1)).as("c"))
    val wc = Window.orderBy("margin")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val nDf = scored.agg(count(lit(1)).as("n"))
    val bmap = hist.withColumn("cum", sum(col("c")).over(wc))
      .crossJoin(broadcast(nDf))
      .select(col("margin"), expr("(10 * cum + n - 1) div n").as("bucket"))
    val out = scored.join(bmap, "margin")
      .groupBy("bucket")
      .agg(count(lit(1)).as("n_docs"),
        sum(when(col("y") === 1L, 1L).otherwise(0L)).cast(LongType).as("n_pos"),
        sum(col("margin").cast(DecimalType(38, 0))).cast(DecimalType(38, 0)).as("smargin"))
      .select(col("bucket").cast(LongType).as("bucket"), col("n_docs"), col("n_pos"),
        round(col("n_pos").cast(DoubleType) / col("n_docs").cast(DoubleType), 4)
          .as("pos_rate"),
        round(col("smargin").cast(DoubleType) / col("n_docs").cast(DoubleType), 4)
          .as("mean_margin"))
      .orderBy("bucket")
    feats.unpersist()
    out
  }
  private def t31Sql: String =
    s"""WITH $perceptronCtes,
       |scored AS (
       |  SELECT f.doc_id, f.y,
       |         (w.w0 * f.x0 + w.w1 * f.x1 + w.w2 * f.x2 + w.w3 * f.x3) AS margin
       |  FROM feats f, w$PerceptronRounds w),
       |hist AS (SELECT margin, count(*) AS c FROM scored GROUP BY 1),
       |nn AS (SELECT CAST(count(*) AS BIGINT) AS n FROM scored),
       |bmap AS (
       |  SELECT margin,
       |         CAST((10 * sum(c) OVER (ORDER BY margin ROWS UNBOUNDED PRECEDING)
       |               + nn.n - 1) // nn.n AS BIGINT) AS bucket
       |  FROM hist, nn)
       |SELECT b.bucket, CAST(count(*) AS BIGINT) AS n_docs,
       |       CAST(sum(CASE WHEN s.y = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_pos,
       |       round(CAST(sum(CASE WHEN s.y = 1 THEN 1 ELSE 0 END) AS DOUBLE)
       |             / CAST(count(*) AS DOUBLE), 4) AS pos_rate,
       |       round(CAST(CAST(sum(CAST(s.margin AS HUGEINT)) AS HUGEINT) AS DOUBLE)
       |             / CAST(count(*) AS DOUBLE), 4) AS mean_margin
       |FROM scored s JOIN bmap b USING (margin)
       |GROUP BY b.bucket ORDER BY b.bucket""".stripMargin

  /** t19: Zipf-law fit over the corpus vocabulary — the distributional
    * health check a tokenizer/corpus pipeline runs to detect boilerplate
    * floods and template spam (natural text fits log(freq) ≈ a + s·log
    * (rank) with s ≈ -1; machine-generated or deduplicated-to-death
    * corpora bend the curve). Least squares over the top-1000 terms:
    * the token count is the t03 shuffle (partial-agg'd), the top-k is a
    * TakeOrderedAndProject, and the 1000 survivors are ranked by one
    * bounded global window (u04 class, allowlisted). Parity: ln(rank)/
    * ln(count) are floored to 1e-6 fixed point per term (ints, so the
    * sums are order-free and exact); the closed-form slope/intercept/r²
    * are computed from those exact integer sums with an IDENTICAL
    * double expression tree on both engines, so every fp op is the
    * same correctly-rounded IEEE step on both sides. */
  private val t19: Fn = (s, d) => {
    val w = Window.orderBy(desc("n"), col("token"))
    val fp = docs(s, d).select(explode(toks).as("token"))
      .groupBy("token").agg(count(lit(1)).as("n"))
      .orderBy(desc("n"), col("token")).limit(1000)
      .withColumn("rank", row_number().over(w))
      .select(
        floor(log(col("rank").cast(DoubleType)) * 1e6).cast(LongType).as("x"),
        floor(log(col("n").cast(DoubleType)) * 1e6).cast(LongType).as("y"))
    val sums = fp.agg(
      count(lit(1)).cast(DoubleType).as("nt"),
      sum(col("x")).cast(DoubleType).as("sx"),
      sum(col("y")).cast(DoubleType).as("sy"),
      // dec-lift (overflow lint): one squared fixed-point log fits in
      // long; the point-set sums accumulate in DECIMAL(38,0) before the
      // final (exact-integer-valued) double conversion
      sum((col("x") * col("x")).cast(DecimalType(38, 0))).cast(DoubleType).as("sxx"),
      sum((col("x") * col("y")).cast(DecimalType(38, 0))).cast(DoubleType).as("sxy"),
      sum((col("y") * col("y")).cast(DecimalType(38, 0))).cast(DoubleType).as("syy"))
    val num = col("nt") * col("sxy") - col("sx") * col("sy")
    val den = col("nt") * col("sxx") - col("sx") * col("sx")
    val sl = num / den
    sums.select(
      col("nt").cast(LongType).as("n_terms"),
      round(sl, 4).as("slope"),
      round((col("sy") - sl * col("sx")) / col("nt") / 1e6, 4).as("intercept"),
      round(num * num / (den * (col("nt") * col("syy") - col("sy") * col("sy"))), 4).as("r2"))
  }
  private val t19Sql =
    """WITH top AS (
      |  SELECT token, count(*) AS n
      |  FROM (SELECT unnest(string_split(text, ' ')) AS token FROM documents) t
      |  GROUP BY token ORDER BY n DESC, token LIMIT 1000),
      |rk AS (SELECT n, row_number() OVER (ORDER BY n DESC, token) AS rank FROM top),
      |fp AS (SELECT CAST(floor(ln(CAST(rank AS DOUBLE)) * 1e6) AS BIGINT) AS x,
      |              CAST(floor(ln(CAST(n AS DOUBLE)) * 1e6) AS BIGINT) AS y
      |       FROM rk),
      |s AS (SELECT CAST(count(*) AS DOUBLE) AS nt,
      |             CAST(sum(x) AS DOUBLE) AS sx, CAST(sum(y) AS DOUBLE) AS sy,
      |             CAST(sum(x * x) AS DOUBLE) AS sxx,
      |             CAST(sum(x * y) AS DOUBLE) AS sxy,
      |             CAST(sum(y * y) AS DOUBLE) AS syy
      |      FROM fp)
      |SELECT CAST(nt AS BIGINT) AS n_terms,
      |       round((nt * sxy - sx * sy) / (nt * sxx - sx * sx), 4) AS slope,
      |       round((sy - ((nt * sxy - sx * sy) / (nt * sxx - sx * sx)) * sx) / nt / 1e6, 4) AS intercept,
      |       round((nt * sxy - sx * sy) * (nt * sxy - sx * sy)
      |             / ((nt * sxx - sx * sx) * (nt * syy - sy * sy)), 4) AS r2
      |FROM s""".stripMargin

  /** t20: perplexity-tier bucketing (the CCNet recipe, Wenzek et al.
    * 2020): score every document with the t14 unigram LM, split the
    * corpus at the score terciles into head/middle/tail, and report the
    * per-(lang, tier) volume — the table a curation run reads to decide
    * which tail slice to drop. Shapes: the t14 scoring shuffles (token
    * freq join + per-doc agg), then ONE tiny percentile aggregation
    * broadcast back over the scored corpus (the p14 cutoff idiom — no
    * ntile, no global sort), then one keyed rollup. Parity: scores are
    * the t14 fixed-point values; tier cutoffs come from the same
    * interpolated-percentile formula in both engines (p14 precedent);
    * tier min/max are order-free. */
  private val t20: Fn = (s, d) => {
    val tok = docs(s, d).select(col("doc_id"), col("lang"), explode(toks).as("token"))
    // corpus token total as a 1-row broadcast (t14's idiom) — the former
    // driver-side count() ran a second corpus-sized job at construction
    // time and made the Fn non-composable over streaming frames
    val tot = tok.agg(count(lit(1)).cast(DoubleType).as("total"))
    val freq = tok.groupBy("token").agg(count(lit(1)).as("cnt"))
      .crossJoin(broadcast(tot))
    val lpFp = (log(col("cnt").cast(DoubleType) / col("total")) * 1e9).cast(LongType)
    val scored = tok.join(freq, "token")
      .groupBy("doc_id", "lang")
      .agg(count(lit(1)).as("n_tokens"), sum(lpFp).as("lp_fp"))
      .withColumn("score",
        round(col("lp_fp").cast(DoubleType) / 1e9 / col("n_tokens").cast(DoubleType), 4))
    val cuts = scored.agg(
      percentile(col("score"), lit(1.0 / 3)).as("c1"),
      percentile(col("score"), lit(2.0 / 3)).as("c2"))
    scored.crossJoin(broadcast(cuts))
      .withColumn("tier",
        when(col("score") <= col("c1"), "tail")
          .when(col("score") <= col("c2"), "middle")
          .otherwise("head"))
      .groupBy("lang", "tier")
      .agg(count(lit(1)).as("n_docs"), sum(col("n_tokens")).as("n_tokens"),
        round(min(col("score")), 4).as("score_min"),
        round(max(col("score")), 4).as("score_max"))
      .orderBy("lang", "tier")
  }
  private val t20Sql =
    """WITH tok AS (SELECT doc_id, lang, unnest(string_split(text, ' ')) AS token FROM documents),
      |tot AS (SELECT CAST(count(*) AS DOUBLE) AS total FROM tok),
      |freq AS (SELECT token, count(*) AS cnt FROM tok GROUP BY token),
      |scored AS (
      |  SELECT doc_id, lang, count(*) AS n_tokens,
      |         round(CAST(sum(CAST(trunc(ln(CAST(cnt AS DOUBLE) / total) * 1e9) AS BIGINT)) AS DOUBLE)
      |               / 1e9 / count(*), 4) AS score
      |  FROM tok JOIN freq USING (token), tot
      |  GROUP BY doc_id, lang),
      |cuts AS (SELECT quantile_cont(score, 1.0/3) AS c1, quantile_cont(score, 2.0/3) AS c2
      |         FROM scored)
      |SELECT lang,
      |       CASE WHEN score <= c1 THEN 'tail' WHEN score <= c2 THEN 'middle'
      |            ELSE 'head' END AS tier,
      |       count(*) AS n_docs, CAST(sum(n_tokens) AS BIGINT) AS n_tokens,
      |       round(min(score), 4) AS score_min, round(max(score), 4) AS score_max
      |FROM scored CROSS JOIN cuts
      |GROUP BY 1, 2 ORDER BY lang, tier""".stripMargin

  /** t29: TextRank keyword extraction — PageRank over the word
    * co-occurrence graph (adjacent-token pairs, undirected via the
    * mirror union, self-loops dropped), top-10 keywords per language.
    * Mihalcea & Tarau's published formulation, run through the SAME
    * fixed-point integer [[SimilarityQueries.pageRank]] kernel s12
    * ships, so the iteration is bit-exact in both engines and the
    * oracle replays it via the shared generated-CTE unroll
    * ([[SimilarityQueries.pageRankCtes]]). Node ids are `lang|token`
    * strings — the languages form disjoint components of one graph, so
    * a single global run ranks all of them at once (the uniform
    * teleport term scales every component identically).
    *
    * Scale shape: the corpus-sized work is the MAP-SIDE adjacent-pair
    * generation (bigrams come straight off each document's token array
    * — no positional explode, no doc-keyed lag window shuffle; the
    * round-12 rewrite removed that corpus-token exchange) and the edge
    * DISTINCT (one keyed shuffle); the graph itself is
    * vocabulary-sized — orders of magnitude smaller than the corpus —
    * and the kernel's per-round cost is two keyed operations on it.
    * The per-language top-10 window is partitioned by lang. */
  private val t29: Fn = (s, d) => {
    val und = docs(s, d)
      .select(col("lang"), toks.as("w"))
      .filter(size(col("w")) >= 2)
      .select(col("lang"), explode(expr(
        "transform(sequence(0, size(w) - 2), i -> struct(w[i] AS prev, w[i+1] AS token))")).as("bg"))
      .filter(col("bg.prev") =!= col("bg.token"))
      .select(concat(col("lang"), lit("|"), col("bg.prev")).as("u"),
        concat(col("lang"), lit("|"), col("bg.token")).as("v"))
      .distinct()
    val edges = und.select(col("u").as("a_id"), col("v").as("b_id"))
      .union(und.select(col("v").as("a_id"), col("u").as("b_id")))
      .distinct()
    val pr = SimilarityQueries.pageRank(edges, SimilarityQueries.PrRounds)
    val wl = Window.partitionBy("lang").orderBy(desc("tr_fp"), col("token"))
    pr.select(substring_index(col("vec_id"), "|", 1).as("lang"),
        substring_index(col("vec_id"), "|", -1).as("token"),
        col("pr_fp").as("tr_fp"))
      .withColumn("rk", row_number().over(wl).cast(LongType))
      .filter(col("rk") <= 10)
      .select("lang", "rk", "token", "tr_fp")
      .orderBy("lang", "rk")
  }
  private def t29Sql: String = {
    val edgesSql =
      """SELECT DISTINCT a_id, b_id FROM (
        |    SELECT u AS a_id, v AS b_id FROM und UNION ALL SELECT v, u FROM und) m""".stripMargin
    s"""WITH toks AS (SELECT lang, string_split(text, ' ') AS ts FROM documents),
       |prs AS (
       |  SELECT lang, unnest(list_transform(range(1, len(ts)), i -> {'a': ts[i], 'b': ts[i+1]})) AS x
       |  FROM toks),
       |und AS (
       |  SELECT DISTINCT lang || '|' || x.a AS u, lang || '|' || x.b AS v
       |  FROM prs WHERE x.a <> x.b),
       |${SimilarityQueries.pageRankCtes(edgesSql, SimilarityQueries.PrRounds)},
       |fin AS (
       |  SELECT split_part(id, '|', 1) AS lang, split_part(id, '|', 2) AS token,
       |         CAST(r AS BIGINT) AS tr_fp
       |  FROM r${SimilarityQueries.PrRounds}),
       |rnk AS (
       |  SELECT lang, token, tr_fp,
       |         row_number() OVER (PARTITION BY lang ORDER BY tr_fp DESC, token) AS rk
       |  FROM fin)
       |SELECT lang, CAST(rk AS BIGINT) AS rk, token, tr_fp FROM rnk
       |WHERE rk <= 10 ORDER BY lang, rk""".stripMargin
  }

  // ------------------- t36 tokenizer fertility audit --------------------

  /** t36: tokenizer fertility by language — tokens-per-word (fertility)
    * and chars-per-token from the t17 BPE encode, aggregated per
    * language. Fertility is THE per-language tokenizer-quality metric
    * (a vocabulary mined mostly from one language fragments the others
    * into more tokens per word, inflating their training cost and
    * context usage), so every multilingual pipeline reports this table
    * when it evaluates a tokenizer — t15 mines the vocab, t17 prices
    * documents, t36 prices LANGUAGES.
    *
    * Exactness: per-doc word/char/token counts come from the oracled
    * t17 kernel; the per-language rollup is integer sums with one
    * rounded division per rate.
    * Scale shape: t17's encode (map-only replace chain + one keyed agg)
    * plus a broadcast doc→lang join and a |languages|-row aggregation. */
  private val t36: Fn = (s, d) => {
    val enc = bpeEncode(docs(s, d).select(col("doc_id"), col("text")), BpeRounds)
    val langs = docs(s, d).select(col("doc_id"), col("lang"))
    enc.join(broadcast(langs), Seq("doc_id"))
      .groupBy("lang")
      .agg(count(lit(1)).as("n_docs"),
        sum(col("n_words")).cast(LongType).as("n_words"),
        sum(col("n_chars")).cast(LongType).as("n_chars"),
        sum(col("n_tokens")).cast(LongType).as("n_tokens"))
      .withColumn("fertility", round(col("n_tokens").cast(DoubleType) /
        col("n_words").cast(DoubleType), 6))
      .withColumn("chars_per_token", round(col("n_chars").cast(DoubleType) /
        col("n_tokens").cast(DoubleType), 6))
      .select("lang", "n_docs", "n_words", "n_chars", "n_tokens",
        "fertility", "chars_per_token")
      .orderBy("lang")
  }

  private def t36Sql: String =
    s"""WITH enc AS (${t17Sql})
       |SELECT d.lang, count(*) AS n_docs,
       |       CAST(sum(e.n_words) AS BIGINT) AS n_words,
       |       CAST(sum(e.n_chars) AS BIGINT) AS n_chars,
       |       CAST(sum(e.n_tokens) AS BIGINT) AS n_tokens,
       |       round(CAST(sum(e.n_tokens) AS DOUBLE) / CAST(sum(e.n_words) AS DOUBLE), 6) AS fertility,
       |       round(CAST(sum(e.n_chars) AS DOUBLE) / CAST(sum(e.n_tokens) AS DOUBLE), 6) AS chars_per_token
       |FROM enc e JOIN documents d ON e.doc_id = d.doc_id
       |GROUP BY d.lang
       |ORDER BY 1""".stripMargin

  val all: Seq[Q] = Seq(
    Q("t36_bpe_fertility", t36, Some(t36Sql)),
    Q("t29_textrank_keywords", t29, Some(t29Sql)),
    Q("t20_perplexity_tiers", t20, Some(t20Sql)),
    Q("t19_zipf_fit", t19, Some(t19Sql)),
    Q("t16_bigram_logprob", t16, Some(t16Sql)),
    Q("t18_perceptron_quality", t18, Some(t18Sql)),
    Q("t31_calibration", t31, Some(t31Sql)),
    Q("t15_bpe_merges", t15, Some(t15Sql)),
    Q("t17_bpe_encode", t17, Some(t17Sql)),
    Q("t14_unigram_logprob", t14, Some(t14Sql)),
    Q("t13_heavy_hitters", t13, Some(t13Sql)),
    Q("t12_pii_redaction", t12, Some(t12Sql)),
    Q("t11_boilerplate", t11, Some(t11Sql)),
    Q("t01_text_stats", t01, Some(t01Sql)),
    Q("t02_lang_stats", t02, Some(t02Sql)),
    Q("t03_token_topk", t03, Some(t03Sql)),
    Q("t04_tfidf_topk", t04, Some(t04Sql)),
    Q("t05_quality_score", t05, Some(t05Sql)),
    Q("t06_fingerprint", t06, Some(t06Sql)),
    Q("t07_langid", t07, Some(t07Sql)),
    Q("t08_bpe_tokens", t08, Some(t08Sql)),
    Q("t09_rolling_fp", t09, Some(t09Sql)))
}
