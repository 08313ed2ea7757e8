package graft.queries

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.SparkTestSession

/** Adversarial properties for the training-set assembly operators
  * (split/sample/repetition/decontamination) beyond the oracle match. */
class PipelineOpsSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  private val sf = "/root/testdata/sf0.001"

  private def run(name: String) = graft.SparkEntry.queries(name)(spark, sf)

  test("hash split: ~80/10/10, exhaustive, and stable across executions") {
    val a = run("p01_hash_split").collect().map(r => r.getLong(0) -> r.getString(2))
    val b = run("p01_hash_split").collect().map(r => r.getLong(0) -> r.getString(2))
    assert(a.sameElements(b)) // deterministic: same doc -> same split, always
    val n = a.length.toDouble
    val frac = a.groupBy(_._2).view.mapValues(_.length / n).toMap
    assert(math.abs(frac("train") - 0.80) < 0.06, s"train=${frac("train")}")
    assert(math.abs(frac("val") - 0.10) < 0.05, s"val=${frac("val")}")
    assert(math.abs(frac("test") - 0.10) < 0.05, s"test=${frac("test")}")
    assert(a.length == graft.Tables.documents(spark, sf).count()) // no doc dropped
  }

  test("stratified sample: every stratum lands near the 12% target") {
    run("p02_stratified_sample").collect().foreach { r =>
      val rate = r.getDouble(3)
      val n = r.getLong(2).toDouble
      // binomial 4-sigma band: small fixture strata (~80 docs) wobble,
      // but a salt/threshold bug lands far outside this envelope
      val tol = 4 * math.sqrt(0.12 * 0.88 / n)
      assert(math.abs(rate - 0.12) < math.max(tol, 0.02),
        s"lang=${r.getString(0)} n=$n rate=$rate tol=$tol")
    }
  }

  test("split and sample buckets are independent (different salts)") {
    // If the salts collided, sampled docs would all fall in the same
    // splits-prefix; instead the sample must straddle train/val/test.
    val split = run("p01_hash_split").select("doc_id", "split").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    val sampledSplits = graft.Tables.documents(spark, sf)
      .select(col("doc_id"))
      .filter(conv(substring(md5(concat(lit("sample:"), col("doc_id").cast("string"))), 1, 6), 16, 10)
        .cast("long") % 1000 < 120)
      .collect().map(r => split(r.getLong(0))).toSet
    assert(sampledSplits.size > 1, "sample fell entirely inside one split")
  }

  test("repetition quality: hand-computed fractions for one document") {
    val row = run("t10_repetition_quality").filter(col("doc_id") === 0).collect().head
    val text = graft.Tables.documents(spark, sf).filter(col("doc_id") === 0)
      .select("text").collect().head.getString(0)
    val w = text.split(" ")
    val dup = 1.0 - w.distinct.length.toDouble / w.length
    val topBg = w.sliding(2).map(_.mkString(" ")).toSeq
      .groupBy(identity).values.map(_.size).max.toDouble / (w.length - 1)
    assert(math.abs(row.getDouble(1) - dup) < 1e-12)
    assert(math.abs(row.getDouble(2) - topBg) < 1e-12)
    assert(row.getBoolean(3) == (dup <= 0.6 && topBg <= 0.18))
  }

  test("sequence packing: bin assignment re-derived from a sequential fold") {
    val got = run("p03_sequence_packing").collect()
      .map(r => (r.getString(0), r.getLong(1)) -> (r.getLong(2), r.getLong(3))).toMap
    val docs = graft.Tables.documents(spark, sf)
      .select(col("source"), col("doc_id"), size(split(col("text"), " ")).cast("long").as("n"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    val assigned: Seq[((String, Long), Long)] = docs.groupBy(_._1).toSeq.flatMap {
      case (src, ds) =>
        var cum = 0L
        ds.sortBy(_._2).toSeq.map { case (_, _, n) =>
          val bin = cum / 2048; cum += n; ((src, bin), n)
        }
    }
    val want = assigned.groupBy(_._1).map { case (k, vs) =>
      k -> ((vs.size.toLong, vs.map(_._2).sum))
    }
    assert(got == want && got.nonEmpty)
    // bins are contiguous from 0 per source
    got.keys.groupBy(_._1).values.foreach { bins =>
      val ids = bins.map(_._2).toSeq.sorted
      assert(ids == (0L until ids.size).toSeq)
    }
  }

  // Engine-independent re-derivation of the md5 bucket (pure JVM, no
  // Spark expressions): leading 6 hex digits of md5(salt || key) % mod.
  private def jvmBucket(salt: String, key: String, mod: Int): Long = {
    val dig = java.security.MessageDigest.getInstance("MD5")
      .digest((salt + key).getBytes("UTF-8"))
    val hex = dig.take(3).map(b => f"$b%02x").mkString
    java.lang.Long.parseLong(hex, 16) % mod
  }

  test("mixture sample: cuts and kept counts re-derived outside Spark") {
    val got = run("p04_mixture_sample").collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))).toMap
    val docs = graft.Tables.documents(spark, sf)
      .select(col("doc_id"), col("source"), size(split(col("text"), " ")).cast("long").as("n"))
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
    def weight(src: String): Double = src match {
      case "src0" => 0.35; case "src1" => 0.25; case "src2" => 0.20
      case "src3" => 0.15; case _ => 0.05
    }
    val bySrc = docs.groupBy(_._2)
    val grandTok = docs.map(_._3).sum.toDouble
    val wSum = bySrc.keys.toSeq.map(weight).sum
    val want = bySrc.map { case (src, ds) =>
      val tokTotal = ds.map(_._3).sum.toDouble
      val rate = math.min(1.0, 0.5 * grandTok * (weight(src) / wSum) / tokTotal)
      val cut = math.floor(rate * 10000).toLong
      val kept = ds.filter(dd => jvmBucket("mix:", dd._1.toString, 10000) < cut)
      src -> ((cut, ds.size.toLong, kept.size.toLong, kept.map(_._3).sum))
    }
    assert(got == want && got.nonEmpty)
    // at least one source must actually be downsampled, else the test is vacuous
    assert(got.values.exists(_._1 < 10000))
  }

  test("corpus shuffle: shard, order, and positions re-derived outside Spark") {
    val got = run("p05_corpus_shuffle").collect()
      .map(r => (r.getInt(0), r.getLong(1), r.getString(2), r.getLong(3)))
    def md5hex(s: String): String = java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8")).map(b => f"$b%02x").mkString
    val want = got.map(_._4).sorted.map { id =>
      val k = md5hex("shuffle:" + id)
      (java.lang.Long.parseLong(k.take(6), 16) % 8).toInt -> (k, id)
    }.groupBy(_._1).toSeq.flatMap { case (shard, ms) =>
      ms.map(_._2).sortBy(_._1).zipWithIndex.map { case ((k, id), i) =>
        (shard, (i + 1).toLong, k, id)
      }
    }.sortBy(t => (t._1, t._2))
    assert(got.toSeq == want && got.nonEmpty)
    // every doc appears exactly once across shards
    assert(got.map(_._4).distinct.length == got.length)
  }

  test("assembly capstone: per-shard report re-derived from the stage outputs") {
    val got = run("p06_assemble_training_set").collect()
      .map(r => r.getInt(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3)))).toMap
    // stage outputs from the individually-oracled queries
    val keepIds = run("d01_exact_dedup").collect().map(_.getLong(0)).toSet
    val passIds = run("t10_repetition_quality").collect()
      .filter(_.getBoolean(3)).map(_.getLong(0)).toSet
    val contaminated = run("d07_decontaminate").collect().map(_.getLong(0)).toSet
    val docs = graft.Tables.documents(spark, sf)
      .select(col("doc_id"), col("source"), size(split(col("text"), " ")).cast("long").as("n"))
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
    val eligible = docs.filter { case (id, src, _) =>
      keepIds(id) && passIds(id) && src != "src0" && !contaminated(id) &&
        jvmBucket("split:", id.toString, 100) < 80
    }
    def weight(src: String): Double = src match {
      case "src0" => 0.35; case "src1" => 0.25; case "src2" => 0.20
      case "src3" => 0.15; case _ => 0.05
    }
    val bySrc = eligible.groupBy(_._2)
    val grandTok = eligible.map(_._3).sum.toDouble
    val wSum = bySrc.keys.toSeq.map(weight).sum
    val cuts = bySrc.map { case (src, ds) =>
      val t = ds.map(_._3).sum.toDouble
      src -> math.floor(math.min(1.0, 0.5 * grandTok * (weight(src) / wSum) / t) * 10000).toLong
    }
    def md5hex(s: String): String = java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8")).map(b => f"$b%02x").mkString
    val sampled = eligible.filter { case (id, src, _) =>
      jvmBucket("mix:", id.toString, 10000) < cuts(src)
    }
    val want = sampled.groupBy { case (id, _, _) =>
      (java.lang.Long.parseLong(md5hex("shuffle:" + id).take(6), 16) % 8).toInt
    }.map { case (shard, ds) =>
      shard -> ((ds.size.toLong, ds.map(_._3).sum, ds.map(_._2).distinct.size.toLong))
    }
    assert(got == want && got.nonEmpty)
    // the pipeline must actually remove something at every stage on this
    // fixture, else the composition test is vacuous
    assert(docs.length > eligible.length && eligible.length > sampled.length)
    assert(contaminated.nonEmpty)
  }

  test("boilerplate: fractions re-derived from a local shingle frequency map") {
    val got = run("t11_boilerplate").collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getBoolean(4)))).toMap
    val docs = graft.Tables.documents(spark, sf).select("doc_id", "text").collect()
      .map(r => r.getLong(0) -> r.getString(1))
    def shingles(t: String): Set[String] = {
      val w = t.split(" ", -1)
      if (w.length < 5) Set.empty
      else (0 to w.length - 5).map(i => w.slice(i, i + 5).mkString(" ")).toSet
    }
    val all = docs.map { case (id, t) => id -> shingles(t) }.filter(_._2.nonEmpty)
    val df = all.flatMap(_._2).groupBy(identity).map { case (k, v) => k -> v.size }
    val want = all.map { case (id, ss) =>
      val hot = ss.count(df(_) >= 3).toLong
      id -> ((ss.size.toLong, hot, hot.toDouble / ss.size > 0.5))
    }.toMap
    assert(got == want && got.nonEmpty)
    assert(got.values.exists(_._3), "fixture must flag at least one doc")
  }

  test("decontamination: flagged docs truly share >=3 shingles with src0") {
    val flagged = run("d07_decontaminate").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(flagged.nonEmpty, "fixture has no contaminated doc; spec is vacuous")
    val docs = graft.Tables.documents(spark, sf)
      .select("doc_id", "source", "text").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2)))
    def shingles(t: String): Set[String] = {
      val w = t.split(" ")
      if (w.length < 5) Set.empty else w.sliding(5).map(_.mkString(" ")).toSet
    }
    val bench = docs.filter(_._2 == "src0").map(d => d._1 -> shingles(d._3))
    val byId = docs.map(d => d._1 -> d).toMap
    flagged.foreach { case (trainId, nHits, worst) =>
      assert(byId(trainId)._2 != "src0", s"$trainId is a benchmark doc")
      val overlaps = bench.map { case (_, bs) => (shingles(byId(trainId)._3) & bs).size }
        .filter(_ >= 3)
      assert(overlaps.size == nHits, s"$trainId hits: got $nHits want ${overlaps.size}")
      assert(overlaps.max == worst, s"$trainId worst: got $worst want ${overlaps.max}")
    }
  }
  test("p07: dispositions are consistent with the standing index and keeper race") {
    val out = graft.SparkEntry.queries("p07_incremental_dedup")(spark, sf)
    out.cache()
    import org.apache.spark.sql.functions._
    // exactly one 'new' keeper per fingerprint group UNLESS the group is
    // already in the corpus (then every member is dup_of_corpus)
    val perFp = out.groupBy("fp").agg(
      sum(when(col("disposition") === "new", 1).otherwise(0)).as("n_new"),
      sum(when(col("disposition") === "dup_of_corpus", 1).otherwise(0)).as("n_corp"),
      count(lit(1)).as("n"))
    assert(perFp.filter(col("n_corp") > 0 && col("n_corp") =!= col("n")).count() == 0,
      "a fingerprint known to the corpus must mark ALL its delta members dup_of_corpus")
    assert(perFp.filter(col("n_corp") === 0 && col("n_new") =!= 1).count() == 0,
      "a fingerprint new to the corpus must elect exactly one keeper")
    out.unpersist()
  }

  test("t12: every synthetic PII instance is found and scrubbed") {
    val out = graft.SparkEntry.queries("t12_pii_redaction")(spark, sf)
    import org.apache.spark.sql.functions._
    // the synthetic tail plants exactly one of each class per doc; the
    // fixture text contains none of its own
    assert(out.filter(col("n_emails") =!= 1 || col("n_ips") =!= 1 || col("n_phones") =!= 1)
      .count() == 0)
    // true idempotence: re-apply the actual cascade to the scrubbed text
    // and assert no pattern matches anything anymore (second pass is a
    // no-op), using the same shared patterns the query uses
    val scrubbed = TextQueries.withSyntheticPii(spark, sf)
      .select(col("doc_id"), TextQueries.redact(col("raw")).as("red"))
    TextQueries.piiPatterns.foreach { case (pat, _) =>
      assert(scrubbed.filter(col("red").rlike(pat)).count() == 0,
        s"pattern $pat still matches after redaction")
    }
    assert(scrubbed.filter(TextQueries.redact(col("red")) =!= col("red")).count() == 0,
      "second redaction pass must be a no-op")
  }

  test("p13: sample equals the k smallest u/w priorities; heavier docs favored") {
    import org.apache.spark.sql.functions._
    val out = run("p13_weighted_sample").collect()
    assert(out.length == 100)
    // independent recompute of every priority; the sample must be
    // exactly the 100 smallest with (priority, doc_id) tie order
    val b = graft.functions.DetHash.mdBucket(col("doc_id"), "wres:", 1000000)
    val all = graft.Tables.documents(spark, sf).filter(col("n_chars") > 0)
      .select(col("doc_id"),
        (((b + 1).cast("double") / 1e6) / col("n_chars").cast("double")).as("pri"))
      .collect().map(r => (r.getDouble(1), r.getLong(0))).sorted.take(100)
    assert(out.map(r => (r.getDouble(3), r.getLong(0))).sorted.toSeq == all.toSeq)
    // weight-proportional inclusion: the sampled docs' mean n_chars must
    // exceed the corpus mean (heavier docs get smaller priorities)
    val corpusMean = graft.Tables.documents(spark, sf)
      .agg(avg(col("n_chars"))).head.getDouble(0)
    val sampleMean = out.map(_.getLong(2).toDouble).sum / out.length
    assert(sampleMean > corpusMean,
      s"weighted sample mean $sampleMean not above corpus mean $corpusMean")
  }

  test("u06: exactly the sub-K classes are reported, none missed") {
    import org.apache.spark.sql.functions._
    val out = run("u06_k_anonymity").collect()
    assert(out.forall(_.getLong(3) < 5), "a reported class has size >= K")
    // completeness: recompute the class sizes independently
    val expected = graft.Tables.documents(spark, sf)
      .groupBy(col("lang"), col("source"), (col("n_chars") / 100).cast("long").as("b"))
      .count().filter(col("count") < 5).count()
    assert(out.length == expected)
  }

  test("r56: OHLC invariants hold in every bucket") {
    val out = graft.SparkEntry.queries("r56_ohlc_resample")(spark, sf).collect()
    assert(out.nonEmpty)
    out.foreach { r =>
      val (open, close, low, high, vol) =
        (r.getDouble(2), r.getDouble(3), r.getDouble(4), r.getDouble(5), r.getLong(6))
      assert(low <= open && open <= high, r.toString)
      assert(low <= close && close <= high, r.toString)
      assert(vol >= 1)
      if (vol == 1) assert(open == close && low == high)
    }
  }

  test("p16 waterfill: allocation is feasible, budget-tight, and level-uniform") {
    val spark = graft.SparkTestSession.spark
    val rows = graft.SparkEntry.queries("p16_mixture_waterfill")(spark, "/root/testdata/sf0.001")
      .collect().map(r => (r.getString(0), r.getLong(1), r.getBoolean(2), r.getLong(3)))
    assert(rows.nonEmpty)
    val budget = rows.map(_._2).sum * 19 / 20
    // never allocate more than available; saturated = exactly available
    rows.foreach { case (src, avail, sat, alloc) =>
      assert(alloc <= avail, s"$src over-allocated")
      if (sat) assert(alloc == avail, s"$src saturated but alloc != avail")
    }
    // unsaturated sources share one water level (uniform target weights)
    val unsat = rows.filter(!_._3).map(_._4).distinct
    assert(unsat.length <= 1, s"multiple water levels: $unsat")
    // budget used to within one truncated token per unsaturated source
    val total = rows.map(_._4).sum
    assert(total <= budget && budget - total <= math.max(rows.count(r => !r._3), 1),
      s"alloc $total vs budget $budget")
    // the redistribution path must actually be exercised on this fixture
    assert(rows.exists(_._3) && rows.exists(!_._3), "no saturation — spec is vacuous")
  }

  test("p19: temperature mixture boosts small sources above their raw share") {
    import spark.implicits._
    // 3 sources sized 6400/400/100: raw shares .928/.058/.014; sqrt
    // weights 80/20/10 -> sampling shares .727/.182/.091. Every small
    // source's p must exceed its raw share, the big one's must shrink,
    // quotas must respect floor(B*p) capped at n, and kept == quota.
    val docsDf = (
      (1 to 6400).map(i => (i.toLong, "big")) ++
      (1 to 400).map(i => (10000L + i, "mid")) ++
      (1 to 100).map(i => (20000L + i, "tiny"))).toDF("doc_id", "source")
    val rows = PipelineQueries.temperatureMixtureOf(docsDf).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getDouble(3), r.getLong(4), r.getLong(5))).toMap
    val n = 6900.0
    val (nb, pb, qb, kb) = rows("big")
    val (nm, pm, qm, km) = rows("mid")
    val (nt, pt, qt, kt) = rows("tiny")
    assert(pb < nb / n && pm > nm / n && pt > nt / n)
    assert(math.abs(pb - 80.0 / 110) < 1e-4 && math.abs(pt - 10.0 / 110) < 1e-4)
    assert(qb == 727L && qm == 181L && qt == 90L) // floor(1000*p), all below n
    assert(kb == qb && km == qm && kt == qt)
  }

  test("u13: planted flood and outage days trip the robust flag; normal days do not") {
    import spark.implicits._
    // 9 normal days (100±2 events), one 10x flood, one near-outage.
    // median ~100, MAD ~1 -> threshold ~4.45; flood and outage deviate
    // by ~900 and ~97.
    def day(d: Int, n: Int) = (1 to n).map(i =>
      java.sql.Timestamp.valueOf(f"2024-03-${d}%02d 12:00:00"))
    val ts = (1 to 9).flatMap(d => day(d, 98 + (d % 5))) ++ day(10, 1000) ++ day(11, 3)
    val got = ExtraQueries2.volumeAnomaliesOf(ts.toDF("ts"))
      .collect().map(r => (r.getTimestamp(0).toString.take(10), r.getLong(1), r.getBoolean(4))).toList
    assert(got.count(_._3) == 2, got.toString)
    assert(got.find(_._1 == "2024-03-10").exists(x => x._2 == 1000L && x._3))
    assert(got.find(_._1 == "2024-03-11").exists(x => x._2 == 3L && x._3))
    assert(got.filter(x => x._1 < "2024-03-10").forall(!_._3))
  }

  test("u12: planted zero/NaN/Inf/empty vectors are counted, norms exact") {
    import spark.implicits._
    // label 0: two unit vectors + an EMPTY array (zero vector by
    // contract, no engine error); label 1: one zero vector, one NaN
    // vector, one +Inf vector, one 3-4-5 triangle vector (norm 5)
    val emb = Seq(
      (1L, Array(1.0f, 0.0f), 0),
      (2L, Array(0.0f, 1.0f), 0),
      (6L, Array.empty[Float], 0),
      (3L, Array(0.0f, 0.0f), 1),
      (4L, Array(Float.NaN, 1.0f), 1),
      (7L, Array(Float.PositiveInfinity, 1.0f), 1),
      (5L, Array(3.0f, 4.0f), 1)).toDF("vec_id", "embedding", "label")
    val got = ExtraQueries2.embeddingQa(emb).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getDouble(4), r.getDouble(5), r.getDouble(6))).toList
    // NaN/Inf rows: norm explicitly NULL (counted in n_nonfinite,
    // excluded from min/max/avg). label 0 norms (1, 1, 0): avg over 3;
    // label 1 norms over the 2 finite vectors (0, 5): avg 2.5.
    assert(got == List(
      (0L, 3L, 1L, 0L, 0.0, 1.0, 0.666667),
      (1L, 4L, 1L, 2L, 0.0, 5.0, 2.5)), got.toString)
  }

  test("p18: hand-computed batches under both closing constraints") {
    import spark.implicits._
    // bucket 0: five 10-token docs, maxDocs=3 binds -> batches 3+2;
    // bucket 1: three 60-token docs, maxTokens=100 binds -> singletons;
    // bucket 2: three 40-token docs -> 40+40=80 fits, +40 would be 120
    // -> batch of 2 then 1
    val rows = (
      (1 to 5).map(i => (0L, i.toLong, 10L)) ++
      (1 to 3).map(i => (1L, (10 + i).toLong, 60L)) ++
      (1 to 3).map(i => (2L, (20 + i).toLong, 40L))
    ).toDF("bucket", "doc_id", "n_tok")
    val got = PipelineQueries.packBatches(rows, 3, 100L).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5))).toList
    assert(got == List(
      (0L, 0L, 3L, 30L, 1L, 3L), (0L, 1L, 2L, 20L, 4L, 5L),
      (1L, 0L, 1L, 60L, 11L, 11L), (1L, 1L, 1L, 60L, 12L, 12L), (1L, 2L, 1L, 60L, 13L, 13L),
      (2L, 0L, 2L, 80L, 21L, 22L), (2L, 1L, 1L, 40L, 23L, 23L)), got.toString)
  }

  test("p18: batches are partition-placement invariant") {
    import spark.implicits._
    val rows = (1 to 40).map(i => ((i % 3).toLong, i.toLong, (10 + i % 7).toLong))
      .toDF("bucket", "doc_id", "n_tok")
    def at(parts: Int) = PipelineQueries.packBatches(rows.repartition(parts), 4, 50L)
      .collect().map(_.toSeq).toList
    assert(at(1) == at(9))
  }

  test("p18: fixture batches respect both caps and cover every doc once") {
    val batches = run("p18_inference_batches").collect()
      .map(r => (r.getLong(2), r.getLong(3)))
    assert(batches.nonEmpty)
    batches.foreach { case (nDocs, nToks) =>
      assert(nDocs <= PipelineQueries.BatchMaxDocs)
      assert(nToks <= PipelineQueries.BatchMaxTokens || nDocs == 1L)
    }
    val total = graft.Tables.documents(spark, sf).count()
    assert(batches.map(_._1).sum == total, "every doc must land in exactly one batch")
    // both closing constraints must actually bind on this fixture
    assert(batches.exists(_._1 == PipelineQueries.BatchMaxDocs.toLong))
    assert(batches.exists(b => b._1 < PipelineQueries.BatchMaxDocs && b._2 > 400))
  }

  test("u12: fixture run is non-vacuous (every label present, all healthy)") {
    val rows = run("u12_embedding_qa").collect()
    assert(rows.length == 10)
    rows.foreach { r =>
      assert(r.getLong(1) > 0 && r.getLong(2) == 0 && r.getLong(3) == 0)
      assert(r.getDouble(4) > 0.99 && r.getDouble(5) <= 1.000001)
    }
  }
}
