package graft.multimodal

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.SparkTestSession

/** The multimodal plumbing contract: schema, determinism, batch shape. */
class MultimodalSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  private val sf = "/root/testdata/sf0.001"

  private def payloads = Multimodal.attachPayload(graft.Tables.documents(spark, sf))

  test("fixture guard: documents.text is pure ASCII at every SF (m05/m09/m10 parity assumption)") {
    // The multimodal oracles hash per-CHARACTER codepoints while the
    // Spark side hashes payload BYTES; they agree iff every char is one
    // byte. UTF-8 byte length == char length exactly when pure ASCII, so
    // a non-ASCII fixture regeneration must fail HERE, not surface as a
    // silent m05/m09/m10 hash divergence.
    for (sfDir <- Seq("/root/testdata/sf0.001", "/root/testdata/sf0.01", "/root/testdata/sf0.1")) {
      val nonAscii = graft.Tables.documents(spark, sfDir)
        .filter(length(encode(col("text"), "UTF-8")) =!= length(col("text"))).count()
      assert(nonAscii == 0, s"$sfDir holds $nonAscii non-ASCII documents")
    }
  }

  test("payload bytes round-trip the text and metadata is typed") {
    val r = payloads.filter(col("doc_id") === 0).collect().head
    val text = graft.Tables.documents(spark, sf).filter(col("doc_id") === 0)
      .select("text").collect().head.getString(0)
    assert(new String(r.getAs[Array[Byte]]("payload"), "UTF-8") == text)
    val meta = r.getStruct(r.fieldIndex("meta"))
    assert(meta.getAs[String]("mime") == "image/png")
    assert(meta.getAs[Int]("n_bytes") == text.length)
  }

  test("decodeFeatures: fixed dim, L1-normalized, deterministic across runs") {
    val a = Multimodal.decodeFeatures(payloads).collect()
      .map(r => r.getLong(0) -> r.getSeq[Float](2)).toMap
    val b = Multimodal.decodeFeatures(payloads, batchSize = 7).collect()
      .map(r => r.getLong(0) -> r.getSeq[Float](2)).toMap
    assert(a == b) // batch size must not affect results
    a.values.foreach { f =>
      assert(f.size == Multimodal.FeatureDim)
      assert(math.abs(f.map(_.toDouble).sum - 1.0) < 1e-3)
    }
  }

  test("decode features match hand-computed golden histograms (3 docs, all mimes)") {
    val texts = graft.Tables.documents(spark, sf).filter(col("doc_id") < 3)
      .select("doc_id", "text").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(texts.size == 3)
    val got = Multimodal.decodeFeatures(payloads).filter(col("doc_id") < 3)
      .collect().map(r => r.getLong(0) -> r.getSeq[Float](2)).toMap
    texts.foreach { case (id, text) =>
      val bytes = text.getBytes("UTF-8")
      val want = new Array[Float](Multimodal.FeatureDim)
      bytes.foreach(b => want((b & 0xFF) % Multimodal.FeatureDim) += 1f)
      val norm = want.map(_ / bytes.length)
      assert(got(id).toArray.toSeq == norm.toSeq, s"doc $id feature mismatch")
    }
  }

  test("frameSample emits strided frame offsets for video payloads only") {
    val frames = Multimodal.frameSample(payloads)
    val mimes = frames.join(payloads, "doc_id").select("meta.mime").distinct().collect()
    assert(mimes.map(_.getString(0)).toSeq == Seq("video/mp4"))
    val f = frames.filter(col("doc_id") === 2).collect()
    assert(f.forall(_.getAs[Int]("frame_no") % 4 == 0))
  }

  test("resizeThumb: hand-computed strides, fixed resolution, short-payload zeros") {
    import spark.implicits._
    // "abcd" x 8 = 32 bytes -> 2 bytes per bucket; "ab" = 2 bytes ->
    // byte i lands in bucket i*16/2 (buckets 0 and 8), the rest 0.0
    val df = Seq((1L, "abcd" * 8), (2L, "ab")).toDF("doc_id", "text")
      .select(col("doc_id"), col("text").cast("binary").as("payload"))
    val got = Multimodal.resizeThumb(df).collect()
      .map(r => r.getLong(0) -> r.getSeq[Double](1)).toMap
    val want1 = (0 until 16).map { j =>
      (("abcd" * 8).charAt(2 * j).toInt + ("abcd" * 8).charAt(2 * j + 1).toInt).toDouble / 2
    }
    assert(got(1L) == want1, s"got ${got(1L)}")
    val want2 = (0 until 16).map {
      case 0 => 'a'.toInt.toDouble
      case 8 => 'b'.toInt.toDouble
      case _ => 0.0
    }
    assert(got(2L) == want2, s"got ${got(2L)}")
  }

  test("audioResample: hand-computed lerp grid, fixed rate, degenerate payloads") {
    import spark.implicits._
    val df = Seq((1L, "ab"), (2L, "x"), (3L, ""), (4L, "abc"))
      .toDF("doc_id", "text")
      .select(col("doc_id"), col("text").cast("binary").as("payload"))
    val got = Multimodal.audioResample(df, samples = 32).collect()
      .map(r => (r.getLong(0), r.getInt(1)) -> r.getDouble(2)).toMap
    val byDoc = got.keys.groupBy(_._1).view.mapValues(_.size).toMap
    // fixed output rate regardless of input length; empty payload -> no rows
    assert(byDoc == Map(1L -> 32, 2L -> 32, 4L -> 32))
    // "ab": p = t/31, v = 97 + (98-97)*(t/31)
    for (t <- 0 until 32)
      assert(got((1L, t)) == 97.0 + (t.toDouble / 31), s"t=$t")
    // single byte: constant signal
    assert((0 until 32).forall(t => got((2L, t)) == 'x'.toInt.toDouble))
    // "abc": p = 2t/31; endpoint t=31 hits the last byte exactly
    assert(got((4L, 0)) == 97.0 && got((4L, 31)) == 99.0)
  }

  test("m08 path: hand-computed frame energies and VAD segments") {
    import spark.implicits._
    // 'z' = 122 (voiced above threshold 95), ' ' = 32 (silent); layout:
    // frame0 voiced, frame1 silent, frames 2-3 voiced, frame4 = 10-byte
    // voiced tail (the short-chunk case): segments [0,0] and [2,4]
    val text = "z" * 32 + " " * 32 + "z" * 64 + "z" * 10
    val docs = Seq((1L, text, "src1", "en", text.length.toLong))
      .toDF("doc_id", "text", "source", "lang", "n_chars")
    val en = Multimodal.frameEnergy(Multimodal.attachPayload(docs)).collect()
      .map(r => (r.getInt(1), r.getLong(2), r.getInt(3))).sortBy(_._1).toList
    assert(en == List((0, 122L * 32, 32), (1, 32L * 32, 32),
      (2, 122L * 32, 32), (3, 122L * 32, 32), (4, 122L * 10, 10)), en.toString)
    val segs = graft.queries.CoverageQueries.vadSegments(docs).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))).toList
    assert(segs == List((1L, 0L, 0L, 1L, 122L * 32), (1L, 2L, 4L, 3L, 122L * 74)), segs.toString)
  }

  test("null payloads decode as empty, not as task failures") {
    import spark.implicits._
    val df = Seq((1L, Option("abc")), (2L, Option.empty[String])).toDF("doc_id", "text")
      .select(col("doc_id"), col("text").cast("binary").as("payload"),
        struct(lit("image/png").as("mime"), lit(0).as("n_bytes"), lit("src0").as("origin")).as("meta"))
    val feats = Multimodal.decodeFeatures(df).collect().map(r => r.getLong(0) -> r.getSeq[Float](2)).toMap
    assert(feats(2L).forall(_ == 0f))
    val thumbs = Multimodal.resizeThumb(df).collect().map(r => r.getLong(0) -> r.getSeq[Double](1)).toMap
    assert(thumbs(2L).forall(_ == 0.0))
  }
}
