package graft.multimodal

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal column plumbing: opaque `binary` payloads with typed
  * metadata, plus batch-shaped decode / feature-extract / frame-sample
  * operators (BASELINE.json north star).
  *
  * The Spark-side contract is the real deliverable here — schema
  * (payload: binary, meta: struct), partition-parallel batched decoding,
  * and deterministic outputs — while the actual media codecs are STUBBED:
  * this container has no image/audio libraries, so `decodeFeatures`
  * derives features from payload bytes deterministically where a real
  * implementation would call the decoder. The operator shape (batched
  * `mapPartitions`, one client/codec init per partition, fixed output
  * schema) is exactly what a production decode stage needs at 100 TB:
  * payloads never leave executors, batches amortize codec setup, and the
  * output is a normal columnar frame for downstream SQL.
  */
object Multimodal {

  val FeatureDim = 16

  /** Attach a fake binary payload + typed metadata to the documents table
    * (stand-in for reading real media files alongside a metadata table). */
  def attachPayload(documents: DataFrame): DataFrame =
    documents.select(
      col("doc_id"),
      col("text").cast(BinaryType).as("payload"),
      struct(
        when(col("source") === "src0", "image/png")
          .when(col("source") === "src1", "audio/wav")
          .otherwise("video/mp4").as("mime"),
        length(col("text").cast(BinaryType)).as("n_bytes"),
        col("source").as("origin")).as("meta"))

  private val featureSchema = StructType(Seq(
    StructField("doc_id", LongType),
    StructField("mime", StringType),
    StructField("features", ArrayType(FloatType, containsNull = false)),
    StructField("n_frames", IntegerType)))

  /** Batched decode + feature extraction.
    *
    * STUB: a real implementation decodes the payload with an image/audio
    * codec here (per-partition codec init, then per-batch decode). The
    * deterministic stand-in computes a 16-bucket byte histogram (L1
    * normalized) so tests can assert exact values; the surrounding
    * plumbing — batching, schema, partition parallelism — is real. */
  def decodeFeatures(withPayload: DataFrame, batchSize: Int = 64): DataFrame = {
    val spark = withPayload.sparkSession
    val payloadIdx = withPayload.schema.fieldIndex("payload")
    val idIdx = withPayload.schema.fieldIndex("doc_id")
    val metaIdx = withPayload.schema.fieldIndex("meta")
    val out = withPayload.rdd.mapPartitions { iter =>
      // per-partition: real impl initializes the codec once here
      iter.grouped(batchSize).flatMap { batch =>
        // real impl decodes the whole batch in one call; stub is per-row
        batch.iterator.map { row =>
          // NULL text flows through attachPayload as a null payload;
          // decode treats it as empty rather than NPE-ing the task
          val bytes = Option(row.getAs[Array[Byte]](payloadIdx)).getOrElse(Array.emptyByteArray)
          val hist = new Array[Float](FeatureDim)
          var i = 0
          while (i < bytes.length) { hist((bytes(i) & 0xFF) % FeatureDim) += 1f; i += 1 }
          val total = if (bytes.length == 0) 1f else bytes.length.toFloat
          var j = 0
          while (j < FeatureDim) { hist(j) = hist(j) / total; j += 1 }
          val mime = row.getStruct(metaIdx).getAs[String]("mime")
          val frames = if (mime.startsWith("video")) math.max(1, bytes.length / 64) else 1
          Row(row.getLong(idIdx), mime, hist.toSeq, frames)
        }
      }
    }
    spark.createDataFrame(out, featureSchema)
  }

  private def thumbSchema = StructType(Seq(
    StructField("doc_id", LongType),
    StructField("thumb", ArrayType(DoubleType, containsNull = false))))

  /** Batched "resize": downsample every payload to a fixed-resolution
    * thumbnail — `buckets` equal byte-strides, mean byte value per
    * stride. STUB in the same sense as [[decodeFeatures]]: a real
    * implementation decodes and bilinear-resizes pixels here; the
    * deterministic stand-in resizes the raw byte signal, so the
    * operator shape (fixed output resolution regardless of input size,
    * batched per-partition decode, columnar output) is real and the
    * values are exactly reproducible. Bucket of 0-based byte i is
    * i*buckets/len (integer floor) — exact integer arithmetic any
    * engine replays; empty buckets (len < buckets) are 0.0. */
  def resizeThumb(withPayload: DataFrame, buckets: Int = 16,
                  batchSize: Int = 64): DataFrame = {
    val spark = withPayload.sparkSession
    val payloadIdx = withPayload.schema.fieldIndex("payload")
    val idIdx = withPayload.schema.fieldIndex("doc_id")
    val out = withPayload.rdd.mapPartitions { iter =>
      iter.grouped(batchSize).flatMap { batch =>
        batch.iterator.map { row =>
          val bytes = Option(row.getAs[Array[Byte]](payloadIdx)).getOrElse(Array.emptyByteArray)
          val sums = new Array[Long](buckets)
          val counts = new Array[Long](buckets)
          var i = 0
          while (i < bytes.length) {
            val j = (i.toLong * buckets / bytes.length).toInt
            sums(j) += (bytes(i) & 0xFF).toLong
            counts(j) += 1
            i += 1
          }
          val thumb = (0 until buckets).map(j =>
            if (counts(j) == 0) 0.0 else sums(j).toDouble / counts(j))
          Row(row.getLong(idIdx), thumb)
        }
      }
    }
    spark.createDataFrame(out, thumbSchema)
  }

  private def resampleSchema = StructType(Seq(
    StructField("doc_id", LongType),
    StructField("t", IntegerType, nullable = false),
    StructField("v", DoubleType, nullable = false)))

  /** Batched temporal resample for "audio" payloads: linear
    * interpolation of the byte signal onto a fixed `samples`-point grid
    * — the rate-conversion leg of the multimodal checklist (decode /
    * feature-extract / resize / frame-sample / resample). STUB in the
    * same sense as [[decodeFeatures]]: a real implementation resamples
    * decoded PCM here; the deterministic stand-in interpolates raw
    * bytes, so the operator shape (fixed output rate regardless of
    * input length, batched per-partition decode, exploded scalar rows)
    * is real and exactly reproducible. Sample t maps to source position
    * p = t·(len−1)/(samples−1) (integer numerator, ONE double
    * division), v = b[⌊p⌋] + (b[⌊p⌋+1] − b[⌊p⌋])·(p − ⌊p⌋) — every
    * step an identical IEEE op on any engine, so values are bitwise
    * portable. Empty payloads yield no rows. */
  def audioResample(withPayload: DataFrame, samples: Int = 32,
                    batchSize: Int = 64): DataFrame = {
    val spark = withPayload.sparkSession
    val payloadIdx = withPayload.schema.fieldIndex("payload")
    val idIdx = withPayload.schema.fieldIndex("doc_id")
    val out = withPayload.rdd.mapPartitions { iter =>
      iter.grouped(batchSize).flatMap { batch =>
        batch.iterator.flatMap { row =>
          val bytes = Option(row.getAs[Array[Byte]](payloadIdx)).getOrElse(Array.emptyByteArray)
          if (bytes.isEmpty) Iterator.empty
          else (0 until samples).iterator.map { t =>
            val v =
              if (bytes.length == 1) (bytes(0) & 0xFF).toDouble
              else {
                val p = (t.toLong * (bytes.length - 1)).toDouble / (samples - 1)
                val i0 = math.floor(p).toInt
                val i1 = math.min(i0 + 1, bytes.length - 1)
                val b0 = (bytes(i0) & 0xFF).toDouble
                val b1 = (bytes(i1) & 0xFF).toDouble
                b0 + (b1 - b0) * (p - i0)
              }
            Row(row.getLong(idIdx), t, v)
          }
        }
      }
    }
    spark.createDataFrame(out, resampleSchema)
  }

  private val frameFeatureSchema = StructType(Seq(
    StructField("doc_id", LongType),
    StructField("frame_no", IntegerType),
    StructField("features", ArrayType(FloatType, containsNull = false))))

  /** Shared per-frame chunk walk for the frame-level decode ops: one
    * mime-filtered batched mapPartitions pass emitting `(doc_id,
    * frame_no, kernel(chunk))` rows. The frame contract lives HERE
    * once — chunk f covers bytes [f·frameBytes, min((f+1)·frameBytes,
    * len)), the last chunk is shorter, empty/null payloads yield no
    * frames (`range(0, (len-1)//frameBytes + 1)` is empty at len 0) —
    * and the m07/m08 oracle SQL replays exactly this arithmetic. */
  private def frameRows(withPayload: DataFrame, mime: String, frameBytes: Int,
                        schema: StructType)(kernel: (Array[Byte], Int, Int) => Seq[Any]): DataFrame = {
    val spark = withPayload.sparkSession
    val sel = withPayload.filter(col("meta.mime") === mime)
    val payloadIdx = sel.schema.fieldIndex("payload")
    val idIdx = sel.schema.fieldIndex("doc_id")
    val out = sel.rdd.mapPartitions { iter =>
      // per-partition: real impl initializes the codec once here
      iter.flatMap { row =>
        val bytes = Option(row.getAs[Array[Byte]](payloadIdx)).getOrElse(Array.emptyByteArray)
        if (bytes.isEmpty) Iterator.empty
        else {
          val nFrames = (bytes.length - 1) / frameBytes + 1
          (0 until nFrames).iterator.map { f =>
            val start = f * frameBytes
            val end = math.min(start + frameBytes, bytes.length)
            Row.fromSeq(row.getLong(idIdx) +: f +: kernel(bytes, start, end))
          }
        }
      }
    }
    spark.createDataFrame(out, schema)
  }

  /** Per-frame feature extraction for video payloads: every 64-byte
    * chunk ("frame") yields the 16-bucket byte histogram, normalized by
    * the chunk's own length (the last chunk is shorter). Same STUB-
    * codec/real-plumbing contract as [[decodeFeatures]]; the
    * normalization divides in double then narrows to float so the
    * relational replay (`CAST(cnt / len AS FLOAT)`, double division
    * then cast) is bit-identical. */
  def frameFeatures(withPayload: DataFrame, frameBytes: Int = 64): DataFrame =
    frameRows(withPayload, "video/mp4", frameBytes, frameFeatureSchema) { (bytes, start, end) =>
      val hist = new Array[Float](FeatureDim)
      var i = start
      while (i < end) { hist((bytes(i) & 0xFF) % FeatureDim) += 1f; i += 1 }
      var j = 0
      while (j < FeatureDim) { hist(j) = (hist(j) / (end - start).toDouble).toFloat; j += 1 }
      Seq(hist.toSeq)
    }

  private val energySchema = StructType(Seq(
    StructField("doc_id", LongType),
    StructField("frame_no", IntegerType),
    StructField("e_sum", LongType),
    StructField("flen", IntegerType)))

  /** Per-frame energy for "audio" payloads: every `frameBytes` chunk's
    * unsigned-byte sum (EXACT integer — the downstream voiced/silent
    * compare stays in integer arithmetic) plus the chunk length (the
    * last chunk is shorter). Same STUB-codec/real-plumbing contract as
    * [[decodeFeatures]]: a real implementation sums |PCM| here. */
  def frameEnergy(withPayload: DataFrame, frameBytes: Int = 32): DataFrame =
    frameRows(withPayload, "audio/wav", frameBytes, energySchema) { (bytes, start, end) =>
      var s = 0L
      var i = start
      while (i < end) { s += (bytes(i) & 0xFF); i += 1 }
      // Seq[Any] on purpose: a plain Seq(s, end - start) would UNIFY
      // the elements to Long (numeric widening), boxing flen as a Long
      // and failing the IntegerType row encoder at runtime
      Seq[Any](s, end - start)
    }

  /** Per-frame unsigned-byte sum for an arbitrary mime/frame size —
    * [[frameEnergy]]'s kernel generalized so video ops (m16 keyframe
    * selection) can rank frames by the same exact integer energy the
    * audio ops use, over the same [[frameRows]] chunk contract. */
  def frameByteSum(withPayload: DataFrame, mime: String, frameBytes: Int): DataFrame =
    frameRows(withPayload, mime, frameBytes, energySchema) { (bytes, start, end) =>
      var s = 0L
      var i = start
      while (i < end) { s += (bytes(i) & 0xFF); i += 1 }
      Seq[Any](s, end - start)
    }

  /** Frame sampling for "video" payloads: every `stride`-th 64-byte
    * chunk becomes a frame row (explode-shaped; a real impl samples
    * decoded frames the same way). */
  def frameSample(withPayload: DataFrame, stride: Int = 4): DataFrame =
    withPayload
      .filter(col("meta.mime") === "video/mp4")
      .select(col("doc_id"),
        posexplode(sequence(lit(0), ((length(col("payload")) - 1) / 64).cast(IntegerType))).as(Seq("frame_no", "offset")))
      .filter(col("frame_no") % stride === 0)
      .select(col("doc_id"), col("frame_no"),
        (col("offset") * 64).as("byte_offset"))
}
