package graft.operators

import org.apache.spark.sql.{DataFrame, Encoders, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal column support (SURVEY.md §2.3): image/audio/video as
  * opaque `binary` payloads plus a typed metadata struct. The Spark
  * plumbing — schema, batched mapPartitions iteration, partition-size
  * control — is real and tested; the codec itself is a clearly-marked
  * deterministic STUB because this container ships no image/audio
  * libraries. Swapping `stubDecode` for a real JNI/ffmpeg decoder
  * changes no plan shape.
  */
object Multimodal {

  val MetaSchema: StructType = StructType(Seq(
    StructField("modality", StringType),
    StructField("width", IntegerType),
    StructField("height", IntegerType),
    StructField("sample_rate", IntegerType),
    StructField("n_frames", IntegerType)))

  /** Wrap a text corpus into the multimodal layout (payload = utf-8
    * bytes) so the pipeline shape is exercised end-to-end on testdata. */
  def fromDocuments(docs: DataFrame, idCol: String, textCol: String): DataFrame =
    docs.select(
      col(idCol).as("media_id"),
      encode(col(textCol), "UTF-8").as("payload"),
      struct(
        lit("image").as("modality"),
        (pmod(xxhash64(col(textCol)), lit(1920L)) + 1).cast("int").as("width"),
        (pmod(xxhash64(col(textCol), lit(1)), lit(1080L)) + 1).cast("int").as("height"),
        lit(16000).as("sample_rate"),
        (pmod(xxhash64(col(textCol), lit(2)), lit(300L)) + 1).cast("int").as("n_frames")).as("meta"))

  /** STUB decoder: a real implementation would hand `payload` to an
    * image/audio codec. Deterministic fake: feature f(i) derived from
    * payload bytes — keeps tests reproducible while exercising the
    * exact batch shape a real decoder needs. */
  private def stubDecode(payload: Array[Byte], featDim: Int): Array[Float] = {
    var h = 1125899906842597L
    var i = 0
    while (i < payload.length) { h = 31 * h + payload(i); i += 1 }
    Array.tabulate(featDim) { d =>
      val x = h ^ (d.toLong * 0x9e3779b97f4a7c15L)
      ((x % 1000).toFloat) / 1000.0f
    }
  }

  /** Decode + feature-extract over batches. Batched iteration inside
    * mapPartitions mirrors how a real decoder amortizes codec init per
    * batch, not per row; `batchSize` bounds peak memory per task. */
  def decodeFeatures(media: DataFrame, featDim: Int = 8, batchSize: Int = 64): DataFrame = {
    val outSchema = StructType(Seq(
      StructField("media_id", LongType),
      StructField("n_bytes", IntegerType),
      StructField("features", ArrayType(FloatType))))
    val enc = Encoders.row(outSchema)
    val idIdx = media.schema.fieldIndex("media_id")
    val payloadIdx = media.schema.fieldIndex("payload")
    media.mapPartitions { rows =>
      rows.grouped(batchSize).flatMap { batch =>
        // (real codec: init once per batch here)
        batch.iterator.map { r =>
          val payload = r.getAs[Array[Byte]](payloadIdx)
          Row(r.getLong(idIdx), payload.length, stubDecode(payload, featDim).toSeq)
        }
      }
    }(enc)
  }

  /** STUB resize: a real implementation would decode, rescale, and
    * re-encode `payload`. The deterministic fake emits a w×h×3 buffer
    * sampled from the source bytes, so output size scales with the
    * target dimensions exactly as a real RGB resize would. */
  private def stubResize(payload: Array[Byte], w: Int, h: Int): Array[Byte] = {
    val out = new Array[Byte](w * h * 3)
    if (payload.nonEmpty) {
      var i = 0
      while (i < out.length) {
        out(i) = payload((i * 2654435761L % payload.length).toInt.abs)
        i += 1
      }
    }
    out
  }

  /** Resize image-like payloads to `w`×`h`: new payload from the codec
    * stub, metadata struct rewritten to the target dimensions. Same
    * batched mapPartitions shape as [[decodeFeatures]] — a real codec
    * inits once per batch; no shuffle, runs inside the scan stage. */
  def resize(media: DataFrame, w: Int, h: Int, batchSize: Int = 64): DataFrame = {
    val enc = Encoders.row(StructType(media.schema.fields.toSeq.toArray))
    val payloadIdx = media.schema.fieldIndex("payload")
    val metaIdx = media.schema.fieldIndex("meta")
    // resolve the width/height slots by NAME from the actual struct
    // schema — positional writes would silently scramble metadata on
    // any source with a different field order
    val metaSchema = media.schema(metaIdx).dataType.asInstanceOf[StructType]
    val wIdx = metaSchema.fieldIndex("width")
    val hIdx = metaSchema.fieldIndex("height")
    media.mapPartitions { rows =>
      rows.grouped(batchSize).flatMap { batch =>
        // (real codec: init once per batch here)
        batch.iterator.map { r =>
          val meta = r.getStruct(metaIdx)
          val metaVals = meta.toSeq.toArray
          metaVals(wIdx) = w
          metaVals(hIdx) = h
          val vals = r.toSeq.toArray
          vals(payloadIdx) = stubResize(r.getAs[Array[Byte]](payloadIdx), w, h)
          vals(metaIdx) = Row.fromSeq(metaVals.toSeq)
          Row.fromSeq(vals.toSeq)
        }
      }
    }(enc)
  }

  /** Frame sampling for video-like payloads: emit `everyN`-th frame
    * index with a per-frame stub feature hash — plan shape of a frame
    * extractor (explode on a generated sequence; no shuffle). */
  def sampleFrames(media: DataFrame, everyN: Int = 10): DataFrame =
    media.select(
      col("media_id"),
      col("meta.n_frames").as("n_frames"),
      explode(sequence(lit(0), col("meta.n_frames") - 1, lit(everyN))).as("frame_idx"))
      .withColumn("frame_hash", xxhash64(col("media_id"), col("frame_idx")))
}
