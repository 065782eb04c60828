package graft.operators

import org.apache.spark.sql.{DataFrame, Encoders, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import java.awt.image.BufferedImage
import java.io.{ByteArrayInputStream, ByteArrayOutputStream}
import javax.imageio.ImageIO

/** Multimodal column support (SURVEY.md §2.3): image/audio/video as
  * opaque `binary` payloads plus a typed metadata struct.
  *
  * Images are decoded for REAL via the JDK's `javax.imageio` codecs
  * (PNG/JPEG/BMP/GIF — no external dependency): `decodeFeatures`
  * extracts pixel-derived statistics and `resize` rescales through
  * `java.awt` and re-encodes as PNG. Audio is decoded for real too,
  * via `javax.sound.sampled` (WAV/AIFF/AU): sample-derived amplitude
  * statistics. Payloads no JDK reader recognizes (video, raw text)
  * fall back to a clearly-marked deterministic stub so the batch
  * plumbing — schema, batched mapPartitions iteration, partition-size
  * control — is exercised end-to-end on any corpus; swapping the
  * fallback for a JNI/ffmpeg decoder changes no plan shape.
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

  /** Ingest a directory of media files through Spark's `binaryFile`
    * source into the multimodal layout: payload = file bytes, id =
    * hash of the path (stable across reruns), metadata probed from the
    * decoded header where the JDK has a codec. The real ingestion path
    * for images: pair with [[decodeFeatures]]/[[resize]] downstream.
    * `pathGlob` prunes at the listing (e.g. "*.png") so non-matching
    * files are never read. */
  def fromBinaryFiles(
      spark: org.apache.spark.sql.SparkSession,
      path: String,
      pathGlob: String = "*"): DataFrame = {
    val raw = spark.read.format("binaryFile")
      .option("pathGlobFilter", pathGlob)
      .load(path)
      .select(
        xxhash64(col("path")).as("media_id"),
        col("content").as("payload"),
        col("path"))
    val outSchema = StructType(raw.schema.fields :+ StructField("meta", MetaSchema))
    val enc = Encoders.row(outSchema)
    raw.mapPartitions { rows =>
      ImageIO.setUseCache(false)
      rows.map { r =>
        val payload = r.getAs[Array[Byte]](1)
        val meta = tryDecodeImage(payload) match {
          case Some(img) => Row("image", img.getWidth, img.getHeight, null, null)
          case None => tryDecodeAudio(payload) match {
            case Some((fmt, pcm)) =>
              Row("audio", null, null, fmt.getSampleRate.toInt,
                pcm.length / math.max(1, fmt.getFrameSize))
            case None => Row("unknown", null, null, null, null)
          }
        }
        Row(r.getLong(0), payload, r.getString(2), meta)
      }
    }(enc)
  }

  /** ImageIO probes the payload's magic bytes against the JDK's
    * registered readers; None = not a decodable image (the stub path).
    * Disk caching is off — temp-file spills per decode would dominate
    * executor I/O at scale. */
  private def tryDecodeImage(payload: Array[Byte]): Option[BufferedImage] =
    try Option(ImageIO.read(new ByteArrayInputStream(payload)))
    catch { case _: Exception => None }

  /** Pixel-derived feature vector, truncated / zero-padded to featDim:
    * [width, height, meanR, meanG, meanB, meanLuma, minLuma, maxLuma]
    * with channel means normalized to [0,1] and dimensions in pixels.
    * One getRGB pass; Rec.601 luma. */
  private def imageFeatures(img: BufferedImage, featDim: Int): Array[Float] = {
    val w = img.getWidth
    val h = img.getHeight
    var sr, sg, sb = 0.0
    var minL = 255.0
    var maxL = 0.0
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) {
        val rgb = img.getRGB(x, y)
        val r = (rgb >> 16) & 0xff
        val g = (rgb >> 8) & 0xff
        val b = rgb & 0xff
        sr += r; sg += g; sb += b
        val l = 0.299 * r + 0.587 * g + 0.114 * b
        if (l < minL) minL = l
        if (l > maxL) maxL = l
        x += 1
      }
      y += 1
    }
    val n = w.toDouble * h
    val stats = Array(
      w.toFloat, h.toFloat,
      (sr / n / 255.0).toFloat, (sg / n / 255.0).toFloat, (sb / n / 255.0).toFloat,
      ((0.299 * sr + 0.587 * sg + 0.114 * sb) / n / 255.0).toFloat,
      (minL / 255.0).toFloat, (maxL / 255.0).toFloat)
    Array.tabulate(featDim)(d => if (d < stats.length) stats(d) else 0.0f)
  }

  /** 64-bit difference hash (dHash) over the decoded pixels: bilinear
    * rescale to 9×8 grayscale, one bit per horizontal neighbor pair
    * (right brighter than left). The standard cheap perceptual hash —
    * stable under re-encode, resize, and small brightness shifts
    * (a uniform shift moves both neighbors, so gradient SIGNS hold). */
  def dHash64(img: BufferedImage): Long = {
    val s = new BufferedImage(9, 8, BufferedImage.TYPE_INT_RGB)
    val g = s.createGraphics()
    try {
      g.setRenderingHint(java.awt.RenderingHints.KEY_INTERPOLATION,
        java.awt.RenderingHints.VALUE_INTERPOLATION_BILINEAR)
      g.drawImage(img, 0, 0, 9, 8, null)
    } finally g.dispose()
    val gray = Array.ofDim[Double](8, 9)
    var y = 0
    while (y < 8) {
      var x = 0
      while (x < 9) {
        val rgb = s.getRGB(x, y)
        gray(y)(x) = 0.299 * ((rgb >> 16) & 0xff) + 0.587 * ((rgb >> 8) & 0xff) +
          0.114 * (rgb & 0xff)
        x += 1
      }
      y += 1
    }
    var bits = 0L
    var i = 0
    while (i < 64) {
      val yy = i / 8
      val xx = i % 8
      if (gray(yy)(xx + 1) > gray(yy)(xx)) bits |= (1L << i)
      i += 1
    }
    bits
  }

  /** 64-bit audio perceptual hash — the audio face of [[dHash64]]: the
    * signal's ENERGY CONTOUR. PCM samples split into 65 equal windows,
    * bit i set when energy rises from window i to i+1. A volume change
    * scales every window's energy by the same factor, so the comparison
    * bits survive it; a different envelope (rhythm, fades, speech
    * cadence) flips them. Deliberately envelope-only: a spectral
    * fingerprint (spectrogram peak constellations) is the
    * higher-recall production upgrade, but it changes no plan shape —
    * the hash is still one long computed scan-side. Payloads shorter
    * than one sample per window fall back to the exact fingerprint. */
  def aHash64(fmt: javax.sound.sampled.AudioFormat, pcm: Array[Byte]): Long = {
    val bytesPerSample = math.max(1, fmt.getSampleSizeInBits / 8)
    val unsigned =
      fmt.getEncoding == javax.sound.sampled.AudioFormat.Encoding.PCM_UNSIGNED
    val n = pcm.length / bytesPerSample
    val win = n / 65
    if (win == 0) return stubHash64(pcm)
    val energy = new Array[Double](65)
    var w = 0
    while (w < 65) {
      var e = 0.0
      var i = w * win
      val end = i + win
      while (i < end) {
        val v: Double =
          if (bytesPerSample >= 2) {
            val off = i * bytesPerSample
            val (hiOff, loOff) =
              if (fmt.isBigEndian) (off, off + 1)
              else (off + bytesPerSample - 1, off + bytesPerSample - 2)
            val hi = if (unsigned) (pcm(hiOff) & 0xff) ^ 0x80 else pcm(hiOff).toInt
            ((hi << 8) | (pcm(loOff) & 0xff)).toShort / 32768.0
          } else if (unsigned) ((pcm(i) & 0xff) - 128) / 128.0
          else pcm(i) / 128.0
        e += v * v
        i += 1
      }
      energy(w) = e
      w += 1
    }
    var bits = 0L
    var b = 0
    while (b < 64) {
      if (energy(b + 1) > energy(b)) bits |= (1L << b)
      b += 1
    }
    bits
  }

  /** Deterministic 64-bit fallback fingerprint for payloads no codec
    * reads (same rolling hash as [[stubDecode]]): exact-duplicate
    * payloads still collide at hamming 0, so non-media rows keep the
    * exact-dup property while never pairing with real media. */
  private def stubHash64(payload: Array[Byte]): Long = {
    var h = 1125899906842597L
    var i = 0
    while (i < payload.length) { h = 31 * h + payload(i); i += 1 }
    h
  }

  /** (media_id, sig) perceptual-hash fingerprints: real dHash for every
    * JDK-decodable image, the energy-contour [[aHash64]] for decodable
    * audio, the stub fingerprint otherwise. Modalities can't cross-pair:
    * image bits come from pixel gradients, audio bits from energy
    * deltas — a collision within the hamming budget is astronomically
    * unlikely across hash families. Scan-local mapPartitions like
    * [[decodeFeatures]] — the hash leaves the stage, the pixels/samples
    * never do (at 100 TB the 8-byte signature is what shuffles through
    * the dedup band join, not the payloads). */
  def dHashes(media: DataFrame, idCol: String = "media_id",
      payloadCol: String = "payload"): DataFrame = {
    val outSchema = StructType(Seq(
      StructField("id", media.schema(idCol).dataType),
      StructField("sig", LongType)))
    val enc = Encoders.row(outSchema)
    val idIdx = media.schema.fieldIndex(idCol)
    val payloadIdx = media.schema.fieldIndex(payloadCol)
    media.mapPartitions { rows =>
      ImageIO.setUseCache(false)
      rows.map { r =>
        val payload = r.getAs[Array[Byte]](payloadIdx)
        // null payloads share one sentinel signature: they pair with
        // each other (exact-dup semantics) and nothing else
        val sig =
          if (payload == null) stubHash64(Array.emptyByteArray)
          else tryDecodeImage(payload) match {
            case Some(img) => dHash64(img)
            case None => tryDecodeAudio(payload) match {
              case Some((fmt, pcm)) => aHash64(fmt, pcm)
              case None => stubHash64(payload)
            }
          }
        Row(r.get(idIdx), sig)
      }
    }(enc)
  }

  /** Deterministic synthetic PNG corpus derived from an id column: ids
    * sharing `id % bases` render the same blocky pattern, and
    * `(id / bases) % 3` applies a small local brightness perturbation —
    * planted near-duplicates with real PNG encode/decode end to end.
    * This is the image-dedup test corpus (the testdata tables carry no
    * image payloads); production corpora arrive via [[fromBinaryFiles]]. */
  def syntheticImages(docs: DataFrame, idCol: String, bases: Int = 40,
      size: Int = 24): DataFrame = {
    val outSchema = StructType(Seq(
      StructField("media_id", LongType),
      StructField("payload", BinaryType),
      StructField("meta", MetaSchema)))
    val enc = Encoders.row(outSchema)
    val in = docs.select(col(idCol).cast("long").as("id"))
    in.mapPartitions { rows =>
      ImageIO.setUseCache(false)
      rows.map { r =>
        val id = r.getLong(0)
        val base = (id % bases).toInt
        val variant = ((id / bases) % 3).toInt
        val img = new BufferedImage(size, size, BufferedImage.TYPE_INT_RGB)
        var y = 0
        while (y < size) {
          var x = 0
          while (x < size) {
            // blocky per-base pattern: structure survives the 9×8 rescale
            val bx = x / 3
            val by = y / 3
            var v = (bx * 37 + by * 101 + (bx * by + 1) * (base * 31 + 7)) % 241
            // variant: brighten one 6-wide column band — a LOCAL change
            // that flips only the gradient bits at the band's edges
            if (variant > 0 && x / 6 == variant && y < 6) v = math.min(255, v + 90)
            img.setRGB(x, y, (v << 16) | (v << 8) | v)
            x += 1
          }
          y += 1
        }
        val buf = new ByteArrayOutputStream()
        ImageIO.write(img, "png", buf)
        Row(id, buf.toByteArray, Row("image", size, size, null, null))
      }
    }(enc)
  }

  /** WAV/AIFF/AU decode through the JDK's `javax.sound.sampled` — the
    * second real codec path; None = not a decodable audio payload. */
  private def tryDecodeAudio(
      payload: Array[Byte]): Option[(javax.sound.sampled.AudioFormat, Array[Byte])] =
    try {
      val in = javax.sound.sampled.AudioSystem.getAudioInputStream(
        new ByteArrayInputStream(payload))
      // close on BOTH paths: a truncated header can pass
      // getAudioInputStream and then throw mid-readAllBytes, and this
      // runs inside a hot mapPartitions loop
      try Some((in.getFormat, in.readAllBytes()))
      finally in.close()
    } catch { case _: Exception => None }

  /** Sample-derived audio feature vector, truncated / zero-padded to
    * featDim: [sampleRate, channels, nFrames, meanAbs, rms, maxAbs,
    * zeroCrossingRate, sampleSizeInBits] with amplitudes normalized to
    * [-1, 1]. Handles 16-bit signed and 8-bit PCM either signedness. */
  private def audioFeatures(
      fmt: javax.sound.sampled.AudioFormat,
      pcm: Array[Byte],
      featDim: Int): Array[Float] = {
    val bytesPerSample = math.max(1, fmt.getSampleSizeInBits / 8)
    val unsigned =
      fmt.getEncoding == javax.sound.sampled.AudioFormat.Encoding.PCM_UNSIGNED
    val n = pcm.length / bytesPerSample
    var sumAbs, sumSq, maxAbs = 0.0
    var zc = 0
    var prevSign = 0
    var i = 0
    while (i < n) {
      val v: Double =
        if (bytesPerSample >= 2) {
          val off = i * bytesPerSample
          // use the two most significant bytes whatever the width
          val (hiOff, loOff) = if (fmt.isBigEndian) (off, off + 1) else (off + bytesPerSample - 1, off + bytesPerSample - 2)
          // unsigned PCM stores amplitude offset by 2^(bits-1): flipping
          // the high byte's sign bit re-centers it to two's complement,
          // so multi-byte PCM_UNSIGNED streams land in [-1, 1) too
          val hi = if (unsigned) (pcm(hiOff) & 0xff) ^ 0x80 else pcm(hiOff).toInt
          ((hi << 8) | (pcm(loOff) & 0xff)).toShort / 32768.0
        } else if (unsigned) ((pcm(i) & 0xff) - 128) / 128.0
        else pcm(i) / 128.0
      val a = math.abs(v)
      sumAbs += a
      sumSq += v * v
      if (a > maxAbs) maxAbs = a
      val sign = if (v > 0) 1 else if (v < 0) -1 else 0
      if (sign != 0 && prevSign != 0 && sign != prevSign) zc += 1
      if (sign != 0) prevSign = sign
      i += 1
    }
    val nn = math.max(1, n).toDouble
    val frames = pcm.length / math.max(1, fmt.getFrameSize)
    val stats = Array(
      fmt.getSampleRate, fmt.getChannels.toFloat, frames.toFloat,
      (sumAbs / nn).toFloat, math.sqrt(sumSq / nn).toFloat, maxAbs.toFloat,
      (zc / nn).toFloat, fmt.getSampleSizeInBits.toFloat)
    Array.tabulate(featDim)(d => if (d < stats.length) stats(d) else 0.0f)
  }

  /** STUB fallback for payloads no JDK codec recognizes (video):
    * feature f(i) derived from payload bytes — deterministic, same
    * batch shape a real decoder needs. */
  private def stubDecode(payload: Array[Byte], featDim: Int): Array[Float] = {
    var h = 1125899906842597L
    var i = 0
    while (i < payload.length) { h = 31 * h + payload(i); i += 1 }
    Array.tabulate(featDim) { d =>
      val x = h ^ (d.toLong * 0x9e3779b97f4a7c15L)
      ((x % 1000).toFloat) / 1000.0f
    }
  }

  /** Decode + feature-extract over batches: real pixel statistics for
    * JDK-decodable images, real sample statistics for JDK-decodable
    * audio, the stub only for what the JDK can't read (video). Batched
    * iteration inside mapPartitions mirrors how a real decoder
    * amortizes codec init per batch, not per row; `batchSize` bounds
    * peak memory per task. */
  def decodeFeatures(media: DataFrame, featDim: Int = 8, batchSize: Int = 64): DataFrame = {
    val outSchema = StructType(Seq(
      StructField("media_id", LongType),
      StructField("n_bytes", IntegerType),
      StructField("features", ArrayType(FloatType))))
    val enc = Encoders.row(outSchema)
    val idIdx = media.schema.fieldIndex("media_id")
    val payloadIdx = media.schema.fieldIndex("payload")
    media.mapPartitions { rows =>
      ImageIO.setUseCache(false) // once per task; decodes stay on-heap
      rows.grouped(batchSize).flatMap { batch =>
        // (heavier codecs: init once per batch here)
        batch.iterator.map { r =>
          val payload = r.getAs[Array[Byte]](payloadIdx)
          val feats = tryDecodeImage(payload)
            .map(imageFeatures(_, featDim))
            .orElse(tryDecodeAudio(payload).map {
              case (fmt, pcm) => audioFeatures(fmt, pcm, featDim)
            })
            .getOrElse(stubDecode(payload, featDim))
          Row(r.getLong(idIdx), payload.length, feats.toSeq)
        }
      }
    }(enc)
  }

  /** Real image rescale: area-quality scaling through java.awt, re-encoded
    * as PNG (deterministic — PNG encoding is exact, unlike JPEG). */
  private def imageResize(img: BufferedImage, w: Int, h: Int): Array[Byte] = {
    val out = new BufferedImage(w, h, BufferedImage.TYPE_INT_RGB)
    val g = out.createGraphics()
    try {
      g.setRenderingHint(java.awt.RenderingHints.KEY_INTERPOLATION,
        java.awt.RenderingHints.VALUE_INTERPOLATION_BILINEAR)
      g.drawImage(img, 0, 0, w, h, null)
    } finally g.dispose()
    val buf = new ByteArrayOutputStream()
    ImageIO.write(out, "png", buf)
    buf.toByteArray
  }

  /** STUB resize fallback for non-image payloads: emits a w×h×3 buffer
    * sampled from the source bytes, so output size scales with the
    * target dimensions exactly as a raw RGB resize would. */
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

  /** Resize image-like payloads to `w`×`h`: decodable images go through
    * the real ImageIO scale + PNG re-encode, the rest through the stub;
    * the metadata struct is rewritten to the target dimensions either
    * way. Same batched mapPartitions shape as [[decodeFeatures]] — no
    * shuffle, runs inside the scan stage. */
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
      ImageIO.setUseCache(false)
      rows.grouped(batchSize).flatMap { batch =>
        // (heavier codecs: init once per batch here)
        batch.iterator.map { r =>
          val payload = r.getAs[Array[Byte]](payloadIdx)
          val resized = tryDecodeImage(payload) match {
            case Some(img) => imageResize(img, w, h)
            case None => stubResize(payload, w, h)
          }
          val meta = r.getStruct(metaIdx)
          val metaVals = meta.toSeq.toArray
          metaVals(wIdx) = w
          metaVals(hIdx) = h
          val vals = r.toSeq.toArray
          vals(payloadIdx) = resized
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
