package graft

import org.apache.spark.sql.functions._
import graft.operators.Multimodal

class MultimodalSpec extends SparkSpec {

  private lazy val media =
    Multimodal.fromDocuments(Tables.t(spark, Sf, "documents"), "doc_id", "text")

  test("media layout: binary payload + typed metadata") {
    val schema = media.schema
    assert(schema("payload").dataType.typeName == "binary")
    assert(schema("meta").dataType.typeName == "struct")
    val m = media.select(col("meta.width"), col("meta.n_frames")).head()
    assert(m.getInt(0) >= 1 && m.getInt(1) >= 1)
  }

  test("decodeFeatures is deterministic and batch-shaped") {
    val a = Multimodal.decodeFeatures(media, featDim = 8, batchSize = 32).collect()
    val b = Multimodal.decodeFeatures(media, featDim = 8, batchSize = 7).collect()
    assert(a.length == b.length && a.length == media.count())
    val am = a.map(r => r.getLong(0) -> r.getSeq[Float](2)).toMap
    b.foreach(r => assert(am(r.getLong(0)) == r.getSeq[Float](2)))
    assert(a.forall(_.getSeq[Float](2).length == 8))
  }

  test("n_bytes equals utf-8 payload length") {
    val bad = Multimodal.decodeFeatures(media)
      .join(media.select(col("media_id"), length(col("payload")).as("expect")), "media_id")
      .filter(col("n_bytes") =!= col("expect")).count()
    assert(bad == 0)
  }

  test("resize rewrites payload size and metadata, keeps the rest") {
    val out = Multimodal.resize(media.limit(20), w = 64, h = 32, batchSize = 6)
    assert(out.schema == media.schema) // same layout in, same layout out
    val rows = out.select(col("media_id"), length(col("payload")),
      col("meta.width"), col("meta.height"), col("meta.sample_rate")).collect()
    assert(rows.length == 20)
    rows.foreach { r =>
      assert(r.getInt(1) == 64 * 32 * 3, "payload not target-sized")
      assert(r.getInt(2) == 64 && r.getInt(3) == 32)
      assert(r.getInt(4) == 16000) // untouched metadata survives
    }
    // deterministic across batch sizes
    val again = Multimodal.resize(media.limit(20), w = 64, h = 32, batchSize = 64)
      .select(col("media_id"), md5(col("payload")).as("h")).collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    Multimodal.resize(media.limit(20), w = 64, h = 32, batchSize = 3)
      .select(col("media_id"), md5(col("payload")).as("h")).collect()
      .foreach(r => assert(again(r.getLong(0)) == r.getString(1)))
  }

  private def png(w: Int, h: Int, rgb: Int): Array[Byte] = {
    val img = new java.awt.image.BufferedImage(w, h, java.awt.image.BufferedImage.TYPE_INT_RGB)
    for (y <- 0 until h; x <- 0 until w) img.setRGB(x, y, rgb)
    val buf = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "png", buf)
    buf.toByteArray
  }

  test("real PNG payloads decode through ImageIO with pixel-derived features") {
    import spark.implicits._
    val rows = Seq(
      (1L, png(8, 4, 0xff0000)), // solid red
      (2L, png(3, 3, 0xffffff)), // solid white
      (3L, "definitely not an image payload".getBytes("UTF-8")))
    val media = rows.toDF("media_id", "payload")
    val got = Multimodal.decodeFeatures(media, featDim = 8, batchSize = 2)
      .collect().map(r => r.getLong(0) -> r.getSeq[Float](2)).toMap
    val red = got(1L)
    assert(red(0) == 8.0f && red(1) == 4.0f, "decoded dimensions wrong")
    assert(math.abs(red(2) - 1.0f) < 1e-6f && red(3) == 0.0f && red(4) == 0.0f,
      "channel means must be pixel-derived (pure red)")
    // Rec.601 luma of pure red = 0.299; min == mean == max on a solid fill
    Seq(red(5), red(6), red(7)).foreach(l => assert(math.abs(l - 0.299f) < 1e-4f))
    val white = got(2L)
    assert(white(0) == 3.0f && white(1) == 3.0f && white(2) == 1.0f && white(7) == 1.0f)
    // non-image payloads take the declared stub path, same shape
    assert(got(3L).length == 8)
  }

  private def wav(freqHz: Double, n: Int, rate: Float = 8000f): Array[Byte] = {
    val fmt = new javax.sound.sampled.AudioFormat(rate, 16, 1, true, false)
    val samples = new Array[Byte](n * 2)
    for (i <- 0 until n) {
      val v = (math.sin(2 * math.Pi * freqHz * i / rate) * 16384).toInt.toShort
      samples(2 * i) = (v & 0xff).toByte
      samples(2 * i + 1) = ((v >> 8) & 0xff).toByte
    }
    val ais = new javax.sound.sampled.AudioInputStream(
      new java.io.ByteArrayInputStream(samples), fmt, n.toLong)
    val buf = new java.io.ByteArrayOutputStream()
    javax.sound.sampled.AudioSystem.write(
      ais, javax.sound.sampled.AudioFileFormat.Type.WAVE, buf)
    buf.toByteArray
  }

  test("real WAV payloads decode through javax.sound with sample-derived features") {
    import spark.implicits._
    val media = Seq((1L, wav(440.0, 4000))).toDF("media_id", "payload")
    val f = Multimodal.decodeFeatures(media, featDim = 8).collect().head.getSeq[Float](2)
    assert(f(0) == 8000.0f, "sample rate not decoded")
    assert(f(1) == 1.0f, "channel count not decoded")
    assert(f(2) == 4000.0f, "frame count not decoded")
    // a 0.5-amplitude sine: mean|x| = 2/π·A ≈ 0.318, rms = A/√2 ≈ 0.354
    assert(math.abs(f(3) - 0.318f) < 0.01f, s"mean amplitude ${f(3)} not sample-derived")
    assert(math.abs(f(4) - 0.354f) < 0.01f, s"rms ${f(4)} not sample-derived")
    assert(math.abs(f(5) - 0.5f) < 0.01f, s"peak ${f(5)} not sample-derived")
    // 440 Hz at 8 kHz crosses zero ~2·440/8000 ≈ 0.11 per sample
    assert(math.abs(f(6) - 0.11f) < 0.01f, s"zero-crossing rate ${f(6)} off")
    assert(f(7) == 16.0f)
  }

  test("resize really rescales decodable images and re-encodes as PNG") {
    import spark.implicits._
    val src = Seq((1L, png(8, 4, 0xff0000))).toDF("media_id", "payload")
      .select(col("media_id"), col("payload"),
        struct(lit("image").as("modality"), lit(8).as("width"), lit(4).as("height"),
          lit(16000).as("sample_rate"), lit(1).as("n_frames")).as("meta"))
    val out = Multimodal.resize(src, w = 4, h = 2).collect().head
    val back = javax.imageio.ImageIO.read(
      new java.io.ByteArrayInputStream(out.getAs[Array[Byte]](1)))
    assert(back != null, "resized payload is not a decodable PNG")
    assert(back.getWidth == 4 && back.getHeight == 2)
    for (y <- 0 until 2; x <- 0 until 4)
      assert((back.getRGB(x, y) & 0xffffff) == 0xff0000, s"pixel ($x,$y) lost its color")
    val meta = out.getStruct(2)
    assert(meta.getInt(1) == 4 && meta.getInt(2) == 2 && meta.getInt(3) == 16000)
  }

  test("fromBinaryFiles ingests a media directory with probed metadata") {
    val dir = new java.io.File("/tmp/graft_media_ingest")
    dir.mkdirs()
    java.nio.file.Files.write(new java.io.File(dir, "red.png").toPath, png(8, 4, 0xff0000))
    java.nio.file.Files.write(new java.io.File(dir, "tone.wav").toPath, wav(440.0, 1000))
    java.nio.file.Files.write(new java.io.File(dir, "junk.bin").toPath, "not media".getBytes)
    val media = graft.operators.Multimodal.fromBinaryFiles(spark, dir.getAbsolutePath)
    val byName = media.collect().map { r =>
      val name = r.getString(2).split('/').last
      name -> r.getStruct(3)
    }.toMap
    assert(byName.size == 3)
    val img = byName("red.png")
    assert(img.getString(0) == "image" && img.getInt(1) == 8 && img.getInt(2) == 4)
    val au = byName("tone.wav")
    assert(au.getString(0) == "audio" && au.getInt(3) == 8000 && au.getInt(4) == 1000)
    assert(byName("junk.bin").getString(0) == "unknown")
    // the glob prunes at the file listing, before any bytes are read
    val onlyPng = graft.operators.Multimodal.fromBinaryFiles(
      spark, dir.getAbsolutePath, pathGlob = "*.png")
    assert(onlyPng.count() == 1)
  }

  private def gradientPng(f: (Int, Int) => Int, size: Int = 24): Array[Byte] = {
    val img = new java.awt.image.BufferedImage(size, size,
      java.awt.image.BufferedImage.TYPE_INT_RGB)
    for (y <- 0 until size; x <- 0 until size) {
      val v = math.max(0, math.min(255, f(x, y)))
      img.setRGB(x, y, (v << 16) | (v << 8) | v)
    }
    val buf = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "png", buf)
    buf.toByteArray
  }

  test("dHash pairs near-identical images, separates distinct ones") {
    import spark.implicits._
    val base = gradientPng((x, y) => x * 10 + y * 3)
    // local brightness bump: a small perceptual change
    val near = gradientPng((x, y) =>
      x * 10 + y * 3 + (if (x >= 12 && x < 18 && y >= 9 && y < 12) 60 else 0))
    val diff = gradientPng((x, y) => 255 - x * 10 + (x * y) % 7)
    val media = Seq(
      (1L, base), (2L, near), (3L, diff),
      // non-image payloads: exact duplicates pair via the stub
      // fingerprint, and never pair with real images
      (10L, "same text payload".getBytes("UTF-8")),
      (11L, "same text payload".getBytes("UTF-8")),
      (12L, "other text payload".getBytes("UTF-8"))
    ).toDF("media_id", "payload")
    val pairs = graft.operators.Dedup.phashPairs(media, maxHamming = 4)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getInt(2)).toMap
    assert(pairs.contains((1L, 2L)), s"near-identical images must pair, got $pairs")
    assert(pairs((1L, 2L)) <= 4)
    assert(pairs.contains((10L, 11L)) && pairs((10L, 11L)) == 0L)
    assert(pairs.keySet == Set((1L, 2L), (10L, 11L)),
      s"distinct images / texts must not pair, got $pairs")
    // dHash is stable under PNG re-encode (decode → encode → decode)
    val img = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(base))
    val buf = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "png", buf)
    val re = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(buf.toByteArray))
    assert(Multimodal.dHash64(img) == Multimodal.dHash64(re))
  }

  private def wavEnv(n: Int, envelope: Int => Double, rate: Float = 8000f): Array[Byte] = {
    val fmt = new javax.sound.sampled.AudioFormat(rate, 16, 1, true, false)
    val samples = new Array[Byte](n * 2)
    for (i <- 0 until n) {
      val v = (math.sin(2 * math.Pi * 440.0 * i / rate) * envelope(i) * 32767).toInt.toShort
      samples(2 * i) = (v & 0xff).toByte
      samples(2 * i + 1) = ((v >> 8) & 0xff).toByte
    }
    val ais = new javax.sound.sampled.AudioInputStream(
      new java.io.ByteArrayInputStream(samples), fmt, n.toLong)
    val buf = new java.io.ByteArrayOutputStream()
    javax.sound.sampled.AudioSystem.write(
      ais, javax.sound.sampled.AudioFileFormat.Type.WAVE, buf)
    buf.toByteArray
  }

  test("audio energy hash pairs volume-scaled audio, separates different envelopes") {
    import spark.implicits._
    val n = 13000
    val rising = wavEnv(n, i => 0.9 * i / n)
    val quiet = wavEnv(n, i => 0.3 * i / n)   // same envelope shape, 1/3 volume
    val falling = wavEnv(n, i => 0.9 * (n - i) / n)
    val media = Seq((1L, rising), (2L, quiet), (3L, falling))
      .toDF("media_id", "payload")
    val pairs = graft.operators.Dedup.phashPairs(media, maxHamming = 4)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getInt(2)).toMap
    assert(pairs.contains((1L, 2L)), s"volume-scaled audio must pair, got $pairs")
    assert(pairs.keySet == Set((1L, 2L)),
      s"opposite envelopes must not pair, got $pairs")
  }

  test("syntheticImages corpus: only same-base images pair under phash") {
    val docs = Tables.t(spark, Sf, "documents").limit(200)
    val synth = Multimodal.syntheticImages(docs, "doc_id", bases = 40)
    assert(synth.count() == 200)
    val pairs = graft.operators.Dedup.phashPairs(synth, maxHamming = 4).collect()
    assert(pairs.nonEmpty, "planted duplicates must be found")
    pairs.foreach { r =>
      assert(r.getLong(0) % 40 == r.getLong(1) % 40,
        s"pair (${r.getLong(0)}, ${r.getLong(1)}) crosses bases")
    }
    // identical (base, variant) renders → identical PNG → hamming 0
    val zero = pairs.filter(_.getInt(2) == 0)
    assert(zero.nonEmpty)
  }

  test("hammingBucketStats surfaces what the bucket cap drops") {
    import spark.implicits._
    // 50 identical signatures collide in every chunk; a cap of 10
    // drops them all and the stats must say so
    val sigs = (1L to 50L).map(i => (i, 0x0f0f0f0f0f0f0f0fL)).toDF("id", "sig")
    val stats = graft.operators.Dedup
      .hammingBucketStats(sigs, maxHamming = 3, maxBucketSize = 10).collect()
    assert(stats.length == 4) // maxHamming + 1 chunks
    stats.foreach { r =>
      assert(r.getAs[Long]("dropped_rows") == 50L)
      assert(r.getAs[Double]("dropped_fraction") == 1.0)
      assert(r.getAs[Long]("candidate_pairs") == 0L)
    }
    // under a loose cap nothing drops and the pair volume is C(50,2)
    val loose = graft.operators.Dedup
      .hammingBucketStats(sigs, maxHamming = 3, maxBucketSize = 1000).collect()
    loose.foreach { r =>
      assert(r.getAs[Long]("dropped_rows") == 0L)
      assert(r.getAs[Long]("candidate_pairs") == 50L * 49 / 2)
    }
  }

  test("sampleFrames emits ceil(n_frames/everyN) rows per media") {
    val counts = Multimodal.sampleFrames(media, everyN = 10)
      .groupBy(col("media_id"), col("n_frames")).agg(count(lit(1)).as("k")).collect()
    counts.foreach { r =>
      val expected = (r.getInt(1) + 9) / 10
      assert(r.getLong(2) == expected)
    }
  }
}
