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

  test("sampleFrames emits ceil(n_frames/everyN) rows per media") {
    val counts = Multimodal.sampleFrames(media, everyN = 10)
      .groupBy(col("media_id"), col("n_frames")).agg(count(lit(1)).as("k")).collect()
    counts.foreach { r =>
      val expected = (r.getInt(1) + 9) / 10
      assert(r.getLong(2) == expected)
    }
  }
}
