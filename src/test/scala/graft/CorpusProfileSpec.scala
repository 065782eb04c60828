package graft

import org.apache.spark.sql.functions._
import graft.operators.{Curate, DedupCluster, Profile, Sampling, Similarity, Vocab}

class CorpusProfileSpec extends SparkSpec {

  test("profile: exact nulls/distinct/min/max, one row per column") {
    import spark.implicits._
    val df = Seq((1L, Option("a"), 10L), (2L, Option.empty[String], 20L),
      (3L, Option("b"), 20L)).toDF("id", "s", "v")
    val rows = Profile.profile(df, Seq("id", "s", "v"))
      .collect().map(r => r.getString(0) -> r).toMap
    assert(rows.keySet == Set("id", "s", "v"))
    val id = rows("id")
    assert(id.getLong(1) == 3 && id.getLong(2) == 0 && id.getLong(3) == 3)
    assert(id.getString(4) == "1" && id.getString(5) == "3")
    val s = rows("s")
    assert(s.getLong(2) == 1 && s.getLong(3) == 2)
    assert(s.getString(4) == "a" && s.getString(5) == "b")
    val v = rows("v")
    assert(v.getLong(3) == 2 && v.getString(4) == "10" && v.getString(5) == "20")
  }

  test("profileApprox agrees with exact on small cardinalities (HLL sparse mode)") {
    import spark.implicits._
    val df = (1 to 100).map(i => (i.toLong, s"s${i % 7}")).toDF("id", "s")
    val exact = Profile.profile(df, Seq("id", "s"))
      .select("column", "n_distinct").collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val approx = Profile.profileApprox(df, Seq("id", "s"), rsd = 0.01)
      .select("column", "n_distinct").collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(approx("s") == exact("s"), "7 distinct values must sketch exactly")
    assert(math.abs(approx("id") - exact("id")) <= 2, "100 ids within sketch error")
  }

  test("profileSums: halves merged == one-shot; small cardinalities estimate exactly") {
    import spark.implicits._
    val df = (1 to 300)
      .map(i => (i.toLong, if (i % 5 == 0) None else Some(s"v${i % 11}")))
      .toDF("id", "s")
    def report(d: org.apache.spark.sql.DataFrame) =
      Profile.finalizeProfile(d).collect()
        .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2), r.getLong(3))).toMap
    val whole = report(Profile.profileSums(df, Seq("id", "s")))
    val merged = report(Profile.mergeProfileSums(
      Profile.profileSums(df.filter(col("id") % 2 === 0), Seq("id", "s")),
      Profile.profileSums(df.filter(col("id") % 2 === 1), Seq("id", "s"))))
    assert(merged == whole, "fold of batch states must equal the one-shot profile")
    assert(whole("s") == ((300L, 60L, 11L)), "nulls and sparse-mode HLL are exact here")
    assert(whole("id")._3 == 300L)
  }

  test("lexicalDiversity: hand-computed types/hapax/ttr; token-free docs dropped") {
    import spark.implicits._
    val df = Seq((1L, "a b b c c c"), (2L, "x"), (3L, " \t ")).toDF("doc_id", "text")
    val out = Vocab.lexicalDiversity(df, "doc_id", "text")
      .collect().map(r => r.getLong(0) -> r).toMap
    assert(out.keySet == Set(1L, 2L), "whitespace-only doc has no tokens")
    val d1 = out(1L)
    assert(d1.getLong(1) == 6 && d1.getLong(2) == 3 && d1.getLong(3) == 1)
    assert(d1.getDouble(4) == 0.5 && d1.getDouble(5) == 0.3333)
    val d2 = out(2L)
    assert(d2.getLong(1) == 1 && d2.getLong(2) == 1 && d2.getLong(3) == 1)
    assert(d2.getDouble(4) == 1.0 && d2.getDouble(5) == 1.0)
  }

  test("pmi: hand-computed two-doc corpus, minCount floor applies") {
    import spark.implicits._
    val df = Seq((1L, "a b a b"), (2L, "a c")).toDF("doc_id", "text")
    // unigrams a:3 b:2 c:1 (T1=6); bigrams (a,b):2 (b,a):1 (a,c):1 (T2=4)
    val all = Vocab.pmi(df, "doc_id", "text", minCount = 1)
      .collect().map(r => (r.getString(0), r.getString(1)) -> (r.getLong(2), r.getDouble(3))).toMap
    assert(all.size == 3)
    // pmi(a,b) = ln(2·6·6 / (4·3·2)) = ln(3)
    assert(all(("a", "b"))._1 == 2L)
    assert(math.abs(all(("a", "b"))._2 - math.log(3.0)) < 5e-5)
    // pmi(a,c) = ln(1·36 / (4·3·1)) = ln(3)
    assert(math.abs(all(("a", "c"))._2 - math.log(3.0)) < 5e-5)
    val floored = Vocab.pmi(df, "doc_id", "text", minCount = 2).collect()
    assert(floored.map(r => (r.getString(0), r.getString(1))).toSet == Set(("a", "b")))
  }

  test("boilerplateStrip: over-bar banner erased everywhere, below-bar repeat survives") {
    import spark.implicits._
    val banner = "THE COMMON BANNER SENTENCE"
    val dup = "a repeated organic sentence"
    val docs = Seq(
      (1L, "s1", s"$banner. unique one. $dup"),
      (2L, "s1", s"$banner. unique two. $dup"),
      (3L, "s1", s"$banner. unique three"),
      (4L, "s2", s"$banner. other source")).toDF("doc_id", "source", "text")
    val out = Curate.boilerplateStrip(docs, "doc_id", "text", Seq("source"),
      sep = ". ", minDocs = 3, minUnitChars = 15)
      .collect().map(r => r.getLong(0) -> r).toMap
    // s1: banner hits 3 distinct docs → stripped; dup hits only 2 → kept
    assert(out(1L).getAs[String]("text") == s"unique one. $dup")
    assert(out(1L).getAs[Long]("n_units") == 3 && out(1L).getAs[Long]("n_boiler") == 1)
    assert(out(3L).getAs[String]("text") == "unique three")
    // s2: same banner but document frequency 1 in that scope → untouched
    assert(out(4L).getAs[String]("text") == s"$banner. other source")
    assert(out(4L).getAs[Long]("n_boiler") == 0)
  }

  test("keepBest: highest score wins the cluster, ties break to min id") {
    import spark.implicits._
    val docs = Seq((1L, 5L), (2L, 9L), (3L, 9L), (7L, 1L), (8L, 1L))
      .toDF("doc_id", "n_chars")
    val pairs = Seq((1L, 2L), (2L, 3L), (7L, 8L)).toDF("id_a", "id_b")
    val out = DedupCluster.keepBest(docs, "doc_id", "n_chars", pairs)
      .collect().map(r => r.getLong(0) -> r).toMap
    assert(out(1L).getAs[Long]("kept_id") == 2L, "score 9 beats 5; tie 2 vs 3 → min id")
    assert(out(1L).getAs[Long]("best_score") == 9L && out(1L).getAs[Long]("n_members") == 3L)
    assert(out(7L).getAs[Long]("kept_id") == 7L && out(7L).getAs[Long]("n_members") == 2L)
  }

  test("embeddingDrift: orthogonal centroids → cos 0, hand-computed shifts") {
    import spark.implicits._
    val old = Seq((0L, Seq(1.0f, 0.0f)), (2L, Seq(1.0f, 0.0f))).toDF("vec_id", "embedding")
    val cur = Seq((1L, Seq(0.0f, 1.0f)), (3L, Seq(0.0f, 1.0f))).toDF("vec_id", "embedding")
    val r = Similarity.embeddingDrift(old, cur, "embedding").collect().head
    assert(r.getAs[Long]("n_dims") == 2)
    assert(r.getAs[Double]("cos_centroids") == 0.0)
    assert(r.getAs[Double]("l2_shift") == 1.4142)
    assert(r.getAs[Double]("mean_abs_shift") == 1.0)
    val same = Similarity.embeddingDrift(old, old, "embedding").collect().head
    assert(same.getAs[Double]("cos_centroids") == 1.0)
    assert(same.getAs[Double]("l2_shift") == 0.0)
  }

  test("deterministicShuffle: dense per-shard positions, repartition-stable, seed-sensitive") {
    import spark.implicits._
    val df = (1 to 200).map(_.toLong).toDF("id")
    def run(d: org.apache.spark.sql.DataFrame, seed: String) =
      Sampling.deterministicShuffle(d, col("id"), 4, seed)
        .select("id", "shard", "pos").collect()
        .map(r => r.getLong(0) -> (r.getInt(1), r.getLong(2))).toMap
    val once = run(df, "s1")
    // every shard's positions are exactly 0..count-1
    once.values.groupBy(_._1).foreach { case (_, members) =>
      val ps = members.map(_._2).toSeq.sorted
      assert(ps == (0L until ps.size).toSeq, "positions must be dense per shard")
    }
    assert(run(df.repartition(7), "s1") == once, "pure function of (seed, key)")
    assert(run(df, "s2") != once, "reseeding must permute")
  }
}
