package graft

import org.apache.spark.sql.functions._
import graft.operators.FastTextQuality

class FastTextQualitySpec extends SparkSpec {

  // two disjoint vocabularies: the model must learn to separate them
  // from the hashed n-gram bag alone (no engineered signals)
  private val goodVocab = Vector("alpha", "beta", "gamma", "delta", "epsilon")
  private val badVocab = Vector("zork", "quux", "blarg", "frob", "wibble")
  private def doc(vocab: Vector[String], seed: Int): String = {
    val rnd = new scala.util.Random(seed)
    Seq.fill(12)(vocab(rnd.nextInt(vocab.size))).mkString(" ")
  }

  private def trainingFrame = {
    import spark.implicits._
    val rows =
      (0 until 40).map(i => (i.toLong, doc(goodVocab, i), 1)) ++
      (0 until 40).map(i => (100L + i, doc(badVocab, 1000 + i), 0))
    rows.toDF("doc_id", "text", "label")
  }

  test("separation: held-out docs from each vocabulary score apart") {
    import spark.implicits._
    val w = FastTextQuality.train(trainingFrame, "label", "text", "doc_id",
      numBuckets = 1 << 12)
    val held =
      (0 until 10).map(i => (doc(goodVocab, 5000 + i), 1)) ++
      (0 until 10).map(i => (doc(badVocab, 6000 + i), 0))
    val scored = held.toDF("text", "label")
      .select(col("label"), FastTextQuality.score(w, col("text")).as("s"))
      .collect().map(r => r.getInt(0) -> r.getDouble(1))
    val good = scored.filter(_._1 == 1).map(_._2)
    val bad = scored.filter(_._1 == 0).map(_._2)
    assert(good.min > bad.max,
      s"good scores ${good.mkString(",")} must all exceed bad ${bad.mkString(",")}")
  }

  test("determinism: training twice yields identical weights") {
    val w1 = FastTextQuality.train(trainingFrame, "label", "text", "doc_id",
      numBuckets = 1 << 10, iters = 40)
    val w2 = FastTextQuality.train(trainingFrame, "label", "text", "doc_id",
      numBuckets = 1 << 10, iters = 40)
    assert(w1.sameElements(w2))
  }

  test("empty doc scores sigmoid(intercept); score stays in (0,1)") {
    import spark.implicits._
    val w = FastTextQuality.train(trainingFrame, "label", "text", "doc_id",
      numBuckets = 1 << 10, iters = 40)
    val s = Seq("", "   ").toDF("text")
      .select(FastTextQuality.score(w, col("text")).as("s"))
      .collect().map(_.getDouble(0))
    val want = 1.0 / (1.0 + math.exp(-w(0)))
    assert(s.forall(v => v == want && v > 0 && v < 1))
  }

  test("bigrams contribute: wordNgrams=2 buckets outnumber unigrams") {
    import spark.implicits._
    val n = Seq("a b c").toDF("text")
      .select(size(FastTextQuality.docBuckets(col("text"), 1 << 10, 2)).as("n"),
        size(FastTextQuality.docBuckets(col("text"), 1 << 10, 1)).as("n1"))
      .collect().head
    assert(n.getInt(0) == 5 && n.getInt(1) == 3) // 3 unigrams + 2 bigrams
  }

  test("validation: single-class labels and bad params reject") {
    import spark.implicits._
    val oneClass = (0 until 10).map(i => (i.toLong, doc(goodVocab, i), 1))
      .toDF("doc_id", "text", "label")
    intercept[IllegalArgumentException](
      FastTextQuality.train(oneClass, "label", "text", "doc_id", iters = 5))
    intercept[IllegalArgumentException](
      FastTextQuality.docBuckets(lit("x"), 0))
    intercept[IllegalArgumentException](
      FastTextQuality.score(Array(0.1), lit("x")))
  }
}
