package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

import graft.functions.{TextFunctions => TF}

/** Corpus vocabulary statistics — the token-frequency table a
  * training-data pipeline builds before tokenizer training or
  * stopword/quality analysis.
  *
  * Shape: tokenize → explode → two-level aggregation. The first
  * groupBy((token, doc)) collapses within-document repeats, the second
  * folds to (term frequency, document frequency) — both levels get
  * map-side partial aggregation, so the token-key shuffle carries one
  * row per distinct (token, doc) per mapper, never one per occurrence.
  * `count_distinct` would instead expand every row through the shuffle.
  * Top-k lands in TakeOrderedAndProject (per-partition heaps + driver
  * merge of k rows), not a global sort.
  */
object Vocab {

  /** Top-`k` tokens by corpus term frequency (ties broken by token, so
    * the cut at rank k is deterministic), with document frequency.
    * Tokenization is the engine-wide ASCII-whitespace split (see
    * TextFunctions.tokenCount / graft-oracle notes on `\s`). */
  def topK(docs: DataFrame, idCol: String, textCol: String, k: Int): DataFrame = {
    require(k > 0, "k must be positive")
    val toks = docs.select(
      col(idCol).as("id"),
      explode(TF.tokens(col(textCol))).as("token"))
    toks
      .groupBy(col("token"), col("id")).agg(count(lit(1)).as("c"))
      .groupBy(col("token")).agg(sum(col("c")).as("tf"), count(lit(1)).as("df"))
      .orderBy(col("tf").desc, col("token"))
      .limit(k)
  }

  /** Top-`k` keywords per document by tf-idf (tf · ln(N/df)) — the
    * keyword-extraction / topic-tagging pass. One corpus count job for
    * N, then the same two-level aggregation as [[topK]]; the per-doc
    * top-k ranks over the ROUNDED score (4dp) with a token tie-break,
    * so the cut is deterministic and engine-independent (raw-double
    * ordering would let a ulp of libm `ln` reorder near-ties). */
  def tfidfTopK(docs: DataFrame, idCol: String, textCol: String, k: Int): DataFrame = {
    require(k > 0, "k must be positive")
    val n = docs.count()
    val toks = docs.select(
      col(idCol).as("id"),
      explode(TF.tokens(col(textCol))).as("token"))
    val tf = toks.groupBy(col("id"), col("token")).agg(count(lit(1)).as("tf"))
    // df = rows per token in the (id, token) table — already distinct
    val dfreq = tf.groupBy(col("token")).agg(count(lit(1)).as("df"))
    val scored = tf.join(dfreq, Seq("token"))
      .withColumn("tfidf", round(col("tf") * log(lit(n.toDouble) / col("df")), 4))
    val w = Window.partitionBy(col("id")).orderBy(col("tfidf").desc, col("token"))
    scored
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") <= k)
      .select(col("id"), col("token"), col("tfidf"))
  }

  /** Per-document average token log-likelihood under the corpus's own
    * unigram language model — the CCNet-recipe perplexity-proxy quality
    * signal (docs whose tokens are globally rare score low; boilerplate
    * of common tokens scores high). `lm_score` = Σ c·ln(tf/T) / Σ c
    * over the doc's distinct tokens (c = in-doc count, tf = corpus
    * count, T = corpus token total); perplexity = exp(−lm_score).
    *
    * Shape: the same two-level (id, token) partial aggregation as
    * [[topK]] builds both the per-doc counts and the vocabulary, then
    * one token-key equi-join attaches corpus frequencies — one row per
    * distinct (doc, token), never per occurrence, and the vocabulary
    * side is ≪ corpus so AQE broadcasts it when it truly is small
    * (never forced). T is a single driver-side scalar (one agg job,
    * same bounded pattern as [[tfidfTopK]]'s corpus count). To score
    * against a REFERENCE corpus's model (the actual CCNet setup —
    * e.g. Wikipedia as the target distribution), pass its vocabulary
    * as `model`; by default the corpus models itself. Zero-token docs
    * drop out (nothing to score). */
  def lmScore(
      docs: DataFrame,
      idCol: String,
      textCol: String,
      model: Option[DataFrame] = None): DataFrame = {
    val toks = docs.select(
      col(idCol).as("id"),
      explode(TF.tokens(col(textCol))).as("token"))
    val docTf = toks.groupBy(col("id"), col("token")).agg(count(lit(1)).as("c"))
    // vocabulary: (token, tf) — either the supplied reference model or
    // this corpus's own counts (second level of the same aggregation)
    val vocab = model.getOrElse(
      docTf.groupBy(col("token")).agg(sum(col("c")).as("tf")))
    val total = vocab.agg(sum(col("tf"))).first().getLong(0)
    require(total > 0, "language model has zero tokens")
    // inner join: under a reference model, out-of-vocabulary tokens
    // drop out of the average (CCNet scores known tokens; a smoothing
    // variant would left-join + coalesce to a floor logprob)
    docTf.join(vocab, Seq("token"))
      .groupBy(col("id"))
      .agg(round(
        sum(col("c") * log(col("tf").cast("double") / lit(total.toDouble))) /
          sum(col("c")), 4).as("lm_score"))
  }

  /** Bigram extension of [[lmScore]]: per-doc average transition
    * log-likelihood Σ c·ln(c₂(p,w)/c₁(p)) / Σ c over the doc's
    * adjacent token pairs, with counts from the corpus itself — the
    * higher-fidelity CCNet-style signal (word-salad docs score low
    * even when every individual token is common).
    *
    * Scale shape: bigrams are built SCAN-SIDE (zip of the token array
    * with its own tail — no posexplode + per-token window shuffle),
    * so the only shuffles are the (id, p, w) and (p, w) partial
    * aggregations plus two vocabulary-sized equi-joins. Docs with < 2
    * tokens have no transitions and drop out. */
  def lmScoreBigram(docs: DataFrame, idCol: String, textCol: String): DataFrame = {
    val toks = TF.tokens(col(textCol))
    val m = greatest(size(toks) - 1, lit(0))
    val pairs = zip_with(
      slice(toks, lit(1), m), slice(toks, lit(2), m),
      (a, b) => struct(a.as("p"), b.as("w")))
    val bg = docs.select(col(idCol).as("id"), explode(pairs).as("z"))
      .select(col("id"), col("z.p").as("p"), col("z.w").as("w"))
    val docBg = bg.groupBy(col("id"), col("p"), col("w")).agg(count(lit(1)).as("c"))
    val c2 = docBg.groupBy(col("p"), col("w")).agg(sum(col("c")).as("c2"))
    val c1 = c2.groupBy(col("p")).agg(sum(col("c2")).as("c1"))
    docBg.join(c2, Seq("p", "w")).join(c1, Seq("p"))
      .groupBy(col("id"))
      .agg(
        round(sum(col("c") * log(col("c2").cast("double") / col("c1"))) /
          sum(col("c")), 4).as("lm2_score"),
        sum(col("c")).as("n_transitions"))
  }

  /** Per-document word-repetition signals (the Gopher repetition
    * filters): `dup_ratio` = fraction of tokens that are repeats of an
    * earlier token, `top_frac` = share of the single most frequent
    * token. Same two-level (id, token) aggregation as [[topK]] — both
    * shuffles stay partial-agg friendly, nothing is per-occurrence
    * past the first groupBy. Docs with zero tokens drop out (no tokens
    * to measure). */
  def repetitionStats(docs: DataFrame, idCol: String, textCol: String): DataFrame = {
    val toks = docs.select(
      col(idCol).as("id"),
      explode(TF.tokens(col(textCol))).as("token"))
    toks
      .groupBy(col("id"), col("token")).agg(count(lit(1)).as("c"))
      .groupBy(col("id")).agg(
        sum(col("c")).as("n_words"),
        count(lit(1)).as("n_distinct"),
        max(col("c")).as("top_c"))
      .select(
        col("id"),
        round(lit(1.0) - col("n_distinct").cast("double") / col("n_words").cast("double"), 4)
          .as("dup_ratio"),
        round(col("top_c").cast("double") / col("n_words").cast("double"), 4)
          .as("top_frac"))
  }
}
