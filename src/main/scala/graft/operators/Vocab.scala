package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

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
}
