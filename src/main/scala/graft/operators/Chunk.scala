package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.functions.{TextFunctions => TF}

/** Token-window chunking — split each document into fixed-size token
  * windows with a stride (the RAG / context-window preprocessing
  * step). Pure per-row explode: chunk starts come from a `sequence`
  * over the token count, the window text from `slice` + `concat_ws` —
  * no shuffle, no UDF, output rows ≈ input tokens / stride. A final
  * short window is kept (it still carries trailing content); empty
  * documents produce no chunks.
  */
object Chunk {

  /** @param chunkSize tokens per chunk (window length)
    * @param stride    start-to-start distance; `stride < chunkSize`
    *                  overlaps windows, `stride == chunkSize` tiles */
  def tokenWindows(
      docs: DataFrame,
      idCol: String,
      textCol: String,
      chunkSize: Int,
      stride: Int): DataFrame = {
    require(chunkSize > 0, "chunkSize must be positive")
    require(stride > 0 && stride <= chunkSize, "stride must be in [1, chunkSize]")
    val n = size(col("__toks"))
    // last start = the largest multiple of stride strictly below n
    // (Column `/` is float division — cast back to the integral domain)
    val starts = sequence(
      lit(0), greatest(((n - 1) / stride).cast("int"), lit(0)) * stride, lit(stride))
    docs
      .select(col(idCol).as("id"), TF.tokens(col(textCol)).as("__toks"))
      .filter(size(col("__toks")) > 0)
      .select(col("id"), posexplode(
        transform(starts, st => concat_ws(" ", slice(col("__toks"), st + 1, lit(chunkSize))))))
      .withColumnRenamed("pos", "chunk_idx")
      .withColumnRenamed("col", "chunk_text")
      .withColumn("n_tok", TF.tokenCount(col("chunk_text")))
  }
}
