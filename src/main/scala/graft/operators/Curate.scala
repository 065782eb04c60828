package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

import graft.functions.{TextFunctions => TF}

/** End-to-end corpus curation: the deterministic spine of a
  * training-data pipeline as ONE composed plan —
  *
  *   quality gate → exact dedup (keep min-id per content hash) →
  *   per-language token budget
  *
  * Every stage is a pure function of the data (fixed rule order, hash
  * identity, id order), so the final corpus is reproducible on any
  * cluster size and exactly oracle-checkable — unlike the probabilistic
  * dedup family this composes with (MinHash/SimHash stages slot in
  * between the gate and the budget when near-dup removal is wanted).
  *
  * Shape at 100 TB: the gate is scan-local; dedup shuffles once on the
  * content hash (constant-width key, not the document); the budget
  * shuffles once on the language key. Catalyst pipelines the stages —
  * nothing materializes between them.
  */
object Curate {

  /** @return the curated corpus: (idCol, langCol, n_tok, cum_n_tok) */
  def corpus(
      docs: DataFrame,
      idCol: String,
      textCol: String,
      langCol: String,
      budgetPerLang: Long): DataFrame = {
    val ok = docs.filter(TF.filterReason(col(textCol)) === "ok")
    val w = Window.partitionBy(col("__h")).orderBy(col(idCol))
    val deduped = ok
      .withColumn("__h", md5(col(textCol)))
      .withColumn("__rn", row_number().over(w))
      .filter(col("__rn") === 1)
      .select(col(idCol), col(langCol), TF.tokenCount(col(textCol)).as("n_tok"))
    Sampling.budgetPerStratum(
      deduped, col(langCol), Seq(col(idCol)), "n_tok", budgetPerLang)
  }

  /** Per-stage survivor counts — the audit trail a curation run ships
    * with (how many docs each stage removed). One pass per stage over
    * the same pipelined plan. */
  def stageStats(
      docs: DataFrame,
      idCol: String,
      textCol: String,
      langCol: String,
      budgetPerLang: Long): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    val total = docs.count()
    val ok = docs.filter(TF.filterReason(col(textCol)) === "ok")
    val nOk = ok.count()
    val nDeduped = ok.select(md5(col(textCol))).distinct().count()
    val nFinal = corpus(docs, idCol, textCol, langCol, budgetPerLang).count()
    Seq(
      ("input", total), ("quality_gate", nOk),
      ("exact_dedup", nDeduped), ("token_budget", nFinal)
    ).toDF("stage", "n_docs")
  }
}
