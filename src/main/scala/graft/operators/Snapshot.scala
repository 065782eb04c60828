package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Corpus snapshot diffing — the audit step between two ingest runs.
  *
  * A recrawl (Common-Crawl snapshot N vs N+1, or two curation runs over
  * the same raw corpus) needs to answer: which documents appeared,
  * which vanished, and which changed content under the same id — both
  * to bound reprocessing (only `added`/`changed` docs need re-scoring,
  * re-embedding, re-deduping) and to flag pipeline regressions (a
  * `removed` spike usually means an upstream filter got stricter, not
  * that the web shrank).
  *
  * Scale shape: the text is hashed SCAN-SIDE (md5, codegen'd) on each
  * snapshot, so only (id, 16-byte hash) rows ever enter the full-outer
  * join's exchange — the join cost is two id-keyed constant-width
  * shuffles regardless of document size, and when both snapshots are
  * stored bucketed by id it is map-side entirely. Unchanged rows are
  * dropped before the result leaves the join, so the output is sized
  * by the churn, not the corpus.
  */
object Snapshot {

  /** Persistable (id, content_hash) index of a snapshot — hash the
    * corpus ONCE, freeze to parquet, and every later [[diff]] via
    * [[diffAgainstIndex]] never rescans the old snapshot's text (the
    * [[Dedup.exactIndex]] pattern keyed by id instead of hash). */
  def hashIndex(docs: DataFrame, idCol: String, textCol: String): DataFrame =
    docs.select(col(idCol).as("id"), md5(col(textCol)).as("content_hash"))

  /** [[diff]] where the OLD side is a frozen [[hashIndex]] — the
    * standing-monitor form: cost scales with the NEW snapshot plus an
    * index-sized join; the historical corpus is read as 48 bytes/row,
    * not documents. Equals `diff(old, cur, …)` exactly (spec-pinned). */
  def diffAgainstIndex(
      index: DataFrame, cur: DataFrame, idCol: String, textCol: String): DataFrame =
    diffHashes(
      index.select(col("id"), col("content_hash").as("__h_old")),
      cur.select(col(idCol).as("id"), md5(col(textCol)).as("__h_new")))

  /** The streaming-legal slice of [[diffAgainstIndex]]: `added` and
    * `changed` rows of a recrawl vs the frozen index, via a LEFT join
    * from the new side — usable unchanged on a micro-batched stream
    * (stream-static left joins are legal where the full-outer
    * [[diff]] is not), so re-ingest work can start while the recrawl
    * is still arriving. `removed` is structurally absent: a stream
    * cannot prove an id will never arrive — close the snapshot and
    * run [[diffAgainstIndex]] batch-side for the final removed sweep.
    * Equals the diff minus its `removed` rows (spec-pinned, batch and
    * stream). */
  def newOrChanged(
      cur: DataFrame, index: DataFrame, idCol: String, textCol: String): DataFrame =
    cur.select(col(idCol).as("id"), md5(col(textCol)).as("__h_new"))
      .join(index.select(col("id"), col("content_hash").as("__h_old")), Seq("id"), "left")
      .withColumn("status",
        when(col("__h_old").isNull, lit("added"))
          .when(col("__h_old") =!= col("__h_new"), lit("changed"))
          .otherwise(lit("unchanged")))
      .filter(col("status") =!= "unchanged")
      .select(col("id"), col("status"), col("__h_new").as("content_hash"))

  /** Rows of (id, status, content_hash) where status ∈
    * added / removed / changed; unchanged ids are absent. For
    * `removed` rows the hash is the OLD content's (the new side has
    * none); otherwise the new content's.
    */
  def diff(old: DataFrame, cur: DataFrame, idCol: String, textCol: String): DataFrame = {
    val oh = old.select(col(idCol).as("id"), md5(col(textCol)).as("__h_old"))
    val nh = cur.select(col(idCol).as("id"), md5(col(textCol)).as("__h_new"))
    diffHashes(oh, nh)
  }

  private def diffHashes(oh: DataFrame, nh: DataFrame): DataFrame = {
    oh.join(nh, Seq("id"), "full")
      .withColumn("status",
        when(col("__h_old").isNull, lit("added"))
          .when(col("__h_new").isNull, lit("removed"))
          .when(col("__h_old") =!= col("__h_new"), lit("changed"))
          .otherwise(lit("unchanged")))
      .filter(col("status") =!= "unchanged")
      .select(col("id"), col("status"),
        coalesce(col("__h_new"), col("__h_old")).as("content_hash"))
  }

  /** One-row churn summary of [[diff]]: counts per status plus the
    * fraction of the NEW snapshot that carried over unchanged — the
    * number an ingest dashboard alerts on. Computed from the same
    * hash-join plan plus one count of the new snapshot, folded in as
    * a broadcast 1-row aggregate (no eager driver job).
    */
  def churnStats(old: DataFrame, cur: DataFrame, idCol: String, textCol: String): DataFrame = {
    val d = diff(old, cur, idCol, textCol)
      .groupBy()
      .agg(
        sum(when(col("status") === "added", 1L).otherwise(0L)).as("n_added"),
        sum(when(col("status") === "removed", 1L).otherwise(0L)).as("n_removed"),
        sum(when(col("status") === "changed", 1L).otherwise(0L)).as("n_changed"))
    val total = cur.groupBy().agg(count(lit(1)).as("__n_cur"))
    d.crossJoin(broadcast(total))
      .select(
        coalesce(col("n_added"), lit(0L)).as("n_added"),
        coalesce(col("n_removed"), lit(0L)).as("n_removed"),
        coalesce(col("n_changed"), lit(0L)).as("n_changed"),
        round((col("__n_cur") - coalesce(col("n_added"), lit(0L)) -
          coalesce(col("n_changed"), lit(0L))).cast("double") /
          greatest(col("__n_cur"), lit(1L)), 4).as("unchanged_frac"))
  }
}
