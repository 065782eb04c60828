package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** Batch sessionization (gaps-and-islands) over an event log — the
  * offline counterpart of the Structured Streaming sessionization in
  * graft.streaming.EventStreams (reference pipelines run both: replay
  * for backfill, streaming for live).
  *
  * Shape: one hash shuffle on the user key, then two window passes over
  * the SAME sort (Catalyst collapses them into a single Window operator
  * chain — no second exchange, no self-join): pass 1 marks
  * session-break rows (gap from the previous event > `gapSeconds`),
  * pass 2 running-sums the marks into a per-user session sequence.
  * Scales with the user-key cardinality; a single user's events must
  * fit a partition's window buffer (same contract every per-key window
  * op in the engine carries).
  */
object Sessionize {

  private def epochUs(tsCol: String): Column =
    unix_micros(col(tsCol).cast("timestamp"))

  /** Tag every event with a 0-based `session_seq` per user. `tieBreak`
    * makes the within-user order total when timestamps can collide —
    * without it the gap test is nondeterministic across reruns. */
  def assign(
      events: DataFrame,
      userCol: String,
      tsCol: String,
      gapSeconds: Long,
      tieBreak: Seq[Column] = Nil): DataFrame = {
    require(gapSeconds > 0, "gapSeconds must be positive")
    // NULLS LAST, matching SQL-default window order (Spark's bare asc
    // is NULLS FIRST): a null-ts event sorts after the real timeline
    // and its null gap opens a fresh session — same in both engines,
    // instead of silently renumbering every session differently
    val ord = Window.partitionBy(col(userCol))
      .orderBy(col(tsCol).asc_nulls_last +: tieBreak: _*)
    val run = ord.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val us = epochUs(tsCol)
    val gap = us - lag(us, 1).over(ord)
    val brk = when(gap.isNull || gap > gapSeconds * 1000000L, 1L).otherwise(0L)
    events
      .withColumn("__brk", brk)
      .withColumn("session_seq", sum(col("__brk")).over(run) - 1)
      .drop("__brk")
  }

  /** One row per (user, session): event count, duration in µs, and the
    * 2dp-rounded value sum. Adds one aggregation shuffle on
    * (user, session_seq) over [[assign]]'s output — map-side partial
    * aggregation applies, so the shuffle carries one row per session
    * per mapper, not per event. */
  def sessions(
      events: DataFrame,
      userCol: String,
      tsCol: String,
      gapSeconds: Long,
      valueCol: String,
      tieBreak: Seq[Column] = Nil): DataFrame =
    assign(events, userCol, tsCol, gapSeconds, tieBreak)
      .withColumn("__us", epochUs(tsCol))
      .groupBy(col(userCol), col("session_seq"))
      .agg(
        count(lit(1)).as("n_events"),
        (max(col("__us")) - min(col("__us"))).as("duration_us"),
        round(sum(col(valueCol)), 2).as("sum_value"))
}
