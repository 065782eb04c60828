package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables.t
import graft.core.GDataset
import graft.operators.AsOf

/** Queries exercising the reference's own Dataset semantics
  * (SURVEY.md §2.1): metadata-aware concat/select/sort/coord/extrema/
  * drop_nan, the regrid spline + DFT, and the as-of join.
  */
object Reference {

  private def eventsDs(s: SparkSession, dir: String): GDataset =
    GDataset(t(s, dir, "events"), "ts", Seq("user_id"))

  /** Seconds-since-epoch double index for the events series. */
  private def xCol = expr("unix_micros(cast(ts as timestamp)) / 1000000.0")

  /** Fixed daily grid over the events window (2024-01-02..29), epoch secs. */
  private[queries] val DailyGrid: Array[Double] =
    Array.tabulate(28)(d => 1704153600.0 + d * 86400.0) // 2024-01-02 00:00 UTC + d days

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // multi-dataset concat: index check + id_vars union + missing-column nulls
    "q_concat" -> ((s, dir) => {
      val ev = t(s, dir, "events")
      val a = GDataset(
        ev.filter(col("event_type") === "view")
          .select(col("user_id"), col("ts"), col("value")),
        "ts", Seq("user_id"))
      val b = GDataset(
        ev.filter(col("event_type") === "error")
          .select(col("user_id"), col("ts"), col("value"), col("props")),
        "ts", Seq("user_id"))
      GDataset.concat(Seq(a, b)).df
    }),

    // auto-sort by (id_vars, index)
    "q_sort" -> ((s, dir) => eventsDs(s, dir).sort().df),

    // ordered unique coordinate values
    "q_coord" -> ((s, dir) => eventsDs(s, dir).coord("user_id")),

    // min/max of a column
    "q_extrema" -> ((s, dir) => eventsDs(s, dir).extremaDf("value")),

    // select_data: keep metadata columns, swap value columns
    "q_select_data" -> ((s, dir) =>
      eventsDs(s, dir).selectData((col("value") * 2).as("v2")).df),

    // any-horizontal NaN row filter
    "q_drop_nan" -> ((s, dir) => {
      val ev = t(s, dir, "events")
      GDataset(
        ev.select(
          col("event_id"), col("ts"),
          when(col("value") < 1, lit(Double.NaN)).otherwise(col("value")).as("value")),
        "ts", Nil)
        .dropNan
        .fetch(col("event_id"), col("value"))
    }),

    // as-of join: latest click at-or-before each purchase, per user
    "q_asof_join" -> ((s, dir) => {
      val ev = t(s, dir, "events")
      val purchases = ev.filter(col("event_type") === "purchase")
        .select(col("user_id"), col("event_id"), col("ts"))
      val clicks = ev.filter(col("event_type") === "click")
        .select(col("user_id"), col("ts"), col("value"))
      AsOf.joinAsOf(purchases, clicks, "ts", Seq("user_id"),
        Map("ts" -> "click_ts", "value" -> "click_value"))
        .select(col("user_id"), col("event_id"), col("ts"),
          col("click_ts"), col("click_value"))
    }),

    // cubic-spline regrid of each user's value series onto a daily grid
    "q_regrid" -> ((s, dir) => {
      val ev = t(s, dir, "events")
      val ds = GDataset(
        ev.select(col("user_id"), xCol.as("x"), col("value")),
        "x", Seq("user_id"))
      ds.regrid(DailyGrid).df
        .select(col("user_id"), col("x"), round(col("value"), 6).as("value"))
    }),

    // DFT magnitude spectrum (first 8 bins) of each user's value series
    "q_dft" -> ((s, dir) => {
      val ev = t(s, dir, "events")
      val ds = GDataset(
        ev.select(col("user_id"), xCol.as("x"), col("value")),
        "x", Seq("user_id"))
      ds.dft(8).df
        .select(col("user_id"), col("freq_bin"), round(col("mag_value"), 6).as("mag"))
    })
  )

  val oracleSql: Map[String, String] = Map(
    "q_concat" ->
      """SELECT user_id, ts, value, CAST(NULL AS VARCHAR) AS props
         FROM events WHERE event_type = 'view'
         UNION ALL
         SELECT user_id, ts, value, props
         FROM events WHERE event_type = 'error'""",
    "q_sort" ->
      """SELECT user_id, ts, event_id, event_type, value, props
         FROM events ORDER BY user_id, ts""",
    "q_coord" ->
      "SELECT DISTINCT user_id FROM events ORDER BY user_id",
    "q_extrema" ->
      "SELECT min(value) AS min, max(value) AS max FROM events",
    "q_select_data" ->
      "SELECT user_id, ts, value * 2 AS v2 FROM events",
    "q_drop_nan" ->
      """SELECT event_id, value FROM (
           SELECT event_id,
                  CASE WHEN value < 1 THEN 'NaN'::DOUBLE ELSE value END AS value
           FROM events)
         WHERE NOT isnan(value)""",
    "q_asof_join" ->
      """SELECT l.user_id, l.event_id, l.ts, r.ts AS click_ts, r.value AS click_value
         FROM (SELECT user_id, event_id, ts FROM events WHERE event_type = 'purchase') l
         ASOF LEFT JOIN (SELECT user_id, ts, value FROM events WHERE event_type = 'click') r
           ON l.user_id = r.user_id AND l.ts >= r.ts"""
    // q_regrid / q_dft: spline + DFT not expressible in DuckDB SQL —
    // driver rows-only check; closed-form correctness in InterpolationSpec.
  )
}
