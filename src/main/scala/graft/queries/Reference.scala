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

    // forward as-of: earliest click at-or-after each purchase, per user
    "q_asof_forward" -> ((s, dir) => {
      val ev = t(s, dir, "events")
      val purchases = ev.filter(col("event_type") === "purchase")
        .select(col("user_id"), col("event_id"), col("ts"))
      val clicks = ev.filter(col("event_type") === "click")
        .select(col("user_id"), col("ts"), col("value"))
      AsOf.joinAsOf(purchases, clicks, "ts", Seq("user_id"),
        Map("ts" -> "click_ts", "value" -> "click_value"), strategy = "forward")
        .select(col("user_id"), col("event_id"), col("ts"),
          col("click_ts"), col("click_value"))
    }),

    // nearest as-of: the closer of the backward/forward candidates,
    // exact distance ties resolving backward
    "q_asof_nearest" -> ((s, dir) => {
      val ev = t(s, dir, "events")
      val purchases = ev.filter(col("event_type") === "purchase")
        .select(col("user_id"), col("event_id"), col("ts"))
      val clicks = ev.filter(col("event_type") === "click")
        .select(col("user_id"), col("ts"), col("value"))
      AsOf.joinAsOf(purchases, clicks, "ts", Seq("user_id"),
        Map("ts" -> "click_ts", "value" -> "click_value"), strategy = "nearest")
        .select(col("user_id"), col("event_id"), col("ts"),
          col("click_ts"), col("click_value"))
    }),

    // as-of with a tolerance band and exact matches excluded: strictly
    // earlier click within 3 days of each purchase, per user
    "q_asof_tolerance" -> ((s, dir) => {
      val ev = t(s, dir, "events")
      val purchases = ev.filter(col("event_type") === "purchase")
        .select(col("user_id"), col("event_id"), col("ts"))
      val clicks = ev.filter(col("event_type") === "click")
        .select(col("user_id"), col("ts"), col("value"))
      AsOf.joinAsOf(purchases, clicks, "ts", Seq("user_id"),
        Map("ts" -> "click_ts", "value" -> "click_value"),
        tolerance = Some(3 * 86400.0), allowExactMatches = false)
        .select(col("user_id"), col("event_id"), col("ts"),
          col("click_ts"), col("click_value"))
    }),

    // regrid along a NON-index axis (id_var user_id): the index swaps
    // into the grouping keys (polars_dataset.py:219-223) — per
    // event_type, the mean-value-by-user series is splined onto a user
    // grid. Rows-only: spline not expressible in DuckDB.
    "q_regrid_axis" -> ((s, dir) => {
      val ev = t(s, dir, "events")
      val byUser = ev.groupBy(col("event_type"), col("user_id"))
        .agg(avg(col("value")).as("v"))
      GDataset(
        byUser.select(col("event_type"), col("user_id").cast("double").as("user_id"), col("v")),
        "event_type", Seq("user_id"))
        .regrid(Array(5.5, 10.5, 20.5, 30.5), axis = "user_id").df
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

    // linear regrid twin of q_regrid: identical per-group grid
    // machinery, kind=linear with constant end-clamping — the one
    // interpolation kind a SQL oracle can replay EXACTLY (bracketing
    // windows + the same parenthesized ratio expression), so the
    // regrid family's anchor is hash-verified end to end where the
    // cubic/pchip kinds are rows-only by necessity
    "q_regrid_linear" -> ((s, dir) => {
      val ev = t(s, dir, "events")
      val ds = GDataset(
        ev.select(col("user_id"), xCol.as("x"), col("value")),
        "x", Seq("user_id"))
      ds.regrid(DailyGrid, graft.functions.SplineOptions(
          kind = "linear", extrapolate = "constant")).df
        .select(col("user_id"), col("x"),
          (round(col("value"), 6) + lit(0.0)).as("value"))
    }),

    // DFT magnitude spectrum (first 8 bins) of each user's value series.
    // 2dp rounding: the per-group trig sums differ between engines only
    // in summation order and libm ulps (~1e-12 relative), far from any
    // 2dp rounding boundary — so the spectrum is value-verified, not
    // just rows-checked.
    "q_dft" -> ((s, dir) => {
      val ev = t(s, dir, "events")
      val ds = GDataset(
        ev.select(col("user_id"), xCol.as("x"), col("value")),
        "x", Seq("user_id"))
      ds.dft(8).df
        .select(col("user_id"), col("freq_bin"), round(col("mag_value"), 2).as("mag"))
    }),

    // forward-fill nulls per user in time order (fill_null strategy)
    "q_ffill" -> ((s, dir) => {
      val ev = t(s, dir, "events").select(
        col("user_id"), col("event_id"), col("ts"),
        when(col("value") < 1, lit(null)).otherwise(col("value")).as("v"))
      GDataset(ev, "ts", Seq("user_id"))
        .ffill(Seq("v"), Seq(col("event_id")))
        .fetch(col("event_id"), col("v"))
    }),

    // linear interpolation of nulls over the time axis per user
    "q_interpolate" -> ((s, dir) => {
      val ev = t(s, dir, "events").select(
        col("user_id"), col("event_id"),
        unix_micros(col("ts").cast("timestamp")).as("x"),
        when(col("value") < 1, lit(null)).otherwise(col("value")).as("v"))
      GDataset(ev, "x", Seq("user_id"))
        .interpolate(Seq("v"), Seq(col("event_id")))
        .fetch(col("event_id"), col("v"))
    }),

    // merge_sorted: two per-user-parity halves of events, each sorted
    // on the time axis, merged back into one globally time-sorted
    // frame (row set == the full table; the sortedness is spec-pinned
    // since the driver compare is order-insensitive)
    "q_merge_sorted" -> ((s, dir) => {
      val ev = t(s, dir, "events").select(
        col("user_id"), col("event_id"),
        unix_micros(col("ts").cast("timestamp")).as("x"), col("value"))
      val a = GDataset(ev.filter(col("user_id") % 2 === 0), "x", Seq("user_id"))
      val b = GDataset(ev.filter(col("user_id") % 2 =!= 0), "x", Seq("user_id"))
      a.mergeSorted(b, "x").fetch(col("event_id"), col("x"), col("value"))
    }),

    // nearest-neighbor interpolation (polars interpolate
    // strategy="nearest"): null takes the closer observation's value,
    // ties resolve backward
    "q_interpolate_nearest" -> ((s, dir) => {
      val ev = t(s, dir, "events").select(
        col("user_id"), col("event_id"),
        unix_micros(col("ts").cast("timestamp")).as("x"),
        when(col("value") < 1, lit(null)).otherwise(col("value")).as("v"))
      GDataset(ev, "x", Seq("user_id"))
        .interpolate(Seq("v"), Seq(col("event_id")), strategy = "nearest")
        .fetch(col("event_id"), col("v"))
    }),

    // upsample: hourly grid rows per user between min and max event
    // second; values only where an original lands exactly on the grid
    // (polars upsample grid-left join). Integer epoch-second index ->
    // exact grid equality.
    "q_upsample" -> ((s, dir) => {
      val ev = t(s, dir, "events").select(
        col("user_id"),
        expr("unix_micros(cast(ts as timestamp)) div 1000000").as("x"),
        col("value"))
      GDataset(ev, "x", Seq("user_id"))
        .upsample(3600L)
        .fetch(col("user_id"), col("x"), col("value"))
    }),

    // describe: per-column summary stats in one unpivot + groupBy pass.
    // mean/std rounded to 2dp on both engines (sum-order tolerance).
    "q_describe" -> ((s, dir) =>
      GDataset(t(s, dir, "lineitem"), "l_orderkey")
        .describe("l_quantity", "l_extendedprice", "l_discount")
        .select(col("col_name"), col("count"), col("null_count"),
          round(col("mean"), 2).as("mean"), round(col("std"), 2).as("std"),
          col("min"), col("max"))),

    // deterministic hash sample (reproducible across engines/partitionings)
    "q_sample" -> ((s, dir) =>
      GDataset(t(s, dir, "orders"), "o_orderkey")
        .sampleByHash(col("o_orderkey"), 4)
        .fetch(col("o_orderkey"), col("o_custkey"), col("o_totalprice"))),

    // positional slice over an explicit total order
    "q_slice" -> ((s, dir) =>
      GDataset(t(s, dir, "orders"), "o_orderkey")
        .slice(Seq(col("o_orderkey")), offset = 100, n = 50)
        .fetch(col("o_orderkey"), col("o_custkey"), col("o_totalprice"))),

    // global contiguous row index over a sorted frame (zipWithIndex path)
    "q_row_index" -> ((s, dir) =>
      // parquet scan + deterministic sort → the two-scan fast path: no
      // full-input persist (at 100 TB re-reading beats caching a copy)
      GDataset(t(s, dir, "orders")
          .select(col("o_orderkey"), col("o_totalprice")), "o_orderkey")
        .sort()
        .withRowIndex("row_idx", deterministicSource = true)
        .fetch(col("row_idx"), col("o_orderkey"), col("o_totalprice"))),

    // horizontal concat: align two per-user series by key (hstack analogue)
    "q_hconcat" -> ((s, dir) => {
      val ev = t(s, dir, "events")
      def side(typ: String, out: String) = GDataset(
        ev.filter(col("event_type") === typ)
          .groupBy(col("user_id"))
          .agg(round(sum(col("value")), 2).as(out)),
        "user_id")
      side("view", "view_total").hconcat(side("click", "click_total")).df
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
    // NULL is kept (polars drop_nan drops NaN only; Spark isnan(NULL) is
    // false) — without the IS NULL arm DuckDB's NOT isnan(NULL) = NULL
    // would drop null rows and desync the engines on nullable data
    "q_drop_nan" ->
      """SELECT event_id, value FROM (
           SELECT event_id,
                  CASE WHEN value < 1 THEN 'NaN'::DOUBLE ELSE value END AS value
           FROM events)
         WHERE value IS NULL OR NOT isnan(value)""",
    "q_asof_join" ->
      """SELECT l.user_id, l.event_id, l.ts, r.ts AS click_ts, r.value AS click_value
         FROM (SELECT user_id, event_id, ts FROM events WHERE event_type = 'purchase') l
         ASOF LEFT JOIN (SELECT user_id, ts, value FROM events WHERE event_type = 'click') r
           ON l.user_id = r.user_id AND l.ts >= r.ts""",
    "q_asof_forward" ->
      """SELECT l.user_id, l.event_id, l.ts, r.ts AS click_ts, r.value AS click_value
         FROM (SELECT user_id, event_id, ts FROM events WHERE event_type = 'purchase') l
         ASOF LEFT JOIN (SELECT user_id, ts, value FROM events WHERE event_type = 'click') r
           ON l.user_id = r.user_id AND l.ts <= r.ts""",
    // nearest = the closer of two ASOF scans; an exact distance tie (or
    // a zero-distance equal-timestamp match, visible to both scans)
    // takes the backward row, matching AsOf.joinAsOf tie semantics
    "q_asof_nearest" ->
      """WITH l AS (SELECT user_id, event_id, ts FROM events WHERE event_type = 'purchase'),
         r AS (SELECT user_id, ts, value FROM events WHERE event_type = 'click'),
         bk AS (
           SELECT l.event_id, r.ts AS bts, r.value AS bv
           FROM l ASOF LEFT JOIN r ON l.user_id = r.user_id AND l.ts >= r.ts),
         fw AS (
           SELECT l.event_id, r.ts AS fts, r.value AS fv
           FROM l ASOF LEFT JOIN r ON l.user_id = r.user_id AND l.ts <= r.ts)
         SELECT l.user_id, l.event_id, l.ts,
           CASE WHEN bts IS NULL THEN fts
                WHEN fts IS NULL THEN bts
                WHEN (fts - l.ts) < (l.ts - bts) THEN fts ELSE bts END AS click_ts,
           CASE WHEN bts IS NULL THEN fv
                WHEN fts IS NULL THEN bv
                WHEN (fts - l.ts) < (l.ts - bts) THEN fv ELSE bv END AS click_value
         FROM l
         LEFT JOIN bk ON l.event_id = bk.event_id
         LEFT JOIN fw ON l.event_id = fw.event_id""",
    // the backward match is the nearest earlier row, so nulling it when
    // out of band reproduces the tolerance exactly; `>` (not `>=`)
    // reproduces allow_exact_matches=false
    "q_asof_tolerance" ->
      """SELECT l.user_id, l.event_id, l.ts,
                CASE WHEN l.ts - r.ts <= INTERVAL 3 DAY THEN r.ts END AS click_ts,
                CASE WHEN l.ts - r.ts <= INTERVAL 3 DAY THEN r.value END AS click_value
         FROM (SELECT user_id, event_id, ts FROM events WHERE event_type = 'purchase') l
         ASOF LEFT JOIN (SELECT user_id, ts, value FROM events WHERE event_type = 'click') r
           ON l.user_id = r.user_id AND l.ts > r.ts""",
    "q_ffill" ->
      """SELECT event_id,
         last_value(v IGNORE NULLS) OVER (
           PARTITION BY user_id ORDER BY ts, event_id
           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS v
         FROM (SELECT user_id, event_id, ts,
                 CASE WHEN value < 1 THEN NULL ELSE value END AS v
               FROM events)""",
    "q_upsample" ->
      """WITH e AS (
           SELECT user_id, epoch_us(CAST(ts AS TIMESTAMP)) // 1000000 AS x, value
           FROM events),
         ex AS (SELECT user_id, min(x) AS mn, max(x) AS mx FROM e GROUP BY user_id),
         g AS (SELECT user_id, unnest(generate_series(mn, mx, 3600)) AS x FROM ex)
         SELECT user_id, x, value
         FROM g LEFT JOIN e USING (user_id, x)""",
    "q_interpolate" ->
      """SELECT event_id,
         CASE WHEN v IS NOT NULL THEN v
              WHEN pv IS NULL OR nv IS NULL THEN NULL
              ELSE pv + (nv - pv) * ((x - px) / (nx - px)) END AS v
         FROM (
           SELECT event_id, v, CAST(epoch_us(ts) AS DOUBLE) AS x,
             last_value(v IGNORE NULLS) OVER wb AS pv,
             last_value(CASE WHEN v IS NOT NULL THEN CAST(epoch_us(ts) AS DOUBLE) END IGNORE NULLS) OVER wb AS px,
             first_value(v IGNORE NULLS) OVER wf AS nv,
             first_value(CASE WHEN v IS NOT NULL THEN CAST(epoch_us(ts) AS DOUBLE) END IGNORE NULLS) OVER wf AS nx
           FROM (SELECT user_id, event_id, ts,
                   CASE WHEN value < 1 THEN NULL ELSE value END AS v
                 FROM events)
           WINDOW wb AS (PARTITION BY user_id ORDER BY epoch_us(ts), event_id
                         ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW),
                  wf AS (PARTITION BY user_id ORDER BY epoch_us(ts), event_id
                         ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING))""",
    "q_merge_sorted" ->
      """SELECT event_id, epoch_us(CAST(ts AS TIMESTAMP)) AS x, value
         FROM events""",
    "q_interpolate_nearest" ->
      """SELECT event_id,
         CASE WHEN v IS NOT NULL THEN v
              WHEN pv IS NULL OR nv IS NULL THEN NULL
              WHEN (x - px) <= (nx - x) THEN pv
              ELSE nv END AS v
         FROM (
           SELECT event_id, v, CAST(epoch_us(ts) AS DOUBLE) AS x,
             last_value(v IGNORE NULLS) OVER wb AS pv,
             last_value(CASE WHEN v IS NOT NULL THEN CAST(epoch_us(ts) AS DOUBLE) END IGNORE NULLS) OVER wb AS px,
             first_value(v IGNORE NULLS) OVER wf AS nv,
             first_value(CASE WHEN v IS NOT NULL THEN CAST(epoch_us(ts) AS DOUBLE) END IGNORE NULLS) OVER wf AS nx
           FROM (SELECT user_id, event_id, ts,
                   CASE WHEN value < 1 THEN NULL ELSE value END AS v
                 FROM events)
           WINDOW wb AS (PARTITION BY user_id ORDER BY epoch_us(ts), event_id
                         ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW),
                  wf AS (PARTITION BY user_id ORDER BY epoch_us(ts), event_id
                         ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING))""",
    // same angle expression, left-associated like the Scala kernel;
    // bins = min(8, group size), exactly as GDataset.dft emits
    // precondition: (user_id, ts) is unique in events — Spark's dft
    // collapses duplicate index values (keeps the last observation)
    // while this enumeration takes every row, so a duplicate ts would
    // desync the two series. InterpolationSpec pins the uniqueness.
    "q_dft" ->
      """WITH s AS (
           SELECT user_id, value,
                  CAST(row_number() OVER (PARTITION BY user_id ORDER BY ts) - 1 AS DOUBLE) AS t,
                  CAST(count(*) OVER (PARTITION BY user_id) AS DOUBLE) AS n
           FROM events),
         b AS (SELECT CAST(unnest(range(0, 8)) AS DOUBLE) AS k)
         SELECT user_id, k AS freq_bin,
           round(sqrt(pow(sum(value * cos(-2 * pi() * k * t / n)), 2)
                    + pow(sum(value * sin(-2 * pi() * k * t / n)), 2)), 2) AS mag
         FROM s JOIN b ON b.k < least(8, s.n)
         GROUP BY user_id, k""",
    "q_describe" -> {
      def one(c: String) =
        s"""SELECT '$c' AS col_name, count(v) AS count,
            CAST(count(*) - count(v) AS BIGINT) AS null_count,
            round(avg(v), 2) AS mean,
            round(stddev_samp(v), 2) AS std, min(v) AS min, max(v) AS max
            FROM (SELECT CAST($c AS DOUBLE) AS v FROM lineitem)"""
      Seq("l_quantity", "l_extendedprice", "l_discount").map(one).mkString(" UNION ALL ")
    },
    "q_sample" ->
      """SELECT o_orderkey, o_custkey, o_totalprice FROM orders
         WHERE substr(md5(CAST(o_orderkey AS VARCHAR)), 1, 1) < '4'""",
    "q_slice" ->
      """SELECT o_orderkey, o_custkey, o_totalprice FROM orders
         ORDER BY o_orderkey LIMIT 50 OFFSET 100""",
    "q_row_index" ->
      """SELECT row_number() OVER (ORDER BY o_orderkey) - 1 AS row_idx,
         o_orderkey, o_totalprice FROM orders""",
    "q_hconcat" ->
      """SELECT user_id, view_total, click_total
         FROM (SELECT user_id, round(sum(value), 2) AS view_total
               FROM events WHERE event_type = 'view' GROUP BY user_id) a
         FULL JOIN (SELECT user_id, round(sum(value), 2) AS click_total
                    FROM events WHERE event_type = 'click' GROUP BY user_id) b
         USING (user_id)""",
    // q_regrid: the cubic-spline tridiagonal solve is not expressible in
    // DuckDB SQL — driver rows-only check; closed-form correctness in
    // InterpolationSpec. q_regrid_linear below is the family's exact
    // anchor: linear interpolation IS SQL-expressible, via the same
    // bracketing-window shape as q_interpolate (grid points ride the
    // per-user series as null-valued rows; is_grid breaks the order
    // tie so an observation at the same x sorts BEFORE its grid row
    // and the ratio hits 0 exactly). Constant end-clamping falls out
    // of the NULL bracket cases. The interpolation expression is
    // parenthesized identically to the Scala kernel (ratio first) so
    // both engines run the same IEEE-754 ops.
    "q_regrid_linear" ->
      """WITH e AS (
           SELECT user_id, epoch_us(CAST(ts AS TIMESTAMP)) / 1000000.0 AS x, value AS v
           FROM events),
         g AS (
           SELECT u.user_id, 1704153600.0 + d * 86400.0 AS x
           FROM (SELECT DISTINCT user_id FROM events) u
           CROSS JOIN (SELECT unnest(generate_series(0, 27)) AS d)),
         a AS (
           SELECT user_id, x, v, 0 AS is_grid FROM e
           UNION ALL
           SELECT user_id, x, NULL AS v, 1 AS is_grid FROM g),
         w AS (
           SELECT user_id, x, is_grid,
             last_value(v IGNORE NULLS) OVER wb AS pv,
             last_value(CASE WHEN v IS NOT NULL THEN x END IGNORE NULLS) OVER wb AS px,
             first_value(v IGNORE NULLS) OVER wf AS nv,
             first_value(CASE WHEN v IS NOT NULL THEN x END IGNORE NULLS) OVER wf AS nx
           FROM a
           WINDOW wb AS (PARTITION BY user_id ORDER BY x, is_grid
                         ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW),
                  wf AS (PARTITION BY user_id ORDER BY x, is_grid
                         ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING))
         SELECT user_id, x,
           round(CASE WHEN pv IS NULL THEN nv
                      WHEN nv IS NULL THEN pv
                      ELSE pv + (nv - pv) * ((x - px) / (nx - px)) END, 6) + 0.0 AS value
         FROM w WHERE is_grid = 1"""
  )
}
