package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** String ↔ datetime conversion with chrono/strftime format strings —
  * the polars `str.to_datetime` / `str.to_date` / `dt.to_string`
  * surface (the reference forwards them to polars' chrono-based
  * parser). The directives are translated ONCE at plan time to Spark's
  * DateTimeFormatter pattern; parsing itself is Spark's codegen'd
  * to_timestamp/to_date — no per-row translation, no UDF.
  *
  * Unknown directives fail at PLAN time with the offending directive
  * named: a silently mistranslated format would parse garbage at 100 TB
  * before anyone noticed.
  */
object Temporal {

  // chrono/strftime directive → Spark DateTimeFormatter pattern.
  // Month/weekday NAMES (%b/%B/%a/%A) format with Spark's fixed
  // Locale.US — same English names strftime produces under the C locale.
  private val Directives: Map[Char, String] = Map(
    'Y' -> "yyyy", 'y' -> "yy",
    'm' -> "MM", 'd' -> "dd", 'e' -> "d",
    'H' -> "HH", 'I' -> "hh", 'M' -> "mm", 'S' -> "ss",
    'f' -> "SSSSSS", // microseconds (DuckDB %f); chrono %6f equivalent
    'p' -> "a",
    'j' -> "DDD",
    'b' -> "MMM", 'B' -> "MMMM", 'a' -> "EEE", 'A' -> "EEEE",
    // %G/%V/%u (ISO week-based) are deliberately ABSENT: Spark bans
    // week-based pattern letters ('Y','w','e', SPARK-32683), so they
    // fail here at translation time instead of at first execution
    'z' -> "XX", 'Z' -> "zzz")

  /** Translate a chrono/strftime format string to a Spark
    * DateTimeFormatter pattern. Literal text is single-quote-escaped so
    * a letter in the format (e.g. the T in "%Y-%m-%dT%H") can never be
    * misread as a pattern character. */
  def toSparkPattern(fmt: String): String = {
    val out = new StringBuilder
    val lit = new StringBuilder
    def flushLit(): Unit = if (lit.nonEmpty) {
      // quote any run containing a letter or quote; bare separators pass through
      val s = lit.toString
      if (s.exists(c => c.isLetter || c == '\'')) out ++= "'" + s.replace("'", "''") + "'"
      else out ++= s
      lit.clear()
    }
    var i = 0
    while (i < fmt.length) {
      val c = fmt.charAt(i)
      if (c == '%') {
        require(i + 1 < fmt.length, s"dangling % at end of format '$fmt'")
        val d = fmt.charAt(i + 1)
        if (d == '%') lit += '%'
        else {
          flushLit()
          out ++= Directives.getOrElse(d,
            throw new IllegalArgumentException(
              s"unsupported strftime directive %$d in format '$fmt'"))
        }
        i += 2
      } else { lit += c; i += 1 }
    }
    flushLit()
    out.toString
  }

  /** Parse strings to TIMESTAMP_NTZ (polars str.to_datetime: naive
    * unless the format carries %z — wall-clock semantics, so the result
    * is independent of spark.sql.session.timeZone). */
  def strToTimestamp(c: Column, fmt: String): Column =
    to_timestamp_ntz(c, lit(toSparkPattern(fmt)))

  /** Parse strings to DATE (polars str.to_date). */
  def strToDate(c: Column, fmt: String): Column =
    to_date(c, toSparkPattern(fmt))

  /** Format dates/timestamps back to strings (polars dt.to_string). */
  def dtToString(c: Column, fmt: String): Column =
    date_format(c, toSparkPattern(fmt))

  /** Non-strict parse (polars `strict=False`): a malformed string
    * becomes null instead of failing the job — under Spark 4's default
    * ANSI mode the strict variants THROW on the first bad row, which is
    * the polars `strict=True` behavior. Returns session-zone
    * TIMESTAMP (try_to_timestamp has no NTZ twin); pin
    * spark.sql.session.timeZone when wall-clock semantics matter. */
  def tryStrToTimestamp(c: Column, fmt: String): Column =
    try_to_timestamp(c, lit(toSparkPattern(fmt)))

  /** Non-strict date parse: null on malformed input. */
  def tryStrToDate(c: Column, fmt: String): Column =
    tryStrToTimestamp(c, fmt).cast("date")

  // --- time-zone namespace (polars dt.convert_time_zone /
  // dt.replace_time_zone; reference forwards to polars' chrono-tz) ---
  //
  // graft's canonical timestamp is wall-clock TIMESTAMP_NTZ; a
  // tz-AWARE value is represented as its instant normalized to the UTC
  // wall clock. The ops below translate between those two views with
  // Spark's codegen'd from/to_utc_timestamp. The NTZ↔TIMESTAMP casts
  // they route through are lossless ONLY under
  // spark.sql.session.timeZone=UTC (no DST gaps), which every graft
  // entry point pins — a non-UTC session zone would corrupt wall
  // clocks that fall in the session zone's spring-forward gap.
  //
  // Gap/fold policy (java.time, pinned by TemporalSpec): a nonexistent
  // local time (spring-forward gap) shifts forward by the gap; an
  // ambiguous one (fall-back fold) takes the EARLIER offset.

  /** polars `dt.replace_time_zone(tz)` + canonical UTC storage:
    * re-interpret a wall-clock NTZ as zone `tz` (unchanged wall
    * fields) and return the instant as the UTC wall clock. */
  def replaceTimeZone(c: Column, tz: String): Column =
    to_utc_timestamp(c.cast("timestamp"), tz).cast("timestamp_ntz")

  /** polars `dt.convert_time_zone`: the wall clock a `from`-zone local
    * time reads on a `to`-zone clock at the same instant. */
  def convertTimeZone(c: Column, from: String, to: String): Column =
    from_utc_timestamp(to_utc_timestamp(c.cast("timestamp"), from), to)
      .cast("timestamp_ntz")

  /** UTC instant → wall clock in `tz` (polars
    * `dt.convert_time_zone(tz)` on a UTC-aware column). */
  def toLocal(c: Column, tz: String): Column =
    from_utc_timestamp(c.cast("timestamp"), tz).cast("timestamp_ntz")

  /** Parse offset-bearing strings (`%z` → `+0530`) to the instant as
    * UTC wall clock — the missing half of the `%z` directive, which
    * [[dtToString]] could only format. Strict (ANSI throw on garbage);
    * compose with try_to_timestamp via [[toSparkPattern]] for the
    * permissive variant. */
  /** Business days (Mon–Fri) in [start, end) — polars
    * `business_day_count` with the default week mask. Pure integer
    * arithmetic: full weeks contribute 5 each; the remainder window of
    * r < 7 days starting on weekday d (0 = Monday) contributes its
    * non-wrapped weekday positions (min(5, d+r) − min(5, d)) plus the
    * wrapped ones (max(0, min(5, d+r−7))) — no per-day expansion, no
    * float, bit-identical on any engine. Requires end ≥ start (callers
    * order the pair; polars' negative direction is `-count(end, start)`). */
  def businessDayCount(start: Column, end: Column): Column = {
    val n = datediff(end, start)
    val d = weekday(start)
    val r = n % 7
    // Column./ is double division; (n−r) is a multiple of 7 well under
    // 2^53, so the quotient is exact and the int cast is lossless
    ((n - r) / 7).cast("int") * 5 +
      greatest(lit(0), least(lit(5), d + r) - least(lit(5), d)) +
      greatest(lit(0), least(lit(5), d + r - 7))
  }

  def strToInstant(c: Column, fmt: String): Column = {
    val p = toSparkPattern(fmt)
    require(p.contains("XX") || p.contains("zzz"),
      s"strToInstant: format '$fmt' carries no %z/%Z offset — use strToTimestamp")
    to_timestamp(c, p).cast("timestamp_ntz")
  }

  /** polars group_by_dynamic bucket start with `offset` / `closed`
    * parity: windows of `every` seconds shifted by `offset` seconds
    * from the epoch grid; `closed` = "left" buckets [start, end) (the
    * polars default), "right" buckets (start, end] — a timestamp
    * exactly on a boundary belongs to the window ENDING there. Pure
    * integer epoch arithmetic on µs longs (floor-mod, negative-safe),
    * identical in any engine — no date_trunc unit table to match.
    * Scan-local; the caller groups by the result, so the only shuffle
    * is the aggregation's own. */
  def dynamicBucket(ts: Column, everySeconds: Long, offsetSeconds: Long = 0L,
      closed: String = "left"): Column = {
    require(everySeconds > 0, "every must be positive")
    require(closed == "left" || closed == "right", s"closed must be left|right, got $closed")
    val everyUs = everySeconds * 1000000L
    val offsetUs = offsetSeconds * 1000000L
    // closed=right: shift an exact-boundary timestamp into the earlier
    // window by bucketing (ts − 1µs)
    val us = unix_micros(ts.cast("timestamp")) -
      (if (closed == "right") lit(1L) else lit(0L))
    val rel = us - offsetUs
    // floor-mod so pre-1970 timestamps bucket correctly too
    val start = rel - pmod(rel, lit(everyUs)) + offsetUs
    timestamp_micros(start).cast("timestamp_ntz")
  }
}
