package graft

import org.apache.spark.sql.functions._
import graft.functions.Temporal

class TemporalSpec extends SparkSpec {

  test("businessDayCount: weekday positions in [start, end), hand-checked edges") {
    import spark.implicits._
    // (start, end, expected): 2024-01-01 is a Monday
    val cases = Seq(
      ("2024-01-01", "2024-01-01", 0), // empty interval
      ("2024-01-01", "2024-01-05", 4), // Mon..Thu
      ("2024-01-05", "2024-01-08", 1), // Fri; weekend skipped
      ("2024-01-06", "2024-01-08", 0), // Sat→Mon: nothing
      ("2024-01-01", "2024-01-08", 5), // one full week from Monday
      ("2024-01-06", "2024-01-13", 5), // one full week from Saturday
      ("2024-01-01", "2024-01-31", 22) // 4 weeks + Mon,Tue remainder
    )
    val got = cases.toDF("s", "e", "want")
      .select(Temporal.businessDayCount(col("s").cast("date"), col("e").cast("date"))
        .as("got"), col("want"), col("s"), col("e"))
      .collect()
    got.foreach { r =>
      assert(r.getInt(0) == r.getInt(1),
        s"${r.getString(2)}→${r.getString(3)}: got ${r.getInt(0)}, want ${r.getInt(1)}")
    }
  }

  test("strftime directives translate to Spark patterns with literals quoted") {
    assert(Temporal.toSparkPattern("%Y-%m-%d") == "yyyy-MM-dd")
    assert(Temporal.toSparkPattern("%d/%m/%Y") == "dd/MM/yyyy")
    assert(Temporal.toSparkPattern("%Y-%m-%dT%H:%M:%S") == "yyyy-MM-dd'T'HH:mm:ss")
    assert(Temporal.toSparkPattern("%b %d, %Y") == "MMM dd, yyyy")
    assert(Temporal.toSparkPattern("%I:%M %p") == "hh:mm a")
    assert(Temporal.toSparkPattern("100%% at %H") == "'100% at 'HH")
    intercept[IllegalArgumentException](Temporal.toSparkPattern("%Q"))
    intercept[IllegalArgumentException](Temporal.toSparkPattern("%Y-%"))
  }

  test("non-strict parse nulls malformed rows; strict parse throws under ANSI") {
    import spark.implicits._
    val df = Seq("2024-01-31", "not a date", "2024-02-30").toDF("s")
    val got = df.select(Temporal.tryStrToDate(col("s"), "%Y-%m-%d").as("d"))
      .collect().map(r => Option(r.get(0)).map(_.toString))
    assert(got.toSeq == Seq(Some("2024-01-31"), None, None))
    // polars strict=True analogue: the strict variant fails the job
    intercept[Exception](
      df.select(Temporal.strToDate(col("s"), "%Y-%m-%d")).collect())
  }

  test("parse and format round-trip dates and naive timestamps") {
    import spark.implicits._
    val df = Seq("2024-02-29 23:59:58", "1999-01-02 03:04:05").toDF("s")
    val ts = df.select(Temporal.strToTimestamp(col("s"), "%Y-%m-%d %H:%M:%S").as("t"))
    // naive timestamp: render-back equals the input string
    val back = ts.select(Temporal.dtToString(col("t"), "%Y-%m-%d %H:%M:%S").as("r"))
      .collect().map(_.getString(0)).toSet
    assert(back == Set("2024-02-29 23:59:58", "1999-01-02 03:04:05"))
    assert(ts.schema.head.dataType.typeName == "timestamp_ntz")

    val d = Seq("29/02/2024", "01/12/1999").toDF("s")
      .select(Temporal.strToDate(col("s"), "%d/%m/%Y").as("d"))
    val named = d.select(Temporal.dtToString(col("d"), "%b %d, %Y").as("n"))
      .collect().map(_.getString(0)).toSet
    assert(named == Set("Feb 29, 2024", "Dec 01, 1999"))
  }

  private def ntz1(c: org.apache.spark.sql.Column, s: String): String = {
    import spark.implicits._
    Seq(s).toDF("s")
      .select(Temporal.strToTimestamp(col("s"), "%Y-%m-%d %H:%M:%S").as("t"))
      .select(c.cast("string")).head().getString(0)
  }

  test("convert/replace time zone shift with real DST rules, not a constant") {
    // 2024 NY: EST (−05) until Mar 10 02:00, EDT (−04) to Nov 3
    assert(ntz1(Temporal.replaceTimeZone(col("t"), "America/New_York"),
      "2024-01-15 12:00:00") == "2024-01-15 17:00:00")
    assert(ntz1(Temporal.replaceTimeZone(col("t"), "America/New_York"),
      "2024-07-15 12:00:00") == "2024-07-15 16:00:00")
    // NY noon reads 02:00 (winter) / 01:00 (summer) next day in Tokyo
    assert(ntz1(Temporal.convertTimeZone(col("t"), "America/New_York", "Asia/Tokyo"),
      "2024-01-15 12:00:00") == "2024-01-16 02:00:00")
    assert(ntz1(Temporal.convertTimeZone(col("t"), "America/New_York", "Asia/Tokyo"),
      "2024-07-15 12:00:00") == "2024-07-16 01:00:00")
    // instant → local round trip
    assert(ntz1(Temporal.toLocal(
        Temporal.replaceTimeZone(col("t"), "Asia/Kolkata"), "Asia/Kolkata"),
      "2024-07-15 12:00:00") == "2024-07-15 12:00:00")
  }

  test("gap/fold policy: nonexistent shifts forward, ambiguous takes the earlier offset") {
    // 2024-03-10 02:30 EST does not exist (spring-forward): java.time
    // shifts it into the gap's far side — instant 07:30Z (=03:30 EDT)
    assert(ntz1(Temporal.replaceTimeZone(col("t"), "America/New_York"),
      "2024-03-10 02:30:00") == "2024-03-10 07:30:00")
    // 2024-11-03 01:30 happens twice (fall-back): earlier offset = EDT
    assert(ntz1(Temporal.replaceTimeZone(col("t"), "America/New_York"),
      "2024-11-03 01:30:00") == "2024-11-03 05:30:00")
  }

  test("strToInstant parses %z offsets to the UTC instant; refuses offset-free formats") {
    import spark.implicits._
    val got = Seq("2024-03-01 10:00:00+0530", "2024-03-01 10:00:00-0800")
      .toDF("s")
      .select(Temporal.strToInstant(col("s"), "%Y-%m-%d %H:%M:%S%z").cast("string"))
      .collect().map(_.getString(0)).toSet
    assert(got == Set("2024-03-01 04:30:00", "2024-03-01 18:00:00"))
    intercept[IllegalArgumentException](
      Temporal.strToInstant(col("s"), "%Y-%m-%d %H:%M:%S"))
  }

  test("dynamicBucket: offset anchoring, closed-right boundaries, trunc equivalence") {
    import spark.implicits._
    def buckets(closed: String, offset: Long = 0L): Seq[String] =
      Seq("2024-03-01 10:00:00", "2024-03-01 10:14:59.999999",
        "2024-03-01 10:15:00", "2024-03-01 10:59:59", "2024-03-01 11:00:00")
        .toDF("s")
        .select(Temporal.dynamicBucket(
          col("s").cast("timestamp_ntz"), 3600, offset, closed).cast("string"))
        .collect().map(_.getString(0)).toSeq
    // closed=left (default): [start, end) — 11:00 opens a new bucket
    assert(buckets("left") == Seq(
      "2024-03-01 10:00:00", "2024-03-01 10:00:00", "2024-03-01 10:00:00",
      "2024-03-01 10:00:00", "2024-03-01 11:00:00"))
    // closed=right: (start, end] — 10:00 and 11:00 fall to the PREVIOUS window
    assert(buckets("right") == Seq(
      "2024-03-01 09:00:00", "2024-03-01 10:00:00", "2024-03-01 10:00:00",
      "2024-03-01 10:00:00", "2024-03-01 10:00:00"))
    // offset=15min: windows anchor at :15 — 10:14:59 still belongs to 09:15
    assert(buckets("left", offset = 900) == Seq(
      "2024-03-01 09:15:00", "2024-03-01 09:15:00", "2024-03-01 10:15:00",
      "2024-03-01 10:15:00", "2024-03-01 10:15:00"))
    // zero offset + closed-left degenerates to date_trunc on real data
    val ev = Tables.t(spark, Sf, "events")
    val diff = ev.select(
        Temporal.dynamicBucket(col("ts"), 3600).as("a"),
        date_trunc("hour", col("ts")).as("b"))
      .filter(not(col("a") <=> col("b"))).count()
    assert(diff == 0)
    // pre-epoch timestamps floor-mod correctly (no toward-zero bias)
    val pre = Seq("1969-12-31 23:30:00").toDF("s")
      .select(Temporal.dynamicBucket(col("s").cast("timestamp_ntz"), 3600).cast("string"))
      .collect()(0).getString(0)
    assert(pre == "1969-12-31 23:00:00")
  }

  test("Horizontal fold/reduce/cum_reduce compose arbitrary accumulators") {
    import spark.implicits._
    import graft.functions.Horizontal
    val df = Seq((2.0, 3.0, 4.0)).toDF("a", "b", "c")
    val cols = Seq(col("a"), col("b"), col("c"))
    val out = df.select(
      Horizontal.fold(lit(0.0), (acc, x) => acc + x * x, cols).as("sumsq"),
      Horizontal.fold(lit(1.0), (acc, x) => acc * x, cols).as("prod"),
      Horizontal.reduce((acc, x) => greatest(acc, x), cols).as("hmax"),
      Horizontal.cumReduce((acc, x) => acc + x, cols, Seq("r1", "r2", "r3")).as("cr"))
      .collect()(0)
    assert(out.getDouble(0) == 4.0 + 9.0 + 16.0)
    assert(out.getDouble(1) == 24.0)
    assert(out.getDouble(2) == 4.0)
    val cr = out.getStruct(3)
    assert((cr.getDouble(0), cr.getDouble(1), cr.getDouble(2)) == ((2.0, 5.0, 9.0)))
    intercept[IllegalArgumentException](Horizontal.fold(lit(0), (a, x) => a + x, Nil))
    intercept[IllegalArgumentException](
      Horizontal.cumReduce((a, x) => a + x, cols, Seq("only-two", "names")))
  }
}
