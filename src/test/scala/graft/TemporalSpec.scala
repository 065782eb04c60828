package graft

import org.apache.spark.sql.functions._
import graft.functions.Temporal

class TemporalSpec extends SparkSpec {

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
}
