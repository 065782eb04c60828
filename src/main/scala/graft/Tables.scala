package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Parquet table loader for the driver-generated TPC-H-ish testdata.
  *
  * `events.ts` is physically TIMESTAMP(NANOS), which Spark's vectorized
  * parquet reader rejects; we read it as a long (legacy nanosAsLong)
  * and convert to µs TIMESTAMP_NTZ — the same ns→µs truncation DuckDB
  * applies, so oracle comparisons agree.
  */
object Tables {
  def t(s: SparkSession, dir: String, name: String): DataFrame = {
    if (name == "events") {
      s.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
      s.read.parquet(s"$dir/$name.parquet")
        .withColumn("ts", expr("cast(timestamp_micros(ts div 1000) as timestamp_ntz)"))
    } else {
      s.read.parquet(s"$dir/$name.parquet")
    }
  }
}
