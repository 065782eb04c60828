package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{LongType, TimestampNTZType, TimestampType}

/** Parquet table loader for the driver-generated TPC-H-ish testdata.
  *
  * `events.ts` has been written by different driver generations as
  * TIMESTAMP(NANOS) (which Spark's vectorized reader only accepts as a
  * raw long under legacy nanosAsLong) and as TIMESTAMP(MICROS) (read
  * natively as TIMESTAMP_NTZ). Normalize either physical layout to µs
  * TIMESTAMP_NTZ — the ns path truncates ns→µs exactly like DuckDB, so
  * oracle comparisons agree regardless of which generation wrote the
  * file.
  */
object Tables {
  def t(s: SparkSession, dir: String, name: String): DataFrame = {
    if (name == "events") {
      s.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
      val raw = s.read.parquet(s"$dir/$name.parquet")
      raw.schema("ts").dataType match {
        case LongType => // TIMESTAMP(NANOS) read as ns-since-epoch long
          raw.withColumn("ts", expr("cast(timestamp_micros(ts div 1000) as timestamp_ntz)"))
        case TimestampNTZType => raw
        case TimestampType => // µs instants; session tz is UTC in all entrypoints
          raw.withColumn("ts", col("ts").cast(TimestampNTZType))
        case other =>
          throw new IllegalStateException(s"unexpected events.ts type: $other")
      }
    } else {
      s.read.parquet(s"$dir/$name.parquet")
    }
  }
}
