package graft

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DateType, LongType, TimestampNTZType, TimestampType}

/** Parquet table loader for the driver-generated TPC-H-ish testdata.
  *
  * `events.ts` has been written by different driver generations as
  * TIMESTAMP(NANOS) (which Spark's vectorized reader only accepts as a
  * raw long under legacy nanosAsLong) and as TIMESTAMP(MICROS) (read
  * natively as TIMESTAMP_NTZ). Normalize either physical layout to µs
  * TIMESTAMP_NTZ — the ns path truncates ns→µs exactly like DuckDB, so
  * oracle comparisons agree regardless of which generation wrote the
  * file.
  *
  * `orders.o_orderdate` / `lineitem.l_shipdate` are semantically DATE
  * but some driver generations write them as timestamp[us]. Normalize
  * to DateType once at scan — otherwise every dt-family consumer pays
  * a per-row timestamp→date conversion (the r7 bench showed 4–8×
  * regressions on q_dt_offset/q_dt_arith from exactly this).
  */
object Tables {
  /** Instant (LTZ) → UTC wall-clock NTZ, independent of the session
    * time zone: the LTZ→NTZ cast renders in the session tz, so convert
    * that wall clock back from the session tz to UTC. A bare NTZ cast
    * is only correct when the session tz happens to be UTC.
    */
  private def ltzToUtcNtz(c: Column): Column =
    convert_timezone(current_timezone(), lit("UTC"), c.cast(TimestampNTZType))

  /** Normalize a semantically-DATE column to DateType whatever physical
    * type the generation wrote (date32 → no-op; timestamp → date of the
    * UTC wall clock).
    */
  private def normDate(df: DataFrame, name: String): DataFrame =
    df.schema.find(_.name == name).map(_.dataType) match {
      case Some(DateType) | None        => df
      case Some(TimestampNTZType)       => df.withColumn(name, col(name).cast(DateType))
      case Some(TimestampType)          => df.withColumn(name, ltzToUtcNtz(col(name)).cast(DateType))
      case Some(other) =>
        throw new IllegalStateException(s"unexpected $name type: $other")
    }

  def t(s: SparkSession, dir: String, name: String): DataFrame = {
    if (name == "events") {
      s.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
      val raw = s.read.parquet(s"$dir/$name.parquet")
      raw.schema("ts").dataType match {
        case LongType => // TIMESTAMP(NANOS) read as ns-since-epoch long
          raw.withColumn("ts", expr("cast(timestamp_micros(ts div 1000) as timestamp_ntz)"))
        case TimestampNTZType => raw
        case TimestampType => // µs instants: route through UTC, tz-proof
          raw.withColumn("ts", ltzToUtcNtz(col("ts")))
        case other =>
          throw new IllegalStateException(s"unexpected events.ts type: $other")
      }
    } else {
      val raw = s.read.parquet(s"$dir/$name.parquet")
      name match {
        case "orders"   => normDate(raw, "o_orderdate")
        case "lineitem" => normDate(raw, "l_shipdate")
        case _          => raw
      }
    }
  }
}
