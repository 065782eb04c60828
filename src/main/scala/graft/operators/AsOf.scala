package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** As-of join — polars `join_asof` analogue, fully declarative: tag
  * both sides, union, single shuffle on the by-key, one window pass
  * carrying the matching right-side row to each left row. No
  * mapPartitions, no range cross-join — Catalyst/AQE keep it scalable
  * (shuffle is by key only; a key's rows sort within a partition).
  *
  * Strategies (reference polars join_asof):
  *  - "backward": most recent right row with r.on <= l.on (ties match)
  *  - "forward":  earliest right row with r.on >= l.on (ties match)
  *  - "nearest":  whichever of the two is closer in `on`; exact ties
  *    resolve backward
  */
object AsOf {

  /** @param left      left (probe) side
    * @param right     right (reference) side
    * @param on        ordering column name (must exist on both sides)
    * @param by        equi-key column names (must exist on both sides)
    * @param rightCols right columns to attach, renamed via the map
    * @param strategy  "backward" (default) | "forward" | "nearest"
    * @param tolerance max |l.on - r.on| for a match (reference polars
    *                  join_asof tolerance, polars_dataset.py:74-78 via
    *                  forwarding); measured on `on` cast to double —
    *                  seconds for timestamps, absolute delta for
    *                  numerics; inclusive; None = unbounded
    * @param allowExactMatches when false, r.on == l.on rows are NOT
    *                  match candidates (strict inequality)
    */
  def joinAsOf(
      left: DataFrame,
      right: DataFrame,
      on: String,
      by: Seq[String],
      rightCols: Map[String, String],
      strategy: String = "backward",
      tolerance: Option[Double] = None,
      allowExactMatches: Boolean = true): DataFrame = {
    require(Seq("backward", "forward", "nearest").contains(strategy),
      s"unknown asof strategy `$strategy`")
    require(tolerance.forall(_ >= 0), "tolerance must be non-negative")

    val leftTagged = left
      .withColumn("__side", lit(1))
      .withColumn("__r", lit(null).cast(structSchema(right, rightCols)))
      .withColumn("__ron", lit(null).cast(right.schema(on).dataType))
    // a null `on` value can never satisfy either inequality, but would
    // sort first (nulls-first asc) and be carried forward by the
    // ignoreNulls last() below — drop such rows up front.
    val rightTagged = right
      .filter(col(on).isNotNull)
      .select((by.map(col) :+ col(on) :+
        struct(rightCols.map { case (c, alias) => col(c).as(alias) }.toSeq: _*).as("__r")): _*)
      .withColumn("__side", lit(0))
      .withColumn("__ron", col(on))

    val unioned = leftTagged.unionByName(rightTagged, allowMissingColumns = true)
    // Tie order at equal `on`: with exact matches allowed, right rows
    // (__side=0) sort before left rows, so the equal-timestamp right
    // row is visible to the left row in BOTH scan directions; with
    // exact matches disallowed, left rows sort first and the equal
    // right row stays outside the left row's frame in both directions.
    val sideTie = if (allowExactMatches) col("__side").asc else col("__side").desc
    // total order among right rows that tie on (by, on): a content hash
    // of the attached struct — without it, last() picks an arbitrary
    // tied row and results flicker across partitionings/reruns. Both
    // scan directions order the tie ascending, so both pick the same
    // (hash-max) right row.
    val rightRowTie = xxhash64(col("__r")).asc_nulls_first
    def w(desc: Boolean) = {
      val ord = if (desc) Seq(col(on).desc, sideTie, rightRowTie)
                else Seq(col(on).asc, sideTie, rightRowTie)
      Window.partitionBy(by.map(col): _*).orderBy(ord: _*)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    }

    // unused window expressions never enter the plan, so "backward"
    // still sorts once even though all four are defined here
    val back = last(col("__r"), ignoreNulls = true).over(w(desc = false))
    val backOn = last(col("__ron"), ignoreNulls = true).over(w(desc = false))
    val fwd = last(col("__r"), ignoreNulls = true).over(w(desc = true))
    val fwdOn = last(col("__ron"), ignoreNulls = true).over(w(desc = true))
    // temporal `on` types don't cast to double directly (NTZ in
    // particular refuses) — go through epoch micros
    import org.apache.spark.sql.types.{DataType, DateType, TimestampNTZType, TimestampType}
    def asNum(c: Column, dt: DataType): Column = dt match {
      case DateType | TimestampType | TimestampNTZType =>
        unix_micros(c.cast("timestamp")) / lit(1e6)
      case _ => c.cast("double")
    }
    val dBack = asNum(col(on), left.schema(on).dataType) -
      asNum(backOn, right.schema(on).dataType)
    val dFwd = asNum(fwdOn, right.schema(on).dataType) -
      asNum(col(on), left.schema(on).dataType)
    def inTol(d: Column): Column = tolerance.map(t => d <= lit(t)).getOrElse(lit(true))
    val backOk = backOn.isNotNull && inTol(dBack)
    val fwdOk = fwdOn.isNotNull && inTol(dFwd)

    val matched = strategy match {
      case "backward" => when(backOk, back)
      case "forward"  => when(fwdOk, fwd)
      case "nearest" => // exact ties resolve backward
        when(backOk && fwdOk, when(dFwd < dBack, fwd).otherwise(back))
          .when(backOk, back)
          .when(fwdOk, fwd)
    }
    // a left row with a null `on` OR any null by-key matches nothing
    // (polars/SQL join semantics) — without the guards the desc scan
    // would hand a null-`on` row the min-`on` right row, and
    // Window.partitionBy would group null by-keys together and match
    // them to each other (window partitioning, unlike joins, treats
    // NULL as equal to NULL)
    val keysOk = by.map(col(_).isNotNull).foldLeft(col(on).isNotNull)(_ && _)
    val carried = unioned.withColumn("__match", when(keysOk, matched))

    val attached = rightCols.values.foldLeft(
      carried.filter(col("__side") === 1)
    ) { (d, alias) => d.withColumn(alias, col(s"__match.$alias")) }
    attached.drop("__side", "__r", "__ron", "__match")
  }

  private def structSchema(right: DataFrame, rightCols: Map[String, String]) =
    org.apache.spark.sql.types.StructType(
      rightCols.map { case (c, alias) =>
        org.apache.spark.sql.types.StructField(alias, right.schema(c).dataType)
      }.toSeq)
}
