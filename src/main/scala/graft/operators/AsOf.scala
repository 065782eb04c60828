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
    */
  def joinAsOf(
      left: DataFrame,
      right: DataFrame,
      on: String,
      by: Seq[String],
      rightCols: Map[String, String],
      strategy: String = "backward"): DataFrame = {
    require(Seq("backward", "forward", "nearest").contains(strategy),
      s"unknown asof strategy `$strategy`")

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
    // right rows (__side=0) sort before left rows at equal `on`, so an
    // equal-timestamp right row is visible to the left row in BOTH scan
    // directions (matching asof tie semantics).
    def w(desc: Boolean) = {
      val ord = if (desc) Seq(col(on).desc, col("__side").asc)
                else Seq(col(on).asc, col("__side").asc)
      Window.partitionBy(by.map(col): _*).orderBy(ord: _*)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    }

    val carried = strategy match {
      case "backward" =>
        unioned
          .withColumn("__match", last(col("__r"), ignoreNulls = true).over(w(desc = false)))
      case "forward" =>
        unioned
          .withColumn("__match", last(col("__r"), ignoreNulls = true).over(w(desc = true)))
      case "nearest" =>
        val back = last(col("__r"), ignoreNulls = true).over(w(desc = false))
        val backOn = last(col("__ron"), ignoreNulls = true).over(w(desc = false))
        val fwd = last(col("__r"), ignoreNulls = true).over(w(desc = true))
        val fwdOn = last(col("__ron"), ignoreNulls = true).over(w(desc = true))
        val dBack = abs(col(on).cast("double") - backOn.cast("double"))
        val dFwd = abs(fwdOn.cast("double") - col(on).cast("double"))
        unioned.withColumn("__match",
          when(backOn.isNull, fwd)
            .when(fwdOn.isNull, back)
            .when(dFwd < dBack, fwd)
            .otherwise(back)) // ties resolve backward
    }

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
