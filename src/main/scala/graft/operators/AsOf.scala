package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** As-of (backward) join — polars `join_asof` analogue, fully
  * declarative: tag both sides, union, single shuffle on the by-key,
  * one window pass carrying the last right-side row forward. No
  * mapPartitions, no range cross-join — Catalyst/AQE keep it scalable
  * (shuffle is by key only; a key's rows sort within a partition).
  *
  * For each left row, attaches the most recent right row whose `on`
  * value is <= the left row's (ties: right row is visible at equal
  * timestamps, matching ASOF semantics `l.on >= r.on`).
  */
object AsOf {

  /** @param left      left (probe) side
    * @param right     right (reference) side
    * @param on        ordering column name (must exist on both sides)
    * @param by        equi-key column names (must exist on both sides)
    * @param rightCols right columns to attach, renamed via the map
    */
  def joinAsOf(
      left: DataFrame,
      right: DataFrame,
      on: String,
      by: Seq[String],
      rightCols: Map[String, String]): DataFrame = {

    val leftTagged = left
      .withColumn("__side", lit(1))
      .withColumn("__r", lit(null).cast(structSchema(right, rightCols)))
    // a null `on` value can never satisfy l.on >= r.on, but would sort
    // first (nulls-first asc) and be carried forward by the
    // ignoreNulls last() below — drop such rows up front.
    val rightTagged = right
      .filter(col(on).isNotNull)
      .select((by.map(col) :+ col(on) :+
        struct(rightCols.map { case (c, alias) => col(c).as(alias) }.toSeq: _*).as("__r")): _*)
      .withColumn("__side", lit(0))

    val unioned = leftTagged.unionByName(rightTagged, allowMissingColumns = true)
    // right rows (__side=0) sort before left rows at equal `on`, so an
    // equal-timestamp right row is visible to the left row.
    val w = Window
      .partitionBy(by.map(col): _*)
      .orderBy(col(on).asc, col("__side").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val carried = unioned.withColumn("__match", last(col("__r"), ignoreNulls = true).over(w))

    val attached = rightCols.values.foldLeft(
      carried.filter(col("__side") === 1)
    ) { (d, alias) => d.withColumn(alias, col(s"__match.$alias")) }
    attached.drop("__side", "__r", "__match")
  }

  private def structSchema(right: DataFrame, rightCols: Map[String, String]) =
    org.apache.spark.sql.types.StructType(
      rightCols.map { case (c, alias) =>
        org.apache.spark.sql.types.StructField(alias, right.schema(c).dataType)
      }.toSeq)
}
