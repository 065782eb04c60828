package org.apache.spark.sql

import org.apache.spark.sql.catalyst.expressions.Expression

/** Bridge into Spark's private[sql] Column↔Expression conversion —
  * the standard extension-library shim (cf. how Spark-native libraries
  * expose custom Catalyst expressions as user-facing Columns). */
object GraftShim {
  def column(e: Expression): Column = classic.ExpressionUtils.column(e)
  def expression(c: Column): Expression = classic.ExpressionUtils.expression(c)

  /** private[sql] session internals needed to register native functions
    * on a live session (the extensions path covers session build). */
  def functionRegistry(spark: SparkSession): catalyst.analysis.FunctionRegistry =
    spark.asInstanceOf[classic.SparkSession].sessionState.functionRegistry
}
