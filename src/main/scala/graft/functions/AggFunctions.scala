package graft.functions

import org.apache.spark.sql.{Column, GraftShim}
import org.apache.spark.sql.catalyst.expressions.aggregate.Product

/** Aggregates the `functions._` surface lacks but the reference's
  * forwarded polars surface has (polars_dataset.py:74-78 →
  * `Expr.product()`).
  */
object AggFunctions {

  /** Multiplicative aggregate (polars `.product()`, DuckDB
    * `product()`): product of the non-null values, NULL on an
    * empty/all-null group. Reuses Spark's internal
    * [[org.apache.spark.sql.catalyst.expressions.aggregate.Product]]
    * DeclarativeAggregate — a codegen'd two-expression fold whose
    * partial (map-side) products merge multiplicatively, so the
    * shuffle carries one double per (group, map partition), never the
    * rows. Exactness note for oracle-facing callers: double multiply
    * is order-sensitive in general; on small-integer inputs whose
    * running product stays < 2^53 every partial is exact and the
    * result is bit-identical regardless of merge order.
    */
  def product(c: Column): Column =
    GraftShim.column(
      Product(GraftShim.resolvedExpression(c)).toAggregateExpression())
}
