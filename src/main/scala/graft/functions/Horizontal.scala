package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** polars fold / reduce / cum_reduce — the GENERAL horizontal
  * accumulator over a column list (the named min/max/sum/mean
  * horizontals are the q_horizontal specializations). The accumulator
  * is composed at PLAN time: `f` is an arbitrary Column → Column
  * combinator, so the result is one fused, codegen'd row expression —
  * no arrays built, no UDF, no per-row lambda interpretation, and
  * column pruning still sees exactly the inputs used. Scan-local by
  * construction at any scale. */
object Horizontal {

  /** fold(acc = init) { acc = f(acc, col) } across `cols`, left to
    * right (polars `pl.fold`). */
  def fold(init: Column, f: (Column, Column) => Column, cols: Seq[Column]): Column = {
    require(cols.nonEmpty, "fold needs at least one column")
    cols.foldLeft(init)(f)
  }

  /** reduce: like [[fold]] but seeded with the first column (polars
    * `pl.reduce`). */
  def reduce(f: (Column, Column) => Column, cols: Seq[Column]): Column = {
    require(cols.nonEmpty, "reduce needs at least one column")
    cols.reduce(f)
  }

  /** cum_reduce: every intermediate accumulator as a struct field
    * (polars `pl.cum_reduce`) — field i is the reduction over
    * cols(0..i), named after the source column like polars. */
  def cumReduce(f: (Column, Column) => Column, cols: Seq[Column],
      names: Seq[String]): Column = {
    require(cols.nonEmpty, "cum_reduce needs at least one column")
    require(names.length == cols.length, "one name per column")
    val steps = cols.tail.scanLeft(cols.head)(f)
    struct(steps.zip(names).map { case (c, n) => c.as(n) }: _*)
  }
}
