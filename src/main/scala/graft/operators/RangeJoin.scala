package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Banded range join (SURVEY.md §2.2 — polars `join_where` / interval
  * joins). A naive inequality join compiles to a nested-loop join —
  * O(|L|·|R|) and a broadcast of one whole side: fatal at scale. Here
  * both sides are bucketed on `floor(point / bandWidth)`; an interval
  * [lo, hi] is exploded to every band it overlaps, points map to one
  * band, and the pairing becomes a key-EQUALITY shuffle join on the
  * band id followed by the exact predicate as a post-filter. Work is
  * O(|L| + |R| + |matches|) as long as bandWidth tracks the typical
  * interval length (each interval lands in O(1) bands).
  */
object RangeJoin {

  /** Join `points` (one value column) to `intervals` ([lo, hi] columns,
    * both inclusive) on optional equi-keys plus containment:
    * `lo <= point <= hi`.
    *
    * @param bandWidth band size in the value's units; choose ≈ the
    *                  P90 interval length so intervals explode to ~2
    *                  bands each
    */
  def pointInInterval(
      points: DataFrame,
      intervals: DataFrame,
      pointCol: String,
      loCol: String,
      hiCol: String,
      by: Seq[String] = Nil,
      bandWidth: Double): DataFrame = {
    require(bandWidth > 0, "bandWidth must be positive")
    val p = points.withColumn("__band", floor(col(pointCol) / bandWidth).cast("long"))
    val iv = intervals
      .filter(col(loCol) <= col(hiCol))
      .withColumn("__band",
        explode(sequence(
          floor(col(loCol) / bandWidth).cast("long"),
          floor(col(hiCol) / bandWidth).cast("long"))))
    p.join(iv, by :+ "__band")
      .filter(col(pointCol) >= col(loCol) && col(pointCol) <= col(hiCol))
      .drop("__band")
  }
}
