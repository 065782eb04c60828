package graft.operators

import org.apache.spark.sql.{Column, DataFrame, GraftShim}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.catalyst.expressions.{And, EqualNullSafe, EqualTo, Expression, GreaterThan, GreaterThanOrEqual, LessThan, LessThanOrEqual}

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

  /** Generic `join_where` (polars: join on an arbitrary list of
    * predicate conjuncts, ANDed). The physical strategy is picked from
    * the predicate structure, and NEVER silently degrades to a
    * cartesian:
    *
    *  - any cross-side equality conjunct → a plain key-equality join
    *    (Catalyst extracts the keys; the inequalities ride along as the
    *    join's residual condition);
    *  - otherwise, a pair of conjuncts that bound the SAME expression
    *    of one side from below and above by expressions of the other
    *    side (e.g. `r.lo <= l.x AND l.x < r.hi`) drives the banded
    *    equi-join of [[pointInInterval]], with every original predicate
    *    re-applied as the exact post-filter;
    *  - if neither exists, the join would be a nested loop over the
    *    full cross product — it throws instead of running it.
    *
    * Column names must be disjoint across the two sides (the polars
    * reference suffixes the right side for the same reason).
    *
    * @param bandWidth band size for the range-driven strategy, in the
    *                  bounded expression's units (ignored when an
    *                  equality conjunct drives the join)
    */
  def joinWhere(
      left: DataFrame,
      right: DataFrame,
      predicates: Seq[Column],
      bandWidth: Double = 0.0): DataFrame = {
    require(predicates.nonEmpty, "joinWhere needs at least one predicate")
    val shared = left.columns.toSet & right.columns.toSet
    require(shared.isEmpty,
      s"joinWhere requires disjoint column names across sides; shared: ${shared.mkString(", ")}")

    // resolve the predicates against the pair of schemas via a probe
    // plan that is analyzed but never executed — comparisons surface as
    // concrete catalyst nodes with side-attributable references
    val probe = left.crossJoin(right)
      .select(predicates.zipWithIndex.map { case (p, i) => p.as(s"__p$i") }: _*)
    val resolved: Seq[Expression] =
      probe.queryExecution.analyzed.expressions.collect {
        case a: org.apache.spark.sql.catalyst.expressions.Alias
          if a.name.startsWith("__p") => a.child
      }
    val leftAttrs = left.queryExecution.analyzed.outputSet
    val rightAttrs = right.queryExecution.analyzed.outputSet
    def conjuncts(e: Expression): Seq[Expression] = e match {
      case And(a, b) => conjuncts(a) ++ conjuncts(b)
      case other => Seq(other)
    }
    val all = resolved.flatMap(conjuncts)

    // which side an expression reads; None = literal-only or mixed
    def sideOf(e: Expression): Option[Boolean] = {
      val refs = e.references
      if (refs.isEmpty) None
      else if (refs.subsetOf(leftAttrs)) Some(true)
      else if (refs.subsetOf(rightAttrs)) Some(false)
      else None
    }
    def crossSide(a: Expression, b: Expression): Boolean =
      (sideOf(a), sideOf(b)) match {
        case (Some(x), Some(y)) => x != y
        case _ => false
      }

    val cond = predicates.reduce(_ && _)
    val hasEqui = all.exists {
      case EqualTo(a, b) => crossSide(a, b)
      case EqualNullSafe(a, b) => crossSide(a, b)
      case _ => false
    }
    if (hasEqui) return left.join(right, cond)

    // one directed bound per comparison per admissible viewpoint:
    // a < b reads as "a upper-bounded by b" AND "b lower-bounded by a"
    case class Bound(pointOnLeft: Boolean, point: Expression, bound: Expression, upper: Boolean)
    def mk(p: Expression, b: Expression, upper: Boolean): Option[Bound] =
      (sideOf(p), sideOf(b)) match {
        case (Some(x), Some(y)) if x != y => Some(Bound(x, p, b, upper))
        case _ => None
      }
    val bounds = all.flatMap {
      case LessThan(a, b) => mk(a, b, upper = true) ++ mk(b, a, upper = false)
      case LessThanOrEqual(a, b) => mk(a, b, upper = true) ++ mk(b, a, upper = false)
      case GreaterThan(a, b) => mk(a, b, upper = false) ++ mk(b, a, upper = true)
      case GreaterThanOrEqual(a, b) => mk(a, b, upper = false) ++ mk(b, a, upper = true)
      case _ => Nil
    }
    val bandable = bounds
      .groupBy(b => (b.pointOnLeft, b.point.canonicalized))
      .values.find(bs => bs.exists(_.upper) && bs.exists(!_.upper))
      .getOrElse(throw new IllegalArgumentException(
        "joinWhere: no cross-side equality and no expression bounded from both sides — " +
          "the join would be a full cross product; add a two-sided range conjunct " +
          "(e.g. r.lo <= l.x AND l.x <= r.hi) or an equality"))
    require(bandWidth > 0, "bandWidth must be positive for a range-driven joinWhere")

    val point = bandable.head.point
    val lo = bandable.find(!_.upper).get.bound
    val hi = bandable.find(_.upper).get.bound
    val (pointDf, ivDf) =
      if (bandable.head.pointOnLeft) (left, right) else (right, left)
    val p = pointDf.withColumn("__band",
      floor(GraftShim.column(point) / bandWidth).cast("long"))
    val iv = ivDf
      .withColumn("__lo_band", floor(GraftShim.column(lo) / bandWidth).cast("long"))
      .withColumn("__hi_band", floor(GraftShim.column(hi) / bandWidth).cast("long"))
      .filter(col("__lo_band") <= col("__hi_band"))
      .withColumn("__band", explode(sequence(col("__lo_band"), col("__hi_band"))))
      .drop("__lo_band", "__hi_band")
    p.join(iv, Seq("__band")).filter(cond).drop("__band")
  }
}
