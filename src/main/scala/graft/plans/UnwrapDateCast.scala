package graft.plans

import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.{DateType, TimestampNTZType}

/** Unwrap `cast(ts_ntz AS date) <cmp> date_literal` into an equivalent
  * raw-timestamp predicate, so filters written against a DATE-normalized
  * view of a physically-timestamp parquet column still reach the scan
  * as `PushedFilters` (Spark's own UnwrapCastInBinaryComparison covers
  * integral casts, not timestamp→date).
  *
  * Why this exists: [[graft.Tables.t]] normalizes semantically-DATE
  * columns that some writers persist as timestamp[us]. The
  * normalization is a projection, so a user predicate on the date
  * column reaches the relation as `cast(ts AS date) ≤ d` — which the
  * parquet source cannot push, silently turning a pruned scan into a
  * full read. At 100 TB that is the difference between reading one
  * row-group and reading the table.
  *
  * The rewrite is exact integer arithmetic: for NTZ micros, `cast(ts
  * AS date)` is floor(ts / 86 400 000 000), so with S(d) = d ·
  * 86 400 000 000 (midnight of day d):
  *
  *   cast(ts) <  d  ⟺  ts <  S(d)
  *   cast(ts) <= d  ⟺  ts <  S(d+1)
  *   cast(ts) >  d  ⟺  ts >= S(d+1)
  *   cast(ts) >= d  ⟺  ts >= S(d)
  *   cast(ts) =  d  ⟺  ts >= S(d) AND ts < S(d+1)
  *
  * Null semantics are preserved: every rewritten form is null iff `ts`
  * is null, exactly like the original comparison. LTZ timestamps are
  * NOT rewritten — their date cast depends on the session time zone,
  * and a silent tz assumption here would corrupt filters. Day values
  * beyond ±1e8 (±270 k years) are left alone to keep S(d+1) inside
  * Long.
  */
object UnwrapDateCastComparison extends Rule[LogicalPlan] {

  private val UsPerDay = 86400000000L
  private val MaxDay = 100000000

  private object DateCastNtz {
    def unapply(e: Expression): Option[Expression] = e match {
      case c: Cast if c.dataType == DateType && c.child.dataType == TimestampNTZType =>
        Some(c.child)
      case _ => None
    }
  }

  private def midnight(day: Long): Expression =
    Literal(day * UsPerDay, TimestampNTZType)

  private def inRange(d: Int): Boolean = d > -MaxDay && d < MaxDay

  override def apply(plan: LogicalPlan): LogicalPlan = plan.transformAllExpressions {
    case LessThan(DateCastNtz(ts), Literal(d: Int, DateType)) if inRange(d) =>
      LessThan(ts, midnight(d))
    case LessThanOrEqual(DateCastNtz(ts), Literal(d: Int, DateType)) if inRange(d) =>
      LessThan(ts, midnight(d + 1L))
    case GreaterThan(DateCastNtz(ts), Literal(d: Int, DateType)) if inRange(d) =>
      GreaterThanOrEqual(ts, midnight(d + 1L))
    case GreaterThanOrEqual(DateCastNtz(ts), Literal(d: Int, DateType)) if inRange(d) =>
      GreaterThanOrEqual(ts, midnight(d))
    case EqualTo(DateCastNtz(ts), Literal(d: Int, DateType)) if inRange(d) =>
      And(GreaterThanOrEqual(ts, midnight(d)), LessThan(ts, midnight(d + 1L)))
    // mirrored literal-first forms
    case LessThan(Literal(d: Int, DateType), DateCastNtz(ts)) if inRange(d) =>
      GreaterThanOrEqual(ts, midnight(d + 1L))
    case LessThanOrEqual(Literal(d: Int, DateType), DateCastNtz(ts)) if inRange(d) =>
      GreaterThanOrEqual(ts, midnight(d))
    case GreaterThan(Literal(d: Int, DateType), DateCastNtz(ts)) if inRange(d) =>
      LessThan(ts, midnight(d))
    case GreaterThanOrEqual(Literal(d: Int, DateType), DateCastNtz(ts)) if inRange(d) =>
      LessThan(ts, midnight(d + 1L))
    case EqualTo(Literal(d: Int, DateType), DateCastNtz(ts)) if inRange(d) =>
      And(GreaterThanOrEqual(ts, midnight(d)), LessThan(ts, midnight(d + 1L)))
  }
}
