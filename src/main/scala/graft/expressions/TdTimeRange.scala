package graft.expressions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.trees.TreePattern
import org.apache.spark.sql.catalyst.trees.TreePattern.TreePattern
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** `TD_TIME_RANGE(t, from, to[, tz])` as a type-dispatching
  * RuntimeReplaceable — the SQL face of the reference's half-open
  * time-range predicate (SURVEY.md §3.H; reference `pandas_td/td.py ::
  * read_td_table` splices `td_time_range(time, ...)` into query text
  * verbatim).
  *
  * TD's `time` column is epoch SECONDS (BIGINT); our parquet fixtures
  * carry native TIMESTAMP / TIMESTAMP_NTZ columns. A parse-time function
  * builder cannot see the column's type (it is unresolved), so a fixed
  * expansion must pick one convention — and for the mismatched case the
  * analyzer's implicit coercion wraps the COLUMN in a cast, which blocks
  * parquet row-group pushdown. This node defers the choice to after
  * analysis: Catalyst's `ReplaceExpressions` (Finish-Analysis batch,
  * BEFORE filter pushdown) asks for `replacement` once child types are
  * known, and we emit comparisons whose left side is the BARE column:
  *
  *   - LONG/INT `t` → `t >= <epoch-sec literal> AND t < ...` (bounds
  *     folded to plain longs/ints — parquet min/max skipping applies
  *     directly to the epoch column, TD's own layout; integer bounds are
  *     epoch seconds and are NOT shifted by the tz argument, matching TD);
  *   - TIMESTAMP_NTZ `t` → `t >= <ntz literal> AND ...` (string bounds
  *     parse as wall-clock, or — with an explicit tz arg — as an instant
  *     in that zone rendered back through the session zone; either way a
  *     same-type comparison, no cast on `t`);
  *   - TIMESTAMP/DATE/other → `CAST(t AS TIMESTAMP) >= ...` (for
  *     TIMESTAMP columns `SimplifyCasts` removes the no-op cast, so the
  *     comparison still reaches the scan).
  *
  * Either way the optimizer sees plain comparisons — never a black-box
  * predicate — which at 100 TB is the difference between reading one week
  * and reading three years. A NULL literal bound means unbounded on that
  * side (TD semantics); the optional 4th arg is the IANA/abbrev timezone
  * the bound STRINGS are interpreted in (default: session zone). String
  * bounds are parsed by `Cast(_, TimestampType, tz)` with the zone passed
  * EXPLICITLY — not cast-then-`to_utc_timestamp`, which double-shifts
  * whenever the session zone differs from the target zone.
  */
case class TdTimeRange(children: Seq[Expression],
    timeZoneId: Option[String] = None)
    extends Expression with RuntimeReplaceable with TimeZoneAwareExpression {

  require(children.length == 3 || children.length == 4,
    "td_time_range(t, from, to[, tz])")

  // TimeZoneAwareExpression's FINAL `nodePatterns` (TIME_ZONE_AWARE ++
  // nodePatternsInternal()) wins the trait linearization over
  // RuntimeReplaceable's `Seq(RUNTIME_REPLACEABLE)` — without re-adding
  // the pattern here, the pruned ReplaceExpressions transform skips this
  // node and it survives to (unevaluable) execution.
  override def nodePatternsInternal(): Seq[TreePattern] =
    Seq(TreePattern.RUNTIME_REPLACEABLE)

  private def t = children.head

  /** A 4th argument must be a foldable non-null string — the zone is part
    * of the query text in TD's contract. Anything else (a column reference
    * typo'd where a zone was meant, a NULL) is rejected at ANALYSIS, not
    * silently dropped: a silent fallback to the session zone would change
    * filter semantics with no signal. */
  override def checkInputDataTypes(): TypeCheckResult =
    children.drop(3).headOption match {
      case Some(e) if !(e.foldable && e.dataType == StringType) =>
        TypeCheckResult.TypeCheckFailure(
          "td_time_range: 4th argument (timezone) must be a string literal, " +
            s"got: ${e.sql}")
      case Some(e) if e.eval() == null =>
        TypeCheckResult.TypeCheckFailure(
          "td_time_range: 4th argument (timezone) must not be NULL")
      case _ => TypeCheckResult.TypeCheckSuccess
    }

  /** Explicit 4th-arg zone (validated by checkInputDataTypes above). */
  private def tzArg: Option[String] = children.drop(3).headOption.flatMap {
    case Literal(s: UTF8String, StringType) => Option(s).map(_.toString)
    case e if e.foldable && e.dataType == StringType =>
      Option(e.eval()).map(_.asInstanceOf[UTF8String].toString)
    case _ => None
  }

  private def boundZone: Option[String] = tzArg.orElse(timeZoneId)

  private def isNullLit(e: Expression): Boolean = e match {
    case Literal(null, _) => true
    case _ => false
  }

  /** Bound as a TIMESTAMP instant. Numeric bounds are epoch seconds —
    * zone-independent by TD semantics, so no tz shift is applied. */
  private def tsBound(e: Expression): Expression = e.dataType match {
    case _: NumericType => Cast(e, TimestampType, timeZoneId)
    case _ => Cast(e, TimestampType, boundZone)
  }

  override lazy val replacement: Expression = {
    val (lhs, bound): (Expression, Expression => Expression) = t.dataType match {
      case it @ (LongType | IntegerType) =>
        // epoch-seconds column: both sides in the COLUMN's type (an
        // int-vs-long comparison spliced post-analysis would never be
        // coerced and fails/ClassCastExceptions at eval). Every Cast built
        // here is spliced AFTER analysis, so it must carry its zone
        // explicitly — ResolveTimeZone will not run again.
        (t, (e: Expression) => e.dataType match {
          case _: NumericType => Cast(e, it, timeZoneId)
          case _ => Cast(tsBound(e), it, timeZoneId)
        })
      case _: TimestampNTZType =>
        // wall-clock column: with no tz arg, string bounds parse as
        // wall-clock NTZ directly (zone-agnostic). With an explicit tz
        // arg, honor it like every other arm: parse the string as an
        // instant IN that zone, then render to the column's wall-clock
        // convention via the session zone — two foldable casts, so the
        // comparison is still literal-vs-bare-column and pushable.
        (t, (e: Expression) => e.dataType match {
          case StringType if tzArg.isDefined =>
            Cast(Cast(e, TimestampType, tzArg), TimestampNTZType, timeZoneId)
          case StringType => Cast(e, TimestampNTZType, timeZoneId)
          case _: TimestampNTZType => e
          case _ => Cast(tsBound(e), TimestampNTZType, timeZoneId)
        })
      case _ =>
        (Cast(t, TimestampType, timeZoneId), (e: Expression) => tsBound(e))
    }
    val lo = Option(children(1)).filterNot(isNullLit)
      .map(e => GreaterThanOrEqual(lhs, bound(e)))
    val hi = Option(children(2)).filterNot(isNullLit)
      .map(e => LessThan(lhs, bound(e)))
    (lo, hi) match {
      case (Some(a), Some(b)) => And(a, b)
      case (Some(a), None)    => a
      case (None, Some(b))    => b
      case (None, None)       => Literal(true, BooleanType)
    }
  }

  override def withTimeZone(timeZoneId: String): TimeZoneAwareExpression =
    copy(timeZoneId = Some(timeZoneId))

  override def prettyName: String = "td_time_range"
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): Expression =
    copy(children = newChildren)
}
