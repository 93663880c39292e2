package graft.expressions

import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.types._

/** `TD_TIME_RANGE(t, from, to[, tz])` as a type-dispatching
  * RuntimeReplaceable — the SQL face of the reference's half-open
  * time-range predicate (SURVEY.md §3.H; reference `pandas_td/td.py ::
  * read_td_table` splices `td_time_range(time, ...)` into query text
  * verbatim).
  *
  * TD's `time` column is epoch SECONDS (BIGINT); our parquet fixtures
  * carry native TIMESTAMP columns. A parse-time function builder cannot
  * see the column's type (it is unresolved), so a fixed expansion must
  * pick one convention and silently breaks — or blocks pushdown — on the
  * other. This node defers the choice to after analysis: Catalyst's
  * `ReplaceExpressions` (Finish-Analysis batch, BEFORE filter pushdown)
  * asks for `replacement` once child types are known, and we emit
  *
  *   - LONG/INT `t`  → `t >= <epoch-sec literal> AND t < <epoch-sec literal>`
  *     (bounds constant-folded to plain longs — parquet row-group min/max
  *     skipping applies directly to the epoch column, TD's own layout);
  *   - everything else → `CAST(t AS TIMESTAMP) >= TIMESTAMP ... AND <`
  *     (for TIMESTAMP/DATE columns the cast is a no-op `SimplifyCasts`
  *     removes, so the comparison still reaches the scan).
  *
  * Either way the optimizer sees two plain comparisons — never a black-box
  * predicate — which at 100 TB is the difference between reading one week
  * and reading three years. A NULL literal bound means unbounded on that
  * side (TD semantics); the optional 4th arg is the IANA/abbrev timezone
  * the bound STRINGS are interpreted in (default: session zone, UTC).
  */
case class TdTimeRange(children: Seq[Expression])
    extends Expression with RuntimeReplaceable {

  require(children.length == 3 || children.length == 4,
    "td_time_range(t, from, to[, tz])")

  private def t = children.head
  private def tz: Option[Expression] = children.drop(3).headOption

  private def isNullLit(e: Expression): Boolean = e match {
    case Literal(null, _) => true
    case _ => false
  }

  /** Bound expression as a TIMESTAMP instant (tz-shifted if given). */
  private def tsBound(e: Expression): Expression = {
    val base = Cast(e, TimestampType)
    tz.map(z => ToUTCTimestamp(base, z)).getOrElse(base)
  }

  override lazy val replacement: Expression = {
    val (lhs, bound) = t.dataType match {
      case LongType | IntegerType =>
        // epoch-seconds column: compare long-to-long, bounds folded
        (t, (e: Expression) => Cast(tsBound(e), LongType))
      case _ =>
        (Cast(t, TimestampType), (e: Expression) => tsBound(e))
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

  override def prettyName: String = "td_time_range"
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): Expression =
    copy(children = newChildren)
}
