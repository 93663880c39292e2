package graft.expressions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.trees.TreePattern
import org.apache.spark.sql.catalyst.trees.TreePattern.TreePattern
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Presto `to_iso8601(x)` as a type-dispatching RuntimeReplaceable
  * (SURVEY.md §3.H dialect surface; the reference hands query text to
  * Presto verbatim via `pandas_td/td.py :: read_td_query`, so migrating
  * notebooks carry this spelling).
  *
  * Presto renders DATE as `yyyy-MM-dd` but TIMESTAMP as
  * `yyyy-MM-dd'T'HH:mm:ss.SSS` — one name, two formats chosen by the
  * ARGUMENT type. A parse-time builder cannot see the (unresolved)
  * child's type, so like [[TdTimeRange]] this node defers the choice to
  * Catalyst's `ReplaceExpressions` (Finish-Analysis, after types are
  * known) and expands to a plain `date_format` — fully codegen'd, never
  * a UDF. TIMESTAMP formats in the session zone (Presto's timestamps are
  * zone-less wall-clock; under the harness's pinned UTC session the two
  * conventions coincide), TIMESTAMP_NTZ formats its wall-clock fields
  * directly.
  */
case class ToIso8601(child: Expression, timeZoneId: Option[String] = None)
    extends UnaryExpression with RuntimeReplaceable with TimeZoneAwareExpression {

  // Same trait-linearization footnote as TdTimeRange: TimeZoneAware's
  // final nodePatterns would otherwise drop RUNTIME_REPLACEABLE and the
  // pruned ReplaceExpressions transform would never visit this node.
  override def nodePatternsInternal(): Seq[TreePattern] =
    Seq(TreePattern.RUNTIME_REPLACEABLE)

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case DateType | TimestampType | _: TimestampNTZType =>
      TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"to_iso8601 expects DATE or TIMESTAMP, got ${other.simpleString}")
  }

  private def fmt(p: String): Expression =
    Literal(UTF8String.fromString(p), StringType)

  /** The replacement must resolve even when `ReplaceExpressions` reaches
    * this node before `ResolveTimeZone` has injected a zone (observed
    * with attribute children through temp views): default to the session
    * zone — exactly the value ResolveTimeZone would set. */
  private def zone: Option[String] = timeZoneId.orElse(
    Some(org.apache.spark.sql.internal.SQLConf.get.sessionLocalTimeZone))

  // A spliced replacement gets NO implicit coercion, and DateFormatClass
  // accepts only TIMESTAMP — a TIMESTAMP_NTZ child (what parquet µs
  // non-UTC-adjusted columns read as) must be cast EXPLICITLY or the
  // replacement is unresolved and CheckAnalysis throws INTERNAL_ERROR.
  // The NTZ→LTZ cast renders through the same zone the formatter uses,
  // so the wall-clock text is unchanged; for TIMESTAMP children
  // SimplifyCasts drops the no-op.
  override lazy val replacement: Expression = child.dataType match {
    case DateType =>
      DateFormatClass(Cast(child, TimestampType, zone), fmt("yyyy-MM-dd"), zone)
    case _ =>
      DateFormatClass(Cast(child, TimestampType, zone),
        fmt("yyyy-MM-dd'T'HH:mm:ss.SSS"), zone)
  }

  override def withTimeZone(timeZoneId: String): TimeZoneAwareExpression =
    copy(timeZoneId = Some(timeZoneId))

  override def prettyName: String = "to_iso8601"
  override protected def withNewChildInternal(newChild: Expression): ToIso8601 =
    copy(child = newChild)
}
