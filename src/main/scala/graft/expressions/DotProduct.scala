package graft.expressions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, FloatType}

/** Native Catalyst expression: dot product of a float vector with a
  * double weight vector — the hyperplane-projection kernel behind the
  * LSH bucket assignment (LlmOps.lshProject).
  *
  * Exists for the same reason as [[CosineSimilarity]]: the composable
  * `zip_with` + `aggregate` form is interpreted (a lambda frame per
  * element — measured ~2× on the bucket-assignment scan), while this is
  * one fused primitive loop inside whole-stage codegen. Arithmetic is
  * specified to match that HOF form EXACTLY — left-to-right double
  * accumulation of `(double) x_i * w_i` starting at 0.0 — so the
  * projection is order-free by construction (array order, independent of
  * partitioning) and hash-identical to the DuckDB oracle's
  * single-threaded unnest-order SUM. */
case class DotProduct(left: Expression, right: Expression)
    extends BinaryExpression {

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    val ok = (left.dataType, right.dataType) match {
      case (ArrayType(FloatType, _), ArrayType(DoubleType, _)) => true
      case _ => false
    }
    if (ok) org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
      s"dot_product expects (array<float>, array<double>), " +
        s"got (${left.dataType.simpleString}, ${right.dataType.simpleString})")
  }
  override def dataType: DataType = DoubleType
  override def prettyName: String = "dot_product"

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val w = b.asInstanceOf[ArrayData]
    val n = math.min(x.numElements(), w.numElements())
    var dot = 0.0
    var i = 0
    while (i < n) { dot += x.getFloat(i).toDouble * w.getDouble(i); i += 1 }
    dot
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (x, w) => {
      val i = ctx.freshName("i"); val n = ctx.freshName("n")
      val dot = ctx.freshName("dot")
      s"""
        int $n = java.lang.Math.min($x.numElements(), $w.numElements());
        double $dot = 0.0;
        for (int $i = 0; $i < $n; $i++) {
          $dot += (double) $x.getFloat($i) * $w.getDouble($i);
        }
        ${ev.value} = $dot;
      """
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): DotProduct =
    copy(left = newLeft, right = newRight)
}

object DotProduct {
  /** Register `dot_product(a, w)` for SQL / call_function use. */
  def register(spark: org.apache.spark.sql.SparkSession): Unit =
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "dot_product",
      (exprs: Seq[Expression]) => DotProduct(exprs.head, exprs(1)),
      "scala_udf")

  /** Column-level entry point (requires `register`). */
  def apply(spark: org.apache.spark.sql.SparkSession, a: Column, w: Column): Column = {
    register(spark)
    org.apache.spark.sql.functions.call_function("dot_product", a, w)
  }
}
