package graft.expressions

import java.text.Normalizer

import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Presto `normalize(string[, form])` — Unicode normalization (NFC by
  * default), the canonicalization step text-dedup pipelines apply before
  * hashing: a decomposed "é" and a composed "é" must digest
  * identically or near-dup candidates silently split by encoding.
  *
  * A native `UnaryExpression` WITH `doGenCode` (not CodegenFallback, not
  * a UDF): the generated code is one static `java.text.Normalizer` call,
  * so the expression rides inside the surrounding whole-stage-codegen
  * span — at 100 TB the normalization runs at scan speed next to the
  * projection it feeds. The form is fixed at PLAN time (Presto requires
  * a literal keyword there too), so codegen embeds the enum constant
  * directly — no per-row dispatch.
  */
case class UnicodeNormalize(child: Expression, form: Normalizer.Form)
    extends UnaryExpression {

  override def dataType: DataType = StringType
  override def checkInputDataTypes() =
    if (child.dataType == StringType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
      s"normalize expects a string, got ${child.dataType.simpleString}")

  override protected def nullSafeEval(input: Any): Any =
    UTF8String.fromString(Normalizer.normalize(
      input.asInstanceOf[UTF8String].toString, form))

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      "org.apache.spark.unsafe.types.UTF8String.fromString(" +
        s"java.text.Normalizer.normalize($c.toString(), " +
        s"java.text.Normalizer.Form.${form.name()}))")

  override def prettyName: String = "normalize"
  override protected def withNewChildInternal(newChild: Expression): UnicodeNormalize =
    copy(child = newChild)
}

object UnicodeNormalize {
  /** Presto's literal form keywords. */
  def form(name: String): Normalizer.Form = name.toUpperCase match {
    case "NFC"  => Normalizer.Form.NFC
    case "NFD"  => Normalizer.Form.NFD
    case "NFKC" => Normalizer.Form.NFKC
    case "NFKD" => Normalizer.Form.NFKD
    case other => throw new IllegalArgumentException(
      s"normalize form must be NFC|NFD|NFKC|NFKD, got $other")
  }
}
