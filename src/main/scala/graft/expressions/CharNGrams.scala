package graft.expressions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, Generator}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Custom Catalyst Generator (UDTF): one text row → one row per character
  * n-gram, with its 0-based position. The genuine UDTF surface of
  * SURVEY.md §3.K k3 — `explode`/`posexplode` cover array-shaped
  * generation, but a Generator produces multi-column rows straight from a
  * scalar input with no intermediate array allocation: the n-gram set of a
  * 100 TB corpus never materializes per-row arrays, each generated row
  * streams out of the `GenerateExec` operator.
  *
  * Reference analog: the reference has no UDTF surface of its own — users
  * reach Hive/Presto `LATERAL VIEW explode` through SQL passthrough
  * (`pandas_td/td.py :: read_td_query`); this is that surface made native.
  */
case class CharNGrams(child: Expression, nExpr: Expression)
    extends Expression with Generator with CodegenFallback {

  override def children: Seq[Expression] = Seq(child, nExpr)

  override def checkInputDataTypes(): TypeCheckResult =
    (child.dataType, nExpr.dataType) match {
      case (StringType, IntegerType) if nExpr.foldable =>
        // reject non-positive n at ANALYSIS time: n=0 would emit len+1
        // empty grams and n<0 a StringIndexOutOfBounds from inside
        // GenerateExec at runtime — both misuse, neither a sane query
        nExpr.eval(InternalRow.empty) match {
          case n: Int if n >= 1 => TypeCheckResult.TypeCheckSuccess
          case n => TypeCheckResult.TypeCheckFailure(
            s"char_ngrams n must be a positive int literal, got $n")
        }
      case _ => TypeCheckResult.TypeCheckFailure(
        "char_ngrams expects (string, foldable int), got " +
          s"(${child.dataType.simpleString}, ${nExpr.dataType.simpleString})")
    }

  override def elementSchema: StructType = StructType(Seq(
    StructField("pos", IntegerType, nullable = false),
    StructField("gram", StringType, nullable = false)))

  override def eval(input: InternalRow): IterableOnce[InternalRow] = {
    val t = child.eval(input)
    if (t == null) Iterator.empty
    else {
      val s = t.asInstanceOf[UTF8String].toString
      val n = nExpr.eval(input).asInstanceOf[Int]
      if (s.length < n) Iterator.empty
      else (0 to s.length - n).iterator.map(i =>
        InternalRow(i, UTF8String.fromString(s.substring(i, i + n))))
    }
  }

  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): CharNGrams =
    copy(child = newChildren(0), nExpr = newChildren(1))
}

object CharNGrams {
  /** Register `char_ngrams(text, n)` for SQL / LATERAL VIEW use. */
  def register(spark: org.apache.spark.sql.SparkSession): Unit =
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "char_ngrams",
      (exprs: Seq[Expression]) => CharNGrams(exprs.head, exprs(1)),
      "scala_udf")

  def apply(spark: org.apache.spark.sql.SparkSession, text: Column, n: Int): Column = {
    register(spark)
    org.apache.spark.sql.functions.call_function(
      "char_ngrams", text, org.apache.spark.sql.functions.lit(n))
  }
}
