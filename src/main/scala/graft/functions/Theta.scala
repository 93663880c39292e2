package graft.functions

import org.apache.datasketches.memory.Memory
import org.apache.datasketches.theta.{CompactSketch, SetOperation, Sketches, Union}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, ExpectsInputTypes, Expression, ImplicitCastInputTypes, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.types._

/** Theta distinct-count sketches with TRUE set algebra — the capability
  * tier ABOVE HLL (d19/d22/j45, Presto `approx_set`): an HLL can only
  * union, so intersections come from inclusion–exclusion (j45), whose
  * error grows with the union size; a Theta sketch retains a hash SAMPLE
  * of the set, so intersection and difference are first-class operations
  * with bounded relative error (Datasketches theta family — the same
  * public sketch library Spark's own hll_sketch_agg wraps).
  *
  * Surface (registered for SQL by [[Theta.register]]):
  *   theta_sketch_agg(x[, lgK=12])  aggregate → binary compact sketch
  *   theta_union_agg(sk)            aggregate over sketch columns
  *   theta_estimate(sk)             → BIGINT (rounded estimate)
  *   theta_intersect(a, b)          → binary sketch of A∩B
  *   theta_a_not_b(a, b)            → binary sketch of A∖B
  *   theta_union(a, b)              → binary sketch of A∪B (pairwise)
  *
  * Determinism contract (what makes the d24 oracle a HASH check): in the
  * EXACT regime — every constituent set smaller than the nominal 2^lgK
  * entries — a theta sketch retains ALL hashes (θ=1, no sampling, no
  * randomness), ordered compaction sorts them, and every set operation
  * is literal hash-set algebra, so estimates are exact integers and the
  * sketch bytes are insertion-order-independent. Past the bound the
  * numbers degrade gracefully to ±~1.6%/√k estimates (scalatest-bounded,
  * like d7). The scalar ops run per GROUP row (sources², never corpus
  * rows), so CodegenFallback costs nothing on the 100 TB hot path — the
  * corpus-sized work is the one partial-aggregated sketch build.
  */
object Theta {

  private[functions] def wrap(bytes: Array[Byte]): CompactSketch =
    Sketches.wrapCompactSketch(Memory.wrap(bytes))

  /** theta_sketch_agg(x[, lgK]) — build a sketch over a LONG column. The
    * buffer is a theta Union (its internal gadget accepts raw updates),
    * so partial/merge is the native union — map-side combine works. */
  case class ThetaSketchAgg(
      child: Expression,
      lgK: Int = 12,
      mutableAggBufferOffset: Int = 0,
      inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[Union] with ImplicitCastInputTypes {

    override def children: Seq[Expression] = Seq(child)
    override def nullable: Boolean = false
    override def dataType: DataType = BinaryType
    // a STRING/array child fails at ANALYSIS (with an implicit widening
    // cast for narrower integrals), not as a runtime ClassCastException
    override def inputTypes: Seq[DataType] = Seq(LongType)

    override def createAggregationBuffer(): Union =
      SetOperation.builder().setNominalEntries(1 << lgK).buildUnion()

    override def update(buf: Union, input: InternalRow): Union = {
      val v = child.eval(input)
      if (v != null) buf.update(v.asInstanceOf[Number].longValue())
      buf
    }

    override def merge(b1: Union, b2: Union): Union = {
      b1.union(b2.getResult(true, null)); b1
    }

    override def eval(buf: Union): Any = buf.getResult(true, null).toByteArray

    override def serialize(buf: Union): Array[Byte] =
      buf.getResult(true, null).toByteArray
    override def deserialize(bytes: Array[Byte]): Union = {
      val u = createAggregationBuffer()
      u.union(wrap(bytes)); u
    }

    override def withNewMutableAggBufferOffset(o: Int): ThetaSketchAgg =
      copy(mutableAggBufferOffset = o)
    override def withNewInputAggBufferOffset(o: Int): ThetaSketchAgg =
      copy(inputAggBufferOffset = o)
    override protected def withNewChildrenInternal(c: IndexedSeq[Expression]): ThetaSketchAgg =
      copy(child = c.head)
    override def prettyName: String = "theta_sketch_agg"
  }

  /** theta_union_agg(sk) — union stored sketches (the rollup leg). */
  case class ThetaUnionAgg(
      child: Expression,
      lgK: Int = 12,
      mutableAggBufferOffset: Int = 0,
      inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[Union] with ExpectsInputTypes {

    override def children: Seq[Expression] = Seq(child)
    override def nullable: Boolean = false
    override def dataType: DataType = BinaryType
    // only stored sketch bytes union soundly — STRICT binary (no implicit
    // string→binary cast: arbitrary bytes are not a sketch)
    override def inputTypes: Seq[DataType] = Seq(BinaryType)

    override def createAggregationBuffer(): Union =
      SetOperation.builder().setNominalEntries(1 << lgK).buildUnion()

    override def update(buf: Union, input: InternalRow): Union = {
      val v = child.eval(input)
      if (v != null) buf.union(wrap(v.asInstanceOf[Array[Byte]]))
      buf
    }
    override def merge(b1: Union, b2: Union): Union = {
      b1.union(b2.getResult(true, null)); b1
    }
    override def eval(buf: Union): Any = buf.getResult(true, null).toByteArray
    override def serialize(buf: Union): Array[Byte] =
      buf.getResult(true, null).toByteArray
    override def deserialize(bytes: Array[Byte]): Union = {
      val u = createAggregationBuffer()
      u.union(wrap(bytes)); u
    }

    override def withNewMutableAggBufferOffset(o: Int): ThetaUnionAgg =
      copy(mutableAggBufferOffset = o)
    override def withNewInputAggBufferOffset(o: Int): ThetaUnionAgg =
      copy(inputAggBufferOffset = o)
    override protected def withNewChildrenInternal(c: IndexedSeq[Expression]): ThetaUnionAgg =
      copy(child = c.head)
    override def prettyName: String = "theta_union_agg"
  }

  /** theta_estimate(sk) → BIGINT. Exact integer in the exact regime. */
  case class ThetaEstimate(child: Expression)
      extends UnaryExpression with CodegenFallback with ExpectsInputTypes {
    override def inputTypes: Seq[DataType] = Seq(BinaryType)
    override def dataType: DataType = LongType
    override def nullSafeEval(v: Any): Any =
      math.round(wrap(v.asInstanceOf[Array[Byte]]).getEstimate)
    override def prettyName: String = "theta_estimate"
    override protected def withNewChildInternal(c: Expression): ThetaEstimate =
      copy(child = c)
  }

  /** Pairwise set operation on two sketch values. */
  case class ThetaSetOp(left: Expression, right: Expression, op: String)
      extends BinaryExpression with CodegenFallback with ExpectsInputTypes {
    override def inputTypes: Seq[DataType] = Seq(BinaryType, BinaryType)
    override def dataType: DataType = BinaryType
    override def nullSafeEval(a: Any, b: Any): Any = {
      val sa = wrap(a.asInstanceOf[Array[Byte]])
      val sb = wrap(b.asInstanceOf[Array[Byte]])
      val out: CompactSketch = op match {
        case "intersect" =>
          SetOperation.builder().buildIntersection().intersect(sa, sb)
        case "a_not_b" => SetOperation.builder().buildANotB().aNotB(sa, sb)
        case "union" =>
          val u = SetOperation.builder().buildUnion()
          u.union(sa); u.union(sb); u.getResult(true, null)
      }
      out.toByteArray
    }
    override def prettyName: String = s"theta_$op"
    override protected def withNewChildrenInternal(
        l: Expression, r: Expression): ThetaSetOp = copy(left = l, right = r)
  }

  private def lgkOf(e: Expression): Int = {
    require(e.foldable, s"lgK must be a constant integer literal, got: ${e.sql}")
    val k = e.eval(null) match {
      case null => throw new IllegalArgumentException("lgK must not be NULL")
      case d: org.apache.spark.sql.types.Decimal => d.toInt
      case n: Number => n.intValue()
      case other => throw new IllegalArgumentException(
        s"lgK must be a numeric literal, got: $other")
    }
    require(k >= 4 && k <= 26, s"lgK must be in [4, 26], got $k")
    k
  }

  /** Register the SQL surface. */
  def register(spark: SparkSession): Unit = {
    val reg = spark.sessionState.functionRegistry
    reg.createOrReplaceTempFunction("theta_sketch_agg", {
      case Seq(c) => ThetaSketchAgg(c).toAggregateExpression()
      case Seq(c, k) => ThetaSketchAgg(c, lgkOf(k)).toAggregateExpression()
      case _ => throw new IllegalArgumentException("theta_sketch_agg(x[, lgK])")
    }, "scala_udf")
    reg.createOrReplaceTempFunction("theta_union_agg", {
      case Seq(c) => ThetaUnionAgg(c).toAggregateExpression()
      case Seq(c, k) => ThetaUnionAgg(c, lgkOf(k)).toAggregateExpression()
      case _ => throw new IllegalArgumentException("theta_union_agg(sk[, lgK])")
    }, "scala_udf")
    reg.createOrReplaceTempFunction("theta_estimate", {
      case Seq(c) => ThetaEstimate(c)
      case _ => throw new IllegalArgumentException("theta_estimate(sk)")
    }, "scala_udf")
    for (op <- Seq("intersect", "a_not_b", "union"))
      reg.createOrReplaceTempFunction(s"theta_$op", {
        case Seq(a, b) => ThetaSetOp(a, b, op)
        case _ => throw new IllegalArgumentException(s"theta_$op(a, b)")
      }, "scala_udf")
  }
}
