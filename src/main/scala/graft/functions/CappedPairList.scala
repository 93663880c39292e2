package graft.functions

import java.io.{ByteArrayInputStream, ByteArrayOutputStream, DataInputStream, DataOutputStream}
import scala.collection.mutable
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._

/** [[CappedLongList]]'s weighted sibling: size-capped collection of
  * (id, weight) long PAIRS with an exact group count —
  * `struct<ds: array<bigint>, cs: array<bigint>, df: bigint>` where the
  * parallel arrays hold AT MOST `cap` (id, weight) entries and `df` is
  * the true group size. Built for the weighted-Jaccard postings (j60):
  * each shingle's postings must carry the per-document term frequency
  * into the in-array pair expansion (Σ min(c_A, c_B) needs both counts
  * side by side), and a plain `collect_list(struct(doc, c))` materializes
  * the whole group in the aggregation buffer before any downstream
  * routing — the boilerplate-shingle OOM CappedLongList exists to
  * prevent. Same contract: groups with `df <= cap` come back complete;
  * bigger groups surface an exact `df` plus a partial sample that callers
  * must not read — full membership re-derives from the base relation on
  * the (rare) heavy keys. */
case class CappedPairList(
    id: Expression,
    weight: Expression,
    cap: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[CappedPairList.Buf] {

  require(cap > 0, s"cap must be positive, got $cap")

  override def children: Seq[Expression] = Seq(id, weight)
  override def nullable: Boolean = false
  override def dataType: DataType = StructType(Seq(
    StructField("ds", ArrayType(LongType)),
    StructField("cs", ArrayType(LongType)),
    StructField("df", LongType)))

  override def createAggregationBuffer(): CappedPairList.Buf =
    new CappedPairList.Buf(
      mutable.ArrayBuffer.empty[Long], mutable.ArrayBuffer.empty[Long], 0L)

  override def update(buf: CappedPairList.Buf, input: InternalRow): CappedPairList.Buf = {
    val d = id.eval(input)
    val w = weight.eval(input)
    if (d != null && w != null) {
      buf.df += 1L
      if (buf.ds.length < cap) {
        buf.ds += d.asInstanceOf[Long]
        buf.cs += w.asInstanceOf[Long]
      }
    }
    buf
  }

  override def merge(b1: CappedPairList.Buf, b2: CappedPairList.Buf): CappedPairList.Buf = {
    b1.df += b2.df
    val room = cap - b1.ds.length
    if (room > 0) {
      b1.ds ++= b2.ds.take(room)
      b1.cs ++= b2.cs.take(room)
    }
    b1
  }

  override def eval(buf: CappedPairList.Buf): Any =
    InternalRow(new GenericArrayData(buf.ds.toArray),
      new GenericArrayData(buf.cs.toArray), buf.df)

  override def serialize(buf: CappedPairList.Buf): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    val out = new DataOutputStream(bos)
    out.writeLong(buf.df)
    out.writeInt(buf.ds.length)
    buf.ds.foreach(out.writeLong)
    buf.cs.foreach(out.writeLong)
    out.flush(); bos.toByteArray
  }

  override def deserialize(bytes: Array[Byte]): CappedPairList.Buf = {
    val in = new DataInputStream(new ByteArrayInputStream(bytes))
    val df = in.readLong()
    val n = in.readInt()
    val ds = new mutable.ArrayBuffer[Long](n)
    val cs = new mutable.ArrayBuffer[Long](n)
    (0 until n).foreach(_ => ds += in.readLong())
    (0 until n).foreach(_ => cs += in.readLong())
    new CappedPairList.Buf(ds, cs, df)
  }

  override def withNewMutableAggBufferOffset(o: Int): CappedPairList =
    copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): CappedPairList =
    copy(inputAggBufferOffset = o)
  override protected def withNewChildrenInternal(c: IndexedSeq[Expression]): CappedPairList =
    copy(id = c(0), weight = c(1))
}

object CappedPairList {
  /** Mutable aggregation buffer: parallel kept prefixes + exact group size. */
  final class Buf(val ds: mutable.ArrayBuffer[Long],
      val cs: mutable.ArrayBuffer[Long], var df: Long)

  /** Register `capped_collect_pairs(id, weight, cap)` for SQL/expr use. */
  def register(spark: SparkSession): Unit =
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "capped_collect_pairs",
      (exprs: Seq[Expression]) => {
        val cap = exprs(2).eval(null).asInstanceOf[Number].intValue()
        CappedPairList(exprs(0), exprs(1), cap)
      },
      "scala_udf")
}
