package graft.functions

import java.io.{ByteArrayInputStream, ByteArrayOutputStream, DataInputStream, DataOutputStream}
import scala.collection.mutable
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._

/** Size-capped long collection with an exact group count, as a
  * `TypedImperativeAggregate`: `struct<ds: array<bigint>, df: bigint>`
  * where `ds` holds AT MOST `cap` input values and `df` is the true group
  * size. The buffer never grows past `cap`, which is the point: a plain
  * `collect_list` materializes the whole group in the aggregation buffer
  * BEFORE any downstream size filter can route it elsewhere — one
  * boilerplate shingle shared by 10M documents is an executor OOM at
  * 100 TB. Groups at or under the cap come back complete (`df <= cap` ⇒
  * `ds` is the whole group, deduplicated nowhere — exactly collect_list's
  * contract); bigger groups surface an exact `df` plus a partial sample,
  * and the caller re-derives their full membership from the base relation
  * (rare keys — a broadcastable semi filter, not a second shuffle).
  *
  * Which ≤cap elements survive a merge is partition-order-dependent; for
  * `df <= cap` the result is the full group regardless, and callers must
  * not read `ds` when `df > cap`.
  */
case class CappedLongList(
    child: Expression,
    cap: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[CappedLongList.Buf] {

  require(cap > 0, s"cap must be positive, got $cap")

  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = false
  override def dataType: DataType = StructType(Seq(
    StructField("ds", ArrayType(LongType)), StructField("df", LongType)))

  override def createAggregationBuffer(): CappedLongList.Buf =
    new CappedLongList.Buf(mutable.ArrayBuffer.empty[Long], 0L)

  override def update(buf: CappedLongList.Buf, input: InternalRow): CappedLongList.Buf = {
    val v = child.eval(input)
    if (v != null) {
      buf.df += 1L
      if (buf.ds.length < cap) buf.ds += v.asInstanceOf[Long]
    }
    buf
  }

  override def merge(b1: CappedLongList.Buf, b2: CappedLongList.Buf): CappedLongList.Buf = {
    b1.df += b2.df
    val room = cap - b1.ds.length
    if (room > 0) b1.ds ++= b2.ds.take(room)
    b1
  }

  override def eval(buf: CappedLongList.Buf): Any =
    InternalRow(new GenericArrayData(buf.ds.toArray), buf.df)

  override def serialize(buf: CappedLongList.Buf): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    val out = new DataOutputStream(bos)
    out.writeLong(buf.df)
    out.writeInt(buf.ds.length)
    buf.ds.foreach(out.writeLong)
    out.flush(); bos.toByteArray
  }

  override def deserialize(bytes: Array[Byte]): CappedLongList.Buf = {
    val in = new DataInputStream(new ByteArrayInputStream(bytes))
    val df = in.readLong()
    val n = in.readInt()
    val ds = new mutable.ArrayBuffer[Long](n)
    (0 until n).foreach(_ => ds += in.readLong())
    new CappedLongList.Buf(ds, df)
  }

  override def withNewMutableAggBufferOffset(o: Int): CappedLongList =
    copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): CappedLongList =
    copy(inputAggBufferOffset = o)
  override protected def withNewChildrenInternal(c: IndexedSeq[Expression]): CappedLongList =
    copy(child = c.head)
}

object CappedLongList {
  /** Mutable aggregation buffer: the kept prefix + the exact group size. */
  final class Buf(val ds: mutable.ArrayBuffer[Long], var df: Long)

  /** Register `capped_collect(col, cap)` for SQL/expr use. */
  def register(spark: SparkSession): Unit =
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "capped_collect",
      (exprs: Seq[Expression]) => {
        val cap = exprs(1).eval(null).asInstanceOf[Number].intValue()
        CappedLongList(exprs.head, cap)
      },
      "scala_udf")
}
