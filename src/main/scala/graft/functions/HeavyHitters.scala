package graft.functions

import java.io.{ByteArrayInputStream, ByteArrayOutputStream, DataInputStream, DataOutputStream}
import scala.collection.mutable
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Approximate top-k heavy hitters (SpaceSaving) as a
  * `TypedImperativeAggregate` — the mutable-buffer aggregate tier (the
  * machinery behind Spark's own HLL/percentile sketches).
  *
  * Buffer: a bounded counter map (capacity 4k for slack). When full, the
  * minimum counter is evicted and its count inherited (SpaceSaving
  * over-count bound). Merge sums counters and re-truncates, so the sketch
  * is shuffle-mergeable: map-side partial sketches + one reduce — counting
  * heavy terms over 100 TB without a full groupBy of the long tail.
  * Guarantee: any term with true frequency > N/capacity survives.
  * Output: array<struct<term,cnt>>, top-k by (count desc, term asc).
  * Approximate (merge-order-dependent counts) → scalatest containment
  * bounds, not a hash oracle.
  */
case class HeavyHitters(
    child: Expression,
    k: Int,
    capacityOpt: Option[Int] = None,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[mutable.Map[String, Long]] {

  // survival guarantee is freq > N/capacity — the default's generous slack
  // is because near-uniform distributions (like this word-soup corpus)
  // need capacity close to the distinct-term count to rank the head
  // reliably; td_approx_most_frequent passes TD's explicit capacity arg
  private def capacity: Int = capacityOpt.getOrElse(16 * k)

  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(StructType(Seq(
    StructField("term", StringType), StructField("cnt", LongType))))

  override def createAggregationBuffer(): mutable.Map[String, Long] =
    mutable.Map.empty[String, Long]

  private def add(buf: mutable.Map[String, Long], term: String, c: Long): Unit = {
    buf.get(term) match {
      case Some(x) => buf.update(term, x + c)
      case None if buf.size < capacity => buf.update(term, c)
      case None =>
        val (minT, minC) = buf.minBy(_._2) // SpaceSaving eviction
        buf.remove(minT)
        buf.update(term, minC + c)
    }
  }

  override def update(buf: mutable.Map[String, Long], input: InternalRow): mutable.Map[String, Long] = {
    val v = child.eval(input)
    if (v != null) add(buf, v.toString, 1L)
    buf
  }

  override def merge(b1: mutable.Map[String, Long], b2: mutable.Map[String, Long]): mutable.Map[String, Long] = {
    b2.foreach { case (t, c) => add(b1, t, c) }
    b1
  }

  override def eval(buf: mutable.Map[String, Long]): Any = {
    val top = buf.toSeq.sortBy { case (t, c) => (-c, t) }.take(k)
    new GenericArrayData(top.map { case (t, c) =>
      InternalRow(UTF8String.fromString(t), c)
    }.toArray[Any])
  }

  // length-prefixed UTF-8, NOT writeUTF: DataOutputStream.writeUTF caps
  // entries at 65,535 bytes and a tracked token can legitimately exceed
  // it (a 100k-char blob token — r20 pathological sweep threw
  // UTFDataFormatException through the partial-aggregate shuffle)
  override def serialize(buf: mutable.Map[String, Long]): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    val out = new DataOutputStream(bos)
    out.writeInt(buf.size)
    buf.foreach { case (t, c) =>
      val b = t.getBytes(java.nio.charset.StandardCharsets.UTF_8)
      out.writeInt(b.length); out.write(b); out.writeLong(c)
    }
    out.flush(); bos.toByteArray
  }

  override def deserialize(bytes: Array[Byte]): mutable.Map[String, Long] = {
    val in = new DataInputStream(new ByteArrayInputStream(bytes))
    val n = in.readInt()
    val m = mutable.Map.empty[String, Long]
    (0 until n).foreach { _ =>
      val b = new Array[Byte](in.readInt()); in.readFully(b)
      m.update(new String(b, java.nio.charset.StandardCharsets.UTF_8),
        in.readLong())
    }
    m
  }

  override def withNewMutableAggBufferOffset(o: Int): HeavyHitters =
    copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): HeavyHitters =
    copy(inputAggBufferOffset = o)
  override protected def withNewChildrenInternal(c: IndexedSeq[Expression]): HeavyHitters =
    copy(child = c.head)
}

object HeavyHitters {
  /** Register `heavy_hitters(col, k)` for SQL use. */
  def register(spark: SparkSession): Unit =
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "heavy_hitters",
      (exprs: Seq[Expression]) => {
        val k = exprs(1).eval(null).asInstanceOf[Number].intValue()
        HeavyHitters(exprs.head, k)
      },
      "scala_udf")
}
