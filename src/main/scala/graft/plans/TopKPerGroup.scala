package graft.plans

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.SparkStrategy
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Attribute, AttributeReference, Cast, Expression, JoinedRow, UnsafeProjection, UnsafeRow}
import org.apache.spark.sql.catalyst.plans.logical.{LogicalPlan, UnaryNode}
import org.apache.spark.sql.catalyst.plans.physical.{ClusteredDistribution, Distribution, Partitioning, UnknownPartitioning}
import org.apache.spark.sql.execution.{SparkPlan, UnaryExecNode}
import org.apache.spark.sql.types.{DoubleType, LongType}

/** Per-group top-k as a first-class operator (preference tier (c)) — the
  * shape Spark's built-ins cannot produce.
  *
  * The composable form (e7: row_number() window + filter) must shuffle
  * EVERY row to its group's reducer and SORT whole partitions before the
  * rank filter drops all but k rows per group — at 100 TB that is a
  * full-data exchange plus an O(n log n) sort to keep k·|groups| rows.
  * This operator treats top-k like an aggregation instead:
  *
  *   PartialTopKExec  — per input partition, a hash map of group →
  *                      bounded k-heap (worst element at the head);
  *                      emits only the ≤ k·|groups-in-partition|
  *                      survivors. No distribution requirement, no sort:
  *                      map-side combine for rank queries.
  *   (hash exchange on the group key — inserted by EnsureRequirements)
  *   FinalTopKExec    — same heap pass over the co-located survivors,
  *                      then each group's k rows emit with rank 1..k.
  *
  * The exchange therefore carries ≤ partitions·groups·k rows instead of
  * n, and NOTHING is ever sorted beyond k-element group heaps. Memory is
  * the map-side-partial-aggregation bound: k rows per live group per
  * partition. Rows with a NULL group, order, or tie value are dropped
  * (documented; the SQL twin's row_number keeps them — callers filter
  * nulls first when they matter).
  *
  * Types are pinned to the engine's hot-path kinds: group/tie LongType,
  * order DoubleType (the API casts the order column). Ranking order is
  * (order DESC, tie ASC) — row_number-compatible and fully deterministic.
  */
case class TopKPerGroupPlan(
    child: LogicalPlan,
    groupKey: Expression, orderVal: Expression, tie: Expression,
    k: Int,
    // a constructor field, NOT a body val: optimizer transforms copy()
    // the node, and a regenerated exprId would orphan downstream
    // references to the rank column
    rnAttr: AttributeReference = AttributeReference("rn", LongType,
      nullable = false)()) extends UnaryNode {
  override def output: Seq[Attribute] = child.output :+ rnAttr
  // rn is PRODUCED here, not consumed: without this the analyzer's
  // missingInput check reads the rnAttr constructor field as a reference
  // the child must supply
  override def producedAttributes: org.apache.spark.sql.catalyst.expressions.AttributeSet =
    org.apache.spark.sql.catalyst.expressions.AttributeSet(rnAttr)
  override protected def withNewChildInternal(newChild: LogicalPlan)
      : TopKPerGroupPlan = copy(child = newChild)
}

/** One heap entry: the scoring triple plus the buffered row. */
private[plans] final class TopKEntry(
    val score: Double, val tie: Long, val row: UnsafeRow)

private[plans] object TopKHeap {
  /** Priority queue with the WORST survivor at the head, so replacement
    * is an O(log k) head swap. "a beats b" ⇔ a.score > b.score, ties to
    * the smaller tie value. */
  val worstFirst: Ordering[TopKEntry] = new Ordering[TopKEntry] {
    def compare(a: TopKEntry, b: TopKEntry): Int = {
      val c = java.lang.Double.compare(b.score, a.score) // lower score = worse = max
      // larger tie = worse = max — note the a/b side FLIPS vs the score
      // term (score: lower is worse; tie: higher is worse). The
      // PropertySpec random-tie reference caught exactly this.
      if (c != 0) c else java.lang.Long.compare(a.tie, b.tie)
    }
  }

  def offer(heap: scala.collection.mutable.PriorityQueue[TopKEntry],
      k: Int, score: Double, tie: Long, row: UnsafeRow): Unit = {
    if (heap.size < k) heap.enqueue(new TopKEntry(score, tie, row.copy()))
    else {
      val worst = heap.head
      if (score > worst.score || (score == worst.score && tie < worst.tie)) {
        heap.dequeue()
        heap.enqueue(new TopKEntry(score, tie, row.copy()))
      }
    }
  }
}

abstract class TopKPerGroupExecBase extends UnaryExecNode {
  def groupKey: Expression; def orderVal: Expression; def tie: Expression
  def k: Int

  protected def heapsOf(it: Iterator[InternalRow])
      : scala.collection.mutable.LinkedHashMap[
          Long, scala.collection.mutable.PriorityQueue[TopKEntry]] = {
    val proj = UnsafeProjection.create(
      Seq(groupKey, Cast(orderVal, DoubleType), tie), child.output)
    // child rows are not guaranteed unsafe (e.g. straight off a custom
    // exec) — normalize through an identity projection; offer() copies.
    val toUnsafe = UnsafeProjection.create(child.output, child.output)
    val heaps = scala.collection.mutable.LinkedHashMap.empty[
      Long, scala.collection.mutable.PriorityQueue[TopKEntry]]
    it.foreach { row =>
      val key = proj(row)
      if (!key.isNullAt(0) && !key.isNullAt(1) && !key.isNullAt(2)) {
        val heap = heaps.getOrElseUpdate(key.getLong(0),
          scala.collection.mutable.PriorityQueue.empty(TopKHeap.worstFirst))
        TopKHeap.offer(heap, k, key.getDouble(1), key.getLong(2),
          toUnsafe(row))
      }
    }
    heaps
  }
}

/** Map-side phase: emits each partition's per-group survivors, unranked. */
case class PartialTopKExec(child: SparkPlan,
    groupKey: Expression, orderVal: Expression, tie: Expression,
    k: Int) extends TopKPerGroupExecBase {
  override def output: Seq[Attribute] = child.output
  override def outputPartitioning: Partitioning = child.outputPartitioning
  override protected def withNewChildInternal(newChild: SparkPlan)
      : PartialTopKExec = copy(child = newChild)
  protected override def doExecute(): RDD[InternalRow] =
    child.execute().mapPartitions({ it =>
      heapsOf(it).valuesIterator.flatMap(_.iterator.map(_.row))
    })
}

/** Reduce-side phase: requires co-location on the group key; re-runs the
  * heap pass over the survivors and emits rank 1..k per group. */
case class FinalTopKExec(child: SparkPlan,
    groupKey: Expression, orderVal: Expression, tie: Expression,
    k: Int, rnAttr: AttributeReference) extends TopKPerGroupExecBase {
  override def output: Seq[Attribute] = child.output :+ rnAttr
  override def producedAttributes: org.apache.spark.sql.catalyst.expressions.AttributeSet =
    org.apache.spark.sql.catalyst.expressions.AttributeSet(rnAttr)
  override def requiredChildDistribution: Seq[Distribution] =
    Seq(ClusteredDistribution(Seq(groupKey)))
  override def outputPartitioning: Partitioning =
    UnknownPartitioning(child.outputPartitioning.numPartitions)
  override protected def withNewChildInternal(newChild: SparkPlan)
      : FinalTopKExec = copy(child = newChild)
  protected override def doExecute(): RDD[InternalRow] = {
    val outAttrs = output
    child.execute().mapPartitions({ it =>
      val outProj = UnsafeProjection.create(outAttrs, outAttrs)
      val joined = new JoinedRow
      val rnRow = new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(1)
      heapsOf(it).valuesIterator.flatMap { heap =>
        // drain ascending-by-badness, reverse → rank order
        val ranked = heap.dequeueAll.reverse
        ranked.iterator.zipWithIndex.map { case (e, i) =>
          rnRow.setLong(0, i + 1L)
          outProj(joined(e.row, rnRow))
        }
      }
    })
  }
}

object TopKPerGroupStrategy extends SparkStrategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case TopKPerGroupPlan(child, g, o, t, k, rn) =>
      FinalTopKExec(
        PartialTopKExec(planLater(child), g, o, t, k), g, o, t, k, rn) :: Nil
    case _ => Nil
  }
}

/** Column pruning through the custom node (same rationale as
  * PruneAsOfJoin: built-in ColumnPruning cannot see custom operators, and
  * an unpruned child scan at 100 TB is the whole game). */
object PruneTopKPerGroup extends org.apache.spark.sql.catalyst.rules.Rule[LogicalPlan] {
  import org.apache.spark.sql.catalyst.expressions.AttributeSet
  import org.apache.spark.sql.catalyst.plans.logical.Project

  override def apply(plan: LogicalPlan): LogicalPlan = plan.transform {
    case p @ Project(projList, t: TopKPerGroupPlan) =>
      val needed = AttributeSet(projList.flatMap(_.references)) ++
        AttributeSet(Seq(t.groupKey, t.orderVal, t.tie).flatMap(_.references))
      val keep = t.child.output.filter(needed.contains)
      if (keep.length == t.child.output.length) p
      else p.copy(child = t.copy(child = Project(keep, t.child)))
  }
}

object TopK {
  /** df plus a `rn` column ranking each group's rows by (orderCol DESC,
    * tieCol ASC), keeping only rn ≤ k — computed heap-wise with a
    * map-side partial, never a sort. group/tie must be LongType; the
    * order column is cast to double. */
  def perGroup(df: DataFrame, groupCol: String, orderCol: String,
      tieCol: String, k: Int): DataFrame = {
    val spark = df.sparkSession
    if (!spark.experimental.extraStrategies.contains(TopKPerGroupStrategy))
      spark.experimental.extraStrategies =
        spark.experimental.extraStrategies :+ TopKPerGroupStrategy
    if (!spark.experimental.extraOptimizations.contains(PruneTopKPerGroup))
      spark.experimental.extraOptimizations =
        spark.experimental.extraOptimizations :+ PruneTopKPerGroup
    val child = df.queryExecution.analyzed
    def attr(n: String): Attribute =
      child.output.find(_.name == n).getOrElse(throw new IllegalArgumentException(
        s"no column $n in ${child.output.map(_.name)}"))
    require(k > 0, s"k must be positive, got $k")
    org.apache.spark.sql.GraftSqlBridge.ofRows(spark,
      TopKPerGroupPlan(child, attr(groupCol), attr(orderCol), attr(tieCol), k))
  }
}
