package graft.plans

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.SparkStrategy
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Ascending, Attribute, AttributeSet, Expression, JoinedRow, SortOrder, UnsafeProjection}
import org.apache.spark.sql.catalyst.plans.logical.{BinaryNode, LogicalPlan, Project}
import org.apache.spark.sql.catalyst.plans.physical.{ClusteredDistribution, Distribution, Partitioning, UnknownPartitioning}
import org.apache.spark.sql.execution.{BinaryExecNode, SparkPlan}

/** Keyed interval-overlap join as a custom physical operator (the second
  * whole-operator build next to AsOfJoin; same tier-(c) preference
  * rationale, SURVEY.md §5).
  *
  * Emits (l, r) for rows with equal keys whose half-open intervals
  * [lStart, lEnd) and [rStart, rEnd) overlap: rStart < lEnd AND
  * rEnd > lStart. Spark's native plan for this shape is a SortMergeJoin
  * on the key with the range conditions as a post-join filter — which
  * evaluates EVERY same-key pair (O(Σ n_k·m_k); a skewed key makes it
  * quadratic). This exec instead runs an interval sweep per partition:
  * both sides arrive clustered by key and sorted by (key, start); right
  * rows join a per-key ACTIVE SET from which a row is evicted permanently
  * once its end ≤ the current left start (left starts are nondecreasing
  * within a key, so an evicted row can never match again). Cost is
  * O(n + m + output), memory is the maximum number of concurrently open
  * right intervals of one key — the classic sweep bound that survives
  * skew at 100 TB.
  *
  * Key/start/end expressions must evaluate to LongType (epoch ms etc.).
  */
case class IntervalJoinPlan(
    left: LogicalPlan, right: LogicalPlan,
    leftKey: Expression, rightKey: Expression,
    leftStart: Expression, leftEnd: Expression,
    rightStart: Expression, rightEnd: Expression) extends BinaryNode {
  override def output: Seq[Attribute] = left.output ++ right.output
  override protected def withNewChildrenInternal(
      newLeft: LogicalPlan, newRight: LogicalPlan): IntervalJoinPlan =
    copy(left = newLeft, right = newRight)
}

case class IntervalJoinExec(
    left: SparkPlan, right: SparkPlan,
    leftKey: Expression, rightKey: Expression,
    leftStart: Expression, leftEnd: Expression,
    rightStart: Expression, rightEnd: Expression) extends BinaryExecNode {

  override def output: Seq[Attribute] = left.output ++ right.output

  override def requiredChildDistribution: Seq[Distribution] =
    Seq(ClusteredDistribution(Seq(leftKey)), ClusteredDistribution(Seq(rightKey)))

  override def requiredChildOrdering: Seq[Seq[SortOrder]] = Seq(
    Seq(SortOrder(leftKey, Ascending), SortOrder(leftStart, Ascending)),
    Seq(SortOrder(rightKey, Ascending), SortOrder(rightStart, Ascending)))

  override def outputPartitioning: Partitioning =
    UnknownPartitioning(left.outputPartitioning.numPartitions)

  override protected def withNewChildrenInternal(
      newLeft: SparkPlan, newRight: SparkPlan): IntervalJoinExec =
    copy(left = newLeft, right = newRight)

  protected override def doExecute(): RDD[InternalRow] = {
    val lOut = left.output; val rOut = right.output
    val outAttrs = output
    val (lk, ls, le) = (leftKey, leftStart, leftEnd)
    val (rk, rs, re) = (rightKey, rightStart, rightEnd)
    left.execute().zipPartitions(right.execute()) { (lIt, rIt) =>
      val lProj = UnsafeProjection.create(Seq(lk, ls, le), lOut)
      val rProj = UnsafeProjection.create(Seq(rk, rs, re), rOut)
      val outProj = UnsafeProjection.create(outAttrs, outAttrs)
      val joined = new JoinedRow
      val rBuf = rIt.buffered
      // active right intervals of the CURRENT key: (row, rs, re)
      var activeKey = Long.MinValue
      val active = scala.collection.mutable.ArrayBuffer.empty[(InternalRow, Long, Long)]
      lIt.flatMap { lRow =>
        val kp = lProj(lRow)
        val lKeyV = kp.getLong(0); val lStartV = kp.getLong(1); val lEndV = kp.getLong(2)
        if (lKeyV != activeKey) { active.clear(); activeKey = lKeyV }
        // consume right rows: discard earlier keys, admit this key's rows
        // whose start is before this left's end (starts are sorted, so
        // nothing admissible is left behind)
        var advancing = true
        while (advancing && rBuf.hasNext) {
          val rp = rProj(rBuf.head)
          val rKeyV = rp.getLong(0); val rStartV = rp.getLong(1); val rEndV = rp.getLong(2)
          if (rKeyV < lKeyV) { rBuf.next() }
          else if (rKeyV == lKeyV && rStartV < lEndV) {
            val row = rBuf.next().copy()
            active += ((row, rStartV, rEndV))
          } else advancing = false
        }
        // evict permanently: end ≤ this left's start can never match a
        // later left of this key either (left starts nondecreasing)
        active.filterInPlace(_._3 > lStartV)
        // emit survivors that genuinely overlap THIS left (a row may have
        // been admitted under an earlier, longer left interval). Lazy
        // emission — outProj's buffer is reused per row, the standard
        // operator contract (downstream copies if it buffers); the inner
        // iterator is exhausted before flatMap advances, so the
        // mutation-at-next-left is safe.
        active.iterator
          .filter { case (_, s, e) => s < lEndV && e > lStartV }
          .map { case (row, _, _) => outProj(joined(lRow, row)) }
      }
    }
  }
}

/** Column pruning through the custom node (same rationale as
  * PruneAsOfJoin — Catalyst's ColumnPruning doesn't know this operator). */
object PruneIntervalJoin extends org.apache.spark.sql.catalyst.rules.Rule[LogicalPlan] {
  override def apply(plan: LogicalPlan): LogicalPlan = plan.transform {
    case p @ Project(projList, j: IntervalJoinPlan) =>
      val needed = AttributeSet(projList.flatMap(_.references)) ++
        AttributeSet(Seq(j.leftKey, j.rightKey, j.leftStart, j.leftEnd,
          j.rightStart, j.rightEnd).flatMap(_.references))
      def prune(child: LogicalPlan): LogicalPlan = {
        val keep = child.output.filter(needed.contains)
        if (keep.length == child.output.length) child else Project(keep, child)
      }
      val (nl, nr) = (prune(j.left), prune(j.right))
      if ((nl eq j.left) && (nr eq j.right)) p
      else p.copy(child = j.copy(left = nl, right = nr))
  }
}

object IntervalJoinStrategy extends SparkStrategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case IntervalJoinPlan(l, r, lk, rk, ls, le, rs, re) =>
      IntervalJoinExec(planLater(l), planLater(r), lk, rk, ls, le, rs, re) :: Nil
    case _ => Nil
  }
}

object IntervalJoin {
  /** DataFrame entry point; key/start/end columns must be LongType. */
  def join(left: DataFrame, right: DataFrame,
      leftKey: String, rightKey: String,
      leftStart: String, leftEnd: String,
      rightStart: String, rightEnd: String): DataFrame = {
    val spark = left.sparkSession
    if (!spark.experimental.extraStrategies.contains(IntervalJoinStrategy))
      spark.experimental.extraStrategies =
        spark.experimental.extraStrategies :+ IntervalJoinStrategy
    if (!spark.experimental.extraOptimizations.contains(PruneIntervalJoin))
      spark.experimental.extraOptimizations =
        spark.experimental.extraOptimizations :+ PruneIntervalJoin
    val lPlan = left.queryExecution.analyzed
    val rPlan = right.queryExecution.analyzed
    def attr(p: LogicalPlan, n: String): Attribute =
      p.output.find(_.name == n).getOrElse(
        throw new IllegalArgumentException(s"no column $n in ${p.output.map(_.name)}"))
    val plan = IntervalJoinPlan(lPlan, rPlan,
      attr(lPlan, leftKey), attr(rPlan, rightKey),
      attr(lPlan, leftStart), attr(lPlan, leftEnd),
      attr(rPlan, rightStart), attr(rPlan, rightEnd))
    org.apache.spark.sql.GraftSqlBridge.ofRows(spark, plan)
  }
}
