package graft.plans

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.SparkStrategy
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Ascending, Attribute, Expression, JoinedRow, SortOrder, UnsafeProjection}
import org.apache.spark.sql.catalyst.plans.logical.{BinaryNode, LogicalPlan}
import org.apache.spark.sql.catalyst.plans.physical.{ClusteredDistribution, Distribution, Partitioning, UnknownPartitioning}
import org.apache.spark.sql.execution.{BinaryExecNode, SparkPlan}

/** Whole-operator custom Catalyst machinery (preference tier (c), SURVEY.md
  * §5 / build brief): an AS-OF JOIN as a first-class physical operator.
  *
  * For each left row, emit the single right row with the same key and the
  * greatest time ≤ the left row's time (ties broken by the right tiebreak
  * column, ascending-sorted so the last consumed wins). The exec declares
  *   requiredChildDistribution = cluster both sides on the key
  *   requiredChildOrdering     = (key, time[, tie]) ascending
  * so EnsureRequirements inserts exactly one hash exchange + sort per
  * side, and the merge itself is a streaming two-pointer pass per
  * partition: O(|L| + |R|) with O(1) extra memory — no candidate-set
  * materialization (vs the join+window form) and no per-key buffering
  * (vs the cogroup form). This is the shape that survives 100 TB.
  *
  * Key and time expressions must evaluate to LongType (epoch millis etc.).
  */
case class AsOfJoinPlan(
    left: LogicalPlan, right: LogicalPlan,
    leftKey: Expression, rightKey: Expression,
    leftTime: Expression, rightTime: Expression,
    rightTie: Expression,
    direction: String = "backward",  // backward | forward | nearest
    tolerance: Long = -1L,           // max |Δt| in time units; -1 = none
    leftOuter: Boolean = false) extends BinaryNode {
  override def output: Seq[Attribute] =
    if (leftOuter) left.output ++ right.output.map(_.withNullability(true))
    else left.output ++ right.output
  override protected def withNewChildrenInternal(
      newLeft: LogicalPlan, newRight: LogicalPlan): AsOfJoinPlan =
    copy(left = newLeft, right = newRight)
}

case class AsOfJoinExec(
    left: SparkPlan, right: SparkPlan,
    leftKey: Expression, rightKey: Expression,
    leftTime: Expression, rightTime: Expression,
    rightTie: Expression,
    direction: String = "backward",
    tolerance: Long = -1L,
    leftOuter: Boolean = false) extends BinaryExecNode {

  override def output: Seq[Attribute] =
    if (leftOuter) left.output ++ right.output.map(_.withNullability(true))
    else left.output ++ right.output

  override def requiredChildDistribution: Seq[Distribution] =
    Seq(ClusteredDistribution(Seq(leftKey)), ClusteredDistribution(Seq(rightKey)))

  override def requiredChildOrdering: Seq[Seq[SortOrder]] = Seq(
    Seq(SortOrder(leftKey, Ascending), SortOrder(leftTime, Ascending)),
    Seq(SortOrder(rightKey, Ascending), SortOrder(rightTime, Ascending),
      SortOrder(rightTie, Ascending)))

  override def outputPartitioning: Partitioning =
    UnknownPartitioning(left.outputPartitioning.numPartitions)

  override protected def withNewChildrenInternal(
      newLeft: SparkPlan, newRight: SparkPlan): AsOfJoinExec =
    copy(left = newLeft, right = newRight)

  protected override def doExecute(): RDD[InternalRow] = {
    val lOut = left.output; val rOut = right.output
    val (lk, lt) = (leftKey, leftTime)
    val (rk, rt) = (rightKey, rightTime)
    val outAttrs = output
    val dir = direction; val tol = tolerance; val outer = leftOuter
    left.execute().zipPartitions(right.execute()) { (lIt, rIt) =>
      val lProj = UnsafeProjection.create(Seq(lk, lt), lOut)
      val rProj = UnsafeProjection.create(Seq(rk, rt), rOut)
      // identity projection → proper UnsafeRow output for downstream ops
      val outProj = UnsafeProjection.create(outAttrs, outAttrs)
      val joined = new JoinedRow
      val nullRight =
        new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(rOut.length)
      val rBuf = rIt.buffered
      // backward candidate: last consumed right row of the current key
      var cand: InternalRow = null
      var candKey = 0L; var candTime = 0L
      // forward consumes STRICTLY-before rows so equal-time rows stay at
      // the head (forward match is the first rTime ≥ lTime); backward and
      // nearest consume ≤ so equal-time rows land in the candidate (Δ=0)
      val strict = dir == "forward"
      lIt.flatMap { lRow =>
        val kp = lProj(lRow)
        val lKeyV = kp.getLong(0); val lTimeV = kp.getLong(1)
        var advancing = true
        while (advancing && rBuf.hasNext) {
          val rp = rProj(rBuf.head)
          val rKeyV = rp.getLong(0); val rTimeV = rp.getLong(1)
          val consume = rKeyV < lKeyV || (rKeyV == lKeyV &&
            (if (strict) rTimeV < lTimeV else rTimeV <= lTimeV))
          if (consume) {
            val consumed = rBuf.next()
            if (rKeyV == lKeyV) {
              cand = consumed.copy(); candKey = lKeyV; candTime = rTimeV
            }
          } else advancing = false
        }
        val backOk = cand != null && candKey == lKeyV &&
          (tol < 0 || lTimeV - candTime <= tol)
        // forward candidate: the (unconsumed) head, if it is this key —
        // the next left row of the same key may need the same head row
        var fwdRow: InternalRow = null; var fwdTime = 0L
        if (dir != "backward" && rBuf.hasNext) {
          val rp = rProj(rBuf.head)
          if (rp.getLong(0) == lKeyV) { fwdRow = rBuf.head; fwdTime = rp.getLong(1) }
        }
        val fwdOk = fwdRow != null && (tol < 0 || fwdTime - lTimeV <= tol)
        val m: InternalRow = dir match {
          case "backward" => if (backOk) cand else null
          case "forward"  => if (fwdOk) fwdRow else null
          case "nearest"  => // tie (Δ equal) prefers the earlier (backward) row
            if (backOk && fwdOk)
              if (lTimeV - candTime <= fwdTime - lTimeV) cand else fwdRow
            else if (backOk) cand else if (fwdOk) fwdRow else null
        }
        if (m != null) Iterator(outProj(joined(lRow, m)))
        else if (outer) Iterator(outProj(joined(lRow, nullRight)))
        else Iterator.empty
      }
    }
  }
}

/** Optimizer rule: column pruning through the custom node. Catalyst's
  * built-in ColumnPruning only understands known operators, so a custom
  * LogicalPlan would silently force full-width scans of both children —
  * at 100 TB that's the whole game. For `Project(_, AsOfJoinPlan)` this
  * pushes a Project onto each child keeping only the referenced
  * attributes plus the join's own key/time/tie columns. Runs to a fixed
  * point (no-op when children are already minimal). */
object PruneAsOfJoin extends org.apache.spark.sql.catalyst.rules.Rule[LogicalPlan] {
  import org.apache.spark.sql.catalyst.expressions.AttributeSet
  import org.apache.spark.sql.catalyst.plans.logical.Project

  override def apply(plan: LogicalPlan): LogicalPlan = plan.transform {
    case p @ Project(projList, j: AsOfJoinPlan) =>
      val needed = AttributeSet(projList.flatMap(_.references)) ++
        AttributeSet(Seq(j.leftKey, j.rightKey, j.leftTime, j.rightTime, j.rightTie)
          .flatMap(_.references))
      def prune(child: LogicalPlan): LogicalPlan = {
        val keep = child.output.filter(needed.contains)
        if (keep.length == child.output.length) child else Project(keep, child)
      }
      val (nl, nr) = (prune(j.left), prune(j.right))
      if ((nl eq j.left) && (nr eq j.right)) p
      else p.copy(child = j.copy(left = nl, right = nr))
  }
}

object AsOfJoinStrategy extends SparkStrategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case AsOfJoinPlan(l, r, lk, rk, lt, rt, tie, dir, tol, outer) =>
      AsOfJoinExec(planLater(l), planLater(r), lk, rk, lt, rt, tie,
        dir, tol, outer) :: Nil
    case _ => Nil
  }
}

object AsOf {
  /** DataFrame-level entry point — pandas `merge_asof` parity surface:
    * `direction` backward (default) / forward / nearest, `tolerance` in
    * the time column's units (-1 = unbounded), `leftOuter` emits
    * null-padded left rows with no match (pandas' default emission).
    * Column name args are resolved against each side; key/time columns
    * must be LongType. Registers the planner strategy on first use
    * (idempotent). */
  def join(left: DataFrame, right: DataFrame,
      leftKey: String, rightKey: String,
      leftTime: String, rightTime: String, rightTie: String,
      direction: String = "backward", tolerance: Long = -1L,
      leftOuter: Boolean = false): DataFrame = {
    val spark = left.sparkSession
    if (!spark.experimental.extraStrategies.contains(AsOfJoinStrategy))
      spark.experimental.extraStrategies =
        spark.experimental.extraStrategies :+ AsOfJoinStrategy
    if (!spark.experimental.extraOptimizations.contains(PruneAsOfJoin))
      spark.experimental.extraOptimizations =
        spark.experimental.extraOptimizations :+ PruneAsOfJoin
    val lPlan = left.queryExecution.analyzed
    val rPlan = right.queryExecution.analyzed
    def attr(p: LogicalPlan, n: String): Attribute =
      p.output.find(_.name == n).getOrElse(
        throw new IllegalArgumentException(s"no column $n in ${p.output.map(_.name)}"))
    require(Set("backward", "forward", "nearest")(direction),
      s"direction must be backward|forward|nearest, got $direction")
    val plan = AsOfJoinPlan(lPlan, rPlan,
      attr(lPlan, leftKey), attr(rPlan, rightKey),
      attr(lPlan, leftTime), attr(rPlan, rightTime), attr(rPlan, rightTie),
      direction, tolerance, leftOuter)
    org.apache.spark.sql.GraftSqlBridge.ofRows(spark, plan)
  }
}
