package graft.expressions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.types._

/** `TD_SESSIONIZE_WINDOW(time, timeout[, salt...]) OVER (PARTITION BY k
  * ORDER BY time, ...)` — TD's windowed sessionizer (SURVEY.md §3.H; the
  * reference splices the UDF into Presto query text verbatim —
  * `pandas_td/td.py :: read_td_query` [verify], public TD UDF docs for the
  * signature) as a native Catalyst `AggregateWindowFunction`.
  *
  * Spark has no built-in that assigns session IDENTITY over an ordered
  * window (`session_window` buckets rows into time ranges for aggregation;
  * it cannot tag each original row with its session id in a projection).
  * The composed lag+sum idiom (h10, `Td.tdSessionize`) needs TWO window
  * passes; this node does it in ONE: a `DeclarativeAggregate` evaluated
  * over the running frame (UNBOUNDED PRECEDING..CURRENT ROW), so the
  * whole thing stays a single Window exec over one sort — at 100 TB one
  * shuffle on the partition key and one in-partition sort, identical cost
  * to `row_number()`.
  *
  * Buffer: `(sessionStart: LONG, prevTime: LONG)`. Per row (in window
  * order): a new session starts when there is no previous row or
  * `time - prevTime > timeout`; `sessionStart` then becomes the current
  * `time`. Session ids are `md5(sessionStart ':' salt...)` — session
  * starts strictly increase within a partition (consecutive sessions are
  * separated by > timeout), so the id is unique per (partition, session);
  * callers pass the partition key(s) as `salt` to make ids globally
  * unique, standing in for the UUIDs TD mints (which would be
  * nondeterministic and unverifiable). All state transitions and the
  * final hash are Catalyst expressions — codegen'd by the Window exec's
  * declarative-aggregate path, no UDF.
  *
  * `time` and `timeout` share a unit (TD convention: epoch seconds; any
  * epoch numeric works). `time` must be non-null (TD's `time` always is);
  * a null `time` neither extends nor starts a session and yields a null
  * id for that row.
  */
case class TdSessionizeWindow(
    time: Expression,
    timeout: Expression,
    salt: Seq[Expression])
  extends AggregateWindowFunction {

  override def children: Seq[Expression] = time +: timeout +: salt
  override def dataType: DataType = StringType
  override def nullable: Boolean = true
  override def prettyName: String = "td_sessionize_window"

  override def checkInputDataTypes(): TypeCheckResult = {
    def integral(e: Expression) = e.dataType match {
      case ByteType | ShortType | IntegerType | LongType => true
      case _ => false
    }
    if (!integral(time)) {
      TypeCheckResult.TypeCheckFailure(
        s"td_sessionize_window: time must be an integral epoch " +
          s"(TD's time column), got ${time.dataType.catalogString}")
    } else if (!integral(timeout) || !timeout.foldable) {
      TypeCheckResult.TypeCheckFailure(
        "td_sessionize_window: timeout must be an integral literal in " +
          "the same unit as time")
    } else if (timeout.eval(null) == null ||
        timeout.eval(null).asInstanceOf[Number].longValue() <= 0) {
      // a non-positive timeout would silently open a session per row —
      // a typo'd argument changes semantics with no signal (the
      // TdTimeRange tz-arg lesson); TD's contract is a positive gap
      TypeCheckResult.TypeCheckFailure(
        "td_sessionize_window: timeout must be > 0")
    } else TypeCheckResult.TypeCheckSuccess
  }

  private lazy val sessionStart =
    AttributeReference("sessionStart", LongType)()
  private lazy val prevTime = AttributeReference("prevTime", LongType)()
  // The window AggregateProcessor binds `evaluateExpression` to the
  // BUFFER attributes only (update sees buffer ++ input), so the salt —
  // an input expression, constant per partition in intended use — rides
  // the buffer to reach the final hash.
  private lazy val saltStr = AttributeReference("saltStr", StringType)()
  override def aggBufferAttributes: Seq[AttributeReference] =
    Seq(sessionStart, prevTime, saltStr)

  override lazy val initialValues: Seq[Expression] =
    Seq(Literal(null, LongType), Literal(null, LongType),
      Literal(null, StringType))

  private def timeL: Expression = Cast(time, LongType)

  override lazy val updateExpressions: Seq[Expression] = {
    val t = timeL
    val newSession = Or(IsNull(prevTime),
      GreaterThan(Subtract(t, prevTime), Cast(timeout, LongType)))
    Seq(
      // coalesce keeps an existing session alive across a null-time row
      // instead of nulling the whole buffer
      If(Coalesce(Seq(newSession, Literal(false))), t, sessionStart),
      Coalesce(Seq(t, prevTime)),
      if (salt.isEmpty) Literal.create("", StringType)
      else ConcatWs(Literal(":") +: salt.map(Cast(_, StringType))))
  }

  // evaluate may reference ONLY the buffer: rows before any session
  // opened (leading null times) read a null sessionStart → null id
  override lazy val evaluateExpression: Expression = {
    val parts =
      if (salt.isEmpty) Seq(Cast(sessionStart, StringType))
      else Seq(Cast(sessionStart, StringType), saltStr)
    If(IsNull(sessionStart), Literal(null, StringType),
      Md5(Cast(ConcatWs(Literal(":") +: parts), BinaryType)))
  }

  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): TdSessionizeWindow =
    copy(time = newChildren.head, timeout = newChildren(1),
      salt = newChildren.drop(2))
}
