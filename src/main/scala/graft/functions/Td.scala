package graft.functions

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.catalyst.expressions.Expression

/** TD-flavored time/session function layer — the ENGINE-side UDF surface the
  * reference's generated SQL leans on (SURVEY.md §3.H; reference
  * `pandas_td/td.py :: read_td_table` emits `td_time_range(time, start,
  * end)` predicates verbatim into query text).
  *
  * Everything here is *construction-time expansion* into native Catalyst
  * expressions (plain comparisons / built-in datetime functions), never an
  * opaque UDF: Catalyst then sees `ts >= X AND ts < Y` and pushes it into
  * the parquet scan (row-group min/max skipping, partition pruning) — the
  * Spark-native analog of TD's 1-hour time-bucket pruning (SURVEY.md §5.3.1).
  * At 100 TB, this predicate reaching the scan is the difference between
  * reading one day and reading three years.
  */
object Td {

  /** TD_TIME_RANGE(t, from, to): half-open `[from, to)`, TD semantics.
    * `from`/`to` are ISO dates or `yyyy-MM-dd HH:mm:ss`; None = unbounded. */
  def tdTimeRange(ts: Column, from: Option[String], to: Option[String]): Column = {
    val lo = from.map(f => ts >= to_timestamp(lit(f)))
    val hi = to.map(u => ts < to_timestamp(lit(u)))
    (lo, hi) match {
      case (Some(a), Some(b)) => a && b
      case (Some(a), None)    => a
      case (None, Some(b))    => b
      case (None, None)       => lit(true)
    }
  }

  def tdTimeRange(ts: Column, from: String, to: String): Column =
    tdTimeRange(ts, Some(from), Some(to))

  /** td_time_range over a raw epoch-nanos LongType column (how `events.ts`
    * arrives under `nanosAsLong`, FIXTURES.md). Long comparisons push down
    * to parquet statistics directly. */
  def tdTimeRangeNanos(tsNanos: Column, fromIso: String, toIso: String): Column = {
    def ns(d: String): Long =
      java.time.LocalDate.parse(d).atStartOfDay(java.time.ZoneOffset.UTC)
        .toInstant.toEpochMilli * 1000000L
    tsNanos >= lit(ns(fromIso)) && tsNanos < lit(ns(toIso))
  }

  /** Instant-bounded variant, for composition with `tdScheduledTime` /
    * `tdIntervalSeconds` (h17's TD_TIME_RANGE(time, TD_TIME_ADD(
    * TD_SCHEDULED_TIME(), '-7d'), TD_SCHEDULED_TIME()) idiom). */
  def tdTimeRangeNanos(tsNanos: Column, from: java.time.Instant,
      to: java.time.Instant): Column =
    tsNanos >= lit(from.toEpochMilli * 1000000L) &&
      tsNanos < lit(to.toEpochMilli * 1000000L)

  /** Half-open `[from, to)` over `df`'s `ts`, dispatching on its physical
    * type (the events fixture has shipped as epoch-nanos LONG and as
    * timestamp[us] → TIMESTAMP_NTZ across generations). Each branch
    * compares the RAW column against a literal of the column's own type —
    * no cast wraps `ts`, so the predicate reaches the parquet scan
    * (row-group min/max skip) in every case. At 100 TB this is the
    * difference between reading one day and reading three years. */
  def tdTimeRangeEvents(df: DataFrame, tsName: String,
      from: java.time.Instant, to: java.time.Instant): Column = {
    val c = col(tsName)
    df.schema(tsName).dataType match {
      case org.apache.spark.sql.types.LongType =>
        tdTimeRangeNanos(c, from, to)
      case _: org.apache.spark.sql.types.TimestampNTZType =>
        // NTZ literal (LocalDateTime): same-type comparison, pushable
        def ntz(i: java.time.Instant) =
          lit(java.time.LocalDateTime.ofInstant(i, java.time.ZoneOffset.UTC))
        c >= ntz(from) && c < ntz(to)
      case _ =>
        c >= lit(java.sql.Timestamp.from(from)) &&
          c < lit(java.sql.Timestamp.from(to))
    }
  }

  def tdTimeRangeEvents(df: DataFrame, tsName: String,
      fromIso: String, toIso: String): Column = {
    def inst(d: String) = java.time.LocalDate.parse(d)
      .atStartOfDay(java.time.ZoneOffset.UTC).toInstant
    tdTimeRangeEvents(df, tsName, inst(fromIso), inst(toIso))
  }

  /** TD_TIME_STRING(time, 'fmt'[, tz]) — TD's truncating epoch formatter
    * (public TD UDF docs): `fmt` is a unit letter y/q/M/w/d/h/m/s with an
    * optional `!`. The bare form renders the FULL `yyyy-MM-dd HH:mm:ss`
    * truncated to the unit plus the zone offset (`+0900`); the `!` form
    * renders only the leading fields (`'d!'` → `2024-01-07`). Pure
    * construction-time expansion into convert_timezone/date_trunc/
    * date_format — all codegen'd, no UDF; the zone offset is derived
    * arithmetically (shifted minus original epoch), so DST zones render
    * their per-row offset correctly.
    *
    * Session-zone independent by construction: the local wall clock is
    * built as TIMESTAMP_NTZ through zone-EXPLICIT ops only (epoch +
    * interval arithmetic, then convert_timezone('UTC', tz, _)), and
    * date_format over NTZ renders wall-clock fields with no zone
    * conversion — so the output is the same whatever
    * spark.sql.session.timeZone is. (The earlier from_utc_timestamp +
    * date_format shape formatted in the SESSION zone and was only
    * correct under the harness's pinned UTC.) */
  def tdTimeString(timeSec: Column, fmt: String, tz: String = "UTC"): Column = {
    val Fmt = "([yqMwdhms])(!?)".r
    val (unit, bang) = fmt match {
      case Fmt(u, b) => (u, b == "!")
      case _ => throw new IllegalArgumentException(
        s"td_time_string format must be one of y q M w d h m s (optionally with !), got: $fmt")
    }
    val truncUnit = Map("y" -> "year", "q" -> "quarter", "M" -> "month",
      "w" -> "week", "d" -> "day", "h" -> "hour", "m" -> "minute",
      "s" -> "second")(unit)
    // UTC wall clock as NTZ: epoch origin + timeSec seconds, pure interval
    // arithmetic (a timestamp_seconds→NTZ cast would read the session zone)
    val utcWall = to_timestamp_ntz(lit("1970-01-01 00:00:00")) +
      make_dt_interval(lit(0), lit(0), lit(0), timeSec.cast("decimal(18,6)"))
    val local = convert_timezone(lit("UTC"), lit(tz), utcWall)
    val truncated = date_trunc(truncUnit, local)
    if (bang) {
      val pat = Map("y" -> "yyyy", "q" -> "yyyy-MM", "M" -> "yyyy-MM",
        "w" -> "yyyy-MM-dd", "d" -> "yyyy-MM-dd", "h" -> "yyyy-MM-dd HH",
        "m" -> "yyyy-MM-dd HH:mm", "s" -> "yyyy-MM-dd HH:mm:ss")(unit)
      date_format(truncated, pat)
    } else {
      // zone offset at THIS instant: wall-clock epoch minus true epoch.
      // from_utc_timestamp shifts the INSTANT and LTZ→long reads epoch
      // seconds — both zone-explicit/zone-free, so this too is
      // session-independent.
      val offSec =
        from_utc_timestamp(timestamp_seconds(timeSec), tz).cast("long") - timeSec
      val offStr = concat(
        when(offSec < 0, lit("-")).otherwise(lit("+")),
        lpad((abs(offSec) / 3600).cast("long").cast("string"), 2, "0"),
        lpad(((abs(offSec) % 3600) / 60).cast("long").cast("string"), 2, "0"))
      concat(date_format(truncated, "yyyy-MM-dd HH:mm:ss"), offStr)
    }
  }

  /** TD_DATE_TRUNC('unit', t) — unit ∈ second/minute/hour/day/week/month/quarter/year. */
  def tdDateTrunc(unit: String, ts: Column): Column = date_trunc(unit, ts)

  /** TD_TIME_FORMAT(t, 'fmt') — Java datetime pattern. */
  def tdTimeFormat(ts: Column, fmt: String): Column = date_format(ts, fmt)

  /** TD_TIME_PARSE(s) — string → timestamp (session timezone = UTC). */
  def tdTimeParse(s: Column): Column = to_timestamp(s)

  /** TD_TIME_ADD(t, n, 'unit') — timestamp arithmetic via native intervals. */
  def tdTimeAdd(ts: Column, n: Int, unit: String): Column =
    ts + expr(s"INTERVAL $n $unit")

  /** TD_INTERVAL relative-duration spec → signed seconds. Grammar:
    * optional sign, then one or more <int><unit> terms, unit ∈
    * s/m/h/d/w ("-7d", "12h", "1d12h", "-30s", "2w"). The reference uses
    * these specs in scheduled queries ("the last -7d of data"); parsing
    * happens client-side at query-build time, exactly like this. */
  def tdIntervalSeconds(spec: String): Long = {
    val trimmed = spec.trim
    require(trimmed.nonEmpty, "empty interval spec")
    val (sign, body) =
      if (trimmed.startsWith("-")) (-1L, trimmed.tail)
      else if (trimmed.startsWith("+")) (1L, trimmed.tail) else (1L, trimmed)
    val term = "(\\d+)([smhdw])".r
    val terms = term.findAllMatchIn(body).toSeq
    require(terms.nonEmpty && terms.map(_.matched).mkString == body,
      s"malformed interval spec: $spec")
    val unitSecs = Map("s" -> 1L, "m" -> 60L, "h" -> 3600L,
      "d" -> 86400L, "w" -> 604800L)
    sign * terms.map(m => m.group(1).toLong * unitSecs(m.group(2))).sum
  }

  /** TD_SCHEDULED_TIME analog: the schedule anchor of the current query,
    * read from session conf `spark.graft.scheduled_time` (ISO local
    * datetime, UTC session) — the submitting scheduler sets it, exactly as
    * TD injects the scheduled time into a scheduled query's session. */
  def tdScheduledTime(s: SparkSession): java.time.Instant = {
    val iso = s.conf.getOption("spark.graft.scheduled_time")
      .getOrElse(throw new IllegalStateException(
        "spark.graft.scheduled_time is not set (the scheduler sets it; " +
          "set it explicitly for ad-hoc runs)"))
    java.time.LocalDateTime.parse(iso.replace(' ', 'T'))
      .toInstant(java.time.ZoneOffset.UTC)
  }

  /** TD_SESSIONIZE(ts, gap, key) — batch form (SURVEY.md §3.H h10): a new
    * session starts when the gap to the previous event of the same key
    * exceeds `gapMs`. Pure window-function composition — two windows over
    * the SAME (key, time) partitioning, so Spark plans ONE shuffle + one
    * sort for both (scale-critical: no second exchange at 100 TB).
    * `tieBreak` must make the ordering total (equal timestamps). */
  def tdSessionize(df: DataFrame, keyCol: String, tsMsCol: String,
                   gapMs: Long, tieBreak: String): DataFrame = {
    val w = Window.partitionBy(col(keyCol)).orderBy(col(tsMsCol), col(tieBreak))
    df.withColumn("__prev", lag(col(tsMsCol), 1).over(w))
      .withColumn("__new",
        when(col("__prev").isNull || col(tsMsCol) - col("__prev") > gapMs, 1L)
          .otherwise(0L))
      .withColumn("session_id",
        sum(col("__new")).over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .drop("__prev", "__new")
  }

  /** SQL registration: `td_time_range(ts, 'from', 'to'[, tz])` usable from
    * `spark.sql`. Expands via [[graft.expressions.TdTimeRange]] — a
    * RuntimeReplaceable that dispatches on the resolved column type AFTER
    * analysis, so the comparison's left side stays the bare column
    * (epoch-long, TIMESTAMP or TIMESTAMP_NTZ alike) and pushes down to the
    * parquet scan; never a black-box UDF. */
  def register(spark: SparkSession): Unit = {
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "td_time_range",
      (exprs: Seq[Expression]) => graft.expressions.TdTimeRange(exprs),
      "scala_udf")
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "td_time_string",
      (exprs: Seq[Expression]) => tdTimeStringBuilder(exprs),
      "scala_udf")
  }

  /** SQL builder for `td_time_string(time, 'fmt'[, 'tz'])`. The format
    * (and zone) select which expression tree to BUILD, so they must be
    * literals — exactly TD's contract, where both are part of the query
    * text. Built from concrete catalyst nodes (the Column DSL's
    * ColumnNode tree does not resolve through a parse-time function
    * builder); the expansion is spliced BEFORE analysis, so type coercion
    * and ResolveTimeZone apply normally and everything stays codegen'd. */
  private def tdTimeStringBuilder(exprs: Seq[Expression]): Expression = {
    import org.apache.spark.sql.catalyst.expressions._
    import org.apache.spark.sql.types.{LongType, StringType}
    require(exprs.length == 2 || exprs.length == 3,
      "td_time_string(time, 'fmt'[, 'tz'])")
    def litStr(e: Expression, what: String): String = e match {
      case Literal(s: org.apache.spark.unsafe.types.UTF8String, _) => s.toString
      case _ => throw new IllegalArgumentException(
        s"td_time_string $what must be a string literal")
    }
    val fmt = litStr(exprs(1), "format")
    val tz = exprs.drop(2).headOption.map(litStr(_, "timezone")).getOrElse("UTC")
    val Fmt = "([yqMwdhms])(!?)".r
    val (unit, bang) = fmt match {
      case Fmt(u, b) => (u, b == "!")
      case _ => throw new IllegalArgumentException(
        s"td_time_string format must be one of y q M w d h m s (optionally with !), got: $fmt")
    }
    val truncUnit = Map("y" -> "year", "q" -> "quarter", "M" -> "month",
      "w" -> "week", "d" -> "day", "h" -> "hour", "m" -> "minute",
      "s" -> "second")(unit)
    val timeSec = Cast(exprs.head, LongType)
    val local = FromUTCTimestamp(SecondsToTimestamp(timeSec), Literal(tz))
    val truncated = TruncTimestamp(Literal(truncUnit), local)
    if (bang) {
      val pat = Map("y" -> "yyyy", "q" -> "yyyy-MM", "M" -> "yyyy-MM",
        "w" -> "yyyy-MM-dd", "d" -> "yyyy-MM-dd", "h" -> "yyyy-MM-dd HH",
        "m" -> "yyyy-MM-dd HH:mm", "s" -> "yyyy-MM-dd HH:mm:ss")(unit)
      DateFormatClass(truncated, Literal(pat))
    } else {
      val off = Subtract(Cast(local, LongType), timeSec)
      val absOff = If(LessThan(off, Literal(0L)), UnaryMinus(off), off)
      def pad2(e: Expression) =
        StringLPad(Cast(e, StringType), Literal(2), Literal("0"))
      Concat(Seq(
        DateFormatClass(truncated, Literal("yyyy-MM-dd HH:mm:ss")),
        If(LessThan(off, Literal(0L)), Literal("-"), Literal("+")),
        pad2(IntegralDivide(absOff, Literal(3600L))),
        pad2(IntegralDivide(Remainder(absOff, Literal(3600L)), Literal(60L)))))
    }
  }
}
