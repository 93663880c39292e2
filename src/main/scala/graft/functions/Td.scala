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

  /** The SQL-callable TD UDF tier as session-free (name → parse-time
    * builder) pairs — ONE definition serves both registration routes, the
    * same device as [[Presto.builders]]: runtime
    * `createOrReplaceTempFunction` (`register` below, what readTdQuery
    * uses) and build-time `SparkSessionExtensions.injectFunction`
    * (GraftExtensions), so a cluster that sets `spark.sql.extensions`
    * resolves TD's query text verbatim in every session.
    *
    * Coverage is the TD UDF set a migrating user's query TEXT actually
    * contains (public TD UDF docs; the reference submits that text
    * untouched — `pandas_td/td.py :: read_td_query`): the time family
    * over TD's native epoch-seconds `time` column (td_time_range,
    * td_time_string, td_time_format, td_time_parse, td_time_add,
    * td_date_trunc, td_scheduled_time, td_interval), the argmin/argmax
    * aggregates (td_first, td_last), the scalar utilities (td_md5,
    * td_url_decode), the windowed sessionizer (td_sessionize_window), and
    * the frequency-sketch aggregate (td_approx_most_frequent), and the
    * user-agent parser (td_parse_agent). Every builder expands into native
    * Catalyst nodes — codegen'd, pushdown-transparent, no opaque UDF
    * anywhere (the sketch aggregate is a TypedImperativeAggregate, the
    * same tier as Spark's own HLL).
    *
    * Session-zone independence: every zone-sensitive expansion carries its
    * target zone EXPLICITLY on the TimeZoneAwareExpression (the pre-set
    * `timeZoneId` survives ResolveTimeZone, which only fills empty ones),
    * so results do not change under a non-UTC `spark.sql.session.timeZone`.
    *
    * `td_x_rank` is deliberately absent: its Hive semantics (stateful rank
    * over CLUSTER BY order) have no sound parse-time expansion — the e7
    * row_number-per-group idiom is the engine-native replacement
    * (documented in README). */
  lazy val builders: Seq[(String, Seq[Expression] => Expression)] = Seq(
    "td_time_range" ->
      ((exprs: Seq[Expression]) => graft.expressions.TdTimeRange(exprs)),
    "td_time_string" -> ((exprs: Seq[Expression]) => tdTimeStringBuilder(exprs)),
    "td_time_format" -> ((exprs: Seq[Expression]) => tdTimeFormatBuilder(exprs)),
    "td_time_parse" -> ((exprs: Seq[Expression]) => tdTimeParseBuilder(exprs)),
    "td_time_add" -> ((exprs: Seq[Expression]) => tdTimeAddBuilder(exprs)),
    "td_date_trunc" -> ((exprs: Seq[Expression]) => tdDateTruncBuilder(exprs)),
    "td_scheduled_time" ->
      ((exprs: Seq[Expression]) => tdScheduledTimeBuilder(exprs)),
    "td_interval" -> ((exprs: Seq[Expression]) => tdIntervalBuilder(exprs)),
    "td_first" -> ((exprs: Seq[Expression]) => tdFirstLastBuilder(exprs, last = false)),
    "td_last" -> ((exprs: Seq[Expression]) => tdFirstLastBuilder(exprs, last = true)),
    "td_md5" -> ((exprs: Seq[Expression]) => tdMd5Builder(exprs)),
    "td_sha1" -> ((exprs: Seq[Expression]) => tdSha1Builder(exprs)),
    "td_url_decode" -> ((exprs: Seq[Expression]) => tdUrlDecodeBuilder(exprs)),
    "td_sessionize_window" ->
      ((exprs: Seq[Expression]) => tdSessionizeWindowBuilder(exprs)),
    "td_approx_most_frequent" ->
      ((exprs: Seq[Expression]) => tdApproxMostFrequentBuilder(exprs)),
    "td_parse_agent" ->
      ((exprs: Seq[Expression]) => tdParseAgentBuilder(exprs)))

  /** TD_SESSIONIZE_WINDOW(time, timeout[, salt...]) — must appear under an
    * OVER (PARTITION BY … ORDER BY time, …) clause; expands to the
    * [[graft.expressions.TdSessionizeWindow]] AggregateWindowFunction
    * (single-pass running-frame sessionizer; see its scaladoc for the
    * deterministic-id-vs-TD-UUID contract and the salt extension). */
  private def tdSessionizeWindowBuilder(exprs: Seq[Expression]): Expression = {
    require(exprs.length >= 2,
      "td_sessionize_window(time, timeout[, salt...]) OVER (...)")
    graft.expressions.TdSessionizeWindow(exprs.head, exprs(1), exprs.drop(2))
  }

  /** TD_APPROX_MOST_FREQUENT(num, col, capacity) → map<col, count> — TD's
    * Hive UDAF (signature per public TD UDF docs — SURVEY.md §0 [verify]),
    * expanded over the SpaceSaving `TypedImperativeAggregate`
    * ([[graft.functions.HeavyHitters]]) with TD's explicit sketch capacity:
    * mergeable map-side partials, memory bounded by `capacity` regardless
    * of cardinality — the whole point of the UDAF at 100 TB. Counts are
    * exact iff the column's distinct count stays ≤ capacity (SpaceSaving
    * never evicts); otherwise over-count-bounded by N/capacity. The
    * aggregate is wrapped here (`toAggregateExpression`) because the
    * analyzer only auto-wraps functions it resolves at TOP level, and this
    * expansion nests it under `map_from_entries`. */
  private def tdApproxMostFrequentBuilder(exprs: Seq[Expression]): Expression = {
    import org.apache.spark.sql.catalyst.expressions.{Cast, MapFromEntries}
    import org.apache.spark.sql.types.StringType
    require(exprs.length == 3,
      "td_approx_most_frequent(num, col, capacity)")
    def intLit(e: Expression, what: String): Int = {
      require(e.foldable, s"td_approx_most_frequent: $what must be a literal")
      e.eval(null) match {
        case n: Number => n.intValue()
        case other => throw new IllegalArgumentException(
          s"td_approx_most_frequent: $what must be integral, got $other")
      }
    }
    val k = intLit(exprs.head, "num")
    val cap = intLit(exprs(2), "capacity")
    require(k > 0 && cap >= k,
      s"td_approx_most_frequent: need num > 0 and capacity >= num, got num=$k capacity=$cap")
    MapFromEntries(graft.functions.HeavyHitters(
      Cast(exprs(1), StringType), k, Some(cap)).toAggregateExpression())
  }

  /** TD_PARSE_AGENT(ua) → map<string,string> of os / os_version / browser /
    * browser_version / category — TD's Presto UA parser (signature per
    * public TD docs — SURVEY.md §0 [verify]; its bundled device database is
    * proprietary, so a regexp ruleset for the mainstream engine families
    * stands in, the same stance as the h14 column-API analog). Expands to
    * `map(...)` over RegExpExtract/CaseWhen — all codegen'd builtins; a
    * missing field is the empty string, matching Presto's map behavior of
    * absent-vs-null being caller-handled. */
  private def tdParseAgentBuilder(exprs: Seq[Expression]): Expression = {
    import org.apache.spark.sql.catalyst.expressions._
    import org.apache.spark.sql.types.StringType
    require(exprs.length == 1, "td_parse_agent(user_agent)")
    val ua = Cast(exprs.head, StringType)
    def s(v: String) = Literal.create(v, StringType)
    def rex(pat: String, idx: Int) =
      RegExpExtract(ua, s(pat), Literal(idx))
    def has(pat: String) = GreaterThan(Length(rex(pat, 0)), Literal(0))
    val browser = CaseWhen(Seq(
      has("Edg[e/]") -> s("Edge"),
      has("OPR/|Opera") -> s("Opera"),
      has("Chrome/") -> s("Chrome"),
      has("Safari/") -> s("Safari"),
      has("Firefox/") -> s("Firefox"),
      has("MSIE |Trident/") -> s("IE")), Some(s("")))
    val browserVersion = CaseWhen(Seq(
      has("Edg[e/]") -> rex("Edge?/([0-9.]+)", 1),
      has("OPR/") -> rex("OPR/([0-9.]+)", 1),
      has("Chrome/") -> rex("Chrome/([0-9.]+)", 1),
      has("Version/[0-9.]+.*Safari") -> rex("Version/([0-9.]+)", 1),
      has("Firefox/") -> rex("Firefox/([0-9.]+)", 1),
      has("MSIE ") -> rex("MSIE ([0-9.]+)", 1)), Some(s("")))
    val os = CaseWhen(Seq(
      has("Windows NT") -> s("Windows"),
      has("Android") -> s("Android"),
      has("iPhone|iPad|iPod") -> s("iOS"),
      has("Mac OS X") -> s("Mac OSX"),
      has("Linux") -> s("Linux")), Some(s("")))
    val osVersion = CaseWhen(Seq(
      has("Windows NT") -> rex("Windows NT ([0-9.]+)", 1),
      has("Android") -> rex("Android ([0-9.]+)", 1),
      has("iPhone OS|CPU OS") -> rex("OS ([0-9_]+)", 1),
      has("Mac OS X") -> rex("Mac OS X ([0-9_.]+)", 1)), Some(s("")))
    val category = CaseWhen(Seq(
      has("iPad|Android(?!.*Mobile)") -> s("tablet"),
      has("Mobile|iPhone|iPod") -> s("smartphone"),
      has("bot|Bot|spider|crawl") -> s("crawler")), Some(s("pc")))
    val m = CreateMap(Seq(
      s("os"), os,
      s("os_version"), osVersion,
      s("browser"), browser,
      s("browser_version"), browserVersion,
      s("category"), category))
    // null in → null out (Presto UDF convention), not a map of empty
    // fields claiming the UA was parsed
    If(IsNull(ua), Literal.create(null, m.dataType), m)
  }

  /** SQL registration of the whole tier on an existing session.
    * `td_time_range` expands via [[graft.expressions.TdTimeRange]] — a
    * RuntimeReplaceable that dispatches on the resolved column type AFTER
    * analysis, so the comparison's left side stays the bare column
    * (epoch-long, TIMESTAMP or TIMESTAMP_NTZ alike) and pushes down to the
    * parquet scan; never a black-box UDF. */
  def register(spark: SparkSession): Unit =
    builders.foreach { case (name, builder) =>
      spark.sessionState.functionRegistry.createOrReplaceTempFunction(
        name, builder, "scala_udf")
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
    // zone handling is EXPLICIT on each TimeZoneAwareExpression (pre-set
    // timeZoneId survives ResolveTimeZone, which only fills empty ones):
    // truncation and rendering both happen in the TARGET zone whatever
    // spark.sql.session.timeZone says — same contract as the Column API's
    // convert_timezone/NTZ device, expressed instant-side.
    val truncated =
      TruncTimestamp(Literal(truncUnit), SecondsToTimestamp(timeSec), Some(tz))
    if (bang) {
      val pat = Map("y" -> "yyyy", "q" -> "yyyy-MM", "M" -> "yyyy-MM",
        "w" -> "yyyy-MM-dd", "d" -> "yyyy-MM-dd", "h" -> "yyyy-MM-dd HH",
        "m" -> "yyyy-MM-dd HH:mm", "s" -> "yyyy-MM-dd HH:mm:ss")(unit)
      DateFormatClass(truncated, Literal(pat), Some(tz))
    } else {
      // zone offset at THIS instant, derived arithmetically (shifted minus
      // true epoch) — FromUTCTimestamp and the LTZ→long cast are both
      // zone-free, so this term is session-independent as it stands
      val local = FromUTCTimestamp(SecondsToTimestamp(timeSec), Literal(tz))
      val off = Subtract(Cast(local, LongType), timeSec)
      val absOff = If(LessThan(off, Literal(0L)), UnaryMinus(off), off)
      def pad2(e: Expression) =
        StringLPad(Cast(e, StringType), Literal(2), Literal("0"))
      Concat(Seq(
        DateFormatClass(truncated, Literal("yyyy-MM-dd HH:mm:ss"), Some(tz)),
        If(LessThan(off, Literal(0L)), Literal("-"), Literal("+")),
        pad2(IntegralDivide(absOff, Literal(3600L))),
        pad2(IntegralDivide(Remainder(absOff, Literal(3600L)), Literal(60L)))))
    }
  }

  // ---- SQL builders for the wider TD UDF tier (round 13) ---------------
  // Shared contract: literal arguments (format / zone / duration specs) are
  // part of the query TEXT in TD — a non-literal is a coding error and
  // throws at parse time rather than silently changing semantics (the same
  // strictness TdTimeRange applies to its tz argument).

  private def litStrArg(name: String)(e: Expression, what: String): String =
    e match {
      case org.apache.spark.sql.catalyst.expressions.Literal(
          s: org.apache.spark.unsafe.types.UTF8String, _) => s.toString
      case _ => throw new IllegalArgumentException(
        s"$name $what must be a string literal, got: ${e.sql}")
    }

  /** TD_TIME_FORMAT(time, 'fmt'[, 'tz']) — epoch seconds rendered in the
    * given zone with a Java datetime pattern (TD's format dialect; public
    * TD UDF docs). The zone rides EXPLICITLY on DateFormatClass, so output
    * is independent of spark.sql.session.timeZone — and no instant
    * shifting is needed at all. */
  private def tdTimeFormatBuilder(exprs: Seq[Expression]): Expression = {
    import org.apache.spark.sql.catalyst.expressions._
    import org.apache.spark.sql.types.LongType
    require(exprs.length == 2 || exprs.length == 3,
      "td_time_format(time, 'fmt'[, 'tz'])")
    val lit = litStrArg("td_time_format") _
    val fmt = lit(exprs(1), "format")
    val tz = exprs.drop(2).headOption.map(lit(_, "timezone")).getOrElse("UTC")
    DateFormatClass(SecondsToTimestamp(Cast(exprs.head, LongType)),
      Literal(fmt), Some(tz))
  }

  /** TD_TIME_PARSE(s[, 'tz']) → epoch seconds LONG. The string parses as a
    * zone-less wall clock (ISO date / `yyyy-MM-dd HH:mm:ss`, Spark's
    * string→TIMESTAMP_NTZ cast), then the wall clock is interpreted in the
    * given zone via a zone-EXPLICIT NTZ→LTZ cast — session-independent by
    * construction. UnixSeconds reads the instant's epoch (zone-free). */
  private def tdTimeParseBuilder(exprs: Seq[Expression]): Expression = {
    import org.apache.spark.sql.catalyst.expressions._
    import org.apache.spark.sql.types.{TimestampNTZType, TimestampType}
    require(exprs.length == 1 || exprs.length == 2,
      "td_time_parse(string[, 'tz'])")
    val tz = exprs.drop(1).headOption
      .map(litStrArg("td_time_parse")(_, "timezone")).getOrElse("UTC")
    UnixSeconds(
      Cast(Cast(exprs.head, TimestampNTZType), TimestampType, Some(tz)))
  }

  /** TD_TIME_ADD(time, 'dur'[, 'tz']) — epoch seconds plus a signed
    * fixed-unit duration spec (`'1d'`, `'-2h30m'`, `'1w'`; units s/m/h/d/w,
    * the grammar of [[tdIntervalSeconds]]). Like TD, calendar units are NOT
    * supported here — month/quarter/year arithmetic goes through
    * TD_DATE_TRUNC. The optional zone argument is accepted for TD
    * signature-compat and validated, but fixed-second arithmetic is
    * zone-free, so it does not influence the result. Folds to
    * `time + <const>` — a bare-column comparison after the usual constant
    * folding when used inside a range predicate, so parquet row-group
    * pruning still applies. */
  private def tdTimeAddBuilder(exprs: Seq[Expression]): Expression = {
    import org.apache.spark.sql.catalyst.expressions._
    import org.apache.spark.sql.types.LongType
    require(exprs.length == 2 || exprs.length == 3,
      "td_time_add(time, 'dur'[, 'tz'])")
    val lit = litStrArg("td_time_add") _
    val dur = tdIntervalSeconds(lit(exprs(1), "duration"))
    exprs.drop(2).headOption.foreach { e =>
      java.time.ZoneId.of(lit(e, "timezone")) // validate, zone-free result
    }
    Add(Cast(exprs.head, LongType), Literal(dur))
  }

  /** TD_DATE_TRUNC('unit', time[, 'tz']) → epoch seconds of the truncation
    * boundary as seen in the given zone's wall clock (public TD UDF docs;
    * unit ∈ minute/hour/day/week/month/quarter/year). The zone rides
    * explicitly on TruncTimestamp (DST-correct: Spark truncates the LOCAL
    * clock and maps back through the zone rules), UnixSeconds reads the
    * resulting instant — both session-independent. */
  private def tdDateTruncBuilder(exprs: Seq[Expression]): Expression = {
    import org.apache.spark.sql.catalyst.expressions._
    import org.apache.spark.sql.types.LongType
    require(exprs.length == 2 || exprs.length == 3,
      "td_date_trunc('unit', time[, 'tz'])")
    val lit = litStrArg("td_date_trunc") _
    val unit = lit(exprs.head, "unit").toLowerCase(java.util.Locale.ROOT)
    require(Set("second", "minute", "hour", "day", "week", "month",
      "quarter", "year")(unit), s"td_date_trunc unit must be one of " +
      s"second/minute/hour/day/week/month/quarter/year, got: $unit")
    val tz = exprs.drop(2).headOption.map(lit(_, "timezone")).getOrElse("UTC")
    UnixSeconds(TruncTimestamp(Literal(unit),
      SecondsToTimestamp(Cast(exprs(1), LongType)), Some(tz)))
  }

  /** Scheduled-time epoch seconds from session conf
    * `spark.graft.scheduled_time` (ISO local datetime, UTC) — read at
    * RESOLUTION time through SQLConf.get (the active session's conf, no
    * captured session), same contract as [[tdScheduledTime]]. */
  private def scheduledEpochFromConf(): Long = {
    val iso = Option(org.apache.spark.sql.internal.SQLConf.get
      .getConfString("spark.graft.scheduled_time", null))
      .getOrElse(throw new IllegalStateException(
        "spark.graft.scheduled_time is not set (the scheduler sets it; " +
          "set it explicitly for ad-hoc runs)"))
    java.time.LocalDateTime.parse(iso.replace(' ', 'T'))
      .toInstant(java.time.ZoneOffset.UTC).getEpochSecond
  }

  /** TD_SCHEDULED_TIME() → epoch seconds LONG, folded to a literal when
    * the query is planned (TD injects the scheduled time into the query's
    * session the same way). */
  private def tdScheduledTimeBuilder(exprs: Seq[Expression]): Expression = {
    import org.apache.spark.sql.catalyst.expressions.Literal
    require(exprs.isEmpty, "td_scheduled_time()")
    Literal(scheduledEpochFromConf())
  }

  /** `[lo, hi)` epoch-second bounds for a TD_INTERVAL spec, computed
    * driver-side with java.time in the target zone (DST-correct calendar
    * arithmetic). Grammar (reconstructed from public TD UDF docs —
    * SURVEY.md §0 [verify] applies): `<sign?><n><unit>[/<offset>]`, unit ∈
    * s/m/h/d/w/M/q/y. The anchor is the scheduled time truncated to the
    * unit's granularity (weeks start Monday, ISO); a negative count selects
    * the n whole units BEFORE the anchor (`'-1d'` = yesterday), a positive
    * count the current unit onward (`'1d'` = today, `'1M'` = this month).
    * The optional `/<offset>` term shifts the anchor by a signed spec of
    * the same unit grammar before the window is applied
    * (`'-1d/-1d'` = the day before yesterday). */
  private[graft] def tdIntervalBounds(scheduledSec: Long, spec: String,
      tz: String): (Long, Long) = {
    import java.time._
    import java.time.temporal.ChronoUnit
    val zone = ZoneId.of(tz)
    val Re = "([+-]?)(\\d+)([smhdwMqy])(?:/(.+))?".r
    def shift(z: ZonedDateTime, unit: String, k: Long): ZonedDateTime =
      unit match {
        case "s" => z.plusSeconds(k)
        case "m" => z.plusMinutes(k)
        case "h" => z.plusHours(k)
        case "d" => z.plusDays(k)
        case "w" => z.plusWeeks(k)
        case "M" => z.plusMonths(k)
        case "q" => z.plusMonths(3 * k)
        case "y" => z.plusYears(k)
      }
    spec.trim match {
      case Re(signS, nS, unit, offset) =>
        val n = nS.toLong
        require(n > 0, s"td_interval count must be positive, got: $spec")
        val sched = Instant.ofEpochSecond(scheduledSec).atZone(zone)
        val day = sched.truncatedTo(ChronoUnit.DAYS)
        val anchor0 = unit match {
          case "s" => sched.truncatedTo(ChronoUnit.SECONDS)
          case "m" => sched.truncatedTo(ChronoUnit.MINUTES)
          case "h" => sched.truncatedTo(ChronoUnit.HOURS)
          case "d" => day
          case "w" => day.`with`(DayOfWeek.MONDAY)
          case "M" => day.withDayOfMonth(1)
          case "q" => day.withDayOfMonth(1)
            .withMonth(((sched.getMonthValue - 1) / 3) * 3 + 1)
          case "y" => day.withDayOfYear(1)
        }
        val anchor = Option(offset) match {
          case Some(off) => off.trim match {
            case Re(oSign, oN, oUnit, null) =>
              shift(anchor0, oUnit, (if (oSign == "-") -1 else 1) * oN.toLong)
            case _ => throw new IllegalArgumentException(
              s"malformed td_interval offset: $off")
          }
          case None => anchor0
        }
        val (lo, hi) =
          if (signS == "-") (shift(anchor, unit, -n), anchor)
          else (anchor, shift(anchor, unit, n))
        (lo.toInstant.getEpochSecond, hi.toInstant.getEpochSecond)
      case _ => throw new IllegalArgumentException(
        s"malformed td_interval spec: $spec")
    }
  }

  /** TD_INTERVAL(time, 'spec'[, 'tz']) — the scheduled-query period filter.
    * Bounds are computed at RESOLUTION time (scheduled time, spec and zone
    * are all literals) and emitted as bare epoch-second comparisons on the
    * time column — at 100 TB the predicate reaches the parquet scan as
    * row-group min/max pruning, exactly like td_time_range's LONG arm. */
  private def tdIntervalBuilder(exprs: Seq[Expression]): Expression = {
    import org.apache.spark.sql.catalyst.expressions._
    import org.apache.spark.sql.types.LongType
    require(exprs.length == 2 || exprs.length == 3,
      "td_interval(time, 'spec'[, 'tz'])")
    val lit = litStrArg("td_interval") _
    val spec = lit(exprs(1), "interval spec")
    val tz = exprs.drop(2).headOption.map(lit(_, "timezone")).getOrElse("UTC")
    val (lo, hi) = tdIntervalBounds(scheduledEpochFromConf(), spec, tz)
    val t = Cast(exprs.head, LongType)
    And(GreaterThanOrEqual(t, Literal(lo)), LessThan(t, Literal(hi)))
  }

  /** TD_FIRST(ret, key...) / TD_LAST(ret, key...) — the Hive argmin/argmax
    * UDAFs (public TD UDF docs) → native MinBy/MaxBy (partial+final hash
    * aggregate, mergeable at any scale). Multiple key columns order
    * lexicographically via a struct key, matching the Hive UDAF's
    * multi-column comparison. */
  private def tdFirstLastBuilder(exprs: Seq[Expression],
      last: Boolean): Expression = {
    import org.apache.spark.sql.catalyst.expressions.CreateStruct
    import org.apache.spark.sql.catalyst.expressions.aggregate.{MaxBy, MinBy}
    require(exprs.length >= 2,
      s"td_${if (last) "last" else "first"}(ret, key[, key2...])")
    val key =
      if (exprs.length == 2) exprs(1) else CreateStruct(exprs.tail)
    (if (last) MaxBy(exprs.head, key) else MinBy(exprs.head, key))
      .toAggregateExpression()
  }

  /** TD_MD5(s) → lowercase hex MD5 of the UTF-8 bytes (native Md5). */
  private def tdMd5Builder(exprs: Seq[Expression]): Expression = {
    import org.apache.spark.sql.catalyst.expressions.{Cast, Md5}
    import org.apache.spark.sql.types.BinaryType
    require(exprs.length == 1, "td_md5(string)")
    Md5(Cast(exprs.head, BinaryType))
  }

  /** TD_SHA1(s) → lowercase hex SHA-1 of the UTF-8 bytes (native Sha1) —
    * TD_MD5's sibling in TD's hash-function pair (public TD UDF docs). */
  private def tdSha1Builder(exprs: Seq[Expression]): Expression = {
    import org.apache.spark.sql.catalyst.expressions.{Cast, Sha1}
    import org.apache.spark.sql.types.BinaryType
    require(exprs.length == 1, "td_sha1(string)")
    Sha1(Cast(exprs.head, BinaryType))
  }

  /** TD_URL_DECODE(s) → percent-decoding (+ as space) via the native
    * UrlDecode expression. */
  private def tdUrlDecodeBuilder(exprs: Seq[Expression]): Expression = {
    import org.apache.spark.sql.catalyst.expressions.UrlDecode
    require(exprs.length == 1, "td_url_decode(string)")
    UrlDecode(exprs.head)
  }
}
