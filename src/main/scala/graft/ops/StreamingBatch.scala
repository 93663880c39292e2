package graft.ops

import org.apache.spark.sql.functions._
import graft.Tables._

/** §3.I (batch equivalents) — windowed stream arithmetic declared as batch
  * queries so DuckDB can oracle the window math; the same transforms run as
  * genuine Structured Streaming in graft.streaming (i4–i6 + scalatest).
  *
  * Windows are computed with the built-in `window()` / `session_window()`
  * operators over the µs-truncated event time; starts are emitted as epoch
  * millis (never raw ns timestamps — SURVEY.md §8.6.1).
  */
object StreamingBatch {

  /** Shared by i3 (session_window), i7 (flatMapGroupsWithState sessionize).
    * NOTE: declared before `all` — object vals initialize in order. */
  val i3Oracle: String =
    """WITH e AS (SELECT event_id, user_id, CAST(epoch_ms(ts) AS BIGINT) AS ts_ms
        FROM events),
      x AS (SELECT event_id, user_id, ts_ms,
        lag(ts_ms) OVER (PARTITION BY user_id ORDER BY ts_ms, event_id) AS prev FROM e),
      sess AS (SELECT user_id, ts_ms,
        CAST(SUM(CASE WHEN prev IS NULL OR ts_ms - prev > 1800000 THEN 1 ELSE 0 END)
          OVER (PARTITION BY user_id ORDER BY ts_ms, event_id
            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS sid
        FROM x)
      SELECT MIN(ts_ms) AS sess_start, user_id, COUNT(*) AS n_events
      FROM sess GROUP BY user_id, sid ORDER BY user_id, sess_start"""

  val all: Seq[Q] = Seq(

    // 1-hour tumbling windows per event type.
    Q("i1_win_tumbling",
      (s, d) => events(s, d)
        .groupBy(window(col("ts_t"), "1 hour"), col("event_type"))
        .agg(count(lit(1)).as("n"), mSum(col("value")).as("sum_v"))
        .select(expr("unix_millis(window.start)").as("w_start"),
          col("event_type"), col("n"), col("sum_v"))
        .orderBy("w_start", "event_type"),
      Some("""SELECT (CAST(epoch_ms(ts) AS BIGINT) // 3600000) * 3600000 AS w_start,
        event_type, COUNT(*) AS n,
        CAST(ROUND(SUM(CAST(value AS DECIMAL(18,4))),4) AS DOUBLE) AS sum_v
        FROM events GROUP BY 1, 2 ORDER BY w_start, event_type""")),

    // 1-hour windows sliding every 15 min: each event lands in 4 windows.
    Q("i2_win_sliding",
      (s, d) => events(s, d)
        .groupBy(window(col("ts_t"), "1 hour", "15 minutes"), col("event_type"))
        .agg(count(lit(1)).as("n"), mSum(col("value")).as("sum_v"))
        .select(expr("unix_millis(window.start)").as("w_start"),
          col("event_type"), col("n"), col("sum_v"))
        .orderBy("w_start", "event_type"),
      Some("""WITH b AS (
          SELECT ((CAST(epoch_ms(ts) AS BIGINT) // 900000) - o.o) * 900000 AS w_start,
            event_type, value
          FROM events, (VALUES (0),(1),(2),(3)) o(o))
        SELECT w_start, event_type, COUNT(*) AS n,
          CAST(ROUND(SUM(CAST(value AS DECIMAL(18,4))),4) AS DOUBLE) AS sum_v
        FROM b GROUP BY 1, 2 ORDER BY w_start, event_type""")),

    // Session windows, 30-min gap — streaming TD_SESSIONIZE; must agree with
    // h10's lag/gap/running-sum sessionization aggregated per session.
    Q("i3_win_session",
      (s, d) => events(s, d)
        .groupBy(session_window(col("ts_t"), "30 minutes"), col("user_id"))
        .agg(count(lit(1)).as("n_events"))
        .select(expr("unix_millis(session_window.start)").as("sess_start"),
          col("user_id"), col("n_events"))
        .orderBy("user_id", "sess_start"),
      Some(i3Oracle)))
}
