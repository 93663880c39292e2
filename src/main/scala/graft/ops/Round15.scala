package graft.ops

import org.apache.spark.sql.functions._
import graft.Tables._

/** Round-15 operators.
  *
  * k13 — TD-Hive dialect passthrough: the reference's SECOND engine type
  * (`create_engine('hive:db')`, `pandas_td/td.py` — SURVEY.md §0-caveated
  * anchor) hands HiveQL text to TD's hosted Hive. Spark SQL is
  * HiveQL-derived, so the graded text below is VERBATIM TD-Hive —
  * `LATERAL VIEW posexplode`, `get_json_object`, regex `split` — plus
  * TD's own Hive UDFs (`TD_TIME_RANGE`, `TD_TIME_FORMAT`,
  * `TD_DATE_TRUNC`), which resolve through [[graft.functions.Hive]]'s
  * statement scope: the same [[graft.functions.DialectScope]] machinery
  * as the Presto dialect, installing [[graft.functions.Td]]'s builders
  * for THIS text and handing back each name's prior resolution on exit.
  *
  * What the key deliberately pins alongside the happy path: `hive:` text
  * must NOT receive the Presto shims — `regex_split_n` counts
  * `split(s, '.')` fields, which is len+1 under Hive/Spark REGEX split
  * ('.' matches every char; Spark's split keeps trailing empties) and
  * would be 1-per-dot+1 under Presto's literal split. A dispatch bug that
  * routed hive text through the Presto scope flips that column and the
  * oracle hash catches it.
  *
  * Scale shape: map-side only — a pushdown-visible time-range filter on
  * the scan (TdTimeRange expands to plain comparisons), then a generate
  * (posexplode) over short arrays; no shuffle before the output sort.
  */
object Round15 {

  def all: Seq[Q] = Seq(

    Q("k13_hive_dialect",
      (s, d) => {
        events(s, d).createOrReplaceTempView("k13_events")
        graft.functions.Hive.sql(s, """
          SELECT e.event_id,
                 CAST(get_json_object(e.props, '$.k') AS BIGINT) AS k,
                 CAST(t.pos AS BIGINT) AS pos,
                 t.tok,
                 td_time_format(e.ts_ms div 1000, 'yyyy-MM-dd HH', 'UTC') AS hour_fmt,
                 td_date_trunc('day', e.ts_ms div 1000) AS day_sec,
                 CAST(size(split(e.event_type, '.')) AS BIGINT) AS regex_split_n
          FROM k13_events e
          LATERAL VIEW posexplode(split(e.event_type, 'c')) t AS pos, tok
          WHERE td_time_range(e.ts_t, '2024-01-05', '2024-01-08')
          ORDER BY e.event_id, pos""")
      },
      Some("""SELECT e.event_id,
          CAST(json_extract_string(e.props, '$.k') AS BIGINT) AS k,
          CAST(i.i - 1 AS BIGINT) AS pos,
          string_split(e.event_type, 'c')[i.i] AS tok,
          strftime(e.ts, '%Y-%m-%d %H') AS hour_fmt,
          CAST(epoch(date_trunc('day', e.ts)) AS BIGINT) AS day_sec,
          CAST(length(e.event_type) + 1 AS BIGINT) AS regex_split_n
        FROM events e,
             unnest(range(1, len(string_split(e.event_type, 'c')) + 1)) i(i)
        WHERE e.ts >= TIMESTAMP '2024-01-05' AND e.ts < TIMESTAMP '2024-01-08'
        ORDER BY event_id, pos""")))
}
