package graft.ops

import graft.Tables._

/** Round-9 additions — the Presto-dialect passthrough keys.
  *
  * The reference's primary path sends user query TEXT verbatim to Presto
  * (`pandas_td/td.py :: read_td_query`, SURVEY.md §0-caveated anchor), so
  * "a migrating user can run every query they run today" requires the
  * Presto function NAMES to resolve in our engine. `functions/Presto.scala`
  * registers them as parse-time expansions to native Catalyst expressions;
  * these keys prove the layer end-to-end against the DuckDB oracle:
  *
  *   - `k6_presto_dialect_agg` — aggregate-side names: approx_distinct
  *     (exact-regime graded: the sketched domain o_custkey % 8 has ≤ 8
  *     distinct values, far inside HLL++'s linear-counting range where the
  *     rounded estimate is exactly n — the d19/d21 grading device),
  *     arbitrary over a group-constant (deterministic by construction),
  *     Presto 3-arg date_diff, ISO day_of_week/week.
  *   - `k7_presto_dialect_row` — row-side names: json_extract_scalar,
  *     strpos (Presto arg order), from_unixtime→timestamp round-tripped
  *     through to_unixtime, date_parse/date_format with MySQL %-codes,
  *     to_hex, bitwise_and.
  *
  * Scale shape: k6 is one shuffle (the groupBy); k7 is map-only projection
  * — every alias expands to a codegen'd native expression, so the dialect
  * layer adds ZERO plan cost over hand-written Spark names.
  */
object Round9 {

  val all: Seq[Q] = Seq(

    Q("k6_presto_dialect_agg",
      (s, d) => {
        t(s, d, "orders").createOrReplaceTempView("k6_orders")
        graft.functions.Presto.sql(s, """
          SELECT o_orderpriority,
                 CAST(approx_distinct(o_custkey % 8) AS BIGINT) AS nd_bucket,
                 arbitrary(upper(o_orderpriority)) AS pri_upper,
                 CAST(date_diff('day', DATE '1995-06-01',
                                MAX(CAST(o_orderdate AS DATE))) AS BIGINT) AS days_after,
                 CAST(day_of_week(MAX(CAST(o_orderdate AS DATE))) AS BIGINT) AS dow_max,
                 CAST(week(MAX(CAST(o_orderdate AS DATE))) AS BIGINT) AS week_max,
                 MIN(CAST(strpos(o_orderpriority, '-') AS BIGINT)) AS dash_pos
          FROM k6_orders
          GROUP BY o_orderpriority
          ORDER BY o_orderpriority""")
      },
      Some("""SELECT o_orderpriority,
               CAST(COUNT(DISTINCT o_custkey % 8) AS BIGINT) AS nd_bucket,
               upper(o_orderpriority) AS pri_upper,
               CAST(date_diff('day', DATE '1995-06-01',
                              MAX(CAST(o_orderdate AS DATE))) AS BIGINT) AS days_after,
               CAST(isodow(MAX(CAST(o_orderdate AS DATE))) AS BIGINT) AS dow_max,
               CAST(weekofyear(MAX(CAST(o_orderdate AS DATE))) AS BIGINT) AS week_max,
               MIN(CAST(strpos(o_orderpriority, '-') AS BIGINT)) AS dash_pos
        FROM orders GROUP BY o_orderpriority ORDER BY o_orderpriority""")),

    Q("k7_presto_dialect_row",
      (s, d) => {
        events(s, d).createOrReplaceTempView("k7_events")
        graft.functions.Presto.sql(s, """
          SELECT event_id,
                 CAST(json_extract_scalar(props, '$.k') AS BIGINT) AS k,
                 CAST(strpos(event_type, 'c') AS BIGINT) AS c_pos,
                 CAST(to_unixtime(date_parse('2024-03-15 06:30:00',
                                             '%Y-%m-%d %H:%i:%s')) AS BIGINT) AS anchor_sec,
                 CAST(to_unixtime(from_unixtime(1700000000)) AS BIGINT) AS rt_sec,
                 date_format(from_unixtime(1700000000), '%Y/%m/%d %H:%i') AS rt_fmt,
                 lower(to_hex(event_id)) AS id_hex,
                 CAST(bitwise_and(event_id, 255) AS BIGINT) AS id_low_byte
          FROM k7_events
          WHERE event_id < 200
          ORDER BY event_id""")
      },
      Some("""SELECT event_id,
               CAST(json_extract_string(props, '$.k') AS BIGINT) AS k,
               CAST(strpos(event_type, 'c') AS BIGINT) AS c_pos,
               CAST(epoch(TIMESTAMP '2024-03-15 06:30:00') AS BIGINT) AS anchor_sec,
               CAST(1700000000 AS BIGINT) AS rt_sec,
               strftime(to_timestamp(1700000000), '%Y/%m/%d %H:%M') AS rt_fmt,
               lower(to_hex(event_id)) AS id_hex,
               CAST(event_id & 255 AS BIGINT) AS id_low_byte
        FROM events WHERE event_id < 200 ORDER BY event_id"""))
  )
}
