package graft.ops

import org.apache.spark.sql.functions._
import graft.Tables._
import graft.functions.Td

/** §3.H — scalar function surface (string / date / math / JSON / array /
  * map / conditional / cast) plus the TD UDF layer: `td_time_range` (h3,
  * via SQL registration so the expansion is visible to pushdown),
  * `td_date_trunc`/`td_time_add`/`td_time_format` (h2) and
  * `td_sessionize` (h10) — the reference exposes these through Presto/Hive
  * passthrough (`pandas_td/td.py :: read_td_query`); TD UDF semantics per
  * public TD docs.
  *
  * Everything stays inside whole-stage codegen: built-in functions and
  * expansion-based TD wrappers only, no opaque UDFs in any hot path.
  */
object Scalars {

  val all: Seq[Q] = Seq(

    Q("h1_str",
      (s, d) => t(s, d, "part").select(col("p_partkey"),
        upper(substring(col("p_name"), 1, 5)).as("up5"),
        lower(col("p_brand")).as("lb"),
        trim(concat(lit("  "), col("p_type"), lit(" "))).as("trimmed"),
        length(col("p_name")).cast("long").as("len"),
        concat(col("p_brand"), lit("|"), col("p_type")).as("cat"),
        expr("split_part(p_name, ' ', 1)").as("first_tok"),
        instr(col("p_name"), "bolt").cast("long").as("pos"),
        expr("replace(p_name, 'e', '3')").as("repl"))
        .orderBy("p_partkey"),
      Some("""SELECT p_partkey, upper(substr(p_name,1,5)) AS up5, lower(p_brand) AS lb,
        trim(concat('  ', p_type, ' ')) AS trimmed, CAST(length(p_name) AS BIGINT) AS len,
        concat(p_brand,'|',p_type) AS cat, split_part(p_name,' ',1) AS first_tok,
        CAST(strpos(p_name,'bolt') AS BIGINT) AS pos, replace(p_name,'e','3') AS repl
        FROM part ORDER BY p_partkey""")),

    // String padding/shaping family.
    Q("h11_str_pad",
      (s, d) => t(s, d, "customer").select(col("c_custkey"),
        lpad(col("c_name"), 25, "*").as("lp"),
        rpad(col("c_mktsegment"), 12, ".").as("rp"),
        reverse(col("c_name")).as("rev"),
        lit("ab").as("u"),
        expr("repeat('ab', 3)").as("rep"),
        translate(col("c_name"), "Cu", "cU").as("tr"))
        .drop("u")
        .orderBy("c_custkey"),
      Some("""SELECT c_custkey, lpad(c_name, 25, '*') AS lp, rpad(c_mktsegment, 12, '.') AS rp,
        reverse(c_name) AS rev, repeat('ab', 3) AS rep, translate(c_name,'Cu','cU') AS tr
        FROM customer ORDER BY c_custkey""")),

    // TD_DATE_TRUNC / TD_TIME_ADD / TD_TIME_FORMAT via the Td layer.
    Q("h2_date",
      (s, d) => t(s, d, "orders").select(col("o_orderkey"),
        dateStr(Td.tdDateTrunc("month", col("o_orderdate"))).as("mon"),
        year(col("o_orderdate")).cast("long").as("yr"),
        month(col("o_orderdate")).cast("long").as("mo"),
        dayofmonth(col("o_orderdate")).cast("long").as("dom"),
        dateStr(Td.tdTimeAdd(col("o_orderdate"), 30, "DAY")).as("plus30"),
        datediff(to_date(lit("2000-01-01")), to_date(col("o_orderdate")))
          .cast("long").as("days_to_2000"),
        Td.tdTimeFormat(col("o_orderdate"), "yyyy/MM/dd HH").as("fmt"))
        .orderBy("o_orderkey"),
      Some("""SELECT o_orderkey, strftime(date_trunc('month',o_orderdate),'%Y-%m-%d') AS mon,
        CAST(year(o_orderdate) AS BIGINT) AS yr, CAST(month(o_orderdate) AS BIGINT) AS mo,
        CAST(day(o_orderdate) AS BIGINT) AS dom,
        strftime(o_orderdate + INTERVAL 30 DAY,'%Y-%m-%d') AS plus30,
        CAST(date_diff('day', CAST(o_orderdate AS DATE), DATE '2000-01-01') AS BIGINT) AS days_to_2000,
        strftime(o_orderdate,'%Y/%m/%d %H') AS fmt
        FROM orders ORDER BY o_orderkey""")),

    // TD_TIME_RANGE through the SQL registration path — parse-time expansion
    // to plain comparisons (pushdown-visible), never a UDF black box.
    Q("h3_td_time_range",
      (s, d) => Views.unique(s, "lineitem" -> t(s, d, "lineitem")) { v =>
        Td.register(s)
        s.sql(s"""SELECT l_orderkey, l_linenumber, l_quantity FROM ${v("lineitem")}
          WHERE td_time_range(l_shipdate, '1997-01-01', '1997-03-01')
          ORDER BY l_orderkey, l_linenumber, l_quantity""")
      },
      Some("""SELECT l_orderkey, l_linenumber, l_quantity FROM lineitem
        WHERE l_shipdate >= TIMESTAMP '1997-01-01' AND l_shipdate < TIMESTAMP '1997-03-01'
        ORDER BY l_orderkey, l_linenumber, l_quantity""")),

    Q("h4_math",
      (s, d) => t(s, d, "lineitem").select(col("l_orderkey"), col("l_linenumber"),
        abs(col("l_quantity") - 25).as("ab"),
        ceil(col("l_quantity") / 7).cast("long").as("ce"),
        floor(col("l_quantity") / 7).cast("long").as("fl"),
        pow(col("l_quantity"), 2).as("sq"),
        round(sqrt(col("l_quantity")), 6).as("sqr"),
        round(log(col("l_extendedprice")), 6).as("lg"),
        (col("l_orderkey") % 7).as("md"))
        .orderBy("l_orderkey", "l_linenumber", "ab", "sq", "lg"),
      Some("""SELECT l_orderkey, l_linenumber, abs(l_quantity-25) AS ab,
        CAST(ceil(l_quantity/7) AS BIGINT) AS ce, CAST(floor(l_quantity/7) AS BIGINT) AS fl,
        power(l_quantity,2) AS sq, ROUND(sqrt(l_quantity),6) AS sqr,
        ROUND(ln(l_extendedprice),6) AS lg, l_orderkey % 7 AS md
        FROM lineitem ORDER BY l_orderkey, l_linenumber, ab, sq, lg""")),

    // Typed JSON parse (from_json → struct field), vs a10's path extraction.
    Q("h5_json",
      (s, d) => events(s, d).select(col("event_id"),
        from_json(col("props"), "k BIGINT", Map.empty[String, String])
          .getField("k").as("k_typed"))
        .orderBy("event_id"),
      Some("""SELECT event_id, CAST(json_extract_string(props,'$.k') AS BIGINT) AS k_typed
        FROM events ORDER BY event_id""")),

    // Array ops over the embedding column (higher-order functions).
    Q("h6_array",
      (s, d) => t(s, d, "embeddings").select(col("vec_id"),
        size(col("embedding")).cast("long").as("dim"),
        round(element_at(col("embedding"), 1).cast("double"), 6).as("first_v"),
        round(expr("aggregate(transform(slice(embedding,1,3), x -> cast(x as double)), " +
          "cast(0.0 as double), (a,b) -> a+b)"), 6).as("head3_sum"))
        .orderBy("vec_id"),
      Some("""SELECT vec_id, CAST(len(embedding) AS BIGINT) AS dim,
        ROUND(CAST(embedding[1] AS DOUBLE),6) AS first_v,
        ROUND(list_sum(list_transform(embedding[1:3], x -> CAST(x AS DOUBLE))),6) AS head3_sum
        FROM embeddings ORDER BY vec_id""")),

    // MapType construction + lookup. The output is flat (the map is built
    // then probed), so this IS oracle-able despite the engines' different
    // MAP syntaxes: DuckDB's `m['key']` yields a single-element LIST,
    // unwrapped with [1] — both sides construct a real map value and
    // grade the same lookups (upgraded r6 from rows-only).
    Q("h7_map",
      (s, d) => events(s, d).select(col("event_id"),
        map(lit("type"), col("event_type"),
          lit("k"), get_json_object(col("props"), "$.k")).as("m"))
        .select(col("event_id"),
          element_at(col("m"), "type").as("m_type"),
          // try_cast: junk props values → NULL, not a job abort
          // (EventsGuardSpec; a10's definition)
          expr("try_cast(element_at(m, 'k') as bigint)").as("m_k"))
        .orderBy("event_id"),
      Some("""WITH x AS (SELECT event_id,
          MAP {'type': event_type, 'k': json_extract_string(props, '$.k')} AS m
        FROM events)
        SELECT event_id, m['type'][1] AS m_type,
          TRY_CAST(m['k'][1] AS BIGINT) AS m_k
        FROM x ORDER BY event_id""")),

    Q("h8_case_cond",
      (s, d) => t(s, d, "orders").select(col("o_orderkey"),
        when(col("o_totalprice") > 400000, "big")
          .when(col("o_totalprice") > 150000, "mid")
          .otherwise("small").as("bucket"),
        coalesce(expr("nullif(o_orderstatus, 'P')"), lit("pending")).as("st"),
        when(col("o_orderpriority") === "1-URGENT", 1L).otherwise(0L).as("urgent"))
        .orderBy("o_orderkey"),
      Some("""SELECT o_orderkey,
        CASE WHEN o_totalprice > 400000 THEN 'big'
             WHEN o_totalprice > 150000 THEN 'mid' ELSE 'small' END AS bucket,
        COALESCE(NULLIF(o_orderstatus,'P'),'pending') AS st,
        CAST(CASE WHEN o_orderpriority = '1-URGENT' THEN 1 ELSE 0 END AS BIGINT) AS urgent
        FROM orders ORDER BY o_orderkey""")),

    // Casts across long/double/string/timestamp/decimal. l_quantity is an
    // integral double so the double→long cast is rounding-mode-safe.
    Q("h9_cast",
      (s, d) => t(s, d, "lineitem").select(col("l_orderkey"), col("l_linenumber"),
        col("l_quantity").cast("long").as("q_int"),
        col("l_orderkey").cast("string").as("ok_str"),
        dec(col("l_extendedprice")).cast("string").as("price_str"),
        col("l_shipdate").cast("date").cast("string").as("ship_str"),
        lit("42").cast("long").as("parsed"))
        .orderBy("l_orderkey", "l_linenumber", "q_int", "price_str", "ship_str"),
      Some("""SELECT l_orderkey, l_linenumber, CAST(l_quantity AS BIGINT) AS q_int,
        CAST(l_orderkey AS VARCHAR) AS ok_str,
        CAST(CAST(l_extendedprice AS DECIMAL(18,4)) AS VARCHAR) AS price_str,
        CAST(CAST(l_shipdate AS DATE) AS VARCHAR) AS ship_str, CAST('42' AS BIGINT) AS parsed
        FROM lineitem ORDER BY l_orderkey, l_linenumber, q_int, price_str, ship_str""")),

    // TD_SESSIONIZE batch form (flagship TD UDF): 30-min gap sessions per
    // user — one shuffle, two window passes over the same sort.
    Q("h10_sessionize",
      (s, d) => Td.tdSessionize(events(s, d), "user_id", "ts_ms",
          30 * 60 * 1000L, "event_id")
        .select("event_id", "user_id", "session_id")
        .orderBy("event_id"),
      Some("""WITH e AS (SELECT event_id, user_id, CAST(epoch_ms(ts) AS BIGINT) AS ts_ms
          FROM events),
        x AS (SELECT event_id, user_id, ts_ms,
          lag(ts_ms) OVER (PARTITION BY user_id ORDER BY ts_ms, event_id) AS prev FROM e)
        SELECT event_id, user_id,
          CAST(SUM(CASE WHEN prev IS NULL OR ts_ms - prev > 1800000 THEN 1 ELSE 0 END)
            OVER (PARTITION BY user_id ORDER BY ts_ms, event_id
              ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS session_id
        FROM x ORDER BY event_id""")),

    // TD's NATIVE `time` convention: epoch SECONDS as BIGINT (every TD
    // table carries one; the reference's generated SQL filters it with
    // td_time_range verbatim). The SQL function resolves through the
    // TdTimeRange RuntimeReplaceable, which — post-analysis, seeing a LONG
    // column — folds the ISO bounds to epoch-second literals and emits
    // bare long comparisons: on a TD-layout table at 100 TB these hit
    // parquet row-group min/max on the time column directly. h3 covers the
    // TIMESTAMP-column dispatch arm; this covers TD's own layout.
    Q("h21_td_time_range_epoch",
      (s, d) => Views.unique(s, "events_epoch" -> events(s, d)
          .select(col("event_id"), expr("ts_ms div 1000").as("time"),
            col("event_type"))) { v =>
        Td.register(s)
        s.sql(s"""SELECT event_id, time, event_type FROM ${v("events_epoch")}
          WHERE td_time_range(time, '2024-01-08', '2024-01-15')
          ORDER BY event_id""")
      },
      {
        val lo = epochMs("2024-01-08") / 1000
        val hi = epochMs("2024-01-15") / 1000
        Some(s"""SELECT event_id, CAST(epoch_ms(ts) // 1000 AS BIGINT) AS time, event_type
          FROM events
          WHERE epoch_ms(ts) // 1000 >= $lo AND epoch_ms(ts) // 1000 < $hi
          ORDER BY event_id""")
      }),

    // TD_TIME_STRING(time, fmt[, tz]) — the truncating epoch formatter TD
    // queries render report columns with (public TD UDF docs): unit letter
    // + optional '!' (leading fields only). All construction-time
    // expansion into date_trunc/date_format in the target zone; the
    // non-'!' form carries the per-row zone offset. Tokyo (+09:00, no DST)
    // keeps the oracle a fixed epoch shift.
    Q("h22_td_time_string",
      (s, d) => {
        val tz = "Asia/Tokyo"
        val ev = events(s, d).where(col("event_id") < 2000)
          .select(col("event_id"), expr("ts_ms div 1000").as("time"))
        ev.select(col("event_id"),
            Td.tdTimeString(col("time"), "y!", tz).as("t_y"),
            Td.tdTimeString(col("time"), "M!", tz).as("t_month"),
            Td.tdTimeString(col("time"), "d!", tz).as("t_d"),
            Td.tdTimeString(col("time"), "h!", tz).as("t_h"),
            Td.tdTimeString(col("time"), "d", tz).as("t_d_full"))
          .orderBy("event_id")
      },
      Some("""WITH e AS (SELECT event_id,
            make_timestamp((epoch_ms(ts) // 1000 + 32400) * 1000000) AS sh
          FROM events WHERE event_id < 2000)
        SELECT event_id,
          strftime(sh, '%Y') AS t_y,
          strftime(sh, '%Y-%m') AS t_month,
          strftime(sh, '%Y-%m-%d') AS t_d,
          strftime(sh, '%Y-%m-%d %H') AS t_h,
          strftime(date_trunc('day', sh), '%Y-%m-%d %H:%M:%S') || '+0900' AS t_d_full
        FROM e ORDER BY event_id""")),

    // TD_TIME_FORMAT / TD_TIME_PARSE / TD_URL_DECODE — verbatim TD query
    // text through the SQL-registered builders (functions/Td.scala round-13
    // tier). The format/parse pair round-trips through Tokyo to pin the
    // zone handling; everything expands to native datetime expressions
    // with the target zone pre-set on the TimeZoneAwareExpression, so no
    // UDF and no session-zone dependence.
    Q("h23_td_time_format",
      (s, d) => Views.unique(s, "events_epoch_fmt" -> events(s, d)
          .where(col("event_id") < 2000)
          .select(col("event_id"), expr("ts_ms div 1000").as("time"),
            col("event_type"))) { v =>
        Td.register(s)
        s.sql(s"""SELECT event_id,
            td_time_format(time, 'yyyy-MM-dd HH:mm:ss', 'Asia/Tokyo') AS tf,
            td_time_parse(td_time_format(time, 'yyyy-MM-dd HH:mm:ss', 'Asia/Tokyo'), 'Asia/Tokyo') AS rt,
            td_time_parse(td_time_format(time, 'yyyy-MM-dd HH:mm:ss')) AS rt_utc,
            td_url_decode(concat('a%20b%2F', event_type)) AS dec
          FROM ${v("events_epoch_fmt")} ORDER BY event_id""")
      },
      Some("""SELECT event_id,
          strftime(make_timestamp((epoch_ms(ts) // 1000 + 32400) * 1000000), '%Y-%m-%d %H:%M:%S') AS tf,
          CAST(epoch_ms(ts) // 1000 AS BIGINT) AS rt,
          CAST(epoch_ms(ts) // 1000 AS BIGINT) AS rt_utc,
          concat('a b/', event_type) AS dec
        FROM events WHERE event_id < 2000 ORDER BY event_id""")),

    // TD_TIME_ADD / TD_DATE_TRUNC over epoch seconds: fixed-duration
    // arithmetic folds to `time + const`; truncation runs on the target
    // zone's wall clock (Tokyo: fixed +09:00, so the oracle is an exact
    // epoch-shift algebra).
    Q("h24_td_time_arith",
      (s, d) => Views.unique(s, "events_epoch_arith" -> events(s, d)
          .select(col("event_id"), expr("ts_ms div 1000").as("time"))) { v =>
        Td.register(s)
        s.sql(s"""SELECT event_id, time,
            td_time_add(time, '-1d2h') AS back,
            td_date_trunc('day', time, 'Asia/Tokyo') AS day_jst,
            td_date_trunc('month', time) AS mon_utc
          FROM ${v("events_epoch_arith")} ORDER BY event_id""")
      },
      Some("""SELECT event_id, CAST(epoch_ms(ts) // 1000 AS BIGINT) AS time,
          CAST(epoch_ms(ts) // 1000 - 93600 AS BIGINT) AS back,
          CAST(epoch(date_trunc('day', make_timestamp((epoch_ms(ts) // 1000 + 32400) * 1000000))) - 32400 AS BIGINT) AS day_jst,
          CAST(epoch(date_trunc('month', make_timestamp((epoch_ms(ts) // 1000) * 1000000))) AS BIGINT) AS mon_utc
        FROM events ORDER BY event_id""")),

    // TD_INTERVAL — the scheduled-query period filter. The scheduled time
    // is pinned in-session conf (as TD's scheduler injects it); '-1d' in
    // Tokyo selects the whole previous Tokyo day. The bounds fold at
    // resolution into bare epoch-second comparisons (TdSqlSpec pins the
    // optimized plan), so at TD's native table layout this prunes parquet
    // row groups exactly like td_time_range's LONG arm. Oracle bounds are
    // hand-derived independently: scheduled 2024-01-10T05:00Z = Tokyo
    // 14:00; previous Tokyo day = [2024-01-09 00:00, 2024-01-10 00:00) JST
    // = [1704726000, 1704812400).
    Q("h25_td_interval",
      (s, d) => Views.unique(s, "events_epoch_iv" -> events(s, d)
          .select(col("event_id"), expr("ts_ms div 1000").as("time"))) { v =>
        Td.register(s)
        s.conf.set("spark.graft.scheduled_time", "2024-01-10 05:00:00")
        s.sql(s"""SELECT event_id, time FROM ${v("events_epoch_iv")}
          WHERE td_interval(time, '-1d', 'Asia/Tokyo')
          ORDER BY event_id""")
      },
      Some("""SELECT event_id, CAST(epoch_ms(ts) // 1000 AS BIGINT) AS time
        FROM events
        WHERE epoch_ms(ts) // 1000 >= 1704726000 AND epoch_ms(ts) // 1000 < 1704812400
        ORDER BY event_id""")),

    // TD_FIRST / TD_LAST (Hive argmin/argmax UDAFs) + TD_MD5 through the
    // SQL names → native MinBy/MaxBy partial+final hash aggregate; the
    // multi-key form orders by a composite scalar on both sides (ties on
    // o_orderdate broken by o_orderkey — §8.4.4 determinism).
    Q("h26_td_first_last",
      (s, d) => Views.unique(s, "orders_tfl" -> t(s, d, "orders")) { v =>
        Td.register(s)
        s.sql(s"""SELECT o_orderpriority,
            td_first(o_orderstatus, o_orderkey) AS first_status,
            td_last(o_orderstatus, o_orderkey) AS last_status,
            td_last(o_totalprice, unix_millis(cast(o_orderdate AS timestamp)) * 1000000 + o_orderkey) AS last_price,
            td_md5(o_orderpriority) AS pri_md5
          FROM ${v("orders_tfl")} GROUP BY o_orderpriority ORDER BY o_orderpriority""")
      },
      Some("""SELECT o_orderpriority,
          arg_min(o_orderstatus, o_orderkey) AS first_status,
          arg_max(o_orderstatus, o_orderkey) AS last_status,
          arg_max(o_totalprice, epoch_ms(CAST(o_orderdate AS timestamp)) * 1000000 + o_orderkey) AS last_price,
          md5(o_orderpriority) AS pri_md5
        FROM orders GROUP BY o_orderpriority ORDER BY o_orderpriority""")),

    // TD_SESSIONIZE_WINDOW — the windowed sessionizer TD ships as a Presto
    // window UDF, here a native AggregateWindowFunction (single Window
    // exec, one shuffle on user_id + one in-partition sort — the h10
    // lag+sum idiom needs two window passes for the same answer; see
    // expressions/TdSessionizeWindow.scala). Ids are md5(sessionStart:
    // salt) rather than TD's nondeterministic UUIDs, so the oracle can
    // replay them: DuckDB derives session starts via the classic
    // lag→flag→cumsum→min-over-session chain and hashes the same string.
    Q("h27_td_sessionize_window",
      (s, d) => Views.unique(s, "events_epoch_sess" -> events(s, d)
          .select(col("event_id"), col("user_id"),
            expr("ts_ms div 1000").as("time"))) { v =>
        Td.register(s)
        s.sql(s"""SELECT event_id, user_id, time,
            td_sessionize_window(time, 1800, user_id)
              OVER (PARTITION BY user_id ORDER BY time, event_id) AS session_id
          FROM ${v("events_epoch_sess")} ORDER BY event_id""")
      },
      Some("""WITH e AS (SELECT event_id, user_id,
            CAST(epoch_ms(ts) // 1000 AS BIGINT) AS time FROM events),
        x AS (SELECT *, lag(time) OVER
            (PARTITION BY user_id ORDER BY time, event_id) AS prev FROM e),
        s AS (SELECT *, SUM(CASE WHEN prev IS NULL OR time - prev > 1800
              THEN 1 ELSE 0 END)
            OVER (PARTITION BY user_id ORDER BY time, event_id
              ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS sid
          FROM x),
        g AS (SELECT *, MIN(time) OVER (PARTITION BY user_id, sid) AS sess_start
          FROM s)
        SELECT event_id, user_id, time,
          md5(CAST(sess_start AS VARCHAR) || ':' || CAST(user_id AS VARCHAR)) AS session_id
        FROM g ORDER BY event_id""")),

    // TD_APPROX_MOST_FREQUENT — TD's frequency-sketch UDAF through the SQL
    // name: SpaceSaving partials merged map-side, memory bounded by the
    // capacity arg at any cardinality. Graded in the EXACT regime (the
    // d21/k4 device): 31 terms/lang < capacity 100, so no eviction fires
    // and the map equals the exact top-5 — hash-checkable row-wise after
    // exploding the map (map columns don't hash stably across engines;
    // the map SHAPE itself is pinned in TdSqlSpec).
    Q("h28_td_approx_most_frequent",
      (s, d) => Views.unique(s, "documents_amf" -> t(s, d, "documents")) { v =>
        Td.register(s)
        s.sql(s"""SELECT lang, term, cnt FROM (
            SELECT lang, td_approx_most_frequent(5, term, 100) AS m
            FROM (SELECT lang, explode(split(text, ' ')) AS term
              FROM ${v("documents_amf")})
            GROUP BY lang)
          LATERAL VIEW explode(m) AS term, cnt
          ORDER BY lang, cnt DESC, term""")
      },
      Some("""WITH tc AS (SELECT lang, term, COUNT(*) AS cnt
          FROM (SELECT lang, unnest(string_split(text, ' ')) AS term
            FROM documents)
          GROUP BY 1, 2),
        r AS (SELECT lang, term, cnt,
            row_number() OVER (PARTITION BY lang ORDER BY cnt DESC, term) AS rn
          FROM tc)
        SELECT lang, term, cnt FROM r WHERE rn <= 5
        ORDER BY lang, cnt DESC, term""")),

    // TD_PARSE_AGENT through the SQL name — map-returning UA parser over
    // codegen'd regexp/case nodes (h14 is the column-API shape; this is
    // the Presto-UDF shape TD queries splice in). The oracle re-derives
    // the fields from the synthesis rule rather than re-parsing, so it
    // checks the parser against the ground truth the UAs were built FROM.
    Q("h29_td_parse_agent",
      (s, d) => Views.unique(s, "customer_ua" -> t(s, d, "customer")
          .withColumn("ua", concat(lit("Mozilla/5.0 ("),
            when(col("c_custkey") % 3 === 0, "X11; Linux x86_64")
              .when(col("c_custkey") % 3 === 1, "Macintosh; Intel Mac OS X 10_15_7")
              .otherwise("Windows NT 10.0; Win64; x64"),
            lit(") AppleWebKit/537.36 Chrome/"),
            (lit(90) + col("c_custkey") % 30), lit(".0.0.0 Safari/537.36")))) { v =>
        Td.register(s)
        s.sql(s"""SELECT c_custkey,
            m['browser'] AS browser, m['browser_version'] AS bv,
            m['os'] AS os, m['os_version'] AS osv, m['category'] AS cat
          FROM (SELECT c_custkey, td_parse_agent(ua) AS m FROM ${v("customer_ua")})
          ORDER BY c_custkey""")
      },
      Some("""SELECT c_custkey,
          'Chrome' AS browser,
          (90 + c_custkey % 30) || '.0.0.0' AS bv,
          CASE WHEN c_custkey % 3 = 0 THEN 'Linux'
               WHEN c_custkey % 3 = 1 THEN 'Mac OSX'
               ELSE 'Windows' END AS os,
          CASE WHEN c_custkey % 3 = 1 THEN '10_15_7'
               WHEN c_custkey % 3 = 2 THEN '10.0' ELSE '' END AS osv,
          'pc' AS cat
        FROM customer ORDER BY c_custkey""")),

    // Linear interpolation gap-fill — pandas `interpolate('linear')`
    // engine-side, the sibling of h15's LOCF and h19's resample+ffill:
    // interior gaps blend the bracketing observations by time distance,
    // trailing gaps clamp to the last observation (np.interp semantics),
    // leading gaps stay null. Readings are masked deterministically
    // (event_id % 5 == 0) so the oracle sees the identical gap pattern.
    // Both bracketing scans are windows over the SAME (user, time)
    // partitioning/ordering — Spark plans ONE shuffle + one sort for the
    // running and reversed frames together; same single-exchange bound as
    // h15 at 100 TB. The blend multiplies before dividing on both engines
    // (left-assoc), so the doubles agree bit-for-bit at round-6.
    Q("h30_interpolate_linear",
      (s, d) => {
        import org.apache.spark.sql.expressions.Window
        val wp = Window.partitionBy("user_id").orderBy("ts_ms", "event_id")
          .rowsBetween(Window.unboundedPreceding, 0)
        val wn = Window.partitionBy("user_id").orderBy("ts_ms", "event_id")
          .rowsBetween(0, Window.unboundedFollowing)
        events(s, d)
          .select(col("event_id"), col("user_id"), col("ts_ms"),
            when(col("event_id") % 5 =!= 0, col("value")).as("v"))
          .withColumn("pt",
            last(when(col("v").isNotNull, col("ts_ms")), ignoreNulls = true).over(wp))
          .withColumn("pv", last(col("v"), ignoreNulls = true).over(wp))
          .withColumn("nt",
            first(when(col("v").isNotNull, col("ts_ms")), ignoreNulls = true).over(wn))
          .withColumn("nv", first(col("v"), ignoreNulls = true).over(wn))
          .select(col("event_id"), col("user_id"),
            round(
              when(col("v").isNotNull, col("v"))
                .when(col("pv").isNull, lit(null))
                .when(col("nv").isNull, col("pv"))
                .when(col("nt") === col("pt"), col("pv"))
                .otherwise(col("pv") + (col("nv") - col("pv"))
                  * (col("ts_ms") - col("pt")) / (col("nt") - col("pt"))),
              6).as("vi"))
          .orderBy("event_id")
      },
      Some("""WITH e AS (SELECT event_id, user_id,
            CAST(epoch_ms(ts) AS BIGINT) AS ts_ms,
            CASE WHEN event_id % 5 <> 0 THEN value END AS v FROM events),
        w AS (SELECT event_id, user_id, ts_ms, v,
            last_value(CASE WHEN v IS NOT NULL THEN ts_ms END IGNORE NULLS)
              OVER wp AS pt,
            last_value(v IGNORE NULLS) OVER wp AS pv,
            first_value(CASE WHEN v IS NOT NULL THEN ts_ms END IGNORE NULLS)
              OVER wn AS nt,
            first_value(v IGNORE NULLS) OVER wn AS nv
          FROM e
          WINDOW wp AS (PARTITION BY user_id ORDER BY ts_ms, event_id
              ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW),
            wn AS (PARTITION BY user_id ORDER BY ts_ms, event_id
              ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING))
        SELECT event_id, user_id,
          ROUND(CASE WHEN v IS NOT NULL THEN v
            WHEN pv IS NULL THEN NULL
            WHEN nv IS NULL THEN pv
            WHEN nt = pt THEN pv
            ELSE pv + (nv - pv) * (ts_ms - pt) / (nt - pt) END, 6) AS vi
        FROM w ORDER BY event_id""")),

    // Retention cohort matrix — the canonical product-analytics query a TD
    // user runs over an events table: users cohorted by first-seen day,
    // then counted per (cohort, day-offset). Shape at 100 TB: ONE shuffle
    // on user_id building each user's day SET (collect_set dedups
    // map-side; per-user state is calendar-bounded — #days in the table's
    // span — never data-bounded), cohort = array_min of the same set, so
    // no join and no second events pass. The rejected join shape (distinct
    // (user, day) ⋈ min-per-user) re-shuffles: distinct partitions on
    // BOTH columns, the join needs user_id alone. The final (cohort,
    // offset) groupBy runs on user-days, orders of magnitude below
    // events. Day boundaries are UTC session days; cohort emitted as ISO
    // string per §8.4.3.
    Q("h31_retention_cohort",
      (s, d) => {
        events(s, d)
          .select(col("user_id"), to_date(col("ts_t")).as("day"))
          .groupBy("user_id").agg(collect_set(col("day")).as("days"))
          .select(array_min(col("days")).as("cohort"),
            explode(col("days")).as("day"))
          .select(dateStr(col("cohort")).as("cohort"),
            datediff(col("day"), col("cohort")).cast("long").as("day_offset"))
          .groupBy("cohort", "day_offset")
          .agg(count(lit(1)).as("users"))
          .orderBy("cohort", "day_offset")
      },
      Some("""WITH e AS (SELECT DISTINCT user_id, CAST(ts AS DATE) AS day
            FROM events),
        c AS (SELECT user_id, MIN(day) AS cohort FROM e GROUP BY user_id)
        SELECT strftime(c.cohort, '%Y-%m-%d') AS cohort,
          CAST(datediff('day', c.cohort, e.day) AS BIGINT) AS day_offset,
          CAST(COUNT(*) AS BIGINT) AS users
        FROM e JOIN c USING (user_id)
        GROUP BY c.cohort, day_offset ORDER BY cohort, day_offset""")),

    // TD_CURRENCY_CONV's engine-side shape with a user-supplied rate table
    // (the UDF itself embeds TD's licensed FX feed — documented absence;
    // this key is the bring-your-own-table form): convert each order at
    // the latest rate effective on or before its date. An AS-OF lookup
    // against a dimension: the rate table is tiny (currencies × effective
    // dates) so it BROADCASTS, each order map-side-expands to its ≤12
    // admissible rates, and the argmax folds in ONE aggregate that
    // carries the order's payload (first() over the group — no join-back,
    // so the fact table crosses the wire exactly once). c10c's sorted
    // AsOfJoinExec is the zero-shuffle alternative when facts arrive
    // time-sorted. Exact decimal arithmetic (rate as DECIMAL(18,6),
    // §8.4.2) keeps converted totals hash-identical across engines.
    // Currencies/rates derive deterministically so the oracle rebuilds
    // them.
    Q("h32_currency_conv",
      (s, d) => {
        val orders = t(s, d, "orders").select(col("o_orderkey"),
          col("o_orderdate"), col("o_totalprice"),
          expr("element_at(array('USD','JPY','EUR'), CAST(o_custkey % 3 AS INT) + 1)")
            .as("cur"))
        // rate table: per currency, monthly effective dates with a
        // deterministic drift; USD is the identity
        val rates = s.range(1, 13).select(
            explode(expr("array('USD','JPY','EUR')")).as("cur"),
            expr("make_date(1992, CAST(id AS INT), 1)").as("eff"),
            col("id").cast("int").as("m"))
          .select(col("cur"), col("eff"),
            expr("""CAST(CASE cur WHEN 'USD' THEN 1.0
              WHEN 'JPY' THEN 0.009 + m * 0.0001
              ELSE 1.08 + m * 0.001 END AS DECIMAL(18,6))""").as("rate"))
        orders.join(broadcast(rates),
            orders("cur") === rates("cur") && rates("eff") <= orders("o_orderdate"))
          .groupBy(orders("o_orderkey"))
          .agg(first(orders("cur")).as("cur"),
            first(col("o_totalprice")).as("price"),
            expr("max_by(rate, eff)").as("rate"))
          .select(col("o_orderkey"), col("cur"),
            expr("CAST(round(CAST(price AS DECIMAL(18,4)) * rate, 4) AS DOUBLE)")
              .as("usd"))
          .orderBy("o_orderkey")
      },
      Some("""WITH o AS (SELECT o_orderkey, o_orderdate,
            CAST(o_totalprice AS DECIMAL(18,4)) AS price,
            ['USD','JPY','EUR'][CAST(o_custkey % 3 AS INT) + 1] AS cur
          FROM orders),
        r AS (SELECT cur, make_date(1992, CAST(m AS INT), 1) AS eff,
            CAST(CASE cur WHEN 'USD' THEN 1.0
              WHEN 'JPY' THEN 0.009 + m * 0.0001
              ELSE 1.08 + m * 0.001 END AS DECIMAL(18,6)) AS rate
          FROM (SELECT unnest(range(1, 13)) AS m),
            (SELECT unnest(['USD','JPY','EUR']) AS cur)),
        eff AS (SELECT o.o_orderkey, arg_max(r.rate, r.eff) AS rate
          FROM o JOIN r ON o.cur = r.cur AND r.eff <= o.o_orderdate
          GROUP BY o.o_orderkey)
        SELECT o.o_orderkey, o.cur,
          CAST(round(o.price * eff.rate, 4) AS DOUBLE) AS usd
        FROM o JOIN eff USING (o_orderkey)
        ORDER BY o_orderkey""")),

    // TD_IP_TO_COUNTRY's engine-side shape with a user-supplied CIDR table
    // (the UDF embeds TD's licensed GeoIP database — documented absence;
    // this is the bring-your-own-table form): dotted-quad → uint32 via
    // native split/cast arithmetic, then a PREFIX-BUCKETED lookup — each
    // CIDR block expands to the first octets it covers, the probe joins on
    // its own first octet (plain hash join, broadcast dim), and the
    // start <= ip < end residual filters within the bucket. The bucketed
    // equi-join is the point: a raw BETWEEN against the dim would plan a
    // nested loop over every row; bucketing by prefix is how IP lookups
    // stay an equi-join at 100 TB (and how real GeoIP services index).
    Q("h33_ip_to_country",
      (s, d) => {
        val ips = t(s, d, "customer").select(col("c_custkey").as("id"),
          concat_ws(".",
            (lit(10) + (col("c_custkey") % 3) * 60).cast("string"),
            (col("c_custkey") % 256).cast("string"),
            ((col("c_custkey") * 7) % 256).cast("string"),
            ((col("c_custkey") * 13) % 256).cast("string")).as("ip"))
        import s.implicits._
        // (cidr_start, cidr_end_exclusive, country) as uint32 ranges:
        // 10.0.0.0/9 US, 10.128.0.0/9 CA, 70.0.0.0/9 FR, 70.128.0.0/9 DE,
        // 130.0.0.0/8 JP
        val cidr = Seq(
          (10L * 16777216, 10L * 16777216 + 8388608, "US"),
          (10L * 16777216 + 8388608, 11L * 16777216, "CA"),
          (70L * 16777216, 70L * 16777216 + 8388608, "FR"),
          (70L * 16777216 + 8388608, 71L * 16777216, "DE"),
          (130L * 16777216, 131L * 16777216, "JP"))
          .toDF("r_start", "r_end", "country")
          .select(col("r_start"), col("r_end"), col("country"),
            explode(expr("sequence(r_start div 16777216, (r_end - 1) div 16777216)"))
              .as("bucket"))
        // DIALECT-AGNOSTIC octet parse: `split(ip, '\\.')` resolves by
        // NAME through the session function registry (Spark 4's Column
        // API included — functions.split is Column.fn("split")), and a
        // session with the Presto dialect RESIDENT (GraftExtensions, the
        // documented cluster-wide deployment) reads the delimiter as a
        // LITERAL — the regex silently stops splitting (caught by the
        // degenerate-data harness running after ExtensionsSpec installed
        // the dialect on the shared session). 3-arg regexp_extract is
        // the stable form: both dialects build the same RegExpExtract.
        def octet(g: Int) = regexp_extract(col("ip"),
          "^(\\d+)\\.(\\d+)\\.(\\d+)\\.(\\d+)$", g).cast("long")
        val probe = ips.select(col("id"), col("ip"),
          (octet(1) * 16777216L + octet(2) * 65536L
            + octet(3) * 256L + octet(4)).as("ipn"))
          .withColumn("bucket", expr("ipn div 16777216"))
        probe.join(broadcast(cidr), Seq("bucket"))
          .where(col("ipn") >= col("r_start") && col("ipn") < col("r_end"))
          .select(col("id"), col("ip"), col("country"))
          .orderBy("id")
      },
      Some("""WITH ips AS (SELECT c_custkey AS id,
            (10 + (c_custkey % 3) * 60) || '.' || (c_custkey % 256) || '.'
              || ((c_custkey * 7) % 256) || '.' || ((c_custkey * 13) % 256)
              AS ip
          FROM customer),
        cidr(r_start, r_end, country) AS (VALUES
          (CAST(10 AS BIGINT) * 16777216, CAST(10 AS BIGINT) * 16777216 + 8388608, 'US'),
          (CAST(10 AS BIGINT) * 16777216 + 8388608, CAST(11 AS BIGINT) * 16777216, 'CA'),
          (CAST(70 AS BIGINT) * 16777216, CAST(70 AS BIGINT) * 16777216 + 8388608, 'FR'),
          (CAST(70 AS BIGINT) * 16777216 + 8388608, CAST(71 AS BIGINT) * 16777216, 'DE'),
          (CAST(130 AS BIGINT) * 16777216, CAST(131 AS BIGINT) * 16777216, 'JP')),
        p AS (SELECT id, ip,
            CAST(string_split(ip, '.')[1] AS BIGINT) * 16777216
              + CAST(string_split(ip, '.')[2] AS BIGINT) * 65536
              + CAST(string_split(ip, '.')[3] AS BIGINT) * 256
              + CAST(string_split(ip, '.')[4] AS BIGINT) AS ipn
          FROM ips)
        SELECT p.id, p.ip, c.country
        FROM p JOIN cidr c ON p.ipn >= c.r_start AND p.ipn < c.r_end
        ORDER BY p.id""")),

    // TD_LAT_LONG_TO_COUNTRY's engine-side shape with a user-supplied
    // geometry table (the UDF embeds TD's licensed boundary data —
    // documented absence; this is the bring-your-own-table form, boxes
    // standing in for polygons): the 2-D sibling of h33's CIDR bucketing.
    // Each country bounding box expands to the 10°×10° GRID CELLS it
    // covers (a bounded few dozen rows per box), the probe computes its
    // own cell from (lat, lon), and the join is a plain broadcast hash
    // join on the cell id with the point-in-box residual filtered
    // in-bucket. A raw 4-way BETWEEN against the dim would plan a nested
    // loop over every row × every box; cell-bucketing is how geo lookups
    // stay an equi-join at 100 TB (and how real geo indexes — S2/H3/
    // geohash — work, with this grid as their fixed-precision level).
    // Points land on exact .5-degree doubles and boxes on integer
    // degrees, so containment is float-safe and the oracle (which joins
    // the raw boxes — the layout must not change results) hash-matches.
    Q("h34_lat_long_to_country",
      (s, d) => {
        import s.implicits._
        val pts = t(s, d, "customer").select(col("c_custkey").as("id"),
            (((col("c_custkey") * 17) % 140) - 60 + lit(0.5)).as("lat"),
            (((col("c_custkey") * 31) % 360) - 180 + lit(0.5)).as("lon"))
          .withColumn("cell",
            (floor((col("lat") + 90) / 10) * 36
              + floor((col("lon") + 180) / 10)).cast("long"))
        // disjoint half-open [min, max) integer-degree boxes
        val boxes = Seq(
          ("US", 25, 50, -125, -65), ("BR", -35, 5, -75, -35),
          ("RU", 50, 80, 30, 180), ("AU", -45, -10, 110, 155),
          ("IN", 5, 35, 65, 90), ("ZA", -35, -20, 15, 35))
          .toDF("country", "lat_min", "lat_max", "lon_min", "lon_max")
        val dim = boxes
          .select(col("*"), explode(expr(
            "sequence((lat_min + 90) div 10, (lat_max + 90 - 1) div 10)")).as("cy"))
          .select(col("*"), explode(expr(
            "sequence((lon_min + 180) div 10, (lon_max + 180 - 1) div 10)")).as("cx"))
          .withColumn("cell", (col("cy") * 36 + col("cx")).cast("long"))
        pts.join(broadcast(dim), Seq("cell"))
          .where(col("lat") >= col("lat_min") && col("lat") < col("lat_max")
            && col("lon") >= col("lon_min") && col("lon") < col("lon_max"))
          .select(col("id"), col("lat"), col("lon"), col("country"))
          .orderBy("id")
      },
      Some("""WITH p AS (SELECT c_custkey AS id,
            CAST(((c_custkey * 17) % 140) - 60 + 0.5 AS DOUBLE) AS lat,
            CAST(((c_custkey * 31) % 360) - 180 + 0.5 AS DOUBLE) AS lon
          FROM customer),
        b(country, lat_min, lat_max, lon_min, lon_max) AS (VALUES
          ('US', 25, 50, -125, -65), ('BR', -35, 5, -75, -35),
          ('RU', 50, 80, 30, 180), ('AU', -45, -10, 110, 155),
          ('IN', 5, 35, 65, 90), ('ZA', -35, -20, 15, 35))
        SELECT p.id, p.lat, p.lon, b.country
        FROM p JOIN b ON p.lat >= b.lat_min AND p.lat < b.lat_max
          AND p.lon >= b.lon_min AND p.lon < b.lon_max
        ORDER BY p.id""")))
}
