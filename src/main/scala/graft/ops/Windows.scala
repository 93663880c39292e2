package graft.ops

import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.Tables._

/** §3.E/§3.F — window functions and sorts/top-k (ENGINE surface; also TD's
  * `TD_X_RANK` top-k-per-group Hive idiom, e7).
  *
  * Scale notes: window partitions shuffle once on the partition key; every
  * window here orders by a total order (tie-broken on a unique key) so
  * results are deterministic. Global top-k (f2) is TakeOrderedAndProject —
  * k rows per partition, no full sort. Window ints are cast to long to
  * match DuckDB's BIGINT window results.
  */
object Windows {

  val all: Seq[Q] = Seq(

    Q("e1_win_rank",
      (s, d) => {
        val w = Window.partitionBy("o_custkey").orderBy(col("o_orderdate"), col("o_orderkey"))
        t(s, d, "orders")
          .withColumn("rn", row_number().over(w).cast("long"))
          .withColumn("rk", rank().over(w).cast("long"))
          .withColumn("drk", dense_rank().over(w).cast("long"))
          .select("o_custkey", "o_orderkey", "rn", "rk", "drk")
          .orderBy("o_custkey", "o_orderkey")
      },
      Some("""SELECT o_custkey, o_orderkey,
        row_number() OVER w AS rn, rank() OVER w AS rk, dense_rank() OVER w AS drk
        FROM orders WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey)
        ORDER BY o_custkey, o_orderkey""")),

    Q("e2_win_lag_lead",
      (s, d) => {
        val w = Window.partitionBy("user_id").orderBy(col("ts_ms"), col("event_id"))
        events(s, d)
          .withColumn("prev_v", lag(col("value"), 1).over(w))
          .withColumn("next_v", lead(col("value"), 1).over(w))
          .select("event_id", "user_id", "value", "prev_v", "next_v")
          .orderBy("event_id")
      },
      Some("""SELECT event_id, user_id, value,
        lag(value) OVER w AS prev_v, lead(value) OVER w AS next_v
        FROM events WINDOW w AS (PARTITION BY user_id
          ORDER BY CAST(epoch_ms(ts) AS BIGINT), event_id)
        ORDER BY event_id""")),

    // Running total — exact decimal accumulation inside the frame.
    Q("e3_win_runsum",
      (s, d) => {
        val w = Window.partitionBy("o_custkey")
          .orderBy(col("o_orderdate"), col("o_orderkey"))
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        t(s, d, "orders")
          .withColumn("run_total", round(sum(dec(col("o_totalprice"))).over(w), 4).cast("double"))
          .select("o_custkey", "o_orderkey", "run_total")
          .orderBy("o_custkey", "o_orderkey")
      },
      Some("""SELECT o_custkey, o_orderkey,
        CAST(ROUND(SUM(CAST(o_totalprice AS DECIMAL(18,4))) OVER w, 4) AS DOUBLE) AS run_total
        FROM orders WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
        ORDER BY o_custkey, o_orderkey""")),

    // Moving average over the 7 most recent rows — sum/count form so both
    // engines do identical double arithmetic (SURVEY.md §8.4).
    Q("e4_win_moving",
      (s, d) => {
        val w = Window.partitionBy("user_id").orderBy(col("ts_ms"), col("event_id"))
          .rowsBetween(-6, 0)
        events(s, d)
          .withColumn("mavg",
            round(sum(dec(col("value"))).over(w).cast("double") / count(lit(1)).over(w), 4))
          .select("event_id", "user_id", "mavg")
          .orderBy("event_id")
      },
      Some("""SELECT event_id, user_id,
        ROUND(CAST(SUM(CAST(value AS DECIMAL(18,4))) OVER w AS DOUBLE) / (COUNT(*) OVER w), 4) AS mavg
        FROM events WINDOW w AS (PARTITION BY user_id
          ORDER BY CAST(epoch_ms(ts) AS BIGINT), event_id
          ROWS BETWEEN 6 PRECEDING AND CURRENT ROW)
        ORDER BY event_id""")),

    // first_value/last_value with the explicit full-partition frame (the
    // default frame would make last_value = current row — the classic trap).
    Q("e5_win_first_last",
      (s, d) => {
        val w = Window.partitionBy("o_custkey")
          .orderBy(col("o_orderdate"), col("o_orderkey"))
          .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
        t(s, d, "orders")
          .withColumn("first_ok", first(col("o_orderkey")).over(w))
          .withColumn("last_ok", last(col("o_orderkey")).over(w))
          .select("o_custkey", "first_ok", "last_ok").distinct()
          .orderBy("o_custkey")
      },
      Some("""SELECT DISTINCT o_custkey,
        first_value(o_orderkey) OVER w AS first_ok, last_value(o_orderkey) OVER w AS last_ok
        FROM orders WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
          ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)
        ORDER BY o_custkey""")),

    Q("e6_win_ntile",
      (s, d) => {
        val w = Window.orderBy(col("c_acctbal"), col("c_custkey"))
        t(s, d, "customer")
          .withColumn("quartile", ntile(4).over(w).cast("long"))
          .select("c_custkey", "c_acctbal", "quartile")
          .orderBy("c_custkey")
      },
      Some("""SELECT c_custkey, c_acctbal, ntile(4) OVER (ORDER BY c_acctbal, c_custkey) AS quartile
        FROM customer ORDER BY c_custkey""")),

    // Top-k per group (TD_X_RANK idiom): row_number filter — partial
    // evaluation means only k rows per group survive the window stage.
    Q("e7_topk_per_group",
      (s, d) => {
        val w = Window.partitionBy("o_custkey")
          .orderBy(desc("o_totalprice"), asc("o_orderkey"))
        t(s, d, "orders")
          .withColumn("rn", row_number().over(w).cast("long"))
          .where(col("rn") <= 2)
          .select("o_custkey", "o_orderkey", "o_totalprice", "rn")
          .orderBy("o_custkey", "rn")
      },
      Some("""SELECT o_custkey, o_orderkey, o_totalprice, rn FROM (
          SELECT o_custkey, o_orderkey, o_totalprice,
            row_number() OVER (PARTITION BY o_custkey
              ORDER BY o_totalprice DESC, o_orderkey) AS rn
          FROM orders) WHERE rn <= 2
        ORDER BY o_custkey, rn""")),

    // Value-based RANGE frame: all orders of the customer within ±30 days
    // of each row's date count toward the frame (not row offsets).
    Q("e8_win_range_frame",
      (s, d) => {
        val days30 = 30L * 24 * 3600 * 1000
        val w = Window.partitionBy("o_custkey")
          .orderBy(col("odate_ms"))
          .rangeBetween(-days30, days30)
        t(s, d, "orders")
          .withColumn("odate_ms", expr("unix_millis(cast(o_orderdate as timestamp))"))
          .withColumn("n_near", count(lit(1)).over(w))
          .withColumn("near_total", round(sum(dec(col("o_totalprice"))).over(w), 4).cast("double"))
          .select("o_custkey", "o_orderkey", "n_near", "near_total")
          .orderBy("o_custkey", "o_orderkey")
      },
      Some("""SELECT o_custkey, o_orderkey,
        COUNT(*) OVER w AS n_near,
        CAST(ROUND(SUM(CAST(o_totalprice AS DECIMAL(18,4))) OVER w, 4) AS DOUBLE) AS near_total
        FROM orders WINDOW w AS (PARTITION BY o_custkey
          ORDER BY CAST(epoch_ms(o_orderdate) AS BIGINT)
          RANGE BETWEEN 2592000000 PRECEDING AND 2592000000 FOLLOWING)
        ORDER BY o_custkey, o_orderkey""")),

    // Distribution windows: percent_rank / cume_dist over a total order.
    Q("e9_win_distribution",
      (s, d) => {
        val w = Window.orderBy(col("o_totalprice"), col("o_orderkey"))
        t(s, d, "orders")
          .select(col("o_orderkey"),
            round(percent_rank().over(w), 6).as("pr"),
            round(cume_dist().over(w), 6).as("cd"))
          .orderBy("o_orderkey")
      },
      Some("""SELECT o_orderkey,
        ROUND(percent_rank() OVER (ORDER BY o_totalprice, o_orderkey), 6) AS pr,
        ROUND(cume_dist() OVER (ORDER BY o_totalprice, o_orderkey), 6) AS cd
        FROM orders ORDER BY o_orderkey""")),

    // nth_value + lead IGNORE NULLS over sparse readings (nulls synthesized
    // as in h15): positional picks inside a partition-wide frame and
    // null-skipping lookahead — the sensor-repair window pair to h15's LOCF.
    Q("e10_win_nth",
      (s, d) => {
        val w = Window.partitionBy("user_id").orderBy("ts_ms", "event_id")
        val wFull = w.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
        events(s, d)
          .select(col("event_id"), col("user_id"), col("ts_ms"),
            when(col("event_type") === "click", col("value")).as("reading"))
          .select(col("event_id"), col("user_id"),
            round(nth_value(col("reading"), 3, ignoreNulls = true).over(wFull), 4)
              .as("third_reading"),
            round(lead(col("reading"), 1, null, ignoreNulls = true).over(w), 4)
              .as("next_reading"))
          .orderBy("event_id")
      },
      Some("""WITH e AS (SELECT event_id, user_id, CAST(epoch_ms(ts) AS BIGINT) AS ts_ms,
            CASE WHEN event_type = 'click' THEN value END AS reading
          FROM events)
        SELECT event_id, user_id,
          ROUND(nth_value(reading, 3 IGNORE NULLS) OVER (
            PARTITION BY user_id ORDER BY ts_ms, event_id
            ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING), 4) AS third_reading,
          ROUND(lead(reading, 1 IGNORE NULLS) OVER (
            PARTITION BY user_id ORDER BY ts_ms, event_id), 4) AS next_reading
        FROM e ORDER BY event_id""")),

    // Windowed COUNT DISTINCT — a surface Spark rejects outright
    // (`COUNT(DISTINCT …) OVER` is unsupported in the engine): the
    // engine-native idiom is size(collect_set() OVER), which the
    // aggregate-buffer path evaluates per frame. Running flavor: distinct
    // event types seen per user UP TO each event (cumulative vocabulary);
    // whole-partition flavor: the user's total distinct types on every
    // row. Both frames share the one (user, time) sort. At scale the set
    // is bounded by the attribute's cardinality (event types ≈ enum), the
    // same calendar/enum-bounded-state argument as h31 — this idiom is NOT
    // for high-cardinality values (there the d7/d19 HLL sketches are the
    // tool).
    Q("e12_win_count_distinct",
      (s, d) => {
        val w = Window.partitionBy("user_id").orderBy("ts_ms", "event_id")
        events(s, d)
          .select(col("event_id"), col("user_id"), col("ts_ms"), col("event_type"))
          .select(col("event_id"), col("user_id"),
            size(collect_set(col("event_type"))
              .over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
              .cast("long").as("types_so_far"),
            size(collect_set(col("event_type"))
              .over(w.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)))
              .cast("long").as("types_total"))
          .orderBy("event_id")
      },
      Some("""WITH e AS (SELECT event_id, user_id,
            CAST(epoch_ms(ts) AS BIGINT) AS ts_ms, event_type FROM events)
        SELECT event_id, user_id,
          CAST(COUNT(DISTINCT event_type) OVER (
            PARTITION BY user_id ORDER BY ts_ms, event_id
            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
            AS types_so_far,
          CAST(COUNT(DISTINCT event_type) OVER (
            PARTITION BY user_id) AS BIGINT) AS types_total
        FROM e ORDER BY event_id""")),

    // Multi-key sort with explicit NULL placement (testdata has no NULLs —
    // synthesized via CASE, FIXTURES.md gotcha 2).
    Q("f1_sort_multi",
      (s, d) => t(s, d, "orders")
        .select(col("o_orderkey"),
          when(col("o_orderstatus") === "P", lit(null)).otherwise(col("o_orderstatus")).as("st"),
          col("o_totalprice"))
        .orderBy(asc_nulls_last("st"), desc("o_totalprice"), asc("o_orderkey")),
      Some("""SELECT o_orderkey,
        CASE WHEN o_orderstatus = 'P' THEN NULL ELSE o_orderstatus END AS st, o_totalprice
        FROM orders ORDER BY st ASC NULLS LAST, o_totalprice DESC, o_orderkey""")),

    // Global top-k: ORDER BY + LIMIT → TakeOrderedAndProject.
    Q("f2_topk_global",
      (s, d) => t(s, d, "orders")
        .select("o_orderkey", "o_custkey", "o_totalprice")
        .orderBy(desc("o_totalprice"), asc("o_orderkey")).limit(10),
      Some("""SELECT o_orderkey, o_custkey, o_totalprice FROM orders
        ORDER BY o_totalprice DESC, o_orderkey LIMIT 10""")))
}
