package graft.ops

import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.Tables._

/** §3.C — joins. The reference's only client-side join control is
  * `read_td_query(distributed_join=)` toggling Presto broadcast vs
  * partitioned hash join (`pandas_td/td.py :: read_td_query`); c2/c3 map
  * that toggle onto Spark's broadcast hint vs shuffle join hints, and the
  * rest of the ENGINE join surface (outer/semi/anti/cross/theta/as-of) is
  * composed from native operators.
  *
  * Scale notes: dims (nation/region/supplier, and at 100 TB any sub-10GB
  * side) are explicitly `broadcast()` — no shuffle of the fact table.
  * Fact-fact joins (c3) shuffle on the join key once; AQE re-plans skew.
  * The as-of join (c10) is bounded by pre-aggregating per-partition-key
  * candidates, never a cartesian.
  */
object Joins {

  // Shared by c10 (join+window form) and c10b (cogroup merge form).
  // NOTE: declared before `all` — object vals initialize in order.
  val asofOracle =
    """WITH j AS (
        SELECT e.event_id, e.user_id, o.o_orderkey, o.o_orderdate,
          row_number() OVER (PARTITION BY e.event_id
            ORDER BY o.o_orderdate DESC, o.o_orderkey DESC) AS rn
        FROM events e JOIN orders o
          ON e.user_id = o.o_custkey AND o.o_orderdate <= e.ts)
      SELECT event_id, user_id, o_orderkey, strftime(o_orderdate,'%Y-%m-%d') AS o_date
      FROM j WHERE rn = 1 ORDER BY event_id"""

  /** Family-wide as-of ingest (see the contract note above c10): NULL
    * id/key/time rows are dropped on every c10-family form so the four
    * forms stay mutually identical even on null-riddled data. */
  private def asofEvents(s: org.apache.spark.sql.SparkSession, d: String) =
    events(s, d).where(col("event_id").isNotNull &&
      col("user_id").isNotNull && col("ts_ms").isNotNull)
  private def asofOrders(s: org.apache.spark.sql.SparkSession, d: String) =
    t(s, d, "orders").where(col("o_orderkey").isNotNull &&
      col("o_custkey").isNotNull && col("o_orderdate").isNotNull)

  val all: Seq[Q] = Seq(

    // Equi inner join, fact ⋈ dim.
    Q("c1_join_inner",
      (s, d) => {
        val o = t(s, d, "orders"); val c = t(s, d, "customer")
        o.join(c, o("o_custkey") === c("c_custkey"))
          .select("o_orderkey", "c_custkey", "c_name", "o_totalprice")
          .orderBy("o_orderkey")
      },
      Some("""SELECT o_orderkey, c_custkey, c_name, o_totalprice
        FROM orders JOIN customer ON o_custkey = c_custkey ORDER BY o_orderkey""")),

    // distributed_join=False analog: explicit broadcast of the dim side →
    // BroadcastHashJoin, zero shuffle of the left (plan-asserted in tests).
    Q("c2_join_broadcast",
      (s, d) => {
        val su = t(s, d, "supplier"); val n = t(s, d, "nation")
        su.join(broadcast(n), su("s_nationkey") === n("n_nationkey"))
          .select("s_suppkey", "s_name", "n_name")
          .orderBy("s_suppkey")
      },
      Some("""SELECT s_suppkey, s_name, n_name
        FROM supplier JOIN nation ON s_nationkey = n_nationkey ORDER BY s_suppkey""")),

    // distributed_join=True analog: large-large partitioned join — MERGE hint
    // → SortMergeJoin, both sides shuffled on the key exactly once.
    Q("c3_join_shuffle",
      (s, d) => {
        val l = t(s, d, "lineitem").hint("merge")
        val o = t(s, d, "orders")
        l.join(o, l("l_orderkey") === o("o_orderkey"))
          .where(o("o_totalprice") > 400000)
          .select(col("l_orderkey"), col("l_linenumber"),
            dateStr(col("o_orderdate")).as("o_date"))
          .orderBy("l_orderkey", "l_linenumber", "o_date")
      },
      Some("""SELECT l_orderkey, l_linenumber, strftime(o_orderdate,'%Y-%m-%d') AS o_date
        FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        WHERE o_totalprice > 400000 ORDER BY l_orderkey, l_linenumber, o_date""")),

    // LEFT OUTER: every customer, order-less ones null-extended.
    Q("c4_join_left",
      (s, d) => {
        val c = t(s, d, "customer")
        val o = t(s, d, "orders").where(col("o_orderdate") >= tsLit("2001-01-01"))
        c.join(o, c("c_custkey") === o("o_custkey"), "left")
          .select(col("c_custkey"), col("o_orderkey"))
          .orderBy(asc("c_custkey"), asc_nulls_first("o_orderkey"))
      },
      Some("""SELECT c_custkey, o_orderkey FROM customer
        LEFT JOIN (SELECT * FROM orders WHERE o_orderdate >= TIMESTAMP '2001-01-01') o
        ON c_custkey = o_custkey
        ORDER BY c_custkey, o_orderkey NULLS FIRST""")),

    // FULL OUTER with unmatched rows on both sides.
    Q("c5_join_full",
      (s, d) => {
        val c = t(s, d, "customer").where(col("c_custkey") < 100)
        val o = t(s, d, "orders")
          .where(col("o_custkey") >= 50 && col("o_custkey") < 150)
        c.join(o, c("c_custkey") === o("o_custkey"), "full")
          .select(col("c_custkey"), col("o_custkey"), col("o_orderkey"))
          .orderBy(asc_nulls_first("c_custkey"), asc_nulls_first("o_custkey"),
            asc_nulls_first("o_orderkey"))
      },
      Some("""SELECT c_custkey, o_custkey, o_orderkey
        FROM (SELECT * FROM customer WHERE c_custkey < 100) c
        FULL JOIN (SELECT * FROM orders WHERE o_custkey >= 50 AND o_custkey < 150) o
        ON c_custkey = o_custkey
        ORDER BY c_custkey NULLS FIRST, o_custkey NULLS FIRST, o_orderkey NULLS FIRST""")),

    // EXISTS → left-semi (no row multiplication, right side reduced to keys).
    Q("c6_join_semi",
      (s, d) => {
        val c = t(s, d, "customer")
        val o = t(s, d, "orders").where(col("o_totalprice") > 450000)
        c.join(o, c("c_custkey") === o("o_custkey"), "left_semi")
          .select("c_custkey", "c_name").orderBy("c_custkey")
      },
      Some("""SELECT c_custkey, c_name FROM customer WHERE EXISTS
        (SELECT 1 FROM orders WHERE o_custkey = c_custkey AND o_totalprice > 450000)
        ORDER BY c_custkey""")),

    // NOT EXISTS → left-anti.
    Q("c7_join_anti",
      (s, d) => {
        val c = t(s, d, "customer")
        val o = t(s, d, "orders").where(col("o_orderdate") >= tsLit("2001-01-01"))
        c.join(o, c("c_custkey") === o("o_custkey"), "left_anti")
          .select("c_custkey", "c_name").orderBy("c_custkey")
      },
      Some("""SELECT c_custkey, c_name FROM customer WHERE NOT EXISTS
        (SELECT 1 FROM orders WHERE o_custkey = c_custkey
         AND o_orderdate >= TIMESTAMP '2001-01-01')
        ORDER BY c_custkey""")),

    // CROSS JOIN (dims only — 125 rows; never cross facts).
    Q("c8_join_cross",
      (s, d) => t(s, d, "nation").crossJoin(t(s, d, "region"))
        .select("n_nationkey", "r_regionkey", "n_name", "r_name")
        .orderBy("n_nationkey", "r_regionkey"),
      Some("""SELECT n_nationkey, r_regionkey, n_name, r_name
        FROM nation CROSS JOIN region ORDER BY n_nationkey, r_regionkey""")),

    // Theta join: equi key + range band — stays a hash/merge join on the equi
    // key with the band as a residual condition (never a nested-loop).
    Q("c9_join_theta",
      (s, d) => {
        val l = t(s, d, "lineitem"); val o = t(s, d, "orders")
        l.join(o, l("l_orderkey") === o("o_orderkey")
            && l("l_shipdate") >= o("o_orderdate")
            && l("l_shipdate") <= o("o_orderdate") + expr("INTERVAL 90 DAY"))
          .select(col("l_orderkey"), col("l_linenumber"),
            dateStr(col("l_shipdate")).as("ship"), dateStr(col("o_orderdate")).as("odate"))
          .orderBy("l_orderkey", "l_linenumber", "ship", "odate")
      },
      Some("""SELECT l_orderkey, l_linenumber, strftime(l_shipdate,'%Y-%m-%d') AS ship,
        strftime(o_orderdate,'%Y-%m-%d') AS odate
        FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        AND l_shipdate >= o_orderdate AND l_shipdate <= o_orderdate + INTERVAL 90 DAY
        ORDER BY l_orderkey, l_linenumber, ship, odate""")),

    // Shared as-of ingest for the c10 family (c10/c10b/c10c/c10d — ONE
    // oracle; results must be identical across all four forms): rows
    // whose event id, key, or time is NULL are dropped at ingest on
    // EVERY form (dead-letter posture), so the family's mutual identity
    // holds even on null-riddled data where the forms' native null
    // behaviors would otherwise diverge — c10's window would lump NULL
    // event_ids into ONE group, c10b's typed tuples reject them, the
    // custom exec's long columns cannot carry them (r20 review finding).
    // The shared oracle grades the null-free driver fixtures; on hostile
    // data this ingest rule IS the family contract.

    // As-of join: each event ↦ latest order at-or-before its timestamp for
    // that customer (TD windowed-subquery idiom, SURVEY.md §3.C c10):
    // range join on the partition key, then row_number()=1. The range join
    // shuffles both sides on the key once; candidates per event are bounded
    // by orders-per-customer, not table size.
    Q("c10_join_asof",
      (s, d) => {
        val e = asofEvents(s, d).select("event_id", "user_id", "ts_t")
        val o = asofOrders(s, d).select("o_orderkey", "o_custkey", "o_orderdate")
        val j = e.join(o, e("user_id") === o("o_custkey") && o("o_orderdate") <= e("ts_t"))
        val w = Window.partitionBy("event_id")
          .orderBy(desc("o_orderdate"), desc("o_orderkey"))
        j.withColumn("rn", row_number().over(w)).where(col("rn") === 1)
          .select(col("event_id"), col("user_id"), col("o_orderkey"),
            dateStr(col("o_orderdate")).as("o_date"))
          .orderBy("event_id")
      },
      Some(asofOracle)),

    // As-of join, cogroup form — the 100 TB algorithm: one shuffle per side
    // on the partition key, then a per-key two-pointer merge over the two
    // SORTED sides. The join+window form (c10) materializes every
    // (event × qualifying order) candidate before row_number()=1 — with k
    // candidates per event that's a k× blowup this form never creates.
    // Per-key memory is bounded by that key's rows (the cogroup contract).
    // Same oracle as c10: results must be identical.
    Q("c10b_join_asof_cogroup",
      (s, d) => {
        import s.implicits._
        // family ingest filter (see asofEvents): also what lets the
        // primitive tuple encoder hold the rows (r20 null-riddled sweep)
        val ev = asofEvents(s, d)
          .select(col("event_id"), col("user_id"), col("ts_ms"))
          .as[(Long, Long, Long)]
        val ord = asofOrders(s, d)
          .select(col("o_orderkey"), col("o_custkey"),
            // parquet ms timestamps read as TIMESTAMP_NTZ; session is UTC so
            // the cast to (ltz) timestamp is value-preserving
            expr("unix_millis(cast(o_orderdate as timestamp))").as("odate_ms"))
          .as[(Long, Long, Long)]
        ev.groupByKey(_._2).cogroup(ord.groupByKey(_._2)) { (key, evIt, ordIt) =>
          // ascending (odate, orderkey): the element before the pointer is
          // exactly the row_number()=1 winner of (odate DESC, orderkey DESC)
          val ords = ordIt.toArray.sortBy(o => (o._3, o._1))
          val evs = evIt.toArray.sortBy(e => (e._3, e._1))
          var i = 0
          evs.iterator.flatMap { case (eid, _, ts) =>
            while (i < ords.length && ords(i)._3 <= ts) i += 1
            if (i == 0) Iterator.empty
            else {
              val o = ords(i - 1)
              // LocalDate.toString is ISO yyyy-MM-dd
              val date = java.time.Instant.ofEpochMilli(o._3)
                .atZone(java.time.ZoneOffset.UTC).toLocalDate.toString
              Iterator((eid, key, o._1, date))
            }
          }
        }.toDF("event_id", "user_id", "o_orderkey", "o_date")
          .orderBy("event_id")
      },
      Some(asofOracle)),

    // As-of join through the CUSTOM PHYSICAL OPERATOR (graft.plans.AsOf):
    // logical node -> planner strategy -> exec with declared clustering +
    // ordering requirements and an O(|L|+|R|), O(1)-memory streaming
    // merge per partition. Must hash-match the same oracle as c10/c10b.
    Q("c10c_join_asof_native",
      (s, d) => {
        val ev = asofEvents(s, d).select(col("event_id"), col("user_id"), col("ts_ms"))
        val ord = asofOrders(s, d).select(col("o_orderkey"), col("o_custkey"),
          expr("unix_millis(cast(o_orderdate as timestamp))").as("odate_ms"))
        graft.plans.AsOf.join(ev, ord,
            "user_id", "o_custkey", "ts_ms", "odate_ms", "o_orderkey")
          .select(col("event_id"), col("user_id"), col("o_orderkey"),
            date_format(expr("timestamp_millis(odate_ms)"), "yyyy-MM-dd").as("o_date"))
          .orderBy("event_id")
      },
      Some(asofOracle)),

    // The same custom operator driven through its pandas-merge_asof parity
    // surface: direction=forward (first order AT/after the event), a 7-day
    // tolerance, and left-outer emission (events with no order inside the
    // window survive with nulls — pandas' default). Oracle computed in the
    // identical epoch-ms domain.
    Q("c10d_join_asof_forward",
      (s, d) => {
        val ev = asofEvents(s, d).select(col("event_id"), col("user_id"), col("ts_ms"))
        val ord = asofOrders(s, d).select(col("o_orderkey"), col("o_custkey"),
          expr("unix_millis(cast(o_orderdate as timestamp))").as("odate_ms"))
        graft.plans.AsOf.join(ev, ord,
            "user_id", "o_custkey", "ts_ms", "odate_ms", "o_orderkey",
            direction = "forward", tolerance = 7L * 24 * 3600 * 1000,
            leftOuter = true)
          .select(col("event_id"), col("user_id"), col("o_orderkey"),
            col("odate_ms"))
          .orderBy("event_id")
      },
      Some("""WITH e AS (SELECT event_id, user_id,
            CAST(epoch_ms(ts) AS BIGINT) AS ts_ms FROM events),
          o AS (SELECT o_orderkey, o_custkey,
            CAST(epoch_ms(CAST(o_orderdate AS TIMESTAMP)) AS BIGINT) AS odate_ms
            FROM orders),
          j AS (SELECT e.event_id, o.o_orderkey, o.odate_ms,
            row_number() OVER (PARTITION BY e.event_id
              ORDER BY o.odate_ms, o.o_orderkey) AS rn
          FROM e JOIN o ON e.user_id = o.o_custkey
            AND o.odate_ms >= e.ts_ms
            AND o.odate_ms - e.ts_ms <= 604800000)
        SELECT e.event_id, e.user_id, j.o_orderkey, j.odate_ms
        FROM e LEFT JOIN (SELECT * FROM j WHERE rn = 1) j USING (event_id)
        ORDER BY event_id""")),

    // Keyed interval-overlap join via the second custom physical operator
    // (graft.plans.IntervalJoin): event activity windows [ts, ts+1h) ⋈
    // order fulfillment windows [odate, odate+2d) per user — an active-set
    // sweep (O(n+m+output)) where Spark's native shape is SMJ + post-join
    // filter over every same-key pair. c12b is that composable twin; both
    // hash-match this oracle.
    Q("c12_join_interval",
      (s, d) => {
        val l = events(s, d).select(col("event_id"), col("user_id"),
          col("ts_ms").as("l_s"), (col("ts_ms") + 21600000L).as("l_e"))
        val r = events(s, d).select(col("event_id").as("b_event_id"),
          col("user_id").as("b_user"), col("ts_ms").as("r_s"),
          (col("ts_ms") + 21600000L).as("r_e"))
        graft.plans.IntervalJoin.join(l, r,
            "user_id", "b_user", "l_s", "l_e", "r_s", "r_e")
          .where(col("event_id") < col("b_event_id"))
          .select(col("event_id").as("a_id"), col("b_event_id").as("b_id"))
          .orderBy("a_id", "b_id")
      },
      Some(intervalOracle)),

    // Composable twin of c12: equi-join on the key + range conditions →
    // Catalyst plans SMJ with the ranges as a post-join filter.
    Q("c12b_join_interval_smj",
      (s, d) => {
        val l = events(s, d).select(col("event_id"), col("user_id"),
          col("ts_ms").as("l_s"), (col("ts_ms") + 21600000L).as("l_e"))
        val r = events(s, d).select(col("event_id").as("b_event_id"),
          col("user_id").as("b_user"), col("ts_ms").as("r_s"),
          (col("ts_ms") + 21600000L).as("r_e"))
        l.join(r, col("user_id") === col("b_user")
            && col("r_s") < col("l_e") && col("r_e") > col("l_s")
            && col("event_id") < col("b_event_id"))
          .select(col("event_id").as("a_id"), col("b_event_id").as("b_id"))
          .orderBy("a_id", "b_id")
      },
      Some(intervalOracle))
  )

  /** Shared by c12 (custom sweep exec) and c12b (SMJ+filter twin):
    * overlapping 6-hour activity windows of the same user. */
  lazy val intervalOracle: String =
    """WITH e AS (SELECT event_id, user_id,
          CAST(epoch_ms(ts) AS BIGINT) AS s,
          CAST(epoch_ms(ts) AS BIGINT) + 21600000 AS en FROM events)
      SELECT a.event_id AS a_id, b.event_id AS b_id
      FROM e a JOIN e b ON a.user_id = b.user_id
        AND b.s < a.en AND b.en > a.s
        AND a.event_id < b.event_id
      ORDER BY a_id, b_id"""
}
