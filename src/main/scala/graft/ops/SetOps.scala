package graft.ops

import org.apache.spark.sql.functions._
import graft.Tables._

/** §3.G — set operations (ENGINE surface). UNION ALL is a free concat;
  * UNION/INTERSECT/EXCEPT each cost one hash shuffle on the full row — at
  * scale prefer pre-projecting to the minimal key set first (done here).
  */
object SetOps {

  private val jan15 = epochMs("2024-01-15")

  val all: Seq[Q] = Seq(

    // UNION ALL — duplicates kept (early events ∪ all errors overlap).
    Q("g1_union_all",
      (s, d) => {
        val e = events(s, d)
        val a = e.where(col("ts_ms") < jan15).select("event_id", "event_type")
        val b = e.where(col("event_type") === "error").select("event_id", "event_type")
        a.unionAll(b).orderBy("event_id", "event_type")
      },
      Some(s"""SELECT event_id, event_type FROM (
          SELECT event_id, event_type FROM events WHERE CAST(epoch_ms(ts) AS BIGINT) < $jan15
          UNION ALL
          SELECT event_id, event_type FROM events WHERE event_type = 'error')
        ORDER BY event_id, event_type""")),

    // UNION (distinct) — dedup of the same overlap.
    Q("g2_union_distinct",
      (s, d) => {
        val e = events(s, d)
        val a = e.where(col("ts_ms") < jan15).select("event_id", "event_type")
        val b = e.where(col("event_type") === "error").select("event_id", "event_type")
        a.union(b).distinct().orderBy("event_id", "event_type")
      },
      Some(s"""SELECT event_id, event_type FROM (
          SELECT event_id, event_type FROM events WHERE CAST(epoch_ms(ts) AS BIGINT) < $jan15
          UNION
          SELECT event_id, event_type FROM events WHERE event_type = 'error')
        ORDER BY event_id, event_type""")),

    // INTERSECT: BUILDING-segment customers ∩ big-spender customers.
    Q("g3_intersect",
      (s, d) => {
        val a = t(s, d, "customer").where(col("c_mktsegment") === "BUILDING")
          .select(col("c_custkey").as("k"))
        val b = t(s, d, "orders").where(col("o_totalprice") > 400000)
          .select(col("o_custkey").as("k"))
        a.intersect(b).orderBy("k")
      },
      Some("""SELECT c_custkey AS k FROM customer WHERE c_mktsegment = 'BUILDING'
        INTERSECT
        SELECT o_custkey AS k FROM orders WHERE o_totalprice > 400000
        ORDER BY k""")),

    // EXCEPT: BUILDING-segment customers minus big spenders.
    Q("g4_except",
      (s, d) => {
        val a = t(s, d, "customer").where(col("c_mktsegment") === "BUILDING")
          .select(col("c_custkey").as("k"))
        val b = t(s, d, "orders").where(col("o_totalprice") > 400000)
          .select(col("o_custkey").as("k"))
        a.except(b).orderBy("k")
      },
      Some("""SELECT c_custkey AS k FROM customer WHERE c_mktsegment = 'BUILDING'
        EXCEPT
        SELECT o_custkey AS k FROM orders WHERE o_totalprice > 400000
        ORDER BY k""")),

    // Multiset (bag) semantics: occurrences count — EXCEPT ALL keeps one
    // order occurrence per customer beyond the event-occurrence count.
    Q("g5_except_all",
      (s, d) => {
        val a = t(s, d, "orders").select(col("o_custkey").as("k"))
        val b = events(s, d).select(col("user_id").as("k"))
        a.exceptAll(b).orderBy("k")
      },
      Some("""SELECT o_custkey AS k FROM orders
        EXCEPT ALL
        SELECT user_id AS k FROM events
        ORDER BY k""")),

    Q("g6_intersect_all",
      (s, d) => {
        val a = t(s, d, "orders").select(col("o_custkey").as("k"))
        val b = events(s, d).select(col("user_id").as("k"))
        a.intersectAll(b).orderBy("k")
      },
      Some("""SELECT o_custkey AS k FROM orders
        INTERSECT ALL
        SELECT user_id AS k FROM events
        ORDER BY k""")))
}
