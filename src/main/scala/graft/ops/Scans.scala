package graft.ops

import org.apache.spark.sql.functions._
import graft.Tables._
import graft.functions.Td

/** §3.A — scans / sources / sinks: the CLIENT surface of the reference's
  * `read_td_table` scan builder (projection, time-range pruning, limit —
  * `pandas_td/td.py :: read_td_table`), job-result caching
  * (`:: read_td_job`), catalog listing (`:: Connection.databases/.tables`)
  * and the `to_td` ingest modes (`:: to_td`, `:: StreamingUploader`).
  *
  * Scale notes: a2/a3 exist to prove projection and predicates reach the
  * parquet scan (ReadSchema / PushedFilters) — at 100 TB these are the two
  * highest-leverage optimizations there are; a3's td_time_range is
  * expansion-based precisely so pushdown survives (functions/Td.scala).
  */
object Scans {

  private def sinkDir(tag: String): String = Scratch.unique(tag)

  val all: Seq[Q] = Seq(

    Q("a1_scan_full",
      (s, d) => t(s, d, "nation").orderBy("n_nationkey"),
      Some("SELECT n_nationkey, n_name, n_regionkey FROM nation ORDER BY n_nationkey")),

    // read_td_table(columns=[...]) — column-pruned scan; Catalyst prunes to a
    // 3-column parquet ReadSchema.
    Q("a2_scan_project",
      (s, d) => t(s, d, "lineitem")
        .select("l_orderkey", "l_linenumber", "l_quantity")
        .orderBy("l_orderkey", "l_linenumber", "l_quantity"),
      Some("SELECT l_orderkey, l_linenumber, l_quantity FROM lineitem " +
        "ORDER BY l_orderkey, l_linenumber, l_quantity")),

    // read_td_table(time_range=...) → td_time_range predicate, expanded to a
    // same-type comparison on the raw ts column → parquet row-group skip.
    Q("a3_scan_time_range",
      (s, d) => {
        val ev = events(s, d)
        ev.where(Td.tdTimeRangeEvents(ev, "ts", "2024-01-05", "2024-01-10"))
          .select(col("event_id"), col("ts_ms"), col("event_type"), col("value"))
          .orderBy("event_id")
      },
      Some("SELECT event_id, CAST(epoch_ms(ts) AS BIGINT) AS ts_ms, event_type, value " +
        "FROM events WHERE ts >= TIMESTAMP '2024-01-05 00:00:00' " +
        "AND ts < TIMESTAMP '2024-01-10 00:00:00' ORDER BY event_id")),

    // read_td_table(limit=n) — deterministic via sort: TakeOrderedAndProject,
    // which holds only k rows per partition (no global sort at scale).
    Q("a4_scan_limit",
      (s, d) => t(s, d, "orders")
        .select("o_orderkey", "o_custkey", "o_orderstatus")
        .orderBy("o_orderkey").limit(100),
      Some("SELECT o_orderkey, o_custkey, o_orderstatus FROM orders " +
        "ORDER BY o_orderkey LIMIT 100")),

    // read_td_job analog: a completed result re-served without recompute
    // (persist + materialize, then reuse — SURVEY.md §3.A a5).
    Q("a5_read_job",
      (s, d) => {
        val job = t(s, d, "orders").groupBy("o_orderstatus")
          .agg(count(lit(1)).as("n_orders"))
        job.persist()
        job.count() // materialize once = the "completed job"
        job.orderBy("o_orderstatus") // re-read hits the cache
      },
      Some("SELECT o_orderstatus, count(*) AS n_orders FROM orders " +
        "GROUP BY o_orderstatus ORDER BY o_orderstatus")),

    // Connection.databases()/.tables(db) analog: catalog as a DataFrame of
    // (table_name, n_rows). One UNION-of-aggregates plan — a single Spark
    // job whose per-table counts come from the zero-column parquet scan
    // (row-group metadata), not a driver-side count() loop per table.
    Q("a6_catalog",
      (s, d) =>
        names.map(n => t(s, d, n).agg(count(lit(1)).as("n_rows"))
            .select(lit(n).as("table_name"), col("n_rows")))
          .reduce(_.unionAll(_)).orderBy("table_name"),
      Some(names.sorted.map(n =>
        s"SELECT '$n' AS table_name, count(*) AS n_rows FROM $n")
        .mkString("", " UNION ALL ", " ORDER BY table_name"))),

    // to_td(if_exists='append'): chunked idempotent import → task-committed
    // parquet append; verified by read-back.
    Q("a7_sink_append",
      (s, d) => {
        val out = sinkDir("a7")
        t(s, d, "region").write.mode("append").parquet(out)
        s.read.parquet(out).select("r_regionkey", "r_name").orderBy("r_regionkey")
      },
      Some("SELECT r_regionkey, r_name FROM region ORDER BY r_regionkey")),

    // to_td(if_exists='replace'|'fail'): overwrite twice (second replaces),
    // then errorifexists must throw — swallowed here, asserted in scalatest.
    Q("a8_sink_replace_fail",
      (s, d) => {
        val out = sinkDir("a8")
        val n = t(s, d, "nation")
        n.write.mode("overwrite").parquet(out)
        n.write.mode("overwrite").parquet(out)
        try n.write.mode("errorifexists").parquet(out)
        catch { case _: org.apache.spark.sql.AnalysisException => () }
        s.read.parquet(out).select("n_nationkey", "n_name").orderBy("n_nationkey")
      },
      Some("SELECT n_nationkey, n_name FROM nation ORDER BY n_nationkey")),

    // to_td time synthesis (time_col=): named timestamp column → epoch-second
    // `time` long, TD's mandatory time column (reference `:: to_td`).
    Q("a9_time_synthesis",
      (s, d) => t(s, d, "orders")
        .select(col("o_orderkey"),
          unix_timestamp(col("o_orderdate")).as("time"))
        .orderBy("o_orderkey"),
      Some("SELECT o_orderkey, CAST(epoch(o_orderdate) AS BIGINT) AS time " +
        "FROM orders ORDER BY o_orderkey")),

    // JSON-in-string columns, idiomatic TD: json path extraction.
    Q("a10_source_json",
      (s, d) => events(s, d)
        .select(col("event_id"),
          // try_cast: malformed numeric props are NULL, not an ANSI
          // CAST_INVALID_INPUT job abort (EventsGuardSpec) — TRY_CAST
          // on the oracle side is the same definition
          expr("try_cast(get_json_object(props, '$.k') as bigint)").as("k"))
        .orderBy("event_id"),
      Some("SELECT event_id, TRY_CAST(json_extract_string(props,'$.k') AS BIGINT) AS k " +
        "FROM events ORDER BY event_id")),

    // Source-format parity: the same relation through CSV and JSON-lines
    // writers/readers (schema pinned on read — at scale, inference is a
    // full extra pass). Round-trip must reproduce the parquet source.
    Q("a11_source_csv",
      (s, d) => {
        val out = sinkDir("a11")
        t(s, d, "customer").select("c_custkey", "c_name", "c_mktsegment")
          .write.option("header", "true").mode("overwrite").csv(out)
        s.read.option("header", "true")
          .schema("c_custkey BIGINT, c_name STRING, c_mktsegment STRING")
          .csv(out).orderBy("c_custkey")
      },
      Some("SELECT c_custkey, c_name, c_mktsegment FROM customer ORDER BY c_custkey")),

    Q("a12_source_jsonl",
      (s, d) => {
        val out = sinkDir("a12")
        t(s, d, "supplier").select("s_suppkey", "s_name", "s_nationkey")
          .write.mode("overwrite").json(out)
        s.read.schema("s_suppkey BIGINT, s_name STRING, s_nationkey INT")
          .json(out).orderBy("s_suppkey")
      },
      Some("SELECT s_suppkey, s_name, s_nationkey FROM supplier ORDER BY s_suppkey")),

    Q("a13_source_orc",
      (s, d) => {
        val out = sinkDir("a13")
        t(s, d, "part").select("p_partkey", "p_name", "p_size")
          .write.mode("overwrite").orc(out)
        s.read.orc(out).orderBy("p_partkey")
      },
      Some("SELECT p_partkey, p_name, p_size FROM part ORDER BY p_partkey")),

    // Avro round trip (r13) — the row-oriented interchange format TD's
    // bulk-import path speaks (reference ingest accepts msgpack/JSON; Avro
    // is the Spark-native row-container analog). Built into spark-sql 4.x
    // — no external connector. Schema pinned on read like a11/a12: at
    // 100 TB, container-embedded schemas make inference cheap, but
    // pinning keeps the read path plan-stable across writer versions.
    Q("a27_source_avro",
      (s, d) => {
        val out = sinkDir("a27")
        // this distribution ships AvroFileFormat inside spark-sql but
        // without its DataSourceRegister services entry, so the short
        // name "avro" does not resolve — the class name does
        val avro = "org.apache.spark.sql.avro.AvroFileFormat"
        t(s, d, "region").select("r_regionkey", "r_name")
          .write.mode("overwrite").format(avro).save(out)
        s.read.format(avro).load(out).orderBy("r_regionkey")
      },
      Some("SELECT r_regionkey, r_name FROM region ORDER BY r_regionkey")),

    // (to_avro/from_avro SERDE — the Kafka wire shape — is deliberately
    // absent: this distribution ships only the Avro FILE format inside
    // spark-sql; the serde Catalyst expressions AvroDataToCatalyst/
    // CatalystDataToAvro live in the spark-avro connector jar, which is
    // not on the classpath, and the sql-api stubs throw
    // AVRO_NOT_LOADED_SQL_FUNCTIONS_UNUSABLE. Verified 2026-08-14.)

    // XML round trip (r13) — the document-feed format (Spark 4 ships the
    // former spark-xml as a built-in source). rowTag pins the record
    // element; schema pinned on read (XML inference is a full extra pass
    // AND type-guessy — never at scale).
    Q("a28_source_xml",
      (s, d) => {
        val out = sinkDir("a28")
        t(s, d, "nation").select("n_nationkey", "n_name", "n_regionkey")
          .write.mode("overwrite").option("rowTag", "nation").xml(out)
        s.read.option("rowTag", "nation")
          .schema("n_nationkey BIGINT, n_name STRING, n_regionkey INT")
          .xml(out).orderBy("n_nationkey")
      },
      Some("SELECT n_nationkey, n_name, n_regionkey FROM nation ORDER BY n_nationkey")),

    // SCD2 dimension-history construction (r13 s3) — the warehouse pattern
    // next to a25's MERGE: a change stream collapses into validity
    // intervals. Per user, consecutive duplicate attribute values are
    // dropped (real SCD2's change-detection step, a lag over the (user,
    // time) window), then each surviving change takes
    // [valid_from, valid_to) from its own and the NEXT change's time —
    // a lead over the SAME partitioning/ordering, which the filter
    // preserves, so the whole build is ONE shuffle + one sort; the open
    // row (valid_to null) is the current version. At 100 TB this is the
    // standard one-pass history rebuild; incremental upkeep is a25's
    // MERGE against the open rows.
    Q("a29_scd2_history",
      (s, d) => {
        import org.apache.spark.sql.expressions.Window
        val w = Window.partitionBy("user_id").orderBy("ts_ms", "event_id")
        events(s, d)
          .select(col("event_id"), col("user_id"), col("ts_ms"),
            col("event_type"))
          .withColumn("prev_type", lag(col("event_type"), 1).over(w))
          .where(col("prev_type").isNull ||
            col("prev_type") =!= col("event_type"))
          .withColumn("valid_to", lead(col("ts_ms"), 1).over(w))
          .select(col("user_id"), col("event_type"),
            col("ts_ms").as("valid_from"), col("valid_to"),
            col("valid_to").isNull.as("is_current"))
          .orderBy("user_id", "valid_from", "event_type")
      },
      Some("""WITH e AS (SELECT event_id, user_id,
            CAST(epoch_ms(ts) AS BIGINT) AS ts_ms, event_type FROM events),
        ch AS (SELECT *, lag(event_type) OVER
            (PARTITION BY user_id ORDER BY ts_ms, event_id) AS prev_type
          FROM e),
        sc AS (SELECT * FROM ch
          WHERE prev_type IS NULL OR prev_type <> event_type)
        SELECT user_id, event_type, ts_ms AS valid_from,
          lead(ts_ms) OVER (PARTITION BY user_id ORDER BY ts_ms, event_id)
            AS valid_to,
          (lead(ts_ms) OVER (PARTITION BY user_id ORDER BY ts_ms, event_id)
            IS NULL) AS is_current
        FROM sc ORDER BY user_id, valid_from, event_type""")),

    // Row-level table diff (r13 s3) — the ROW-granularity complement of
    // a23/a24's file-level time travel: given two keyed snapshots, emit
    // each key's change class. One co-partitioned full outer join on the
    // key; row identity compares a single xxhash64 over the value columns
    // (codegen'd, no column-by-column predicate explosion), so at 100 TB
    // the diff moves keys + 8-byte hashes through the shuffle, and the
    // 'unchanged' majority is filtered before any output materializes.
    // v2 derives from v1 deterministically: keys ≡1 (mod 7) update their
    // segment, ≡2 (mod 11) are deleted, and a shifted-key range inserts.
    Q("a30_table_diff",
      (s, d) => {
        val v1 = t(s, d, "customer")
          .select(col("c_custkey").as("k"), col("c_name"), col("c_mktsegment"))
        val v2 = v1.where(col("k") % 11 =!= 2)
          .select(col("k"), col("c_name"),
            when(col("k") % 7 === 1, lit("MOVED")).otherwise(col("c_mktsegment"))
              .as("c_mktsegment"))
          .unionAll(v1.where(col("k") % 13 === 3)
            .select((col("k") + 500000L).as("k"), col("c_name"),
              lit("FRESH").as("c_mktsegment")))
        val h1 = v1.select(col("k"),
          xxhash64(col("c_name"), col("c_mktsegment")).as("h1"))
        val h2 = v2.select(col("k").as("k2"),
          xxhash64(col("c_name"), col("c_mktsegment")).as("h2"))
        h1.join(h2, col("k") === col("k2"), "full_outer")
          .select(coalesce(col("k"), col("k2")).as("k"),
            when(col("k").isNull, "inserted")
              .when(col("k2").isNull, "deleted")
              .when(col("h1") =!= col("h2"), "updated")
              .otherwise("unchanged").as("change"))
          .where(col("change") =!= "unchanged")
          .orderBy("k", "change")
      },
      Some("""WITH v1 AS (SELECT c_custkey AS k, c_name, c_mktsegment
            FROM customer),
        v2 AS (SELECT k, c_name,
            CASE WHEN k % 7 = 1 THEN 'MOVED' ELSE c_mktsegment END AS c_mktsegment
          FROM v1 WHERE k % 11 <> 2
          UNION ALL
          SELECT k + 500000 AS k, c_name, 'FRESH' AS c_mktsegment
          FROM v1 WHERE k % 13 = 3)
        SELECT COALESCE(v1.k, v2.k) AS k,
          CASE WHEN v1.k IS NULL THEN 'inserted'
               WHEN v2.k IS NULL THEN 'deleted'
               WHEN v1.c_name <> v2.c_name
                 OR v1.c_mktsegment <> v2.c_mktsegment THEN 'updated'
               ELSE 'unchanged' END AS change
        FROM v1 FULL OUTER JOIN v2 ON v1.k = v2.k
        WHERE NOT (v1.k IS NOT NULL AND v2.k IS NOT NULL
          AND v1.c_name = v2.c_name AND v1.c_mktsegment = v2.c_mktsegment)
        ORDER BY k, change""")))
}
