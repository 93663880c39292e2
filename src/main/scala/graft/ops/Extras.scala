package graft.ops

import org.apache.spark.sql.functions._
import graft.Tables._
import graft.functions.WeightedMean
import graft.multimodal.MultiModal
import graft.streaming.Streams

/** Remaining §3 surfaces: real streaming ops (i4–i6, graft.streaming), the
  * typed UDAF (k2, graft.functions.WeightedMean) and the multimodal
  * decode-stub pipeline (m2, graft.multimodal). k1 (scalar UDF surface) is
  * exercised by h3's registered td_time_range; k3 (generator/UDTF) by
  * j4/j7's explode/posexplode.
  */
object Extras {

  val all: Seq[Q] = Seq(

    // Watermark + append-mode tumbling agg with late-data drop; the oracle
    // is the full batch aggregation — it only matches because the sentinel
    // flushed every window AND the re-sent late rows were dropped.
    Q("i4_watermark_late",
      (s, d) => Streams.i4(s, d),
      Some("""SELECT (CAST(epoch_ms(ts) AS BIGINT) // 3600000) * 3600000 AS w_start,
        event_type, COUNT(*) AS n,
        CAST(ROUND(SUM(CAST(value AS DECIMAL(18,4))),4) AS DOUBLE) AS sum_v
        FROM events GROUP BY 1, 2 ORDER BY w_start, event_type""")),

    // Stream dedup on event_id over a doubled stream → distinct events.
    Q("i5_stream_dedup",
      (s, d) => Streams.i5(s, d),
      Some("SELECT event_id, user_id FROM events ORDER BY event_id")),

    // foreachBatch idempotent ingest; read-back equals the source.
    Q("i6_stream_ingest",
      (s, d) => Streams.i6(s, d),
      Some("""SELECT event_id, CAST(epoch_ms(ts) AS BIGINT) // 1000 AS time, user_id
        FROM events ORDER BY event_id""")),

    // Streaming sessionize with custom state (flatMapGroupsWithState +
    // event-time timeout): closed sessions stream out append-mode and the
    // final flush comes from state timeout — must hash-match the batch
    // session_window oracle (i3).
    Q("i7_stateful_sessionize",
      (s, d) => Streams.i7(s, d),
      Some(StreamingBatch.i3Oracle)),

    // Watermarked stream-stream interval join (follow-up events within
    // 5 min per user); ms-precision event time makes the join boundary
    // exactly the oracle's epoch_ms arithmetic.
    Q("i8_stream_stream_join",
      (s, d) => Streams.i8(s, d),
      Some("""SELECT a.event_id AS a_id, b.event_id AS b_id, a.user_id
        FROM events a JOIN events b ON a.user_id = b.user_id
        AND CAST(epoch_ms(b.ts) AS BIGINT) >= CAST(epoch_ms(a.ts) AS BIGINT)
        AND CAST(epoch_ms(b.ts) AS BIGINT) <= CAST(epoch_ms(a.ts) AS BIGINT) + 300000
        AND a.event_id != b.event_id
        ORDER BY a_id, b_id""")),

    // Sessionize again through Spark 4's transformWithState (typed
    // ValueState + explicit event-time timers, RocksDB state store) — the
    // successor API to i7's flatMapGroupsWithState; same i3 oracle.
    Q("i10_transform_with_state",
      (s, d) => Streams.i10(s, d),
      Some(StreamingBatch.i3Oracle)),

    // Stream-static broadcast enrichment; output equals the batch join.
    Q("i9_stream_static_join",
      (s, d) => Streams.i9(s, d),
      Some("""SELECT event_id, c_name, c_mktsegment
        FROM events JOIN customer ON user_id = c_custkey ORDER BY event_id""")),

    // Streaming keyed upsert (MERGE-INTO pattern on raw parquet with an
    // atomic directory swap): final state table == latest event per user.
    Q("i11_stream_upsert",
      (s, d) => Streams.i11(s, d),
      Some("""WITH r AS (SELECT user_id, event_id, CAST(epoch_ms(ts) AS BIGINT) AS ts_ms,
          row_number() OVER (PARTITION BY user_id
            ORDER BY epoch_ms(ts) DESC, event_id DESC) AS rn
        FROM events)
        SELECT user_id, event_id AS last_event_id, ts_ms AS last_ts_ms
        FROM r WHERE rn = 1 ORDER BY user_id""")),

    // Streaming SCD2 maintenance (CDC apply): per batch, only (open rows ∪
    // batch changes) re-run the a29 lag/lead window; closed history
    // accumulates untouched behind the i11 swap commit. Final table ==
    // the batch a29 rebuild — same oracle, same ordering.
    Q("i19_stream_scd2",
      (s, d) => Streams.i19(s, d),
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

    // Streaming maintenance of the d22 per-hour HLL sketch table: each
    // micro-batch merges its partial sketches into the committed sketch
    // relation (hll_union_agg) and commits a new version — O(batch) +
    // O(hours × sketch bytes) per batch, never an events rescan; retry-
    // idempotent by register-max algebra. Final day rollup from the
    // stream-built sketches == the batch d22 (exact coupon regime).
    Q("i20_stream_sketch_table",
      (s, d) => Streams.i20(s, d),
      Some("""WITH e AS (
            SELECT CAST(epoch_ms(ts) AS BIGINT) // 3600000 AS hour,
                   CAST(epoch_ms(ts) AS BIGINT) // 86400000 AS day, user_id
            FROM events)
          SELECT day, CAST(COUNT(DISTINCT hour) AS BIGINT) AS n_hours,
                 CAST(COUNT(DISTINCT user_id) AS BIGINT) AS est_users,
                 CAST(COUNT(DISTINCT user_id) AS BIGINT) AS exact_users
          FROM e GROUP BY day ORDER BY day""")),

    // transformWithState with MAP state: per-user per-event-type
    // counters — the sub-keyed profile shape — completing the typed-state
    // trio (i10 ValueState, i22 ListState). == batch (user, type) counts.
    Q("i23_stream_map_state",
      (s, d) => Streams.i23(s, d),
      Some("""SELECT user_id, event_type, CAST(COUNT(*) AS BIGINT) AS n
        FROM events GROUP BY user_id, event_type
        ORDER BY user_id, event_type""")),

    // transformWithState with LIST state: streaming per-user top-3
    // purchase values, the ListState leg next to i10's ValueState —
    // state is k doubles per key by construction (merge-then-truncate),
    // final ranking flushed by event-time timers. == batch top-3.
    Q("i22_stream_topk_state",
      (s, d) => Streams.i22(s, d),
      Some("""WITH p AS (SELECT user_id, value,
            row_number() OVER (PARTITION BY user_id
              ORDER BY value DESC) AS rank
          FROM events WHERE event_type = 'purchase')
        SELECT user_id, CAST(rank AS INT) AS rank, value
        FROM p WHERE rank <= 3 ORDER BY user_id, rank""")),

    // Stream-stream LEFT OUTER interval join: null-extended rows ("no
    // follow-up click in 5 min") can only be emitted once the watermark
    // closes the window — i8's inner join upgraded to the outer surface
    // with watermark-timed null emission. Output == the batch LEFT JOIN.
    Q("i21_stream_left_outer_join",
      (s, d) => Streams.i21(s, d),
      Some("""WITH e AS (SELECT event_id, user_id,
            CAST(epoch_ms(ts) AS BIGINT) AS ts_ms, event_type FROM events),
        r AS (SELECT * FROM e WHERE event_type = 'click')
        SELECT l.event_id AS a_id, r.event_id AS b_id, l.user_id AS user_id
        FROM e l LEFT JOIN r ON l.user_id = r.user_id
          AND r.ts_ms >= l.ts_ms AND r.ts_ms <= l.ts_ms + 300000
          AND l.event_id != r.event_id
        ORDER BY a_id, b_id NULLS FIRST""")),

    // Complete-mode streaming aggregation: the memory sink holds the FULL
    // current aggregate after every batch; after the last batch it equals
    // the batch groupBy (the oracle) — the third output mode next to
    // append (i4) and the upsert pattern (i11).
    Q("i12_stream_complete_mode",
      (s, d) => Streams.i12(s, d),
      Some("""SELECT event_type, COUNT(*) AS n,
        CAST(ROUND(SUM(CAST(value AS DECIMAL(18,4))),4) AS DOUBLE) AS sum_v
        FROM events GROUP BY event_type ORDER BY event_type""")),

    // Skew-resistant aggregation as a graded operator: two-stage salted
    // groupBy (graft.ops.Skew.saltedAggregate) — partial agg on
    // (key, salt) then final merge on key, the standard hot-key defuse.
    // Result is identical to the direct aggregation (the oracle).
    Q("k5_salted_agg",
      (s, d) => Skew.saltedAggregate(
          t(s, d, "lineitem"),
          col("l_returnflag"), col("l_orderkey"), 8,
          partials = Seq(sum(dec(col("l_quantity"))).as("ps"),
            count(lit(1)).as("pc")),
          finals = Seq(sum(col("ps")).as("fs"), sum(col("pc")).as("fc")))
        .select(col("__k").as("l_returnflag"),
          round(col("fs"), 4).cast("double").as("sum_qty"),
          col("fc").as("n"))
        .orderBy("l_returnflag"),
      Some("""SELECT l_returnflag,
        CAST(ROUND(SUM(CAST(l_quantity AS DECIMAL(18,4))),4) AS DOUBLE) AS sum_qty,
        COUNT(*) AS n FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""")),

    // Small-file compaction as a graded operator: a fragmented write
    // (64 shards) compacted to size-targeted files; read-back equals the
    // source (the oracle) and the file count drops to a handful —
    // the ingest hygiene TD's hourly buckets depend on at 100 TB.
    Q("a18_compaction",
      (s, d) => {
        val frag = Scratch.unique("a18") + "/t"
        t(s, d, "supplier").repartition(64).write.mode("overwrite").parquet(frag)
        val (before, after) = Compaction.compact(s, frag, targetBytes = 8L << 20)
        // an already-compact table (<= 1 data file — e.g. an empty write)
        // has nothing to reduce; compaction is then a legitimate no-op
        require(after < before || before <= 1,
          s"compaction did not reduce files: $before -> $after")
        s.read.parquet(frag)
          .select("s_suppkey", "s_name", "s_nationkey", "s_acctbal")
          .orderBy("s_suppkey")
      },
      Some("""SELECT s_suppkey, s_name, s_nationkey, s_acctbal
        FROM supplier ORDER BY s_suppkey""")),

    // Approximate heavy hitters (SpaceSaving TypedImperativeAggregate):
    // top document terms without grouping the long tail. Graded in the
    // EXACT regime (the d21 device): the fixture vocabulary is 31 terms
    // per lang < capacity (16k = 80), so no SpaceSaving eviction ever
    // fires, counters are exact sums (merge-order-independent), and the
    // (cnt desc, term) tie-break in eval makes the top-5 deterministic —
    // hash-checkable against a plain GROUP BY + row_number oracle. The
    // approximate regime (vocab > capacity) stays under scalatest
    // containment bounds in LlmOpsSpec.
    Q("k4_heavy_hitters",
      (s, d) => Views.unique(s, "documents" -> t(s, d, "documents")) { v =>
        graft.functions.HeavyHitters.register(s)
        s.sql(s"""SELECT lang, inline(heavy_hitters(term, 5)) FROM
          (SELECT lang, explode(split(text, ' ')) AS term FROM ${v("documents")})
          GROUP BY lang ORDER BY lang, cnt DESC, term""")
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

    // Approximate percentile (Presto approx_percentile / TD's big-data
    // quantiles): Greenwald-Khanna sketch, mergeable across partitions.
    // Graded in the EXACT regime (the d21 device): accuracy 1e6 bounds the
    // rank error by N/1e6 ≈ 0.02 < 1 rank at sf0.01's ~20k rows/group, so
    // the sketch returns the exact discrete-rank element and hash-checks
    // against the oracle's quantile_disc. The approximate regime (default
    // accuracy) stays under the scalatest bound vs d8's exact percentile.
    Q("d18_agg_approx_percentile",
      (s, d) => t(s, d, "lineitem")
        .groupBy("l_returnflag")
        .agg(expr("approx_percentile(l_extendedprice, array(0.25, 0.5, 0.75), 1000000)")
          .as("approx_q"))
        .select(col("l_returnflag"),
          element_at(col("approx_q"), 1).as("q25"),
          element_at(col("approx_q"), 2).as("q50"),
          element_at(col("approx_q"), 3).as("q75"))
        .orderBy("l_returnflag"),
      Some("""SELECT l_returnflag,
          quantile_disc(l_extendedprice, 0.25) AS q25,
          quantile_disc(l_extendedprice, 0.5) AS q50,
          quantile_disc(l_extendedprice, 0.75) AS q75
        FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""")),

    // Custom Aggregator UDAF: exact weighted mean (price weighted by qty).
    Q("k2_udaf_weighted_mean",
      (s, d) => {
        val wavg = udaf(WeightedMean)
        t(s, d, "lineitem").groupBy("l_returnflag")
          .agg(wavg(col("l_extendedprice"), col("l_quantity")).as("wavg_price"))
          .orderBy("l_returnflag")
      },
      Some("""SELECT l_returnflag,
        ROUND(CAST(ROUND(SUM(CAST(l_extendedprice AS DECIMAL(18,4)) * CAST(l_quantity AS DECIMAL(18,4))),4) AS DOUBLE)
            / CAST(ROUND(SUM(CAST(l_quantity AS DECIMAL(18,4))),4) AS DOUBLE), 4) AS wavg_price
        FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""")),

    // Multimodal decode via the partition-batched stub pipeline; checksum
    // is the same rolling hash the oracle computes over the text bytes.
    Q("m2_decode_stub",
      (s, d) => {
        import org.apache.spark.sql.Encoders
        val rows = t(s, d, "documents")
          .select(col("doc_id"), col("text").cast("binary").as("payload"))
          .as(Encoders.product[MultiModal.MediaRow])
        MultiModal.decodeStub(rows).toDF().orderBy("doc_id")
      },
      Some("""WITH x AS (SELECT doc_id,
          list_reduce(list_prepend(CAST(0 AS BIGINT),
            list_transform(string_split_regex(text,''), c -> CAST(ascii(c) AS BIGINT))),
            (a, b) -> (a * 31 + b) % 1000000007) AS crc
        FROM documents WHERE text IS NOT NULL)
        SELECT doc_id, 128 + crc % 1024 AS width, 128 + (crc // 1024) % 1024 AS height,
          1 + crc % 30 AS n_frames, crc AS checksum
        FROM x ORDER BY doc_id""")))
}
