package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.Tables._

/** Round-5 session additions — closing the remaining user-facing surface:
  *
  *   - `h18_td_time_format` — TD_TIME_FORMAT / TD_TIME_PARSE parity
  *     (reference emits these into generated SQL; SURVEY §3.H): epoch
  *     seconds → formatted string → parsed back, all native datetime
  *     expressions (codegen'd, never a UDF).
  *   - `h19_resample_ffill` — the pandas `df.resample('1D').sum().ffill()`
  *     idiom the reference's users run on every query result, moved into
  *     the engine: calendar spine ⋈ sparse daily aggregate, gaps filled by
  *     LOCF over one window sort. At 100 TB the spine join is the scalable
  *     form — per-key windows, no driver materialization.
  *   - `d20_describe` — pandas `describe()` analog (count/mean/std/min/
  *     q25/q50/q75/max, long form), the first call every notebook makes on
  *     a fetched DataFrame.
  *   - `j31_semdedup` — SemDeDup (Abbas et al. 2023): semantic dedup via
  *     bucketed within-cluster cosine — candidate pairs come from an
  *     equi-join on the cluster id, never a cartesian.
  *   - `j32_importance_weight` — DSIR-style (Xie et al. 2023) hashed-bigram
  *     importance weighting of documents toward a target domain,
  *     oracle-exact via the decimal-sum device (j17's), with the mean
  *     likelihood-RATIO as the score (the log-sum form is rank-similar but
  *     libm-dependent, so not cross-engine hashable).
  *   - `a22_incremental_manifest` — manifest-driven incremental batch
  *     ingest: only files not yet in the processed-file manifest are read
  *     on the second pass (`input_file_name`-keyed anti join). The 100 TB
  *     ingest loop is exactly this shape — listing diff, not data diff.
  *   - `i14_stream_backfill` — bounded-batch streaming backfill:
  *     `maxFilesPerTrigger` + `Trigger.AvailableNow` drains a multi-file
  *     source in several rate-limited micro-batches (the
  *     catch-up-without-OOM mode of a production file stream).
  */
object Round5b {

  /** Reusable funnel core (h20): per user, earliest 'view', earliest
    * 'click' strictly after it within `windowMs`, earliest 'purchase'
    * strictly after that within `windowMs`. `ev` needs (user_id,
    * event_type, ts_ms). Exposed — like Td.tdSessionize — so callers run
    * it over arbitrary event relations and PropertySpec fuzzes it against
    * a driver-side reference. */
  def funnel(ev: DataFrame, windowMs: Long): DataFrame = {
    val v = ev.where(col("event_type") === "view")
      .groupBy("user_id").agg(min(col("ts_ms")).as("t_view"))
    val c = ev.where(col("event_type") === "click")
      .join(v, "user_id")
      .where(col("ts_ms") > col("t_view") && col("ts_ms") <= col("t_view") + windowMs)
      .groupBy("user_id").agg(min(col("ts_ms")).as("t_click"))
    val p = ev.where(col("event_type") === "purchase")
      .join(c, "user_id")
      .where(col("ts_ms") > col("t_click") && col("ts_ms") <= col("t_click") + windowMs)
      .groupBy("user_id").agg(min(col("ts_ms")).as("t_purchase"))
    v.join(c, Seq("user_id"), "left").join(p, Seq("user_id"), "left")
      .select(col("user_id"), col("t_view"), col("t_click"), col("t_purchase"),
        (lit(1) + when(col("t_click").isNotNull, 1).otherwise(0) +
          when(col("t_purchase").isNotNull, 1).otherwise(0)).as("stages"))
  }

  /** Reusable shard-local sequence packing core (j33/j35): `docs` needs
    * (doc_id, n_tok); returns (doc_id, shard, n_tok, off, bin) with
    * per-shard contiguous token streams cut into `binSize`-token bins. */
  def packShards(docs: DataFrame, binSize: Long, shards: Int): DataFrame = {
    val w = Window.partitionBy("shard").orderBy("doc_id")
    docs
      .select(col("doc_id"), col("n_tok"),
        pmod(col("doc_id"), lit(shards.toLong)).as("shard"))
      .withColumn("stream_end", sum(col("n_tok")).over(w))
      .select(col("doc_id"), col("shard"), col("n_tok"),
        (col("stream_end") - col("n_tok")).as("off"),
        expr(s"(stream_end - n_tok) div $binSize").as("bin"))
  }

  private def tmp(tag: String): String = Scratch.unique(tag)

  val all: Seq[Q] = Seq(

    // TD_TIME_FORMAT(time, fmt) / TD_TIME_PARSE(str) roundtrip over the
    // events stream: epoch seconds (TD's `time` column convention) are
    // formatted in the session TZ (UTC, as TD does server-side), parsed
    // back, and re-emitted — parse(format(t)) == t is the graded
    // invariant, checked per-row by emitting both sides. Construction-time
    // expansion into date_format/to_timestamp keeps everything inside
    // whole-stage codegen.
    Q("h18_td_time_format",
      (s, d) => {
        val ev = events(s, d).where(col("event_id") < 2000)
        val sec = expr("ts_ms div 1000").as("t_sec")
        ev.select(col("event_id"), sec)
          .withColumn("t_str", graft.functions.Td.tdTimeFormat(
            timestamp_seconds(col("t_sec")), "yyyy-MM-dd HH:mm:ss"))
          .withColumn("t_roundtrip",
            unix_timestamp(graft.functions.Td.tdTimeParse(col("t_str"))))
          .withColumn("hour_of_day", graft.functions.Td.tdTimeFormat(
            timestamp_seconds(col("t_sec")), "HH").cast("int"))
          .orderBy("event_id")
      },
      Some("""SELECT event_id, CAST(epoch_ms(ts) // 1000 AS BIGINT) AS t_sec,
          strftime(make_timestamp((epoch_ms(ts) // 1000) * 1000000), '%Y-%m-%d %H:%M:%S') AS t_str,
          CAST(epoch_ms(ts) // 1000 AS BIGINT) AS t_roundtrip,
          CAST(strftime(make_timestamp((epoch_ms(ts) // 1000) * 1000000), '%H') AS INT) AS hour_of_day
        FROM events WHERE event_id < 2000 ORDER BY event_id""")),

    // pandas resample('1D').sum().ffill(), engine-side: a generated
    // calendar spine per event_type left-joins the sparse daily aggregate
    // (high-value signups only — sparse by construction, so gaps exist at
    // every SF), then ONE window per type fills gaps with the last seen
    // value (0.0 before the first observation). The spine is generated
    // distributed (sequence + explode), the fill is a single
    // partition-sorted window — no driver loop anywhere, which is what
    // separates this from pandas at 100 TB.
    Q("h19_resample_ffill",
      (s, d) => {
        val daily = events(s, d)
          .where(col("event_type") === "signup" && col("value") > 400)
          .groupBy(expr("date_trunc('day', ts_t)").as("day"))
          .agg(mSum(col("value")).as("v"), count(lit(1)).as("n"))
        val spine = s.range(1)
          .select(explode(expr(
            "sequence(timestamp '2024-01-01 00:00:00', " +
              "timestamp '2024-01-30 00:00:00', interval 1 day)")).as("day"))
        val w = Window.orderBy("day")
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        spine.join(daily, Seq("day"), "left")
          .select(dateStr(col("day")).as("day"),
            coalesce(last(col("v"), ignoreNulls = true).over(w), lit(0.0)).as("v_filled"),
            coalesce(col("n"), lit(0L)).as("n_events"))
          .orderBy("day")
      },
      Some("""WITH daily AS (SELECT date_trunc('day', ts) AS day,
            CAST(ROUND(SUM(CAST(value AS DECIMAL(18,4))),4) AS DOUBLE) AS v,
            COUNT(*) AS n
          FROM events WHERE event_type = 'signup' AND value > 400 GROUP BY 1),
        spine AS (SELECT unnest(generate_series(TIMESTAMP '2024-01-01',
            TIMESTAMP '2024-01-30', INTERVAL 1 DAY)) AS day)
        SELECT strftime(s.day, '%Y-%m-%d') AS day,
          COALESCE(last_value(d.v IGNORE NULLS) OVER
            (ORDER BY s.day ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 0.0) AS v_filled,
          COALESCE(d.n, 0) AS n_events
        FROM spine s LEFT JOIN daily d ON s.day = d.day
        ORDER BY day""")),

    // Funnel analysis — the classic TD workload the sessionize/time UDFs
    // exist to serve: per user, the earliest view, the earliest click
    // within 24 h STRICTLY AFTER that view, and the earliest purchase
    // within 24 h after that click (sequential-min + conversion-window
    // semantics — a click before the first view, or a week later, does
    // not convert; without the window the month-dense fixture converts
    // everyone and the funnel proves nothing). Three conditional
    // aggregates chained through equi-joins on user_id; every timestamp
    // is an exact epoch-millis long, so the whole funnel hash-checks.
    // One shuffle per stage on the same key — at 100 TB the three
    // aggregations co-partition and the joins are exchange-free after the
    // first.
    Q("h20_funnel",
      (s, d) => funnel(
          events(s, d).select(col("user_id"), col("event_type"), col("ts_ms")),
          86400000L)
        .orderBy("user_id"),
      Some("""WITH ev AS (SELECT user_id, event_type,
            CAST(epoch_ms(ts) AS BIGINT) AS ts_ms FROM events),
        v AS (SELECT user_id, MIN(ts_ms) AS t_view FROM ev
          WHERE event_type = 'view' GROUP BY user_id),
        c AS (SELECT ev.user_id, MIN(ts_ms) AS t_click FROM ev JOIN v USING (user_id)
          WHERE event_type = 'click' AND ts_ms > t_view
            AND ts_ms <= t_view + 86400000 GROUP BY ev.user_id),
        p AS (SELECT ev.user_id, MIN(ts_ms) AS t_purchase FROM ev JOIN c USING (user_id)
          WHERE event_type = 'purchase' AND ts_ms > t_click
            AND ts_ms <= t_click + 86400000 GROUP BY ev.user_id)
        SELECT v.user_id, t_view, t_click, t_purchase,
          1 + (CASE WHEN t_click IS NOT NULL THEN 1 ELSE 0 END)
            + (CASE WHEN t_purchase IS NOT NULL THEN 1 ELSE 0 END) AS stages
        FROM v LEFT JOIN c ON v.user_id = c.user_id
          LEFT JOIN p ON v.user_id = p.user_id
        ORDER BY v.user_id""")),

    // pandas describe() in long form: one row per statistic, one column
    // per measure. Quantiles use exact linear interpolation (`percentile`
    // ≙ DuckDB quantile_cont — the d8-validated pairing); mean/std on
    // doubles round to 4 (the d10-validated pairing). count is emitted as
    // a measure-typed double so each output column stays single-typed.
    Q("d20_describe",
      (s, d) => {
        val li = t(s, d, "lineitem")
        def statRow(name: String, q: org.apache.spark.sql.Column,
            e: org.apache.spark.sql.Column) =
          li.agg(q.as("l_quantity"), e.as("l_extendedprice"))
            .select(lit(name).as("stat"), col("l_quantity"), col("l_extendedprice"))
        def both(f: org.apache.spark.sql.Column => org.apache.spark.sql.Column,
            name: String) =
          statRow(name, f(col("l_quantity")), f(col("l_extendedprice")))
        both(c => count(c).cast("double"), "count")
          .unionAll(both(c => round(avg(c), 4), "mean"))
          .unionAll(both(c => round(stddev_samp(c), 4), "std"))
          .unionAll(both(c => min(c), "min"))
          .unionAll(both(c => round(expr(s"percentile(${c.toString}, 0.25)"), 4), "q25"))
          .unionAll(both(c => round(expr(s"percentile(${c.toString}, 0.5)"), 4), "q50"))
          .unionAll(both(c => round(expr(s"percentile(${c.toString}, 0.75)"), 4), "q75"))
          .unionAll(both(c => max(c), "max"))
          .orderBy("stat")
      },
      Some("""WITH s AS (
          SELECT 'count' AS stat, CAST(COUNT(l_quantity) AS DOUBLE) AS l_quantity,
            CAST(COUNT(l_extendedprice) AS DOUBLE) AS l_extendedprice FROM lineitem
          UNION ALL SELECT 'mean', ROUND(AVG(l_quantity),4), ROUND(AVG(l_extendedprice),4) FROM lineitem
          UNION ALL SELECT 'std', ROUND(stddev_samp(l_quantity),4), ROUND(stddev_samp(l_extendedprice),4) FROM lineitem
          UNION ALL SELECT 'min', MIN(l_quantity), MIN(l_extendedprice) FROM lineitem
          UNION ALL SELECT 'q25', ROUND(quantile_cont(l_quantity,0.25),4), ROUND(quantile_cont(l_extendedprice,0.25),4) FROM lineitem
          UNION ALL SELECT 'q50', ROUND(quantile_cont(l_quantity,0.5),4), ROUND(quantile_cont(l_extendedprice,0.5),4) FROM lineitem
          UNION ALL SELECT 'q75', ROUND(quantile_cont(l_quantity,0.75),4), ROUND(quantile_cont(l_extendedprice,0.75),4) FROM lineitem
          UNION ALL SELECT 'max', MAX(l_quantity), MAX(l_extendedprice) FROM lineitem)
        SELECT * FROM s ORDER BY stat""")),

    // SemDeDup (semantic dedup over embeddings): candidate pairs are
    // bucketed by cluster id — an equi-join on `label`, never an all-pairs
    // cartesian (at corpus scale the cells come from k-means over a sample
    // and cell size is bounded, so the per-cell pair mass stays bounded).
    // Drop rule, made deterministic: v is dropped iff some u < v in the
    // same cell has round(cos(u,v),6) ≥ 0.35 (round-then-compare makes the
    // threshold decision identical cross-engine; the published rule keeps
    // one representative per near-dup group — min id here, no RNG). The
    // dot product runs in the native codegen'd CosineSimilarity
    // expression.
    Q("j31_semdedup",
      (s, d) => {
        val e = t(s, d, "embeddings")
        val a = e.select(col("label").as("la"), col("vec_id").as("u"),
          col("embedding").as("ea"))
        val b = e.select(col("label").as("lb"), col("vec_id").as("v"),
          col("embedding").as("eb"))
        val dropped = a.join(b, col("la") === col("lb") && col("u") < col("v"))
          .where(round(graft.expressions.CosineSimilarity(s, col("ea"), col("eb")), 6)
            >= 0.35)
          .select(col("v")).distinct()
        e.join(dropped, e("vec_id") === dropped("v"), "left")
          .select(col("vec_id"), col("label"),
            when(col("v").isNull, 1).otherwise(0).as("kept"))
          .orderBy("vec_id")
      },
      Some("""WITH e AS (SELECT vec_id, label, generate_subscripts(embedding,1) AS dim,
            CAST(unnest(embedding) AS DOUBLE) AS v FROM embeddings),
        n AS (SELECT vec_id, sqrt(SUM(v*v)) AS nv FROM e GROUP BY vec_id),
        dots AS (SELECT a.vec_id AS u, b.vec_id AS w, SUM(a.v*b.v) AS dot
          FROM e a JOIN e b ON a.label = b.label AND a.dim = b.dim
            AND a.vec_id < b.vec_id
          GROUP BY 1, 2),
        dropped AS (SELECT DISTINCT w FROM dots
          JOIN n n1 ON u = n1.vec_id JOIN n n2 ON w = n2.vec_id
          WHERE ROUND(dot/(n1.nv*n2.nv), 6) >= 0.35)
        SELECT emb.vec_id, emb.label,
          CASE WHEN dr.w IS NULL THEN 1 ELSE 0 END AS kept
        FROM embeddings emb LEFT JOIN dropped dr ON emb.vec_id = dr.w
        ORDER BY emb.vec_id""")),

    // DSIR-style importance weighting toward a target domain: hashed
    // word-bigram features (md5 → 4096 buckets — the hashing trick; md5 so
    // the identical bucket ids reproduce in the oracle), add-one-smoothed
    // bucket probabilities under the target (source='src0') vs raw (rest)
    // distributions, and a per-doc importance score. Score = mean of
    // per-bigram probability RATIOS, decimal-summed (j17's device) so the
    // aggregation is order-independent and hash-exact; the log-sum form of
    // the paper ranks near-identically but ln() is libm-dependent, so it
    // cannot be cross-engine-hashed. Every stage is a hash groupBy/join —
    // the weights table is 4096 rows (broadcastable at any corpus size:
    // fixed by the hash width, not the data).
    Q("j32_importance_weight",
      (s, d) => {
        val B = 4096
        val docs = t(s, d, "documents")
          .select(col("doc_id"), col("source"), split(col("text"), " ").as("toks"))
          .where(size(col("toks")) >= 2)
        val bg = docs.select(col("doc_id"), col("source"), explode(expr(
          "transform(" + Ngrams.starts("toks", 2) + ", " +
            "i -> concat_ws(' ', toks[i-1], toks[i]))")).as("g"))
          .select(col("doc_id"), col("source"),
            expr(s"cast(conv(substring(md5(g),1,15),16,10) as bigint) % $B").as("b"))
        // corpus totals ride a broadcast 1-row cross join (j30's device) —
        // no driver round-trip, works at any corpus size
        val tots = bg.agg(
          sum(when(col("source") === "src0", 1L).otherwise(0L)).as("tt"),
          sum(when(col("source") =!= "src0", 1L).otherwise(0L)).as("rt"))
        val tc = bg.where(col("source") === "src0")
          .groupBy("b").agg(count(lit(1)).as("tc"))
        val rc = bg.where(col("source") =!= "src0")
          .groupBy("b").agg(count(lit(1)).as("rc"))
        val buckets = s.range(B).select(col("id").as("b"))
          .join(tc, Seq("b"), "left").join(rc, Seq("b"), "left")
          .crossJoin(broadcast(tots))
          .select(col("b"),
            ((coalesce(col("tc"), lit(0L)) + 1).cast("double") * (col("rt") + B) /
              ((coalesce(col("rc"), lit(0L)) + 1).cast("double") * (col("tt") + B)))
              .cast("decimal(28,12)").as("ratio"))
        bg.where(col("source") =!= "src0")
          .join(broadcast(buckets), "b")
          .groupBy("doc_id")
          .agg(round(sum(col("ratio")).cast("double") / count(lit(1)), 6).as("iw"),
            count(lit(1)).as("n_bigrams"))
          .orderBy(desc("iw"), asc("doc_id")).limit(50)
      },
      Some(s"""WITH tk AS (SELECT doc_id, source, string_split(text,' ') AS toks
            FROM documents WHERE len(string_split(text,' ')) >= 2),
        bg AS (SELECT doc_id, source,
            CAST('0x' || substr(md5(toks[i.i] || ' ' || toks[i.i+1]),1,15) AS BIGINT) % 4096 AS b
          FROM tk, unnest(range(1, len(toks))) i(i)),
        tot AS (SELECT SUM(CASE WHEN source='src0' THEN 1 ELSE 0 END) AS tt,
            SUM(CASE WHEN source<>'src0' THEN 1 ELSE 0 END) AS rt FROM bg),
        tc AS (SELECT b, COUNT(*) AS tc FROM bg WHERE source='src0' GROUP BY b),
        rc AS (SELECT b, COUNT(*) AS rc FROM bg WHERE source<>'src0' GROUP BY b),
        buckets AS (SELECT r.range AS b,
            CAST(CAST(COALESCE(tc.tc,0)+1 AS DOUBLE) * (tot.rt+4096) /
              (CAST(COALESCE(rc.rc,0)+1 AS DOUBLE) * (tot.tt+4096))
              AS DECIMAL(28,12)) AS ratio
          FROM range(4096) r LEFT JOIN tc ON r.range=tc.b
            LEFT JOIN rc ON r.range=rc.b CROSS JOIN tot)
        SELECT doc_id, ROUND(CAST(SUM(ratio) AS DOUBLE) / COUNT(*), 6) AS iw,
          COUNT(*) AS n_bigrams
        FROM bg JOIN buckets USING (b) WHERE source<>'src0'
        GROUP BY doc_id ORDER BY iw DESC, doc_id LIMIT 50""")),

    // Manifest-driven incremental ingest — the 100 TB ingestion loop:
    // pass 1 lands a subset of the source files and records each file path
    // in a manifest; pass 2 lists the (now larger) source dir and
    // processes ONLY files absent from the manifest (input_file_name-keyed
    // anti join on the LISTING — the already-ingested bytes are never
    // re-read, only re-listed). Output proves exactly-once: the union of
    // both passes aggregates to the full-table oracle with no dupes.
    Q("a22_incremental_manifest",
      (s, d) => {
        val src = tmp("a22src"); val state = tmp("a22state")
        val mani = tmp("a22manifest")
        val orders = t(s, d, "orders")
        // source lands in two batches (deterministic split)
        orders.where(col("o_orderkey") % 3 =!= 0)
          .write.mode("overwrite").parquet(src)
        // pass 1: ingest everything present; the manifest is a parquet
        // TABLE (distributed write), never a driver-side set — at
        // millions of files the manifest outgrows the driver, the
        // listing-vs-manifest diff below does not
        val pass1 = s.read.parquet(src)
        pass1.select(input_file_name().as("f")).distinct()
          .write.mode("overwrite").parquet(mani)
        pass1.write.mode("overwrite").parquet(s"$state/ingested=1")
        // batch 2 arrives
        orders.where(col("o_orderkey") % 3 === 0)
          .write.mode("append").parquet(src)
        // pass 2: list, anti-join the listing against the manifest table
        // (distributed diff), and collect ONLY the new-files delta —
        // O(batch), the list the read API needs on the driver anyway
        val all = s.read.parquet(src)
        val newFiles = all.select(input_file_name().as("f")).distinct()
          .join(s.read.parquet(mani), Seq("f"), "left_anti")
          .collect().map(_.getString(0))
        if (newFiles.nonEmpty)
          s.read.parquet(newFiles.toIndexedSeq: _*)
            .write.mode("overwrite").parquet(s"$state/ingested=2")
        s.read.parquet(state).drop("ingested")
          .groupBy("o_orderstatus")
          .agg(count(lit(1)).as("n_orders"), mSum(col("o_totalprice")).as("sum_price"))
          .orderBy("o_orderstatus")
      },
      Some("""SELECT o_orderstatus, COUNT(*) AS n_orders,
          CAST(ROUND(SUM(CAST(o_totalprice AS DECIMAL(18,4))),4) AS DOUBLE) AS sum_price
        FROM orders GROUP BY o_orderstatus ORDER BY o_orderstatus""")),

    // TPC-H Q3-shaped multiway workload: the canonical 3-table
    // join-filter-aggregate-topk an analyst actually runs, as one declared
    // plan — customer (selective segment filter) ⋈ orders (date filter)
    // ⋈ lineitem (date filter), revenue aggregate, global top-10. What the
    // optimizer must get right at 100 TB, and does (verify in .explain):
    // all three filters push to their scans; customer broadcasts (smallest
    // side post-filter, AQE-confirmed); the orders⋈lineitem join shuffles
    // on the shared o_orderkey so the groupBy reuses its partitioning; the
    // top-10 is TakeOrderedAndProject, never a global sort.
    Q("c15_join_multiway",
      (s, d) => {
        val cust = t(s, d, "customer")
          .where(col("c_mktsegment") === "BUILDING").select("c_custkey")
        val ord = t(s, d, "orders")
          .where(col("o_orderdate") < tsLit("1998-07-01"))
          .select("o_orderkey", "o_custkey", "o_orderdate", "o_orderpriority")
        val li = t(s, d, "lineitem")
          .where(col("l_shipdate") > tsLit("1998-07-01"))
          .select("l_orderkey", "l_extendedprice", "l_discount")
        cust.join(ord, col("c_custkey") === col("o_custkey"))
          .join(li, col("o_orderkey") === col("l_orderkey"))
          .groupBy("o_orderkey", "o_orderdate", "o_orderpriority")
          .agg(round(sum(dec(col("l_extendedprice")) *
            (lit(1) - dec(col("l_discount")))), 4).cast("double").as("revenue"))
          .select(col("o_orderkey"), dateStr(col("o_orderdate")).as("o_orderdate"),
            col("o_orderpriority"), col("revenue"))
          .orderBy(desc("revenue"), asc("o_orderkey")).limit(10)
      },
      Some("""SELECT o_orderkey, strftime(o_orderdate, '%Y-%m-%d') AS o_orderdate,
          o_orderpriority,
          CAST(ROUND(SUM(CAST(l_extendedprice AS DECIMAL(18,4)) *
            (1 - CAST(l_discount AS DECIMAL(18,4)))), 4) AS DOUBLE) AS revenue
        FROM customer JOIN orders ON c_custkey = o_custkey
          JOIN lineitem ON o_orderkey = l_orderkey
        WHERE c_mktsegment = 'BUILDING'
          AND o_orderdate < TIMESTAMP '1998-07-01 00:00:00'
          AND l_shipdate > TIMESTAMP '1998-07-01 00:00:00'
        GROUP BY o_orderkey, o_orderdate, o_orderpriority
        ORDER BY revenue DESC, o_orderkey LIMIT 10""")),

    // Datasketches frequent-items top-k (approx_top_k) — the mergeable
    // heavy-hitters tier next to k4's hand-built SpaceSaving: at 100 TB
    // per-partition sketches accumulate map-side and merge, never
    // shuffling raw values. Graded in the EXACT regime — maxItemsTracked
    // (64) ≥ the column's distinct count (25 brands), so no eviction ever
    // occurs, counts are exact, and the sketch output hash-checks against
    // the plain GROUP BY oracle (the same device that makes j26's
    // quantization oracle-exact). The approximate regime is k4's
    // scalatest-bounded territory.
    Q("d21_approx_top_k",
      (s, d) => Views.unique(s, "graft_d21_part" -> t(s, d, "part")) { v =>
        s.sql(s"""
          SELECT tk.item AS p_brand, CAST(tk.count AS BIGINT) AS n FROM (
            SELECT explode(approx_top_k(p_brand, 25, 64)) AS tk
            FROM ${v("graft_d21_part")})
          ORDER BY n DESC, p_brand""")
      },
      Some("""SELECT p_brand, COUNT(*) AS n FROM part
        GROUP BY p_brand ORDER BY n DESC, p_brand""")),

    // Sequence packing — the batch-assembly step between a cleaned corpus
    // and a pretraining dataloader: documents are concatenated into a
    // token stream and cut into fixed 2048-token bins (documents cross bin
    // boundaries; the loader masks attention across the seam — the
    // standard "packed dataset" layout). Packing is SHARD-LOCAL by design:
    // a global token-stream offset would serialize into one partition's
    // running sum, while per-shard streams pack independently and in
    // parallel — at 100 TB each worker packs its own shard and the bin ids
    // are (shard, bin), which is exactly what a sharded dataloader wants.
    // All-integer arithmetic → hash-exact.
    Q("j33_sequence_pack",
      (s, d) => packShards(
          t(s, d, "documents").select(col("doc_id"),
            size(split(col("text"), " ")).cast("long").as("n_tok")),
          2048L, 8)
        .orderBy("doc_id"),
      Some("""WITH d AS (SELECT doc_id,
            CAST(len(string_split(text,' ')) AS BIGINT) AS n_tok,
            doc_id % 8 AS shard
          FROM documents),
        c AS (SELECT doc_id, shard, n_tok,
            SUM(n_tok) OVER (PARTITION BY shard ORDER BY doc_id
              ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS stream_end
          FROM d)
        SELECT doc_id, shard, n_tok,
          CAST(stream_end - n_tok AS BIGINT) AS off,
          CAST((stream_end - n_tok) // 2048 AS BIGINT) AS bin
        FROM c ORDER BY doc_id""")),

    // Overlapping-window chunking — the RAG/long-context prep step: each
    // doc splits into 64-token windows advancing by a 48-token stride
    // (16-token overlap keeps context across cuts). Pure map-side explode
    // off the token array — no shuffle before the final sort; chunk count
    // is 1 + ceil((n-W)/S) via integer arithmetic so both engines agree
    // exactly.
    Q("j34_chunk_overlap",
      (s, d) => {
        val W = 64L; val S = 48L
        t(s, d, "documents")
          .select(col("doc_id"), split(col("text"), " ").as("toks"))
          .select(col("doc_id"), size(col("toks")).cast("long").as("n"), col("toks"))
          .withColumn("n_chunks",
            when(col("n") <= W, 1L)
              .otherwise(expr("(n - 64 + 47) div 48 + 1")))
          .select(col("doc_id"), col("n"), col("toks"),
            explode(expr(Ngrams.seqAsc("0", "n_chunks - 1"))).as("c"))
          .select(col("doc_id"), col("c").as("chunk_id"),
            (col("c") * S).as("start"),
            least(lit(W), col("n") - col("c") * S).as("len"),
            expr("toks[c * 48]").as("first_tok"))
          .orderBy("doc_id", "chunk_id")
      },
      Some("""WITH tk AS (SELECT doc_id, string_split(text,' ') AS toks,
            CAST(len(string_split(text,' ')) AS BIGINT) AS n FROM documents),
        nc AS (SELECT doc_id, toks, n,
            CASE WHEN n <= 64 THEN 1 ELSE (n - 64 + 47) // 48 + 1 END AS n_chunks
          FROM tk)
        SELECT doc_id, i.i AS chunk_id, i.i * 48 AS start,
          LEAST(64, n - i.i * 48) AS len,
          toks[i.i * 48 + 1] AS first_tok
        FROM nc, unnest(range(0, n_chunks)) i(i)
        ORDER BY doc_id, chunk_id""")),

    // Content-addressable binary dedup — the multimodal twin of j1: two
    // crawl snapshots land in the object store (snapshot 2 re-crawled the
    // doc_id%7 shard), and dedup collapses identical payloads by content
    // digest — exactly how a content-addressed media store reclaims a
    // re-crawl at 100 TB (the digest groupBy IS the dedup; bytes never
    // compare, only 16-byte digests shuffle). Output: duplicate groups
    // (digest, n_copies, canonical min doc_id, bytes reclaimed).
    Q("m5_binary_dedup",
      (s, d) => {
        val snap = t(s, d, "documents").select(col("doc_id"), col("text"))
        val store = snap.unionAll(snap.where(pmod(col("doc_id"), lit(7L)) === 0L))
        store
          .select(col("doc_id"), md5(col("text").cast("binary")).as("digest"),
            length(col("text").cast("binary")).cast("long").as("n_bytes"))
          .groupBy("digest")
          .agg(count(lit(1)).as("n_copies"), min(col("doc_id")).as("keep_id"),
            (max(col("n_bytes")) * (count(lit(1)) - 1)).as("bytes_saved"))
          .where(col("n_copies") >= 2)
          .orderBy("keep_id")
      },
      Some("""WITH store AS (SELECT doc_id, text FROM documents
          UNION ALL SELECT doc_id, text FROM documents WHERE doc_id % 7 = 0)
        SELECT md5(text) AS digest, COUNT(*) AS n_copies,
          MIN(doc_id) AS keep_id,
          MAX(CAST(strlen(text) AS BIGINT)) * (COUNT(*) - 1) AS bytes_saved
        FROM store GROUP BY md5(text) HAVING COUNT(*) >= 2
        ORDER BY keep_id""")),

    // The whole training-data pipeline as ONE composed query — the proof
    // that the operator library composes the way a real corpus build runs
    // it: language filter → quality gate → exact dedup (content digest,
    // keep min id) → near-dup drop (exact-Jaccard pairs from the shared
    // single-shuffle postings core, greedy keep-lowest-id) → shard-local
    // sequence packing of the survivors. Every stage is the same machinery
    // the standalone ops grade (j13's lang, j9-style gates, j1, j2's
    // jaccardPairs, j33's packing), chained through one lazy plan — no
    // materialization between stages, so Catalyst prunes/pushes across
    // stage boundaries (the lang+quality filters reach the parquet scan
    // UNDER the dedup shuffles).
    Q("j35_corpus_pipeline",
      (s, d) => {
        val docs = t(s, d, "documents")
          .select(col("doc_id"), col("lang"), col("n_chars"), col("text"),
            split(col("text"), " ").as("toks"))
          .where(col("lang").isin("en", "de") && col("n_chars") >= 120 &&
            size(col("toks")) >= 20)
        // exact dedup: content digest, keep the lowest doc_id per digest
        val wDg = Window.partitionBy("digest").orderBy("doc_id")
        val exact = docs.withColumn("digest", md5(col("text")))
          .withColumn("rn", row_number().over(wDg))
          .where(col("rn") === 1).drop("digest", "rn")
        // near-dup pairs over the SURVIVING set only (same 3-shingle
        // exact-Jaccard core as j2, fed with the filtered postings)
        val sh = exact.where(size(col("toks")) >= 3)
          .select(col("doc_id"), explode(expr(
            "array_distinct(transform(" + Ngrams.starts("toks", 3) + ", " +
              "i -> xxhash64(" + Ngrams.gramAt("toks", 3) + ")))")).as("sh"))
        val n = exact.where(size(col("toks")) >= 3)
          .select(col("doc_id"), expr(
            "size(array_distinct(transform(" + Ngrams.starts("toks", 3) + ", " +
              "i -> xxhash64(" + Ngrams.gramAt("toks", 3) + "))))")
            .cast("long").as("n"))
        val dropped = LlmOps.jaccardPairs(sh, n, 256)
          .select(col("d2").as("doc_id")).distinct()
        val survivors = exact.join(dropped, Seq("doc_id"), "left_anti")
        // pack the cleaned corpus (j33's shard-local layout)
        val wPack = Window.partitionBy("shard").orderBy("doc_id")
        survivors
          .select(col("doc_id"), col("lang"),
            size(col("toks")).cast("long").as("n_tok"),
            pmod(col("doc_id"), lit(8L)).as("shard"))
          .withColumn("stream_end", sum(col("n_tok")).over(wPack))
          .select(col("doc_id"), col("lang"), col("shard"), col("n_tok"),
            expr("(stream_end - n_tok) div 2048").as("bin"))
          .orderBy("doc_id")
      },
      Some("""WITH docs AS (SELECT doc_id, lang, n_chars, text,
            string_split(text,' ') AS toks FROM documents
          WHERE lang IN ('en','de') AND n_chars >= 120
            AND len(string_split(text,' ')) >= 20),
        exact AS (SELECT * FROM (SELECT doc_id, lang, text, toks,
            row_number() OVER (PARTITION BY md5(text) ORDER BY doc_id) AS rn
          FROM docs) WHERE rn = 1),
        sh AS (SELECT DISTINCT doc_id,
            toks[i.i] || ' ' || toks[i.i+1] || ' ' || toks[i.i+2] AS sh
          FROM exact, unnest(range(1, len(toks)-1)) i(i)
          WHERE len(toks) >= 3),
        nn AS (SELECT doc_id, COUNT(*) AS n FROM sh GROUP BY doc_id),
        p AS (SELECT a.doc_id AS d1, b.doc_id AS d2, COUNT(*) AS inter
          FROM sh a JOIN sh b ON a.sh = b.sh AND a.doc_id < b.doc_id
          GROUP BY 1, 2),
        dropped AS (SELECT DISTINCT d2 FROM p
          JOIN nn n1 ON d1 = n1.doc_id JOIN nn n2 ON d2 = n2.doc_id
          WHERE CAST(inter AS DOUBLE) / CAST(n1.n + n2.n - inter AS DOUBLE) >= 0.5),
        surv AS (SELECT doc_id, lang,
            CAST(len(toks) AS BIGINT) AS n_tok, doc_id % 8 AS shard
          FROM exact WHERE doc_id NOT IN (SELECT d2 FROM dropped)),
        c AS (SELECT doc_id, lang, shard, n_tok,
            SUM(n_tok) OVER (PARTITION BY shard ORDER BY doc_id
              ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS stream_end
          FROM surv)
        SELECT doc_id, lang, shard, n_tok,
          CAST((stream_end - n_tok) // 2048 AS BIGINT) AS bin
        FROM c ORDER BY doc_id""")),

    // Corpus drift detection — the monitoring gate between two crawl
    // snapshots: token distributions (md5-hashed into 1024 buckets, the
    // j32 device) of the old vs new snapshot compared per bucket with a
    // Pearson chi-square statistic. Snapshot membership is an md5 doc
    // hash (j22b's device), NOT doc_id % 2 — the fixture assigns sources
    // round-robin by doc_id, so a parity split correlates PERFECTLY with
    // source and every source degenerates to all-old or all-new (chi2 ≡ 0
    // — validated, the statistic would prove nothing). Chi-square
    // over KL deliberately: (o−e)²/e is rational arithmetic that
    // decimal-sums to a hash-exact oracle, while KL's ln() is
    // libm-dependent and cross-engine unhashable. Per-source output so a
    // drifting source is named, not just detected; everything is two hash
    // groupBys + one broadcastable bucket join — full-scan speed at any
    // corpus size.
    Q("j36_drift_chi2",
      (s, d) => {
        val B = 1024
        val tok = t(s, d, "documents")
          .select(col("doc_id"), col("source"), explode(split(col("text"), " ")).as("w"))
          .select(col("source"),
            (expr(Hashes.bucket("doc_id", 2)) === 1L)
              .as("is_new"),
            expr(s"cast(conv(substring(md5(w),1,15),16,10) as bigint) % $B").as("b"))
        val counts = tok.groupBy("source", "b")
          .agg(sum(when(col("is_new"), 0L).otherwise(1L)).as("o_old"),
            sum(when(col("is_new"), 1L).otherwise(0L)).as("o_new"))
        val tots = counts.groupBy("source")
          .agg(sum(col("o_old")).as("t_old"), sum(col("o_new")).as("t_new"))
        counts.join(tots, "source")
          .select(col("source"),
            // expected new-count under no-drift: bucket total × new share
            ((col("o_old") + col("o_new")).cast("double") * col("t_new") /
              (col("t_old") + col("t_new"))).as("e_new"),
            col("o_new").cast("double").as("on"))
          .where(col("e_new") > 0)
          .select(col("source"),
            ((col("on") - col("e_new")) * (col("on") - col("e_new")) / col("e_new"))
              .cast("decimal(28,12)").as("term"))
          .groupBy("source")
          .agg(round(sum(col("term")).cast("double"), 4).as("chi2"),
            count(lit(1)).as("dof_buckets"))
          .orderBy("source")
      },
      Some(s"""WITH tok AS (SELECT doc_id, source, unnest(string_split(text,' ')) AS w
            FROM documents),
        h AS (SELECT source,
            ${Hashes.bucketSql("doc_id", 2)} = 1 AS is_new,
            CAST('0x' || substr(md5(w),1,15) AS BIGINT) % 1024 AS b FROM tok),
        counts AS (SELECT source, b,
            SUM(CASE WHEN is_new THEN 0 ELSE 1 END) AS o_old,
            SUM(CASE WHEN is_new THEN 1 ELSE 0 END) AS o_new
          FROM h GROUP BY source, b),
        tots AS (SELECT source, SUM(o_old) AS t_old, SUM(o_new) AS t_new
          FROM counts GROUP BY source),
        terms AS (SELECT c.source,
            CAST((CAST(c.o_new AS DOUBLE) -
                CAST(c.o_old + c.o_new AS DOUBLE) * t.t_new / (t.t_old + t.t_new))
              * (CAST(c.o_new AS DOUBLE) -
                CAST(c.o_old + c.o_new AS DOUBLE) * t.t_new / (t.t_old + t.t_new))
              / (CAST(c.o_old + c.o_new AS DOUBLE) * t.t_new / (t.t_old + t.t_new))
              AS DECIMAL(28,12)) AS term
          FROM counts c JOIN tots t USING (source)
          WHERE CAST(c.o_old + c.o_new AS DOUBLE) * t.t_new / (t.t_old + t.t_new) > 0)
        SELECT source, ROUND(CAST(SUM(term) AS DOUBLE), 4) AS chi2,
          COUNT(*) AS dof_buckets
        FROM terms GROUP BY source ORDER BY source""".stripMargin)),

    // Near-dup detection at ingest: incoming docs stream their MinHash
    // band rows against the standing corpus's band index; LSH candidate
    // pairs surface as each micro-batch lands (the exact verify stays
    // batch — j28). Full cascade semantics reproduce in DuckDB, so the
    // streamed candidate set is hash-checked end to end.
    Q("i15_stream_band_index",
      (s, d) => graft.streaming.Streams.i15(s, d),
      Some("""WITH tk AS (SELECT doc_id, string_split(text,' ') AS toks FROM documents
            WHERE len(string_split(text,' ')) >= 3),
        shs AS (SELECT DISTINCT doc_id,
            toks[i.i] || ' ' || toks[i.i+1] || ' ' || toks[i.i+2] AS sh
          FROM tk, unnest(range(1, len(toks)-1)) i(i)),
        sh AS (SELECT doc_id,
            CAST('0x' || substr(md5(sh),1,15) AS BIGINT) % 2147483647 AS h FROM shs),
        seeds AS (SELECT unnest(range(0, 32)) AS i,
          unnest([114060684, 143607338, 658016613, 1920833001, 1625018798, 2115868157, 1839658157, 1370607936, 1314768563, 1516846533, 899342927, 1761721496, 1792449689, 2056989732, 1252576877, 638180912, 516347111, 86660098, 1034123048, 390694563, 1490082987, 1456092804, 997229159, 1263980514, 768208874, 373428981, 381249820, 1284903395, 434862591, 97658014, 635475302, 570517315]) AS a,
          unnest([1522425843, 334529765, 1689677233, 1003823822, 1509779900, 1177694471, 385288776, 1001072043, 1286760556, 1140912466, 1555416272, 1474034036, 137111194, 1024637812, 1326353219, 494970825, 731651806, 1540310342, 993191396, 888645945, 1275083898, 325350617, 1359272703, 771243134, 711658336, 269452704, 606543124, 1932692492, 242146161, 1168033289, 31958265, 1568728816]) AS b),
        mh AS (SELECT doc_id, i, MIN((a * h + b) % 2147483647) AS m
          FROM sh, seeds GROUP BY doc_id, i),
        sig AS (SELECT doc_id, list(m ORDER BY i) AS sig FROM mh GROUP BY doc_id)
        SELECT DISTINCT i.doc_id AS d_inc, c.doc_id AS d_corp
        FROM sig i JOIN sig c
          ON i.doc_id % 2 = 1 AND c.doc_id % 2 = 0
          AND EXISTS (SELECT 1 FROM unnest(range(0, 8)) r(b)
            WHERE list_slice(i.sig, r.b*4+1, r.b*4+4) = list_slice(c.sig, r.b*4+1, r.b*4+4))
        ORDER BY d_inc, d_corp""")),

    // Bounded-batch streaming backfill: the events table is landed as many
    // parquet files; the stream drains them AvailableNow but at most 3
    // files per micro-batch — the rate-limited catch-up mode that bounds
    // per-batch state/shuffle when a stream restarts days behind. The
    // graded output is the drained aggregate (== batch oracle) plus the
    // invariant that it took > 1 micro-batch.
    Q("i14_stream_backfill",
      (s, d) => graft.streaming.Streams.i14(s, d),
      Some("""SELECT event_type, COUNT(*) AS n,
          CAST(ROUND(SUM(CAST(value AS DECIMAL(18,4))),4) AS DOUBLE) AS sum_v
        FROM events GROUP BY event_type ORDER BY event_type"""))
  )
}
