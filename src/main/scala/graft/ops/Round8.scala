package graft.ops

import org.apache.spark.sql.functions._
import graft.Tables._

/** Round-8 addition — the production lexical scorer the retrieval stack
  * was missing: j41's hybrid score uses naive term-set overlap for its
  * lexical half; real RAG/serving stacks rank the lexical leg with BM25
  * (Robertson et al., TREC-3; the k1/b formulation every search engine
  * ships). One new key:
  *
  *   - `j42_bm25` — Okapi BM25 top-10 for a fixed query term set, with
  *     the +1 idf smoothing (Lucene's variant, so idf stays positive
  *     even for df > N/2).
  *
  * Scale shape: doc lengths are carried through the tf aggregation
  * (constant per doc), so no separate dl join exists; the (N, avgdl)
  * statistics collapse to ONE broadcast row; per-term df over the query
  * terms is bounded by |q| (broadcast); tf touches only postings whose
  * term is in the query (the isin predicate rides the explode inside one
  * codegen stage, so the corpus-wide term stream never shuffles — only
  * matching (doc, term) rows reach the groupBy). Scoring is a
  * broadcast-only join fan-in onto the tf rows, the final top-10 is
  * TakeOrderedAndProject. At 100 TB the only corpus-sized shuffle is the
  * (doc_id, term) tf aggregation over query-matching terms.
  *
  * Exactness discipline (the j17/j32 device): per-term contributions are
  * computed in DOUBLE with an identical operation ORDER in both engines
  * (all constants written as the same literals — 2.2, 1.2, 0.25, 0.75 —
  * never re-derived arithmetic like k1+1, whose double value differs
  * from the literal 2.2), rounded to 6 and cast to DECIMAL(18,6) so the
  * per-doc SUM is order-free, then surfaced as DOUBLE. */
object Round8 {

  private val QTerms = Seq("table", "scan", "join", "filter",
    "window", "agg", "sort", "hash")

  /** (doc_id, score) Okapi BM25 over the fixed query term set — the j42
    * body, shared with j43's fusion so both keys rank the identical
    * lexical leg. */
  private def bm25Scores(s: org.apache.spark.sql.SparkSession,
      d: String): org.apache.spark.sql.DataFrame = {
    val docs = t(s, d, "documents")
      .select(col("doc_id"), split(col("text"), " ").as("toks"))
    val dl = docs.select(col("doc_id"), size(col("toks")).cast("long").as("dl"))
    // (N, avgdl) — one row; avgdl = exact-long sum / exact count, one
    // double division, identical in DuckDB
    val st = dl.agg(count(lit(1)).as("n"),
      (sum(col("dl")).cast("double") / count(lit(1))).as("avgdl"))
    // dl rides THROUGH the tf aggregation (constant per doc, so max() is
    // exact) instead of joining the corpus-sized dl relation afterwards —
    // that join was a second corpus-sized shuffle; carried this way, the
    // tf groupBy stays the ONLY corpus-sized shuffle and everything
    // downstream is broadcast fan-in onto query-matching rows.
    val tf = docs.select(col("doc_id"), size(col("toks")).cast("long").as("dl"),
        explode(col("toks")).as("term"))
      .where(col("term").isin(QTerms: _*))
      .groupBy("doc_id", "term")
      .agg(count(lit(1)).as("tf"), max(col("dl")).as("dl"))
    // df per query term = tf's row count per term (tf rows are distinct
    // (doc, term) by construction) — ≤ |q| rows, broadcast
    val dfT = tf.groupBy("term").agg(count(lit(1)).as("df"))
    val contrib = tf.join(broadcast(dfT), "term")
      .crossJoin(broadcast(st))
      .select(col("doc_id"),
        round(
          log((col("n") - col("df") + lit(0.5)) / (col("df") + lit(0.5)) + lit(1.0))
            * col("tf") * lit(2.2)
            / (col("tf") + lit(1.2) * (lit(0.25) + lit(0.75) * col("dl") / col("avgdl"))),
          6).cast("decimal(18,6)").as("c"))
    contrib.groupBy("doc_id")
      .agg(sum(col("c")).cast("double").as("score"))
  }

  // j42's BM25 CTE chain, shared verbatim by the j43 oracle
  private val Bm25Ctes =
    """tk AS (SELECT doc_id, string_split(text,' ') AS toks FROM documents),
        dl AS (SELECT doc_id, CAST(len(toks) AS BIGINT) AS dl FROM tk),
        st AS (SELECT COUNT(*) AS n, CAST(SUM(dl) AS DOUBLE)/COUNT(*) AS avgdl FROM dl),
        tf AS (SELECT doc_id, term, COUNT(*) AS tf FROM
            (SELECT doc_id, unnest(toks) AS term FROM tk)
          WHERE term IN ('table','scan','join','filter','window','agg','sort','hash')
          GROUP BY doc_id, term),
        df AS (SELECT term, COUNT(*) AS df FROM tf GROUP BY term),
        sc AS (SELECT tf.doc_id,
            CAST(ROUND(ln((st.n - df.df + 0.5)/(df.df + 0.5) + 1.0)
              * tf.tf * 2.2
              / (tf.tf + 1.2 * (0.25 + 0.75 * dl.dl / st.avgdl)), 6)
              AS DECIMAL(18,6)) AS c
          FROM tf JOIN df USING (term) JOIN dl ON tf.doc_id = dl.doc_id, st),
        agg AS (SELECT doc_id, CAST(SUM(c) AS DOUBLE) AS score
          FROM sc GROUP BY doc_id)"""

  /** File sets of one copy-on-write commit: `v1` = files of the base
    * version, `candidates` = files whose manifest key-range stats overlap
    * the mutation's key range (the stats-prune phase), `affected` ⊆
    * candidates = files that actually contain a mutated row (the
    * scan-prune phase — only candidate files are read), `v2` = the new
    * version's file list (v1 − affected + rewritten/inserted files). The
    * vacuumable set after the commit is exactly `v1 -- v2` = `affected`:
    * files no version ≥ 2 references. */
  private[graft] final case class CowCommit(
      v1: Set[String], candidates: Set[String], affected: Set[String],
      v2: Set[String], tbl: String)

  /** Writes `orders` range-partitioned on o_orderkey into 8 files (so
    * key-range file stats actually prune) and returns
    * (tableDir, maxKey, file-stats DF of (f, klo, khi)). A production
    * writer records the min/max column stats in the write TASK (Iceberg
    * manifest entries, Delta add.stats); here they are computed by one
    * post-write scan because parquet footers aren't exposed to the query
    * layer — the point is the READ side: every later phase touches only
    * stats rows (O(files)) and stats-selected files, never the table. */
  private def cowBase(s: org.apache.spark.sql.SparkSession, d: String,
      tag: String): (String, Long, org.apache.spark.sql.DataFrame) = {
    val tbl = Scratch.unique(tag + "tbl")
    val orders = t(s, d, "orders")
    orders.repartitionByRange(8, col("o_orderkey"))
      .write.mode("overwrite").parquet(tbl)
    // an EMPTY base table has no max key (the aggregate is NULL): any
    // value keeps the derived update/delete ranges empty — use 0
    val mxRow = orders.agg(max(col("o_orderkey"))).head()
    val mx = if (mxRow.isNullAt(0)) 0L else mxRow.getLong(0)
    val stats = s.read.parquet(tbl)
      .select(input_file_name().as("f"), col("o_orderkey"))
      .groupBy("f")
      .agg(min(col("o_orderkey")).as("klo"), max(col("o_orderkey")).as("khi"))
    (tbl, mx, stats)
  }

  private def files(s: org.apache.spark.sql.SparkSession, tbl: String): Set[String] =
    s.read.parquet(tbl).select(input_file_name().as("f"))
      .distinct().collect().map(_.getString(0)).toSet

  /** Manifest-resolved scan via [[ManifestIO.readFiles]], with the table
    * schema taken (lazily, empty path only) from the always-file-backed
    * base table dir. */
  private def readFiles(s: org.apache.spark.sql.SparkSession,
      fs: Seq[String], schemaFrom: String): org.apache.spark.sql.DataFrame =
    ManifestIO.readFiles(s, fs, s.read.parquet(schemaFrom).schema)

  /** Copy-on-write MERGE (Delta/Iceberg `MERGE INTO`, reduced to its
    * core): matched rows (o_orderkey % 7 = 0 AND ≤ max/8 — a key-range-
    * local update batch) get o_totalprice doubled; a not-matched batch
    * (keys shifted past max) is inserted as new files. Two-phase file
    * selection: manifest stats prune to files whose [klo, khi] overlaps
    * the update range (klo ≤ max/8), then ONLY those candidates are
    * scanned to find files truly containing a matched key. Affected files
    * are rewritten with the update applied (broadcast join — the update
    * batch is small by construction in any sane MERGE); untouched files
    * carry forward into the v2 manifest BY REFERENCE. At 100 TB: the
    * rewrite IO is O(affected files), the planning IO is O(manifest) —
    * never O(table). File-list collects are O(files), the same driver-
    * side manifest-resolution allowance a23/a24 established. */
  private[graft] def mergeCommit(s: org.apache.spark.sql.SparkSession,
      d: String, tag: String): CowCommit = {
    val (tbl, mx, stats) = cowBase(s, d, tag)
    val lo = mx / 8
    val v1 = files(s, tbl)
    val orders = t(s, d, "orders")
    val upd = orders
      .where(col("o_orderkey") % 7 === 0 && col("o_orderkey") <= lo)
      .select(col("o_orderkey"), (col("o_totalprice") * 2).as("new_price"))
    val candidates = stats.where(col("klo") <= lo)
      .select("f").collect().map(_.getString(0)).toSet
    val affected = if (candidates.isEmpty) Set.empty[String]
      else s.read.parquet(candidates.toSeq: _*)
        .select(input_file_name().as("f"), col("o_orderkey"))
        .join(broadcast(upd.select("o_orderkey")), "o_orderkey")
        .select("f").distinct().collect().map(_.getString(0)).toSet
    if (affected.nonEmpty)
      s.read.parquet(affected.toSeq: _*)
        .join(broadcast(upd), Seq("o_orderkey"), "left")
        .withColumn("o_totalprice",
          coalesce(col("new_price"), col("o_totalprice")))
        .drop("new_price")
        .write.mode("append").parquet(tbl)
    orders.where(col("o_orderkey") % 499 === 0)
      .withColumn("o_orderkey", col("o_orderkey") + mx + 1)
      .write.mode("append").parquet(tbl)
    CowCommit(v1, candidates, affected, files(s, tbl) -- affected, tbl)
  }

  /** Copy-on-write row-level DELETE + vacuum accounting: rows matching
    * (o_orderkey % 3 = 0 AND ≤ max/8) are deleted by rewriting only the
    * files that contain them (stats-pruned exactly like [[mergeCommit]]
    * — the predicate is row-local, so the scan-prune phase needs no
    * join); v2 references the survivors' rewrites plus every untouched
    * v1 file. `v1 -- v2` is then precisely the vacuumable set — what
    * `VACUUM` would physically remove once v1's retention lapses. */
  private[graft] def deleteCommit(s: org.apache.spark.sql.SparkSession,
      d: String, tag: String): CowCommit = {
    val (tbl, mx, stats) = cowBase(s, d, tag)
    val lo = mx / 8
    val v1 = files(s, tbl)
    def pred(c: org.apache.spark.sql.Column) = c % 3 === 0 && c <= lo
    val candidates = stats.where(col("klo") <= lo)
      .select("f").collect().map(_.getString(0)).toSet
    val affected = if (candidates.isEmpty) Set.empty[String]
      else s.read.parquet(candidates.toSeq: _*)
        .select(input_file_name().as("f"), col("o_orderkey"))
        .where(pred(col("o_orderkey")))
        .select("f").distinct().collect().map(_.getString(0)).toSet
    if (affected.nonEmpty)
      s.read.parquet(affected.toSeq: _*)
        .where(!pred(col("o_orderkey")))
        .write.mode("append").parquet(tbl)
    CowCommit(v1, candidates, affected, files(s, tbl) -- affected, tbl)
  }

  /** Two-commit versioned table under a tag-scoped scratch root: version
    * 1 = orders with o_orderkey % 3 != 0, version 2 = everything (batch 2
    * appended). Each commit records the file LIST as a parquet manifest
    * under `<mani>/v=<n>` — shared by a23 (pin a version) and a24 (diff
    * two versions). Returns (tableDir, manifestDir). */
  private def versionedSnapshots(s: org.apache.spark.sql.SparkSession,
      d: String, tag: String): (String, String) = {
    val tbl = Scratch.unique(tag + "tbl"); val mani = Scratch.unique(tag + "mani")
    val orders = t(s, d, "orders")
    def commit(v: Int): Unit =
      s.read.parquet(tbl).select(input_file_name().as("f")).distinct()
        .write.mode("overwrite").parquet(s"$mani/v=$v")
    orders.where(col("o_orderkey") % 3 =!= 0)
      .write.mode("overwrite").parquet(tbl)
    commit(1)
    orders.where(col("o_orderkey") % 3 === 0)
      .write.mode("append").parquet(tbl)
    commit(2)
    (tbl, mani)
  }

  val all: Seq[Q] = Seq(

    // Snapshot-versioned reads ("time travel") — the table-format
    // capability the manifest machinery (a22) was one step short of:
    // every commit writes a versioned manifest (the file LIST as a
    // parquet table — distributed write, never a driver-side set), and a
    // reader pins any historical version by scanning exactly that
    // manifest's files, immune to later appends — Delta/Iceberg's
    // `VERSION AS OF`, reduced to its core: immutable data files +
    // versioned file lists. The proof: after version 2 lands, the
    // version-1 read still aggregates to the batch-1-only oracle.
    // Driver-side file-list collect is the read API's inherent need
    // (every table format resolves the manifest on the driver before
    // distributed scan planning); it is O(files-per-version), not O(rows).
    Q("a23_time_travel",
      (s, d) => {
        val (tbl, mani) = versionedSnapshots(s, d, "a23")
        def asOf(v: Int) = readFiles(s,
          s.read.parquet(s"$mani/v=$v").collect().map(_.getString(0)).toIndexedSeq, tbl)
        Seq(1, 2).map { v =>
          asOf(v).withColumn("version", lit(v.toLong))
            .groupBy("version", "o_orderstatus")
            .agg(count(lit(1)).as("n_orders"), mSum(col("o_totalprice")).as("sum_price"))
        }.reduce(_.unionAll(_)).orderBy("version", "o_orderstatus")
      },
      Some("""SELECT CAST(1 AS BIGINT) AS version, o_orderstatus,
          COUNT(*) AS n_orders,
          CAST(ROUND(SUM(CAST(o_totalprice AS DECIMAL(18,4))),4) AS DOUBLE) AS sum_price
        FROM orders WHERE o_orderkey % 3 <> 0 GROUP BY o_orderstatus
        UNION ALL
        SELECT CAST(2 AS BIGINT), o_orderstatus, COUNT(*),
          CAST(ROUND(SUM(CAST(o_totalprice AS DECIMAL(18,4))),4) AS DOUBLE)
        FROM orders GROUP BY o_orderstatus
        ORDER BY version, o_orderstatus""")),

    // Incremental read between versions — the consumption side of a23's
    // versioned manifests (what Delta's change-data-feed does for
    // append-only tables): a downstream job that already processed
    // version N reads EXACTLY the files version N+1 added — a
    // distributed anti-join of the two manifest tables, never a data
    // diff — so catch-up work is O(delta), not O(table). The oracle is
    // the batch-2-only aggregate: any batch-1 file leaking into the
    // delta, or any added file missed, hash-fails.
    Q("a24_version_diff",
      (s, d) => {
        val (tbl, mani) = versionedSnapshots(s, d, "a24")
        val added = s.read.parquet(s"$mani/v=2")
          .join(s.read.parquet(s"$mani/v=1"), Seq("f"), "left_anti")
          .collect().map(_.getString(0))
        readFiles(s, added.toIndexedSeq, tbl)
          .groupBy("o_orderstatus")
          .agg(count(lit(1)).as("n_orders"), mSum(col("o_totalprice")).as("sum_price"))
          .orderBy("o_orderstatus")
      },
      Some("""SELECT o_orderstatus, COUNT(*) AS n_orders,
          CAST(ROUND(SUM(CAST(o_totalprice AS DECIMAL(18,4))),4) AS DOUBLE) AS sum_price
        FROM orders WHERE o_orderkey % 3 = 0
        GROUP BY o_orderstatus ORDER BY o_orderstatus""")),

    // MERGE INTO, copy-on-write — the mutation the append-only arc
    // (a22 manifest → a23 time travel → a24 version diff) was missing:
    // matched rows update in place, not-matched rows insert, and the new
    // version rewrites ONLY the files that contain a matched key (file
    // selection is stats-pruned, then scan-verified over candidates
    // alone). The oracle recomputes the merged table logically from
    // `orders` — any lost insert, unapplied update, double-applied
    // rewrite, or dropped untouched file hash-fails the aggregate.
    Q("a25_merge_upsert",
      (s, d) => {
        val c = mergeCommit(s, d, "a25")
        readFiles(s, c.v2.toSeq, c.tbl)
          .groupBy("o_orderstatus")
          .agg(count(lit(1)).as("n_orders"), mSum(col("o_totalprice")).as("sum_price"))
          .orderBy("o_orderstatus")
      },
      Some("""WITH mx AS (SELECT MAX(o_orderkey) AS mx, MAX(o_orderkey) // 8 AS lo
            FROM orders),
          merged AS (
            SELECT o_orderstatus,
              CASE WHEN o_orderkey % 7 = 0 AND o_orderkey <= (SELECT lo FROM mx)
                   THEN o_totalprice * 2 ELSE o_totalprice END AS p
            FROM orders
            UNION ALL
            SELECT o_orderstatus, o_totalprice AS p FROM orders
            WHERE o_orderkey % 499 = 0)
          SELECT o_orderstatus, COUNT(*) AS n_orders,
            CAST(ROUND(SUM(CAST(p AS DECIMAL(18,4))),4) AS DOUBLE) AS sum_price
          FROM merged GROUP BY o_orderstatus ORDER BY o_orderstatus""")),

    // Row-level DELETE, copy-on-write: deleted rows vanish from v2 while
    // every untouched v1 file carries forward by reference; the files no
    // version ≥ 2 references (v1 − v2) are exactly what VACUUM would
    // reclaim — Round8Spec pins that set equality. The oracle is the
    // logical complement of the delete predicate over `orders`.
    Q("a26_delete_vacuum",
      (s, d) => {
        val c = deleteCommit(s, d, "a26")
        readFiles(s, c.v2.toSeq, c.tbl)
          .groupBy("o_orderstatus")
          .agg(count(lit(1)).as("n_orders"), mSum(col("o_totalprice")).as("sum_price"))
          .orderBy("o_orderstatus")
      },
      Some("""WITH mx AS (SELECT MAX(o_orderkey) // 8 AS lo FROM orders)
          SELECT o_orderstatus, COUNT(*) AS n_orders,
            CAST(ROUND(SUM(CAST(o_totalprice AS DECIMAL(18,4))),4) AS DOUBLE) AS sum_price
          FROM orders
          WHERE NOT (o_orderkey % 3 = 0 AND o_orderkey <= (SELECT lo FROM mx))
          GROUP BY o_orderstatus ORDER BY o_orderstatus""")),

    // Streaming → versioned table: every micro-batch commits manifest
    // v=batchId (previous file list + the batch's new files), so the
    // stream PRODUCES the table the a23/a24/a25/a26 readers consume —
    // atomic-prefix versions, exactly-once via checkpoint + batch-dir
    // overwrite. Graded output = the latest version read back through
    // its manifest (batch-equivalent aggregate).
    Q("i16_stream_table_commit",
      (s, d) => graft.streaming.Streams.i16(s, d),
      Some("""SELECT event_type, COUNT(*) AS n,
          CAST(ROUND(SUM(CAST(value AS DECIMAL(18,4))),4) AS DOUBLE) AS sum_v
        FROM events GROUP BY event_type ORDER BY event_type""")),

    Q("j42_bm25",
      (s, d) => bm25Scores(s, d)
        .orderBy(desc("score"), asc("doc_id")).limit(10),
      Some(s"""WITH $Bm25Ctes
        SELECT doc_id, score FROM agg
        ORDER BY score DESC, doc_id LIMIT 10""")),

    // Reciprocal-rank fusion — the standard hybrid fusion step (Cormack
    // et al., SIGIR'09; k=60): fuse the BM25 lexical top-100 with the
    // probe-vector cosine top-100 by 1/(60+rank), so a document strong on
    // either leg surfaces without any score normalization across
    // incomparable scales (BM25 vs cosine — exactly why RRF displaced
    // weighted-sum fusion in production stacks; j41's 0.5/0.5 weighted
    // hybrid is the contrast case). Scale shape: each leg ends in
    // TakeOrderedAndProject(100) — the only global operators run on
    // ≤ 100-row relations (the rank windows and the outer join), so the
    // single-partition window is bounded by construction, never by
    // corpus size. Rank arithmetic is integer; 1/(60+r) is one double
    // division summed in a fixed two-term order — hash-exact.
    Q("j43_rrf_fusion",
      (s, d) => {
        val K = 100
        import org.apache.spark.sql.expressions.Window
        val wl = Window.orderBy(desc("score"), asc("doc_id"))
        val lex = bm25Scores(s, d)
          .orderBy(desc("score"), asc("doc_id")).limit(K)
          .select(col("doc_id"), row_number().over(wl).cast("long").as("r_lex"))
        val emb = t(s, d, "embeddings")
        val probe = emb.where(col("vec_id") === 0).select(col("embedding").as("e0"))
        val wv = Window.orderBy(desc("cos"), asc("doc_id"))
        val vec = emb.where(col("vec_id") =!= 0).crossJoin(broadcast(probe))
          .select(col("vec_id").as("doc_id"),
            round(graft.expressions.CosineSimilarity(s, col("embedding"), col("e0")), 6)
              .as("cos"))
          .orderBy(desc("cos"), asc("doc_id")).limit(K)
          .select(col("doc_id"), row_number().over(wv).cast("long").as("r_vec"))
        lex.join(vec, Seq("doc_id"), "full_outer")
          .select(col("doc_id"), col("r_lex"), col("r_vec"),
            round(coalesce(lit(1.0) / (lit(60) + col("r_lex")), lit(0.0))
              + coalesce(lit(1.0) / (lit(60) + col("r_vec")), lit(0.0)), 6).as("rrf"))
          .orderBy(desc("rrf"), asc("doc_id")).limit(10)
      },
      Some(s"""WITH $Bm25Ctes,
        bmk AS (SELECT doc_id, score FROM agg ORDER BY score DESC, doc_id LIMIT 100),
        bmr AS (SELECT doc_id,
            row_number() OVER (ORDER BY score DESC, doc_id) AS r_lex FROM bmk),
        e AS (SELECT vec_id, generate_subscripts(embedding,1) AS dd,
            CAST(unnest(embedding) AS DOUBLE) AS v FROM embeddings),
        p0 AS (SELECT dd, v FROM e WHERE vec_id = 0),
        pn AS (SELECT sqrt(SUM(v*v)) AS n0 FROM p0),
        dots AS (SELECT e.vec_id AS doc_id, SUM(e.v*p0.v) AS dot,
            sqrt(SUM(e.v*e.v)) AS n1
          FROM e JOIN p0 USING (dd) WHERE e.vec_id != 0 GROUP BY e.vec_id),
        vk AS (SELECT doc_id,
            ROUND(dot/(n1*(SELECT n0 FROM pn)),6) AS cos
          FROM dots ORDER BY cos DESC, doc_id LIMIT 100),
        vr AS (SELECT doc_id,
            row_number() OVER (ORDER BY cos DESC, doc_id) AS r_vec FROM vk),
        f AS (SELECT COALESCE(bmr.doc_id, vr.doc_id) AS doc_id, r_lex, r_vec
          FROM bmr FULL OUTER JOIN vr ON bmr.doc_id = vr.doc_id)
        SELECT doc_id, r_lex, r_vec,
          ROUND(COALESCE(CAST(1 AS DOUBLE)/(60+r_lex), 0)
            + COALESCE(CAST(1 AS DOUBLE)/(60+r_vec), 0), 6) AS rrf
        FROM f ORDER BY rrf DESC, doc_id LIMIT 10""")),

    // Sketch rollup along the TIME axis — the production distinct-count
    // dashboard pattern: per-hour HLL sketches are the stored
    // pre-aggregate (built in the ONE pass that touches raw events);
    // per-day distinct users come from hll_union_agg over 24 sketch rows
    // — the re-aggregation never rescans the corpus. d19 proved
    // mergeability across groups; this is the same algebra down a
    // time hierarchy (hour → day), which is how a 100 TB event store
    // serves "daily uniques" without a daily full scan: O(hours × 2^lgK)
    // bytes re-aggregated instead of O(events). Exact-regime graded: 150
    // distinct users ≪ the lgK=14 coupon bound (d19's device), so the
    // estimate — including every union — is exact and the oracle uses
    // exact DISTINCTs; exact_users rides along for in-row
    // reconciliation.
    Q("d22_hll_time_rollup",
      (s, d) => Views.unique(s, "graft_d22_events" -> events(s, d)) { v =>
        s.sql(s"""
          WITH e AS (
            SELECT ts_ms div 3600000 AS hour, ts_ms div 86400000 AS day,
                   user_id
            FROM ${v("graft_d22_events")}),
          hours AS (
            SELECT day, hour, hll_sketch_agg(user_id, 14) AS sk
            FROM e GROUP BY day, hour),
          days AS (
            SELECT day, COUNT(*) AS n_hours,
                   CAST(hll_sketch_estimate(hll_union_agg(sk)) AS BIGINT) AS est_users
            FROM hours GROUP BY day),
          ex AS (
            SELECT day, COUNT(DISTINCT user_id) AS exact_users
            FROM e GROUP BY day)
          SELECT days.day, days.n_hours, days.est_users, ex.exact_users
          FROM days JOIN ex ON days.day = ex.day
          ORDER BY days.day""")
      },
      Some("""WITH e AS (
            SELECT CAST(epoch_ms(ts) AS BIGINT) // 3600000 AS hour,
                   CAST(epoch_ms(ts) AS BIGINT) // 86400000 AS day, user_id
            FROM events)
          SELECT day, CAST(COUNT(DISTINCT hour) AS BIGINT) AS n_hours,
                 CAST(COUNT(DISTINCT user_id) AS BIGINT) AS est_users,
                 CAST(COUNT(DISTINCT user_id) AS BIGINT) AS exact_users
          FROM e GROUP BY day ORDER BY day""")),

    // Pairwise corpus-overlap matrix via mergeable HLL sketches +
    // inclusion–exclusion: |A∩B| = |A| + |B| − |A∪B|, with |A∪B| from
    // hll_union of the two per-source sketches — the "how much does
    // source X duplicate source Y" diagnostic a mixture designer (j30's
    // weights, j38's budget) reads before setting weights. THE scale
    // property is mergeability: the corpus is touched ONCE (one shuffle
    // on source, partial HLL agg map-side); every pairwise number comes
    // from the |sources|-row sketch relation (theta self-join, broadcast
    // — O(sources²) pair rows of O(2^lgK)-byte sketches, never a
    // corpus-sized join; doc contents never pairwise-compared). Grading
    // rides d19's exact-coupon device: fingerprints are compressed to a
    // 512-value domain (md5-derived, j44's conv device) under lgK=14, so
    // every estimate — including the union's — is exact and the DuckDB
    // oracle recomputes the same numbers with exact DISTINCTs.
    Q("j45_corpus_overlap",
      (s, d) => Views.unique(s, "graft_j45_docs" -> t(s, d, "documents")) { v =>
        s.sql(s"""
          WITH fp AS (
            SELECT source,
                   CAST(conv(substring(md5(text),1,4),16,10) AS BIGINT) % 512 AS fp
            FROM ${v("graft_j45_docs")}),
          sk AS (
            SELECT source, hll_sketch_agg(fp, 14) AS sk,
                   COUNT(DISTINCT fp) AS nd
            FROM fp GROUP BY source)
          SELECT a.source AS src_a, b.source AS src_b,
                 a.nd AS nd_a, b.nd AS nd_b,
                 CAST(hll_sketch_estimate(hll_union(a.sk, b.sk)) AS BIGINT) AS nd_union,
                 a.nd + b.nd
                   - CAST(hll_sketch_estimate(hll_union(a.sk, b.sk)) AS BIGINT) AS nd_overlap
          FROM sk a JOIN sk b ON a.source < b.source
          ORDER BY src_a, src_b""")
      },
      Some("""WITH fp AS (
            SELECT source,
                   CAST('0x' || substr(md5(text),1,4) AS BIGINT) % 512 AS fp
            FROM documents),
          n AS (SELECT source, CAST(COUNT(DISTINCT fp) AS BIGINT) AS nd
            FROM fp GROUP BY source),
          pairs AS (SELECT n1.source AS src_a, n2.source AS src_b,
              n1.nd AS nd_a, n2.nd AS nd_b
            FROM n n1 JOIN n n2 ON n1.source < n2.source),
          un AS (SELECT p.src_a, p.src_b,
              CAST(COUNT(DISTINCT f.fp) AS BIGINT) AS nd_union
            FROM pairs p JOIN fp f ON f.source = p.src_a OR f.source = p.src_b
            GROUP BY p.src_a, p.src_b)
          SELECT p.src_a, p.src_b, p.nd_a, p.nd_b, u.nd_union,
                 p.nd_a + p.nd_b - u.nd_union AS nd_overlap
          FROM pairs p JOIN un u ON p.src_a = u.src_a AND p.src_b = u.src_b
          ORDER BY p.src_a, p.src_b""")),

    // Cluster-safe train/val/test split — the leakage guard j15's
    // row-hash split cannot give: near-duplicate documents hashed
    // independently land in DIFFERENT splits ~19% of the time (2·0.8·0.1
    // + …), leaking eval content into training. Here the split key is
    // the near-dup CLUSTER id (j14's connected components; singletons
    // are their own cluster), so an entire duplicate cluster moves as
    // one unit — j15's exact md5-bucket arithmetic, applied one level
    // up. The oracle recomputes the clusters via the RECURSIVE CTE and
    // the split byte-for-byte. At 100 TB: pairs are LSH-pruned, CC is
    // the hybrid path, the split itself is a map-only projection.
    Q("j44_cluster_safe_split",
      (s, d) => {
        val pairs = LlmOps.jaccardPairs(LlmOps.shingles(s, d),
          LlmOps.shingleCounts(s, d), Knobs.pairMaxDf(s)).select("d1", "d2")
        val labeled = CC.cluster(s, pairs)
        t(s, d, "documents").select(col("doc_id"))
          .join(labeled, Seq("doc_id"), "left")
          .select(col("doc_id"),
            coalesce(col("cluster"), col("doc_id")).as("cluster"))
          .withColumn("bucket",
            expr("cast(conv(substring(md5(cast(cluster as string)),1,8),16,10) as bigint) % 100"))
          .withColumn("split",
            when(col("bucket") < 80, "train")
              .when(col("bucket") < 90, "val").otherwise("test"))
          .select("doc_id", "cluster", "bucket", "split")
          .orderBy("doc_id")
      },
      Some("""WITH RECURSIVE tk AS (SELECT doc_id, string_split(text,' ') AS toks
          FROM documents WHERE len(string_split(text,' ')) >= 3),
        sh AS (SELECT DISTINCT doc_id,
            toks[i.i] || ' ' || toks[i.i+1] || ' ' || toks[i.i+2] AS sh
          FROM tk, unnest(range(1, len(toks)-1)) i(i)),
        n AS (SELECT doc_id, COUNT(*) AS n FROM sh GROUP BY doc_id),
        p AS (SELECT a.doc_id AS d1, b.doc_id AS d2, COUNT(*) AS inter
          FROM sh a JOIN sh b ON a.sh = b.sh AND a.doc_id < b.doc_id
          GROUP BY a.doc_id, b.doc_id),
        e AS (SELECT d1, d2 FROM p JOIN n n1 ON d1 = n1.doc_id JOIN n n2 ON d2 = n2.doc_id
          WHERE CAST(inter AS DOUBLE) / CAST(n1.n + n2.n - inter AS DOUBLE) >= 0.5),
        und AS (SELECT d1 AS a, d2 AS b FROM e UNION ALL SELECT d2, d1 FROM e),
        reach(a, b) AS (SELECT a, b FROM und
          UNION SELECT r.a, u.b FROM reach r JOIN und u ON r.b = u.a),
        lab AS (SELECT a AS doc_id, LEAST(a, MIN(b)) AS cluster
          FROM reach GROUP BY a),
        f AS (SELECT d.doc_id, COALESCE(l.cluster, d.doc_id) AS cluster
          FROM documents d LEFT JOIN lab l USING (doc_id)),
        g AS (SELECT doc_id, cluster,
            CAST('0x' || substr(md5(CAST(cluster AS VARCHAR)),1,8) AS BIGINT) % 100 AS bucket
          FROM f)
        SELECT doc_id, cluster, bucket,
          CASE WHEN bucket < 80 THEN 'train'
               WHEN bucket < 90 THEN 'val' ELSE 'test' END AS split
        FROM g ORDER BY doc_id""")))
}
