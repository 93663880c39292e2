package graft.ops

import org.apache.spark.sql.functions._
import graft.Tables._

/** Round-18 additions. Headline: j90b — the IVF-pruned leg of semantic
  * decontamination (r17 verdict item 4). The j-keys are EXT per SURVEY
  * §1 (BASELINE.json north-star extensions); reference surface for SQL
  * passthrough remains `pandas_td/td.py :: read_td_query` (§0-caveated
  * anchor).
  */
object Round18 {

  /** j90b's candidate core, shared with ScaleSoak's decontam row:
    * `tagged` is (vec_id, embedding, label, is_bench); returns the IVF-
    * pruned scored pairs (b_id, t_id, cos) — per-label decimal-exact
    * centroids, rounded-argmax cell assignment, bench probes search
    * their `nprobe` nearest cells, train docs stay in their home cell,
    * candidates via equi-join on cell. */
  private[graft] def ivfPairs(
      tagged: org.apache.spark.sql.DataFrame,
      nprobe: Int): org.apache.spark.sql.DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val s = tagged.sparkSession
    val dims = tagged.select(col("vec_id"), col("label"), col("is_bench"),
        posexplode(col("embedding")).as(Seq("dim", "v")))
      .select(col("vec_id"), col("label"), col("is_bench"), col("dim"),
        // saturating ingest (LlmOps.cleanCoord): corrupt +-1e30/NaN
        // coordinates would overflow the decimal-exact centroid cast
        LlmOps.cleanCoord(col("v")).as("v"))
    // coarse quantizer: decimal-exact per-dim means per label cell
    // (order-independent sums → byte-identical centroids cross-engine)
    val centd = dims.groupBy("label", "dim")
      .agg((sum(col("v").cast("decimal(28,12)")) / count(lit(1)))
        .cast("double").as("c"))
      .select(col("label").as("cell"), col("dim"), col("c"))
    val norms = dims.groupBy("vec_id")
      .agg(sqrt(sum(col("v") * col("v"))).as("nv"))
    val cnorms = centd.groupBy("cell")
      .agg(sqrt(sum(col("c") * col("c"))).as("nc"))
    val csim = dims.join(broadcast(centd), "dim")
      .groupBy("vec_id", "cell").agg(sum(col("v") * col("c")).as("dot"))
      .join(norms, "vec_id").join(broadcast(cnorms), "cell")
      // zero-norm guard (EmbeddingGuardSpec): csim of a zero vector is
      // DEFINED 0 — ANSI would throw on the 0 denominator
      .select(col("vec_id"), col("cell"),
        round(when(col("nv") * col("nc") === 0.0, lit(0.0))
          .otherwise(col("dot") / (col("nv") * col("nc"))), 6).as("csim"))
    val wAssign = Window.partitionBy("vec_id")
      .orderBy(desc("csim"), asc("cell"))
    // eager localCheckpoint: the probe and train branches below filter
    // the SAME assignment relation at different rn cuts (<=nprobe vs =1),
    // which makes their WindowGroupLimit trees structurally different —
    // ReuseExchange cannot unify them and the whole quantizer subtree
    // (dim explode, centroid aggregate, dot products, argmax window)
    // would execute twice per run (verified in the r18-s2 plan dump).
    // One materialization of the |vectors|×k assignment rows halves the
    // dominant cost; the j46/j2c eager-checkpoint precedent.
    val assigned = csim.withColumn("rn", row_number().over(wAssign))
      .localCheckpoint()
    val benchIds = tagged.where(col("is_bench"))
      .select(col("vec_id").as("b_id"), col("embedding").as("e_b"))
    val probeCells = assigned.join(benchIds,
        assigned("vec_id") === benchIds("b_id"))
      .where(col("rn") <= nprobe)
      .select(col("b_id"), col("cell"), col("e_b"))
    val trainCells = assigned.where(col("rn") === 1)
      .join(tagged.where(!col("is_bench"))
        .select(col("vec_id"), col("embedding")), "vec_id")
      .select(col("vec_id").as("t_id"), col("cell"), col("embedding"))
    trainCells.join(broadcast(probeCells), "cell")
      .select(col("b_id"), col("t_id"),
        round(graft.expressions.CosineSimilarity(s,
          col("embedding"), col("e_b")), 6).as("cos"))
  }

  def all: Seq[Q] = Seq(

    // j90b — IVF-PRUNED semantic decontamination. j90's brute-force
    // bench×train cosine sweep is the correct review-list shape, but at
    // 10⁴ bench probes × a 100 TB train corpus the per-train-doc constant
    // (10⁴ cosines each) dominates. This key routes both sides through
    // the j3d IVF coarse quantizer: per-label DECIMAL-exact centroids
    // (10 cells — the fixture's label cardinality, verified [0,9] at
    // every SF; broadcastable at any corpus size), every tagged vector
    // assigned to its argmax-cosine cell (rounded to 6 before the argmax
    // so the winner is ulp-robust cross-engine, ties ascending), each
    // BENCH probe searches only its nprobe=6 nearest cells. Train-side
    // work drops from |bench|×|train| cosines to |bench|×(6/10 of train)
    // — and at scale the cell id is the partition key: candidate
    // generation is an equi-join on cell, so a probe touches nprobe/k of
    // the corpus instead of streaming all of it (k here is the 10
    // fixture labels; production sizes k ~ √N so nprobe/k ≪ 1 — the
    // soak's decontam corpus uses k=16 and records that sharper
    // geometry). nprobe was CHOSEN FROM THE MEASURED RECALL CURVE vs
    // j90's exact top-5 at sf0.01: nprobe 2 → 0.39, 4 → 0.64, 6 → 0.78
    // — the synthetic embeddings are weakly clustered (near-worst case
    // for a coarse quantizer; text embeddings cluster far more sharply),
    // so the curve, not a folklore default, sets the knob. Recall ≥ 0.7
    // is pinned in Round18Spec (the j2b/j2c pattern), as is the
    // scored-pair fraction: measured 0.597 of brute force at sf0.001 —
    // within rounding of the even-cell expectation 6/10 = 0.60 (the
    // fixture's cells are near-even; an earlier revision misread the
    // cell count as 16 and narrated the 0.60 as skew — corrected r18 s2).
    // The answer is the IVF algorithm's own answer and the oracle
    // replays the SAME algorithm, so the key is oracle-exact.
    Q("j90b_decontam_ivf",
      (s, d) => {
        import org.apache.spark.sql.expressions.Window
        val emb = t(s, d, "embeddings")
        val src = t(s, d, "documents").select(col("doc_id"), col("source"))
        val tagged = emb.join(src, emb("vec_id") === src("doc_id"))
          .select(col("vec_id"), col("embedding"), col("label"),
            (col("source") === "src0").as("is_bench"))
        val pairs = ivfPairs(tagged, nprobe = 6)
        val w = Window.partitionBy("b_id").orderBy(desc("cos"), asc("t_id"))
        pairs.withColumn("rank", row_number().over(w).cast("long"))
          .where(col("rank") <= 5)
          .select(col("b_id"), col("rank"), col("t_id"), col("cos"))
          .orderBy("b_id", "rank")
      },
      Some("""WITH tagged AS (SELECT e.vec_id, e.embedding, e.label,
              d.source = 'src0' AS is_bench
            FROM embeddings e JOIN documents d ON e.vec_id = d.doc_id),
          ex AS (SELECT vec_id, label, is_bench,
              generate_subscripts(embedding, 1) - 1 AS dim,
              CAST(unnest(embedding) AS DOUBLE) AS v FROM tagged),
          centd AS (SELECT label AS cell, dim,
              CAST(SUM(CAST(v AS DECIMAL(28,12))) / COUNT(*) AS DOUBLE) AS c
            FROM ex GROUP BY label, dim),
          norms AS (SELECT vec_id, sqrt(SUM(v*v)) AS nv FROM ex GROUP BY vec_id),
          cnorms AS (SELECT cell, sqrt(SUM(c*c)) AS nc FROM centd GROUP BY cell),
          csim AS (SELECT ex.vec_id, centd.cell,
              ROUND(COALESCE(SUM(ex.v * centd.c)
                / NULLIF(ANY_VALUE(n.nv) * ANY_VALUE(cn.nc), 0), 0), 6) AS csim
            FROM ex JOIN centd USING (dim)
              JOIN norms n ON ex.vec_id = n.vec_id
              JOIN cnorms cn ON centd.cell = cn.cell
            GROUP BY ex.vec_id, centd.cell),
          ranked AS (SELECT vec_id, cell, csim,
              row_number() OVER (PARTITION BY vec_id
                ORDER BY csim DESC, cell) AS rn
            FROM csim),
          bench AS (SELECT vec_id AS b_id FROM tagged WHERE is_bench),
          pcells AS (SELECT r.vec_id AS b_id, r.cell FROM ranked r
            JOIN bench b ON r.vec_id = b.b_id WHERE r.rn <= 6),
          tcells AS (SELECT r.vec_id AS t_id, r.cell FROM ranked r
            JOIN tagged t ON r.vec_id = t.vec_id
            WHERE r.rn = 1 AND NOT t.is_bench),
          cand AS (SELECT p.b_id, t.t_id FROM pcells p
            JOIN tcells t ON p.cell = t.cell),
          dots AS (SELECT c.b_id, c.t_id,
              SUM(tv.v * bv.v) AS dot
            FROM cand c
            JOIN ex tv ON tv.vec_id = c.t_id
            JOIN ex bv ON bv.vec_id = c.b_id AND bv.dim = tv.dim
            GROUP BY c.b_id, c.t_id),
          scored AS (SELECT d.b_id, d.t_id,
              ROUND(COALESCE(d.dot / NULLIF(nt.nv * nb.nv, 0), 0), 6) AS cos
            FROM dots d
            JOIN norms nt ON nt.vec_id = d.t_id
            JOIN norms nb ON nb.vec_id = d.b_id),
          rk AS (SELECT b_id, t_id, cos,
              CAST(row_number() OVER (PARTITION BY b_id
                ORDER BY cos DESC, t_id) AS BIGINT) AS rank
            FROM scored)
        SELECT b_id, rank, t_id, cos FROM rk
        WHERE rank <= 5 ORDER BY b_id, rank""")),

    // j91 — the GOPHER quality-rule battery (Rae et al. 2021, Appendix
    // A), the published heuristic filter every web-scale pretraining
    // corpus runs before anything expensive: word-count bounds, mean
    // word length bounds, alphabetic-word ratio, and minimum distinct
    // stop-word presence, each emitted as its own flag plus the
    // composite verdict (a production run keeps the per-rule flags —
    // they are the attribution trail for WHY a doc left, j79's device).
    // Bounds are tuned to the fixture corpus so every rule is
    // non-degenerate (word counts span 10-99, mean word length only
    // 3.7-5.3 — Gopher's published [3,10] would never cut here, so the
    // battery uses [3.8,4.8]; 'the'/'a' are the fixture's stop words,
    // the same set j9/j79 gate on). Map-only:
    // one corpus scan, zero shuffles — at 100 TB this runs at full
    // scan speed and is the cheapest possible first-pass filter.
    Q("j91_gopher_rules",
      (s, d) => t(s, d, "documents")
        .withColumn("toks", split(col("text"), " "))
        .select(col("doc_id"),
          size(col("toks")).cast("long").as("n_words"),
          round(length(translate(col("text"), " ", "")).cast("double") /
            size(col("toks")), 6).as("mean_wlen"),
          size(array_intersect(array_distinct(col("toks")),
            array(lit("the"), lit("a")))).cast("long").as("n_stop"),
          round(expr("size(filter(toks, x -> x rlike '[a-z]'))")
            .cast("double") / size(col("toks")), 6).as("alpha_ratio"))
        .withColumn("pass_words",
          col("n_words") >= 20 && col("n_words") <= 80)
        .withColumn("pass_wlen",
          col("mean_wlen") >= 3.8 && col("mean_wlen") <= 4.8)
        .withColumn("pass_stop", col("n_stop") >= 2)
        .withColumn("pass_alpha", col("alpha_ratio") >= 0.8)
        .withColumn("pass", col("pass_words") && col("pass_wlen") &&
          col("pass_stop") && col("pass_alpha"))
        .orderBy("doc_id"),
      Some("""WITH x AS (SELECT doc_id,
            CAST(len(string_split(text,' ')) AS BIGINT) AS n_words,
            ROUND(CAST(length(replace(text,' ','')) AS DOUBLE)
              / len(string_split(text,' ')), 6) AS mean_wlen,
            CAST(len(list_intersect(list_distinct(string_split(text,' ')),
              ['the','a'])) AS BIGINT) AS n_stop,
            ROUND(CAST(len(list_filter(string_split(text,' '),
              x -> regexp_matches(x,'[a-z]'))) AS DOUBLE)
              / len(string_split(text,' ')), 6) AS alpha_ratio
          FROM documents)
        SELECT doc_id, n_words, mean_wlen, n_stop, alpha_ratio,
          n_words >= 20 AND n_words <= 80 AS pass_words,
          mean_wlen >= 3.8 AND mean_wlen <= 4.8 AS pass_wlen,
          n_stop >= 2 AS pass_stop,
          alpha_ratio >= 0.8 AS pass_alpha,
          (n_words >= 20 AND n_words <= 80)
            AND (mean_wlen >= 3.8 AND mean_wlen <= 4.8)
            AND n_stop >= 2 AND alpha_ratio >= 0.8 AS pass
        FROM x ORDER BY doc_id""")),

    // j92 — quality-proportional REJECTION sampling (the FineWeb-class
    // device: keep each doc with probability equal to its quality
    // score, so the kept corpus's quality distribution tilts up without
    // a hard threshold's cliff). The accept draw is the md5-derived
    // uniform (j15's split device — deterministic, retry-safe, and
    // identical in both engines; never a seeded RNG, which neither
    // engine reproduces cross-engine). score = distinct-token ratio
    // (j9's first component). Map-only: the draw and the score are
    // per-row arithmetic off one scan — at 100 TB this is a full-scan-
    // speed filter, and re-running it after a failure keeps EXACTLY the
    // same docs (the property that makes hash draws, not RNG, the
    // production choice).
    Q("j92_rejection_sample",
      (s, d) => t(s, d, "documents")
        .withColumn("toks", split(col("text"), " "))
        .select(col("doc_id"),
          round(size(array_distinct(col("toks"))).cast("double") /
            size(col("toks")), 6).as("score"),
          round(expr("cast(conv(substring(md5(concat('rs:', " +
            "cast(doc_id as string))),1,8),16,10) as bigint) % 10000")
            .cast("double") / 10000.0, 6).as("draw"))
        .where(col("draw") < col("score"))
        .orderBy("doc_id"),
      Some("""WITH x AS (SELECT doc_id,
            ROUND(CAST(len(list_distinct(string_split(text,' '))) AS DOUBLE)
              / len(string_split(text,' ')), 6) AS score,
            ROUND(CAST(CAST('0x' || substr(md5('rs:' ||
              CAST(doc_id AS VARCHAR)),1,8) AS BIGINT) % 10000 AS DOUBLE)
              / 10000.0, 6) AS draw
          FROM documents)
        SELECT doc_id, score, draw FROM x
        WHERE draw < score ORDER BY doc_id""")),

    // j93 — CURRICULUM ordering with anti-clustering interleave: bucket
    // the corpus into quality deciles (ntile over the j9-style score),
    // then emit the global training order that round-robins one doc per
    // decile per cycle — the standard fix for quality clustering inside
    // shards after curriculum bucketing (a shard of only-easy docs
    // destabilizes training the same way a sorted join key skews a
    // shuffle). The output order is (cycle, decile) — deterministic,
    // tie-broken by doc_id everywhere. The ntile decile assignment is
    // the ONE global ordering in the plan (an unpartitioned window; at
    // 100 TB an operator not needing exact equal-count deciles swaps it
    // for j68's percentile-cut bucketing). The interleave position needs
    // NO second global window (r18-s2 fix — an earlier revision paid a
    // second unpartitioned row_number for it): ntile hands the oversized
    // deciles out as a PREFIX (deciles 1..N mod 10 get the extra row in
    // both engines), so every cycle block contains a decile-prefix and
    // the round-robin position is closed-form per-row arithmetic,
    // train_pos = 10·(cycle−1) + decile. The oracle keeps the
    // row_number-over-(cycle, decile) definition, so the exact gate
    // PROVES the closed form ≡ the definition at both SFs.
    Q("j93_curriculum_order",
      (s, d) => {
        import org.apache.spark.sql.expressions.Window
        val scored = t(s, d, "documents")
          .withColumn("toks", split(col("text"), " "))
          .select(col("doc_id"),
            round(size(array_distinct(col("toks"))).cast("double") /
              size(col("toks")), 6).as("score"))
        val wAll = Window.orderBy(desc("score"), asc("doc_id"))
        val wDec = Window.partitionBy("decile")
          .orderBy(desc("score"), asc("doc_id"))
        scored
          .withColumn("decile", ntile(10).over(wAll).cast("long"))
          .withColumn("cycle", row_number().over(wDec).cast("long"))
          .withColumn("train_pos",
            (lit(10L) * (col("cycle") - 1) + col("decile")).cast("long"))
          .select("doc_id", "score", "decile", "cycle", "train_pos")
          .orderBy("train_pos")
      },
      Some("""WITH scored AS (SELECT doc_id,
            ROUND(CAST(len(list_distinct(string_split(text,' '))) AS DOUBLE)
              / len(string_split(text,' ')), 6) AS score
          FROM documents),
        dec AS (SELECT doc_id, score,
            CAST(ntile(10) OVER (ORDER BY score DESC, doc_id) AS BIGINT)
              AS decile
          FROM scored),
        cyc AS (SELECT doc_id, score, decile,
            CAST(row_number() OVER (PARTITION BY decile
              ORDER BY score DESC, doc_id) AS BIGINT) AS cycle
          FROM dec)
        SELECT doc_id, score, decile, cycle,
          CAST(row_number() OVER (ORDER BY cycle, decile) AS BIGINT)
            AS train_pos
        FROM cyc ORDER BY train_pos""")),

    // j94 — tokenizer FERTILITY / compression planning table: per
    // language, the corpus statistics a tokenizer budget is sized from
    // — whitespace words, BPE-ish regex tokens (j10's public stand-in
    // for a real BPE; the libs aren't in this container), chars, and
    // the derived fertility (tokens/word) and compression (chars/token)
    // ratios. The multilingual-curation question this answers: which
    // languages pay more tokens per word under the current vocab (the
    // signal that drives vocab re-allocation). One partial+final
    // aggregate over one scan; output is |languages| rows — bounded at
    // any corpus size.
    Q("j94_tokenizer_fertility",
      (s, d) => t(s, d, "documents")
        .select(col("lang"),
          size(split(col("text"), " ")).cast("long").as("ws"),
          expr("regexp_count(text, '[a-z]{1,4}')").cast("long").as("bpe"),
          length(translate(col("text"), " ", "")).cast("long").as("chars"))
        .groupBy("lang")
        .agg(count(lit(1)).as("n_docs"),
          sum("ws").as("n_words"),
          sum("bpe").as("n_tokens"),
          sum("chars").as("n_chars"),
          round(sum("bpe").cast("double") / sum("ws"), 6).as("fertility"),
          round(sum("chars").cast("double") / sum("bpe"), 6)
            .as("chars_per_token"))
        .orderBy("lang"),
      Some("""SELECT lang, count(*) AS n_docs,
          CAST(SUM(len(string_split(text,' '))) AS BIGINT) AS n_words,
          CAST(SUM(len(regexp_extract_all(text,'[a-z]{1,4}'))) AS BIGINT)
            AS n_tokens,
          CAST(SUM(length(replace(text,' ',''))) AS BIGINT) AS n_chars,
          ROUND(CAST(SUM(len(regexp_extract_all(text,'[a-z]{1,4}')))
              AS DOUBLE)
            / SUM(len(string_split(text,' '))), 6) AS fertility,
          ROUND(CAST(SUM(length(replace(text,' ',''))) AS DOUBLE)
            / SUM(len(regexp_extract_all(text,'[a-z]{1,4}'))), 6)
            AS chars_per_token
        FROM documents GROUP BY lang ORDER BY lang""")),

    // j95 — T5-style SPAN-CORRUPTION planning (Raffel et al. 2020): for
    // each doc, the deterministic (start, len) spans the denoising
    // objective will mask — 15% corruption rate, mean span 3, spans
    // spread one-per-segment so they never overlap, offsets drawn from
    // the md5 device (never an RNG — the plan must be reproducible
    // across retries and engines). This is the PLANNING table a
    // packing/masking job consumes downstream; emitting it as a
    // relation (doc_id, span_id, start, len, sentinel) is what lets the
    // mask job be a pure map-side join instead of re-deriving spans
    // inside the tokenizer. Map-only: per-row integer arithmetic +
    // posexplode off one scan; |output| = Σ n_spans ≈ 0.05·Σ tokens.
    Q("j95_span_corruption",
      (s, d) => t(s, d, "documents")
        .select(col("doc_id"), size(split(col("text"), " ")).as("n"))
        .withColumn("n_corrupt", greatest(lit(1), expr("(n * 15) div 100")))
        .withColumn("n_spans", greatest(lit(1), expr("n_corrupt div 3")))
        .select(col("doc_id"), col("n"), col("n_corrupt"), col("n_spans"),
          posexplode(expr(Ngrams.seqAsc("0", "cast(n_spans - 1 as int)")))
            .as(Seq("i", "span0")))
        .withColumn("len", (expr("n_corrupt div n_spans") +
          when(col("i") < expr("n_corrupt % n_spans"), 1).otherwise(0))
          .cast("long"))
        .withColumn("seg", expr("n div n_spans"))
        .withColumn("start", (col("i") * col("seg") +
          expr("cast(conv(substring(md5(concat('sc:', cast(doc_id as string)," +
            " ':', cast(i as string))),1,8),16,10) as bigint)") %
          (col("seg") - col("len") + 1)).cast("long"))
        .select(col("doc_id"), (col("i") + 1).cast("long").as("span_id"),
          col("start"), col("len"),
          concat(lit("<extra_id_"), col("i").cast("string"), lit(">"))
            .as("sentinel"))
        .orderBy("doc_id", "span_id"),
      Some("""WITH x AS (SELECT doc_id,
            len(string_split(text,' ')) AS n,
            GREATEST(1, (len(string_split(text,' ')) * 15) // 100)
              AS n_corrupt
          FROM documents),
        y AS (SELECT doc_id, n, n_corrupt,
            GREATEST(1, n_corrupt // 3) AS n_spans FROM x),
        sp AS (SELECT doc_id, n, n_corrupt, n_spans, i.i AS i
          FROM y, unnest(range(0, n_spans)) i(i)),
        z AS (SELECT doc_id, i,
            n_corrupt // n_spans
              + CASE WHEN i < n_corrupt % n_spans THEN 1 ELSE 0 END AS len,
            n // n_spans AS seg
          FROM sp)
        SELECT doc_id, CAST(i + 1 AS BIGINT) AS span_id,
          CAST(i * seg + CAST('0x' || substr(md5('sc:' ||
              CAST(doc_id AS VARCHAR) || ':' || CAST(i AS VARCHAR)),1,8)
              AS BIGINT) % (seg - len + 1) AS BIGINT) AS start,
          CAST(len AS BIGINT) AS len,
          '<extra_id_' || CAST(i AS VARCHAR) || '>' AS sentinel
        FROM z ORDER BY doc_id, span_id""")),

    // m18 — ustar TAR archive walk. m12 already grades the abstract
    // length-prefixed TLV walk; what TLV lacks — and what this key
    // adds — are ustar's two concrete mechanics: length fields are
    // OCTAL ASCII (size lives at header offset 124 as
    // 11 octal digits; entries are 512-byte blocks, content padded to
    // the next block boundary). The key synthesizes a deterministic
    // archive per doc (1-3 entries, real ustar offsets: name@0,
    // size@124, typeflag@156, magic 'ustar'@257, real NUL padding) and
    // then walks it the m17 way — ONE aggregate() fold chaining offsets off the decoded
    // octal sizes (next = p + 512 + ceil(size/512)·512), conv(oct,8,10)
    // doing the radix work in codegen. Map-only: per-row string
    // arithmetic, archive bytes never shuffle — the oracle replays the
    // GENERATOR's arithmetic, so a parser that misreads octal or
    // mis-chains a padded boundary fails the hash. 100-TB shape: this
    // is the per-file task of an archive-ingest scan; offsets stay
    // inside the row, nothing is ever collected.
    Q("m18_parse_tar",
      (s, d) => {
        val nul = "\u0000"
        val fixture = t(s, d, "documents")
          .selectExpr("doc_id", "cast(1 + doc_id % 3 AS INT) AS cnt")
          .selectExpr("doc_id", "cnt",
            s"""aggregate(${Ngrams.seqAsc("1", "cnt")}, '', (acc, i) -> concat(acc,
                 rpad(concat('doc_', cast(doc_id AS STRING), '_',
                   cast(i AS STRING)), 100, '$nul'),
                 rpad('0000644', 8, '$nul'),
                 rpad('0000000', 8, '$nul'),
                 rpad('0000000', 8, '$nul'),
                 concat(lpad(conv(cast(20 + (doc_id * i) % 600 AS BIGINT),
                   10, 8), 11, '0'), ' '),
                 rpad('00000000000', 12, '$nul'),
                 '        ',
                 '0',
                 rpad('', 100, '$nul'),
                 concat('ustar', '$nul', '00'),
                 rpad('', 247, '$nul'),
                 rpad(substring(repeat(md5(concat(cast(doc_id AS STRING),
                     '/', cast(i AS STRING))), 20), 1,
                     cast(20 + (doc_id * i) % 600 AS INT)),
                   cast(((20 + (doc_id * i) % 600 + 511) div 512) * 512
                     AS INT), '$nul'))) AS payload""")
        fixture
          .selectExpr("doc_id",
            s"""aggregate(${Ngrams.seqAsc("1", "cnt")},
                struct(1 AS p,
                  cast(array() AS array<struct<name:string,sz:bigint,
                    tf:string,magic:string,head:string>>) AS es),
                (acc, i) -> struct(
                  cast(acc.p + 512
                    + ((cast(conv(substring(payload, acc.p + 124, 11),
                         8, 10) AS BIGINT) + 511) div 512) * 512
                    AS INT) AS p,
                  concat(acc.es, array(struct(
                    trim(TRAILING '$nul' FROM
                      substring(payload, acc.p, 100)) AS name,
                    cast(conv(substring(payload, acc.p + 124, 11), 8, 10)
                      AS BIGINT) AS sz,
                    substring(payload, acc.p + 156, 1) AS tf,
                    substring(payload, acc.p + 257, 5) AS magic,
                    substring(payload, acc.p + 512, 8) AS head))) AS es),
                acc -> acc.es) AS es""")
          .selectExpr("doc_id", "posexplode(es) AS (i0, e)")
          .selectExpr("doc_id", "cast(i0 + 1 AS BIGINT) AS idx",
            "e.name AS name", "e.sz AS size_bytes", "e.tf AS typeflag",
            "e.magic AS magic", "e.head AS body_head")
          .orderBy("doc_id", "idx")
      },
      Some("""WITH recs AS (SELECT doc_id, i.i AS idx FROM documents,
            unnest(range(1, 4)) i(i) WHERE i.i <= 1 + doc_id % 3)
        SELECT doc_id, CAST(idx AS BIGINT) AS idx,
          'doc_' || CAST(doc_id AS VARCHAR) || '_' || CAST(idx AS VARCHAR)
            AS name,
          CAST(20 + (doc_id * idx) % 600 AS BIGINT) AS size_bytes,
          '0' AS typeflag, 'ustar' AS magic,
          substr(repeat(md5(CAST(doc_id AS VARCHAR) || '/' ||
            CAST(idx AS VARCHAR)), 20), 1, 8) AS body_head
        FROM recs ORDER BY doc_id, idx""")),

    // p23 — the TPC-DS Q51 SHAPE: two sales channels cumulated over
    // time and compared day by day — here orders placed (o_totalprice
    // by o_orderdate) vs lineitems shipped (revenue by l_shipdate),
    // FULL OUTER on the day (ship lags order, so each side has days the
    // other lacks), running totals over the joined day axis. The scale
    // discipline: both sides PRE-AGGREGATE to |days| rows (bounded —
    // ~2,400 for TPC-H's 7 years) before the full outer, so the join
    // and the windows run on a dimension-sized relation no matter the
    // fact-table SF; and the running totals accumulate in DECIMAL, not
    // DOUBLE — a windowed double sum is order-sensitive and DuckDB's
    // segment-tree window aggregation adds in a different order than
    // Spark's running frame (the h44-class cross-engine trap, dodged
    // by exact arithmetic rather than tolerance).
    Q("p23_cumulative_channels",
      (s, d) => {
        import org.apache.spark.sql.expressions.Window
        val ordered = t(s, d, "orders")
          .groupBy(to_date(col("o_orderdate")).as("day"))
          .agg(graft.Tables.mSum(col("o_totalprice")).as("day_ordered"))
        // revenueAgg, not mSum of the double product: mSum rounds the
        // product to 4 decimals PER ROW, which equals the oracle's
        // exact-product-then-round-once only while prices/discounts
        // carry ≤2 decimals each (r18-s2 review finding)
        val shipped = t(s, d, "lineitem")
          .groupBy(to_date(col("l_shipdate")).as("day"))
          .agg(revenueAgg("day_shipped"))
        val w = Window.orderBy("day")
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        ordered.join(shipped, Seq("day"), "full_outer")
          .na.fill(0.0, Seq("day_ordered", "day_shipped"))
          .withColumn("cum_ordered", round(sum(
            col("day_ordered").cast("decimal(18,4)")).over(w), 4)
            .cast("double"))
          .withColumn("cum_shipped", round(sum(
            col("day_shipped").cast("decimal(18,4)")).over(w), 4)
            .cast("double"))
          .select(date_format(col("day"), "yyyy-MM-dd").as("day"),
            col("cum_ordered"), col("cum_shipped"),
            round((col("cum_ordered") - col("cum_shipped"))
              .cast("decimal(18,4)"), 4).cast("double").as("backlog"),
            (col("cum_shipped") > col("cum_ordered")).as("shipped_ahead"))
          .orderBy("day")
      },
      Some(s"""WITH o AS (SELECT CAST(o_orderdate AS DATE) AS day,
            CAST(ROUND(SUM(CAST(o_totalprice AS DECIMAL(18,4))), 4)
              AS DOUBLE) AS day_ordered
          FROM orders GROUP BY 1),
        l AS (SELECT CAST(l_shipdate AS DATE) AS day,
            $revenueAggSql AS day_shipped
          FROM lineitem GROUP BY 1),
        j AS (SELECT COALESCE(o.day, l.day) AS day,
            COALESCE(day_ordered, 0.0) AS day_ordered,
            COALESCE(day_shipped, 0.0) AS day_shipped
          FROM o FULL OUTER JOIN l ON o.day = l.day),
        c AS (SELECT day,
            CAST(ROUND(SUM(CAST(day_ordered AS DECIMAL(18,4)))
              OVER (ORDER BY day ROWS BETWEEN UNBOUNDED PRECEDING AND
                CURRENT ROW), 4) AS DOUBLE) AS cum_ordered,
            CAST(ROUND(SUM(CAST(day_shipped AS DECIMAL(18,4)))
              OVER (ORDER BY day ROWS BETWEEN UNBOUNDED PRECEDING AND
                CURRENT ROW), 4) AS DOUBLE) AS cum_shipped
          FROM j)
        SELECT strftime(day, '%Y-%m-%d') AS day, cum_ordered, cum_shipped,
          CAST(ROUND(CAST(cum_ordered - cum_shipped AS DECIMAL(18,4)), 4)
            AS DOUBLE) AS backlog,
          cum_shipped > cum_ordered AS shipped_ahead
        FROM c ORDER BY day""")),

    // e20 — DISTRIBUTION window functions: percent_rank, cume_dist, and
    // ratio-to-report (share of the partition total) — the analytic
    // trio a percentile-cut pipeline reads (j68 consumes exactly these
    // semantics; here they are the graded user-facing surface). Unique
    // total order inside each partition ((o_totalprice, o_orderkey) —
    // o_orderkey is unique) makes both rank functions engine-exact:
    // percent_rank = (rank-1)/(n-1) and cume_dist = rank/n reduce to
    // row_number arithmetic, and the share denominator accumulates in
    // DECIMAL (p23's discipline). One hash exchange on the partition
    // key, windows share one sort — SF-invariant shape.
    Q("e20_win_distribution",
      (s, d) => {
        import org.apache.spark.sql.expressions.Window
        val w = Window.partitionBy("o_orderpriority")
          .orderBy(asc("o_totalprice"), asc("o_orderkey"))
        val wAll = Window.partitionBy("o_orderpriority")
        t(s, d, "orders")
          .select(col("o_orderkey"), col("o_orderpriority"),
            col("o_totalprice"))
          .withColumn("pct_rank", round(percent_rank().over(w), 6))
          .withColumn("cume", round(cume_dist().over(w), 6))
          .withColumn("share", round(col("o_totalprice")
            .cast("decimal(18,4)") /
            sum(col("o_totalprice").cast("decimal(18,4)")).over(wAll), 6)
            .cast("double"))
          // o_orderkey completes the total order: at >1M rows/partition
          // adjacent pct_ranks collapse at 6-dp and the bare
          // (priority, pct_rank) sort has cross-engine ties (r18-s2)
          .orderBy("o_orderpriority", "pct_rank", "o_orderkey")
      },
      Some("""SELECT o_orderkey, o_orderpriority, o_totalprice,
          ROUND(percent_rank() OVER (PARTITION BY o_orderpriority
            ORDER BY o_totalprice, o_orderkey), 6) AS pct_rank,
          ROUND(cume_dist() OVER (PARTITION BY o_orderpriority
            ORDER BY o_totalprice, o_orderkey), 6) AS cume,
          CAST(ROUND(CAST(o_totalprice AS DECIMAL(18,4)) /
            SUM(CAST(o_totalprice AS DECIMAL(18,4)))
              OVER (PARTITION BY o_orderpriority), 6) AS DOUBLE) AS share
        FROM orders ORDER BY o_orderpriority, pct_rank, o_orderkey""")),

    // j96 — KNESER-NEY smoothed bigram LM (Kneser & Ney 1995; the
    // standard n-gram smoothing every published LM-filter pipeline
    // defaults to): absolute discount D=0.75 with the continuation-
    // probability backoff P_cont(w) = N1+(-w) / |bigram types|. The
    // upgrade over j61/j66's interpolated-MLE: unseen-context mass is
    // allocated by how PROMISCUOUS a word is (how many contexts it
    // follows), not how frequent — the property that makes KN the
    // production choice. All quantities are one gram aggregate plus two
    // bounded re-aggregations (per-v and per-w relations, each
    // |vocab|-sized); the |types| total rides as a window sum over the
    // per-w relation, never a 1-row cross join. Determinism: counts are
    // ints, D-subtraction is exact (x.25), the two divisions and one
    // product evaluate in the same written order in both engines,
    // round-6 on the emitted probability. Top-50 bigrams by count —
    // TakeOrderedAndProject, never a full sort.
    Q("j96_kneser_ney",
      (s, d) => {
        val toksDf = t(s, d, "documents")
          .select(col("doc_id"), split(col("text"), " ").as("toks"))
        val bg = toksDf.select(explode(expr(
            "transform(" + Ngrams.starts("toks", 2) + ", i -> " +
            "struct(element_at(toks, i) AS v, " +
            "element_at(toks, cast(i + 1 AS INT)) AS w))")).as("b"))
          .select(col("b.v").as("v"), col("b.w").as("w"))
          .groupBy("v", "w").agg(count(lit(1)).as("c_vw"))
        val cv = bg.groupBy("v").agg(sum("c_vw").as("c_v"),
          count(lit(1)).as("n1f"))
        val wWin = org.apache.spark.sql.expressions.Window
          .partitionBy(lit(1))
        val pc = bg.groupBy("w").agg(count(lit(1)).as("n1b"))
          .withColumn("pcont",
            col("n1b").cast("double") / sum("n1b").over(wWin))
        bg.join(cv, "v").join(pc, "w")
          .select(col("v"), col("w"), col("c_vw"),
            round((greatest(col("c_vw").cast("double") - lit(0.75),
              lit(0.0)) + lit(0.75) * col("n1f") * col("pcont")) /
              col("c_v"), 6).as("p_kn"))
          .orderBy(desc("c_vw"), asc("v"), asc("w"))
          .limit(50)
      },
      Some("""WITH toks AS (SELECT doc_id, string_split(text,' ') AS tk
            FROM documents),
        bg AS (SELECT tk[i.i] AS v, tk[i.i + 1] AS w, COUNT(*) AS c_vw
          FROM toks, unnest(range(1, len(tk))) i(i) GROUP BY 1, 2),
        cv AS (SELECT v, SUM(c_vw) AS c_v, COUNT(*) AS n1f
          FROM bg GROUP BY v),
        pc AS (SELECT w, COUNT(*) AS n1b,
            CAST(COUNT(*) AS DOUBLE) / SUM(COUNT(*)) OVER () AS pcont
          FROM bg GROUP BY w)
        SELECT bg.v, bg.w, c_vw,
          ROUND((GREATEST(CAST(c_vw AS DOUBLE) - 0.75, 0.0)
            + 0.75 * n1f * pcont) / c_v, 6) AS p_kn
        FROM bg JOIN cv ON bg.v = cv.v JOIN pc ON bg.w = pc.w
        ORDER BY c_vw DESC, bg.v, bg.w LIMIT 50""")),

    // j97 — character-level Shannon ENTROPY per doc: the cheap gibberish
    // / encoding-damage detector (low entropy = repeated filler, high =
    // random bytes; both are what a quality gate drops before paying
    // for an LM score). H = -sum p ln p / ln 2 over the doc's char
    // distribution, spaces excluded. One explode + two-level aggregate
    // off one scan; per-doc term count is bounded by the alphabet, so
    // the round-6 emission absorbs the sub-ulp addition-order spread
    // (the j61 NLL precedent). 100-TB shape: map-side partial aggs on
    // (doc_id, char) — no row ever carries more than a char.
    Q("j97_char_entropy",
      (s, d) => {
        import org.apache.spark.sql.expressions.Window
        val w = Window.partitionBy("doc_id")
        t(s, d, "documents")
          .select(col("doc_id"), explode(split(
            translate(col("text"), " ", ""), "")).as("ch"))
          .where(col("ch") =!= "")
          .groupBy("doc_id", "ch").agg(count(lit(1)).as("cnt"))
          .withColumn("len", sum("cnt").over(w))
          .groupBy("doc_id")
          .agg(max("len").cast("long").as("n_chars"),
            count(lit(1)).as("n_unique"),
            round(-sum((col("cnt").cast("double") / col("len")) *
              log(col("cnt").cast("double") / col("len"))) /
              log(lit(2.0)), 6).as("entropy"))
          .orderBy("doc_id")
      },
      Some("""WITH ch AS (SELECT doc_id, unnest(string_split_regex(
            replace(text, ' ', ''), '')) AS c FROM documents),
        cc AS (SELECT doc_id, c, COUNT(*) AS cnt FROM ch
          WHERE c <> '' GROUP BY doc_id, c),
        cl AS (SELECT doc_id, c, cnt,
            SUM(cnt) OVER (PARTITION BY doc_id) AS len FROM cc)
        SELECT doc_id, CAST(MAX(len) AS BIGINT) AS n_chars,
          COUNT(*) AS n_unique,
          ROUND(-SUM((CAST(cnt AS DOUBLE) / len)
            * ln(CAST(cnt AS DOUBLE) / len)) / ln(2.0), 6) AS entropy
        FROM cl GROUP BY doc_id ORDER BY doc_id""")),

    // j98 — SHARD-LOCAL dedup loss: the at-scale design question every
    // dedup deployment answers first — can dedup run per-shard (no
    // global shuffle, embarrassingly parallel) or must it be global?
    // Quantified on the fixture's real duplicate structure (the
    // 16-token lead-prefix classes): duplicate pairs caught when docs
    // are hash-sharded 4 ways vs the global pair mass, and the loss
    // rate between them. Within-shard pair mass is Σ per-(class,shard)
    // c(c-1)/2 — j86's pair-mass algebra one level down. The answer on
    // this corpus (65-67% of pairs LOST at 4 shards, both SFs) is the
    // number that justifies j2's global-shuffle architecture in one row. Cost: two
    // bounded aggregations over one scan — the audit is free relative
    // to the dedup it sizes.
    Q("j98_shard_dedup_loss",
      (s, d) => {
        val pre = t(s, d, "documents")
          .select(col("doc_id"),
            md5(concat_ws(" ", slice(split(col("text"), " "), 1, 16)))
              .as("pre"),
            pmod(col("doc_id"), lit(4)).as("shard"))
        val global = pre.groupBy("pre").agg(count(lit(1)).as("c"))
          .where(col("c") >= 2)
          .agg(count(lit(1)).as("n_classes"),
            sum(expr("c * (c - 1) div 2")).as("global_pairs"))
        val within = pre.groupBy("pre", "shard")
          .agg(count(lit(1)).as("cs"))
          .join(pre.groupBy("pre").agg(count(lit(1)).as("c"))
            .where(col("c") >= 2).select("pre"), "pre")
          .agg(coalesce(sum(expr("cs * (cs - 1) div 2")), lit(0L))
            .as("within_pairs"))
        global.crossJoin(within)
          .select(col("n_classes"), col("global_pairs"),
            col("within_pairs"),
            round(lit(1.0) - col("within_pairs").cast("double") /
              col("global_pairs"), 6).as("loss_rate"))
      },
      Some("""WITH p AS (SELECT doc_id,
            md5(array_to_string(string_split(text,' ')[1:16], ' ')) AS pre,
            doc_id % 4 AS shard
          FROM documents),
        cls AS (SELECT pre, COUNT(*) AS c FROM p GROUP BY pre
          HAVING COUNT(*) >= 2),
        g AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_classes,
            CAST(SUM(c * (c - 1) // 2) AS BIGINT) AS global_pairs
          FROM cls),
        ws AS (SELECT p.pre, p.shard, COUNT(*) AS cs FROM p
          JOIN cls ON p.pre = cls.pre GROUP BY p.pre, p.shard),
        w AS (SELECT CAST(COALESCE(SUM(cs * (cs - 1) // 2), 0) AS BIGINT)
            AS within_pairs FROM ws)
        SELECT n_classes, global_pairs, within_pairs,
          ROUND(1.0 - CAST(within_pairs AS DOUBLE) / global_pairs, 6)
            AS loss_rate
        FROM g, w""")),

    // d29 — equi-width HISTOGRAM as an aggregation surface:
    // width_bucket over fixed [0, 500) bounds, 10 buckets, per event
    // type — the profiling shape every monitoring pipeline emits.
    // Fixed bounds (not data-dependent min/max) are the deliberate
    // production choice: they keep the key a pure one-pass partial+
    // final aggregate with no min/max pre-pass or 1-row carrier join,
    // and histograms only compare across runs when their bins don't
    // move. Bucket edges are reconstructed arithmetically in the
    // output so the relation is self-describing. Output is
    // |types|×|buckets| rows — bounded at any SF.
    Q("d29_agg_histogram",
      (s, d) => graft.Tables.events(s, d)
        .select(col("event_type"),
          expr("width_bucket(value, 0.0, 500.0, 10)").as("bucket"))
        .groupBy("event_type", "bucket")
        .agg(count(lit(1)).as("n"))
        .select(col("event_type"), col("bucket"),
          // width_bucket's clamp buckets (0 = below lo, 11 = at/above
          // hi) have open edges — label them NULL, not a fabricated
          // 50-wide bin (sf0.1's value tail reaches 560: the overflow
          // bucket is real data, not a theoretical case)
          when(col("bucket") === 0, lit(null).cast("double"))
            .otherwise(round((col("bucket") - 1).cast("double") * 50.0, 1))
            .as("lo"),
          when(col("bucket") === 11, lit(null).cast("double"))
            .otherwise(round(col("bucket").cast("double") * 50.0, 1))
            .as("hi"),
          col("n"))
        .orderBy("event_type", "bucket"),
      // DuckDB 1.0 has no width_bucket — the oracle spells out the
      // equivalent fixed-bound arithmetic INCLUDING the clamp semantics
      // (v < lo → 0, v >= hi → n+1): bin width (500-0)/10 = 50 is exact
      // in double, so floor(v/50)+1 is bit-identical to Spark's
      // WidthBucket in range, and the LEAST/GREATEST clamp reproduces
      // the two overflow buckets exactly
      Some("""WITH b AS (SELECT event_type,
            LEAST(GREATEST(CAST(floor(value / 50.0) AS BIGINT) + 1, 0), 11)
              AS bucket
          FROM events)
        SELECT event_type, bucket,
          CASE WHEN bucket = 0 THEN NULL
            ELSE CAST(ROUND((bucket - 1) * 50.0, 1) AS DOUBLE) END AS lo,
          CASE WHEN bucket = 11 THEN NULL
            ELSE CAST(ROUND(bucket * 50.0, 1) AS DOUBLE) END AS hi,
          COUNT(*) AS n
        FROM b GROUP BY 1, 2 ORDER BY event_type, bucket""")),

    // j99 — EFFECTIVE SAMPLE SIZE of a weighted corpus, per source:
    // ESS = (Σw)²/Σw² (Kish 1965) over the j92-class quality weights —
    // the diagnostic read BEFORE importance-weighted training: a source
    // whose ESS/n collapses is contributing far fewer effective docs
    // than its row count claims (a few heavy weights dominate), which
    // is when reweighting should give way to resampling (j32's DSIR
    // scaladoc owns that decision; this key is its gauge). One
    // partial+final aggregate over one scan; |sources| output rows.
    // Determinism: w = distinct-token ratio (exact int division), Σw
    // and Σw² accumulate in DECIMAL so partial-agg order can't move an
    // ulp, final ratio rounds to 6.
    Q("j99_importance_ess",
      (s, d) => t(s, d, "documents")
        .withColumn("toks", split(col("text"), " "))
        .select(col("source"),
          round(size(array_distinct(col("toks"))).cast("double") /
            size(col("toks")), 6).as("w"))
        .groupBy("source")
        .agg(count(lit(1)).as("n"),
          round(sum(col("w").cast("decimal(28,12)")), 6).cast("double")
            .as("sum_w"),
          round(sum((col("w") * col("w")).cast("decimal(28,12)")), 6)
            .cast("double").as("sum_w2"))
        .select(col("source"), col("n"), col("sum_w"),
          round((col("sum_w") * col("sum_w")) / col("sum_w2"), 6)
            .as("ess"),
          round((col("sum_w") * col("sum_w")) / col("sum_w2") /
            col("n"), 6).as("ess_ratio"))
        .orderBy("source"),
      Some("""WITH x AS (SELECT source,
            ROUND(CAST(len(list_distinct(string_split(text,' '))) AS DOUBLE)
              / len(string_split(text,' ')), 6) AS w
          FROM documents),
        a AS (SELECT source, COUNT(*) AS n,
            CAST(ROUND(SUM(CAST(w AS DECIMAL(28,12))), 6) AS DOUBLE)
              AS sum_w,
            CAST(ROUND(SUM(CAST(w * w AS DECIMAL(28,12))), 6) AS DOUBLE)
              AS sum_w2
          FROM x GROUP BY source)
        SELECT source, n, sum_w,
          ROUND((sum_w * sum_w) / sum_w2, 6) AS ess,
          ROUND((sum_w * sum_w) / sum_w2 / n, 6) AS ess_ratio
        FROM a ORDER BY source""")),

    // c10e — AS-OF join with TOLERANCE (pandas merge_asof's `tolerance`
    // parameter — the one c10/c10b-d leave ungraded): each error event
    // attributes to the LATEST click by the same user no older than 12
    // hours, and errors with no click inside the tolerance stay in the
    // output with a NULL attribution (merge_asof keeps left rows). The
    // tolerance predicate rides INSIDE the join condition, so at scale
    // it bounds the candidate fan-out per error to the tolerance window
    // (the unbounded backward join's k-candidate blowup is exactly what
    // tolerance exists to cap); the winner is row_number()=1 over
    // (cts DESC, click_id DESC) and unmatched errors return via one
    // broadcast-sized left join back. On this corpus: 48 of 201 errors
    // match at 12 h, 130 more WOULD match backward-unbounded — the
    // tolerance is doing real work (sf0.001; non-degeneracy spans SFs).
    Q("c10e_join_asof_tolerance",
      (s, d) => {
        import org.apache.spark.sql.expressions.Window
        val ev = graft.Tables.events(s, d)
        val err = ev.where(col("event_type") === "error")
          .select(col("event_id"), col("user_id"), col("ts_ms"))
        val clk = ev.where(col("event_type") === "click")
          .select(col("event_id").as("click_id"),
            col("user_id").as("cuid"), col("ts_ms").as("cts_ms"))
        val tolMs = 12L * 3600 * 1000
        val cand = err.join(clk,
          col("user_id") === col("cuid") &&
          col("cts_ms") <= col("ts_ms") &&
          col("ts_ms") - col("cts_ms") <= tolMs)
        val w = Window.partitionBy("event_id")
          .orderBy(desc("cts_ms"), desc("click_id"))
        val best = cand.withColumn("rn", row_number().over(w))
          .where(col("rn") === 1)
          .select(col("event_id").as("m_id"), col("click_id"),
            (col("ts_ms") - col("cts_ms")).as("gap_ms"))
        err.join(best, err("event_id") === best("m_id"), "left")
          .select(col("event_id"), col("user_id"), col("click_id"),
            col("gap_ms"))
          .orderBy("event_id")
      },
      Some("""WITH ev AS (SELECT event_id, user_id, event_type,
            CAST(epoch_ms(ts) AS BIGINT) AS ts_ms FROM events),
        err AS (SELECT event_id, user_id, ts_ms FROM ev
          WHERE event_type = 'error'),
        clk AS (SELECT event_id AS click_id, user_id AS cuid,
            ts_ms AS cts_ms FROM ev WHERE event_type = 'click'),
        cand AS (SELECT err.event_id, clk.click_id,
            err.ts_ms - clk.cts_ms AS gap_ms,
            row_number() OVER (PARTITION BY err.event_id
              ORDER BY clk.cts_ms DESC, clk.click_id DESC) AS rn
          FROM err JOIN clk ON err.user_id = clk.cuid
            AND clk.cts_ms <= err.ts_ms
            AND err.ts_ms - clk.cts_ms <= 43200000)
        SELECT err.event_id, err.user_id, c.click_id, c.gap_ms
        FROM err LEFT JOIN (SELECT * FROM cand WHERE rn = 1) c
          ON err.event_id = c.event_id
        ORDER BY err.event_id""")),

    // j100 — BLOOM-FILTER sizing planner: the query an operator runs
    // BEFORE building j52's decontamination bloom (j86's plan-before-
    // you-run discipline applied to the filter itself). Per source, the
    // standard optimal geometry for the measured insert count n at each
    // target false-positive rate: m = ceil(-n·ln p / ln²2) bits,
    // k = round((m/n)·ln 2) hashes — the two numbers that size executor
    // memory and per-row hash cost at 100 TB. n = the source's token
    // count (the grams j52 inserts). One aggregate + a 2-row fpp
    // explode; output is |sources|×|fpp| rows. The quotient is rounded
    // to 6 decimals BEFORE ceil: Java Math.log and DuckDB's libm carry
    // no shared correct-rounding guarantee, and ceil is a cliff — a
    // 1-ulp disagreement flips m_bits whenever the data-dependent
    // quotient lands near an integer (r18-s2 review; the file's usual
    // round-then-compare device, applied to a ceil).
    Q("j100_bloom_planner",
      (s, d) => t(s, d, "documents")
        .groupBy("source")
        .agg(sum(size(split(col("text"), " "))).cast("long").as("n"))
        .select(col("source"), col("n"),
          explode(array(lit(0.01), lit(0.001))).as("fpp"))
        .withColumn("m_bits",
          ceil(round(-col("n") * log(col("fpp")) /
            (log(lit(2.0)) * log(lit(2.0))), 6)).cast("long"))
        .withColumn("k_hashes", greatest(lit(1L),
          round((col("m_bits").cast("double") / col("n")) * log(lit(2.0)))
            .cast("long")))
        .withColumn("mb", round(col("m_bits").cast("double") /
          lit(8.0 * 1024 * 1024), 6))
        .orderBy("source", "fpp"),
      Some("""WITH n AS (SELECT source,
            CAST(SUM(len(string_split(text,' '))) AS BIGINT) AS n
          FROM documents GROUP BY source),
        f AS (SELECT source, n, CAST(unnest([0.01, 0.001]) AS DOUBLE) AS fpp FROM n),
        g AS (SELECT source, n, fpp,
            CAST(ceil(round(-n * ln(fpp) / (ln(2.0) * ln(2.0)), 6))
              AS BIGINT) AS m_bits
          FROM f)
        SELECT source, n, fpp, m_bits,
          GREATEST(1, CAST(round((CAST(m_bits AS DOUBLE) / n) * ln(2.0))
            AS BIGINT)) AS k_hashes,
          ROUND(CAST(m_bits AS DOUBLE) / (8.0 * 1024 * 1024), 6) AS mb
        FROM g ORDER BY source, fpp""")),

    // j101 — MINHASH BANDING geometry planner: the S-curve table behind
    // j2b's (bands, rows) knob (Knobs.minhashK/BandSize). For every
    // divisor split of the K=32 signature, the standard LSH banding
    // algebra: catch probability P(s) = 1-(1-s^r)^b at the operating
    // similarities (0.5 background, 0.7 target, 0.8 confident-dup), and
    // the half-catch threshold t½ = (1/b)^(1/r) — the rule of thumb an
    // operator matches to the dedup threshold BEFORE paying for a
    // corpus pass (j86 prices the pairs; this prices the geometry).
    // The default r=4/b=8 lands t½ ≈ 0.594 with P(0.8)=0.986 —
    // readable straight off the emitted table. Pure bounded arithmetic
    // off a 6-row divisor relation; the corpus contributes only its
    // document count (for the C(n,2) random-collision volume at the
    // background similarity). pow on identical doubles both engines;
    // round-6 everywhere.
    Q("j101_lsh_geometry",
      (s, d) => {
        val n = t(s, d, "documents").count()
        val geo = s.range(0, 6).toDF("i")
          .select(expr("cast(shiftleft(1, cast(i AS INT)) AS BIGINT)")
            .as("r"))
          .withColumn("b", expr("32 div r").cast("long"))
        def pcatch(sim: Double) = round(lit(1.0) -
          pow(lit(1.0) - pow(lit(sim), col("r").cast("double")),
            col("b").cast("double")), 6)
        geo.select(col("r"), col("b"),
            round(pow(lit(1.0) / col("b").cast("double"),
              lit(1.0) / col("r").cast("double")), 6).as("t_half"),
            pcatch(0.5).as("p_bg"), pcatch(0.7).as("p_target"),
            pcatch(0.8).as("p_dup"))
          .withColumn("exp_bg_pairs",
            round(lit(n.toDouble * (n - 1) / 2) * col("p_bg"), 2))
          .orderBy("r")
      },
      Some("""WITH geo AS (SELECT CAST(power(2, i.i) AS BIGINT) AS r,
            CAST(32 / power(2, i.i) AS BIGINT) AS b
          FROM unnest(range(0, 6)) i(i)),
        n AS (SELECT COUNT(*) AS n FROM documents),
        curve AS (SELECT r, b,
            ROUND(power(1.0 / b, 1.0 / r), 6) AS t_half,
            ROUND(1.0 - power(1.0 - power(0.5, CAST(r AS DOUBLE)),
              CAST(b AS DOUBLE)), 6) AS p_bg,
            ROUND(1.0 - power(1.0 - power(0.7, CAST(r AS DOUBLE)),
              CAST(b AS DOUBLE)), 6) AS p_target,
            ROUND(1.0 - power(1.0 - power(0.8, CAST(r AS DOUBLE)),
              CAST(b AS DOUBLE)), 6) AS p_dup
          FROM geo)
        SELECT r, b, t_half, p_bg, p_target, p_dup,
          ROUND((CAST(n AS DOUBLE) * (n - 1) / 2) * p_bg, 2)
            AS exp_bg_pairs
        FROM curve, n ORDER BY r""")),

    // k28 — SQL PIPE syntax (Spark 4.0's |> operator chain, from the
    // SQL:2023-era pipeline-syntax push that BigQuery/Databricks
    // popularized): the same logical query a user writes as nested
    // SELECTs, expressed as a linear FROM |> WHERE |> AGGREGATE |>
    // SELECT |> ORDER BY flow. Graded claims: the pipe chain analyzes
    // to the SAME plan class as the standard form (two-phase hash agg,
    // filter pushed below it — Catalyst sees one tree either way; the
    // syntax is resolved at parse time, costing nothing at scale), and
    // cross-engine equivalence against DuckDB running the standard-SQL
    // spelling. Revenue math rides DECIMAL per §8.4.
    Q("k28_pipe_syntax",
      (s, d) => Views.unique(s, "k28_li" -> t(s, d, "lineitem")) { v =>
        s.sql(s"""
          FROM ${v("k28_li")}
          |> WHERE l_shipdate >= TIMESTAMP '1995-01-01'
             AND l_shipdate < TIMESTAMP '1996-01-01'
          |> AGGREGATE
               CAST(COUNT(*) AS BIGINT) AS n_items,
               $revenueAggSql AS revenue
             GROUP BY l_returnflag, l_linestatus
          |> SELECT l_returnflag, l_linestatus, n_items, revenue
          |> ORDER BY l_returnflag, l_linestatus""")
      },
      Some(s"""SELECT l_returnflag, l_linestatus,
          CAST(COUNT(*) AS BIGINT) AS n_items,
          $revenueAggSql AS revenue
        FROM lineitem
        WHERE l_shipdate >= TIMESTAMP '1995-01-01'
          AND l_shipdate < TIMESTAMP '1996-01-01'
        GROUP BY l_returnflag, l_linestatus
        ORDER BY l_returnflag, l_linestatus""")
    )
  )
}
