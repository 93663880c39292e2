package graft.ops

import org.apache.spark.sql.functions._
import graft.Tables._

/** Round-20 batch — the two follow-ons the r19 verdict handed down (EXT
  * per SURVEY §1: planning/curation queries a training-data pipeline runs
  * through the reference's QUERY channel, `pandas_td/td.py ::
  * read_td_query`, §0-caveated anchor).
  *
  * j119 builds the second pass j117's scaladoc explicitly left open: the
  * round-1 schedule leaves an unmet deficit (sources too small to serve
  * their uniform target under the repeat cap) plus the integer-division
  * remainder — water-fill that surplus over the sources that still have
  * cap headroom. j120 closes the dedup family's granularity gap:
  * document (j1/j2/j2b), paragraph (j37), substring (j56), URL (j62) —
  * but chat corpora duplicate at the TRANSCRIPT level, where the same
  * conversation re-rendered under a different chat template defeats raw
  * text dedup by construction.
  */
object Round20 {

  /** (doc_id, sig) MinHash signatures over the parsed conversation
    * contents — the shared front half of j120 (pair audit) and j122
    * (survivors): render both dialects, parse, shingle, sign. */
  private[graft] def conversationSigs(s: org.apache.spark.sql.SparkSession,
      d: String): org.apache.spark.sql.DataFrame = {
        val base = t(s, d, "documents")
          .select(col("doc_id"),
            split(translate(col("text"), "\n\r", "  "), " ").as("toks"))
        // knob guard (r20 ADVICE): the j120/j122 oracles hardcode the
        // 32-slot / 8×4-band geometry — a non-default knob must fail
        // loudly here instead of silently diverging from the oracle
        require(Knobs.minhashK(s) == 32 && Knobs.minhashBandSize(s) == 4,
          "j120/j122 oracles pin minhash k=32, bandSize=4 — " +
            s"got k=${Knobs.minhashK(s)}, bandSize=${Knobs.minhashBandSize(s)}")
        // re-render source: doc_id ≡ 8 (mod 9) carries doc_id−1's
        // conversation (inner join: an orphan re-render with no source
        // doc drops out — same rule in the oracle). Sign-preserving `%`,
        // not pmod (r20 ADVICE): the render CASE on line ~48 and both
        // DuckDB oracles use `%`, so a negative doc_id under pmod would
        // sign doc N−1's content where the oracle signs doc N's own.
        val withSrc = base
          .withColumn("src_id",
            when(col("doc_id") % 9 === 8, col("doc_id") - 1)
              .otherwise(col("doc_id")))
          .select("doc_id", "src_id")
          .join(base.select(col("doc_id").as("src_id"),
            col("toks").as("src_toks")), Seq("src_id"))
        // render: dialect A = j118's renderer keyed on the SOURCE doc
        // (identical for non-re-rendered docs, whose src is themselves);
        // dialect B = '<<Human>>/<<Bot>>' framed lines, same content
        val rendered = withSrc.selectExpr("doc_id",
          s"""array_join(transform(
                ${Ngrams.seqAsc("1", "cast(2 + src_id % 5 AS INT)")},
                i -> concat(
                  CASE WHEN doc_id % 9 = 8
                    THEN concat('<<',
                      CASE WHEN i % 2 = 1 THEN 'Human' ELSE 'Bot' END,
                      '>> ')
                    ELSE concat(
                      CASE WHEN i = 1 AND src_id % 4 = 0 THEN 'system'
                           WHEN src_id % 7 = 0 AND i = 2 THEN 'user'
                           WHEN i % 2 = 1 THEN 'user'
                           ELSE 'assistant' END, ': ') END,
                  coalesce(concat_ws(' ',
                    slice(src_toks, cast((i - 1) * 4 + 1 AS INT),
                      least(4, greatest(0, size(src_toks) - (i - 1) * 4)))),
                    ''))),
              chr(10)) AS chat""")
        // parse BOTH dialects: strip the line-leading role marker of
        // either form, keep non-empty content tokens in order ('\n' as a
        // literal Scala newline — the j118 device)
        val conv = rendered.selectExpr("doc_id",
          """flatten(transform(split(chat, '\n'),
               ln -> filter(
                 split(regexp_replace(ln, '^([a-z]+: |<<[A-Za-z]+>> )', ''),
                   ' '),
                 w -> w != ''))) AS toks""")
        LlmOps.minhashSigsOf(s, conv)
  }

  /** j2b's band-join pair core over a (doc_id, sig) relation: candidate
    * pairs from the (band, bh) equi-join, kept at est_jac ≥ 0.5.
    * Signatures are persisted by the CALLER when reused; band rows carry
    * only (doc_id, band, bh) through the candidate shuffle, signatures
    * re-attach after the candidate dedup (the j2b discipline). */
  private def sigPairs(s: org.apache.spark.sql.SparkSession,
      sig: org.apache.spark.sql.DataFrame): org.apache.spark.sql.DataFrame = {
        val k = Knobs.minhashK(s)
        val bands = LlmOps.minhashBands(sig)
        val cand = bands.toDF("d1", "band", "bh")
          .join(bands.toDF("d2", "band2", "bh2"),
            col("band") === col("band2") && col("bh") === col("bh2")
              && col("d1") < col("d2"))
          .select("d1", "d2").distinct()
        cand
          .join(sig.toDF("d1", "sig1"), "d1")
          .join(sig.toDF("d2", "sig2"), "d2")
          .withColumn("est_jac",
            expr(s"aggregate(zip_with(sig1, sig2, (x,y) -> if(x = y, 1, 0)), 0, (a,b) -> a+b) / cast($k as double)"))
          .where(col("est_jac") >= 0.5)
          .select(col("d1"), col("d2"), round(col("est_jac"), 6).as("est_jac"))
  }

  /** j120's full pair relation — the AUDIT view: every conversation pair
    * at est_jac ≥ 0.5. NOTE the output is truth-quadratic in duplicate
    * cliques (a boilerplate-headed short-conversation clique of size C
    * legitimately contains C·(C−1)/2 pairs — the ScaleSoak `conv`
    * section measures 4.1M pairs over 40k docs for exactly this reason);
    * that is the relation's SEMANTICS, same as j2's exact pair core. A
    * consumer that only needs dedup should use j122, whose
    * exact-signature collapse never materializes the intra-clique
    * pairs. */
  private[graft] def conversationPairs(s: org.apache.spark.sql.SparkSession,
      d: String): org.apache.spark.sql.DataFrame = {
    val sig = conversationSigs(s, d).persist()
    sigPairs(s, sig).orderBy("d1", "d2")
  }

  val all: Seq[Q] = Seq(

    // Deficit-redistributing epoch schedule — j117's second pass,
    // graded at the regime where a second pass MATTERS. j117's fixed 3M
    // budget is the abundant regime at graded SF (target >> every
    // source's 4-epoch capacity): round 1 saturates every source, no
    // source keeps headroom, and redistribution is a provable no-op. The
    // interesting fill is budget ~ capacity, so this key sizes the
    // budget AT the corpus's repeat-capacity point — budget = 4·Σn
    // (every SF lands in the same regime by construction) — and uniform
    // targets T = budget div |S| then leave below-mean sources with an
    // unmet deficit and above-mean sources with cap headroom. The pool
    // (budget − Σ served_r1, which equals Σ headroom + the div
    // remainder) is water-filled: each round gives every unsaturated
    // source an EQUAL integer share (pool div k) capped at its
    // headroom, until no source can absorb a positive share. Invariant
    // (Round20Spec recomputes both): pool always equals remaining
    // headroom, so the loop ends all-saturated up to integer crumbs —
    // residual_tokens < |S| — and Σ served_total + residual = budget
    // EXACTLY. INTEGER arithmetic end to end; only `epochs` divides
    // (6 dp). Termination: a round either saturates >= 1 source or
    // leaves pool < k, so <= |S|+1 rounds — the fold domain below.
    // Scale shape: one corpus scan -> the |sources|-row relation, which
    // COLLAPSES to a single-row array state for the fold — the
    // iterative algebra runs on |S| elements inside one expression
    // tree, not |S| shuffles (the j86/j100 planner discipline). The
    // fold's data-dependent iteration bound routes through
    // Ngrams.seqAsc.
    Q("j119_epoch_redistribute",
      (s, d) => {
        val cap = Round19.EpochCap
        // round 1 = j117's schedule plan (ONE copy of the NULL-coalesce/
        // least subtlety — r20 review finding) under the capacity-point
        // budget expression 4·Σn instead of the fixed 3M
        val sched = Round19.epochSchedule(s, d,
            budgetSql = s"${cap}L * sum(n_tokens) over ()")
          .select(col("source"), col("n_tokens"), col("target_tokens"),
            col("served_tokens").as("served_r1"))
        // sorted parallel arrays: deterministic fold order at any
        // partitioning (sort_array on the struct sorts by source first)
        val st = sched.agg(
          expr("sort_array(collect_list(struct(source, n_tokens, target_tokens, served_r1)))")
            .as("arr"),
          coalesce(sum(col("served_r1")), lit(0L)).as("served0"),
          coalesce(sum(col("n_tokens")), lit(0L)).as("mass0"))
        // one water-fill round, as SQL text (built once, referenced by
        // the fold): k = unsaturated sources, share = pool div k, each
        // absorbs min(share, headroom)
        val remArr = "zip_with(caps, st.extra, (rc, re) -> rc - re)"
        val kExpr = s"size(filter($remArr, rr -> rr > 0))"
        val shareExpr = s"if($kExpr > 0, st.pool div $kExpr, 0L)"
        val addArr = "zip_with(caps, st.extra, " +
          s"(ac, ae) -> least($shareExpr, greatest(ac - ae, 0L)))"
        val fin = st
          .selectExpr("arr",
            s"transform(arr, x -> ${cap}L * x.n_tokens - x.served_r1) AS caps",
            s"${cap}L * mass0 - served0 AS pool0")
          .selectExpr("arr",
            s"""aggregate(
                  ${Ngrams.seqAsc("1", "size(arr) + 1")},
                  named_struct('pool', pool0,
                               'extra', transform(caps, c -> 0L)),
                  (st, it) -> if($shareExpr <= 0, st,
                    named_struct(
                      'pool', st.pool -
                        aggregate($addArr, 0L, (sa, sb) -> sa + sb),
                      'extra', zip_with(st.extra, $addArr,
                        (ue, ua) -> ue + ua)))) AS fin""")
        fin
          .selectExpr("fin.pool AS residual_tokens",
            """inline(zip_with(arr, fin.extra, (x, ex) -> named_struct(
                 'source', x.source, 'n_tokens', x.n_tokens,
                 'target_tokens', x.target_tokens,
                 'served_r1', x.served_r1, 'extra_tokens', ex)))""")
          .select(col("source"), col("n_tokens"), col("target_tokens"),
            col("served_r1"), col("extra_tokens"),
            (col("served_r1") + col("extra_tokens")).as("served_total"),
            round(coalesce(
              (col("served_r1") + col("extra_tokens")).cast("double") /
                nullif(col("n_tokens").cast("double"), lit(0.0)),
              lit(0.0)), 6).as("epochs"),
            col("residual_tokens"))
          .orderBy("source")
      },
      Some("""WITH RECURSIVE st AS (SELECT source,
            COALESCE(CAST(SUM(len(string_split(text, ' '))) AS BIGINT), 0)
              AS n_tokens
          FROM documents GROUP BY source),
        pl AS (SELECT source, n_tokens,
            CAST((4 * SUM(n_tokens) OVER ()) // COUNT(*) OVER () AS BIGINT)
              AS target_tokens
          FROM st),
        sv AS (SELECT source, n_tokens, target_tokens,
            LEAST(4 * n_tokens, target_tokens) AS served
          FROM pl),
        base AS (SELECT
            list(source ORDER BY source NULLS FIRST) AS srcs,
            list(n_tokens ORDER BY source NULLS FIRST) AS toks,
            list(target_tokens ORDER BY source NULLS FIRST) AS tgts,
            list(served ORDER BY source NULLS FIRST) AS served,
            list(4 * n_tokens - served ORDER BY source NULLS FIRST) AS caps,
            CAST(4 * COALESCE(SUM(n_tokens), 0)
              - COALESCE(SUM(served), 0) AS BIGINT) AS pool0,
            COUNT(*) AS n
          FROM sv),
        fill(it, pool, extra) AS (
          SELECT 0, pool0, list_transform(caps, c -> CAST(0 AS BIGINT))
          FROM base
          UNION ALL
          SELECT it + 1,
                 pool - CAST(COALESCE(list_aggregate(add, 'sum'), 0)
                   AS BIGINT),
                 list_transform(range(1, nn + 1), i -> extra[i] + add[i])
          FROM (
            SELECT q.it, q.pool, q.extra, q.nn, q.share,
                   list_transform(range(1, q.nn + 1),
                     i -> LEAST(q.share,
                            GREATEST(q.caps[i] - q.extra[i], 0))) AS add
            FROM (
              SELECT f.it, f.pool, f.extra, b.caps, b.n AS nn,
                     CASE WHEN len(list_filter(range(1, b.n + 1),
                              j -> b.caps[j] - f.extra[j] > 0)) > 0
                       THEN CAST(f.pool // len(list_filter(range(1, b.n + 1),
                              j2 -> b.caps[j2] - f.extra[j2] > 0)) AS BIGINT)
                       ELSE CAST(0 AS BIGINT) END AS share
              FROM fill f, base b) q
          ) qq
          WHERE qq.share > 0),
        fin AS (SELECT pool, extra FROM fill ORDER BY it DESC LIMIT 1),
        outp AS (SELECT b.srcs[i.i] AS source, b.toks[i.i] AS n_tokens,
               b.tgts[i.i] AS target_tokens,
               b.served[i.i] AS served_r1, f.extra[i.i] AS extra_tokens,
               f.pool AS residual
          FROM base b, fin f, unnest(range(1, b.n + 1)) i(i))
        SELECT source, n_tokens, target_tokens, served_r1, extra_tokens,
          CAST(served_r1 + extra_tokens AS BIGINT) AS served_total,
          ROUND(COALESCE(CAST(served_r1 + extra_tokens AS DOUBLE)
            / NULLIF(CAST(n_tokens AS DOUBLE), 0), 0), 6) AS epochs,
          CAST(residual AS BIGINT) AS residual_tokens
        FROM outp ORDER BY source""")),

    // Conversation-level near-dedup — transcript dedup that survives a
    // TEMPLATE change: the corpus renders every doc as a j118-style
    // chat transcript ("role: content" lines), except every doc_id ≡ 8
    // (mod 9), which RE-RENDERS the PREVIOUS doc's conversation under a
    // second dialect ("<<Role>> content" lines) — the planted
    // cross-template duplicate pair. Raw-text dedup (j1/j2/j2b over
    // documents.text) cannot pair doc N with doc N−1 (their source
    // texts differ), and transcript-string dedup cannot either (the
    // role markers differ); only role-stripped, whitespace-normalized
    // TURN CONTENT pairs them — which is exactly what this key
    // shingles. Render-then-parse discipline (m14/j118): the parser
    // re-derives content from the rendered strings of BOTH dialects,
    // and the oracle replays the synthesis RULE (first n_syn·4 source
    // tokens, empties dropped), so a matched render/parse bug cannot
    // cancel. The signature/banding machinery is j2b's, verbatim
    // (minhashSigsOf + minhashBands): band-bucket equi-join candidates,
    // est_jac ≥ 0.5 from 32-slot signature agreement. Scale shape:
    // render+parse is map-only over one corpus scan plus one 1:1
    // equi-join on doc_id (the re-render source lookup); everything
    // after is the proven j2b LSH pipeline — band join keyed on
    // 8-byte (band, bh), signatures re-attached only after candidate
    // dedup.
    Q("j120_dedup_conversation",
      (s, d) => conversationPairs(s, d),
      Some("""WITH b AS (SELECT doc_id,
            string_split(translate(text, chr(10) || chr(13), '  '), ' ')
              AS toks
          FROM documents),
        sj AS (SELECT d.doc_id, s.toks AS src_toks,
            2 + s.doc_id % 5 AS n_syn
          FROM (SELECT doc_id,
                  CASE WHEN doc_id % 9 = 8 THEN doc_id - 1 ELSE doc_id END
                    AS src_id
                FROM b) d
          JOIN b s ON s.doc_id = d.src_id),
        conv AS (SELECT doc_id,
            list_filter(src_toks[1:CAST(LEAST(n_syn * 4, len(src_toks))
              AS BIGINT)], w -> w <> '') AS ctoks
          FROM sj),
        tk AS (SELECT doc_id, ctoks AS toks FROM conv WHERE len(ctoks) >= 3),
        shs AS (SELECT DISTINCT doc_id,
            toks[i.i] || ' ' || toks[i.i+1] || ' ' || toks[i.i+2] AS sh
          FROM tk, unnest(range(1, len(toks)-1)) i(i)),
        sh AS (SELECT doc_id,
            CAST('0x' || substr(md5(sh),1,15) AS BIGINT) % 2147483647 AS h FROM shs),
        seeds AS (SELECT unnest(range(0, 32)) AS i,
          unnest([114060684, 143607338, 658016613, 1920833001, 1625018798, 2115868157, 1839658157, 1370607936, 1314768563, 1516846533, 899342927, 1761721496, 1792449689, 2056989732, 1252576877, 638180912, 516347111, 86660098, 1034123048, 390694563, 1490082987, 1456092804, 997229159, 1263980514, 768208874, 373428981, 381249820, 1284903395, 434862591, 97658014, 635475302, 570517315]) AS a,
          unnest([1522425843, 334529765, 1689677233, 1003823822, 1509779900, 1177694471, 385288776, 1001072043, 1286760556, 1140912466, 1555416272, 1474034036, 137111194, 1024637812, 1326353219, 494970825, 731651806, 1540310342, 993191396, 888645945, 1275083898, 325350617, 1359272703, 771243134, 711658336, 269452704, 606543124, 1932692492, 242146161, 1168033289, 31958265, 1568728816]) AS b),
        mh AS (SELECT doc_id, i,
            MIN((a * h + b) % 2147483647) AS m
          FROM sh, seeds GROUP BY doc_id, i),
        sig AS (SELECT doc_id, list(m ORDER BY i) AS sig FROM mh GROUP BY doc_id),
        pairs AS (SELECT a.doc_id AS d1, b.doc_id AS d2, a.sig AS s1, b.sig AS s2
          FROM sig a JOIN sig b ON a.doc_id < b.doc_id),
        cand AS (SELECT * FROM pairs WHERE EXISTS (
          SELECT 1 FROM unnest(range(0, 8)) r(b)
          WHERE list_slice(s1, r.b*4+1, r.b*4+4) = list_slice(s2, r.b*4+1, r.b*4+4))),
        z AS (SELECT d1, d2, unnest(s1) AS v1, unnest(s2) AS v2 FROM cand),
        est AS (SELECT d1, d2,
            SUM(CASE WHEN v1 = v2 THEN 1 ELSE 0 END) / 32.0 AS ej
          FROM z GROUP BY d1, d2)
        SELECT d1, d2, ROUND(ej, 6) AS est_jac FROM est
        WHERE ej >= 0.5 ORDER BY d1, d2""")),

    // Filter yield curve — the planning relation a quality-threshold
    // decision actually consumes: for every candidate cutoff t ∈ {0.0,
    // 0.1, …, 0.9} over the j49 quality score (the ONE scoring
    // definition j103/j104/j116 share), how many documents and tokens
    // survive `score ≥ t`, absolute and as a fraction of the corpus.
    // Built decile-binned like j116 (one corpus scan → ≤ 10-row bin
    // relation), then a DESCENDING cumulative window over a generated
    // 10-row threshold spine (constant-bound sequence), so empty deciles
    // still emit their threshold row. Unscored (NULL-text) docs are
    // excluded on both engines — the j116 convention. Counts are
    // integers; fractions are single divisions rounded at 6 dp, with
    // empty-corpus totals guarded to 0. Scale shape: scan → 10 rows;
    // the windows run on the spine only (allowlisted).
    Q("j121_filter_yield",
      (s, d) => {
        import org.apache.spark.sql.expressions.Window
        val scored = Round9.j49Scored(s, d)
          .where(col("score").isNotNull)
          .select(col("doc_id"),
            least(floor(col("score") * 10), lit(9)).cast("int").as("bin"))
        val toks = t(s, d, "documents")
          .select(col("doc_id"),
            coalesce(size(split(col("text"), " ")).cast("long"), lit(0L))
              .as("n_tok"))
        val bins = scored.join(toks, "doc_id")
          .groupBy("bin")
          .agg(count(lit(1)).as("b_docs"), sum(col("n_tok")).as("b_toks"))
        val spine = s.range(10).select(col("id").cast("int").as("bin"))
        val wDesc = Window.orderBy(desc("bin"))
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        val wAll = Window.partitionBy()
          .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
        spine.join(bins, Seq("bin"), "left")
          .select(col("bin"),
            coalesce(col("b_docs"), lit(0L)).as("b_docs"),
            coalesce(col("b_toks"), lit(0L)).as("b_toks"))
          .withColumn("docs_kept", sum(col("b_docs")).over(wDesc))
          .withColumn("toks_kept", sum(col("b_toks")).over(wDesc))
          .withColumn("t_docs", sum(col("b_docs")).over(wAll))
          .withColumn("t_toks", sum(col("b_toks")).over(wAll))
          .select(
            (col("bin").cast("double") / 10).as("threshold"),
            col("docs_kept"), col("toks_kept"),
            round(coalesce(col("docs_kept").cast("double") /
              nullif(col("t_docs").cast("double"), lit(0.0)), lit(0.0)), 6)
              .as("doc_frac"),
            round(coalesce(col("toks_kept").cast("double") /
              nullif(col("t_toks").cast("double"), lit(0.0)), lit(0.0)), 6)
              .as("tok_frac"))
          .orderBy("threshold")
      },
      Some("""WITH f AS (SELECT doc_id, string_split(text, ' ') AS toks
            FROM documents),
        ft AS (SELECT doc_id, toks,
            CAST(len(toks) AS DOUBLE) AS n,
            CAST(list_aggregate(list_transform(toks, t -> length(t)), 'sum')
              AS DOUBLE) AS chars,
            CAST(len(list_filter(toks, t -> t = 'the' OR t = 'a' OR t = 'of'
              OR t = 'and' OR t = 'in')) AS DOUBLE) AS sw,
            CAST(len(list_distinct(toks)) AS DOUBLE) AS types
          FROM f),
        z AS (SELECT doc_id, toks,
            -5.0 + 0.9 * ln(1.0 + n) + 0.35 * (chars / n)
              - 2.2 * (sw / n) + 1.1 * (types / n) AS z
          FROM ft),
        sc AS (SELECT doc_id,
            LEAST(CAST(floor(ROUND(1.0 / (1.0 + exp(-z)), 6) * 10) AS INT), 9)
              AS bin,
            COALESCE(CAST(len(toks) AS BIGINT), 0) AS n_tok
          FROM z WHERE z IS NOT NULL),
        bins AS (SELECT bin, COUNT(*) AS b_docs,
            CAST(SUM(n_tok) AS BIGINT) AS b_toks
          FROM sc GROUP BY bin),
        sp AS (SELECT CAST(i.i AS INT) AS bin,
            COALESCE(b_docs, 0) AS b_docs, COALESCE(b_toks, 0) AS b_toks
          FROM unnest(range(0, 10)) i(i) LEFT JOIN bins ON bins.bin = i.i),
        cum AS (SELECT bin,
            CAST(SUM(b_docs) OVER (ORDER BY bin DESC
              ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
              AS docs_kept,
            CAST(SUM(b_toks) OVER (ORDER BY bin DESC
              ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
              AS toks_kept,
            CAST(SUM(b_docs) OVER () AS BIGINT) AS t_docs,
            CAST(SUM(b_toks) OVER () AS BIGINT) AS t_toks
          FROM sp)
        SELECT CAST(bin AS DOUBLE) / 10 AS threshold, docs_kept, toks_kept,
          ROUND(COALESCE(CAST(docs_kept AS DOUBLE)
            / NULLIF(CAST(t_docs AS DOUBLE), 0), 0), 6) AS doc_frac,
          ROUND(COALESCE(CAST(toks_kept AS DOUBLE)
            / NULLIF(CAST(t_toks AS DOUBLE), 0), 0), 6) AS tok_frac
        FROM cum ORDER BY threshold""")),

    // Conversation-dedup SURVIVORS — the relation the pipeline actually
    // writes back: the j120 pair graph clustered into components
    // (CC.cluster — the bounded union-find hybrid, j14's device), then
    // every corpus doc labeled with its cluster (itself when unpaired)
    // and `keep` = is-canonical (the cluster's min doc_id). This is the
    // "keep one transcript per conversation" output an SFT-corpus build
    // consumes downstream of j120's audit view.
    //
    // Scale device — EXACT-SIGNATURE COLLAPSE before pair enumeration:
    // word-identical re-renders (the template-farm class this key
    // exists for — every planted cross-template duplicate is one) carry
    // IDENTICAL 32-slot signatures, so a farm of C copies would put
    // C·(C−1)/2 pairs through the band join. Group by the signature
    // (via an 8-byte hash), take the group-min doc as representative,
    // connect members to their rep by a LINEAR star edge list, and run
    // the band join over distinct-signature reps only. Connectivity is
    // preserved exactly — equal-signature docs reach each other through
    // the rep, and any cross-signature pair (a, b) at est ≥ 0.5 sharing
    // a band bucket is seen by their reps, which carry the same
    // signatures — so the output is IDENTICAL to clustering the full
    // j120 relation (the oracle recomputes THAT closure, hash-checking
    // the claim). What the collapse deliberately does NOT bound:
    // NEAR-cliques (distinct signatures at est < 1 — ScaleSoak's
    // synthetic boilerplate corpus, where all 4.1M pairs are near
    // pairs); those edges are load-bearing for connectivity and ride
    // CC's distributed path, which is built for them. CC is the proven
    // hybrid (driver union-find under the threshold, bounded label
    // propagation above); the corpus join is a left equi-join against a
    // cluster relation no larger than the paired docs.
    Q("j122_conversation_survivors",
      (s, d) => {
        // the group/join key is an 8-byte hash of the 32-slot signature,
        // not the array itself (the j2 "hash moves inside" discipline —
        // equality joins on longs, the array never rides the shuffle);
        // a 64-bit collision merges two groups spuriously with
        // P ≈ n²/2⁶⁵ — the accepted j2/j14 collision class
        val sig = conversationSigs(s, d)
          .withColumn("sigh", xxhash64(concat_ws(",", col("sig"))))
          .persist()
        // one aggregation yields the rep id AND its signature (min_by is
        // deterministic; group members share the sig modulo the accepted
        // 64-bit collision class)
        val reps = sig.groupBy("sigh").agg(min(col("doc_id")).as("rep"),
          expr("min_by(sig, doc_id)").as("sig"))
        // star edges: rep < member by construction (rep is the group min)
        val memberEdges = sig.select("sigh", "doc_id")
          .join(reps.select("sigh", "rep"), Seq("sigh"))
          .where(col("doc_id") =!= col("rep"))
          .select(col("rep").as("d1"), col("doc_id").as("d2"))
        val repPairs = sigPairs(s,
          reps.select(col("rep").as("doc_id"), col("sig")))
          .select("d1", "d2")
        val clusters = graft.ops.CC.cluster(s, memberEdges.union(repPairs))
        t(s, d, "documents").select(col("doc_id"))
          .join(clusters, Seq("doc_id"), "left")
          .select(col("doc_id"),
            coalesce(col("cluster"), col("doc_id")).as("cluster"),
            (coalesce(col("cluster"), col("doc_id")) === col("doc_id"))
              .as("keep"))
          .orderBy("doc_id")
      },
      Some("""WITH RECURSIVE b AS (SELECT doc_id,
            string_split(translate(text, chr(10) || chr(13), '  '), ' ')
              AS toks
          FROM documents),
        sj AS (SELECT d.doc_id, s.toks AS src_toks,
            2 + s.doc_id % 5 AS n_syn
          FROM (SELECT doc_id,
                  CASE WHEN doc_id % 9 = 8 THEN doc_id - 1 ELSE doc_id END
                    AS src_id
                FROM b) d
          JOIN b s ON s.doc_id = d.src_id),
        conv AS (SELECT doc_id,
            list_filter(src_toks[1:CAST(LEAST(n_syn * 4, len(src_toks))
              AS BIGINT)], w -> w <> '') AS ctoks
          FROM sj),
        tk AS (SELECT doc_id, ctoks AS toks FROM conv WHERE len(ctoks) >= 3),
        shs AS (SELECT DISTINCT doc_id,
            toks[i.i] || ' ' || toks[i.i+1] || ' ' || toks[i.i+2] AS sh
          FROM tk, unnest(range(1, len(toks)-1)) i(i)),
        sh AS (SELECT doc_id,
            CAST('0x' || substr(md5(sh),1,15) AS BIGINT) % 2147483647 AS h FROM shs),
        seeds AS (SELECT unnest(range(0, 32)) AS i,
          unnest([114060684, 143607338, 658016613, 1920833001, 1625018798, 2115868157, 1839658157, 1370607936, 1314768563, 1516846533, 899342927, 1761721496, 1792449689, 2056989732, 1252576877, 638180912, 516347111, 86660098, 1034123048, 390694563, 1490082987, 1456092804, 997229159, 1263980514, 768208874, 373428981, 381249820, 1284903395, 434862591, 97658014, 635475302, 570517315]) AS a,
          unnest([1522425843, 334529765, 1689677233, 1003823822, 1509779900, 1177694471, 385288776, 1001072043, 1286760556, 1140912466, 1555416272, 1474034036, 137111194, 1024637812, 1326353219, 494970825, 731651806, 1540310342, 993191396, 888645945, 1275083898, 325350617, 1359272703, 771243134, 711658336, 269452704, 606543124, 1932692492, 242146161, 1168033289, 31958265, 1568728816]) AS b),
        mh AS (SELECT doc_id, i,
            MIN((a * h + b) % 2147483647) AS m
          FROM sh, seeds GROUP BY doc_id, i),
        sig AS (SELECT doc_id, list(m ORDER BY i) AS sig FROM mh GROUP BY doc_id),
        pairs AS (SELECT a.doc_id AS d1, b.doc_id AS d2, a.sig AS s1, b.sig AS s2
          FROM sig a JOIN sig b ON a.doc_id < b.doc_id),
        cand AS (SELECT * FROM pairs WHERE EXISTS (
          SELECT 1 FROM unnest(range(0, 8)) r(b)
          WHERE list_slice(s1, r.b*4+1, r.b*4+4) = list_slice(s2, r.b*4+1, r.b*4+4))),
        z AS (SELECT d1, d2, unnest(s1) AS v1, unnest(s2) AS v2 FROM cand),
        est AS (SELECT d1, d2,
            SUM(CASE WHEN v1 = v2 THEN 1 ELSE 0 END) / 32.0 AS ej
          FROM z GROUP BY d1, d2),
        e AS (SELECT d1, d2 FROM est WHERE ej >= 0.5),
        und AS (SELECT d1 AS a, d2 AS b FROM e
          UNION ALL SELECT d2, d1 FROM e),
        reach(a, b) AS (SELECT a, b FROM und
          UNION SELECT r.a, u.b FROM reach r JOIN und u ON r.b = u.a),
        cl AS (SELECT a AS doc_id, LEAST(a, MIN(b)) AS cluster
          FROM reach GROUP BY a)
        SELECT dd.doc_id,
          COALESCE(cl.cluster, dd.doc_id) AS cluster,
          COALESCE(cl.cluster, dd.doc_id) = dd.doc_id AS keep
        FROM documents dd LEFT JOIN cl ON cl.doc_id = dd.doc_id
        ORDER BY dd.doc_id"""))
  )
}
