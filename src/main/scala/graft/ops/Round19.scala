package graft.ops

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType
import graft.Tables._

/** Round-19 batch — corpus-ops planning/monitoring operators (EXT per
  * SURVEY §1: queries a training-data pipeline runs through the
  * reference's QUERY channel, `pandas_td/td.py :: read_td_query`,
  * §0-caveated anchor).
  *
  * j116 closes the drift-monitoring gap next to j103/j104: those audit
  * the quality classifier's honesty on ONE corpus; PSI answers "did the
  * score distribution MOVE between two corpus snapshots" — the gate a
  * crawl-over-crawl refresh runs before retraining filters (population
  * stability index, the standard score-drift metric in model-monitoring
  * practice; >0.2 conventionally flags a shift). j117 adds the
  * data-budget planning relation the mixing family (j30/j38/j82/j87)
  * stops short of: with per-source token masses and a total training
  * budget, how many EPOCHS of each source serve the budget under a
  * repeat cap (the ~4-epoch guidance of data-constrained scaling,
  * Muennighoff et al. 2023) — emitted as the relation a sampler consumes
  * downstream, with the unmet deficit made explicit per source.
  */
object Round19 {

  /** The j117 schedule relation (source, n_tokens, target_tokens,
    * served_tokens, epochs, unmet_tokens) — factored so j119's
    * deficit-redistribution second pass (Round20) starts from the same
    * plan instead of re-deriving it. `budgetSql` is a SQL expression
    * evaluated over the aggregated per-source relation (so it may be a
    * window total, e.g. j119's capacity-point `4L * sum(n_tokens) over
    * ()`); the default is j117's fixed 3M-token budget. One copy of the
    * NULL-coalesce/least subtlety serves both keys (r20 review
    * finding). */
  private[graft] val EpochBudget = 3000000L
  private[graft] val EpochCap = 4L
  private[graft] def epochSchedule(s: org.apache.spark.sql.SparkSession,
      d: String, budgetSql: String = s"${EpochBudget}L")
      : org.apache.spark.sql.DataFrame = {
    val cap = EpochCap
    // coalesce: an all-NULL-text source sums to NULL, and Spark's
    // least() SKIPS null arguments — the cap would silently read as
    // "fully served" instead of 0 tokens (r19 review finding; the
    // oracle carries the same COALESCE so LEAST never sees NULL on
    // either engine)
    val st = t(s, d, "documents")
      .groupBy("source")
      .agg(coalesce(sum(size(split(col("text"), " ")).cast("long")),
        lit(0L)).as("n_tokens"))
    val w = Window.partitionBy()
      .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    st
      // integer `div`, not `/`: Spark's `/` on longs is DOUBLE
      // division, and the oracle computes `//` — keep both integral
      .withColumn("n_sources", count(lit(1)).over(w))
      .withColumn("target_tokens", expr(s"($budgetSql) div n_sources"))
      .withColumn("served_tokens",
        least(lit(cap) * col("n_tokens"), col("target_tokens")))
      .select(col("source"), col("n_tokens"), col("target_tokens"),
        col("served_tokens"),
        round(coalesce(col("served_tokens").cast("double") /
          nullif(col("n_tokens").cast("double"), lit(0.0)), lit(0.0)), 6)
          .as("epochs"),
        (col("target_tokens") - col("served_tokens"))
          .as("unmet_tokens"))
      .orderBy("source")
  }

  val all: Seq[Q] = Seq(

    // PSI between the even-doc_id snapshot (reference crawl) and the
    // odd-doc_id snapshot (current crawl) over the j49 quality score —
    // the SAME classifier j103 calibrates and j104 ranks (one scoring
    // definition, Round9.j49Scored). Scale shape: ONE corpus scan
    // collapses to the <= 10-row (bin, side-counts) relation; the share
    // and PSI arithmetic is bounded-relation algebra (window totals over
    // the bin relation — j103's ECE allowance). Determinism: counts are
    // integers; shares are single divisions; each bin's PSI term is
    // rounded to 6 dp and summed as DECIMAL(18,12) (j105's discount
    // device — the total is exact decimal arithmetic, immune to window
    // summation order). Bins empty on EITHER side contribute 0 (the
    // drop-empty-bins convention, epsilon-free so both engines agree
    // exactly; an empty snapshot therefore reads PSI = 0, not an error).
    Q("j116_psi_drift",
      (s, d) => {
        val binned = Round9.j49Scored(s, d)
          // a NULL score (null-text doc) must be EXCLUDED, not binned:
          // Spark's least() SKIPS null arguments (bin would read 9) while
          // DuckDB's LEAST propagates NULL pre-1.1 (a NULL bin group) —
          // an engine/version-dependent divergence the r19 advice flagged.
          // Unscored docs carry no drift signal; drop them explicitly on
          // BOTH engines.
          .where(col("score").isNotNull)
          .select(least(floor(col("score") * 10), lit(9)).cast("int")
            .as("bin"), col("doc_id"))
        val cnt = binned.groupBy("bin")
          .agg(sum(when(col("doc_id") % 2 === 0, 1L).otherwise(0L))
            .as("n_ref"),
            sum(when(col("doc_id") % 2 === 1, 1L).otherwise(0L))
              .as("n_cur"))
        val w = Window.partitionBy()
          .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
        val shares = cnt
          .withColumn("p_ref", col("n_ref").cast("double") /
            nullif(sum(col("n_ref")).over(w).cast("double"), lit(0.0)))
          .withColumn("p_cur", col("n_cur").cast("double") /
            nullif(sum(col("n_cur")).over(w).cast("double"), lit(0.0)))
        val term = when(col("p_ref") > 0 && col("p_cur") > 0,
          round((col("p_cur") - col("p_ref")) *
            log(col("p_cur") / col("p_ref")), 6))
          .otherwise(lit(0.0))
        shares
          .withColumn("psi_term", term)
          .withColumn("psi",
            sum(col("psi_term").cast(DecimalType(18, 12))).over(w)
              .cast("double"))
          .select(col("bin"), col("n_ref"), col("n_cur"),
            round(coalesce(col("p_ref"), lit(0.0)), 6).as("p_ref"),
            round(coalesce(col("p_cur"), lit(0.0)), 6).as("p_cur"),
            col("psi_term"), col("psi"))
          .orderBy("bin")
      },
      Some("""WITH f AS (SELECT doc_id, string_split(text, ' ') AS toks
            FROM documents),
        ft AS (SELECT doc_id,
            CAST(len(toks) AS DOUBLE) AS n,
            CAST(list_aggregate(list_transform(toks, t -> length(t)), 'sum')
              AS DOUBLE) AS chars,
            CAST(len(list_filter(toks, t -> t = 'the' OR t = 'a' OR t = 'of'
              OR t = 'and' OR t = 'in')) AS DOUBLE) AS sw,
            CAST(len(list_distinct(toks)) AS DOUBLE) AS types
          FROM f),
        z AS (SELECT doc_id,
            -5.0 + 0.9 * ln(1.0 + n) + 0.35 * (chars / n)
              - 2.2 * (sw / n) + 1.1 * (types / n) AS z
          FROM ft),
        sc AS (SELECT doc_id,
            LEAST(CAST(floor(ROUND(1.0 / (1.0 + exp(-z)), 6) * 10) AS INT), 9)
              AS bin
          FROM z WHERE z IS NOT NULL),
        cnt AS (SELECT bin,
            CAST(SUM(CASE WHEN doc_id % 2 = 0 THEN 1 ELSE 0 END) AS BIGINT)
              AS n_ref,
            CAST(SUM(CASE WHEN doc_id % 2 = 1 THEN 1 ELSE 0 END) AS BIGINT)
              AS n_cur
          FROM sc GROUP BY bin),
        sh AS (SELECT bin, n_ref, n_cur,
            CAST(n_ref AS DOUBLE) / NULLIF(SUM(CAST(n_ref AS DOUBLE)) OVER (), 0)
              AS p_ref,
            CAST(n_cur AS DOUBLE) / NULLIF(SUM(CAST(n_cur AS DOUBLE)) OVER (), 0)
              AS p_cur
          FROM cnt),
        tm AS (SELECT bin, n_ref, n_cur, p_ref, p_cur,
            CASE WHEN p_ref > 0 AND p_cur > 0
              THEN ROUND((p_cur - p_ref) * ln(p_cur / p_ref), 6)
              ELSE 0.0 END AS psi_term
          FROM sh)
        SELECT bin, n_ref, n_cur,
          ROUND(COALESCE(p_ref, 0), 6) AS p_ref,
          ROUND(COALESCE(p_cur, 0), 6) AS p_cur,
          psi_term,
          CAST(SUM(CAST(psi_term AS DECIMAL(18,12))) OVER () AS DOUBLE)
            AS psi
        FROM tm ORDER BY bin""")),

    // Epoch/repeat schedule under a token budget — the data-constrained
    // planning relation: each source's share of a 3M-token budget is the
    // UNIFORM per-source target (budget div |sources| — the mixture an
    // under-represented-domain recipe starts from; j82's temperature key
    // reweights it when proportionality is wanted), served up to a
    // 4-epoch repeat cap (the diminishing-returns guidance of
    // data-constrained scaling), with the unmet deficit explicit so a
    // planner can redistribute it in a second pass. INTEGER arithmetic
    // end to end (targets, caps, served tokens); only the epochs column
    // divides, rounded at 6 dp. Scale shape: one corpus scan -> the
    // |sources|-row relation; the |S| and target computation is a window
    // total over that bounded relation (j87's allowance). A source with
    // ZERO tokens (all-empty docs) serves 0 and reads epochs = 0 via the
    // NULLIF guard, not a divide-by-zero.
    Q("j117_epoch_schedule",
      (s, d) => epochSchedule(s, d),
      Some("""WITH st AS (SELECT source,
            COALESCE(CAST(SUM(len(string_split(text, ' '))) AS BIGINT), 0)
              AS n_tokens
          FROM documents GROUP BY source),
        pl AS (SELECT source, n_tokens,
            CAST(3000000 // COUNT(*) OVER () AS BIGINT) AS target_tokens
          FROM st),
        sv AS (SELECT source, n_tokens, target_tokens,
            LEAST(4 * n_tokens, target_tokens) AS served_tokens
          FROM pl)
        SELECT source, n_tokens, target_tokens, served_tokens,
          ROUND(COALESCE(CAST(served_tokens AS DOUBLE)
            / NULLIF(CAST(n_tokens AS DOUBLE), 0), 0), 6) AS epochs,
          CAST(target_tokens - served_tokens AS BIGINT) AS unmet_tokens
        FROM sv ORDER BY source""")),

    // Chat/SFT-transcript structure audit — the validation pass an
    // instruction-tuning pipeline runs before a chat corpus reaches the
    // template renderer: parse role-tagged turns and flag the two defect
    // classes that silently poison SFT runs — broken role ALTERNATION
    // (consecutive same-role turns merge under most chat templates) and
    // an assistant token share too low to train on. The fixture
    // synthesizes a deterministic transcript per doc (m14's
    // render-then-parse discipline: 2-6 "role: content" lines, a system
    // line on every 4th doc, a PLANTED double-user violation on every
    // 7th), the parser re-derives everything from the text, and the
    // oracle replays the synthesis rule — a matched render/parse bug
    // cannot cancel. Map-only: per-row split/regexp + one posexplode,
    // one per-doc aggregation; the alternation check is a lag window
    // inside the doc partition. Scales as a pure scan.
    Q("j118_chat_turns",
      (s, d) => {
        val turns = t(s, d, "documents")
          // newline-sanitized tokens: the renderer frames turns with
          // '\n', so source newlines must not fabricate extra lines
          // (fixtures carry none; a real corpus would)
          .select(col("doc_id"),
            split(translate(col("text"), "\n\r", "  "), " ").as("toks"))
          .selectExpr("doc_id",
            "cast(2 + doc_id % 5 AS INT) AS n_syn",
            s"""array_join(transform(${Ngrams.seqAsc("1", "cast(2 + doc_id % 5 AS INT)")},
                 i -> concat(
                   CASE WHEN i = 1 AND doc_id % 4 = 0 THEN 'system'
                        WHEN doc_id % 7 = 0 AND i = 2 THEN 'user'
                        WHEN i % 2 = 1 THEN 'user' ELSE 'assistant' END,
                   ': ',
                   coalesce(concat_ws(' ',
                     slice(toks, cast((i - 1) * 4 + 1 AS INT),
                       least(4, greatest(0, size(toks) - (i - 1) * 4)))),
                     ''))),
               chr(10)) AS chat""")
          // '\n' as a LITERAL Scala newline inside the SQL string: the
          // newline char reads identically as regex and as the Presto
          // dialect's literal delimiter (chr(10) would THROW there —
          // Presto's split requires a literal delimiter); n_tok counts
          // NON-EMPTY parsed tokens so empty source tokens (double
          // spaces) cannot desync parse-side and synthesis-side counts;
          // regexp_replace strips only the leading 'role: ' prefix, so
          // a content token ending in ':' cannot eat earlier tokens
          .selectExpr("doc_id",
            "posexplode(split(chat, '\n')) AS (i0, line)")
          .selectExpr("doc_id", "cast(i0 + 1 AS INT) AS turn_idx",
            "regexp_extract(line, '^([a-z]+): ', 1) AS role",
            """cast(size(filter(split(regexp_replace(line, '^[a-z]+: ', ''),
                 ' '), x -> x != '')) AS BIGINT) AS n_tok""")
        val w = Window.partitionBy("doc_id").orderBy("turn_idx")
        turns
          .withColumn("viol",
            when(lag(col("role"), 1).over(w) === col("role"), 1L)
              .otherwise(0L))
          .groupBy("doc_id")
          .agg(count(lit(1)).cast("long").as("n_turns"),
            sum(col("viol")).as("n_alternation_violations"),
            sum(when(col("role") === "assistant", col("n_tok"))
              .otherwise(0L)).as("assistant_tokens"),
            sum(col("n_tok")).as("total_tokens"))
          .select(col("doc_id"), col("n_turns"),
            col("n_alternation_violations"), col("assistant_tokens"),
            col("total_tokens"),
            when(coalesce(col("total_tokens"), lit(0L)) === 0, lit(0.0))
              .otherwise(round(col("assistant_tokens").cast("double") /
                col("total_tokens").cast("double"), 6))
              .as("assistant_share"))
          .orderBy("doc_id")
      },
      Some("""WITH base AS (SELECT doc_id,
            string_split(translate(text, chr(10) || chr(13), '  '), ' ')
              AS toks,
            2 + doc_id % 5 AS n_syn
          FROM documents),
        turn AS (SELECT doc_id, i.i AS turn_idx,
            CASE WHEN i.i = 1 AND doc_id % 4 = 0 THEN 'system'
                 WHEN doc_id % 7 = 0 AND i.i = 2 THEN 'user'
                 WHEN i.i % 2 = 1 THEN 'user' ELSE 'assistant' END AS role,
            COALESCE(CAST(len(list_filter(
              toks[((i.i - 1) * 4 + 1):((i.i - 1) * 4
                + LEAST(4, GREATEST(0, len(toks) - (i.i - 1) * 4)))],
              x -> x <> '')) AS BIGINT), 0) AS n_tok
          FROM base, unnest(range(1, n_syn + 1)) i(i)),
        v AS (SELECT doc_id, turn_idx, role, n_tok,
            CASE WHEN lag(role) OVER (PARTITION BY doc_id ORDER BY turn_idx)
              = role THEN 1 ELSE 0 END AS viol
          FROM turn)
        SELECT doc_id, COUNT(*) AS n_turns,
          CAST(SUM(viol) AS BIGINT) AS n_alternation_violations,
          CAST(SUM(CASE WHEN role = 'assistant' THEN n_tok ELSE 0 END)
            AS BIGINT) AS assistant_tokens,
          CAST(SUM(n_tok) AS BIGINT) AS total_tokens,
          CASE WHEN COALESCE(SUM(n_tok), 0) = 0 THEN 0.0
            ELSE ROUND(CAST(SUM(CASE WHEN role = 'assistant' THEN n_tok
              ELSE 0 END) AS DOUBLE) / CAST(SUM(n_tok) AS DOUBLE), 6) END
            AS assistant_share
        FROM v GROUP BY doc_id ORDER BY doc_id"""))
  )
}
