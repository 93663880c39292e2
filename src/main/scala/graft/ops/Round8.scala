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
  * Scale shape: doc lengths are a map-only projection; the (N, avgdl)
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

  val all: Seq[Q] = Seq(

    Q("j42_bm25",
      (s, d) => {
        val qTerms = Seq("table", "scan", "join", "filter",
          "window", "agg", "sort", "hash")
        val docs = t(s, d, "documents")
          .select(col("doc_id"), split(col("text"), " ").as("toks"))
        val dl = docs.select(col("doc_id"), size(col("toks")).cast("long").as("dl"))
        // (N, avgdl) — one row; avgdl = exact-long sum / exact count, one
        // double division, identical in DuckDB
        val st = dl.agg(count(lit(1)).as("n"),
          (sum(col("dl")).cast("double") / count(lit(1))).as("avgdl"))
        val tf = docs.select(col("doc_id"), explode(col("toks")).as("term"))
          .where(col("term").isin(qTerms: _*))
          .groupBy("doc_id", "term").agg(count(lit(1)).as("tf"))
        // df per query term = tf's row count per term (tf rows are
        // distinct (doc, term) by construction) — ≤ |q| rows, broadcast
        val dfT = tf.groupBy("term").agg(count(lit(1)).as("df"))
        val contrib = tf.join(broadcast(dfT), "term")
          .join(dl, "doc_id")
          .crossJoin(broadcast(st))
          .select(col("doc_id"),
            round(
              log((col("n") - col("df") + lit(0.5)) / (col("df") + lit(0.5)) + lit(1.0))
                * col("tf") * lit(2.2)
                / (col("tf") + lit(1.2) * (lit(0.25) + lit(0.75) * col("dl") / col("avgdl"))),
              6).cast("decimal(18,6)").as("c"))
        contrib.groupBy("doc_id")
          .agg(sum(col("c")).cast("double").as("score"))
          .orderBy(desc("score"), asc("doc_id")).limit(10)
      },
      Some("""WITH tk AS (SELECT doc_id, string_split(text,' ') AS toks FROM documents),
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
          FROM sc GROUP BY doc_id)
        SELECT doc_id, score FROM agg
        ORDER BY score DESC, doc_id LIMIT 10""")))
}
