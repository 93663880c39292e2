package graft.ops

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.Tables._

/** Round-16 operators.
  *
  * k16 — ENGINE-SIDE parameterized query execution: the native analog of
  * the reference's `read_td_query(params=...)` (`pandas_td/td.py ::
  * read_td_query` — SURVEY §0-caveated anchor, §8.2). The reference
  * interpolates params into query TEXT client-side (covered here by
  * `td.dryRun` / the `params=` path); Spark 4's named parameter markers
  * (`spark.sql(text, args)`) are the second, engine-side tier: `:name`
  * placeholders resolve in the PARSER to literal expressions, so the
  * value never transits SQL text — an injection-shaped string stays one
  * inert literal, and the bound plan is identical to the literal plan
  * (ApiSpec pins both). Every pushdown property of the literal spelling
  * therefore holds: the bound filter reaches the parquet scan.
  *
  * j56b — j56's 100 TB output shape: j56 rebuilds every document's
  * surviving text via a full-corpus `collect_list` regroup — correct,
  * but at 100 TB that shuffles the whole corpus text to reassemble
  * mostly-unchanged documents. j56b emits per-doc STATISTICS ONLY
  * (dup token count + contiguous dup-span count) off the same coverage
  * core (Round15.substringCoverage — shared, so the keys cannot drift):
  * nothing heavier than (doc_id, position) pairs ever shuffles, and the
  * text rebuild stays the opt-in j56 spelling for the (rare) corpora
  * that need materialized cleaned text rather than a dedup report.
  */
object Round16 {

  def all: Seq[Q] = Seq(

    Q("k16_param_query",
      (s, d) => {
        implicit val ss: org.apache.spark.sql.SparkSession = s
        val eng = graft.api.td.createEngine("presto:x", d)
        graft.api.td.readTdQueryBound("""
          SELECT o_orderpriority, COUNT(*) AS n,
                 CAST(ROUND(SUM(CAST(o_totalprice AS DECIMAL(18,4))), 4) AS DOUBLE)
                   AS sum_price
          FROM orders
          WHERE o_orderdate >= :from_date AND o_orderstatus = :status
          GROUP BY o_orderpriority
          ORDER BY o_orderpriority""",
          eng, Map("from_date" -> "1995-06-01", "status" -> "F"))
      },
      Some("""SELECT o_orderpriority, COUNT(*) AS n,
          CAST(ROUND(SUM(CAST(o_totalprice AS DECIMAL(18,4))), 4) AS DOUBLE)
            AS sum_price
        FROM orders
        WHERE o_orderdate >= '1995-06-01' AND o_orderstatus = 'F'
        GROUP BY o_orderpriority
        ORDER BY o_orderpriority""")),

    Q("j56b_substring_spans",
      (s, d) => {
        val k = 8
        val (tk, covered) = Round15.substringCoverage(s, d, k)
        // contiguous covered runs per doc: a span opens wherever the
        // previous covered position is absent — one window over the
        // (sparse) covered set, never over the corpus
        val w = Window.partitionBy("doc_id").orderBy("p")
        val spans = covered
          .withColumn("prev", lag("p", 1).over(w))
          .groupBy("doc_id")
          .agg(count(lit(1)).as("dup_tokens"),
            sum(when(col("prev").isNull || col("prev") =!= col("p") - 1, 1L)
              .otherwise(0L)).as("n_spans"))
        tk.select(col("doc_id"), size(col("toks")).cast("long").as("n_tokens"))
          .join(spans, Seq("doc_id"), "left")
          .select(col("doc_id"), col("n_tokens"),
            coalesce(col("dup_tokens"), lit(0L)).as("dup_tokens"),
            coalesce(col("n_spans"), lit(0L)).as("n_spans"))
          .orderBy("doc_id")
      },
      Some("""WITH tk AS (SELECT doc_id, string_split(text, ' ') AS toks
              FROM documents),
        g AS (SELECT doc_id, i.i AS p,
                array_to_string(list_slice(toks, i.i, i.i + 7), ' ') AS g
              FROM tk, unnest(range(1, len(toks) - 6)) i(i)
              WHERE len(toks) >= 8),
        o AS (SELECT doc_id, p,
                row_number() OVER (PARTITION BY g ORDER BY doc_id, p) AS rn,
                count(*) OVER (PARTITION BY g) AS cnt
              FROM g),
        cov AS (SELECT DISTINCT doc_id, p + j.j AS cp
              FROM o, unnest(range(0, 8)) j(j) WHERE cnt >= 2 AND rn > 1),
        sp AS (SELECT doc_id, cp,
                cp - row_number() OVER (PARTITION BY doc_id ORDER BY cp) AS grp
              FROM cov),
        agg AS (SELECT doc_id, COUNT(*) AS dup_tokens,
                  COUNT(DISTINCT grp) AS n_spans
                FROM sp GROUP BY doc_id)
        SELECT b.doc_id, CAST(len(b.toks) AS BIGINT) AS n_tokens,
          CAST(coalesce(a.dup_tokens, 0) AS BIGINT) AS dup_tokens,
          CAST(coalesce(a.n_spans, 0) AS BIGINT) AS n_spans
        FROM tk b LEFT JOIN agg a ON b.doc_id = a.doc_id
        ORDER BY b.doc_id""")))
}
