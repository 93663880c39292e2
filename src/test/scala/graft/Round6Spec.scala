package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class Round6Spec extends AnyFunSuite {
  lazy val spark: org.apache.spark.sql.SparkSession = TestSpark.spark
  private def run(key: String) =
    SparkEntry.queries(key)(spark, TestSpark.sf)

  test("j37 keeps every block of a doc with corpus-unique content") {
    // invariants over the whole fixture: kept ≤ blocks, kept ≥ 1 for the
    // canonical holder of each digest, and total kept = number of
    // DISTINCT block digests in the corpus (first-occurrence-wins is a
    // bijection onto distinct blocks)
    val out = run("j37_paragraph_dedup")
    val bad = out.where(col("n_kept") > col("n_blocks")).count()
    assert(bad == 0)
    val totalKept = out.agg(sum(col("n_kept"))).collect()(0).getLong(0)
    val distinctBlocks = Tables.t(spark, TestSpark.sf, "documents")
      .select(col("doc_id"), split(col("text"), " ").as("toks"))
      .select(posexplode(expr(
        "transform(sequence(0, cast((size(toks)+15) div 16 as int) - 1), " +
          "i -> concat_ws(' ', slice(toks, i*16+1, 16)))")))
      .select(col("col")).distinct().count()
    assert(totalKept == distinctBlocks,
      s"kept $totalKept != distinct blocks $distinctBlocks")
  }

  test("j37 reassembly preserves in-doc block order") {
    // for every doc, clean_text must be a subsequence of the original
    // block sequence joined by spaces — check the canonical doc of each
    // digest group keeps its full text (doc 0 is its own canonical for
    // at least its first block, weaker: every clean_text is a prefix-free
    // ordered join of original blocks, verified by re-splitting)
    val docs = Tables.t(spark, TestSpark.sf, "documents")
      .select(col("doc_id"), col("text"))
    val joined = run("j37_paragraph_dedup").join(docs, "doc_id")
      .where(col("n_kept") === col("n_blocks"))
    // docs that kept everything must reassemble to their exact original
    val broken = joined.where(col("clean_text") =!= col("text")).count()
    assert(broken == 0, "full-keep docs must reassemble byte-identically")
    assert(joined.count() > 0, "fixture must contain at least one full-keep doc")
  }

  test("j39 kNN graph: contiguous ranks, bounded cosines, bucket-consistent edges") {
    val out = run("j39_knn_graph").collect()
    assert(out.nonEmpty)
    out.groupBy(_.getAs[Long]("vec_id")).foreach { case (v, rows) =>
      val ranks = rows.map(_.getAs[Long]("rank")).sorted
      assert(ranks.sameElements(1L to ranks.length),
        s"vec $v ranks not contiguous: ${ranks.mkString(",")}")
      assert(ranks.length <= 3)
    }
    assert(out.forall(r => math.abs(r.getAs[Double]("cos")) <= 1.000001))
    // no self-edges
    assert(out.forall(r => r.getAs[Long]("vec_id") != r.getAs[Long]("nbr_id")))
  }

  test("j38 allocation exhausts the budget within rounding and respects the epoch cap") {
    val out = run("j38_token_budget").collect()
    val total = out.map(r => r.getAs[Double]("alloc_tok")).sum
    // Σ alloc = budget − residual rounding (≤ #sources · 1e-6) unless ALL
    // sources capped (then Σ = 4·Σn); fixture budget binds, so compare
    val budget = 30000.0
    assert(total <= budget + 1e-3, s"over-allocated: $total")
    assert(total >= budget - 1.0 || {
      // all-capped degenerate case: every source at 4 epochs
      out.forall(r => math.abs(r.getAs[Double]("epochs") - 4.0) < 1e-6)
    }, s"under-allocated without cap saturation: $total")
    out.foreach { r =>
      assert(r.getAs[Double]("epochs") <= 4.0 + 1e-6,
        s"epoch cap violated: $r")
    }
  }
}
