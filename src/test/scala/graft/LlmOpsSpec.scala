package graft

import org.scalatest.funsuite.AnyFunSuite

/** EXT/LLM-pipeline semantics not fully covered by the oracle (SURVEY.md
  * §3.J): MinHash-LSH recall vs exact Jaccard, LSH-ANN sanity vs exact
  * top-k, approx-distinct bounds, decode-stub determinism. */
class LlmOpsSpec extends AnyFunSuite {
  lazy val spark: org.apache.spark.sql.SparkSession = TestSpark.spark

  private def run(key: String) = SparkEntry.queries(key)(spark, TestSpark.sf)

  test("MinHash-LSH (j2b) recovers the exact near-dup pairs (j2)") {
    val exact = run("j2_dedup_near").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val lsh = run("j2b_dedup_minhash").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    // planted near-dups are at jac≈0.9+: 8×4 banding has ~1-(1-0.9^4)^8 ≈ 0.9998
    // per-pair recall; the fixed corpus recovers them all, with no extras here
    assert(exact.subsetOf(lsh), s"missed: ${exact -- lsh}")
    assert((lsh -- exact).isEmpty, s"false positives past est_jac filter: ${lsh -- exact}")
  }

  test("LSH ANN (j3b) candidates carry exact cosine values (subset of j3 space)") {
    val lsh = run("j3b_sim_lsh").collect()
    assert(lsh.nonEmpty)
    assert(lsh.map(_.getString(1)).distinct.length == 1) // all share the probe bucket
    val cos = lsh.map(_.getDouble(2))
    assert(cos.forall(c => c >= -1.0 && c <= 1.0))
    assert(cos.sameElements(cos.sorted.reverse)) // descending top-k
  }

  test("approx_count_distinct (d7) within 5% of exact per group") {
    import org.apache.spark.sql.functions._
    val approx = run("d7_agg_approx_distinct").collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val exact = Tables.t(spark, TestSpark.sf, "orders")
      .groupBy("o_orderstatus").agg(countDistinct(col("o_custkey")).as("n"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    exact.foreach { case (k, ex) =>
      val ap = approx(k).toDouble
      assert(math.abs(ap - ex) / ex <= 0.05, s"$k: approx=$ap exact=$ex")
    }
  }

  test("decode stub is deterministic and 1:1") {
    val a = run("m2_decode_stub").collect()
    val b = run("m2_decode_stub").collect()
    assert(a.sameElements(b))
    assert(a.length == 500)
  }

  test("heavy-hitters sketch contains the exact top terms per lang") {
    import org.apache.spark.sql.functions._
    val sketch = run("k4_heavy_hitters").collect()
      .map(r => (r.getString(0), r.getString(1))).groupBy(_._1)
      .view.mapValues(_.map(_._2).toSet).toMap
    // exact top-3 by (count desc, term) per lang — SpaceSaving with k=5,
    // capacity 20 must retain terms with freq > N/20 (true for top-3 here)
    val tok = Tables.t(spark, TestSpark.sf, "documents")
      .select(col("lang"), explode(split(col("text"), " ")).as("term"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("lang").orderBy(desc("n"), asc("term"))
    val exact = tok.groupBy("lang", "term").agg(count(lit(1)).as("n"))
      .withColumn("rn", row_number().over(w)).where(col("rn") <= 3)
      .collect().map(r => (r.getString(0), r.getString(1))).groupBy(_._1)
      .view.mapValues(_.map(_._2).toSet).toMap
    exact.foreach { case (lang, top3) =>
      assert(top3.subsetOf(sketch(lang)),
        s"$lang: sketch ${sketch(lang)} missing ${top3 -- sketch(lang)}")
    }
  }

  test("near-dup jaccard values are valid and symmetric by construction") {
    val pairs = run("j2_dedup_near").collect()
    pairs.foreach { r =>
      assert(r.getLong(0) < r.getLong(1)) // canonical orientation
      val j = r.getDouble(2)
      assert(j >= 0.5 && j <= 1.0)
    }
  }
}
