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

  test("capped_collect keeps complete groups under the cap, exact df over it") {
    import org.apache.spark.sql.functions._
    graft.functions.CappedLongList.register(spark)
    import spark.implicits._
    // group 'a': 3 values (under cap 5 — complete); 'b': 8 values (over)
    val df = ((1L to 3L).map(("a", _)) ++ (10L to 17L).map(("b", _)))
      .toDF("k", "v").repartition(4) // force multi-partition merges
    val got = df.groupBy("k").agg(expr("capped_collect(v, 5)").as("c"))
      .select(col("k"), col("c.ds").as("ds"), col("c.df").as("df"))
      .collect().map(r => r.getString(0) ->
        (r.getSeq[Long](1).toSet, r.getLong(2))).toMap
    assert(got("a") == ((1L to 3L).toSet, 3L))
    val (bDs, bDf) = (got("b")._1, got("b")._2)
    assert(bDf == 8L)                       // df is exact past the cap
    assert(bDs.size == 5 && bDs.subsetOf((10L to 17L).toSet)) // capped sample
  }

  test("heavy-df join path of pair generation matches the in-array path") {
    // production cap (1024) routes every fixture shingle through the array
    // path; maxDf=2 forces almost all of them down the heavy equi-join
    // fallback — the two physical paths must be output-identical
    val byArray = graft.ops.LlmOps.nearDupPairsForTest(spark, TestSpark.sf, 1024)
      .select("d1", "d2", "inter").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    val byJoin = graft.ops.LlmOps.nearDupPairsForTest(spark, TestSpark.sf, 2)
      .select("d1", "d2", "inter").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(byArray == byJoin,
      s"only-array: ${byArray -- byJoin}; only-join: ${byJoin -- byArray}")
    assert(byArray.nonEmpty)
  }

  test("capped_collect_pairs keeps aligned (id, weight) prefixes and exact df") {
    import org.apache.spark.sql.functions._
    graft.functions.CappedPairList.register(spark)
    import spark.implicits._
    // group 'a': 3 pairs (under cap 5 — complete, weights aligned to ids);
    // 'b': 8 pairs (over — exact df, capped sample still id↔weight aligned)
    val df = ((1L to 3L).map(v => ("a", v, v * 10)) ++
        (10L to 17L).map(v => ("b", v, v * 10)))
      .toDF("k", "v", "w").repartition(4) // force multi-partition merges
    val got = df.groupBy("k").agg(expr("capped_collect_pairs(v, w, 5)").as("c"))
      .select(col("k"), col("c.ds").as("ds"), col("c.cs").as("cs"),
        col("c.df").as("df"))
      .collect().map(r => r.getString(0) ->
        ((r.getSeq[Long](1), r.getSeq[Long](2), r.getLong(3)))).toMap
    val (aDs, aCs, aDf) = got("a")
    assert(aDf == 3L && aDs.toSet == (1L to 3L).toSet)
    assert(aDs.zip(aCs).forall { case (d, c) => c == d * 10 }) // alignment
    val (bDs, bCs, bDf) = got("b")
    assert(bDf == 8L)                       // df is exact past the cap
    assert(bDs.size == 5 && bDs.toSet.subsetOf((10L to 17L).toSet))
    assert(bDs.zip(bCs).forall { case (d, c) => c == d * 10 }) // alignment survives merge
  }

  test("weighted pair core: heavy-df join path matches the in-array path (j60)") {
    val tf = graft.ops.LlmOps.docShingleTf(spark, TestSpark.sf)
    def sums(maxDf: Int) =
      graft.ops.LlmOps.weightedPairSums(tf, maxDf)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    val byArray = sums(1024) // every fixture shingle under the cap
    val byJoin = sums(2)     // nearly all forced down the heavy equi-join
    assert(byArray == byJoin,
      s"only-array: ${byArray -- byJoin}; only-join: ${byJoin -- byArray}")
    assert(byArray.nonEmpty)
  }

  test("LSH ANN (j3b) candidates carry exact cosine values (subset of j3 space)") {
    val lsh = run("j3b_sim_lsh").collect()
    assert(lsh.nonEmpty)
    assert(lsh.map(_.getString(1)).distinct.length == 1) // all share the probe bucket
    val cos = lsh.map(_.getDouble(2))
    assert(cos.forall(c => c >= -1.0 && c <= 1.0))
    assert(cos.sameElements(cos.sorted.reverse)) // descending top-k
  }

  test("approx_count_distinct (d7 estimating regime) within 5% of exact per group") {
    import org.apache.spark.sql.functions._
    // the registry d7 key is graded in the exact regime (bounded domain,
    // coupon-mode Datasketches HLL — hash-matched by the oracle); THIS
    // pins the estimating regime: full o_custkey domain through HLL++
    val approx = Tables.t(spark, TestSpark.sf, "orders")
      .groupBy("o_orderstatus")
      .agg(approx_count_distinct(col("o_custkey")).as("approx_cust"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val exact = Tables.t(spark, TestSpark.sf, "orders")
      .groupBy("o_orderstatus").agg(countDistinct(col("o_custkey")).as("n"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    exact.foreach { case (k, ex) =>
      val ap = approx(k).toDouble
      assert(math.abs(ap - ex) / ex <= 0.05, s"$k: approx=$ap exact=$ex")
    }
    // and the exact-regime registry key reconciles with plain COUNT(DISTINCT)
    val graded = run("d7_agg_approx_distinct").collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val exactMod = Tables.t(spark, TestSpark.sf, "orders")
      .groupBy("o_orderstatus")
      .agg(countDistinct(expr("o_custkey % 512")).as("n"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(graded == exactMod)
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

  test("j2c prefix-filtered join is output-identical to j2's exact join") {
    val exact = run("j2_dedup_near").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    val pref = run("j2c_dedup_prefix").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    assert(pref == exact, s"prefix-only: ${pref -- exact}; exact-only: ${exact -- pref}")
  }

  test("j12 block-grid equals the brute-force upper triangle") {
    import org.apache.spark.sql.functions._
    // the grid decomposition must cover every unordered pair exactly once:
    // cross-check against an independently-written broadcast nested loop
    val emb = Tables.t(spark, TestSpark.sf, "embeddings")
    val a = emb.select(col("vec_id").as("i"), col("embedding").as("ea"))
    val b = emb.select(col("vec_id").as("j"), col("embedding").as("eb"))
    val brute = a.join(broadcast(b), col("i") < col("j"))
      .select(col("i"), col("j"),
        round(graft.expressions.CosineSimilarity(spark, col("ea"), col("eb")), 6).as("cos"))
      .where(col("cos") >= 0.45)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    val grid = run("j12_dedup_embed").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    assert(grid == brute, s"grid-only: ${grid -- brute}; brute-only: ${brute -- grid}")
  }

  test("dedup pipelines carry no broadcast hints on data-dependent sides") {
    // j2/j2c/j23 join sides whose cardinality is data-dependent (pairable
    // shingles, candidate pairs, clusters) — a broadcast HINT there is a
    // 100 TB OOM; the decision belongs to AQE/stats at runtime
    Seq("j2_dedup_near", "j2c_dedup_prefix", "j23_dedup_canonical").foreach { k =>
      val p = run(k).queryExecution.analyzed.toString
      assert(!p.contains("ResolvedHint"), s"$k carries a broadcast hint:\n$p")
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

  test("j52 bloom decontamination equals j25 exactly; the prune actually prunes") {
    import org.apache.spark.sql.functions._
    // identical verdicts — the bloom is an optimization, never a semantic
    val exact = run("j25_decontaminate").collect().map(_.toSeq).toSeq
    val bloom = run("j52_decontam_bloom").collect().map(_.toSeq).toSeq
    assert(bloom == exact)
    // measure the map-only prune on the same gram streams j52 builds:
    // at 1% fpp the surviving non-bench gram mass must be a small fraction
    val docs = spark.read.parquet(s"${TestSpark.sf}/documents.parquet")
      .select(col("doc_id"), col("source"), split(col("text"), " ").as("toks"))
      .where(size(col("toks")) >= 4)
    def grams(src: org.apache.spark.sql.DataFrame) = src.select(explode(expr(
      "array_distinct(transform(sequence(1, size(toks)-3), " +
        "i -> xxhash64(concat_ws(' ', slice(toks, i, 4)))))")).as("g"))
    val bench = grams(docs.where(col("source") === "src0")).distinct()
    val bytes = graft.functions.Bloom.build(bench, bench.count(), 0.01, col("g"))
    val train = grams(docs.where(col("source") =!= "src0"))
    val total = train.count()
    val kept = train
      .where(graft.functions.Bloom.mightContain(spark, bytes, col("g"))).count()
    val trueHits = train.join(bench, "g").count()
    assert(kept >= trueHits, "bloom dropped a true bench gram (impossible)")
    assert(kept < total / 2,
      s"bloom pruned nothing: kept $kept of $total train grams")
  }
}
