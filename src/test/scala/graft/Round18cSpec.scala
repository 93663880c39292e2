package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Round-18 batch-3 pins.
  *
  * The retrieval-eval trio (j105/j106/j107) gets the cross-engine libm
  * pin (the 10 log2 rank discounts against DuckDB-computed literals —
  * the one place a C-vs-JVM ulp could reach the graded output) plus
  * driver-side recomputes of each statistic from the keys' own emitted
  * counts. j108 is re-derived from scratch on the collected edge set —
  * an independent O(E^1.5)-free brute-force triangle count. j109-j111
  * pin partition/normalization identities (ratios sum to 1, folds
  * partition the corpus, PMI recomputed from an independently derived
  * bigram total).
  */
class Round18cSpec extends AnyFunSuite {
  lazy val spark: org.apache.spark.sql.SparkSession = TestSpark.spark
  private val sf = TestSpark.sf

  /** round(1/log2(r+1), 6) for r = 1..10 as DuckDB computes them (glibc
    * log2). The Spark side must land on the same 6-dp values or every
    * nDCG disagrees at the hash gate. */
  private val DiscLiterals = Seq(1.0, 0.63093, 0.5, 0.430677, 0.386853,
    0.356207, 0.333333, 0.315465, 0.30103, 0.289065)

  test("nDCG rank discounts match the DuckDB-computed literals (libm pin)") {
    val got = spark.range(1, 11)
      .select(round(lit(1.0) / log2(col("id") + 1), 6).as("dc"))
      .collect().map(_.getAs[Double]("dc")).toSeq
    assert(got == DiscLiterals,
      s"JVM log2 path rounded differently: $got")
  }

  test("j105: ndcg = dcg/idcg, bounded by 1, ideal-list arithmetic holds") {
    val rows = SparkEntry.queries("j105_ndcg")(spark, sf).collect()
    assert(rows.length == 20)
    val idealTop10 = DiscLiterals.map(BigDecimal(_)).sum.toDouble
    rows.foreach { r =>
      val (dcg, idcg, ndcg) = (r.getAs[Double]("dcg"),
        r.getAs[Double]("idcg"), r.getAs[Double]("ndcg"))
      val nRel = r.getAs[Long]("n_rel")
      assert(dcg >= 0.0 && dcg <= idcg + 1e-12)
      assert(ndcg >= 0.0 && ndcg <= 1.0)
      assert(math.abs(ndcg - BigDecimal(dcg / idcg)
        .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble) < 1e-12,
        "ndcg must be the rounded ratio of its own emitted legs")
      if (nRel >= 10)
        assert(math.abs(idcg - idealTop10) < 1e-9,
          "with >=10 relevant docs the ideal list is the full discount sum")
    }
  }

  test("j106: reciprocal-rank arithmetic, zero iff no relevant in top-10") {
    val rows = SparkEntry.queries("j106_mrr")(spark, sf).collect()
    assert(rows.length == 20)
    rows.foreach { r =>
      val fr = r.getAs[Long]("first_rel_rank")
      val rr = r.getAs[Double]("rr")
      assert(fr >= 0 && fr <= 10)
      if (fr == 0) assert(rr == 0.0)
      else assert(math.abs(rr - BigDecimal(1.0 / fr)
        .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble) < 1e-12)
    }
    // the fixture's labels cluster in embedding space — the probe sweep
    // must find SOME relevant neighbor somewhere, else the metric (or
    // the ranking) is broken
    assert(rows.exists(_.getAs[Long]("first_rel_rank") > 0))
  }

  test("j107: recall is the emitted overlap ratio; counts are consistent") {
    val rows = SparkEntry.queries("j107_recall_at_k")(spark, sf).collect()
    assert(rows.length == 20)
    rows.foreach { r =>
      val (ne, na, nh) = (r.getAs[Long]("n_exact"), r.getAs[Long]("n_ann"),
        r.getAs[Long]("n_hit"))
      assert(ne == 10, "500-vector corpus always fills the exact top-10")
      assert(na >= 0 && na <= 10)
      assert(nh <= math.min(na, ne))
      assert(math.abs(r.getAs[Double]("recall") -
        BigDecimal(nh.toDouble / ne)
          .setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble) < 1e-12)
    }
    // single-table 6-plane LSH on the 500-vector fixture keeps thin
    // buckets (median n_ann ≈ 7 of 499 candidates — a ~70× prune), so
    // absolute recall is LOW by construction (0.035 mean at sf0.001 —
    // the honest number, and the j39b multi-probe / j39c OR-of-tables
    // motivation). The pin is that the path finds real neighbors at
    // all, not a tuned recall target.
    assert(rows.map(_.getAs[Long]("n_hit")).sum > 0,
      "LSH top-10 never intersects the exact top-10 — path broken")
  }

  test("j108: triangle census equals a from-scratch recount of the edges") {
    val row = SparkEntry.queries("j108_graph_triangles")(spark, sf)
      .collect().head
    val edges = SparkEntry.queries("j39_knn_graph")(spark, sf)
      .collect()
      .map(r => (r.getAs[Long]("vec_id"), r.getAs[Long]("nbr_id")))
      .map { case (a, b) => (math.min(a, b), math.max(a, b)) }
      .toSet
    val adj = edges.groupBy(_._1).map { case (k, v) => k -> v.map(_._2) }
    val nTri = edges.toSeq.map { case (u, v) =>
      adj.getOrElse(u, Set.empty[Long])
        .count(w => w > v && edges.contains((v, w)))
    }.sum
    val deg = edges.toSeq.flatMap(e => Seq(e._1, e._2))
      .groupBy(identity).map(_._2.size.toLong)
    val wedges = deg.map(d => d * (d - 1) / 2).sum
    assert(row.getAs[Long]("n_edges") == edges.size.toLong)
    assert(row.getAs[Long]("n_nodes") == deg.size.toLong)
    assert(row.getAs[Long]("n_tri") == nTri.toLong)
    assert(row.getAs[Long]("n_wedges") == wedges)
    assert(math.abs(row.getAs[Double]("clustering") -
      BigDecimal(3.0 * nTri / wedges)
        .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble) < 1e-12)
  }

  test("j109: the five class ratios partition every source's characters") {
    val rows = SparkEntry.queries("j109_script_mix")(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val sum = Seq("lo_r", "up_r", "dg_r", "sp_r", "other_r")
        .map(r.getAs[Double]).sum
      assert(math.abs(sum - 1.0) <= 3e-6,
        s"class ratios must partition the text: $sum")
      assert(r.getAs[Long]("n_chars") > 0)
    }
  }

  test("j110: folds partition the corpus; per-source shares close to 1") {
    val rows = SparkEntry.queries("j110_kfold_assign")(spark, sf).collect()
    val total = rows.map(_.getAs[Long]("n_docs")).sum
    val docs = spark.read.parquet(s"$sf/documents.parquet").count()
    assert(total == docs, "every doc in exactly one (fold, source) cell")
    assert(rows.forall(r => (0L to 4L).contains(r.getAs[Long]("fold"))))
    rows.groupBy(_.getAs[String]("source")).foreach { case (src, g) =>
      val share = g.map(_.getAs[Double]("source_share")).sum
      assert(math.abs(share - 1.0) <= 5e-4,
        s"fold shares of source $src sum to $share")
    }
  }

  test("j111: PMI recomputed from an independent bigram total") {
    val rows = SparkEntry.queries("j111_pmi_collocations")(spark, sf)
      .collect()
    assert(rows.nonEmpty && rows.length <= 20)
    val n = spark.read.parquet(s"$sf/documents.parquet")
      .select(size(split(col("text"), " ")).as("k"))
      .where(col("k") >= 2)
      .agg(sum(col("k") - 1)).collect().head.getLong(0)
    val c12s = rows.map(_.getAs[Long]("c12"))
    assert(c12s.zip(c12s.tail).forall { case (a, b) => a >= b })
    rows.foreach { r =>
      val (c12, c1, c2) = (r.getAs[Long]("c12"), r.getAs[Long]("c1"),
        r.getAs[Long]("c2"))
      assert(c12 >= 2 && c12 <= math.min(c1, c2))
      val want = BigDecimal(math.log((c12.toDouble * n) / (c1.toDouble * c2)))
        .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
      assert(math.abs(r.getAs[Double]("pmi") - want) < 1e-12,
        s"pmi(${r.getAs[String]("w1")},${r.getAs[String]("w2")})")
    }
  }
}
