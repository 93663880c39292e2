package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.ops.Knobs

/** Scale rehearsal (VERDICT r8 item 5): one REAL operator run in which the
  * heavy-df equi-join split, the capped postings buffers, AND the
  * distributed iterative-CC path ALL engage simultaneously — the
  * configuration a 100 TB deployment actually runs — proven
  * output-identical to the default fixture-regime path (driver union-find,
  * mostly in-array pair expansion), which is itself oracle-proven at
  * sf0.01.
  *
  * Fixture (deterministic, no RNG): ~3000 docs in the SkewSpec mold —
  * every third doc carries a 7-token boilerplate header (shingle df ≈
  * 1000, far above every cap) over a rare-phrase body (phrase df ≈ 5) —
  * plus planted structure that exercises CC non-trivially:
  *   - 12 exact-dup clusters of 3 docs each (multi-member components);
  *   - one 8-doc CHAIN (consecutive docs share 5 of 6 body phrases,
  *     non-consecutive fall below the Jaccard bar) — a diameter-7
  *     component that min-label propagation cannot finish in one round,
  *     so the convergence loop genuinely iterates.
  */
class SoakSpec extends AnyFunSuite {
  lazy val spark: org.apache.spark.sql.SparkSession = TestSpark.spark

  private val BOILER = "terms of service apply to all content"
  private val ChainBase = 2900L

  private def phrase(p: Long): String = (0 until 5).map(k => s"q${p}w$k").mkString(" ")

  private def corpus: Seq[(Long, String)] = {
    def body(id: Long): String =
      (0 until 6).map(j => phrase((id * (19 + 23 * j) + 433 * j) % 3001)).mkString(" ")
    val base = (0L until 2900L).map { id =>
      // 12 planted triples: docs (60k, 60k+1, 60k+2) for k in 1..12 dup
      val src = if (id % 60 <= 2 && id >= 60 && id / 60 <= 12) (id / 60) * 60 else id
      val txt = if (src % 3 == 0) s"$BOILER ${body(src)}" else body(src)
      (id, txt)
    }
    // the chain: doc ChainBase+k uses phrase slots [k, k+6) of a dedicated
    // pool (disjoint from the body pool, so no cross-edges). Consecutive
    // docs share a contiguous 5-phrase run: shingle Jaccard = 23/33 ≈ 0.70
    // ≥ 0.5 → edge; doc k and k+2 share a 4-phrase run: 18/38 ≈ 0.47 < 0.5
    // → no skip edge. Diameter 7 ⇒ several propagation rounds.
    val chain = (0L until 8L).map { k =>
      (ChainBase + k, (0 until 6).map(j => phrase(9000L + k + j)).mkString(" "))
    }
    base ++ chain
  }

  private lazy val dir: String = {
    val d = graft.ops.Scratch.dir("soak")
    import spark.implicits._
    corpus.toDF("doc_id", "text")
      .withColumn("lang", lit("en"))
      .withColumn("source", lit("soak"))
      .withColumn("n_chars", length(col("text")).cast("long"))
      .coalesce(4)
      .write.mode("overwrite").parquet(s"$d/documents.parquet")
    d
  }

  test("heavy split + capped postings + iterative CC = the default path's clusters") {
    val run = () => SparkEntry.queries("j14_dedup_clusters")(spark, dir)
      .collect().map(r => (r.getLong(0), r.getLong(1))).sorted.toSeq

    // sanity: boilerplate df must exceed even the DEFAULT postings cap
    val maxDf = graft.ops.LlmOps.shinglesWithCount(spark, dir)
      .groupBy("sh").count().agg(max("count")).collect()(0).getLong(0)
    assert(maxDf > 256, s"fixture lost its skew: max shingle df $maxDf")

    val light = run() // defaults: maxDf 256, driver union-find

    spark.conf.set(Knobs.PairMaxDfKey, "8")          // most shingles go heavy
    spark.conf.set(Knobs.CcCollectThresholdKey, "0") // force distributed CC
    val heavy = try run() finally {
      spark.conf.unset(Knobs.PairMaxDfKey)
      spark.conf.unset(Knobs.CcCollectThresholdKey)
    }

    assert(light == heavy,
      "scale-path clusters must be identical to the oracle-proven default path")

    // the planted chain is ONE component — its min-label propagation needs
    // multiple rounds (diameter 7), so equality above proves the
    // iterative path converged correctly, not just ran
    val chainClusters = light.filter(_._1 >= ChainBase).map(_._2).distinct
    assert(chainClusters == Seq(ChainBase),
      s"chain must form one component labeled $ChainBase, got $chainClusters")
    // and the triples clustered to their base doc
    val t1 = light.filter(p => p._1 >= 60 && p._1 <= 62).map(_._2).distinct
    assert(t1 == Seq(60L), s"planted triple must cluster to 60, got $t1")
  }
}
