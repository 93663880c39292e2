package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Demonstrates (not argues) the PPJoin prefix filter's asymptotic win on
  * a SKEWED corpus — the regime the bench fixture can't show (BASELINE.md
  * documents the bench corpus as the adversarial flat case: avg shingle
  * df ≈ 10, so the prefix only halves the join mass there).
  *
  * Fixture: 4000 docs; every third doc opens with the same 7-token
  * boilerplate header (the real-world duplication mode: ToS banners,
  * nav bars, license blocks), so the ~5 boilerplate shingles have
  * df ≈ 1333 while the body is built from a 2000-phrase pool giving
  * body shingles df ≈ 12. The inverted-index join's cost is
  * Σ_sh C(df,2): the boilerplate shingles alone contribute ~4.4M
  * candidate rows — quadratic in the number of docs carrying the
  * header. The canonical (df asc) prefix order ranks boilerplate LAST,
  * so it falls outside every doc's prefix and the candidate join never
  * sees it. At 100 TB with boilerplate on millions of docs this is the
  * difference between a bounded join and a quadratic blowup. */
class SkewSpec extends AnyFunSuite {
  lazy val spark: org.apache.spark.sql.SparkSession = TestSpark.spark

  private val BOILER = "terms of service apply to all content"

  /** Deterministic skewed corpus. Body = 6 five-token phrases from a
    * 4001-phrase pool (each phrase lands in ~6 docs → pairable but rare);
    * the slot-phrase mapping mixes id×slot so no fixed doc-id shift can
    * reproduce another doc's phrase sequence (a pure affine mapping would
    * plant a whole family of ~0.7-Jaccard pairs at one shift). Docs
    * 100/101 and 200/201 are exact dups — the expected output. No RNG —
    * the fixture is byte-stable across runs. */
  private def corpus: Seq[(Long, String)] = {
    def phrase(p: Long): String = (0 until 5).map(k => s"p${p}w$k").mkString(" ")
    def body(id: Long): String =
      (0 until 6).map(j => phrase((id * (13 + 17 * j) + 311 * j) % 4001)).mkString(" ")
    (0L until 4000L).map { id =>
      val src = if (id == 101L) 100L else if (id == 201L) 200L else id
      val txt = if (src % 3 == 0) s"$BOILER ${body(src)}" else body(src)
      (id, txt)
    }
  }

  private lazy val dir: String = {
    val d = graft.ops.Scratch.dir("skewfix")
    import spark.implicits._
    // carry the fixture's full documents schema — the shared doc readers
    // project lang/source/n_chars even when a query ignores them
    corpus.toDF("doc_id", "text")
      .withColumn("lang", lit("en"))
      .withColumn("source", lit("skewfix"))
      .withColumn("n_chars", length(col("text")).cast("long"))
      .coalesce(4)
      .write.mode("overwrite").parquet(s"$d/documents.parquet")
    d
  }

  private def mass(df: org.apache.spark.sql.DataFrame): Long =
    df.groupBy("sh").agg(count(lit(1)).as("df"))
      .where(col("df") >= 2)
      .agg(sum(expr("df * (df - 1) / 2")).cast("long"))
      .collect()(0).getLong(0)

  test("j2c equals j2 on the boilerplate-skewed corpus") {
    // load-bearing fixture property: the boilerplate shingles exceed j2's
    // 256-df postings cap, so this equality proves the HEAVY equi-join
    // branch (not just the in-array light path) produces correct pairs at
    // production df — the only fixture where that branch carries real data
    val maxDf = graft.ops.LlmOps.shinglesWithCount(spark, dir)
      .groupBy("sh").count().agg(max("count")).collect()(0).getLong(0)
    assert(maxDf > 256, s"fixture must exceed the postings cap, max df $maxDf")
    val j2 = SparkEntry.queries("j2_dedup_near")(spark, dir)
      .collect().map(_.toString).sorted
    val j2c = SparkEntry.queries("j2c_dedup_prefix")(spark, dir)
      .collect().map(_.toString).sorted
    assert(j2.sameElements(j2c), "prefix path must be output-identical under skew")
    assert(j2.length == 2, s"expected exactly the 2 planted dup pairs, got ${j2.length}")
  }

  test("prefix filter removes the boilerplate join mass (>10x reduction)") {
    val full = mass(graft.ops.LlmOps.shinglesWithCount(spark, dir))
    val pref = mass(graft.ops.LlmOps.prefixIndex(spark, dir, 0.5))
    // boilerplate df ≈ 1333 → its Σ C(df,2) ≈ 4.4M dominates `full`;
    // the prefix index must exclude it entirely, leaving only the
    // rare-phrase mass (df ≈ 12, further halved by prefix truncation)
    info(s"full join mass = $full, prefix join mass = $pref " +
      f"(${full.toDouble / pref}%.0fx reduction)")
    assert(full > 4000000L, s"fixture lost its skew: full join mass $full")
    assert(pref * 10 < full,
      s"prefix join mass $pref must be >10x below full mass $full")
  }
}
