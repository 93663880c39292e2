package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class Round8Spec extends AnyFunSuite {
  lazy val spark: org.apache.spark.sql.SparkSession = TestSpark.spark
  private def run(key: String) =
    SparkEntry.queries(key)(spark, TestSpark.sf)

  test("j42 BM25 agrees with a driver-side reference scorer") {
    val qTerms = Seq("table", "scan", "join", "filter",
      "window", "agg", "sort", "hash")
    val docs = Tables.t(spark, TestSpark.sf, "documents")
      .select(col("doc_id"), col("text")).collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getAs[String]("text").split(" ").toSeq)
    val n = docs.length.toLong
    val avgdl = docs.map(_._2.length.toLong).sum.toDouble / n
    val tf = docs.flatMap { case (id, toks) =>
      toks.filter(qTerms.contains).groupBy(identity)
        .map { case (t0, occ) => (id, t0, occ.length.toLong) }
    }
    val df = tf.groupBy(_._2).map { case (t0, rs) => t0 -> rs.length.toLong }
    val scores = tf.groupBy(_._1).map { case (id, rs) =>
      val dl = docs.find(_._1 == id).get._2.length.toLong
      id -> rs.map { case (_, t0, f) =>
        BigDecimal(math.log((n - df(t0) + 0.5) / (df(t0) + 0.5) + 1.0)
            * f * 2.2 / (f + 1.2 * (0.25 + 0.75 * dl / avgdl)))
          .setScale(6, BigDecimal.RoundingMode.HALF_UP)
      }.sum.toDouble
    }
    val expected = scores.toSeq.sortBy { case (id, sc) => (-sc, id) }.take(10)
    val got = run("j42_bm25").collect()
      .map(r => (r.getAs[Long]("doc_id"), r.getAs[Double]("score")))
    assert(got.length == math.min(10, expected.length))
    got.zip(expected).foreach { case ((gid, gsc), (eid, esc)) =>
      assert(gid == eid, s"rank order: got doc $gid, expected $eid")
      assert(math.abs(gsc - esc) < 1e-4, s"doc $gid: $gsc vs $esc")
    }
  }

  test("j42 BM25 ranks the saturating property correctly on a planted corpus") {
    // one doc stuffed with a rare query term must outrank docs with a
    // common one (idf), and tf saturates: 50 occurrences don't score 50x
    import spark.implicits._
    val dir = graft.ops.Scratch.dir("bm25")
    val filler = (0 until 50).map(i => s"f$i").mkString(" ")
    val docs = Seq(
      (0L, s"join $filler"),                                  // rare term, tf=1
      (1L, (0 until 50).map(_ => "table").mkString(" ") + " " + filler), // common term, tf=50
      (2L, s"table $filler"),                                 // common term, tf=1
      (3L, filler))                                           // no query terms
    // make 'table' common: 30 more docs containing it once
    val common = (10L until 40L).map(i => (i, s"table doc$i $filler"))
    (docs ++ common).toDF("doc_id", "text")
      .withColumn("lang", lit("en")).withColumn("source", lit("fx"))
      .withColumn("n_chars", length(col("text")).cast("long"))
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val out = SparkEntry.queries("j42_bm25")(spark, dir).collect()
      .map(r => (r.getAs[Long]("doc_id"), r.getAs[Double]("score"))).toMap
    assert(!out.contains(3L), "doc with no query terms must not appear")
    assert(out(0L) > out(2L), "rare-term doc must outrank common-term doc (idf)")
    // tf saturation: 50x tf gives < 3x the tf=1 score with k1=1.2
    assert(out(1L) < 3.0 * out(2L),
      s"tf must saturate: tf=50 ${out(1L)} vs tf=1 ${out(2L)}")
    assert(out(1L) > out(2L), "more matches still rank higher")
  }
}
