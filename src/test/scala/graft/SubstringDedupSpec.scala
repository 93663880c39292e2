package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** j56 exact-substring dedup semantics on a hand-computable fixture: the
  * canonical FIRST occurrence (min (doc_id, pos)) of every repeated
  * 8-gram survives, every other occurrence's positions are removed, and
  * untouched text passes through verbatim. The corpus-statistical path
  * is oracle-hash-checked at sf0.01/sf0.001; this pins the SEMANTICS. */
class SubstringDedupSpec extends AnyFunSuite {
  lazy val spark: org.apache.spark.sql.SparkSession = TestSpark.spark

  private lazy val dir: String = {
    val d = graft.ops.Scratch.dir("ssdedup")
    import spark.implicits._
    Seq(
      (0L, "a b c d e f g h i j"),        // canonical copy
      (1L, "a b c d e f g h i j"),        // exact dup → fully removed
      (2L, "x x x x x x x x q r s t u v w z"), // self-repeated 8-gram? no: "x x x x x x x x" occurs once
      (3L, "p q r a b c d e f g h i j k") // embeds doc 0's grams at pos 4..6
    ).toDF("doc_id", "text")
      .withColumn("lang", lit("en")).withColumn("source", lit("fix"))
      .withColumn("n_chars", length(col("text")).cast("long"))
      .coalesce(1).write.mode("overwrite").parquet(s"$d/documents.parquet")
    d
  }

  test("keep-first: canonical occurrence survives, later spans are removed") {
    val rows = SparkEntry.queries("j56_substring_dedup")(spark, dir)
      .collect().map(r => r.getLong(0) ->
        (r.getLong(1), r.getLong(2), r.getString(3))).toMap
    assert(rows(0L) == ((10L, 0L, "a b c d e f g h i j"))) // canonical: untouched
    assert(rows(1L) == ((10L, 10L, "")))                   // dup: fully covered
    assert(rows(2L)._2 == 0L)                              // unique text untouched
    // doc 3: grams at pos 4/5/6 repeat doc 0's → covered 4..13, keeps
    // the unshared head (p q r) and tail (k)
    assert(rows(3L) == ((14L, 10L, "p q r k")))
  }

  test("fuzz vs driver-side brute force (intra-doc repeats exercised)") {
    // tiny vocabulary + short docs → dense gram collisions, including
    // REPEATS WITHIN one document (the fixture above only has cross-doc
    // dups); canonical keep must then be the earliest POSITION of the
    // earliest doc
    val k = 8
    def brute(docs: Seq[(Long, String)]): Map[Long, (Long, Long, String)] = {
      val occ = for {
        (id, text) <- docs
        toks = text.split(" ", -1).toSeq
        p <- 1 to toks.length - k + 1
      } yield (toks.slice(p - 1, p - 1 + k).mkString(" "), id, p)
      val covered = scala.collection.mutable.Set.empty[(Long, Int)]
      occ.groupBy(_._1).values.foreach { os =>
        if (os.size >= 2)
          os.sortBy(o => (o._2, o._3)).drop(1).foreach { case (_, id, p) =>
            (p until p + k).foreach(cp => covered += ((id, cp)))
          }
      }
      docs.map { case (id, text) =>
        val toks = text.split(" ", -1).toSeq
        val kept = toks.zipWithIndex.collect {
          case (t, i) if !covered((id, i + 1)) => t
        }
        id -> ((toks.length.toLong, (toks.length - kept.length).toLong,
          kept.mkString(" ")))
      }.toMap
    }
    val vocab = Vector("a", "b", "c", "d")
    val rnd = new scala.util.Random(20260814L)
    (1 to 6).foreach { iter =>
      val docs = (0L until 12L).map { id =>
        val n = 10 + rnd.nextInt(15)
        (id, (0 until n).map(_ => vocab(rnd.nextInt(vocab.size))).mkString(" "))
      }
      val d = graft.ops.Scratch.dir(s"ssfuzz$iter")
      import spark.implicits._
      import org.apache.spark.sql.functions._
      docs.toDF("doc_id", "text")
        .withColumn("lang", lit("en")).withColumn("source", lit("fz"))
        .withColumn("n_chars", length(col("text")).cast("long"))
        .coalesce(1).write.mode("overwrite").parquet(s"$d/documents.parquet")
      val got = SparkEntry.queries("j56_substring_dedup")(spark, d)
        .collect().map(r => r.getLong(0) ->
          ((r.getLong(1), r.getLong(2), r.getString(3)))).toMap
      val want = brute(docs)
      assert(got == want, s"iter $iter mismatch:\n got=$got\nwant=$want")
    }
  }
}
