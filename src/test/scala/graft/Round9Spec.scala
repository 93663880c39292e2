package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

/** Round-9 keys: the real byte-level image decode (m2b/m4b). */
class Round9Spec extends AnyFunSuite {
  lazy val spark: org.apache.spark.sql.SparkSession = TestSpark.spark

  test("m2b parses actual PNG/JPEG header layouts, not fixture knowledge") {
    val out = SparkEntry.queries("m2b_decode_image")(spark, TestSpark.sf)
      .collect().map(r => r.getLong(0) -> r).toMap
    // even doc_id → PNG; width/height follow the derivation
    val p = out(0L)
    assert(p.getString(1) == "png" && p.getLong(2) == 16L && p.getLong(3) == 16L)
    val j = out(3L)
    assert(j.getString(1) == "jpeg" && j.getLong(2) == 19L && j.getLong(3) == 37L)
    // every row decodes: no unknowns on the well-formed corpus
    assert(out.values.forall(_.getString(1) != "unknown"))
  }

  test("m2b decoder dispatches on magic bytes — a junk payload is unknown") {
    // a payload that is neither PNG-signed nor SOI+SOF0 must fall through
    // with null dimensions (the decoder reads bytes, not doc parity)
    val junk = spark.sql(
      "SELECT 99L AS doc_id, CAST('not an image' AS BINARY) AS payload")
    val soiOnly = spark.sql( // JPEG SOI but no SOF0 frame at offset 3
      "SELECT 100L AS doc_id, unhex('FFD8FFE000104A464946') AS payload")
    val rows = graft.ops.Round9.decodeForTest(junk.union(soiOnly))
      .orderBy("doc_id").collect()
    assert(rows(0).getString(1) == "unknown" && rows(0).isNullAt(2))
    assert(rows(1).getString(1) == "unknown" && rows(1).isNullAt(2))
  }

  test("i17 catches a batch-2 dup of a BATCH-1 doc via the updated index") {
    // planted corpus (batch 1 = doc_id%4==1, batch 2 = %4==3, corpus =
    // even): docs 1 (batch 1) and 3 (batch 2) are exact dups; doc 3
    // shares nothing with the standing corpus. Without the per-batch
    // index commit the (3, 1) pair is structurally impossible — doc 1 is
    // odd, so it is never in the pre-stream corpus index. This is the
    // maintenance contract, end to end.
    val d = graft.ops.Scratch.dir("i17fix")
    import spark.implicits._
    def sentence(tag: String): String =
      (0 until 12).map(k => s"${tag}w$k").mkString(" ")
    Seq(
      (0L, sentence("corpusA")), (2L, sentence("corpusB")),
      (4L, sentence("corpusC")), (6L, sentence("corpusD")),
      (1L, sentence("dup")),  // batch 1
      (3L, sentence("dup")),  // batch 2 — dups batch 1's doc 1
      (5L, sentence("solo")), // batch 1, matches nothing
      (7L, sentence("corpusA"))) // batch 2 — dups corpus doc 0
      .toDF("doc_id", "text")
      .withColumn("lang", lit("en")).withColumn("source", lit("i17"))
      .withColumn("n_chars", length(col("text")).cast("long"))
      .coalesce(1).write.mode("overwrite").parquet(s"$d/documents.parquet")
    val pairs = graft.streaming.Streams.i17(spark, d)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pairs.contains((3L, 1L)),
      s"batch-2 doc 3 must match batch-1 doc 1 via the committed index, got $pairs")
    assert(pairs.contains((7L, 0L)), s"corpus probe must still work, got $pairs")
    assert(!pairs.exists(_._1 == 5L), s"doc 5 matches nothing, got $pairs")
    // batch-1 docs can only have matched the v0 corpus index
    assert(pairs.filter(_._1 == 1L).forall(_._2 % 2 == 0), s"got $pairs")
  }

  test("m4b features are pure arithmetic over the decoded dims") {
    val r = SparkEntry.queries("m4b_feature_image")(spark, TestSpark.sf)
      .where(col("doc_id") === 0L).collect().head
    assert(r.getLong(1) == 16L && r.getLong(2) == 16L)
    assert(r.getDouble(3) == 1.0) // aspect of the 16×16 doc-0 image
  }
}
