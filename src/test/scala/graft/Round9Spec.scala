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

  test("m4b features are pure arithmetic over the decoded dims") {
    val r = SparkEntry.queries("m4b_feature_image")(spark, TestSpark.sf)
      .where(col("doc_id") === 0L).collect().head
    assert(r.getLong(1) == 16L && r.getLong(2) == 16L)
    assert(r.getDouble(3) == 1.0) // aspect of the 16×16 doc-0 image
  }
}
