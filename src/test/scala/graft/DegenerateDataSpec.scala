package graft

import org.scalatest.funsuite.AnyFunSuite

/** Registry-wide degenerate-data harness (r18 verdict item 5): the three
  * targeted sweeps (short-doc, zero-embedding, degenerate-events) found
  * 16 real defects by feeding hostile fixtures to the keys reading ONE
  * table each. This generalizes the pattern to the whole input surface
  * at once: every registry key runs over (a) an ALL-EMPTY variant of the
  * ten fixture tables and (b) a SINGLE-ROW variant — the two shapes a
  * production job actually meets at the edges (a brand-new partition, a
  * nearly-dead source, a filter that eliminated everything upstream).
  *
  * Empty input exercises a class the per-table sweeps cannot: aggregates
  * that feed divisions (0-row totals), limit(1) carriers that vanish,
  * windows over nothing, min/max that go NULL. Single-row input
  * exercises the no-neighbor class globally (self-joins, lag/lead,
  * pair enumeration) — including j108's wedges=0 clustering guard,
  * whose 12-vector embedding sweep fixture could not reach it.
  *
  * Both variants are derived from the REAL sf0.001 fixtures by
  * truncation, so schemas (including the events.ts physical-type
  * dispatch in Tables.events) stay exactly what the engine sees in
  * production. Keys only have to not THROW; emptiness of results is
  * legitimate.
  */
class DegenerateDataSpec extends AnyFunSuite {
  lazy val spark: org.apache.spark.sql.SparkSession = TestSpark.spark

  private def buildVariant(tag: String, n: Int): String = {
    val dir = java.nio.file.Files.createTempDirectory(s"graft_degen$tag").toString
    // same reader posture as Tables.events: a legacy TIMESTAMP(NANOS)
    // events fixture reads as epoch-nanos LONG and round-trips as such
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    for (tbl <- Tables.names) {
      spark.read.parquet(s"${TestSpark.sf}/$tbl.parquet")
        .limit(n).coalesce(1).write.parquet(s"$dir/$tbl.parquet")
    }
    dir
  }

  private def sweep(dir: String, tag: String): Unit = {
    val failures = scala.collection.mutable.ArrayBuffer[String]()
    var executed = 0
    SparkEntry.registry.foreach { q =>
      try {
        q.fn(spark, dir).collect()
        executed += 1
      } catch {
        case e: Throwable =>
          failures += s"${q.key}: ${e.getClass.getSimpleName} " +
            String.valueOf(e.getMessage).replace('\n', ' ').take(180)
      }
      // the sweep runs 418 keys back to back: persisted intermediates and
      // localCheckpoints from one key must not accumulate into the next
      if (executed % 64 == 0) {
        spark.catalog.clearCache()
        spark.sparkContext.getPersistentRDDs.values
          .foreach(_.unpersist(blocking = false))
      }
    }
    spark.catalog.clearCache()
    spark.sparkContext.getPersistentRDDs.values
      .foreach(_.unpersist(blocking = false))
    assert(failures.isEmpty,
      s"\n$tag-table sweep broke ${failures.size} key(s):\n  " +
        failures.mkString("\n  "))
    assert(executed == SparkEntry.registry.size,
      s"$tag sweep executed $executed of ${SparkEntry.registry.size}")
  }

  test("every registry key survives ALL-EMPTY input tables") {
    sweep(buildVariant("empty", 0), "empty")
  }

  test("every registry key survives SINGLE-ROW input tables") {
    sweep(buildVariant("single", 1), "single-row")
  }

  // the remaining hostile class after empty/single-row: NULLs in the
  // nullable text-pipeline columns. EventsGuardSpec already nulls the
  // events side (value/type/props); this variant nulls documents.text/
  // lang/source on interleaved strides (so every key sees null AND
  // non-null rows in one relation) — the shape a production corpus has
  // after a failed extraction stage. Keys only have to not THROW;
  // null rows legitimately drop out of token pipelines.
  test("every registry key survives NULL-riddled documents columns") {
    val dir = java.nio.file.Files.createTempDirectory("graft_degennull").toString
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    for (tbl <- Tables.names if tbl != "documents") {
      java.nio.file.Files.createSymbolicLink(
        java.nio.file.Paths.get(dir, s"$tbl.parquet"),
        java.nio.file.Paths.get(TestSpark.sf, s"$tbl.parquet"))
    }
    import org.apache.spark.sql.functions._
    spark.read.parquet(s"${TestSpark.sf}/documents.parquet")
      .select(col("doc_id"),
        when(col("doc_id") % 3 === 0, lit(null)).otherwise(col("text"))
          .as("text"),
        when(col("doc_id") % 5 === 0, lit(null)).otherwise(col("lang"))
          .as("lang"),
        when(col("doc_id") % 7 === 0, lit(null)).otherwise(col("source"))
          .as("source"),
        when(col("doc_id") % 3 === 0, lit(null))
          .otherwise(col("n_chars")).as("n_chars"))
      .coalesce(1).write.parquet(s"$dir/documents.parquet")
    sweep(dir, "null-documents")
  }
}
