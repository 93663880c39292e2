package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The events-side sibling of the short-doc / zero-embedding sweeps:
  * production event streams carry DUPLICATE timestamps (batch ingests
  * stamp whole files with one ts — the interpolation/rate denominator
  * class), single-event users (no predecessor for lag/gap math), NULL
  * values, and malformed props JSON. Every events-reading registry key
  * must build and execute over a corpus dominated by those shapes
  * without throwing (ANSI mode turns a 0 time-delta denominator into a
  * SparkArithmeticException, the class EmbeddingGuardSpec caught on
  * the vector side). */
class EventsGuardSpec extends AnyFunSuite {
  lazy val spark: org.apache.spark.sql.SparkSession = TestSpark.spark

  test("every events-reading registry key survives a degenerate stream") {
    val dir = java.nio.file.Files.createTempDirectory("graft_degev").toString
    for (tbl <- Seq("region", "nation", "customer", "supplier", "part",
        "orders", "lineitem", "documents", "embeddings")) {
      java.nio.file.Files.createSymbolicLink(
        java.nio.file.Paths.get(dir, s"$tbl.parquet"),
        java.nio.file.Paths.get(TestSpark.sf, s"$tbl.parquet"))
    }
    val base = 1704067200000L // 2024-01-01T00:00Z, the fixture epoch
    // (event_id, ms, user, type, value, props)
    val rows: Seq[(Long, Long, Long, String, java.lang.Double, String)] = Seq(
      // user 1: FIVE events on one identical timestamp (0 deltas
      // everywhere: gap math, rates, interpolation slopes)
      (0L, base, 1L, "view", 1.0, """{"k": 1}"""),
      (1L, base, 1L, "view", 2.0, """{"k": 2}"""),
      (2L, base, 1L, "purchase", 3.0, """{"k": 3}"""),
      (3L, base, 1L, "signup", null, """{"k": 4}"""),
      (4L, base, 1L, "error", 5.0, """{"k": 5}"""),
      // user 2: a single lonely event (no lag/lead neighbor at all)
      (5L, base + 3600000L, 2L, "signup", 10.0, """{"k": 6}"""),
      // user 3: normal spread but NULL value, NULL type, broken props
      (6L, base + 60000L, 3L, "view", null, null),
      (7L, base + 120000L, 3L, null, 7.5, "{"),
      (8L, base + 180000L, 3L, "purchase", 8.5, ""),
      (9L, base + 240000L, 3L, "view", 9.5, """{"k": "notanint"}"""),
      // user 4: two events one millisecond apart (smallest nonzero gap)
      (10L, base + 500L, 4L, "view", 1.5, """{"k": 9}"""),
      (11L, base + 501L, 4L, "purchase", 2.5, """{"k": 10}"""))
    import spark.implicits._
    rows.toDF("event_id", "ms", "user_id", "event_type", "value", "props")
      .select(col("event_id"),
        expr("cast(timestamp_millis(ms) as timestamp_ntz)").as("ts"),
        col("user_id"), col("event_type"), col("value"), col("props"))
      .coalesce(1).write.parquet(s"$dir/events.parquet")

    val failures = scala.collection.mutable.ArrayBuffer[String]()
    var executed = 0
    SparkEntry.registry.foreach { q =>
      try {
        val built = q.fn(spark, dir)
        val readsEvents = built.queryExecution.analyzed.collectLeaves().exists {
          case l: org.apache.spark.sql.execution.datasources.LogicalRelation =>
            l.relation match {
              case fs: org.apache.spark.sql.execution.datasources.HadoopFsRelation =>
                fs.location.rootPaths.exists(_.toString.contains("degev")) &&
                  fs.location.rootPaths.exists(_.toString.contains("events"))
              case _ => false
            }
          case _ => false
        }
        if (readsEvents) { built.collect(); executed += 1 }
      } catch {
        case e: Throwable =>
          failures += s"${q.key}: ${e.getClass.getSimpleName} ${String.valueOf(e.getMessage).take(200)}"
      }
    }
    spark.catalog.clearCache()
    spark.sparkContext.getPersistentRDDs.values
      .foreach(_.unpersist(blocking = false))
    assert(failures.isEmpty,
      s"\ndegenerate events broke:\n  ${failures.mkString("\n  ")}")
    assert(executed >= 30, s"only $executed events-reading keys executed")
  }
}
