package graft

import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

/** Tripwire for driver testdata regeneration (VERDICT r11 item 7): the
  * fixtures' physical types are NOT stable across rounds — events.ts has
  * shipped as parquet TIMESTAMP(NANOS) (LongType under nanosAsLong) and
  * as timestamp[us] (TIMESTAMP_NTZ). If this spec fails, the driver
  * regenerated the parquet with a type this repo has never seen: extend
  * the dispatch in Tables.events + Td.tdTimeRangeEvents FIRST, before
  * debugging individual queries.
  */
class FixtureSchemaSpec extends AnyFunSuite {
  lazy val spark: org.apache.spark.sql.SparkSession = TestSpark.spark

  test("events.ts physical type is a known generation (footer check)") {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    for (sf <- Seq("sf0.001", "sf0.01", "sf0.1")) {
      val dt = spark.read.parquet(s"/root/testdata/$sf/events.parquet")
        .schema("ts").dataType
      assert(dt == LongType || dt == TimestampType || dt.isInstanceOf[TimestampNTZType],
        s"UNKNOWN events.ts type $dt at $sf — driver regenerated testdata " +
          "with a new physical type; extend Tables.events / Td.tdTimeRangeEvents")
    }
  }

  test("Tables.events derives ts_ms in the documented epoch-millis range") {
    // catches wrong-magnitude derivations (ns-as-µs, µs-as-ns: 1000× off)
    // regardless of which physical generation is on disk
    val mm = Tables.events(spark, TestSpark.sf)
      .agg(org.apache.spark.sql.functions.min("ts_ms"),
        org.apache.spark.sql.functions.max("ts_ms")).head()
    val (lo, hi) = (1704067200000L, 1706745600000L) // [2024-01-01, 2024-02-01)
    assert(mm.getLong(0) >= lo && mm.getLong(1) <= hi,
      s"ts_ms out of documented range: ${mm.getLong(0)}..${mm.getLong(1)} " +
        "(FIXTURES.md events domain) — check the Tables.events dispatch")
  }

  test("row counts match FIXTURES.md at every SF") {
    val expected = Map(
      ("sf0.001", "events") -> 1000L, ("sf0.01", "events") -> 10000L,
      ("sf0.1", "events") -> 100000L, ("sf0.001", "lineitem") -> 6000L,
      ("sf0.01", "lineitem") -> 60000L, ("sf0.1", "lineitem") -> 600000L)
    for (((sf, table), n) <- expected) {
      val got = spark.read.parquet(s"/root/testdata/$sf/$table.parquet").count()
      assert(got == n, s"$table at $sf: expected $n rows, got $got — " +
        "driver regenerated testdata at a different scale")
    }
  }
}
