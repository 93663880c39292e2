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
      val dt = spark.read.parquet(s"${TestSpark.sfRoot}/$sf/events.parquet")
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

  test("all table schemas match FIXTURES.md (name -> Spark type, sf0.01 footers)") {
    // one pointed failure beats fifty cryptic ones: any regeneration that
    // changes a column name or type trips HERE first, naming the table.
    // Timestamp columns accept either tz flavor (the physical parquet
    // flag has flipped across generations); events.ts additionally
    // accepts LongType (the nanos generation).
    val expected = Map(
      "region" -> Seq("r_regionkey" -> IntegerType, "r_name" -> StringType),
      "nation" -> Seq("n_nationkey" -> IntegerType, "n_name" -> StringType,
        "n_regionkey" -> IntegerType),
      "supplier" -> Seq("s_suppkey" -> LongType, "s_name" -> StringType,
        "s_nationkey" -> IntegerType, "s_acctbal" -> DoubleType),
      "customer" -> Seq("c_custkey" -> LongType, "c_name" -> StringType,
        "c_nationkey" -> IntegerType, "c_acctbal" -> DoubleType,
        "c_mktsegment" -> StringType),
      "part" -> Seq("p_partkey" -> LongType, "p_name" -> StringType,
        "p_brand" -> StringType, "p_type" -> StringType,
        "p_size" -> IntegerType, "p_retailprice" -> DoubleType),
      "orders" -> Seq("o_orderkey" -> LongType, "o_custkey" -> LongType,
        "o_orderstatus" -> StringType, "o_totalprice" -> DoubleType,
        "o_orderdate" -> TimestampNTZType, "o_orderpriority" -> StringType),
      "lineitem" -> Seq("l_orderkey" -> LongType, "l_partkey" -> LongType,
        "l_suppkey" -> LongType, "l_linenumber" -> IntegerType,
        "l_quantity" -> DoubleType, "l_extendedprice" -> DoubleType,
        "l_discount" -> DoubleType, "l_tax" -> DoubleType,
        "l_returnflag" -> StringType, "l_linestatus" -> StringType,
        "l_shipdate" -> TimestampNTZType),
      "events" -> Seq("event_id" -> LongType, "ts" -> TimestampNTZType,
        "user_id" -> LongType, "event_type" -> StringType,
        "value" -> DoubleType, "props" -> StringType),
      "documents" -> Seq("doc_id" -> LongType, "text" -> StringType,
        "lang" -> StringType, "source" -> StringType, "n_chars" -> LongType),
      "embeddings" -> Seq("vec_id" -> LongType,
        "embedding" -> ArrayType(FloatType), "label" -> IntegerType))
    def tsLike(dt: DataType) = dt == TimestampType || dt.isInstanceOf[TimestampNTZType]
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    for ((table, cols) <- expected) {
      val schema = spark.read.parquet(s"${TestSpark.sfRoot}/sf0.01/$table.parquet").schema
      assert(schema.fieldNames.toSeq == cols.map(_._1),
        s"$table columns drifted — driver regenerated testdata; update " +
          s"FIXTURES.md and the consumers. got ${schema.fieldNames.toSeq}")
      for ((name, want) <- cols) {
        val got = schema(name).dataType
        val okTs = tsLike(want) && (tsLike(got) ||
          (table == "events" && name == "ts" && got == LongType))
        val okArr = (want, got) match {
          case (ArrayType(FloatType, _), ArrayType(FloatType, _)) => true
          case _ => false
        }
        assert(got == want || okTs || okArr,
          s"$table.$name type drifted: expected $want-compatible, got $got — " +
            "extend the central loader dispatch before touching queries")
      }
    }
  }

  test("row counts match FIXTURES.md at every SF") {
    val expected = Map(
      ("sf0.001", "events") -> 1000L, ("sf0.01", "events") -> 10000L,
      ("sf0.1", "events") -> 100000L, ("sf0.001", "lineitem") -> 6000L,
      ("sf0.01", "lineitem") -> 60000L, ("sf0.1", "lineitem") -> 600000L)
    for (((sf, table), n) <- expected) {
      val got = spark.read.parquet(s"${TestSpark.sfRoot}/$sf/$table.parquet").count()
      assert(got == n, s"$table at $sf: expected $n rows, got $got — " +
        "driver regenerated testdata at a different scale")
    }
  }
}
