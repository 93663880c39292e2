package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** TD_TIME_STRING semantics (public TD UDF docs): unit truncation, '!'
  * leading-fields form, per-row zone offset incl. DST flips. */
class TdTimeStringSpec extends AnyFunSuite {
  lazy val spark: org.apache.spark.sql.SparkSession = TestSpark.spark
  import spark.implicits._
  import graft.functions.Td

  // 2024-01-15T12:34:56Z
  private val t0 = 1705322096L

  private def one(fmt: String, tz: String): String =
    Seq(t0).toDF("time")
      .select(Td.tdTimeString(col("time"), fmt, tz)).head().getString(0)

  test("! forms truncate to leading fields in the target zone") {
    assert(one("y!", "UTC") == "2024")
    assert(one("q!", "UTC") == "2024-01")
    assert(one("M!", "UTC") == "2024-01")
    assert(one("d!", "UTC") == "2024-01-15")
    assert(one("h!", "UTC") == "2024-01-15 12")
    assert(one("m!", "UTC") == "2024-01-15 12:34")
    assert(one("s!", "UTC") == "2024-01-15 12:34:56")
    // Tokyo: +9h -> 21:34:56 local
    assert(one("d!", "Asia/Tokyo") == "2024-01-15")
    assert(one("h!", "Asia/Tokyo") == "2024-01-15 21")
  }

  test("bare forms render full timestamp truncated to unit, with offset") {
    assert(one("d", "UTC") == "2024-01-15 00:00:00+0000")
    assert(one("s", "Asia/Tokyo") == "2024-01-15 21:34:56+0900")
    // negative offset
    assert(one("h", "America/New_York") == "2024-01-15 07:00:00-0500")
  }

  test("offset follows DST per row") {
    // 2024-07-15T12:00:00Z: New York is on EDT (-0400)
    val summer = 1721044800L
    val got = Seq(summer).toDF("time")
      .select(Td.tdTimeString(col("time"), "s", "America/New_York"))
      .head().getString(0)
    assert(got == "2024-07-15 08:00:00-0400")
  }

  test("SQL registration: td_time_string usable from spark.sql") {
    Td.register(spark)
    Seq(t0).toDF("time").createOrReplaceTempView("tts_sql")
    val r = spark.sql(
      "SELECT td_time_string(time, 'd!', 'Asia/Tokyo') AS d, " +
        "td_time_string(time, 'h') AS h FROM tts_sql").head()
    assert(r.getString(0) == "2024-01-15")
    assert(r.getString(1) == "2024-01-15 12:00:00+0000")
    intercept[Exception](spark.sql(
      "SELECT td_time_string(time, time) FROM tts_sql").collect())
  }

  test("output is independent of spark.sql.session.timeZone") {
    // the expansion goes NTZ + convert_timezone (zone-explicit) end to
    // end, so a non-UTC notebook session must render the same strings as
    // the harness's pinned UTC session — the old from_utc_timestamp +
    // date_format shape double-shifted here
    val cases = Seq(("s", "Asia/Tokyo"), ("h", "America/New_York"),
      ("d", "UTC"), ("d!", "Asia/Tokyo"), ("m!", "America/New_York"))
    val underUtc = cases.map { case (f, z) => one(f, z) }
    val prev = spark.conf.get("spark.sql.session.timeZone")
    try {
      for (sessionZone <- Seq("Asia/Tokyo", "America/New_York")) {
        spark.conf.set("spark.sql.session.timeZone", sessionZone)
        val got = cases.map { case (f, z) => one(f, z) }
        assert(got == underUtc,
          s"session zone $sessionZone changed output: $got vs $underUtc")
      }
    } finally spark.conf.set("spark.sql.session.timeZone", prev)
  }

  test("malformed format throws at construction") {
    intercept[IllegalArgumentException](Td.tdTimeString(lit(0L), "x!"))
    intercept[IllegalArgumentException](Td.tdTimeString(lit(0L), "dd"))
  }

  test("epoch-LONG and TIMESTAMP td_time_range arms agree on random data") {
    // the dual-generation invariant: the SAME instants filtered through
    // the LongType arm and the TIMESTAMP arm must select the same rows
    Td.register(spark)
    val rnd = new scala.util.Random(42)
    val base = 1704067200L
    val rows = (1 to 500).map(i =>
      (i.toLong, base + rnd.nextInt(30 * 86400).toLong))
    val df = rows.toDF("id", "time")
      .withColumn("ts", timestamp_seconds(col("time")))
    df.createOrReplaceTempView("ttr_agree")
    for ((from, to) <- Seq(("2024-01-03", "2024-01-11"),
        ("2024-01-10", "2024-01-10"), ("2024-01-01", "2024-02-01"))) {
      val viaLong = spark.sql(
        s"SELECT id FROM ttr_agree WHERE td_time_range(time, '$from', '$to')")
        .as[Long].collect().toSet
      val viaTs = spark.sql(
        s"SELECT id FROM ttr_agree WHERE td_time_range(ts, '$from', '$to')")
        .as[Long].collect().toSet
      assert(viaLong == viaTs, s"arms disagree for [$from,$to)")
    }
  }
}
