package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.types.{DoubleType, StringType, TimestampType}
import graft.functions.Presto

/** Presto-dialect alias layer (functions/Presto.scala): the reference's
  * main path is VERBATIM Presto SQL passthrough, so these pin the exact
  * dialect traps a migrating user hits — arg-order (strpos), return-type
  * (from_unixtime), day-numbering (day_of_week ISO vs Spark's Sunday=1),
  * MySQL %-codes, and the parser-intercepted quoted-unit date_diff. */
class PrestoSpec extends AnyFunSuite {
  lazy val spark: org.apache.spark.sql.SparkSession = TestSpark.spark

  private def one(sqlText: String): org.apache.spark.sql.Row = {
    Presto.sql(spark, sqlText).collect().head
  }

  test("mysqlToJavaPattern translates the TD-template codes") {
    assert(Presto.mysqlToJavaPattern("%Y-%m-%d") == "yyyy-MM-dd")
    assert(Presto.mysqlToJavaPattern("%Y-%m-%d %H:%i:%s") == "yyyy-MM-dd HH:mm:ss")
    assert(Presto.mysqlToJavaPattern("%H:%i") == "HH:mm")
    // literal letters must be quoted for Java patterns; %% is a literal %
    assert(Presto.mysqlToJavaPattern("%Yyr") == "yyyy'yr'")
    assert(Presto.mysqlToJavaPattern("%d%%") == "dd%")
    intercept[IllegalArgumentException](Presto.mysqlToJavaPattern("%Q"))
  }

  test("rewrite unquotes units only for the parser-intercepted family") {
    assert(Presto.rewrite("date_diff('day', a, b)") == "date_diff(day, a, b)")
    assert(Presto.rewrite("DATE_ADD('hour', 3, t)") == "DATE_ADD(hour, 3, t)")
    // date_trunc takes a string unit in Spark — untouched
    assert(Presto.rewrite("date_trunc('day', t)") == "date_trunc('day', t)")
    // non-unit first args untouched
    val s = "strpos('day, x', y)"
    assert(Presto.rewrite(s) == s)
  }

  test("strpos uses Presto (string, substring) order, 1-based, 0=missing") {
    val r = one("SELECT strpos('hello', 'll') AS a, strpos('hello', 'z') AS b")
    assert(r.getInt(0) == 3 && r.getInt(1) == 0)
  }

  test("from_unixtime returns TIMESTAMP (1-arg) but keeps Spark's 2-arg string") {
    val df = Presto.sql(spark,
      "SELECT from_unixtime(1700000000) AS ts, " +
        "from_unixtime(1700000000, 'yyyy-MM-dd') AS s")
    assert(df.schema("ts").dataType == TimestampType)
    assert(df.schema("s").dataType == StringType)
    val r = df.collect().head
    assert(r.getTimestamp(0).toInstant.getEpochSecond == 1700000000L)
    assert(r.getString(1) == "2023-11-14")
  }

  test("to_unixtime is double epoch seconds") {
    val df = Presto.sql(spark,
      "SELECT to_unixtime(TIMESTAMP '2023-11-14 22:13:20') AS u")
    assert(df.schema("u").dataType == DoubleType)
    assert(df.collect().head.getDouble(0) == 1.7e9)
  }

  test("day_of_week is ISO (Mon=1..Sun=7), not Spark's Sun=1 numbering") {
    // 2024-03-15 is a Friday: ISO 5; Spark's dayofweek says 6.
    val r = one("SELECT day_of_week(DATE '2024-03-15') AS iso, " +
      "dayofweek(DATE '2024-03-15') AS spark_n, dow(DATE '2024-03-18') AS mon")
    assert(r.getInt(0) == 5 && r.getInt(1) == 6 && r.getInt(2) == 1)
  }

  test("date_diff quoted-unit and date_add quoted-unit parse and compute") {
    val r = one("SELECT date_diff('day', DATE '2024-01-01', DATE '2024-03-01') AS d, " +
      "date_add('hour', 25, TIMESTAMP '2024-01-01 00:00:00') AS t")
    assert(r.getLong(0) == 60L)
    assert(r.getTimestamp(1).toString.startsWith("2024-01-02 01:00:00"))
  }

  test("json_extract_scalar walks JsonPath; approx_distinct exact on tiny domains") {
    val r = one("""SELECT json_extract_scalar('{"k": 42, "s": "x"}', '$.k') AS k,
      json_extract('{"a": {"b": 7}}', '$.a') AS obj""")
    assert(r.getString(0) == "42" && r.getString(1) == """{"b":7}""")
    spark.range(0, 10000).createOrReplaceTempView("presto_n")
    val nd = one("SELECT approx_distinct(id % 8) AS nd FROM presto_n")
    assert(nd.getLong(0) == 8L)
  }

  test("date_parse/date_format round-trip MySQL codes; hex and bitwise alias") {
    val r = one("""SELECT date_format(date_parse('2024-03-15 06:30:00',
        '%Y-%m-%d %H:%i:%s'), '%Y/%m/%d %H:%i') AS f,
      lower(to_hex(255)) AS h, from_hex('0a') AS b,
      bitwise_and(12, 10) AS ba, bitwise_or(12, 10) AS bo, bitwise_xor(12, 10) AS bx""")
    assert(r.getString(0) == "2024/03/15 06:30")
    assert(r.getString(1) == "ff")
    assert(r.getAs[Array[Byte]]("b").sameElements(Array[Byte](10)))
    assert(r.getInt(3) == 8 && r.getInt(4) == 14 && r.getInt(5) == 6)
  }

  test("arbitrary picks a non-null group value") {
    spark.sql("SELECT * FROM VALUES (1, CAST(NULL AS STRING)), (1, 'x'), (1, 'x') t(g, v)")
      .createOrReplaceTempView("presto_arb")
    val r = one("SELECT arbitrary(v) AS v FROM presto_arb GROUP BY g")
    assert(r.getString(0) == "x")
  }

  test("url_extract_* family parses every component; parameter takes a key") {
    val u = "'https://h2.example.com/p/click?k=7&u=42#frag'"
    val r = one(s"""SELECT url_extract_protocol($u) AS pr,
      url_extract_host($u) AS h, url_extract_path($u) AS p,
      url_extract_query($u) AS q, url_extract_fragment($u) AS f,
      url_extract_parameter($u, 'u') AS pu""")
    assert(r.getString(0) == "https" && r.getString(1) == "h2.example.com")
    assert(r.getString(2) == "/p/click" && r.getString(3) == "k=7&u=42")
    assert(r.getString(4) == "frag" && r.getString(5) == "42")
  }

  test("split_to_map, index, codepoint, to_base/from_base, truncate") {
    val r = one("""SELECT element_at(split_to_map('a=1,b=2', ',', '='), 'b') AS b,
      index('hello', 'll') AS i, codepoint('A') AS cp,
      to_base(255, 16) AS b16, from_base('ff', 16) AS v16,
      truncate(3.7) AS tp, truncate(-3.7) AS tn""")
    assert(r.getString(0) == "2" && r.getInt(1) == 3 && r.getInt(2) == 65)
    assert(r.getString(3) == "ff" && r.getLong(4) == 255L)
    assert(r.getDouble(5) == 3.0 && r.getDouble(6) == -3.0)
  }

  test("format_datetime/parse_datetime, last_day_of_month, utf8 round-trip") {
    val r = one("""SELECT format_datetime(parse_datetime('2024-02-11 09:30:00',
        'yyyy-MM-dd HH:mm:ss'), 'yyyy/MM/dd') AS f,
      last_day_of_month(DATE '2024-02-10') AS ld,
      from_utf8(to_utf8('héllo')) AS rt, lower(to_hex(to_utf8('A'))) AS hx""")
    assert(r.getString(0) == "2024/02/11")
    assert(r.getDate(1).toString == "2024-02-29")
    assert(r.getString(2) == "héllo" && r.getString(3) == "41")
  }

  test("IEEE specials: nan/infinity literals and the is_* predicates") {
    val r = one("""SELECT is_nan(nan()) AS a, is_nan(1.0) AS b,
      is_finite(1.5) AS c, is_finite(infinity()) AS d,
      is_infinite(infinity()) AS e, is_infinite(2.0) AS f""")
    assert(r.getBoolean(0) && !r.getBoolean(1))
    assert(r.getBoolean(2) && !r.getBoolean(3))
    assert(r.getBoolean(4) && !r.getBoolean(5))
  }

  test("any_match/all_match/none_match route lambdas to exists/forall") {
    val r = one("""SELECT any_match(array(1, 2, 3), x -> x > 2) AS a,
      any_match(array(1, 2), x -> x > 5) AS b,
      all_match(array(2, 4), x -> x % 2 = 0) AS c,
      all_match(array(2, 3), x -> x % 2 = 0) AS d,
      none_match(array(1, 2), x -> x > 5) AS e""")
    assert(r.getBoolean(0) && !r.getBoolean(1))
    assert(r.getBoolean(2) && !r.getBoolean(3))
    assert(r.getBoolean(4))
  }

  test("map_agg/multimap_agg/histogram build maps through one collect_list") {
    spark.sql("""SELECT * FROM VALUES (1, 'a', 10), (1, 'b', 20), (1, 'a', 30),
      (2, 'c', 40) t(g, k, v)""").createOrReplaceTempView("presto_map")
    val r = Presto.sql(spark, """SELECT g,
        sort_array(map_entries(histogram(k))) AS h,
        sort_array(transform(map_entries(multimap_agg(k, v)),
          e -> named_struct('key', e.key, 'value', sort_array(e.value)))) AS mm
      FROM presto_map GROUP BY g ORDER BY g""").collect()
    val h1 = r(0).getSeq[org.apache.spark.sql.Row](1)
    assert(h1.map(e => (e.getString(0), e.getLong(1))) == Seq("a" -> 2L, "b" -> 1L))
    val mm1 = r(0).getSeq[org.apache.spark.sql.Row](2)
    assert(mm1.map(e => (e.getString(0), e.getSeq[Int](1))) ==
      Seq("a" -> Seq(10, 30), "b" -> Seq(20)))
    // map_agg with unique keys per group
    val kv = Presto.sql(spark,
      """SELECT g, sort_array(map_entries(map_agg(k, v))) AS kv
        FROM (SELECT * FROM VALUES (1, 'x', 1), (1, 'y', 2) t(g, k, v))
        GROUP BY g""").collect().head.getSeq[org.apache.spark.sql.Row](1)
    assert(kv.map(e => (e.getString(0), e.getInt(1))) == Seq("x" -> 1, "y" -> 2))
  }
}
