package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.catalyst.FunctionIdentifier
import graft.functions.Hive

class HiveDialectSpec extends AnyFunSuite {
  lazy val spark: org.apache.spark.sql.SparkSession = TestSpark.spark

  test("k13: verbatim TD-Hive text — LATERAL VIEW, get_json_object, TD UDFs") {
    val df = ops.Round15.all.find(_.key == "k13_hive_dialect").get
      .fn(spark, TestSpark.sf)
    val rows = df.collect()
    assert(rows.nonEmpty)
    // regex split semantics (the Presto-shim-must-NOT-apply pin):
    // split(s, '.') field count is len+1 under Hive/Spark regex split
    val r = rows.head
    // read the base table directly — k13 registers its view under a
    // per-invocation unique name and drops it on exit (no session leak)
    val eventType = Tables.events(spark, TestSpark.sf)
      .where(org.apache.spark.sql.functions.col("event_id") === r.getLong(0))
      .select("event_type").collect().head.getString(0)
    assert(r.getAs[Long]("regex_split_n") == eventType.length + 1,
      "hive text received Presto literal-split semantics")
    // LATERAL VIEW posexplode positions are dense from 0 per event
    val posByEvent = rows.groupBy(_.getLong(0))
      .view.mapValues(_.map(_.getAs[Long]("pos")).sorted.toSeq)
    assert(posByEvent.values.forall(ps => ps == (0L until ps.length)))
  }

  test("Hive.sql statement-scopes the TD UDF tier: names drop on exit, overrides restore") {
    // clean session: td_time_range resolves INSIDE the statement only
    val s1 = spark.newSession()
    val out = Hive.sql(s1,
      "SELECT td_time_format(1700000000, 'yyyy-MM-dd HH:mm', 'UTC') AS f")
      .collect().head.getString(0)
    assert(out == "2023-11-14 22:13")
    assert(!s1.sessionState.functionRegistry
      .functionExists(FunctionIdentifier("td_time_format")),
      "td_* names must not stay resident after a hive statement")
    // a user's own override of a td_* name is prior state the scope hands back
    val s2 = spark.newSession()
    s2.sessionState.functionRegistry.createOrReplaceTempFunction(
      "td_time_format",
      { _ => org.apache.spark.sql.catalyst.expressions.Literal("mine") },
      "scala_udf")
    val inScope = Hive.sql(s2,
      "SELECT td_time_format(0, 'yyyy', 'UTC') AS f").collect().head.getString(0)
    assert(inScope == "1970") // TD semantics inside the statement
    assert(s2.sql("SELECT td_time_format(0, 'yyyy', 'UTC') AS f")
      .collect().head.getString(0) == "mine") // override restored after
  }

  test("hive text pins NATIVE builtin semantics under a resident Presto dialect") {
    // a session that installed the Presto dialect permanently
    // (GraftExtensions route) still reads hive text with Hive semantics —
    // split is regex — and gets its resident dialect back on exit
    val s = spark.newSession()
    graft.functions.Presto.register(s)
    assert(s.sql("SELECT size(split('a.b', '.')) AS n")
      .collect().head.getInt(0) == 2) // resident Presto literal split
    val n = Hive.sql(s, "SELECT size(split('a.b', '.')) AS n")
      .collect().head.getInt(0)
    assert(n == 4, s"hive text must regex-split even under a resident dialect (got $n)")
    assert(s.sql("SELECT size(split('a.b', '.')) AS n")
      .collect().head.getInt(0) == 2, "resident Presto dialect not restored")
  }

  test("readTdQuery dispatches on engine type: hive text keeps regex split, no Presto shims") {
    implicit val s: org.apache.spark.sql.SparkSession = spark.newSession()
    val h = api.td.createEngine("hive:sf0.001", TestSpark.sfRoot)
    // Hive split is REGEX (like Spark): '.' matches every char → len+1
    // fields on 'abc'. Under a (buggy) Presto-shimmed route this is 1.
    val n = api.td.readTdQuery(
      "SELECT size(split('abc', '.')) AS n FROM region LIMIT 1", h)
      .collect().head.getInt(0)
    assert(n == 4, s"hive engine text was Presto-shimmed (got $n)")
    // and the TD UDFs resolve in the same statement, statement-scoped
    val d = api.td.readTdQuery(
      "SELECT td_date_trunc('day', 1700000000) AS d FROM region LIMIT 1", h)
      .collect().head.getLong(0)
    assert(d == 1699920000L)
    assert(!s.sessionState.functionRegistry
      .functionExists(FunctionIdentifier("td_date_trunc")))
    // presto engine on the same fresh session still applies its shims
    val p = api.td.createEngine("presto:sf0.001", TestSpark.sfRoot)
    val np = api.td.readTdQuery(
      "SELECT cardinality(split('a.b', '.')) AS n FROM region LIMIT 1", p)
      .collect().head.getLong(0)
    assert(np == 2L) // literal split under Presto semantics
  }
}
