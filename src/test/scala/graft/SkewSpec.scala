package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.ops.Skew

/** Salting must change the shuffle layout, not the answer. */
class SkewSpec extends AnyFunSuite {
  lazy val spark: org.apache.spark.sql.SparkSession = TestSpark.spark

  test("saltedAggregate equals the direct aggregation") {
    val l = Tables.t(spark, TestSpark.sf, "lineitem")
    val direct = l.groupBy(col("l_returnflag").as("__k"))
      .agg(sum(Tables.dec(col("l_quantity"))).as("q"), count(lit(1)).as("n"))
      .collect().map(r => (r.getString(0), r.getDecimal(1), r.getLong(2))).toSet
    val salted = Skew.saltedAggregate(
      l, col("l_returnflag"), col("l_orderkey"), 8,
      partials = Seq(sum(Tables.dec(col("l_quantity"))).as("q1"), count(lit(1)).as("n1")),
      finals = Seq(sum(col("q1")).as("q"), sum(col("n1")).as("n")))
      .collect().map(r => (r.getString(0), r.getDecimal(1), r.getLong(2))).toSet
    assert(salted == direct)
  }

  test("saltedJoin equals the direct join") {
    val o = Tables.t(spark, TestSpark.sf, "orders")
    val c = Tables.t(spark, TestSpark.sf, "customer").select("c_custkey", "c_name")
    val direct = o.join(c, o("o_custkey") === c("c_custkey"))
      .select("o_orderkey", "c_name")
      .collect().map(r => (r.getLong(0), r.getString(1))).sorted.toSeq
    val salted = Skew.saltedJoin(o, c, "o_custkey", "c_custkey",
        saltSource = o("o_orderkey"), n = 4)
      .select("o_orderkey", "c_name")
      .collect().map(r => (r.getLong(0), r.getString(1))).sorted.toSeq
    assert(salted == direct)
    // and the salt actually spread the key-space: (key, salt) groups > keys
    val spread = o.withColumn("__s", Skew.salt(o("o_orderkey"), 4))
      .groupBy("o_custkey", "__s").count().count()
    val keys = o.select("o_custkey").distinct().count()
    assert(spread > keys)
  }
}
