package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.ops._

/** Driver contract — see /root/repo/SURVEY.md §1.1 + §3.
  *
  * Every implemented operator from SURVEY.md §3 contributes one `queries`
  * entry; DuckDB-expressible ones also contribute `oracleSql` (column names
  * aliased identically on both sides — the driver sorts columns by name
  * before hashing).
  */
object SparkEntry {

  /** Full operator inventory (also consumed by graft.Coverage). */
  def registry: Seq[Q] =
    Scans.all ++ Filters.all ++ Joins.all ++ Aggregates.all ++
      Windows.all ++ SetOps.all ++ Scalars.all ++ StreamingBatch.all ++
      LlmOps.all ++ Extras.all ++ Round2.all ++ Round5.all ++ Round5b.all ++
      Round6.all ++ Round8.all ++ Round9.all ++ Round13.all ++ Round15.all ++
      Round16.all ++ Round16b.all ++ Round16c.all ++ Round16d.all ++
      Round17.all ++ Round18.all ++ Round18b.all ++ Round18c.all ++
      Round18d.all ++ Round19.all ++ Round20.all

  /** Flagship query (TPC-H Q1 pricing summary) on sf0.001; driver
    * smoke-checks rows > 0. */
  def entry(spark: SparkSession): DataFrame =
    Aggregates.flagship(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §3. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    registry.map(q => q.key -> q.fn).toMap

  /** For each key in `queries`, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omitted for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] =
    registry.flatMap(q => q.oracle.map(o => q.key -> o)).toMap
}
