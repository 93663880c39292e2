package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}

/** One graded operator: a `SparkEntry.queries` entry plus (when
  * DuckDB-expressible) its oracle SQL over the same parquet tables.
  * Oracle SQL references tables by bare name (driver registers views).
  */
final case class Q(
    key: String,
    fn: (SparkSession, String) => DataFrame,
    oracle: Option[String] = None)

/** Per-invocation UNIQUE temp-view registration for SQL-text keys: a
  * fixed view name is shared-session state, and two concurrent
  * invocations of the same key at different SF dirs (the Verify dual-SF
  * regime) race between `createOrReplaceTempView` and `sql` — worse for
  * keys registering BARE table names (`orders`), which also collide with
  * the client API's registerTables views. `unique` suffixes each base
  * name with a UUID, hands the substitution map to `body`, and drops the
  * views right after: `s.sql` analysis is EAGER, so the returned
  * DataFrame has already resolved the views into its plan and nothing
  * leaks into the session catalog. */
object Views {
  def unique(s: SparkSession, views: (String, DataFrame)*)(
      body: Map[String, String] => DataFrame): DataFrame = {
    val names = views.map { case (base, df) =>
      val n = base + "_" + java.util.UUID.randomUUID().toString.replace("-", "")
      df.createOrReplaceTempView(n)
      base -> n
    }.toMap
    try body(names) finally names.values.foreach(s.catalog.dropTempView(_))
  }
}
