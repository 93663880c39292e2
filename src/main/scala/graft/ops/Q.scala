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
