package org.apache.spark.sql

import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan

/** Minimal private-API bridge: construct a DataFrame from a custom
  * LogicalPlan (`classic.Dataset.ofRows` is `private[sql]`). The standard
  * pattern for Spark extension libraries that add whole operators; the
  * only private surface touched in this project. */
object GraftSqlBridge {
  def ofRows(spark: SparkSession, plan: LogicalPlan): DataFrame =
    classic.Dataset.ofRows(spark.asInstanceOf[classic.SparkSession], plan)
}
