package graft

import org.apache.spark.sql.SparkSession

/** Dev utility: print the physical plan of one registry query.
  * Usage: runMain graft.PlanDump <key> [sfDir] */
object PlanDump {
  def main(args: Array[String]): Unit = {
    val key = args.headOption.getOrElse("d1_agg_groupby")
    val sf = if (args.length > 1) args(1) else "/root/testdata/sf0.001"
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val df = SparkEntry.queries(key)(spark, sf)
    println("==== sparkPlan ====")
    println(df.queryExecution.sparkPlan.toString)
    spark.stop()
  }
}
