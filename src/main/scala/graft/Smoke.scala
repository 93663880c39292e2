package graft

import org.apache.spark.sql.SparkSession

/** t1-equivalent smoke: prints the flagship `SparkEntry.entry` row count
  * (driver checks rows > 0 on sf0.001). */
object Smoke {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val df = SparkEntry.entry(spark)
    df.show(20, truncate = false)
    println(s"ENTRY_ROWS=${df.count()}")

    // client-API smoke: the reference workflow, end to end
    // (create_engine → read_td_table → read_td_query → read_td_job → to_td)
    {
      import graft.api.td
      implicit val s: SparkSession = spark
      val engine = td.createEngine("presto:sf0.001", "/root/testdata")
      val scan = td.readTdTable("orders", engine,
        columns = Seq("o_orderkey", "o_custkey", "o_orderdate"),
        timeRange = Some(("1996-01-01", "1998-01-01")),
        timeCol = "o_orderdate", limit = 100)
      println(s"API_SCAN_ROWS=${scan.count()}")
      val jobId = td.issueJob(
        "SELECT o_orderstatus, count(*) AS n FROM orders GROUP BY 1", engine)
      println(s"API_JOB_ROWS=${td.readTdJob(jobId).count()}")
      val wh = java.nio.file.Files.createTempDirectory("graft_smoke_wh").toString
      val con = td.connect(wh)
      td.toTd(scan, "smoke.orders100", con, td.IfExists.Replace,
        timeCol = Some("o_orderdate"))
      println(s"API_SINK_ROWS=${spark.read.parquet(s"$wh/smoke/orders100.parquet").count()}")
      println(s"API_TABLES=${con.tables("smoke").collect().mkString(",")}")

      // TD 1-hour-bucket storage model: partitioned write + pruned read
      val ev = graft.Tables.events(spark, "/root/testdata/sf0.001")
        .selectExpr("event_id", "user_id", "value",
          "timestamp_millis(ts_ms) AS ev_time")
      td.toTd(ev, "smoke.events_b", con, td.IfExists.Replace,
        timeCol = Some("ev_time"), partitionByTime = true)
      val pruned = td.readTdTable("events_b", engine.copy(database = "smoke", root = wh),
        timeRange = Some(("2024-01-05", "2024-01-06")), timeCol = "time")
      println(s"API_BUCKET_PRUNED_ROWS=${pruned.count()} of ${ev.count()}")
      println("API_BUCKET_PLAN_HAS_PARTITIONFILTER=" +
        pruned.queryExecution.executedPlan.toString.contains("PartitionFilters: [isnotnull(time_bucket"))
    }
    spark.stop()
  }
}
