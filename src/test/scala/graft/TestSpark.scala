package graft

import org.apache.spark.sql.SparkSession

/** One shared session for every suite (single JVM under Test/fork). */
object TestSpark {
  lazy val spark: SparkSession = {
    val s = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    s
  }
  /** Root holding the driver-generated sf* fixture dirs — the single
    * source of truth; specs that need other scale factors derive from it
    * rather than hardcoding absolute paths. */
  val sfRoot: String = sys.env.getOrElse("SPARK_GRAFT_TESTDATA", "/root/testdata")
  val sf: String = s"$sfRoot/sf0.001"
}
