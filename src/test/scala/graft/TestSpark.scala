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
      // per-process warehouse: the suite now runs as PARALLEL forked JVM
      // groups (build.sbt testGrouping, r22 — the registry-wide sweeps
      // each get their own JVM), and the default cwd-relative
      // spark-warehouse would make c11's managed-table drop/overwrite a
      // cross-JVM race
      .config("spark.sql.warehouse.dir",
        java.nio.file.Files.createTempDirectory("graft_wh").toString)
      .getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    s
  }
  /** Root holding the driver-generated sf* fixture dirs — the single
    * source of truth; specs that need other scale factors derive from it
    * rather than hardcoding absolute paths. */
  val sfRoot: String = sys.env.getOrElse("SPARK_GRAFT_TESTDATA", "/root/testdata")
  val sf: String = s"$sfRoot/sf0.001"

  /** All FileSourceScanExec nodes of an EXECUTED plan, descending through
    * adaptive wrappers — for metrics-based pruning asserts (numFiles,
    * numOutputRows). The plan must have been executed via ITS OWN
    * QueryExecution (collect()/foreach on the same df; count() spawns a
    * fresh one whose metrics are the populated ones). */
  def fileScans(p: org.apache.spark.sql.execution.SparkPlan)
      : Seq[org.apache.spark.sql.execution.FileSourceScanExec] = p match {
    case a: org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec =>
      fileScans(a.executedPlan)
    case s: org.apache.spark.sql.execution.FileSourceScanExec => Seq(s)
    case other => other.children.flatMap(fileScans)
  }
}
