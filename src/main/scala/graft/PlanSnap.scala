package graft

import org.apache.spark.sql.SparkSession

/** Dev utility for the optimization rounds: write `.explain("formatted")`
  * output for the given registry keys to plans/<tag>/<key>_<suffix>.txt —
  * the judge-checkable before/after plan artifacts.
  * Usage: runMain graft.PlanSnap <tag> <suffix> <key> [key ...]
  * (SPARK_GRAFT_SF_DIR to set the data dir; defaults to sf0.1 so the
  * plans match what the bench executes.) */
object PlanSnap {
  def main(args: Array[String]): Unit = {
    require(args.length >= 3, "usage: PlanSnap <tag> <suffix> <key> [key ...]")
    val tag = args(0); val suffix = args(1); val keys = args.drop(2).toSeq
    val sf = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    // variant plans: SPARK_GRAFT_CONF="k=v;k=v" (MicroBench's convention)
    // lets a before-plan reproduce the pre-optimization shape via the
    // optimization knobs (e.g. spark.graft.scan.spread=false)
    sys.env.get("SPARK_GRAFT_CONF").foreach(_.split(';').foreach { kv =>
      kv.split("=", 2) match {
        case Array(k, v) if k.trim.nonEmpty => spark.conf.set(k.trim, v.trim)
        case _ => ()
      }
    })
    val outDir = Bench.repoRoot.resolve("plans").resolve(tag)
    java.nio.file.Files.createDirectories(outDir)
    keys.foreach { k =>
      val df = SparkEntry.queries(k)(spark, sf)
      val txt = df.queryExecution.explainString(
        org.apache.spark.sql.execution.FormattedMode)
      java.nio.file.Files.write(outDir.resolve(s"${k}_$suffix.txt"),
        txt.getBytes("UTF-8"))
      println(s"[plansnap] wrote ${k}_$suffix.txt (${txt.length} chars)")
    }
    spark.stop()
  }
}
