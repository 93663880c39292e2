package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Dev utility (optimization rounds): time the building blocks of the
  * shared pair core stage by stage with the noop sink (guide §1.4), so
  * per-query seconds decompose into operator costs instead of guesses.
  * Usage: runMain graft.Prof [sfDir] */
object Prof {
  def main(args: Array[String]): Unit = {
    val sf = args.headOption
      .orElse(sys.env.get("SPARK_GRAFT_SF_DIR")).getOrElse("/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    sys.env.get("SPARK_GRAFT_CONF").foreach(_.split(';').foreach { kv =>
      kv.split("=", 2) match {
        case Array(k, v) if k.trim.nonEmpty => spark.conf.set(k.trim, v.trim)
        case _ => ()
      }
    })
    def releaseCaches(): Unit = {
      spark.catalog.clearCache()
      spark.sparkContext.getPersistentRDDs.values
        .foreach(_.unpersist(blocking = false))
    }
    def time(tag: String)(df: => DataFrame): Unit = {
      // warm once, then min-of-3 cold
      spark.sparkContext.setJobDescription(tag)
      def once(): Double = {
        val t0 = System.nanoTime()
        df.write.format("noop").mode("overwrite").save()
        val t = (System.nanoTime() - t0) / 1e9
        releaseCaches(); t
      }
      once()
      val ts = (1 to 3).map(_ => once()).sorted
      println(f"[prof] $tag%-40s min=${ts.head}%.3f med=${ts(1)}%.3f max=${ts(2)}%.3f")
      spark.sparkContext.setJobDescription(null)
    }
    import graft.ops.LlmOps
    val stages: Seq[(String, () => DataFrame)] = Seq(
      "docs_scan" -> (() => graft.Tables.t(spark, sf, "documents")),
      "shingles_explode" -> (() => LlmOps.shingles(spark, sf)),
      "shingle_counts_maponly" -> (() => LlmOps.shingleCounts(spark, sf)),
      "posts_groupby" -> (() => LlmOps.postsForProf(spark, sf)),
      "pairs_light_explode" -> (() => LlmOps.lightPairsForProf(spark, sf)),
      "pair_stats_full" -> (() => LlmOps.docPairStats(spark, sf)),
      "minhash_sigs" -> (() => LlmOps.minhashSigs(spark, sf)),
      "prefix_index" -> (() => LlmOps.prefixIndex(spark, sf, 0.5)),
      "tf_postings" -> (() => LlmOps.docShingleTf(spark, sf))
    )
    val only = sys.env.get("SPARK_GRAFT_PROF_ONLY").map(_.split(',').toSet)
    stages.foreach { case (tag, mk) =>
      if (only.forall(_.contains(tag)))
        try time(tag)(mk())
        catch { case e: Throwable =>
          println(s"[prof] $tag FAILED: ${e.getMessage}")
        }
    }
    spark.stop()
  }
}
