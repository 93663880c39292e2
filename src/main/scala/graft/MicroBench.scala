package graft

import org.apache.spark.sql.SparkSession

/** Dev utility: iterate selected registry keys N times and report min/med
  * wall-clock — for comparing operator variants head-to-head.
  * Usage: runMain graft.MicroBench [key ...] (SPARK_GRAFT_SF_DIR to set SF) */
object MicroBench {
  def main(args: Array[String]): Unit = {
    val keys = if (args.nonEmpty) args.toSeq
      else Seq("c10_join_asof", "c10b_join_asof_cogroup", "c10c_join_asof_native")
    val sf = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    // variant testing: SPARK_GRAFT_CONF="k=v;k=v" applies session confs
    // before any measurement (e.g. the stream partition / provider knobs)
    // malformed entries ('=v', empty segments) are skipped with a note,
    // not thrown — a typo'd env var must not abort the whole bench
    sys.env.get("SPARK_GRAFT_CONF").foreach(_.split(';').foreach { kv =>
      kv.split("=", 2) match {
        case Array(k, v) if k.trim.nonEmpty => spark.conf.set(k.trim, v.trim)
        case _ if kv.trim.isEmpty => ()
        case _ => System.err.println(s"[microbench] skipping malformed conf entry: '$kv'")
      }
    })
    // caches are released between iterations so every number is a COLD,
    // independent measurement — same regime as Bench (intra-query persists
    // still count toward their own query's time)
    def releaseCaches(): Unit = {
      spark.catalog.clearCache()
      spark.sparkContext.getPersistentRDDs.values
        .foreach(_.unpersist(blocking = false))
    }
    // A/B mode (SPARK_GRAFT_AB="conf=v1|v2"): run every iteration under
    // BOTH settings back-to-back, so the two variants share each machine
    // phase — the only way to compare on a host with multi-x steal swings
    // (both r21 baseline brackets opened 4-10x slow and drifted for
    // minutes; cross-session comparisons were pure phase noise).
    val ab: Option[(String, Seq[String])] = sys.env.get("SPARK_GRAFT_AB")
      .map { spec =>
        spec.split("=", 2) match {
          case Array(k, vs) if k.trim.nonEmpty && vs.contains("|") =>
            (k.trim, vs.split('|').map(_.trim).toSeq)
          case _ => sys.error(
            s"SPARK_GRAFT_AB must be 'conf.key=v1|v2[|v3...]', got: '$spec'")
        }
      }
    val variants: Seq[(String, () => Unit)] = ab match {
      case Some((key, vals)) =>
        vals.map(v => (s"$key=$v", () => spark.conf.set(key, v)))
      case None => Seq(("", () => ()))
    }
    // warmup (JIT/codegen only; caches dropped right after)
    keys.foreach { k =>
      variants.foreach { case (_, set) =>
        set(); SparkEntry.queries(k)(spark, sf).count(); releaseCaches()
      }
    }
    keys.foreach { k =>
      // ABBA: alternate variant order per iteration so systematic
      // within-phase drift (page cache, JIT, GC ramp) cancels instead of
      // biasing toward whichever variant always ran second
      val times: Map[String, Seq[Double]] = (1 to 3).flatMap { it =>
        val ordered = if (it % 2 == 0) variants.reverse else variants
        ordered.map { case (tag, set) =>
          set()
          val t0 = System.nanoTime()
          SparkEntry.queries(k)(spark, sf).count()
          val t = (System.nanoTime() - t0) / 1e9
          releaseCaches()
          tag -> t
        }
      }.groupBy(_._1).view.mapValues(_.map(_._2).sorted).toMap
      variants.foreach { case (tag, _) =>
        val ts = times(tag)
        println(f"$k%-28s ${tag}%-36s min=${ts.head}%.3f med=${ts(1)}%.3f max=${ts(2)}%.3f")
      }
    }
    spark.stop()
  }
}
