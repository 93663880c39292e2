package graft.ops

import org.apache.spark.sql.SparkSession

/** Small-file compaction — the operational complement of streaming ingest:
  * `foreachBatch` append (i6) and frequent `to_td` chunks produce one file
  * per task per micro-batch, and at 100 TB the resulting millions of tiny
  * files dominate scan planning time (footer reads) and kill throughput.
  *
  * `compact` rewrites a FLAT parquet directory to ~`targetBytes` files via
  * a size-derived `repartition`, writing to a temp sibling then swapping
  * via two renames. The swap window (directory briefly absent between the
  * renames) means readers must be quiesced or retried during compaction —
  * on object stores / HDFS a table-format commit (manifest swap) is the
  * real fix; this is the filesystem approximation. Hive-partitioned
  * directories are refused: rewriting them flat would silently destroy
  * partition pruning.
  */
object Compaction {

  /** Returns (filesBefore, filesAfter). */
  def compact(spark: SparkSession, dir: String,
      targetBytes: Long = 128L * 1024 * 1024): (Int, Int) = {
    val path = new org.apache.hadoop.fs.Path(dir)
    val fs = path.getFileSystem(spark.sparkContext.hadoopConfiguration)
    require(!fs.listStatus(path).exists(st =>
      st.isDirectory && st.getPath.getName.contains("=")),
      s"$dir is hive-partitioned; compact partitions individually to keep pruning")
    def dataFiles = fs.listStatus(path)
      .filter(f => f.isFile && f.getPath.getName.endsWith(".parquet"))
    val before = dataFiles
    val totalBytes = before.map(_.getLen).sum
    val parts = math.max(1, math.ceil(totalBytes.toDouble / targetBytes).toInt)

    val tmp = new org.apache.hadoop.fs.Path(dir + "__compacting")
    val bak = new org.apache.hadoop.fs.Path(dir + "__precompact")
    spark.read.parquet(dir).repartition(parts)
      .write.mode("overwrite").parquet(tmp.toString)
    // swap: current → backup, compacted → current, drop backup
    fs.rename(path, bak)
    fs.rename(tmp, path)
    fs.delete(bak, true)
    (before.length, dataFiles.length)
  }
}
