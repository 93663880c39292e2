package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.types.StructType

/** Manifest-resolved scans (the a23/a24 versioned-table discipline,
  * shared by the copy-on-write keys and the streaming table-commit
  * harnesses): a ZERO-file list is a legitimately EMPTY snapshot — the
  * commit saw no rows — and must resolve to an empty relation carrying
  * the table schema, the way a real table format resolves a scan from
  * its catalog. Handing zero paths to `spark.read.parquet` would die in
  * UNABLE_TO_INFER_SCHEMA instead. */
object ManifestIO {
  /** `schema` is by-name: callers that derive it from a footer read
    * (Round8's base-table dir) only pay that read on the empty path. */
  def readFiles(s: SparkSession, fs: Seq[String],
      schema: => StructType): DataFrame =
    if (fs.isEmpty)
      s.createDataFrame(new java.util.ArrayList[org.apache.spark.sql.Row](),
        schema)
    else s.read.parquet(fs: _*)
}
