package graft.ops

/** Fixed per-tag scratch directories for sinks / stream checkpoints.
  * Each call wipes and recreates `${java.io.tmpdir}/graft_scratch/<tag>`,
  * so repeated Bench/Verify/test invocations in one JVM overwrite one
  * tree per call site instead of accumulating fresh createTempDirectory
  * outputs (deleteOnExit never fires for non-empty directories, so the
  * old shape leaked a full parquet copy of the fixture per invocation).
  * Every call site uses a distinct tag and queries run sequentially, so
  * the wipe can never race a live reader. */
object Scratch {
  def dir(tag: String): String = {
    val base = java.nio.file.Paths.get(
      System.getProperty("java.io.tmpdir"), "graft_scratch", tag)
    if (java.nio.file.Files.exists(base)) {
      val walk = java.nio.file.Files.walk(base)
      try walk.sorted(java.util.Comparator.reverseOrder())
        .forEach(p => { java.nio.file.Files.deleteIfExists(p); () })
      finally walk.close()
    }
    java.nio.file.Files.createDirectories(base)
    base.toString
  }
}
