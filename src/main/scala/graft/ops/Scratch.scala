package graft.ops

/** Per-tag scratch directories for sinks / stream checkpoints, scoped to
  * THIS process: the root is `${java.io.tmpdir}/graft_scratch/p<pid>` so
  * two concurrent JVMs (Bench ∥ Verify, forked test suites) can never
  * wipe each other's live sinks or stream checkpoints — a fixed shared
  * root made that race real (dir("x") in JVM A deletes JVM B's running
  * stream state). Within one process each call wipes and recreates its
  * tag subtree, so repeated Bench/Verify/test invocations overwrite one
  * tree per call site instead of accumulating fresh createTempDirectory
  * outputs (deleteOnExit never fires for non-empty directories, so that
  * shape leaked a full parquet copy of the fixture per invocation).
  * Cross-process accumulation is handled by a shutdown hook that removes
  * the whole per-process root (best-effort; a kill -9 leaks one root,
  * bounded by the tmpdir janitor). Call sites use distinct tags and
  * queries run sequentially, so an in-process wipe can never race a live
  * reader. */
object Scratch {
  private val root: java.nio.file.Path = {
    val r = java.nio.file.Paths.get(
      System.getProperty("java.io.tmpdir"), "graft_scratch",
      "p" + ProcessHandle.current().pid())
    Runtime.getRuntime.addShutdownHook(new Thread(() => deleteTree(r)))
    r
  }

  private def deleteTree(base: java.nio.file.Path): Unit =
    if (java.nio.file.Files.exists(base)) {
      val walk = java.nio.file.Files.walk(base)
      try walk.sorted(java.util.Comparator.reverseOrder())
        .forEach(p => { java.nio.file.Files.deleteIfExists(p); () })
      finally walk.close()
    }

  def dir(tag: String): String = {
    val base = root.resolve(tag)
    deleteTree(base)
    java.nio.file.Files.createDirectories(base)
    base.toString
  }

  /** Unique-per-INVOCATION scratch dir (r17 ADVICE): registry sink keys
    * run under the concurrent dual-SF Verify regime (and Round17Spec's
    * concurrent-session model), so the wiping `dir(tag)` — which deletes
    * the whole tag subtree on every call — can wipe the other SF's
    * in-flight files or hand back a half-deleted tree; for keys like a42
    * whose ANSWER is derived from read-back geometry that is a wrong
    * answer, not a crash. This variant never deletes: each call gets
    * `<root>/<tag>/u<uuid>`, the same device as `Views.unique` for temp
    * view names. Accumulation is bounded: registry keys run O(1) times
    * per process (Verify once per SF, Bench once + a few retries) and the
    * shutdown hook removes the whole per-process root. Single-threaded
    * overwrite contexts (ScaleSoak) keep using `dir`. */
  def unique(tag: String): String = {
    val base = root.resolve(tag).resolve(
      "u" + java.util.UUID.randomUUID().toString.take(12))
    java.nio.file.Files.createDirectories(base)
    base.toString
  }
}
