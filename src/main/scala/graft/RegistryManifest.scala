package graft

/** Persist the registry's key list to `tools/registry_manifest.txt`;
  * Bench derives its debut-key set (`newKeys`) as `registry − manifest`,
  * replacing the hand-maintained `newThisRound` list whose failure mode
  * was a silently-unbenched debut key (r18 verdict item 4).
  *
  * TIMING — run as the FIRST step of every session, BEFORE adding keys:
  * the driver's BENCH_rN runs after round N's session ends, so at that
  * point the manifest must still hold round N−1's registry for round N's
  * debuts to be flagged into the core tier. Regenerating at session
  * start captures exactly the prior round's close (a no-op diff when the
  * registry is unchanged). The file is committed so the diff is
  * reviewable. No SparkSession is needed — the registry is static.
  */
object RegistryManifest {
  def main(args: Array[String]): Unit = {
    val keys = SparkEntry.registry.map(_.key).sorted
    val path = Bench.manifestPath
    java.nio.file.Files.createDirectories(path.getParent)
    java.nio.file.Files.write(path,
      (keys.mkString("\n") + "\n").getBytes("UTF-8"))
    println(s"[manifest] wrote ${keys.size} keys to $path")
  }
}
