package graft

/** Close-of-round step (r18 verdict item 4): persist the registry's key
  * list to `tools/registry_manifest.txt`. The next round's Bench derives
  * its debut-key set (`newKeys`) as `registry − manifest`, replacing the
  * hand-maintained `newThisRound` list whose failure mode was a
  * silently-unbenched debut key. Run `runMain graft.RegistryManifest`
  * as the LAST step of every round, after all keys land (documented in
  * BASELINE.md); the file is committed so the diff is reviewable.
  *
  * No SparkSession is needed — the registry is a static structure.
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
