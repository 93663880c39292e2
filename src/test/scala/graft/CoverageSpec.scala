package graft

import org.scalatest.funsuite.AnyFunSuite

/** Pins the COMMITTED COVERAGE.md to the live registry (r19 verdict item
  * 2: COVERAGE.md shipped one key stale — j118 landed after the last
  * `runMain graft.Coverage` regeneration, so the committed manifest
  * under-reported the tree it shipped with). Same pattern as
  * ContractPlanSpec pinning the contract set: a registry change without
  * regeneration now fails the suite instead of drifting silently.
  */
class CoverageSpec extends AnyFunSuite {

  test("committed COVERAGE.md key set equals SparkEntry.registry") {
    val md = java.nio.file.Files.readString(
      Bench.repoRoot.resolve("COVERAGE.md"))
    val documented = "\\| `([a-z0-9_]+)` \\|".r
      .findAllMatchIn(md).map(_.group(1)).toSet
    val registry = SparkEntry.registry.map(_.key).toSet
    val missing = registry.diff(documented)
    val stale = documented.diff(registry)
    assert(missing.isEmpty && stale.isEmpty,
      s"COVERAGE.md drift — run `sbt \"runMain graft.Coverage\"` and commit:" +
        s"\n  undocumented registry keys: ${missing.toSeq.sorted}" +
        s"\n  stale documented keys: ${stale.toSeq.sorted}")
    // the headline count must match too (it is what a reader quotes)
    val headline = "\\*\\*(\\d+) query keys".r.findFirstMatchIn(md).map(_.group(1))
    assert(headline.contains(registry.size.toString),
      s"COVERAGE.md headline count $headline != registry ${registry.size}")
  }
}
