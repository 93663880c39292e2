ThisBuild / scalaVersion := "2.13.17"
ThisBuild / version := "0.1.0"
name := "pandastdspark"
// Spark jars ship with the image at /opt/spark/jars (zero-egress):
unmanagedBase := file("/opt/spark/jars")
// Test-only deps resolve from the pre-warmed coursier cache; anything
// else is intentionally not resolvable (COURSIER_MODE=offline).
libraryDependencies ++= Seq(
  "org.scalatest" %% "scalatest" % "3.2.19" % Test,
  "org.scalacheck" %% "scalacheck" % "1.18.0" % Test,
)
Test / fork := true
// r22 (verdict item 2 — bound the suite wall so the driver's `sbt test`
// completes instead of truncating): the registry-wide hostile-fixture
// sweeps each run all 425 keys and together took ~42 of the run's 49
// minutes in ONE sequential JVM. Give each sweep its own forked JVM,
// run groups in parallel (the 32-core box idles otherwise), and keep
// every other suite in one "fast" group so the shared-session suites
// stay sequential with each other. Coverage is unchanged — every test
// still runs; wall drops to roughly the slowest single sweep. Each JVM
// gets its own SparkSession and per-process scratch (Scratch is
// pid-scoped; TestSpark's warehouse dir is per-process), so groups
// cannot race on disk state.
val slowSweepSuites = Set(
  "graft.DegenerateEmptySpec", "graft.DegenerateSingleRowSpec",
  "graft.DegeneratePathologicalSpec", "graft.DegenerateNullSpec",
  "graft.EventsGuardSpec", "graft.NgramGuardSpec", "graft.EmbeddingGuardSpec")
Test / testGrouping := {
  val opts = (Test / forkOptions).value
  val (slow, fast) = (Test / definedTests).value
    .partition(t => slowSweepSuites(t.name))
  Tests.Group("fast", fast, Tests.SubProcess(opts)) +:
    slow.sortBy(_.name).map(t =>
      Tests.Group(t.name, Seq(t), Tests.SubProcess(opts)))
}
// allow up to 5 forked test JVMs at once (default is 1); limitAll keeps
// sbt's own task parallelism sane
Global / concurrentRestrictions := Seq(
  Tags.limit(Tags.ForkedTestGroup, 5),
  Tags.limitAll(24))
// Wipe stale JUnit XML before each test run: reports of since-deleted
// specs otherwise survive forever (a deleted debug spec's failure XML
// outlived its source by a round), so tooling that sums the directory
// would over-count. After this, test-reports/ always equals the LAST run.
Test / testOptions += Tests.Setup { () =>
  val dir = new java.io.File("target/test-reports")
  Option(dir.listFiles()).getOrElse(Array.empty[java.io.File])
    .filter(_.getName.endsWith(".xml")).foreach(_.delete())
}
run / fork := true
// Forked run output goes straight through to stdout/stderr, WITHOUT sbt's
// "[info] "/"[error] " logger prefixes: Bench prints a single JSON line on
// stdout that downstream tooling parses line-wise — a prefixed line is not
// valid JSON (every BENCH_r{1,2,3}.json came back "parsed": null).
run / outputStrategy := Some(StdoutOutput)
// Spark 4.x on JDK 17 needs these when SparkSession is created outside
// spark-submit (which normally injects them). Matches
// org.apache.spark.launcher.JavaModuleOptions.defaultModuleOptions().
val jdk17AddOpens = Seq(
  "java.base/java.lang", "java.base/java.lang.invoke",
  "java.base/java.lang.reflect", "java.base/java.io",
  "java.base/java.net", "java.base/java.nio",
  "java.base/java.util", "java.base/java.util.concurrent",
  "java.base/java.util.concurrent.atomic",
  "java.base/sun.nio.ch", "java.base/sun.nio.cs",
  "java.base/sun.security.action", "java.base/sun.util.calendar",
).flatMap(p => Seq("--add-opens", s"$p=ALL-UNNAMED"))
javaOptions ++= jdk17AddOpens ++ Seq(
  "-Dspark.ui.enabled=false",
  "-Dspark.sql.session.timeZone=UTC",
  s"-Xmx${sys.env.getOrElse("SPARK_DRIVER_MEM", "8g")}",
) ++
  // Optional scratch redirect (A/B seam): java.io.tmpdir hosts Spark's
  // local dirs (shuffle files) and the graft Scratch root (stream
  // checkpoints/state). SPARK_GRAFT_TMPDIR=/dev/shm measures the
  // disk-vs-tmpfs cost of that I/O; unset keeps the stock /tmp default.
  sys.env.get("SPARK_GRAFT_TMPDIR").map(t => s"-Djava.io.tmpdir=$t").toSeq
