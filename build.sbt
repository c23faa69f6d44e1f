ThisBuild / scalaVersion := "2.13.17"
ThisBuild / version := "0.1.0"
name := "informationextractioninofficialdocumentsusingllmsspark"
// Spark jars ship with the image at /opt/spark/jars (zero-egress):
unmanagedBase := file("/opt/spark/jars")
// Test-only deps resolve from the pre-warmed coursier cache; anything
// else is intentionally not resolvable (COURSIER_MODE=offline).
libraryDependencies ++= Seq(
  "org.scalatest" %% "scalatest" % "3.2.19" % Test,
  "org.scalacheck" %% "scalacheck" % "1.18.0" % Test,
)
Test / fork := true
run / fork := true
// Pass forked output through UNPREFIXED: by default sbt logs the
// forked process's stdout as "[info] ..." lines, which breaks any
// line-oriented JSON consumer of `sbt runMain graft.Bench` (every
// round's BENCH artifact recorded parsed:null — the driver never
// recognized the prefixed JSON line). StdoutOutput inherits this
// JVM's stdout/stderr directly, so Bench's JSON lines reach the
// caller byte-for-byte.
outputStrategy := Some(StdoutOutput)
Compile / run / outputStrategy := Some(StdoutOutput)
// ... and keep Bench's final JSON line the LAST stdout line: the
// trailing "[success] Total time: ..." banner would otherwise follow
// it (fatal to a parse-the-last-line consumer).
Global / showSuccess := false
Global / excludeLintKeys ++= Set(showSuccess, outputStrategy)
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
// local[32] = one JVM doing all executor work: size the heap for 32
// concurrent allocation-heavy tasks (box has 128 GiB; 8g thrashes GC
// and makes 32 threads SLOWER than 8). Pre-commit + pre-touch the
// heap: lazy page faulting under 32 allocation-heavy threads shows up
// as 60-80% SYSTEM time and a consistent ~6x wall-clock penalty
// (measured; see BASELINE.md). Scoped per fork kind — task-scoped
// plain `run / javaOptions` is NOT picked up by `Compile / run`
// forks, so heap flags go on the exact scopes.
// 24g everywhere — the proven config. An 88g run-scope heap was tried
// (round 3) to fit the 100M-turn scaling corpus fully in memory and
// REGRESSED the same 5M-turn pipeline run 6× (36-44 s vs 6-11 s):
// G1 at 88g plus lazy first-touch at this VM's ~200 MB/s zeroing rate
// poisons warm walls for minutes, and pretouching 88g upfront costs
// 5-9 min of fork startup (measured 316 s/565 s). The 100M-turn
// pipeline runs fine at 24g — caches are MEMORY_AND_DISK and spill.
// UseTransparentHugePages (kernel is THP=madvise): 2M heap pages,
// 512× fewer first-touch faults, cheap pretouch.
def heapFlags(default: String): Seq[String] = {
  val m = sys.env.getOrElse("SPARK_DRIVER_MEM", default)
  Seq(s"-Xmx$m", s"-Xms$m", "-XX:+UseTransparentHugePages", "-XX:+AlwaysPreTouch")
}
javaOptions ++= jdk17AddOpens ++ Seq(
  "-Dspark.ui.enabled=false",
  "-Dspark.sql.session.timeZone=UTC",
)
Test / javaOptions ++= heapFlags("24g")
Compile / run / javaOptions ++= heapFlags("24g")
