ThisBuild / scalaVersion := "2.13.17"
ThisBuild / version := "0.1.0"
name := "equityvolatilitylakehouseplatformspark"
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
// The driver tail-captures stdout of `sbt runMain graft.Bench` and parses
// the LAST line as JSON; two sbt behaviors corrupted that artifact in
// rounds 3-5: the "[success] Total time ..." footer printed after the
// summary, and the logger's "[info] " prefix on every forked-process stdout
// line (which also echoes forked stderr as "[error] " lines on stdout).
// Suppress the footer and route forked output RAW to sbt's own stdout /
// stderr so the bench's summary is the final, prefix-free stdout line.
ThisBuild / showSuccess := false
run / outputStrategy := Some(OutputStrategy.StdoutOutput)
// showSuccess is consumed by sbt's command layer, not by settings — exclude
// it from the unused-key lint so builds stay warning-free.
Global / excludeLintKeys += showSuccess
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
  // The bench/verify mains execute ~90 queries several times in one JVM;
  // janino emits thousands of generated classes and the default 240m
  // JIT code cache fills mid-run — the JIT then silently stops compiling
  // and interpreted-expression-heavy queries (dedup md5 paths) go 5-10x
  // slower in the tail of the run.
  "-XX:ReservedCodeCacheSize=1g",
  "-XX:+UseCodeCacheFlushing",
  // 24g default: the bench/verify mains run 84 queries (plus a warmup
  // pass) in one JVM; at 8g, G1 full-GC pauses hit mid-query and add
  // multi-second noise to individual timings. The host has 128 GiB.
  s"-Xmx${sys.env.getOrElse("SPARK_DRIVER_MEM", "24g")}",
)
