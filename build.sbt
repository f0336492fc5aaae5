ThisBuild / scalaVersion := "2.13.17"
ThisBuild / version := "0.1.0"
name := "ksppspark"
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
// The driver invokes `sbt runMain` and tail-captures stdout, then parses
// the last JSON line (BENCH protocol). Two sbt default behaviors break
// that parse: the logger prefixes every forked-run output line with
// "[info] ", and a "[success] Total time..." epilogue prints after the
// run. Route forked-run output straight through to stdout (no prefix) and
// suppress the success epilogue so Bench's summary JSON is the literal
// last line of stdout.
Compile / run / outputStrategy := Some(OutputStrategy.StdoutOutput)
Global / showSuccess := false
// showSuccess is consumed by the command engine, not another setting —
// exclude it from the unused-key lint
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
  // Size the single-JVM heap to the machine: local[32] runs 32 concurrent
  // tasks whose execution-memory share at 8g was ~145 MB/task — tight
  // enough that the aggregation-heavy queries (minhash/LSH/pipeline) sat
  // one co-tenant memory squeeze away from GC thrash (the BENCH_r08 shape:
  // heavy queries 2-8x slower than the same command replayed, sub-second
  // queries untouched). The box has 125 GiB; 24g is still conservative.
  s"-Xmx${sys.env.getOrElse("SPARK_DRIVER_MEM", "24g")}",
)
