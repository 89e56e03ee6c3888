ThisBuild / scalaVersion := "2.13.17"
ThisBuild / version := "0.1.0"
name := "pigeonopticsspark"
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
// forked `run` output passes RAW to stdout — no `[info] ` logger
// framing. The bench driver captures a ~2 KB log tail and parses the
// headline JSON line from it; sbt's prefix (and its ragged interaction
// with the byte-aligned tail window) kept the parse failing
// (VERDICT r15 "what's wrong" #1). sbt's own [success]/[error] lines
// are unaffected.
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
  // default raised 8g -> 24g (r18): local[32] runs all 32 executor
  // threads' execution+storage memory inside this one JVM on a 128 GiB
  // box; at 8g the unified region is ~4.6 GB (~150 MB/task) and
  // allocation-heavy stages at 32 threads run the collector hot — the
  // suspected amplifier of the multi-x wall-clock episodes recorded in
  // r15-r17 verdicts. Still env-overridable either way (guide §5/§9:
  // size executor memory to the machine, not the default).
  s"-Xmx${sys.env.getOrElse("SPARK_DRIVER_MEM", "24g")}",
  "-Xss16m", // deep document trees recurse in the CBOR codec
)
