ThisBuild / scalaVersion := "2.13.17"
ThisBuild / version := "0.1.0"
name := "datafusiontestspark"
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
// The driver json-parses the LAST stdout line of `sbt runMain` bench
// runs. sbt's default LoggedOutput strategy prefixes every forked-
// process stdout line with "[info] " and appends a "[success] Total
// time" trailer — both defeated the parse for three rounds (BENCH_r05..
// r07 "parsed": null). StdoutOutput passes the child's stdout through
// verbatim; showSuccess drops the trailer, so the bench summary line is
// genuinely the last bare line.
run / outputStrategy := Some(OutputStrategy.StdoutOutput)
Global / showSuccess := false
// showSuccess is consumed by sbt's command engine, not by a task —
// silence the unused-key lint
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
  // Whole-stage codegen emits one Janino class per stage; across a
  // 40+-query run the default 240m JIT code cache fills up, compilation
  // silently stops, and late queries run interpreted (observed as random
  // 10-50x slowdowns late in Bench runs).
  "-XX:ReservedCodeCacheSize=1g",
  // 16g default: large enough for sf0.1 shuffles at local[32], small
  // enough that G1 full collections stay short (48g heaps showed
  // multi-second pauses dominating bench times).
  s"-Xmx${sys.env.getOrElse("SPARK_DRIVER_MEM", "16g")}",
)
