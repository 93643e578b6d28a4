ThisBuild / scalaVersion := "2.13.17"
ThisBuild / version := "0.1.0"
name := "duckdbgeographyspark"
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
// The driver invokes `sbt "runMain graft.Bench"` and parses the LAST JSON
// line from stdout. By default sbt routes a forked run's stdout through its
// logger, prefixing every line with [info]/[error] and appending a
// "[success] Total time…" trailer — 17 rounds of BENCH_r*.json carried
// "parsed": null because of it. StdoutOutput passes the forked JVM's stdout
// through bare. (Bench also writes the same slim line to bench_slim.json so
// the contract no longer depends on stdout munging at all.)
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
  // 24g default: local[32] runs 32 concurrent tasks in ONE JVM (driver +
  // executor), so 8g gave each task ~250 MB — the sf10 section's
  // per-bucket hash-join builds OOM'd there (r15). The box has 128 GiB
  // and the DuckDB oracle is allowed ~80% of it by default; 24g keeps
  // the comparison honest while bounding our footprint.
  s"-Xmx${sys.env.getOrElse("SPARK_DRIVER_MEM", "24g")}",
)
