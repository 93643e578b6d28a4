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
  // 40g default: local[32] runs 32 concurrent tasks in ONE JVM (driver +
  // executor). 8g gave each task ~250 MB and the sf10 per-bucket
  // hash-join builds OOM'd (r15); at 24g the sf10 minhash sort livelocked
  // with all 32 tasks spinning in TaskMemoryManager.allocatePage — each
  // task's ~450 MB execution share can't hold its sort run and the
  // mutual spill-eviction never converges (r19; r18 lost one window to
  // the same stage as a hard OOM). The box has 128 GiB and the DuckDB
  // oracle defaults to ~80% of it (~102 GiB), so 40g still leaves the
  // comparison lopsided AGAINST us while giving 32 sorters ~750 MB each.
  s"-Xmx${sys.env.getOrElse("SPARK_DRIVER_MEM", "40g")}",
)
