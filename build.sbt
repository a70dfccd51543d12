ThisBuild / scalaVersion := "2.13.17"
ThisBuild / version := "0.1.0"
name := "peneospark"
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
// Forked-process output passes through RAW (no "[info] " prefix): the driver
// parses Bench's single JSON stdout line, and sbt's log prefix broke that
// in round 1 (BENCH_r01.json "parsed": null). Project-level so it applies to
// `run` and `runMain` alike.
outputStrategy := Some(StdoutOutput)
// Bench's local-cluster scaling phase launches REAL executor JVMs through
// the Spark launcher, which needs these two (the distribution lives at
// /opt/spark; the launcher can't infer the Scala version outside a build
// tree). Harmless for plain local[*] runs: SparkSession never reads
// spark-defaults.conf unless started via spark-submit.
envVars ++= Map("SPARK_HOME" -> "/opt/spark", "SPARK_SCALA_VERSION" -> "2.13")
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
  // Measured on the 32-core/128 GiB box: a COMPACT heap wins for the
  // allocation-heavy kernel (big heaps pay multi-second page-fault zeroing
  // on growth; 8g stays cache-hot and steady). ParallelGC edges out G1 for
  // pure-throughput batch. Knobs: SPARK_DRIVER_MEM, GRAFT_GC, GRAFT_XMN.
  s"-Xmx${sys.env.getOrElse("SPARK_DRIVER_MEM", "8g")}",
  s"-XX:+Use${sys.env.getOrElse("GRAFT_GC", "Parallel")}GC",
) ++ sys.env.get("GRAFT_XMN").map(x => Seq(s"-Xmn$x")).getOrElse(Seq.empty)
