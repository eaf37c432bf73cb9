ThisBuild / scalaVersion := "2.13.17"
ThisBuild / version := "0.1.0"
name := "hipporagspark"
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
// The round driver parses Bench's one-line JSON from stdout; without this,
// sbt re-logs the forked process's stdout as "[info] {...}" and the parse
// fails (BENCH_r01/r02 both recorded parsed:null). StdoutOutput pipes the
// forked JVM's stdout/stderr straight through, unprefixed.
ThisBuild / outputStrategy := Some(OutputStrategy.StdoutOutput)
run / outputStrategy := Some(OutputStrategy.StdoutOutput)
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
  // 24g default: the image has 128 GiB; an 8g heap makes the 32-thread
  // extraction/bench runs GC-bound and kills core-scaling.
  s"-Xmx${sys.env.getOrElse("SPARK_DRIVER_MEM", "24g")}",
  // Xms == Xmx: the default tiny initial heap made the FIRST bench
  // action pay seconds of grow-the-heap GC churn (measured 4.5 s of GC
  // inside the cache_build line at sf0.1) — fixed sizing removes the
  // resize cycles without touching any timed methodology.
  s"-Xms${sys.env.getOrElse("SPARK_DRIVER_MEM", "24g")}",
)
