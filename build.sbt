ThisBuild / scalaVersion := "2.13.17"
ThisBuild / version := "0.1.0"
name := "tidb2dwspark"
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
// The driver invokes `sbt "runMain graft.Bench"` and parses the bench's
// one-line JSON from the process stdout. Under sbt's default LoggedOutput
// every forked-JVM stdout line is re-logged behind an "[info] " prefix and
// the run ends with sbt's own "[success] Total time..." line — the driver's
// JSON parse failed on exactly that for two rounds (BENCH_r08/r09 both
// carry parsed:null). StdoutOutput passes the forked JVM's stdout through
// verbatim (Spark logs go to stderr and are unaffected), and showSuccess
// drops the trailing "[success]" line, so the bench's compact JSON is the
// true LAST stdout line of the whole sbt invocation.
run / outputStrategy := Some(OutputStrategy.StdoutOutput)
Global / showSuccess := false
// showSuccess is consumed by sbt's command engine, not another task;
// exclude it from the unused-key lint so batch output stays clean
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
  // Fixed-size heap: local[32] under a growing/shrinking heap spends
  // ~35% of CPU in the KERNEL (commit/uncommit churn against the VM's
  // memory driver, measured via /proc/stat during bench bursts) and the
  // stalls land on random queries as 5-10x timing spikes. Xms == Xmx
  // commits once and keeps G1 from returning memory mid-run.
  s"-Xmx${sys.env.getOrElse("SPARK_DRIVER_MEM", "12g")}",
  s"-Xms${sys.env.getOrElse("SPARK_DRIVER_MEM", "12g")}",
  // fault every heap page in at JVM startup instead of mid-query: on a
  // virtualized host under memory pressure, first-touch faults are slow
  // kernel time that otherwise lands on whichever query grows the heap
  "-XX:+AlwaysPreTouch",
)
