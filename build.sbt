ThisBuild / scalaVersion := "2.13.17"
ThisBuild / version := "0.1.0"
name := "vectordbcloudspark"
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
// Forked run output must reach stdout RAW (no "[info] " logger prefix):
// the bench/verify drivers parse the JSON line Bench prints.
run / outputStrategy := Some(OutputStrategy.StdoutOutput)
// ...and suppress sbt's trailing "[success] Total time" line so the
// JSON line Bench prints is the LAST line of stdout (drivers that
// parse the final line instead of grepping for '{' still succeed).
Global / showSuccess := false
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
  s"-Xmx${sys.env.getOrElse("SPARK_DRIVER_MEM", "16g")}",
  // Batch-throughput collector: G1's concurrent cycles + humongous
  // allocations under local[32] task churn were measured stealing
  // seconds of jvmGCTime from trivial cached-read stages; ParallelGC
  // trades pause latency (irrelevant for batch) for throughput. Xms
  // pinned to Xmx: a growing heap full-GCs on every expansion step.
  sys.env.getOrElse("SPARK_GRAFT_GC", "-XX:+UseParallelGC"),
  s"-Xms${sys.env.getOrElse("SPARK_DRIVER_MEM", "16g")}",
  // 100+ distinct whole-stage-codegen'd plans in one JVM overflow the
  // default 240m JIT code cache; once full, new hot loops run
  // interpreted. Headroom keeps late-session queries compiled.
  "-XX:ReservedCodeCacheSize=512m",
)
// Profiling hook: extra JVM flags (e.g. -Dspark.eventLog.enabled=true)
// for one-off runs without editing this file. Unset = no-op.
javaOptions ++= sys.env.get("SPARK_GRAFT_JAVA_OPTS")
  .map(_.trim.split("\\s+").toSeq.filter(_.nonEmpty)).getOrElse(Nil)
