ThisBuild / scalaVersion := "2.13.17"
ThisBuild / version := "0.1.0"
name := "etlprocessesspark"
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
// Bench/Verify stdout must reach the caller VERBATIM: the driver
// certifies a short stdout tail and json-parses its last line, so the
// forked JVM's output must not be re-logged with "[info] " prefixes
// (which make the JSON line unparseable) and sbt's own
// "[success] Total time ..." epilogue must not land after it.
run / outputStrategy := Some(OutputStrategy.StdoutOutput)
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
  // Panama Vector API (incubator module, present in every JDK 17+
  // image but not resolved by default): the SIMD covariance kernel
  // (graft.text.SimdTriangle) needs it at RUNTIME; without the flag
  // SimdSupport detects the absence and the bit-identical scalar
  // kernel runs instead. On a cluster the flag must also reach
  // executors (spark.executor.extraJavaOptions).
  "--add-modules=jdk.incubator.vector",
  "-Dspark.ui.enabled=false",
  "-Dspark.sql.session.timeZone=UTC",
  // 24g default: the 32-thread bench session accumulates broadcasts /
  // block-manager state across 34 queries; at 8g the GC pressure
  // tripled late-query times (q33 4 s -> 12 s). Machine has 128 GiB.
  s"-Xmx${sys.env.getOrElse("SPARK_DRIVER_MEM", "24g")}",
  // dozens of codegen'd stages overflow the default 240 MB JIT code
  // cache — later queries then run partially interpreted/deoptimized
  // (measured: q33 4 s alone, 28 s after 31 predecessors; flat with a
  // larger cache). 1g sufficed for 34 queries; at 51 queries q33
  // degraded again mid-bench (2.4 s → 21 s) → 2g
  "-XX:ReservedCodeCacheSize=2g",
)
