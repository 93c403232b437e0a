ThisBuild / scalaVersion := "2.13.17"
ThisBuild / version := "0.1.0"
name := "siftspark"
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
// Forked run output must reach stdout verbatim: the default LoggedOutput
// strategy prefixes every line with "[info] ", which has broken the
// driver's JSON parse of Bench's final total line six rounds running
// (BENCH_r01..r06 `parsed: null`). StdoutOutput inherits the child's
// stdout/stderr directly — no prefix, no wrapping.
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
  // 16g default (was 8g): the bench suite runs 325+ gates × 4
  // executions in ONE 32-thread JVM — at 8g the aging heap (memory
  // sinks, codegen classes, block-manager residue) tipped random gates
  // into GC storms with monotone per-rep growth (r12 captures:
  // sim_ivfpq_topk 8.7→16.5→23.4 in one run, st_transitions
  // 3.2→18.4→27.5 in the next — DIFFERENT gates, same signature,
  // totals equal). 16g, NOT more: the heap response is measured and
  // NON-MONOTONE — a_bootstrap_ci isolated medians 5.9 s @8g /
  // 7.6 @12g / 4.2 @16g / 24.5-79 @24g (reproduced twice; the >16g
  // cliff is a JVM pathology this build routes around, not a Spark
  // plan property).
  s"-Xmx${sys.env.getOrElse("SPARK_DRIVER_MEM", "16g")}",
)
