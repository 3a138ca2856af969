ThisBuild / scalaVersion := "2.13.17"
ThisBuild / version := "0.1.0"
name := "streamingrecommendationspark"
// Spark jars ship with the image at /opt/spark/jars (zero-egress):
unmanagedBase := file("/opt/spark/jars")
// Test-only deps resolve from the pre-warmed coursier cache; anything
// else is intentionally not resolvable (COURSIER_MODE=offline).
libraryDependencies ++= Seq(
  "org.scalatest" %% "scalatest" % "3.2.19" % Test,
  "org.scalacheck" %% "scalacheck" % "1.18.0" % Test,
)
// Fork EVERY run-like task (run, runMain, test). The driver invokes
// `sbt "runMain graft.Bench"`, and task-scoped settings like
// `run / fork` do NOT delegate to the runMain task scope — round 1's
// driver bench ran IN-PROCESS: no javaOptions (so the code-cache fix
// never applied and late queries went interpreted, d2 2 s → 18.6 s) and
// sbt's "[info] " log prefix on the JSON result line (driver parse
// failure). Unscoped settings sit at the root of the delegation chain,
// so run, runMain and test all pick them up.
fork := true
Test / fork := true
run / fork := true
// Forked-run output normally goes through sbt's logger, which prefixes
// every line with "[info] " — that breaks machine parsing of Bench's
// single JSON result line. Pass the child's stdout through untouched.
outputStrategy := Some(OutputStrategy.StdoutOutput)
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
  s"-Xmx${sys.env.getOrElse("SPARK_DRIVER_MEM", "16g")}",
  // 64 queries of whole-stage codegen in one JVM overflow the default
  // 240 MB code cache; once full the JIT shuts off and late queries run
  // interpreted (observed: d2_minhash_pairs 2 s isolated → 19 s late in
  // the bench sequence).
  "-XX:ReservedCodeCacheSize=1g",
)
