ThisBuild / scalaVersion := "2.13.17"
ThisBuild / version := "0.1.0"
name := "recommendersystemwithpysparkspark"
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
// The bench/verify mains print one machine-parsed JSON line; sbt's default
// forked-run logger decorates program stdout with "[info] " (BENCH_r06–r10
// "parsed": null). StdoutOutput passes the child's stdout through verbatim.
run / outputStrategy := Some(OutputStrategy.StdoutOutput)
// ScalaCheck case count: the per-round GATE default is 100 (r17 verdict —
// the one-shot 100-case deepening ran green; at ~2× a cheap suite it is
// pure depth). Every case is a full Spark job on a small DataFrame, so
// iteration loops can dial down via SPARK_GRAFT_PROP_CASES (e.g. 10);
// the default — what `sbt test` runs with no env — is the gate.
Test / testOptions += Tests.Argument(TestFrameworks.ScalaCheck,
  "-minSuccessfulTests", sys.env.getOrElse("SPARK_GRAFT_PROP_CASES", "100"),
  "-workers", "1")
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
  s"-Xmx${sys.env.getOrElse("SPARK_DRIVER_MEM", "8g")}",
)
