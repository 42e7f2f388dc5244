ThisBuild / scalaVersion := "2.13.17"
ThisBuild / version := "0.1.0"
name := "gusspark"
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
// the forked run JVM must see the caller's stdin (the interactive
// create-model wizard reads it; sbt swallows it otherwise)
run / connectInput := true
// Pass the forked JVM's stdout/stderr through UNDECORATED: the default
// LoggedOutput strategy prefixes every program line with "[info] ",
// which is why the driver's bench parser never found the one-line JSON
// contract (`[info] {"metric":...}` is not valid JSON) — three rounds
// of BENCH_r*.json `parsed: null` despite the line being present in
// the captured tail.
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
  // 16g default: the ×100 (sf10) bench corpus with local[32] sits
  // right at the edge of 8g — GC-timing-dependent heap OOMs killed
  // two full sf10 suites mid-run (q107/q114, Aug 2026). sf0.1 runs
  // never approached 8g; override with SPARK_DRIVER_MEM as needed.
  s"-Xmx${sys.env.getOrElse("SPARK_DRIVER_MEM", "16g")}",
)
