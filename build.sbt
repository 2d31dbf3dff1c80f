ThisBuild / scalaVersion := "2.13.17"
ThisBuild / version := "0.1.0"
name := "pygrspark"
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
// Pass the forked app's stdout/stderr through RAW instead of routing
// them through sbt's logger: the driver that invokes
// `sbt "runMain graft.Bench"` parses the bench's one-line JSON from a
// bounded stdout tail, and the logger's "[info] " prefix has broken
// that parse in every round to date ("parsed": null in BENCH_rNN).
outputStrategy := Some(StdoutOutput)
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
  // A session that plans the whole 207-query suite compiles ~65k
  // nmethods; the JDK-17 default 240m code cache saturates its
  // non-profiled segment mid-suite and the flusher then evicts hot
  // loops at random — one query per run collapsed 10-37x to the
  // interpreter and the whole suite paid ~2x task CPU (DRIFT_r18 §8,
  // three-run A/B at v2sf1). 512m leaves the segment at ~47%.
  // Production spark-submit wants the same flag on driver AND
  // executors (QUICKSTART "JVM sizing").
  "-XX:ReservedCodeCacheSize=512m",
) ++ sys.env.get("SPARK_GRAFT_JAVA_OPTS").toSeq.flatMap(_.split("\\s+"))
