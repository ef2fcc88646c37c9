ThisBuild / scalaVersion := "2.13.17"
ThisBuild / version := "0.1.0"
name := "neo4j_graphdbspark"
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
// VERDICT r14 #5 (bench-artifact contract): sbt's "[success] Total
// time: …" line printed AFTER the forked main's stdout kept a
// last-line parser from seeing Bench's compact JSON summary.
// Suppressing it makes the JSON the literal last stdout line;
// target/bench.json stays the durable file contract.
Global / showSuccess := false
// the lint can't see command-level usage of showSuccess
Global / excludeLintKeys += showSuccess
// VERDICT r15 #2 (bench-artifact contract, third attempt): sbt decorates
// forked stdout with an "[info] " prefix by default, so the literal last
// stdout line of `runMain graft.Bench` was "[info] {...}" and the
// driver's tail parser recorded "parsed": null two rounds running.
// StdoutOutput passes the forked JVM's stdout through UNDECORATED — the
// compact JSON summary becomes the byte-literal last stdout line.
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
  s"-Xmx${sys.env.getOrElse("SPARK_DRIVER_MEM", "8g")}",
)
