ThisBuild / scalaVersion := "2.13.17"
ThisBuild / version := "0.1.0"
name := "stonkwhispererspark"
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
// Forked run output goes straight to stdout WITHOUT the "[info] " logger
// prefix: the bench/verify harness tail-captures stdout and parses the
// final JSON line, and the prefix (plus logger wrapping) breaks that.
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
  s"-Xmx${sys.env.getOrElse("SPARK_DRIVER_MEM", "8g")}",
  // A 199-query suite generates thousands of whole-stage-codegen classes;
  // JDK 17's default 240 MB reserved code cache can fill late in the
  // session, at which point the JIT silently stops compiling and new
  // generated code runs INTERPRETED — a many-× CPU multiplier with every
  // GC/spill/storage channel flat (the session-age signature the bench's
  // jit/code-cache channels now instrument). Headroom removes that cliff.
  "-XX:ReservedCodeCacheSize=512m",
)
