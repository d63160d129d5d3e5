ThisBuild / scalaVersion := "2.13.17"
ThisBuild / version := "0.1.0"
name := "streaminglensspark"
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
// Pass the forked JVM's stdout through verbatim instead of logging it with
// an "[info] " prefix: the driver parses Bench's one-line JSON from captured
// stdout, and a prefixed line is not valid JSON (every BENCH_r* artifact
// through r20 shows `[info] {"metric":...` and `parsed: null`).
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
  // 16g default: the 293-entry catalog persists ~45 shared frames per
  // pass; under 8g the storage pool evicted early frames mid-pass and
  // their consumers silently recomputed the corpus-sized explode (the
  // r19 bigram-family floor drift on untouched code reads exactly like
  // eviction-driven recompute). The host has 128 GiB.
  s"-Xmx${sys.env.getOrElse("SPARK_DRIVER_MEM", "16g")}",
  // 346 codegen'd plans in a two-pass bench run overflow the JVM's default
  // 240 MB code cache; exhaustion silently disables the JIT and the tail
  // of the run (the AQE twin) degrades 4-5x. Headroom keeps late-pass
  // timings comparable to early-pass ones.
  "-XX:ReservedCodeCacheSize=512m",
)
