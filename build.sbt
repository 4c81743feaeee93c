ThisBuild / scalaVersion := "2.13.17"
ThisBuild / version := "0.1.0"
name := "vettorespark"
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
// Pass the forked JVM's stdout through verbatim: sbt's default logger
// prefixes every line with "[info] ", which breaks machine parsing of
// Bench's single JSON output line.
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
// The SIMD argmin/ranking kernels (src/main/java/graft/simd) use the
// JDK 16+ incubator Vector API; code probes availability at runtime and
// falls back to the scalar kernels if the module is absent.
Compile / javacOptions ++= Seq("--add-modules", "jdk.incubator.vector",
  "-encoding", "UTF-8")
// Fork javac: the in-process compiler runs inside sbt's JVM, which was
// not started with the incubator module, and fails module access checks.
Compile / javaHome := Some(file(sys.props("java.home")))
javaOptions ++= jdk17AddOpens ++ Seq(
  "--add-modules=jdk.incubator.vector",
  "-Dspark.ui.enabled=false",
  "-Dspark.sql.session.timeZone=UTC",
  s"-Xmx${sys.env.getOrElse("SPARK_DRIVER_MEM", "8g")}",
  // Long benchmark/verify sessions execute hundreds of distinct
  // whole-stage-codegen plans; the default 240 MB JIT code cache fills
  // and flushing then deoptimizes hot kernel loops 10-20x (observed:
  // FlatIndex block scans 0.17s -> 2.9s after the 85-query oracle
  // family ran first). Reserve enough that compiled kernels stay
  // compiled — reservation is address space, not committed memory.
  "-XX:ReservedCodeCacheSize=1g",
)
