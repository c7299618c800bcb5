ThisBuild / scalaVersion := "2.13.17"
ThisBuild / version := "0.1.0"
name := "cassandrapvarchiverspark"
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
// Pass the forked run's stdout straight through: sbt's default logged
// output prefixes every line with [info], which breaks machine parsing
// of Bench's single JSON result line.
run / outputStrategy := Some(OutputStrategy.StdoutOutput)
// ... and keep sbt's own epilogue off stdout too: the trailing
// "[success] Total time: ..." line lands AFTER the JSON line, so a
// parser taking the last stdout line gets sbt noise instead of the
// metric. With showSuccess off, Bench's JSON is the final line.
Global / showSuccess := false
// showSuccess is consumed by sbt's command engine, not by another
// setting — exempt it from the unused-key lint.
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
  "-Dspark.ui.enabled=false",
  "-Dspark.sql.session.timeZone=UTC",
  s"-Xmx${sys.env.getOrElse("SPARK_DRIVER_MEM", "8g")}",
  // ~50 queries × 2 runs of whole-stage-codegen classes overflow the
  // default 240 MB code cache mid-benchmark; the JIT then silently
  // stops compiling and late queries run interpreted (measured 25×:
  // 9.8 s → 230 s on the JSON serialization query).
  "-XX:ReservedCodeCacheSize=1g",
  "-XX:+UseCodeCacheFlushing",
)
