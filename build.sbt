ThisBuild / scalaVersion := "2.13.17"
ThisBuild / version := "0.1.0"
name := "greenplumcdcspark"
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
// The driver greps the LAST stdout lines of `runMain graft.Bench` for one
// JSON line. Under sbt's default LoggedOutput the forked process's stdout
// is re-tagged "[info] ..." and a "[success] Total time" line is appended
// — both of which broke the driver's JSON parse in rounds 1-4. StdoutOutput
// passes the forked stdout through verbatim; showSuccess drops the trailer.
outputStrategy := Some(OutputStrategy.StdoutOutput)
Global / showSuccess := false
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
  s"-Xmx${sys.env.getOrElse("SPARK_DRIVER_MEM", "16g")}",
) ++
  // CORE spark confs (compression codec, local dirs, ...) must exist before
  // the SparkContext does — spark.conf.set is too late for them, so
  // SPARK_GRAFT_CONF can't carry them. System properties can:
  //   SPARK_GRAFT_JVM_CONF="spark.io.compression.codec=zstd" sbt "runMain ..."
  // Split only on commas that START a new spark.*=value token: a
  // LIST-valued conf (spark.local.dir=/a,/b) keeps its commas, and empty
  // segments (trailing comma) produce no bogus bare -D flag. The
  // lookahead is anchored to a dotted spark key — a list ELEMENT that
  // itself looks like key=value (extraJavaOptions=-Da=1,b=2) no longer
  // mis-splits. Known limit: a non-spark.* system property as the 2nd+
  // token won't split — pass those via separate -D flags.
  sys.env.get("SPARK_GRAFT_JVM_CONF").toSeq
    .flatMap(_.split(""",(?=spark\.[\w.]+=)""").map(_.trim).filter(_.nonEmpty)
      .map(kv => s"-D$kv"))
