ThisBuild / scalaVersion := "2.13.17"
ThisBuild / version := "0.1.0"
name := "anndbspark"
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
// Pass the forked JVM's stdout through unprefixed: Bench's one-line JSON
// must reach the caller as a line starting with '{', not "[info] {".
run / outputStrategy := Some(StdoutOutput)
Compile / run / outputStrategy := Some(StdoutOutput)
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
javacOptions ++= Seq("--add-modules", "jdk.incubator.vector")
javaOptions ++= jdk17AddOpens ++ Seq(
  "--add-modules", "jdk.incubator.vector",
  "-Dspark.ui.enabled=false",
  "-Dspark.sql.session.timeZone=UTC",
  s"-Xmx${sys.env.getOrElse("SPARK_DRIVER_MEM", "8g")}",
)

// Compile the Panama Vector API kernel only when the sbt JVM actually has
// the incubator module (injected via .jvmopts). Without it the file is
// excluded and graft.core.DistKernel falls back to scalar kernels, so the
// build stays green on any JVM invocation.
lazy val vectorApiAvailable: Boolean =
  try { Class.forName("jdk.incubator.vector.FloatVector"); true }
  catch { case _: Throwable => false }
Compile / unmanagedSources / excludeFilter := {
  val base = (Compile / unmanagedSources / excludeFilter).value
  if (vectorApiAvailable) base else base || "VectorKernels.java"
}
