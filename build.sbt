ThisBuild / scalaVersion := "2.13.17"
ThisBuild / version := "0.1.0"
name := "big_data_bowlspark"
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
// Pass the forked run's stdout through VERBATIM (no "[info] " prefix) so the
// driver can json-parse Bench's single output line; also drop the trailing
// "[success] ..." banner so that JSON line stays last on stdout.
run / outputStrategy := Some(StdoutOutput)
Global / showSuccess := false
Global / excludeLintKeys ++= Set(run / outputStrategy, showSuccess)
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
  // jdk.incubator.vector: the SIMD LSTM kernel (graft.ml.VecKernel). The
  // module ships with every JDK 16+ but is off the default module graph;
  // KerasLstm probes for it and falls back to scalar loops if absent.
  "--add-modules=jdk.incubator.vector",
  "-Dspark.ui.enabled=false",
  "-Dspark.sql.session.timeZone=UTC",
  s"-Xmx${sys.env.getOrElse("SPARK_DRIVER_MEM", "8g")}",
)
// VecKernel.java imports the incubator module (scalac has no --add-modules;
// javac does). JavaThenScala: scalac then compiles against the emitted
// .class — whose surface is plain float[] — instead of parsing the .java
// source with its unresolvable-to-scalac import.
Compile / compileOrder := CompileOrder.JavaThenScala
Compile / javacOptions ++= Seq("--add-modules", "jdk.incubator.vector")
