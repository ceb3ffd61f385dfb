ThisBuild / scalaVersion := "2.13.17"
ThisBuild / version := "0.1.0"
name := "openeoprocessesdaskmlspark"
// Spark jars ship with the image at /opt/spark/jars (zero-egress):
unmanagedBase := file("/opt/spark/jars")
// Test-only deps resolve from the pre-warmed coursier cache; anything
// else is intentionally not resolvable (COURSIER_MODE=offline).
libraryDependencies ++= Seq(
  "org.scalatest" %% "scalatest" % "3.2.19" % Test,
  "org.scalacheck" %% "scalacheck" % "1.18.0" % Test,
)
// Optional ONNX Runtime adapter: a container that ships the onnxruntime
// jar (drop it in unmanagedBase) compiles the real OrtTensorSession with
// zero code changes — set GRAFT_WITH_ORT=1. Off by default because this
// zero-egress image has no onnxruntime; the adapter's TensorSession
// contract is unit-tested against the in-container fake either way.
Compile / unmanagedSourceDirectories ++= {
  if (sys.env.contains("GRAFT_WITH_ORT"))
    Seq(baseDirectory.value / "src" / "ort" / "scala")
  else Seq.empty
}
Test / fork := true
run / fork := true
// Stream the forked JVM's stdout/stderr through unprefixed: the driver
// parses Bench's single stdout JSON line, and sbt's default LoggedOutput
// would wrap it as "[info] {...}" which no json parser accepts.
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

// ----- ortcheck: compile-only guard for the optional ORT adapter -----
// The image ships no onnxruntime jar, so the GRAFT_WITH_ORT source set
// would otherwise rot uncompiled between rounds. `sbt ortcheck/compile`
// builds src/ort/scala against the API-shape stubs in src/ort-stub/java
// (compile-only, never shipped, never on the main classpath). The root
// project is defined explicitly (bare settings above still scope to it;
// no aggregation, so driver `sbt test`/`runMain` behavior is unchanged)
// only so ortcheck can depend on it for graft.ml.TensorSession.
lazy val root = (project in file("."))

lazy val ortcheck = (project in file("ort-check"))
  .dependsOn(root)
  .settings(
    Compile / unmanagedSourceDirectories := Seq(
      (ThisBuild / baseDirectory).value / "src" / "ort" / "scala",
      (ThisBuild / baseDirectory).value / "src" / "ort-stub" / "java",
    ),
    Compile / unmanagedBase := file("/opt/spark/jars"),
  )
