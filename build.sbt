ThisBuild / scalaVersion := "2.13.17"
ThisBuild / version := "0.1.0"
name := "pruebatecnicahttpclientetlspark"
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
// Forked `run` output goes straight to stdout UNPREFIXED. The default
// LoggedOutput strategy prepends `[info] ` to every app line, which is
// what broke the driver's JSON-tail parse of graft.Bench's final
// machine-readable line three rounds running (VERDICT r13 #2): the line
// was present but `[info] {"metric":...}` is not valid JSON. With
// StdoutOutput the bench's last printed line is bare JSON; only sbt's
// own `[success]` trailer follows it.
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
) ++ {
  // shuffle/spill/checkpoint files on tmpfs when available: the container's
  // virtual disk has multi-second IO stalls under load that randomly
  // inflate query times; RAM is sized far above any local-mode spill this
  // corpus makes. Gated on usable space, not bare existence — Docker caps
  // /dev/shm at 64 MB by default, and spilling into a full tmpfs fails with
  // confusing no-space-left errors. Skipped on macOS/Windows (no /dev/shm).
  val shm = file("/dev/shm")
  if (shm.isDirectory && shm.getUsableSpace > 8L * 1024 * 1024 * 1024)
    Seq("-Dspark.local.dir=/dev/shm/graft-spark")
  else Seq.empty
}
