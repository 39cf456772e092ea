ThisBuild / scalaVersion := "2.13.17"
ThisBuild / version := "0.1.0"
name := "kafkaprocessorcosmostxdispatchspark"
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
// Forked run output must reach stdout VERBATIM: sbt's default logger
// prefixes every forked line with "[info] ", which breaks any
// line-oriented JSON consumer of Bench/Verify output (the driver's
// bench parser saw "[info] {\"queries\":..." and recorded parsed:null
// in rounds 11–12 despite a well-formed JSON tail).
run / outputStrategy := Some(OutputStrategy.StdoutOutput)
// ...and nothing may print AFTER it: sbt's trailing
// "[success] Total time: ..." line would otherwise be the last stdout
// line a tail-parser sees instead of Bench's compact JSON.
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
  // local[32] packs driver + 32 executor threads + broadcast builds +
  // pinned table/branch caches into ONE heap. The default is derived
  // from the HOST's memory rather than hard-coding one machine's
  // geometry: 48g on a >=96 GiB host (keeps storage eviction and
  // full-GC risk out of the picture as the suite grows; measured bench
  // totals match 8g, so headroom, not a tuning claim), a portable 8g
  // elsewhere so the forked JVM can't drive a small contributor machine
  // into swap. SPARK_DRIVER_MEM always overrides.
  s"-Xmx${sys.env.getOrElse("SPARK_DRIVER_MEM", {
    val memTotalGiB = try {
      scala.io.Source.fromFile("/proc/meminfo").getLines()
        .collectFirst { case l if l.startsWith("MemTotal:") =>
          l.split("\\s+")(1).toLong / (1024 * 1024) }
        .getOrElse(0L)
    } catch { case _: Exception => 0L }
    if (memTotalGiB >= 96) "48g" else "8g"
  })}",
)
