package graft.tools

import org.apache.spark.sql.SparkSession
import java.nio.file.{Files, Paths}

/** Dump `explain("formatted")` for a list of declared queries into
  * `<outDir>/<query>_<suffix>.txt` — the optimization-round evidence
  * files (plans/rNN/<query>_{before,after}.txt) the judge checks plan
  * claims against.
  *
  * Usage: runMain graft.tools.DumpQueryPlans <outDir> <suffix> q1,q2,...
  */
object DumpQueryPlans {
  def main(args: Array[String]): Unit = {
    val Array(outDir, suffix, names) = args
    val wanted = names.split(",").toSeq
    val unknown = wanted.toSet -- graft.SparkEntry.queries.keySet
    require(unknown.isEmpty, s"unknown queries: ${unknown.mkString(", ")}")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.coalescePartitions.parallelismFirst", "false")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.001")
    Files.createDirectories(Paths.get(outDir))
    wanted.foreach { name =>
      try {
        val df = graft.SparkEntry.queries(name)(spark, dir)
        val txt = df.queryExecution.explainString(
          org.apache.spark.sql.execution.FormattedMode)
        Files.writeString(Paths.get(outDir, s"${name}_$suffix.txt"), txt)
        println(s"[plans] wrote $outDir/${name}_$suffix.txt")
      } catch {
        case e: Throwable =>
          System.err.println(s"[plans] $name failed: ${e.getMessage}")
      } finally {
        graft.sources.Tables.evictPinned(spark, blocking = true)
        graft.sources.Tables.releaseLocalCheckpoints(spark)
      }
    }
    spark.stop()
  }
}
