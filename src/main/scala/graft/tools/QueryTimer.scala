package graft.tools

import org.apache.spark.sql.SparkSession

/** Per-query wall-clock timer: `runMain graft.tools.QueryTimer q1 q2 ...`
  * (all queries when no args), against SPARK_GRAFT_SF_DIR (default sf0.1).
  */
object QueryTimer {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")}]")
      .config("spark.sql.shuffle.partitions", sys.env.getOrElse("SPARK_GRAFT_CPUS", "32"))
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val names = if (args.nonEmpty) args.toSeq else graft.SparkEntry.queries.keys.toSeq.sorted
    names.foreach { n =>
      val t0 = System.nanoTime()
      val cnt =
        try graft.SparkEntry.queries(n)(spark, dir).count()
        catch { case e: Throwable => println(s"$n FAILED: ${e.getMessage}"); -1L }
      println(f"$n%-24s ${(System.nanoTime() - t0) / 1e9}%8.1f s  rows=$cnt")
    }
    spark.stop()
  }
}
