package graft.tools

import org.apache.spark.sql.SparkSession

/** One-off plan/partition probe for tuning sessions: prints each table's
  * scan partition count (as the bench's preloaded cache would freeze it)
  * and a query's formatted plan when asked.
  */
object Probe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")}]")
      .config("spark.sql.shuffle.partitions", sys.env.getOrElse("SPARK_GRAFT_CPUS", "32"))
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    sys.env.get("SPARK_GRAFT_CONF").foreach(_.split(';').filter(_.nonEmpty).foreach { kv =>
      kv.split("=", 2) match {
        case Array(k, v) => spark.conf.set(k, v)
        case _ => sys.error(s"SPARK_GRAFT_CONF entry '$kv' is not key=value")
      }
    })
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    graft.sources.Tables.preload(spark, dir)
    for (t <- Seq("events", "documents", "embeddings", "lineitem", "orders")) {
      val df = graft.sources.Tables.load(spark, dir, t)
      println(s"$t: cached partitions = ${df.rdd.getNumPartitions}, rows = ${df.count()}")
    }
    args.foreach { q =>
      println(s"=== plan for $q")
      val df = graft.SparkEntry.queries(q)(spark, dir)
      val t0 = System.nanoTime()
      df.collect()
      println(f"executed in ${(System.nanoTime() - t0) / 1e9}%.2f s; final adaptive plan:")
      println(df.queryExecution.executedPlan.toString.take(20000))
      graft.sources.Tables.evictPinned(spark, blocking = true)
      graft.sources.Tables.releaseLocalCheckpoints(spark)
    }
    spark.stop()
  }
}
