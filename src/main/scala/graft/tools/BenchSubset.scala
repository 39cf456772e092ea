package graft.tools

import org.apache.spark.sql.SparkSession

/** [[graft.Bench]] restricted to a comma-separated query list — the fast
  * inner loop while tuning one query's plan. Same discipline as Bench
  * (preload, warmup at the small SF, best-of-N, per-query pin eviction),
  * same one-line JSON output.
  */
object BenchSubset {
  def main(args: Array[String]): Unit = {
    val wanted = args.headOption.map(_.split(",").toSet)
      .getOrElse(sys.error("usage: BenchSubset q_name1,q_name2"))
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      // data-volume-targeted reduce coalescing (see GraftSession.builder)
      .config("spark.sql.adaptive.coalescePartitions.parallelismFirst", "false")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // same ad-hoc experiment hook as Bench — a conf experiment must not
    // silently measure the defaults
    sys.env.get("SPARK_GRAFT_CONF").foreach(_.split(';').filter(_.nonEmpty).foreach { kv =>
      kv.split("=", 2) match {
        case Array(k, v) => spark.conf.set(k, v)
        case _ => sys.error(s"SPARK_GRAFT_CONF entry '$kv' is not key=value")
      }
    })
    graft.sources.Tables.preload(spark, sfDir)
    // a typo'd name must fail loudly, not bench an empty set
    val unknown = wanted -- graft.SparkEntry.queries.keySet
    require(unknown.isEmpty, s"unknown queries: ${unknown.mkString(", ")}")
    val picked = graft.SparkEntry.queries.filter(q => wanted(q._1))
    val warmDir = sys.env.getOrElse("SPARK_GRAFT_WARM_DIR", "/root/testdata/sf0.001")
    if (new java.io.File(warmDir).isDirectory && warmDir != sfDir) {
      graft.sources.Tables.preload(spark, warmDir)
      picked.foreach { case (name, fn) =>
        try fn(spark, warmDir).write.mode("overwrite").format("noop").save()
        catch { case e: Throwable => System.err.println(s"[bench] warmup $name: ${e.getMessage}") }
        graft.sources.Tables.evictPinned(spark, blocking = true)
        graft.sources.Tables.releaseLocalCheckpoints(spark)
      }
    }
    val passes = sys.env.getOrElse("SPARK_GRAFT_PASSES", "2").toInt
    val results = picked.toSeq.sortBy(_._1).map { case (name, fn) =>
      val times = (1 to passes).map { _ =>
        val t0 = System.nanoTime()
        val ok = try {
          // noop write, NOT count(): count() lets Catalyst prune columns
          // and then ELIMINATE provably row-preserving operators — e.g.
          // q_decontaminate's left join (unique right keys, no referenced
          // right columns) vanished and the bench timed a plan that never
          // extracted a shingle. The noop sink computes every output
          // column at full fidelity and discards the rows.
          fn(spark, sfDir).write.mode("overwrite").format("noop").save(); true
        } catch {
          case e: Throwable => System.err.println(s"[bench] $name FAILED: ${e.getMessage}"); false
        }
        if (ok) (System.nanoTime() - t0) / 1e9 else -1.0
      }
      graft.sources.Tables.evictPinned(spark, blocking = true)
      graft.sources.Tables.releaseLocalCheckpoints(spark)
      name -> (if (times.contains(-1.0)) -1.0 else times.min)
    }
    val qs = results.map { case (k, v) => s"\"" + k + "\":" + v }.mkString("{", ",", "}")
    println(s"""{"metric":"subset","value":${results.map(_._2).sum},"unit":"sec","queries":$qs,"sf":"$sfDir"}""")
    graft.sources.Tables.evict(spark)
    spark.stop()
  }
}
