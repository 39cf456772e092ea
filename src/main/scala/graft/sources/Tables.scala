package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Central loader for the harness parquet tables (TESTDATA.md).
  *
  * The driver-generated parquet stores timestamps as INT64
  * TIMESTAMP(NANOS), which Spark only reads with
  * `spark.sql.legacy.parquet.nanosAsLong` — timestamp-ish columns (`ts`,
  * `l_shipdate`, `o_orderdate`) then surface as LongType nanoseconds since
  * epoch. The DuckDB oracle mirrors them with `epoch_ns(col)`, keeping both
  * engines on exact integers (no fp or timezone drift).
  */
object Tables {

  val names: Seq[String] =
    "region nation customer supplier part orders lineitem events documents embeddings".split(" ").toSeq

  // Weak-keyed BY SESSION: a cached DataFrame is bound to the session that
  // built it and must never be served to another one; weak identity keys
  // also let a stopped session's entries (and their persisted tables) be
  // collected instead of pinning SessionState for the JVM lifetime.
  private val cached =
    new java.util.WeakHashMap[SparkSession, scala.collection.concurrent.TrieMap[(String, String), DataFrame]]()

  private def sessionCache(spark: SparkSession) = cached.synchronized {
    var m = cached.get(spark)
    if (m == null) {
      m = scala.collection.concurrent.TrieMap.empty[(String, String), DataFrame]
      cached.put(spark, m)
    }
    m
  }

  def load(spark: SparkSession, sfDir: String, name: String): DataFrame =
    sessionCache(spark).getOrElse((sfDir, name), {
      spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
      spark.read.parquet(s"$sfDir/$name.parquet")
    })

  /** Bench mode: pin each table in memory ONCE so a sequence of dozens of
    * queries doesn't re-read parquet footers and re-derive stats per query
    * — the per-query fixed cost dominates small-SF benches. Not used by
    * Verify: correctness runs keep the plain parquet scans (pushed
    * filters, pruned columns) that the plan audit documents.
    */
  def preload(spark: SparkSession, sfDir: String): Unit = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val m = sessionCache(spark)
    names.foreach { n =>
      val p = new java.io.File(s"$sfDir/$n.parquet")
      if (p.exists() && !m.contains((sfDir, n))) {
        val df = spark.read.parquet(p.getPath).persist()
        df.count() // materialize now so no query pays the first-touch cost
        m((sfDir, n)) = df
      }
    }
  }
}
