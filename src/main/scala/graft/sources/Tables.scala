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

  // keyed by session identity too: a cached DataFrame is bound to the session
  // that built it, and must never be served to a different (or stopped)
  // session in the same JVM
  private val cached = scala.collection.concurrent.TrieMap.empty[(String, String, String), DataFrame]

  private def sessionKey(spark: SparkSession): String =
    System.identityHashCode(spark).toString

  def load(spark: SparkSession, sfDir: String, name: String): DataFrame =
    cached.getOrElse((sessionKey(spark), sfDir, name), {
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
    names.foreach { n =>
      val p = new java.io.File(s"$sfDir/$n.parquet")
      if (p.exists() && !cached.contains((sessionKey(spark), sfDir, n))) {
        val df = spark.read.parquet(p.getPath).persist()
        df.count() // materialize now so no query pays the first-touch cost
        cached((sessionKey(spark), sfDir, n)) = df
      }
    }
  }
}
