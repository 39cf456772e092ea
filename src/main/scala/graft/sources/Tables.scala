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
  def load(spark: SparkSession, sfDir: String, name: String): DataFrame = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    spark.read.parquet(s"$sfDir/$name.parquet")
  }
}
