package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.types.StructType

/** Source-format front door. The dispatch core is source-agnostic — any
  * reader that yields the input contract columns feeds it. Parquet is the
  * benchmark path; JSON-lines and CSV cover raw corpus drops; Kafka is
  * the streaming path ([[graft.streaming.DispatchStream]]).
  *
  * Schemas are REQUIRED at scale (schema inference reads the data twice);
  * the `Option[StructType]` escape hatch is for exploration only.
  */
object Readers {

  def parquet(spark: SparkSession, path: String): DataFrame = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    spark.read.parquet(path)
  }

  def jsonl(spark: SparkSession, path: String, schema: Option[StructType] = None): DataFrame = {
    val r = spark.read
    schema.fold(r)(r.schema).json(path)
  }

  def csv(spark: SparkSession, path: String, schema: Option[StructType] = None,
      header: Boolean = true): DataFrame = {
    val r = spark.read.option("header", header.toString)
    schema.fold(r.option("inferSchema", "true"))(r.schema).csv(path)
  }
}
