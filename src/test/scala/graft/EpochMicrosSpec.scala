package graft

import graft.sources.Tables
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The timestamp schema adapter: the driver has shipped the harness
  * parquet with DIFFERENT physical timestamp encodings across rounds
  * (INT64 nanos read as LongType; timestamp[us] read as TIMESTAMP_NTZ),
  * and the round-9 breakage came from a call site touching the physical
  * type directly. These tests pin that every encoding of the same
  * instant yields the SAME epoch-microsecond integer through
  * [[Tables.epochMicros]], and that [[Tables.tsLiteral]] round-trips
  * through each encoding's comparison semantics.
  */
class EpochMicrosSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  // 2024-01-02T03:04:05.123456Z
  private val instantUs = 1704164645123456L

  test("all three physical encodings yield the same epoch microseconds") {
    val asNanos = Seq(instantUs * 1000L).toDF("ts")
    val asNtz = spark.sql(
      s"SELECT timestampadd(MICROSECOND, $instantUs, TIMESTAMP_NTZ '1970-01-01 00:00:00') AS ts")
    val asTz = spark.sql(
      s"SELECT timestampadd(MICROSECOND, $instantUs, TIMESTAMP '1970-01-01 00:00:00Z') AS ts")
    for ((df, enc) <- Seq((asNanos, "long-nanos"), (asNtz, "ntz"), (asTz, "tz"))) {
      val got = df.select(Tables.epochMicros(df, "ts").as("us")).as[Long].head()
      assert(got == instantUs, s"$enc: expected $instantUs, got $got")
    }
  }

  test("tsLiteral compares correctly against each encoding (strict boundaries)") {
    // three instants: below, at, above the literal
    val us = Seq(instantUs - 1, instantUs, instantUs + 1)
    val asNanos = us.map(_ * 1000L).toDF("ts")
    val asNtz = spark.sql(s"SELECT timestampadd(MICROSECOND, us, TIMESTAMP_NTZ '1970-01-01 00:00:00') AS ts " +
      s"FROM (SELECT explode(array(${us.mkString(",")})) AS us)")
    val asTz = spark.sql(s"SELECT timestampadd(MICROSECOND, us, TIMESTAMP '1970-01-01 00:00:00Z') AS ts " +
      s"FROM (SELECT explode(array(${us.mkString(",")})) AS us)")
    for ((df, enc) <- Seq((asNanos, "long-nanos"), (asNtz, "ntz"), (asTz, "tz"))) {
      val atLeast = df.filter(col("ts") >= Tables.tsLiteral(df, "ts", instantUs)).count()
      val below = df.filter(col("ts") < Tables.tsLiteral(df, "ts", instantUs)).count()
      assert(atLeast == 2 && below == 1,
        s"$enc: boundary semantics wrong (>=: $atLeast, <: $below)")
    }
  }

  test("a non-timestamp column is rejected loudly") {
    val df = Seq("x").toDF("ts")
    val e1 = intercept[IllegalArgumentException](Tables.epochMicros(df, "ts"))
    val e2 = intercept[IllegalArgumentException](Tables.tsLiteral(df, "ts", 0L))
    assert(e1.getMessage.contains("timestamp-encoded") &&
      e2.getMessage.contains("timestamp-encoded"))
  }
}
