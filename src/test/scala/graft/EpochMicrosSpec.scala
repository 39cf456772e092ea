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

  test("testdata parquet footers carry a timestamp annotation the adapter reads correctly") {
    // The adapter cannot distinguish LONG encodings: a LongType column is
    // ASSUMED to be nanoseconds (the nanosAsLong read of INT64
    // TIMESTAMP(NANOS)). A driver regen to plain epoch-micros or -millis
    // longs would be silently misread by 1000x — so this test goes to
    // the PHYSICAL footers of the actual testdata and fails loudly on
    // any encoding outside the two the adapter handles: INT64 annotated
    // TIMESTAMP(NANOS), or TIMESTAMP(MICROS)/(MILLIS is also rejected —
    // the oracle's epoch_us math assumes µs precision survives).
    import org.apache.parquet.hadoop.ParquetFileReader
    import org.apache.parquet.hadoop.util.HadoopInputFile
    import org.apache.parquet.schema.LogicalTypeAnnotation
    import org.apache.parquet.schema.LogicalTypeAnnotation.TimeUnit
    val conf = spark.sparkContext.hadoopConfiguration
    val cases = Seq(("events", "ts"), ("orders", "o_orderdate"), ("lineitem", "l_shipdate"))
    val sfDirs = new java.io.File("/root/testdata").listFiles()
      .filter(f => f.isDirectory && f.getName.startsWith("sf")).map(_.getPath)
    assert(sfDirs.nonEmpty, "no testdata sf dirs found")
    for (dir <- sfDirs; (table, colName) <- cases) {
      val p = new java.io.File(s"$dir/$table.parquet")
      val file = if (p.isFile) p else p.listFiles()
        .find(_.getName.endsWith(".parquet"))
        .getOrElse(fail(s"no parquet file under $p"))
      val reader = ParquetFileReader.open(
        HadoopInputFile.fromPath(new org.apache.hadoop.fs.Path(file.getPath), conf))
      try {
        val schema = reader.getFooter.getFileMetaData.getSchema
        val prim = schema.getType(Seq(colName): _*).asPrimitiveType()
        prim.getLogicalTypeAnnotation match {
          case ts: LogicalTypeAnnotation.TimestampLogicalTypeAnnotation =>
            val unit = ts.getUnit
            assert(unit == TimeUnit.NANOS || unit == TimeUnit.MICROS,
              s"$dir/$table.$colName: TIMESTAMP($unit) — the adapter only handles " +
                "NANOS (long-nanos read) and MICROS; a MILLIS regen would lose precision silently")
            // cross-check: the unit must agree with the type Spark surfaces,
            // i.e. the branch epochMicros will actually take
            val df = Tables.load(spark, dir, table)
            val surfaced = df.schema(colName).dataType
            if (unit == TimeUnit.NANOS)
              assert(surfaced == org.apache.spark.sql.types.LongType,
                s"$dir/$table.$colName: footer NANOS but Spark surfaced $surfaced")
            else
              assert(surfaced != org.apache.spark.sql.types.LongType,
                s"$dir/$table.$colName: footer MICROS but Spark surfaced LongType — " +
                  "the adapter would divide epoch-micros by 1000")
          case other => fail(
            s"$dir/$table.$colName: physical ${prim.getPrimitiveTypeName} with logical " +
              s"annotation $other — a plain INT64 here would be misread as nanoseconds; " +
              "the driver regen changed encodings, extend Tables.epochMicros first")
        }
      } finally reader.close()
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
