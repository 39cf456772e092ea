package graft

import graft.operators.TxDispatchPipeline
import graft.rules.{DispatchRule, TxDispatchRules}
import graft.sources.Readers
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

/** Source formats feeding the same dispatch core: a JSON-lines corpus
  * drop routed end-to-end, and a CSV read with explicit schema.
  */
class ReadersSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark

  test("JSON-lines corpus routes through the pipeline") {
    val dir = java.nio.file.Files.createTempDirectory("jsonl").toString
    java.nio.file.Files.writeString(java.nio.file.Paths.get(s"$dir/txs.jsonl"),
      Seq(
        """{"key":"a","body":{"messages":[{"@type":"T1","k":5}]}}""",
        """{"key":"b","body":{"messages":[{"@type":"T2","k":99}]}}""",
        """{"key":"c","body":{}}""").mkString("\n"))
    val rules = TxDispatchRules(Seq(
      DispatchRule("t1", "topic-1", "$.body.messages[?(@.@type == 'T1')]"),
      DispatchRule("big-k", "topic-2", "$..messages[?(@.k > 50)]")))
    // JSON-lines: keep the raw line as the routing document
    val raw = spark.read.text(s"$dir/txs.jsonl")
      .select(
        get_json_object(col("value"), "$.key").as("key"),
        encode(col("value"), "UTF-8").as("raw"),
        col("value").as("txJson"))
    val out = TxDispatchPipeline(raw, rules)
      .select(col("key"), col("topic"))
      .collect().map(r => (r.getString(0), r.getString(1))).toSet
    assert(out == Set(("a", "topic-1"), ("b", "topic-2"), ("c", "dlq")))
    // and the structured reader parses the same drop relationally
    val structured = Readers.jsonl(spark, s"$dir/txs.jsonl")
    assert(structured.count() == 3 && structured.columns.contains("body"))
  }

  test("CSV with explicit schema (no inference pass)") {
    val dir = java.nio.file.Files.createTempDirectory("csv").toString
    java.nio.file.Files.writeString(java.nio.file.Paths.get(s"$dir/docs.csv"),
      "doc_id,text\n1,hello world\n2,spark engine\n")
    val schema = StructType(Seq(
      StructField("doc_id", LongType), StructField("text", StringType)))
    val df = Readers.csv(spark, s"$dir/docs.csv", Some(schema))
    assert(df.schema == schema)
    assert(df.count() == 2)
  }
}
