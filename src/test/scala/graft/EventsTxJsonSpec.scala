package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class EventsTxJsonSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  /** The pre-fusion built-in spelling as the semantic reference: two
    * get_json_object parses + concat null propagation. The k cast is
    * try_cast, matching the DuckDB oracle's TRY_CAST — the historical
    * plain .cast("long") THROWS under Spark 4's default ANSI mode on a
    * textual non-numeric k, i.e. the fused expression's null-on-malformed
    * is the oracle's semantics, and the old spelling was fragile on
    * adversarial payloads.
    */
  private def referenceTxJson = {
    val k = expr("try_cast(get_json_object(props, '$.k') AS bigint)")
    val decodable = col("props").isNotNull && get_json_object(col("props"), "$").isNotNull
    val doc = concat(
      lit("{\"eventId\":"), col("event_id"),
      lit(",\"body\":{\"messages\":[{\"@type\":\""), col("event_type"), lit("\""),
      when(k.isNull, lit("")).otherwise(concat(lit(",\"k\":"), k)),
      lit(",\"userId\":"), col("user_id"),
      lit("}]}}"))
    when(decodable, doc).otherwise(lit(null).cast("string"))
  }

  val edgeProps: Seq[String] = Seq(
    """{"k":7}""",                  // plain integral
    """{"k":-3}""",                 // negative
    """{"k":0}""",
    """{"k":9223372036854775807}""", // Long.MaxValue
    """{"k":92233720368547758080}""", // overflow -> omitted
    """{"k":1.5}""",                // non-integral -> omitted
    """{"k":2.0}""",                // double-typed integral -> omitted (cast of "2.0" fails)
    """{"k":"12"}""",               // textual long -> embedded
    """{"k":" 34 "}""",             // textual with spaces -> embedded (cast trims)
    """{"k":"+56"}""",              // signed textual
    """{"k":"1.5"}""",              // textual non-long -> omitted
    """{"k":"abc"}""",              // textual garbage -> omitted
    """{"k":null}""",               // JSON null -> omitted
    """{"k":true}""",               // boolean -> omitted
    """{"k":{"x":1}}""",            // object -> omitted
    """{"k":[1]}""",                // array -> omitted
    """{"j":5}""",                  // missing k
    """{}""",
    """[1,2,3]""",                  // array root: no $.k
    """not json at all""",          // undecodable
    """{"k":5""",                   // truncated -> undecodable
    "",                             // empty -> undecodable
    null)                           // null props -> null doc

  test("fused expression ≡ the two-parse built-in spelling on the edge matrix") {
    val rows = edgeProps.zipWithIndex.map { case (p, i) =>
      (i.toLong, 100L + i, "purchase", p)
    } ++ Seq(
      (900L, 901L, null, """{"k":1}"""), // null event_type -> concat null
      (910L, 911L, "click", """{"k":1}"""))
    val df = rows.toDF("event_id", "user_id", "event_type", "props")
    val both = df.select(
      col("event_id"),
      referenceTxJson.as("want"),
      graft.functions.EventsTxJson.events_tx_json(
        col("props"), col("event_id"), col("event_type"), col("user_id")).as("got"))
    val mismatches = both.filter(
      !(col("want") <=> col("got"))).collect()
    assert(mismatches.isEmpty,
      mismatches.map(r => s"${r.get(0)}: want=${r.get(1)} got=${r.get(2)}").mkString("\n"))
  }

  test("fused expression ≡ built-in spelling over the events table (sf0.001)") {
    val ev = graft.operators.EventsTx.load(spark, "/root/testdata/sf0.001")
    val both = ev.select(
      referenceTxJson.as("want"),
      graft.functions.EventsTxJson.events_tx_json(
        col("props"), col("event_id"), col("event_type"), col("user_id")).as("got"))
    assert(both.filter(!(col("want") <=> col("got"))).count() == 0)
    // at sf0.001 every props row happens to parse — the null side of the
    // split is pinned by the edge matrix above, not by table data
    assert(both.filter(col("got").isNotNull).count() > 0)
  }
}
