package graft.operators

import graft.rules.{DispatchRule, TxDispatchRules}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Batch twin of the transaction stream for the verify/bench harness
  * (SURVEY.md §7.1): each row of the `events` table plays the role of one
  * Cosmos transaction. `props` (a JSON document) is the open payload — the
  * JsonPath rules' target — and `event_type` plays the `Any` `@type`
  * discriminator (reference: rules_example.yaml:5 matches on `@type`).
  *
  * The canonical document mirrors the reference's proto-JSON shape
  * (`$.body.messages[...]` — TopologyProducer.kt:79–82):
  * {{{
  *   {"eventId":N,"body":{"messages":[{"@type":"<event_type>","k":K,"userId":U}]}}
  * }}}
  * Only integer and JSON-safe string fields are embedded so an ANSI-SQL
  * oracle can rebuild the document character-for-character.
  *
  * "Decode failure" for this twin = `props` is not a valid JSON document
  * (the analogue of an undecodable protobuf payload, TopologyTest.kt:69).
  */
object EventsTx {

  def load(spark: SparkSession, sfDir: String): DataFrame =
    graft.sources.Tables.load(spark, sfDir, "events")

  /** Add `raw` (original bytes) + `txJson` (canonical doc; null ⇒ decode
    * failure), the TxDispatchPipeline input contract.
    *
    * The document is built by the one-parse
    * [[graft.functions.EventsTxJson]] codegen expression; the built-in
    * spelling (`get_json_object($)` validity + `get_json_object($.k)`
    * extraction + `concat`) parses `props` twice per row and sits under
    * every dispatch-family query. EventsTxJsonSpec pins the two spellings
    * equal on the full edge-case matrix.
    */
  def withTxJson(events: DataFrame): DataFrame =
    events
      .withColumn("raw", encode(col("props"), "UTF-8"))
      .withColumn("txJson", graft.functions.EventsTxJson.events_tx_json(
        col("props"), col("event_id"), col("event_type"), col("user_id")))

  /** The harness rule set, mirroring the reference's rules_example.yaml onto
    * the events doc: a type-discriminator rule, a deep-scan numeric-filter
    * rule, and the never-matching definite path (rule-error isolation).
    */
  val rules: TxDispatchRules = TxDispatchRules(Seq(
    DispatchRule("message-type-purchase", "topic-1",
      "$.body.messages[?(@.@type == 'purchase')]"),
    DispatchRule("k-above-50", "topic-2",
      "$..messages[?(@.k > 50)]"),
    DispatchRule("nop-rule", "topic-3", "$.nop")))

  /** Full routed output over a scale-factor dir. */
  def routed(spark: SparkSession, sfDir: String): DataFrame =
    TxDispatchPipeline(withTxJson(load(spark, sfDir)), rules)

  /** SQL fragments the DuckDB oracle uses to mirror the pipeline exactly. */
  object oracle {
    /** events.props parsed k (BIGINT) — NULL when missing. */
    val kSql = "TRY_CAST(json_extract_string(props, '$.k') AS BIGINT)"
    /** decodable = props is parseable JSON. */
    val decodableSql = "(props IS NOT NULL AND json_valid(props))"
    /** rule-1 match (type discriminator). */
    val r1Sql = s"$decodableSql AND event_type = 'purchase'"
    /** rule-2 match (deep-scan numeric filter). */
    val r2Sql = s"$decodableSql AND $kSql > 50"
    /** the canonical doc rebuilt character-for-character. */
    val txJsonSql =
      "('{\"eventId\":' || event_id || ',\"body\":{\"messages\":[{\"@type\":\"' || event_type || '\"' || " +
        s"CASE WHEN $kSql IS NULL THEN '' ELSE ',\"k\":' || $kSql END || " +
        "',\"userId\":' || user_id || '}]}}')"
  }
}
