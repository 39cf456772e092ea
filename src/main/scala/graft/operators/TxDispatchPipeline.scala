package graft.operators

import graft.functions.JsonPathFunctions.json_path_routes
import graft.rules.{TxDispatchRules}
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** The routing core: one narrow Catalyst plan implementing the reference's
  * whole topology (reference: TopologyProducer.kt:84–202).
  *
  * Input contract: a DataFrame with
  *   - `txJson: String`  — the transaction's canonical JSON document (null
  *                         or unparseable ⇒ decode failure);
  *   - `raw: Binary`     — the original input bytes (error-topic payload,
  *                         reference: TopologyProducer.kt:122);
  *   - any passthrough columns (key, ids, …) — untouched, like the
  *     reference's key pass-through.
  *
  * Output: input columns plus
  *   - `route: Int`   — matched rule index, or ERROR(-1) / UNFILTERED(-2)
  *                      (reference sentinels: TopologyProducer.kt:26–29);
  *     a row matching k rules appears k times (multicast explode —
  *     TopologyProducer.kt:97–105, TopologyTest.kt:91);
  *   - `topic: String` — destination topic (per-row dynamic routing replaces
  *                       the reference's N physical branches,
  *                       TopologyProducer.kt:106–199);
  *   - `value: Binary` — the disposition payload (reference §2.6):
  *       ERROR      → original `raw` bytes         (TopologyProducer.kt:122)
  *       rule match → re-encoded transaction bytes (TopologyProducer.kt:155–159)
  *       UNFILTERED → DLQ JSON envelope as UTF-8   (TopologyProducer.kt:186–195)
  *
  * The plan is entirely narrow (project + generate + filter): no shuffle, no
  * state — parity with the reference's stateless, repartition-free topology.
  * At 100 TB this runs as a pure map-side pipeline: throughput scales
  * linearly with executors and the only data movement is source → sink.
  */
object TxDispatchPipeline {

  import TxDispatchRules.{ERROR, UNFILTERED}

  /** @param rules       declaration-ordered dispatch rules
    * @param dlqTopic    destination for transactions matching no rule
    * @param errorTopic  destination for undecodable inputs; None ⇒ errored
    *                    rows are dropped (reference: branch without `to()`
    *                    when `topic.error` is unset, TopologyProducer.kt:123–131)
    * @param reEncoded   optional column producing the rule-topic payload
    *                    (re-encoded tx bytes, reference X3); defaults to the
    *                    UTF-8 bytes of `txJson` for JSON-native inputs
    */
  def apply(
      df: DataFrame,
      rules: TxDispatchRules,
      dlqTopic: String = "dlq",
      errorTopic: Option[String] = Some("error"),
      reEncoded: Option[Column] = None): DataFrame = {

    val routed = withRoutes(df, rules)

    val topicFor: Column = {
      // rule-index → topic lookup as a literal map: plan-shape-from-config,
      // exactly as the reference builds one branch per configured rule
      // (TopologyProducer.kt:134–139).
      val pairs = rules.rules.zipWithIndex.flatMap { case (r, i) => Seq(lit(i), lit(r.topic)) }
      val ruleTopic = element_at(map(pairs: _*), col("route"))
      when(col("route") === ERROR, errorTopic.map(lit(_)).getOrElse(lit(null)))
        .when(col("route") === UNFILTERED, lit(dlqTopic))
        .otherwise(ruleTopic)
    }

    val ruleValue = reEncoded.getOrElse(encode(col("txJson"), "UTF-8"))

    // DLQ envelope txBytes: the reference serializes the DECODED canonical
    // transaction (DLQ(txBytes = tx.toByteArray()), TopologyProducer.kt:186–195),
    // so the proto path passes the re-encoded bytes; the JSON-twin path has
    // no re-encoding and keeps the original bytes.
    val dlqBytes = reEncoded.getOrElse(col("raw"))

    val valueFor: Column =
      when(col("route") === ERROR, col("raw"))
        .when(col("route") === UNFILTERED, encode(dlqEnvelope(col("txJson"), dlqBytes), "UTF-8"))
        .otherwise(ruleValue)

    // Unset error topic ⇒ topic stays NULL on error rows; the SINKS drop
    // null-topic rows (DispatchStream.toKafka / writePartitionedByTopic),
    // so observability (observe metrics) still sees the consumed errors —
    // the reference's consumed-but-not-produced branch with its peek log.
    routed
      .withColumn("topic", topicFor)
      .withColumn("value", valueFor)
  }

  /** Batch sink twin of the dynamic-topic Kafka writer (§2.7): routed
    * records land as parquet partitioned by destination topic — one
    * directory per topic, consumable independently, with partition pruning
    * on read. The natural shape for replaying a routed corpus at rest.
    */
  def writePartitionedByTopic(routed: DataFrame, path: String): Unit =
    routed
      .filter(col("topic").isNotNull)
      .write
      .partitionBy("topic")
      .mode("overwrite")
      .parquet(path)

  /** Just the route derivation + multicast explode (reference P3+P4):
    * adds `route: Int`, duplicating each row once per matching rule.
    */
  def withRoutes(df: DataFrame, rules: TxDispatchRules): DataFrame = {
    // Sentinels are folded INTO the expression (undecodable ⇒ [ERROR], no
    // match ⇒ [UNFILTERED]) so the per-row JSON parse + rule evaluation
    // happens exactly once — a CASE around the expression would be
    // re-evaluated per textual occurrence by the interpreted Generate.
    val routes = graft.functions.JsonPathFunctions.json_path_routes_dispositioned(
      col("txJson"), rules.rules.map(_.predicate), ERROR, UNFILTERED)
    df.withColumn("route", explode(routes))
  }

  /** The DLQ envelope JSON string:
    * `{"txJson":<json-or-null>,"txBytes":<base64-or-null>,"message":null}`
    * (reference: DLQ data class + Jackson rendering,
    * TopologyProducer.kt:32–41,186–195; golden TopologyTest.kt:147–154 —
    * Jackson writes all three fields, null included, and renders ByteArray
    * as base64).
    *
    * Built by explicit concatenation (not `to_json`) because Jackson keeps
    * null fields while Spark's `to_json` drops them; concatenation also
    * gives the oracle-side SQL an exact character-for-character twin.
    */
  def dlqEnvelope(txJson: Column, raw: Column): Column =
    concat(
      lit("{\"txJson\":"),
      when(txJson.isNull, lit("null")).otherwise(jsonQuote(txJson)),
      lit(",\"txBytes\":"),
      when(raw.isNull, lit("null")).otherwise(concat(lit("\""), base64(raw), lit("\""))),
      lit(",\"message\":null}"))

  /** Quote a string as a JSON string literal. The payload here is itself a
    * canonical JSON document (no control characters), so escaping backslash
    * and quote suffices.
    */
  private def jsonQuote(c: Column): Column =
    concat(
      lit("\""),
      regexp_replace(regexp_replace(c, lit("\\\\"), lit("\\\\\\\\")), lit("\""), lit("\\\\\"")),
      lit("\""))
}
