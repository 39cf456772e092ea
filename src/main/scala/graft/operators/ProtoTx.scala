package graft.operators

import graft.functions.ProtoFunctions.decode_tx
import graft.rules.TxDispatchRules
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Protobuf-native face of the dispatch engine: the real reference
  * pipeline shape — raw Cosmos tx bytes in, routed records out
  * (reference: the full topology, TopologyProducer.kt:84–202).
  *
  * Input contract: a DataFrame with `raw: Binary` (+ passthrough columns).
  * `decoded` adds the P1/P2/X3 products in one expression pass; `routed`
  * completes the P3/P4 routing and the F/X disposition stages with
  * [[TxDispatchPipeline]], emitting the re-encoded canonical bytes on rule
  * topics (X3 semantics) rather than the original input bytes.
  */
object ProtoTx {

  /** P1+P2+X3: total decode with error capture, canonical JSON, canonical
    * re-encoding — single narrow projection.
    */
  def decoded(df: DataFrame): DataFrame =
    df.withColumn("_dec", decode_tx(col("raw")))
      .withColumn("txJson", col("_dec.txJson"))
      .withColumn("reencoded", col("_dec.reencoded"))
      .withColumn("decodeError", col("_dec.error"))
      .withColumn("msgCount", col("_dec.msgCount"))
      .withColumn("msgTypeUrls", col("_dec.msgTypeUrls"))
      .drop("_dec")

  /** Full dispatch over protobuf transactions. */
  def routed(
      df: DataFrame,
      rules: TxDispatchRules,
      dlqTopic: String = "dlq",
      errorTopic: Option[String] = Some("error")): DataFrame =
    TxDispatchPipeline(decoded(df), rules, dlqTopic, errorTopic,
      reEncoded = Some(col("reencoded")))
}
