package graft.streaming

import graft.operators.Similarity
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.streaming.StreamingQuery

/** Continuous IVF-PQ index growth: each micro-batch of arriving
  * embeddings is appended to a [[Similarity.writeIvfPqIndex]] directory
  * under the index's FROZEN codebooks — the always-on spelling of the
  * grow-without-retrain loop ([[Similarity.appendIvfPqIndex]]), the
  * vector-corpus sibling of [[StreamingIncrementalDedup]]'s
  * storage-backed-state design: a billion-vector index belongs in a
  * bucket-partitioned table, not the state store.
  *
  * Exactly-once without a transactional sink, inherited from the batch
  * operator's contract: each micro-batch lands as its own `batch`
  * partition value via DYNAMIC partition overwrite, so a replayed batch
  * (foreachBatch redelivers after failure) replaces exactly its own
  * (bucket, batch) partitions — never batch 0 or other appends
  * (IvfPqIndexSpec pins the torn-batch replay; the streaming spec pins
  * the stream ≡ one-shot-append ≡ rebuild chain).
  *
  * When to stop appending and retrain is a MEASURED call — run
  * [[Similarity.maintainIvfPqIndex]] (drift report → threshold →
  * in-place retrain, decision returned as data) BETWEEN ingest epochs,
  * with the stream stopped: retrain is an offline single-writer
  * operation, and consolidation to batch 0 would turn a replayed
  * pre-retrain micro-batch into duplicate rows — the replay-idempotence
  * guarantee above holds only while the batch partitions it keys on
  * still exist. Stop → maintain → restart with `firstBatch` past the
  * retrain point is the supported loop.
  *
  * `firstBatch` offsets the streaming batch ids past any batches already
  * appended by earlier (batch or streaming) ingests: streaming batch N
  * writes partition `batch = firstBatch + N`. The caller owns keeping
  * distinct ingest epochs on distinct ranges, same as any partitioned
  * append pipeline.
  */
object StreamingIndexIngest {

  /** Start the continuous query over a streaming embeddings frame
    * (vec_id, embedding — [[Similarity.embeddings]]' shape).
    */
  def start(newEmbs: DataFrame, indexDir: String, checkpointDir: String,
      firstBatch: Long = 1L, m: Int = 8,
      trigger: Option[org.apache.spark.sql.streaming.Trigger] = None): StreamingQuery = {
    require(firstBatch >= 1, s"batch 0 is the base build; appends start at 1 (got $firstBatch)")
    val w = newEmbs.writeStream
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (batch: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row], batchId: Long) =>
        // an empty redelivery must not pay the codebook read
        if (!batch.isEmpty)
          Similarity.appendIvfPqIndex(batch.toDF(), indexDir, firstBatch + batchId, m)
      }
    // None = run forever (production); AvailableNow for bounded replays
    // (the oracle gate / backfill epochs) so the query drains and stops
    trigger.fold(w)(w.trigger).start()
  }
}
