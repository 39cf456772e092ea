package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Per-source quota over an UNBOUNDED stream — the streaming twin of
  * [[graft.operators.Curation.sourceQuota]] (the C4/RefinedWeb-family
  * per-domain cap), for the continuous-ingest half of the lambda pairing
  * the other streaming curation stages follow.
  *
  * Semantics: after any prefix of the stream, the kept set per source is
  * EXACTLY `Curation.sourceQuota` of the rows seen so far — each trigger
  * emits the source's refreshed kept set (Update mode). A document
  * admitted in one trigger can be DISPLACED in a later one when
  * better-scoring rows arrive — quota re-entry. Sink-key contract: key
  * the materialized view by (source, qrank) — each trigger's ≤ quota
  * rows then overwrite every rank, so a displaced document vanishes
  * from the view by being overwritten at its old rank. A sink keyed by
  * (source, doc_id) RETAINS displaced rows with stale qranks forever
  * (an upsert never deletes); consumers of such a sink must take only
  * the latest emission per source, or prefer the (source, qrank) key.
  *
  * State shape: ONE packed `Array[Long]` per source — the
  * [[graft.functions.BoundedTopN]] buffer, ≤ `maxPerSource` (score, id)
  * pairs in rank order, reduced with the SAME insertion/merge code as
  * the batch aggregator, so batch and stream cannot disagree on
  * tie-breaks (score DESC, id ASC). O(quota) state per key forever; no
  * timeout — a domain's cap never expires. Arrival-order independent by
  * the aggregator's determinism argument: any interleaving of rows
  * across triggers converges to the same final buffer.
  *
  * Contract (inherited verbatim from the batch operator, one definition
  * of the check): `score` must be an INTEGRAL column — a fractional
  * score would be silently truncated by the (Long, Long) state encoding
  * — and rows with a null score or null doc_id are dropped.
  *
  * Output: (source, doc_id, qrank), qrank 1..maxPerSource in preference
  * order, refreshed per trigger for every source with new arrivals.
  */
object StreamingSourceQuota {

  final case class Kept(source: String, doc_id: Long, qrank: Int)

  /** `docs`: a streaming frame with (source: String, doc_id: Long,
    * score: integral). Run the query in Update output mode.
    */
  def quota(docs: DataFrame, maxPerSource: Int): Dataset[Kept] = {
    graft.operators.Curation.requireIntegralScore(docs, col("score"))
    val spark = docs.sparkSession
    import spark.implicits._
    val agg = new graft.functions.BoundedTopN(maxPerSource)
    docs
      .filter(col("score").isNotNull && col("doc_id").isNotNull)
      .select(col("source").cast("string").as("source"),
        col("doc_id").cast("long").as("doc_id"),
        col("score").cast("long").as("score"))
      .as[(String, Long, Long)]
      .groupByKey(_._1)
      .flatMapGroupsWithState[Array[Long], Kept](
        OutputMode.Update, GroupStateTimeout.NoTimeout) {
        (source, rows, state: GroupState[Array[Long]]) =>
          var buf = state.getOption.getOrElse(agg.zero)
          rows.foreach { case (_, docId, score) =>
            buf = agg.reduce(buf, (score, docId))
          }
          state.update(buf)
          val k = buf.length >> 1
          (0 until k).iterator.map(i => Kept(source, buf(2 * i + 1), i + 1))
      }
  }
}
