package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Per-key event rate cap over an UNBOUNDED stream — the streaming twin
  * of [[graft.operators.Temporal.eventRateCap]] (the ingestion throttle:
  * at most `maxPerWindow` EARLIEST events per (user, epoch-aligned
  * window)), and the event-time sibling of [[StreamingSourceQuota]].
  *
  * Semantics: after any trigger, the kept set per (user, window) is
  * exactly the batch operator over the rows seen so far (Update mode —
  * each trigger emits the refreshed set for windows with arrivals; an
  * event admitted early can be displaced when an EARLIER event arrives
  * late but inside the watermark). Sink-key contract as
  * [[StreamingSourceQuota]]: key the view by (user_id, window_start_us,
  * qrank).
  *
  * State lifecycle — the difference from the source quota, whose keys
  * live forever: a (user, window) key is DONE once the event-time
  * watermark passes the window end, so its state carries an event-time
  * timeout at window end and is REMOVED when the watermark crosses it —
  * total state is O(cap · users · open windows), independent of stream
  * length. A straggler arriving past its window's eviction must not
  * resurrect a partial kept set: rows for a window already behind the
  * watermark are dropped at the state function (one-sided, exactly like
  * the upstream watermark contract that already allows dropping them).
  *
  * State shape per key: the packed [[graft.functions.BoundedTopN]]
  * buffer with score = −tus (earliest first, ties to the smaller
  * event_id) — the SAME insertion code as the batch aggregator, so
  * batch and stream cannot disagree on tie-breaks, and exact (score,
  * id) redeliveries dedup in reduce (at-least-once safe).
  *
  * `events` must be a streaming frame with (user_id, event_id, and a
  * TimestampType `eventTime` column); event time converts to epoch-µs
  * via `unix_micros` — instant-based, session-TZ independent.
  *
  * Output: (user_id, window_start_us, event_id, qrank), qrank
  * 1..maxPerWindow in arrival order. Run in Update output mode.
  */
object StreamingEventRateCap {

  final case class KeptEvent(user_id: Long, window_start_us: Long,
    event_id: Long, qrank: Int)

  def rateCap(events: DataFrame, eventTime: String, watermarkDelay: String,
      maxPerWindow: Int, windowUs: Long): Dataset[KeptEvent] = {
    require(windowUs > 0, s"windowUs must be positive, got $windowUs")
    val spark = events.sparkSession
    import spark.implicits._
    val agg = new graft.functions.BoundedTopN(maxPerWindow)
    events
      .withWatermark(eventTime, watermarkDelay)
      // the watermarked TIMESTAMP column must survive the projection —
      // event-time timeout requires a watermark attribute flowing into
      // the stateful operator, not just upstream of it
      .select(col("user_id").cast("long").as("user_id"),
        col("event_id").cast("long").as("event_id"),
        unix_micros(col(eventTime)).as("tus"),
        col(eventTime).as("_wm_ts"))
      .withColumn("ws", col("tus") - pmod(col("tus"), lit(windowUs)))
      .select(col("user_id"), col("event_id"), col("tus"), col("ws"), col("_wm_ts"))
      .as[(Long, Long, Long, Long, java.sql.Timestamp)]
      .groupByKey(r => (r._1, r._4))
      .flatMapGroupsWithState[Array[Long], KeptEvent](
        OutputMode.Update, GroupStateTimeout.EventTimeTimeout) {
        case ((user, ws), rows, state: GroupState[Array[Long]]) =>
          val endMs = (ws + windowUs) / 1000L
          if (state.hasTimedOut) {
            // watermark passed the window end: the kept set emitted in
            // earlier triggers is final — drop the state, emit nothing
            state.remove()
            Iterator.empty
          } else if (!state.exists &&
              state.getCurrentWatermarkMs() >= endMs) {
            // straggler for an already-evicted window — must not
            // resurrect a partial kept set
            Iterator.empty
          } else {
            var buf = state.getOption.getOrElse(agg.zero)
            rows.foreach { case (_, eid, tus, _, _) =>
              buf = agg.reduce(buf, (-tus, eid))
            }
            state.update(buf)
            // fire once the watermark crosses the window end (the API
            // requires a timestamp strictly beyond the current watermark)
            state.setTimeoutTimestamp(
              math.max(endMs, state.getCurrentWatermarkMs() + 1L))
            val k = buf.length >> 1
            (0 until k).iterator.map(i =>
              KeptEvent(user, ws, buf(2 * i + 1), i + 1))
          }
      }
  }
}
