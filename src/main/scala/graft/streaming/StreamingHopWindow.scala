package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._

/** Hopping event-time window aggregation over an unbounded stream — the
  * streaming face of batch `q_hop_window` (M5Queries): Spark's native
  * `window()` generates the size/hop containing windows (the same
  * bounded explode the batch plan pins), incremental state holds one
  * partial aggregate per open (window, event_type) group, and the
  * event-time watermark bounds that state — windows whose end falls
  * behind the watermark finalize, emit (append mode), and are evicted.
  * State footprint is open-windows × |event_type| — independent of row
  * count, the property that makes this runnable forever at 100 TB/day.
  *
  * `n_users` (the batch query's countDistinct) is deliberately absent:
  * exact distinct over an unbounded stream is the dedup-before-agg
  * pattern ([[StreamingDedup]] upstream of this), a second stateful
  * operator rather than an aggregate function.
  */
object StreamingHopWindow {

  /** One event; `tus` is exact epoch-µs event time (from
    * [[graft.sources.Tables.epochMicros]]).
    */
  case class Evt(eventId: Long, eventType: String, userId: Long, tus: Long)

  /** Windowed counts and event-id extrema per (window, event_type).
    * Output columns mirror the batch query: `window_start_us` is exact
    * epoch µs of the window's inclusive start; windows are [start,
    * start + sizeUs), epoch-aligned on hopUs like the batch bucketing.
    */
  def aggregate(events: Dataset[Evt], sizeUs: Long, hopUs: Long,
      watermarkDelay: String = "0 microseconds"): DataFrame = {
    events
      .withColumn("ets", timestamp_micros(col("tus")))
      .withWatermark("ets", watermarkDelay)
      .groupBy(
        window(col("ets"), s"$sizeUs microseconds", s"$hopUs microseconds"),
        col("eventType"))
      .agg(count(lit(1)).as("n_events"),
        min(col("eventId")).as("min_event_id"),
        max(col("eventId")).as("max_event_id"))
      .select(unix_micros(col("window.start")).as("window_start_us"),
        col("eventType").as("event_type"),
        col("n_events"), col("min_event_id"), col("max_event_id"))
  }
}
