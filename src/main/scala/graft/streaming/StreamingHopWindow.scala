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
  * [[aggregate]] omits `n_users` (the batch query's countDistinct):
  * exact distinct over an unbounded stream needs a dedup stage, not an
  * aggregate function. [[aggregateWithUsers]] is that composition —
  * the dedup-before-agg pattern expressed as two CHAINED stateful
  * aggregations (supported since Spark 3.5's multiple-stateful-operator
  * work): level 1 collapses to one row per (window, type, user) — the
  * watermark-evicted dedup — and level 2 re-aggregates those rows per
  * (window, type), so `n_users` is a plain `count(*)` and the other
  * aggregates merge losslessly from per-user partials.
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

  /** Full batch-parity aggregate including exact `n_users`, via two
    * chained stateful window aggregations. Level-1 state is
    * open-windows × active-users-per-window — the irreducible cost of
    * EXACT distinct (any exact counter must remember which users it has
    * seen per open window); the watermark still bounds it to open
    * windows only, and it is O(1) bytes per (window, user), never
    * proportional to event count. Corpora where approximate distinct
    * suffices should use [[aggregateApproxUsers]] instead and skip the
    * per-user state entirely.
    *
    * Level 2 groups directly on the level-1 `window` struct — Spark
    * propagates the event-time watermark through the window column, so
    * both operators finalize on the same watermark and emit together in
    * append mode.
    */
  /** The approximate twin of [[aggregateWithUsers]]: `n_users` as a
    * HyperLogLog++ estimate (`approx_count_distinct`) folded into the
    * SINGLE windowed aggregation, so per-(window, type) state is one
    * constant-size sketch regardless of how many users a window sees —
    * the spelling for corpora where the per-user level-1 state of the
    * exact variant is the dominant cost and ±`rsd` relative error is
    * acceptable. Same output schema as the exact twin.
    */
  def aggregateApproxUsers(events: Dataset[Evt], sizeUs: Long, hopUs: Long,
      watermarkDelay: String = "0 microseconds", rsd: Double = 0.05): DataFrame = {
    events
      .withColumn("ets", timestamp_micros(col("tus")))
      .withWatermark("ets", watermarkDelay)
      .groupBy(
        window(col("ets"), s"$sizeUs microseconds", s"$hopUs microseconds"),
        col("eventType"))
      .agg(count(lit(1)).as("n_events"),
        approx_count_distinct(col("userId"), rsd).as("n_users"),
        min(col("eventId")).as("min_event_id"),
        max(col("eventId")).as("max_event_id"))
      .select(unix_micros(col("window.start")).as("window_start_us"),
        col("eventType").as("event_type"),
        col("n_events"), col("n_users"),
        col("min_event_id"), col("max_event_id"))
  }

  def aggregateWithUsers(events: Dataset[Evt], sizeUs: Long, hopUs: Long,
      watermarkDelay: String = "0 microseconds"): DataFrame = {
    events
      .withColumn("ets", timestamp_micros(col("tus")))
      .withWatermark("ets", watermarkDelay)
      .groupBy(
        window(col("ets"), s"$sizeUs microseconds", s"$hopUs microseconds"),
        col("eventType"), col("userId"))
      // per-(window,type,user) partials: the streaming dedup stage.
      // count/min/max merge losslessly into the level-2 aggregates.
      .agg(count(lit(1)).as("u_events"),
        min(col("eventId")).as("u_min"),
        max(col("eventId")).as("u_max"))
      .groupBy(col("window"), col("eventType"))
      .agg(sum(col("u_events")).as("n_events"),
        count(lit(1)).as("n_users"),
        min(col("u_min")).as("min_event_id"),
        max(col("u_max")).as("max_event_id"))
      .select(unix_micros(col("window.start")).as("window_start_us"),
        col("eventType").as("event_type"),
        col("n_events"), col("n_users"),
        col("min_event_id"), col("max_event_id"))
  }
}
