package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Sessionization over the `events` stream table: split each user's event
  * sequence at inactivity gaps — the classic two-window pattern (lag →
  * boundary flag → running sum = session id). One shuffle on user_id,
  * both windows share the same partitioning (Catalyst reuses the
  * Exchange), then a partial-aggregable rollup per session.
  */
object Sessionize {

  /** Per-session rollup: (user_id, session_id, n_events, start_us, end_us).
    * `gapMicros` defaults to 30 min. Event time is normalized to
    * epoch-MICROsecond longs by [[graft.sources.Tables.epochMicros]] —
    * whatever physical encoding the parquet carries, both engines (this
    * and the DuckDB oracle's `epoch_us`) compute on identical integers.
    */
  def sessions(events: DataFrame, gapMicros: Long = 30L * 60 * 1000 * 1000): DataFrame = {
    val tus = graft.sources.Tables.epochMicros(events, "ts")
    val w = Window.partitionBy(col("user_id")).orderBy(col("tus"), col("event_id"))
    val prev = lag(col("tus"), 1).over(w)
    val newSession = when(prev.isNull || col("tus") - prev > gapMicros, 1L).otherwise(0L)
    events
      .withColumn("tus", tus)
      .withColumn("new_session", newSession)
      .withColumn("session_id",
        sum(col("new_session")).over(w.rowsBetween(Window.unboundedPreceding, 0)))
      .groupBy(col("user_id"), col("session_id"))
      .agg(
        count(lit(1)).as("n_events"),
        min(col("tus")).as("start_us"),
        max(col("tus")).as("end_us"))
  }

  def apply(spark: SparkSession, sfDir: String): DataFrame =
    sessions(graft.sources.Tables.load(spark, sfDir, "events"))

  /** GAP + DURATION-CAP sessionization — [[sessions]] with the second
    * rule real telemetry pipelines add (GA4-style visit caps): a
    * gap-session longer than `capMicros` SPLITS at fixed offsets from
    * its own start (`sub = (tus − session_start) div capMicros`), so no
    * reported session ever exceeds the cap. The split is ARITHMETIC on
    * the gap-session's start — not a second sequential scan — so it
    * rides the same per-user window exchange as the gap rule; the
    * rollup key becomes (user_id, session_id, sub_id), re-ranked to a
    * dense per-user session ordinal.
    *
    * Output: (user_id, session_id, n_events, start_us, end_us) — same
    * contract as [[sessions]]; `session_id` re-numbered densely in
    * time order over the split result. Every output session satisfies
    * `end_us − start_us < capMicros` AND the original gap rule.
    */
  def sessionsCapped(events: DataFrame, gapMicros: Long = 30L * 60 * 1000 * 1000,
      capMicros: Long = 4L * 3600 * 1000 * 1000): DataFrame = {
    require(capMicros >= 1, s"capMicros must be >= 1, got $capMicros")
    val tus = graft.sources.Tables.epochMicros(events, "ts")
    val w = Window.partitionBy(col("user_id")).orderBy(col("tus"), col("event_id"))
    val prev = lag(col("tus"), 1).over(w)
    val newSession = when(prev.isNull || col("tus") - prev > gapMicros, 1L).otherwise(0L)
    val run = w.rowsBetween(Window.unboundedPreceding, 0)
    events
      .withColumn("tus", tus)
      .withColumn("gsid", sum(newSession).over(run))
      .withColumn("gstart",
        min(col("tus")).over(Window.partitionBy(col("user_id"), col("gsid"))))
      .withColumn("sub", expr(s"(tus - gstart) div ${capMicros}"))
      .groupBy(col("user_id"), col("gsid"), col("sub"))
      .agg(count(lit(1)).as("n_events"),
        min(col("tus")).as("start_us"), max(col("tus")).as("end_us"))
      .withColumn("session_id", row_number().over(
        Window.partitionBy(col("user_id")).orderBy(col("gsid"), col("sub"))).cast("long"))
      .select(col("user_id"), col("session_id"), col("n_events"),
        col("start_us"), col("end_us"))
  }

  /** INTERVAL CONCURRENCY SWEEP — how many sessions are simultaneously
    * active at each boundary instant, the classic +1/−1 sweep (peak
    * concurrency, capacity planning, load replay). Sessions are treated
    * half-open as `[start_us, end_us + 1)` (+1 so a single-event
    * session is active at its own instant), and the tie rule is
    * ARITHMETIC rather than an ordering contract: deltas aggregate per
    * distinct timestamp before the running sum, so `active` at boundary
    * `tus` is exactly `#{start ≤ tus} − #{end < tus}` — sessions
    * touching only at a boundary never overlap, in any engine.
    *
    * Output: (tus, delta, active) — one row per distinct boundary
    * timestamp, `active` the concurrency holding from `tus` until the
    * next boundary; `max(active)` is the peak.
    *
    * Plan shape: a union + ONE map-side-combinable per-timestamp
    * aggregation, then the running sum as a range-partitioned
    * [[PrefixSum]] over `tus` — the sweep never sorts on a single
    * task, the 100 TB shape of this classical algorithm.
    */
  def concurrency(sessions: DataFrame): DataFrame = {
    val deltas = sessions
      .select(col("start_us").as("tus"), lit(1L).as("d"))
      .unionByName(sessions
        .select((col("end_us") + 1).as("tus"), lit(-1L).as("d")))
      .groupBy(col("tus")).agg(sum(col("d")).as("delta"))
    PrefixSum.inclusive(deltas, Seq(col("tus")), col("delta"), "active")
  }
}
