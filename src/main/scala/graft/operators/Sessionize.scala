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
}
