package graft.streaming

import org.apache.spark.sql.Dataset
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Custom stateful streaming: gap-based sessionization with
  * `flatMapGroupsWithState` — the arbitrary-state face of the engine
  * (SURVEY.md §2.8; the reference is stateless, this is the extended
  * streaming capability a training-data pipeline needs for clickstream
  * shaping).
  *
  * Semantics: per user, an open session accumulates events; an event more
  * than `gapMicros` after the previous one CLOSES the open session (emitted
  * downstream) and starts a new one. State per key is O(1) — start/last/
  * count — so a 1000-executor cluster holds billions of keys.
  */
object StreamingSessionize {

  case class Evt(userId: Long, tsUs: Long)
  case class OpenSession(start: Long, last: Long, n: Long)
  case class ClosedSession(userId: Long, startUs: Long, endUs: Long, nEvents: Long)

  def sessionize(
      events: Dataset[Evt],
      gapMicros: Long = 30L * 60 * 1000 * 1000): Dataset[ClosedSession] = {
    import events.sparkSession.implicits._
    events
      .groupByKey(_.userId)
      .flatMapGroupsWithState[OpenSession, ClosedSession](
        OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (userId: Long, batch: Iterator[Evt], state: GroupState[OpenSession]) =>
          val sorted = batch.toSeq.sortBy(_.tsUs)
          val closed = Seq.newBuilder[ClosedSession]
          var open = state.getOption
          sorted.foreach { e =>
            open match {
              case Some(s) if e.tsUs - s.last > gapMicros =>
                closed += ClosedSession(userId, s.start, s.last, s.n)
                open = Some(OpenSession(e.tsUs, e.tsUs, 1))
              case Some(s) =>
                // late cross-batch events fold INTO the open session:
                // start/last stay monotone (a regressed `last` would split
                // the next session and emit end < start)
                open = Some(OpenSession(math.min(s.start, e.tsUs), math.max(s.last, e.tsUs), s.n + 1))
              case None =>
                open = Some(OpenSession(e.tsUs, e.tsUs, 1))
            }
          }
          open.foreach(state.update)
          closed.result().iterator
      }
  }
}
