package graft

import graft.streaming.StreamingSessionize
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.scalatest.funsuite.AnyFunSuite

/** Batch/stream parity for sessionization on the REAL events corpus:
  * the streaming operator fed the same events in time order must close
  * exactly the sessions the batch operator computes, minus each user's
  * final session (still open in an unbounded stream). Ties both faces —
  * and the timestamp schema adapter feeding them — to one semantics.
  */
class SessionizeParitySpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark

  test("streamed closed sessions == batch sessions minus each user's open last") {
    val s = spark
    import s.implicits._
    implicit val sqlCtx = s.sqlContext
    val sf = "/root/testdata/sf0.001"
    val gap = 30L * 60 * 1000 * 1000
    val ev = graft.sources.Tables.load(s, sf, "events")

    val batchSessions = graft.operators.Sessionize.sessions(ev, gap)
      .select($"user_id", $"start_us", $"end_us", $"n_events")
      .as[(Long, Long, Long, Long)].collect().toSet
    // each user's last session stays OPEN in the stream (no timeout)
    val lastPerUser = batchSessions.groupBy(_._1).values.map(_.maxBy(_._2)).toSet
    val expectedClosed = batchSessions -- lastPerUser

    val evts = ev
      .select($"user_id", graft.sources.Tables.epochMicros(ev, "ts").as("tus"))
      .as[(Long, Long)].collect().sortBy(_._2)
      .map { case (u, t) => StreamingSessionize.Evt(u, t) }
    val input = MemoryStream[StreamingSessionize.Evt]
    val q = StreamingSessionize.sessionize(input.toDS(), gap)
      .writeStream.format("memory").queryName("sess_parity")
      .outputMode("append").start()
    // two triggers split at the time median: per-user arrival stays in
    // time order, so cross-trigger sessions fold exactly like the batch
    val (a, b) = evts.splitAt(evts.length / 2)
    input.addData(a.toIndexedSeq: _*)
    q.processAllAvailable()
    input.addData(b.toIndexedSeq: _*)
    q.processAllAvailable()
    q.stop()
    val streamed = s.table("sess_parity")
      .select($"userId", $"startUs", $"endUs", $"nEvents")
      .as[(Long, Long, Long, Long)].collect().toSet
    assert(streamed == expectedClosed,
      s"parity broke: ${streamed.size} streamed vs ${expectedClosed.size} expected closed; " +
        s"only-streamed=${(streamed -- expectedClosed).take(3)} " +
        s"only-batch=${(expectedClosed -- streamed).take(3)}")
    assert(streamed.nonEmpty, "corpus should close at least one session")
  }
}
