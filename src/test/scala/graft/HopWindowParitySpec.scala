package graft

import graft.streaming.StreamingHopWindow
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.scalatest.funsuite.AnyFunSuite

/** Batch/stream parity for the hopping window on the REAL events
  * corpus: every window the append-mode stream finalizes must carry
  * exactly the batch `q_hop_window` aggregate for that (window, type),
  * and every window the first trigger's watermark strictly closed must
  * have been emitted. Same discipline as [[SessionizeParitySpec]] —
  * one semantics behind both faces, fed through the one timestamp
  * schema adapter.
  */
class HopWindowParitySpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark

  test("append-mode windows match batch aggregates; watermark-closed windows all emit") {
    val s = spark
    import s.implicits._
    implicit val sqlCtx = s.sqlContext
    val sf = "/root/testdata/sf0.001"
    val sizeUs = 3600000000L
    val hopUs = 1800000000L

    val batch = SparkEntry.queries("q_hop_window")(s, sf)
      .select($"window_start_us", $"event_type", $"n_events",
        $"min_event_id", $"max_event_id")
      .as[(Long, String, Long, Long, Long)].collect()
      .map(r => (r._1, r._2) -> ((r._3, r._4, r._5))).toMap

    val ev = graft.sources.Tables.load(s, sf, "events")
    val evts = ev
      .select($"event_id", $"event_type", $"user_id",
        graft.sources.Tables.epochMicros(ev, "ts").as("tus"))
      .as[(Long, String, Long, Long)].collect().sortBy(_._4)
      .map { case (id, et, u, t) => StreamingHopWindow.Evt(id, et, u, t) }
    // two triggers split at the time median: watermark after trigger 1
    // is the first half's max event time (delay 0), so windows ending
    // at or before it hold ONLY first-half events and must finalize
    val (a, b) = evts.splitAt(evts.length / 2)
    val wm1 = a.map(_.tus).max

    val input = MemoryStream[StreamingHopWindow.Evt]
    val q = StreamingHopWindow.aggregate(input.toDS(), sizeUs, hopUs)
      .writeStream.format("memory").queryName("hop_parity")
      .outputMode("append").start()
    input.addData(a.toIndexedSeq: _*)
    q.processAllAvailable()
    input.addData(b.toIndexedSeq: _*)
    q.processAllAvailable()
    q.stop()

    val streamed = s.table("hop_parity")
      .select($"window_start_us", $"event_type", $"n_events",
        $"min_event_id", $"max_event_id")
      .as[(Long, String, Long, Long, Long)].collect()
      .map(r => (r._1, r._2) -> ((r._3, r._4, r._5))).toMap

    // 1. a finalized window is immutable truth: it must equal the batch
    // aggregate exactly — any mismatch means the stream closed it early
    streamed.foreach { case (k, v) =>
      assert(batch.get(k).contains(v),
        s"window $k: streamed $v vs batch ${batch.get(k)}")
    }
    // 2. completeness of eviction: windows strictly closed by the first
    // trigger's watermark emit during the second. Spark tracks the
    // watermark in MILLISECONDS (max event time floored to ms,
    // WatermarkTracker), so compare against the ms-floored value — the
    // raw µs max would occasionally demand emission of a window the
    // engine legitimately keeps open for up to 1 ms more.
    val wm1Ms = (wm1 / 1000L) * 1000L
    val mustEmit = batch.keySet.filter { case (ws, _) => ws + sizeUs < wm1Ms }
    assert(mustEmit.subsetOf(streamed.keySet),
      s"closed-but-unemitted windows: ${(mustEmit -- streamed.keySet).take(3)}")
    assert(streamed.nonEmpty, "corpus should close at least one window")
  }

  test("chained two-level aggregate carries exact n_users at batch parity") {
    val s = spark
    import s.implicits._
    implicit val sqlCtx = s.sqlContext
    val sf = "/root/testdata/sf0.001"
    val sizeUs = 3600000000L
    val hopUs = 1800000000L

    // full batch row including the countDistinct column
    val batch = SparkEntry.queries("q_hop_window")(s, sf)
      .select($"window_start_us", $"event_type", $"n_events", $"n_users",
        $"min_event_id", $"max_event_id")
      .as[(Long, String, Long, Long, Long, Long)].collect()
      .map(r => (r._1, r._2) -> ((r._3, r._4, r._5, r._6))).toMap

    val ev = graft.sources.Tables.load(s, sf, "events")
    val evts = ev
      .select($"event_id", $"event_type", $"user_id",
        graft.sources.Tables.epochMicros(ev, "ts").as("tus"))
      .as[(Long, String, Long, Long)].collect().sortBy(_._4)
      .map { case (id, et, u, t) => StreamingHopWindow.Evt(id, et, u, t) }
    val (a, b) = evts.splitAt(evts.length / 2)
    val wm1Ms = (a.map(_.tus).max / 1000L) * 1000L

    val input = MemoryStream[StreamingHopWindow.Evt]
    val q = StreamingHopWindow.aggregateWithUsers(input.toDS(), sizeUs, hopUs)
      .writeStream.format("memory").queryName("hop_users_parity")
      .outputMode("append").start()
    input.addData(a.toIndexedSeq: _*)
    q.processAllAvailable()
    input.addData(b.toIndexedSeq: _*)
    q.processAllAvailable()
    q.stop()

    val streamed = s.table("hop_users_parity")
      .select($"window_start_us", $"event_type", $"n_events", $"n_users",
        $"min_event_id", $"max_event_id")
      .as[(Long, String, Long, Long, Long, Long)].collect()
      .map(r => (r._1, r._2) -> ((r._3, r._4, r._5, r._6))).toMap

    streamed.foreach { case (k, v) =>
      assert(batch.get(k).contains(v),
        s"window $k: streamed $v vs batch ${batch.get(k)}")
    }
    val mustEmit = batch.keySet.filter { case (ws, _) => ws + sizeUs < wm1Ms }
    assert(mustEmit.subsetOf(streamed.keySet),
      s"closed-but-unemitted windows: ${(mustEmit -- streamed.keySet).take(3)}")
    assert(streamed.nonEmpty, "corpus should close at least one window")
    // the column this test exists for: at least one finalized window
    // must show real dedup (n_users < n_events), or the parity is vacuous
    assert(streamed.values.exists(v => v._2 < v._1),
      "expected at least one window with n_users < n_events")
  }

  test("approx-users twin: sketch estimate tracks the exact count, other columns exact") {
    val s = spark
    import s.implicits._
    implicit val sqlCtx = s.sqlContext
    val sf = "/root/testdata/sf0.001"
    val sizeUs = 3600000000L
    val hopUs = 1800000000L

    val batch = SparkEntry.queries("q_hop_window")(s, sf)
      .select($"window_start_us", $"event_type", $"n_events", $"n_users",
        $"min_event_id", $"max_event_id")
      .as[(Long, String, Long, Long, Long, Long)].collect()
      .map(r => (r._1, r._2) -> ((r._3, r._4, r._5, r._6))).toMap

    val ev = graft.sources.Tables.load(s, sf, "events")
    val evts = ev
      .select($"event_id", $"event_type", $"user_id",
        graft.sources.Tables.epochMicros(ev, "ts").as("tus"))
      .as[(Long, String, Long, Long)].collect().sortBy(_._4)
      .map { case (id, et, u, t) => StreamingHopWindow.Evt(id, et, u, t) }
    val (a, b) = evts.splitAt(evts.length / 2)

    val input = MemoryStream[StreamingHopWindow.Evt]
    val q = StreamingHopWindow.aggregateApproxUsers(input.toDS(), sizeUs, hopUs)
      .writeStream.format("memory").queryName("hop_approx_parity")
      .outputMode("append").start()
    input.addData(a.toIndexedSeq: _*)
    q.processAllAvailable()
    input.addData(b.toIndexedSeq: _*)
    q.processAllAvailable()
    q.stop()

    val streamed = s.table("hop_approx_parity")
      .select($"window_start_us", $"event_type", $"n_events", $"n_users",
        $"min_event_id", $"max_event_id")
      .as[(Long, String, Long, Long, Long, Long)].collect()
      .map(r => (r._1, r._2) -> ((r._3, r._4, r._5, r._6))).toMap

    assert(streamed.nonEmpty, "corpus should close at least one window")
    streamed.foreach { case (k, (ne, nuApprox, mn, mx)) =>
      val (bne, bnu, bmn, bmx) = batch(k)
      // every non-sketch column is the exact batch value
      assert((ne, mn, mx) == ((bne, bmn, bmx)),
        s"window $k: exact columns diverged")
      // the HLL++ estimate stays within a generous 3x the configured
      // 5 % rsd of the true distinct count (small-range counts are
      // near-exact in practice; the bound guards the wiring, not HLL)
      val err = math.abs(nuApprox - bnu).toDouble / math.max(1L, bnu)
      assert(err <= 0.15, s"window $k: approx n_users $nuApprox vs exact $bnu (err $err)")
    }
  }
}
