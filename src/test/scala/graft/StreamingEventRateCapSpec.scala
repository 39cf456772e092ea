package graft

import graft.streaming.StreamingEventRateCap
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class StreamingEventRateCapSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark

  private def ts(ms: Long) = new java.sql.Timestamp(ms)
  private val MinUs = 60L * 1000000L // 1-minute windows

  /** Run batches (one trigger each) through the streaming cap; return the
    * per-trigger emission sets.
    */
  private def run(batches: Seq[Seq[(Long, Long, java.sql.Timestamp)]],
      cap: Int, delay: String, name: String): Seq[Set[(Long, Long, Long, Int)]] = {
    val s = spark
    import s.implicits._
    implicit val sqlCtx = s.sqlContext
    val input = MemoryStream[(Long, Long, java.sql.Timestamp)]
    val out = StreamingEventRateCap.rateCap(
      input.toDF().toDF("user_id", "event_id", "ets"),
      eventTime = "ets", watermarkDelay = delay,
      maxPerWindow = cap, windowUs = MinUs)
    val q = out.writeStream.format("memory").queryName(name)
      .outputMode("update").start()
    val perTrigger = batches.map { b =>
      val before = s.table(name).count()
      input.addData(b: _*)
      q.processAllAvailable()
      s.table(name).as[(Long, Long, Long, Int)].collect().drop(before.toInt).toSet
    }
    q.stop()
    perTrigger
  }

  private def batchReference(rows: Seq[(Long, Long, java.sql.Timestamp)],
      cap: Int): Set[(Long, Long, Long, Int)] = {
    val s = spark
    import s.implicits._
    graft.operators.Temporal.eventRateCap(
        rows.toDF("user_id", "event_id", "ets")
          .withColumn("tus", unix_micros(col("ets"))),
        "tus", maxPerWindow = cap, windowUs = MinUs)
      .as[(Long, Long, Long, Int)].collect().toSet
  }

  test("one trigger: streaming kept sets == batch eventRateCap") {
    val rows = Seq(
      (1L, 10L, ts(1000)), (1L, 11L, ts(2000)), (1L, 12L, ts(3000)),
      (1L, 13L, ts(4000)), (1L, 14L, ts(5000)), // burst: cap 3 keeps 10,11,12
      (1L, 15L, ts(61000)), // next window
      (2L, 20L, ts(30000)), (2L, 21L, ts(10000)))
    val got = run(Seq(rows), cap = 3, delay = "10 minutes", "serc_one")
    assert(got.head == batchReference(rows, 3))
    assert(!got.head.exists(r => r._3 == 13L || r._3 == 14L), "burst tail capped")
  }

  test("a late-but-inside-watermark EARLIER event displaces an admitted one") {
    val b1 = Seq((1L, 10L, ts(30000)), (1L, 11L, ts(40000)), (1L, 12L, ts(50000)))
    val b2 = Seq((1L, 13L, ts(10000))) // late arrival, earliest of all
    val got = run(Seq(b1, b2), cap = 2, delay = "10 minutes", "serc_displace")
    assert(got(0).map(_._3) == Set(10L, 11L), "trigger 1 admits the first two")
    assert(got(1).map(_._3) == Set(13L, 10L),
      "the late earlier event takes rank 1 and displaces event 11")
    assert(got(1) == batchReference(b1 ++ b2, 2),
      "after both triggers the window's kept set equals the batch operator")
  }

  test("watermark eviction: a straggler past its window cannot resurrect a partial set") {
    val b1 = Seq((1L, 10L, ts(10000)), (1L, 11L, ts(20000)))
    // far-future event: advances the watermark (10s delay) way past
    // window 0's end, firing its event-time timeout
    val b2 = Seq((2L, 20L, ts(60L * 60L * 1000L)))
    // straggler into the evicted window — must emit NOTHING for it
    val b3 = Seq((1L, 12L, ts(30000)))
    val got = run(Seq(b1, b2, b3), cap = 2, delay = "10 seconds", "serc_evict")
    assert(got(0).map(_._3) == Set(10L, 11L))
    assert(got(2).filter(_._2 == 0L).isEmpty,
      s"straggler resurrected evicted window 0: ${got(2)}")
  }
}
