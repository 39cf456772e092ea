package graft

import graft.operators.Curation
import graft.streaming.StreamingSourceQuota
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class StreamingSourceQuotaSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark

  /** Run `batches` through the streaming quota (one trigger each) and
    * return (final kept set, per-trigger emissions in order).
    */
  private def run(batches: Seq[Seq[(String, Long, Long)]], quota: Int,
      name: String): (Set[(String, Long, Int)], Seq[Set[(String, Long, Int)]]) = {
    val s = spark
    import s.implicits._
    implicit val sqlCtx = s.sqlContext
    val input = MemoryStream[(String, Long, Long)]
    val out = StreamingSourceQuota.quota(
      input.toDF().toDF("source", "doc_id", "score"), quota)
    val q = out.writeStream.format("memory").queryName(name)
      .outputMode("update").start()
    val perTrigger = batches.map { b =>
      val before = s.table(name).count()
      input.addData(b: _*)
      q.processAllAvailable()
      // memory sink in update mode APPENDS each trigger's emission — the
      // tail past `before` is this trigger's refreshed kept sets
      s.table(name).as[(String, Long, Int)].collect().drop(before.toInt).toSet
    }
    q.stop()
    // the LAST emission per source is its current kept set
    val last = perTrigger.foldLeft(Map.empty[String, Set[(String, Long, Int)]]) {
      (acc, trig) =>
        acc ++ trig.groupBy(_._1)
    }
    (last.values.flatten.toSet, perTrigger)
  }

  private def batchReference(rows: Seq[(String, Long, Long)], quota: Int)
      : Set[(String, Long, Int)] = {
    val s = spark
    import s.implicits._
    Curation.sourceQuota(rows.toDF("source", "doc_id", "score"), quota, col("score"))
      .as[(String, Long, Int)].collect().toSet
  }

  test("one trigger: streaming kept set == batch sourceQuota") {
    val rows = for {
      src <- 0 until 3; i <- 0 until 20
    } yield (s"s$src", (src * 100 + i).toLong, ((i * 13) % 7).toLong)
    val (kept, _) = run(Seq(rows), quota = 4, "ssq_one")
    assert(kept == batchReference(rows, 4),
      "single-trigger streaming quota diverged from the batch operator")
  }

  test("quota re-entry across triggers: later better rows displace earlier admits") {
    val b1 = Seq(("a", 1L, 10L), ("a", 2L, 20L), ("b", 10L, 5L))
    val b2 = Seq(("a", 3L, 30L), ("a", 4L, 40L), ("b", 11L, 1L))
    val (kept, perTrigger) = run(Seq(b1, b2), quota = 2, "ssq_reentry")
    // trigger 1: quota full for a with (2,1); doc 1 is admitted…
    assert(perTrigger(0).contains(("a", 1L, 2)),
      "doc 1 should be admitted while the quota has room")
    // …then displaced in trigger 2 by the two better-scoring arrivals
    assert(perTrigger(1).filter(_._1 == "a").map(_._2) == Set(4L, 3L),
      "trigger 2's refreshed kept set for source a must be the two new docs")
    assert(kept == batchReference(b1 ++ b2, 2),
      "after all triggers the kept set must equal batch sourceQuota of the union")
    // b saw no displacement: its trigger-2 emission still ranks 10 first
    assert(kept.filter(_._1 == "b") == Set(("b", 10L, 1), ("b", 11L, 2)))
  }

  test("arrival-order independence: permuted batch splits converge") {
    val rows = for {
      src <- 0 until 2; i <- 0 until 12
    } yield (s"s$src", (src * 50 + i).toLong, ((i * 17) % 5).toLong)
    val ref = batchReference(rows, 3)
    val splits = Seq(
      Seq(rows),
      Seq(rows.take(5), rows.slice(5, 6), rows.drop(6)),
      Seq(rows.reverse.take(13), rows.reverse.drop(13)))
    splits.zipWithIndex.foreach { case (batches, i) =>
      val (kept, _) = run(batches, quota = 3, s"ssq_perm$i")
      assert(kept == ref, s"split $i diverged from the batch reference")
    }
  }

  test("at-least-once redelivery: a duplicated row holds one rank and one quota slot") {
    // the same (source, doc_id, score) row delivered in two triggers —
    // an at-least-once source replaying — must not appear at two qranks
    // or displace a distinct document from the quota
    val b1 = Seq(("a", 1L, 10L), ("a", 2L, 20L))
    val b2 = Seq(("a", 1L, 10L), ("a", 3L, 5L))
    val (kept, perTrigger) = run(Seq(b1, b2), quota = 3, "ssq_redeliver")
    assert(perTrigger(1).filter(_._1 == "a") ==
      Set(("a", 2L, 1), ("a", 1L, 2), ("a", 3L, 3)),
      s"redelivered doc 1 must keep exactly one rank, got ${perTrigger(1)}")
    assert(kept == batchReference(b1 ++ b2.drop(1), 3),
      "the kept set must equal batch quota of the DEDUPLICATED row set")
    // same discipline within one trigger
    val (kept1, _) = run(Seq(Seq(("a", 7L, 4L), ("a", 7L, 4L), ("a", 8L, 3L))),
      quota = 2, "ssq_redeliver1")
    assert(kept1 == Set(("a", 7L, 1), ("a", 8L, 2)),
      s"intra-trigger duplicate must not burn the second slot, got $kept1")
  }

  test("null score or doc_id rows are dropped (the batch contract)") {
    val s = spark
    import s.implicits._
    implicit val sqlCtx = s.sqlContext
    val input = MemoryStream[(String, java.lang.Long, java.lang.Long)]
    val out = StreamingSourceQuota.quota(
      input.toDF().toDF("source", "doc_id", "score"), 5)
    val q = out.writeStream.format("memory").queryName("ssq_null")
      .outputMode("update").start()
    input.addData(("a", 1L: java.lang.Long, 7L: java.lang.Long),
      ("a", 2L: java.lang.Long, null), ("a", null, 9L: java.lang.Long))
    q.processAllAvailable()
    q.stop()
    val kept = s.table("ssq_null").as[(String, Long, Int)].collect().toSet
    assert(kept == Set(("a", 1L, 1)), s"null rows must be dropped, got $kept")
  }

  test("fractional score is rejected at plan time, like the batch operator") {
    val s = spark
    import s.implicits._
    implicit val sqlCtx = s.sqlContext
    val input = MemoryStream[(String, Long, Double)]
    val ex = intercept[IllegalArgumentException] {
      StreamingSourceQuota.quota(
        input.toDF().toDF("source", "doc_id", "score"), 5)
    }
    assert(ex.getMessage.contains("integral"),
      "the shared contract message should name the integral requirement")
  }
}
