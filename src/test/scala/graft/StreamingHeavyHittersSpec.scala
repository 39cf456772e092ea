package graft

import graft.streaming.StreamingHeavyHitters
import graft.streaming.StreamingHeavyHitters.{HH, HHState, Tok}
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.scalatest.funsuite.AnyFunSuite

import scala.collection.mutable

class StreamingHeavyHittersSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark

  /** token repeated `freq` times, distinct frequencies → unambiguous rank. */
  private def weighted(freqs: (String, Int)*): Seq[String] =
    freqs.flatMap { case (t, n) => Seq.fill(n)(t) }

  test("updateGroup: estimates are one-sided and state stays bounded") {
    val tokens = weighted("a" -> 50, "b" -> 30, "c" -> 20, "d" -> 10, "e" -> 5)
    val (st, out) = StreamingHeavyHitters.updateGroup("g", tokens, None,
      k = 3, candidates = 4, eps = 0.001, confidence = 0.99, seed = 42)
    assert(st.cand.size <= 4, "candidate pool exceeded its bound")
    assert(out.map(_.token) == Seq("a", "b", "c"), "rank order by estimate")
    val exact = Map("a" -> 50L, "b" -> 30L, "c" -> 20L)
    out.foreach(h => assert(h.est >= exact(h.token), "CMS can never undercount"))
    // second batch folds into the SAME sketch: estimates are cumulative
    val (st2, out2) = StreamingHeavyHitters.updateGroup("g",
      weighted("c" -> 40, "f" -> 1), Some(st),
      k = 3, candidates = 4, eps = 0.001, confidence = 0.99, seed = 42)
    assert(st2.cand.size <= 4)
    assert(out2.head.token == "c" && out2.head.est >= 60L,
      s"cumulative count should promote c to rank 1, got ${out2.head}")
  }

  test("updateGroup: a heavy hitter evicted by an early flood re-enters the pool") {
    // batch 1: 6 singleton tokens flood a 3-candidate pool; "hot" is absent
    val (st1, _) = StreamingHeavyHitters.updateGroup("g",
      weighted("x1" -> 1, "x2" -> 1, "x3" -> 1, "x4" -> 1, "x5" -> 1, "x6" -> 1),
      None, k = 2, candidates = 3, eps = 0.001, confidence = 0.99, seed = 42)
    // batch 2: the true heavy hitter arrives in volume and must displace
    val (_, out) = StreamingHeavyHitters.updateGroup("g",
      weighted("hot" -> 10), Some(st1),
      k = 2, candidates = 3, eps = 0.001, confidence = 0.99, seed = 42)
    assert(out.head.token == "hot" && out.head.est >= 10L)
  }

  test("streaming end-to-end: per-trigger top-k over the cumulative stream") {
    val s = spark
    import s.implicits._
    implicit val sqlCtx = s.sqlContext
    val input = MemoryStream[Tok]
    val out = StreamingHeavyHitters.topTokens(input.toDS(), k = 2, candidates = 8)
    val triggers = mutable.ArrayBuffer.empty[Set[HH]]
    val q = out.writeStream.outputMode("update")
      .foreachBatch { (df: org.apache.spark.sql.Dataset[HH], _: Long) =>
        val rows = df.collect().toSet
        if (rows.nonEmpty) triggers.synchronized { triggers += rows }
        ()
      }
      .start()
    input.addData(weighted("a" -> 5, "b" -> 3, "c" -> 1).map(Tok("en", _)) ++
      weighted("x" -> 4, "y" -> 2).map(Tok("de", _)): _*)
    q.processAllAvailable()
    input.addData(weighted("c" -> 9).map(Tok("en", _)): _*)
    q.processAllAvailable()
    q.stop()
    assert(triggers.size == 2, s"expected one emission per trigger, got ${triggers.size}")
    assert(triggers(0) == Set(
      HH("en", "a", 5L, 1), HH("en", "b", 3L, 2),
      HH("de", "x", 4L, 1), HH("de", "y", 2L, 2)))
    // trigger 2 only re-emits the updated group, with cumulative counts
    assert(triggers(1) == Set(HH("en", "c", 10L, 1), HH("en", "a", 5L, 2)))
  }
}
