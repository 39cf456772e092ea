package graft

import graft.operators.Temporal
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** As-of and interval joins ([[graft.operators.Temporal]]) against naive
  * reference implementations on seeded edge-case data.
  */
class TemporalSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  test("as-of tolerance: stale matches null out exactly like no-match; the bound is inclusive") {
    import graft.operators.Temporal
    val left = Seq((1L, 1L, 100L), (2L, 1L, 200L), (3L, 2L, 50L))
      .toDF("event_id", "key", "t")
    val right = Seq((1L, 90L, 10L), (1L, 120L, 11L)) // key 2 has no right rows
      .toDF("key", "t", "event_id")
      .select($"key", $"t", $"event_id", $"event_id".as("r_id"), $"t".as("r_t"))
    def run(tol: Long) = Temporal.asofJoinBackwardTolerance(left, right,
        keys = Seq("key"), timeCol = "t", tieCol = "event_id",
        rightCols = Seq("r_id", "r_t"), toleranceMicros = tol)
      .orderBy($"event_id")
      .as[(Long, Long, Long, Option[Long], Option[Long])].collect().toSeq
    // unbounded-equivalent: huge tolerance == plain backward as-of
    val base = Temporal.asofJoinBackward(left, right, Seq("key"), "t", "event_id",
        Seq("r_id", "r_t"))
      .orderBy($"event_id")
      .as[(Long, Long, Long, Option[Long], Option[Long])].collect().toSeq
    assert(run(Long.MaxValue / 4) == base)
    // left 1 matches rid 10 at wait 10; left 2 matches rid 11 at wait 80
    assert(run(10L) == Seq(
      (1L, 1L, 100L, Some(10L), Some(90L)), // wait 10 == tol: inclusive
      (2L, 1L, 200L, None, None), // wait 80 > 10: stale -> nulls
      (3L, 2L, 50L, None, None))) // never had a match
    assert(run(9L).head._4.isEmpty) // wait 10 > 9: just past the bound
    intercept[IllegalArgumentException] {
      Temporal.asofJoinBackwardTolerance(left, right, Seq("key"), "t", "event_id",
        Seq("r_id", "r_t"), toleranceMicros = -1L)
    }
    // forward mirror: left 1 (t=100) -> next right at 120, lag 20
    def runFwd(tol: Long) = Temporal.asofJoinForwardTolerance(left, right,
        keys = Seq("key"), timeCol = "t", tieCol = "event_id",
        rightCols = Seq("r_id", "r_t"), toleranceMicros = tol)
      .orderBy($"event_id")
      .as[(Long, Long, Long, Option[Long], Option[Long])].collect().toSeq
    assert(runFwd(20L).head == (1L, 1L, 100L, Some(11L), Some(120L))) // lag 20 == tol
    assert(runFwd(19L).head._4.isEmpty) // just past the bound
  }

  test("sessionsCapped: long gap-sessions split at fixed offsets; every output session respects BOTH rules") {
    import graft.operators.Sessionize
    // user 1: events every 10 min for 2.5h (one gap-session) -> cap 1h
    // splits it at offsets 0h/1h/2h into 3 sessions of 6/6/4 events
    val ev = ((0 until 16).map(i => (1L, i.toLong, i * 600L * 1000000L)) ++
      Seq((2L, 100L, 0L), (2L, 101L, 7200L * 1000000L))) // user 2: gap split only
      .map { case (u, e, t) => (u, e, new java.sql.Timestamp(t / 1000L)) }
      .toDF("user_id", "event_id", "ts")
    val got = Sessionize.sessionsCapped(ev, capMicros = 3600L * 1000000L)
      .orderBy($"user_id", $"session_id")
      .as[(Long, Long, Long, Long, Long)].collect().toSeq
    val u1 = got.filter(_._1 == 1L)
    assert(u1.map(_._3) == Seq(6L, 6L, 4L)) // 0..50, 60..110, 120..150 min
    assert(u1.forall(s => s._5 - s._4 < 3600L * 1000000L))
    assert(got.filter(_._1 == 2L).map(_._3) == Seq(1L, 1L)) // gap rule intact
    // session ids are dense from 1 per user
    got.groupBy(_._1).foreach { case (_, rs) =>
      assert(rs.map(_._2).sorted == (1L to rs.size).toSeq) }
  }

  test("session concurrency sweep: hand-rolled actives; boundary-touch never overlaps; sweep closes at zero") {
    // sessions: [0,10], [5,20], [10,10] (1-event at the boundary), [21,30]
    val ses = Seq(
      (1L, 1L, 2L, 0L, 10L), (2L, 1L, 3L, 5L, 20L),
      (3L, 1L, 1L, 10L, 10L), (4L, 1L, 2L, 21L, 30L))
      .toDF("user_id", "session_id", "n_events", "start_us", "end_us")
    val got = graft.operators.Sessionize.concurrency(ses)
      .orderBy($"tus").as[(Long, Long, Long)].collect().toSeq
    // boundaries: 0:+1, 5:+1, 10:+1, 11:-1(end 10)x2, 21:+1-1(end 20 ties start 21? end 20 -> 21)
    // end_us+1: 11, 21, 11, 31; deltas: 0:+1 5:+1 10:+1 11:-2 21:+1-1=0 31:-1
    assert(got == Seq((0L, 1L, 1L), (5L, 1L, 2L), (10L, 1L, 3L),
      (11L, -2L, 1L), (21L, 0L, 1L), (31L, -1L, 0L)))
    // every sweep ends at zero; peak here is 3
    assert(got.last._3 == 0L && got.map(_._3).max == 3L)
    // partitioning invariance
    val got2 = graft.operators.Sessionize.concurrency(ses.repartition(5))
      .orderBy($"tus").as[(Long, Long, Long)].collect().toSeq
    assert(got == got2)
  }

  // left: (event_id, key, t)
  val leftRows = Seq(
    (100L, 1L, 50L),   // after two right rows
    (101L, 1L, 10L),   // exact tie with right t=10 → tie included
    (102L, 1L, 5L),    // before every right row → no match
    (103L, 2L, 99L),   // key with a single right row
    (104L, 3L, 7L),    // key with no right rows at all
    (105L, 1L, 10L))   // second left row at the same (key, t)
  // right: (key, t, rid, payload) — two rows tie at (1, 10); rid 12 wins.
  // payload NULL on rid=20 exercises whole-struct matching (a per-column
  // last(ignoreNulls) would leak rid 20's t-40 payload from rid=11).
  val rightRows = Seq(
    (1L, 10L, 11L, Some("p11")),
    (1L, 10L, 12L, Some("p12")),
    (1L, 40L, 20L, None: Option[String]),
    (2L, 99L, 30L, Some("p30")))

  test("asofJoinBackward ≡ naive latest-at-or-before lookup (ties, no-match, null payload)") {
    val left = leftRows.toDF("event_id", "key", "t")
    val right = rightRows.toDF("key", "t", "event_id", "payload")
      .select($"key", $"t", $"event_id",
        $"event_id".as("r_id"), $"t".as("r_t"), $"payload".as("r_payload"))
    val got = Temporal.asofJoinBackward(left, right,
        keys = Seq("key"), timeCol = "t", tieCol = "event_id",
        rightCols = Seq("r_id", "r_t", "r_payload"))
      .select($"event_id", $"r_id", $"r_t", $"r_payload")
      .as[(Long, Option[Long], Option[Long], Option[String])]
      .collect().sortBy(_._1)
    val naive = leftRows.sortBy(_._1).map { case (id, k, t) =>
      val m = rightRows.filter(r => r._1 == k && r._2 <= t)
        .sortBy(r => (r._2, r._3)).lastOption
      (id, m.map(_._3), m.map(_._2), m.flatMap(_._4))
    }
    assert(got.toSeq == naive)
    // spot-checks of the deliberate edge cases
    val byId = got.map(r => r._1 -> r).toMap
    assert(byId(100L)._2.contains(20L) && byId(100L)._4.isEmpty,
      "latest match wins even when its payload column is NULL")
    assert(byId(101L)._2.contains(12L), "equal-time tie included, larger tie id wins")
    assert(byId(102L)._2.isEmpty && byId(104L)._2.isEmpty, "left-outer semantics")
  }

  test("asofJoinForward ≡ naive earliest-at-or-after lookup (ties to smaller id)") {
    val left = leftRows.toDF("event_id", "key", "t")
    val right = rightRows.toDF("key", "t", "event_id", "payload")
      .select($"key", $"t", $"event_id",
        $"event_id".as("r_id"), $"t".as("r_t"))
    val got = Temporal.asofJoinForward(left, right,
        keys = Seq("key"), timeCol = "t", tieCol = "event_id",
        rightCols = Seq("r_id", "r_t"))
      .select($"event_id", $"r_id", $"r_t")
      .as[(Long, Option[Long], Option[Long])].collect().sortBy(_._1).toSeq
    val naive = leftRows.sortBy(_._1).map { case (id, k, t) =>
      val m = rightRows.filter(r => r._1 == k && r._2 >= t)
        .sortBy(r => (r._2, r._3)).headOption
      (id, m.map(_._3), m.map(_._2))
    }
    assert(got == naive)
    val byId = got.map(r => r._1 -> r).toMap
    assert(byId(101L)._2.contains(11L), "equal-time tie included, SMALLER id wins forward")
    assert(byId(100L)._2.isEmpty, "left row after every right row → no forward match")
  }

  test("asof joins give NULL-time LEFT rows no match in either direction") {
    val left = Seq((1L, 1L, Option.empty[Long])).toDF("event_id", "key", "t")
    val right = Seq((1L, 10L, 11L)).toDF("key", "t", "event_id")
      .select($"key", $"t", $"event_id", $"event_id".as("r_id"))
    val back = Temporal.asofJoinBackward(left, right, Seq("key"), "t", "event_id", Seq("r_id"))
      .select($"r_id").as[Option[Long]].head()
    val fwd = Temporal.asofJoinForward(left, right, Seq("key"), "t", "event_id", Seq("r_id"))
      .select($"r_id").as[Option[Long]].head()
    assert(back.isEmpty && fwd.isEmpty)
  }

  test("asofJoinBackward ignores NULL-time right rows (no universal fallback match)") {
    val left = Seq((1L, 1L, 5L)).toDF("event_id", "key", "t")
    val right = Seq((1L, Option.empty[Long], 99L, "ghost"))
      .toDF("key", "t", "event_id", "payload")
      .select($"key", $"t", $"event_id", $"event_id".as("r_id"), $"payload".as("r_payload"))
    val got = Temporal.asofJoinBackward(left, right,
        Seq("key"), "t", "event_id", Seq("r_id", "r_payload"))
      .select($"event_id", $"r_id").as[(Long, Option[Long])].collect().toSeq
    assert(got == Seq((1L, None)))
  }

  test("asofJoinBackward rejects right payload names colliding with the left schema") {
    val left = leftRows.toDF("event_id", "key", "t")
    val right = rightRows.toDF("key", "t", "event_id", "payload")
    intercept[IllegalArgumentException] {
      Temporal.asofJoinBackward(left, right, Seq("key"), "t", "event_id",
        rightCols = Seq("event_id"))
    }
  }

  test("rangeJoin ≡ naive inequality join; boundaries half-open; multi-bucket intervals") {
    val w = 10L
    // intervals: single-bucket, exactly-one-bucket-aligned, 3-bucket span,
    // empty (start == end), boundary-aligned empty
    val intervals = Seq(
      (1L, 900L, 3L, 9L),
      (1L, 901L, 10L, 20L),
      (1L, 902L, 5L, 35L),
      (2L, 903L, 50L, 50L),
      (2L, 904L, 60L, 60L)).toDF("key", "iv_id", "s", "e")
    val points = (0L to 70L).map(t => (if (t % 2 == 0) 1L else 2L, t * 7919 % 1000, t))
      .toDF("key", "pid", "t")
    val got = Temporal.rangeJoin(points, intervals, Seq("key"), "t", "s", "e", w)
      .select($"iv_id", $"pid").as[(Long, Long)].collect().toSet
    val naive = points.as("p").join(intervals.as(
        "i"), $"p.key" === $"i.key" && $"p.t" >= $"i.s" && $"p.t" < $"i.e")
      .select($"iv_id", $"pid").as[(Long, Long)].collect().toSet
    assert(got == naive)
    assert(naive.nonEmpty)
    // half-open on iv 901 [10, 20) key 1: t = 10 included, t = 20 excluded
    val iv901 = got.collect { case (901L, pid) => pid }
    def pidAt(t: Long) = points.filter($"t" === t).select($"pid").as[Long].head()
    assert(iv901.contains(pidAt(10L)) && !iv901.contains(pidAt(20L)))
    assert(!got.exists { case (id, _) => id == 903L || id == 904L },
      "empty intervals match nothing")
  }

  test("property: asof both directions ≡ naive on randomized data (nulls, dup times, sparse keys)") {
    val rnd = new scala.util.Random(0xA50F)
    for (round <- 1 to 5) {
      val nKeys = 1 + rnd.nextInt(4)
      def rows(n: Int) = (1 to n).map { i =>
        val t = if (rnd.nextInt(10) == 0) None else Some(rnd.nextInt(20).toLong)
        (1000L * round + i, rnd.nextInt(nKeys).toLong, t)
      }
      val lRows = rows(30)
      val rRows = rows(25)
      val left = lRows.toDF("event_id", "key", "t")
      // right frame shaped for the operator: key, t, tie, payload
      val r2 = rRows.toDF("rid", "key", "t")
        .select($"key", $"t", $"rid".as("event_id"), $"rid".as("r_id"))
      def naive(backward: Boolean) = lRows.sortBy(_._1).map { case (id, k, t) =>
        val m = t.flatMap { lt =>
          val cands = rRows.filter(r => r._2 == k && r._3.exists(rt =>
            if (backward) rt <= lt else rt >= lt))
          if (backward) cands.sortBy(r => (r._3.get, r._1)).lastOption
          else cands.sortBy(r => (r._3.get, r._1)).headOption
        }
        (id, m.map(_._1))
      }
      val gotB = Temporal.asofJoinBackward(left, r2, Seq("key"), "t", "event_id", Seq("r_id"))
        .select($"event_id", $"r_id").as[(Long, Option[Long])].collect().sortBy(_._1).toSeq
      val gotF = Temporal.asofJoinForward(left, r2, Seq("key"), "t", "event_id", Seq("r_id"))
        .select($"event_id", $"r_id").as[(Long, Option[Long])].collect().sortBy(_._1).toSeq
      assert(gotB == naive(backward = true), s"backward, round $round")
      assert(gotF == naive(backward = false), s"forward, round $round")
    }
  }

  test("rangeJoin ≡ naive on NEGATIVE times (floor bucketing, not truncation)") {
    // round-3 advice: with truncating `div`, a point at t = -3 and an
    // interval [-5, 1) bucket to 0 and [0, 0] respectively at w = 10 —
    // both "bucket 0" — but a point at t = -13 against [-15, -11) lands
    // in bucket 0 while the interval spans [-2, -2], silently dropping
    // the match. Floor bucketing keeps negatives exact.
    val w = 10L
    val intervals = Seq(
      (1L, 900L, -15L, -11L), // strictly negative span
      (1L, 901L, -5L, 5L),    // straddles zero
      (1L, 902L, -30L, -30L)) // empty at a negative boundary
      .toDF("key", "iv_id", "s", "e")
    val points = (-40L to 10L).map(t => (1L, t)).toDF("key", "t")
    val got = Temporal.rangeJoin(points, intervals, Seq("key"), "t", "s", "e", w)
      .select($"iv_id", $"t").as[(Long, Long)].collect().toSet
    val naive = points.as("p").join(intervals.as("i"),
        $"p.key" === $"i.key" && $"p.t" >= $"i.s" && $"p.t" < $"i.e")
      .select($"iv_id", $"p.t").as[(Long, Long)].collect().toSet
    assert(got == naive)
    assert(got.contains((900L, -13L)), "negative-bucket match must survive")
    assert(got.contains((901L, -3L)) && got.contains((901L, 4L)))
  }

  test("rangeJoin plan contains no cartesian or nested-loop join") {
    val intervals = Seq((1L, 1L, 0L, 100L)).toDF("key", "iv_id", "s", "e")
    val points = Seq((1L, 1L, 5L)).toDF("key", "pid", "t")
    val plan = Temporal.rangeJoin(points, intervals, Seq("key"), "t", "s", "e", 10L)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct") && !plan.contains("NestedLoop"), plan)
  }

  test("eventRateCap ≡ window ranking twin; cap binds; earliest kept, ties to smaller id") {
    import spark.implicits._
    import org.apache.spark.sql.expressions.Window
    // (event_id, user, tus): user 1 bursts 5 events in window 0 (two at
    // t=2 — tie), user 2 has 2; window width 10
    val ev = Seq(
      (10L, 1L, 1L), (11L, 1L, 2L), (12L, 1L, 2L), (13L, 1L, 7L), (14L, 1L, 9L),
      (20L, 2L, 3L), (21L, 2L, 14L)).toDF("event_id", "user_id", "tus")
    val got = Temporal.eventRateCap(ev, "tus", maxPerWindow = 3, windowUs = 10L)
      .as[(Long, Long, Long, Int)].collect().toSet
    val w = Window.partitionBy($"user_id", $"ws").orderBy($"tus", $"event_id")
    val want = ev.withColumn("ws", $"tus" - pmod($"tus", lit(10L)))
      .withColumn("rnk", row_number().over(w)).filter($"rnk" <= 3)
      .select($"user_id", $"ws", $"event_id", $"rnk")
      .as[(Long, Long, Long, Int)].collect().toSet
    assert(got == want)
    // the burst is capped: events 13/14 (latest two of the five) dropped
    assert(!got.exists(r => r._3 == 13L || r._3 == 14L))
    // tie at t=2 keeps the smaller event_id at the earlier rank
    assert(got.find(_._3 == 11L).get._4 < got.find(_._3 == 12L).get._4)
    // null time/id/user rows drop silently (the sourceQuota contract),
    // they neither rank nor crash the (Long, Long) state encoding
    val withNulls = Seq(
      (Some(30L), Some(1L), Some(1L)), (None, Some(1L), Some(2L)),
      (Some(31L), None, Some(3L)), (Some(32L), Some(2L), None))
      .toDF("event_id", "user_id", "tus")
    val kept = Temporal.eventRateCap(withNulls, "tus", 5, 10L)
      .select($"event_id").as[Long].collect().toSeq
    assert(kept == Seq(30L))
  }
}
