package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Temporal joins the relational surface lacks as built-ins: backward
  * as-of join and interval (range) join. Both are shaped for scale — a
  * single shuffle keyed on the join keys (as-of) or on (key, time-bucket)
  * (range); neither ever enumerates a cross product, and no window in
  * either plan is unpartitioned.
  */
object Temporal {

  /** Backward as-of join: for every left row, attach the right row with
    * the greatest `(timeCol, tieCol)` such that `right.timeCol <=
    * left.timeCol`, matching on `keys`. Left rows with no prior right row
    * keep NULLs (left-outer semantics).
    *
    * Implemented as the sorted-union trick — one shuffle on `keys`, no
    * per-row probe join: tag each side, union by name, and take the last
    * non-null right-payload STRUCT over a running window ordered by
    * `(time, side, tie)`. Right rows sort before left rows at equal time,
    * so "at or before" includes exact ties; packing the right payload in
    * one struct keeps all its columns from the SAME matched row (per-
    * column `last(ignoreNulls)` could mix rows when payload columns are
    * legitimately NULL).
    *
    * `rightCols` are the right-side payload columns to carry (they must
    * not collide with left column names — alias on the way in).
    * `(keys, timeCol, tieCol)` must be unique on the right side for a
    * deterministic result.
    */
  def asofJoinBackward(left: DataFrame, rightIn: DataFrame, keys: Seq[String],
      timeCol: String, tieCol: String, rightCols: Seq[String]): DataFrame =
    asofJoin(left, rightIn, keys, timeCol, tieCol, rightCols, backward = true)

  /** Forward as-of join: the mirror of [[asofJoinBackward]] — for every
    * left row, the right row with the SMALLEST `(timeCol, tieCol)` such
    * that `right.timeCol >= left.timeCol`. Same sorted-union plan with
    * the orders reversed.
    */
  def asofJoinForward(left: DataFrame, rightIn: DataFrame, keys: Seq[String],
      timeCol: String, tieCol: String, rightCols: Seq[String]): DataFrame =
    asofJoin(left, rightIn, keys, timeCol, tieCol, rightCols, backward = false)

  /** [[asofJoinBackward]] with a STALENESS BOUND (pandas
    * `merge_asof(tolerance=)`): the matched prior right row only counts
    * while `left.time − right.time ≤ toleranceMicros`; a staler match
    * nulls out exactly like no-match (a quote older than the bound is
    * not a quote). Same sorted-union plan — the right event time rides
    * the payload struct and the bound is a narrow post-mask, so the
    * tolerance costs nothing at any scale.
    */
  def asofJoinBackwardTolerance(left: DataFrame, rightIn: DataFrame,
      keys: Seq[String], timeCol: String, tieCol: String,
      rightCols: Seq[String], toleranceMicros: Long): DataFrame = {
    require(toleranceMicros >= 0,
      s"toleranceMicros must be >= 0, got $toleranceMicros")
    val rt = "_asof_rt"
    require(!(left.columns ++ rightIn.columns).contains(rt),
      s"input column $rt collides with asofJoinBackwardTolerance's internal name")
    val joined = asofJoin(left, rightIn.withColumn(rt, col(timeCol)),
      keys, timeCol, tieCol, rightCols :+ rt, backward = true)
    val within = col(rt).isNotNull &&
      (col(timeCol) - col(rt)) <= toleranceMicros
    joined.select(left.columns.map(col) ++
      rightCols.map(c => when(within, col(c)).otherwise(lit(null)).as(c)): _*)
  }

  /** [[asofJoinForward]] with the mirror staleness bound: the matched
    * next right row counts only while `right.time − left.time ≤
    * toleranceMicros` (the earliest at-or-after row is also the
    * closest, so the post-mask is exact for the same monotonicity
    * reason as the backward spelling).
    */
  def asofJoinForwardTolerance(left: DataFrame, rightIn: DataFrame,
      keys: Seq[String], timeCol: String, tieCol: String,
      rightCols: Seq[String], toleranceMicros: Long): DataFrame = {
    require(toleranceMicros >= 0,
      s"toleranceMicros must be >= 0, got $toleranceMicros")
    val rt = "_asof_rt"
    require(!(left.columns ++ rightIn.columns).contains(rt),
      s"input column $rt collides with asofJoinForwardTolerance's internal name")
    val joined = asofJoin(left, rightIn.withColumn(rt, col(timeCol)),
      keys, timeCol, tieCol, rightCols :+ rt, backward = false)
    val within = col(rt).isNotNull &&
      (col(rt) - col(timeCol)) <= toleranceMicros
    joined.select(left.columns.map(col) ++
      rightCols.map(c => when(within, col(c)).otherwise(lit(null)).as(c)): _*)
  }

  private def asofJoin(left: DataFrame, rightIn: DataFrame, keys: Seq[String],
      timeCol: String, tieCol: String, rightCols: Seq[String],
      backward: Boolean): DataFrame = {
    val leftCols = left.columns.toSeq
    require(rightCols.intersect(leftCols).isEmpty,
      s"right payload columns ${rightCols.intersect(leftCols)} collide with the left schema")
    val internal = Seq("_side", "_pay", "_tie", "_match")
    val clashes = (leftCols ++ rightIn.columns).distinct.intersect(internal)
    require(clashes.isEmpty,
      s"input column(s) ${clashes.mkString(", ")} collide with asofJoin's " +
        s"internal names (${internal.mkString(", ")})")
    // a NULL right time can never satisfy the time comparison (SQL
    // comparison semantics) — unfiltered, nulls-first/last ordering would
    // make such a row a universal match
    val right = rightIn.filter(col(timeCol).isNotNull)
    val payload = struct((rightCols :+ tieCol).map(col): _*)
    val l = left.select(leftCols.map(col) :+ lit(1).as("_side")
      :+ lit(null).cast(right.select(payload).schema.head.dataType).as("_pay")
      :+ col(tieCol).as("_tie"): _*)
    val r = right.select(
      keys.map(col) ++ leftCols.filterNot(keys.contains).filterNot(_ == timeCol)
          .map(c => lit(null).cast(left.schema(c).dataType).as(c))
        :+ col(timeCol) :+ lit(0).as("_side") :+ payload.as("_pay")
        :+ col(tieCol).as("_tie"): _*)
    // backward scans time ascending (last prior right row wins); forward
    // scans descending (so "last" is the EARLIEST at-or-after right row,
    // ties to the smaller tie id). _side ascending keeps right rows
    // before left at equal time in both directions — inclusive bound.
    val ord =
      if (backward) Seq(col(timeCol).asc, col("_side").asc, col("_tie").asc)
      else Seq(col(timeCol).desc, col("_side").asc, col("_tie").desc)
    val w = Window.partitionBy(keys.map(col): _*)
      .orderBy(ord: _*)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    // a NULL LEFT time matches nothing either (comparison is NULL) — in
    // the forward sort such rows land after every right row, so the
    // window alone would hand them a match; mask it out explicitly
    l.unionByName(r.select(l.columns.map(col): _*))
      .withColumn("_match",
        when(col(timeCol).isNotNull,
          last(col("_pay"), ignoreNulls = true).over(w)))
      .filter(col("_side") === 1)
      .select(leftCols.map(col) ++ rightCols.map(c => col(s"_match.$c").as(c)): _*)
  }

  /** Interval (range) join: pair every point with every interval of the
    * same `keys` whose `[startCol, endCol)` half-open range contains
    * `timeCol`. Never a cross product: each interval explodes to the
    * fixed-width time buckets it covers, points map to their single
    * bucket, and the join is an equi-join on `(keys, bucket)` plus the
    * residual containment filter. A (point, interval) match shares
    * exactly one bucket — the point's own — so no post-join dedup is
    * needed. `bucketWidth` trades bucket-row inflation (long intervals →
    * many buckets) against candidate-pair selectivity; set it near the
    * typical interval length.
    *
    * Bucket indices use exact integer FLOOR division — `(t - pmod(t, w))
    * div w` — not doubles (`floor(x / w)` loses ulps past 2⁵³) and not
    * bare truncating `div` (which rounds toward zero, so negative-epoch
    * points near zero would land one bucket high and silently drop
    * matches). The pmod form is floor-exact for any sign; the division is
    * exact because the numerator is a multiple of `w`. (Times within `w`
    * of Long.MinValue would overflow the subtraction — a magnitude no
    * epoch encoding approaches.)
    */
  def rangeJoin(points: DataFrame, intervals: DataFrame, keys: Seq[String],
      timeCol: String, startCol: String, endCol: String,
      bucketWidth: Long): DataFrame = {
    require(bucketWidth > 0, s"bucketWidth must be positive, got $bucketWidth")
    def floorBucket(e: String): String =
      s"(($e) - pmod(($e), $bucketWidth)) div $bucketWidth"
    // an empty half-open interval contains nothing; dropping it early also
    // keeps `sequence(startBucket, endBucket)` ascending (Spark's sequence
    // runs DESCENDING when stop < start, which a boundary-aligned empty
    // interval would trigger)
    val iv = intervals.filter(col(endCol) > col(startCol)).withColumn("_bucket",
      explode(sequence(expr(floorBucket(s"`$startCol`")),
        expr(floorBucket(s"`$endCol` - 1")))))
    val pt = points.withColumn("_bucket", expr(floorBucket(s"`$timeCol`")))
    pt.join(iv, keys :+ "_bucket")
      .filter(col(timeCol) >= col(startCol) && col(timeCol) < col(endCol))
      .drop("_bucket")
  }

  /** Per-key event RATE CAP: keep at most `maxPerWindow` events per
    * (user, fixed time window), preferring the EARLIEST (ties to the
    * smaller event_id) — the ingestion-side throttle against runaway
    * producers and bot bursts, and [[graft.operators.Curation.sourceQuota]]'s
    * event-time sibling. Windows are epoch-aligned `windowUs` buckets of
    * the epoch-µs time column (the [[graft.sources.Tables.epochMicros]]
    * adapter's output — never a raw physical timestamp).
    *
    * Same bounded-state shape as every quota here: the `BoundedTopN`
    * Aggregator keyed on (user_id, window) holds O(maxPerWindow) state
    * per key and map-side combines, so a key with a million-event burst
    * ships ≤ cap·partitions rows — the ranking-window spelling (the
    * oracle twin) would ship the entire burst to one reducer, which is
    * exactly the input this operator exists for. Earliest-first =
    * score −tus (BoundedTopN ranks score descending, id ascending).
    *
    * Output: (user_id, window_start_us, event_id, qrank),
    * qrank 1..maxPerWindow in arrival order.
    */
  def eventRateCap(events: DataFrame, tusCol: String, maxPerWindow: Int,
      windowUs: Long): DataFrame = {
    require(windowUs > 0, s"windowUs must be positive, got $windowUs")
    events
      // the sourceQuota null contract: a null-time or null-id event has
      // no arrival rank — drop it rather than let the aggregator's
      // (Long, Long) encoding reject it at runtime
      .filter(col(tusCol).isNotNull && col("event_id").isNotNull &&
        col("user_id").isNotNull)
      .withColumn("window_start_us",
        col(tusCol) - pmod(col(tusCol), lit(windowUs)))
      .groupBy(col("user_id"), col("window_start_us"))
      .agg(graft.functions.BoundedTopN
        .bounded_top_n(-col(tusCol), col("event_id"), maxPerWindow).as("kept"))
      .select(col("user_id"), col("window_start_us"),
        posexplode(col("kept")).as(Seq("p", "event_id")))
      .select(col("user_id"), col("window_start_us"), col("event_id"),
        (col("p") + 1).cast("int").as("qrank"))
  }
}
