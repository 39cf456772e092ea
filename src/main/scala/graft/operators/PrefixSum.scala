package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Distributed running sums over a total order — the zipWithIndex shape,
  * generalized. A naive `sum().over(Window.orderBy(...))` funnels the whole
  * dataset through ONE task; this materializes the same result with no
  * unpartitioned window anywhere:
  *
  *  1. range-partition on the order (contiguous global ranges per
  *     partition; explicit partition count so every branch sees the same
  *     partitioning under AQE),
  *  2. per-partition running sums in parallel windows keyed by partition
  *     id,
  *  3. per-partition totals — one row per partition — prefix-summed via a
  *     tiny triangle self-join and broadcast back as offsets.
  *
  * `orderCols` must be a total order (no ties), otherwise running sums
  * within a tie group are nondeterministic.
  */
object PrefixSum {

  /** Append `outCol` = inclusive running sum of `value` (cast to long)
    * over the total order `orderCols`. Row count and all other columns are
    * preserved.
    */
  def inclusive(df: DataFrame, orderCols: Seq[Column], value: Column,
      outCol: String): DataFrame = {
    val internal = Seq("_psum_v", "_pid", "_run", "_cnt", "_offset")
    val clashes = df.columns.toSeq.intersect(internal) ++
      (if (internal.contains(outCol)) Seq(outCol) else Nil)
    require(clashes.isEmpty,
      s"input/output column(s) ${clashes.distinct.mkString(", ")} collide with " +
        s"PrefixSum's internal names (${internal.mkString(", ")})")
    val nPart = df.sparkSession.sessionState.conf.numShufflePartitions
    val tagged = df.withColumn("_psum_v", value.cast("long"))
    // The range exchange MUST be physically executed exactly once.
    // RangePartitioner picks its bounds from a reservoir SAMPLE seeded by
    // the underlying rdd id; two independent physical executions of the
    // same repartitionByRange (exchange reuse does not fire across the
    // branches below — column pruning specializes each subtree) can pick
    // DIFFERENT bounds once input partitions exceed the per-partition
    // sample size, at which point `_pid` in the running-sum branch
    // disagrees with the partitioning behind the per-partition totals and
    // the prefix sums are silently wrong. Persisting the ranged frame
    // makes both consumers read the SAME materialized partitions (one
    // InMemoryRelation, one exchange); the cache is written by whichever
    // action runs first and holds the pruned (orderCols, value, payload)
    // rows once — the price of determinism, spilled to disk if it
    // doesn't fit (SharedBranch documents the persist/release lifecycle).
    val ranged = SharedBranch.sharedBranch(
      tagged.repartitionByRange(nPart, orderCols: _*)
        .withColumn("_pid", spark_partition_id()))
    val wLocal = Window.partitionBy(col("_pid")).orderBy(orderCols: _*)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val local = ranged.withColumn("_run", sum(col("_psum_v")).over(wLocal))
    // The totals branch re-derives from `ranged` rather than `local` —
    // partial aggregation combines map-side over the cached partitions,
    // so its exchange carries ~one row per task instead of re-sorting the
    // full rows a second time.
    val totals = ranged.groupBy(col("_pid")).agg(sum(col("_psum_v")).as("_cnt"))
    val offsets = totals.as("a")
      .join(broadcast(totals.as("b")), col("b._pid") < col("a._pid"), "left")
      .groupBy(col("a._pid").as("_pid"))
      .agg(coalesce(sum(col("b._cnt")), lit(0L)).as("_offset"))
    local.join(broadcast(offsets), "_pid")
      .withColumn(outCol, col("_offset") + col("_run"))
      .drop("_pid", "_run", "_offset", "_psum_v")
  }

  /** Append `outCol` = corpus-global DENSE RANK of `orderCols` (1-based;
    * equal keys share a rank) to EVERY row, with no unpartitioned window
    * and no distinct-then-rejoin: RangePartitioner maps a key value to
    * exactly ONE partition (contiguous global ranges), so the global
    * dense rank is the per-partition dense rank plus the count of
    * DISTINCT keys in all earlier partitions — one range exchange of the
    * input, parallel per-partition window ranks, and a partition-count-
    * sized offset triangle, exactly the [[inclusive]] skeleton.
    *
    * The `distinct + inclusive(_one) + equi-join back` spelling computes
    * the same rank with THREE corpus-scale exchanges (the distinct, the
    * ranked table's join side, the probe side); this is the one-exchange
    * form for rank attachment at full-corpus cardinality (guide §2.4).
    * Ties are well-defined (dense rank), so `orderCols` need not be a
    * total order.
    */
  def denseRank(df: DataFrame, orderCols: Seq[Column],
      outCol: String): DataFrame = {
    val internal = Seq("_pid", "_lrank", "_cntd", "_offset")
    val clashes = df.columns.toSeq.intersect(internal) ++
      (if (internal.contains(outCol)) Seq(outCol) else Nil)
    require(clashes.isEmpty,
      s"input/output column(s) ${clashes.distinct.mkString(", ")} collide with " +
        s"PrefixSum's internal names (${internal.mkString(", ")})")
    val nPart = df.sparkSession.sessionState.conf.numShufflePartitions
    // persisted for the same reason as [[inclusive]]'s ranged frame: the
    // rank branch and the per-partition distinct totals must read ONE
    // physical execution of the sampled range exchange
    val ranged = SharedBranch.sharedBranch(
      df.repartitionByRange(nPart, orderCols: _*)
        .withColumn("_pid", spark_partition_id()))
    val wLocal = Window.partitionBy(col("_pid")).orderBy(orderCols: _*)
    val local = ranged.withColumn("_lrank", dense_rank().over(wLocal))
    val totals = ranged.groupBy(col("_pid"))
      .agg(countDistinct(struct(orderCols: _*)).as("_cntd"))
    val offsets = totals.as("a")
      .join(broadcast(totals.as("b")), col("b._pid") < col("a._pid"), "left")
      .groupBy(col("a._pid").as("_pid"))
      .agg(coalesce(sum(col("b._cntd")), lit(0L)).as("_offset"))
    local.join(broadcast(offsets), "_pid")
      .withColumn(outCol, col("_offset") + col("_lrank").cast("long"))
      .drop("_pid", "_lrank", "_offset")
  }
}
