package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Distribution statistics over grouped data: exact order statistics and
  * distinct cardinalities, each with the approximate production path
  * named next to its exact twin.
  */
object Stats {

  /** Exact discrete quantiles per group: for each per-mille point q in
    * `qsPerMille`, the ⌈q·n/1000⌉-th smallest `valueCol` of the group
    * (1-indexed; q = 500 is the median, q = 1000 the max). The r-th order
    * statistic is well-defined under duplicate values, so the result is
    * deterministic regardless of tiebreak; `tieCol` only pins the window
    * order itself. One ranking window per group + a broadcast of the
    * (groups × quantile-points) rank table — no global sort. The
    * approximate twin at scale is `percentile_approx` (t-digest), whose
    * sketch is engine-specific and therefore carries no oracle.
    */
  def quantilesPerGroup(df: DataFrame, groupCol: String, valueCol: String,
      tieCol: String, qsPerMille: Seq[Int]): DataFrame = {
    require(qsPerMille.nonEmpty && qsPerMille.forall(q => q > 0 && q <= 1000),
      s"quantile points must be in (0, 1000], got $qsPerMille")
    val internal = Seq("_rn", "_n", "q", "quantile")
    val clashes = df.columns.toSeq.intersect(internal)
    require(clashes.isEmpty,
      s"input column(s) ${clashes.mkString(", ")} collide with quantilesPerGroup's " +
        s"internal/output names (${internal.mkString(", ")})")
    val spark = df.sparkSession
    import spark.implicits._
    // quantiles are over the NON-NULL values: a NULL is not an order
    // statistic, and Spark's nulls-first ascending sort would otherwise
    // rank NULLs ahead of every real value (SQL engines sort them last)
    val clean = df.filter(col(valueCol).isNotNull)
    val w = Window.partitionBy(col(groupCol)).orderBy(col(valueCol), col(tieCol))
    val ranked = clean.withColumn("_rn", row_number().over(w))
    val ranks = clean.groupBy(col(groupCol)).agg(count(lit(1)).as("_n"))
      .crossJoin(broadcast(qsPerMille.toDF("q")))
      .withColumn("_rn", expr("greatest(1, (q * _n + 999) div 1000)"))
      .select(col(groupCol), col("q"), col("_rn"))
    ranked.join(broadcast(ranks), Seq(groupCol, "_rn"))
      .select(col(groupCol), col("q"), col(valueCol).as("quantile"))
  }

  /** SALTED TWO-PHASE exact per-group top-k — the distributed shape for
    * "top k per group" when the group count is small and a group's
    * candidate set is large (the corpus-wide `orderBy.limit`
    * TakeOrderedAndProject has no per-group analogue, and a single
    * `Window.partitionBy(group)` would funnel each group's whole
    * candidate table through one task): phase 1 ranks inside
    * (group, hash(saltCol) % salts) — any global top-k member is top-k
    * within its salt bucket, so the survivor set (≤ salts·k per group)
    * is a SUPERSET of the answer — and phase 2 ranks the survivors,
    * whose per-group partitions are bounded at salts·k rows. The result
    * is EXACTLY the unsalted rank (the spec pins it): salting moves
    * work, never answers. `order` must be a deterministic total order
    * (break ties — the house (count DESC, key ASC) rule) or the rank
    * itself is undefined. Appends `rank` (1-based).
    */
  def topKPerGroup(df: DataFrame, groupCol: String, k: Int,
      saltCol: Column, order: Seq[Column], salts: Int = 32): DataFrame = {
    require(k > 0, s"k must be positive, got $k")
    require(salts > 0, s"salts must be positive, got $salts")
    require(order.nonEmpty, "order must name at least one column")
    val internal = Seq("_salt", "_r1", "rank")
    val clashes = df.columns.toSeq.intersect(internal)
    require(clashes.isEmpty,
      s"input column(s) ${clashes.mkString(", ")} collide with topKPerGroup's " +
        s"internal/output names (${internal.mkString(", ")})")
    val w1 = Window.partitionBy(col(groupCol), col("_salt")).orderBy(order: _*)
    val w2 = Window.partitionBy(col(groupCol)).orderBy(order: _*)
    df.withColumn("_salt", pmod(xxhash64(saltCol), lit(salts)))
      .withColumn("_r1", row_number().over(w1)).filter(col("_r1") <= k)
      .withColumn("rank", row_number().over(w2)).filter(col("rank") <= k)
      .drop("_salt", "_r1")
  }

  /** Exact distinct-cardinality profile of the corpus per group: distinct
    * documents, distinct content fingerprints, distinct tokens. The
    * approximate production path is `approx_count_distinct` (HLL++,
    * ~2% error at default rsd) — its sketch differs across engines, so
    * only the exact twin carries the oracle; the spec pins the
    * approximation against it.
    */
  /** The one frame both cardinality faces profile — exact and approx MUST
    * count the same thing, so the construction lives in one place.
    */
  private def profileFrame(docs: DataFrame, groupCol: String): DataFrame =
    docs.select(col(groupCol), col("doc_id"),
      graft.functions.RollingHash.rolling_hash(col("text")).as("fp"),
      explode_outer(graft.functions.TextFunctions.tokens(col("text"))).as("token"))

  def cardinalities(docs: DataFrame, groupCol: String): DataFrame =
    profileFrame(docs, groupCol).groupBy(col(groupCol))
      .agg(
        countDistinct(col("doc_id")).as("n_docs"),
        countDistinct(col("fp")).as("n_distinct_fp"),
        countDistinct(col("token")).as("n_distinct_tokens"))

  /** The approximate face of [[cardinalities]] — same shape, HLL++
    * sketches instead of exact distincts. No oracle (engine-specific
    * estimates); use when the distinct domain is too large to shuffle.
    */
  def cardinalitiesApprox(docs: DataFrame, groupCol: String,
      rsd: Double = 0.02): DataFrame =
    profileFrame(docs, groupCol).groupBy(col(groupCol))
      .agg(
        approx_count_distinct(col("doc_id"), rsd).as("n_docs"),
        approx_count_distinct(col("fp"), rsd).as("n_distinct_fp"),
        approx_count_distinct(col("token"), rsd).as("n_distinct_tokens"))

  /** The approximate face of [[quantilesPerGroup]] — same output shape
    * `(groupCol, q, quantile)`, `percentile_approx` (a mergeable
    * rank sketch) instead of the ranking window. This is the quantile
    * member of the bounded-sketch family (MinHash, HLL, Bloom,
    * Count-Min): per group the aggregation state is O(accuracy), not
    * O(n), and partials merge associatively — so a 100 TB distribution
    * profile is ONE map-side-combinable pass with no per-group sort,
    * where the exact twin ranks every row of the group. Guarantee:
    * rank error ≤ n/accuracy (Spark's GK-sketch bound), which
    * QuantileSketchSpec pins against the exact twin's order statistics.
    * Engine-specific sketch ⇒ no oracle (the cardinalitiesApprox
    * policy); the exact twin carries the gate.
    */
  /** Key-skew diagnostic for a shuffle key — the measurement that decides
    * whether a join/aggregation on `keyCol` needs salting ([[Curation]]'s
    * salted-agg family) or AQE skew handling, produced BEFORE paying the
    * skewed shuffle. Output: the top `k` keys by frequency with
    *  - `share_ppm`  — the key's share of all rows (parts per million),
    *  - `skew_ppm`   — its count relative to the MEAN per-key count
    *    (1 000 000 = exactly average; 20 000 000 = a 20× hot key),
    *  - `salt_factor` — ⌈count / mean⌉, the number of salt buckets that
    *    spreads this key's rows back down to the average partition load
    *    (1 for any at-or-below-average key).
    *
    * All ratios are exact integer arithmetic (`div`, never a float), so
    * the oracle is bit-exact. Envelope: `n·nk·10⁶` must fit int64 —
    * binds at count × distinct-keys ≲ 9·10¹², plenty for any per-key
    * profile worth salting (a hotter corpus overflows the DIAGNOSTIC,
    * not the engine; the guard below fails loud rather than wrap).
    *
    * Scale shape: one map-side-combinable count per key; totals are a
    * 1-row broadcast; the top-k rank is a range-partitioned [[PrefixSum]]
    * over the distinct-key frame (never a single-partition window).
    */
  def keySkew(df: DataFrame, keyCol: String, k: Int): DataFrame = {
    require(k >= 1, s"k must be >= 1, got $k")
    val counts = SharedBranch.sharedBranch(
      df.groupBy(col(keyCol)).agg(count(lit(1)).as("n")))
    val totals = counts.agg(count(lit(1)).as("nk"), sum(col("n")).as("total"))
    val ranked = PrefixSum.inclusive(counts.withColumn("_one", lit(1L)),
        Seq(col("n").desc, col(keyCol).asc), col("_one"), "rnk")
      .filter(col("rnk") <= k).drop("_one")
    ranked.crossJoin(broadcast(totals))
      .select(col(keyCol), col("n"), col("rnk").cast("int").as("rnk"),
        expr("(n * 1000000) div total").as("share_ppm"),
        // assert_true is eliminated per-row after the first pass through
        // codegen when the predicate folds; the cost is one comparison
        expr("CASE WHEN n <= 9223372036854775807 div (nk * 1000000) " +
          "THEN (n * nk * 1000000) div total " +
          "ELSE CAST(raise_error('keySkew exceeded the int64 exactness " +
          "envelope: count * distinct_keys * 1e6 overflows') AS BIGINT) " +
          "END").as("skew_ppm"),
        expr("(n * nk + total - 1) div total").as("salt_factor"))
  }

  def quantilesApproxPerGroup(df: DataFrame, groupCol: String,
      valueCol: String, qsPerMille: Seq[Int],
      accuracy: Int = 10000): DataFrame = {
    require(qsPerMille.nonEmpty && qsPerMille.forall(q => q > 0 && q <= 1000),
      s"quantile points must be in (0, 1000], got $qsPerMille")
    val spark = df.sparkSession
    import spark.implicits._
    val pct = array(qsPerMille.map(q => lit(q / 1000.0)): _*)
    df.filter(col(valueCol).isNotNull)
      .groupBy(col(groupCol))
      .agg(percentile_approx(col(valueCol), pct, lit(accuracy)).as("_qs"))
      .select(col(groupCol), posexplode(col("_qs")).as(Seq("_i", "quantile")))
      .join(broadcast(qsPerMille.zipWithIndex.map { case (q, i) => (i, q) }
        .toDF("_i", "q")), "_i")
      .select(col(groupCol), col("q"), col("quantile"))
  }
}
