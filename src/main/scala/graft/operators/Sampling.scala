package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Deterministic sampling for training-data curation.
  *
  * Random `sample()` is useless in a reproducible corpus pipeline (and
  * unverifiable against an oracle): re-runs must keep exactly the same
  * rows, and distributed workers must agree without coordination. Both
  * come free from HASH-based sampling: a row is kept iff an affine hash
  * of its stable id lands under the stratum's threshold — embarrassingly
  * parallel, no shuffle, no RNG state, and exactly reproducible in ANSI
  * SQL. This is how corpus mixtures are actually pinned in large-scale
  * training pipelines.
  */
object Sampling {

  private val A = 48271L
  private val B = 11L
  private val M = 1000003L // prime > bucket space; id*A stays far below 2^63

  /** Per-mille sampling bucket (0..999) of a stable integer id. */
  def bucket(id: Column): Column = pmod(id * A + B, lit(M)) % 1000

  /** Keep each row iff its id-bucket < rateFor(stratum) ‰ — deterministic
    * stratified downsampling (per-language, per-source, …).
    */
  def stratifiedSample(df: DataFrame, id: Column, stratum: Column,
      ratesPerMille: Map[String, Int], defaultPerMille: Int): DataFrame = {
    val rate = ratesPerMille.foldRight(lit(defaultPerMille): Column) {
      case ((k, r), acc) => when(stratum === k, lit(r)).otherwise(acc)
    }
    df.filter(bucket(id) < rate)
  }

  /** Deterministic FIXED-SIZE per-group sample: exactly min(n, |group|)
    * rows per group, chosen by ranking the group's rows on the affine
    * id-hash (ties broken by id). Rate-based sampling can't promise a
    * count ("give me exactly 1 000 docs per language for the eval set"
    * is a count, not a rate); the hash order makes the chosen set
    * reproducible, id-stable, and oracle-checkable. One shuffle keyed on
    * the group — the rank window is partitioned, never global. Skewed
    * groups rank in O(|group| log |group|) within their partitions; at
    * extreme skew pre-filter with [[stratifiedSample]] to a few × n
    * first, then rank (noted, not hidden).
    */
  def samplePerGroup(df: DataFrame, id: Column, group: Column, n: Int): DataFrame = {
    require(n > 0, s"sample size must be positive, got $n")
    require(!df.columns.contains("_smp_rn"),
      "input column _smp_rn collides with samplePerGroup's internal name")
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(group).orderBy(pmod(id * A + B, lit(M)), id)
    df.withColumn("_smp_rn", row_number().over(w))
      .filter(col("_smp_rn") <= n)
      .drop("_smp_rn")
  }

  /** Keep the best `perMille` ‰ of each group by score — the
    * quality-threshold selector ("top 25 % per language") as an exact
    * integer rule: a row survives iff `rank·1000 ≤ |group|·perMille`
    * with rank by (score DESC, id ASC), i.e. exactly
    * ⌊|group|·perMille/1000⌋ rows per group, deterministic under ties.
    * Groups too small for the fraction (⌊·⌋ = 0) are dropped whole —
    * a FRACTION keeps nothing from a group it rounds to zero on; pair
    * with [[samplePerGroup]] when a per-group floor is wanted.
    *
    * One shuffle keyed on the group: rank and group size come from the
    * same partitioned window, never a global sort. Extreme group skew
    * ranks in O(|group| log |group|) within the partition — the
    * [[samplePerGroup]] caveat applies verbatim.
    */
  def topFractionPerGroup(df: DataFrame, id: Column, group: Column,
      score: Column, perMille: Int): DataFrame = {
    require(perMille >= 0 && perMille <= 1000,
      s"perMille must be in [0, 1000], got $perMille")
    Seq("_tf_rnk", "_tf_n").foreach(c => require(!df.columns.contains(c),
      s"input column $c collides with topFractionPerGroup's internal name"))
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(group).orderBy(score.desc, id)
    df.withColumn("_tf_rnk", row_number().over(w))
      .withColumn("_tf_n", count(lit(1)).over(Window.partitionBy(group)))
      .filter(col("_tf_rnk") * 1000 <= col("_tf_n") * perMille)
      .drop("_tf_rnk", "_tf_n")
  }

  /** Deterministic seeded EPOCH SHUFFLE: the reproducible random read
    * order every training run needs. Each epoch's seed yields one global
    * permutation of the corpus — `pos` (0-based position in the permuted
    * order) and `shard` (contiguous block of that order, sizes within
    * one document of each other) — so any worker can open its shard and
    * read the same order on every re-run, with no RNG state and no
    * coordination.
    *
    * Shuffle key: the affine id-hash `(id·mult(seed) + B) mod M`, ties
    * broken by id — the repo's oracle-expressible hash family (same
    * A/B/M as [[bucket]]). The seed drives the MULTIPLIER
    * ([[epochKeyMult]]), not an additive term: adding a constant only
    * rotates the key ring (identical sort order for any corpus whose
    * keys don't straddle the wrap point), while a different multiplier
    * genuinely re-orders. M ≈ 10⁶ bounds the distinct key space: beyond ~M
    * documents the permutation degrades toward blockwise id order
    * (collided keys sort by id). At that scale swap the key expression
    * for `xxhash64(seed, id)` — same plan, stronger mixing, no bit-exact
    * DuckDB twin (the affine default exists to keep the operator
    * hash-gated).
    *
    * Scale shape: the global position is the [[PrefixSum]] distributed
    * rank over (key, id) — a range exchange on the uniform hash key (no
    * skew by construction) plus the one-row-per-partition offset table;
    * no single-task window, no driver collect. `shard` needs the total
    * count: one broadcast 1-row frame, like [[Curation.balancedShards]].
    */
  /** The seed-derived key multiplier (odd stride `A·(2·seed+1) mod M`,
    * falling back to A at the one degenerate residue). Public so an
    * oracle twin can interpolate the exact literal.
    */
  def epochKeyMult(seed: Long): Long = {
    val s = ((seed % M) + M) % M
    val m0 = (A % M) * ((2 * s + 1) % M) % M
    if (m0 == 0L) A else m0
  }

  def epochShuffle(df: DataFrame, id: Column, seed: Long, nShards: Int): DataFrame = {
    require(nShards > 0, s"nShards must be positive, got $nShards")
    require(!df.columns.contains("_shuf_key"),
      "input column _shuf_key collides with epochShuffle's internal name")
    val keyed = df
      .withColumn("_shuf_key", pmod(id * epochKeyMult(seed) + B, lit(M)))
      .withColumn("_shuf_id", id)
    val total = broadcast(df.agg(count(lit(1)).as("total")))
    PrefixSum.inclusive(keyed, Seq(col("_shuf_key"), col("_shuf_id")), lit(1L), "pos")
      .withColumn("pos", col("pos") - 1L)
      .crossJoin(total)
      .withColumn("shard", expr(s"(pos * $nShards) div total"))
      .drop("_shuf_key", "_shuf_id", "total")
  }

  /** MATERIALIZE a token-budget training mixture — the step that turns
    * mixture WEIGHTS into an actual dataset (what [[mixtureWeights]]
    * computes, this SELECTS): per source, documents are taken in the
    * seeded-hash order of [[epochShuffle]] (reproducible "random",
    * identical across re-runs and workers) until the source's token
    * budget `(weight_ppm · totalTokens) div 10⁶` is filled; the cut is
    * by tokens-BEFORE, so overspend is bounded by one document per
    * source (never silently truncating a document). A source absent
    * from the weight table selects nothing — loud in the report, not
    * silent row loss (LEFT join keeps its rows with `selected=false`).
    *
    * Output: (doc_id, source, n_tokens, selected) — one row per input
    * document, the selection as a flag so the unselected complement
    * stays auditable.
    *
    * Plan shape: token counting + hash key are narrow; the per-source
    * running token sum is ONE range-partitioned [[PrefixSum]] over
    * (source, key, doc_id) with per-source base offsets (|sources| rows)
    * broadcast back — NEVER `Window.partitionBy(source)` (≤ a dozen
    * sources would funnel the corpus through that many tasks; the
    * [[Curation.lengthBucketedPack]] discipline). The weight table
    * broadcasts (|sources| rows).
    */
  def mixtureBudget(docs: DataFrame, weights: DataFrame, totalTokens: Long,
      seed: Long = 0L): DataFrame = {
    require(totalTokens > 0, s"totalTokens must be positive, got $totalTokens")
    require(totalTokens <= Long.MaxValue / 1000000L,
      s"mixtureBudget int64 envelope: weight_ppm * totalTokens must fit int64, got $totalTokens")
    val counted = docs.select(col("doc_id"), col("source"),
        size(graft.functions.TextFunctions.tokens(col("text"))).cast("long").as("n_tokens"))
      .withColumn("hk", pmod(col("doc_id") * epochKeyMult(seed) + B, lit(M)))
    val ranked = SharedBranch.sharedBranch(PrefixSum.inclusive(counted,
      Seq(col("source"), col("hk"), col("doc_id")), col("n_tokens"), "cum"))
    val base = ranked.groupBy(col("source"))
      .agg(min(col("cum") - col("n_tokens")).as("base"))
    ranked
      .join(broadcast(base), Seq("source"))
      .join(broadcast(weights.select(col("source"), col("weight_ppm"))),
        Seq("source"), "left")
      .withColumn("cb", col("cum") - col("n_tokens") - col("base"))
      .withColumn("selected",
        col("weight_ppm").isNotNull &&
          col("cb") < expr(s"(weight_ppm * ${totalTokens}L) div 1000000"))
      .select(col("doc_id"), col("source"), col("n_tokens"), col("selected"))
  }

  /** Deterministic train/val/test split assignment — [[bucket]]'s
    * three-way face: per-mille hash thresholds over the stable id, so
    * re-runs and distributed workers agree with no coordination and no
    * RNG. `trainPerMille + valPerMille ≤ 1000`; the remainder is test.
    */
  def assignSplits(df: DataFrame, id: Column, trainPerMille: Int,
      valPerMille: Int): DataFrame = {
    require(trainPerMille >= 0 && valPerMille >= 0 &&
      trainPerMille + valPerMille <= 1000,
      s"per-mille thresholds must fit 1000, got $trainPerMille + $valPerMille")
    df.withColumn("split",
      when(bucket(id) < trainPerMille, "train")
        .when(bucket(id) < trainPerMille + valPerMille, "val")
        .otherwise("test"))
  }

  /** LEAKAGE-SAFE split — the [[assignSplits]] a careful evaluation
    * actually needs: near-duplicate documents must not straddle
    * train/test (a test doc whose near-copy sits in train leaks the
    * answer), so the split key is the document's near-dup CLUSTER
    * representative ([[TextDedup.dupClusters]] over the banded
    * MinHash-verified pair graph) — every member of a cluster hashes
    * with one key and lands in one split; documents in no pair keep
    * their own id as a singleton key.
    *
    * Scale shape: the pair graph + components machinery is the dedup
    * path's (bucketed band join, never all-pairs; guarded union-find /
    * label propagation), the cluster map returns by one doc-keyed left
    * join, and the assignment itself is the narrow hash.
    *
    * Output: (doc_id, split_key, split).
    */
  def leakageSafeSplit(docs: DataFrame, trainPerMille: Int, valPerMille: Int,
      threshold: Double = 0.5): DataFrame = {
    val clusters = TextDedup.dupClusters(
      TextDedup.minhashNearDups(docs, threshold).select(col("doc_a"), col("doc_b")))
    val keyed = docs.join(clusters, Seq("doc_id"), "left")
      .withColumn("split_key", coalesce(col("cluster_id"), col("doc_id")))
    assignSplits(keyed, col("split_key"), trainPerMille, valPerMille)
      .select(col("doc_id"), col("split_key"), col("split"))
  }

  /** Curriculum read order — [[epochShuffle]]'s deliberate sibling:
    * instead of a seeded random permutation, documents are ordered by an
    * INTEGRAL difficulty/quality score ascending (easy/clean first, the
    * curriculum-learning schedule; flip the score's sign for the reverse
    * curriculum) with id as the deterministic tiebreak, then cut into
    * `nShards` contiguous near-equal blocks: shard s of epoch 1 is the
    * easiest block, the trainer walks the shards in order.
    *
    * Scale shape: identical to [[epochShuffle]] — the global position is
    * the [[PrefixSum]] distributed rank over (score, id), a range
    * exchange plus the one-row-per-partition offset table; no
    * single-task window, no driver collect; shard sizing via one
    * broadcast 1-row total. NOTE the range exchange partitions on the
    * SCORE order, so a score distribution with heavy ties is fine
    * (ties split across range bounds by id) but a constant score
    * degenerates to id order — by design, it IS the tiebreak.
    *
    * Integral-score contract as [[Curation.sourceQuota]]: fractional
    * scores must be quantized by the caller (the `cents` discipline).
    *
    * Output: input columns + (pos, shard), pos 0-based in curriculum
    * order.
    */
  def curriculumOrder(df: DataFrame, id: Column, score: Column,
      nShards: Int): DataFrame = {
    require(nShards > 0, s"nShards must be positive, got $nShards")
    Curation.requireIntegralScore(df, score)
    val keyed = df.withColumn("_cur_score", score).withColumn("_cur_id", id)
    val total = broadcast(df.agg(count(lit(1)).as("total")))
    PrefixSum.inclusive(keyed, Seq(col("_cur_score"), col("_cur_id")), lit(1L), "pos")
      .withColumn("pos", col("pos") - 1L)
      .crossJoin(total)
      .withColumn("shard", expr(s"(pos * $nShards) div total"))
      .drop("_cur_score", "_cur_id", "total")
  }

  /** Temperature-based mixture weights — the knob that FEEDS
    * [[mixtureSchedule]]: per source, the α = 0.5 sampling share
    * p_i ∝ n_i^α of the multilingual-pretraining recipe (mBERT, XLM,
    * mT5 all flatten the source-size distribution this way so
    * low-resource sources are upsampled relative to their raw token
    * share). Exponent fixed at 1/2 because `sqrt` is the one power IEEE
    * 754 requires CORRECTLY ROUNDED — `pow`/`ln` differ across math
    * libraries and would un-oracle the report; other α come from
    * composing sqrt (α = 1/4 = sqrt∘sqrt) or the double path.
    *
    * Integer contract: the only fp step is
    * `s_i = floor(sqrt(n_tokens) · 10⁶)` (exact double input below 2⁵³
    * tokens, correctly-rounded sqrt and multiply, deterministic floor);
    * the share is then pure int64: `weight_ppm = s_i·10⁶ div Σ s_j`.
    * Fits while s_i < 9.2·10¹² — i.e. per-source token counts to ~10²⁵.
    *
    * One token-count aggregation on `source` (map-side combinable) over
    * a narrow tokenize pass; the |sources|-row report then joins a
    * broadcast 1-row total. Output: (source, n_docs, n_tokens,
    * weight_ppm), weight_ppm summing to ≤ 10⁶ (floor).
    */
  def mixtureWeights(docs: DataFrame): DataFrame = {
    // the |sources|-row aggregate feeds both the report and its own
    // total — persist it so the corpus tokenize pass runs once
    val per = SharedBranch.sharedBranch(docs.groupBy(col("source"))
      .agg(count(lit(1)).as("n_docs"),
        sum(size(graft.functions.TextFunctions.tokens(col("text"))))
          .cast("long").as("n_tokens"))
      .withColumn("s",
        floor(sqrt(col("n_tokens").cast("double")) * lit(1000000.0))))
    per.crossJoin(broadcast(per.agg(sum(col("s")).as("stot"))))
      .select(col("source"), col("n_docs"), col("n_tokens"),
        expr("(s * 1000000) div stot").as("weight_ppm"))
  }

  /** Deterministic corpus-mixture schedule: interleave strata
    * proportionally to integer weights. Row k of stratum s is placed at
    * integer position k·1000/weight(s) (ties broken by stratum, id), so a
    * weight-4 source appears 4× as often as a weight-1 source in any
    * schedule prefix — the standard way a training mixture is material-
    * ized as a single read order.
    *
    * The global sequence is materialized DISTRIBUTIVELY (zipWithIndex
    * shape, no single-partition window): range-partition on the total
    * order (position, stratum, id), rank within each partition in
    * parallel, then add per-partition offsets — a prefix sum over the
    * tiny (one row per partition) count table, broadcast-joined back.
    * Range boundaries don't affect the result: (position, stratum, id)
    * is a total order, and offsets are computed from the same
    * partitioning that ranks the rows.
    */
  def mixtureSchedule(df: DataFrame, id: Column, stratum: Column,
      weights: Map[String, Int], defaultWeight: Int, take: Int): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    // position = rank × (1000/weight): pure INTEGER multiplication — '/'
    // is float division in both engines and integer-division semantics
    // would have to match to the last row; weights must divide 1000
    (weights.values.toSeq :+ defaultWeight).foreach(v =>
      require(v > 0 && 1000 % v == 0, s"mixture weight $v must divide 1000"))
    val stride = weights.foldRight(lit(1000 / defaultWeight): Column) {
      case ((k, v), acc) => when(stratum === k, lit(1000 / v)).otherwise(acc)
    }
    val perStratum = Window.partitionBy(stratum).orderBy(id)
    val positioned = df
      .withColumn("rn", row_number().over(perStratum))
      .withColumn("position", col("rn").cast("long") * stride)
      .withColumn("_stratum", stratum)
      .withColumn("_id", id)
    // the global sequence is a running COUNT over the schedule's total
    // order — materialized distributively (no single-task window)
    PrefixSum.inclusive(positioned,
        Seq(col("position"), col("_stratum"), col("_id")), lit(1L), "seq")
      .filter(col("seq") <= take)
      .drop("_stratum", "_id")
  }
}
