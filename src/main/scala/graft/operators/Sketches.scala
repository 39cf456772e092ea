package graft.operators

import graft.functions.CmsEstimate.cms_estimate
import graft.functions.TextFunctions
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Bounded-memory frequency sketching — one member of the sketch family
  * (MinHash signatures for similarity, HyperLogLog cardinalities, Bloom
  * decontamination, Count-Min frequencies here, and the
  * `percentile_approx` rank sketch in [[Stats.quantilesApproxPerGroup]]).
  * Same verification policy across the family: sketch layouts are
  * engine-specific, so no DuckDB oracle rides on these paths; the
  * guarantees are spec-pinned against the exact twins instead
  * ([[Curation.topTokensPerGroup]]).
  *
  * Why it exists at 100 TB: the exact per-group token ranking keeps a
  * (group × vocabulary)-sized aggregation state. A Count-Min sketch is a
  * FIXED `d×w` counter grid per group — `w = ⌈e/eps⌉, d = ⌈ln(1/δ)⌉` —
  * merged associatively by Spark's `count_min_sketch` aggregate in one
  * corpus pass, with per-partition partials, regardless of vocabulary
  * size. This is also the only member of the family whose statistic
  * (frequency) supports streaming heavy-hitters with bounded state —
  * [[graft.streaming.StreamingHeavyHitters]] is that face: the same
  * sketch carried as `flatMapGroupsWithState` state.
  */
object Sketches {

  /** Per-group serialized Count-Min sketches over the token stream:
    * (groupCol, cms: binary). One map-side-combinable aggregation; the
    * output is groups-sized.
    */
  def tokenSketchPerGroup(docs: DataFrame, groupCol: String,
      eps: Double = 0.001, confidence: Double = 0.99,
      seed: Int = 42): DataFrame =
    docs
      .select(col(groupCol), explode(TextFunctions.tokens(col("text"))).as("token"))
      .groupBy(col(groupCol))
      .agg(count_min_sketch(col("token"), lit(eps), lit(confidence), lit(seed))
        .as("cms"))

  /** Approximate per-group top-k tokens: CMS estimates over a
    * candidate set drawn from a deterministic hash-of-doc_id sample.
    *
    * Shape: (1) the full stream folds into one `d×w` sketch per group
    * ([[tokenSketchPerGroup]] — bounded state, the 100 TB path); (2) a
    * `sampleDenom`-th of documents aggregates EXACTLY and keeps the top
    * `candidates` tokens per group (a heavy hitter with frequency ≥
    * eps·N appears in a Bernoulli sample of any realistic rate with
    * overwhelming probability — the standard sample-for-candidates /
    * sketch-for-counts split); (3) candidates re-rank by their CMS
    * estimate over the FULL stream. The probe stage is candidate-sized:
    * groups × candidates rows against groups sketches.
    *
    * Guarantees (CmsSketchSpec, vs the exact twin at the same k):
    * estimate ≥ exact count always (one-sided error), estimate ≤ exact +
    * eps·N with probability ≥ confidence, and rank ties break on the
    * lexicographically smaller token like the exact twin.
    *
    * Output: (groupCol, token, est, rnk), rnk ≤ k.
    */
  def topTokensApproxPerGroup(docs: DataFrame, groupCol: String, k: Int,
      eps: Double = 0.001, confidence: Double = 0.99, seed: Int = 42,
      sampleDenom: Long = 10L, candidates: Int = 256): DataFrame = {
    require(k > 0, s"k must be positive, got $k")
    require(sampleDenom >= 1, s"sampleDenom must be >= 1, got $sampleDenom")
    require(candidates >= k, s"candidates ($candidates) must cover k ($k)")
    val sketches = tokenSketchPerGroup(docs, groupCol, eps, confidence, seed)
    // deterministic sample: hash of doc_id, never a random() — re-runs
    // and the spec's exact comparison see the same candidate set
    val sampled = docs.filter(pmod(xxhash64(col("doc_id")), lit(sampleDenom)) === 0)
    val cw = Window.partitionBy(col(groupCol))
      .orderBy(col("n_sample").desc, col("token"))
    val cand = sampled
      .select(col(groupCol), explode(TextFunctions.tokens(col("text"))).as("token"))
      .groupBy(col(groupCol), col("token"))
      .agg(count(lit(1)).as("n_sample"))
      .withColumn("crnk", row_number().over(cw))
      .filter(col("crnk") <= candidates)
      .select(col(groupCol), col("token"))
    val w = Window.partitionBy(col(groupCol))
      .orderBy(col("est").desc, col("token"))
    cand
      .join(broadcast(sketches), Seq(groupCol))
      .withColumn("est", cms_estimate(col("cms"), col("token")))
      .withColumn("rnk", row_number().over(w))
      .filter(col("rnk") <= k)
      .select(col(groupCol), col("token"), col("est"), col("rnk"))
  }
}
