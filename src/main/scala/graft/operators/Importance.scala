package graft.operators

import graft.functions.TextFunctions
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** DSIR-style importance weighting for data selection (Xie et al.,
  * "Data Selection for Language Models via Importance Resampling",
  * arXiv:2302.03169): score every raw document by how much more likely
  * its hashed n-gram features are under a TARGET distribution (an
  * in-domain sample — here a predicate over the corpus itself) than
  * under the RAW distribution, then keep the most target-like slice.
  * The reference engine has no selection scorer; this extends the
  * training-data-curation surface (SURVEY §2 extended scope) alongside
  * the quality classifier and the bigram-LM signal.
  *
  * Feature space (the paper's): hashed bag of word unigrams AND
  * bigrams, `numBuckets` buckets, bucket = (rollingHash(g)·2654435761)
  * mod numBuckets — the [[Relevance.hashClassifierScore]] bucket
  * arithmetic extended with 2-shingles. Both distributions are add-one
  * smoothed over the bucket space.
  *
  * Two arithmetic modes, the [[Relevance]] BM25 discipline:
  *
  *  - [[importanceLogWeights]] — the paper's statistic: per document,
  *    `log w = Σ_g [ln p̂_tgt(b(g)) − ln p̂_raw(b(g))]`. Production
  *    path; not oracle-checkable (`ln` is not correctly-rounded IEEE,
  *    double sums are order-dependent).
  *  - [[importanceQuantized]] — integer-exact twin: each feature
  *    instance contributes the scaled smoothed LIKELIHOOD RATIO
  *    `(scale·(ct_b+1)·(totR+B)) div ((cr_b+1)·(totT+B))` and the
  *    document score is the BIGINT sum (arithmetic-mean ratio instead
  *    of geometric — same "more target-like than raw" ordering signal,
  *    every operation int64 `div`/`·`/`+`, bit-identical in any
  *    engine). Exact while `scale·(ct_b+1)·(totR+B)` fits int64 —
  *    with scale 10⁴ that binds at `(ct_b+1)·totR ≲ 9·10¹⁴`; beyond
  *    (trillion-feature corpora with a hot bucket) raise `numBuckets`
  *    so per-bucket counts shrink, or run the double path.
  *
  * Plan shape (both modes):
  *  1. ONE tokenize+explode pass produces the feature-instance stream
  *     `(doc_id, tgt, bucket)`, persisted ([[SharedBranch]]) — it feeds
  *     the two count tables, the totals row, and the scoring join.
  *  2. bucket counts (≤ numBuckets rows each) and the one-row totals
  *     BROADCAST back onto the stream: the corpus-sized side shuffles
  *     exactly once, on `doc_id`, for the map-side-combinable per-doc
  *     sum. Buckets are uniform by hash, so no skewed exchange.
  *  3. docs with no features survive via a left join at score 0.
  *
  * Nothing quadratic, no unpartitioned window, no driver-side loop.
  * The target sample rides the same scan as the raw corpus (a
  * predicate); a SEPARATE in-domain frame works identically by unioning
  * it in with `tgt = true` before calling.
  */
object Importance {

  /** Feature-instance stream `(doc_id, tgt, bucket)`: one row per word
    * unigram and bigram occurrence, `explode_outer` so featureless docs
    * keep a null-bucket row (the left-join-at-zero anchor).
    */
  private[operators] def featureStream(docs: DataFrame, targetPred: Column,
      numBuckets: Int): DataFrame = {
    val w = TextFunctions.tokens(col("text"))
    docs
      .select(col("doc_id"), targetPred.as("tgt"),
        explode_outer(concat(w, TextFunctions.shingles(w, 2))).as("g"))
      .select(col("doc_id"), col("tgt"),
        when(col("g").isNotNull,
          (TextFunctions.rollingHash(col("g")) * 2654435761L) % numBuckets)
          .as("bucket"))
  }

  /** Integer-exact importance score. Output: (doc_id, n_feats, score_q,
    * keep) — `keep` iff the mean scaled ratio exceeds 1 (`score_q >
    * scale·n_feats`), i.e. the document is more target-like than the
    * raw average. `targetPred` is evaluated against the input columns.
    */
  def importanceQuantized(docs: DataFrame, targetPred: Column,
      numBuckets: Int = 4096, scale: Long = 10000L): DataFrame = {
    require(numBuckets > 0, s"numBuckets must be positive, got $numBuckets")
    // the in-plan guard below only bounds the NUMERATOR; the dominance
    // argument (denominator ≤ numerator bound) needs cr+1 ≤ totR+B and
    // tott+B ≤ scale·(totR+B) — the latter holds for every table only
    // when numBuckets ≤ scale·1, i.e. B ≤ scale (tott ≤ totR always).
    // Outside that regime the denominator could wrap while the guard
    // passes, so refuse loudly instead.
    require(numBuckets <= scale,
      s"importanceQuantized needs numBuckets ($numBuckets) <= scale ($scale): " +
        "the int64 envelope guard's dominance argument breaks otherwise")
    val e = SharedBranch.sharedBranch(
      featureStream(docs, targetPred, numBuckets).filter(col("bucket").isNotNull))
    val rawc = e.groupBy(col("bucket")).agg(count(lit(1)).as("cr"))
    val tgtc = e.filter(col("tgt")).groupBy(col("bucket")).agg(count(lit(1)).as("ct"))
    val tots = e.agg(count(lit(1)).as("totr"),
      count(when(col("tgt"), 1)).as("tott"))
    val scored = e
      .join(broadcast(rawc), Seq("bucket"))
      .join(broadcast(tgtc), Seq("bucket"), "left")
      .crossJoin(broadcast(tots))
      .select(col("doc_id"),
        // the trailing coalesce(assert_true(..), 0) adds 0 on every
        // in-envelope row and RAISES when the documented int64 bound
        // (scale·(ct+1)·(totR+B) ≤ Long.Max) would wrap — non-ANSI
        // multiply overflow is silent, and a silently corrupted score is
        // the one failure mode an exact-arithmetic twin must not have.
        // The bound is checked in divided form so the check itself
        // cannot overflow; the denominator product is dominated by the
        // numerator bound (cr+1 ≤ totR+B, tott+B ≤ totR+B) so guarding
        // the numerator suffices.
        expr(s"($scale * (coalesce(ct, 0) + 1) * (totr + $numBuckets))" +
          s" div ((cr + 1) * (tott + $numBuckets))" +
          s" + coalesce(assert_true(coalesce(ct, 0) + 1 <=" +
          s" (9223372036854775807 div $scale) div (totr + $numBuckets)," +
          s" 'importanceQuantized exceeded the int64 exactness envelope" +
          s" (hot bucket too large): raise numBuckets or use" +
          s" importanceLogWeights'), 0)").as("lr"))
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_feats"), sum(col("lr")).as("score_q"))
    docs.select(col("doc_id")).join(scored, Seq("doc_id"), "left")
      .select(col("doc_id"),
        coalesce(col("n_feats"), lit(0L)).as("n_feats"),
        coalesce(col("score_q"), lit(0L)).as("score_q"))
      .withColumn("keep", col("score_q") > lit(scale) * col("n_feats"))
  }

  /** Exact int64 truncating division as a Column — the `div` the
    * quantized twin's `expr` strings use, constructible inside HOF
    * lambdas (where SQL-string `expr` can't reference lambda
    * variables). A double `/`+`floor` spelling would round-to-nearest
    * before flooring and can disagree with integer division near exact
    * quotients once operands grow.
    */
  private def idiv(a: org.apache.spark.sql.Column, b: org.apache.spark.sql.Column) = {
    import org.apache.spark.sql.GraftColumnBridge.{toColumn, toExpression}
    toColumn(org.apache.spark.sql.catalyst.expressions.IntegralDivide(
      toExpression(a), toExpression(b)))
  }

  /** Fit the frozen model [[importanceScoreNarrow]] applies: collect the
    * bucket count tables and totals driver-side — bounded by
    * ≤ 2·numBuckets rows by construction (the [[Relevance.weightsAsMap]]
    * bridge shape). Returns (targetCounts, rawCounts, totT, totR).
    */
  def fitCounts(docs: DataFrame, targetPred: Column, numBuckets: Int = 4096)
      : (Map[Long, Long], Map[Long, Long], Long, Long) = {
    val e = SharedBranch.sharedBranch(
      featureStream(docs, targetPred, numBuckets).filter(col("bucket").isNotNull))
    val cr = e.groupBy(col("bucket")).agg(count(lit(1)).as("c"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val ct = e.filter(col("tgt")).groupBy(col("bucket")).agg(count(lit(1)).as("c"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val Array(totr, tott) = e.agg(count(lit(1)),
      count(when(col("tgt"), 1))).collect().map(r => Array(r.getLong(0), r.getLong(1))).head
    (ct, cr, tott, totr)
  }

  /** The NARROW (per-row) spelling — the STREAMING face, the
    * [[Relevance.hashClassifierScoreNarrow]] pattern and the DSIR
    * deployment shape: distributions are FIT once on a reference corpus
    * ([[fitCounts]]) and ride the plan as map literals; the score is one
    * fold over the feature array — no explode, no join, no aggregation,
    * NO state — so it runs append-mode on an unbounded stream and
    * composes into [[graft.streaming.StreamingCuration]]-style
    * pipelines. On the SAME corpus it fit, it is row-identical to
    * [[importanceQuantized]] (ImportanceSpec pins this); buckets the fit
    * never saw score with ct = cr = 0 — the same add-one smoothing,
    * consistently extended.
    *
    * APPENDS (n_feats, score_q, keep) to the input row. Models beyond
    * literal size (numBuckets ≳ 10⁵ bloats the plan) run the join
    * spelling inside `foreachBatch` instead.
    */
  def importanceScoreNarrow(docs: DataFrame, targetCounts: Map[Long, Long],
      rawCounts: Map[Long, Long], totT: Long, totR: Long,
      numBuckets: Int = 4096, scale: Long = 10000L): DataFrame = {
    require(numBuckets > 0, s"numBuckets must be positive, got $numBuckets")
    require(numBuckets <= scale,
      s"importanceScoreNarrow needs numBuckets ($numBuckets) <= scale ($scale): " +
        "the int64 envelope guard's dominance argument breaks otherwise")
    // frozen-model twin of the quantized path's in-plan envelope guard:
    // the counts are driver values here, so the int64 bound is checkable
    // once, up front, in divided (overflow-free) form
    val maxCt = if (targetCounts.isEmpty) 0L else targetCounts.values.max
    require(maxCt + 1 <= (Long.MaxValue / scale) / (totR + numBuckets),
      s"importanceScoreNarrow exceeds the int64 exactness envelope " +
        s"(hot bucket ${maxCt}, totR $totR): raise numBuckets or score with " +
        s"importanceLogWeights")
    val ctm = typedlit(targetCounts)
    val crm = typedlit(rawCounts)
    val w = TextFunctions.tokens(col("text"))
    val feats = concat(w, TextFunctions.shingles(w, 2))
    docs
      .withColumn("n_feats", size(feats).cast("long"))
      .withColumn("score_q", aggregate(feats, lit(0L), (acc, g) => {
        val b = (TextFunctions.rollingHash(g) * 2654435761L) % numBuckets
        acc + idiv(
          lit(scale) * (coalesce(element_at(ctm, b), lit(0L)) + 1L) * lit(totR + numBuckets),
          (coalesce(element_at(crm, b), lit(0L)) + 1L) * lit(totT + numBuckets))
      }))
      .withColumn("keep", col("score_q") > lit(scale) * col("n_feats"))
  }

  /** The SELECTION step that closes the DSIR loop: keep the global top
    * `perMille`‰ of documents by mean per-feature score (`score_q div
    * n_feats` — document-length-free, integer-exact), ties to the
    * smaller doc_id. The global rank is a range-partitioned
    * [[PrefixSum]] — the grouped top-fraction operator
    * ([[Sampling.topFractionPerGroup]]) would put the WHOLE corpus in
    * one ranking window here (single group = single task), exactly the
    * skew its per-group window exists to avoid. Input: the
    * [[importanceQuantized]] output. Output: (doc_id, mean_q, rnk,
    * selected) — featureless docs carry mean 0 and rank last among
    * zeros.
    */
  def selectTopFraction(scored: DataFrame, perMille: Int): DataFrame = {
    require(perMille >= 0 && perMille <= 1000,
      s"perMille must be in [0, 1000], got $perMille")
    val m = scored.select(col("doc_id"),
      expr("score_q div greatest(n_feats, 1)").as("mean_q"))
    val ranked = PrefixSum.inclusive(m.withColumn("_one", lit(1L)),
      Seq(col("mean_q").desc, col("doc_id")), col("_one"), "rnk")
    ranked.crossJoin(broadcast(ranked.agg(count(lit(1)).as("n_docs"))))
      .select(col("doc_id"), col("mean_q"), col("rnk"),
        (col("rnk") * 1000 <= col("n_docs") * perMille).as("selected"))
  }

  /** The score cutoff that [[selectTopFraction]] realizes on a FIT
    * corpus: the mean per-feature score of the rank-T document (T =
    * ⌊n·perMille/1000⌋ under the batch total order mean_q DESC, doc_id
    * ASC) — i.e. the smallest mean_q the batch selection admits. None
    * when the fraction admits nothing (T = 0, e.g. perMille 0 or a
    * tiny corpus). ONE bounded collect (a 1-row min over the selected
    * slice of the prefix-sum ranking); the threshold then rides a
    * stream as a frozen literal — [[selectByFrozenThreshold]].
    */
  def selectionThreshold(scored: DataFrame, perMille: Int): Option[Long] = {
    val row = selectTopFraction(scored, perMille)
      .filter(col("selected")).agg(min(col("mean_q"))).collect()(0)
    if (row.isNullAt(0)) None else Some(row.getLong(0))
  }

  /** The STREAMING face of the DSIR selection step — the frozen-fit
    * discipline ([[fitCounts]]/[[importanceScoreNarrow]]) extended to
    * SELECTION: [[selectTopFraction]] is batch-global by necessity (a
    * rank against the whole corpus), so an unbounded stream instead
    * applies a THRESHOLD computed once on the fit corpus
    * ([[selectionThreshold]]) as a stateless per-row filter — no rank,
    * no aggregation, no state; runs append-mode and composes with
    * [[importanceScoreNarrow]]'s pipeline (which already emits the
    * score_q/n_feats this consumes).
    *
    * Tolerance contract (ImportanceSpec pins it): on the corpus the
    * threshold was fit from, the frozen selection is a SUPERSET of the
    * batch top-fraction, and every extra document sits exactly AT the
    * threshold (`mean_q == t`) — the batch rule cuts threshold ties by
    * doc_id, which a stateless per-row filter cannot see; documents
    * strictly above or below the cutoff classify identically. None ⇒
    * nothing selected (the T = 0 batch behavior).
    *
    * APPENDS (mean_q, selected) to the input row.
    */
  def selectByFrozenThreshold(scored: DataFrame, threshold: Option[Long]): DataFrame =
    scored
      .withColumn("mean_q", expr("score_q div greatest(n_feats, 1)"))
      .withColumn("selected",
        threshold.map(t => col("mean_q") >= lit(t)).getOrElse(lit(false)))

  /** The paper's log-ratio statistic (production path): per document,
    * `log_w = Σ_g [ln((ct+1)/(totT+B)) − ln((cr+1)/(totR+B))]`.
    * Output: (doc_id, n_feats, log_w). Double arithmetic — rank with
    * it, don't hash-compare it across engines (ImportanceSpec pins its
    * ordering agreement with the quantized twin on separated corpora).
    */
  def importanceLogWeights(docs: DataFrame, targetPred: Column,
      numBuckets: Int = 4096): DataFrame = {
    require(numBuckets > 0, s"numBuckets must be positive, got $numBuckets")
    val e = SharedBranch.sharedBranch(
      featureStream(docs, targetPred, numBuckets).filter(col("bucket").isNotNull))
    val rawc = e.groupBy(col("bucket")).agg(count(lit(1)).as("cr"))
    val tgtc = e.filter(col("tgt")).groupBy(col("bucket")).agg(count(lit(1)).as("ct"))
    val tots = e.agg(count(lit(1)).as("totr"),
      count(when(col("tgt"), 1)).as("tott"))
    val scored = e
      .join(broadcast(rawc), Seq("bucket"))
      .join(broadcast(tgtc), Seq("bucket"), "left")
      .crossJoin(broadcast(tots))
      .select(col("doc_id"),
        (log((coalesce(col("ct"), lit(0L)) + 1L).cast("double") /
            (col("tott") + numBuckets).cast("double")) -
          log((col("cr") + 1L).cast("double") /
            (col("totr") + numBuckets).cast("double"))).as("lw"))
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_feats"), sum(col("lw")).as("log_w"))
    docs.select(col("doc_id")).join(scored, Seq("doc_id"), "left")
      .select(col("doc_id"),
        coalesce(col("n_feats"), lit(0L)).as("n_feats"),
        coalesce(col("log_w"), lit(0.0)).as("log_w"))
  }
}
