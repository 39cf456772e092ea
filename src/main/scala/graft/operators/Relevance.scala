package graft.operators

import graft.functions.TextFunctions
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Corpus relevance scoring: BM25 and TF-IDF. Two arithmetic modes:
  *
  *  - `bm25` — the standard double-precision formula (Robertson/Spärck
  *    Jones log-IDF), the production scoring path. Not oracle-checkable:
  *    `ln` is not correctly-rounded IEEE and differs across math
  *    libraries, and a double score sum is order-dependent.
  *  - `bm25Quantized` / `tfidfTopTerms` — integer-exact twins: the
  *    rational no-log IDF `(2N − 2df + 1)/(2df + 1)` (the argument of
  *    BM25's log) scaled to integer by truncating division, and the
  *    per-term factor kept as an exact integer fraction. Every operation
  *    is int64 `div`/`*`/`+`, bit-identical in any engine. Exact while
  *    `scale · 2N · 22 · totalTokens · tf` fits in int64 — comfortable
  *    through ~10⁹-token corpora at scale 10⁴; beyond that, partition the
  *    corpus or drop to the double path.
  *
  * Join shape (both modes): per-(doc, term) frequencies from an explode +
  * hash aggregation; document frequencies for the (small) query term set
  * broadcast back; corpus totals as a one-row broadcast cross join. The
  * only data-sized shuffles are keyed on `term` and `doc_id` — nothing
  * quadratic, no unpartitioned window.
  *
  * Deliberate scale tradeoff: the document-frequency and corpus-total
  * branches re-tokenize the corpus (2–3 map-only, column-pruned passes;
  * Catalyst's exchange reuse can't merge the branches once pruning
  * specializes them). The alternatives are worse at scale: a window
  * `count` per term puts every posting of a hot term in ONE window group
  * (skew bomb), and a non-broadcast self-join re-shuffles the full
  * posting list by term. Extra narrow passes are the cheapest currency.
  */
object Relevance {

  /** (doc_id, term, tf) — one row per distinct term per document. */
  def termFrequencies(docs: DataFrame): DataFrame =
    docs.select(col("doc_id"), explode(TextFunctions.tokens(col("text"))).as("term"))
      .groupBy(col("doc_id"), col("term"))
      .agg(count(lit(1)).as("tf"))

  private def docLengths(docs: DataFrame): DataFrame =
    docs.select(col("doc_id"),
      size(TextFunctions.tokens(col("text"))).cast("long").as("dl"))

  private def totals(docs: DataFrame): DataFrame =
    docs.agg(count(lit(1)).as("n_docs"),
      sum(size(TextFunctions.tokens(col("text")))).cast("long").as("tt"))

  /** Integer-exact BM25 at the standard defaults k1 = 1.2, b = 0.75,
    * folded to integer constants: with avgdl = tt/n_docs,
    *
    *   factor = tf·(k1+1) / (tf + k1·(1−b) + k1·b·dl/avgdl)
    *          = 22·tt·tf / (10·tt·tf + 3·tt + 9·dl·n_docs)
    *
    * (both sides multiplied by 10·tt). Per-term contribution =
    * `(idf_q · 22·tt·tf) div (10·tt·tf + 3·tt + 9·dl·n_docs)` with
    * `idf_q = (scale·(2·n_docs − 2·df + 1)) div (2·df + 1)`; the score is
    * the BIGINT sum of contributions. Query terms absent from the corpus
    * contribute no rows. Output: (doc_id, score_q, n_terms), one row per
    * document matching ≥ 1 query term.
    */
  /** Shared scoring scaffold: per-(doc, term) frequencies for the query
    * terms, annotated with document frequency (`dfd`, broadcast back),
    * document length (`dl`), and corpus totals (`n_docs`, `tt`).
    */
  private def queryTermStats(docs: DataFrame, query: Seq[String]): DataFrame = {
    require(query.nonEmpty, "empty query")
    val tf = termFrequencies(docs).filter(col("term").isin(query: _*))
    val dfq = tf.groupBy(col("term")).agg(count(lit(1)).as("dfd"))
    tf.join(broadcast(dfq), "term")
      .join(docLengths(docs), "doc_id")
      .crossJoin(broadcast(totals(docs)))
  }

  def bm25Quantized(docs: DataFrame, query: Seq[String],
      scale: Long = 10000L): DataFrame = {
    queryTermStats(docs, query)
      .withColumn("idf_q",
        expr(s"($scale * (2*n_docs - 2*dfd + 1)) div (2*dfd + 1)"))
      .withColumn("contrib",
        expr("(idf_q * 22 * tt * tf) div (10*tt*tf + 3*tt + 9*dl*n_docs)"))
      .groupBy(col("doc_id"))
      .agg(sum(col("contrib")).as("score_q"), count(lit(1)).as("n_terms"))
  }

  /** Production BM25: double scores, true log-IDF
    * `ln(1 + (N − df + 0.5)/(df + 0.5))`, arbitrary k1/b. Same join
    * shape as the quantized twin; scores are NOT cross-engine
    * reproducible (see class doc), so no oracle rides on this path.
    */
  def bm25(docs: DataFrame, query: Seq[String], k1: Double = 1.2,
      b: Double = 0.75): DataFrame = {
    queryTermStats(docs, query)
      .withColumn("idf",
        log(lit(1.0) + (col("n_docs") - col("dfd") + lit(0.5)) / (col("dfd") + lit(0.5))))
      .withColumn("contrib",
        col("idf") * (col("tf") * lit(k1 + 1.0)) /
          (col("tf") + lit(k1) * (lit(1.0 - b)
            + lit(b) * col("dl") * col("n_docs") / col("tt"))))
      .groupBy(col("doc_id"))
      .agg(sum(col("contrib")).as("score"), count(lit(1)).as("n_terms"))
  }

  /** Top `perDoc` terms of every document by quantized TF-IDF
    * `tf · ((scale·N) div df)`, ties to the lexicographically smaller
    * term. The document-frequency join is keyed on `term` and left to
    * AQE (the vocabulary need not fit in a broadcast at corpus scale);
    * the ranking window is partitioned by `doc_id`.
    */
  def tfidfTopTerms(docs: DataFrame, perDoc: Int,
      scale: Long = 10000L): DataFrame = {
    require(perDoc > 0, s"perDoc must be positive, got $perDoc")
    val tf = termFrequencies(docs)
    val dft = tf.groupBy(col("term")).agg(count(lit(1)).as("dfd"))
    val w = Window.partitionBy(col("doc_id"))
      .orderBy(col("tfidf_q").desc, col("term"))
    tf.join(dft, "term")
      .crossJoin(broadcast(totals(docs).select(col("n_docs"))))
      .withColumn("tfidf_q", expr(s"tf * (($scale * n_docs) div dfd)"))
      .withColumn("rnk", row_number().over(w))
      .filter(col("rnk") <= perDoc)
      .select(col("doc_id"), col("term"), col("tfidf_q"), col("rnk"))
  }

  /** Hashed-bag-of-words linear classifier scoring — the fastText /
    * logistic-regression quality-classifier shape (CCNet, GPT-3's
    * WebText similarity filter, FineWeb-Edu all score documents with a
    * shallow linear model before any LLM sees them). Features are token
    * hash buckets (`rollingHash(token) mod numBuckets` — the hashing
    * trick, so the model is a dense `numBuckets`-row weight table, no
    * vocabulary file); a document's score is the BIGINT sum of its
    * tokens' bucket weights (every occurrence counts — bag, not set),
    * and `keep = score > 0` is the filter verdict.
    *
    * The model arrives as a DATAFRAME `(bucket, weight)` — the trained
    * artifact in production — and joins BROADCAST against the exploded
    * token stream: the corpus-sized side shuffles once, on `doc_id`, for
    * the map-side-combinable per-doc sum; the weight table never
    * shuffles. Buckets absent from the table weigh 0 (left join), so a
    * sparse/pruned model is a smaller broadcast, not an error.
    *
    * Integer contract: weights are int64; the score is exact and
    * engine-reproducible (no sigmoid — monotone in the logit, so
    * thresholding the raw score IS thresholding the probability).
    *
    * Output: (doc_id, n_tokens, score, keep).
    */
  def hashClassifierScore(docs: DataFrame, weights: DataFrame,
      numBuckets: Int): DataFrame = {
    require(numBuckets > 0, s"numBuckets must be positive, got $numBuckets")
    docs
      .select(col("doc_id"),
        explode_outer(TextFunctions.tokens(col("text"))).as("tok"))
      .withColumn("bucket",
        when(col("tok").isNotNull,
          (TextFunctions.rollingHash(col("tok")) * 2654435761L) % numBuckets))
      .join(broadcast(weights), Seq("bucket"), "left")
      .groupBy(col("doc_id"))
      // count(tok), not count(*): the explode_outer row that keeps an
      // all-whitespace document in the output must not count as a token
      .agg(count(col("tok")).as("n_tokens"),
        coalesce(sum(col("weight")), lit(0L)).as("score"))
      .select(col("doc_id"), col("n_tokens"), col("score"),
        (col("score") > 0).as("keep"))
  }

  /** The NARROW (per-row) spelling of [[hashClassifierScore]] — the
    * STREAMING face. The weight table rides the plan as a map literal
    * and the score is one fold over the token array: no explode, no
    * join, no aggregation, NO state — the join spelling's per-doc sum
    * would be a stateful (Complete/Update-mode) aggregation on an
    * unbounded stream, while this projection composes into
    * [[graft.streaming.StreamingCuration]]-style pipelines statelessly
    * and works identically on a batch frame. Same bucket arithmetic, so
    * the two spellings are property-identical (RelevanceSpec); models
    * beyond literal size (≳10⁵ buckets bloat the plan) run the join
    * spelling inside `foreachBatch` instead (the
    * StreamingIncrementalDedup pattern).
    *
    * APPENDS (n_tokens, score, keep) to the input row — streaming
    * pipelines keep their event-time/metadata columns.
    */
  def hashClassifierScoreNarrow(docs: DataFrame, weights: Map[Long, Long],
      numBuckets: Int): DataFrame = {
    require(numBuckets > 0, s"numBuckets must be positive, got $numBuckets")
    val wm = typedlit(weights)
    val toks = TextFunctions.tokens(col("text"))
    docs
      .withColumn("n_tokens", size(toks).cast("long"))
      .withColumn("score", aggregate(toks, lit(0L), (acc, t) =>
        acc + coalesce(
          element_at(wm, (TextFunctions.rollingHash(t) * 2654435761L) % numBuckets),
          lit(0L))))
      .withColumn("keep", col("score") > 0)
  }

  /** Borda-count ensemble of quality signals — the multi-signal
    * curation step (FineWeb-style pipelines gate on several independent
    * quality estimates rather than trusting one): each signal ranks
    * every document (higher signal = better = rank 1), and the ensemble
    * score is the RANK SUM — scale-free, so signals with incomparable
    * units (a logit sum, a smoothed-probability mass, a ppm share)
    * combine without normalization, and integer-exact.
    *
    * Inputs: `(name, frame)` pairs where each frame is (doc_id,
    * s: integral, higher better). A document MISSING from a signal
    * frame (too short for bigrams, no shingles) ranks LAST for that
    * signal via an explicit sentinel — no null-ordering dependence.
    * Ranks are per-signal `row_number` over (s DESC, doc_id), computed
    * as range-partitioned [[PrefixSum]]s (never a single-task global
    * window); the join-up is |signals| doc_id-keyed equi-joins.
    *
    * Output: (doc_id, r_<name>…, borda), borda ascending-better.
    */
  def bordaEnsemble(docs: DataFrame, signals: Seq[(String, DataFrame)]): DataFrame = {
    require(signals.nonEmpty, "need at least one signal")
    require(signals.map(_._1).distinct.size == signals.size, "signal names must be unique")
    val base = docs.select(col("doc_id"))
    val ranked = signals.map { case (name, sig) =>
      val s = base.join(sig, Seq("doc_id"), "left")
        .select(col("doc_id"),
          coalesce(col("s"), lit(-1000000000000000000L)).as("s"))
      PrefixSum.inclusive(s.withColumn("_one", lit(1L)),
        Seq(col("s").desc, col("doc_id")), col("_one"), s"r_$name")
        .select(col("doc_id"), col(s"r_$name"))
    }
    ranked.reduce(_.join(_, Seq("doc_id")))
      .withColumn("borda",
        signals.map(s => col(s"r_${s._1}")).reduce(_ + _))
  }

  /** Model-size threshold for the streaming classifier face: at or
    * under this many weight rows the model rides the micro-batch plan
    * as a map LITERAL ([[hashClassifierScoreNarrow]] — stateless, no
    * join); above it, the literal becomes the dominant per-batch cost
    * (the 4096-entry gate model measures ~1 s of literal re-planning
    * per micro-batch — BENCH_r15's q_stream_hash_classifier 2.29 s idle
    * vs ~1.5 s for the other harness gates; a production 10⁵⁺-bucket
    * model would bloat every batch's analysis) and the broadcast-JOIN
    * spelling inside foreachBatch takes over
    * ([[hashClassifierStreamingFace]]).
    */
  val MaxLiteralBuckets: Int = 4096

  /** Pick the streaming spelling by MODEL SIZE — the round-15 verdict's
    * documented escape hatch made code. Left = the literal face, a
    * plan transform for the streaming DataFrame itself (models ≤
    * `maxLiteralBuckets` rows). Right = the join face, a PER-MICRO-BATCH
    * mapper to apply inside `foreachBatch` (the
    * [[graft.streaming.StreamingIncrementalDedup]] pattern): per-document
    * scoring is batch-local — no cross-batch state — so batch-wise
    * application is exact, and the model stays a broadcast instead of a
    * re-parsed plan literal. (The join spelling cannot run in the
    * stream plan itself: its per-doc aggregation would be a stateful
    * Complete/Update-mode operator on an unbounded stream.) The two
    * faces are output-identical on every input up to the narrow face
    * appending rather than projecting (RelevanceSpec pins row-level
    * agreement through a real multi-micro-batch harness run).
    */
  def hashClassifierStreamingFace(weights: DataFrame, numBuckets: Int,
      maxLiteralBuckets: Int = MaxLiteralBuckets):
      Either[DataFrame => DataFrame, DataFrame => DataFrame] = {
    require(numBuckets > 0, s"numBuckets must be positive, got $numBuckets")
    if (weights.count() <= maxLiteralBuckets)
      Left(df => hashClassifierScoreNarrow(df, weightsAsMap(weights), numBuckets))
    else
      Right(df => hashClassifierScore(df, weights, numBuckets))
  }

  /** Collect a `(bucket, weight)` model frame into the literal map
    * [[hashClassifierScoreNarrow]] embeds — driver-side, bounded by the
    * bucket count by construction (the model is dense ≤ numBuckets rows).
    */
  def weightsAsMap(weights: DataFrame): Map[Long, Long] =
    weights.select(col("bucket").cast("long"), col("weight").cast("long"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap

  /** Deterministic stand-in weight table for [[hashClassifierScore]] —
    * an affine remix of the bucket id into [−1001, 1001]. The operator
    * is model-agnostic (any trained `(bucket, weight)` frame drops in);
    * this gives specs and the oracle a reproducible model with both
    * signs well represented.
    */
  def deterministicWeights(spark: org.apache.spark.sql.SparkSession,
      numBuckets: Int): DataFrame =
    spark.range(numBuckets).select(col("id").as("bucket"),
      (((col("id") + 17L) * 2654435761L) % 2003L - 1001L).as("weight"))
}
