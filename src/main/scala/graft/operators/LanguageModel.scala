package graft.operators

import graft.functions.TextFunctions
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Corpus-trained bigram language-model scoring — the CCNet-style
  * "perplexity against an in-domain LM" quality signal (Wenzek et al.,
  * arXiv:1911.00359; the Gopher and LLaMA data pipelines filter on the
  * same statistic). The reference engine has no LM scorer; this is part
  * of the training-data-curation surface this library adds on top of the
  * reference's operator set (SURVEY §2 extended scope).
  *
  * Model: maximum-likelihood bigram counts over the corpus itself with a
  * capped vocabulary (top `maxVocab` tokens by frequency, ties to the
  * lexicographically smaller token; everything else maps to `<unk>`) and
  * add-one smoothing over the `|vocab|+1`-type event space. Scoring a
  * corpus against a model trained on itself ranks each document by how
  * typical its token transitions are — word-salad and boilerplate score
  * apart from modal text, which is exactly the filtering signal.
  *
  * Two arithmetic modes, the [[Relevance]] BM25 discipline:
  *
  *  - [[bigramLogProb]] — mean `ln P(v|u)` per bigram plus perplexity
  *    `exp(−mean)`, the production scoring path. Not oracle-checkable:
  *    `ln` is not correctly-rounded IEEE and a double sum is
  *    order-dependent.
  *  - [[bigramLmQuantized]] — integer-exact twin: each bigram instance
  *    contributes `(scale·(c_uv+1)) div (c_u + vsz)` (the smoothed
  *    probability scaled to integer by truncating division); the document
  *    score is the BIGINT sum. Exact while `scale·(c_uv+1)` fits int64 —
  *    `c_uv` is at most the corpus bigram count, so comfortable through
  *    ~10¹⁴-token corpora at the default scale 10⁴.
  *
  * Plan shape (both modes):
  *  1. vocabulary = explode + hash-aggregate unigram counts, then a
  *     DISTRIBUTED top-`maxVocab` (`orderBy.limit` =
  *     TakeOrderedAndProject — per-partition heaps, no global sort, no
  *     single-partition window). Bounded output, persisted once
  *     ([[SharedBranch]]) and broadcast to the mapping join.
  *  2. token stream re-exploded WITH position, left-broadcast-joined to
  *     the vocabulary (miss → `<unk>`), adjacency by `lead` over
  *     `(doc_id, pos)` — ONE corpus-sized exchange, keyed on `doc_id`.
  *  3. per-document bigram pre-aggregation `(doc_id, u, v) → m` REUSES
  *     the window's `doc_id` hash partitioning (doc_id ⊆ grouping keys ⇒
  *     no second exchange), and is the shared branch the count tables
  *     and the scoring join both read.
  *  4. context counts `c_u` (≤ maxVocab+1 rows) broadcast back; bigram
  *     counts `c_uv` (≤ observed distinct bigrams) join keyed on
  *     `(u, v)`, strategy left to AQE — at corpus scale this table can
  *     exceed broadcast size, and a keyed equi-join of two pre-aggregated
  *     frames is the safe shape.
  *
  * Nothing quadratic, no unpartitioned window, no driver-side loop; the
  * only corpus-sized shuffles are the `doc_id` window exchange and the
  * unigram/bigram count aggregations (map-side combinable).
  */
object LanguageModel {

  val Unk = "<unk>"

  /** Vocabulary-mapped per-document bigram instance counts plus the model
    * tables: (`bi` = (doc_id, u, v, m), `cuv` = (u, v, c_uv),
    * `cu` = (u, c_u), `vs` = one-row (vsz)). `bi` and the vocabulary are
    * persisted shared branches (each feeds 2–3 consumers); pins release
    * via the [[graft.sources.Tables.evictPinned]] lifecycle.
    */
  private def lmStats(docs: DataFrame, maxVocab: Int)
      : (DataFrame, DataFrame, DataFrame, DataFrame) = {
    require(maxVocab > 0, s"maxVocab must be positive, got $maxVocab")
    val toks = docs.select(col("doc_id"),
      posexplode(TextFunctions.tokens(col("text"))).as(Seq("pos", "tok")))
    val vocab = SharedBranch.sharedBranch(
      toks.groupBy(col("tok")).agg(count(lit(1)).as("c"))
        .orderBy(col("c").desc, col("tok")).limit(maxVocab)
        .select(col("tok")))
    val mapped = toks
      .join(broadcast(vocab.withColumn("inv", lit(1))), Seq("tok"), "left")
      .select(col("doc_id"), col("pos"),
        when(col("inv").isNotNull, col("tok")).otherwise(lit(Unk)).as("tok_m"))
    val w = Window.partitionBy(col("doc_id")).orderBy(col("pos"))
    val bi = SharedBranch.sharedBranch(
      mapped.withColumn("nxt", lead(col("tok_m"), 1).over(w))
        .filter(col("nxt").isNotNull)
        .groupBy(col("doc_id"), col("tok_m").as("u"), col("nxt").as("v"))
        .agg(count(lit(1)).as("m")))
    val cuv = bi.groupBy(col("u"), col("v")).agg(sum(col("m")).as("c_uv"))
    val cu = bi.groupBy(col("u")).agg(sum(col("m")).as("c_u"))
    // smoothing event space: the capped vocabulary plus the <unk> type —
    // |vocab| is the ACTUAL type count (≤ maxVocab), derived in-plan so
    // no scale change can desynchronize it from the mapping join
    val vs = vocab.agg((count(lit(1)) + lit(1L)).as("vsz"))
    (bi, cuv, cu, vs)
  }

  /** Integer-exact LM score: per bigram instance
    * `contrib = (scale·(c_uv+1)) div (c_u + vsz)`, per document
    * `lm_q = Σ m·contrib` and `n_bigrams = Σ m`. Output: (doc_id, lm_q,
    * n_bigrams), one row per document with ≥ 2 tokens. Every operation is
    * int64 `div`/`*`/`+` on positive operands — bit-identical in any
    * engine (DuckDB `//` agrees with Spark `div` on positives).
    */
  def bigramLmQuantized(docs: DataFrame, maxVocab: Int = 1024,
      scale: Long = 10000L): DataFrame = {
    val (bi, cuv, cu, vs) = lmStats(docs, maxVocab)
    bi.join(cuv, Seq("u", "v"))
      .join(broadcast(cu), Seq("u"))
      .crossJoin(broadcast(vs))
      .withColumn("contrib", expr(s"($scale * (c_uv + 1)) div (c_u + vsz)"))
      .groupBy(col("doc_id"))
      .agg(sum(col("m") * col("contrib")).as("lm_q"),
        sum(col("m")).as("n_bigrams"))
  }

  /** Production LM score: mean `ln P(v|u)` per bigram
    * (`P = (c_uv+1)/(c_u+vsz)`) and perplexity `exp(−mean)`. Same join
    * shape as the quantized twin; double scores are NOT cross-engine
    * reproducible (see class doc), so no oracle rides on this path.
    */
  def bigramLogProb(docs: DataFrame, maxVocab: Int = 1024): DataFrame = {
    val (bi, cuv, cu, vs) = lmStats(docs, maxVocab)
    bi.join(cuv, Seq("u", "v"))
      .join(broadcast(cu), Seq("u"))
      .crossJoin(broadcast(vs))
      .withColumn("lp", log((col("c_uv") + lit(1.0)) / (col("c_u") + col("vsz"))))
      .groupBy(col("doc_id"))
      .agg((sum(col("m") * col("lp")) / sum(col("m"))).as("logprob_per_bigram"),
        sum(col("m")).as("n_bigrams"))
      .withColumn("perplexity", exp(-col("logprob_per_bigram")))
  }
}
