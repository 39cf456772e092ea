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
      : (DataFrame, DataFrame, DataFrame, DataFrame) =
    lmStatsOver(docs.select(col("doc_id"),
      posexplode(TextFunctions.tokens(col("text"))).as(Seq("pos", "tok"))),
      maxVocab)

  /** [[lmStats]] over a PRE-BUILT (doc_id, pos, tok) token stream — the
    * tokenizer-agnostic core (the [[graft.operators.Bpe.tokenWindowsOf]]
    * discipline): the LM trains and scores over whatever token stream
    * it is handed, word or subword.
    */
  private def lmStatsOver(toks: DataFrame, maxVocab: Int)
      : (DataFrame, DataFrame, DataFrame, DataFrame) = {
    require(maxVocab > 0, s"maxVocab must be positive, got $maxVocab")
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
    quantizedTail(bi, cuv, cu, vs, scale)
  }

  /** [[bigramLmQuantized]] over a PRE-BUILT (doc_id, pos, token) stream
    * — the SUBWORD-level quality score (what production filters ship:
    * KenLM-style perplexity over the tokenizer's OWN output, not words
    * — CCNet §4.3 runs its LM over SentencePiece tokens): feed
    * [[graft.operators.Bpe.encodeTokens]] (or the unigram piece stream)
    * straight in. Same plan shape, same integer contract; the stream's
    * `token` column plays `tok`.
    */
  def bigramLmQuantizedOver(stream: DataFrame, maxVocab: Int = 1024,
      scale: Long = 10000L): DataFrame = {
    val (bi, cuv, cu, vs) = lmStatsOver(
      stream.select(col("doc_id"), col("pos"), col("token").as("tok")),
      maxVocab)
    quantizedTail(bi, cuv, cu, vs, scale)
  }

  /** CCNet-style PERPLEXITY BUCKETS (Wenzek et al., LREC 2020 §4.3 —
    * the head/middle/tail cut the public pipelines ship): documents
    * split per `groupCol` (CCNet cuts per language) into terciles of
    * the normalized LM score `s_q = lm_q div n_bigrams` (higher = more
    * fluent = "head"), by VALUE against the group's tercile boundary
    * values — CCNet thresholds by value, not rank, so score ties land
    * in ONE bucket deterministically on any engine. Documents the LM
    * cannot score (< 2 tokens) ride the LEFT-join-at-0 discipline and
    * land in the tail with s_q = 0.
    *
    * Output: (groupCol, doc_id, s_q, bucket ∈ {head, middle, tail}).
    *
    * Plan shape: the LM pass ([[bigramLmQuantized]]) + one
    * [[Stats.quantilesPerGroup]] boundary computation + a BROADCAST
    * boundary join (≤ 2 rows per group — model metadata) + a narrow
    * CASE; the corpus never shuffles beyond the LM's own doc-keyed
    * aggregations.
    */
  def perplexityBuckets(docs: DataFrame, groupCol: String = "lang",
      maxVocab: Int = 1024, scale: Long = 10000L): DataFrame = {
    val lm = bigramLmQuantized(docs, maxVocab, scale)
    val scored = SharedBranch.sharedBranch(
      docs.select(col(groupCol), col("doc_id"))
        .join(lm, Seq("doc_id"), "left")
        .select(col(groupCol), col("doc_id"),
          expr("CASE WHEN coalesce(n_bigrams, 0) > 0 THEN lm_q div n_bigrams ELSE 0 END")
            .as("s_q")))
    val bounds = Stats.quantilesPerGroup(scored, groupCol, "s_q", "doc_id",
        qsPerMille = Seq(333, 667))
      .groupBy(col(groupCol)).agg(
        max(when(col("q") === 333, col("quantile"))).as("v333"),
        max(when(col("q") === 667, col("quantile"))).as("v667"))
    scored.join(broadcast(bounds), Seq(groupCol))
      .select(col(groupCol), col("doc_id"), col("s_q"),
        when(col("s_q") <= col("v333"), lit("tail"))
          .when(col("s_q") <= col("v667"), lit("middle"))
          .otherwise(lit("head")).as("bucket"))
  }

  /** CCNET END-TO-END (Wenzek et al., LREC 2020 — the published
    * curation pipeline whose stages all exist here, composed as ONE
    * oracle-gated query, the `q_pipeline_e2e` discipline): §4.2
    * language ID → §4.3 LM scoring → per-language perplexity terciles
    * → head/middle/tail selection. Documents are tagged by the marker
    * detector ([[TextAnalysis.langId]]); abstentions (`und`) are
    * DROPPED (CCNet's low-confidence cut — a real selection effect, so
    * the composition provably binds); survivors are LM-scored and
    * tercile-bucketed per PREDICTED language ([[perplexityBuckets]]
    * with groupCol = lang_pred — CCNet cuts per detected language, not
    * per source label); `keep` marks the head+middle split the public
    * pipelines train on. ONE corpus-wide LM scores all languages (the
    * [[perplexityBuckets]] convention; CCNet trains per-language KenLM
    * models — the documented simplification: the per-language
    * separation here lives in the bucketing, where it determines the
    * output).
    *
    * Output: (lang_pred, doc_id, s_q, bucket, keep).
    *
    * Plan shape: one narrow langid projection (codegen'd LangId
    * expression, zero shuffle) + [[perplexityBuckets]]'s audited shape
    * (the LM's doc-keyed adjacency exchange + broadcast tercile
    * bounds); the langid filter prunes BEFORE the LM ever shuffles —
    * at 100 TB the `und` mass never pays the exchange.
    */
  def ccnetPipeline(docs: DataFrame, maxVocab: Int = 1024,
      scale: Long = 10000L): DataFrame = {
    val tagged = docs
      .withColumn("lang_pred",
        TextAnalysis.langId(TextFunctions.tokens(col("text"))))
      .filter(col("lang_pred") =!= "und")
    perplexityBuckets(tagged, "lang_pred", maxVocab, scale)
      .withColumn("keep", col("bucket") =!= "tail")
  }

  /** [[ccnetPipeline]] with ONE LM PER PREDICTED LANGUAGE — closes the
    * documented simplification: CCNet (Wenzek et al., LREC 2020 §4.3)
    * trains a separate KenLM per language, so a document is scored
    * against ITS language's statistics, never against another
    * language's n-grams. Every model table here is keyed by
    * `lang_pred`: the vocabulary is a per-language top-`maxVocab`
    * (count DESC, token ASC — the [[lmStatsOver]] rank rule per
    * group), `c_uv`/`c_u`/`vsz` carry the language key, and the
    * smoothed contribution uses the language's OWN vocabulary size.
    * Terciles and the head+middle keep are unchanged.
    *
    * Output: (lang_pred, doc_id, s_q, bucket, keep) — same schema as
    * [[ccnetPipeline]]; scores differ because each language's counts
    * no longer see other languages' mass.
    *
    * Plan shape: the corpus-wide `orderBy.limit` top-k
    * (TakeOrderedAndProject) has no per-group analogue, so the
    * per-language vocabulary is a SALTED TWO-PHASE top-k over the
    * (lang, token) COUNT table: phase 1 ranks inside (lang,
    * hash(tok) % 32) — any global top-k member is top-k within its
    * salt bucket, so the survivor set (≤ 32·maxVocab per language) is
    * a superset — and phase 2 ranks the survivors per language. Both
    * windows are partitioned; the phase-2 partitions are bounded at
    * 32·maxVocab rows, and phase 1 splits each language's TYPE table
    * (not its corpus mass) 32 ways — no language funnels its token
    * stream through one task. Everything downstream mirrors
    * [[bigramLmQuantized]]'s audited shape with the language key
    * threaded through: one doc-keyed adjacency exchange, map-side
    * count aggregations, the ≤ |langs|·(maxVocab+1)-row context and
    * size tables broadcast.
    */
  def ccnetPipelinePerLang(docs: DataFrame, maxVocab: Int = 1024,
      scale: Long = 10000L): DataFrame = {
    val (_, _, _, _, _, scored, bounds) = ccnetPerLangCore(docs, maxVocab, scale)
    scored.join(broadcast(bounds), Seq("lang_pred"))
      .select(col("lang_pred"), col("doc_id"), col("s_q"),
        when(col("s_q") <= col("v333"), lit("tail"))
          .when(col("s_q") <= col("v667"), lit("middle"))
          .otherwise(lit("head")).as("bucket"))
      .withColumn("keep", col("bucket") =!= "tail")
  }

  /** The per-language CCNet model frames both the batch pipeline and
    * [[fitCcnet]] read: (tagged, vocab, cuv, cu, vs, scored, bounds).
    */
  private def ccnetPerLangCore(docs: DataFrame, maxVocab: Int, scale: Long)
      : (DataFrame, DataFrame, DataFrame, DataFrame, DataFrame,
         DataFrame, DataFrame) = {
    require(maxVocab > 0, s"maxVocab must be positive, got $maxVocab")
    val g = "lang_pred"
    val tagged = SharedBranch.sharedBranch(docs
      .withColumn(g, TextAnalysis.langId(TextFunctions.tokens(col("text"))))
      .filter(col(g) =!= "und"))
    val toks = tagged.select(col(g), col("doc_id"),
      posexplode(TextFunctions.tokens(col("text"))).as(Seq("pos", "tok")))
    // per-language vocabulary: salted two-phase top-k over the count table
    val cnt = toks.groupBy(col(g), col("tok")).agg(count(lit(1)).as("c"))
    val vocab = SharedBranch.sharedBranch(
      Stats.topKPerGroup(cnt, g, maxVocab, saltCol = col("tok"),
          order = Seq(col("c").desc, col("tok")))
        .select(col(g), col("tok")))
    val vs = vocab.groupBy(col(g)).agg((count(lit(1)) + 1L).as("vsz"))
    // vocabulary-mapped adjacency — the lmStatsOver shape with the
    // language key riding every frame (a document has ONE language, so
    // doc_id still keys the only corpus-sized exchange)
    val mapped = toks
      .join(broadcast(vocab.withColumn("inv", lit(1))), Seq(g, "tok"), "left")
      .select(col(g), col("doc_id"), col("pos"),
        when(col("inv").isNotNull, col("tok")).otherwise(lit(Unk)).as("tok_m"))
    val w = Window.partitionBy(col("doc_id")).orderBy(col("pos"))
    val bi = SharedBranch.sharedBranch(
      mapped.withColumn("nxt", lead(col("tok_m"), 1).over(w))
        .filter(col("nxt").isNotNull)
        .groupBy(col(g), col("doc_id"), col("tok_m").as("u"), col("nxt").as("v"))
        .agg(count(lit(1)).as("m")))
    val cuv = bi.groupBy(col(g), col("u"), col("v")).agg(sum(col("m")).as("c_uv"))
    val cu = bi.groupBy(col(g), col("u")).agg(sum(col("m")).as("c_u"))
    val lm = bi.join(cuv, Seq(g, "u", "v"))
      .join(broadcast(cu), Seq(g, "u"))
      .join(broadcast(vs), Seq(g))
      .withColumn("contrib", expr(s"($scale * (c_uv + 1)) div (c_u + vsz)"))
      .groupBy(col("doc_id"))
      .agg(sum(col("m") * col("contrib")).as("lm_q"),
        sum(col("m")).as("n_bigrams"))
    val scored = SharedBranch.sharedBranch(
      tagged.select(col(g), col("doc_id"))
        .join(lm, Seq("doc_id"), "left")
        .select(col(g), col("doc_id"),
          expr("CASE WHEN coalesce(n_bigrams, 0) > 0 THEN lm_q div n_bigrams ELSE 0 END")
            .as("s_q")))
    val bounds = Stats.quantilesPerGroup(scored, g, "s_q", "doc_id",
        qsPerMille = Seq(333, 667))
      .groupBy(col(g)).agg(
        max(when(col("q") === 333, col("quantile"))).as("v333"),
        max(when(col("q") === 667, col("quantile"))).as("v667"))
    (tagged, vocab, cuv, cu, vs, scored, bounds)
  }

  /** The frozen per-language CCNet model [[ccnetKeepNarrow]] applies:
    * every table of [[ccnetPipelinePerLang]]'s fit collected
    * driver-side (the [[fitKneserNey]] discipline), size-gated LOUD on
    * the bigram-type total BEFORE any `.collect()`. Keys are
    * space-joined (collision-free under the tokenizer contract —
    * tokens and language codes never contain spaces). The tercile
    * boundary maps carry ≤ |langs| entries each.
    */
  case class CcnetModel(vocab: Map[String, Long], cuv: Map[String, Long],
      cu: Map[String, Long], vsz: Map[String, Long],
      v333: Map[String, Long], v667: Map[String, Long])

  def fitCcnet(docs: DataFrame, maxVocab: Int = 1024,
      scale: Long = 10000L, maxModelKeys: Long = 100000L): CcnetModel = {
    require(maxModelKeys > 0, s"maxModelKeys must be positive, got $maxModelKeys")
    val sep = " "
    val (_, vocab, cuv0, cu, vs, _, bounds) =
      ccnetPerLangCore(docs, maxVocab, scale)
    val cuv = SharedBranch.sharedBranch(cuv0)
    val nKeys = cuv.count()
    require(nKeys <= maxModelKeys,
      s"fitCcnet model has $nKeys bigram-type keys > maxModelKeys =" +
        s" $maxModelKeys: a model this large must not ride the plan as map" +
        " literals — run ccnetPipelinePerLang's join spelling inside" +
        " foreachBatch instead, or raise maxModelKeys deliberately")
    val vm = vocab.select(concat_ws(sep, col("lang_pred"), col("tok")).as("k"))
      .collect().map(_.getString(0) -> 1L).toMap
    val cuvM = cuv.select(concat_ws(sep, col("lang_pred"), col("u"), col("v")).as("k"),
      col("c_uv")).collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val cuM = cu.select(concat_ws(sep, col("lang_pred"), col("u")).as("k"),
      col("c_u")).collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val vszM = vs.collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val bRows = bounds.collect()
    val b333 = bRows.map(r => r.getString(0) -> r.getLong(1)).toMap
    val b667 = bRows.map(r => r.getString(0) -> r.getLong(2)).toMap
    CcnetModel(vm, cuvM, cuM, vszM, b333, b667)
  }

  /** The NARROW (per-row) CCNet selection — the STREAMING face of
    * [[ccnetPipelinePerLang]], the [[stupidBackoffScoreNarrow]]
    * pattern: the frozen per-language model rides the plan as map
    * literals and the whole decision (language ID → LM score →
    * tercile bucket → keep) is codegen'd per-row work, ONE fold over
    * the token array — no explode, no join, no aggregation, no state
    * — so it runs append-mode on an unbounded stream (continuous
    * curation: arrivals scored against the frozen in-domain fit). On
    * the corpus it was fit on it is row-identical to the batch
    * pipeline (the spec and the shared oracle pin it); a genuinely
    * novel arrival scores with the natural smoothing floor (unseen
    * bigram → c_uv = 0, unseen context → c_u = 0).
    *
    * `und` arrivals are dropped (the batch rule), and so are arrivals
    * in a language the fit never saw — a deployment has no model, no
    * vocabulary size and no tercile bounds to score them against (the
    * same low-confidence cut as `und`; the spec pins it).
    *
    * Output: (lang_pred, doc_id, s_q, bucket, keep) — the batch schema.
    */
  def ccnetKeepNarrow(docs: DataFrame, model: CcnetModel,
      scale: Long = 10000L): DataFrame = {
    require(scale > 0, s"scale must be positive, got $scale")
    val sep = " "
    val vm = typedlit(model.vocab); val cuvM = typedlit(model.cuv)
    val cuM = typedlit(model.cu); val vszM = typedlit(model.vsz)
    val b3 = typedlit(model.v333); val b6 = typedlit(model.v667)
    val lang = col("lang_pred")
    docs
      .withColumn("lang_pred",
        TextAnalysis.langId(TextFunctions.tokens(col("text"))))
      .filter(col("lang_pred") =!= "und")
      .filter(element_at(vszM, col("lang_pred")).isNotNull)
      .withColumn("_m", transform(TextFunctions.tokens(col("text")), t =>
        when(element_at(vm, concat_ws(sep, lang, t)).isNotNull, t)
          .otherwise(lit(Unk))))
      .withColumn("_nb", greatest(lit(0L), (size(col("_m")) - 1).cast("long")))
      .withColumn("_lmq", aggregate(
        when(size(col("_m")) >= 2, sequence(lit(2), size(col("_m"))))
          .otherwise(array().cast("array<int>")),
        lit(0L), (acc, i) => {
          val u = element_at(col("_m"), i - 1)
          val v = element_at(col("_m"), i)
          val cuvV = coalesce(element_at(cuvM, concat_ws(sep, lang, u, v)), lit(0L))
          val cuV = coalesce(element_at(cuM, concat_ws(sep, lang, u)), lit(0L))
          acc + idiv(lit(scale) * (cuvV + 1L), cuV + element_at(vszM, lang))
        }))
      .withColumn("s_q",
        when(col("_nb") > 0, idiv(col("_lmq"), col("_nb"))).otherwise(lit(0L)))
      .withColumn("bucket",
        when(col("s_q") <= element_at(b3, lang), lit("tail"))
          .when(col("s_q") <= element_at(b6, lang), lit("middle"))
          .otherwise(lit("head")))
      .withColumn("keep", col("bucket") =!= "tail")
      .select(col("lang_pred"), col("doc_id"), col("s_q"), col("bucket"),
        col("keep"))
  }

  private def quantizedTail(bi: DataFrame, cuv: DataFrame, cu: DataFrame,
      vs: DataFrame, scale: Long): DataFrame =
    bi.join(cuv, Seq("u", "v"))
      .join(broadcast(cu), Seq("u"))
      .crossJoin(broadcast(vs))
      .withColumn("contrib", expr(s"($scale * (c_uv + 1)) div (c_u + vsz)"))
      .groupBy(col("doc_id"))
      .agg(sum(col("m") * col("contrib")).as("lm_q"),
        sum(col("m")).as("n_bigrams"))

  /** Trigram STUPID-BACKOFF document scoring (Brants et al., EMNLP 2007
    * §4 — the backoff score built FOR distributed count-based training:
    * no discounting, no normalization across orders, so every model
    * table is a plain map-side-combinable count aggregation; the paper's
    * α = 0.4 is kept, spelled 2/5 so the arithmetic stays integer).
    *
    * Unlike [[bigramLmQuantized]] (which scores the corpus against
    * itself, so its smoothed probabilities never back off), this is a
    * HELD-OUT scorer: the model trains on the `doc_id % trainModulus
    * == 0` half and scores the OTHER half, so unseen trigrams genuinely
    * fall through the backoff chain — the statistic that separates
    * in-domain text (deep trigram hits) from word salad (unigram-floor
    * scores). Per scored token instance `w` with context `(u, v)` (all
    * three mapped through the TRAIN-half top-`maxVocab` vocabulary, OOV
    * → `<unk>`):
    *
    *  - trigram hit (`c₃(u,v,w) > 0`):  `(scale·c₃(u,v,w)) div c₂(u,v)`
    *  - bigram hit (`c₂(v,w) > 0`):     `(2·scale·c₂(v,w)) div (5·c₁(v))`
    *  - unigram floor:                  `(4·scale·c₁(w)) div (25·N)`
    *    (0 when `w` never occurs in the train half at all)
    *
    * Chain well-definedness is by containment: `c₃ > 0 ⇒ c₂(u,v) ≥ c₃ >
    * 0` and `c₂(v,w) > 0 ⇒ c₁(v) > 0`, so no branch divides by zero.
    * Only tokens with a full two-token in-document context are scored
    * (`n_scored = max(0, n_tokens − 2)`); every score-half document gets
    * a row (tokenless → all zeros). Output: (doc_id, sb_q, n_scored,
    * n_tri, n_bi, n_uni) — the level counts are the backoff-depth
    * diagnostic (how much of the document the model actually knows).
    *
    * Plan shape: train and score streams each pay ONE `doc_id`-keyed
    * window exchange for adjacency; count tables are hash aggregations;
    * score instances pre-aggregate per (doc_id, u, v, w) (doc_id ⊆ keys
    * ⇒ reuses the window's partitioning) before joining `c₃`/`c₂` keyed
    * (AQE picks broadcast when they fit) and the ≤ `maxVocab`+1-row
    * `c₁`/`N` tables broadcast. Integer-exact cross-engine: every step
    * is int64 `·`/`div`/`+` on non-negative operands; the 1-row `N`
    * frame carries an `assert_true` int64 envelope (`25·scale·N` must
    * fit — the widest product in the chain) that fails LOUD instead of
    * wrapping.
    */
  def stupidBackoffQuantized(docs: DataFrame, maxVocab: Int = 1024,
      trainModulus: Long = 2L, scale: Long = 10000L): DataFrame = {
    require(maxVocab > 0, s"maxVocab must be positive, got $maxVocab")
    require(trainModulus >= 2, s"trainModulus must be >= 2 (need a held-out half), got $trainModulus")
    require(scale > 0, s"scale must be positive, got $scale")
    val toks = docs.select(col("doc_id"),
      posexplode(TextFunctions.tokens(col("text"))).as(Seq("pos", "tok")))
    val train = toks.filter(col("doc_id") % trainModulus === 0)
    val vocab = SharedBranch.sharedBranch(
      train.groupBy(col("tok")).agg(count(lit(1)).as("c"))
        .orderBy(col("c").desc, col("tok")).limit(maxVocab)
        .select(col("tok")))
    def mapped(t: DataFrame): DataFrame = t
      .join(broadcast(vocab.withColumn("inv", lit(1))), Seq("tok"), "left")
      .select(col("doc_id"), col("pos"),
        when(col("inv").isNotNull, col("tok")).otherwise(lit(Unk)).as("u"))
    val w = Window.partitionBy(col("doc_id")).orderBy(col("pos"))
    def withContext(t: DataFrame): DataFrame = t
      .withColumn("v", lead(col("u"), 1).over(w))
      .withColumn("x", lead(col("u"), 2).over(w))
    val tr = SharedBranch.sharedBranch(withContext(mapped(train)))
    val c1 = tr.groupBy(col("u")).agg(count(lit(1)).as("c1"))
    val c2 = SharedBranch.sharedBranch(
      tr.filter(col("v").isNotNull)
        .groupBy(col("u"), col("v")).agg(count(lit(1)).as("c2")))
    val c3 = tr.filter(col("x").isNotNull)
      .groupBy(col("u"), col("v"), col("x")).agg(count(lit(1)).as("c3"))
    // 1-row N with the LOUD int64 envelope: 25·scale·N is the widest
    // product either side of any branch's division. The guard rides the
    // CONSUMED n_train value as `+ coalesce(assert_true(..), 0)` — the
    // [[Importance]] envelope discipline — because an assertion aliased
    // to its own dropped column is eliminated by Catalyst column pruning
    // and never executes (round-13 advice).
    val envBound = Long.MaxValue / (25L * scale)
    val n = tr.agg(count(lit(1)).as("n_train0"))
      .select(expr(s"n_train0 + coalesce(assert_true(n_train0 <= $envBound," +
        s" 'stupidBackoff int64 envelope: 25*$scale*N must fit int64'), 0)")
        .as("n_train"))
    val scoreDocs = docs.filter(col("doc_id") % trainModulus =!= 0)
    val inst = withContext(mapped(scoreDocs
        .select(col("doc_id"), col("text"))
        .select(col("doc_id"),
          posexplode(TextFunctions.tokens(col("text"))).as(Seq("pos", "tok")))))
      .filter(col("x").isNotNull)
      .groupBy(col("doc_id"), col("u"), col("v"), col("x"))
      .agg(count(lit(1)).as("m"))
    val scored = inst
      .join(c3, Seq("u", "v", "x"), "left")
      .join(c2.withColumnRenamed("c2", "c2_ctx"), Seq("u", "v"), "left")
      .join(c2.select(col("u").as("v"), col("v").as("x"), col("c2").as("c2_vx")),
        Seq("v", "x"), "left")
      .join(broadcast(c1.select(col("u").as("v"), col("c1").as("c1_v"))), Seq("v"), "left")
      .join(broadcast(c1.select(col("u").as("x"), col("c1").as("c1_x"))), Seq("x"), "left")
      .crossJoin(broadcast(n))
      .withColumn("lvl",
        when(col("c3").isNotNull, lit(0))
          .when(col("c2_vx").isNotNull, lit(1)).otherwise(lit(2)))
      .withColumn("s",
        when(col("lvl") === 0, expr(s"($scale * c3) div c2_ctx"))
          .when(col("lvl") === 1, expr(s"(2 * $scale * c2_vx) div (5 * c1_v)"))
          .otherwise(expr(s"(4 * $scale * coalesce(c1_x, 0)) div (25 * n_train)")))
    val agg = scored.groupBy(col("doc_id")).agg(
      sum(col("m") * col("s")).as("sb_q"),
      sum(col("m")).as("n_scored"),
      sum(when(col("lvl") === 0, col("m")).otherwise(lit(0L))).as("n_tri"),
      sum(when(col("lvl") === 1, col("m")).otherwise(lit(0L))).as("n_bi"),
      sum(when(col("lvl") === 2, col("m")).otherwise(lit(0L))).as("n_uni"))
    scoreDocs.select(col("doc_id")).join(agg, Seq("doc_id"), "left")
      .select(col("doc_id"),
        coalesce(col("sb_q"), lit(0L)).as("sb_q"),
        coalesce(col("n_scored"), lit(0L)).as("n_scored"),
        coalesce(col("n_tri"), lit(0L)).as("n_tri"),
        coalesce(col("n_bi"), lit(0L)).as("n_bi"),
        coalesce(col("n_uni"), lit(0L)).as("n_uni"))
  }

  /** Fit the frozen stupid-backoff model [[stupidBackoffScoreNarrow]]
    * applies: the [[stupidBackoffQuantized]] count tables collected
    * driver-side as maps keyed by space-joined n-grams (tokens never
    * contain a space under the `[ \t\n\f\r]` tokenizer contract — the
    * M5Queries oracle character-class note — so the joined key is
    * collision-free). Model size is bounded by the fit corpus's
    * DISTINCT trigram count — fine for capped vocabularies
    * (≤ (maxVocab+1)³ keys, ~5k at the gate's 16); past
    * `maxModelKeys` total distinct n-grams the fit FAILS LOUD (a
    * distinct pre-count BEFORE any `.collect()`, so an uncapped-corpus
    * fit can neither OOM the driver nor silently bloat the plan with
    * the map literals) — a model that large runs the join spelling
    * inside `foreachBatch` instead, the
    * [[Importance.importanceScoreNarrow]] deployment note verbatim.
    * Returns (vocab presence map, c3, c2, c1, nTrain).
    */
  def fitStupidBackoff(docs: DataFrame, maxVocab: Int = 1024,
      trainModulus: Long = 2L, maxModelKeys: Long = 100000L)
      : (Map[String, Long], Map[String, Long], Map[String, Long],
         Map[String, Long], Long) = {
    require(maxVocab > 0, s"maxVocab must be positive, got $maxVocab")
    require(trainModulus >= 2, s"trainModulus must be >= 2, got $trainModulus")
    require(maxModelKeys > 0, s"maxModelKeys must be positive, got $maxModelKeys")
    val sep = " "
    val toks = docs.select(col("doc_id"),
      posexplode(TextFunctions.tokens(col("text"))).as(Seq("pos", "tok")))
    val train = toks.filter(col("doc_id") % trainModulus === 0)
    val vocab = train.groupBy(col("tok")).agg(count(lit(1)).as("c"))
      .orderBy(col("c").desc, col("tok")).limit(maxVocab)
      .select(col("tok")).collect().map(_.getString(0))
    val vm = vocab.map(_ -> 1L).toMap
    val vmc = typedlit(vm)
    val mapped = train.select(col("doc_id"), col("pos"),
      when(element_at(vmc, col("tok")).isNotNull, col("tok"))
        .otherwise(lit(Unk)).as("u"))
    val w = Window.partitionBy(col("doc_id")).orderBy(col("pos"))
    val tr = SharedBranch.sharedBranch(mapped
      .withColumn("v", lead(col("u"), 1).over(w))
      .withColumn("x", lead(col("u"), 2).over(w)))
    val c1df = SharedBranch.sharedBranch(
      tr.groupBy(col("u")).agg(count(lit(1)).as("c")))
    val c2df = SharedBranch.sharedBranch(tr.filter(col("v").isNotNull)
      .groupBy(concat_ws(sep, col("u"), col("v")).as("k"))
      .agg(count(lit(1)).as("c")))
    val c3df = SharedBranch.sharedBranch(tr.filter(col("x").isNotNull)
      .groupBy(concat_ws(sep, col("u"), col("v"), col("x")).as("k"))
      .agg(count(lit(1)).as("c")))
    // the LOUD size gate runs distributed, BEFORE any collect: the
    // persisted count tables are counted (cheap — they are already the
    // aggregation outputs) and the fit refuses rather than pull an
    // unbounded model into driver memory / a map-literal plan
    val nKeys = c1df.count() + c2df.count() + c3df.count()
    require(nKeys <= maxModelKeys,
      s"fitStupidBackoff model has $nKeys distinct n-gram keys > maxModelKeys" +
        s" = $maxModelKeys: a model this large must not ride the plan as map" +
        " literals — run the stupidBackoffQuantized join spelling inside" +
        " foreachBatch instead (the Importance.importanceScoreNarrow" +
        " deployment note), or raise maxModelKeys deliberately")
    val c1 = c1df.collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val c2 = c2df.collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val c3 = c3df.collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val n = tr.count()
    (vm, c3, c2, c1, n)
  }

  private def idiv(a: org.apache.spark.sql.Column,
      b: org.apache.spark.sql.Column): org.apache.spark.sql.Column = {
    import org.apache.spark.sql.GraftColumnBridge.{toColumn, toExpression}
    toColumn(org.apache.spark.sql.catalyst.expressions.IntegralDivide(
      toExpression(a), toExpression(b)))
  }

  /** The NARROW (per-row) spelling of stupid-backoff scoring — the
    * STREAMING face, the [[Importance.importanceScoreNarrow]] pattern:
    * the model rides the plan as map literals ([[fitStupidBackoff]]),
    * the score is ONE fold over the token array — no explode, no join,
    * no aggregation, NO state — so it runs append-mode on an unbounded
    * stream (the continuous-curation quality gate scoring arrivals
    * against a frozen in-domain LM). On the held-out half of the corpus
    * it fit, it is row-identical to [[stupidBackoffQuantized]]'s
    * (sb_q, n_scored) (LanguageModelSpec pins it); level diagnostics
    * are the batch operator's job.
    *
    * APPENDS (n_scored, sb_q, keep) to the input row;
    * `keep = sb_q ≥ minMeanQ·n_scored` (mean-score threshold, the
    * [[Importance.selectByFrozenThreshold]] discipline; tokenless/short
    * docs score 0 and keep only at minMeanQ = 0).
    */
  def stupidBackoffScoreNarrow(docs: DataFrame, vocab: Map[String, Long],
      c3: Map[String, Long], c2: Map[String, Long], c1: Map[String, Long],
      nTrain: Long, minMeanQ: Long = 0L, scale: Long = 10000L): DataFrame = {
    require(scale > 0, s"scale must be positive, got $scale")
    require(nTrain > 0, "stupidBackoffScoreNarrow needs a non-empty fit corpus (nTrain > 0)")
    require(nTrain <= Long.MaxValue / (25L * scale),
      s"stupidBackoff int64 envelope: 25*$scale*N must fit int64 (N = $nTrain)")
    val sep = " "
    val vm = typedlit(vocab); val c3m = typedlit(c3)
    val c2m = typedlit(c2); val c1m = typedlit(c1)
    val toksC = TextFunctions.tokens(col("text"))
    val m = transform(toksC,
      t => when(element_at(vm, t).isNotNull, t).otherwise(lit(Unk)))
    docs
      .withColumn("_m", m)
      .withColumn("n_scored",
        greatest(lit(0L), (size(col("_m")) - 2).cast("long")))
      .withColumn("sb_q", aggregate(
        when(size(col("_m")) >= 3, sequence(lit(3), size(col("_m"))))
          .otherwise(array().cast("array<int>")),
        lit(0L), (acc, i) => {
          val u = element_at(col("_m"), i - 2)
          val v = element_at(col("_m"), i - 1)
          val x = element_at(col("_m"), i)
          val c3v = element_at(c3m, concat_ws(sep, u, v, x))
          val cvx = element_at(c2m, concat_ws(sep, v, x))
          acc + when(c3v.isNotNull,
              idiv(lit(scale) * c3v, element_at(c2m, concat_ws(sep, u, v))))
            .when(cvx.isNotNull,
              idiv(lit(2L * scale) * cvx, lit(5L) * element_at(c1m, v)))
            .otherwise(idiv(lit(4L * scale) * (coalesce(element_at(c1m, x), lit(0L))),
              lit(25L * nTrain)))
        }))
      .withColumn("keep", col("sb_q") >= lit(minMeanQ) * col("n_scored"))
      .drop("_m")
  }

  /** Interpolated KNESER-NEY bigram model table (Kneser & Ney, ICASSP
    * 1995; the interpolated form of Chen & Goodman, Harvard TR-10-98
    * §2.7 — the benchmark-standard n-gram smoothing, built here next to
    * [[stupidBackoffQuantized]] as the discounting member of the LM
    * family): per seen bigram type `(u, v)` over the vocabulary-mapped
    * word stream,
    *
    * {{{ P(v|u) = (c(u,v) − D)/c(u) + D·N1+(u·)/c(u) · N1+(·v)/N1+(··) }}}
    *
    * with absolute discount `D = 3/4` (Chen & Goodman's ballpark-optimal
    * constant, spelled as the rational 3/4 so the arithmetic stays
    * integer-exact): the continuation probability `N1+(·v)/N1+(··)` —
    * how many DISTINCT contexts `v` completes, not how often — is KN's
    * defining correction (the "San Francisco" effect: a frequent word
    * glued to one context gets a small continuation weight).
    *
    * Trained on the full corpus (the [[bigramLmQuantized]] in-corpus
    * convention), so every scored bigram has `c(u,v) ≥ 1` and
    * `c(u) ≥ 1` — no zero branch anywhere. Cross-multiplied to the
    * exact integer quotient
    *
    * {{{ kn_q = (scale·((4·c_uv − 3)·NN + 3·N1fol·N1pre)) div (4·c_u·NN) }}}
    *
    * (`NN = N1+(··)` = distinct-bigram count) — int64 `·`/`div`/`+` on
    * positive operands, bit-identical in any engine.
    *
    * Output: (u, v, c_uv, c_u, n1_fol, n1_pre, nn, kn_q), one row per
    * seen bigram type — the MODEL table ([[kneserNeyQuantized]] is the
    * per-document scorer over it).
    *
    * Plan shape: the [[lmStats]] pass (one doc-keyed adjacency window +
    * hash-agg count tables) + the two continuation tables (group-bys of
    * the bigram-type table — ≤ vocab+1 rows each, broadcast) + the
    * 1-row `NN` frame (broadcast, carrying the LOUD int64 envelope
    * guard: `scale·4·Σc_uv·NN` is the widest product, asserted via
    * division so the guard itself cannot wrap — the [[Importance]]
    * discipline, riding the CONSUMED `nn` value). The bigram-type join
    * is keyed (u, v); AQE picks broadcast when the model fits.
    */
  def kneserNeyModel(docs: DataFrame, maxVocab: Int = 1024,
      scale: Long = 10000L): DataFrame =
    knModelOf(lmStats(docs, maxVocab), maxVocab, scale)

  private def knModelOf(
      stats: (DataFrame, DataFrame, DataFrame, DataFrame),
      maxVocab: Int, scale: Long): DataFrame = {
    require(scale > 0, s"scale must be positive, got $scale")
    val (_, cuv0, cu, _) = stats
    val cuv = SharedBranch.sharedBranch(cuv0)
    val n1u = cuv.groupBy(col("u")).agg(count(lit(1)).as("n1_fol"))
    val n1v = cuv.groupBy(col("v")).agg(count(lit(1)).as("n1_pre"))
    // n1_fol, n1_pre ≤ vsz ≤ maxVocab+1 (compile-time), so the widest
    // product is scale·(4·ntot·nn + 3·(maxVocab+1)²); assert by
    // division so the guard never wraps
    val vszBound = (maxVocab + 1).toLong
    val bound = Long.MaxValue / (4L * scale) - 3L * vszBound * vszBound
    val nn = cuv.agg(count(lit(1)).as("nn0"), sum(col("c_uv")).as("ntot"))
      .select(expr(s"nn0 + coalesce(assert_true(nn0 = 0 OR ntot <= $bound div nn0," +
        s" 'kneserNey int64 envelope: scale*(4*ntot*nn + 3*vsz^2) must fit int64'), 0)")
        .as("nn"))
    cuv.join(cu, Seq("u"))
      .join(broadcast(n1u), Seq("u"))
      .join(broadcast(n1v), Seq("v"))
      .crossJoin(broadcast(nn))
      .select(col("u"), col("v"), col("c_uv"), col("c_u"),
        col("n1_fol"), col("n1_pre"), col("nn"),
        expr(s"($scale * ((4 * c_uv - 3) * nn + 3 * n1_fol * n1_pre))" +
          s" div (4 * c_u * nn)").as("kn_q"))
  }

  /** Per-document KNESER-NEY score over [[kneserNeyModel]]: `kn_q_sum =
    * Σ m·kn_q` and `n_bigrams = Σ m` over the document's bigram
    * instances — the discounted sibling of [[bigramLmQuantized]]'s
    * add-one score, one row per document with ≥ 2 tokens. In-corpus
    * training means every instance hits the model (inner join, no
    * backoff branch). Plan: the model build + one (u, v)-keyed join of
    * the doc-keyed bigram-instance table + the doc-keyed sum.
    */
  def kneserNeyQuantized(docs: DataFrame, maxVocab: Int = 1024,
      scale: Long = 10000L): DataFrame = {
    val stats = lmStats(docs, maxVocab)
    val model = knModelOf(stats, maxVocab, scale)
    stats._1.join(model.select(col("u"), col("v"), col("kn_q")), Seq("u", "v"))
      .groupBy(col("doc_id"))
      .agg(sum(col("m") * col("kn_q")).as("kn_q_sum"),
        sum(col("m")).as("n_bigrams"))
  }

  /** MODIFIED Kneser-Ney (Chen & Goodman, Harvard TR-10-98 §3, eq. 26
    * — the three-discount refinement that is the production-standard
    * n-gram smoothing): counts 1, 2 and ≥ 3 get their own absolute
    * discounts, estimated from the bigram-type count-of-counts
    * `n1..n4` as
    *
    * {{{ Y = n1/(n1+2n2);  D1 = 1 − 2Y·n2/n1 = n1/(n1+2n2);
    *     D2 = 2 − 3Y·n3/n2;  D3+ = 3 − 4Y·n4/n3 }}}
    *
    * and the context weight becomes
    * `γ(u) = (D1·N1(u·) + D2·N2(u·) + D3+·N3+(u·))/c(u)`.
    *
    * QUANTIZED-DISCOUNT CONVENTION (the stupid-backoff 2/5
    * discipline): the discounts ride as `scale`-scaled integers
    * (`D?q = (scale·numerator) div denominator`, numerators clamped at
    * 0 BEFORE the division so no negative ever meets `div` — floor vs
    * truncate diverge across engines on negatives), and every
    * downstream term divides back by `scale`:
    *
    * {{{ disc_q  = (scale·c_uv − Dq(c_uv)) div c_u
    *     gamma_q = (D1q·N1(u·) + D2q·N2(u·) + D3q·N3+(u·)) div c_u
    *     cont_q  = (scale·N1+(·v)) div NN
    *     mkn_q   = disc_q + (gamma_q·cont_q) div scale }}}
    *
    * — a deterministic, engine-exact DEFINITION of the operator (each
    * branch's numerator is provably non-negative: D1 ≤ 1, D2 ≤ 2,
    * D3+ ≤ 3 by construction). The fit FAILS LOUD (in-plan
    * assert_true riding the consumed `nn`) when `n1 + 2·n2 = 0` — a
    * corpus with no singleton/doubleton bigram types has no
    * count-of-counts signal to estimate discounts from; the gate
    * injects rare doc classes so the estimate binds at fixture scale.
    *
    * Output ([[kneserNeyModifiedModel]]): (u, v, c_uv, c_u, dq,
    * disc_q, gamma_q, cont_q, mkn_q) per seen bigram type;
    * [[kneserNeyModifiedDiscounts]] is the 1-row global table
    * (n1..n4, nn, d1q, d2q, d3q) — the model-audit face.
    *
    * Plan shape: [[kneserNeyModel]]'s exactly, plus one 1-row
    * count-of-counts aggregate and one ≤ vocab+1-row per-context
    * conditional-sum group-by, both broadcast. The compile-time require
    * keeps the widest product (d3q's `scale·3·n3·(n1+2n2)` ≤
    * 6·scale·nn², nn ≤ (maxVocab+1)²) inside int64 — at the default
    * scale=10000 that caps `maxVocab` at 3520; the check divides so it
    * cannot itself wrap.
    */
  def kneserNeyModifiedModel(docs: DataFrame, maxVocab: Int = 1024,
      scale: Long = 10000L): DataFrame = {
    val (cuv, cu, glob, ctx, n1v) = knModCore(docs, maxVocab, scale)
    cuv.join(cu, Seq("u"))
      .join(broadcast(ctx), Seq("u"))
      .join(broadcast(n1v), Seq("v"))
      .crossJoin(broadcast(glob))
      .withColumn("dq",
        when(col("c_uv") === 1, col("d1q"))
          .when(col("c_uv") === 2, col("d2q")).otherwise(col("d3q")))
      .select(col("u"), col("v"), col("c_uv"), col("c_u"), col("dq"),
        expr(s"($scale * c_uv - dq) div c_u").as("disc_q"),
        expr("(d1q * n1u + d2q * n2u + d3q * n3pu) div c_u").as("gamma_q"),
        expr(s"($scale * n1_pre) div nn").as("cont_q"))
      .withColumn("mkn_q",
        col("disc_q") + expr(s"(gamma_q * cont_q) div $scale"))
  }

  /** The 1-row global table of [[kneserNeyModifiedModel]]'s estimated
    * discounts: (n1, n2, n3, n4, nn, d1q, d2q, d3q).
    */
  def kneserNeyModifiedDiscounts(docs: DataFrame, maxVocab: Int = 1024,
      scale: Long = 10000L): DataFrame =
    knModCore(docs, maxVocab, scale)._3

  private def knModCore(docs: DataFrame, maxVocab: Int, scale: Long)
      : (DataFrame, DataFrame, DataFrame, DataFrame, DataFrame) = {
    require(scale > 0, s"scale must be positive, got $scale")
    // int64 envelope: the widest product is d3q's scale·3·n3·(n1+2n2) ≤
    // 6·scale·nn² with nn ≤ (maxVocab+1)² bigram types; checked by
    // division so the check itself cannot wrap (the knModelOf
    // discipline). At scale=10000 this caps maxVocab at 3520.
    val vsz2 = (maxVocab + 1).toLong * (maxVocab + 1)
    val nnBound = Long.MaxValue / (6L * scale)
    require(vsz2 <= nnBound / vsz2,
      s"int64 envelope: 6*scale*nn^2 must fit int64 with nn <= (maxVocab+1)^2 — " +
        s"need (maxVocab+1)^2 <= ${nnBound / vsz2}, got maxVocab=$maxVocab scale=$scale")
    val (_, cuv0, cu, _) = lmStats(docs, maxVocab)
    val cuv = SharedBranch.sharedBranch(cuv0)
    val n1v = cuv.groupBy(col("v")).agg(count(lit(1)).as("n1_pre"))
    val ctx = cuv.groupBy(col("u")).agg(
      sum(when(col("c_uv") === 1, 1L).otherwise(0L)).as("n1u"),
      sum(when(col("c_uv") === 2, 1L).otherwise(0L)).as("n2u"),
      sum(when(col("c_uv") >= 3, 1L).otherwise(0L)).as("n3pu"))
    val glob = cuv.agg(
        sum(when(col("c_uv") === 1, 1L).otherwise(0L)).as("n1"),
        sum(when(col("c_uv") === 2, 1L).otherwise(0L)).as("n2"),
        sum(when(col("c_uv") === 3, 1L).otherwise(0L)).as("n3"),
        sum(when(col("c_uv") === 4, 1L).otherwise(0L)).as("n4"),
        count(lit(1)).as("nn0"))
      .select(col("n1"), col("n2"), col("n3"), col("n4"),
        expr("nn0 + coalesce(assert_true(nn0 = 0 OR n1 + 2*n2 > 0," +
          " 'modified KN needs singleton or doubleton bigram types" +
          " (n1 + 2*n2 > 0) to estimate discounts — inject rare doc" +
          " classes at fixture scale'), 0)").as("nn"),
        expr(s"($scale * n1) div greatest(1, n1 + 2*n2)").as("d1q"),
        expr(s"CASE WHEN n2 = 0 THEN 0 ELSE ($scale * greatest(0," +
          s" 2*n2*(n1 + 2*n2) - 3*n1*n3)) div (n2*(n1 + 2*n2)) END").as("d2q"),
        expr(s"CASE WHEN n3 = 0 THEN 0 ELSE ($scale * greatest(0," +
          s" 3*n3*(n1 + 2*n2) - 4*n1*n4)) div (n3*(n1 + 2*n2)) END").as("d3q"))
    (cuv, cu, glob, ctx, n1v)
  }

  /** TRIGRAM interpolated Kneser-Ney (Chen & Goodman TR-10-98 §2.7 at
    * order 3 — the order recursion that makes KN KN: the TOP level
    * discounts RAW counts, every LOWER level discounts CONTINUATION
    * counts ("how many distinct contexts precede this n-gram"), and
    * the floor is the unigram continuation distribution):
    *
    * {{{ P1(w)    = N1+(·w) / N1+(··)                    (type counts over (v,w))
    *     P2(w|v)  = (N1+(·vw) − D)⁺/S2(v) + D·K2(v)/S2(v) · P1(w)
    *     P3(w|uv) = (c(uvw) − D)⁺/c(uv·) + D·K3(uv)/c(uv·) · P2(w|v) }}}
    *
    * with `S2(v) = Σ_w N1+(·vw)`, `K2(v) = |{w : N1+(·vw) > 0}|`,
    * `K3(uv) = N1+(uv·)`, `c(uv·) = Σ_w c(uvw)`, and the fixed
    * discount D = 3/4 at every level (the [[kneserNeyModel]]
    * convention). QUANTIZED COMPOSITION (the
    * [[kneserNeyModifiedModel]] discipline): each level's discounted
    * and continuation terms are `scale`-scaled integer divisions and
    * the interpolation composes as `disc_q + (gam_q · P_lower_q) div
    * scale` — in-corpus training means every seen type has count ≥ 1,
    * so every numerator is positive and no clamp is needed.
    *
    * Output: one row per seen trigram TYPE —
    * (u, v, w, c3, c2, k3, ct2, s2, k2, n1w, nn, p1_q, p2_q, p3_q).
    *
    * Plan shape: ONE corpus adjacency exchange (the doc-keyed window
    * producing both leads); the trigram-type table is a SharedBranch
    * feeding the context/continuation aggregations; per-v and per-w
    * tables are ≤ vocab+1 rows (broadcast), the (v,w) continuation and
    * (u,v) context tables are vocab²-bounded keyed joins (AQE); the
    * 1-row NN frame broadcasts with the loud positivity ride-along.
    */
  def kneserNeyTrigramModel(docs: DataFrame, maxVocab: Int = 1024,
      scale: Long = 10000L): DataFrame = {
    require(scale > 0, s"scale must be positive, got $scale")
    val toks = docs.select(col("doc_id"),
      posexplode(TextFunctions.tokens(col("text"))).as(Seq("pos", "tok")))
    val vocab = SharedBranch.sharedBranch(
      toks.groupBy(col("tok")).agg(count(lit(1)).as("c"))
        .orderBy(col("c").desc, col("tok")).limit(maxVocab)
        .select(col("tok")))
    val mapped = toks
      .join(broadcast(vocab.withColumn("inv", lit(1))), Seq("tok"), "left")
      .select(col("doc_id"), col("pos"),
        when(col("inv").isNotNull, col("tok")).otherwise(lit(Unk)).as("u"))
    val w = Window.partitionBy(col("doc_id")).orderBy(col("pos"))
    val tri = SharedBranch.sharedBranch(mapped
      .withColumn("v", lead(col("u"), 1).over(w))
      .withColumn("w", lead(col("u"), 2).over(w))
      .filter(col("w").isNotNull)
      .groupBy(col("u"), col("v"), col("w")).agg(count(lit(1)).as("c3")))
    val c2 = tri.groupBy(col("u"), col("v"))
      .agg(sum(col("c3")).as("c2"), count(lit(1)).as("k3"))
    val t2 = SharedBranch.sharedBranch(
      tri.groupBy(col("v"), col("w")).agg(count(lit(1)).as("ct2")))
    val s2k2 = t2.groupBy(col("v"))
      .agg(sum(col("ct2")).as("s2"), count(lit(1)).as("k2"))
    val uni = t2.groupBy(col("w")).agg(count(lit(1)).as("n1w"))
    // int64 envelope, LOUD (the knModelOf ntot-by-division discipline):
    // the widest corpus-sized product is p3_q's scale·(4·c3−3); every
    // per-type c3 is bounded by the trigram-instance total Σc3, so the
    // 1-row assert riding the consumed nn catches any corpus that could
    // wrap (≳2.3e14 trigram instances at scale=10000) BEFORE a silent
    // divergence from the HUGEINT oracle.
    val triBound = Long.MaxValue / (4L * scale)
    val ntri = tri.agg(sum(col("c3")).as("ntri"))
    val nn = t2.agg(count(lit(1)).as("nn0"))
      .crossJoin(broadcast(ntri))
      .select(expr(s"nn0 + coalesce(assert_true(coalesce(ntri, 0) <= $triBound," +
        " 'kneserNeyTrigramModel int64 envelope: scale*4*sum(c3) must fit" +
        " int64 — reduce scale or shard the corpus'), 0)").as("nn"))
    tri.join(c2, Seq("u", "v"))
      .join(t2, Seq("v", "w"))
      .join(broadcast(s2k2), Seq("v"))
      .join(broadcast(uni), Seq("w"))
      .crossJoin(broadcast(nn))
      .withColumn("p1_q", expr(s"($scale * n1w) div nn"))
      .withColumn("p2_q",
        expr(s"($scale * (4 * ct2 - 3)) div (4 * s2)")
          + expr(s"((((3 * $scale * k2) div (4 * s2)) * (($scale * n1w) div nn)) div $scale)"))
      .withColumn("p3_q",
        expr(s"($scale * (4 * c3 - 3)) div (4 * c2)")
          + expr(s"((((3 * $scale * k3) div (4 * c2)) * p2_q) div $scale)"))
      .select(col("u"), col("v"), col("w"), col("c3"), col("c2"), col("k3"),
        col("ct2"), col("s2"), col("k2"), col("n1w"), col("nn"),
        col("p1_q"), col("p2_q"), col("p3_q"))
  }

  /** Fit the frozen Kneser-Ney model [[kneserNeyScoreNarrow]] applies —
    * the [[fitStupidBackoff]] discipline for the discounting family:
    * the [[kneserNeyModel]] tables collected driver-side (seen-bigram
    * quantized scores keyed by the space-joined pair — collision-free
    * under the tokenizer contract — plus the continuation/context maps
    * the UNSEEN-bigram branch needs), size-gated LOUD before any
    * `.collect()`. Returns (vocab presence, knq, n1Fol, n1Pre, cU, NN).
    */
  def fitKneserNey(docs: DataFrame, maxVocab: Int = 1024,
      scale: Long = 10000L, maxModelKeys: Long = 100000L)
      : (Map[String, Long], Map[String, Long], Map[String, Long],
         Map[String, Long], Map[String, Long], Long) = {
    require(maxModelKeys > 0, s"maxModelKeys must be positive, got $maxModelKeys")
    val sep = " "
    val stats = lmStats(docs, maxVocab)
    val model = SharedBranch.sharedBranch(knModelOf(stats, maxVocab, scale))
    val nKeys = model.count()
    require(nKeys <= maxModelKeys,
      s"fitKneserNey model has $nKeys seen-bigram keys > maxModelKeys =" +
        s" $maxModelKeys: a model this large must not ride the plan as map" +
        " literals — run the kneserNeyQuantized join spelling inside" +
        " foreachBatch instead (the Importance.importanceScoreNarrow" +
        " deployment note), or raise maxModelKeys deliberately")
    val rows = model.select(concat_ws(sep, col("u"), col("v")).as("k"),
      col("u"), col("v"), col("c_u"), col("n1_fol"), col("n1_pre"),
      col("nn"), col("kn_q")).collect()
    val knq = rows.map(r => r.getString(0) -> r.getLong(7)).toMap
    val cU = rows.map(r => r.getString(1) -> r.getLong(3)).toMap
    val n1Fol = rows.map(r => r.getString(1) -> r.getLong(4)).toMap
    val n1Pre = rows.map(r => r.getString(2) -> r.getLong(5)).toMap
    val nn = if (rows.isEmpty) 0L else rows.head.getLong(6)
    // the TRUE fit vocabulary (the lmStats rank rule), not the bigram
    // tables' key set — a vocab word seen only in 1-token docs never
    // enters a bigram but must still map to itself, not <unk>
    val vocab = docs
      .select(explode(TextFunctions.tokens(col("text"))).as("tok"))
      .groupBy(col("tok")).agg(count(lit(1)).as("c"))
      .orderBy(col("c").desc, col("tok")).limit(maxVocab)
      .select(col("tok")).collect().map(_.getString(0) -> 1L).toMap
    // driver-side envelope (BigInt, so the check itself cannot wrap):
    // the widest unseen-branch product is scale·3·n1f·n1p; the seen
    // scores were already guarded in-plan by knModelOf
    val n1Max = if (n1Fol.isEmpty) 0L else math.max(n1Fol.values.max, n1Pre.values.max)
    require(BigInt(scale) * 3 * BigInt(n1Max) * n1Max <= BigInt(Long.MaxValue),
      s"kneserNey narrow envelope: scale*3*n1max^2 must fit int64 (n1max = $n1Max)")
    (vocab, knq, n1Fol, n1Pre, cU, nn)
  }

  /** The NARROW (per-row) spelling of Kneser-Ney scoring — the
    * STREAMING face of [[kneserNeyQuantized]], the
    * [[stupidBackoffScoreNarrow]] pattern: the frozen model rides the
    * plan as map literals, the score is ONE fold over the token array
    * (no explode, no join, no state) so it runs append-mode on an
    * unbounded stream. Per bigram instance (u, v) of the arrival
    * (vocabulary-mapped, OOV → `<unk>`):
    *
    *  - seen in the fit corpus → the frozen `kn_q`;
    *  - unseen pair, known context → the pure continuation branch,
    *    `(scale·3·N1fol(u)·N1pre(v)) div (4·c_u(u)·NN)` (the
    *    interpolated formula with the discounted term at 0; a `v`
    *    never seen as a continuation contributes 0 mass exactly as the
    *    formula says, spelled coalesce-at-0);
    *  - novel context (`u` never seen preceding anything — only
    *    possible for a corpus-final-only type) → 0, the documented
    *    floor.
    *
    * APPENDS (n_bigrams, kn_q_sum, keep) to the input row; on the fit
    * corpus itself every pair is seen and the result is row-identical
    * to [[kneserNeyQuantized]] with short docs at 0
    * (LanguageModelSpec pins it).
    */
  def kneserNeyScoreNarrow(docs: DataFrame, vocab: Map[String, Long],
      knq: Map[String, Long], n1Fol: Map[String, Long],
      n1Pre: Map[String, Long], cU: Map[String, Long], nn: Long,
      minMeanQ: Long = 0L, scale: Long = 10000L): DataFrame = {
    require(scale > 0, s"scale must be positive, got $scale")
    val sep = " "
    val vm = typedlit(vocab); val qm = typedlit(knq)
    val fm = typedlit(n1Fol); val pm = typedlit(n1Pre)
    val cm = typedlit(cU)
    val toksC = TextFunctions.tokens(col("text"))
    val m = transform(toksC,
      t => when(element_at(vm, t).isNotNull, t).otherwise(lit(Unk)))
    docs
      .withColumn("_m", m)
      .withColumn("n_bigrams",
        greatest(lit(0L), (size(col("_m")) - 1).cast("long")))
      .withColumn("kn_q_sum", aggregate(
        when(size(col("_m")) >= 2, sequence(lit(2), size(col("_m"))))
          .otherwise(array().cast("array<int>")),
        lit(0L), (acc, i) => {
          val u = element_at(col("_m"), i - 1)
          val v = element_at(col("_m"), i)
          val seen = element_at(qm, concat_ws(sep, u, v))
          val cu = element_at(cm, u)
          acc + when(seen.isNotNull, seen)
            .when(cu.isNotNull,
              idiv(lit(3L * scale) * coalesce(element_at(fm, u), lit(0L))
                  * coalesce(element_at(pm, v), lit(0L)),
                lit(4L) * cu * lit(nn)))
            .otherwise(lit(0L))
        }))
      .withColumn("keep", col("kn_q_sum") >= lit(minMeanQ) * col("n_bigrams"))
      .drop("_m")
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
