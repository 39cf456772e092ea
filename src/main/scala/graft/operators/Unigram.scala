package graft.operators

import graft.functions.TextFunctions
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Unigram-LM (SentencePiece-style) tokenizer construction and apply
  * (Kudo, ACL 2018) — the maximum-likelihood sibling of the greedy
  * [[Bpe]] family, completing the trained-tokenizer pair of the
  * extended curation surface (SURVEY §2): SEED a scored vocabulary
  * from corpus substrings ([[seedVocab]]), FREEZE it to driver-bounded
  * model state ([[vocabModel]]), APPLY it by Viterbi best-path
  * segmentation ([[segmentStats]] fertility report, [[encodePieces]]
  * token stream) — each step oracle-gated.
  *
  * Scale shape: the one corpus-sized pass is the word hash-aggregation
  * (map-side combinable); substring expansion and ranking run over the
  * DISTINCT-WORD table (millions of rows at 100 TB, never
  * corpus-sized), with the top-N rank a range-partitioned [[PrefixSum]]
  * — no single-partition window. The frozen vocabulary is model
  * metadata bounded by `topN` + alphabet (the [[Bpe.mergePairs]] /
  * k-means-codebook collect discipline), riding the apply plan as ONE
  * codegen reference object; segmentation itself is entirely narrow —
  * documents never shuffle.
  *
  * The reference engine (okp4/kafka-processor-cosmos-tx-dispatch) has
  * no tokenizer surface; this extends the LLM-pipeline scope the same
  * way [[Bpe]] does. Scoring is integer-quantized log₂ likelihood —
  * see [[graft.functions.UnigramSegmentStats]] for the exactness
  * contract and tie-break total order.
  */
object Unigram {

  /** The SentencePiece whitespace marker (U+2581 LOWER ONE EIGHTH
    * BLOCK): under `metaspace = true` every word trains and segments as
    * `▁word`, so emitted pieces CARRY their preceding-space information
    * and the token stream detokenizes exactly (`concat → ▁→space →
    * strip leading`) — the public SentencePiece `add_dummy_prefix` /
    * metaspace convention, the unigram family's sibling of the BPE
    * side's Ġ byte unit.
    */
  val Metaspace = "▁"

  /** Corpus-weighted word table (word, cnt) — the one corpus-sized
    * aggregation, shared tokenization contract with [[Bpe]]
    * ([[TextFunctions.tokens]]: lowercase, `[ \t\n\f\r]+`).
    * `metaspace` prefixes every word with [[Metaspace]] AFTER the
    * hash-agg input explode — the prefix is injective per word, so the
    * groups are identical and the corpus-sized pass never changes (the
    * byte-level BPE encode-after-agg discipline).
    */
  private def wordCounts(docs: DataFrame,
      metaspace: Boolean = false): DataFrame = {
    val wc = docs.select(explode(TextFunctions.tokens(col("text"))).as("word"))
      .groupBy(col("word")).agg(count(lit(1)).as("cnt"))
    if (metaspace)
      wc.select(concat(lit(Metaspace), col("word")).as("word"), col("cnt"))
    else wc
  }

  /** SEED vocabulary (Kudo §3.2's seed step, substring-count variant):
    * every substring of length ≤ `maxPieceLen` of every corpus word,
    * weighted by word frequency × occurrence count within the word;
    * keep the top `topN` by (n_occ DESC, piece ASC) PLUS every
    * single-character piece regardless of rank — the coverage
    * guarantee that makes Viterbi segmentation total on the seeding
    * corpus (SentencePiece keeps all single characters for the same
    * reason). Output: (piece, n_occ), the scored vocabulary.
    *
    * The expansion runs over the distinct-word table (never
    * corpus-sized); the rank is a range-partitioned [[PrefixSum]].
    */
  def seedVocab(docs: DataFrame, maxPieceLen: Int, topN: Int,
      metaspace: Boolean = false): DataFrame =
    seedVocabFromWords(wordCounts(docs, metaspace), maxPieceLen, topN)

  /** [[seedVocab]] over an ALREADY-built word table — the trainer's
    * entry point: [[trainVocab]] pays the corpus-sized word hash-agg
    * ONCE and feeds the checkpointed (word, cnt) frame to the seed AND
    * every E-step round (guide §5/§6 — the round-19 fix for the
    * one-corpus-pass-per-round re-aggregation).
    */
  private def seedVocabFromWords(words: DataFrame, maxPieceLen: Int,
      topN: Int): DataFrame = {
    require(maxPieceLen >= 1, s"maxPieceLen must be >= 1, got $maxPieceLen")
    require(topN >= 1, s"topN must be >= 1, got $topN")
    val subs = words
      .select(col("cnt"), explode(flatten(transform(
        sequence(lit(1), length(col("word"))), s =>
          transform(
            sequence(lit(1), least(lit(maxPieceLen), length(col("word")) - s + 1)),
            l => col("word").substr(s, l))))).as("piece"))
      .groupBy(col("piece")).agg(sum(col("cnt")).as("n_occ"))
    PrefixSum.inclusive(subs.withColumn("_one", lit(1L)),
        Seq(col("n_occ").desc, col("piece")), col("_one"), "rk")
      .filter(col("rk") <= topN || length(col("piece")) === 1)
      .select(col("piece"), col("n_occ"))
  }

  /** FREEZE a seeded vocabulary to the driver-bounded model the apply
    * expressions carry: (piece, bits(n_occ)) pairs plus
    * btot = bits(Σ n_occ) — bits(c) = ⌊log₂ c⌋ computed by integer
    * bit position (63 − nlz), mirrored in the oracle by a
    * power-of-two ladder join, never a float log2. The collect is
    * bounded by topN + alphabet (model metadata, the
    * [[Bpe.mergePairs]] discipline).
    */
  def vocabModel(vocab: DataFrame): (Seq[(String, Int)], Int) = {
    val rows = vocab.select(col("piece"), col("n_occ")).collect()
      .map(r => (r.getString(0), r.getLong(1)))
    require(rows.nonEmpty, "empty vocabulary")
    val bits = rows.map { case (p, c) =>
      require(c >= 1, s"piece '$p' has non-positive count $c")
      (p, 63 - java.lang.Long.numberOfLeadingZeros(c))
    }.toSeq
    val total = rows.map(_._2).sum
    (bits, 63 - java.lang.Long.numberOfLeadingZeros(total))
  }

  /** APPLY: per-document Viterbi segmentation stats under the frozen
    * model — (doc_id, n_words, n_pieces, score), the fertility report
    * ([[Bpe.segmentStats]]'s sibling, plus the max-likelihood score
    * the DP optimizes). One reference-object expression per row,
    * entirely narrow.
    */
  def segmentStats(docs: DataFrame, pieces: Seq[(String, Int)],
      btot: Int, byteFallback: Boolean = false,
      metaspace: Boolean = false): DataFrame = {
    import org.apache.spark.sql.GraftColumnBridge.{toColumn, toExpression}
    val st = toColumn(graft.functions.UnigramSegmentStats(
      toExpression(col("text")), pieces, btot, byteFallback, metaspace))
    docs.select(col("doc_id"), st.as("st"))
      .select(col("doc_id"), col("st.n_words").as("n_words"),
        col("st.n_pieces").as("n_pieces"), col("st.score").as("score"))
  }

  /** Corpus-weighted piece USAGE under a frozen model: how often each
    * piece actually appears on the Viterbi best paths — the E-step
    * count of the unigram trainer's EM loop (Kudo §3.2 step 2, Viterbi
    * approximation). One corpus-sized map + hash-aggregate; the DP
    * rides per row as the frozen expression.
    */
  def pieceUsage(docs: DataFrame, pieces: Seq[(String, Int)],
      btot: Int, metaspace: Boolean = false): DataFrame =
    encodePieces(docs, pieces, btot, metaspace = metaspace)
      .groupBy(col("piece")).agg(count(lit(1)).as("usage"))

  /** SOFT-EM piece usage — the FULL E-step (Kudo §3.2 step 2 as
    * SentencePiece implements it, forward–backward over the whole
    * segmentation lattice) instead of [[pieceUsage]]'s Viterbi
    * best-path approximation (the round-13/14 verdicts' carried ask):
    * each vocabulary piece's usage is its corpus-weighted EXPECTED
    * occurrence count under the posterior, quantized integer-exactly
    * (`e_q = ⌊scale·E⌋` per distinct word — see
    * [[graft.functions.UnigramSoftCounts]] for the scaled-integer
    * exactness contract that makes the DuckDB gate exact equality,
    * never a float forward–backward round-trip).
    *
    * Scale shape: ONE corpus-sized pass (the word hash-agg), the
    * lattice DP per DISTINCT word as one codegen reference-object
    * expression (constant plan size at any vocabulary), then a
    * vocabulary-bounded aggregation — `usage_q = Σ_w cnt_w · e_q(w)`,
    * exact because both factors are integers. Every vocabulary piece
    * reports (LEFT join from the model frame, zeros kept): the prune
    * step's (usage ASC, piece ASC) total order needs the zero rows.
    *
    * `vocab` rows are (piece, n_occ) — [[seedVocab]]/[[pruneVocab]]
    * output, the same frame [[vocabModel]] freezes; driver state is
    * the collected vocabulary (topN + alphabet — the model-collect
    * discipline). Output: (piece, usage_q).
    */
  def pieceUsageSoft(docs: DataFrame, vocab: DataFrame,
      probBits: Int = 8, scale: Long = 1000000L,
      metaspace: Boolean = false): DataFrame =
    pieceUsageSoftFromWords(wordCounts(docs, metaspace), vocab, probBits,
      scale)

  /** [[pieceUsageSoft]] over an ALREADY-built word table — see
    * [[seedVocabFromWords]].
    */
  private def pieceUsageSoftFromWords(words: DataFrame, vocab: DataFrame,
      probBits: Int, scale: Long): DataFrame = {
    import org.apache.spark.sql.GraftColumnBridge.{toColumn, toExpression}
    val spark = words.sparkSession
    val rows = vocab.select(col("piece"), col("n_occ"))
      .collect().map(r => (r.getString(0), r.getLong(1))).toSeq
    require(rows.nonEmpty, "empty vocabulary")
    val total = rows.map(_._2).sum
    val soft = toColumn(graft.functions.UnigramSoftCounts(
      toExpression(col("word")), rows, total, probBits, scale))
    // the product/sum runs in DECIMAL, not LongType: under non-ANSI
    // Spark a bigint overflow at corpus scale (e_q reaches len·scale per
    // word, cnt unbounded) would WRAP silently and desynchronize from
    // the HUGEINT oracle; the decimal sum is exact to 38 digits and the
    // assert_true below fails loudly at the int64 envelope instead
    // (round-15 advice — the LanguageModel envelope discipline)
    val usage = words
      .select(col("cnt"), explode(soft).as("pc"))
      .groupBy(col("pc.piece").as("piece"))
      .agg(sum(col("cnt").cast(org.apache.spark.sql.types.DecimalType(38, 0))
        * col("pc.e_q")).as("u"))
    spark.createDataFrame(rows).toDF("piece", "n_occ")
      .join(usage, Seq("piece"), "left")
      .select(col("piece"),
        (coalesce(col("u"), lit(0)).cast(org.apache.spark.sql.types.DecimalType(38, 0))
          + coalesce(assert_true(
              coalesce(col("u"), lit(0)) <= lit(Long.MaxValue)), lit(0)))
          .cast("long").as("usage_q"))
  }

  /** LIKELIHOOD-LOSS prune criterion (Kudo §3.2 step 3 as SentencePiece
    * ranks it — the round-15 verdict's refinement ask): per multi-char
    * vocabulary piece, the corpus-weighted LINEARIZED likelihood loss of
    * removing it, `loss_q(p) = Σ_w cnt_w · ⌊scale·(Z_w − Z_w^{−p})/Z_w⌋`
    * ([[graft.functions.UnigramLossDelta]] — the at-least-once posterior
    * mass, the first-order term of the true log-likelihood drop).
    * Usage ([[pieceUsageSoft]]) counts expected occurrences WITH
    * multiplicity; loss counts each word once — the two orders genuinely
    * disagree on multiplicity-heavy corpora (UnigramSpec pins a corpus
    * where they rank differently).
    *
    * Same scale shape as [[pieceUsageSoft]]: ONE corpus-sized pass (the
    * word hash-agg), the per-distinct-word excluded-forward DP as one
    * codegen reference object, a vocabulary-bounded aggregation, zeros
    * kept via the LEFT join (the prune total order needs them). Output:
    * (piece, loss_q) over MULTI-CHAR vocabulary pieces.
    */
  def pieceLossDelta(docs: DataFrame, vocab: DataFrame,
      probBits: Int = 8, scale: Long = 1000000L): DataFrame = {
    import org.apache.spark.sql.GraftColumnBridge.{toColumn, toExpression}
    val spark = docs.sparkSession
    val rows = vocab.select(col("piece"), col("n_occ"))
      .collect().map(r => (r.getString(0), r.getLong(1))).toSeq
    require(rows.nonEmpty, "empty vocabulary")
    val total = rows.map(_._2).sum
    val loss = toColumn(graft.functions.UnigramLossDelta(
      toExpression(col("word")), rows, total, probBits, scale))
    // decimal product/sum + loud int64 envelope — the pieceUsageSoft
    // overflow discipline
    val agg = wordCounts(docs)
      .select(col("cnt"), explode(loss).as("pc"))
      .groupBy(col("pc.piece").as("piece"))
      .agg(sum(col("cnt").cast(org.apache.spark.sql.types.DecimalType(38, 0))
        * col("pc.d_q")).as("l"))
    spark.createDataFrame(rows).toDF("piece", "n_occ")
      .filter(length(col("piece")) > 1)
      .join(agg, Seq("piece"), "left")
      .select(col("piece"),
        (coalesce(col("l"), lit(0)).cast(org.apache.spark.sql.types.DecimalType(38, 0))
          + coalesce(assert_true(
              coalesce(col("l"), lit(0)) <= lit(Long.MaxValue)), lit(0)))
          .cast("long").as("loss_q"))
  }

  /** One prune round RANKED BY LIKELIHOOD LOSS instead of usage: drop
    * the `dropK` lowest-loss multi-char pieces ((loss_q ASC, piece ASC)
    * total order), single-char pieces immune as ever. Output the
    * surviving vocabulary with its loss, (piece, loss_q) — single-char
    * survivors carry loss 0 (they are never candidates). Re-SCORING
    * stays usage-based in the trainer ([[pruneVocab]]): this refines the
    * candidate RANKING, the step where Kudo's criterion and the usage
    * approximation differ.
    */
  def pruneVocabByLoss(vocab: DataFrame, loss: DataFrame,
      dropK: Int): DataFrame = {
    require(dropK >= 0, s"dropK must be >= 0, got $dropK")
    val joined = vocab.select(col("piece"))
      .join(loss.select(col("piece"), col("loss_q")), Seq("piece"), "left")
      .select(col("piece"), coalesce(col("loss_q"), lit(0L)).as("loss_q"))
    val keptMulti = PrefixSum.inclusive(
        joined.filter(length(col("piece")) > 1).withColumn("_one", lit(1L)),
        Seq(col("loss_q").asc, col("piece")), col("_one"), "rk")
      .filter(col("rk") > dropK)
      .select(col("piece"), col("loss_q"))
    joined.filter(length(col("piece")) === 1)
      .unionByName(keptMulti)
  }

  /** PRUNE round (Kudo §3.2 step 3, hard-count variant): drop the
    * `dropK` lowest-usage MULTI-CHAR pieces ((usage ASC, piece ASC)
    * total order — zero-usage pieces go first); single-character
    * pieces are immune, so Viterbi coverage survives any number of
    * prune rounds. Survivors are re-scored from usage with a +1
    * Laplace floor (integer-exact; a kept-but-never-used piece scores
    * at count 1). Output: (piece, usage, n_occ = usage + 1) — feed it
    * back through [[vocabModel]] for the next apply round. The rank is
    * a range-partitioned [[PrefixSum]] over the vocabulary-sized frame.
    */
  def pruneVocab(vocab: DataFrame, usage: DataFrame, dropK: Int): DataFrame = {
    require(dropK >= 0, s"dropK must be >= 0, got $dropK")
    val joined = vocab.join(usage, Seq("piece"), "left")
      .select(col("piece"), coalesce(col("usage"), lit(0L)).as("usage"))
    val keptMulti = PrefixSum.inclusive(
        joined.filter(length(col("piece")) > 1).withColumn("_one", lit(1L)),
        Seq(col("usage").asc, col("piece")), col("_one"), "rk")
      .filter(col("rk") > dropK)
      .select(col("piece"), col("usage"))
    joined.filter(length(col("piece")) === 1)
      .unionByName(keptMulti)
      .select(col("piece"), col("usage"), (col("usage") + 1).as("n_occ"))
  }

  /** TRAIN to a target vocabulary size — the unigram trainer's full EM
    * loop (Kudo, ACL 2018 §3.2; SentencePiece's `vocab_size` contract):
    * from the seed vocabulary, repeat fit ([[vocabModel]]) → E-step
    * usage (Viterbi [[pieceUsage]], or with `soft = true` the
    * FULL-LATTICE forward–backward expected counts [[pieceUsageSoft]]
    * — the round SentencePiece actually runs, oracle-gated at
    * `q_unigram_train_soft`) → hard prune + Laplace re-score
    * ([[pruneVocab]]) until |vocab| ≤ `targetVocab`, dropping at most
    * `dropCap` lowest-usage multi-char pieces per round (the bounded
    * shrink schedule — SentencePiece's multiplicative shrink plays the
    * same role; a fixed cap keeps the round count and the oracle's
    * unroll depth deterministic). Single-char pieces are prune-immune,
    * so Viterbi coverage survives every round — and a target below the
    * single-char alphabet is therefore unreachable and refused loudly
    * up front. Output: the final (piece, n_occ) vocabulary, already
    * re-scored for the next [[vocabModel]]/[[segmentStats]] apply
    * (n_occ = last-round usage + 1 for pruned rounds; the seed counts
    * verbatim when the seed already meets the target — zero rounds is
    * a valid run, not an error).
    *
    * Scale shape: each round is ONE corpus-sized pass (the usage
    * hash-aggregate riding the frozen-model Viterbi expression —
    * map-side combinable, documents never shuffle) plus vocabulary-
    * sized pruning; the model collect is bounded by topN + alphabet
    * per round (the [[Bpe.trainMergesBatched]] driver-state
    * discipline), and the vocab frame is localCheckpointed per round
    * so round r's plan references checkpoint blocks, not a lineage
    * accumulating every prior round's corpus pass (prior rounds'
    * blocks free via GC/ContextCleaner once unreferenced, like the
    * BPE trainers). Termination is structural: every round drops
    * min(dropCap, excess, multi-char count) ≥ 1 pieces while excess
    * > 0 (if the multi-char pool empties, the size is the single-char
    * alphabet, which the up-front require bounds by the target).
    */
  def trainVocab(docs: DataFrame, maxPieceLen: Int, topN: Int,
      targetVocab: Int, dropCap: Int, soft: Boolean = false,
      probBits: Int = 8, scale: Long = 1000000L,
      metaspace: Boolean = false): DataFrame = {
    require(targetVocab >= 1, s"targetVocab must be >= 1, got $targetVocab")
    require(dropCap >= 1, s"dropCap must be >= 1, got $dropCap")
    // ONE corpus-sized word hash-agg for the whole trainer: the seed
    // and every soft E-step round read this checkpointed (word, cnt)
    // frame — the per-round `wordCounts(docs)` re-aggregation paid the
    // corpus scan + word shuffle rounds+1 times for identical results
    // (guide §5: materialize the reused frame once). The HARD path's
    // E-step segments whole documents ([[pieceUsage]]), so only the
    // seed reads the word table there — no reuse, no checkpoint.
    val words =
      if (soft) wordCounts(docs, metaspace).localCheckpoint()
      else wordCounts(docs, metaspace)
    var vocab = seedVocabFromWords(words, maxPieceLen, topN)
      .select(col("piece"), col("n_occ")).localCheckpoint()
    var (pieces, btot) = vocabModel(vocab)
    // CODE-POINT length, matching the engine-side prune-immunity test
    // (Spark's length() counts code points): a supplementary-plane char
    // (emoji) is one immune piece but two UTF-16 units — counting with
    // String.length would under-count the floor and let a targetVocab
    // between the two counts pass the require while the shrink loop
    // never terminates (round-13 advice)
    val singles = pieces.count(p => p._1.codePointCount(0, p._1.length) == 1)
    require(targetVocab >= singles,
      s"targetVocab $targetVocab is below the single-char alphabet ($singles) — " +
        "single-char pieces are prune-immune, so that size is unreachable")
    while (pieces.size > targetVocab) {
      val dropK = math.min(dropCap.toLong, pieces.size.toLong - targetVocab).toInt
      // E-step: Viterbi best-path usage (hard, the Kudo approximation)
      // or the full-lattice expected counts (soft — the real Kudo
      // round, [[pieceUsageSoft]]; the usage-agnostic prune makes the
      // M-step identical either way)
      val usage =
        if (soft) pieceUsageSoftFromWords(words, vocab, probBits, scale)
          .select(col("piece"), col("usage_q").as("usage"))
        else pieceUsage(docs, pieces, btot, metaspace)
      vocab = pruneVocab(vocab.select(col("piece")), usage, dropK)
        .select(col("piece"), col("n_occ")).localCheckpoint()
      val m = vocabModel(vocab)
      pieces = m._1
      btot = m._2
    }
    vocab
  }

  /** EMIT: the best-path piece stream — (doc_id, pos, piece), pos the
    * 1-based position in the document's piece sequence (word order,
    * then within-word piece order; [[Bpe.encodeTokens]]'s sibling
    * under the DP tie-break total order). Narrow map stage; the
    * [[Bpe.vocabulary]] / [[Bpe.tokenIds]] id steps compose on top
    * unchanged.
    */
  def encodePieces(docs: DataFrame, pieces: Seq[(String, Int)],
      btot: Int, byteFallback: Boolean = false,
      metaspace: Boolean = false): DataFrame = {
    import org.apache.spark.sql.GraftColumnBridge.{toColumn, toExpression}
    val enc = toColumn(graft.functions.UnigramEncode(
      toExpression(col("text")), pieces, btot, byteFallback, metaspace))
    docs.select(col("doc_id"), posexplode(enc).as(Seq("pos0", "piece")))
      .select(col("doc_id"), (col("pos0") + 1).as("pos"), col("piece"))
  }
}
