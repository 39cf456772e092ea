package graft.operators

import graft.functions.TextFunctions
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Embedding-training data prep — the word2vec/GloVe family (Mikolov
  * et al., NeurIPS 2013; Pennington, Socher & Manning, EMNLP 2014):
  * the corpus-to-training-pairs operators a pipeline runs before any
  * embedding fit. The reference engine has no embedding trainer; this
  * extends the curation surface (SURVEY §2 extended scope) next to the
  * tokenizer families — the same "frozen model + narrow apply"
  * discipline, with every published random draw replaced by
  * hash-determinism (the [[Bpe.fimTransform]] convention).
  *
  * All three operators share the [[LanguageModel]] word-stream shape:
  * ONE `doc_id`-keyed exchange for adjacency/compaction windows
  * (per-doc groups — millions of small partitions at 100 TB), count
  * tables as map-side-combinable hash aggregations, the vocabulary as
  * a broadcast dictionary.
  */
object Word2Vec {

  /** Frequency-ranked vocabulary with dense ids: top `maxVocab` tokens
    * by (count DESC, token ASC) — the [[Bpe.vocabulary]] rank rule over
    * the WORD stream. Output: (vid, tok, n_occ), vid dense 0-based.
    */
  def vocabulary(docs: DataFrame, maxVocab: Int): DataFrame = {
    require(maxVocab > 0, s"maxVocab must be positive, got $maxVocab")
    docs.select(explode(TextFunctions.tokens(col("text"))).as("tok"))
      .groupBy(col("tok")).agg(count(lit(1)).as("n_occ"))
      .orderBy(col("n_occ").desc, col("tok")).limit(maxVocab)
      .select((row_number().over(Window.orderBy(col("n_occ").desc, col("tok")))
        .cast("long") - 1).as("vid"), col("tok"), col("n_occ"))
  }

  /** The vocabulary-restricted, per-document COMPACTED word stream —
    * word2vec's preprocessing contract: out-of-vocabulary words are
    * REMOVED before windowing (the released word2vec.c drops sub-min-
    * count words and then slides the window over the survivors, so a
    * dropped word narrows the gap instead of blocking it). Output:
    * (doc_id, p, tok, vid), `p` dense 0-based over the kept words.
    */
  private def compactStream(docs: DataFrame, vocab: DataFrame): DataFrame = {
    val toks = docs.select(col("doc_id"),
      posexplode(TextFunctions.tokens(col("text"))).as(Seq("pos", "tok")))
    val w = Window.partitionBy(col("doc_id")).orderBy(col("pos"))
    toks.join(broadcast(vocab.select(col("tok"), col("vid"))), Seq("tok"))
      .withColumn("p", row_number().over(w).cast("long") - 1)
      .select(col("doc_id"), col("p"), col("tok"), col("vid"))
  }

  /** SKIP-GRAM TRAINING PAIRS WITH NEGATIVE SAMPLING (Mikolov et al.,
    * NeurIPS 2013 §2.2 — the (center, context) instance stream the
    * embedding fit consumes): every ordered pair of kept words within
    * `window` positions of each other emits a label-1 row, and each
    * positive draws `negatives` label-0 rows whose context is the
    * vocabulary token `vid = rolling_hash(doc:p:offset:i) % V`.
    *
    * Published deviations, both deliberate: (1) draws are
    * hash-deterministic, keyed (doc_id, center position, offset, draw
    * ordinal) so every row is reproducible under re-partitioning; (2)
    * THIS face draws negatives UNIFORMLY over the vocabulary — the
    * noise-contrastive baseline the paper's §2.2 starts from;
    * [[skipGramPairsUnigram]] is the published unigram^(3/4) variant
    * (the ¾-power spelled as an exact integer fourth root of
    * `n_occ³` — see [[negativeSamplingTable]]). A draw that reproduces
    * the true context is kept as an ordinary negative (the released
    * code does the same).
    *
    * Output: (doc_id, p, offset, sample_idx, center, context, label) —
    * `p` the center's compacted position, `offset` ∈ ±1..±window,
    * `sample_idx` 0 for the positive, 1.. for its negatives, `label`
    * 1/0.
    *
    * Plan shape: the compaction window rides ONE doc-keyed exchange;
    * positives are `window` `lead()` columns over the SAME exchange
    * exploded narrowly (both directions emitted from one lead — the
    * mirror pair is materialized, never re-scanned); negatives are a
    * narrow hash projection + ONE broadcast dictionary join (vid →
    * token); the 1-row V frame is a broadcast. Zero corpus-sized
    * shuffles beyond the adjacency exchange.
    */
  def skipGramPairs(docs: DataFrame, window: Int = 2, negatives: Int = 2,
      maxVocab: Int = 1024): DataFrame =
    skipGramPairsWithVocab(docs, vocabulary(docs, maxVocab), window, negatives)

  /** [[skipGramPairs]] against a PRE-BUILT (vid, tok, n_occ) vocabulary
    * — the FROZEN-model face for the streaming twin: the vocabulary is
    * corpus state computed batch-side once; each micro-batch's pairs
    * draw against the same dictionary (the classifier-face
    * discipline), so the foreachBatch union equals the batch run.
    */
  /** The (doc_id, p, offset, center, context) positive-pair stream both
    * negative-sampling variants share: `window` `lead()` columns over
    * ONE doc-keyed exchange, exploded narrowly, both directions
    * materialized from the one lead (the mirror pair is the same two
    * tokens swapped — never re-scanned).
    */
  private def positivePairs(docs: DataFrame, vocab: DataFrame,
      window: Int): DataFrame = {
    val stream = compactStream(docs, vocab)
    val w = Window.partitionBy(col("doc_id")).orderBy(col("p"))
    val withLeads = (1 to window).foldLeft(stream) { (df, o) =>
      df.withColumn(s"lead_$o", lead(col("tok"), o).over(w))
    }
    // one row per (center position, +offset) with its lead partner;
    // the mirror (-offset) pair is the same two tokens swapped
    val pairs = withLeads.select(col("doc_id"), col("p"), col("tok"),
        explode(array((1 to window).map(o =>
          struct(lit(o).as("o"), col(s"lead_$o").as("other"))): _*)).as("e"))
      .filter(col("e.other").isNotNull)
      .select(col("doc_id"), col("p"), col("tok"), col("e.o").as("o"),
        col("e.other").as("other"))
    val fwd = pairs.select(col("doc_id"), col("p"), col("o").as("offset"),
      col("tok").as("center"), col("other").as("context"))
    val bwd = pairs.select(col("doc_id"), (col("p") + col("o")).as("p"),
      (-col("o")).as("offset"), col("other").as("center"),
      col("tok").as("context"))
    fwd.unionByName(bwd)
  }

  /** The positive rows in the output schema (sample_idx 0, label 1). */
  private def positiveRows(pos: DataFrame): DataFrame =
    pos.select(col("doc_id"), col("p"), col("offset"),
      lit(0).as("sample_idx"), col("center"), col("context"),
      lit(1).as("label"))

  /** The hash-deterministic draw key for negative `i` of a positive:
    * keyed (doc_id, center position, offset, draw ordinal) so every row
    * is reproducible under re-partitioning.
    */
  private def negKey(i: Int): Column = TextFunctions.rollingHash(
    concat(col("doc_id").cast("string"), lit(":"), col("p").cast("string"),
      lit(":"), col("offset").cast("string"), lit(s":$i")))

  def skipGramPairsWithVocab(docs: DataFrame, vocab0: DataFrame,
      window: Int = 2, negatives: Int = 2): DataFrame = {
    require(window >= 1, s"window must be >= 1, got $window")
    require(negatives >= 0, s"negatives must be >= 0, got $negatives")
    val vocab = SharedBranch.sharedBranch(vocab0)
    // the draw is nid = hash % |V| inner-joined to vid, which is only a
    // uniform draw over DENSE 0-based ids ([[vocabulary]]-shaped frames);
    // a sparse caller-supplied id space would silently DROP negatives, so
    // the density contract is asserted LOUD in-plan, riding the consumed
    // vsz (the knModelOf discipline)
    val vs = vocab
      .agg(count(lit(1)).as("vsz0"),
        coalesce(min(col("vid")), lit(0L)).as("minv"),
        coalesce(max(col("vid")), lit(-1L)).as("maxv"))
      .select(expr("vsz0 + coalesce(assert_true(vsz0 = 0 OR" +
        " (minv = 0 AND maxv = vsz0 - 1)," +
        " 'skipGramPairsWithVocab requires dense 0-based vids" +
        " (vocabulary()-shaped frame)'), 0)").as("vsz"))
    val pos = SharedBranch.sharedBranch(positivePairs(docs, vocab, window))
    val posOut = positiveRows(pos)
    if (negatives == 0) return posOut
    val negs = pos.crossJoin(broadcast(vs))
      .select(col("doc_id"), col("p"), col("offset"), col("center"),
        explode(array((1 to negatives).map(i =>
          struct(lit(i).as("sample_idx"), (negKey(i) % col("vsz")).as("nid"))): _*))
          .as("e"))
      .select(col("doc_id"), col("p"), col("offset"),
        col("e.sample_idx").as("sample_idx"), col("center"),
        col("e.nid").as("nid"))
      .join(broadcast(vocab.select(col("vid").as("nid"), col("tok").as("context"))),
        Seq("nid"))
      .select(col("doc_id"), col("p"), col("offset"), col("sample_idx"),
        col("center"), col("context"), lit(0).as("label"))
    posOut.unionByName(negs)
  }

  /** UNIGRAM^(3/4) NEGATIVE-SAMPLING TABLE (Mikolov et al., NeurIPS
    * 2013 §2.2 — the released word2vec.c fills its sampling table
    * proportional to `U(w)^{3/4}`, the distribution that "outperformed
    * significantly the unigram and the uniform distributions"): per
    * vocabulary entry the integer weight `w34 = ⌊n_occ^{3/4}⌋ =
    * ⌊(n_occ³)^{1/4}⌋` and the EXCLUSIVE running total `cum` in vid
    * order, so a draw `h ∈ [0, Σw34)` picks the unique vid with
    * `cum ≤ h < cum + w34`.
    *
    * The fourth root is EXACT INTEGER arithmetic: `pow` is not
    * correctly rounded (IEEE-754 only guarantees sqrt), so the double
    * `⌊(n_occ³)^{0.25}⌋` merely SEEDS the search and two integer
    * correction steps (one up, one down — the libm error is ≪ 1 ulp of
    * the root, so the seed is within ±1 of the true floor in any
    * conforming engine) pin the exact value, bit-identical across
    * engines. `n_occ ≤ 2·10⁶` is asserted LOUD in-plan (riding the
    * consumed w34): above it `n_occ³` nears int64 and the root's
    * `(r+1)⁴` probe could wrap.
    *
    * Output: (vid, tok, n_occ, w34, cum) — vocabulary-bounded. The
    * running total rides [[PrefixSum]] (per-partition windows + the
    * broadcast offset triangle), never an unpartitioned window.
    */
  def negativeSamplingTable(vocab: DataFrame): DataFrame = {
    val root = "(CASE WHEN _r1 * _r1 * _r1 * _r1 > _c3 THEN _r1 - 1 ELSE _r1 END)"
    val tbl = vocab.select(col("vid"), col("tok"), col("n_occ"))
      .withColumn("_c3", expr("n_occ * n_occ * n_occ"))
      .withColumn("_r0",
        expr("CAST(floor(power(CAST(_c3 AS DOUBLE), 0.25D)) AS BIGINT)"))
      .withColumn("_r1", expr(
        "CASE WHEN (_r0 + 1) * (_r0 + 1) * (_r0 + 1) * (_r0 + 1) <= _c3" +
          " THEN _r0 + 1 ELSE _r0 END"))
      .withColumn("w34", expr(s"$root + coalesce(assert_true(" +
        "n_occ <= 2000000, 'negativeSamplingTable int64 envelope: " +
        "n_occ^3 must fit int64 — split the table build by count" +
        " stratum above 2e6 occurrences'), 0)"))
      .select(col("vid"), col("tok"), col("n_occ"), col("w34"))
    PrefixSum.inclusive(tbl, Seq(col("vid")), col("w34"), "cum_incl")
      .select(col("vid"), col("tok"), col("n_occ"), col("w34"),
        (col("cum_incl") - col("w34")).as("cum"))
  }

  /** [[skipGramPairs]] with the PUBLISHED unigram^(3/4) negative-
    * sampling distribution (Mikolov et al., NeurIPS 2013 §2.2) in
    * place of the uniform stand-in: each positive's negative `i` draws
    * `h = rolling_hash(doc:p:offset:i) % Σw34` and takes the
    * vocabulary entry whose [[negativeSamplingTable]] interval covers
    * `h` — frequent words are drawn ∝ count^{3/4}, the distribution
    * the released word2vec.c ships. Draws stay hash-deterministic
    * (reproducible under re-partitioning); a draw that reproduces the
    * true context is kept as an ordinary negative (as in the released
    * code). Output schema is exactly [[skipGramPairs]]'s.
    *
    * Plan shape: [[positivePairs]]'s one doc-keyed exchange; the draw
    * is a narrow hash projection + ONE interval join against the
    * BROADCAST vocabulary-bounded table (a BroadcastNestedLoopJoin
    * whose build side is ≤ maxVocab rows — the codebook class of the
    * pinned-BNLJ discipline; every `h` lands in exactly one interval,
    * so row counts are preserved). At vocabularies ≫ 10⁴ the interval
    * probe's V-comparisons-per-row factor is the cost knob — the
    * frozen-model escape hatch is a collected table behind a loud size
    * gate feeding a binary-search expression, the [[LanguageModel
    * .fitKneserNey]] discipline, which the vocab-bounded table makes a
    * drop-in.
    */
  def skipGramPairsUnigram(docs: DataFrame, window: Int = 2,
      negatives: Int = 2, maxVocab: Int = 1024): DataFrame =
    skipGramPairsUnigramWithVocab(docs, vocabulary(docs, maxVocab),
      window, negatives)

  /** [[skipGramPairsUnigram]] against a PRE-BUILT vocabulary — the
    * frozen-model face for the streaming twin (the
    * [[skipGramPairsWithVocab]] discipline: the table is corpus state
    * computed batch-side once; every micro-batch draws against it).
    */
  def skipGramPairsUnigramWithVocab(docs: DataFrame, vocab0: DataFrame,
      window: Int = 2, negatives: Int = 2): DataFrame = {
    require(window >= 1, s"window must be >= 1, got $window")
    require(negatives >= 0, s"negatives must be >= 0, got $negatives")
    val vocab = SharedBranch.sharedBranch(vocab0)
    val pos = SharedBranch.sharedBranch(positivePairs(docs, vocab, window))
    val posOut = positiveRows(pos)
    if (negatives == 0) return posOut
    val tbl = SharedBranch.sharedBranch(negativeSamplingTable(vocab))
    // Σw34 ≥ 1 whenever the table is non-empty (n_occ ≥ 1 ⇒ w34 ≥ 1);
    // the loud guard still rides for caller-supplied zero-count frames,
    // which would otherwise reach `% 0`
    val wt = tbl.agg(sum(col("w34")).as("wt0"))
      .select(expr("wt0 + coalesce(assert_true(wt0 IS NULL OR wt0 > 0," +
        " 'skipGramPairsUnigram: negative-sampling table has zero total" +
        " weight — every vocabulary entry needs n_occ >= 1'), 0)")
        .as("wtot"))
    val negs = pos.crossJoin(broadcast(wt))
      .select(col("doc_id"), col("p"), col("offset"), col("center"),
        explode(array((1 to negatives).map(i =>
          struct(lit(i).as("sample_idx"),
            (negKey(i) % col("wtot")).as("hmod"))): _*)).as("e"))
      .select(col("doc_id"), col("p"), col("offset"),
        col("e.sample_idx").as("sample_idx"), col("center"),
        col("e.hmod").as("hmod"))
      .join(broadcast(tbl.select(col("cum"), col("w34"),
          col("tok").as("context"))),
        col("hmod") >= col("cum") && col("hmod") < col("cum") + col("w34"))
      .select(col("doc_id"), col("p"), col("offset"), col("sample_idx"),
        col("center"), col("context"), lit(0).as("label"))
    posOut.unionByName(negs)
  }

  /** Fit the FROZEN unigram^(3/4) sampling table
    * [[skipGramPairsUnigramFrozen]] draws from — the
    * [[LanguageModel.fitKneserNey]] discipline: the
    * [[negativeSamplingTable]] collected driver-side in vid order,
    * size-gated LOUD before any `.collect()`. Returns (exclusive cums,
    * tokens, Σw34).
    */
  def fitNegativeTable(vocab: DataFrame, maxModelKeys: Long = 100000L)
      : (Array[Long], Array[String], Long) = {
    require(maxModelKeys > 0, s"maxModelKeys must be positive, got $maxModelKeys")
    val tbl = SharedBranch.sharedBranch(negativeSamplingTable(vocab))
    val nKeys = tbl.count()
    require(nKeys <= maxModelKeys,
      s"fitNegativeTable has $nKeys vocabulary entries > maxModelKeys =" +
        s" $maxModelKeys: a table this large must not ride the plan as a" +
        " reference object — use the skipGramPairsUnigramWithVocab interval" +
        " join instead, or raise maxModelKeys deliberately")
    val rows = tbl.orderBy(col("vid"))
      .select(col("cum"), col("w34"), col("tok")).collect()
    require(rows.nonEmpty, "fitNegativeTable: empty vocabulary")
    val cums = rows.map(_.getLong(0))
    val toks = rows.map(_.getString(2))
    val wtot = rows.last.getLong(0) + rows.last.getLong(1)
    require(wtot > 0,
      "fitNegativeTable: zero total weight — every entry needs n_occ >= 1")
    (cums, toks, wtot)
  }

  /** [[skipGramPairsUnigram]] with the table FROZEN as a codegen
    * reference object and each draw resolved by BINARY SEARCH
    * ([[graft.functions.NegTableSample]]) — the deployment shape the
    * interval join's scaladoc promises at vocabularies ≫ 10⁴: the
    * negatives become ENTIRELY NARROW per-row work (hash, mod by the
    * driver-constant Σw34, O(log V) probe — no join, no broadcast
    * table, no exchange beyond [[positivePairs]]' one doc-keyed
    * window), and the per-row cost drops from the
    * BroadcastNestedLoopJoin's O(V) interval comparisons to O(log V).
    * Row-identical to [[skipGramPairsUnigramWithVocab]] on the same
    * vocabulary (same hash keys, same covering intervals — the spec
    * pins it), so the SAME oracle gates both spellings.
    */
  def skipGramPairsUnigramFrozen(docs: DataFrame, vocab0: DataFrame,
      window: Int = 2, negatives: Int = 2,
      maxModelKeys: Long = 100000L): DataFrame = {
    require(window >= 1, s"window must be >= 1, got $window")
    require(negatives >= 0, s"negatives must be >= 0, got $negatives")
    val vocab = SharedBranch.sharedBranch(vocab0)
    val pos = SharedBranch.sharedBranch(positivePairs(docs, vocab, window))
    val posOut = positiveRows(pos)
    if (negatives == 0) return posOut
    val (cums, toks, wtot) = fitNegativeTable(vocab, maxModelKeys)
    val negs = pos
      .select(col("doc_id"), col("p"), col("offset"), col("center"),
        explode(array((1 to negatives).map(i =>
          struct(lit(i).as("sample_idx"),
            (negKey(i) % lit(wtot)).as("hmod"))): _*)).as("e"))
      .select(col("doc_id"), col("p"), col("offset"),
        col("e.sample_idx").as("sample_idx"), col("center"),
        graft.functions.NegTableSample.negTableSample(
          col("e.hmod"), cums, toks).as("context"),
        lit(0).as("label"))
    posOut.unionByName(negs)
  }

  /** GLOVE DISTANCE-WEIGHTED CO-OCCURRENCE MATRIX (Pennington et al.,
    * EMNLP 2014 §3 — `X_ij` with the released code's 1/d decay: a
    * context word d positions away contributes 1/d): the AGGREGATE
    * form of the pair stream, and the 100 TB shape — the matrix is
    * vocab²-bounded however large the corpus, and the sum is ONE
    * map-side-combinable hash aggregation. Weights are kept exact as
    * integers scaled by lcm(1..window) (`x_scaled = Σ scale/d`), the
    * [[LanguageModel]] quantization discipline — no float sum ever
    * happens.
    *
    * Output: (center, context, x_scaled, n_pairs), symmetric (both
    * directions counted, like the released corpus-to-cooccur tool).
    */
  def gloveCooccurrence(docs: DataFrame, window: Int = 3,
      maxVocab: Int = 1024): DataFrame = {
    require(window >= 1, s"window must be >= 1, got $window")
    val scale = (1 to window).foldLeft(1L)((a, d) => a / gcd(a, d) * d)
    val vocab = SharedBranch.sharedBranch(vocabulary(docs, maxVocab))
    val stream = compactStream(docs, vocab)
    val w = Window.partitionBy(col("doc_id")).orderBy(col("p"))
    val withLeads = (1 to window).foldLeft(stream) { (df, o) =>
      df.withColumn(s"lead_$o", lead(col("tok"), o).over(w))
    }
    val pairs = withLeads.select(col("tok"),
        explode(array((1 to window).map(o =>
          struct(lit(scale / o).as("wgt"), col(s"lead_$o").as("other"))): _*)).as("e"))
      .filter(col("e.other").isNotNull)
      .select(col("tok"), col("e.other").as("other"), col("e.wgt").as("wgt"))
    pairs.select(col("tok").as("center"), col("other").as("context"), col("wgt"))
      .unionByName(pairs.select(col("other").as("center"), col("tok").as("context"),
        col("wgt")))
      .groupBy(col("center"), col("context"))
      .agg(sum(col("wgt")).as("x_scaled"), count(lit(1)).as("n_pairs"))
  }

  private def gcd(a: Long, b: Long): Long = if (b == 0) a else gcd(b, a % b)

  /** FASTTEXT SUBWORD N-GRAMS (Bojanowski et al., TACL 2017 §3.2 —
    * character n-grams of the `<`boundary-wrapped`>` word, hashed into
    * a fixed bucket table: the subword features that let the embedding
    * cover OOV words): one row per (word type, n, position) with the
    * extracted n-gram and its bucket `rolling_hash(ngram) % buckets`
    * (the released code hashes with FNV-1a; the house rolling hash is
    * the documented stand-in — any fixed hash serves, the bucket table
    * is opaque).
    *
    * Output: (word, n_occ, n, i, ngram, bucket), `i` the 1-based
    * character position in the wrapped word.
    *
    * Plan shape: DICTIONARY-sized, the 100 TB shape — one distinct-word
    * hash-agg of the corpus (the [[Bpe]] trainer's one corpus-sized
    * pass), then a narrow bounded explode (≤ (maxN−minN+1)·|word|
    * rows per TYPE, not per occurrence); no join, no window.
    */
  def fasttextSubwords(docs: DataFrame, minN: Int = 3, maxN: Int = 6,
      buckets: Int = 4096): DataFrame = {
    require(minN >= 1 && maxN >= minN, s"need 1 <= minN <= maxN, got $minN..$maxN")
    require(buckets > 0, s"buckets must be positive, got $buckets")
    val words = docs
      .select(explode(TextFunctions.tokens(col("text"))).as("word"))
      .groupBy(col("word")).agg(count(lit(1)).as("n_occ"))
    words.withColumn("w", concat(lit("<"), col("word"), lit(">")))
      .withColumn("n", explode(array((minN to maxN).map(lit): _*)))
      .filter(length(col("w")) >= col("n"))
      .withColumn("i", explode(expr("sequence(1, length(w) - n + 1)")))
      .withColumn("ngram", expr("substring(w, i, n)"))
      .withColumn("bucket",
        TextFunctions.rollingHash(col("ngram")) % lit(buckets.toLong))
      .select(col("word"), col("n_occ"), col("n"), col("i"),
        col("ngram"), col("bucket"))
  }

  /** FREQUENT-WORD SUBSAMPLING (Mikolov et al., NeurIPS 2013 §2.3 —
    * the aggressive stopword downsampler every word2vec/fastText
    * pipeline runs: instance of word `w` with corpus frequency `f(w)`
    * is kept with probability `min(1, sqrt(t / (f(w)/N)))`). The
    * paper's coin is hash-deterministic: keep iff
    * `rolling_hash(doc:pos:tok) % 2²⁰ < floor(sqrt(t·N/c(tok))·2²⁰)`.
    *
    * The threshold arithmetic is IEEE-754 double (division, sqrt,
    * multiply — each correctly rounded and therefore bit-identical in
    * any conforming engine; `floor` then lands on the same integer),
    * the ONE documented exception to the integer-only oracle rule: no
    * SUM/AVG ever touches the doubles (per-row scalars only), which is
    * what the no-float discipline actually guards against.
    *
    * Output: (doc_id, pos, tok, c_tok, thresh, kept) — one row per
    * word instance with the draw fully auditable; downstream takes
    * `kept` and recompacts.
    *
    * Plan shape: the frequency table is one hash-agg (vocabulary-
    * bounded) joined back keyed on `tok` (AQE broadcasts when it
    * fits); the draw and threshold are narrow; the 1-row N frame is a
    * broadcast.
    */
  def subsampleFrequent(docs: DataFrame, t: Double = 0.01): DataFrame = {
    require(t > 0, s"t must be positive, got $t")
    val toks = SharedBranch.sharedBranch(docs.select(col("doc_id"),
      posexplode(TextFunctions.tokens(col("text"))).as(Seq("pos", "tok"))))
    val freq = toks.groupBy(col("tok")).agg(count(lit(1)).as("c_tok"))
    val n = toks.agg(count(lit(1)).as("n_tot"))
    toks.join(freq, Seq("tok"))
      .crossJoin(broadcast(n))
      .withColumn("thresh", least(lit(1L << 20),
        floor(sqrt(lit(t) * col("n_tot") / col("c_tok")) * lit(1048576.0))))
      .withColumn("h", TextFunctions.rollingHash(
        concat(col("doc_id").cast("string"), lit(":"),
          col("pos").cast("string"), lit(":"), col("tok"))) % lit(1048576L))
      .select(col("doc_id"), col("pos"), col("tok"), col("c_tok"),
        col("thresh"), (col("h") < col("thresh")).as("kept"))
  }
}
