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
    * negatives draw UNIFORMLY over the vocabulary instead of the
    * paper's unigram^(3/4) table — the ¾-power needs real
    * exponentiation, which no integer-exact cross-engine spelling
    * reaches; uniform is the noise-contrastive baseline the paper's
    * §2.2 starts from. A draw that reproduces the true context is kept
    * as an ordinary negative (the released code does the same).
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
  def skipGramPairsWithVocab(docs: DataFrame, vocab0: DataFrame,
      window: Int = 2, negatives: Int = 2): DataFrame = {
    require(window >= 1, s"window must be >= 1, got $window")
    require(negatives >= 0, s"negatives must be >= 0, got $negatives")
    val vocab = SharedBranch.sharedBranch(vocab0)
    val vs = vocab.agg(count(lit(1)).as("vsz"))
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
    val pos = SharedBranch.sharedBranch(fwd.unionByName(bwd))
    val posOut = pos.select(col("doc_id"), col("p"), col("offset"),
      lit(0).as("sample_idx"), col("center"), col("context"),
      lit(1).as("label"))
    if (negatives == 0) return posOut
    val negKey = (i: Int) => TextFunctions.rollingHash(
      concat(col("doc_id").cast("string"), lit(":"), col("p").cast("string"),
        lit(":"), col("offset").cast("string"), lit(s":$i")))
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
