package graft.operators

import graft.functions.TextFunctions._
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Text-analysis operators for training-data curation: language ID,
  * quality scoring, token counting, document fingerprinting. All narrow
  * per-row column work (built-in HOFs) — linear scaling, no shuffle.
  */
object TextAnalysis {

  /** Marker-based language ID: count marker-stopword hits per language,
    * pick the argmax (declaration order wins ties, 'und' = undetermined
    * when nothing hits). Deterministic and SQL-reproducible.
    *
    * One-pass [[graft.functions.LangId]] expression; the HOF fold below
    * ([[langIdHof]]) is the semantics it is property-pinned against —
    * that spelling re-ran its lambda `filter` traversals ~30× per row
    * (lambda HOFs are excluded from subexpression elimination).
    */
  def langId(toks: Column): Column = graft.functions.LangId.lang_id(toks)

  /** The original HOF spelling of [[langId]] — kept as the executable
    * specification (LangIdSpec pins `langId ≡ langIdHof` property-wise).
    * Do not use in production paths: every reference to a score or the
    * max re-runs its full array traversal.
    */
  def langIdHof(toks: Column): Column = {
    // langs in fixed order; fold keeps the first maximum
    val ordered = Seq("en", "de", "fr", "es", "zh")
    val scores = ordered.map(l => markerHits(toks, langMarkers(l)))
    val best = scores.reduce((a, b) => greatest(a, b))
    ordered.zip(scores).foldRight(lit("und"): Column) { case ((l, s), acc) =>
      when(s === best && best > 0, lit(l)).otherwise(acc)
    }
  }

  /** Quality metrics per document. `quality_score` is a simple bounded
    * combination: length prior + stopword signal − punctuation penalty.
    */
  def qualityMetrics(docs: DataFrame): DataFrame =
    // tokens materialized ONCE: the metric expressions reference the
    // projected column instead of re-tokenizing per metric (lambda-bearing
    // HOFs are excluded from subexpression elimination — same trap as the
    // MinHash signature hot loop)
    docs
      .withColumn("toks", tokens(col("text")))
      .select(
        col("doc_id"),
        length(col("text")).as("n_chars_obs"),
        size(col("toks")).as("n_tokens"),
        bpeishFromTokens(col("toks")).as("n_bpeish_tokens"),
        stopwordRatio(col("toks")).as("stopword_ratio"),
        punctRatio(lower(col("text"))).as("punct_ratio"),
        langId(col("toks")).as("lang_pred"))

  /** Language-ID CONFUSION MATRIX — the detector measured, not assumed
    * (the discipline every approximate component here follows: recall
    * for LSH, distortion for codebooks, this for [[langId]]): per
    * (labeled lang, predicted lang) cell, the document count and its
    * integer ppm share of the labeled language. The diagonal is
    * per-language recall; off-diagonal mass names the confusion pairs
    * worth better markers; the `und` column is the detector's abstain
    * rate. One narrow predict projection + one ≤ |langs|²-row
    * aggregation; the window runs over that tiny aggregate.
    *
    * Output: (lang, lang_pred, n, ppm_of_lang).
    */
  def langIdConfusion(docs: DataFrame): DataFrame =
    docs
      .withColumn("toks", tokens(col("text")))
      .select(col("lang"), langId(col("toks")).as("lang_pred"))
      .groupBy(col("lang"), col("lang_pred"))
      .agg(count(lit(1)).as("n"))
      .withColumn("ppm_of_lang",
        expr("(n * 1000000) div sum(n) OVER (PARTITION BY lang)"))

  /** WIMBD-style TOP-N-GRAMS PER SOURCE (Elazar et al., ICLR 2024
    * "What's In My Big Data?", arXiv:2310.20707 §3 — the
    * most-common-n-grams report WIMBD runs per corpus, the summary
    * every release paper tables): the `k` most frequent word n-grams
    * of each source with exact counts, ranked (count DESC, n-gram
    * ASC — the house deterministic tiebreak).
    *
    * Output: (source, rank, ngram, n_occ), rank 1-based, ≤ k rows per
    * source.
    *
    * Plan shape: one narrow shingle explode + ONE map-side-combinable
    * (source, ngram) hash aggregation — the corpus-sized work — then
    * [[Stats.topKPerGroup]]'s salted two-phase rank over the COUNT
    * table (type-bounded, never the corpus; no source funnels its
    * n-gram type table through one task). Nothing else shuffles.
    */
  def topNgramsBySource(docs: DataFrame, n: Int = 2, k: Int = 10): DataFrame = {
    require(n >= 1, s"n must be positive, got $n")
    val grams = docs.select(col("source"),
      explode(graft.functions.TextFunctions.shingles(
        tokens(col("text")), n)).as("ngram"))
    val cnt = grams.groupBy(col("source"), col("ngram"))
      .agg(count(lit(1)).as("n_occ"))
    Stats.topKPerGroup(cnt, "source", k, saltCol = col("ngram"),
        order = Seq(col("n_occ").desc, col("ngram")))
      .select(col("source"), col("rank"), col("ngram"), col("n_occ"))
  }

  /** Corpus snapshot DIFF — [[tokenShiftTopK]]'s row-granular sibling:
    * which documents were added, removed, or changed between snapshot
    * `a` and snapshot `b`, judged by the rolling content hash (so a
    * re-crawl that rewrites bytes but not content stays `unchanged`
    * only if the text is truly identical). One full-outer doc-keyed
    * join of two narrow (doc_id, fp) projections; the diff is the audit
    * read between pipeline runs, next to the shard-manifest signature
    * compare — this names the rows, that compares the totals.
    *
    * Output: (doc_id, status ∈ added|removed|changed|unchanged) —
    * `added` = in `b` only, `removed` = in `a` only.
    */
  def corpusDiff(a: DataFrame, b: DataFrame): DataFrame = {
    def fps(df: DataFrame, n: String) = df.select(col("doc_id"),
      rollingHash(col("text")).as(n))
    fps(a, "fp_a").join(fps(b, "fp_b"), Seq("doc_id"), "full_outer")
      .select(col("doc_id"),
        when(col("fp_a").isNull, "added")
          .when(col("fp_b").isNull, "removed")
          .when(col("fp_a") === col("fp_b"), "unchanged")
          .otherwise("changed").as("status"))
  }

  /** Token-distribution shift between two corpus snapshots — the drift
    * monitor a training pipeline reads after refreshing a source: the
    * `k` tokens whose per-million share moved most between `a` and `b`,
    * with exact integer arithmetic end-to-end (count · 10⁶ div total —
    * fits BIGINT while a snapshot stays under ~9·10¹² tokens; shard the
    * report by lang/source above that). A token absent from one side
    * counts 0 there (full outer join), so appearing/vanishing vocabulary
    * ranks at its full share. Both snapshots must be non-empty — an
    * empty side has no distribution to compare (total 0).
    *
    * Scale shape: two explode → hash-agg chains with map-side partials
    * (vocabulary-sized after the first partial), one token-keyed
    * full-outer join, totals as broadcast 1-row frames, and a
    * TakeOrderedAndProject top-k — never a global sort of the
    * vocabulary.
    */
  def tokenShiftTopK(a: DataFrame, b: DataFrame, k: Int): DataFrame = {
    require(k > 0, s"k must be positive, got $k")
    def counts(d: DataFrame, n: String) = d
      .select(explode(tokens(col("text"))).as("token"))
      .groupBy(col("token")).agg(count(lit(1)).as(n))
    counts(a, "n_a")
      .join(counts(b, "n_b"), Seq("token"), "full_outer")
      .na.fill(0L, Seq("n_a", "n_b"))
      .crossJoin(broadcast(counts(a, "x").agg(sum(col("x")).as("total_a"))))
      .crossJoin(broadcast(counts(b, "x").agg(sum(col("x")).as("total_b"))))
      .select(col("token"), col("n_a"), col("n_b"),
        expr("(n_a * 1000000) div total_a").as("ppm_a"),
        expr("(n_b * 1000000) div total_b").as("ppm_b"))
      .withColumn("ppm_shift", abs(col("ppm_a") - col("ppm_b")))
      .orderBy(col("ppm_shift").desc, col("token"))
      .limit(k)
  }

  /** Document fingerprint: rolling hash of the normalized text
    * (lowercased, whitespace-collapsed) — the cheap exact-dedup key.
    */
  def fingerprint(text: Column): Column =
    rollingHash(concat_ws(" ", tokens(text)))

  /** Winnowing fingerprints (Schleimer/Wilkerson/Aiken, SIGMOD 2003 —
    * the MOSS local fingerprinting algorithm): over the document's
    * word-`k`-gram rolling-hash SEQUENCE, slide a window of `w` hashes
    * and select each window's RIGHTMOST minimal hash (the simplified
    * rightmost-tie rule; the paper's "robust" variant additionally
    * prefers the previously selected hash — same density guarantee).
    * The selected (position, hash) set is a deterministic ~2/(w+1)
    * density sample that two documents sharing any k-gram run of length
    * ≥ w+k−1 are GUARANTEED to overlap on — the local-guarantee
    * property MinHash doesn't give. Documents shorter than `w` hashes
    * winnow their single partial window; documents under `k` tokens
    * have no fingerprints.
    *
    * Entirely narrow per-row work (one fused O(m) pass, no shuffle, no
    * UDF — [[graft.functions.WinnowFps]], a monotonic-deque codegen
    * expression): linear scaling, partition-local. Output: one row per
    * distinct (doc_id, pos, fp), `pos` the 1-based index into the
    * shingle-hash sequence.
    */
  def winnowFingerprints(docs: DataFrame, k: Int = 3, w: Int = 8): DataFrame = {
    require(k >= 1 && w >= 1, s"need k >= 1 and w >= 1, got k=$k w=$w")
    docs
      .select(col("doc_id"),
        explode(graft.functions.WinnowFps.winnow_fps(col("text"), k, w)).as("pf"))
      .select(col("doc_id"), col("pf.pos").as("pos"), col("pf.fp").as("fp"))
  }

  /** The HOF spelling [[winnowFingerprints]] is property-pinned against
    * (WinnowingSpec): slice per window, `array_min` + rightmost-position
    * fold — the semantics the one-pass expression fuses. O(m·w²) with an
    * allocation per window; kept as the executable specification, not a
    * production path.
    */
  private[graft] def winnowFingerprintsHof(docs: DataFrame, k: Int, w: Int): DataFrame = {
    require(k >= 1 && w >= 1, s"need k >= 1 and w >= 1, got k=$k w=$w")
    val hs = transform(shingles(tokens(col("text")), k), s => rollingHash(s))
    docs
      .select(col("doc_id"), hs.as("hs"))
      .select(col("doc_id"), col("hs"), size(col("hs")).as("m"))
      .filter(col("m") > 0)
      .select(col("doc_id"),
        explode(array_distinct(transform(
          sequence(lit(1), greatest(col("m") - (w - 1), lit(1))),
          i => {
            val win = slice(col("hs"), i, lit(w))
            val mn = array_min(win)
            val rj = array_max(zip_with(win, sequence(lit(1), size(win)),
              (v, j) => when(v === mn, j).otherwise(0)))
            struct((i + rj - 1).cast("int").as("pos"), mn.as("fp"))
          }))).as("pf"))
      .select(col("doc_id"), col("pf.pos").as("pos"), col("pf.fp").as("fp"))
  }

  /** Candidate near-dup pairs by shared winnowing fingerprints — the
    * MOSS match step: documents sharing ≥ `minShared` distinct selected
    * hashes, with the shared count as the match strength. By the local
    * guarantee, any pair sharing a token run of ≥ w+k−1 words surfaces
    * here — the complement of MinHash's global-resemblance lens.
    *
    * Scale shape (the containment-family discipline): fingerprints with
    * document frequency > `maxDf` are boilerplate — every doc would
    * pair with every other through them, an O(df²) bucket — and are
    * DIVERTED from pairing (documented precision trade; lower `w` or
    * raise `k` if a hot template must still pair). The only wide
    * exchanges are keyed on the (uniform, 64-bit) fingerprint hash and
    * the output pair — never all-pairs, never text.
    */
  def winnowDups(docs: DataFrame, k: Int = 3, w: Int = 8,
      minShared: Int = 2, maxDf: Int = 50): DataFrame = {
    val fps = winnowFingerprints(docs, k, w)
      .select(col("doc_id"), col("fp")).distinct()
    val dfc = fps.groupBy(col("fp")).agg(count(lit(1)).as("dfc"))
    val kept = fps.join(dfc.filter(col("dfc") <= maxDf), Seq("fp"))
      .select(col("fp"), col("doc_id"))
    kept.select(col("fp"), col("doc_id").as("doc_a"))
      .join(kept.select(col("fp"), col("doc_id").as("doc_b")), Seq("fp"))
      .filter(col("doc_a") < col("doc_b"))
      .groupBy(col("doc_a"), col("doc_b"))
      .agg(count(lit(1)).as("n_shared"))
      .filter(col("n_shared") >= minShared)
  }
}
