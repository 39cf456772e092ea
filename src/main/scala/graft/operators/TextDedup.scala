package graft.operators

import graft.functions.TextFunctions._
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Deduplication operators for LLM training-data curation over the
  * `documents` table (doc_id, text, lang, source, n_chars).
  *
  * Scale design (100 TB):
  *  - exact dedup = one hash-shuffle on a 64-bit content hash (never on
  *    the full text), map-side combine does most of the work;
  *  - MinHash-LSH turns the O(n²) near-dup pair space into a bucket join:
  *    signatures are computed in a narrow pass, candidates come from
  *    `explode(bands)` + self-join on the band key (shuffle keyed by band,
  *    bucket sizes bounded by band width), and only candidates pay the
  *    exact-Jaccard verification;
  *  - blocked exact Jaccard (same-lang) is the small-scale oracle twin and
  *    the verification stage of the LSH path;
  *  - SimHash packs a document into one 62-bit word: near-dup = small
  *    Hamming distance, again joined on band keys at scale.
  */
object TextDedup {

  /** Documents, spread across all cores: the table is small on disk (one
    * parquet row group ⇒ one scan partition) but every downstream operator
    * is compute-heavy per row, so an explicit round-robin repartition is
    * the difference between 1-core and n-core execution. At cluster scale
    * the input arrives in many splits and this becomes a no-op-ish
    * rebalance of the same shape.
    */
  def documents(spark: SparkSession, sfDir: String): DataFrame =
    graft.sources.Tables.load(spark, sfDir, "documents")
      .repartition(spark.sparkContext.defaultParallelism)

  /** Exact dedup: group by the full text, keep the smallest doc_id
    * (deterministic keep-first). Output one row per distinct text with its
    * duplicate count. This is the exact small-scale form; at corpus scale
    * pre-bucket on [[TextAnalysis.fingerprint]] (64-bit) and verify the
    * text equality within buckets so the wide shuffle carries hashes, not
    * document bodies.
    */
  def exactDuplicates(docs: DataFrame): DataFrame =
    docs
      .groupBy(col("text"))
      .agg(min(col("doc_id")).as("keep_id"), count(lit(1)).as("n_copies"))
      .select(col("keep_id"), col("n_copies"))

  /** Drop rows whose `keyCol` hash appears in more than `maxDf` documents
    * — the stop-shingle / stop-window skew knob shared by
    * [[exactSubstringDupPairs]] and [[containmentPairs]]. A boilerplate
    * shingle shared by millions of documents ("all rights reserved …")
    * would make its hash bucket quadratic in the self-join (df² candidate
    * rows for that ONE key); capping document frequency bounds every
    * bucket at maxDf² before the join runs. The STOP LIST (hashes above
    * the cap) is tiny by construction — only boilerplate exceeds a sane
    * cap — so the anti-join broadcasts it; the df aggregation itself
    * reuses the already-persisted exploded frame, one extra map-side-
    * combined pass. `maxDf = Long.MaxValue` skips the pass entirely and
    * is the exact-output mode (property-tested ≡ a non-binding finite
    * cap in M5OperatorsSpec).
    */
  private def capDocFrequency(rows: DataFrame, keyCol: String, maxDf: Long): DataFrame = {
    require(maxDf >= 1, s"maxDf must be >= 1, got $maxDf")
    if (maxDf == Long.MaxValue) rows
    else {
      val stop = rows.groupBy(col(keyCol))
        .agg(count(lit(1)).as("df"))
        .filter(col("df") > maxDf)
        .select(col(keyCol))
      rows.join(stop, Seq(keyCol), "left_anti")
    }
  }

  /** Exact-substring duplication (Lee et al. 2022, arXiv:2107.06499 —
    * "Deduplicating Training Data Makes Language Models Better"): find
    * document pairs sharing any exact `k`-token window. The paper builds
    * a corpus-wide suffix array; the cluster-scale spelling is window
    * bucketing — every document emits its distinct k-token windows
    * (n_tokens − k + 1 narrow rows), candidate pairs come from an
    * equi-join keyed on the window's 64-bit rolling hash (never
    * all-pairs), and exact window-string equality inside the bucket
    * makes hash collisions harmless.
    *
    * `maxDf` caps per-window document frequency before the self-join
    * ([[capDocFrequency]]): windows shared by more than `maxDf` documents
    * are treated as boilerplate and excluded, making `n_shared` a lower
    * bound that ignores stop-windows (the exact output needs no cap).
    *
    * `hashOnlyShuffle` is the 100 TB spelling the doc used to only name:
    * the wide self-join shuffle carries (doc_id, hash) alone — never the
    * window STRINGS, which for k=8 outweigh the rest of the row several
    * times over — and candidate pairs are then re-verified by attaching
    * both sides' window strings through two doc-keyed equi-joins and
    * checking string equality. Same output (property-tested ≡ the direct
    * path in M5OperatorsSpec); the string-bearing joins touch only
    * candidate windows, a vanishing fraction of the corpus.
    *
    * Output: (doc_a, doc_b, n_shared) — the number of DISTINCT window
    * contents the pair shares, doc_a < doc_b.
    */
  def exactSubstringDupPairs(docs: DataFrame, k: Int = 8,
      maxDf: Long = Long.MaxValue, hashOnlyShuffle: Boolean = false): DataFrame = {
    require(k >= 2, s"window must span at least 2 tokens, got $k")
    // both sides of the self-join consume the same window extraction —
    // persist it so tokenize+shingle+hash runs once, not once per branch
    val wins = capDocFrequency(SharedBranch.sharedBranch(
      docs.select(col("doc_id"),
          explode(array_distinct(shingles(tokens(col("text")), k))).as("win"))
        .withColumn("h", rollingHash(col("win")))), "h", maxDf)
    if (!hashOnlyShuffle)
      wins.as("a")
        .join(wins.as("b"),
          col("a.h") === col("b.h") && col("a.doc_id") < col("b.doc_id") &&
            col("a.win") === col("b.win"))
        .groupBy(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"))
        .agg(count(lit(1)).as("n_shared"))
    else {
      val slim = wins.select(col("doc_id"), col("h"))
      // distinct bounds the (rare) within-doc hash-collision fan-out
      // before the verify joins multiply it
      val cand = slim.as("a")
        .join(slim.as("b"),
          col("a.h") === col("b.h") && col("a.doc_id") < col("b.doc_id"))
        .select(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"), col("a.h").as("h"))
        .distinct()
      cand
        .join(wins.select(col("doc_id").as("doc_a"), col("h"), col("win").as("win_a")),
          Seq("doc_a", "h"))
        .join(wins.select(col("doc_id").as("doc_b"), col("h"), col("win").as("win_b")),
          Seq("doc_b", "h"))
        .filter(col("win_a") === col("win_b"))
        .groupBy(col("doc_a"), col("doc_b"))
        // countDistinct, not count: a hash carrying two distinct window
        // strings in one doc would otherwise double-count after the
        // candidate fan-out
        .agg(countDistinct(col("win_a")).as("n_shared"))
    }
  }

  /** Exact-substring span REMOVAL — the actionable sibling of
    * [[exactSubstringDupPairs]]: Lee et al. (arXiv:2107.06499) do not
    * drop documents that share long substrings, they CUT the repeated
    * spans out and keep the rest. For every k-token window content that
    * occurs more than once in the corpus (across documents or within
    * one), the globally FIRST occurrence — minimum (doc_id, pos) — keeps
    * its tokens; every token covered by any other occurrence of any
    * duplicated window is removed, and each document reassembles from
    * its surviving tokens. Overlapping duplicated windows merge
    * naturally through position marking, so a long repeated passage
    * (many overlapping windows) is excised as one span.
    *
    * Contract: output text is WHITESPACE-NORMALIZED (surviving tokens
    * joined by single spaces) — the same normalization [[tokens]]
    * applies everywhere else in the dedup family. A token in the first
    * occurrence of one window can still be removed if it is also covered
    * by a non-first occurrence of ANOTHER window; "kept" means covered
    * only by first occurrences (or by no duplicated window at all).
    *
    * Scale shape: windows explode narrow (n_tokens − k + 1 rows/doc);
    * the first-occurrence choice is a `min(struct(doc_id, pos))` hash
    * aggregation keyed on (hash, window) — map-side combinable, so a
    * boilerplate window repeated in 100k documents collapses per
    * partition before the exchange (the [[lineDedup]] discipline; a
    * per-window ranking window would sort exactly the hot keys). The
    * verdict returns by the same (hash, window) equi-join — restricted
    * to multi-occurrence windows, so the (vast) unique majority never
    * joins back; removed positions collapse to one sorted per-doc array,
    * and reassembly is a doc-keyed join + one narrow indexed-lambda
    * filter over the original token array — the text itself never rides
    * a wide shuffle.
    *
    * `hashOnlyShuffle` is the 100 TB spelling ([[lineDedup]]'s
    * discipline, collision handling included): the first-occurrence
    * aggregation and the verdict join key on the 64-bit window hash
    * alone — k-token STRINGS, the heaviest column by far, stay out of
    * the wide exchanges. Hashes carrying more than one distinct window
    * content (detected by a map-side-combinable distinct count in the
    * same aggregation) are diverted to the exact string-keyed path — a
    * set ~empty by construction; the exact path instead keys every
    * exchange on (hash, window), so two contents on one hash form two
    * groups either way. Property-tested identical under forced full- and
    * partial-collision hashes (M5OperatorsSpec).
    *
    * Output: (doc_id, n_tokens, n_removed, clean_text); documents losing
    * every token reassemble to the empty string.
    */
  def substringDedupRemove(docs: DataFrame, k: Int = 8,
      hashOnlyShuffle: Boolean = false): DataFrame =
    substringDedupRemoveKeyed(docs, k, hashOnlyShuffle, xxhash64(_))

  /** [[substringDedupRemove]] with a pluggable window hash — specs
    * inject deliberately colliding hashes to prove the diversion exact;
    * the public operator always uses `xxhash64`.
    */
  private[graft] def substringDedupRemoveKeyed(docs: DataFrame, k: Int,
      hashOnlyShuffle: Boolean, winHash: Column => Column): DataFrame = {
    require(k >= 2, s"window must span at least 2 tokens, got $k")
    val base = docs.select(col("doc_id"), tokens(col("text")).as("w"))
    // the window explosion feeds the first-occurrence aggregation and
    // the verdict join (and, hash-only, the collision residue) — persist
    // it once
    val wins = SharedBranch.sharedBranch(
      base.select(col("doc_id"), posexplode(shingles(col("w"), k)).as(Seq("pos", "win")))
        .withColumn("h", winHash(col("win"))))
    val dupStarts =
      if (!hashOnlyShuffle) {
        val firsts = wins.groupBy(col("h"), col("win"))
          .agg(min(struct(col("doc_id"), col("pos"))).as("f"),
            count(lit(1)).as("cnt"))
        wins.join(firsts.filter(col("cnt") > 1), Seq("h", "win"))
          .filter(struct(col("doc_id"), col("pos")) =!= col("f"))
          .select(col("doc_id"), col("pos"))
      } else {
        // ONE hash-keyed aggregation carries the verdict inputs AND the
        // collision detector (nw = distinct contents under the hash)
        val firstByHash = SharedBranch.sharedBranch(
          wins.groupBy(col("h")).agg(
            min(struct(col("doc_id"), col("pos"))).as("f"),
            count(lit(1)).as("cnt"),
            countDistinct(col("win")).as("nw")))
        // nw = 1: the hash IS the window — verdict joins on the 8-byte key
        val clean = wins.select(col("doc_id"), col("pos"), col("h"))
          .join(firstByHash.filter(col("nw") === 1 && col("cnt") > 1), Seq("h"))
          .filter(struct(col("doc_id"), col("pos")) =!= col("f"))
          .select(col("doc_id"), col("pos"))
        // collision residue (nw > 1, ~empty): exact string-keyed
        // spelling over just those hashes
        val collided = firstByHash.filter(col("nw") > 1).select(col("h"))
        val collWins = wins.join(broadcast(collided), Seq("h"))
        val firstColl = collWins.groupBy(col("win"))
          .agg(min(struct(col("doc_id"), col("pos"))).as("f"),
            count(lit(1)).as("cnt"))
        val coll = collWins.join(firstColl.filter(col("cnt") > 1), Seq("win"))
          .filter(struct(col("doc_id"), col("pos")) =!= col("f"))
          .select(col("doc_id"), col("pos"))
        clean.unionByName(coll)
      }
    removeMarkedWindows(base, dupStarts, k)
  }

  /** Shared tail of the span-removal family: expand the non-first
    * duplicated window starts (0-based token positions) to their k
    * covered positions, merge overlaps through position marking, and
    * reassemble each document from its surviving tokens. `base` is
    * (doc_id, w: array<string>); output is the family contract
    * (doc_id, n_tokens, n_removed, clean_text).
    */
  private def removeMarkedWindows(base: DataFrame, dupStarts: DataFrame,
      k: Int): DataFrame = {
    val rml = dupStarts
      // k covered token positions per non-first occurrence; distinct
      // collapses the overlap fan-out before the per-doc array builds
      .select(col("doc_id"),
        explode(sequence(col("pos"), col("pos") + lit(k - 1))).as("rmpos"))
      .distinct()
      .groupBy(col("doc_id"))
      .agg(sort_array(collect_set(col("rmpos"))).as("rl"))
    base.join(rml, Seq("doc_id"), "left")
      .select(col("doc_id"), size(col("w")).cast("long").as("n_tokens"),
        when(col("rl").isNull, lit(0L)).otherwise(size(col("rl")).cast("long"))
          .as("n_removed"),
        array_join(filter(col("w"),
          (_, i) => col("rl").isNull || !array_contains(col("rl"), i)), " ")
          .as("clean_text"))
  }

  /** Suffix-array spelling of [[substringDedupRemove]]: duplicated
    * k-token windows are read off the corpus-global truncated suffix
    * ORDER ([[SuffixRank.suffixRanks]] at doubling horizon k) instead of
    * a window-content hash join — positions sharing a rank at a
    * full-window position hold character-identical k-token windows by
    * construction, so the wide exchanges carry nothing but integers:
    * not window strings (the exact spelling's cost), not even hashes
    * (the hashOnlyShuffle spelling's 64-bit keys + collision-diversion
    * machinery) — rank equality is collision-FREE. The price is the
    * O(log k) prefix-doubling passes that build the rank table; the
    * table is then reusable (dup-run diagnostics, longer horizons) where
    * the hash join is single-purpose.
    *
    * Same keep-first rule (global min (doc_id, pos) per duplicated
    * window keeps its tokens), same overlap merging through position
    * marking — so a repeated passage LONGER than k (its L − k + 1
    * overlapping duplicated windows) excises as one contiguous span,
    * Lee et al.'s variable-length cut (M5OperatorsSpec pins a 12-token
    * repeat at k = 8 excising whole) — and therefore output-identical
    * to the windowed spellings at the same k on every input: one oracle
    * gates all three (`q_substring_removal{,_hashed,_sa}`).
    *
    * Truncated-tail discipline: positions with fewer than k tokens
    * remaining rank by their shorter tail and are EXCLUDED before the
    * duplication group-by (the [[SuffixRank.duplicateRuns]]
    * `fullWindowsOnly` contract) — without the filter, two documents
    * ending in the same short tail would over-flag their endings.
    */
  def substringDedupRemoveSa(docs: DataFrame, k: Int = 8): DataFrame = {
    require(k >= 2, s"window must span at least 2 tokens, got $k")
    val base = docs.select(col("doc_id"), tokens(col("text")).as("w"))
    val ranks = SuffixRank.suffixRanks(docs, k)
    val lens = ranks.groupBy(col("doc_id")).agg(max(col("pos")).as("n_toks"))
    // the full-window frame feeds the first-occurrence aggregation and
    // the verdict join — persist it once
    val full = SharedBranch.sharedBranch(
      ranks.join(lens, Seq("doc_id"))
        .filter(col("pos") <= col("n_toks") - (k - 1))
        .select(col("doc_id"), col("pos"), col("srank")))
    val firsts = full.groupBy(col("srank"))
      .agg(min(struct(col("doc_id"), col("pos"))).as("f"),
        count(lit(1)).as("cnt"))
    val dupStarts = full.join(firsts.filter(col("cnt") > 1), Seq("srank"))
      .filter(struct(col("doc_id"), col("pos")) =!= col("f"))
      // suffixRanks positions are 1-based; the removal tail indexes the
      // token array 0-based
      .select(col("doc_id"), (col("pos") - 1).as("pos"))
    removeMarkedWindows(base, dupStarts, k)
  }

  /** Containment near-dups (asymmetric Jaccard): containment(A→B) =
    * |shingles(A) ∩ shingles(B)| / |shingles(A)|. Symmetric Jaccard
    * misses SUBSET duplication — a short document quoted wholesale inside
    * a long one scores low Jaccard but containment ≈ 1 — and MinHash-LSH
    * recall degrades for exactly those asymmetric pairs, so the scale
    * shape here is a direct equi-join keyed on the shingle hash (the
    * substring-dedup shape, not the banding shape): shared-shingle counts
    * come from the hash join, |A| from a per-doc count, and the division
    * of those two exact integers is reproducible IEEE.
    *
    * `maxDf` is the stop-shingle skew knob at corpus scale
    * ([[capDocFrequency]]): shingles appearing in more than `maxDf`
    * documents are dropped from the INTERSECTION (numerator) before the
    * self-join, bounding every hash bucket at maxDf² candidate rows. The
    * denominator |A| stays the UNCAPPED per-doc shingle count, so capped
    * containment is a strict lower bound of the exact value — a pair can
    * only fall below the threshold, never spuriously clear it.
    *
    * Output: directed pairs (doc_a, doc_b, n_shared, containment) with
    * containment(doc_a→doc_b) ≥ threshold, doc_a ≠ doc_b — both
    * directions appear when both clear the bar.
    */
  def containmentPairs(docs: DataFrame, threshold: Double,
      maxDf: Long = Long.MaxValue): DataFrame = {
    // both join branches + the size aggregation consume the same
    // shingle explosion — persist it once
    val sh = SharedBranch.sharedBranch(docs.select(col("doc_id"),
      explode(shingleHashes(col("text"), 3)).as("sh")))
    val sizes = sh.groupBy(col("doc_id")).agg(count(lit(1)).as("n_sh"))
    val joinable = capDocFrequency(sh, "sh", maxDf)
    joinable.as("a")
      .join(joinable.as("b"),
        col("a.sh") === col("b.sh") && col("a.doc_id") =!= col("b.doc_id"))
      .groupBy(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"))
      .agg(count(lit(1)).as("n_shared"))
      .join(sizes.select(col("doc_id").as("doc_a"), col("n_sh")), "doc_a")
      .withColumn("containment",
        col("n_shared").cast("double") / col("n_sh").cast("double"))
      .filter(col("containment") >= threshold)
      .select(col("doc_a"), col("doc_b"), col("n_shared"), col("containment"))
  }

  /** Corpus-level exact LINE dedup (the RefinedWeb / C4 family's
    * boilerplate-line removal, arXiv:2306.01116 §3.3): a line occurring in
    * many documents ("all rights reserved…", nav menus, cookie banners)
    * keeps only its FIRST occurrence in (doc_id, position) order;
    * documents are reassembled without the dropped lines. Two knobs:
    *
    *  - lines shorter than `minLineChars` are exempt (kept everywhere):
    *    blank lines and one-word lines repeat by nature, not by scraping;
    *  - lines whose document frequency exceeds `boilerplateDf` are
    *    dropped EVERYWHERE, first occurrence included — at that
    *    frequency the line is template noise, not content.
    *
    * Scale shape: lines explode narrow; the first-occurrence choice is a
    * `min(struct(doc_id, pos))` hash aggregation (map-side combinable —
    * deliberately NOT a per-line ranking window, whose sort would skew on
    * exactly the boilerplate lines this operator exists to remove); the
    * verdict returns by an equi-join; reassembly is one per-doc
    * aggregation.
    *
    * `hashOnlyShuffle` is the 100 TB spelling (the [[exactSubstringDupPairs]]
    * discipline): the line-keyed aggregation and the verdict join are keyed
    * on a 64-bit line hash — the string-keyed exchanges, whose heaviest
    * keys are exactly the boilerplate lines this operator removes, carry
    * 8-byte hashes instead. Hash collisions are handled EXACTLY, not
    * assumed away: hashes carrying more than one distinct line string
    * (detected by a distinct-pair count whose map-side combine reduces
    * every boilerplate repetition to one row per partition) are diverted
    * to the string-keyed path — a set that is empty in practice and tiny
    * by construction, while the clean hashes never shuffle a string. The
    * verdict re-attaches to the line text by (doc_id, pos) — a uniform
    * key no boilerplate skew can concentrate. Property-tested ≡ the
    * direct path under FORCED full- and partial-collision hash functions
    * (M5OperatorsSpec).
    *
    * Output: (doc_id, text_dedup, n_lines, n_kept) — empty documents and
    * documents losing every line reassemble to the empty string.
    */
  def lineDedup(docs: DataFrame, minLineChars: Int = 10,
      boilerplateDf: Long = Long.MaxValue, hashOnlyShuffle: Boolean = false): DataFrame =
    lineDedupKeyed(docs, minLineChars, boilerplateDf, hashOnlyShuffle, xxhash64(_))

  /** WITHIN-document line dedup — the page-local sibling of
    * [[lineDedup]] (the C4/RefinedWeb cleaning families also strip
    * repeated nav/menu lines INSIDE a single page before any
    * corpus-level pass; Raffel et al. 2020 §2.2 dedups at three-
    * sentence granularity within pages): each line keeps only its
    * FIRST occurrence within its own document, with [[lineDedup]]'s
    * short-line exemption (blank/one-word lines repeat by nature).
    *
    * ENTIRELY NARROW — no shuffle of any kind: the first-occurrence
    * test is `array_position(lines, l) = i + 1` inside one HOF filter
    * (per-doc quadratic in line count — a page has tens of lines; the
    * corpus-level [[lineDedup]] is the cross-document path and the
    * 100 TB shape for anything bigger). At cluster scale this is a pure
    * map stage, the cheapest possible spelling.
    *
    * Output: (doc_id, text_dedup, n_lines, n_kept) — the
    * [[lineDedup]] contract.
    */
  def docLineDedup(docs: DataFrame, minLineChars: Int = 10): DataFrame = {
    require(minLineChars >= 0, s"minLineChars must be >= 0, got $minLineChars")
    docs
      .withColumn("_ls", split(col("text"), "\n"))
      .withColumn("_kept", expr(
        s"filter(_ls, (l, i) -> length(l) < $minLineChars OR array_position(_ls, l) = i + 1)"))
      .select(col("doc_id"),
        array_join(col("_kept"), "\n").as("text_dedup"),
        size(col("_ls")).cast("long").as("n_lines"),
        size(col("_kept")).cast("long").as("n_kept"))
  }

  /** PARAGRAPH-granularity [[lineDedup]] — the same keep-first /
    * boilerplate-df semantics over blank-line-separated blocks (split on
    * runs of ≥ 2 newlines), the granularity between line dedup and
    * whole-document dedup: a scraped disclaimer or navigation block
    * repeats as a multi-line unit that line dedup would only chip at
    * line by line (each line individually under its own df) and document
    * dedup would miss entirely. Paragraph separators NORMALIZE to one
    * blank line on reassembly. Same plan as [[lineDedup]], including the
    * `hashOnlyShuffle` collision-diverted spelling — only the split and
    * rejoin differ.
    */
  def paragraphDedup(docs: DataFrame, minParChars: Int = 30,
      boilerplateDf: Long = Long.MaxValue, hashOnlyShuffle: Boolean = false): DataFrame =
    lineDedupKeyed(docs, minParChars, boilerplateDf, hashOnlyShuffle, xxhash64(_),
      splitRegex = "\n{2,}", joinSep = "\n\n")

  /** [[lineDedup]] with a pluggable line hash — specs inject deliberately
    * colliding hash functions to prove the collision diversion exact; the
    * public operator always uses `xxhash64` — and a pluggable
    * split/rejoin pair ([[paragraphDedup]] passes the blank-line
    * grammar).
    */
  private[graft] def lineDedupKeyed(docs: DataFrame, minLineChars: Int,
      boilerplateDf: Long, hashOnlyShuffle: Boolean,
      lineHash: Column => Column, splitRegex: String = "\n",
      joinSep: String = "\n"): DataFrame = {
    require(boilerplateDf >= 1, s"boilerplateDf must be >= 1, got $boilerplateDf")
    val lines0 = docs.select(col("doc_id"),
      posexplode(split(col("text"), splitRegex)).as(Seq("pos", "line")))
    // (doc_id, pos, line, f: first struct(doc_id, pos) of the line, df)
    val flagged =
      if (!hashOnlyShuffle) {
        // both the first-occurrence aggregation and the verdict join
        // consume the same explosion — persist it once
        val lines = SharedBranch.sharedBranch(lines0)
        val first = lines.groupBy(col("line")).agg(
          min(struct(col("doc_id"), col("pos"))).as("f"),
          countDistinct(col("doc_id")).as("df"))
        lines.join(first, "line")
      } else {
        // ONE persist of the hashed explosion serves every consumer
        // (verdict agg, collision residue, and the final string
        // re-attach below — hashed carries line+pos too)
        val hashed = SharedBranch.sharedBranch(
          lines0.withColumn("lh", lineHash(col("line"))))
        // ONE hash-keyed aggregation carries the verdict inputs AND the
        // collision detector: nl = distinct strings under the hash. The
        // countDistinct(line) leg's partial distinct is map-side
        // combinable, so a boilerplate line costs one exchange row per
        // partition — strings still never ride the join exchanges.
        val firstByHash = SharedBranch.sharedBranch(
          hashed.groupBy(col("lh")).agg(
            min(struct(col("doc_id"), col("pos"))).as("f"),
            countDistinct(col("doc_id")).as("df"),
            countDistinct(col("line")).as("nl")))
        // nl = 1: the hash IS the line — verdict joins on the 8-byte key
        val clean = hashed.select(col("doc_id"), col("pos"), col("lh"))
          .join(firstByHash.filter(col("nl") === 1), Seq("lh"))
          .select(col("doc_id"), col("pos"), col("f"), col("df"))
        // collision residue (nl > 1, ~empty by construction): exact
        // string-keyed spelling over just those hashes
        val collided = firstByHash.filter(col("nl") > 1).select(col("lh"))
        val collLines = hashed.join(broadcast(collided), Seq("lh"))
        val firstColl = collLines.groupBy(col("line")).agg(
          min(struct(col("doc_id"), col("pos"))).as("f"),
          countDistinct(col("doc_id")).as("df"))
        val coll = collLines.join(firstColl, "line")
          .select(col("doc_id"), col("pos"), col("f"), col("df"))
        // strings re-enter on the uniform (doc_id, pos) key, never on a
        // boilerplate-skewed line key
        hashed.select(col("doc_id"), col("pos"), col("line"))
          .join(clean.unionByName(coll), Seq("doc_id", "pos"))
      }
    val kept = flagged
      .withColumn("keep",
        (length(col("line")) < minLineChars) ||
          (col("df") <= boilerplateDf &&
            col("f.doc_id") === col("doc_id") && col("f.pos") === col("pos")))
    kept.groupBy(col("doc_id")).agg(
      concat_ws(joinSep,
        transform(
          array_sort(collect_list(when(col("keep"),
            struct(col("pos"), col("line"))))),
          s => s.getField("line"))).as("text_dedup"),
      count(lit(1)).as("n_lines"),
      sum(col("keep").cast("long")).as("n_kept"))
  }

  /** Exact dedup keep-first via window ranking (the "drop duplicates but
    * keep provenance" variant).
    */
  def dedupKeepFirst(docs: DataFrame): DataFrame = {
    val w = Window.partitionBy(col("text")).orderBy(col("doc_id"))
    docs.withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1)
      .drop("rn")
  }

  /** SEQUENCE-level exact dedup — duplicate detection on the CHUNKED
    * token windows ([[Curation.chunkByTokens]]) rather than whole
    * documents: catches duplicated passages that document-level dedup
    * misses entirely (shared boilerplate paragraphs, quoted reuse,
    * partial mirrors — a doc that is 90% a copy of another is untouched
    * by [[exactDuplicates]] but lights up here chunk by chunk). This is
    * the training-sequence-level dedup pass production pipelines run
    * AFTER doc-level dedup; because chunk positions are per-document,
    * duplicated docs produce identical chunks regardless of where they
    * sit in the corpus (unlike corpus-global windows, whose alignment
    * shifts).
    *
    * Output: one row per DISTINCT non-empty chunk — (keep_doc,
    * keep_idx, n_tokens, n_copies), the keeper being the lexicographic
    * min (doc_id, chunk_idx); `n_copies ≥ 2` rows are the duplication
    * report, `n_copies = 1` rows the clean survivors.
    *
    * Plan shape: the chunker is embarrassingly narrow; dedup is ONE
    * exchange keyed on chunk_text feeding both window functions (same
    * partition key → Spark plans a single shuffle). This text-keyed
    * spelling is the small-scale oracle twin ONLY: at corpus scale its
    * exchange carries 64-token bodies as keys and sorts every copy of
    * a hot chunk on one task — run [[chunkDuplicatesHashed]] (the
    * hash-keyed, window-free, collision-diverted spelling, gated
    * against the SAME oracle) instead.
    */
  def chunkDuplicates(docs: DataFrame, window: Int, stride: Int): DataFrame = {
    val chunks = Curation.chunkByTokens(docs, window, stride)
      .filter(col("n_tokens") > 0)
    val w = Window.partitionBy(col("chunk_text"))
      .orderBy(col("doc_id"), col("chunk_idx"))
    chunks
      .withColumn("rn", row_number().over(w))
      .withColumn("n_copies",
        count(lit(1)).over(Window.partitionBy(col("chunk_text"))))
      .filter(col("rn") === 1)
      .select(col("doc_id").as("keep_doc"), col("chunk_idx").as("keep_idx"),
        col("n_tokens"), col("n_copies"))
  }

  /** The 100 TB spelling of [[chunkDuplicates]] — row-identical output,
    * but NO corpus-sized exchange is keyed on chunk text and NO ranking
    * window exists at all. The text-keyed spelling ranks a window over
    * raw 64-token chunk BODIES: every copy of a hot boilerplate chunk
    * (the exact thing sequence-level dedup removes) rides the exchange
    * as a multi-hundred-byte key and lands on one task to be sorted
    * there — the skew funnel the [[lineDedup]] rationale rejects. Here
    * the [[lineDedupKeyed]] discipline applies verbatim: ONE
    * `xxhash64(chunk_text)`-keyed aggregation whose `min(struct)` /
    * `count` / `countDistinct(chunk_text)` legs are all map-side
    * combinable (a boilerplate chunk costs one exchange row per
    * partition, 8-byte key), with hashes carrying more than one
    * distinct chunk string diverted to an exact text-keyed residue —
    * empty in practice, tiny by construction, and property-tested ≡
    * the direct path under FORCED collisions (M5OperatorsSpec).
    * First-occurrence and copy-count semantics are pure aggregation
    * (`min(struct(doc_id, chunk_idx, n_tokens))` IS keep-first), so the
    * ranking window disappears rather than being re-keyed.
    */
  def chunkDuplicatesHashed(docs: DataFrame, window: Int, stride: Int): DataFrame =
    chunkDuplicatesKeyed(docs, window, stride, xxhash64(_))

  /** [[chunkDuplicatesHashed]] with a pluggable chunk hash — specs
    * inject deliberately colliding hash functions to prove the
    * collision diversion exact; the public operator always uses
    * `xxhash64`.
    */
  private[graft] def chunkDuplicatesKeyed(docs: DataFrame, window: Int,
      stride: Int, chunkHash: Column => Column): DataFrame = {
    val chunks = Curation.chunkByTokens(docs, window, stride)
      .filter(col("n_tokens") > 0)
    // ONE persist of the hashed chunk stream serves both the verdict
    // aggregation and the collision residue
    val hashed = SharedBranch.sharedBranch(
      chunks.withColumn("chh", chunkHash(col("chunk_text"))))
    // keep-first + copy count + collision detector in ONE hash-keyed
    // aggregation; every leg map-side combinable
    val byHash = SharedBranch.sharedBranch(
      hashed.groupBy(col("chh")).agg(
        min(struct(col("doc_id"), col("chunk_idx"), col("n_tokens"))).as("f"),
        count(lit(1)).as("n_copies"),
        countDistinct(col("chunk_text")).as("nc")))
    // nc = 1: the hash IS the chunk — the aggregate row already carries
    // keeper and count; no second pass touches the text
    val clean = byHash.filter(col("nc") === 1)
      .select(col("f.doc_id").as("keep_doc"), col("f.chunk_idx").as("keep_idx"),
        col("f.n_tokens").as("n_tokens"), col("n_copies"))
    // collision residue (nc > 1, ~empty by construction): exact
    // text-keyed aggregation over just those hashes
    val collided = byHash.filter(col("nc") > 1).select(col("chh"))
    val coll = hashed.join(broadcast(collided), Seq("chh"))
      .groupBy(col("chunk_text")).agg(
        min(struct(col("doc_id"), col("chunk_idx"), col("n_tokens"))).as("f"),
        count(lit(1)).as("n_copies"))
      .select(col("f.doc_id").as("keep_doc"), col("f.chunk_idx").as("keep_idx"),
        col("f.n_tokens").as("n_tokens"), col("n_copies"))
    clean.unionByName(coll)
  }

  /** Per-doc MinHash signature (word 3-gram shingles, `perms`
    * permutations), exploded to (doc_id, perm, minhash) rows.
    */
  def minhashSignatures(docs: DataFrame, perms: Int = 16): DataFrame =
    withSignature(docs, perms)
      .select(col("doc_id"), posexplode(col("sig")).as(Seq("perm", "minhash")))

  /** Signature column via the single-traversal [[graft.functions.MinHashSig]]
    * expression (the HOF formulation re-tokenizes the doc once per
    * permutation after CollapseProject inlining — ~300× slower at sf0.1).
    */
  private def withSignature(docs: DataFrame, perms: Int): DataFrame =
    docs.withColumn("sig",
      graft.functions.MinHashSig.minhash_sig(
        graft.functions.ShingleHashes.shingle_hashes(col("text"), 3), perms))

  /** MinHash-LSH candidate pairs: docs sharing at least one of `bands`
    * band keys. Returns distinct (doc_a, doc_b) with doc_a < doc_b.
    * This is the scale path: shuffle keyed by (small) band keys, never an
    * all-pairs cross join.
    */
  def lshCandidatePairs(docs: DataFrame, perms: Int = 16, bands: Int = 4): DataFrame = {
    val rows = perms / bands
    // both self-join sides consume the same signature+banding extraction
    // (tokenize + shingle + perms minima per doc) — persist it once
    val banded = SharedBranch.sharedBranch(withSignature(docs, perms)
      .select(col("doc_id"), explode(lshBandKeys(col("sig"), bands, rows)).as("band_key")))
    val a = banded.as("a")
    val b = banded.as("b")
    a.join(b, col("a.band_key") === col("b.band_key") && col("a.doc_id") < col("b.doc_id"))
      .select(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"))
      .distinct()
  }

  /** Incremental-ingest dedup: which documents of a NEW batch are exact
    * or near duplicates of the EXISTING corpus? The continuous-pipeline
    * question (a daily crawl lands against petabytes already ingested) —
    * structurally different from whole-corpus dedup because pairs are only
    * ever (new × old), never within a side.
    *
    * Scale shape: exact matches by fingerprint equi-join (the old side
    * would be a bucketed fingerprint index in production); near-matches by
    * the same MinHash band-bucket join as [[lshCandidatePairs]] but keyed
    * across the two sides, verified by exact shingle Jaccard — candidates
    * only, never new×old all-pairs. Output: one row per new doc —
    * (doc_id, exact_dup_of, near_dup_of, is_new) where the *_of columns
    * carry the smallest matching old doc id (NULL = none); an exact match
    * also surfaces as a near-match (Jaccard 1 ≥ threshold) when a shared
    * band catches it.
    */
  def incrementalDedup(newDocs: DataFrame, oldDocs: DataFrame,
      threshold: Double = 0.9, perms: Int = 16, bands: Int = 4): DataFrame =
    incrementalDedupAgainstIndex(newDocs, dedupIndex(oldDocs, perms),
      threshold, perms, bands)

  /** The stored dedup-index row for a document: content fingerprint,
    * MinHash signature, and shingle-hash set — everything incremental
    * dedup needs from the historical corpus WITHOUT its text. At corpus
    * scale this is what persists between ingests (parquet, appended per
    * batch — see [[graft.streaming.StreamingIncrementalDedup]]): the raw
    * text never re-enters the pipeline, and each consumer of the index
    * reads only its column (fp / sig / tok) off storage, pruned.
    */
  def dedupIndex(docs: DataFrame, perms: Int = 16): DataFrame =
    docs.select(col("doc_id"),
        graft.functions.RollingHash.rolling_hash(col("text")).as("fp"),
        graft.functions.ShingleHashes.shingle_hashes(col("text"), 3).as("tok"))
      .withColumn("sig", graft.functions.MinHashSig.minhash_sig(col("tok"), perms))

  /** [[incrementalDedup]] against a prebuilt [[dedupIndex]] frame — the
    * production spelling, where the old side is a stored index rather
    * than re-derivable documents. `index` must have been built with the
    * same `perms`. The index side is deliberately NOT persisted: it is
    * the whole historical corpus at scale, and its three consumers each
    * read a disjoint column subset ((doc_id, fp) / (doc_id, sig) /
    * (doc_id, tok)) straight off pruned storage scans. The small new-
    * batch side is persisted once and feeds all four of its consumers.
    */
  def incrementalDedupAgainstIndex(newDocs: DataFrame, index: DataFrame,
      threshold: Double = 0.9, perms: Int = 16, bands: Int = 4): DataFrame = {
    val rows = perms / bands
    val newIdx = SharedBranch.sharedBranch(dedupIndex(newDocs, perms))
    val exact = newIdx.select(col("doc_id"), col("fp"))
      .join(index.select(col("fp"), col("doc_id").as("old_id")), Seq("fp"), "left")
      .groupBy(col("doc_id")).agg(min(col("old_id")).as("exact_dup_of"))
    val bandedNew = newIdx
      .select(col("doc_id"), explode(lshBandKeys(col("sig"), bands, rows)).as("band_key"))
    val bandedOld = index
      .select(col("doc_id").as("old_id"), explode(lshBandKeys(col("sig"), bands, rows)).as("band_key"))
    val candidates = bandedNew.join(bandedOld, "band_key")
      .select(col("doc_id"), col("old_id")).distinct()
    val near = candidates
      .join(newIdx.select(col("doc_id"), col("tok").as("tok_n")), "doc_id")
      .join(index.select(col("doc_id").as("old_id"), col("tok").as("tok_o")), "old_id")
      .filter(graft.functions.JaccardSim.jaccard_sim(col("tok_n"), col("tok_o")) >= threshold)
      .groupBy(col("doc_id")).agg(min(col("old_id")).as("near_dup_of"))
    newIdx.select(col("doc_id"))
      .join(exact, Seq("doc_id"), "left")
      .join(near, Seq("doc_id"), "left")
      .select(col("doc_id"), col("exact_dup_of"), col("near_dup_of"),
        (col("exact_dup_of").isNull && col("near_dup_of").isNull).as("is_new"))
  }

  /** Exact word-set Jaccard near-dup pairs within a blocking key
    * (default: same lang). The oracle-verifiable twin of the LSH path and
    * its verification stage.
    */
  def jaccardPairs(docs: DataFrame, threshold: Double): DataFrame = {
    // Pair ENUMERATION carries only ids (the lang-blocked self-join would
    // otherwise materialize two ~300-element arrays per candidate pair —
    // gigabytes of shuffle at sf0.1, and only #langs-way parallelism).
    // The id pairs are then spread round-robin and the shingle sets
    // attached via two equi-joins keyed by doc id. No broadcast hint: the
    // shingle table is O(corpus), so a hardcoded broadcast would OOM the
    // driver at scale — AQE picks broadcast when the side is actually
    // small, a shuffle hash join otherwise (same narrow verify stage).
    val spark = docs.sparkSession
    val t = docs.select(
      col("doc_id"), col("lang"),
      graft.functions.ShingleHashes.shingle_hashes(col("text"), 3).as("tok"))
    val ids = t.select(col("doc_id"), col("lang"))
    val pairs = ids.as("a")
      .join(ids.as("b"), col("a.lang") === col("b.lang") && col("a.doc_id") < col("b.doc_id"))
      .select(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"))
      .repartition(spark.sparkContext.defaultParallelism)
    val toks = t.select(col("doc_id"), col("tok"))
    pairs
      .join(toks.select(col("doc_id").as("doc_a"), col("tok").as("tok_a")), "doc_a")
      .join(toks.select(col("doc_id").as("doc_b"), col("tok").as("tok_b")), "doc_b")
      .select(col("doc_a"), col("doc_b"),
        graft.functions.JaccardSim.jaccard_sim(col("tok_a"), col("tok_b")).as("jac"))
      .filter(col("jac") >= threshold)
  }

  /** MinHash-LSH near-dup pipeline: LSH candidates → exact-Jaccard
    * verification. At scale only the candidate pairs (≪ n²) pay the
    * set-intersection cost.
    */
  def minhashNearDups(docs: DataFrame, threshold: Double,
      perms: Int = 16, bands: Int = 4): DataFrame = {
    // Verification compares the same shingle-HASH sets the signatures are
    // built from (cheap long equality at scale; oracle-identical).
    val toks = docs.select(col("doc_id"), graft.functions.ShingleHashes.shingle_hashes(col("text"), 3).as("tok"))
    lshCandidatePairs(docs, perms, bands)
      .join(toks.withColumnRenamed("doc_id", "doc_a").withColumnRenamed("tok", "tok_a"), "doc_a")
      .join(toks.withColumnRenamed("doc_id", "doc_b").withColumnRenamed("tok", "tok_b"), "doc_b")
      .select(col("doc_a"), col("doc_b"), graft.functions.JaccardSim.jaccard_sim(col("tok_a"), col("tok_b")).as("jac"))
      .filter(col("jac") >= threshold)
  }

  /** Cross-source duplication matrix — the curation diagnostic behind
    * "how much does source A overlap source B": LSH-verified near-dup
    * pairs ([[minhashNearDups]] — banded candidates, never all-pairs)
    * attributed to their sources' unordered pair and counted. Within-
    * source duplication appears on the diagonal (source_x = source_y).
    * The matrix itself is |sources|² rows at most — a broadcast-sized
    * report however large the corpus; the cost is the banded join it
    * shares with the dedup path.
    */
  def crossSourceDupMatrix(docs: DataFrame, threshold: Double,
      perms: Int = 16, bands: Int = 4): DataFrame = {
    val src = docs.select(col("doc_id"), col("source"))
    minhashNearDups(docs, threshold, perms, bands)
      .join(src.select(col("doc_id").as("doc_a"), col("source").as("source_a")), "doc_a")
      .join(src.select(col("doc_id").as("doc_b"), col("source").as("source_b")), "doc_b")
      .select(least(col("source_a"), col("source_b")).as("source_x"),
        greatest(col("source_a"), col("source_b")).as("source_y"))
      .groupBy(col("source_x"), col("source_y"))
      .agg(count(lit(1)).as("n_dup_pairs"))
  }

  /** Per-source novelty — the other half of the overlap picture
    * [[crossSourceDupMatrix]] draws: for each source, how much of its
    * distinct shingle vocabulary appears in NO other source
    * (`n_exclusive`, and as integer parts-per-million of the source's
    * `n_shingles`). A source whose content is mostly reproduced
    * elsewhere scores near zero and is a deduplication/mixture-weight
    * candidate; a high scorer genuinely adds content.
    *
    * Two vocabulary-sized shuffles after the per-doc distinct shingle
    * sets collapse — and, like [[docNovelty]], NO window and NO join on
    * the vocabulary: one hash aggregation on shingle carries the source
    * count AND the owner (`min(source)` — an exclusive shingle has
    * exactly one, so the min IS it; map-side combine collapses hot keys
    * per partition, where the previous `count() over (partition by
    * shingle)` window spelling sorted every copy of a hot shingle in one
    * partition), re-keyed on source for the exclusive counts; per-source
    * totals ride the other branch of the shared explosion. |sources|
    * rows out.
    */
  def sourceNovelty(docs: DataFrame): DataFrame = {
    val ss = SharedBranch.sharedBranch(docs
      .select(col("source"),
        explode(graft.functions.ShingleHashes.shingle_hashes(col("text"), 3)).as("shingle"))
      .distinct())
    val exclusives = ss.groupBy(col("shingle"))
      .agg(count(lit(1)).as("n_sources"), min(col("source")).as("source"))
      .filter(col("n_sources") === 1)
      .groupBy(col("source")).agg(count(lit(1)).as("n_exclusive"))
    ss.groupBy(col("source")).agg(count(lit(1)).as("n_shingles"))
      .join(exclusives, Seq("source"), "left")
      .select(col("source"), col("n_shingles"),
        coalesce(col("n_exclusive"), lit(0L)).as("n_exclusive"),
        expr("(coalesce(n_exclusive, 0) * 1000000) div n_shingles").as("ppm_exclusive"))
  }

  /** Per-DOCUMENT novelty — [[sourceNovelty]] at row granularity, the
    * keep/drop filtering signal rather than the mixture-weight one: for
    * each document, how many of its distinct 3-gram shingles appear in
    * NO other document (corpus document frequency 1), as a count and
    * integer parts-per-million of the document's own shingle set. A
    * near-zero scorer is boilerplate or a near-copy even when no single
    * partner clears a pairwise dedup threshold (content smeared across
    * MANY documents); a high scorer genuinely adds text.
    *
    * Scale shape — deliberately NOT [[sourceNovelty]]'s window spelling:
    * a `count() over (partition by shingle)` window puts every copy of a
    * hot boilerplate shingle into ONE partition's sort — exactly the
    * skew this report exists to flag. Here ONE map-side-combinable hash
    * aggregation on shingle carries both the document frequency AND the
    * owner (`min(doc_id)` — a df = 1 shingle has exactly one, so the
    * min IS the owner; hot keys collapse per partition before the
    * exchange), the per-doc unique counts come from re-keying that
    * filtered aggregate on doc_id, and `n_shingles` never shuffles at
    * all — it's the narrow array size. No join touches the vocabulary.
    *
    * Contract: one row per document with ≥ 1 shingle (i.e. ≥ 3 tokens);
    * shorter documents have no shingle set to score — filter them with
    * the quality gate, not here.
    *
    * Output: (doc_id, n_shingles, n_unique, novelty_ppm).
    */
  def docNovelty(docs: DataFrame): DataFrame = {
    // ShingleHashes output is per-doc distinct already
    val withSets = SharedBranch.sharedBranch(docs.select(col("doc_id"),
      graft.functions.ShingleHashes.shingle_hashes(col("text"), 3).as("hs")))
    val nUnique = withSets.select(col("doc_id"), explode(col("hs")).as("shingle"))
      .groupBy(col("shingle"))
      .agg(count(lit(1)).as("cnt"), min(col("doc_id")).as("doc_id"))
      .filter(col("cnt") === 1)
      .groupBy(col("doc_id")).agg(count(lit(1)).as("n_unique"))
    withSets.select(col("doc_id"), size(col("hs")).cast("long").as("n_shingles"))
      .filter(col("n_shingles") > 0)
      .join(nUnique, Seq("doc_id"), "left")
      .select(col("doc_id"), col("n_shingles"),
        coalesce(col("n_unique"), lit(0L)).as("n_unique"),
        expr("(coalesce(n_unique, 0) * 1000000) div n_shingles").as("novelty_ppm"))
  }

  /** Corpus-level MinHash sketches: one signature per group (here:
    * `source`) via the [[graft.functions.MinHashUnion]] Aggregator —
    * elementwise-min merge ≡ signature of the union of the group's
    * shingle sets. Constant-size state per group; map-side combinable.
    */
  def corpusSketches(docs: DataFrame, perms: Int = 16): DataFrame =
    withSignature(docs, perms)
      .groupBy(col("source"))
      .agg(graft.functions.MinHashUnion.minhash_union(col("sig"), perms).as("csig"))
      .select(col("source"), posexplode(col("csig")).as(Seq("perm", "minhash")))

  /** Connected components over a near-dup pair graph → duplicate
    * clusters, labeled by the smallest member doc_id (the canonical
    * document). Iterative min-label propagation: each round every node
    * adopts the minimum label in its neighborhood; dup clusters are tiny
    * (diameter ≪ 10), so this converges in a few rounds — each round is
    * one self-contained join + aggregate, the standard Pregel-less
    * connected-components shape at scale.
    *
    * Input: (doc_a, doc_b) with doc_a < doc_b. Output: (doc_id, cluster_id)
    * for every doc that appears in at least one pair.
    *
    * The pair graph after LSH + exact verification is typically MINUTE
    * relative to the corpus (it holds only near-duplicates), so below
    * `driverThreshold` edges the components are solved with a driver-side
    * union-find — one collect instead of an iteration of distributed
    * joins. Above it, the distributed min-label loop takes over.
    */
  def dupClusters(pairs: DataFrame, maxIters: Int = 50,
      driverThreshold: Long = 1000000L): DataFrame = {
    val spark = pairs.sparkSession
    val cached = pairs
      .select(col("doc_a").cast("long").as("doc_a"), col("doc_b").cast("long").as("doc_b"))
      .cache()
    val nPairs = cached.count()
    if (nPairs <= driverThreshold) {
      val edges = cached.collect().map(r => (r.getLong(0), r.getLong(1)))
      cached.unpersist()
      // union-find, root = smallest member id
      val parent = scala.collection.mutable.Map.empty[Long, Long]
      def find(x: Long): Long = {
        var r = x
        while (parent.getOrElse(r, r) != r) r = parent(r)
        var c = x
        while (parent.getOrElse(c, c) != c) { val n = parent(c); parent(c) = r; c = n }
        r
      }
      edges.foreach { case (a, b) =>
        val (ra, rb) = (find(a), find(b))
        if (ra != rb) { val (lo, hi) = if (ra < rb) (ra, rb) else (rb, ra); parent(hi) = lo }
      }
      val nodes = edges.flatMap { case (a, b) => Seq(a, b) }.distinct
      import spark.implicits._
      nodes.map(n => (n, find(n))).toSeq.toDF("doc_id", "cluster_id")
    } else distributedClusters(cached, maxIters)
  }

  /** Distributed min-label propagation with POINTER SHORTCUTTING (the
    * > driverThreshold path). Plain min-label needs O(diameter) rounds — a
    * pathological chain of D near-dups costs D distributed joins. Each
    * round here additionally rewrites every label through the label map
    * itself (`l(v) ← l(l(v))`, the path-halving step of MapReduce
    * connected-components à la Kiveris et al. 2014): labels are always
    * node ids of same-component nodes and only ever decrease, so the
    * rewrite is safe, and the distance from any node to its component
    * minimum shrinks geometrically — convergence in O(log diameter)
    * rounds (spec-pinned on a 200-edge path graph in M5OperatorsSpec).
    */
  private[operators] def distributedClusters(pairs: DataFrame, maxIters: Int): DataFrame = {
    val fwd = pairs.select(col("doc_a").as("src"), col("doc_b").as("dst"))
    val edges = fwd.union(fwd.select(col("dst").as("src"), col("src").as("dst"))).cache()
    // localCheckpoint each round: the shortcut self-join puts TWO copies
    // of the round's plan under the next round's plan — without lineage
    // truncation the logical tree doubles per round (2^rounds nodes, OOM
    // in plan handling long before data is a problem). Checkpointing
    // flattens each round to its materialized result; labels are 2 longs
    // per graph node, a minute fraction of the corpus. (On a cluster,
    // rdd-based localCheckpoint trades executor-loss tolerance for not
    // needing a checkpoint dir — acceptable for a ≤ log₂(diameter)-round
    // loop that simply reruns on failure.)
    var labels = edges.select(col("src").as("doc_id")).distinct()
      .withColumn("cluster_id", col("doc_id"))
      .localCheckpoint()
    var converged = false
    var iter = 0
    while (!converged && iter < maxIters) {
      val neighborMin = edges
        .join(labels, edges("dst") === labels("doc_id"))
        .groupBy(col("src")).agg(min(col("cluster_id")).as("nbr_min"))
      // relabeled feeds BOTH sides of the shortcut self-join — persist so
      // the edge join + aggregate run once per round (SharedBranch
      // discipline; cache released at end of round)
      val relabeled = labels
        .join(neighborMin, labels("doc_id") === neighborMin("src"), "left")
        .select(labels("doc_id"),
          least(col("cluster_id"), coalesce(col("nbr_min"), col("cluster_id"))).as("cluster_id"))
        .cache()
      // shortcut (path halving, à la Kiveris et al. 2014): follow the
      // label one hop through the label map itself — labels are always
      // same-component node ids and only ever decrease, so the rewrite is
      // safe and the distance to the component minimum shrinks
      // geometrically. Every label IS a doc_id present in the map;
      // coalesce guards the no-op round where it maps to itself.
      val updated = relabeled.as("l1")
        .join(relabeled.select(col("doc_id").as("lid"), col("cluster_id").as("lcl")).as("l2"),
          col("l1.cluster_id") === col("lid"), "left")
        .select(col("l1.doc_id").as("doc_id"),
          coalesce(col("lcl"), col("l1.cluster_id")).as("cluster_id"))
        .localCheckpoint() // eager: materializes + truncates lineage
      val changed = updated.join(labels.withColumnRenamed("cluster_id", "old"), "doc_id")
        .filter(col("cluster_id") =!= col("old")).count()
      relabeled.unpersist()
      labels = updated // prior rounds' checkpoint blocks free via GC/ContextCleaner
      converged = changed == 0
      iter += 1
    }
    edges.unpersist()
    pairs.unpersist()
    if (!converged)
      throw new IllegalStateException(
        s"dupClusters did not converge in $maxIters rounds - component diameter exceeds the bound; raise maxIters")
    labels
  }

  /** Per-doc 62-bit SimHash. */
  def simhashes(docs: DataFrame): DataFrame =
    docs
      .withColumn("mh", mixedTokenHashes(tokens(col("text"))))
      .select(col("doc_id"), simhash62(col("mh")).as("simhash"))

  /** SimHash near-dup pairs via Hamming-LSH banding — the scale path, with
    * EXACT recall: the 62-bit simhash is split into `maxDist + 1` bands, and
    * by pigeonhole any pair at Hamming distance ≤ maxDist agrees exactly on
    * at least one band, so joining on `(lang, band_idx, band_value)` and
    * verifying `bit_count(xor) ≤ maxDist` reproduces the all-pairs result
    * bit-for-bit. This replaces the round-1 lang-blocked self-join (O(n²)
    * pair space on ≈5 join keys — 31 of 32 cores idle, 104 s at sf0.1).
    *
    * Dedup without a `distinct` shuffle: both simhashes ride along in the
    * join, and a pair is emitted only from its FIRST agreeing band
    * (`array_position(bandEq, true) == band_idx + 1`) — a narrow post-join
    * filter instead of a second wide exchange.
    *
    * Scale note: band width is ~62/(maxDist+1) bits, so the candidate-set
    * reduction (and bucket count) improves sharply as maxDist tightens —
    * at corpus scale run with maxDist ≤ 7 (≥7-bit bands); a threshold as
    * loose as 16/62 bits keeps exact recall here but bounds bucket keys at
    * 2^3..2^4 per band, which is parallelism, not pruning.
    */
  def simhashNearDups(docs: DataFrame, maxDist: Int,
      allowLooseBands: Boolean = false): DataFrame = {
    val bands = maxDist + 1
    require(bands >= 1 && bands <= 62, s"maxDist must be in [0, 61], got $maxDist")
    // Loose-knob footgun guard: bands narrower than 6 bits give ≤ 2⁵ bucket
    // values per band — at corpus scale the banding then buys parallelism
    // but barely prunes the candidate space (the join degenerates toward
    // per-language all-pairs). Recall stays exact either way; the guard
    // forces the cost to be acknowledged at the call site.
    val minWidth = 62 / bands
    require(allowLooseBands || minWidth >= 6,
      s"maxDist=$maxDist gives $minWidth-bit bands (< 6): candidate pruning is weak at scale — " +
        "tighten maxDist or pass allowLooseBands=true to accept the cost")
    // band b covers `width(b)` bits starting at bit offset(b); first
    // (62 % bands) bands take the extra bit
    val base = 62 / bands
    val extra = 62 % bands
    val widths = Seq.tabulate(bands)(b => if (b < extra) base + 1 else base)
    val offsets = widths.scanLeft(0)(_ + _).init
    def bandVal(sh: Column, b: Int): Column =
      shiftright(sh, offsets(b)).bitwiseAND(lit((1L << widths(b)) - 1))

    val s = docs
      .withColumn("mh", mixedTokenHashes(tokens(col("text"))))
      .select(col("doc_id"), col("lang"), simhash62(col("mh")).as("sh"))
    val banded = s.select(col("doc_id"), col("lang"), col("sh"),
      posexplode(array(Seq.tabulate(bands)(b => bandVal(col("sh"), b)): _*))
        .as(Seq("band_idx", "band_val")))
    val a = banded.as("a")
    val b = banded.as("b")
    val bandEq = array(Seq.tabulate(bands)(i =>
      bandVal(col("a.sh"), i) === bandVal(col("b.sh"), i)): _*)
    a.join(b,
        col("a.lang") === col("b.lang") &&
        col("a.band_idx") === col("b.band_idx") &&
        col("a.band_val") === col("b.band_val") &&
        col("a.doc_id") < col("b.doc_id"))
      // emit each pair exactly once: only from its first agreeing band
      .filter(array_position(bandEq, lit(true)) === col("a.band_idx") + 1)
      .select(
        col("a.doc_id").as("doc_a"),
        col("b.doc_id").as("doc_b"),
        bit_count(col("a.sh").bitwiseXOR(col("b.sh"))).as("hamming"))
      .filter(col("hamming") <= maxDist)
  }
}
