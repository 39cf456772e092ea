package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Column builders for the text-pipeline operators (SURVEY.md north star:
  * dedup / fingerprinting / quality for LLM training-data curation at
  * 100 TB).
  *
  * Everything here composes BUILT-IN Catalyst expressions (split /
  * transform / aggregate / filter higher-order functions) — fully
  * codegen-friendly, no UDFs, purely narrow per-row work, so the operators
  * scale linearly with executors and never shuffle until an explicit
  * group/join step.
  *
  * All hashing is exact 64-bit integer arithmetic chosen to be
  * reproducible in ANSI SQL (the DuckDB oracle computes the identical
  * values): polynomial rolling hash mod P = 1e9+7, and affine MinHash
  * permutations h_i(x) = ((2i+1)·x + 7919·i + 13) mod P. Intermediate
  * products stay < 2^63 (no overflow on either engine).
  */
object TextFunctions {

  /** Modulus for all polynomial/affine hashes (fits products in a Long). */
  val P = 1000000007L

  /** Whitespace tokenization with empty-token removal, lowercased.
    * Split class is the explicit [ \t\n\f\r] so Java regex, the
    * ShingleHashes fast path, and the oracle's RE2 all agree (\s differs
    * between engines on \x0B and Unicode spaces).
    */
  def tokens(text: Column): Column =
    filter(split(lower(text), "[ \t\n\f\r]+"), t => length(t) > 0)

  /** The published GPT-2 pre-tokenization pattern (Radford et al. 2019,
    * the released encoder.py's `pat`): an ORDERED alternation of
    * contraction suffixes ('s 't 're 've 'm 'll 'd), optional-single-
    * leading-space letter / number / punctuation runs, then whitespace —
    * where `\s+(?!\S)` makes a whitespace run followed by non-space give
    * up its LAST space to the next token (the Ġ-prefix convention; byte
    * 0x20 is in the GPT-2 unit alphabet precisely for this). Unlike
    * [[tokens]] there is NO lowercasing: GPT-2 pre-tokenization is
    * case-preserving. `\p{L}`/`\p{N}` are the same Unicode categories in
    * Java regex as in the Python `regex` module the reference pattern
    * targets; `\s` is Java's ASCII-default class, and the oracle's RE2
    * `\s` agrees on everything but \x0B (excluded from fixtures — the
    * [[tokens]] split-class discipline).
    */
  val Gpt2PretokPattern: String =
    """'s|'t|'re|'ve|'m|'ll|'d| ?\p{L}+| ?\p{N}+| ?[^\s\p{L}\p{N}]+|\s+(?!\S)|\s+"""

  /** GPT-2 pre-tokenization as a codegen'd column: every non-overlapping
    * match of [[Gpt2PretokPattern]] in scan order. The alternation covers
    * every character class, so the matches are CONTIGUOUS — their
    * concatenation reproduces the input exactly (BpeSpec pins it), which
    * is what makes byte-level BPE over this stream lossless.
    */
  def gpt2Pretokens(text: Column): Column =
    regexp_extract_all(text, lit(Gpt2PretokPattern), lit(0))

  /** BERT BasicTokenizer punctuation class (Devlin et al. 2019, the
    * released tokenization.py's `_run_split_on_punc` generalized to one
    * regex): any char that is not a letter, a number, or the explicit
    * whitespace class — spaced out so each becomes its own token.
    * `\p{L}`/`\p{N}` are the same Unicode categories in Java regex and
    * the oracle's RE2; the whitespace chars are explicit (the [[tokens]]
    * split-class discipline — `\s` differs between engines on \x0B).
    */
  val BertPunctClass: String = """([^\p{L}\p{N} \t\n\f\r])"""

  /** BERT BasicTokenizer CJK class: the CJK Unified Ideographs block —
    * each ideograph spaced out as its own token (tokenization.py's
    * `_tokenize_chinese_chars`; kana and Hangul are NOT in the class and
    * stay inside letter runs, exactly like the reference). The main BMP
    * block only: the extension planes are supplementary and outside the
    * WordPiece family's BMP corpus contract.
    */
  val BertCjkClass: String = "([一-鿿])"

  /** BERT BasicTokenizer-style pre-tokenization as codegen'd columns:
    * lowercase, space out punctuation and CJK ideographs, whitespace
    * split. The Scala twin ([[WordPieceOps.basicTokens]]) shares the
    * SAME two pattern constants, so the trainer's word table and the
    * frozen encoder can never disagree about word boundaries.
    */
  def bertTokens(text: Column): Column =
    filter(
      split(regexp_replace(regexp_replace(lower(text),
        BertPunctClass, " $1 "), BertCjkClass, " $1 "), "[ \t\n\f\r]+"),
      t => length(t) > 0)

  /** Polynomial rolling hash of a string: fold(acc·31 + codepoint) mod P.
    * The document-fingerprint primitive. Delegates to the
    * [[RollingHash]] expression — true code points; the HOF spelling
    * (`aggregate(split(s,""), ... ascii(c) ...)`) maps every non-ASCII
    * char to U+FFFD and would collapse CJK text onto one hash.
    */
  def rollingHash(s: Column): Column = RollingHash.rolling_hash(s)

  /** Hash each token. */
  def tokenHashes(toks: Column): Column = transform(toks, h => rollingHash(h))

  /** Word n-gram shingles ("a b c" style), empty below n tokens. */
  def shingles(toks: Column, n: Int): Column = {
    val idx = when(size(toks) < n, array().cast("array<int>"))
      .otherwise(sequence(lit(1), size(toks) - (n - 1)))
    transform(idx, i =>
      concat_ws(" ", (0 until n).map(o => element_at(toks, i + o)): _*))
  }

  /** Distinct shingle hashes — the MinHash input set. */
  def shingleHashes(text: Column, n: Int = 3): Column =
    array_distinct(transform(shingles(tokens(text), n), s => rollingHash(s)))

  /** MinHash signature: for permutation i ∈ [0, perms),
    * min over the set of ((2i+1)·x + 7919·i + 13) mod P.
    * Empty set ⇒ P (sentinel larger than any hash).
    */
  def minhashSignature(hashes: Column, perms: Int): Column =
    transform(sequence(lit(0), lit(perms - 1)), i =>
      coalesce(
        array_min(transform(hashes, x => ((i * 2 + 1) * x + lit(7919L) * i + 13) % P)),
        lit(P)))

  /** LSH band keys: split the signature into bands of `rowsPerBand` and
    * hash each band to one Long. Docs sharing any band key are candidate
    * duplicates — the O(n²) pair space becomes a bucket join.
    */
  def lshBandKeys(sig: Column, bands: Int, rowsPerBand: Int): Column =
    transform(sequence(lit(0), lit(bands - 1)), b =>
      aggregate(
        slice(sig, b * rowsPerBand + 1, lit(rowsPerBand)),
        lit(0L) + b, // include band index so equal values in different bands don't collide
        (acc, x) => (acc * 131 + x) % P))

  /** Token hashes remixed into 62 bits: x' = x · 2654435761 mod 2^62
    * (populates high bits; stays positive in signed-64 engines).
    * Materialize this as its own column before [[simhash62]] so the 62
    * per-bit folds don't each recompute the tokenization.
    */
  def mixedTokenHashes(toks: Column): Column =
    transform(tokenHashes(toks), x => pmod(x * 2654435761L, lit(1L << 62)))

  /** 62-bit SimHash over pre-mixed token hashes ([[mixedTokenHashes]]):
    * bit b is set iff Σ_tokens (bit b of token hash ? +1 : −1) > 0.
    */
  /** Fused one-pass form ([[graft.functions.SimHash62]]); the per-bit HOF
    * fold (62 `aggregate` traversals of the same array) is what it
    * replaces, with identical integer results.
    */
  def simhash62(mixed: Column): Column =
    graft.functions.SimHash62.simhash62(mixed)

  /** Exact word-set Jaccard similarity between two token-set columns.
    * Integer intersection/union sizes; one double division at the end
    * (deterministic across engines).
    */
  def jaccard(a: Column, b: Column): Column = {
    val inter = size(array_intersect(a, b))
    val union = size(a) + size(b) - inter
    when(union === 0, lit(0.0)).otherwise(inter.cast("double") / union.cast("double"))
  }

  // ------------------------------------------------------------ analysis

  /** Marker stopwords per language for the n-gram/markers language-ID
    * heuristic (deterministic, SQL-reproducible).
    */
  val langMarkers: Map[String, Seq[String]] = Map(
    "en" -> Seq("the", "a", "of", "and", "to"),
    "de" -> Seq("der", "die", "das", "und", "ist"),
    "fr" -> Seq("le", "la", "et", "les", "des"),
    "es" -> Seq("el", "la", "los", "y", "de"),
    "zh" -> Seq("的", "是", "了", "在", "和"))

  /** Count of tokens that appear in `markers`. */
  def markerHits(toks: Column, markers: Seq[String]): Column =
    size(filter(toks, t => t.isInCollection(markers)))

  /** English stopword ratio — a quality-score component. */
  val stopwords: Seq[String] = Seq(
    "the", "a", "an", "of", "and", "or", "to", "in", "is", "it", "on", "for")

  def stopwordRatio(toks: Column): Column =
    when(size(toks) === 0, 0.0)
      .otherwise(markerHits(toks, stopwords).cast("double") / size(toks).cast("double"))

  /** Non-alphanumeric-character ratio (punctuation density). */
  def punctRatio(text: Column): Column = {
    val total = length(text)
    val clean = length(regexp_replace(text, "[^a-z0-9 ]", ""))
    when(total === 0, 0.0).otherwise((total - clean).cast("double") / total.cast("double"))
  }

  /** BPE-ish subword count: word-boundary regex pieces + digit runs +
    * punctuation singletons, approximating a tokenizer's piece count
    * without a vocab (public heuristic: ~chars/4 floor for long words).
    */
  def bpeishTokenCount(text: Column): Column = bpeishFromTokens(tokens(text))

  def bpeishFromTokens(toks: Column): Column =
    aggregate(
      toks,
      lit(0L),
      (acc, t) => acc + greatest(lit(1L), floor((length(t) + 3) / lit(4.0)).cast("bigint")))
}
