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

  /** Document fingerprint: rolling hash of the normalized text
    * (lowercased, whitespace-collapsed) — the cheap exact-dedup key.
    */
  def fingerprint(text: Column): Column =
    rollingHash(concat_ws(" ", tokens(text)))
}
