package graft.streaming

import graft.operators.Curation
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** The curation pipeline's continuous-ingest face — the streaming twin of
  * [[graft.operators.Curation.curationPipeline]] (which stays the batch
  * compactor of the standard lambda pairing). Every stage is either a
  * stateless projection or a watermark-bounded stateful operator, so the
  * composition runs forever on an unbounded ingest:
  *
  *  1. Unicode NFC normalization + whitespace collapse — stateless
  *     ([[Curation.normalizeText]]'s expression, applied in place);
  *  2. the composite quality gate — stateless
  *     ([[Curation.withQualityVerdict]]: the verdict rides the row as a
  *     struct; the batch spelling's doc_id verdict JOIN would be a
  *     stream-stream join here);
  *  3. near-dup keep-first — `dropDuplicatesWithinWatermark` on the
  *     64-bit content fingerprint ([[StreamingDedup]]; state bounded by
  *     the watermark, exact within it);
  *  4. eval-split decontamination against a STATIC eval corpus — a Bloom
  *     filter of the eval shingle hashes is built ONCE at composition
  *     time (driver-side, from the static frame) and probed statelessly
  *     per row; one-sided like [[Curation.decontaminateBloom]]: a fpp
  *     false positive can only drop a clean document, never leak a
  *     contaminated one.
  *
  * Stages that need a global view — boilerplate LINE dedup (corpus line
  * frequencies) and context packing (global prefix sum) — do not stream;
  * they belong to the periodic batch compaction pass, which is why the
  * batch pipeline keeps them.
  *
  * Output: surviving documents (doc_id, eventTime, text, n_tokens).
  */
object StreamingCuration {

  /** `docs` must be a streaming frame with (doc_id, `eventTime`, text);
    * `evalDocs` a STATIC frame with (doc_id, text).
    */
  def curate(docs: DataFrame, evalDocs: DataFrame, eventTime: String,
      watermarkDelay: String, minTokens: Int = 30, maxTokens: Int = 10000,
      fpp: Double = 0.001): DataFrame = {
    require(!evalDocs.isStreaming, "evalDocs must be a static frame")
    // eval-side Bloom: built eagerly from the static frame, broadcast
    // inside the expression like the batch operator
    val evalHashes = evalDocs
      .select(explode(graft.functions.ShingleHashes.shingle_hashes(col("text"), 3))
        .as("sh"))
      .distinct()
    val expected = math.max(1L, evalHashes.count())
    val bf = evalHashes.stat.bloomFilter("sh", expected, fpp)
    docs
      // 1. normalize in place (same expression as normalizeText)
      .withColumn("text",
        regexp_replace(graft.functions.NfcNormalize.nfc(col("text")),
          "[ \t\n\f\r]+", " "))
      // 2. quality gate, stateless
      .transform(Curation.withQualityVerdict(_, minTokens, maxTokens))
      .filter(col("_q.keep"))
      .withColumn("n_tokens", col("_q.n_tokens"))
      .drop("_q")
      // 3. watermarked near-dup keep-first on the content fingerprint
      .transform(StreamingDedup.dedupKeepFirst(_, eventTime, watermarkDelay))
      .drop("fp")
      // 4. Bloom decontamination vs the static eval corpus
      .filter(coalesce(
        graft.functions.BloomExpressions.bloomContainsCount(
          graft.functions.ShingleHashes.shingle_hashes(col("text"), 3), bf),
        lit(0L)) === 0L)
  }
}
