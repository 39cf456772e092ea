package graft.streaming

import graft.functions.TextFunctions
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Streaming corpus deduplication — the continuous-ingest face of
  * `operators.TextDedup` (SURVEY.md §2.8 extended set): keep the first
  * document per content fingerprint as the corpus arrives, with state
  * bounded by a watermark.
  *
  * Built on `dropDuplicatesWithinWatermark`, not `dropDuplicates`: with
  * plain streaming dropDuplicates the fingerprint state grows forever —
  * a 100 TB/day ingest would OOM the state store in hours. The
  * watermark-bounded variant guarantees exact dedup for any two
  * duplicates arriving within the watermark delay of each other and lets
  * the store evict older keys; re-ingesting a document after the horizon
  * re-emits it (the batch `TextDedup.dedupKeepFirst` pass downstream is
  * the periodic exact compactor — the standard lambda pairing).
  *
  * State is keyed by the 64-bit rolling-hash fingerprint, not the text,
  * so per-key state is O(1) bytes regardless of document size.
  */
object StreamingDedup {

  /** `docs` must be a streaming DataFrame with an event-time column
    * `eventTime` (TimestampType) and a `text` column. Emits the first
    * arrival per fingerprint; duplicates within `watermarkDelay` of the
    * survivor are dropped exactly.
    */
  def dedupKeepFirst(docs: DataFrame, eventTime: String,
      watermarkDelay: String): DataFrame =
    docs
      .withColumn("fp", TextFunctions.rollingHash(col("text")))
      .withWatermark(eventTime, watermarkDelay)
      .dropDuplicatesWithinWatermark("fp")
}
