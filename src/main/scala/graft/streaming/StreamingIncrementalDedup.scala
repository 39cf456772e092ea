package graft.streaming

import graft.operators.TextDedup
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.StreamingQuery

/** Continuous-ingest dedup: each micro-batch of arriving documents is
  * checked against the fingerprint/MinHash index of EVERYTHING ingested
  * before it, then appended to that index — the daily-crawl shape
  * [[graft.operators.TextDedup.incrementalDedup]]'s doc describes, wired
  * end-to-end. (The reference's streaming shell is stateless routing,
  * TopologyProducer.kt:84–202; this is the stateful-corpus sibling the
  * extended operator set needs.)
  *
  * Why foreachBatch and not mapGroupsWithState: the dedup join is keyed
  * by band keys and fingerprints against a corpus-lifetime index — state
  * that belongs in a storage-backed, column-pruned table (parquet here;
  * an Iceberg/Delta table in production), not in the state store, which
  * is sized for in-flight keys. Each batch runs the normal BATCH operator
  * against the index-so-far: new×old only, band-bucketed candidates,
  * exact verification — the 100 TB plan shape, per batch.
  *
  * Exactly-once without a transactional sink: both outputs are
  * partitioned by `batch_id` and written with DYNAMIC partition
  * overwrite, so a replayed batch (foreachBatch redelivers after
  * failure) overwrites its own partition instead of appending
  * duplicates. The index a batch dedups against is read BEFORE its own
  * rows are appended, so a document never matches itself.
  *
  * Within-batch duplicates are intentionally out of scope here (pairs
  * cross the batch boundary only, like the batch operator): a batch that
  * needs internal dedup runs [[TextDedup.dedupKeepFirst]] first.
  */
object StreamingIncrementalDedup {

  /** One micro-batch step, also usable directly in tests/backfills:
    * dedup `batch` (doc_id, text) against the index at `indexDir`, write
    * verdicts to `resultDir/batch_id=N`, append the batch's index rows
    * to `indexDir/batch_id=N`.
    */
  def processBatch(batch: DataFrame, batchId: Long, indexDir: String,
      resultDir: String, threshold: Double, perms: Int, bands: Int): Unit = {
    val spark = batch.sparkSession
    // exclude this batch's OWN partition from the index read: on replay
    // (foreachBatch redelivery) the index already holds the batch's rows,
    // and without the filter every replayed document would match itself.
    // Partition pruning turns the filter into skipped directories.
    // Existence goes through Hadoop's FileSystem, not java.io.File: the
    // production indexDir is an HDFS/S3 URI, where a local-file check is
    // always false and every batch would silently dedup against an empty
    // index (all documents marked new, no error raised). A directory that
    // EXISTS but holds no data files (a first write that failed after
    // mkdir, or only _temporary debris) is equally "no index yet":
    // spark.read.parquet would fail schema inference on it, so that
    // AnalysisException falls back to the empty index too — any OTHER
    // read failure (corrupt footers, permissions) still surfaces loudly.
    val indexPath = new org.apache.hadoop.fs.Path(indexDir)
    val indexExists =
      indexPath.getFileSystem(spark.sparkContext.hadoopConfiguration).exists(indexPath)
    val emptyIndex = TextDedup.dedupIndex(batch, perms).limit(0) // right schema
    val index =
      if (!indexExists) emptyIndex
      else
        try
          spark.read.parquet(indexDir)
            .filter(col("batch_id") =!= lit(batchId)).drop("batch_id")
        catch {
          case e: org.apache.spark.sql.AnalysisException
              if e.getCondition == "UNABLE_TO_INFER_SCHEMA" => emptyIndex
        }
    val verdicts = TextDedup.incrementalDedupAgainstIndex(
      batch, index, threshold, perms, bands)
    verdicts
      .withColumn("batch_id", lit(batchId))
      .write.partitionBy("batch_id")
      .option("partitionOverwriteMode", "dynamic")
      .mode("overwrite").parquet(resultDir)
    TextDedup.dedupIndex(batch, perms)
      .withColumn("batch_id", lit(batchId))
      .write.partitionBy("batch_id")
      .option("partitionOverwriteMode", "dynamic")
      .mode("overwrite").parquet(indexDir)
    // release the batch-side pin incrementalDedupAgainstIndex registered
    graft.sources.Tables.evictPinned(spark)
  }

  /** Start the continuous query over a streaming (doc_id, text) frame.
    * `trigger`: None = the default processing-time trigger (run
    * forever); pass `Trigger.AvailableNow()` for bounded replays (the
    * oracle gate / backfills) so the query drains and terminates.
    */
  def start(newDocs: DataFrame, indexDir: String, resultDir: String,
      checkpointDir: String, threshold: Double = 0.9, perms: Int = 16,
      bands: Int = 4,
      trigger: Option[org.apache.spark.sql.streaming.Trigger] = None): StreamingQuery = {
    val w = newDocs.writeStream
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (batch: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row], batchId: Long) =>
        processBatch(batch.toDF(), batchId, indexDir, resultDir,
          threshold, perms, bands)
      }
    trigger.fold(w)(w.trigger).start()
  }
}
