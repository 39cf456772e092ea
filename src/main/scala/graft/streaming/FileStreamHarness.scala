package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions.col
import org.apache.spark.sql.streaming.Trigger

/** Deterministic FILE-SOURCE oracle harness for the STATELESS streaming
  * twins — the round-13/14 verdict ask ("a deterministic file-source →
  * foreachBatch → parquet harness could oracle-gate the stateless twins
  * without a broker"): drive the SAME parquet fixture the batch gate
  * reads through a real `readStream` file source in bounded
  * micro-batches, collect every `foreachBatch` output by appending to a
  * scratch parquet dir, and hand the read-back union to the SAME DuckDB
  * oracle string as the batch twin.
  *
  * Determinism is by CONSTRUCTION, not by luck: a stateless transform
  * (project / generate / filter — no watermark, no state store, no
  * stream aggregation; the reference topology's own shape,
  * TopologyProducer.kt:84–202) emits per ROW, so its output row SET is
  * invariant under ANY micro-batch partitioning of the input, and the
  * driver's sort-then-hash compare sees exactly the batch plan's rows.
  * The fixture is ONE parquet file, which a file source would consume
  * as a single batch — a vacuous streaming exercise — so the harness
  * first re-writes it as `numFiles` hash-partitioned files and streams
  * those with `maxFilesPerTrigger = 1`, forcing a genuine multi-batch
  * incremental run (the spec pins the batch count). Stateful twins
  * (watermarked dedup/sessionize/windows) stay spec-gated by the
  * documented policy: their row sets depend on watermark timing, which
  * no offline oracle reproduces.
  */
object FileStreamHarness {

  // the split input is pure function of (sfDir, table, keyCol,
  // numFiles) — write it once per JVM, not once per gate per bench
  // pass (5 streaming gates × warmup + 3 passes would re-write the
  // identical files 20 times)
  private val splitCache =
    scala.collection.concurrent.TrieMap.empty[(String, String, String, Int), String]

  /** Run `transform` (stateless, per-row) over the `table` fixture of
    * `sfDir` as a multi-micro-batch file-source stream; returns the
    * read-back union of every micro-batch's output. `keyCol` drives the
    * deterministic hash split of the input into `numFiles` files;
    * `onBatch` is a driver-side per-batch hook (spec instrumentation —
    * batch-count pinning), called with each micro-batch's id.
    */
  def runStateless(spark: SparkSession, sfDir: String, table: String,
      transform: DataFrame => DataFrame, keyCol: String = "event_id",
      numFiles: Int = 4, onBatch: Long => Unit = _ => ()): DataFrame = {
    require(numFiles >= 1, s"numFiles must be >= 1, got $numFiles")
    val scratch = java.nio.file.Files.createTempDirectory("graft_stream_gate_")
      .toString
    val outDir = s"$scratch/out"
    // deterministic hash split: same fixture → same file contents;
    // irrelevant to the result either way (stateless ⇒ union-invariant)
    val batch = graft.sources.Tables.load(spark, sfDir, table)
    val inDir = splitCache.getOrElseUpdate((sfDir, table, keyCol, numFiles), {
      val d = s"$scratch/in"
      batch.repartition(numFiles, col(keyCol)).write.parquet(d)
      d
    })
    val stream = spark.readStream
      .schema(batch.schema)
      .option("maxFilesPerTrigger", 1)
      .parquet(inDir)
    val q = transform(stream).writeStream
      .foreachBatch { (b: DataFrame, id: Long) =>
        onBatch(id)
        // append per batch: the scratch dir accumulates the union
        b.write.mode("append").parquet(outDir)
      }
      .option("checkpointLocation", s"$scratch/_chk")
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    spark.read.parquet(outDir)
  }
}
