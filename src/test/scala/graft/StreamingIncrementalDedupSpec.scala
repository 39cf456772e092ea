package graft

import graft.streaming.StreamingIncrementalDedup
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.scalatest.funsuite.AnyFunSuite

/** End-to-end continuous-ingest dedup: two micro-batches through a real
  * Structured Streaming query; the second batch's duplicates are detected
  * against the parquet index the first batch left behind.
  */
class StreamingIncrementalDedupSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark

  private def tmpDir(tag: String): String = {
    val d = java.nio.file.Files.createTempDirectory(s"graft-$tag").toFile
    d.deleteOnExit(); d.getAbsolutePath
  }

  test("two micro-batches: batch 2 dups detected against batch 1's index; replay is idempotent") {
    val s = spark
    import s.implicits._
    implicit val sqlCtx = s.sqlContext

    val indexDir = tmpDir("idx") + "/index"
    val resultDir = tmpDir("res") + "/results"
    val base = "alpha beta gamma delta epsilon zeta eta theta " * 8

    val input = MemoryStream[(Long, String)]
    val query = StreamingIncrementalDedup.start(
      input.toDF().toDF("doc_id", "text"),
      indexDir, resultDir, tmpDir("ckpt"), threshold = 0.8)
    try {
      input.addData((1L, base), (2L, base + "iota kappa"), (3L, "totally different content here"))
      query.processAllAvailable()
      input.addData(
        (101L, base),                   // exact dup of doc 1
        (102L, base + "iota kappa mu"), // near dup of docs 1/2
        (103L, "nothing like the corpus at all"))
      query.processAllAvailable()
    } finally query.stop()

    val res = spark.read.parquet(resultDir)
      .select($"doc_id", $"exact_dup_of", $"near_dup_of", $"is_new", $"batch_id")
      .as[(Long, Option[Long], Option[Long], Boolean, Long)].collect()
      .map(r => r._1 -> r).toMap
    assert(res.size == 6, s"one verdict per ingested doc, got ${res.keySet}")
    // batch 1 arrived against an empty index: everything is new
    Seq(1L, 2L, 3L).foreach { id =>
      assert(res(id)._4 && res(id)._2.isEmpty && res(id)._3.isEmpty, s"doc $id")
    }
    // batch 2 is judged against batch 1's index only
    assert(res(101L)._2.contains(1L) && !res(101L)._4, "exact dup via fingerprint")
    assert(res(102L)._2.isEmpty && res(102L)._3.nonEmpty && !res(102L)._4, "near dup via bands")
    assert(res(103L)._2.isEmpty && res(103L)._3.isEmpty && res(103L)._4, "genuinely new")
    // the index now holds all six documents' rows, keyed by batch
    val idx = spark.read.parquet(indexDir)
    assert(idx.count() == 6)
    assert(idx.select($"batch_id").distinct().as[Long].collect().toSet == Set(0L, 1L))

    // replaying a batch (the foreachBatch failure mode) overwrites its own
    // partition rather than appending duplicates
    val replay = spark.createDataFrame(Seq(
      (101L, base), (102L, base + "iota kappa mu"), (103L, "nothing like the corpus at all")))
      .toDF("doc_id", "text")
    StreamingIncrementalDedup.processBatch(replay, 1L, indexDir, resultDir,
      threshold = 0.8, perms = 16, bands = 4)
    assert(spark.read.parquet(resultDir).count() == 6, "idempotent result partition")
    assert(spark.read.parquet(indexDir).count() == 6, "idempotent index partition")
  }

  test("an index dir that exists but holds no data files is treated as absent, not an error") {
    val s = spark
    import s.implicits._
    // the failure mode: a first write died after mkdir (or left only
    // _temporary) — schema inference would throw; the batch must instead
    // run against the empty index and mark everything new
    val indexDir = tmpDir("idx-empty") + "/index"
    assert(new java.io.File(indexDir).mkdirs())
    val resultDir = tmpDir("res-empty") + "/results"
    val batch = Seq((1L, "alpha beta gamma delta epsilon zeta eta theta " * 8))
      .toDF("doc_id", "text")
    StreamingIncrementalDedup.processBatch(batch, 0L, indexDir, resultDir,
      threshold = 0.8, perms = 16, bands = 4)
    val res = spark.read.parquet(resultDir)
      .select($"doc_id", $"is_new").as[(Long, Boolean)].collect()
    assert(res.toSeq == Seq((1L, true)))
    // and the batch's own index rows landed, so the NEXT batch sees them
    assert(spark.read.parquet(indexDir).count() == 1)
  }
}
