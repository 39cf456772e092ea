package graft

import graft.operators.Similarity
import graft.streaming.StreamingIndexIngest
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class StreamingIndexIngestSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  val sf = "/root/testdata/sf0.001"

  private def tempDir(): String =
    java.nio.file.Files.createTempDirectory("graft-ssi").toString

  private def rm(dir: String): Unit =
    org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(dir))

  /** Index content minus write lineage (IvfPqIndexSpec's definition). */
  private def content(dir: String): Set[(Long, Long, Seq[Long])] =
    spark.read.parquet(s"$dir/index")
      .select(col("vec_id"), col("bucket").cast("long"), col("codes"))
      .as[(Long, Long, Seq[Long])].collect().toSet

  test("streamed appends == one-shot append == rebuild at equal codebooks") {
    val emb = Similarity.embeddings(spark, sf)
    val base = emb.filter($"vec_id" <= 249)
    val rest = emb.filter($"vec_id" > 249)
      .select($"vec_id", $"embedding").as[(Long, Array[Float])].collect()
    val grown = tempDir(); val rebuilt = tempDir(); val ckpt = tempDir()
    try {
      Similarity.writeIvfPqIndex(emb, rebuilt, trainOn = Some(base))
      Similarity.writeIvfPqIndex(base, grown)
      implicit val sqlCtx = spark.sqlContext
      val input = MemoryStream[(Long, Array[Float])]
      val q = StreamingIndexIngest.start(
        input.toDF().toDF("vec_id", "embedding"), grown, ckpt)
      // two micro-batches split the complement at an arbitrary point
      input.addData(rest.take(100): _*)
      q.processAllAvailable()
      input.addData(rest.drop(100): _*)
      q.processAllAvailable()
      q.stop()
      assert(content(grown) == content(rebuilt),
        "streamed growth must be row-identical to the rebuild-at-equal-codebooks reference")
      // each trigger is its own batch partition, offset past batch 0
      val batches = spark.read.parquet(s"$grown/index")
        .select(col("batch").cast("long")).distinct().as[Long].collect().toSet
      assert(batches == Set(0L, 1L, 2L),
        s"expected base + two streamed batches, got $batches")
      // probes agree with the rebuild reference
      val pg = Similarity.annIvfPqTopKIndexed(emb, grown, 0L to 9L, k = 5)
        .select($"query_id", $"neighbor_id", $"rank")
        .as[(Long, Long, Int)].collect().toSet
      val pr = Similarity.annIvfPqTopKIndexed(emb, rebuilt, 0L to 9L, k = 5)
        .select($"query_id", $"neighbor_id", $"rank")
        .as[(Long, Long, Int)].collect().toSet
      assert(pg == pr)
    } finally { rm(grown); rm(rebuilt); rm(ckpt) }
  }

  test("foreachBatch redelivery is idempotent at the wrapper's batch-id mapping") {
    // foreachBatch's failure mode is redelivering micro-batch N after a
    // partial write. The wrapper maps streaming batch N to partition
    // `firstBatch + N`; redelivery therefore re-runs appendIvfPqIndex
    // with the SAME batch value, whose dynamic partition overwrite must
    // replace that batch's partitions rather than duplicate rows.
    val emb = Similarity.embeddings(spark, sf)
    val base = emb.filter($"vec_id" <= 249)
    val rest = emb.filter($"vec_id" > 249)
      .select($"vec_id", $"embedding").as[(Long, Array[Float])].collect()
    val grown = tempDir(); val ckpt = tempDir()
    try {
      Similarity.writeIvfPqIndex(base, grown)
      implicit val sqlCtx = spark.sqlContext
      val input = MemoryStream[(Long, Array[Float])]
      val q = StreamingIndexIngest.start(
        input.toDF().toDF("vec_id", "embedding"), grown, ckpt)
      input.addData(rest.take(100): _*)
      q.processAllAvailable()
      q.stop()
      val afterFirst = content(grown)
      val countFirst = spark.read.parquet(s"$grown/index").count()
      // simulate the redelivery: the same rows, the same mapped batch id
      // (streaming batch 0 → partition 1), as foreachBatch would re-run it
      val replay = rest.take(100).toSeq.toDF("vec_id", "embedding")
      Similarity.appendIvfPqIndex(replay, grown, batch = 1L)
      assert(content(grown) == afterFirst &&
        spark.read.parquet(s"$grown/index").count() == countFirst,
        "replaying a delivered micro-batch must replace its partition, not append")
    } finally { rm(grown); rm(ckpt) }
  }
}
