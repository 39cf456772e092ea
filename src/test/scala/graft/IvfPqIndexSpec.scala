package graft

import graft.operators.Similarity
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class IvfPqIndexSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  val sf = "/root/testdata/sf0.001"

  test("indexed IVF-PQ reproduces the in-memory composition and prunes partitions") {
    val dir = java.nio.file.Files.createTempDirectory("graft-ivfpq").toString
    val emb = Similarity.embeddings(spark, sf)
    Similarity.writeIvfPqIndex(emb, dir)
    try {
      val direct = Similarity.annIvfPqTopK(emb, 0L to 9L, k = 5)
        .select($"query_id", $"neighbor_id", $"rank")
        .as[(Long, Long, Int)].collect().toSet
      val indexed = Similarity.annIvfPqTopKIndexed(emb, dir, 0L to 9L, k = 5)
      val got = indexed.select($"query_id", $"neighbor_id", $"rank")
        .as[(Long, Long, Int)].collect().toSet
      assert(got == direct,
        "index round-trip must reproduce the in-memory composition exactly")

      // the index scan must carry the probed-bucket partition filter: the
      // stored index is read through parquet partition PRUNING, not a
      // full scan + filter
      import org.apache.spark.sql.execution.SparkPlan
      def collectAll(p: SparkPlan): Seq[SparkPlan] =
        (p +: p.children.flatMap(collectAll)) ++ (p match {
          case a: org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec =>
            collectAll(a.executedPlan)
          case q: org.apache.spark.sql.execution.adaptive.QueryStageExec =>
            collectAll(q.plan)
          case _ => Seq.empty
        })
      val scans = collectAll(indexed.queryExecution.executedPlan).collect {
        case s: org.apache.spark.sql.execution.FileSourceScanExec
            if s.relation.location.rootPaths.exists(_.toString.contains("index")) => s
      }
      assert(scans.nonEmpty, "expected a file scan of the stored index")
      scans.foreach { s =>
        assert(s.partitionFilters.exists(_.references.exists(_.name == "bucket")),
          s"index scan should prune on bucket, got filters: ${s.partitionFilters}")
      }

      // stored rows are (vec_id, codes) + the bucket partition column -
      // never a raw vector
      val stored = spark.read.parquet(s"$dir/index")
      assert(stored.columns.toSet == Set("vec_id", "codes", "bucket"),
        s"index must store only id + codes + bucket, got ${stored.columns.mkString(",")}")
    } finally {
      org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(dir))
    }
  }
}
