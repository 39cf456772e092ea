package graft

import graft.operators.Similarity
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class IvfPqIndexSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  val sf = "/root/testdata/sf0.001"

  private def tempDir(): String =
    java.nio.file.Files.createTempDirectory("graft-ivfpq").toString

  private def rm(dir: String): Unit =
    org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(dir))

  /** The index CONTENT: what a probe reads. `batch` is deliberately
    * excluded — it is write-lineage metadata (which append created the
    * row), not index semantics; append vs rebuild place the same rows in
    * different batches by construction.
    */
  private def content(dir: String): Set[(Long, Long, Seq[Long])] =
    spark.read.parquet(s"$dir/index")
      .select(col("vec_id"), col("bucket").cast("long"), col("codes"))
      .as[(Long, Long, Seq[Long])].collect().toSet

  /** Physical state of the batch-0 partitions: path → (size, mtime). */
  private def batch0Files(dir: String): Map[String, (Long, Long)] = {
    val root = new java.io.File(s"$dir/index")
    def walk(f: java.io.File): Seq[java.io.File] =
      if (f.isDirectory) f.listFiles().toSeq.flatMap(walk) else Seq(f)
    walk(root)
      .filter(f => f.getPath.contains("batch=0") && f.getName.endsWith(".parquet"))
      .map(f => f.getPath -> (f.length(), f.lastModified()))
      .toMap
  }

  test("indexed IVF-PQ reproduces the in-memory composition and prunes partitions") {
    val dir = tempDir()
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

      // stored rows are (vec_id, codes) + the (bucket, batch) partition
      // columns — never a raw vector. batch 0 is the base build.
      val stored = spark.read.parquet(s"$dir/index")
      assert(stored.columns.toSet == Set("vec_id", "codes", "bucket", "batch"),
        s"index must store only id + codes + (bucket, batch) partition cols, " +
          s"got ${stored.columns.mkString(",")}")
      assert(stored.select(col("batch").cast("long")).distinct()
        .as[Long].collect().toSeq == Seq(0L),
        "a base build is all batch 0")
    } finally rm(dir)
  }

  test("append == rebuild with equal codebooks; batch 0 is never rewritten") {
    val emb = Similarity.embeddings(spark, sf)
    val base = emb.filter($"vec_id" <= 249)
    val rest = emb.filter($"vec_id" > 249)
    val rebuilt = tempDir()
    val grown = tempDir()
    try {
      // reference: one-shot build of the FULL corpus with codebooks
      // trained on the base subset only (frozen-codebook semantics)
      Similarity.writeIvfPqIndex(emb, rebuilt, trainOn = Some(base))
      // incremental: base build, then append the complement as batch 1
      Similarity.writeIvfPqIndex(base, grown)
      val before = batch0Files(grown)
      assert(before.nonEmpty, "base build must produce batch-0 data files")
      Similarity.appendIvfPqIndex(rest, grown, batch = 1L)

      // codebooks are byte-identical: append trained nothing
      def codebook(d: String, sub: String): Set[Seq[Any]] =
        spark.read.parquet(s"$d/$sub").collect().toSet[org.apache.spark.sql.Row]
          .map(_.toSeq)
      assert(codebook(grown, "coarse") == codebook(rebuilt, "coarse"))
      assert(codebook(grown, "pq") == codebook(rebuilt, "pq"))

      // index content row-identical (vec_id, bucket, codes)
      assert(content(grown) == content(rebuilt),
        "grown index must be row-identical to the rebuild-at-equal-codebooks reference")

      // the appended rows landed in batch 1; the base rows stayed batch 0
      val byBatch = spark.read.parquet(s"$grown/index")
        .groupBy(col("batch").cast("long").as("batch"))
        .agg(min($"vec_id").as("lo"), max($"vec_id").as("hi"))
        .as[(Long, Long, Long)].collect()
        .map { case (b, lo, hi) => b -> (lo, hi) }.toMap
      assert(byBatch(0L)._2 <= 249L && byBatch(1L)._1 >= 250L)

      // batch-0 partitions physically untouched: same files, sizes, mtimes
      assert(batch0Files(grown) == before,
        "append must not read or rewrite any batch-0 partition file")

      // probes of the grown index match probes of the rebuild exactly
      val pg = Similarity.annIvfPqTopKIndexed(emb, grown, 0L to 9L, k = 5)
        .select($"query_id", $"neighbor_id", $"rank")
        .as[(Long, Long, Int)].collect().toSet
      val pr = Similarity.annIvfPqTopKIndexed(emb, rebuilt, 0L to 9L, k = 5)
        .select($"query_id", $"neighbor_id", $"rank")
        .as[(Long, Long, Int)].collect().toSet
      assert(pg == pr)
    } finally { rm(rebuilt); rm(grown) }
  }

  test("replaying a failed batch is idempotent: dynamic overwrite replaces exactly its own partitions") {
    val emb = Similarity.embeddings(spark, sf)
    val base = emb.filter($"vec_id" <= 249)
    val rest = emb.filter($"vec_id" > 249)
    val rebuilt = tempDir()
    val grown = tempDir()
    try {
      Similarity.writeIvfPqIndex(emb, rebuilt, trainOn = Some(base))
      Similarity.writeIvfPqIndex(base, grown)
      val batch0Before = batch0Files(grown)

      // a TORN first attempt: only part of batch 1 lands (assignment is
      // deterministic, so the torn rows' partitions are a subset of the
      // full batch's — the replay covers every partition the tear wrote)
      Similarity.appendIvfPqIndex(rest.filter($"vec_id" % 3 === 0), grown, batch = 1L)
      assert(content(grown) != content(rebuilt), "torn append must be visibly incomplete")

      // replay with the full batch: exactly batch 1's partitions replaced
      Similarity.appendIvfPqIndex(rest, grown, batch = 1L)
      assert(content(grown) == content(rebuilt),
        "replaying the failed batch must converge to the rebuild reference")

      // replay once more (the retry-after-success case): content stable,
      // batch 0 still physically untouched through all three writes
      Similarity.appendIvfPqIndex(rest, grown, batch = 1L)
      assert(content(grown) == content(rebuilt))
      assert(batch0Files(grown) == batch0Before,
        "no append or replay may touch a batch-0 partition file")
    } finally { rm(rebuilt); rm(grown) }
  }

  test("appends start at batch 1; batch 0 is reserved for the base build") {
    val emb = Similarity.embeddings(spark, sf)
    intercept[IllegalArgumentException] {
      Similarity.appendIvfPqIndex(emb, "/nonexistent", batch = 0L)
    }
  }

  test("ivfPqDrift reports per-batch inertia and surfaces uncovered vectors") {
    val emb = Similarity.embeddings(spark, sf)
    val base = emb.filter($"vec_id" <= 249)
    val rest = emb.filter($"vec_id" > 249)
    val dir = tempDir()
    try {
      Similarity.writeIvfPqIndex(base, dir)
      Similarity.appendIvfPqIndex(rest, dir, batch = 1L)

      // full corpus: every indexed vector measurable, nothing missing
      val full = Similarity.ivfPqDrift(emb, dir)
        .select($"batch", $"n_vecs", $"missing_vecs", $"mean_inertia")
        .as[(Long, Long, Long, Option[Long])].collect()
        .map { case (b, n, miss, mi) => b -> (n, miss, mi) }.toMap
      assert(full(0L)._1 == 250L && full(0L)._2 == 0L && full(0L)._3.nonEmpty)
      assert(full(1L)._1 == 250L && full(1L)._2 == 0L && full(1L)._3.nonEmpty)
      // batch 1 was assigned with codebooks it never trained: its inertia
      // is at least batch 0's (the drift signal the report exists for)
      assert(full(1L)._3.get >= full(0L)._3.get)

      // partial corpus (base only): batch 1 rows are COUNTED missing, not
      // silently dropped — and batch 0 numbers are unchanged
      val part = Similarity.ivfPqDrift(base, dir)
        .select($"batch", $"n_vecs", $"missing_vecs", $"mean_inertia")
        .as[(Long, Long, Long, Option[Long])].collect()
        .map { case (b, n, miss, mi) => b -> (n, miss, mi) }.toMap
      assert(part(0L) == full(0L))
      assert(part(1L)._1 == 250L && part(1L)._2 == 250L && part(1L)._3.isEmpty,
        s"uncovered batch must report missing_vecs = n_vecs and null inertia, got ${part(1L)}")
    } finally rm(dir)
  }

  test("retrain == fresh build on the grown corpus; drift resets to batch 0") {
    val emb = Similarity.embeddings(spark, sf)
    val base = emb.filter($"vec_id" <= 249)
    val rest = emb.filter($"vec_id" > 249)
    val grown = tempDir()
    val fresh = tempDir()
    try {
      // the production loop: base build → append → drift check → retrain
      Similarity.writeIvfPqIndex(base, grown)
      Similarity.appendIvfPqIndex(rest, grown, batch = 1L)
      Similarity.retrainIvfPqIndex(emb, grown)
      // the reference the retrain must be indistinguishable from
      Similarity.writeIvfPqIndex(emb, fresh)

      // codebooks retrained on the FULL corpus, byte-identical to fresh
      def codebook(d: String, sub: String): Set[Seq[Any]] =
        spark.read.parquet(s"$d/$sub").collect().toSet[org.apache.spark.sql.Row]
          .map(_.toSeq)
      assert(codebook(grown, "coarse") == codebook(fresh, "coarse"))
      assert(codebook(grown, "pq") == codebook(fresh, "pq"))
      assert(content(grown) == content(fresh),
        "retrained index must be row-identical to a fresh build of the corpus")

      // consolidation: every row back in batch 0, so the drift report
      // resets to base-build levels and the next append is batch 1 again
      val drift = Similarity.ivfPqDrift(emb, grown)
        .select($"batch", $"n_vecs", $"missing_vecs", $"mean_inertia")
        .as[(Long, Long, Long, Option[Long])].collect()
      assert(drift.map(_._1).toSeq == Seq(0L),
        s"retrain must consolidate to a single batch 0, got ${drift.map(_._1).toSeq}")
      val freshDrift = Similarity.ivfPqDrift(emb, fresh)
        .select($"batch", $"n_vecs", $"missing_vecs", $"mean_inertia")
        .as[(Long, Long, Long, Option[Long])].collect()
      assert(drift.toSeq == freshDrift.toSeq,
        "post-retrain drift report must equal the fresh build's")

      // probes answered from the retrained index match the fresh index
      val pg = Similarity.annIvfPqTopKIndexed(emb, grown, 0L to 9L, k = 5)
        .select($"query_id", $"neighbor_id", $"rank")
        .as[(Long, Long, Int)].collect().toSet
      val pf = Similarity.annIvfPqTopKIndexed(emb, fresh, 0L to 9L, k = 5)
        .select($"query_id", $"neighbor_id", $"rank")
        .as[(Long, Long, Int)].collect().toSet
      assert(pg == pf)

      // the swap cleaned up after itself: no staging or backup residue
      val residue = new java.io.File(grown).listFiles().map(_.getName)
        .filter(n => n.startsWith(".retrain") || n.startsWith(".old"))
      assert(residue.isEmpty, s"leftover swap dirs: ${residue.mkString(",")}")
    } finally { rm(grown); rm(fresh) }
  }

  test("maintain retrains iff the measured drift ratio crosses the threshold") {
    val emb = Similarity.embeddings(spark, sf)
    val base = emb.filter($"vec_id" <= 249)
    val rest = emb.filter($"vec_id" > 249)
    // a DRIFTED append: the second half's vectors pushed far from every
    // trained centroid (constant offset per dimension), so its frozen-
    // codebook inertia is much worse than batch 0's
    val drifted = rest.withColumn("embedding",
      transform($"embedding", x => x + lit(3.0f)))
    val dir = tempDir()
    try {
      Similarity.writeIvfPqIndex(base, dir)
      Similarity.appendIvfPqIndex(drifted, dir, batch = 1L)
      val corpus = base.unionByName(drifted)

      // below threshold: decision is data, index untouched
      val rep1 = Similarity.maintainIvfPqIndex(corpus, dir, driftRatio = 1e9)
        .select($"drift_ratio", $"retrained")
        .as[(Option[Double], Boolean)].head()
      assert(!rep1._2 && rep1._1.exists(_ > 1.0),
        s"expected measured-but-not-acted drift, got $rep1")
      assert(spark.read.parquet(s"$dir/index")
        .select(col("batch").cast("long")).distinct().as[Long].collect().toSet == Set(0L, 1L),
        "a below-threshold maintain must not touch the index")

      // over threshold: retrain runs, consolidates, and the NEXT
      // maintain sees a drift-free single-batch index
      val rep2 = Similarity.maintainIvfPqIndex(corpus, dir, driftRatio = 2.0)
        .select($"retrained").as[Boolean].head()
      assert(rep2, "the measured ratio should have triggered a retrain")
      val rep3 = Similarity.maintainIvfPqIndex(corpus, dir, driftRatio = 2.0)
        .select($"worst_appended_inertia", $"drift_ratio", $"retrained")
        .as[(Option[Long], Option[Double], Boolean)].head()
      assert(rep3 == ((None, None, false)),
        s"post-retrain index has no appended batches to drift, got $rep3")
    } finally rm(dir)
  }
}
