package graft

import graft.operators.{Bpe, Importance, Relevance, Similarity, SuffixRank, TextAnalysis}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Degenerate-input behavior of the round-11 operator families: empty
  * frames, all-whitespace corpora, and all-or-nothing target predicates
  * must produce empty/neutral output, never an exception — the driver
  * regenerates testdata between rounds, and an edge regime showing up
  * at sf0.001 must not take a query family dark (the round-9 lesson,
  * applied to new code at birth).
  */
class Round11DegenerateSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  def empty = Seq.empty[(Long, String)].toDF("doc_id", "text")
  def blank = Seq((1L, ""), (2L, "   "), (3L, "\t\n")).toDF("doc_id", "text")

  test("winnowing: empty and tokenless corpora yield no fingerprints and no pairs") {
    assert(TextAnalysis.winnowFingerprints(empty).count() == 0)
    assert(TextAnalysis.winnowFingerprints(blank).count() == 0)
    assert(TextAnalysis.winnowDups(blank).count() == 0)
  }

  test("suffix ranking: empty and tokenless corpora yield no suffixes; single doc ranks cleanly") {
    assert(SuffixRank.suffixRanks(empty).count() == 0)
    assert(SuffixRank.suffixRanks(blank).count() == 0)
    val one = Seq((7L, "x y x y")).toDF("doc_id", "text")
    val r = SuffixRank.suffixRanks(one, prefixTokens = 2)
      .as[(Long, Int, Long)].collect()
    assert(r.length == 4 && r.map(_._3).max <= 4)
    assert(SuffixRank.duplicateRuns(one, prefixTokens = 2)
      .as[(Long, Long, Long, Int)].collect()
      .exists(d => d._2 == 2L)) // "x y" at pos 1 and 3 share a rank
  }

  test("importance: all-target and no-target predicates degrade to neutral, not errors") {
    val docs = Seq((1L, "a b", true), (2L, "c d", true)).toDF("doc_id", "text", "is_tgt")
    // all-target: ct == cr everywhere → every ratio = scale·(totR+B)/(totT+B) = scale exactly
    val all = Importance.importanceQuantized(docs, col("is_tgt"), numBuckets = 64)
      .as[(Long, Long, Long, Boolean)].collect()
    assert(all.forall(r => r._3 == 10000L * r._2 && !r._4)) // mean == 1, keep strict
    // no-target: tott = 0, ct = 0 → uniform smoothed numerator, no division by zero
    val none = Importance.importanceQuantized(docs, lit(false), numBuckets = 64)
      .as[(Long, Long, Long, Boolean)].collect()
    assert(none.forall(_._3 > 0L))
    // empty corpus: empty output, and fitCounts returns empty tables
    assert(Importance.importanceQuantized(empty.withColumn("is_tgt", lit(true)),
      col("is_tgt")).count() == 0)
    val (ct, cr, tott, totr) = Importance.fitCounts(
      empty.withColumn("is_tgt", lit(true)), col("is_tgt"))
    assert(ct.isEmpty && cr.isEmpty && tott == 0L && totr == 0L)
  }

  test("JL projection: empty frame and single-signal Borda compose without error") {
    assert(Similarity.jlProject(
      Seq.empty[(Long, Seq[Float])].toDF("vec_id", "embedding"), 8).count() == 0)
    val docs = Seq((1L, "a"), (2L, "b")).toDF("doc_id", "text")
    val sig = Seq((1L, 5L), (2L, 9L)).toDF("doc_id", "s")
    val b = Relevance.bordaEnsemble(docs, Seq("only" -> sig))
      .orderBy($"doc_id").as[(Long, Long, Long)].collect().toSeq
    assert(b == Seq((1L, 2L, 2L), (2L, 1L, 1L)))
  }

  test("BPE segmentation: empty corpus and empty merge table are identities") {
    assert(Bpe.segmentStats(empty, Seq(("a", "b"))).count() == 0)
    val docs = Seq((1L, "ab ab"), (2L, "")).toDF("doc_id", "text")
    val got = Bpe.segmentStats(docs, Seq.empty)
      .orderBy($"doc_id").as[(Long, Long, Long)].collect().toSeq
    assert(got == Seq((1L, 2L, 4L), (2L, 0L, 0L))) // chars = tokens at zero merges
  }
}
