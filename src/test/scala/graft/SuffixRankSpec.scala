package graft

import graft.operators.SuffixRank
import org.scalatest.funsuite.AnyFunSuite

class SuffixRankSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  /** Local reference: dense rank of each suffix's first-`L`-token slice
    * under Seq[String] lexicographic order (prefix-of sorts first).
    */
  def reference(texts: Seq[(Long, String)], L: Int): Seq[(Long, Int, Long)] = {
    val ord = math.Ordering.Implicits.seqOrdering[Seq, String]
    val sufs = texts.flatMap { case (id, t) =>
      val w = t.toLowerCase.split("[ \t\n\f\r]+").filter(_.nonEmpty).toSeq
      w.indices.map(i => (id, i + 1, w.slice(i, i + L)))
    }
    val ranks = sufs.map(_._3).distinct.sorted(ord).zipWithIndex.toMap
    sufs.map { case (id, p, key) => (id, p, ranks(key) + 1L) }
  }

  val texts = Seq(
    (1L, "the cat sat on the mat and the cat sat on the rug"),
    (2L, "a different document with the cat sat on the mat inside it"),
    (3L, "zz yy xx"),
    (4L, "the cat"), // suffixes shorter than 8 tokens, prefixes of doc 1's
    (5L, "and the cat sat on the rug")) // ≡ doc 1's pos-7 tail: shared ranks

  test("suffix ranks match the local reference (ties shared, prefix-of first)") {
    val docs = texts.toDF("doc_id", "text")
    val got = SuffixRank.suffixRanks(docs, prefixTokens = 8)
      .as[(Long, Int, Long)].collect().toSet
    assert(got == reference(texts, 8).toSet)
  }

  test("equal ranks mark equal 8-token runs across documents") {
    val docs = texts.toDF("doc_id", "text")
    val got = SuffixRank.suffixRanks(docs, prefixTokens = 8)
      .as[(Long, Int, Long)].collect()
    val byKey = got.groupBy(_._3)
    // "the cat sat on the mat" run: doc 1 pos 1 shares nothing 8-long
    // with doc 2 (different continuation), but doc 4's full suffix
    // "the cat" is a PREFIX of doc 1 pos 1's — so it ranks strictly lower
    val r1 = got.find(r => r._1 == 1L && r._2 == 1).get._3
    val r4 = got.find(r => r._1 == 4L && r._2 == 1).get._3
    assert(r4 < r1)
    // every shared rank really is an identical truncated suffix
    val toks = texts.toMap.map { case (id, t) =>
      id -> t.split("\\s+").filter(_.nonEmpty).toSeq
    }
    byKey.values.filter(_.length > 1).foreach { grp =>
      val keys = grp.map { case (id, p, _) => toks(id).slice(p - 1, p - 1 + 8) }.toSet
      assert(keys.size == 1, s"rank shared by unequal suffixes: $grp")
    }
  }

  test("duplicateRuns surfaces exactly the shared truncated suffixes, keep-first canonical") {
    val docs = texts.toDF("doc_id", "text")
    val ranks = reference(texts, 8)
    val want = ranks.groupBy(_._3).collect { case (rk, occ) if occ.size > 1 =>
      val first = occ.map(o => (o._1, o._2)).min
      (rk, occ.size.toLong, first._1, first._2)
    }.toSet
    val got = SuffixRank.duplicateRuns(docs, prefixTokens = 8)
      .as[(Long, Long, Long, Int)].collect().toSet
    assert(got == want)
    assert(got.nonEmpty) // doc 5 ≡ doc 1's pos-7 tail run
  }

  test("ranking is partitioning-independent") {
    val docs = texts.toDF("doc_id", "text")
    val a = SuffixRank.suffixRanks(docs.repartition(7), prefixTokens = 4)
      .as[(Long, Int, Long)].collect().toSet
    val b = SuffixRank.suffixRanks(docs.coalesce(1), prefixTokens = 4)
      .as[(Long, Int, Long)].collect().toSet
    assert(a == b)
  }
}
