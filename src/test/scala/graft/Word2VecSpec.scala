package graft

import graft.functions.RollingHash
import graft.operators.Word2Vec
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class Word2VecSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  test("vocabulary: frequency-ranked dense ids, count desc then token asc") {
    val docs = Seq((1L, "b a b c a b")).toDF("doc_id", "text")
    val got = Word2Vec.vocabulary(docs, maxVocab = 2)
      .orderBy($"vid").as[(Long, String, Long)].collect().toSeq
    assert(got == Seq((0L, "b", 3L), (1L, "a", 2L)))
  }

  test("skipGramPairs: positives are the window pairs over the OOV-compacted stream; negatives replay the hash") {
    // vocab (maxVocab 2) = {b, a}; doc 1 "a q b" compacts to "a b" —
    // the OOV word NARROWS the gap (the word2vec.c contract), so (a, b)
    // pairs at window 1 despite q between them in the raw text
    val docs = Seq((1L, "a q b")).toDF("doc_id", "text")
    val got = Word2Vec.skipGramPairs(docs, window = 1, negatives = 1, maxVocab = 2)
      .as[(Long, Long, Int, Int, String, String, Int)].collect().toSeq.sorted
    // vocab of "a q b" top-2 by (count desc, tok asc): all counts 1, so
    // a = vid 0, b = vid 1, q excluded at rank 3
    val vsz = 2L
    def negTok(p: Long, off: Int): String = {
      val nid = RollingHash.compute(s"1:$p:$off:1") % vsz
      if (nid == 0L) "a" else "b"
    }
    val expected = Seq(
      (1L, 0L, 1, 0, "a", "b", 1),
      (1L, 0L, 1, 1, "a", negTok(0L, 1), 0),
      (1L, 1L, -1, 0, "b", "a", 1),
      (1L, 1L, -1, 1, "b", negTok(1L, -1), 0)).sorted
    assert(got == expected)
  }

  test("skipGramPairs: window 2 emits both offsets and both directions; negatives=0 omits the draw") {
    val docs = Seq((7L, "x y z")).toDF("doc_id", "text")
    val got = Word2Vec.skipGramPairs(docs, window = 2, negatives = 0, maxVocab = 10)
      .as[(Long, Long, Int, Int, String, String, Int)].collect().toSeq.sorted
    val expected = Seq(
      (7L, 0L, 1, 0, "x", "y", 1), (7L, 0L, 2, 0, "x", "z", 1),
      (7L, 1L, -1, 0, "y", "x", 1), (7L, 1L, 1, 0, "y", "z", 1),
      (7L, 2L, -2, 0, "z", "x", 1), (7L, 2L, -1, 0, "z", "y", 1)).sorted
    assert(got == expected)
  }

  test("gloveCooccurrence: lcm-scaled 1/d weights, symmetric, hand-rolled") {
    // "a b a": pairs fwd d=1 (a,b),(b,a) wgt 6; d=2 (a,a) wgt 3
    // symmetric union doubles each; agg:
    //   (a,b): 6+6=12 n=2; (b,a): 12 n=2; (a,a): 3+3=6 n=2
    val docs = Seq((1L, "a b a")).toDF("doc_id", "text")
    val got = Word2Vec.gloveCooccurrence(docs, window = 3, maxVocab = 10)
      .orderBy($"center", $"context")
      .as[(String, String, Long, Long)].collect().toSeq
    assert(got == Seq(
      ("a", "a", 6L, 2L), ("a", "b", 12L, 2L), ("b", "a", 12L, 2L)))
    // symmetry on a larger corpus: X(i,j) == X(j,i)
    val big = Seq((1L, "p q r p s q"), (2L, "r r p q s")).toDF("doc_id", "text")
    val x = Word2Vec.gloveCooccurrence(big, window = 3, maxVocab = 10)
      .as[(String, String, Long, Long)].collect().toSeq
    val m = x.map(r => (r._1, r._2) -> (r._3, r._4)).toMap
    m.foreach { case ((i, j), v) => assert(m((j, i)) == v, s"asym at ($i,$j)") }
  }

  test("fasttextSubwords: boundary-wrapped n-grams per word type, hand-rolled; buckets replay") {
    val docs = Seq((1L, "ab ab cde")).toDF("doc_id", "text")
    val got = Word2Vec.fasttextSubwords(docs, minN = 3, maxN = 6, buckets = 64)
      .orderBy($"word", $"n", $"i")
      .as[(String, Long, Int, Int, String, Long)].collect().toSeq
    def b(ng: String): Long = RollingHash.compute(ng) % 64L
    val expected = Seq(
      ("ab", 2L, 3, 1, "<ab", b("<ab")), ("ab", 2L, 3, 2, "ab>", b("ab>")),
      ("ab", 2L, 4, 1, "<ab>", b("<ab>")),
      ("cde", 1L, 3, 1, "<cd", b("<cd")), ("cde", 1L, 3, 2, "cde", b("cde")),
      ("cde", 1L, 3, 3, "de>", b("de>")),
      ("cde", 1L, 4, 1, "<cde", b("<cde")), ("cde", 1L, 4, 2, "cde>", b("cde>")),
      ("cde", 1L, 5, 1, "<cde>", b("<cde>")))
    assert(got == expected)
  }

  test("subsampleFrequent: frequent words get lower thresholds; rare words clamp to keep-always; coin replays") {
    // "the" dominates; t chosen so the clamp binds for the rare word
    val docs = Seq((1L, "the the the the the the the the rare")).toDF("doc_id", "text")
    val got = Word2Vec.subsampleFrequent(docs, t = 0.25)
      .as[(Long, Int, String, Long, Long, Boolean)].collect().toSeq
    val byTok = got.groupBy(_._3)
    // N=9, c(the)=8: thresh = floor(sqrt(0.25*9/8)*2^20) = floor(0.5303..*2^20)
    val exp = math.floor(math.sqrt(0.25 * 9 / 8) * 1048576.0).toLong
    assert(byTok("the").forall(_._5 == exp))
    assert(exp < 1048576L)
    // c(rare)=1: sqrt(0.25*9) = 1.5 -> clamped
    assert(byTok("rare").forall(r => r._5 == 1048576L && r._6))
    // the coin replays per instance
    got.foreach { r =>
      val h = RollingHash.compute(s"${r._1}:${r._2}:${r._3}") % 1048576L
      assert(r._6 == (h < r._5))
    }
    // partitioning-invariant
    val docs2 = Seq.tabulate(20)(i => (i.toLong, s"w$i the the common")).toDF("doc_id", "text")
    val a = Word2Vec.subsampleFrequent(docs2, t = 0.05)
      .as[(Long, Int, String, Long, Long, Boolean)].collect().toSeq.sorted
    val b = Word2Vec.subsampleFrequent(docs2.repartition(7), t = 0.05)
      .as[(Long, Int, String, Long, Long, Boolean)].collect().toSeq.sorted
    assert(a == b && a.nonEmpty)
    // at corpus scale the downsampler must actually fire both ways
    assert(a.exists(!_._6) && a.exists(_._6))
  }

  /** Exact ⌊n^{3/4}⌋ via BigInt search — the independent reference for
    * the integer fourth root.
    */
  private def pow34(n: Long): Long = {
    val c3 = BigInt(n).pow(3)
    Iterator.from(0).map(BigInt(_)).takeWhile(r => r.pow(4) <= c3).length - 1L
  }

  test("negativeSamplingTable: w34 is the EXACT integer ⌊n_occ^{3/4}⌋ on fourth-power boundaries and beyond") {
    // boundary-exact counts: 16^{3/4}=8, 81^{3/4}=27 land ON integer
    // roots; neighbors probe the correction steps both directions
    val ns = Seq(1L, 2L, 3L, 15L, 16L, 17L, 80L, 81L, 82L, 100L, 625L,
      4095L, 4096L, 4097L, 59048L, 59049L, 59050L, 1999999L, 2000000L)
    val vocab = ns.zipWithIndex
      .map { case (n, i) => (i.toLong, s"t$i", n) }
      .toDF("vid", "tok", "n_occ")
    val got = Word2Vec.negativeSamplingTable(vocab)
      .orderBy($"vid").as[(Long, String, Long, Long, Long)].collect().toSeq
    got.zip(ns).foreach { case ((_, _, nOcc, w34, _), n) =>
      assert(nOcc == n && w34 == pow34(n), s"n=$n got w34=$w34 want ${pow34(n)}")
    }
    // cum is the exclusive running total in vid order
    got.foldLeft(0L) { case (acc, (_, _, _, w34, cum)) =>
      assert(cum == acc); acc + w34
    }
    // the int64 envelope guard fires LOUD above the cap
    val over = Seq((0L, "t", 2000001L)).toDF("vid", "tok", "n_occ")
    val e = intercept[Exception] {
      Word2Vec.negativeSamplingTable(over).collect()
    }
    assert(e.getMessage != null)
  }

  test("skipGramPairsUnigram: draw lands in the covering ¾-power interval; positives match the uniform face") {
    // skewed corpus counts: a=48, b=6 — w34(a)=⌊48^{3/4}⌋=18,
    // w34(b)=⌊6^{3/4}⌋=3, total 21: intervals a=[0,18) b=[18,21) give
    // "b" 1/7 of the mass vs the uniform draw's 1/2
    val docs = Seq.tabulate(6)(i =>
      (i.toLong, "a a a a b a a a a")).toDF("doc_id", "text")
    val uni = Word2Vec.skipGramPairs(docs, window = 1, negatives = 1, maxVocab = 2)
      .as[(Long, Long, Int, Int, String, String, Int)].collect().toSeq.sorted
    val pw = Word2Vec.skipGramPairsUnigram(docs, window = 1, negatives = 1, maxVocab = 2)
      .as[(Long, Long, Int, Int, String, String, Int)].collect().toSeq.sorted
    // positives identical across the two faces
    assert(uni.filter(_._7 == 1) == pw.filter(_._7 == 1) && uni.nonEmpty)
    // every ¾-power negative replays the interval pick by hand
    pw.filter(_._7 == 0).foreach { case (d, p, off, si, _, ctx, _) =>
      val h = RollingHash.compute(s"$d:$p:$off:$si") % 21L
      assert(ctx == (if (h < 18L) "a" else "b"), s"row ($d,$p,$off)")
    }
    // the distributions provably DIVERGE on this fixture: the uniform
    // draw picks "b" whenever h%2=1 (half the mass); the ¾-power table
    // gives "b" only 1/7 — at least one row must differ
    val uniNeg = uni.filter(_._7 == 0).map(r => (r._1, r._2, r._3, r._6))
    val pwNeg = pw.filter(_._7 == 0).map(r => (r._1, r._2, r._3, r._6))
    assert(uniNeg.map(_.copy(_4 = ())) == pwNeg.map(_.copy(_4 = ())),
      "negative row keys must align")
    assert(uniNeg != pwNeg,
      "fixture must make the ¾-power and uniform draws pick DIFFERENT negatives")
  }

  test("skipGramPairsUnigram: row counts preserved (every draw covered), partitioning-invariant") {
    val docs = Seq.tabulate(12)(i =>
      (i.toLong, s"w${i % 3} common common w${i % 5} common rare$i common"))
      .toDF("doc_id", "text")
    val a = Word2Vec.skipGramPairsUnigram(docs, window = 2, negatives = 3, maxVocab = 6)
      .as[(Long, Long, Int, Int, String, String, Int)].collect().toSeq.sorted
    val b = Word2Vec.skipGramPairsUnigram(docs.repartition(7), window = 2,
        negatives = 3, maxVocab = 6)
      .as[(Long, Long, Int, Int, String, String, Int)].collect().toSeq.sorted
    assert(a == b && a.nonEmpty)
    val nPos = a.count(_._7 == 1)
    assert(a.count(_._7 == 0) == 3 * nPos,
      "every negative draw must land in exactly one interval")
  }

  test("skipGramPairsWithVocab: non-dense vids fail LOUD instead of dropping negatives") {
    val docs = Seq((1L, "a b a b")).toDF("doc_id", "text")
    val sparse = Seq((5L, "a", 2L), (9L, "b", 2L)).toDF("vid", "tok", "n_occ")
    val e = intercept[Exception] {
      Word2Vec.skipGramPairsWithVocab(docs, sparse, window = 1, negatives = 1).collect()
    }
    assert(e.getMessage != null)
  }

  test("skipGramPairsUnigramFrozen: row-identical to the interval join; fit gate fires LOUD") {
    // skewed counts so the ¾-power intervals are non-trivial, plus
    // singleton words so zero-padding edges (cum boundaries) bind
    val docs = Seq.tabulate(8)(i =>
      (i.toLong, s"a a a a b a rare$i a b a")).toDF("doc_id", "text")
    val vocab = Word2Vec.vocabulary(docs, maxVocab = 4)
    val join = Word2Vec.skipGramPairsUnigramWithVocab(docs, vocab,
        window = 2, negatives = 3)
      .as[(Long, Long, Int, Int, String, String, Int)].collect().toSeq.sorted
    val frozen = Word2Vec.skipGramPairsUnigramFrozen(docs, vocab,
        window = 2, negatives = 3)
      .as[(Long, Long, Int, Int, String, String, Int)].collect().toSeq.sorted
    assert(join == frozen && join.nonEmpty,
      "the binary-search face must be row-identical to the interval join")
    // size gate: a cap below the vocabulary size must fail loudly
    val e = intercept[IllegalArgumentException] {
      Word2Vec.skipGramPairsUnigramFrozen(docs, vocab, window = 1,
        negatives = 1, maxModelKeys = 2L).collect()
    }
    assert(e.getMessage.contains("maxModelKeys"))
  }

  test("NegTableOps.pick: rightmost-interval binary search on boundaries and zero-width entries") {
    import org.apache.spark.unsafe.types.UTF8String
    def u(s: String) = UTF8String.fromString(s)
    // intervals: a=[0,5) b=[5,8) c=ZERO-WIDTH at 8 d=[8,10)
    val cums = Array(0L, 5L, 8L, 8L)
    val toks = Array(u("a"), u("b"), u("c"), u("d"))
    val expect = Map(0L -> "a", 4L -> "a", 5L -> "b", 7L -> "b",
      8L -> "d", 9L -> "d")
    expect.foreach { case (h, t) =>
      assert(graft.functions.NegTableOps.pick(h, cums, toks).toString == t,
        s"h=$h")
    }
  }
}
