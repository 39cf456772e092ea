package graft

import graft.operators.TextAnalysis
import org.scalatest.funsuite.AnyFunSuite

class WinnowingSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  def rollHash(s: String): Long = {
    var h = 0L
    s.foreach(c => h = (h * 31 + c.toLong) % 1000000007L)
    h
  }

  /** Local reference: shingle-hash sequence → per-window rightmost min. */
  def reference(text: String, k: Int, w: Int): Set[(Int, Long)] = {
    val toks = text.split("[ \t\n\f\r]+").filter(_.nonEmpty).toSeq
    val hs = toks.sliding(k).filter(_.size == k).map(g => rollHash(g.mkString(" "))).toVector
    if (hs.isEmpty) Set.empty
    else {
      val wins = if (hs.size < w) Seq(0) else 0 to hs.size - w
      wins.map { i =>
        val win = hs.slice(i, i + w)
        val mn = win.min
        val rj = win.lastIndexOf(mn)
        (i + rj + 1, mn) // 1-based
      }.toSet
    }
  }

  test("fingerprints match the local reference incl. rightmost-tie and short-doc windows") {
    val docs = Seq(
      (1L, "a b c d e f g h i j k l m n o p"),
      (2L, "x y x y x y x y x y x y"), // repeated shingles → in-window ties
      (3L, "p q r s t"), // 3 shingles < w → single partial window
      (4L, "u v"), // under k tokens → no shingles, no fingerprints
      (5L, "")
    ).toDF("doc_id", "text")
    val got = TextAnalysis.winnowFingerprints(docs, k = 3, w = 8)
      .as[(Long, Int, Long)].collect().toSet
    val want = docs.as[(Long, String)].collect().flatMap { case (id, t) =>
      reference(t, 3, 8).map { case (p, f) => (id, p, f) }
    }.toSet
    assert(got == want)
    assert(!got.exists(_._1 == 4L) && !got.exists(_._1 == 5L))
    assert(got.count(_._1 == 3L) == 1) // one partial window → one fingerprint
  }

  test("one-pass expression ≡ HOF spelling on non-ASCII text (Unicode case mapping)") {
    // the fused expression lowercases with Java Locale.ROOT while the HOF
    // twin goes through Spark's lower(); this pins their agreement beyond
    // ASCII — accented Latin, German ß/SS, Cyrillic, and Greek ΣΟΦΟΣ
    // (whose trailing sigma exercises the contextual final-sigma rule)
    val docs = Seq(
      (1L, "Éclair ÉCLAIR école Über ÜBER straße STRASSE"),
      (2L, "Привет МИР привет мир Привет МИР привет мир"),
      (3L, "ΣΟΦΟΣ σοφος ΣΟΦΟΣ σοφος ΣΟΦΟΣ")
    ).toDF("doc_id", "text")
    for ((k, w) <- Seq((2, 4), (3, 8))) {
      val fused = TextAnalysis.winnowFingerprints(docs, k, w)
        .as[(Long, Int, Long)].collect().toSet
      val hof = TextAnalysis.winnowFingerprintsHof(docs, k, w)
        .as[(Long, Int, Long)].collect().toSet
      assert(fused == hof, s"k=$k w=$w")
      assert(fused.nonEmpty, s"k=$k w=$w")
    }
  }

  test("one-pass expression ≡ HOF spelling on the real corpus (both parameterizations)") {
    val docs = graft.operators.TextDedup.documents(spark, "/root/testdata/sf0.001")
    for ((k, w) <- Seq((3, 8), (2, 4))) {
      val fused = TextAnalysis.winnowFingerprints(docs, k, w)
        .as[(Long, Int, Long)].collect().toSet
      val hof = TextAnalysis.winnowFingerprintsHof(docs, k, w)
        .as[(Long, Int, Long)].collect().toSet
      assert(fused == hof, s"k=$k w=$w")
      assert(fused.nonEmpty)
    }
  }

  test("local guarantee: docs sharing a token run of ≥ w+k−1 words share a fingerprint") {
    val shared = (1 to 10).map(i => s"run$i").mkString(" ") // 10 ≥ w+k−1 = 10
    val docs = Seq(
      (1L, s"alpha beta gamma $shared delta epsilon"),
      (2L, s"zeta eta $shared theta iota kappa lambda")
    ).toDF("doc_id", "text")
    val fps = TextAnalysis.winnowFingerprints(docs, k = 3, w = 8)
      .as[(Long, Int, Long)].collect()
    val byDoc = fps.groupBy(_._1).map { case (d, v) => d -> v.map(_._3).toSet }
    assert((byDoc(1L) intersect byDoc(2L)).nonEmpty)
    // and winnowDups surfaces the pair
    val dups = TextAnalysis.winnowDups(docs, k = 3, w = 8, minShared = 1, maxDf = 50)
      .as[(Long, Long, Long)].collect()
    assert(dups.exists(p => p._1 == 1L && p._2 == 2L))
  }

  test("fuzz: the one-pass deque selection ≡ the naive per-window rightmost-min reference") {
    import org.scalacheck.{Gen, rng}
    // tiny alphabets force dense hash ties inside windows — the regime
    // the rightmost-tie rule and the >= back-pop exist for
    val caseGen = for {
      n <- Gen.choose(0, 40)
      toks <- Gen.listOfN(n, Gen.oneOf("a", "b", "c", "ab", "ba"))
      k <- Gen.choose(1, 3)
      w <- Gen.choose(1, 6)
    } yield (toks.mkString(" "), k, w)
    (0 until 300).foreach { i =>
      val (text, k, w) = caseGen.pureApply(Gen.Parameters.default, rng.Seed(i.toLong))
      val got = graft.functions.WinnowFps.compute(text, k, w)
        .array.map { r =>
          val row = r.asInstanceOf[org.apache.spark.sql.catalyst.expressions.GenericInternalRow]
          (row.getInt(0), row.getLong(1))
        }.toSet
      val want = {
        val toks = text.split("[ \t\n\f\r]+").filter(_.nonEmpty).toSeq
        val hs = toks.sliding(k).filter(_.size == k).map(g => rollHash(g.mkString(" "))).toVector
        if (hs.isEmpty) Set.empty[(Int, Long)]
        else {
          val wins = if (hs.size < w) Seq(0) else 0 to hs.size - w
          wins.map { s =>
            val win = hs.slice(s, s + w)
            (s + win.lastIndexOf(win.min) + 1, win.min)
          }.toSet
        }
      }
      assert(got == want, s"seed $i: text='$text' k=$k w=$w → $got, want $want")
    }
  }

  test("df cap diverts boilerplate fingerprints from pairing") {
    // every doc carries the same template; pairs only exist through it
    val docs = (1L to 5L).map(i =>
      (i, s"common template words repeated across documents here unique$i token$i")).toDF("doc_id", "text")
    val uncapped = TextAnalysis.winnowDups(docs, k = 3, w = 4, minShared = 1, maxDf = 50).count()
    val capped = TextAnalysis.winnowDups(docs, k = 3, w = 4, minShared = 1, maxDf = 4).count()
    assert(uncapped > 0)
    assert(capped == 0) // the df-5 template hashes are diverted
  }
}
