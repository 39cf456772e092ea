package graft

import graft.operators.LanguageModel
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class LanguageModelSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  // d1 "a b a b", d2 "a b c", d3 "c a": bigrams (a,b)×3, (b,a)×1,
  // (b,c)×1, (c,a)×1; unigram counts a=4, b=3, c=2
  def tiny = Seq((1L, "a b a b"), (2L, "a b c"), (3L, "c a"))
    .toDF("doc_id", "text")

  test("quantized LM matches a hand-rolled reference (full vocabulary)") {
    // vocab {a,b,c}, vsz=4; c_u: a=3 b=2 c=1
    // contrib: (a,b)=(10000*4)div 7=5714, (b,a)=(10000*2)div 6=3333,
    //          (b,c)=3333, (c,a)=(10000*2)div 5=4000
    val got = LanguageModel.bigramLmQuantized(tiny, maxVocab = 100)
      .orderBy($"doc_id").as[(Long, Long, Long)].collect().toSeq
    assert(got == Seq((1L, 2 * 5714L + 3333L, 3L), (2L, 5714L + 3333L, 2L),
      (3L, 4000L, 1L)))
  }

  test("capped vocabulary maps OOV to <unk> and shrinks the event space") {
    // vocab = top-2 {a,b} (c → <unk>), vsz=3; mapped d2 = a b u, d3 = u a
    // c_uv: (a,b)=3 (b,a)=1 (b,u)=1 (u,a)=1; c_u: a=3 b=2 u=1
    // contrib: (a,b)=40000 div 6=6666, (b,a)=(b,u)=20000 div 5=4000,
    //          (u,a)=20000 div 4=5000
    val got = LanguageModel.bigramLmQuantized(tiny, maxVocab = 2)
      .orderBy($"doc_id").as[(Long, Long, Long)].collect().toSeq
    assert(got == Seq((1L, 2 * 6666L + 4000L, 3L), (2L, 6666L + 4000L, 2L),
      (3L, 5000L, 1L)))
  }

  test("documents with fewer than two tokens produce no row") {
    val d = Seq((1L, "a b"), (2L, "solo"), (3L, ""), (4L, "  \t "))
      .toDF("doc_id", "text")
    val got = LanguageModel.bigramLmQuantized(d, maxVocab = 10)
      .select($"doc_id").as[Long].collect().toSet
    assert(got == Set(1L))
  }

  test("integer path is exact: invariant under input partitioning") {
    val a = LanguageModel.bigramLmQuantized(tiny, maxVocab = 2)
      .orderBy($"doc_id").as[(Long, Long, Long)].collect().toSeq
    val b = LanguageModel.bigramLmQuantized(tiny.repartition(7), maxVocab = 2)
      .orderBy($"doc_id").as[(Long, Long, Long)].collect().toSeq
    assert(a == b)
  }

  test("kneserNey: model matches a hand-rolled reference; scorer sums it per doc") {
    // bigram types: (a,b) c=3, (b,a) c=1, (b,c) c=1, (c,a) c=1; NN=4
    // c_u: a=3 b=2 c=1; N1+(u.): a=1 b=2 c=1; N1+(.v): b=1 a=2 c=1
    // kn_q = (10000*((4c-3)*NN + 3*n1_fol*n1_pre)) div (4*c_u*NN):
    //  (a,b) = 390000 div 48 = 8125  <=> 0.75   + 0.75*(1/3)*(1/4)
    //  (b,a) = 160000 div 32 = 5000  <=> 0.125  + 0.75*(2/2)*(2/4)
    //  (b,c) = 100000 div 32 = 3125  <=> 0.125  + 0.75*(2/2)*(1/4)
    //  (c,a) = 100000 div 16 = 6250  <=> 0.25   + 0.75*(1/1)*(2/4)
    val model = LanguageModel.kneserNeyModel(tiny, maxVocab = 100)
      .orderBy($"u", $"v")
      .as[(String, String, Long, Long, Long, Long, Long, Long)]
      .collect().toSeq
    assert(model == Seq(
      ("a", "b", 3L, 3L, 1L, 1L, 4L, 8125L),
      ("b", "a", 1L, 2L, 2L, 2L, 4L, 5000L),
      ("b", "c", 1L, 2L, 2L, 1L, 4L, 3125L),
      ("c", "a", 1L, 1L, 1L, 2L, 4L, 6250L)))
    val got = LanguageModel.kneserNeyQuantized(tiny, maxVocab = 100)
      .orderBy($"doc_id").as[(Long, Long, Long)].collect().toSeq
    assert(got == Seq((1L, 2 * 8125L + 5000L, 3L), (2L, 8125L + 3125L, 2L),
      (3L, 6250L, 1L)))
  }

  test("kneserNey: the continuation correction ranks versatile words over glued ones") {
    // f occurs 3x but ONLY after p; g occurs 2x after two distinct
    // contexts — the "San Francisco" effect: n1_pre(g) > n1_pre(f)
    // despite c(.f) > c(.g)
    val docs = Seq((1L, "p f p f p f"), (2L, "q g r g"))
      .toDF("doc_id", "text")
    val model = LanguageModel.kneserNeyModel(docs, maxVocab = 100)
      .select($"v", $"n1_pre").distinct()
      .as[(String, Long)].collect().toMap
    assert(model("f") == 1L && model("g") == 2L)
  }

  test("kneserNey: scorer skips sub-2-token docs; integer path partitioning-invariant") {
    val d = Seq((1L, "a b"), (2L, "solo"), (3L, ""), (4L, "a b a c"))
      .toDF("doc_id", "text")
    val got = LanguageModel.kneserNeyQuantized(d, maxVocab = 10)
      .select($"doc_id").as[Long].collect().toSet
    assert(got == Set(1L, 4L))
    val a = LanguageModel.kneserNeyModel(tiny, maxVocab = 2)
      .orderBy($"u", $"v")
      .as[(String, String, Long, Long, Long, Long, Long, Long)].collect().toSeq
    val b = LanguageModel.kneserNeyModel(tiny.repartition(7), maxVocab = 2)
      .orderBy($"u", $"v")
      .as[(String, String, Long, Long, Long, Long, Long, Long)].collect().toSeq
    assert(a == b && a.nonEmpty)
  }

  test("kneserNey narrow face: row-identical to the batch scorer on the fit corpus, short docs at 0") {
    val (vm, knq, n1f, n1p, cu, nn) =
      LanguageModel.fitKneserNey(tiny, maxVocab = 100)
    val narrow = LanguageModel.kneserNeyScoreNarrow(tiny, vm, knq, n1f, n1p, cu, nn)
      .select($"doc_id", $"kn_q_sum", $"n_bigrams")
      .orderBy($"doc_id").as[(Long, Long, Long)].collect().toSeq
    val batch = LanguageModel.kneserNeyQuantized(tiny, maxVocab = 100)
      .orderBy($"doc_id").as[(Long, Long, Long)].collect().toSeq
    assert(narrow == batch)
    val short = Seq((9L, "solo")).toDF("doc_id", "text")
    val got = LanguageModel.kneserNeyScoreNarrow(short, vm, knq, n1f, n1p, cu, nn)
      .select($"kn_q_sum", $"n_bigrams").as[(Long, Long)].collect().toSeq
    assert(got == Seq((0L, 0L)))
  }

  test("kneserNey narrow face: unseen pair takes the continuation branch; novel context floors at 0") {
    val (vm, knq, n1f, n1p, cu, nn) =
      LanguageModel.fitKneserNey(tiny, maxVocab = 100)
    // (a, c) never trained: cu(a)=3, n1_fol(a)=1, n1_pre(c)=1, NN=4
    //  -> (10000*3*1*1) div (4*3*4) = 625  <=> 0.75*(1/3)*(1/4)
    val unseen = Seq((1L, "a c")).toDF("doc_id", "text")
    val got = LanguageModel.kneserNeyScoreNarrow(unseen, vm, knq, n1f, n1p, cu, nn)
      .select($"kn_q_sum").as[Long].collect().head
    assert(got == 625L)
    // fit "x y": y is never a context; scoring "y x" floors at 0
    val fitDocs = Seq((1L, "x y")).toDF("doc_id", "text")
    val (vm2, knq2, n1f2, n1p2, cu2, nn2) =
      LanguageModel.fitKneserNey(fitDocs, maxVocab = 100)
    val got2 = LanguageModel.kneserNeyScoreNarrow(
        Seq((1L, "y x")).toDF("doc_id", "text"),
        vm2, knq2, n1f2, n1p2, cu2, nn2)
      .select($"kn_q_sum").as[Long].collect().head
    assert(got2 == 0L)
    // the mean-score keep threshold binds both ways on the fit corpus
    val kept = LanguageModel.kneserNeyScoreNarrow(tiny, vm, knq, n1f, n1p,
        cu, nn, minMeanQ = 6000L)
      .select($"keep").as[Boolean].collect().toSeq
    assert(kept.contains(true) && kept.contains(false))
  }

  test("trigram KN: the three-level recursion hand-rolled on 'a b c a b d'") {
    // trigram types all c3=1; c2(a,b)=2/k3=2; t2 each 1; s2(b)=2/k2=2,
    // s2(a)=s2(c)=1/k2=1; n1w=1 each, NN=4 -> p1_q=2500 everywhere
    val docs = Seq((1L, "a b c a b d")).toDF("doc_id", "text")
    val got = LanguageModel.kneserNeyTrigramModel(docs, maxVocab = 100)
      .orderBy($"u", $"v", $"w")
      .select($"u", $"v", $"w", $"p1_q", $"p2_q", $"p3_q")
      .as[(String, String, String, Long, Long, Long)].collect().toSeq
    // (a,b,*): p2 = 1250 + (7500*2500)div1e4 = 3125 <=> 0.3125 exactly;
    //          p3 = 1250 + (7500*3125)div1e4 = 3593 <=> 0.359375
    // (b,c,a)/(c,a,b): p2 = 2500+1875 = 4375 <=> 0.4375;
    //          p3 = 2500 + (7500*4375)div1e4 = 5781 <=> 0.578125
    assert(got == Seq(
      ("a", "b", "c", 2500L, 3125L, 3593L),
      ("a", "b", "d", 2500L, 3125L, 3593L),
      ("b", "c", "a", 2500L, 4375L, 5781L),
      ("c", "a", "b", 2500L, 4375L, 5781L)))
    // partitioning-invariant
    val rep = LanguageModel.kneserNeyTrigramModel(docs.repartition(5), maxVocab = 100)
      .orderBy($"u", $"v", $"w")
      .select($"u", $"v", $"w", $"p1_q", $"p2_q", $"p3_q")
      .as[(String, String, String, Long, Long, Long)].collect().toSeq
    assert(got == rep)
  }

  test("modified KN: hand-rolled discounts and model rows (count-of-counts 1,1,1,1)") {
    // one bigram type per count 1..4, each doc a single pair so no
    // cross-pair noise: n1=n2=n3=n4=1, nn=4, d=n1+2n2=3
    // D1=1/3->3333; D2=(2*3-3)/3=1->10000; D3=(3*3-4)/3=5/3->16666
    val docs = (Seq((1L, "a b"), (2L, "c d"), (3L, "c d")) ++
      (4 to 6).map(i => (i.toLong, "e f")) ++
      (7 to 10).map(i => (i.toLong, "g h"))).toDF("doc_id", "text")
    val disc = LanguageModel.kneserNeyModifiedDiscounts(docs, maxVocab = 100)
      .as[(Long, Long, Long, Long, Long, Long, Long, Long)].collect().head
    assert(disc == ((1L, 1L, 1L, 1L, 4L, 3333L, 10000L, 16666L)))
    val model = LanguageModel.kneserNeyModifiedModel(docs, maxVocab = 100)
      .orderBy($"u", $"v")
      .as[(String, String, Long, Long, Long, Long, Long, Long, Long)]
      .collect().toSeq
    // (a,b): disc=(10000-3333)div1=6667, gamma=3333, cont=2500,
    //        mkn=6667+833=7500 <=> exactly (1-1/3)/1 + (1/3)(1/4) = 0.75
    assert(model.find(r => r._1 == "a" && r._2 == "b").get ==
      (("a", "b", 1L, 1L, 3333L, 6667L, 3333L, 2500L, 7500L)))
    // (e,f): c=3,c_u=3: disc=(30000-16666)div3=4444, gamma=16666div3=5555,
    //        mkn=4444+(5555*2500)div10000=5832 <=> 4/9+5/36=0.5833..
    assert(model.find(r => r._1 == "e" && r._2 == "f").get ==
      (("e", "f", 3L, 3L, 16666L, 4444L, 5555L, 2500L, 5832L)))
  }

  test("modified KN: the D2 clamp binds when 3*n1*n3 outweighs 2*n2*d; degenerate corpus fails loud") {
    // n1=6, n2=1, n3=3: d=8, 2*1*8=16 < 3*6*3=54 -> d2q clamps to 0
    val docs = ((1 to 6).map(i => (i.toLong, s"s${i}a s${i}b")) ++
      Seq((7L, "t1 t2"), (8L, "t1 t2")) ++
      (0 until 9).map(i => (9L + i, s"u${i / 3}a u${i / 3}b"))).toDF("doc_id", "text")
    val disc = LanguageModel.kneserNeyModifiedDiscounts(docs, maxVocab = 100)
      .as[(Long, Long, Long, Long, Long, Long, Long, Long)].collect().head
    assert((disc._1, disc._2, disc._3) == ((6L, 1L, 3L)))
    assert(disc._7 == 0L, "d2q must clamp to 0")
    assert(disc._6 == (10000L * 6 / 8))
    // all bigram counts >= 5: no count-of-counts signal, loud failure
    val flat = (1 to 5).map(i => (i.toLong, "x y")).toDF("doc_id", "text")
    val e = intercept[Exception] {
      LanguageModel.kneserNeyModifiedDiscounts(flat, maxVocab = 100).collect()
    }
    assert(e.getMessage.contains("singleton or doubleton") ||
      Option(e.getCause).exists(_.getMessage.contains("singleton or doubleton")))
  }

  test("fitKneserNey: refuses a model past maxModelKeys before any collect") {
    val e = intercept[IllegalArgumentException] {
      LanguageModel.fitKneserNey(tiny, maxVocab = 100, maxModelKeys = 2L)
    }
    assert(e.getMessage.contains("maxModelKeys"))
  }

  // train half = doc 0 "a b c a b c": c3 (a,b,c)=2 (b,c,a)=1 (c,a,b)=1;
  // c2 (a,b)=2 (b,c)=2 (c,a)=1; c1 a=2 b=2 c=2, N=6; vocab {a,b,c}
  def sbCorpus = Seq(
    (0L, "a b c a b c"), // train
    (1L, "a b c"), // trigram hit: (10000*2) div 2 = 10000
    (3L, "b c c"), // unigram floor: (4*10000*2) div (25*6) = 533
    (5L, "c b c"), // bigram hit: (2*10000*2) div (5*2) = 4000
    (7L, "q q q"), // OOV everywhere: c1(<unk>) absent -> 0, still lvl 2
    (9L, ""), // tokenless -> all-zero row
    (11L, "a b")) // no full context -> all-zero row
    .toDF("doc_id", "text")

  test("stupid backoff: hand-rolled reference hits every backoff level") {
    val got = LanguageModel.stupidBackoffQuantized(sbCorpus, maxVocab = 100)
      .orderBy($"doc_id").as[(Long, Long, Long, Long, Long, Long)]
      .collect().toSeq
    assert(got == Seq(
      (1L, 10000L, 1L, 1L, 0L, 0L),
      (3L, 533L, 1L, 0L, 0L, 1L),
      (5L, 4000L, 1L, 0L, 1L, 0L),
      (7L, 0L, 1L, 0L, 0L, 1L),
      (9L, 0L, 0L, 0L, 0L, 0L),
      (11L, 0L, 0L, 0L, 0L, 0L)))
  }

  test("stupid backoff: integer path invariant under input partitioning") {
    val a = LanguageModel.stupidBackoffQuantized(sbCorpus, maxVocab = 2)
      .orderBy($"doc_id").as[(Long, Long, Long, Long, Long, Long)]
      .collect().toSeq
    val b = LanguageModel.stupidBackoffQuantized(sbCorpus.repartition(7), maxVocab = 2)
      .orderBy($"doc_id").as[(Long, Long, Long, Long, Long, Long)]
      .collect().toSeq
    assert(a == b)
  }

  test("stupid backoff: score half whose trigrams all trained is pure trigram hits") {
    // score doc repeats a train substring -> every instance lvl 0
    val d = Seq((0L, "a b c d e a b c d e"), (1L, "a b c d e"))
      .toDF("doc_id", "text")
    val got = LanguageModel.stupidBackoffQuantized(d, maxVocab = 100)
      .orderBy($"doc_id").as[(Long, Long, Long, Long, Long, Long)]
      .collect().toSeq
    assert(got.size == 1)
    val (_, _, nScored, nTri, nBi, nUni) = got.head
    assert(nScored == 3 && nTri == 3 && nBi == 0 && nUni == 0)
  }

  test("stupid backoff: refuses a degenerate split or non-positive knobs") {
    Seq(
      intercept[IllegalArgumentException] {
        LanguageModel.stupidBackoffQuantized(sbCorpus, trainModulus = 1L)
      },
      intercept[IllegalArgumentException] {
        LanguageModel.stupidBackoffQuantized(sbCorpus, maxVocab = 0)
      },
      intercept[IllegalArgumentException] {
        LanguageModel.stupidBackoffQuantized(sbCorpus, scale = 0L)
      }).foreach(e => assert(e.getMessage.nonEmpty))
  }

  test("bigramLmQuantizedOver: the word stream reproduces bigramLmQuantized; subword streams score") {
    import org.apache.spark.sql.functions.{col, posexplode}
    val wordStream = tiny.select(col("doc_id"),
      posexplode(graft.functions.TextFunctions.tokens(col("text")))
        .as(Seq("pos", "token")))
    val over = LanguageModel.bigramLmQuantizedOver(wordStream, maxVocab = 2)
      .orderBy($"doc_id").as[(Long, Long, Long)].collect().toSeq
    val base = LanguageModel.bigramLmQuantized(tiny, maxVocab = 2)
      .orderBy($"doc_id").as[(Long, Long, Long)].collect().toSeq
    assert(over == base)
    // a subword stream scores: per-char tokens of d1 "a b a b" -> more
    // bigrams than the word stream (chars, not words)
    val charStream = Seq((1L, 1, "a"), (1L, 2, "b"), (1L, 3, "a"), (1L, 4, "b"))
      .toDF("doc_id", "pos", "token")
    val sub = LanguageModel.bigramLmQuantizedOver(charStream, maxVocab = 10)
      .as[(Long, Long, Long)].collect().toSeq
    assert(sub.head._3 == 3L)
  }

  test("stupid backoff narrow face: row-identical to the batch scorer on the held-out half; keep thresholds") {
    val (vm, c3, c2, c1, n) = LanguageModel.fitStupidBackoff(sbCorpus, maxVocab = 100)
    val batch = LanguageModel.stupidBackoffQuantized(sbCorpus, maxVocab = 100)
      .select($"doc_id", $"sb_q", $"n_scored")
      .as[(Long, Long, Long)].collect().toSeq.sortBy(_._1)
    val narrow = LanguageModel.stupidBackoffScoreNarrow(
        sbCorpus.filter($"doc_id" % 2 =!= 0), vm, c3, c2, c1, n)
      .select($"doc_id", $"sb_q", $"n_scored")
      .as[(Long, Long, Long)].collect().toSeq.sortBy(_._1)
    assert(narrow == batch)
    // mean threshold: doc 1 (mean 10000) survives minMeanQ=5000, doc 3 (533) does not
    val kept = LanguageModel.stupidBackoffScoreNarrow(
        sbCorpus.filter($"doc_id" % 2 =!= 0), vm, c3, c2, c1, n, minMeanQ = 5000L)
      .filter($"keep").select($"doc_id").as[Long].collect().toSet
    assert(kept.contains(1L) && !kept.contains(3L))
    // loud guards
    intercept[IllegalArgumentException] {
      LanguageModel.stupidBackoffScoreNarrow(sbCorpus, vm, c3, c2, c1, 0L)
    }
    intercept[IllegalArgumentException] {
      LanguageModel.stupidBackoffScoreNarrow(sbCorpus, vm, c3, c2, c1,
        nTrain = Long.MaxValue / 1000L)
    }
  }

  test("fitStupidBackoff: a fit past maxModelKeys fails LOUD with the deployment note, before any collect") {
    // sbCorpus carries more than 3 distinct n-gram keys, so a cap of 3
    // must refuse — and the message must carry the foreachBatch
    // deployment note, not a generic bound complaint
    val e = intercept[IllegalArgumentException] {
      LanguageModel.fitStupidBackoff(sbCorpus, maxVocab = 100, maxModelKeys = 3L)
    }
    assert(e.getMessage.contains("foreachBatch") &&
      e.getMessage.contains("maxModelKeys"), e.getMessage)
    intercept[IllegalArgumentException] {
      LanguageModel.fitStupidBackoff(sbCorpus, maxVocab = 100, maxModelKeys = 0L)
    }
    // at the default cap the same corpus fits fine
    val (vm, _, _, _, n) = LanguageModel.fitStupidBackoff(sbCorpus, maxVocab = 100)
    assert(vm.nonEmpty && n > 0)
  }

  test("stupid backoff narrow face: runs append-mode on an unbounded stream") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val (vm, c3, c2, c1, n) = LanguageModel.fitStupidBackoff(sbCorpus, maxVocab = 100)
    val input = MemoryStream[(Long, String)]
    val scored = LanguageModel.stupidBackoffScoreNarrow(
      input.toDF().toDF("doc_id", "text"), vm, c3, c2, c1, n, minMeanQ = 5000L)
    val q = scored.writeStream.format("memory")
      .queryName("sb_gate").outputMode("append").start()
    try {
      input.addData((1L, "a b c"), (3L, "b c c"))
      q.processAllAvailable()
      input.addData((5L, "c b c"))
      q.processAllAvailable()
      val rows = spark.table("sb_gate")
        .select($"doc_id", $"sb_q", $"keep")
        .as[(Long, Long, Boolean)].collect().toSeq.sortBy(_._1)
      assert(rows == Seq((1L, 10000L, true), (3L, 533L, false), (5L, 4000L, false)))
    } finally q.stop()
  }

  test("log path: modal transitions score better than rare ones") {
    // d1 repeats the corpus's dominant bigram; d9 is all rare transitions
    val d = Seq((1L, "a b a b a b a b"), (2L, "a b a b"), (3L, "a b"),
      (9L, "x y z w")).toDF("doc_id", "text")
    val ppl = LanguageModel.bigramLogProb(d, maxVocab = 100)
      .select($"doc_id", $"perplexity").as[(Long, Double)].collect().toMap
    assert(ppl(1L) < ppl(9L))
    assert(ppl.values.forall(p => p > 0 && p.isFinite))
  }

  test("sf0.001 corpus: every multi-token doc scored, <unk> mass binds at maxVocab=16") {
    // the synthetic corpus has a 31-token vocabulary — the gated query's
    // maxVocab=16 must sit BELOW it or the OOV path silently never runs
    val docs = graft.operators.TextDedup.documents(spark, "/root/testdata/sf0.001")
    val scored = LanguageModel.bigramLmQuantized(docs, maxVocab = 16)
    val nMulti = docs
      .filter(size(graft.functions.TextFunctions.tokens($"text")) >= 2).count()
    assert(scored.count() == nMulti)
    // capped vs uncapped vocabularies must actually diverge (OOV binds)
    val uncapped = LanguageModel.bigramLmQuantized(docs, maxVocab = 1000000)
    val joined = scored.as("a")
      .join(uncapped.as("b"), Seq("doc_id"))
      .filter($"a.lm_q" =!= $"b.lm_q")
    assert(joined.count() > 0)
    graft.sources.Tables.evictPinned(spark, blocking = true)
  }

  test("perplexityBuckets: value-threshold terciles per group, scoreless docs in the tail") {
    import graft.operators.LanguageModel
    // one language, 9 scoreable docs whose s_q decreases with i: doc i
    // mixes the high-contrib (a,b) bigram (i+1 times) with the
    // lower-contrib (b,a) (i times), so the normalized score slides
    // from pure contrib_ab toward the midpoint — strictly ordered
    // except one div-truncation tie (docs 6/7), which the value cut
    // places in ONE bucket; plus a 1-token doc the LM cannot score
    val d = ((0 until 9).map { i =>
      (i.toLong, "xx", ("a b " * (i + 1)).trim)
    } :+ (9L, "xx", "solo")).toDF("doc_id", "lang", "text")
    val out = LanguageModel.perplexityBuckets(d, maxVocab = 16)
      .orderBy("doc_id").collect()
    assert(out.length == 10)
    val byBucket = out.groupBy(_.getAs[String]("bucket"))
      .view.mapValues(_.map(_.getLong(1)).toSet).toMap
    // the scoreless doc lands in the tail at s_q = 0
    assert(out(9).getAs[String]("bucket") == "tail" &&
      out(9).getAs[Long]("s_q") == 0L)
    // head docs all out-score middle docs, which out-score tail docs
    def maxS(b: String) = out.filter(_.getAs[String]("bucket") == b)
      .map(_.getAs[Long]("s_q"))
    assert(maxS("head").min > maxS("middle").max)
    assert(maxS("middle").min > maxS("tail").max)
    // 10 docs → boundaries at ranks ceil(.333*10)=4 and ceil(.667*10)=7:
    // 4 tail, 3 middle, 3 head (the 6/7 tie straddles no boundary)
    assert(byBucket("tail").size == 4 && byBucket("middle").size == 3 &&
      byBucket("head").size == 3)
    graft.sources.Tables.evictPinned(spark, blocking = true)
  }

  test("ccnetPipeline: und docs dropped, terciles per PREDICTED language, keep = head+middle; composition ≡ manual chain") {
    // 9 en-marker docs in 3 score classes (identical text within a
    // class), 3 de-marker docs, 2 marker-free (und) docs that must
    // vanish before the LM ever sees them. Class sizes are 2/4/3 in
    // DESCENDING score order: the BY-VALUE tercile ranks for n=9 are
    // ⌈333·9/1000⌉=3 and ⌈667·9/1000⌉=7, which must land at the TOP of
    // the lowest and middle classes — equal thirds would put rank 7 on
    // the top class and leave `head` empty (measured: 2232 < 3237 <
    // 4377 with these sizes)
    def rep(s: String, n: Int) = Seq.fill(n)(s).mkString(" ")
    val docs = (
      (0 until 2).map(i => (i.toLong, "the " + rep("cat cat", 4))) ++
      (2 until 6).map(i => (i.toLong, "the " + rep("dog bird fish mouse", 2))) ++
      (6 until 9).map(i => (i.toLong, "of to and a the " + rep("horse", 3))) ++
      (9 until 12).map(i => (i.toLong, "der die das und ist haus")) ++
      Seq((12L, "zzz yyy xxx www"), (13L, "qqq ppp ooo"))
    ).toDF("doc_id", "text")
    val got = LanguageModel.ccnetPipeline(docs, maxVocab = 16)
      .as[(String, Long, Long, String, Boolean)].collect().toSeq
    // und docs never surface
    assert(!got.exists(r => r._2 == 12L || r._2 == 13L))
    assert(got.map(_._1).toSet == Set("en", "de"))
    // keep is exactly the head+middle split
    got.foreach(r => assert(r._5 == (r._4 != "tail"), s"row $r"))
    // per predicted language, the VALUE terciles order: every tail
    // score <= every middle score <= every head score
    Seq("en", "de").foreach { l =>
      val g = got.filter(_._1 == l)
      def s(b: String) = g.filter(_._4 == b).map(_._3)
      for (lo <- Seq("tail"); hi <- Seq("middle", "head"); if s(lo).nonEmpty && s(hi).nonEmpty)
        assert(s(lo).max <= s(hi).min, s"$l: $lo max > $hi min")
      if (s("middle").nonEmpty && s("head").nonEmpty)
        assert(s("middle").max <= s("head").min, s"$l tercile order")
    }
    // en has 3 distinct score classes -> all three buckets populated
    val en = got.filter(_._1 == "en")
    assert(en.map(_._4).toSet == Set("tail", "middle", "head"))
    // within a class (identical text) the bucket is identical
    assert(en.groupBy(_._3).forall(_._2.map(_._4).distinct.size == 1))
    // the composition is exactly the manual chain through the public ops
    val tagged = docs
      .withColumn("lang_pred", graft.operators.TextAnalysis.langId(
        graft.functions.TextFunctions.tokens(col("text"))))
      .filter(col("lang_pred") =!= "und")
    val manual = LanguageModel.perplexityBuckets(tagged, "lang_pred", 16)
      .withColumn("keep", col("bucket") =!= "tail")
      .as[(String, Long, Long, String, Boolean)].collect().toSeq
    assert(got.toSet == manual.toSet)
  }

  test("ccnetPipelinePerLang: per-language statistics diverge from the single LM; semantics and partitioning hold") {
    // the ccnetPipeline fixture, re-used: 9 en docs in 3 score classes
    // + 3 de docs + 2 und docs. en has 11 word types and de 6 — at
    // maxVocab = 12 the GLOBAL vocabulary must evict low-count types
    // across language lines, while each per-language vocabulary fits
    // whole, so the two pipelines provably score differently
    def rep(s: String, n: Int) = Seq.fill(n)(s).mkString(" ")
    val docs = (
      (0 until 2).map(i => (i.toLong, "the " + rep("cat cat", 4))) ++
      (2 until 6).map(i => (i.toLong, "the " + rep("dog bird fish mouse", 2))) ++
      (6 until 9).map(i => (i.toLong, "of to and a the " + rep("horse", 3))) ++
      (9 until 12).map(i => (i.toLong, "der die das und ist haus")) ++
      Seq((12L, "zzz yyy xxx www"), (13L, "qqq ppp ooo"))
    ).toDF("doc_id", "text")
    val got = LanguageModel.ccnetPipelinePerLang(docs, maxVocab = 12)
      .as[(String, Long, Long, String, Boolean)].collect().toSeq
    // same selection semantics as the single-LM face
    assert(!got.exists(r => r._2 == 12L || r._2 == 13L))
    assert(got.map(_._1).toSet == Set("en", "de"))
    got.foreach(r => assert(r._5 == (r._4 != "tail"), s"row $r"))
    Seq("en", "de").foreach { l =>
      val g = got.filter(_._1 == l)
      def s(b: String) = g.filter(_._4 == b).map(_._3)
      for (lo <- Seq("tail"); hi <- Seq("middle", "head"); if s(lo).nonEmpty && s(hi).nonEmpty)
        assert(s(lo).max <= s(hi).min, s"$l: $lo max > $hi min")
    }
    // the per-language LM provably diverges from the corpus-wide one
    val single = LanguageModel.ccnetPipeline(docs, maxVocab = 12)
      .as[(String, Long, Long, String, Boolean)].collect().toSeq
    assert(got.map(r => (r._2, r._3)).sorted != single.map(r => (r._2, r._3)).sorted,
      "per-language statistics must change some document's score")
    // partitioning invariance (the salted two-phase top-k included)
    val re = LanguageModel.ccnetPipelinePerLang(docs.repartition(7), maxVocab = 12)
      .as[(String, Long, Long, String, Boolean)].collect().toSeq
    assert(got.toSet == re.toSet)
  }

  test("ccnetKeepNarrow: row-identical to the batch pipeline on the fit corpus; unfit-language and smoothing branches bind") {
    def rep(s: String, n: Int) = Seq.fill(n)(s).mkString(" ")
    val docs = (
      (0 until 2).map(i => (i.toLong, "the " + rep("cat cat", 4))) ++
      (2 until 6).map(i => (i.toLong, "the " + rep("dog bird fish mouse", 2))) ++
      (6 until 9).map(i => (i.toLong, "of to and a the " + rep("horse", 3))) ++
      (9 until 12).map(i => (i.toLong, "der die das und ist haus")) ++
      Seq((12L, "zzz yyy xxx www"))
    ).toDF("doc_id", "text")
    val model = LanguageModel.fitCcnet(docs, maxVocab = 12)
    val narrow = LanguageModel.ccnetKeepNarrow(docs, model)
      .as[(String, Long, Long, String, Boolean)].collect().toSet
    val batch = LanguageModel.ccnetPipelinePerLang(docs, maxVocab = 12)
      .as[(String, Long, Long, String, Boolean)].collect().toSet
    assert(narrow == batch && narrow.nonEmpty,
      "the frozen face must be row-identical on the fit corpus")
    // a novel arrival in a FIT language scores through the smoothing
    // floor (unseen bigrams → c_uv = 0) instead of erroring, and still
    // lands in a bucket against the frozen bounds
    val novel = Seq((100L, "the platypus wombat the")).toDF("doc_id", "text")
    val n1 = LanguageModel.ccnetKeepNarrow(novel, model)
      .as[(String, Long, Long, String, Boolean)].collect().toSeq
    assert(n1.map(_._2) == Seq(100L) && n1.head._1 == "en")
    // an arrival in a language the fit never saw is DROPPED (no model,
    // no bounds — the same low-confidence cut as und), as is und itself
    val fr = Seq((101L, "le la les est dans"), (102L, "qqq ppp ooo"))
      .toDF("doc_id", "text")
    assert(LanguageModel.ccnetKeepNarrow(fr, model).count() == 0)
    // the size gate fires LOUD
    val e = intercept[IllegalArgumentException] {
      LanguageModel.fitCcnet(docs, maxVocab = 12, maxModelKeys = 3L)
    }
    assert(e.getMessage.contains("maxModelKeys"))
  }
}
