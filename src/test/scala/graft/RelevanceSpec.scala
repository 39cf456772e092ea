package graft

import graft.operators.{Relevance, TextDedup}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class RelevanceSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  val sf = "/root/testdata/sf0.001"
  lazy val docs = TextDedup.documents(spark, sf).cache()

  test("bm25Quantized matches a hand-rolled reference on a tiny corpus") {
    val tiny = Seq((1L, "a a b"), (2L, "a c"), (3L, "c c c d")).toDF("doc_id", "text")
    val got = Relevance.bm25Quantized(tiny, query = Seq("a", "d"))
      .orderBy($"doc_id").as[(Long, Long, Long)].collect().toSeq

    // reference: same integer formulas, computed independently
    val corpus = Map(1L -> Seq("a", "a", "b"), 2L -> Seq("a", "c"), 3L -> Seq("c", "c", "c", "d"))
    val n = corpus.size.toLong
    val tt = corpus.values.map(_.size.toLong).sum
    def dfOf(t: String) = corpus.values.count(_.contains(t)).toLong
    def contrib(term: String, doc: Long): Option[Long] = {
      val tf = corpus(doc).count(_ == term).toLong
      if (tf == 0) None else {
        val dl = corpus(doc).size.toLong
        val dfd = dfOf(term)
        val idfQ = (10000L * (2 * n - 2 * dfd + 1)) / (2 * dfd + 1)
        Some((idfQ * 22 * tt * tf) / (10 * tt * tf + 3 * tt + 9 * dl * n))
      }
    }
    val want = corpus.keys.toSeq.sorted.flatMap { d =>
      val cs = Seq("a", "d").flatMap(contrib(_, d))
      if (cs.isEmpty) None else Some((d, cs.sum, cs.size.toLong))
    }
    assert(got == want)
    // doc 2 matches only 'a'; doc 3 matches only 'd' (rare → bigger idf)
    assert(got.map(_._1) == Seq(1L, 2L, 3L))
  }

  test("query terms absent from the corpus contribute nothing and match no rows") {
    val tiny = Seq((1L, "a b"), (2L, "b c")).toDF("doc_id", "text")
    assert(Relevance.bm25Quantized(tiny, query = Seq("zzz")).count() == 0)
    val withAbsent = Relevance.bm25Quantized(tiny, query = Seq("a", "zzz"))
      .as[(Long, Long, Long)].collect().toSet
    val without = Relevance.bm25Quantized(tiny, query = Seq("a"))
      .as[(Long, Long, Long)].collect().toSet
    assert(withAbsent == without)
  }

  test("double-precision bm25 agrees with the quantized twin on the corpus top document") {
    val query = Seq("scan", "merge", "window", "vector")
    val qTop = Relevance.bm25Quantized(docs, query)
      .orderBy($"score_q".desc, $"doc_id").select($"doc_id").as[Long].head()
    val dTop = Relevance.bm25(docs, query)
      .orderBy($"score".desc, $"doc_id").select($"doc_id").as[Long].head()
    assert(qTop == dTop)
  }

  test("tfidfTopTerms: at most perDoc rows per doc, rank dense from 1, rare beats common at equal tf") {
    val out = Relevance.tfidfTopTerms(docs, perDoc = 3).cache()
    val per = out.groupBy($"doc_id").agg(count(lit(1)).as("c"),
      min($"rnk").as("lo"), max($"rnk").as("hi"))
    assert(per.filter($"c" > 3 || $"lo" =!= 1 || $"hi" =!= $"c").count() == 0)
    // scores are non-increasing with rank within a doc
    assert(out.as("a").join(out.as("b"),
        $"a.doc_id" === $"b.doc_id" && $"a.rnk" < $"b.rnk" &&
        $"a.tfidf_q" < $"b.tfidf_q").count() == 0)
    // rare-vs-common: term with smaller df gets the larger quantized idf
    val tiny = Seq((1L, "rare common"), (2L, "common")).toDF("doc_id", "text")
    val top = Relevance.tfidfTopTerms(tiny, perDoc = 1)
      .filter($"doc_id" === 1).select($"term").as[String].head()
    assert(top == "rare")
  }

  test("hashClassifierScore: broadcast-join spelling ≡ the narrow HOF fold on the corpus") {
    import graft.functions.TextFunctions
    val nb = 4096
    val got = Relevance.hashClassifierScore(docs,
        Relevance.deterministicWeights(spark, nb), numBuckets = nb)
      .orderBy($"doc_id").as[(Long, Long, Long, Boolean)].collect().toSeq
    // independent spelling: the weight formula inlined into one narrow
    // aggregate over the token array — no join, no explode
    val narrow = docs.select($"doc_id",
        size(TextFunctions.tokens($"text")).cast("long").as("n_tokens"),
        aggregate(TextFunctions.tokens($"text"), lit(0L), (acc, t) =>
          acc + (((TextFunctions.rollingHash(t) * 2654435761L) % nb + 17L) *
            2654435761L) % 2003L - 1001L).as("score"))
      .select($"doc_id", $"n_tokens", $"score", ($"score" > 0).as("keep"))
      .orderBy($"doc_id").as[(Long, Long, Long, Boolean)].collect().toSeq
    assert(got == narrow)
    assert(got.exists(_._4) && got.exists(!_._4), "both verdicts should occur")
  }

  test("hashClassifierScoreNarrow (map-literal streaming spelling) ≡ join spelling on the corpus") {
    val nb = 4096
    val wdf = Relevance.deterministicWeights(spark, nb)
    val viaJoin = Relevance.hashClassifierScore(docs, wdf, numBuckets = nb)
      .orderBy($"doc_id").as[(Long, Long, Long, Boolean)].collect().toSeq
    val viaMap = Relevance.hashClassifierScoreNarrow(docs,
        Relevance.weightsAsMap(wdf), numBuckets = nb)
      .select($"doc_id", $"n_tokens", $"score", $"keep")
      .orderBy($"doc_id").as[(Long, Long, Long, Boolean)].collect().toSeq
    assert(viaMap == viaJoin)
    // the narrow spelling appends: input columns survive for pipelines
    val cols = Relevance.hashClassifierScoreNarrow(docs,
      Map(0L -> 1L), numBuckets = nb).columns.toSeq
    assert(cols.take(docs.columns.length) == docs.columns.toSeq)
  }

  test("hashClassifierScore: tokenless docs survive at score 0; absent buckets weigh 0") {
    val tiny = Seq((1L, "alpha beta"), (2L, "   "), (3L, "")).toDF("doc_id", "text")
    val w = Relevance.deterministicWeights(spark, 64)
    val full = Relevance.hashClassifierScore(tiny, w, numBuckets = 64)
      .orderBy($"doc_id").as[(Long, Long, Long, Boolean)].collect().toSeq
    assert(full.map(_._1) == Seq(1L, 2L, 3L), "every doc appears")
    assert(full.filter(_._1 >= 2L).forall(r => r._2 == 0L && r._3 == 0L && !r._4))
    // a sparse (pruned) model: empty weight table → all scores 0, no rows lost
    val empty = Relevance.hashClassifierScore(tiny,
        w.filter($"bucket" < 0), numBuckets = 64)
      .orderBy($"doc_id").as[(Long, Long, Long, Boolean)].collect().toSeq
    assert(empty.map(r => (r._1, r._3)) == Seq((1L, 0L), (2L, 0L), (3L, 0L)))
    assert(empty.head._2 == 2L, "token counts are model-independent")
  }

  test("bordaEnsemble: rank sum over (s DESC, doc_id); missing signals rank last") {
    val base = Seq((1L, "a"), (2L, "b"), (3L, "c"), (4L, "d")).toDF("doc_id", "text")
    val sigA = Seq((1L, 30L), (2L, 10L), (3L, 30L), (4L, 20L)).toDF("doc_id", "s")
    val sigB = Seq((1L, 5L), (3L, 7L)).toDF("doc_id", "s") // docs 2, 4 missing
    val got = Relevance.bordaEnsemble(base, Seq("a" -> sigA, "b" -> sigB))
      .orderBy($"doc_id").as[(Long, Long, Long, Long)].collect().toSeq
    // sigA ranks: 1→1 (tie with 3, id wins), 3→2, 4→3, 2→4
    // sigB ranks: 3→1, 1→2, then missing by id: 2→3, 4→4
    val want = Seq(
      (1L, 1L, 2L, 3L),
      (2L, 4L, 3L, 7L),
      (3L, 2L, 1L, 3L),
      (4L, 3L, 4L, 7L))
    assert(got == want)
    // borda is partitioning-independent (the prefix-sum rank is total-ordered)
    val re = Relevance.bordaEnsemble(base.repartition(5),
        Seq("a" -> sigA.repartition(3), "b" -> sigB))
      .orderBy($"doc_id").as[(Long, Long, Long, Long)].collect().toSeq
    assert(re == want)
    // duplicate signal names are a caller bug, loudly
    intercept[IllegalArgumentException](
      Relevance.bordaEnsemble(base, Seq("x" -> sigA, "x" -> sigB)))
  }

  test("streaming classifier faces: literal plan face ≡ broadcast-join foreachBatch face, row for row") {
    // the round-15 verdict's escape hatch: ABOVE MaxLiteralBuckets the
    // model runs as the join spelling inside foreachBatch instead of a
    // re-planned map literal. Force both faces over the SAME fixture
    // through REAL multi-micro-batch harness runs and compare rows.
    val weights = Relevance.deterministicWeights(spark, 4096)
    val cols = Seq(col("doc_id"), col("n_tokens"), col("score"), col("keep"))

    val litFace = Relevance.hashClassifierStreamingFace(weights, 4096,
      maxLiteralBuckets = 4096) // at the threshold: literal
    assert(litFace.isLeft)
    val joinFace = Relevance.hashClassifierStreamingFace(weights, 4096,
      maxLiteralBuckets = 0) // forced above: join-in-foreachBatch
    assert(joinFace.isRight)

    val viaLiteral = graft.streaming.FileStreamHarness.runStateless(
        spark, sf, "documents",
        st => litFace.left.toOption.get(st).select(cols: _*),
        keyCol = "doc_id")
      .as[(Long, Long, Long, Boolean)].collect().sorted.toSeq
    val viaJoin = graft.streaming.FileStreamHarness.runStateless(
        spark, sf, "documents", identity, keyCol = "doc_id",
        batchTransform = b => joinFace.toOption.get(b).select(cols: _*))
      .as[(Long, Long, Long, Boolean)].collect().sorted.toSeq
    assert(viaLiteral == viaJoin)
    assert(viaLiteral.nonEmpty, "empty corpus would make the parity vacuous")
    // both scores genuinely discriminate (not all-keep / all-drop)
    assert(viaLiteral.exists(_._4) && viaLiteral.exists(!_._4))
  }
}
