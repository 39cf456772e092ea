package graft

import graft.streaming.StreamingCuration
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.scalatest.funsuite.AnyFunSuite

class StreamingCurationSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark

  private def t(ms: Long) = new java.sql.Timestamp(ms)

  private val decomposed = "café" // e + combining acute
  private val precomposed = "café" // é, NFC form

  /** ≥ minTokens, all words distinct and ≥ 4 chars, so every quality
    * rule (length, repetition ratios, short-words) passes.
    */
  private def longDoc(stem: String): String =
    (1 to 40).map(i => s"$stem$i token$i").mkString(" ")

  test("streaming pipeline: normalize, gate, dedup, decontaminate — end to end") {
    val s = spark
    import s.implicits._
    implicit val sqlCtx = s.sqlContext
    val evalDocs = Seq((100L, longDoc("evalsecret")))
      .toDF("doc_id", "text")
    val input = MemoryStream[(Long, java.sql.Timestamp, String)]
    val out = StreamingCuration.curate(
      input.toDF().toDF("doc_id", "ts", "text"), evalDocs,
      // fpp tightened: at the default 1e-3 a ~100-shingle clean doc has
      // ~10% deterministic odds of a Bloom false positive for a given
      // eval set, which would (correctly, one-sidedly) drop it and flake
      // the assertion
      eventTime = "ts", watermarkDelay = "10 minutes", minTokens = 30,
      fpp = 1e-9)
    val q = out.writeStream.format("memory").queryName("scur_out")
      .outputMode("append").start()
    // batch 1: a clean doc spelled with the DECOMPOSED e+◌́ (must
    // normalize), a too-short doc, and a contaminated doc quoting the
    // eval corpus wholesale
    input.addData(
      (1L, t(1000), longDoc(decomposed)),
      (2L, t(2000), "too short"),
      (3L, t(3000), longDoc("evalsecret")))
    q.processAllAvailable()
    // batch 2: doc 1 again but PRECOMPOSED (equal only after NFC — the
    // dedup stage must key on the normalized text) and a fresh clean doc
    input.addData(
      (4L, t(4000), longDoc(precomposed)),
      (5L, t(5000), longDoc("fresh")))
    q.processAllAvailable()
    q.stop()
    val survivors = s.table("scur_out")
      .select($"doc_id", $"text", $"n_tokens").as[(Long, String, Long)].collect()
    assert(survivors.map(_._1).toSet == Set(1L, 5L),
      s"expected docs 1 and 5 to survive, got ${survivors.map(_._1).toSet}: " +
        "2 fails the gate, 3 is contaminated, 4 duplicates 1 after NFC")
    val doc1 = survivors.find(_._1 == 1L).get
    assert(doc1._2.contains(precomposed + "1"),
      "NFC normalization should precompose e+combining-acute")
    assert(doc1._3 >= 30L, "surviving rows carry their token count")
  }

  test("whitespace-variant duplicate collapses to the first arrival") {
    val s = spark
    import s.implicits._
    implicit val sqlCtx = s.sqlContext
    val evalDocs = Seq((100L, longDoc("unrelated"))).toDF("doc_id", "text")
    val input = MemoryStream[(Long, java.sql.Timestamp, String)]
    val out = StreamingCuration.curate(
      input.toDF().toDF("doc_id", "ts", "text"), evalDocs,
      // fpp tightened: at the default 1e-3 a ~100-shingle clean doc has
      // ~10% deterministic odds of a Bloom false positive for a given
      // eval set, which would (correctly, one-sidedly) drop it and flake
      // the assertion
      eventTime = "ts", watermarkDelay = "10 minutes", minTokens = 30,
      fpp = 1e-9)
    val q = out.writeStream.format("memory").queryName("scur_norm")
      .outputMode("append").start()
    // the same document with doubled whitespace: equal only after the
    // whitespace collapse, so surviving = normalization runs before dedup
    input.addData(
      (1L, t(1000), longDoc("plain")),
      (2L, t(2000), longDoc("plain").replace(" ", "  ")))
    q.processAllAvailable()
    q.stop()
    val survivors = s.table("scur_norm").select($"doc_id")
      .as[Long].collect().toSet
    assert(survivors == Set(1L),
      s"normalized spellings must dedup to the first arrival, got $survivors")
  }

  test("stateless classifier gate on a stream: map-literal spelling scores batch-identically, append mode") {
    val s = spark
    import s.implicits._
    implicit val sqlCtx = s.sqlContext
    import graft.operators.Relevance
    val nb = 4096
    val wm = Relevance.weightsAsMap(Relevance.deterministicWeights(s, nb))
    val rows = Seq(
      (1L, t(1000), "alpha beta gamma delta"),
      (2L, t(2000), "omega psi chi"),
      (3L, t(3000), ""))
    val input = MemoryStream[(Long, java.sql.Timestamp, String)]
    // stateless projection → append output mode works with NO watermark:
    // the proof this is the streaming spelling (the join spelling's
    // groupBy(doc_id) would demand Update/Complete + state)
    val out = Relevance.hashClassifierScoreNarrow(
      input.toDF().toDF("doc_id", "ts", "text"), wm, numBuckets = nb)
    val q = out.writeStream.format("memory").queryName("scur_clf")
      .outputMode("append").start()
    input.addData(rows: _*)
    q.processAllAvailable()
    q.stop()
    val streamed = s.table("scur_clf")
      .select($"doc_id", $"n_tokens", $"score", $"keep")
      .as[(Long, Long, Long, Boolean)].collect().toSeq.sortBy(_._1)
    val batch = Relevance.hashClassifierScore(
        rows.toDF("doc_id", "ts", "text"),
        Relevance.deterministicWeights(s, nb), numBuckets = nb)
      .as[(Long, Long, Long, Boolean)].collect().toSeq.sortBy(_._1)
    assert(streamed == batch)
  }

  test("stateless BPE segmentation on a stream: trained merges apply batch-identically, append mode") {
    val s = spark
    import s.implicits._
    implicit val sqlCtx = s.sqlContext
    import graft.operators.Bpe
    // train on a reference corpus (batch), segment an unbounded stream
    // with the frozen merge table — narrow folds, no state
    val fitCorpus = Seq((100L, "banana bandana banana cabana"))
      .toDF("doc_id", "text")
    val merges = Bpe.mergePairs(Bpe.trainMerges(fitCorpus, 4))
    val rows = Seq(
      (1L, t(1000), "banana cabana"),
      (2L, t(2000), "unrelated words"),
      (3L, t(3000), ""))
    val input = MemoryStream[(Long, java.sql.Timestamp, String)]
    val out = Bpe.segmentStats(input.toDF().toDF("doc_id", "ts", "text"), merges)
    val q = out.writeStream.format("memory").queryName("scur_bpe")
      .outputMode("append").start()
    input.addData(rows: _*)
    q.processAllAvailable()
    q.stop()
    val streamed = s.table("scur_bpe")
      .as[(Long, Long, Long)].collect().toSeq.sortBy(_._1)
    val batch = Bpe.segmentStats(rows.toDF("doc_id", "ts", "text"), merges)
      .as[(Long, Long, Long)].collect().toSeq.sortBy(_._1)
    assert(streamed == batch)
    val byId = streamed.map(r => r._1 -> r).toMap
    assert(byId(1L)._3 < "banana cabana".count(_ != ' ')) // merges bind
    assert(byId(3L) == ((3L, 0L, 0L)))
  }

  test("stateless tokenize-to-ids on a stream: frozen merges + frozen vocab, batch parity, append mode") {
    val s = spark
    import s.implicits._
    implicit val sqlCtx = s.sqlContext
    import graft.operators.Bpe
    // the production shape: train merges + freeze the vocabulary on a
    // reference corpus (batch), then tokenize an unbounded stream into
    // ids — one reference-object expression + posexplode + a
    // stream-static broadcast dictionary join; no state anywhere
    val fitCorpus = Seq((100L, "banana bandana banana cabana banana"))
      .toDF("doc_id", "text")
    val merges = Bpe.mergePairs(Bpe.trainMerges(fitCorpus, 4))
    val vocab = Bpe.vocabulary(Bpe.encodeTokens(fitCorpus, merges))
    val rows = Seq(
      (1L, t(1000), "banana cabana"),
      (2L, t(2000), "bandana banana bandana"),
      (3L, t(3000), ""))
    val input = MemoryStream[(Long, java.sql.Timestamp, String)]
    val out = Bpe.tokenIds(
      Bpe.encodeTokens(input.toDF().toDF("doc_id", "ts", "text"), merges), vocab)
    val q = out.writeStream.format("memory").queryName("scur_tokids")
      .outputMode("append").start()
    input.addData(rows: _*)
    q.processAllAvailable()
    q.stop()
    val streamed = s.table("scur_tokids")
      .as[(Long, Int, Long)].collect().toSeq.sortBy(r => (r._1, r._2))
    val batch = Bpe.tokenIds(
      Bpe.encodeTokens(rows.toDF("doc_id", "ts", "text"), merges), vocab)
      .as[(Long, Int, Long)].collect().toSeq.sortBy(r => (r._1, r._2))
    assert(streamed == batch)
    assert(streamed.exists(_._1 == 1L) && !streamed.exists(_._1 == 3L))
  }

  test("stateless unigram Viterbi encode on a stream: frozen vocab, batch parity, append mode") {
    val s = spark
    import s.implicits._
    implicit val sqlCtx = s.sqlContext
    import graft.operators.Unigram
    // the unigram production shape: seed + freeze the scored vocabulary
    // on a reference corpus (batch), then Viterbi-segment an unbounded
    // stream — one reference-object expression + posexplode, no state,
    // so append mode is trivially exact
    val fitCorpus = Seq((100L, "banana bandana banana cabana banana"))
      .toDF("doc_id", "text")
    val (pieces, btot) = Unigram.vocabModel(Unigram.seedVocab(fitCorpus, 3, 10))
    val rows = Seq(
      (1L, t(1000), "banana cabana"),
      (2L, t(2000), "bandana xyz"), // xyz: UNK single-char fallback binds
      (3L, t(3000), ""))
    val input = MemoryStream[(Long, java.sql.Timestamp, String)]
    val out = Unigram.encodePieces(
      input.toDF().toDF("doc_id", "ts", "text"), pieces, btot)
    val q = out.writeStream.format("memory").queryName("scur_unipieces")
      .outputMode("append").start()
    input.addData(rows: _*)
    q.processAllAvailable()
    q.stop()
    val streamed = s.table("scur_unipieces")
      .as[(Long, Int, String)].collect().toSeq.sortBy(r => (r._1, r._2))
    val batch = Unigram.encodePieces(
      rows.toDF("doc_id", "ts", "text"), pieces, btot)
      .as[(Long, Int, String)].collect().toSeq.sortBy(r => (r._1, r._2))
    assert(streamed == batch)
    assert(streamed.exists(_._1 == 1L) && !streamed.exists(_._1 == 3L))
    // the multi-char pieces the fit corpus trained actually bind on-stream
    assert(streamed.exists(r => r._1 == 1L && r._3.length > 1))
  }

  test("stateless DSIR importance gate on a stream: frozen fit scores batch-identically, append mode") {
    val s = spark
    import s.implicits._
    implicit val sqlCtx = s.sqlContext
    import graft.operators.Importance
    import org.apache.spark.sql.functions.col
    // fit on a reference corpus (batch), then score an unbounded stream
    // with the frozen distributions — the DSIR deployment shape
    val fitCorpus = Seq(
      (100L, "alpha beta gamma alpha", true),
      (101L, "alpha gamma beta", true),
      (102L, "delta epsilon zeta", false),
      (103L, "epsilon zeta delta delta", false)).toDF("doc_id", "text", "is_tgt")
    val (ct, cr, tott, totr) = Importance.fitCounts(fitCorpus, col("is_tgt"), numBuckets = 512)
    val rows = Seq(
      (1L, t(1000), "alpha beta gamma"),
      (2L, t(2000), "delta epsilon zeta"),
      (3L, t(3000), "omega psi"), // vocabulary the fit never saw
      (4L, t(4000), ""))
    val input = MemoryStream[(Long, java.sql.Timestamp, String)]
    val out = Importance.importanceScoreNarrow(
      input.toDF().toDF("doc_id", "ts", "text"), ct, cr, tott, totr, numBuckets = 512)
    val q = out.writeStream.format("memory").queryName("scur_dsir")
      .outputMode("append").start()
    input.addData(rows: _*)
    q.processAllAvailable()
    q.stop()
    val streamed = s.table("scur_dsir")
      .select($"doc_id", $"n_feats", $"score_q", $"keep")
      .as[(Long, Long, Long, Boolean)].collect().toSeq.sortBy(_._1)
    val batch = Importance.importanceScoreNarrow(
        rows.toDF("doc_id", "ts", "text"), ct, cr, tott, totr, numBuckets = 512)
      .select($"doc_id", $"n_feats", $"score_q", $"keep")
      .as[(Long, Long, Long, Boolean)].collect().toSeq.sortBy(_._1)
    assert(streamed == batch)
    val byId = streamed.map(r => r._1 -> r).toMap
    assert(byId(1L)._4 && !byId(2L)._4) // target dialect kept, off-dialect dropped
    assert(byId(4L) == ((4L, 0L, 0L, false)))
  }
}
