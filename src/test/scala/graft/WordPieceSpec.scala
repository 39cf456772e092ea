package graft

import graft.functions.{TextFunctions, WordPieceEncode, WordPieceOps}
import graft.operators.{Bpe, WordPiece}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The WordPiece tokenizer family ([[graft.operators.WordPiece]],
  * [[graft.functions.WordPieceEncode]]): the likelihood-score argmax
  * pinned on a corpus where score-rank and raw-count-rank pick
  * DIFFERENT pairs (so the family-defining criterion BINDS — a corpus
  * where they agree would gate only the BPE behavior), the greedy
  * longest-match apply rule with its whole-word [UNK] collapse, BERT
  * basic tokenization (both spellings agree by shared pattern), and the
  * hash-deterministic MLM mask's branch partition. The oracle gates
  * (`q_wp_*`, `q_mlm_mask`) prove cross-engine agreement; this spec
  * pins the semantics the oracle could satisfy vacuously.
  */
class WordPieceSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private def docs(texts: Seq[String]) =
    texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }.toDF("doc_id", "text")

  test("basic tokenization: lowercase, punct split, CJK split, kana kept") {
    assert(WordPieceOps.basicTokens("Hello, World!").toSeq ==
      Seq("hello", ",", "world", "!"))
    assert(WordPieceOps.basicTokens("anti-aliasing (Wow!) 3.14").toSeq ==
      Seq("anti", "-", "aliasing", "(", "wow", "!", ")", "3", ".", "14"))
    // ideographs split out one by one; the kana run stays one token
    assert(WordPieceOps.basicTokens("日本語テキスト").toSeq ==
      Seq("日", "本", "語", "テキスト"))
    assert(WordPieceOps.basicTokens("a\tb\nc  d").toSeq == Seq("a", "b", "c", "d"))
  }

  test("the Column spelling agrees with the Scala twin (shared patterns)") {
    val samples = Seq("Hello, World!", "anti-aliasing (Wow!) 3.14",
      "日本語テキスト 机器学习", "Zürich naïve don't", "  \t\n ", "x")
    val viaCol = docs(samples)
      .select(col("doc_id"), TextFunctions.bertTokens(col("text")).as("w"))
      .orderBy("doc_id").collect().map(_.getSeq[String](1).toSeq)
    val viaScala = samples.map(WordPieceOps.basicTokens(_).toSeq)
    assert(viaCol.toSeq == viaScala)
  }

  test("training argmax is by likelihood score, not raw pair count") {
    // pair (a,##b): count 10, marginals a=40 (10 'ab' + 30 'a'), ##b=10
    //   → score 10/400 = 0.025
    // pair (c,##d): count 9, marginals c=9, ##d=9 → score 9/81 ≈ 0.111
    // raw-count argmax would pick (a,##b); WordPiece must pick (c,##d)
    val corpus = docs(Seq.fill(10)("ab") ++ Seq.fill(30)("a") ++
      Seq.fill(30)("b") ++ Seq.fill(9)("cd"))
    val m = WordPiece.trainWordPiece(corpus, 1).collect().head
    assert(m.getAs[String]("left") == "c")
    assert(m.getAs[String]("right") == "##d")
    assert(m.getAs[String]("fused") == "cd")
    assert(m.getAs[Long]("pair_count") == 9L)
    assert(m.getAs[Long]("score_q") == 9L * WordPiece.ScoreScale / 81L)
  }

  test("fusing strips the continuation prefix, rank order continues") {
    // 'abc' x 4: first merge fuses the best-scoring adjacent pair; the
    // second round must see the fused symbol as ONE unit
    val corpus = docs(Seq.fill(4)("abc"))
    val t = WordPiece.trainWordPiece(corpus, 2).orderBy("rank").collect()
    // round 1: (a,##b) vs (##b,##c) tie on count 4 and marginals 4·4 →
    // score ties at 4e12/16; (##b,##c) < (a,##b) lexicographically? '#'
    // < 'a', so ties break to (##b,##c) → fused ##bc
    assert(t(0).getAs[String]("fused") == "##bc")
    // round 2: only (a,##bc) remains
    assert(t(1).getAs[String]("left") == "a")
    assert(t(1).getAs[String]("right") == "##bc")
    assert(t(1).getAs[String]("fused") == "abc")
  }

  test("greedy longest-match-first, continuation prefix, whole-word [UNK]") {
    val vocab = Seq("un", "##able", "u", "##n", "##a", "##b", "##l", "##e", "a")
    val m = WordPieceOps.buildModel(vocab, "[UNK]")
    def enc(w: String): Seq[String] =
      WordPieceOps.encode(w, m).array.toSeq.map(_.toString)
    // longest match wins over char-by-char
    assert(enc("unable") == Seq("un", "##able"))
    // continuation REQUIRES the ## spelling: 'a' matches word-initially,
    // then 'u' has no '##u'/'##un' piece → the whole word collapses
    assert(enc("aun") == Seq("[UNK]"))
    // no match at position 0 → UNK
    assert(enc("xyz") == Seq("[UNK]"))
    // a partial match then a dead end discards the partial pieces
    assert(enc("unx") == Seq("[UNK]"))
    // multiple words flatten in order; basic tokenization applies
    assert(enc("unable, a!") == Seq("un", "##able", "[UNK]", "a", "[UNK]"))
  }

  test("encodeTokens through codegen: stream positions and UNK binding") {
    val corpus = docs(Seq("abab ab", "zq"))
    val trained = WordPiece.trainWordPiece(corpus, 1)
    val vocab = WordPiece.vocabOf(corpus, trained)
    // alphabet holds every start/continuation char symbol + the fused
    assert(vocab.contains("a") && vocab.contains("##b"))
    val out = WordPiece.encodeTokens(docs(Seq("ab ba", "née")), vocab)
      .orderBy("doc_id", "pos").collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getString(2)))
    // 'née' has chars outside the training alphabet → one [UNK]
    val d1 = out.filter(_._1 == 1L).map(_._3)
    assert(d1.toSeq == Seq("[UNK]"))
    // 'ab' encodes; 'ba' collapses — 'b' exists only as the
    // CONTINUATION ##b, never word-initially (the start-vs-continuation
    // asymmetry the ## prefix creates)
    val d0 = out.filter(_._1 == 0L).map(_._3)
    assert(d0.toSeq == Seq("a", "##b", "[UNK]"))
    assert(out.filter(_._1 == 0L).map(_._2).toSeq == Seq(1, 2, 3))
  }

  test("vocabOf dedups while keeping alphabet + fused pieces") {
    val corpus = docs(Seq.fill(3)("ab"))
    val trained = WordPiece.trainWordPiece(corpus, 1)
    val vocab = WordPiece.vocabOf(corpus, trained)
    assert(vocab.distinct == vocab)
    assert(vocab.contains("ab")) // the fused piece
    assert(vocab.contains("a") && vocab.contains("##b"))
  }

  test("unkBySource counts whole-word UNKs per slice") {
    val corpus = docs(Seq.fill(3)("ab cd ab"))
    val vocab = WordPiece.vocabOf(corpus, WordPiece.trainWordPiece(corpus, 1))
    val scored = Seq((0L, "ab øx", "s1"), (1L, "ab ab", "s2"))
      .toDF("doc_id", "text", "source")
    val rep = WordPiece.unkBySource(scored, vocab)
      .orderBy("source").collect()
    assert(rep(0).getAs[Long]("n_unk") == 1L)   // øx → [UNK]
    assert(rep(1).getAs[Long]("n_unk") == 0L)
    assert(rep(0).getAs[Long]("unk_ppm") ==
      1000000L * 1 / rep(0).getAs[Long]("n_tokens"))
  }

  test("mlmMask: branch partition, label contract, determinism, all branches bind") {
    // a synthetic stream big enough that every hash branch occurs
    val stream = (0 until 2000).map(i =>
      (i.toLong / 50, (i % 50) + 1, s"t${i % 97}")).toDF("doc_id", "pos", "token")
    val vocab = Bpe.vocabulary(stream)
    val out = Bpe.mlmMask(stream, vocab).collect()
    assert(out.length == 2000)
    val vset = vocab.select("token").collect().map(_.getString(0)).toSet
    var nMask = 0; var nRand = 0; var nKeep = 0
    out.foreach { r =>
      val (tok, in, label, masked) = (s"t${(r.getLong(0) * 50 + r.getInt(1) - 1) % 97}",
        r.getString(2), if (r.isNullAt(3)) null else r.getString(3), r.getBoolean(4))
      if (!masked) { assert(label == null) }
      else {
        assert(label != null)
        if (in == "[MASK]") nMask += 1
        else if (in == label) nKeep += 1
        else { assert(vset.contains(in)); nRand += 1 }
      }
    }
    val nSel = nMask + nRand + nKeep
    // ~15% selected, 80/10/10 within — loose bounds, the draws are
    // hash-deterministic so this can never flake
    assert(nSel > 150 && nSel < 450, s"selected $nSel of 2000")
    assert(nMask > nRand && nMask > nKeep)
    assert(nRand > 0 && nKeep > 0)
    // determinism: a re-run is bit-identical
    val again = Bpe.mlmMask(stream, vocab).collect()
    assert(out.map(_.toString).sorted.toSeq == again.map(_.toString).sorted.toSeq)
  }

  test("batched training: batchSize=1 degenerates to the sequential trainer; batches are symbol-disjoint") {
    val corpus = docs(Seq.fill(10)("ab") ++ Seq.fill(30)("a") ++
      Seq.fill(30)("b") ++ Seq.fill(9)("cd") ++ Seq.fill(4)("abc"))
    val seqT = WordPiece.trainWordPiece(corpus, 4).orderBy("rank").collect()
      .map(r => (r.getAs[String]("left"), r.getAs[String]("right"),
        r.getAs[Long]("pair_count"), r.getAs[Long]("score_q"))).toSeq
    val b1 = WordPiece.trainWordPieceBatched(corpus, rounds = 4, batchSize = 1)
      .orderBy("rank").collect()
      .map(r => (r.getAs[String]("left"), r.getAs[String]("right"),
        r.getAs[Long]("pair_count"), r.getAs[Long]("score_q"))).toSeq
    assert(b1 == seqT)
    // a wide batch selects pairwise symbol-disjoint pairs
    val b = WordPiece.trainWordPieceBatched(corpus, rounds = 1, batchSize = 8)
      .collect().map(r => (r.getAs[String]("left"), r.getAs[String]("right"),
        r.getAs[String]("fused")))
    val used = scala.collection.mutable.Set.empty[String]
    b.foreach { case (l, r, f) =>
      assert(!used(l) && !used(r) && !used(f), s"($l,$r,$f) overlaps $used")
      used ++= Seq(l, r, f)
    }
    assert(b.nonEmpty)
  }

  test("bertExamples: [CLS] A [SEP] B [SEP] layout, segment ids, specials never masked") {
    val corpus = docs(Seq.fill(5)("ab cd ab cd"))
    val vocab = WordPiece.vocabOf(corpus, WordPiece.trainWordPiece(corpus, 1))
    val pairs = Seq((0L, 1, "ab cd", "cd ab", 0L, 2L, true))
      .toDF("doc_id", "sent_idx", "a", "b", "b_doc_id", "b_sent_idx", "is_next")
    val ex = WordPiece.bertExamples(pairs, vocab).orderBy("pos").collect()
    val toks = ex.map(_.getAs[String]("token")).toSeq
    // trained merge fuses (a,##b) -> 'ab'; 'cd' stays [c, ##d]
    assert(toks == Seq("[CLS]", "ab", "c", "##d", "[SEP]", "c", "##d", "ab", "[SEP]"))
    val types = ex.map(_.getAs[Long]("token_type")).toSeq
    assert(types == Seq(0L, 0L, 0L, 0L, 0L, 1L, 1L, 1L, 1L))
    assert(ex.map(_.getAs[Int]("pos")).toSeq == (1 to 9))
    assert(ex.forall(_.getAs[Boolean]("is_next")))
    // special-aware masking: a special-only stream selects NOTHING
    val stSep = (0 until 500).map(i => (i.toLong, 1, "[SEP]"))
      .toDF("doc_id", "pos", "token")
    val masked = Bpe.mlmMask(stSep, Bpe.vocabulary(stSep), specials = Seq("[SEP]"))
      .collect()
    assert(masked.length == 500 && masked.forall(!_.getAs[Boolean]("masked")))
    // and without the exclusion the same stream DOES select (the guard binds)
    val unguarded = Bpe.mlmMask(stSep, Bpe.vocabulary(stSep)).collect()
    assert(unguarded.exists(_.getAs[Boolean]("masked")))
  }

  test("wwmMask: word-uniform selection (all pieces or none), per-position branches, determinism") {
    // stream of two-piece words: (head, ##cont) pairs
    val stream = (0 until 600).map { i =>
      val tok = if (i % 2 == 0) s"w${(i / 2) % 37}" else "##x"
      (i.toLong / 60, (i % 60) + 1, tok)
    }.toDF("doc_id", "pos", "token")
    val vocab = Bpe.vocabulary(stream)
    val out = WordPiece.wwmMask(stream, vocab)
      .orderBy("doc_id", "pos").collect()
    assert(out.length == 600)
    // word-uniformity: within each (head, ##cont) pair the masked flag
    // is IDENTICAL — the word-level selection contract
    out.grouped(2).foreach { pair =>
      assert(pair(0).getAs[Boolean]("masked") == pair(1).getAs[Boolean]("masked"),
        s"pieces of one word diverged: ${pair.toSeq}")
    }
    val nSel = out.count(_.getAs[Boolean]("masked"))
    assert(nSel > 30 && nSel < 240, s"selected $nSel of 600")
    // label contract + all branches reachable across the selected set
    val sel = out.filter(_.getAs[Boolean]("masked"))
    assert(sel.forall(r => r.getAs[String]("label") != null))
    assert(sel.exists(_.getAs[String]("input_token") == "[MASK]"))
    // determinism
    val again = WordPiece.wwmMask(stream, vocab).orderBy("doc_id", "pos").collect()
    assert(out.map(_.toString).toSeq == again.map(_.toString).toSeq)
  }
}
