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

  /** The rolling-hash twin (TextFunctions.rollingHash's arithmetic) for
    * spec-side expectation replay.
    */
  private def rh(s: String): Long =
    s.foldLeft(0L)((acc, c) => (acc * 31 + c.toLong) % 1000000007L)

  test("trainAndVocab: one-scan vocabulary is byte-identical to vocabOf") {
    val corpus = docs(Seq.fill(10)("ab") ++ Seq.fill(30)("a") ++
      Seq.fill(30)("b") ++ Seq.fill(9)("cd") ++ Seq.fill(4)("abc"))
    val (trained, vocab) = WordPiece.trainAndVocab(corpus, 3)
    assert(vocab == WordPiece.vocabOf(corpus, trained))
    val (trainedB, vocabB) = WordPiece.trainBatchedAndVocab(corpus, 2, 2)
    assert(vocabB == WordPiece.vocabOf(corpus, trainedB))
  }

  test("bertExamples truncation: cap respected, longer-side/tie-B trim, short pairs untouched") {
    val corpus = docs(Seq.fill(5)("ab cd ef gh ij kl"))
    val vocab = WordPiece.trainAndVocab(corpus, 1)._2
    // pair 1: A = 6 pieces? 'ab' fused -> 1, others 2 each; craft long
    // sides from multi-word sentences; pair 2 is short (no truncation)
    val pairs = Seq(
      (0L, 1, "ab cd ef gh ij", "kl gh ef cd ab", 0L, 2L, true),
      (1L, 1, "ab cd", "cd ab", 1L, 2L, false))
      .toDF("doc_id", "sent_idx", "a", "b", "b_doc_id", "b_sent_idx", "is_next")
    val full = WordPiece.bertExamples(pairs, vocab)
      .orderBy("doc_id", "pos").collect()
    val lenFull = full.count(_.getAs[Long]("doc_id") == 0L)
    assert(lenFull > 12) // truncation will bind on pair 1
    val m = 12
    val ex = WordPiece.bertExamples(pairs, vocab, maxSeqLength = m)
      .orderBy("doc_id", "pos").collect()
    val p1 = ex.filter(_.getAs[Long]("doc_id") == 0L)
    val p2 = ex.filter(_.getAs[Long]("doc_id") == 1L)
    assert(p1.length == m, s"pair 1 assembled length ${p1.length} != $m")
    // the short pair is untouched
    assert(p2.map(_.getAs[String]("token")).toSeq ==
      full.filter(_.getAs[Long]("doc_id") == 1L)
        .map(_.getAs[String]("token")).toSeq)
    // layout survives truncation: exactly one [CLS], two [SEP], both
    // sides non-empty, token_type flips after the FIRST [SEP]
    val toks = p1.map(_.getAs[String]("token")).toSeq
    assert(toks.head == "[CLS]" && toks.last == "[SEP]")
    assert(toks.count(_ == "[SEP]") == 2)
    val firstSep = toks.indexOf("[SEP]")
    assert(firstSep > 1 && firstSep < toks.length - 2) // ≥1 piece per side
    val types = p1.map(_.getAs[Long]("token_type")).toSeq
    assert(types.take(firstSep + 1).forall(_ == 0L) &&
      types.drop(firstSep + 1).forall(_ == 1L))
    // the kept A-side is a CONTIGUOUS slice of the untruncated A-side
    // (front/back trimming never reorders)
    val fullA = full.filter(r => r.getAs[Long]("doc_id") == 0L &&
      r.getAs[Long]("token_type") == 0L).map(_.getAs[String]("token"))
      .drop(1).dropRight(1).toSeq
    val keptA = toks.slice(1, firstSep)
    assert(fullA.containsSlice(keptA), s"$keptA not contiguous in $fullA")
    // hash-determinism: a re-run is bit-identical
    val again = WordPiece.bertExamples(pairs, vocab, maxSeqLength = m)
      .orderBy("doc_id", "pos").collect()
    assert(ex.map(_.toString).toSeq == again.map(_.toString).toSeq)
  }

  test("mlmMask maxPerSeq: per-doc cap = min(maxPred, ceil(selPct*len/100)), overflow reverts") {
    val stream = (0 until 2000).map(i =>
      (i.toLong / 50, (i % 50) + 1, s"t${i % 97}")).toDF("doc_id", "pos", "token")
    val vocab = Bpe.vocabulary(stream)
    val capped = Bpe.mlmMask(stream, vocab, maxPerSeq = 3)
      .orderBy("doc_id", "pos").collect()
    val uncapped = Bpe.mlmMask(stream, vocab).orderBy("doc_id", "pos").collect()
    // per 50-token doc: cap = min(3, ceil(15*50/100) = 8) = 3
    capped.groupBy(_.getLong(0)).foreach { case (d, rows) =>
      assert(rows.count(_.getAs[Boolean]("masked")) <= 3, s"doc $d over cap")
    }
    // the kept positions are the lowest-(h, pos)-ranked selected ones:
    // every capped-masked position is also uncapped-masked, and its
    // input/label agree bit-for-bit (the branch draw is cap-independent)
    val unByKey = uncapped.map(r => (r.getLong(0), r.getInt(1)) -> r).toMap
    var reverted = 0
    capped.foreach { r =>
      val u = unByKey((r.getLong(0), r.getInt(1)))
      if (r.getAs[Boolean]("masked")) {
        assert(u.getAs[Boolean]("masked"))
        assert(r.getAs[String]("input_token") == u.getAs[String]("input_token"))
      } else if (u.getAs[Boolean]("masked")) {
        // capped out: reverts to the identity row
        val tok = s"t${(r.getLong(0) * 50 + r.getInt(1) - 1) % 97}"
        assert(r.getAs[String]("input_token") == tok && r.isNullAt(3))
        reverted += 1
      }
    }
    assert(reverted > 0, "the cap never bound — fixture too small")
    // a loose maxPerSeq still applies the published percentage ceiling:
    // num_to_predict = min(maxPred, ceil(15·50/100) = 8) = 8 per doc
    val loose = Bpe.mlmMask(stream, vocab, maxPerSeq = 1000)
      .orderBy("doc_id", "pos").collect()
    val byDoc = loose.groupBy(_.getLong(0))
      .map(_._2.count(_.getAs[Boolean]("masked")))
    assert(byDoc.forall(_ <= 8))
    assert(byDoc.exists(_ == 8), "the percentage ceiling never bound")
    // docs whose selection fits the ceiling are bit-identical to the
    // uncapped run
    val unSelByDoc = uncapped.groupBy(_.getLong(0))
      .map { case (d, rs) => d -> rs.count(_.getAs[Boolean]("masked")) }
    loose.zip(uncapped).foreach { case (l, u) =>
      if (unSelByDoc(l.getLong(0)) <= 8) assert(l.toString == u.toString)
    }
  }

  test("mlmMask epochSeed: per-epoch fresh masks, reproducible, branch partition intact") {
    val stream = (0 until 1500).map(i =>
      (i.toLong / 50, (i % 50) + 1, s"t${i % 89}")).toDF("doc_id", "pos", "token")
    val vocab = Bpe.vocabulary(stream)
    val e1 = Bpe.mlmMask(stream, vocab, epochSeed = Some(1))
      .orderBy("doc_id", "pos").collect()
    val e2 = Bpe.mlmMask(stream, vocab, epochSeed = Some(2))
      .orderBy("doc_id", "pos").collect()
    val e1again = Bpe.mlmMask(stream, vocab, epochSeed = Some(1))
      .orderBy("doc_id", "pos").collect()
    // same seed → identical; different seed → a different mask set
    assert(e1.map(_.toString).toSeq == e1again.map(_.toString).toSeq)
    assert(e1.map(_.getAs[Boolean]("masked")).toSeq !=
      e2.map(_.getAs[Boolean]("masked")).toSeq)
    // each epoch still selects ~15% and reaches every branch
    Seq(e1, e2).foreach { e =>
      val sel = e.filter(_.getAs[Boolean]("masked"))
      assert(sel.length > 100 && sel.length < 350, s"selected ${sel.length}")
      assert(sel.exists(_.getAs[String]("input_token") == "[MASK]"))
      assert(sel.exists(r => r.getAs[String]("input_token") == r.getAs[String]("label")))
    }
    // the seeded key is replayable: selection iff rh("e:d:p:t") % 100 < 15
    e1.foreach { r =>
      val tok = s"t${(r.getLong(0) * 50 + r.getInt(1) - 1) % 89}"
      val expect = rh(s"1:${r.getLong(0)}:${r.getInt(1)}:$tok") % 100 < 15
      assert(r.getAs[Boolean]("masked") == expect)
    }
  }

  test("wwmMask maxPerSeq: skip-continue budget scan in (hw, word_ord) order") {
    // two-piece words → np = 2 per word, 30 words per doc, len = 60
    val stream = (0 until 600).map { i =>
      val tok = if (i % 2 == 0) s"w${(i / 2) % 37}" else "##x"
      (i.toLong / 60, (i % 60) + 1, tok)
    }.toDF("doc_id", "pos", "token")
    val vocab = Bpe.vocabulary(stream)
    val cap = 5 // odd on purpose: 2-piece words leave a 1-slot remainder
    val out = WordPiece.wwmMask(stream, vocab, maxPerSeq = cap)
      .orderBy("doc_id", "pos").collect()
    // word-uniformity survives the cap
    out.grouped(2).foreach { pair =>
      assert(pair(0).getAs[Boolean]("masked") == pair(1).getAs[Boolean]("masked"))
    }
    // replay the contract per doc: selected words in (hw, word_ord)
    // order, a word that would overflow is skipped, the scan continues
    out.groupBy(_.getLong(0)).foreach { case (d, rows) =>
      val effCap = math.min(cap.toLong, (15L * rows.length + 99) / 100)
      val words = rows.grouped(2).zipWithIndex.map { case (pair, w) =>
        val wo = w + 1
        (rh(s"$d:$wo"), wo.toLong, pair)
      }.toSeq
      val selected = words.filter(_._1 % 100 < 15).sortBy(w => (w._1, w._2))
      var used = 0L
      val kept = scala.collection.mutable.Set.empty[Long]
      selected.foreach { case (_, wo, pair) =>
        if (used + pair.length <= effCap) { used += pair.length; kept += wo }
      }
      words.foreach { case (_, wo, pair) =>
        pair.foreach { r =>
          assert(r.getAs[Boolean]("masked") == kept(wo),
            s"doc $d word $wo: expected ${kept(wo)}")
        }
      }
      assert(rows.count(_.getAs[Boolean]("masked")) <= effCap)
    }
    // the skip-continue must actually skip at least once somewhere
    // (np = 2 with an odd cap guarantees a 1-slot remainder whenever
    // ≥ 3 words are selected in a doc)
    val nMaskedByDoc = out.groupBy(_.getLong(0))
      .map(_._2.count(_.getAs[Boolean]("masked")))
    assert(nMaskedByDoc.exists(_ == 4), "cap never left a remainder slot")
  }

  test("wwmMask specials: [CLS]/[SEP] words never selected") {
    val stream = (0 until 400).map { i =>
      val tok = if (i % 4 == 0) "[CLS]" else if (i % 4 == 3) "[SEP]"
        else if (i % 4 == 1) s"w${i % 23}" else "##x"
      (i.toLong / 40, (i % 40) + 1, tok)
    }.toDF("doc_id", "pos", "token")
    val vocab = Bpe.vocabulary(stream)
    val out = WordPiece.wwmMask(stream, vocab,
      specials = Seq("[CLS]", "[SEP]")).collect()
    assert(out.filter(r => r.getAs[String]("label") != null)
      .forall(r => r.getAs[String]("label") != "[CLS]" &&
        r.getAs[String]("label") != "[SEP]"))
    // the guard binds: unguarded, some special IS selected
    val unguarded = WordPiece.wwmMask(stream, vocab).collect()
    assert(unguarded.exists(r => r.getAs[String]("label") == "[CLS]" ||
      r.getAs[String]("label") == "[SEP]"))
  }

  test("detokenize: strip-##-join reconstructs basic tokens; UNK docs mismatch") {
    val corpus = docs(Seq.fill(6)("ab cd ef!"))
    val vocab = WordPiece.trainAndVocab(corpus, 1)._2
    val scored = Seq((0L, "ab cd EF! cd"), (1L, "ab øx cd"))
      .toDF("doc_id", "text")
    val out = WordPiece.detokenize(scored, vocab).orderBy("doc_id").collect()
    // multi-piece words ('cd' → [c,##d]) rejoin; punct splits as its own
    // word ('!' is in the training alphabet); case folds — exactly the
    // basic-token stream
    assert(out(0).getAs[String]("detok") == "ab cd ef ! cd")
    assert(out(0).getAs[Boolean]("matches_basic"))
    // the UNK word reconstructs literally and fails the match
    assert(out(1).getAs[String]("detok") == "ab [UNK] cd")
    assert(!out(1).getAs[Boolean]("matches_basic"))
  }
}
