package graft

import graft.operators.Unigram
import org.scalatest.funsuite.AnyFunSuite

/** Unigram-LM tokenizer family ([[graft.operators.Unigram]] /
  * [[graft.functions.UnigramSegmentStats]]): seed-vocab counting,
  * Viterbi optimality against brute-force enumeration, encode/stats
  * agreement, path reconstruction, coverage, and the UNK fallback.
  */
class UnigramSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  val texts = Seq(
    "banana bandana banana",
    "aaa abab banana cabbage",
    "the theme then thesis the the",
    "cabbage bag bag bag")
  def docs = texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }.toDF("doc_id", "text")

  def bits(c: Long): Int = 63 - java.lang.Long.numberOfLeadingZeros(c)

  /** Local reference: corpus-weighted substring counts. */
  def refCounts(maxLen: Int): Map[String, Long] = {
    val wc = scala.collection.mutable.Map.empty[String, Long]
    texts.flatMap(_.toLowerCase.split("[ \t\n\f\r]+").filter(_.nonEmpty))
      .foreach(w => wc(w) = wc.getOrElse(w, 0L) + 1)
    val pc = scala.collection.mutable.Map.empty[String, Long]
    for ((w, c) <- wc; s <- 0 until w.length; l <- 1 to math.min(maxLen, w.length - s))
      pc(w.substring(s, s + l)) = pc.getOrElse(w.substring(s, s + l), 0L) + c
    pc.toMap
  }

  /** Local reference vocab: top-N by (count desc, piece asc) ∪ single chars. */
  def refVocab(maxLen: Int, topN: Int): Seq[(String, Long)] = {
    val pc = refCounts(maxLen)
    val ranked = pc.toSeq.sortBy { case (p, c) => (-c, p) }
    (ranked.take(topN) ++ ranked.filter(_._1.length == 1)).distinct
  }

  /** Brute-force best segmentation of a word: enumerate ALL
    * segmentations into vocab pieces (UNK single chars allowed), pick
    * the (score desc, pieces asc, piece-seq lexicographic asc) optimum.
    * The lexicographic-by-last-piece-backwards comparison mirrors the
    * DP's per-cell tie rule: compare the piece sequences from the END.
    */
  def bruteBest(word: String, score: Map[String, Int], unk: Int,
      maxLen: Int): (Long, Int, List[String]) = {
    def segs(w: String): Seq[List[String]] =
      if (w.isEmpty) Seq(Nil)
      else (1 to math.min(maxLen, w.length)).flatMap { l =>
        val p = w.substring(0, l)
        if (score.contains(p) || l == 1) segs(w.substring(l)).map(p :: _)
        else Nil
      }
    def sc(p: String) = score.getOrElse(p, unk)
    segs(word).map { pieces =>
      (pieces.map(sc(_).toLong).sum, pieces.length, pieces)
    }.minBy { case (s, n, ps) => (-s, n, ps.reverse.mkString("\u0000")) }
  }

  test("seedVocab matches the local substring-count reference (top-N ∪ single chars)") {
    val got = Unigram.seedVocab(docs, maxPieceLen = 3, topN = 10)
      .orderBy($"n_occ".desc, $"piece").as[(String, Long)].collect().toSeq
    val exp = refVocab(3, 10).sortBy { case (p, c) => (-c, p) }
    assert(got == exp)
    // coverage: every corpus character is a vocab piece
    val chars = texts.flatMap(_.toLowerCase.split("\\s+")).flatten.map(_.toString).toSet
    assert(chars.subsetOf(got.map(_._1).toSet))
  }

  test("segmentStats is Viterbi-OPTIMAL: equals brute-force enumeration per word") {
    val (pieces, btot) = Unigram.vocabModel(Unigram.seedVocab(docs, 3, 10))
    val scoreMap = pieces.map { case (p, b) => p -> (b - btot) }.toMap
    val words = texts.flatMap(_.toLowerCase.split("\\s+").filter(_.nonEmpty)).distinct
    val perWord = words.map(w => w -> bruteBest(w, scoreMap, -btot, 3)).toMap
    val got = Unigram.segmentStats(docs, pieces, btot).orderBy($"doc_id")
      .as[(Long, Long, Long, Long)].collect().toSeq
    val exp = texts.zipWithIndex.map { case (t, i) =>
      val ws = t.toLowerCase.split("\\s+").filter(_.nonEmpty)
      (i.toLong, ws.length.toLong,
        ws.map(w => perWord(w)._2.toLong).sum,
        ws.map(w => perWord(w)._1).sum)
    }
    assert(got == exp)
  }

  test("encodePieces reconstructs each document and agrees with segmentStats' (pieces, score)") {
    val (pieces, btot) = Unigram.vocabModel(Unigram.seedVocab(docs, 3, 10))
    val scoreMap = pieces.map { case (p, b) => p -> (b - btot) }.toMap
    val enc = Unigram.encodePieces(docs, pieces, btot)
      .orderBy($"doc_id", $"pos").as[(Long, Int, String)].collect().toSeq
    val stats = Unigram.segmentStats(docs, pieces, btot)
      .as[(Long, Long, Long, Long)].collect().map(r => r._1 -> r).toMap
    val byDoc = enc.groupBy(_._1)
    texts.zipWithIndex.foreach { case (t, i) =>
      val ps = byDoc(i.toLong).sortBy(_._2).map(_._3)
      // concatenation reconstructs the word stream
      assert(ps.mkString == t.toLowerCase.split("\\s+").filter(_.nonEmpty).mkString)
      // piece positions are 1..n dense
      assert(byDoc(i.toLong).map(_._2).sorted == (1 to ps.length))
      // (count, score) of the emitted path == the stats gate's value
      val (_, _, np, sc) = stats(i.toLong)
      assert(ps.length.toLong == np)
      assert(ps.map(p => scoreMap.getOrElse(p, -btot).toLong).sum == sc)
    }
  }

  test("encodePieces matches brute-force tie-broken paths per word") {
    val (pieces, btot) = Unigram.vocabModel(Unigram.seedVocab(docs, 3, 10))
    val scoreMap = pieces.map { case (p, b) => p -> (b - btot) }.toMap
    val oneWord = Seq((0L, "banana"), (1L, "thesis"), (2L, "cabbage"), (3L, "abab"))
      .toDF("doc_id", "text")
    val got = Unigram.encodePieces(oneWord, pieces, btot)
      .orderBy($"doc_id", $"pos").as[(Long, Int, String)].collect()
      .groupBy(_._1).map { case (d, rs) => d -> rs.sortBy(_._2).map(_._3).toList }
    Seq((0L, "banana"), (1L, "thesis"), (2L, "cabbage"), (3L, "abab")).foreach {
      case (d, w) => assert(got(d) == bruteBest(w, scoreMap, -btot, 3)._3, s"word $w")
    }
  }

  test("UNK fallback: a character outside the vocabulary segments as a count-1 single piece") {
    val (pieces, btot) = Unigram.vocabModel(Unigram.seedVocab(docs, 3, 10))
    val alien = Seq((0L, "banana zzz")).toDF("doc_id", "text")
    val Seq((_, nw, np, sc)) = Unigram.segmentStats(alien, pieces, btot)
      .as[(Long, Long, Long, Long)].collect().toSeq
    assert(nw == 2L)
    val scoreMap = pieces.map { case (p, b) => p -> (b - btot) }.toMap
    val (bs, bn, _) = bruteBest("banana", scoreMap, -btot, 3)
    // 'z' is not in the corpus: three UNK pieces at -btot each
    assert(np == bn + 3L)
    assert(sc == bs - 3L * btot)
    val ps = Unigram.encodePieces(alien, pieces, btot)
      .orderBy($"pos").as[(Long, Int, String)].collect().map(_._3)
    assert(ps.takeRight(3).toSeq == Seq("z", "z", "z"))
  }

  test("pieceUsage + pruneVocab match the local reference: singles immune, drop-K by (usage, piece), Laplace re-score") {
    val vocabDf = Unigram.seedVocab(docs, 3, 10)
    val (pieces, btot) = Unigram.vocabModel(vocabDf)
    val scoreMap = pieces.map { case (p, b) => p -> (b - btot) }.toMap
    // reference usage: per-word brute-force path × word multiplicity
    val wc = scala.collection.mutable.Map.empty[String, Long]
    texts.flatMap(_.toLowerCase.split("\\s+").filter(_.nonEmpty))
      .foreach(w => wc(w) = wc.getOrElse(w, 0L) + 1)
    val usageRef = scala.collection.mutable.Map.empty[String, Long]
    for ((w, c) <- wc; p <- bruteBest(w, scoreMap, -btot, 3)._3)
      usageRef(p) = usageRef.getOrElse(p, 0L) + c
    val gotUsage = Unigram.pieceUsage(docs, pieces, btot)
      .as[(String, Long)].collect().toMap
    assert(gotUsage == usageRef.toMap)
    // reference prune: drop 3 lowest-usage multi-char pieces
    val vocabPieces = pieces.map(_._1)
    val withUsage = vocabPieces.map(p => p -> usageRef.getOrElse(p, 0L))
    val dropped = withUsage.filter(_._1.length > 1)
      .sortBy { case (p, u) => (u, p) }.take(3).map(_._1).toSet
    val expected = withUsage.filterNot { case (p, _) => dropped(p) }
      .map { case (p, u) => (p, u, u + 1) }.toSet
    val gotPruned = Unigram.pruneVocab(vocabDf,
        Unigram.pieceUsage(docs, pieces, btot), dropK = 3)
      .as[(String, Long, Long)].collect().toSet
    assert(gotPruned == expected)
    // every single-char piece survives (coverage invariant)
    assert(vocabPieces.filter(_.length == 1).toSet
      .subsetOf(gotPruned.map(_._1)))
  }

  /** Local reference of the full EM loop: fit → brute-force usage →
    * drop-min(cap, excess) prune → Laplace re-score, until the target.
    * Returns the final vocab plus the per-round size trace.
    */
  def refTrain(maxLen: Int, topN: Int, target: Int, cap: Int): (Seq[(String, Long)], Seq[Int]) = {
    val wc = scala.collection.mutable.Map.empty[String, Long]
    texts.flatMap(_.toLowerCase.split("\\s+").filter(_.nonEmpty))
      .foreach(w => wc(w) = wc.getOrElse(w, 0L) + 1)
    var vocab: Seq[(String, Long)] = refVocab(maxLen, topN)
    val sizes = Seq.newBuilder[Int]
    sizes += vocab.size
    while (vocab.size > target) {
      val btot = bits(vocab.map(_._2).sum)
      val scoreMap = vocab.map { case (p, c) => p -> (bits(c) - btot) }.toMap
      val usage = scala.collection.mutable.Map.empty[String, Long]
      for ((w, c) <- wc; p <- bruteBest(w, scoreMap, -btot, maxLen)._3)
        usage(p) = usage.getOrElse(p, 0L) + c
      val withU = vocab.map { case (p, _) => p -> usage.getOrElse(p, 0L) }
      val dropK = math.min(cap, vocab.size - target)
      val dropped = withU.filter(_._1.length > 1)
        .sortBy { case (p, u) => (u, p) }.take(dropK).map(_._1).toSet
      vocab = withU.filterNot { case (p, _) => dropped(p) }
        .map { case (p, u) => (p, u + 1L) }
      sizes += vocab.size
    }
    (vocab, sizes.result())
  }

  test("trainVocab runs the EM loop to the target: matches the reference, monotone shrink, coverage invariant") {
    val (seedPieces, _) = Unigram.vocabModel(Unigram.seedVocab(docs, 3, 10))
    val singles = seedPieces.map(_._1).filter(_.length == 1).toSet
    // the 17-piece seed over the 12-char alphabet: target 12 → excess 5
    // → rounds drop 2, 2, 1 (final partial)
    val target = singles.size
    // precondition: ≥2 rounds at cap 2, final round partial, so the
    // min(cap, excess) path and the re-score feedback both exercise
    assert(seedPieces.size > target + 2,
      s"fixture drifted: seed ${seedPieces.size} must exceed target $target by > cap")
    val (expVocab, sizes) = refTrain(3, 10, target, cap = 2)
    // monotone shrink, at most cap per round, exact landing
    assert(sizes.zip(sizes.tail).forall { case (a, b) => b < a && a - b <= 2 })
    assert(sizes.size >= 3, "wants >= 2 prune rounds")
    assert(sizes.last == target)
    val got = Unigram.trainVocab(docs, 3, 10, target, dropCap = 2)
      .as[(String, Long)].collect().toSeq
    assert(got.size == target)
    assert(got.toSet == expVocab.toSet)
    // coverage invariance: every seed single-char piece survives training
    assert(singles.subsetOf(got.map(_._1).toSet))
  }

  test("trainVocab degenerate targets: seed already small enough is a zero-round run; sub-alphabet target refuses loudly") {
    val seed = Unigram.seedVocab(docs, 3, 10)
      .as[(String, Long)].collect().toSet
    val got = Unigram.trainVocab(docs, 3, 10, targetVocab = seed.size, dropCap = 4)
      .as[(String, Long)].collect().toSet
    assert(got == seed) // zero rounds: the seed counts verbatim
    val singles = seed.count(_._1.length == 1)
    val e = intercept[IllegalArgumentException] {
      Unigram.trainVocab(docs, 3, 10, targetVocab = singles - 1, dropCap = 4)
    }
    assert(e.getMessage.contains("single-char alphabet"))
  }

  test("empty and null-free degenerate docs: zero words, zero pieces, zero score") {
    val (pieces, btot) = Unigram.vocabModel(Unigram.seedVocab(docs, 3, 10))
    val empty = Seq((0L, ""), (1L, "   \t\n  ")).toDF("doc_id", "text")
    val got = Unigram.segmentStats(empty, pieces, btot).orderBy($"doc_id")
      .as[(Long, Long, Long, Long)].collect().toSeq
    assert(got == Seq((0L, 0L, 0L, 0L), (1L, 0L, 0L, 0L)))
    assert(Unigram.encodePieces(empty, pieces, btot).count() == 0L)
  }

  // ---- byte fallback (SentencePiece --byte_fallback) ----

  test("byteFallback: uncovered chars emit <0xXX> byte tokens; the stream inverts; covered text is unchanged") {
    val (pieces, btot) = Unigram.vocabModel(Unigram.seedVocab(docs, 3, 12))
    val multi = Seq((0L, "the 数据 café banana")).toDF("doc_id", "text")
    val toks = Unigram.encodePieces(multi, pieces, btot, byteFallback = true)
      .as[(Long, Int, String)].collect().sortBy(_._2).map(_._3).toSeq
    // 数 = E6 95 B0 — the exact SentencePiece byte-token surface forms
    assert(toks.containsSlice(Seq("<0xE6>", "<0x95>", "<0xB0>")))
    // invertibility: byte tokens decode to bytes, vocab pieces to their
    // UTF-8 bytes — the concatenation is the whitespace-stripped text
    val bytes = toks.flatMap { t =>
      if (t.matches("<0x[0-9A-F]{2}>"))
        Seq(Integer.parseInt(t.substring(3, 5), 16).toByte)
      else t.getBytes("UTF-8").toSeq
    }.toArray
    assert(new String(bytes, "UTF-8") == "the数据cafébanana")
    // stats agree with the emitted stream
    val st = Unigram.segmentStats(multi, pieces, btot, byteFallback = true)
      .as[(Long, Long, Long, Long)].collect()(0)
    assert(st._3 == toks.size.toLong)
    // a fully covered corpus is untouched by the flag
    val plain = Unigram.encodePieces(docs, pieces, btot)
      .as[(Long, Int, String)].collect().toSeq.sorted
    val fb = Unigram.encodePieces(docs, pieces, btot, byteFallback = true)
      .as[(Long, Int, String)].collect().toSeq.sorted
    assert(plain == fb)
    // scoring: one uncovered 3-byte char costs 3 count-1 pieces where
    // plain UNK costs 1 — the fallback is visible in (n_pieces, score)
    val one = Seq((0L, "数")).toDF("doc_id", "text")
    val hard = Unigram.segmentStats(one, pieces, btot)
      .as[(Long, Long, Long, Long)].collect()(0)
    val soft = Unigram.segmentStats(one, pieces, btot, byteFallback = true)
      .as[(Long, Long, Long, Long)].collect()(0)
    assert(hard._3 == 1L && soft._3 == 3L)
    assert(soft._4 == 3L * hard._4)
  }

  // ---- soft-EM E-step (forward–backward expected counts) ----

  /** Local exact-rational reference: the TRUE posterior expected counts
    * of the QUANTIZED model (q/S piece mass), via brute-force
    * enumeration of every segmentation — an independent spelling of
    * what the scaled-integer forward–backward must equal exactly.
    */
  def refSoft(word: String, vocab: Seq[(String, Long)], probBits: Int,
      scale: Long): Map[String, Long] = {
    import scala.math.BigInt
    val total = vocab.map(_._2).sum
    val q = vocab.map { case (p, n) =>
      p -> (BigInt(n) << probBits) / total.max(1) }.map { case (p, v) =>
      p -> v.max(1) }.toMap
    val maxLen = vocab.map(_._1.length).max
    val S = BigInt(1) << probBits
    // enumerate segmentations; weight = prod q(p); denominator S^pieces
    // → common denominator S^len via weight · S^(len − pieces)
    def segs(w: String): Seq[Seq[String]] =
      if (w.isEmpty) Seq(Nil)
      else (1 to math.min(maxLen, w.length)).flatMap { k =>
        val p = w.take(k)
        if (q.contains(p) || k == 1)
          segs(w.drop(k)).map(p +: _)
        else Nil
      }
    val n = word.length
    val weighted = segs(word).map { seg =>
      val w = seg.map(p => q.getOrElse(p, BigInt(1))).product *
        (S.pow(n - seg.length))
      (seg, w)
    }
    val z = weighted.map(_._2).sum
    val num = scala.collection.mutable.Map.empty[String, BigInt]
    for ((seg, w) <- weighted; p <- seg)
      num(p) = num.getOrElse(p, BigInt(0)) + w
    num.map { case (p, nm) => p -> ((BigInt(scale) * nm) / z).toLong }.toMap
  }

  test("pieceUsageSoft ≡ brute-force posterior expected counts of the quantized model") {
    val vocab = Unigram.seedVocab(docs, 3, 12)
    val rows = vocab.select($"piece", $"n_occ")
      .as[(String, Long)].collect().toSeq
    val got = Unigram.pieceUsageSoft(docs, vocab)
      .as[(String, Long)].collect().toMap
    // reference: corpus-weighted sum of per-word brute-force posteriors
    val wc = scala.collection.mutable.Map.empty[String, Long]
    texts.flatMap(_.toLowerCase.split("[ \t\n\f\r]+").filter(_.nonEmpty))
      .foreach(w => wc(w) = wc.getOrElse(w, 0L) + 1)
    val want = scala.collection.mutable.Map.empty[String, Long]
    for ((w, c) <- wc; (p, e) <- refSoft(w, rows, 8, 1000000L))
      want(p) = want.getOrElse(p, 0L) + c * e
    val wantAll = rows.map { case (p, _) => p -> want.getOrElse(p, 0L) }.toMap
    assert(got == wantAll)
    assert(got.values.exists(_ > 0))
    // soft ≠ hard on this corpus: some piece gets lattice mass that the
    // Viterbi best paths alone would never give it (the ask's point)
    val (pieces, btot) = Unigram.vocabModel(vocab)
    val hard = Unigram.pieceUsage(docs, pieces, btot)
      .as[(String, Long)].collect().toMap
    val softOnly = got.filter { case (p, u) => u > 0 && hard.getOrElse(p, 0L) == 0L }
    assert(softOnly.nonEmpty,
      "expected at least one piece with soft mass but zero Viterbi usage")
  }

  test("trainVocab(soft): local-reference equality, target reached, singles preserved, and soft ≠ hard binds") {
    val target = 14
    val gotSoft = Unigram.trainVocab(docs, 3, 12, target, dropCap = 4,
        soft = true).orderBy($"n_occ".desc, $"piece")
      .as[(String, Long)].collect().toSeq
    assert(gotSoft.size == target)
    val singles = refVocab(3, 12).count(_._1.length == 1)
    assert(gotSoft.count(_._1.length == 1) == singles,
      "single-char pieces must survive every soft prune round")
    // local reference: the same loop with brute-force posterior usage
    val wc = scala.collection.mutable.Map.empty[String, Long]
    texts.flatMap(_.toLowerCase.split("[ \t\n\f\r]+").filter(_.nonEmpty))
      .foreach(w => wc(w) = wc.getOrElse(w, 0L) + 1)
    var vocab = refVocab(3, 12)
    while (vocab.size > target) {
      val dropK = math.min(4, vocab.size - target)
      val usage = scala.collection.mutable.Map.empty[String, Long]
      for ((w, c) <- wc; (p, e) <- refSoft(w, vocab, 8, 1000000L))
        usage(p) = usage.getOrElse(p, 0L) + c * e
      val (singlesV, multi) = vocab.partition(_._1.length == 1)
      val dropped = multi.map { case (p, _) => (p, usage.getOrElse(p, 0L)) }
        .sortBy { case (p, u) => (u, p) }.take(dropK).map(_._1).toSet
      vocab = (singlesV.map(v => (v._1, usage.getOrElse(v._1, 0L))) ++
        multi.filter(v => !dropped(v._1))
          .map(v => (v._1, usage.getOrElse(v._1, 0L))))
        .map { case (p, u) => (p, u + 1L) }
    }
    val want = vocab.sortBy { case (p, n) => (-n, p) }
    assert(gotSoft == want)
    // and the soft E-step genuinely changes the trained model vs hard
    val gotHard = Unigram.trainVocab(docs, 3, 12, target, dropCap = 4)
      .orderBy($"n_occ".desc, $"piece").as[(String, Long)].collect().toSeq
    assert(gotSoft != gotHard,
      "soft and hard trainers coincided — the soft gate would be vacuous on this corpus")
  }

  test("pieceUsageSoft invariants: per-word expected piece mass ∈ [scale, len·scale]; single-seg words are exact") {
    val s2 = spark
    import s2.implicits._
    val one = Seq((0L, "z")).toDF("doc_id", "text") // single char, one segmentation
    val vocabZ = Seq(("z", 5L)).toDF("piece", "n_occ")
    val gotZ = Unigram.pieceUsageSoft(one, vocabZ).as[(String, Long)].collect().toSeq
    assert(gotZ == Seq(("z", 1000000L))) // E = exactly 1 piece
    // a word with several segmentations: total expected mass between
    // 1·scale (one piece) and len·scale (all singles)
    val ab = Seq((0L, "abab")).toDF("doc_id", "text")
    val vocabAb = Seq(("a", 4L), ("b", 4L), ("ab", 2L)).toDF("piece", "n_occ")
    val tot = Unigram.pieceUsageSoft(ab, vocabAb).as[(String, Long)].collect()
      .map(_._2).sum
    assert(tot >= 1000000L && tot <= 4 * 1000000L, s"total mass $tot")
    // UNK floor: a char outside the vocabulary still yields a lattice
    val unk = Seq((0L, "zq")).toDF("doc_id", "text")
    val gotUnk = Unigram.pieceUsageSoft(unk, vocabZ).as[(String, Long)].collect().toMap
    assert(gotUnk.keySet == Set("z")) // only vocab pieces report
    assert(gotUnk("z") > 0L)
  }

  test("byteFallback on a supplementary-plane char: the REAL 4 UTF-8 bytes, one code point per step") {
    // 😀 = U+1F600 = F0 9F 98 80 — a surrogate PAIR in UTF-16. The
    // round-15 advice bug: per-UTF-16-unit fallback ran getBytes on each
    // unpaired surrogate, emitting two wrong <0x3F> ('?') tokens.
    val (pieces, btot) = Unigram.vocabModel(Unigram.seedVocab(docs, 3, 12))
    val multi = Seq((0L, "a😀b the")).toDF("doc_id", "text")
    val toks = Unigram.encodePieces(multi, pieces, btot, byteFallback = true)
      .as[(Long, Int, String)].collect().sortBy(_._2).map(_._3).toSeq
    assert(toks.containsSlice(Seq("<0xF0>", "<0x9F>", "<0x98>", "<0x80>")))
    assert(!toks.contains("<0x3F>"), s"unpaired-surrogate '?' leaked: $toks")
    // invertibility survives the pair
    val bytes = toks.flatMap { t =>
      if (t.matches("<0x[0-9A-F]{2}>"))
        Seq(Integer.parseInt(t.substring(3, 5), 16).toByte)
      else t.getBytes("UTF-8").toSeq
    }.toArray
    assert(new String(bytes, "UTF-8") == "a😀bthe")
    // stats: a😀b = vocab 'a' + 4 byte tokens + vocab 'b' = 6 pieces;
    // and WITHOUT fallback the pair is ONE count-1 UNK piece (code
    // point, not two UTF-16 units)
    val one = Seq((0L, "a😀b")).toDF("doc_id", "text")
    val fb = Unigram.segmentStats(one, pieces, btot, byteFallback = true)
      .as[(Long, Long, Long, Long)].collect()(0)
    assert(fb._3 == 6L)
    val hard = Unigram.segmentStats(one, pieces, btot)
      .as[(Long, Long, Long, Long)].collect()(0)
    assert(hard._3 == 3L) // a, UNK(😀), b
  }

  test("metaspace: pieces carry the ▁ marker, detokenization is exact, and the mode BINDS") {
    val M = Unigram.Metaspace
    val vocabM = Unigram.seedVocab(docs, 3, 12, metaspace = true)
      .as[(String, Long)].collect().toMap
    // the marker is vocabulary material: ▁ itself (single-char coverage)
    // and ▁-prefixed substrings are pieces
    assert(vocabM.contains(M))
    assert(vocabM.keys.exists(p => p.startsWith(M) && p.length > 1))
    val (pieces, btot) = Unigram.vocabModel(
      Unigram.seedVocab(docs, 3, 12, metaspace = true))
    val toks = Unigram.encodePieces(docs, pieces, btot, metaspace = true)
      .as[(Long, Int, String)].collect().toSeq
    // every word's FIRST piece starts with ▁ (the dummy prefix), and
    // detokenization reproduces the whitespace-normalized text exactly
    val byDoc = toks.groupBy(_._1).view.mapValues(_.sortBy(_._2).map(_._3))
    texts.zipWithIndex.foreach { case (txt, i) =>
      val norm = txt.toLowerCase.split("[ \t\n\f\r]+").filter(_.nonEmpty)
      val detok = byDoc.getOrElse(i.toLong, Seq.empty)
        .mkString.replace(M, " ").stripPrefix(" ")
      assert(detok == norm.mkString(" "), s"doc $i: '$detok'")
    }
    // the mode binds: the plain spelling emits NO marker anywhere
    val (p0, b0) = Unigram.vocabModel(Unigram.seedVocab(docs, 3, 12))
    val plain = Unigram.encodePieces(docs, p0, b0)
      .as[(Long, Int, String)].collect().toSeq
    assert(plain.forall(!_._3.contains(M)))
    assert(toks.exists(_._3.contains(M)))
  }

  // ---- likelihood-loss prune criterion ----

  test("loss-delta and usage RANK DIFFERENTLY on a multiplicity-heavy corpus (the criterion binds)") {
    // 'ab' appears 3× in ONE cnt-1 word (usage counts multiplicity ≈ 3·scale,
    // loss counts the word once ≈ scale); 'cd' appears once in a cnt-2 word
    // (usage ≈ 2·scale, loss ≈ 2·scale) — so usage ranks ab ABOVE cd while
    // loss ranks ab BELOW cd, and the two prunes drop different pieces.
    val corpus = Seq((0L, "ababab"), (1L, "cdx cdx")).toDF("doc_id", "text")
    val vocab = Seq(("ab", 100L), ("cd", 100L), ("a", 1L), ("b", 1L),
      ("c", 1L), ("d", 1L), ("x", 1L)).toDF("piece", "n_occ")
    val usage = Unigram.pieceUsageSoft(corpus, vocab)
      .as[(String, Long)].collect().toMap
    val loss = Unigram.pieceLossDelta(corpus, vocab)
      .as[(String, Long)].collect().toMap
    assert(loss.keySet == Set("ab", "cd")) // multi-char candidates only
    assert(usage("ab") > usage("cd"),
      s"usage should rank ab above cd: $usage")
    assert(loss("ab") < loss("cd"),
      s"loss should rank ab below cd: $loss")
    val byUsage = Unigram.pruneVocab(vocab,
        Unigram.pieceUsageSoft(corpus, vocab)
          .select(org.apache.spark.sql.functions.col("piece"),
            org.apache.spark.sql.functions.col("usage_q").as("usage")), 1)
      .select("piece").as[String].collect().toSet
    val byLoss = Unigram.pruneVocabByLoss(vocab,
        Unigram.pieceLossDelta(corpus, vocab), 1)
      .select("piece").as[String].collect().toSet
    assert(byUsage.contains("ab") && !byUsage.contains("cd"))
    assert(byLoss.contains("cd") && !byLoss.contains("ab"))
  }

  test("the HUGEINT envelope guard fails LOUDLY on a regime the oracle could not mirror") {
    // probBits = 20 with an all-high-q vocabulary over a length-8 word:
    // numer·scale needs > 126 bits — the engine must refuse, not let the
    // DuckDB twin overflow (round-15 advice)
    val corpus = Seq((0L, "aaaaaaaa")).toDF("doc_id", "text")
    val vocab = Seq(("a", 1000000L), ("aa", 1000000L), ("aaa", 1000000L),
      ("aaaa", 1000000L)).toDF("piece", "n_occ")
    def chainMessages(t: Throwable): String =
      Iterator.iterate(t)(_.getCause).takeWhile(_ != null)
        .map(e => Option(e.getMessage).getOrElse("")).mkString(" | ")
    val eu = intercept[Exception] {
      Unigram.pieceUsageSoft(corpus, vocab, probBits = 20).collect()
    }
    assert(chainMessages(eu).contains("HUGEINT envelope"), chainMessages(eu))
    val el = intercept[Exception] {
      Unigram.pieceLossDelta(corpus, vocab, probBits = 20).collect()
    }
    assert(chainMessages(el).contains("HUGEINT envelope"), chainMessages(el))
  }
}
