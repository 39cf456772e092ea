package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, GenericInternalRow, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

import scala.collection.mutable

/** `unigram_segment_stats(text)` — Viterbi segmentation under a FROZEN
  * unigram-LM vocabulary (Kudo, ACL 2018: "Subword Regularization",
  * §3; the SentencePiece unigram model), the maximum-likelihood
  * counterpart of the greedy BPE apply ([[BpeSegmentStats]]). The
  * reference engine has no tokenizer; this completes the trained-
  * tokenizer pair of the extended curation surface (SURVEY §2):
  * BPE trains a MERGE TABLE applied greedily, the unigram model
  * trains a SCORED VOCABULARY applied by best-path dynamic
  * programming.
  *
  * Scoring is the integer-quantized log₂ likelihood — the
  * [[graft.operators.Importance]] discipline (exact integers end to
  * end so the DuckDB gate is exact equality, no float log in the
  * compared columns): piece score = bits(n_occ) − bits(Σ n_occ), with
  * bits(c) = ⌊log₂ c⌋ (= 63 − nlz(c), mirrored in the oracle by a
  * power-of-two ladder join — never a float log2 round-trip). Every
  * piece score is ≤ 0, so the DP genuinely trades piece count against
  * piece frequency exactly like the real-valued model; a production
  * deployment would swap in double log-probs behind the same plan
  * shape (knob documented, not gated).
  *
  * Per word (whitespace tokens, the [[BpeSegmentStats]] tokenization
  * and `Locale.ROOT` case contract): best(0) = (0 score, 0 pieces);
  * best(t) = max over vocabulary pieces p ending at t of
  * best(t−|p|) + (score(p), 1), ordered lexicographically by
  * (score DESC, pieces ASC, piece-string ASC by UTF-8 bytes). The
  * piece-string leg makes the per-cell CHOICE total (distinct
  * candidate lengths are distinct suffix strings), so the emitted
  * path ([[UnigramEncode]]) is deterministic and the oracle's
  * per-position QUALIFY recursion reproduces it bit for bit; the
  * (score, pieces) VALUE pair is already unique without it, which is
  * what the stats gate compares. A character absent from the
  * vocabulary (impossible when the vocabulary was seeded from the
  * same corpus — [[graft.operators.Unigram.seedVocab]] keeps every
  * single-character piece) falls back to an UNK single-char piece
  * with count 1 (score = −bits(total)), the SentencePiece unk
  * convention.
  *
  * Output: struct<n_words: long, n_pieces: long, score: long> —
  * corpus-frozen vocabulary rides as a codegen reference object
  * (ONE plan node whatever the vocabulary size, the
  * [[BpeSegmentStats]] scale argument).
  */
case class UnigramSegmentStats(child: Expression, pieces: Seq[(String, Int)],
    btot: Int, byteFallback: Boolean = false,
    metaspace: Boolean = false) extends UnaryExpression {

  override def dataType: DataType = StructType(Seq(
    StructField("n_words", LongType, nullable = false),
    StructField("n_pieces", LongType, nullable = false),
    StructField("score", LongType, nullable = false)))
  override def prettyName: String = "unigram_segment_stats"

  private lazy val model: UnigramSegment.Model =
    UnigramSegment.model(pieces, btot, byteFallback, metaspace)

  override protected def nullSafeEval(input: Any): Any =
    UnigramSegment.computeStats(input.toString, model)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val mRef = ctx.addReferenceObj("model", model, classOf[UnigramSegment.Model].getName)
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.UnigramSegment.computeStats($c.toString(), $mRef);")
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** `unigram_encode(text)` — the EMIT sibling: the best-path piece
  * sequence itself (word order, then within-word piece order), under
  * exactly [[UnigramSegmentStats]]' DP and tie-break, so the emitted
  * path's (Σ score, count) always equals the stats output
  * (UnigramSpec property-pins it). Output: array<string>.
  */
case class UnigramEncode(child: Expression, pieces: Seq[(String, Int)],
    btot: Int, byteFallback: Boolean = false,
    metaspace: Boolean = false) extends UnaryExpression {

  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def prettyName: String = "unigram_encode"

  private lazy val model: UnigramSegment.Model =
    UnigramSegment.model(pieces, btot, byteFallback, metaspace)

  override protected def nullSafeEval(input: Any): Any =
    UnigramSegment.computePieces(input.toString, model)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val mRef = ctx.addReferenceObj("model", model, classOf[UnigramSegment.Model].getName)
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.UnigramSegment.computePieces($c.toString(), $mRef);")
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object UnigramSegment {

  /** Frozen model state carried as ONE codegen reference object:
    * piece → score map (score = bits(n_occ) − btot, precomputed),
    * max piece length (the DP's inner-loop bound), the UNK score, and
    * the byte-fallback switch (SentencePiece `--byte_fallback`): a
    * character with NO vocabulary piece decomposes into its UTF-8
    * bytes as `<0xXX>` tokens — each scored like a count-1 piece
    * (bits(1) − btot = unkScore per BYTE) — instead of one opaque UNK
    * piece, so the emitted stream is always invertible back to raw
    * bytes (no information loss on out-of-vocabulary scripts).
    */
  final class Model(val scores: java.util.HashMap[String, Integer],
      val maxLen: Int, val unkScore: Int,
      val byteFallback: Boolean,
      val metaspace: Boolean) extends Serializable

  def model(pieces: Seq[(String, Int)], btot: Int,
      byteFallback: Boolean = false, metaspace: Boolean = false): Model = {
    val m = new java.util.HashMap[String, Integer]()
    var maxLen = 1
    pieces.foreach { case (p, bits) =>
      m.put(p, Integer.valueOf(bits - btot))
      if (p.length > maxLen) maxLen = p.length
    }
    new Model(m, maxLen, -btot, byteFallback, metaspace)
  }

  /** `<0xXX>` byte token (uppercase hex — the SentencePiece surface
    * form, and the oracle's `hex()` case).
    */
  def byteToken(b: Byte): String = f"<0x${b & 0xff}%02X>"

  private def isWs(c: Char): Boolean =
    c == ' ' || c == '\t' || c == '\n' || c == '\f' || c == '\r'

  /** UTF-8 binary comparison — the Spark/DuckDB string collation, NOT
    * Java's UTF-16 `compareTo` (they differ above the BMP; the corpus
    * contract is ASCII but the tie-break should not silently depend on
    * it).
    */
  private def binaryLt(a: String, b: String): Boolean =
    UTF8String.fromString(a).compareTo(UTF8String.fromString(b)) < 0

  /** Viterbi over one word: fills score/np per position and returns the
    * chosen last-piece length per position (for backtracking) plus the
    * fallback flag per position (the chosen last step was a byte
    * decomposition). Cell order: (score DESC, pieces ASC, piece-string
    * ASC) — a fallback step's tie piece is its LAST byte token (the
    * oracle's `fbpath[-1]`).
    */
  private def viterbi(word: String, m: Model):
      (Array[Long], Array[Int], Array[Int], Array[Boolean]) = {
    val n = word.length
    val score = new Array[Long](n + 1)
    val np = new Array[Int](n + 1)
    val lastLen = new Array[Int](n + 1)
    val isFb = new Array[Boolean](n + 1)
    var t = 1
    while (t <= n) {
      var bestScore = Long.MinValue
      var bestNp = Int.MaxValue
      var bestL = 0
      var bestFb = false
      var bestPiece: String = null
      def offer(cs: Long, cn: Int, piece: String, l: Int, fb: Boolean): Unit =
        if (cs > bestScore || (cs == bestScore && (cn < bestNp ||
            (cn == bestNp && binaryLt(piece, bestPiece))))) {
          bestScore = cs; bestNp = cn; bestL = l; bestPiece = piece; bestFb = fb
        }
      val lMax = math.min(m.maxLen, t)
      var l = 1
      while (l <= lMax) {
        val piece = word.substring(t - l, t)
        val s0 = m.scores.get(piece)
        if (s0 != null) {
          // mid-codepoint DP cells (see below) are unreachable: never
          // extend from a MinValue base (the sum would wrap)
          if (score(t - l) != Long.MinValue)
            offer(score(t - l) + s0.intValue(), np(t - l) + 1, piece, l, fb = false)
        } else if (l == 1) {
          val c0 = word.charAt(t - 1)
          if (Character.isLowSurrogate(c0) && t >= 2 &&
              Character.isHighSurrogate(word.charAt(t - 2))) {
            // a supplementary-plane character is TWO UTF-16 units but ONE
            // code point: the fallback/UNK step spans both (length 2) and
            // takes the full code point's real UTF-8 bytes — per-unit
            // getBytes would see unpaired surrogates and emit '?' (0x3F),
            // breaking invertibility and diverging from the code-point-
            // based oracle (round-15 advice)
            val cp = word.substring(t - 2, t)
            if (m.byteFallback) {
              val bytes = cp.getBytes(java.nio.charset.StandardCharsets.UTF_8)
              offer(score(t - 2) + bytes.length.toLong * m.unkScore,
                np(t - 2) + bytes.length, byteToken(bytes(bytes.length - 1)),
                2, fb = true)
            } else // UNK single CODE POINT, count-1 score
              offer(score(t - 2) + m.unkScore, np(t - 2) + 1, cp, 2, fb = false)
          } else if (Character.isHighSurrogate(c0) && t < n &&
              Character.isLowSurrogate(word.charAt(t))) {
            // position splits a surrogate pair: no step may end here (the
            // pair's one step lands at t + 1); the cell stays unreachable
            // and the MinValue guard above keeps it out of every path
          } else if (m.byteFallback) {
            // byte decomposition: nb pieces, unkScore per BYTE
            val bytes = piece.getBytes(java.nio.charset.StandardCharsets.UTF_8)
            offer(score(t - 1) + bytes.length.toLong * m.unkScore,
              np(t - 1) + bytes.length, byteToken(bytes(bytes.length - 1)),
              l, fb = true)
          } else // UNK single char, count-1 score
            offer(score(t - 1) + m.unkScore, np(t - 1) + 1, piece, l, fb = false)
        }
        l += 1
      }
      score(t) = bestScore; np(t) = bestNp; lastLen(t) = bestL; isFb(t) = bestFb
      t += 1
    }
    (score, np, lastLen, isFb)
  }

  /** Static for codegen: tokenize + per-word Viterbi, summed stats. */
  def computeStats(input: String, m: Model): InternalRow = {
    val text = input.toLowerCase(java.util.Locale.ROOT)
    var nWords = 0L
    var nPieces = 0L
    var total = 0L
    var i = 0
    val len = text.length
    while (i < len) {
      while (i < len && isWs(text.charAt(i))) i += 1
      val start = i
      while (i < len && !isWs(text.charAt(i))) i += 1
      if (i > start) {
        nWords += 1
        val w0 = text.substring(start, i)
        // metaspace: the DP runs over the ▁-prefixed word — the marker
        // is ordinary vocabulary material (SentencePiece add_dummy_prefix)
        val w = if (m.metaspace) "\u2581" + w0 else w0
        val (s, p, _, _) = viterbi(w, m)
        total += s(w.length)
        nPieces += p(w.length)
      }
    }
    new GenericInternalRow(Array[Any](nWords, nPieces, total))
  }

  /** Static for codegen: tokenize + per-word Viterbi + backtrack the
    * chosen path (word order, then piece order within the word).
    */
  def computePieces(input: String, m: Model): GenericArrayData = {
    val text = input.toLowerCase(java.util.Locale.ROOT)
    val out = mutable.ArrayBuffer.empty[Any]
    var i = 0
    val len = text.length
    while (i < len) {
      while (i < len && isWs(text.charAt(i))) i += 1
      val start = i
      while (i < len && !isWs(text.charAt(i))) i += 1
      if (i > start) {
        val w0 = text.substring(start, i)
        val w = if (m.metaspace) "\u2581" + w0 else w0
        val (_, _, lastLen, isFb) = viterbi(w, m)
        val rev = mutable.ArrayBuffer.empty[String]
        var t = w.length
        while (t > 0) {
          val l = lastLen(t)
          if (isFb(t)) {
            // byte tokens in byte order ⇒ reversed into the rev buffer;
            // l = 2 for a surrogate-pair step (one code point, 4 bytes)
            val bytes = w.substring(t - l, t)
              .getBytes(java.nio.charset.StandardCharsets.UTF_8)
            var b = bytes.length - 1
            while (b >= 0) { rev += byteToken(bytes(b)); b -= 1 }
          } else rev += w.substring(t - l, t)
          t -= l
        }
        var j = rev.length - 1
        while (j >= 0) {
          out += UTF8String.fromString(rev(j))
          j -= 1
        }
      }
    }
    new GenericArrayData(out.toArray)
  }
}
