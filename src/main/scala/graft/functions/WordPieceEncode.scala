package graft.functions

import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._

import scala.collection.mutable

/** `wordpiece_encode(text)` with a FROZEN vocabulary — the apply side of
  * the WordPiece tokenizer family ([[graft.operators.WordPiece]]; the
  * third production tokenizer family next to BPE and unigram-LM:
  * Schuster & Nakajima, ICASSP 2012; Devlin et al., NAACL 2019's BERT
  * release). Unlike BPE's merge-order replay, WordPiece APPLY is greedy
  * longest-match-first against the vocabulary SET: per word, take the
  * longest vocabulary prefix (continuation pieces carry the `##`
  * prefix), advance, repeat; a word with no match at any position emits
  * the single `unk` token for the WHOLE word (the BERT
  * `WordpieceTokenizer` rule — partial pieces are discarded).
  *
  * Pre-tokenization is the BERT BasicTokenizer convention
  * ([[WordPieceOps.basicTokens]]): lowercase, every punctuation
  * character split out as its own token, every CJK ideograph split out
  * as its own token, whitespace split. Accent stripping
  * (tokenization.py's `strip_accents`, an option tied to
  * `do_lower_case`) is deliberately NOT applied — the oracle engine
  * exposes no NFD decomposition to mirror it, and the convention is
  * orthogonal to the greedy-match semantics the gates bind.
  *
  * The vocabulary rides the plan as ONE codegen reference object (a
  * prebuilt hash set + max core length — the [[BpeSegmentStats]]
  * frozen-table discipline): constant plan size at any vocabulary size,
  * full whole-stage codegen, the per-row scan bounded by
  * `len(word) · maxCoreLen` hash probes.
  *
  * Corpus contract: pieces and scan positions are BMP code points (the
  * training side splits per code point; supplementary-plane text should
  * ride the byte-level BPE family instead — WordPiece's published form
  * predates byte fallback).
  *
  * Output: array<string> of tokens (word order, then piece order).
  */
case class WordPieceEncode(child: Expression, vocab: Seq[String],
    unk: String = "[UNK]") extends UnaryExpression {

  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def prettyName: String = "wordpiece_encode"

  @transient private lazy val model: WordPieceOps.Model =
    WordPieceOps.buildModel(vocab, unk)

  override protected def nullSafeEval(input: Any): Any =
    WordPieceOps.encode(input.toString, model)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val mRef = ctx.addReferenceObj("wpModel", model,
      classOf[WordPieceOps.Model].getName)
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.WordPieceOps.encode($c.toString(), $mRef);")
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object WordPieceOps {

  /** Frozen-vocabulary state shared by every row of a task: the piece
    * set, the longest CORE length in code points (bounds the greedy
    * scan), and the unk token.
    */
  final class Model(val pieces: java.util.HashSet[String], val maxCore: Int,
      val unk: String) extends Serializable

  def buildModel(vocab: Seq[String], unk: String): Model = {
    val set = new java.util.HashSet[String]()
    var maxCore = 1
    vocab.foreach { p =>
      set.add(p)
      val core = if (p.startsWith("##")) p.substring(2) else p
      val n = core.codePointCount(0, core.length)
      if (n > maxCore) maxCore = n
    }
    new Model(set, maxCore, unk)
  }

  /** BERT BasicTokenizer-style pre-tokenization, shared verbatim (ONE
    * regex pair) with the DataFrame spelling
    * ([[TextFunctions.bertTokens]]): lowercase (Java `Locale.ROOT` here
    * vs Spark `lower()` there — the [[BpeSegmentStats]] case-mapping
    * caveat), space out every non-letter/number/whitespace char and
    * every CJK Unified Ideograph, split on the explicit whitespace
    * class. Kana/Hangul stay inside letter runs (BERT's
    * `_is_chinese_char` covers the ideograph blocks only).
    */
  private val PunctPat =
    java.util.regex.Pattern.compile(TextFunctions.BertPunctClass)
  private val CjkPat =
    java.util.regex.Pattern.compile(TextFunctions.BertCjkClass)

  def basicTokens(text: String): Array[String] = {
    val lowered = text.toLowerCase(java.util.Locale.ROOT)
    val spaced = CjkPat.matcher(
      PunctPat.matcher(lowered).replaceAll(" $1 ")).replaceAll(" $1 ")
    spaced.split("[ \t\n\f\r]+").filter(_.nonEmpty)
  }

  /** Greedy longest-match-first over one word (code-point boundaries).
    * Returns the word's pieces, or the single unk token when any
    * position has no vocabulary match.
    */
  private def encodeWord(word: String, m: Model): mutable.ArrayBuffer[String] = {
    // code-point boundaries once, so the scan never splits a pair
    val bounds = mutable.ArrayBuffer.empty[Int]
    var i = 0
    while (i <= word.length) {
      bounds += i
      if (i < word.length) i += Character.charCount(word.codePointAt(i))
      else i += 1
    }
    val n = bounds.length - 1 // code-point count
    val out = mutable.ArrayBuffer.empty[String]
    var p = 0
    while (p < n) {
      var j = math.min(n, p + m.maxCore)
      var found: String = null
      while (j > p && found == null) {
        val core = word.substring(bounds(p), bounds(j))
        val piece = if (p == 0) core else "##" + core
        if (m.pieces.contains(piece)) found = piece else j -= 1
      }
      if (found == null) {
        out.clear()
        out += m.unk
        return out
      }
      out += found
      p = j
    }
    out
  }

  /** Static for codegen: basic-tokenize + greedy-match every word, emit
    * the flattened piece stream.
    */
  def encode(input: String, m: Model): GenericArrayData = {
    val out = mutable.ArrayBuffer.empty[Any]
    basicTokens(input).foreach { w =>
      encodeWord(w, m).foreach { s =>
        out += org.apache.spark.unsafe.types.UTF8String.fromString(s)
      }
    }
    new GenericArrayData(out.toArray)
  }
}
