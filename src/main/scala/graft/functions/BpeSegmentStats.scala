package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, GenericInternalRow, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._

import scala.collection.mutable

/** `bpe_segment_stats(text)` with a FROZEN merge table — the apply side
  * of vocabulary-scale BPE ([[graft.operators.Bpe]]).
  *
  * The chained-HOF spelling ([[graft.operators.Bpe.segmentStats]]) nests
  * one `transform(…, mergeFold)` per merge: correct and oracle-mirrored
  * at the 8-merge gate, but the expression TREE grows linearly in the
  * merge count — a 120-merge table (the batched trainer's output, let
  * alone a production 32k vocabulary) inflates analysis and codegen the
  * same way the literal-HOF centroid folds did before
  * [[CentroidExpressions]]. This expression holds the merge table as a
  * codegen reference object instead: ONE plan node regardless of table
  * size, a tight loop per row, full whole-stage codegen.
  *
  * Semantics are identical to the fold spelling on every input
  * (BpeSpec property-pins random merge tables, overlapping pairs
  * included): whitespace-tokenize (`[ \t\n\f\r]+`, the
  * [[TextFunctions.tokens]] class), split each word into per-code-point
  * symbols, then apply the merges IN RANK ORDER, each as the greedy
  * left-to-right scan ([[graft.operators.Bpe]]'s mergeFold — repeated
  * pairs merge pairwise). Rank-order application is the standard BPE
  * tokenizer-apply rule, so a merge can consume the fused output of an
  * earlier merge, exactly like the chained folds.
  *
  * Case-mapping contract: lowercases with Java `Locale.ROOT` while the
  * fold spelling goes through Spark's `lower()` — the [[WinnowFps]]
  * caveat verbatim (agreement pinned beyond ASCII in BpeSpec; Turkish
  * dotted/dotless I corpora should pick one spelling throughout).
  *
  * Output: struct<n_words: long, n_tokens: long> — whitespace words and
  * BPE tokens after all merges (fertility = n_tokens / n_words).
  *
  * `byteLevel = true` switches the unit alphabet from code points to
  * GPT-2 BYTE UNITS ([[ByteUnitsOps]]): each whitespace word is
  * byte-unit pre-encoded before the per-symbol split, so unsegmented
  * scripts (CJK, Thai) decompose into trainable 3-byte unit triples
  * instead of opaque whole-word symbols, and NO input is ever
  * unrepresentable. Mirrors [[graft.operators.Bpe]]'s fold spelling
  * with the same flag (BpeSpec property-pins agreement on random
  * multibyte corpora; oracle-gated at `q_bpe_bytes_segment`).
  */
case class BpeSegmentStats(child: Expression, merges: Seq[(String, String)],
    byteLevel: Boolean = false, pretok: Boolean = false)
    extends UnaryExpression {

  override def dataType: DataType = StructType(Seq(
    StructField("n_words", LongType, nullable = false),
    StructField("n_tokens", LongType, nullable = false)))
  override def prettyName: String = "bpe_segment_stats"

  private lazy val lefts: Array[String] = merges.map(_._1).toArray
  private lazy val rights: Array[String] = merges.map(_._2).toArray

  override protected def nullSafeEval(input: Any): Any =
    BpeSegmentStats.compute(input.toString, lefts, rights, byteLevel, pretok)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val lRef = ctx.addReferenceObj("lefts", lefts, "java.lang.String[]")
    val rRef = ctx.addReferenceObj("rights", rights, "java.lang.String[]")
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.BpeSegmentStats.compute($c.toString(), $lRef, $rRef, $byteLevel, $pretok);")
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** `bpe_encode(text)` with the same frozen merge table — the EMIT step
  * of the tokenizer family: the per-document BPE token sequence itself
  * (words in order, each word's final symbols in order), the actual
  * pretraining data-prep output that [[BpeSegmentStats]] only counts.
  * Same tokenization, application rule, and case-mapping contract.
  * Output: array<string> of tokens; ids are a dictionary join away and
  * deliberately not baked in (the vocabulary is corpus state, not
  * expression state). `byteLevel` as in [[BpeSegmentStats]]: tokens are
  * then byte-UNIT strings ([[ByteUnitsOps]] alphabet), invertible back
  * to raw bytes with `byte_units_decode` once a word's tokens are
  * re-concatenated.
  */
case class BpeEncode(child: Expression, merges: Seq[(String, String)],
    byteLevel: Boolean = false, pretok: Boolean = false,
    dropMod: Int = 0, epoch: Int = 0)
    extends UnaryExpression {

  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def prettyName: String = "bpe_encode"

  private lazy val lefts: Array[String] = merges.map(_._1).toArray
  private lazy val rights: Array[String] = merges.map(_._2).toArray

  override protected def nullSafeEval(input: Any): Any =
    BpeSegmentStats.computeTokens(input.toString, lefts, rights, byteLevel,
      pretok, dropMod, epoch)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val lRef = ctx.addReferenceObj("lefts", lefts, "java.lang.String[]")
    val rRef = ctx.addReferenceObj("rights", rights, "java.lang.String[]")
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.BpeSegmentStats.computeTokens($c.toString(), $lRef, $rRef, $byteLevel, $pretok, $dropMod, $epoch);")
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object BpeSegmentStats {

  private def isWs(c: Char): Boolean =
    c == ' ' || c == '\t' || c == '\n' || c == '\f' || c == '\r'

  /** Compiled once per JVM: the GPT-2 pre-tokenization pattern
    * ([[TextFunctions.Gpt2PretokPattern]]). Pretok mode iterates these
    * matches (case-PRESERVING — GPT-2 does not lowercase; whitespace
    * runs are tokens too) instead of the whitespace/lowercase word scan.
    */
  private val Gpt2Pat: java.util.regex.Pattern =
    java.util.regex.Pattern.compile(TextFunctions.Gpt2PretokPattern)

  /** One word's symbols after applying every merge in rank order
    * (greedy left-to-right per merge). Symbols start per code point —
    * the `split(word, "")` fold-spelling boundary. `byteLevel` first
    * maps the word through the GPT-2 byte-unit bijection
    * ([[ByteUnitsOps.encodeString]]); every unit is a single BMP code
    * point, so the same per-code-point split then yields one symbol
    * per raw BYTE.
    */
  private def wordSyms(rawWord: String, lefts: Array[String],
      rights: Array[String], byteLevel: Boolean,
      dropMod: Int = 0, epoch: Int = 0): mutable.ArrayBuffer[String] = {
    val word = if (byteLevel) ByteUnitsOps.encodeString(rawWord) else rawWord
    var syms = mutable.ArrayBuffer.empty[String]
    var i = 0
    while (i < word.length) {
      val cp = word.codePointAt(i)
      val n = Character.charCount(cp)
      syms += word.substring(i, i + n)
      i += n
    }
    var m = 0
    while (m < lefts.length && syms.length > 1) {
      // BPE-dropout (Provilkov et al., ACL 2020), hash-deterministic at
      // the (word, merge-rank, epoch) granularity: merge rank m is
      // skipped for this word iff rolling_hash(word:m:epoch) % dropMod
      // hits 0 — the RAW tokenized word keys the draw, so both engines
      // and every occurrence of the word agree within an epoch while
      // epochs re-draw (the regularization the paper wants)
      val dropped = dropMod > 0 &&
        RollingHash.compute(rawWord + ":" + m + ":" + epoch) % dropMod == 0
      if (!dropped) {
        val l = lefts(m)
        val r = rights(m)
        val out = mutable.ArrayBuffer.empty[String]
        var j = 0
        while (j < syms.length) {
          val s = syms(j)
          if (out.nonEmpty && out.last == l && s == r) out(out.length - 1) = l + r
          else out += s
          j += 1
        }
        syms = out
      }
      m += 1
    }
    syms
  }

  /** Static for codegen: tokenize + apply the frozen table per word. */
  def compute(input: String, lefts: Array[String],
      rights: Array[String], byteLevel: Boolean, pretok: Boolean): InternalRow = {
    var nWords = 0L
    var nTokens = 0L
    if (pretok) {
      val m = Gpt2Pat.matcher(input)
      while (m.find()) {
        nWords += 1
        nTokens += wordSyms(m.group(), lefts, rights, byteLevel).length
      }
    } else {
      val text = input.toLowerCase(java.util.Locale.ROOT)
      var i = 0
      val len = text.length
      while (i < len) {
        while (i < len && isWs(text.charAt(i))) i += 1
        val start = i
        while (i < len && !isWs(text.charAt(i))) i += 1
        if (i > start) {
          nWords += 1
          nTokens += wordSyms(text.substring(start, i), lefts, rights, byteLevel).length
        }
      }
    }
    new GenericInternalRow(Array[Any](nWords, nTokens))
  }

  /** Static for codegen: tokenize + apply the frozen table + emit the
    * flattened token sequence (word order, then within-word symbol
    * order) — the [[BpeEncode]] body.
    */
  def computeTokens(input: String, lefts: Array[String],
      rights: Array[String], byteLevel: Boolean,
      pretok: Boolean, dropMod: Int = 0, epoch: Int = 0): GenericArrayData = {
    val out = mutable.ArrayBuffer.empty[Any]
    if (pretok) {
      val m = Gpt2Pat.matcher(input)
      while (m.find())
        wordSyms(m.group(), lefts, rights, byteLevel, dropMod, epoch).foreach { s =>
          out += org.apache.spark.unsafe.types.UTF8String.fromString(s)
        }
    } else {
      val text = input.toLowerCase(java.util.Locale.ROOT)
      var i = 0
      val len = text.length
      while (i < len) {
        while (i < len && isWs(text.charAt(i))) i += 1
        val start = i
        while (i < len && !isWs(text.charAt(i))) i += 1
        if (i > start)
          wordSyms(text.substring(start, i), lefts, rights, byteLevel,
            dropMod, epoch).foreach { s =>
            out += org.apache.spark.unsafe.types.UTF8String.fromString(s)
          }
      }
    }
    new GenericArrayData(out.toArray)
  }
}
