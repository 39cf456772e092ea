package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftColumnBridge.{toColumn, toExpression}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}

import scala.collection.mutable

/** `shingle_hashes(text, n)` — distinct polynomial hashes of the word
  * n-gram shingles of `text`, in one pass: lowercase, whitespace-tokenize,
  * and roll the hash of `"tokᵢ tokᵢ₊₁ … tokᵢ₊ₙ₋₁"` directly from
  * precomputed per-token hashes — no intermediate token/shingle arrays, no
  * per-char lambda boxing.
  *
  * Arithmetic identical to the HOF composition
  * `array_distinct(transform(shingles(tokens(text), n), rollingHash))`
  * ([[TextFunctions]], and the DuckDB oracle): hash(s) = fold over
  * codepoints of (acc·31 + cp) mod P. Speed: the HOF pipeline allocates
  * ~#chars objects per row; this allocates one buffer — the difference
  * between a dedup pass being compute-bound or GC-bound at 100 TB.
  */
case class ShingleHashes(child: Expression, n: Int)
    extends UnaryExpression {

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "shingle_hashes"

  override protected def nullSafeEval(input: Any): Any =
    ShingleHashes.compute(input.toString, n)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.ShingleHashes.compute($c.toString(), $n);")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object ShingleHashes {
  private val P = 1000000007L

  /** One-pass tokenize+shingle+hash (static for codegen). */
  def compute(input: String, n: Int): GenericArrayData = {
    val text = input.toLowerCase(java.util.Locale.ROOT) // locale-stable, = SQL lower()
    // tokenize: spans of non-whitespace (— matches split(lower, "\s+") with
    // empty tokens filtered)
    // whitespace = the explicit class [ \t\n\f\r]: the exact common
    // semantics of the HOF twin's regex and the DuckDB oracle's RE2 —
    // Character.isWhitespace would also split on U+3000 etc. and diverge
    def isWs(c: Char): Boolean =
      c == ' ' || c == '\t' || c == '\n' || c == '\f' || c == '\r'
    val tokens = mutable.ArrayBuffer.empty[(Int, Int)] // (start, end) spans
    var i = 0
    val len = text.length
    while (i < len) {
      while (i < len && isWs(text.charAt(i))) i += 1
      val start = i
      while (i < len && !isWs(text.charAt(i))) i += 1
      if (i > start) tokens += ((start, i))
    }
    val m = tokens.length
    if (m < n) return new GenericArrayData(Array.emptyLongArray)
    val hs = new Array[Long](m - n + 1)
    var s = 0
    while (s <= m - n) {
      var h = 0L
      var g = 0
      while (g < n) {
        if (g > 0) h = (h * 31 + ' '.toInt) % P
        val (ts, te) = tokens(s + g)
        var k = ts
        while (k < te) {
          val cp = text.codePointAt(k)
          h = (h * 31 + cp) % P
          k += Character.charCount(cp)
        }
        g += 1
      }
      hs(s) = h
      s += 1
    }
    // sorted + deduped: set semantics (order never observed downstream),
    // and sortedness lets JaccardSim do a linear merge instead of hashing
    java.util.Arrays.sort(hs)
    var w = 0
    var r = 0
    while (r < hs.length) {
      if (w == 0 || hs(w - 1) != hs(r)) { hs(w) = hs(r); w += 1 }
      r += 1
    }
    new GenericArrayData(java.util.Arrays.copyOf(hs, w))
  }

  def shingle_hashes(text: Column, n: Int = 3): Column =
    toColumn(ShingleHashes(toExpression(text), n))
}
