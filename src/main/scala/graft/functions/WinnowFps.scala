package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftColumnBridge.{toColumn, toExpression}
import org.apache.spark.sql.catalyst.expressions.{Expression, GenericInternalRow, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._

import scala.collection.mutable

/** `winnow_fps(text, k, w)` — winnowing fingerprints (Schleimer et al.)
  * in ONE pass: tokenize, roll the word-k-gram hash sequence (the
  * [[ShingleHashes]] arithmetic, order kept, duplicates kept), then
  * select each w-window's RIGHTMOST minimal hash with a monotonic deque
  * — O(m) total, each hash pushed and popped at most once.
  *
  * Replaces the HOF spelling (slice per window + array_min re-evaluated
  * per zip element ≈ O(m·w²) with an allocation per window, measured
  * 2.7 s/6.8 s on the sf0.1 fingerprint/match queries): same integer
  * results, property-pinned in WinnowingSpec against the HOF twin.
  *
  * Output: array<struct<pos:int, fp:bigint>>, pos the 1-based index into
  * the shingle sequence, consecutive duplicate selections collapsed
  * (a position can only repeat in adjacent windows — once a rival hash
  * pops it or outlives it, it never returns).
  *
  * Case-mapping contract: [[WinnowFps.compute]] lowercases with Java
  * `Locale.ROOT` while the HOF twin goes through Spark's `lower()` —
  * equivalent on ASCII, accented Latin, Cyrillic, and Greek incl. the
  * contextual final sigma (WinnowingSpec pins the non-ASCII set), but
  * locale-special mappings outside Unicode's default algorithm (the
  * Turkish dotted/dotless I family) are not guaranteed identical across
  * the two spellings; a corpus in that regime should pick ONE spelling
  * for both fingerprint and match sides (they are self-consistent).
  */
case class WinnowFps(child: Expression, k: Int, w: Int)
    extends UnaryExpression {

  override def dataType: DataType = ArrayType(
    StructType(Seq(
      StructField("pos", IntegerType, nullable = false),
      StructField("fp", LongType, nullable = false))),
    containsNull = false)
  override def prettyName: String = "winnow_fps"

  override protected def nullSafeEval(input: Any): Any =
    WinnowFps.compute(input.toString, k, w)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.WinnowFps.compute($c.toString(), $k, $w);")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object WinnowFps {
  private val P = 1000000007L

  /** One-pass tokenize + shingle-hash sequence + rightmost-min winnow
    * (static for codegen).
    */
  def compute(input: String, k: Int, w: Int): GenericArrayData = {
    val text = input.toLowerCase(java.util.Locale.ROOT)
    def isWs(c: Char): Boolean =
      c == ' ' || c == '\t' || c == '\n' || c == '\f' || c == '\r'
    val tokens = mutable.ArrayBuffer.empty[(Int, Int)]
    var i = 0
    val len = text.length
    while (i < len) {
      while (i < len && isWs(text.charAt(i))) i += 1
      val start = i
      while (i < len && !isWs(text.charAt(i))) i += 1
      if (i > start) tokens += ((start, i))
    }
    val m = tokens.length
    if (m < k) return new GenericArrayData(Array.empty[Any])
    // ordered shingle-hash sequence (duplicates kept — winnowing is
    // positional, unlike the MinHash input SET)
    val nH = m - k + 1
    val hs = new Array[Long](nH)
    var s = 0
    while (s < nH) {
      var h = 0L
      var g = 0
      while (g < k) {
        if (g > 0) h = (h * 31 + ' '.toInt) % P
        val (ts, te) = tokens(s + g)
        var p = ts
        while (p < te) {
          val cp = text.codePointAt(p)
          h = (h * 31 + cp) % P
          p += Character.charCount(cp)
        }
        g += 1
      }
      hs(s) = h
      s += 1
    }
    // monotonic deque: back-pop on >= keeps the RIGHTMOST minimal at the
    // front of each completed window
    val ww = math.min(w, nH)
    val dq = new Array[Int](nH)
    var head = 0
    var tail = 0 // exclusive
    val out = mutable.ArrayBuffer.empty[Any]
    var lastPos = -1
    var j = 0
    while (j < nH) {
      while (tail > head && hs(dq(tail - 1)) >= hs(j)) tail -= 1
      dq(tail) = j
      tail += 1
      if (j >= ww - 1) {
        val lo = j - ww + 1
        while (dq(head) < lo) head += 1
        val selIdx = dq(head)
        if (selIdx != lastPos) {
          out += new GenericInternalRow(Array[Any](selIdx + 1, hs(selIdx)))
          lastPos = selIdx
        }
      }
      j += 1
    }
    new GenericArrayData(out.toArray)
  }

  def winnow_fps(text: Column, k: Int, w: Int): Column =
    toColumn(WinnowFps(toExpression(text), k, w))
}
