package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftColumnBridge.{toColumn, toExpression}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode, FalseLiteral}
import org.apache.spark.sql.catalyst.expressions.codegen.Block._
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** `lang_id(tokens)` — marker-stopword language ID in ONE traversal of
  * the token array.
  *
  * The HOF spelling ([[graft.operators.TextAnalysis.langIdHof]]) builds 5
  * `size(filter(toks, _.isInCollection(markers)))` scores, a `greatest`,
  * and a `when(s === best && best > 0, …)` fold — and because
  * lambda-bearing higher-order functions are excluded from Catalyst's
  * subexpression elimination, every one of the ~30 references to a score
  * or the max re-runs its full array traversal. This expression walks the
  * array once, resolves each token to a bitmask of the languages whose
  * marker set contains it (markers overlap across languages — e.g. "la"
  * is both fr and es, "de" both en-adjacent es and de's article set — so
  * a mask, not a single tag), and takes the first-declared argmax.
  *
  * Exact-parity contract with the HOF fold (property-pinned in
  * LangIdSpec):
  *   - languages scored in declaration order en, de, fr, es, zh; ties on
  *     the maximum go to the earliest language (the fold keeps the first
  *     `s === best` hit);
  *   - `best == 0` ⇒ "und";
  *   - a NULL array ⇒ "und" (every `when` condition is null ⇒ fold
  *     bottoms out at its literal), and the result is never null;
  *   - NULL elements are skipped (`isInCollection(null)` is null ⇒
  *     `filter` drops the row);
  *   - tokens are matched verbatim — no lowercasing here; the tokenizer
  *     upstream already lowercased.
  */
case class LangId(child: Expression) extends UnaryExpression {

  override def dataType: DataType = StringType
  override def nullable: Boolean = false
  override def prettyName: String = "lang_id"

  override def eval(input: InternalRow): Any =
    LangId.compute(child.eval(input).asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val childGen = child.genCode(ctx)
    ev.copy(
      code =
        code"""
          ${childGen.code}
          org.apache.spark.unsafe.types.UTF8String ${ev.value} = graft.functions.LangId.compute(
            ${childGen.isNull} ? null : ${childGen.value});""",
      isNull = FalseLiteral)
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object LangId {

  /** Declaration order = tie-break order; must match the HOF fold and the
    * oracle's CASE chain (M5Queries.textQualityOracle).
    */
  val langs: Array[String] = Array("en", "de", "fr", "es", "zh")

  private val utf8Langs: Array[UTF8String] = langs.map(UTF8String.fromString)
  private val und: UTF8String = UTF8String.fromString("und")

  /** token → bitmask of languages whose marker set contains it. Built from
    * the same [[TextFunctions.langMarkers]] the HOF spelling and the
    * oracle SQL read, so the three stay in lockstep by construction.
    */
  private val markerMask: java.util.HashMap[UTF8String, Integer] = {
    val m = new java.util.HashMap[UTF8String, Integer]()
    langs.zipWithIndex.foreach { case (l, i) =>
      TextFunctions.langMarkers(l).foreach { w =>
        val k = UTF8String.fromString(w)
        m.put(k, Integer.valueOf(m.getOrDefault(k, 0).intValue() | (1 << i)))
      }
    }
    m
  }

  /** One traversal; static for codegen. Null array → "und", never null. */
  def compute(toks: ArrayData): UTF8String = {
    if (toks == null) return und
    val k = langs.length
    val counts = new Array[Int](k)
    val n = toks.numElements()
    var i = 0
    while (i < n) {
      if (!toks.isNullAt(i)) {
        val mask = markerMask.get(toks.getUTF8String(i))
        if (mask != null) {
          val mv = mask.intValue()
          var j = 0
          while (j < k) {
            if ((mv & (1 << j)) != 0) counts(j) += 1
            j += 1
          }
        }
      }
      i += 1
    }
    var best = 0
    var bi = -1
    var j = 0
    while (j < k) {
      if (counts(j) > best) { best = counts(j); bi = j } // strict > keeps first max
      j += 1
    }
    if (best > 0) utf8Langs(bi) else und
  }

  def lang_id(toks: Column): Column = toColumn(LangId(toExpression(toks)))
}
