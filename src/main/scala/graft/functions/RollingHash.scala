package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftColumnBridge.{toColumn, toExpression}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, LongType}

/** `rolling_hash(s)` — polynomial hash over the string's UNICODE CODE
  * POINTS: fold(acc·31 + cp) mod 1e9+7.
  *
  * Replaces the HOF formulation `aggregate(split(s, ""), ...ascii(c)...)`:
  * Spark's `ascii()` returns the replacement char (65533) for every
  * non-ASCII character, which would collapse all CJK text onto one hash
  * value — silently over-merging multilingual corpora in dedup. This
  * expression matches the DuckDB oracle's `unicode(c)` for the whole BMP+
  * supplementary range, and is a single pass with no per-char boxing.
  */
case class RollingHash(child: Expression)
    extends UnaryExpression {

  override def dataType: DataType = LongType
  override def prettyName: String = "rolling_hash"

  override protected def nullSafeEval(input: Any): Any =
    RollingHash.compute(input.toString)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.RollingHash.compute($c.toString());")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object RollingHash {
  private val P = 1000000007L

  def compute(s: String): Long = {
    var h = 0L
    var i = 0
    while (i < s.length) {
      val cp = s.codePointAt(i)
      h = (h * 31 + cp) % P
      i += Character.charCount(cp)
    }
    h
  }

  def rolling_hash(s: Column): Column = toColumn(RollingHash(toExpression(s)))
}
