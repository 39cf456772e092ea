package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftColumnBridge.{toColumn, toExpression}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode, FalseLiteral}
import org.apache.spark.sql.catalyst.expressions.codegen.Block._
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{DataType, LongType}

/** `simhash62(mixedHashes)` — 62-bit SimHash in ONE traversal: per input
  * hash, every bit counter takes ±1; bit b of the result is set iff
  * counter(b) > 0 (majority of ones).
  *
  * Replaces 62 separate `aggregate` folds over the same array (one per
  * bit, each through interpreted lambda closures). Pure integer
  * arithmetic, so any accumulation order gives the identical result —
  * exact vs both the HOF form and the DuckDB oracle
  * (`2*len(list_filter(ones)) > len(mh)` per bit).
  *
  * Null semantics mirror the HOF form exactly: a null ARRAY yields 0
  * (each `when(weight > 0, …)` falls to its otherwise-0 branch), and a
  * null ELEMENT contributes −1 to every bit counter (the HOF's
  * `when(shiftright(null,b)%2 === 1, 1).otherwise(-1)` takes the
  * otherwise branch) — i.e. a null element behaves like the hash 0L.
  * The expression is never null.
  */
case class SimHash62(child: Expression) extends UnaryExpression {

  override def dataType: DataType = LongType
  override def nullable: Boolean = false
  override def prettyName: String = "simhash62"

  override def eval(input: InternalRow): Any =
    SimHash62.compute62(child.eval(input).asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val childGen = child.genCode(ctx)
    ev.copy(
      code =
        code"""
          ${childGen.code}
          long ${ev.value} = graft.functions.SimHash62.compute62(
            ${childGen.isNull} ? null : ${childGen.value});""",
      isNull = FalseLiteral)
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object SimHash62 {

  /** One traversal, 62 counters; static for codegen. */
  def compute62(mh: ArrayData): Long = {
    if (mh == null) return 0L
    val n = mh.numElements()
    val counts = new Array[Int](62)
    var k = 0
    while (k < n) {
      // null element ≡ hash 0L: −1 on every counter, as the HOF fold.
      // NEGATIVE hashes likewise contribute −1 on every bit: the HOF
      // tested `(h >> b) % 2 === 1`, and an arithmetic-shifted negative
      // long's remainder is 0 or −1, never 1 (mixedTokenHashes stays in
      // [0, 2^62), but the function must match the fold on any input).
      val h = if (mh.isNullAt(k)) 0L else mh.getLong(k)
      var b = 0
      while (b < 62) {
        if (h >= 0 && ((h >> b) & 1L) == 1L) counts(b) += 1 else counts(b) -= 1
        b += 1
      }
      k += 1
    }
    var sh = 0L
    var b = 0
    while (b < 62) {
      if (counts(b) > 0) sh |= 1L << b
      b += 1
    }
    sh
  }

  def simhash62(mixed: Column): Column =
    toColumn(SimHash62(toExpression(mixed)))
}
