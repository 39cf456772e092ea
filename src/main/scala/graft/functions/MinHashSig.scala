package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftColumnBridge.{toColumn, toExpression}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}

/** `minhash_sig(hashes, perms)` — MinHash signature over a set of 64-bit
  * shingle hashes: for permutation i, min over x of
  * ((2i+1)·x + 7919·i + 13) mod P, P = 1e9+7; empty set ⇒ P sentinel.
  *
  * Same arithmetic as [[TextFunctions.minhashSignature]] (and the DuckDB
  * oracle), but ONE traversal of the hash array computes all `perms`
  * minima. The HOF formulation re-evaluates its (inlined) child array once
  * per permutation — a 16× re-tokenization per row after CollapseProject —
  * which is exactly the hot loop a 100 TB dedup pass cannot afford. This
  * is preference order (b) from the build brief: a custom scalar
  * `Expression` where composed built-ins can't express the computation
  * efficiently.
  */
case class MinHashSig(child: Expression, perms: Int)
    extends UnaryExpression {

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "minhash_sig"

  override protected def nullSafeEval(input: Any): Any =
    MinHashSig.compute(input.asInstanceOf[ArrayData], perms)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.MinHashSig.compute($c, $perms);")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object MinHashSig {
  private val P = 1000000007L

  /** One traversal computes all permutation minima (static for codegen). */
  def compute(hashes: ArrayData, perms: Int): ArrayData = {
    val n = hashes.numElements()
    val mins = Array.fill(perms)(P)
    var k = 0
    while (k < n) {
      val x = hashes.getLong(k)
      var i = 0
      while (i < perms) {
        val h = ((2L * i + 1L) * x + 7919L * i + 13L) % P
        if (h < mins(i)) mins(i) = h
        i += 1
      }
      k += 1
    }
    new GenericArrayData(mins)
  }

  def minhash_sig(hashes: Column, perms: Int): Column =
    toColumn(MinHashSig(toExpression(hashes), perms))
}
