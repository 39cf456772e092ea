package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftColumnBridge.{toColumn, toExpression}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{DataType, DoubleType}

/** `jaccard_sim(a, b)` — exact Jaccard similarity of two SORTED distinct
  * long arrays ([[ShingleHashes]] output) via a linear merge:
  * |a∩b| / (|a| + |b| − |a∩b|); 0.0 when both empty.
  *
  * Value-identical to `size(array_intersect(a,b)) / (size(a)+size(b)−∩)`
  * (and the DuckDB oracle) but O(|a|+|b|) with zero allocation — this runs
  * once per candidate pair in the dedup verification stage, the highest-
  * volume inner loop of a near-dup pass at scale.
  */
case class JaccardSim(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = DoubleType
  override def prettyName: String = "jaccard_sim"

  override protected def nullSafeEval(l: Any, r: Any): Any =
    JaccardSim.compute(l.asInstanceOf[ArrayData], r.asInstanceOf[ArrayData])

  /** Whole-stage codegen: a static call on the children's generated
    * values — no InternalRow re-materialization, no boxing (preference
    * (b) of the build brief, with real `doGenCode`).
    */
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) =>
      s"${ev.value} = graft.functions.JaccardSim.compute($a, $b);")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

object JaccardSim {
  /** Linear merge over sorted distinct long arrays (static for codegen). */
  def compute(a: ArrayData, b: ArrayData): Double = {
    val na = a.numElements()
    val nb = b.numElements()
    if (na + nb == 0) return 0.0
    var i = 0
    var j = 0
    var inter = 0
    while (i < na && j < nb) {
      val x = a.getLong(i)
      val y = b.getLong(j)
      if (x == y) { inter += 1; i += 1; j += 1 }
      else if (x < y) i += 1
      else j += 1
    }
    inter.toDouble / (na + nb - inter).toDouble
  }

  def jaccard_sim(a: Column, b: Column): Column =
    toColumn(JaccardSim(toExpression(a), toExpression(b)))
}
