package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftColumnBridge.{toColumn, toExpression}
import org.apache.spark.sql.catalyst.expressions.{ExpectsInputTypes, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._
import org.apache.spark.util.sketch.BloomFilter

/** `bloom_contains_count(hashes)` — how many elements of a long-array
  * column might be members of a driver-resident Bloom filter, carried as
  * a codegen reference object (the same metadata-inlining discipline as
  * [[NearestCentroidId]]: the filter is built ONCE, distributively, and
  * the membership probe is a narrow per-row loop — no join, no shuffle).
  *
  * Bloom semantics: zero false negatives (a true member always counts),
  * bounded false-positive rate — so a count of 0 PROVES no overlap, and
  * any decontamination verdict derived from this expression is a
  * superset of the exact one.
  */
object BloomOps {
  def containsCount(hashes: ArrayData, bf: BloomFilter): Long = {
    val n = hashes.numElements()
    var c = 0L
    var i = 0
    while (i < n) {
      if (bf.mightContainLong(hashes.getLong(i))) c += 1
      i += 1
    }
    c
  }
}

case class BloomContainsCount(child: Expression, bf: BloomFilter)
  extends UnaryExpression with ExpectsInputTypes {

  override def dataType: DataType = LongType
  override def prettyName: String = "bloom_contains_count"
  override def inputTypes = Seq(ArrayType(LongType))

  override protected def nullSafeEval(h: Any): Any =
    BloomOps.containsCount(h.asInstanceOf[ArrayData], bf)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val bfRef = ctx.addReferenceObj("bf", bf,
      classOf[BloomFilter].getName)
    nullSafeCodeGen(ctx, ev, h =>
      s"${ev.value} = graft.functions.BloomOps.containsCount($h, $bfRef);")
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object BloomExpressions {
  def bloomContainsCount(hashes: Column, bf: BloomFilter): Column =
    toColumn(BloomContainsCount(toExpression(hashes), bf))
}
