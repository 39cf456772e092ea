package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftColumnBridge.{toColumn, toExpression}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.types.{DataType, LongType}
import org.apache.spark.unsafe.types.UTF8String
import org.apache.spark.util.sketch.CountMinSketch

/** `cms_estimate(sketch, item)` — point estimate of `item`'s frequency
  * from a serialized [[CountMinSketch]] (the binary produced by Spark's
  * `count_min_sketch` aggregate; string items hash identically on the add
  * and probe sides — both go through the sketch library's UTF-8-bytes
  * path).
  *
  * Evaluation memoizes the deserialized sketch per expression instance
  * keyed on the bytes' content: the probe stage joins a FEW per-group
  * sketches to a few hundred candidate rows, so consecutive rows carry
  * the same sketch and deserialization happens once per group per task,
  * not per row. CodegenFallback is deliberate — the probe side of a
  * heavy-hitter plan is candidate-sized (bounded by groups × candidates),
  * never corpus-sized, so interpreter overhead is noise there and the
  * corpus-sized side (the aggregate) stays in the built-in codegen path.
  */
case class CmsEstimateExpr(left: Expression, right: Expression)
    extends BinaryExpression with CodegenFallback {

  override def dataType: DataType = LongType
  override def prettyName: String = "cms_estimate"

  @transient private var lastBytes: Array[Byte] = _
  @transient private var lastSketch: CountMinSketch = _

  override protected def nullSafeEval(sketchAny: Any, itemAny: Any): Any = {
    val bytes = sketchAny.asInstanceOf[Array[Byte]]
    // rows materialize fresh arrays — compare content, rebuild on change
    if (lastSketch == null || !java.util.Arrays.equals(bytes, lastBytes)) {
      lastSketch = CountMinSketch.readFrom(new java.io.ByteArrayInputStream(bytes))
      lastBytes = bytes
    }
    lastSketch.estimateCount(itemAny.asInstanceOf[UTF8String].toString)
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

object CmsEstimate {
  def cms_estimate(sketch: Column, item: Column): Column =
    toColumn(CmsEstimateExpr(toExpression(sketch), toExpression(item)))
}
