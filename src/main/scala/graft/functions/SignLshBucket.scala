package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftColumnBridge.{toColumn, toExpression}
import org.apache.spark.sql.catalyst.expressions.{ExpectsInputTypes, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, LongType}

/** `sign_lsh_bucket(v, planes)` — the random-hyperplane LSH bucket id in
  * ONE traversal of the vector: bit j = sign of ⟨v, h_j⟩ with the
  * deterministic pseudo-random hyperplane
  * `h_j[d] = pmod((j·1024 + d + 1)·2654435761, P)/P − 0.5`.
  *
  * Bit-parity with the HOF spelling (per plane:
  * `aggregate(zip_with(v, sequence(...), (x,d) => x·h), 0.0, +)`) and
  * with the oracle's list_reduce: same hyperplane integer arithmetic,
  * same left-fold accumulation order per plane — every IEEE operation is
  * replayed in sequence. The HOF form walks the array once PER PLANE
  * through interpreted lambda evaluation; this expression walks it once
  * total inside whole-stage codegen. Null in → null out; an empty vector
  * projects 0 on every plane → bucket 0 (matching the empty-fold zero).
  */
object SignLshOps {
  private val P = 1000000007L
  private val A = 2654435761L
  private val DIM_STRIDE = 1024L

  def bucket(v: ArrayData, planes: Int): Long = {
    val n = v.numElements()
    var out = 0L
    var j = 0
    while (j < planes) {
      var acc = 0.0
      var d = 0
      while (d < n) {
        val h = java.lang.Math.floorMod((j * DIM_STRIDE + d + 1L) * A, P).toDouble / P - 0.5
        acc += v.getDouble(d) * h
        d += 1
      }
      if (acc > 0) out += (1L << j)
      j += 1
    }
    out
  }
}

case class SignLshBucket(child: Expression, planes: Int)
  extends UnaryExpression with ExpectsInputTypes {

  require(planes > 0 && planes < 63, s"planes must be in [1, 62], got $planes")

  override def dataType: DataType = LongType
  override def prettyName: String = "sign_lsh_bucket"
  override def inputTypes = Seq(ArrayType(DoubleType))

  override protected def nullSafeEval(v: Any): Any =
    SignLshOps.bucket(v.asInstanceOf[ArrayData], planes)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, v =>
      s"${ev.value} = graft.functions.SignLshOps.bucket($v, $planes);")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object SignLshBucket {
  def sign_lsh_bucket(v: Column, planes: Int): Column =
    toColumn(SignLshBucket(toExpression(v), planes))
}
