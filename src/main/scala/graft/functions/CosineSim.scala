package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftColumnBridge.{toColumn, toExpression}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, ImplicitCastInputTypes}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType}

/** `cosine_sim(a, b)` — cosine similarity of two double arrays in ONE
  * traversal: dot product and both norms accumulate in the same pass.
  *
  * Bit-identical to the HOF formulation
  * `aggregate(zip_with(a,b,*),0.0,+) / (sqrt(aggregate(transform(a,x*x),0.0,+)) * …)`
  * and to the DuckDB oracle's `list_reduce(list_prepend(0.0, …), +)`:
  * every accumulation is the same sequential left fold, so the engines
  * agree to the last ulp. The HOF version walks the arrays three times
  * through lambda closures; this is a single fused loop with native
  * codegen — the inner kernel of every embedding query (top-k, near-dup,
  * LSH verify, IVF), executed O(candidates) times per pass.
  *
  * Null semantics mirror the HOF form: null when either array is null,
  * when lengths differ, or when any element is null (zip_with pads /
  * null-propagates into the fold).
  */
case class CosineSim(left: Expression, right: Expression)
    extends BinaryExpression with ImplicitCastInputTypes {

  // implicit cast: array<float> (the embeddings storage type) is coerced
  // to array<double> at analysis instead of getDouble reading garbage
  // from 4-byte slots (result type inferred — AbstractDataType is
  // private[sql])
  override def inputTypes = Seq(ArrayType(DoubleType), ArrayType(DoubleType))
  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true
  override def prettyName: String = "cosine_sim"

  override protected def nullSafeEval(a: Any, b: Any): Any =
    CosineSim.compute(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) =>
      s"""
         |java.lang.Double ${ev.value}_r = graft.functions.CosineSim.compute($a, $b);
         |if (${ev.value}_r == null) { ${ev.isNull} = true; }
         |else { ${ev.value} = ${ev.value}_r.doubleValue(); }
       """.stripMargin)

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

object CosineSim {

  /** Single-pass fold; static for codegen. Returns null (boxed) on length
    * mismatch or null elements — the HOF null-propagation semantics.
    */
  def compute(a: ArrayData, b: ArrayData): java.lang.Double = {
    val n = a.numElements()
    if (b.numElements() != n) return null
    var dot = 0.0
    var na = 0.0
    var nb = 0.0
    var i = 0
    while (i < n) {
      if (a.isNullAt(i) || b.isNullAt(i)) return null
      val x = a.getDouble(i)
      val y = b.getDouble(i)
      dot += x * y
      na += x * x
      nb += y * y
      i += 1
    }
    // zero-norm (incl. empty) arrays: the HOF form divides by 0.0, which
    // is NULL under Spark's non-ANSI Divide — NOT NaN (NaN sorts above
    // every value and passes >= filters, corrupting top-k)
    val denom = math.sqrt(na) * math.sqrt(nb)
    if (denom == 0.0) null else java.lang.Double.valueOf(dot / denom)
  }

  def cosine_sim(a: Column, b: Column): Column =
    toColumn(CosineSim(toExpression(a), toExpression(b)))
}
