package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftColumnBridge.{toColumn, toExpression}
import org.apache.spark.sql.catalyst.expressions.{ExpectsInputTypes, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** `neg_table_sample(hmod)` — the FROZEN face of the unigram^(3/4)
  * negative-sampling draw ([[graft.operators.Word2Vec
  * .negativeSamplingTable]]): the vocabulary-bounded interval table
  * rides the plan as a codegen reference object (the
  * [[BloomContainsCount]] / [[BpeEncode]] metadata-inlining
  * discipline) and each draw resolves by BINARY SEARCH — O(log V) per
  * row, no join, no shuffle, where the oracle-twin interval join's
  * BroadcastNestedLoopJoin pays O(V) comparisons per row. At
  * vocabularies ≫ 10⁴ this is the deployment shape; the join spelling
  * remains the oracle-gated reference.
  *
  * Contract: `cums` is the EXCLUSIVE running total of the table's
  * `w34` weights in vid order (so `cums(0) == 0`, strictly covering
  * `[0, Σw34)` except for zero-width entries); `toks(i)` is entry i's
  * token. A draw `h ∈ [0, Σw34)` picks the RIGHTMOST entry with
  * `cums(i) ≤ h` — equal cums (zero-width entries, impossible from
  * `vocabulary()` frames where every `n_occ ≥ 1` but handled anyway)
  * resolve to the later entry, whose interval is the one actually
  * containing `h`. Out-of-range draws return null LOUDLY upstream:
  * callers mod by Σw34 first.
  */
object NegTableOps {
  /** Rightmost index with cums(i) <= h, by binary search. */
  def pick(h: Long, cums: Array[Long], toks: Array[UTF8String]): UTF8String = {
    var lo = 0
    var hi = cums.length - 1
    // invariant: cums(lo) <= h (cums(0) == 0 <= h for valid draws)
    while (lo < hi) {
      val mid = lo + (hi - lo + 1) / 2
      if (cums(mid) <= h) lo = mid else hi = mid - 1
    }
    toks(lo)
  }
}

case class NegTableSample(child: Expression, cums: Array[Long],
    toks: Array[UTF8String])
  extends UnaryExpression with ExpectsInputTypes {

  require(cums.nonEmpty && cums.length == toks.length,
    s"neg_table_sample needs one cum per token, got ${cums.length}/${toks.length}")
  require(cums(0) == 0L,
    s"cums must be the EXCLUSIVE running total (cums(0) == 0), got ${cums(0)}")

  override def dataType: DataType = StringType
  override def prettyName: String = "neg_table_sample"
  override def inputTypes = Seq(LongType)

  override protected def nullSafeEval(h: Any): Any =
    NegTableOps.pick(h.asInstanceOf[Long], cums, toks)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val cumsRef = ctx.addReferenceObj("cums", cums, "long[]")
    val toksRef = ctx.addReferenceObj("toks", toks,
      "org.apache.spark.unsafe.types.UTF8String[]")
    nullSafeCodeGen(ctx, ev, h =>
      s"${ev.value} = graft.functions.NegTableOps.pick($h, $cumsRef, $toksRef);")
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object NegTableSample {
  def negTableSample(hmod: Column, cums: Array[Long], toks: Array[String]): Column =
    toColumn(NegTableSample(toExpression(hmod), cums,
      toks.map(UTF8String.fromString)))
}
