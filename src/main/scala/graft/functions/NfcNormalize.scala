package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftColumnBridge.{toColumn, toExpression}
import org.apache.spark.sql.catalyst.expressions.{ExpectsInputTypes, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** `nfc(text)` — Unicode canonical composition (NFC, UAX #15). Spark has
  * no normalization built-in; conformant implementations agree
  * bit-for-bit WHEN they implement the same Unicode version
  * (java.text.Normalizer here — the JDK's ICU data — vs utf8proc in the
  * DuckDB oracle's `nfc_normalize`). Recently assigned combining marks or
  * normalization-data corrections between versions can differ, so the
  * oracle gate pins its injected code points to characters stable across
  * Unicode versions (U+0301, U+030A — unchanged since Unicode 1.1); for
  * such stable text the result is oracle-exact. Null in → null out.
  */
object NfcOps {
  def nfc(s: UTF8String): UTF8String =
    if (s == null) null
    else UTF8String.fromString(
      java.text.Normalizer.normalize(s.toString, java.text.Normalizer.Form.NFC))
}

case class NfcNormalize(child: Expression)
  extends UnaryExpression with ExpectsInputTypes {

  override def dataType: DataType = StringType
  override def prettyName: String = "nfc"
  override def inputTypes = Seq(StringType)

  override protected def nullSafeEval(s: Any): Any =
    NfcOps.nfc(s.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, s =>
      s"${ev.value} = graft.functions.NfcOps.nfc($s);")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object NfcNormalize {
  def nfc(text: Column): Column = toColumn(NfcNormalize(toExpression(text)))
}
