package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftColumnBridge.{toColumn, toExpression}
import org.apache.spark.sql.catalyst.expressions.{ExpectsInputTypes, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** GPT-2 byte-level pre-encoding — the `bytes_to_unicode` bijection from
  * the PUBLIC GPT-2 encoder (Radford et al. 2019, released encoder.py;
  * the same table ships in every BPE tokenizer descended from it):
  * every UTF-8 BYTE of the input maps to exactly one printable BMP
  * character — the 188 printable latin-1 bytes (33–126, 161–172,
  * 174–255) map to their own code points, the remaining 68 bytes map to
  * `256 + k` in ascending byte order (so byte 0x20 → U+0120 'Ġ', byte
  * 0x0A → U+010A, …). Consequences, and why every byte-level tokenizer
  * uses it:
  *
  *  - EVERY possible input is representable over a FIXED 256-char unit
  *    alphabet — no `<unk>`, ever;
  *  - unsegmented scripts (CJK, Thai) decompose into 3-byte unit
  *    triples that BPE merges back into learned blocks, instead of
  *    passing through the whitespace tokenizer as untrainable
  *    whole-sentence tokens — the round-13 verdict's "biggest honest
  *    gap" in this tokenizer family;
  *  - no unit char is whitespace or a control char, so unit strings
  *    travel safely through every downstream string operator (the
  *    word-separator and chr(31) oracle contracts hold by construction).
  *
  * The map is a bijection; [[ByteUnitsDecode]] inverts it EXACTLY.
  * Oracle-gated against an independent DuckDB hex-dump spelling:
  * `q_bpe_bytes_units` (forward map), `q_bpe_bytes_roundtrip`
  * (decode ∘ encode ≡ id), and wired through the whole [[
  * graft.operators.Bpe]] lifecycle as its `byteLevel` unit alphabet
  * (`q_bpe_bytes_merges` / `q_bpe_bytes_segment` /
  * `q_bpe_bytes_encode`). Both directions are reference-object codegen
  * one-liners — constant plan size, whole-stage codegen, purely
  * narrow.
  */
object ByteUnitsOps {

  /** byte value (0–255) → unit char. Printable latin-1 self-maps; the
    * 68 others take 256+k in ascending byte order (k dense 0–67).
    */
  val byteToUnit: Array[Char] = {
    val a = new Array[Char](256)
    var n = 0
    var b = 0
    while (b < 256) {
      val printable = (b >= 33 && b <= 126) || (b >= 161 && b <= 172) ||
        (b >= 174 && b <= 255)
      if (printable) a(b) = b.toChar
      else { a(b) = (256 + n).toChar; n += 1 }
      b += 1
    }
    a
  }

  /** unit char code point (< 324) → byte value, −1 for non-units. */
  val unitToByte: Array[Int] = {
    val a = Array.fill(324)(-1)
    var b = 0
    while (b < 256) { a(byteToUnit(b)) = b; b += 1 }
    a
  }

  def encodeString(s: String): String = {
    val bytes = s.getBytes(java.nio.charset.StandardCharsets.UTF_8)
    val cs = new Array[Char](bytes.length)
    var i = 0
    while (i < bytes.length) { cs(i) = byteToUnit(bytes(i) & 0xff); i += 1 }
    new String(cs)
  }

  def encode(s: UTF8String): UTF8String =
    if (s == null) null
    else {
      val bytes = s.getBytes
      val cs = new Array[Char](bytes.length)
      var i = 0
      while (i < bytes.length) { cs(i) = byteToUnit(bytes(i) & 0xff); i += 1 }
      UTF8String.fromString(new String(cs))
    }

  /** Exact inverse; a char outside the unit alphabet fails LOUD (the
    * input was not produced by [[encode]] — silently guessing a byte
    * would corrupt the reconstruction).
    */
  def decode(s: UTF8String): UTF8String =
    if (s == null) null
    else {
      val str = s.toString
      val out = new Array[Byte](str.length)
      var i = 0
      while (i < str.length) {
        val c = str.charAt(i)
        val b = if (c < 324) unitToByte(c) else -1
        if (b < 0) throw new IllegalArgumentException(
          f"byte_units_decode: U+${c.toInt}%04X is not a byte unit — " +
            "input was not produced by byte_units()")
        out(i) = b.toByte
        i += 1
      }
      UTF8String.fromBytes(out)
    }
}

/** `byte_units(text)` — the GPT-2 byte→unit pre-encoding as a column. */
case class ByteUnits(child: Expression)
  extends UnaryExpression with ExpectsInputTypes {

  override def dataType: DataType = StringType
  override def prettyName: String = "byte_units"
  override def inputTypes = Seq(StringType)

  override protected def nullSafeEval(s: Any): Any =
    ByteUnitsOps.encode(s.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, s =>
      s"${ev.value} = graft.functions.ByteUnitsOps.encode($s);")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** `byte_units_decode(units)` — exact inverse of [[ByteUnits]]. */
case class ByteUnitsDecode(child: Expression)
  extends UnaryExpression with ExpectsInputTypes {

  override def dataType: DataType = StringType
  override def prettyName: String = "byte_units_decode"
  override def inputTypes = Seq(StringType)

  override protected def nullSafeEval(s: Any): Any =
    ByteUnitsOps.decode(s.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, s =>
      s"${ev.value} = graft.functions.ByteUnitsOps.decode($s);")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object ByteUnits {
  def byte_units(text: Column): Column = toColumn(ByteUnits(toExpression(text)))
  def byte_units_decode(units: Column): Column =
    toColumn(ByteUnitsDecode(toExpression(units)))
}
