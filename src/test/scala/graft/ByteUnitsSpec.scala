package graft

import graft.functions.{ByteUnits, ByteUnitsOps}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The GPT-2 byte→unit bijection ([[graft.functions.ByteUnitsOps]]):
  * the published `bytes_to_unicode` table pinned point-wise, the full
  * 256-byte bijection + inverse, both Catalyst expressions through
  * whole-stage CODEGEN and the interpreted eval path, the decode
  * loud-failure branch, and the SQL-surface registration. The oracle
  * gates (`q_bpe_bytes_*`) prove cross-engine agreement; this spec
  * pins the mapping's published fixed points and the failure modes the
  * oracle can't reach.
  */
class ByteUnitsSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark

  test("bytes_to_unicode fixed points match the published GPT-2 table") {
    // printable latin-1 self-maps
    assert(ByteUnitsOps.byteToUnit('a'.toInt) == 'a')
    assert(ByteUnitsOps.byteToUnit('!'.toInt) == '!')
    assert(ByteUnitsOps.byteToUnit(0xA9) == '©') // ©
    assert(ByteUnitsOps.byteToUnit(0xFF) == 'ÿ') // ÿ
    // the famous shifted bytes: space → Ġ, newline → Ċ, tab → ĉ
    assert(ByteUnitsOps.byteToUnit(0x20) == 'Ġ') // Ġ
    assert(ByteUnitsOps.byteToUnit(0x0A) == 'Ċ') // Ċ
    assert(ByteUnitsOps.byteToUnit(0x09) == 'ĉ') // ĉ
    assert(ByteUnitsOps.byteToUnit(0x00) == 'Ā') // Ā
    // the three shifted ranges' boundaries: 0–32 → +256, 127–160 →
    // 289..322, 173 → 323 (the last non-printable in byte order)
    assert(ByteUnitsOps.byteToUnit(32) == (256 + 32).toChar)
    assert(ByteUnitsOps.byteToUnit(127) == (256 + 33).toChar)
    assert(ByteUnitsOps.byteToUnit(160) == (256 + 66).toChar)
    assert(ByteUnitsOps.byteToUnit(173) == (256 + 67).toChar)
  }

  test("the map is a 256-point bijection and unitToByte inverts every unit") {
    val units = (0 until 256).map(ByteUnitsOps.byteToUnit(_))
    assert(units.distinct.size == 256)
    // no unit is whitespace or a control char (the separator contracts)
    assert(units.forall(c => !Character.isWhitespace(c) && !Character.isISOControl(c)))
    for (b <- 0 until 256)
      assert(ByteUnitsOps.unitToByte(ByteUnitsOps.byteToUnit(b)) == b)
    // everything outside the unit alphabet maps to -1
    assert(ByteUnitsOps.unitToByte.count(_ >= 0) == 256)
  }

  test("encodeString matches the canonical examples (CJK triples, latin-1 pairs, Ġ-space)") {
    assert(ByteUnitsOps.encodeString("hello") == "hello")
    assert(ByteUnitsOps.encodeString("a b") == "aĠb")
    assert(ByteUnitsOps.encodeString("é") == "Ã©")   // C3 A9 → Ã©
    assert(ByteUnitsOps.encodeString("数") == "æķ°") // E6 95 B0 → æķ°
    assert(ByteUnitsOps.encodeString("") == "")
    // supplementary-plane input (UTF-16 surrogate pair, 4 UTF-8 bytes)
    assert(ByteUnitsOps.encodeString("🙂").length == 4)
  }

  test("DataFrame round-trip through whole-stage codegen, nulls pass through") {
    val s = spark
    import s.implicits._
    val df = Seq(
      (1L, "plain ascii words"),
      (2L, "数据处理 déjà vu naïve café"),
      (3L, "日本語テキスト mixed with ascii"),
      (4L, ""),
      (5L, "emoji 🙂 tail")).toDF("id", "text")
    val got = df.select($"id",
        ByteUnits.byte_units_decode(ByteUnits.byte_units($"text")).as("rt"),
        ByteUnits.byte_units($"text").as("u"))
      .orderBy($"id").as[(Long, String, String)].collect()
    for (((id, rt, u), in) <- got.zip(Seq("plain ascii words",
        "数据处理 déjà vu naïve café", "日本語テキスト mixed with ascii", "",
        "emoji 🙂 tail"))) {
      assert(rt == in, s"round-trip diverged for id $id")
      assert(u == ByteUnitsOps.encodeString(in), s"codegen vs local diverged for id $id")
      // encoded form contains no whitespace beyond what ASCII printables
      // carry — i.e. none: the unit alphabet has no whitespace at all
      assert(!u.exists(Character.isWhitespace), s"unit string carries whitespace, id $id")
    }
    val n = df.select(ByteUnits.byte_units(lit(null).cast("string")).as("u"))
      .collect()(0)
    assert(n.isNullAt(0))
  }

  test("interpreted eval path (no codegen) agrees with codegen") {
    import org.apache.spark.sql.catalyst.expressions.Literal
    import org.apache.spark.unsafe.types.UTF8String
    val in = "数据 déjà a b"
    val enc = graft.functions.ByteUnits(Literal(UTF8String.fromString(in)))
      .eval(null).asInstanceOf[UTF8String].toString
    assert(enc == ByteUnitsOps.encodeString(in))
    val dec = graft.functions.ByteUnitsDecode(Literal(UTF8String.fromString(enc)))
      .eval(null).asInstanceOf[UTF8String].toString
    assert(dec == in)
  }

  test("decode of a non-unit input fails LOUD (interpreted and codegen)") {
    import org.apache.spark.sql.catalyst.expressions.Literal
    import org.apache.spark.unsafe.types.UTF8String
    // raw CJK was never produced by byte_units — U+6570 is no unit
    val e = intercept[IllegalArgumentException] {
      graft.functions.ByteUnitsDecode(Literal(UTF8String.fromString("数")))
        .eval(null)
    }
    assert(e.getMessage.contains("not a byte unit"))
    val s = spark
    import s.implicits._
    val thrown = intercept[Throwable] {
      Seq("数").toDF("t").select(ByteUnits.byte_units_decode($"t")).collect()
    }
    def chain(t: Throwable): Seq[Throwable] =
      if (t == null) Nil else t +: chain(t.getCause)
    assert(chain(thrown).exists(c =>
        Option(c.getMessage).exists(_.contains("not a byte unit"))),
      s"expected the loud decode failure in the cause chain, got $thrown")
  }

  test("SQL surface: byte_units / byte_units_decode registered and composing") {
    val s = spark
    graft.functions.JsonPathFunctions.register(s)
    val r = s.sql(
      "SELECT byte_units('a b') AS u, byte_units_decode(byte_units('数据 x')) AS rt")
      .collect()(0)
    assert(r.getString(0) == "aĠb")
    assert(r.getString(1) == "数据 x")
  }
}
