package graft.proto

import java.io.ByteArrayOutputStream
import java.nio.charset.StandardCharsets

/** Minimal protobuf wire-format reader/writer (public format:
  * protobuf.dev/programming-guides/encoding). Offline-safe replacement for
  * generated protobuf classes — the engine only needs the four Cosmos
  * envelope messages plus a couple of payload types (SURVEY.md §7.2 M4;
  * reference decodes with generated `TxOuterClass` classes,
  * TopologyProducer.kt:48–54).
  *
  * Wire types used: 0 = varint, 2 = length-delimited (messages, strings,
  * bytes, packed). 1/5 (fixed64/32) are skippable for forward compat.
  */
object ProtoWire {

  final class ProtoParseException(msg: String) extends RuntimeException(msg)

  // ------------------------------------------------------------- writer

  final class Writer {
    private val out = new ByteArrayOutputStream()

    def writeVarint(v: Long): Writer = {
      var x = v
      while ((x & ~0x7fL) != 0) {
        out.write(((x & 0x7f) | 0x80).toInt)
        x >>>= 7
      }
      out.write(x.toInt)
      this
    }

    private def key(field: Int, wireType: Int): Writer =
      writeVarint((field.toLong << 3) | wireType)

    def int64(field: Int, v: Long): Writer =
      if (v == 0) this else { key(field, 0); writeVarint(v) }

    def bytes(field: Int, v: Array[Byte]): Writer =
      if (v == null || v.isEmpty) this
      else { key(field, 2); writeVarint(v.length); out.write(v, 0, v.length); this }

    /** Like bytes but writes even when empty (repeated elements must not be
      * dropped).
      */
    def bytesAlways(field: Int, v: Array[Byte]): Writer = {
      key(field, 2); writeVarint(v.length); out.write(v, 0, v.length); this
    }

    def string(field: Int, v: String): Writer =
      if (v == null || v.isEmpty) this
      else bytes(field, v.getBytes(StandardCharsets.UTF_8))

    def message(field: Int, body: Array[Byte]): Writer =
      if (body == null || body.isEmpty) this else bytes(field, body)

    /** A nested message written even when empty (presence-tracked field). */
    def messageAlways(field: Int, body: Array[Byte]): Writer = bytesAlways(field, body)

    /** Append pre-encoded wire bytes verbatim (unknown-field passthrough). */
    def raw(bytes: Array[Byte]): Writer = {
      if (bytes != null && bytes.nonEmpty) out.write(bytes, 0, bytes.length)
      this
    }

    def toBytes: Array[Byte] = out.toByteArray
  }

  // ------------------------------------------------------------- reader

  /** Streaming reader over one message's bytes. Throws ProtoParseException
    * on malformed input — callers capture it as data (reference:
    * runCatching, TopologyProducer.kt:90–93).
    */
  final class Reader(buf: Array[Byte], start: Int, end: Int) {
    def this(buf: Array[Byte]) = this(buf, 0, buf.length)
    private var pos = start

    def hasMore: Boolean = pos < end

    def readVarint(): Long = {
      var shift = 0
      var result = 0L
      while (shift < 64) {
        if (pos >= end) throw new ProtoParseException("truncated varint")
        val b = buf(pos) & 0xff
        pos += 1
        result |= (b & 0x7fL) << shift
        if ((b & 0x80) == 0) return result
        shift += 7
      }
      throw new ProtoParseException("varint too long")
    }

    /** Returns (fieldNumber, wireType). */
    def readTag(): (Int, Int) = {
      val k = readVarint()
      val field = (k >>> 3).toInt
      val wt = (k & 7).toInt
      if (field == 0) throw new ProtoParseException("field number 0")
      (field, wt)
    }

    def readBytes(): Array[Byte] = {
      val len = readVarint()
      if (len < 0 || len > end - pos) throw new ProtoParseException("truncated bytes")
      val a = java.util.Arrays.copyOfRange(buf, pos, pos + len.toInt)
      pos += len.toInt
      a
    }

    def readString(): String = new String(readBytes(), StandardCharsets.UTF_8)

    def skip(wireType: Int): Unit = wireType match {
      case 0 => readVarint()
      case 1 => if (end - pos < 8) throw new ProtoParseException("truncated fixed64") else pos += 8
      case 2 => readBytes()
      case 5 => if (end - pos < 4) throw new ProtoParseException("truncated fixed32") else pos += 4
      case other => throw new ProtoParseException(s"unsupported wire type $other")
    }

    /** Consume one field and return its full wire encoding (key +
      * payload) — unknown fields are preserved as data, never dropped,
      * so decode∘encode round-trips messages with schema fields this
      * model doesn't know (generated protobuf does the same).
      */
    def readFieldRaw(field: Int, wireType: Int): Array[Byte] = {
      val w = new Writer()
      w.writeVarint((field.toLong << 3) | wireType)
      wireType match {
        case 0 => w.writeVarint(readVarint())
        case 1 =>
          if (end - pos < 8) throw new ProtoParseException("truncated fixed64")
          w.raw(java.util.Arrays.copyOfRange(buf, pos, pos + 8)); pos += 8
        case 2 =>
          val b = readBytes()
          w.writeVarint(b.length); w.raw(b)
        case 5 =>
          if (end - pos < 4) throw new ProtoParseException("truncated fixed32")
          w.raw(java.util.Arrays.copyOfRange(buf, pos, pos + 4)); pos += 4
        case other => throw new ProtoParseException(s"unsupported wire type $other")
      }
      w.toBytes
    }
  }
}
