package graft.proto

import graft.proto.ProtoWire.{ProtoParseException, Reader, Writer}

import java.util.Base64
import scala.collection.mutable.ArrayBuffer

/** The Cosmos-SDK transaction envelope, hand-modeled from the public
  * cosmos.tx.v1beta1 schema the reference compiles against
  * (reference: TopologyProducer.kt:48–54 — TxRaw → Tx two-stage decode;
  * field numbers per the published cosmos-sdk tx.proto):
  *
  * {{{
  *   TxRaw    { 1: body_bytes, 2: auth_info_bytes, 3: repeated signatures }
  *   Tx       { 1: body(TxBody), 2: auth_info(AuthInfo), 3: repeated signatures }
  *   TxBody   { 1: repeated messages(Any), 2: memo, 3: timeout_height }
  *   AuthInfo { 1: repeated signer_infos(SignerInfo), 2: fee(Fee) }
  *   SignerInfo { 1: public_key(Any), 3: sequence }        // mode_info carried via unknown passthrough
  *   Fee      { 1: repeated amount(Coin), 2: gas_limit, 3: payer, 4: granter }
  *   Coin     { 1: denom, 2: amount }
  *   Any      { 1: type_url, 2: value }
  *   MsgSend  { 1: from_address, 2: to_address, 3: repeated amount(Coin) }
  * }}}
  *
  * Note the deliberate protobuf leniency the reference's tests rely on
  * (TopologyTest.kt:25–68; SURVEY.md §2.3): a serialized `Tx` parses as
  * `TxRaw` because nested-message and bytes fields share wire type 2.
  */
object CosmosTx {

  final case class AnyMsg(typeUrl: String, value: Array[Byte])
  final case class Coin(denom: String, amount: String,
      unknown: Array[Byte] = Array.emptyByteArray)
  final case class TxBody(messages: Seq[AnyMsg], memo: String, timeoutHeight: Long,
      unknown: Array[Byte] = Array.emptyByteArray)
  final case class SignerInfo(publicKey: Option[AnyMsg], sequence: Long,
      unknown: Array[Byte] = Array.emptyByteArray)
  final case class Fee(amount: Seq[Coin], gasLimit: Long, payer: String, granter: String,
      unknown: Array[Byte] = Array.emptyByteArray)
  final case class AuthInfo(signerInfos: Seq[SignerInfo], fee: Option[Fee],
      unknown: Array[Byte] = Array.emptyByteArray)
  final case class Tx(body: TxBody, authInfo: AuthInfo, signatures: Seq[Array[Byte]])
  final case class TxRaw(bodyBytes: Array[Byte], authInfoBytes: Array[Byte], signatures: Seq[Array[Byte]])
  final case class MsgSend(fromAddress: String, toAddress: String, amount: Seq[Coin])

  // ------------------------------------------------------------- decode

  /** Empty unknown-capture normalizes to the shared empty instance so
    * case-class equality (reference-based for arrays) keeps working for
    * the common no-unknown-fields case.
    */
  private def unkBytes(w: Writer): Array[Byte] = {
    val b = w.toBytes
    if (b.isEmpty) Array.emptyByteArray else b
  }


  def parseTxRaw(bytes: Array[Byte]): TxRaw = {
    val r = new Reader(bytes)
    var body: Array[Byte] = Array.emptyByteArray
    var auth: Array[Byte] = Array.emptyByteArray
    val sigs = ArrayBuffer.empty[Array[Byte]]
    while (r.hasMore) {
      r.readTag() match {
        case (1, 2) => body = r.readBytes()
        case (2, 2) => auth = r.readBytes()
        case (3, 2) => sigs += r.readBytes()
        case (_, wt) => r.skip(wt)
      }
    }
    TxRaw(body, auth, sigs.toSeq)
  }

  def parseAny(bytes: Array[Byte]): AnyMsg = {
    val r = new Reader(bytes)
    var url = ""
    var value: Array[Byte] = Array.emptyByteArray
    while (r.hasMore) {
      r.readTag() match {
        case (1, 2) => url = r.readString()
        case (2, 2) => value = r.readBytes()
        case (_, wt) => r.skip(wt)
      }
    }
    AnyMsg(url, value)
  }

  def parseTxBody(bytes: Array[Byte]): TxBody = {
    val r = new Reader(bytes)
    val msgs = ArrayBuffer.empty[AnyMsg]
    var memo = ""
    var timeout = 0L
    val unk = new Writer()
    while (r.hasMore) {
      r.readTag() match {
        case (1, 2) => msgs += parseAny(r.readBytes())
        case (2, 2) => memo = r.readString()
        case (3, 0) => timeout = r.readVarint()
        case (f, wt) => unk.raw(r.readFieldRaw(f, wt))
      }
    }
    TxBody(msgs.toSeq, memo, timeout, unkBytes(unk))
  }

  def parseCoin(bytes: Array[Byte]): Coin = {
    val r = new Reader(bytes)
    var denom = ""
    var amount = ""
    val unk = new Writer()
    while (r.hasMore) {
      r.readTag() match {
        case (1, 2) => denom = r.readString()
        case (2, 2) => amount = r.readString()
        case (f, wt) => unk.raw(r.readFieldRaw(f, wt))
      }
    }
    Coin(denom, amount, unkBytes(unk))
  }

  def parseFee(bytes: Array[Byte]): Fee = {
    val r = new Reader(bytes)
    val coins = ArrayBuffer.empty[Coin]
    var gas = 0L
    var payer = ""
    var granter = ""
    val unk = new Writer()
    while (r.hasMore) {
      r.readTag() match {
        case (1, 2) => coins += parseCoin(r.readBytes())
        case (2, 0) => gas = r.readVarint()
        case (3, 2) => payer = r.readString()
        case (4, 2) => granter = r.readString()
        case (f, wt) => unk.raw(r.readFieldRaw(f, wt))
      }
    }
    Fee(coins.toSeq, gas, payer, granter, unkBytes(unk))
  }

  def parseSignerInfo(bytes: Array[Byte]): SignerInfo = {
    val r = new Reader(bytes)
    var pk: Option[AnyMsg] = None
    var seq = 0L
    val unk = new Writer()
    while (r.hasMore) {
      r.readTag() match {
        case (1, 2) => pk = Some(parseAny(r.readBytes()))
        case (3, 0) => seq = r.readVarint()
        case (f, wt) => unk.raw(r.readFieldRaw(f, wt)) // e.g. mode_info (field 2)
      }
    }
    SignerInfo(pk, seq, unkBytes(unk))
  }

  def parseAuthInfo(bytes: Array[Byte]): AuthInfo = {
    val r = new Reader(bytes)
    val signers = ArrayBuffer.empty[SignerInfo]
    var fee: Option[Fee] = None
    val unk = new Writer()
    while (r.hasMore) {
      r.readTag() match {
        case (1, 2) => signers += parseSignerInfo(r.readBytes())
        case (2, 2) => fee = Some(parseFee(r.readBytes()))
        case (f, wt) => unk.raw(r.readFieldRaw(f, wt))
      }
    }
    AuthInfo(signers.toSeq, fee, unkBytes(unk))
  }

  def parseMsgSend(bytes: Array[Byte]): MsgSend = {
    val r = new Reader(bytes)
    var from = ""
    var to = ""
    val coins = ArrayBuffer.empty[Coin]
    while (r.hasMore) {
      r.readTag() match {
        case (1, 2) => from = r.readString()
        case (2, 2) => to = r.readString()
        case (3, 2) => coins += parseCoin(r.readBytes())
        case (_, wt) => r.skip(wt)
      }
    }
    MsgSend(from, to, coins.toSeq)
  }

  /** Two-stage decode, exactly the reference's `TxRaw.toTx()`
    * (TopologyProducer.kt:48–54): parse the raw envelope, then re-parse the
    * nested body/auth_info byte fields. Either stage throws on garbage.
    */
  def decode(bytes: Array[Byte]): Tx = {
    if (bytes == null || bytes.isEmpty) throw new ProtoParseException("empty input")
    val raw = parseTxRaw(bytes)
    Tx(parseTxBody(raw.bodyBytes), parseAuthInfo(raw.authInfoBytes), raw.signatures)
  }

  // ------------------------------------------------------------- encode

  def encodeAny(a: AnyMsg): Array[Byte] =
    new Writer().string(1, a.typeUrl).bytes(2, a.value).toBytes

  def encodeCoin(c: Coin): Array[Byte] =
    new Writer().string(1, c.denom).string(2, c.amount).raw(c.unknown).toBytes

  def encodeTxBody(b: TxBody): Array[Byte] = {
    val w = new Writer()
    b.messages.foreach(m => w.bytesAlways(1, encodeAny(m)))
    w.string(2, b.memo).int64(3, b.timeoutHeight).raw(b.unknown).toBytes
  }

  def encodeFee(f: Fee): Array[Byte] = {
    val w = new Writer()
    f.amount.foreach(c => w.bytesAlways(1, encodeCoin(c)))
    w.int64(2, f.gasLimit).string(3, f.payer).string(4, f.granter).raw(f.unknown).toBytes
  }

  def encodeSignerInfo(s: SignerInfo): Array[Byte] = {
    val w = new Writer()
    s.publicKey.foreach(pk => w.bytesAlways(1, encodeAny(pk)))
    w.int64(3, s.sequence).raw(s.unknown).toBytes
  }

  def encodeAuthInfo(a: AuthInfo): Array[Byte] = {
    val w = new Writer()
    a.signerInfos.foreach(s => w.bytesAlways(1, encodeSignerInfo(s)))
    a.fee.foreach(f => w.messageAlways(2, encodeFee(f)))
    w.raw(a.unknown).toBytes
  }

  /** Canonical `Tx` re-encoding — the rule-topic payload (reference X3:
    * `tx.toByteArray()`, TopologyProducer.kt:155–159). Writes body and
    * auth_info even when empty, as the generated encoder does for set
    * message fields.
    */
  def encode(tx: Tx): Array[Byte] = {
    val w = new Writer()
    w.messageAlways(1, encodeTxBody(tx.body))
    w.messageAlways(2, encodeAuthInfo(tx.authInfo))
    tx.signatures.foreach(s => w.bytesAlways(3, s))
    w.toBytes
  }

  def encodeMsgSend(m: MsgSend): Array[Byte] = {
    val w = new Writer().string(1, m.fromAddress).string(2, m.toAddress)
    m.amount.foreach(c => w.bytesAlways(3, encodeCoin(c)))
    w.toBytes
  }

  // ---------------------------------------------------- canonical JSON

  /** Payload type registry: typeUrl → JSON-field renderer. The reference
    * builds this by scanning the classpath for every generated protobuf
    * class (ProtoTypeRegistry.kt:16–30); here the same drop-a-jar-on-the-
    * classpath contract is [[PayloadTypePrinters]]: a ServiceLoader SPI
    * merged into [[registry]], so new Cosmos message types are added
    * without editing the engine. [[defaultRegistry]] holds the built-in
    * exercised types.
    */
  type PayloadPrinter = Array[Byte] => String

  /** defaultRegistry ++ every [[PayloadTypePrinters]] service on the
    * classpath (user-provided printers win on typeUrl collision). Lazy and
    * per-JVM: executors resolve from their own classpath, exactly like the
    * reference's scan.
    */
  lazy val registry: Map[String, PayloadPrinter] = {
    // per-provider error isolation: one broken SPI jar (missing dep, bad
    // services entry) must not take down rendering for every payload type
    // — the same isolation contract the printers themselves get
    val loaded = scala.collection.mutable.Map.empty[String, PayloadPrinter]
    val it = java.util.ServiceLoader.load(classOf[PayloadTypePrinters]).iterator()
    var more = true
    while (more) {
      try {
        more = it.hasNext
        if (more) loaded ++= it.next().printers
      } catch {
        case e: java.util.ServiceConfigurationError =>
          System.err.println(s"[graft] skipping broken PayloadTypePrinters provider: ${e.getMessage}")
        case scala.util.control.NonFatal(e) =>
          System.err.println(s"[graft] skipping failing PayloadTypePrinters provider: ${e.getMessage}")
      }
    }
    defaultRegistry ++ loaded
  }

  val defaultRegistry: Map[String, PayloadPrinter] = Map(
    "/cosmos.bank.v1beta1.MsgSend" -> { bytes =>
      val m = parseMsgSend(bytes)
      val sb = new StringBuilder
      if (m.fromAddress.nonEmpty) sb.append(",\"fromAddress\":").append(jsonStr(m.fromAddress))
      if (m.toAddress.nonEmpty) sb.append(",\"toAddress\":").append(jsonStr(m.toAddress))
      if (m.amount.nonEmpty) sb.append(",\"amount\":").append(coinsJson(m.amount))
      sb.result()
    },
    "/cosmos.crypto.secp256k1.PubKey" -> { bytes =>
      // PubKey { 1: key(bytes) }
      val r = new Reader(bytes)
      var key: Array[Byte] = Array.emptyByteArray
      while (r.hasMore) r.readTag() match {
        case (1, 2) => key = r.readBytes()
        case (_, wt) => r.skip(wt)
      }
      if (key.isEmpty) "" else ",\"key\":" + jsonStr(Base64.getEncoder.encodeToString(key))
    })

  private def jsonStr(s: String): String = {
    val sb = new StringBuilder(s.length + 2)
    sb.append('"')
    s.foreach {
      case '"'  => sb.append("\\\"")
      case '\\' => sb.append("\\\\")
      case '\n' => sb.append("\\n")
      case '\r' => sb.append("\\r")
      case '\t' => sb.append("\\t")
      case c if c < ' ' => sb.append(f"\\u${c.toInt}%04x")
      case c => sb.append(c)
    }
    sb.append('"').result()
  }

  private def coinsJson(coins: Seq[Coin]): String =
    coins.map { c =>
      val fields = Seq(
        if (c.denom.nonEmpty) Some("\"denom\":" + jsonStr(c.denom)) else None,
        if (c.amount.nonEmpty) Some("\"amount\":" + jsonStr(c.amount)) else None)
        .flatten
      fields.mkString("{", ",", "}")
    }.mkString("[", ",", "]")

  private def anyJson(a: AnyMsg, registry: Map[String, PayloadPrinter]): String = {
    val urlSuffix = a.typeUrl.dropWhile(_ != '/') // "type.googleapis.com/x.Y" → "/x.Y"
    // Unregistered payloads — and registered ones whose bytes don't parse —
    // render open-schema as {@type, value:base64}: a malformed PAYLOAD must
    // not turn a decodable ENVELOPE into a decode error (payload isolation,
    // same spirit as per-rule isolation). The reference's classpath scan
    // makes every compiled type printable; this is the offline equivalent.
    def fallback: String =
      "{\"@type\":" + jsonStr(a.typeUrl) +
        (if (a.value.isEmpty) "" else ",\"value\":" + jsonStr(Base64.getEncoder.encodeToString(a.value))) + "}"
    registry.get(urlSuffix) match {
      case Some(printer) =>
        try "{\"@type\":" + jsonStr(a.typeUrl) + printer(a.value) + "}"
        catch { case scala.util.control.NonFatal(_) => fallback }
      case None => fallback
    }
  }

  /** Canonical proto-JSON of a decoded Tx (reference: JsonFormat.printer()
    * .usingTypeRegistry(..).omittingInsignificantWhitespace(),
    * TopologyProducer.kt:79–82): lowerCamelCase names, field-number order,
    * proto3 default-value omission, `Any` inlined with `@type`, bytes as
    * base64, uint64 as JSON string. Subset: the envelope messages modeled
    * above; `mode_info` is not printed.
    */
  def toJson(tx: Tx, registry: Map[String, PayloadPrinter] = CosmosTx.registry): String = {
    val sb = new StringBuilder(256)
    sb.append("{\"body\":{")
    val bodyFields = ArrayBuffer.empty[String]
    if (tx.body.messages.nonEmpty)
      bodyFields += "\"messages\":" + tx.body.messages.map(anyJson(_, registry)).mkString("[", ",", "]")
    if (tx.body.memo.nonEmpty) bodyFields += "\"memo\":" + jsonStr(tx.body.memo)
    if (tx.body.timeoutHeight != 0) bodyFields += "\"timeoutHeight\":" + jsonStr(tx.body.timeoutHeight.toString)
    sb.append(bodyFields.mkString(","))
    sb.append("},\"authInfo\":{")
    val authFields = ArrayBuffer.empty[String]
    if (tx.authInfo.signerInfos.nonEmpty)
      authFields += "\"signerInfos\":" + tx.authInfo.signerInfos.map { s =>
        val f = ArrayBuffer.empty[String]
        s.publicKey.foreach(pk => f += "\"publicKey\":" + anyJson(pk, registry))
        if (s.sequence != 0) f += "\"sequence\":" + jsonStr(s.sequence.toString)
        f.mkString("{", ",", "}")
      }.mkString("[", ",", "]")
    tx.authInfo.fee.foreach { fee =>
      val f = ArrayBuffer.empty[String]
      if (fee.amount.nonEmpty) f += "\"amount\":" + coinsJson(fee.amount)
      if (fee.gasLimit != 0) f += "\"gasLimit\":" + jsonStr(fee.gasLimit.toString)
      if (fee.payer.nonEmpty) f += "\"payer\":" + jsonStr(fee.payer)
      if (fee.granter.nonEmpty) f += "\"granter\":" + jsonStr(fee.granter)
      authFields += "\"fee\":" + f.mkString("{", ",", "}")
    }
    sb.append(authFields.mkString(","))
    sb.append("}")
    if (tx.signatures.nonEmpty)
      sb.append(",\"signatures\":" + tx.signatures.map(s => jsonStr(Base64.getEncoder.encodeToString(s))).mkString("[", ",", "]"))
    sb.append("}")
    sb.result()
  }
}
