package graft

import graft.proto.{CosmosTx, PayloadTypePrinters}
import graft.proto.CosmosTx._
import org.scalatest.funsuite.AnyFunSuite

/** SPI implementation discovered via the test classpath's
  * META-INF/services entry — proves the drop-a-jar extension contract.
  * Renders a fake `MsgBurn { 1: amount(string) }` payload.
  */
class TestPayloadPrinters extends PayloadTypePrinters {
  override def printers: Map[String, Array[Byte] => String] = Map(
    "/testchain.v1.MsgBurn" -> { bytes =>
      val r = new graft.proto.ProtoWire.Reader(bytes, 0, bytes.length)
      var amount = ""
      while (r.hasMore) r.readTag() match {
        case (1, 2) => amount = new String(r.readBytes(), "UTF-8")
        case (_, wt) => r.skip(wt)
      }
      if (amount.isEmpty) "" else ",\"amount\":\"" + amount + "\""
    })
}

class PayloadRegistrySpec extends AnyFunSuite {

  test("ServiceLoader printers extend the Any registry without editing the engine") {
    assert(CosmosTx.registry.contains("/testchain.v1.MsgBurn"))
    // built-ins still present
    assert(CosmosTx.registry.contains("/cosmos.bank.v1beta1.MsgSend"))

    val payload = new graft.proto.ProtoWire.Writer().string(1, "42know").toBytes
    val any = AnyMsg("type.googleapis.com/testchain.v1.MsgBurn", payload)
    val tx = Tx(TxBody(Seq(any), "", 0L), AuthInfo(Nil, None), Nil)
    val json = CosmosTx.toJson(tx)
    assert(json.contains(""""@type":"type.googleapis.com/testchain.v1.MsgBurn","amount":"42know""""), json)
  }

  test("unknown types still fall back to open-schema base64 rendering") {
    val any = AnyMsg("type.googleapis.com/unknown.v1.MsgNope", Array[Byte](1, 2, 3))
    val tx = Tx(TxBody(Seq(any), "", 0L), AuthInfo(Nil, None), Nil)
    val json = CosmosTx.toJson(tx)
    assert(json.contains(""""@type":"type.googleapis.com/unknown.v1.MsgNope","value":""""), json)
  }
}
