package graft.functions

import graft.proto.CosmosTx
import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftColumnBridge.{toColumn, toExpression}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

import scala.util.control.NonFatal

/** `decode_tx(bytes)` — total protobuf decode of a Cosmos transaction
  * (reference P1, TopologyProducer.kt:86–96): two-stage TxRaw → Tx parse
  * with failure captured as data, plus — in the same single pass — the
  * canonical JSON rendering (reference P2) and the canonical re-encoding
  * (reference X3). One narrow expression covers the whole per-record
  * pre-routing chain, so whole-stage codegen pipelines it with the rule
  * evaluation and the explode.
  *
  * Result struct:
  *  - txJson: String     — canonical proto-JSON (null on decode failure)
  *  - reencoded: Binary  — canonical `Tx` bytes for rule topics (null on failure)
  *  - error: String      — decode exception message (null = success)
  *  - msgTypeUrls: Array[String] — payload type discriminators
  *  - msgCount: Int      — `tx.body.messages.count()` (the reference logs
  *                         this per routed record, TopologyProducer.kt:153)
  */
case class DecodeCosmosTx(child: Expression)
    extends UnaryExpression with CodegenFallback {

  override def dataType: DataType = DecodeCosmosTx.schema
  override def nullable: Boolean = child.nullable
  override def prettyName: String = "decode_tx"

  override protected def nullSafeEval(input: Any): Any = {
    val bytes = input.asInstanceOf[Array[Byte]]
    try {
      val tx = CosmosTx.decode(bytes)
      val json = CosmosTx.toJson(tx)
      val reenc = CosmosTx.encode(tx)
      InternalRow(
        UTF8String.fromString(json),
        reenc,
        null,
        new GenericArrayData(tx.body.messages.map(m => UTF8String.fromString(m.typeUrl)).toArray[Any]),
        tx.body.messages.size)
    } catch {
      case NonFatal(e) =>
        InternalRow(null, null,
          UTF8String.fromString(s"${e.getClass.getSimpleName}: ${e.getMessage}"),
          null, null)
    }
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object DecodeCosmosTx {
  val schema: StructType = StructType(Seq(
    StructField("txJson", StringType),
    StructField("reencoded", BinaryType),
    StructField("error", StringType),
    StructField("msgTypeUrls", ArrayType(StringType, containsNull = false)),
    StructField("msgCount", IntegerType)))
}

/** `encode_msg_send_tx(from, to, denom, amount)` — build the canonical
  * bytes of a Tx carrying one `Any`-packed MsgSend (the shape of the
  * reference's tx1/tx2 fixtures, TopologyTest.kt:25–61). Test/harness
  * inverse of [[DecodeCosmosTx]]: encode∘decode is identity on the fields,
  * which gives the protobuf layer a DuckDB-checkable round-trip query.
  */
case class EncodeMsgSendTx(children: Seq[Expression])
    extends Expression with CodegenFallback {
  require(children.length == 4, "encode_msg_send_tx(from, to, denom, amount)")

  override def dataType: DataType = BinaryType
  override def nullable: Boolean = children.exists(_.nullable)

  override def eval(input: InternalRow): Any = {
    val vs = children.map(_.eval(input))
    if (vs.exists(_ == null)) return null
    val Seq(from, to, denom, amount) = vs.map(_.toString)
    val msg = CosmosTx.MsgSend(from, to, Seq(CosmosTx.Coin(denom, amount)))
    val any = CosmosTx.AnyMsg("type.googleapis.com/cosmos.bank.v1beta1.MsgSend",
      CosmosTx.encodeMsgSend(msg))
    val tx = CosmosTx.Tx(
      CosmosTx.TxBody(Seq(any), "", 0L),
      CosmosTx.AuthInfo(Nil, None),
      Nil)
    CosmosTx.encode(tx)
  }

  override protected def withNewChildrenInternal(newChildren: IndexedSeq[Expression]): Expression =
    copy(children = newChildren)
}

object ProtoFunctions {
  def decode_tx(bytes: Column): Column =
    toColumn(DecodeCosmosTx(toExpression(bytes)))

  def encode_msg_send_tx(from: Column, to: Column, denom: Column, amount: Column): Column =
    toColumn(EncodeMsgSendTx(Seq(from, to, denom, amount).map(toExpression)))
}
