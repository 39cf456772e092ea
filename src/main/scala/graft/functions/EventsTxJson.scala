package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftColumnBridge.{toColumn, toExpression}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, CodeGenerator, ExprCode}
import org.apache.spark.sql.catalyst.expressions.codegen.Block._
import org.apache.spark.unsafe.types.UTF8String
import org.apache.spark.sql.types.{DataType, StringType}

/** `events_tx_json(props, event_id, event_type, user_id)` — the events
  * table's canonical tx document ([[graft.operators.EventsTx]]) in ONE
  * JSON parse.
  *
  * Exactly ≡ the built-in spelling (property-pinned, EventsTxJsonSpec):
  * {{{
  *   when(props.isNotNull && get_json_object(props, "$").isNotNull,
  *     concat(..., when(k.isNull, "").otherwise(concat(",\"k\":", k)), ...))
  * }}}
  * where `k = get_json_object(props, "$.k").cast("long")` — but that
  * spelling parses `props` TWICE per row (the `$` validity probe and the
  * `$.k` extraction are separate GetJsonObject calls; Catalyst's
  * subexpression elimination cannot merge different path arguments), and
  * this projection sits under EVERY query of the dispatch family. One
  * Jackson parse halves the decode floor of eight queries.
  *
  * Replicated edge semantics:
  *  - undecodable `props` (unparseable, or null) ⇒ NULL document;
  *  - `concat` null propagation: any null of event_id/event_type/user_id
  *    ⇒ NULL document even when `props` parses;
  *  - `k`: integral JSON number in long range ⇒ embedded; textual node
  *    that trims to a signed long ⇒ embedded (Spark's string→long cast);
  *    anything else (missing, JSON null, non-integral number, bool,
  *    object, array, overflow) ⇒ omitted — matching
  *    `get_json_object(...).cast("long")` being null;
  *  - `$.k` only descends an OBJECT root (array/scalar roots have no
  *    field), like the built-in path step.
  */
case class EventsTxJsonExpr(props: Expression, eventId: Expression,
    eventType: Expression, userId: Expression) extends Expression {

  override def children: Seq[Expression] = Seq(props, eventId, eventType, userId)
  override def dataType: DataType = StringType
  override def nullable: Boolean = true
  override def prettyName: String = "events_tx_json"

  def fused(propsAny: Any, eventIdAny: Any, eventTypeAny: Any,
      userIdAny: Any): UTF8String = {
    if (propsAny == null || eventIdAny == null || eventTypeAny == null ||
      userIdAny == null) return null
    val doc = JsonDocs.parseAny(propsAny)
    if (doc == null) return null
    // $.k — an object-root field step, exactly the built-in path's reach
    val kNode = if (doc.isObject) doc.get("k") else null
    var hasK = false
    var kVal = 0L
    if (kNode != null && !kNode.isNull) {
      if (kNode.isIntegralNumber && kNode.canConvertToLong) {
        hasK = true; kVal = kNode.longValue()
      } else if (kNode.isTextual) {
        // Spark cast string→long: trim, optional sign, digits only
        val t = kNode.textValue().trim
        if (t.nonEmpty && t.forall(c => (c >= '0' && c <= '9') || c == '+' || c == '-')) {
          try { kVal = java.lang.Long.parseLong(t); hasK = true }
          catch { case _: NumberFormatException => () }
        }
      }
    }
    val sb = new java.lang.StringBuilder(64)
    sb.append("{\"eventId\":").append(eventIdAny.asInstanceOf[Long])
      .append(",\"body\":{\"messages\":[{\"@type\":\"")
      .append(eventTypeAny.toString).append('"')
    if (hasK) sb.append(",\"k\":").append(kVal)
    sb.append(",\"userId\":").append(userIdAny.asInstanceOf[Long])
      .append("}]}}")
    UTF8String.fromString(sb.toString)
  }

  override def eval(input: InternalRow): Any =
    fused(props.eval(input), eventId.eval(input), eventType.eval(input),
      userId.eval(input))

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("eventsTxJson", this, classOf[EventsTxJsonExpr].getName)
    val p = props.genCode(ctx); val id = eventId.genCode(ctx)
    val et = eventType.genCode(ctx); val u = userId.genCode(ctx)
    val javaType = CodeGenerator.javaType(dataType)
    ev.copy(code =
      code"""
        ${p.code}
        ${id.code}
        ${et.code}
        ${u.code}
        $javaType ${ev.value} = $ref.fused(
          ${p.isNull} ? null : ${p.value},
          ${id.isNull} ? null : (Object) ${id.value},
          ${et.isNull} ? null : ${et.value},
          ${u.isNull} ? null : (Object) ${u.value});
        boolean ${ev.isNull} = ${ev.value} == null;""")
  }

  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): Expression =
    copy(props = newChildren(0), eventId = newChildren(1),
      eventType = newChildren(2), userId = newChildren(3))
}

object EventsTxJson {
  def events_tx_json(props: Column, eventId: Column, eventType: Column,
      userId: Column): Column =
    toColumn(EventsTxJsonExpr(toExpression(props), toExpression(eventId),
      toExpression(eventType), toExpression(userId)))
}
