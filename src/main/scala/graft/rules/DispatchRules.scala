package graft.rules

import com.fasterxml.jackson.databind.ObjectMapper
import com.fasterxml.jackson.dataformat.yaml.YAMLFactory
import com.fasterxml.jackson.databind.JsonNode

import java.nio.file.{Files, Paths}
import scala.jdk.CollectionConverters._

/** One dispatch rule: if `predicate` (a JsonPath expression, Jayway-style
  * subset — see [[graft.functions.JsonPathLite]]) selects at least one node of
  * the transaction's canonical JSON document, the transaction is routed to
  * `topic`.
  *
  * Mirrors the reference's rule config data model
  * (reference: TxsDispatch.kt:15–30 — `DispatchRule(outputTopic, predicate,
  * name)`), but validated eagerly at load: the reference defers missing-field
  * failures to topology build; we fail at config load, before any plan is
  * constructed.
  */
final case class DispatchRule(name: String, topic: String, predicate: String)

/** The full rule set, in declaration order. Rules are evaluated in order and
  * ALL of them (multicast — reference: TopologyProducer.kt:214,
  * TopologyTest.kt:91); the rule *index* is the route tag.
  */
final case class TxDispatchRules(rules: Seq[DispatchRule]) {
  require(rules.nonEmpty, "rule set must not be empty")
  def topics: Seq[String] = rules.map(_.topic)
}

object TxDispatchRules {

  /** Route sentinels (reference: `enum FilteredTxType { ERROR(-1),
    * UNFILTERED(-2) }`, TopologyProducer.kt:26–29).
    */
  val ERROR: Int = -1
  val UNFILTERED: Int = -2

  /** Thrown on malformed rule config (reference: ParseException from
    * TxsDispatch.kt:48–50).
    */
  final class RuleParseException(msg: String, cause: Throwable = null)
      extends RuntimeException(msg, cause)

  private lazy val yaml = new ObjectMapper(new YAMLFactory())

  /** Load rules from a YAML document of the reference's shape
    * (reference: rules_example.yaml):
    * {{{
    * rules:
    *   - name: "..."
    *     topic: "..."
    *     predicate: "$...."
    * }}}
    * Driver-side, once, before plan construction — rules are compile-time
    * constants of the query plan (reference builds topology branches from them
    * at build time, TopologyProducer.kt:77,135).
    */
  def fromYamlString(doc: String): TxDispatchRules = {
    val root =
      try yaml.readTree(doc)
      catch {
        case e: Exception => throw new RuleParseException(s"invalid YAML: ${e.getMessage}", e)
      }
    if (root == null || !root.has("rules") || !root.get("rules").isArray)
      throw new RuleParseException("missing 'rules' array")
    val rules = root.get("rules").elements().asScala.zipWithIndex.map { case (n, i) =>
      def field(k: String): String = {
        val v = n.get(k)
        if (v == null || v.isNull || !v.isTextual || v.asText.isEmpty)
          throw new RuleParseException(s"rule #$i: missing or empty '$k'")
        v.asText
      }
      val r = DispatchRule(field("name"), field("topic"), field("predicate"))
      // Validate the predicate EAGERLY: a rule whose JsonPath cannot be
      // compiled would otherwise silently never match (the runtime
      // expressions isolate per-rule failures) — the worst failure mode a
      // routing engine can have. The reference fails fast on bad config
      // too (ParseException, TxsDispatch.kt:48-50).
      try graft.functions.JsonPathLite.compile(r.predicate)
      catch {
        case e: graft.functions.JsonPathLite.JsonPathSyntaxException =>
          throw new RuleParseException(
            s"rule #$i '${r.name}': unsupported or malformed predicate '${r.predicate}': ${e.getMessage}", e)
      }
      r
    }.toSeq
    if (rules.isEmpty) throw new RuleParseException("'rules' is empty")
    TxDispatchRules(rules)
  }

  def fromYamlFile(path: String): TxDispatchRules =
    fromYamlString(new String(Files.readAllBytes(Paths.get(path)), "UTF-8"))
}
