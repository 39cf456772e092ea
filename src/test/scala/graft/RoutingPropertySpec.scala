package graft

import com.fasterxml.jackson.databind.ObjectMapper
import graft.functions.JsonPathLite
import graft.operators.TxDispatchPipeline
import graft.rules.{DispatchRule, TxDispatchRules}
import graft.rules.TxDispatchRules.{ERROR, UNFILTERED}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import scala.util.{Random, Try}

/** Record-at-a-time reference implementation — exactly the reference's
  * evaluation loop shape (TopologyProducer.kt:205–231). Serializable so
  * the typed Dataset twin can run it inside executors.
  */
object RoutingReference extends Serializable {
  def route(payload: String, rules: TxDispatchRules): Seq[Int] = {
    val mapper = new ObjectMapper()
    val doc = Try(mapper.readTree(payload)).toOption.filter(n => n != null && !n.isMissingNode)
    doc match {
      case None => Seq(TxDispatchRules.ERROR)
      case Some(d) =>
        val hits = rules.rules.zipWithIndex.flatMap { case (r, i) =>
          Try(JsonPathLite.exists(d, JsonPathLite.compile(r.predicate))).toOption
            .filter(identity).map(_ => i)
        }
        if (hits.isEmpty) Seq(TxDispatchRules.UNFILTERED) else hits
    }
  }
}

/** Property-style differential test (SURVEY §7.5): the Catalyst routing
  * pipeline vs an INDEPENDENT typed `Dataset.flatMap` implementation of
  * the same semantics, over randomized documents and rule sets.
  * Invariants: multicast count = #matching rules; the disposition is a
  * total, disjoint partition; keys pass through; rule errors are isolated.
  */
class RoutingPropertySpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark

  private val types = Seq("alpha.MsgSend", "beta.MsgVote", "gamma.MsgSwap")

  /** Random doc: tx-shaped JSON, sometimes empty, sometimes invalid. */
  private def randomPayload(rnd: Random): String = rnd.nextInt(10) match {
    case 0 => "not json at all"
    case 1 => """{"body":{}}"""
    case 2 => s"""{"body":{"messages":[]}}"""
    case _ =>
      val msgs = Seq.fill(1 + rnd.nextInt(3)) {
        val t = types(rnd.nextInt(types.length))
        s"""{"@type":"$t","k":${rnd.nextInt(100)},"addr":"a${rnd.nextInt(20)}"}"""
      }
      s"""{"body":{"messages":[${msgs.mkString(",")}]}}"""
  }

  private val rules = TxDispatchRules(Seq(
    DispatchRule("by-type", "t-type", "$.body.messages[?(@.@type == 'alpha.MsgSend')]"),
    DispatchRule("by-k", "t-k", "$..messages[?(@.k > 80)]"),
    DispatchRule("by-addr", "t-addr", "$.body.messages[?(@.addr == 'a7')]"),
    DispatchRule("nop", "t-nop", "$.nop"),
    DispatchRule("broken", "t-broken", "not-a-path")))


  test("pipeline == record-at-a-time reference over 400 random documents") {
    val s = spark
    import s.implicits._
    val rnd = new Random(20260812L)
    val data = (0 until 400).map(i => (s"k$i", randomPayload(rnd)))

    // Catalyst pipeline
    val df = data.toDF("key", "payload")
      .withColumn("raw", encode($"payload", "UTF-8"))
      .withColumn("txJson", $"payload") // parse failure handled inside the expression
    val got = TxDispatchPipeline(df, rules)
      .select($"key", $"route").as[(String, Int)].collect()
      .groupBy(_._1).view.mapValues(_.map(_._2).sorted.toSeq).toMap

    // typed Dataset twin: flatMap with the record-at-a-time evaluator
    val localRules = rules
    val typed = data.toDS().flatMap { case (k, payload) =>
      RoutingReference.route(payload, localRules).map(r => (k, r))
    }.collect().groupBy(_._1).view.mapValues(_.map(_._2).sorted.toSeq).toMap

    assert(got.keySet == data.map(_._1).toSet, "every key appears (total)")
    assert(got == typed, "pipeline and typed twin disagree")

    // invariants
    got.foreach { case (k, routes) =>
      assert(routes.distinct == routes, s"$k: duplicate route")
      if (routes.exists(_ < 0)) assert(routes.length == 1, s"$k: sentinel mixed with rules")
      assert(!routes.contains(4), s"$k: broken rule must never match")
      assert(!routes.contains(3), s"$k: nop rule must never match")
    }
    // all three dispositions actually occurred in the sample
    val flat = got.values.flatten.toSet
    assert(flat.contains(ERROR) && flat.contains(UNFILTERED) && flat.exists(_ >= 0))
  }
}
