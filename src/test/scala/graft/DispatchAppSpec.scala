package graft

import graft.operators.TxDispatchPipeline
import graft.proto.CosmosTx
import graft.proto.CosmosTx._
import graft.rules.TxDispatchRules.{ERROR, UNFILTERED}
import graft.streaming.{AppConfig, DispatchApp, DispatchStream}
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import java.nio.file.Files

/** One COMPOSED end-to-end run of the deployment surface: app.properties +
  * rules.yaml on disk → AppConfig → the exact production stream assembly
  * (DispatchApp.routedStream) → foreachBatch → topic-partitioned parquet —
  * the full wiring the pieces-in-isolation specs can't see drift in.
  * (The Kafka source/sink themselves need a connector jar absent offline;
  * MemoryStream + the batch sink twin stand in, as in SURVEY.md §3.3.)
  */
class DispatchAppSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark

  private val msgSendUrl = "type.googleapis.com/cosmos.bank.v1beta1.MsgSend"

  private def msgSendTx(from: String, to: String): Array[Byte] = {
    val any = AnyMsg(msgSendUrl, encodeMsgSend(MsgSend(from, to, Seq(Coin("know", "100")))))
    CosmosTx.encode(Tx(TxBody(Seq(any), "", 0L), AuthInfo(Nil, None), Nil))
  }

  test("config files → routed stream → topic-partitioned parquet, end to end") {
    val s = spark
    import s.implicits._
    implicit val sqlCtx = s.sqlContext

    val dir = Files.createTempDirectory("dispatch-app").toFile
    val rulesPath = new java.io.File(dir, "rules.yaml").getAbsolutePath
    val propsPath = new java.io.File(dir, "app.properties").getAbsolutePath
    val outDir = new java.io.File(dir, "out").getAbsolutePath
    val ckptDir = new java.io.File(dir, "ckpt").getAbsolutePath

    Files.writeString(java.nio.file.Paths.get(rulesPath),
      s"""rules:
         |  - name: message-type-MsgSend
         |    topic: topic-1
         |    predicate: "$$.body.messages[?(@.@type == '$msgSendUrl')]"
         |  - name: from-address
         |    topic: topic-2
         |    predicate: "$$..messages[?(@.fromAddress == 'okp41rhd8744u4vqvcjuvyfm8fea4k9mefe3k57qz27')]"
         |  - name: nop-rule
         |    topic: topic-3
         |    predicate: "$$.nop"
         |""".stripMargin)
    Files.writeString(java.nio.file.Paths.get(propsPath),
      s"""bootstrap.servers = broker:9092
         |topic.in          = cosmos-txs
         |topic.dlq         = dlq
         |topic.error       = error
         |rules.path        = $rulesPath
         |checkpoint.dir    = $ckptDir
         |""".stripMargin)

    val cfg = AppConfig.fromFile(propsPath)
    assert(cfg.topicIn == "cosmos-txs" && cfg.errorTopic.contains("error"))
    assert(cfg.rules.rules.map(_.name) ==
      Seq("message-type-MsgSend", "from-address", "nop-rule"))

    // the reference's four fixtures (TopologyTest.kt:84–160)
    val tx1 = msgSendTx("testFrom", "tesTo")
    val tx2 = msgSendTx("okp41rhd8744u4vqvcjuvyfm8fea4k9mefe3k57qz27",
      "okp41wwr8ye24766rmjjh7eva0rc2p7cnwa8py6s6fc")
    val tx3 = CosmosTx.encode(Tx(TxBody(Nil, "", 0L), AuthInfo(Nil, None), Nil))
    val txError = "test".getBytes("UTF-8")

    val input = MemoryStream[(String, Array[Byte])]
    val routed = DispatchApp.routedStream(input.toDF().toDF("key", "raw"), cfg)
    val query = DispatchStream.toForeachBatch(routed, ckptDir,
      (batch, _) => TxDispatchPipeline.writePartitionedByTopic(batch, outDir))

    input.addData(Seq(("k1", tx1), ("k2", tx2), ("k3", tx3), ("k4", txError)))
    query.processAllAvailable()
    query.stop()

    // read back: one directory per destination topic, partition-prunable
    val back = spark.read.parquet(outDir)
    val byTopic = back.groupBy($"topic").count()
      .as[(String, Long)].collect().toMap
    assert(byTopic == Map("topic-1" -> 2L, "topic-2" -> 1L, "dlq" -> 1L, "error" -> 1L))

    // disposition payload spot-checks through the full path
    val routes = back.select($"key", $"route", $"topic")
      .as[(String, Int, String)].collect().toSet
    assert(routes == Set(
      ("k1", 0, "topic-1"),
      ("k2", 0, "topic-1"), ("k2", 1, "topic-2"),
      ("k3", UNFILTERED, "dlq"),
      ("k4", ERROR, "error")))
    val errBytes = back.filter($"route" === ERROR)
      .select($"value").as[Array[Byte]].head()
    assert(errBytes.toSeq == txError.toSeq)
  }

  test("missing required config key fails fast") {
    val dir = Files.createTempDirectory("dispatch-app-bad")
    val p = dir.resolve("app.properties")
    Files.writeString(p, "bootstrap.servers = b:9092\n") // everything else missing
    val e = intercept[IllegalArgumentException](AppConfig.fromFile(p.toString))
    assert(e.getMessage.contains("topic.in"))
  }
}
