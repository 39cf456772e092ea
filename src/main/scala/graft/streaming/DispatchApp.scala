package graft.streaming

import graft.rules.TxDispatchRules
import org.apache.spark.sql.SparkSession

import java.util.Properties

/** Deployment entry point — the drop-in replacement for the reference
  * service (reference config surface: application.properties:13–15 +
  * `rules.path`, TxsDispatch.kt:36–37):
  *
  * {{{
  *   spark-submit --class graft.streaming.DispatchApp engine.jar app.properties
  *
  *   # app.properties
  *   bootstrap.servers = broker:9092
  *   topic.in          = cosmos-txs
  *   topic.dlq         = cosmos-dlq
  *   topic.error       = cosmos-error     # optional — unset ⇒ errored records dropped
  *   rules.path        = /etc/rules.yaml
  *   checkpoint.dir    = /ckpt/dispatch
  * }}}
  *
  * Requires the spark-sql-kafka connector on the cluster classpath.
  */
object DispatchApp {
  def main(args: Array[String]): Unit = {
    require(args.length == 1, "usage: DispatchApp <app.properties>")
    val props = new Properties()
    val in = java.nio.file.Files.newInputStream(java.nio.file.Paths.get(args(0)))
    try props.load(in) finally in.close()

    def required(k: String): String = {
      val v = props.getProperty(k)
      require(v != null && v.nonEmpty, s"missing config '$k'")
      v
    }

    val bootstrap = required("bootstrap.servers")
    val topicIn = required("topic.in")
    val dlqTopic = required("topic.dlq")
    val errorTopic = Option(props.getProperty("topic.error")).filter(_.nonEmpty)
    val rules = TxDispatchRules.fromYamlFile(required("rules.path"))
    val checkpoint = required("checkpoint.dir")

    val spark = graft.GraftSession.builder("graft-dispatch").getOrCreate()
    val routed = DispatchStream.withMetrics(
      DispatchStream.route(
        DispatchStream.fromKafka(DispatchStream.kafkaSource(spark, bootstrap, topicIn)),
        rules, dlqTopic, errorTopic))
    val query = DispatchStream.toKafka(routed, bootstrap, checkpoint)
    query.awaitTermination()
  }
}
