package graft

import graft.operators.EventsTx
import graft.streaming.FileStreamHarness
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The file-source oracle harness behind the `q_stream_*` gates: a REAL
  * multi-micro-batch streaming run (not one batch in disguise), whose
  * union equals the batch plan row-for-row — the property that lets the
  * batch DuckDB oracle gate streaming execution (stateless ⇒
  * batching-invariant).
  */
class FileStreamHarnessSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark

  val sf = "/root/testdata/sf0.001"

  def dispatch(st: org.apache.spark.sql.DataFrame) =
    graft.operators.TxDispatchPipeline(EventsTx.withTxJson(st), EventsTx.rules)
      .select(col("event_id"), col("route"), col("topic"))

  test("the harness runs GENUINELY incremental micro-batches (one per input file)") {
    val seen = new java.util.concurrent.atomic.AtomicInteger(0)
    val out = FileStreamHarness.runStateless(spark, sf, "events", dispatch,
      numFiles = 4, onBatch = _ => { seen.incrementAndGet(); () })
    assert(seen.get() == 4, s"expected 4 micro-batches, saw ${seen.get()}")
    assert(out.count() > 0)
  }

  test("streamed union ≡ the batch plan, row for row (stateless batching-invariance)") {
    val s = spark
    import s.implicits._
    val streamed = FileStreamHarness.runStateless(spark, sf, "events", dispatch)
      .as[(Long, Int, String)].collect().sorted.toSeq
    val batch = dispatch(EventsTx.load(spark, sf))
      .as[(Long, Int, String)].collect().sorted.toSeq
    assert(streamed == batch)
    assert(batch.nonEmpty, "equality on an empty dispatch would be vacuous")
    // and invariant under a DIFFERENT micro-batch partitioning — the
    // exact property the oracle gate rests on
    val streamed7 = FileStreamHarness.runStateless(spark, sf, "events", dispatch,
        numFiles = 7)
      .as[(Long, Int, String)].collect().sorted.toSeq
    assert(streamed7 == batch)
  }
}
