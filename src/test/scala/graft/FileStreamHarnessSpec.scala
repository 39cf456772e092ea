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

  test("per-doc batchTransform (UL2) union ≡ the batch operator under different splits") {
    val s = spark
    import s.implicits._
    val docs = graft.operators.TextDedup.documents(spark, sf)
    val merges = graft.operators.Bpe.mergePairs(
      graft.operators.Bpe.trainMerges(docs, 4))
    val batch = graft.operators.Bpe.ul2Denoisers(docs, merges)
      .as[(Long, String, String, Int, String)].collect().sorted.toSeq
    assert(batch.nonEmpty)
    Seq(3, 5).foreach { nf =>
      val streamed = FileStreamHarness.runStateless(spark, sf, "documents",
          identity, keyCol = "doc_id", numFiles = nf,
          batchTransform = b => graft.operators.Bpe.ul2Denoisers(b, merges))
        .as[(Long, String, String, Int, String)].collect().sorted.toSeq
      assert(streamed == batch, s"numFiles=$nf")
    }
  }

  test("frozen-vocab batchTransform (skip-gram) union ≡ the batch operator") {
    val s = spark
    import s.implicits._
    val docs = graft.operators.TextDedup.documents(spark, sf)
    val vocab = graft.operators.Word2Vec.vocabulary(docs, 8)
    val batch = graft.operators.Word2Vec
      .skipGramPairsWithVocab(docs, vocab, window = 1, negatives = 1)
      .as[(Long, Long, Int, Int, String, String, Int)].collect().sorted.toSeq
    assert(batch.nonEmpty)
    val streamed = FileStreamHarness.runStateless(spark, sf, "documents",
        identity, keyCol = "doc_id", numFiles = 3,
        batchTransform = b => graft.operators.Word2Vec
          .skipGramPairsWithVocab(b, vocab, window = 1, negatives = 1))
      .as[(Long, Long, Int, Int, String, String, Int)].collect().sorted.toSeq
    assert(streamed == batch)
  }

  test("a transform that emits ZERO rows returns an empty frame, not a crash") {
    // round-15 advice: before the outDir seed, an all-empty run left no
    // parquet behind and the read-back threw path-not-found
    val out = FileStreamHarness.runStateless(spark, sf, "events",
      st => st.select(col("event_id")).filter(col("event_id") < 0))
    assert(out.count() == 0)
    assert(out.columns.toSeq == Seq("event_id"))
  }

  test("runEventTime: hop-window appends ≡ batch aggregates over FINALIZED windows") {
    val s = spark
    import s.implicits._
    val hopUs = 1800000000L
    val sizeUs = 2 * hopUs
    val seen = new java.util.concurrent.atomic.AtomicInteger(0)
    val streamed = FileStreamHarness.runEventTime(spark, sf, "events",
        prep = ev => ev.select(col("event_id"), col("event_type"),
          col("user_id"), graft.sources.Tables.epochMicros(ev, "ts").as("tus")),
        tsCol = "tus",
        transform = df => graft.streaming.StreamingHopWindow.aggregateWithUsers(
          df.select(col("event_id").as("eventId"), col("event_type").as("eventType"),
            col("user_id").as("userId"), col("tus"))
            .as[graft.streaming.StreamingHopWindow.Evt],
          sizeUs, hopUs),
        numFiles = 4, onBatch = _ => { seen.incrementAndGet(); () })
      .as[(Long, String, Long, Long, Long, Long)].collect().sorted.toSeq
    // genuinely incremental: the 4 data batches, plus Spark may run
    // no-data flush batches to advance the final watermark
    assert(seen.get() >= 4, s"expected >= 4 micro-batches, saw ${seen.get()}")

    // batch twin restricted to finalized windows: end ≤ ms-floor of the
    // corpus max event time (watermarks are tracked in milliseconds)
    val ev0 = graft.sources.Tables.load(spark, sf, "events")
    val ev = ev0.select(col("event_id"), col("event_type"), col("user_id"),
      graft.sources.Tables.epochMicros(ev0, "ts").as("tus"))
    val maxTus = ev.agg(max(col("tus"))).as[Long].head()
    val wmUs = (maxTus / 1000L) * 1000L
    val batch = ev
      .withColumn("b", col("tus") - (col("tus") % hopUs))
      .withColumn("window_start_us", explode(array(col("b") - hopUs, col("b"))))
      .filter(col("window_start_us") + sizeUs <= wmUs)
      .groupBy(col("window_start_us"), col("event_type"))
      .agg(count(lit(1)).as("n_events"), countDistinct(col("user_id")).as("n_users"),
        min(col("event_id")).as("min_event_id"), max(col("event_id")).as("max_event_id"))
      .as[(Long, String, Long, Long, Long, Long)].collect().sorted.toSeq
    assert(streamed == batch)
    assert(batch.nonEmpty, "equality on an empty finalized set would be vacuous")
    // the restriction BINDS: some window must be non-finalized (else the
    // gate degenerates to the batch gate)
    val all = ev.withColumn("b", col("tus") - (col("tus") % hopUs))
      .withColumn("window_start_us", explode(array(col("b") - hopUs, col("b"))))
      .select(col("window_start_us"), col("event_type")).distinct().count()
    assert(all > batch.size, "no window was held back by the watermark")
  }

  test("runEventTime: streamed sessions ≡ batch sessions minus each user's final (open) one") {
    val s = spark
    import s.implicits._
    val streamed = FileStreamHarness.runEventTime(spark, sf, "events",
        prep = ev => ev.select(col("user_id"), col("event_id"),
          graft.sources.Tables.epochMicros(ev, "ts").as("tus")),
        tsCol = "tus",
        transform = df => graft.streaming.StreamingSessionize.sessionize(
          df.select(col("user_id").as("userId"), col("tus").as("tsUs"))
            .as[graft.streaming.StreamingSessionize.Evt]).toDF())
      .select(col("userId"), col("startUs"), col("endUs"), col("nEvents"))
      .as[(Long, Long, Long, Long)].collect().sorted.toSeq
    val batchAll = graft.operators.Sessionize(spark, sf)
      .select(col("user_id"), col("start_us"), col("end_us"), col("n_events"))
      .as[(Long, Long, Long, Long)].collect().toSeq
    // drop each user's final session (max start) — the one still open
    val expected = batchAll.groupBy(_._1).values
      .flatMap(ss => ss.sortBy(_._2).dropRight(1)).toSeq.sorted
    assert(streamed == expected)
    assert(streamed.nonEmpty, "an all-dropped corpus would be vacuous")
    assert(batchAll.size > streamed.size, "every user must hold back an open session")
  }

  test("runEventTime: rate-cap distinct union ≡ the batch operator (stable prefix growth)") {
    val s = spark
    import s.implicits._
    val streamed = FileStreamHarness.runEventTime(spark, sf, "events",
        prep = ev => ev.select(col("user_id"), col("event_id"),
            graft.sources.Tables.epochMicros(ev, "ts").as("tus"))
          .withColumn("ets", timestamp_micros(col("tus"))),
        tsCol = "tus",
        transform = df => graft.streaming.StreamingEventRateCap.rateCap(
          df, "ets", "0 microseconds", maxPerWindow = 3,
          windowUs = 6L * 3600L * 1000000L).toDF(),
        outputMode = "update")
      .distinct()
      .as[(Long, Long, Long, Int)].collect().sorted.toSeq
    val ev0 = graft.sources.Tables.load(spark, sf, "events")
    val batch = graft.operators.Temporal.eventRateCap(
        ev0.withColumn("tus", graft.sources.Tables.epochMicros(ev0, "ts")),
        "tus", maxPerWindow = 3, windowUs = 6L * 3600L * 1000000L)
      .select(col("user_id"), col("window_start_us"), col("event_id"), col("qrank"))
      .as[(Long, Long, Long, Int)].collect().sorted.toSeq
    assert(streamed == batch)
    assert(batch.nonEmpty)
    // Update mode genuinely re-emitted (the distinct() is doing work):
    // the raw union must exceed the final set
    val raw = FileStreamHarness.runEventTime(spark, sf, "events",
        prep = ev => ev.select(col("user_id"), col("event_id"),
            graft.sources.Tables.epochMicros(ev, "ts").as("tus"))
          .withColumn("ets", timestamp_micros(col("tus"))),
        tsCol = "tus",
        transform = df => graft.streaming.StreamingEventRateCap.rateCap(
          df, "ets", "0 microseconds", maxPerWindow = 3,
          windowUs = 6L * 3600L * 1000000L).toDF(),
        outputMode = "update")
      .count()
    assert(raw > batch.size, "no window spanned a batch boundary — the distinct is vacuous")
  }

  test("runEventTime: source-quota LAST emission ≡ batch quota, and displacement genuinely occurs") {
    val s = spark
    import s.implicits._
    val out = FileStreamHarness.runEventTime(spark, sf, "documents",
        prep = d => d.select(col("source"), col("doc_id"),
          col("n_chars").cast("long").as("score")),
        tsCol = "doc_id",
        transform = df =>
          graft.streaming.StreamingSourceQuota.quota(df, maxPerSource = 10).toDF(),
        outputMode = "update", stampBatchId = true)
      .cache()
    val streamed = out
      .withColumn("_mb", max(col("_batch_id")).over(
        org.apache.spark.sql.expressions.Window.partitionBy(col("source"))))
      .filter(col("_batch_id") === col("_mb"))
      .select(col("source"), col("doc_id"), col("qrank"))
      .as[(String, Long, Int)].collect().sorted.toSeq
    val batch = graft.operators.Curation.sourceQuota(
        graft.operators.TextDedup.documents(spark, sf), maxPerSource = 10,
        score = col("n_chars"))
      .select(col("source"), col("doc_id"), col("qrank"))
      .as[(String, Long, Int)].collect().sorted.toSeq
    assert(streamed == batch)
    assert(batch.nonEmpty)
    // the last-emission filter is doing real work: some (source, qrank)
    // slot must have been held by DIFFERENT docs across triggers
    // (displacement), else a plain distinct would have sufficed
    val displaced = out.select(col("source"), col("qrank"), col("doc_id"))
      .distinct().groupBy(col("source"), col("qrank")).count()
      .filter(col("count") > 1).count()
    assert(displaced > 0, "no slot was ever displaced — the batch-id stamp is vacuous here")
    out.unpersist()
  }
}
