package graft.streaming

import org.apache.spark.sql.Dataset
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
import org.apache.spark.util.sketch.CountMinSketch

/** Streaming per-group heavy hitters — the continuous face of
  * [[graft.operators.Sketches.topTokensApproxPerGroup]] (SURVEY §2.8
  * extended streaming set): the current top-k tokens per group over
  * EVERYTHING seen so far, re-emitted every trigger, with state bounded
  * by construction.
  *
  * State per group is exactly one `d×w` Count-Min sketch plus at most
  * `candidates` (token, estimate) pairs — O(1) in stream length and
  * vocabulary, the property that makes the operator runnable forever on
  * an unbounded ingest (the exact spelling's per-group state is
  * vocabulary-sized and only grows). A billion-key group space shards
  * across the cluster by the groupBy key like any stateful operator.
  *
  * Candidate discipline (mirrors the batch operator's
  * sample-for-candidates / sketch-for-counts split): every batch token is
  * a candidate while it ranks among the top `candidates` CMS estimates;
  * a true heavy hitter keeps re-arriving, so it re-enters the pool even
  * if an early flood once evicted it — the standard
  * SpaceSaving/Misra-Gries recovery argument, with the CMS (not a
  * decayed counter) supplying the frequency, so estimates are one-sided:
  * est ≥ true count always, est ≤ true + eps·N with probability ≥
  * `confidence` (CmsSketchSpec pins the same bounds on the batch twin).
  *
  * Determinism: CMS counter increments commute, so the sketch is
  * independent of arrival order within a batch; ranking ties break on
  * the lexicographically smaller token, like every ranked operator in
  * the engine.
  */
object StreamingHeavyHitters {

  case class Tok(group: String, token: String)
  case class HHState(cms: Array[Byte], cand: Map[String, Long])
  case class HH(group: String, token: String, est: Long, rnk: Int)

  /** One group-batch state transition, factored PURE so the state bound
    * and the estimate guarantees are unit-testable without a streaming
    * query: returns the new state and this trigger's top-k emission.
    */
  private[graft] def updateGroup(group: String, tokens: Seq[String],
      old: Option[HHState], k: Int, candidates: Int,
      eps: Double, confidence: Double, seed: Int): (HHState, Seq[HH]) = {
    val sketch = old match {
      case Some(s) => CountMinSketch.readFrom(new java.io.ByteArrayInputStream(s.cms))
      case None    => CountMinSketch.create(eps, confidence, seed)
    }
    tokens.foreach(sketch.add)
    // candidate pool: surviving candidates ∪ this batch's distinct
    // tokens, re-estimated against the UPDATED sketch, kept to the top
    // `candidates` by (estimate DESC, token ASC)
    val pool = (old.map(_.cand.keySet).getOrElse(Set.empty) ++ tokens).toSeq
    val ranked = pool
      .map(t => t -> sketch.estimateCount(t))
      .sortBy { case (t, est) => (-est, t) }
    val kept = ranked.take(candidates)
    val out = new java.io.ByteArrayOutputStream()
    sketch.writeTo(out)
    val emission = kept.take(k).zipWithIndex.map { case ((t, est), i) =>
      HH(group, t, est, i + 1)
    }
    (HHState(out.toByteArray, kept.toMap), emission)
  }

  /** `toks` must be a streaming Dataset. Emits the refreshed per-group
    * top-k every trigger (update semantics).
    */
  def topTokens(toks: Dataset[Tok], k: Int, candidates: Int = 256,
      eps: Double = 0.001, confidence: Double = 0.99,
      seed: Int = 42): Dataset[HH] = {
    require(k >= 1 && candidates >= k,
      s"need candidates ($candidates) >= k ($k) >= 1")
    import toks.sparkSession.implicits._
    toks
      .groupByKey(_.group)
      .flatMapGroupsWithState[HHState, HH](
        OutputMode.Update, GroupStateTimeout.NoTimeout) {
        (group: String, batch: Iterator[Tok], state: GroupState[HHState]) =>
          val (next, emission) = updateGroup(group, batch.map(_.token).toSeq,
            state.getOption, k, candidates, eps, confidence, seed)
          state.update(next)
          emission.iterator
      }
  }
}
