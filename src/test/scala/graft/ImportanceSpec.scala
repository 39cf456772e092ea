package graft

import graft.operators.Importance
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class ImportanceSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  /** Cleanly separated dialects, NO shared vocabulary: target docs speak
    * "alpha/beta/gamma", raw-only docs "delta/epsilon/zeta"; one
    * featureless doc. With full separation every target feature has
    * ct = cr, so its ratio is exactly scale·(totR+B)/(totT+B) > scale —
    * keep semantics are decidable even under tiny-corpus smoothing.
    */
  def separated = Seq(
    (1L, "alpha beta gamma alpha beta", true),
    (2L, "alpha gamma beta gamma", true),
    (3L, "delta epsilon zeta delta", false),
    (4L, "epsilon zeta delta epsilon zeta", false),
    (6L, "   ", false)
  ).toDF("doc_id", "text", "is_tgt")

  /** [[separated]] plus a mixed doc labeled raw-only — the ordering
    * probe: more target-like than the off-dialect docs, less than the
    * pure-target docs.
    */
  def withMixed = separated.union(
    Seq((5L, "alpha beta delta epsilon", false)).toDF("doc_id", "text", "is_tgt"))

  test("quantized: target-dialect docs keep, off-dialect docs don't; empty doc scores 0") {
    val got = Importance.importanceQuantized(separated, col("is_tgt"), numBuckets = 4096)
      .orderBy($"doc_id").as[(Long, Long, Long, Boolean)].collect()
    val byId = got.map(r => r._1 -> r).toMap
    // target-exclusive features: ct = cr → per-feature ratio > scale → keep
    assert(byId(1L)._4 && byId(2L)._4)
    // off-dialect features never appear in the target sample → drop
    assert(!byId(3L)._4 && !byId(4L)._4)
    // featureless doc: zero features, zero score, not kept
    assert(byId(6L) == ((6L, 0L, 0L, false)))
    // n_feats = unigrams + bigrams = 2·tokens − 1
    assert(byId(1L)._2 == 9L && byId(3L)._2 == 7L)
  }

  test("both arithmetic modes order pure-target > mixed > off-dialect by mean feature score") {
    def meansOf(df: org.apache.spark.sql.DataFrame, scoreCol: String): Map[Long, Double] =
      df.filter($"n_feats" > 0)
        .select($"doc_id", (col(scoreCol).cast("double") / $"n_feats").as("m"))
        .as[(Long, Double)].collect().toMap
    val q = meansOf(
      Importance.importanceQuantized(withMixed, col("is_tgt"), numBuckets = 4096), "score_q")
    val l = meansOf(
      Importance.importanceLogWeights(withMixed, col("is_tgt"), numBuckets = 4096), "log_w")
    for (m <- Seq(q, l)) {
      assert(math.min(m(1L), m(2L)) > m(5L),
        s"pure target must outrank the mixed doc: $m")
      assert(m(5L) > math.max(m(3L), m(4L)),
        s"the mixed doc must outrank pure off-dialect: $m")
    }
  }

  test("narrow (streaming) face fit on the corpus is row-identical to the batch twin") {
    val (ct, cr, tott, totr) = Importance.fitCounts(withMixed, col("is_tgt"), numBuckets = 4096)
    val narrow = Importance.importanceScoreNarrow(withMixed, ct, cr, tott, totr, numBuckets = 4096)
      .select($"doc_id", $"n_feats", $"score_q", $"keep")
      .as[(Long, Long, Long, Boolean)].collect().toSet
    val batch = Importance.importanceQuantized(withMixed, col("is_tgt"), numBuckets = 4096)
      .as[(Long, Long, Long, Boolean)].collect().toSet
    assert(narrow == batch)
    // the narrow face keeps the input columns (streaming pipelines carry
    // event-time/metadata), and scores unseen vocabulary consistently
    val unseen = Seq((9L, "omega psi chi", false)).toDF("doc_id", "text", "is_tgt")
    val row = Importance.importanceScoreNarrow(unseen, ct, cr, tott, totr, numBuckets = 4096)
    assert(row.columns.toSeq == Seq("doc_id", "text", "is_tgt", "n_feats", "score_q", "keep"))
    val (nf, sq) = row.select($"n_feats", $"score_q").as[(Long, Long)].head()
    assert(nf == 5L && sq > 0L) // ct = cr = 0 buckets still smooth-score
  }

  test("selectTopFraction keeps exactly the top fraction by mean ratio, ties to smaller id") {
    val scored = Importance.importanceQuantized(withMixed, col("is_tgt"), numBuckets = 4096)
    val got = Importance.selectTopFraction(scored, perMille = 500)
      .orderBy($"doc_id").as[(Long, Long, Long, Boolean)].collect().toSeq
    // local recompute from the verified scores
    val means = scored.as[(Long, Long, Long, Boolean)].collect()
      .map(r => (r._1, r._3 / math.max(r._2, 1L))).toSeq
    val order = means.sortBy { case (id, m) => (-m, id) }.map(_._1)
    val nKeep = order.indices.count(i => (i + 1) * 1000 <= means.size * 500)
    val want = means.sortBy(_._1).map { case (id, m) =>
      (id, m, order.indexOf(id) + 1L, order.indexOf(id) < nKeep)
    }
    assert(got == want)
    assert(got.count(_._4) == means.size * 500 / 1000)
    // perMille 0 selects nothing; 1000 selects everything
    assert(Importance.selectTopFraction(scored, 0).filter($"selected").count() == 0)
    assert(Importance.selectTopFraction(scored, 1000).filter(!$"selected").count() == 0)
  }

  test("frozen-threshold selection = batch top-fraction ∪ threshold ties on the fit corpus; None selects nothing") {
    val scored = Importance.importanceQuantized(withMixed, col("is_tgt"), numBuckets = 4096)
    for (perMille <- Seq(250, 500, 800)) {
      val thr = Importance.selectionThreshold(scored, perMille)
      assert(thr.nonEmpty, s"perMille=$perMille")
      val frozen = Importance.selectByFrozenThreshold(scored, thr)
        .select($"doc_id", $"mean_q", $"selected")
        .as[(Long, Long, Boolean)].collect().map(r => r._1 -> r).toMap
      val batch = Importance.selectTopFraction(scored, perMille)
        .select($"doc_id", $"mean_q", $"selected")
        .as[(Long, Long, Boolean)].collect().map(r => r._1 -> r).toMap
      // superset: every batch-selected doc is frozen-selected
      batch.values.filter(_._3).foreach { case (id, _, _) =>
        assert(frozen(id)._3, s"perMille=$perMille doc $id dropped by frozen")
      }
      // tolerance: every extra sits exactly AT the threshold
      frozen.values.filter(_._3).foreach { case (id, m, _) =>
        if (!batch(id)._3)
          assert(m == thr.get, s"perMille=$perMille doc $id extra at mean_q=$m != ${thr.get}")
      }
      // both mean columns agree (same integer arithmetic)
      assert(frozen.view.mapValues(_._2).toMap == batch.view.mapValues(_._2).toMap)
    }
    // T = 0: no threshold exists, the frozen filter selects nothing
    assert(Importance.selectionThreshold(scored, 0).isEmpty)
    assert(Importance.selectByFrozenThreshold(scored, None)
      .filter($"selected").count() == 0)
  }

  test("frozen threshold composes with the narrow (streaming) scorer end-to-end") {
    // fit everything on the corpus (counts + threshold), then score and
    // select a "stream" of the same rows through the stateless faces
    // only — no rank, no join, no aggregation in the applied plan
    val (ct, cr, tott, totr) = Importance.fitCounts(withMixed, col("is_tgt"), numBuckets = 4096)
    val scored = Importance.importanceQuantized(withMixed, col("is_tgt"), numBuckets = 4096)
    val thr = Importance.selectionThreshold(scored, perMille = 500)
    val streamed = Importance.selectByFrozenThreshold(
      Importance.importanceScoreNarrow(withMixed, ct, cr, tott, totr, numBuckets = 4096), thr)
      .select($"doc_id", $"selected").as[(Long, Boolean)].collect().toMap
    val batchSel = Importance.selectByFrozenThreshold(scored, thr)
      .select($"doc_id", $"selected").as[(Long, Boolean)].collect().toMap
    assert(streamed == batchSel)
    assert(streamed.values.exists(identity) && streamed.values.exists(!_))
  }

  test("quantized matches a hand-rolled reference on the mixed corpus") {
    val b = 4096
    def toks(s: String) = s.split("[ \t\n\f\r]+").filter(_.nonEmpty).toSeq
    def feats(s: String) = {
      val w = toks(s)
      w ++ w.sliding(2).filter(_.size == 2).map(_.mkString(" "))
    }
    def bucket(g: String) = {
      var h = 0L
      g.foreach(c => h = (h * 31 + c.toLong) % 1000000007L)
      (h * 2654435761L) % b
    }
    val rows = Seq(
      (1L, "alpha beta gamma alpha beta", true),
      (2L, "alpha gamma beta gamma", true),
      (3L, "delta epsilon zeta delta", false),
      (4L, "epsilon zeta delta epsilon zeta", false),
      (6L, "   ", false),
      (5L, "alpha beta delta epsilon", false))
    val all = rows.flatMap { case (id, t, tgt) => feats(t).map(g => (id, tgt, bucket(g))) }
    val cr = all.groupBy(_._3).map { case (k, v) => k -> v.size.toLong }
    val ct = all.filter(_._2).groupBy(_._3).map { case (k, v) => k -> v.size.toLong }
    val totr = all.size.toLong
    val tott = all.count(_._2).toLong
    val want = rows.map { case (id, t, _) =>
      val fs = feats(t)
      val score = fs.map { g =>
        val bk = bucket(g)
        (10000L * (ct.getOrElse(bk, 0L) + 1) * (totr + b)) /
          ((cr(bk) + 1) * (tott + b))
      }.sum
      (id, fs.size.toLong, score, score > 10000L * fs.size)
    }.sortBy(_._1)
    val got = Importance.importanceQuantized(withMixed, col("is_tgt"), numBuckets = b)
      .orderBy($"doc_id").as[(Long, Long, Long, Boolean)].collect().toSeq
    assert(got == want)
  }
}
