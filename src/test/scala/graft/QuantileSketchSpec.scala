package graft

import graft.operators.{Stats, TextDedup}
import graft.functions.TextFunctions
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Pins the approximate quantile face against the exact twin's order
  * statistics: `percentile_approx(accuracy = A)` guarantees rank error
  * ≤ n/A, so the approx value must lie between the exact order
  * statistics at ranks ⌈q·n/1000⌉ ∓ ⌈n/A⌉ (clamped to [1, n]).
  */
class QuantileSketchSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  val sf = "/root/testdata/sf0.001"
  private val qs = Seq(500, 900, 990, 1000)

  lazy val lengths = TextDedup.documents(spark, sf)
    .select(col("lang"), col("doc_id"),
      size(TextFunctions.tokens(col("text"))).as("n_tokens"))
    .cache()

  test("approx quantiles honor the rank-error bound of the exact order statistics") {
    val accuracy = 100 // loose on purpose: the BOUND is what's under test
    val byGroup = lengths.select($"lang", $"n_tokens")
      .as[(String, Int)].collect()
      .groupBy(_._1).view.mapValues(_.map(_._2).sorted).toMap
    val approx = Stats.quantilesApproxPerGroup(lengths, "lang", "n_tokens",
        qs, accuracy)
      .as[(String, Int, Int)].collect()
    assert(approx.map(r => (r._1, r._2)).toSet ==
      (for (l <- byGroup.keySet; q <- qs) yield (l, q)),
      "one row per (group, quantile point)")
    approx.foreach { case (lang, q, got) =>
      val v = byGroup(lang)
      val n = v.length
      val rank = math.max(1, (q * n + 999) / 1000)
      val slack = (n + accuracy - 1) / accuracy
      val lo = v(math.max(1, rank - slack) - 1)
      val hi = v(math.min(n, rank + slack) - 1)
      assert(got >= lo && got <= hi,
        s"($lang, q=$q): approx $got outside exact rank window [$lo, $hi] " +
          s"(n=$n, rank=$rank, slack=$slack)")
    }
  }

  test("high accuracy reproduces the exact twin on this corpus") {
    // n per group ≪ accuracy ⇒ rank error < 1 ⇒ values must match the
    // exact order statistics precisely
    val exact = Stats.quantilesPerGroup(lengths, "lang", "n_tokens",
        "doc_id", qs)
      .select($"lang", $"q", $"quantile").as[(String, Int, Int)].collect().toSet
    val approx = Stats.quantilesApproxPerGroup(lengths, "lang", "n_tokens",
        qs, accuracy = 1000000)
      .as[(String, Int, Int)].collect().toSet
    assert(approx == exact)
  }
}
