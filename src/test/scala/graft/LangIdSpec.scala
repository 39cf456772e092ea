package graft

import graft.functions.{LangId, TextFunctions}
import graft.operators.TextAnalysis
import org.apache.spark.sql.functions._
import org.scalacheck.{Gen, rng}
import org.scalatest.funsuite.AnyFunSuite

/** The one-pass `lang_id` expression claims exact parity with the HOF
  * argmax fold it replaced (5 `size(filter(...))` scores → `greatest` →
  * first-max `when` chain, which re-ran its lambda traversals ~30× per
  * row). This spec pins the claim: a seeded marker-dense token corpus —
  * including cross-language marker collisions ("la" fr∩es, "de" de∩es,
  * "the"/"und"-adjacent strings, null elements, empty and NULL arrays —
  * must produce identical predictions through both spellings, plus the
  * sf0.001 documents table end-to-end through qualityMetrics' tokenizer.
  */
class LangIdSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private def bothSpellings(df: org.apache.spark.sql.DataFrame) =
    df.select(
      col("id"),
      LangId.lang_id(col("toks")).as("fast"),
      TextAnalysis.langIdHof(col("toks")).as("hof"))

  test("seeded marker corpus: expression == HOF fold (ties, overlaps, nulls)") {
    // the pool is mostly markers so ties and overlaps occur constantly;
    // "la" scores fr AND es, "de" scores de AND es, "y"/"de" es, noise
    // tokens score nothing, null elements must be skipped
    val markerPool: Seq[String] =
      LangId.langs.toSeq.flatMap(l => TextFunctions.langMarkers(l)) ++
        Seq("xyzzy", "q", "", "THE", "Der") // non-hits: case-sensitive, noise
    val tokGen = Gen.frequency(
      (9, Gen.oneOf(markerPool)),
      (1, Gen.const(null: String)))
    val arrGen = Gen.choose(0, 12).flatMap(n => Gen.listOfN(n, tokGen))
    val arrays = Gen.listOfN(500, arrGen)
      .pureApply(Gen.Parameters.default, rng.Seed(20260813L))
    val withEdges: Seq[Seq[String]] = arrays ++ Seq(
      Seq.empty[String],                      // best == 0 → und
      Seq("la"),                              // fr∩es tie → fr (declaration order)
      Seq("de"),                              // de∩es tie → de
      Seq("la", "la", "el"),                  // es breaks ahead? fr=2 es=3 → es
      Seq("the", "der", "le", "el", "的"),    // 5-way tie → en
      null)                                   // NULL array → und, non-null result
    val df = withEdges.zipWithIndex
      .map { case (t, i) => (i.toLong, t) }
      .toDF("id", "toks")
    val rows = bothSpellings(df).collect()
    val diverged = rows.filter(r => r.getString(1) != r.getString(2))
    assert(diverged.isEmpty, s"lang_id diverges from the HOF fold:\n${
      diverged.take(5).mkString("\n")}")
    // the NULL-array row must be "und", never null
    val nullRow = bothSpellings(df.filter(col("toks").isNull)).collect()
    assert(nullRow.forall(r => r.getString(1) == "und" && !r.isNullAt(1)))
  }

  test("sf0.001 documents through the real tokenizer: expression == HOF fold") {
    val docs = graft.sources.Tables.load(spark, "/root/testdata/sf0.001", "documents")
      .select(col("doc_id").cast("long").as("id"),
        TextFunctions.tokens(col("text")).as("toks"))
    val rows = bothSpellings(docs).collect()
    assert(rows.nonEmpty)
    assert(rows.forall(r => r.getString(1) == r.getString(2)))
  }

  test("confusion matrix: cells partition the corpus; ppm rows are exact per-lang fractions") {
    import spark.implicits._
    val docs = graft.sources.Tables.load(spark, "/root/testdata/sf0.001", "documents")
    val cells = graft.operators.TextAnalysis.langIdConfusion(docs)
      .as[(String, String, Long, Long)].collect().toSeq
    assert(cells.map(_._3).sum == docs.count())
    for ((_, rows) <- cells.groupBy(_._1)) {
      val total = rows.map(_._3).sum
      for ((_, _, n, ppm) <- rows) assert(ppm == n * 1000000L / total)
    }
    // the per-doc predictions reproduce the cells exactly
    val perDoc = graft.operators.TextAnalysis.qualityMetrics(docs)
      .join(docs.select($"doc_id", $"lang"), "doc_id")
      .groupBy($"lang", $"lang_pred").count()
      .as[(String, String, Long)].collect().toSet
    assert(cells.map(c => (c._1, c._2, c._3)).toSet == perDoc)
  }
}
