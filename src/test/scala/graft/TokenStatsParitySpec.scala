package graft

import graft.functions.{TextFunctions, TokenStats}
import org.apache.spark.sql.functions._
import org.scalacheck.{Gen, rng}
import org.scalatest.funsuite.AnyFunSuite

/** The `token_stats` single-pass expression claims bit-parity with the
  * five-array HOF spelling (`size(toks)`, `size(array_distinct(toks))`,
  * bigram shingles ×2, `aggregate` code-point fold). This spec makes the
  * claim checked rather than documented: a seeded ScalaCheck corpus of
  * adversarial strings (separator runs, case-folding letters, astral
  * code points, empties, NULL) plus the sf0.001 documents table must
  * produce identical rows through both spellings.
  */
class TokenStatsParitySpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  /** The HOF chain tokenStats used before it was wired to the expression —
    * kept here verbatim as the executable parity reference. */
  private def hofStats(df: org.apache.spark.sql.DataFrame) =
    df.withColumn("toks", TextFunctions.tokens(col("text")))
      .withColumn("bi", TextFunctions.shingles(col("toks"), 2))
      .select(
        col("id"),
        size(col("toks")).as("n_tokens"),
        size(array_distinct(col("toks"))).as("n_distinct_tokens"),
        size(col("bi")).as("n_bigrams"),
        size(array_distinct(col("bi"))).as("n_distinct_bigrams"),
        aggregate(col("toks"), lit(0L), (a, t) => a + length(t)).as("n_wchars"))

  private def exprStats(df: org.apache.spark.sql.DataFrame) =
    df.select(col("id"), TokenStats.token_stats(col("text")).as("s"))
      .select(col("id"), col("s.n_tokens"), col("s.n_distinct_tokens"),
        col("s.n_bigrams"), col("s.n_distinct_bigrams"), col("s.n_wchars"))

  private def assertParity(rows: Seq[(Long, String)]): Unit = {
    val df = rows.toDF("id", "text")
    val a = exprStats(df).orderBy("id").collect().toSeq
    val b = hofStats(df).orderBy("id").collect().toSeq
    assert(a == b, s"token_stats diverges from the HOF chain:\n${
      a.zip(b).filter(p => p._1 != p._2).take(5).mkString("\n")}")
  }

  test("seeded adversarial corpus: expression == HOF chain") {
    // alphabet exercises every branch: the exact separator class
    // [ \t\n\f\r], a NON-separator whitespace ( — \s would split on
    // it, the tokenizer must not), case folding (A/ä), repeated short
    // tokens for distinct counting, and an astral plane code point
    // (surrogate pair — n_wchars counts code points, not UTF-16 units)
    val alphabet = Gen.frequency(
      (4, Gen.oneOf(' ', '\t', '\n', '\f', '\r')),
      (1, Gen.const('\u000B')),
      (6, Gen.oneOf('a', 'b', 'A', 'ä', 'Ä')),
      (1, Gen.const("😀".charAt(0))), // high surrogate…
      (1, Gen.const("😀".charAt(1)))) // …and low, so pairs occur
    val strGen = Gen.choose(0, 60).flatMap(n => Gen.stringOfN(n, alphabet))
    val texts = Gen.listOfN(300, strGen)
      .pureApply(Gen.Parameters.default, rng.Seed(20260812L))
    val withEdges = texts ++ Seq("", " ", "a", "a a", "a  a\t\fb\r\nc",
      "😀 😀x", null)
    assertParity(withEdges.zipWithIndex.map { case (t, i) => (i.toLong, t) })
  }

  test("sf0.001 documents table: expression == HOF chain") {
    val docs = graft.sources.Tables.load(spark, "/root/testdata/sf0.001", "documents")
      .select(col("doc_id").cast("long").as("id"), col("text"))
    val a = exprStats(docs).orderBy("id").collect().toSeq
    val b = hofStats(docs).orderBy("id").collect().toSeq
    assert(a == b)
  }
}
