package graft

import graft.operators.{Stats, TextDedup}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class StatsSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  val sf = "/root/testdata/sf0.001"
  lazy val docs = TextDedup.documents(spark, sf).cache()

  test("quantilesPerGroup: hand-checked order statistics, duplicates, single-row group") {
    // group a: values 1..10 → p500 = 5th smallest = 5, p1000 = 10
    // group b: all equal → every quantile is 7
    // group c: single row → every quantile is 42
    val df = ((1 to 10).map(i => ("a", i.toLong, i.toLong))
      ++ (1 to 4).map(i => ("b", 7L, 100L + i))
      ++ Seq(("c", 42L, 1L))).toDF("g", "v", "id")
    val out = Stats.quantilesPerGroup(df, "g", "v", "id", Seq(500, 1000))
      .as[(String, Int, Long)].collect().toSet
    assert(out == Set(
      ("a", 500, 5L), ("a", 1000, 10L),
      ("b", 500, 7L), ("b", 1000, 7L),
      ("c", 500, 42L), ("c", 1000, 42L)))
  }

  test("quantilesPerGroup rejects out-of-range quantile points") {
    val df = Seq(("a", 1L, 1L)).toDF("g", "v", "id")
    intercept[IllegalArgumentException] {
      Stats.quantilesPerGroup(df, "g", "v", "id", Seq(0))
    }
    intercept[IllegalArgumentException] {
      Stats.quantilesPerGroup(df, "g", "v", "id", Seq(1001))
    }
  }

  test("keySkew: hand-checked counts, exact ppm/salt arithmetic, top-k cut") {
    // key a: 6 rows, b: 3, c: 2, d: 1 → total 12, nk 4, mean 3
    val df = (Seq.fill(6)("a") ++ Seq.fill(3)("b") ++ Seq.fill(2)("c") ++ Seq("d"))
      .zipWithIndex.map { case (k, i) => (k, i.toLong) }.toDF("k", "x")
    val out = Stats.keySkew(df, "k", k = 3)
      .as[(String, Long, Int, Long, Long, Long)].collect().sortBy(_._3)
    assert(out.toSeq == Seq(
      // share_ppm = n*1e6/12; skew_ppm = n*4*1e6/12; salt = ceil(n*4/12)
      ("a", 6L, 1, 500000L, 2000000L, 2L),
      ("b", 3L, 2, 250000L, 1000000L, 1L),
      ("c", 2L, 3, 166666L, 666666L, 1L)))
  }

  test("keySkew: tie-break on key is deterministic; k beyond distinct keys returns all") {
    val df = Seq("b", "a", "b", "a").zipWithIndex
      .map { case (k, i) => (k, i.toLong) }.toDF("k", "x")
    val out = Stats.keySkew(df, "k", k = 10)
      .as[(String, Long, Int, Long, Long, Long)].collect().sortBy(_._3)
    assert(out.map(r => (r._1, r._3)).toSeq == Seq(("a", 1), ("b", 2)))
    // both keys exactly at the mean: skew 1e6, salt factor 1
    assert(out.forall(r => r._5 == 1000000L && r._6 == 1L))
  }

  test("cardinalities: empty docs still counted; approx path within 5% of exact") {
    val exact = Stats.cardinalities(docs, "source")
      .as[(String, Long, Long, Long)].collect().map(r => r._1 -> r).toMap
    // every doc appears exactly once per source
    val docCounts = docs.groupBy($"source").count()
      .as[(String, Long)].collect().toMap
    docCounts.foreach { case (s, n) => assert(exact(s)._2 == n, s"source $s") }
    val approx = Stats.cardinalitiesApprox(docs, "source")
      .as[(String, Long, Long, Long)].collect().map(r => r._1 -> r).toMap
    exact.foreach { case (s, (_, nd, nfp, ntok)) =>
      val (_, ad, afp, atok) = approx(s)
      def close(a: Long, e: Long) = e == 0 || math.abs(a - e).toDouble / e <= 0.05
      assert(close(ad, nd) && close(afp, nfp) && close(atok, ntok),
        s"source $s: approx ($ad,$afp,$atok) vs exact ($nd,$nfp,$ntok)")
    }
  }

  test("topKPerGroup: salted two-phase rank equals the unsalted window rank; ties deterministic") {
    import org.apache.spark.sql.expressions.Window
    // 3 groups × 40 keys with colliding counts so the (c DESC, key ASC)
    // tiebreak binds; salts=4 forces real phase-1 partitioning on a
    // fixture this small
    val df = (for (g <- Seq("a", "b", "c"); i <- 0 until 40)
      yield (g, f"k$i%02d", (i % 7).toLong)).toDF("g", "k", "c")
    val got = Stats.topKPerGroup(df, "g", 5, saltCol = $"k",
        order = Seq($"c".desc, $"k"), salts = 4)
      .select($"g", $"rank", $"k", $"c")
      .as[(String, Int, String, Long)].collect().toSet
    val w = Window.partitionBy($"g").orderBy($"c".desc, $"k")
    val naive = df.withColumn("rank", row_number().over(w))
      .filter($"rank" <= 5).select($"g", $"rank", $"k", $"c")
      .as[(String, Int, String, Long)].collect().toSet
    assert(got == naive && got.size == 15,
      "salting must move work, never answers")
    // k beyond the group size returns the whole group, still ranked
    val all = Stats.topKPerGroup(df.filter($"g" === "a"), "g", 100,
        saltCol = $"k", order = Seq($"c".desc, $"k"))
      .as[(String, String, Long, Int)].collect()
    assert(all.length == 40)
  }

  test("topNgramsBySource: hand-rolled bigram counts and ranks") {
    val df = Seq(
      (1L, "x y x y z", "s1"),
      (2L, "x y q", "s1"),
      (3L, "a b a b", "s2")).toDF("doc_id", "text", "source")
    val got = graft.operators.TextAnalysis.topNgramsBySource(df, n = 2, k = 2)
      .select($"source", $"rank", $"ngram", $"n_occ")
      .as[(String, Int, String, Long)].collect().toSet
    // s1 bigrams: "x y"×3, "y x"×1, "y z"×1, "y q"×1 → top2 = x y (3),
    // then the tie at 1 resolves to "y q" < "y x" < "y z" alphabetically
    // s2: "a b"×2, "b a"×1
    assert(got == Set(
      ("s1", 1, "x y", 3L), ("s1", 2, "y q", 1L),
      ("s2", 1, "a b", 2L), ("s2", 2, "b a", 1L)))
  }
}
