package graft

import graft.operators.{Curation, Sketches, TextDedup}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class CmsSketchSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  val sf = "/root/testdata/sf0.001"
  lazy val docs = TextDedup.documents(spark, sf).cache()

  lazy val exactCounts = docs
    .select($"lang", explode(graft.functions.TextFunctions.tokens($"text")).as("token"))
    .groupBy($"lang", $"token").agg(count(lit(1)).as("n"))
    .as[(String, String, Long)].collect()
    .map { case (l, t, n) => (l, t) -> n }.toMap

  test("CMS estimates are one-sided: est >= exact for every token, overshoot <= eps*N") {
    val eps = 0.001
    val sketches = Sketches.tokenSketchPerGroup(docs, "lang", eps = eps)
    val est = exactCounts.keys.toSeq.toDF("lang", "token")
      .join(sketches, Seq("lang"))
      .withColumn("est", graft.functions.CmsEstimate.cms_estimate($"cms", $"token"))
      .select($"lang", $"token", $"est").as[(String, String, Long)].collect()
    val totalPerLang = exactCounts.groupBy(_._1._1).view.mapValues(_.values.sum).toMap
    est.foreach { case (l, t, e) =>
      val exact = exactCounts((l, t))
      assert(e >= exact, s"($l,$t): est $e < exact $exact — CMS can never undercount")
      assert(e <= exact + (eps * totalPerLang(l)).ceil.toLong + 1,
        s"($l,$t): est $e overshoots exact $exact beyond the eps*N bound")
    }
  }

  test("approx top-k equals the exact twin on this corpus (31-token vocab, no collisions)") {
    val approx = Sketches.topTokensApproxPerGroup(docs, "lang", k = 5)
      .select($"lang", $"token", $"rnk").as[(String, String, Int)].collect().toSet
    val exact = Curation.topTokensPerGroup(docs, "lang", k = 5)
      .select($"lang", $"token", $"rnk").as[(String, String, Int)].collect().toSet
    assert(approx == exact)
    // and the estimated counts on the winners are the exact counts here
    // (eps*N << 1 at this scale, fixed seed — deterministic)
    val ests = Sketches.topTokensApproxPerGroup(docs, "lang", k = 5)
      .select($"lang", $"token", $"est").as[(String, String, Long)].collect()
    ests.foreach { case (l, t, e) => assert(e == exactCounts((l, t))) }
  }

  test("deterministic: identical output across runs (fixed seed, hash sample)") {
    val a = Sketches.topTokensApproxPerGroup(docs, "lang", k = 3)
      .orderBy($"lang", $"rnk").collect().toSeq
    val b = Sketches.topTokensApproxPerGroup(docs, "lang", k = 3)
      .orderBy($"lang", $"rnk").collect().toSeq
    assert(a == b)
  }

  test("sketch is groups-sized and merge-built: one row per lang, binary payload") {
    val s = Sketches.tokenSketchPerGroup(docs, "lang").collect()
    assert(s.length == docs.select($"lang").distinct().count())
    assert(s.forall(_.getAs[Array[Byte]]("cms").nonEmpty))
  }
}
