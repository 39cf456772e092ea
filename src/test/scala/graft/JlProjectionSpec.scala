package graft

import graft.operators.Similarity
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class JlProjectionSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  /** Two tight 64-dim clusters far apart: cluster A around e₁+…+e₃₂,
    * cluster B around e₃₃+…+e₆₄, ±0.1 deterministic jitter.
    */
  def clustered: org.apache.spark.sql.DataFrame = {
    def jitter(id: Long, i: Int): Float =
      (((id * 64 + i) * 2654435761L % 1000000007L) % 21 - 10).toFloat / 100f
    val rows = (0L until 20L).map { id =>
      val base = if (id < 10) 0 else 32
      val v = Array.tabulate(64)(i =>
        (if (i >= base && i < base + 32) 1f else 0f) + jitter(id, i))
      (id, v.toSeq)
    }
    rows.toDF("vec_id", "embedding")
  }

  test("prefixDims: exact slice; full-width prefix is the identity ranking; clustered corpora survive truncation IF the prefix carries the signal") {
    val emb = clustered
    // the slice is exactly the first d coordinates
    val got = Similarity.prefixDims(emb, 16)
      .orderBy($"vec_id").as[(Long, Seq[Float])].collect()
    val raw = emb.orderBy($"vec_id").as[(Long, Seq[Float])].collect()
    got.zip(raw).foreach { case ((i1, p), (i2, full)) =>
      assert(i1 == i2 && p == full.take(16))
    }
    // d = 64 is the identity: top-k ranking unchanged
    val k = 3; val qs = 0L to 4L
    val exact = Similarity.bruteForceTopK(emb, qs, k)
      .select($"query_id", $"neighbor_id").as[(Long, Long)].collect().toSet
    val id64 = Similarity.bruteForceTopK(Similarity.prefixDims(emb, 64), qs, k)
      .select($"query_id", $"neighbor_id").as[(Long, Long)].collect().toSet
    assert(id64 == exact)
    // cluster A lives in dims 0-31, so its 16-dim prefix keeps the
    // cluster margin: truncated neighbors of A-queries stay in-cluster
    // (the corpus-margin story q_embed_mrl_recall measures)
    val mrl = Similarity.bruteForceTopK(Similarity.prefixDims(emb, 16), qs, k)
      .select($"query_id", $"neighbor_id").as[(Long, Long)].collect().toSet
    assert(mrl.forall { case (_, n) => n < 10 })
  }

  test("strongly separated clusters survive the 16-dim projection: neighbors stay in-cluster") {
    val emb = clustered
    val k = 3
    val qs = 0L to 4L
    val exact = Similarity.bruteForceTopK(emb, qs, k)
      .select($"query_id", $"neighbor_id").as[(Long, Long)].collect().toSet
    val jl = Similarity.bruteForceTopK(Similarity.jlProject(emb, 16), qs, k)
      .select($"query_id", $"neighbor_id").as[(Long, Long)].collect().toSet
    // the CLUSTER margin (≈1 cosine gap) dwarfs JL distortion, so every
    // projected neighbor stays in the query's cluster; ordering WITHIN
    // the cluster rides on ±0.1 jitter — margins of the distortion's own
    // scale — and legitimately reshuffles (exactly the corpus-margin
    // story q_embed_jl_recall measures on the noise-margin testdata)
    assert(exact.forall { case (_, n) => n < 10 })
    assert(jl.forall { case (_, n) => n < 10 })
    assert(jl.map(_._1) == exact.map(_._1)) // k rows per query both sides
  }

  test("sign matrix is balanced and column-decorrelated (the linear-parity collapse regression)") {
    val P = 1000000007L
    def sign(k: Long): Int = {
      val h = (k * 2654435761L) % P
      (((h * h) % P) % 2).toInt
    }
    val d = 16
    val bits = for (i <- 0 until 64; j <- 0 until d) yield sign(i.toLong * d + j + 1)
    val balance = bits.sum.toDouble / bits.size
    assert(balance > 0.4 && balance < 0.6, s"sign balance $balance")
    // adjacent output dims must not share their sign column (the linear
    // parity did — every dim collapsed onto ±Σv and recall measured 0)
    for (j2 <- 1 to 3) {
      val agree = (0 until 64).count(i =>
        sign(i.toLong * d + 1) == sign(i.toLong * d + j2 + 1))
      assert(agree > 16 && agree < 48, s"dims 0,$j2 agree on $agree/64 rows")
    }
  }

  test("projection is exactly the reference fold (order and signs)") {
    val emb = clustered
    val got = Similarity.jlProject(emb, 8)
      .orderBy($"vec_id").as[(Long, Seq[Double])].collect()
    val in = emb.orderBy($"vec_id").as[(Long, Seq[Float])].collect()
    val P = 1000000007L
    val want = in.map { case (id, v) =>
      id -> (0 until 8).map { j =>
        var acc = 0.0
        for (i <- v.indices) {
          val h = ((i.toLong * 8 + j + 1) * 2654435761L) % P
          val s = if (((h * h) % P) % 2 == 0) 1.0 else -1.0
          acc += s * v(i).toDouble
        }
        acc
      }.toSeq
    }
    assert(got.map(r => (r._1, r._2)).toSeq == want.toSeq)
  }
}
