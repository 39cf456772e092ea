package graft

import graft.operators.{Multimodal, Similarity, TextDedup}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class M5OperatorsSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  val sf = "/root/testdata/sf0.001"
  lazy val docs = TextDedup.documents(spark, sf).cache()

  test("exact dedup: copy counts sum to table size; keep_id is the min of its group") {
    val d = TextDedup.exactDuplicates(docs)
    assert(d.agg(sum($"n_copies")).as[Long].head() == docs.count())
    assert(TextDedup.dedupKeepFirst(docs).count() == d.count())
  }

  test("chunk dedup: copy counts conserve the chunk stream; duplicated passages surface across distinct docs") {
    // doc 20 extends doc 10 with a fresh tail — doc-level exact dedup
    // misses the shared 8-token body entirely; the chunk pass catches
    // the two aligned chunks (chunk alignment is per-doc, so shared
    // PREFIXES and full dups always align; interior-shifted reuse is
    // the near-dup/substring families' job)
    val d = Seq(
      (10L, "p q r s t u v w"),
      (20L, "p q r s t u v w extra tail words"),
      (30L, "completely different words here"),
      (40L, ""),
      (50L, "p q r s t u v w")) // full exact dup of 10
      .toDF("doc_id", "text")
    val window = 4; val stride = 4
    val got = TextDedup.chunkDuplicates(d, window, stride)
      .as[(Long, Int, Int, Long)].collect().toSeq
    val chunks = graft.operators.Curation.chunkByTokens(d, window, stride)
      .filter($"n_tokens" > 0)
    // conservation: n_copies over survivors = total non-empty chunks
    assert(got.map(_._4).sum == chunks.count())
    // keeper is the lexicographic min of its duplicate family
    val byText = chunks.as[(Long, Int, String, Int)].collect().toSeq
      .groupBy(_._3)
    byText.foreach { case (txt, rs) =>
      val keeper = rs.map(r => (r._1, r._2)).min
      assert(got.exists(g => (g._1, g._2) == keeper && g._4 == rs.size),
        s"chunk '$txt'")
    }
    // docs 10/20/50 share the aligned 8-token body: both its chunks
    // keep at doc 10 with 3 copies each; neither 20's body chunks nor
    // any of 50 survive as keepers (20 keeps only its fresh tail chunk)
    val k10 = got.filter(_._1 == 10L)
    assert(k10.size == 2 && k10.forall(_._4 == 3L))
    assert(got.filter(_._1 == 20L).map(_._2) == Seq(2))
    assert(!got.exists(_._1 == 50L), "the full dup contributes no keeper")
    // empty doc contributes nothing
    assert(!got.exists(_._1 == 40L))
  }

  test("property: chunk dedup hash-only spelling ≡ text-keyed path, incl. forced full/partial hash collisions") {
    import org.scalacheck.{Gen, rng}
    // a tiny word pool so chunks genuinely duplicate across documents
    val wordGen = Gen.oneOf("p", "q", "r", "s", "boiler", "plate")
    val docGen = Gen.choose(0, 12).flatMap(n => Gen.listOfN(n, wordGen).map(_.mkString(" ")))
    val corpus = Gen.listOfN(30, docGen)
      .pureApply(Gen.Parameters.default, rng.Seed(2424L))
      .zipWithIndex.map { case (t, i) => (i.toLong, t) }
      .toDF("doc_id", "text")
    // xxhash64 (production), a 4-bucket hash (partial collisions: clean
    // path AND text-keyed diversion both run), and a constant hash
    // (EVERY chunk collides: the diversion carries it all)
    val hashes: Seq[(String, org.apache.spark.sql.Column => org.apache.spark.sql.Column)] = Seq(
      "xxhash64" -> (c => xxhash64(c)),
      "mod4" -> (c => pmod(xxhash64(c), lit(4L))),
      "const" -> (_ => lit(0L)))
    for ((window, stride) <- Seq((4, 4), (4, 3), (2, 2))) {
      val direct = TextDedup.chunkDuplicates(corpus, window, stride)
        .as[(Long, Int, Int, Long)].collect().toSet
      hashes.foreach { case (hname, h) =>
        val hashed = TextDedup.chunkDuplicatesKeyed(corpus, window, stride, h)
          .as[(Long, Int, Int, Long)].collect().toSet
        assert(hashed == direct, s"window=$window stride=$stride hash=$hname: " +
          s"extra=${(hashed -- direct).take(3)} missing=${(direct -- hashed).take(3)}")
      }
    }
  }

  test("LSH candidates contain every true near-dup pair (recall 1 on exact dups)") {
    val truePairs = TextDedup.jaccardPairs(docs, threshold = 0.99)
      .select($"doc_a", $"doc_b").as[(Long, Long)].collect().toSet
    val candidates = TextDedup.lshCandidatePairs(docs)
      .as[(Long, Long)].collect().toSet
    assert(truePairs.subsetOf(candidates),
      s"missing: ${truePairs -- candidates}")
  }

  test("minhash near-dups = LSH candidates verified by exact jaccard") {
    val viaLsh = TextDedup.minhashNearDups(docs, threshold = 0.9)
      .select($"doc_a", $"doc_b").as[(Long, Long)].collect().toSet
    // exact-dup pairs (same text) must all be found, with jac = 1.0
    val exact = docs.as("a").join(docs.as("b"),
        $"a.text" === $"b.text" && $"a.doc_id" < $"b.doc_id")
      .select($"a.doc_id", $"b.doc_id").as[(Long, Long)].collect().toSet
    assert(exact.subsetOf(viaLsh))
  }

  test("cross-source dup matrix: counts partition the verified pair set") {
    val pairs = TextDedup.minhashNearDups(docs, threshold = 0.5)
      .select($"doc_a", $"doc_b").as[(Long, Long)].collect().toSet
    val m = TextDedup.crossSourceDupMatrix(docs, threshold = 0.5)
      .as[(String, String, Long)].collect().toSeq
    // every pair is attributed exactly once: matrix total == pair count
    assert(m.map(_._3).sum == pairs.size)
    // unordered attribution: keys are canonical (x <= y), hence unique
    assert(m.forall { case (x, y, _) => x <= y })
    assert(m.map(t => (t._1, t._2)).distinct.size == m.size)
    assert(m.nonEmpty, "corpus should have at least one near-dup pair")
  }

  test("source novelty: exclusive counts partition the single-source vocabulary") {
    val ss = docs.select($"source",
        explode(graft.functions.ShingleHashes.shingle_hashes($"text", 3)).as("sh"))
      .distinct().as[(String, Long)].collect()
    val bySh = ss.groupBy(_._2).view.mapValues(_.map(_._1).toSet)
    val singles = bySh.count(_._2.size == 1)
    val rep = TextDedup.sourceNovelty(docs)
      .as[(String, Long, Long, Long)].collect()
    // per-source totals and exclusives reproduce the hand computation
    rep.foreach { case (src, n, excl, ppm) =>
      val mine = ss.filter(_._1 == src).map(_._2).toSet
      assert(n == mine.size, s"$src: n_shingles")
      assert(excl == mine.count(sh => bySh(sh).size == 1), s"$src: n_exclusive")
      assert(ppm == excl * 1000000L / n, s"$src: ppm")
    }
    // every single-source shingle is attributed to exactly one source
    assert(rep.map(_._3).sum == singles)
  }

  test("corpus MinHash sketch: group signature = elementwise min; merge order irrelevant") {
    val sk = TextDedup.corpusSketches(docs, perms = 16)
    // 20 sources × 16 perms
    assert(sk.count() == 20 * 16)
    // the sketch of a group is <= every member signature, elementwise
    val oneSource = docs.filter($"source" === "src0")
    val member = TextDedup.minhashSignatures(oneSource, 16)
      .groupBy($"perm").agg(min($"minhash").as("want"))
    val got = sk.filter($"source" === "src0").select($"perm", $"minhash")
    assert(got.join(member, "perm").filter($"minhash" =!= $"want").count() == 0)
  }

  test("incrementalDedup: exact, near, and new dispositions; pairs only cross the batch boundary") {
    val base = "alpha beta gamma delta epsilon zeta eta theta " * 8
    val oldDocs = Seq(
      (1L, base), (2L, base + "iota kappa"), (3L, "totally different content here"))
      .toDF("doc_id", "text").withColumn("lang", lit("en")).withColumn("source", lit("s"))
    val newDocs = Seq(
      (101L, base),                    // exact dup of old 1
      (102L, base + "iota kappa mu"),  // near dup of old 2 (and 1)
      (103L, "nothing like the corpus at all"))
      .toDF("doc_id", "text").withColumn("lang", lit("en")).withColumn("source", lit("s"))
    val out = TextDedup.incrementalDedup(newDocs, oldDocs, threshold = 0.8)
      .orderBy($"doc_id")
      .as[(Long, Option[Long], Option[Long], Boolean)].collect()
    assert(out(0)._2.contains(1L) && !out(0)._4)          // exact hit, smallest old id
    assert(out(1)._2.isEmpty && out(1)._3.nonEmpty && !out(1)._4) // near only
    assert(out(2)._2.isEmpty && out(2)._3.isEmpty && out(2)._4)   // genuinely new
    // the reported near-dup id is the SMALLEST old doc clearing the
    // threshold — pinned against independently computed Jaccard, so a
    // regression of min(old_id) to max/any cannot pass
    val sh = graft.functions.ShingleHashes.shingle_hashes(col("text"), 3)
    val hashes = oldDocs.unionByName(newDocs).select($"doc_id", sh.as("h"))
      .as[(Long, Seq[Long])].collect().toMap
    def jac(a: Long, b: Long): Double = {
      val (x, y) = (hashes(a).toSet, hashes(b).toSet)
      x.intersect(y).size.toDouble / x.union(y).size
    }
    val expected = Seq(1L, 2L, 3L).filter(o => jac(102L, o) >= 0.8).min
    assert(out(1)._3.contains(expected))
  }

  test("PQ: m codes per vector, codes in [0, ksub); identical vectors share codes; ADC ranks monotone") {
    val emb = Similarity.embeddings(spark, sf).cache()
    val codes = Similarity.pqEncode(emb, m = 8, ksub = 4).cache()
    assert(codes.count() == emb.count())
    assert(codes.filter(size($"codes") =!= 8).count() == 0)
    assert(codes.filter(exists($"codes", c => c < 0 || c >= 4)).count() == 0)
    // byte-identical embeddings must encode identically
    val mismatched = emb.as("a").join(emb.as("b"),
        $"a.embedding" === $"b.embedding" && $"a.vec_id" < $"b.vec_id")
      .join(codes.as("ca"), $"a.vec_id" === $"ca.vec_id")
      .join(codes.as("cb"), $"b.vec_id" === $"cb.vec_id")
      .filter($"ca.codes" =!= $"cb.codes")
    assert(mismatched.count() == 0)
    // ADC distance is non-decreasing in rank within each query
    val topk = Similarity.annPqTopK(emb, 0L to 9L, k = 10)
    assert(topk.as("x").join(topk.as("y"),
        $"x.query_id" === $"y.query_id" && $"x.rank" < $"y.rank" &&
        $"x.adc" > $"y.adc").count() == 0)
  }

  test("minhash_union rejects signatures of the wrong length instead of skipping them") {
    // A perms mismatch silently skipped would yield sentinel-only sketches
    val bad = Seq((1L, Seq(1L, 2L, 3L))).toDF("id", "sig")
    val ex = intercept[Exception] {
      bad.groupBy($"id")
        .agg(graft.functions.MinHashUnion.minhash_union($"sig", perms = 16))
        .collect()
    }
    def messages(t: Throwable): Seq[String] =
      Option(t).toSeq.flatMap(e => Option(e.getMessage).toSeq ++ messages(e.getCause))
    assert(messages(ex).exists(_.contains("minhash_union")), ex.toString)
  }

  test("banded simhash near-dups ≡ all-pairs (exact recall via pigeonhole), fixed + seeded random thresholds") {
    // property-style sweep: the pinned thresholds plus seeded ScalaCheck
    // draws over the full domain [0, 16] — insurance that the pigeonhole
    // band-split logic holds at every width mix, not just the curated ones
    import org.scalacheck.{Gen, rng}
    val drawn = Gen.listOfN(5, Gen.choose(0, 16))
      .pureApply(Gen.Parameters.default, rng.Seed(42L))
    val s = TextDedup.simhashes(docs).join(docs.select($"doc_id", $"lang"), "doc_id")
    for (maxDist <- (Seq(0, 3, 16) ++ drawn).distinct) {
      val allPairs = s.as("a").join(s.as("b"),
          $"a.lang" === $"b.lang" && $"a.doc_id" < $"b.doc_id")
        .select($"a.doc_id", $"b.doc_id",
          bit_count($"a.simhash".bitwiseXOR($"b.simhash")).as("h"))
        .filter($"h" <= maxDist)
        .as[(Long, Long, Int)].collect().toSet
      val banded = TextDedup.simhashNearDups(docs, maxDist, allowLooseBands = true)
        .as[(Long, Long, Int)].collect()
      assert(banded.length == banded.toSet.size, s"duplicate pairs at maxDist=$maxDist")
      assert(banded.toSet == allPairs, s"mismatch at maxDist=$maxDist")
    }
  }

  test("simhashNearDups guards loose bands (< 6 bits) behind an explicit opt-in") {
    val ex = intercept[IllegalArgumentException] {
      TextDedup.simhashNearDups(docs, maxDist = 16)
    }
    assert(ex.getMessage.contains("allowLooseBands"), ex.getMessage)
    // tight knob needs no opt-in: 6 → 8-bit bands
    TextDedup.simhashNearDups(docs, maxDist = 6)
    // opt-in accepted
    TextDedup.simhashNearDups(docs, maxDist = 16, allowLooseBands = true)
  }

  test("cosine_sim implicitly casts float arrays (no garbage from 4-byte slots)") {
    val df = Seq((Array(1.0f, 2.0f, 3.0f), Array(3.0f, 2.0f, 1.0f))).toDF("a", "b")
    val viaFloat = df.select(graft.functions.CosineSim.cosine_sim($"a", $"b"))
      .as[Double].head()
    val viaDouble = df.select(graft.functions.CosineSim.cosine_sim(
      Similarity.asDouble($"a"), Similarity.asDouble($"b"))).as[Double].head()
    assert(viaFloat == viaDouble)
    assert(math.abs(viaFloat - 10.0 / 14.0) < 1e-15)
  }

  test("cosine_sim returns NULL (not NaN) on zero-norm and empty arrays, like the HOF divide") {
    val df = Seq((Array(0.0, 0.0), Array(1.0, 2.0), Array.empty[Double])).toDF("z", "v", "e")
    val got = df.select(
      graft.functions.CosineSim.cosine_sim($"z", $"v"),
      graft.functions.CosineSim.cosine_sim($"e", $"e"))
      .as[(Option[Double], Option[Double])].head()
    assert(got == ((None, None)))
  }

  test("simhash62 treats negative hashes as the HOF fold did: -1 on every bit") {
    // HOF tested (h >> b) % 2 === 1; a negative long's remainder is 0/-1,
    // never 1, so every bit counted -1 — equal to hash 0
    val df = Seq(1).toDF("x").select(
      array(lit(-7L), lit(5L)).as("neg"),
      array(lit(0L), lit(5L)).as("zero"))
    val got = df.select(
      graft.functions.SimHash62.simhash62($"neg"),
      graft.functions.SimHash62.simhash62($"zero")).as[(Long, Long)].head()
    assert(got._1 == got._2)
  }

  test("simhash62 null-element semantics match the per-bit HOF fold (null ≡ hash 0)") {
    val df = Seq(1).toDF("x").select(
      array(lit(5L), lit(null).cast("long"), lit(5L)).as("mh"),
      array(lit(5L), lit(0L), lit(5L)).as("mh0"))
    val got = df.select(
      graft.functions.SimHash62.simhash62($"mh"),
      graft.functions.SimHash62.simhash62($"mh0")).as[(Long, Long)].head()
    assert(got._1 == got._2) // null element behaves exactly like 0L
    // and a 2-of-3 majority on bits 0 and 2 (value 5) sets exactly those bits
    assert(got._2 == 5L)
  }

  test("identical texts have identical simhash (hamming 0)") {
    val sh = TextDedup.simhashes(docs)
    val joined = docs.select($"doc_id", $"text")
      .join(sh, "doc_id")
      .groupBy($"text").agg(countDistinct($"simhash").as("n"))
    assert(joined.filter($"n" > 1).count() == 0)
  }

  test("brute-force top-k: ranks are 1..k, neighbors exclude the query, cos within [-1,1]") {
    val tk = Similarity.bruteForceTopK(Similarity.embeddings(spark, sf), Seq(0L, 1L), k = 5)
      .select($"query_id", $"neighbor_id", $"rank", $"cos")
      .as[(Long, Long, Int, Double)].collect()
    assert(tk.length == 10)
    assert(tk.forall { case (q, n, r, c) => q != n && r >= 1 && r <= 5 && c >= -1.0001 && c <= 1.0001 })
    // rank 1 has the max cosine per query
    val byQ = tk.groupBy(_._1)
    byQ.values.foreach { rows =>
      val sorted = rows.sortBy(_._3)
      assert(sorted.sliding(2).forall { case Array(a, b) => a._4 >= b._4; case _ => true })
    }
  }

  test("ANN LSH results are a subset of brute-force candidates with correct per-bucket ranking") {
    val ann = Similarity.annLshTopK(Similarity.embeddings(spark, sf), Seq(0L, 1L, 2L), k = 5)
      .select($"query_id", $"neighbor_id").as[(Long, Long)].collect().toSet
    val bf = Similarity.bruteForceTopK(Similarity.embeddings(spark, sf), Seq(0L, 1L, 2L), k = 500)
      .select($"query_id", $"neighbor_id").as[(Long, Long)].collect().toSet
    assert(ann.subsetOf(bf)) // every ANN hit is a real corpus vector ≠ query
  }

  test("dup clusters: driver union-find and distributed propagation agree") {
    val pairs = Seq((1L, 2L), (2L, 3L), (10L, 11L), (5L, 9L), (9L, 12L), (3L, 7L))
      .toDF("doc_a", "doc_b")
    val viaDriver = TextDedup.dupClusters(pairs)
      .as[(Long, Long)].collect().toMap
    val viaDistributed = TextDedup.dupClusters(pairs, driverThreshold = 0L)
      .as[(Long, Long)].collect().toMap
    val expected = Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 7L -> 1L,
      10L -> 10L, 11L -> 10L, 5L -> 5L, 9L -> 5L, 12L -> 5L)
    assert(viaDriver == expected)
    assert(viaDistributed == expected)
  }

  test("IVF: every vector lands in exactly one bucket; probes find real neighbors") {
    val embs = Similarity.embeddings(spark, sf)
    val assigned = Similarity.ivfAssign(embs, k = 8)
    assert(assigned.count() == embs.count())
    assert(assigned.groupBy($"vec_id").count().filter($"count" > 1).count() == 0)
    val ivf = Similarity.annIvfTopK(embs, Seq(0L, 1L), k = 5)
      .select($"query_id", $"neighbor_id").as[(Long, Long)].collect()
    assert(ivf.nonEmpty && ivf.forall { case (q, n) => q != n })
  }

  test("semDedup: dropped vectors have a kept smaller-id near-copy in the SAME cluster") {
    val embs = Similarity.embeddings(spark, sf)
    val res = Similarity.semDedup(embs, k = 8, threshold = 0.9)
      .as[(Long, Long, Boolean)].collect()
    assert(res.length == embs.count(), "one verdict per vector")
    val cluster = res.map(r => r._1 -> r._2).toMap
    // naive reference: all same-cluster pairs with cos >= threshold
    val nearPairs = Similarity.cosineNearDupPairs(
        embs.withColumn("label", lit(1)), threshold = 0.9)
      .select($"vec_a", $"vec_b").as[(Long, Long)].collect()
      .filter { case (a, b) => cluster(a) == cluster(b) }
    val expectedDropped = nearPairs.map(_._2).toSet // b is the larger id
    val dropped = res.filter(!_._3).map(_._1).toSet
    assert(dropped == expectedDropped,
      s"drop set mismatch: extra=${dropped -- expectedDropped} missing=${expectedDropped -- dropped}")
    // the smallest id can never drop: it has no smaller-id partner
    assert(!dropped.contains(res.map(_._1).min))
  }

  test("exactSubstringDupPairs ≡ naive shared-window count; k bounds respected") {
    val d = spark.createDataFrame(Seq(
      (1L, "a b c d e f"),     // shares the 4-window "b c d e" with 2
      (2L, "x b c d e y"),
      (3L, "a b c d e f"),     // exact copy of 1 — shares all 3 windows
      (4L, "p q r"),           // too short for any 4-window
      (5L, "b c d e b c d e")  // repeats a window internally: counts once
    )).toDF("doc_id", "text")
    val got = TextDedup.exactSubstringDupPairs(d, k = 4)
      .as[(Long, Long, Long)].collect().toSet
    assert(got == Set((1L, 2L, 1L), (1L, 3L, 3L), (2L, 3L, 1L),
      (1L, 5L, 1L), (2L, 5L, 1L), (3L, 5L, 1L)),
      s"got $got")
  }

  test("containmentPairs: asymmetric — quoted subset scores ~1 forward, low backward") {
    val quoted = "alpha beta gamma delta epsilon zeta"
    val host = quoted + " " + (1 to 30).map(i => s"filler$i word$i").mkString(" ")
    val d = spark.createDataFrame(Seq(
      (1L, quoted),               // fully contained in 2
      (2L, host),
      (3L, "unrelated text entirely different content here"))).toDF("doc_id", "text")
    val got = TextDedup.containmentPairs(d, threshold = 0.8)
      .select($"doc_a", $"doc_b", $"containment").as[(Long, Long, Double)].collect()
    // 1→2 clears the bar (every 3-shingle of 1 appears in 2); 2→1 must
    // not (2's shingle set is far larger); 3 pairs with nothing
    assert(got.map(r => (r._1, r._2)).toSet == Set((1L, 2L)), s"got ${got.toSeq}")
    assert(got.head._3 == 1.0, "full quote ⇒ containment exactly 1")
    // naive cross-check of the directed definition on all pairs
    val shingleSets = d.select($"doc_id",
        graft.functions.TextFunctions.shingleHashes($"text", 3).as("h"))
      .as[(Long, Seq[Long])].collect().toMap
    for ((a, ha) <- shingleSets; (b, hb) <- shingleSets if a != b) {
      val c = (ha.toSet intersect hb.toSet).size.toDouble / ha.size
      val listed = got.exists(r => r._1 == a && r._2 == b)
      assert(listed == (c >= 0.8), s"pair $a->$b naive=$c listed=$listed")
    }
  }

  private lazy val tinyVocabCorpus: Seq[(Long, String)] = {
    import org.scalacheck.{Gen, rng}
    // tiny vocabulary so windows genuinely collide across documents
    val word = Gen.oneOf("aa", "bb", "cc", "dd")
    val doc = Gen.choose(0, 12).flatMap(n => Gen.listOfN(n, word).map(_.mkString(" ")))
    Gen.listOfN(30, doc)
      .pureApply(Gen.Parameters.default, rng.Seed(4242L))
      .zipWithIndex.map { case (t, i) => (i.toLong, t) }
  }

  test("property: containmentPairs ≡ naive directed containment (seeded corpora)") {
    val corpus = tinyVocabCorpus
    for (threshold <- Seq(0.3, 0.8)) {
      val got = TextDedup.containmentPairs(corpus.toDF("doc_id", "text"), threshold)
        .select($"doc_a", $"doc_b", $"n_shared").as[(Long, Long, Long)].collect().toSet
      val sets = corpus.toDF("doc_id", "text")
        .select($"doc_id", graft.functions.TextFunctions.shingleHashes($"text", 3).as("h"))
        .as[(Long, Seq[Long])].collect().toMap
      val naive = (for {
        (a, ha) <- sets.toSeq; (b, hb) <- sets.toSeq if a != b && ha.nonEmpty
        shared = (ha.toSet intersect hb.toSet).size
        if shared > 0 && shared.toDouble / ha.size >= threshold
      } yield (a, b, shared.toLong)).toSet
      assert(got == naive,
        s"t=$threshold: extra=${got -- naive} missing=${naive -- got}")
    }
  }

  test("property: exactSubstringDupPairs ≡ naive sliding-window intersection (seeded corpora)") {
    val corpus = tinyVocabCorpus
    for (k <- Seq(2, 3, 5)) {
      val got = TextDedup.exactSubstringDupPairs(corpus.toDF("doc_id", "text"), k)
        .as[(Long, Long, Long)].collect().toSet
      val windows = corpus.map { case (id, t) =>
        id -> t.split("\\s+").filter(_.nonEmpty).sliding(k).filter(_.length == k)
          .map(_.mkString(" ")).toSet
      }.toMap
      val naive = (for {
        (a, wa) <- windows; (b, wb) <- windows if a < b
        shared = (wa intersect wb).size if shared > 0
      } yield (a, b, shared.toLong)).toSet
      assert(got == naive, s"k=$k: extra=${got -- naive} missing=${naive -- got}")
    }
  }

  test("property: maxDf cap — non-binding cap ≡ uncapped; binding cap is a monotone lower bound") {
    val d = tinyVocabCorpus.toDF("doc_id", "text")
    // a finite cap larger than any df must take the anti-join path yet
    // change nothing (this is NOT the maxDf=∞ shortcut branch)
    val uncapped = TextDedup.containmentPairs(d, threshold = 0.3)
      .select($"doc_a", $"doc_b", $"n_shared").as[(Long, Long, Long)].collect().toSet
    val nonBinding = TextDedup.containmentPairs(d, threshold = 0.3, maxDf = 1000000L)
      .select($"doc_a", $"doc_b", $"n_shared").as[(Long, Long, Long)].collect().toSet
    assert(nonBinding == uncapped)
    // a binding cap: pairs can only lose shared shingles, never gain, and
    // no pair can appear that the uncapped run did not list at threshold 0
    val capped = TextDedup.containmentPairs(d, threshold = 0.3, maxDf = 3L)
      .select($"doc_a", $"doc_b", $"n_shared").as[(Long, Long, Long)].collect()
    val uncappedAll = TextDedup.containmentPairs(d, threshold = 0.0)
      .select($"doc_a", $"doc_b", $"n_shared").as[(Long, Long, Long)].collect()
      .map(r => (r._1, r._2) -> r._3).toMap
    assert(capped.nonEmpty, "cap chosen to bind on the tiny-vocab corpus")
    capped.foreach { case (a, b, n) =>
      assert(uncappedAll.contains((a, b)) && n <= uncappedAll((a, b)),
        s"capped pair $a->$b n=$n vs uncapped ${uncappedAll.get((a, b))}")
    }
    // the naive mirror of the capped semantics agrees exactly
    val sets = d.select($"doc_id", graft.functions.TextFunctions.shingleHashes($"text", 3).as("h"))
      .as[(Long, Seq[Long])].collect().toMap
    val df = sets.values.flatten.groupBy(identity).map { case (h, v) => h -> v.size }
    val keep = df.filter(_._2 <= 3).keySet
    val naive = (for {
      (a, ha) <- sets.toSeq; (b, hb) <- sets.toSeq if a != b && ha.nonEmpty
      shared = ((ha.toSet intersect hb.toSet) intersect keep).size
      if shared > 0 && shared.toDouble / ha.size >= 0.3
    } yield (a, b, shared.toLong)).toSet
    assert(capped.toSet == naive,
      s"extra=${capped.toSet -- naive} missing=${naive -- capped.toSet}")
  }

  test("property: exactSubstringDupPairs hash-only shuffle ≡ direct path (with and without cap)") {
    val d = tinyVocabCorpus.toDF("doc_id", "text")
    for (k <- Seq(2, 3, 5); maxDf <- Seq(Long.MaxValue, 4L)) {
      val direct = TextDedup.exactSubstringDupPairs(d, k, maxDf)
        .as[(Long, Long, Long)].collect().toSet
      val hashOnly = TextDedup.exactSubstringDupPairs(d, k, maxDf, hashOnlyShuffle = true)
        .as[(Long, Long, Long)].collect().toSet
      assert(hashOnly == direct,
        s"k=$k maxDf=$maxDf: extra=${hashOnly -- direct} missing=${direct -- hashOnly}")
    }
  }

  test("distributed clusters: label shortcutting converges on a 200-edge path in O(log d) rounds") {
    // a duplicate CHAIN is the worst case for plain min-label propagation
    // (O(diameter) rounds — 200 here, past the default iteration cap);
    // path-halving must close it in ~8 rounds
    val chain = (0L until 200L).map(i => (i, i + 1)).toDF("doc_a", "doc_b")
    val got = TextDedup.dupClusters(chain, maxIters = 12, driverThreshold = 0L)
      .as[(Long, Long)].collect()
    assert(got.length == 201 && got.forall(_._2 == 0L),
      s"bad labels: ${got.filter(_._2 != 0L).take(5).toSeq}")
  }

  test("semDedup: targetClusterSize scales k — identical to passing k_eff explicitly") {
    val embs = Similarity.embeddings(spark, sf)
    val n = embs.count()
    val target = 10L
    val kEff = math.max(2L, (n + target - 1) / target).toInt
    val scaled = Similarity.semDedup(embs, k = 2, threshold = 0.9, targetClusterSize = target)
      .as[(Long, Long, Boolean)].collect().toSet
    val explicit = Similarity.semDedup(embs, k = kEff, threshold = 0.9)
      .as[(Long, Long, Boolean)].collect().toSet
    assert(kEff > 2, "target chosen so scaling actually raises k")
    assert(scaled == explicit)
  }

  test("semDedup: sign-LSH sub-buckets bound per-key candidates on a skewed corpus; keep is a superset") {
    // a corpus k-means CANNOT split (k=2 over spread vectors): without
    // sub-buckets one join key holds O(n) vectors -> O(n²) pairs
    val rnd = new scala.util.Random(7L)
    val skewed = spark.createDataFrame(
      (0L until 120L).map(i => (i, Array.fill(16)(rnd.nextGaussian().toFloat))))
      .toDF("vec_id", "embedding")
    val full = Similarity.semDedup(skewed, k = 2, threshold = 0.95)
      .filter($"keep").select($"vec_id").as[Long].collect().toSet
    val sub = Similarity.semDedup(skewed, k = 2, threshold = 0.95, subPlanes = 4)
      .filter($"keep").select($"vec_id").as[Long].collect().toSet
    // one-sided error: sub-bucketing can only MISS near-copies, so every
    // vector the exact operator keeps stays kept
    assert(full.subsetOf(sub), s"lost keeps: ${full -- sub}")
    // the join-key histogram: sub-bucketing splits the dominant cluster
    val assigned = Similarity.ivfAssign(skewed, k = 2)
      .withColumn("subb", Similarity.lshBucket($"v", 4))
    val maxCluster = assigned.groupBy($"bucket").count()
      .agg(max($"count")).as[Long].head()
    val maxSub = assigned.groupBy($"bucket", $"subb").count()
      .agg(max($"count")).as[Long].head()
    assert(maxCluster > 50, "skew corpus: the dominant cluster is O(n)")
    assert(maxSub * 2 <= maxCluster,
      s"sub-bucketing must split the dominant cluster: maxSub=$maxSub maxCluster=$maxCluster")
  }

  /** Local mirror of the quantized-integer k-means assignment: quantize
    * (floor ×2²⁰), argmin integer L2 to the codebook, ties to the smaller
    * centroid id. Returns (cluster, distance-to-own-centroid) per vector.
    */
  private def localAssign(vecs: Map[Long, Seq[Double]],
      cb: Seq[(Long, Seq[Long])]): Map[Long, (Long, Long)] =
    vecs.map { case (id, v) =>
      val qv = v.map(x => math.floor(x * 1048576.0).toLong)
      val scored = cb.map { case (cid, cqv) =>
        (cid, qv.zip(cqv).map { case (a, b) => (a - b) * (a - b) }.sum)
      }
      val (cid, dc) = scored.minBy { case (cid, d) => (d, cid) }
      id -> (cid, dc)
    }

  private def localCos(a: Seq[Double], b: Seq[Double]): Double = {
    val dot = a.zip(b).map { case (x, y) => x * y }.sum
    dot / (math.sqrt(a.map(x => x * x).sum) * math.sqrt(b.map(x => x * x).sum))
  }

  test("semDedup keepFarthest ≡ naive rule: dropped iff a beating near-copy exists in the cluster") {
    val embs = Similarity.embeddings(spark, sf)
    val vecs = embs.select($"vec_id", Similarity.asDouble($"embedding").as("v"))
      .as[(Long, Seq[Double])].collect().toMap
    val assign = localAssign(vecs, Similarity.kmeansCodebookCents(embs, 8))
    // 0.35, not 0.9: the sf0.001 corpus is near-random unit vectors with
    // no 0.9-cosine pairs — a threshold that never fires tests nothing
    val threshold = 0.35
    val expectedDropped = vecs.keys.filter { a =>
      val (ca, dca) = assign(a)
      vecs.keys.exists { b =>
        val (cb2, dcb) = assign(b)
        b != a && cb2 == ca &&
          (dcb > dca || (dcb == dca && b < a)) &&
          localCos(vecs(a), vecs(b)) >= threshold
      }
    }.toSet
    val got = Similarity.semDedup(embs, k = 8, threshold = threshold, keepFarthest = true)
      .as[(Long, Long, Boolean)].collect()
    assert(got.map(_._1).toSet == vecs.keySet)
    val dropped = got.filter(!_._3).map(_._1).toSet
    assert(dropped == expectedDropped,
      s"extra=${dropped -- expectedDropped} missing=${expectedDropped -- dropped}")
    assert(expectedDropped.nonEmpty, "corpus chosen so the policy actually fires")
    // the two policies must agree on WHICH pairs are near-copies, so the
    // number of clusters and total rows agree even when drop sets differ
    val lowestId = Similarity.semDedup(embs, k = 8, threshold = threshold)
      .as[(Long, Long, Boolean)].collect()
    assert(lowestId.map(r => r._1 -> r._2).toMap == got.map(r => r._1 -> r._2).toMap)
  }

  test("knnGraph ≡ naive per-bucket top-k (cosine, id ties)") {
    val embs = Similarity.embeddings(spark, sf)
    val vecs = embs.select($"vec_id", Similarity.asDouble($"embedding").as("v"))
      .as[(Long, Seq[Double])].collect().toMap
    val assign = localAssign(vecs, Similarity.kmeansCodebookCents(embs, 8))
    val naive = vecs.keys.flatMap { a =>
      vecs.keys.toSeq
        .filter(b => b != a && assign(b)._1 == assign(a)._1)
        .map(b => (b, localCos(vecs(a), vecs(b))))
        .sortBy { case (b, c) => (-c, b) }
        .take(3).zipWithIndex
        .map { case ((b, _), i) => (a, b, i + 1) }
    }.toSet
    val got = Similarity.knnGraph(embs, k = 3, centroids = 8)
      .select($"vec_id", $"neighbor_id", $"rank").as[(Long, Long, Int)].collect().toSet
    assert(got == naive,
      s"extra=${(got -- naive).take(5)} missing=${(naive -- got).take(5)}")
  }

  test("knnGraph subPlanes ≡ naive Hamming-1 multi-probe top-k; exhaustive edges survive") {
    val embs = Similarity.embeddings(spark, sf)
    val subPlanes = 4
    // sub-bucket assignment pulled through the SAME expressions the
    // operator uses; the candidate rule is then mirrored in plain Scala
    val assigned = Similarity.ivfAssign(embs, k = 8)
      .withColumn("subb", Similarity.lshBucket($"v", subPlanes))
      .select($"vec_id", $"v", $"bucket", $"subb")
      .as[(Long, Seq[Double], Long, Long)].collect()
    val byId = assigned.map(r => r._1 -> r).toMap
    val naive = assigned.flatMap { case (a, va, ba, sa) =>
      assigned.toSeq
        .filter { case (b, _, bb, sb) =>
          b != a && bb == ba && java.lang.Long.bitCount(sa ^ sb) <= 1
        }
        .map { case (b, vb, _, _) => (b, localCos(va, vb)) }
        .sortBy { case (b, c) => (-c, b) }
        .take(3).zipWithIndex
        .map { case ((b, _), i) => (a, b, i + 1) }
    }.toSet
    val got = Similarity.knnGraph(embs, k = 3, centroids = 8, subPlanes = subPlanes)
      .select($"vec_id", $"neighbor_id", $"rank").as[(Long, Long, Int)].collect().toSet
    assert(got == naive,
      s"extra=${(got -- naive).take(5)} missing=${(naive -- got).take(5)}")
    assert(byId.nonEmpty && naive.nonEmpty)
  }

  test("knnGraph: multi-probe sub-buckets bound per-key candidates on a skewed corpus") {
    // k-means CANNOT split this corpus (k=2 over spread vectors): without
    // sub-buckets one join key holds O(n) vectors → O(n²) candidate pairs
    val rnd = new scala.util.Random(7L)
    val skewed = spark.createDataFrame(
      (0L until 120L).map(i => (i, Array.fill(16)(rnd.nextGaussian().toFloat))))
      .toDF("vec_id", "embedding")
    val subPlanes = 4
    val candFull = Similarity.knnGraphCandidates(skewed, centroids = 2, subPlanes = 0).count()
    val candSub = Similarity.knnGraphCandidates(skewed, centroids = 2, subPlanes = subPlanes).count()
    // the probe union touches (subPlanes+1)/2^subPlanes ≈ 5/16 of a
    // uniformly split bucket; require at least a 2× cut to leave slack
    // for non-uniform sub-bucket sizes
    // 120 vectors over ≤2 buckets: the ordered-pair space is Σ|b|²−|b|,
    // ≥ 5000 whenever one bucket holds ≥ 73 of the 120 — clearly O(n²)
    assert(candFull > 5000L, s"skew corpus: full pair space is O(n²), got $candFull")
    assert(candSub * 2 <= candFull,
      s"sub-bucketing must cut the candidate space: $candSub vs $candFull")
    // per-join-key bound: every (bucket, subb) key's pair contribution is
    // |probe-side rows| × |build-side rows| ≤ (subPlanes+1)·maxSub², and
    // maxSub is a fraction of the hot bucket
    val assigned = Similarity.ivfAssign(skewed, k = 2)
      .withColumn("subb", Similarity.lshBucket($"v", subPlanes))
    val maxBucket = assigned.groupBy($"bucket").count().agg(max($"count")).as[Long].head()
    val maxSub = assigned.groupBy($"bucket", $"subb").count().agg(max($"count")).as[Long].head()
    assert(maxBucket > 50, "skew corpus: the dominant cluster is O(n)")
    assert(maxSub * 2 <= maxBucket,
      s"sub-bucketing must split the hot bucket: maxSub=$maxSub maxBucket=$maxBucket")
  }

  test("minhash recall: measured per-lang recall is in [0,1] and counts are consistent") {
    val recall = M5Queries.queries("q_minhash_recall")(spark, sf)
      .as[(String, Long, Long, Double)].collect()
    assert(recall.nonEmpty)
    recall.foreach { case (lang, nExact, nFound, r) =>
      assert(nExact >= nFound && nFound >= 0, s"$lang: $nFound/$nExact")
      assert(r >= 0.0 && r <= 1.0 && math.abs(r - nFound.toDouble / nExact) < 1e-12)
    }
  }

  test("docLineDedup: within-page first occurrence survives, short lines exempt, cross-doc repeats untouched") {
    val d = Seq(
      (1L, "repeated navigation menu line\nunique body one\nrepeated navigation menu line\nok\nok\nrepeated navigation menu line"),
      (2L, "repeated navigation menu line\nunique body two"),
      (3L, ""))
      .toDF("doc_id", "text")
    val got = TextDedup.docLineDedup(d, minLineChars = 10)
      .orderBy($"doc_id").as[(Long, String, Long, Long)].collect()
    // doc 1: nav line keeps only its first in-page occurrence; the
    // short "ok" is exempt and kept twice
    assert(got(0) == ((1L, "repeated navigation menu line\nunique body one\nok\nok", 6L, 4L)))
    // doc 2 keeps its own first occurrence — the operator is page-local
    // (doc 1 having the line does NOT strip it from doc 2, unlike
    // corpus-level lineDedup)
    assert(got(1) == ((2L, "repeated navigation menu line\nunique body two", 2L, 2L)))
    // empty text splits to one empty (short-exempt) line
    assert(got(2) == ((3L, "", 1L, 1L)))
    // narrow projection: partitioning-invariant by construction, pin it
    val rep = TextDedup.docLineDedup(d.repartition(5), minLineChars = 10)
      .orderBy($"doc_id").as[(Long, String, Long, Long)].collect()
    assert(got.toSeq == rep.toSeq)
  }

  test("lineDedup: first occurrence survives, short lines exempt, boilerplate dropped everywhere") {
    val d = Seq(
      (1L, "common header line here\nunique body of document one\nok"),
      (2L, "common header line here\nunique body of document two\nok"),
      (3L, "common header line here\nunique body of document three\nok"))
      .toDF("doc_id", "text")
    // boilerplateDf=2 < df(header)=3: the header vanishes from EVERY doc,
    // including the first; "ok" (< 10 chars) is exempt and kept everywhere
    val capped = TextDedup.lineDedup(d, minLineChars = 10, boilerplateDf = 2)
      .orderBy($"doc_id").as[(Long, String, Long, Long)].collect()
    assert(capped(0) == ((1L, "unique body of document one\nok", 3L, 2L)))
    assert(capped(1) == ((2L, "unique body of document two\nok", 3L, 2L)))
    assert(capped(2) == ((3L, "unique body of document three\nok", 3L, 2L)))
    // without the cap, keep-first applies: doc 1 keeps the header, 2/3 lose it
    val keepFirst = TextDedup.lineDedup(d, minLineChars = 10)
      .orderBy($"doc_id").as[(Long, String, Long, Long)].collect()
    assert(keepFirst(0) == ((1L, "common header line here\nunique body of document one\nok", 3L, 3L)))
    assert(keepFirst(1) == ((2L, "unique body of document two\nok", 3L, 2L)))
    assert(keepFirst(2) == ((3L, "unique body of document three\nok", 3L, 2L)))
    // a doc losing every line reassembles to the empty string
    val all = Seq((1L, "exactly the same long line"), (2L, "exactly the same long line"))
      .toDF("doc_id", "text")
    val gone = TextDedup.lineDedup(all, minLineChars = 10, boilerplateDf = 1)
      .orderBy($"doc_id").as[(Long, String, Long, Long)].collect()
    assert(gone(0) == ((1L, "", 1L, 0L)) && gone(1) == ((2L, "", 1L, 0L)))
  }

  test("property: lineDedup ≡ naive corpus-wide keep-first (seeded multi-line corpora)") {
    import org.scalacheck.{Gen, rng}
    // tiny line vocabulary so lines genuinely repeat across documents;
    // mixed lengths so the short-line exemption fires
    val lineGen = Gen.oneOf(
      "the quick brown fox jumps", "all rights reserved today",
      "subscribe now", "ok", "", "unique snowflake phrase appears")
    val docGen = Gen.choose(0, 6).flatMap(n => Gen.listOfN(n, lineGen).map(_.mkString("\n")))
    val corpus = Gen.listOfN(25, docGen)
      .pureApply(Gen.Parameters.default, rng.Seed(1717L))
      .zipWithIndex.map { case (t, i) => (i.toLong, t) }
    for ((minLen, bdf) <- Seq((10, Long.MaxValue), (10, 3L), (1, 2L))) {
      val got = TextDedup.lineDedup(corpus.toDF("doc_id", "text"), minLen, bdf)
        .as[(Long, String, Long, Long)].collect()
        .map(r => r._1 -> (r._2, r._3, r._4)).toMap
      // naive: first (doc_id, pos) per line; df over distinct docs
      val lines = corpus.flatMap { case (id, t) =>
        t.split("\n", -1).zipWithIndex.map { case (l, p) => (id, p, l) }
      }
      val first = lines.groupBy(_._3).map { case (l, occ) =>
        l -> occ.map(o => (o._1, o._2)).min
      }
      val df = lines.groupBy(_._3).map { case (l, occ) => l -> occ.map(_._1).distinct.size }
      val naive = corpus.map { case (id, t) =>
        val ls = t.split("\n", -1).zipWithIndex
        val kept = ls.filter { case (l, p) =>
          l.length < minLen || (df(l) <= bdf && first(l) == ((id, p)))
        }
        id -> ((kept.map(_._1).mkString("\n"), ls.length.toLong, kept.length.toLong))
      }.toMap
      assert(got == naive, s"minLen=$minLen bdf=$bdf: " +
        s"diff=${(got.toSet -- naive.toSet).take(3)} / ${(naive.toSet -- got.toSet).take(3)}")
    }
  }

  test("property: lineDedup hash-only shuffle ≡ direct path, incl. forced full/partial hash collisions") {
    import org.scalacheck.{Gen, rng}
    val lineGen = Gen.oneOf(
      "the quick brown fox jumps", "all rights reserved today",
      "subscribe now", "ok", "", "unique snowflake phrase appears")
    val docGen = Gen.choose(0, 6).flatMap(n => Gen.listOfN(n, lineGen).map(_.mkString("\n")))
    val corpus = Gen.listOfN(25, docGen)
      .pureApply(Gen.Parameters.default, rng.Seed(1717L))
      .zipWithIndex.map { case (t, i) => (i.toLong, t) }
      .toDF("doc_id", "text")
    // xxhash64 (the production hash), a 4-bucket hash (partial collisions:
    // the clean path AND the string-keyed diversion both run), and a
    // constant hash (EVERY line collides: the diversion carries it all)
    val hashes: Seq[(String, org.apache.spark.sql.Column => org.apache.spark.sql.Column)] = Seq(
      "xxhash64" -> (c => xxhash64(c)),
      "mod4" -> (c => pmod(xxhash64(c), lit(4L))),
      "const" -> (_ => lit(0L)))
    for ((minLen, bdf) <- Seq((10, Long.MaxValue), (10, 3L), (1, 2L))) {
      val direct = TextDedup.lineDedup(corpus, minLen, bdf)
        .as[(Long, String, Long, Long)].collect().toSet
      hashes.foreach { case (hname, h) =>
        val hashed = TextDedup.lineDedupKeyed(corpus, minLen, bdf,
          hashOnlyShuffle = true, lineHash = h)
          .as[(Long, String, Long, Long)].collect().toSet
        assert(hashed == direct, s"minLen=$minLen bdf=$bdf hash=$hname: " +
          s"extra=${(hashed -- direct).take(3)} missing=${(direct -- hashed).take(3)}")
      }
    }
  }

  test("multimodal chunks reassemble to the original bytes") {
    val media = spark.createDataFrame(Seq(
      (1L, "0123456789abcdefXYZ"), (2L, ""), (3L, "short"))).toDF("media_id", "s")
      .select($"media_id", encode($"s", "UTF-8").as("media"))
    val back = Multimodal.sampleChunks(media, chunkSize = 16)
      .groupBy($"media_id")
      .agg(concat_ws("", collect_list(decode($"chunk", "UTF-8"))).as("joined"))
      .as[(Long, String)].collect().toMap
    assert(back(1L) == "0123456789abcdefXYZ")
    assert(back.getOrElse(2L, "") == "")
    assert(back(3L) == "short")
  }

  test("multimodal features: deterministic per-item embeddings matching the stub-hash recipe") {
    val media = spark.createDataFrame(Seq(
      (1L, Some("{\"k\": 1}")), (2L, Some("")), (3L, None))).toDF("media_id", "s")
      .select($"media_id", encode($"s", "UTF-8").as("media"))
    val got = Multimodal.extractFeatures(media, dims = 4)
      .as[(Long, Seq[Double])].collect().toMap
    val P = 1000000007L
    def expected(text: String): Seq[Double] = {
      val h = if (text.isEmpty) 0L else graft.functions.RollingHash.compute(text)
      Seq.tabulate(4)(d => ((h + d + 1) * 2654435761L % P).toDouble / P - 0.5)
    }
    assert(got(1L) == expected("{\"k\": 1}"))
    assert(got(2L) == expected("") && got(3L) == expected(""))
    assert(got.values.forall(_.forall(x => x > -0.5 && x < 0.5)))
    // the features plug straight into the Similarity operators
    val feats = Multimodal.extractFeatures(media, dims = 4)
      .select($"media_id".as("vec_id"), $"feature".as("embedding"))
    val tk = Similarity.bruteForceTopK(feats, Seq(1L), k = 2)
    assert(tk.count() == 2)
  }

  test("multimodal metadata is deterministic and total (empty + null safe)") {
    val media = spark.createDataFrame(Seq(
      (1L, Some("{\"k\": 1}")), (2L, Some("")), (3L, None))).toDF("media_id", "s")
      .select($"media_id", encode($"s", "UTF-8").as("media"))
    val m = Multimodal.extractMeta(media)
      .select($"media_id", $"format", $"n_bytes").as[(Long, String, Int)]
      .collect().map { case (k, f, n) => (k, (f, n)) }.toMap
    assert(m(1L)._1 == "json-ish" && m(1L)._2 == 8)
    assert(m(2L) == ("empty", 0))
    assert(m(3L) == ("empty", 0))
  }

  test("rolling hash uses true code points (CJK does not collapse)") {
    import graft.functions.RollingHash
    // distinct CJK strings must hash differently (ascii() would map all
    // non-ASCII chars to U+FFFD and collapse them)
    assert(RollingHash.compute("的是") != RollingHash.compute("在和"))
    // exact oracle arithmetic: fold(acc*31 + codepoint) mod P
    def expected(s: String): Long =
      s.codePoints.toArray.foldLeft(0L)((acc, c) => (acc * 31 + c) % 1000000007L)
    for (s <- Seq("abc", "héllo", "的是了", "mixed 文本 text"))
      assert(RollingHash.compute(s) == expected(s), s)
    // and the Column API agrees end-to-end
    val got = spark.range(1).select(
      RollingHash.rolling_hash(lit("的是")).as("h")).head().getLong(0)
    assert(got == expected("的是"))
  }

  test("sign_lsh_bucket expression ≡ HOF per-plane folds (real embeddings + edges)") {
    val embs = Similarity.embeddings(spark, sf)
      .select($"vec_id", Similarity.asDouble($"embedding").as("v"))
    for (planes <- Seq(1, 8, 16)) {
      val fused = embs.select($"vec_id",
        Similarity.lshBucket($"v", planes).as("b")).as[(Long, Long)].collect().toMap
      val hof = embs.select($"vec_id",
        Similarity.lshBucketHof($"v", planes).as("b")).as[(Long, Long)].collect().toMap
      assert(fused == hof, s"planes=$planes")
    }
    // edges: empty vector -> bucket 0; null vector -> null
    val edge = spark.createDataFrame(Seq(
        (1L, Some(Seq(0.0, 0.0)), false),
        (2L, Some(Seq.empty[Double]), false),
        (3L, None, true))).toDF("id", "v", "isnull")
      .select($"id", $"v".cast("array<double>").as("v"))
    val got = edge.select($"id", Similarity.lshBucket($"v", 8).as("b"))
      .as[(Long, Option[Long])].collect().toMap
    assert(got(2L) == Some(0L) && got(3L).isEmpty)
  }

  test("LSH buckets adapt to the embedding width (no null-collapse on non-64-dim)") {
    val df = spark.createDataFrame(Seq(
      (1L, Array.fill(32)(0.5f)), (2L, Array.fill(32)(-0.5f)))).toDF("vec_id", "embedding")
    val b = df.select(Similarity.asDouble($"embedding").as("v"))
      .select(graft.operators.Similarity.lshBucket($"v", 8).as("bucket"))
      .as[Long].collect()
    assert(b.forall(_ >= 0))
    assert(b(0) != b(1), "opposite 32-dim vectors must land in different buckets")
  }

  test("text pipeline plans stay narrow until the first aggregation/join") {
    val plan = graft.operators.TextAnalysis.qualityMetrics(docs).queryExecution.executedPlan
    assert(!plan.exists(_.isInstanceOf[org.apache.spark.sql.execution.exchange.Exchange]))
  }

  test("substringDedupRemove: cross-doc copy cut, first occurrence kept; intra-doc repeat collapses") {
    val tiny = Seq(
      (1L, "a b c d e f g h u1 u2"),
      (2L, "x1 x2 a b c d e f g h y1"),
      // 16 tokens = the same 8-token window at pos 0 and pos 8
      (3L, "p q r s t u v w p q r s t u v w"),
      (4L, "short doc")).toDF("doc_id", "text")
    val got = TextDedup.substringDedupRemove(tiny, k = 8)
      .orderBy($"doc_id").as[(Long, Long, Long, String)].collect().toSeq
    assert(got == Seq(
      (1L, 10L, 0L, "a b c d e f g h u1 u2"),
      (2L, 11L, 8L, "x1 x2 y1"),
      (3L, 16L, 8L, "p q r s t u v w"),
      (4L, 2L, 0L, "short doc")))
  }

  test("substringDedupRemove ≡ naive global first-occurrence marking on the corpus") {
    val toks = docs.select($"doc_id", graft.functions.TextFunctions.tokens($"text").as("w"))
      .as[(Long, Seq[String])].collect().toMap
    val k = 8
    // naive: iterate in (doc_id, pos) order, so the first sighting of a
    // window IS its global first occurrence
    val firsts = scala.collection.mutable.Map.empty[String, (Long, Int)]
    for ((d, w) <- toks.toSeq.sortBy(_._1); i <- 0 to w.size - k) {
      val win = w.slice(i, i + k).mkString(" ")
      if (!firsts.contains(win)) firsts(win) = (d, i)
    }
    val want = toks.map { case (d, w) =>
      val rm = (for {
        i <- 0 to w.size - k
        if firsts(w.slice(i, i + k).mkString(" ")) != ((d, i))
        p <- i until i + k
      } yield p).toSet
      val clean = w.zipWithIndex.collect { case (t, i) if !rm(i) => t }.mkString(" ")
      (d, w.size.toLong, rm.size.toLong, clean)
    }.toSeq.sortBy(_._1)
    val got = TextDedup.substringDedupRemove(docs, k = k)
      .orderBy($"doc_id").as[(Long, Long, Long, String)].collect().toSeq
    assert(got == want)
    assert(got.exists(_._3 > 0), "corpus should contain at least one duplicated window")
  }

  test("substringDedupRemoveSa ≡ windowed remover on the corpus; longer-than-k runs excise as one span") {
    // output-identity contract across spellings (shared oracle)
    val k = 8
    val sa = TextDedup.substringDedupRemoveSa(docs, k = k)
      .orderBy($"doc_id").as[(Long, Long, Long, String)].collect().toSeq
    val win = TextDedup.substringDedupRemove(docs, k = k)
      .orderBy($"doc_id").as[(Long, Long, Long, String)].collect().toSeq
    assert(sa == win)
    assert(sa.exists(_._3 > 0))

    // variable-length semantics: a 12-token passage repeated at k = 8
    // carries 5 overlapping duplicated windows whose marks merge into
    // ONE contiguous 12-token cut — not two disjoint 8-token cuts
    val run = (1 to 12).map("r" + _).mkString(" ")
    val tiny = Seq(
      (1L, s"$run a1 a2"),
      (2L, s"b1 b2 $run b3"),
      // truncated-tail guard: docs 3 and 4 end in the same 6-token tail
      // (< k) — shared SHORT tails must not be flagged for removal
      (3L, "c1 c2 c3 t1 t2 t3 t4 t5 t6"),
      (4L, "d1 d2 d3 d4 t1 t2 t3 t4 t5 t6")).toDF("doc_id", "text")
    val got = TextDedup.substringDedupRemoveSa(tiny, k = k)
      .orderBy($"doc_id").as[(Long, Long, Long, String)].collect().toSeq
    assert(got == Seq(
      (1L, 14L, 0L, s"$run a1 a2"),
      (2L, 15L, 12L, "b1 b2 b3"),
      (3L, 9L, 0L, "c1 c2 c3 t1 t2 t3 t4 t5 t6"),
      (4L, 10L, 0L, "d1 d2 d3 d4 t1 t2 t3 t4 t5 t6")))
    val winTiny = TextDedup.substringDedupRemove(tiny, k = k)
      .orderBy($"doc_id").as[(Long, Long, Long, String)].collect().toSeq
    assert(got == winTiny)
  }

  test("substringDedupRemove conservation: clean token count = n_tokens − n_removed, every doc present") {
    val out = TextDedup.substringDedupRemove(docs, k = 8)
      .select($"doc_id", $"n_tokens", $"n_removed",
        size(graft.functions.TextFunctions.tokens($"clean_text")).cast("long").as("n_clean"))
    assert(out.filter($"n_clean" =!= $"n_tokens" - $"n_removed").count() == 0)
    assert(out.count() == docs.count())
  }

  test("corpusDiff: self-diff is all-unchanged; add/remove/mutate classify exactly") {
    val self = graft.operators.TextAnalysis.corpusDiff(docs, docs)
      .select($"status").distinct().as[String].collect().toSeq
    assert(self == Seq("unchanged"))
    val a = Seq((1L, "alpha"), (2L, "beta"), (3L, "gamma")).toDF("doc_id", "text")
    val b = Seq((2L, "beta"), (3L, "gamma prime"), (4L, "delta")).toDF("doc_id", "text")
    val got = graft.operators.TextAnalysis.corpusDiff(a, b)
      .as[(Long, String)].collect().toMap
    assert(got == Map(1L -> "removed", 2L -> "unchanged",
      3L -> "changed", 4L -> "added"))
  }

  test("paragraphDedup: blocks travel as units — keep-first, short-exempt, boilerplate-drop; separators normalize") {
    val footer = "standard footer text\nwith two lines inside"
    val tiny = Seq(
      (1L, s"unique body one alpha beta\n\n$footer\n\nok"),
      (2L, s"unique body two gamma delta\n\n\n$footer"), // 3-newline run = one separator
      (3L, s"every doc banner paragraph\n\nunique body three")).toDF("doc_id", "text")
    val got = TextDedup.paragraphDedup(tiny, minParChars = 10)
      .orderBy($"doc_id").as[(Long, String, Long, Long)].collect().toSeq
    // footer kept only in doc 1 (its two INNER lines travel together);
    // 'ok' short-exempt; banner df 1 here so kept; separators → \n\n
    assert(got == Seq(
      (1L, s"unique body one alpha beta\n\n$footer\n\nok", 3L, 3L),
      (2L, "unique body two gamma delta", 2L, 1L),
      (3L, "every doc banner paragraph\n\nunique body three", 2L, 2L)))
    // line dedup on the same corpus chips the footer line by line —
    // the paragraph unit is the difference in kind
    val lineKept = TextDedup.lineDedup(tiny, minLineChars = 10)
      .filter($"doc_id" === 2).select($"text_dedup").as[String].head()
    assert(!lineKept.contains("standard footer text"))
    // boilerplate paragraphs drop everywhere once df exceeds the cap
    val many = (1L to 9L).map(i => (i, s"unique body $i alpha beta gamma\n\n$footer"))
      .toDF("doc_id", "text")
    val capped = TextDedup.paragraphDedup(many, minParChars = 10, boilerplateDf = 3)
      .as[(Long, String, Long, Long)].collect()
    assert(capped.forall(!_._2.contains("standard footer")))
  }

  test("property: paragraphDedup hash-only ≡ direct path under forced collisions") {
    val footer = "standard footer text\nwith two lines inside"
    val corpus = (1L to 20L).map(i =>
        (i, s"body $i delta\n\n$footer\n\nshared tail ${i % 4} epsilon zeta"))
      .toDF("doc_id", "text")
    for (h <- Seq[org.apache.spark.sql.Column => org.apache.spark.sql.Column](
        c => xxhash64(c), c => pmod(xxhash64(c), lit(2L)), _ => lit(0L))) {
      val direct = TextDedup.paragraphDedup(corpus, minParChars = 10, boilerplateDf = 50)
        .as[(Long, String, Long, Long)].collect().toSet
      val hashed = TextDedup.lineDedupKeyed(corpus, 10, 50L,
          hashOnlyShuffle = true, lineHash = h,
          splitRegex = "\n{2,}", joinSep = "\n\n")
        .as[(Long, String, Long, Long)].collect().toSet
      assert(hashed == direct)
    }
  }

  test("property: substringDedupRemove hash-only ≡ direct path, incl. forced full/partial collisions") {
    import org.scalacheck.{Gen, rng}
    // phrases long enough that windows (k = 4) straddle phrase joints
    val phraseGen = Gen.oneOf(
      "alpha beta gamma delta", "omega psi chi phi",
      "one two three four", "lone word")
    val docGen = Gen.choose(0, 4).flatMap(n => Gen.listOfN(n, phraseGen).map(_.mkString(" ")))
    val corpus = Gen.listOfN(30, docGen)
      .pureApply(Gen.Parameters.default, rng.Seed(4242L))
      .zipWithIndex.map { case (t, i) => (i.toLong, t) }
      .toDF("doc_id", "text")
    val hashes: Seq[(String, org.apache.spark.sql.Column => org.apache.spark.sql.Column)] = Seq(
      "xxhash64" -> (c => xxhash64(c)),
      "mod4" -> (c => pmod(xxhash64(c), lit(4L))),
      "const" -> (_ => lit(0L)))
    for (k <- Seq(4, 8)) {
      val direct = TextDedup.substringDedupRemove(corpus, k)
        .as[(Long, Long, Long, String)].collect().toSet
      hashes.foreach { case (hname, h) =>
        val hashed = TextDedup.substringDedupRemoveKeyed(corpus, k,
          hashOnlyShuffle = true, winHash = h)
          .as[(Long, Long, Long, String)].collect().toSet
        assert(hashed == direct, s"k=$k hash=$hname: " +
          s"extra=${(hashed -- direct).take(3)} missing=${(direct -- hashed).take(3)}")
      }
    }
  }

  test("embeddingShift: counts close per side; self-shift is zero; shares are exact integer ppm") {
    val embs = Similarity.embeddings(spark, sf)
    val n = embs.count()
    val a = embs.filter($"vec_id" * 2 < n)
    val b = embs.filter($"vec_id" * 2 >= n)
    val rep = Similarity.embeddingShift(a, b, k = 8)
      .as[(Long, Long, Long, Long, Long, Long)].collect().toSeq
    assert(rep.map(_._2).sum == a.count() && rep.map(_._3).sum == b.count())
    val totA = rep.map(_._2).sum; val totB = rep.map(_._3).sum
    for ((_, na, nb, ppmA, ppmB, shift) <- rep) {
      assert(ppmA == na * 1000000L / totA && ppmB == nb * 1000000L / totB)
      assert(shift == math.abs(ppmA - ppmB))
    }
    // identical snapshots shift nowhere
    val self = Similarity.embeddingShift(a, a, k = 8)
      .select($"ppm_shift").as[Long].collect()
    assert(self.forall(_ == 0L))
  }

  test("clusterQuota: bounded aggregation ≡ window keep-farthest ranking; caps bind, small clusters survive") {
    val embs = Similarity.embeddings(spark, sf)
    val got = Similarity.clusterQuota(embs, maxPerCluster = 40, k = 8)
      .as[(Long, Long, Int)].collect().toSeq.sortBy(r => (r._1, r._3))
    // window twin from the cluster sizes: quota rows per cluster =
    // min(40, cluster size) — derived independently from clusterBalance
    val sizes = Similarity.clusterBalance(embs, k = 8)
      .groupBy($"cluster").agg(sum($"n_vectors").as("n"))
      .as[(Long, Long)].collect().toMap
    val perCluster = got.groupBy(_._1).view.mapValues(_.size).toMap
    for ((c, n) <- sizes)
      assert(perCluster.getOrElse(c, 0) == math.min(40L, n),
        s"cluster $c: quota rows ${perCluster.getOrElse(c, 0)} vs size $n")
    // ranks are dense 1..kept within each cluster
    got.groupBy(_._1).values.foreach { rows =>
      assert(rows.map(_._3).sorted == (1 to rows.size).toList)
    }
    assert(got.size < embs.count(), "the cap should bind somewhere at this SF")
    // a tiny quota keeps exactly maxPerCluster everywhere (all clusters > 2)
    val tiny = Similarity.clusterQuota(embs, maxPerCluster = 2, k = 8)
    assert(tiny.count() == 16L)
  }

  test("clusterBalance: cells partition the corpus; ppm shares are exact cluster fractions") {
    val embs = Similarity.embeddings(spark, sf)
    val cells = Similarity.clusterBalance(embs, k = 8)
      .as[(Long, Int, Long, Long)].collect().toSeq
    assert(cells.map(_._3).sum == embs.count(), "cells partition the corpus")
    // per-cluster: counts agree with kmeansQuality, shares are n*1e6 div total
    val quality = Similarity.kmeansQuality(embs, k = 8)
      .select($"cluster", $"n_vectors").as[(Long, Long)].collect().toMap
    val byCluster = cells.groupBy(_._1)
    for ((c, rows) <- byCluster) {
      val total = rows.map(_._3).sum
      assert(total == quality(c), s"cluster $c count drift vs kmeansQuality")
      for ((_, _, n, ppm) <- rows) assert(ppm == n * 1000000L / total)
      // integer floor: shares sum to within |labels| ulps of 1e6
      val s = rows.map(_._4).sum
      assert(s <= 1000000L && s > 1000000L - rows.size)
    }
  }
  test("kCenterGreedy ≡ the naive driver-side farthest-first traversal; radius curve non-increasing is NOT required but cover is exact") {
    val embs = Similarity.embeddings(spark, sf).limit(60).cache()
    val got = Similarity.kCenterGreedy(embs, k = 6)
      .as[(Int, Long, Option[Double])].collect().toSeq.sortBy(_._1)
    // naive reference: collect all vectors, run greedy by hand
    val vs = embs.select($"vec_id", $"embedding").collect()
      .map(r => r.getLong(0) -> r.getSeq[Float](1).map(_.toDouble).toArray)
      .sortBy(_._1)
    def cos(a: Array[Double], b: Array[Double]): Double = {
      var d = 0.0; var na = 0.0; var nb = 0.0
      var i = 0
      while (i < a.length) { d += a(i) * b(i); na += a(i) * a(i); nb += b(i) * b(i); i += 1 }
      d / (math.sqrt(na) * math.sqrt(nb))
    }
    var chosen = Seq(vs.head._1)
    var cover = vs.filterNot(_._1 == vs.head._1)
      .map { case (id, v) => id -> cos(v, vs.head._2) }.toMap
    val vmap = vs.toMap
    var expect = Seq((1, vs.head._1, Option.empty[Double]))
    for (r <- 2 to 6) {
      val (nid, ncov) = cover.toSeq.minBy { case (id, c) => (c, id) }
      expect :+= ((r, nid, Some(ncov)))
      chosen :+= nid
      cover = (cover - nid).map { case (id, c) =>
        id -> math.max(c, cos(vmap(id), vmap(nid))) }
    }
    assert(got.map(x => (x._1, x._2)) == expect.map(x => (x._1, x._2)),
      s"selection order: got ${got.map(_._2)} expected ${expect.map(_._2)}")
    // covers match to exact double equality except fold-order epsilon:
    // the operator folds left-to-right like the oracle; the naive loop
    // here is the same order, so equality is exact
    got.zip(expect).foreach { case ((_, _, g), (_, _, e)) =>
      assert(g == e, s"cover mismatch: $g vs $e")
    }
  }
}
