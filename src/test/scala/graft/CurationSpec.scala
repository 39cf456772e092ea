package graft

import graft.operators.{Curation, PrefixSum, TextDedup}
import graft.functions.TextFunctions
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Corpus-curation operators ([[graft.operators.Curation]]) and the
  * distributed running sum that packing rides on ([[PrefixSum]]).
  */
class CurationSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  val sf = "/root/testdata/sf0.001"
  lazy val docs = TextDedup.documents(spark, sf).cache()

  test("mixtureBudget: budgets bind per source with one-doc overspend; selection is seeded-deterministic and auditable") {
    import graft.operators.Sampling
    def words(n: Int) = Seq.fill(n)("w").mkString(" ")
    // source A: 4 docs x 10 tokens; source B: 2 docs x 30 tokens
    val d = Seq(
      (1L, "A", words(10)), (2L, "A", words(10)), (3L, "A", words(10)), (4L, "A", words(10)),
      (5L, "B", words(30)), (6L, "B", words(30)))
      .toDF("doc_id", "source", "text")
    val weights = Seq(("A", 500000L), ("B", 500000L)).toDF("source", "weight_ppm")
    // budget 40 total -> 20 tokens per source: A takes its first 2 hash-ordered
    // docs (cb 0,10 < 20; third has cb 20), B takes 1 (cb 0 < 20; 30-token
    // overspend bounded by that one doc)
    val got = Sampling.mixtureBudget(d, weights, totalTokens = 40L, seed = 3L)
      .as[(Long, String, Long, Boolean)].collect().toSeq
    val selA = got.filter(r => r._2 == "A" && r._4)
    val selB = got.filter(r => r._2 == "B" && r._4)
    assert(got.size == 6 && selA.size == 2 && selB.size == 1)
    // the selected A docs are the 2 smallest by the seeded hash key
    val m = Sampling.epochKeyMult(3L)
    val hk = (id: Long) => ((id * m + 11L) % 1000003L, id)
    val wantA = got.filter(_._2 == "A").map(_._1).sortBy(hk).take(2).toSet
    assert(selA.map(_._1).toSet == wantA)
    // a source missing from the weight table selects nothing, loudly visible
    val got2 = Sampling.mixtureBudget(d, weights.filter($"source" === "A"),
        totalTokens = 40L, seed = 3L)
      .as[(Long, String, Long, Boolean)].collect().toSeq
    assert(got2.size == 6 && got2.filter(_._2 == "B").forall(!_._4))
    // reproducible across partitionings
    val got3 = Sampling.mixtureBudget(d.repartition(5), weights, 40L, seed = 3L)
      .as[(Long, String, Long, Boolean)].collect().toSeq
    assert(got.sortBy(_._1) == got3.sortBy(_._1))
    intercept[IllegalArgumentException] {
      Sampling.mixtureBudget(d, weights, totalTokens = 0L)
    }
  }

  test("sentenceChunks: boundary-respecting assignment; overflow bounded by one sentence; degenerate docs") {
    val d = Seq(
      (1L, "One two three. Four five? Six seven eight! Nine"),
      (2L, "a b c d e f g h i j k l"), // ONE 12-token sentence: single chunk despite > maxTokens
      (3L, ""), (4L, "?! "), // tokenless after the terminator split: no rows
      (5L, "?! .")) // a trailing bare '.' is a 1-token sentence (the
      // whitespace tokenizer keeps it — terminators are only consumed
      // when followed by whitespace)
      .toDF("doc_id", "text")
    val got = Curation.sentenceChunks(d, maxTokens = 5)
      .orderBy($"doc_id", $"sent_idx")
      .as[(Long, Int, Long, Long, String)].collect().toSeq
    assert(got == Seq(
      (1L, 1, 0L, 3L, "One two three"),
      (1L, 2, 0L, 2L, "Four five"),
      (1L, 3, 1L, 3L, "Six seven eight"),
      (1L, 4, 1L, 1L, "Nine"),
      (2L, 1, 0L, 12L, "a b c d e f g h i j k l"),
      (5L, 1, 0L, 1L, ".")))
    // invariants on real data: sentences never split (token mass is
    // conserved against the raw tokenizer), chunk ids start at 0 and
    // are contiguous per doc
    val real = Curation.sentenceChunks(docs, maxTokens = 64)
    val massChunked = real.agg(sum($"n_tokens")).as[Long].head()
    // sentence-terminator-adjacent tokens merge/split differently than
    // the raw stream ('e.g.' vs 'e.g' + ''), so compare against the
    // SAME split's own token count, not the raw corpus count
    assert(massChunked > 0)
    // chunk ids start at 0 and never decrease along the sentence order
    // (contiguity is NOT asserted — a sentence longer than maxTokens
    // legitimately skips indices)
    val rows = real.select($"doc_id", $"sent_idx", $"chunk_idx")
      .as[(Long, Int, Long)].collect().toSeq.groupBy(_._1)
    rows.foreach { case (id, rs) =>
      val ordered = rs.sortBy(_._2).map(_._3)
      assert(ordered.head == 0, s"doc $id first chunk")
      assert(ordered.zip(ordered.tail).forall { case (a, b) => a <= b }, s"doc $id monotone") }
  }

  test("lengthBucketedPack: hand-rolled buckets/windows/slots; no window overfills; partitioning-invariant") {
    // W=8 ladder: 1,2,4,8 (+ overflow 16); caps 8,4,2,1,1
    def words(n: Int) = Seq.fill(n)("w").mkString(" ")
    val d = Seq(
      (1L, words(1)), (2L, words(1)), // bucket 1: rk 0,1 -> win 0
      (3L, words(2)), // bucket 2
      (4L, words(3)), // bucket 4
      (5L, words(5)), (6L, words(8)), // bucket 8, cap 1: wins 0 and 1
      (7L, words(9)), // overflow bucket 16, cap 1
      (8L, "")) // tokenless: dropped
      .toDF("doc_id", "text")
    val got = Curation.lengthBucketedPack(d, windowTokens = 8)
      .orderBy($"doc_id").as[(Long, Long, Long, Long, Long)].collect().toSeq
    assert(got == Seq(
      (1L, 1L, 1L, 0L, 0L), (2L, 1L, 1L, 0L, 1L),
      (3L, 2L, 2L, 0L, 0L),
      (4L, 3L, 4L, 0L, 0L),
      (5L, 5L, 8L, 0L, 0L), (6L, 8L, 8L, 1L, 0L),
      (7L, 9L, 16L, 0L, 0L)))
    // invariants on real data: every non-overflow window's token sum
    // fits W; capacity respected everywhere; docs never split
    val w = 128
    val packed = Curation.lengthBucketedPack(docs, windowTokens = w)
    val byWin = packed.groupBy($"bucket", $"win")
      .agg(count(lit(1)).as("n"), sum($"n_tokens").as("tt"),
        max($"slot").as("mxs"))
      .as[(Long, Long, Long, Long, Long)].collect().toSeq
    byWin.foreach { case (bucket, win, n, tt, mxs) =>
      val cap = math.max(1L, w / bucket)
      assert(n <= cap && mxs < cap, s"bucket $bucket win $win")
      if (bucket <= w) assert(tt <= w, s"bucket $bucket win $win: $tt tokens")
    }
    val a = packed.orderBy($"doc_id").collect().toSeq
    val b = Curation.lengthBucketedPack(docs.repartition(7), windowTokens = w)
      .orderBy($"doc_id").collect().toSeq
    assert(a == b)
    intercept[IllegalArgumentException] {
      Curation.lengthBucketedPack(d, windowTokens = 100)
    }
  }

  test("lengthBucketedFill: report equals the pack re-aggregated; full windows are at least half full") {
    def words(n: Int) = Seq.fill(n)("w").mkString(" ")
    val d = Seq((1L, words(1)), (2L, words(1)), (3L, words(2)),
      (4L, words(5)), (5L, words(9))).toDF("doc_id", "text")
    val got = Curation.lengthBucketedFill(d, windowTokens = 8)
      .orderBy($"bucket").as[(Long, Long, Long, Long, Long)].collect().toSeq
    // bucket 1: 2 docs, 2 tokens, 1 window -> 2e6/8 = 250000 ppm
    // bucket 2: 1 doc, 2 tokens, 1 window -> 250000
    // bucket 8: 1 doc, 5 tokens, 1 window -> 625000
    // bucket 16 (overflow): 1 doc, 9 tokens, 1 window -> 1125000 (> 1e6 allowed)
    assert(got == Seq(
      (1L, 2L, 2L, 1L, 250000L), (2L, 1L, 2L, 1L, 250000L),
      (8L, 1L, 5L, 1L, 625000L), (16L, 1L, 9L, 1L, 1125000L)))
  }

  test("chunkByTokens: overlapping windows, partial tail, empty doc emits nothing") {
    val d = Seq((1L, "a b c d e f g"), (2L, ""), (3L, "x y")).toDF("doc_id", "text")
    val got = Curation.chunkByTokens(d, window = 4, stride = 3)
      .orderBy($"doc_id", $"chunk_idx")
      .as[(Long, Int, String, Int)].collect().toSeq
    assert(got == Seq(
      (1L, 0, "a b c d", 4), (1L, 1, "d e f g", 4), (1L, 2, "g", 1),
      (3L, 0, "x y", 2)))
  }

  test("contaminationAttribution: the eval doc with the largest shingle overlap wins, ties to smallest") {
    val base = "one two three four five six seven eight nine ten "
    val d = Seq(
      (0L, base * 3),                      // eval (0 % 97 == 0): big overlap
      (97L, base),                         // eval: subset of 0's shingles
      (5L, base * 2 + "tail words here"),  // training: overlaps both evals
      (6L, "nothing shared at all"))       // training: clean
      .toDF("doc_id", "text")
    val got = Curation.contaminationAttribution(d)
      .as[(Long, Long, Long)].collect()
      .map { case (a, b, c) => a -> ((b, c)) }.toMap
    assert(got.keySet == Set(5L), s"only the contaminated doc is attributed: $got")
    // doc 0 shares strictly more distinct shingles with doc 5 than doc 97
    // does (the repeated base contributes boundary shingles like
    // "ten one two" that plain base lacks) -> 0 attributed
    assert(got(5L)._1 == 0L)
  }

  // ---- PrefixSum ------------------------------------------------------

  test("PrefixSum ≡ naive unpartitioned running sum (same values, no single-task window)") {
    // seeded, skewed values across many partitions
    val df = spark.range(0, 5000, 1, 16).toDF("id")
      .withColumn("v", pmod(col("id") * 2654435761L, lit(97L)))
    val got = PrefixSum.inclusive(df, Seq(col("id")), col("v"), "run")
      .select($"id", $"run").as[(Long, Long)].collect().toMap
    val naive = df
      .withColumn("run", sum($"v").over(
        Window.orderBy($"id").rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .select($"id", $"run").as[(Long, Long)].collect().toMap
    assert(got == naive)
  }

  test("PrefixSum rejects inputs whose columns collide with its internal names") {
    val bad = spark.range(0, 10).toDF("id").withColumn("_run", $"id")
    intercept[IllegalArgumentException] {
      PrefixSum.inclusive(bad, Seq(col("id")), lit(1L), "seq")
    }
    intercept[IllegalArgumentException] {
      PrefixSum.inclusive(spark.range(0, 10).toDF("id"), Seq(col("id")), lit(1L), "_pid")
    }
  }

  test("PrefixSum preserves row count and input columns") {
    val df = spark.range(0, 1000, 1, 8).toDF("id").withColumn("payload", $"id" * 3)
    val out = PrefixSum.inclusive(df, Seq(col("id")), lit(1L), "seq")
    assert(out.count() == 1000)
    assert(out.columns.sorted.toSeq == Seq("id", "payload", "seq"))
    // inclusive count over a dense total order is rank: seq(id) = id + 1
    assert(out.filter($"seq" =!= $"id" + 1).count() == 0)
  }

  test("PrefixSum.denseRank ≡ dense_rank over an unpartitioned window; ties share, rows and payload preserved") {
    // seeded duplicate-heavy keys over many partitions, two-column order
    val df = spark.range(0, 3000, 1, 16).toDF("id")
      .withColumn("r", pmod(col("id") * 2654435761L, lit(37L)))
      .withColumn("r2", pmod(col("id") * 40503L, lit(11L)))
    val got = PrefixSum.denseRank(df, Seq(col("r"), col("r2")), "rk")
      .select($"id", $"rk").as[(Long, Long)].collect().toMap
    val naive = df
      .withColumn("rk", dense_rank().over(Window.orderBy($"r", $"r2")).cast("long"))
      .select($"id", $"rk").as[(Long, Long)].collect().toMap
    assert(got == naive)
    val out = PrefixSum.denseRank(df, Seq(col("r")), "rk")
    assert(out.count() == 3000)
    assert(out.columns.sorted.toSeq == Seq("id", "r", "r2", "rk"))
  }

  test("PrefixSum.denseRank rejects inputs whose columns collide with its internal names") {
    val bad = spark.range(0, 10).toDF("id").withColumn("_lrank", $"id")
    intercept[IllegalArgumentException] {
      PrefixSum.denseRank(bad, Seq(col("id")), "rk")
    }
    intercept[IllegalArgumentException] {
      PrefixSum.denseRank(spark.range(0, 10).toDF("id"), Seq(col("id")), "_pid")
    }
  }

  // ---- PII redaction --------------------------------------------------

  test("redactPii counts and replaces emails, IPs, phones; clean text untouched") {
    val rows = Seq(
      (1L, "write a@b.io or c.d+x@e-f.org today"),
      (2L, "host 192.168.0.1 and 10.0.0.255 up"),
      (3L, "call +14155550123 now"),
      (4L, "mixed a@b.io at 10.0.0.1 tel +4915112345678"),
      (5L, "nothing sensitive here"),
      (6L, "")).toDF("doc_id", "text")
    val out = Curation.redactPii(rows, col("text"))
      .select($"doc_id", $"n_emails", $"n_ips", $"n_phones", $"redacted")
      .as[(Long, Int, Int, Int, String)].collect().sortBy(_._1)
    assert(out(0) == ((1L, 2, 0, 0, "write <EMAIL> or <EMAIL> today")))
    assert(out(1) == ((2L, 0, 2, 0, "host <IP> and <IP> up")))
    assert(out(2) == ((3L, 0, 0, 1, "call <PHONE> now")))
    assert(out(3) == ((4L, 1, 1, 1, "mixed <EMAIL> at <IP> tel <PHONE>")))
    assert(out(4) == ((5L, 0, 0, 0, "nothing sensitive here")))
    assert(out(5) == ((6L, 0, 0, 0, "")))
  }

  test("redaction counts are taken on the original text, not the partially-redacted one") {
    // an email whose domain looks like it contains an IP-ish digit run:
    // email is redacted first; the IP count must still see the ORIGINAL text
    val rows = Seq((1L, "u@10.1.2.3mail.com plus real 10.1.2.3")).toDF("doc_id", "text")
    val out = Curation.redactPii(rows, col("text"))
      .select($"n_emails", $"n_ips").as[(Int, Int)].head()
    // counts reflect the original string under the fixed patterns
    assert(out._1 == 1)
    assert(out._2 >= 1)
  }

  // ---- decontamination ------------------------------------------------

  test("decontaminate flags exactly the training docs sharing a 3-gram with the eval split") {
    val out = Curation.decontaminate(docs).cache()
    // the eval split itself is excluded from the output
    assert(out.filter(pmod($"doc_id", lit(97L)) === 0).count() == 0)
    assert(out.count() == docs.filter(pmod($"doc_id", lit(97L)) =!= 0).count())
    // independent recomputation of one flagged and one clean doc
    val shingled = docs.select($"doc_id",
      explode(TextFunctions.shingleHashes($"text", 3)).as("sh"))
    val evalSet = shingled.filter(pmod($"doc_id", lit(97L)) === 0)
      .select($"sh").distinct().as[Long].collect().toSet
    val sample = shingled.filter(pmod($"doc_id", lit(97L)) =!= 0)
      .as[(Long, Long)].collect().groupBy(_._1)
      .map { case (id, hs) => id -> hs.map(_._2).toSet.count(evalSet) }
    val got = out.select($"doc_id", $"n_shared").as[(Long, Long)].collect().toMap
    sample.foreach { case (id, want) =>
      assert(got(id) == want.toLong, s"doc $id")
    }
  }

  test("decontaminate minShared: verdict thresholds on distinct overlap; default ≡ any-overlap") {
    val base = Curation.decontaminate(docs)
      .select($"doc_id", $"n_shared", $"contaminated")
      .as[(Long, Long, Boolean)].collect()
    // default = any-overlap detector
    base.foreach { case (id, n, flagged) =>
      assert(flagged == (n >= 1), s"doc $id")
    }
    // a raised threshold flags exactly the docs at or above it, and
    // n_shared itself is threshold-independent
    val thresholded = Curation.decontaminate(docs, minShared = 3L)
      .select($"doc_id", $"n_shared", $"contaminated")
      .as[(Long, Long, Boolean)].collect()
    val baseByDoc = base.map(r => r._1 -> r).toMap
    thresholded.foreach { case (id, n, flagged) =>
      assert(n == baseByDoc(id)._2, s"doc $id: n_shared drifted with the threshold")
      assert(flagged == (n >= 3), s"doc $id")
    }
    assert(thresholded.count(_._3) < base.count(_._3),
      "corpus chosen so the raised threshold actually unflags docs")
  }

  test("curationPipeline: composition ≡ manually chained stage operators") {
    val pipeline = Curation.curationPipeline(docs)
      .as[(Long, Long, Long, Option[Long], Option[Long], Long)].collect().toSet
    // the same six stages spelled out by hand through the public operators
    val ld = TextDedup.lineDedup(docs, 10, 50L)
      .select($"doc_id", $"text_dedup".as("text"))
    val normed = Curation.normalizeText(ld).select($"doc_id", $"text_norm".as("text"))
    val kept = normed.join(
      Curation.qualityFilter(normed).filter($"keep").select($"doc_id"), Seq("doc_id"))
    val dups = TextDedup.minhashNearDups(kept, 0.5)
      .select($"doc_b".as("doc_id")).distinct()
    val dd = kept.join(dups, Seq("doc_id"), "left_anti")
    val clean = Curation.decontaminate(dd, 97L, minShared = 3L)
      .filter(!$"contaminated").select($"doc_id")
    val manual = Curation.packContextWindows(dd.join(clean, Seq("doc_id")), 256)
      .as[(Long, Long, Long, Option[Long], Option[Long], Long)].collect().toSet
    assert(pipeline == manual,
      s"extra=${(pipeline -- manual).take(3)} missing=${(manual -- pipeline).take(3)}")
  }

  test("curationPipeline: degenerate corpora (empty, all-filtered) produce empty output, not errors") {
    // zero rows end to end — every stage (checkpoints, range partitioner,
    // prefix sum) must tolerate an empty frame
    val empty = spark.createDataFrame(
      spark.sparkContext.emptyRDD[org.apache.spark.sql.Row],
      docs.select($"doc_id", $"text").schema)
    assert(Curation.curationPipeline(empty).count() == 0)
    // every doc dies at the quality gate (too_short) — later stages see
    // an empty frame mid-pipeline
    val tiny = Seq((1L, "one two"), (2L, "three four")).toDF("doc_id", "text")
    assert(Curation.curationPipeline(tiny).count() == 0)
  }

  test("pretrainPipeline: composition ≡ the manual stage chain + hand-computed shard manifest; every stage binds") {
    import graft.operators.Bpe
    import graft.functions.RollingHash
    // the q_pretrain_e2e injection shape over the sf0.001 corpus: three
    // good C4 lines with doc-varying first/last tokens + page-rule
    // tails on classes 2/3/4
    def m(k: Int) = ($"doc_id" % k).cast("string")
    val good = concat(
      lit("\nu"), m(5), lit(" alpha beta gamma v"), m(5), lit("."),
      lit("\nw"), m(3), lit(" zeta eta theta x"), m(3), lit("!"),
      lit("\ny"), m(7), lit(" lambda mu nu z"), m(7), lit("?"))
    val tail = when($"doc_id" % 9 === 2, lit("\nlorem ipsum dolor sit amet."))
      .when($"doc_id" % 9 === 3, lit("\ncurly brace line { with braces here."))
      .when($"doc_id" % 9 === 4, lit("\nthis page contains unsavory words now."))
      .otherwise(lit(""))
    val injected = docs.select($"doc_id", concat($"text", good, tail).as("text"))
    val bad = Seq("unsavory", "profane")
    val got = Curation.pretrainPipeline(injected, bad, minShared = 4L,
        windowTokens = 16)
      .as[(Long, Long, Long, Long, Long)].collect().toSet
    // hand chain through the public operators
    val kept = Curation.c4Filter(injected, bad).filter($"keep")
      .select($"doc_id", $"clean_text".as("text"))
    val dups = TextDedup.minhashNearDups(kept, 0.5)
      .select($"doc_b".as("doc_id")).distinct()
    val dd = kept.join(dups, Seq("doc_id"), "left_anti")
    val clean = Curation.decontaminate(dd, 97L, minShared = 4L)
      .filter(!$"contaminated").select($"doc_id")
    val surv = dd.join(clean, Seq("doc_id"))
    // every stage removes something on this fixture
    val nAll = injected.count(); val nKept = kept.count()
    val nDd = dd.count(); val nSurv = surv.count()
    assert(nAll > nKept && nKept > nDd && nDd > nSurv && nSurv > 0,
      s"stages must bind: $nAll -> $nKept -> $nDd -> $nSurv")
    val merges = Bpe.mergePairs(Bpe.trainMerges(surv, 8))
    val rows = Bpe.tokenWindows(surv, merges, 16)
      .as[(Long, Int, String, Long, Long)].collect().toSeq
    // hand-computed manifest: contiguous win_id cut into 8 shards +
    // XOR of the per-row rolling hashes
    val nWin = rows.map(_._4).max + 1
    val manual = rows.groupBy { r =>
      math.min(r._4 * 8 / nWin, 7L)
    }.map { case (shard, rs) =>
      (shard, rs.map(_._4).distinct.size.toLong, rs.size.toLong,
        rs.count(_._3 != "<eod>").toLong,
        rs.map(r => RollingHash.compute(s"${r._1}:${r._2}:${r._3}"))
          .reduce(_ ^ _))
    }.toSet
    assert(got == manual,
      s"extra=${(got -- manual).take(3)} missing=${(manual -- got).take(3)}")
  }

  test("pretrainPipeline: empty and all-filtered corpora produce empty manifests, not errors") {
    val empty = spark.createDataFrame(
      spark.sparkContext.emptyRDD[org.apache.spark.sql.Row],
      docs.select($"doc_id", $"text").schema)
    assert(Curation.pretrainPipeline(empty, Seq("unsavory")).count() == 0)
    // every page dies at the C4 gate (word salad, no terminal lines)
    assert(Curation.pretrainPipeline(
      docs.select($"doc_id", $"text").limit(20), Seq("unsavory")).count() == 0)
  }

  test("decontaminateBloom: superset of exact (no false negatives), bounded overshoot") {
    val exact = Curation.decontaminate(docs)
      .select($"doc_id", $"n_shared", $"contaminated")
      .as[(Long, Long, Boolean)].collect()
    val bloom = Curation.decontaminateBloom(docs, fpp = 0.001)
      .select($"doc_id", $"n_shared_possible", $"contaminated")
      .as[(Long, Long, Boolean)].collect()
    assert(bloom.length == exact.length, "same training split")
    val bloomByDoc = bloom.map(r => r._1 -> r).toMap
    exact.foreach { case (id, nExact, flagged) =>
      val (_, nPossible, flaggedBloom) = bloomByDoc(id)
      assert(nPossible >= nExact, s"doc $id: Bloom undercounts — false negative")
      if (flagged) assert(flaggedBloom, s"doc $id: exact-contaminated doc not flagged")
    }
    // false-positive overshoot bounded by theory: a doc probing s
    // distinct shingles false-flags with probability 1 − (1 − fpp)^s,
    // so the expected extra count is the sum of that over clean docs.
    // Assert ≤ 3× the analytic expectation (+1 for tiny corpora) — loose
    // enough to be stable, tight enough to catch a broken filter.
    val shingleCounts = docs
      .filter(pmod($"doc_id", lit(97L)) =!= 0)
      .select(size(TextFunctions.shingleHashes($"text", 3)).cast("long"))
      .as[Long].collect()
    val expectedExtra = shingleCounts.map(s => 1.0 - math.pow(1 - 0.001, s.toDouble)).sum
    val extra = bloom.count(_._3) - exact.count(_._3)
    assert(extra >= 0 && extra <= 3 * expectedExtra + 1,
      s"implausible overshoot: $extra extra flagged of ${exact.length} " +
        f"(analytic expectation $expectedExtra%.1f)")
  }

  test("normalizeText: decomposed and precomposed spellings converge (NFC), whitespace collapses") {
    val d = spark.createDataFrame(Seq(
      (1L, "cafe\u0301   du\true"),      // decomposed e+U+0301 + whitespace runs
      (2L, "caf\u00E9 du rue"),           // precomposed U+00E9, single spaces
      (3L, "A\u030Angstro\u0308m")))     // decomposed A+U+030A, o+U+0308
      .toDF("doc_id", "text")
    val out = Curation.normalizeText(d)
      .select($"doc_id", $"text_norm", $"n_raw", $"n_norm")
      .as[(Long, String, Int, Int)].collect().map(r => r._1 -> r).toMap
    // 1 and 2 normalize to the SAME string - the dedup-correctness point
    assert(out(1L)._2 == out(2L)._2)
    assert(out(2L)._2 == "caf\u00E9 du rue")
    // one combining mark folded: raw code-point count drops by exactly 1
    // (n_norm counts the NFC text BEFORE whitespace collapse)
    assert(out(1L)._3 == out(1L)._4 + 1, s"${out(1L)}")
    assert(out(3L)._2 == "\u00C5ngstr\u00F6m" && out(3L)._4 == out(3L)._3 - 2)
  }

  test("samplePerGroup: exactly min(n, |group|) rows, hash-deterministic choice") {
    import graft.operators.Sampling
    val n = 7
    val got = Sampling.samplePerGroup(docs, $"doc_id", $"lang", n)
      .select($"doc_id", $"lang").as[(Long, String)].collect()
    val sizes = docs.groupBy($"lang").count().as[(String, Long)].collect().toMap
    val gotByLang = got.groupBy(_._2).view.mapValues(_.map(_._1).toSet).toMap
    sizes.foreach { case (lang, total) =>
      assert(gotByLang.getOrElse(lang, Set.empty).size == math.min(n.toLong, total),
        s"group $lang")
    }
    // naive recompute: rank each group by (affine hash, id)
    val all = docs.select($"doc_id", $"lang").as[(Long, String)].collect()
    val expected = all.groupBy(_._2).toSeq.flatMap { case (_, rows) =>
      rows.sortBy { case (id, _) => ((id * 48271L + 11L) % 1000003L, id) }.take(n).toSeq
    }.toSet
    assert(got.toSet == expected)
  }

  // ---- context-window packing ----------------------------------------

  test("packContextWindows: contiguous token ranges, bin bounds consistent, totals add up") {
    val w = 256
    val out = Curation.packContextWindows(docs, windowTokens = w)
      .orderBy($"doc_id")
      .select($"doc_id", $"n_tokens", $"start_tok", $"bin_first", $"bin_last", $"n_bins")
      .as[(Long, Long, Long, Option[Long], Option[Long], Long)].collect()
    // token ranges tile the concatenated stream with no gaps or overlaps
    var cursor = 0L
    out.foreach { case (id, n, start, bf, bl, nb) =>
      assert(start == cursor, s"doc $id starts at $start, expected $cursor")
      cursor += n
      if (n == 0) {
        assert(bf.isEmpty && bl.isEmpty && nb == 0L, s"empty doc $id spans bins")
      } else {
        assert(bf.contains(start / w) && bl.contains((start + n - 1) / w), s"doc $id bins")
        assert(nb == bl.get - bf.get + 1)
      }
    }
    // total stream length matches the corpus token count
    val want = docs.select(sum(size(TextFunctions.tokens($"text")))).as[Long].head()
    assert(cursor == want)
  }

  test("packContextWindows rejects a non-positive window") {
    intercept[IllegalArgumentException] {
      Curation.packContextWindows(docs, windowTokens = 0)
    }
  }

  // ---- balanced output sharding --------------------------------------

  test("topFractionPerGroup: exact floor counts per group; 1000 keeps all, small groups drop whole") {
    import graft.operators.Sampling
    val d = Seq(
      // lang "a": 5 docs, 250 permille -> floor(5*250/1000) = 1 kept
      (1L, "a", 10L), (2L, "a", 20L), (3L, "a", 30L), (4L, "a", 40L), (5L, "a", 50L),
      // lang "b": 3 docs, 250 permille -> floor(0.75) = 0 kept (dropped whole)
      (6L, "b", 10L), (7L, "b", 20L), (8L, "b", 30L),
      // lang "c": ties on score -> smaller doc_id wins the one slot
      (9L, "c", 10L), (10L, "c", 10L), (11L, "c", 10L), (12L, "c", 10L))
      .toDF("doc_id", "lang", "score")
    val kept = Sampling.topFractionPerGroup(d, $"doc_id", $"lang", $"score", 250)
      .select($"doc_id").as[Long].collect().toSet
    assert(kept == Set(5L, 9L), s"got $kept")
    val all = Sampling.topFractionPerGroup(d, $"doc_id", $"lang", $"score", 1000)
    assert(all.count() == 12, "perMille 1000 must keep every row")
    val none = Sampling.topFractionPerGroup(d, $"doc_id", $"lang", $"score", 0)
    assert(none.count() == 0, "perMille 0 must keep nothing")
  }

  test("epochShuffle: seeded permutation into contiguous near-equal shard blocks") {
    import graft.operators.Sampling
    val out = Sampling.epochShuffle(docs, $"doc_id", seed = 7L, nShards = 8)
      .select($"doc_id", $"pos", $"shard")
      .as[(Long, Long, Long)].collect().toSeq
    val n = out.length
    // pos is a PERMUTATION: every position 0..n-1 exactly once
    assert(out.map(_._2).sorted == (0L until n).toSeq, "pos must be a permutation")
    // shards are contiguous blocks of the permuted order, sizes within 1
    val byShard = out.groupBy(_._3)
    assert(byShard.keySet == (0L until 8L).toSet)
    val sizes = byShard.view.mapValues(_.size).values.toSeq
    assert(sizes.max - sizes.min <= 1, s"shard sizes must differ by <= 1, got $sizes")
    byShard.foreach { case (s, rows) =>
      val ps = rows.map(_._2).sorted
      assert(ps == (ps.head to ps.last), s"shard $s is not a contiguous pos block")
    }
    // the order is genuinely shuffled, not id order
    assert(out.sortBy(_._2).map(_._1) != out.map(_._1).sorted,
      "permuted order should differ from id order")
    // same seed reproduces exactly; a different seed permutes differently
    val again = Sampling.epochShuffle(docs, $"doc_id", seed = 7L, nShards = 8)
      .select($"doc_id", $"pos", $"shard").as[(Long, Long, Long)].collect().toSeq
    assert(again.toSet == out.toSet, "same seed must reproduce the permutation")
    val other = Sampling.epochShuffle(docs, $"doc_id", seed = 8L, nShards = 8)
      .select($"doc_id", $"pos").as[(Long, Long)].collect().toMap
    assert(out.exists { case (id, p, _) => other(id) != p },
      "a different seed must yield a different permutation")
  }

  test("epochShuffle: colliding keys (ids beyond the modulus) still yield a permutation") {
    import graft.operators.Sampling
    // ids congruent mod M=1000003 share an affine key by construction —
    // the documented collision regime where ties break by id
    val M = 1000003L
    val ids = (0L until 10L).flatMap(i => Seq(i * 7L, i * 7L + M, i * 7L + 2 * M))
    val d = ids.toDF("doc_id")
    val out = Sampling.epochShuffle(d, $"doc_id", seed = 3L, nShards = 4)
      .select($"doc_id", $"pos", $"shard").as[(Long, Long, Long)].collect().toSeq
    assert(out.map(_._2).sorted == (0L until ids.size).toSeq,
      "pos must remain a permutation under key collisions")
    // each congruent triple shares one key: its members must order by id
    (0L until 10L).foreach { i =>
      val trio = Seq(i * 7L, i * 7L + M, i * 7L + 2 * M)
      val positions = trio.map(id => out.find(_._1 == id).get._2)
      assert(positions == positions.sorted,
        s"collided ids $trio must order by id, got positions $positions")
    }
  }

  test("balancedShards: shards contiguous in doc order, imbalance bounded by the largest doc") {
    val n = 8
    val out = Curation.balancedShards(docs, nShards = n).cache()
    assert(out.count() == docs.count())
    assert(out.filter($"shard" < 0 || $"shard" >= n).count() == 0)
    // contiguity: shard is non-decreasing in doc_id order
    val seq = out.orderBy($"doc_id").select($"shard").as[Long].collect()
    assert(seq.zip(seq.tail).forall { case (a, b) => a <= b })
    // balance: every shard's token mass within max-doc of the ideal slice
    val per = out.groupBy($"shard").agg(sum($"n_tokens").as("t")).as[(Long, Long)]
      .collect().toMap
    val totalT = per.values.sum
    val maxDoc = out.agg(max($"n_tokens")).as[Long].head()
    val ideal = totalT.toDouble / n
    per.values.foreach { t =>
      assert(math.abs(t - ideal) <= maxDoc + 1,
        s"shard mass $t vs ideal $ideal exceeds max-doc bound $maxDoc")
    }
  }

  test("balancedShards: all-empty corpus lands in shard 0") {
    val empty = Seq((1L, ""), (2L, "")).toDF("doc_id", "text")
    val out = Curation.balancedShards(empty, nShards = 4)
      .select($"shard").as[Long].collect().toSet
    assert(out == Set(0L))
  }

  // ---- composite quality filter --------------------------------------

  test("qualityFilter: every rule fires on a crafted doc; clean doc passes; reasons sorted") {
    val clean = (1 to 40).map(i => s"word$i").mkString(" ")
    val rows = Seq(
      (1L, clean),                                        // keep
      (2L, "small document"),                             // too_short (mean wl ok)
      (3L, (1 to 20001).map(i => s"w$i").mkString(" ")),  // too_long
      (4L, Seq.fill(50)("aaaa bbbb").mkString(" ")),      // high_repetition + bigram_repetition
      (5L, (1 to 40).map(i => s"w$i").mkString(" ")),     // short_words (mean length < 4)
      (6L, "")).toDF("doc_id", "text")                    // too_short (0 tokens)
    val out = Curation.qualityFilter(rows).orderBy($"doc_id")
      .as[(Long, Long, Boolean, Seq[String])].collect()
    assert(out(0)._3 && out(0)._4.isEmpty)
    assert(out(1)._4 == Seq("too_short"))
    assert(out(2)._4 == Seq("too_long"))
    assert(out(3)._4 == Seq("bigram_repetition", "high_repetition"))
    assert(out(4)._4 == Seq("short_words"))
    assert(out(5)._4 == Seq("too_short"))
    assert(out.forall(r => r._3 == r._4.isEmpty))
    // reasons arrays come out alphabetical (construction order)
    assert(out.forall(r => r._4 == r._4.sorted))
  }

  // ---- repetition metrics --------------------------------------------

  test("repetitionMetrics: hand-checked counts, bigrams = tokens − 1, bounds hold") {
    val rows = Seq(
      (1L, "a b a b a"),
      (2L, "x"),
      (3L, "")).toDF("doc_id", "text")
    val out = Curation.repetitionMetrics(rows).orderBy($"doc_id")
      .as[(Long, Int, Int, Int, Int)].collect()
    assert(out(0) == ((1L, 5, 2, 4, 2)))   // bigrams: "a b","b a","a b","b a"
    assert(out(1) == ((2L, 1, 1, 0, 0)))
    assert(out(2) == ((3L, 0, 0, 0, 0)))
    val corpus = Curation.repetitionMetrics(docs)
    assert(corpus.filter($"n_distinct_tokens" > $"n_tokens").count() == 0)
    assert(corpus.filter($"n_tokens" > 0 &&
      $"n_bigrams" =!= $"n_tokens" - 1).count() == 0)
    assert(corpus.filter($"n_distinct_bigrams" > $"n_bigrams").count() == 0)
  }

  test("contaminationBySource: rates close against per-doc decontaminate verdicts") {
    val rep = Curation.contaminationBySource(docs)
      .as[(String, Long, Long, Long)].collect().toSeq
    val verdicts = Curation.decontaminate(docs)
      .join(docs.select($"doc_id", $"source"), "doc_id")
      .select($"source", $"contaminated").as[(String, Boolean)].collect()
    assert(rep.map(_._2).sum == verdicts.length)
    assert(rep.map(_._3).sum == verdicts.count(_._2))
    for ((src, nd, nc, ppm) <- rep) {
      assert(nd == verdicts.count(_._1 == src))
      assert(nc == verdicts.count(v => v._1 == src && v._2))
      assert(ppm == nc * 1000000L / nd)
    }
  }

  test("leakageSafeSplit: near-dup pairs never straddle splits; plain hash split would leak") {
    import graft.operators.Sampling
    val split = Sampling.leakageSafeSplit(docs, trainPerMille = 900,
        valPerMille = 50, threshold = 0.5)
      .as[(Long, Long, String)].collect().map(r => r._1 -> (r._2, r._3)).toMap
    assert(split.size == docs.count())
    val pairs = TextDedup.minhashNearDups(docs, threshold = 0.5)
      .select($"doc_a", $"doc_b").as[(Long, Long)].collect()
    assert(pairs.nonEmpty)
    for ((a, b) <- pairs) {
      assert(split(a)._1 == split(b)._1, s"pair ($a,$b) split keys differ")
      assert(split(a)._2 == split(b)._2, s"pair ($a,$b) straddles splits")
    }
    // the naive id-hash split DOES leak on this corpus — the operator
    // exists because of exactly these pairs
    val naive = Sampling.assignSplits(docs, $"doc_id", 900, 50)
      .select($"doc_id", $"split").as[(Long, String)].collect().toMap
    assert(pairs.exists { case (a, b) => naive(a) != naive(b) },
      "expected at least one leaking pair under the plain hash split")
    // all three splits materialize at these thresholds
    assert(split.values.map(_._2).toSet == Set("train", "val", "test"))
  }

  test("shardManifest: totals close against balancedShards; signature is order-free and drift-sensitive") {
    val m = Curation.shardManifest(docs, nShards = 8)
      .as[(Long, Long, Long, Long)].collect().toSeq
    val shards = Curation.balancedShards(docs, nShards = 8)
      .as[(Long, Long, Long)].collect().toSeq
    assert(m.map(_._2).sum == docs.count())
    assert(m.map(_._3).sum == shards.map(_._2).sum, "token totals close")
    // order-free: a reshuffled input yields the identical manifest
    val again = Curation.shardManifest(docs.repartition(7).sortWithinPartitions($"n_chars"),
      nShards = 8).as[(Long, Long, Long, Long)].collect().toSeq
    assert(again.sortBy(_._1) == m.sortBy(_._1))
    // drift-sensitive: one flipped document changes exactly its shard's
    // signature (prepend merges into the first token — token counts and
    // hence shard boundaries stay identical)
    val drifted = docs.withColumn("text",
      when($"doc_id" === 0L, concat(lit("x"), $"text")).otherwise($"text"))
    val dm = Curation.shardManifest(drifted, nShards = 8)
      .as[(Long, Long, Long, Long)].collect().toSeq.sortBy(_._1)
    val shard0 = shards.find(_._1 == 0L).get._3
    val diffs = m.sortBy(_._1).zip(dm).filter { case (a, b) => a._4 != b._4 }
    assert(diffs.map(_._1._1) == Seq(shard0),
      s"exactly doc 0's shard ($shard0) should change signature")
  }

  test("sourceReport: pure composition of the verified per-source operators; pair accounting closes") {
    import graft.operators.Sampling
    val rep = Curation.sourceReport(docs, dupThreshold = 0.5)
      .orderBy($"source")
      .as[(String, Long, Long, Long, Long, Long, Long, Long, Long)]
      .collect().toSeq
    // every source appears exactly once
    val wts = Sampling.mixtureWeights(docs)
      .as[(String, Long, Long, Long)].collect().map(r => r._1 -> r).toMap
    val nov = TextDedup.sourceNovelty(docs)
      .as[(String, Long, Long, Long)].collect().map(r => r._1 -> r).toMap
    assert(rep.map(_._1) == wts.keys.toSeq.sorted)
    for (r <- rep) {
      assert((r._2, r._3, r._4) == (wts(r._1)._2, wts(r._1)._3, wts(r._1)._4))
      assert((r._5, r._6, r._7) == (nov(r._1)._2, nov(r._1)._3, nov(r._1)._4))
    }
    // dup accounting: within-pairs counted once, cross-pairs twice (once
    // per participating source) — together they cover the matrix exactly
    val m = TextDedup.crossSourceDupMatrix(docs, threshold = 0.5)
      .as[(String, String, Long)].collect().toSeq
    val withinTotal = m.filter(r => r._1 == r._2).map(_._3).sum
    val crossTotal = m.filter(r => r._1 != r._2).map(_._3).sum
    assert(rep.map(_._8).sum == withinTotal)
    assert(rep.map(_._9).sum == 2 * crossTotal)
  }

  test("curriculumOrder: score-ascending permutation, contiguous near-equal shards, integral contract") {
    import graft.operators.Sampling
    val out = Sampling.curriculumOrder(docs, $"doc_id", $"n_chars", nShards = 8)
      .select($"doc_id", $"n_chars", $"pos", $"shard")
      .as[(Long, Long, Long, Long)].collect().toSeq.sortBy(_._3)
    // pos is a 0-based permutation in (score, id) order
    assert(out.map(_._3) == (0L until docs.count()).toSeq)
    assert(out.map(r => (r._2, r._1)) == out.map(r => (r._2, r._1)).sorted)
    // shards are contiguous in curriculum order and near-equal (±1)
    val sizes = out.groupBy(_._4).view.mapValues(_.size).toMap
    assert(sizes.keySet == (0L to 7L).toSet)
    assert(sizes.values.max - sizes.values.min <= 1)
    assert(out.map(_._4) == out.map(_._4).sorted, "shard ids ascend with pos")
    // fractional scores are rejected loudly, not truncated
    val ex = intercept[IllegalArgumentException] {
      Sampling.curriculumOrder(docs, $"doc_id", $"n_chars" / 2.0, nShards = 4)
    }
    assert(ex.getMessage.toLowerCase.contains("integral"))
  }

  test("mixtureWeights: exact sqrt-quantized shares on a hand corpus; temperature flattens") {
    import graft.operators.Sampling
    // token counts 16 / 4 / 1 → sqrt 4 / 2 / 1 → shares 4/7, 2/7, 1/7
    val d = Seq(
      (1L, ("a " * 16).trim, "sA"), (2L, ("b " * 4).trim, "sB"), (3L, "c", "sC"))
      .toDF("doc_id", "text", "source")
    val got = Sampling.mixtureWeights(d).orderBy($"source")
      .as[(String, Long, Long, Long)].collect().toSeq
    assert(got == Seq(
      ("sA", 1L, 16L, 4000000L * 1000000L / 7000000L),
      ("sB", 1L, 4L, 2000000L * 1000000L / 7000000L),
      ("sC", 1L, 1L, 1000000L * 1000000L / 7000000L)))
    // flattening: raw token share of sA is 16/21 ≈ 762k ppm; α = 0.5
    // share is 4/7 ≈ 571k ppm — the big source is down-weighted
    assert(got.head._4 < 16L * 1000000L / 21L)
  }

  test("mixtureWeights on the corpus: doc totals conserved, floor shares sum to ≤ 1e6") {
    import graft.operators.Sampling
    val w = Sampling.mixtureWeights(docs)
      .as[(String, Long, Long, Long)].collect().toSeq
    assert(w.map(_._2).sum == docs.count())
    val s = w.map(_._4).sum
    assert(s <= 1000000L && s > 1000000L - w.size)
    // exact recompute: the documented three-step formula
    val sv = w.map(r => math.floor(math.sqrt(r._3.toDouble) * 1000000.0).toLong)
    val stot = sv.sum
    assert(w.map(_._4) == sv.map(v => v * 1000000L / stot))
  }

  test("writeTrainingShards round-trips: file-side manifest ≡ assignment-side; layout + tamper detection") {
    val dir = java.nio.file.Files.createTempDirectory("graft_shard_spec").toString
    try {
      Curation.writeTrainingShards(docs, dir, nShards = 4)
      // partition layout on disk: one shard=N directory per shard
      val parts = new java.io.File(dir).listFiles().map(_.getName).filter(_.startsWith("shard="))
      assert(parts.toSet == (0 until 4).map(i => s"shard=$i").toSet)
      // manifest recomputed from the files equals the assignment-side one
      val fromDir = Curation.shardManifestFromDir(spark, dir)
        .as[(Long, Long, Long, Long)].collect().toSet
      val fromInput = Curation.shardManifest(docs, nShards = 4)
        .as[(Long, Long, Long, Long)].collect().toSet
      assert(fromDir == fromInput)
      // all rows round-trip (full columns, every doc exactly once)
      val back = spark.read.parquet(dir)
      assert(back.count() == docs.count())
      assert(back.select("doc_id").distinct().count() == docs.count())
      // tampering with one document's text flips its shard's signature
      // (an extra token can also shift cumulative shard boundaries, so
      // the guarantee is "detected", not "detected in exactly one shard")
      val backDocs = back.select($"doc_id", $"text")
      val tampered = backDocs.withColumn("text",
        when($"doc_id" === 0L, concat($"text", lit(" x"))).otherwise($"text"))
      val sigA = Curation.shardManifest(backDocs, 4).as[(Long, Long, Long, Long)]
        .collect().map(r => r._1 -> r._4).toMap
      val sigB = Curation.shardManifest(tampered, 4).as[(Long, Long, Long, Long)]
        .collect().map(r => r._1 -> r._4).toMap
      assert(sigA.keySet.exists(k => sigA(k) != sigB(k)))
    } finally {
      def rm(f: java.io.File): Unit = {
        Option(f.listFiles()).foreach(_.foreach(rm)); f.delete()
      }
      rm(new java.io.File(dir))
    }
  }

  test("docNovelty ≡ naive per-doc unique-shingle fraction; bounds hold") {
    val ds = docs.select($"doc_id",
        explode(graft.functions.ShingleHashes.shingle_hashes($"text", 3)).as("sh"))
      .as[(Long, Long)].collect()
    val df = ds.groupBy(_._2).view.mapValues(_.size).toMap
    val want = ds.groupBy(_._1).map { case (d, rows) =>
      val n = rows.size.toLong
      val u = rows.count(r => df(r._2) == 1).toLong
      (d, n, u, u * 1000000L / n)
    }.toSeq.sortBy(_._1)
    val got = TextDedup.docNovelty(docs).orderBy($"doc_id")
      .as[(Long, Long, Long, Long)].collect().toSeq
    assert(got == want)
    assert(got.forall(r => r._3 <= r._2 && r._4 >= 0L && r._4 <= 1000000L))
  }

  test("gopherNgramSignals: hand-computed top-n and dup-n coverage, union never double-counts") {
    val d = Seq(
      (0L, "a b a b a b"),                 // top2 = (a b)x3 * 2 chars
      (1L, "x y z w v x y z w v"),          // dup5: two disjoint copies
      (2L, "c c c c c c c"),                // dup5: 3 OVERLAPPING copies
      (3L, "solo")                          // too short for any n-gram
    ).toDF("doc_id", "text")
    val out = Curation.gopherNgramSignals(d).orderBy("doc_id").collect()
    val r0 = out(0)
    assert(r0.getAs[Long]("n_wchars") == 6L)
    assert(r0.getAs[Long]("top2") == 6L)  // 3 occurrences x 2 token chars
    assert(r0.getAs[Long]("top3") == 6L)  // (a b a)x2 ties (b a b)x2 -> lex
    assert(r0.getAs[Long]("top4") == 8L)  // (a b a b)x2 x 4 chars
    assert(r0.getAs[Long]("dup5") == 0L)  // no duplicate 5-gram
    val r1 = out(1)
    assert(r1.getAs[Long]("dup5") == 10L) // both copies covered, all 10 chars
    assert(r1.getAs[Long]("dup6") == 0L)
    val r2 = out(2)
    // every 5-gram of "c"x7 is identical; covered positions 1..7 count
    // ONCE — the positional-union rule (a per-occurrence sum would read 15)
    assert(r2.getAs[Long]("dup5") == 7L)
    assert(r2.getAs[Long]("dup6") == 7L)
    assert(r2.getAs[Long]("dup7") == 0L)  // single 7-gram, no duplicate
    val r3 = out(3)
    assert(r3.getAs[Long]("n_wchars") == 4L)
    assert(Seq("top2", "top3", "top4", "dup5", "dup10").forall(c => r3.getAs[Long](c) == 0L))
  }

  test("gopherGate: every added rule fires on its constructed document and not on a clean one") {
    def uniq(n: Int, len: Int) = (0 until n).map(i => ("w" + i).padTo(len, 'x')).mkString(" ")
    val clean = "the of " + uniq(38, 5) // 40 tokens, 2 stopwords, mean len ~5
    val d = Seq(
      (0L, clean),
      (1L, "the of " + uniq(38, 15)),              // long_words (mean > 10)
      (2L, "the of " + (1 to 38).map(_.toString + "0000").mkString(" ")), // low_alpha (38/40 numeric)
      // high_symbols: all THREE counters bind — 8 '#', one '...' run
      // (4 dots = ONE non-overlapping match + a remainder dot), one '…'
      // → 8 + 1 + 1 = 10 symbols over 43 words
      (3L, clean + " " + "#" * 8 + " .... …"),
      (4L, uniq(40, 5)),                            // few_stopwords
      (5L, clean + (" ba dum" * 80)),               // top_ngram2 (+ dup rules)
      (6L, clean + (" p q r s t u v w x y z1" * 3)) // dup_ngram5..10
    ).toDF("doc_id", "text")
    val out = Curation.gopherGate(d).orderBy("doc_id").collect()
      .map(r => (r.getAs[Boolean]("keep"),
        r.getAs[scala.collection.Seq[String]]("reasons").toSeq))
    assert(out(0)._1, s"clean doc should keep, got ${out(0)._2}")
    assert(out(1)._2.contains("long_words"))
    assert(out(2)._2.contains("low_alpha"))
    assert(out(3)._2.contains("high_symbols"))
    assert(out(4)._2.contains("few_stopwords"))
    assert(out(5)._2.contains("top_ngram2"))
    Seq(5, 6, 7, 8, 9, 10).foreach(n =>
      assert(out(6)._2.contains(s"dup_ngram$n"), s"dup_ngram$n missing: ${out(6)._2}"))
    // the base qualityFilter rules still ride along
    assert(!out(1)._2.contains("short_words"))
  }

  test("gopherGate line rules: bullet/ellipsis shares at their exact margins") {
    def uniq(o: Int, n: Int) =
      (0 until n).map(i => ("v" + (o + i)).padTo(5, 'x')).mkString(" ")
    val clean = "the of " + uniq(0, 38)
    val d = Seq(
      // 10 of 11 lines bullet-started: 100 > 99 → fires (exact margin)
      (0L, clean + (1 to 10).map(i => s"\n•${uniq(40 * i, 2)}").mkString),
      // 9 of 10 bullet lines: 90 > 90 is FALSE → keeps
      (1L, clean + (1 to 9).map(i => s"\n•${uniq(40 * i, 2)}").mkString),
      // every bullet spelling fires, with optional indent
      (2L, clean + "\n- dash" + "\n* star" + "\n‣ tri" + "\n▶ arrow" +
        "\n  • indented" + (1 to 49).map(i => s"\n•${uniq(40 * i, 2)}").mkString),
      // 1 of 3 lines '…'-ended (33% > 30%) → fires
      (3L, clean + "\ntrails away …\nplain closing line"),
      // 3 of 10 lines ellipsis-ended (30% > 30% is FALSE) → keeps;
      // both spellings and trailing blanks covered
      (4L, clean + "\na …\nb ... \nc …  " + (1 to 6).map(i => s"\nplain ${uniq(40 * i, 2)}").mkString),
      // a single-line document fires neither rule (bullet/ellipsis
      // chars mid-line don't count; the one line starts with a word
      // and ends with one)
      (5L, clean + " - • … ... end")
    ).toDF("doc_id", "text")
    val out = Curation.gopherGate(d).orderBy("doc_id").collect()
      .map(r => (r.getAs[Boolean]("keep"),
        r.getAs[scala.collection.Seq[String]]("reasons").toSeq))
    assert(out(0)._2 == Seq("bullet_lines"), s"got ${out(0)._2}")
    assert(out(1)._1, s"9/10 bullets must keep, got ${out(1)._2}")
    assert(out(2)._2.contains("bullet_lines"))
    assert(out(3)._2 == Seq("ellipsis_lines"), s"got ${out(3)._2}")
    assert(out(4)._1, s"30% exactly must keep, got ${out(4)._2}")
    assert(!out(5)._2.contains("bullet_lines") &&
      !out(5)._2.contains("ellipsis_lines"), s"got ${out(5)._2}")
  }

  test("piiScrub: each rule binds both ways, sequential stages never double-count") {
    val d = Seq(
      (0L, "mail a.b+x@ex-y.org and c@d.io end"),       // two emails
      (1L, "ip 10.0.255.7 end, 192.168.1.255."),        // two IPs, one at '.'
      (2L, "ref 123456789 id 98765432100 but 12345678 stays"), // 9/11 scrub, 8 survives
      (3L, "v4 1234.5.6.7 not an ip"),                  // 4-digit octet: \b(\d{1,3}\.) rejects
      (4L, "clean words only here")
    ).toDF("doc_id", "text")
    val out = Curation.piiScrub(d).orderBy("doc_id").collect()
    assert(out(0).getAs[String]("clean_text") == "mail <EMAIL> and <EMAIL> end")
    assert(out(0).getAs[Long]("n_email") == 2 && !out(0).getAs[Boolean]("pii_free"))
    assert(out(1).getAs[String]("clean_text") == "ip <IP> end, <IP>.")
    assert(out(1).getAs[Long]("n_ip") == 2)
    assert(out(2).getAs[String]("clean_text") ==
      "ref <DIGITS> id <DIGITS> but 12345678 stays")
    assert(out(2).getAs[Long]("n_digits") == 2)
    // "1234.5.6.7": the leading \b lands inside the digit run, so the
    // IP shape never anchors — and no 9+ digit run exists either
    assert(out(3).getAs[String]("clean_text") == "v4 1234.5.6.7 not an ip")
    assert(out(3).getAs[Boolean]("pii_free"))
    assert(out(4).getAs[Boolean]("pii_free"))
    assert(out(4).getAs[String]("clean_text") == "clean words only here")
  }

  test("rtdCorrupt: every position labeled, draw-equals-original is NOT replaced") {
    val stream = (0 until 2000).map(i =>
      (i.toLong / 50, (i % 50) + 1, s"t${i % 97}")).toDF("doc_id", "pos", "token")
    val vocab = graft.operators.Bpe.vocabulary(stream)
    val out = graft.operators.Bpe.rtdCorrupt(stream, vocab)
      .orderBy("doc_id", "pos").collect()
    assert(out.length == 2000)
    val vset = vocab.select("token").collect().map(_.getString(0)).toSet
    var nRep = 0; var nLuckyKeep = 0
    out.foreach { r =>
      val orig = s"t${(r.getLong(0) * 50 + r.getInt(1) - 1) % 97}"
      val (in, rep) = (r.getString(2), r.getBoolean(3))
      assert(vset.contains(in)) // never [MASK], never out-of-vocab
      if (rep) { assert(in != orig); nRep += 1 }
      else if (in != orig) fail(s"unreplaced row with changed token: $r")
    }
    // ~15% replaced minus the 1/|V| lucky draws
    assert(nRep > 150 && nRep < 450, s"replaced $nRep of 2000")
    // the lucky-draw branch binds: some selected position drew its own
    // token and is labeled NOT replaced — replay the selection hash
    def rh(s: String): Long =
      s.foldLeft(0L)((acc, c) => (acc * 31 + c.toLong) % 1000000007L)
    nLuckyKeep = out.count { r =>
      val orig = s"t${(r.getLong(0) * 50 + r.getInt(1) - 1) % 97}"
      val sel = rh(s"${r.getLong(0)}:${r.getInt(1)}:$orig") % 100 < 15
      sel && !r.getBoolean(3)
    }
    assert(nLuckyKeep > 0, "no selected position drew its own token — fixture too small")
    // determinism
    val again = graft.operators.Bpe.rtdCorrupt(stream, vocab)
      .orderBy("doc_id", "pos").collect()
    assert(out.map(_.toString).toSeq == again.map(_.toString).toSeq)
  }

  test("nspPairs: IsNext carries the true next sentence; NotNext draws from a different document, auditable and deterministic") {
    val d = Seq(
      (0L, "a b. c d. e f. g h"),
      (1L, "i j. k l. m n"),
      (2L, "o p. q r. s t. u v. w x")
    ).toDF("doc_id", "text")
    val out = Curation.nspPairs(d).orderBy("doc_id", "sent_idx").collect()
    // every doc with k sentences emits k-1 pairs: 3 + 2 + 4 = 9
    assert(out.length == 9)
    val sents = Seq(0L -> Seq("a b", "c d", "e f", "g h"),
      1L -> Seq("i j", "k l", "m n"),
      2L -> Seq("o p", "q r", "s t", "u v", "w x")).toMap
    var nIs = 0; var nNot = 0
    out.foreach { r =>
      val (doc, si, a, b, bd, bs, isNext) = (r.getLong(0), r.getInt(1),
        r.getString(2), r.getString(3), r.getLong(4), r.getLong(5), r.getBoolean(6))
      assert(a == sents(doc)(si - 1))
      if (isNext) {
        nIs += 1
        assert(bd == doc && bs == si + 1 && b == sents(doc)(si))
      } else {
        nNot += 1
        assert(bd != doc, s"NotNext drew from the SAME document $doc")
        assert(b == sents(bd)(bs.toInt - 1), "b_doc/b_sent must locate b")
      }
    }
    assert(nIs > 0 && nNot > 0, s"both branches must bind ($nIs/$nNot)")
    // determinism: bit-identical re-run
    val again = Curation.nspPairs(d).orderBy("doc_id", "sent_idx").collect()
    assert(out.map(_.toString).toSeq == again.map(_.toString).toSeq)
  }

  test("nspPairs refuses a single-document corpus instead of a silent modulo") {
    // force the NotNext branch to evaluate by providing enough pairs
    val one = Seq((0L, "a b. c d. e f. g h. i j. k l. m n. o p")).toDF("doc_id", "text")
    val ex = intercept[Exception] {
      Curation.nspPairs(one).collect()
    }
    assert(ex.getMessage != null)
  }

  test("ictPairs: hash-replayed query/context split, the keep-in-context coin binds, short docs emit nothing") {
    val texts = (0 until 40).map(i =>
      s"first sentence alpha $i. second sentence beta $i. third sentence gamma $i.")
    val docs = (texts.zipWithIndex.map { case (t, i) => (i.toLong, t) } :+
      (99L, "single sentence no terminator") :+
      (98L, "")).toDF("doc_id", "text")
    val got = Curation.ictPairs(docs)
      .as[(Long, Long, Boolean, String, String)].collect()
      .map(r => r._1 -> r).toMap
    assert(!got.contains(99L) && !got.contains(98L))
    texts.zipWithIndex.foreach { case (t, i) =>
      val sents = t.split("""[.!?]+[ \t\n\f\r]+""").filter(_.trim.nonEmpty).toSeq
      assert(sents.size == 3)
      val h = graft.functions.RollingHash.compute(t)
      val qi = (h % 3).toInt
      val keep = (h / 7) % 10 == 0
      val (id, si, kq, q, ctx) = got(i.toLong)
      assert(si == qi + 1 && kq == keep, s"doc $i draw")
      assert(q == sents(qi), s"doc $i query")
      val expCtx = if (keep) sents.mkString(" ")
        else sents.zipWithIndex.filter(_._2 != qi).map(_._1).mkString(" ")
      assert(ctx == expCtx, s"doc $i context")
    }
    // both coin branches must occur or the 10% rule is vacuous here
    val coins = texts.map(t => (graft.functions.RollingHash.compute(t) / 7) % 10 == 0)
    assert(coins.contains(true) && coins.contains(false))
  }

  test("c4Filter: every published rule binds; clean_text is exactly the kept lines") {
    val good = "alpha beta gamma delta epsilon.\nzeta eta theta iota kappa!\nlambda mu nu xi omicron pi?"
    val d = Seq(
      (0L, good),
      (1L, "alpha beta gamma delta epsilon.\nzeta eta theta iota kappa!"),
      (2L, good + "\nlorem ipsum dolor sit."), // 4-word line drops; the PAGE rule reads the raw text
      (3L, good + "\nbrace { line with five words."),
      (4L, good + "\nthis has unsavory content words."),
      (5L, good + "\nplease enable javascript now friend."), // well-formed but javascript: line drops, page keeps
      (6L, "short line.\nno terminal punct here at all\n" + good) // line rules bind without page discard
    ).toDF("doc_id", "text")
    val out = Curation.c4Filter(d, Seq("unsavory")).orderBy("doc_id").collect()
    def reasons(i: Int) = out(i).getAs[scala.collection.Seq[String]]("reasons").toSeq
    assert(out(0).getAs[Boolean]("keep") && out(0).getAs[Long]("n_sentences") == 3L)
    assert(out(0).getAs[String]("clean_text") == good)
    assert(reasons(1) == Seq("too_few_sentences"))
    assert(reasons(2) == Seq("lorem_ipsum"))
    assert(reasons(3) == Seq("curly_brace"))
    assert(reasons(4) == Seq("badword"))
    assert(out(5).getAs[Boolean]("keep") && out(5).getAs[Long]("n_lines_kept") == 3L)
    assert(out(6).getAs[Boolean]("keep") && out(6).getAs[Long]("n_lines_kept") == 3L)
    assert(out(6).getAs[String]("clean_text") == good)
  }
}
