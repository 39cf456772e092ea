package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Paired A/B plan probe for tuning sessions on a stall-prone host:
  * alternate the variants' noop runs inside ONE JVM (A B A B …) so
  * whole-VM stalls hit both sides equally, and report per-variant
  * minima — the only timing methodology that separates a plan change
  * from hypervisor steal at per-query granularity (SCALE.md capture
  * protocol; isolated back-to-back runs of IDENTICAL binaries swing
  * 2–10× here).
  *
  * Usage: runMain graft.tools.AbProbe <probe> [rounds]
  */
object AbProbe {
  def main(args: Array[String]): Unit = {
    val probe = args(0)
    val rounds = if (args.length > 1) args(1).toInt else 4
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.coalescePartitions.parallelismFirst", "false")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    graft.sources.Tables.preload(spark, dir)
    val variants = probes(spark, dir)(probe)
    // one untimed warmup each (codegen + JIT), then alternating rounds
    val times = scala.collection.mutable.Map.empty[String, List[Double]]
    for (r <- 0 to rounds; (name, fn) <- variants) {
      val t0 = System.nanoTime()
      fn().write.mode("overwrite").format("noop").save()
      val dt = (System.nanoTime() - t0) / 1e9
      graft.sources.Tables.evictPinned(spark, blocking = true)
      graft.sources.Tables.releaseLocalCheckpoints(spark)
      if (r > 0) times(name) = dt :: times.getOrElse(name, Nil)
      println(f"[ab] round $r $name%-10s $dt%8.2f s")
    }
    variants.foreach { case (name, _) =>
      val ts = times(name).sorted
      println(f"[ab] $name%-10s min=${ts.head}%8.2f  med=${ts(ts.size / 2)}%8.2f  all=${ts.map(t => f"$t%.2f").mkString(",")}")
    }
    spark.stop()
  }

  private def probes(spark: SparkSession, dir: String)
      : Map[String, Seq[(String, () => DataFrame)]] = {
    import graft.operators._
    import graft.functions.TextFunctions

    // ---- the pre-round-19 suffixRanks spelling: (doc_id, pos) self-join
    // for the k-ahead shift (two corpus exchanges/round) instead of the
    // lead() window (one)
    def suffixRanksJoin(docs: DataFrame, prefixTokens: Int): DataFrame = {
      val toks = docs.select(col("doc_id"),
        posexplode(TextFunctions.tokens(col("text"))).as(Seq("pos0", "tok")))
        .select(col("doc_id"), (col("pos0") + 1).cast("int").as("pos"), col("tok"))
      val vocabRank = PrefixSum.inclusive(
        toks.select(col("tok")).distinct().withColumn("_one", lit(1L)),
        Seq(col("tok")), col("_one"), "r").drop("_one")
      var cur = toks.join(vocabRank, Seq("tok"))
        .select(col("doc_id"), col("pos"), col("r")).localCheckpoint()
      var k = 1
      while (k < prefixTokens) {
        val shifted = cur.select(col("doc_id"),
          (col("pos") - k).cast("int").as("pos"), col("r").as("r2"))
        val paired = cur.join(shifted, Seq("doc_id", "pos"), "left")
          .select(col("doc_id"), col("pos"), col("r"),
            coalesce(col("r2"), lit(0L)).as("r2"))
        cur = PrefixSum.denseRank(paired, Seq(col("r"), col("r2")), "rnew")
          .select(col("doc_id"), col("pos"), col("rnew").as("r")).localCheckpoint()
        k *= 2
      }
      cur.select(col("doc_id"), col("pos"), col("r").as("srank"))
    }

    Map(
      "suffix" -> Seq(
        "join" -> (() => suffixRanksJoin(TextDedup.documents(spark, dir), 8)
          .orderBy(col("doc_id"), col("pos"))),
        "lead" -> (() => SuffixRank.suffixRanks(TextDedup.documents(spark, dir))
          .orderBy(col("doc_id"), col("pos")))),
      "softtrain" -> Seq(
        // old: one wordCounts pass per round (public pieces re-spell the
        // pre-round-19 trainVocab loop exactly)
        "perround" -> (() => {
          val docs = TextDedup.documents(spark, dir)
          var vocab = Unigram.seedVocab(docs, 4, 48)
            .select(col("piece"), col("n_occ")).localCheckpoint()
          var pieces = Unigram.vocabModel(vocab)._1
          while (pieces.size > 29) {
            val dropK = math.min(8L, pieces.size.toLong - 29).toInt
            val usage = Unigram.pieceUsageSoft(docs, vocab, 8, 1000000L)
              .select(col("piece"), col("usage_q").as("usage"))
            vocab = Unigram.pruneVocab(vocab.select(col("piece")), usage, dropK)
              .select(col("piece"), col("n_occ")).localCheckpoint()
            pieces = Unigram.vocabModel(vocab)._1
          }
          vocab.orderBy(col("n_occ").desc, col("piece"))
        }),
        "shared" -> (() => Unigram.trainVocab(TextDedup.documents(spark, dir),
            4, 48, 29, 8, soft = true, 8, 1000000L)
          .orderBy(col("n_occ").desc, col("piece")))),
      "gopher" -> Seq(
        // old dup side: count-only agg + join-back + corpus-wide distinct
        "joinback" -> (() => {
          val docs = graft.M5Queries.gopherInjected(spark, dir)
          val base = SharedBranch.sharedBranch(
            docs.select(col("doc_id"), TextFunctions.tokens(col("text")).as("w")))
          val pos = base.select(col("doc_id"),
            posexplode(col("w")).as(Seq("q0", "tok")))
            .select(col("doc_id"), (col("q0") + 1).as("q"),
              length(col("tok")).cast("long").as("wlen"))
          val posShared = SharedBranch.sharedBranch(pos)
          val chars = posShared.groupBy(col("doc_id"))
            .agg(sum(col("wlen")).as("n_wchars"))
          def ngrams(ns: Seq[Int]): DataFrame =
            ns.map { n =>
              base.select(col("doc_id"), lit(n).as("n"),
                posexplode(TextFunctions.shingles(col("w"), n)).as(Seq("p0", "ng")))
                .select(col("doc_id"), col("n"), (col("p0") + 1).as("p"), col("ng"))
            }.reduce(_ unionByName _)
          val top = ngrams(Seq(2, 3, 4))
            .groupBy(col("doc_id"), col("n"), col("ng")).agg(count(lit(1)).as("c"))
            .groupBy(col("doc_id"), col("n"))
            .agg(min(struct((-col("c")).as("nc"), col("ng"))).as("m"))
            .select(col("doc_id"), col("n"),
              ((-col("m.nc")) * (length(col("m.ng")) - (col("n") - 1)))
                .cast("long").as("num"))
          val dupNg = SharedBranch.sharedBranch(ngrams(Seq(5, 6, 7, 8, 9, 10)))
          val dupStarts = dupNg
            .groupBy(col("doc_id"), col("n"), col("ng")).agg(count(lit(1)).as("c"))
            .filter(col("c") >= 2)
            .join(dupNg, Seq("doc_id", "n", "ng"))
            .select(col("doc_id"), col("n"), col("p"))
          val covered = dupStarts
            .select(col("doc_id"), col("n"),
              explode(sequence(col("p"), col("p") + col("n") - 1)).as("q"))
            .distinct()
          val dup = covered.join(posShared, Seq("doc_id", "q"))
            .groupBy(col("doc_id"), col("n")).agg(sum(col("wlen")).as("num"))
          def cols(df: DataFrame, ns: Seq[Int], prefix: String) =
            df.groupBy(col("doc_id")).agg(
              ns.map(n => coalesce(max(when(col("n") === n, col("num"))), lit(0L))
                .as(s"$prefix$n")).head,
              ns.tail.map(n => coalesce(max(when(col("n") === n, col("num"))), lit(0L))
                .as(s"$prefix$n")): _*)
          docs.select(col("doc_id"))
            .join(chars, Seq("doc_id"), "left")
            .join(cols(top, Seq(2, 3, 4), "top"), Seq("doc_id"), "left")
            .join(cols(dup, Seq(5, 6, 7, 8, 9, 10), "dup"), Seq("doc_id"), "left")
            .select(col("doc_id") +: (
              Seq("n_wchars", "top2", "top3", "top4", "dup5", "dup6", "dup7",
                "dup8", "dup9", "dup10").map(c => coalesce(col(c), lit(0L)).as(c))): _*)
            .orderBy(col("doc_id"))
        }),
        "arraydom" -> (() => graft.SparkEntry.queries("q_gopher_ngram")(spark, dir))),
      // cumulative-prefix profile of the BERT wwm chain: each variant's
      // time includes its prefix, so pairwise deltas are stage costs
      "bertprofile" -> Seq(
        "train" -> (() => {
          val m = WordPiece.trainAndVocab(
            graft.M5Queries.wpInjected(spark, dir), 8)._1
          m
        }),
        "nsp" -> (() => Curation.nspPairs(graft.M5Queries.nspInjected(spark, dir))),
        "examples" -> (() => {
          val vocab = WordPiece.trainAndVocab(
            graft.M5Queries.wpInjected(spark, dir), 8)._2
          WordPiece.bertExamples(
            Curation.nspPairs(graft.M5Queries.nspInjected(spark, dir)), vocab)
        }),
        "fullwwm" -> (() => graft.SparkEntry.queries("q_bert_wwm")(spark, dir))),
      // truncate_seq_pair: the aggregate-over-sequence HOF fold (the
      // pre-TruncTrimFold spelling, interpreted per trim step) vs the
      // native one-pass expression, on the q_bert_examples_trunc shape
      "truncfold" -> Seq(
        "hof" -> (() => {
          val train = graft.M5Queries.wpInjected(spark, dir)
          val vocab = WordPiece.trainAndVocab(train, 8)._2
          import org.apache.spark.sql.GraftColumnBridge.{toColumn, toExpression}
          def enc(c: String) = toColumn(graft.functions.WordPieceEncode(
            toExpression(col(c)), vocab, "[UNK]"))
          val pairs = Curation.nspPairs(graft.M5Queries.nspInjected(spark, dir))
          val staged0 = pairs.select(col("doc_id"), col("sent_idx"),
            col("is_next"), enc("a").as("ta"), enc("b").as("tb"))
          val la = size(col("ta")).cast("long")
          val lb = size(col("tb")).cast("long")
          val maxSeq = 16
          val n = greatest(lit(0L), la + lb + lit(3L) - lit(maxSeq.toLong))
          val zero = struct(lit(0L).as("fa"), lit(0L).as("ba"),
            lit(0L).as("fb"), lit(0L).as("bb"))
          def bump(acc: org.apache.spark.sql.Column, f: String) = struct(
            Seq("fa", "ba", "fb", "bb").map(k =>
              (if (k == f) acc(k) + 1L else acc(k)).as(k)): _*)
          val folded = when(n > 0, aggregate(sequence(lit(1L), n), zero,
            (acc, i) => {
              val cla = la - acc("fa") - acc("ba")
              val clb = lb - acc("fb") - acc("bb")
              val front = TextFunctions.rollingHash(
                concat_ws(":", col("doc_id"), col("sent_idx"), i)) % 2 === 0
              when(cla > clb,
                when(front, bump(acc, "fa")).otherwise(bump(acc, "ba")))
                .otherwise(when(front, bump(acc, "fb")).otherwise(bump(acc, "bb")))
            })).otherwise(zero)
          staged0.withColumn("_tr", folded)
            .select(col("doc_id"), col("sent_idx"), col("is_next"),
              slice(col("ta"), (col("_tr.fa") + 1).cast("int"),
                (la - col("_tr.fa") - col("_tr.ba")).cast("int")).as("ta"),
              slice(col("tb"), (col("_tr.fb") + 1).cast("int"),
                (lb - col("_tr.fb") - col("_tr.bb")).cast("int")).as("tb"))
            .select(col("doc_id"), col("sent_idx"), col("is_next"),
              (size(col("ta")) + 2).as("bnd"),
              posexplode(concat(array(lit("[CLS]")), col("ta"),
                array(lit("[SEP]")), col("tb"), array(lit("[SEP]"))))
                .as(Seq("pos0", "token")))
            .select(col("doc_id"), col("sent_idx"),
              (col("pos0") + 1).as("pos"), col("token"),
              when(col("pos0") + 1 <= col("bnd"), 0L).otherwise(1L)
                .as("token_type"),
              col("is_next"))
            .orderBy(col("doc_id"), col("sent_idx"), col("pos"))
        }),
        "native" -> (() =>
          graft.SparkEntry.queries("q_bert_examples_trunc")(spark, dir))),
      // finer cuts of the same chain: persist+vocab, then the mask
      // without the declared sort, then the sort (= fullwwm)
      "bertwwm2" -> Seq(
        "vocab" -> (() => {
          val train = graft.M5Queries.wpInjected(spark, dir)
          val vocab = WordPiece.trainAndVocab(train, 8)._2
          val ex = WordPiece.bertExamples(
            Curation.nspPairs(graft.M5Queries.nspInjected(spark, dir)), vocab)
          val st = SharedBranch.sharedBranch(ex.select(
            expr("doc_id * 1048576 + sent_idx").as("doc_id"),
            col("pos"), col("token")))
          SharedBranch.sharedBranch(Bpe.vocabulary(st))
            .crossJoin(st.groupBy().count())
        }),
        "mask" -> (() => {
          val train = graft.M5Queries.wpInjected(spark, dir)
          val vocab = WordPiece.trainAndVocab(train, 8)._2
          val ex = WordPiece.bertExamples(
            Curation.nspPairs(graft.M5Queries.nspInjected(spark, dir)), vocab)
          val st = SharedBranch.sharedBranch(ex.select(
            expr("doc_id * 1048576 + sent_idx").as("doc_id"),
            col("pos"), col("token")))
          WordPiece.wwmMask(st,
              SharedBranch.sharedBranch(Bpe.vocabulary(st)),
              specials = Seq("[CLS]", "[SEP]"))
            .select(expr("doc_id div 1048576").as("doc_id"),
              expr("CAST(doc_id % 1048576 AS INT)").as("sent_idx"),
              col("pos"), col("input_token"), col("label"), col("masked"))
        }),
        "sorted" -> (() => graft.SparkEntry.queries("q_bert_wwm")(spark, dir))),
      // plan-size hypothesis: the bert streams are ~10^5 rows, so the
      // mask segment's seconds must be DRIVER planning over the huge
      // persisted lineages, not data — localCheckpoint leaves vs
      // sharedBranch lineage on the identical chain
      "bertlineage" -> Seq(
        "shared" -> (() => graft.SparkEntry.queries("q_bert_wwm")(spark, dir)),
        "ckpt" -> (() => {
          val train = graft.M5Queries.wpInjected(spark, dir)
          val vocab = WordPiece.trainAndVocab(train, 8)._2
          val ex = WordPiece.bertExamples(
            Curation.nspPairs(graft.M5Queries.nspInjected(spark, dir)), vocab)
          val st = ex.select(
            expr("doc_id * 1048576 + sent_idx").as("doc_id"),
            col("pos"), col("token")).localCheckpoint()
          val v = Bpe.vocabulary(st).localCheckpoint()
          WordPiece.wwmMask(st, v, specials = Seq("[CLS]", "[SEP]"))
            .select(expr("doc_id div 1048576").as("doc_id"),
              expr("CAST(doc_id % 1048576 AS INT)").as("sent_idx"),
              col("pos"), col("input_token"), col("label"), col("masked"))
            .orderBy(col("doc_id"), col("sent_idx"), col("pos"))
        })),
      // WordPiece trainer round-shape experiment (round-19 continuation,
      // NEGATIVE result, change reverted): a fused single-exchange
      // roundCounts (pairs + marginals in one explode/agg, broadcast-
      // hinted score joins) measured min 2.67 / med 2.85 vs the two-agg
      // spelling's min 2.48 / med 2.86 over 8 paired rounds — the two
      // independent tiny aggregations overlap as parallel stages at 32
      // cores, so fusing them buys nothing locally and pays the
      // concat/struct-null explode overhead. Kept here as the probe that
      // produced that evidence: "twoagg" is the plain uncadenced loop,
      // "house" the shipped trainer (two aggs + fold-cadence cuts).
      "wptrain" -> Seq(
        "twoagg" -> (() => {
          val docs = graft.M5Queries.wpInjected(spark, dir)
          val w0 = col("word")
          val symsE = when(length(w0) > 1,
              concat(array(substring(w0, 1, 1)),
                transform(split(expr("substring(word, 2)"), ""),
                  c => concat(lit("##"), c))))
            .otherwise(array(w0))
          var words = docs
            .select(explode(TextFunctions.bertTokens(col("text"))).as("word"))
            .groupBy(w0).agg(count(lit(1)).as("cnt"))
            .select(w0, col("cnt"), symsE.as("syms")).localCheckpoint()
          def pairCounts(ws: DataFrame) = ws
            .select(col("cnt"),
              explode(zip_with(
                slice(col("syms"), lit(1), size(col("syms")) - 1),
                slice(col("syms"), lit(2), size(col("syms")) - 1),
                (a, b) => struct(a.as("l"), b.as("r")))).as("p"))
            .groupBy(col("p.l").as("l"), col("p.r").as("r"))
            .agg(sum(col("cnt")).as("c"))
          def symCounts(ws: DataFrame) = ws
            .select(col("cnt"), explode(col("syms")).as("sym"))
            .groupBy(col("sym")).agg(sum(col("cnt")).as("sc"))
          def wpFold(syms: org.apache.spark.sql.Column, l: String, r: String,
              fused: String) =
            aggregate(syms, array().cast("array<string>"), (acc, ch) =>
              when(size(acc) > 0 && element_at(acc, -1) === lit(l) && ch === lit(r),
                concat(slice(acc, lit(1), size(acc) - 1), array(lit(fused))))
                .otherwise(concat(acc, array(ch))))
          val merges = Seq.newBuilder[(Int, String, String, String, Long, Long)]
          for (rank <- 0 until 8) {
            val uc = symCounts(words)
            val top = pairCounts(words)
              .join(uc.select(col("sym").as("l"), col("sc").as("lc")), Seq("l"))
              .join(uc.select(col("sym").as("r"), col("sc").as("rc")), Seq("r"))
              .withColumn("score_q", expr(
                "CAST((CAST(c AS DECIMAL(20,0)) * CAST(1000000000000 AS DECIMAL(13,0))) " +
                  "div (CAST(lc AS DECIMAL(19,0)) * CAST(rc AS DECIMAL(19,0))) AS BIGINT)"))
              .orderBy(col("score_q").desc, col("l"), col("r"))
              .limit(1).collect()
            val row = top(0)
            val (l, r) = (row.getAs[String]("l"), row.getAs[String]("r"))
            val fused = l + (if (r.startsWith("##")) r.substring(2) else r)
            merges += ((rank, l, r, fused, row.getAs[Long]("c"),
              row.getAs[Long]("score_q")))
            if (rank < 7)
              words = words.withColumn("syms", wpFold(col("syms"), l, r, fused))
          }
          spark.createDataFrame(merges.result())
            .toDF("rank", "left", "right", "fused", "pair_count", "score_q")
        }),
        "house" -> (() => WordPiece.trainAndVocab(
          graft.M5Queries.wpInjected(spark, dir), 8)._1)),
      "wpwin" -> Seq(
        "encode" -> (() => {
          val vocab = WordPiece.trainAndVocab(
            graft.M5Queries.wpInjected(spark, dir), 8)._2
          WordPiece.encodeTokens(graft.M5Queries.wpScoreDocs(spark, dir), vocab)
        }),
        "fullwin" -> (() => graft.SparkEntry.queries("q_wp_windows")(spark, dir))),
      "berttensors" -> Seq(
        // old: re-attach token_type/is_next by a (doc_id, pos) self-join
        "rejoin" -> (() => {
          val train = graft.M5Queries.wpInjected(spark, dir)
          val vocab = WordPiece.trainAndVocab(train, 8)._2
          val ex = SharedBranch.sharedBranch(
            WordPiece.bertExamples(
                Curation.nspPairs(graft.M5Queries.nspInjected(spark, dir)), vocab,
                maxSeqLength = 16)
              .select(expr("doc_id * 1048576 + sent_idx").as("sid"),
                col("pos"), col("token"), col("token_type"), col("is_next")))
          val st = ex.select(col("sid").as("doc_id"), col("pos"), col("token"))
          val v = SharedBranch.sharedBranch(Bpe.vocabulary(st))
          Bpe.mlmMask(st, v,
              specials = Seq("[CLS]", "[SEP]"), maxPerSeq = 2)
            .join(broadcast(v.select(col("token").as("input_token"),
              col("token_id").as("_iid"))), Seq("input_token"), "left")
            .withColumn("input_id",
              when(col("input_token") === "[MASK]", lit(-1L))
                .otherwise(col("_iid")))
            .join(broadcast(v.select(col("token").as("label"),
              col("token_id").as("label_id"))), Seq("label"), "left")
            .join(ex.select(col("sid").as("doc_id"), col("pos"),
              col("token_type"), col("is_next")), Seq("doc_id", "pos"))
            .select(expr("doc_id div 1048576").as("doc_id"),
              expr("CAST(doc_id % 1048576 AS INT)").as("sent_idx"),
              col("pos"), col("input_id"), col("label_id"),
              col("token_type"), col("is_next"), col("masked"))
            .orderBy(col("doc_id"), col("sent_idx"), col("pos"))
        }),
        "carry" -> (() => graft.SparkEntry.queries("q_bert_tensors")(spark, dir))))
  }
}
