package graft.tools

import org.apache.spark.sql.SparkSession

/** Prices the BPE APPLY path as the merge table deepens — the measured
  * form of the Bpe.scala claim that the chained-fold spelling
  * ([[graft.operators.Bpe.segmentStats]], one `transform` HOF per
  * merge, expression tree linear in the table) is plan-inflating at
  * the batched trainer's ~120 merges and unusable at a production 32k,
  * while the reference-object expression
  * ([[graft.operators.Bpe.segmentStatsFrozen]], ONE plan node at any
  * depth) stays flat.
  *
  * The synthetic table is deterministic (seeded) pairs over the corpus
  * alphabet plus fused prefixes, so a fraction of merges actually fire;
  * both spellings apply the SAME table over the SAME corpus, so the
  * comparison isolates plan-size cost (analysis + codegen + per-row
  * interpretation of the HOF chain) from per-row merge work (O(depth ×
  * word length) in BOTH spellings by construction).
  *
  * Output: one JSON line, per-depth wall seconds for each spelling
  * (noop write, single pass after a shared warm read), with a fold
  * cutoff — depths past `foldCutoffS` are skipped for the fold spelling
  * (recorded as -1.0) so one pathological plan doesn't eat the session.
  */
object FoldDepthBench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val depths = args.headOption.map(_.split(",").map(_.toInt).toSeq)
      .getOrElse(Seq(8, 64, 256, 1024, 4096))
    val foldCutoffS = sys.env.getOrElse("SPARK_GRAFT_FOLD_CUTOFF_S", "180").toDouble
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    graft.sources.Tables.preload(spark, sfDir)
    val docs = graft.operators.TextDedup.documents(spark, sfDir)

    // deterministic synthetic table: single chars and fused runs as
    // left symbols so early merges create symbols later merges consume
    // (the real trainer's chaining shape); seeded — reproducible
    def table(depth: Int): Seq[(String, String)] = {
      val rnd = new scala.util.Random(42)
      val alpha = "etaoinshrdlucmfwypvbgkjqxz"
      (0 until depth).map { _ =>
        val l = (0 to rnd.nextInt(2)).map(_ => alpha(rnd.nextInt(alpha.length))).mkString
        val r = alpha(rnd.nextInt(alpha.length)).toString
        (l, r)
      }
    }

    def time(f: => Unit): Double = {
      val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
    }
    // the fold spelling is measured twice per depth: under DEFAULT
    // analyzer confs (where its nested-HOF tree trips the resolution
    // iteration cap past a few dozen merges — a hard analyzer failure,
    // not slowness), and with spark.sql.analyzer.maxIterations raised
    // so the actual planning+execution cost past the default ceiling
    // is a number, not a crash
    def tryFold(tbl: Seq[(String, String)]): (Double, String) =
      try {
        val t = time {
          graft.operators.Bpe.segmentStats(docs, tbl)
            .write.mode("overwrite").format("noop").save()
        }
        (t, "")
      } catch {
        case e: Throwable => (-2.0, Option(e.getMessage).getOrElse(e.getClass.getName).take(120))
      }
    var foldDead = false
    val rows = depths.map { d =>
      val tbl = table(d)
      val frozen = time {
        graft.operators.Bpe.segmentStatsFrozen(docs, tbl)
          .write.mode("overwrite").format("noop").save()
      }
      val (fold, foldErr) =
        if (foldDead) (-1.0, "") else tryFold(tbl)
      val (foldRaised, foldRaisedErr) =
        if (foldDead) (-1.0, "")
        else if (fold >= 0) (fold, "") // default confs sufficed
        else {
          spark.conf.set("spark.sql.analyzer.maxIterations", "100000")
          try tryFold(tbl)
          finally spark.conf.unset("spark.sql.analyzer.maxIterations")
        }
      if (fold > foldCutoffS || foldRaised > foldCutoffS || (fold < 0 && foldRaised < 0 && !foldDead))
        foldDead = true
      System.err.println(f"[folddepth] depth=$d frozen=$frozen%.2f fold=$fold%.2f raised=$foldRaised%.2f $foldErr")
      (d, frozen, fold, foldErr, foldRaised, foldRaisedErr)
    }
    def fmt(v: Double) = f"$v%.3f"
    def q(s: String) = "\"" + s.replace("\\", "\\\\").replace("\"", "\\\"").replaceAll("[\\n\\r\\t]", " ") + "\""
    println(rows.map { case (d, fr, fo, fe, rz, re) =>
      s""""$d":{"frozen_s":${fmt(fr)},"fold_s":${fmt(fo)},"fold_err":${q(fe)},"fold_raised_iter_s":${fmt(rz)},"fold_raised_err":${q(re)}}"""
    }.mkString(s"""{"metric":"bpe_apply_depth","sf":"$sfDir","fold_cutoff_s":$foldCutoffS,"depths":{""", ",", "}}"))
    graft.sources.Tables.evict(spark)
    spark.stop()
  }
}
