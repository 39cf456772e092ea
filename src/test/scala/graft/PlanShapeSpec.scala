package graft

import graft.functions.JsonPathFunctions
import org.apache.spark.sql.execution.exchange.Exchange
import org.scalatest.funsuite.AnyFunSuite

/** Physical-plan assertions — the 100 TB discipline checks (build brief:
  * "`.explain` the plan and iterate until it's the plan you'd want"):
  * filters reach the parquet scan, projections prune the read schema,
  * small dimensions broadcast, top-k never global-sorts, window reuses one
  * shuffle, and the routing core is shuffle-free.
  */
class PlanShapeSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  val sf = "/root/testdata/sf0.001"

  private def executed(name: String) =
    SparkEntry.queries(name)(spark, sf).queryExecution.executedPlan
  private def explained(name: String): String =
    executed(name).toString

  test("q_source_scan: filter pushed to parquet, read schema pruned") {
    val p = explained("q_source_scan")
    assert(p.contains("PushedFilters:") && p.contains("EqualTo(event_type,click)"),
      s"filter not pushed:\n$p")
    assert(p.contains("ReadSchema") && !p.contains("props"),
      "props should be pruned from the scan")
  }

  test("q_time_pushdown: the event-time range predicate reaches the parquet scan") {
    // the adapter discipline's other half: epochMicros computes on exact
    // integers, but RANGE PREDICATES must still compare the native column
    // (Tables.tsLiteral) or a year-slice of a 100 TB fact table reads
    // every row group
    val p = explained("q_time_pushdown")
    assert(p.contains("PushedFilters:") &&
      p.contains("GreaterThanOrEqual(l_shipdate") && p.contains("LessThan(l_shipdate"),
      s"shipdate range not pushed to the scan:\n$p")
  }

  test("q_join_revenue: customer dimension joins as broadcast") {
    val p = explained("q_join_revenue")
    assert(p.contains("BroadcastHashJoin"), s"expected broadcast join:\n$p")
  }

  test("q_hash_classifier: the weight table reaches the token stream as a broadcast") {
    // the model never shuffles; the corpus-sized exploded side joins it
    // map-side and shuffles once, on doc_id, for the per-doc sum
    val p = explained("q_hash_classifier")
    assert(p.contains("BroadcastHashJoin"), s"expected broadcast model join:\n$p")
  }

  test("no query plan contains an unpartitioned (single-partition) window") {
    // Round-2 verdict item: q_mixture_schedule funneled the corpus through
    // one WindowExec task. Every window in every query must now declare a
    // partitionSpec — the global mixture sequence is materialized via the
    // distributed zipWithIndex shape instead.
    // logical-plan check: AQE hides physical subtrees until execution
    import org.apache.spark.sql.catalyst.plans.logical.Window
    SparkEntry.queries.foreach { case (name, fn) =>
      val rogue = fn(spark, sf).queryExecution.optimizedPlan.collect {
        case w: Window if w.partitionSpec.isEmpty => w
      }
      assert(rogue.isEmpty, s"$name: unpartitioned window — all rows on one task")
    }
  }

  test("PrefixSum: both branches consume ONE materialized range partitioning") {
    // Round-3 advice (high): the running-sum branch and the totals branch
    // each re-executed repartitionByRange; RangePartitioner's sampled
    // bounds can then diverge between executions and silently corrupt the
    // offsets. The fix persists the ranged frame — the executed plan must
    // read it through InMemoryTableScan in BOTH branches and contain no
    // live RangePartitioning exchange outside the cached relation.
    import org.apache.spark.sql.functions._
    import org.apache.spark.sql.catalyst.plans.physical.RangePartitioning
    import org.apache.spark.sql.execution.columnar.InMemoryTableScanExec
    import org.apache.spark.sql.execution.exchange.ShuffleExchangeLike
    val df = graft.operators.PrefixSum.inclusive(
      graft.sources.Tables.load(spark, sf, "documents"),
      Seq(col("doc_id")), coalesce(length(col("text")), lit(0)), "run_chars")
    df.count() // materialize so AQE finalizes subtrees
    val plan = df.queryExecution.executedPlan
    def collectAll(p: org.apache.spark.sql.execution.SparkPlan): Seq[org.apache.spark.sql.execution.SparkPlan] =
      (p +: p.children.flatMap(collectAll)) ++ (p match {
        case a: org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec => collectAll(a.executedPlan)
        case q: org.apache.spark.sql.execution.adaptive.QueryStageExec => collectAll(q.plan)
        case _ => Seq.empty
      })
    val nodes = collectAll(plan)
    val cacheScans = nodes.collect { case s: InMemoryTableScanExec => s }
    assert(cacheScans.size >= 2,
      s"expected both branches to read the persisted ranged frame, saw ${cacheScans.size}:\n$plan")
    val liveRange = nodes.collect {
      case e: ShuffleExchangeLike if e.outputPartitioning.isInstanceOf[RangePartitioning] => e
    }
    assert(liveRange.isEmpty,
      s"live RangePartitioning exchange outside the cache — sampled bounds can diverge:\n$plan")
  }

  test("q_asof_join: sorted-union shape — the as-of match runs with NO join operator") {
    val p = explained("q_asof_join")
    assert(!p.contains("Join"), s"as-of should union+window, not probe-join:\n$p")
    assert(p.contains("Union") && p.contains("Window"), p)
  }

  test("q_bm25: document frequencies and totals reach the corpus as broadcasts") {
    val p = explained("q_bm25")
    assert(p.contains("BroadcastHashJoin"), s"expected broadcast df join:\n$p")
    assert(!p.contains("CartesianProduct"), p)
  }

  test("q_sort_topk: limit+sort fuses to TakeOrderedAndProject (no global sort)") {
    val p = explained("q_sort_topk")
    assert(p.contains("TakeOrderedAndProject"), s"expected top-k operator:\n$p")
  }

  test("q_sessionize: both windows + rollup share ONE shuffle on user_id") {
    val exchanges = executed("q_sessionize").collect { case e: Exchange => e }
    assert(exchanges.length <= 2, // scan-side repartition-free: window + final agg
      s"too many shuffles: ${exchanges.length}")
  }

  test("q_hop_window: one bounded explode, collapsed map-side before any shuffle") {
    // the hopping-window contract at 100 TB: the 2x row blow-up from the
    // window explode must die in the same stage it is born — a partial
    // aggregate below the first exchange — and the explode must appear
    // exactly once (factor size/hop, never compounded)
    val p = explained("q_hop_window")
    assert("Generate explode".r.findAllIn(p).length == 1,
      s"expected exactly one explode:\n$p")
    assert(p.contains("partial_count"), s"no map-side partial agg:\n$p")
    val exchanges = executed("q_hop_window").collect { case e: Exchange => e }
    assert(exchanges.length <= 3, // distinct-rewrite pair + orderBy range
      s"too many shuffles: ${exchanges.length}")
  }

  test("q_embed_ivfpq: the ADC stage reads the corpus only as (bucket, codes) — raw vectors reach the plan solely for the shortlist refine") {
    // the composed-index contract: the wide candidate stage must carry the
    // m-byte codes, never 64-dim vectors. Structurally: the optimized plan
    // joins the probed index on `bucket`, the ADC aggregation's input
    // carries `codes`-derived columns, and exactly one join touches the
    // raw `v` column (the refine fetch) plus one broadcast of query
    // vectors. We assert the refine boundary by column lineage: every
    // plan-side Aggregate over `adc` must not reference `v`.
    import org.apache.spark.sql.catalyst.plans.logical.Aggregate
    val df = SparkEntry.queries("q_embed_ivfpq")(spark, sf)
    val adcAggs = df.queryExecution.optimizedPlan.collect {
      case a: Aggregate if a.aggregateExpressions.exists(_.name == "adc") => a
    }
    assert(adcAggs.nonEmpty, "expected the ADC sum aggregation in the plan")
    adcAggs.foreach { a =>
      val inputCols = a.child.output.map(_.name).toSet
      assert(!inputCols.contains("v") && !inputCols.contains("qvec"),
        s"ADC stage must see codes only, saw: $inputCols")
    }
  }

  test("q_lm_score: vocab caps via TakeOrderedAndProject; bigram pre-agg reuses the doc_id window shuffle") {
    // the two SCALE.md claims for the LM: (a) the vocabulary cap is a
    // distributed top-k, never a global sort / single-partition window
    // over the unigram table; (b) the per-doc bigram aggregation adds NO
    // exchange after the lead() window (doc_id ⊆ grouping keys)
    import org.apache.spark.sql.execution.SparkPlan
    import org.apache.spark.sql.execution.TakeOrderedAndProjectExec
    import org.apache.spark.sql.execution.columnar.InMemoryTableScanExec
    import org.apache.spark.sql.execution.exchange.ShuffleExchangeLike
    import org.apache.spark.sql.execution.window.WindowExec
    val df = SparkEntry.queries("q_lm_score")(spark, sf)
    df.count() // materialize so AQE finalizes subtrees and caches fill
    def collectAll(p: SparkPlan): Seq[SparkPlan] =
      (p +: p.children.flatMap(collectAll)) ++ (p match {
        case a: org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec => collectAll(a.executedPlan)
        case q: org.apache.spark.sql.execution.adaptive.QueryStageExec => collectAll(q.plan)
        case _ => Seq.empty
      })
    val outer = collectAll(df.queryExecution.executedPlan)
    val cachedPlans = outer.collect { case s: InMemoryTableScanExec => s }
      .map(_.relation.cacheBuilder.cachedPlan).distinct
    val allNodes = outer ++ cachedPlans.flatMap(collectAll)
    assert(allNodes.exists(_.isInstanceOf[TakeOrderedAndProjectExec]),
      "vocabulary cap should plan as TakeOrderedAndProject")
    val biPlan = cachedPlans.map(collectAll)
      .filter(_.exists(_.isInstanceOf[WindowExec]))
    assert(biPlan.nonEmpty, "expected the bigram pre-agg shared branch in the plan")
    biPlan.foreach { nodes =>
      // count KEYED exchanges only: the round-robin input spread
      // (TextDedup.documents) folds into an InMemoryTableScan when an
      // earlier suite already cached the table, so counting it made the
      // assertion depend on suite ORDER — the claim under test is "one
      // hash exchange (the doc_id window), and the groupBy reuses it"
      val keyed = nodes.collect { case e: ShuffleExchangeLike => e }
        .filter(_.outputPartitioning
          .isInstanceOf[org.apache.spark.sql.catalyst.plans.physical.HashPartitioning])
      assert(keyed.size <= 1,
        s"bigram branch should hash-shuffle ONCE (the doc_id window): ${keyed.size}")
    }
    graft.sources.Tables.evictPinned(spark, blocking = true)
  }

  test("q_chunk_dedup_hashed: no ranking window; every string-keyed exchange is map-side combined or collision-bounded") {
    // the round-13 verdict's one weak component, fixed: the text-keyed
    // spelling ranks a window over raw chunk bodies (all copies of a
    // hot boilerplate chunk sort on one task); the hash spelling must
    // carry NO window at all, and any exchange still keyed on a string
    // must be either (a) a map-side-combined aggregation (one row per
    // distinct string per partition — the lineDedup countDistinct leg)
    // or (b) downstream of the broadcast collision filter (input ~empty
    // by construction). A bare string-keyed exchange — every copy
    // riding — is the funnel this pin forbids.
    import org.apache.spark.sql.catalyst.plans.physical.HashPartitioning
    import org.apache.spark.sql.execution.SparkPlan
    import org.apache.spark.sql.execution.aggregate.BaseAggregateExec
    import org.apache.spark.sql.execution.columnar.InMemoryTableScanExec
    import org.apache.spark.sql.execution.exchange.ShuffleExchangeLike
    import org.apache.spark.sql.execution.joins.BroadcastHashJoinExec
    import org.apache.spark.sql.execution.window.WindowExec
    import org.apache.spark.sql.types.StringType
    val df = SparkEntry.queries("q_chunk_dedup_hashed")(spark, sf)
    df.count() // materialize so AQE finalizes subtrees and caches fill
    def collectAll(p: SparkPlan): Seq[SparkPlan] =
      (p +: p.children.flatMap(collectAll)) ++ (p match {
        case a: org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec => collectAll(a.executedPlan)
        case q: org.apache.spark.sql.execution.adaptive.QueryStageExec => collectAll(q.plan)
        case _ => Seq.empty
      })
    val outer = collectAll(df.queryExecution.executedPlan)
    val cachedPlans = outer.collect { case s: InMemoryTableScanExec => s }
      .map(_.relation.cacheBuilder.cachedPlan).distinct
    val allNodes = outer ++ cachedPlans.flatMap(collectAll)
    assert(!allNodes.exists(_.isInstanceOf[WindowExec]),
      "the hash spelling must plan NO ranking window")
    val stringKeyed = allNodes.collect {
      case e: ShuffleExchangeLike if (e.outputPartitioning match {
        case h: HashPartitioning => h.expressions.exists(_.dataType == StringType)
        case _ => false
      }) => e
    }
    stringKeyed.foreach { e =>
      val below = collectAll(e)
      assert(below.exists(n =>
          n.isInstanceOf[BaseAggregateExec] || n.isInstanceOf[BroadcastHashJoinExec]),
        s"string-keyed exchange with neither a map-side partial aggregate nor" +
          s" the broadcast collision filter below it:\n$e")
    }
    graft.sources.Tables.evictPinned(spark, blocking = true)
  }

  test("routing core: zero exchanges, codegen present") {
    val plan = executed("q_route_dispatch")
    // ORDER BY in the verify projection adds a sort exchange; check the
    // un-sorted pipeline instead
    val core = graft.operators.EventsTx.routed(spark, sf).queryExecution.executedPlan
    assert(!core.exists(_.isInstanceOf[Exchange]), s"shuffle in routing core:\n$core")
    assert(core.exists(_.isInstanceOf[org.apache.spark.sql.execution.WholeStageCodegenExec]),
      s"codegen missing from routing plan:\n$core")
    assert(plan != null)
  }

  test("custom functions are SQL-registered and usable from spark.sql") {
    JsonPathFunctions.register(spark)
    val got = spark.sql(
      """SELECT json_path_exists('{"a":[{"k":5}]}', '$.a[?(@.k > 1)]') AS hit,
        |       json_path_exists('{"a":[{"k":5}]}', '$.nop') AS miss""".stripMargin)
      .collect().head
    assert(got.getBoolean(0) && !got.getBoolean(1))
    val sk = spark.sql(
      """SELECT jaccard_sim(minhash_sig(shingle_hashes('a b c d', 3), 4),
        |                   minhash_sig(shingle_hashes('a b c d', 3), 4)) AS self_sim""".stripMargin)
      .collect().head
    assert(sk.getDouble(0) == 1.0)
  }

  test("rules load from a YAML file path (reference: rules.path config)") {
    val f = java.nio.file.Files.createTempFile("rules", ".yaml")
    java.nio.file.Files.writeString(f,
      """rules:
        |  - name: "r1"
        |    topic: "t1"
        |    predicate: "$.a"
        |""".stripMargin)
    val r = graft.rules.TxDispatchRules.fromYamlFile(f.toString)
    assert(r.rules == Seq(graft.rules.DispatchRule("r1", "t1", "$.a")))
  }

  test("no cartesian product anywhere; nested-loop joins only in the pinned broadcast-bounded set") {
    // The 100 TB join discipline, enforced at the plan level across the
    // WHOLE query surface: a CartesianProductExec is never acceptable
    // (even the all-pairs oracle twins carry an equi key — lang — so
    // they plan as hash/sort-merge joins), and a
    // BroadcastNestedLoopJoin is acceptable ONLY as
    // crossJoin(broadcast(boundedFrame)) where the broadcast side is
    // driver-bounded metadata: the ≤10-row query set of the ANN family,
    // 1-row corpus totals (BM25/LM/quantile/mixture frames), or a
    // k-row codebook. Those queries are PINNED here: a new query that
    // plans a nested-loop join fails until it is consciously added,
    // with its broadcast side's bound, to this list.
    import org.apache.spark.sql.execution.SparkPlan
    import org.apache.spark.sql.execution.joins.{BroadcastNestedLoopJoinExec, CartesianProductExec}
    val bnljBounded: Set[String] = Set(
      "q_balanced_shards", // 1-row shard-count frame ×2
      "q_shard_manifest", // composes balancedShards' 1-row total frame
      "q_bm25", // 1-row corpus totals
      "q_embed_ivf_recall", "q_embed_ivfpq", "q_embed_ivfpq_append",
      "q_stream_index_ingest", // the append probe's plan over the stream-grown index
      "q_embed_ivfpq_retrained", // same probe plan as _indexed: ≤10-row query-vector set
      "q_embed_ivfpq_indexed", "q_embed_ivfpq_recall", "q_embed_pq",
      "q_embed_pq_recall", "q_embed_pq_refined", "q_embed_topk",
      "q_embed_jl_recall", // ≤5-row query-vector set, both spaces
      "q_embed_mrl_recall", // the same ≤5-row query set, full + prefix spaces
      "q_embed_mrl_recall_ordered", // ≤10-row query set ×3 spaces + 1-row hits frames
      "q_knn_graph_recall", "q_multimodal_ann", // ≤10-row query-vector set
      "q_curriculum", // 1-row total-count frame (epochShuffle's sibling)
      "q_session_concurrency", // boundary-sweep PrefixSum triangle
      "q_embedding_shift", // two 1-row snapshot-total frames
      "q_epoch_shuffle", // 1-row total-count frame
      "q_length_quantiles", // 1-row quantile-boundary frame
      "q_score_quantiles", // same quantile-boundary frame (classifier ∘ quantiles)
      "q_importance_weights", // 1-row target/raw feature-total frame
      "q_importance_selected", // same totals + 1-row doc-count frame + PrefixSum offsets
      "q_kn_model", "q_kn_score", // 1-row NN (distinct-bigram-count) frame
      "q_kn_modified", "q_kn_mod_discounts", // 1-row count-of-counts/discount frame
      "q_kn_trigram", // 1-row continuation-type-count (NN) frame
      "q_skipgram_pairs", // 1-row vocab-size frame (the negative-draw modulus)
      "q_neg_table", // PrefixSum offset triangle over the ≤8-row vocab table
      "q_skipgram_neg_unigram", // 1-row Σw34 frame + ≤8-row broadcast interval table + PrefixSum triangle
      "q_stream_skipgram_unigram", // same bounded frames inside the foreachBatch plan
      "q_word_subsample", // 1-row corpus-token-total frame
      "q_lm_score", // 1-row vocab totals
      "q_token_ppl", // same 1-row vocab-totals frame over the token stream
      "q_ppl_buckets", // the LM's 1-row vocab frame + the quantile rank triangle
      "q_ccnet_e2e", // the same LM vocab frame + tercile triangle over the langid survivors
      "q_ccnet_e2e_perlang", // the per-language tercile rank triangle (quantilesPerGroup's bounded frames; the LM tables themselves join by key)
      "q_stupid_backoff", // 1-row train-token-total (N) frame
      "q_quality_ensemble", // LM 1-row vocab totals + 3 PrefixSum offset triangles (≤nPart rows)
      "q_mixture_schedule", // 1-row per-source totals frame
      "q_mixture_budget", // weights' 1-row total + per-source PrefixSum triangle + |sources|-row base frame
      "q_mixture_weights", // 1-row sqrt-weight total frame
      "q_source_report", // composes mixtureWeights' 1-row total frame
      "q_pack_windows", "q_pipeline_e2e", // 1-row window/prefix totals
      "q_pretrain_e2e", // windowing PrefixSum triangle + 1-row window-count frame
      "q_length_pack", "q_length_pack_fill", // bucket-rank PrefixSum triangle + ≤10-row offset frame
      "q_token_shift", // two 1-row snapshot-total frames
      "q_tfidf_topterms", // 1-row doc-count frame
      "q_bpe_vocab", // PrefixSum offset triangle (≤nPart rows) over the vocab rank
      "q_oov_rate", // same vocab-rank triangle (train-half vocabulary freeze)
      "q_bpe_token_ids", // same vocab-rank triangle (the id join itself broadcasts hash-keyed)
      "q_token_windows", // PrefixSum offset triangle for the global token position
      "q_token_windows_strided", // same global-position triangle (bounded explode on top)
      "q_window_segments", // same global-position triangle (segment ids on top)
      "q_unigram_windows", // same global-position PrefixSum triangle over the piece stream
      "q_unigram_vocab", // PrefixSum offset triangle over the substring-vocab rank
      "q_unigram_meta_vocab", // same seed-rank triangle over the ▁-word table
      "q_unigram_meta_encode", "q_unigram_meta_roundtrip", // seed triangle feeding the model freeze
      "q_unigram_meta_train", "q_unigram_meta_train_encode", // trainer triangles over the ▁-word table
      "q_unigram_prune", // two vocab-rank triangles (seed rank + usage drop-K rank)
      "q_unigram_prune_soft", // same seed-rank + drop-K rank triangles, usage from the soft E-step
      "q_unigram_train", // seed-rank triangle + one drop-K rank triangle per EM round
      "q_unigram_train_soft", // same trainer triangles (usage from the soft E-step)
      "q_unigram_train_encode", // same trainer triangles (the encode tail is narrow)
      "q_unigram_token_ids", // piece-vocab-rank triangle (the id join itself broadcasts hash-keyed)
      "q_bpe_windows_batched", // global-token-position PrefixSum triangle (windowing tail)
      "q_bpe_bytes_windows", // same windowing triangle over the byte-unit token stream
      "q_bpe_pretok_windows", // same windowing triangle over the pre-split byte-unit stream
      "q_unigram_prune_loss", // seed-rank triangle + loss drop-K rank triangle
      "q_wp_windows", // global-token-position PrefixSum triangle over the WordPiece stream
      "q_mlm_mask", // vocab-rank PrefixSum triangle + 1-row vocab-size frame
      "q_nsp_pairs", // doc-index PrefixSum triangle + 1-row n_docs frame
      "q_wp_windows_batched", // the same windowing triangle over the batched-trained stream
      "q_bert_examples", // NSP's doc-index PrefixSum triangle + 1-row n_docs frame underneath
      "q_bert_examples_trunc", // same NSP triangles (the trim fold itself is narrow)
      "q_bert_mlm", // same NSP triangles + vocab-rank triangle + 1-row vocab-size frame
      "q_bert_mlm_capped", // same frames (the cap windows are doc-partitioned, no new join)
      "q_bert_wwm", // same NSP triangles + vocab-rank triangle + 1-row vocab-size frame
      "q_bert_tensors", // same frames (the id lookups broadcast hash-keyed)
      "q_rtd_corrupt", // vocab-rank PrefixSum triangle + 1-row vocab-size frame
      "q_wwm_mask", // vocab-rank PrefixSum triangle + 1-row vocab-size frame
      "q_wwm_mask_capped", // same frames (the budget scan joins doc-keyed, hash not BNLJ)
      "q_mlm_mask_epochs", // q_mlm_mask's frames, one copy per epoch branch
      "q_key_skew") // 1-row (nk, total) totals frame broadcast onto the top-k keys
    def collectAll(p: SparkPlan): Seq[SparkPlan] =
      (p +: p.children.flatMap(collectAll)) ++ (p match {
        case a: org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec => collectAll(a.executedPlan)
        case q: org.apache.spark.sql.execution.adaptive.QueryStageExec => collectAll(q.plan)
        case _ => Seq.empty
      })
    SparkEntry.queries.toSeq.sortBy(_._1).foreach { case (name, fn) =>
      val nodes = collectAll(fn(spark, sf).queryExecution.executedPlan)
      assert(!nodes.exists(_.isInstanceOf[CartesianProductExec]),
        s"$name: CartesianProductExec in the plan — an unkeyed join reached execution")
      if (nodes.exists(_.isInstanceOf[BroadcastNestedLoopJoinExec]))
        assert(bnljBounded(name),
          s"$name: BroadcastNestedLoopJoin not in the pinned broadcast-bounded set — " +
            "if the broadcast side is driver-bounded metadata, add it here with its bound")
    }
  }
}
