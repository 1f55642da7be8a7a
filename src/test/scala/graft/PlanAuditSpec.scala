package graft

import org.scalatest.funsuite.AnyFunSuite

/** Plan-quality regression net: pins the physical-plan properties the
  * 100 TB posture depends on (SURVEY.md §4), so a refactor that
  * silently drops a pushdown, un-broadcasts a dimension join, or
  * introduces an all-pairs join fails CI instead of shipping.
  * Plans are compiled against sf0.001; nothing here asserts timings.
  */
class PlanAuditSpec extends AnyFunSuite {
  import TestSession._

  private def planOf(name: String): String =
    SparkEntry.queries(name)(spark, sf).queryExecution.executedPlan.toString

  test("no CartesianProduct anywhere in the query inventory") {
    // every pair-generating operator must join on a bucket/band/key;
    // an unkeyed cartesian is the one shape that cannot scale
    val offenders = SparkEntry.queries.keys.toSeq.sorted
      .filter(name => planOf(name).contains("CartesianProduct"))
    assert(offenders.isEmpty, s"cartesian products in: $offenders")
  }

  test("q6 pushes its range filter and prunes columns at the scan") {
    val p = planOf("q6_filter_agg")
    assert("PushedFilters: \\[[^\\]]*l_shipdate".r.findFirstIn(p).isDefined,
      "l_shipdate filter not pushed to parquet")
    assert("ReadSchema: [^\\n]*l_quantity".r.findFirstIn(p).isDefined)
    // the 11-column table must not be read in full
    assert(!p.contains("l_comment"), "scan reads unprojected columns")
  }

  test("q5 star join broadcasts its dimension tables") {
    val p = planOf("q5_join5")
    val bhj = "BroadcastHashJoin".r.findAllIn(p).size
    assert(bhj >= 4, s"expected >=4 broadcast joins, found $bhj")
    assert(!p.contains("SortMergeJoin"), "dimension join fell back to SMJ")
  }

  test("top-k queries plan TakeOrderedAndProject, not a global sort") {
    Seq("q3_topk", "text_topterms", "q14_sort_limit").foreach { name =>
      val p = planOf(name)
      assert(p.contains("TakeOrderedAndProject"), s"$name plans a global sort:\n${p.take(400)}")
    }
  }

  test("ANN ranking is a bounded partial aggregate, not a window") {
    val p = planOf("sim_topk_bruteforce")
    assert(p.contains("partial_topkaggregator"),
      "brute-force top-k lost its map-side partial aggregation")
    assert(p.toLowerCase.contains("dotproduct"),
      "vector scoring not using the codegen'd DotProduct kernel")
  }

  test("aggregations keep map-side partial aggregation") {
    Seq("q1_agg", "text_topterms", "dedup_exact").foreach { name =>
      val p = planOf(name)
      assert(p.contains("partial_"), s"$name lost partial aggregation")
    }
  }

  test("BPE tokenization joins occurrences to a broadcast vocabulary") {
    // the vocab side is vocabulary-sized (sublinear in corpus) — if it
    // ever becomes a sort-merge join, tokenization shuffles the corpus
    val p = planOf("text_tokencount_bpe")
    assert(p.contains("BroadcastHashJoin"), "vocab join not broadcast")
    assert(p.contains("partial_"), "per-doc token sum lost partial aggregation")
  }

  test("pack planning windows partition by shard, never globally") {
    Seq("pipeline_pack_sequences", "pipeline_pack_bins").foreach { name =>
      val p = planOf(name)
      // a Window over [source] is per-shard parallel; an empty
      // partition spec would funnel the corpus through one task
      assert("Window .*partitionBy".r.findFirstIn(p).isEmpty ||
        p.contains("source"), s"$name window lost its shard partitioning")
      assert(!p.contains("SinglePartition"),
        s"$name plans a single-partition (global) exchange:\n${p.take(600)}")
    }
  }

  test("KMV sketches rank via bounded partial TopK, not a window") {
    val p = planOf("sketch_kmv_merge")
    assert(p.contains("partial_topkaggregator"),
      "per-shard k-min sets lost the bounded partial aggregation")
  }

  test("cross-shard dedup broadcasts the shard-priority table") {
    val p = planOf("dedup_crossshard")
    assert(p.contains("BroadcastHashJoin"), "priority join not broadcast")
  }

  test("bloom keep-list prunes the corpus map-side before the exact semi-join") {
    val p = planOf("pipeline_keep_bloom")
    assert(p.contains("might_contain"), "bloom pre-filter missing from the plan")
  }

  test("OOV-rate vocabulary membership join is broadcast") {
    // vocab is bounded (top-512) — a sort-merge join here would
    // shuffle every token of the corpus
    val p = planOf("text_oov_rate")
    assert(p.contains("BroadcastHashJoin"), "vocab join not broadcast")
    assert(p.contains("TakeOrderedAndProject"), "vocab limit lost bounded top-k")
  }

  test("halo grid ops never window over the data after grid construction") {
    // tableToGrid's one range-sort is inherent to building the demo
    // grid; the halo operators themselves must add joins, not windows
    Seq("grid_rolling_mean", "grid_interpolate", "grid_lag_diff").foreach { name =>
      val p = planOf(name)
      assert(!p.contains("RunningWindowFunction"),
        s"$name plans a running window over the variable")
    }
  }

  test("incremental dedup splits band sides with broadcast semi/anti joins") {
    val p = planOf("dedup_incremental")
    assert(p.contains("BroadcastHashJoin"), "new-shard id joins not broadcast")
  }

  test("source-index grid construction needs no global sort") {
    // the whole point vs tableToGrid: the stream index comes from the
    // data, so the read-side plan must hash-shuffle only
    val p = planOf("grid_from_source_index")
    assert(!p.toLowerCase.contains("rangepartitioning"),
      "grid_from_source_index plans a global range sort")
    assert(p.contains("partial_"), "chunk aggregation lost its partial phase")
  }

  test("CMS probes rank via TakeOrderedAndProject and join the broadcast sketch") {
    val p = planOf("sketch_cms")
    assert(p.contains("TakeOrderedAndProject"),
      "probe selection plans a global sort")
    assert(p.contains("BroadcastHashJoin"), "sketch lookup not broadcast")
    assert(p.contains("partial_"), "sketch build lost map-side combine")
  }

  test("quality-decile bucketing never range-shuffles the corpus") {
    // the ntile() formulation would plan a rangepartitioning exchange
    // over every row; the histogram-boundary formulation must not
    val p = planOf("pipeline_quality_buckets")
    assert(!p.toLowerCase.contains("rangepartitioning"),
      "quality bucketing plans a corpus-wide range sort")
    assert(p.contains("partial_"), "bucket stats lost partial aggregation")
  }

  test("knn graph ranks neighbors via the bounded TopK aggregate") {
    // dedup_knn_clusters' own final plan is a checkpointed-RDD scan
    // (the CC loop truncates lineage by design), and sim_knn_graph
    // itself reads the session-staged artifact since r16 — so the
    // bounded-edge property is pinned on the INDEX BUILD query
    spark.sharedState.cacheManager.clearCache()
    val p = graft.operators.Similarity.knnGraphBuild(spark, sf)
      .queryExecution.executedPlan.toString
    assert(p.contains("partial_topkaggregator"),
      "k-NN edge ranking lost its bounded partial aggregation")
  }

  test("grid construction is sort-free for every halo/grid consumer (r6)") {
    // the shared qtyGrid base routes through the staged source index:
    // one hash shuffle on chunk_idx, never a corpus range sort — the
    // fix for the only perf soft spot standing through verdicts r3-r5
    Seq("grid_table_to_grid", "grid_interpolate", "grid_rolling_mean",
      "grid_fill_forward", "grid_lag_diff").foreach { name =>
      val p = planOf(name)
      assert(!p.toLowerCase.contains("rangepartitioning"),
        s"$name re-pays the range sort at query time")
      assert(p.contains("partial_"), s"$name lost map-side combine")
    }
  }

  test("boilerplate scrub joins the broadcast boilerplate set, not a shuffle") {
    val p = planOf("text_segment_dedup")
    assert(p.contains("BroadcastHashJoin"), "boilerplate-set join not broadcast")
    assert(p.contains("partial_"), "segment df count lost map-side combine")
  }

  test("sample plan broadcasts weights and boundaries; corpus stays map-side") {
    Seq("pipeline_sample_plan", "pipeline_token_budget").foreach { name =>
      val p = planOf(name)
      assert(p.contains("partial_"), s"$name lost partial aggregation")
      assert(!p.toLowerCase.contains("rangepartitioning"),
        s"$name plans a corpus-wide range sort")
    }
    // the per-(source,decile) membership test must see broadcast sides
    assert(planOf("pipeline_sample_plan").contains("BroadcastHashJoin")
      || planOf("pipeline_sample_plan").contains("BroadcastNestedLoopJoin"),
      "weight/boundary join not broadcast")
  }

  test("climatology broadcasts the 24-row phase table") {
    val p = planOf("grid_climatology")
    assert(p.contains("BroadcastHashJoin"), "climatology join not broadcast")
  }

  test("MIPS top-k is a bounded partial aggregate over broadcast queries") {
    val p = planOf("sim_mips_topk")
    assert(p.contains("partial_topkaggregator"),
      "MIPS ranking lost its bounded partial aggregation")
    assert(p.toLowerCase.contains("dotproduct"),
      "MIPS scoring not using the codegen'd DotProduct kernel")
  }

  test("funnel and retention stay on one user_id shuffle key, no cartesian") {
    Seq("q32_funnel", "q33_retention").foreach { name =>
      val p = planOf(name)
      assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"),
        s"$name plans an unkeyed join")
      assert(p.contains("partial_"), s"$name lost partial aggregation")
    }
  }

  test("gopher rule bits are a pure map-side projection — zero exchanges") {
    val p = planOf("text_gopher_rules")
    assert(!p.contains("Exchange"),
      s"the rule battery should never shuffle:\n${p.take(600)}")
  }

  test("PII-density report shuffles exactly once (the source groupBy)") {
    val p = planOf("pipeline_pii_rate")
    assert("Exchange".r.findAllIn(p).size == 1,
      s"expected exactly one exchange:\n${p.take(600)}")
    assert(p.contains("partial_"), "per-source counts lost partial aggregation")
  }

  test("DSIR scores via a broadcast dictionary and bounded top-k selection") {
    val p = planOf("pipeline_dsir")
    assert(p.contains("BroadcastHashJoin"), "256-row λ dict join not broadcast")
    assert(p.contains("TakeOrderedAndProject"),
      "top-50 selection plans a global sort")
    assert(p.contains("partial_"), "per-doc rollup lost partial aggregation")
  }

  test("NB classifier scores via broadcast weights; prior is a broadcast scalar") {
    val p = planOf("pipeline_nb_classifier")
    assert(p.contains("BroadcastHashJoin"), "weight dict join not broadcast")
    assert(p.contains("partial_"), "per-doc rollup lost partial aggregation")
    assert(!p.contains("CartesianProduct"), "prior attach went cartesian")
  }

  test("CCNet bucketing never range-shuffles the corpus") {
    // cutoffs come from the per-(lang,key) histogram; the corpus is
    // assigned by equi-join — an ntile() formulation would plan a
    // rangepartitioning exchange over every row
    val p = planOf("pipeline_ccnet_buckets")
    assert(!p.toLowerCase.contains("rangepartitioning"),
      "bucketing plans a corpus-wide range sort")
    assert(p.contains("partial_"), "ledger lost partial aggregation")
  }

  test("Zipf fit sorts vocabulary partitions only, never the corpus globally") {
    val p = planOf("text_zipf_fit")
    assert(!p.toLowerCase.contains("rangepartitioning"),
      "ranking plans a global range sort")
    assert(p.contains("partial_"), "moment sums lost partial aggregation")
  }

  test("canonical election is a max(struct) partial agg, not a window") {
    val p = planOf("dedup_canonical_quality")
    assert(!p.contains("Window"),
      s"election must be the max(struct) partial aggregate:\n${p.take(600)}")
    assert(p.contains("partial_"), "election lost map-side combine")
  }

  test("decontamination ledger joins the broadcast flagged list") {
    val p = planOf("pipeline_decontaminate")
    assert(p.contains("BroadcastHashJoin"), "flagged-doc join not broadcast")
    assert(p.contains("partial_"), "ledger lost partial aggregation")
  }

  test("fertility and langid confusion stay partial-agg'd with broadcast sides") {
    Seq("text_bpe_fertility", "text_langid_confusion").foreach { name =>
      val p = planOf(name)
      assert(p.contains("partial_"), s"$name lost partial aggregation")
      assert(p.contains("BroadcastHashJoin"), s"$name dictionary join not broadcast")
    }
  }

  test("span-removal keep-first election is a min(struct) partial agg, not a per-hash window") {
    // a row_number over PARTITION BY h sorts every occurrence of a
    // boilerplate span (10^6-10^8 repeats in real crawls) in one
    // reducer; the min(struct(doc_id,pos)) election combines map-side.
    // The only windows left must be the per-doc islands merge.
    val p = planOf("pipeline_span_removal")
    assert(!p.contains("row_number"),
      s"keep-first election regressed to a per-hash row_number window:\n${p.take(600)}")
    assert(p.contains("partial_"), "election lost map-side combine")
  }

  test("novelty df pass and median histogram keep map-side partial aggregation") {
    Seq("text_novelty", "text_unigram_entropy", "q38_median").foreach { name =>
      val p = planOf(name)
      assert(p.contains("partial_"), s"$name lost partial aggregation")
    }
    // the median's cumulative window walks the <=50-row value
    // histogram behind a hash exchange — never a range shuffle of the
    // corpus rows, and the histogram partial-aggregates before it
    val pm = planOf("q38_median")
    assert(!pm.toLowerCase.contains("rangepartitioning"),
      "median plans a corpus range shuffle")
    assert(pm.contains("partial_count"),
      "histogram rows reach the window un-aggregated")
  }

  test("centroid purity assigns via min_by partial agg, no corpus window") {
    val p = planOf("sim_centroid_purity")
    assert(!p.contains("Window"),
      s"assignment must be the min_by partial aggregate, not a window:\n${p.take(600)}")
    assert(p.contains("BroadcastHashJoin") || p.contains("BroadcastExchange"),
      "centroid join not broadcast")
  }

  test("JS drift broadcasts its totals and keeps partial aggregation") {
    // the (source, word) count pass must partial-agg map-side, the
    // vocab-sized totals and metadata-sized masses must broadcast —
    // a sort-merge join here would shuffle the corpus twice
    val p = planOf("text_js_drift")
    assert(p.contains("partial_"), "word-count pass lost partial aggregation")
    assert(p.contains("BroadcastHashJoin"), "totals/mass joins not broadcast")
    assert(!p.contains("Window"), "drift must not plan any window")
  }

  test("attrition funnel elects canonicals with partial aggs, no windows") {
    val p = planOf("pipeline_dedup_attrition")
    assert(!p.contains("Window"),
      s"stage elections must be min() partial aggs, not windows:\n${p.take(600)}")
    assert(p.contains("partial_min"), "canonical election lost partial agg")
  }

  test("zonal stats joins chunk-aligned grids and aggregates partially") {
    val p = planOf("grid_zonal_stats")
    assert(!p.toLowerCase.contains("rangepartitioning"),
      "zonal alignment must reuse the chunk key, not a range shuffle")
    assert(p.contains("partial_"), "zone rollup lost partial aggregation")
    assert(!p.contains("CartesianProduct"))
  }

  test("ntile windows partition by nation, never globally") {
    val p = planOf("q39_ntile")
    assert(!p.contains("SinglePartition"),
      s"decile window plans a global single-partition sort:\n${p.take(600)}")
    assert(p.contains("c_nationkey"), "window lost its nation partitioning")
  }

  test("proto-prune windows only over histograms or cut-value ties, never a raw cell") {
    // r13 (r12 verdict #1): the top-quarter cut must come from the
    // per-cell value histogram of round(pcos,6) — a window whose input
    // is the UNAGGREGATED assignment would sort corpus/NCENTS rows in
    // one reducer at 100 TB. Every Window's subtree must therefore
    // contain either the (cell, p6) histogram partial aggregate or the
    // cut-equality tie filter (whose partition is tie-bounded).
    // collect on sparkPlan: executedPlan is an opaque AdaptiveSparkPlanExec
    val qe = SparkEntry.queries("pipeline_proto_prune")(spark, sf).queryExecution
    val windows = qe.sparkPlan.collect {
      case w: org.apache.spark.sql.execution.window.WindowExec => w
    }
    assert(windows.nonEmpty, "expected the histogram walk + tie windows")
    windows.foreach { w =>
      val sub = w.child.toString
      assert(sub.contains("partial_count") || sub.contains("cut_p6"),
        s"window input is neither a histogram nor the tie set:\n${sub.take(600)}")
    }
    assert(qe.executedPlan.toString.contains("BroadcastHashJoin"),
      "per-cell cut/size tables must broadcast back to the corpus")
  }

  test("ANN cascade ranks all three stages via bounded TopK partial aggregates") {
    val p = planOf("sim_ann_cascade")
    val topks = "partial_topkaggregator".r.findAllIn(p).size
    assert(topks >= 3, s"expected 3 bounded TopK stages, found $topks")
    assert(p.contains("BroadcastHashJoin"), "query/stats sides not broadcast")
    assert(!p.contains("row_number"), "a cascade stage regressed to a window rank")
  }

  test("chunker plans zero exchanges — entirely map-side") {
    val p = planOf("pipeline_chunk_overlap")
    assert(!p.contains("Exchange"),
      s"chunking must not shuffle:\n${p.take(600)}")
  }

  test("tfidf top-k has no window; per-doc selection is a bounded collect") {
    val p = planOf("text_tfidf_topk")
    assert(!p.contains("Window"),
      "per-doc top-k regressed to a corpus window partition")
    assert(p.contains("partial_"), "tf/df passes lost partial aggregation")
  }

  test("tfidf scores from the staged tf artifact — no corpus re-tokenize (r14)") {
    // r13 verdict #2: scoring and the idf dict each tokenized the
    // corpus (two full scans+aggs). The per-query plan must now read
    // ONLY the staged artifacts; the one corpus tokenize happens at
    // artifact build (staging_sec's line item), never per query.
    val p = planOf("text_tfidf_topk")
    assert(!p.contains("documents.parquet"), "tfidf re-scans the corpus per query")
    assert(p.contains("tfidf_tf"), "tf must come from the staged artifact")
    assert(p.contains("tfidf_idf"), "idf must come from the staged artifact")
  }

  test("unicode token accounting is map-side only (r14)") {
    val p = planOf("text_tokens_unicode")
    assert(!p.contains("Exchange"),
      s"per-doc token stats must not shuffle:\n${p.take(600)}")
    assert(!p.contains("Generate"), "array stats must not explode tokens")
  }

  test("degree histogram and explain ledger never window") {
    Seq("dedup_degree_hist", "dedup_explain").foreach { name =>
      val p = planOf(name)
      assert(!p.contains("Window"), s"$name plans a window")
      assert(p.contains("partial_"), s"$name lost partial aggregation")
    }
  }

  test("moment sketch partial-aggregates its power sums map-side") {
    val p = planOf("sketch_moments")
    assert(p.contains("partial_"), "power sums reach the shuffle un-aggregated")
    assert(!p.contains("Window"))
  }

  test("bloom FPR keeps the bit array broadcast-joined") {
    // the position set is m-bounded (<=65536 rows) — the probe-side
    // membership check must be a broadcast, never a shuffle of probes
    val p = planOf("sketch_bloom_fpr")
    assert(p.contains("BroadcastHashJoin"), "bit-array join not broadcast")
  }

  test("source quota: one corpus histogram, broadcast tie pass, tie-bounded window (r15)") {
    val p = planOf("pipeline_source_quota")
    // the tie-group doc pass must be the deliberate broadcast — a
    // shuffled corpus-vs-tie-keys join would re-shuffle the corpus
    assert(p.contains("BroadcastHashJoin"), "tie-key join not broadcast")
    // three windows, all KEYED (the histogram counts-from-above twice
    // — it feeds base and tieKeys — plus the tie rank): none may
    // funnel through a single partition, which is what a global
    // window or an unkeyed sort would plan
    assert("Window".r.findAllIn(p).size <= 3, s"unexpected extra windows")
    assert(!p.contains("SinglePartition"), "a window funnels through one partition")
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"))
    // the histogram aggregation partial-aggregates map-side
    assert(p.contains("partial_"), "histogram lost partial aggregation")
  }

  test("heaps fit: broadcast-only joins, windows only over the 10-row grid (r15b)") {
    val p = planOf("text_heaps_fit")
    // every join is either a keyed broadcast (grid assembly) or a
    // deliberate 1-row broadcast cross (bounds, fit) — a SortMergeJoin
    // or ShuffledHashJoin here would mean a corpus-sized side got
    // shuffled for what the operator promises are metadata joins
    assert(!p.contains("SortMergeJoin") && !p.contains("ShuffledHashJoin"),
      "heaps fit shuffled a join side")
    assert(!p.contains("CartesianProduct"))
    // the cumulative windows (output branch + fit branch) read the
    // CACHED 10-row grid — corpus passes must not sit above a window
    assert("Window".r.findAllIn(p).size <= 2, "unexpected extra windows")
    assert(p.contains("InMemoryTableScan"),
      "the 10-row grid lost its cache — both branches re-run the corpus passes")
    // doc/inventory aggregations partial-aggregate map-side
    assert(p.contains("partial_"), "histogram lost partial aggregation")
  }

  test("nb calibration: windowless equal-width banding, broadcast model (r15b)") {
    val p = planOf("pipeline_nb_calibration")
    // equal-width bands need only the (lo, span) extremes: banding is
    // map-side arithmetic against a 1-row broadcast — a window (the
    // ntile shape) or any sort here would globally sort the eval set
    assert(!p.contains("Window"), "banding regressed to a sorted window")
    assert(!p.contains("SortMergeJoin") && !p.contains("ShuffledHashJoin"),
      "model/score joins must be broadcast")
    assert(!p.contains("CartesianProduct"))
    assert(p.contains("BroadcastHashJoin"), "weight-dict join not broadcast")
    assert(p.contains("partial_"), "scoring lost partial aggregation")
  }

  test("unicode segment scrub plans the same shape as the ASCII twin (r15b)") {
    // normalize cache state first: a warm segs cache from an earlier
    // test collapses the subtree into InMemoryTableScan and the shape
    // comparison would count different exchanges per run order
    spark.sharedState.cacheManager.clearCache()
    def shape(k: String): Map[String, Int] = {
      val p = planOf(k)
      Seq("CartesianProduct", "BroadcastNestedLoopJoin", "SortMergeJoin",
        "ShuffledHashJoin", "BroadcastHashJoin", "Exchange", "Window")
        .map(op => op -> op.r.findAllIn(p).size).toMap
    }
    val (a, u) = (shape("text_segment_dedup"), shape("text_segment_dedup_uni"))
    assert(u == a, s"uni scrub shape $u != ascii shape $a")
  }
}
