package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.queries._

/** Driver contract — see /root/repo/SURVEY.md §2 for the inventory.
  *
  * Every entry in [[queries]] is one operator/capability from the
  * survey; entries with a DuckDB-expressible semantics also appear in
  * [[oracleSql]] (the driver hash-compares both at sf0.01).
  *
  * Numeric discipline (why results hash-match an independent engine):
  * see [[graft.functions.Num]] — decimal-exact aggregation, double only
  * at the edges, deterministic total ordering on every output.
  */
object SparkEntry {

  /** Flagship query on sf=0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    ReferenceQueries.dashboardDetail(spark, "/root/testdata/sf0.001")

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // §2.A — ingest & data model
    "json_ingest"        -> (ReferenceQueries.jsonIngest _),
    "csv_ingest"         -> (ReferenceQueries.csvIngest _),
    "code_mapping"       -> (ReferenceQueries.codeMapping _),
    "upsert_keep_latest" -> (ReferenceQueries.upsertKeepLatest _),
    "incremental_load"   -> (ReferenceQueries.incrementalLoad _),
    "pk_dedup"           -> (ReferenceQueries.pkDedup _),
    // §2.B — reference dashboard surface
    "top_n_by_metric"    -> (ReferenceQueries.topNByMetric _),
    "ratio_metric"       -> (ReferenceQueries.ratioMetric _),
    "dashboard_detail"   -> (ReferenceQueries.dashboardDetail _),
    "last_periods_pivot" -> (ReferenceQueries.lastPeriodsPivot _),
    "entity_time_series" -> (ReferenceQueries.entityTimeSeries _),
    "rolling_period_avg" -> (ReferenceQueries.rollingPeriodAvg _),
    "stats_totals_a"     -> (ReferenceQueries.statsTotalsA _),
    "stats_totals_b"     -> (ReferenceQueries.statsTotalsB _),
    "point_lookup"       -> (ReferenceQueries.pointLookup _),
    "join_quality"       -> (ReferenceQueries.joinQuality _),
    "last_watermark"     -> (ReferenceQueries.lastWatermark _),
    // §2.C — warehouse-scale relational core
    "q1_pricing_summary" -> (RelationalQueries.q1PricingSummary _),
    "q3_shipping_priority" -> (RelationalQueries.q3ShippingPriority _),
    "q5_local_supplier"  -> (RelationalQueries.q5LocalSupplier _),
    "q17_small_quantity" -> (RelationalQueries.q17SmallQuantity _),
    "q18_large_volume"   -> (RelationalQueries.q18LargeVolumeCustomer _),
    "q2_min_cost"        -> (RelationalQueries.q2MinCostSupplier _),
    "q16_supplier_variety" -> (RelationalQueries.q16SupplierVariety _),
    "q21_suppliers_waiting" -> (RelationalQueries.q21SuppliersWaiting _),
    "q20_dominant_suppliers" -> (RelationalQueries.q20DominantSuppliers _),
    "q22_idle_rich_customers" -> (RelationalQueries.q22IdleRichCustomers _),
    "q13_customer_distribution" -> (RelationalQueries.q13CustomerDistribution _),
    "q7_nation_volume"   -> (RelationalQueries.q7NationVolume _),
    "q8_market_share"    -> (RelationalQueries.q8MarketShare _),
    "q9_product_profit"  -> (RelationalQueries.q9ProductProfit _),
    "q14_promo_revenue"  -> (RelationalQueries.q14PromoRevenue _),
    "q15_top_supplier"   -> (RelationalQueries.q15TopSupplier _),
    "q19_disjunctive_predicates" -> (RelationalQueries.q19DisjunctivePredicates _),
    "q11_important_stock" -> (RelationalQueries.q11ImportantStock _),
    "q4_order_priority"  -> (RelationalQueries.q4OrderPriority _),
    "q6_forecast_revenue" -> (RelationalQueries.q6ForecastRevenue _),
    "q10_returned_items" -> (RelationalQueries.q10ReturnedItems _),
    "q12_late_priority"  -> (RelationalQueries.q12LatePriority _),
    "embedding_audit"    -> (VectorQueries.embeddingAudit _),
    "mmr_diversified_topk" -> (VectorQueries.mmrDiversified _),
    "cluster_balanced_sample" -> (VectorQueries.clusterBalancedSample _),
    "semantic_drift"     -> (VectorQueries.semanticDrift _),
    "retrieval_quality_report" -> (VectorQueries.retrievalQualityReport _),
    "events_twap"        -> (WarehouseQueries.eventsTwap _),
    "k_anonymity_audit"  -> (TextQueries.kAnonymityAudit _),
    "dedup_unicode"      -> (TextQueries.dedupUnicode _),
    "chunk_overlap"      -> ((s, d) => TextQueries.chunkOverlap(s, d)),
    "html_extract"       -> (TextQueries.htmlExtract _),
    "l_diversity_audit"  -> (TextQueries.lDiversityAudit _),
    "t_closeness_audit"  -> (TextQueries.tClosenessAudit _),
    "rater_kappa"        -> (TextQueries.raterAgreementKappa _),
    "char_entropy"       -> (TextQueries.charEntropyFilter _),
    "quality_calibration" -> (TextQueries.qualityCalibration _),
    "lang_source_mi"     -> (TextQueries.langSourceMi _),
    "association_rules"  -> (WarehouseQueries.associationRules _),
    "signal_correlation" -> (TextQueries.signalCorrelation _),
    "dp_noisy_counts"    -> (TextQueries.dpNoisyCounts _),
    "doremi_mix"         -> (TextQueries.doremiMix _),
    "quality_fusion"     -> (TextQueries.qualityFusion _),
    "seed_distance"      -> (WarehouseQueries.seedDistance _),
    "shortest_paths"     -> (WarehouseQueries.shortestPathCost _),
    "kcore_layers"       -> (WarehouseQueries.kcoreLayers _),
    "markov_attribution" -> (WarehouseQueries.markovAttribution _),
    "frequent_pairs"     -> (WarehouseQueries.frequentPairs _),
    "window_running_sum" -> (RelationalQueries.windowRunningSum _),
    "semi_join_exists"   -> (RelationalQueries.semiJoinExists _),
    "distinct_counts"    -> (RelationalQueries.distinctCounts _),
    "approx_distinct"    -> (RelationalQueries.approxDistinct _),
    "events_time_buckets" -> (RelationalQueries.eventsTimeBuckets _),
    "topk_per_group"     -> (RelationalQueries.topkPerGroup _),
    "topk_per_group_custom" -> (ExtendedQueries.topkPerGroupCustom _),
    "topk_rank_ties"     -> (ExtendedQueries.topkRankTies _),
    "topk_dense_rank"    -> (ExtendedQueries.topkDenseRank _),
    "asof_last_purchase" -> (ExtendedQueries.asofLastPurchase _),
    // §2.C8 + §2.E — sessionization & windowed aggregation
    "rollup_totals"      -> (ExtendedQueries.rollupTotals _),
    "events_range_join"  -> (ExtendedQueries.eventsRangeJoin _),
    "price_histogram"    -> (ExtendedQueries.priceHistogram _),
    "bloom_prune_join"   -> (RelationalQueries.bloomPruneJoin _),
    "zorder_layout"      -> (ExtendedQueries.zorderLayout _),
    "orc_ingest"         -> (ExtendedQueries.orcIngest _),
    "corpus_diff"        -> (ExtendedQueries.corpusDiff _),
    "hll_partitioned_distinct" -> (ExtendedQueries.hllPartitionedDistinct _),
    "histogram_preagg_quantiles" -> (ExtendedQueries.histogramPreaggQuantiles _),
    "kll_preagg_quantiles" -> (ExtendedQueries.kllPreaggQuantiles _),
    "events_click_attribution" -> (TextQueries.clickAttribution _),
    "events_click_attribution_outer" -> (TextQueries.clickAttributionOuter _),
    "text_length_quantiles" -> (TextQueries.textLengthQuantiles _),
    "text_length_quantiles_exact" -> (TextQueries.textLengthQuantilesExact _),
    "length_quantiles_by_lang" -> (TextQueries.lengthQuantilesByLang _),
    "pivot_segments"     -> (ExtendedQueries.pivotSegments _),
    "setop_except"       -> (ExtendedQueries.setopExcept _),
    "text_normalize"     -> (ExtendedQueries.textNormalize _),
    "text_chunk"         -> (ExtendedQueries.textChunk _),
    "text_redact"        -> (ExtendedQueries.textRedact _),
    "text_redact_luhn"   -> (TextQueries.textRedactLuhn _),
    "vocab_top_words"    -> (ExtendedQueries.vocabTopWords _),
    "zipf_fit"           -> (ExtendedQueries.zipfFit _),
    "zipf_theil_sen"     -> (ExtendedQueries.zipfTheilSen _),
    "events_sessionize"  -> (TextQueries.eventsSessionize _),
    "events_session_window" -> (TextQueries.eventsSessionWindow _),
    "events_windowed_agg" -> (TextQueries.eventsWindowedAgg _),
    // §2.D — LLM-training-data operators
    "dedup_exact"        -> (TextQueries.dedupExact _),
    "dedup_minhash_lsh"  -> (TextQueries.dedupMinhashLsh _),
    "dedup_bbit_minhash" -> (TextQueries.dedupBbitMinhash _),
    "dedup_source_matrix" -> (TextQueries.dedupSourceMatrix _),
    "dedup_simhash"      -> (TextQueries.dedupSimhash _),
    "dedup_ngram_jaccard" -> (TextQueries.dedupNgramJaccard _),
    "rouge_overlap"      -> (TextQueries.rougeOverlap _),
    "dedup_weighted_jaccard" -> (TextQueries.dedupWeightedJaccard _),
    "dedup_resolve"      -> (TextQueries.dedupResolve _),
    "dedup_keep_best"    -> (TextQueries.dedupKeepBest _),
    "dedup_cluster_sizes" -> (TextQueries.dedupClusterSizes _),
    "dedup_incremental"  -> (TextQueries.dedupIncremental _),
    "dedup_repeated_spans" -> (TextQueries.dedupRepeatedSpans _),
    "dedup_char_spans"   -> (TextQueries.dedupCharSpans _),
    "source_quota"       -> (TextQueries.sourceQuota _),
    "sequence_pack"      -> (TextQueries.sequencePack _),
    "sequence_pack_nextfit" -> (TextQueries.sequencePackNextFit _),
    "text_repetition_score" -> (TextQueries.textRepetitionScore _),
    "paragraph_dedup"    -> (TextQueries.paragraphDedup _),
    "token_budget_select" -> (TextQueries.tokenBudgetSelect _),
    "doc_chunking"       -> (TextQueries.docChunking _),
    "quality_classifier" -> (TextQueries.qualityClassifier _),
    "dedup_containment"  -> (TextQueries.dedupContainment _),
    "train_split"        -> (TextQueries.trainSplit _),
    "leakage_safe_split" -> (TextQueries.leakageSafeSplit _),
    "corpus_pipeline"    -> (TextQueries.corpusPipeline _),
    "pipeline_audit"     -> (TextQueries.pipelineAudit _),
    "packing_efficiency" -> (TextQueries.packingEfficiency _),
    "decontamination"    -> (TextQueries.decontaminate _),
    "decontamination_score" -> (TextQueries.decontaminationScore _),
    "decontamination_char" -> (TextQueries.decontaminationChar _),
    "ngram_novelty"      -> (TextQueries.ngramNovelty _),
    "corpus_drift"       -> (TextQueries.corpusDrift _),
    "training_order"     -> ((s, d) => TextQueries.trainingOrder(s, d)),
    "dense_ids"          -> ((s, d) => TextQueries.denseIds(s, d)),
    "mixture_resample"   -> (TextQueries.mixtureResample _),
    "dsir_resample"      -> (TextQueries.dsirResample _),
    "perplexity_filter"  -> (TextQueries.perplexityFilter _),
    "temperature_mix"    -> (TextQueries.temperatureMix _),
    "unimax_mix"         -> (TextQueries.unimaxMix _),
    "epoch_allocation"   -> (TextQueries.epochAllocation _),
    "vocab_heavy_hitters" -> (TextQueries.vocabHeavyHitters _),
    "text_token_count"   -> (TextQueries.textTokenCount _),
    "text_quality_score" -> (TextQueries.textQualityScore _),
    "lm_cross_entropy"   -> (TextQueries.lmCrossEntropy _),
    "lm_bigram_cross_entropy" -> (TextQueries.lmBigramCrossEntropy _),
    "lm_kn_cross_entropy" -> (TextQueries.lmKnCrossEntropy _),
    "holdout_perplexity" -> (TextQueries.holdoutPerplexity _),
    "corpus_card"        -> (TextQueries.corpusCard _),
    "bootstrap_quality_ci" -> (TextQueries.bootstrapQualityCi _),
    // E23 run to completion as a bounded file stream — same oracle
    "stream_bootstrap_ci" -> (StreamFaces.streamBootstrapCi _),
    // E11 / E14 run to completion the same way — additive per-batch
    // rows make the read faces ≡ their batch twins exactly
    "stream_quality_totals" -> (StreamFaces.streamQualityTotals _),
    "stream_drift_psi"   -> (StreamFaces.streamDriftPsi _),
    "stream_robust_flags" -> (StreamFaces.streamRobustFlags _),
    "stream_trending_words" -> (StreamFaces.streamTrendingWords _),
    "stream_ab_ttest"    -> (StreamFaces.streamAbTtest _),
    "stream_signal_matrix" -> (StreamFaces.streamSignalMatrix _),
    "stream_holt_forecast" -> (StreamFaces.streamHoltForecast _),
    "stream_source_concentration" -> (StreamFaces.streamSourceConcentration _),
    "stream_watermark_dedup" -> (StreamFaces.streamWatermarkDedup _),
    "stream_mixture_gate" -> (StreamFaces.streamMixtureGate _),
    "stream_boilerplate_strip" -> (StreamFaces.streamBoilerplateStrip _),
    "text_blocklist"     -> (TextQueries.textBlocklist _),
    "gopher_quality"     -> (TextQueries.gopherQualityFilter _),
    "fim_transform"      -> (TextQueries.fimTransform _),
    "text_lang_id"       -> (TextQueries.textLangId _),
    "text_fingerprint"   -> (TextQueries.textFingerprint _),
    "dedup_embedding_cosine" -> (VectorQueries.dedupEmbeddingCosine _),
    "decontamination_semantic" -> (VectorQueries.decontaminationSemantic _),
    "ann_bruteforce_topk" -> (VectorQueries.annBruteForce _),
    "hard_negatives"     -> (VectorQueries.hardNegatives _),
    "ann_lsh_topk"       -> (VectorQueries.annLsh _),
    "ann_ivf_topk"       -> (VectorQueries.annIvf _),
    "ann_pq_topk"        -> (VectorQueries.annPq _),
    "ann_ivfpq_topk"     -> (VectorQueries.annIvfPq _),
    "dedup_semantic"     -> (VectorQueries.dedupSemantic _),
    "ann_recall_report"  -> (VectorQueries.annRecallReport _),
    "ann_matryoshka_report" -> (VectorQueries.annMatryoshka _),
    "ann_quantized_topk" -> (VectorQueries.annQuantized _),
    "pca_project"        -> (VectorQueries.pcaProject _),
    // §2 round-5 additions — warehouse + retrieval surface
    "scd2_history"       -> (WarehouseQueries.scd2History _),
    "funnel_steps"       -> (WarehouseQueries.funnelSteps _),
    "window_funnel"      -> (WarehouseQueries.windowFunnelDepth _),
    "bucketed_join"      -> (WarehouseQueries.bucketedJoin _),
    "table_profile"      -> (WarehouseQueries.tableProfile _),
    "data_expectations"  -> (WarehouseQueries.dataExpectations _),
    "pagerank_centrality" -> (WarehouseQueries.pagerankCentrality _),
    "pagerank_weighted"  -> (WarehouseQueries.pagerankWeighted _),
    "pagerank_personalized" -> (WarehouseQueries.pagerankPersonalized _),
    "hits_centrality"    -> (WarehouseQueries.hitsCentrality _),
    "triangle_count"     -> (WarehouseQueries.triangleCount _),
    "community_labels"   -> (WarehouseQueries.communityLabels _),
    "bm25_search"        -> (WarehouseQueries.bm25Search _),
    "rocchio_prf_search" -> (WarehouseQueries.rocchioPrfSearch _),
    "event_transitions"  -> (WarehouseQueries.eventTransitionMatrix _),
    "lead_lag_correlation" -> (WarehouseQueries.leadLagCorrelation _),
    "benford_audit"      -> (WarehouseQueries.benfordAudit _),
    "ab_ks_test"         -> (WarehouseQueries.ksTwoSample _),
    "frequent_triples"   -> (WarehouseQueries.frequentTriples _),
    "spearman_signals"   -> (TextQueries.spearmanSignals _),
    "best_length_split"  -> (TextQueries.bestLengthSplit _),
    "langid_confusion"   -> (TextQueries.langIdConfusion _),
    "heaps_law_fit"      -> (TextQueries.heapsLawFit _),
    "ql_search"          -> (WarehouseQueries.qlSearch _),
    "item_cosine"        -> (WarehouseQueries.itemCosine _),
    "holt_forecast"      -> (WarehouseQueries.holtForecast _),
    "holt_winters_forecast" -> (WarehouseQueries.holtWintersForecast _),
    "tfidf_search"       -> (WarehouseQueries.tfidfSearch _),
    "hybrid_search_rrf"  -> (WarehouseQueries.hybridSearchRrf _),
    "fuzzy_name_match"   -> (WarehouseQueries.fuzzyNameMatch _),
    "events_sliding_agg" -> (WarehouseQueries.eventsSlidingAgg _),
    "events_gap_fill"    -> (WarehouseQueries.eventsGapFill _),
    "events_outliers"    -> (WarehouseQueries.eventsOutliers _),
    "events_winsorize"   -> (WarehouseQueries.eventsWinsorize _),
    "quantile_buckets"   -> (WarehouseQueries.eventsQuantileBuckets _),
    "mad_outliers"       -> (WarehouseQueries.eventsMadOutliers _),
    "peak_concurrency"   -> (WarehouseQueries.peakConcurrency _),
    "pareto_frontier"    -> (WarehouseQueries.paretoFrontier _),
    "cusum_changepoint"  -> (WarehouseQueries.cusumChangepoint _),
    "adamic_adar_links"  -> (WarehouseQueries.adamicAdarLinks _),
    "rfm_segments"       -> (WarehouseQueries.rfmSegments _),
    "ab_welch_ttest"     -> (WarehouseQueries.welchTTest _),
    "ab_srm_check"       -> (WarehouseQueries.srmCheck _),
    "km_retention"       -> (WarehouseQueries.kaplanMeierRetention _),
    "jaro_winkler_links" -> ((s: SparkSession, d: String) =>
      WarehouseQueries.jaroWinklerLinks(s, d)),
    "source_concentration" -> (TextQueries.sourceConcentration _),
    "readability_scores" -> (TextQueries.readabilityScores _),
    "quality_quantile_norm" -> (TextQueries.qualityQuantileNorm _),
    "ab_chi_square"      -> (WarehouseQueries.chiSquareMix _),
    "ab_mann_whitney"    -> (WarehouseQueries.mannWhitney _),
    "ab_cuped_effect"    -> (WarehouseQueries.cupedEffect _),
    "ewma_user_value"    -> (WarehouseQueries.ewmaUserValue _),
    "quality_filter"     -> (TextQueries.qualityFilter _),
    "vocab_tokenize"     -> (TextQueries.vocabTokenize _),
    "vocab_bpe_tokenize" -> (TextQueries.vocabBpeTokenize _),
    "tokenizer_fertility" -> (TextQueries.tokenizerFertility _),
    "vocab_tokenize_ids" -> (TextQueries.vocabTokenizeIds _),
    "vocab_oov_rate"     -> (TextQueries.vocabOovRate _),
    "quality_weighted_sample" -> (TextQueries.qualityWeightedSample _),
    "cohort_retention"   -> (WarehouseQueries.cohortRetention _),
    "events_enriched_agg" -> (WarehouseQueries.eventsEnrichedAgg _),
    "events_priority_at_time" -> (WarehouseQueries.eventsPriorityAtTime _),
    "window_suite"       -> (WarehouseQueries.windowSuite _),
    "grouping_sets_totals" -> (WarehouseQueries.groupingSetsTotals _),
    // §2.D12 — real media decode (BMP / WAV round-trip through the
    // batched BatchDecoder plumbing)
    "media_decode_image" -> (MultimodalQueries.mediaDecodeImage _),
    // D12c: rows-only BY NATURE — lossy codec, T.81 fixes the
    // bitstream not the IDCT bits; MultimodalSpec pins byte-exact
    // hand-assembled streams + two-way javax.imageio cross-validation
    "media_decode_jpeg"  -> (MultimodalQueries.mediaDecodeJpeg _),
    "media_decode_png"   -> (MultimodalQueries.mediaDecodePng _),
    "media_dedup_phash"  -> (MultimodalQueries.mediaDedupPhash _),
    "media_dedup_audio"  -> (MultimodalQueries.mediaDedupAudio _),
    "media_decode_audio" -> (MultimodalQueries.mediaDecodeAudio _),
  )

  // ---- DuckDB oracle SQL ------------------------------------------------
  // Shared snippets: exact-decimal aggregation mirroring Num.scala.
  private val DP = "CAST(%s AS DECIMAL(12,2))"          // prices/qty/values
  private val DR = "CAST(%s AS DECIMAL(4,2))"           // rates in [0,1]
  private val ONE = "CAST(1 AS DECIMAL(3,2))"
  private def dsum(c: String) = s"CAST(SUM(CAST($c AS DECIMAL(12,2))) AS DOUBLE)"
  private def davg(c: String) =
    s"CAST(SUM(CAST($c AS DECIMAL(12,2))) AS DOUBLE) / CAST(COUNT($c) AS DOUBLE)"
  private val revenueSum =
    s"CAST(SUM(${DP.format("l_extendedprice")} * ($ONE - ${DR.format("l_discount")})) AS DOUBLE)"

  private val monthlyCte =
    """monthly AS (
      |  SELECT o_custkey, date_trunc('month', o_orderdate) AS month,
      |         SUM(CAST(o_totalprice AS DECIMAL(12,2))) AS mspend
      |  FROM orders GROUP BY 1, 2),
      |ranked AS (
      |  SELECT month, row_number() OVER (ORDER BY month DESC) AS rk
      |  FROM (SELECT DISTINCT month FROM monthly))""".stripMargin

  private val statsTotalsCte =
    s"""t AS (
       |  SELECT l_partkey, COUNT(*) AS n_lines,
       |    ${dsum("l_quantity")} AS total_qty,
       |    ${dsum("l_extendedprice")} AS total_price,
       |    CAST(SUM(${DP.format("l_extendedprice")} * ${DR.format("l_discount")}) AS DOUBLE) AS disc_amount,
       |    CAST(SUM(${DP.format("l_extendedprice")} * ${DR.format("l_tax")}) AS DOUBLE) AS tax_amount
       |  FROM lineitem GROUP BY 1)""".stripMargin


  // ---- portable-XXH64 + hyperplane constants (oracle generators) -------
  // Spark's xxhash64(lit(42L), x) = XXH64.hashLong(x, C) with
  // C = hashLong(42, 42) — a constant. One 8-byte XXH64 block is ~10
  // multiply/rotate/xor steps, emitted as nested subqueries (one level
  // per step: lateral aliases substitute textually and would blow up
  // exponentially) over HUGEINT with 32-bit-limb multiplication mod
  // 2^64. Bit-for-bit equal to the engine hash.
  private val M64 = "18446744073709551616"
  private val M32 = "4294967296"
  private def mul64(a: String, b: String): String =
    s"(($a) % $M32) * (($b) % $M32)" +
      s" + (((($a) // $M32) * (($b) % $M32)" +
      s" + (($a) % $M32) * (($b) // $M32)) % $M32) * $M32"
  private def rotl(x: String, r: Int): String =
    s"((($x) % ${BigInt(1) << (64 - r)}) * ${BigInt(1) << r}) + (($x) // ${BigInt(1) << (64 - r)})"
  private def xorShift(x: String, n: Int): String =
    s"xor(CAST($x AS HUGEINT), CAST(($x) // ${BigInt(1) << n} AS HUGEINT))"
  private val XP1 = "11400714785074694791" // XXH64 primes, decimal
  private val XP2 = "14029467366897019727"
  private val XP3 = "1609587929392839161"
  private val XP4 = "9650029242287828579"
  private val XSEEDHEAD = "14440755233413290667" // (hashLong(42,42) + P5 + 8) mod 2^64

  /** Nested-subquery XXH64 hashLong of `idExpr` rows from `inner`,
    * exposing the unsigned 64-bit result as column `hout`.
    */
  private def xxh64Nested(inner: String, idExpr: String): String =
    Seq(
      s"(${mul64("xv", XP2)}) % $M64 AS k1",
      s"${rotl("k1", 31)} AS k2",
      s"(${mul64("k2", XP1)}) % $M64 AS k3",
      s"xor(CAST($XSEEDHEAD AS HUGEINT), CAST(k3 AS HUGEINT)) AS h1",
      s"${rotl("h1", 27)} AS h1r",
      s"((${mul64("h1r", XP1)}) + $XP4) % $M64 AS h2",
      s"${xorShift("h2", 33)} AS f1",
      s"(${mul64("f1", XP2)}) % $M64 AS f2",
      s"${xorShift("f2", 29)} AS f3",
      s"(${mul64("f3", XP3)}) % $M64 AS f4",
      s"${xorShift("f4", 32)} AS hout")
      .foldLeft(s"SELECT *, CAST($idExpr AS HUGEINT) AS xv FROM ($inner)") {
        (q, step) => s"SELECT *, $step FROM ($q)"
      }


  /** CTE chain `cd..hf`: variable-length string XXH64 (seed 42) of
    * each row of a preceding CTE `dsh(sh)` -> `hf(sh, hv)` with hv the
    * unsigned 64-bit result as HUGEINT. Valid for ASCII inputs < 32
    * bytes (the stripe loop is never entered and is not emitted) --
    * true of the gate word-shingles. Shared by the dedup_simhash and
    * dedup_bbit_minhash oracles. Trailing comma included.
    */
  private val strXxh64Ctes: String =
    """cd AS (
        |  SELECT sh, length(sh) AS L,
        |    list_transform(range(1, length(sh) + 1),
        |      i -> CAST(ascii(substr(sh, i, 1)) AS HUGEINT)) AS cs
        |  FROM dsh),
        |w8 AS (
        |  SELECT sh, L, cs,
        |    list_transform(range(0, L // 8), w ->
        |      cs[w*8+1] + cs[w*8+2]*256 + cs[w*8+3]*65536 + cs[w*8+4]*16777216
        |      + cs[w*8+5]*4294967296 + cs[w*8+6]*1099511627776
        |      + cs[w*8+7]*281474976710656 + cs[w*8+8]*72057594037927936) AS words
        |  FROM cd),
        |hw AS (
        |  SELECT sh, L, cs,
        |    list_reduce(list_prepend(CAST((42 + 2870177450012600261 + L) % 18446744073709551616 AS HUGEINT), words),
        |      (acc, w) -> ((((((((xor(CAST(acc AS HUGEINT), CAST(((((((((((w) % 4294967296) * ((14029467366897019727) % 4294967296) + ((((w) // 4294967296) * ((14029467366897019727) % 4294967296) + ((w) % 4294967296) * ((14029467366897019727) // 4294967296)) % 4294967296) * 4294967296) % 18446744073709551616) % 8589934592) * 2147483648) + (((((w) % 4294967296) * ((14029467366897019727) % 4294967296) + ((((w) // 4294967296) * ((14029467366897019727) % 4294967296) + ((w) % 4294967296) * ((14029467366897019727) // 4294967296)) % 4294967296) * 4294967296) % 18446744073709551616) // 8589934592))) % 4294967296) * ((11400714785074694791) % 4294967296) + (((((((((((w) % 4294967296) * ((14029467366897019727) % 4294967296) + ((((w) // 4294967296) * ((14029467366897019727) % 4294967296) + ((w) % 4294967296) * ((14029467366897019727) // 4294967296)) % 4294967296) * 4294967296) % 18446744073709551616) % 8589934592) * 2147483648) + (((((w) % 4294967296) * ((14029467366897019727) % 4294967296) + ((((w) // 4294967296) * ((14029467366897019727) % 4294967296) + ((w) % 4294967296) * ((14029467366897019727) // 4294967296)) % 4294967296) * 4294967296) % 18446744073709551616) // 8589934592))) // 4294967296) * ((11400714785074694791) % 4294967296) + (((((((((w) % 4294967296) * ((14029467366897019727) % 4294967296) + ((((w) // 4294967296) * ((14029467366897019727) % 4294967296) + ((w) % 4294967296) * ((14029467366897019727) // 4294967296)) % 4294967296) * 4294967296) % 18446744073709551616) % 8589934592) * 2147483648) + (((((w) % 4294967296) * ((14029467366897019727) % 4294967296) + ((((w) // 4294967296) * ((14029467366897019727) % 4294967296) + ((w) % 4294967296) * ((14029467366897019727) // 4294967296)) % 4294967296) * 4294967296) % 18446744073709551616) // 8589934592))) % 4294967296) * ((11400714785074694791) // 4294967296)) % 4294967296) * 4294967296) % 18446744073709551616 AS HUGEINT))) % 137438953472) * 134217728) + ((xor(CAST(acc AS HUGEINT), CAST(((((((((((w) % 4294967296) * ((14029467366897019727) % 4294967296) + ((((w) // 4294967296) * ((14029467366897019727) % 4294967296) + ((w) % 4294967296) * ((14029467366897019727) // 4294967296)) % 4294967296) * 4294967296) % 18446744073709551616) % 8589934592) * 2147483648) + (((((w) % 4294967296) * ((14029467366897019727) % 4294967296) + ((((w) // 4294967296) * ((14029467366897019727) % 4294967296) + ((w) % 4294967296) * ((14029467366897019727) // 4294967296)) % 4294967296) * 4294967296) % 18446744073709551616) // 8589934592))) % 4294967296) * ((11400714785074694791) % 4294967296) + (((((((((((w) % 4294967296) * ((14029467366897019727) % 4294967296) + ((((w) // 4294967296) * ((14029467366897019727) % 4294967296) + ((w) % 4294967296) * ((14029467366897019727) // 4294967296)) % 4294967296) * 4294967296) % 18446744073709551616) % 8589934592) * 2147483648) + (((((w) % 4294967296) * ((14029467366897019727) % 4294967296) + ((((w) // 4294967296) * ((14029467366897019727) % 4294967296) + ((w) % 4294967296) * ((14029467366897019727) // 4294967296)) % 4294967296) * 4294967296) % 18446744073709551616) // 8589934592))) // 4294967296) * ((11400714785074694791) % 4294967296) + (((((((((w) % 4294967296) * ((14029467366897019727) % 4294967296) + ((((w) // 4294967296) * ((14029467366897019727) % 4294967296) + ((w) % 4294967296) * ((14029467366897019727) // 4294967296)) % 4294967296) * 4294967296) % 18446744073709551616) % 8589934592) * 2147483648) + (((((w) % 4294967296) * ((14029467366897019727) % 4294967296) + ((((w) // 4294967296) * ((14029467366897019727) % 4294967296) + ((w) % 4294967296) * ((14029467366897019727) // 4294967296)) % 4294967296) * 4294967296) % 18446744073709551616) // 8589934592))) % 4294967296) * ((11400714785074694791) // 4294967296)) % 4294967296) * 4294967296) % 18446744073709551616 AS HUGEINT))) // 137438953472))) % 4294967296) * ((11400714785074694791) % 4294967296) + ((((((((xor(CAST(acc AS HUGEINT), CAST(((((((((((w) % 4294967296) * ((14029467366897019727) % 4294967296) + ((((w) // 4294967296) * ((14029467366897019727) % 4294967296) + ((w) % 4294967296) * ((14029467366897019727) // 4294967296)) % 4294967296) * 4294967296) % 18446744073709551616) % 8589934592) * 2147483648) + (((((w) % 4294967296) * ((14029467366897019727) % 4294967296) + ((((w) // 4294967296) * ((14029467366897019727) % 4294967296) + ((w) % 4294967296) * ((14029467366897019727) // 4294967296)) % 4294967296) * 4294967296) % 18446744073709551616) // 8589934592))) % 4294967296) * ((11400714785074694791) % 4294967296) + (((((((((((w) % 4294967296) * ((14029467366897019727) % 4294967296) + ((((w) // 4294967296) * ((14029467366897019727) % 4294967296) + ((w) % 4294967296) * ((14029467366897019727) // 4294967296)) % 4294967296) * 4294967296) % 18446744073709551616) % 8589934592) * 2147483648) + (((((w) % 4294967296) * ((14029467366897019727) % 4294967296) + ((((w) // 4294967296) * ((14029467366897019727) % 4294967296) + ((w) % 4294967296) * ((14029467366897019727) // 4294967296)) % 4294967296) * 4294967296) % 18446744073709551616) // 8589934592))) // 4294967296) * ((11400714785074694791) % 4294967296) + (((((((((w) % 4294967296) * ((14029467366897019727) % 4294967296) + ((((w) // 4294967296) * ((14029467366897019727) % 4294967296) + ((w) % 4294967296) * ((14029467366897019727) // 4294967296)) % 4294967296) * 4294967296) % 18446744073709551616) % 8589934592) * 2147483648) + (((((w) % 4294967296) * ((14029467366897019727) % 4294967296) + ((((w) // 4294967296) * ((14029467366897019727) % 4294967296) + ((w) % 4294967296) * ((14029467366897019727) // 4294967296)) % 4294967296) * 4294967296) % 18446744073709551616) // 8589934592))) % 4294967296) * ((11400714785074694791) // 4294967296)) % 4294967296) * 4294967296) % 18446744073709551616 AS HUGEINT))) % 137438953472) * 134217728) + ((xor(CAST(acc AS HUGEINT), CAST(((((((((((w) % 4294967296) * ((14029467366897019727) % 4294967296) + ((((w) // 4294967296) * ((14029467366897019727) % 4294967296) + ((w) % 4294967296) * ((14029467366897019727) // 4294967296)) % 4294967296) * 4294967296) % 18446744073709551616) % 8589934592) * 2147483648) + (((((w) % 4294967296) * ((14029467366897019727) % 4294967296) + ((((w) // 4294967296) * ((14029467366897019727) % 4294967296) + ((w) % 4294967296) * ((14029467366897019727) // 4294967296)) % 4294967296) * 4294967296) % 18446744073709551616) // 8589934592))) % 4294967296) * ((11400714785074694791) % 4294967296) + (((((((((((w) % 4294967296) * ((14029467366897019727) % 4294967296) + ((((w) // 4294967296) * ((14029467366897019727) % 4294967296) + ((w) % 4294967296) * ((14029467366897019727) // 4294967296)) % 4294967296) * 4294967296) % 18446744073709551616) % 8589934592) * 2147483648) + (((((w) % 4294967296) * ((14029467366897019727) % 4294967296) + ((((w) // 4294967296) * ((14029467366897019727) % 4294967296) + ((w) % 4294967296) * ((14029467366897019727) // 4294967296)) % 4294967296) * 4294967296) % 18446744073709551616) // 8589934592))) // 4294967296) * ((11400714785074694791) % 4294967296) + (((((((((w) % 4294967296) * ((14029467366897019727) % 4294967296) + ((((w) // 4294967296) * ((14029467366897019727) % 4294967296) + ((w) % 4294967296) * ((14029467366897019727) // 4294967296)) % 4294967296) * 4294967296) % 18446744073709551616) % 8589934592) * 2147483648) + (((((w) % 4294967296) * ((14029467366897019727) % 4294967296) + ((((w) // 4294967296) * ((14029467366897019727) % 4294967296) + ((w) % 4294967296) * ((14029467366897019727) // 4294967296)) % 4294967296) * 4294967296) % 18446744073709551616) // 8589934592))) % 4294967296) * ((11400714785074694791) // 4294967296)) % 4294967296) * 4294967296) % 18446744073709551616 AS HUGEINT))) // 137438953472))) // 4294967296) * ((11400714785074694791) % 4294967296) + ((((((xor(CAST(acc AS HUGEINT), CAST(((((((((((w) % 4294967296) * ((14029467366897019727) % 4294967296) + ((((w) // 4294967296) * ((14029467366897019727) % 4294967296) + ((w) % 4294967296) * ((14029467366897019727) // 4294967296)) % 4294967296) * 4294967296) % 18446744073709551616) % 8589934592) * 2147483648) + (((((w) % 4294967296) * ((14029467366897019727) % 4294967296) + ((((w) // 4294967296) * ((14029467366897019727) % 4294967296) + ((w) % 4294967296) * ((14029467366897019727) // 4294967296)) % 4294967296) * 4294967296) % 18446744073709551616) // 8589934592))) % 4294967296) * ((11400714785074694791) % 4294967296) + (((((((((((w) % 4294967296) * ((14029467366897019727) % 4294967296) + ((((w) // 4294967296) * ((14029467366897019727) % 4294967296) + ((w) % 4294967296) * ((14029467366897019727) // 4294967296)) % 4294967296) * 4294967296) % 18446744073709551616) % 8589934592) * 2147483648) + (((((w) % 4294967296) * ((14029467366897019727) % 4294967296) + ((((w) // 4294967296) * ((14029467366897019727) % 4294967296) + ((w) % 4294967296) * ((14029467366897019727) // 4294967296)) % 4294967296) * 4294967296) % 18446744073709551616) // 8589934592))) // 4294967296) * ((11400714785074694791) % 4294967296) + (((((((((w) % 4294967296) * ((14029467366897019727) % 4294967296) + ((((w) // 4294967296) * ((14029467366897019727) % 4294967296) + ((w) % 4294967296) * ((14029467366897019727) // 4294967296)) % 4294967296) * 4294967296) % 18446744073709551616) % 8589934592) * 2147483648) + (((((w) % 4294967296) * ((14029467366897019727) % 4294967296) + ((((w) // 4294967296) * ((14029467366897019727) % 4294967296) + ((w) % 4294967296) * ((14029467366897019727) // 4294967296)) % 4294967296) * 4294967296) % 18446744073709551616) // 8589934592))) % 4294967296) * ((11400714785074694791) // 4294967296)) % 4294967296) * 4294967296) % 18446744073709551616 AS HUGEINT))) % 137438953472) * 134217728) + ((xor(CAST(acc AS HUGEINT), CAST(((((((((((w) % 4294967296) * ((14029467366897019727) % 4294967296) + ((((w) // 4294967296) * ((14029467366897019727) % 4294967296) + ((w) % 4294967296) * ((14029467366897019727) // 4294967296)) % 4294967296) * 4294967296) % 18446744073709551616) % 8589934592) * 2147483648) + (((((w) % 4294967296) * ((14029467366897019727) % 4294967296) + ((((w) // 4294967296) * ((14029467366897019727) % 4294967296) + ((w) % 4294967296) * ((14029467366897019727) // 4294967296)) % 4294967296) * 4294967296) % 18446744073709551616) // 8589934592))) % 4294967296) * ((11400714785074694791) % 4294967296) + (((((((((((w) % 4294967296) * ((14029467366897019727) % 4294967296) + ((((w) // 4294967296) * ((14029467366897019727) % 4294967296) + ((w) % 4294967296) * ((14029467366897019727) // 4294967296)) % 4294967296) * 4294967296) % 18446744073709551616) % 8589934592) * 2147483648) + (((((w) % 4294967296) * ((14029467366897019727) % 4294967296) + ((((w) // 4294967296) * ((14029467366897019727) % 4294967296) + ((w) % 4294967296) * ((14029467366897019727) // 4294967296)) % 4294967296) * 4294967296) % 18446744073709551616) // 8589934592))) // 4294967296) * ((11400714785074694791) % 4294967296) + (((((((((w) % 4294967296) * ((14029467366897019727) % 4294967296) + ((((w) // 4294967296) * ((14029467366897019727) % 4294967296) + ((w) % 4294967296) * ((14029467366897019727) // 4294967296)) % 4294967296) * 4294967296) % 18446744073709551616) % 8589934592) * 2147483648) + (((((w) % 4294967296) * ((14029467366897019727) % 4294967296) + ((((w) // 4294967296) * ((14029467366897019727) % 4294967296) + ((w) % 4294967296) * ((14029467366897019727) // 4294967296)) % 4294967296) * 4294967296) % 18446744073709551616) // 8589934592))) % 4294967296) * ((11400714785074694791) // 4294967296)) % 4294967296) * 4294967296) % 18446744073709551616 AS HUGEINT))) // 137438953472))) % 4294967296) * ((11400714785074694791) // 4294967296)) % 4294967296) * 4294967296) % 18446744073709551616 + 9650029242287828579) % 18446744073709551616) AS h1
        |  FROM w8),
        |h4 AS (
        |  SELECT sh, L, cs,
        |    CASE WHEN L % 8 >= 4 THEN
        |      ((((((((xor(CAST(h1 AS HUGEINT), CAST((((cs[(L//8)*8+1] + cs[(L//8)*8+2]*256 + cs[(L//8)*8+3]*65536 + cs[(L//8)*8+4]*16777216) % 4294967296) * ((11400714785074694791) % 4294967296) + ((((cs[(L//8)*8+1] + cs[(L//8)*8+2]*256 + cs[(L//8)*8+3]*65536 + cs[(L//8)*8+4]*16777216) // 4294967296) * ((11400714785074694791) % 4294967296) + ((cs[(L//8)*8+1] + cs[(L//8)*8+2]*256 + cs[(L//8)*8+3]*65536 + cs[(L//8)*8+4]*16777216) % 4294967296) * ((11400714785074694791) // 4294967296)) % 4294967296) * 4294967296) % 18446744073709551616 AS HUGEINT))) % 2199023255552) * 8388608) + ((xor(CAST(h1 AS HUGEINT), CAST((((cs[(L//8)*8+1] + cs[(L//8)*8+2]*256 + cs[(L//8)*8+3]*65536 + cs[(L//8)*8+4]*16777216) % 4294967296) * ((11400714785074694791) % 4294967296) + ((((cs[(L//8)*8+1] + cs[(L//8)*8+2]*256 + cs[(L//8)*8+3]*65536 + cs[(L//8)*8+4]*16777216) // 4294967296) * ((11400714785074694791) % 4294967296) + ((cs[(L//8)*8+1] + cs[(L//8)*8+2]*256 + cs[(L//8)*8+3]*65536 + cs[(L//8)*8+4]*16777216) % 4294967296) * ((11400714785074694791) // 4294967296)) % 4294967296) * 4294967296) % 18446744073709551616 AS HUGEINT))) // 2199023255552))) % 4294967296) * ((14029467366897019727) % 4294967296) + ((((((((xor(CAST(h1 AS HUGEINT), CAST((((cs[(L//8)*8+1] + cs[(L//8)*8+2]*256 + cs[(L//8)*8+3]*65536 + cs[(L//8)*8+4]*16777216) % 4294967296) * ((11400714785074694791) % 4294967296) + ((((cs[(L//8)*8+1] + cs[(L//8)*8+2]*256 + cs[(L//8)*8+3]*65536 + cs[(L//8)*8+4]*16777216) // 4294967296) * ((11400714785074694791) % 4294967296) + ((cs[(L//8)*8+1] + cs[(L//8)*8+2]*256 + cs[(L//8)*8+3]*65536 + cs[(L//8)*8+4]*16777216) % 4294967296) * ((11400714785074694791) // 4294967296)) % 4294967296) * 4294967296) % 18446744073709551616 AS HUGEINT))) % 2199023255552) * 8388608) + ((xor(CAST(h1 AS HUGEINT), CAST((((cs[(L//8)*8+1] + cs[(L//8)*8+2]*256 + cs[(L//8)*8+3]*65536 + cs[(L//8)*8+4]*16777216) % 4294967296) * ((11400714785074694791) % 4294967296) + ((((cs[(L//8)*8+1] + cs[(L//8)*8+2]*256 + cs[(L//8)*8+3]*65536 + cs[(L//8)*8+4]*16777216) // 4294967296) * ((11400714785074694791) % 4294967296) + ((cs[(L//8)*8+1] + cs[(L//8)*8+2]*256 + cs[(L//8)*8+3]*65536 + cs[(L//8)*8+4]*16777216) % 4294967296) * ((11400714785074694791) // 4294967296)) % 4294967296) * 4294967296) % 18446744073709551616 AS HUGEINT))) // 2199023255552))) // 4294967296) * ((14029467366897019727) % 4294967296) + ((((((xor(CAST(h1 AS HUGEINT), CAST((((cs[(L//8)*8+1] + cs[(L//8)*8+2]*256 + cs[(L//8)*8+3]*65536 + cs[(L//8)*8+4]*16777216) % 4294967296) * ((11400714785074694791) % 4294967296) + ((((cs[(L//8)*8+1] + cs[(L//8)*8+2]*256 + cs[(L//8)*8+3]*65536 + cs[(L//8)*8+4]*16777216) // 4294967296) * ((11400714785074694791) % 4294967296) + ((cs[(L//8)*8+1] + cs[(L//8)*8+2]*256 + cs[(L//8)*8+3]*65536 + cs[(L//8)*8+4]*16777216) % 4294967296) * ((11400714785074694791) // 4294967296)) % 4294967296) * 4294967296) % 18446744073709551616 AS HUGEINT))) % 2199023255552) * 8388608) + ((xor(CAST(h1 AS HUGEINT), CAST((((cs[(L//8)*8+1] + cs[(L//8)*8+2]*256 + cs[(L//8)*8+3]*65536 + cs[(L//8)*8+4]*16777216) % 4294967296) * ((11400714785074694791) % 4294967296) + ((((cs[(L//8)*8+1] + cs[(L//8)*8+2]*256 + cs[(L//8)*8+3]*65536 + cs[(L//8)*8+4]*16777216) // 4294967296) * ((11400714785074694791) % 4294967296) + ((cs[(L//8)*8+1] + cs[(L//8)*8+2]*256 + cs[(L//8)*8+3]*65536 + cs[(L//8)*8+4]*16777216) % 4294967296) * ((11400714785074694791) // 4294967296)) % 4294967296) * 4294967296) % 18446744073709551616 AS HUGEINT))) // 2199023255552))) % 4294967296) * ((14029467366897019727) // 4294967296)) % 4294967296) * 4294967296) % 18446744073709551616 + 1609587929392839161) % 18446744073709551616
        |    ELSE h1 END AS h2,
        |    (L // 8) * 8 + CASE WHEN L % 8 >= 4 THEN 4 ELSE 0 END AS tstart
        |  FROM hw),
        |hb AS (
        |  SELECT sh,
        |    list_reduce(list_prepend(CAST(h2 AS HUGEINT),
        |      list_transform(range(tstart + 1, L + 1), i -> cs[i])),
        |      (acc, b) -> (((((((xor(CAST(acc AS HUGEINT), CAST((((b) % 4294967296) * ((2870177450012600261) % 4294967296) + ((((b) // 4294967296) * ((2870177450012600261) % 4294967296) + ((b) % 4294967296) * ((2870177450012600261) // 4294967296)) % 4294967296) * 4294967296) % 18446744073709551616 AS HUGEINT))) % 9007199254740992) * 2048) + ((xor(CAST(acc AS HUGEINT), CAST((((b) % 4294967296) * ((2870177450012600261) % 4294967296) + ((((b) // 4294967296) * ((2870177450012600261) % 4294967296) + ((b) % 4294967296) * ((2870177450012600261) // 4294967296)) % 4294967296) * 4294967296) % 18446744073709551616 AS HUGEINT))) // 9007199254740992))) % 4294967296) * ((11400714785074694791) % 4294967296) + ((((((((xor(CAST(acc AS HUGEINT), CAST((((b) % 4294967296) * ((2870177450012600261) % 4294967296) + ((((b) // 4294967296) * ((2870177450012600261) % 4294967296) + ((b) % 4294967296) * ((2870177450012600261) // 4294967296)) % 4294967296) * 4294967296) % 18446744073709551616 AS HUGEINT))) % 9007199254740992) * 2048) + ((xor(CAST(acc AS HUGEINT), CAST((((b) % 4294967296) * ((2870177450012600261) % 4294967296) + ((((b) // 4294967296) * ((2870177450012600261) % 4294967296) + ((b) % 4294967296) * ((2870177450012600261) // 4294967296)) % 4294967296) * 4294967296) % 18446744073709551616 AS HUGEINT))) // 9007199254740992))) // 4294967296) * ((11400714785074694791) % 4294967296) + ((((((xor(CAST(acc AS HUGEINT), CAST((((b) % 4294967296) * ((2870177450012600261) % 4294967296) + ((((b) // 4294967296) * ((2870177450012600261) % 4294967296) + ((b) % 4294967296) * ((2870177450012600261) // 4294967296)) % 4294967296) * 4294967296) % 18446744073709551616 AS HUGEINT))) % 9007199254740992) * 2048) + ((xor(CAST(acc AS HUGEINT), CAST((((b) % 4294967296) * ((2870177450012600261) % 4294967296) + ((((b) // 4294967296) * ((2870177450012600261) % 4294967296) + ((b) % 4294967296) * ((2870177450012600261) // 4294967296)) % 4294967296) * 4294967296) % 18446744073709551616 AS HUGEINT))) // 9007199254740992))) % 4294967296) * ((11400714785074694791) // 4294967296)) % 4294967296) * 4294967296) % 18446744073709551616) AS h3
        |  FROM h4),
        |hf AS (
        |  SELECT sh, xor(CAST(f4 AS HUGEINT), CAST((f4) // 4294967296 AS HUGEINT)) AS hv FROM (
        |    SELECT sh, (((xor(CAST(f2 AS HUGEINT), CAST((f2) // 536870912 AS HUGEINT))) % 4294967296) * ((1609587929392839161) % 4294967296) + ((((xor(CAST(f2 AS HUGEINT), CAST((f2) // 536870912 AS HUGEINT))) // 4294967296) * ((1609587929392839161) % 4294967296) + ((xor(CAST(f2 AS HUGEINT), CAST((f2) // 536870912 AS HUGEINT))) % 4294967296) * ((1609587929392839161) // 4294967296)) % 4294967296) * 4294967296) % 18446744073709551616 AS f4 FROM (
        |      SELECT sh, (((xor(CAST(h3 AS HUGEINT), CAST((h3) // 8589934592 AS HUGEINT))) % 4294967296) * ((14029467366897019727) % 4294967296) + ((((xor(CAST(h3 AS HUGEINT), CAST((h3) // 8589934592 AS HUGEINT))) // 4294967296) * ((14029467366897019727) % 4294967296) + ((xor(CAST(h3 AS HUGEINT), CAST((h3) // 8589934592 AS HUGEINT))) % 4294967296) * ((14029467366897019727) // 4294967296)) % 4294967296) * 4294967296) % 18446744073709551616 AS f2 FROM hb)) ),"""

  private val xxhSigned =
    s"CAST(CASE WHEN hout >= 9223372036854775808 THEN hout - $M64 ELSE hout END AS BIGINT)"
  private val xxhBucket = s"((($xxhSigned) % 1000000) + 1000000) % 1000000"

  // Hyperplane signs: bit0 of xxhash64(p, i), dumped once from the
  // engine hash. Row p = plane p; a lower plane count uses the prefix.
  private val hyperSigns: Seq[Seq[Int]] = Seq(
    Seq(-1, -1, -1, -1, 1, 1, -1, -1, 1, 1, 1, 1, 1, 1, 1, -1, 1, 1, -1, 1, -1, -1, -1, 1, 1, 1, 1, -1, -1, 1, -1, -1, 1, 1, 1, 1, 1, -1, 1, -1, -1, 1, -1, -1, -1, -1, -1, -1, 1, -1, 1, -1, -1, 1, 1, 1, -1, -1, -1, 1, -1, -1, -1, -1),
    Seq(1, -1, -1, 1, 1, -1, -1, 1, 1, -1, -1, 1, -1, -1, 1, 1, 1, 1, 1, -1, 1, 1, 1, 1, 1, 1, 1, 1, -1, -1, -1, 1, 1, -1, -1, -1, 1, -1, -1, 1, 1, 1, 1, 1, 1, -1, -1, -1, -1, 1, 1, -1, -1, -1, -1, -1, 1, -1, 1, 1, -1, 1, -1, 1),
    Seq(1, 1, 1, -1, 1, 1, -1, 1, -1, -1, 1, 1, -1, -1, -1, -1, 1, -1, -1, -1, -1, -1, 1, -1, -1, -1, -1, -1, -1, 1, 1, 1, -1, 1, -1, 1, -1, 1, -1, -1, 1, -1, -1, 1, -1, -1, -1, -1, -1, -1, -1, -1, 1, 1, -1, -1, -1, -1, -1, 1, 1, -1, 1, -1),
    Seq(-1, 1, 1, 1, -1, -1, -1, -1, -1, -1, 1, 1, 1, -1, 1, 1, 1, -1, -1, -1, -1, 1, -1, -1, 1, 1, 1, 1, -1, 1, -1, -1, 1, -1, -1, -1, -1, 1, -1, 1, 1, -1, 1, -1, -1, -1, 1, 1, 1, 1, -1, 1, -1, -1, -1, 1, -1, -1, -1, 1, -1, 1, -1, -1),
    Seq(1, -1, -1, -1, -1, -1, 1, -1, -1, -1, -1, -1, 1, -1, -1, 1, -1, -1, 1, -1, 1, 1, 1, 1, -1, 1, -1, 1, -1, 1, -1, -1, 1, 1, 1, -1, -1, -1, -1, 1, 1, 1, -1, 1, 1, 1, -1, -1, -1, 1, -1, 1, 1, 1, 1, -1, -1, 1, 1, -1, -1, 1, -1, -1),
    Seq(-1, -1, 1, -1, -1, -1, -1, 1, 1, 1, -1, 1, -1, -1, 1, -1, -1, -1, 1, -1, -1, -1, 1, 1, 1, -1, -1, -1, 1, 1, 1, -1, 1, -1, -1, 1, 1, 1, -1, 1, -1, -1, -1, 1, -1, -1, 1, -1, 1, -1, -1, 1, 1, 1, 1, 1, 1, 1, 1, 1, -1, -1, 1, 1),
    Seq(-1, 1, 1, 1, 1, -1, 1, -1, 1, 1, 1, 1, -1, 1, -1, 1, -1, 1, 1, -1, -1, 1, 1, 1, -1, 1, 1, 1, 1, 1, 1, -1, -1, -1, 1, 1, 1, -1, -1, -1, 1, -1, 1, 1, -1, 1, -1, 1, 1, 1, 1, -1, -1, -1, -1, -1, 1, -1, 1, -1, 1, -1, -1, -1),
    Seq(1, 1, 1, 1, -1, -1, -1, 1, 1, -1, -1, 1, -1, 1, 1, 1, 1, 1, 1, 1, 1, 1, -1, 1, -1, 1, -1, -1, 1, 1, -1, -1, -1, 1, -1, -1, -1, 1, 1, 1, -1, -1, -1, -1, 1, -1, -1, -1, -1, 1, -1, 1, -1, 1, -1, 1, 1, -1, 1, 1, 1, 1, 1, 1))
  private def hyperMatrix(planes: Int): String =
    hyperSigns.take(planes)
      .map(_.map(s => s"$s.0").mkString("[", ", ", "]"))
      .mkString("[", ", ", "]")
  /** The kernel's bucket: sign bits of per-plane projection folds. */
  private def hyperBucketExpr(vec: String, planes: Int): String =
    (0 until planes).map { p =>
      val proj = s"list_reduce(list_transform(range(1, 65), " +
        s"i -> CAST($vec[i] AS DOUBLE) * m[${p + 1}][i]), (a, b) -> a + b)"
      s"(CASE WHEN $proj > 0 THEN ${1 << p} ELSE 0 END)"
    }.mkString(" + ")

  private val langCase =
    """CASE WHEN greatest(he, hf, hd, hs) = 0 THEN 'und'
      |         WHEN he = greatest(he, hf, hd, hs) THEN 'en'
      |         WHEN hf = greatest(he, hf, hd, hs) THEN 'fr'
      |         WHEN hd = greatest(he, hf, hd, hs) THEN 'de'
      |         ELSE 'es' END""".stripMargin

  /** BM25 oracle: mirrors [[graft.operators.TextRank.bm25TopK]]'s
    * expression tree node for node — same token filter, same
    * left-assoc per-term fold, same left-to-right term sum in
    * sorted-term order, and fp constants emitted from the very same
    * Scala doubles (shortest-roundtrip repr → DuckDB parses the
    * identical bits). Only `ln` can drift (1 ulp between libms), which
    * the 6-dp rounding on BOTH sides absorbs; the ORDER BY and the
    * `> 0` filter run on the rounded value so the cut cannot diverge.
    */
  private def bm25Oracle(terms: Seq[String], k: Int,
                         k1: Double, b: Double): String = {
    val sorted = terms.distinct.sorted
    val tfCols = sorted.zipWithIndex.map { case (t, i) =>
      s"CAST(len(list_filter(toks, x -> x = '$t')) AS DOUBLE) AS tf$i"
    }.mkString(",\n    ")
    val dfCols = sorted.indices.map { i =>
      s"CAST(SUM(CASE WHEN tf$i > 0 THEN 1 ELSE 0 END) AS DOUBLE) AS df$i"
    }.mkString(",\n    ")
    val termScores = sorted.indices.map { i =>
      s"ln(((n - df$i) + 0.5) / (df$i + 0.5) + 1.0) * " +
        s"((tf$i * ${k1 + 1.0}) / (tf$i + $k1 * (${1.0 - b} + (($b * dl) / (sumdl / n)))))"
    }.mkString(" + ")
    s"""WITH d AS (
       |  SELECT doc_id,
       |    list_filter(string_split_regex(lower(text), '[^a-z0-9]+'), x -> x <> '') AS toks
       |  FROM documents),
       |t AS (
       |  SELECT doc_id, CAST(len(toks) AS DOUBLE) AS dl,
       |    $tfCols
       |  FROM d),
       |s AS (
       |  SELECT CAST(COUNT(*) AS DOUBLE) AS n, SUM(dl) AS sumdl,
       |    $dfCols
       |  FROM t)
       |SELECT doc_id, score FROM (
       |  SELECT doc_id, round($termScores, 6) AS score FROM t, s)
       |WHERE score > 0
       |ORDER BY score DESC, doc_id
       |LIMIT $k""".stripMargin
  }

  /** D101 Rocchio PRF oracle: pass 1 is [[bm25Oracle]] verbatim (top
    * kDocs docs), the expansion is the fully-ordered (count desc,
    * term asc) top-kExp non-seed non-stopword term pick, and pass 2
    * is the SAME BM25 arithmetic with the terms as a RELATION — the
    * per-doc sum folds in term order with a 0.0 seed, matching
    * Spark's sorted reduceLeft exactly (0.0 + t₁ ≡ t₁).
    */
  private def rocchioPrfOracle(seeds: Seq[String], kDocs: Int, kExp: Int,
                               k: Int, k1: Double, b: Double): String = {
    val excluded = (seeds ++ graft.functions.TextFunctions.LangMarkers.en)
      .distinct.map(t => s"'$t'").mkString(", ")
    val seedList = seeds.map(s => s"'$s'").mkString(", ")
    s"""WITH p1 AS (${bm25Oracle(seeds, kDocs, k1, b)}),
       |tk AS (
       |  SELECT doc_id,
       |    list_filter(string_split_regex(lower(text), '[^a-z0-9]+'),
       |      x -> x <> '') AS toks
       |  FROM documents),
       |exp_t AS (
       |  SELECT unnest(tk.toks) AS term FROM tk JOIN p1 USING (doc_id)),
       |expn AS (
       |  SELECT term FROM (
       |    SELECT term, COUNT(*) AS c FROM exp_t
       |    WHERE term NOT IN ($excluded) GROUP BY 1
       |    ORDER BY c DESC, term LIMIT $kExp)),
       |qterms AS (SELECT DISTINCT term FROM (
       |  SELECT term FROM expn
       |  UNION ALL SELECT unnest([$seedList]) AS term)),
       |tfr AS (SELECT tk.doc_id, q.term,
       |    CAST(len(list_filter(tk.toks, x -> x = q.term)) AS DOUBLE) AS tf,
       |    CAST(len(tk.toks) AS DOUBLE) AS dl
       |  FROM tk CROSS JOIN qterms q),
       |dfr AS (SELECT term,
       |    CAST(SUM(CASE WHEN tf > 0 THEN 1 ELSE 0 END) AS DOUBLE) AS df
       |  FROM tfr GROUP BY 1),
       |st AS (SELECT CAST(COUNT(*) AS DOUBLE) AS n,
       |    SUM(CAST(len(toks) AS DOUBLE)) AS sumdl FROM tk),
       |sc AS (SELECT tfr.doc_id, tfr.term,
       |    ln(((n - df) + 0.5) / (df + 0.5) + 1.0) *
       |      ((tf * ${k1 + 1.0}) / (tf + $k1 * (${1.0 - b}
       |        + (($b * dl) / (sumdl / n))))) AS ts
       |  FROM tfr JOIN dfr USING (term) CROSS JOIN st),
       |agg AS (SELECT doc_id,
       |    round(list_reduce(list_prepend(0.0, list(ts ORDER BY term)),
       |      (a, bb) -> a + bb), 6) AS score
       |  FROM sc GROUP BY doc_id)
       |SELECT doc_id, score FROM agg WHERE score > 0
       |ORDER BY score DESC, doc_id LIMIT $k""".stripMargin
  }

  /** ICWS weighted-minhash oracle (D83): replays
    * [[graft.operators.Dedup.weightedJaccardAudit]] bit-for-bit —
    * per-token XXH64 via the shared cd..hf chain, all five uniforms
    * per (token, sample) derived by splitmix64 from embedded
    * constants, Ioffe's r/c/β/t/ln a arithmetic in the engine's exact
    * association with ln a rounded to 6 dp BEFORE the argmin
    * (token-ordered tiebreak — the rank-on-rounded discipline), and
    * the sample value as the double-splitmix of (token hash, t).
    * Draw derivation runs per DISTINCT (token, tf) — token-level
    * volume — and each chain CTE is referenced once (the holdout
    * OOM lesson).
    */
  private def icwsOracle(k: Int): String = {
    def u64(x: Long) = java.lang.Long.toUnsignedString(x)
    val C0 = u64(0x9e3779b97f4a7c15L)
    val C1 = u64(0xbf58476d1ce4e5b9L)
    val C2 = u64(0x94d049bb133111ebL)
    def mixChain(baseQ: String, z0: String, out: String, p: String): String =
      Seq(
        s"(($z0) + $C0) % $M64 AS ${p}z1",
        s"${xorShift(s"${p}z1", 30)} AS ${p}x1",
        s"(${mul64(s"${p}x1", C1)}) % $M64 AS ${p}z2",
        s"${xorShift(s"${p}z2", 27)} AS ${p}x2",
        s"(${mul64(s"${p}x2", C2)}) % $M64 AS ${p}z3",
        s"${xorShift(s"${p}z3", 31)} AS $out")
        .foldLeft(baseQ) { (q, step) => s"SELECT *, $step FROM ($q)" }
    val draws = (0 until k).flatMap(s => (0 until 5).map(j =>
      s"($s, $j, CAST('${u64(graft.functions.GraftKernels.mix64((s * 5 + j).toLong))}' AS HUGEINT))"))
      .mkString(", ")
    val um = mixChain(
      "SELECT hf.sh, hf.hv, dr.s, dr.j, dr.mc FROM hf CROSS JOIN dr",
      "xor(CAST(hv AS HUGEINT), mc)", "m1", "a")
    val mt = mixChain("SELECT * FROM lt", "tu", "m2", "b")
    val vvq = mixChain("SELECT * FROM vv0", "xz", "vval", "c")
    s"""WITH t AS (
      |  SELECT doc_id, string_split_regex(trim(text), '\\s+') AS tk FROM documents),
      |cntw AS (
      |  SELECT doc_id, tok AS sh, COUNT(*) AS w
      |  FROM (SELECT doc_id, unnest(tk) AS tok FROM t) GROUP BY 1, 2),
      |dsh AS (SELECT DISTINCT sh FROM cntw),
      |$strXxh64Ctes
      |dr AS (SELECT * FROM (VALUES $draws) d(s, j, mc)),
      |uu AS (
      |  SELECT sh, hv, s, j,
      |    (CAST(m1 // 2048 AS DOUBLE) + 0.5) / 9007199254740992.0 AS uv
      |  FROM ($um)),
      |pv AS (
      |  SELECT sh, s, MAX(hv) AS hv,
      |    MAX(CASE WHEN j = 0 THEN uv END) AS u0,
      |    MAX(CASE WHEN j = 1 THEN uv END) AS u1,
      |    MAX(CASE WHEN j = 2 THEN uv END) AS u2,
      |    MAX(CASE WHEN j = 3 THEN uv END) AS u3,
      |    MAX(CASE WHEN j = 4 THEN uv END) AS u4
      |  FROM uu GROUP BY sh, s),
      |dw AS (SELECT DISTINCT sh, w FROM cntw),
      |tv AS (
      |  SELECT sh, hv, s, w, r, lnc, beta,
      |    floor(ln(CAST(w AS DOUBLE)) / r + beta) AS tt
      |  FROM (
      |    SELECT p.sh, p.hv, p.s, d.w,
      |      -ln(u0 * u1) AS r, ln(-ln(u2 * u3)) AS lnc, u4 AS beta
      |    FROM pv p JOIN dw d ON d.sh = p.sh)),
      |lt AS (
      |  SELECT sh, hv, s, w,
      |    round(lnc - r * (tt - beta) - r, 6) AS lna6,
      |    ((CAST(CAST(tt AS BIGINT) AS HUGEINT) % $M64) + $M64) % $M64 AS tu
      |  FROM tv),
      |vv0 AS (
      |  SELECT sh, s, w, lna6,
      |    xor(CAST(hv AS HUGEINT), CAST(m2 AS HUGEINT)) AS xz
      |  FROM ($mt)),
      |vv AS (SELECT sh, s, w, lna6, vval FROM ($vvq)),
      |sv AS (
      |  SELECT doc_id, s, vval FROM (
      |    SELECT c.doc_id, v.s, v.vval,
      |      row_number() OVER (PARTITION BY c.doc_id, v.s
      |        ORDER BY v.lna6, v.sh) AS rn
      |    FROM cntw c JOIN vv v ON v.sh = c.sh AND v.w = c.w)
      |  WHERE rn = 1),
      |ag AS (
      |  SELECT a.doc_id AS id_a,
      |    SUM(CASE WHEN a.vval = b.vval THEN 1 ELSE 0 END) AS cnt
      |  FROM sv a JOIN sv b ON b.doc_id = a.doc_id + 1 AND b.s = a.s
      |  GROUP BY 1),
      |exw AS (
      |  SELECT COALESCE(ca.id_a, cb.id_a) AS id_a,
      |    SUM(least(COALESCE(ca.w, 0), COALESCE(cb.w, 0))) AS mins,
      |    SUM(greatest(COALESCE(ca.w, 0), COALESCE(cb.w, 0))) AS maxs
      |  FROM (SELECT doc_id AS id_a, sh, w FROM cntw) ca
      |  FULL OUTER JOIN (SELECT doc_id - 1 AS id_a, sh, w FROM cntw) cb
      |    ON ca.id_a = cb.id_a AND ca.sh = cb.sh
      |  GROUP BY 1)
      |SELECT ag.id_a, ag.id_a + 1 AS id_b,
      |  CAST(exw.mins AS DOUBLE) / CAST(exw.maxs AS DOUBLE) AS jw_exact,
      |  CAST(ag.cnt AS DOUBLE) / $k.0 AS jw_icws
      |FROM ag JOIN exw ON exw.id_a = ag.id_a
      |ORDER BY ag.id_a""".stripMargin
  }

  /** Bootstrap CI oracle (D82): the proven quality-micro chain + the
    * D68 uniform replay per (doc, replica) — ONE linear pass through
    * the hash chain (the holdout lesson: never join the inlined chain
    * against a big frame) — the SAME Poisson(1) CDF constants emitted
    * from [[graft.operators.Bootstrap.cum]], exact-integer replica
    * sums, and the explicit lo/hi rank convention.
    */
  /** Shared by `corpus_drift` and its E14 streaming face
    * `stream_drift_psi` — the stream merges additive per-batch bucket
    * counts and finishes through the literally-same `psiFromCounts`
    * expression tree, so one SQL proves both bit-identical.
    */
  private val corpusDriftSql: String =
    """WITH d AS (
      |  SELECT lang, CAST(substr(source, 4) AS INT) AS sn FROM documents),
      |r AS (SELECT lang AS bucket, COUNT(*) AS ref_n FROM d
      |  WHERE sn < 10 GROUP BY lang),
      |c AS (SELECT lang AS bucket, COUNT(*) AS cur_n FROM d
      |  WHERE sn >= 10 GROUP BY lang),
      |j AS (SELECT COALESCE(r.bucket, c.bucket) AS bucket,
      |    CAST(COALESCE(ref_n, 0) AS BIGINT) AS ref_n,
      |    CAST(COALESCE(cur_n, 0) AS BIGINT) AS cur_n
      |  FROM r FULL OUTER JOIN c ON r.bucket = c.bucket),
      |t AS (SELECT SUM(ref_n) AS rt, SUM(cur_n) AS ct,
      |    COUNT(*) AS k FROM j),
      |s AS (SELECT bucket, ref_n, cur_n,
      |    CAST(ref_n + 1 AS DOUBLE) / CAST(rt + k AS DOUBLE) AS p,
      |    CAST(cur_n + 1 AS DOUBLE) / CAST(ct + k AS DOUBLE) AS q
      |  FROM j CROSS JOIN t)
      |SELECT bucket, ref_n, cur_n, round(p, 6) AS p, round(q, 6) AS q,
      |  round((p - q) * ln(p / q), 6) AS psi_term
      |FROM s ORDER BY bucket""".stripMargin

  /** Shared by `mad_outliers` and its E17 streaming face
    * `stream_robust_flags` — the stream flags under stats frozen from
    * the same corpus, a pure per-row decision, so one SQL proves
    * both. Median + MAD off the same cent-bucket histograms; the flag
    * is an all-integer compare (dev > 3·mad in buckets) so no double
    * boundary can diverge; MAD-0 groups flag nothing (mirrored guard).
    */
  /** Shared by `ab_welch_ttest` and its E24 streaming face
    * `stream_ab_ttest` — the stream merges additive sufficient
    * rows and runs the literally-same finisher, so one SQL
    * proves both. */
  private val welchTTestSql: String =
    """WITH p AS (SELECT user_id % 2 AS arm,
        |    CAST(value AS DECIMAL(18,2)) AS v
        |  FROM events WHERE event_type = 'purchase'),
        |a AS (SELECT
        |    CAST(SUM(CASE WHEN arm = 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_a,
        |    CAST(SUM(CASE WHEN arm = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_b,
        |    CAST(SUM(CASE WHEN arm = 0 THEN v END) AS DOUBLE) AS sa,
        |    CAST(SUM(CASE WHEN arm = 1 THEN v END) AS DOUBLE) AS sb,
        |    CAST(SUM(CASE WHEN arm = 0 THEN v * v END) AS DOUBLE) AS ssa,
        |    CAST(SUM(CASE WHEN arm = 1 THEN v * v END) AS DOUBLE) AS ssb
        |  FROM p),
        |s AS (SELECT n_a, n_b, sa, sb,
        |    (ssa - sa * sa / n_a) / (n_a - 1.0) AS va,
        |    (ssb - sb * sb / n_b) / (n_b - 1.0) AS vb
        |  FROM a),
        |e AS (SELECT *, va / n_a + vb / n_b AS se2 FROM s)
        |SELECT n_a, n_b,
        |  round(sa / n_a, 6) AS mean_a, round(sb / n_b, 6) AS mean_b,
        |  CASE WHEN n_a >= 2 AND n_b >= 2 AND se2 > 0.0 THEN
        |    round((sa / n_a - sb / n_b) / sqrt(se2), 6) END AS t_stat,
        |  CASE WHEN n_a >= 2 AND n_b >= 2 AND se2 > 0.0 THEN
        |    round(se2 * se2 / (pow(va / n_a, 2) / (n_a - 1.0)
        |      + pow(vb / n_b, 2) / (n_b - 1.0)), 6) END AS df
        |FROM e""".stripMargin

  /** Shared by `signal_correlation` and its E21 gated stream
    * face `stream_signal_matrix` — additive integer sufficient
    * statistics + the same finisher, one SQL proves both. */
  private val signalCorrelationSql: String = {
      def p(a: String, b: String, sx: String, sy: String,
            sxx: String, syy: String, sxy: String) = {
        val dx = s"(CAST(n AS DOUBLE) * CAST($sxx AS DOUBLE)" +
          s" - CAST($sx AS DOUBLE) * CAST($sx AS DOUBLE))"
        val dy = s"(CAST(n AS DOUBLE) * CAST($syy AS DOUBLE)" +
          s" - CAST($sy AS DOUBLE) * CAST($sy AS DOUBLE))"
        s"""SELECT '$a' AS signal_a, '$b' AS signal_b, n,
           |    CASE WHEN $dx = 0.0 OR $dy = 0.0 THEN NULL
           |    ELSE (CAST(n AS DOUBLE) * CAST($sxy AS DOUBLE)
           |       - CAST($sx AS DOUBLE) * CAST($sy AS DOUBLE))
           |    / (sqrt($dx) * sqrt($dy)) END
           |      AS pearson_r
           |  FROM s"""
      }
      s"""WITH t AS (
        |  SELECT doc_id, string_split_regex(trim(text), '\\s+') AS tk,
        |    string_split_regex(
        |      regexp_replace(text, '^\\s+|\\s+$$', '', 'g'), '\\s+') AS tk2
        |  FROM documents),
        |c AS (
        |  SELECT doc_id,
        |    CAST(len(tk) AS DOUBLE) AS n,
        |    CAST(len(list_distinct(tk)) AS DOUBLE) AS u,
        |    CAST(len(list_filter(tk, x -> list_contains(
        |      ['the','a','of','and','to','in','is'], x))) AS DOUBLE) AS h,
        |    CAST(len(tk) AS BIGINT) AS ntok,
        |    list_transform(range(1, greatest(len(tk2) - 1, 1)),
        |      i -> tk2[i] || ' ' || tk2[i+1] || ' ' || tk2[i+2]) AS g
        |  FROM t),
        |m AS (
        |  SELECT
        |    CAST(round((0.4 * least(n / 64.0, 1.0) + 0.4 * (u / n)
        |      + 0.2 * least((h / n) * 8.0, 1.0)) * 1000000.0) AS BIGINT) AS q,
        |    CAST(round((CASE WHEN len(g) = 0 THEN 0.0
        |      ELSE CAST(len(g) - len(list_distinct(g)) AS DOUBLE)
        |           / CAST(len(g) AS DOUBLE) END) * 1000000.0) AS BIGINT) AS r,
        |    ntok AS tokl
        |  FROM c),
        |s AS (
        |  SELECT COUNT(*) AS n,
        |    SUM(q) AS sq, SUM(r) AS sr, SUM(tokl) AS st,
        |    SUM(q*q) AS sqq, SUM(r*r) AS srr, SUM(tokl*tokl) AS stt,
        |    SUM(q*r) AS sqr, SUM(q*tokl) AS sqt, SUM(r*tokl) AS srt
        |  FROM m)
        |SELECT signal_a, signal_b, n, pearson_r FROM (
        |  ${p("quality", "repetition", "sq", "sr", "sqq", "srr", "sqr")}
        |  UNION ALL ${p("quality", "tokens", "sq", "st", "sqq", "stt", "sqt")}
        |  UNION ALL ${p("repetition", "tokens", "sr", "st", "srr", "stt", "srt")})
        |ORDER BY signal_a, signal_b""".stripMargin
    }

  /** D103 Heaps-law oracle: first-occurrence vocabulary counts at the
    * 10 integer thresholds, then the OLS chain in the SAME textual
    * order as the Spark reduceLeft (left-assoc ln sums).
    */
  private def heapsOracle: String = {
    def thr(i: Int) = s"(lo + ((hi - lo) * $i) // 10)"
    val vLegs = (1 to 10).map(i =>
      s"CAST(SUM(CASE WHEN fd <= ${thr(i)} THEN 1 ELSE 0 END) AS BIGINT) AS v$i")
      .mkString(",\n      ")
    val dLegs = (1 to 10).map(i =>
      s"CAST(SUM(CASE WHEN doc_id <= ${thr(i)} THEN 1 ELSE 0 END) AS BIGINT) AS d$i")
      .mkString(",\n      ")
    val sx = (1 to 10).map(i => s"ln(CAST(d$i AS DOUBLE))").mkString(" + ")
    val sy = (1 to 10).map(i => s"ln(CAST(v$i AS DOUBLE))").mkString(" + ")
    val sxy = (1 to 10).map(i =>
      s"ln(CAST(d$i AS DOUBLE)) * ln(CAST(v$i AS DOUBLE))").mkString(" + ")
    val sxx = (1 to 10).map(i =>
      s"ln(CAST(d$i AS DOUBLE)) * ln(CAST(d$i AS DOUBLE))").mkString(" + ")
    s"""WITH tk AS (
       |  SELECT doc_id, unnest(list_filter(
       |    string_split_regex(lower(text), '[^a-z0-9]+'), x -> x <> ''))
       |    AS term
       |  FROM documents),
       |ft AS (SELECT term, MIN(doc_id) AS fd FROM tk GROUP BY 1),
       |b AS (SELECT MIN(doc_id) AS lo, MAX(doc_id) AS hi FROM documents),
       |v AS (SELECT
       |      $vLegs
       |  FROM ft CROSS JOIN b),
       |d AS (SELECT
       |      $dLegs
       |  FROM documents CROSS JOIN b),
       |j AS (SELECT * FROM v CROSS JOIN d),
       |o AS (SELECT d10, v10,
       |    ($sx) AS sx, ($sy) AS sy, ($sxy) AS sxy, ($sxx) AS sxx
       |  FROM j)
       |SELECT d10 AS n_docs, v10 AS vocab,
       |  CASE WHEN 10.0 * sxx - sx * sx > 0.0 THEN
       |    round((10.0 * sxy - sx * sy) / (10.0 * sxx - sx * sx), 6)
       |  END AS beta,
       |  CASE WHEN 10.0 * sxx - sx * sx > 0.0 THEN
       |    round((sy - (10.0 * sxy - sx * sy) / (10.0 * sxx - sx * sx)
       |      * sx) / 10.0, 6)
       |  END AS ln_k
       |FROM o""".stripMargin
  }

  /** Shared by `mixture_resample` and its E13 stream face — admission
    * is a pure function of (doc_id, frozen fraction), so the admitted
    * stream equals the batch resample row-for-row. */
  private val mixtureResampleSql: String =
    s"""WITH t AS (
      |  SELECT doc_id, string_split_regex(trim(text), '\\s+') AS tk FROM documents),
      |hh AS (
      |  SELECT doc_id,
      |    len(list_filter(tk, x -> list_contains(['the','a','of','and','to','in','is'], x))) AS he,
      |    len(list_filter(tk, x -> list_contains(['le','la','et','les','des','un','une'], x))) AS hf,
      |    len(list_filter(tk, x -> list_contains(['der','die','und','das','ein','nicht'], x))) AS hd,
      |    len(list_filter(tk, x -> list_contains(['el','los','y','que','un','una','en'], x))) AS hs
      |  FROM t),
      |lang AS (
      |  SELECT doc_id, $langCase AS pred_lang
      |  FROM hh),
      |h AS (
      |  SELECT doc_id, $xxhBucket AS bucket
      |  FROM (${xxh64Nested("SELECT doc_id FROM documents", "doc_id")}))
      |SELECT doc_id, pred_lang
      |FROM lang JOIN h USING (doc_id)
      |WHERE CAST(bucket AS DOUBLE) <
      |  CASE pred_lang WHEN 'en' THEN 0.5 WHEN 'fr' THEN 1.0 WHEN 'de' THEN 0.25
      |                 WHEN 'es' THEN 0.75 ELSE 0.1 END * 1000000
      |ORDER BY doc_id""".stripMargin

  /** Shared by `paragraph_dedup` and its E15 stream face — stripping
    * against the frozen digest set is a per-doc pure function, so
    * stream ≡ batch exactly.
    *
    * D53: fixed 12-word paragraphs; a paragraph is boilerplate iff
    * its text occurs in >= 2 distinct docs; survivors reassemble in
    * order. (range() can't take lateral column args — join-filter
    * against the max paragraph count, 16 covers the 99-token max.)
    */
  private val paragraphDedupSql: String =
    """WITH toks AS (SELECT doc_id,
      |    string_split_regex(trim(text), '\s+') AS tk FROM documents),
      |paras AS (
      |  SELECT t.doc_id, i.i AS para_idx,
      |    array_to_string(tk[(i.i*12+1):(i.i*12+12)], ' ') AS para
      |  FROM toks t JOIN range(0, 16) AS i(i)
      |    ON i.i < CAST(ceil(len(tk)/12.0) AS BIGINT)),
      |dup AS (SELECT para FROM paras
      |  GROUP BY para HAVING COUNT(DISTINCT doc_id) >= 2),
      |kept AS (SELECT * FROM paras WHERE para NOT IN (SELECT para FROM dup)),
      |agg AS (SELECT doc_id, COUNT(*) AS n_kept,
      |  string_agg(para, ' ' ORDER BY para_idx) AS clean_text
      |  FROM kept GROUP BY doc_id)
      |SELECT d.doc_id,
      |  CAST(ceil(len(string_split_regex(trim(d.text), '\s+'))/12.0) AS BIGINT)
      |    AS n_paras,
      |  CAST(COALESCE(a.n_kept, 0) AS BIGINT) AS n_kept,
      |  COALESCE(a.clean_text, '') AS clean_text
      |FROM documents d LEFT JOIN agg a USING (doc_id)
      |ORDER BY d.doc_id""".stripMargin

  /** Shared by `source_concentration` and its E25 stream face —
    * additive group counts + the same finisher, one SQL proves
    * both. */
  private val sourceConcentrationSql: String =
    """WITH c AS (SELECT source AS k, COUNT(*) AS c
        |  FROM documents GROUP BY 1),
        |r AS (SELECT k, c,
        |    CAST(ROW_NUMBER() OVER (ORDER BY c ASC, k ASC) AS HUGEINT) AS i
        |  FROM c),
        |a AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_groups,
        |    CAST(SUM(c) AS BIGINT) AS total,
        |    SUM(i * c) AS ric, SUM(CAST(c AS HUGEINT) * c) AS c2,
        |    CAST(MAX(c) AS BIGINT) AS cmax
        |  FROM r)
        |SELECT n_groups, total,
        |  CASE WHEN n_groups > 0 AND total > 0 THEN
        |    round((2.0 * CAST(ric AS DOUBLE)
        |      - (CAST(n_groups AS DOUBLE) + 1.0) * CAST(total AS DOUBLE))
        |      / (CAST(n_groups AS DOUBLE) * CAST(total AS DOUBLE)), 6)
        |  END AS gini,
        |  CASE WHEN total > 0 THEN
        |    round(CAST(c2 AS DOUBLE)
        |      / (CAST(total AS DOUBLE) * CAST(total AS DOUBLE)), 6)
        |  END AS hhi,
        |  CASE WHEN total > 0 THEN
        |    round(CAST(cmax AS DOUBLE) / CAST(total AS DOUBLE), 6)
        |  END AS top_share
        |FROM a""".stripMargin

  private val madOutliersSql: String =
    """WITH b AS (SELECT event_id, event_type, value,
      |    CAST(floor(value * 100.0) AS BIGINT) AS bk FROM events),
      |h AS (SELECT event_type, bk, COUNT(*) AS c FROM b GROUP BY 1, 2),
      |cumt AS (SELECT event_type, bk,
      |    SUM(c) OVER (PARTITION BY event_type ORDER BY bk
      |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum,
      |    SUM(c) OVER (PARTITION BY event_type) AS total
      |  FROM h),
      |med AS (SELECT event_type,
      |    MIN(CASE WHEN cum >= 0.5 * total THEN bk END) AS med_bk
      |  FROM cumt GROUP BY 1),
      |dh AS (SELECT h.event_type, abs(bk - med_bk) AS dev, SUM(c) AS c
      |  FROM h JOIN med USING (event_type) GROUP BY 1, 2),
      |dcum AS (SELECT event_type, dev,
      |    SUM(c) OVER (PARTITION BY event_type ORDER BY dev
      |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum,
      |    SUM(c) OVER (PARTITION BY event_type) AS total
      |  FROM dh),
      |mad AS (SELECT event_type,
      |    MIN(CASE WHEN cum >= 0.5 * total THEN dev END) AS mad_bk
      |  FROM dcum GROUP BY 1)
      |SELECT event_id, b.event_type, value,
      |  med_bk / 100.0 AS median, mad_bk / 100.0 AS mad,
      |  (mad_bk > 0 AND abs(bk - med_bk) > 3 * mad_bk) AS is_outlier
      |FROM b JOIN med USING (event_type) JOIN mad USING (event_type)
      |ORDER BY event_id""".stripMargin

  private def bootstrapOracle(replicas: Int, alpha: Double): String = {
    val lo = math.ceil(alpha * replicas).toInt
    val hi = replicas - lo + 1
    def d(x: Double) = s"CAST('$x' AS DOUBLE)"
    val whens = graft.operators.Bootstrap.cum.zipWithIndex
      .map { case (c, k) => s"WHEN uu < ${d(c)} THEN $k" }.mkString(" ")
    val inner = xxh64Nested(
      s"SELECT doc_id, qm, b, doc_id * $replicas + b AS idx FROM r", "idx")
    s"""WITH t AS (
      |  SELECT doc_id, string_split_regex(trim(text), '\\s+') AS tk FROM documents),
      |c AS (
      |  SELECT doc_id,
      |    CAST(len(tk) AS DOUBLE) AS n,
      |    CAST(len(list_distinct(tk)) AS DOUBLE) AS u,
      |    CAST(len(list_filter(tk, x -> list_contains(
      |      ['the','a','of','and','to','in','is'], x))) AS DOUBLE) AS h
      |  FROM t),
      |q AS (
      |  SELECT doc_id,
      |    CAST(round((0.4 * least(n / 64.0, 1.0) + 0.4 * (u / n)
      |      + 0.2 * least((h / n) * 8.0, 1.0)) * 1000000.0) AS BIGINT) AS qm
      |  FROM c),
      |r AS (SELECT doc_id, qm, unnest(range(0, $replicas)) AS b FROM q),
      |hh AS ($inner),
      |w AS (
      |  SELECT b, qm, CASE $whens ELSE 8 END AS w
      |  FROM (SELECT b, qm,
      |      (CAST(hout // 2048 AS DOUBLE) + 0.5) / 9007199254740992.0 AS uu
      |    FROM hh)),
      |m AS (
      |  SELECT b, CAST(SUM(w * qm) AS DOUBLE) / CAST(SUM(w) AS DOUBLE) AS mb
      |  FROM w GROUP BY b),
      |arr AS (SELECT list_sort(list(mb)) AS a, COUNT(*) AS n_replicas FROM m),
      |mn AS (SELECT round(CAST(SUM(qm) AS DOUBLE) / CAST(COUNT(*) AS DOUBLE), 6)
      |  AS mean FROM q)
      |SELECT n_replicas, mean, a[$lo] AS ci_lo, a[$hi] AS ci_hi
      |FROM arr CROSS JOIN mn""".stripMargin
  }

  /** Query-likelihood oracle: mirrors
    * [[graft.operators.TextRank.queryLikelihoodTopK]] node for node —
    * same token filter, same sorted-term left-to-right sum, same
    * (μ·cf/|C|) association; only `ln` can drift (1 ulp between
    * libms), absorbed by the 6-dp rounding that runs before ORDER BY
    * on both sides.
    */
  private def qlOracle(terms: Seq[String], k: Int, mu: Double): String = {
    val sorted = terms.distinct.sorted
    val tfCols = sorted.zipWithIndex.map { case (t, i) =>
      s"CAST(len(list_filter(toks, x -> x = '$t')) AS DOUBLE) AS tf$i"
    }.mkString(",\n    ")
    val cfCols = sorted.indices.map(i => s"SUM(tf$i) AS cf$i")
      .mkString(",\n    ")
    val termScores = sorted.indices.map { i =>
      s"ln((tf$i + $mu * cf$i / sumdl) / (dl + $mu))"
    }.mkString(" + ")
    s"""WITH d AS (
       |  SELECT doc_id,
       |    list_filter(string_split_regex(lower(text), '[^a-z0-9]+'), x -> x <> '') AS toks
       |  FROM documents),
       |t AS (
       |  SELECT doc_id, CAST(len(toks) AS DOUBLE) AS dl,
       |    $tfCols
       |  FROM d),
       |s AS (
       |  SELECT SUM(dl) AS sumdl,
       |    $cfCols
       |  FROM t)
       |SELECT doc_id, round($termScores, 6) AS score FROM t, s
       |ORDER BY score DESC, doc_id
       |LIMIT $k""".stripMargin
  }

  /** Profile oracle: one UNION ALL branch per column, numerics
    * canonicalized through DECIMAL(38,6) exactly like
    * [[graft.operators.Profile.profile]].
    */
  private def profileOracle(table: String, cols: Seq[String],
                            numeric: Set[String]): String = {
    val branches = cols.map { c =>
      val canon = (e: String) =>
        if (numeric(c)) s"CAST(CAST($e AS DECIMAL(38,6)) AS VARCHAR)"
        else s"CAST($e AS VARCHAR)"
      s"""SELECT '$c' AS col_name, COUNT(*) AS n_rows,
         |  COUNT(*) - COUNT($c) AS n_nulls,
         |  COUNT(DISTINCT $c) AS n_distinct,
         |  ${canon(s"MIN($c)")} AS min_val,
         |  ${canon(s"MAX($c)")} AS max_val FROM $table""".stripMargin
    }.mkString("\nUNION ALL\n")
    s"SELECT * FROM (\n$branches\n) ORDER BY col_name"
  }

  /** EWMA oracle: DuckDB's `list_reduce` seeds from the first element
    * and folds left — exactly [[graft.operators.Ewma.smooth]]'s
    * `aggregate(slice(…, 2, n−1), first, …)`. The α constants are
    * emitted from the same Scala doubles (shortest-roundtrip repr), and
    * every fold step is IEEE +,· — bit-identical across engines.
    */
  private def ewmaOracle(alpha: Double): String = {
    val a = alpha.toString
    val b = (1.0 - alpha).toString
    s"""WITH daily AS (
       |  SELECT user_id, date_trunc('day', ts) AS day,
       |    SUM(CAST(value AS DECIMAL(12,2))) AS dval
       |  FROM events GROUP BY 1, 2),
       |arr AS (
       |  SELECT user_id, list(CAST(dval AS DOUBLE) ORDER BY day) AS vals
       |  FROM daily GROUP BY 1)
       |SELECT user_id, CAST(len(vals) AS INTEGER) AS n_periods,
       |  list_reduce(vals, (acc, x) -> ($a * x) + ($b * acc)) AS ewma
       |FROM arr ORDER BY user_id""".stripMargin
  }

  /** Holt oracle: the two-component (level, trend) fold as a
    * list_reduce over list-typed elements (the vocabTokenize
    * accumulator trick — init state prepended, inputs lifted to
    * [x, 0.0]); `newl` appears textually twice where the engine
    * computes it once — identical bits either way. Same α/β literal
    * treatment as [[ewmaOracle]].
    */
  private def holtOracle(alpha: Double, beta: Double): String = {
    val a = alpha.toString; val oa = (1.0 - alpha).toString
    val b = beta.toString; val ob = (1.0 - beta).toString
    val newl = s"($a * e[1]) + ($oa * (acc[1] + acc[2]))"
    s"""WITH daily AS (
       |  SELECT user_id, date_trunc('day', ts) AS day,
       |    SUM(CAST(value AS DECIMAL(12,2))) AS dval
       |  FROM events GROUP BY 1, 2),
       |arr AS (
       |  SELECT user_id, list(CAST(dval AS DOUBLE) ORDER BY day) AS vals
       |  FROM daily GROUP BY 1),
       |f AS (
       |  SELECT user_id, CAST(len(vals) AS INTEGER) AS n_periods,
       |    list_reduce(
       |      list_prepend(
       |        [vals[1], CASE WHEN len(vals) >= 2
       |                       THEN vals[2] - vals[1] ELSE 0.0 END],
       |        list_transform(vals[2:], x -> [x, 0.0])),
       |      (acc, e) -> [$newl,
       |        ($b * (($newl) - acc[1])) + ($ob * acc[2])]) AS st
       |  FROM arr)
       |SELECT user_id, n_periods, st[1] AS level, st[2] AS trend,
       |  st[1] + st[2] AS forecast
       |FROM f ORDER BY user_id""".stripMargin
  }

  /** Holt–Winters oracle: the [l, b, t, s_1..s_m] accumulator rides a
    * DOUBLE list; fold items lift to [x]; the seasonal slot updates
    * through DuckDB's 1-based indexed list lambda (Spark's transform
    * is 0-based — the +1 offset is the only difference); `newl` is
    * textually duplicated where the engine computes it once —
    * identical bits (the C61 argument).
    */
  private def holtWintersOracle(alpha: Double, beta: Double,
                                gamma: Double, m: Int): String = {
    val a = alpha.toString; val oa = (1.0 - alpha).toString
    val b = beta.toString; val ob = (1.0 - beta).toString
    val g = gamma.toString; val og = (1.0 - gamma).toString
    val slot = s"(((CAST(acc[3] + 1.0 AS INTEGER) - 1) % $m) + 1)"
    val sOld = s"acc[$slot + 3]"
    val newl = s"($a * (e[1] - $sOld)) + ($oa * (acc[1] + acc[2]))"
    val newb = s"($b * (($newl) - acc[1])) + ($ob * acc[2])"
    val news = s"($g * (e[1] - ($newl))) + ($og * $sOld)"
    val nextIdx = s"((CAST(len(vals) AS INTEGER) % $m) + 1 + 3)"
    s"""WITH daily AS (
       |  SELECT event_type, date_trunc('day', ts) AS day,
       |    SUM(CAST(value AS DECIMAL(12,2))) AS dval
       |  FROM events GROUP BY 1, 2),
       |arr AS (
       |  SELECT event_type, list(CAST(dval AS DOUBLE) ORDER BY day) AS vals
       |  FROM daily GROUP BY 1),
       |ok AS (SELECT * FROM arr WHERE len(vals) >= ${2 * m}),
       |ini AS (
       |  SELECT event_type, vals,
       |    list_reduce(list_prepend(0.0, vals[1:$m]),
       |      (x, y) -> x + y) / $m AS l0,
       |    list_reduce(list_prepend(0.0,
       |      list_transform(range(1, ${m + 1}), i -> vals[i + $m] - vals[i])),
       |      (x, y) -> x + y) / ${m * m} AS b0
       |  FROM ok),
       |f AS (
       |  SELECT event_type, CAST(len(vals) AS INTEGER) AS n_periods, vals,
       |    list_reduce(
       |      list_prepend(
       |        list_concat([l0, b0, CAST($m AS DOUBLE)],
       |          list_transform(vals[1:$m], x -> x - l0)),
       |        list_transform(vals[${m + 1}:], x -> [x])),
       |      (acc, e) -> list_transform(acc, (v, i) -> CASE
       |        WHEN i = 1 THEN $newl
       |        WHEN i = 2 THEN $newb
       |        WHEN i = 3 THEN acc[3] + 1.0
       |        WHEN i = $slot + 3 THEN $news
       |        ELSE v END)) AS st
       |  FROM ini)
       |SELECT event_type, n_periods, st[1] AS level, st[2] AS trend,
       |  st[$nextIdx] AS season_next,
       |  st[1] + st[2] + st[$nextIdx] AS forecast
       |FROM f ORDER BY event_type""".stripMargin
  }

  /** Greedy-tokenizer oracle: the kernel's recurrence as a list_reduce
    * fold — acc = [count, skip] rides the element type (the init row
    * [[0,0]] is prepended because DuckDB's list_reduce seeds from the
    * first element). Longest-match checks mirror the HOF twin's
    * coalesce chain: substr truncation near the string end makes the
    * longer branches find shorter candidates exactly like the kernel's
    * m = min(maxLen, n-i) bound. Pure string/integer ops — bit-exact.
    */
  private def vocabTokenizeOracle(vocab: Seq[String], maxLen: Int): String = {
    // SQL-escape entries — an apostrophe vocab entry ("'s") is
    // plausible for English subwords and must not break the generator
    val vlit = vocab.filter(_.length >= 2)
      .map(v => s"'${v.replace("'", "''")}'").mkString("[", ", ", "]")
    val whens = (maxLen to 2 by -1).map { l =>
      s"WHEN list_contains($vlit, substr(w, CAST(x[1] AS INTEGER), $l)) " +
        s"THEN substr(w, CAST(x[1] AS INTEGER), $l)"
    }.mkString(" ")
    val tok = s"CASE $whens ELSE substr(w, CAST(x[1] AS INTEGER), 1) END"
    s"""WITH t AS (
       |  SELECT doc_id, string_split_regex(trim(text), '\\s+') AS ws FROM documents),
       |c AS (
       |  SELECT doc_id, CAST(len(ws) AS INTEGER) AS n_words,
       |    list_transform(ws, w ->
       |      list_reduce(
       |        [[CAST(0 AS BIGINT), CAST(0 AS BIGINT)]]
       |          || list_transform(range(1, len(w) + 1), i -> [i, CAST(0 AS BIGINT)]),
       |        (acc, x) -> CASE WHEN acc[2] > 0 THEN [acc[1], acc[2] - 1]
       |          ELSE [acc[1] + 1, CAST(len($tok) AS BIGINT) - 1] END
       |      )[1]) AS counts
       |  FROM t)
       |SELECT doc_id, n_words,
       |  CAST(list_sum(counts) AS INTEGER) AS n_subtokens
       |FROM c ORDER BY doc_id""".stripMargin
  }

  /** OOV-rate oracle: the [[vocabTokenizeOracle]] fold with a
    * 3-element accumulator [pieces, fallbacks, skip] — the fallback
    * counter increments exactly when the greedy CASE emitted a
    * 1-char piece (every vocab entry is ≥2 chars, so length 1 ⇔
    * fallback). Per-word triples sum per doc, then per language;
    * the one divide rounds 6 dp on both engines.
    */
  private def vocabOovOracle(vocab: Seq[String], maxLen: Int): String = {
    val vlit = vocab.filter(_.length >= 2)
      .map(v => s"'${v.replace("'", "''")}'").mkString("[", ", ", "]")
    val whens = (maxLen to 2 by -1).map { l =>
      s"WHEN list_contains($vlit, substr(w, CAST(x[1] AS INTEGER), $l)) " +
        s"THEN substr(w, CAST(x[1] AS INTEGER), $l)"
    }.mkString(" ")
    val tok = s"CASE $whens ELSE substr(w, CAST(x[1] AS INTEGER), 1) END"
    s"""WITH t AS (
       |  SELECT lang, string_split_regex(trim(text), '\\s+') AS ws FROM documents),
       |c AS (
       |  SELECT lang,
       |    list_transform(ws, w ->
       |      list_reduce(
       |        [[CAST(0 AS BIGINT), CAST(0 AS BIGINT), CAST(0 AS BIGINT)]]
       |          || list_transform(range(1, len(w) + 1),
       |               i -> [i, CAST(0 AS BIGINT), CAST(0 AS BIGINT)]),
       |        (acc, x) -> CASE WHEN acc[3] > 0 THEN [acc[1], acc[2], acc[3] - 1]
       |          ELSE [acc[1] + 1,
       |                acc[2] + (CASE WHEN len($tok) = 1 THEN 1 ELSE 0 END),
       |                CAST(len($tok) AS BIGINT) - 1] END
       |      )) AS cs
       |  FROM t),
       |a AS (
       |  SELECT lang,
       |    list_sum(list_transform(cs, c -> c[1])) AS np,
       |    list_sum(list_transform(cs, c -> c[2])) AS nf
       |  FROM c)
       |SELECT lang, CAST(SUM(np) AS BIGINT) AS n_pieces,
       |  CAST(SUM(nf) AS BIGINT) AS n_fallback,
       |  round(CAST(SUM(nf) AS DOUBLE) / CAST(SUM(np) AS DOUBLE), 6) AS oov_rate
       |FROM a GROUP BY lang ORDER BY lang""".stripMargin
  }

  /** Token-ID oracle: the [[vocabTokenizeOracle]] fold with a LIST
    * accumulator — acc = [skip] ‖ ids-so-far (uniform BIGINT[], so it
    * rides list_reduce's element type like the count fold's [count,
    * skip] pair). In-vocab ids mirror `list_position − 1` against the
    * SAME ordered effective vocab the Spark map literal indexes;
    * fallback ids are `V + ascii(tok)` — `ascii` is the Unicode
    * codepoint of a 1-char string in both engines on this corpus's
    * BMP text. Pure string/integer ops — exact.
    */
  private def vocabTokenizeIdsOracle(vocab: Seq[String], maxLen: Int): String = {
    val effective = vocab.filter(v => v.codePointCount(0, v.length) >= 2)
    val vlit = effective
      .map(v => s"'${v.replace("'", "''")}'").mkString("[", ", ", "]")
    val vSize = effective.length
    val whens = (maxLen to 2 by -1).map { l =>
      s"WHEN list_contains($vlit, substr(w, CAST(x[1] AS INTEGER), $l)) " +
        s"THEN substr(w, CAST(x[1] AS INTEGER), $l)"
    }.mkString(" ")
    val tok = s"CASE $whens ELSE substr(w, CAST(x[1] AS INTEGER), 1) END"
    // NULLIF guard: list_position signals "not found" as 0 here (not
    // NULL) — without it the fallback branch would read -1
    val idExpr = s"COALESCE(CAST(NULLIF(list_position($vlit, $tok), 0) - 1 AS BIGINT), " +
      s"CAST($vSize AS BIGINT) + ascii($tok))"
    s"""WITH t AS (
       |  SELECT doc_id, string_split_regex(trim(text), '\\s+') AS ws FROM documents),
       |c AS (
       |  SELECT doc_id,
       |    flatten(list_transform(ws, w ->
       |      list_slice(
       |        list_reduce(
       |          [[CAST(0 AS BIGINT)]]
       |            || list_transform(range(1, len(w) + 1), i -> [CAST(i AS BIGINT)]),
       |          (acc, x) -> CASE WHEN acc[1] > 0
       |            THEN [acc[1] - 1] || list_slice(acc, 2, len(acc))
       |            ELSE [CAST(len($tok) AS BIGINT) - 1]
       |              || list_slice(acc, 2, len(acc)) || [$idExpr] END
       |        ), 2, 1000000000))) AS ids
       |  FROM t)
       |SELECT doc_id, CAST(len(ids) AS INTEGER) AS n_tokens,
       |  array_to_string(list_transform(ids, x -> CAST(x AS VARCHAR)), '-') AS token_ids
       |FROM c ORDER BY doc_id""".stripMargin
  }

  /** Integer PageRank oracle: fixed iterations unroll into chained
    * CTEs (no recursion needed — the generator emits r1..rI), each one
    * aggregate over the outdegree-joined edges plus the base term.
    * Every operation is BIGINT arithmetic (integer sums are
    * order-independent, `//` matches Spark's DIV on non-negatives) —
    * hash-exact.
    */
  private def pageRankOracle(iters: Int): String = {
    val iterCtes = (1 to iters).map { k =>
      s"""r$k AS (
         |  SELECT n.id,
         |    (SELECT base FROM params) + (85 * COALESCE(s.c, 0)) // 100 AS "rank"
         |  FROM nodes n LEFT JOIN (
         |    SELECT e.dst, SUM(r."rank" // e.outdeg) AS c
         |    FROM eo e JOIN r${k - 1} r ON r.id = e.src
         |    GROUP BY e.dst) s ON s.dst = n.id)""".stripMargin
    }.mkString(",\n")
    s"""WITH cs AS (
       |  SELECT DISTINCT o_custkey AS c, l_suppkey + 1000000 AS s
       |  FROM orders JOIN lineitem ON o_orderkey = l_orderkey),
       |edges AS (SELECT c AS src, s AS dst FROM cs
       |  UNION SELECT s, c FROM cs),
       |nodes AS (SELECT CAST(c_custkey AS BIGINT) AS id FROM customer
       |  UNION ALL SELECT s_suppkey + 1000000 FROM supplier),
       |params AS (SELECT CAST(1000000000 // COUNT(*) AS BIGINT) AS r0,
       |  CAST((15 * (1000000000 // COUNT(*))) // 100 AS BIGINT) AS base
       |  FROM nodes),
       |outd AS (SELECT src, COUNT(*) AS outdeg FROM edges GROUP BY src),
       |eo AS (SELECT e.src, e.dst, o.outdeg FROM edges e JOIN outd o USING (src)),
       |r0 AS (SELECT id, (SELECT r0 FROM params) AS "rank" FROM nodes),
       |$iterCtes
       |SELECT id, CAST("rank" AS BIGINT) AS "rank" FROM r$iters
       |ORDER BY id""".stripMargin
  }

  /** Weighted PageRank oracle: the [[pageRankOracle]] unrolled-CTE
    * shape with per-edge BIGINT weights — contribution
    * `(rank·w) // wout` mirrors Centrality.weightedPageRank's integer
    * fixed point term-for-term, so the hash is exact.
    */
  private def weightedPageRankOracle(iters: Int): String = {
    val iterCtes = (1 to iters).map { k =>
      s"""r$k AS (
         |  SELECT n.id,
         |    (SELECT base FROM params) + (85 * COALESCE(s.c, 0)) // 100 AS "rank"
         |  FROM nodes n LEFT JOIN (
         |    SELECT e.dst, SUM((r."rank" * e.w) // e.wout) AS c
         |    FROM eo e JOIN r${k - 1} r ON r.id = e.src
         |    GROUP BY e.dst) s ON s.dst = n.id)""".stripMargin
    }.mkString(",\n")
    s"""WITH cs AS (
       |  SELECT o_custkey AS c, l_suppkey + 1000000 AS s,
       |    COUNT(*) AS w
       |  FROM orders JOIN lineitem ON o_orderkey = l_orderkey
       |  GROUP BY 1, 2),
       |edges AS (SELECT c AS src, s AS dst, w FROM cs
       |  UNION ALL SELECT s, c, w FROM cs),
       |nodes AS (SELECT CAST(c_custkey AS BIGINT) AS id FROM customer
       |  UNION ALL SELECT s_suppkey + 1000000 FROM supplier),
       |params AS (SELECT CAST(1000000000 // COUNT(*) AS BIGINT) AS r0,
       |  CAST((15 * (1000000000 // COUNT(*))) // 100 AS BIGINT) AS base
       |  FROM nodes),
       |outw AS (SELECT src, SUM(w) AS wout FROM edges GROUP BY src),
       |eo AS (SELECT e.src, e.dst, e.w, o.wout FROM edges e JOIN outw o USING (src)),
       |r0 AS (SELECT id, (SELECT r0 FROM params) AS "rank" FROM nodes),
       |$iterCtes
       |SELECT id, CAST("rank" AS BIGINT) AS "rank" FROM r$iters
       |ORDER BY id""".stripMargin
  }

  /** Personalized PageRank oracle: same unrolled-CTE shape as
    * [[pageRankOracle]] with a per-node teleport share t(v) (BUILDING
    * customers weight 1, all else 0) replacing the scalar base — the
    * per-node `(15·t) // 100` term rides the nodes CTE through every
    * iteration. All-BIGINT, hash-exact.
    */
  private def personalizedPageRankOracle(iters: Int): String = {
    val iterCtes = (1 to iters).map { k =>
      s"""r$k AS (
         |  SELECT n.id,
         |    (15 * n.t) // 100 + (85 * COALESCE(s.c, 0)) // 100 AS "rank"
         |  FROM tv n LEFT JOIN (
         |    SELECT e.dst, SUM(r."rank" // e.outdeg) AS c
         |    FROM eo e JOIN r${k - 1} r ON r.id = e.src
         |    GROUP BY e.dst) s ON s.dst = n.id)""".stripMargin
    }.mkString(",\n")
    s"""WITH cs AS (
       |  SELECT DISTINCT o_custkey AS c, l_suppkey + 1000000 AS s
       |  FROM orders JOIN lineitem ON o_orderkey = l_orderkey),
       |edges AS (SELECT c AS src, s AS dst FROM cs
       |  UNION SELECT s, c FROM cs),
       |nodes AS (SELECT CAST(c_custkey AS BIGINT) AS id,
       |    CASE WHEN c_mktsegment = 'BUILDING' THEN CAST(1 AS BIGINT)
       |         ELSE CAST(0 AS BIGINT) END AS w
       |  FROM customer
       |  UNION ALL SELECT s_suppkey + 1000000, 0 FROM supplier),
       |tv AS (SELECT id,
       |    CAST((1000000000 * w) // (SELECT SUM(w) FROM nodes) AS BIGINT) AS t
       |  FROM nodes),
       |outd AS (SELECT src, COUNT(*) AS outdeg FROM edges GROUP BY src),
       |eo AS (SELECT e.src, e.dst, o.outdeg FROM edges e JOIN outd o USING (src)),
       |r0 AS (SELECT id, t AS "rank" FROM tv),
       |$iterCtes
       |SELECT id, CAST("rank" AS BIGINT) AS "rank" FROM r$iters
       |ORDER BY id""".stripMargin
  }

  /** HITS oracle: the authority/hub half-steps unroll into chained
    * CTEs; the integer normalizer `GREATEST(1, SUM(s) OVER () // SCALE)`
    * mirrors the operator exactly (no s·SCALE product — overflow-safe
    * on both engines). The normalizer is a WINDOW total, not a scalar
    * subquery, so each CTE is referenced exactly ONCE downstream — a
    * scalar `(SELECT SUM(s) FROM a_k_raw)` would reference the chain
    * twice per half-step and, under CTE inlining, double the plan each
    * of the 16 half-steps (2^16 parquet scans → fd exhaustion). DuckDB
    * SUMs widen to HUGEINT; every emitted column is cast back to
    * BIGINT.
    */
  private def hitsOracle(iters: Int): String = {
    val iterCtes = (1 to iters).map { k =>
      s"""a$k AS (
         |  SELECT id, s // GREATEST(1, SUM(s) OVER () // 1000000000)
         |    AS authority FROM (
         |    SELECT n.id, COALESCE(s.c, 0) AS s FROM nodes n LEFT JOIN (
         |      SELECT e.dst, SUM(h.hub) AS c FROM edges e
         |      JOIN h${k - 1} h ON h.id = e.src GROUP BY e.dst) s ON s.dst = n.id)),
         |h$k AS (
         |  SELECT id, s // GREATEST(1, SUM(s) OVER () // 1000000000)
         |    AS hub FROM (
         |    SELECT n.id, COALESCE(s.c, 0) AS s FROM nodes n LEFT JOIN (
         |      SELECT e.src, SUM(a.authority) AS c FROM edges e
         |      JOIN a$k a ON a.id = e.dst GROUP BY e.src) s ON s.src = n.id))""".stripMargin
    }.mkString(",\n")
    s"""WITH cs AS (
       |  SELECT DISTINCT o_custkey AS c, l_suppkey + 1000000 AS s
       |  FROM orders JOIN lineitem ON o_orderkey = l_orderkey),
       |edges AS (SELECT c AS src, s AS dst FROM cs),
       |nodes AS (SELECT CAST(c_custkey AS BIGINT) AS id FROM customer
       |  UNION ALL SELECT s_suppkey + 1000000 FROM supplier),
       |h0 AS (SELECT id, 1000000000 // (SELECT COUNT(*) FROM nodes) AS hub
       |  FROM nodes),
       |$iterCtes
       |SELECT n.id, CAST(a.authority AS BIGINT) AS authority,
       |  CAST(h.hub AS BIGINT) AS hub
       |FROM nodes n JOIN a$iters a ON a.id = n.id JOIN h$iters h ON h.id = n.id
       |ORDER BY n.id""".stripMargin
  }

  /** Label-propagation oracle: the synchronous rounds of
    * [[graft.operators.Community.labelPropagation]] unroll into
    * chained CTEs — plurality histogram per (node, neighbor label),
    * argmax with min-label tiebreak as a ROW_NUMBER pick, isolated
    * nodes carry the previous label via LEFT JOIN + COALESCE. All
    * exact integers; each CTE is referenced a bounded number of times
    * so CTE inlining cannot compound the plan.
    */
  private def lpaOracle(iters: Int): String = {
    val iterCtes = (1 to iters).map { k =>
      s"""h$k AS (SELECT e.src, l.community, COUNT(*) AS c
         |  FROM e JOIN l${k - 1} l ON l.id = e.dst GROUP BY e.src, l.community),
         |b$k AS (SELECT src AS id, community AS next FROM (
         |    SELECT src, community,
         |      ROW_NUMBER() OVER (PARTITION BY src
         |        ORDER BY c DESC, community ASC) AS rn
         |    FROM h$k) WHERE rn = 1),
         |l$k AS (SELECT l.id, COALESCE(b.next, l.community) AS community
         |  FROM l${k - 1} l LEFT JOIN b$k b USING (id))""".stripMargin
    }.mkString(",\n")
    s"""WITH lp AS (SELECT DISTINCT l_orderkey AS ok, l_partkey AS pk
       |  FROM lineitem),
       |pr AS (SELECT DISTINCT a.pk AS u, b.pk AS v
       |  FROM lp a JOIN lp b ON a.ok = b.ok AND a.pk < b.pk),
       |e AS (SELECT u AS src, v AS dst FROM pr
       |  UNION ALL SELECT v, u FROM pr),
       |nd AS (SELECT CAST(p_partkey AS BIGINT) AS id FROM part),
       |l0 AS (SELECT id, id AS community FROM nd),
       |$iterCtes,
       |cs AS (SELECT community, COUNT(*) AS csize
       |  FROM l$iters GROUP BY community)
       |SELECT l.id, l.community, cs.csize
       |FROM l$iters l JOIN cs USING (community)
       |ORDER BY l.id""".stripMargin
  }

  /** BFS seed-distance oracle: the frontier rounds of
    * [[graft.operators.Centrality.seedDistance]] unroll into chained
    * CTEs — frontier = nodes stamped last round, reached = distinct
    * out-neighbors, unreached nodes stamp the round number. Exact
    * integers; −1 marks nodes beyond the horizon.
    */
  /** Unrolled min-plus CTE chain mirroring
    * [[graft.operators.Centrality.weightedDistance]] — full relaxation
    * per round, which equals the operator's frontier relaxation round
    * for round (an unimproved node re-offers candidates already
    * applied). All-integer costs, so MIN and the keep CASE cannot
    * diverge. Each round references its predecessor twice →
    * MATERIALIZED keeps the inlining linear.
    */
  private def ssspOracle(iters: Int): String = {
    val iterCtes = (1 to iters).map { k =>
      s"""d$k AS MATERIALIZED (SELECT d.id,
         |    CASE WHEN d.dist IS NULL THEN c.best
         |         WHEN c.best IS NULL THEN d.dist
         |         WHEN c.best < d.dist THEN c.best ELSE d.dist END AS dist
         |  FROM d${k - 1} d LEFT JOIN (
         |    SELECT e.dst, MIN(d.dist + e.w) AS best
         |    FROM e JOIN d${k - 1} d ON d.id = e.src AND d.dist IS NOT NULL
         |    GROUP BY e.dst) c ON c.dst = d.id)""".stripMargin
    }.mkString(",\n")
    s"""WITH wt AS (
       |  SELECT o_custkey AS c, l_suppkey + 1000000 AS s,
       |    CAST(MIN(CAST(l_quantity AS DECIMAL(18,2))) * 100 AS BIGINT) AS w
       |  FROM orders JOIN lineitem ON o_orderkey = l_orderkey
       |  GROUP BY 1, 2),
       |e AS MATERIALIZED (SELECT c AS src, s AS dst, w FROM wt
       |  UNION ALL SELECT s, c, w FROM wt),
       |nd AS (SELECT CAST(c_custkey AS BIGINT) AS id FROM customer
       |  UNION ALL SELECT s_suppkey + 1000000 FROM supplier),
       |sd AS (SELECT CAST(c_custkey AS BIGINT) AS id FROM customer
       |  WHERE c_mktsegment = 'BUILDING'),
       |d0 AS MATERIALIZED (SELECT nd.id,
       |    CASE WHEN sd.id IS NOT NULL THEN CAST(0 AS BIGINT) END AS dist
       |  FROM nd LEFT JOIN sd ON sd.id = nd.id),
       |$iterCtes
       |SELECT id, dist FROM d$iters ORDER BY id""".stripMargin
  }

  private def bfsOracle(iters: Int): String = {
    val iterCtes = (1 to iters).map { k =>
      s"""f$k AS (SELECT DISTINCT e.dst FROM e JOIN d${k - 1} d
         |  ON d.id = e.src AND d.dist = ${k - 1}),
         |d$k AS (SELECT d.id,
         |    CASE WHEN d.dist >= 0 THEN d.dist
         |         WHEN f.dst IS NOT NULL THEN CAST($k AS BIGINT)
         |         ELSE CAST(-1 AS BIGINT) END AS dist
         |  FROM d${k - 1} d LEFT JOIN f$k f ON f.dst = d.id)""".stripMargin
    }.mkString(",\n")
    s"""WITH cs AS (
       |  SELECT DISTINCT o_custkey AS c, l_suppkey + 1000000 AS s
       |  FROM orders JOIN lineitem ON o_orderkey = l_orderkey),
       |e AS (SELECT c AS src, s AS dst FROM cs
       |  UNION ALL SELECT s, c FROM cs),
       |nd AS (SELECT CAST(c_custkey AS BIGINT) AS id FROM customer
       |  UNION ALL SELECT s_suppkey + 1000000 FROM supplier),
       |sd AS (SELECT CAST(c_custkey AS BIGINT) AS id FROM customer
       |  WHERE c_mktsegment = 'BUILDING'),
       |d0 AS (SELECT nd.id,
       |    CASE WHEN sd.id IS NOT NULL THEN CAST(0 AS BIGINT)
       |         ELSE CAST(-1 AS BIGINT) END AS dist
       |  FROM nd LEFT JOIN sd ON sd.id = nd.id),
       |$iterCtes
       |SELECT id, dist FROM d$iters ORDER BY id""".stripMargin
  }

  /** Unrolled peel-round CTE chain mirroring
    * [[graft.operators.KCore.peelLayers]] round for round: each round
    * recomputes degrees over the surviving edge set, removes nodes of
    * degree < k (recording the 1-based round as the onion layer), and
    * restricts the edge list to survivors. Peeling is confluent and
    * monotone — all-integer degrees, synchronous schedule — so the
    * unrolled chain is bit-identical to the distributed loop.
    * MATERIALIZED on the per-round node/edge CTEs keeps the inlining
    * linear (each is referenced twice downstream).
    */
  private def kcoreOracle(k: Int, rounds: Int): String = {
    val iterCtes = (1 to rounds).map { r =>
      s"""g$r AS MATERIALIZED (SELECT n.id,
         |    COALESCE(d.deg, 0) AS deg
         |  FROM n${r - 1} n LEFT JOIN (
         |    SELECT src, COUNT(*) AS deg FROM e${r - 1} GROUP BY src) d
         |    ON d.src = n.id),
         |rm$r AS (SELECT id FROM g$r WHERE deg < $k),
         |n$r AS MATERIALIZED (SELECT id FROM g$r WHERE deg >= $k),
         |e$r AS MATERIALIZED (
         |  SELECT e.src, e.dst FROM e${r - 1} e
         |  JOIN n$r a ON e.src = a.id JOIN n$r b ON e.dst = b.id)"""
        .stripMargin
    }.mkString(",\n")
    val layerArms = (1 to rounds).map { r =>
      s"SELECT id, CAST($r AS INTEGER) AS peel_round, FALSE AS in_core FROM rm$r"
    }.mkString("\n  UNION ALL ")
    s"""WITH cs AS (
       |  SELECT o_custkey AS c, l_suppkey + 1000000 AS s
       |  FROM orders JOIN lineitem ON o_orderkey = l_orderkey
       |  WHERE l_quantity >= 40
       |  GROUP BY 1, 2 HAVING COUNT(*) >= 2),
       |e0 AS MATERIALIZED (SELECT c AS src, s AS dst FROM cs
       |  UNION SELECT s, c FROM cs),
       |n0 AS MATERIALIZED (SELECT DISTINCT src AS id FROM e0),
       |$iterCtes
       |$layerArms
       |  UNION ALL SELECT id, CAST(NULL AS INTEGER), TRUE FROM n$rounds
       |ORDER BY id""".stripMargin
  }

  /** Markov removal-effect attribution oracle: journey extraction
    * (rank + first-conversion cut + lead under the same (ts,
    * event_id) total order), the transition matrix pivoted into ONE
    * row, and the integer absorption fixed point unrolled per
    * variant — `full` plus one knockout per channel, where knocking
    * out c is just computing with `p(c) ≡ 0` (mirrors
    * [[graft.operators.Attribution]] term for term; all-integer, so
    * hash-exact).
    */
  private def markovOracle(iterations: Int): String = {
    val chans = Seq("click", "error", "signup", "view")
    val srcs = "start" +: chans
    def variant(name: String, dead: Option[String]): String = {
      val live = srcs.filterNot(dead.contains)
      val zeros = live.map(v => s"CAST(0 AS BIGINT) AS p_$v").mkString(", ")
      val iters = (1 to iterations).map { k =>
        val exprs = live.map { v =>
          val terms = chans.filterNot(dead.contains)
            .map(u => s"c_${v}_$u * p_$u") :+ s"c_${v}_conv * 1000000000"
          s"CASE WHEN tot_$v = 0 THEN CAST(0 AS BIGINT) " +
            s"ELSE (${terms.mkString(" + ")}) // tot_$v END AS p_$v"
        }.mkString(",\n    ")
        s"p${k}_$name AS (SELECT $exprs FROM m, p${k - 1}_$name)"
      }
      (s"p0_$name AS (SELECT $zeros)" +: iters).mkString(",\n")
    }
    val variants = variant("full", None) +: chans.map(c => variant(c, Some(c)))
    val mCols = (
      (for { s <- srcs; d <- chans :+ "conv" } yield {
        val sLit = if (s == "start") "__START__" else s
        val dLit = if (d == "conv") "__CONV__" else d
        s"CAST(COALESCE(SUM(CASE WHEN src = '$sLit' AND dst = '$dLit' " +
          s"THEN n END), 0) AS BIGINT) AS c_${s}_$d"
      }) ++ srcs.map { s =>
        val sLit = if (s == "start") "__START__" else s
        s"CAST(COALESCE(SUM(CASE WHEN src = '$sLit' THEN n END), 0) " +
          s"AS BIGINT) AS tot_$s"
      }).mkString(",\n    ")
    val remCols = chans.map(c =>
      s"GREATEST(CAST(0 AS BIGINT), (SELECT p_start FROM p${iterations}_full)" +
        s" - (SELECT p_start FROM p${iterations}_$c)) AS r_$c")
      .mkString(",\n    ")
    val arms = chans.map(c =>
      s"""SELECT '$c' AS channel, r_$c AS removal_micro,
         |  CASE WHEN rt = 0 THEN 0.0
         |       ELSE ROUND(CAST(r_$c AS DOUBLE) / CAST(rt AS DOUBLE), 6)
         |  END AS share FROM rem""".stripMargin)
      .mkString("\n  UNION ALL ")
    s"""WITH ev AS (
       |  SELECT user_id, event_type AS t,
       |    row_number() OVER (PARTITION BY user_id
       |      ORDER BY ts, event_id) AS rn
       |  FROM events),
       |fc AS (SELECT user_id, MIN(rn) AS cut FROM ev
       |  WHERE t = 'purchase' GROUP BY user_id),
       |kept AS (SELECT ev.user_id, ev.t, ev.rn
       |  FROM ev LEFT JOIN fc USING (user_id)
       |  WHERE cut IS NULL OR rn <= cut),
       |nx AS (SELECT user_id, t, rn,
       |  lead(t) OVER (PARTITION BY user_id ORDER BY rn) AS nxt FROM kept),
       |steps AS (
       |  SELECT t AS src,
       |    CASE WHEN nxt IS NULL THEN
       |           CASE WHEN t = 'purchase' THEN NULL ELSE '__NULL__' END
       |         WHEN nxt = 'purchase' THEN '__CONV__'
       |         ELSE nxt END AS dst
       |  FROM nx WHERE t != 'purchase'),
       |starts AS (
       |  SELECT '__START__' AS src,
       |    CASE WHEN t = 'purchase' THEN '__CONV__' ELSE t END AS dst
       |  FROM kept WHERE rn = 1),
       |tr AS (SELECT src, dst, COUNT(*) AS n FROM (
       |  SELECT * FROM starts UNION ALL SELECT * FROM steps)
       |  WHERE dst IS NOT NULL GROUP BY 1, 2),
       |m AS (SELECT
       |    $mCols
       |  FROM tr),
       |${variants.mkString(",\n")},
       |rem AS (SELECT *, r_click + r_error + r_signup + r_view AS rt
       |  FROM (SELECT
       |    $remCols)),
       |res AS (
       |  $arms)
       |SELECT channel, removal_micro, share FROM res
       |ORDER BY channel""".stripMargin
  }

  /** Stupid-backoff bigram cross-entropy CTE chain (mirrors
    * [[graft.operators.LanguageModel.crossEntropyBigram]] branch for
    * branch), shared by the `lm_bigram_cross_entropy` oracle and the
    * `perplexity_filter` cut built on top of it. Ends at `s` =
    * (doc_id, nt, sl).
    */
  private val lmPairCtes: String =
    """d0 AS (
      |  SELECT doc_id, CASE WHEN len(trim(text)) > 0
      |    THEN string_split_regex(trim(text), '\s+')
      |    ELSE CAST([] AS VARCHAR[]) END AS tk
      |  FROM documents),
      |tok AS (
      |  SELECT doc_id,
      |    unnest(list_transform(tk, (w, i) -> struct_pack(i := i, w := w))) AS s
      |  FROM d0),
      |tw AS (SELECT doc_id, s.i AS i, s.w AS w FROM tok),
      |cnt AS (SELECT w, COUNT(*) AS c FROM tw GROUP BY w),
      |top AS (SELECT w, c FROM cnt ORDER BY c DESC, w LIMIT 64),
      |lagged AS (
      |  SELECT doc_id, i, w,
      |    lag(w) OVER (PARTITION BY doc_id ORDER BY i) AS prev
      |  FROM tw),
      |pc AS (
      |  SELECT l.prev AS v, l.w AS w, COUNT(*) AS c
      |  FROM lagged l
      |  JOIN top tv ON tv.w = l.prev JOIN top tc ON tc.w = l.w
      |  WHERE l.prev IS NOT NULL GROUP BY l.prev, l.w)""".stripMargin

  private val bigramCeCtes: String =
    s"""$lmPairCtes,
      |dn AS (SELECT CAST((SELECT SUM(c) FROM cnt)
      |  + (SELECT COUNT(*) FROM top) + 1 AS DOUBLE) AS d),
      |lp AS (
      |  SELECT l.doc_id,
      |    CASE WHEN l.prev IS NULL THEN
      |      COALESCE(ln(CAST(tc.c + 1 AS DOUBLE) / d), ln(1.0 / d))
      |    ELSE
      |      COALESCE(ln(CAST(pc.c AS DOUBLE) / CAST(tv.c AS DOUBLE)),
      |        ln(0.4) + COALESCE(ln(CAST(tc.c + 1 AS DOUBLE) / d), ln(1.0 / d)))
      |    END AS lnS
      |  FROM lagged l
      |  LEFT JOIN top tc ON tc.w = l.w
      |  LEFT JOIN top tv ON tv.w = l.prev
      |  LEFT JOIN pc ON pc.v = l.prev AND pc.w = l.w
      |  CROSS JOIN dn),
      |s AS (SELECT doc_id, COUNT(*) AS nt, SUM(lnS) AS sl
      |      FROM lp GROUP BY doc_id)""".stripMargin

  /** KN oracle CTEs (D37c): continuation/context tables off the shared
    * `pc` pair counts, and the three-branch interpolated score
    * mirroring [[graft.operators.LanguageModel.trainKneserNey]]'s
    * arithmetic association exactly (unseen-pair branch = two lns
    * ADDED, as the kernel adds the precomputed logs).
    */
  private val knCeCtes: String =
    s"""$lmPairCtes,
      |ctxk AS (SELECT v, SUM(c) AS cv, COUNT(*) AS n1 FROM pc GROUP BY v),
      |bwd AS (SELECT w, COUNT(*) AS n1b FROM pc GROUP BY w),
      |kdn AS (SELECT CAST((SELECT COUNT(*) FROM pc)
      |  + (SELECT COUNT(*) FROM top) + 1 AS DOUBLE) AS kd),
      |lp AS (
      |  SELECT l.doc_id,
      |    CASE
      |      WHEN l.prev IS NULL OR cx.v IS NULL THEN
      |        ln(CASE WHEN tc.w IS NOT NULL
      |           THEN CAST(COALESCE(bw.n1b, 0) + 1 AS DOUBLE) / kd
      |           ELSE 1.0 / kd END)
      |      WHEN pc.c IS NOT NULL THEN
      |        ln(((CAST(pc.c AS DOUBLE) - 0.75) / CAST(cx.cv AS DOUBLE))
      |          + ((0.75 * CAST(cx.n1 AS DOUBLE)) / CAST(cx.cv AS DOUBLE))
      |            * (CAST(COALESCE(bw.n1b, 0) + 1 AS DOUBLE) / kd))
      |      ELSE
      |        ln((0.75 * CAST(cx.n1 AS DOUBLE)) / CAST(cx.cv AS DOUBLE))
      |        + ln(CASE WHEN tc.w IS NOT NULL
      |             THEN CAST(COALESCE(bw.n1b, 0) + 1 AS DOUBLE) / kd
      |             ELSE 1.0 / kd END)
      |    END AS lnS
      |  FROM lagged l
      |  LEFT JOIN top tc ON tc.w = l.w
      |  LEFT JOIN bwd bw ON bw.w = l.w
      |  LEFT JOIN ctxk cx ON cx.v = l.prev
      |  LEFT JOIN pc ON pc.v = l.prev AND pc.w = l.w
      |  CROSS JOIN kdn),
      |s AS (SELECT doc_id, COUNT(*) AS nt, SUM(lnS) AS sl
      |      FROM lp GROUP BY doc_id)""".stripMargin

  /** TF-IDF oracle: mirrors [[graft.operators.TextRank.tfidfTopK]]
    * node for node — same tokens, same smooth idf, the full-vocabulary
    * L2 norm as Σ(tf·idf)² regrouped freely (absorbed by the 6-dp
    * round), numerator/query-norm in the identical left-assoc order,
    * and the match filter on the exact-integer tf sum.
    */
  private def tfidfOracle(terms: Seq[String], k: Int): String = {
    val sorted = terms.distinct.sorted
    val tfCols = sorted.zipWithIndex.map { case (t, i) =>
      s"CAST(len(list_filter(toks, x -> x = '$t')) AS DOUBLE) AS tf$i"
    }.mkString(",\n    ")
    val dfCols = sorted.indices.map { i =>
      s"CAST(SUM(CASE WHEN tf$i > 0 THEN 1 ELSE 0 END) AS DOUBLE) AS df$i"
    }.mkString(",\n    ")
    def idf(i: Int) = s"(ln((1.0 + n) / (1.0 + df$i)) + 1.0)"
    val num = sorted.indices.map(i => s"((tf$i * ${idf(i)}) * ${idf(i)})")
      .mkString(" + ")
    val qnorm = "sqrt(" +
      sorted.indices.map(i => s"(${idf(i)} * ${idf(i)})").mkString(" + ") + ")"
    val anyTf = sorted.indices.map(i => s"tf$i").mkString(" + ")
    s"""WITH d AS (
       |  SELECT doc_id,
       |    list_filter(string_split_regex(lower(text), '[^a-z0-9]+'), x -> x <> '') AS toks
       |  FROM documents),
       |t AS (
       |  SELECT doc_id,
       |    $tfCols
       |  FROM d),
       |s AS (
       |  SELECT CAST(COUNT(*) AS DOUBLE) AS n,
       |    $dfCols
       |  FROM t),
       |tok AS (SELECT doc_id, unnest(toks) AS w FROM d),
       |ptf AS (SELECT doc_id, w, CAST(COUNT(*) AS DOUBLE) AS tf
       |        FROM tok GROUP BY doc_id, w),
       |dfw AS (SELECT w, CAST(COUNT(*) AS DOUBLE) AS df FROM ptf GROUP BY w),
       |nrm AS (
       |  SELECT doc_id,
       |    sqrt(SUM((tf * (ln((1.0 + n) / (1.0 + df)) + 1.0))
       |      * (tf * (ln((1.0 + n) / (1.0 + df)) + 1.0)))) AS nd
       |  FROM ptf JOIN dfw USING (w) CROSS JOIN s GROUP BY doc_id)
       |SELECT doc_id, score FROM (
       |  SELECT t.doc_id, round(($num) / (nd * $qnorm), 6) AS score,
       |    ($anyTf) AS tfsum
       |  FROM t CROSS JOIN s JOIN nrm ON nrm.doc_id = t.doc_id)
       |WHERE tfsum > 0
       |ORDER BY score DESC, doc_id
       |LIMIT $k""".stripMargin
  }

  // Hoisted so hybrid_search_rrf (and dynamicOracleSql's recall
  // report) can compose it as a subquery. Bit-exact across engines:
  // the kernel (GraftKernels.cosine) is a left-to-right double fold
  // over float inputs — float→double widening is exact and IEEE
  // +,*,/,sqrt are correctly rounded, so mirroring the fold order in
  // list_reduce reproduces the same 64 bits, and the rank tiebreak
  // (cos DESC, id) cannot diverge.
  private val bruteForceOracle: String =
    """WITH q AS (
      |  SELECT vec_id AS qid, embedding AS qv FROM embeddings WHERE vec_id < 5),
      |s AS (
      |  SELECT qid, e.vec_id AS id,
      |    list_reduce(list_transform(range(1, len(qv) + 1),
      |      i -> CAST(qv[i] AS DOUBLE) * CAST(e.embedding[i] AS DOUBLE)),
      |      (a, b) -> a + b) AS dot,
      |    list_reduce(list_transform(range(1, len(qv) + 1),
      |      i -> CAST(qv[i] AS DOUBLE) * CAST(qv[i] AS DOUBLE)),
      |      (a, b) -> a + b) AS na,
      |    list_reduce(list_transform(range(1, len(qv) + 1),
      |      i -> CAST(e.embedding[i] AS DOUBLE) * CAST(e.embedding[i] AS DOUBLE)),
      |      (a, b) -> a + b) AS nb
      |  FROM embeddings e CROSS JOIN q WHERE e.vec_id <> q.qid),
      |c AS (
      |  SELECT qid, id,
      |    CASE WHEN na = 0 OR nb = 0 THEN 0.0
      |         ELSE dot / (sqrt(na) * sqrt(nb)) END AS cos
      |  FROM s),
      |r AS (
      |  SELECT qid, id, cos,
      |    row_number() OVER (PARTITION BY qid ORDER BY cos DESC, id) AS rk
      |  FROM c)
      |SELECT qid, id, cos, CAST(rk AS INTEGER) AS rk
      |FROM r WHERE rk <= 10 ORDER BY qid, rk""".stripMargin

  /** Matryoshka truncation audit (D76): full-dim and prefix-dim cosine
    * legs are the same index-order IEEE double folds as the kernel
    * (see [[bruteForceOracle]]'s bit-exactness argument) with the
    * range bound at d+1; rank windows tiebreak on the lower id, the
    * shortlist re-rank joins the full-dim scores back over the pool,
    * and hits are exact set intersections — the only non-integer
    * arithmetic is one hits/50 division in both engines.
    */
  private def matryoshkaOracle(d: Int, pool: Int, k: Int): String = {
    def scoreCtes(sName: String, cName: String, hi: String): String =
      s"""$sName AS (
        |  SELECT qid, e.vec_id AS id,
        |    list_reduce(list_transform(range(1, $hi),
        |      i -> CAST(qv[i] AS DOUBLE) * CAST(e.embedding[i] AS DOUBLE)),
        |      (a, b) -> a + b) AS dot,
        |    list_reduce(list_transform(range(1, $hi),
        |      i -> CAST(qv[i] AS DOUBLE) * CAST(qv[i] AS DOUBLE)),
        |      (a, b) -> a + b) AS na,
        |    list_reduce(list_transform(range(1, $hi),
        |      i -> CAST(e.embedding[i] AS DOUBLE) * CAST(e.embedding[i] AS DOUBLE)),
        |      (a, b) -> a + b) AS nb
        |  FROM embeddings e CROSS JOIN q WHERE e.vec_id <> q.qid),
        |$cName AS (
        |  SELECT qid, id,
        |    CASE WHEN na = 0 OR nb = 0 THEN 0.0
        |         ELSE dot / (sqrt(na) * sqrt(nb)) END AS cos
        |  FROM $sName),"""
    s"""WITH q AS (
      |  SELECT vec_id AS qid, embedding AS qv FROM embeddings WHERE vec_id < 5),
      |${scoreCtes("sf", "cf", "len(qv) + 1")}
      |bf AS (
      |  SELECT qid, id FROM (
      |    SELECT qid, id,
      |      row_number() OVER (PARTITION BY qid ORDER BY cos DESC, id) AS rk
      |    FROM cf) WHERE rk <= $k),
      |${scoreCtes("st", "ct", s"${d + 1}")}
      |tr AS (
      |  SELECT qid, id,
      |    row_number() OVER (PARTITION BY qid ORDER BY cos DESC, id) AS rk
      |  FROM ct),
      |ref AS (
      |  SELECT qid, id FROM (
      |    SELECT p.qid, p.id,
      |      row_number() OVER (PARTITION BY p.qid
      |        ORDER BY c.cos DESC, p.id) AS rk
      |    FROM (SELECT qid, id FROM tr WHERE rk <= $pool) p
      |    JOIN cf c ON c.qid = p.qid AND c.id = p.id) WHERE rk <= $k)
      |SELECT method, hits, CAST(hits AS DOUBLE) / 50.0 AS recall_at_10
      |FROM (
      |  SELECT 'trunc$d' AS method, COUNT(*) AS hits
      |  FROM (SELECT qid, id FROM tr WHERE rk <= $k) t
      |  JOIN bf USING (qid, id)
      |  UNION ALL SELECT 'trunc${d}_refine', COUNT(*)
      |  FROM ref JOIN bf USING (qid, id))
      |ORDER BY method""".stripMargin
  }

  /** Unrolled-CTE replay of the MMR greedy loop (query vector 0,
    * pool = exact-cosine top-`c`, λ = 0.5). Every cosine is the same
    * index-order IEEE double fold as the kernel (see
    * [[bruteForceOracle]]'s bit-exactness argument), the λ-arithmetic
    * `0.5·rel − 0.5·ms` is a fixed two-op double chain, and each
    * step's argmax breaks ties on the lower id — so the k-step chain
    * reproduces [[graft.operators.MmrRetrieval]] decision for
    * decision.
    */
  private def mmrOracle(k: Int, c: Int): String = {
    def fold(u: String, v: String): String =
      s"""list_reduce(list_transform(range(1, len($u) + 1),
         |      i -> CAST($u[i] AS DOUBLE) * CAST($v[i] AS DOUBLE)),
         |      (a, b) -> a + b)""".stripMargin
    // each selN references selN-1 three times — MATERIALIZED stops
    // DuckDB's CTE inlining from exponentiating the chain (3^k scans)
    val steps = (2 to k).map { i =>
      s"""sel$i AS MATERIALIZED (
         |  SELECT * FROM sel${i - 1}
         |  UNION ALL
         |  (SELECT id, rel, 0.5 * rel - 0.5 * ms AS mmr,
         |     CAST($i AS INTEGER) AS rk
         |   FROM (
         |     SELECT cd.id, cd.rel, MAX(p.cs) AS ms
         |     FROM cand cd
         |     JOIN pair p ON p.ai = cd.id
         |     JOIN sel${i - 1} s ON p.bi = s.id
         |     WHERE cd.id NOT IN (SELECT id FROM sel${i - 1})
         |     GROUP BY cd.id, cd.rel)
         |   ORDER BY mmr DESC, id LIMIT 1))""".stripMargin
    }.mkString(",\n")
    s"""WITH q AS (
       |  SELECT embedding AS qv FROM embeddings WHERE vec_id = 0),
       |r0 AS (
       |  SELECT e.vec_id AS id, e.embedding AS v,
       |    ${fold("qv", "e.embedding")} AS dot,
       |    ${fold("qv", "qv")} AS na,
       |    ${fold("e.embedding", "e.embedding")} AS nb
       |  FROM embeddings e CROSS JOIN q WHERE e.vec_id <> 0),
       |cand AS MATERIALIZED (
       |  SELECT id, CASE WHEN na = 0 OR nb = 0 THEN 0.0
       |    ELSE dot / (sqrt(na) * sqrt(nb)) END AS rel, v
       |  FROM r0
       |  ORDER BY rel DESC, id LIMIT $c),
       |p0 AS (
       |  SELECT a.id AS ai, b.id AS bi,
       |    ${fold("a.v", "b.v")} AS dot,
       |    ${fold("a.v", "a.v")} AS na,
       |    ${fold("b.v", "b.v")} AS nb
       |  FROM cand a JOIN cand b ON a.id <> b.id),
       |pair AS MATERIALIZED (
       |  SELECT ai, bi, CASE WHEN na = 0 OR nb = 0 THEN 0.0
       |    ELSE dot / (sqrt(na) * sqrt(nb)) END AS cs
       |  FROM p0),
       |sel1 AS MATERIALIZED (
       |  SELECT id, rel, 0.5 * rel - 0.5 * 0.0 AS mmr,
       |    CAST(1 AS INTEGER) AS rk
       |  FROM cand ORDER BY mmr DESC, id LIMIT 1),
       |$steps
       |SELECT CAST(0 AS BIGINT) AS qid, id, rel, mmr, rk
       |FROM sel$k ORDER BY rk""".stripMargin
  }

  /** The corpus-pipeline CTE chain through `clean` — shared by the
    * `corpus_pipeline` oracle and the `pipeline_audit` stage counts.
    */
  private val corpusPipelineChain: String =
    // RAW margins (no stripMargin here): this text interpolates into
    // templates that strip ONCE — stripping twice would eat the first
    // bar of SQL `||` concat lines
    s"""corp AS (SELECT doc_id, text FROM documents WHERE doc_id % 10 <> 0),
        |tq AS (SELECT doc_id, text, string_split_regex(trim(text), '\\s+') AS tk FROM corp),
        |qual AS (
        |  SELECT doc_id, text, tk FROM (
        |    SELECT doc_id, text, tk,
        |      CAST(len(tk) AS DOUBLE) AS n,
        |      CAST(len(list_distinct(tk)) AS DOUBLE) AS u,
        |      CAST(len(list_filter(tk, x -> list_contains(
        |        ['the','a','of','and','to','in','is'], x))) AS DOUBLE) AS hcnt
        |    FROM tq)
        |  WHERE 0.4 * least(n / 64.0, 1.0) + 0.4 * (u / n)
        |      + 0.2 * least((hcnt / n) * 8.0, 1.0) >= 0.2),
        |exact AS (
        |  SELECT doc_id, text, tk FROM (
        |    SELECT doc_id, text, tk, MIN(doc_id) OVER (PARTITION BY text) AS cmin
        |    FROM qual)
        |  WHERE doc_id = cmin),
        |sh AS (SELECT doc_id, list_distinct(list_transform(range(1, len(tk) - 1),
        |  i -> tk[i] || ' ' || tk[i+1] || ' ' || tk[i+2])) AS s3 FROM exact),
        |ex AS (SELECT doc_id, len(s3) AS n3, unnest(s3) AS shingle FROM sh WHERE len(s3) > 0),
        |pairs AS (
        |  SELECT a.doc_id AS ida, b.doc_id AS idb, count(*) AS c,
        |    any_value(a.n3) AS na, any_value(b.n3) AS nb
        |  FROM ex a JOIN ex b ON a.shingle = b.shingle AND b.doc_id > a.doc_id
        |  GROUP BY 1, 2),
        |edges AS (SELECT ida, idb FROM pairs
        |  WHERE CAST(c AS DOUBLE) / (na + nb - c) >= 0.8),
        |und AS (SELECT ida AS src, idb AS dst FROM edges
        |  UNION ALL SELECT idb, ida FROM edges),
        |reach AS (
        |  SELECT src, dst FROM und
        |  UNION
        |  SELECT r.src, u.dst FROM reach r JOIN und u ON u.src = r.dst),
        |reps AS (
        |  SELECT e.doc_id, e.text, e.tk FROM exact e
        |  LEFT JOIN (SELECT src, MIN(dst) AS mind FROM reach GROUP BY src) m
        |    ON m.src = e.doc_id
        |  WHERE e.doc_id <= COALESCE(m.mind, e.doc_id)),
        |bg AS (
        |  SELECT DISTINCT unnest(list_distinct(list_transform(range(1, len(tk) - 6),
        |    i -> tk[i] || ' ' || tk[i+1] || ' ' || tk[i+2] || ' ' || tk[i+3]
        |      || ' ' || tk[i+4] || ' ' || tk[i+5] || ' ' || tk[i+6] || ' ' || tk[i+7]))) AS gram
        |  FROM (SELECT string_split_regex(trim(text), '\\s+') AS tk
        |        FROM documents WHERE doc_id % 10 = 0)),
        |dirty AS (
        |  SELECT DISTINCT doc_id FROM (
        |    SELECT doc_id, unnest(list_distinct(list_transform(range(1, len(tk) - 6),
        |      i -> tk[i] || ' ' || tk[i+1] || ' ' || tk[i+2] || ' ' || tk[i+3]
        |        || ' ' || tk[i+4] || ' ' || tk[i+5] || ' ' || tk[i+6] || ' ' || tk[i+7]))) AS gram
        |    FROM reps) g
        |  JOIN bg USING (gram)),
        |clean AS (
        |  SELECT r.doc_id, r.tk FROM reps r
        |  WHERE r.doc_id NOT IN (SELECT doc_id FROM dirty))"""

  /** The D43 next-fit-decreasing fold chain ending at per-doc CTE
    * `pk` — shared by the `sequence_pack_nextfit` oracle and the
    * `packing_efficiency` waste ledger. RAW margins (no stripMargin
    * here): interpolates into templates that strip once.
    */
  private val nextFitChain: String = {
    val fits = "acc[2] >= 0 AND acc[1] + (-x[1]) <= 512"
    s"""t AS (
         |  SELECT doc_id, doc_id % 8 AS bucket,
         |    CAST(len(string_split_regex(trim(text), '\\s+')) AS BIGINT) AS n
         |  FROM documents),
         |b AS (
         |  SELECT bucket, list_sort(list([-n, doc_id])) AS docs
         |  FROM t GROUP BY bucket),
         |f AS (
         |  SELECT bucket,
         |    list_reduce(
         |      [[CAST(0 AS BIGINT), CAST(-1 AS BIGINT)]] || docs,
         |      (acc, x) ->
         |        [CASE WHEN $fits THEN acc[1] + (-x[1]) ELSE (-x[1]) END,
         |         CASE WHEN $fits THEN acc[2] ELSE acc[2] + 1 END]
         |        || list_slice(acc, 3, len(acc))
         |        || [x[2], -x[1],
         |            CASE WHEN $fits THEN acc[2] ELSE acc[2] + 1 END,
         |            CASE WHEN $fits THEN acc[1] ELSE CAST(0 AS BIGINT) END]
         |    ) AS packed
         |  FROM b),
         |e AS (
         |  SELECT bucket, packed,
         |    unnest(range(0, (len(packed) - 2) // 4)) AS k
         |  FROM f),
         |pk AS (
         |  SELECT packed[3 + k * 4] AS doc_id, bucket,
         |    packed[4 + k * 4] AS n_tokens, packed[5 + k * 4] AS shard,
         |    packed[6 + k * 4] AS "offset"
         |  FROM e)"""
  }

  def oracleSql: Map[String, String] = Map(
    "pagerank_centrality" -> pageRankOracle(10),
    "pagerank_weighted" -> weightedPageRankOracle(10),
    "pagerank_personalized" -> personalizedPageRankOracle(10),
    "hits_centrality" -> hitsOracle(8),
    "community_labels" -> lpaOracle(5),
    "seed_distance" -> bfsOracle(4),
    "shortest_paths" -> ssspOracle(4),
    "kcore_layers" -> kcoreOracle(2, 9),
    "markov_attribution" -> markovOracle(12),
    // C58: exact-integer supports; total (support DESC, u, v) order
    // makes the LIMIT boundary engine-independent
    // C60: co-counts are C58's integers; the cosine is one
    // sqrt/÷ chain over exact integer products — correctly-rounded
    // IEEE in both engines, hashes raw
    "item_cosine" ->
      """WITH lp AS (
        |  SELECT DISTINCT l_orderkey AS ok, l_partkey AS pk FROM lineitem),
        |f AS (SELECT pk, COUNT(*) AS n FROM lp GROUP BY pk),
        |p AS (
        |  SELECT a.pk AS u, b.pk AS v, COUNT(*) AS support
        |  FROM lp a JOIN lp b ON a.ok = b.ok AND a.pk < b.pk
        |  GROUP BY 1, 2 HAVING COUNT(*) >= 2)
        |SELECT u, v, support,
        |  CAST(support AS DOUBLE) / sqrt(CAST(fu.n * fv.n AS DOUBLE)) AS cosine
        |FROM p JOIN f fu ON fu.pk = u JOIN f fv ON fv.pk = v
        |ORDER BY cosine DESC, u, v LIMIT 50""".stripMargin,

    "frequent_pairs" ->
      """WITH lp AS (
        |  SELECT DISTINCT l_orderkey AS ok, l_partkey AS pk FROM lineitem)
        |SELECT a.pk AS u, b.pk AS v, COUNT(*) AS support
        |FROM lp a JOIN lp b ON a.ok = b.ok AND a.pk < b.pk
        |GROUP BY 1, 2 HAVING COUNT(*) >= 2
        |ORDER BY support DESC, u, v LIMIT 50""".stripMargin,
    "tfidf_search" -> tfidfOracle(
      graft.queries.WarehouseQueries.Bm25Terms, 50),

    "triangle_count" ->
      """WITH lp AS (SELECT DISTINCT l_orderkey AS ok, l_partkey AS pk
        |  FROM lineitem),
        |e AS (SELECT DISTINCT a.pk AS u, b.pk AS v
        |  FROM lp a JOIN lp b ON a.ok = b.ok AND a.pk < b.pk),
        |deg AS (SELECT id, COUNT(*) AS c FROM
        |  (SELECT u AS id FROM e UNION ALL SELECT v FROM e) GROUP BY id),
        |tri AS (SELECT e1.u AS a, e1.v AS b, e2.v AS c
        |  FROM e e1 JOIN e e2 ON e2.u = e1.v
        |  JOIN e e3 ON e3.u = e1.u AND e3.v = e2.v),
        |tn AS (SELECT id, COUNT(*) AS t FROM
        |  (SELECT a AS id FROM tri UNION ALL SELECT b FROM tri
        |   UNION ALL SELECT c FROM tri) GROUP BY id)
        |SELECT p.id, CAST(COALESCE(d.c, 0) AS BIGINT) AS degree,
        |  CAST(COALESCE(tn.t, 0) AS BIGINT) AS triangles,
        |  CASE WHEN COALESCE(d.c, 0) >= 2
        |    THEN round(2.0 * COALESCE(tn.t, 0)
        |      / CAST(d.c * (d.c - 1) AS DOUBLE), 6)
        |    ELSE 0.0 END AS lcc
        |FROM (SELECT CAST(p_partkey AS BIGINT) AS id FROM part) p
        |LEFT JOIN deg d USING (id) LEFT JOIN tn USING (id)
        |ORDER BY p.id""".stripMargin,

    // DSIR: two add-one unigram LMs (target = lang 'en', raw = whole
    // corpus, the exact lm_cross_entropy estimator twice), per-doc
    // Σ(lnPt − lnPr), Gumbel keys from the portable-XXH64 uniform;
    // ln drift + sum regrouping absorbed by the 6-dp round, the cut
    // ordered on the rounded key.
    "dsir_resample" ->
      raw"""WITH tokr AS (
        |  SELECT doc_id, unnest(string_split_regex(trim(text), '\s+')) AS w
        |  FROM documents WHERE len(trim(text)) > 0),
        |cr AS (SELECT w, COUNT(*) AS c FROM tokr GROUP BY w),
        |topr AS (SELECT w, c FROM cr ORDER BY c DESC, w LIMIT 64),
        |dr AS (SELECT CAST((SELECT SUM(c) FROM cr)
        |  + (SELECT COUNT(*) FROM topr) + 1 AS DOUBLE) AS d),
        |tokt AS (
        |  SELECT doc_id, unnest(string_split_regex(trim(text), '\s+')) AS w
        |  FROM documents WHERE lang = 'en' AND len(trim(text)) > 0),
        |ct AS (SELECT w, COUNT(*) AS c FROM tokt GROUP BY w),
        |topt AS (SELECT w, c FROM ct ORDER BY c DESC, w LIMIT 64),
        |dt AS (SELECT CAST((SELECT SUM(c) FROM ct)
        |  + (SELECT COUNT(*) FROM topt) + 1 AS DOUBLE) AS d),
        |lpw AS (
        |  SELECT t.doc_id,
        |    COALESCE(ln(CAST(a.c + 1 AS DOUBLE) / dt.d), ln(1.0 / dt.d))
        |      - COALESCE(ln(CAST(b.c + 1 AS DOUBLE) / dr.d), ln(1.0 / dr.d)) AS lw
        |  FROM tokr t LEFT JOIN topt a USING (w) LEFT JOIN topr b USING (w)
        |  CROSS JOIN dt CROSS JOIN dr),
        |sw AS (SELECT doc_id, SUM(lw) AS lw FROM lpw GROUP BY doc_id),
        |gw AS (SELECT d.doc_id, COALESCE(sw.lw, 0.0) AS lw
        |  FROM documents d LEFT JOIN sw USING (doc_id)),
        |uu AS (
        |  SELECT doc_id, (CAST($xxhBucket AS DOUBLE) + 0.5) / 1000000.0 AS u
        |  FROM (${xxh64Nested("SELECT doc_id FROM documents", "doc_id")}))
        |SELECT g.doc_id, round(g.lw, 6) AS log_weight,
        |  round(g.lw + (-ln(-ln(u.u))), 6) AS gumbel_key
        |FROM gw g JOIN uu u USING (doc_id)
        |ORDER BY gumbel_key DESC, g.doc_id
        |LIMIT 100""".stripMargin,

    // Temperature mixing: per-source √token-mass quotas (sqrt is
    // IEEE-correctly-rounded, the total folded in sorted-source order
    // — fixed association, identical doubles), selection by the
    // portable-XXH64 rank within source.
    "temperature_mix" ->
      raw"""WITH d AS (
        |  SELECT doc_id, source,
        |    CAST(len(string_split_regex(trim(text), '\s+')) AS BIGINT) AS n_tokens
        |  FROM documents),
        |m AS (SELECT source, SUM(n_tokens) AS n FROM d GROUP BY source),
        |ww AS (SELECT source, sqrt(CAST(n AS DOUBLE)) AS w FROM m),
        |tt AS (SELECT list_reduce(list(w ORDER BY source),
        |  (a, b) -> a + b) AS tot FROM ww),
        |q AS (SELECT source, CAST(floor(400 * w / tot) AS BIGINT) AS quota
        |  FROM ww CROSS JOIN tt),
        |r AS (
        |  SELECT doc_id, source, n_tokens,
        |    row_number() OVER (PARTITION BY source
        |      ORDER BY $xxhBucket, doc_id) AS rk
        |  FROM (${xxh64Nested("SELECT doc_id, source, n_tokens FROM d", "doc_id")}))
        |SELECT r.doc_id, r.source, r.n_tokens
        |FROM r JOIN q USING (source) WHERE rk <= quota
        |ORDER BY r.doc_id""".stripMargin,

    // UniMax water-fill: the driver's greedy integer fold replays as a
    // recursive CTE walking strata in (cap, name) order — every step
    // BIGINT, so quotas and the kept set hash-match; selection is the
    // same portable-XXH64 rank the other mixture oracles use
    // D91: the greedy marginal schedule as pure integer arithmetic —
    // marginals ride as u·7^k·10^(7−k) (0.7^k in fixed point, common
    // denominator), so the order, the prefix-mass walk, and the
    // partial boundary epoch are all BIGINT-exact in both engines
    "epoch_allocation" ->
      """WITH m AS (
        |  SELECT source,
        |    CAST(SUM(len(string_split_regex(trim(text), '\s+'))) AS BIGINT) AS u
        |  FROM documents WHERE source IS NOT NULL GROUP BY source),
        |t AS (SELECT CAST(SUM(u) AS BIGINT) AS tu FROM m),
        |c AS (
        |  SELECT source, u, k,
        |    ([10000000, 7000000, 4900000, 3430000, 2401000, 1680700,
        |      1176490, 823543][k + 1]) AS mult
        |  FROM m CROSS JOIN (SELECT unnest(range(0, 8)) AS k)),
        |w AS (
        |  SELECT source, u, k, mult, u * mult AS mv,
        |    COALESCE(SUM(u) OVER (ORDER BY u * mult DESC, source, k
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS prev,
        |    (SELECT tu * 3 // 2 FROM t) AS b
        |  FROM c),
        |a AS (
        |  SELECT source, u, k, mult,
        |    CASE WHEN prev >= b THEN 0
        |         ELSE LEAST(u, b - prev) END AS alloc
        |  FROM w)
        |SELECT source, u AS unique_tokens,
        |  CAST(COUNT(*) FILTER (WHERE alloc > 0) AS INTEGER) AS n_epochs,
        |  CAST(COUNT(*) FILTER (WHERE alloc = u AND u > 0) AS INTEGER)
        |    AS full_epochs,
        |  CAST(SUM(alloc) AS BIGINT) AS tokens_alloc,
        |  CAST(SUM(alloc * mult) AS BIGINT) AS eff_fp
        |FROM a GROUP BY source, u ORDER BY source""".stripMargin,

    "unimax_mix" ->
      s"""WITH RECURSIVE caps AS (
        |  SELECT lang AS s, CAST(COUNT(*) AS BIGINT) AS cap
        |  FROM documents GROUP BY lang),
        |nn AS (SELECT CAST(COUNT(*) AS BIGINT) AS n FROM caps),
        |srt AS (SELECT s, cap,
        |    CAST(ROW_NUMBER() OVER (ORDER BY cap, s) AS BIGINT) AS i
        |  FROM caps),
        |alloc AS (
        |  SELECT CAST(0 AS BIGINT) AS i, CAST(380 AS BIGINT) AS rem,
        |         CAST(NULL AS VARCHAR) AS s, CAST(0 AS BIGINT) AS a
        |  UNION ALL
        |  SELECT t.i,
        |         al.rem - LEAST(t.cap, al.rem // (nn.n - t.i + 1)),
        |         t.s,
        |         LEAST(t.cap, al.rem // (nn.n - t.i + 1))
        |  FROM alloc al JOIN srt t ON t.i = al.i + 1 CROSS JOIN nn),
        |q AS (SELECT s AS lang, a AS quota FROM alloc WHERE i > 0),
        |r AS (
        |  SELECT doc_id, lang,
        |    row_number() OVER (PARTITION BY lang
        |      ORDER BY $xxhBucket, doc_id) AS rk
        |  FROM (${xxh64Nested("SELECT doc_id, lang FROM documents", "doc_id")}))
        |SELECT r.doc_id, r.lang FROM r JOIN q USING (lang)
        |WHERE rk <= quota
        |ORDER BY r.doc_id""".stripMargin,

    "vocab_tokenize" -> vocabTokenizeOracle(
      graft.queries.TextQueries.SubwordVocab, 3),
    "vocab_tokenize_ids" -> vocabTokenizeIdsOracle(
      graft.queries.TextQueries.SubwordVocab, 3),
    "vocab_oov_rate" -> vocabOovOracle(
      graft.queries.TextQueries.SubwordVocab, 3),

    // composes the (already bit-exact) D9 quality doubles with the
    // portable-XXH64 bucket; the clamp and the bucket<score·M compare
    // mirror Resample.byScore exactly
    "quality_weighted_sample" ->
      s"""WITH t AS (
        |  SELECT doc_id, string_split_regex(trim(text), '\\s+') AS tk FROM documents),
        |c AS (
        |  SELECT doc_id,
        |    CAST(len(tk) AS DOUBLE) AS n,
        |    CAST(len(list_distinct(tk)) AS DOUBLE) AS u,
        |    CAST(len(list_filter(tk, x -> list_contains(
        |      ['the','a','of','and','to','in','is'], x))) AS DOUBLE) AS h
        |  FROM t),
        |s AS (
        |  SELECT doc_id,
        |    0.4 * least(n / 64.0, 1.0) + 0.4 * (u / n)
        |      + 0.2 * least((h / n) * 8.0, 1.0) AS quality
        |  FROM c),
        |hb AS (
        |  SELECT doc_id, $xxhBucket AS bucket
        |  FROM (${xxh64Nested("SELECT doc_id FROM documents", "doc_id")}))
        |SELECT doc_id, quality
        |FROM s JOIN hb USING (doc_id)
        |WHERE CAST(bucket AS DOUBLE) < greatest(0.0, least(1.0, quality)) * 1000000
        |ORDER BY doc_id""".stripMargin,

    "fuzzy_name_match" ->
      """SELECT a.c_custkey AS a_id, a.c_name AS a_val,
        |  b.c_custkey AS b_id, b.c_name AS b_val,
        |  CAST(levenshtein(a.c_name, b.c_name) AS INTEGER) AS dist
        |FROM customer a, customer b
        |WHERE a.c_custkey < b.c_custkey
        |  AND levenshtein(a.c_name, b.c_name) <= 1
        |ORDER BY a_id, b_id""".stripMargin,

    // gap-fill: densify per-user daily series over each user's own
    // span, forward-fill via IGNORE NULLS; sums decimal-exact
    "events_gap_fill" ->
      """WITH daily AS (
        |  SELECT user_id, date_trunc('day', ts) AS day,
        |    CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS day_value
        |  FROM events GROUP BY user_id, date_trunc('day', ts)),
        |cal AS (
        |  SELECT user_id, unnest(generate_series(
        |    min(day), max(day), INTERVAL 1 DAY)) AS day
        |  FROM daily GROUP BY user_id)
        |SELECT c.user_id, c.day,
        |  last_value(d.day_value IGNORE NULLS) OVER (
        |    PARTITION BY c.user_id ORDER BY c.day
        |    ROWS UNBOUNDED PRECEDING) AS filled_value,
        |  d.day_value IS NULL AS is_gap
        |FROM cal c LEFT JOIN daily d USING (user_id, day)
        |ORDER BY c.user_id, c.day""".stripMargin,

    "events_sliding_agg" ->
      """WITH x AS (
        |  SELECT time_bucket(INTERVAL '15 minutes', ts)
        |           - k * INTERVAL '15 minutes' AS window_start,
        |         event_type, value
        |  FROM events, (SELECT unnest([0, 1, 2, 3]) AS k))
        |SELECT window_start, window_start + INTERVAL '1 hour' AS window_end,
        |  event_type, COUNT(*) AS n_events,
        |  CAST(SUM(CAST(value AS DECIMAL(12,2))) AS DOUBLE) AS sum_value
        |FROM x GROUP BY window_start, event_type
        |ORDER BY window_start, event_type""".stripMargin,

    "events_outliers" ->
      """WITH s AS (
        |  SELECT event_type, COUNT(*) AS n,
        |    SUM(CAST(value AS DECIMAL(12,2))) AS s1,
        |    SUM(CAST(value AS DECIMAL(12,2)) * CAST(value AS DECIMAL(12,2))) AS s2
        |  FROM events GROUP BY 1),
        |z AS (
        |  SELECT event_id, e.event_type, value,
        |    (CAST(s2 AS DOUBLE)
        |        - (CAST(s1 AS DOUBLE) * CAST(s1 AS DOUBLE)) / CAST(n AS DOUBLE))
        |      / (CAST(n AS DOUBLE) - 1.0) AS variance,
        |    n,
        |    (value - CAST(s1 AS DOUBLE) / CAST(n AS DOUBLE))
        |      / sqrt((CAST(s2 AS DOUBLE)
        |          - (CAST(s1 AS DOUBLE) * CAST(s1 AS DOUBLE)) / CAST(n AS DOUBLE))
        |        / (CAST(n AS DOUBLE) - 1.0)) AS z
        |  FROM events e JOIN s USING (event_type))
        |SELECT event_id, event_type, value, z FROM z
        |WHERE n >= 2 AND variance > 0.0 AND abs(z) > 3.0
        |ORDER BY event_id""".stripMargin,

    "ewma_user_value" -> ewmaOracle(0.3),

    "holt_forecast" -> holtOracle(0.3, 0.3),
    // E22 stream face: merged per-(user, day) decimal sums +
    // the same fold == the batch query exactly
    "stream_holt_forecast" -> holtOracle(0.3, 0.3),
    "holt_winters_forecast" -> holtWintersOracle(0.3, 0.2, 0.4, 7),

    // quality CTE mirrors text_quality_score's (already hash-green →
    // the per-doc quality doubles are bit-identical in both engines);
    // the threshold logic mirrors TextQueries.qualityFilter: 2-dp
    // buckets, p75 = least bucket with cum ≥ 0.75·N, keep b ≥ thr.
    "quality_filter" ->
      """WITH t AS (
        |  SELECT doc_id, string_split_regex(trim(text), '\s+') AS tk FROM documents),
        |c AS (
        |  SELECT doc_id,
        |    CAST(len(tk) AS DOUBLE) AS n,
        |    CAST(len(list_distinct(tk)) AS DOUBLE) AS u,
        |    CAST(len(list_filter(tk, x -> list_contains(
        |      ['the','a','of','and','to','in','is'], x))) AS DOUBLE) AS h
        |  FROM t),
        |s AS (
        |  SELECT doc_id,
        |    0.4 * least(n / 64.0, 1.0) + 0.4 * (u / n)
        |      + 0.2 * least((h / n) * 8.0, 1.0) AS quality
        |  FROM c),
        |sb AS (SELECT doc_id, quality,
        |  CAST(floor(quality * 100.0) AS BIGINT) AS b FROM s),
        |hist AS (SELECT b, COUNT(*) AS cnt FROM sb GROUP BY 1),
        |cum AS (SELECT b, SUM(cnt) OVER (ORDER BY b
        |  ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum FROM hist),
        |thr AS (SELECT MIN(b) AS thr FROM cum, (SELECT COUNT(*) AS n FROM sb)
        |  WHERE cum >= n * 0.75)
        |SELECT doc_id, quality FROM sb, thr WHERE b >= thr
        |ORDER BY doc_id""".stripMargin,

    "cohort_retention" ->
      """WITH f AS (
        |  -- DuckDB's week-trunc yields DATE; Spark's yields TIMESTAMP
        |  SELECT user_id, CAST(date_trunc('week', MIN(ts)) AS TIMESTAMP) AS cohort_week
        |  FROM events GROUP BY 1),
        |w AS (SELECT DISTINCT user_id,
        |  CAST(date_trunc('week', ts) AS TIMESTAMP) AS week FROM events)
        |SELECT cohort_week,
        |  CAST(date_diff('day', cohort_week, week) / 7 AS BIGINT) AS week_number,
        |  COUNT(DISTINCT user_id) AS active_users
        |FROM w JOIN f USING (user_id)
        |GROUP BY cohort_week, week_number
        |ORDER BY cohort_week, week_number""".stripMargin,

    "events_enriched_agg" ->
      """SELECT c_mktsegment, event_type, COUNT(*) AS n_events,
        |  CAST(SUM(CAST(value AS DECIMAL(12,2))) AS DOUBLE) AS sum_value
        |FROM events e JOIN customer c ON e.user_id = c.c_custkey
        |GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,

    // same history CTE as scd2_history; empty intervals dropped so the
    // ASOF pick is unique — mirrors eventsPriorityAtTime exactly
    "events_priority_at_time" ->
      """WITH v AS (
        |  SELECT o_custkey, o_orderpriority, o_orderdate, o_orderkey,
        |    lag(o_orderpriority) OVER (PARTITION BY o_custkey
        |      ORDER BY o_orderdate, o_orderkey) AS prev
        |  FROM orders),
        |c AS (SELECT * FROM v WHERE prev IS DISTINCT FROM o_orderpriority),
        |hist AS (
        |  SELECT o_custkey AS user_id, o_orderpriority AS priority_at_event,
        |    o_orderdate AS valid_from,
        |    lead(o_orderdate) OVER w AS valid_to
        |  FROM c
        |  WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey)),
        |h AS (SELECT * FROM hist WHERE valid_to IS NULL OR valid_from < valid_to)
        |SELECT e.event_id, e.user_id, e.ts, h.priority_at_event
        |FROM events e
        |ASOF LEFT JOIN h ON e.user_id = h.user_id AND e.ts >= h.valid_from
        |ORDER BY e.event_id""".stripMargin,

    "window_suite" ->
      """SELECT l_suppkey, l_orderkey, l_linenumber, l_quantity,
        |  CAST(ntile(4) OVER w AS INTEGER) AS quartile,
        |  percent_rank() OVER w AS pct_rank,
        |  cume_dist() OVER w AS cume,
        |  lag(l_quantity, 1) OVER w AS prev_qty,
        |  lead(l_quantity, 1) OVER w AS next_qty,
        |  first_value(l_quantity) OVER w AS first_qty,
        |  nth_value(l_quantity, 3) OVER w AS third_qty
        |FROM lineitem
        |WINDOW w AS (PARTITION BY l_suppkey
        |  ORDER BY l_shipdate, l_orderkey, l_linenumber)
        |ORDER BY l_suppkey, l_orderkey, l_linenumber""".stripMargin,

    "grouping_sets_totals" -> s"""SELECT l_returnflag, l_linestatus,
        |  ${dsum("l_quantity")} AS sum_qty, COUNT(*) AS n,
        |  CAST(GROUPING(l_returnflag) * 2 + GROUPING(l_linestatus) AS BIGINT) AS gid
        |FROM lineitem
        |GROUP BY GROUPING SETS ((l_returnflag, l_linestatus), (l_returnflag), ())
        |ORDER BY gid, l_returnflag ASC NULLS FIRST, l_linestatus ASC NULLS FIRST""".stripMargin,

    "scd2_history" ->
      """WITH v AS (
        |  SELECT o_custkey, o_orderpriority, o_orderdate, o_orderkey,
        |    lag(o_orderpriority) OVER (PARTITION BY o_custkey
        |      ORDER BY o_orderdate, o_orderkey) AS prev
        |  FROM orders),
        |c AS (SELECT * FROM v WHERE prev IS DISTINCT FROM o_orderpriority)
        |SELECT o_custkey, o_orderpriority, o_orderdate AS valid_from,
        |  lead(o_orderdate) OVER w AS valid_to,
        |  (lead(o_orderdate) OVER w) IS NULL AS is_current
        |FROM c
        |WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey)
        |ORDER BY o_custkey, valid_from, o_orderpriority""".stripMargin,

    "funnel_steps" ->
      """WITH e AS (SELECT user_id, event_type, ts, event_id FROM events),
        |q0 AS (SELECT *, CASE WHEN event_type = 'view' THEN ts END AS c0 FROM e),
        |w0 AS (SELECT *, MIN(c0) OVER (PARTITION BY user_id ORDER BY ts, event_id
        |         ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS saw0 FROM q0),
        |q1 AS (SELECT *, CASE WHEN event_type = 'click' AND saw0 IS NOT NULL
        |         AND ts <= saw0 + INTERVAL 4 HOUR THEN ts END AS c1 FROM w0),
        |w1 AS (SELECT *, MIN(c1) OVER (PARTITION BY user_id ORDER BY ts, event_id
        |         ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS saw1 FROM q1),
        |q2 AS (SELECT *, CASE WHEN event_type = 'purchase' AND saw1 IS NOT NULL
        |         AND ts <= saw1 + INTERVAL 4 HOUR THEN ts END AS c2 FROM w1)
        |SELECT step, stage, users FROM (
        |  SELECT 1 AS step, 'view' AS stage,
        |    COUNT(DISTINCT CASE WHEN c0 IS NOT NULL THEN user_id END) AS users FROM q2
        |  UNION ALL SELECT 2, 'click',
        |    COUNT(DISTINCT CASE WHEN c1 IS NOT NULL THEN user_id END) FROM q2
        |  UNION ALL SELECT 3, 'purchase',
        |    COUNT(DISTINCT CASE WHEN c2 IS NOT NULL THEN user_id END) FROM q2
        |) ORDER BY step""".stripMargin,

    "bucketed_join" ->
      """SELECT o_orderkey, o_orderpriority, COUNT(*) AS n_items,
        |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2))
        |    * (CAST(1 AS DECIMAL(3,2)) - CAST(l_discount AS DECIMAL(4,2)))) AS DOUBLE) AS revenue
        |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        |GROUP BY 1, 2 ORDER BY 1""".stripMargin,

    "table_profile" -> profileOracle("customer",
      graft.queries.WarehouseQueries.ProfileCols,
      Set("c_acctbal", "c_custkey", "c_nationkey")),

    "bm25_search" -> bm25Oracle(
      graft.queries.WarehouseQueries.Bm25Terms, 50, 1.2, 0.75),

    // D101: pass-1 BM25 verbatim, ordered expansion pick, pass-2
    // join-based BM25 with the pinned per-doc term fold
    "rocchio_prf_search" -> rocchioPrfOracle(
      graft.queries.WarehouseQueries.Bm25Terms,
      kDocs = 5, kExp = 3, k = 50, k1 = 1.2, b = 0.75),

    "ql_search" -> qlOracle(
      graft.queries.WarehouseQueries.Bm25Terms, 50, 100.0),

    // C62: all-integer micros fold — list_reduce with the list-typed
    // accumulator trick replays the engine's greedy chain-start state
    // exactly (same (t, tiebreak, step) sort, same CASE branches)
    "window_funnel" ->
      """WITH e AS (
        |  SELECT user_id, epoch_us(ts) AS t, event_id AS tb,
        |    CASE event_type WHEN 'view' THEN 0 WHEN 'click' THEN 1
        |         WHEN 'purchase' THEN 2 ELSE -1 END AS s
        |  FROM events),
        |g AS (
        |  SELECT user_id, list_sort(list([t, tb, s])) AS arr
        |  FROM e WHERE s >= 0 GROUP BY user_id),
        |f AS (
        |  SELECT user_id,
        |    list_reduce(
        |      list_prepend([CAST('-9223372036854775808' AS BIGINT),
        |                    CAST('-9223372036854775808' AS BIGINT),
        |                    CAST('-9223372036854775808' AS BIGINT)], arr),
        |      (acc, x) -> list_transform(range(1, 4), d -> CASE
        |        WHEN d = 1 AND x[3] = 0 THEN greatest(acc[1], x[1])
        |        WHEN d - 1 = x[3] AND x[3] > 0
        |             AND acc[d - 1] != CAST('-9223372036854775808' AS BIGINT)
        |             AND x[1] - acc[d - 1] <= 86400000000
        |             THEN greatest(acc[d], acc[d - 1])
        |        ELSE acc[d] END)) AS st
        |  FROM g)
        |SELECT user_id,
        |  CAST(len(list_filter(st,
        |    v -> v != CAST('-9223372036854775808' AS BIGINT))) AS INTEGER)
        |    AS depth
        |FROM f ORDER BY user_id""".stripMargin,

    "bootstrap_quality_ci" -> bootstrapOracle(200, 0.025),
    // the streaming face must land on the EXACT batch bits — one SQL
    "stream_bootstrap_ci" -> bootstrapOracle(200, 0.025),

    "dedup_weighted_jaccard" -> icwsOracle(32),

    // every leg is an exact integer count; rule names are the stable
    // sort key on both sides
    "data_expectations" ->
      """WITH legs AS (
        |  SELECT 'not_null(o_custkey)' AS rule,
        |    COUNT(*) FILTER (WHERE o_custkey IS NULL) AS violations FROM orders
        |  UNION ALL
        |  SELECT 'in_range(o_totalprice)',
        |    COUNT(*) FILTER (WHERE o_totalprice IS NOT NULL
        |      AND (o_totalprice < 0.0 OR o_totalprice > 400000.0)) FROM orders
        |  UNION ALL
        |  SELECT 'in_set(o_orderstatus)',
        |    COUNT(*) FILTER (WHERE o_orderstatus IS NOT NULL
        |      AND o_orderstatus NOT IN ('O', 'F')) FROM orders
        |  UNION ALL
        |  SELECT 'matches(o_orderpriority)',
        |    COUNT(*) FILTER (WHERE o_orderpriority IS NOT NULL
        |      AND NOT regexp_matches(o_orderpriority, '^[1-5]-')) FROM orders
        |  UNION ALL
        |  SELECT 'unique(o_orderkey)',
        |    COUNT(o_orderkey) - COUNT(DISTINCT o_orderkey) FROM orders
        |  UNION ALL
        |  SELECT 'ref_integrity(o_custkey)',
        |    (SELECT COUNT(*) FROM orders o
        |     LEFT JOIN customer c ON o.o_custkey = c.c_custkey
        |     WHERE o.o_custkey IS NOT NULL AND c.c_custkey IS NULL))
        |SELECT rule, CAST(violations AS BIGINT) AS violations,
        |  (violations = 0) AS pass
        |FROM legs ORDER BY rule""".stripMargin,

    // the E11 stream face monitors the ROW-LEVEL rule subset only
    // (uniqueness/ref-integrity are not per-batch decomposable); the
    // summed per-batch counts equal the batch scan exactly
    "stream_quality_totals" ->
      """WITH legs AS (
        |  SELECT 'not_null(o_custkey)' AS rule,
        |    COUNT(*) FILTER (WHERE o_custkey IS NULL) AS violations FROM orders
        |  UNION ALL
        |  SELECT 'in_range(o_totalprice)',
        |    COUNT(*) FILTER (WHERE o_totalprice IS NOT NULL
        |      AND (o_totalprice < 0.0 OR o_totalprice > 400000.0)) FROM orders
        |  UNION ALL
        |  SELECT 'in_set(o_orderstatus)',
        |    COUNT(*) FILTER (WHERE o_orderstatus IS NOT NULL
        |      AND o_orderstatus NOT IN ('O', 'F')) FROM orders
        |  UNION ALL
        |  SELECT 'matches(o_orderpriority)',
        |    COUNT(*) FILTER (WHERE o_orderpriority IS NOT NULL
        |      AND NOT regexp_matches(o_orderpriority, '^[1-5]-')) FROM orders)
        |SELECT rule, CAST(violations AS BIGINT) AS violations,
        |  (violations = 0) AS pass
        |FROM legs ORDER BY rule""".stripMargin,

    "json_ingest" ->
      """SELECT CAST(json_extract_string(props, '$.k') AS BIGINT) AS k, COUNT(*) AS n
        |FROM events GROUP BY 1 ORDER BY 1""".stripMargin,

    // The Spark query (ReferenceQueries.csvIngest) first dumps the same
    // deterministic CSV the oracle reads; the driver runs Verify before
    // the DuckDB pass, so the files exist. Verify runs at sf0.01 — the
    // path is pinned to that SF on purpose (a bench run at another SF
    // writes to its own directory and cannot clobber this one).
    "csv_ingest" ->
      """SELECT match_id, COUNT(*) AS n_rows,
        |  CAST(SUM(min_played) AS BIGINT) AS sum_min,
        |  CAST(SUM(key_passes) AS BIGINT) AS sum_kp,
        |  CAST(SUM(CAST(xg AS DECIMAL(18,2))) AS DOUBLE) AS sum_xg,
        |  CAST(SUM(CAST(xa AS DECIMAL(18,2))) AS DOUBLE) AS sum_xa
        |FROM read_csv('/tmp/graft_csv_ingest/sf0.01/*.csv', header=true,
        |  ignore_errors=true,
        |  columns={'row_idx':'BIGINT','id':'BIGINT','full_name':'VARCHAR',
        |    'min_played':'INTEGER','key_passes':'INTEGER','assists':'INTEGER',
        |    'shots':'INTEGER','xg':'DOUBLE','xa':'DOUBLE','match_id':'BIGINT'})
        |GROUP BY match_id ORDER BY match_id""".stripMargin,

    "code_mapping" ->
      """SELECT c_mktsegment,
        |  CASE c_mktsegment WHEN 'AUTOMOBILE' THEN 1 WHEN 'BUILDING' THEN 2
        |    WHEN 'FURNITURE' THEN 3 WHEN 'HOUSEHOLD' THEN 4
        |    WHEN 'MACHINERY' THEN 5 ELSE 0 END AS segment_code,
        |  COUNT(*) AS n
        |FROM customer GROUP BY 1, 2 ORDER BY segment_code""".stripMargin,

    "upsert_keep_latest" ->
      """SELECT event_id, ts, user_id, event_type, value FROM (
        |  SELECT event_id, ts, user_id, event_type, value,
        |    row_number() OVER (PARTITION BY user_id, event_type
        |                       ORDER BY ts DESC, event_id DESC) AS rn
        |  FROM events) WHERE rn = 1 ORDER BY user_id, event_type""".stripMargin,

    "incremental_load" ->
      """SELECT o_orderkey, o_custkey, o_orderdate FROM orders
        |WHERE date_trunc('month', o_orderdate) =
        |  (SELECT MAX(date_trunc('month', o_orderdate)) FROM orders)
        |ORDER BY o_orderkey""".stripMargin,

    "pk_dedup" ->
      """SELECT l_orderkey, l_linenumber, l_partkey, l_suppkey FROM (
        |  SELECT l_orderkey, l_linenumber, l_partkey, l_suppkey,
        |    row_number() OVER (PARTITION BY l_orderkey
        |      ORDER BY l_linenumber, l_partkey, l_suppkey) AS rn
        |  FROM lineitem) WHERE rn = 1 ORDER BY l_orderkey""".stripMargin,

    "top_n_by_metric" ->
      """SELECT c_custkey, c_name, c_acctbal FROM customer
        |ORDER BY c_acctbal DESC, c_custkey LIMIT 9""".stripMargin,

    "ratio_metric" ->
      """SELECT p_partkey, p_name, p_retailprice,
        |  p_retailprice / CAST(p_size AS DOUBLE) AS price_per_size
        |FROM part ORDER BY p_retailprice DESC, p_partkey LIMIT 9""".stripMargin,

    "dashboard_detail" -> s"""WITH $monthlyCte,
        |totals AS (
        |  SELECT o_custkey, ${dsum("o_totalprice")} AS total_spend, COUNT(*) AS n_orders
        |  FROM orders GROUP BY 1),
        |piv AS (
        |  SELECT o_custkey,
        |    CAST(MAX(CASE WHEN rk = 1 THEN mspend END) AS DOUBLE) AS m1_spend,
        |    CAST(MAX(CASE WHEN rk = 2 THEN mspend END) AS DOUBLE) AS m2_spend,
        |    CAST(MAX(CASE WHEN rk = 3 THEN mspend END) AS DOUBLE) AS m3_spend
        |  FROM monthly JOIN ranked USING (month) WHERE rk <= 3 GROUP BY 1),
        |avg4 AS (
        |  SELECT o_custkey, CAST(SUM(mspend) AS DOUBLE) / 4.0 AS avg_4m
        |  FROM monthly JOIN ranked USING (month) WHERE rk <= 4 GROUP BY 1)
        |SELECT c_custkey, c_name, c_mktsegment, n_name AS nation_name,
        |  concat_ws(' ', c_name, n_name) AS display_name,
        |  COALESCE(total_spend, 0.0) AS total_spend,
        |  COALESCE(n_orders, 0) AS n_orders,
        |  avg_4m, m1_spend, m2_spend, m3_spend
        |FROM customer
        |LEFT JOIN nation ON n_nationkey = c_nationkey
        |LEFT JOIN totals ON totals.o_custkey = c_custkey
        |LEFT JOIN piv ON piv.o_custkey = c_custkey
        |LEFT JOIN avg4 ON avg4.o_custkey = c_custkey
        |ORDER BY total_spend DESC, c_custkey LIMIT 15""".stripMargin,

    "last_periods_pivot" -> s"""WITH $monthlyCte
        |SELECT o_custkey,
        |  CAST(MAX(CASE WHEN rk = 1 THEN mspend END) AS DOUBLE) AS m1_spend,
        |  CAST(MAX(CASE WHEN rk = 2 THEN mspend END) AS DOUBLE) AS m2_spend,
        |  CAST(MAX(CASE WHEN rk = 3 THEN mspend END) AS DOUBLE) AS m3_spend
        |FROM monthly JOIN ranked USING (month) WHERE rk <= 3
        |GROUP BY 1 ORDER BY o_custkey""".stripMargin,

    "entity_time_series" ->
      """SELECT CAST(date_trunc('month', o_orderdate) AS TIMESTAMP) AS month,
        |  CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS spend,
        |  COUNT(*) AS n_orders
        |FROM orders WHERE o_custkey = 42
        |GROUP BY 1 ORDER BY 1""".stripMargin,

    "rolling_period_avg" -> s"""WITH $monthlyCte
        |SELECT o_custkey, CAST(SUM(mspend) AS DOUBLE) / 4.0 AS avg_4m
        |FROM monthly JOIN ranked USING (month) WHERE rk <= 4
        |GROUP BY 1 ORDER BY o_custkey""".stripMargin,

    "stats_totals_a" -> s"""WITH $statsTotalsCte
        |SELECT l_partkey, n_lines, total_qty, total_price, disc_amount,
        |  tax_amount, disc_amount + tax_amount AS total_levies
        |FROM t ORDER BY total_qty DESC, l_partkey LIMIT 15""".stripMargin,

    "stats_totals_b" -> s"""WITH $statsTotalsCte
        |SELECT l_partkey, n_lines, total_qty, total_price, disc_amount,
        |  tax_amount, disc_amount + tax_amount AS total_levies
        |FROM t ORDER BY total_price DESC, l_partkey LIMIT 15""".stripMargin,

    "point_lookup" ->
      "SELECT c_custkey, c_name FROM customer WHERE c_name = 'Customer#000000042'",

    "join_quality" ->
      """SELECT COUNT(*) AS n_orphans FROM orders o
        |WHERE NOT EXISTS (SELECT 1 FROM customer c WHERE c.c_custkey = o.o_custkey)""".stripMargin,

    "last_watermark" ->
      "SELECT MAX(o_orderdate) AS last_period, MAX(o_orderkey) AS last_key FROM orders",

    "q1_pricing_summary" -> s"""SELECT l_returnflag, l_linestatus,
        |  ${dsum("l_quantity")} AS sum_qty,
        |  ${dsum("l_extendedprice")} AS sum_base_price,
        |  $revenueSum AS sum_disc_price,
        |  CAST(SUM(${DP.format("l_extendedprice")} * ($ONE - ${DR.format("l_discount")})
        |    * ($ONE + ${DR.format("l_tax")})) AS DOUBLE) AS sum_charge,
        |  ${davg("l_quantity")} AS avg_qty,
        |  ${davg("l_extendedprice")} AS avg_price,
        |  ${davg("l_discount")} AS avg_disc,
        |  COUNT(*) AS count_order
        |FROM lineitem GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,

    "q3_shipping_priority" -> s"""SELECT l_orderkey, o_orderdate, o_orderpriority,
        |  $revenueSum AS revenue
        |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        |JOIN customer ON o_custkey = c_custkey
        |WHERE c_mktsegment = 'BUILDING'
        |GROUP BY 1, 2, 3 ORDER BY revenue DESC, l_orderkey LIMIT 20""".stripMargin,

    // Q17 shape: the correlated scalar subquery decorrelated the same
    // way the Spark side writes it — per-part decimal-exact avg (sum
    // cast double / count, THEN ×0.2), decimal revenue sum / 7.0
    "q17_small_quantity" ->
      """WITH thr AS (
        |  SELECT l_partkey,
        |    CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE)
        |      / COUNT(l_quantity) * 0.2 AS thr
        |  FROM lineitem GROUP BY l_partkey)
        |SELECT p_brand,
        |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE)
        |    / 7.0 AS avg_yearly
        |FROM lineitem JOIN thr USING (l_partkey)
        |JOIN part ON p_partkey = l_partkey
        |WHERE l_quantity < thr
        |GROUP BY p_brand ORDER BY p_brand""".stripMargin,

    // Q18 shape: HAVING-subquery membership as agg → filter → semi join
    "q18_large_volume" ->
      """WITH big AS (
        |  SELECT l_orderkey FROM lineitem GROUP BY l_orderkey
        |  HAVING SUM(CAST(l_quantity AS DECIMAL(18,2))) > 250)
        |SELECT c_name, c_custkey, o_orderkey, o_orderdate, o_totalprice,
        |  CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS total_qty
        |FROM orders
        |JOIN big ON o_orderkey = big.l_orderkey
        |JOIN lineitem ON o_orderkey = lineitem.l_orderkey
        |JOIN customer ON o_custkey = c_custkey
        |GROUP BY c_name, c_custkey, o_orderkey, o_orderdate, o_totalprice
        |ORDER BY o_totalprice DESC, o_orderdate, o_orderkey
        |LIMIT 100""".stripMargin,

    "q2_min_cost" ->
      """WITH ps AS (
        |  SELECT l_partkey, l_suppkey,
        |    MIN(CAST(l_extendedprice AS DECIMAL(18,2))) AS cost
        |  FROM lineitem GROUP BY 1, 2),
        |m AS (SELECT l_partkey, MIN(cost) AS mc FROM ps GROUP BY 1)
        |SELECT ps.l_partkey AS p_partkey, ps.l_suppkey AS s_suppkey,
        |  CAST(ps.cost AS DOUBLE) AS cost
        |FROM ps JOIN m ON ps.l_partkey = m.l_partkey AND ps.cost = m.mc
        |ORDER BY p_partkey, s_suppkey""".stripMargin,

    "q16_supplier_variety" ->
      """SELECT p_brand, p_size,
        |  CAST(COUNT(DISTINCT l_suppkey) AS BIGINT) AS supplier_cnt
        |FROM lineitem
        |JOIN part ON l_partkey = p_partkey
        |WHERE l_suppkey NOT IN
        |  (SELECT s_suppkey FROM supplier WHERE s_acctbal < 0)
        |GROUP BY 1, 2 ORDER BY supplier_cnt DESC, p_brand, p_size""".stripMargin,

    "q21_suppliers_waiting" ->
      """WITH lo AS (
        |  SELECT l_orderkey, l_suppkey, l_shipdate, o_orderdate, o_orderstatus
        |  FROM lineitem JOIN orders ON l_orderkey = o_orderkey),
        |l1 AS (
        |  SELECT DISTINCT l_orderkey AS ok, l_suppkey AS sk FROM lo
        |  WHERE o_orderstatus = 'F'
        |    AND l_shipdate > o_orderdate + INTERVAL 90 DAY)
        |SELECT s_name, CAST(COUNT(*) AS BIGINT) AS numwait
        |FROM l1 JOIN supplier ON sk = s_suppkey
        |WHERE EXISTS (SELECT 1 FROM lineitem l2
        |    WHERE l2.l_orderkey = l1.ok AND l2.l_suppkey <> l1.sk)
        |  AND NOT EXISTS (SELECT 1 FROM lo l3
        |    WHERE l3.l_orderkey = l1.ok AND l3.l_suppkey <> l1.sk
        |      AND l3.l_shipdate > l3.o_orderdate + INTERVAL 90 DAY)
        |GROUP BY s_name ORDER BY numwait DESC, s_name""".stripMargin,

    // Q20 shape: the correlated scalar aggregate decorrelates to a
    // double aggregate + join-back; the keep decision is integer-CENTS
    // cross-multiplied (2·q·ns > 3·tq) so it's exact in both engines.
    "q20_dominant_suppliers" ->
      """WITH sp AS (
        |  SELECT l_partkey, l_suppkey,
        |    CAST(SUM(CAST(l_quantity AS DECIMAL(12,2))) * 100 AS BIGINT) AS qc
        |  FROM lineitem GROUP BY 1, 2),
        |pt AS (SELECT l_partkey, SUM(qc) AS tqc, COUNT(*) AS ns
        |       FROM sp GROUP BY 1)
        |SELECT s_suppkey, s_name, n_dominant FROM (
        |  SELECT l_suppkey, COUNT(*) AS n_dominant
        |  FROM sp JOIN pt USING (l_partkey)
        |  WHERE 2 * qc * ns > 3 * tqc GROUP BY 1) d
        |JOIN supplier ON l_suppkey = s_suppkey
        |ORDER BY s_suppkey""".stripMargin,

    // Q22 shape: global scalar avg (cross-multiplied in cents — no
    // division) + NOT EXISTS as an anti join with the filter pushed.
    "q22_idle_rich_customers" ->
      """WITH pos AS (
        |  SELECT CAST(SUM(CAST(c_acctbal AS DECIMAL(18,2))) * 100 AS BIGINT) AS tot,
        |         COUNT(*) AS n
        |  FROM customer WHERE c_acctbal > 0)
        |SELECT c_mktsegment, COUNT(*) AS numcust,
        |  CAST(SUM(CAST(c_acctbal AS DECIMAL(18,2))) AS DOUBLE) AS totacctbal
        |FROM customer, pos
        |WHERE CAST(CAST(c_acctbal AS DECIMAL(18,2)) * 100 AS BIGINT) * n > tot
        |  AND NOT EXISTS (SELECT 1 FROM orders o
        |    WHERE o.o_custkey = c_custkey AND o.o_orderpriority = '1-URGENT')
        |GROUP BY 1 ORDER BY 1""".stripMargin,

    // Q13 shape: aggregate-before-join, zero-order customers kept.
    "q13_customer_distribution" ->
      """WITH oc AS (
        |  SELECT o_custkey, COUNT(*) AS n FROM orders
        |  WHERE o_orderpriority <> '1-URGENT' GROUP BY 1)
        |SELECT c_count, COUNT(*) AS custdist FROM (
        |  SELECT COALESCE(n, 0) AS c_count
        |  FROM customer LEFT JOIN oc ON c_custkey = o_custkey)
        |GROUP BY 1 ORDER BY custdist DESC, c_count DESC""".stripMargin,

    // D58: per-vector QA — integer counts, the ANN oracle's exact
    // index-ordered fold for the norm, float min/max selection.
    "embedding_audit" ->
      """WITH s AS (
        |  SELECT vec_id,
        |    CAST(len(embedding) AS INTEGER) AS dim,
        |    CAST(len(list_filter(embedding, x -> x = 0)) AS INTEGER) AS n_zeros,
        |    sqrt(list_reduce(list_transform(range(1, len(embedding) + 1),
        |      i -> CAST(embedding[i] AS DOUBLE) * CAST(embedding[i] AS DOUBLE)),
        |      (a, b) -> a + b)) AS l2_norm,
        |    list_min(embedding) AS min_c,
        |    list_max(embedding) AS max_c
        |  FROM embeddings)
        |SELECT vec_id, dim, n_zeros, l2_norm, min_c, max_c,
        |  l2_norm < 1e-6 AS is_degenerate
        |FROM s ORDER BY vec_id""".stripMargin,

    "q5_local_supplier" -> s"""SELECT n_name, $revenueSum AS revenue
        |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        |JOIN supplier ON l_suppkey = s_suppkey
        |JOIN customer ON o_custkey = c_custkey AND c_nationkey = s_nationkey
        |JOIN nation ON s_nationkey = n_nationkey
        |JOIN region ON n_regionkey = r_regionkey
        |WHERE r_name = 'ASIA'
        |GROUP BY 1 ORDER BY revenue DESC, n_name""".stripMargin,

    "q7_nation_volume" ->
      s"""SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
        |  CAST(year(l_shipdate) AS INTEGER) AS l_year,
        |  $revenueSum AS revenue
        |FROM lineitem
        |JOIN orders ON l_orderkey = o_orderkey
        |JOIN supplier ON l_suppkey = s_suppkey
        |JOIN customer ON o_custkey = c_custkey
        |JOIN nation n1 ON s_nationkey = n1.n_nationkey
        |JOIN nation n2 ON c_nationkey = n2.n_nationkey
        |WHERE (n1.n_name = 'NATION_18' AND n2.n_name = 'NATION_19')
        |   OR (n1.n_name = 'NATION_19' AND n2.n_name = 'NATION_18')
        |GROUP BY 1, 2, 3 ORDER BY 1, 2, 3""".stripMargin,

    "q8_market_share" ->
      s"""WITH ac AS (
        |  SELECT c_custkey FROM customer
        |  JOIN nation ON c_nationkey = n_nationkey
        |  JOIN region ON n_regionkey = r_regionkey
        |  WHERE r_name = 'ASIA')
        |SELECT CAST(year(o_orderdate) AS INTEGER) AS o_year,
        |  round(
        |    CAST(SUM(CASE WHEN n_name = 'NATION_5'
        |      THEN ${DP.format("l_extendedprice")} *
        |        ($ONE - ${DR.format("l_discount")})
        |      ELSE CAST(0 AS DECIMAL(12,2)) END) AS DOUBLE)
        |    / CAST(SUM(${DP.format("l_extendedprice")} *
        |        ($ONE - ${DR.format("l_discount")})) AS DOUBLE), 6)
        |    AS mkt_share
        |FROM lineitem
        |JOIN orders ON l_orderkey = o_orderkey
        |JOIN supplier ON l_suppkey = s_suppkey
        |JOIN nation ON s_nationkey = n_nationkey
        |WHERE o_custkey IN (SELECT c_custkey FROM ac)
        |GROUP BY 1 ORDER BY 1""".stripMargin,

    "q9_product_profit" ->
      s"""SELECT n_name AS nation,
        |  CAST(year(l_shipdate) AS INTEGER) AS o_year,
        |  CAST(SUM(${DP.format("l_extendedprice")} *
        |      ($ONE - ${DR.format("l_discount")})
        |    - ${DP.format("l_quantity")} * ${DP.format("p_retailprice")} *
        |      CAST(0.5 AS DECIMAL(3,2))) AS DOUBLE) AS sum_profit
        |FROM lineitem
        |JOIN part ON l_partkey = p_partkey
        |JOIN supplier ON l_suppkey = s_suppkey
        |JOIN nation ON s_nationkey = n_nationkey
        |WHERE p_name LIKE '%gear%'
        |GROUP BY 1, 2 ORDER BY 1, 2 DESC""".stripMargin,

    "q14_promo_revenue" ->
      s"""SELECT CAST(year(l_shipdate) AS INTEGER) AS l_year,
        |  round(100.0 *
        |    CAST(SUM(CASE WHEN p_type = 'PROMO'
        |      THEN ${DP.format("l_extendedprice")} *
        |        ($ONE - ${DR.format("l_discount")})
        |      ELSE CAST(0 AS DECIMAL(12,2)) END) AS DOUBLE)
        |    / CAST(SUM(${DP.format("l_extendedprice")} *
        |        ($ONE - ${DR.format("l_discount")})) AS DOUBLE), 6)
        |    AS promo_revenue
        |FROM lineitem JOIN part ON l_partkey = p_partkey
        |GROUP BY 1 ORDER BY 1""".stripMargin,

    "q15_top_supplier" ->
      s"""WITH rev AS (
        |  SELECT l_suppkey,
        |    SUM(${DP.format("l_extendedprice")} *
        |      ($ONE - ${DR.format("l_discount")})) AS total
        |  FROM lineitem
        |  WHERE l_shipdate >= TIMESTAMP '1996-01-01'
        |    AND l_shipdate < TIMESTAMP '1996-04-01'
        |  GROUP BY 1)
        |SELECT s_suppkey, s_name,
        |  CAST(total AS DOUBLE) AS total_revenue
        |FROM rev JOIN supplier ON l_suppkey = s_suppkey
        |WHERE total = (SELECT MAX(total) FROM rev)
        |ORDER BY s_suppkey""".stripMargin,

    "q19_disjunctive_predicates" ->
      s"""SELECT $revenueSum AS revenue, COUNT(*) AS n_items
        |FROM lineitem JOIN part ON l_partkey = p_partkey
        |WHERE (p_brand = 'Brand#1' AND p_size BETWEEN 1 AND 15
        |       AND l_quantity BETWEEN 1 AND 20)
        |   OR (p_brand = 'Brand#2' AND p_size BETWEEN 16 AND 30
        |       AND l_quantity BETWEEN 10 AND 30)
        |   OR (p_brand = 'Brand#3' AND p_size BETWEEN 31 AND 50
        |       AND l_quantity BETWEEN 20 AND 50)""".stripMargin,

    // the 1.5×-mean threshold cross-multiplies DECIMALs and integers
    // (2·val·n > 3·tot) — exact in both engines, so the boundary part
    // set cannot diverge
    "q11_important_stock" ->
      s"""WITH pp AS (
        |  SELECT l_partkey,
        |    SUM(${DP.format("l_extendedprice")} *
        |      ($ONE - ${DR.format("l_discount")})) AS val
        |  FROM lineitem GROUP BY 1)
        |SELECT l_partkey AS p_partkey, CAST(val AS DOUBLE) AS stock_value
        |FROM pp
        |WHERE val * (SELECT COUNT(*) FROM pp) * 2
        |    > (SELECT SUM(val) FROM pp) * 3
        |ORDER BY stock_value DESC, p_partkey""".stripMargin,

    // Q4 shape: correlated EXISTS as a semi join with the late-ship
    // predicate in the join condition
    "q4_order_priority" ->
      """SELECT o_orderpriority, COUNT(*) AS order_count
        |FROM orders
        |WHERE o_orderdate >= TIMESTAMP '1996-01-01'
        |  AND o_orderdate < TIMESTAMP '1996-04-01'
        |  AND EXISTS (SELECT 1 FROM lineitem
        |    WHERE l_orderkey = o_orderkey
        |      AND l_shipdate > o_orderdate + INTERVAL 60 DAY)
        |GROUP BY 1 ORDER BY 1""".stripMargin,

    "q6_forecast_revenue" ->
      """SELECT
        |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))
        |    * CAST(l_discount AS DECIMAL(18,2))) AS DOUBLE) AS revenue,
        |  COUNT(*) AS n_items
        |FROM lineitem
        |WHERE l_shipdate >= TIMESTAMP '1996-01-01'
        |  AND l_shipdate < TIMESTAMP '1997-01-01'
        |  AND l_discount BETWEEN 0.05 AND 0.07 AND l_quantity < 24""".stripMargin,

    "q10_returned_items" ->
      """SELECT c_custkey, c_name, c_acctbal, n_name,
        |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))
        |    * (CAST(1 AS DECIMAL(18,2)) - CAST(l_discount AS DECIMAL(18,2))))
        |    AS DOUBLE) AS revenue
        |FROM lineitem
        |JOIN orders ON l_orderkey = o_orderkey
        |JOIN customer ON o_custkey = c_custkey
        |JOIN nation ON c_nationkey = n_nationkey
        |WHERE o_orderdate >= TIMESTAMP '1996-01-01'
        |  AND o_orderdate < TIMESTAMP '1996-04-01'
        |  AND l_returnflag = 'R'
        |GROUP BY 1, 2, 3, 4
        |ORDER BY revenue DESC, c_custkey LIMIT 20""".stripMargin,

    // Q12 shape: CASE-sums fold into one aggregate pass; BIGINT casts
    // keep DuckDB's HUGEINT sums off the wire
    "q12_late_priority" ->
      """SELECT l_returnflag,
        |  CAST(SUM(CASE WHEN o_orderpriority IN ('1-URGENT','2-HIGH')
        |    THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
        |  CAST(SUM(CASE WHEN o_orderpriority IN ('1-URGENT','2-HIGH')
        |    THEN 0 ELSE 1 END) AS BIGINT) AS low_line_count
        |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        |WHERE l_shipdate >= TIMESTAMP '1996-01-01'
        |  AND l_shipdate < TIMESTAMP '1997-01-01'
        |  AND l_shipdate > o_orderdate + INTERVAL 30 DAY
        |GROUP BY 1 ORDER BY 1""".stripMargin,

    "window_running_sum" ->
      """SELECT l_suppkey, l_orderkey, l_linenumber,
        |  CAST(SUM(CAST(l_quantity AS DECIMAL(12,2))) OVER (
        |    PARTITION BY l_suppkey
        |    ORDER BY l_shipdate, l_orderkey, l_linenumber
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE) AS running_qty
        |FROM lineitem ORDER BY l_suppkey, l_orderkey, l_linenumber""".stripMargin,

    "semi_join_exists" ->
      """SELECT * FROM (
        |  SELECT 'with_orders' AS bucket, COUNT(*) AS n FROM customer c
        |  WHERE EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey)
        |  UNION ALL
        |  SELECT 'without_orders' AS bucket, COUNT(*) AS n FROM customer c
        |  WHERE NOT EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey)
        |) ORDER BY bucket""".stripMargin,

    "distinct_counts" ->
      """SELECT COUNT(DISTINCT l_orderkey) AS n_orders,
        |  COUNT(DISTINCT l_partkey) AS n_parts,
        |  COUNT(DISTINCT l_suppkey) AS n_supps
        |FROM lineitem""".stripMargin,

    "events_time_buckets" ->
      """SELECT CAST(date_trunc('day', ts) AS TIMESTAMP) AS day, event_type,
        |  COUNT(*) AS n_events,
        |  CAST(SUM(CAST(value AS DECIMAL(12,2))) AS DOUBLE) AS sum_value
        |FROM events GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,

    "topk_per_group" ->
      """SELECT o_custkey, o_orderkey, o_totalprice, CAST(rk AS INTEGER) AS rk FROM (
        |  SELECT o_custkey, o_orderkey, o_totalprice,
        |    row_number() OVER (PARTITION BY o_custkey
        |                       ORDER BY o_totalprice DESC, o_orderkey) AS rk
        |  FROM orders) WHERE rk <= 3 ORDER BY o_custkey, rk""".stripMargin,

    "rollup_totals" -> s"""SELECT l_returnflag, l_linestatus,
        |  ${dsum("l_quantity")} AS sum_qty, COUNT(*) AS n,
        |  CAST(GROUPING(l_returnflag) * 2 + GROUPING(l_linestatus) AS BIGINT) AS gid
        |FROM lineitem GROUP BY ROLLUP (l_returnflag, l_linestatus)
        |ORDER BY gid, l_returnflag ASC NULLS FIRST, l_linestatus ASC NULLS FIRST""".stripMargin,

    "events_range_join" ->
      """WITH w AS (
        |  SELECT DISTINCT
        |    CAST(date_trunc('day', ts) AS TIMESTAMP) + INTERVAL 8 HOUR AS win_lo,
        |    CAST(date_trunc('day', ts) AS TIMESTAMP) + INTERVAL 18 HOUR AS win_hi
        |  FROM events)
        |SELECT win_lo, COUNT(*) AS n_events,
        |  CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sum_value
        |FROM w JOIN events e ON e.ts >= w.win_lo AND e.ts < w.win_hi
        |GROUP BY 1 ORDER BY 1""".stripMargin,

    "price_histogram" ->
      """SELECT CAST(FLOOR(o_totalprice / 25000.0) AS BIGINT) AS bucket,
        |  COUNT(*) AS n_orders,
        |  CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_price
        |FROM orders GROUP BY 1 ORDER BY 1""".stripMargin,

    // The bloom pre-filter only removes rows the join would drop, so
    // the oracle is the PLAIN join — exactness of the pruned plan is
    // the point being checked.
    "bloom_prune_join" -> s"""SELECT s_name, $revenueSum AS revenue,
        |  COUNT(*) AS n_items
        |FROM lineitem JOIN supplier ON l_suppkey = s_suppkey
        |WHERE s_nationkey = 3
        |GROUP BY s_name ORDER BY s_name""".stripMargin,

    // Clustering is a pure reordering: the filtered aggregate over the
    // z-ordered copy must equal the same query on the raw table.
    "zorder_layout" ->
      """SELECT event_type, COUNT(*) AS n_events,
        |  MIN(value) AS min_value, MAX(value) AS max_value
        |FROM events
        |WHERE user_id BETWEEN 10 AND 60 AND value BETWEEN 5.0 AND 40.0
        |GROUP BY event_type ORDER BY event_type""".stripMargin,

    // The histogram pre-agg is exactly mergeable (integer bucket
    // counts), so the merged cumulative histogram — and the bucket
    // each quantile lands in — is deterministic in both engines.
    "histogram_preagg_quantiles" ->
      """WITH daily AS (
        |  SELECT CAST(date_trunc('day', ts) AS TIMESTAMP) AS day,
        |    CAST(FLOOR(value / 10.0) AS BIGINT) AS bucket, COUNT(*) AS n
        |  FROM events GROUP BY 1, 2),
        |merged AS (SELECT bucket, SUM(n) AS n FROM daily GROUP BY bucket),
        |cum AS (
        |  SELECT bucket,
        |    SUM(n) OVER (ORDER BY bucket ROWS UNBOUNDED PRECEDING) AS cum,
        |    SUM(n) OVER () AS total
        |  FROM merged),
        |qs AS (SELECT CAST(q AS DOUBLE) AS q
        |       FROM (VALUES (0.5),(0.9),(0.99)) t(q))
        |SELECT q, CAST(MIN(bucket) * 10.0 AS DOUBLE) AS value_at_q
        |FROM cum, qs WHERE cum >= q * total
        |GROUP BY q ORDER BY q""".stripMargin,

    // Discrete quantile: least length whose cumulative count reaches
    // q*N; the integer cumulative count compares against the same IEEE
    // double product in both engines.
    "text_length_quantiles_exact" ->
      """WITH c AS (
        |  SELECT n_chars, COUNT(*) AS cnt FROM documents GROUP BY n_chars),
        |cum AS (
        |  SELECT n_chars,
        |    SUM(cnt) OVER (ORDER BY n_chars ROWS UNBOUNDED PRECEDING) AS cum,
        |    SUM(cnt) OVER () AS n
        |  FROM c),
        |qs AS (SELECT CAST(q AS DOUBLE) AS q
        |       FROM (VALUES (0.25),(0.5),(0.75),(0.95),(0.99)) t(q))
        |SELECT q, MIN(n_chars) AS len_q
        |FROM cum, qs WHERE cum >= q * n
        |GROUP BY q ORDER BY q""".stripMargin,

    "length_quantiles_by_lang" ->
      """WITH c AS (
        |  SELECT lang, n_chars, COUNT(*) AS cnt FROM documents
        |  GROUP BY lang, n_chars),
        |cum AS (
        |  SELECT lang, n_chars,
        |    SUM(cnt) OVER (PARTITION BY lang ORDER BY n_chars
        |      ROWS UNBOUNDED PRECEDING) AS cum,
        |    SUM(cnt) OVER (PARTITION BY lang) AS n
        |  FROM c),
        |qs AS (SELECT CAST(q AS DOUBLE) AS q
        |       FROM (VALUES (0.5),(0.9)) t(q))
        |SELECT lang, q, MIN(n_chars) AS len_q
        |FROM cum, qs WHERE cum >= q * n
        |GROUP BY lang, q ORDER BY lang, q""".stripMargin,

    "events_click_attribution" ->
      """SELECT c.event_id AS click_id, p.event_id AS purchase_id, c.user_id,
        |  c.ts AS click_ts, p.ts AS purchase_ts, p.value AS purchase_value
        |FROM (SELECT * FROM events WHERE event_type = 'click') c
        |JOIN (SELECT * FROM events WHERE event_type = 'purchase') p
        |  ON c.user_id = p.user_id AND p.ts >= c.ts
        |  AND p.ts <= c.ts + INTERVAL 30 MINUTE
        |ORDER BY click_id, purchase_id""".stripMargin,

    "events_click_attribution_outer" ->
      """SELECT c.event_id AS click_id, p.event_id AS purchase_id, c.user_id,
        |  c.ts AS click_ts, p.ts AS purchase_ts, p.value AS purchase_value
        |FROM (SELECT * FROM events WHERE event_type = 'click') c
        |LEFT JOIN (SELECT * FROM events WHERE event_type = 'purchase') p
        |  ON c.user_id = p.user_id AND p.ts >= c.ts
        |  AND p.ts <= c.ts + INTERVAL 30 MINUTE
        |ORDER BY click_id, purchase_id""".stripMargin,

    "pivot_segments" ->
      """SELECT n_name,
        |  CAST(SUM(CASE WHEN c_mktsegment = 'AUTOMOBILE' THEN CAST(c_acctbal AS DECIMAL(12,2)) END) AS DOUBLE) AS "AUTOMOBILE",
        |  CAST(SUM(CASE WHEN c_mktsegment = 'BUILDING' THEN CAST(c_acctbal AS DECIMAL(12,2)) END) AS DOUBLE) AS "BUILDING",
        |  CAST(SUM(CASE WHEN c_mktsegment = 'FURNITURE' THEN CAST(c_acctbal AS DECIMAL(12,2)) END) AS DOUBLE) AS "FURNITURE",
        |  CAST(SUM(CASE WHEN c_mktsegment = 'HOUSEHOLD' THEN CAST(c_acctbal AS DECIMAL(12,2)) END) AS DOUBLE) AS "HOUSEHOLD",
        |  CAST(SUM(CASE WHEN c_mktsegment = 'MACHINERY' THEN CAST(c_acctbal AS DECIMAL(12,2)) END) AS DOUBLE) AS "MACHINERY"
        |FROM customer JOIN nation ON n_nationkey = c_nationkey
        |GROUP BY n_name ORDER BY n_name""".stripMargin,

    "setop_except" ->
      """SELECT o_orderkey FROM orders
        |EXCEPT
        |SELECT l_orderkey AS o_orderkey FROM lineitem WHERE l_quantity >= 45
        |ORDER BY o_orderkey""".stripMargin,

    "text_normalize" ->
      """SELECT doc_id,
        |  trim(regexp_replace(regexp_replace(lower(text), '[^a-z0-9 ]', ' ', 'g'), ' +', ' ', 'g')) AS norm_text,
        |  CAST(len(string_split(trim(regexp_replace(regexp_replace(lower(text), '[^a-z0-9 ]', ' ', 'g'), ' +', ' ', 'g')), ' ')) AS INTEGER) AS n_norm_tokens
        |FROM documents ORDER BY doc_id""".stripMargin,

    "text_chunk" ->
      """WITH t AS (
        |  SELECT doc_id, string_split_regex(trim(text), '\s+') AS toks FROM documents),
        |n AS (
        |  SELECT doc_id, toks,
        |    greatest(CAST(ceil((len(toks) - 32) / 24.0) AS INTEGER) + 1, 1) AS nc
        |  FROM t),
        |e AS (
        |  SELECT doc_id, toks, unnest(range(0, nc)) AS chunk_idx FROM n)
        |SELECT doc_id, CAST(chunk_idx AS INTEGER) AS chunk_idx,
        |  array_to_string(list_slice(toks, chunk_idx * 24 + 1, chunk_idx * 24 + 32), ' ') AS chunk_text,
        |  CAST(len(string_split(array_to_string(list_slice(toks, chunk_idx * 24 + 1, chunk_idx * 24 + 32), ' '), ' ')) AS INTEGER) AS n_chunk_tokens
        |FROM e ORDER BY doc_id, chunk_idx""".stripMargin,

    // coin, cut start, and cut length all derive from the portable
    // XXH64 of the doc id with integer mod/div chains — exact in both
    // engines (the floor(h/n) double division is exact at these
    // magnitudes: true non-integer quotients sit ≥ 1/n from any
    // integer, ~8 orders above the ulp)
    "fim_transform" ->
      s"""WITH hx AS (${xxh64Nested("SELECT doc_id, text FROM documents", "doc_id")}),
         |j AS (
         |  SELECT doc_id, text,
         |    ((($xxhSigned) % 1000000) + 1000000) % 1000000 AS hb,
         |    len(text) AS n, greatest(len(text), 2) AS ns
         |  FROM hx),
         |c AS (
         |  SELECT doc_id, text, hb, n,
         |    1 + (hb % ns) AS a,
         |    ((hb // ns) % (ns - (1 + (hb % ns)) + 2)) AS lm
         |  FROM j)
         |SELECT doc_id,
         |  (hb % 2 = 0 AND n >= 2) AS fim_applied,
         |  CASE WHEN hb % 2 = 0 AND n >= 2
         |    THEN '<PRE>' || substr(text, 1, CAST(a - 1 AS INTEGER))
         |      || '<SUF>' || substr(text, CAST(a + lm AS INTEGER),
         |           CAST(n - a - lm + 1 AS INTEGER))
         |      || '<MID>' || substr(text, CAST(a AS INTEGER), CAST(lm AS INTEGER))
         |    ELSE text END AS fim_text
         |FROM c ORDER BY doc_id""".stripMargin,

    // single int/int -> double divisions are correctly rounded in both
    // engines; every count is exact
    "gopher_quality" ->
      """WITH s AS (
        |  SELECT doc_id,
        |    string_split_regex(trim(text), '\s+') AS ws,
        |    len(regexp_replace(trim(text), '\s+', '', 'g')) AS n_chars
        |  FROM documents),
        |m AS (
        |  SELECT doc_id,
        |    CAST(len(ws) AS INTEGER) AS n_words,
        |    CAST(n_chars AS DOUBLE) / CAST(len(ws) AS DOUBLE) AS mean_word_len,
        |    CAST(len(list_filter(ws, w -> regexp_matches(w, '[a-z]'))) AS DOUBLE)
        |      / CAST(len(ws) AS DOUBLE) AS alpha_frac,
        |    CAST(len(list_filter(ws,
        |      w -> list_contains(['the', 'a', 'of', 'to', 'and'], w))) AS INTEGER)
        |      AS stop_hits
        |  FROM s)
        |SELECT doc_id, n_words, mean_word_len, alpha_frac, stop_hits,
        |  (n_words BETWEEN 40 AND 100000
        |    AND mean_word_len BETWEEN 3.0 AND 5.0
        |    AND alpha_frac >= 0.8 AND stop_hits >= 1) AS keep
        |FROM m ORDER BY doc_id""".stripMargin,

    "text_blocklist" ->
      """SELECT doc_id, CAST(n_hits AS INTEGER) AS n_hits, (n_hits = 0) AS keep
        |FROM (
        |  SELECT doc_id,
        |    len(list_filter(string_split_regex(trim(text), '\s+'),
        |      t -> list_contains(['slow', 'dup', 'big'], t))) AS n_hits
        |  FROM documents)
        |ORDER BY doc_id""".stripMargin,

    "text_redact" ->
      """SELECT doc_id,
        |  regexp_replace(regexp_replace(text, '[a-z0-9.]+@[a-z0-9.]+', '<EMAIL>', 'g'),
        |    '[0-9]+', '<NUM>', 'g') AS redacted
        |FROM documents ORDER BY doc_id""".stripMargin,

    // D90: both engines build the same card-shaped candidate (check
    // digit solved from the Luhn fold), extract 13-16 digit runs,
    // validate, and replace-fold only the valid ones; the fold is
    // exact integer arithmetic so the verdicts cannot diverge
    "text_redact_luhn" ->
      """WITH g AS (
        |  SELECT doc_id, text,
        |    '400000' || lpad(CAST((doc_id * 37 + 11) % 1000000000 AS VARCHAR),
        |      9, '0') AS p15
        |  FROM documents),
        |t AS (
        |  SELECT doc_id, text, p15,
        |    list_reduce(list_transform(range(1, 17),
        |      i -> CASE WHEN i % 2 = 0 THEN
        |             CASE WHEN 2 * (ascii(substr(p15 || '0', 17 - i, 1)) - 48) > 9
        |                  THEN 2 * (ascii(substr(p15 || '0', 17 - i, 1)) - 48) - 9
        |                  ELSE 2 * (ascii(substr(p15 || '0', 17 - i, 1)) - 48) END
        |           ELSE ascii(substr(p15 || '0', 17 - i, 1)) - 48 END),
        |      (a, b) -> a + b) AS ts
        |  FROM g),
        |e AS (
        |  SELECT doc_id,
        |    substr(text, 1, 30) || ' card ' || p15 ||
        |      CAST(CASE WHEN doc_id % 2 = 0 THEN (10 - ts % 10) % 10
        |           ELSE ((10 - ts % 10) % 10 + 5) % 10 END AS VARCHAR) ||
        |      ' ref 12345 end' AS emb
        |  FROM t),
        |c AS (
        |  SELECT doc_id, emb,
        |    regexp_extract_all(emb, '[0-9]{13,16}') AS cands
        |  FROM e),
        |v AS (
        |  SELECT doc_id, emb, cands,
        |    list_filter(cands, cd ->
        |      list_reduce(list_transform(range(1, len(cd) + 1),
        |        i -> CASE WHEN i % 2 = 0 THEN
        |               CASE WHEN 2 * (ascii(substr(cd, len(cd) - i + 1, 1)) - 48) > 9
        |                    THEN 2 * (ascii(substr(cd, len(cd) - i + 1, 1)) - 48) - 9
        |                    ELSE 2 * (ascii(substr(cd, len(cd) - i + 1, 1)) - 48) END
        |             ELSE ascii(substr(cd, len(cd) - i + 1, 1)) - 48 END),
        |        (a, b) -> a + b) % 10 = 0) AS vc
        |  FROM c)
        |SELECT doc_id, CAST(len(cands) AS INTEGER) AS n_candidates,
        |  CAST(len(vc) AS INTEGER) AS n_valid,
        |  list_reduce(list_prepend(emb, vc),
        |    (txt, cd) -> replace(txt, cd, '<CC>')) AS redacted
        |FROM v ORDER BY doc_id""".stripMargin,

    "vocab_top_words" ->
      """SELECT word, COUNT(*) AS freq FROM (
        |  SELECT unnest(string_split_regex(trim(text), '\s+')) AS word FROM documents)
        |GROUP BY word ORDER BY freq DESC, word LIMIT 50""".stripMargin,

    // regression sums are explicit left folds over the rank-sorted
    // ≤K list on BOTH engines (fixed double-add order); ln/round
    // parity per the BM25 precedent
    // D62b: same point CTEs as zipf_fit; slopes round to 6 dp BEFORE
    // the lower-middle order statistic, so the selection can't
    // diverge on a ulp; range bounds mirror the engine's guarded
    // ascending sequences
    "zipf_theil_sen" ->
      """WITH v AS (
        |  SELECT word, COUNT(*) AS freq FROM (
        |    SELECT unnest(string_split_regex(trim(text), '\s+')) AS word
        |    FROM documents)
        |  GROUP BY word ORDER BY freq DESC, word LIMIT 200),
        |r AS (
        |  SELECT CAST(rank AS DOUBLE) AS rank,
        |    ln(CAST(rank AS DOUBLE)) AS x, ln(CAST(freq AS DOUBLE)) AS y
        |  FROM (SELECT freq, word,
        |      row_number() OVER (ORDER BY freq DESC, word) AS rank FROM v)),
        |l AS (SELECT list_sort(list([rank, x, y])) AS a FROM r),
        |sl AS (
        |  SELECT CAST(len(a) AS BIGINT) AS n_types,
        |    flatten(list_transform(range(1, len(a)), i ->
        |      list_transform(range(i + 1, len(a) + 1), j ->
        |        round((a[j][3] - a[i][3]) / (a[j][2] - a[i][2]), 6)))) AS ss
        |  FROM l)
        |SELECT n_types, CAST(len(ss) AS BIGINT) AS n_pairs,
        |  list_sort(ss)[CAST((len(ss) + 1) // 2 AS INTEGER)]
        |    AS slope_theil_sen
        |FROM sl""".stripMargin,

    "zipf_fit" ->
      """WITH v AS (
        |  SELECT word, COUNT(*) AS freq FROM (
        |    SELECT unnest(string_split_regex(trim(text), '\s+')) AS word
        |    FROM documents)
        |  GROUP BY word ORDER BY freq DESC, word LIMIT 200),
        |r AS (
        |  SELECT CAST(rank AS DOUBLE) AS rank,
        |    ln(CAST(rank AS DOUBLE)) AS x, ln(CAST(freq AS DOUBLE)) AS y
        |  FROM (SELECT freq, word,
        |      row_number() OVER (ORDER BY freq DESC, word) AS rank FROM v)),
        |l AS (SELECT list_sort(list([rank, x, y])) AS a FROM r),
        |s AS (SELECT CAST(len(a) AS DOUBLE) AS n,
        |  list_reduce([0.0] || list_transform(a, e -> e[2]),
        |    (p, q) -> p + q) AS sx,
        |  list_reduce([0.0] || list_transform(a, e -> e[3]),
        |    (p, q) -> p + q) AS sy,
        |  list_reduce([0.0] || list_transform(a, e -> e[2] * e[3]),
        |    (p, q) -> p + q) AS sxy,
        |  list_reduce([0.0] || list_transform(a, e -> e[2] * e[2]),
        |    (p, q) -> p + q) AS sxx,
        |  list_reduce([0.0] || list_transform(a, e -> e[3] * e[3]),
        |    (p, q) -> p + q) AS syy
        |  FROM l)
        |SELECT CAST(n AS BIGINT) AS n_types,
        |  round((n*sxy - sx*sy) / (n*sxx - sx*sx), 6) AS slope,
        |  round((sy - ((n*sxy - sx*sy) / (n*sxx - sx*sx)) * sx) / n, 6)
        |    AS intercept,
        |  round((n*sxy - sx*sy) * (n*sxy - sx*sy)
        |    / ((n*sxx - sx*sx) * (n*syy - sy*sy)), 6) AS r2
        |FROM s""".stripMargin,

    // D22's exact-verified join-back: the sketch only nominates; the
    // emitted counts are exact, so the oracle is the exact top-10
    "vocab_heavy_hitters" ->
      """SELECT word, COUNT(*) AS freq FROM (
        |  SELECT unnest(string_split_regex(trim(text), '\s+')) AS word FROM documents)
        |GROUP BY word ORDER BY freq DESC, word LIMIT 10""".stripMargin,
    // the E10 stream face exact-verifies the merged-sketch slate by
    // the same join-back — slate ≡ batch slate (merge identity +
    // id-pure coins), so the exact top-10 shares D22's oracle
    "stream_trending_words" ->
      """SELECT word, COUNT(*) AS freq FROM (
        |  SELECT unnest(string_split_regex(trim(text), '\s+')) AS word FROM documents)
        |GROUP BY word ORDER BY freq DESC, word LIMIT 10""".stripMargin,

    "topk_per_group_custom" ->
      """SELECT o_custkey, o_orderkey, o_totalprice, CAST(rk AS INTEGER) AS rk FROM (
        |  SELECT o_custkey, o_orderkey, o_totalprice,
        |    row_number() OVER (PARTITION BY o_custkey
        |                       ORDER BY o_totalprice DESC, o_orderkey) AS rk
        |  FROM orders) WHERE rk <= 3 ORDER BY o_custkey, rk""".stripMargin,

    "topk_rank_ties" ->
      """SELECT o_custkey, o_orderkey, o_totalprice, CAST(rk AS INTEGER) AS rk FROM (
        |  SELECT o_custkey, o_orderkey, o_totalprice,
        |    rank() OVER (PARTITION BY o_custkey
        |                 ORDER BY o_totalprice DESC) AS rk
        |  FROM orders) WHERE rk <= 3 ORDER BY o_custkey, rk, o_orderkey""".stripMargin,

    "topk_dense_rank" ->
      """SELECT o_custkey, o_orderkey, o_totalprice, CAST(rk AS INTEGER) AS rk FROM (
        |  SELECT o_custkey, o_orderkey, o_totalprice,
        |    dense_rank() OVER (PARTITION BY o_custkey
        |                       ORDER BY o_totalprice DESC) AS rk
        |  FROM orders) WHERE rk <= 3 ORDER BY o_custkey, rk, o_orderkey""".stripMargin,

    "asof_last_purchase" ->
      """SELECT c.event_id, p.event_id AS last_purchase_id,
        |  p.value AS last_purchase_value
        |FROM (SELECT * FROM events WHERE event_type = 'click') c
        |ASOF LEFT JOIN (SELECT * FROM events WHERE event_type = 'purchase') p
        |  ON c.user_id = p.user_id AND c.ts >= p.ts
        |ORDER BY c.event_id""".stripMargin,

    "events_sessionize" ->
      """WITH e AS (
        |  SELECT user_id, ts, event_id,
        |    CASE WHEN lag(ts) OVER w IS NULL
        |              OR ts - lag(ts) OVER w > INTERVAL 4 HOUR
        |         THEN 1 ELSE 0 END AS flag
        |  FROM events WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
        |s AS (
        |  SELECT user_id, ts, CAST(SUM(flag) OVER (
        |    PARTITION BY user_id ORDER BY ts, event_id
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS session_id
        |  FROM e)
        |SELECT user_id, session_id, COUNT(*) AS n_events,
        |  MIN(ts) AS t_start, MAX(ts) AS t_end
        |FROM s GROUP BY 1, 2 ORDER BY user_id, session_id""".stripMargin,

    // session_window semantics, verified empirically on Spark 4.1:
    // an event at EXACTLY prev_ts + gap still merges (sessions split
    // only at diff > gap) — the same boundary as C8's lag
    // formulation; start = first ts, end = last ts + gap (exclusive).
    "events_session_window" ->
      """WITH e AS (
        |  SELECT user_id, ts, event_id,
        |    CASE WHEN lag(ts) OVER w IS NULL
        |              OR ts - lag(ts) OVER w > INTERVAL 4 HOUR
        |         THEN 1 ELSE 0 END AS flag
        |  FROM events WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
        |s AS (
        |  SELECT user_id, ts, SUM(flag) OVER (
        |    PARTITION BY user_id ORDER BY ts, event_id
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS sid
        |  FROM e)
        |SELECT user_id, MIN(ts) AS session_start,
        |  MAX(ts) + INTERVAL 4 HOUR AS session_end,
        |  COUNT(*) AS n_events
        |FROM s GROUP BY user_id, sid
        |ORDER BY user_id, session_start""".stripMargin,

    "events_windowed_agg" ->
      """SELECT CAST(date_trunc('hour', ts) AS TIMESTAMP) AS window_start,
        |  event_type, COUNT(*) AS n_events,
        |  CAST(SUM(CAST(value AS DECIMAL(12,2))) AS DOUBLE) AS sum_value
        |FROM events GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,

    "dedup_exact" ->
      """SELECT sha256(text) AS digest, MIN(doc_id) AS canonical_id,
        |  COUNT(*) AS n_copies
        |FROM documents GROUP BY 1 ORDER BY canonical_id""".stripMargin,

    // D81: every leg replays an already-proven oracle tree at
    // aggregate granularity; counts are integers, the two non-count
    // legs (mean quality micro, zipf slope) mirror their keys' exact
    // association and 6-dp rounds
    "corpus_card" ->
      """WITH t AS (
        |  SELECT doc_id, lang, CASE WHEN len(trim(text)) > 0
        |    THEN string_split_regex(trim(text), '\s+')
        |    ELSE CAST([] AS VARCHAR[]) END AS tk
        |  FROM documents),
        |sh AS (SELECT doc_id, list_distinct(list_transform(range(1, len(tk) - 1),
        |  i -> tk[i] || ' ' || tk[i+1] || ' ' || tk[i+2])) AS s FROM t),
        |ex AS (SELECT doc_id, len(s) AS n, unnest(s) AS shingle FROM sh
        |       WHERE len(s) > 0),
        |prs AS (
        |  SELECT a.doc_id AS id_a, b.doc_id AS id_b, COUNT(*) AS c,
        |    any_value(a.n) AS na, any_value(b.n) AS nb
        |  FROM ex a JOIN ex b ON a.shingle = b.shingle AND b.doc_id > a.doc_id
        |  GROUP BY 1, 2),
        |g8 AS (
        |  SELECT doc_id, list_distinct(list_transform(range(1, len(tk) - 6),
        |    i -> tk[i] || ' ' || tk[i+1] || ' ' || tk[i+2] || ' ' || tk[i+3]
        |      || ' ' || tk[i+4] || ' ' || tk[i+5] || ' ' || tk[i+6] || ' ' || tk[i+7])) AS gs
        |  FROM t),
        |ex8 AS (SELECT doc_id, unnest(gs) AS gram FROM g8),
        |cont AS (
        |  SELECT e.doc_id, b.doc_id AS bench_id
        |  FROM ex8 e JOIN (SELECT * FROM ex8 WHERE doc_id % 10 = 0) b
        |    ON e.gram = b.gram AND e.doc_id <> b.doc_id
        |  GROUP BY 1, 2),
        |q AS (
        |  -- UNGUARDED tokens: the engine's qualityScore splits
        |  -- trim(text) directly, so an empty doc is the [''] token
        |  -- (n=1), not [] — the guarded t CTE serves only n_tokens
        |  SELECT CAST(round((0.4 * least(n / 64.0, 1.0) + 0.4 * (u / n)
        |      + 0.2 * least((h / n) * 8.0, 1.0)) * 1000000.0) AS BIGINT) AS qm
        |  FROM (
        |    SELECT CAST(len(tk2) AS DOUBLE) AS n,
        |      CAST(len(list_distinct(tk2)) AS DOUBLE) AS u,
        |      CAST(len(list_filter(tk2, x -> list_contains(
        |        ['the','a','of','and','to','in','is'], x))) AS DOUBLE) AS h
        |    FROM (SELECT string_split_regex(trim(text), '\s+') AS tk2
        |          FROM documents))),
        |zv AS (
        |  SELECT word, COUNT(*) AS freq FROM (
        |    SELECT unnest(string_split_regex(trim(text), '\s+')) AS word
        |    FROM documents)
        |  GROUP BY word ORDER BY freq DESC, word LIMIT 200),
        |zr AS (
        |  SELECT CAST(rank AS DOUBLE) AS rank,
        |    ln(CAST(rank AS DOUBLE)) AS x, ln(CAST(freq AS DOUBLE)) AS y
        |  FROM (SELECT freq, word,
        |      row_number() OVER (ORDER BY freq DESC, word) AS rank FROM zv)),
        |zl AS (SELECT list_sort(list([rank, x, y])) AS a FROM zr),
        |zs AS (SELECT CAST(len(a) AS DOUBLE) AS n,
        |  list_reduce([0.0] || list_transform(a, e -> e[2]), (p, q) -> p + q) AS sx,
        |  list_reduce([0.0] || list_transform(a, e -> e[3]), (p, q) -> p + q) AS sy,
        |  list_reduce([0.0] || list_transform(a, e -> e[2] * e[3]), (p, q) -> p + q) AS sxy,
        |  list_reduce([0.0] || list_transform(a, e -> e[2] * e[2]), (p, q) -> p + q) AS sxx
        |  FROM zl)
        |SELECT metric, value FROM (
        |  SELECT 'n_docs' AS metric, CAST(COUNT(*) AS DOUBLE) AS value FROM documents
        |  UNION ALL SELECT 'n_tokens', CAST(SUM(len(tk)) AS DOUBLE) FROM t
        |  UNION ALL SELECT 'docs_lang:' || lang, CAST(COUNT(*) AS DOUBLE)
        |    FROM documents GROUP BY lang
        |  UNION ALL SELECT 'exact_dup_groups', CAST(COUNT(*) AS DOUBLE) FROM
        |    (SELECT sha256(text) FROM documents GROUP BY 1 HAVING COUNT(*) > 1)
        |  UNION ALL SELECT 'neardup_pairs', CAST(COUNT(*) AS DOUBLE) FROM
        |    (SELECT id_a FROM prs WHERE CAST(c AS DOUBLE) / (na + nb - c) >= 0.5)
        |  UNION ALL SELECT 'mean_quality_micro',
        |    round(CAST(SUM(qm) AS DOUBLE) / CAST(COUNT(*) AS DOUBLE), 6) FROM q
        |  UNION ALL SELECT 'zipf_slope',
        |    round((n*sxy - sx*sy) / (n*sxx - sx*sx), 6) FROM zs
        |  UNION ALL SELECT 'contamination_pairs', CAST(COUNT(*) AS DOUBLE)
        |    FROM cont)
        |ORDER BY metric""".stripMargin,

    "dedup_ngram_jaccard" ->
      """WITH t AS (
        |  SELECT doc_id, string_split_regex(trim(text), '\s+') AS tk FROM documents),
        |s AS (
        |  SELECT doc_id, list_distinct(list_transform(range(1, len(tk) - 1),
        |    i -> tk[i] || ' ' || tk[i+1] || ' ' || tk[i+2])) AS sh
        |  FROM t)
        |SELECT a.doc_id AS id_a, b.doc_id AS id_b,
        |  CAST(len(list_intersect(a.sh, b.sh)) AS DOUBLE)
        |    / CAST(len(a.sh) + len(b.sh) - len(list_intersect(a.sh, b.sh)) AS DOUBLE) AS jaccard
        |FROM s a JOIN s b ON b.doc_id = a.doc_id + 1
        |ORDER BY id_a""".stripMargin,

    // D92: clipped (multiset) n-gram overlap per consecutive pair;
    // integer counts under single int->double divides, F1 as the
    // one-divide identity 2o/(na+nb) — no compound rounding
    "rouge_overlap" ->
      """WITH d AS (
        |  SELECT doc_id, string_split_regex(trim(text), '\s+') AS tk
        |  FROM documents),
        |p AS (
        |  SELECT a.doc_id AS id_a, b.doc_id AS id_b, a.tk AS ta, b.tk AS tb
        |  FROM d a JOIN d b ON b.doc_id = a.doc_id + 1),
        |g AS (
        |  SELECT id_a, id_b, ta AS g1a, tb AS g1b,
        |    list_transform(range(1, len(ta)), i -> ta[i] || ' ' || ta[i+1]) AS g2a,
        |    list_transform(range(1, len(tb)), i -> tb[i] || ' ' || tb[i+1]) AS g2b
        |  FROM p),
        |c1a AS (SELECT id_a, id_b, gram, COUNT(*) AS ca FROM
        |  (SELECT id_a, id_b, unnest(g1a) AS gram FROM g) GROUP BY 1, 2, 3),
        |c1b AS (SELECT id_a, id_b, gram, COUNT(*) AS cb FROM
        |  (SELECT id_a, id_b, unnest(g1b) AS gram FROM g) GROUP BY 1, 2, 3),
        |o1 AS (SELECT id_a, id_b, SUM(LEAST(ca, cb)) AS o
        |  FROM c1a JOIN c1b USING (id_a, id_b, gram) GROUP BY 1, 2),
        |c2a AS (SELECT id_a, id_b, gram, COUNT(*) AS ca FROM
        |  (SELECT id_a, id_b, unnest(g2a) AS gram FROM g) GROUP BY 1, 2, 3),
        |c2b AS (SELECT id_a, id_b, gram, COUNT(*) AS cb FROM
        |  (SELECT id_a, id_b, unnest(g2b) AS gram FROM g) GROUP BY 1, 2, 3),
        |o2 AS (SELECT id_a, id_b, SUM(LEAST(ca, cb)) AS o
        |  FROM c2a JOIN c2b USING (id_a, id_b, gram) GROUP BY 1, 2),
        |f AS (
        |  SELECT g.id_a, g.id_b,
        |    CAST(COALESCE(o1.o, 0) AS BIGINT) AS o1v,
        |    CAST(COALESCE(o2.o, 0) AS BIGINT) AS o2v,
        |    CAST(len(g1a) AS BIGINT) AS n1a, CAST(len(g1b) AS BIGINT) AS n1b,
        |    CAST(len(g2a) AS BIGINT) AS n2a, CAST(len(g2b) AS BIGINT) AS n2b
        |  FROM g LEFT JOIN o1 USING (id_a, id_b) LEFT JOIN o2 USING (id_a, id_b))
        |SELECT id_a, id_b,
        |  o1v AS r1_overlap,
        |  CASE WHEN n1a > 0 THEN CAST(o1v AS DOUBLE) / n1a ELSE 0.0 END AS r1_recall,
        |  CASE WHEN n1b > 0 THEN CAST(o1v AS DOUBLE) / n1b ELSE 0.0 END AS r1_precision,
        |  CASE WHEN n1a + n1b > 0 THEN CAST(o1v * 2 AS DOUBLE) / (n1a + n1b)
        |       ELSE 0.0 END AS r1_f1,
        |  o2v AS r2_overlap,
        |  CASE WHEN n2a > 0 THEN CAST(o2v AS DOUBLE) / n2a ELSE 0.0 END AS r2_recall,
        |  CASE WHEN n2b > 0 THEN CAST(o2v AS DOUBLE) / n2b ELSE 0.0 END AS r2_precision,
        |  CASE WHEN n2a + n2b > 0 THEN CAST(o2v * 2 AS DOUBLE) / (n2a + n2b)
        |       ELSE 0.0 END AS r2_f1
        |FROM f ORDER BY id_a""".stripMargin,

    // the dedup_resolve closure feeding the train_split hash CASE on
    // the CLUSTER canonical id — near-dups share a bucket by
    // construction, so they share a split
    "leakage_safe_split" ->
      s"""WITH RECURSIVE
        |t AS (SELECT doc_id, string_split_regex(trim(text), '\\s+') AS tk FROM documents),
        |s AS (SELECT doc_id, list_distinct(list_transform(range(1, len(tk) - 1),
        |  i -> tk[i] || ' ' || tk[i+1] || ' ' || tk[i+2])) AS sh FROM t),
        |ex AS (SELECT doc_id, len(sh) AS n, unnest(sh) AS shingle FROM s),
        |pairs AS (
        |  SELECT a.doc_id AS ida, b.doc_id AS idb, count(*) AS c,
        |    any_value(a.n) AS na, any_value(b.n) AS nb
        |  FROM ex a JOIN ex b ON a.shingle = b.shingle AND b.doc_id > a.doc_id
        |  GROUP BY 1, 2),
        |edges AS (SELECT ida, idb FROM pairs
        |  WHERE CAST(c AS DOUBLE) / (na + nb - c) >= 0.5),
        |und AS (SELECT ida AS src, idb AS dst FROM edges
        |  UNION ALL SELECT idb, ida FROM edges),
        |reach AS (
        |  SELECT src, dst FROM und
        |  UNION
        |  SELECT r.src, u.dst FROM reach r JOIN und u ON u.src = r.dst),
        |canon AS (
        |  SELECT d.doc_id,
        |    LEAST(d.doc_id, COALESCE(MIN(r.dst), d.doc_id)) AS canonical_id
        |  FROM documents d LEFT JOIN reach r ON r.src = d.doc_id
        |  GROUP BY d.doc_id),
        |h AS (
        |  SELECT doc_id, canonical_id, $xxhBucket AS bucket
        |  FROM (${xxh64Nested("SELECT doc_id, canonical_id FROM canon",
             "canonical_id")}))
        |SELECT doc_id, canonical_id,
        |  CASE WHEN bucket < 900000 THEN 0
        |       WHEN bucket < 950000 THEN 1 ELSE 2 END AS split
        |FROM h ORDER BY doc_id""".stripMargin,

    "dedup_resolve" ->
      """WITH RECURSIVE
        |t AS (SELECT doc_id, string_split_regex(trim(text), '\s+') AS tk FROM documents),
        |s AS (SELECT doc_id, list_distinct(list_transform(range(1, len(tk) - 1),
        |  i -> tk[i] || ' ' || tk[i+1] || ' ' || tk[i+2])) AS sh FROM t),
        |ex AS (SELECT doc_id, len(sh) AS n, unnest(sh) AS shingle FROM s),
        |pairs AS (
        |  SELECT a.doc_id AS ida, b.doc_id AS idb, count(*) AS c,
        |    any_value(a.n) AS na, any_value(b.n) AS nb
        |  FROM ex a JOIN ex b ON a.shingle = b.shingle AND b.doc_id > a.doc_id
        |  GROUP BY 1, 2),
        |edges AS (SELECT ida, idb FROM pairs
        |  WHERE CAST(c AS DOUBLE) / (na + nb - c) >= 0.5),
        |und AS (SELECT ida AS src, idb AS dst FROM edges
        |  UNION ALL SELECT idb, ida FROM edges),
        |reach AS (
        |  SELECT src, dst FROM und
        |  UNION
        |  SELECT r.src, u.dst FROM reach r JOIN und u ON u.src = r.dst)
        |SELECT d.doc_id,
        |  LEAST(d.doc_id, COALESCE(MIN(r.dst), d.doc_id)) AS canonical_id
        |FROM documents d LEFT JOIN reach r ON r.src = d.doc_id
        |GROUP BY d.doc_id ORDER BY d.doc_id""".stripMargin,

    // D17c: the dedup_resolve closure + the D9 quality doubles + a
    // per-cluster rank window (quality desc, id) — kept = rank 1
    "dedup_keep_best" ->
      """WITH RECURSIVE
        |t AS (SELECT doc_id, string_split_regex(trim(text), '\s+') AS tk FROM documents),
        |s AS (SELECT doc_id, list_distinct(list_transform(range(1, len(tk) - 1),
        |  i -> tk[i] || ' ' || tk[i+1] || ' ' || tk[i+2])) AS sh FROM t),
        |ex AS (SELECT doc_id, len(sh) AS n, unnest(sh) AS shingle FROM s),
        |pairs AS (
        |  SELECT a.doc_id AS ida, b.doc_id AS idb, count(*) AS c,
        |    any_value(a.n) AS na, any_value(b.n) AS nb
        |  FROM ex a JOIN ex b ON a.shingle = b.shingle AND b.doc_id > a.doc_id
        |  GROUP BY 1, 2),
        |edges AS (SELECT ida, idb FROM pairs
        |  WHERE CAST(c AS DOUBLE) / (na + nb - c) >= 0.5),
        |und AS (SELECT ida AS src, idb AS dst FROM edges
        |  UNION ALL SELECT idb, ida FROM edges),
        |reach AS (
        |  SELECT src, dst FROM und
        |  UNION
        |  SELECT r.src, u.dst FROM reach r JOIN und u ON u.src = r.dst),
        |cc AS (
        |  SELECT d.doc_id,
        |    LEAST(d.doc_id, COALESCE(MIN(r.dst), d.doc_id)) AS canonical_id
        |  FROM documents d LEFT JOIN reach r ON r.src = d.doc_id
        |  GROUP BY d.doc_id),
        |c2 AS (SELECT doc_id, CAST(len(tk) AS DOUBLE) AS n,
        |    CAST(len(list_distinct(tk)) AS DOUBLE) AS u,
        |    CAST(len(list_filter(tk, x -> list_contains(
        |      ['the','a','of','and','to','in','is'], x))) AS DOUBLE) AS h
        |  FROM t),
        |q AS (SELECT doc_id,
        |    0.4 * least(n / 64.0, 1.0) + 0.4 * (u / n)
        |      + 0.2 * least((h / n) * 8.0, 1.0) AS quality
        |  FROM c2)
        |SELECT cc.doc_id, cc.canonical_id,
        |  row_number() OVER (PARTITION BY canonical_id
        |    ORDER BY quality DESC, cc.doc_id) = 1 AS kept
        |FROM cc JOIN q ON cc.doc_id = q.doc_id
        |ORDER BY cc.doc_id""".stripMargin,

    // the dedup_resolve closure + two aggregates
    "dedup_cluster_sizes" ->
      """WITH RECURSIVE
        |t AS (SELECT doc_id, string_split_regex(trim(text), '\s+') AS tk FROM documents),
        |s AS (SELECT doc_id, list_distinct(list_transform(range(1, len(tk) - 1),
        |  i -> tk[i] || ' ' || tk[i+1] || ' ' || tk[i+2])) AS sh FROM t),
        |ex AS (SELECT doc_id, len(sh) AS n, unnest(sh) AS shingle FROM s),
        |pairs AS (
        |  SELECT a.doc_id AS ida, b.doc_id AS idb, count(*) AS c,
        |    any_value(a.n) AS na, any_value(b.n) AS nb
        |  FROM ex a JOIN ex b ON a.shingle = b.shingle AND b.doc_id > a.doc_id
        |  GROUP BY 1, 2),
        |edges AS (SELECT ida, idb FROM pairs
        |  WHERE CAST(c AS DOUBLE) / (na + nb - c) >= 0.5),
        |und AS (SELECT ida AS src, idb AS dst FROM edges
        |  UNION ALL SELECT idb, ida FROM edges),
        |reach AS (
        |  SELECT src, dst FROM und
        |  UNION
        |  SELECT r.src, u.dst FROM reach r JOIN und u ON u.src = r.dst),
        |canon AS (
        |  SELECT d.doc_id,
        |    LEAST(d.doc_id, COALESCE(MIN(r.dst), d.doc_id)) AS canonical_id
        |  FROM documents d LEFT JOIN reach r ON r.src = d.doc_id
        |  GROUP BY d.doc_id),
        |cl AS (SELECT canonical_id, COUNT(*) AS sz FROM canon GROUP BY canonical_id)
        |SELECT sz AS cluster_size, COUNT(*) AS n_clusters
        |FROM cl GROUP BY sz ORDER BY cluster_size""".stripMargin,

    // Incremental admission, closed-form: even ids = existing corpus,
    // odd ids = incoming. Valid as an oracle because LSH candidate
    // generation is COMPLETE on this data at the gate SF (every true
    // >=0.8-Jaccard pair sits at >=0.9 where the 8x4 band miss
    // probability is ~2e-4 per pair, and dedup_minhash_lsh's row count
    // equals the exact pair count) — so the engine's LSH + verify + CC
    // equals this exact transitive-closure formulation.
    "dedup_incremental" ->
      """WITH RECURSIVE
        |t AS (SELECT doc_id, string_split_regex(trim(text), '\s+') AS tk FROM documents),
        |s AS (SELECT doc_id, list_distinct(list_transform(range(1, len(tk) - 1),
        |  i -> tk[i] || ' ' || tk[i+1] || ' ' || tk[i+2])) AS sh FROM t),
        |ex AS (SELECT doc_id, len(sh) AS n, unnest(sh) AS shingle FROM s),
        |pairs AS (
        |  SELECT a.doc_id AS ida, b.doc_id AS idb, count(*) AS c,
        |    any_value(a.n) AS na, any_value(b.n) AS nb
        |  FROM ex a JOIN ex b ON a.shingle = b.shingle AND b.doc_id > a.doc_id
        |  GROUP BY 1, 2),
        |edges AS (SELECT ida, idb FROM pairs
        |  WHERE CAST(c AS DOUBLE) / (na + nb - c) >= 0.8),
        |inedges AS (SELECT ida, idb FROM edges WHERE ida % 2 = 1 AND idb % 2 = 1),
        |und AS (SELECT ida AS src, idb AS dst FROM inedges
        |  UNION ALL SELECT idb, ida FROM inedges),
        |reach AS (
        |  SELECT src, dst FROM und
        |  UNION
        |  SELECT r.src, u.dst FROM reach r JOIN und u ON u.src = r.dst),
        |comp AS (
        |  SELECT d.doc_id, LEAST(d.doc_id, COALESCE(MIN(r.dst), d.doc_id)) AS label
        |  FROM documents d LEFT JOIN reach r ON r.src = d.doc_id
        |  WHERE d.doc_id % 2 = 1 GROUP BY d.doc_id),
        |tainted AS (
        |  SELECT DISTINCT CASE WHEN ida % 2 = 1 THEN ida ELSE idb END AS doc_id
        |  FROM edges WHERE (ida % 2) + (idb % 2) = 1),
        |bad AS (SELECT DISTINCT c.label FROM comp c JOIN tainted x ON x.doc_id = c.doc_id)
        |SELECT c.doc_id, d.n_chars FROM comp c
        |JOIN documents d ON d.doc_id = c.doc_id
        |WHERE c.doc_id = c.label AND c.label NOT IN (SELECT label FROM bad)
        |ORDER BY c.doc_id""".stripMargin,

    // SimHash, end to end in portable SQL: XXH64 over each distinct
    // shingle's bytes (the general short-input path — word/4-byte/byte
    // tails; gate shingles are ASCII and < 32 bytes so the 32-byte
    // stripe loop is never entered and is not emitted), 64-bit +/-1
    // voting per doc, and ALL pairs at hamming <= 7 — valid because
    // maxHamming(7) < bands(8) makes the engine's band candidates
    // pigeonhole-complete, so banding is performance-only. List-lambda
    // variables (unlike SQL aliases) don't textually expand, which is
    // what makes the per-word fold writable inline.
    "dedup_simhash" ->
      s"""WITH t AS (
        |  SELECT doc_id, string_split_regex(trim(text), '\\s+') AS tk FROM documents),
        |shd AS (
        |  SELECT DISTINCT doc_id,
        |    unnest(list_transform(range(1, len(tk) - 1),
        |      i -> tk[i] || ' ' || tk[i+1] || ' ' || tk[i+2])) AS sh
        |  FROM t),
        |dsh AS (SELECT DISTINCT sh FROM shd),
        |$strXxh64Ctes
        |pw AS (SELECT * FROM (VALUES (0, 1), (1, 2), (2, 4), (3, 8), (4, 16), (5, 32), (6, 64), (7, 128), (8, 256), (9, 512), (10, 1024), (11, 2048), (12, 4096), (13, 8192), (14, 16384), (15, 32768), (16, 65536), (17, 131072), (18, 262144), (19, 524288), (20, 1048576), (21, 2097152), (22, 4194304), (23, 8388608), (24, 16777216), (25, 33554432), (26, 67108864), (27, 134217728), (28, 268435456), (29, 536870912), (30, 1073741824), (31, 2147483648), (32, 4294967296), (33, 8589934592), (34, 17179869184), (35, 34359738368), (36, 68719476736), (37, 137438953472), (38, 274877906944), (39, 549755813888), (40, 1099511627776), (41, 2199023255552), (42, 4398046511104), (43, 8796093022208), (44, 17592186044416), (45, 35184372088832), (46, 70368744177664), (47, 140737488355328), (48, 281474976710656), (49, 562949953421312), (50, 1125899906842624), (51, 2251799813685248), (52, 4503599627370496), (53, 9007199254740992), (54, 18014398509481984), (55, 36028797018963968), (56, 72057594037927936), (57, 144115188075855872), (58, 288230376151711744), (59, 576460752303423488), (60, 1152921504606846976), (61, 2305843009213693952), (62, 4611686018427387904), (63, 9223372036854775808)) p(j, pv)),
        |sig AS (
        |  SELECT doc_id,
        |    CAST(SUM(CASE WHEN v > 0 THEN CAST(pv AS HUGEINT) ELSE 0 END)
        |      - CASE WHEN SUM(CASE WHEN v > 0 AND j = 63 THEN 1 ELSE 0 END) > 0
        |             THEN 18446744073709551616 ELSE 0 END AS BIGINT) AS s
        |  FROM (
        |    SELECT doc_id, j, pv,
        |      SUM(CASE WHEN (hv // CAST(pv AS HUGEINT)) % 2 = 1 THEN 1 ELSE -1 END) AS v
        |    FROM shd JOIN hf USING (sh)
        |    CROSS JOIN pw
        |    GROUP BY doc_id, j, pv)
        |  GROUP BY doc_id)
        |SELECT a.doc_id AS id_a, b.doc_id AS id_b,
        |  CAST(bit_count(xor(a.s, b.s)) AS INTEGER) AS hamming
        |FROM sig a JOIN sig b ON a.doc_id < b.doc_id
        |WHERE bit_count(xor(a.s, b.s)) <= 7
        |ORDER BY id_a, id_b""".stripMargin,

    // Valid as an oracle for the same reason as dedup_incremental:
    // every true >=0.5-jaccard pair in the gate corpora actually sits
    // at j >= 0.889 (sf0.001 floor; 0.9 at sf0.01), where the 8x4
    // band miss probability (1-j^4)^8 is ~4e-4 and ~2e-4
    // respectively, the pipeline is deterministic, and reported
    // jaccards are the exact verify values — so LSH + verify equals
    // this exact formulation (DedupSpec pins full set equality at
    // sf0.001).
    "dedup_minhash_lsh" ->
      """WITH t AS (
        |  SELECT doc_id, string_split_regex(trim(text), '\s+') AS tk FROM documents),
        |s AS (SELECT doc_id, list_distinct(list_transform(range(1, len(tk) - 1),
        |  i -> tk[i] || ' ' || tk[i+1] || ' ' || tk[i+2])) AS sh FROM t),
        |ex AS (SELECT doc_id, len(sh) AS n, unnest(sh) AS shingle FROM s
        |       WHERE len(sh) > 0),
        |pairs AS (
        |  SELECT a.doc_id AS id_a, b.doc_id AS id_b, count(*) AS c,
        |    any_value(a.n) AS na, any_value(b.n) AS nb
        |  FROM ex a JOIN ex b ON a.shingle = b.shingle AND b.doc_id > a.doc_id
        |  GROUP BY 1, 2)
        |SELECT id_a, id_b, CAST(c AS DOUBLE) / (na + nb - c) AS jaccard
        |FROM pairs WHERE CAST(c AS DOUBLE) / (na + nb - c) >= 0.5
        |ORDER BY id_a, id_b""".stripMargin,

    // b-bit minhash audit: exact pairs (same CTEs/completeness as
    // dedup_minhash_lsh) + a bit-exact replay of the engine signature
    // (XXH64 ∘ splitmix64, signed minima, low-b lanes, Li–König
    // correction). Defaults mirror Dedup.bbitMinhashAudit.
    "dedup_bbit_minhash" -> bbitOracle(8, 4, 4, 0.5),

    // the D2 pair CTEs + a provenance rollup; counts integer,
    // max-jaccard exact selection — hash-stable wherever the pair set
    // is (same completeness argument as dedup_minhash_lsh)
    "dedup_source_matrix" ->
      """WITH t AS (
        |  SELECT doc_id, string_split_regex(trim(text), '\s+') AS tk FROM documents),
        |s AS (SELECT doc_id, list_distinct(list_transform(range(1, len(tk) - 1),
        |  i -> tk[i] || ' ' || tk[i+1] || ' ' || tk[i+2])) AS sh FROM t),
        |ex AS (SELECT doc_id, len(sh) AS n, unnest(sh) AS shingle FROM s
        |       WHERE len(sh) > 0),
        |pairs AS (
        |  SELECT a.doc_id AS id_a, b.doc_id AS id_b, count(*) AS c,
        |    any_value(a.n) AS na, any_value(b.n) AS nb
        |  FROM ex a JOIN ex b ON a.shingle = b.shingle AND b.doc_id > a.doc_id
        |  GROUP BY 1, 2),
        |j AS (
        |  SELECT id_a, id_b, CAST(c AS DOUBLE) / (na + nb - c) AS jaccard
        |  FROM pairs WHERE CAST(c AS DOUBLE) / (na + nb - c) >= 0.5)
        |SELECT least(d1.source, d2.source) AS source_a,
        |  greatest(d1.source, d2.source) AS source_b,
        |  COUNT(*) AS n_pairs, MAX(jaccard) AS max_jaccard
        |FROM j JOIN documents d1 ON d1.doc_id = id_a
        |JOIN documents d2 ON d2.doc_id = id_b
        |GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,

    // Span-granular dedup: the covered-position set and the positional
    // rewrite are plain integer/array algebra — identical in ANSI SQL.
    "dedup_repeated_spans" ->
      """WITH t AS (
        |  SELECT doc_id, string_split_regex(trim(text), '\s+') AS tk FROM documents),
        |occ AS (
        |  SELECT doc_id,
        |    unnest(range(0, greatest(len(tk) - 3, 0))) AS pos,
        |    unnest(list_transform(range(0, greatest(len(tk) - 3, 0)),
        |      i -> array_to_string(list_slice(tk, i + 1, i + 4), ' '))) AS gram
        |  FROM t),
        |hot AS (SELECT gram FROM occ GROUP BY gram HAVING COUNT(*) >= 2),
        |cov AS (
        |  SELECT doc_id, list(DISTINCT cp) AS cov FROM (
        |    SELECT doc_id, unnest(range(pos, pos + 4)) AS cp
        |    FROM occ JOIN hot USING (gram))
        |  GROUP BY doc_id),
        |fin AS (
        |  SELECT t.doc_id,
        |    list_filter(tk, (x, i) ->
        |      NOT list_contains(COALESCE(cov, CAST([] AS BIGINT[])), i - 1)) AS ct,
        |    len(tk) AS nt
        |  FROM t LEFT JOIN cov USING (doc_id))
        |SELECT doc_id,
        |  COALESCE(array_to_string(ct, ' '), '') AS clean_text,
        |  CAST(nt - len(ct) AS INTEGER) AS n_removed
        |FROM fin ORDER BY doc_id""".stripMargin,

    // Unigram LM cross-entropy: counts and the top-64 vocab cut are
    // exact integers (ties on the word), so both engines train the
    // SAME model; only ln can drift (libm ulp) plus double-sum
    // reorder (~1e-13 over ≤1k terms), both absorbed by the 6-dp
    // rounding on the published score — the BM25 oracle argument.
    "lm_cross_entropy" ->
      """WITH tok AS (
        |  SELECT doc_id, unnest(string_split_regex(trim(text), '\s+')) AS w
        |  FROM documents WHERE len(trim(text)) > 0),
        |cnt AS (SELECT w, COUNT(*) AS c FROM tok GROUP BY w),
        |top AS (SELECT w, c FROM cnt ORDER BY c DESC, w LIMIT 64),
        |dn AS (
        |  SELECT CAST((SELECT SUM(c) FROM cnt)
        |    + (SELECT COUNT(*) FROM top) + 1 AS DOUBLE) AS d),
        |lp AS (
        |  SELECT t.doc_id,
        |    COALESCE(ln(CAST(tp.c + 1 AS DOUBLE) / d), ln(1.0 / d)) AS lnp
        |  FROM tok t LEFT JOIN top tp USING (w), dn),
        |s AS (SELECT doc_id, COUNT(*) AS nt, SUM(lnp) AS sl
        |      FROM lp GROUP BY doc_id)
        |SELECT d.doc_id,
        |  CAST(COALESCE(nt, 0) AS INTEGER) AS n_tokens,
        |  COALESCE(round(-sl / nt, 6), CAST(0 AS DOUBLE)) AS cross_entropy
        |FROM documents d LEFT JOIN s USING (doc_id) ORDER BY doc_id""".stripMargin,

    // D69: DoReMi replayed exactly — per-doc CE is the ALREADY
    // 6-dp-rounded D37 value lifted to integer micro-units (ROUND
    // makes the double integer-valued, so the BIGINT cast is exact),
    // per-domain mean is an integer //, and the 10-round
    // exponentiated-gradient fold runs over a source-sorted list():
    // list_reduce left-folds in list order = the operator's
    // driver-side foldLeft in sorted-domain order, so only exp/÷
    // ulps can drift — absorbed by the 6-dp weight rounding.
    "doremi_mix" -> {
      val rounds = (1 to 10).map { k =>
        s"""r$k AS (
           |  SELECT ds, ls, dn, lbar,
           |    list_transform(a, x -> (1.0 - 0.01) * (x / s) + 0.01 / dn)
           |      AS w
           |  FROM (
           |    SELECT ds, ls, dn, lbar, a,
           |      list_reduce(a, (x, y) -> x + y) AS s
           |    FROM (
           |      SELECT ds, ls, dn, lbar,
           |        list_transform(range(1, dn + 1),
           |          i -> w[i] * exp(0.1 * greatest(0.0, ls[i] - lbar)))
           |          AS a
           |      FROM r${k - 1})))""".stripMargin
      }.mkString(",\n")
      s"""WITH tok AS (
         |  SELECT doc_id, unnest(string_split_regex(trim(text), '\\s+')) AS w
         |  FROM documents WHERE len(trim(text)) > 0),
         |cnt AS (SELECT w, COUNT(*) AS c FROM tok GROUP BY w),
         |top AS (SELECT w, c FROM cnt ORDER BY c DESC, w LIMIT 64),
         |dnm AS (
         |  SELECT CAST((SELECT SUM(c) FROM cnt)
         |    + (SELECT COUNT(*) FROM top) + 1 AS DOUBLE) AS d),
         |lp AS (
         |  SELECT t.doc_id,
         |    COALESCE(ln(CAST(tp.c + 1 AS DOUBLE) / d), ln(1.0 / d)) AS lnp
         |  FROM tok t LEFT JOIN top tp USING (w), dnm),
         |sc AS (SELECT doc_id, COUNT(*) AS nt, SUM(lnp) AS sl
         |       FROM lp GROUP BY doc_id),
         |ce AS (
         |  SELECT d.source,
         |    CAST(ROUND(COALESCE(round(-sl / nt, 6), CAST(0 AS DOUBLE))
         |      * 1000000.0) AS BIGINT) AS micro
         |  FROM documents d LEFT JOIN sc USING (doc_id)),
         |dom AS (
         |  SELECT source AS domain, COUNT(*) AS n_docs,
         |    CAST(SUM(micro) AS BIGINT) AS sm
         |  FROM ce GROUP BY 1),
         |base AS (
         |  SELECT list(domain ORDER BY domain) AS ds,
         |    list(CAST(sm // n_docs AS DOUBLE) / 1000000.0
         |      ORDER BY domain) AS ls,
         |    COUNT(*) AS dn,
         |    CAST((SELECT CAST(SUM(sm) AS BIGINT)
         |            // CAST(SUM(n_docs) AS BIGINT) FROM dom) AS DOUBLE)
         |      / 1000000.0 AS lbar
         |  FROM dom),
         |r0 AS (
         |  SELECT ds, ls, dn, lbar,
         |    list_transform(ls, x -> 1.0 / dn) AS w
         |  FROM base),
         |$rounds
         |SELECT d.domain, d.n_docs,
         |  CAST(d.sm // d.n_docs AS BIGINT) AS mean_loss_micro,
         |  ROUND(r.w[list_position(r.ds, d.domain)], 6) AS weight
         |FROM dom d, r10 r
         |ORDER BY d.domain""".stripMargin
    },

    // Stupid-backoff bigram scoring: pair counts, the vocab cut, and
    // which branch each token takes (first / seen-pair / backoff) are
    // all exact-integer decisions, so both engines walk the same
    // branches; ln drift + sum regrouping absorbed by the rounding.
    "lm_bigram_cross_entropy" ->
      s"""WITH $bigramCeCtes
        |SELECT d.doc_id, CAST(COALESCE(nt, 0) AS INTEGER) AS n_tokens,
        |  COALESCE(round(-sl / nt, 6), CAST(0 AS DOUBLE)) AS cross_entropy
        |FROM documents d LEFT JOIN s USING (doc_id) ORDER BY doc_id""".stripMargin,

    "lm_kn_cross_entropy" ->
      s"""WITH $knCeCtes
        |SELECT d.doc_id, CAST(COALESCE(nt, 0) AS INTEGER) AS n_tokens,
        |  COALESCE(round(-sl / nt, 6), CAST(0 AS DOUBLE)) AS cross_entropy
        |FROM documents d LEFT JOIN s USING (doc_id) ORDER BY doc_id""".stripMargin,

    // D80: the train_split CASE gates which docs feed the model CTEs
    // (train fold) and which get scored (val fold); the scoring
    // branches and association are lm_bigram's. The split joins at
    // the DOC level once and rides the token explosion as a column —
    // joining the inlined hash chain against token rows made DuckDB
    // re-evaluate it per probe and OOM.
    "holdout_perplexity" ->
      s"""WITH h AS (
        |  SELECT doc_id, $xxhBucket AS bucket
        |  FROM (${xxh64Nested("SELECT doc_id FROM documents", "doc_id")})),
        |sp AS (
        |  SELECT doc_id, CASE WHEN bucket < 900000 THEN 0
        |                      WHEN bucket < 950000 THEN 1 ELSE 2 END AS split
        |  FROM h),
        |d0 AS (
        |  SELECT d.doc_id, sp.split, CASE WHEN len(trim(text)) > 0
        |    THEN string_split_regex(trim(text), '\\s+')
        |    ELSE CAST([] AS VARCHAR[]) END AS tk
        |  FROM documents d JOIN sp ON sp.doc_id = d.doc_id),
        |tok AS (
        |  SELECT doc_id, split,
        |    unnest(list_transform(tk, (w, i) -> struct_pack(i := i, w := w))) AS s
        |  FROM d0),
        |tw AS (SELECT doc_id, split, s.i AS i, s.w AS w FROM tok),
        |twt AS (SELECT doc_id, i, w FROM tw WHERE split = 0),
        |cnt AS (SELECT w, COUNT(*) AS c FROM twt GROUP BY w),
        |top AS (SELECT w, c FROM cnt ORDER BY c DESC, w LIMIT 64),
        |dn AS (SELECT CAST((SELECT SUM(c) FROM cnt)
        |  + (SELECT COUNT(*) FROM top) + 1 AS DOUBLE) AS d),
        |laggedt AS (
        |  SELECT doc_id, i, w,
        |    lag(w) OVER (PARTITION BY doc_id ORDER BY i) AS prev
        |  FROM twt),
        |pc AS (
        |  SELECT l.prev AS v, l.w AS w, COUNT(*) AS c
        |  FROM laggedt l
        |  JOIN top tv ON tv.w = l.prev JOIN top tc ON tc.w = l.w
        |  WHERE l.prev IS NOT NULL GROUP BY l.prev, l.w),
        |laggedv AS (
        |  SELECT doc_id, i, w,
        |    lag(w) OVER (PARTITION BY doc_id ORDER BY i) AS prev
        |  FROM tw WHERE split = 1),
        |lp AS (
        |  SELECT l.doc_id,
        |    CASE WHEN l.prev IS NULL THEN
        |      COALESCE(ln(CAST(tc.c + 1 AS DOUBLE) / d), ln(1.0 / d))
        |    ELSE
        |      COALESCE(ln(CAST(pc.c AS DOUBLE) / CAST(tv.c AS DOUBLE)),
        |        ln(0.4) + COALESCE(ln(CAST(tc.c + 1 AS DOUBLE) / d), ln(1.0 / d)))
        |    END AS lnS
        |  FROM laggedv l
        |  LEFT JOIN top tc ON tc.w = l.w
        |  LEFT JOIN top tv ON tv.w = l.prev
        |  LEFT JOIN pc ON pc.v = l.prev AND pc.w = l.w
        |  CROSS JOIN dn),
        |s AS (SELECT doc_id, COUNT(*) AS nt, SUM(lnS) AS sl
        |      FROM lp GROUP BY doc_id)
        |SELECT d.doc_id, CAST(COALESCE(nt, 0) AS INTEGER) AS n_tokens,
        |  COALESCE(round(-sl / nt, 6), CAST(0 AS DOUBLE)) AS cross_entropy
        |FROM (SELECT doc_id FROM d0 WHERE split = 1) d
        |LEFT JOIN s USING (doc_id) ORDER BY d.doc_id""".stripMargin,

    // Perplexity filter: the bigram CE pipeline above + a per-language
    // exact-integer rank cut on the rounded score (id tiebreak), so
    // both engines place the 70% boundary identically.
    "perplexity_filter" ->
      s"""WITH $bigramCeCtes,
        |ce AS (
        |  SELECT d.doc_id, d.lang,
        |    COALESCE(round(-sl / nt, 6), CAST(0 AS DOUBLE)) AS cross_entropy
        |  FROM documents d LEFT JOIN s USING (doc_id)),
        |rk AS (
        |  SELECT doc_id, lang, cross_entropy,
        |    row_number() OVER (PARTITION BY lang
        |      ORDER BY cross_entropy, doc_id) AS rn,
        |    COUNT(*) OVER (PARTITION BY lang) AS n
        |  FROM ce)
        |SELECT doc_id, lang, cross_entropy,
        |  (rn <= CAST(ceil(n * 0.7) AS BIGINT)) AS kept
        |FROM rk ORDER BY doc_id""".stripMargin,

    // D74: exact 30-char windows on both sides, joined on the gram
    // string — pure substring algebra identical in ANSI SQL (the
    // Spark side's rolling-hash nomination is an optimization the
    // exact verify erases from the result).
    "decontamination_char" ->
      """WITH cg AS (
        |  SELECT DISTINCT doc_id, substr(text, CAST(i AS INTEGER), 30) AS gram
        |  FROM (SELECT doc_id, text,
        |          unnest(range(1, greatest(len(text) - 28, 1))) AS i
        |        FROM documents WHERE doc_id % 10 <> 0)),
        |bg AS (
        |  SELECT DISTINCT substr(text, CAST(i AS INTEGER), 30) AS gram
        |  FROM (SELECT text,
        |          unnest(range(1, greatest(len(text) - 28, 1))) AS i
        |        FROM documents WHERE doc_id % 10 = 0))
        |SELECT doc_id, COUNT(*) AS n_shared_grams
        |FROM cg JOIN bg USING (gram)
        |GROUP BY doc_id ORDER BY doc_id""".stripMargin,

    // Exact char-level span dedup: positions covered by a repeated
    // substring of length >= 30 equal positions covered by a repeated
    // exact-30 gram (the suffix-array reduction — SuffixDedup scaladoc),
    // and gram counting / coverage / positional rewrite are plain
    // integer-and-substring algebra identical in ANSI SQL.
    "dedup_char_spans" ->
      """WITH occ AS (
        |  SELECT doc_id,
        |    unnest(range(1, greatest(len(text) - 28, 1))) AS pos,
        |    unnest(list_transform(range(1, greatest(len(text) - 28, 1)),
        |      i -> substr(text, CAST(i AS INTEGER), 30))) AS gram
        |  FROM documents),
        |hot AS (SELECT gram FROM occ GROUP BY gram HAVING COUNT(*) >= 2),
        |cov AS (
        |  SELECT doc_id, list(DISTINCT cp) AS cov FROM (
        |    SELECT doc_id, unnest(range(pos, pos + 30)) AS cp
        |    FROM occ JOIN hot USING (gram))
        |  GROUP BY doc_id),
        |fin AS (
        |  SELECT d.doc_id, d.text,
        |    -- array_to_string([]) is NULL in duckdb, not '' — coalesce
        |    COALESCE(array_to_string(list_transform(
        |      list_filter(range(1, len(text) + 1),
        |        i -> NOT list_contains(COALESCE(cov, CAST([] AS BIGINT[])), i)),
        |      i -> substr(text, CAST(i AS INTEGER), 1)), ''), '') AS clean_text
        |  FROM documents d LEFT JOIN cov USING (doc_id))
        |SELECT doc_id, clean_text,
        |  CAST(len(text) - len(clean_text) AS INTEGER) AS n_removed
        |FROM fin ORDER BY doc_id""".stripMargin,

    "sequence_pack" ->
      """SELECT doc_id, doc_id % 8 AS bucket,
        |  CAST(len(string_split_regex(trim(text), '\s+')) AS INTEGER) AS n_tokens,
        |  CAST(SUM(CAST(len(string_split_regex(trim(text), '\s+')) AS INTEGER)) OVER (
        |    PARTITION BY doc_id % 8 ORDER BY doc_id
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
        |    - len(string_split_regex(trim(text), '\s+')) AS BIGINT) AS start_offset,
        |  CAST(FLOOR((SUM(CAST(len(string_split_regex(trim(text), '\s+')) AS INTEGER)) OVER (
        |    PARTITION BY doc_id % 8 ORDER BY doc_id
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
        |    - len(string_split_regex(trim(text), '\s+'))) / 512.0) AS BIGINT) AS shard
        |FROM documents ORDER BY doc_id""".stripMargin,

    // the NFD fold mirrored: same (neglen, id) sort, same left fold.
    // The accumulator is ONE FLAT BIGINT list — [fill, shard, (id,
    // len, shard, off)×docs] — because a struct accumulator silently
    // drops its LIST field between list_reduce steps in this DuckDB
    // (scalar fields accumulate, list fields reset); the flat-list
    // fold is the same proven shape as vocab_tokenize_ids. All-integer
    // arithmetic — exact.
    "sequence_pack_nextfit" ->
      s"""WITH $nextFitChain
         |SELECT doc_id, bucket, n_tokens, shard, "offset"
         |FROM pk ORDER BY doc_id""".stripMargin,

    // D73: the waste ledger of the D43 packer — shard counts, token
    // mass, capacity and utilization per bucket, all exact integers
    // over the SAME fold chain (utilization is one divide, 6-dp).
    "packing_efficiency" ->
      s"""WITH $nextFitChain
         |SELECT bucket,
         |  CAST(MAX(shard) + 1 AS BIGINT) AS n_shards,
         |  CAST(SUM(n_tokens) AS BIGINT) AS total_tokens,
         |  CAST((MAX(shard) + 1) * 512 AS BIGINT) AS capacity_tokens,
         |  CAST((MAX(shard) + 1) * 512 - SUM(n_tokens) AS BIGINT)
         |    AS waste_tokens,
         |  ROUND(CAST(SUM(n_tokens) AS DOUBLE)
         |    / CAST((MAX(shard) + 1) * 512 AS DOUBLE), 6) AS utilization
         |FROM pk GROUP BY bucket ORDER BY bucket""".stripMargin,

    "source_quota" ->
      """SELECT doc_id, source FROM (
        |  SELECT doc_id, source,
        |    row_number() OVER (PARTITION BY source ORDER BY doc_id) AS rn
        |  FROM documents) WHERE rn <= 12 ORDER BY source, doc_id""".stripMargin,

    "ann_bruteforce_topk" -> bruteForceOracle,

    // D87: the brute-force cosine chain (bit-exact IEEE folds, see
    // bruteForceOracle) with the τ filter BEFORE the rank window —
    // identical cos bits make the cut decision engine-invariant
    // per-corpus-row argmax over the bench: the Spark fold keeps the
    // FIRST max in bid-ascending order = ORDER BY cos DESC, bid pick;
    // cosine bits are the D6 fold, so the tau cut cannot diverge
    "decontamination_semantic" ->
      """WITH b AS (
        |  SELECT vec_id AS bid, embedding AS bv FROM embeddings
        |  WHERE vec_id % 100 = 0),
        |c AS (
        |  SELECT vec_id AS id, embedding AS v FROM embeddings
        |  WHERE vec_id % 100 <> 0),
        |s AS (
        |  SELECT id, bid,
        |    list_reduce(list_transform(range(1, len(v) + 1),
        |      i -> CAST(v[i] AS DOUBLE) * CAST(bv[i] AS DOUBLE)),
        |      (a, x) -> a + x) AS dot,
        |    list_reduce(list_transform(range(1, len(v) + 1),
        |      i -> CAST(v[i] AS DOUBLE) * CAST(v[i] AS DOUBLE)),
        |      (a, x) -> a + x) AS na,
        |    list_reduce(list_transform(range(1, len(v) + 1),
        |      i -> CAST(bv[i] AS DOUBLE) * CAST(bv[i] AS DOUBLE)),
        |      (a, x) -> a + x) AS nb
        |  FROM c CROSS JOIN b),
        |sc AS (
        |  SELECT id, bid,
        |    CASE WHEN na = 0 OR nb = 0 THEN 0.0
        |         ELSE dot / (sqrt(na) * sqrt(nb)) END AS cos
        |  FROM s),
        |r AS (
        |  SELECT id, bid, cos,
        |    row_number() OVER (PARTITION BY id ORDER BY cos DESC, bid) AS rk
        |  FROM sc)
        |SELECT id, bid AS bench_id, cos AS max_cos,
        |  (cos >= 0.35) AS contaminated
        |FROM r WHERE rk = 1 ORDER BY id""".stripMargin,

    "hard_negatives" ->
      """WITH q AS (
        |  SELECT vec_id AS qid, embedding AS qv FROM embeddings WHERE vec_id < 5),
        |s AS (
        |  SELECT qid, e.vec_id AS id,
        |    list_reduce(list_transform(range(1, len(qv) + 1),
        |      i -> CAST(qv[i] AS DOUBLE) * CAST(e.embedding[i] AS DOUBLE)),
        |      (a, b) -> a + b) AS dot,
        |    list_reduce(list_transform(range(1, len(qv) + 1),
        |      i -> CAST(qv[i] AS DOUBLE) * CAST(qv[i] AS DOUBLE)),
        |      (a, b) -> a + b) AS na,
        |    list_reduce(list_transform(range(1, len(qv) + 1),
        |      i -> CAST(e.embedding[i] AS DOUBLE) * CAST(e.embedding[i] AS DOUBLE)),
        |      (a, b) -> a + b) AS nb
        |  FROM embeddings e CROSS JOIN q WHERE e.vec_id <> q.qid),
        |c AS (
        |  SELECT qid, id,
        |    CASE WHEN na = 0 OR nb = 0 THEN 0.0
        |         ELSE dot / (sqrt(na) * sqrt(nb)) END AS cos
        |  FROM s),
        |r AS (
        |  SELECT qid, id, cos,
        |    row_number() OVER (PARTITION BY qid ORDER BY cos DESC, id) AS rk
        |  FROM c WHERE cos < 0.35)
        |SELECT qid, id, cos, CAST(rk AS INTEGER) AS rk
        |FROM r WHERE rk <= 10 ORDER BY qid, rk""".stripMargin,

    "ann_matryoshka_report" -> matryoshkaOracle(16, 40, 10),

    "mmr_diversified_topk" -> mmrOracle(10, 50),

    // RRF fusion of the two already-oracled legs: BM25 rank list ×
    // dense-cosine rank list (query vector 0), fused as
    // Σ 1/(60+rank) with absent legs contributing 0. Ranks are exact
    // integers, the sum is a fixed two-term double fold, and the
    // 9-dp round runs before ORDER BY on both sides — the cut cannot
    // diverge.
    "hybrid_search_rrf" ->
      s"""WITH bm AS (${bm25Oracle(
             graft.queries.WarehouseQueries.Bm25Terms, 50, 1.2, 0.75)}),
        |bmr AS (
        |  SELECT doc_id,
        |    CAST(row_number() OVER (ORDER BY score DESC, doc_id) AS INTEGER)
        |      AS bm25_rank
        |  FROM bm),
        |bf AS ($bruteForceOracle),
        |dr AS (SELECT id AS doc_id, rk AS dense_rank FROM bf WHERE qid = 0),
        |f AS (
        |  SELECT COALESCE(bmr.doc_id, dr.doc_id) AS doc_id,
        |    bm25_rank, dense_rank
        |  FROM bmr FULL OUTER JOIN dr ON bmr.doc_id = dr.doc_id)
        |SELECT doc_id, bm25_rank, dense_rank,
        |  round((CASE WHEN bm25_rank IS NULL THEN 0.0
        |              ELSE 1.0 / (60.0 + CAST(bm25_rank AS DOUBLE)) END)
        |      + (CASE WHEN dense_rank IS NULL THEN 0.0
        |              ELSE 1.0 / (60.0 + CAST(dense_rank AS DOUBLE)) END), 9)
        |    AS rrf
        |FROM f ORDER BY rrf DESC, doc_id LIMIT 20""".stripMargin,

    // The capstone composition, end to end in SQL: quality formula,
    // exact dedup (min-id per text), near-dup transitive closure (the
    // engine's LSH candidates are complete on gate data at the 0.8
    // bar — same argument as dedup_incremental), 8-gram
    // decontamination against the eval slice, language id, and the
    // portable-XXH64 hash split. Every stage is the already-oracled
    // formulation; their composition oracles the whole pipeline.
    "corpus_pipeline" ->
      s"""WITH RECURSIVE
        |$corpusPipelineChain,
        |lang AS (
        |  SELECT doc_id, $langCase AS lang
        |  FROM (
        |    SELECT doc_id,
        |      len(list_filter(tk, x -> list_contains(['the','a','of','and','to','in','is'], x))) AS he,
        |      len(list_filter(tk, x -> list_contains(['le','la','et','les','des','un','une'], x))) AS hf,
        |      len(list_filter(tk, x -> list_contains(['der','die','und','das','ein','nicht'], x))) AS hd,
        |      len(list_filter(tk, x -> list_contains(['el','los','y','que','un','una','en'], x))) AS hs
        |    FROM clean)),
        |hb AS (
        |  SELECT doc_id, $xxhBucket AS bucket
        |  FROM (${xxh64Nested("SELECT doc_id FROM clean", "doc_id")}))
        |SELECT l.doc_id, l.lang,
        |  CASE WHEN hb.bucket < 900000 THEN 0
        |       WHEN hb.bucket < 950000 THEN 1 ELSE 2 END AS split
        |FROM lang l JOIN hb USING (doc_id)
        |ORDER BY l.doc_id""".stripMargin,

    // D72: the same CTE chain, counted per stage. Default config keeps
    // everything after decontamination (no quota, keep-all mixture),
    // so stages 5-7 mirror stage 4's count — exactly what the Spark
    // audit reports for the identity stages.
    "pipeline_audit" ->
      s"""WITH RECURSIVE
        |$corpusPipelineChain,
        |cnts AS (
        |  SELECT '0_input' AS stage, 0 AS stage_order,
        |    (SELECT COUNT(*) FROM corp) AS rows_out
        |  UNION ALL SELECT '1_quality_gate', 1, (SELECT COUNT(*) FROM qual)
        |  UNION ALL SELECT '2_exact_dedup', 2, (SELECT COUNT(*) FROM exact)
        |  UNION ALL SELECT '3_near_dedup', 3, (SELECT COUNT(*) FROM reps)
        |  UNION ALL SELECT '4_decontaminated', 4, (SELECT COUNT(*) FROM clean)
        |  UNION ALL SELECT '5_quota_capped', 5, (SELECT COUNT(*) FROM clean)
        |  UNION ALL SELECT '6_mixture_sampled', 6, (SELECT COUNT(*) FROM clean)
        |  UNION ALL SELECT '7_final', 7, (SELECT COUNT(*) FROM clean))
        |SELECT stage, CAST(stage_order AS INTEGER) AS stage_order,
        |  CAST(rows_out AS BIGINT) AS rows_out,
        |  CAST(COALESCE(lag(rows_out) OVER (ORDER BY stage_order),
        |    rows_out) - rows_out AS BIGINT) AS rows_dropped
        |FROM cnts ORDER BY stage_order""".stripMargin,

    // Deterministic order: sort by the portable XXH64 of the doc id.
    "training_order" ->
      s"""SELECT doc_id, $xxhSigned AS sort_key
        |FROM (${xxh64Nested("SELECT doc_id FROM documents", "doc_id")})
        |ORDER BY sort_key, doc_id""".stripMargin,

    // the bucket-offset id scheme is bit-identical to a global
    // row_number over (sort_key, doc_id) — the oracle states the
    // specification the operator avoids paying for
    "dense_ids" ->
      s"""WITH h AS (
        |  SELECT doc_id, $xxhSigned AS sort_key
        |  FROM (${xxh64Nested("SELECT doc_id FROM documents", "doc_id")}))
        |SELECT doc_id,
        |  CAST(row_number() OVER (ORDER BY sort_key, doc_id) - 1 AS BIGINT)
        |    AS gid
        |FROM h ORDER BY doc_id""".stripMargin,

    "train_split" ->
      s"""WITH h AS (
        |  SELECT doc_id, $xxhBucket AS bucket
        |  FROM (${xxh64Nested("SELECT doc_id FROM documents", "doc_id")})),
        |sp AS (
        |  SELECT doc_id, CASE WHEN bucket < 900000 THEN 0
        |                      WHEN bucket < 950000 THEN 1 ELSE 2 END AS split
        |  FROM h)
        |SELECT split, COUNT(*) AS n_docs, MIN(doc_id) AS min_id
        |FROM sp GROUP BY split ORDER BY split""".stripMargin,

    "mixture_resample" -> mixtureResampleSql,
    "stream_mixture_gate" -> mixtureResampleSql,

    // E6: the dedup face projects the key set; with the watermark
    // delay past the table's event-time span no state evicts, so the
    // emitted keys equal the global distinct under any batching
    "stream_watermark_dedup" ->
      """SELECT DISTINCT user_id, event_type FROM events
        |ORDER BY user_id, event_type""".stripMargin,

    // Same constants at planes=8 with the 1-bit multi-probe: a pair is
    // a candidate iff its sign signatures differ in <= 1 bit
    // (bit_count(xor(...))), then the exact cosine fold decides.
    "dedup_embedding_cosine" ->
      s"""WITH s AS (SELECT ${hyperMatrix(8)} AS m),
        |b AS (
        |  SELECT vec_id AS id, embedding AS vec,
        |    CAST(${hyperBucketExpr("embedding", 8)} AS BIGINT) AS bucket
        |  FROM embeddings, s),
        |pr AS (
        |  SELECT a.id AS id_a, a.vec AS vec_a, b2.id AS id_b, b2.vec AS vec_b
        |  FROM b a JOIN b b2
        |    ON a.id < b2.id AND bit_count(xor(a.bucket, b2.bucket)) <= 1),
        |sc AS (
        |  SELECT id_a, id_b,
        |    list_reduce(list_transform(range(1, 65),
        |      i -> CAST(vec_a[i] AS DOUBLE) * CAST(vec_b[i] AS DOUBLE)), (a, b) -> a + b) AS dot,
        |    list_reduce(list_transform(range(1, 65),
        |      i -> CAST(vec_a[i] AS DOUBLE) * CAST(vec_a[i] AS DOUBLE)), (a, b) -> a + b) AS na,
        |    list_reduce(list_transform(range(1, 65),
        |      i -> CAST(vec_b[i] AS DOUBLE) * CAST(vec_b[i] AS DOUBLE)), (a, b) -> a + b) AS nb
        |  FROM pr),
        |c AS (
        |  SELECT id_a, id_b,
        |    CASE WHEN na = 0 OR nb = 0 THEN 0.0 ELSE dot / (sqrt(na) * sqrt(nb)) END AS cos
        |  FROM sc)
        |SELECT id_a, id_b, cos FROM c WHERE cos >= 0.35 ORDER BY id_a, id_b""".stripMargin,

    // Bucketing IS computable on any engine: the hyperplane signs are
    // bit0 of the public xxhash64 chain, embedded via hyperSigns, and
    // projections/cosines mirror the kernels' left-to-right double
    // folds — bucketing, candidates, and scores reproduce bit-for-bit
    // (planes=4, probeBits=0 home-bucket candidates).
    "ann_lsh_topk" ->
      s"""WITH s AS (SELECT ${hyperMatrix(4)} AS m),
        |cb AS (
        |  SELECT vec_id AS id, embedding AS vec,
        |    ${hyperBucketExpr("embedding", 4)} AS bucket
        |  FROM embeddings, s),
        |qb AS (
        |  SELECT vec_id AS qid, embedding AS qv,
        |    ${hyperBucketExpr("embedding", 4)} AS bucket
        |  FROM embeddings, s WHERE vec_id < 5),
        |sc AS (
        |  SELECT qid, cb.id AS id,
        |    list_reduce(list_transform(range(1, 65),
        |      i -> CAST(qv[i] AS DOUBLE) * CAST(cb.vec[i] AS DOUBLE)), (a, b) -> a + b) AS dot,
        |    list_reduce(list_transform(range(1, 65),
        |      i -> CAST(qv[i] AS DOUBLE) * CAST(qv[i] AS DOUBLE)), (a, b) -> a + b) AS na,
        |    list_reduce(list_transform(range(1, 65),
        |      i -> CAST(cb.vec[i] AS DOUBLE) * CAST(cb.vec[i] AS DOUBLE)), (a, b) -> a + b) AS nb
        |  FROM cb JOIN qb USING (bucket) WHERE cb.id <> qb.qid),
        |c AS (
        |  SELECT qid, id,
        |    CASE WHEN na = 0 OR nb = 0 THEN 0.0 ELSE dot / (sqrt(na) * sqrt(nb)) END AS cos
        |  FROM sc),
        |r AS (
        |  SELECT qid, id, cos, row_number() OVER (PARTITION BY qid ORDER BY cos DESC, id) AS rk
        |  FROM c)
        |SELECT qid, id, cos, CAST(rk AS INTEGER) AS rk
        |FROM r WHERE rk <= 10 ORDER BY qid, rk""".stripMargin,
    // Same bit-exactness argument as ann_bruteforce_topk, extended
    // through the quantization round-trip: round() (HALF_UP vs C
    // round-half-away) agrees on every exact double, and each
    // double↔float cast is the same IEEE correctly-rounded operation
    // in both engines — so the dequantized corpus, and therefore every
    // cosine, reproduces exactly.
    "ann_quantized_topk" ->
      """WITH base AS (
        |  SELECT vec_id AS id, embedding,
        |    list_reduce(list_transform(embedding, x -> abs(CAST(x AS DOUBLE))),
        |      (a, b) -> greatest(a, b)) / 127.0 AS s
        |  FROM embeddings),
        |quant AS (
        |  SELECT id,
        |    CAST(s AS FLOAT) AS sf,
        |    list_transform(embedding, x ->
        |      CASE WHEN s = 0 THEN CAST(0 AS TINYINT)
        |           ELSE CAST(round(CAST(x AS DOUBLE) / s) AS TINYINT) END) AS q
        |  FROM base),
        |dq AS (
        |  SELECT id,
        |    list_transform(q, x ->
        |      CAST(CAST(x AS DOUBLE) * CAST(sf AS DOUBLE) AS FLOAT)) AS vec
        |  FROM quant),
        |qs AS (
        |  SELECT vec_id AS qid, embedding AS qv FROM embeddings WHERE vec_id < 5),
        |s AS (
        |  SELECT qid, d.id AS id,
        |    list_reduce(list_transform(range(1, len(qv) + 1),
        |      i -> CAST(qv[i] AS DOUBLE) * CAST(d.vec[i] AS DOUBLE)),
        |      (a, b) -> a + b) AS dot,
        |    list_reduce(list_transform(range(1, len(qv) + 1),
        |      i -> CAST(qv[i] AS DOUBLE) * CAST(qv[i] AS DOUBLE)),
        |      (a, b) -> a + b) AS na,
        |    list_reduce(list_transform(range(1, len(qv) + 1),
        |      i -> CAST(d.vec[i] AS DOUBLE) * CAST(d.vec[i] AS DOUBLE)),
        |      (a, b) -> a + b) AS nb
        |  FROM dq d CROSS JOIN qs WHERE d.id <> qs.qid),
        |c AS (
        |  SELECT qid, id,
        |    CASE WHEN na = 0 OR nb = 0 THEN 0.0
        |         ELSE dot / (sqrt(na) * sqrt(nb)) END AS cos
        |  FROM s),
        |r AS (
        |  SELECT qid, id, cos,
        |    row_number() OVER (PARTITION BY qid ORDER BY cos DESC, id) AS rk
        |  FROM c)
        |SELECT qid, id, cos, CAST(rk AS INTEGER) AS rk
        |FROM r WHERE rk <= 10 ORDER BY qid, rk""".stripMargin,

    "decontamination" ->
      """WITH t AS (
        |  SELECT doc_id, string_split_regex(trim(text), '\s+') AS tk FROM documents),
        |g AS (
        |  SELECT doc_id, list_distinct(list_transform(range(1, len(tk) - 6),
        |    i -> tk[i] || ' ' || tk[i+1] || ' ' || tk[i+2] || ' ' || tk[i+3]
        |      || ' ' || tk[i+4] || ' ' || tk[i+5] || ' ' || tk[i+6] || ' ' || tk[i+7])) AS gs
        |  FROM t),
        |ex AS (SELECT doc_id, unnest(gs) AS gram FROM g)
        |SELECT e.doc_id, b.doc_id AS bench_id, COUNT(*) AS n_shared
        |FROM ex e JOIN (SELECT * FROM ex WHERE doc_id % 10 = 0) b
        |  ON e.gram = b.gram AND e.doc_id <> b.doc_id
        |GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,

    "decontamination_score" ->
      """WITH t AS (
        |  SELECT doc_id, string_split_regex(trim(text), '\s+') AS tk FROM documents),
        |g AS (
        |  SELECT doc_id, list_distinct(list_transform(range(1, len(tk) - 6),
        |    i -> tk[i] || ' ' || tk[i+1] || ' ' || tk[i+2] || ' ' || tk[i+3]
        |      || ' ' || tk[i+4] || ' ' || tk[i+5] || ' ' || tk[i+6] || ' ' || tk[i+7])) AS gs
        |  FROM t),
        |bg AS (SELECT DISTINCT unnest(gs) AS gram FROM g WHERE doc_id % 10 = 0),
        |ex AS (SELECT doc_id, unnest(gs) AS gram FROM g WHERE doc_id % 10 <> 0),
        |sh AS (SELECT e.doc_id, COUNT(*) AS c FROM ex e JOIN bg USING (gram) GROUP BY 1)
        |SELECT g.doc_id, CAST(len(gs) AS BIGINT) AS n_grams,
        |  CAST(COALESCE(s.c, 0) AS BIGINT) AS n_shared,
        |  CAST(COALESCE(s.c, 0) AS DOUBLE) / GREATEST(len(gs), 1) AS overlap_frac
        |FROM g LEFT JOIN sh s USING (doc_id)
        |WHERE g.doc_id % 10 <> 0 ORDER BY g.doc_id""".stripMargin,

    // PSI drift: exact integer counts, add-one smoothing over the
    // union bucket count, single divides, one ln absorbed by 6-dp
    "corpus_drift" -> corpusDriftSql,
    // the E14 stream face merges additive per-batch counts through the
    // SAME psiFromCounts tree — one SQL proves both
    "stream_drift_psi" -> corpusDriftSql,

    "ngram_novelty" ->
      """WITH t AS (
        |  SELECT doc_id, string_split_regex(trim(text), '\s+') AS tk FROM documents),
        |g AS (
        |  SELECT doc_id, list_distinct(list_transform(range(1, len(tk) - 6),
        |    i -> tk[i] || ' ' || tk[i+1] || ' ' || tk[i+2] || ' ' || tk[i+3]
        |      || ' ' || tk[i+4] || ' ' || tk[i+5] || ' ' || tk[i+6] || ' ' || tk[i+7])) AS gs
        |  FROM t),
        |e AS (SELECT doc_id, unnest(gs) AS gram FROM g),
        |sh AS (SELECT gram FROM e GROUP BY gram HAVING COUNT(*) >= 2),
        |pd AS (SELECT e.doc_id, COUNT(*) AS c FROM e JOIN sh USING (gram) GROUP BY 1)
        |SELECT g.doc_id, CAST(len(gs) AS BIGINT) AS n_grams,
        |  CAST(COALESCE(p.c, 0) AS BIGINT) AS n_dup,
        |  CAST(COALESCE(p.c, 0) AS DOUBLE) / GREATEST(len(gs), 1) AS dup_frac
        |FROM g LEFT JOIN pd p USING (doc_id)
        |ORDER BY g.doc_id""".stripMargin,

    // trigram leg tokenizes the FULLY-whitespace-trimmed text (tk2) —
    // the codegen shingle kernel's boundary behavior on any input; the
    // n_tokens/top-token stats keep the house split(trim) tokens (tk)
    "text_repetition_score" ->
      """WITH t AS (
        |  SELECT doc_id, string_split_regex(trim(text), '\s+') AS tk,
        |    string_split_regex(
        |      regexp_replace(text, '^\s+|\s+$', '', 'g'), '\s+') AS tk2
        |  FROM documents),
        |tg AS (
        |  SELECT doc_id, CAST(len(tk) AS INTEGER) AS n_tokens,
        |    list_transform(range(1, greatest(len(tk2) - 1, 1)),
        |      i -> tk2[i] || ' ' || tk2[i+1] || ' ' || tk2[i+2]) AS g
        |  FROM t),
        |dup AS (
        |  SELECT doc_id, n_tokens,
        |    CASE WHEN len(g) = 0 THEN 0.0
        |         ELSE CAST(len(g) - len(list_distinct(g)) AS DOUBLE)
        |              / CAST(len(g) AS DOUBLE) END AS dup_trigram_frac
        |  FROM tg),
        |top AS (
        |  SELECT doc_id, MAX(c) AS top_c FROM (
        |    SELECT doc_id, tok, COUNT(*) AS c FROM (
        |      SELECT doc_id, unnest(tk) AS tok FROM t)
        |    GROUP BY doc_id, tok)
        |  GROUP BY doc_id)
        |SELECT doc_id, n_tokens, dup_trigram_frac,
        |  CAST(top_c AS DOUBLE) / CAST(n_tokens AS DOUBLE) AS top_token_frac
        |FROM dup JOIN top USING (doc_id) ORDER BY doc_id""".stripMargin,

    "text_token_count" ->
      """SELECT doc_id,
        |  CAST(len(string_split_regex(trim(text), '\s+')) AS INTEGER) AS n_tokens,
        |  CAST(len(regexp_extract_all(text, '[a-zA-Z]+|[0-9]|[^a-zA-Z0-9 ]')) AS INTEGER) AS n_subtokens,
        |  n_chars
        |FROM documents ORDER BY doc_id""".stripMargin,

    "text_quality_score" ->
      """WITH t AS (
        |  SELECT doc_id, string_split_regex(trim(text), '\s+') AS tk FROM documents),
        |c AS (
        |  SELECT doc_id,
        |    CAST(len(tk) AS DOUBLE) AS n,
        |    CAST(len(list_distinct(tk)) AS DOUBLE) AS u,
        |    CAST(len(list_filter(tk, x -> list_contains(
        |      ['the','a','of','and','to','in','is'], x))) AS DOUBLE) AS h
        |  FROM t)
        |SELECT doc_id, CAST(n AS INTEGER) AS n_tokens, u / n AS uniq_ratio,
        |  0.4 * least(n / 64.0, 1.0) + 0.4 * (u / n)
        |    + 0.2 * least((h / n) * 8.0, 1.0) AS quality
        |FROM c ORDER BY doc_id""".stripMargin,

    "text_lang_id" ->
      """WITH t AS (
        |  SELECT doc_id, string_split_regex(trim(text), '\s+') AS tk FROM documents),
        |h AS (
        |  SELECT doc_id,
        |    len(list_filter(tk, x -> list_contains(['the','a','of','and','to','in','is'], x))) AS he,
        |    len(list_filter(tk, x -> list_contains(['le','la','et','les','des','un','une'], x))) AS hf,
        |    len(list_filter(tk, x -> list_contains(['der','die','und','das','ein','nicht'], x))) AS hd,
        |    len(list_filter(tk, x -> list_contains(['el','los','y','que','un','una','en'], x))) AS hs
        |  FROM t)
        |SELECT doc_id,
        |  CASE WHEN greatest(he, hf, hd, hs) = 0 THEN 'und'
        |       WHEN he = greatest(he, hf, hd, hs) THEN 'en'
        |       WHEN hf = greatest(he, hf, hd, hs) THEN 'fr'
        |       WHEN hd = greatest(he, hf, hd, hs) THEN 'de'
        |       ELSE 'es' END AS pred_lang
        |FROM h ORDER BY doc_id""".stripMargin,

    "text_fingerprint" ->
      """SELECT doc_id, list_reduce(
        |    list_transform(range(1, length(text) + 1),
        |      i -> CAST(ascii(substr(text, i, 1)) AS BIGINT)),
        |    (a, b) -> (a * 31 + b) % 1000000007) AS fp
        |FROM documents ORDER BY doc_id""".stripMargin,

    // D54: the naive global running-sum window IS the oracle — the
    // operator's bucket decomposition evaluates the same window
    // bucket-wise, so the kept sets match exactly. Budget = half the
    // total token mass, computed in-query on both sides.
    "token_budget_select" ->
      """WITH t AS (SELECT doc_id,
        |    string_split_regex(trim(text), '\s+') AS tk FROM documents),
        |c AS (SELECT doc_id, CAST(len(tk) AS DOUBLE) AS n,
        |    CAST(len(list_distinct(tk)) AS DOUBLE) AS u,
        |    CAST(len(list_filter(tk, x -> list_contains(
        |      ['the','a','of','and','to','in','is'], x))) AS DOUBLE) AS h
        |  FROM t),
        |s AS (SELECT doc_id, CAST(n AS BIGINT) AS n_tokens,
        |    0.4 * least(n / 64.0, 1.0) + 0.4 * (u / n)
        |      + 0.2 * least((h / n) * 8.0, 1.0) AS quality
        |  FROM c),
        |r AS (SELECT *, SUM(n_tokens) OVER (
        |    ORDER BY CAST(floor(quality * 100) AS BIGINT) DESC, doc_id ASC
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum
        |  FROM s)
        |SELECT doc_id, n_tokens, quality,
        |  cum <= (SELECT SUM(n_tokens) // 2 FROM s) AS kept
        |FROM r ORDER BY doc_id""".stripMargin,

    // C43: weights are integer µs, weighted mass in DECIMAL (exact,
    // associative), TWAP = one double divide of two exact aggregates.
    "events_twap" ->
      """WITH e AS (
        |  SELECT user_id, CAST(date_trunc('day', ts) AS DATE) AS day, ts, value,
        |    lead(ts) OVER (PARTITION BY user_id, date_trunc('day', ts)
        |                   ORDER BY ts, event_id) AS nxt
        |  FROM events),
        |w AS (
        |  SELECT user_id, day, COUNT(*) AS n_gaps,
        |    SUM(CAST(value AS DECIMAL(18,2))
        |        * (epoch_us(nxt) - epoch_us(ts))) AS vw,
        |    CAST(SUM(epoch_us(nxt) - epoch_us(ts)) AS BIGINT) AS tw
        |  FROM e WHERE nxt IS NOT NULL GROUP BY 1, 2)
        |SELECT user_id, day, n_gaps,
        |  CAST(vw AS DOUBLE) / CAST(tw AS DOUBLE) AS twap
        |FROM w ORDER BY user_id, day""".stripMargin,

    // D59: all-integer class sizes; the broadcast join back is the
    // window twin COUNT(*) OVER (PARTITION BY qid) — row-identical.
    "k_anonymity_audit" ->
      """SELECT doc_id, lang, source, n_chars // 100 AS len_bucket,
        |  COUNT(*) OVER (PARTITION BY lang, source, n_chars // 100)
        |    AS class_size,
        |  COUNT(*) OVER (PARTITION BY lang, source, n_chars // 100) < 5
        |    AS at_risk
        |FROM documents ORDER BY doc_id""".stripMargin,

    // D85: the canonical form is the same chain both engines own
    // natively (NFC, lower, \s+ collapse, trim); gate text is
    // all-ASCII so NFC is engine-invariant by construction, and the
    // JVM-vs-utf8proc unicode agreement is spec-pinned separately
    "dedup_unicode" ->
      """WITH n AS (
        |  SELECT doc_id, text,
        |    trim(regexp_replace(lower(nfc_normalize(text)),
        |      '\s+', ' ', 'g')) AS norm
        |  FROM documents),
        |c AS (SELECT norm, MIN(doc_id) AS canonical_id FROM n GROUP BY 1)
        |SELECT n.doc_id, c.canonical_id,
        |  n.doc_id <> c.canonical_id AS is_dup,
        |  n.text <> n.norm AS changed
        |FROM n JOIN c USING (norm) ORDER BY n.doc_id""".stripMargin,

    // D88: both sides build the identical page (escape & first, then
    // angle brackets) and run the identical RE2-safe extraction chain
    // (no backreferences; (?is)/(?s) inline flags, &amp; decoded last)
    "html_extract" ->
      """WITH p AS (
        |  SELECT doc_id,
        |    '<html><head><title></title>' ||
        |    '<script type="text/javascript">var x = 1 < 2 && 3 > 2;</script>' ||
        |    '<style>p { color: red; }</style></head>' ||
        |    '<body><!-- boilerplate --><p>' ||
        |    replace(replace(replace(text, '&', '&amp;'), '<', '&lt;'),
        |      '>', '&gt;') ||
        |    '</p><br/><div class="footer">visit &amp; read</div></body></html>'
        |      AS html
        |  FROM documents),
        |x AS (
        |  SELECT doc_id, CAST(length(html) AS BIGINT) AS n_chars_html,
        |    regexp_replace(regexp_replace(regexp_replace(regexp_replace(html,
        |      '(?is)<script[^>]*>.*?</script>', ' ', 'g'),
        |      '(?is)<style[^>]*>.*?</style>', ' ', 'g'),
        |      '(?s)<!--.*?-->', ' ', 'g'),
        |      '<[^>]+>', ' ', 'g') AS stripped
        |  FROM p)
        |SELECT doc_id, n_chars_html,
        |  trim(regexp_replace(
        |    replace(replace(replace(replace(replace(replace(stripped,
        |      '&lt;', '<'), '&gt;', '>'), '&quot;', '"'), '&#39;', ''''),
        |      '&nbsp;', ' '), '&amp;', '&'),
        |    '\s+', ' ', 'g')) AS extracted
        |FROM x ORDER BY doc_id""".stripMargin,

    // D86: the proven split chain + range starts + 1-based inclusive
    // list slice (both engines clamp the tail identically)
    "chunk_overlap" ->
      """WITH t AS (
        |  SELECT doc_id, string_split_regex(trim(text), '\s+') AS tk
        |  FROM documents),
        |s AS (SELECT doc_id, tk, len(tk) AS n FROM t WHERE len(tk) > 0),
        |e AS (SELECT doc_id, tk, n,
        |    unnest(range(0, n, 96)) AS start FROM s)
        |SELECT doc_id,
        |  CAST(start // 96 AS BIGINT) AS chunk_id,
        |  CAST(start AS BIGINT) AS start,
        |  CAST(len(tk[start + 1 : least(start + 128, n)]) AS BIGINT)
        |    AS n_tokens,
        |  array_to_string(tk[start + 1 : least(start + 128, n)], ' ')
        |    AS chunk_text
        |FROM e ORDER BY doc_id, chunk_id""".stripMargin,

    // D79: the quality/repetition doubles reuse their oracle-proven
    // expression trees, lift to integer micro-units (the Doremi round
    // idiom), and every sum is exact-integer; the Pearson chain is the
    // literal double-op mirror of the engine's, over sums that are
    // exactly double-representable at gate scale
    "signal_correlation" -> signalCorrelationSql,
    // E21 stream face: merged additive stats + same finisher
    "stream_signal_matrix" -> signalCorrelationSql,

    // D78: all-integer class/distinct counts; sum-over-cells ==
    // class size, count-of-cells == distinct sensitive values
    "l_diversity_audit" ->
      """SELECT source, n_chars // 100 AS len_bucket,
        |  COUNT(*) AS class_size,
        |  COUNT(DISTINCT lang) AS n_sensitive,
        |  COUNT(DISTINCT lang) >= 2 AS l_diverse
        |FROM documents GROUP BY 1, 2
        |ORDER BY source, len_bucket""".stripMargin,

    // D93: ordered-EMD t-closeness — the cumulative difference is the
    // INTEGER (ng·cn − nc·cm) accumulated exactly (HUGEINT mirrors
    // decimal(38,0)); the published t is ONE double divide, and the
    // flag compares the 6-dp-rounded t so both engines cut identically
    "t_closeness_audit" ->
      """WITH b AS (SELECT lang, source, n_chars // 200 AS a
        |  FROM documents),
        |ca AS (SELECT lang, source, a, COUNT(*) AS n FROM b GROUP BY 1,2,3),
        |ga AS (SELECT a, COUNT(*) AS m FROM b GROUP BY 1),
        |cl AS (SELECT lang, source, SUM(n) AS nc FROM ca GROUP BY 1, 2),
        |t AS (SELECT CAST(SUM(m) AS BIGINT) AS ng, COUNT(*) AS nb FROM ga),
        |grid AS (SELECT cl.lang, cl.source, cl.nc, ga.a, ga.m,
        |    COALESCE(ca.n, 0) AS n
        |  FROM cl CROSS JOIN ga LEFT JOIN ca
        |    ON ca.lang = cl.lang AND ca.source = cl.source AND ca.a = ga.a),
        |cum AS (SELECT lang, source, nc, a,
        |    SUM(n) OVER w AS cn, SUM(m) OVER w AS cm
        |  FROM grid WINDOW w AS (PARTITION BY lang, source ORDER BY a
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)),
        |s AS (SELECT lang, source, nc, ng, nb,
        |    CAST(SUM(ABS(CAST(ng AS HUGEINT) * cn
        |      - CAST(nc AS HUGEINT) * cm)) AS DOUBLE) AS sn
        |  FROM cum CROSS JOIN t GROUP BY 1, 2, 3, 4, 5)
        |SELECT lang, source, CAST(nc AS BIGINT) AS class_size,
        |  CASE WHEN nb <= 1 THEN 0.0 ELSE
        |    round(sn / (CAST(nc AS DOUBLE) * ng * (nb - 1)), 6) END AS t_emd,
        |  (CASE WHEN nb <= 1 THEN 0.0 ELSE
        |    round(sn / (CAST(nc AS DOUBLE) * ng * (nb - 1)), 6) END) <= 0.2
        |    AS t_close
        |FROM s ORDER BY lang, source""".stripMargin,

    // D96: micro-unit score sums, integer bins/positives; mean, frac
    // and gap are one divide each
    "quality_calibration" ->
      """WITH t AS (
        |  SELECT doc_id, text,
        |    string_split_regex(trim(text), '\s+') AS tk FROM documents),
        |q AS (
        |  SELECT doc_id, text, tk,
        |    CAST(len(tk) AS DOUBLE) AS n,
        |    CAST(len(list_distinct(tk)) AS DOUBLE) AS u,
        |    CAST(len(list_filter(tk, x -> list_contains(
        |      ['the','a','of','and','to','in','is'], x))) AS DOUBLE) AS h
        |  FROM t),
        |v AS (
        |  SELECT doc_id,
        |    CAST(round((0.4 * least(n / 64.0, 1.0) + 0.4 * (u / n)
        |      + 0.2 * least((h / n) * 8.0, 1.0)) * 1000000.0) AS BIGINT)
        |      AS qm,
        |    (len(tk) BETWEEN 40 AND 100000
        |      AND CAST(len(regexp_replace(trim(text), '\s+', '', 'g'))
        |            AS DOUBLE) / CAST(len(tk) AS DOUBLE) BETWEEN 3.0 AND 5.0
        |      AND CAST(len(list_filter(tk, w -> regexp_matches(w, '[a-z]')))
        |            AS DOUBLE) / CAST(len(tk) AS DOUBLE) >= 0.8
        |      AND len(list_filter(tk, w -> list_contains(
        |            ['the', 'a', 'of', 'to', 'and'], w))) >= 1) AS keep
        |  FROM q),
        |b AS (SELECT
        |    CAST(least(floor(qm / 100000.0), 9.0) AS BIGINT) AS bin,
        |    qm, CASE WHEN keep THEN 1 ELSE 0 END AS pos FROM v),
        |g AS (SELECT bin, CAST(COUNT(*) AS BIGINT) AS n,
        |    SUM(qm) AS sq, SUM(pos) AS np FROM b GROUP BY 1)
        |SELECT bin, n,
        |  round(CAST(sq AS DOUBLE) / CAST(n AS DOUBLE) / 1000000.0, 6)
        |    AS mean_pred,
        |  round(CAST(np AS DOUBLE) / CAST(n AS DOUBLE), 6) AS frac_pos,
        |  round(CAST(sq AS DOUBLE) / CAST(n AS DOUBLE) / 1000000.0
        |    - CAST(np AS DOUBLE) / CAST(n AS DOUBLE), 6) AS gap
        |FROM g ORDER BY bin""".stripMargin,

    // D97: exact-integer probability ratios, ln inside each term,
    // three pinned sorted folds (cells, both margins)
    "lang_source_mi" ->
      """WITH cells AS (SELECT lang AS x, source AS y, COUNT(*) AS c
        |  FROM documents GROUP BY 1, 2),
        |rx AS (SELECT x, SUM(c) AS cx FROM cells GROUP BY 1),
        |cy AS (SELECT y, SUM(c) AS cy FROM cells GROUP BY 1),
        |t AS (SELECT CAST(SUM(c) AS BIGINT) AS n FROM cells),
        |term AS (SELECT cells.x, cells.y,
        |    (CAST(c AS DOUBLE) / CAST(n AS DOUBLE))
        |      * (ln(CAST(c AS DOUBLE) * CAST(n AS DOUBLE)
        |          / (CAST(cx AS DOUBLE) * CAST(cy AS DOUBLE))) / ln(2)) AS tt
        |  FROM cells JOIN rx USING (x) JOIN cy USING (y) CROSS JOIN t),
        |mi AS (SELECT list_reduce(list_prepend(0.0,
        |    list(tt ORDER BY x, y)), (a, b) -> a + b) AS mi_raw FROM term),
        |hx AS (SELECT list_reduce(list_prepend(0.0, list(
        |    -(CAST(cx AS DOUBLE) / CAST(n AS DOUBLE))
        |      * (ln(CAST(cx AS DOUBLE) / CAST(n AS DOUBLE)) / ln(2))
        |    ORDER BY x)), (a, b) -> a + b) AS hx_raw
        |  FROM rx CROSS JOIN t),
        |hy AS (SELECT list_reduce(list_prepend(0.0, list(
        |    -(CAST(cy AS DOUBLE) / CAST(n AS DOUBLE))
        |      * (ln(CAST(cy AS DOUBLE) / CAST(n AS DOUBLE)) / ln(2))
        |    ORDER BY y)), (a, b) -> a + b) AS hy_raw
        |  FROM cy CROSS JOIN t)
        |SELECT n, round(mi_raw, 6) AS mi_bits,
        |  round(hx_raw, 6) AS h_x, round(hy_raw, 6) AS h_y,
        |  CASE WHEN least(hx_raw, hy_raw) > 0.0 THEN
        |    round(mi_raw / least(hx_raw, hy_raw), 6)
        |  END AS nmi
        |FROM t CROSS JOIN mi CROSS JOIN hx CROSS JOIN hy""".stripMargin,

    // C73: exact integer co/item/basket counts; confidence and lift
    // are one divide each; total order on the rounded lift
    "association_rules" ->
      """WITH lp AS (
        |  SELECT DISTINCT l_orderkey AS ok, l_partkey AS pk FROM lineitem),
        |t AS (SELECT CAST(COUNT(DISTINCT ok) AS BIGINT) AS n_orders FROM lp),
        |i AS (SELECT pk, COUNT(*) AS cnt FROM lp GROUP BY 1),
        |co AS (SELECT a.pk AS u, b.pk AS v, COUNT(*) AS support
        |  FROM lp a JOIN lp b ON a.ok = b.ok AND a.pk <> b.pk
        |  GROUP BY 1, 2 HAVING COUNT(*) >= 2)
        |SELECT u, v, support,
        |  round(CAST(support AS DOUBLE) / CAST(iu.cnt AS DOUBLE), 6)
        |    AS confidence,
        |  round(CAST(support AS DOUBLE) * CAST(n_orders AS DOUBLE)
        |    / (CAST(iu.cnt AS DOUBLE) * CAST(iv.cnt AS DOUBLE)), 6) AS lift
        |FROM co JOIN i iu ON iu.pk = u JOIN i iv ON iv.pk = v
        |CROSS JOIN t
        |ORDER BY lift DESC, u, v LIMIT 50""".stripMargin,

    // D95: byte entropy over the char histogram (ASCII corpus: chars
    // ≡ bytes), terms folded in ascending byte order mirroring the
    // kernel's pinned left-fold; ln(p)/ln(2) composed identically,
    // the libm ulp absorbed by round 6
    "char_entropy" ->
      """WITH ch AS (
        |  SELECT d.doc_id, substr(d.text, i.i + 1, 1) AS c
        |  FROM documents d JOIN range(0, 1024) AS i(i)
        |    ON i.i < length(d.text)),
        |hist AS (SELECT doc_id, c, COUNT(*) AS k FROM ch GROUP BY 1, 2),
        |tot AS (SELECT doc_id, CAST(SUM(k) AS DOUBLE) AS n
        |  FROM hist GROUP BY 1),
        |terms AS (SELECT h.doc_id, h.c,
        |    -((CAST(h.k AS DOUBLE) / t.n)
        |      * (ln(CAST(h.k AS DOUBLE) / t.n) / ln(2))) AS tt
        |  FROM hist h JOIN tot t USING (doc_id)),
        |e AS (SELECT doc_id,
        |    round(list_reduce(list_prepend(0.0, list(tt ORDER BY c)),
        |      (a, b) -> a + b), 6) AS entropy
        |  FROM terms GROUP BY doc_id)
        |SELECT d.doc_id, CAST(strlen(d.text) AS BIGINT) AS n_bytes,
        |  COALESCE(e.entropy, 0.0) AS entropy,
        |  COALESCE(e.entropy, 0.0) BETWEEN 2.0 AND 6.0 AS keep
        |FROM documents d LEFT JOIN e USING (doc_id)
        |ORDER BY d.doc_id""".stripMargin,

    // D94: both raters replayed (quality micro-units — the bootstrap
    // convention — and the Gopher rules), contingency cells exact
    // integers, po/pe/kappa one IEEE evaluation each
    "rater_kappa" ->
      """WITH t AS (
        |  SELECT doc_id, text,
        |    string_split_regex(trim(text), '\s+') AS tk FROM documents),
        |q AS (
        |  SELECT doc_id, text, tk,
        |    CAST(len(tk) AS DOUBLE) AS n,
        |    CAST(len(list_distinct(tk)) AS DOUBLE) AS u,
        |    CAST(len(list_filter(tk, x -> list_contains(
        |      ['the','a','of','and','to','in','is'], x))) AS DOUBLE) AS h
        |  FROM t),
        |v AS (
        |  SELECT doc_id,
        |    CAST(round((0.4 * least(n / 64.0, 1.0) + 0.4 * (u / n)
        |      + 0.2 * least((h / n) * 8.0, 1.0)) * 1000000.0) AS BIGINT)
        |      >= 500000 AS ra,
        |    (len(tk) BETWEEN 40 AND 100000
        |      AND CAST(len(regexp_replace(trim(text), '\s+', '', 'g'))
        |            AS DOUBLE) / CAST(len(tk) AS DOUBLE) BETWEEN 3.0 AND 5.0
        |      AND CAST(len(list_filter(tk, w -> regexp_matches(w, '[a-z]')))
        |            AS DOUBLE) / CAST(len(tk) AS DOUBLE) >= 0.8
        |      AND len(list_filter(tk, w -> list_contains(
        |            ['the', 'a', 'of', 'to', 'and'], w))) >= 1) AS rb
        |  FROM q),
        |c AS (
        |  SELECT CAST(COUNT(*) AS BIGINT) AS n,
        |    CAST(SUM(CASE WHEN COALESCE(ra, false) AND COALESCE(rb, false)
        |      THEN 1 ELSE 0 END) AS BIGINT) AS n11,
        |    CAST(SUM(CASE WHEN COALESCE(ra, false) AND NOT COALESCE(rb, false)
        |      THEN 1 ELSE 0 END) AS BIGINT) AS n10,
        |    CAST(SUM(CASE WHEN NOT COALESCE(ra, false) AND COALESCE(rb, false)
        |      THEN 1 ELSE 0 END) AS BIGINT) AS n01,
        |    CAST(SUM(CASE WHEN NOT COALESCE(ra, false)
        |      AND NOT COALESCE(rb, false) THEN 1 ELSE 0 END) AS BIGINT) AS n00
        |  FROM v),
        |k AS (SELECT n, n11, n10, n01, n00,
        |    CAST(n11 + n00 AS DOUBLE) / n AS po,
        |    (CAST(n11 + n10 AS DOUBLE) * CAST(n11 + n01 AS DOUBLE)
        |      + CAST(n01 + n00 AS DOUBLE) * CAST(n10 + n00 AS DOUBLE))
        |      / (CAST(n AS DOUBLE) * CAST(n AS DOUBLE)) AS pe
        |  FROM c)
        |SELECT n, n11, n10, n01, n00,
        |  CASE WHEN n > 0 THEN round(po, 6) END AS po,
        |  CASE WHEN n > 0 THEN round(pe, 6) END AS pe,
        |  CASE WHEN n > 0 AND pe < 1.0 THEN
        |    round((po - pe) / (1.0 - pe), 6) END AS kappa
        |FROM k""".stripMargin,

    // D68: the Laplace mechanism replayed bit for bit — dense release
    // index over the sorted histogram, portable-XXH64 of the index,
    // top 53 bits → uniform, inverse CDF → deviate; the one `ln` is
    // absorbed by the 6-dp rounding both engines apply (the BM25/LM
    // oracle argument).
    "dp_noisy_counts" -> {
      val inner = xxh64Nested(
        """SELECT lang, source, n_true,
          |  CAST(ROW_NUMBER() OVER (ORDER BY lang, source) AS BIGINT)
          |    AS gid
          |FROM (SELECT lang, source, COUNT(*) AS n_true
          |      FROM documents GROUP BY 1, 2)""".stripMargin, "gid")
      s"""WITH u AS (
         |  SELECT lang, source, n_true,
         |    (CAST(hout // 2048 AS DOUBLE) + 0.5) / 9007199254740992.0
         |      AS uu
         |  FROM ($inner))
         |SELECT lang, source, n_true,
         |  ROUND(CAST(n_true AS DOUBLE) + CASE WHEN uu < 0.5
         |    THEN 1.0 * ln(2.0 * uu)
         |    ELSE -1.0 * ln(2.0 * (1.0 - uu)) END, 6) AS noisy_count
         |FROM u ORDER BY lang, source""".stripMargin
    },

    // D71: reciprocal-rank fusion over three quality legs. Each leg
    // signal reuses an oracle-proven expression tree (D14 composite,
    // D37 CE, D29 trigram dup-frac) — bit-exact values, so the
    // per-lang doc_id-tiebroken rank cuts cannot diverge; the fused
    // sum is three fixed-order correctly-rounded terms, ordered on
    // the ROUNDED value like the D59 fusion.
    "quality_fusion" -> {
      s"""WITH t AS (
         |  SELECT doc_id, lang,
         |    string_split_regex(trim(text), '\\s+') AS tk,
         |    string_split_regex(
         |      regexp_replace(text, '^\\s+|\\s+$$', '', 'g'), '\\s+') AS tk2
         |  FROM documents),
         |q AS (
         |  SELECT doc_id, lang,
         |    0.4 * least(CAST(len(tk) AS DOUBLE) / 64.0, 1.0)
         |    + 0.4 * (CAST(len(list_distinct(tk)) AS DOUBLE)
         |             / CAST(len(tk) AS DOUBLE))
         |    + 0.2 * least((CAST(len(list_filter(tk, x -> list_contains(
         |        ['the','a','of','and','to','in','is'], x))) AS DOUBLE)
         |        / CAST(len(tk) AS DOUBLE)) * 8.0, 1.0) AS quality
         |  FROM t),
         |tok AS (
         |  SELECT doc_id, unnest(string_split_regex(trim(text), '\\s+')) AS w
         |  FROM documents WHERE len(trim(text)) > 0),
         |cnt AS (SELECT w, COUNT(*) AS c FROM tok GROUP BY w),
         |top AS (SELECT w, c FROM cnt ORDER BY c DESC, w LIMIT 64),
         |dnm AS (
         |  SELECT CAST((SELECT SUM(c) FROM cnt)
         |    + (SELECT COUNT(*) FROM top) + 1 AS DOUBLE) AS d),
         |lp AS (
         |  SELECT t2.doc_id,
         |    COALESCE(ln(CAST(tp.c + 1 AS DOUBLE) / d), ln(1.0 / d)) AS lnp
         |  FROM tok t2 LEFT JOIN top tp USING (w), dnm),
         |sc AS (SELECT doc_id, COUNT(*) AS nt, SUM(lnp) AS sl
         |       FROM lp GROUP BY doc_id),
         |ce AS (
         |  SELECT t.doc_id, t.lang,
         |    COALESCE(round(-sl / nt, 6), CAST(0 AS DOUBLE)) AS ce
         |  FROM t LEFT JOIN sc USING (doc_id)),
         |tg AS (
         |  SELECT doc_id, lang,
         |    list_transform(range(1, greatest(len(tk2) - 1, 1)),
         |      i -> tk2[i] || ' ' || tk2[i+1] || ' ' || tk2[i+2]) AS g
         |  FROM t),
         |rep AS (
         |  SELECT doc_id, lang,
         |    CASE WHEN len(g) = 0 THEN 0.0
         |         ELSE CAST(len(g) - len(list_distinct(g)) AS DOUBLE)
         |              / CAST(len(g) AS DOUBLE) END AS rep
         |  FROM tg),
         |lq AS (
         |  SELECT lang, doc_id, CAST(row_number() OVER (PARTITION BY lang
         |    ORDER BY quality DESC, doc_id) AS INTEGER) AS rq
         |  FROM q QUALIFY rq <= 100),
         |lc AS (
         |  SELECT lang, doc_id, CAST(row_number() OVER (PARTITION BY lang
         |    ORDER BY ce ASC, doc_id) AS INTEGER) AS rc
         |  FROM ce QUALIFY rc <= 100),
         |lr AS (
         |  SELECT lang, doc_id, CAST(row_number() OVER (PARTITION BY lang
         |    ORDER BY rep ASC, doc_id) AS INTEGER) AS rr
         |  FROM rep QUALIFY rr <= 100),
         |f AS (
         |  SELECT lang, doc_id, rq, rc, rr,
         |    ROUND(COALESCE(1.0 / (60.0 + rq), 0.0)
         |      + COALESCE(1.0 / (60.0 + rc), 0.0)
         |      + COALESCE(1.0 / (60.0 + rr), 0.0), 9) AS fused
         |  FROM lq FULL OUTER JOIN lc USING (lang, doc_id)
         |    FULL OUTER JOIN lr USING (lang, doc_id))
         |SELECT lang, doc_id, rq, rc, rr, fused,
         |  CAST(rk AS INTEGER) AS rk
         |FROM (SELECT *, row_number() OVER (PARTITION BY lang
         |  ORDER BY fused DESC, doc_id) AS rk FROM f)
         |WHERE rk <= 20 ORDER BY lang, rk""".stripMargin
    },

    // D57: containment = c / min(na, nb) — one divide of exact
    // integers, bit-identical cross-engine; shingles are the D17
    // trigram definition verbatim.
    "dedup_containment" ->
      """WITH t AS (SELECT doc_id,
        |    string_split_regex(trim(text), '\s+') AS tk FROM documents),
        |s AS (SELECT doc_id, list_distinct(list_transform(range(1, len(tk) - 1),
        |  i -> tk[i] || ' ' || tk[i+1] || ' ' || tk[i+2])) AS sh FROM t),
        |ex AS (SELECT doc_id, len(sh) AS n, unnest(sh) AS shingle FROM s),
        |pairs AS (
        |  SELECT a.doc_id AS id_a, b.doc_id AS id_b, count(*) AS c,
        |    any_value(a.n) AS na, any_value(b.n) AS nb
        |  FROM ex a JOIN ex b ON a.shingle = b.shingle AND b.doc_id > a.doc_id
        |  GROUP BY 1, 2)
        |SELECT id_a, id_b,
        |  CAST(c AS DOUBLE) / CAST(LEAST(na, nb) AS DOUBLE) AS containment
        |FROM pairs
        |WHERE CAST(c AS DOUBLE) / CAST(LEAST(na, nb) AS DOUBLE) >= 0.8
        |ORDER BY id_a, id_b""".stripMargin,

    // D56: closed-form naive-Bayes log-odds classifier. Counts, the
    // top-128 vocab cut (ties by word), and class totals are exact
    // integers — both engines derive the SAME model; ln drift +
    // double-sum reorder absorbed by the 6-dp rounding (the LM
    // oracle argument). `predicted` compares the ROUNDED margin, so
    // the boolean is a function of the already-hash-checked value.
    "quality_classifier" ->
      """WITH tok AS (
        |  SELECT doc_id, (source = 'src0') AS pos,
        |    unnest(string_split_regex(trim(text), '\s+')) AS w
        |  FROM documents WHERE len(trim(text)) > 0),
        |cnt AS (SELECT w, COUNT(*) AS c,
        |    COUNT(*) FILTER (pos) AS cp FROM tok GROUP BY w),
        |top AS (SELECT w, cp, c - cp AS cn FROM cnt ORDER BY c DESC, w LIMIT 128),
        |tot AS (SELECT
        |    CAST(COALESCE((SELECT SUM(cp) FROM cnt), 0)
        |      + (SELECT COUNT(*) FROM top) + 1 AS DOUBLE) AS denp,
        |    CAST(COALESCE((SELECT SUM(c - cp) FROM cnt), 0)
        |      + (SELECT COUNT(*) FROM top) + 1 AS DOUBLE) AS denn),
        |bias AS (SELECT
        |    ln(CAST((SELECT COUNT(*) FILTER (source = 'src0')
        |             FROM documents) + 1 AS DOUBLE))
        |  - ln(CAST((SELECT COUNT(*) FILTER (source <> 'src0')
        |             FROM documents) + 1 AS DOUBLE)) AS b),
        |lp AS (
        |  SELECT t.doc_id,
        |    COALESCE(ln(CAST(tp.cp + 1 AS DOUBLE) / denp)
        |           - ln(CAST(tp.cn + 1 AS DOUBLE) / denn),
        |      ln(1.0 / denp) - ln(1.0 / denn)) AS wt
        |  FROM tok t LEFT JOIN top tp USING (w), tot),
        |s AS (SELECT doc_id, COUNT(*) AS nt, SUM(wt) AS sw
        |      FROM lp GROUP BY doc_id)
        |SELECT d.doc_id,
        |  CAST(COALESCE(nt, 0) AS INTEGER) AS n_tokens,
        |  round(b + COALESCE(sw, 0.0), 6) AS margin,
        |  round(b + COALESCE(sw, 0.0), 6) > 0 AS predicted
        |FROM documents d LEFT JOIN s USING (doc_id), bias
        |ORDER BY d.doc_id""".stripMargin,

    // D55: fixed 64-char windows, stride 48; chunk count =
    // (max(0, n-64) + 47) DIV 48 + 1 — positive integer division, so
    // truncating (Spark DIV) ≡ floor (DuckDB //).
    "doc_chunking" ->
      """WITH n AS (
        |  SELECT doc_id, text,
        |    unnest(range(0, (greatest(length(text) - 64, 0) + 47) // 48 + 1)) AS k
        |  FROM documents WHERE length(text) > 0)
        |SELECT doc_id, CAST(k AS INTEGER) AS chunk_id,
        |  CAST(k * 48 AS INTEGER) AS chunk_start,
        |  substring(text, CAST(k * 48 + 1 AS INTEGER), 64) AS chunk_text,
        |  CAST(length(substring(text, CAST(k * 48 + 1 AS INTEGER), 64))
        |    AS INTEGER) AS chunk_len
        |FROM n ORDER BY doc_id, chunk_id""".stripMargin,

    "paragraph_dedup" -> paragraphDedupSql,
    "stream_boilerplate_strip" -> paragraphDedupSql,

    // C39: same C8 session CTE; the sweep line runs per day with
    // carry-in from a calendar join (equivalent to the Spark side's
    // midnight explode: calendar day D counts a session iff
    // t_start < D <= t_end).
    // C64: the distributed sort-scan keeps a row iff no strictly-
    // earlier row in (x asc, y desc, id) order has y >= it — exactly
    // the dominance predicate plus the least-id duplicate tiebreak;
    // dominance compares STORED values only, so doubles are bit-safe
    "pareto_frontier" ->
      """SELECT p_partkey, p_retailprice, p_size FROM part t
        |WHERE NOT EXISTS (SELECT 1 FROM part e WHERE
        |  (e.p_retailprice < t.p_retailprice AND e.p_size >= t.p_size) OR
        |  (e.p_retailprice <= t.p_retailprice AND e.p_size > t.p_size) OR
        |  (e.p_retailprice = t.p_retailprice AND e.p_size = t.p_size
        |   AND e.p_partkey < t.p_partkey))
        |ORDER BY p_partkey""".stripMargin,

    "peak_concurrency" ->
      """WITH e AS (
        |  SELECT user_id, ts, event_id,
        |    CASE WHEN lag(ts) OVER w IS NULL
        |              OR ts - lag(ts) OVER w > INTERVAL 4 HOUR
        |         THEN 1 ELSE 0 END AS flag
        |  FROM events WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
        |s0 AS (
        |  SELECT user_id, ts, SUM(flag) OVER (
        |    PARTITION BY user_id ORDER BY ts, event_id
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS sid
        |  FROM e),
        |s AS (SELECT user_id, sid, MIN(ts) AS t_start, MAX(ts) AS t_end
        |  FROM s0 GROUP BY 1, 2),
        |d AS (SELECT date_trunc('day', t) AS day, t, d FROM (
        |  SELECT t_start AS t, 1 AS d FROM s
        |  UNION ALL SELECT t_end, -1 FROM s)),
        |r AS (SELECT day, SUM(d) OVER (PARTITION BY day ORDER BY t, d
        |  ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS run FROM d),
        |m AS (SELECT day, MAX(run) AS mr FROM r GROUP BY day),
        |cal AS (SELECT DISTINCT date_trunc('day', ts) AS day FROM events),
        |carry AS (SELECT cal.day, COUNT(*) AS c
        |  FROM s JOIN cal ON cal.day > s.t_start AND cal.day <= s.t_end
        |  GROUP BY 1)
        |SELECT CAST(COALESCE(m.day, carry.day) AS TIMESTAMP) AS day,
        |  CAST(COALESCE(carry.c, 0)
        |    + greatest(0, COALESCE(m.mr, 0)) AS BIGINT) AS peak
        |FROM m FULL OUTER JOIN carry ON m.day = carry.day
        |ORDER BY day""".stripMargin,

    // C38: thresholds off the per-type cumulative bucket histogram;
    // lo/hi are integer buckets so the /100.0 divides and the clamp
    // are identically-rounded doubles on both engines.
    "events_winsorize" ->
      """WITH b AS (SELECT event_id, event_type, value,
        |    CAST(floor(value * 100.0) AS BIGINT) AS bk FROM events),
        |h AS (SELECT event_type, bk, COUNT(*) AS c FROM b GROUP BY 1, 2),
        |cumt AS (SELECT event_type, bk,
        |    SUM(c) OVER (PARTITION BY event_type ORDER BY bk
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum,
        |    SUM(c) OVER (PARTITION BY event_type) AS total
        |  FROM h),
        |thr AS (SELECT event_type,
        |    MIN(CASE WHEN cum >= 0.05 * total THEN bk END) AS lo,
        |    MIN(CASE WHEN cum >= 0.95 * total THEN bk END) AS hi
        |  FROM cumt GROUP BY 1)
        |SELECT event_id, b.event_type, value,
        |  least(greatest(value, lo / 100.0), hi / 100.0) AS clipped
        |FROM b JOIN thr USING (event_type)
        |ORDER BY event_id""".stripMargin,

    // C59: decile boundaries off the same cent-bucket histogram; the
    // per-event decile is an all-integer fold over the nine broadcast
    // thresholds, so no double boundary can diverge
    "quantile_buckets" -> {
      val bs = (1 to 9).map(d =>
        s"MIN(CASE WHEN cum >= ${d / 10.0} * total THEN bk END) AS b$d")
        .mkString(",\n    ")
      val fold = (1 to 9).map(d =>
        s"(CASE WHEN bk > b$d THEN 1 ELSE 0 END)").mkString(" + ")
      s"""WITH b AS (SELECT event_id, event_type, value,
         |    CAST(floor(value * 100.0) AS BIGINT) AS bk FROM events),
         |h AS (SELECT event_type, bk, COUNT(*) AS c FROM b GROUP BY 1, 2),
         |cumt AS (SELECT event_type, bk,
         |    SUM(c) OVER (PARTITION BY event_type ORDER BY bk
         |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum,
         |    SUM(c) OVER (PARTITION BY event_type) AS total
         |  FROM h),
         |thr AS (SELECT event_type,
         |    $bs
         |  FROM cumt GROUP BY 1)
         |SELECT event_id, b.event_type, value,
         |  CAST(1 + $fold AS INTEGER) AS decile
         |FROM b JOIN thr USING (event_type)
         |ORDER BY event_id""".stripMargin
    },

    // C72: micro-unit integer AA weights (round(1e6/ln d) — the one
    // libm ln sits inside a per-term rounding both engines apply),
    // pair scores exact integer sums, total-order top-20
    "adamic_adar_links" ->
      """WITH m AS (SELECT DISTINCT o_custkey AS l, l_suppkey AS r
        |  FROM orders JOIN lineitem ON o_orderkey = l_orderkey),
        |deg AS (SELECT l, COUNT(*) AS d FROM m GROUP BY 1
        |  HAVING COUNT(*) >= 2 AND COUNT(*) <= 10000),
        |w AS (SELECT l,
        |    CAST(round(1000000.0 / ln(CAST(d AS DOUBLE))) AS BIGINT) AS w
        |  FROM deg),
        |mw AS (SELECT m.l, m.r, w.w FROM m JOIN w USING (l)),
        |wedge AS (SELECT x.r AS a, y.r AS b, x.w
        |  FROM mw x JOIN mw y ON x.l = y.l AND x.r < y.r),
        |p AS (SELECT a, b, CAST(COUNT(*) AS BIGINT) AS common_neighbors,
        |    SUM(w) AS aa FROM wedge GROUP BY 1, 2)
        |SELECT a, b, common_neighbors,
        |  CAST(aa AS DOUBLE) / 1000000.0 AS aa_score
        |FROM p ORDER BY aa DESC, a, b LIMIT 20""".stripMargin,

    // D103: first-occurrence vocab growth at 10 integer thresholds,
    // OLS chain in the same textual order as the Spark reduceLeft
    "heaps_law_fit" -> heapsOracle,

    // D106: exact cumulative integers per candidate, one IEEE
    // impurity evaluation each, argmin on the 6-dp-rounded value
    // with the smallest threshold breaking ties
    "best_length_split" ->
      """WITH t AS (
        |  SELECT string_split_regex(trim(text), '\s+') AS tk, text
        |  FROM documents),
        |v AS (
        |  SELECT CAST(len(tk) AS BIGINT) AS f,
        |    (len(tk) BETWEEN 40 AND 100000
        |      AND CAST(len(regexp_replace(trim(text), '\s+', '', 'g'))
        |            AS DOUBLE) / CAST(len(tk) AS DOUBLE) BETWEEN 3.0 AND 5.0
        |      AND CAST(len(list_filter(tk, w -> regexp_matches(w, '[a-z]')))
        |            AS DOUBLE) / CAST(len(tk) AS DOUBLE) >= 0.8
        |      AND len(list_filter(tk, w -> list_contains(
        |            ['the', 'a', 'of', 'to', 'and'], w))) >= 1) AS l
        |  FROM t),
        |g AS (SELECT f, COUNT(*) AS c,
        |    SUM(CASE WHEN l THEN 1 ELSE 0 END) AS p FROM v GROUP BY 1),
        |cu AS (SELECT f,
        |    SUM(c) OVER w AS cn, SUM(p) OVER w AS cp
        |  FROM g WINDOW w AS (ORDER BY f
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)),
        |tt AS (SELECT CAST(SUM(c) AS BIGINT) AS n,
        |    CAST(SUM(p) AS BIGINT) AS np FROM g),
        |s AS (SELECT f,
        |    round(2.0 * CAST(cp AS DOUBLE)
        |        * (CAST(cn AS DOUBLE) - CAST(cp AS DOUBLE))
        |        / (CAST(n AS DOUBLE) * CAST(cn AS DOUBLE))
        |      + 2.0 * (CAST(np AS DOUBLE) - CAST(cp AS DOUBLE))
        |        * ((CAST(n AS DOUBLE) - CAST(cn AS DOUBLE))
        |          - (CAST(np AS DOUBLE) - CAST(cp AS DOUBLE)))
        |        / (CAST(n AS DOUBLE)
        |          * (CAST(n AS DOUBLE) - CAST(cn AS DOUBLE))), 6) AS gini,
        |    n, np
        |  FROM cu CROSS JOIN tt WHERE cn < n),
        |m AS (SELECT MIN(gini) AS mn FROM s)
        |SELECT MIN(f) AS threshold, MAX(gini) AS gini_split,
        |  MAX(n) AS n, MAX(np) AS n_pos,
        |  round(2.0 * CAST(MAX(np) AS DOUBLE)
        |    * CAST(MAX(n) - MAX(np) AS DOUBLE)
        |    / (CAST(MAX(n) AS DOUBLE) * CAST(MAX(n) AS DOUBLE)), 6)
        |    AS gini_root
        |FROM s CROSS JOIN m WHERE gini = mn""".stripMargin,

    // D105: half-unit average ranks (2·cum − c + 1) per variable,
    // exact sums, rho one IEEE evaluation (pinned parenthesization)
    "spearman_signals" ->
      """WITH t AS (
        |  SELECT doc_id, string_split_regex(trim(text), '\s+') AS tk
        |  FROM documents),
        |c AS (
        |  SELECT doc_id,
        |    CAST(len(tk) AS DOUBLE) AS n,
        |    CAST(len(list_distinct(tk)) AS DOUBLE) AS u,
        |    CAST(len(list_filter(tk, x -> list_contains(
        |      ['the','a','of','and','to','in','is'], x))) AS DOUBLE) AS h
        |  FROM t),
        |v AS (
        |  SELECT CAST(n AS BIGINT) AS x,
        |    CAST(round((0.4 * least(n / 64.0, 1.0) + 0.4 * (u / n)
        |      + 0.2 * least((h / n) * 8.0, 1.0)) * 1000000.0) AS BIGINT)
        |      AS y
        |  FROM c),
        |rx AS (SELECT x, 2 * SUM(COUNT(*)) OVER (ORDER BY x
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
        |    - COUNT(*) + 1 AS xr2 FROM v GROUP BY x),
        |ry AS (SELECT y, 2 * SUM(COUNT(*)) OVER (ORDER BY y
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
        |    - COUNT(*) + 1 AS yr2 FROM v GROUP BY y),
        |j AS (SELECT xr2, yr2 FROM v JOIN rx USING (x) JOIN ry USING (y)),
        |a AS (SELECT CAST(COUNT(*) AS BIGINT) AS n,
        |    CAST(SUM(xr2) AS DOUBLE) AS sx, CAST(SUM(yr2) AS DOUBLE) AS sy,
        |    CAST(SUM(CAST(xr2 AS HUGEINT) * yr2) AS DOUBLE) AS sxy,
        |    CAST(SUM(CAST(xr2 AS HUGEINT) * xr2) AS DOUBLE) AS sxx,
        |    CAST(SUM(CAST(yr2 AS HUGEINT) * yr2) AS DOUBLE) AS syy
        |  FROM j)
        |SELECT n,
        |  CASE WHEN CAST(n AS DOUBLE) * sxx - sx * sx > 0.0
        |        AND CAST(n AS DOUBLE) * syy - sy * sy > 0.0 THEN
        |    round((CAST(n AS DOUBLE) * sxy - sx * sy)
        |      / (sqrt(CAST(n AS DOUBLE) * sxx - sx * sx)
        |        * sqrt(CAST(n AS DOUBLE) * syy - sy * sy)), 6)
        |  END AS rho
        |FROM a""".stripMargin,

    // C81: Apriori level-1 prune, exact counts, total-order top-30
    "frequent_triples" ->
      """WITH lp AS MATERIALIZED (
        |  SELECT DISTINCT l_orderkey AS ok, l_partkey AS pk FROM lineitem),
        |fi AS MATERIALIZED (
        |  SELECT pk FROM lp GROUP BY pk HAVING COUNT(*) >= 2),
        |pr AS MATERIALIZED (SELECT lp.ok, lp.pk FROM lp JOIN fi USING (pk))
        |SELECT a.pk AS u, b.pk AS v, c.pk AS w,
        |  CAST(COUNT(*) AS BIGINT) AS support
        |FROM pr a JOIN pr b ON a.ok = b.ok AND a.pk < b.pk
        |  JOIN pr c ON a.ok = c.ok AND b.pk < c.pk
        |GROUP BY 1, 2, 3 HAVING COUNT(*) >= 2
        |ORDER BY support DESC, u, v, w LIMIT 30""".stripMargin,

    // C80: cross-multiplied integer gap argmax (earliest value on
    // ties), D one divide, threshold compare on the unrounded D
    "ab_ks_test" ->
      """WITH p AS (SELECT user_id % 2 AS arm, value AS v
        |  FROM events WHERE event_type = 'purchase'),
        |g AS (SELECT v,
        |    SUM(CASE WHEN arm = 0 THEN 1 ELSE 0 END) AS c0,
        |    SUM(CASE WHEN arm = 1 THEN 1 ELSE 0 END) AS c1
        |  FROM p GROUP BY 1),
        |c AS (SELECT v,
        |    SUM(c0) OVER w AS cum0, SUM(c1) OVER w AS cum1
        |  FROM g WINDOW w AS (ORDER BY v
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)),
        |t AS (SELECT CAST(SUM(c0) AS BIGINT) AS n0,
        |    CAST(SUM(c1) AS BIGINT) AS n1 FROM g),
        |s AS (SELECT v,
        |    ABS(CAST(cum0 AS HUGEINT) * n1 - CAST(cum1 AS HUGEINT) * n0)
        |      AS gap, n0, n1
        |  FROM c CROSS JOIN t),
        |m AS (SELECT MAX(gap) AS mx FROM s)
        |SELECT MAX(n0) AS n_a, MAX(n1) AS n_b,
        |  MIN(v) AS ks_at_value,
        |  round(CAST(MAX(gap) AS DOUBLE)
        |    / (CAST(MAX(n0) AS DOUBLE) * CAST(MAX(n1) AS DOUBLE)), 6)
        |    AS ks_stat,
        |  CAST(MAX(gap) AS DOUBLE)
        |    / (CAST(MAX(n0) AS DOUBLE) * CAST(MAX(n1) AS DOUBLE))
        |    > 1.358 * sqrt(CAST(MAX(n0) + MAX(n1) AS DOUBLE)
        |      / (CAST(MAX(n0) AS DOUBLE) * CAST(MAX(n1) AS DOUBLE)))
        |    AS reject_05
        |FROM s CROSS JOIN m WHERE gap = mx""".stripMargin,

    // C79: first digit off the cents integer's decimal string (no
    // float log in the decision path); the expected probabilities are
    // the SAME Scala-rendered double constants on both sides
    "benford_audit" -> {
      val e = (1 to 9).map(d =>
        s"WHEN digit = $d THEN CAST(${math.log10(1.0 + 1.0 / d)} AS DOUBLE)")
        .mkString(" ")
      s"""WITH c AS (SELECT CAST(substr(CAST(
         |    CAST(CAST(l_extendedprice AS DECIMAL(18,2)) * 100 AS BIGINT)
         |    AS VARCHAR), 1, 1) AS INTEGER) AS digit
         |  FROM lineitem),
         |g AS (SELECT digit, CAST(COUNT(*) AS BIGINT) AS n FROM c
         |  WHERE digit >= 1 GROUP BY 1),
         |t AS (SELECT CAST(SUM(n) AS BIGINT) AS tot FROM g),
         |x AS (SELECT digit, n, tot, CASE $e END AS pe
         |  FROM g CROSS JOIN t)
         |SELECT digit, n, round(pe, 6) AS p_expected,
         |  round(CAST(n AS DOUBLE) / CAST(tot AS DOUBLE), 6) AS p_observed,
         |  round(pow(CAST(n AS DOUBLE) - CAST(tot AS DOUBLE) * pe, 2)
         |    / (CAST(tot AS DOUBLE) * pe), 6) AS chi2_term
         |FROM x ORDER BY digit""".stripMargin
    },

    // C78: exact integer day-series sums per lag, Pearson one IEEE
    // evaluation with pinned parenthesization
    "lead_lag_correlation" ->
      """WITH daily AS (SELECT CAST(date_trunc('day', ts) AS DATE) AS day,
        |    CAST(SUM(CASE WHEN event_type = 'signup' THEN 1 ELSE 0 END)
        |      AS BIGINT) AS x,
        |    CAST(COALESCE(SUM(CASE WHEN event_type = 'purchase'
        |      THEN CAST(value AS DECIMAL(18,2)) * 100 END), 0) AS BIGINT)
        |      AS y
        |  FROM events GROUP BY 1),
        |lags AS (SELECT CAST(unnest(range(-3, 4)) AS INTEGER) AS lag),
        |j AS (SELECT lag, a.x AS x, b.y AS y
        |  FROM daily a CROSS JOIN lags JOIN daily b
        |    ON a.day + to_days(lag) = b.day),
        |g AS (SELECT lag, CAST(COUNT(*) AS BIGINT) AS n_days,
        |    CAST(SUM(x) AS DOUBLE) AS sx, CAST(SUM(y) AS DOUBLE) AS sy,
        |    CAST(SUM(CAST(x AS HUGEINT) * y) AS DOUBLE) AS sxy,
        |    CAST(SUM(CAST(x AS HUGEINT) * x) AS DOUBLE) AS sxx,
        |    CAST(SUM(CAST(y AS HUGEINT) * y) AS DOUBLE) AS syy
        |  FROM j GROUP BY 1)
        |SELECT lag, n_days,
        |  CASE WHEN CAST(n_days AS DOUBLE) * sxx - sx * sx > 0.0
        |        AND CAST(n_days AS DOUBLE) * syy - sy * sy > 0.0 THEN
        |    round((CAST(n_days AS DOUBLE) * sxy - sx * sy)
        |      / (sqrt(CAST(n_days AS DOUBLE) * sxx - sx * sx)
        |        * sqrt(CAST(n_days AS DOUBLE) * syy - sy * sy)), 6)
        |  END AS r
        |FROM g ORDER BY lag""".stripMargin,

    // C77: user-partitioned lead pairs, exact integer cells, one
    // divide per probability
    "event_transitions" ->
      """WITH p AS (SELECT user_id, ts, event_id, event_type AS cur,
        |    lead(event_type, 1) OVER (PARTITION BY user_id
        |      ORDER BY ts, event_id) AS nxt
        |  FROM events),
        |c AS (SELECT cur, nxt, CAST(COUNT(*) AS BIGINT) AS n FROM p
        |  WHERE nxt IS NOT NULL GROUP BY 1, 2),
        |t AS (SELECT cur, SUM(n) AS tot FROM c GROUP BY 1)
        |SELECT c.cur, c.nxt, c.n,
        |  round(CAST(c.n AS DOUBLE) / CAST(tot AS DOUBLE), 6) AS p
        |FROM c JOIN t USING (cur)
        |ORDER BY cur, nxt""".stripMargin,

    // D102: the D13 lang-id CTE verbatim as predictions, exact cells
    "langid_confusion" ->
      """WITH t AS (
        |  SELECT doc_id, lang,
        |    string_split_regex(trim(text), '\s+') AS tk FROM documents),
        |h AS (
        |  SELECT doc_id, lang,
        |    len(list_filter(tk, x -> list_contains(['the','a','of','and','to','in','is'], x))) AS he,
        |    len(list_filter(tk, x -> list_contains(['le','la','et','les','des','un','une'], x))) AS hf,
        |    len(list_filter(tk, x -> list_contains(['der','die','und','das','ein','nicht'], x))) AS hd,
        |    len(list_filter(tk, x -> list_contains(['el','los','y','que','un','una','en'], x))) AS hs
        |  FROM t),
        |pr AS (SELECT lang AS true_lang,
        |    CASE WHEN greatest(he, hf, hd, hs) = 0 THEN 'und'
        |         WHEN he = greatest(he, hf, hd, hs) THEN 'en'
        |         WHEN hf = greatest(he, hf, hd, hs) THEN 'fr'
        |         WHEN hd = greatest(he, hf, hd, hs) THEN 'de'
        |         ELSE 'es' END AS pred_lang
        |  FROM h),
        |c AS (SELECT true_lang, pred_lang, CAST(COUNT(*) AS BIGINT) AS n
        |  FROM pr GROUP BY 1, 2),
        |tt AS (SELECT true_lang, SUM(n) AS tot FROM c GROUP BY 1)
        |SELECT c.true_lang, c.pred_lang, c.n,
        |  round(CAST(c.n AS DOUBLE) / CAST(tot AS DOUBLE), 6) AS share
        |FROM c JOIN tt USING (true_lang)
        |ORDER BY true_lang, pred_lang""".stripMargin,

    // C76: the oracle is DuckDB's BUILT-IN jaro_winkler_similarity —
    // an independent implementation of the same Winkler-1990
    // convention (window ⌊max/2⌋−1, halved transpositions, ≤4-char
    // prefix at 0.1, 0.7 boost threshold); 6-dp rounding on both
    // sides absorbs the ulp between the two codebases
    "jaro_winkler_links" ->
      """WITH p AS (SELECT p_partkey AS pk, p_name AS name,
        |    substr(p_name, 1, 8) AS blk FROM part)
        |SELECT a.pk AS id_a, b.pk AS id_b,
        |  a.name AS name_a, b.name AS name_b,
        |  round(jaro_winkler_similarity(a.name, b.name), 6) AS jw
        |FROM p a JOIN p b ON a.blk = b.blk AND a.pk < b.pk
        |WHERE round(jaro_winkler_similarity(a.name, b.name), 6) >= 0.94
        |ORDER BY jw DESC, id_a, id_b LIMIT 50""".stripMargin,

    // C75: per-time (deaths, leavers) exact integers; at-risk via the
    // exclusive cumulative over the day domain; the survival product
    // folds in pinned time order with seed 1.0, each factor one IEEE
    // divide — list_reduce mirrors the association
    "km_retention" ->
      """WITH u AS (SELECT user_id,
        |    CAST(min(date_trunc('day', ts)) AS DATE) AS fd,
        |    CAST(max(date_trunc('day', ts)) AS DATE) AS ld,
        |    CAST(min(CASE WHEN event_type = 'error'
        |      THEN date_trunc('day', ts) END) AS DATE) AS ed
        |  FROM events GROUP BY 1),
        |s AS (SELECT CAST(CASE WHEN ed IS NOT NULL
        |      THEN date_diff('day', fd, ed)
        |      ELSE date_diff('day', fd, ld) END AS BIGINT) AS t,
        |    (ed IS NULL) AS cens FROM u),
        |bt AS (SELECT t,
        |    CAST(SUM(CASE WHEN NOT cens THEN 1 ELSE 0 END) AS BIGINT) AS d,
        |    CAST(COUNT(*) AS BIGINT) AS leave
        |  FROM s GROUP BY 1),
        |n AS (SELECT CAST(COUNT(*) AS BIGINT) AS total FROM s),
        |r AS (SELECT t, d,
        |    total - COALESCE(SUM(leave) OVER (ORDER BY t
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
        |      AS n_risk
        |  FROM bt CROSS JOIN n),
        |dr AS (SELECT t, CAST(n_risk AS BIGINT) AS n_risk, d
        |  FROM r WHERE d >= 1)
        |SELECT a.t, a.n_risk, a.d AS d_events,
        |  round(list_reduce(list_prepend(1.0,
        |    list(CAST(b.n_risk - b.d AS DOUBLE) / CAST(b.n_risk AS DOUBLE)
        |      ORDER BY b.t)),
        |    (x, y) -> x * y), 6) AS survival
        |FROM dr a JOIN dr b ON b.t <= a.t
        |GROUP BY a.t, a.n_risk, a.d
        |ORDER BY a.t""".stripMargin,

    // C74: goodness-of-fit vs the designed 50/50 split reduces to
    // (n_a − n_b)²/N — one IEEE evaluation over exact counts; flag
    // compares the UNROUNDED statistic to the 1-dof 5% critical value
    "ab_srm_check" ->
      """WITH c AS (SELECT
        |    CAST(SUM(CASE WHEN user_id % 2 = 0 THEN 1 ELSE 0 END)
        |      AS BIGINT) AS n_a,
        |    CAST(SUM(CASE WHEN user_id % 2 = 1 THEN 1 ELSE 0 END)
        |      AS BIGINT) AS n_b
        |  FROM events)
        |SELECT n_a, n_b,
        |  CASE WHEN n_a + n_b > 0 THEN
        |    round(CAST(n_a - n_b AS DOUBLE) * CAST(n_a - n_b AS DOUBLE)
        |      / CAST(n_a + n_b AS DOUBLE), 6) END AS chi2,
        |  CASE WHEN n_a + n_b > 0 THEN
        |    CAST(n_a - n_b AS DOUBLE) * CAST(n_a - n_b AS DOUBLE)
        |      / CAST(n_a + n_b AS DOUBLE) > 3.841 END AS srm_flag
        |FROM c""".stripMargin,

    // D100: the quality CTE's 2-dp buckets; per-source and global
    // cumulative histograms; the mapping is the CROSS-MULTIPLIED
    // integer compare — no double enters the decision
    "quality_quantile_norm" ->
      """WITH t AS (
        |  SELECT doc_id, source,
        |    string_split_regex(trim(text), '\s+') AS tk FROM documents),
        |c AS (
        |  SELECT doc_id, source,
        |    CAST(len(tk) AS DOUBLE) AS n,
        |    CAST(len(list_distinct(tk)) AS DOUBLE) AS u,
        |    CAST(len(list_filter(tk, x -> list_contains(
        |      ['the','a','of','and','to','in','is'], x))) AS DOUBLE) AS h
        |  FROM t),
        |q AS (
        |  SELECT source,
        |    CAST(floor((0.4 * least(n / 64.0, 1.0) + 0.4 * (u / n)
        |      + 0.2 * least((h / n) * 8.0, 1.0)) * 100.0) AS BIGINT)
        |      AS bucket
        |  FROM c),
        |sc AS (SELECT source, bucket, COUNT(*) AS n FROM q GROUP BY 1, 2),
        |scum AS (SELECT source, bucket, n,
        |    SUM(n) OVER (PARTITION BY source ORDER BY bucket
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS src_cum,
        |    SUM(n) OVER (PARTITION BY source) AS src_n
        |  FROM sc),
        |g AS (SELECT bucket AS gb, SUM(n) AS gn FROM sc GROUP BY 1),
        |gcum AS (SELECT gb,
        |    SUM(gn) OVER (ORDER BY gb
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS g_cum,
        |    SUM(gn) OVER () AS g_n
        |  FROM g)
        |SELECT source, bucket, CAST(n AS BIGINT) AS n,
        |  CAST(src_cum AS BIGINT) AS src_cum,
        |  MIN(gb) AS norm_bucket
        |FROM scum JOIN gcum
        |  ON CAST(g_cum AS HUGEINT) * CAST(src_n AS HUGEINT)
        |    >= CAST(src_cum AS HUGEINT) * CAST(g_n AS HUGEINT)
        |GROUP BY 1, 2, 3, 4
        |ORDER BY source, bucket""".stripMargin,

    // D99: integer word/sentence/syllable counters (same regex
    // semantics both engines), two one-evaluation scores
    "readability_scores" ->
      """WITH c AS (SELECT doc_id,
        |    CAST(len(string_split_regex(trim(text), '\s+')) AS BIGINT)
        |      AS n_words,
        |    CAST(greatest(len(regexp_extract_all(text, '[.!?]')), 1)
        |      AS BIGINT) AS n_sentences,
        |    CAST(len(regexp_extract_all(lower(text), '[aeiouy]+'))
        |      AS BIGINT) AS n_syllables
        |  FROM documents)
        |SELECT doc_id, n_words, n_sentences, n_syllables,
        |  round(206.835
        |    - 1.015 * (CAST(n_words AS DOUBLE) / CAST(n_sentences AS DOUBLE))
        |    - 84.6 * (CAST(n_syllables AS DOUBLE) / CAST(n_words AS DOUBLE)),
        |    6) AS flesch,
        |  round(0.39 * (CAST(n_words AS DOUBLE) / CAST(n_sentences AS DOUBLE))
        |    + 11.8 * (CAST(n_syllables AS DOUBLE) / CAST(n_words AS DOUBLE))
        |    - 15.59, 6) AS fk_grade
        |FROM c ORDER BY doc_id""".stripMargin,

    // D98: Gini via the rank formula (integer numerator — rank·count
    // in exact decimal, tie order irrelevant to the sum), HHI and
    // top-share one divide each
    "source_concentration" -> sourceConcentrationSql,
    // E25 stream face: merged additive group counts + the same
    // finisher == the batch query exactly
    "stream_source_concentration" -> sourceConcentrationSql,

    // C70: the D-scaled deviation cumsum S_i = D·cum_i − i·N is an
    // exact integer (HUGEINT ↔ decimal(38,0)), so the argmax and the
    // earliest-step tie-break are all-integer decisions; |S|/D and
    // N/D are one IEEE divide each
    "cusum_changepoint" ->
      """WITH daily AS (SELECT event_type,
        |    CAST(date_trunc('day', ts) AS DATE) AS day, COUNT(*) AS n
        |  FROM events GROUP BY 1, 2),
        |c AS (SELECT event_type, day,
        |    CAST(ROW_NUMBER() OVER (PARTITION BY event_type ORDER BY day)
        |      AS HUGEINT) AS i,
        |    SUM(CAST(n AS HUGEINT)) OVER (PARTITION BY event_type
        |      ORDER BY day ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
        |      AS cum
        |  FROM daily),
        |t AS (SELECT event_type, COUNT(*) AS d,
        |    SUM(CAST(n AS HUGEINT)) AS ntot FROM daily GROUP BY 1),
        |s AS (SELECT c.event_type, c.day, t.d, t.ntot,
        |    CAST(t.d AS HUGEINT) * c.cum - c.i * t.ntot AS S
        |  FROM c JOIN t USING (event_type)),
        |p AS (SELECT *, ROW_NUMBER() OVER (PARTITION BY event_type
        |    ORDER BY ABS(S) DESC, day ASC) AS rk FROM s)
        |SELECT event_type, day AS cp_step,
        |  round(CAST(ABS(S) AS DOUBLE) / CAST(d AS DOUBLE), 6) AS cusum_stat,
        |  round(CAST(ntot AS DOUBLE) / CAST(d AS DOUBLE), 6) AS mean_level,
        |  CAST(d AS BIGINT) AS n_steps
        |FROM p WHERE rk = 1 ORDER BY event_type""".stripMargin,

    // C71: quintile thresholds off the cumulative histogram — the
    // C59 decile recipe ×3 metrics; fraction literals forced to
    // DOUBLE so both engines cut the same IEEE boundary; scoring an
    // all-integer fold; monetary exact cents → one divide
    "rfm_segments" -> {
      def thr(metric: String) = (1 to 4).map(d =>
        s"MIN(CASE WHEN cum >= CAST(${d / 5.0} AS DOUBLE) * total " +
          s"THEN bk END) AS ${metric}_b$d").mkString(",\n      ")
      def hist(metric: String) =
        s"""${metric}_h AS (SELECT $metric AS bk, COUNT(*) AS c
           |  FROM u GROUP BY 1),
           |${metric}_cum AS (SELECT bk,
           |    SUM(c) OVER (ORDER BY bk
           |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum,
           |    SUM(c) OVER () AS total FROM ${metric}_h),
           |${metric}_thr AS (SELECT
           |      ${thr(metric)}
           |  FROM ${metric}_cum)""".stripMargin
      def fold(metric: String) = (1 to 4).map(d =>
        s"(CASE WHEN $metric > ${metric}_b$d THEN 1 ELSE 0 END)")
        .mkString(" + ")
      s"""WITH u AS (SELECT user_id,
         |    CAST(date_diff('day', CAST(max(date_trunc('day', ts)) AS DATE),
         |      DATE '2024-01-31') AS BIGINT) AS recency,
         |    COUNT(*) AS frequency,
         |    CAST(SUM(CAST(value AS DECIMAL(18,2)) * 100) AS BIGINT) AS cents
         |  FROM events WHERE event_type = 'purchase' GROUP BY 1),
         |${hist("recency")},
         |${hist("frequency")},
         |${hist("cents")},
         |sc AS (SELECT user_id, recency, frequency, cents,
         |    CAST(6 - (1 + ${fold("recency")}) AS INTEGER) AS r_score,
         |    CAST(1 + ${fold("frequency")} AS INTEGER) AS f_score,
         |    CAST(1 + ${fold("cents")} AS INTEGER) AS m_score
         |  FROM u CROSS JOIN recency_thr CROSS JOIN frequency_thr
         |    CROSS JOIN cents_thr)
         |SELECT user_id, recency, frequency,
         |  CAST(cents AS DOUBLE) / 100.0 AS monetary,
         |  r_score, f_score, m_score,
         |  CAST(r_score AS VARCHAR) || CAST(f_score AS VARCHAR)
         |    || CAST(m_score AS VARCHAR) AS segment
         |FROM sc ORDER BY user_id""".stripMargin
    },

    // C66: exact decimal sufficient aggregates (n, Σv, Σv²) per arm,
    // then ONE scalar IEEE evaluation per statistic with identical
    // parenthesization in both engines
    "ab_welch_ttest" ->
      welchTTestSql,

    // C67: integer contingency cells + margins; each cell term is one
    // IEEE evaluation over exact integers and the cross-cell sum folds
    // in pinned (rk, ck) order — list_reduce mirrors Spark's
    // sorted-collect aggregate fold including the 0.0 seed
    "ab_chi_square" ->
      """WITH cells AS (SELECT event_type AS rk, user_id % 2 AS ck,
        |    COUNT(*) AS o FROM events GROUP BY 1, 2),
        |rt AS (SELECT rk, SUM(o) AS rt FROM cells GROUP BY 1),
        |ct AS (SELECT ck, SUM(o) AS ct FROM cells GROUP BY 1),
        |t AS (SELECT CAST(SUM(o) AS BIGINT) AS n,
        |    COUNT(DISTINCT rk) AS nr, COUNT(DISTINCT ck) AS nc FROM cells),
        |term AS (SELECT rk, ck,
        |    pow(CAST(o AS DOUBLE) * CAST(n AS DOUBLE)
        |        - CAST(rt AS DOUBLE) * CAST(ct AS DOUBLE), 2)
        |      / (CAST(n AS DOUBLE) * CAST(rt AS DOUBLE) * CAST(ct AS DOUBLE))
        |      AS tt
        |  FROM cells JOIN rt USING (rk) JOIN ct USING (ck) CROSS JOIN t)
        |SELECT n, CAST((nr - 1) * (nc - 1) AS BIGINT) AS dof,
        |  round(list_reduce(list_prepend(0.0,
        |    list(tt ORDER BY rk, ck)), (a, b) -> a + b), 6) AS chi2
        |FROM term CROSS JOIN t GROUP BY n, nr, nc""".stripMargin,

    // C68: tie-group average ranks in exact HALF units
    // (2·cum − c + 1), rank sums exact integers; z is one scalar IEEE
    // evaluation mirrored parenthesis-for-parenthesis
    "ab_mann_whitney" ->
      """WITH p AS (SELECT user_id % 2 AS arm, value AS v
        |  FROM events WHERE event_type = 'purchase'),
        |g AS (SELECT v, COUNT(*) AS c,
        |    SUM(CASE WHEN arm = 1 THEN 1 ELSE 0 END) AS c1
        |  FROM p GROUP BY 1),
        |r AS (SELECT v, c, c1, SUM(c) OVER (ORDER BY v
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum FROM g),
        |a AS (SELECT
        |    SUM(CAST(c1 AS HUGEINT) * (2 * CAST(cum AS HUGEINT) - c + 1))
        |      AS r1x2,
        |    CAST(SUM(c1) AS BIGINT) AS n1, CAST(SUM(c) AS BIGINT) AS n,
        |    CAST(SUM(CAST(c AS HUGEINT) * c * c - c) AS DOUBLE) AS tie
        |  FROM r),
        |u AS (SELECT n1, n, tie,
        |    CAST(r1x2 - CAST(n1 AS HUGEINT) * (n1 + 1) AS DOUBLE) / 2.0
        |      AS u_stat,
        |    CAST(n1 AS DOUBLE) * (n - n1) / 12.0 * ((n + 1.0)
        |      - tie / (CAST(n AS DOUBLE) * (n - 1.0))) AS s2
        |  FROM a)
        |SELECT n1 AS n_a_ranked, CAST(n - n1 AS BIGINT) AS n_b_ranked,
        |  u_stat,
        |  CASE WHEN n1 > 0 AND n > n1 AND s2 > 0.0 THEN
        |    round((u_stat - CAST(n1 AS DOUBLE) * (n - n1) / 2.0)
        |      / sqrt(s2), 6) END AS z_stat
        |FROM u""".stripMargin,

    // C69: per-user period totals re-narrowed to decimal(18,2) so the
    // x·x / x·y products stay exact decimal(37,4) in BOTH engines;
    // θ / effect / ρ² are scalar IEEE evaluations over the exact sums
    "ab_cuped_effect" ->
      """WITH p AS (SELECT user_id AS u, CAST(value AS DECIMAL(18,2)) AS v,
        |    (ts < TIMESTAMP '2024-01-16 00:00:00') AS pre
        |  FROM events WHERE event_type = 'purchase'),
        |pu AS (SELECT u,
        |    CAST(COALESCE(SUM(CASE WHEN pre THEN v END), 0)
        |      AS DECIMAL(18,2)) AS x,
        |    CAST(COALESCE(SUM(CASE WHEN NOT pre THEN v END), 0)
        |      AS DECIMAL(18,2)) AS y,
        |    CAST(u % 2 AS INT) AS arm
        |  FROM p GROUP BY u),
        |a AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_users,
        |    CAST(SUM(CASE WHEN arm = 0 THEN 1 ELSE 0 END) AS DOUBLE) AS n0,
        |    CAST(SUM(CASE WHEN arm = 1 THEN 1 ELSE 0 END) AS DOUBLE) AS n1,
        |    CAST(SUM(CASE WHEN arm = 0 THEN x END) AS DOUBLE) AS sx0,
        |    CAST(SUM(CASE WHEN arm = 1 THEN x END) AS DOUBLE) AS sx1,
        |    CAST(SUM(CASE WHEN arm = 0 THEN y END) AS DOUBLE) AS sy0,
        |    CAST(SUM(CASE WHEN arm = 1 THEN y END) AS DOUBLE) AS sy1,
        |    CAST(SUM(x * x) AS DOUBLE) AS sxx,
        |    CAST(SUM(x * y) AS DOUBLE) AS sxy,
        |    CAST(SUM(y * y) AS DOUBLE) AS syy
        |  FROM pu),
        |d AS (SELECT n_users, n0, n1, sx0, sx1, sy0, sy1,
        |    sxy - (sx0 + sx1) * (sy0 + sy1) / (n0 + n1) AS covxy,
        |    sxx - (sx0 + sx1) * (sx0 + sx1) / (n0 + n1) AS varx,
        |    syy - (sy0 + sy1) * (sy0 + sy1) / (n0 + n1) AS vary
        |  FROM a),
        |f AS (SELECT *, (n0 > 0 AND n1 > 0 AND varx > 0.0 AND vary > 0.0)
        |    AS ok, sy1 / n1 - sy0 / n0 AS raw FROM d)
        |SELECT n_users,
        |  CASE WHEN ok THEN round(covxy / varx, 6) END AS theta,
        |  CASE WHEN n0 > 0 AND n1 > 0 THEN round(raw, 6) END AS raw_diff,
        |  CASE WHEN ok THEN round(raw - covxy / varx
        |    * (sx1 / n1 - sx0 / n0), 6) END AS adjusted_diff,
        |  CASE WHEN ok THEN round(covxy * covxy / (varx * vary), 6) END
        |    AS var_reduction
        |FROM f""".stripMargin,

    // median + MAD off the same cent-bucket histograms; the flag is an
    // all-integer compare (dev > 3·mad in buckets) so no double
    // boundary can diverge; MAD-0 groups flag nothing (mirrored guard)
    "mad_outliers" -> madOutliersSql,
    // E24 stream face: merged additive sufficient rows +
    // the same finisher == the batch query exactly
    "stream_ab_ttest" -> welchTTestSql,
    // the E17 stream face flags under stats frozen from the SAME
    // corpus — a pure per-row decision, so one SQL proves both
    "stream_robust_flags" -> madOutliersSql,

    // A14: both engines derive the two snapshots the same way; the
    // digest compare reduces to text equality under the derivation
    // (sha256 is injective on this corpus), so the oracle compares
    // the rewritten text directly.
    "corpus_diff" ->
      """WITH old AS (SELECT doc_id, source, text FROM documents
        |  WHERE doc_id % 11 <> 3),
        |neu AS (SELECT doc_id, source,
        |    CASE WHEN doc_id % 5 = 0 THEN text || ' rev2' ELSE text END AS text
        |  FROM documents WHERE doc_id % 13 <> 5)
        |SELECT COALESCE(o.source, n.source) AS source,
        |  CASE WHEN o.doc_id IS NULL THEN 'added'
        |       WHEN n.doc_id IS NULL THEN 'removed'
        |       WHEN o.text <> n.text THEN 'changed'
        |       ELSE 'unchanged' END AS status,
        |  COUNT(*) AS n_docs
        |FROM old o FULL OUTER JOIN neu n
        |  ON o.doc_id = n.doc_id AND o.source = n.source
        |GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,

    // A13: the aggregate runs over the ORC round-trip on the Spark
    // side but over the parquet source here — a hash match proves the
    // ORC write→read path preserved every row and value.
    "orc_ingest" ->
      """SELECT source, COUNT(*) AS n_docs,
        |  CAST(SUM(n_chars) AS BIGINT) AS sum_chars,
        |  MIN(doc_id) AS min_id, MAX(doc_id) AS max_id
        |FROM documents WHERE lang = 'en'
        |GROUP BY source ORDER BY source""".stripMargin,

    // D12: the oracle recomputes the stats from the pixel/sample
    // GENERATOR arithmetic (MultimodalQueries.synthImage/synthAudio),
    // while the Spark side recovers them by DECODING the real
    // BMP/WAV bytes — a hash match proves the byte-level round-trip.
    // (range() can't take lateral column args in DuckDB, hence the
    // join-filter against the max domain size.)
    "media_decode_image" ->
      """SELECT d.doc_id,
        |  CAST(d.doc_id % 6 + 2 AS INTEGER) AS width,
        |  CAST(d.doc_id % 4 + 2 AS INTEGER) AS height,
        |  CAST(SUM((d.doc_id*7 + i.i*3) % 256) AS BIGINT) AS sum_r,
        |  CAST(SUM((d.doc_id*11 + i.i*5) % 256) AS BIGINT) AS sum_g,
        |  CAST(SUM((d.doc_id*13 + i.i*7) % 256) AS BIGINT) AS sum_b
        |FROM documents d JOIN range(0, 35) AS i(i)
        |  ON i.i < (d.doc_id % 6 + 2)*(d.doc_id % 4 + 2)
        |GROUP BY d.doc_id ORDER BY d.doc_id""".stripMargin,

    // D12d: same generator arithmetic as media_decode_image — PNG is
    // LOSSLESS, so the decode side must recover the identical pixels
    // through real zlib + the five scanline filters; a hash match is
    // the byte-exact proof (lossy JPEG can't make this claim and is
    // spec-pinned instead)
    "media_decode_png" ->
      """SELECT d.doc_id,
        |  CAST(d.doc_id % 6 + 2 AS INTEGER) AS width,
        |  CAST(d.doc_id % 4 + 2 AS INTEGER) AS height,
        |  CAST(SUM((d.doc_id*7 + i.i*3) % 256) AS BIGINT) AS sum_r,
        |  CAST(SUM((d.doc_id*11 + i.i*5) % 256) AS BIGINT) AS sum_g,
        |  CAST(SUM((d.doc_id*13 + i.i*7) % 256) AS BIGINT) AS sum_b
        |FROM documents d JOIN range(0, 35) AS i(i)
        |  ON i.i < (d.doc_id % 6 + 2)*(d.doc_id % 4 + 2)
        |GROUP BY d.doc_id ORDER BY d.doc_id""".stripMargin,

    // D70: the dHash fingerprints re-derived from the pixel-GENERATOR
    // arithmetic (the D12 oracle pattern) — grayscale, gradient sign,
    // 48-bit pack, 4×12-bit banding, xor+popcount verify: every step
    // exact integers, so the pair set is bit-identical to the Spark
    // side that got there by decoding real BMP bytes.
    "media_dedup_phash" ->
      """WITH hs AS (
        |  SELECT d.doc_id, CAST(d.doc_id % 6 + 2 AS INTEGER) AS w,
        |    CAST(d.doc_id % 4 + 2 AS INTEGER) AS h,
        |    CAST(COALESCE(SUM(CASE WHEN
        |      ((d.doc_id*7 + (i.i+1)*3) % 256 + (d.doc_id*11 + (i.i+1)*5) % 256
        |        + (d.doc_id*13 + (i.i+1)*7) % 256) // 3
        |      > ((d.doc_id*7 + i.i*3) % 256 + (d.doc_id*11 + i.i*5) % 256
        |        + (d.doc_id*13 + i.i*7) % 256) // 3
        |      THEN (CAST(1 AS BIGINT) << i.i)
        |      ELSE CAST(0 AS BIGINT) END), 0) AS BIGINT) AS phash
        |  FROM documents d JOIN range(0, 34) AS i(i)
        |    ON i.i < (d.doc_id % 6 + 2)*(d.doc_id % 4 + 2) - 1
        |  GROUP BY d.doc_id),
        |bands AS (
        |  SELECT doc_id, w, h, phash, b.b AS band,
        |    (phash >> (b.b*12)) & 4095 AS bv
        |  FROM hs JOIN range(0, 4) AS b(b) ON TRUE),
        |cand AS (
        |  SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b,
        |    a.phash AS ha, b.phash AS hb
        |  FROM bands a JOIN bands b ON a.w = b.w AND a.h = b.h
        |    AND a.band = b.band AND a.bv = b.bv AND a.doc_id < b.doc_id)
        |SELECT id_a, id_b,
        |  CAST(bit_count(xor(ha, hb)) AS INTEGER) AS hamming
        |FROM cand WHERE bit_count(xor(ha, hb)) <= 2
        |ORDER BY id_a, id_b""".stripMargin,

    // D70b: the audio contour hash from the sample-GENERATOR
    // arithmetic — the ±2000 offset cancels in the comparison, so the
    // oracle compares raw mod values; banding/popcount identical to
    // the image oracle.
    "media_dedup_audio" ->
      """WITH hs AS (
        |  SELECT d.doc_id,
        |    CAST(8000 + (d.doc_id % 8)*1000 AS INTEGER) AS sr,
        |    CAST(d.doc_id % 24 + 4 AS INTEGER) AS ns,
        |    CAST(COALESCE(SUM(CASE WHEN
        |      (d.doc_id*131 + (i.i+1)*17) % 4001
        |        > (d.doc_id*131 + i.i*17) % 4001
        |      THEN (CAST(1 AS BIGINT) << i.i)
        |      ELSE CAST(0 AS BIGINT) END), 0) AS BIGINT) AS phash
        |  FROM documents d JOIN range(0, 27) AS i(i)
        |    ON i.i < d.doc_id % 24 + 3
        |  GROUP BY d.doc_id),
        |bands AS (
        |  SELECT doc_id, sr, ns, phash, b.b AS band,
        |    (phash >> (b.b*12)) & 4095 AS bv
        |  FROM hs JOIN range(0, 4) AS b(b) ON TRUE),
        |cand AS (
        |  SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b,
        |    a.phash AS ha, b.phash AS hb
        |  FROM bands a JOIN bands b ON a.sr = b.sr AND a.ns = b.ns
        |    AND a.band = b.band AND a.bv = b.bv AND a.doc_id < b.doc_id)
        |SELECT id_a, id_b,
        |  CAST(bit_count(xor(ha, hb)) AS INTEGER) AS hamming
        |FROM cand WHERE bit_count(xor(ha, hb)) <= 2
        |ORDER BY id_a, id_b""".stripMargin,

    "media_decode_audio" ->
      """SELECT d.doc_id,
        |  CAST(8000 + (d.doc_id % 8)*1000 AS INTEGER) AS sample_rate,
        |  CAST(d.doc_id % 24 + 4 AS BIGINT) AS n_samples,
        |  CAST(SUM((d.doc_id*131 + i.i*17) % 4001 - 2000) AS BIGINT) AS sum_amp,
        |  CAST(MAX(ABS((d.doc_id*131 + i.i*17) % 4001 - 2000)) AS BIGINT) AS peak_amp
        |FROM documents d JOIN range(0, 28) AS i(i) ON i.i < d.doc_id % 24 + 4
        |GROUP BY d.doc_id ORDER BY d.doc_id""".stripMargin,
  )

  // ------------------------------------------------------------------
  // Oracles rendered at Verify time from session-trained state.
  //
  // ann_ivf_topk's codebook comes out of Lloyd iterations whose
  // per-cluster double sums merge in shuffle-fetch order — deterministic
  // in VALUE only to ~ulp, so the exact centroid bits belong to the
  // training run, not the algorithm. The same session that dumped the
  // query result embeds ITS trained centroids as literals (exactly as
  // ann_lsh_topk embeds its hyperplane signs); everything downstream of
  // the codebook — assignment (squared-L2 left fold, ties to the lower
  // cid), probe ranking and cosine scoring (left-to-right double folds
  // over floats) — is IEEE correctly-rounded arithmetic that DuckDB
  // reproduces bit-for-bit via list_reduce in the same order.
  // ------------------------------------------------------------------

  /** Float literal that parses back to the identical 32 bits:
    * Float.toString is the shortest decimal that round-trips, and
    * DuckDB's VARCHAR→FLOAT cast is correctly rounded. (A bare numeric
    * literal would type DECIMAL and risk double rounding.)
    */
  /** DuckDB replay of the b-bit minhash audit (D72). Ground truth =
    * the exact-pair CTEs of dedup_minhash_lsh (same completeness
    * argument); the estimator side replays the engine signature
    * bit-for-bit: per-shingle XXH64 via the shared cd..hf chain,
    * per-slot derivation mix64(base ^ mix64(s)) with splitmix64
    * constants and per-slot constants emitted from the very same Scala
    * implementation, SIGNED minima per (doc, slot) (the kernel
    * compares Java longs), low-b-bit lanes, and the Li–König
    * correction (P−C)/(1−C) with double constants routed through
    * CAST('…' AS DOUBLE) so they parse as DOUBLE, not DECIMAL.
    * Mixing runs per DISTINCT shingle × slot; minima fold per doc.
    */
  private def bbitOracle(bands: Int, rows: Int, b: Int,
                         threshold: Double): String = {
    val k = bands * rows
    def u(x: Long) = java.lang.Long.toUnsignedString(x)
    def d(x: Double) = s"CAST('$x' AS DOUBLE)"
    val slots = (0 until k).map(s =>
      s"($s, CAST('${u(graft.functions.GraftKernels.mix64(s.toLong))}' AS HUGEINT))")
      .mkString(", ")
    val C0 = u(0x9e3779b97f4a7c15L)
    val C1 = u(0xbf58476d1ce4e5b9L)
    val C2 = u(0x94d049bb133111ebL)
    val mixChain = Seq(
      s"(xor(CAST(hv AS HUGEINT), sc) + $C0) % $M64 AS z1",
      s"${xorShift("z1", 30)} AS x1",
      s"(${mul64("x1", C1)}) % $M64 AS z2",
      s"${xorShift("z2", 27)} AS x2",
      s"(${mul64("x2", C2)}) % $M64 AS z3",
      s"${xorShift("z3", 31)} AS m")
      .foldLeft("SELECT hf.sh, sl.s, sl.sc, hf.hv FROM hf CROSS JOIN (VALUES "
        + slots + ") sl(s, sc)") { (q, step) => s"SELECT *, $step FROM ($q)" }
    val mod = u(1L << b)
    val est = s"(CAST(cnt AS DOUBLE) / ${d(k.toDouble)} - ${d(1.0 / (1L << b))})" +
      s" / ${d(1.0 - 1.0 / (1L << b))}"
    s"""WITH t AS (
      |  SELECT doc_id, string_split_regex(trim(text), '\\s+') AS tk FROM documents),
      |s AS (SELECT doc_id, list_distinct(list_transform(range(1, len(tk) - 1),
      |  i -> tk[i] || ' ' || tk[i+1] || ' ' || tk[i+2])) AS sh FROM t),
      |ex AS (SELECT doc_id, len(sh) AS n, unnest(sh) AS shingle FROM s
      |       WHERE len(sh) > 0),
      |pairs AS (
      |  SELECT a.doc_id AS id_a, b.doc_id AS id_b, count(*) AS c,
      |    any_value(a.n) AS na, any_value(b.n) AS nb
      |  FROM ex a JOIN ex b ON a.shingle = b.shingle AND b.doc_id > a.doc_id
      |  GROUP BY 1, 2),
      |j AS (
      |  SELECT id_a, id_b, CAST(c AS DOUBLE) / (na + nb - c) AS jaccard
      |  FROM pairs WHERE CAST(c AS DOUBLE) / (na + nb - c) >= $threshold),
      |dsh AS (SELECT DISTINCT shingle AS sh FROM ex),
      |$strXxh64Ctes
      |msig AS (
      |  SELECT sh, s,
      |    CAST(CASE WHEN m >= 9223372036854775808 THEN m - $M64 ELSE m END
      |      AS BIGINT) AS ms
      |  FROM ($mixChain)),
      |mins AS (
      |  SELECT ex.doc_id, msig.s, MIN(msig.ms) AS mn
      |  FROM ex JOIN msig ON msig.sh = ex.shingle GROUP BY 1, 2),
      |lanes AS (SELECT doc_id, s, ((mn % $mod) + $mod) % $mod AS lane FROM mins),
      |mt AS (
      |  SELECT j.id_a, j.id_b, j.jaccard,
      |    SUM(CASE WHEN la.lane = lb.lane THEN 1 ELSE 0 END) AS cnt
      |  FROM j JOIN lanes la ON la.doc_id = j.id_a
      |         JOIN lanes lb ON lb.doc_id = j.id_b AND lb.s = la.s
      |  GROUP BY 1, 2, 3)
      |SELECT id_a, id_b, jaccard, $est AS jaccard_bbit,
      |  ($est >= ${d(threshold)}) AS kept_bbit
      |FROM mt ORDER BY id_a, id_b""".stripMargin
  }

  private def floatLit(f: Float): String = s"CAST('$f' AS FLOAT)"

  private def centroidsValues(cents: Array[Array[Float]]): String =
    cents.zipWithIndex.map { case (c, i) =>
      s"($i, ${c.map(floatLit).mkString("[", ", ", "]")})"
    }.mkString(",\n    ")

  /** The three cosine accumulators as index-order folds (mirrors
    * GraftKernels.cosine: independent left folds, float→double exact).
    */
  private def cosineFolds(a: String, b: String): String =
    s"""list_reduce(list_transform(range(1, 65),
       |      i -> CAST($a[i] AS DOUBLE) * CAST($b[i] AS DOUBLE)), (x, y) -> x + y) AS dot,
       |    list_reduce(list_transform(range(1, 65),
       |      i -> CAST($a[i] AS DOUBLE) * CAST($a[i] AS DOUBLE)), (x, y) -> x + y) AS na,
       |    list_reduce(list_transform(range(1, 65),
       |      i -> CAST($b[i] AS DOUBLE) * CAST($b[i] AS DOUBLE)), (x, y) -> x + y) AS nb""".stripMargin

  private def ivfOracle(cents: Array[Array[Float]], k: Int, nprobe: Int): String =
    s"""WITH cents AS (
       |  SELECT * FROM (VALUES
       |    ${centroidsValues(cents)}) t(cid, cvec)),
       |corpus AS (SELECT vec_id AS id, embedding AS vec FROM embeddings),
       |asg AS (
       |  -- nearest centroid by squared L2, index-order fold, ties to lower cid
       |  SELECT id, vec, cid FROM (
       |    SELECT c.id, c.vec, ct.cid,
       |      row_number() OVER (PARTITION BY c.id ORDER BY
       |        list_reduce(list_transform(range(1, 65),
       |          i -> (CAST(c.vec[i] AS DOUBLE) - CAST(ct.cvec[i] AS DOUBLE))
       |             * (CAST(c.vec[i] AS DOUBLE) - CAST(ct.cvec[i] AS DOUBLE))),
       |          (x, y) -> x + y) ASC, ct.cid ASC) AS rn
       |    FROM corpus c CROSS JOIN cents ct)
       |  WHERE rn = 1),
       |qs AS (SELECT vec_id AS qid, embedding AS qv FROM embeddings WHERE vec_id < 5),
       |qcos AS (
       |  SELECT qid, qv, cid,
       |    ${cosineFolds("qv", "cvec")}
       |  FROM qs CROSS JOIN cents),
       |qp AS (
       |  -- the nprobe nearest lists per query (cosine desc, cid tiebreak)
       |  SELECT qid, qv, cid FROM (
       |    SELECT qid, qv, cid, row_number() OVER (PARTITION BY qid ORDER BY
       |      CASE WHEN na = 0 OR nb = 0 THEN 0.0
       |           ELSE dot / (sqrt(na) * sqrt(nb)) END DESC, cid ASC) AS rk
       |    FROM qcos)
       |  WHERE rk <= $nprobe),
       |sc AS (
       |  SELECT qp.qid, a.id,
       |    ${cosineFolds("qp.qv", "a.vec")}
       |  FROM asg a JOIN qp USING (cid) WHERE a.id <> qp.qid),
       |scored AS (
       |  SELECT qid, id,
       |    CASE WHEN na = 0 OR nb = 0 THEN 0.0
       |         ELSE dot / (sqrt(na) * sqrt(nb)) END AS cos
       |  FROM sc),
       |r AS (
       |  SELECT qid, id, cos,
       |    row_number() OVER (PARTITION BY qid ORDER BY cos DESC, id) AS rk
       |  FROM scored)
       |SELECT qid, id, cos, CAST(rk AS INTEGER) AS rk
       |FROM r WHERE rk <= $k ORDER BY qid, rk""".stripMargin

  /** PQ oracle: encode = per-subspace argmin (index-order squared-L2
    * fold, ties to the lower code — bit-exact vs the kernel), ADC
    * candidate cut on round(adc, 6) with the id tiebreak (the kernel
    * folds all 64 terms in one accumulator while SQL sums 8 subspace
    * folds — ±ulp regrouping drift, absorbed by the rounding both
    * engines rank on), exact-cosine re-rank mirrored bit-for-bit.
    */
  private def pqOracle(cb: graft.operators.PqIndex.Codebooks,
                       k: Int, poolMult: Int): String = {
    val ds = cb.ds
    val centsRows = (for (j <- 0 until cb.m; c <- 0 until cb.ksub) yield
      s"($j, $c, ${cb.books(j)(c).map(floatLit).mkString("[", ", ", "]")})")
      .mkString(",\n    ")
    def subDist(vec: String, jExpr: String) =
      s"""list_reduce(list_transform(range(1, ${ds + 1}),
         |      i -> (CAST($vec[$jExpr * $ds + i] AS DOUBLE) - CAST(ct.cvec[i] AS DOUBLE))
         |         * (CAST($vec[$jExpr * $ds + i] AS DOUBLE) - CAST(ct.cvec[i] AS DOUBLE))),
         |      (x, y) -> x + y)""".stripMargin
    s"""WITH cents AS (
       |  SELECT * FROM (VALUES
       |    $centsRows) t(j, c, cvec)),
       |corpus AS (SELECT vec_id AS id, embedding AS vec FROM embeddings),
       |enc AS (
       |  SELECT id, j, c AS code FROM (
       |    SELECT cr.id, ct.j, ct.c,
       |      row_number() OVER (PARTITION BY cr.id, ct.j ORDER BY
       |        ${subDist("cr.vec", "ct.j")} ASC, ct.c ASC) AS rn
       |    FROM corpus cr CROSS JOIN cents ct)
       |  WHERE rn = 1),
       |qs AS (SELECT vec_id AS qid, embedding AS qv FROM embeddings WHERE vec_id < 5),
       |adc AS (
       |  SELECT q.qid, e.id,
       |    round(SUM(${subDist("q.qv", "e.j")}), 6) AS radc
       |  FROM qs q CROSS JOIN enc e
       |  JOIN cents ct ON ct.j = e.j AND ct.c = e.code
       |  WHERE e.id <> q.qid
       |  GROUP BY q.qid, e.id),
       |pool AS (
       |  SELECT qid, id FROM (
       |    SELECT qid, id,
       |      row_number() OVER (PARTITION BY qid ORDER BY radc ASC, id) AS prk
       |    FROM adc) WHERE prk <= ${k * poolMult}),
       |sc AS (
       |  SELECT p.qid, p.id,
       |    ${cosineFolds("qs.qv", "cv.vec")}
       |  FROM pool p
       |  JOIN corpus cv ON cv.id = p.id
       |  JOIN qs ON qs.qid = p.qid),
       |scored AS (
       |  SELECT qid, id,
       |    CASE WHEN na = 0 OR nb = 0 THEN 0.0
       |         ELSE dot / (sqrt(na) * sqrt(nb)) END AS cos
       |  FROM sc),
       |r AS (
       |  SELECT qid, id, cos,
       |    row_number() OVER (PARTITION BY qid ORDER BY cos DESC, id) AS rk
       |  FROM scored)
       |SELECT qid, id, cos, CAST(rk AS INTEGER) AS rk
       |FROM r WHERE rk <= $k ORDER BY qid, rk""".stripMargin
  }

  /** IVF-PQ oracle: the [[ivfOracle]] assignment/probe stages composed
    * with the [[pqOracle]] encode/ADC/re-rank stages, with one new
    * ingredient — the RESIDUAL `vec − centroid(cid)`, a per-element
    * single-precision subtract (correctly rounded in both engines, so
    * the residual bits reproduce; FLOAT − FLOAT stays FLOAT in DuckDB).
    * Encode argmin and re-rank folds are bit-exact; the regrouped ADC
    * sum (kernel: one accumulator over all 64 terms; SQL: 8 subspace
    * folds summed) is absorbed by the round(·, 6) both engines cut
    * the pool on.
    */
  private def ivfpqOracle(idx: graft.operators.IvfPq.Index,
                          k: Int, nprobe: Int, poolMult: Int): String = {
    val cb = idx.books
    val ds = cb.ds
    val pqRows = (for (j <- 0 until cb.m; c <- 0 until cb.ksub) yield
      s"($j, $c, ${cb.books(j)(c).map(floatLit).mkString("[", ", ", "]")})")
      .mkString(",\n    ")
    def subDist(vec: String, jExpr: String) =
      s"""list_reduce(list_transform(range(1, ${ds + 1}),
         |      i -> (CAST($vec[$jExpr * $ds + i] AS DOUBLE) - CAST(ct.cvec[i] AS DOUBLE))
         |         * (CAST($vec[$jExpr * $ds + i] AS DOUBLE) - CAST(ct.cvec[i] AS DOUBLE))),
         |      (x, y) -> x + y)""".stripMargin
    s"""WITH cents AS (
       |  SELECT * FROM (VALUES
       |    ${centroidsValues(idx.centroids)}) t(cid, cvec)),
       |pq AS (
       |  SELECT * FROM (VALUES
       |    $pqRows) t(j, c, cvec)),
       |corpus AS (SELECT vec_id AS id, embedding AS vec FROM embeddings),
       |asg AS (
       |  SELECT id, vec, cid FROM (
       |    SELECT c.id, c.vec, ct.cid,
       |      row_number() OVER (PARTITION BY c.id ORDER BY
       |        list_reduce(list_transform(range(1, 65),
       |          i -> (CAST(c.vec[i] AS DOUBLE) - CAST(ct.cvec[i] AS DOUBLE))
       |             * (CAST(c.vec[i] AS DOUBLE) - CAST(ct.cvec[i] AS DOUBLE))),
       |          (x, y) -> x + y) ASC, ct.cid ASC) AS rn
       |    FROM corpus c CROSS JOIN cents ct)
       |  WHERE rn = 1),
       |res AS (
       |  -- float residual: single-precision subtract, bit-exact
       |  SELECT a.id, a.cid,
       |    list_transform(range(1, 65), i -> a.vec[i] - ct.cvec[i]) AS rvec
       |  FROM asg a JOIN cents ct USING (cid)),
       |enc AS (
       |  SELECT id, cid, j, c AS code FROM (
       |    SELECT r.id, r.cid, ct.j, ct.c,
       |      row_number() OVER (PARTITION BY r.id, ct.j ORDER BY
       |        ${subDist("r.rvec", "ct.j")} ASC, ct.c ASC) AS rn
       |    FROM res r CROSS JOIN pq ct)
       |  WHERE rn = 1),
       |qs AS (SELECT vec_id AS qid, embedding AS qv FROM embeddings WHERE vec_id < 5),
       |qcos AS (
       |  SELECT qid, qv, cid,
       |    ${cosineFolds("qv", "cvec")}
       |  FROM qs CROSS JOIN cents),
       |qp AS (
       |  SELECT qid, qv, cid FROM (
       |    SELECT qid, qv, cid, row_number() OVER (PARTITION BY qid ORDER BY
       |      CASE WHEN na = 0 OR nb = 0 THEN 0.0
       |           ELSE dot / (sqrt(na) * sqrt(nb)) END DESC, cid ASC) AS rk
       |    FROM qcos)
       |  WHERE rk <= $nprobe),
       |qres AS (
       |  SELECT p.qid, p.cid,
       |    list_transform(range(1, 65), i -> p.qv[i] - ct.cvec[i]) AS qrv
       |  FROM qp p JOIN cents ct USING (cid)),
       |adc AS (
       |  SELECT q.qid, e.id,
       |    round(SUM(${subDist("q.qrv", "e.j")}), 6) AS radc
       |  FROM qres q
       |  JOIN enc e ON e.cid = q.cid
       |  JOIN pq ct ON ct.j = e.j AND ct.c = e.code
       |  WHERE e.id <> q.qid
       |  GROUP BY q.qid, e.id),
       |pool AS (
       |  SELECT qid, id FROM (
       |    SELECT qid, id,
       |      row_number() OVER (PARTITION BY qid ORDER BY radc ASC, id) AS prk
       |    FROM adc) WHERE prk <= ${k * poolMult}),
       |sc AS (
       |  SELECT p.qid, p.id,
       |    ${cosineFolds("qs.qv", "cv.vec")}
       |  FROM pool p
       |  JOIN corpus cv ON cv.id = p.id
       |  JOIN qs ON qs.qid = p.qid),
       |scored AS (
       |  SELECT qid, id,
       |    CASE WHEN na = 0 OR nb = 0 THEN 0.0
       |         ELSE dot / (sqrt(na) * sqrt(nb)) END AS cos
       |  FROM sc),
       |r AS (
       |  SELECT qid, id, cos,
       |    row_number() OVER (PARTITION BY qid ORDER BY cos DESC, id) AS rk
       |  FROM scored)
       |SELECT qid, id, cos, CAST(rk AS INTEGER) AS rk
       |FROM r WHERE rk <= $k ORDER BY qid, rk""".stripMargin
  }

  /** SemDeDup oracle: the [[ivfOracle]] assignment stage, within-
    * cluster exact-cosine edges (bit-exact folds, threshold on the
    * exact double), the recursive-CTE closure from `dedup_resolve`,
    * and the paper's keep rule ranked on (cos_to_centroid, id) — all
    * engine-independent given the embedded centroids.
    */
  /** Cluster-balanced sample oracle: the semDedup assignment CTE
    * (nearest centroid by squared-L2 fold, tie to lower cid) feeding
    * the unimax_mix recursive water-fill — caps keyed on the STRING
    * form of cid (mirroring waterFillByStratum's stratum cast, whose
    * driver sort is lexicographic) and selection by the portable
    * XXH64 bucket rank.
    */
  private def clusterBalancedOracle(cents: Array[Array[Float]],
                                    budget: Long): String =
    s"""WITH RECURSIVE cents AS (
       |  SELECT * FROM (VALUES
       |    ${centroidsValues(cents)}) t(cid, cvec)),
       |corpus AS (SELECT vec_id AS id, embedding AS vec FROM embeddings),
       |asg AS (
       |  SELECT id, cid FROM (
       |    SELECT c.id, ct.cid,
       |      row_number() OVER (PARTITION BY c.id ORDER BY
       |        list_reduce(list_transform(range(1, 65),
       |          i -> (CAST(c.vec[i] AS DOUBLE) - CAST(ct.cvec[i] AS DOUBLE))
       |             * (CAST(c.vec[i] AS DOUBLE) - CAST(ct.cvec[i] AS DOUBLE))),
       |          (x, y) -> x + y) ASC, ct.cid ASC) AS rn
       |    FROM corpus c CROSS JOIN cents ct)
       |  WHERE rn = 1),
       |caps AS (
       |  SELECT CAST(cid AS VARCHAR) AS s, CAST(COUNT(*) AS BIGINT) AS cap
       |  FROM asg GROUP BY 1),
       |nn AS (SELECT CAST(COUNT(*) AS BIGINT) AS n FROM caps),
       |srt AS (SELECT s, cap,
       |    CAST(ROW_NUMBER() OVER (ORDER BY cap, s) AS BIGINT) AS i
       |  FROM caps),
       |alloc AS (
       |  SELECT CAST(0 AS BIGINT) AS i, CAST($budget AS BIGINT) AS rem,
       |         CAST(NULL AS VARCHAR) AS s, CAST(0 AS BIGINT) AS a
       |  UNION ALL
       |  SELECT t.i,
       |         al.rem - LEAST(t.cap, al.rem // (nn.n - t.i + 1)),
       |         t.s,
       |         LEAST(t.cap, al.rem // (nn.n - t.i + 1))
       |  FROM alloc al JOIN srt t ON t.i = al.i + 1 CROSS JOIN nn),
       |q AS (SELECT s, a AS quota FROM alloc WHERE i > 0),
       |r AS (
       |  SELECT id, cid,
       |    row_number() OVER (PARTITION BY cid
       |      ORDER BY $xxhBucket, id) AS rk
       |  FROM (${xxh64Nested("SELECT id, cid FROM asg", "id")}))
       |SELECT r.id, r.cid FROM r JOIN q ON CAST(r.cid AS VARCHAR) = q.s
       |WHERE rk <= quota
       |ORDER BY r.id""".stripMargin

  /** Semantic-drift oracle: the centroid-assignment CTE feeding the
    * corpus_drift PSI tree (same smoothing/divides/rounding), buckets
    * keyed on the cid string cast.
    */
  private def semanticDriftOracle(cents: Array[Array[Float]]): String =
    s"""WITH cents AS (
       |  SELECT * FROM (VALUES
       |    ${centroidsValues(cents)}) t(cid, cvec)),
       |corpus AS (SELECT vec_id AS id, embedding AS vec FROM embeddings),
       |asg AS (
       |  SELECT id, cid FROM (
       |    SELECT c.id, ct.cid,
       |      row_number() OVER (PARTITION BY c.id ORDER BY
       |        list_reduce(list_transform(range(1, 65),
       |          i -> (CAST(c.vec[i] AS DOUBLE) - CAST(ct.cvec[i] AS DOUBLE))
       |             * (CAST(c.vec[i] AS DOUBLE) - CAST(ct.cvec[i] AS DOUBLE))),
       |          (x, y) -> x + y) ASC, ct.cid ASC) AS rn
       |    FROM corpus c CROSS JOIN cents ct)
       |  WHERE rn = 1),
       |r AS (SELECT CAST(cid AS VARCHAR) AS bucket, COUNT(*) AS ref_n
       |  FROM asg WHERE id % 2 = 0 GROUP BY 1),
       |c AS (SELECT CAST(cid AS VARCHAR) AS bucket, COUNT(*) AS cur_n
       |  FROM asg WHERE id % 2 = 1 GROUP BY 1),
       |j AS (SELECT COALESCE(r.bucket, c.bucket) AS bucket,
       |    CAST(COALESCE(ref_n, 0) AS BIGINT) AS ref_n,
       |    CAST(COALESCE(cur_n, 0) AS BIGINT) AS cur_n
       |  FROM r FULL OUTER JOIN c ON r.bucket = c.bucket),
       |t AS (SELECT SUM(ref_n) AS rt, SUM(cur_n) AS ct,
       |    COUNT(*) AS k FROM j),
       |s AS (SELECT bucket, ref_n, cur_n,
       |    CAST(ref_n + 1 AS DOUBLE) / CAST(rt + k AS DOUBLE) AS p,
       |    CAST(cur_n + 1 AS DOUBLE) / CAST(ct + k AS DOUBLE) AS q
       |  FROM j CROSS JOIN t)
       |SELECT bucket, ref_n, cur_n, round(p, 6) AS p, round(q, 6) AS q,
       |  round((p - q) * ln(p / q), 6) AS psi_term
       |FROM s ORDER BY bucket""".stripMargin

  private def semDedupOracle(cents: Array[Array[Float]],
                             threshold: Double): String =
    s"""WITH RECURSIVE cents AS (
       |  SELECT * FROM (VALUES
       |    ${centroidsValues(cents)}) t(cid, cvec)),
       |corpus AS (SELECT vec_id AS id, embedding AS vec FROM embeddings),
       |asg AS (
       |  SELECT id, vec, cid FROM (
       |    SELECT c.id, c.vec, ct.cid,
       |      row_number() OVER (PARTITION BY c.id ORDER BY
       |        list_reduce(list_transform(range(1, 65),
       |          i -> (CAST(c.vec[i] AS DOUBLE) - CAST(ct.cvec[i] AS DOUBLE))
       |             * (CAST(c.vec[i] AS DOUBLE) - CAST(ct.cvec[i] AS DOUBLE))),
       |          (x, y) -> x + y) ASC, ct.cid ASC) AS rn
       |    FROM corpus c CROSS JOIN cents ct)
       |  WHERE rn = 1),
       |pr AS (
       |  SELECT a.id AS id_a, b.id AS id_b,
       |    ${cosineFolds("a.vec", "b.vec")}
       |  FROM asg a JOIN asg b ON a.cid = b.cid AND a.id < b.id),
       |edges AS (
       |  SELECT id_a, id_b FROM pr
       |  WHERE CASE WHEN na = 0 OR nb = 0 THEN 0.0
       |        ELSE dot / (sqrt(na) * sqrt(nb)) END >= $threshold),
       |und AS (SELECT id_a AS src, id_b AS dst FROM edges
       |  UNION ALL SELECT id_b, id_a FROM edges),
       |reach AS (
       |  SELECT src, dst FROM und
       |  UNION
       |  SELECT r.src, u.dst FROM reach r JOIN und u ON u.src = r.dst),
       |comp AS (
       |  SELECT c.id, LEAST(c.id, COALESCE(MIN(r.dst), c.id)) AS canonical_id
       |  FROM corpus c LEFT JOIN reach r ON r.src = c.id GROUP BY c.id),
       |cc AS (
       |  SELECT a.id, a.cid,
       |    ${cosineFolds("a.vec", "ct.cvec")}
       |  FROM asg a JOIN cents ct USING (cid)),
       |scored AS (
       |  SELECT id, cid,
       |    CASE WHEN na = 0 OR nb = 0 THEN 0.0
       |         ELSE dot / (sqrt(na) * sqrt(nb)) END AS cos_centroid
       |  FROM cc),
       |ranked AS (
       |  SELECT s.id, s.cid, m.canonical_id, s.cos_centroid,
       |    row_number() OVER (PARTITION BY m.canonical_id
       |      ORDER BY s.cos_centroid ASC, s.id) AS rk
       |  FROM scored s JOIN comp m ON m.id = s.id)
       |SELECT id, cid, canonical_id, cos_centroid, (rk = 1) AS keep
       |FROM ranked ORDER BY id""".stripMargin

  /** Oracles that need this session's trained state. Called by Verify
    * AFTER the query dump, so the `trainCached` calls are cache hits
    * on the very codebooks that produced the dumped results (same
    * cache keys as [[graft.queries.VectorQueries.annIvf]] /
    * [[graft.queries.VectorQueries.annPq]]).
    */
  /** PCA oracle: the plan-literal projection fold mirrored in
    * list_transform/list_reduce — float→double widening exact, center
    * /multiply/fold/√-divide all correctly rounded, model doubles
    * embedded as 17-significant-digit SCIENTIFIC literals: DuckDB
    * parses exponent-form numerics as DOUBLE (plain decimals become
    * DECIMAL, and the list literal's common-type resolution then
    * perturbs the low bits), and 17 digits round-trip any double to
    * identical bits.
    */
  private def pcaOracle(model: graft.operators.Pca.Model): String = {
    // Locale.ROOT: f"" interpolation uses the JVM default locale, and a
    // comma-decimal locale (de_DE) would emit SQL-invalid literals.
    def d(x: Double) = String.format(java.util.Locale.ROOT, "%.17e", Double.box(x))
    def dlist(xs: Array[Double]) = xs.map(d).mkString("[", ", ", "]")
    val comps = model.basis.indices.map { j =>
      s"""list_reduce(list_transform(range(1, ${model.mean.length + 1}),
         |    i -> (CAST(embedding[i] AS DOUBLE) - m[i]) * b${j + 1}[i]),
         |    (a, b) -> a + b)
         |  / sqrt(${d(model.eigenvalues(j))}) AS pc${j + 1}""".stripMargin
    }.mkString(",\n  ")
    val axes = model.basis.indices
      .map(j => s"${dlist(model.basis(j))} AS b${j + 1}").mkString(",\n  ")
    s"""WITH mdl AS (SELECT
       |  ${dlist(model.mean)} AS m,
       |  $axes)
       |SELECT vec_id AS id,
       |  $comps
       |FROM embeddings CROSS JOIN mdl
       |ORDER BY id""".stripMargin
  }

  def dynamicOracleSql(spark: SparkSession, sfDir: String): Map[String, String] = {
    import org.apache.spark.sql.functions.col
    val corpus = graft.sources.Tables.embeddings(spark, sfDir)
      .select(col("vec_id").as("id"), col("embedding").as("vec"))
    val cents = graft.operators.IvfIndex.trainCached(
      s"embeddings:$sfDir", corpus, "vec", "id", k = 16, dim = 64)
    val pqBooks = graft.operators.PqIndex.trainCached(
      s"embeddings-pq:$sfDir", corpus, "vec", "id", dim = 64)
    val ivfpq = graft.operators.IvfPq.trainCached(
      s"embeddings-ivfpq:$sfDir", corpus, "vec", "id", k = 16, dim = 64)
    // the trained-vocab twin of the codebook embeddings: same merge
    // list as the query dump (cache key shared with vocabBpeTokenize)
    val bpe = graft.operators.Bpe.trainCached(
      s"documents:$sfDir", graft.sources.Tables.documents(spark, sfDir),
      "text", numMerges = 64)
    // the recall report composes the per-method oracles as subqueries
    // (DuckDB allows WITH inside a parenthesized subquery) against the
    // static brute-force/LSH oracles; hits are exact intersections
    def sub(sql: String) = s"SELECT qid, id FROM ($sql)"
    val recallReport =
      s"""WITH bf AS (${sub(oracleSql("ann_bruteforce_topk"))}),
         |l AS (${sub(oracleSql("ann_lsh_topk"))}),
         |i AS (${sub(ivfOracle(cents, k = 10, nprobe = 2))}),
         |p AS (${sub(pqOracle(pqBooks, k = 10, poolMult = 4))}),
         |c AS (${sub(ivfpqOracle(ivfpq, k = 10, nprobe = 2, poolMult = 4))})
         |SELECT method, hits, CAST(hits AS DOUBLE) / 50.0 AS recall_at_10
         |FROM (
         |  SELECT 'ivf' AS method, COUNT(*) AS hits FROM i JOIN bf USING (qid, id)
         |  UNION ALL SELECT 'ivfpq', COUNT(*) FROM c JOIN bf USING (qid, id)
         |  UNION ALL SELECT 'lsh', COUNT(*) FROM l JOIN bf USING (qid, id)
         |  UNION ALL SELECT 'pq', COUNT(*) FROM p JOIN bf USING (qid, id))
         |ORDER BY method""".stripMargin
    // ranking-quality report: per-leg MRR/nDCG folds over the same leg
    // oracles the recall report composes; every sum is a list_reduce
    // left fold over rank-/qid-sorted lists mirroring the Spark
    // sort_array+aggregate tree
    def sub3(sql: String) = s"SELECT qid, id, rk FROM ($sql)"
    val qualityLegs = Seq(
      "ivf" -> sub3(ivfOracle(cents, k = 10, nprobe = 2)),
      "ivfpq" -> sub3(ivfpqOracle(ivfpq, k = 10, nprobe = 2, poolMult = 4)),
      "lsh" -> sub3(oracleSql("ann_lsh_topk")),
      "pq" -> sub3(pqOracle(pqBooks, k = 10, poolMult = 4)))
    val qualityCtes = qualityLegs.map { case (name, legSql) =>
      s"""h_$name AS (
         |  SELECT l.qid, l.rk,
         |    CASE WHEN b.id IS NOT NULL THEN 1.0 ELSE 0.0 END AS h
         |  FROM ($legSql) l LEFT JOIN bf b ON b.qid = l.qid AND b.id = l.id),
         |p_$name AS (
         |  SELECT qid, list_sort(list([CAST(rk AS DOUBLE), h])) AS a
         |  FROM h_$name GROUP BY qid),
         |q_$name AS (
         |  SELECT qid,
         |    list_reduce([0.0] || list_transform(a,
         |      e -> e[2] / (ln(e[1] + 1.0) / ln(2.0))),
         |      (p, q) -> p + q) AS dcg,
         |    CASE WHEN len(list_filter(a, e -> e[2] = 1.0)) > 0
         |         THEN 1.0 / list_filter(a, e -> e[2] = 1.0)[1][1]
         |         ELSE 0.0 END AS rr
         |  FROM p_$name),
         |m_$name AS (
         |  SELECT list_sort(list([CAST(f.qid AS DOUBLE),
         |      COALESCE(q.dcg, 0.0), COALESCE(q.rr, 0.0)])) AS a
         |  FROM qq f LEFT JOIN q_$name q ON q.qid = f.qid)""".stripMargin
    }.mkString(",\n")
    val qualitySelects = qualityLegs.map { case (name, _) =>
      s"""SELECT '$name' AS method,
         |  round(list_reduce([0.0] || list_transform(m.a, e -> e[3]),
         |    (p, q) -> p + q) / 5.0, 6) AS mrr_at_10,
         |  round(list_reduce([0.0] || list_transform(m.a, e -> e[2] / ic.v),
         |    (p, q) -> p + q) / 5.0, 6) AS ndcg_at_10
         |FROM m_$name m CROSS JOIN idcg ic""".stripMargin
    }.mkString("\nUNION ALL\n")
    val qualityReport =
      s"""WITH bf AS (${sub(oracleSql("ann_bruteforce_topk"))}),
         |qq AS (SELECT DISTINCT qid FROM bf),
         |idcg AS (
         |  SELECT list_reduce([0.0] || list_transform(range(1, 11),
         |    i -> 1.0 / (ln(CAST(i AS DOUBLE) + 1.0) / ln(2.0))),
         |    (p, q) -> p + q) AS v),
         |$qualityCtes
         |SELECT * FROM ($qualitySelects)
         |ORDER BY method""".stripMargin
    val pca = graft.operators.Pca.trainCached(
      s"embeddings-pca:$sfDir", corpus, "vec", "id", dim = 64,
      components = 4)
    Map(
      "pca_project" -> pcaOracle(pca),
      "ann_ivf_topk" -> ivfOracle(cents, k = 10, nprobe = 2),
      "ann_pq_topk" -> pqOracle(pqBooks, k = 10, poolMult = 4),
      "ann_ivfpq_topk" -> ivfpqOracle(ivfpq, k = 10, nprobe = 2, poolMult = 4),
      "ann_recall_report" -> recallReport,
      "dedup_semantic" -> semDedupOracle(cents, threshold = 0.35),
      "cluster_balanced_sample" -> clusterBalancedOracle(cents, budget = 200),
      "semantic_drift" -> semanticDriftOracle(cents),
      "retrieval_quality_report" -> qualityReport,
      "vocab_bpe_tokenize" -> vocabTokenizeOracle(bpe.vocab,
        graft.operators.Bpe.maxTokenLen(bpe)),
      // D104: the D39 per-doc oracle re-grouped by language — exact
      // integer sums, fertility one divide
      // (plain concatenation — embedding the inner oracle inside a
      // stripMargin block would corrupt its `||` list-concat operators)
      "tokenizer_fertility" ->
        ("WITH base AS (" + vocabTokenizeOracle(bpe.vocab,
            graft.operators.Bpe.maxTokenLen(bpe)) + ")\n" +
          """SELECT d.lang,
            |  CAST(SUM(base.n_words) AS BIGINT) AS n_words,
            |  CAST(SUM(base.n_subtokens) AS BIGINT) AS n_subtokens,
            |  round(CAST(SUM(base.n_subtokens) AS DOUBLE)
            |    / CAST(SUM(base.n_words) AS DOUBLE), 6) AS fertility
            |FROM base JOIN documents d USING (doc_id)
            |GROUP BY d.lang ORDER BY d.lang""".stripMargin))
  }
}
