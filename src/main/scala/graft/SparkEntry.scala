package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.queries._
import OracleFns._
import OracleFnsTrained._

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
    "cluster_silhouette" -> (VectorQueries.clusterSilhouette _),
    "semantic_drift"     -> (VectorQueries.semanticDrift _),
    "retrieval_quality_report" -> (VectorQueries.retrievalQualityReport _),
    "events_twap"        -> (WarehouseQueries.eventsTwap _),
    "k_anonymity_audit"  -> (TextQueries.kAnonymityAudit _),
    "dedup_unicode"      -> (TextQueries.dedupUnicode _),
    "dedup_recall_report" -> (TextQueries.dedupRecallReport _),
    "dedup_recall_report_sampled" -> (TextQueries.dedupRecallReportSampled _),
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
    "shapley_attribution" -> (WarehouseQueries.shapleyAttribution _),
    "mann_kendall_trend" -> (WarehouseQueries.mannKendallTrend _),
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
    "csv_roundtrip"      -> (ExtendedQueries.csvRoundtrip _),
    "json_roundtrip"     -> (ExtendedQueries.jsonRoundtrip _),
    "snapshot_time_travel" -> (ExtendedQueries.snapshotTimeTravel _),
    "partitioned_lake_write" -> (ExtendedQueries.partitionedLakeWrite _),
    "write_audit_publish" -> (ExtendedQueries.writeAuditPublishGate _),
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
    "stream_multibatch_ci" -> (StreamFaces.streamMultibatchCi _),
    // E11 / E14 run to completion the same way — additive per-batch
    // rows make the read faces ≡ their batch twins exactly
    "stream_quality_totals" -> (StreamFaces.streamQualityTotals _),
    "stream_drift_psi"   -> (StreamFaces.streamDriftPsi _),
    "stream_robust_flags" -> (StreamFaces.streamRobustFlags _),
    "stream_trending_words" -> (StreamFaces.streamTrendingWords _),
    "stream_ab_ttest"    -> (StreamFaces.streamAbTtest _),
    "stream_signal_matrix" -> (StreamFaces.streamSignalMatrix _),
    "stream_holt_forecast" -> (StreamFaces.streamHoltForecast _),
    "stream_value_acf"   -> (StreamFaces.streamValueAcf _),
    "stream_benford"     -> (StreamFaces.streamBenford _),
    "good_turing_vocab"  -> (TextQueries.goodTuringVocab _),
    "stream_source_concentration" -> (StreamFaces.streamSourceConcentration _),
    "stream_watermark_dedup" -> (StreamFaces.streamWatermarkDedup _),
    "stream_upsert_latest" -> (StreamFaces.streamUpsertLatest _),
    "stream_upsert_multibatch" -> (StreamFaces.streamUpsertMultibatch _),
    "stream_url_dedup"   -> (StreamFaces.streamUrlDedup _),
    "stream_admission_multibatch" -> (StreamFaces.streamAdmissionMultibatch _),
    "stream_scd2_history" -> (StreamFaces.streamScd2History _),
    "stream_trending_multibatch" -> (StreamFaces.streamTrendingMultibatch _),
    "stream_media_multibatch" -> (StreamFaces.streamMediaMultibatch _),
    "stream_session_windows" -> (StreamFaces.streamSessionWindows _),
    "stream_perplexity_gate" -> (StreamFaces.streamPerplexityGate _),
    "stream_classifier_gate" -> (StreamFaces.streamClassifierGate _),
    "stream_funnel_steps" -> (StreamFaces.streamFunnelSteps _),
    "stream_dp_release" -> (StreamFaces.streamDpRelease _),
    "stream_corpus_admission" -> (StreamFaces.streamCorpusAdmission _),
    "stream_media_gate" -> (StreamFaces.streamMediaGate _),
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
    "scd2_incremental"   -> (WarehouseQueries.scd2Incremental _),
    "funnel_steps"       -> (WarehouseQueries.funnelSteps _),
    "window_funnel"      -> (WarehouseQueries.windowFunnelDepth _),
    "bucketed_join"      -> (WarehouseQueries.bucketedJoin _),
    "skew_salted_join"   -> (WarehouseQueries.skewSaltedJoin _),
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
    "ab_sprt_monitor"    -> (WarehouseQueries.sprtMonitor _),
    "ab_msprt_monitor"   -> (WarehouseQueries.msprtMonitor _),
    "ab_obf_monitor"     -> (WarehouseQueries.obfMonitor _),
    "ab_yuen_trimmed"    -> (WarehouseQueries.yuenTrimmed _),
    "ab_rate_wilson"     -> (WarehouseQueries.rateWilson _),
    "median_ci"          -> (WarehouseQueries.medianCi _),
    "runs_test"          -> (WarehouseQueries.runsTest _),
    "ab_kruskal_wallis"  -> (WarehouseQueries.kruskalWallis _),
    "ab_anova_f"         -> (WarehouseQueries.anovaF _),
    "ab_levene_var"      -> (WarehouseQueries.leveneVar _),
    "kendall_tau"        -> (WarehouseQueries.kendallTau _),
    "dup_mass_by_source" -> (TextQueries.dupMassBySource _),
    "ab_ratio_delta"     -> (WarehouseQueries.ratioDelta _),
    "value_acf"          -> (WarehouseQueries.valueAcf _),
    "value_pacf"         -> (WarehouseQueries.valuePacf _),
    "sen_slope"          -> (WarehouseQueries.senSlope _),
    "seasonal_decompose" -> (WarehouseQueries.seasonalDecompose _),
    "quality_isotonic"   -> (TextQueries.qualityIsotonic _),
    "degree_assortativity" -> (WarehouseQueries.degreeAssortativity _),
    "pmi_collocations"   -> (TextQueries.pmiCollocations _),
    "keyword_textrank"   -> (TextQueries.keywordTextrank _),
    "keyword_tfidf"      -> (TextQueries.keywordTfidf _),
    "lexical_diversity"  -> (TextQueries.lexicalDiversity _),
    "source_js_divergence" -> (TextQueries.sourceJsDivergence _),
    "assoc_cramers_v"    -> (TextQueries.langSourceCramersV _),
    "ab_mcnemar"         -> (WarehouseQueries.mcnemarConversion _),
    "ab_cochran_q"       -> (WarehouseQueries.cochranQPeriods _),
    "ab_friedman"        -> (WarehouseQueries.friedmanSpend _),
    "ljung_box"          -> (WarehouseQueries.ljungBox _),
    "hurst_exponent"     -> (WarehouseQueries.hurstExponent _),
    "fellegi_sunter_linkage" -> (WarehouseQueries.fellegiSunterLinkage _),
    "fs_em_linkage"      -> (WarehouseQueries.fsEmLinkage _),
    "fs_jw_linkage"      -> (WarehouseQueries.fsJwLinkage _),
    "url_dedup"          -> (TextQueries.urlDedup _),
    "text_fix_encoding"  -> (TextQueries.textFixEncoding _),
    "self_bleu"          -> (TextQueries.selfBleu _),
    "stream_ljung_box"   -> (StreamFaces.streamLjungBox _),
    "granger_causality"  -> (WarehouseQueries.grangerCausality _),
    "jl_projection_audit" -> (VectorQueries.jlProjectionAudit _),
    "stream_cramers_v"   -> (StreamFaces.streamCramersV _),
    "nelson_aalen"       -> (WarehouseQueries.nelsonAalenHazard _),
    "log_rank_test"      -> (WarehouseQueries.logRankTest _),
    "mood_median"        -> (WarehouseQueries.moodMedian _),
    "word_burstiness"    -> (TextQueries.wordBurstiness _),
    "page_trend"         -> (WarehouseQueries.pageTrendSpend _),
    "ab_power_mde"       -> (WarehouseQueries.powerMde _),
    "rake_keywords"      -> (TextQueries.rakeKeywords _),
    "ab_cochran_armitage" -> (WarehouseQueries.cochranArmitageTrend _),
    "code_switch_audit"  -> (TextQueries.codeSwitchAudit _),
    "stream_vocab_monitor" -> (StreamFaces.streamVocabMonitor _),
    "seasonal_mann_kendall" -> (WarehouseQueries.seasonalMannKendall _),
    "pii_density_by_source" -> (TextQueries.piiDensityBySource _),
    "schema_evolution_read" -> (ExtendedQueries.schemaEvolutionRead _),
    "hill_tail_index"    -> (TextQueries.hillTailIndex _),
    "stream_pii_density" -> (StreamFaces.streamPiiDensity _),
    "ab_anderson_darling" -> (WarehouseQueries.andersonDarling _),
    "ab_cmh_test"        -> (WarehouseQueries.cmhTest _),
    "stream_hurst"       -> (StreamFaces.streamHurst _),
    "stream_ab_distribution" -> (StreamFaces.streamAndersonDarling _),
    "ab_wilcoxon_signed" -> (WarehouseQueries.wilcoxonSignedRank _),
    "stream_wilcoxon"    -> (StreamFaces.streamWilcoxon _),
    "ab_alpha_spending"  -> (WarehouseQueries.alphaSpendingMonitor _),
    "ab_alpha_spending_hsd" -> (WarehouseQueries.alphaSpendingHsd _),
    "ab_beta_spending"   -> (WarehouseQueries.betaSpendingMonitor _),
    "ab_alpha_spending_info" -> (WarehouseQueries.alphaSpendingInfo _),
    "stream_alpha_spending" -> (StreamFaces.streamAlphaSpending _),
    "hll_partitioned_distinct_exact" ->
      (ExtendedQueries.hllPartitionedDistinctExact _),
    "ab_sign_test"       -> (WarehouseQueries.signTest _),
    "stream_kruskal_wallis" -> (StreamFaces.streamKruskalWallis _),
    "stream_mood_median" -> (StreamFaces.streamMoodMedian _),
    "turning_point_test" -> (WarehouseQueries.turningPointTest _),
    "theil_u_forecast"   -> (WarehouseQueries.theilUForecast _),
    "ab_post_stratified" -> (WarehouseQueries.postStratifiedSpend _),
    "stream_theil_u"     -> (StreamFaces.streamTheilU _),
    "stream_turning_point" -> (StreamFaces.streamTurningPoint _),
    "weighted_ess"       -> (TextQueries.weightedEss _),
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
    "media_decode_jpeg_witness" -> (MultimodalQueries.mediaDecodeJpegWitness _),
    "media_decode_png"   -> (MultimodalQueries.mediaDecodePng _),
    "media_decode_gif"   -> (MultimodalQueries.mediaDecodeGif _),
    "media_dedup_phash"  -> (MultimodalQueries.mediaDedupPhash _),
    "media_dedup_audio"  -> (MultimodalQueries.mediaDedupAudio _),
    "media_decode_audio" -> (MultimodalQueries.mediaDecodeAudio _),
  )

  /** ANSI SQL oracle per query key (driver runs these in DuckDB and
    * hash-compares). Entries live in the four OracleSql* parts —
    * split by size, same package, concatenated here; key sets are
    * disjoint by construction (duplicate keys would silently shadow,
    * so VerifySpec pins disjointness).
    */
  def oracleSql: Map[String, String] =
    OracleSqlA.sql ++ OracleSqlB.sql ++ OracleSqlC.sql ++ OracleSqlD.sql

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
    // E19: the per-cell noise hash embedded like ann_lsh's hyperplane
    // signs (aggregate-sized: one row per (day, type) cell); counts,
    // the u-derivation, the inverse Laplace CDF, and rounding are
    // recomputed independently in SQL
    val dpCells = {
      import org.apache.spark.sql.functions._
      graft.sources.Tables.events(spark, sfDir)
        .groupBy(window(col("ts"), "1 day").as("w"), col("event_type"))
        .agg(count(lit(1)))
        .select(unix_micros(col("w.start")).as("us"), col("event_type"))
        .withColumn("h", xxhash64(lit(42L), col("us"), col("event_type")))
        .collect()
        .map(r => s"(make_timestamp(${r.getLong(0)}), '${r.getString(1)}', " +
          s"${java.lang.Long.toUnsignedString(r.getLong(2))})")
        .mkString(",\n    ")
    }
    val dpReleaseSql =
      s"""WITH hs AS (SELECT * FROM (VALUES
         |    $dpCells) t(window_start, event_type, hu)),
         |c AS (
         |  SELECT CAST(date_trunc('day', ts) AS TIMESTAMP) AS window_start,
         |    event_type, CAST(COUNT(*) AS BIGINT) AS n_true
         |  FROM events GROUP BY 1, 2),
         |u AS (
         |  SELECT c.window_start, c.event_type, c.n_true,
         |    (CAST(hu // 2048 AS DOUBLE) + 0.5) / 9007199254740992.0 AS uu
         |  FROM c JOIN hs USING (window_start, event_type))
         |SELECT window_start, event_type, n_true,
         |  ROUND(CAST(n_true AS DOUBLE) + CASE WHEN uu < 0.5
         |    THEN 1.0 * ln(2.0 * uu)
         |    ELSE -1.0 * ln(2.0 * (1.0 - uu)) END, 6) AS noisy_count
         |FROM u ORDER BY window_start, event_type""".stripMargin
    // C123: the observed-information fractions come from the SAME
    // day-census fold the plan ran (same table, same session), so the
    // boundary/spend/info literals are bit-identical on both sides
    val infoSpendingSql = {
      import org.apache.spark.sql.functions.{col, date_trunc}
      val fracPct = Seq(20, 50, 80, 100)
      val alpha = 0.05
      val sp = graft.operators.AlphaSpending.obfSpend(alpha) _
      val fracs = graft.operators.AbStats.infoLookFractions(
        graft.sources.Tables.events(spark, sfDir),
        date_trunc("day", col("ts")).cast("date"), fracPct)
      alphaSpendingOracle(fracPct,
        graft.operators.AlphaSpending.boundsRoundedAt(fracs, alpha, sp),
        graft.operators.AlphaSpending.spendRoundedAt(fracs, alpha, sp),
        infoFracs = fracs.map(graft.operators.AlphaSpending.round6))
    }
    // D131: the EM-fitted (m_j, u_j) render as SQL literals via the
    // shortest-round-trip Double repr (the C121/C122 design-literal
    // recipe); the memoized fit guarantees the dump and this render
    // embed IDENTICAL doubles. The pair/flag SQL is D120's oracle
    // verbatim — the two keys differ only in the parameter source.
    val fsEmSql = {
      val prm = WarehouseQueries.fsEmParams(spark, sfDir)
      def wa(j: Int) = s"ln(${prm.m(j)} / ${prm.u(j)})"
      def wd(j: Int) = s"ln((1.0 - ${prm.m(j)}) / (1.0 - ${prm.u(j)}))"
      def term(flag: String, j: Int) =
        s"CASE WHEN $flag THEN ${wa(j)} ELSE ${wd(j)} END"
      s"""WITH c AS (SELECT c_custkey AS id, c_nationkey AS blk,
         |    c_mktsegment AS seg,
         |    CAST(floor(CAST(CAST(CAST(c_acctbal AS DECIMAL(18,2)) * 100
         |      AS BIGINT) AS DOUBLE) / 100000.0) AS BIGINT) AS band,
         |    CAST(CAST(c_acctbal AS DECIMAL(18,2)) * 100 AS BIGINT) >= 0
         |      AS sign
         |  FROM customer),
         |p AS (SELECT a.id AS id_a, b.id AS id_b,
         |    a.seg IS NOT DISTINCT FROM b.seg AS agree_seg,
         |    a.band IS NOT DISTINCT FROM b.band AS agree_band,
         |    a.sign IS NOT DISTINCT FROM b.sign AS agree_sign
         |  FROM c a JOIN c b ON a.blk = b.blk AND a.id < b.id)
         |SELECT id_a, id_b, agree_seg, agree_band, agree_sign,
         |  round((${term("agree_seg", 0)}
         |    + ${term("agree_band", 1)})
         |    + ${term("agree_sign", 2)}, 6) AS score
         |FROM p ORDER BY score DESC, id_a, id_b LIMIT 50""".stripMargin
    }
    Map(
      "fs_em_linkage" -> fsEmSql,
      // A4: override the static (sf0.01-pinned) entry with the path
      // derived from THIS run's SF dir, mirroring the Spark side
      "csv_ingest" -> OracleSqlA.csvIngestSql(new java.io.File(sfDir).getName),
      "ab_alpha_spending_info" -> infoSpendingSql,
      "stream_dp_release" -> dpReleaseSql,
      "pca_project" -> pcaOracle(pca),
      "ann_ivf_topk" -> ivfOracle(cents, k = 10, nprobe = 2),
      "cluster_silhouette" -> silhouetteOracle(cents),
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
