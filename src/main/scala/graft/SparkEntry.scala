package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.queries.{CoreQueries, CurationQueries, ExtensionQueries, IbtpQueries, StreamingQueries, TemporalQueries}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * `queries` covers SURVEY §2's operator inventory (B1–B17) plus the
  * north-star extension operators (dedup / similarity / text analysis /
  * multimodal). Every oracle-expressible query has a matching
  * `oracleSql` entry with identical column names. The near-dup
  * pipelines (q21/q22/q33) bench the PRODUCTION capped pipelines
  * (maxBucket=256, exact-copy collapse) and their oracles are FULL
  * DuckDB replays — token/shingle hashes, band or block or hyperplane
  * bucketing, the bucket cap, candidate generation, and the exact
  * verify, all in exact 64-bit modular arithmetic — so WHICH pairs
  * each capped scheme emits is pinned at every scale. The quadratic
  * ground truths (LSH ⊆ exact all-pairs + planted recall) live
  * spec-side in ExtensionOpsSpec; q30's oracle reimplements the winnowing
  * fingerprint the same way; q25's oracle reimplements the ENTIRE
  * hyperplane-LSH pipeline (plane matrix, buckets, candidates,
  * ranking) in exact DuckDB arithmetic; q34 encodes its sketch error
  * bounds as oracled booleans next to hard-compared exact counts.
  * Recall stays spec-side (planted-duplicate recall in ScalaTest).
  * q31's oracle regenerates the expected pixels and PCM samples from
  * the fixture's splitmix64 derivations in exact 64-bit SQL
  * arithmetic and recomputes luma/color/duration/RMS with the same
  * integer-exact accumulations the codecs use, so the REAL
  * `javax.imageio`/`javax.sound.sampled` decode path is hash-gated
  * end to end; only the container-level byte statistics
  * (deflate-dependent) stay spec-side. Every query is oracled.
  */
object SparkEntry {

  /** Flagship on sf0.001: the full materialization loop (day period)
    * over events — the engine's defining end-to-end path.
    */
  def entry(spark: SparkSession): DataFrame =
    IbtpQueries.loopDaily(spark, "/root/testdata/sf0.001")

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // core SQL surface (SURVEY §2.B)
    "q01_scan_filter_project" -> (CoreQueries.scanFilterProject _),
    "q02_agg_pricing_summary" -> (CoreQueries.aggPricingSummary _),
    "q03_minmax_boundary_probe" -> (CoreQueries.minmaxBoundaryProbe _),
    "q04_join_broadcast_revenue" -> (CoreQueries.joinBroadcastRevenue _),
    "q05_join_orders_priority" -> (CoreQueries.joinOrdersPriority _),
    "q06_semi_join_big_quantity" -> (CoreQueries.semiJoinBigQuantity _),
    "q07_anti_join_customers_no_orders" -> (CoreQueries.antiJoinCustomersNoOrders _),
    "q08_window_running_shipments" -> (CoreQueries.windowRunningShipments _),
    "q09_date_scalars" -> (CoreQueries.dateScalars _),
    "q10_conditional_scalars" -> (CoreQueries.conditionalScalars _),
    "q11_cte_set_ops" -> (CoreQueries.cteSetOps _),
    "q12_rollup_quantities" -> (CoreQueries.rollupQuantities _),
    "q13_topk_orders" -> (CoreQueries.topKOrders _),
    "q14_json_extract_events" -> (CoreQueries.jsonExtractEvents _),
    "q15_events_daily_agg" -> (CoreQueries.eventsDailyAgg _),
    // the materialization loop itself (loop ≡ one-shot)
    "q16_ibtp_loop_daily" -> (IbtpQueries.loopDaily _),
    "q17_ibtp_loop_weekly" -> (IbtpQueries.loopWeekly _),
    "q48_ibtp_loop_monthly" -> (IbtpQueries.loopMonthly _),
    "q49_ibtp_backfill" -> (IbtpQueries.loopBackfill _),
    "q50_ibtp_upsert" -> (IbtpQueries.loopUpsert _),
    "q58_ibtp_full_refresh" -> (IbtpQueries.loopFullRefresh _),
    "q59_schema_widen" -> (IbtpQueries.loopSchemaWiden _),
    "q60_unique_check" -> (IbtpQueries.loopUniqueCheck _),
    // extension operators (north star)
    "q18_sessionize" -> (ExtensionQueries.sessionize _),
    "q20_dedup_exact" -> (ExtensionQueries.dedupExact _),
    "q21_dedup_minhash" -> (ExtensionQueries.dedupMinhash _),
    "q22_dedup_simhash" -> (ExtensionQueries.dedupSimhash _),
    "q23_ngram_jaccard" -> (ExtensionQueries.ngramJaccardPlanted _),
    "q33_dedup_embedding" -> (ExtensionQueries.dedupEmbedding _),
    "q34_approx_event_stats" -> (ExtensionQueries.approxEventStats _),
    "q35_salted_join_revenue" -> (ExtensionQueries.saltedJoinRevenue _),
    "q24_similarity_bruteforce" -> (ExtensionQueries.similarityBruteForce _),
    "q25_similarity_lsh" -> (ExtensionQueries.similarityLsh _),
    "q26_ivf_assignments" -> (ExtensionQueries.ivfAssignments _),
    "q32_ivf_search" -> (ExtensionQueries.ivfSearch _),
    "q36_kmeans_step" -> (ExtensionQueries.kmeansStep _),
    "q27_text_quality" -> (ExtensionQueries.textQuality _),
    "q28_lang_id" -> (ExtensionQueries.langId _),
    "q29_token_counts" -> (ExtensionQueries.tokenCounts _),
    "q30_fingerprint_stats" -> (ExtensionQueries.fingerprintStats _),
    "q31_multimodal_features" -> (ExtensionQueries.multimodalFeatures _),
    // corpus curation (deterministic sampling, decontamination, stats)
    "q37_stratified_sample" -> (CurationQueries.stratifiedSample _),
    "q38_uniform_mixture" -> (CurationQueries.uniformMixture _),
    "q39_decontaminate" -> (CurationQueries.decontaminate _),
    "q40_latest_per_key" -> (CurationQueries.latestPerKey _),
    "q41_token_topk" -> (CurationQueries.tokenTopK _),
    "q42_quantile_filter" -> (CurationQueries.quantileFilter _),
    "q43_chunk_documents" -> (CurationQueries.chunkDocuments _),
    "q44_best_per_source" -> (CurationQueries.bestPerSource _),
    // temporal joins (as-of, point-in-interval)
    "q45_asof_join" -> (TemporalQueries.asofJoin _),
    "q46_range_join" -> (TemporalQueries.rangeJoin _),
    "q47_bloom_pruned_join" -> (ExtensionQueries.bloomPrunedJoin _),
    "q51_pack_batches" -> (CurationQueries.packBatches _),
    "q52_tfidf_top_terms" -> (CurationQueries.tfidfTopTerms _),
    "q53_exact_k_sample" -> (CurationQueries.exactKSample _),
    "q54_source_data_card" -> (CurationQueries.sourceDataCard _),
    "q55_value_histogram" -> (CurationQueries.valueHistogram _),
    "q56_repetition_metrics" -> (ExtensionQueries.repetitionMetrics _),
    "q57_quality_flags" -> (ExtensionQueries.qualityFlags _),
    "q61_redact_pii" -> (ExtensionQueries.redactPii _),
    "q62_cluster_assign" -> (ExtensionQueries.clusterAssign _),
    "q63_interval_overlap" -> (TemporalQueries.intervalOverlap _),
    "q64_span_dedup" -> (CurationQueries.spanDedup _),
    "q65_normalize_text" -> (ExtensionQueries.normalizeText _),
    "q66_containment_pairs" -> (ExtensionQueries.containmentPairs _),
    "q67_text_knn" -> (ExtensionQueries.textKnn _),
    "q68_funnel" -> (ExtensionQueries.funnelConversion _),
    "q69_rolling_window" -> (TemporalQueries.rollingWindow _),
    "q70_grouped_quantiles" -> (CurationQueries.groupedQuantiles _),
    "q71_weighted_sample" -> (CurationQueries.weightedSample _),
    "q72_winsorize" -> (CurationQueries.winsorize _),
    "q73_cohort_retention" -> (TemporalQueries.cohortRetention _),
    "q74_semantic_dedup" -> (ExtensionQueries.semanticDedup _),
    "q75_cube_order_stats" -> (CoreQueries.cubeOrderStats _),
    "q76_pivot_event_counts" -> (CoreQueries.pivotEventCounts _),
    "q77_mad_outliers" -> (CurationQueries.madOutliers _),
    "q79_rrf_fusion" -> (ExtensionQueries.rrfFusion _),
    "q80_table_profile" -> (CurationQueries.tableProfile _),
    "q81_bpe_merges" -> (ExtensionQueries.bpeMerges _),
    "q82_lm_perplexity" -> (ExtensionQueries.lmPerplexity _),
    "q83_stream_catchup" -> (StreamingQueries.streamCatchup _),
    "q84_period_autosize" -> (IbtpQueries.loopAutoSized _),
    "q85_rewrite_widen" -> (IbtpQueries.loopRewriteWiden _),
    "q86_compact_cluster" -> (IbtpQueries.compactCluster _),
    "q87_skip_read" -> (IbtpQueries.skipRead _),
    "q88_chunk_dedup" -> (CurationQueries.chunkDedup _),
    "q89_bpe_encode" -> (ExtensionQueries.bpeEncode _),
    "q90_dsir_weights" -> (ExtensionQueries.dsirWeights _),
    "q91_temperature_mixture" -> (CurationQueries.temperatureMixture _),
    "q92_zorder_read" -> (IbtpQueries.zorderRead _),
    "q93_set_read" -> (IbtpQueries.setRead _),
    "q94_substring_scrub" -> (CurationQueries.substringScrub _),
    "q95_pq_search" -> (ExtensionQueries.pqSearch _),
    "q96_bm25_search" -> (ExtensionQueries.bm25Search _),
    "q97_hybrid_retrieval" -> (ExtensionQueries.hybridRetrieval _),
    "q98_concurrent_append" -> (IbtpQueries.concurrentAppend _),
    "q99_bm25_index_search" -> (ExtensionQueries.bm25IndexSearch _),
    "q100_pq_index_search" -> (ExtensionQueries.pqIndexSearch _),
    "q101_ivfpq_search" -> (ExtensionQueries.ivfPqSearch _),
    "q102_ivfpq_index_search" -> (ExtensionQueries.ivfPqIndexSearch _),
    "q103_bm25_loop_index" -> (ExtensionQueries.bm25LoopIndexSearch _),
    "q104_concurrent_backfill" -> (IbtpQueries.concurrentBackfill _),
    "q105_ivfpq_loop_index" -> (ExtensionQueries.ivfPqLoopIndexSearch _),
  )

  def oracleSql: Map[String, String] = Map(
    "q01_scan_filter_project" -> CoreQueries.scanFilterProjectSql,
    "q02_agg_pricing_summary" -> CoreQueries.aggPricingSummarySql,
    "q03_minmax_boundary_probe" -> CoreQueries.minmaxBoundaryProbeSql,
    "q04_join_broadcast_revenue" -> CoreQueries.joinBroadcastRevenueSql,
    "q05_join_orders_priority" -> CoreQueries.joinOrdersPrioritySql,
    "q06_semi_join_big_quantity" -> CoreQueries.semiJoinBigQuantitySql,
    "q07_anti_join_customers_no_orders" -> CoreQueries.antiJoinCustomersNoOrdersSql,
    "q08_window_running_shipments" -> CoreQueries.windowRunningShipmentsSql,
    "q09_date_scalars" -> CoreQueries.dateScalarsSql,
    "q10_conditional_scalars" -> CoreQueries.conditionalScalarsSql,
    "q11_cte_set_ops" -> CoreQueries.cteSetOpsSql,
    "q12_rollup_quantities" -> CoreQueries.rollupQuantitiesSql,
    "q13_topk_orders" -> CoreQueries.topKOrdersSql,
    "q14_json_extract_events" -> CoreQueries.jsonExtractEventsSql,
    "q15_events_daily_agg" -> CoreQueries.eventsDailyAggSql,
    "q16_ibtp_loop_daily" -> IbtpQueries.loopOracleSql,
    "q17_ibtp_loop_weekly" -> IbtpQueries.loopOracleSql,
    "q48_ibtp_loop_monthly" -> IbtpQueries.loopOracleSql,
    "q49_ibtp_backfill" -> IbtpQueries.loopOracleSql,
    "q50_ibtp_upsert" -> IbtpQueries.loopOracleSql,
    "q58_ibtp_full_refresh" -> IbtpQueries.loopOracleSql,
    "q59_schema_widen" -> IbtpQueries.loopOracleSql,
    "q60_unique_check" -> IbtpQueries.loopUniqueCheckSql,
    "q18_sessionize" -> ExtensionQueries.sessionizeSql,
    "q20_dedup_exact" -> ExtensionQueries.dedupExactSql,
    "q21_dedup_minhash" -> ExtensionQueries.dedupMinhashSql,
    "q22_dedup_simhash" -> ExtensionQueries.dedupSimhashSql,
    "q33_dedup_embedding" -> ExtensionQueries.dedupEmbeddingSql,
    "q23_ngram_jaccard" -> ExtensionQueries.ngramJaccardPlantedSql,
    "q24_similarity_bruteforce" -> ExtensionQueries.similarityBruteForceSql,
    "q25_similarity_lsh" -> ExtensionQueries.similarityLshSql,
    "q26_ivf_assignments" -> ExtensionQueries.ivfAssignmentsSql,
    "q27_text_quality" -> ExtensionQueries.textQualitySql,
    "q28_lang_id" -> ExtensionQueries.langIdSql,
    "q29_token_counts" -> ExtensionQueries.tokenCountsSql,
    "q30_fingerprint_stats" -> ExtensionQueries.fingerprintStatsSql,
    "q31_multimodal_features" -> ExtensionQueries.multimodalFeaturesSql,
    "q32_ivf_search" -> ExtensionQueries.ivfSearchSql,
    "q36_kmeans_step" -> ExtensionQueries.kmeansStepSql,
    "q34_approx_event_stats" -> ExtensionQueries.approxEventStatsSql,
    "q35_salted_join_revenue" -> ExtensionQueries.saltedJoinRevenueSql,
    "q37_stratified_sample" -> CurationQueries.stratifiedSampleSql,
    "q38_uniform_mixture" -> CurationQueries.uniformMixtureSql,
    "q39_decontaminate" -> CurationQueries.decontaminateSql,
    "q40_latest_per_key" -> CurationQueries.latestPerKeySql,
    "q41_token_topk" -> CurationQueries.tokenTopKSql,
    "q42_quantile_filter" -> CurationQueries.quantileFilterSql,
    "q43_chunk_documents" -> CurationQueries.chunkDocumentsSql,
    "q44_best_per_source" -> CurationQueries.bestPerSourceSql,
    "q45_asof_join" -> TemporalQueries.asofJoinSql,
    "q46_range_join" -> TemporalQueries.rangeJoinSql,
    "q47_bloom_pruned_join" -> ExtensionQueries.bloomPrunedJoinSql,
    "q51_pack_batches" -> CurationQueries.packBatchesSql,
    "q52_tfidf_top_terms" -> CurationQueries.tfidfTopTermsSql,
    "q53_exact_k_sample" -> CurationQueries.exactKSampleSql,
    "q54_source_data_card" -> CurationQueries.sourceDataCardSql,
    "q55_value_histogram" -> CurationQueries.valueHistogramSql,
    "q56_repetition_metrics" -> ExtensionQueries.repetitionMetricsSql,
    "q57_quality_flags" -> ExtensionQueries.qualityFlagsSql,
    "q61_redact_pii" -> ExtensionQueries.redactPiiSql,
    "q62_cluster_assign" -> ExtensionQueries.clusterAssignSql,
    "q63_interval_overlap" -> TemporalQueries.intervalOverlapSql,
    "q64_span_dedup" -> CurationQueries.spanDedupSql,
    "q65_normalize_text" -> ExtensionQueries.normalizeTextSql,
    "q66_containment_pairs" -> ExtensionQueries.containmentPairsSql,
    "q67_text_knn" -> ExtensionQueries.textKnnSql,
    "q68_funnel" -> ExtensionQueries.funnelConversionSql,
    "q69_rolling_window" -> TemporalQueries.rollingWindowSql,
    "q70_grouped_quantiles" -> CurationQueries.groupedQuantilesSql,
    "q71_weighted_sample" -> CurationQueries.weightedSampleSql,
    "q72_winsorize" -> CurationQueries.winsorizeSql,
    "q73_cohort_retention" -> TemporalQueries.cohortRetentionSql,
    "q74_semantic_dedup" -> ExtensionQueries.semanticDedupSql,
    "q75_cube_order_stats" -> CoreQueries.cubeOrderStatsSql,
    "q76_pivot_event_counts" -> CoreQueries.pivotEventCountsSql,
    "q77_mad_outliers" -> CurationQueries.madOutliersSql,
    "q79_rrf_fusion" -> ExtensionQueries.rrfFusionSql,
    "q80_table_profile" -> CurationQueries.tableProfileSql,
    "q81_bpe_merges" -> ExtensionQueries.bpeMergesSql,
    "q82_lm_perplexity" -> ExtensionQueries.lmPerplexitySql,
    "q83_stream_catchup" -> StreamingQueries.streamCatchupSql,
    "q84_period_autosize" -> IbtpQueries.loopOracleSql,
    "q85_rewrite_widen" -> IbtpQueries.loopRewriteWidenSql,
    "q86_compact_cluster" -> IbtpQueries.compactClusterSql,
    "q87_skip_read" -> IbtpQueries.skipReadSql,
    "q88_chunk_dedup" -> CurationQueries.chunkDedupSql,
    "q89_bpe_encode" -> ExtensionQueries.bpeEncodeSql,
    "q90_dsir_weights" -> ExtensionQueries.dsirWeightsSql,
    "q91_temperature_mixture" -> CurationQueries.temperatureMixtureSql,
    "q92_zorder_read" -> IbtpQueries.zorderReadSql,
    "q93_set_read" -> IbtpQueries.setReadSql,
    "q94_substring_scrub" -> CurationQueries.substringScrubSql,
    "q95_pq_search" -> ExtensionQueries.pqSearchSql,
    "q96_bm25_search" -> ExtensionQueries.bm25SearchSql,
    "q97_hybrid_retrieval" -> ExtensionQueries.hybridRetrievalSql,
    "q98_concurrent_append" -> IbtpQueries.concurrentAppendSql,
    "q99_bm25_index_search" -> ExtensionQueries.bm25IndexSearchSql,
    "q100_pq_index_search" -> ExtensionQueries.pqIndexSearchSql,
    "q101_ivfpq_search" -> ExtensionQueries.ivfPqSearchSql,
    "q102_ivfpq_index_search" -> ExtensionQueries.ivfPqIndexSearchSql,
    "q103_bm25_loop_index" -> ExtensionQueries.bm25LoopIndexSearchSql,
    "q104_concurrent_backfill" -> IbtpQueries.concurrentBackfillSql,
    "q105_ivfpq_loop_index" -> ExtensionQueries.ivfPqLoopIndexSearchSql,
  )
}
