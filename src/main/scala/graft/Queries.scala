package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Central query registry: every operator claimed in SURVEY.md §2 (plus the
  * training-data extensions) has one entry here, with a DuckDB oracle where
  * the semantics are SQL-expressible (BASELINE.md t2 gate). */
object Queries {

  /** @param oracle   DuckDB SQL over the same parquet tables; None → driver
    *                 records a weaker rows-only check.
    * @param bench    include in the Bench headline set. */
  final case class Q(
      name: String,
      fn: (SparkSession, String) => DataFrame,
      oracle: Option[String],
      bench: Boolean = true)

  val registry: Seq[Q] = Seq(
    // --- KPI family: the reference's core pipeline on `events` ---
    Q("q01_kpi_daily", QueriesKpi.kpiDaily, Some(QueriesKpi.kpiDailySql)),
    Q("q02_json_buckets", QueriesKpi.jsonBuckets, Some(QueriesKpi.jsonBucketsSql)),
    Q("q03_report_endpoint", QueriesKpi.reportEndpoint, Some(QueriesKpi.reportEndpointSql)),
    Q("q04_report_global", QueriesKpi.reportGlobal, Some(QueriesKpi.reportGlobalSql)),
    Q("q05_normalize_endpoints", QueriesKpi.normalizeEndpoints,
      Some(QueriesKpi.normalizeEndpointsSql), bench = false),
    // bench=false: the exact GLOBAL percentile gathers every raw value
    // into one final aggregation buffer by design (it exists to quantify
    // the p90-of-p90 approximation error) — not a scale-representative
    // headline; q53 carries the approx-sketch bench story
    Q("q57_global_p90_exact", QueriesKpi.globalP90Exact,
      Some(QueriesKpi.globalP90ExactSql), bench = false),

    // --- Relational suite on the TPC-H-ish corpus ---
    Q("q10_pricing_summary", QueriesRelational.pricingSummary,
      Some(QueriesRelational.pricingSummarySql)),
    Q("q11_filter_revenue", QueriesRelational.filterRevenue,
      Some(QueriesRelational.filterRevenueSql)),
    Q("q12_join_revenue", QueriesRelational.joinRevenue,
      Some(QueriesRelational.joinRevenueSql)),
    Q("q13_semi_join_priority", QueriesRelational.semiJoinPriority,
      Some(QueriesRelational.semiJoinPrioritySql)),
    Q("q14_anti_join_customers", QueriesRelational.antiJoinCustomers,
      Some(QueriesRelational.antiJoinCustomersSql)),
    Q("q15_top_customers", QueriesRelational.topCustomers,
      Some(QueriesRelational.topCustomersSql)),
    Q("q16_window_top_orders", QueriesRelational.windowTopOrders,
      Some(QueriesRelational.windowTopOrdersSql)),
    Q("q17_window_running_qty", QueriesRelational.windowRunningQty,
      Some(QueriesRelational.windowRunningQtySql)),
    Q("q18_distinct_customers", QueriesRelational.distinctCustomers,
      Some(QueriesRelational.distinctCustomersSql)),
    Q("q19_setops_active_customers", QueriesRelational.setOpsActiveCustomers,
      Some(QueriesRelational.setOpsActiveCustomersSql)),
    Q("q20_rollup_quantities", QueriesRelational.rollupQuantities,
      Some(QueriesRelational.rollupQuantitiesSql)),
    Q("q21_price_buckets", QueriesRelational.priceBuckets,
      Some(QueriesRelational.priceBucketsSql)),
    Q("q22_asof_prev_spend", QueriesRelational.asOfPrevSpend,
      Some(QueriesRelational.asOfPrevSpendSql)),
    Q("q23_range_frame_activity", QueriesRelational.rangeFrameActivity,
      Some(QueriesRelational.rangeFrameActivitySql)),
    Q("q24_range_join_order_pairs", QueriesRelational.rangeJoinOrderPairs,
      Some(QueriesRelational.rangeJoinOrderPairsSql)),
    Q("q25_pivot_priorities", QueriesRelational.pivotOrderPriorities,
      Some(QueriesRelational.pivotOrderPrioritiesSql)),
    Q("q26_grouping_sets", QueriesRelational.groupingSetsQuantities,
      Some(QueriesRelational.groupingSetsQuantitiesSql)),
    Q("q27_cube_quantities", QueriesAnalytics.cubeQuantities,
      Some(QueriesAnalytics.cubeQuantitiesSql)),
    Q("q28_window_suite", QueriesAnalytics.windowSuite,
      Some(QueriesAnalytics.windowSuiteSql)),
    Q("q29_stats_summary", QueriesAnalytics.statsSummary,
      Some(QueriesAnalytics.statsSummarySql)),

    // --- Training-data pipeline: dedup / similarity / text / sessions ---
    Q("q30_dedup_exact", QueriesText.dedupExact, Some(QueriesText.dedupExactSql)),
    Q("q31_dedup_normalized", QueriesText.dedupNormalized,
      Some(QueriesText.dedupNormalizedSql)),
    Q("q32_minhash_pairs", QueriesText.minhashPairs,
      Some(QueriesText.minhashPairsSql)),
    Q("q33_simhash_near_dups", QueriesText.simhashNearDups,
      Some(QueriesText.simhashNearDupsSql)),
    Q("q34_jaccard_pairs", QueriesText.jaccardPairs,
      Some(QueriesText.jaccardPairsSql), bench = false),
    Q("q35_knn_brute", QueriesText.knnBrute, Some(QueriesText.knnBruteSql)),
    Q("q36_lang_id", QueriesText.langId, Some(QueriesText.langIdSql)),
    Q("q37_text_quality", QueriesText.textQuality, Some(QueriesText.textQualitySql)),
    Q("q38_token_counts", QueriesText.tokenCounts, Some(QueriesText.tokenCountsSql)),
    Q("q39_fingerprints", QueriesText.fingerprints,
      Some(QueriesText.fingerprintsSql)),
    Q("q40_sessionize", QueriesText.sessionize, Some(QueriesText.sessionizeSql)),
    Q("q41_knn_lsh", QueriesText.knnLsh, Some(QueriesText.knnLshSql)),
    Q("q42_embedding_near_dups", QueriesText.embeddingNearDups,
      Some(QueriesText.embeddingNearDupsSql)),
    Q("q43_knn_ivf", QueriesText.knnIvf, Some(QueriesText.knnIvfSql)),
    Q("q44_dedup_clusters", QueriesText.dedupClusters,
      Some(QueriesText.dedupClustersSql)),
    Q("q50_multimodal_stats", QueriesText.multimodalStats,
      Some(QueriesText.multimodalStatsSql)),

    // --- Pipeline utilities: sampling / sketches / selection / scrubbing ---
    Q("q45_stratified_sample", QueriesPipeline.stratifiedSample,
      Some(QueriesPipeline.stratifiedSampleSql)),
    Q("q46_approx_distinct", QueriesPipeline.approxDistinct,
      Some(QueriesPipeline.approxDistinctSql)),
    Q("q47_top_docs_per_source", QueriesPipeline.topDocsPerSource,
      Some(QueriesPipeline.topDocsPerSourceSql)),
    Q("q48_tfidf_top_terms", QueriesPipeline.tfidfTopTerms,
      Some(QueriesPipeline.tfidfTopTermsSql)),
    Q("q49_pii_scrub", QueriesPipeline.piiScrub,
      Some(QueriesPipeline.piiScrubSql)),
    Q("q51_url_anatomy", QueriesPipeline.urlAnatomy,
      Some(QueriesPipeline.urlAnatomySql)),
    Q("q52_bloom_semi_join", QueriesPipeline.bloomSemiJoin,
      Some(QueriesPipeline.bloomSemiJoinSql)),
    Q("q53_approx_quantile", QueriesPipeline.approxQuantile,
      Some(QueriesPipeline.approxQuantileSql)),
    Q("q54_salted_agg", QueriesPipeline.saltedAgg,
      Some(QueriesPipeline.saltedAggSql)),
    Q("q55_vocabulary", QueriesPipeline.vocabulary,
      Some(QueriesPipeline.vocabularySql)),
    Q("q56_corpus_prep", QueriesPipeline.corpusPrep,
      Some(QueriesPipeline.corpusPrepSql)),

    // --- Analytics wave 2: optimizer shapes + remaining dimensions ---
    Q("q58_correlated_above_avg", QueriesAnalytics.correlatedAboveAvg,
      Some(QueriesAnalytics.correlatedAboveAvgSql)),
    Q("q59_parts_supply_star", QueriesAnalytics.partsSupplyStar,
      Some(QueriesAnalytics.partsSupplyStarSql)),
    Q("q60_trigram_repetition", QueriesAnalytics.trigramRepetition,
      Some(QueriesAnalytics.trigramRepetitionSql)),
    Q("q61_hourly_event_rollup", QueriesAnalytics.hourlyEventRollup,
      Some(QueriesAnalytics.hourlyEventRollupSql)),
    Q("q62_array_hof_stats", QueriesAnalytics.arrayHofStats,
      Some(QueriesAnalytics.arrayHofStatsSql)),
    Q("q63_argmax_top_order", QueriesAnalytics.argmaxTopOrder,
      Some(QueriesAnalytics.argmaxTopOrderSql)),
    Q("q64_unpivot_buckets", QueriesAnalytics.unpivotBuckets,
      Some(QueriesAnalytics.unpivotBucketsSql)),
    Q("q65_salted_skew_join", QueriesAnalytics.saltedSkewJoin,
      Some(QueriesAnalytics.saltedSkewJoinSql)),
    Q("q66_multimodal_meta", QueriesAnalytics.multimodalMeta,
      Some(QueriesAnalytics.multimodalMetaSql)),
    Q("q67_rare_token_score", QueriesPipeline.rareTokenScore,
      Some(QueriesPipeline.rareTokenScoreSql)),
    Q("q68_zorder_layout", QueriesPipeline.zorderLayout,
      Some(QueriesPipeline.zorderLayoutSql)),
    Q("q69_quantize_embeddings", QueriesText.quantizeEmbeddings,
      Some(QueriesText.quantizeEmbeddingsSql)),
    Q("q70_cms_heavy_hitters", QueriesPipeline.cmsHeavyHitters,
      Some(QueriesPipeline.cmsHeavyHittersSql)),
    Q("q71_column_profile", QueriesPipeline.columnProfile,
      Some(QueriesPipeline.columnProfileSql)),
    Q("q72_upsert_latest", QueriesPipeline.upsertLatest,
      Some(QueriesPipeline.upsertLatestSql)),
    Q("q73_knn_int8", QueriesText.knnInt8, Some(QueriesText.knnInt8Sql)),
    Q("q74_keep_best_dedup", QueriesText.keepBestDedup,
      Some(QueriesText.keepBestDedupSql)),

    // --- Corpus-prep wave 2: sequence-level training-data operators ---
    Q("q75_full_outer_reconcile", QueriesRelational.fullOuterReconcile,
      Some(QueriesRelational.fullOuterReconcileSql)),
    Q("q76_decontaminate", QueriesCorpus.decontaminate,
      Some(QueriesCorpus.decontaminateSql)),
    Q("q77_dup_block_ratio", QueriesCorpus.dupBlockRatio,
      Some(QueriesCorpus.dupBlockRatioSql)),
    Q("q78_chunk_windows", QueriesCorpus.chunkWindows,
      Some(QueriesCorpus.chunkWindowsSql)),
    Q("q79_pack_sequences", QueriesCorpus.packSequences,
      Some(QueriesCorpus.packSequencesSql)),
    Q("q80_domain_reweight", QueriesCorpus.domainReweight,
      Some(QueriesCorpus.domainReweightSql)),
    Q("q81_incremental_dedup", QueriesCorpus.incrementalDedup,
      Some(QueriesCorpus.incrementalDedupSql)),
    Q("q82_corpus_diff", QueriesCorpus.corpusDiff,
      Some(QueriesCorpus.corpusDiffSql)),
    // bench=false: the exact global decile agg deliberately gathers every
    // token count into one percentile buffer (q57's rationale) — the
    // scale path swaps in percentile_approx, which q53 already benches
    Q("q83_quality_deciles", QueriesCorpus.qualityDeciles,
      Some(QueriesCorpus.qualityDecilesSql), bench = false),
    Q("q84_semantic_dedup", QueriesCorpus.semanticDedup,
      Some(QueriesCorpus.semanticDedupSql)),
    Q("q85_gap_fill_hourly", QueriesCorpus.gapFillHourly,
      Some(QueriesCorpus.gapFillHourlySql)),
    Q("q86_scd2_history", QueriesCorpus.scd2History,
      Some(QueriesCorpus.scd2HistorySql)),

    // --- LLM-pipeline wave 3: scrubbing / LM scoring / funnel / mixing ---
    Q("q87_boilerplate_scrub", QueriesCorpus.boilerplateScrub,
      Some(QueriesCorpus.boilerplateScrubSql)),
    Q("q88_unigram_surprisal", QueriesCorpus.unigramSurprisal,
      Some(QueriesCorpus.unigramSurprisalSql)),
    Q("q89_quality_funnel", QueriesText.qualityFunnel,
      Some(QueriesText.qualityFunnelSql)),
    Q("q90_source_overlap", QueriesCorpus.sourceOverlap,
      Some(QueriesCorpus.sourceOverlapSql)),
    Q("q91_bigram_surprisal", QueriesCorpus.bigramSurprisal,
      Some(QueriesCorpus.bigramSurprisalSql)),
    Q("q92_bm25_topk", QueriesCorpus.bm25TopK,
      Some(QueriesCorpus.bm25TopKSql)),
    Q("q93_split_assign", QueriesPipeline.splitAssign,
      Some(QueriesPipeline.splitAssignSql)),

    // --- Wave 4: exact iterative numerics + event-sequence analytics ---
    Q("q94_copurchase_pagerank", QueriesGraph.copurchasePagerank,
      Some(QueriesGraph.copurchasePagerankSql)),
    Q("q95_kmeans_int8", QueriesCluster.kmeansInt8,
      Some(QueriesCluster.kmeansInt8Sql)),
    Q("q96_event_funnel", QueriesGraph.eventFunnel,
      Some(QueriesGraph.eventFunnelSql)),
    Q("q97_markov_transitions", QueriesGraph.markovTransitions,
      Some(QueriesGraph.markovTransitionsSql)),
    Q("q98_embedding_outliers", QueriesCluster.embeddingOutliers,
      Some(QueriesCluster.embeddingOutliersSql)),
    Q("q99_temperature_mix", QueriesCluster.temperatureMix,
      Some(QueriesCluster.temperatureMixSql)),
    Q("q100_dup_spans", QueriesCorpus.dupSpans,
      Some(QueriesCorpus.dupSpansSql)),
    Q("q101_retention_cohorts", QueriesGraph.retentionCohorts,
      Some(QueriesGraph.retentionCohortsSql)),
    Q("q102_triangle_census", QueriesGraph.triangleCensus,
      Some(QueriesGraph.triangleCensusSql)),
    Q("q103_top_paths", QueriesGraph.topPaths,
      Some(QueriesGraph.topPathsSql)),
    Q("q104_rfm_quartiles", QueriesRelational.rfmQuartiles,
      Some(QueriesRelational.rfmQuartilesSql)),
    Q("q105_copurchase_lift", QueriesGraph.copurchaseLift,
      Some(QueriesGraph.copurchaseLiftSql)),
    Q("q106_rate_anomalies", QueriesGraph.rateAnomalies,
      Some(QueriesGraph.rateAnomaliesSql)),
    Q("q107_time_to_convert", QueriesGraph.timeToConvert,
      Some(QueriesGraph.timeToConvertSql)),
    Q("q108_source_similarity", QueriesCorpus.sourceSimilarity,
      Some(QueriesCorpus.sourceSimilaritySql)),
    Q("q109_padding_waste", QueriesCorpus.paddingWaste,
      Some(QueriesCorpus.paddingWasteSql))
  )

  def queries: Map[String, (SparkSession, String) => DataFrame] =
    registry.map(q => q.name -> q.fn).toMap

  def oracleSql: Map[String, String] =
    registry.flatMap(q => q.oracle.map(q.name -> _)).toMap

  def benchNames: Seq[String] = registry.filter(_.bench).map(_.name)
}
