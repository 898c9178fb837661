package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.queries.{Analytics, CdcQueries, DedupQueries, MediaQueries, TextQueries, VectorQueries}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * Every entry in [[queries]] is one operator family from SURVEY §2 (or a
  * beyond-reference LLM-pipeline operator); entries with a matching key in
  * [[oracleSql]] are hash-checked against DuckDB by the driver.
  */
object SparkEntry {

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    Analytics.q5RegionRevenue(spark, "/root/testdata/sf0.001")

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q1_pricing" -> (Analytics.q1Pricing _),
    "q3_top_orders" -> (Analytics.q3TopOrders _),
    "q5_region_revenue" -> (Analytics.q5RegionRevenue _),
    "q6_forecast" -> (Analytics.q6Forecast _),
    "q10_returned" -> (Analytics.q10Returned _),
    "q18_large_orders" -> (Analytics.q18LargeOrders _),
    "q14_promo" -> (Analytics.q14Promo _),
    "q17_small_qty" -> (Analytics.q17SmallQty _),
    "q4_priority" -> (Analytics.q4Priority _),
    "q16_parts_supplier" -> (Analytics.q16PartsSupplier _),
    "q19_disjunctive" -> (Analytics.q19Disjunctive _),
    "q21_blame_supplier" -> (Analytics.q21BlameSupplier _),
    "q22_idle_rich" -> (Analytics.q22IdleRich _),
    "asof_latest_order" -> (Analytics.asofLatestOrder _),
    "semi_join_customers" -> (Analytics.semiJoinCustomers _),
    "anti_join_customers" -> (Analytics.antiJoinCustomers _),
    "setops_orderkeys" -> (Analytics.setOpsOrderkeys _),
    "rollup_revenue" -> (Analytics.rollupRevenue _),
    "cube_revenue" -> (Analytics.cubeRevenue _),
    "distinct_counts" -> (Analytics.distinctCounts _),
    "window_running_total" -> (Analytics.windowRunningTotal _),
    "window_top_events" -> (Analytics.windowTopEvents _),
    "events_tumbling_hour" -> (Analytics.eventsTumblingHour _),
    "events_sliding_hour" -> (Analytics.eventsSlidingHour _),
    "events_sessionize" -> (Analytics.eventsSessionize _),
    "events_percentiles" -> (Analytics.eventsPercentiles _),
    "events_props_agg" -> (Analytics.eventsPropsAgg _),
    "snapshot_scan" -> (Analytics.snapshotScan _),
    "cdc_dedup_latest" -> (CdcQueries.dedupLatest _),
    "cdc_merge_into" -> (CdcQueries.mergeInto _),
    "cdc_merge_composite" -> (CdcQueries.mergeComposite _),
    "dedup_exact" -> (DedupQueries.dedupExact _),
    "dedup_ngram_jaccard" -> (DedupQueries.ngramJaccard _),
    "dedup_minhash_lsh" -> (DedupQueries.minhashLsh _),
    "dedup_simhash" -> (DedupQueries.simhash _),
    "dedup_embedding" -> (DedupQueries.dedupEmbedding _),
    "dedup_clusters" -> (DedupQueries.dedupClusters _),
    "text_tokens" -> (TextQueries.textTokens _),
    "text_quality" -> (TextQueries.textQuality _),
    "text_langid" -> (TextQueries.textLangid _),
    "text_fingerprint" -> (TextQueries.textFingerprint _),
    "corpus_filter" -> (TextQueries.corpusFilter _),
    "corpus_mixture" -> (TextQueries.corpusMixture _),
    "mm_decode_meta" -> (MediaQueries.mmDecodeMeta _),
    "mm_frame_sample" -> (MediaQueries.mmFrameSample _),
    "vec_topk" -> (VectorQueries.vecTopk _),
    "vec_ann_lsh" -> (VectorQueries.vecAnnLsh _),
    "vec_ivf_topk" -> (VectorQueries.vecIvfTopk _),
    "vec_ivf_kmeans" -> (VectorQueries.vecIvfKmeans _),
  )

  def oracleSql: Map[String, String] = Map(
    "q1_pricing" -> Analytics.q1PricingSql,
    "q3_top_orders" -> Analytics.q3TopOrdersSql,
    "q5_region_revenue" -> Analytics.q5RegionRevenueSql,
    "q6_forecast" -> Analytics.q6ForecastSql,
    "q10_returned" -> Analytics.q10ReturnedSql,
    "q18_large_orders" -> Analytics.q18LargeOrdersSql,
    "q14_promo" -> Analytics.q14PromoSql,
    "q17_small_qty" -> Analytics.q17SmallQtySql,
    "q4_priority" -> Analytics.q4PrioritySql,
    "q16_parts_supplier" -> Analytics.q16PartsSupplierSql,
    "q19_disjunctive" -> Analytics.q19DisjunctiveSql,
    "q21_blame_supplier" -> Analytics.q21BlameSupplierSql,
    "q22_idle_rich" -> Analytics.q22IdleRichSql,
    "asof_latest_order" -> Analytics.asofLatestOrderSql,
    "semi_join_customers" -> Analytics.semiJoinCustomersSql,
    "anti_join_customers" -> Analytics.antiJoinCustomersSql,
    "setops_orderkeys" -> Analytics.setOpsOrderkeysSql,
    "rollup_revenue" -> Analytics.rollupRevenueSql,
    "cube_revenue" -> Analytics.cubeRevenueSql,
    "distinct_counts" -> Analytics.distinctCountsSql,
    "window_running_total" -> Analytics.windowRunningTotalSql,
    "window_top_events" -> Analytics.windowTopEventsSql,
    "events_tumbling_hour" -> Analytics.eventsTumblingHourSql,
    "events_sliding_hour" -> Analytics.eventsSlidingHourSql,
    "events_sessionize" -> Analytics.eventsSessionizeSql,
    "events_percentiles" -> Analytics.eventsPercentilesSql,
    "events_props_agg" -> Analytics.eventsPropsAggSql,
    "snapshot_scan" -> Analytics.snapshotScanSql,
    "cdc_dedup_latest" -> CdcQueries.dedupLatestSql,
    "cdc_merge_into" -> CdcQueries.mergeIntoSql,
    "cdc_merge_composite" -> CdcQueries.mergeCompositeSql,
    "dedup_exact" -> DedupQueries.dedupExactSql,
    "dedup_ngram_jaccard" -> DedupQueries.ngramJaccardSql,
    "dedup_minhash_lsh" -> DedupQueries.minhashLshSql,
    "dedup_simhash" -> DedupQueries.simhashSql,
    "dedup_embedding" -> DedupQueries.dedupEmbeddingSql,
    "dedup_clusters" -> DedupQueries.dedupClustersSql,
    "text_tokens" -> TextQueries.textTokensSql,
    "text_quality" -> TextQueries.textQualitySql,
    "text_langid" -> TextQueries.textLangidSql,
    "text_fingerprint" -> TextQueries.textFingerprintSql,
    "corpus_filter" -> TextQueries.corpusFilterSql,
    "corpus_mixture" -> TextQueries.corpusMixtureSql,
    "mm_decode_meta" -> MediaQueries.mmDecodeMetaSql,
    "mm_frame_sample" -> MediaQueries.mmFrameSampleSql,
    "vec_topk" -> VectorQueries.vecTopkSql,
    "vec_ann_lsh" -> VectorQueries.vecAnnLshSql,
    "vec_ivf_topk" -> VectorQueries.vecIvfTopkSql,
    "vec_ivf_kmeans" -> VectorQueries.vecIvfKmeansSql,
  )
}
