package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.analytics.{CorpusQueries, DeltaBridgeQueries, MutationQueries, OlapQueries, RetrievalQueries, SamplingQueries, ScalarQueries, SqlDmlQueries, TemporalQueries, Views}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * Every implemented operator from SURVEY.md §2 appears as a named entry in
  * [[queries]]; where the semantics are ANSI-SQL-expressible the matching
  * DuckDB oracle lives in [[oracleSql]] (column names aliased identically on
  * both sides — the driver sorts columns by name before hashing).
  */
object SparkEntry {

  /** The reference's frozen Delta `customers` table — q126-q128's queries
    * run the [[graft.sources.DeltaImport]] bridge over a scratch COPY of
    * it; the oracles read the exact part-files its log resolves to. */
  private val DeltaFixture = "/root/reference/deltalake/customers"

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0.
    * The reference's flagship MV `customer_order_summary`
    * (init-risingwave.sql:84-94).
    */
  def entry(spark: SparkSession): DataFrame =
    Views.customerOrderSummary(spark, "/root/testdata/sf0.001")

  type Q = (SparkSession, String) => DataFrame

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, Q] = Map[String, Q](
    "q1_order_analytics"     -> (Views.orderAnalytics _),
    "q2_customer_order_summary" -> (Views.customerOrderSummary _),
    "q3_product_popularity"  -> (Views.productPopularity _),
    "q4_items_per_order"     -> (Views.itemsPerOrder _),
    "q5_stock_status"        -> (Views.stockStatus _),
    "q6_customer_stats_by_nation" -> (Views.customerStatsByNation _),
    "q7_revenue_per_nation"  -> (Views.revenuePerNation _),
    "q8_pricing_summary"     -> (Views.pricingSummary _),
    "q9_table_summary"       -> (Views.tableSummary _),
    "q10_merge_upsert"       -> (MutationQueries.mergeUpsert _),
    "q11_delete_where"       -> (MutationQueries.deleteWhere _),
    "q12_time_travel"        -> (MutationQueries.timeTravel _),
    "q13_change_feed"        -> (MutationQueries.changeFeed _),
    "q14_history"            -> (MutationQueries.history _),
    "q15_latest_event_per_user" -> (MutationQueries.latestEventPerUser _),
    "q16_version_diff"       -> (MutationQueries.versionDiff _),
    "q17_json_parse"         -> (ScalarQueries.jsonParse _),
    "q18_scalar_surface"     -> (ScalarQueries.scalarSurface _),
    "q19_event_stats"        -> (ScalarQueries.eventStats _),
    "q20_token_stats"        -> (CorpusQueries.tokenStats _),
    "q21_lang_id"            -> (CorpusQueries.langIdQuery _),
    "q22_fingerprints"       -> (CorpusQueries.fingerprints _),
    "q23_exact_dedup"        -> (CorpusQueries.exactDedup _),
    "q24_tokenset_dedup"     -> (CorpusQueries.tokenSetDedup _),
    "q25_minhash_neardup"    -> (CorpusQueries.minhashNearDups _),
    "q26_simhash_neardup"    -> (CorpusQueries.simhashNearDups _),
    "q27_ngram_jaccard"      -> (CorpusQueries.ngramJaccard _),
    "q28_cosine_topk"        -> (CorpusQueries.cosineTopK _),
    "q29_embedding_neardup"  -> (CorpusQueries.embeddingNearDups _),
    "q30_embedding_neardup_lsh" -> (CorpusQueries.embeddingNearDupsLsh _),
    "q31_cosine_topk_lsh"    -> (CorpusQueries.cosineTopKLsh _),
    "q32_hourly_events"      -> (graft.streaming.EventWindows.hourlyEventStats _),
    "q33_media_features"     -> ((s, d) =>
      graft.multimodal.Multimodal.mediaFeatureSummary(s, Tables.documents(s, d))),
    "q34_asof_join"          -> (TemporalQueries.asofOrderStats _),
    "q35_revenue_rollup"     -> (OlapQueries.revenueRollup _),
    "q36_event_sessions"     -> (OlapQueries.eventSessions _),
    "q37_segment_stats"      -> (OlapQueries.segmentStats _),
    "q38_topk_per_key"       -> (OlapQueries.topOrdersPerCustomer _),
    "q39_decimal_pricing"    -> (OlapQueries.decimalPricing _),
    "q40_range_join"         -> (TemporalQueries.eventsNearErrors _),
    "q41_quality_score"      -> (CorpusQueries.qualityScores _),
    "q42_supplier_stats"     -> (OlapQueries.supplierStats _),
    "q43_sql_text_path"      -> (OlapQueries.sqlTextPath _),
    "q44_ivf_topk"           -> (CorpusQueries.ivfTopK _),
    "q45_partition_prune"    -> (MutationQueries.partitionPrune _),
    "q46_zorder_scan"        -> (MutationQueries.zorderScan _),
    "q47_bpe_tokenize"       -> (CorpusQueries.bpeTokenize _),
    "q48_pq_topk"            -> (CorpusQueries.pqTopK _),
    "q49_window_suite"       -> (OlapQueries.windowSuite _),
    "q50_segment_cube"       -> (OlapQueries.segmentPriorityCube _),
    "q51_set_ops"            -> (OlapQueries.customerSetOps _),
    "q52_string_funcs"       -> (OlapQueries.stringFunctions _),
    "q53_percentiles"        -> (OlapQueries.pricePercentiles _),
    "q54_datetime_suite"     -> (OlapQueries.datetimeSuite _),
    "q55_outer_join_audit"   -> (OlapQueries.outerJoinAudit _),
    "q56_semi_anti"          -> (OlapQueries.semiAntiJoins _),
    "q57_repetition_signals" -> (CorpusQueries.repetitionSignals _),
    "q58_text_scrub"         -> (CorpusQueries.scrubText _),
    "q59_hash_split"         -> ((s, d) => SamplingQueries.hashSplit(s, d)),
    "q62_event_pivot"        -> (OlapQueries.eventPivot _),
    "q64_ivfpq_topk"         -> (CorpusQueries.ivfPqTopK _),
    "q65_pack_payloads"      -> ((s, d) => SamplingQueries.packedPayloads(s, d)),
    "q67_approx_stats"       -> (OlapQueries.approxStats _),
    "q68_salted_distinct"    -> (OlapQueries.saltedUserCounts _),
    "q66_decontaminate"      -> ((s, d) => SamplingQueries.decontaminate(s, d)),
    "q63_order_unpivot"      -> (OlapQueries.orderMeasuresLong _),
    "q60_quota_sample"       -> ((s, d) => SamplingQueries.quotaSample(s, d)),
    "q61_pack_sequences"     -> ((s, d) => SamplingQueries.packSequences(s, d)),
    "q69_tfidf_topterms"     -> (CorpusQueries.tfidfTopTerms _),
    "q70_unigram_lm"         -> (CorpusQueries.unigramLm _),
    "q71_corpus_filter"      -> (CorpusQueries.corpusFilter _),
    "q72_ivf_index_probe"    -> (CorpusQueries.ivfIndexProbe _),
    "q73_dup_clusters"       -> (CorpusQueries.dupClusters _),
    "q74_subquery_suite"     -> (OlapQueries.subquerySuite _),
    "q75_source_mix"         -> ((s, d) => SamplingQueries.sourceMix(s, d)),
    "q76_decontaminate_bloom" -> ((s, d) => SamplingQueries.decontaminateBloom(s, d)),
    "q77_grouping_sets"      -> (OlapQueries.groupingSets _),
    "q78_hourly_gap_fill"    -> (OlapQueries.hourlyGapFill _),
    "q79_array_funcs"        -> (OlapQueries.arrayFunctions _),
    "q80_trailing_window"    -> (OlapQueries.trailingSpend _),
    "q81_dup_clusters_lsh"   -> (CorpusQueries.dupClustersLsh _),
    "q82_salted_join"        -> (OlapQueries.saltedEnrich _),
    "q83_mor_delete"         -> (MutationQueries.morDeleteWhere _),
    "q84_bigram_lm"          -> (CorpusQueries.bigramLm _),
    "q85_embedding_stats"    -> (CorpusQueries.embeddingStats _),
    "q86_clean_corpus"       -> (CorpusQueries.cleanCorpus _),
    "q87_dedup_report"       -> (CorpusQueries.dedupReport _),
    "q88_dv_delete"          -> (MutationQueries.dvDeleteWhere _),
    "q89_dv_update"          -> (MutationQueries.dvUpdateWhere _),
    "q90_dv_purge"           -> (MutationQueries.dvPurgeRead _),
    "q91_point_lookup"       -> (MutationQueries.pointLookup _),
    "q92_string_range_skip"  -> (MutationQueries.priorityRange _),
    "q93_predicate_skip"     -> (MutationQueries.predicateSkip _),
    "q94_null_skip"          -> (MutationQueries.nullSkip _),
    "q95_sql_skip"           -> (MutationQueries.sqlSkip _),
    "q96_optimize_where"     -> (MutationQueries.optimizeWhereRead _),
    "q97_replace_where"      -> (MutationQueries.replaceWhereRead _),
    "q98_metadata_count"     -> (MutationQueries.metadataCountSql _),
    "q99_metadata_minmax"    -> (MutationQueries.metadataMinMaxSql _),
    "q100_convert"           -> (MutationQueries.convertRead _),
    "q101_drop_column"       -> (MutationQueries.dropColumnRead _),
    "q102_chunk_documents"   -> (CorpusQueries.chunkDocuments _),
    "q103_generated_column"  -> (MutationQueries.generatedColumnRead _),
    "q104_identity_column"   -> (MutationQueries.identityColumnSummary _),
    "q105_manifest_read"     -> (MutationQueries.manifestExternalRead _),
    "q106_rename_column"     -> (MutationQueries.renameColumnRead _),
    "q107_reorg_readd"       -> (MutationQueries.reorgReaddRead _),
    "q108_time_travel_ts"    -> (MutationQueries.timeTravelByTimestamp _),
    "q109_substring_stats"   -> (CorpusQueries.substringDupStats _),
    "q110_substring_scrub"   -> (CorpusQueries.substringScrub _),
    "q111_semantic_dedup"    -> (CorpusQueries.semanticDedup _),
    "q112_corpus_shuffle"    -> ((s, d) => SamplingQueries.corpusShuffle(s, d)),
    "q113_restore"           -> (MutationQueries.restoreRead _),
    "q114_bm25_retrieval"    -> ((s, d) => RetrievalQueries.bm25Retrieval(s, d)),
    "q115_inverted_index"    -> (RetrievalQueries.invertedIndex _),
    "q116_lm_quality_filter" -> (CorpusQueries.lmQualityFilter _),
    "q117_stratified_sample" -> (SamplingQueries.stratifiedSample _),
    "q118_scd2_dimension"    -> (MutationQueries.scd2Snapshot _),
    "q119_pii_redact"        -> (CorpusQueries.piiRedaction _),
    "q120_pit_enrich"        -> (MutationQueries.pitEnrichment _),
    "q121_temperature_mix"   -> (SamplingQueries.temperatureMix _),
    "q122_datacard"          -> (CorpusQueries.datacard _),
    "q123_connector_read"    -> (MutationQueries.connectorRead _),
    "q124_column_profile"    -> (OlapQueries.columnProfile _),
    "q125_url_canon"         -> (CorpusQueries.urlCanonicalize _),
    "q126_delta_import"      -> (DeltaBridgeQueries.deltaImport _),
    "q127_delta_time_travel" -> (DeltaBridgeQueries.deltaTimeTravel _),
    "q128_delta_cdf"         -> (DeltaBridgeQueries.deltaCdf _),
    "q129_scd2_stream"       -> (MutationQueries.scd2Stream _),
    "q130_delta_export"      -> (DeltaBridgeQueries.deltaExportRoundtrip _),
    "q131_delta_skip"        -> (DeltaBridgeQueries.deltaSkipRead _),
    "q132_sql_delete"        -> (SqlDmlQueries.sqlDelete _),
    "q133_sql_update"        -> (SqlDmlQueries.sqlUpdate _),
    "q134_sql_merge"         -> (SqlDmlQueries.sqlMerge _),
    "q135_sql_restore"       -> (SqlDmlQueries.sqlRestore _),
    "q136_sql_merge_cdc"     -> (SqlDmlQueries.sqlMergeCdc _),
    "q137_copy_into"         -> (SqlDmlQueries.sqlCopyInto _),
    "q138_incremental_dedup" -> (CorpusQueries.incrementalDedup _),
    "q139_delta_import_orders" -> (DeltaBridgeQueries.deltaImportOrders _),
    "q140_delta_import_events" -> (DeltaBridgeQueries.deltaImportEvents _),
    "q141_delta_import_products" -> (DeltaBridgeQueries.deltaImportProducts _),
    "q142_delta_import_items"  -> (DeltaBridgeQueries.deltaImportOrderItems _),
    "q143_delta_cdf_roundtrip" -> (DeltaBridgeQueries.deltaCdfRoundtrip _),
    "q144_delta_part_import"   -> (DeltaBridgeQueries.deltaPartitionedImport _),
    "q153_delta_mapped_rename" -> (DeltaBridgeQueries.deltaMappedRename _),
    "q154_delta_v2_checkpoint" -> (DeltaBridgeQueries.deltaV2CheckpointRead _),
    "q145_hybrid_retrieval"  -> ((s, d) => RetrievalQueries.hybridRetrieval(s, d)),
    "q146_source_overlap"    -> (CorpusQueries.sourceOverlap _),
    "q147_ngram_novelty"     -> (CorpusQueries.ngramNovelty _),
    "q148_mmr_rerank"        -> ((s, d) => RetrievalQueries.mmrRerank(s, d)),
    "q149_embedding_cov"     -> (CorpusQueries.embeddingCov _),
    "q150_soft_dedup"        -> (CorpusQueries.softDedupWeights _),
    "q151_vocab_coverage"    -> ((s, d) => CorpusQueries.vocabCoverage(s, d)),
    "q152_dedup_funnel"      -> (CorpusQueries.dedupPipelineFunnel _),
    "q155_boilerplate_scrub" -> (CorpusQueries.boilerplateScrub _),
    "q156_dsir_weights"      -> ((s, d) => CorpusQueries.dsirWeights(s, d)),
    "q157_knn_label_purity"  -> (CorpusQueries.knnLabelPurity _),
    "q214_knn_purity_sampled" -> (CorpusQueries.knnLabelPuritySampled _),
    "q215_lsh_recall_sweep"  -> (CorpusQueries.lshRecallSweep _),
    "q216_source_overlap_sketch" -> (CorpusQueries.sourceOverlapSketch _),
    "q218_source_cardinality_sketch" -> (CorpusQueries.sourceCardinalitySketch _),
    "q219_sampled_percentiles" -> (CorpusQueries.sampledLengthPercentiles _),
    "q220_vocab_growth"      -> (CorpusQueries.vocabGrowth _),
    "q221_token_freq_sketch" -> (CorpusQueries.tokenFreqSketch _),
    "q222_source_containment_sketch" -> (CorpusQueries.sourceContainmentSketch _),
    "q158_priority_dedup"    -> (CorpusQueries.priorityDedup _),
    "q159_row_tracking"      -> (MutationQueries.rowTrackingStability _),
    "q160_threshold_sweep"   -> (CorpusQueries.dedupThresholdSweep _),
    "q161_delta_row_tracking" -> (DeltaBridgeQueries.deltaRowTracking _),
    "q162_tokenizer_parity"  -> (CorpusQueries.tokenizerParity _),
    "q163_shard_manifest"    -> (CorpusQueries.shardManifest _),
    "q164_label_separation"  -> (CorpusQueries.labelSeparation _),
    "q165_prototypicality_prune" -> (CorpusQueries.prototypicalityPrune _),
    "q166_hard_negatives"    -> (RetrievalQueries.hardNegatives _),
    "q167_delta_type_widening" -> (DeltaBridgeQueries.deltaTypeWidening _),
    "q168_leakage_safe_split" -> (CorpusQueries.leakageSafeSplit _),
    "q169_delta_ict_travel"  -> (DeltaBridgeQueries.deltaIctTravel _),
    "q170_eval_contamination" -> ((s, d) => SamplingQueries.evalContamination(s, d)),
    "q171_quality_quantiles" -> (CorpusQueries.qualityQuantiles _),
    "q172_delta_log_compaction" -> (DeltaBridgeQueries.deltaLogCompaction _),
    "q173_delta_clustering"  -> (DeltaBridgeQueries.deltaClustering _),
    "q174_source_divergence" -> (CorpusQueries.sourceDivergence _),
    "q175_token_budget"      -> ((s, d) => SamplingQueries.tokenBudgetPlan(s, d)),
    "q176_delta_fsck"        -> (DeltaBridgeQueries.deltaFsck _),
    "q177_convert_from_delta" -> (DeltaBridgeQueries.deltaConvertAdopt _),
    "q178_hopping_events"    -> (graft.streaming.EventWindows.hoppingEventStats _),
    "q179_delta_cdf_mv"      -> (DeltaBridgeQueries.deltaCdfMv _),
    "q180_chunk_dedup"       -> (CorpusQueries.chunkDedupReport _),
    "q181_run_collapse"      -> (CorpusQueries.runCollapseReport _),
    "q182_centroid_assign"   -> ((s, d) => CorpusQueries.centroidAssign(s, d)),
    "q183_quality_model"     -> (CorpusQueries.modelQualityFilter _),
    "q184_drop_feature"      -> (DeltaBridgeQueries.deltaDropFeature _),
    "q185_kmeans_refine"     -> ((s, d) => CorpusQueries.kmeansRefine(s, d)),
    "q186_column_defaults"   -> (SqlDmlQueries.sqlColumnDefaults _),
    "q187_winnowing"         -> (CorpusQueries.winnowingFingerprints _),
    "q188_winnow_pairs"      -> (CorpusQueries.winnowPairs _),
    "q189_cdc_cascade"       -> (MutationQueries.cascadeDelete _),
    "q190_normalized_dedup"  -> (CorpusQueries.normalizedDedup _),
    "q191_stitch_detect"     -> (CorpusQueries.stitchDetect _),
    "q192_weighted_jaccard"  -> (CorpusQueries.weightedJaccard _),
    "q193_session_window"    -> (OlapQueries.sessionWindowStats _),
    "q194_source_diversity"  -> (CorpusQueries.sourceDiversity _),
    "q195_cluster_capped"    -> (CorpusQueries.clusterCappedSelection _),
    "q196_norm_outliers"     -> (CorpusQueries.normOutliers _),
    "q197_convert_dv_mapped" -> (DeltaBridgeQueries.deltaConvertDvMapped _),
    "q198_blocklist_filter"  -> (CorpusQueries.blocklistFilter _),
    "q199_cleanup_audit"     -> (CorpusQueries.cleanupTokenDiff _),
    "q200_minhash_error"     -> (CorpusQueries.minhashErrorReport _),
    "q201_gopher_rules"      -> (CorpusQueries.gopherRules _),
    "q202_ivf_recall_sweep"  -> (CorpusQueries.ivfRecallSweep _),
    "q203_phrase_search"     -> ((s, d) => RetrievalQueries.phraseSearch(s, d)),
    "q204_foreign_append"    -> (DeltaBridgeQueries.deltaForeignAppend _),
    "q205_foreign_delete"    -> (DeltaBridgeQueries.deltaForeignDelete _),
    "q206_foreign_update"    -> (DeltaBridgeQueries.deltaForeignUpdate _),
    "q217_foreign_properties" -> (DeltaBridgeQueries.deltaForeignProperties _),
    "q207_foreign_merge"     -> (DeltaBridgeQueries.deltaForeignMerge _),
    "q213_foreign_clause_merge" ->
      (DeltaBridgeQueries.deltaForeignClauseMerge _),
    "q208_batch_novelty"     -> (CorpusQueries.batchNovelty _),
    "q209_pmi_collocations"  -> (CorpusQueries.pmiCollocations _),
    "q210_foreign_restore"   -> (DeltaBridgeQueries.deltaForeignRestore _),
    "q211_join_key_skew"     -> (OlapQueries.joinKeySkew _),
    "q212_length_percentiles" -> (CorpusQueries.lengthPercentiles _),
  )

  /** q118/q120 share the SCD2 history reconstruction: the CTE set deriving
    * the change batch, and the 5-way union producing the history table
    * (closed + opened + tombstoned + inserted + untouched versions). */
  private val Scd2Ctes: String =
    """base AS (
      |  SELECT c_custkey AS k, c_name, c_acctbal, c_mktsegment FROM customer),
      |upd AS (
      |  SELECT k, c_name,
      |    CASE WHEN k % 5 = 0 THEN c_acctbal + CAST(100.0 AS DOUBLE)
      |         ELSE c_acctbal END AS acctbal,
      |    CASE WHEN k % 7 = 0 THEN 'MACHINERY' ELSE c_mktsegment END AS mktsegment
      |  FROM base WHERE k % 5 = 0 OR k % 7 = 0),
      |changed AS (
      |  SELECT b.k, b.c_name, b.c_acctbal, b.c_mktsegment, u.acctbal, u.mktsegment
      |  FROM base b JOIN upd u ON b.k = u.k
      |  WHERE b.c_acctbal IS DISTINCT FROM u.acctbal
      |     OR b.c_mktsegment IS DISTINCT FROM u.mktsegment),
      |deleted AS (
      |  SELECT k, c_name, c_acctbal, c_mktsegment FROM base
      |  WHERE k % 13 = 0 AND k % 5 <> 0 AND k % 7 <> 0)""".stripMargin

  private val Scd2HistorySelect: String =
    """SELECT k AS c_custkey, c_name, c_acctbal AS acctbal,
      |  c_mktsegment AS mktsegment,
      |  TIMESTAMP '1995-01-01 00:00:00' AS valid_from,
      |  TIMESTAMP '1996-01-01 00:00:00' AS valid_to, FALSE AS is_current
      |FROM changed
      |UNION ALL
      |SELECT k, c_name, acctbal, mktsegment,
      |  TIMESTAMP '1996-01-01 00:00:00', NULL, TRUE FROM changed
      |UNION ALL
      |SELECT k, c_name, c_acctbal, c_mktsegment,
      |  TIMESTAMP '1995-01-01 00:00:00',
      |  TIMESTAMP '1996-01-01 00:00:00', FALSE FROM deleted
      |UNION ALL
      |SELECT k + 1000000, c_name, c_acctbal, c_mktsegment,
      |  TIMESTAMP '1996-01-01 00:00:00', NULL, TRUE
      |FROM base WHERE k % 11 = 0
      |UNION ALL
      |SELECT k, c_name, c_acctbal, c_mktsegment,
      |  TIMESTAMP '1995-01-01 00:00:00', NULL, TRUE FROM base
      |WHERE k NOT IN (SELECT k FROM changed) AND k NOT IN (SELECT k FROM deleted)""".stripMargin

  /** Centered sign arithmetic shared by the q214/q215 oracles — the
    * DuckDB mirror of Similarity.signPivots/centeredSig: per-dimension
    * fixed-point sums (exact BIGINTs, order-independent) as the pivot,
    * bit_d = floor(vec[d]·1e6)·n >= s_d. A raw `vec[d] >= 0` sign
    * degenerates on all-positive embeddings (every vector in one bucket
    * per band). */
  private def pivotCte(maxDim: Int): String = {
    val sums = (1 to maxDim).map(d =>
      s"sum(CAST(floor(vec[$d] * 1000000.0) AS BIGINT)) AS s$d")
      .mkString(",\n    ")
    s"""ctr AS (
       |  SELECT CAST(count(*) AS BIGINT) AS n,
       |    $sums
       |  FROM v)""".stripMargin
  }

  private def centeredSigExpr(j: Int, bits: Int): String =
    (0 until bits).map { i =>
      val d = j * bits + i + 1
      s"CASE WHEN CAST(floor(vec[$d] * 1000000.0) AS BIGINT) * ctr.n >= ctr.s$d THEN ${1 << i} ELSE 0 END"
    }.mkString("(", " + ", ")")

  /** q215's DuckDB oracle, GENERATED per (bands, bits) config — the same
    * centered-sign, cosine and tie-break arithmetic as q214's oracle;
    * the exact top-10 baseline (`ex`) is shared by every config. Recall
    * figures are integer counts with one final divide; `candidates` is
    * the pre-dedup band-join fan-out from per-bucket counts
    * (Σ qc·(ac−1)); min/p10 are the per-query recall floor and the
    * ⌈n_q/10⌉-th smallest per-query recall. */
  private def q215OracleSql: String = {
    val configs = Seq((2, 4), (4, 4), (8, 4), (8, 8))
    val maxDim = configs.map { case (b, bt) => b * bt }.max
    val cfgCtes = configs.zipWithIndex.map { case ((bands, bits), ci) =>
      val sigs = (0 until bands)
        .map(j => s"${centeredSigExpr(j, bits)} AS sig$j").mkString(",\n    ")
      val onCond = (0 until bands).map(j => s"a.sig$j = b.sig$j")
        .mkString(" OR ")
      val fanArms = (0 until bands).map(j =>
        s"SELECT count(*) FILTER (WHERE vec_id % 4 = 0) AS qc, count(*) AS ac FROM s$ci GROUP BY sig$j")
        .mkString("\n    UNION ALL\n    ")
      s"""s$ci AS (
         |  SELECT vec_id,
         |    $sigs
         |  FROM v, ctr),
         |cand$ci AS (
         |  SELECT DISTINCT a.vec_id AS a_id, b.vec_id AS b_id
         |  FROM s$ci a JOIN s$ci b ON ($onCond)
         |  WHERE a.vec_id % 4 = 0 AND a.vec_id <> b.vec_id),
         |perq$ci AS (
         |  SELECT ex.a_id, CAST(count(*) AS BIGINT) AS ex_a,
         |         CAST(sum(CASE WHEN c.b_id IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT) AS h
         |  FROM ex LEFT JOIN cand$ci c ON ex.a_id = c.a_id AND ex.b_id = c.b_id
         |  GROUP BY ex.a_id),
         |hit$ci AS (
         |  SELECT CAST(sum(h) AS BIGINT) AS hits,
         |         min(CAST(h AS DOUBLE) / ex_a) AS min_recall
         |  FROM perq$ci),
         |p10_$ci AS (
         |  SELECT r AS p10_recall FROM (
         |    SELECT CAST(h AS DOUBLE) / ex_a AS r,
         |           row_number() OVER (ORDER BY CAST(h AS DOUBLE) / ex_a) AS rn,
         |           count(*) OVER () AS nq
         |    FROM perq$ci) WHERE rn = (nq + 9) // 10),
         |fan$ci AS (
         |  SELECT CAST(sum(qc * (ac - 1)) AS BIGINT) AS candidates FROM (
         |    $fanArms))""".stripMargin
    }.mkString(",\n")
    val selects = configs.zipWithIndex.map { case ((bands, bits), ci) =>
      s"""SELECT CAST($bands AS INTEGER) AS bands, CAST($bits AS INTEGER) AS bits,
         |  base.n_queries, base.exact_pairs, hit$ci.hits, fan$ci.candidates,
         |  CAST(hit$ci.hits AS DOUBLE) / base.exact_pairs AS recall_at_k,
         |  hit$ci.min_recall, p10_$ci.p10_recall
         |FROM base, hit$ci, fan$ci, p10_$ci""".stripMargin
    }.mkString("\nUNION ALL\n")
    s"""WITH v AS (
       |  SELECT vec_id, CAST(embedding AS DOUBLE[]) AS vec,
       |    sqrt(list_inner_product(CAST(embedding AS DOUBLE[]), CAST(embedding AS DOUBLE[]))) AS nrm
       |  FROM embeddings),
       |${pivotCte(maxDim)},
       |ex AS (
       |  SELECT a_id, b_id FROM (
       |    SELECT a.vec_id AS a_id, b.vec_id AS b_id,
       |           row_number() OVER (PARTITION BY a.vec_id ORDER BY
       |             list_inner_product(a.vec, b.vec) / (a.nrm * b.nrm) DESC, b.vec_id) AS rn
       |    FROM v a, v b WHERE a.vec_id % 4 = 0 AND a.vec_id <> b.vec_id)
       |  WHERE rn <= 10),
       |base AS (
       |  SELECT CAST(count(DISTINCT a_id) AS BIGINT) AS n_queries,
       |         CAST(count(*) AS BIGINT) AS exact_pairs FROM ex),
       |$cfgCtes
       |$selects""".stripMargin
  }

  /** q216's DuckDB oracle: the k-minimum-values sketch rebuilt with the
    * q26 hex arithmetic widened to 60 bits (md5's first 15 hex chars,
    * assembled as hi28·2³² + lo32 — each half's digit-sum stays within
    * exact-double range, the combined value is BIGINT-safe, and the
    * result is bit-for-bit the Spark side's
    * conv(substring(md5,1,7))·2³² + conv(substring(md5,8,8))), the
    * per-pair union's k smallest via the same row_number ordering, and
    * the exact Jaccard re-derived with q146's CTEs for the error
    * column. */
  /** Shared q216/q218 oracle prefix: distinct (source, 3-shingle) pairs,
    * their 60-bit md5 hashes (hi28·2³² + lo32 — each half's digit-sum
    * stays exact-double, the combined value BIGINT-safe), and the
    * per-source k-minimum-values sketch. */
  private def kmvSketchCtes(k: Int): String = {
    def hexPart(start: Int, len: Int): String =
      s"CAST(list_sum(list_transform(range($len), i -> (strpos('0123456789abcdef', " +
        s"substring(md5(shingle), CAST(i + $start AS INT), 1)) - 1) * pow(16, ${len - 1} - i))) AS BIGINT)"
    val h60 = s"(${hexPart(1, 7)} * 4294967296 + ${hexPart(8, 8)})"
    s"""toks AS (
       |  SELECT source, regexp_split_to_array(trim(text), '\\s+') AS t FROM documents),
       |sh AS (
       |  SELECT DISTINCT source, array_to_string(t[i:i+2], ' ') AS shingle
       |  FROM (SELECT source, t, unnest(generate_series(1, len(t) - 2)) AS i FROM toks)),
       |hv AS (SELECT DISTINCT source, $h60 AS h FROM sh),
       |sk AS (
       |  SELECT source, h FROM (
       |    SELECT source, h, row_number() OVER (PARTITION BY source ORDER BY h) AS rn
       |    FROM hv) WHERE rn <= $k)""".stripMargin
  }

  private def sketchOverlapOracleSql: String = {
    s"""WITH ${kmvSketchCtes(256)},
       |srcs AS (SELECT DISTINCT source FROM documents),
       |pairs AS (
       |  SELECT a.source AS src_a, b.source AS src_b
       |  FROM srcs a JOIN srcs b ON a.source < b.source),
       |contrib AS (
       |  SELECT src_a, src_b, h, count(*) AS sides FROM (
       |    SELECT p.src_a, p.src_b, s.h FROM pairs p JOIN sk s ON s.source = p.src_a
       |    UNION ALL
       |    SELECT p.src_a, p.src_b, s.h FROM pairs p JOIN sk s ON s.source = p.src_b) u
       |  GROUP BY 1, 2, 3),
       |est AS (
       |  SELECT src_a, src_b,
       |         sum(CASE WHEN sides = 2 THEN 1 ELSE 0 END) AS in_both,
       |         count(*) AS m
       |  FROM (SELECT *, row_number() OVER (PARTITION BY src_a, src_b ORDER BY h) AS rn
       |        FROM contrib) WHERE rn <= 256 GROUP BY 1, 2),
       |sz AS (SELECT source, count(*) AS sz FROM sh GROUP BY 1),
       |common AS (
       |  SELECT a.source AS src_a, b.source AS src_b, count(*) AS c
       |  FROM sh a JOIN sh b USING (shingle)
       |  WHERE a.source < b.source GROUP BY 1, 2),
       |exact AS (
       |  SELECT src_a, src_b, CAST(c AS DOUBLE) / (sa.sz + sb.sz - c) AS jaccard
       |  FROM common
       |  JOIN sz sa ON sa.source = src_a
       |  JOIN sz sb ON sb.source = src_b)
       |SELECT e.src_a, e.src_b,
       |  CAST(in_both AS DOUBLE) / m AS est_jaccard,
       |  coalesce(x.jaccard, 0.0) AS exact_jaccard,
       |  abs(CAST(in_both AS DOUBLE) / m - coalesce(x.jaccard, 0.0)) AS abs_err
       |FROM est e LEFT JOIN exact x ON x.src_a = e.src_a AND x.src_b = e.src_b
       |ORDER BY 1, 2""".stripMargin
  }

  /** q218's DuckDB oracle: per-source distinct-shingle cardinality from
    * the same sketch CTEs as q216 — exact when the sketch is
    * unsaturated (m < k), else the k-th-minimum estimator (k−1)·2⁶⁰/h_k
    * (255·2⁶⁰ is exactly representable as a double, one IEEE divide),
    * next to the exact distinct count with relative error. */
  private def cardinalitySketchOracleSql: String =
    s"""WITH ${kmvSketchCtes(256)},
       |agg AS (SELECT source, CAST(count(*) AS BIGINT) AS m, max(h) AS hk
       |        FROM sk GROUP BY source),
       |ex AS (SELECT source, CAST(count(*) AS BIGINT) AS n_exact
       |       FROM sh GROUP BY source),
       |est AS (
       |  SELECT ex.source, ex.n_exact,
       |    CASE WHEN a.m < 256 THEN CAST(a.m AS DOUBLE)
       |         ELSE CAST(255 AS DOUBLE) * CAST(1152921504606846976 AS DOUBLE)
       |              / CAST(a.hk AS DOUBLE) END AS est_distinct
       |  FROM ex LEFT JOIN agg a ON a.source = ex.source)
       |SELECT source, n_exact, est_distinct,
       |  abs(est_distinct - CAST(n_exact AS DOUBLE)) / CAST(n_exact AS DOUBLE) AS rel_err
       |FROM est ORDER BY source""".stripMargin

  /** q219's DuckDB oracle: q212's exact nearest-rank percentile
    * arithmetic twice — full corpus and the deterministic 1-in-4 md5
    * doc_id sample (q59's hex-bucket spelling) — joined with absolute
    * error columns; a source whose sample came up empty reports NULL
    * sampled figures on both engines. */
  private def sampledPercentilesOracleSql: String = {
    val bucket =
      """CAST(list_sum(list_transform(range(8),
        |      i -> (strpos('0123456789abcdef',
        |              substring(md5(CAST(doc_id AS VARCHAR)), CAST(i + 1 AS INT), 1)) - 1)
        |           * pow(16, 7 - i))) AS BIGINT)""".stripMargin
    def pcts(src: String, suffix: String, nName: String) =
      s"""SELECT source, CAST(max(n) AS BIGINT) AS $nName,
         |  CAST(max(CASE WHEN rn = (n*50 + 99) // 100 THEN words END)
         |    AS BIGINT) AS p50_$suffix,
         |  CAST(max(CASE WHEN rn = (n*90 + 99) // 100 THEN words END)
         |    AS BIGINT) AS p90_$suffix,
         |  CAST(max(CASE WHEN rn = (n*99 + 99) // 100 THEN words END)
         |    AS BIGINT) AS p99_$suffix
         |FROM (SELECT source, words,
         |        row_number() OVER (PARTITION BY source
         |                           ORDER BY words, doc_id) AS rn,
         |        count(*) OVER (PARTITION BY source) AS n
         |      FROM $src) GROUP BY source""".stripMargin
    s"""WITH d AS (
       |  SELECT source, doc_id,
       |    CAST(len(regexp_split_to_array(trim(text), '\\s+')) AS BIGINT)
       |      AS words
       |  FROM documents),
       |samp AS (
       |  SELECT source, doc_id, words FROM d
       |  WHERE $bucket % 4 = 0),
       |ex AS (${pcts("d", "words", "n_docs")}),
       |sa AS (${pcts("samp", "sample", "n_sample")})
       |SELECT ex.source, ex.n_docs,
       |  CAST(coalesce(sa.n_sample, 0) AS BIGINT) AS n_sample,
       |  ex.p50_words, sa.p50_sample, ex.p90_words, sa.p90_sample,
       |  ex.p99_words, sa.p99_sample,
       |  abs(sa.p50_sample - ex.p50_words) AS err_p50,
       |  abs(sa.p90_sample - ex.p90_words) AS err_p90,
       |  abs(sa.p99_sample - ex.p99_words) AS err_p99
       |FROM ex LEFT JOIN sa ON sa.source = ex.source
       |ORDER BY ex.source""".stripMargin
  }

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops.
    */
  def oracleSql: Map[String, String] = Map(
    "q1_order_analytics" ->
      """SELECT CAST(o_orderdate AS DATE) AS order_day,
        |       o_orderstatus AS status,
        |       count(*) AS order_count,
        |       CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total_revenue,
        |       CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) / count(o_totalprice) AS avg_order_value
        |FROM orders GROUP BY 1, 2""".stripMargin,
    "q2_customer_order_summary" ->
      """SELECT c.c_custkey, c.c_name, c.c_mktsegment,
        |       count(o.o_orderkey) AS total_orders,
        |       coalesce(CAST(sum(CAST(o.o_totalprice AS DECIMAL(18,2))) AS DOUBLE), 0.0) AS lifetime_value
        |FROM customer c LEFT JOIN orders o ON c.c_custkey = o.o_custkey
        |GROUP BY 1, 2, 3""".stripMargin,
    "q3_product_popularity" ->
      """SELECT p.p_partkey, p.p_name, p.p_brand,
        |       count(l.l_orderkey) AS times_ordered,
        |       coalesce(CAST(sum(CAST(l.l_quantity AS DECIMAL(18,2))) AS DOUBLE), 0.0) AS total_quantity_sold
        |FROM part p LEFT JOIN lineitem l ON p.p_partkey = l.l_partkey
        |GROUP BY 1, 2, 3
        |ORDER BY times_ordered DESC, p.p_partkey LIMIT 10""".stripMargin,
    "q4_items_per_order" ->
      """SELECT o.o_orderkey, o.o_orderstatus,
        |       count(l.l_linenumber) AS item_count,
        |       coalesce(CAST(sum(CAST(l.l_quantity AS DECIMAL(18,2))) AS DOUBLE), 0.0) AS total_quantity
        |FROM orders o LEFT JOIN lineitem l ON o.o_orderkey = l.l_orderkey
        |GROUP BY 1, 2
        |ORDER BY item_count DESC, o.o_orderkey LIMIT 10""".stripMargin,
    "q5_stock_status" ->
      """SELECT p_partkey, p_name, p_size,
        |       CASE WHEN p_size = 0 THEN 'Out of Stock'
        |            WHEN p_size < 10 THEN 'Low Stock'
        |            ELSE 'In Stock' END AS stock_status
        |FROM part""".stripMargin,
    "q6_customer_stats_by_nation" ->
      """SELECT n.n_name AS nation,
        |       count(*) AS customer_count,
        |       CAST(sum(CAST(c_acctbal AS DECIMAL(18,2))) AS DOUBLE) / count(c_acctbal) AS avg_balance,
        |       min(c_acctbal) AS min_balance
        |FROM customer c JOIN nation n ON c.c_nationkey = n.n_nationkey
        |WHERE c_acctbal > 0
        |GROUP BY 1 ORDER BY avg_balance DESC, nation""".stripMargin,
    "q7_revenue_per_nation" ->
      """SELECT n.n_name AS nation,
        |       count(*) AS lineitem_count,
        |       CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS gross_revenue
        |FROM lineitem l
        |JOIN orders o ON l.l_orderkey = o.o_orderkey
        |JOIN customer c ON o.o_custkey = c.c_custkey
        |JOIN nation n ON c.c_nationkey = n.n_nationkey
        |GROUP BY 1 ORDER BY gross_revenue DESC, nation""".stripMargin,
    "q8_pricing_summary" ->
      """SELECT l_returnflag, l_linestatus,
        |       CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
        |       CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_base_price,
        |       count(*) AS count_order
        |FROM lineitem
        |WHERE l_shipdate <= TIMESTAMP '1998-09-02'
        |GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,
    "q9_table_summary" ->
      """SELECT 'customer' AS table_name, count(*) AS row_count, CAST(max(c_custkey) AS BIGINT) AS max_key FROM customer
        |UNION ALL SELECT 'orders', count(*), CAST(max(o_orderkey) AS BIGINT) FROM orders
        |UNION ALL SELECT 'lineitem', count(*), CAST(max(l_orderkey) AS BIGINT) FROM lineitem
        |UNION ALL SELECT 'part', count(*), CAST(max(p_partkey) AS BIGINT) FROM part""".stripMargin,
    "q10_merge_upsert" -> "SELECT * FROM orders",
    "q123_connector_read" -> "SELECT * FROM orders",
    // column profile: per-column stats as a 6-branch UNION; numeric bounds
    // cast losslessly to double, timestamps via epoch micros
    "q124_column_profile" ->
      """SELECT 'o_orderkey' AS col_name, CAST(count(*) AS BIGINT) AS n_rows,
        |  CAST(count(*) - count(o_orderkey) AS BIGINT) AS n_nulls,
        |  CAST(count(DISTINCT o_orderkey) AS BIGINT) AS n_distinct,
        |  CAST(min(o_orderkey) AS DOUBLE) AS min_num,
        |  CAST(max(o_orderkey) AS DOUBLE) AS max_num,
        |  CAST(NULL AS VARCHAR) AS min_str, CAST(NULL AS VARCHAR) AS max_str
        |FROM orders
        |UNION ALL
        |SELECT 'o_custkey', CAST(count(*) AS BIGINT),
        |  CAST(count(*) - count(o_custkey) AS BIGINT),
        |  CAST(count(DISTINCT o_custkey) AS BIGINT),
        |  CAST(min(o_custkey) AS DOUBLE), CAST(max(o_custkey) AS DOUBLE),
        |  NULL, NULL FROM orders
        |UNION ALL
        |SELECT 'o_totalprice', CAST(count(*) AS BIGINT),
        |  CAST(count(*) - count(o_totalprice) AS BIGINT),
        |  CAST(count(DISTINCT o_totalprice) AS BIGINT),
        |  CAST(min(o_totalprice) AS DOUBLE), CAST(max(o_totalprice) AS DOUBLE),
        |  NULL, NULL FROM orders
        |UNION ALL
        |SELECT 'o_orderdate', CAST(count(*) AS BIGINT),
        |  CAST(count(*) - count(o_orderdate) AS BIGINT),
        |  CAST(count(DISTINCT o_orderdate) AS BIGINT),
        |  CAST(epoch_us(min(o_orderdate)) AS DOUBLE),
        |  CAST(epoch_us(max(o_orderdate)) AS DOUBLE),
        |  NULL, NULL FROM orders
        |UNION ALL
        |SELECT 'o_orderstatus', CAST(count(*) AS BIGINT),
        |  CAST(count(*) - count(o_orderstatus) AS BIGINT),
        |  CAST(count(DISTINCT o_orderstatus) AS BIGINT),
        |  NULL, NULL, min(o_orderstatus), max(o_orderstatus) FROM orders
        |UNION ALL
        |SELECT 'o_orderpriority', CAST(count(*) AS BIGINT),
        |  CAST(count(*) - count(o_orderpriority) AS BIGINT),
        |  CAST(count(DISTINCT o_orderpriority) AS BIGINT),
        |  NULL, NULL, min(o_orderpriority), max(o_orderpriority) FROM orders""".stripMargin,

    // URL canonicalization: generic regex/list-sort pipeline mirrored in
    // DuckDB over the same synthesized messy URLs
    "q125_url_canon" ->
      """WITH u AS (
        |  SELECT doc_id,
        |    'HTTPS://Example' || CAST(doc_id % 7 AS VARCHAR) || '.COM:443/p'
        |      || CAST(doc_id % 13 AS VARCHAR) || '/?'
        |      || CASE WHEN doc_id % 2 = 0
        |           THEN 'a=' || CAST(doc_id % 3 AS VARCHAR)
        |             || '&b=' || CAST(doc_id % 5 AS VARCHAR)
        |           ELSE 'b=' || CAST(doc_id % 5 AS VARCHAR)
        |             || '&a=' || CAST(doc_id % 3 AS VARCHAR) END
        |      || '#s' || CAST(doc_id AS VARCHAR) AS url
        |  FROM documents),
        |c AS (
        |  SELECT doc_id, url,
        |    lower(regexp_extract(url, '^([A-Za-z][A-Za-z0-9+.-]*)://', 1)) AS scheme,
        |    lower(regexp_extract(url, '^[^:]+://([^/?#]*)', 1)) AS hostport,
        |    regexp_extract(url, '^[^:]+://[^/?#]*([^?#]*)', 1) AS path,
        |    regexp_extract(url, '\?([^#]*)', 1) AS query
        |  FROM u),
        |canon AS (
        |  SELECT doc_id, url,
        |    scheme || '://'
        |      || CASE WHEN (scheme = 'https' AND hostport LIKE '%:443')
        |                OR (scheme = 'http' AND hostport LIKE '%:80')
        |           THEN regexp_replace(hostport, ':[0-9]+$', '')
        |           ELSE hostport END
        |      || path
        |      || CASE WHEN query <> ''
        |           THEN '?' || array_to_string(list_sort(string_split(query, '&')), '&')
        |           ELSE '' END AS canon
        |  FROM c)
        |SELECT doc_id, url, canon,
        |  CAST(count(*) OVER (PARTITION BY canon) AS BIGINT) AS n_same_canon
        |FROM canon""".stripMargin,

    // Delta-log bridge (q126-q128): the oracle reads the EXACT part-files
    // the frozen reference log resolves to — a dir glob would also pick up
    // a file removed by v1's MERGE (5 stale rows) and an orphaned empty
    // file, so agreement here proves the add/remove replay.
    "q126_delta_import" ->
      s"""SELECT id, first_name, last_name, email, phone,
         |  __cdc_operation AS cdc_op, epoch_us(updated_at) AS updated_us
         |FROM read_parquet('$DeltaFixture/part-00000-e7eef221-c8e3-4afa-982d-1b14cdfb9c20.c000.snappy.parquet')""".stripMargin,
    "q127_delta_time_travel" ->
      s"""SELECT id, first_name, last_name, email, phone,
         |  __cdc_operation AS cdc_op, epoch_us(updated_at) AS updated_us
         |FROM read_parquet('$DeltaFixture/part-00002-dd809ecb-cbc1-45bd-b356-1950aaec9f6b-c000.snappy.parquet')""".stripMargin,
    "q128_delta_cdf" ->
      s"""SELECT id, email, __cdc_operation AS cdc_op,
         |  'insert' AS _change_type, CAST(0 AS BIGINT) AS _commit_version
         |FROM read_parquet('$DeltaFixture/part-00002-dd809ecb-cbc1-45bd-b356-1950aaec9f6b-c000.snappy.parquet')
         |UNION ALL
         |SELECT id, email, __cdc_operation AS cdc_op,
         |  _change_type, CAST(1 AS BIGINT) AS _commit_version
         |FROM read_parquet('$DeltaFixture/_change_data/cdc-00000-09db9421-4e72-43dd-84c9-2e939ee0a898.c000.snappy.parquet')""".stripMargin,

    // Streaming SCD2 (q129): the dimension history the CDC STREAM built —
    // batch 1 snapshot at t1, batch 2 (checkpointed resume) updates
    // key%5=0 / tombstones key%13=0 (disjoint) at t2 — reconstructed in
    // plain SQL over `customer`
    "q129_scd2_stream" ->
      """SELECT c_custkey AS id, c_name AS first_name,
        |  c_name || '@x.com' AS email,
        |  CAST(1700000000000 AS BIGINT) AS valid_from_ms,
        |  CASE WHEN c_custkey % 5 = 0 OR (c_custkey % 13 = 0 AND c_custkey % 5 <> 0)
        |       THEN CAST(1700000100000 AS BIGINT) ELSE CAST(NULL AS BIGINT)
        |  END AS valid_to_ms,
        |  NOT (c_custkey % 5 = 0 OR (c_custkey % 13 = 0 AND c_custkey % 5 <> 0)) AS is_current
        |FROM customer
        |UNION ALL
        |SELECT c_custkey, c_name, c_name || '@new.com',
        |  CAST(1700000100000 AS BIGINT), CAST(NULL AS BIGINT), TRUE
        |FROM customer WHERE c_custkey % 5 = 0""".stripMargin,

    // Write-side Delta bridge (q130): a partitioned graft history
    // (create → append → delete) published as _delta_log commits in place
    // and read back purely by Delta-log replay; the oracle recomputes the
    // final snapshot from the source parquet.
    "q130_delta_export" ->
      """SELECT o_orderkey, o_custkey, o_orderstatus, o_totalprice
        |FROM orders WHERE o_orderstatus <> 'F'""".stripMargin,
    // File-level skipping over the exported log (q131): partition
    // equality + stats range pruning; the oracle sees only the data.
    "q131_delta_skip" ->
      """SELECT o_orderkey, o_custkey, o_orderstatus, o_totalprice
        |FROM orders WHERE o_orderstatus = 'O' AND o_totalprice > 400000.0""".stripMargin,

    // SQL DML surface (q132-q135): Delta's DELETE / UPDATE / MERGE /
    // RESTORE statements through spark.sql over graft views; the oracles
    // reproduce the final table states from the source parquet.
    "q132_sql_delete" -> "SELECT * FROM orders WHERE o_orderstatus <> 'F'",
    "q133_sql_update" ->
      """SELECT o_orderkey, o_custkey,
        |  CASE WHEN o_orderpriority = '1-URGENT' THEN 'X'
        |       ELSE o_orderstatus END AS o_orderstatus,
        |  CASE WHEN o_orderpriority = '1-URGENT' THEN o_totalprice * 2
        |       ELSE o_totalprice END AS o_totalprice,
        |  o_orderdate, o_orderpriority
        |FROM orders""".stripMargin,
    "q134_sql_merge" -> "SELECT * FROM orders",
    "q135_sql_restore" -> "SELECT * FROM orders",
    // q136: general MERGE (conditional DELETE / explicit UPDATE SET /
    // guarded column-list INSERT / NOT MATCHED BY SOURCE UPDATE) — the
    // final state reproduced with CASE + UNION ALL
    "q136_sql_merge_cdc" ->
      """SELECT o_orderkey, o_custkey,
        |  CASE WHEN o_orderpriority = '1-URGENT' THEN 'U'
        |       ELSE o_orderstatus END AS o_orderstatus,
        |  CASE WHEN o_orderpriority = '1-URGENT' THEN o_totalprice * 2
        |       ELSE o_totalprice END AS o_totalprice,
        |  o_orderdate,
        |  CASE WHEN o_orderstatus = 'P' AND o_orderpriority <> '1-URGENT'
        |       THEN '9-UNTOUCHED' ELSE o_orderpriority END AS o_orderpriority
        |FROM orders WHERE o_orderstatus <> 'F'
        |UNION ALL
        |SELECT o_orderkey + 10000000, o_custkey, 'N', 1.0, o_orderdate,
        |  o_orderpriority
        |FROM orders WHERE o_orderstatus = 'O' AND o_orderkey % 97 = 0""".stripMargin,
    // q137: COPY INTO loads the source file exactly once (the statement
    // runs twice in the fixture; a double-load would double the rows)
    "q137_copy_into" -> "SELECT * FROM orders",
    // q138: exact-Jaccard pairs where at least one side is a BATCH doc
    // (odd doc_id) — the incremental index path must lose nothing vs the
    // one-shot recompute
    "q138_incremental_dedup" -> (JaccardOracleSql +
      "\n  AND (a_id % 2 = 1 OR b_id % 2 = 1)"),

    // Frozen `orders` fixture (q139): one WRITE commit adds exactly one
    // part-file; a second part-file on disk is an ORPHAN no commit
    // references — the oracle reads only the committed file, so a glob
    // reader hash-mismatches. total_amount is DOUBLE (Debezium divergence).
    "q139_delta_import_orders" ->
      """SELECT id, customer_id, status, total_amount,
        |  epoch_us(order_date) AS order_us, __cdc_operation AS cdc_op
        |FROM read_parquet('/root/reference/deltalake/orders/part-00001-7dcc3039-551b-4248-9c8f-12876348a848-c000.snappy.parquet')""".stripMargin,
    // Frozen `products` fixture (q141): single WRITE commit, stats with
    // out-of-range (year 57949) timestamps the reader must tolerate.
    "q141_delta_import_products" ->
      """SELECT id, name, price, stock_quantity, category,
        |  __cdc_operation AS cdc_op, epoch_us(updated_at) AS updated_us
        |FROM read_parquet('/root/reference/deltalake/products/part-00000-481bb3bb-2739-4a6a-9339-5ad6cd590034-c000.snappy.parquet')""".stripMargin,
    // Frozen `order_items` fixture (q142): the log commits ONE of the two
    // part-files on disk — the other is an orphan a glob reader would
    // wrongly serve; the oracle reads only the committed file.
    "q142_delta_import_items" ->
      """SELECT id, order_id, product_id, quantity, unit_price,
        |  __cdc_operation AS cdc_op, epoch_us(created_at) AS created_us
        |FROM read_parquet('/root/reference/deltalake/order_items/part-00003-8c2d3cd2-6869-47ce-a580-19f8901b7282-c000.snappy.parquet')""".stripMargin,
    // CDF round-trip (q143): the graft orders history (create %3<>0 →
    // append %3=0 → delete F) mirrored as a Delta log and its change feed
    // read back through the exported cdc actions / derived appends — the
    // reference's load_cdf shape. The oracle recomputes each version's
    // change rows from the source parquet.
    "q143_delta_cdf_roundtrip" ->
      """SELECT o_orderkey, o_custkey, o_orderstatus, o_totalprice,
        |  'insert' AS change_type, CAST(0 AS BIGINT) AS commit_version
        |FROM orders WHERE o_orderkey % 3 <> 0
        |UNION ALL
        |SELECT o_orderkey, o_custkey, o_orderstatus, o_totalprice,
        |  'insert', CAST(1 AS BIGINT)
        |FROM orders WHERE o_orderkey % 3 = 0
        |UNION ALL
        |SELECT o_orderkey, o_custkey, o_orderstatus, o_totalprice,
        |  'delete', CAST(2 AS BIGINT)
        |FROM orders WHERE o_orderstatus = 'F'""".stripMargin,
    // 97-partition export/import round-trip (q144): partition values
    // round-trip through Delta partitionValues and the single-scan
    // broadcast recovery; the oracle recomputes the bucket arithmetic.
    "q144_delta_part_import" ->
      """SELECT o_orderkey, o_custkey, o_totalprice,
        |  o_orderkey % 97 AS o_bucket
        |FROM orders""".stripMargin,
    // Metadata-only rename under column mapping (q153): the mirror's
    // mapped metaData serves the new logical name over unrewritten
    // physical files; the oracle is a plain projection with the alias.
    "q153_delta_mapped_rename" ->
      """SELECT o_orderkey, o_custkey, o_orderstatus, o_totalprice,
        |       o_orderpriority AS o_priority
        |FROM orders""".stripMargin,
    // V2-checkpoint cold open (q154): every covered JSON commit deleted —
    // the snapshot must come entirely from the manifest + sidecars.
    "q154_delta_v2_checkpoint" ->
      "SELECT o_orderkey, o_custkey, o_orderstatus, o_totalprice FROM orders",
    // Log-compaction cold read (q172): mid-range JSON commits compacted
    // into one file and deleted — the snapshot reconstructs from
    // v0 + compaction + tail; the oracle recomputes the survivors.
    "q172_delta_log_compaction" ->
      """SELECT o_orderkey, o_custkey, o_orderstatus, o_totalprice
        |FROM orders WHERE o_orderstatus <> 'F'""".stripMargin,
    // Liquid clustering (q173): the declaration survives
    // export→domainMetadata→import and a bare OPTIMIZE clusters on it;
    // the pinned clustering_cols literal fails the hash if the domain
    // metadata is dropped or mangled anywhere along the way.
    "q173_delta_clustering" ->
      """SELECT c_mktsegment, CAST(count(*) AS BIGINT) AS custs,
        |  min(c_acctbal) AS min_bal, max(c_acctbal) AS max_bal,
        |  'c_mktsegment,c_acctbal' AS clustering_cols
        |FROM customer GROUP BY c_mktsegment""".stripMargin,
    // CDF-consumer MV (q179): per-status revenue maintained only from the
    // mirror's change feed, two refreshes split mid-history; the deleted
    // partition's group vanishes at signed count zero.
    "q179_delta_cdf_mv" ->
      """SELECT o_orderstatus, CAST(count(*) AS BIGINT) AS n_orders,
        |  CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS revenue
        |FROM orders WHERE o_orderstatus <> 'F'
        |GROUP BY o_orderstatus""".stripMargin,
    // join-key skew (q211): top-20 heaviest lineitem order keys with
    // fixed-point share — the pre-salting diagnostic
    "q211_join_key_skew" ->
      """WITH c AS (
        |  SELECT l_orderkey, CAST(count(*) AS BIGINT) AS c
        |  FROM lineitem GROUP BY 1),
        |n AS (SELECT CAST(count(*) AS BIGINT) AS n FROM lineitem)
        |SELECT l_orderkey, c, (1000000000 * c) // n.n AS share_fp
        |FROM c CROSS JOIN n
        |ORDER BY c DESC, l_orderkey LIMIT 20""".stripMargin,
    // length percentiles (q212): exact nearest-rank P50/P90/P99 token
    // counts per source, integer-only with doc-id tiebreak
    "q212_length_percentiles" ->
      """WITH d AS (
        |  SELECT source, doc_id,
        |    CAST(len(regexp_split_to_array(trim(text), '\s+')) AS BIGINT)
        |      AS words
        |  FROM documents),
        |r AS (
        |  SELECT source, words,
        |    row_number() OVER (PARTITION BY source
        |                       ORDER BY words, doc_id) AS rn,
        |    count(*) OVER (PARTITION BY source) AS n
        |  FROM d)
        |SELECT source, CAST(max(n) AS BIGINT) AS n_docs,
        |  CAST(max(CASE WHEN rn = (n*50 + 99) // 100 THEN words END)
        |    AS BIGINT) AS p50_words,
        |  CAST(max(CASE WHEN rn = (n*90 + 99) // 100 THEN words END)
        |    AS BIGINT) AS p90_words,
        |  CAST(max(CASE WHEN rn = (n*99 + 99) // 100 THEN words END)
        |    AS BIGINT) AS p99_words
        |FROM r GROUP BY source""".stripMargin,
    // foreign RESTORE (q210): the append+delete detour must be invisible
    // — the read equals the exported snapshot
    "q210_foreign_restore" ->
      """SELECT o_orderkey, o_custkey, o_orderstatus, o_totalprice
        |FROM orders WHERE o_orderkey % 97 <> 0""".stripMargin,
    // PMI collocations (q209): log-free lift ordering in fixed point;
    // top-50 with full deterministic tiebreak
    "q209_pmi_collocations" ->
      """WITH dt AS (
        |  SELECT DISTINCT doc_id, tok FROM (
        |    SELECT doc_id,
        |      unnest(regexp_split_to_array(trim(text), '\s+')) AS tok
        |    FROM documents)),
        |dfreq AS (SELECT tok, CAST(count(*) AS BIGINT) AS c
        |          FROM dt GROUP BY 1),
        |n AS (SELECT CAST(count(*) AS BIGINT) AS n_docs FROM documents),
        |pairs AS (
        |  SELECT a.tok AS x, b.tok AS y, CAST(count(*) AS BIGINT) AS c_xy
        |  FROM dt a JOIN dt b USING (doc_id)
        |  WHERE a.tok < b.tok
        |  GROUP BY 1, 2 HAVING count(*) >= 20)
        |SELECT x, y, c_xy, fx.c AS c_x, fy.c AS c_y,
        |  (1000000 * c_xy * n.n_docs) // (fx.c * fy.c) AS lift_fp
        |FROM pairs
        |JOIN dfreq fx ON fx.tok = x
        |JOIN dfreq fy ON fy.tok = y
        |CROSS JOIN n
        |ORDER BY lift_fp DESC, x, y LIMIT 50""".stripMargin,
    // batch novelty (q208): per arriving doc, distinct-3-gram fraction
    // unseen in the corpus; batch = every 7th doc + 3 stamped fresh tokens
    "q208_batch_novelty" ->
      """WITH toks AS (
        |  SELECT doc_id, regexp_split_to_array(trim(text), '\s+') AS t
        |  FROM documents),
        |cg AS (
        |  SELECT DISTINCT array_to_string(t[i:i+2], ' ') AS shingle
        |  FROM (SELECT doc_id, t,
        |        unnest(generate_series(1, len(t) - 2)) AS i FROM toks)),
        |batch AS (
        |  SELECT doc_id,
        |    trim(text) || format(' fresh{} tokens{} here{}',
        |      doc_id, doc_id, doc_id) AS text
        |  FROM documents WHERE doc_id % 7 = 0),
        |bt AS (SELECT doc_id,
        |         regexp_split_to_array(trim(text), '\s+') AS t FROM batch),
        |bg AS (
        |  SELECT DISTINCT doc_id, array_to_string(t[i:i+2], ' ') AS shingle
        |  FROM (SELECT doc_id, t,
        |        unnest(generate_series(1, len(t) - 2)) AS i FROM bt)),
        |novel AS (
        |  SELECT doc_id, CAST(count(*) AS BIGINT) AS n_novel
        |  FROM bg WHERE shingle NOT IN (SELECT shingle FROM cg)
        |  GROUP BY 1)
        |SELECT g.doc_id, CAST(count(*) AS BIGINT) AS n_grams,
        |  CAST(coalesce(any_value(n.n_novel), 0) AS BIGINT) AS n_novel,
        |  CAST(coalesce(any_value(n.n_novel), 0) AS DOUBLE)
        |    / CAST(count(*) AS DOUBLE) AS novelty
        |FROM bg g LEFT JOIN novel n ON n.doc_id = g.doc_id
        |GROUP BY g.doc_id""".stripMargin,
    // foreign clause MERGE (q213): one commit over a compound key —
    // %13 keys deleted, 'O' survivors re-priced (×2 exact), 'F' leg
    // byte-identical (change detection leaves it untouched), fresh +40M
    // keys inserted
    "q213_foreign_clause_merge" ->
      """SELECT o_orderkey, o_custkey, o_orderstatus, o_totalprice
        |FROM orders WHERE o_orderkey % 97 <> 0 AND o_orderkey % 13 <> 0
        |  AND o_orderstatus <> 'O'
        |UNION ALL
        |SELECT o_orderkey, o_custkey, o_orderstatus, o_totalprice * 2
        |FROM orders WHERE o_orderkey % 97 <> 0 AND o_orderkey % 13 <> 0
        |  AND o_orderstatus = 'O'
        |UNION ALL
        |SELECT o_orderkey + 40000000, o_custkey, 'N', o_totalprice
        |FROM orders WHERE o_orderkey % 31 = 0""".stripMargin,
    // foreign MERGE upsert (q207): survivors keep originals except 'P'
    // rows (replaced image, incl. previously-deleted 'P' keys re-entering
    // as inserts) plus the brand-new +20000000 batch
    "q207_foreign_merge" ->
      """SELECT o_orderkey, o_custkey, o_orderstatus, o_totalprice
        |FROM orders WHERE o_orderkey % 97 <> 0 AND o_orderstatus <> 'P'
        |UNION ALL
        |SELECT o_orderkey, o_custkey, o_orderstatus, o_totalprice * 3
        |FROM orders WHERE o_orderstatus = 'P'
        |UNION ALL
        |SELECT o_orderkey + 20000000, o_custkey, 'N', o_totalprice
        |FROM orders WHERE o_orderkey % 31 = 0""".stripMargin,
    // foreign DV update (q206): 'P' orders re-priced in place on a pure
    // Delta table; double*2 is exact so the hash compare is stable
    "q206_foreign_update" ->
      """SELECT o_orderkey, o_custkey, o_orderstatus,
        |  CASE WHEN o_orderstatus = 'P' THEN o_totalprice * 2
        |       ELSE o_totalprice END AS o_totalprice
        |FROM orders WHERE o_orderkey % 97 <> 0""".stripMargin,
    // foreign DV delete (q205): survivors of the graft positional delete
    // (%97) minus the foreign-deleted 'F' rows
    "q205_foreign_delete" ->
      """SELECT o_orderkey, o_custkey, o_orderstatus, o_totalprice
        |FROM orders
        |WHERE o_orderkey % 97 <> 0 AND o_orderstatus <> 'F'""".stripMargin,
    // foreign adoption (q217): DV capability granted by ALTER TABLE SET
    // TBLPROPERTIES on a plain table, then a DV delete of the 'F' rows —
    // no graft prehistory, so the full base minus the predicate
    "q217_foreign_properties" ->
      """SELECT o_orderkey, o_custkey, o_orderstatus, o_totalprice
        |FROM orders
        |WHERE o_orderstatus <> 'F'""".stripMargin,
    // foreign append (q204): graft committing into a pure Delta table;
    // base snapshot ∪ the appended (shifted-key) rows
    "q204_foreign_append" ->
      """SELECT o_orderkey, o_custkey, o_orderstatus, o_totalprice
        |FROM orders
        |UNION ALL
        |SELECT o_orderkey + 10000000, o_custkey, o_orderstatus, o_totalprice
        |FROM orders WHERE o_orderkey % 10 = 0""".stripMargin,
    // phrase search (q203): positional-index adjacency join; 1-based
    // first position matches generate_series indexing
    "q203_phrase_search" ->
      """WITH toks AS (
        |  SELECT doc_id, regexp_split_to_array(trim(text), '\s+') AS t
        |  FROM documents),
        |hits AS (
        |  SELECT doc_id, i FROM (
        |    SELECT doc_id, t, unnest(generate_series(1, len(t) - 1)) AS i
        |    FROM toks)
        |  WHERE t[i] = 'hash' AND t[i+1] = 'join')
        |SELECT doc_id, CAST(count(*) AS BIGINT) AS n_hits,
        |  CAST(min(i) AS BIGINT) AS first_pos
        |FROM hits GROUP BY doc_id""".stripMargin,
    // Gopher rule battery (q201): per-source failure census; all flags
    // integer-exact (one truncating div per doc)
    "q201_gopher_rules" ->
      """WITH d AS (
        |  SELECT source,
        |    len(regexp_split_to_array(trim(text), '\s+')) AS words,
        |    length(regexp_replace(text, '\s+', '', 'g')) AS chars,
        |    len(list_filter(
        |      list_distinct(regexp_split_to_array(trim(text), '\s+')),
        |      t -> t IN ('the','a','and','of','to'))) AS stops
        |  FROM documents),
        |f AS (
        |  SELECT source, words < 30 AS f_words,
        |    (1000 * chars) // words NOT BETWEEN 4000 AND 5000 AS f_meanlen,
        |    stops < 2 AS f_stop
        |  FROM d)
        |SELECT source, CAST(count(*) AS BIGINT) AS docs,
        |  CAST(count(*) FILTER (f_words) AS BIGINT) AS fail_words,
        |  CAST(count(*) FILTER (f_meanlen) AS BIGINT) AS fail_meanlen,
        |  CAST(count(*) FILTER (f_stop) AS BIGINT) AS fail_stopwords,
        |  CAST(count(*) FILTER (NOT f_words AND NOT f_meanlen AND NOT f_stop)
        |    AS BIGINT) AS passed
        |FROM f GROUP BY source""".stripMargin,
    // IVF recall sweep (q202): seeded-centroid probe order, exact
    // fixed-point top-10 vs probed top-10 per nprobe level
    "q202_ivf_recall_sweep" ->
      """WITH q AS (
        |  SELECT vec_id, list_transform(embedding,
        |    x -> CAST(floor(CAST(x AS DOUBLE) * 1e6) AS BIGINT)) AS qx
        |  FROM embeddings),
        |c AS (SELECT vec_id AS cid, qx AS qc FROM q ORDER BY vec_id LIMIT 8),
        |qv AS (SELECT vec_id AS qid, qx AS qq FROM q ORDER BY vec_id LIMIT 1),
        |assign AS (
        |  SELECT vec_id, cid FROM (
        |    SELECT q.vec_id, c.cid,
        |      row_number() OVER (PARTITION BY q.vec_id
        |        ORDER BY CAST(list_inner_product(q.qx, c.qc) AS BIGINT)
        |          DESC, c.cid ASC) AS rn
        |    FROM q CROSS JOIN c) WHERE rn = 1),
        |prank AS (
        |  SELECT cid, row_number() OVER (
        |    ORDER BY CAST(list_inner_product(c.qc, qv.qq) AS BIGINT) DESC,
        |      cid ASC) AS proberank
        |  FROM c CROSS JOIN qv),
        |scored AS (
        |  SELECT q.vec_id,
        |    CAST(list_inner_product(q.qx, qv.qq) AS BIGINT) AS dot, a.cid
        |  FROM q CROSS JOIN qv
        |  JOIN assign a ON a.vec_id = q.vec_id
        |  WHERE q.vec_id <> qv.qid),
        |ex AS (
        |  SELECT vec_id, dot, cid,
        |    row_number() OVER (ORDER BY dot DESC, vec_id) AS exact_rn
        |  FROM scored),
        |lvl AS (
        |  SELECT e.*, np.nprobe,
        |    row_number() OVER (PARTITION BY np.nprobe
        |      ORDER BY e.dot DESC, e.vec_id) AS probed_rn
        |  FROM ex e
        |  JOIN prank p ON p.cid = e.cid
        |  CROSS JOIN (SELECT unnest([1, 2, 4, 8]) AS nprobe) np
        |  WHERE p.proberank <= np.nprobe)
        |SELECT CAST(nprobe AS BIGINT) AS nprobe,
        |  CAST(count(*) AS BIGINT) AS candidates,
        |  CAST(count(*) FILTER (probed_rn <= 10 AND exact_rn <= 10)
        |    AS BIGINT) AS hits,
        |  CAST(count(*) FILTER (probed_rn <= 10 AND exact_rn <= 10)
        |    AS DOUBLE) / 10.0 AS recall_at_10
        |FROM lvl GROUP BY nprobe""".stripMargin,
    // blocklist gate (q198): per-source keep/flag census; 'crash' is
    // deliberately absent from the corpus (pins the no-match path)
    "q198_blocklist_filter" ->
      """SELECT source, CAST(count(*) AS BIGINT) AS docs_in,
        |  CAST(count(*) FILTER (flagged) AS BIGINT) AS docs_flagged,
        |  CAST(count(*) FILTER (NOT flagged) AS BIGINT) AS docs_kept
        |FROM (
        |  SELECT source,
        |    list_has_any(regexp_split_to_array(trim(text), '\s+'),
        |      ['dup', 'crash']) AS flagged
        |  FROM documents)
        |GROUP BY source""".stripMargin,
    // cleanup audit (q199): per-source token mass across the blocklist
    // DELETE, reconciled via time travel (v0 = v1 + removed)
    "q199_cleanup_audit" ->
      """WITH m AS (
        |  SELECT source,
        |    len(regexp_split_to_array(trim(text), '\s+')) AS n,
        |    list_contains(regexp_split_to_array(trim(text), '\s+'), 'dup')
        |      AS hit
        |  FROM documents)
        |SELECT source,
        |  CAST(sum(n) AS BIGINT) AS tokens_v0,
        |  CAST(coalesce(sum(n) FILTER (NOT hit), 0) AS BIGINT) AS tokens_v1,
        |  CAST(coalesce(sum(n) FILTER (hit), 0) AS BIGINT) AS tokens_removed
        |FROM m GROUP BY source""".stripMargin,
    // MinHash estimator error (q200): md5-hex string-min signatures are
    // engine-portable; estimate = matched/64 is an exact IEEE rational
    "q200_minhash_error" ->
      """WITH toks AS (
        |  SELECT doc_id, regexp_split_to_array(trim(text), '\s+') AS t
        |  FROM documents),
        |sh AS (
        |  SELECT DISTINCT doc_id, array_to_string(t[i:i+2], ' ') AS shingle
        |  FROM (SELECT doc_id, t,
        |        unnest(generate_series(1, len(t) - 2)) AS i FROM toks)),
        |sz AS (SELECT doc_id, count(*) AS sz FROM sh GROUP BY 1),
        |common AS (
        |  SELECT a.doc_id AS a_id, b.doc_id AS b_id, count(*) AS c
        |  FROM sh a JOIN sh b USING (shingle)
        |  WHERE a.doc_id < b.doc_id GROUP BY 1, 2),
        |pairs AS (
        |  SELECT a_id, b_id,
        |         CAST(c AS DOUBLE) / (sa.sz + sb.sz - c) AS jaccard
        |  FROM common
        |  JOIN sz sa ON sa.doc_id = a_id
        |  JOIN sz sb ON sb.doc_id = b_id
        |  WHERE CAST(c AS DOUBLE) / (sa.sz + sb.sz - c) >= 0.5),
        |sig AS (
        |  SELECT doc_id, seed,
        |         min(md5(CAST(seed AS VARCHAR) || ' ' || shingle)) AS sig
        |  FROM sh, (SELECT unnest(generate_series(0, 63)) AS seed)
        |  GROUP BY 1, 2)
        |SELECT p.a_id, p.b_id, p.jaccard,
        |  CAST(count(*) FILTER (sa.sig = sb.sig) AS BIGINT) AS matched,
        |  CAST(count(*) FILTER (sa.sig = sb.sig) AS DOUBLE) / 64.0
        |    AS estimate
        |FROM pairs p
        |JOIN sig sa ON sa.doc_id = p.a_id
        |JOIN sig sb ON sb.doc_id = p.b_id AND sb.seed = sa.seed
        |GROUP BY 1, 2, 3""".stripMargin,
    // CONVERT FROM DELTA of a DV'd, column-mapped source (q197): DV
    // positions translate to graft positional tombstones, physical names
    // carry into graft.colmap.*; survivors read under the renamed column
    "q197_convert_dv_mapped" ->
      """SELECT o_orderkey, o_custkey, o_orderstatus AS status, o_totalprice
        |FROM orders WHERE o_orderkey % 7 <> 0""".stripMargin,
    // CONVERT FROM DELTA (q177): in-place adoption of a pure Delta table
    // whose DELETE left dead files on disk — v0 must hold exactly the
    // live snapshot (a glob would resurrect the deleted rows).
    "q177_convert_from_delta" ->
      """SELECT o_orderkey, o_custkey, o_orderstatus, o_totalprice
        |FROM orders WHERE o_orderstatus <> 'F'""".stripMargin,
    // Mirror fsck (q176): the healthy-path consistency report over a
    // DV-carrying, checkpointed export — pinned literally; any bridge
    // change that writes dangling metadata breaks this hash. Damage
    // classes are spec-gated (DeltaFsckSpec).
    "q176_delta_fsck" ->
      """SELECT * FROM (VALUES
        |  ('snapshot_replay',      'ok', CAST(0 AS BIGINT)),
        |  ('protocol_supported',   'ok', CAST(0 AS BIGINT)),
        |  ('adds_resolvable',      'ok', CAST(0 AS BIGINT)),
        |  ('add_size_match',       'ok', CAST(0 AS BIGINT)),
        |  ('dv_files_resolvable',  'ok', CAST(0 AS BIGINT)),
        |  ('last_checkpoint',      'ok', CAST(0 AS BIGINT))
        |) AS t("check", status, n)""".stripMargin,
    // In-commit-timestamp travel (q169): the read pins to the instant
    // just below the append's ICT — an ICT-aware reader serves the
    // pre-append snapshot regardless of file wall-clock metadata.
    "q169_delta_ict_travel" ->
      """SELECT o_orderkey, o_totalprice
        |FROM orders WHERE o_orderkey % 2 = 0""".stripMargin,
    // Metadata-only type widening (q167): pre-widen int files and
    // post-widen long files serve as one long snapshot through the
    // mirror; the oracle recomputes both halves with plain casts.
    "q167_delta_type_widening" ->
      """SELECT CAST(o_orderkey AS BIGINT) AS okey, o_totalprice
        |FROM orders WHERE o_orderkey % 2 = 0
        |UNION ALL
        |SELECT o_orderkey + 5000000000 AS okey, o_totalprice
        |FROM orders WHERE o_orderkey % 2 = 1""".stripMargin,
    // Frozen `cdc_events` fixture (q140): two STREAMING UPDATE commits —
    // the replay must serve the union of both commits' files.
    "q140_delta_import_events" ->
      """SELECT event_id, source_table, operation, kafka_partition,
        |  kafka_offset, epoch_us(event_timestamp) AS event_us
        |FROM read_parquet(['/root/reference/deltalake/cdc_events/part-00000-f8eff2af-26a6-43aa-a269-a663dd1199f9-c000.snappy.parquet',
        |  '/root/reference/deltalake/cdc_events/part-00001-ddf7f102-59be-4768-bdcb-2c0929267074-c000.snappy.parquet',
        |  '/root/reference/deltalake/cdc_events/part-00002-872a294b-e605-43f3-9ff5-e11afe61ca97-c000.snappy.parquet',
        |  '/root/reference/deltalake/cdc_events/part-00003-21b7f84b-43d3-462f-9418-1675168b54fc-c000.snappy.parquet',
        |  '/root/reference/deltalake/cdc_events/part-00000-57526890-f190-40a3-82eb-90b0993ccecd-c000.snappy.parquet'])""".stripMargin,

    "q11_delete_where" -> "SELECT * FROM orders WHERE o_orderstatus <> 'F'",
    // merge-on-read delete + post-delete append: non-F rows plus the
    // appended F subset the tombstone coverage must not suppress
    "q83_mor_delete" ->
      """SELECT * FROM orders WHERE o_orderstatus <> 'F'
        |UNION ALL
        |SELECT * FROM orders
        |WHERE o_orderstatus = 'F' AND o_orderkey % 100 = 0""".stripMargin,
    // positional-DV delete: same snapshot semantics as q83, different
    // physical subtraction (in-scan position filter, no join)
    "q88_dv_delete" ->
      """SELECT * FROM orders WHERE o_orderstatus <> 'F'
        |UNION ALL
        |SELECT * FROM orders
        |WHERE o_orderstatus = 'F' AND o_orderkey % 100 = 0""".stripMargin,
    // bloom-indexed point lookup: superset pruning + exact refine
    "q91_point_lookup" -> "SELECT * FROM orders WHERE o_orderkey = 8",
    // string-range dir skipping: same rows as the plain predicate
    "q92_string_range_skip" ->
      "SELECT * FROM orders WHERE o_orderpriority BETWEEN '2' AND '4'",
    // predicate-driven skipping (where()): disjunction of bloom needles
    "q93_predicate_skip" ->
      "SELECT * FROM orders WHERE o_orderkey = 8 OR o_orderkey = 1",
    // null-count skipping: the pre-evolution segment (even keys, written
    // without o_orderpriority) is provably all-null and never scanned
    "q94_null_skip" ->
      "SELECT * FROM orders WHERE o_orderkey % 2 = 1",
    // SQL-transparent skipping: same needle as q91, via a registered view
    "q95_sql_skip" -> "SELECT * FROM orders WHERE o_orderkey = 8",
    // OPTIMIZE WHERE lifecycle: selective compaction preserves every row
    "q96_optimize_where" -> "SELECT * FROM orders",
    // replaceWhere backfill: the middle key range carries the replacement
    // images (status flagged, price doubled — exact in binary fp), the
    // rest of the table is untouched
    "q97_replace_where" ->
      """SELECT o_orderkey, o_custkey,
        |  CASE WHEN o_orderkey BETWEEN 20000 AND 39999 THEN 'R' ELSE o_orderstatus END AS o_orderstatus,
        |  CASE WHEN o_orderkey BETWEEN 20000 AND 39999 THEN o_totalprice * 2 ELSE o_totalprice END AS o_totalprice,
        |  o_orderdate, o_orderpriority
        |FROM orders""".stripMargin,
    // metadata-only counts over the evolved table (q94's fixture): the
    // pre-evolution segment (even keys, column dropped) counts 0 for
    // o_orderpriority — the oracle recomputes the hard way
    "q98_metadata_count" ->
      """SELECT count(*) AS cnt,
        |  count(CASE WHEN o_orderkey % 2 = 1 THEN o_orderpriority END) AS cnt_pri,
        |  count(o_custkey) AS cnt_cust
        |FROM orders""".stripMargin,
    // CONVERT TO GRAFT: the in-place upgrade serves the legacy rows
    "q100_convert" -> "SELECT * FROM orders",
    // metadata-only DROP COLUMN: head = full table minus the column
    "q101_drop_column" ->
      "SELECT o_orderkey, o_custkey, o_orderstatus, o_totalprice, o_orderdate FROM orders",
    // symlink manifest: an external engine reading only the listed parquet
    // paths (no commit log) sees exactly the snapshot
    "q105_manifest_read" -> "SELECT * FROM orders",
    // time travel BY TIMESTAMP: v0's history timestamp serves v0 exactly
    // even after a later destructive commit
    "q108_time_travel_ts" -> "SELECT * FROM orders",
    // RESTORE: head serves the original rows after a delete AND a junk
    // append are rolled back in one metadata-only commit
    "q113_restore" -> "SELECT * FROM orders",
    // RENAME COLUMN (explicit rewrite): new name, old values
    "q106_rename_column" ->
      """SELECT o_orderkey, o_custkey, o_orderstatus, o_totalprice, o_orderdate,
        |       o_orderpriority AS o_priority FROM orders""".stripMargin,
    // DROP (metadata-only) → REORG (physical purge) → re-ADD same name:
    // the column reads all-null, rows intact
    "q107_reorg_readd" ->
      """SELECT o_orderkey, o_custkey, o_orderstatus, o_totalprice, o_orderdate,
        |       CAST(NULL AS VARCHAR) AS o_orderpriority FROM orders""".stripMargin,
    // GENERATED ALWAYS AS (year(o_orderdate)): writers omitted the column,
    // the engine materialized it — snapshot = plain SQL over the source
    "q103_generated_column" ->
      "SELECT *, CAST(year(o_orderdate) AS INT) AS o_year FROM orders",
    // IDENTITY invariants (ids are engine-assigned, unique, >= start; the
    // values themselves are block-reserved, so the CHECKABLE projection is
    // the invariant summary, not the ids)
    "q104_identity_column" ->
      """SELECT count(*) AS n_rows, count(*) AS n_ids,
        |       CAST(0 AS BIGINT) AS below_start, CAST(0 AS BIGINT) AS null_ids
        |FROM orders""".stripMargin,
    // RAG chunking: 500-char windows every 400 chars, offsets kept
    "q102_chunk_documents" ->
      """SELECT doc_id, chunk_start,
        |       substr(text, CAST(chunk_start AS INT) + 1, 500) AS chunk
        |FROM (
        |  SELECT doc_id, text,
        |         unnest(generate_series(0, greatest(length(text) - 1, 0), 400)) AS chunk_start
        |  FROM documents
        |)""".stripMargin,
    // Chunk-store hygiene (q180): duplicated-chunk fraction per doc over
    // the q102 chunking; the oracle groups on chunk CONTENT where the
    // engine groups on its 8-byte hash (the q66 device).
    "q180_chunk_dedup" ->
      """WITH chunks AS (
        |  SELECT doc_id, chunk_start,
        |         substr(text, CAST(chunk_start AS INT) + 1, 500) AS chunk
        |  FROM (
        |    SELECT doc_id, text,
        |           unnest(generate_series(0, greatest(length(text) - 1, 0), 400))
        |             AS chunk_start
        |    FROM documents)),
        |dupkeys AS (
        |  SELECT chunk FROM chunks GROUP BY chunk HAVING count(*) >= 2)
        |SELECT c.doc_id, CAST(count(*) AS BIGINT) AS n_chunks,
        |  CAST(sum(CASE WHEN d.chunk IS NULL THEN 0 ELSE 1 END) AS BIGINT)
        |    AS dup_chunks,
        |  CAST(sum(CASE WHEN d.chunk IS NULL THEN 0 ELSE 1 END) AS DOUBLE)
        |    / count(*) AS dup_fraction
        |FROM chunks c LEFT JOIN dupkeys d USING (chunk)
        |GROUP BY c.doc_id""".stripMargin,
    // consecutive-run collapse dry-run: lag-window phrasing of the
    // Spark side's indexed-lambda "differs from predecessor" filter
    "q181_run_collapse" ->
      """WITH t AS (
        |  SELECT doc_id, source, unnest(string_split(text, ' ')) AS tok,
        |         generate_subscripts(string_split(text, ' '), 1) AS pos
        |  FROM documents),
        |m AS (
        |  SELECT doc_id, source, tok, pos,
        |         lag(tok) OVER (PARTITION BY doc_id ORDER BY pos) AS prev
        |  FROM t),
        |d AS (
        |  SELECT doc_id, source, CAST(count(*) AS BIGINT) AS nb,
        |         CAST(sum(CASE WHEN prev IS NULL OR tok <> prev
        |                       THEN 1 ELSE 0 END) AS BIGINT) AS na
        |  FROM m GROUP BY 1, 2)
        |SELECT source, CAST(count(*) AS BIGINT) AS docs,
        |  CAST(sum(nb) AS BIGINT) AS tokens_before,
        |  CAST(sum(na) AS BIGINT) AS tokens_after,
        |  CAST(sum(CASE WHEN na < nb THEN 1 ELSE 0 END) AS BIGINT)
        |    AS docs_touched
        |FROM d GROUP BY source""".stripMargin,
    // nearest-centroid assignment: fixed-point dots are < 2^53, so the
    // double-typed list_inner_product is exact; ties break to the
    // smaller centroid id on both sides
    "q182_centroid_assign" ->
      """WITH q AS (
        |  SELECT vec_id, label,
        |         list_transform(embedding,
        |           x -> CAST(floor(CAST(x AS DOUBLE) * 1e6) AS BIGINT)) AS qx
        |  FROM embeddings),
        |c AS (SELECT vec_id AS cid, qx AS qc FROM q ORDER BY vec_id LIMIT 8),
        |dots AS (
        |  SELECT q.vec_id, q.label, c.cid,
        |         CAST(list_inner_product(q.qx, c.qc) AS BIGINT) AS dot
        |  FROM q CROSS JOIN c),
        |best AS (
        |  SELECT vec_id, label, cid,
        |         row_number() OVER (PARTITION BY vec_id
        |                            ORDER BY dot DESC, cid ASC) AS rn
        |  FROM dots)
        |SELECT cid AS cluster_id, label, CAST(count(*) AS BIGINT) AS n
        |FROM best WHERE rn = 1 GROUP BY 1, 2""".stripMargin,
    // linear quality model: all-BIGINT fixed-point score (operands
    // non-negative, so DuckDB // and Spark div agree)
    "q183_quality_model" ->
      """WITH s AS (
        |  SELECT source,
        |    least(len(regexp_split_to_array(trim(text), '\s+')), 400) * 1000
        |    + (1200000 * len(list_filter(regexp_split_to_array(trim(text), '\s+'),
        |         t -> t IN ('the','a','an','and','of','to','in')))
        |       // greatest(len(regexp_split_to_array(trim(text), '\s+')), 1))
        |    - (900000 * (length(text)
        |         - length(regexp_replace(text, '[^A-Za-z0-9\s]', '', 'g')))
        |       // greatest(length(text), 1))
        |    + (40000 * length(regexp_replace(text, '\s+', '', 'g'))
        |       // greatest(len(regexp_split_to_array(trim(text), '\s+')), 1))
        |      AS score
        |  FROM documents)
        |SELECT source,
        |  CASE WHEN score >= 310000 THEN 'keep' ELSE 'drop' END AS verdict,
        |  CAST(count(*) AS BIGINT) AS n,
        |  CAST(min(score) AS BIGINT) AS min_score,
        |  CAST(max(score) AS BIGINT) AS max_score,
        |  CAST(sum(score) AS BIGINT) AS sum_score
        |FROM s GROUP BY 1, 2""".stripMargin,
    // norm outliers: exact top/bottom 1% by rank on fixed-point norms;
    // a row in both tails reports as 'high' (rhi wins), as in Spark
    "q196_norm_outliers" ->
      """WITH q AS (
        |  SELECT vec_id, label,
        |    list_transform(embedding,
        |      x -> CAST(floor(CAST(x AS DOUBLE) * 1e6) AS BIGINT)) AS qx
        |  FROM embeddings),
        |n2 AS (
        |  SELECT vec_id, label,
        |    CAST(list_sum(list_transform(qx, x -> x * x)) AS BIGINT) AS norm2
        |  FROM q),
        |r AS (
        |  SELECT vec_id, label, norm2,
        |    row_number() OVER (ORDER BY norm2 DESC, vec_id) AS rhi,
        |    row_number() OVER (ORDER BY norm2 ASC, vec_id) AS rlo,
        |    count(*) OVER () AS n
        |  FROM n2)
        |SELECT vec_id, label, norm2,
        |  CASE WHEN rhi <= (n + 99) // 100 THEN 'high' ELSE 'low' END AS tail
        |FROM r
        |WHERE rhi <= (n + 99) // 100 OR rlo <= (n + 99) // 100""".stripMargin,
    // cluster-capped selection: top ceil(25%) by integer quality within
    // each q182 cluster; ties on doc_id; cap = (n+3)//4
    "q195_cluster_capped" ->
      """WITH q AS (
        |  SELECT vec_id, label,
        |         list_transform(embedding,
        |           x -> CAST(floor(CAST(x AS DOUBLE) * 1e6) AS BIGINT)) AS qx
        |  FROM embeddings),
        |c AS (SELECT vec_id AS cid, qx AS qc FROM q ORDER BY vec_id LIMIT 8),
        |best AS (
        |  SELECT vec_id AS doc_id, cid AS cluster_id FROM (
        |    SELECT q.vec_id, c.cid,
        |           row_number() OVER (PARTITION BY q.vec_id
        |             ORDER BY CAST(list_inner_product(q.qx, c.qc) AS BIGINT)
        |               DESC, c.cid ASC) AS rn
        |    FROM q CROSS JOIN c) WHERE rn = 1),
        |s AS (
        |  SELECT doc_id,
        |    least(len(regexp_split_to_array(trim(text), '\s+')), 400) * 1000
        |    + (1200000 * len(list_filter(regexp_split_to_array(trim(text), '\s+'),
        |         t -> t IN ('the','a','an','and','of','to','in')))
        |       // greatest(len(regexp_split_to_array(trim(text), '\s+')), 1))
        |    - (900000 * (length(text)
        |         - length(regexp_replace(text, '[^A-Za-z0-9\s]', '', 'g')))
        |       // greatest(length(text), 1))
        |    + (40000 * length(regexp_replace(text, '\s+', '', 'g'))
        |       // greatest(len(regexp_split_to_array(trim(text), '\s+')), 1))
        |      AS score
        |  FROM documents),
        |r AS (
        |  SELECT b.cluster_id, s.doc_id, s.score,
        |         row_number() OVER (PARTITION BY b.cluster_id
        |                            ORDER BY s.score DESC, s.doc_id) AS rn,
        |         count(*) OVER (PARTITION BY b.cluster_id) AS n
        |  FROM best b JOIN s ON s.doc_id = b.doc_id)
        |SELECT cluster_id, CAST(any_value(n) AS BIGINT) AS n_members,
        |       CAST(count(*) AS BIGINT) AS n_kept,
        |       CAST(min(score) AS BIGINT) AS cut_score
        |FROM r WHERE rn <= (n + 3) // 4
        |GROUP BY cluster_id""".stripMargin,
    // Simpson diversity: log-free (1 - sum p^2), pure rational arithmetic
    "q194_source_diversity" ->
      """WITH tok AS (
        |  SELECT source, unnest(regexp_split_to_array(trim(text), '\s+')) AS w
        |  FROM documents),
        |c AS (SELECT source, w, CAST(count(*) AS BIGINT) AS c
        |      FROM tok GROUP BY 1, 2),
        |agg AS (
        |  SELECT source, CAST(sum(c) AS BIGINT) AS n,
        |         CAST(sum(c * c) AS BIGINT) AS s2,
        |         CAST(count(*) AS BIGINT) AS vocab
        |  FROM c GROUP BY 1)
        |SELECT source, n, vocab, s2,
        |       1.0 - CAST(s2 AS DOUBLE)
        |             / (CAST(n AS DOUBLE) * CAST(n AS DOUBLE)) AS simpson,
        |       CAST(n AS DOUBLE) * CAST(n AS DOUBLE)
        |         / CAST(s2 AS DOUBLE) AS eff_vocab
        |FROM agg""".stripMargin,
    // native session_window: gap-islands oracle; end = last event + gap
    "q193_session_window" ->
      """WITH m AS (
        |  SELECT user_id, ts,
        |    CASE WHEN lag(ts) OVER (PARTITION BY user_id ORDER BY ts)
        |              IS NULL OR
        |              ts - lag(ts) OVER (PARTITION BY user_id ORDER BY ts)
        |              > INTERVAL 30 MINUTE
        |         THEN 1 ELSE 0 END AS brk
        |  FROM events),
        |s AS (
        |  SELECT user_id, ts,
        |         sum(brk) OVER (PARTITION BY user_id ORDER BY ts
        |                        ROWS UNBOUNDED PRECEDING) AS sid
        |  FROM m)
        |SELECT user_id, epoch_us(min(ts)) AS session_start_us,
        |       epoch_us(max(ts) + INTERVAL 30 MINUTE) AS session_end_us,
        |       CAST(count(*) AS BIGINT) AS n_events
        |FROM s GROUP BY user_id, sid""".stripMargin,
    // rarity-weighted Jaccard: w(gram) = 1e9 div df; candidates share a
    // rare gram (2<=df<=10); one IEEE division at publish
    "q192_weighted_jaccard" ->
      """WITH toks AS (
        |  SELECT doc_id, regexp_split_to_array(trim(text), '\s+') AS t
        |  FROM documents),
        |sh AS (
        |  SELECT DISTINCT doc_id, array_to_string(t[i:i+2], ' ') AS shingle
        |  FROM (SELECT doc_id, t,
        |          unnest(generate_series(1, len(t) - 2)) AS i FROM toks)),
        |dfr AS (SELECT shingle, CAST(count(*) AS BIGINT) AS df
        |        FROM sh GROUP BY 1),
        |wt AS (SELECT shingle, 1000000000 // df AS w FROM dfr),
        |tot AS (SELECT doc_id, CAST(sum(w) AS BIGINT) AS tw
        |        FROM sh JOIN wt USING (shingle) GROUP BY 1),
        |shr AS (SELECT doc_id, shingle FROM sh JOIN dfr USING (shingle)
        |        WHERE df BETWEEN 2 AND 10),
        |cand AS (SELECT DISTINCT a.doc_id AS a_id, b.doc_id AS b_id
        |         FROM shr a JOIN shr b USING (shingle)
        |         WHERE a.doc_id < b.doc_id),
        |inter AS (
        |  SELECT c.a_id, c.b_id, CAST(sum(w.w) AS BIGINT) AS iw
        |  FROM cand c
        |  JOIN sh sa ON sa.doc_id = c.a_id
        |  JOIN sh sb ON sb.doc_id = c.b_id AND sb.shingle = sa.shingle
        |  JOIN wt w ON w.shingle = sa.shingle
        |  GROUP BY 1, 2)
        |SELECT a_id, b_id,
        |       CAST(iw AS DOUBLE) / (ta.tw + tb.tw - iw) AS wjaccard
        |FROM inter
        |JOIN tot ta ON ta.doc_id = a_id
        |JOIN tot tb ON tb.doc_id = b_id
        |WHERE CAST(iw AS DOUBLE) / (ta.tw + tb.tw - iw) >= 0.2""".stripMargin,
    // shard-boundary stitch detection: tail-8 == head-8 equi-join over
    // parts split with an 8-token overlap
    "q191_stitch_detect" ->
      """WITH toks AS (
        |  SELECT doc_id, regexp_split_to_array(trim(text), '\s+') AS tk
        |  FROM documents
        |  WHERE len(regexp_split_to_array(trim(text), '\s+')) >= 24),
        |parts AS (
        |  SELECT doc_id * 10 + 1 AS part_id,
        |         array_to_string(tk[1 : len(tk)//2 + 4], ' ') AS text
        |  FROM toks
        |  UNION ALL
        |  SELECT doc_id * 10 + 2,
        |         array_to_string(tk[len(tk)//2 - 3 : len(tk)], ' ')
        |  FROM toks),
        |p AS (SELECT part_id,
        |             regexp_split_to_array(trim(text), '\s+') AS tk
        |      FROM parts),
        |edge AS (
        |  SELECT part_id,
        |    array_to_string(tk[greatest(len(tk)-7, 1) : len(tk)], ' ') AS tail8,
        |    array_to_string(tk[1:8], ' ') AS head8
        |  FROM p WHERE len(tk) >= 8)
        |SELECT a.part_id AS left_id, b.part_id AS right_id
        |FROM edge a JOIN edge b
        |  ON a.tail8 = b.head8 AND a.part_id <> b.part_id""".stripMargin,
    // normalization-aware exact dedup: variant copies (case/punct) that
    // raw exact dedup misses collapse after canonicalization
    "q190_normalized_dedup" ->
      """WITH corpus AS (
        |  SELECT doc_id, text FROM documents
        |  UNION ALL
        |  SELECT doc_id + 1000000, upper(text) || '!!' FROM documents
        |  WHERE doc_id % 2 = 0),
        |n AS (
        |  SELECT doc_id,
        |    regexp_replace(regexp_replace(lower(text), '[^a-z0-9 ]', '', 'g'),
        |                   ' +', ' ', 'g') AS norm
        |  FROM corpus)
        |SELECT md5(norm) AS norm_hash, CAST(min(doc_id) AS BIGINT) AS keeper_id,
        |       CAST(count(*) AS BIGINT) AS dup_count
        |FROM n GROUP BY norm HAVING count(*) >= 2""".stripMargin,
    // CDC cascade: orders of CDF-erased customers merge-deleted away.
    // The oracle must scope erasure to customers that EXIST in the
    // parent (an order referencing no customer row is untouched).
    "q189_cdc_cascade" ->
      """SELECT o.* FROM orders o
        |WHERE NOT EXISTS (
        |  SELECT 1 FROM customer c
        |  WHERE c.c_custkey = o.o_custkey AND c.c_custkey % 13 = 0)""".stripMargin,
    // MOSS matcher: pairs sharing >= 3 rare winnowed fingerprints
    // (df capped at 10 before the posting self-join)
    "q188_winnow_pairs" ->
      """WITH t AS (
        |  SELECT doc_id, regexp_split_to_array(trim(text), '\s+') AS toks
        |  FROM documents),
        |g AS (
        |  SELECT doc_id,
        |    list_transform(generate_series(1, len(toks) - 3),
        |      i -> array_to_string(toks[i:i+3], ' ')) AS grams
        |  FROM t WHERE len(toks) >= 8),
        |h AS (
        |  SELECT doc_id,
        |    list_transform(grams, g2 -> list_reduce(
        |      list_prepend(CAST(0 AS BIGINT),
        |        list_transform(generate_series(1, length(g2)),
        |          j -> CAST(ascii(substring(g2, j, 1)) AS BIGINT))),
        |      (a, b) -> (a * 31 + b) % 1000000007)) AS hs
        |  FROM g),
        |e AS (
        |  SELECT doc_id,
        |    list_transform(generate_series(1, len(hs)),
        |      i -> hs[i] * 65536 + i) AS enc
        |  FROM h),
        |f AS (
        |  SELECT doc_id,
        |    list_distinct(list_transform(generate_series(1, len(enc) - 4),
        |      s -> list_min(enc[s:s+4]))) AS fps
        |  FROM e),
        |x AS (SELECT DISTINCT doc_id, unnest(fps) // 65536 AS fp FROM f),
        |keep AS (SELECT fp FROM x GROUP BY fp
        |         HAVING count(*) BETWEEN 2 AND 10)
        |SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
        |       CAST(count(*) AS BIGINT) AS shared
        |FROM x a JOIN keep USING (fp) JOIN x b USING (fp)
        |WHERE a.doc_id < b.doc_id
        |GROUP BY 1, 2 HAVING count(*) >= 3""".stripMargin,
    // winnowing (MOSS): token-4-gram polynomial hashes, w=5 window
    // minima with pos-encoded tie-break, posting-list share counts
    "q187_winnowing" ->
      """WITH t AS (
        |  SELECT doc_id, regexp_split_to_array(trim(text), '\s+') AS toks
        |  FROM documents),
        |g AS (
        |  SELECT doc_id,
        |    list_transform(generate_series(1, len(toks) - 3),
        |      i -> array_to_string(toks[i:i+3], ' ')) AS grams
        |  FROM t WHERE len(toks) >= 8),
        |h AS (
        |  SELECT doc_id,
        |    list_transform(grams, g2 -> list_reduce(
        |      list_prepend(CAST(0 AS BIGINT),
        |        list_transform(generate_series(1, length(g2)),
        |          j -> CAST(ascii(substring(g2, j, 1)) AS BIGINT))),
        |      (a, b) -> (a * 31 + b) % 1000000007)) AS hs
        |  FROM g),
        |e AS (
        |  SELECT doc_id, len(hs) AS n_grams,
        |    list_transform(generate_series(1, len(hs)),
        |      i -> hs[i] * 65536 + i) AS enc
        |  FROM h),
        |f AS (
        |  SELECT doc_id, n_grams,
        |    list_distinct(list_transform(generate_series(1, len(enc) - 4),
        |      s -> list_min(enc[s:s+4]))) AS fps
        |  FROM e),
        |x AS (SELECT doc_id, n_grams, len(fps) AS n_fps,
        |             unnest(fps) // 65536 AS fp FROM f),
        |post AS (SELECT fp FROM x GROUP BY fp
        |         HAVING count(DISTINCT doc_id) >= 2)
        |SELECT x.doc_id, CAST(any_value(n_grams) AS BIGINT) AS n_grams,
        |  CAST(any_value(n_fps) AS BIGINT) AS n_fps,
        |  CAST(sum(CASE WHEN post.fp IS NULL THEN 0 ELSE 1 END) AS BIGINT)
        |    AS shared_fps
        |FROM x LEFT JOIN post USING (fp)
        |GROUP BY x.doc_id""".stripMargin,
    // column defaults: pre-declaration rows read NULL, post-declaration
    // inserts that omit the column are filled with it
    "q186_column_defaults" ->
      """SELECT n_nationkey, n_name, n_regionkey,
        |       CAST(NULL AS VARCHAR) AS status
        |FROM nation
        |UNION ALL SELECT CAST(900 AS INTEGER), 'ATLANTIS',
        |                 CAST(0 AS INTEGER), 'active'
        |UNION ALL SELECT CAST(901 AS INTEGER), 'LEMURIA',
        |                 CAST(1 AS INTEGER), 'active'""".stripMargin,
    // one Lloyd round: assign to seeds, integer-mean centroids
    // (sign-split truncating division), re-assign; ties to smaller cid
    "q185_kmeans_refine" ->
      """WITH q AS (
        |  SELECT vec_id, label,
        |         list_transform(embedding,
        |           x -> CAST(floor(CAST(x AS DOUBLE) * 1e6) AS BIGINT)) AS qx
        |  FROM embeddings),
        |c0 AS (SELECT vec_id AS cid, qx AS qc FROM q ORDER BY vec_id LIMIT 8),
        |a1 AS (
        |  SELECT vec_id, qx, cid FROM (
        |    SELECT q.vec_id, q.qx, c0.cid,
        |           row_number() OVER (PARTITION BY q.vec_id
        |             ORDER BY CAST(list_inner_product(q.qx, c0.qc) AS BIGINT)
        |               DESC, c0.cid ASC) AS rn
        |    FROM q CROSS JOIN c0) WHERE rn = 1),
        |x1 AS (
        |  SELECT cid, generate_subscripts(qx, 1) AS dim, unnest(qx) AS x
        |  FROM a1),
        |c1 AS (
        |  SELECT cid, list(cx ORDER BY dim) AS qc FROM (
        |    SELECT cid, dim,
        |      CAST((CASE WHEN sum(x) < 0 THEN -1 ELSE 1 END)
        |           * (abs(sum(x)) // count(*)) AS BIGINT) AS cx
        |    FROM x1 GROUP BY 1, 2) GROUP BY cid),
        |a2 AS (
        |  SELECT vec_id, label, cid FROM (
        |    SELECT q.vec_id, q.label, c1.cid,
        |           row_number() OVER (PARTITION BY q.vec_id
        |             ORDER BY CAST(list_inner_product(q.qx, c1.qc) AS BIGINT)
        |               DESC, c1.cid ASC) AS rn
        |    FROM q CROSS JOIN c1) WHERE rn = 1)
        |SELECT cid AS cluster_id, label, CAST(count(*) AS BIGINT) AS n
        |FROM a2 GROUP BY 1, 2""".stripMargin,
    // DROP FEATURE deletionVectors: survivors of the purged DV delete,
    // with dv_dropped computed from the mirror's downgraded protocol
    "q184_drop_feature" ->
      """SELECT c_custkey, c_name, c_acctbal, CAST(1 AS BIGINT) AS dv_dropped
        |FROM customer WHERE c_custkey % 3 <> 0""".stripMargin,
    // metadata-only extremes: exact int64/timestamp footer stats
    "q99_metadata_minmax" ->
      """SELECT count(*) AS cnt,
        |  min(o_orderkey) AS min_key, max(o_orderkey) AS max_key,
        |  min(o_orderdate) AS min_date, max(o_orderdate) AS max_date
        |FROM orders""".stripMargin,
    // purge lifecycle: delete → materialize (touched dirs only) → append;
    // same oracle as q88 — the rewrite must preserve every surviving row
    "q90_dv_purge" ->
      """SELECT * FROM orders WHERE o_orderstatus <> 'F'
        |UNION ALL
        |SELECT * FROM orders
        |WHERE o_orderstatus = 'F' AND o_orderkey % 100 = 0""".stripMargin,
    // positional-DV update: every row exactly once, assignment applied
    "q89_dv_update" ->
      """SELECT o_orderkey, o_custkey, o_orderstatus,
        |       CASE WHEN o_orderstatus = 'P' THEN o_totalprice * 1.1
        |            ELSE o_totalprice END AS o_totalprice,
        |       o_orderdate, o_orderpriority
        |FROM orders""".stripMargin,
    "q12_time_travel" -> "SELECT * FROM orders",
    "q13_change_feed" ->
      """SELECT o_orderkey, o_custkey, o_orderstatus, o_totalprice, o_orderdate, o_orderpriority,
        |       'insert' AS _change_type, CAST(1 AS BIGINT) AS _commit_version
        |FROM orders WHERE o_orderkey % 2 = 1
        |UNION ALL
        |SELECT o_orderkey, o_custkey, o_orderstatus, -1.0, o_orderdate, o_orderpriority,
        |       'update_preimage', 1 FROM orders WHERE o_orderkey % 2 = 0
        |UNION ALL
        |SELECT o_orderkey, o_custkey, o_orderstatus, o_totalprice, o_orderdate, o_orderpriority,
        |       'update_postimage', 1 FROM orders WHERE o_orderkey % 2 = 0""".stripMargin,
    "q14_history" ->
      """SELECT CAST(0 AS BIGINT) AS version, 'CREATE' AS operation,
        |       (SELECT count(*) FROM orders WHERE o_orderkey % 2 = 0) AS num_rows
        |UNION ALL
        |SELECT 1, 'MERGE', (SELECT count(*) FROM orders)""".stripMargin,
    "q15_latest_event_per_user" ->
      """SELECT event_id, ts, user_id, event_type, value, props FROM (
        |  SELECT *, row_number() OVER (PARTITION BY user_id ORDER BY ts DESC, event_id DESC) AS rn
        |  FROM events) t WHERE rn = 1""".stripMargin,
    "q16_version_diff" -> "SELECT o_orderkey FROM orders WHERE o_orderstatus = 'F'",
    "q17_json_parse" ->
      "SELECT event_id, CAST(json_extract_string(props, '$.k') AS INTEGER) AS k FROM events",
    "q18_scalar_surface" ->
      """SELECT event_id,
        |       concat_ws('-', event_type, user_id) AS event_key,
        |       CASE WHEN event_type = 'signup' THEN 'INSERT'
        |            WHEN event_type = 'purchase' THEN 'UPDATE'
        |            WHEN event_type = 'error' THEN 'DELETE'
        |            ELSE 'READ' END AS op_name,
        |       date_trunc('hour', ts) AS ts_hour,
        |       strftime(ts, '%Y-%m-%d') AS ts_day,
        |       epoch_ms(ts) AS ts_ms,
        |       coalesce("value", 0.0) AS value_filled
        |FROM events""".stripMargin,
    "q19_event_stats" ->
      """SELECT event_type, count(*) AS event_count,
        |       min(ts) AS first_seen, max(ts) AS last_seen,
        |       count(DISTINCT user_id) AS distinct_users
        |FROM events GROUP BY 1 ORDER BY 1""".stripMargin,
    "q20_token_stats" ->
      """SELECT doc_id,
        |  len(regexp_split_to_array(trim(text), '\s+')) AS token_count,
        |  len(regexp_extract_all(text, '[A-Za-z0-9]+|[^A-Za-z0-9\s]')) AS bpe_token_count,
        |  CAST(length(text) AS BIGINT) AS char_count,
        |  CAST(length(text) - length(regexp_replace(text, '[^A-Za-z0-9\s]', '', 'g')) AS DOUBLE)
        |    / greatest(length(text), 1) AS punct_ratio,
        |  CAST(len(list_filter(regexp_split_to_array(trim(text), '\s+'),
        |       t -> t IN ('the','a','an','and','of','to','in'))) AS DOUBLE)
        |    / greatest(len(regexp_split_to_array(trim(text), '\s+')), 1) AS stopword_ratio,
        |  CAST(length(regexp_replace(text, '\s+', '', 'g')) AS DOUBLE)
        |    / greatest(len(regexp_split_to_array(trim(text), '\s+')), 1) AS avg_word_len
        |FROM documents""".stripMargin,
    "q21_lang_id" ->
      """WITH s AS (
        |  SELECT doc_id,
        |    len(list_filter(regexp_split_to_array(trim(text), '\s+'), x -> x IN ('the','a','and','of','is'))) AS en,
        |    len(list_filter(regexp_split_to_array(trim(text), '\s+'), x -> x IN ('der','die','das','und','ist'))) AS de,
        |    len(list_filter(regexp_split_to_array(trim(text), '\s+'), x -> x IN ('el','la','los','que','es'))) AS es,
        |    len(list_filter(regexp_split_to_array(trim(text), '\s+'), x -> x IN ('le','la','les','et','est'))) AS fr
        |  FROM documents)
        |SELECT doc_id,
        |  CASE WHEN en = greatest(en, de, es, fr) AND en > 0 THEN 'en'
        |       WHEN de = greatest(en, de, es, fr) AND de > 0 THEN 'de'
        |       WHEN es = greatest(en, de, es, fr) AND es > 0 THEN 'es'
        |       WHEN fr = greatest(en, de, es, fr) AND fr > 0 THEN 'fr'
        |       ELSE 'unknown' END AS predicted_lang
        |FROM s""".stripMargin,
    "q22_fingerprints" ->
      """SELECT doc_id, md5(text) AS content_hash,
        |  md5(array_to_string(list_sort(list_distinct(regexp_split_to_array(trim(text), '\s+'))), ' ')) AS tokenset_fp,
        |  list_reduce(
        |    list_prepend(CAST(0 AS BIGINT),
        |      list_transform(generate_series(1, length(text)),
        |                     i -> CAST(ascii(substring(text, i, 1)) AS BIGINT))),
        |    (a, b) -> (a * 31 + b) % 1000000007) AS rolling_hash
        |FROM documents""".stripMargin,
    "q23_exact_dedup" ->
      """SELECT md5(text) AS text_hash, min(doc_id) AS keeper_id, count(*) AS dup_count
        |FROM documents GROUP BY md5(text)""".stripMargin,
    "q24_tokenset_dedup" ->
      """SELECT md5(array_to_string(list_sort(list_distinct(regexp_split_to_array(trim(text), '\s+'))), ' ')) AS fingerprint,
        |       min(doc_id) AS keeper_id, count(*) AS dup_count
        |FROM documents GROUP BY 1""".stripMargin,
    // q25/q27 share one oracle: both pipelines report EXACT jaccard over the
    // full shingle sets and (spec + locally verified) reach every true pair
    // at this threshold, so plain exact trigram-jaccard SQL reproduces them.
    "q25_minhash_neardup" -> JaccardOracleSql,
    "q26_simhash_neardup" -> SimhashOracleSql,
    "q27_ngram_jaccard" -> JaccardOracleSql,
    "q28_cosine_topk" -> CosineTopKOracleSql,
    // Banded probing (SimilaritySpec + local sf0.01 check) recovers the full
    // exact top-10, so the ANN path is graded against the exact oracle.
    "q31_cosine_topk_lsh" -> CosineTopKOracleSql,
    // IVF / PQ / IVF+PQ all end in an EXACT rerank of their candidate set,
    // and at AnnParams' probe geometry (nprobe=7, m=8×k=256 codebooks,
    // shortlist=128 — swept in tools/AnnRecallProbe + tools/PqConfigProbe)
    // the candidate set contains the full exact top-10 on every test
    // corpus, so all three reproduce the brute-force ranking bit-for-bit
    // and are held to the same exact oracle: a recall regression in the
    // production ANN read path now fails the driver gate.
    "q44_ivf_topk" -> CosineTopKOracleSql,
    "q48_pq_topk" -> CosineTopKOracleSql,
    "q64_ivfpq_topk" -> CosineTopKOracleSql,
    // the persisted-index probe (partition-pruned on-disk read path) has
    // identical candidate semantics to q64 → same exact oracle
    "q72_ivf_index_probe" -> CosineTopKOracleSql,
    // connected components over the q27 pair graph; oracle = transitive
    // closure by recursive CTE over the same exact-jaccard pairs
    "q73_dup_clusters" -> DupClustersOracleSql,
    // the LSH candidate path reaches the same verified pair set on this
    // corpus (q25 ≡ exact oracle), so the same closure oracle applies
    "q81_dup_clusters_lsh" -> DupClustersOracleSql,
    // filter ∩ keepers, composed from the q71 filter and the q73 closure:
    // the fdocs CTE shadows the documents source inside the closure SQL
    "q86_clean_corpus" -> CleanCorpusOracleSql,
    // leakage-safe split: q59's exact bucket function on the CLUSTER id
    // from the q73 closure — near-dups share a split by construction
    "q168_leakage_safe_split" ->
      s"""SELECT doc_id, cluster_id, cluster_size, bucket,
         |  CASE WHEN bucket < 900 THEN 'train'
         |       WHEN bucket < 950 THEN 'val'
         |       ELSE 'test' END AS split
         |FROM (
         |  SELECT doc_id, cluster_id, cluster_size,
         |    CAST(list_sum(list_transform(range(8),
         |      i -> (strpos('0123456789abcdef',
         |              substring(md5(CAST(cluster_id AS VARCHAR)), CAST(i + 1 AS INT), 1)) - 1)
         |           * pow(16, 7 - i))) AS BIGINT) % 1000 AS bucket
         |  FROM (
         |$DupClustersOracleSql
         |  )
         |)""".stripMargin,
    // the closure aggregated into the published dedup summary
    "q87_dedup_report" ->
      s"""SELECT cluster_size,
         |       count(DISTINCT cluster_id) AS n_clusters,
         |       count(*) AS n_docs
         |FROM (
         |$DupClustersOracleSql
         |) GROUP BY 1""".stripMargin,
    // salting reshapes the shuffle, not the result — the oracle is the
    // plain join
    "q82_salted_join" ->
      """SELECT e.event_id, e.user_id, e.event_type, c.c_mktsegment AS segment
        |FROM events e JOIN customer c ON e.user_id = c.c_custkey""".stripMargin,
    // value-defined RANGE frame: peers at the same date share a frame on
    // both engines, so the moving sums align row-for-row
    "q80_trailing_window" ->
      """SELECT o_orderkey, o_custkey, o_orderdate,
        |       CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) OVER w AS DOUBLE)
        |         AS spend_30d,
        |       count(*) OVER w AS orders_30d
        |FROM orders
        |WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate
        |             RANGE BETWEEN INTERVAL 30 DAY PRECEDING AND CURRENT ROW)""".stripMargin,
    // integer-exact list arithmetic on both engines; arrays leave the
    // query as joined strings so the gate hashes scalars only
    "q79_array_funcs" ->
      """WITH a AS (
        |  SELECT l_orderkey AS o_orderkey,
        |         array_agg(CAST(l_quantity AS BIGINT)
        |                   ORDER BY l_linenumber, l_quantity) AS qts
        |  FROM lineitem GROUP BY 1)
        |SELECT o_orderkey,
        |       CAST(len(qts) AS BIGINT) AS n_items,
        |       CAST(list_sum(qts) AS BIGINT) AS qty_total,
        |       CAST(list_max(qts) AS BIGINT) AS qty_max,
        |       CAST(list_min(qts) AS BIGINT) AS qty_min,
        |       CAST(len(list_filter(qts, x -> x > 25)) AS BIGINT) AS high_cnt,
        |       CAST(list_sum(list_transform(qts, x -> x * x)) AS BIGINT) AS qty_sq_sum,
        |       array_to_string(qts[1:3], ',') AS first3
        |FROM a""".stripMargin,
    // DuckDB's GROUPING() bit order (leftmost key = MSB) matches Spark's
    // grouping_id() — verified on both engines
    "q77_grouping_sets" ->
      """SELECT c.c_mktsegment AS segment, o.o_orderpriority AS priority,
        |       CAST(GROUPING(c.c_mktsegment, o.o_orderpriority) AS BIGINT) AS gid,
        |       count(*) AS order_count,
        |       CAST(sum(CAST(o.o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS revenue
        |FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
        |GROUP BY GROUPING SETS ((c.c_mktsegment, o.o_orderpriority),
        |                        (c.c_mktsegment), ())""".stripMargin,
    "q78_hourly_gap_fill" ->
      """WITH b AS (
        |  SELECT user_id, date_trunc('hour', min(ts)) AS h0,
        |         date_trunc('hour', max(ts)) AS h1
        |  FROM events GROUP BY 1),
        |h AS (
        |  SELECT user_id, unnest(generate_series(h0, h1, INTERVAL 1 HOUR)) AS hour
        |  FROM b),
        |c AS (
        |  SELECT user_id, date_trunc('hour', ts) AS hour, count(*) AS n,
        |         CAST(sum(CAST("value" AS DECIMAL(18,2))) AS DOUBLE) AS v
        |  FROM events GROUP BY 1, 2)
        |SELECT h.user_id, h.hour,
        |       coalesce(c.n, 0) AS events,
        |       coalesce(c.v, 0.0) AS total_value
        |FROM h LEFT JOIN c ON h.user_id = c.user_id AND h.hour = c.hour""".stripMargin,
    // the comparison is (price × n) > Σprice in exact DECIMAL arithmetic on
    // both engines — an average-above test with no float division
    "q74_subquery_suite" ->
      """SELECT c.c_custkey,
        |  (SELECT count(*) FROM orders o
        |    WHERE o.o_custkey = c.c_custkey
        |      AND CAST(o.o_totalprice AS DECIMAL(18,2)) *
        |          (SELECT count(*) FROM orders o2
        |            WHERE o2.o_custkey = o.o_custkey) >
        |          (SELECT sum(CAST(o3.o_totalprice AS DECIMAL(18,2)))
        |             FROM orders o3 WHERE o3.o_custkey = o.o_custkey)
        |  ) AS above_avg_orders,
        |  EXISTS (SELECT 1 FROM orders o
        |           WHERE o.o_custkey = c.c_custkey
        |             AND o.o_orderpriority = '1-URGENT') AS has_urgent
        |FROM customer c
        |WHERE EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey)""".stripMargin,
    "q29_embedding_neardup" -> EmbeddingNearDupOracleSql,
    // The banded multi-probe LSH (DedupSpec pins it) recovers the full exact
    // pair set on this corpus, so the approximate path is held to the exact
    // oracle — a recall regression now fails the driver gate instead of
    // passing rows-only.
    "q30_embedding_neardup_lsh" -> EmbeddingNearDupOracleSql,
    "q32_hourly_events" ->
      """SELECT date_trunc('hour', ts) AS window_start, event_type,
        |       count(*) AS event_count,
        |       CAST(sum(CAST("value" AS DECIMAL(18,2))) AS DOUBLE) AS total_value
        |FROM events GROUP BY 1, 2""".stripMargin,
    // Hopping windows (q178): width 1 h, slide 30 min — every event lands
    // in exactly two windows, derived by 30-minute epoch bucketing (Spark's
    // window origin is the unix epoch, so the alignments agree); decimal
    // value sums keep the total order-independent.
    "q178_hopping_events" ->
      """WITH e AS (
        |  SELECT epoch_us(ts) AS us, event_type, "value" FROM events),
        |w AS (
        |  SELECT (us // 1800000000) * 1800000000 AS ws, event_type, "value" FROM e
        |  UNION ALL
        |  SELECT (us // 1800000000) * 1800000000 - 1800000000 AS ws,
        |         event_type, "value" FROM e)
        |SELECT ws AS window_start_us, event_type,
        |  CAST(count(*) AS BIGINT) AS event_count,
        |  CAST(sum(CAST("value" AS DECIMAL(18,2))) AS DOUBLE) AS total_value
        |FROM w GROUP BY ws, event_type""".stripMargin,
    "q33_media_features" ->
      """SELECT doc_id AS media_id,
        |       ['image','audio','video'][CAST(doc_id % 3 AS INT) + 1] AS kind,
        |       CAST(octet_length(encode(text)) AS BIGINT) AS n_bytes,
        |       CASE WHEN octet_length(encode(text)) = 0 THEN CAST(0 AS REAL)
        |            ELSE CAST(length(text) - length(replace(text, ' ', '')) AS REAL)
        |                 / CAST(octet_length(encode(text)) AS REAL) END AS f_space,
        |       CASE WHEN octet_length(encode(text)) = 0 THEN CAST(0 AS REAL)
        |            ELSE CAST(length(text) - length(replace(text, 'a', '')) AS REAL)
        |                 / CAST(octet_length(encode(text)) AS REAL) END AS f_a
        |FROM documents""".stripMargin,
    "q34_asof_join" ->
      """WITH r AS (
        |  SELECT o_custkey, o_orderdate, count(*) AS day_orders,
        |         CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS day_total
        |  FROM orders GROUP BY 1, 2)
        |SELECT e.event_id, e.user_id, e.ts, r.o_orderdate AS matched_date,
        |       r.day_orders, r.day_total
        |FROM events e ASOF LEFT JOIN r
        |  ON e.user_id = r.o_custkey AND r.o_orderdate <= e.ts""".stripMargin,
    "q35_revenue_rollup" ->
      """SELECT r.r_name AS region, n.n_name AS nation,
        |       count(*) AS order_count,
        |       CAST(sum(CAST(o.o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS revenue
        |FROM orders o
        |JOIN customer c ON o.o_custkey = c.c_custkey
        |JOIN nation n ON c.c_nationkey = n.n_nationkey
        |JOIN region r ON n.n_regionkey = r.r_regionkey
        |GROUP BY ROLLUP (r.r_name, n.n_name)""".stripMargin,
    "q36_event_sessions" ->
      """WITH g AS (
        |  SELECT *, CASE WHEN prev_ts IS NULL
        |                   OR epoch_ms(ts) - epoch_ms(prev_ts) > 30 * 60 * 1000
        |                 THEN 1 ELSE 0 END AS new_session
        |  FROM (SELECT event_id, user_id, ts, "value",
        |               lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev_ts
        |        FROM events)),
        |s AS (
        |  SELECT *, CAST(sum(new_session) OVER (
        |    PARTITION BY user_id ORDER BY ts, event_id
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS session_id
        |  FROM g)
        |SELECT user_id, session_id, count(*) AS session_events,
        |       min(ts) AS session_start, max(ts) AS session_end,
        |       CAST(sum(CAST("value" AS DECIMAL(18,2))) AS DOUBLE) AS session_value
        |FROM s GROUP BY 1, 2""".stripMargin,
    "q37_segment_stats" ->
      """SELECT c.c_mktsegment AS segment,
        |       count(DISTINCT c.c_custkey) AS active_customers,
        |       count(*) AS orders_total,
        |       CAST(sum(CASE WHEN o.o_orderstatus = 'F' THEN 1 ELSE 0 END) AS BIGINT) AS orders_f,
        |       CAST(sum(CASE WHEN o.o_orderstatus = 'O' THEN 1 ELSE 0 END) AS BIGINT) AS orders_o,
        |       max(o.o_totalprice) AS max_order
        |FROM customer c JOIN orders o ON c.c_custkey = o.o_custkey
        |GROUP BY 1 ORDER BY 1""".stripMargin,
    "q38_topk_per_key" ->
      """SELECT o_orderkey, o_custkey, o_orderstatus, o_totalprice, o_orderdate, o_orderpriority
        |FROM (SELECT *, row_number() OVER (
        |        PARTITION BY o_custkey
        |        ORDER BY o_totalprice DESC, o_orderkey DESC) AS rn
        |      FROM orders) t
        |WHERE rn <= 3""".stripMargin,
    "q39_decimal_pricing" ->
      """SELECT l_returnflag,
        |       CAST(sum(CAST(l_extendedprice AS DECIMAL(12,2))) AS DECIMAL(18,2)) AS revenue_dec,
        |       CAST(avg(CAST(l_discount AS DECIMAL(12,2))) AS DECIMAL(18,6)) AS avg_discount_dec
        |FROM lineitem GROUP BY 1 ORDER BY 1""".stripMargin,
    "q40_range_join" ->
      """SELECT a.event_id AS probe_id, b.event_id AS anchor_id
        |FROM events a JOIN events b
        |  ON a.user_id = b.user_id AND b.event_type = 'error'
        | AND a.ts >= b.ts AND a.ts < b.ts + INTERVAL 1 HOUR""".stripMargin,
    "q41_quality_score" ->
      """WITH b AS (
        |  SELECT doc_id,
        |    len(regexp_split_to_array(trim(text), '\s+')) AS t,
        |    CAST(length(text) - length(regexp_replace(text, '[^A-Za-z0-9\s]', '', 'g')) AS DOUBLE)
        |      / greatest(length(text), 1) AS punct_ratio,
        |    CAST(len(list_filter(regexp_split_to_array(trim(text), '\s+'),
        |         x -> x IN ('the','a','an','and','of','to','in'))) AS DOUBLE)
        |      / greatest(len(regexp_split_to_array(trim(text), '\s+')), 1) AS stop_ratio
        |  FROM documents)
        |SELECT doc_id,
        |  (least(CAST(t AS DOUBLE) / 50.0, 1.0)
        |   + (1.0 - least(punct_ratio * 4.0, 1.0))
        |   + least(stop_ratio * 5.0, 1.0)) / 3.0 AS quality
        |FROM b""".stripMargin,
    // per-source quantile normalization of the q41 score: ranks are
    // integer positions over the bit-identical quality double (doc_id
    // tiebreak), percent_rank = (rank-1)/(n-1) one exact division
    "q171_quality_quantiles" ->
      """WITH b AS (
        |  SELECT doc_id, source,
        |    len(regexp_split_to_array(trim(text), '\s+')) AS t,
        |    CAST(length(text) - length(regexp_replace(text, '[^A-Za-z0-9\s]', '', 'g')) AS DOUBLE)
        |      / greatest(length(text), 1) AS punct_ratio,
        |    CAST(len(list_filter(regexp_split_to_array(trim(text), '\s+'),
        |         x -> x IN ('the','a','an','and','of','to','in'))) AS DOUBLE)
        |      / greatest(len(regexp_split_to_array(trim(text), '\s+')), 1) AS stop_ratio
        |  FROM documents),
        |s AS (
        |  SELECT doc_id, source,
        |    (least(CAST(t AS DOUBLE) / 50.0, 1.0)
        |     + (1.0 - least(punct_ratio * 4.0, 1.0))
        |     + least(stop_ratio * 5.0, 1.0)) / 3.0 AS quality
        |  FROM b)
        |SELECT doc_id, source, quality,
        |  percent_rank() OVER (PARTITION BY source ORDER BY quality, doc_id)
        |    AS source_pct
        |FROM s""".stripMargin,
    "q42_supplier_stats" ->
      """SELECT r.r_name AS region, count(*) AS supplier_count,
        |       CAST(sum(CAST(s_acctbal AS DECIMAL(18,2))) AS DOUBLE) AS total_balance,
        |       max(s.s_name) AS max_name
        |FROM supplier s
        |JOIN nation n ON s.s_nationkey = n.n_nationkey
        |JOIN region r ON n.n_regionkey = r.r_regionkey
        |GROUP BY 1 ORDER BY 1""".stripMargin,
    "q43_sql_text_path" ->
      """SELECT c.c_mktsegment AS segment, o.o_orderpriority AS priority,
        |       count(*) AS n,
        |       CAST(sum(CAST(o.o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS revenue
        |FROM customer c JOIN orders o ON c.c_custkey = o.o_custkey
        |GROUP BY 1, 2""".stripMargin,
    "q45_partition_prune" ->
      """SELECT * FROM orders
        |WHERE o_orderkey <= (SELECT CAST(max(o_orderkey) AS BIGINT) // 4 FROM orders)
        |  AND o_orderstatus = 'F'""".stripMargin,
    "q46_zorder_scan" ->
      """SELECT * FROM orders
        |WHERE o_custkey <= (SELECT CAST(max(o_custkey) AS BIGINT) // 2 FROM orders)
        |  AND o_totalprice < 50000.0""".stripMargin,
    "q49_window_suite" ->
      """SELECT o_orderkey, o_custkey, o_totalprice,
        |       CAST(rank() OVER w AS INT) AS rnk,
        |       CAST(dense_rank() OVER w AS INT) AS drnk,
        |       CAST(ntile(4) OVER w AS INT) AS quartile,
        |       lag(o_totalprice, 1) OVER w AS prev_price,
        |       lead(o_totalprice, 1) OVER w AS next_price,
        |       CAST(sum(CAST(o_totalprice AS DECIMAL(18,2)))
        |            OVER (PARTITION BY o_custkey
        |                  ORDER BY o_totalprice DESC, o_orderkey
        |                  ROWS UNBOUNDED PRECEDING) AS DOUBLE) AS running_spend
        |FROM orders
        |WINDOW w AS (PARTITION BY o_custkey ORDER BY o_totalprice DESC, o_orderkey)
        |QUALIFY rnk <= 5""".stripMargin,
    "q50_segment_cube" ->
      """SELECT c.c_mktsegment AS segment, o.o_orderpriority AS priority,
        |       count(*) AS order_count,
        |       CAST(sum(CAST(o.o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS revenue
        |FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
        |GROUP BY CUBE (segment, priority)""".stripMargin,
    "q51_set_ops" ->
      """SELECT 'both' AS tag, o_custkey FROM (
        |  SELECT o_custkey FROM orders WHERE o_orderstatus = 'F'
        |  INTERSECT
        |  SELECT o_custkey FROM orders WHERE o_orderstatus = 'O')
        |UNION ALL
        |SELECT 'f_only', o_custkey FROM (
        |  SELECT o_custkey FROM orders WHERE o_orderstatus = 'F'
        |  EXCEPT
        |  SELECT o_custkey FROM orders WHERE o_orderstatus = 'O')""".stripMargin,
    "q52_string_funcs" ->
      """SELECT c_custkey,
        |       upper(c_name) AS name_upper,
        |       lower(c_mktsegment) AS segment_lower,
        |       substring(c_name, 1, 8) AS name_prefix,
        |       lpad(CAST(c_custkey AS VARCHAR), 10, '0') AS key_padded,
        |       reverse(c_name) AS name_rev,
        |       regexp_replace(c_name, '#', '-', 'g') AS name_dashed,
        |       CAST(levenshtein(c_mktsegment, 'BUILDING') AS INT) AS seg_dist,
        |       CAST(length(c_name) AS BIGINT) AS name_len
        |FROM customer""".stripMargin,
    "q53_percentiles" ->
      """SELECT o_orderstatus AS status,
        |       quantile_cont(o_totalprice, 0.25) AS p25,
        |       quantile_cont(o_totalprice, 0.5) AS p50,
        |       quantile_cont(o_totalprice, 0.9) AS p90,
        |       min(o_totalprice) AS lo,
        |       max(o_totalprice) AS hi
        |FROM orders GROUP BY 1""".stripMargin,
    "q54_datetime_suite" ->
      """SELECT event_id,
        |       CAST(year(ts) AS INT) AS y,
        |       CAST(month(ts) AS INT) AS mo,
        |       CAST(day(ts) AS INT) AS d,
        |       CAST(hour(ts) AS INT) AS h,
        |       CAST(minute(ts) AS INT) AS mi,
        |       CAST(quarter(ts) AS INT) AS q,
        |       CAST(weekofyear(ts) AS INT) AS iso_week,
        |       dayname(ts) AS weekday_name,
        |       CAST(ts AS DATE) + 30 AS plus_30d,
        |       last_day(CAST(ts AS DATE)) AS month_end,
        |       CAST(datediff('day', CAST(ts AS DATE), DATE '1998-01-01') AS INT) AS days_to_1998
        |FROM events""".stripMargin,
    "q55_outer_join_audit" ->
      """SELECT coalesce(c.c_custkey, o.o_custkey) AS cust,
        |       o.o_orderkey AS orderkey,
        |       CASE WHEN o.o_orderkey IS NULL THEN 'customer_only'
        |            WHEN c.c_custkey IS NULL THEN 'order_only'
        |            ELSE 'matched' END AS tag
        |FROM (SELECT c_custkey FROM customer) c
        |FULL JOIN (SELECT o_orderkey, o_custkey FROM orders) o
        |  ON c.c_custkey = o.o_custkey""".stripMargin,
    "q56_semi_anti" ->
      """SELECT 'has_orders' AS tag, c_custkey FROM customer
        |WHERE c_custkey IN (SELECT o_custkey FROM orders)
        |UNION ALL
        |SELECT 'no_orders', c_custkey FROM customer
        |WHERE c_custkey NOT IN (SELECT o_custkey FROM orders)""".stripMargin,
    "q57_repetition_signals" ->
      """WITH t AS (
        |  SELECT doc_id, regexp_split_to_array(trim(text), '\s+') AS toks
        |  FROM documents
        |), g AS (
        |  SELECT doc_id, toks,
        |    list_transform(generate_series(1, len(toks) - 1),
        |                   i -> toks[i] || ' ' || toks[i + 1]) AS grams
        |  FROM t
        |)
        |SELECT doc_id,
        |  1.0 - CAST(len(list_distinct(toks)) AS DOUBLE)
        |    / greatest(len(toks), 1) AS dup_token_ratio,
        |  coalesce(
        |    CAST(list_max(list_transform(list_distinct(grams),
        |           x -> len(list_filter(grams, y -> y = x)))) AS DOUBLE)
        |      / greatest(len(grams), 1), 0.0) AS top_2gram_fraction
        |FROM g""".stripMargin,
    "q62_event_pivot" ->
      """SELECT user_id,
        |  count(CASE WHEN event_type = 'click' THEN 1 END) AS click,
        |  count(CASE WHEN event_type = 'view' THEN 1 END) AS view,
        |  count(CASE WHEN event_type = 'purchase' THEN 1 END) AS purchase,
        |  count(CASE WHEN event_type = 'signup' THEN 1 END) AS signup,
        |  count(CASE WHEN event_type = 'error' THEN 1 END) AS error
        |FROM events GROUP BY user_id""".stripMargin,
    "q63_order_unpivot" ->
      """WITH a AS (
        |  SELECT o_orderstatus,
        |    CAST(count(*) AS DOUBLE) AS order_count,
        |    CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total_price
        |  FROM orders GROUP BY o_orderstatus
        |)
        |SELECT o_orderstatus, 'order_count' AS measure, order_count AS value FROM a
        |UNION ALL
        |SELECT o_orderstatus, 'total_price' AS measure, total_price AS value FROM a""".stripMargin,
    "q68_salted_distinct" ->
      """SELECT event_type, count(DISTINCT user_id) AS distinct_users
        |FROM events GROUP BY event_type""".stripMargin,
    "q65_pack_payloads" ->
      """WITH t AS (
        |  SELECT doc_id, source, text,
        |    CAST(len(regexp_split_to_array(trim(text), '\s+')) AS BIGINT) AS token_count
        |  FROM documents
        |), p AS (
        |  SELECT doc_id, source, token_count, text,
        |    CAST(floor((SUM(token_count) OVER (PARTITION BY source ORDER BY doc_id
        |                  ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
        |                - token_count) / 512.0) AS BIGINT) AS bin_id
        |  FROM t
        |)
        |SELECT source, bin_id,
        |  CAST(SUM(token_count) AS BIGINT) AS bin_tokens,
        |  count(*) AS bin_docs,
        |  string_agg(text, ' ' ORDER BY doc_id) AS payload
        |FROM p GROUP BY source, bin_id""".stripMargin,
    "q66_decontaminate" -> DecontaminateOracleSql,
    // eval-side contamination: per-eval-doc shared-gram fraction vs the
    // train corpus; the flag is an integer cross-multiplication
    "q170_eval_contamination" ->
      """WITH toks AS (
        |  SELECT doc_id, regexp_split_to_array(trim(text), '\s+') AS t FROM documents),
        |sh AS (
        |  SELECT DISTINCT doc_id, array_to_string(t[i:i+7], ' ') AS g
        |  FROM (SELECT doc_id, t, unnest(generate_series(1, len(t) - 7)) AS i FROM toks)),
        |ev AS (SELECT doc_id AS eval_id, g FROM sh WHERE doc_id < 10),
        |tr AS (SELECT DISTINCT g FROM sh WHERE doc_id >= 10),
        |tot AS (SELECT eval_id, CAST(count(*) AS BIGINT) AS total_ngrams
        |        FROM ev GROUP BY 1),
        |shr AS (SELECT eval_id, CAST(count(*) AS BIGINT) AS shared_ngrams
        |        FROM ev JOIN tr USING (g) GROUP BY 1)
        |SELECT t.eval_id, t.total_ngrams,
        |  coalesce(s.shared_ngrams, CAST(0 AS BIGINT)) AS shared_ngrams,
        |  CAST(coalesce(s.shared_ngrams, 0) AS DOUBLE) / t.total_ngrams
        |    AS contamination,
        |  coalesce(s.shared_ngrams, 0) * 5 >= t.total_ngrams AS contaminated
        |FROM tot t LEFT JOIN shr s USING (eval_id)""".stripMargin,
    // bloom prefilter changes the scale shape, not the result — exact
    // verification removes false positives, so the q66 oracle grades it
    "q76_decontaminate_bloom" -> DecontaminateOracleSql,
    "q59_hash_split" ->
      """WITH h AS (
        |  SELECT doc_id,
        |    CAST(list_sum(list_transform(range(8),
        |      i -> (strpos('0123456789abcdef',
        |              substring(md5(CAST(doc_id AS VARCHAR)), CAST(i + 1 AS INT), 1)) - 1)
        |           * pow(16, 7 - i))) AS BIGINT) % 1000 AS bucket
        |  FROM documents
        |)
        |SELECT doc_id, bucket,
        |  CASE WHEN bucket < 900 THEN 'train'
        |       WHEN bucket < 950 THEN 'val'
        |       ELSE 'test' END AS split
        |FROM h""".stripMargin,
    "q60_quota_sample" ->
      """WITH h AS (
        |  SELECT source, doc_id,
        |    CAST(list_sum(list_transform(range(8),
        |      i -> (strpos('0123456789abcdef',
        |              substring(md5(CAST(doc_id AS VARCHAR)), CAST(i + 1 AS INT), 1)) - 1)
        |           * pow(16, 7 - i))) AS BIGINT) AS hv
        |  FROM documents
        |), r AS (
        |  SELECT source, doc_id,
        |    row_number() OVER (PARTITION BY source
        |                       ORDER BY hv DESC, doc_id DESC) AS rn
        |  FROM h
        |)
        |SELECT source, doc_id FROM r WHERE rn <= 5""".stripMargin,
    "q61_pack_sequences" ->
      """WITH t AS (
        |  SELECT doc_id, source,
        |    CAST(len(regexp_split_to_array(trim(text), '\s+')) AS BIGINT) AS token_count
        |  FROM documents
        |)
        |SELECT doc_id, source, token_count,
        |  CAST(floor((SUM(token_count) OVER (PARTITION BY source ORDER BY doc_id
        |                ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
        |              - token_count) / 512.0) AS BIGINT) AS bin_id
        |FROM t""".stripMargin,
    // weighted source mixing: same md5-prefix hash order as q60, same
    // running-sum budget arithmetic as q61 — both already hash-proven
    "q75_source_mix" ->
      """WITH t AS (
        |  SELECT source, doc_id,
        |    CAST(len(regexp_split_to_array(trim(text), '\s+')) AS BIGINT) AS token_count,
        |    CAST(list_sum(list_transform(range(8),
        |      i -> (strpos('0123456789abcdef',
        |              substring(md5(CAST(doc_id AS VARCHAR)), CAST(i + 1 AS INT), 1)) - 1)
        |           * pow(16, 7 - i))) AS BIGINT) AS hv,
        |    CAST(CAST(substring(source, 4) AS INT) % 4 + 1 AS BIGINT) AS weight
        |  FROM documents
        |), c AS (
        |  SELECT source, doc_id, token_count, weight,
        |    SUM(token_count) OVER (PARTITION BY source ORDER BY hv DESC, doc_id DESC
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum
        |  FROM t
        |)
        |SELECT source, doc_id, weight, token_count FROM c
        |WHERE cum - token_count < weight * 400""".stripMargin,
    "q58_text_scrub" ->
      """WITH s AS (
        |  SELECT doc_id,
        |    trim(regexp_replace(regexp_replace(regexp_replace(text,
        |      'https?://\S+|www\.\S+', '<URL>', 'g'),
        |      '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}', '<EMAIL>', 'g'),
        |      '\s+', ' ', 'g')) AS clean_text
        |  FROM documents
        |)
        |SELECT doc_id, clean_text,
        |  CAST(length(clean_text) AS BIGINT) AS clean_chars
        |FROM s""".stripMargin,
    // Sketches are engine-specific in general, but at the gate corpus's
    // cardinalities both are in their EXACT regime — ~150 distinct users
    // per group vs 4096 HLL++ registers (linear counting returns the true
    // count), ~2k values per group vs the 10^4-sample quantile summary
    // (no compression, true dataset quantile) — so the exact DuckDB
    // phrasing matches value-for-value (verified at sf0.001/0.01/0.1).
    // A sketch regression (bad rsd/accuracy mapping, broken merge) now
    // fails the gate instead of passing rows-only.
    "q67_approx_stats" ->
      """SELECT event_type,
        |  CAST(count(DISTINCT user_id) AS BIGINT) AS approx_users,
        |  quantile_disc("value", 0.5) AS approx_median,
        |  quantile_disc("value", 0.95) AS approx_p95
        |FROM events GROUP BY event_type""".stripMargin,
    // Log-free BM25-style weight: every factor is an integer-derived
    // double and the expression tree mirrors the Spark side exactly, so
    // the division chain is IEEE-deterministic across engines.
    "q69_tfidf_topterms" ->
      """WITH terms AS (
        |  SELECT doc_id, unnest(regexp_split_to_array(trim(text), '\s+')) AS term
        |  FROM documents WHERE trim(text) <> ''
        |), tf AS (
        |  SELECT doc_id, term, CAST(count(*) AS BIGINT) AS tf
        |  FROM terms WHERE term <> '' GROUP BY doc_id, term
        |), df AS (
        |  SELECT term, CAST(count(*) AS BIGINT) AS df FROM tf GROUP BY term
        |), n AS (SELECT CAST(count(*) AS BIGINT) AS n_docs FROM documents),
        |scored AS (
        |  SELECT tf.doc_id, tf.term, tf.tf, df.df,
        |    (tf.tf * (n.n_docs - df.df + 0.5)) / (df.df + 0.5) AS score
        |  FROM tf JOIN df USING (term) CROSS JOIN n
        |)
        |SELECT doc_id, term, tf, df, score FROM (
        |  SELECT *, row_number() OVER (
        |    PARTITION BY doc_id ORDER BY score DESC, term DESC) AS rank
        |  FROM scored)
        |WHERE rank <= 5""".stripMargin,
    // Composition of the q20/q41/q57 signal expressions (each individually
    // hash-proven) with mid-distribution thresholds; since both engines
    // compute each signal bit-identically, the comparisons agree too.
    "q71_corpus_filter" -> CorpusFilterOracleSql,
    // exact DECIMAL sums (order-independent), identical double derivation
    // tree on both engines; DuckDB ordinality is 1-based → i-1
    "q85_embedding_stats" ->
      """WITH ex AS (
        |  SELECT CAST(i - 1 AS INT) AS dim,
        |         CAST(floor(CAST(embedding[i] AS DOUBLE) * 1e9) AS BIGINT) AS fx,
        |         CAST(floor(CAST(embedding[i] AS DOUBLE) * CAST(embedding[i] AS DOUBLE) * 1e18) AS BIGINT) AS fxx
        |  FROM (SELECT embedding,
        |               unnest(generate_series(1, len(embedding))) AS i
        |        FROM embeddings))
        |SELECT dim, count(*) AS n,
        |       CAST(sum(fx) AS DOUBLE) / count(*) / 1e9 AS mean,
        |       CAST(sum(fxx) AS DOUBLE) / count(*) / 1e18
        |       - (CAST(sum(fx) AS DOUBLE) / count(*) / 1e9)
        |       * (CAST(sum(fx) AS DOUBLE) / count(*) / 1e9) AS variance
        |FROM ex GROUP BY 1""".stripMargin,
    // bigram companion of q70: BIGINT masses + single-division doubles
    "q84_bigram_lm" ->
      """WITH toks AS (
        |  SELECT doc_id, regexp_split_to_array(trim(text), '\s+') AS t FROM documents),
        |bg AS (
        |  SELECT doc_id, t[i] AS w1, t[i] || ' ' || t[i+1] AS b
        |  FROM (SELECT doc_id, t, unnest(generate_series(1, len(t) - 1)) AS i FROM toks)),
        |freq AS (SELECT b, CAST(count(*) AS BIGINT) AS cnt FROM bg GROUP BY b),
        |terms AS (
        |  SELECT unnest(regexp_split_to_array(trim(text), '\s+')) AS term
        |  FROM documents WHERE trim(text) <> ''),
        |ctx AS (SELECT term, CAST(count(*) AS BIGINT) AS ctx_cnt
        |        FROM terms WHERE term <> '' GROUP BY term)
        |SELECT bg.doc_id,
        |  CAST(count(*) AS BIGINT) AS n_bigrams,
        |  CAST(sum(freq.cnt) AS BIGINT) AS bigram_mass,
        |  CAST(sum(ctx.ctx_cnt) AS BIGINT) AS context_mass,
        |  CAST(sum(freq.cnt) AS BIGINT) / CAST(CAST(sum(ctx.ctx_cnt) AS BIGINT) AS DOUBLE)
        |    AS transition_score,
        |  CAST(min(freq.cnt) AS DOUBLE) / count(*) AS rarest_ratio
        |FROM bg JOIN freq USING (b) JOIN ctx ON bg.w1 = ctx.term
        |GROUP BY bg.doc_id""".stripMargin,
    // Exact integer frequency mass per doc; probabilities derived by the
    // same division chain as the Spark side (no float SUM, no log).
    "q70_unigram_lm" ->
      """WITH terms AS (
        |  SELECT doc_id, unnest(regexp_split_to_array(trim(text), '\s+')) AS term
        |  FROM documents WHERE trim(text) <> ''
        |), t AS (SELECT doc_id, term FROM terms WHERE term <> ''),
        |freq AS (SELECT term, CAST(count(*) AS BIGINT) AS cnt FROM t GROUP BY term),
        |total AS (SELECT CAST(count(*) AS BIGINT) AS total_tokens FROM t)
        |SELECT t.doc_id,
        |  CAST(count(*) AS BIGINT) AS n_tokens,
        |  CAST(sum(freq.cnt) AS BIGINT) AS freq_mass,
        |  CAST(sum(freq.cnt) AS BIGINT) / CAST(total.total_tokens AS DOUBLE)
        |    / count(*) AS avg_token_prob,
        |  CAST(min(freq.cnt) AS DOUBLE) / total.total_tokens AS min_token_prob
        |FROM t JOIN freq USING (term) CROSS JOIN total
        |GROUP BY t.doc_id, total.total_tokens""".stripMargin,

    // substring-level (positional) dedup: global 8-token-window occurrence
    // counts joined back to the window sites, profiled per document
    "q109_substring_stats" ->
      """WITH toks AS (
        |  SELECT doc_id, regexp_split_to_array(trim(text), '\s+') AS t FROM documents),
        |win AS (
        |  SELECT doc_id, i, array_to_string(t[i:i+7], ' ') AS w
        |  FROM (SELECT doc_id, t, unnest(generate_series(1, len(t) - 7)) AS i FROM toks)),
        |cnt AS (SELECT w, count(*) AS c FROM win GROUP BY w),
        |per AS (
        |  SELECT win.doc_id,
        |         CAST(count(*) AS BIGINT) AS n_windows,
        |         CAST(sum(CASE WHEN cnt.c >= 2 THEN 1 ELSE 0 END) AS BIGINT) AS dup_windows
        |  FROM win JOIN cnt USING (w) GROUP BY win.doc_id)
        |SELECT d.doc_id,
        |       coalesce(per.n_windows, CAST(0 AS BIGINT)) AS n_windows,
        |       coalesce(per.dup_windows, CAST(0 AS BIGINT)) AS dup_windows,
        |       CASE WHEN coalesce(per.n_windows, 0) = 0 THEN 0.0
        |            ELSE CAST(per.dup_windows AS DOUBLE) / per.n_windows END AS dup_frac
        |FROM documents d LEFT JOIN per USING (doc_id)""".stripMargin,

    // duplicated-SPAN removal: first site per window wins (min over
    // (doc_id, position)), every other site's [i, i+7] token span is
    // spliced out, text rebuilt from the surviving positions
    "q110_substring_scrub" ->
      """WITH toks AS (
        |  SELECT doc_id, regexp_split_to_array(trim(text), '\s+') AS t FROM documents),
        |tokpos AS (
        |  SELECT doc_id, i AS p, t[i] AS tok
        |  FROM (SELECT doc_id, t, unnest(generate_series(1, len(t))) AS i FROM toks)),
        |win AS (
        |  SELECT doc_id, i, array_to_string(t[i:i+7], ' ') AS w
        |  FROM (SELECT doc_id, t, unnest(generate_series(1, len(t) - 7)) AS i FROM toks)),
        |ranked AS (
        |  SELECT doc_id, i,
        |         count(*) OVER (PARTITION BY w) AS c,
        |         row_number() OVER (PARTITION BY w ORDER BY doc_id, i) AS rn
        |  FROM win),
        |cover AS (
        |  SELECT DISTINCT doc_id, unnest(generate_series(i, i + 7)) AS p
        |  FROM ranked WHERE c >= 2 AND rn > 1),
        |kept AS (
        |  SELECT tp.doc_id, tp.p, tp.tok FROM tokpos tp
        |  WHERE NOT EXISTS (
        |    SELECT 1 FROM cover c WHERE c.doc_id = tp.doc_id AND c.p = tp.p)),
        |agg AS (
        |  SELECT doc_id, CAST(count(*) AS BIGINT) AS kept_tokens,
        |         string_agg(tok, ' ' ORDER BY p) AS cleaned_text
        |  FROM kept GROUP BY doc_id)
        |SELECT t.doc_id, CAST(len(t.t) AS BIGINT) AS n_tokens,
        |       coalesce(a.kept_tokens, CAST(0 AS BIGINT)) AS kept_tokens,
        |       coalesce(a.cleaned_text, '') AS cleaned_text
        |FROM toks t LEFT JOIN agg a USING (doc_id)""".stripMargin,

    // deterministic seeded shuffle: md5 permutation key, first-nibble
    // shard, within-shard order — engine-independent by construction
    "q112_corpus_shuffle" ->
      """WITH k AS (
        |  SELECT doc_id,
        |         md5('graft-shuffle-v1:' || CAST(doc_id AS VARCHAR)) AS skey
        |  FROM documents)
        |SELECT doc_id, skey,
        |       CAST(strpos('0123456789abcdef', substr(skey, 1, 1)) - 1 AS INT) AS shard,
        |       CAST(row_number() OVER (
        |         PARTITION BY substr(skey, 1, 1) ORDER BY skey, doc_id) AS BIGINT) AS shard_pos
        |FROM k""".stripMargin,

    // BM25: log-free idf, dl/avgdl expanded to dl·N/total_tokens, per-term
    // contributions folded in fixed slot order — the whole score is one
    // deterministic IEEE expression tree mirrored on both sides. Every
    // numeric literal is CAST to DOUBLE: a bare 0.5 is DECIMAL in DuckDB
    // (decimal-exact intermediates round differently at the last ulp than
    // Spark's double literals — measured 8/20 one-ulp drift without casts)
    "q114_bm25_retrieval" ->
      """WITH toks AS (
        |  SELECT doc_id, unnest(regexp_split_to_array(trim(text), '\s+')) AS term
        |  FROM documents WHERE trim(text) <> ''
        |), t AS (SELECT doc_id, term FROM toks WHERE term <> ''),
        |dl AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS dl FROM t GROUP BY doc_id),
        |tf AS (
        |  SELECT doc_id, term, CAST(count(*) AS BIGINT) AS tf FROM t
        |  WHERE term IN ('join', 'vector', 'customer') GROUP BY doc_id, term),
        |df AS (SELECT term, CAST(count(*) AS BIGINT) AS df FROM tf GROUP BY term),
        |n AS (SELECT CAST(count(*) AS BIGINT) AS n_docs FROM documents),
        |tot AS (SELECT CAST(count(*) AS BIGINT) AS total_tokens FROM t),
        |s AS (
        |  SELECT tf.doc_id, dl.dl, tf.term,
        |    ((n.n_docs - df.df + CAST(0.5 AS DOUBLE)) / (df.df + CAST(0.5 AS DOUBLE)))
        |      * ((tf.tf * CAST(2.2 AS DOUBLE))
        |         / (tf.tf + CAST(1.2 AS DOUBLE) * (CAST(0.25 AS DOUBLE)
        |            + ((CAST(0.75 AS DOUBLE) * dl.dl) * n.n_docs) / tot.total_tokens))) AS s
        |  FROM tf JOIN df USING (term) JOIN dl USING (doc_id)
        |  CROSS JOIN n CROSS JOIN tot)
        |SELECT doc_id, dl,
        |  coalesce(max(CASE WHEN term = 'join' THEN s END), 0.0)
        |  + coalesce(max(CASE WHEN term = 'vector' THEN s END), 0.0)
        |  + coalesce(max(CASE WHEN term = 'customer' THEN s END), 0.0) AS score
        |FROM s GROUP BY doc_id, dl
        |ORDER BY score DESC, doc_id
        |LIMIT 20""".stripMargin,

    // RRF hybrid (q145): the q114 BM25 leg and the q28 dense-cosine leg,
    // each cut to its top-50 under a total order (score DESC, doc_id) and
    // ranked; rrf = 1/(60+rank) summed sparse-then-dense. Ranks are
    // integers, each term one IEEE divide, the fuse a fixed-order two-term
    // sum — bit-identical across engines by the same argument as the legs.
    "q145_hybrid_retrieval" ->
      """WITH toks AS (
        |  SELECT doc_id, unnest(regexp_split_to_array(trim(text), '\s+')) AS term
        |  FROM documents WHERE trim(text) <> ''
        |), t AS (SELECT doc_id, term FROM toks WHERE term <> ''),
        |dl AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS dl FROM t GROUP BY doc_id),
        |tf AS (
        |  SELECT doc_id, term, CAST(count(*) AS BIGINT) AS tf FROM t
        |  WHERE term IN ('join', 'vector', 'customer') GROUP BY doc_id, term),
        |df AS (SELECT term, CAST(count(*) AS BIGINT) AS df FROM tf GROUP BY term),
        |n AS (SELECT CAST(count(*) AS BIGINT) AS n_docs FROM documents),
        |tot AS (SELECT CAST(count(*) AS BIGINT) AS total_tokens FROM t),
        |s AS (
        |  SELECT tf.doc_id, dl.dl, tf.term,
        |    ((n.n_docs - df.df + CAST(0.5 AS DOUBLE)) / (df.df + CAST(0.5 AS DOUBLE)))
        |      * ((tf.tf * CAST(2.2 AS DOUBLE))
        |         / (tf.tf + CAST(1.2 AS DOUBLE) * (CAST(0.25 AS DOUBLE)
        |            + ((CAST(0.75 AS DOUBLE) * dl.dl) * n.n_docs) / tot.total_tokens))) AS s
        |  FROM tf JOIN df USING (term) JOIN dl USING (doc_id)
        |  CROSS JOIN n CROSS JOIN tot),
        |bm AS (
        |  SELECT doc_id,
        |    coalesce(max(CASE WHEN term = 'join' THEN s END), 0.0)
        |    + coalesce(max(CASE WHEN term = 'vector' THEN s END), 0.0)
        |    + coalesce(max(CASE WHEN term = 'customer' THEN s END), 0.0) AS score
        |  FROM s GROUP BY doc_id),
        |sparse AS (
        |  SELECT doc_id,
        |    CAST(row_number() OVER (ORDER BY score DESC, doc_id) AS INT) AS sparse_rank
        |  FROM (SELECT doc_id, score FROM bm ORDER BY score DESC, doc_id LIMIT 50)),
        |dense0 AS (
        |  SELECT e.vec_id AS doc_id,
        |    list_inner_product(CAST(e.embedding AS DOUBLE[]), CAST(q.embedding AS DOUBLE[]))
        |    / (sqrt(list_inner_product(CAST(e.embedding AS DOUBLE[]), CAST(e.embedding AS DOUBLE[])))
        |     * sqrt(list_inner_product(CAST(q.embedding AS DOUBLE[]), CAST(q.embedding AS DOUBLE[])))) AS score
        |  FROM embeddings e, (SELECT embedding FROM embeddings WHERE vec_id = 0) q
        |  WHERE e.vec_id <> 0
        |  ORDER BY score DESC, e.vec_id LIMIT 50),
        |dense AS (
        |  SELECT doc_id,
        |    CAST(row_number() OVER (ORDER BY score DESC, doc_id) AS INT) AS dense_rank
        |  FROM dense0)
        |SELECT doc_id, sparse_rank, dense_rank,
        |  coalesce(CAST(1 AS DOUBLE) / (60 + sparse_rank), CAST(0 AS DOUBLE))
        |  + coalesce(CAST(1 AS DOUBLE) / (60 + dense_rank), CAST(0 AS DOUBLE)) AS rrf_score
        |FROM sparse FULL JOIN dense USING (doc_id)
        |ORDER BY rrf_score DESC, doc_id LIMIT 20""".stripMargin,

    // source containment matrix (q146): distinct (source, 3-gram) pairs,
    // pairwise shared counts, jaccard + containment. Every count is an
    // exact BIGINT; each ratio is one IEEE divide of integer-valued
    // operands — bit-identical across engines.
    "q146_source_overlap" ->
      """WITH toks AS (
        |  SELECT source, regexp_split_to_array(trim(text), '\s+') AS t FROM documents),
        |sh AS (
        |  SELECT DISTINCT source, array_to_string(t[i:i+2], ' ') AS shingle
        |  FROM (SELECT source, t, unnest(generate_series(1, len(t) - 2)) AS i FROM toks)),
        |sz AS (SELECT source, CAST(count(*) AS BIGINT) AS sz FROM sh GROUP BY 1),
        |shared AS (
        |  SELECT a.source AS src_a, b.source AS src_b, CAST(count(*) AS BIGINT) AS shared
        |  FROM sh a JOIN sh b USING (shingle)
        |  WHERE a.source < b.source
        |  GROUP BY 1, 2)
        |SELECT src_a, src_b, sa.sz AS sz_a, sb.sz AS sz_b, shared,
        |  CAST(shared AS DOUBLE) / (sa.sz + sb.sz - shared) AS jaccard,
        |  CAST(shared AS DOUBLE) / least(sa.sz, sb.sz) AS containment
        |FROM shared
        |JOIN sz sa ON sa.source = src_a
        |JOIN sz sb ON sb.source = src_b""".stripMargin,

    // n-gram novelty (q147): first carrier of each distinct 3-gram under
    // the md5 content-hash order (same 32-bit spelling as q59); Spark's
    // min(struct(h, doc_id)) is exactly ORDER BY h, doc_id LIMIT 1 per
    // gram. Ratio is one IEEE divide of BIGINTs.
    "q147_ngram_novelty" ->
      """WITH toks AS (
        |  SELECT doc_id, regexp_split_to_array(trim(text), '\s+') AS t FROM documents),
        |sh AS (
        |  SELECT DISTINCT doc_id, array_to_string(t[i:i+2], ' ') AS shingle
        |  FROM (SELECT doc_id, t, unnest(generate_series(1, len(t) - 2)) AS i FROM toks)),
        |h AS (
        |  SELECT doc_id,
        |    CAST(list_sum(list_transform(range(8),
        |      i -> (strpos('0123456789abcdef',
        |              substring(md5(CAST(doc_id AS VARCHAR)), CAST(i + 1 AS INT), 1)) - 1)
        |           * pow(16, 7 - i))) AS BIGINT) AS h
        |  FROM (SELECT DISTINCT doc_id FROM sh)),
        |w AS (
        |  SELECT sh.doc_id, sh.shingle,
        |    row_number() OVER (PARTITION BY sh.shingle ORDER BY h.h, sh.doc_id) AS rn
        |  FROM sh JOIN h USING (doc_id)),
        |novel AS (
        |  SELECT doc_id, CAST(count(*) AS BIGINT) AS novel FROM w WHERE rn = 1 GROUP BY 1),
        |dsz AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS distinct_shingles FROM sh GROUP BY 1)
        |SELECT d.doc_id, coalesce(n.novel, CAST(0 AS BIGINT)) AS novel,
        |  d.distinct_shingles,
        |  CAST(coalesce(n.novel, 0) AS DOUBLE) / d.distinct_shingles AS novelty_ratio
        |FROM dsz d LEFT JOIN novel n USING (doc_id)""".stripMargin,

    // MMR diversified rerank (q148): the same greedy the Spark side runs,
    // replayed as a WITH RECURSIVE — each iteration's working table is the
    // single row just picked (carrying the chosen ids + embeddings as
    // lists), and ORDER BY mmr_score DESC, doc_id LIMIT 1 is the argmax
    // with the same tiebreak. Every cosine is the q28 sequential-fold
    // spelling; λ=0.7 and 0.3 are LITERALS on both sides (1.0 − 0.7 is a
    // DIFFERENT double than 0.3); max over ≤9 sims is order-free.
    "q148_mmr_rerank" ->
      """WITH RECURSIVE cand AS (
        |  SELECT e.vec_id AS doc_id, CAST(e.embedding AS DOUBLE[]) AS emb,
        |    list_inner_product(CAST(e.embedding AS DOUBLE[]), CAST(q.embedding AS DOUBLE[]))
        |    / (sqrt(list_inner_product(CAST(e.embedding AS DOUBLE[]), CAST(e.embedding AS DOUBLE[])))
        |     * sqrt(list_inner_product(CAST(q.embedding AS DOUBLE[]), CAST(q.embedding AS DOUBLE[])))) AS rel
        |  FROM embeddings e, (SELECT embedding FROM embeddings WHERE vec_id = 0) q
        |  WHERE e.vec_id <> 0
        |  ORDER BY rel DESC, e.vec_id LIMIT 50
        |), sel AS (
        |  (SELECT CAST(1 AS INT) AS mmr_rank, doc_id, rel, rel AS mmr_score,
        |          [doc_id] AS chosen_ids, [emb] AS chosen_embs
        |   FROM cand ORDER BY rel DESC, doc_id LIMIT 1)
        |  UNION ALL
        |  (SELECT CAST(s.mmr_rank + 1 AS INT), c.doc_id, c.rel,
        |     CAST(0.7 AS DOUBLE) * c.rel - CAST(0.3 AS DOUBLE)
        |       * list_max(list_transform(s.chosen_embs,
        |           e -> list_inner_product(e, c.emb)
        |                / (sqrt(list_inner_product(e, e))
        |                 * sqrt(list_inner_product(c.emb, c.emb))))) AS mmr_score,
        |     list_append(s.chosen_ids, c.doc_id), list_append(s.chosen_embs, c.emb)
        |   FROM sel s JOIN cand c ON NOT list_contains(s.chosen_ids, c.doc_id)
        |   WHERE s.mmr_rank < 10
        |   ORDER BY mmr_score DESC, c.doc_id LIMIT 1)
        |)
        |SELECT mmr_rank, doc_id, rel, mmr_score FROM sel""".stripMargin,

    // embedding covariance (q149): cross moments in 1e-12 fixed point
    // (floor once per row-pair-product, exact integer sums — the q85
    // device lifted to the d² cross terms), centered with the 1e-9
    // first moments; every double derivation is the same expression
    // tree on both engines. 1e-12 (not finer) keeps the sums < 2^53 so
    // the int128→double cast is exact on both engines (DuckDB's
    // HUGEINT→DOUBLE double-rounds above that).
    "q149_embedding_cov" ->
      """WITH ex AS (
        |  SELECT vec_id, CAST(i - 1 AS INT) AS di, CAST(embedding[i] AS DOUBLE) AS x
        |  FROM (SELECT vec_id, embedding,
        |          unnest(generate_series(1, len(embedding))) AS i FROM embeddings)),
        |m AS (
        |  SELECT di, count(*) AS mn,
        |         sum(CAST(floor(x * 1e9) AS BIGINT)) AS sx
        |  FROM ex GROUP BY 1),
        |p AS (
        |  SELECT a.di AS i, b.di AS j, count(*) AS n,
        |         sum(CAST(floor(a.x * b.x * 1e12) AS HUGEINT)) AS sxy
        |  FROM ex a JOIN ex b USING (vec_id) GROUP BY 1, 2)
        |SELECT p.i, p.j, p.n,
        |  CAST(p.sxy AS DOUBLE) / 1e12 / p.n
        |    - (CAST(ma.sx AS DOUBLE) / ma.mn / 1e9)
        |    * (CAST(mb.sx AS DOUBLE) / mb.mn / 1e9) AS cov
        |FROM p JOIN m ma ON ma.di = p.i JOIN m mb ON mb.di = p.j""".stripMargin,

    // soft dedup (q150): per-source effective budgets under 1/cluster_size
    // weights over the q73 closure; weights in 1e-9 fixed point so every
    // sum is exact integer arithmetic on both engines. Token counts are
    // the q20 whitespace spelling.
    "q150_soft_dedup" ->
      s"""WITH cl AS (
         |$DupClustersOracleSql
         |), tok AS (
         |  SELECT doc_id, source,
         |    CAST(len(regexp_split_to_array(trim(text), '\\s+')) AS BIGINT) AS tc
         |  FROM documents),
         |wt AS (
         |  SELECT t.source, t.tc,
         |    CAST(floor(1e9 / c.cluster_size) AS BIGINT) AS w
         |  FROM tok t JOIN cl c ON t.doc_id = c.doc_id)
         |SELECT source,
         |  count(*) AS n_docs,
         |  CAST(sum(tc) AS BIGINT) AS n_tokens,
         |  CAST(CAST(sum(w) AS BIGINT) AS DOUBLE) / 1e9 AS eff_docs,
         |  CAST(CAST(sum(w * tc) AS BIGINT) AS DOUBLE) / 1e9 AS eff_tokens
         |FROM wt GROUP BY source""".stripMargin,

    // vocab coverage (q151): unique (cnt DESC, token) ordering makes the
    // running sum frame-identical on both engines; cum/total is
    // exact-integer-into-double division.
    "q151_vocab_coverage" ->
      """WITH tk AS (
        |  SELECT unnest(regexp_split_to_array(trim(text), '\s+')) AS token
        |  FROM documents WHERE trim(text) <> ''),
        |c AS (SELECT token, count(*) AS cnt FROM tk WHERE token <> '' GROUP BY 1),
        |tot AS (SELECT CAST(sum(cnt) AS BIGINT) AS total FROM c),
        |top AS (
        |  SELECT token, cnt,
        |    CAST(row_number() OVER (ORDER BY cnt DESC, token) AS INT) AS rank,
        |    CAST(sum(cnt) OVER (ORDER BY cnt DESC, token
        |         ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cum
        |  FROM c QUALIFY rank <= 100)
        |SELECT rank, token, cnt, CAST(cum AS DOUBLE) / total AS cum_frac
        |FROM top, tot""".stripMargin,

    // dedup pipeline funnel (q152): the q23 → q110 → q73 → q71 chain as
    // one CTE cascade, each stage reading the previous stage's survivors
    // (the scrub feeds the clustering its CLEANED text — the stage
    // interaction the per-operator oracles can't see). Counts are exact
    // integers on both engines.
    "q152_dedup_funnel" ->
      """WITH RECURSIVE
        |d1 AS (
        |  SELECT d.doc_id, d.text FROM documents d
        |  JOIN (SELECT min(doc_id) AS doc_id FROM documents GROUP BY md5(text)) k
        |    ON d.doc_id = k.doc_id),
        |toks AS (SELECT doc_id, regexp_split_to_array(trim(text), '\s+') AS t FROM d1),
        |win AS (
        |  SELECT doc_id, i, array_to_string(t[i:i+7], ' ') AS w
        |  FROM (SELECT doc_id, t, unnest(generate_series(1, len(t) - 7)) AS i FROM toks)),
        |ranked AS (
        |  SELECT doc_id, i,
        |         count(*) OVER (PARTITION BY w) AS c,
        |         row_number() OVER (PARTITION BY w ORDER BY doc_id, i) AS rn
        |  FROM win),
        |cover AS (
        |  SELECT DISTINCT doc_id, unnest(generate_series(i, i + 7)) AS p
        |  FROM ranked WHERE c >= 2 AND rn > 1),
        |tokpos AS (
        |  SELECT doc_id, i AS p, t[i] AS tok
        |  FROM (SELECT doc_id, t, unnest(generate_series(1, len(t))) AS i FROM toks)),
        |kept AS (
        |  SELECT tp.doc_id, tp.p, tp.tok FROM tokpos tp
        |  WHERE NOT EXISTS (
        |    SELECT 1 FROM cover c WHERE c.doc_id = tp.doc_id AND c.p = tp.p)),
        |d2 AS (
        |  SELECT doc_id, string_agg(tok, ' ' ORDER BY p) AS text
        |  FROM kept GROUP BY doc_id),
        |toks2 AS (SELECT doc_id, regexp_split_to_array(trim(text), '\s+') AS t FROM d2),
        |sh AS (
        |  SELECT DISTINCT doc_id, array_to_string(t[i:i+2], ' ') AS shingle
        |  FROM (SELECT doc_id, t, unnest(generate_series(1, len(t) - 2)) AS i FROM toks2)),
        |sz AS (SELECT doc_id, count(*) AS sz FROM sh GROUP BY 1),
        |common AS (
        |  SELECT a.doc_id AS a_id, b.doc_id AS b_id, count(*) AS c
        |  FROM sh a JOIN sh b USING (shingle)
        |  WHERE a.doc_id < b.doc_id GROUP BY 1, 2),
        |pairs AS (
        |  SELECT a_id, b_id FROM common
        |  JOIN sz sa ON sa.doc_id = a_id
        |  JOIN sz sb ON sb.doc_id = b_id
        |  WHERE CAST(c AS DOUBLE) / (sa.sz + sb.sz - c) >= 0.5),
        |edges AS (
        |  SELECT a_id AS src, b_id AS dst FROM pairs
        |  UNION ALL SELECT b_id, a_id FROM pairs),
        |reach(node, lbl) AS (
        |  SELECT CAST(doc_id AS BIGINT), CAST(doc_id AS BIGINT) FROM d2
        |  UNION
        |  SELECT e.dst, r.lbl FROM reach r JOIN edges e ON e.src = r.node),
        |cl AS (SELECT node AS doc_id, min(lbl) AS cluster_id FROM reach GROUP BY node),
        |d3 AS (
        |  SELECT d2.doc_id, d2.text FROM d2
        |  JOIN cl ON d2.doc_id = cl.doc_id
        |  WHERE cl.doc_id = cl.cluster_id),
        |b4 AS (
        |  SELECT doc_id,
        |    regexp_split_to_array(trim(text), '\s+') AS toks,
        |    CAST(len(regexp_split_to_array(trim(text), '\s+')) AS BIGINT) AS token_count,
        |    CAST(length(text) - length(regexp_replace(text, '[^A-Za-z0-9\s]', '', 'g')) AS DOUBLE)
        |      / greatest(length(text), 1) AS punct_ratio,
        |    CAST(len(list_filter(regexp_split_to_array(trim(text), '\s+'),
        |         x -> x IN ('the','a','an','and','of','to','in'))) AS DOUBLE)
        |      / greatest(len(regexp_split_to_array(trim(text), '\s+')), 1) AS stop_ratio
        |  FROM d3),
        |s4 AS (
        |  SELECT doc_id, token_count,
        |    (least(CAST(token_count AS DOUBLE) / 50.0, 1.0)
        |     + (1.0 - least(punct_ratio * 4.0, 1.0))
        |     + least(stop_ratio * 5.0, 1.0)) / 3.0 AS quality,
        |    1.0 - CAST(len(list_distinct(toks)) AS DOUBLE)
        |      / greatest(len(toks), 1) AS dup_token_ratio,
        |    coalesce(
        |      CAST(list_max(list_transform(
        |             list_distinct(list_transform(generate_series(1, len(toks) - 1),
        |               i -> toks[i] || ' ' || toks[i + 1])),
        |             x -> len(list_filter(list_transform(generate_series(1, len(toks) - 1),
        |               i -> toks[i] || ' ' || toks[i + 1]), y -> y = x)))) AS DOUBLE)
        |        / greatest(len(toks) - 1, 1), 0.0) AS top_2gram_fraction
        |  FROM b4),
        |d4 AS (
        |  SELECT doc_id FROM s4
        |  WHERE token_count >= 20 AND token_count <= 5000
        |    AND quality >= 0.5 AND dup_token_ratio <= 0.6
        |    AND top_2gram_fraction <= 0.2)
        |SELECT '1_exact' AS stage,
        |       (SELECT count(*) FROM documents) AS docs_in,
        |       (SELECT count(*) FROM d1) AS docs_out
        |UNION ALL SELECT '2_scrub',
        |       (SELECT count(*) FROM d1), (SELECT count(*) FROM d2)
        |UNION ALL SELECT '3_cluster',
        |       (SELECT count(*) FROM d2), (SELECT count(*) FROM d3)
        |UNION ALL SELECT '4_quality',
        |       (SELECT count(*) FROM d3), (SELECT count(*) FROM d4)""".stripMargin,

    // interdoc boilerplate scrub: NON-overlapping 8-token segments, a
    // segment in >= 2 DISTINCT docs is removed from all of them; rebuild
    // is an ordered string_agg, counts exact integers on both engines
    "q155_boilerplate_scrub" ->
      """WITH toks AS (
        |  SELECT doc_id, regexp_split_to_array(trim(text), '\s+') AS t FROM documents),
        |segs AS (
        |  SELECT doc_id, (i - 1) // 8 AS idx, array_to_string(t[i:i+7], ' ') AS seg
        |  FROM (SELECT doc_id, t, unnest(generate_series(1, len(t), 8)) AS i FROM toks
        |        WHERE len(t) > 0)),
        |boiler AS (
        |  SELECT seg FROM (
        |    SELECT seg, count(DISTINCT doc_id) AS df FROM segs GROUP BY seg)
        |  WHERE df >= 2),
        |kept AS (
        |  SELECT s.doc_id, s.idx, s.seg FROM segs s
        |  WHERE NOT EXISTS (SELECT 1 FROM boiler b WHERE b.seg = s.seg)),
        |agg AS (
        |  SELECT doc_id, CAST(count(*) AS BIGINT) AS kept_segments,
        |         string_agg(seg, ' ' ORDER BY idx) AS cleaned_text
        |  FROM kept GROUP BY doc_id)
        |SELECT t.doc_id, CAST((len(t.t) + 7) // 8 AS BIGINT) AS n_segments,
        |       coalesce(a.kept_segments, CAST(0 AS BIGINT)) AS kept_segments,
        |       coalesce(a.cleaned_text, '') AS cleaned_text
        |FROM toks t LEFT JOIN agg a USING (doc_id)""".stripMargin,

    // DSIR importance weights: fixed-point likelihood ratios (integer
    // floor division — exact on both engines), BIGINT score mass, ONE
    // final double division; top-quartile gate is an integer compare
    "q156_dsir_weights" ->
      """WITH terms AS (
        |  SELECT doc_id, lang, term FROM (
        |    SELECT doc_id, lang,
        |           unnest(regexp_split_to_array(trim(text), '\s+')) AS term
        |    FROM documents WHERE trim(text) <> '')
        |  WHERE term <> ''),
        |tgt AS (SELECT term, count(*) AS tgt_cnt FROM terms WHERE lang = 'en' GROUP BY term),
        |raw AS (SELECT term, count(*) AS raw_cnt FROM terms WHERE lang <> 'en' GROUP BY term),
        |vocab AS (SELECT DISTINCT term FROM terms),
        |ratio AS (
        |  SELECT v.term,
        |         CAST(((coalesce(t.tgt_cnt, 0) + 1) * 1000000)
        |              // (coalesce(r.raw_cnt, 0) + 1) AS BIGINT) AS r
        |  FROM vocab v LEFT JOIN tgt t USING (term) LEFT JOIN raw r USING (term)),
        |per AS (
        |  SELECT doc_id, CAST(count(*) AS BIGINT) AS n_tokens,
        |         CAST(sum(r.r) AS BIGINT) AS score
        |  FROM terms JOIN ratio r USING (term) GROUP BY doc_id),
        |scored AS (
        |  SELECT d.doc_id, d.lang,
        |         coalesce(p.n_tokens, CAST(0 AS BIGINT)) AS n_tokens,
        |         coalesce(p.score, CAST(0 AS BIGINT)) AS score,
        |         CASE WHEN coalesce(p.n_tokens, 0) = 0 THEN 0.0
        |              ELSE CAST(p.score AS DOUBLE) / (1000000 * p.n_tokens) END
        |           AS importance
        |  FROM documents d LEFT JOIN per p USING (doc_id)),
        |ranked AS (
        |  SELECT *, row_number() OVER (ORDER BY importance DESC, doc_id) AS rn,
        |         count(*) OVER () AS n_docs FROM scored)
        |SELECT doc_id, lang, n_tokens, score, importance,
        |       rn <= (n_docs + 3) // 4 AS selected
        |FROM ranked""".stripMargin,

    // kNN label purity: neighbor rank breaks cosine ties on vec_id, the
    // vote breaks count ties on the smaller label; cosines are the same
    // IEEE sequence on both engines (q28/q29 contract) so ranks agree
    "q157_knn_label_purity" ->
      """WITH pairs AS (
        |  SELECT a.vec_id AS a_id, a.label AS a_label, b.vec_id AS b_id, b.label AS b_label,
        |    list_inner_product(CAST(a.embedding AS DOUBLE[]), CAST(b.embedding AS DOUBLE[]))
        |    / (sqrt(list_inner_product(CAST(a.embedding AS DOUBLE[]), CAST(a.embedding AS DOUBLE[])))
        |     * sqrt(list_inner_product(CAST(b.embedding AS DOUBLE[]), CAST(b.embedding AS DOUBLE[])))) AS cosine
        |  FROM embeddings a, embeddings b WHERE a.vec_id <> b.vec_id),
        |knn AS (
        |  SELECT a_id, a_label, b_label FROM (
        |    SELECT a_id, a_label, b_label,
        |           row_number() OVER (PARTITION BY a_id ORDER BY cosine DESC, b_id) AS rn
        |    FROM pairs) WHERE rn <= 10),
        |votes AS (
        |  SELECT a_id, a_label, b_label, count(*) AS c
        |  FROM knn GROUP BY 1, 2, 3),
        |pred AS (
        |  SELECT a_id, a_label, b_label AS pred FROM (
        |    SELECT a_id, a_label, b_label,
        |           row_number() OVER (PARTITION BY a_id ORDER BY c DESC, b_label) AS rn
        |    FROM votes) WHERE rn = 1)
        |SELECT a_label AS label, CAST(count(*) AS BIGINT) AS n,
        |       CAST(sum(CASE WHEN pred = a_label THEN 1 ELSE 0 END) AS BIGINT) AS correct,
        |       CAST(sum(CASE WHEN pred = a_label THEN 1 ELSE 0 END) AS DOUBLE) / count(*) AS accuracy
        |FROM pred GROUP BY a_label""".stripMargin,

    // kNN purity, sampled + LSH-bucketed (q214): queries = vec_id%4=0,
    // candidates share ANY 4-bit MEAN-CENTERED sign band over dims 1-16
    // (fixed-point pivots — raw signs degenerate on all-positive
    // embeddings); cosines and tie-breaks are the exact q157 arithmetic
    "q214_knn_purity_sampled" ->
      s"""WITH v AS (
        |  SELECT vec_id, label, CAST(embedding AS DOUBLE[]) AS vec
        |  FROM embeddings),
        |${pivotCte(16)},
        |s AS (
        |  SELECT vec_id, label, vec,
        |    sqrt(list_inner_product(vec, vec)) AS nrm,
        |    ${(0 until 4).map(j => s"${centeredSigExpr(j, 4)} AS sig$j").mkString(",\n    ")}
        |  FROM v, ctr),
        |cand AS (
        |  SELECT DISTINCT a.vec_id AS a_id, b.vec_id AS b_id
        |  FROM s a JOIN s b ON (a.sig0 = b.sig0 OR a.sig1 = b.sig1
        |                        OR a.sig2 = b.sig2 OR a.sig3 = b.sig3)
        |  WHERE a.vec_id % 4 = 0 AND a.vec_id <> b.vec_id),
        |pairs AS (
        |  SELECT c.a_id, sa.label AS a_label, c.b_id, sb.label AS b_label,
        |    list_inner_product(sa.vec, sb.vec) / (sa.nrm * sb.nrm) AS cosine
        |  FROM cand c
        |  JOIN s sa ON sa.vec_id = c.a_id
        |  JOIN s sb ON sb.vec_id = c.b_id),
        |knn AS (
        |  SELECT a_id, a_label, b_label FROM (
        |    SELECT a_id, a_label, b_label,
        |           row_number() OVER (PARTITION BY a_id ORDER BY cosine DESC, b_id) AS rn
        |    FROM pairs) WHERE rn <= 10),
        |votes AS (
        |  SELECT a_id, a_label, b_label, count(*) AS c
        |  FROM knn GROUP BY 1, 2, 3),
        |pred AS (
        |  SELECT a_id, a_label, b_label AS pred FROM (
        |    SELECT a_id, a_label, b_label,
        |           row_number() OVER (PARTITION BY a_id ORDER BY c DESC, b_label) AS rn
        |    FROM votes) WHERE rn = 1)
        |SELECT a_label AS label, CAST(count(*) AS BIGINT) AS n,
        |       CAST(sum(CASE WHEN pred = a_label THEN 1 ELSE 0 END) AS BIGINT) AS correct,
        |       CAST(sum(CASE WHEN pred = a_label THEN 1 ELSE 0 END) AS DOUBLE) / count(*) AS accuracy
        |FROM pred GROUP BY a_label""".stripMargin,

    // LSH candidate recall sweep (q215): exact top-10 of the q214 query
    // sample, covered-or-not per (bands, bits) config — oracle generated
    // per config from the same sign/cosine/tie-break arithmetic
    "q215_lsh_recall_sweep" -> q215OracleSql,

    // KMV-sketch source overlap (q216): per-source k-minimum-values
    // sketch of 60-bit md5 shingle hashes (q26's portable hex
    // arithmetic, widened so the estimator stays unsaturated at
    // trillion-shingle corpora), pair Jaccard estimated as the
    // both-sides fraction of the union's k smallest vs q146's exact matrix
    "q216_source_overlap_sketch" -> sketchOverlapOracleSql,

    // KMV cardinality (q218): per-source distinct-shingle count from the
    // q216 sketch — exact under k, (k-1)*2^60/h_k above — with relative
    // error vs the exact distinct count
    "q218_source_cardinality_sketch" -> cardinalitySketchOracleSql,

    // sampled percentiles (q219): q212's nearest-rank arithmetic over a
    // deterministic 1-in-4 md5 sample, absolute error vs exact per source
    "q219_sampled_percentiles" -> sampledPercentilesOracleSql,

    // directional containment (q222): common-threshold KMV rule — with
    // t = min(max skA, max skB) both sketches are exhaustive below t, so
    // |skA∩skB ≤ t| / |skA ≤ t| estimates |A∩B|/|A|; exact + abs error
    "q222_source_containment_sketch" ->
      s"""WITH ${kmvSketchCtes(256)},
         |mx AS (SELECT source, max(h) AS mx FROM sk GROUP BY source),
         |prs AS (
         |  SELECT a.source AS src_a, b.source AS src_b, LEAST(a.mx, b.mx) AS t
         |  FROM mx a JOIN mx b ON a.source <> b.source),
         |den AS (
         |  SELECT p.src_a, p.src_b, CAST(count(*) AS BIGINT) AS na
         |  FROM prs p JOIN sk s ON s.source = p.src_a AND s.h <= p.t
         |  GROUP BY 1, 2),
         |num AS (
         |  SELECT p.src_a, p.src_b, CAST(count(*) AS BIGINT) AS both
         |  FROM prs p
         |  JOIN sk x ON x.source = p.src_a AND x.h <= p.t
         |  JOIN sk y ON y.source = p.src_b AND y.h = x.h
         |  GROUP BY 1, 2),
         |szc AS (SELECT source, CAST(count(*) AS BIGINT) AS sz FROM sh GROUP BY source),
         |cmn AS (
         |  SELECT a.source AS src_a, b.source AS src_b, CAST(count(*) AS BIGINT) AS c
         |  FROM sh a JOIN sh b USING (shingle)
         |  WHERE a.source <> b.source GROUP BY 1, 2)
         |SELECT d.src_a, d.src_b,
         |  CAST(coalesce(n.both, 0) AS DOUBLE) / d.na AS est_containment,
         |  coalesce(CAST(c.c AS DOUBLE) / z.sz, 0.0) AS exact_containment,
         |  abs(CAST(coalesce(n.both, 0) AS DOUBLE) / d.na -
         |      coalesce(CAST(c.c AS DOUBLE) / z.sz, 0.0)) AS abs_err
         |FROM den d
         |LEFT JOIN num n ON n.src_a = d.src_a AND n.src_b = d.src_b
         |LEFT JOIN cmn c ON c.src_a = d.src_a AND c.src_b = d.src_b
         |JOIN szc z ON z.source = d.src_a
         |ORDER BY 1, 2""".stripMargin,

    // count-min frequency sketch (q221): depth=4 × width=1024 commutative
    // bucket counts (md5(salt:token) — q59's hex arithmetic), estimate =
    // min over salts, reported for the exact top-50 with overestimate
    "q221_token_freq_sketch" -> {
      val h32 =
        """CAST(list_sum(list_transform(range(8),
          |        i -> (strpos('0123456789abcdef',
          |                substring(md5(CAST(salt AS VARCHAR) || ':' || tok), CAST(i + 1 AS INT), 1)) - 1)
          |             * pow(16, 7 - i))) AS BIGINT)""".stripMargin
      s"""WITH toks AS (
         |  SELECT unnest(regexp_split_to_array(trim(text), '\\s+')) AS tok
         |  FROM documents),
         |salts AS (SELECT unnest([0, 1, 2, 3]) AS salt),
         |cells AS (
         |  SELECT salt, $h32 % 1024 AS bucket,
         |         CAST(count(*) AS BIGINT) AS c
         |  FROM toks, salts GROUP BY 1, 2),
         |top AS (
         |  SELECT tok, CAST(count(*) AS BIGINT) AS exact_count
         |  FROM toks GROUP BY tok
         |  ORDER BY exact_count DESC, tok LIMIT 50),
         |probes AS (
         |  SELECT tok, exact_count, salt, $h32 % 1024 AS bucket
         |  FROM top, salts),
         |est AS (
         |  SELECT p.tok, p.exact_count, min(c.c) AS est_count
         |  FROM probes p JOIN cells c ON c.salt = p.salt AND c.bucket = p.bucket
         |  GROUP BY 1, 2)
         |SELECT tok, exact_count, est_count,
         |  est_count - exact_count AS overestimate
         |FROM est ORDER BY exact_count DESC, tok""".stripMargin
    },

    // vocabulary growth (q220): distinct tokens over doubling doc_id
    // prefixes from each token's first-occurrence doc (min-aggregate)
    "q220_vocab_growth" ->
      """WITH fs AS (
        |  SELECT tok, min(doc_id) AS first_doc FROM (
        |    SELECT doc_id,
        |      unnest(list_distinct(regexp_split_to_array(trim(text), '\s+'))) AS tok
        |    FROM documents) GROUP BY tok),
        |cuts AS (SELECT CAST(pow(2, i) AS BIGINT) AS prefix_docs
        |         FROM range(21) t(i)),
        |v AS (
        |  SELECT c.prefix_docs,
        |    CAST(count(*) FILTER (WHERE fs.first_doc < c.prefix_docs)
        |      AS BIGINT) AS vocab
        |  FROM cuts c CROSS JOIN fs GROUP BY c.prefix_docs)
        |SELECT prefix_docs, vocab,
        |  vocab - coalesce(lag(vocab) OVER (ORDER BY prefix_docs), 0)
        |    AS new_tokens
        |FROM v ORDER BY prefix_docs""".stripMargin,

    // quality-priority dedup over bag-of-words groups (members genuinely
    // differ there): keeper = highest quality then smallest id; the
    // quality formula is the exact q152-stage-4 arithmetic, so the winner
    // pick is deterministic on both engines
    "q158_priority_dedup" ->
      """WITH s AS (
        |  SELECT doc_id,
        |    md5(array_to_string(list_sort(list_distinct(regexp_split_to_array(trim(text), '\s+'))), ' ')) AS fingerprint,
        |    (least(CAST(len(regexp_split_to_array(trim(text), '\s+')) AS DOUBLE) / 50.0, 1.0)
        |     + (1.0 - least(CAST(length(text) - length(regexp_replace(text, '[^A-Za-z0-9\s]', '', 'g')) AS DOUBLE)
        |                    / greatest(length(text), 1) * 4.0, 1.0))
        |     + least(CAST(len(list_filter(regexp_split_to_array(trim(text), '\s+'),
        |              x -> x IN ('the','a','an','and','of','to','in'))) AS DOUBLE)
        |             / greatest(len(regexp_split_to_array(trim(text), '\s+')), 1) * 5.0, 1.0)) / 3.0 AS q
        |  FROM documents),
        |ranked AS (
        |  SELECT fingerprint, doc_id, q,
        |         row_number() OVER (PARTITION BY fingerprint ORDER BY q DESC, doc_id) AS rn,
        |         count(*) OVER (PARTITION BY fingerprint) AS dup_count
        |  FROM s)
        |SELECT fingerprint, doc_id AS keeper_id, q AS keeper_quality,
        |       CAST(dup_count AS BIGINT) AS dup_count
        |FROM ranked WHERE rn = 1""".stripMargin,

    // row tracking across the Delta mirror: a Delta-reader-shaped id
    // derivation over the exported log must reproduce every graft row id
    // (docs = matching = distinct over the survivors of the %97 delete)
    "q161_delta_row_tracking" ->
      """SELECT CAST(count(*) AS BIGINT) AS docs,
        |       CAST(count(*) AS BIGINT) AS matching,
        |       CAST(count(*) AS BIGINT) AS distinct_ids
        |FROM documents WHERE doc_id % 97 <> 0""".stripMargin,

    // row tracking: the oracle states the stable-id CONTRACT — after
    // appends + a positional delete + OPTIMIZE, survivor count, stable-id
    // count and distinct-id count must all equal the delete's survivors
    "q159_row_tracking" ->
      """SELECT CAST(count(*) AS BIGINT) AS docs,
        |       CAST(count(*) AS BIGINT) AS stable,
        |       CAST(count(*) AS BIGINT) AS distinct_ids
        |FROM documents WHERE doc_id % 97 <> 0""".stripMargin,

    // dedup threshold sweep: one exact-jaccard pair table (the q25/q27
    // chain at 0.5) scored against five thresholds; the jaccard double is
    // the same BIGINT-ratio division on both engines, and the threshold
    // literals parse to identical doubles, so the >= gates agree exactly
    "q160_threshold_sweep" ->
      """WITH toks AS (
        |  SELECT doc_id, regexp_split_to_array(trim(text), '\s+') AS t FROM documents),
        |sh AS (
        |  SELECT DISTINCT doc_id, array_to_string(t[i:i+2], ' ') AS shingle
        |  FROM (SELECT doc_id, t, unnest(generate_series(1, len(t) - 2)) AS i FROM toks)),
        |sz AS (SELECT doc_id, count(*) AS sz FROM sh GROUP BY 1),
        |common AS (
        |  SELECT a.doc_id AS a_id, b.doc_id AS b_id, count(*) AS c
        |  FROM sh a JOIN sh b USING (shingle)
        |  WHERE a.doc_id < b.doc_id GROUP BY 1, 2),
        |pj AS (
        |  SELECT a_id, b_id, CAST(c AS DOUBLE) / (sa.sz + sb.sz - c) AS jaccard
        |  FROM common
        |  JOIN sz sa ON sa.doc_id = a_id
        |  JOIN sz sb ON sb.doc_id = b_id),
        |th AS (SELECT unnest([0.5, 0.6, 0.7, 0.8, 0.9]) AS threshold),
        |hits AS (
        |  SELECT th.threshold, pj.a_id, pj.b_id
        |  FROM th JOIN pj ON pj.jaccard >= th.threshold),
        |pc AS (SELECT threshold, CAST(count(*) AS BIGINT) AS n_pairs
        |       FROM hits GROUP BY 1),
        |dc AS (SELECT threshold, CAST(count(DISTINCT doc_id) AS BIGINT) AS n_docs
        |       FROM (SELECT threshold, a_id AS doc_id FROM hits
        |             UNION ALL SELECT threshold, b_id FROM hits) GROUP BY 1)
        |SELECT th.threshold,
        |       coalesce(pc.n_pairs, CAST(0 AS BIGINT)) AS n_pairs,
        |       coalesce(dc.n_docs, CAST(0 AS BIGINT)) AS n_docs
        |FROM th LEFT JOIN pc USING (threshold) LEFT JOIN dc USING (threshold)""".stripMargin,

    // tokenizer parity: BIGINT masses of the proven q20 counting
    // expressions, two single final divisions
    "q162_tokenizer_parity" ->
      """SELECT lang, CAST(count(*) AS BIGINT) AS docs,
        |  CAST(sum(length(text)) AS BIGINT) AS total_chars,
        |  CAST(sum(len(regexp_split_to_array(trim(text), '\s+'))) AS BIGINT) AS total_tokens,
        |  CAST(sum(len(regexp_extract_all(text, '[A-Za-z0-9]+|[^A-Za-z0-9\s]'))) AS BIGINT) AS total_bpe_tokens,
        |  CAST(sum(length(text)) AS DOUBLE)
        |    / sum(len(regexp_extract_all(text, '[A-Za-z0-9]+|[^A-Za-z0-9\s]'))) AS chars_per_bpe_token,
        |  CAST(sum(len(regexp_extract_all(text, '[A-Za-z0-9]+|[^A-Za-z0-9\s]'))) AS DOUBLE)
        |    / sum(len(regexp_split_to_array(trim(text), '\s+'))) AS fertility
        |FROM documents GROUP BY lang""".stripMargin,

    // shard manifest: the q112 permutation's shards with an
    // order-canonical md5 fingerprint chain — engine-independent by
    // construction (sorted by permutation key before hashing)
    "q163_shard_manifest" ->
      """WITH k AS (
        |  SELECT doc_id,
        |    md5('graft-shuffle-v1:' || CAST(doc_id AS VARCHAR)) AS skey,
        |    md5(text) AS h,
        |    CAST(len(regexp_split_to_array(trim(text), '\s+')) AS BIGINT) AS toks
        |  FROM documents)
        |SELECT CAST(strpos('0123456789abcdef', substr(skey, 1, 1)) - 1 AS INT) AS shard,
        |  CAST(count(*) AS BIGINT) AS n_docs,
        |  CAST(sum(toks) AS BIGINT) AS n_tokens,
        |  md5(string_agg(h, '' ORDER BY skey, doc_id)) AS fingerprint
        |FROM k GROUP BY 1""".stripMargin,

    // label-centroid separation: centroid cosine is scale-invariant, so
    // the 1/n factors cancel; centroids are quantized to 1e6 fixed point
    // by exact truncating integer division (sign split out) so every
    // value reaching a double is < 2^53 — int->double is then exact in
    // both engines and the final sqrt/division are correctly-rounded
    // IEEE ops, making the doubles bit-identical
    "q164_label_separation" ->
      """WITH ex AS (
        |  SELECT label, CAST(i - 1 AS INT) AS dim, CAST(embedding[i] AS DOUBLE) AS x
        |  FROM (SELECT label, embedding,
        |          unnest(generate_series(1, len(embedding))) AS i FROM embeddings)),
        |c0 AS (
        |  SELECT label, dim, sum(CAST(floor(x * 1e9) AS BIGINT)) AS sx,
        |         CAST(count(*) AS BIGINT) AS nd
        |  FROM ex GROUP BY 1, 2),
        |c AS (
        |  SELECT label, dim,
        |         CAST((CASE WHEN sx < 0 THEN -1 ELSE 1 END)
        |              * (abs(sx) // (nd * 1000)) AS BIGINT) AS cx
        |  FROM c0),
        |norm AS (SELECT label, CAST(sum(cx * cx) AS BIGINT) AS s2 FROM c GROUP BY 1),
        |n AS (SELECT label, CAST(count(*) AS BIGINT) AS n FROM embeddings GROUP BY 1),
        |p AS (
        |  SELECT a.label AS label_a, b.label AS label_b,
        |         CAST(sum(a.cx * b.cx) AS BIGINT) AS sab
        |  FROM c a JOIN c b USING (dim)
        |  WHERE a.label < b.label GROUP BY 1, 2)
        |SELECT label_a, label_b, na.n AS n_a, nb.n AS n_b,
        |  CAST(sab AS DOUBLE)
        |    / (sqrt(CAST(sa.s2 AS DOUBLE)) * sqrt(CAST(sb.s2 AS DOUBLE)))
        |    AS centroid_cosine
        |FROM p
        |JOIN norm sa ON sa.label = p.label_a
        |JOIN norm sb ON sb.label = p.label_b
        |JOIN n na ON na.label = p.label_a
        |JOIN n nb ON nb.label = p.label_b""".stripMargin,

    // prototypicality pruning: 1e6 fixed-point centroids (q164 idiom)
    // keep dot/norm masses < 2^53 so the per-row cosine is bit-identical
    // and the quartile rank order is engine-independent
    "q165_prototypicality_prune" ->
      """WITH ex AS (
        |  SELECT vec_id, label, CAST(i - 1 AS INT) AS dim,
        |         CAST(floor(CAST(embedding[i] AS DOUBLE) * 1e6) AS BIGINT) AS vx
        |  FROM (SELECT vec_id, label, embedding,
        |          unnest(generate_series(1, len(embedding))) AS i FROM embeddings)),
        |c0 AS (
        |  SELECT label, dim, CAST(sum(vx) AS BIGINT) AS sx,
        |         CAST(count(*) AS BIGINT) AS nd
        |  FROM ex GROUP BY 1, 2),
        |cent AS (
        |  SELECT label, dim,
        |         CAST((CASE WHEN sx < 0 THEN -1 ELSE 1 END)
        |              * (abs(sx) // nd) AS BIGINT) AS cx
        |  FROM c0),
        |nc AS (SELECT label, CAST(sum(cx * cx) AS BIGINT) AS nc FROM cent GROUP BY 1),
        |sc AS (
        |  SELECT e.vec_id, e.label,
        |         CAST(sum(e.vx * c.cx) AS BIGINT) AS dotc,
        |         CAST(sum(e.vx * e.vx) AS BIGINT) AS nv
        |  FROM ex e JOIN cent c USING (label, dim) GROUP BY 1, 2),
        |cosd AS (
        |  SELECT sc.vec_id, sc.label,
        |         CAST(dotc AS DOUBLE)
        |           / (sqrt(CAST(nv AS DOUBLE)) * sqrt(CAST(nc.nc AS DOUBLE)))
        |           AS proto_cosine
        |  FROM sc JOIN nc USING (label)),
        |nn AS (SELECT label, CAST(count(*) AS BIGINT) AS n FROM embeddings GROUP BY 1),
        |r AS (
        |  SELECT *, row_number()
        |    OVER (PARTITION BY label ORDER BY proto_cosine ASC, vec_id) AS rn
        |  FROM cosd),
        |k AS (
        |  SELECT r.label, r.vec_id, r.proto_cosine, nn.n
        |  FROM r JOIN nn USING (label)
        |  WHERE r.rn <= greatest(1, nn.n // 4))
        |SELECT label, max(n) AS n, CAST(count(*) AS BIGINT) AS n_kept,
        |  max(proto_cosine) AS border_cosine,
        |  md5(string_agg(CAST(vec_id AS VARCHAR), ',' ORDER BY vec_id))
        |    AS kept_fingerprint
        |FROM k GROUP BY 1""".stripMargin,

    // hard-negative mining: q114's BM25 formula with per-term
    // contributions floored to 1e9 fixed point BEFORE the cross-term sum,
    // so the score mass is a BIGINT (aggregation-order-free) and the rank
    // is a pure integer sort
    "q166_hard_negatives" ->
      """WITH toks AS (
        |  SELECT doc_id, term FROM (
        |    SELECT doc_id,
        |           unnest(regexp_split_to_array(trim(text), '\s+')) AS term
        |    FROM documents WHERE trim(text) <> '')
        |  WHERE term <> ''),
        |dl AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS dl FROM toks GROUP BY 1),
        |anchors AS (
        |  SELECT DISTINCT doc_id AS anchor_id, term FROM (
        |    SELECT doc_id,
        |           unnest(list_slice(regexp_split_to_array(trim(text), '\s+'), 1, 4))
        |             AS term
        |    FROM documents WHERE doc_id < 8)),
        |tf AS (
        |  SELECT doc_id, term, CAST(count(*) AS BIGINT) AS tf
        |  FROM toks WHERE term IN (SELECT term FROM anchors)
        |  GROUP BY 1, 2),
        |dft AS (SELECT term, CAST(count(*) AS BIGINT) AS df FROM tf GROUP BY 1),
        |totals AS (
        |  SELECT (SELECT CAST(count(*) AS BIGINT) FROM documents) AS n_docs,
        |         (SELECT CAST(count(*) AS BIGINT) FROM toks) AS total_tokens),
        |contrib AS (
        |  SELECT a.anchor_id, tf.doc_id,
        |    CAST(floor(((n_docs - df + 0.5) / (df + 0.5))
        |      * ((tf * 2.2)
        |         / (tf + 1.2 * (0.25 + ((0.75 * dl) * n_docs) / total_tokens)))
        |      * 1e9) AS BIGINT) AS sfp
        |  FROM tf
        |  JOIN anchors a USING (term)
        |  JOIN dft USING (term)
        |  JOIN dl USING (doc_id)
        |  CROSS JOIN totals),
        |scored AS (
        |  SELECT anchor_id, doc_id, CAST(sum(sfp) AS BIGINT) AS score_fp
        |  FROM contrib GROUP BY 1, 2),
        |ranked AS (
        |  SELECT anchor_id, doc_id, score_fp,
        |    row_number()
        |      OVER (PARTITION BY anchor_id ORDER BY score_fp DESC, doc_id) AS rank
        |  FROM scored WHERE anchor_id <> doc_id)
        |SELECT anchor_id, CAST(rank AS BIGINT) AS rank, doc_id AS neg_id,
        |  CAST(score_fp AS DOUBLE) / 1e9 AS score
        |FROM ranked WHERE rank <= 5""".stripMargin,

    // inverted index: postings sorted numerically then rendered, so the
    // string is engine- and partitioning-independent
    "q115_inverted_index" ->
      """WITH t AS (
        |  SELECT doc_id, unnest(regexp_split_to_array(trim(text), '\s+')) AS term
        |  FROM documents WHERE trim(text) <> '')
        |SELECT term,
        |  CAST(count(DISTINCT doc_id) AS BIGINT) AS df,
        |  CAST(count(*) AS BIGINT) AS cf,
        |  min(doc_id) AS first_doc,
        |  max(doc_id) AS last_doc,
        |  array_to_string(list_sort(list(DISTINCT doc_id)), ',') AS postings
        |FROM t WHERE term <> '' GROUP BY term""".stripMargin,

    // q70's LM scores with mid-distribution floors; the scores are
    // bit-identical across engines, so the comparisons agree exactly
    "q116_lm_quality_filter" ->
      """WITH terms AS (
        |  SELECT doc_id, unnest(regexp_split_to_array(trim(text), '\s+')) AS term
        |  FROM documents WHERE trim(text) <> ''
        |), t AS (SELECT doc_id, term FROM terms WHERE term <> ''),
        |freq AS (SELECT term, CAST(count(*) AS BIGINT) AS cnt FROM t GROUP BY term),
        |total AS (SELECT CAST(count(*) AS BIGINT) AS total_tokens FROM t),
        |lm AS (
        |  SELECT t.doc_id,
        |    CAST(count(*) AS BIGINT) AS n_tokens,
        |    CAST(sum(freq.cnt) AS BIGINT) AS freq_mass,
        |    CAST(sum(freq.cnt) AS BIGINT) / CAST(total.total_tokens AS DOUBLE)
        |      / count(*) AS avg_token_prob,
        |    CAST(min(freq.cnt) AS DOUBLE) / total.total_tokens AS min_token_prob
        |  FROM t JOIN freq USING (term) CROSS JOIN total
        |  GROUP BY t.doc_id, total.total_tokens)
        |SELECT * FROM lm
        |WHERE avg_token_prob >= 0.03325 AND min_token_prob >= 0.030""".stripMargin,

    // per-stratum rate sampling: same md5-nibble hash as q59, same
    // source-name weight derivation as q75
    "q117_stratified_sample" ->
      """WITH h AS (
        |  SELECT source, doc_id,
        |    CAST(list_sum(list_transform(range(8),
        |      i -> (strpos('0123456789abcdef',
        |              substring(md5(CAST(doc_id AS VARCHAR)), CAST(i + 1 AS INT), 1)) - 1)
        |           * pow(16, 7 - i))) AS BIGINT) % 100 AS bucket,
        |    CAST((CAST(substring(source, 4) AS INT) % 4 + 1) * 10 AS BIGINT) AS rate_pct
        |  FROM documents)
        |SELECT source, doc_id, bucket, rate_pct FROM h
        |WHERE bucket < rate_pct""".stripMargin,

    // SCD2: the oracle reconstructs the post-batch history table — closed
    // versions for real changes and tombstones, opened versions for changes
    // and inserts, untouched open rows for everything else (including the
    // no-op branch: an "update" that changes nothing opens no version)
    "q118_scd2_dimension" -> s"WITH $Scd2Ctes\n$Scd2HistorySelect",

    // point-in-time enrichment: the as-of + validity-filter plan must equal
    // the plain inequality join over the same reconstructed history
    "q120_pit_enrich" ->
      s"""WITH $Scd2Ctes,
         |hist AS (
         |$Scd2HistorySelect)
         |SELECT o.o_orderkey, o.o_custkey, o.o_orderdate, o.o_totalprice,
         |  h.acctbal, h.mktsegment, h.valid_from
         |FROM orders o JOIN hist h ON o.o_custkey = h.c_custkey
         |  AND o.o_orderdate >= h.valid_from
         |  AND (h.valid_to IS NULL OR o.o_orderdate < h.valid_to)""".stripMargin,

    // temperature mixing: sqrt is correctly-rounded IEEE on both engines,
    // and the normalizer is the (integer) max — no float sum over a
    // data-dependent group order anywhere in the expression tree
    // Chi-square source divergence (q174): all fixed-point BIGINT terms
    // (1e-9 scale, truncating integer division on non-negative operands,
    // where DuckDB's floor `//` and Spark's trunc `DIV` agree); absent
    // terms fold in via Σ_absent q = Σ_all q − Σ_present q.
    "q174_source_divergence" ->
      """WITH terms AS (
        |  SELECT source, term FROM (
        |    SELECT source,
        |           unnest(regexp_split_to_array(trim(text), '\s+')) AS term
        |    FROM documents WHERE trim(text) <> '')
        |  WHERE term <> ''),
        |st AS (SELECT source, term, CAST(count(*) AS BIGINT) AS n
        |       FROM terms GROUP BY source, term),
        |s AS (SELECT source, CAST(sum(n) AS BIGINT) AS ns FROM st GROUP BY source),
        |ct AS (SELECT term, CAST(sum(n) AS BIGINT) AS c FROM st GROUP BY term),
        |tot AS (SELECT CAST(sum(c) AS BIGINT) AS ctot FROM ct),
        |qt AS (SELECT term, CAST((c * 1000000000) // ctot AS BIGINT) AS qfp
        |       FROM ct CROSS JOIN tot),
        |qs AS (SELECT CAST(sum(qfp) AS BIGINT) AS qsum FROM qt),
        |pres AS (
        |  SELECT p.source,
        |    CAST(sum((p.pfp - qt.qfp) * (p.pfp - qt.qfp)
        |             // greatest(qt.qfp, 1) - qt.qfp) AS BIGINT) AS present_sum
        |  FROM (SELECT st.source, st.term,
        |          CAST((st.n * 1000000000) // s.ns AS BIGINT) AS pfp
        |        FROM st JOIN s USING (source)) p
        |  JOIN qt USING (term)
        |  GROUP BY p.source)
        |SELECT pres.source, s.ns AS n_tokens,
        |  pres.present_sum + qs.qsum AS divergence_fp,
        |  CAST(pres.present_sum + qs.qsum AS DOUBLE) / 1000000000 AS divergence
        |FROM pres JOIN s USING (source) CROSS JOIN qs""".stripMargin,

    // Token-budget plan (q175): ⌊√available⌋ weights (IEEE sqrt is
    // correctly rounded, so the floor is bit-portable), BIGINT shares via
    // truncating division, supply-capped; epochs is the one double div.
    "q175_token_budget" ->
      """WITH avail AS (
        |  SELECT source, CAST(count(*) AS BIGINT) AS n_docs,
        |    CAST(sum(len(regexp_split_to_array(trim(text), '\s+'))) AS BIGINT)
        |      AS available_tokens
        |  FROM documents GROUP BY source),
        |w AS (SELECT source, n_docs, available_tokens,
        |        CAST(floor(sqrt(CAST(available_tokens AS DOUBLE))) AS BIGINT)
        |          AS weight
        |      FROM avail),
        |ws AS (SELECT CAST(sum(weight) AS BIGINT) AS wsum FROM w)
        |SELECT source, n_docs, available_tokens, weight,
        |  least(available_tokens,
        |        CAST((1000000 * weight) // wsum AS BIGINT)) AS allocated_tokens,
        |  CAST(least(available_tokens,
        |        CAST((1000000 * weight) // wsum AS BIGINT)) AS DOUBLE)
        |    / available_tokens AS epochs
        |FROM w CROSS JOIN ws""".stripMargin,

    "q121_temperature_mix" ->
      """WITH agg AS (
        |  SELECT source, CAST(count(*) AS BIGINT) AS n_docs,
        |    CAST(sum(len(regexp_split_to_array(trim(text), '\s+'))) AS BIGINT) AS n_tokens
        |  FROM documents GROUP BY source),
        |m AS (SELECT max(n_tokens) AS max_tokens FROM agg)
        |SELECT source, n_docs, n_tokens,
        |  sqrt(n_tokens) / sqrt(max_tokens) AS temp_weight,
        |  (sqrt(n_tokens) / sqrt(max_tokens))
        |    / (CAST(n_tokens AS DOUBLE) / max_tokens) AS boost
        |FROM agg CROSS JOIN m""".stripMargin,

    // datacard: BIGINT masses + one division; dup incidence = md5 identity
    // over the whole corpus, attributed to each source
    "q122_datacard" ->
      """WITH d AS (
        |  SELECT source, doc_id,
        |    CAST(len(regexp_split_to_array(trim(text), '\s+')) AS BIGINT) AS tc,
        |    CAST(length(text) AS BIGINT) AS nc,
        |    md5(text) AS h
        |  FROM documents),
        |dup AS (SELECT h FROM d GROUP BY h HAVING count(*) >= 2)
        |SELECT source,
        |  CAST(count(*) AS BIGINT) AS n_docs,
        |  CAST(sum(tc) AS BIGINT) AS n_tokens,
        |  CAST(sum(nc) AS BIGINT) AS n_chars,
        |  CAST(sum(CASE WHEN h IN (SELECT h FROM dup) THEN 1 ELSE 0 END) AS BIGINT)
        |    AS n_dup_docs,
        |  CAST(sum(tc) AS BIGINT) / CAST(CAST(count(*) AS BIGINT) AS DOUBLE)
        |    AS avg_tokens_per_doc
        |FROM d GROUP BY source""".stripMargin,

    // PII redaction: the same RE2-safe patterns in the same order; DuckDB's
    // regexp_replace needs the 'g' flag (Spark replaces all by default)
    "q119_pii_redact" ->
      """WITH aug AS (
        |  SELECT doc_id,
        |    text || ' contact user' || CAST(doc_id AS VARCHAR)
        |      || '@example.com or +1 555-'
        |      || lpad(CAST(doc_id % 1000 AS VARCHAR), 3, '0') || '-'
        |      || lpad(CAST(doc_id % 10000 AS VARCHAR), 4, '0')
        |      || ' ip 10.' || CAST(doc_id % 256 AS VARCHAR)
        |      || '.0.1 ssn 123-45-6789' AS aug
        |  FROM documents)
        |SELECT doc_id,
        |  regexp_replace(regexp_replace(regexp_replace(regexp_replace(aug,
        |    '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}', '<EMAIL>', 'g'),
        |    '\+?\d{1,2} \d{3}-\d{3}-\d{4}', '<PHONE>', 'g'),
        |    '\d{3}-\d{2}-\d{4}', '<SSN>', 'g'),
        |    '\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}', '<IP>', 'g') AS redacted,
        |  CAST(len(regexp_extract_all(aug,
        |    '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}')) AS BIGINT) AS n_email,
        |  CAST(len(regexp_extract_all(aug,
        |    '\+?\d{1,2} \d{3}-\d{3}-\d{4}')) AS BIGINT) AS n_phone,
        |  CAST(len(regexp_extract_all(aug,
        |    '\d{3}-\d{2}-\d{4}')) AS BIGINT) AS n_ssn,
        |  CAST(len(regexp_extract_all(aug,
        |    '\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}')) AS BIGINT) AS n_ip
        |FROM aug""".stripMargin,
  ) ++
    // q47's oracle is GENERATED like q26's, but from corpus-trained state:
    // the learned merge table (deterministic, memoized per dir — Verify
    // runs every query before dumping this map, so the gate corpus's own
    // merges are in hand) is re-applied from scratch in DuckDB by
    // BpeOracle. Absent only if bpeTokenize never ran (→ rows-only check).
    analytics.CorpusQueries.currentBpeMerges
      .map(m => "q47_bpe_tokenize" -> graft.text.BpeOracle.sql(m)) ++
    // q111's oracle is GENERATED from the same trained centroids the ANN
    // index uses: DuckDB re-derives assignment + within-cluster drop rule
    // from the embedded k×dim literals (see SemDedupOracle's determinism
    // argument). Absent only if semanticDedup never ran (→ rows-only).
    analytics.CorpusQueries.currentAnnCentroids
      .map(c => "q111_semantic_dedup" ->
        graft.sim.SemDedupOracle.sql(c, analytics.CorpusQueries.SemDedupTau))

  /** q66/q76 oracle: exact 8-gram overlap counts between the train slice
    * and the eval slice (q76's bloom prefilter cannot change the result —
    * the exact join removes false positives). */
  private val DecontaminateOracleSql: String =
    """WITH toks AS (
      |  SELECT doc_id, regexp_split_to_array(trim(text), '\s+') AS t FROM documents),
      |sh AS (
      |  SELECT DISTINCT doc_id, array_to_string(t[i:i+7], ' ') AS g
      |  FROM (SELECT doc_id, t, unnest(generate_series(1, len(t) - 7)) AS i FROM toks)),
      |ev AS (SELECT DISTINCT g FROM sh WHERE doc_id < 10),
      |tr AS (SELECT doc_id, g FROM sh WHERE doc_id >= 10)
      |SELECT tr.doc_id, count(DISTINCT tr.g) AS shared_ngrams
      |FROM tr JOIN ev USING (g)
      |GROUP BY tr.doc_id""".stripMargin

  /** q71 oracle: the composed quality-filter scan (also the filter stage of
    * the q86 clean-corpus composition). */
  private val CorpusFilterOracleSql: String =
    """WITH b AS (
      |  SELECT doc_id,
      |    regexp_split_to_array(trim(text), '\s+') AS toks,
      |    CAST(len(regexp_split_to_array(trim(text), '\s+')) AS BIGINT) AS token_count,
      |    CAST(length(text) - length(regexp_replace(text, '[^A-Za-z0-9\s]', '', 'g')) AS DOUBLE)
      |      / greatest(length(text), 1) AS punct_ratio,
      |    CAST(len(list_filter(regexp_split_to_array(trim(text), '\s+'),
      |         x -> x IN ('the','a','an','and','of','to','in'))) AS DOUBLE)
      |      / greatest(len(regexp_split_to_array(trim(text), '\s+')), 1) AS stop_ratio
      |  FROM documents
      |), s AS (
      |  SELECT doc_id, token_count,
      |    (least(CAST(token_count AS DOUBLE) / 50.0, 1.0)
      |     + (1.0 - least(punct_ratio * 4.0, 1.0))
      |     + least(stop_ratio * 5.0, 1.0)) / 3.0 AS quality,
      |    1.0 - CAST(len(list_distinct(toks)) AS DOUBLE)
      |      / greatest(len(toks), 1) AS dup_token_ratio,
      |    coalesce(
      |      CAST(list_max(list_transform(
      |             list_distinct(list_transform(generate_series(1, len(toks) - 1),
      |               i -> toks[i] || ' ' || toks[i + 1])),
      |             x -> len(list_filter(list_transform(generate_series(1, len(toks) - 1),
      |               i -> toks[i] || ' ' || toks[i + 1]), y -> y = x)))) AS DOUBLE)
      |        / greatest(len(toks) - 1, 1), 0.0) AS top_2gram_fraction
      |  FROM b
      |)
      |SELECT doc_id, token_count, quality, dup_token_ratio, top_2gram_fraction
      |FROM s
      |WHERE token_count >= 20 AND token_count <= 5000
      |  AND quality >= 0.5 AND dup_token_ratio <= 0.6
      |  AND top_2gram_fraction <= 0.2""".stripMargin

  /** q86 oracle, COMPOSED from the q71 filter and the q73 closure: the
    * closure's every `documents` reference is redirected to an `fdocs` CTE
    * (the filter-surviving docs), and only keeper rows
    * (doc_id = cluster_id) leave the query — exactly the Spark-side
    * composition. */
  private def CleanCorpusOracleSql: String = {
    val closure = DupClustersOracleSql.replace("FROM documents", "FROM fdocs")
    val injected = closure.replace(
      "WITH RECURSIVE pairs AS (",
      "WITH RECURSIVE fdocs AS (\n" +
        "  SELECT d.doc_id, d.text FROM documents d\n" +
        s"  JOIN (\n$CorpusFilterOracleSql\n) f ON d.doc_id = f.doc_id\n" +
        "), pairs AS (")
    s"SELECT * FROM (\n$injected\n) WHERE doc_id = cluster_id"
  }

  /** q73 oracle: connected components over the exact-jaccard pair graph by
    * transitive closure (recursive CTE: every label reaches every node in
    * its component; min reachable label = cluster id) — the declarative
    * phrasing of the engine's min-label propagation. */
  private def DupClustersOracleSql: String =
    s"""WITH RECURSIVE pairs AS (
       |$JaccardOracleSql
       |), edges AS (
       |  SELECT a_id AS src, b_id AS dst FROM pairs
       |  UNION ALL SELECT b_id, a_id FROM pairs
       |), reach(node, lbl) AS (
       |  SELECT CAST(doc_id AS BIGINT), CAST(doc_id AS BIGINT) FROM documents
       |  UNION
       |  SELECT e.dst, r.lbl FROM reach r JOIN edges e ON e.src = r.node
       |), cl AS (
       |  SELECT node AS doc_id, min(lbl) AS cluster_id FROM reach GROUP BY node
       |)
       |SELECT doc_id, cluster_id,
       |       count(*) OVER (PARTITION BY cluster_id) AS cluster_size
       |FROM cl""".stripMargin

  /** Exact cosine top-10 for query vec_id=0 — oracle for the brute-force
    * path (q28) and the banded-LSH path (q31, full recall on this corpus). */
  private val CosineTopKOracleSql: String =
    """SELECT e.vec_id,
      |  list_inner_product(CAST(e.embedding AS DOUBLE[]), CAST(q.embedding AS DOUBLE[]))
      |  / (sqrt(list_inner_product(CAST(e.embedding AS DOUBLE[]), CAST(e.embedding AS DOUBLE[])))
      |   * sqrt(list_inner_product(CAST(q.embedding AS DOUBLE[]), CAST(q.embedding AS DOUBLE[])))) AS score
      |FROM embeddings e, (SELECT embedding FROM embeddings WHERE vec_id = 0) q
      |WHERE e.vec_id <> 0
      |ORDER BY score DESC, e.vec_id LIMIT 10""".stripMargin

  /** All-pairs cosine ≥ 0.5 over `embeddings` — oracle for both the exact
    * pipeline (q29) and the banded-LSH pipeline (q30, full recall on this
    * corpus). */
  private val EmbeddingNearDupOracleSql: String =
    """SELECT a.vec_id AS a_id, b.vec_id AS b_id,
      |  list_inner_product(CAST(a.embedding AS DOUBLE[]), CAST(b.embedding AS DOUBLE[]))
      |  / (sqrt(list_inner_product(CAST(a.embedding AS DOUBLE[]), CAST(a.embedding AS DOUBLE[])))
      |   * sqrt(list_inner_product(CAST(b.embedding AS DOUBLE[]), CAST(b.embedding AS DOUBLE[])))) AS cosine
      |FROM embeddings a, embeddings b
      |WHERE a.vec_id < b.vec_id
      |  AND list_inner_product(CAST(a.embedding AS DOUBLE[]), CAST(b.embedding AS DOUBLE[]))
      |  / (sqrt(list_inner_product(CAST(a.embedding AS DOUBLE[]), CAST(a.embedding AS DOUBLE[])))
      |   * sqrt(list_inner_product(CAST(b.embedding AS DOUBLE[]), CAST(b.embedding AS DOUBLE[])))) >= 0.5""".stripMargin

  /** Exact word-trigram Jaccard ≥ 0.5 over all document pairs — the DuckDB
    * phrasing of [[graft.dedup.Dedup.ngramJaccardPairs]]'s verification
    * semantics (and, because both candidate generators reach every true pair
    * on this corpus, of the MinHash pipeline's output too). */
  private val JaccardOracleSql: String =
    """WITH toks AS (
      |  SELECT doc_id, regexp_split_to_array(trim(text), '\s+') AS t FROM documents),
      |sh AS (
      |  SELECT DISTINCT doc_id, array_to_string(t[i:i+2], ' ') AS shingle
      |  FROM (SELECT doc_id, t, unnest(generate_series(1, len(t) - 2)) AS i FROM toks)),
      |sz AS (SELECT doc_id, count(*) AS sz FROM sh GROUP BY 1),
      |common AS (
      |  SELECT a.doc_id AS a_id, b.doc_id AS b_id, count(*) AS c
      |  FROM sh a JOIN sh b USING (shingle)
      |  WHERE a.doc_id < b.doc_id
      |  GROUP BY 1, 2)
      |SELECT a_id, b_id,
      |       CAST(c AS DOUBLE) / (sa.sz + sb.sz - c) AS jaccard
      |FROM common
      |JOIN sz sa ON sa.doc_id = a_id
      |JOIN sz sb ON sb.doc_id = b_id
      |WHERE CAST(c AS DOUBLE) / (sa.sz + sb.sz - c) >= 0.5""".stripMargin

  /** q26 oracle, GENERATED: rebuilds the md5-based SimHash fingerprints
    * bit-for-bit in DuckDB (two 32-bit halves per token from the same hex
    * arithmetic the Spark side uses), then emits ALL pairs at Hamming ≤ 3 —
    * banding is only an optimization on the Spark side, and by pigeonhole a
    * pair within Hamming 3 of a 4×16-bit banding always shares a chunk, so
    * the all-pairs phrasing is the same set. */
  private val SimhashOracleSql: String = {
    def half(off: Int): String =
      "CAST(list_sum(list_transform(range(8), i -> (strpos('0123456789abcdef', " +
        s"substring(md5(t), CAST(i + $off AS INT), 1)) - 1) * pow(16, 7 - i))) AS BIGINT)"
    val bits = (0 until 64).map { j =>
      val src = if (j < 32) "los" else "his"
      val power =
        if (j == 63) "(-9223372036854775807 - 1)" else s"CAST(${1L << j} AS BIGINT)"
      s"CASE WHEN list_sum(list_transform($src, v -> CASE WHEN (v >> ${j % 32}) & 1 = 1 " +
        s"THEN 1 ELSE -1 END)) > 0 THEN $power ELSE CAST(0 AS BIGINT) END"
    }.mkString(" + ")
    s"""WITH toks AS (
       |  SELECT doc_id, list_distinct(regexp_split_to_array(trim(text), '\\s+')) AS ts
       |  FROM documents
       |), hashes AS (
       |  SELECT doc_id,
       |    list_transform(ts, t -> ${half(1)}) AS his,
       |    list_transform(ts, t -> ${half(9)}) AS los
       |  FROM toks
       |), fp AS (
       |  SELECT doc_id, $bits AS simhash FROM hashes
       |)
       |SELECT a.doc_id AS a_id, b.doc_id AS b_id,
       |  CAST(bit_count(xor(a.simhash, b.simhash)) AS INTEGER) AS hamming
       |FROM fp a JOIN fp b ON a.doc_id < b.doc_id
       |WHERE bit_count(xor(a.simhash, b.simhash)) <= 3""".stripMargin
  }
}
