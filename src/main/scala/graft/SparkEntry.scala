package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.operators.{Allocation, Audio, Behavior, Bpe, Budget, Clustering, CorpusStats, Dedup, EmbStats, EntityRes, EventStats, Ivfpq, Keywords, Layout, LinkAnalysis, Lm, Multimodal, NearKey, OrderStats, Overlap, Pipeline, Pipeline2, Pipeline3, Pq, Preference, Privacy, Quality, Redact, Relational, Relational2, Retrieval, SetSim, Similarity, Sketch, Shards, SkewProfile, Splits, Stats, Survival, TextAnalysis, Threshold, UnigramLm}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * Every implemented operator from SURVEY.md §2 gets a `queries` entry;
  * where the semantics are ANSI-SQL-expressible the matching DuckDB
  * oracle lives in `oracleSql` (column names/types aligned exactly —
  * the driver sorts columns by name and hash-compares values).
  */
object SparkEntry {

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    Relational.q1Agg(spark, "/root/testdata/sf0.001")

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q1_agg" -> Relational.q1Agg,
    "q2_filter_project" -> Relational.q2FilterProject,
    "q3_join_agg" -> Relational.q3JoinAgg,
    "q4_topk" -> Relational.q4TopK,
    "q5_window" -> Relational.q5Window,
    "q6_semijoin" -> Relational.q6SemiJoin,
    "q7_antijoin" -> Relational.q7AntiJoin,
    "q8_setops" -> Relational.q8SetOps,
    "q9_having" -> Relational.q9Having,
    "q10_scalar" -> Relational.q10Scalar,
    "q11_events_window" -> Relational.q11EventsWindow,
    "q12_above_avg" -> Relational.q12AboveAvg,
    "q13_outer_join" -> Relational.q13OuterJoin,
    "q14_rollup" -> Relational.q14Rollup,
    "q15_string_agg" -> Relational.q15StringAgg,
    "q16_sql_subquery" -> Relational.q16SqlSubquery,
    "q17_full_outer" -> Relational.q17FullOuter,
    "q18_percentile" -> Relational.q18Percentile,
    "q19_pivot" -> Relational.q19Pivot,
    "q20_salted_agg" -> Relational.q20SaltedAgg,
    "q21_explode" -> Similarity.q21Explode,
    "q22_approx" -> Relational.q22Approx,
    "q23_running_sum" -> Relational.q23RunningSum,
    "q24_lag" -> Relational.q24Lag,
    "q25_rank_funcs" -> Relational.q25RankFuncs,
    "q28_topk_agg" -> Relational.q28TopKAgg,
    "q26_array_funcs" -> Relational.q26ArrayFuncs,
    "q27_json_funcs" -> Relational.q27JsonFuncs,
    "q29_asof_join" -> Relational2.q29AsofJoin,
    "q30_range_join" -> Relational2.q30RangeJoin,
    "q31_cube" -> Relational2.q31Cube,
    "q32_grouping_sets" -> Relational2.q32GroupingSets,
    "q33_date_funcs" -> Relational2.q33DateFuncs,
    "q34_regex_funcs" -> Relational2.q34RegexFuncs,
    "q35_sample_hash" -> Relational2.q35SampleHash,
    "q39_multiset_ops" -> Relational2.q39MultisetOps,
    "q40_subqueries" -> Relational2.q40Subqueries,
    "q41_lateral" -> Relational2.q41Lateral,
    "q42_map_funcs" -> Relational2.q42MapFuncs,
    "q43_range_frame" -> Relational2.q43RangeFrame,
    "q44_salted_join" -> Relational2.q44SaltedJoin,
    "q36_tfidf" -> Pipeline.q36Tfidf,
    "q37_quality_filter" -> Pipeline.q37QualityFilter,
    "q38_cc_labels" -> Pipeline.q38CcLabels,
    "q45_cc_fixpoint" -> Pipeline.q45CcFixpoint,
    "q46_chunks" -> Pipeline.q46Chunks,
    "q47_stratified_sample" -> Pipeline.q47StratifiedSample,
    "q48_unpivot" -> Relational2.q48Unpivot,
    "q49_skew_agg" -> Relational2.q49SkewAgg,
    "q50_decontam" -> Pipeline.q50Decontam,
    "q51_mixture" -> Pipeline.q51Mixture,
    "q52_repetition" -> Pipeline2.q52Repetition,
    "q53_domain_cap" -> Pipeline2.q53DomainCap,
    "q54_knn_classify" -> Pipeline2.q54KnnClassify,
    "q55_cooccur_pmi" -> Pipeline2.q55CooccurPmi,
    "q56_length_hist" -> Pipeline2.q56LengthHist,
    "q57_incremental_agg" -> Pipeline2.q57IncrementalAgg,
    "q61_pagerank" -> Pipeline2.q61Pagerank,
    "q63_rrf_fusion" -> Pipeline2.q63RrfFusion,
    "q65_pagerank_fixpoint" -> Pipeline2.q65PagerankFixpoint,
    "q66_pack" -> Pipeline3.q66Pack,
    "q67_cdc_merge" -> Pipeline3.q67CdcMerge,
    "q68_semdedup" -> Pipeline3.q68SemDedup,
    "q69_dup_spans" -> Pipeline3.q69DupSpans,
    "q70_kmeans" -> Clustering.q70Kmeans,
    "q71_incremental_dedup" -> Dedup.q71IncrementalDedup,
    "q72_bpe_merges" -> Bpe.q72BpeMerges,
    "q73_dsir_weight" -> Pipeline3.q73DsirWeight,
    "q74_bpe_encode" -> Bpe.q74BpeEncode,
    "q75_lm_score" -> Pipeline3.q75LmScore,
    "q76_centroid_outliers" -> Clustering.q76CentroidOutliers,
    "q77_corpus_drift" -> Pipeline3.q77CorpusDrift,
    "q78_random_projection" -> Similarity.q78RandomProjection,
    "q79_event_anomaly" -> Behavior.q79EventAnomaly,
    "q80_dedup_cut" -> Pipeline3.q80DedupCut,
    "q81_weighted_sample" -> Pipeline3.q81WeightedSample,
    "q82_pii_redact" -> Redact.q82PiiRedact,
    "q83_bm25" -> Retrieval.q83Bm25,
    "q84_curation_funnel" -> Pipeline3.q84CurationFunnel,
    "q85_pq_adc" -> Pq.q85PqAdc,
    "q86_otsu_threshold" -> Threshold.q86OtsuThreshold,
    "q87_ivfpq" -> Ivfpq.q87Ivfpq,
    "q88_token_budget" -> Budget.q88TokenBudget,
    "q89_source_overlap" -> Overlap.q89SourceOverlap,
    "q90_tok_fertility" -> Bpe.q90TokenizerFertility,
    "q91_cms_calibration" -> Sketch.q91CmsCalibration,
    "q92_diversity_sample" -> Clustering.q92DiversitySample,
    "q93_label_affinity" -> Overlap.q93LabelAffinity,
    "q94_hll_calibration" -> Sketch.q94HllCalibration,
    "q95_bloom_prune" -> Sketch.q95BloomPrune,
    "q96_zorder_layout" -> Layout.q96ZorderLayout,
    "q97_compaction_plan" -> Layout.q97CompactionPlan,
    "q98_kn_bigram" -> Lm.q98KnBigram,
    "q99_ngram_novelty" -> Lm.q99NgramNovelty,
    "q100_quantile_sketch" -> Threshold.q100QuantileSketch,
    "q101_er_blocking" -> EntityRes.q101ErBlocking,
    "q102_entity_clusters" -> EntityRes.q102EntityClusters,
    "q103_kmv_overlap" -> Sketch.q103KmvOverlap,
    "q104_scd2_islands" -> Behavior.q104Scd2Islands,
    "q105_rake_keywords" -> Keywords.q105RakeKeywords,
    "q106_ab_cuped" -> Behavior.q106AbCuped,
    "q107_containment" -> Dedup.q107Containment,
    "q108_split_leakage" -> Splits.q108SplitLeakage,
    "q109_er_triangles" -> EntityRes.q109ErTriangles,
    "q110_attribution" -> Behavior.q110Attribution,
    "q111_join_card" -> Stats.q111JoinCard,
    "q112_decayed_pop" -> Stats.q112DecayedPopularity,
    "q113_profile" -> Quality.q113Profile,
    "q114_basket_lift" -> Quality.q114BasketLift,
    "q115_benford" -> Quality.q115Benford,
    "q116_markov_transitions" -> Quality.q116MarkovTransitions,
    "q117_ref_integrity" -> Quality.q117RefIntegrity,
    "q118_rtbf_cascade" -> Quality.q118RtbfCascade,
    "q119_ks_drift" -> OrderStats.q119KsDrift,
    "q120_skyline" -> OrderStats.q120Skyline,
    "q121_cohort_ltv" -> Behavior.q121CohortLtv,
    "q122_mad_anomaly" -> Behavior.q122MadAnomaly,
    "q123_rfm_segments" -> OrderStats.q123RfmSegments,
    "q124_session_paths" -> Behavior.q124SessionPaths,
    "q125_conversion_lag" -> Behavior.q125ConversionLag,
    "q126_profile_ndv" -> Quality.q126ProfileNdv,
    "q127_decayed_mv" -> Stats.q127DecayedMv,
    "q128_gopher_quality" -> TextAnalysis.q128GopherQuality,
    "q129_contamination" -> Dedup.q129Contamination,
    "q130_k_anonymity" -> Quality.q130KAnonymity,
    "q131_ann_recall" -> Similarity.q131AnnRecall,
    "q132_link_pred" -> EntityRes.q132LinkPred,
    "q133_ece_calibration" -> TextAnalysis.q133LangidCalibration,
    "q134_setsim_search" -> SetSim.q134SetSimSearch,
    "q135_heavy_hitters" -> Sketch.q135HeavyHitters,
    "q136_collocations" -> Keywords.q136Collocations,
    "q137_corpus_diff" -> Pipeline3.q137CorpusDiff,
    "q138_lang_sampling" -> TextAnalysis.q138LangSampling,
    "q139_kcore" -> EntityRes.q139KCore,
    "q140_canonical_dedup" -> Pipeline3.q140CanonicalDedup,
    "q141_hard_negatives" -> Similarity.q141HardNegatives,
    "q142_heaps_law" -> CorpusStats.q142HeapsLaw,
    "q143_simpson_diversity" -> CorpusStats.q143SimpsonDiversity,
    "q144_bootstrap_ci" -> Stats.q144BootstrapCi,
    "q145_zipf_coverage" -> CorpusStats.q145ZipfCoverage,
    "q146_burstiness" -> EventStats.q146Burstiness,
    "q147_seasonality" -> EventStats.q147Seasonality,
    "q148_power_analysis" -> EventStats.q148PowerAnalysis,
    "q149_cusum_changepoint" -> EventStats.q149CusumChangepoint,
    "q150_revenue_gini" -> OrderStats.q150RevenueGini,
    "q151_srm_audit" -> EventStats.q151SrmAudit,
    "q152_assortativity" -> EntityRes.q152Assortativity,
    "q153_dedup_recall" -> Dedup.q153DedupRecall,
    "q154_minhash_scurve" -> Dedup.q154MinhashScurve,
    "q155_crossmodal_dedup" -> Multimodal.q155CrossmodalDedup,
    "q156_dp_release" -> Privacy.q156DpRelease,
    "q157_ngram_coverage" -> CorpusStats.q157NgramCoverage,
    "q158_bt_rating" -> Preference.q158BtRating,
    "q159_dedup_threshold_curve" -> Dedup.q159DedupThresholdCurve,
    "q160_nearkey_pairs" -> NearKey.q160NearkeyPairs,
    "q161_repurchase_survival" -> Survival.q161RepurchaseSurvival,
    "q162_hits_bipartite" -> LinkAnalysis.q162HitsBipartite,
    "q163_strata_alloc" -> Allocation.q163StrataAlloc,
    "q164_textrank" -> Keywords.q164Textrank,
    "q165_skew_profile" -> SkewProfile.q165SkewProfile,
    "q166_embedding_isotropy" -> EmbStats.q166EmbeddingIsotropy,
    "q167_copurchase_mixing" -> Quality.q167CopurchaseMixing,
    "q168_acf" -> EventStats.q168Acf,
    "q169_dim_truncation" -> Similarity.q169DimTruncation,
    "q170_pca_power" -> EmbStats.q170PcaPower,
    "q171_shard_layout" -> Shards.q171ShardLayout,
    "q172_shard_manifest" -> Shards.q172ShardManifest,
    "q173_containment_sketch" -> Dedup.q173ContainmentSketch,
    "q174_unigram_lm" -> UnigramLm.q174UnigramLm,
    "q175_sketch_only" -> Dedup.q175SketchOnly,
    "q176_er_recall" -> EntityRes.q176ErRecall,
    "q177_para_dedup" -> Dedup.q177ParaDedup,
    "q178_ann_frontier" -> Ivfpq.q178AnnFrontier,
    "q179_ann_quantizer" -> Ivfpq.q179AnnQuantizer,
    "q58_sessionize_batch" -> Behavior.q58SessionizeBatch,
    "q59_retention" -> Behavior.q59Retention,
    "q60_funnel" -> Behavior.q60Funnel,
    "q62_gapfill" -> Behavior.q62Gapfill,
    // training-data pipeline operators
    "ta_stats" -> TextAnalysis.taStats,
    "ta_langid" -> TextAnalysis.taLangId,
    "ta_fingerprint" -> TextAnalysis.taFingerprint,
    "ta_tokens" -> TextAnalysis.taTokens,
    "dedup_ngram_jaccard" -> Dedup.dedupNgramJaccard,
    "q64_dedup_pipeline" -> Dedup.q64DedupPipeline,
    "ann_ivf" -> Similarity.annIvf,
    "dedup_exact" -> Dedup.dedupExact,
    "dedup_minhash_lsh" -> Dedup.dedupMinhashLsh,
    "dedup_simhash" -> Dedup.dedupSimhash,
    "dedup_embedding" -> Similarity.dedupEmbedding,
    "ann_brute" -> Similarity.annBrute,
    "ann_lsh" -> Similarity.annLsh,
    "mm_features" -> Multimodal.mmFeatures,
    "mm_decode" -> Multimodal.mmDecode,
    "mm_frames" -> Multimodal.mmFrames,
    "mm_phash_dedup" -> Multimodal.mmPhashDedup,
    "mm_scene_cuts" -> Multimodal.mmSceneCuts,
    "mm_audio_dedup" -> Audio.mmAudioDedup,
  )

  /** Bench-only twins: timed and reported by [[graft.Bench]] alongside
    * `queries`, but deliberately NOT correctness entries — the two
    * fixed-shape variants of the q49 skew query (always-unsalted /
    * always-salted), kept so the bench JSON shows the shipped
    * scale-conditioned plan next to both alternatives at every scale
    * (the AQE crossover evidence, SCALING.md). */
  def benchExtras: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q49_skew_naive" -> Relational2.q49SkewAggNaive,
    "q49_skew_salted" -> Relational2.q49SkewAggSalted,
    "q107_sketch_only" -> Dedup.q107SketchOnly,
  )

  def oracleSql: Map[String, String] = Map(
    "q1_agg" ->
      """SELECT l_returnflag, l_linestatus,
        |  CAST(sum(l_quantity) AS BIGINT) AS sum_qty,
        |  CAST(sum(CAST(round(l_extendedprice * 100) AS BIGINT)) AS BIGINT) AS sum_price_cents,
        |  CAST(sum(CAST(round(l_extendedprice * (1 - l_discount) * 100) AS BIGINT)) AS BIGINT) AS revenue_cents,
        |  count(*) AS cnt
        |FROM lineitem GROUP BY l_returnflag, l_linestatus
        |ORDER BY l_returnflag, l_linestatus""".stripMargin,
    "q2_filter_project" ->
      """SELECT l_orderkey, l_linenumber,
        |  CAST(round(l_extendedprice * 100) AS BIGINT) AS price_cents
        |FROM lineitem
        |WHERE l_shipdate >= TIMESTAMP '1995-01-01' AND l_discount > 0.05 AND l_quantity < 25
        |ORDER BY l_orderkey, l_linenumber""".stripMargin,
    "q3_join_agg" ->
      """SELECT n_name,
        |  CAST(sum(CAST(round(l_extendedprice * (1 - l_discount) * 100) AS BIGINT)) AS BIGINT) AS revenue_cents,
        |  count(*) AS n_items
        |FROM lineitem
        |JOIN orders ON l_orderkey = o_orderkey
        |JOIN customer ON o_custkey = c_custkey
        |JOIN nation ON c_nationkey = n_nationkey
        |GROUP BY n_name ORDER BY n_name""".stripMargin,
    "q4_topk" ->
      """SELECT o_custkey,
        |  CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT) AS spend_cents,
        |  count(*) AS n_orders
        |FROM orders GROUP BY o_custkey
        |ORDER BY spend_cents DESC, o_custkey ASC LIMIT 10""".stripMargin,
    "q5_window" ->
      """SELECT o_custkey, o_orderkey,
        |  CAST(round(o_totalprice * 100) AS BIGINT) AS price_cents, rk
        |FROM (
        |  SELECT o_custkey, o_orderkey, o_totalprice,
        |    CAST(row_number() OVER (PARTITION BY o_custkey
        |      ORDER BY o_totalprice DESC, o_orderkey ASC) AS INT) AS rk
        |  FROM orders)
        |WHERE rk <= 3 ORDER BY o_custkey, rk""".stripMargin,
    "q6_semijoin" ->
      """SELECT c_custkey, c_name FROM customer
        |WHERE EXISTS (SELECT 1 FROM orders
        |  WHERE o_custkey = c_custkey AND year(o_orderdate) = 1995)
        |ORDER BY c_custkey""".stripMargin,
    "q7_antijoin" ->
      """SELECT c_custkey, c_mktsegment FROM customer
        |WHERE NOT EXISTS (SELECT 1 FROM orders
        |  WHERE o_custkey = c_custkey AND o_totalprice > 300000)
        |ORDER BY c_custkey""".stripMargin,
    "q8_setops" ->
      """SELECT DISTINCT o_custkey FROM (
        |  SELECT o_custkey FROM (
        |    SELECT DISTINCT o_custkey FROM orders WHERE year(o_orderdate) = 1995
        |    INTERSECT
        |    SELECT DISTINCT o_custkey FROM orders WHERE year(o_orderdate) = 1996
        |  ) EXCEPT SELECT DISTINCT o_custkey FROM orders WHERE year(o_orderdate) = 1997
        |  UNION ALL
        |  SELECT o_custkey FROM (
        |    SELECT DISTINCT o_custkey FROM orders WHERE year(o_orderdate) = 2001
        |    EXCEPT
        |    SELECT DISTINCT o_custkey FROM orders WHERE year(o_orderdate) = 1995)
        |) ORDER BY o_custkey""".stripMargin,
    "q9_having" ->
      """SELECT o_orderpriority, count(*) AS n_orders,
        |  CAST(sum(CASE WHEN o_orderstatus = 'F' THEN 1 ELSE 0 END) AS BIGINT) AS n_finished,
        |  CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT) AS total_cents
        |FROM orders GROUP BY o_orderpriority
        |HAVING count(*) > 10 ORDER BY o_orderpriority""".stripMargin,
    "q10_scalar" ->
      """SELECT p_partkey, upper(p_brand) AS brand_u,
        |  CAST(length(p_name) AS INT) AS name_len,
        |  substring(p_type, 1, 5) AS type5,
        |  concat_ws('|', p_brand, p_type) AS brand_type,
        |  CAST(p_size % 7 AS INT) AS size_mod,
        |  abs(CAST(round(p_retailprice * 100) AS BIGINT) - 100000) AS price_dist_cents
        |FROM part ORDER BY p_partkey""".stripMargin,
    "q11_events_window" ->
      """SELECT CAST(epoch(date_trunc('hour', ts)) AS BIGINT) AS hour, event_type,
        |  count(*) AS n_events,
        |  CAST(sum(CAST(round(value * 100) AS BIGINT)) AS BIGINT) AS value_cents,
        |  count(DISTINCT user_id) AS n_users
        |FROM events GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,
    "q12_above_avg" ->
      """WITH avgs AS (
        |  SELECT o_custkey AS ac_custkey,
        |    CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT) AS sum_cents,
        |    count(*) AS n
        |  FROM orders GROUP BY o_custkey)
        |SELECT o_orderkey, o_custkey,
        |  CAST(round(o_totalprice * 100) AS BIGINT) AS price_cents
        |FROM orders JOIN avgs ON o_custkey = ac_custkey
        |WHERE CAST(round(o_totalprice * 100) AS BIGINT) * n > 2 * sum_cents
        |ORDER BY o_orderkey""".stripMargin,
    "q13_outer_join" ->
      """SELECT p_partkey, p_brand,
        |  coalesce(n_bulk, 0) AS n_bulk, bulk_qty
        |FROM part LEFT OUTER JOIN (
        |  SELECT l_partkey, count(*) AS n_bulk,
        |    CAST(sum(l_quantity) AS BIGINT) AS bulk_qty
        |  FROM lineitem WHERE l_quantity >= 48 GROUP BY l_partkey
        |) ON p_partkey = l_partkey
        |ORDER BY p_partkey""".stripMargin,
    "q14_rollup" ->
      """SELECT n_name, c_mktsegment, count(*) AS n_customers,
        |  CAST(sum(CAST(round(c_acctbal * 100) AS BIGINT)) AS BIGINT) AS acctbal_cents
        |FROM customer JOIN nation ON c_nationkey = n_nationkey
        |GROUP BY ROLLUP (n_name, c_mktsegment)
        |ORDER BY n_name ASC NULLS FIRST, c_mktsegment ASC NULLS FIRST""".stripMargin,
    "q15_string_agg" ->
      """SELECT r_name,
        |  array_to_string(list_sort(list(n_name)), ',') AS nations,
        |  count(*) AS n_nations
        |FROM nation JOIN region ON n_regionkey = r_regionkey
        |GROUP BY r_name ORDER BY r_name""".stripMargin,
    "q16_sql_subquery" ->
      """SELECT c_custkey,
        |  (SELECT count(*) FROM orders WHERE o_custkey = c_custkey
        |     AND o_totalprice > 200000) AS n_big_orders
        |FROM customer
        |WHERE c_acctbal > 9000
        |ORDER BY c_custkey""".stripMargin,
    "q17_full_outer" ->
      """SELECT coalesce(k95, k01) AS o_custkey,
        |  coalesce(n_1995, 0) AS n_1995,
        |  coalesce(n_2001, 0) AS n_2001
        |FROM (SELECT o_custkey AS k95, count(*) AS n_1995 FROM orders
        |      WHERE year(o_orderdate) = 1995 GROUP BY 1)
        |FULL OUTER JOIN
        |     (SELECT o_custkey AS k01, count(*) AS n_2001 FROM orders
        |      WHERE year(o_orderdate) = 2001 GROUP BY 1)
        |ON k95 = k01
        |ORDER BY o_custkey""".stripMargin,
    "q18_percentile" ->
      """SELECT o_orderpriority,
        |  quantile_cont(CAST(round(o_totalprice * 100) AS BIGINT), 0.5) AS median_cents,
        |  quantile_cont(CAST(round(o_totalprice * 100) AS BIGINT), 0.9) AS p90_cents,
        |  count(*) AS n
        |FROM orders GROUP BY o_orderpriority
        |ORDER BY o_orderpriority""".stripMargin,
    "q19_pivot" ->
      """SELECT n_name,
        |  CAST(count(*) FILTER (c_mktsegment = 'AUTOMOBILE') AS BIGINT) AS automobile,
        |  CAST(count(*) FILTER (c_mktsegment = 'BUILDING') AS BIGINT) AS building,
        |  CAST(count(*) FILTER (c_mktsegment = 'FURNITURE') AS BIGINT) AS furniture,
        |  CAST(count(*) FILTER (c_mktsegment = 'HOUSEHOLD') AS BIGINT) AS household,
        |  CAST(count(*) FILTER (c_mktsegment = 'MACHINERY') AS BIGINT) AS machinery
        |FROM customer JOIN nation ON c_nationkey = n_nationkey
        |GROUP BY n_name ORDER BY n_name""".stripMargin,
    "q20_salted_agg" -> // plain GROUP BY: salting must not change results
      """SELECT user_id, count(*) AS n_events,
        |  CAST(sum(CAST(round(value * 100) AS BIGINT)) AS BIGINT) AS value_cents
        |FROM events GROUP BY user_id ORDER BY user_id""".stripMargin,
    "q21_explode" -> Similarity.q21ExplodeOracle,
    "q22_approx" -> Relational.q22ApproxOracle,
    "q23_running_sum" ->
      """SELECT o_custkey, o_orderkey,
        |  CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT)) OVER w_all AS BIGINT) AS running_cents,
        |  CAST(floor(CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT)) OVER w3 AS DOUBLE)
        |    / count(*) OVER w3) AS BIGINT) AS moving3_cents
        |FROM orders WHERE o_custkey < 100
        |WINDOW
        |  w_all AS (PARTITION BY o_custkey ORDER BY o_orderdate ASC, o_orderkey ASC
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW),
        |  w3 AS (PARTITION BY o_custkey ORDER BY o_orderdate ASC, o_orderkey ASC
        |    ROWS BETWEEN 2 PRECEDING AND CURRENT ROW)
        |ORDER BY o_custkey, o_orderkey""".stripMargin,
    "q24_lag" ->
      """SELECT o_custkey, o_orderkey, days_since_prev FROM (
        |  SELECT o_custkey, o_orderkey,
        |    epoch_day - lag(epoch_day, 1) OVER (PARTITION BY o_custkey
        |      ORDER BY o_orderdate ASC, o_orderkey ASC) AS days_since_prev
        |  FROM (SELECT *, CAST(epoch(o_orderdate) // 86400 AS BIGINT) AS epoch_day
        |        FROM orders))
        |WHERE days_since_prev IS NOT NULL
        |ORDER BY o_custkey, o_orderkey""".stripMargin,
    "q28_topk_agg" -> // window formulation as the aggregator's oracle
      """SELECT o_custkey, CAST(rk AS INT) AS rk, o_orderkey, price_cents
        |FROM (
        |  SELECT o_custkey, o_orderkey,
        |    CAST(round(o_totalprice * 100) AS BIGINT) AS price_cents,
        |    row_number() OVER (PARTITION BY o_custkey
        |      ORDER BY CAST(round(o_totalprice * 100) AS BIGINT) DESC,
        |               o_orderkey ASC) AS rk
        |  FROM orders)
        |WHERE rk <= 3 ORDER BY o_custkey, rk""".stripMargin,
    "q25_rank_funcs" ->
      """SELECT c_custkey, CAST(c_nationkey AS INT) AS nation,
        |  CAST(rk AS BIGINT) AS rk, CAST(drk AS BIGINT) AS drk,
        |  CAST(quartile AS BIGINT) AS quartile, prk, cd
        |FROM (
        |  SELECT c_custkey, c_nationkey,
        |    rank() OVER w AS rk, dense_rank() OVER w AS drk,
        |    ntile(4) OVER w AS quartile,
        |    percent_rank() OVER w AS prk, cume_dist() OVER w AS cd
        |  FROM customer WHERE c_custkey <= 300
        |  WINDOW w AS (PARTITION BY c_nationkey
        |    ORDER BY CAST(round(c_acctbal * 100) AS BIGINT) DESC, c_custkey ASC))
        |ORDER BY c_custkey""".stripMargin,
    "q26_array_funcs" ->
      """SELECT vec_id,
        |  CAST(len(v) AS BIGINT) AS dim,
        |  v[1] AS first_milli,
        |  list_max(v) AS max_milli,
        |  list_min(v) AS min_milli,
        |  CAST(list_contains(v, 0) AS INT) AS has_zero,
        |  CAST(list_sum(v[1:8]) AS BIGINT) AS head8_sum,
        |  list_sort(v)[32] AS median_lo_milli
        |FROM (SELECT vec_id,
        |  list_transform(embedding, x -> CAST(round(CAST(x AS DOUBLE) * 1000) AS BIGINT)) AS v
        |  FROM embeddings WHERE vec_id < 50)
        |ORDER BY vec_id""".stripMargin,
    "q27_json_funcs" ->
      """SELECT event_type, count(*) AS n,
        |  CAST(sum(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS BIGINT) AS sum_k,
        |  CAST(max(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS BIGINT) AS max_k
        |FROM events GROUP BY event_type ORDER BY event_type""".stripMargin,
    "q29_asof_join" -> Relational2.q29AsofJoinOracle,
    "q30_range_join" -> Relational2.q30RangeJoinOracle,
    "q31_cube" -> Relational2.q31CubeOracle,
    "q32_grouping_sets" -> Relational2.q32GroupingSetsOracle,
    "q33_date_funcs" -> Relational2.q33DateFuncsOracle,
    "q34_regex_funcs" -> Relational2.q34RegexFuncsOracle,
    "q35_sample_hash" -> Relational2.q35SampleHashOracle,
    "q39_multiset_ops" -> Relational2.q39MultisetOpsOracle,
    "q40_subqueries" -> Relational2.q40SubqueriesOracle,
    "q41_lateral" -> Relational2.q41LateralOracle,
    "q42_map_funcs" -> Relational2.q42MapFuncsOracle,
    "q43_range_frame" -> Relational2.q43RangeFrameOracle,
    "q44_salted_join" -> Relational2.q44SaltedJoinOracle,
    "q36_tfidf" -> Pipeline.q36TfidfOracle,
    "q37_quality_filter" -> Pipeline.q37QualityFilterOracle,
    "q38_cc_labels" -> Pipeline.q38CcLabelsOracle,
    "q45_cc_fixpoint" -> Pipeline.q45CcFixpointOracle,
    "q46_chunks" -> Pipeline.q46ChunksOracle,
    "q47_stratified_sample" -> Pipeline.q47StratifiedSampleOracle,
    "q48_unpivot" -> Relational2.q48UnpivotOracle,
    "q49_skew_agg" -> Relational2.q49SkewAggOracle,
    "q50_decontam" -> Pipeline.q50DecontamOracle,
    "q51_mixture" -> Pipeline.q51MixtureOracle,
    "q52_repetition" -> Pipeline2.q52RepetitionOracle,
    "q53_domain_cap" -> Pipeline2.q53DomainCapOracle,
    "q54_knn_classify" -> Pipeline2.q54KnnClassifyOracle,
    "q55_cooccur_pmi" -> Pipeline2.q55CooccurPmiOracle,
    "q56_length_hist" -> Pipeline2.q56LengthHistOracle,
    "q57_incremental_agg" -> Pipeline2.q57IncrementalAggOracle,
    "q61_pagerank" -> Pipeline2.q61PagerankOracle,
    "q63_rrf_fusion" -> Pipeline2.q63RrfFusionOracle,
    "q65_pagerank_fixpoint" -> Pipeline2.q65PagerankFixpointOracle,
    "q66_pack" -> Pipeline3.q66PackOracle,
    "q67_cdc_merge" -> Pipeline3.q67CdcMergeOracle,
    "q68_semdedup" -> Pipeline3.q68SemDedupOracle,
    "q69_dup_spans" -> Pipeline3.q69DupSpansOracle,
    "q70_kmeans" -> Clustering.q70KmeansOracle,
    "q71_incremental_dedup" -> Dedup.q71IncrementalDedupOracle,
    "q72_bpe_merges" -> Bpe.q72BpeMergesOracle,
    "q73_dsir_weight" -> Pipeline3.q73DsirWeightOracle,
    "q74_bpe_encode" -> Bpe.q74BpeEncodeOracle,
    "q75_lm_score" -> Pipeline3.q75LmScoreOracle,
    "q76_centroid_outliers" -> Clustering.q76CentroidOutliersOracle,
    "q77_corpus_drift" -> Pipeline3.q77CorpusDriftOracle,
    "q78_random_projection" -> Similarity.q78RandomProjectionOracle,
    "q79_event_anomaly" -> Behavior.q79EventAnomalyOracle,
    "q80_dedup_cut" -> Pipeline3.q80DedupCutOracle,
    "q81_weighted_sample" -> Pipeline3.q81WeightedSampleOracle,
    "q82_pii_redact" -> Redact.q82PiiRedactOracle,
    "q83_bm25" -> Retrieval.q83Bm25Oracle,
    "q84_curation_funnel" -> Pipeline3.q84CurationFunnelOracle,
    "q85_pq_adc" -> Pq.q85PqAdcOracle,
    "q86_otsu_threshold" -> Threshold.q86OtsuThresholdOracle,
    "q87_ivfpq" -> Ivfpq.q87IvfpqOracle,
    "q88_token_budget" -> Budget.q88TokenBudgetOracle,
    "q89_source_overlap" -> Overlap.q89SourceOverlapOracle,
    "q90_tok_fertility" -> Bpe.q90TokenizerFertilityOracle,
    "q91_cms_calibration" -> Sketch.q91CmsCalibrationOracle,
    "q92_diversity_sample" -> Clustering.q92DiversitySampleOracle,
    "q93_label_affinity" -> Overlap.q93LabelAffinityOracle,
    "q94_hll_calibration" -> Sketch.q94HllCalibrationOracle,
    "q95_bloom_prune" -> Sketch.q95BloomPruneOracle,
    "q96_zorder_layout" -> Layout.q96ZorderLayoutOracle,
    "q97_compaction_plan" -> Layout.q97CompactionPlanOracle,
    "q98_kn_bigram" -> Lm.q98KnBigramOracle,
    "q99_ngram_novelty" -> Lm.q99NgramNoveltyOracle,
    "q100_quantile_sketch" -> Threshold.q100QuantileSketchOracle,
    "q101_er_blocking" -> EntityRes.q101ErBlockingOracle,
    "q102_entity_clusters" -> EntityRes.q102EntityClustersOracle,
    "q103_kmv_overlap" -> Sketch.q103KmvOverlapOracle,
    "q104_scd2_islands" -> Behavior.q104Scd2IslandsOracle,
    "q105_rake_keywords" -> Keywords.q105RakeKeywordsOracle,
    "q106_ab_cuped" -> Behavior.q106AbCupedOracle,
    "q107_containment" -> Dedup.q107ContainmentOracle,
    "q108_split_leakage" -> Splits.q108SplitLeakageOracle,
    "q109_er_triangles" -> EntityRes.q109ErTrianglesOracle,
    "q110_attribution" -> Behavior.q110AttributionOracle,
    "q111_join_card" -> Stats.q111JoinCardOracle,
    "q112_decayed_pop" -> Stats.q112DecayedPopularityOracle,
    "q113_profile" -> Quality.q113ProfileOracle,
    "q114_basket_lift" -> Quality.q114BasketLiftOracle,
    "q115_benford" -> Quality.q115BenfordOracle,
    "q116_markov_transitions" -> Quality.q116MarkovTransitionsOracle,
    "q117_ref_integrity" -> Quality.q117RefIntegrityOracle,
    "q118_rtbf_cascade" -> Quality.q118RtbfCascadeOracle,
    "q119_ks_drift" -> OrderStats.q119KsDriftOracle,
    "q120_skyline" -> OrderStats.q120SkylineOracle,
    "q121_cohort_ltv" -> Behavior.q121CohortLtvOracle,
    "q122_mad_anomaly" -> Behavior.q122MadAnomalyOracle,
    "q123_rfm_segments" -> OrderStats.q123RfmSegmentsOracle,
    "q124_session_paths" -> Behavior.q124SessionPathsOracle,
    "q125_conversion_lag" -> Behavior.q125ConversionLagOracle,
    "q126_profile_ndv" -> Quality.q126ProfileNdvOracle,
    "q127_decayed_mv" -> Stats.q127DecayedMvOracle,
    "q128_gopher_quality" -> TextAnalysis.q128GopherQualityOracle,
    "q129_contamination" -> Dedup.q129ContaminationOracle,
    "q130_k_anonymity" -> Quality.q130KAnonymityOracle,
    "q131_ann_recall" -> Similarity.q131AnnRecallOracle,
    "q132_link_pred" -> EntityRes.q132LinkPredOracle,
    "q133_ece_calibration" -> TextAnalysis.q133LangidCalibrationOracle,
    "q134_setsim_search" -> SetSim.q134SetSimSearchOracle,
    "q135_heavy_hitters" -> Sketch.q135HeavyHittersOracle,
    "q136_collocations" -> Keywords.q136CollocationsOracle,
    "q137_corpus_diff" -> Pipeline3.q137CorpusDiffOracle,
    "q138_lang_sampling" -> TextAnalysis.q138LangSamplingOracle,
    "q139_kcore" -> EntityRes.q139KCoreOracle,
    "q140_canonical_dedup" -> Pipeline3.q140CanonicalDedupOracle,
    "q141_hard_negatives" -> Similarity.q141HardNegativesOracle,
    "q142_heaps_law" -> CorpusStats.q142HeapsLawOracle,
    "q143_simpson_diversity" -> CorpusStats.q143SimpsonDiversityOracle,
    "q144_bootstrap_ci" -> Stats.q144BootstrapCiOracle,
    "q145_zipf_coverage" -> CorpusStats.q145ZipfCoverageOracle,
    "q146_burstiness" -> EventStats.q146BurstinessOracle,
    "q147_seasonality" -> EventStats.q147SeasonalityOracle,
    "q148_power_analysis" -> EventStats.q148PowerAnalysisOracle,
    "q149_cusum_changepoint" -> EventStats.q149CusumChangepointOracle,
    "q150_revenue_gini" -> OrderStats.q150RevenueGiniOracle,
    "q151_srm_audit" -> EventStats.q151SrmAuditOracle,
    "q152_assortativity" -> EntityRes.q152AssortativityOracle,
    "q153_dedup_recall" -> Dedup.q153DedupRecallOracle,
    "q154_minhash_scurve" -> Dedup.q154MinhashScurveOracle,
    "q155_crossmodal_dedup" -> Multimodal.q155CrossmodalDedupOracle,
    "q156_dp_release" -> Privacy.q156DpReleaseOracle,
    "q157_ngram_coverage" -> CorpusStats.q157NgramCoverageOracle,
    "q158_bt_rating" -> Preference.q158BtRatingOracle,
    "q159_dedup_threshold_curve" -> Dedup.q159DedupThresholdCurveOracle,
    "q160_nearkey_pairs" -> NearKey.q160NearkeyPairsOracle,
    "q161_repurchase_survival" -> Survival.q161RepurchaseSurvivalOracle,
    "q162_hits_bipartite" -> LinkAnalysis.q162HitsBipartiteOracle,
    "q163_strata_alloc" -> Allocation.q163StrataAllocOracle,
    "q164_textrank" -> Keywords.q164TextrankOracle,
    "q165_skew_profile" -> SkewProfile.q165SkewProfileOracle,
    "q166_embedding_isotropy" -> EmbStats.q166EmbeddingIsotropyOracle,
    "q167_copurchase_mixing" -> Quality.q167CopurchaseMixingOracle,
    "q168_acf" -> EventStats.q168AcfOracle,
    "q169_dim_truncation" -> Similarity.q169DimTruncationOracle,
    "q170_pca_power" -> EmbStats.q170PcaPowerOracle,
    "q171_shard_layout" -> Shards.q171ShardLayoutOracle,
    "q172_shard_manifest" -> Shards.q172ShardManifestOracle,
    "q173_containment_sketch" -> Dedup.q173ContainmentSketchOracle,
    "q174_unigram_lm" -> UnigramLm.q174UnigramLmOracle,
    "q175_sketch_only" -> Dedup.q175SketchOnlyOracle,
    "q176_er_recall" -> EntityRes.q176ErRecallOracle,
    "q177_para_dedup" -> Dedup.q177ParaDedupOracle,
    "q178_ann_frontier" -> Ivfpq.q178AnnFrontierOracle,
    "q179_ann_quantizer" -> Ivfpq.q179AnnQuantizerOracle,
    "q58_sessionize_batch" -> Behavior.q58SessionizeBatchOracle,
    "q59_retention" -> Behavior.q59RetentionOracle,
    "q60_funnel" -> Behavior.q60FunnelOracle,
    "q62_gapfill" -> Behavior.q62GapfillOracle,
    "ta_stats" -> TextAnalysis.taStatsOracle,
    "ta_langid" -> TextAnalysis.taLangIdOracle,
    "ta_fingerprint" -> TextAnalysis.taFingerprintOracle,
    "ta_tokens" -> TextAnalysis.taTokensOracle,
    "dedup_ngram_jaccard" -> Dedup.dedupNgramJaccardOracle,
    "q64_dedup_pipeline" -> Dedup.q64DedupPipelineOracle,
    "ann_ivf" -> Similarity.annIvfOracle,
    "dedup_exact" -> Dedup.dedupExactOracle,
    "dedup_minhash_lsh" -> Dedup.dedupMinhashLshOracle,
    "dedup_simhash" -> Dedup.dedupSimhashOracle,
    "dedup_embedding" -> Similarity.dedupEmbeddingOracle,
    "ann_brute" -> Similarity.annBruteOracle,
    "ann_lsh" -> Similarity.annLshOracle,
    "mm_features" -> Multimodal.mmFeaturesOracle,
    "mm_decode" -> Multimodal.mmDecodeOracle,
    "mm_frames" -> Multimodal.mmFramesOracle,
    "mm_phash_dedup" -> Multimodal.mmPhashDedupOracle,
    "mm_scene_cuts" -> Multimodal.mmSceneCutsOracle,
    "mm_audio_dedup" -> Audio.mmAudioDedupOracle,
  )
}
