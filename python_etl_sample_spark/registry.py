"""Query registry — the single source of truth for the engine surface.

Every operator from SURVEY.md §2 registers here via the ``@query``
decorator with its name, the Spark implementation
``(spark, sf_dir) -> DataFrame``, and (when SQL-expressible) the
equivalent DuckDB oracle SQL. ``__spark_entry__.queries()`` /
``oracle_sql()`` are thin views over this registry, so an operator is
"declared" to the driver iff it is registered here.

Contract (driver, __spark_entry__.py docstring): the driver compares
Spark output vs oracle output by row-count + schema + order-insensitive
value-hash with columns sorted by name — so every computed column is
aliased identically on both sides, floats that feed the hash are
rounded identically on both sides, and no query relies on row order.
"""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession

QueryFn = Callable[[SparkSession, str], DataFrame]


@dataclass(frozen=True)
class QuerySpec:
    name: str
    fn: QueryFn
    oracle: str | None  # DuckDB SQL; None → driver does rows-only check
    doc: str = ""


REGISTRY: dict[str, QuerySpec] = {}


def query(name: str, oracle: str | None = None) -> Callable[[QueryFn], QueryFn]:
    """Register an operator implementation under ``name``."""

    def deco(fn: QueryFn) -> QueryFn:
        if name in REGISTRY:
            raise ValueError(f"duplicate query name: {name}")
        REGISTRY[name] = QuerySpec(name=name, fn=fn, oracle=oracle, doc=fn.__doc__ or "")
        return fn

    return deco


#: Canonical surface order. The driver records correctness rows in the
#: order ``queries()`` yields them and round 1 showed it may truncate the
#: artifact (CORRECTNESS_r01.json stopped at the 50th registration-order
#: entry), so the 69 SURVEY.md §2 operators — the graded inventory — come
#: first, in §2 numeric order; extensions follow, hash-checked ones before
#: rows-only ones so a truncated run drops the weakest evidence last.
SURVEY_ORDER: tuple[str, ...] = (
    # §2.1 scans / sources / sinks (#1-6)
    "scan_parquet",
    "scan_projected",
    "source_csv",
    "source_json",
    "sink_parquet",
    "sink_partitioned",
    # §2.2 row ops (#7-11)
    "project_derive",
    "filter_pred",
    "filter_null",
    "filter_like",
    "case_when",
    # §2.3 joins (#12-21)
    "join_inner",
    "join_outer",
    "join_broadcast",
    "join_semi",
    "join_anti",
    "join_theta",
    "join_range",
    "join_asof",
    "join_multiway",
    "self_join",
    # §2.4 aggregates (#22-32)
    "agg_global",
    "agg_groupby",
    "agg_distinct",
    "agg_approx_distinct",
    "agg_having",
    "agg_stats",
    "agg_collect",
    "agg_rollup",
    "agg_cube",
    "agg_grouping_sets",
    "pivot",
    # §2.5 windows (#33-38)
    "win_rank",
    "win_lag_lead",
    "win_running",
    "win_sliding_frame",
    "win_range_frame",
    "win_ntile_first_last",
    # §2.6 sorts (#39-41)
    "sort_multi",
    "topk",
    "topk_per_group",
    # §2.7 set ops (#42-45)
    "set_union_all",
    "set_union_distinct",
    "set_intersect",
    "set_except",
    # §2.8 scalar functions (#46-51)
    "fn_string",
    "fn_date",
    "fn_math",
    "fn_array",
    "fn_map_from_json",
    "fn_json_build",
    # §2.9 streaming semantics (#52-57)
    "stream_tumbling",
    "stream_sliding",
    "stream_session",
    "stream_watermark_late",
    "stream_dedup_keyed",
    "stream_stateful_counts",
    # §2.10 LLM-pipeline ops (#58-66)
    "dedup_exact",
    "dedup_near_minhash",
    "sim_cosine_topk",
    "sim_knn_per_query",
    "sim_ann_lsh",
    "text_tokenize_counts",
    "text_tfidf_topterms",
    "text_lang_stats",
    "multimodal_join",
    # §2.11 UDF families (#67-69)
    "udf_scalar_pandas",
    "udaf_grouped_agg",
    "udtf_apply_in_pandas",
)

EXTENSION_ORDER: tuple[str, ...] = (
    # hash-checked extensions first
    "source_orc",
    "source_text",
    "join_null_safe",
    "win_percent_cume",
    "fn_bitwise",
    "fn_regex",
    "text_lang_id",
    "text_quality_score",
    "text_fingerprint",
    "text_token_bpe_count",
    "dedup_embedding_cosine",
    "dedup_embedding_ann",
    "dedup_ngram_jaccard",
    "agg_approx_quantile",
    "text_pack_sequences",
    "text_contamination_check",
    "pipeline_corpus_clean",
    "ts_gap_fill",
    "udtf_python_lateral",
    "q_shipping_priority",
    "q_local_supplier_volume",
    "q_returned_items",
    "sample_split",
    "join_skew_salted",
    "join_bucketed",
    "etl_incremental",
    # rows-only extensions last
    "sim_ann_ivf",
    "dedup_simhash",
    "multimodal_decode",
    "multimodal_frame_sample",
    "multimodal_audio_features",
    "stream_demo_tumbling",
    "stream_demo_stateful",
    # round-3 additions (hash-checked)
    "join_interval_overlap",
    "text_unigram_lm_score",
    "dedup_cluster_keeper",
    "text_pii_scrub",
    "text_repetition_filter",
    "events_funnel",
    "etl_scd2_history",
    "attribution_last_touch",
    "embeddings_centroid",
    "win_streak_gaps_islands",
    "data_profile",
    "agg_histogram",
    "stats_corr_matrix",
    "events_retention_cohort",
    "q_top_suppliers",
    "corpus_mix_weights",
    "subquery_exists",
    "subquery_in_having",
    "subquery_scalar_correlated",
    "subquery_not_exists_inactive",
    "join_lateral_topk",
    "subquery_not_in_null_aware",
    "agg_percentile_exact",
    "agg_mode_deterministic",
    "agg_skew_kurt",
    "agg_listagg_ordered",
    "stats_zscore_outliers",
    "sample_stratified",
    "text_bigram_topk",
    "embeddings_class_separation",
    "ts_mad_outliers",
    # round-4 additions (hash-checked)
    "agg_filter_clause",
    "agg_minmax_by",
    "agg_bool_bit",
    "agg_count_distinct_multi",
    "agg_regression_ols",
    "unpivot_metrics",
    "explode_token_positions",
    "events_transition_matrix",
    "events_cum_distinct_users",
    "join_asof_forward",
    "ts_ohlc_bars",
    "graph_connected_components",
    "skyline_pareto",
    "embedding_int8_quantize",
    "embedding_matryoshka_energy",
    "dedup_fuzzy_levenshtein",
    "text_zipf_slope",
    "dq_expectations",
    "etl_merge_upsert",
    "source_schema_evolution",
    "q_order_count_distribution",
    "q_promo_share",
    "q_small_quantity_revenue",
    "win_qualify_latest",
    "join_existence_flags",
    "events_ab_lift",
    "stats_chi2_independence",
    "ts_ewma_halflife",
    "text_vocab_coverage",
    "fn_url_parse",
    "fn_calendar_buckets",
    "text_dedup_prefix",
    "events_error_rate_anomaly",
    "q_national_market_share",
    "win_time_range_frame",
    "etl_partition_overwrite",
    "scan_corrupt_records",
    "pipeline_daily_etl",
    "pipeline_feature_store",
    "set_intersect_except_all",
    "fn_try_safe",
    "agg_grouping_id",
    "api_sql_frontend",
    "join_asof_nearest",
    "text_lang_overlap_jaccard",
    "agg_approx_topk",
    "stream_demo_session",
    "stream_demo_static_join",
    "multimodal_image_thumbnail",
    "sketch_hll_mergeable",
    # round-5 additions (hash-checked first, then rows-only)
    "plan_cbo_multiway",
    "sample_reservoir_per_key",
    "agg_equi_depth_histogram",
    "scan_metadata_columns",
    "text_chunk_fixed_overlap",
    "etl_snapshot_diff",
    "agg_weighted_percentile",
    "join_point_in_time_scd2",
    "events_windowed_funnel",
    "corpus_quality_gate_report",
    "events_sessionize",
    "events_max_concurrent",
    "basket_brand_pairs_lift",
    "join_bloom_runtime",
    "etl_zorder_clustering",
    "join_dpp_partitioned",
    "etl_incremental_rollup_merge",
    "etl_compact_small_files",
    "api_sql_registered_udf",
    "events_pattern_funnel_runs",
    "join_hinted_strategies",
    "sample_weighted_priority",
    "agg_skew_salted_distinct",
    "stats_winsorized_mean",
    "stream_demo_rate_source",
    "graph_triangle_count",
    "graph_pagerank",
    "stats_ttest_welch",
    "stats_rank_sum_u",
    "events_rfm_segmentation",
    "attribution_position_weighted",
    "ts_resample_interpolate",
    "spatial_grid_join",
    "stream_demo_stream_join",
    "ts_seasonal_naive_eval",
    "dq_skew_report",
    "features_hashing_trick",
    "customer_survival_km",
    "graph_bfs_hops",
    "win_rolling_distinct_users",
    "stats_ols_multivariate",
    "win_sliding_median",
    "text_collocations_pmi",
    "stats_gini_lorenz",
    "stats_benford_first_digit",
    "win_ratio_to_report",
    "events_dau_wau_mau",
    "fn_nested_struct_ops",
    "events_cohort_ltv",
    "stats_bootstrap_poisson_ci",
    "graph_kcore_peel",
    # round-6 additions (operators/round6_ops.py)
    "agg_exact_quantiles_global",
    "embedding_matryoshka_quality",
    "dedup_url_canonicalize",
    "text_ngram_novelty",
    "join_asof_tolerance",
    "events_bounce_rate",
    "fn_intervals_overlap_merge",
    "dq_referential_integrity",
    "etl_gdpr_delete_propagation",
    "stream_demo_foreachbatch_merge",
    "api_sql_recursive_cte",
    "anon_k_anonymity_report",
    "graph_jaccard_link_prediction",
    # round-6 additions (operators/tpch_extra6.py — the TPC-H completion set)
    "q_forecast_revenue",
    "q_volume_shipping",
    "q_product_type_profit",
    "q_parts_supplier_relationship",
    "q_large_volume_customer",
    "q_discounted_revenue",
    "q_global_sales_opportunity",
    # round-6 additions (operators/round6b_ops.py — sketches, drift, encoding)
    "sketch_cms_frequency",
    "sketch_kmv_distinct",
    "stats_psi_drift",
    "features_target_encoding",
    # round-6 additions (operators/round6c_ops.py)
    "anon_l_diversity",
    "graph_label_propagation",
    "stats_ks_two_sample",
    "ts_cross_correlation",
    # round-6 additions (operators/round6d_ops.py)
    "sim_mmr_rerank",
    "stats_mann_kendall_trend",
    "agg_theil_index",
    "events_user_lifecycle",
    # round-6 additions (operators/round6e_ops.py)
    "stats_cusum_changepoint",
    "events_top_paths",
    # round-6 additions (operators/round6f_ops.py — stats/structure completions)
    "stats_spearman_corr",
    "stats_anova_f",
    "stats_mutual_information",
    "graph_degree_assortativity",
    "ts_seasonal_decompose",
    "spatial_knn_grid",
    # round-7 additions (operators/round7_ops.py)
    "text_bm25_rank",
    "cluster_kmeans_lloyd",
    "dedup_consensus",
    # round-7 additions (operators/round7b_ops.py)
    "dedup_semantic_cluster",
    "embedding_pca_power",
    # round-7 additions (operators/round7c_ops.py)
    "events_markov_kstep",
    "anon_ldp_frequency",
    "graph_harmonic_centrality",
    # round-7 additions (operators/round7d_ops.py)
    "ts_double_exponential_forecast",
    "stats_theil_sen_trend",
    "features_woe_iv",
    "sketch_bloom_filter",
    # round-7 additions (operators/round7e_ops.py)
    "events_uplift_cuped",
    "stats_permutation_test",
    "text_rake_keywords",
    "multimodal_shot_boundary",
    # round-7 additions (operators/round7f_ops.py)
    "ts_anomaly_esd",
    "dedup_incremental_batch",
    "anon_dp_geometric_histogram",
    "sketch_theta_intersection",
    # round-7 additions (operators/round7g_ops.py)
    "events_funnel_latency",
    "text_containment_dedup",
    "graph_community_modularity",
    # round-7 additions (operators/round7h_ops.py)
    "text_bigram_lm_perplexity",
    "dedup_substring_spans",
    "anon_t_closeness",
    "ts_autocorrelation",
    # round-7 additions (operators/round7i_ops.py)
    "cluster_silhouette",
    "ts_periodogram",
    "features_target_encoding_loo",
    "stats_kendall_tau",
    # round-7 additions (operators/round7j_ops.py — ML-evaluation tier)
    "ml_roc_auc",
    "ml_calibration_bins",
    "ml_gains_deciles",
    "stats_kruskal_wallis",
    # round-7 additions (operators/round7k_ops.py)
    "sim_rrf_fusion",
    "agg_percentile_cont",
    "text_char_entropy",
    "stats_levene_bf",
    # round-7 additions (operators/round7l_ops.py)
    "ml_conformal_interval",
    "embedding_knn_outlier",
    "events_burstiness",
    "ts_rolling_regression",
    # round-7 additions (operators/round7m_ops.py)
    "ml_pr_auc",
    "ml_ndcg_retrieval",
    "ml_threshold_sweep",
    "text_textrank_keywords",
    # round-7 additions (operators/round7n_ops.py)
    "spatial_hotspot_clusters",
    "embedding_binary_hamming",
    "stats_wilcoxon_signed_rank",
    "sim_more_like_this",
    # round-7 additions (operators/round7o_ops.py)
    "stats_friedman",
    "sample_balanced_downsample",
    # round-8 additions (operators/round8_ops.py)
    "sketch_kll_quantiles",
    "sketch_kll_merge",
    "dedup_semantic_recall",
    # round-9 additions (operators/round9_ops.py)
    "sketch_kll_partitioned_rollup",
    # round-10 additions (operators/round10_ops.py)
    "dedup_minhash_recall",
    "dedup_simhash_recall",
    "sim_ann_recall",
    # round-10b additions (operators/round10b_ops.py)
    "graph_hits_scores",
    "sim_pq_adc",
    "sim_pq_ivf_adc",
    "text_bpe_train_merges",
    "text_bpe_encode",
    # round-10c additions (operators/round10c_ops.py)
    "graph_personalized_pagerank",
    "corpus_temperature_mix",
    "text_boilerplate_ngrams",
    "dedup_minhash_param_sweep",
    # round-10d additions (operators/round10d_ops.py)
    "pipeline_dedup_funnel",
    "ml_brier_decomposition",
    "ts_holt_winters_forecast",
    # round-10e additions (operators/round10e_ops.py)
    "sim_ivf_nprobe_sweep",
    # round-10f additions (operators/round10f_ops.py)
    "corpus_apportion_budget",
    "ml_auc_delong_ci",
    # --- round 11 additions ---
    "ml_cohens_kappa",
    "stats_fleiss_kappa",
    "ml_mcnemar_paired",
    "events_power_mde",
    "dedup_jaccard_histogram",
    "text_heaps_law_fit",
    "text_log_odds_domain_terms",
    "sim_lsh_radius_sweep",
    "text_bpe_compression_by_lang",
    "stats_krippendorff_alpha",
    "stats_cochran_q",
    "events_srm_check",
    "corpus_dedup_survivorship",
    # --- round 12 additions ---
    "dedup_semdedup_eps",
    "ann_recall_under_churn",
    "text_quality_threshold_sweep",
    "corpus_mix_alpha_sweep",
    "ann_ivf_imbalance",
    # --- round 13 additions ---
    "stream_demo_sliding",
    "stream_demo_watermark_late",
    "stream_demo_dedup",
)


#: Driver-facing rotation (regenerated every round). The driver's
#: CORRECTNESS artifact records at most 50 entries per round in
#: ``queries()`` order; the rotation front-loads evidence that is stale
#: IN KIND, not merely old (VERDICT r8 item 2): (1) queries never
#: recorded in any committed CORRECTNESS_r*.json (new code first);
#: (2) queries whose last driver row is rows-only but which now carry a
#: DuckDB oracle (a hash row is available but never recorded); (3)
#: queries whose defining source file changed — by git commit or
#: working-tree edit — after the artifact carrying their latest row
#: (whatever the driver hashed is not what the repo now runs): the
#: VERDICT-named carryover set leads, then edits ordered newest
#: artifact-round first with stalest row breaking ties; then (4)
#: everything else by (driver-row count, round of most recent row)
#: ascending, so plain re-recording slots go to the stalest evidence.
#: Regenerate with ``python tools/gen_driver_order.py --write``.
#: REGENERATION CADENCE (r13 ADVICE): the committed tuple is written
#: once per round, at FREEZE, after all source edits — so that the
#: changed-since-last-driver-row bucket reflects the tree the driver
#: will actually run. Mid-round (and right after a new
#: CORRECTNESS_r{N}.json lands) the tuple therefore lags its
#: generator's would-be output; that is by design, not drift.
DRIVER_ORDER: tuple[str, ...] = (
    # --- VERDICT-pinned re-evidence (2) ---
    "agg_percentile_cont",
    "stats_theil_sen_trend",
    # --- changed since last driver row (36) ---
    "text_collocations_pmi",
    "text_rake_keywords",
    "ts_holt_winters_forecast",
    "dedup_minhash_param_sweep",
    "graph_personalized_pagerank",
    "corpus_dedup_survivorship",
    "dedup_embedding_ann",
    "dedup_simhash_recall",
    "graph_community_modularity",
    "ml_auc_delong_ci",
    "sim_ann_ivf",
    "sim_ann_lsh",
    "sim_lsh_radius_sweep",
    "stats_cusum_changepoint",
    "stats_kruskal_wallis",
    "graph_label_propagation",
    "dedup_near_minhash",
    "dedup_simhash",
    "dedup_embedding_cosine",
    "dedup_jaccard_histogram",
    "dedup_minhash_recall",
    "sim_ann_recall",
    "sim_cosine_topk",
    "sim_knn_per_query",
    "sim_pq_ivf_adc",
    "ann_ivf_imbalance",
    "ann_recall_under_churn",
    "dedup_semdedup_eps",
    "agg_equi_depth_histogram",
    "basket_brand_pairs_lift",
    "etl_merge_upsert",
    "stream_demo_dedup",
    "stream_demo_sliding",
    "stream_demo_watermark_late",
    "data_profile",
    "text_ngram_novelty",
    # --- 1 driver row(s), last in r3 ---
    "pipeline_corpus_clean",
    "stream_dedup_keyed",
    "stream_session",
    "stream_sliding",
    "stream_stateful_counts",
    "stream_tumbling",
    "stream_watermark_late",
    "text_contamination_check",
    "text_fingerprint",
    "text_lang_id",
    "text_lang_stats",
    "text_pack_sequences",
    "text_pii_scrub",
    "text_quality_score",
    "text_repetition_filter",
    "text_tfidf_topterms",
    "text_token_bpe_count",
    "text_tokenize_counts",
    "text_unigram_lm_score",
    "win_percent_cume",
    "win_streak_gaps_islands",
    # --- 1 driver row(s), last in r4 ---
    "agg_bool_bit",
    "agg_count_distinct_multi",
    "agg_filter_clause",
    "agg_minmax_by",
    "agg_regression_ols",
    "explode_token_positions",
    "join_lateral_topk",
    "q_national_market_share",
    "q_order_count_distribution",
    "q_promo_share",
    "q_small_quantity_revenue",
    "subquery_exists",
    "subquery_in_having",
    "subquery_not_exists_inactive",
    "subquery_not_in_null_aware",
    "subquery_scalar_correlated",
    "text_bigram_topk",
    "unpivot_metrics",
    # --- 1 driver row(s), last in r5 ---
    "agg_approx_topk",
    "agg_grouping_id",
    "api_sql_frontend",
    "dq_skew_report",
    "etl_partition_overwrite",
    "etl_snapshot_diff",
    "features_hashing_trick",
    "join_point_in_time_scd2",
    "pipeline_daily_etl",
    "pipeline_feature_store",
    "plan_cbo_multiway",
    "scan_corrupt_records",
    "scan_metadata_columns",
    "set_intersect_except_all",
    "sketch_hll_mergeable",
    "spatial_grid_join",
    "stats_winsorized_mean",
    "win_time_range_frame",
    # --- 1 driver row(s), last in r6 ---
    "agg_theil_index",
    "anon_k_anonymity_report",
    "api_sql_recursive_cte",
    "customer_survival_km",
    "dedup_url_canonicalize",
    "embedding_matryoshka_quality",
    "etl_gdpr_delete_propagation",
    "events_bounce_rate",
    "events_user_lifecycle",
    "features_target_encoding",
    "fn_intervals_overlap_merge",
    "fn_nested_struct_ops",
    "join_asof_tolerance",
    "q_discounted_revenue",
    "q_forecast_revenue",
    "q_global_sales_opportunity",
    "q_large_volume_customer",
    "q_parts_supplier_relationship",
    "q_product_type_profit",
    "q_volume_shipping",
    "stats_bootstrap_poisson_ci",
    "stats_mann_kendall_trend",
    "stats_ols_multivariate",
    "stats_psi_drift",
    "stream_demo_rate_source",
    "stream_demo_session",
    # --- 1 driver row(s), last in r7 ---
    "anon_dp_geometric_histogram",
    "anon_t_closeness",
    "dedup_incremental_batch",
    "dedup_substring_spans",
    "features_target_encoding_loo",
    "graph_harmonic_centrality",
    "spatial_knn_grid",
    "stats_anova_f",
    "stats_kendall_tau",
    "stats_levene_bf",
    "stats_spearman_corr",
    "text_bigram_lm_perplexity",
    "text_char_entropy",
    "ts_autocorrelation",
    "ts_periodogram",
    "ts_seasonal_decompose",
    # --- 1 driver row(s), last in r8 ---
    "sample_balanced_downsample",
    # --- 1 driver row(s), last in r10 ---
    "ml_brier_decomposition",
    "text_bpe_train_merges",
    # --- 1 driver row(s), last in r11 ---
    "events_power_mde",
    "events_srm_check",
    "ml_cohens_kappa",
    "ml_mcnemar_paired",
    "stats_cochran_q",
    "stats_fleiss_kappa",
    "stats_krippendorff_alpha",
    "text_bpe_compression_by_lang",
    "text_log_odds_domain_terms",
    # --- 1 driver row(s), last in r12 ---
    "corpus_mix_alpha_sweep",
    "text_quality_threshold_sweep",
    # --- 2 driver row(s), last in r8 ---
    "agg_approx_quantile",
    "fn_bitwise",
    "fn_json_build",
    "join_bucketed",
    "join_skew_salted",
    "multimodal_decode",
    "q_local_supplier_volume",
    "q_returned_items",
    "q_shipping_priority",
    "sample_split",
    "scan_projected",
    "set_except",
    "set_intersect",
    "set_union_all",
    "set_union_distinct",
    "sink_parquet",
    "sink_partitioned",
    "source_csv",
    "source_json",
    "topk",
    "topk_per_group",
    "win_lag_lead",
    "win_ntile_first_last",
    "win_range_frame",
    "win_rank",
    "win_running",
    "win_sliding_frame",
    # --- 2 driver row(s), last in r9 ---
    "attribution_position_weighted",
    "embedding_binary_hamming",
    "events_ab_lift",
    "events_burstiness",
    "events_cohort_ltv",
    "events_rfm_segmentation",
    "events_uplift_cuped",
    "fn_calendar_buckets",
    "fn_url_parse",
    "join_existence_flags",
    "ml_calibration_bins",
    "ml_conformal_interval",
    "ml_ndcg_retrieval",
    "ml_pr_auc",
    "multimodal_audio_features",
    "multimodal_frame_sample",
    "multimodal_image_thumbnail",
    "sketch_kll_quantiles",
    "stats_chi2_independence",
    "stats_permutation_test",
    "stream_demo_stateful",
    "stream_demo_tumbling",
    "text_containment_dedup",
    "ts_ewma_halflife",
    "ts_resample_interpolate",
    "ts_seasonal_naive_eval",
    "win_qualify_latest",
    "win_ratio_to_report",
    "win_rolling_distinct_users",
    "win_sliding_median",
    # --- 2 driver row(s), last in r10 ---
    "corpus_quality_gate_report",
    "dedup_fuzzy_levenshtein",
    "features_woe_iv",
    "ml_gains_deciles",
    "ml_roc_auc",
    "multimodal_shot_boundary",
    "sketch_bloom_filter",
    "sketch_kll_partitioned_rollup",
    "stats_benford_first_digit",
    "stats_ttest_welch",
    "text_chunk_fixed_overlap",
    "text_dedup_prefix",
    "text_lang_overlap_jaccard",
    "text_zipf_slope",
    "ts_double_exponential_forecast",
    "ts_rolling_regression",
    # --- 2 driver row(s), last in r11 ---
    "corpus_apportion_budget",
    "corpus_temperature_mix",
    "embeddings_centroid",
    "embeddings_class_separation",
    "events_top_paths",
    "stats_gini_lorenz",
    "text_boilerplate_ngrams",
    "text_bpe_encode",
    # --- 2 driver row(s), last in r12 ---
    "agg_histogram",
    "attribution_last_touch",
    "corpus_mix_weights",
    "etl_incremental",
    "etl_scd2_history",
    "events_funnel",
    "events_retention_cohort",
    "fn_regex",
    "q_top_suppliers",
    "text_heaps_law_fit",
    # --- 2 driver row(s), last in r13 ---
    "agg_listagg_ordered",
    "agg_mode_deterministic",
    "agg_percentile_exact",
    "agg_skew_kurt",
    "agg_skew_salted_distinct",
    "agg_weighted_percentile",
    "api_sql_registered_udf",
    "dq_expectations",
    "embedding_int8_quantize",
    "embedding_matryoshka_energy",
    "etl_compact_small_files",
    "etl_incremental_rollup_merge",
    "etl_zorder_clustering",
    "events_cum_distinct_users",
    "events_error_rate_anomaly",
    "events_max_concurrent",
    "events_pattern_funnel_runs",
    "events_sessionize",
    "events_transition_matrix",
    "events_windowed_funnel",
    "graph_connected_components",
    "join_asof_forward",
    "join_asof_nearest",
    "join_bloom_runtime",
    "join_dpp_partitioned",
    "join_hinted_strategies",
    "sample_reservoir_per_key",
    "sample_stratified",
    "sample_weighted_priority",
    "skyline_pareto",
    "source_orc",
    "source_schema_evolution",
    "source_text",
    "stats_corr_matrix",
    "stats_zscore_outliers",
    "ts_gap_fill",
    "ts_mad_outliers",
    "ts_ohlc_bars",
    "udaf_grouped_agg",
    "udf_scalar_pandas",
    "udtf_apply_in_pandas",
    "udtf_python_lateral",
    # --- 2 driver row(s), last in r14 ---
    "agg_exact_quantiles_global",
    "anon_ldp_frequency",
    "cluster_silhouette",
    "dedup_semantic_cluster",
    "dq_referential_integrity",
    "embedding_pca_power",
    "events_markov_kstep",
    "fn_try_safe",
    "graph_bfs_hops",
    "graph_degree_assortativity",
    "graph_jaccard_link_prediction",
    "graph_kcore_peel",
    "graph_pagerank",
    "graph_triangle_count",
    "join_interval_overlap",
    "pipeline_dedup_funnel",
    "sim_ivf_nprobe_sweep",
    "sim_mmr_rerank",
    "sim_rrf_fusion",
    "sketch_cms_frequency",
    "sketch_kmv_distinct",
    "sketch_theta_intersection",
    "stats_friedman",
    "stats_mutual_information",
    "stream_demo_foreachbatch_merge",
    "ts_anomaly_esd",
    # --- 3 driver row(s), last in r10 ---
    "dedup_consensus",
    "text_bm25_rank",
    # --- 3 driver row(s), last in r11 ---
    "anon_l_diversity",
    "dedup_cluster_keeper",
    "dedup_ngram_jaccard",
    "sort_multi",
    "stats_ks_two_sample",
    "text_vocab_coverage",
    "ts_cross_correlation",
    # --- 3 driver row(s), last in r12 ---
    "agg_approx_distinct",
    "agg_collect",
    "agg_cube",
    "agg_distinct",
    "agg_global",
    "agg_grouping_sets",
    "agg_having",
    "agg_rollup",
    "agg_stats",
    "fn_array",
    "fn_date",
    "fn_map_from_json",
    "fn_math",
    "fn_string",
    "join_anti",
    "join_asof",
    "join_broadcast",
    "join_inner",
    "join_multiway",
    "join_outer",
    "join_range",
    "join_semi",
    "join_theta",
    "pivot",
    "self_join",
    "sim_pq_adc",
    # --- 3 driver row(s), last in r13 ---
    "scan_parquet",
    # --- 3 driver row(s), last in r14 ---
    "case_when",
    "dedup_semantic_recall",
    "embedding_knn_outlier",
    "events_dau_wau_mau",
    "events_funnel_latency",
    "filter_like",
    "filter_null",
    "filter_pred",
    "join_null_safe",
    "ml_threshold_sweep",
    "multimodal_join",
    "project_derive",
    "sim_more_like_this",
    "sketch_kll_merge",
    "spatial_hotspot_clusters",
    "stats_rank_sum_u",
    "stats_wilcoxon_signed_rank",
    "stream_demo_static_join",
    "stream_demo_stream_join",
    "text_textrank_keywords",
    # --- 4 driver row(s), last in r11 ---
    "dedup_exact",
    # --- 4 driver row(s), last in r13 ---
    "graph_hits_scores",
    # --- 4 driver row(s), last in r14 ---
    "agg_groupby",
    "cluster_kmeans_lloyd",
)


def canonical_names() -> tuple[str, ...]:
    return SURVEY_ORDER + EXTENSION_ORDER


def ordered_registry() -> dict[str, QuerySpec]:
    """REGISTRY re-keyed into the driver-facing order (DRIVER_ORDER —
    the never-driver-recorded queries first; see that constant's note).

    Every canonical name must be registered; names registered but not in
    the canonical lists are appended at the end rather than dropped, so a
    forgotten list entry degrades ordering, never coverage.
    """
    missing = [n for n in canonical_names() if n not in REGISTRY]
    if missing:
        raise KeyError(f"canonical queries not registered: {missing}")
    out = {n: REGISTRY[n] for n in DRIVER_ORDER if n in REGISTRY}
    for n in canonical_names():
        if n not in out:
            out[n] = REGISTRY[n]
    for n, spec in REGISTRY.items():
        if n not in out:
            out[n] = spec
    return out


def load_all_operators() -> None:
    """Import every operator module so registration side effects run."""
    import python_etl_sample_spark.operators  # noqa: F401
    import python_etl_sample_spark.functions  # noqa: F401
    import python_etl_sample_spark.streaming  # noqa: F401
