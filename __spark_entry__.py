"""Driver contract for the spark-graft builder (PySpark target).

Wired to the cascade_spark declared-query registry: every operator from
SURVEY.md §2B registers a named (spark builder, DuckDB oracle) pair via
``cascade_spark.plans.registry.register``; this module just exposes them
in the driver's shape.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

# importable regardless of the harness's working directory
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    from cascade_spark.plans.registry import load_all

    return load_all()["agg_grouped_q1"].builder(spark, "/root/testdata/sf0.001")


# Driver-sample ordering for ROUND 8 (the driver's CORRECTNESS sampling
# is partial, ~50 of the registry, taken from the front of queries()):
# (1) queries added this round (including the two re-blocked embedding
# dedup queries whose semantics changed), then (2) a rotation slice of
# queries with NO green driver row in any CORRECTNESS_r0*.json —
# burning down the never-sampled tail per the round-7 verdict. The full
# registry stays oracle-gated in pytest (tests/test_oracle.py).
_NEW_THIS_ROUND: list[str] = [
    # -- (1) new or semantics-changed this round --
    # round-8 wave 25
    "stats_g_test",
    "stats_poisson_dispersion",
    "graph_rich_club",
    "multimodal_image_grayscale",
    "text_pmi_collocations",
    # round-8 wave 24
    "stats_mcc_matthews",
    "stats_cochran_armitage",
    "scan_text_wholetext",
    # round-8 wave 23
    "stats_cvm_two_sample",
    "pipeline_greedy_coverage",
    # round-8 wave 22
    "udtf_arrow_ngram_expand",
    # round-8 wave 21
    "multimodal_wav_mulaw",
    "agg_kmv_distinct_sketch",
    # round-8 wave 20
    "stats_icc_oneway",
    "pipeline_group_kfold",
    # round-8 wave 19
    "events_intervention_its",
    "dedup_overmerge_audit",
    # round-8 wave 18
    "stats_ljung_box",
    # round-8 wave 17
    "graph_modularity_score",
    "pipeline_chunk_overlap_windows",
    # round-8 wave 16
    "stats_wilson_interval",
    "events_bounce_rate_by_entry",
    "bus_seek_by_timestamp",
    # round-8 wave 15
    "multimodal_image_rotate",
    # round-8 wave 14
    "events_kaplan_meier",
    "events_cuped_variance_reduction",
    "stats_sample_size_two_proportions",
    # round-8 wave 13
    "similarity_dedup_threshold_sweep",
    "pipeline_rejection_sampling",
    "events_seasonality_strength",
    # round-8 wave 12
    "stats_bh_fdr",
    "stats_mantel_haenszel",
    "text_garbage_score",
    "pipeline_largest_remainder_alloc",
    # round-8 waves 10-11
    "graph_local_clustering",
    "events_markov_stationary",
    "text_flesch_reading_ease",
    "pipeline_quota_sampling",
    "similarity_retrieval_metrics",
    "events_holt_linear_forecast",
    "dedup_cdc_chunks",
    # round-8 wave 9 (inference statistics)
    "stats_kendall_tau_b",
    "stats_hodges_lehmann",
    "stats_mood_median",
    "stats_friedman",
    "stats_sign_test",
    "stats_cohens_kappa",
    "stats_durbin_watson",
    "stats_odds_ratio",
    # round-8 waves 4-8
    "text_burstiness",
    "stats_cochran_q",
    "pipeline_bestfit_packing",
    "stats_mcnemar",
    "stream_neardup_gate",
    "graph_label_propagation",
    "text_rake_keywords",
    "stats_runs_test",
    "stats_capture_recapture",
    "stats_good_turing",
    "stats_anova_oneway",
    "stats_effect_sizes",
    "pipeline_passage_dedup",
    "embedding_matryoshka_energy",
    "similarity_reciprocal_rank_fusion",
    "events_max_drawdown",
    # earlier round-8 waves
    "embedding_neardup_blocked",
    "similarity_semantic_dedup",
    "profile_lsh_bucket_pairs",
    "embedding_lsh_recall_audit",
    "stats_kruskal_wallis",
    "graph_bfs_hops",
    "stream_stateful_topk",
    "multimodal_image_crop_tile",
    "embedding_pca_power_iteration",
    "pipeline_ccnet_ppl_buckets",
    "pipeline_quality_threshold_sweep",
    "stats_brown_forsythe",
    "stream_scd2_dim_join",
    "scan_text_gzip_nonsplittable",
    "window_rolling_median",
    "stats_permutation_test",
    "events_diff_in_differences",
    "scan_parquet_metadata_columns",
    "text_langid_prf_audit",
    "stats_jackknife_variance",
    "bus_consumer_group_assignment",
    "udf_pandas_window_agg",
    "fn_binary_encoding_roundtrip",
    "pipeline_preference_pairs",
    "pipeline_span_corruption",
    "text_bigram_novelty",
    "multimodal_wav_zero_crossings",
    "events_feature_drift_psi",
    "graph_degree_assortativity",
    "agg_approx_top_k",  # k-boundary tie fix this round
    "text_char_ngram_profile",  # short-doc guard this round
    "stream_rate_micro_batch",  # awaitTermination guard this round
    "multimodal_decode",  # PIL probe removal this round
    # -- (2) never-sampled rotation (no CORRECTNESS_r0* green row) --
    "agg_bool_flags",
    "agg_collated_group",
    "agg_correlation",
    "agg_deciles_disc",
    "agg_filtered_conditional",
    "agg_group_by_all",
    "agg_grouping_id",
    "agg_median_mode",
    "agg_string_concat_ordered",
    "agg_trend_regression",
    "analytics_abc_pareto",
    "analytics_frequent_itemsets",
    "analytics_rfm_segmentation",
    "analytics_yoy_growth",
    "bus_consumer_lag",
    "bus_index_dump",
    "bus_sink_batch_write",
    "bus_sink_stream_roundtrip",
    "bus_source_batch_scan",
    "bus_source_offset_seek",
    "bus_stream_windowed_agg",
    "catalog_global_temp_view",
    "catalog_managed_table_dml",
    "catalog_multi_topic_counts",
    "dedup_dupspan_ngrams",
    "dedup_keep_best",
    "embedding_centroid_per_label",
    "embedding_norm_audit",
    "events_activity_streaks",
    "events_anomaly_mad",
]

_ROUND7_LIST: list[str] = [
    # -- (1) new this round --
    "rollup_bitmap_distinct_incremental",
    "events_slo_burn_rate",
    "stream_state_changelog",
    "bus_orphan_segment_audit",
    "text_source_similarity_hashed",
    "events_conversion_latency",
    "pii_format_preserving_mask",
    "agg_percentile_approx_exact_regime",
    "similarity_lsh_multiprobe",
    "stream_rate_micro_batch",
    "sql_default_columns",
    "scan_parquet_codec_matrix",
    "fn_try_sum_overflow",
    "window_named_window_clause",
    "pipeline_shard_rendezvous",
    "scan_jdbc_roundtrip",
    "scan_jdbc_pushdown",
    "graph_degree_histogram",
    "stats_mwu_pairwise_matrix",
    "subquery_not_in_null_trap",
    "text_feature_hashing",
    "agg_histogram_equi_depth",
    "pipeline_epoch_shuffle_audit",
    "multimodal_image_equalize",
    "multimodal_wav_downsample",
    "join_dynamic_partition_pruning",
    "stats_theil_sen_trend",
    "fn_luhn_check",
    "sql_pipe_lateral_having",
    "fn_number_format_roundtrip",
    "similarity_range_query",
    "stats_mann_kendall_trend",
    "sink_file_size_targeting",
    "dedup_minhash_1bit",
    "scan_parquet_bloom_filter",
    "maintenance_minmax_pruning_audit",
    "sql_session_variables",
    "agg_listagg_within_group",
    "fn_interval_arithmetic",
    "similarity_mips_norm_bound",
    "embedding_quantization_error_audit",
    "stream_state_store_read",
    "stream_state_metadata_audit",
    "stream_progress_audit",
    "stream_rocksdb_state_store",
    "pipeline_dataset_diff",
    "agg_approx_top_k",
    "pii_l_diversity_audit",
    "sql_execute_immediate",
    "sql_table_valued_udf",
    "stats_welch_ttest",
    "stats_cramers_v",
    "text_char_ngram_profile",
    # -- (2) round-6 additions, never driver-recorded --
    "profile_shingle_df",
    "stats_spearman_rho",
    "udtf_polymorphic_analyze",
    "scan_xml_roundtrip",
    "sink_rebalanced_write",
    "sql_identifier_clause",
    "stream_update_mode_changelog",
    "stats_quantile_bands_exact",
    "stream_late_data_audit",
    "window_running_distinct",
    "pipeline_stage_funnel",
    "text_vocab_coverage_curve",
    "text_tfidf_exact_topk",
    "graph_neighborhood_jaccard",
    "multimodal_image_channel_stats",
    "multimodal_wav_silence_trim",
    "scan_csv_multiline_quoted",
    "events_user_feature_vector",
    "fn_regexp_extract_all",
    "fn_array_set_operations",
    "fn_posexplode_outer",
    "fn_array_safe_access",
    "pipeline_tokenizer_fertility",
    # -- (3) rotation: never sampled in r01-r05 --
    "bus_source_roundtrip",
    "bus_topic_compaction",
    "catalog_partition_pruned_consume",
    "consume_last_event",
    "setop_union",
    "setop_except",
    "sort_topk_per_group",
    "window_ranking",
    "window_frames",
    "udf_pandas_scalar",
    "scan_csv_roundtrip",
    "tpch_q4_order_priority",
    "join_left_semi",
    "multimodal_decode",
    "profile_events",
    # env-gated (register only where the container allows):
    "stream_tws_counter",
    "scan_delta_roundtrip",
]


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""
    from cascade_spark.plans.registry import load_all

    reg = load_all()
    ordered = {n: reg[n].builder for n in _NEW_THIS_ROUND if n in reg}
    ordered.update((n, reg[n].builder) for n in _ROUND7_LIST if n in reg and n not in ordered)
    ordered.update((n, q.builder) for n, q in reg.items() if n not in ordered)
    return ordered


def oracle_sql() -> dict[str, str]:
    """DuckDB-equivalent SQL per query; approx/non-SQL ops are omitted
    (driver records rows-only checks for those)."""
    from cascade_spark.plans.registry import load_all

    return {name: q.oracle for name, q in load_all().items() if q.oracle is not None}
