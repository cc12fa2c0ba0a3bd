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


# Canonical driver-sample ordering (the driver's CORRECTNESS sampling is
# partial, ~50 of the registry, taken from the front of queries()). This
# list is the STATIC oldest-debt-first ordering of every hash-checkable
# query that had not yet been driver-sampled as of round 11; the LIVE
# front is computed per call by _front(): entries already green in any
# CORRECTNESS_r*.json are dropped, and hash-checkable queries added after
# this list was pinned are appended (name-sorted). That makes the front
# self-rebuilding at each round boundary instead of a hand-recomputed pin
# (round-11 verdict item 1 / ADVICE round-11 item 2). Rows-only queries
# (oracle omitted BY DESIGN: approximate or not-SQL-expressible) never
# enter the front so no sample slot is burned on a perpetual `no_oracle`
# row. The full registry stays oracle-gated in pytest
# (tests/test_oracle.py).
_FRONT_ORDER: list[str] = [
    "join_broadcast_left_outer",
    "agg_group_by_all",
    "fn_date_calendar",
    "ingest_consume_roundtrip",
    "consume_last_event",
    "scd2_apply_changes",
    "agg_correlation",
    "pipeline_snapshot_cdc_diff",
    "events_sessionize_gap",
    "setop_union",
    "setop_intersect",
    "setop_except",
    "setop_dedup_keep_first",
    "setop_bag_all_variants",
    "agg_median_mode",
    "fn_bitwise",
    "events_anomaly_zscore",
    "dedup_keep_best",
    "events_time_rollup",
    "events_gapfill_interpolate",
    "agg_filtered_conditional",
    "agg_string_concat_ordered",
    "agg_trend_regression",
    "events_anomaly_mad",
    "stats_quantile_bands_exact",
    "stats_spearman_rho",
    "stats_welch_ttest",
    "stats_cramers_v",
    "stats_kruskal_wallis",
    "stats_brown_forsythe",
    "stats_permutation_test",
    "stats_jackknife_variance",
    "events_feature_drift_psi",
    "similarity_cosine_topk",
    "similarity_ann_lsh",
    "similarity_quantized_topk",
    "similarity_knn_join",
    "sort_topk_global",
    "sort_global_nulls",
    "sort_topk_per_group",
    "subquery_lateral_topn",
    "window_ignore_nulls",
    "agg_bool_flags",
    "fn_url_parse",
    "fn_variant_json",
    "agg_collated_group",
    "scan_csv_permissive_badrecords",
    "agg_grouping_id",
    "events_session_window_batch",
    "fn_xml_extract",
    "fn_aes_roundtrip",
    "events_session_window_dynamic_gap",
    "catalog_global_temp_view",
    "sql_identifier_clause",
    "text_gopher_quality_filter",
    "text_top_word_ratio",
    "text_zipf_topwords",
    "text_lm_commonality",
    "pipeline_ccnet_ppl_buckets",
    "pipeline_quality_threshold_sweep",
    "text_rake_keywords",
    "events_resample_ohlc",
    "events_new_vs_returning",
    "events_ewma_dyadic",
    "events_max_drawdown",
    "tpch_q11_important_stock",
    "tpch_q13_customer_distribution",
    "tpch_q22_global_sales",
    "tpch_q4_order_priority",
    "tpch_q6_forecast_revenue",
    "tpch_q12_priority_class",
    "embedding_centroid_per_label",
    "embedding_norm_audit",
    "similarity_centroid_cosine_matrix",
    "embedding_pca_power_iteration",
    "embedding_matryoshka_energy",
    "window_ranking",
    "window_lag_lead",
    "window_frames",
    "window_time_range_frame",
    "window_running_distinct",
    "window_rolling_median",
    "fn_array_basic",
    "fn_array_higher_order",
    "fn_array_explode",
    "fn_map_struct",
    "fn_json",
    "fn_json_to_json",
    "fn_hash",
    "fn_regexp_extract_all",
    "fn_array_set_operations",
    "fn_posexplode_outer",
    "fn_array_safe_access",
    "fn_string",
    "fn_string_split",
    "fn_datetime",
    "fn_timestamp_parse",
    "fn_math",
    "fn_conditional",
    "fn_cast_format",
    "fn_string_distance",
    "fn_try_arithmetic",
    "fn_binary_encoding_roundtrip",
    "udf_pandas_scalar",
    "udf_grouped_centroid",
    "udtf_chunk_documents",
    "udf_arrow_row",
    "udf_cogrouped_pandas",
    "udf_map_in_arrow",
    "fn_inline_array_structs",
    "udf_grouped_apply_in_arrow",
    "udtf_polymorphic_analyze",
    "udf_pandas_window_agg",
    "scan_csv_roundtrip",
    "scan_json_roundtrip",
    "sink_partitioned",
    "scan_orc_roundtrip",
    "sink_overwrite",
    "scan_schema_evolution",
    "sink_dynamic_partition_overwrite",
    "scan_text_lines",
    "scan_ignore_corrupt_files",
    "scan_csv_multiline_quoted",
    "scan_xml_roundtrip",
    "sink_rebalanced_write",
    "scan_text_gzip_nonsplittable",
    "scan_parquet_metadata_columns",
    "bus_source_roundtrip",
    "bus_source_batch_scan",
    "bus_source_offset_seek",
    "bus_sink_batch_write",
    "bus_sink_stream_roundtrip",
    "bus_stream_windowed_agg",
    "bus_index_dump",
    "bus_topic_compaction",
    "bus_consumer_lag",
    "catalog_partition_pruned_consume",
    "catalog_multi_topic_counts",
    "bus_consumer_group_assignment",
    "stream_tumbling_window",
    "stream_sliding_window",
    "stream_session_window",
    "stream_dedup_watermark",
    "stream_ingest_exactly_once",
    "stream_chained_windows",
    "stream_dedup_within_watermark",
    "stream_late_data_audit",
    "stream_update_mode_changelog",
    "stream_scd2_dim_join",
    "stream_neardup_gate",
    "stream_stream_join",
    "stream_stream_left_outer",
    "stream_rate_source",
    "stream_foreachbatch_sink",
    "stream_foreachbatch_upsert",
    "stream_stateful_counter",
    "stream_stateful_session_timeout",
    "stream_stateful_topk",
    "stats_fleiss_kappa",
    "agg_kmv_jaccard",
    "stats_fisher_exact",
    "stats_yule_q",
    "stats_phi_coefficient",
    "stats_cohens_h",
    "stats_goodman_kruskal_gamma",
    "stats_somers_d",
    "stats_stuart_tau_c",
    "stats_tschuprow_t",
    "events_attribution_time_decay",
    "events_attribution_position_u",
    "events_rsi_wilder",
    "events_bollinger_breach",
    "events_hurst_rs",
    "events_croston_demand",
    "events_holt_winters",
    "events_kleinberg_burst",
    "analytics_supplier_hhi",
    "analytics_repeat_purchase_rate",
    "stats_chi2_goodness_of_fit",
    "multimodal_image_entropy",
    "events_seasonal_index_dow",
    "analytics_pareto_frontier",
    "events_cross_correlation",
    "graph_katz_centrality",
    "graph_adamic_adar",
    "graph_landmark_centrality",
    "graph_bipartite_projection",
    "graph_hits_bipartite",
    "text_bigram_perplexity",
    "pipeline_mixture_kl_uniform",
    "stats_levene_mean",
    "agg_pythagorean_means",
    "stats_roc_auc_exact",
    "stats_calibration_ece",
    "stats_brier_score",
    "stats_gains_table",
    "multimodal_image_sobel",
    "multimodal_image_otsu",
    "multimodal_wav_fade",
    "multimodal_video_motion_energy",
    "multimodal_image_dither_bayer",
    "multimodal_image_boxblur",
    "multimodal_wav_clipping_audit",
    "multimodal_wav_peak_normalize",
    "stats_cliffs_delta",
    "stats_vargha_delaney_a",
    "stats_rank_biserial",
    "stats_cronbach_alpha",
    "stats_page_trend",
    "stats_grubbs_outlier",
    "stats_kuiper_two_sample",
    "stats_weighted_kappa",
    "pii_t_closeness_audit",
    "profile_freshness_lag",
    "profile_pk_uniqueness_audit",
    "similarity_mmr_diversify",
    "stats_sprt_sequential",
    "stats_tost_equivalence",
    "stats_beta_binomial_posterior",
    "experiment_hash_bucketing",
    "sql_values_inline_table",
    "sql_lateral_view_outer",
    "pipeline_tokenizer_compare",
    "dedup_cross_source_matrix",
    "agg_multi_distinct_filtered",
    "agg_arg_extrema",
    "dedup_soft_weighting",
    "text_yule_k",
    "text_simpson_diversity",
    "text_hapax_spectrum",
    "text_heaps_fit",
    "text_unigram_entropy",
    "text_js_divergence_sources",
    "text_bm25_topk",
    "text_inverted_index_query",
    "text_winnowing_fingerprint",
    "events_macd",
    "events_stochastic_oscillator",
    "events_aroon",
    "events_donchian_breakout",
    "events_pettitt_changepoint",
    "events_theil_u",
    "events_ulcer_index",
    "events_kama_efficiency",
    "events_rolling_slope",
    "embedding_isotropy_audit",
    "embedding_dim_variance_topk",
    "similarity_ndcg_eval",
    "similarity_hamming_topk",
    "embedding_label_silhouette",
    "embedding_pq_distortion",
    "embedding_random_projection_jl",
    "bus_delete_records",
    "stats_jonckheere_terpstra",
    "stats_ansari_bradley",
    "stats_hash_uniformity_ks",
    "stats_normalized_mutual_info",
    "events_page_hinkley",
    "text_lix_readability",
    "text_ari_coleman_liau",
    "embedding_knn_label_consistency",
    "analytics_dau_mau_stickiness",
    "sql_group_by_ordinal",
    "stats_seasonal_mann_kendall",
    "embedding_centroid_drift_halves",
    "stats_anderson_darling_2s",
    "agg_theta_sketch_distinct",
    "agg_theta_sketch_setops",
    "fn_time_type",
    "fn_scalar_additions_41",
    "sort_collated_order",
    "stream_state_snapshot_read",
]


def _green_queries() -> set[str]:
    """Names with a fully-green row in any driver CORRECTNESS artifact."""
    import glob
    import json

    repo = os.path.dirname(os.path.abspath(__file__))
    green: set[str] = set()
    for path in sorted(glob.glob(os.path.join(repo, "CORRECTNESS_r*.json"))):
        with open(path) as fh:
            for name, row in json.load(fh).items():
                if (
                    row.get("hash_match")
                    and row.get("rows_match")
                    and row.get("schema_match")
                ):
                    green.add(name)
    return green


def _front(reg) -> list[str]:
    """The live never-driver-sampled tail, oldest debt first.

    Hash-checkable (oracle-bearing) queries with no green driver row,
    ordered by _FRONT_ORDER; queries registered after the pin was taken
    are appended name-sorted so new surface is sampled first-time too.
    """
    green = _green_queries()
    pinned = set(_FRONT_ORDER)
    front = [
        n
        for n in _FRONT_ORDER
        if n in reg and n not in green and reg[n].oracle is not None
    ]
    front += sorted(
        n
        for n in reg
        if n not in pinned and n not in green and reg[n].oracle is not None
    )
    return front


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""
    from cascade_spark.plans.registry import load_all

    reg = load_all()
    ordered = {n: reg[n].builder for n in _front(reg)}
    ordered.update((n, q.builder) for n, q in reg.items() if n not in ordered)
    return ordered


def oracle_sql() -> dict[str, str]:
    """DuckDB-equivalent SQL per query; approx/non-SQL ops are omitted
    (driver records rows-only checks for those)."""
    from cascade_spark.plans.registry import load_all

    return {name: q.oracle for name, q in load_all().items() if q.oracle is not None}
