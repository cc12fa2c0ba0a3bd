"""Empty-input robustness — the degenerate slice every production run
eventually hits (an empty date partition, a filtered-out tenant, a
fresh topic). Every batch operator here must plan and execute cleanly
over zero-row tables with the right schemas, returning an empty (or
scalar-zero) result instead of crashing.

Scoped to builders without staging side effects (bus topics and
streaming fixtures materialize real inputs and are exercised by their
own tests).
"""

from __future__ import annotations

import os
import tempfile

import pytest

from cascade_spark.plans.registry import load_all
from cascade_spark.tables import load

_TABLES = [
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
]

QUERIES = [
    "graph_pagerank", "graph_triangle_count", "join_interval_overlap",
    "events_new_vs_returning", "maintenance_zorder_cluster",
    "events_resample_ohlc", "text_lm_commonality", "join_salted_skew",
    "events_anomaly_mad", "agg_trend_regression", "profile_overlap_buckets",
    "pipeline_interleave_sources", "events_session_window_batch",
    "agg_grouping_id", "pipeline_pretraining_end_to_end", "fn_url_parse",
    "fn_xml_extract", "fn_variant_json", "agg_bool_flags",
    "agg_collated_group", "subquery_lateral_topn", "window_ignore_nulls",
    "multimodal_decode_ppm", "multimodal_decode_wav",
    # late-round-4 batch (stream_stream_left_outer excluded: staging
    # sentinels needs a non-empty time span, like the other stream_*)
    "join_hint_strategies", "sql_parameterized", "setop_union_by_name",
    "agg_bitwise", "stats_crosstab", "stats_correlation",
    "maintenance_file_metadata_audit", "events_activity_streaks",
    "analytics_yoy_growth", "pipeline_curriculum_order",
    "pipeline_token_budget_mixture", "udf_cogrouped_pandas",
    "udf_map_in_arrow", "sink_dynamic_partition_overwrite",
    "stats_skew_kurtosis", "agg_bitmap_distinct",
    "catalog_managed_table_dml", "scan_text_lines",
    "events_funnel_strict_sequence", "window_range_numeric_frame",
    "join_broadcast_left_outer", "pipeline_url_canonical_dedup",
    "fn_inline_array_structs", "agg_group_by_all", "fn_date_calendar",
    "join_fuzzy_editdistance", "events_ewma_dyadic",
    "similarity_centroid_cosine_matrix", "events_trigram_paths",
    "events_session_window_dynamic_gap", "catalog_global_temp_view",
    "pipeline_snapshot_cdc_diff", "scan_ignore_corrupt_files",
    "profile_expectations_report", "agg_deciles_disc",
    "analytics_rfm_segmentation", "analytics_abc_pareto",
    "events_inter_arrival_stats", "events_survival_curve",
    "agg_rollup_share_of_parent", "analytics_association_lift",
    "stats_winsorized_mean", "scan_nested_struct_roundtrip",
    "pipeline_length_grouped_batching", "events_funnel_strict_sequence",
    "pipeline_decontaminate_bloom", "profile_cms_heavy_hitters",
    "events_autocorrelation", "fn_map_higher_order",
    "udf_pandas_grouped_agg", "events_changepoint_cusum",
    "stats_weighted_median", "events_attribution_touch",
    "udtf_table_arg_per_user", "dedup_minhash_error_audit",
    "multimodal_audio_frame_energy", "text_bpe_train",
    "pipeline_quality_classifier", "similarity_hard_negative_mining",
    "dedup_containment_ngram", "events_forecast_seasonal_naive",
    "graph_link_prediction", "pipeline_mixture_temperature",
    "join_asof_forward", "join_asof_tolerance",
    "multimodal_image_resize", "stats_benford_audit",
    "scan_json_permissive_badrecords", "multimodal_video_decode",
    "agg_pivot_dynamic", "events_seasonal_adjusted_anomaly",
    "stats_chisq_independence", "udf_pandas_scalar_iter",
    "subquery_relational_division", "events_peak_concurrency",
    "stats_ab_srm_check", "pipeline_dataset_manifest",
    "sql_udf_create_function", "sql_scripting_batch",
    "pandas_api_rolling_sum", "fn_str_to_map_kv", "text_bpe_encode",
    "dedup_corpus_report", "stats_gini_concentration",
    # round-5 batch
    "profile_graph_degree", "dedup_cluster_canonical",
    "pipeline_shard_assignment", "pipeline_epoch_shuffle",
    "stats_ks_two_sample", "graph_kcore", "sql_pipe_syntax",
    "multimodal_phash_dedup", "text_prefix_boilerplate",
    "stats_mannwhitney_u", "similarity_semantic_dedup",
    "window_distribution_functions", "events_funnel_conversion_window",
    "pipeline_contamination_split_report", "events_cohort_ltv",
    "stats_bootstrap_mean_ci", "scan_recursive_file_lookup",
    "fn_aggregate_struct_accumulator", "multimodal_video_scene_cut",
    "join_asof_nearest", "dedup_minhash_band_tuning",
    "dedup_lsh_recall_audit", "pipeline_dataset_card",
    # round 6
    "pipeline_stage_funnel", "text_vocab_coverage_curve",
    "text_tfidf_exact_topk", "graph_neighborhood_jaccard",
    "multimodal_image_channel_stats", "multimodal_wav_silence_trim",
    "scan_csv_multiline_quoted", "events_user_feature_vector",
    "fn_regexp_extract_all", "fn_array_set_operations",
    "fn_posexplode_outer", "fn_array_safe_access",
    "window_running_distinct", "pipeline_tokenizer_fertility",
    "stats_quantile_bands_exact", "scan_xml_roundtrip",
    "sink_rebalanced_write", "sql_identifier_clause",
    "udtf_polymorphic_analyze", "profile_shingle_df", "stats_spearman_rho",
    # round-8 batch (grid/cutoff-building stats and staged-sink queries
    # excluded: they collect min(ts) or write fixture dirs)
    "text_bigram_novelty", "pipeline_span_corruption",
    "pipeline_preference_pairs", "pipeline_quality_threshold_sweep",
    "window_rolling_median", "text_langid_prf_audit",
    "multimodal_image_crop_tile", "multimodal_wav_zero_crossings",
    "fn_binary_encoding_roundtrip", "scan_parquet_metadata_columns",
    "udf_pandas_window_agg", "pipeline_ccnet_ppl_buckets",
    # round-8 wave-4 (grid-spine stats excluded as above: they emit a
    # scalar row of NULL ratios on an empty grid, which is the correct
    # "no data" report but not an empty frame)
    "stats_good_turing", "pipeline_passage_dedup",
    "embedding_matryoshka_energy", "similarity_reciprocal_rank_fusion",
    "events_max_drawdown", "graph_label_propagation",
    "text_rake_keywords", "stats_runs_test", "text_burstiness",
    "pipeline_bestfit_packing",
    # round-8 waves 9-14 (all verified clean on zero-row tables; the
    # scalar audits return one zeroed/NULL row, reports return empty)
    "stats_kendall_tau_b", "stats_hodges_lehmann", "stats_mood_median",
    "stats_friedman", "stats_sign_test", "stats_cohens_kappa",
    "stats_durbin_watson", "stats_odds_ratio", "graph_local_clustering",
    "events_markov_stationary", "text_flesch_reading_ease",
    "pipeline_quota_sampling", "similarity_retrieval_metrics",
    "events_holt_linear_forecast", "dedup_cdc_chunks", "stats_bh_fdr",
    "stats_mantel_haenszel", "text_garbage_score",
    "pipeline_largest_remainder_alloc", "pipeline_rejection_sampling",
    "events_seasonality_strength", "events_kaplan_meier",
    "events_cuped_variance_reduction", "stats_sample_size_two_proportions",
    "similarity_dedup_threshold_sweep",
    # round-10 batch (all additions; each also in the parity list below)
    "stats_jonckheere_terpstra", "stats_ansari_bradley",
    "stats_hash_uniformity_ks", "stats_normalized_mutual_info",
    "events_page_hinkley", "text_lix_readability", "text_ari_coleman_liau",
    "embedding_knn_label_consistency", "analytics_dau_mau_stickiness",
    "sql_group_by_ordinal",
    "stats_seasonal_mann_kendall", "embedding_centroid_drift_halves",
    "stats_anderson_darling_2s",
    # round-11 batch (all batch additions; stream_state_snapshot_read
    # stages a real checkpoint — exercised by its own suite)
    "agg_theta_sketch_distinct", "agg_theta_sketch_setops",
    "fn_time_type", "fn_scalar_additions_41", "sort_collated_order",
    # round-9 batch (all 96 additions except bus_delete_records, which
    # stages a real bus topic — exercised by its own tests; the sweep
    # found and fixed graph_hits_bipartite's driver-side k=0 division)
    "agg_arg_extrema", "agg_kmv_jaccard", "agg_multi_distinct_filtered",
    "agg_pythagorean_means", "analytics_pareto_frontier",
    "analytics_repeat_purchase_rate", "analytics_supplier_hhi",
    "dedup_cross_source_matrix", "dedup_soft_weighting",
    "embedding_dim_variance_topk", "embedding_isotropy_audit",
    "embedding_label_silhouette", "embedding_pq_distortion",
    "embedding_random_projection_jl", "events_aroon",
    "events_attribution_position_u", "events_attribution_time_decay",
    "events_bollinger_breach", "events_cross_correlation",
    "events_croston_demand", "events_donchian_breakout", "events_holt_winters",
    "events_hurst_rs", "events_kama_efficiency", "events_kleinberg_burst",
    "events_macd", "events_pettitt_changepoint", "events_rolling_slope",
    "events_rsi_wilder", "events_seasonal_index_dow",
    "events_stochastic_oscillator", "events_theil_u", "events_ulcer_index",
    "experiment_hash_bucketing", "graph_adamic_adar",
    "graph_bipartite_projection", "graph_hits_bipartite",
    "graph_katz_centrality", "graph_landmark_centrality",
    "multimodal_image_boxblur", "multimodal_image_dither_bayer",
    "multimodal_image_entropy", "multimodal_image_otsu",
    "multimodal_image_sobel", "multimodal_video_motion_energy",
    "multimodal_wav_clipping_audit", "multimodal_wav_fade",
    "multimodal_wav_peak_normalize", "pii_t_closeness_audit",
    "pipeline_mixture_kl_uniform", "pipeline_tokenizer_compare",
    "profile_freshness_lag", "profile_pk_uniqueness_audit",
    "similarity_hamming_topk", "similarity_mmr_diversify",
    "similarity_ndcg_eval", "sql_lateral_view_outer",
    "sql_values_inline_table", "stats_beta_binomial_posterior",
    "stats_brier_score", "stats_calibration_ece", "stats_chi2_goodness_of_fit",
    "stats_cliffs_delta", "stats_cohens_h", "stats_cronbach_alpha",
    "stats_fisher_exact", "stats_fleiss_kappa", "stats_gains_table",
    "stats_goodman_kruskal_gamma", "stats_grubbs_outlier",
    "stats_kuiper_two_sample", "stats_levene_mean", "stats_page_trend",
    "stats_phi_coefficient", "stats_rank_biserial", "stats_roc_auc_exact",
    "stats_somers_d", "stats_sprt_sequential", "stats_stuart_tau_c",
    "stats_tost_equivalence", "stats_tschuprow_t", "stats_vargha_delaney_a",
    "stats_weighted_kappa", "stats_yule_q", "text_bigram_perplexity",
    "text_bm25_topk", "text_hapax_spectrum", "text_heaps_fit",
    "text_inverted_index_query", "text_js_divergence_sources",
    "text_simpson_diversity", "text_unigram_entropy",
    "text_winnowing_fingerprint", "text_yule_k", "text_zlib_compression_ratio",
]


@pytest.fixture(scope="module")
def empty_sf_dir(spark, sf_dir):
    d = tempfile.mkdtemp(prefix="cascade_empty_")
    for t in _TABLES:
        load(spark, sf_dir, t).limit(0).write.parquet(os.path.join(d, f"{t}.parquet"))
    return d


@pytest.mark.parametrize("name", QUERIES)
def test_query_survives_empty_tables(spark, empty_sf_dir, name):
    rows = load_all()[name].builder(spark, empty_sf_dir).collect()
    # scalar-aggregate audits legitimately return one (zeroed) row, and
    # fixed-rule report queries one row per declared rule; everything
    # else must be empty — never an exception either way
    fixed_shape = {
        "agg_grouping_id": 4,
        "profile_expectations_report": 5,
        # fixed-rule report: one row per Benford digit, NULL shares
        "stats_benford_audit": 9,
        # fixed-shape dashboard: one row per dedup metric
        "dedup_corpus_report": 5,
        # fixed-round peel: one row per round even on an empty graph
        "graph_kcore": 3,
        # fixed-shape tuning table: one row per band configuration
        "dedup_minhash_band_tuning": 3,
        # fixed-shape release card: one row per declared metric
        "pipeline_dataset_card": 10,
        # fixed-shape funnel: one row per curation stage
        "pipeline_stage_funnel": 5,
        # fixed-shape curve: one row per k
        "text_vocab_coverage_curve": 4,
        # fixed-shape sweep: one row per declared threshold
        "similarity_dedup_threshold_sweep": 5,
        # fixed-shape audit: one row per fixture table
        "profile_pk_uniqueness_audit": 9,
    }
    assert len(rows) <= fixed_shape.get(name, 1), (name, rows[:3])


# ADVICE r8: the scalar inference audits used to emit NULL conditional
# sums on zero-row input where the oracle's COUNT(*) FILTER yields 0 —
# the <=1-row bound above hid it. Full Spark-vs-DuckDB parity on the
# empty dir, not just no-throw.
_EMPTY_PARITY = [
    "stats_kendall_tau_b", "stats_sign_test", "stats_cohens_kappa",
    "stats_odds_ratio", "stats_mcc_matthews", "events_intervention_its",
    # round-9 exact-arithmetic scalar audits (verdict r9 item 4): the
    # zero-row NULL-vs-0 divergence is this family's failure mode — the
    # sweep caught stats_fleiss_kappa (oracle SUM lacked COALESCE) and
    # stats_tschuprow_t (grouped-vs-scalar agg emitted 0 rows vs 1)
    "stats_fisher_exact", "stats_goodman_kruskal_gamma", "stats_somers_d",
    "stats_stuart_tau_c", "stats_sprt_sequential", "stats_brier_score",
    "stats_calibration_ece", "stats_fleiss_kappa", "stats_cronbach_alpha",
    "stats_yule_q", "stats_phi_coefficient", "stats_cohens_h",
    "stats_tschuprow_t", "stats_cliffs_delta", "stats_vargha_delaney_a",
    "stats_kuiper_two_sample", "stats_page_trend", "stats_levene_mean",
    "stats_weighted_kappa", "stats_rank_biserial", "stats_grubbs_outlier",
    "agg_pythagorean_means", "stats_roc_auc_exact", "stats_gains_table",
    "stats_beta_binomial_posterior", "stats_chi2_goodness_of_fit",
    # round-10 additions (verified at authoring time)
    "stats_jonckheere_terpstra", "stats_ansari_bradley",
    "stats_hash_uniformity_ks", "stats_normalized_mutual_info",
    "events_page_hinkley", "text_lix_readability", "text_ari_coleman_liau",
    "embedding_knn_label_consistency", "analytics_dau_mau_stickiness",
    "sql_group_by_ordinal", "stats_seasonal_mann_kendall",
    "embedding_centroid_drift_halves", "stats_anderson_darling_2s",
    # round-11 additions (verified at authoring time; theta estimates
    # of empty sketches are 0, matching the oracle's COUNT(DISTINCT))
    "agg_theta_sketch_distinct", "agg_theta_sketch_setops",
    "fn_time_type", "fn_scalar_additions_41", "sort_collated_order",
]


@pytest.fixture(scope="module")
def empty_file_sf_dir(sf_dir):
    """Empty tables as SINGLE parquet files (schema preserved via DuckDB
    COPY ... LIMIT 0) so both Spark and the DuckDB oracle read them."""
    import duckdb

    d = tempfile.mkdtemp(prefix="cascade_empty_files_")
    con = duckdb.connect()
    for t in _TABLES:
        con.sql(
            f"COPY (SELECT * FROM read_parquet('{sf_dir}/{t}.parquet') LIMIT 0)"
            f" TO '{os.path.join(d, t + '.parquet')}' (FORMAT PARQUET)"
        )
    con.close()
    return d


@pytest.mark.parametrize("name", _EMPTY_PARITY)
def test_empty_input_full_oracle_parity(spark, empty_file_sf_dir, name):
    from cascade_spark.plans.compare import compare

    q = load_all()[name]
    ok, msg = compare(
        q.builder(spark, empty_file_sf_dir), q.oracle, empty_file_sf_dir
    )
    assert ok, f"{name}: {msg}"


def test_empty_input_oracle_parity_regressions(spark, empty_sf_dir):
    """ADVICE r4: two latent Spark/oracle divergences the <=1-row bound
    above hid. On empty inputs (a) events_peak_concurrency must emit
    ZERO rows (the oracle's GROUP BY peak does), not one all-NULL agg
    row; (b) dedup_corpus_report's pair metrics must report 0 (the
    oracle's COUNT(*) subqueries do), not NULL from SUM-over-empty."""
    reg = load_all()
    assert reg["events_peak_concurrency"].builder(spark, empty_sf_dir).count() == 0
    rows = {r["metric"]: r["n"] for r in
            reg["dedup_corpus_report"].builder(spark, empty_sf_dir).collect()}
    assert rows["jaccard_pairs"] == 0
    assert rows["containment_pairs"] == 0
