"""Parallelism invariance — the determinism-at-scale contract.

SCALE.md claims results do not drift with parallelism (decimal
accumulation, exact integer arithmetic, md5-derived hash families).
This pins it: representative hash-checked queries must return
IDENTICAL rows under different spark.sql.shuffle.partitions settings —
the knob that changes merge order, partition boundaries, and reduce
fan-in, i.e. exactly what differs between local[32] and a
1000-executor cluster.
"""

from __future__ import annotations

import pytest

from cascade_spark.plans.registry import load_all

# float-aggregate, windowed, iterative, and hash-family representatives
QUERIES = [
    "agg_grouped_q1",            # decimal accumulation
    "events_transition_matrix",  # exact integer rounded averages
    "rollup_incremental_refresh",  # mergeable partials
    "graph_pagerank",            # iterative integer fixed point
    "text_lm_commonality",       # corpus join + avg_round
    "dedup_minhash_lsh",         # md5-derived hash family
    "events_resample_ohlc",      # order-sensitive first/last
    # late-round-4 exact-arithmetic representatives
    "events_ewma_dyadic",        # dyadic float sums, order-free exactness
    "stats_correlation",         # decimal(38,0) second moments
    "join_fuzzy_editdistance",   # blocked candidates, set-equal results
    "pipeline_curriculum_order", # two-phase ordinal assignment
    # round-6 representatives
    "pipeline_stage_funnel",     # five-stage flags folded into one agg row
    "text_tfidf_exact_topk",     # integer scoring + per-doc rank windows
    "stats_quantile_bands_exact",  # per-type cumulative spine
    "pipeline_tokenizer_fertility",  # shared merged-word frame join
    # round-7 representatives
    "agg_histogram_equi_depth",  # two-phase prefix-sum boundaries
    "pipeline_epoch_shuffle_audit",  # per-epoch ranks from the prefix sum
    "stats_mwu_pairwise_matrix",      # pooled midranks over the pair spine
    "pipeline_shard_rendezvous", # arg-max over md5 score arrays
    "similarity_range_query",    # integer membership rule + isqrt
    "stats_theil_sen_trend",     # doubled-median over pair slopes
    # round-8 representatives
    "similarity_semantic_dedup",  # banded sign-LSH blocking + CC closure
    "embedding_pca_power_iteration",  # integer matvec fixed point
    "stats_kruskal_wallis",      # midrank spine + decimal(38,0) rationals
    "pipeline_ccnet_ppl_buckets",  # global tercile rank via prefix sum
    "graph_bfs_hops",            # iterative frontier min-dist
    # round-8 wave-4 representatives
    "pipeline_passage_dedup",    # gram-frequency join + per-doc reassembly
    "stats_good_turing",         # cascaded freq-of-freqs groupBys
    "similarity_reciprocal_rank_fusion",  # two global rank windows fused
    "pipeline_bestfit_packing",  # deterministic FFD inside applyInPandas
    "text_burstiness",           # zero-free zero-filled VMR rational
    # round-8 wave-9..14 representatives
    "stats_hodges_lehmann",      # order-statistic selection via prefix sum
    "stats_bh_fdr",              # exact binomial HOF + step-up windows
    "dedup_cdc_chunks",          # per-doc HOF chunking + global dup groupBy
    "events_holt_linear_forecast",  # sequential integer fold per type
    "similarity_retrieval_metrics",  # checkpointed truth scan + rank windows
    "events_kaplan_meier",       # sequential IEEE product fold
    # round-11 representatives
    "agg_theta_sketch_distinct",  # sketch-merge order must not change
                                  # exact-regime estimates
    "agg_theta_sketch_setops",    # intersection/difference on merged
                                  # partial sketches
    "embedding_lsh_recall_audit",  # tiled blocked Gram: cell order and
                                   # block packing must not change pairs
    "sort_collated_order",        # collated distinct under partitioned
                                  # hash aggregation
    "stats_jonckheere_terpstra",  # tie-corrected DECIMAL(38,0) variance
]


def _rows(session, name, sf_dir):
    df = load_all()[name].builder(session, sf_dir)
    return [tuple(r) for r in df.collect()]


@pytest.mark.parametrize("name", QUERIES)
def test_results_identical_across_shuffle_partition_counts(spark, sf_dir, name):
    base = _rows(spark, name, sf_dir)
    assert base, name
    for parts in ("3", "57"):
        s2 = spark.newSession()
        s2.conf.set("spark.sql.shuffle.partitions", parts)
        assert _rows(s2, name, sf_dir) == base, f"{name} drifted at {parts} partitions"
