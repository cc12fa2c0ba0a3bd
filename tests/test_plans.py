"""Plan-shape assertions — the scale contract (SURVEY.md §4).

Correctness says the answer is right; these say the *plan* is the one
that survives 100×: filters pushed into the parquet scan, projections
pruned, dimensions broadcast, partitioned reads pruned.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from cascade_spark.tables import load


def _plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def test_filter_pushdown_reaches_scan(spark, sf_dir):
    df = (
        load(spark, sf_dir, "lineitem")
        .filter(F.col("l_orderkey") == 42)
        .select("l_orderkey", "l_quantity")
    )
    plan = _plan(df)
    assert "PushedFilters: [IsNotNull(l_orderkey), EqualTo(l_orderkey,42)" in plan, plan


def test_column_pruning_reaches_scan(spark, sf_dir):
    df = load(spark, sf_dir, "lineitem").select("l_orderkey", "l_quantity")
    plan = _plan(df)
    assert "ReadSchema: struct<l_orderkey:bigint,l_quantity:double>" in plan, plan


def test_star_join_broadcasts_dimensions(spark, sf_dir):
    from cascade_spark.plans.registry import load_all

    df = load_all()["join_star"].builder(spark, sf_dir)
    plan = _plan(df)
    assert plan.count("BroadcastHashJoin") >= 3, plan


def test_partitioned_write_prunes(spark, sf_dir, tmp_path):
    ev = load(spark, sf_dir, "events")
    out = str(tmp_path / "by_type")
    ev.write.partitionBy("event_type").parquet(out)
    df = spark.read.parquet(out).filter(F.col("event_type") == "purchase")
    plan = _plan(df)
    assert "PartitionFilters: [isnotnull(event_type" in plan, plan


def test_whole_stage_codegen_on_agg(spark, sf_dir):
    from cascade_spark.plans.registry import load_all

    import contextlib
    import io

    df = load_all()["agg_grouped_q1"].builder(spark, sf_dir)
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain("codegen")
    assert "WholeStageCodegen subtrees" in buf.getvalue()
    # the tree string marks codegen stages with *(n)
    df.collect()
    assert "*(1)" in _plan(df)


def test_offset_assignment_no_single_partition_sort(spark, sf_dir):
    """The scalable offset path must not plan a global single-partition
    window over the data (only the tiny per-partition count table may)."""
    from cascade_spark.operators.ingest import assign_offsets

    ev = load(spark, sf_dir, "events")
    df = assign_offsets(ev, ["ts", "event_id"], num_partitions=8)
    plan = _plan(df)
    # the data-bearing window partitions by _pid; a global window over the
    # events would show 'Window [...]' without partition spec preceded by
    # a SinglePartition exchange feeding the full row set
    assert "partitionBy=[_pid]" in plan.replace(" ", "") or "_pid" in plan
    assert df.count() == ev.count()


def test_q6_full_pushdown_and_pruning(spark, sf_dir):
    from cascade_spark.plans.registry import load_all

    df = load_all()["tpch_q6_forecast_revenue"].builder(spark, sf_dir)
    plan = _plan(df)
    assert "PushedFilters: [IsNotNull(l_shipdate), IsNotNull(l_discount), IsNotNull(l_quantity)" in plan, plan
    assert (
        "ReadSchema: struct<l_quantity:double,l_extendedprice:double,"
        "l_discount:double,l_shipdate:timestamp" in plan
    ), plan


def test_q10_broadcasts_dims_and_takes_topk(spark, sf_dir):
    from cascade_spark.plans.registry import load_all

    df = load_all()["tpch_q10_returned_items"].builder(spark, sf_dir)
    df.collect()  # final AQE plan
    plan = _plan(df)
    assert plan.count("BroadcastHashJoin") >= 2, plan
    assert "TakeOrderedAndProject(limit=20" in plan, plan
    assert "PushedFilters: [IsNotNull(l_returnflag), EqualTo(l_returnflag,R)" in plan, plan


def test_zscore_broadcasts_moments(spark, sf_dir):
    from cascade_spark.plans.registry import load_all

    df = load_all()["events_anomaly_zscore"].builder(spark, sf_dir)
    df.collect()
    plan = _plan(df)
    assert "BroadcastHashJoin" in plan, plan
    assert "SortMergeJoin" not in plan, plan


def test_range_bucketed_join_is_hash_not_nested_loop(spark, sf_dir):
    from cascade_spark.plans.registry import load_all

    df = load_all()["join_range_bucketed"].builder(spark, sf_dir)
    df.collect()
    plan = _plan(df)
    assert "BroadcastNestedLoopJoin" not in plan, plan
    assert "BroadcastHashJoin" in plan, plan


def test_tpch_q2_window_over_aggregate_not_fact(spark, sf_dir):
    """Q2's min-per-part window must run over the (part,supp) aggregate,
    never the raw fact: exactly one pre-window shuffle aggregate, and the
    part/supplier/nation dims all broadcast."""
    from cascade_spark.plans.registry import load_all

    df = load_all()["tpch_q2_min_cost_supplier"].builder(spark, sf_dir)
    plan = _plan(df)
    assert plan.count("BroadcastHashJoin") >= 3, plan
    # the window input is the HashAggregate over (l_partkey, l_suppkey)
    win_pos = plan.find("Window")
    agg_pos = plan.find("HashAggregate")
    assert win_pos != -1 and agg_pos != -1, plan


def test_tpch_q18_take_ordered_not_global_sort(spark, sf_dir):
    """Q18's top-100 must plan TakeOrderedAndProject (streaming top-k),
    not a full global Sort materialization."""
    from cascade_spark.plans.registry import load_all

    df = load_all()["tpch_q18_large_volume"].builder(spark, sf_dir)
    plan = _plan(df)
    assert "TakeOrderedAndProject" in plan, plan


def test_tpch_q21_no_cartesian_fallback(spark, sf_dir):
    """Q21's EXISTS / NOT EXISTS semantics (round-5 window rewrite —
    see test_tpch_q21_single_fact_scan) must never fall back to a
    cartesian or nested-loop product over the fact."""
    from cascade_spark.plans.registry import load_all

    df = load_all()["tpch_q21_waiting_suppliers"].builder(spark, sf_dir)
    plan = _plan(df)
    assert "CartesianProduct" not in plan, plan
    assert "BroadcastNestedLoopJoin" not in plan, plan


def test_pack_context_windows_no_global_data_window(spark, sf_dir):
    """The packing cumsum must be the two-phase form: the data-bearing
    window partitions by _pid; the only SinglePartition exchange allowed
    feeds the tiny per-partition totals (_psum), never the document rows."""
    from cascade_spark.plans.registry import load_all

    df = load_all()["pipeline_pack_context_windows"].builder(spark, sf_dir)
    plan = _plan(df)
    assert "_pid" in plan, plan
    for seg in plan.split("Exchange SinglePartition")[1:]:
        assert "_psum" in seg[:3000], plan


def test_runtime_bloom_filter_injected_on_filtered_dim_join(spark, sf_dir):
    """Under production thresholds (fact scan large, filtered dim small)
    InjectRuntimeFilter rewrites the fact side to
    might_contain(bloom_filter_agg(dim_keys), fact_key) — row pruning
    BEFORE the fact shuffle. Local fixtures are below the default 10 GB
    application-side threshold, so pin the thresholds to the shape a
    100 TB run would see and assert the injection happens."""
    from cascade_spark.plans.registry import load_all

    confs = {
        "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold": "0",
        "spark.sql.optimizer.runtime.bloomFilter.creationSideThreshold": "100MB",
        "spark.sql.autoBroadcastJoinThreshold": "-1",
    }
    old = {k: spark.conf.get(k) for k in confs}
    try:
        for k, v in confs.items():
            spark.conf.set(k, v)
        df = load_all()["join_runtime_filtered_fact"].builder(spark, sf_dir)
        opt = df._jdf.queryExecution().optimizedPlan().toString()
        assert "might_contain" in opt, opt
    finally:
        for k, v in old.items():
            spark.conf.set(k, v)


def test_aqe_skew_join_splits_hot_partition(spark):
    """The automatic complement to operators/bucketing.salted_join: under
    production skew (one key owning ~90% of a fact side) AQE's
    OptimizeSkewedJoin must split the hot partition at runtime —
    final plan shows SortMergeJoin(skew=true) reading an
    'AQEShuffleRead skewed'. Thresholds pinned to the local data size;
    the mechanism (factor × median + byte threshold) is scale-relative."""
    confs = {
        "spark.sql.adaptive.skewJoin.skewedPartitionFactor": "1.0",
        "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes": "100KB",
        "spark.sql.adaptive.advisoryPartitionSizeInBytes": "100KB",
        "spark.sql.adaptive.coalescePartitions.enabled": "false",
        "spark.sql.autoBroadcastJoinThreshold": "-1",
        "spark.sql.adaptive.autoBroadcastJoinThreshold": "-1",
    }
    old = {k: spark.conf.get(k, None) for k in confs}
    try:
        for k, v in confs.items():
            spark.conf.set(k, v)
        left = spark.range(0, 500_000).select(
            F.when(F.col("id") % 10 < 9, F.lit(0)).otherwise(F.col("id")).alias("k"),
            F.concat(F.lit("x" * 30), F.col("id")).alias("pad"),
        )
        right = spark.range(0, 1000).select(
            F.col("id").alias("k"), (F.col("id") * 2).alias("w")
        )
        j = left.join(right, "k")
        assert len(j.collect()) == 450_100
        # executedPlan of the *executed* frame — AQE final stages
        plan = j._jdf.queryExecution().executedPlan().toString()
        final = plan.split("== Initial Plan ==")[0]
        assert "skew=true" in final, final
        assert "AQEShuffleRead skewed" in final, final
    finally:
        for k, v in old.items():
            if v is None:
                spark.conf.unset(k)
            else:
                spark.conf.set(k, v)


def test_tpch_q17_broadcast_aggregate_is_bounded(spark, sf_dir):
    """Q17's per-partkey stats aggregate is force-broadcast; an
    UNFILTERED per-partkey aggregate has cardinality ~|part| and grows
    with scale factor — broadcasting it OOMs at 100×. The aggregate must
    therefore be computed over a LeftSemi-filtered fact (only partkeys
    surviving the Brand#3 predicate). The tree prints parent-then-child,
    so the semi-join must appear AFTER the stats HashAggregate line."""
    from cascade_spark.plans.registry import load_all

    df = load_all()["tpch_q17_small_quantity"].builder(spark, sf_dir)
    plan = _plan(df)
    assert "LeftSemi" in plan, plan
    agg_pos = plan.index("HashAggregate(keys=[l_partkey")
    assert plan.index("LeftSemi") > agg_pos, plan


def test_null_safe_join_is_hash_not_nested_loop(spark, sf_dir):
    """eqNullSafe is still an equi-key (Spark coalesce-wraps it) — it
    must plan a hash join, never BroadcastNestedLoop/Cartesian."""
    from cascade_spark.plans.registry import load_all

    plan = _plan(load_all()["join_null_safe"].builder(spark, sf_dir))
    assert "HashJoin" in plan, plan
    assert "NestedLoop" not in plan and "CartesianProduct" not in plan, plan


def test_oov_vocab_is_broadcast(spark, sf_dir):
    """The top-1k vocabulary must broadcast onto the token stream — the
    corpus-sized side never shuffles for this join."""
    from cascade_spark.plans.registry import load_all

    plan = _plan(load_all()["text_oov_rate"].builder(spark, sf_dir))
    assert "BroadcastHashJoin" in plan, plan
    assert "SortMergeJoin" not in plan, plan


def test_q20_aggregate_behind_semi_join(spark, sf_dir):
    """Q20's per-(part,supp) aggregate must only see partkeys surviving
    the part filter: LeftSemi below the HashAggregate (Q17 discipline)."""
    from cascade_spark.plans.registry import load_all

    plan = _plan(load_all()["tpch_q20_potential_promotion"].builder(spark, sf_dir))
    agg_pos = plan.index("HashAggregate(keys=[l_partkey")
    assert "LeftSemi" in plan[agg_pos:], plan


def test_interval_overlap_is_hash_join_not_nested_loop(spark, sf_dir):
    # since round 12 the shared pair frame is a lineage-truncated
    # localCheckpoint, so the overlap join is only visible in the BUILD
    # plan — pin the join shape there (the query plan over the cache no
    # longer contains any join to inspect)
    from cascade_spark.operators.interval import _build_pairs

    df = _build_pairs(spark, sf_dir)
    plan = _plan(df)
    # the bucket key must carry the join; the overlap inequality is a
    # residual — a nested-loop/cartesian plan would be the naive O(n^2)
    assert "CartesianProduct" not in plan, plan
    assert "BroadcastNestedLoopJoin" not in plan, plan
    assert "SortMergeJoin" in plan or "ShuffledHashJoin" in plan or "BroadcastHashJoin" in plan, plan


def test_pagerank_edge_frame_is_persisted(spark, sf_dir):
    from cascade_spark.plans.registry import load_all

    df = load_all()["graph_pagerank"].builder(spark, sf_dir)
    plan = _plan(df)
    # 3 iterations must reuse the out-weighted edge frame from the
    # materialized shared cache, not recompute the events aggregation
    # per round. The cache is a lineage-truncated localCheckpoint since
    # round 12 (it shows as an ExistingRDD scan); a pre-truncation
    # persisted cache (InMemoryTableScan) also satisfies the intent.
    assert "ExistingRDD" in plan or "InMemoryTableScan" in plan, plan


def test_lateral_topn_rewrites_to_rank_window_not_nested_loop(spark, sf_dir):
    from cascade_spark.plans.registry import load_all

    df = load_all()["subquery_lateral_topn"].builder(spark, sf_dir)
    plan = _plan(df)
    # Catalyst must rewrite the correlated LATERAL ... LIMIT into the
    # rank-window + join family; a nested-loop per-outer-row re-execution
    # would be |nation| x |customer| at scale
    assert "CartesianProduct" not in plan, plan
    assert "BroadcastNestedLoopJoin" not in plan, plan
    assert "row_number" in plan, plan


def test_nested_struct_predicate_pushdown(spark, sf_dir):
    """The struct-field predicate must reach the parquet scan as a
    nested PushedFilter (o.amount_cents) — reading the whole envelope
    to filter driver-side would defeat the nested layout."""
    from cascade_spark.plans.registry import load_all

    plan = _plan(load_all()["scan_nested_struct_roundtrip"].builder(spark, sf_dir))
    assert "GreaterThan(o.amount_cents" in plan, plan


def test_bloom_decontam_joins_all_broadcast(spark, sf_dir):
    """The bloom pass's scale contract: K position joins + the exact
    join are ALL broadcast — the corpus never shuffles for a join."""
    from cascade_spark.plans.registry import load_all

    plan = _plan(load_all()["pipeline_decontaminate_bloom"].builder(spark, sf_dir))
    assert plan.count("BroadcastHashJoin") >= 5, plan
    assert "SortMergeJoin" not in plan, plan
    assert "ShuffledHashJoin" not in plan, plan


def test_cms_estimation_joins_broadcast(spark, sf_dir):
    """CMS estimates come from the broadcast D×W sketch, never a
    token-volume shuffle join."""
    from cascade_spark.plans.registry import load_all

    plan = _plan(load_all()["profile_cms_heavy_hitters"].builder(spark, sf_dir))
    assert plan.count("BroadcastHashJoin") >= 3, plan
    assert "SortMergeJoin" not in plan, plan


def test_attribution_join_extracts_equality_key(spark, sf_dir):
    """The 72h-lookback join must hash/merge on the user_id equality
    (range conditions as residual), never degenerate to a nested-loop
    cross product."""
    from cascade_spark.plans.registry import load_all

    plan = _plan(load_all()["events_attribution_touch"].builder(spark, sf_dir))
    assert "BroadcastNestedLoopJoin" not in plan, plan
    assert "CartesianProduct" not in plan, plan


def test_quality_classifier_no_join(spark, sf_dir):
    """Weights are a closed-form slot function — scoring must be one
    explode + map-side-combinable aggregate with NO join anywhere."""
    from cascade_spark.plans.registry import load_all

    plan = _plan(load_all()["pipeline_quality_classifier"].builder(spark, sf_dir))
    assert "Join" not in plan, plan
    assert "HashAggregate" in plan, plan


def test_hard_negative_anchor_broadcast(spark, sf_dir):
    """The anchor mini-batch broadcasts; the base embedding table is
    scored map-only (no base-side shuffle join)."""
    from cascade_spark.plans.registry import load_all

    plan = _plan(load_all()["similarity_hard_negative_mining"].builder(spark, sf_dir))
    assert "BroadcastNestedLoopJoin" in plan or "BroadcastHashJoin" in plan, plan
    assert "SortMergeJoin" not in plan, plan
    assert "CartesianProduct" not in plan, plan


def test_relational_division_broadcasts_total(spark, sf_dir):
    """The FOR-ALL rewrite: two aggregates + a broadcast 1-row total —
    never a per-user correlated subquery join."""
    from cascade_spark.plans.registry import load_all

    plan = _plan(load_all()["subquery_relational_division"].builder(spark, sf_dir))
    assert "BroadcastNestedLoopJoin" in plan or "BroadcastHashJoin" in plan, plan
    assert "SortMergeJoin" not in plan, plan


def test_sql_udf_inlines_into_codegen(spark, sf_dir):
    """A SQL UDF must inline at analysis time — no Python evaluation
    node, the banding CASE lives inside the aggregate's plan."""
    from cascade_spark.plans.registry import load_all

    plan = _plan(load_all()["sql_udf_create_function"].builder(spark, sf_dir))
    assert "BatchEvalPython" not in plan, plan
    assert "ArrowEvalPython" not in plan, plan
    assert "CASE WHEN" in plan, plan


def test_no_static_broadcast_hints_on_sf_scaling_dims(spark, sf_dir):
    """customer/part/supplier scale linearly with SF (FIXTURES.md), so a
    forced F.broadcast() hint on them bypasses AQE's size check and OOMs
    at 100x. Pin: the analyzed plans carry ResolvedHints ONLY for the
    genuinely fixed frames (nation=25, region=5, 1-row scalars) — any
    reintroduced hint on an SF-scaling dim bumps the count — while the
    final AQE plan still picks BroadcastHashJoin for every dim locally
    (strategy chosen by the size check, not forced)."""
    from cascade_spark.plans.registry import load_all

    qs = load_all()
    # query -> (expected ResolvedHint count, min final BroadcastHashJoins)
    expected = {
        "join_star": (2, 3),  # nation + region
        "tpch_q7_volume_shipping": (2, 4),  # the two 1-row nation sides
        "tpch_q2_min_cost_supplier": (1, 3),  # nation
        "tpch_q10_returned_items": (1, 2),  # nation
        "tpch_q17_small_quantity": (0, 2),  # no fixed dim in the plan
        "tpch_q14_promo_revenue": (0, 1),
        "tpch_q18_large_volume": (0, 1),
    }
    for name, (n_hints, min_bhj) in expected.items():
        df = qs[name].builder(spark, sf_dir)
        analyzed = df._jdf.queryExecution().analyzed().toString()
        assert analyzed.count("ResolvedHint") == n_hints, (name, analyzed)
        df.collect()  # finalize AQE
        plan = _plan(df)
        assert plan.count("BroadcastHashJoin") >= min_bhj, (name, plan)


def test_tpch_q21_single_fact_scan(spark, sf_dir):
    """Q21's EXISTS/NOT-EXISTS pair must NOT plan as the naive triple
    lineitem self-reference (three fact scans + semi/anti joins). The
    window rewrite computes both existence tests from per-order
    distinct-supplier sets over ONE orderkey partition: exactly one
    lineitem scan and at least one Window node, zero sort-merge
    self-joins."""
    import re

    from cascade_spark.plans.registry import load_all

    df = load_all()["tpch_q21_waiting_suppliers"].builder(spark, sf_dir)
    df.collect()
    plan = _plan(df)
    scans = len(set(re.findall(r"FileScan parquet \[l_orderkey#\d+L", plan)))
    assert scans == 1, plan
    assert "Window" in plan, plan


def test_round5_two_phase_stats_no_global_data_window(spark, sf_dir):
    """The KS / Mann-Whitney cumulative counts and the shard-assignment
    prefix sum must be the two-phase form: data-bearing windows
    partition by _pid; any SinglePartition exchange may only feed the
    tiny per-partition totals, never the value-spine rows."""
    from cascade_spark.plans.registry import load_all

    reg = load_all()
    for name, base_marker in [
        ("stats_ks_two_sample", "_s1"),
        ("stats_mannwhitney_u", "_psum"),
        ("pipeline_shard_assignment", "_psum"),
    ]:
        plan = _plan(reg[name].builder(spark, sf_dir))
        assert "_pid" in plan, (name, plan)
        for seg in plan.split("Exchange SinglePartition")[1:]:
            assert base_marker in seg[:3000] or "HashAggregate" in seg[:500], (
                name,
                plan,
            )


def test_epoch_shuffle_local_head_before_global_rank(spark, sf_dir):
    """The per-epoch ordinal must come from the local-head-then-global
    pattern: the first (data-bearing) window partitions by
    (epoch, SPARK_PARTITION_ID()), so the epoch-only window ranks at
    most partitions*k survivors."""
    from cascade_spark.plans.registry import load_all

    plan = _plan(load_all()["pipeline_epoch_shuffle"].builder(spark, sf_dir))
    assert "SPARK_PARTITION_ID" in plan, plan
    # the survivor filter must sit between the two windows
    assert plan.count("Window") >= 2, plan


def test_phash_dedup_map_only_then_single_shuffle(spark, sf_dir):
    """The dHash stage is map-only Python (one ArrowEvalPython/
    mapInPandas pass, no join); the only shuffle is the cluster
    groupBy."""
    from cascade_spark.plans.registry import load_all

    plan = _plan(load_all()["multimodal_phash_dedup"].builder(spark, sf_dir))
    assert "Join" not in plan, plan
    assert "MapInPandas" in plan or "ArrowEvalPython" in plan, plan


def test_cdc_chunking_is_map_only_before_dup_decision(spark, sf_dir):
    """dedup_cdc_chunks: the chunk construction must be ONE map-only
    HOF pass — no Window (the explode+per-doc-window shape it replaced)
    and no join until the chunk-hash dup decision."""
    from cascade_spark.plans.registry import load_all

    plan = _plan(load_all()["dedup_cdc_chunks"].builder(spark, sf_dir))
    assert "WindowExec" not in plan and "Window " not in plan
    # exactly one join: chunks x dup-decision
    assert plan.count("BroadcastHashJoin") + plan.count("SortMergeJoin") == 1


def test_retrieval_metrics_truth_scan_runs_once(spark, sf_dir):
    """similarity_retrieval_metrics localCheckpoints the brute-force
    truth scan; downstream branches must read the checkpoint (scan
    'ExistingRDD'/'LogicalRDD'), not re-run the nested-loop join."""
    from cascade_spark.plans.registry import load_all

    plan = _plan(load_all()["similarity_retrieval_metrics"].builder(spark, sf_dir))
    # the checkpointed frame appears as RDD scans; the expensive
    # BroadcastNestedLoopJoin must NOT appear in the final plan at all
    assert "BroadcastNestedLoopJoin" not in plan
    assert "Scan ExistingRDD" in plan


def test_bounce_rate_single_user_shuffle(spark, sf_dir):
    """events_bounce_rate_by_entry shares one user_id sort for both
    windows (lag + cumulative flag sum) — the sessionize contract."""
    from cascade_spark.plans.registry import load_all

    plan = _plan(load_all()["events_bounce_rate_by_entry"].builder(spark, sf_dir))
    import re

    # both windows over the same (user_id; ts, event_id) order: the
    # plan must not re-exchange between them
    n_window = len(re.findall(r"Window ", plan))
    assert n_window >= 2
    hashpart_user = len(re.findall(r"hashpartitioning\(user_id", plan))
    assert hashpart_user == 1, f"expected one user shuffle, saw {hashpart_user}"


# ---------------------------------------------------------------------------
# Global-window lint (round-9 verdict item): every PARTITION-LESS
# Window.orderBy in the source must window over a declared bounded spine
# — a frame whose row count is fixed by construction (day grid, distinct
# value spine, k-row config frame), never corpus-sized. The allowlist
# below IS the declaration; adding a new global window without
# annotating its spine here fails the suite.
# ---------------------------------------------------------------------------

_GLOBAL_WINDOW_ALLOWLIST = {
    # (module path, enclosing function): bounded spine it windows over
    ("cascade_spark/operators/analytics_extra.py", "pipeline_curriculum_order"):
        "3-row band-size frame (cumulative offsets, assign_offsets pattern)",
    ("cascade_spark/operators/analytics_extra.py", "analytics_abc_pareto"):
        "per-part revenue spine (|part| rows, dimension-bounded)",
    ("cascade_spark/operators/curation.py", "pipeline_largest_remainder_alloc"):
        "k-row allocation frame (one row per declared source)",
    ("cascade_spark/operators/curation.py", "pipeline_greedy_coverage"):
        "per-round candidate scores on the label spine (<= |labels| rows)",
    ("cascade_spark/operators/histogram_sketch.py", "agg_histogram_equi_depth"):
        "bucket-boundary spine (k quantile rows)",
    ("cascade_spark/operators/inference_extra.py", "stats_bh_fdr"):
        "k(k-1)/2 event-type pair rows (k = |event types|)",
    ("cascade_spark/operators/inference_extra.py", "stats_ljung_box"):
        "day-grid spine (n_days rows)",
    ("cascade_spark/operators/inference_extra.py", "stats_cochran_armitage"):
        "7-row ISO-dow dose spine",
    ("cascade_spark/operators/ingest.py", "assign_offsets"):
        "~numPartitions count rows (documented WindowExec warning)",
    ("cascade_spark/operators/ingest.py", "assign_prefix_sum"):
        "~numPartitions count rows (two-phase prefix sum)",
    ("cascade_spark/operators/ingest.py", "assign_prefix_sums"):
        "~numPartitions count rows (multi-column two-phase prefix sum)",
    ("cascade_spark/operators/stats_extra.py", "stats_ks_two_sample"):
        "distinct daily-volume value spine",
    ("cascade_spark/operators/ordinal_effects.py", "_pair_counts"):
        "merged click/view daily-volume value spine (n_days-bounded)",
    ("cascade_spark/operators/ordinal_effects.py", "stats_rank_biserial"):
        "absolute-paired-difference value spine (n_days-bounded)",
    ("cascade_spark/operators/ordinal_effects.py", "stats_kuiper_two_sample"):
        "merged click/view daily-volume value spine (n_days-bounded)",
    ("cascade_spark/operators/sequential_tests.py", "stats_sprt_sequential"):
        "day-grid spine (Bernoulli stream = one row per day)",
    ("cascade_spark/operators/model_eval.py", "stats_roc_auc_exact"):
        "distinct score_bp value spine (<= 10001 rows by construction)",
    ("cascade_spark/operators/model_eval.py", "stats_gains_table"):
        "5-row score-band spine",
    ("cascade_spark/operators/frontier_xcorr.py", "analytics_pareto_frontier"):
        "distinct p_size spine (~50 rows, dimension-bounded)",
    ("cascade_spark/operators/frontier_xcorr.py", "events_cross_correlation"):
        "day-grid spine (row_number index over days)",
    ("cascade_spark/operators/text.py", "text_seqlen_histogram"):
        "fixed histogram-bucket spine",
    ("cascade_spark/operators/text.py", "text_vocab_coverage_curve"):
        "word-frequency spine (|vocab| rows, vocab-bounded)",
    ("cascade_spark/operators/text.py", "text_pmi_collocations"):
        "co-occurring word-pair spine (|vocab|^2-bounded, vocab-bounded)",
    ("cascade_spark/operators/text_filtering.py", "text_zipf_topwords"):
        "word-frequency spine (|vocab| rows)",
    ("cascade_spark/operators/timeseries.py", "events_new_vs_returning"):
        "day-grid spine",
    ("cascade_spark/operators/timeseries.py", "events_autocorrelation"):
        "day-grid spine",
    ("cascade_spark/operators/timeseries.py", "events_changepoint_cusum"):
        "day-grid spine",
    ("cascade_spark/operators/timeseries.py", "events_slo_burn_rate"):
        "day/window grid spine",
    ("cascade_spark/sources/topics.py", "bus_consumer_group_assignment"):
        "topic-partition spine (|partitions| rows)",
    ("cascade_spark/operators/vector_audit.py", "similarity_ndcg_eval"):
        "NDCG_K-row TakeOrdered candidate frame (position numbering)",
    ("cascade_spark/operators/surface_round10.py", "stats_ansari_bradley"):
        "merged click/view daily-volume value spine (n_days-bounded)",
    ("cascade_spark/operators/surface_round10.py", "stats_hash_uniformity_ks"):
        "fixed 16-row hash-bucket spine",
    ("cascade_spark/operators/surface_round10c.py", "stats_anderson_darling_2s"):
        "merged click/view daily-volume value spine (n_days-bounded)",
}


def test_global_windows_are_declared_bounded_spines():
    """AST-walk the source tree: the set of partition-less
    Window.orderBy sites must equal the annotated allowlist exactly —
    new sites need a spine declaration, removed sites must be pruned."""
    import ast
    import os

    root_dir = os.path.join(os.path.dirname(__file__), "..")
    sites = set()
    for root, _, files in os.walk(os.path.join(root_dir, "cascade_spark")):
        for fn in files:
            if not fn.endswith(".py"):
                continue
            p = os.path.join(root, fn)
            rel = os.path.relpath(p, root_dir)
            tree = ast.parse(open(p).read())
            funcs = [
                (n.lineno, n.end_lineno, n.name)
                for n in ast.walk(tree)
                if isinstance(n, (ast.FunctionDef, ast.AsyncFunctionDef))
            ]
            for node in ast.walk(tree):
                if (
                    isinstance(node, ast.Call)
                    and isinstance(node.func, ast.Attribute)
                    and node.func.attr == "orderBy"
                    and isinstance(node.func.value, ast.Name)
                    and node.func.value.id == "Window"
                ):
                    enc = [f for (a, b, f) in funcs if a <= node.lineno <= b]
                    sites.add((rel, enc[-1] if enc else "<module>"))
    allow = set(_GLOBAL_WINDOW_ALLOWLIST)
    assert sites == allow, (
        f"undeclared global windows: {sorted(sites - allow)}; "
        f"stale allowlist entries: {sorted(allow - sites)}"
    )


def test_rrf_two_phase_no_global_window(spark, sf_dir):
    """similarity_reciprocal_rank_fusion recovers exact global ranks via
    distributed top-K' pre-cut + map-side beat-count: the plan must have
    NO Window exec (the old corpus-wide row_number) and must rank via
    TakeOrderedAndProject."""
    from cascade_spark.plans.registry import load_all

    plan = _plan(
        load_all()["similarity_reciprocal_rank_fusion"].builder(spark, sf_dir)
    )
    assert "Window" not in plan
    assert "TakeOrderedAndProject" in plan


def test_rfm_exact_ntile_no_global_window(spark, sf_dir):
    """analytics_rfm_segmentation derives NTILE(5) from the two-phase
    assign_offsets rank — no partition-less Window over the customer
    frame (windows over the ~32-row _pid count frame are the declared
    bounded exception and appear partitioned or spine-sized)."""
    from cascade_spark.plans.registry import load_all

    plan = _plan(load_all()["analytics_rfm_segmentation"].builder(spark, sf_dir))
    # ntile is gone entirely; the only row_number windows are the
    # per-_pid local ranks inside assign_offsets
    assert "ntile" not in plan


# ---------------------------------------------------------------------------
# Round-9 second-session plan pins: the new retrieval/vector/attribution
# queries must keep their declared shuffle budgets — broadcast the small
# side, TakeOrdered the top-k, reuse the persisted pair frame.
# ---------------------------------------------------------------------------


def test_bm25_broadcasts_terms_and_takeordered(spark, sf_dir):
    """text_bm25_topk joins postings to THREE term rows — that side must
    broadcast (never shuffle the postings on the term key for a 3-row
    dim), and the final top-k must be TakeOrderedAndProject, not a
    global sort."""
    from cascade_spark.plans.registry import load_all

    plan = _plan(load_all()["text_bm25_topk"].builder(spark, sf_dir))
    assert "BroadcastHashJoin" in plan
    assert "TakeOrderedAndProject" in plan


def test_hamming_topk_is_takeordered_scan(spark, sf_dir):
    """similarity_hamming_topk: map-only code fold + broadcast 1-row
    query + TakeOrderedAndProject — no shuffle of the corpus codes."""
    from cascade_spark.plans.registry import load_all

    plan = _plan(load_all()["similarity_hamming_topk"].builder(spark, sf_dir))
    assert "TakeOrderedAndProject" in plan
    assert "BroadcastNestedLoopJoin" in plan or "BroadcastHashJoin" in plan
    # the only exchange allowed is the broadcast of the 1-row query side
    import re

    shuffles = re.findall(r"Exchange hashpartitioning", plan)
    assert not shuffles, f"unexpected shuffles: {shuffles}"


def test_cross_source_matrix_reuses_persisted_pairs(spark, sf_dir):
    """dedup_cross_source_matrix must read the SHARED persisted LSH pair
    frame (InMemoryTableScan), not rebuild the signature pipeline."""
    from cascade_spark.plans.registry import load_all

    # prime the shared frame the way any earlier dedup query would
    load_all()["dedup_minhash_lsh"].builder(spark, sf_dir).count()
    plan = _plan(load_all()["dedup_cross_source_matrix"].builder(spark, sf_dir))
    # shared caches are lineage-truncated localCheckpoints since round
    # 12 — the materialized-frame scan shows as ExistingRDD
    assert "ExistingRDD" in plan or "InMemoryTableScan" in plan


def test_silhouette_broadcasts_centroids(spark, sf_dir):
    """embedding_label_silhouette joins each vector against the 10-label
    centroid frame — that join must be a broadcast, never a shuffle of
    the exploded dim spine on the centroid key."""
    from cascade_spark.plans.registry import load_all

    plan = _plan(load_all()["embedding_label_silhouette"].builder(spark, sf_dir))
    assert "BroadcastHashJoin" in plan


def test_jt_dominance_join_extracts_value_equality(spark, sf_dir):
    """stats_jonckheere_terpstra's sup-vs-cumulative join has an
    equality key (the support value) plus a group inequality — Catalyst
    must extract the equi part (hash/sort-merge join on v), never fall
    back to a cartesian product over the grid."""
    from cascade_spark.plans.registry import load_all

    df = load_all()["stats_jonckheere_terpstra"].builder(spark, sf_dir)
    df.collect()
    plan = _plan(df)
    assert "CartesianProduct" not in plan, plan
    assert ("SortMergeJoin" in plan) or ("BroadcastHashJoin" in plan), plan


def test_seasonal_mk_pairs_join_is_hash_on_stratum(spark, sf_dir):
    """stats_seasonal_mann_kendall pairs days WITHIN a weekday stratum:
    the self-join must hash on the stratum key with the day inequality
    as a post-filter — the bounded day-pair spine, not a cartesian."""
    from cascade_spark.plans.registry import load_all

    df = load_all()["stats_seasonal_mann_kendall"].builder(spark, sf_dir)
    df.collect()
    plan = _plan(df)
    assert "CartesianProduct" not in plan, plan
    assert "BroadcastHashJoin" in plan, plan


def test_knn_anchor_side_is_broadcast(spark, sf_dir):
    """embedding_knn_label_consistency scores the corpus against a
    BROADCAST anchor frame (the declared sample-bounded exact path) —
    one corpus scan, no shuffle of the embedding side before scoring,
    and the per-anchor rank window partitions by anchor (no global
    window)."""
    from cascade_spark.plans.registry import load_all

    df = load_all()["embedding_knn_label_consistency"].builder(spark, sf_dir)
    df.collect()
    plan = _plan(df)
    assert "BroadcastNestedLoopJoin" in plan or "BroadcastHashJoin" in plan, plan
    assert "CartesianProduct" not in plan, plan


def test_lsh_recall_truth_audit_is_tiled_not_collected(spark, sf_dir):
    """The all-pairs truth index of embedding_lsh_recall_audit must be
    the TILED blocked Gram matmul (packed vec_id-range blocks crossed
    on lb <= rb), never a driver-side full-matrix collect: driver
    memory must stay O(1) in corpus size (round-10 verdict, What's
    wrong #2). Pins (a) no .collect( in the builder source beyond the
    bounded scalar count, (b) the truth pairs themselves against a
    direct numpy all-pairs recompute."""
    import inspect
    import math

    import numpy as np

    from cascade_spark.operators import similarity
    from cascade_spark.plans.registry import load_all

    src = inspect.getsource(
        load_all()["embedding_lsh_recall_audit"].builder
    )
    assert ".collect()" not in src, "driver-side matrix collect returned"
    assert "lrows" in src and "rrows" in src  # the tiled cell shape

    # direct recompute of the truth pairs (exact ints, numpy)
    e = load(spark, sf_dir, "embeddings").orderBy("vec_id").collect()
    ids = np.array([r["vec_id"] for r in e], dtype=np.int64)
    mat = np.array(
        [[math.floor(float(x) * 200) for x in r["embedding"]] for r in e],
        dtype=np.int64,
    )
    g = mat @ mat.T
    norms = (mat * mat).sum(axis=1)
    qd2 = 100 * g * g
    nanb = norms[:, None] * norms[None, :]
    keep = (ids[:, None] < ids[None, :]) & (g > 0) & (qd2 >= 4 * nanb)
    per_band = {20: 0, 30: 0, 40: 0}
    j, k = np.nonzero(keep)
    for a, b in zip(j, k):
        if qd2[a, b] >= 16 * nanb[a, b]:
            per_band[40] += 1
        elif qd2[a, b] >= 9 * nanb[a, b]:
            per_band[30] += 1
        else:
            per_band[20] += 1
    rows = (
        load_all()["embedding_lsh_recall_audit"]
        .builder(spark, sf_dir)
        .collect()
    )
    got = {r["band_lo_pct"]: r["n_true"] for r in rows}
    assert got == {b: n for b, n in per_band.items() if n > 0}, (got, per_band)


def test_map_hofs_evaluate_once_per_column(spark, sf_dir):
    """Catalyst does not CSE lambda expressions. Round 12 pinned each
    map HOF to exactly one plan copy; round 13 fused the four HOF
    semantics into ONE transform lambda over the entries array (12
    interpreted lambda invocations/row → 3; warm sf0.1 3.5 s → 2.4 s,
    oracle hash unchanged). Pin the fused shape: zero per-map HOF
    calls, exactly one lambda-bearing transform in the physical plan."""
    from cascade_spark.plans.registry import load_all

    plan = (
        load_all()["fn_map_higher_order"]
        .builder(spark, sf_dir)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    for hof in ("transform_values", "map_filter", "map_zip_with", "transform_keys"):
        assert plan.count(hof) == 0, (hof, plan.count(hof))
    n_lambda = plan.count("lambdafunction(")
    assert 1 <= n_lambda <= 2, ("fused transform not single-copy", n_lambda)


def test_quantized_dot_single_copy(spark, sf_dir):
    """similarity_mips_norm_bound / similarity_range_query must keep
    the corpus quantization behind a projection barrier and the query
    norm in the 1-row broadcast frame: the inlined form re-evaluated
    the transform lambda 3x and a constant 64-element fold per corpus
    row (physical plans carried 24/23 zip_with copies; now 15/14, the
    remainder being the documented multi-pass branches and 1-row
    query-side subplans)."""
    import inspect

    from cascade_spark.plans.registry import load_all

    reg = load_all()
    for name, cap in [
        ("similarity_mips_norm_bound", 15),
        ("similarity_range_query", 14),
    ]:
        src = inspect.getsource(reg[name].builder)
        assert '.alias("qx")' in src, f"{name}: corpus-quant barrier gone"
        assert '_idot(F.col("_qq"), F.col("_qq"))' in src
        plan = (
            reg[name]
            .builder(spark, sf_dir)
            ._jdf.queryExecution()
            .executedPlan()
            .toString()
        )
        assert plan.count("zip_with") <= cap, (name, plan.count("zip_with"))


def test_daily_grid_is_shared_and_materialized(spark, sf_dir):
    """Round-12: the zero-filled (type x day) grid and the (day, x, y)
    click/view spine are per-(app, sf_dir) materialized shared frames.
    Consumers must read the checkpointed blocks (plan shows ExistingRDD,
    zero events parquet scans) instead of re-running the 3-scan grid
    build per query — events_aroon's pre-change plan held 28 parquet
    scans, stats_bh_fdr's 32."""
    from cascade_spark.operators.inference_extra import _xy_daily
    from cascade_spark.operators.timeseries_indicators import _grid
    from cascade_spark.plans.registry import load_all

    # cache identity: second call returns the same handle, no rebuild
    g1, g2 = _grid(spark, sf_dir), _grid(spark, sf_dir)
    assert g1 is g2
    x1, x2 = _xy_daily(spark, sf_dir), _xy_daily(spark, sf_dir)
    assert x1 is x2

    reg = load_all()
    for name in ("events_aroon", "stats_bh_fdr", "stats_kruskal_wallis",
                 "stats_kendall_tau_b", "events_holt_linear_forecast"):
        plan = (
            reg[name].builder(spark, sf_dir)
            ._jdf.queryExecution().executedPlan().toString()
        )
        assert "events.parquet" not in plan, (name, "grid rebuilt from events")
        assert "ExistingRDD" in plan, (name, "shared frame not checkpointed")


def test_every_spine_consumer_reads_cache_not_base(spark, sf_dir):
    """Round-13 (r12 verdict item 7): EVERY consumer of the three
    events-derived shared spines — the (type×day) grid, the (day,x,y)
    click/view spine, and the (type×dow) contingency cells — must
    execute with ZERO events parquet scans and read the checkpointed
    blocks instead (the aroon-28-scans defect class must stay dead).
    The consumer list is DERIVED from builder sources so a new consumer
    is pinned the day it lands."""
    import inspect

    from cascade_spark.plans.registry import load_all

    reg = load_all()
    markers = ("_grid(", "_xy_daily(", "_contingency_cells(")
    checked = 0
    bad = []
    for name, q in sorted(reg.items()):
        try:
            src = inspect.getsource(q.builder)
        except (OSError, TypeError):
            continue
        if not any(m in src for m in markers):
            continue
        # a builder that additionally reads the base table itself would
        # legitimately scan it — none does today; fail loudly if one
        # appears so the pin is consciously re-scoped, not silently lost
        assert 'sf_dir, "events")' not in src, (name, "re-scope this pin")
        plan = (
            q.builder(spark, sf_dir)
            ._jdf.queryExecution()
            .executedPlan()
            .toString()
        )
        if "events.parquet" in plan or "ExistingRDD" not in plan:
            bad.append(name)
        checked += 1
    assert not bad, bad
    assert checked >= 45, f"consumer derivation broke: only {checked} found"
