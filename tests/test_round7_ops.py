"""Round-7 operator tests — engine-side invariants the DuckDB oracle
cannot see (file footers, partition pruning, plan shapes, sketch
regimes, state-store layout)."""

from __future__ import annotations

import glob
import os

import pytest
from pyspark.sql import functions as F

from cascade_spark.plans.registry import load_all


def test_bloom_filter_present_in_footer(spark, sf_dir):
    """The bloom-filter write must actually land bloom filters in the
    parquet column metadata — the oracle only checks data equality."""
    from cascade_spark.sources.scans import bloom_filter_output

    out = bloom_filter_output(spark, sf_dir)
    files = glob.glob(os.path.join(out, "*.parquet"))
    assert files
    # pyarrow's metadata API doesn't expose bloom offsets in this
    # container; read the footer through parquet-mr (Spark's own reader)
    jvm = spark._jvm
    conf = spark._jsc.hadoopConfiguration()
    saw_bloom = False
    for f in files:
        infile = jvm.org.apache.parquet.hadoop.util.HadoopInputFile.fromPath(
            jvm.org.apache.hadoop.fs.Path(f), conf
        )
        reader = jvm.org.apache.parquet.hadoop.ParquetFileReader.open(infile)
        try:
            blocks = reader.getRowGroups()
            for bi in range(blocks.size()):
                cols = blocks.get(bi).getColumns()
                for ci in range(cols.size()):
                    cm = cols.get(ci)
                    if "l_orderkey" in str(cm.getPath()):
                        if cm.getBloomFilterOffset() > 0:
                            assert reader.readBloomFilter(cm) is not None
                            saw_bloom = True
        finally:
            reader.close()
    assert saw_bloom, "no bloom filter found on l_orderkey in any row group"


def test_clustered_layout_one_file_per_month_and_pruning(spark, sf_dir):
    """Month-clustered layout: one data file per ship_month directory,
    and a month predicate must prune to exactly that directory
    (PartitionFilters, not a full scan)."""
    from cascade_spark.operators.maintenance import clustered_output

    out = clustered_output(spark, sf_dir)
    dirs = [d for d in glob.glob(os.path.join(out, "ship_month=*")) if os.path.isdir(d)]
    assert dirs
    for d in dirs:
        files = glob.glob(os.path.join(d, "*.parquet"))
        assert len(files) == 1, f"{d} has {len(files)} files, want 1"
    back = spark.read.parquet(out)
    one_month = back.filter(F.col("ship_month") == "1996-05")
    plan = one_month._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters" in plan
    # the pruned scan must read exactly the one month
    exp = (
        spark.read.parquet(f"{sf_dir}/lineitem.parquet")
        .filter(F.date_format("l_shipdate", "yyyy-MM") == "1996-05")
        .count()
    )
    assert one_month.count() == exp


def test_sql_variables_fold_to_pushed_filter(spark, sf_dir):
    """Session variables must fold to literals at analysis time so the
    price predicate reaches the parquet scan as a pushed filter."""
    df = load_all()["sql_session_variables"].builder(spark, sf_dir)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "150000" in plan and "PushedFilters" in plan


def test_approx_top_k_exact_regime_matches_exact_counts(spark, sf_dir):
    """With maxItemsTracked >> cardinality the sketch must be exact for
    EVERY key, not only the returned top-4."""
    from cascade_spark.tables import load

    ev = load(spark, sf_dir, "events")
    k = ev.select("event_type").distinct().count()
    sk = (
        ev.select(F.expr(f"approx_top_k(event_type, {k}, 1024)").alias("t"))
        .select(F.explode("t").alias("e"))
        .select(F.col("e.item").alias("item"), F.col("e.count").alias("cnt"))
    )
    got = {r["item"]: r["cnt"] for r in sk.collect()}
    exact = {
        r["event_type"]: r["n"]
        for r in ev.groupBy("event_type").agg(F.count(F.lit(1)).alias("n")).collect()
    }
    assert got == exact


def test_state_store_read_matches_batch_groups(spark, sf_dir):
    """The statestore relation must hold exactly one row per (hour,
    type) group — complete mode never evicts."""
    from cascade_spark.tables import load

    df = load_all()["stream_state_store_read"].builder(spark, sf_dir)
    ev = load(spark, sf_dir, "events")
    n_groups = (
        ev.select(F.date_trunc("hour", "ts").alias("h"), "event_type")
        .distinct()
        .count()
    )
    assert df.count() == n_groups


def test_progress_audit_has_exactly_four_data_batches(spark, sf_dir):
    rows = load_all()["stream_progress_audit"].builder(spark, sf_dir).collect()
    assert [r["batch_id"] for r in rows] == [0, 1, 2, 3]
    # marker batches carry exactly one row each
    by_id = {r["batch_id"]: r["num_input_rows"] for r in rows}
    assert by_id[1] == 1 and by_id[3] == 1


def test_tvf_lateral_returns_topk_per_segment(spark, sf_dir):
    """The LATERAL TVF must emit 2 rows for EVERY segment (the ORDER
    BY/LIMIT-in-body formulation collapses to one segment in Spark 4.1
    — the trap the query doc pins; rank-filter body is the fix)."""
    from cascade_spark.tables import load

    df = load_all()["sql_table_valued_udf"].builder(spark, sf_dir)
    seg_counts = {
        r["c_mktsegment"]: r["n"]
        for r in df.groupBy("c_mktsegment").agg(F.count(F.lit(1)).alias("n")).collect()
    }
    n_segments = (
        load(spark, sf_dir, "customer").select("c_mktsegment").distinct().count()
    )
    assert len(seg_counts) == n_segments
    assert all(v == 2 for v in seg_counts.values())


def test_mips_bound_dominates_dot(spark, sf_dir):
    """Cauchy-Schwarz with integer isqrt: qdot <= isqrt(qn2*xn2) always
    (qdot is an integer <= the true sqrt)."""
    rows = load_all()["similarity_mips_norm_bound"].builder(spark, sf_dir).collect()
    assert rows
    for r in rows:
        assert r["qdot"] <= r["bound"], r


def test_quantization_error_within_component_bound(spark, sf_dir):
    """Per-vector residual sum < dim * 10^6 (each component residual is
    in [0, 1) micro-scaled)."""
    rows = (
        load_all()["embedding_quantization_error_audit"]
        .builder(spark, sf_dir)
        .collect()
    )
    assert rows
    for r in rows:
        assert 0 <= r["max_err_micro"] < 64 * 1_000_000


def test_cramers_v_in_unit_interval(spark, sf_dir):
    row = load_all()["stats_cramers_v"].builder(spark, sf_dir).collect()[0]
    assert 0 <= row["v_bp"] <= 10_000
    assert row["r_levels"] >= 2 and row["c_levels"] >= 2


def test_welch_t_sign_matches_mean_difference(spark, sf_dir):
    """t's sign must agree with the exact cents-mean difference."""
    from cascade_spark.tables import load

    ev = load(spark, sf_dir, "events")
    means = {
        r["event_type"]: r["m"]
        for r in ev.groupBy("event_type")
        .agg(F.avg(F.col("value").cast("decimal(12,4)") * 100).alias("m"))
        .collect()
    }
    rows = load_all()["stats_welch_ttest"].builder(spark, sf_dir).collect()
    assert len(rows) == 10
    for r in rows:
        diff = float(means[r["type_a"]] - means[r["type_b"]])
        if r["t_stat"] != 0:
            assert (r["t_stat"] > 0) == (diff > 0), r


def test_rocksdb_provider_restores_conf(spark, sf_dir):
    key = "spark.sql.streaming.stateStore.providerClass"
    before = spark.conf.get(key, None)
    load_all()["stream_rocksdb_state_store"].builder(spark, sf_dir).count()
    assert spark.conf.get(key, None) == before


def test_dataset_diff_partitions_are_exhaustive(spark, sf_dir):
    """added+removed+changed+unchanged must account for the full outer
    join of both releases."""
    from cascade_spark.tables import load

    rows = load_all()["pipeline_dataset_diff"].builder(spark, sf_dir).collect()
    total = sum(r["n"] for r in rows)
    docs = load(spark, sf_dir, "documents")
    v1 = docs.filter(F.col("doc_id") % 10 != 0).select("doc_id")
    v2 = docs.filter(F.col("doc_id") % 7 != 0).select("doc_id")
    expected = v1.union(v2).distinct().count()
    assert total == expected


def test_pipe_having_filters_by_output_name(spark, sf_dir):
    rows = load_all()["sql_pipe_lateral_having"].builder(spark, sf_dir).collect()
    assert rows
    for r in rows:
        assert r["n_orders"] > 10


def test_file_size_targeting_roll_arithmetic(spark, sf_dir):
    """Every month: n_files == ceil(n_rows/cap), and the remainder file
    is the only one below cap."""
    from cascade_spark.sources.scans import MAX_RECORDS_PER_FILE as CAP

    rows = load_all()["sink_file_size_targeting"].builder(spark, sf_dir).collect()
    assert rows
    for r in rows:
        assert r["n_files"] == -(-r["n_rows"] // CAP), r
        assert r["min_file_rows"] <= CAP
        if r["n_rows"] % CAP == 0:
            assert r["n_full_files"] == r["n_files"]
        else:
            assert r["n_full_files"] == r["n_files"] - 1


def test_range_query_membership_rule(spark, sf_dir):
    from cascade_spark.operators.similarity import RANGE_T_BP

    rows = load_all()["similarity_range_query"].builder(spark, sf_dir).collect()
    assert rows
    for r in rows:
        assert r["qdot"] > 0
        assert r["cos_bp"] >= RANGE_T_BP, r


def test_minhash_1bit_estimator_bounds(spark, sf_dir):
    """Equal hashes agree in their low bit, so bit_agree >= matches;
    both estimates live in [0, 10000] bp."""
    rows = load_all()["dedup_minhash_1bit"].builder(spark, sf_dir).collect()
    assert rows
    for r in rows:
        assert r["bit_agree"] >= r["matches"], r
        assert 0 <= r["est_1bit_bp"] <= 10_000
        assert 0 <= r["est_full_bp"] <= 10_000


def test_mann_kendall_stat_bounds(spark, sf_dir):
    rows = load_all()["stats_mann_kendall_trend"].builder(spark, sf_dir).collect()
    assert rows
    for r in rows:
        assert abs(r["s_stat"]) <= r["n0"]
        assert abs(r["tau_b_bp"]) <= 10_000
        assert r["n0"] == r["n_days"] * (r["n_days"] - 1) // 2


def test_number_format_roundtrip_all_ok(spark, sf_dir):
    rows = (
        load_all()["fn_number_format_roundtrip"].builder(spark, sf_dir).collect()
    )
    assert rows
    assert all(r["roundtrip_ok"] == 1 for r in rows)


def test_dynamic_partition_pruning_in_plan(spark, sf_dir):
    """The fact scan must carry a dynamicpruning expression in its
    partition filters — static pruning can't see through the join."""
    df = load_all()["join_dynamic_partition_pruning"].builder(spark, sf_dir)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "dynamicpruning" in plan.lower()


def test_equi_depth_buckets_balanced(spark, sf_dir):
    """Equi-depth property: every bucket holds between floor(N/8) - W
    and ceil(N/8) + W rows where W is the largest single-value mass
    (discrete data can't split a repeated value across buckets)."""
    from cascade_spark.operators.histogram_sketch import EQD_BUCKETS
    from cascade_spark.tables import load
    from pyspark.sql import functions as F2

    rows = load_all()["agg_histogram_equi_depth"].builder(spark, sf_dir).collect()
    assert len(rows) == EQD_BUCKETS
    li = load(spark, sf_dir, "lineitem")
    n = li.count()
    w = (
        li.groupBy((F2.col("l_extendedprice").cast("decimal(12,4)") * 100).cast("long"))
        .count()
        .agg(F2.max("count"))
        .collect()[0][0]
    )
    assert sum(r["n_rows"] for r in rows) == n
    for r in rows:
        assert n // EQD_BUCKETS - w <= r["n_rows"] <= -(-n // EQD_BUCKETS) + w, r


def test_mann_whitney_u_symmetry(spark, sf_dir):
    """U1 + U2 = n1*n2 (doubled: u1_x2 in [0, 2*n1*n2]); AUC in bp."""
    rows = load_all()["stats_mwu_pairwise_matrix"].builder(spark, sf_dir).collect()
    assert len(rows) == 10
    for r in rows:
        assert 0 <= r["u1_x2"] <= 2 * r["n_a"] * r["n_b"], r
        assert 0 <= r["auc_bp"] <= 10_000


def test_epoch_shuffle_reshuffles(spark, sf_dir):
    """Distinct checksums per epoch and nonzero displacement — a broken
    (epoch-invariant) shuffle would show equal checksums and 0."""
    rows = load_all()["pipeline_epoch_shuffle_audit"].builder(spark, sf_dir).collect()
    assert len(rows) == 3
    checks = [r["perm_checksum"] for r in rows]
    assert len(set(checks)) == 3
    for r in rows:
        if r["epoch"] < 3:
            assert r["mean_disp_to_next"] > 0


def test_luhn_known_vectors(spark):
    """Pin the built-in against the canonical Luhn test vector."""
    row = spark.sql(
        "SELECT luhn_check('79927398713') AS good, luhn_check('79927398710') AS bad"
    ).collect()[0]
    assert row["good"] is True and row["bad"] is False


def test_image_equalize_stretches_range(spark, sf_dir):
    """Equalization must map the brightest present level to 255 and the
    darkest to 0 whenever an image has >1 distinct level."""
    rows = load_all()["multimodal_image_equalize"].builder(spark, sf_dir).collect()
    assert rows
    for r in rows[:50]:
        assert r["eq_min"] == 0
        if r["n_px"] > 256:  # synthesis guarantees all 256 levels present
            assert r["eq_max"] == 255


def test_not_in_null_trap_contrast(spark, sf_dir):
    row = load_all()["subquery_not_in_null_trap"].builder(spark, sf_dir).collect()[0]
    assert row["n_probe_nulls"] > 0
    assert row["n_not_in"] == 0
    assert row["n_not_exists"] > 0


def test_jdbc_pushdown_reaches_remote_sql(spark, sf_dir):
    """Predicate and projection must land in the JDBCRelation scan."""
    df = load_all()["scan_jdbc_pushdown"].builder(spark, sf_dir)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "JDBCRelation" in plan
    assert "GreaterThan(o_totalprice" in plan


def test_jdbc_partitioned_read_fans_out(spark, sf_dir):
    """The partitioned JDBC read must produce the declared number of
    range partitions (one bounded SELECT each)."""
    from cascade_spark.sources.lakehouse import (
        JDBC_PARTITIONS,
        jdbc_orders_url,
        read_jdbc,
    )

    url = jdbc_orders_url(spark, sf_dir)
    back = read_jdbc(
        spark, url, "ORDERS_RT",
        partitionColumn="o_orderkey", lowerBound=1,
        upperBound=100000, numPartitions=JDBC_PARTITIONS,
    )
    assert back.rdd.getNumPartitions() == JDBC_PARTITIONS


def test_codec_matrix_sizes_ordered(spark, sf_dir):
    """Compressed variants must actually compress: every codec variant
    smaller than an uncompressed control write of the same data."""
    import tempfile

    from cascade_spark.tables import load

    src = (
        load(spark, sf_dir, "lineitem")
        .filter("l_orderkey % 5 = 0")
        .select("l_orderkey", "l_linenumber", "l_extendedprice")
        .coalesce(4)
    )
    base = tempfile.mkdtemp(prefix="codec_sz_")
    sizes = {}
    for codec in ("none", "snappy", "zstd"):
        out = f"{base}/{codec}"
        src.write.option("compression", codec).parquet(out)
        sizes[codec] = sum(
            os.path.getsize(os.path.join(out, f))
            for f in os.listdir(out)
            if f.endswith(".parquet")
        )
    assert sizes["snappy"] < sizes["none"]
    assert sizes["zstd"] < sizes["none"]


def test_try_sum_overflow_isolated_to_hot_group(spark, sf_dir):
    rows = load_all()["fn_try_sum_overflow"].builder(spark, sf_dir).collect()
    by = {r["o_orderstatus"]: r for r in rows}
    assert by["F"]["overflowed"] == 1 and by["F"]["try_total"] is None
    for st, r in by.items():
        if st != "F":
            assert r["overflowed"] == 0 and r["try_total"] is not None


def test_rendezvous_minimal_movement(spark, sf_dir):
    """HRW property: survivors only GAIN docs (n_7 = n_8 + inbound);
    the removed shard empties; total docs conserved."""
    from cascade_spark.operators.curation import N_SHARDS

    rows = load_all()["pipeline_shard_rendezvous"].builder(spark, sf_dir).collect()
    assert len(rows) == N_SHARDS
    by = {r["shard"]: r for r in rows}
    assert by[N_SHARDS - 1]["n_docs_7shards"] == 0
    total8 = sum(r["n_docs_8shards"] for r in rows)
    total7 = sum(r["n_docs_7shards"] for r in rows)
    assert total8 == total7
    for s, r in by.items():
        if s < N_SHARDS - 1:
            assert r["n_docs_7shards"] == r["n_docs_8shards"] + r["n_inbound"], r


def test_named_window_single_window_exec(spark, sf_dir):
    """The three same-spec window functions must share WindowExec nodes:
    at most 2 Window operators (shared spec + the distinct n_cust spec)."""
    df = load_all()["window_named_window_clause"].builder(spark, sf_dir)
    plan = df._jdf.queryExecution().executedPlan().toString()
    n_window_ops = plan.count("Window ")
    assert 1 <= n_window_ops <= 2, plan[:2000]


def test_multiprobe_supersets_single_bucket(spark, sf_dir):
    """Multi-probe must never see FEWER candidates than the single
    bucket, and every returned row's probe distance is 0 or 1."""
    rows = load_all()["similarity_lsh_multiprobe"].builder(spark, sf_dir).collect()
    assert rows
    for r in rows:
        assert r["n_cand_multi"] >= r["n_cand_single"]
        assert r["probe_dist"] in (0, 1)


def test_rate_micro_batch_exact_content(spark, sf_dir):
    from cascade_spark.streaming.ratesource import RMB_ROWS

    rows = load_all()["stream_rate_micro_batch"].builder(spark, sf_dir).collect()
    assert sum(r["n"] for r in rows) == RMB_ROWS
    assert len({r["batch_ts"] for r in rows}) == 1


def test_default_columns_fill_rule(spark, sf_dir):
    rows = load_all()["sql_default_columns"].builder(spark, sf_dir).collect()
    by_id = {r["id"]: r for r in rows}
    assert by_id[1000000001]["status"] == "new" and by_id[1000000001]["score"] == 100
    assert by_id[1000000002]["score"] == 5
    backfills = [r for r in rows if r["id"] < 1000000000]
    assert backfills and all(r["score"] == 100 for r in backfills)


def test_format_preserving_mask_properties(spark, sf_dir):
    """Masking must preserve length and digit-ness, actually change
    values, and map equal inputs to equal outputs."""
    rows = load_all()["pii_format_preserving_mask"].builder(spark, sf_dir).collect()
    assert rows
    for r in rows:
        assert r["mask_len"] == 11
        assert r["masked_str"].isdigit()
    assert sum(r["changed"] for r in rows) >= len(rows) - 1


def test_conversion_latency_order_statistics(spark, sf_dir):
    row = load_all()["events_conversion_latency"].builder(spark, sf_dir).collect()[0]
    assert row["n_converted"] > 0
    assert row["min_s"] * 2 <= row["median_x2_s"] <= row["max_s"] * 2
    assert row["min_s"] <= row["p90_s"] <= row["max_s"]


def test_source_similarity_symmetric_bounds(spark, sf_dir):
    rows = (
        load_all()["text_source_similarity_hashed"].builder(spark, sf_dir).collect()
    )
    assert rows
    for r in rows:
        assert 0 <= r["cos_bp"] <= 10_000
        assert r["src_a"] < r["src_b"]


def test_state_changelog_only_updates(spark, sf_dir):
    """Complete mode never evicts: every change row is an 'update', and
    the four pinned batches each touch at least one key."""
    rows = load_all()["stream_state_changelog"].builder(spark, sf_dir).collect()
    assert [r["batch_id"] for r in rows] == [0, 1, 2, 3]
    assert all(r["change_type"] == "update" for r in rows)
    assert rows[1]["n_keys_changed"] == 1 and rows[3]["n_keys_changed"] == 1


def test_orphan_audit_read_path_ignores_junk(spark, sf_dir):
    from cascade_spark.tables import load

    row = load_all()["bus_orphan_segment_audit"].builder(spark, sf_dir).collect()[0]
    assert row["n_orphans"] == 3
    assert row["n_disk_files"] == row["n_committed_segments"] + row["n_orphans"]
    assert row["n_committed_rows"] == load(spark, sf_dir, "events").count()


def test_slo_burn_requires_both_windows(spark, sf_dir):
    from cascade_spark.operators.timeseries import BURN_THRESHOLD_BP

    rows = load_all()["events_slo_burn_rate"].builder(spark, sf_dir).collect()
    assert rows
    for r in rows:
        assert r["short_bp"] >= BURN_THRESHOLD_BP
        assert r["long_bp"] >= BURN_THRESHOLD_BP


def test_bitmap_incremental_conservation(spark, sf_dir):
    """Merged distinct >= history distinct per type; new users
    non-negative and total never exceeds the user universe."""
    from cascade_spark.tables import load

    rows = (
        load_all()["rollup_bitmap_distinct_incremental"]
        .builder(spark, sf_dir)
        .collect()
    )
    assert rows
    universe = load(spark, sf_dir, "events").select("user_id").distinct().count()
    for r in rows:
        assert 0 <= r["n_new_users"] == r["n_total"] - r["n_history"]
        assert r["n_total"] <= universe
