"""Late-round-4 surface extras: join-strategy hints, hidden _metadata
columns, curriculum ordering, streaks, bitwise aggregates, token-budget
mixture. Oracle hash-checks live in test_oracle.py; these pin the plan
shapes and the semantic invariants the oracle can't express."""

from __future__ import annotations

import os

from cascade_spark.plans.registry import load_all

REG = load_all()


def _plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def test_join_hints_override_physical_strategy(spark, sf_dir):
    """hint('shuffle_hash') and hint('merge') must each win their join:
    the plan carries BOTH a ShuffledHashJoin (orders⋈customer) and a
    SortMergeJoin (agg⋈nation), even though unhinted AQE would
    broadcast the tiny sides."""
    plan = _plan(REG["join_hint_strategies"].builder(spark, sf_dir))
    assert "ShuffledHashJoin" in plan, plan
    assert "SortMergeJoin" in plan, plan


def test_metadata_file_size_matches_os(spark, sf_dir):
    """_metadata.file_size must equal the file's true on-disk size (the
    oracle can't check this — read_blob needs a literal path)."""
    from pyspark.sql import functions as F

    path = f"{sf_dir}/customer.parquet"
    row = (
        spark.read.parquet(path)
        .select(F.col("_metadata.file_size").alias("sz"))
        .limit(1)
        .collect()[0]
    )
    assert row["sz"] == os.path.getsize(path)


def test_curriculum_ordinal_dense_and_band_ordered(spark, sf_dir):
    rows = REG["pipeline_curriculum_order"].builder(spark, sf_dir).collect()
    ordinals = [r["ordinal"] for r in rows]
    assert ordinals == list(range(1, len(rows) + 1))
    bands = [r["band"] for r in rows]
    assert bands == sorted(bands)  # easy→hard, never interleaved


def test_curriculum_single_partition_exchanges_only_feed_band_sizes(spark, sf_dir):
    """Two-phase ordinal: the document-bearing window partitions by
    band; any SinglePartition exchange may only carry the |bands|-row
    size frame (same contract as pipeline_pack_context_windows)."""
    plan = _plan(REG["pipeline_curriculum_order"].builder(spark, sf_dir))
    for seg in plan.split("Exchange SinglePartition")[1:]:
        assert "cnt" in seg[:3000], plan


def test_streak_invariants(spark, sf_dir):
    for r in REG["events_activity_streaks"].builder(spark, sf_dir).collect():
        assert 1 <= r["longest_streak"] <= r["active_days"]
        # n_streaks runs of >=1 day each, the longest among them:
        assert r["active_days"] >= r["n_streaks"] + r["longest_streak"] - 1
        assert r["active_days"] <= 31  # events span one month


def test_bitwise_and_is_subset_of_or(spark, sf_dir):
    for r in REG["agg_bitwise"].builder(spark, sf_dir).collect():
        assert r["all_bits"] & r["any_bits"] == r["all_bits"]
        assert bin(r["any_bits"]).count("1") == r["any_popcount"]


def test_token_budget_allocation_invariants(spark, sf_dir):
    rows = REG["pipeline_token_budget_mixture"].builder(spark, sf_dir).collect()
    total_alloc = sum(r["alloc_tokens"] for r in rows)
    assert total_alloc <= 10_000_000  # floor never over-allocates
    total_w = sum(r["weight"] for r in rows)
    for r in rows:
        assert r["alloc_tokens"] == 10_000_000 * r["weight"] // total_w
        # epochs_bp is the floor oversampling factor in basis points
        assert r["epochs_bp"] == r["alloc_tokens"] * 10_000 // r["tokens_available"]


def test_crosstab_row_totals_match_group_counts(spark, sf_dir):
    from cascade_spark.tables import load

    ct = {r[0]: r for r in REG["stats_crosstab"].builder(spark, sf_dir).collect()}
    direct = {
        r["o_orderstatus"]: r["n"]
        for r in load(spark, sf_dir, "orders").groupBy("o_orderstatus").count()
        .withColumnRenamed("count", "n").collect()
    }
    for status, row in ct.items():
        assert sum(row[1:]) == direct[status]


def test_correlation_in_valid_range_and_matches_native(spark, sf_dir):
    """The exact-sums Pearson r must agree with Spark's native corr()
    to float tolerance (the exact form exists for cross-engine
    determinism, not different math)."""
    from pyspark.sql import functions as F

    from cascade_spark.tables import load

    got = {
        r["l_returnflag"]: r["corr_qty_price"]
        for r in REG["stats_correlation"].builder(spark, sf_dir).collect()
    }
    native = {
        r["l_returnflag"]: r["c"]
        for r in load(spark, sf_dir, "lineitem")
        .groupBy("l_returnflag")
        .agg(F.corr("l_quantity", "l_extendedprice").alias("c"))
        .collect()
    }
    for k, v in got.items():
        assert -1.0 <= v <= 1.0
        assert abs(v - native[k]) < 1e-4, (k, v, native[k])
