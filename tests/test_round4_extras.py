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


def test_skew_kurtosis_matches_native(spark, sf_dir):
    """Exact-moment skew/kurtosis must agree with Spark's native
    implementations to float tolerance (same math, exact-sum form)."""
    from pyspark.sql import functions as F

    from cascade_spark.tables import load

    got = {
        r["l_returnflag"]: (r["skewness"], r["kurtosis_excess"])
        for r in REG["stats_skew_kurtosis"].builder(spark, sf_dir).collect()
    }
    native = {
        r["l_returnflag"]: (r["s"], r["k"])
        for r in load(spark, sf_dir, "lineitem")
        .groupBy("l_returnflag")
        .agg(F.skewness("l_quantity").alias("s"), F.kurtosis("l_quantity").alias("k"))
        .collect()
    }
    for flag, (s, k) in got.items():
        assert abs(s - native[flag][0]) < 1e-5, (flag, s, native[flag])
        assert abs(k - native[flag][1]) < 1e-5, (flag, k, native[flag])


def test_stream_left_outer_emits_null_side(spark, sf_dir):
    """The outer join must emit unmatched purchases with a null click —
    if the watermark never passes the attribution window these rows are
    silently withheld (the single-sided-ON-predicate pushdown trap this
    query's comment documents)."""
    from pyspark.sql import functions as F

    out = REG["stream_stream_left_outer"].builder(spark, sf_dir)
    null_clicks = out.filter(F.col("click_id").isNull()).count()
    assert null_clicks > 0


def test_cogroup_handles_one_sided_keys(spark):
    """Cogroup must surface keys present on only one side (full-outer
    key semantics) with zero counts and a null gap."""
    import pandas as pd

    left = spark.createDataFrame([(1, 10), (2, 20)], "user_id long, v long")
    right = spark.createDataFrame([(2, 5), (3, 7)], "user_id long, v long")

    def merge(key, l: pd.DataFrame, r: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame(
            {"user_id": [key[0]], "n_l": [len(l)], "n_r": [len(r)]}
        )

    rows = {
        r["user_id"]: (r["n_l"], r["n_r"])
        for r in left.groupBy("user_id")
        .cogroup(right.groupBy("user_id"))
        .applyInPandas(merge, schema="user_id long, n_l long, n_r long")
        .collect()
    }
    assert rows == {1: (1, 0), 2: (1, 1), 3: (0, 1)}


def test_cogroup_checksum_consumer(spark, sf_dir):
    """Regression for the self-cogroup attribute-dedup bug: under an
    aggregate consumer Spark resolved both cogroup sides to the left
    side's expression ids and pruned ts from the right child, so the
    pandas merge crashed (KeyError 'ts') — but only in plans shaped
    like bench's checksum materialization, never under collect(). The
    builder now scans each side independently; this pins the exact
    failing consumer shape."""
    from pyspark.sql import functions as F

    df = REG["udf_cogrouped_pandas"].builder(spark, sf_dir)
    h = F.xxhash64(*[F.col(c) for c in df.columns])
    rows = df.select(h.alias("_h")).agg(F.count("_h").alias("n")).collect()
    assert rows[0]["n"] > 0


def test_broadcast_left_outer_plan(spark, sf_dir):
    """The dim side must broadcast (BroadcastHashJoin ... LeftOuter):
    for outer joins only the non-preserved side is broadcastable, and
    the fact side must never shuffle for this enrich join."""
    plan = _plan(REG["join_broadcast_left_outer"].builder(spark, sf_dir))
    assert "BroadcastHashJoin" in plan and "LeftOuter" in plan, plan
    assert "SortMergeJoin" not in plan, plan


def test_strict_funnel_monotone_and_tighter_than_loose(spark, sf_dir):
    strict = REG["events_funnel_strict_sequence"].builder(spark, sf_dir).collect()[0]
    assert strict["n_signup"] >= strict["n_signup_then_view"] >= strict["n_full_funnel"]


def test_numeric_range_frame_counts_self(spark, sf_dir):
    """Every row is inside its own ±band frame, so n_peers >= 1."""
    rows = REG["window_range_numeric_frame"].builder(spark, sf_dir).collect()
    assert rows and all(r["n_peers_within_100"] >= 1 for r in rows)


def test_fuzzy_join_blocking_has_exact_recall(spark, sf_dir):
    """The prefix/suffix pigeonhole must lose nothing: the blocked
    result equals the naive all-pairs distance-<=1 join computed in
    Spark directly."""
    from pyspark.sql import functions as F

    from cascade_spark.tables import load

    blocked = {
        (r["probe_id"], r["entity_id"])
        for r in REG["join_fuzzy_editdistance"].builder(spark, sf_dir).collect()
    }
    cust = load(spark, sf_dir, "customer")
    key = F.substring(F.md5(F.col("c_custkey").cast("string")), 1, 9)
    catalog = cust.select(F.col("c_custkey").alias("entity_id"), key.alias("key"))
    q = F.concat(
        F.expr("substr(substr(md5(cast(c_custkey as string)),1,9), 1, cast(c_custkey % 9 as int))"),
        F.expr("substr(substr(md5(cast(c_custkey as string)),1,9), cast(c_custkey % 9 as int) + 2)"),
    )
    dirty = cust.select(F.col("c_custkey").alias("probe_id"), q.alias("q"))
    naive = {
        (r["probe_id"], r["entity_id"])
        for r in dirty.crossJoin(catalog)
        .filter(F.levenshtein("q", "key") <= 1)
        .collect()
    }
    assert blocked == naive and len(blocked) > 0


def test_ewma_satisfies_recurrence_exactly(spark, sf_dir):
    """Dyadic weights make the closed form bit-equal to the recurrence
    y_t = (x_t + y_{t-1})/2 — zero float tolerance."""
    from collections import defaultdict

    from pyspark.sql import functions as F

    from cascade_spark.plans.registry import load_all
    from cascade_spark.tables import load
    from cascade_spark.operators._util import dec, _intdiv

    out = defaultdict(list)
    for r in REG["events_ewma_dyadic"].builder(spark, sf_dir).collect():
        out[r["event_type"]].append((r["day"], r["ewma_cents"]))
    daily = (
        load(spark, sf_dir, "events")
        .groupBy("event_type", F.to_date("ts").alias("d"))
        .agg(
            F.sum((dec("value") * 100).cast("long")).alias("s"),
            F.count(F.lit(1)).alias("n"),
        )
        .select("event_type", "d", _intdiv(F.col("s"), F.col("n")).alias("x"))
        .collect()
    )
    xs = defaultdict(dict)
    for r in daily:
        xs[r["event_type"]][r["d"].strftime("%Y-%m-%d")] = float(r["x"])
    for etype, series in out.items():
        y = None
        for day, got in sorted(series):
            x = xs[etype][day]
            y = x if y is None else (x + y) / 2.0
            assert y == got, (etype, day, y, got)


def test_island_merge_bridges_and_orders():
    """Pure-function check of the sessionizer's island merging: a late
    bridging event must fuse two islands; disjoint ones stay apart."""
    from cascade_spark.streaming.stateful import _GAP_US, _merge_islands

    g = _GAP_US
    # two islands one gap+2 apart, then a bridge right between them
    a = [[0, 0, 1], [g + 2, g + 2, 1]]
    assert len(_merge_islands(a, g)) == 2
    bridged = sorted(a + [[g // 2, g // 2, 1]])
    m = _merge_islands(bridged, g)
    assert len(m) == 1 and m[0][2] == 3 and m[0][1] == g + 2


def test_island_merge_equals_bruteforce_sessionization():
    """Property: merging arbitrary event sets incrementally (any split,
    any order) equals one-shot gaps-and-islands sessionization."""
    from hypothesis import given, settings, strategies as st

    from cascade_spark.streaming.stateful import _merge_islands

    gap = 100

    def brute(ts):
        islands = []
        for x in sorted(ts):
            if islands and x - islands[-1][1] <= gap:
                islands[-1][1] = x
                islands[-1][2] += 1
            else:
                islands.append([x, x, 1])
        return islands

    @settings(max_examples=200, deadline=None)
    @given(
        st.lists(st.integers(min_value=0, max_value=3000), min_size=1, max_size=40),
        st.data(),
    )
    def check(ts, data):
        cut = data.draw(st.integers(min_value=0, max_value=len(ts)))
        first, second = sorted(ts[:cut]), sorted(ts[cut:])
        islands = _merge_islands([[x, x, 1] for x in first], gap)
        merged = sorted(islands + [[x, x, 1] for x in second])
        assert _merge_islands(merged, gap) == brute(ts)

    check()
