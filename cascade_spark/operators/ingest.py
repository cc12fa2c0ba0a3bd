"""Publish path — the reference's write path, Spark-native.

Reference semantics (SURVEY.md §2A R1/R4/R5): producer round-robins
events across brokers (src/producer/main.rs:196), each broker appends to
an append-only log and records the event's position in an 8-byte offset
index (src/broker/main.rs:94-97). We persist the *whole* record (the
reference's intended semantics — its actual code drops timestamp/number,
src/broker/main.rs:96) and make the offset an explicit column.

Scale design — offset assignment at 100 TB:
``monotonically_increasing_id`` is partition-layout-dependent and a
single global ``row_number`` window collapses to one task. Instead we use
the classic two-phase zip-with-index, fully declarative:

1. range-repartition by the total-order key (so partition *p* holds a
   contiguous key range),
2. ``row_number`` within each partition (parallel),
3. broadcast-join the per-partition row counts' cumulative sums and add
   the base — one tiny count aggregation, no global sort on a single task.

Kafka-style per-partition offsets (partition, offset) are
``assign_partitioned_offsets`` — the truly shuffle-free form brokers use.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from cascade_spark.operators._util import barrier


def assign_offsets(df: DataFrame, order_cols: list[str], num_partitions: int = 32) -> DataFrame:
    """Add a dense global ``offset`` column (0-based) following the total
    order of ``order_cols``, without a single-task global window.

    The bucketized frame is checkpointed ONCE before the two consumers
    (per-partition cumsum + per-partition totals) branch off it:
    repartitionByRange picks its boundaries by SAMPLING, so if the
    exchange is ever re-executed instead of reused (AQE plan divergence
    between the branches — observed once at sf0.1), the two branches
    would bucketize differently and the ``_pid`` join would mix
    inconsistent partitionings, silently corrupting the offsets. The
    checkpoint is LAZY since round 12 (same consistency: one checkpointed
    RDD, one exchange; the broadcast-side totals job computes every
    partition first and pins the blocks) — eager=True added a separate
    materialization job per call, one extra full pass charged to each of
    the ~20 consumer queries (A/B: agg_histogram_equi_depth warm 3.39 →
    2.7 s combined with its own rework; all 22 consumer queries
    oracle-checked at sf0.1 after the switch). A long-lived cluster job
    would use a reliable checkpoint instead."""
    part = df.repartitionByRange(num_partitions, *[F.col(c) for c in order_cols])
    part = part.withColumn("_pid", F.spark_partition_id()).transform(barrier)
    w = Window.partitionBy("_pid").orderBy(*[F.col(c) for c in order_cols])
    local = part.withColumn("_local", F.row_number().over(w) - F.lit(1))
    # Tiny aggregate (one row per partition) → cumulative base, broadcast back.
    counts = (
        local.groupBy("_pid")
        .agg(F.count(F.lit(1)).alias("_cnt"))
        .withColumn(
            "_base",
            F.sum("_cnt").over(Window.orderBy("_pid").rowsBetween(Window.unboundedPreceding, -1)),
        )
        .withColumn("_base", F.coalesce(F.col("_base"), F.lit(0)))
        .select("_pid", "_base")
    )
    return (
        local.join(F.broadcast(counts), "_pid")
        .withColumn("offset", (F.col("_base") + F.col("_local")).cast("long"))
        .drop("_pid", "_local", "_base")
    )


def assign_prefix_sum(
    df: DataFrame, order_cols: list[str], value_col: str, num_partitions: int = 32
) -> DataFrame:
    """Add an EXCLUSIVE running total of ``value_col`` (``prefix_sum``)
    following the total order of ``order_cols`` — the same two-phase
    trick as :func:`assign_offsets`, generalized from counting rows to
    summing a value column. Phase 1: range-repartition + per-partition
    cumsum (parallel). Phase 2: one tiny per-partition total aggregate →
    cumulative bases, broadcast back. No single-task global window.
    Bucketization materialized once before branching — see the
    boundary-consistency note in :func:`assign_offsets`."""
    part = df.repartitionByRange(num_partitions, *[F.col(c) for c in order_cols])
    part = part.withColumn("_pid", F.spark_partition_id()).transform(barrier)
    w = (
        Window.partitionBy("_pid")
        .orderBy(*[F.col(c) for c in order_cols])
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    local = part.withColumn("_local", F.sum(value_col).over(w) - F.col(value_col))
    sums = (
        local.groupBy("_pid")
        .agg(F.sum(value_col).alias("_psum"))
        .withColumn(
            "_base",
            F.sum("_psum").over(Window.orderBy("_pid").rowsBetween(Window.unboundedPreceding, -1)),
        )
        .withColumn("_base", F.coalesce(F.col("_base"), F.lit(0)))
        .select("_pid", "_base")
    )
    return (
        local.join(F.broadcast(sums), "_pid")
        .withColumn("prefix_sum", (F.col("_base") + F.col("_local")).cast("long"))
        .drop("_pid", "_local", "_base")
    )


def assign_prefix_sums(
    df: DataFrame,
    order_cols: list[str],
    value_cols: dict[str, str],
    num_partitions: int = 32,
) -> DataFrame:
    """Multi-column :func:`assign_prefix_sum` (round 12): ONE range
    repartition + ONE per-partition window pass computes an exclusive
    running total for every ``value_cols`` entry (source column ->
    output column name). Callers that chained N single-column calls
    paid N range exchanges + N window sorts over the same total order;
    the same-window cumsums here all run inside a single WindowExec."""
    part = df.repartitionByRange(num_partitions, *[F.col(c) for c in order_cols])
    part = part.withColumn("_pid", F.spark_partition_id()).transform(barrier)
    w = (
        Window.partitionBy("_pid")
        .orderBy(*[F.col(c) for c in order_cols])
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    local = part.select(
        "*",
        *[(F.sum(c).over(w) - F.col(c)).alias(f"_local_{c}") for c in value_cols],
    )
    wb = Window.orderBy("_pid").rowsBetween(Window.unboundedPreceding, -1)
    sums = (
        local.groupBy("_pid")
        .agg(*[F.sum(c).alias(f"_psum_{c}") for c in value_cols])
        .select(
            "_pid",
            *[
                F.coalesce(F.sum(f"_psum_{c}").over(wb), F.lit(0)).alias(f"_base_{c}")
                for c in value_cols
            ],
        )
    )
    out = local.join(F.broadcast(sums), "_pid")
    out = out.select(
        "*",
        *[
            (F.col(f"_base_{c}") + F.col(f"_local_{c}")).cast("long").alias(name)
            for c, name in value_cols.items()
        ],
    )
    return out.drop(
        "_pid",
        *[f"_local_{c}" for c in value_cols],
        *[f"_base_{c}" for c in value_cols],
    )


def assign_partitioned_offsets(
    df: DataFrame, key: Column, num_partitions: int, order_cols: list[str]
) -> DataFrame:
    """Kafka-model offsets: hash ``key`` to a partition, offset dense
    within the partition. No cross-partition coordination — this is the
    form that scales linearly with partitions."""
    out = df.withColumn("partition", F.pmod(F.xxhash64(key), F.lit(num_partitions)).cast("int"))
    w = Window.partitionBy("partition").orderBy(*[F.col(c) for c in order_cols])
    return out.withColumn("offset", (F.row_number().over(w) - 1).cast("long"))


def assign_salted_offsets(
    df: DataFrame,
    key: Column,
    num_partitions: int,
    order_cols: list[str],
    salt_buckets: int | None = None,
) -> DataFrame:
    """Skew-hardened offset assignment for hot keys.

    ``assign_partitioned_offsets`` is key-deterministic BY DESIGN: all
    records of one key land in one partition, which is what gives Kafka
    consumers per-key FIFO. The cost is that a hot key (the exact
    condition ``profiling.profile_key_skew`` detects) concentrates its
    whole volume on one partition — at 100 TB that one task is the job.

    When the consumer does NOT need per-key ordering (bulk ingest,
    offset bookkeeping, repartition-for-size), this variant appends a
    deterministic salt — derived from the ordering columns, so replays
    assign identical partitions — and hashes (key, salt). A key's volume
    then spreads over up to ``salt_buckets`` partitions and the max
    partition share is bounded near 1/num_partitions even under 90%-one-
    key skew (pinned in tests/test_scale_features.py).
    """
    # Salt space defaults to 16× the partition count: with only
    # num_partitions salt values a hot key occupies ~P distinct
    # (key,salt) combos and balls-in-bins collisions leave one partition
    # with 2-3× the average (measured 35% share at 8/8); 16P combos of
    # ~0.06% each smooth the max share to ~1/P.
    salt = F.pmod(
        F.xxhash64(*[F.col(c) for c in order_cols]),
        F.lit(salt_buckets or 16 * num_partitions),
    )
    out = df.withColumn(
        "partition", F.pmod(F.xxhash64(key, salt), F.lit(num_partitions)).cast("int")
    )
    w = Window.partitionBy("partition").orderBy(*[F.col(c) for c in order_cols])
    return out.withColumn("offset", (F.row_number().over(w) - 1).cast("long"))


def publish(
    df: DataFrame,
    topic_dir: str,
    order_cols: list[str],
    num_partitions: int = 4,
    topic: str = "test",
) -> None:
    """Append a batch of events to a topic directory (reference R1).

    Round-robin distribution across ``num_partitions`` writers mirrors
    src/producer/main.rs:196 (``clients[i % len]``); the parquet append is
    the durable log, parquet footers+offset column replace index.table.
    """
    with_offsets = assign_offsets(df, order_cols, num_partitions)
    (
        with_offsets.withColumn("topic", F.lit(topic))
        .repartition(num_partitions)  # RoundRobinPartitioning
        .write.mode("append")
        .parquet(topic_dir)
    )
