"""Rate source — the reference's load generator (R6), Spark-native.

The reference producer's main loop fabricates a bounded event stream —
names 'a'..'j' assigned round-robin, a timestamp, and a random number
per event (src/producer/main.rs:185-216). Spark's ``rate-micro-batch``
source is the engine-native form: each micro-batch emits a deterministic
``value`` sequence, so with a pinned ``startTimestamp`` the whole run is
reproducible — which upgrades the usual "rate sources can't be
hash-checked" rule into a full oracle check. The "random" number is an
md5-derived integer (deterministic across engines), mirroring how every
other hash family in this repo replaces seeded RNG.

At scale: ``numPartitions`` spreads generation across executors; there
is no shuffle — generation, projection and sink are one map-only stage.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from cascade_spark.plans.registry import register


@register(
    "stream_rate_source",
    "streaming",
    doc="Bounded deterministic load generation: rate-micro-batch source "
    "(one AvailableNow batch of 1000 rows across 4 partitions, epoch "
    "start) → producer-loop projection (round-robin event name "
    "'a'..'j', md5-derived number) — hash-checked against a relational "
    "range() oracle.",
    oracle="""
SELECT CAST(v AS BIGINT) AS value,
       SUBSTR('abcdefghij', CAST(v % 10 AS INT) + 1, 1) AS event_name,
       ('0x' || SUBSTR(MD5(CAST(v AS VARCHAR)), 1, 8))::BIGINT AS number
FROM range(1000) t(v)
ORDER BY value
""",
)
def stream_rate_source(spark, sf_dir):
    from cascade_spark.streaming.pipeline import run_to_memory

    src = (
        spark.readStream.format("rate-micro-batch")
        .option("rowsPerBatch", 1000)
        .option("numPartitions", 4)
        .option("startTimestamp", 0)
        .load()
    )
    batch = run_to_memory(src, "append")
    return batch.select(
        F.col("value").cast("long").alias("value"),
        F.substring(F.lit("abcdefghij"), (F.col("value") % 10).cast("int") + 1, 1).alias(
            "event_name"
        ),
        F.conv(F.substring(F.md5(F.col("value").cast("string")), 1, 8), 16, 10)
        .cast("long")
        .alias("number"),
    ).orderBy("value")
