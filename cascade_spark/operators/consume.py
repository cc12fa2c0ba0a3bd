"""Consume path — offset-addressed reads (reference R2/R3).

The reference's consumer asks a broker for event *n*; the broker does two
index probes and a payload read (src/broker/main.rs:132-164). Here the
offset is a sorted parquet column, so a point/range read is a filter that
Catalyst pushes into the scan — parquet row-group min/max stats skip
everything else, the distributed analog of the index probe.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def consume_at(spark: SparkSession, topic_dir: str, offset: int) -> DataFrame:
    """Point lookup: the reference's literal smoke request is offset 4
    (src/consumer/main.rs:22)."""
    return spark.read.parquet(topic_dir).filter(F.col("offset") == offset)


def consume_range(spark: SparkSession, topic_dir: str, lo: int, hi: int) -> DataFrame:
    """Range consume [lo, hi) — the shape the repeated-Event ack
    anticipates (proto/consume.proto:22)."""
    return (
        spark.read.parquet(topic_dir)
        .filter((F.col("offset") >= lo) & (F.col("offset") < hi))
        .orderBy("offset")
    )


def latest_offset(spark: SparkSession, topic_dir: str) -> int:
    """Last-event resolution (reference R3: n == count-1 special case,
    src/broker/main.rs:136-144)."""
    row = spark.read.parquet(topic_dir).agg(F.max("offset").alias("mx")).collect()[0]
    return -1 if row["mx"] is None else row["mx"]
