"""Time-series resampling — order-sensitive downsampling (OHLC bars).

``events_time_rollup`` aggregates order-insensitive measures per time
bucket; this module adds the order-SENSITIVE downsample every metrics /
market-data pipeline needs: open (first value in the bucket), close
(last), high, low, volume. First/last are resolved by the total order
(ts, event_id) so results are deterministic under any partitioning.

Plan shape: one shuffle on the (day, event_type) bucket key serves both
row_number windows (same partition key, opposite sort order — Spark
sorts twice within the exchange, never re-shuffles) and the final
aggregate. At 100 TB the bucket key is also the table's partition
column, so the exchange disappears entirely under a partition-aligned
layout.
"""

from __future__ import annotations

from pyspark.sql import Window, functions as F

from cascade_spark.plans.registry import register
from cascade_spark.operators._util import d2, dec, t


@register(
    "events_resample_ohlc",
    "analytics",
    doc="OHLC downsample: per (day, event_type) bar with open/close "
    "resolved by the (ts, event_id) total order, high/low/volume/total "
    "as plain aggregates. One bucket-key shuffle serves both orderings "
    "and the aggregate.",
    oracle="""
WITH seq AS (
    SELECT STRFTIME(DATE_TRUNC('day', ts), '%Y-%m-%d') AS day,
           event_type, value,
           ROW_NUMBER() OVER (PARTITION BY DATE_TRUNC('day', ts), event_type
                              ORDER BY ts, event_id) AS rn_a,
           ROW_NUMBER() OVER (PARTITION BY DATE_TRUNC('day', ts), event_type
                              ORDER BY ts DESC, event_id DESC) AS rn_d
    FROM events
)
SELECT day, event_type,
       CAST(ROUND(MAX(CASE WHEN rn_a = 1 THEN CAST(value AS DECIMAL(12,4)) END), 2) AS DOUBLE) AS open,
       CAST(ROUND(MAX(CAST(value AS DECIMAL(12,4))), 2) AS DOUBLE) AS high,
       CAST(ROUND(MIN(CAST(value AS DECIMAL(12,4))), 2) AS DOUBLE) AS low,
       CAST(ROUND(MAX(CASE WHEN rn_d = 1 THEN CAST(value AS DECIMAL(12,4)) END), 2) AS DOUBLE) AS close,
       COUNT(*) AS volume,
       CAST(ROUND(SUM(CAST(value AS DECIMAL(12,4))), 2) AS DOUBLE) AS total
FROM seq
GROUP BY day, event_type
ORDER BY day, event_type
""",
)
def events_resample_ohlc(spark, sf_dir):
    ev = t(spark, sf_dir, "events").select(
        F.date_format(F.date_trunc("day", "ts"), "yyyy-MM-dd").alias("day"),
        "event_type",
        "ts",
        "event_id",
        "value",
    )
    wa = Window.partitionBy("day", "event_type").orderBy("ts", "event_id")
    wd = Window.partitionBy("day", "event_type").orderBy(
        F.col("ts").desc(), F.col("event_id").desc()
    )
    seq = ev.select(
        "day",
        "event_type",
        "value",
        F.row_number().over(wa).alias("rn_a"),
        F.row_number().over(wd).alias("rn_d"),
    )
    return (
        seq.groupBy("day", "event_type")
        .agg(
            d2(F.max(F.when(F.col("rn_a") == 1, dec("value")))).alias("open"),
            d2(F.max(dec("value"))).alias("high"),
            d2(F.min(dec("value"))).alias("low"),
            d2(F.max(F.when(F.col("rn_d") == 1, dec("value")))).alias("close"),
            F.count(F.lit(1)).alias("volume"),
            d2(F.sum(dec("value"))).alias("total"),
        )
        .orderBy("day", "event_type")
    )
