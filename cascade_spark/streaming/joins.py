"""Stream-stream join — attribution over two live event streams.

Clicks joined to purchases per user within a 1-hour attribution window:
both sides are streaming sources with watermarks and a time-bound join
condition, the canonical Spark stream-stream inner join. Inner matches
emit as soon as both sides arrive; the watermark + time bound let the
state store evict rows older than the attribution window — the property
that keeps state finite on an unbounded 100 TB/day stream.

Verified against the batch self-join oracle (replay equivalence).
"""

from __future__ import annotations


from pyspark.sql import functions as F

from cascade_spark.plans.registry import register
from cascade_spark.streaming.pipeline import (
    run_to_memory,
    stage_stream_input,
    state_partitions,
)


@register(
    "stream_stream_join",
    "streaming",
    doc="Streaming click→purchase attribution: two watermarked streams, "
    "time-bound inner join (click within 1h before the purchase), state "
    "evicted beyond the window. Oracle: the equivalent batch self-join.",
    oracle="""
SELECT p.event_id AS purchase_id, c.event_id AS click_id, p.user_id
FROM events p JOIN events c
  ON c.user_id = p.user_id
 AND p.event_type = 'purchase' AND c.event_type = 'click'
 AND c.ts BETWEEN p.ts - INTERVAL 1 HOUR AND p.ts
ORDER BY purchase_id, click_id
""",
)
def stream_stream_join(spark, sf_dir):
    indir, schema, _, wm = stage_stream_input(spark, sf_dir, n_files=4)
    clicks = (
        spark.readStream.schema(schema)
        .parquet(indir)
        .filter(F.col("event_type") == "click")
        .withWatermark("ts", "2 hours")
        .alias("c")
    )
    purchases = (
        spark.readStream.schema(schema)
        .parquet(indir)
        .filter(F.col("event_type") == "purchase")
        .withWatermark("ts", "2 hours")
        .alias("p")
    )
    joined = purchases.join(
        clicks,
        F.expr(
            "c.user_id = p.user_id AND c.ts BETWEEN p.ts - INTERVAL 1 HOUR AND p.ts"
        ),
        "inner",
    ).select(
        F.col("p.event_id").alias("purchase_id"),
        F.col("c.event_id").alias("click_id"),
        F.col("p.user_id").alias("user_id"),
    )
    with state_partitions(spark, 8):
        out = run_to_memory(joined, "append")
    return out.orderBy("purchase_id", "click_id")
