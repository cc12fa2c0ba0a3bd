"""foreachBatch sink — the streaming→custom-sink bridge (SURVEY.md §2B).

The reference's drain task (R12, src/producer/main.rs:87-106) was meant
to pull from the ring buffer and publish to brokers; foreachBatch is the
Spark form of that bridge: each micro-batch DataFrame is handed to
arbitrary batch-sink code with an epoch id for idempotence. Here it
performs the intended drain semantics — append each batch to the durable
topic directory with the batch id stamped for exactly-once bookkeeping.
"""

from __future__ import annotations

import os

from pyspark.sql import functions as F

from cascade_spark.plans.registry import register
from cascade_spark.streaming.pipeline import stage_stream_input


@register(
    "stream_foreachbatch_sink",
    "streaming",
    doc="foreachBatch drain (intended R12 semantics): micro-batches "
    "appended to a topic dir with epoch ids; total drained rows equals "
    "the source exactly.",
    oracle="""
SELECT COUNT(*) AS n_drained, COUNT(DISTINCT event_id) AS n_distinct
FROM events
""",
)
def stream_foreachbatch_sink(spark, sf_dir):
    indir, schema, tmp, _ = stage_stream_input(spark, sf_dir, n_files=4)
    outdir = os.path.join(tmp, "drained")

    def drain(batch_df, epoch_id: int) -> None:
        (
            batch_df.withColumn("epoch", F.lit(epoch_id))
            .write.mode("append")
            .parquet(outdir)
        )

    q = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 2)
        .parquet(indir)
        .writeStream.foreachBatch(drain)
        .option("checkpointLocation", os.path.join(tmp, "drain_ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    drained = spark.read.parquet(outdir)
    return drained.agg(
        F.count(F.lit(1)).alias("n_drained"),
        F.countDistinct("event_id").alias("n_distinct"),
    )
