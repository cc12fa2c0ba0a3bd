"""Watermark late-data semantics, demonstrated precisely.

Spark's watermark drop is best-effort for windows whose state still
exists, but HARD for windows already emitted+evicted in a previous
micro-batch (append mode can never revise an emitted row). The test
targets the hard guarantee: a late event aimed at an already-emitted
window must not change it, and the window must not be re-emitted."""

from __future__ import annotations

import datetime
import time

from pyspark.sql import functions as F


def test_late_event_cannot_revise_emitted_window(spark, tmp_path):
    indir = str(tmp_path / "in")
    schema = "event_id long, ts timestamp, value double"
    ts = lambda s: datetime.datetime.fromisoformat("2024-01-01 " + s)  # noqa: E731

    def write_file(rows):
        spark.createDataFrame(rows, schema).coalesce(1).write.mode("append").parquet(indir)
        time.sleep(1.1)  # distinct mtimes → deterministic file order

    # batch 0: 10:00 window gets 2 events; 12:00 sets the watermark to
    # 11:50 at batch end
    write_file([(1, ts("10:00:00"), 1.0), (2, ts("10:05:00"), 1.0), (3, ts("12:00:00"), 1.0)])
    # batch 1 runs WITH wm=11:50: the 10:00-10:10 window is emitted and
    # evicted at its end (emission lags the watermark by one batch)
    write_file([(5, ts("13:00:00"), 1.0)])
    # batch 2: event 4 is LATE into the already-emitted 10:00 window —
    # the hard guarantee: dropped, never merged or re-emitted
    write_file([(4, ts("10:03:00"), 1.0), (7, ts("14:00:00"), 1.0)])
    # batch 3: flush marker so every remaining window emits
    write_file([(6, ts("23:00:00"), 1.0)])

    src = spark.readStream.schema(schema).option("maxFilesPerTrigger", 1).parquet(indir)
    agg = (
        src.withWatermark("ts", "10 minutes")
        .groupBy(F.window("ts", "10 minutes").alias("w"))
        .agg(F.count(F.lit(1)).alias("n"))
        .select(F.date_format("w.start", "HH:mm").alias("w_start"), "n")
    )
    q = (
        agg.writeStream.outputMode("append")
        .format("memory")
        .queryName("late_demo")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    rows = spark.table("late_demo").collect()

    starts = [r["w_start"] for r in rows]
    got = {r["w_start"]: r["n"] for r in rows}
    # each window emitted exactly once (append mode: no revisions)
    assert len(starts) == len(set(starts)), rows
    # the emitted 10:00 window holds only the 2 on-time events — the
    # late event 4 was dropped, not merged, not re-emitted
    assert got["10:00"] == 2, rows
    assert got["12:00"] == 1 and got["13:00"] == 1 and got["14:00"] == 1, rows


def test_tws_counter_matches_batch_aggregate(spark, sf_dir):
    """Spark 4 transformWithStateInPandas running counter — skips where
    the container's protobuf can't support the state-server worker
    (probe-gated registration, STATUS.md §9)."""
    import pytest

    from cascade_spark.streaming.stateful import tws_available

    if not tws_available():
        pytest.skip("google.protobuf unavailable — transformWithStateInPandas gated off")

    from cascade_spark.plans.registry import load_all

    got = load_all()["stream_tws_counter"].builder(spark, sf_dir).collect()
    from cascade_spark.tables import load as lt
    from pyspark.sql import functions as F

    want = (
        lt(spark, sf_dir, "events")
        .groupBy("user_id")
        .agg(F.count(F.lit(1)).alias("n_events"))
        .orderBy("user_id")
        .collect()
    )
    assert [tuple(r) for r in got] == [tuple(r) for r in want]
