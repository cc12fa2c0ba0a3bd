"""Batch sessionization — gap-based session assignment over the events
stream (the batch mirror of streaming ``session_window``; reference has
only the raw event log, SURVEY.md §2A R1/R2).

The classic two-window construction: flag rows whose gap to the previous
event (per user) exceeds the threshold, then a running sum of flags
yields the session index. Both windows share one shuffle on user_id —
Catalyst plans a single Exchange followed by two WindowExecs over the
same sort order, and the per-session aggregate reuses the same
partitioning. At 100 TB this is the canonical "one shuffle, then
sorted-run processing" pattern; no driver-side state.
"""

from __future__ import annotations

from pyspark.sql import Window, functions as F

from cascade_spark.plans.registry import register
from cascade_spark.operators._util import bigint, t

GAP_MIN = 30


@register(
    "events_sessionize_gap",
    "analytics",
    doc=f"Gap-based sessionization ({GAP_MIN}-minute inactivity gap): "
    "lag + cumulative-flag-sum windows per user, then per-session "
    "aggregate — event count, start, duration, peak value.",
    oracle=f"""
WITH gaps AS (
    SELECT user_id, event_id, ts, value,
           CASE WHEN LAG(ts) OVER w IS NULL
                  OR ts > LAG(ts) OVER w + INTERVAL {GAP_MIN} MINUTE
                THEN 1 ELSE 0 END AS new_sess
    FROM events
    WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
),
sess AS (
    SELECT user_id, ts, value,
           SUM(new_sess) OVER (PARTITION BY user_id ORDER BY ts, event_id
                               ROWS UNBOUNDED PRECEDING) AS session_idx
    FROM gaps
)
SELECT user_id,
       CAST(session_idx AS BIGINT) AS session_idx,
       CAST(COUNT(*) AS BIGINT) AS n_events,
       STRFTIME(MIN(ts), '%Y-%m-%d %H:%M:%S') AS session_start,
       CAST(DATE_DIFF('second', MIN(ts), MAX(ts)) AS BIGINT) AS duration_s,
       MAX(value) AS max_value
FROM sess
GROUP BY user_id, session_idx
ORDER BY user_id, session_idx
""",
)
def events_sessionize_gap(spark, sf_dir):
    ev = t(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    prev = F.lag("ts").over(w)
    flagged = ev.select(
        "user_id",
        "event_id",
        "ts",
        "value",
        F.when(
            prev.isNull() | (F.col("ts") > prev + F.expr(f"INTERVAL {GAP_MIN} MINUTES")),
            1,
        )
        .otherwise(0)
        .alias("new_sess"),
    )
    sess = flagged.select(
        "user_id",
        "ts",
        "value",
        F.sum("new_sess").over(w.rowsBetween(Window.unboundedPreceding, 0)).alias("session_idx"),
    )
    return (
        sess.groupBy("user_id", bigint(F.col("session_idx")).alias("session_idx"))
        .agg(
            bigint(F.count(F.lit(1))).alias("n_events"),
            F.date_format(F.min("ts"), "yyyy-MM-dd HH:mm:ss").alias("session_start"),
            (F.unix_timestamp(F.max("ts")) - F.unix_timestamp(F.min("ts")))
            .cast("long")
            .alias("duration_s"),
            F.max("value").alias("max_value"),
        )
        .orderBy("user_id", "session_idx")
    )
