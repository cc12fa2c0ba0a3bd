"""Round-9 wave-2 — classical technical/operational indicators over the
daily event-volume series, extending the timeseries family (EWMA / Holt
/ seasonal-naive / CUSUM live in timeseries*.py; these add the
bounded-window band monitor, the Wilder-smoothed momentum readout, the
long-range-dependence audit, and the intermittent-demand forecaster):

- ``events_rsi_wilder``: RSI-14 with Wilder smoothing, the level/loss
  recurrences in micro-scaled int64 floor arithmetic (ag_t =
  (13*ag_(t-1) + gain_t*S) DIV 14) so Spark's aggregate() fold and the
  DuckDB recursive CTE are bit-identical (the Holt discipline).
- ``events_bollinger_breach``: 7-day trailing mean +- 2 sigma band
  breaches decided by EXACT integer cross-multiplication —
  (n*x - S)^2 > 4*(n*Q - S^2) — no sqrt, no float, per-type bounded
  windows over the day spine.
- ``events_hurst_rs``: the rescaled-range (R/S) statistic per type,
  with cumulative deviations kept integral by n-scaling
  (D_t = n*prefix_t - t*S) and ONE mirrored IEEE sqrt/ln at the end
  (tau-b precedent).
- ``events_croston_demand``: Croston's intermittent-demand method
  (alpha = 1/2 dyadic) on daily purchase-value-bearing counts — size
  and inter-arrival EWMAs in exact micro integers, forecast as one
  integer rational.

Reference scope: the reference engine is an event log
(src/broker/main.rs consume path); each query is a declared aggregate
over the consumed ``events`` table per SURVEY §2B.

Scale (100 TB): the log collapses to the (type x day) grid in one
combinable groupBy; every window/recurrence runs on the bounded day
spine per type (spans, not rows) — JVM HOFs or spine-bounded windows,
no Python, no driver loops, no unbounded state.
"""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F

from cascade_spark.operators._util import bigint, t
from cascade_spark.plans.registry import register

RSI_PERIOD = 14
IND_SCALE = 1_000_000  # micro-units for smoothed state

# zero-filled (type x day x tt x v) grid — the inference-family spine
_GRID_SQL = """
days AS (SELECT DISTINCT CAST(ts AS DATE) AS day FROM events),
types AS (SELECT DISTINCT event_type FROM events),
daily AS (
    SELECT event_type, CAST(ts AS DATE) AS day, CAST(COUNT(*) AS BIGINT) AS v
    FROM events GROUP BY 1, 2
),
cell AS (
    SELECT t.event_type, d.day,
           CAST(ROW_NUMBER() OVER (PARTITION BY t.event_type ORDER BY d.day)
                - 1 AS BIGINT) AS tt,
           COALESCE(x.v, 0) AS v
    FROM types t CROSS JOIN days d
    LEFT JOIN daily x ON x.event_type = t.event_type AND x.day = d.day
)
"""


_GRID_CACHE: dict = {}


def _grid(spark, sf_dir):
    """Shared per-(app, sf_dir) materialized grid: ~16 indicator/
    momentum/burst/ordinal queries each rebuilt this spine (3 events
    scans + a window), and most reference it 2-3x per query — without a
    barrier every reference re-ran the whole build (guide §2.4)."""
    from cascade_spark.operators.dedup import _cached_frame

    def build():
        ev = t(spark, sf_dir, "events").select(
            "event_type", F.to_date("ts").alias("day")
        )
        days = ev.select("day").distinct()
        types = ev.select("event_type").distinct()
        daily = ev.groupBy("event_type", "day").agg(
            F.count(F.lit(1)).cast("long").alias("v")
        )
        return (
            types.crossJoin(F.broadcast(days))
            .join(daily, ["event_type", "day"], "left")
            .select(
                "event_type",
                "day",
                (
                    F.row_number().over(
                        Window.partitionBy("event_type").orderBy("day")
                    )
                    - 1
                )
                .cast("long")
                .alias("tt"),
                F.coalesce("v", F.lit(0)).cast("long").alias("v"),
            )
        )

    return _cached_frame(_GRID_CACHE, spark, sf_dir, build)


def _series_arr(grid):
    """Collapse the grid to one ordered (tt, v) array per type — the
    holt-forecast fold input (n_days elements, JVM-side)."""
    return grid.groupBy("event_type").agg(
        F.array_sort(F.collect_list(F.struct("tt", "v"))).alias("arr")
    )


@register(
    "events_rsi_wilder",
    "timeseries",
    doc=f"RSI-{RSI_PERIOD} with Wilder smoothing per event type: deltas "
    "of the zero-filled daily volumes split into gain/loss, smoothed by "
    f"a_t = (({RSI_PERIOD - 1})*a_(t-1) + x_t*S) DIV {RSI_PERIOD} in "
    "micro-scaled int64 (exactly the dyadic-EWMA determinism contract, "
    "generalized to 1/14), RSI = 10000*ag/(ag+al) in truncated bp. "
    "Spark folds the day array in one aggregate() HOF; the oracle walks "
    "the identical recurrence as a recursive CTE — bit-identical.",
    oracle=f"""
WITH RECURSIVE {_GRID_SQL},
rec(event_type, tt, ag, al) AS (
    SELECT event_type, tt, CAST(0 AS BIGINT), CAST(0 AS BIGINT)
    FROM cell WHERE tt = 0
    UNION ALL
    SELECT c.event_type, c.tt,
           ({RSI_PERIOD - 1} * r.ag + GREATEST(c.v - p.v, 0) * {IND_SCALE})
               // {RSI_PERIOD},
           ({RSI_PERIOD - 1} * r.al + GREATEST(p.v - c.v, 0) * {IND_SCALE})
               // {RSI_PERIOD}
    FROM rec r
    JOIN cell c ON c.event_type = r.event_type AND c.tt = r.tt + 1
    JOIN cell p ON p.event_type = r.event_type AND p.tt = r.tt
),
fin AS (
    SELECT event_type, ag, al,
           ROW_NUMBER() OVER (PARTITION BY event_type ORDER BY tt DESC) AS rk
    FROM rec
)
SELECT event_type, CAST(ag AS BIGINT) AS avg_gain_micro,
       CAST(al AS BIGINT) AS avg_loss_micro,
       CAST(CASE WHEN ag + al = 0 THEN 5000
                 ELSE (10000 * ag) // (ag + al) END AS BIGINT) AS rsi_bp
FROM fin WHERE rk = 1
ORDER BY event_type
""",
)
def events_rsi_wilder(spark, sf_dir):
    series = _series_arr(_grid(spark, sf_dir))
    folded = series.select(
        "event_type",
        F.expr(
            f"""
            aggregate(
                slice(arr, 2, size(arr) - 1),
                named_struct('ag', CAST(0 AS BIGINT), 'al', CAST(0 AS BIGINT),
                             'pv', arr[0].v),
                (acc, e) -> named_struct(
                    'ag', ({RSI_PERIOD - 1} * acc.ag
                           + GREATEST(e.v - acc.pv, 0) * {IND_SCALE})
                          DIV {RSI_PERIOD},
                    'al', ({RSI_PERIOD - 1} * acc.al
                           + GREATEST(acc.pv - e.v, 0) * {IND_SCALE})
                          DIV {RSI_PERIOD},
                    'pv', e.v),
                acc -> acc)
            """
        ).alias("st"),
    )
    return folded.select(
        "event_type",
        bigint(F.col("st.ag")).alias("avg_gain_micro"),
        bigint(F.col("st.al")).alias("avg_loss_micro"),
        F.expr(
            "CAST(CASE WHEN st.ag + st.al = 0 THEN 5000"
            " ELSE (10000 * st.ag) DIV (st.ag + st.al) END AS BIGINT)"
        ).alias("rsi_bp"),
    ).orderBy("event_type")


BOLL_WINDOW = 7


@register(
    "events_bollinger_breach",
    "timeseries",
    doc=f"Bollinger band monitor: {BOLL_WINDOW}-day trailing mean +- 2 "
    "sigma on each type's zero-filled daily volumes, breach decided by "
    "EXACT integer cross-multiplication — upper iff n*x - S > 0 AND "
    "(n*x - S)^2 > 4*(n*Q - S^2) (population sigma; the n^2 "
    "denominators cancel), squares in DECIMAL(38,0)/HUGEINT. Only full "
    "windows count. Reports per-type breach counts — the anomaly-band "
    "sibling of events_anomaly_zscore with zero IEEE ops.",
    oracle=f"""
WITH {_GRID_SQL},
win AS (
    SELECT event_type, tt, v,
           CAST(COUNT(*) OVER w AS BIGINT) AS n_w,
           CAST(SUM(v) OVER w AS BIGINT) AS s_w,
           CAST(SUM(v * v) OVER w AS BIGINT) AS q_w
    FROM cell
    WINDOW w AS (PARTITION BY event_type ORDER BY tt
                 ROWS BETWEEN {BOLL_WINDOW - 1} PRECEDING AND CURRENT ROW)
),
full_w AS (
    SELECT event_type,
           CAST(n_w AS HUGEINT) * v - s_w AS dev,
           CAST(n_w AS HUGEINT) * q_w - CAST(s_w AS HUGEINT) * s_w AS var_n2
    FROM win WHERE n_w = {BOLL_WINDOW}
)
SELECT event_type,
       CAST(COUNT(*) AS BIGINT) AS n_windows,
       CAST(COUNT(*) FILTER (WHERE dev > 0 AND dev * dev > 4 * var_n2)
            AS BIGINT) AS n_upper_breach,
       CAST(COUNT(*) FILTER (WHERE dev < 0 AND dev * dev > 4 * var_n2)
            AS BIGINT) AS n_lower_breach
FROM full_w
GROUP BY event_type
ORDER BY event_type
""",
)
def events_bollinger_breach(spark, sf_dir):
    grid = _grid(spark, sf_dir)
    w = (
        Window.partitionBy("event_type")
        .orderBy("tt")
        .rowsBetween(-(BOLL_WINDOW - 1), 0)
    )
    win = grid.select(
        "event_type",
        "v",
        F.count(F.lit(1)).over(w).cast("long").alias("n_w"),
        F.sum("v").over(w).cast("long").alias("s_w"),
        F.sum(F.col("v") * F.col("v")).over(w).cast("long").alias("q_w"),
    ).filter(F.col("n_w") == BOLL_WINDOW)
    dev = F.col("n_w").cast("decimal(38,0)") * F.col("v") - F.col("s_w")
    var_n2 = (
        F.col("n_w").cast("decimal(38,0)") * F.col("q_w")
        - F.col("s_w").cast("decimal(38,0)") * F.col("s_w")
    )
    flagged = win.select(
        "event_type", dev.alias("dev"), var_n2.alias("var_n2")
    )
    return (
        flagged.groupBy("event_type")
        .agg(
            bigint(F.count(F.lit(1))).alias("n_windows"),
            bigint(
                F.coalesce(
                    F.sum(
                        F.when(
                            (F.col("dev") > 0)
                            & (F.col("dev") * F.col("dev") > 4 * F.col("var_n2")),
                            1,
                        ).otherwise(0)
                    ),
                    F.lit(0),
                )
            ).alias("n_upper_breach"),
            bigint(
                F.coalesce(
                    F.sum(
                        F.when(
                            (F.col("dev") < 0)
                            & (F.col("dev") * F.col("dev") > 4 * F.col("var_n2")),
                            1,
                        ).otherwise(0)
                    ),
                    F.lit(0),
                )
            ).alias("n_lower_breach"),
        )
        .orderBy("event_type")
    )


@register(
    "events_hurst_rs",
    "timeseries",
    doc="Rescaled-range (R/S) long-range-dependence audit per event "
    "type: cumulative deviations kept INTEGRAL by n-scaling "
    "(D_t = n*prefix_t - t*S, so the 1/n mean never divides), "
    "R*n = max D - min D, and R/S = (max D - min D)/sqrt(n*Q - S^2) "
    "(the n's cancel against the population sigma) — one mirrored IEEE "
    "sqrt rounded to 6 dp, plus the Hurst proxy ln(R/S)/ln(n/2) "
    "(mirrored ln, 6 dp; 0.0 on degenerate series). Prefix sums run "
    "over the bounded day spine per type.",
    oracle=f"""
WITH {_GRID_SQL},
st AS (
    SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n,
           CAST(SUM(v) AS BIGINT) AS s, CAST(SUM(v * v) AS BIGINT) AS q
    FROM cell GROUP BY event_type
),
pre AS (
    SELECT c.event_type,
           CAST(st.n AS HUGEINT)
               * SUM(c.v) OVER (PARTITION BY c.event_type ORDER BY c.tt)
               - (c.tt + 1) * st.s AS dev
    FROM cell c JOIN st ON st.event_type = c.event_type
),
rng AS (
    SELECT event_type,
           CAST(MAX(dev) - MIN(dev) AS HUGEINT) AS r_n
    FROM pre GROUP BY event_type
)
SELECT st.event_type, st.n AS n_days,
       CAST(rng.r_n AS BIGINT) AS range_scaled,
       CASE WHEN st.n * st.q - st.s * st.s <= 0 OR rng.r_n <= 0 THEN 0.0
            ELSE ROUND(CAST(rng.r_n AS DOUBLE)
                 / SQRT(CAST(st.n AS DOUBLE) * st.q - CAST(st.s AS DOUBLE) * st.s), 6)
       END AS rs_ratio,
       CASE WHEN st.n * st.q - st.s * st.s <= 0 OR rng.r_n <= 0 OR st.n <= 2
            THEN 0.0
            ELSE ROUND(LN(CAST(rng.r_n AS DOUBLE)
                 / SQRT(CAST(st.n AS DOUBLE) * st.q - CAST(st.s AS DOUBLE) * st.s))
                 / LN(st.n / 2.0), 6)
       END AS hurst_proxy
FROM st JOIN rng ON rng.event_type = st.event_type
ORDER BY st.event_type
""",
)
def events_hurst_rs(spark, sf_dir):
    grid = _grid(spark, sf_dir)
    st = grid.groupBy("event_type").agg(
        bigint(F.count(F.lit(1))).alias("n"),
        bigint(F.sum("v")).alias("s"),
        bigint(F.sum(F.col("v") * F.col("v"))).alias("q"),
    )
    wp = Window.partitionBy("event_type").orderBy("tt")
    pre = grid.join(F.broadcast(st), "event_type").select(
        "event_type",
        (
            F.col("n").cast("decimal(38,0)") * F.sum("v").over(wp)
            - (F.col("tt") + 1) * F.col("s")
        ).alias("dev"),
    )
    rng = pre.groupBy("event_type").agg(
        (F.max("dev") - F.min("dev")).cast("decimal(38,0)").alias("r_n")
    )
    den = (
        F.col("n").cast("double") * F.col("q")
        - F.col("s").cast("double") * F.col("s")
    )
    degenerate = (
        (F.col("n") * F.col("q") - F.col("s") * F.col("s") <= 0)
        | (F.col("r_n") <= 0)
    )
    rs = F.round(F.col("r_n").cast("double") / F.sqrt(den), 6)
    hurst = F.round(
        F.log(F.col("r_n").cast("double") / F.sqrt(den)) / F.log(F.col("n") / 2.0),
        6,
    )
    return (
        st.join(rng, "event_type")
        .select(
            "event_type",
            F.col("n").alias("n_days"),
            F.col("r_n").cast("long").alias("range_scaled"),
            F.when(degenerate, F.lit(0.0)).otherwise(rs).alias("rs_ratio"),
            F.when(degenerate | (F.col("n") <= 2), F.lit(0.0))
            .otherwise(hurst)
            .alias("hurst_proxy"),
        )
        .orderBy("event_type")
    )


@register(
    "events_croston_demand",
    "timeseries",
    doc="Croston's intermittent-demand forecast per event type (alpha = "
    "1/2 dyadic) over the zero-filled daily volumes: on each nonzero "
    "day, size EWMA z' = (z + v*S) DIV 2 and inter-arrival EWMA "
    "p' = (p + gap*S) DIV 2, initialized from the first nonzero day "
    "(z = v*S, p = (tt+1)*S); forecast per day = (z * 10000) DIV p in "
    "bp of a unit. All integer floor arithmetic — Spark folds the day "
    "array in one HOF, the oracle walks the identical recursive CTE. "
    "Types with no nonzero day report zeros.",
    oracle=f"""
WITH RECURSIVE {_GRID_SQL},
rec(event_type, tt, z, p, seen, n_demand) AS (
    SELECT event_type, tt,
           CASE WHEN v > 0 THEN v * {IND_SCALE} ELSE CAST(0 AS BIGINT) END,
           CASE WHEN v > 0 THEN (tt + 1) * {IND_SCALE} ELSE CAST(0 AS BIGINT) END,
           CASE WHEN v > 0 THEN tt ELSE CAST(-1 AS BIGINT) END,
           CASE WHEN v > 0 THEN CAST(1 AS BIGINT) ELSE CAST(0 AS BIGINT) END
    FROM cell WHERE tt = 0
    UNION ALL
    SELECT c.event_type, c.tt,
           CASE WHEN c.v = 0 THEN r.z
                WHEN r.seen < 0 THEN c.v * {IND_SCALE}
                ELSE (r.z + c.v * {IND_SCALE}) // 2 END,
           CASE WHEN c.v = 0 THEN r.p
                WHEN r.seen < 0 THEN (c.tt + 1) * {IND_SCALE}
                ELSE (r.p + (c.tt - r.seen) * {IND_SCALE}) // 2 END,
           CASE WHEN c.v > 0 THEN c.tt ELSE r.seen END,
           r.n_demand + CASE WHEN c.v > 0 THEN 1 ELSE 0 END
    FROM rec r JOIN cell c ON c.event_type = r.event_type AND c.tt = r.tt + 1
),
fin AS (
    SELECT event_type, z, p, n_demand,
           ROW_NUMBER() OVER (PARTITION BY event_type ORDER BY tt DESC) AS rk
    FROM rec
)
SELECT event_type, n_demand,
       CAST(z AS BIGINT) AS size_micro, CAST(p AS BIGINT) AS interval_micro,
       CAST(CASE WHEN p = 0 THEN 0 ELSE (z * 10000) // p END AS BIGINT)
           AS forecast_bp
FROM fin WHERE rk = 1
ORDER BY event_type
""",
)
def events_croston_demand(spark, sf_dir):
    series = _series_arr(_grid(spark, sf_dir))
    folded = series.select(
        "event_type",
        F.expr(
            f"""
            aggregate(
                arr,
                named_struct('z', CAST(0 AS BIGINT), 'p', CAST(0 AS BIGINT),
                             'seen', CAST(-1 AS BIGINT),
                             'nd', CAST(0 AS BIGINT)),
                (acc, e) -> named_struct(
                    'z', CASE WHEN e.v = 0 THEN acc.z
                              WHEN acc.seen < 0 THEN e.v * {IND_SCALE}
                              ELSE (acc.z + e.v * {IND_SCALE}) DIV 2 END,
                    'p', CASE WHEN e.v = 0 THEN acc.p
                              WHEN acc.seen < 0 THEN (e.tt + 1) * {IND_SCALE}
                              ELSE (acc.p + (e.tt - acc.seen) * {IND_SCALE})
                                   DIV 2 END,
                    'seen', IF(e.v > 0, e.tt, acc.seen),
                    'nd', acc.nd + IF(e.v > 0, CAST(1 AS BIGINT),
                                      CAST(0 AS BIGINT))),
                acc -> acc)
            """
        ).alias("st"),
    )
    return folded.select(
        "event_type",
        bigint(F.col("st.nd")).alias("n_demand"),
        bigint(F.col("st.z")).alias("size_micro"),
        bigint(F.col("st.p")).alias("interval_micro"),
        F.expr(
            "CAST(CASE WHEN st.p = 0 THEN 0"
            " ELSE (st.z * 10000) DIV st.p END AS BIGINT)"
        ).alias("forecast_bp"),
    ).orderBy("event_type")


HW_PERIOD = 7


@register(
    "events_holt_winters",
    "timeseries",
    doc="Additive Holt-Winters (alpha = beta = gamma = 1/2, season "
    f"m = {HW_PERIOD}) per event type over the zero-filled daily "
    "volumes, ALL state in micro-scaled integers with floor-by-2 "
    "steps: l' = ((x*S - s_old) + l + b) DIV 2; b' = ((l'-l) + b) "
    "DIV 2; s' = ((x*S - l') + s_old) DIV 2 (seasonal slots start at "
    "0, so early steps degrade gracefully to Holt — declared init). "
    "The 7-slot seasonal vector rides INSIDE the fold accumulator "
    "(array field in the Spark HOF struct; explicit 7-way CASE "
    "rebuild in the DuckDB recursive CTE) — bit-identical engines, "
    "the events_holt_linear_forecast discipline extended with "
    "seasonality. Emits final level/trend, the next seasonal slot, "
    "and h=1 / h=7 forecasts.",
    oracle=f"""
WITH RECURSIVE {_GRID_SQL},
rec(event_type, tt, l, b, sea) AS (
    SELECT event_type, tt, v * {IND_SCALE}, CAST(0 AS BIGINT),
           [CAST(0 AS BIGINT), 0, 0, 0, 0, 0, 0]
    FROM cell WHERE tt = 0
    UNION ALL
    SELECT c.event_type, c.tt,
           ((c.v * {IND_SCALE} - r.sea[CAST(c.tt % {HW_PERIOD} AS INT) + 1])
            + r.l + r.b) // 2,
           ((((c.v * {IND_SCALE} - r.sea[CAST(c.tt % {HW_PERIOD} AS INT) + 1])
              + r.l + r.b) // 2) - r.l + r.b) // 2,
           [
             CASE WHEN CAST(c.tt % {HW_PERIOD} AS INT) + 1 = 1
                  THEN ((c.v * {IND_SCALE}
                         - ((c.v * {IND_SCALE} - r.sea[CAST(c.tt % {HW_PERIOD} AS INT) + 1])
                            + r.l + r.b) // 2)
                        + r.sea[1]) // 2 ELSE r.sea[1] END,
             CASE WHEN CAST(c.tt % {HW_PERIOD} AS INT) + 1 = 2
                  THEN ((c.v * {IND_SCALE}
                         - ((c.v * {IND_SCALE} - r.sea[CAST(c.tt % {HW_PERIOD} AS INT) + 1])
                            + r.l + r.b) // 2)
                        + r.sea[2]) // 2 ELSE r.sea[2] END,
             CASE WHEN CAST(c.tt % {HW_PERIOD} AS INT) + 1 = 3
                  THEN ((c.v * {IND_SCALE}
                         - ((c.v * {IND_SCALE} - r.sea[CAST(c.tt % {HW_PERIOD} AS INT) + 1])
                            + r.l + r.b) // 2)
                        + r.sea[3]) // 2 ELSE r.sea[3] END,
             CASE WHEN CAST(c.tt % {HW_PERIOD} AS INT) + 1 = 4
                  THEN ((c.v * {IND_SCALE}
                         - ((c.v * {IND_SCALE} - r.sea[CAST(c.tt % {HW_PERIOD} AS INT) + 1])
                            + r.l + r.b) // 2)
                        + r.sea[4]) // 2 ELSE r.sea[4] END,
             CASE WHEN CAST(c.tt % {HW_PERIOD} AS INT) + 1 = 5
                  THEN ((c.v * {IND_SCALE}
                         - ((c.v * {IND_SCALE} - r.sea[CAST(c.tt % {HW_PERIOD} AS INT) + 1])
                            + r.l + r.b) // 2)
                        + r.sea[5]) // 2 ELSE r.sea[5] END,
             CASE WHEN CAST(c.tt % {HW_PERIOD} AS INT) + 1 = 6
                  THEN ((c.v * {IND_SCALE}
                         - ((c.v * {IND_SCALE} - r.sea[CAST(c.tt % {HW_PERIOD} AS INT) + 1])
                            + r.l + r.b) // 2)
                        + r.sea[6]) // 2 ELSE r.sea[6] END,
             CASE WHEN CAST(c.tt % {HW_PERIOD} AS INT) + 1 = 7
                  THEN ((c.v * {IND_SCALE}
                         - ((c.v * {IND_SCALE} - r.sea[CAST(c.tt % {HW_PERIOD} AS INT) + 1])
                            + r.l + r.b) // 2)
                        + r.sea[7]) // 2 ELSE r.sea[7] END
           ]
    FROM rec r JOIN cell c ON c.event_type = r.event_type AND c.tt = r.tt + 1
),
fin AS (
    SELECT event_type, tt, l, b, sea,
           ROW_NUMBER() OVER (PARTITION BY event_type ORDER BY tt DESC) AS rk
    FROM rec
)
SELECT event_type,
       CAST(l AS BIGINT) AS level_micro,
       CAST(b AS BIGINT) AS trend_micro,
       CAST(sea[CAST((tt + 1) % {HW_PERIOD} AS INT) + 1] AS BIGINT)
           AS next_season_micro,
       CAST(l + b + sea[CAST((tt + 1) % {HW_PERIOD} AS INT) + 1] AS BIGINT)
           AS fc_h1_micro,
       CAST(l + 7 * b + sea[CAST((tt + 7) % {HW_PERIOD} AS INT) + 1] AS BIGINT)
           AS fc_h7_micro
FROM fin WHERE rk = 1
ORDER BY event_type
""",
)
def events_holt_winters(spark, sf_dir):
    series = _series_arr(_grid(spark, sf_dir))
    folded = series.select(
        "event_type",
        F.expr(
            f"""
            aggregate(
                slice(arr, 2, size(arr) - 1),
                named_struct(
                    'l', arr[0].v * CAST({IND_SCALE} AS BIGINT),
                    'b', CAST(0 AS BIGINT),
                    'sea', array_repeat(CAST(0 AS BIGINT), {HW_PERIOD}),
                    'tt', CAST(0 AS BIGINT)),
                (acc, e) -> named_struct(
                    'l', ((e.v * {IND_SCALE}
                           - element_at(acc.sea, CAST(e.tt % {HW_PERIOD} AS INT) + 1))
                          + acc.l + acc.b) DIV 2,
                    'b', ((((e.v * {IND_SCALE}
                             - element_at(acc.sea, CAST(e.tt % {HW_PERIOD} AS INT) + 1))
                            + acc.l + acc.b) DIV 2) - acc.l + acc.b) DIV 2,
                    'sea', transform(acc.sea, (v, j) ->
                        IF(j = CAST(e.tt % {HW_PERIOD} AS INT),
                           ((e.v * {IND_SCALE}
                             - ((e.v * {IND_SCALE}
                                 - element_at(acc.sea, CAST(e.tt % {HW_PERIOD} AS INT) + 1))
                                + acc.l + acc.b) DIV 2)
                            + element_at(acc.sea, CAST(e.tt % {HW_PERIOD} AS INT) + 1))
                           DIV 2,
                           v)),
                    'tt', e.tt),
                acc -> acc)
            """
        ).alias("st"),
    )
    return folded.select(
        "event_type",
        bigint(F.col("st.l")).alias("level_micro"),
        bigint(F.col("st.b")).alias("trend_micro"),
        F.expr(
            f"CAST(element_at(st.sea, CAST((st.tt + 1) % {HW_PERIOD} AS INT) + 1)"
            " AS BIGINT)"
        ).alias("next_season_micro"),
        F.expr(
            f"CAST(st.l + st.b + element_at(st.sea,"
            f" CAST((st.tt + 1) % {HW_PERIOD} AS INT) + 1) AS BIGINT)"
        ).alias("fc_h1_micro"),
        F.expr(
            f"CAST(st.l + 7 * st.b + element_at(st.sea,"
            f" CAST((st.tt + 7) % {HW_PERIOD} AS INT) + 1) AS BIGINT)"
        ).alias("fc_h7_micro"),
    ).orderBy("event_type")
