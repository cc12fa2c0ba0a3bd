"""Round-10 wave 2 — seasonal trend and embedding-drift audits:

- ``stats_seasonal_mann_kendall``: the Hirsch–Slack seasonal
  Mann–Kendall test on the global daily-volume series with ISO-weekday
  strata — S and the tie-corrected variance sum per stratum, so a
  weekly cycle cannot masquerade as (or mask) a monotone trend the way
  it can in the unstratified stats_mann_kendall_trend.
- ``embedding_centroid_drift_halves``: per-label centroid cosine
  between the even- and odd-vec_id halves of the corpus under the
  floor(x*200) quantization — cosine is scale-invariant, so the SUM
  vectors stand in for the centroids and everything but the final
  mirrored sqrt is exact integer arithmetic. The "did my embedding
  space move between batches?" drift audit (parity is the
  deterministic stand-in for batch id).

Reference scope: declared aggregates over ``events`` / ``embeddings``
per SURVEY §2B.

Scale (100 TB): seasonal MK pairs over the per-stratum DAY spine
(n_days²/7 pairs — time-span-bounded, never row-bounded, the
stats_mann_kendall_trend discipline); the drift audit collapses to
(label × parity × dim) sums in one map-side-combinable groupBy
(10 × 2 × 64 rows) before the per-label fold.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from cascade_spark.operators._util import bigint, t
from cascade_spark.plans.registry import register

DRIFT_Q = 200  # similarity.py Q_SCALE floor-quantization contract


@register(
    "stats_seasonal_mann_kendall",
    "analytics",
    doc="Seasonal (Hirsch–Slack) Mann–Kendall on the global daily "
    "volume with ISO-weekday strata: S_total = sum over strata of "
    "sign-sums over same-stratum day pairs (pairs on the per-stratum "
    "day spine — time-span-bounded); var18 = sum of per-stratum "
    "tie-corrected 18*Var = n(n-1)(2n+5) - sum g(g-1)(2g+5); z with "
    "the +/-1 continuity correction as ONE mirrored IEEE expression "
    "rounded to 6 dp (0.0 when var18 = 0 or S = 0 for the z's "
    "correction branch at S = 0 by definition).",
    oracle="""
WITH daily AS (
    SELECT CAST(ts AS DATE) AS day, CAST(COUNT(*) AS BIGINT) AS v
    FROM events GROUP BY 1
),
obs AS (SELECT CAST(ISODOW(day) AS BIGINT) AS g, day, v FROM daily),
s AS (
    SELECT CAST(COALESCE(SUM(CASE WHEN b.v > a.v THEN 1
                                  WHEN b.v < a.v THEN -1 ELSE 0 END), 0)
                AS BIGINT) AS s_total
    FROM obs a JOIN obs b ON a.g = b.g AND a.day < b.day
),
strata AS (
    SELECT g, CAST(SUM(cnt) AS BIGINT) AS n,
           CAST(SUM(cnt * (cnt - 1) * (2 * cnt + 5)) AS BIGINT) AS tie_term
    FROM (SELECT g, v, CAST(COUNT(*) AS BIGINT) AS cnt
          FROM obs GROUP BY 1, 2)
    GROUP BY g
),
vr AS (
    SELECT CAST(COALESCE(SUM(n), 0) AS BIGINT) AS n_days,
           CAST(COALESCE(SUM(n * (n - 1) * (2 * n + 5) - tie_term), 0)
                AS BIGINT) AS var18
    FROM strata
)
SELECT vr.n_days, s.s_total, vr.var18,
       CASE WHEN vr.var18 = 0 OR s.s_total = 0 THEN 0.0
            ELSE ROUND((CAST(s.s_total AS DOUBLE)
                        - SIGN(CAST(s.s_total AS DOUBLE)))
                 / SQRT(CAST(vr.var18 AS DOUBLE) / 18.0), 6)
       END AS z_smk
FROM s, vr
""",
)
def stats_seasonal_mann_kendall(spark, sf_dir):
    ev = t(spark, sf_dir, "events")
    daily = ev.groupBy(F.to_date("ts").alias("day")).agg(
        bigint(F.count(F.lit(1))).alias("v")
    )
    obs = daily.select(
        F.dayofweek(F.date_sub(F.col("day"), 1)).cast("long").alias("g"),
        "day",
        "v",
    )
    a = obs.select(
        F.col("g").alias("ga"), F.col("day").alias("da"), F.col("v").alias("va")
    )
    b = obs.select(
        F.col("g").alias("gb"), F.col("day").alias("db"), F.col("v").alias("vb")
    )
    s = (
        a.join(F.broadcast(b), (F.col("ga") == F.col("gb")) & (F.col("da") < F.col("db")))
        .agg(
            bigint(
                F.coalesce(
                    F.sum(
                        F.when(F.col("vb") > F.col("va"), 1)
                        .when(F.col("vb") < F.col("va"), -1)
                        .otherwise(0)
                    ),
                    F.lit(0),
                )
            ).alias("s_total")
        )
    )
    strata = (
        obs.groupBy("g", "v")
        .agg(bigint(F.count(F.lit(1))).alias("cnt"))
        .groupBy("g")
        .agg(
            bigint(F.sum("cnt")).alias("n"),
            bigint(
                F.sum(F.col("cnt") * (F.col("cnt") - 1) * (2 * F.col("cnt") + 5))
            ).alias("tie_term"),
        )
    )
    vr = strata.agg(
        bigint(F.coalesce(F.sum("n"), F.lit(0))).alias("n_days"),
        bigint(
            F.coalesce(
                F.sum(
                    F.col("n") * (F.col("n") - 1) * (2 * F.col("n") + 5)
                    - F.col("tie_term")
                ),
                F.lit(0),
            )
        ).alias("var18"),
    )
    j = s.crossJoin(F.broadcast(vr))
    z = F.round(
        (
            F.col("s_total").cast("double")
            - F.signum(F.col("s_total").cast("double"))
        )
        / F.sqrt(F.col("var18").cast("double") / 18.0),
        6,
    )
    return j.select(
        "n_days",
        "s_total",
        "var18",
        F.when((F.col("var18") == 0) | (F.col("s_total") == 0), F.lit(0.0))
        .otherwise(z)
        .alias("z_smk"),
    )


@register(
    "embedding_centroid_drift_halves",
    "similarity",
    doc="Per-label centroid cosine drift between the even- and "
    "odd-vec_id halves (parity = deterministic batch stand-in): SUM "
    "vectors of the floor(x*200) quantized embeddings per (label, "
    "parity, dim) — cosine is scale-invariant so the sum vector IS "
    "the centroid direction; dot and squared norms are exact integers "
    "and only the final cosine evaluates one mirrored IEEE sqrt at 6 "
    "dp. cos ~ 1 means the two halves agree on the label's direction; "
    "a low cosine flags label drift or a contaminated batch. Guards: "
    "a label with an empty half (or a zero sum vector) reports 0.0.",
    oracle=f"""
WITH ex AS (
    SELECT label, vec_id % 2 AS par, i AS pos,
           CAST(FLOOR(CAST(embedding[i] AS DOUBLE) * {DRIFT_Q}) AS BIGINT) AS q
    FROM embeddings,
         LATERAL (SELECT UNNEST(GENERATE_SERIES(1, LEN(embedding))) AS i)
),
sums AS (
    SELECT label, par, pos, CAST(SUM(q) AS BIGINT) AS s
    FROM ex GROUP BY 1, 2, 3
),
se AS (SELECT label, pos, s FROM sums WHERE par = 0),
so AS (SELECT label, pos, s FROM sums WHERE par = 1),
g AS (
    SELECT COALESCE(se.label, so.label) AS label,
           CAST(SUM(COALESCE(se.s, 0) * COALESCE(so.s, 0)) AS BIGINT) AS dot_q,
           CAST(SUM(COALESCE(se.s, 0) * COALESCE(se.s, 0)) AS BIGINT) AS n2e,
           CAST(SUM(COALESCE(so.s, 0) * COALESCE(so.s, 0)) AS BIGINT) AS n2o
    FROM se FULL JOIN so ON se.label = so.label AND se.pos = so.pos
    GROUP BY 1
),
cnt AS (
    SELECT label,
           CAST(COUNT(*) FILTER (WHERE vec_id % 2 = 0) AS BIGINT) AS n_even,
           CAST(COUNT(*) FILTER (WHERE vec_id % 2 = 1) AS BIGINT) AS n_odd
    FROM embeddings GROUP BY 1
)
SELECT CAST(c.label AS BIGINT) AS label, c.n_even, c.n_odd, g.dot_q,
       CASE WHEN g.n2e = 0 OR g.n2o = 0 THEN 0.0
            ELSE ROUND(CAST(g.dot_q AS DOUBLE)
                 / SQRT(CAST(g.n2e AS DOUBLE) * CAST(g.n2o AS DOUBLE)), 6)
       END AS cos_drift
FROM cnt c JOIN g ON g.label = c.label
ORDER BY 1
""",
)
def embedding_centroid_drift_halves(spark, sf_dir):
    e = t(spark, sf_dir, "embeddings")
    ex = e.select(
        F.col("label").cast("long").alias("label"),
        (F.col("vec_id") % 2).alias("par"),
        F.posexplode("embedding").alias("pos0", "x"),
    ).select(
        "label",
        "par",
        (F.col("pos0") + 1).alias("pos"),
        F.floor(F.col("x").cast("double") * DRIFT_Q).cast("long").alias("q"),
    )
    sums = ex.groupBy("label", "par", "pos").agg(
        bigint(F.sum("q")).alias("s")
    )
    se = sums.filter(F.col("par") == 0).select(
        "label", "pos", F.col("s").alias("s_e")
    )
    so = sums.filter(F.col("par") == 1).select(
        "label", "pos", F.col("s").alias("s_o")
    )
    g = (
        se.join(so, ["label", "pos"], "full")
        .groupBy("label")
        .agg(
            bigint(
                F.sum(
                    F.coalesce("s_e", F.lit(0)) * F.coalesce("s_o", F.lit(0))
                )
            ).alias("dot_q"),
            bigint(
                F.sum(
                    F.coalesce("s_e", F.lit(0)) * F.coalesce("s_e", F.lit(0))
                )
            ).alias("n2e"),
            bigint(
                F.sum(
                    F.coalesce("s_o", F.lit(0)) * F.coalesce("s_o", F.lit(0))
                )
            ).alias("n2o"),
        )
    )
    cnt = e.groupBy(F.col("label").cast("long").alias("label")).agg(
        bigint(
            F.coalesce(F.sum(F.when(F.col("vec_id") % 2 == 0, 1).otherwise(0)), F.lit(0))
        ).alias("n_even"),
        bigint(
            F.coalesce(F.sum(F.when(F.col("vec_id") % 2 == 1, 1).otherwise(0)), F.lit(0))
        ).alias("n_odd"),
    )
    cos = F.round(
        F.col("dot_q").cast("double")
        / F.sqrt(F.col("n2e").cast("double") * F.col("n2o").cast("double")),
        6,
    )
    return (
        cnt.join(g, "label")
        .select(
            "label",
            "n_even",
            "n_odd",
            "dot_q",
            F.when((F.col("n2e") == 0) | (F.col("n2o") == 0), F.lit(0.0))
            .otherwise(cos)
            .alias("cos_drift"),
        )
        .orderBy("label")
    )
