"""Round-10 wave 3 — Anderson–Darling two-sample test.

``stats_anderson_darling_2s`` completes the EDF-distance family
(stats_ks_two_sample / stats_cvm_two_sample / stats_kuiper_two_sample):
the tail-weighted A² statistic, which is the member of the family with
power in the TAILS — the regime data-quality drift actually lives in
(a corrupted long-tail of daily volumes moves A² long before it moves
KS's single max-gap).

Scholz–Stephens version-1 discretization over the merged value support
(right-continuous EDFs, ties exact by construction):

    A² = Σ_samples (1/(n_i·N)) Σ_{j<L} l_j·(N·M_ij − n_i·B_j)²
                                       / (B_j·(N−B_j))

with M_ij the sample-i cumulative count through support value j, B_j
the pooled cumulative, l_j the pooled count at j; the last support row
(B = N) contributes 0 and is excluded. Every term is reported in
floored micro units (the PSI/G-test per-term precedent); the
squared-deviation numerator l·(N·M−n·B)²·1e6 is bounded by
~N⁵/16·1e6 and exceeds int64 past a ~650-day spine, so it is
accumulated in DECIMAL(38,0) on the Spark side and HUGEINT in the
oracle (the stats_tschuprow_t / stats_hash_uniformity_ks precedent)
before the per-term floor back to BIGINT.

Reference scope: declared aggregate over ``events`` per SURVEY §2B.

Scale (100 TB): O(|support|) after the daily groupBy — the merged
click/view daily-volume value spine is n_days-bounded, the same shape
as the other three EDF tests; no pair join, one global window over the
bounded spine (lint-annotated).
"""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F

from cascade_spark.operators._util import bigint, t
from cascade_spark.plans.registry import register

MICRO = 1_000_000


@register(
    "stats_anderson_darling_2s",
    "analytics",
    doc="Anderson–Darling two-sample test of the click (x) vs view (y) "
    "daily volumes — the tail-weighted EDF distance (weight "
    "1/(B(N−B)) blows up at the extremes, where KS is blind): "
    "Scholz–Stephens version-1 over the merged value support, per-term "
    "floored micro contributions (declared; both engines truncate the "
    "identical integer expression), last support row excluded (B = N "
    "term is 0 by definition). a2_micro sums both samples' terms; "
    "under H0, A² ≈ 1 (a2_micro ≈ 1e6). n_terms = contributing "
    "support rows. Zero-size guards report 0.",
    oracle="""
WITH daily AS (
    SELECT CAST(ts AS DATE) AS day,
           CAST(COUNT(*) FILTER (WHERE event_type = 'click') AS BIGINT) AS x,
           CAST(COUNT(*) FILTER (WHERE event_type = 'view') AS BIGINT) AS y
    FROM events GROUP BY 1
),
xv AS (SELECT x AS v, CAST(COUNT(*) AS BIGINT) AS cx FROM daily GROUP BY 1),
yv AS (SELECT y AS v, CAST(COUNT(*) AS BIGINT) AS cy FROM daily GROUP BY 1),
sup AS (
    SELECT COALESCE(xv.v, yv.v) AS v,
           COALESCE(cx, 0) AS cx, COALESCE(cy, 0) AS cy
    FROM xv FULL JOIN yv ON xv.v = yv.v
),
tot AS (
    SELECT CAST(COALESCE(SUM(cx), 0) AS BIGINT) AS m,
           CAST(COALESCE(SUM(cy), 0) AS BIGINT) AS n
    FROM sup
),
cum AS (
    SELECT v, cx + cy AS l,
           SUM(cx) OVER (ORDER BY v
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS mx,
           SUM(cy) OVER (ORDER BY v
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS my,
           SUM(cx + cy) OVER (ORDER BY v
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS b
    FROM sup
),
terms AS (
    SELECT l, mx, my, b, tot.m, tot.n, tot.m + tot.n AS nn
    FROM cum, tot
    WHERE b < tot.m + tot.n AND tot.m > 0 AND tot.n > 0
),
ad AS (
    SELECT CAST(COUNT(*) AS BIGINT) AS n_terms,
           CAST(COALESCE(SUM(
               CAST((CAST(l AS HUGEINT)
                     * CAST(nn * mx - m * b AS HUGEINT)
                     * CAST(nn * mx - m * b AS HUGEINT) * 1000000)
                   // (CAST(m AS HUGEINT) * nn * b * (nn - b)) AS BIGINT)
             + CAST((CAST(l AS HUGEINT)
                     * CAST(nn * my - n * b AS HUGEINT)
                     * CAST(nn * my - n * b AS HUGEINT) * 1000000)
                   // (CAST(n AS HUGEINT) * nn * b * (nn - b)) AS BIGINT)
           ), 0) AS BIGINT) AS a2_micro
    FROM terms
)
SELECT tot.m AS nx, tot.n AS ny, ad.n_terms, ad.a2_micro
FROM tot, ad
""",
)
def stats_anderson_darling_2s(spark, sf_dir):
    from cascade_spark.operators.inference_extra import _xy_daily

    daily = _xy_daily(spark, sf_dir)
    xv = daily.groupBy(F.col("x").alias("v")).agg(
        bigint(F.count(F.lit(1))).alias("cx")
    )
    yv = daily.groupBy(F.col("y").alias("v")).agg(
        bigint(F.count(F.lit(1))).alias("cy")
    )
    sup = xv.join(yv, "v", "full").select(
        "v",
        F.coalesce("cx", F.lit(0)).alias("cx"),
        F.coalesce("cy", F.lit(0)).alias("cy"),
    )
    tot = sup.agg(
        bigint(F.coalesce(F.sum("cx"), F.lit(0))).alias("m"),
        bigint(F.coalesce(F.sum("cy"), F.lit(0))).alias("n"),
    )
    # merged click/view daily-volume value spine (n_days-bounded)
    w_cum = Window.orderBy("v").rowsBetween(Window.unboundedPreceding, 0)
    cum = sup.select(
        "v",
        (F.col("cx") + F.col("cy")).alias("l"),
        F.sum("cx").over(w_cum).alias("mx"),
        F.sum("cy").over(w_cum).alias("my"),
        F.sum(F.col("cx") + F.col("cy")).over(w_cum).alias("b"),
    )
    terms = (
        cum.crossJoin(F.broadcast(tot))
        .withColumn("nn", F.col("m") + F.col("n"))
        .filter(
            (F.col("b") < F.col("nn")) & (F.col("m") > 0) & (F.col("n") > 0)
        )
    )
    ad = terms.agg(
        bigint(F.count(F.lit(1))).alias("n_terms"),
        bigint(
            F.coalesce(
                F.sum(
                    # squared-deviation numerator in DECIMAL(38,0)
                    # (oracle: HUGEINT) — l*(nn*mx-m*b)^2*1e6 is bounded
                    # by ~nn^5/16*1e6, which exceeds int64 past a ~650-day
                    # spine; the stats_tschuprow_t precedent
                    F.expr(
                        "CAST((CAST(l AS DECIMAL(38,0))"
                        " * CAST(nn * mx - m * b AS DECIMAL(38,0))"
                        " * CAST(nn * mx - m * b AS DECIMAL(38,0))"
                        " * 1000000)"
                        " DIV (CAST(m AS DECIMAL(38,0)) * nn * b * (nn - b))"
                        " AS BIGINT)"
                        " + CAST((CAST(l AS DECIMAL(38,0))"
                        " * CAST(nn * my - n * b AS DECIMAL(38,0))"
                        " * CAST(nn * my - n * b AS DECIMAL(38,0))"
                        " * 1000000)"
                        " DIV (CAST(n AS DECIMAL(38,0)) * nn * b * (nn - b))"
                        " AS BIGINT)"
                    )
                ),
                F.lit(0),
            )
        ).alias("a2_micro"),
    )
    return tot.crossJoin(F.broadcast(ad)).select(
        F.col("m").alias("nx"),
        F.col("n").alias("ny"),
        "n_terms",
        "a2_micro",
    )
