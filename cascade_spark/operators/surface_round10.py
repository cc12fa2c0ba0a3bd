"""Round-10 wave — ordered/dispersion rank tests, information-theoretic
association, drift detection, readability, k-NN label audit, and
engagement-stickiness surface:

- ``stats_jonckheere_terpstra``: ordered-alternative trend across the
  seven ISO-weekday groups of daily volume — the dose-response
  companion to stats_kruskal_wallis, with cross-group dominance counts
  recovered from a (group x merged-support) cumulative grid, never a
  pair join.
- ``stats_ansari_bradley``: two-sample rank dispersion test (click vs
  view daily volumes) via doubled Ansari scores min(r, N+1-r) on the
  merged value support — the scale-alternative sibling of
  stats_mannwhitney_u.
- ``stats_hash_uniformity_ks``: exact KS + chi-square uniformity audit
  of the md5 16-bucket user assignment — the allocation-health check
  behind experiment_hash_bucketing (a biased hash breaks every
  experiment downstream).
- ``stats_normalized_mutual_info``: NMI between event_type and ISO
  weekday from the same contingency cells as stats_g_test, mirrored
  rounded-ln per-cell contributions, arithmetic-mean normalization so
  the final ratio is pure integer arithmetic (no sqrt).
- ``events_page_hinkley``: Page–Hinkley drift detector per event type
  over the daily-volume series — running-mean deviations accumulated
  and compared to the running minimum, alarms at a declared lambda.
- ``text_lix_readability`` / ``text_ari_coleman_liau``: LIX/RIX and
  ARI/Coleman–Liau readability per source in exact milli-points —
  the character/word-length complements of text_flesch_reading_ease.
- ``embedding_knn_label_consistency``: exact 5-NN label purity for a
  declared anchor sample (vec_id % 100 = 0) under the floor(x*200)
  quantized dot product — the "would a k-NN classifier agree with the
  labels?" audit run before trusting embedding-space dedup thresholds.
- ``analytics_dau_mau_stickiness``: per-month sum-of-DAU / MAU
  engagement ratio in exact bp — the product-health headline metric.
- ``sql_group_by_ordinal``: GROUP BY / ORDER BY ordinal positions
  (spark.sql.groupByOrdinal / orderByOrdinal) — the SQL-surface
  feature row.

Reference scope: the reference engine is an event log
(src/broker/main.rs); all rows here are declared aggregates over the
consumed ``events`` / ``documents`` / ``embeddings`` / ``orders``
tables per SURVEY §2B.

Scale (100 TB): every statistic collapses to a bounded spine before
any rank/window step — the (7 x |support|) weekday grid and the merged
click/view support are n_days-bounded, the hash audit is a 16-row
spine, NMI is the (types x 7) cell frame, Page–Hinkley windows
partition by event_type over the day grid, readability is one map-only
regexp pass + a per-source combinable groupBy, and the k-NN audit
joins a BROADCAST ~n/100 anchor frame against the corpus (the declared
sample-bounded exact path; the LSH variants are the corpus-scale
approximate path). No query here shuffles more than once on a
data-sized key.
"""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F

from cascade_spark.operators._util import bigint, t
from cascade_spark.operators.inference_extra import _csum
from cascade_spark.plans.registry import register

BP = 10_000
PH_LAMBDA_MICRO = 20_000_000  # Page-Hinkley alarm threshold: 20 events
KNN_K = 5
KNN_Q = 200  # similarity.py Q_SCALE floor-quantization contract
HASH_BUCKETS = 16


# ---------------------------------------------------------------------------
# Jonckheere–Terpstra ordered-alternative trend
# ---------------------------------------------------------------------------


@register(
    "stats_jonckheere_terpstra",
    "analytics",
    doc="Jonckheere–Terpstra ordered-alternative test across the seven "
    "ISO-weekday groups (dose order = weekday 1..7) of daily event "
    "volume: JT2 = doubled statistic 2*sum_{i<j} U_ij with ties "
    "counted half (U2 = 2*#less + #ties), recovered from a (group x "
    "merged-support) cumulative-count grid — O(7 * |support|), never "
    "the O(n^2) pair join. e2 = doubled H0 expectation (N^2 - sum "
    "n_g^2)/2 exact (the numerator is even); variance is the FULL "
    "tie-corrected Hollander-Wolfe form (daily volumes are heavily "
    "tied): 72*N(N-1)(N-2)*Var = A*N(N-1)(N-2) + 2*B_g*B_t + "
    "9*(N-2)*C_g*C_t with A = N(N-1)(2N+5) - sum n_g(n_g-1)(2n_g+5) "
    "- sum t_v(t_v-1)(2t_v+5), B = sum s(s-1)(s-2), C = sum s(s-1) "
    "over group sizes (g) and pooled tie-group sizes (t); accumulated "
    "in DECIMAL(38,0)/HUGEINT, reported as var72 = floor(72*Var) "
    "(exact division by N(N-1)(N-2) pre-floor); z mirrored as ONE "
    "IEEE expression on the UNFLOORED variance, rounded to 6 dp, 0.0 "
    "on a degenerate split (N <= 2 or var_num <= 0). With no ties the "
    "form reduces exactly to the classical N^2(2N+3) - sum "
    "n_g^2(2n_g+3) (identity: n(n-1)(2n+5) = n^2(2n+3) - 5n and "
    "sum n_g = N).",
    oracle="""
WITH daily AS (
    SELECT CAST(ts AS DATE) AS day, CAST(COUNT(*) AS BIGINT) AS v
    FROM events GROUP BY 1
),
obs AS (SELECT CAST(ISODOW(day) AS BIGINT) AS g, v FROM daily),
sup AS (SELECT g, v, CAST(COUNT(*) AS BIGINT) AS n FROM obs GROUP BY 1, 2),
vals AS (SELECT DISTINCT v FROM obs),
grps AS (SELECT DISTINCT g FROM obs),
grid AS (
    SELECT gr.g, vals.v, COALESCE(s.n, 0) AS n
    FROM grps gr CROSS JOIN vals
    LEFT JOIN sup s ON s.g = gr.g AND s.v = vals.v
),
cum AS (
    SELECT g, v, n,
           COALESCE(SUM(n) OVER (PARTITION BY g ORDER BY v
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS clt
    FROM grid
),
jt AS (
    SELECT CAST(COALESCE(SUM(a.n * (2 * b.clt + b.n)), 0) AS BIGINT) AS jt2
    FROM sup a JOIN cum b ON b.v = a.v AND b.g < a.g
),
sizes AS (SELECT g, CAST(SUM(n) AS BIGINT) AS ng FROM sup GROUP BY 1),
ties AS (SELECT v, CAST(SUM(n) AS BIGINT) AS tv FROM sup GROUP BY 1),
tot AS (
    SELECT CAST(COALESCE(SUM(ng), 0) AS BIGINT) AS nn,
           CAST(COALESCE(SUM(ng * ng), 0) AS BIGINT) AS sq,
           CAST(COALESCE(SUM(ng * (ng - 1) * (2 * ng + 5)), 0) AS BIGINT) AS ga,
           CAST(COALESCE(SUM(ng * (ng - 1) * (ng - 2)), 0) AS BIGINT) AS gb,
           CAST(COALESCE(SUM(ng * (ng - 1)), 0) AS BIGINT) AS gc
    FROM sizes
),
ttot AS (
    SELECT CAST(COALESCE(SUM(tv * (tv - 1) * (2 * tv + 5)), 0) AS BIGINT) AS ta,
           CAST(COALESCE(SUM(tv * (tv - 1) * (tv - 2)), 0) AS BIGINT) AS tb,
           CAST(COALESCE(SUM(tv * (tv - 1)), 0) AS BIGINT) AS tc
    FROM ties
),
vv AS (
    SELECT nn, sq,
           CASE WHEN nn <= 2 THEN CAST(0 AS HUGEINT)
                ELSE (CAST(nn AS HUGEINT) * (nn - 1) * (2 * nn + 5) - ga - ta)
                     * (CAST(nn AS HUGEINT) * (nn - 1) * (nn - 2))
                   + 2 * CAST(gb AS HUGEINT) * tb
                   + 9 * (CAST(nn AS HUGEINT) - 2) * gc * tc
           END AS var_num,
           CASE WHEN nn <= 2 THEN CAST(1 AS HUGEINT)
                ELSE CAST(nn AS HUGEINT) * (nn - 1) * (nn - 2)
           END AS dd
    FROM tot, ttot
)
SELECT vv.nn AS n_days, jt.jt2,
       CAST((vv.nn * vv.nn - vv.sq) // 2 AS BIGINT) AS e2,
       CAST(CASE WHEN vv.nn <= 2 OR vv.var_num <= 0 THEN 0
                 ELSE vv.var_num // vv.dd END AS BIGINT) AS var72,
       CASE WHEN vv.nn <= 2 OR vv.var_num <= 0 THEN 0.0
            ELSE ROUND(CAST(jt.jt2 - (vv.nn * vv.nn - vv.sq) // 2
                            AS DOUBLE) * 0.5
                 / SQRT(CAST(vv.var_num AS DOUBLE)
                        / (72.0 * CAST(vv.dd AS DOUBLE))), 6)
       END AS z_jt
FROM jt, vv
""",
)
def stats_jonckheere_terpstra(spark, sf_dir):
    ev = t(spark, sf_dir, "events")
    daily = ev.groupBy(F.to_date("ts").alias("day")).agg(
        bigint(F.count(F.lit(1))).alias("v")
    )
    obs = daily.select(
        F.dayofweek(F.date_sub(F.col("day"), 1)).cast("long").alias("g"), "v"
    )
    sup = obs.groupBy("g", "v").agg(bigint(F.count(F.lit(1))).alias("n"))
    vals = obs.select("v").distinct()
    grps = obs.select("g").distinct()
    grid = (
        grps.crossJoin(F.broadcast(vals))
        .join(sup, ["g", "v"], "left")
        .select("g", "v", F.coalesce("n", F.lit(0)).alias("n"))
    )
    w_lt = (
        Window.partitionBy("g")
        .orderBy("v")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    cum = grid.select(
        "g", "v", "n", F.coalesce(F.sum("n").over(w_lt), F.lit(0)).alias("clt")
    )
    jt = (
        sup.alias("a")
        .join(
            cum.alias("b"),
            (F.col("b.v") == F.col("a.v")) & (F.col("b.g") < F.col("a.g")),
        )
        .agg(
            bigint(
                F.coalesce(
                    F.sum(
                        F.col("a.n") * (2 * F.col("b.clt") + F.col("b.n"))
                    ),
                    F.lit(0),
                )
            ).alias("jt2")
        )
    )
    sizes = sup.groupBy("g").agg(bigint(F.sum("n")).alias("ng"))
    tot = sizes.agg(
        bigint(F.coalesce(F.sum("ng"), F.lit(0))).alias("nn"),
        bigint(F.coalesce(F.sum(F.col("ng") * F.col("ng")), F.lit(0))).alias(
            "sq"
        ),
        bigint(
            F.coalesce(
                F.sum(F.col("ng") * (F.col("ng") - 1) * (2 * F.col("ng") + 5)),
                F.lit(0),
            )
        ).alias("ga"),
        bigint(
            F.coalesce(
                F.sum(F.col("ng") * (F.col("ng") - 1) * (F.col("ng") - 2)),
                F.lit(0),
            )
        ).alias("gb"),
        bigint(
            F.coalesce(F.sum(F.col("ng") * (F.col("ng") - 1)), F.lit(0))
        ).alias("gc"),
    )
    # pooled tie-group sizes: daily volumes are heavily tied, so the
    # tie-correction terms are material, not decorative
    ties = sup.groupBy("v").agg(bigint(F.sum("n")).alias("tv"))
    ttot = ties.agg(
        bigint(
            F.coalesce(
                F.sum(F.col("tv") * (F.col("tv") - 1) * (2 * F.col("tv") + 5)),
                F.lit(0),
            )
        ).alias("ta"),
        bigint(
            F.coalesce(
                F.sum(F.col("tv") * (F.col("tv") - 1) * (F.col("tv") - 2)),
                F.lit(0),
            )
        ).alias("tb"),
        bigint(
            F.coalesce(F.sum(F.col("tv") * (F.col("tv") - 1)), F.lit(0))
        ).alias("tc"),
    )
    j = jt.crossJoin(F.broadcast(tot)).crossJoin(F.broadcast(ttot))
    e2 = F.expr("CAST((nn * nn - sq) DIV 2 AS BIGINT)")
    # 72*N(N-1)(N-2)*Var in DECIMAL(38,0) (oracle: HUGEINT) — exceeds
    # int64 past a ~1000-day spine
    var_num = F.expr(
        "CASE WHEN nn <= 2 THEN CAST(0 AS DECIMAL(38,0))"
        " ELSE (CAST(nn AS DECIMAL(38,0)) * (nn - 1) * (2 * nn + 5)"
        "       - ga - ta)"
        "      * (CAST(nn AS DECIMAL(38,0)) * (nn - 1) * (nn - 2))"
        "    + 2 * CAST(gb AS DECIMAL(38,0)) * tb"
        "    + 9 * (CAST(nn AS DECIMAL(38,0)) - 2) * gc * tc END"
    )
    dd = F.expr(
        "CASE WHEN nn <= 2 THEN CAST(1 AS DECIMAL(38,0))"
        " ELSE CAST(nn AS DECIMAL(38,0)) * (nn - 1) * (nn - 2) END"
    )
    # materialize var_num/dd once as columns so var72 and z reuse them
    # instead of re-inlining the 10-line CASE SQL (round-11 ADVICE item 4)
    vv = j.select("*", var_num.alias("var_num"), dd.alias("dd"))
    degenerate = (F.col("nn") <= 2) | (F.col("var_num") <= 0)
    var72 = (
        F.when(degenerate, F.lit(0))
        .otherwise(F.expr("var_num DIV dd"))
        .cast("long")
    )
    z = F.round(
        (F.col("jt2") - e2).cast("double")
        * 0.5
        / F.sqrt(
            F.col("var_num").cast("double")
            / (F.lit(72.0) * F.col("dd").cast("double"))
        ),
        6,
    )
    return vv.select(
        F.col("nn").alias("n_days"),
        "jt2",
        e2.alias("e2"),
        var72.alias("var72"),
        F.when(degenerate, F.lit(0.0)).otherwise(z).alias("z_jt"),
    )


# ---------------------------------------------------------------------------
# Ansari–Bradley rank dispersion
# ---------------------------------------------------------------------------


@register(
    "stats_ansari_bradley",
    "analytics",
    doc="Ansari–Bradley two-sample dispersion test of the click (x) vs "
    "view (y) daily volumes: doubled Ansari scores s2 = min(dr, "
    "2(N+1) - dr) on doubled midranks dr = 2*below + m + 1 over the "
    "merged value support (O(|support|), ties exact by construction). "
    "ab2_x/ab2_y are the doubled per-group score sums; mean scores "
    "and the x/y dispersion ratio in truncated milli (small ratio = x "
    "more spread than y). Zero-denominator guards report 0.",
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
    SELECT CAST(COALESCE(SUM(cx), 0) AS BIGINT) AS nx,
           CAST(COALESCE(SUM(cy), 0) AS BIGINT) AS ny
    FROM sup
),
cumb AS (
    SELECT v, cx, cy,
           COALESCE(SUM(cx + cy) OVER (ORDER BY v
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS below
    FROM sup
),
sc AS (
    SELECT cx, cy,
           LEAST(2 * below + (cx + cy) + 1,
                 2 * (tot.nx + tot.ny + 1)
                 - (2 * below + (cx + cy) + 1)) AS s2
    FROM cumb, tot
),
ab AS (
    SELECT CAST(COALESCE(SUM(cx * s2), 0) AS BIGINT) AS ab2x,
           CAST(COALESCE(SUM(cy * s2), 0) AS BIGINT) AS ab2y
    FROM sc
)
SELECT tot.nx, tot.ny, ab.ab2x, ab.ab2y,
       CAST(CASE WHEN tot.nx = 0 THEN 0
            ELSE (1000 * ab.ab2x) // (2 * tot.nx) END AS BIGINT)
           AS mean_x_milli,
       CAST(CASE WHEN tot.ny = 0 THEN 0
            ELSE (1000 * ab.ab2y) // (2 * tot.ny) END AS BIGINT)
           AS mean_y_milli,
       CAST(CASE WHEN ab.ab2y = 0 OR tot.nx = 0 THEN 0
            ELSE (1000 * ab.ab2x * tot.ny) // (ab.ab2y * tot.nx)
            END AS BIGINT) AS dispersion_ratio_milli
FROM ab, tot
""",
)
def stats_ansari_bradley(spark, sf_dir):
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
        bigint(F.coalesce(F.sum("cx"), F.lit(0))).alias("nx"),
        bigint(F.coalesce(F.sum("cy"), F.lit(0))).alias("ny"),
    )
    # merged click/view daily-volume value spine (n_days-bounded)
    w_below = Window.orderBy("v").rowsBetween(Window.unboundedPreceding, -1)
    cumb = sup.select(
        "v",
        "cx",
        "cy",
        F.coalesce(F.sum(F.col("cx") + F.col("cy")).over(w_below), F.lit(0)).alias(
            "below"
        ),
    )
    sc = cumb.crossJoin(F.broadcast(tot)).select(
        "cx",
        "cy",
        F.least(
            2 * F.col("below") + (F.col("cx") + F.col("cy")) + 1,
            2 * (F.col("nx") + F.col("ny") + 1)
            - (2 * F.col("below") + (F.col("cx") + F.col("cy")) + 1),
        ).alias("s2"),
    )
    ab = sc.agg(
        bigint(F.coalesce(F.sum(F.col("cx") * F.col("s2")), F.lit(0))).alias(
            "ab2x"
        ),
        bigint(F.coalesce(F.sum(F.col("cy") * F.col("s2")), F.lit(0))).alias(
            "ab2y"
        ),
    )
    j = ab.crossJoin(F.broadcast(tot))
    return j.select(
        "nx",
        "ny",
        "ab2x",
        "ab2y",
        F.expr(
            "CAST(CASE WHEN nx = 0 THEN 0"
            " ELSE (1000 * ab2x) DIV (2 * nx) END AS BIGINT)"
        ).alias("mean_x_milli"),
        F.expr(
            "CAST(CASE WHEN ny = 0 THEN 0"
            " ELSE (1000 * ab2y) DIV (2 * ny) END AS BIGINT)"
        ).alias("mean_y_milli"),
        F.expr(
            "CAST(CASE WHEN ab2y = 0 OR nx = 0 THEN 0"
            " ELSE (1000 * ab2x * ny) DIV (ab2y * nx) END AS BIGINT)"
        ).alias("dispersion_ratio_milli"),
    )


# ---------------------------------------------------------------------------
# Hash-bucket uniformity audit
# ---------------------------------------------------------------------------


@register(
    "stats_hash_uniformity_ks",
    "analytics",
    doc=f"Uniformity audit of the md5 {HASH_BUCKETS}-bucket user "
    "assignment (the '0x'||substr(md5(id),1,8) portable-hash idiom "
    "behind experiment_hash_bucketing): exact KS distance vs the "
    f"uniform CDF scaled by {HASH_BUCKETS}*U (ks_d_16u = max |16*cum - "
    "(b+1)*U|, pure integers) and the chi-square vs equal allocation "
    "in truncated micro ((sum (16*o - U)^2 * 1e6) DIV (16*U), dof 15). "
    f"The {HASH_BUCKETS}-row bucket spine is fixed by construction.",
    oracle=f"""
WITH u AS (SELECT DISTINCT user_id FROM events WHERE user_id IS NOT NULL),
b AS (
    SELECT ('0x' || SUBSTR(MD5(CAST(user_id AS VARCHAR)), 1, 8))::BIGINT
               % {HASH_BUCKETS} AS bkt
    FROM u
),
oc AS (SELECT bkt, CAST(COUNT(*) AS BIGINT) AS o FROM b GROUP BY 1),
spine AS (SELECT UNNEST(GENERATE_SERIES(0, {HASH_BUCKETS - 1})) AS bkt),
grid AS (
    SELECT s.bkt, COALESCE(oc.o, 0) AS o
    FROM spine s LEFT JOIN oc ON oc.bkt = s.bkt
),
tot AS (SELECT CAST(COALESCE(SUM(o), 0) AS BIGINT) AS nu FROM grid),
cum AS (
    SELECT bkt, o,
           SUM(o) OVER (ORDER BY bkt
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS c
    FROM grid
)
SELECT tot.nu AS n_users,
       CAST({HASH_BUCKETS} AS BIGINT) AS n_buckets,
       CAST(COALESCE(MAX(ABS({HASH_BUCKETS} * cum.c - (cum.bkt + 1) * tot.nu)),
                     0) AS BIGINT) AS ks_d_16u,
       CAST(CASE WHEN tot.nu = 0 THEN 0
            ELSE (SUM(({HASH_BUCKETS} * cum.o - tot.nu)
                      * ({HASH_BUCKETS} * cum.o - tot.nu)) * 1000000)
                 // ({HASH_BUCKETS} * tot.nu) END AS BIGINT) AS chi2_micro
FROM cum, tot
GROUP BY tot.nu
""",
)
def stats_hash_uniformity_ks(spark, sf_dir):
    ev = t(spark, sf_dir, "events").filter(F.col("user_id").isNotNull())
    users = ev.select("user_id").distinct()
    bkt = (
        F.conv(F.substring(F.md5(F.col("user_id").cast("string")), 1, 8), 16, 10)
        .cast("long")
        % HASH_BUCKETS
    )
    oc = users.select(bkt.alias("bkt")).groupBy("bkt").agg(
        bigint(F.count(F.lit(1))).alias("o")
    )
    spine = spark.range(HASH_BUCKETS).select(F.col("id").alias("bkt"))
    grid = spine.join(oc, "bkt", "left").select(
        "bkt", F.coalesce("o", F.lit(0)).alias("o")
    )
    tot = grid.agg(bigint(F.coalesce(F.sum("o"), F.lit(0))).alias("nu"))
    # fixed 16-row bucket spine
    w_cum = Window.orderBy("bkt").rowsBetween(Window.unboundedPreceding, 0)
    cum = grid.select("bkt", "o", F.sum("o").over(w_cum).alias("c"))
    j = cum.crossJoin(F.broadcast(tot))
    return j.groupBy("nu").agg(
        bigint(
            F.coalesce(
                F.max(
                    F.abs(
                        HASH_BUCKETS * F.col("c") - (F.col("bkt") + 1) * F.col("nu")
                    )
                ),
                F.lit(0),
            )
        ).alias("ks_d_16u"),
        # the squared-deviation sum accumulates in DECIMAL(38,0) to
        # mirror DuckDB's automatic HUGEINT SUM widening — int64 would
        # hold under a uniform hash but not under a pathological skew
        F.expr(
            f"CAST(CASE WHEN nu = 0 THEN 0"
            f" ELSE (SUM(CAST(({HASH_BUCKETS} * o - nu) AS DECIMAL(38,0))"
            f"           * ({HASH_BUCKETS} * o - nu))"
            f"       * 1000000) DIV ({HASH_BUCKETS} * nu) END AS BIGINT)"
        ).alias("chi2_micro"),
    ).select(
        F.col("nu").alias("n_users"),
        F.lit(HASH_BUCKETS).cast("long").alias("n_buckets"),
        "ks_d_16u",
        "chi2_micro",
    )


# ---------------------------------------------------------------------------
# Normalized mutual information
# ---------------------------------------------------------------------------


@register(
    "stats_normalized_mutual_info",
    "analytics",
    doc="Normalized mutual information between event_type and ISO "
    "weekday over the same contingency cells as stats_g_test: per-cell "
    "contributions o*ln(o*N/(r*c)) and marginal entropies r*ln(N/r) "
    "each as ONE mirrored IEEE ln expression rounded to integer micro "
    "(the rounded-ln precedent), so every reported sum is an exact "
    "integer; NMI uses the arithmetic-mean normalization 2*MI/(Hr+Hc) "
    "— pure integer division, no sqrt. Zero cells contribute 0; a "
    "degenerate table reports 0.",
    oracle="""
WITH cells AS (
    SELECT event_type, ISODOW(CAST(ts AS DATE)) AS dow,
           CAST(COUNT(*) AS BIGINT) AS o
    FROM events GROUP BY 1, 2
),
r AS (SELECT event_type, CAST(SUM(o) AS BIGINT) AS r FROM cells GROUP BY 1),
c AS (SELECT dow, CAST(SUM(o) AS BIGINT) AS c FROM cells GROUP BY 1),
n AS (SELECT CAST(COALESCE(SUM(o), 0) AS BIGINT) AS n FROM cells),
mi AS (
    SELECT CAST(COALESCE(SUM(CAST(ROUND(1000000.0 * cells.o
               * LN(CAST(cells.o AS DOUBLE) * n.n
                    / (CAST(r.r AS DOUBLE) * c.c))) AS BIGINT)), 0)
           AS BIGINT) AS mi
    FROM cells, n
    JOIN r ON r.event_type = cells.event_type
    JOIN c ON c.dow = cells.dow
),
hr AS (
    SELECT CAST(COALESCE(SUM(CAST(ROUND(1000000.0 * r.r
               * LN(CAST(n.n AS DOUBLE) / r.r)) AS BIGINT)), 0) AS BIGINT) AS hr
    FROM r, n
),
hc AS (
    SELECT CAST(COALESCE(SUM(CAST(ROUND(1000000.0 * c.c
               * LN(CAST(n.n AS DOUBLE) / c.c)) AS BIGINT)), 0) AS BIGINT) AS hc
    FROM c, n
)
SELECT n.n, mi.mi AS mi_micro_n, hr.hr AS h_row_micro_n,
       hc.hc AS h_col_micro_n,
       CAST(CASE WHEN hr.hr + hc.hc = 0 THEN 0
            ELSE (2000 * mi.mi) // (hr.hr + hc.hc) END AS BIGINT) AS nmi_milli
FROM n, mi, hr, hc
""",
)
def stats_normalized_mutual_info(spark, sf_dir):
    from cascade_spark.operators.inference_extra import _contingency_cells

    cells = _contingency_cells(spark, sf_dir)
    r = cells.groupBy("event_type").agg(bigint(F.sum("o")).alias("r"))
    c = cells.groupBy("dow").agg(bigint(F.sum("o")).alias("c"))
    n = cells.agg(bigint(F.coalesce(F.sum("o"), F.lit(0))).alias("n"))
    cell_term = F.round(
        F.lit(1000000.0)
        * F.col("o")
        * F.log(
            F.col("o").cast("double")
            * F.col("n")
            / (F.col("r").cast("double") * F.col("c"))
        )
    ).cast("long")
    mi = (
        cells.join(F.broadcast(r), "event_type")
        .join(F.broadcast(c), "dow")
        .crossJoin(F.broadcast(n))
        .agg(bigint(F.coalesce(F.sum(cell_term), F.lit(0))).alias("mi"))
    )
    hr_term = F.round(
        F.lit(1000000.0)
        * F.col("r")
        * F.log(F.col("n").cast("double") / F.col("r"))
    ).cast("long")
    hr = r.crossJoin(F.broadcast(n)).agg(
        bigint(F.coalesce(F.sum(hr_term), F.lit(0))).alias("hr")
    )
    hc_term = F.round(
        F.lit(1000000.0)
        * F.col("c")
        * F.log(F.col("n").cast("double") / F.col("c"))
    ).cast("long")
    hc = c.crossJoin(F.broadcast(n)).agg(
        bigint(F.coalesce(F.sum(hc_term), F.lit(0))).alias("hc")
    )
    out = (
        n.crossJoin(F.broadcast(mi))
        .crossJoin(F.broadcast(hr))
        .crossJoin(F.broadcast(hc))
    )
    return out.select(
        "n",
        F.col("mi").alias("mi_micro_n"),
        F.col("hr").alias("h_row_micro_n"),
        F.col("hc").alias("h_col_micro_n"),
        F.expr(
            "CAST(CASE WHEN hr + hc = 0 THEN 0"
            " ELSE (2000 * mi) DIV (hr + hc) END AS BIGINT)"
        ).alias("nmi_milli"),
    )


# ---------------------------------------------------------------------------
# Page–Hinkley drift detection
# ---------------------------------------------------------------------------


@register(
    "events_page_hinkley",
    "timeseries",
    doc="Page–Hinkley drift detector per event type over the "
    "daily-volume series: running mean in truncated micro "
    "((S_t * 1e6) DIV t), deviations accumulated to U_t, PH_t = U_t - "
    "min_{i<=t} U_i, alarm when PH exceeds the declared lambda "
    f"({PH_LAMBDA_MICRO // 1_000_000} events). Reports per type the "
    "max PH, alarm-day count and first alarm day. Delta margin 0 "
    "(declared). All windows partition by event_type over the day "
    "grid.",
    oracle=f"""
WITH daily AS (
    SELECT event_type, CAST(ts AS DATE) AS day,
           CAST(COUNT(*) AS BIGINT) AS v
    FROM events GROUP BY 1, 2
),
seq AS (
    SELECT event_type, day, v,
           SUM(v) OVER (PARTITION BY event_type ORDER BY day
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS s,
           CAST(ROW_NUMBER() OVER (PARTITION BY event_type ORDER BY day)
                AS BIGINT) AS tt
    FROM daily
),
dev AS (
    SELECT event_type, day,
           CAST(v * 1000000 - (s * 1000000) // tt AS BIGINT) AS d
    FROM seq
),
cum AS (
    SELECT event_type, day,
           SUM(d) OVER (PARTITION BY event_type ORDER BY day
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS u
    FROM dev
),
ph AS (
    SELECT event_type, day,
           u - MIN(u) OVER (PARTITION BY event_type ORDER BY day
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS ph
    FROM cum
)
SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n_days,
       CAST(MAX(ph) AS BIGINT) AS max_ph_micro,
       CAST(COUNT(*) FILTER (WHERE ph > {PH_LAMBDA_MICRO}) AS BIGINT)
           AS n_alarm_days,
       STRFTIME(MIN(day) FILTER (WHERE ph > {PH_LAMBDA_MICRO}), '%Y-%m-%d')
           AS first_alarm_day
FROM ph GROUP BY 1 ORDER BY 1
""",
)
def events_page_hinkley(spark, sf_dir):
    ev = t(spark, sf_dir, "events")
    daily = ev.groupBy("event_type", F.to_date("ts").alias("day")).agg(
        bigint(F.count(F.lit(1))).alias("v")
    )
    w_cum = (
        Window.partitionBy("event_type")
        .orderBy("day")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    w_rn = Window.partitionBy("event_type").orderBy("day")
    seq = daily.select(
        "event_type",
        "day",
        "v",
        F.sum("v").over(w_cum).alias("s"),
        F.row_number().over(w_rn).cast("long").alias("tt"),
    )
    dev = seq.select(
        "event_type",
        "day",
        F.expr("CAST(v * 1000000 - (s * 1000000) DIV tt AS BIGINT)").alias("d"),
    )
    cum = dev.select(
        "event_type", "day", F.sum("d").over(w_cum).alias("u")
    )
    ph = cum.select(
        "event_type",
        "day",
        (F.col("u") - F.min("u").over(w_cum)).alias("ph"),
    )
    alarm = F.col("ph") > PH_LAMBDA_MICRO
    return (
        ph.groupBy("event_type")
        .agg(
            bigint(F.count(F.lit(1))).alias("n_days"),
            bigint(F.max("ph")).alias("max_ph_micro"),
            _csum(alarm).alias("n_alarm_days"),
            F.date_format(
                F.min(F.when(alarm, F.col("day"))), "yyyy-MM-dd"
            ).alias("first_alarm_day"),
        )
        .orderBy("event_type")
    )


# ---------------------------------------------------------------------------
# LIX / RIX readability
# ---------------------------------------------------------------------------


@register(
    "text_lix_readability",
    "text",
    doc="LIX and RIX readability per source: words (whitespace split), "
    "sentences ([.!?]+ runs, clamped >= 1 per doc — the "
    "text_flesch_reading_ease contract), long words (> 6 chars). "
    "lix_milli = (1000*W) DIV S + (100000*LW) DIV W (sum of two "
    "truncated terms, declared), rix_milli = (1000*LW) DIV S. One "
    "map-only regexp pass + one combinable groupBy.",
    oracle="""
WITH per_doc AS (
    SELECT source,
           CAST(LEN(STRING_SPLIT(text, ' ')) AS BIGINT) AS w,
           CAST(GREATEST(LEN(REGEXP_EXTRACT_ALL(text, '[.!?]+')), 1)
                AS BIGINT) AS s,
           CAST(LEN(LIST_FILTER(STRING_SPLIT(text, ' '),
                                x -> LEN(x) > 6)) AS BIGINT) AS lw
    FROM documents
),
agg AS (
    SELECT source, CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(SUM(w) AS BIGINT) AS words,
           CAST(SUM(s) AS BIGINT) AS sentences,
           CAST(SUM(lw) AS BIGINT) AS long_words
    FROM per_doc GROUP BY source
)
SELECT source, n_docs, words, sentences, long_words,
       CAST((1000 * words) // sentences
            + (100000 * long_words) // words AS BIGINT) AS lix_milli,
       CAST((1000 * long_words) // sentences AS BIGINT) AS rix_milli
FROM agg
ORDER BY source
""",
)
def text_lix_readability(spark, sf_dir):
    d = t(spark, sf_dir, "documents")
    per_doc = d.select(
        "source",
        F.size(F.split(F.col("text"), " ", -1)).cast("long").alias("w"),
        F.greatest(
            F.size(F.regexp_extract_all(F.col("text"), F.lit(r"[.!?]+"), 0)),
            F.lit(1),
        )
        .cast("long")
        .alias("s"),
        F.size(
            F.filter(
                F.split(F.col("text"), " ", -1), lambda x: F.length(x) > 6
            )
        )
        .cast("long")
        .alias("lw"),
    )
    agg = per_doc.groupBy("source").agg(
        bigint(F.count(F.lit(1))).alias("n_docs"),
        bigint(F.sum("w")).alias("words"),
        bigint(F.sum("s")).alias("sentences"),
        bigint(F.sum("lw")).alias("long_words"),
    )
    return agg.select(
        "source",
        "n_docs",
        "words",
        "sentences",
        "long_words",
        F.expr(
            "CAST((1000 * words) DIV sentences"
            " + (100000 * long_words) DIV words AS BIGINT)"
        ).alias("lix_milli"),
        F.expr("CAST((1000 * long_words) DIV sentences AS BIGINT)").alias(
            "rix_milli"
        ),
    ).orderBy("source")


@register(
    "text_ari_coleman_liau",
    "text",
    doc="Automated Readability Index and Coleman–Liau per source from "
    "alphanumeric character / word / sentence totals (the two "
    "grade-level formulas that need no syllable heuristic): ari_milli "
    "= (4710*C*S + 500*W^2 - 21430*W*S) DIV (W*S), cli_milli = "
    "(5880*C - 29600*S) DIV W - 15800 — exact integer clears of "
    "4.71 C/W + 0.5 W/S - 21.43 and 0.0588 L - 0.296 S' - 15.8. "
    "DIV/`//` truncate toward zero identically when a degenerate doc "
    "mix turns a numerator negative.",
    oracle="""
WITH per_doc AS (
    SELECT source,
           CAST(LEN(REGEXP_REPLACE(text, '[^A-Za-z0-9]', '', 'g'))
                AS BIGINT) AS ch,
           CAST(LEN(STRING_SPLIT(text, ' ')) AS BIGINT) AS w,
           CAST(GREATEST(LEN(REGEXP_EXTRACT_ALL(text, '[.!?]+')), 1)
                AS BIGINT) AS s
    FROM documents
),
agg AS (
    SELECT source, CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(SUM(ch) AS BIGINT) AS chars_alnum,
           CAST(SUM(w) AS BIGINT) AS words,
           CAST(SUM(s) AS BIGINT) AS sentences
    FROM per_doc GROUP BY source
)
SELECT source, n_docs, chars_alnum, words, sentences,
       CAST((4710 * chars_alnum * sentences + 500 * words * words
             - 21430 * words * sentences)
            // (words * sentences) AS BIGINT) AS ari_milli,
       CAST((5880 * chars_alnum - 29600 * sentences) // words - 15800
            AS BIGINT) AS cli_milli
FROM agg
ORDER BY source
""",
)
def text_ari_coleman_liau(spark, sf_dir):
    d = t(spark, sf_dir, "documents")
    per_doc = d.select(
        "source",
        F.length(F.regexp_replace(F.col("text"), "[^A-Za-z0-9]", ""))
        .cast("long")
        .alias("ch"),
        F.size(F.split(F.col("text"), " ", -1)).cast("long").alias("w"),
        F.greatest(
            F.size(F.regexp_extract_all(F.col("text"), F.lit(r"[.!?]+"), 0)),
            F.lit(1),
        )
        .cast("long")
        .alias("s"),
    )
    agg = per_doc.groupBy("source").agg(
        bigint(F.count(F.lit(1))).alias("n_docs"),
        bigint(F.sum("ch")).alias("chars_alnum"),
        bigint(F.sum("w")).alias("words"),
        bigint(F.sum("s")).alias("sentences"),
    )
    return agg.select(
        "source",
        "n_docs",
        "chars_alnum",
        "words",
        "sentences",
        F.expr(
            "CAST((4710 * chars_alnum * sentences + 500 * words * words"
            " - 21430 * words * sentences)"
            " DIV (words * sentences) AS BIGINT)"
        ).alias("ari_milli"),
        F.expr(
            "CAST((5880 * chars_alnum - 29600 * sentences) DIV words - 15800"
            " AS BIGINT)"
        ).alias("cli_milli"),
    ).orderBy("source")


# ---------------------------------------------------------------------------
# k-NN label consistency
# ---------------------------------------------------------------------------


@register(
    "embedding_knn_label_consistency",
    "similarity",
    doc=f"Exact {KNN_K}-NN label-purity audit for the declared anchor "
    "sample (vec_id % 100 = 0): neighbors ranked by the floor(x*200) "
    "quantized dot product (similarity.py Q_SCALE contract — exact "
    "integers, no float tolerance), ties broken by smaller vec_id; "
    "reports per anchor how many of its 5 nearest share its label and "
    "whether the single nearest does. The 'would k-NN agree with the "
    "labels?' pre-flight before trusting embedding-space dedup "
    "thresholds. Anchors BROADCAST against the corpus (sample-bounded "
    "exact path; LSH variants are the corpus-scale approximate path).",
    oracle=f"""
WITH anc AS (
    SELECT vec_id AS aid, embedding AS av, label AS alab
    FROM embeddings WHERE vec_id % 100 = 0
),
scored AS (
    SELECT anc.aid, anc.alab, e.vec_id, e.label,
           CAST(SUM(FLOOR(CAST(e.embedding[i] AS DOUBLE) * {KNN_Q})
                    * FLOOR(CAST(anc.av[i] AS DOUBLE) * {KNN_Q}))
                AS BIGINT) AS qdot
    FROM embeddings e, anc,
         LATERAL (SELECT UNNEST(GENERATE_SERIES(1, LEN(e.embedding))) AS i)
    WHERE e.vec_id <> anc.aid
    GROUP BY anc.aid, anc.alab, e.vec_id, e.label
),
ranked AS (
    SELECT *, ROW_NUMBER() OVER (PARTITION BY aid
                 ORDER BY qdot DESC, vec_id) AS rn
    FROM scored
)
SELECT aid AS anchor_id, CAST(alab AS BIGINT) AS anchor_label,
       CAST(COUNT(*) FILTER (WHERE label = alab) AS BIGINT) AS n_same_label,
       CAST(MAX(CASE WHEN rn = 1 AND label = alab THEN 1 ELSE 0 END)
            AS BIGINT) AS top1_same
FROM ranked WHERE rn <= {KNN_K}
GROUP BY 1, 2 ORDER BY 1
""",
)
def embedding_knn_label_consistency(spark, sf_dir):
    e = t(spark, sf_dir, "embeddings")

    def _quant(col):
        return F.transform(col, lambda x: F.floor(x.cast("double") * KNN_Q))

    anc = e.filter(F.col("vec_id") % 100 == 0).select(
        F.col("vec_id").alias("aid"),
        _quant(F.col("embedding")).alias("aq"),
        F.col("label").alias("alab"),
    )
    # quantize the corpus ONCE below the anchor crossJoin (round-13):
    # inlining _quant into the post-join projection re-ran the 64-wide
    # interpreted transform per (row × anchor) PAIR instead of per row —
    # N_anchors× redundant lambda work (the similarity_mips_norm_bound
    # projection-barrier precedent). Warm sf0.1: 2.2-3.2 s → 1.3 s,
    # output verified identical.
    eq = e.select("vec_id", "label", _quant(F.col("embedding")).alias("qx"))
    scored = (
        eq.crossJoin(F.broadcast(anc))
        .filter(F.col("vec_id") != F.col("aid"))
        .select(
            "aid",
            "alab",
            "vec_id",
            "label",
            F.aggregate(
                F.zip_with(F.col("qx"), F.col("aq"), lambda x, y: x * y),
                F.lit(0).cast("long"),
                lambda acc, x: acc + x,
            ).alias("qdot"),
        )
    )
    w = Window.partitionBy("aid").orderBy(F.col("qdot").desc(), "vec_id")
    ranked = scored.withColumn("rn", F.row_number().over(w)).filter(
        F.col("rn") <= KNN_K
    )
    return (
        ranked.groupBy(
            F.col("aid").alias("anchor_id"),
            F.col("alab").cast("long").alias("anchor_label"),
        )
        .agg(
            _csum(F.col("label") == F.col("alab")).alias("n_same_label"),
            bigint(
                F.max(
                    F.when(
                        (F.col("rn") == 1) & (F.col("label") == F.col("alab")),
                        1,
                    ).otherwise(0)
                )
            ).alias("top1_same"),
        )
        .orderBy("anchor_id")
    )


# ---------------------------------------------------------------------------
# DAU/MAU stickiness
# ---------------------------------------------------------------------------


@register(
    "analytics_dau_mau_stickiness",
    "analytics",
    doc="Per-month engagement stickiness: sum of daily distinct users "
    "over monthly distinct users in exact truncated bp (the DAU/MAU "
    "product-health headline, summed-DAU form so the ratio is one "
    "integer division). Two combinable distinct aggregates joined on "
    "the month spine; null user_ids excluded (declared).",
    oracle="""
WITH ev AS (
    SELECT STRFTIME(ts, '%Y-%m') AS month, CAST(ts AS DATE) AS day, user_id
    FROM events WHERE user_id IS NOT NULL
),
dau AS (
    SELECT month, day, CAST(COUNT(DISTINCT user_id) AS BIGINT) AS dau
    FROM ev GROUP BY 1, 2
),
m AS (
    SELECT month, CAST(COUNT(*) AS BIGINT) AS days,
           CAST(SUM(dau) AS BIGINT) AS dau_sum
    FROM dau GROUP BY 1
),
mau AS (
    SELECT month, CAST(COUNT(DISTINCT user_id) AS BIGINT) AS mau
    FROM ev GROUP BY 1
)
SELECT m.month, m.days, m.dau_sum, mau.mau,
       CAST((10000 * m.dau_sum) // (m.days * mau.mau) AS BIGINT)
           AS stickiness_bp
FROM m JOIN mau ON mau.month = m.month
ORDER BY m.month
""",
)
def analytics_dau_mau_stickiness(spark, sf_dir):
    ev = (
        t(spark, sf_dir, "events")
        .filter(F.col("user_id").isNotNull())
        .select(
            F.date_format("ts", "yyyy-MM").alias("month"),
            F.to_date("ts").alias("day"),
            "user_id",
        )
    )
    dau = ev.groupBy("month", "day").agg(
        bigint(F.count_distinct("user_id")).alias("dau")
    )
    m = dau.groupBy("month").agg(
        bigint(F.count(F.lit(1))).alias("days"),
        bigint(F.sum("dau")).alias("dau_sum"),
    )
    mau = ev.groupBy("month").agg(
        bigint(F.count_distinct("user_id")).alias("mau")
    )
    return (
        m.join(mau, "month")
        .select(
            "month",
            "days",
            "dau_sum",
            "mau",
            F.expr(
                "CAST((10000 * dau_sum) DIV (days * mau) AS BIGINT)"
            ).alias("stickiness_bp"),
        )
        .orderBy("month")
    )


# ---------------------------------------------------------------------------
# GROUP BY / ORDER BY ordinals
# ---------------------------------------------------------------------------


@register(
    "sql_group_by_ordinal",
    "sql",
    doc="GROUP BY and ORDER BY by ordinal position "
    "(spark.sql.groupByOrdinal / orderByOrdinal, both default-on) with "
    "a HAVING over the aggregate — the positional-reference SQL "
    "surface row. Money summed as exact per-row cents (the decimal "
    "cents contract).",
    oracle="""
SELECT o_orderpriority, o_orderstatus,
       CAST(COUNT(*) AS BIGINT) AS n_orders,
       CAST(SUM(CAST(CAST(o_totalprice AS DECIMAL(12,4)) * 100 AS BIGINT))
            AS BIGINT) AS total_cents
FROM orders
GROUP BY 1, 2
HAVING COUNT(*) >= 5
ORDER BY 1, 2
""",
)
def sql_group_by_ordinal(spark, sf_dir):
    t(spark, sf_dir, "orders").createOrReplaceTempView("r10_orders")
    return spark.sql(
        """
        SELECT o_orderpriority, o_orderstatus,
               CAST(COUNT(*) AS BIGINT) AS n_orders,
               CAST(SUM(CAST(CAST(o_totalprice AS DECIMAL(12,4)) * 100
                             AS BIGINT)) AS BIGINT) AS total_cents
        FROM r10_orders
        GROUP BY 1, 2
        HAVING COUNT(*) >= 5
        ORDER BY 1, 2
        """
    )
