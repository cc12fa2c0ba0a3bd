"""Round-11 surface — gap-fill only (round-10 verdict item 8: depth
round, additions must fill genuine holes, cap 15).

Five queries covering Spark-4 feature surface the registry did not yet
exercise:

- ``agg_theta_sketch_distinct`` / ``agg_theta_sketch_setops``: the
  Apache DataSketches theta family (theta_sketch_agg / theta_union_agg
  / theta_intersection / theta_difference) — the sketch that supports
  SET ALGEBRA, which HLL cannot (hll_sketch_merge can only union).
  Both run in the sketch's EXACT regime and therefore hash-check
  against DuckDB COUNT(DISTINCT)/set-SQL — the
  agg_percentile_approx_exact_regime precedent: the declared contract
  is lgNomEntries = 14, exact while per-sketch distinct keys stay
  ≤ 2^14 nominal entries (fixture: 1 500 users; the cap and the
  estimate-mode crossover are declared in the doc so a 100× corpus
  knows when the hash contract ends).
- ``fn_time_type``: Spark 4's TIME type (spark.sql.timeType.enabled)
  — make_time / time_trunc / EXTRACT over a time-of-day column,
  mirrored against DuckDB's native TIME.
- ``fn_scalar_additions_41``: the 4.1 scalar additions monthname /
  dayname / zeroifnull / nullifzero, mirrored against DuckDB
  strftime('%b'/'%a') and COALESCE/NULLIF.
- ``sort_collated_order``: collation-aware distinct counting under
  UTF8_LCASE (lowercase-then-binary compare), which for ASCII data is
  EXACTLY DuckDB's COUNT(DISTINCT lower(x)) — the collation semantics
  are visible in the VALUES (ci vs binary distinct counts diverge on
  the mixed-case fixture), not just in row order.

Reference scope: declared aggregate/function surface per SURVEY §2B
(the reference's R7 timestamp handling is the only time-adjacent
reference op; these extend the engine surface, not the reference map).

Scale (100 TB): theta sketches are the point — map-side-combinable
fixed-size state per group, exact set algebra until the nominal-entry
cap, then a declared approximate regime; everything else here is
map-only projection + one combinable aggregate.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from cascade_spark.operators._util import bigint, t
from cascade_spark.plans.registry import register

THETA_LG_K = 14  # exact while per-sketch distinct ≤ 2^14 nominal entries


@register(
    "agg_theta_sketch_distinct",
    "aggregations",
    doc="Theta-sketch distinct users per event_type plus the 'ALL' row "
    "from theta_union_agg over the five per-type sketches — the "
    "re-aggregatable rollup shape (union the SKETCHES, never recount "
    f"the rows). lgNomEntries = {THETA_LG_K} declared: estimates are "
    "EXACT while each sketch holds ≤ 2^14 distinct keys (fixture: "
    "1,500 users), so the result hash-checks against COUNT(DISTINCT); "
    "past the cap the sketch enters sampling mode and the contract "
    "becomes tolerance-only (the agg_percentile_approx_exact_regime "
    "precedent). One map-side-combinable pass; sketch state is fixed "
    "size per group at any corpus scale.",
    oracle="""
SELECT event_type, CAST(COUNT(DISTINCT user_id) AS BIGINT) AS n_users
FROM events GROUP BY event_type
UNION ALL
SELECT 'ALL' AS event_type, CAST(COUNT(DISTINCT user_id) AS BIGINT) AS n_users
FROM events
ORDER BY event_type
""",
)
def agg_theta_sketch_distinct(spark, sf_dir):
    ev = t(spark, sf_dir, "events")
    per = ev.groupBy("event_type").agg(
        F.theta_sketch_agg("user_id", THETA_LG_K).alias("sk")
    )
    typed = per.select(
        "event_type", F.theta_sketch_estimate("sk").cast("long").alias("n_users")
    )
    union = per.agg(
        F.theta_sketch_estimate(F.theta_union_agg("sk", THETA_LG_K))
        .cast("long")
        .alias("n_users")
    ).select(F.lit("ALL").alias("event_type"), "n_users")
    return typed.unionByName(union).orderBy("event_type")


@register(
    "agg_theta_sketch_setops",
    "aggregations",
    doc="Theta-sketch SET ALGEBRA on the click vs purchase user sets: "
    "|click|, |purchase|, |click ∩ purchase| (theta_intersection), "
    "|click \\ purchase| (theta_difference) — the audience-overlap "
    "query HLL cannot answer (HLL unions only). Exact regime per "
    f"lgNomEntries = {THETA_LG_K} (see agg_theta_sketch_distinct), so "
    "every estimate hash-checks against the relational set operators. "
    "Two conditional sketch aggregates in ONE pass over events, then "
    "scalar sketch ops on the 1-row frame — no re-scan per set op.",
    oracle="""
WITH c AS (SELECT DISTINCT user_id FROM events WHERE event_type = 'click'),
p AS (SELECT DISTINCT user_id FROM events WHERE event_type = 'purchase')
SELECT (SELECT CAST(COUNT(*) AS BIGINT) FROM c) AS n_click,
       (SELECT CAST(COUNT(*) AS BIGINT) FROM p) AS n_purchase,
       (SELECT CAST(COUNT(*) AS BIGINT) FROM c WHERE user_id IN
            (SELECT user_id FROM p)) AS n_both,
       (SELECT CAST(COUNT(*) AS BIGINT) FROM c WHERE user_id NOT IN
            (SELECT user_id FROM p)) AS n_click_only
""",
)
def agg_theta_sketch_setops(spark, sf_dir):
    ev = t(spark, sf_dir, "events")
    sk = ev.agg(
        F.theta_sketch_agg(
            F.when(F.col("event_type") == "click", F.col("user_id")),
            THETA_LG_K,
        ).alias("sc"),
        F.theta_sketch_agg(
            F.when(F.col("event_type") == "purchase", F.col("user_id")),
            THETA_LG_K,
        ).alias("sp"),
    )
    return sk.select(
        F.theta_sketch_estimate("sc").cast("long").alias("n_click"),
        F.theta_sketch_estimate("sp").cast("long").alias("n_purchase"),
        F.theta_sketch_estimate(F.theta_intersection("sc", "sp"))
        .cast("long")
        .alias("n_both"),
        F.theta_sketch_estimate(F.theta_difference("sc", "sp"))
        .cast("long")
        .alias("n_click_only"),
    )


@register(
    "fn_time_type",
    "functions",
    doc="Spark 4 TIME type (spark.sql.timeType.enabled): project each "
    "event's time-of-day via make_time, truncate to the hour with "
    "time_trunc, EXTRACT minute, then aggregate events per truncated "
    "hour — mirrored against DuckDB's native TIME (make_time / "
    "whole-second components on both sides; the hour spine is 24 rows "
    "so the aggregate is map-side combinable at any scale).",
    oracle="""
WITH tt AS (
    SELECT make_time(CAST(EXTRACT(hour FROM ts) AS INT),
                     CAST(EXTRACT(minute FROM ts) AS INT), 0.0) AS tod
    FROM events
)
SELECT make_time(CAST(EXTRACT(hour FROM tod) AS INT), 0, 0.0) AS hour_start,
       CAST(COUNT(*) AS BIGINT) AS n,
       CAST(MIN(EXTRACT(minute FROM tod)) AS BIGINT) AS first_minute,
       CAST(MAX(EXTRACT(minute FROM tod)) AS BIGINT) AS last_minute
FROM tt GROUP BY 1 ORDER BY hour_start
""",
)
def fn_time_type(spark, sf_dir):
    # spark.sql.timeType.enabled is a declared session default
    # (tables.ensure_session_confs), set by the t() load below — no
    # per-query conf mutation here (round-11 ADVICE item 1).
    ev = t(spark, sf_dir, "events")
    tod = ev.select(
        F.expr(
            "make_time(CAST(extract(hour FROM ts) AS INT),"
            " CAST(extract(minute FROM ts) AS INT), 0)"
        ).alias("tod")
    )
    return (
        tod.select(
            F.expr("time_trunc('HOUR', tod)").alias("hour_start"),
            F.expr("CAST(extract(minute FROM tod) AS BIGINT)").alias("m"),
        )
        .groupBy("hour_start")
        .agg(
            bigint(F.count(F.lit(1))).alias("n"),
            bigint(F.min("m")).alias("first_minute"),
            bigint(F.max("m")).alias("last_minute"),
        )
        .orderBy("hour_start")
    )


@register(
    "fn_scalar_additions_41",
    "functions",
    doc="Spark 4.1 scalar additions over the orders calendar: "
    "monthname/dayname (abbreviated English names, mirrored against "
    "DuckDB strftime '%b'/'%a'), zeroifnull on the otherwise-NULL "
    "high-value sum (mirrors COALESCE(...,0)), nullifzero on the "
    "zero-count guard (mirrors NULLIF). Grouped by order month-name x "
    "day-name — a bounded 12x7 spine, one combinable pass.",
    oracle="""
SELECT strftime(o_orderdate, '%b') AS mon,
       strftime(o_orderdate, '%a') AS dow,
       CAST(COUNT(*) AS BIGINT) AS n_orders,
       CAST(COALESCE(SUM(CASE WHEN CAST(o_totalprice AS DECIMAL(12,2))
                                   > 500000 THEN 1 END), 0) AS BIGINT)
           AS n_high_value,
       CAST(NULLIF(COUNT(CASE WHEN o_orderstatus = 'P' THEN 1 END), 0)
            AS BIGINT) AS n_pending_or_null
FROM orders
GROUP BY 1, 2 ORDER BY mon, dow
""",
)
def fn_scalar_additions_41(spark, sf_dir):
    o = t(spark, sf_dir, "orders")
    return (
        o.groupBy(
            F.monthname("o_orderdate").alias("mon"),
            F.dayname("o_orderdate").alias("dow"),
        )
        .agg(
            bigint(F.count(F.lit(1))).alias("n_orders"),
            bigint(
                F.zeroifnull(
                    F.sum(
                        F.when(
                            F.col("o_totalprice").cast("decimal(12,2)")
                            > 500000,
                            F.lit(1),
                        )
                    )
                )
            ).alias("n_high_value"),
            bigint(
                F.nullifzero(
                    F.count(F.when(F.col("o_orderstatus") == "P", F.lit(1)))
                )
            ).alias("n_pending_or_null"),
        )
        .orderBy("mon", "dow")
    )


@register(
    "sort_collated_order",
    "sql",
    doc="Collation-aware distinct counting under UTF8_LCASE "
    "(lowercase-then-binary comparison, Spark 4 collations): over a "
    "mixed-case name corpus (nation names union their lowercased "
    "forms), count per-trailing-character distinct names case-insensitively "
    "(COLLATE UTF8_LCASE) vs binary — the two columns DIVERGE on "
    "every group, so the collation semantics are hash-visible in the "
    "values, not just in row order. For ASCII data UTF8_LCASE equals "
    "DuckDB's COUNT(DISTINCT lower(x)) exactly. One combinable pass "
    "over a 25x2-row frame; at scale this is the dictionary-side "
    "normalization pass of a case-insensitive join.",
    oracle="""
WITH names AS (
    SELECT n_name AS nm FROM nation
    UNION ALL
    SELECT lower(n_name) FROM nation
)
SELECT lower(substr(nm, length(nm), 1)) AS last_char,
       CAST(COUNT(*) AS BIGINT) AS n_rows,
       CAST(COUNT(DISTINCT lower(nm)) AS BIGINT) AS n_distinct_ci,
       CAST(COUNT(DISTINCT nm) AS BIGINT) AS n_distinct_binary,
       MIN(lower(nm)) AS min_name_ci
FROM names GROUP BY 1 ORDER BY last_char
""",
)
def sort_collated_order(spark, sf_dir):
    n = t(spark, sf_dir, "nation")
    names = n.select(F.col("n_name").alias("nm")).unionAll(
        n.select(F.lower("n_name").alias("nm"))
    )
    return (
        names.groupBy(
            F.lower(F.expr("substr(nm, length(nm), 1)")).alias("last_char")
        )
        .agg(
            bigint(F.count(F.lit(1))).alias("n_rows"),
            bigint(
                F.count_distinct(F.expr("nm COLLATE UTF8_LCASE"))
            ).alias("n_distinct_ci"),
            bigint(F.count_distinct("nm")).alias("n_distinct_binary"),
            F.min(F.lower("nm")).alias("min_name_ci"),
        )
        .orderBy("last_char")
    )
