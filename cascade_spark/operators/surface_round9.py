"""Round-9 wave — corpus cross-contamination matrix and aggregate
surface extensions:

- ``dedup_cross_source_matrix``: the near-dup pair mass BETWEEN every
  source pair (and within each source) off the SHARED persisted
  MinHash+LSH pair frame — the contamination matrix a mixture owner
  reads before weighting sources (a high cross cell means two "sources"
  are the same crawl twice). Rates in exact pairs-per-million.
- ``agg_multi_distinct_filtered``: several COUNT(DISTINCT ...) in one
  aggregate, including a filtered distinct via the NULL-excluding CASE
  idiom and a composite-key distinct — the multi-Expand plan shape.
- ``agg_arg_extrema``: max_by/min_by with composite (value, key)
  orderings — deterministic argmin/argmax extraction with declared tie
  rules (the ties-safe version of the bare max_by hazard).

Reference scope: declared aggregates over ``documents`` / ``events`` /
``orders`` per SURVEY §2B.

Scale (100 TB): the contamination matrix reads the persisted LSH pair
frame (pair lists are tiny next to the corpus; the quadratic stage is
band-bucketed and capped upstream — dedup.py's declared semantics) and
joins the 2-column doc→source projection twice; the aggregate queries
are single map-side-combinable groupBys (multi-distinct fans through
Spark's Expand, still one shuffle).
"""

from __future__ import annotations

from pyspark.sql import functions as F

from cascade_spark.operators._util import bigint, d2, dec, t
from cascade_spark.operators.dedup import _SQL_PAIR_CTES, N_HASHES, _lsh_pairs
from cascade_spark.plans.registry import register

PPM = 1_000_000


@register(
    "dedup_cross_source_matrix",
    "dedup",
    doc="Cross-source contamination matrix from the shared MinHash+LSH "
    "near-dup pair frame (16 hashes, 4x4 bands, agreement >= 1/2 — "
    "dedup_minhash_lsh's exact candidates): pairs roll up to the "
    "unordered (source_a <= source_b) cell with the duplication rate "
    "in exact pairs-per-million of the cell's pair space (n_a*n_b "
    "cross, n(n-1)/2 within) — the read-before-you-weight diagnostic "
    "for mixture construction. Pair frame is persisted and shared; "
    "this adds two broadcast source-projection joins and one groupBy.",
    oracle=f"""
WITH {_SQL_PAIR_CTES},
pairs AS (SELECT d1, d2 FROM sim WHERE matches * 2 >= {N_HASHES}),
src AS (SELECT doc_id, source FROM documents),
cnt AS (SELECT source, CAST(COUNT(*) AS BIGINT) AS n FROM src GROUP BY 1),
cells AS (
    SELECT LEAST(sa.source, sb.source) AS source_a,
           GREATEST(sa.source, sb.source) AS source_b,
           CAST(COUNT(*) AS BIGINT) AS n_dup_pairs
    FROM pairs p
    JOIN src sa ON sa.doc_id = p.d1
    JOIN src sb ON sb.doc_id = p.d2
    GROUP BY 1, 2
)
SELECT c.source_a, c.source_b, c.n_dup_pairs,
       CAST(CASE WHEN c.source_a = c.source_b
                 THEN CASE WHEN na.n <= 1 THEN 0
                      ELSE (c.n_dup_pairs * {PPM} * 2) // (na.n * (na.n - 1))
                      END
                 ELSE (c.n_dup_pairs * {PPM}) // (na.n * nb.n)
            END AS BIGINT) AS dup_rate_ppm
FROM cells c
JOIN cnt na ON na.source = c.source_a
JOIN cnt nb ON nb.source = c.source_b
ORDER BY c.source_a, c.source_b
""",
)
def dedup_cross_source_matrix(spark, sf_dir):
    pairs = _lsh_pairs(spark, sf_dir).select("d1", "d2")
    src = t(spark, sf_dir, "documents").select("doc_id", "source")
    cnt = src.groupBy("source").agg(bigint(F.count(F.lit(1))).alias("n"))
    sa = src.select(F.col("doc_id").alias("d1"), F.col("source").alias("s1"))
    sb = src.select(F.col("doc_id").alias("d2"), F.col("source").alias("s2"))
    cells = (
        pairs.join(F.broadcast(sa), "d1")
        .join(F.broadcast(sb), "d2")
        .groupBy(
            F.least("s1", "s2").alias("source_a"),
            F.greatest("s1", "s2").alias("source_b"),
        )
        .agg(bigint(F.count(F.lit(1))).alias("n_dup_pairs"))
    )
    na = cnt.select(F.col("source").alias("source_a"), F.col("n").alias("na"))
    nb = cnt.select(F.col("source").alias("source_b"), F.col("n").alias("nb"))
    return (
        cells.join(F.broadcast(na), "source_a")
        .join(F.broadcast(nb), "source_b")
        .select(
            "source_a",
            "source_b",
            "n_dup_pairs",
            F.expr(
                f"CAST(CASE WHEN source_a = source_b"
                f" THEN CASE WHEN na <= 1 THEN 0"
                f"      ELSE (n_dup_pairs * {PPM} * 2) DIV (na * (na - 1)) END"
                f" ELSE (n_dup_pairs * {PPM}) DIV (na * nb)"
                f" END AS BIGINT)"
            ).alias("dup_rate_ppm"),
        )
        .orderBy("source_a", "source_b")
    )


@register(
    "agg_multi_distinct_filtered",
    "aggregation",
    doc="Several COUNT(DISTINCT) measures in ONE aggregate per event "
    "type: distinct users, distinct WEEKEND users via the "
    "NULL-excluding CASE idiom (portable across engines that restrict "
    "FILTER on DISTINCT), distinct active days, and the composite "
    "(user, day) distinct — the multi-Expand plan shape Spark compiles "
    "several distincts into (still one shuffle).",
    oracle="""
SELECT event_type,
       CAST(COUNT(DISTINCT user_id) AS BIGINT) AS u_distinct,
       CAST(COUNT(DISTINCT CASE WHEN ISODOW(CAST(ts AS DATE)) >= 6
                                THEN user_id END) AS BIGINT)
           AS u_weekend_distinct,
       CAST(COUNT(DISTINCT CAST(ts AS DATE)) AS BIGINT) AS d_distinct,
       CAST(COUNT(DISTINCT (user_id, CAST(ts AS DATE))) AS BIGINT)
           AS user_day_distinct
FROM events
WHERE user_id IS NOT NULL
GROUP BY event_type
ORDER BY event_type
""",
)
def agg_multi_distinct_filtered(spark, sf_dir):
    ev = t(spark, sf_dir, "events").filter(F.col("user_id").isNotNull())
    day = F.to_date("ts")
    weekend = F.dayofweek(F.date_sub(day, 1)).cast("long") >= 6
    return (
        ev.groupBy("event_type")
        .agg(
            bigint(F.count_distinct("user_id")).alias("u_distinct"),
            bigint(
                F.count_distinct(F.when(weekend, F.col("user_id")))
            ).alias("u_weekend_distinct"),
            bigint(F.count_distinct(day)).alias("d_distinct"),
            bigint(F.count_distinct(F.col("user_id"), day)).alias(
                "user_day_distinct"
            ),
        )
        .orderBy("event_type")
    )


@register(
    "agg_arg_extrema",
    "aggregation",
    doc="Deterministic argmax/argmin per order priority: the order key "
    "carrying the highest and lowest total price, with COMPOSITE "
    "(price, key) orderings as the declared tie rule (max side breaks "
    "ties to the larger key, min side to the smaller) — the ties-safe "
    "form of max_by/min_by; oracle mirrors via ordered FIRST. Prices "
    "compared as exact decimals.",
    oracle="""
SELECT o_orderpriority,
       CAST(COUNT(*) AS BIGINT) AS n_orders,
       CAST(FIRST(o_orderkey ORDER BY CAST(o_totalprice AS DECIMAL(12,4))
                  DESC, o_orderkey DESC) AS BIGINT) AS top_orderkey,
       CAST(ROUND(MAX(CAST(o_totalprice AS DECIMAL(12,4))), 2) AS DOUBLE)
           AS top_price,
       CAST(FIRST(o_orderkey ORDER BY CAST(o_totalprice AS DECIMAL(12,4)),
                  o_orderkey) AS BIGINT) AS bottom_orderkey,
       CAST(ROUND(MIN(CAST(o_totalprice AS DECIMAL(12,4))), 2) AS DOUBLE)
           AS bottom_price
FROM orders
GROUP BY o_orderpriority
ORDER BY o_orderpriority
""",
)
def agg_arg_extrema(spark, sf_dir):
    o = t(spark, sf_dir, "orders")
    p = dec("o_totalprice")
    return (
        o.groupBy("o_orderpriority")
        .agg(
            bigint(F.count(F.lit(1))).alias("n_orders"),
            bigint(
                F.max_by(
                    "o_orderkey", F.struct(p.alias("p"), F.col("o_orderkey"))
                )
            ).alias("top_orderkey"),
            d2(F.max(p)).alias("top_price"),
            bigint(
                F.min_by(
                    "o_orderkey", F.struct(p.alias("p"), F.col("o_orderkey"))
                )
            ).alias("bottom_orderkey"),
            d2(F.min(p)).alias("bottom_price"),
        )
        .orderBy("o_orderpriority")
    )


W_MICRO = 1_000_000


@register(
    "dedup_soft_weighting",
    "dedup",
    doc="Soft dedup: instead of DROPPING near-duplicates, every doc in "
    "an LSH near-dup cluster is down-weighted to 1e6 DIV cluster_size "
    "micro (singletons keep 1e6) — the 'count each duplicated passage "
    "once in expectation' policy some corpora prefer over hard "
    "removal. Per source: clustered-doc count, raw vs effective "
    "whitespace-token mass, and the retention share in truncated bp. "
    "Reuses the shared persisted LSH pair frame + CC labels; the "
    "oracle walks the same recursive-CTE transitive closure.",
    oracle=f"""
WITH RECURSIVE {_SQL_PAIR_CTES},
pairs AS (SELECT d1, d2 FROM sim WHERE matches * 2 >= {N_HASHES}),
edges AS (SELECT d1 AS a, d2 AS b FROM pairs
          UNION ALL SELECT d2 AS a, d1 AS b FROM pairs),
reach(src, dst) AS (
    SELECT a, b FROM edges
    UNION
    SELECT r.src, e.b FROM reach r JOIN edges e ON r.dst = e.a
),
comp AS (
    SELECT src AS node, LEAST(src, MIN(dst)) AS comp
    FROM reach GROUP BY src
),
csize AS (SELECT comp, CAST(COUNT(*) AS BIGINT) AS sz FROM comp GROUP BY 1),
dw AS (
    SELECT d.source,
           CAST(LEN(STRING_SPLIT(d.text, ' ')) AS BIGINT) AS tok,
           CASE WHEN c.node IS NULL THEN CAST({W_MICRO} AS BIGINT)
                ELSE {W_MICRO} // s.sz END AS w,
           CASE WHEN c.node IS NULL THEN 0 ELSE 1 END AS clustered
    FROM documents d
    LEFT JOIN comp c ON c.node = d.doc_id
    LEFT JOIN csize s ON s.comp = c.comp
)
SELECT source,
       CAST(COUNT(*) AS BIGINT) AS n_docs,
       CAST(SUM(clustered) AS BIGINT) AS n_clustered,
       CAST(SUM(tok) AS BIGINT) AS raw_tokens,
       CAST(SUM(tok * w) // {W_MICRO} AS BIGINT) AS eff_tokens,
       CAST(CASE WHEN SUM(tok) = 0 THEN 0
                 ELSE SUM(tok * w) // (SUM(tok) * 100) END AS BIGINT)
           AS retention_bp
FROM dw
GROUP BY source
ORDER BY source
""",
)
def dedup_soft_weighting(spark, sf_dir):
    from cascade_spark.operators.dedup import _cc_label_frame

    labels = _cc_label_frame(spark, sf_dir)
    csize = labels.groupBy("comp").agg(
        F.count(F.lit(1)).cast("long").alias("sz")
    )
    lbl = labels.join(csize, "comp").select(
        F.col("node").alias("doc_id"), "sz"
    )
    docs = t(spark, sf_dir, "documents").select(
        "doc_id",
        "source",
        F.size(F.split(F.col("text"), " ", -1)).cast("long").alias("tok"),
    )
    dw = docs.join(F.broadcast(lbl), "doc_id", "left").select(
        "source",
        "tok",
        F.when(F.col("sz").isNull(), F.lit(W_MICRO).cast("long"))
        .otherwise(F.expr(f"{W_MICRO} DIV sz"))
        .alias("w"),
        F.when(F.col("sz").isNull(), 0).otherwise(1).alias("clustered"),
    )
    return (
        dw.groupBy("source")
        .agg(
            bigint(F.count(F.lit(1))).alias("n_docs"),
            bigint(F.sum("clustered")).alias("n_clustered"),
            bigint(F.sum("tok")).alias("raw_tokens"),
            F.expr(f"CAST(SUM(tok * w) DIV {W_MICRO} AS BIGINT)").alias(
                "eff_tokens"
            ),
            F.expr(
                "CAST(CASE WHEN SUM(tok) = 0 THEN 0"
                " ELSE SUM(tok * w) DIV (SUM(tok) * 100) END AS BIGINT)"
            ).alias("retention_bp"),
        )
        .orderBy("source")
    )
