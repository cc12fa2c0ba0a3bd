"""Fuzzy (edit-distance) join with exact-recall blocking.

Entity resolution over corrupted identifiers: match a dirty key against
a clean catalog within Levenshtein distance 1 — WITHOUT an all-pairs
comparison. The blocking is the PassJoin pigeonhole: split each catalog
key into two halves; a single edit can damage only one half, so every
true match shares the intact half verbatim (first half as a prefix, or
second half as a suffix). Candidates come from the UNION of two
equi-joins on those halves; Levenshtein runs only as a residual on
candidates. Unlike LSH this blocking has PROVABLY exact recall for
distance <= 1 — the result set equals the naive quadratic join's, which
is exactly what the oracle computes.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from cascade_spark.operators._util import t
from cascade_spark.plans.registry import register


@register(
    "join_fuzzy_editdistance",
    "joins",
    doc="Blocked fuzzy join, exact recall: 9-hex-char entity ids "
    "(md5-derived — mixed digits so half-blocks distribute; zero-padded "
    "sequential ids would degenerate every prefix block) matched by "
    "dirty variants with one char deleted at a key-dependent position. "
    "Candidates = equi-join on first-5-prefix UNION equi-join on "
    "last-4-suffix (pigeonhole: one edit leaves one half intact), then "
    "the Levenshtein residual. The oracle is the NAIVE all-pairs "
    "distance join — proving the blocking loses nothing. At 100 TB the "
    "two equi-joins shuffle on short block keys; candidate counts are "
    "bounded by block sizes (observable the same way as "
    "profile_simhash_buckets).",
    oracle="""
WITH catalog AS (
    SELECT c_custkey AS entity_id,
           SUBSTR(MD5(CAST(c_custkey AS VARCHAR)), 1, 9) AS key
    FROM customer
), dirty AS (
    SELECT c_custkey AS probe_id,
           SUBSTR(SUBSTR(MD5(CAST(c_custkey AS VARCHAR)), 1, 9),
                  1, CAST(c_custkey % 9 AS INTEGER))
           || SUBSTR(SUBSTR(MD5(CAST(c_custkey AS VARCHAR)), 1, 9),
                     CAST(c_custkey % 9 AS INTEGER) + 2) AS q
    FROM customer
)
SELECT d.probe_id, c.entity_id, d.q, c.key,
       CAST(LEVENSHTEIN(d.q, c.key) AS BIGINT) AS dist
FROM dirty d JOIN catalog c ON LEVENSHTEIN(d.q, c.key) <= 1
ORDER BY probe_id, entity_id
""",
)
def join_fuzzy_editdistance(spark, sf_dir):
    cust = t(spark, sf_dir, "customer")
    key = F.substring(F.md5(F.col("c_custkey").cast("string")), 1, 9)
    catalog = cust.select(F.col("c_custkey").alias("entity_id"), key.alias("key"))
    # delete one char at position (custkey % 9) — deterministic dirt
    pos = (F.col("c_custkey") % 9).cast("int")
    q = F.concat(
        F.expr("substr(substr(md5(cast(c_custkey as string)), 1, 9), 1, cast(c_custkey % 9 as int))"),
        F.expr("substr(substr(md5(cast(c_custkey as string)), 1, 9), cast(c_custkey % 9 as int) + 2)"),
    )
    dirty = cust.select(F.col("c_custkey").alias("probe_id"), q.alias("q"))

    cat_k = catalog.select(
        "entity_id",
        "key",
        F.substring("key", 1, 5).alias("h1"),
        F.substring("key", 6, 4).alias("h2"),
    )
    probe_k = dirty.select(
        "probe_id",
        "q",
        F.substring("q", 1, 5).alias("p1"),
        F.substring("q", 5, 4).alias("p2"),  # last 4 of the 8-char probe
    )
    by_prefix = probe_k.join(cat_k, probe_k.p1 == cat_k.h1)
    by_suffix = probe_k.join(cat_k, probe_k.p2 == cat_k.h2)
    candidates = by_prefix.unionByName(by_suffix).select(
        "probe_id", "entity_id", "q", "key"
    ).distinct()
    dist = F.levenshtein("q", "key")
    return (
        candidates.filter(dist <= 1)
        .select("probe_id", "entity_id", "q", "key", dist.cast("long").alias("dist"))
        .orderBy("probe_id", "entity_id")
    )
