"""Distributed vector aggregation — per-label embedding centroids.

The building block for IVF training, semantic-cluster summarization, and
embedding-drift monitoring: posexplode the vector to (label, dim, value)
triples, aggregate per (label, dim), and (optionally) reassemble. One
shuffle keyed on (label, dim) with map-side partial sums — at 100 TB the
shuffled aggregate is |labels|×|dims| rows regardless of input size, so
this scales linearly in the scan.

Determinism (cross-engine, see _util.py): per-element ROUND(double, k)
can straddle a half-boundary differently in Spark vs DuckDB, so elements
are quantized by *truncation* toward zero (rule-free: both engines see
the identical float32→double value), summed as exact BIGINTs, and the
mean is one IEEE double division of two exact integers — bit-identical
everywhere, with no rounding step at all.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from cascade_spark.plans.registry import register
from cascade_spark.operators._util import bigint, t

Q = 10_000  # quantization scale: 4 fractional digits


@register(
    "embedding_centroid_per_label",
    "similarity",
    doc="Per-label centroid of the 64-dim embedding column: "
    "posexplode → (label, dim) mean of truncation-quantized elements, "
    "plus member count; exact-integer sums make the mean engine-exact.",
    oracle=f"""
SELECT label,
       CAST(u.i - 1 AS BIGINT) AS dim,
       CAST(COUNT(*) AS BIGINT) AS n_vectors,
       CAST(SUM(CAST(TRUNC(CAST(e.embedding[u.i] AS DOUBLE) * {Q}.0) AS BIGINT)) AS BIGINT) AS sum_q,
       CAST(SUM(CAST(TRUNC(CAST(e.embedding[u.i] AS DOUBLE) * {Q}.0) AS BIGINT)) AS DOUBLE)
         / (COUNT(*) * {Q}.0) AS centroid
FROM embeddings e,
     LATERAL (SELECT UNNEST(GENERATE_SERIES(1, LEN(e.embedding))) AS i) u
GROUP BY label, u.i
ORDER BY label, dim
""",
)
def embedding_centroid_per_label(spark, sf_dir):
    e = t(spark, sf_dir, "embeddings")
    # Spark CAST double→long truncates toward zero ≡ DuckDB TRUNC.
    xq = (F.col("x").cast("double") * F.lit(float(Q))).cast("long")
    elems = e.select(
        "label",
        F.posexplode("embedding").alias("pos", "x"),
    ).select("label", "pos", xq.alias("xq"))
    return (
        elems.groupBy("label", "pos")
        .agg(
            bigint(F.count(F.lit(1))).alias("n_vectors"),
            bigint(F.sum("xq")).alias("sum_q"),
        )
        .select(
            "label",
            bigint(F.col("pos")).alias("dim"),
            "n_vectors",
            "sum_q",
            (F.col("sum_q").cast("double") / (F.col("n_vectors") * F.lit(float(Q)))).alias(
                "centroid"
            ),
        )
        .orderBy("label", "dim")
    )
