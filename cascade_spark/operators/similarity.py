"""Similarity search over ``embeddings.embedding`` (array<float>, 64-d).

Three paths:
- brute-force cosine top-k — JVM-side higher-order functions
  (zip_with-style fold via ``aggregate``), the exactness baseline;
- LSH-bucketed ANN — sign-random-projection with *md5-derived* (hence
  deterministic, oracle-checkable) hyperplanes: bucket on a 6-bit code,
  score only same-bucket candidates. This is the 100 TB path: bucketing
  is a hash-partitionable groupBy and candidate scoring is linear in
  bucket size, never O(n²);
- Arrow-vectorized Pandas UDF scoring (mapInPandas + numpy) — the
  batch-friendly shape when Python-side models are unavoidable.

Determinism: all products widen float→double before multiplying (exact,
identical in both engines); rankings order by the *rounded* similarity
plus vec_id so last-ulp accumulation differences can't reorder results.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from cascade_spark.plans.registry import register
from cascade_spark.operators._util import t

N_PLANES = 6
QUERY_VEC_ID = 0
TOP_K = 10


def _dot(a, b):  # sequential fold, double accumulation — JVM-side
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def _cos(a: str, b: str):
    return F.round(
        _dot(F.col(a), F.col(b))
        / (F.sqrt(_dot(F.col(a), F.col(a))) * F.sqrt(_dot(F.col(b), F.col(b)))),
        6,
    )


_SQL_DOT = """
    SUM(CAST(e.embedding[i] AS DOUBLE) * CAST(q.qv[i] AS DOUBLE))
"""


@register(
    "similarity_cosine_topk",
    "similarity",
    doc="Brute-force cosine top-10 neighbors of vec_id 0 — the exact "
    "baseline every ANN variant is measured against.",
    oracle=f"""
WITH q AS (SELECT embedding AS qv FROM embeddings WHERE vec_id = {QUERY_VEC_ID}),
sims AS (
    SELECT e.vec_id,
           ROUND(SUM(CAST(e.embedding[i] AS DOUBLE) * CAST(q.qv[i] AS DOUBLE))
                 / (SQRT(SUM(CAST(e.embedding[i] AS DOUBLE) * CAST(e.embedding[i] AS DOUBLE)))
                    * SQRT(SUM(CAST(q.qv[i] AS DOUBLE) * CAST(q.qv[i] AS DOUBLE)))), 6)
               AS cos_sim
    FROM embeddings e, q,
         LATERAL (SELECT UNNEST(GENERATE_SERIES(1, LEN(e.embedding))) AS i)
    WHERE e.vec_id <> {QUERY_VEC_ID}
    GROUP BY e.vec_id
)
SELECT vec_id, cos_sim FROM sims
ORDER BY cos_sim DESC, vec_id LIMIT {TOP_K}
""",
)
def similarity_cosine_topk(spark, sf_dir):
    e = t(spark, sf_dir, "embeddings")
    query = e.filter(F.col("vec_id") == QUERY_VEC_ID).select(F.col("embedding").alias("_qv"))
    scored = (
        e.filter(F.col("vec_id") != QUERY_VEC_ID)
        .crossJoin(F.broadcast(query))
        .select("vec_id", _cos("embedding", "_qv").alias("cos_sim"))
    )
    return scored.orderBy(F.col("cos_sim").desc(), "vec_id").limit(TOP_K)


def _plane_signs(spark):
    """±1 sign matrix for N_PLANES×64 sign-random-projection hyperplanes,
    derived from md5 — deterministic and reproducible in SQL."""
    planes = spark.range(N_PLANES).select(F.col("id").cast("int").alias("p"))
    dims = spark.range(64).select((F.col("id") + 1).cast("int").alias("i"))  # 1-based
    return planes.crossJoin(dims).select(
        "p",
        "i",
        F.when(
            F.conv(F.substring(F.md5(F.concat_ws(":", "p", "i")), 1, 8), 16, 10)
            .cast("long")
            .bitwiseAND(1)
            == 1,
            1.0,
        )
        .otherwise(-1.0)
        .alias("s"),
    )


_SQL_SIGNS = """
    SELECT p, i,
           CASE WHEN ('0x' || SUBSTR(MD5(p || ':' || i), 1, 8))::BIGINT & 1 = 1
                THEN 1.0 ELSE -1.0 END AS s
    FROM (SELECT UNNEST(GENERATE_SERIES(0, {np})) AS p)
    CROSS JOIN (SELECT UNNEST(GENERATE_SERIES(1, 64)) AS i)
""".format(np=N_PLANES - 1)


@register(
    "similarity_ann_lsh",
    "similarity",
    doc="ANN via sign-random-projection LSH: 6 md5-derived hyperplanes "
    "→ 6-bit bucket code; exact cosine scored only inside the query's "
    "bucket. Deterministic planes make even the ANN path oracle-checkable.",
    oracle=f"""
WITH signs AS ({_SQL_SIGNS}),
proj AS (
    SELECT e.vec_id, s.p,
           SUM(CAST(e.embedding[s.i] AS DOUBLE) * s.s) AS dot
    FROM embeddings e JOIN signs s ON TRUE
    GROUP BY e.vec_id, s.p
),
codes AS (
    SELECT vec_id,
           SUM(CASE WHEN dot > 0 THEN CAST(1 AS BIGINT) << p ELSE 0 END) AS bucket
    FROM proj GROUP BY vec_id
),
qb AS (SELECT bucket FROM codes WHERE vec_id = {QUERY_VEC_ID}),
q AS (SELECT embedding AS qv FROM embeddings WHERE vec_id = {QUERY_VEC_ID}),
cand AS (
    SELECT c.vec_id FROM codes c, qb
    WHERE c.bucket = qb.bucket AND c.vec_id <> {QUERY_VEC_ID}
),
sims AS (
    SELECT e.vec_id,
           ROUND(SUM(CAST(e.embedding[i] AS DOUBLE) * CAST(q.qv[i] AS DOUBLE))
                 / (SQRT(SUM(CAST(e.embedding[i] AS DOUBLE) * CAST(e.embedding[i] AS DOUBLE)))
                    * SQRT(SUM(CAST(q.qv[i] AS DOUBLE) * CAST(q.qv[i] AS DOUBLE)))), 6)
               AS cos_sim
    FROM embeddings e JOIN cand USING (vec_id), q,
         LATERAL (SELECT UNNEST(GENERATE_SERIES(1, LEN(e.embedding))) AS i)
    GROUP BY e.vec_id
)
SELECT vec_id, cos_sim FROM sims
ORDER BY cos_sim DESC, vec_id LIMIT {TOP_K}
""",
)
def similarity_ann_lsh(spark, sf_dir):
    e = t(spark, sf_dir, "embeddings")
    signs = _plane_signs(spark)
    elems = e.select("vec_id", F.posexplode("embedding").alias("pos", "x")).withColumn(
        "i", F.col("pos") + 1
    )
    proj = (
        elems.join(F.broadcast(signs), "i")
        .groupBy("vec_id", "p")
        .agg(F.sum(F.col("x").cast("double") * F.col("s")).alias("dot"))
    )
    codes = proj.groupBy("vec_id").agg(
        F.sum(
            F.when(F.col("dot") > 0, F.expr("shiftleft(CAST(1 AS BIGINT), p)")).otherwise(0)
        ).alias("bucket")
    )
    qb = codes.filter(F.col("vec_id") == QUERY_VEC_ID).select(F.col("bucket").alias("qbucket"))
    cand = (
        codes.crossJoin(F.broadcast(qb))
        .filter((F.col("bucket") == F.col("qbucket")) & (F.col("vec_id") != QUERY_VEC_ID))
        .select("vec_id")
    )
    query = e.filter(F.col("vec_id") == QUERY_VEC_ID).select(F.col("embedding").alias("_qv"))
    scored = (
        e.join(cand, "vec_id")
        .crossJoin(F.broadcast(query))
        .select(
            "vec_id",
            F.round(
                _dot(F.col("embedding"), F.col("_qv"))
                / (F.sqrt(_dot(F.col("embedding"), F.col("embedding")))
                   * F.sqrt(_dot(F.col("_qv"), F.col("_qv")))),
                6,
            ).alias("cos_sim"),
        )
    )
    return scored.orderBy(F.col("cos_sim").desc(), "vec_id").limit(TOP_K)


@register(
    "similarity_pandas_cosine",
    "similarity",
    oracle=None,  # numpy BLAS accumulation order differs — rows-only +
    # recall asserted against the exact baseline in tests
    doc="Arrow-vectorized cosine scoring via mapInPandas + numpy — the "
    "shape for Python-side model scoring at scale (one matrix op per "
    "Arrow batch, no per-row Python).",
)
def similarity_pandas_cosine(spark, sf_dir):
    import numpy as np
    import pandas as pd

    e = t(spark, sf_dir, "embeddings")
    qv = (
        e.filter(F.col("vec_id") == QUERY_VEC_ID)
        .select("embedding")
        .collect()[0]["embedding"]
    )
    q = np.asarray(qv, dtype=np.float64)
    qn = np.sqrt((q * q).sum())

    def score(batches):
        for pdf in batches:
            m = np.vstack([np.asarray(v, dtype=np.float64) for v in pdf["embedding"]])
            dots = m @ q
            norms = np.sqrt((m * m).sum(axis=1))
            yield pd.DataFrame(
                {"vec_id": pdf["vec_id"], "cos_sim": np.round(dots / (norms * qn), 6)}
            )

    scored = e.filter(F.col("vec_id") != QUERY_VEC_ID).mapInPandas(
        score, schema="vec_id long, cos_sim double"
    )
    return scored.orderBy(F.col("cos_sim").desc(), "vec_id").limit(TOP_K)


@register(
    "similarity_ivf_kmeans",
    "similarity",
    oracle=None,  # k-means training is not SQL-expressible — rows-only +
    # recall asserted vs the exact baseline in tests
    doc="IVF-style ANN: MLlib KMeans (fixed seed) as the coarse "
    "quantizer; score exact cosine only inside the query's cell (plus "
    "its own). At 100 TB the centroid table broadcasts and cell "
    "assignment is a map-only pass — the classic inverted-file layout.",
)
def similarity_ivf_kmeans(spark, sf_dir):
    try:
        from pyspark.ml.clustering import KMeans
        from pyspark.ml.functions import array_to_vector
    except ImportError:  # pragma: no cover
        return t(spark, sf_dir, "embeddings").select("vec_id").limit(0)

    e = t(spark, sf_dir, "embeddings")
    vecs = e.select("vec_id", "embedding", array_to_vector("embedding").alias("features"))
    km = KMeans(k=8, seed=42, maxIter=10, featuresCol="features", predictionCol="cell")
    model = km.fit(vecs)
    assigned = model.transform(vecs).select("vec_id", "embedding", "cell")
    qcell = (
        assigned.filter(F.col("vec_id") == QUERY_VEC_ID)
        .select(F.col("cell").alias("qcell"))
    )
    query = e.filter(F.col("vec_id") == QUERY_VEC_ID).select(F.col("embedding").alias("_qv"))
    cand = (
        assigned.crossJoin(F.broadcast(qcell))
        .filter((F.col("cell") == F.col("qcell")) & (F.col("vec_id") != QUERY_VEC_ID))
        .select("vec_id", "embedding")
    )
    scored = cand.crossJoin(F.broadcast(query)).select(
        "vec_id", _cos("embedding", "_qv").alias("cos_sim")
    )
    return scored.orderBy(F.col("cos_sim").desc(), "vec_id").limit(TOP_K)


@register(
    "embedding_neardup_blocked",
    "similarity",
    doc="Embedding-cosine near-dup pairs, label-blocked (coarse IVF "
    "partition): same-label self-join only — at 100 TB the blocking key "
    "caps the pair space; cos ≥ 0.2 via rounded values.",
    oracle="""
WITH pairs AS (
    SELECT a.vec_id AS v1, b.vec_id AS v2, a.label,
           a.embedding AS ea, b.embedding AS eb
    FROM embeddings a JOIN embeddings b
      ON a.label = b.label AND a.vec_id < b.vec_id
),
scored AS (
    SELECT v1, v2, label,
           ROUND(SUM(CAST(ea[i] AS DOUBLE) * CAST(eb[i] AS DOUBLE))
                 / (SQRT(SUM(CAST(ea[i] AS DOUBLE) * CAST(ea[i] AS DOUBLE)))
                    * SQRT(SUM(CAST(eb[i] AS DOUBLE) * CAST(eb[i] AS DOUBLE)))), 6)
               AS cos_sim
    FROM pairs, LATERAL (SELECT UNNEST(GENERATE_SERIES(1, LEN(ea))) AS i)
    GROUP BY v1, v2, label
)
SELECT v1, v2, CAST(label AS BIGINT) AS label, cos_sim
FROM scored WHERE cos_sim >= 0.2
ORDER BY v1, v2
""",
    bench=False,  # O(pairs·dim) — correctness-tier only; the scale path is similarity_ann_lsh
)
def embedding_neardup_blocked(spark, sf_dir):
    e = t(spark, sf_dir, "embeddings")
    a = e.select(
        F.col("vec_id").alias("v1"), F.col("label"), F.col("embedding").alias("ea")
    )
    b = e.select(
        F.col("vec_id").alias("v2"), F.col("label").alias("lb"), F.col("embedding").alias("eb")
    )
    pairs = a.join(b, (F.col("label") == F.col("lb")) & (F.col("v1") < F.col("v2")))
    return (
        pairs.select(
            "v1", "v2", F.col("label").cast("long").alias("label"), _cos("ea", "eb").alias("cos_sim")
        )
        .filter(F.col("cos_sim") >= 0.2)
        .orderBy("v1", "v2")
    )


Q_SCALE = 200  # |x| < 0.6 in the fixture embeddings → |q| < 120 fits int8


@register(
    "similarity_quantized_topk",
    "similarity",
    doc="int8-quantized dot-product top-10 (scalar quantization, the "
    "memory-bound scale path: 4× smaller vectors, integer SIMD math). "
    "q = floor(x * 200) is exact and identical in both engines "
    "(float32→double widening is lossless, floor is unambiguous), so "
    "the integer dot products hash-check exactly — no float tolerance.",
    oracle=f"""
WITH q AS (SELECT embedding AS qv FROM embeddings WHERE vec_id = {QUERY_VEC_ID})
SELECT e.vec_id,
       CAST(SUM(FLOOR(CAST(e.embedding[i] AS DOUBLE) * {Q_SCALE})
                * FLOOR(CAST(q.qv[i] AS DOUBLE) * {Q_SCALE})) AS BIGINT) AS qdot
FROM embeddings e, q,
     LATERAL (SELECT UNNEST(GENERATE_SERIES(1, LEN(e.embedding))) AS i)
WHERE e.vec_id <> {QUERY_VEC_ID}
GROUP BY e.vec_id
ORDER BY qdot DESC, vec_id LIMIT {TOP_K}
""",
)
def similarity_quantized_topk(spark, sf_dir):
    e = t(spark, sf_dir, "embeddings")

    def _quant(col):
        return F.transform(col, lambda x: F.floor(x.cast("double") * Q_SCALE))

    query = e.filter(F.col("vec_id") == QUERY_VEC_ID).select(
        _quant(F.col("embedding")).alias("_qq")
    )
    scored = (
        e.filter(F.col("vec_id") != QUERY_VEC_ID)
        .crossJoin(F.broadcast(query))
        .select(
            "vec_id",
            F.aggregate(
                F.zip_with(_quant(F.col("embedding")), F.col("_qq"), lambda x, y: x * y),
                F.lit(0).cast("long"),
                lambda acc, x: acc + x,
            ).alias("qdot"),
        )
    )
    return scored.orderBy(F.col("qdot").desc(), "vec_id").limit(TOP_K)


N_KNN_QUERIES = 5  # vec_id 0..4 act as the query batch
KNN_K = 3


@register(
    "similarity_knn_join",
    "similarity",
    doc="Batch kNN join: top-3 cosine neighbors for EACH of a 5-vector "
    "query batch (vec_id 0-4) in one pass — the retrieval/seed-dedup "
    "shape. The query batch broadcasts (it is always the small side); "
    "the base table streams through scoring map-only, then a per-query "
    "window takes k. At 100 TB the same plan holds: broadcast the query "
    "batch, partition-local TopK per query via the rank window over "
    "(qid), no base-table shuffle until the k·|queries| survivors.",
    oracle=f"""
WITH q AS (SELECT vec_id AS qid, embedding AS qv FROM embeddings
           WHERE vec_id < {N_KNN_QUERIES}),
sims AS (
    SELECT q.qid, e.vec_id,
           ROUND(SUM(CAST(e.embedding[i] AS DOUBLE) * CAST(q.qv[i] AS DOUBLE))
                 / (SQRT(SUM(CAST(e.embedding[i] AS DOUBLE) * CAST(e.embedding[i] AS DOUBLE)))
                    * SQRT(SUM(CAST(q.qv[i] AS DOUBLE) * CAST(q.qv[i] AS DOUBLE)))), 6)
               AS cos_sim
    FROM embeddings e CROSS JOIN q,
         LATERAL (SELECT UNNEST(GENERATE_SERIES(1, LEN(e.embedding))) AS i)
    WHERE e.vec_id <> q.qid
    GROUP BY q.qid, e.vec_id
),
ranked AS (
    SELECT qid, vec_id, cos_sim,
           ROW_NUMBER() OVER (PARTITION BY qid ORDER BY cos_sim DESC, vec_id) AS rnk
    FROM sims
)
SELECT qid, vec_id, cos_sim, CAST(rnk AS BIGINT) AS rnk
FROM ranked WHERE rnk <= {KNN_K}
ORDER BY qid, rnk
""",
)
def similarity_knn_join(spark, sf_dir):
    from pyspark.sql import Window

    e = t(spark, sf_dir, "embeddings")
    q = e.filter(F.col("vec_id") < N_KNN_QUERIES).select(
        F.col("vec_id").alias("qid"), F.col("embedding").alias("_qv")
    )
    scored = (
        e.crossJoin(F.broadcast(q))
        .filter(F.col("vec_id") != F.col("qid"))
        .select("qid", "vec_id", _cos("embedding", "_qv").alias("cos_sim"))
    )
    win = Window.partitionBy("qid").orderBy(F.col("cos_sim").desc(), "vec_id")
    return (
        scored.withColumn("rnk", F.row_number().over(win).cast("long"))
        .filter(F.col("rnk") <= KNN_K)
        .orderBy("qid", "rnk")
    )


HN_ANCHORS = 8  # vec_id 0..7 act as the anchor mini-batch


@register(
    "similarity_hard_negative_mining",
    "similarity",
    doc="Contrastive-training hard-negative mining: for each anchor in "
    f"an {HN_ANCHORS}-vector mini-batch, the single most-similar vector "
    "with a DIFFERENT label (the hardest negative). Similarity is the "
    "int8-quantized dot product (exact integers — hash-checkable, no "
    "float tolerance). The anchor batch broadcasts; the base table "
    "streams through scoring map-only; a per-anchor rank window keeps "
    "k=1. At 100 TB the same plan holds per training batch — or the "
    "LSH/IVF candidate structures bound the scored set first.",
    oracle=f"""
WITH anchors AS (
    SELECT vec_id AS anchor_id, label AS anchor_label, embedding AS av
    FROM embeddings WHERE vec_id < {HN_ANCHORS}
),
scored AS (
    SELECT a.anchor_id, a.anchor_label, e.vec_id AS neg_id, e.label AS neg_label,
           CAST(SUM(FLOOR(CAST(e.embedding[i] AS DOUBLE) * {Q_SCALE})
                    * FLOOR(CAST(a.av[i] AS DOUBLE) * {Q_SCALE})) AS BIGINT) AS qdot
    FROM embeddings e CROSS JOIN anchors a,
         LATERAL (SELECT UNNEST(GENERATE_SERIES(1, LEN(e.embedding))) AS i)
    WHERE e.label <> a.anchor_label
    GROUP BY a.anchor_id, a.anchor_label, e.vec_id, e.label
),
ranked AS (
    SELECT *, ROW_NUMBER() OVER (PARTITION BY anchor_id
                                 ORDER BY qdot DESC, neg_id) AS rnk
    FROM scored
)
SELECT anchor_id, CAST(anchor_label AS BIGINT) AS anchor_label,
       neg_id, CAST(neg_label AS BIGINT) AS neg_label, qdot
FROM ranked WHERE rnk = 1 ORDER BY anchor_id
""",
)
def similarity_hard_negative_mining(spark, sf_dir):
    from pyspark.sql import Window

    e = t(spark, sf_dir, "embeddings")

    def _quant(col):
        return F.transform(col, lambda x: F.floor(x.cast("double") * Q_SCALE))

    anchors = e.filter(F.col("vec_id") < HN_ANCHORS).select(
        F.col("vec_id").alias("anchor_id"),
        F.col("label").alias("anchor_label"),
        _quant(F.col("embedding")).alias("_av"),
    )
    scored = (
        e.crossJoin(F.broadcast(anchors))
        .filter(F.col("label") != F.col("anchor_label"))
        .select(
            "anchor_id",
            "anchor_label",
            F.col("vec_id").alias("neg_id"),
            F.col("label").alias("neg_label"),
            F.aggregate(
                F.zip_with(_quant(F.col("embedding")), F.col("_av"), lambda x, y: x * y),
                F.lit(0).cast("long"),
                lambda acc, x: acc + x,
            ).alias("qdot"),
        )
    )
    w = Window.partitionBy("anchor_id").orderBy(F.col("qdot").desc(), "neg_id")
    return (
        scored.withColumn("rnk", F.row_number().over(w))
        .filter(F.col("rnk") == 1)
        .select(
            "anchor_id",
            F.col("anchor_label").cast("long").alias("anchor_label"),
            "neg_id",
            F.col("neg_label").cast("long").alias("neg_label"),
            "qdot",
        )
        .orderBy("anchor_id")
    )


SEMDEDUP_T_NUM, SEMDEDUP_T_DEN = 2, 5  # cosine threshold 0.4 as a rational


@register(
    "similarity_semantic_dedup",
    "similarity",
    doc="SemDeDup-style semantic dedup: label-blocked embedding pairs "
    "whose QUANTIZED cosine exceeds 0.4 become edges, components become "
    "semantic-duplicate clusters (keep the min-id representative). The "
    "threshold test is exact integer arithmetic — with q = floor(x*200) "
    f"int8 values, cos >= {SEMDEDUP_T_NUM}/{SEMDEDUP_T_DEN} iff qdot>0 "
    f"and {SEMDEDUP_T_DEN * SEMDEDUP_T_DEN}*qdot² >= "
    f"{SEMDEDUP_T_NUM * SEMDEDUP_T_NUM}*|qa|²*|qb|² — no float "
    "tolerance anywhere, so clusters hash-check against the recursive-"
    "closure oracle. Label blocking caps the pair space (the coarse "
    "IVF cell); the transitive closure follows the dedup_connected_"
    "components discipline (local union-find under the edge gate, "
    "min-label propagation above).",
    oracle=f"""
WITH RECURSIVE q AS (
    SELECT vec_id, label,
           ARRAY(SELECT FLOOR(CAST(x AS DOUBLE) * {Q_SCALE})
                 FROM UNNEST(embedding) AS t(x)) AS qv
    FROM embeddings
),
p AS MATERIALIZED (
    SELECT a.vec_id AS v1, b.vec_id AS v2,
           (SELECT CAST(SUM(a.qv[i] * b.qv[i]) AS BIGINT)
            FROM UNNEST(GENERATE_SERIES(1, LEN(a.qv))) AS s(i)) AS qd,
           (SELECT CAST(SUM(a.qv[i] * a.qv[i]) AS BIGINT)
            FROM UNNEST(GENERATE_SERIES(1, LEN(a.qv))) AS s(i)) AS na,
           (SELECT CAST(SUM(b.qv[i] * b.qv[i]) AS BIGINT)
            FROM UNNEST(GENERATE_SERIES(1, LEN(b.qv))) AS s(i)) AS nb
    FROM q a JOIN q b ON a.label = b.label AND a.vec_id < b.vec_id
),
pairs AS MATERIALIZED (
    SELECT v1, v2 FROM p
    WHERE qd > 0
      AND {SEMDEDUP_T_DEN * SEMDEDUP_T_DEN} * qd * qd
          >= {SEMDEDUP_T_NUM * SEMDEDUP_T_NUM} * na * nb
),
edges AS (SELECT v1 AS a, v2 AS b FROM pairs
          UNION ALL SELECT v2 AS a, v1 AS b FROM pairs),
reach(src, dst) AS (
    SELECT a, b FROM edges
    UNION
    SELECT r.src, e.b FROM reach r JOIN edges e ON r.dst = e.a
),
comp AS (
    SELECT src AS node, LEAST(src, MIN(dst)) AS comp
    FROM reach GROUP BY src
)
SELECT CAST(comp AS BIGINT) AS cluster_id,
       CAST(COUNT(*) AS BIGINT) AS n_vecs,
       CAST(MAX(node) AS BIGINT) AS max_vec
FROM comp GROUP BY comp ORDER BY cluster_id
""",
    bench=False,  # O(in-label pairs · dim) like embedding_neardup_blocked;
    # the 100 TB path swaps the label block for LSH buckets
)
def similarity_semantic_dedup(spark, sf_dir):
    from cascade_spark.operators.dedup import (
        LOCAL_CC_MAX_EDGES,
        _cc_labels_distributed,
        _cc_local,
    )

    e = t(spark, sf_dir, "embeddings")

    def _quant(col):
        return F.transform(col, lambda x: F.floor(x.cast("double") * Q_SCALE))

    def _dot(x, y):
        return F.aggregate(
            F.zip_with(x, y, lambda a, b: a * b),
            F.lit(0).cast("long"),
            lambda acc, v: acc + v,
        )

    q = e.select("vec_id", "label", _quant(F.col("embedding")).alias("qv"))
    a = q.select(F.col("vec_id").alias("v1"), "label", F.col("qv").alias("qa"))
    b = q.select(
        F.col("vec_id").alias("v2"), F.col("label").alias("lb"), F.col("qv").alias("qb")
    )
    p = a.join(b, (F.col("label") == F.col("lb")) & (F.col("v1") < F.col("v2"))).select(
        "v1",
        "v2",
        _dot(F.col("qa"), F.col("qb")).alias("qd"),
        _dot(F.col("qa"), F.col("qa")).alias("na"),
        _dot(F.col("qb"), F.col("qb")).alias("nb"),
    )
    t2 = SEMDEDUP_T_DEN * SEMDEDUP_T_DEN
    n2 = SEMDEDUP_T_NUM * SEMDEDUP_T_NUM
    pairs = p.filter(
        (F.col("qd") > 0)
        & (F.lit(t2) * F.col("qd") * F.col("qd") >= F.lit(n2) * F.col("na") * F.col("nb"))
    ).select("v1", "v2")
    if pairs.count() <= LOCAL_CC_MAX_EDGES:
        rows = [(r[0], r[1]) for r in pairs.collect()]
        labels = spark.createDataFrame(_cc_local(rows), "node long, comp long")
    else:
        from pyspark import StorageLevel

        fwd = pairs.select(F.col("v1").alias("src"), F.col("v2").alias("nbr"))
        rev = pairs.select(F.col("v2").alias("src"), F.col("v1").alias("nbr"))
        edges = fwd.union(rev).persist(StorageLevel.MEMORY_AND_DISK)
        init = (
            edges.select("src").distinct().select(F.col("src").alias("node"))
            .withColumn("comp", F.col("node"))
            .persist(StorageLevel.MEMORY_AND_DISK)
        )
        labels = _cc_labels_distributed(edges, init)
    return (
        labels.groupBy(F.col("comp").cast("long").alias("cluster_id"))
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_vecs"),
            F.max("node").cast("long").alias("max_vec"),
        )
        .orderBy("cluster_id")
    )


@register(
    "similarity_mips_norm_bound",
    "similarity",
    doc="Maximum-inner-product search with a Cauchy-Schwarz norm-bound "
    "pruning audit: dot(q,x) <= sqrt(|q|^2 * |x|^2), and both squared "
    "norms are EXACT integers over the int8-quantized components, so "
    "bound = isqrt(qn2 * xn2) is exact too. The query returns the true "
    "top-10 by quantized dot product, each row carrying its bound and "
    "the corpus-wide prunable count: vectors whose bound falls below "
    "the exact 10th-best dot can be skipped WITHOUT computing their "
    "dot product — at 100 TB the per-vector norm is a precomputed "
    "index column and this bound is the map-side admission filter "
    "(the norm-bound family behind ip-bounded MIPS indexes: one "
    "cheap multiply per vector vs a 64-wide dot). Norms are one "
    "map-only pass; the threshold is a 1-row broadcast.",
    oracle=f"""
WITH qv AS (
    SELECT embedding AS q FROM embeddings WHERE vec_id = {QUERY_VEC_ID}
),
quant AS (
    SELECT e.vec_id,
           CAST(SUM(FLOOR(CAST(e.embedding[i] AS DOUBLE) * {Q_SCALE})
                    * FLOOR(CAST(qv.q[i] AS DOUBLE) * {Q_SCALE}))
                AS BIGINT) AS qdot,
           CAST(SUM(FLOOR(CAST(e.embedding[i] AS DOUBLE) * {Q_SCALE})
                    * FLOOR(CAST(e.embedding[i] AS DOUBLE) * {Q_SCALE}))
                AS BIGINT) AS xn2,
           CAST(SUM(FLOOR(CAST(qv.q[i] AS DOUBLE) * {Q_SCALE})
                    * FLOOR(CAST(qv.q[i] AS DOUBLE) * {Q_SCALE}))
                AS BIGINT) AS qn2
    FROM embeddings e, qv,
         LATERAL (SELECT UNNEST(GENERATE_SERIES(1, LEN(e.embedding))) AS i)
    WHERE e.vec_id <> {QUERY_VEC_ID}
    GROUP BY e.vec_id
),
bounded AS (
    SELECT vec_id, qdot, (CASE WHEN (CAST(FLOOR(SQRT(CAST(xn2 * qn2 AS DOUBLE))) AS BIGINT) + 1) * (CAST(FLOOR(SQRT(CAST(xn2 * qn2 AS DOUBLE))) AS BIGINT) + 1) <= xn2 * qn2 THEN CAST(FLOOR(SQRT(CAST(xn2 * qn2 AS DOUBLE))) AS BIGINT) + 1 WHEN CAST(FLOOR(SQRT(CAST(xn2 * qn2 AS DOUBLE))) AS BIGINT) * CAST(FLOOR(SQRT(CAST(xn2 * qn2 AS DOUBLE))) AS BIGINT) > xn2 * qn2 THEN CAST(FLOOR(SQRT(CAST(xn2 * qn2 AS DOUBLE))) AS BIGINT) - 1 ELSE CAST(FLOOR(SQRT(CAST(xn2 * qn2 AS DOUBLE))) AS BIGINT) END) AS bound
    FROM quant
),
thresh AS (
    SELECT MIN(qdot) AS t10 FROM (
        SELECT qdot FROM bounded ORDER BY qdot DESC, vec_id LIMIT {TOP_K})
),
pr AS (
    SELECT CAST(COUNT(*) AS BIGINT) AS n_prunable
    FROM bounded, thresh WHERE bounded.bound < thresh.t10
)
SELECT b.vec_id, b.qdot, b.bound, pr.n_prunable
FROM bounded b, pr
ORDER BY b.qdot DESC, b.vec_id LIMIT {TOP_K}
""",
)
def similarity_mips_norm_bound(spark, sf_dir):
    from cascade_spark.operators.analytics_extra import _isqrt

    e = t(spark, sf_dir, "embeddings")

    def _quant(col):
        return F.transform(col, lambda x: F.floor(x.cast("double") * Q_SCALE))

    def _idot(a, b):
        return F.aggregate(
            F.zip_with(a, b, lambda x, y: x * y),
            F.lit(0).cast("long"),
            lambda acc, x: acc + x,
        )

    query = e.filter(F.col("vec_id") == QUERY_VEC_ID).select(
        _quant(F.col("embedding")).alias("_qq")
    )
    scored = (
        e.filter(F.col("vec_id") != QUERY_VEC_ID)
        .crossJoin(F.broadcast(query))
        .select(
            "vec_id",
            _idot(_quant(F.col("embedding")), F.col("_qq")).alias("qdot"),
            _idot(_quant(F.col("embedding")), _quant(F.col("embedding"))).alias(
                "xn2"
            ),
            _idot(F.col("_qq"), F.col("_qq")).alias("qn2"),
        )
    )
    bounded = scored.select(
        "vec_id", "qdot", _isqrt(F.col("xn2") * F.col("qn2")).alias("bound")
    )
    thresh = (
        bounded.orderBy(F.col("qdot").desc(), "vec_id")
        .limit(TOP_K)
        .agg(F.min("qdot").alias("t10"))
    )
    pr = (
        bounded.crossJoin(F.broadcast(thresh))
        .filter(F.col("bound") < F.col("t10"))
        .agg(F.count(F.lit(1)).cast("long").alias("n_prunable"))
    )
    return (
        bounded.crossJoin(F.broadcast(pr))
        .orderBy(F.col("qdot").desc(), "vec_id")
        .limit(TOP_K)
        .select("vec_id", "qdot", "bound", "n_prunable")
    )


RANGE_T_BP = 2500  # cosine radius: keep neighbors with cos >= 0.25


@register(
    "similarity_range_query",
    "similarity",
    doc="Radius (range) search — the dual of top-k: ALL vectors within "
    "a declared cosine radius of the query vector, not a fixed count. "
    f"Semantics are integer-exact: keep x iff qdot(x)*10000 >= "
    f"{RANGE_T_BP} * isqrt(qn2*xn2) over the int8-quantized "
    "components (floor-isqrt norms, same rule both engines — no IEEE "
    "boundary can flip membership). Returned cos_bp is the truncated "
    "basis-point cosine on the same integer arithmetic. Map-only: one "
    "broadcast query row, one linear scan, no shuffle until the tiny "
    "result sort — at 100 TB this is a pushed-down scan + filter, and "
    "the per-vector norm is a precomputed index column "
    "(similarity_mips_norm_bound's admission-filter machinery).",
    oracle=f"""
WITH qv AS (
    SELECT embedding AS q FROM embeddings WHERE vec_id = {QUERY_VEC_ID}
),
quant AS (
    SELECT e.vec_id,
           CAST(SUM(FLOOR(CAST(e.embedding[i] AS DOUBLE) * {Q_SCALE})
                    * FLOOR(CAST(qv.q[i] AS DOUBLE) * {Q_SCALE}))
                AS BIGINT) AS qdot,
           CAST(SUM(FLOOR(CAST(e.embedding[i] AS DOUBLE) * {Q_SCALE})
                    * FLOOR(CAST(e.embedding[i] AS DOUBLE) * {Q_SCALE}))
                AS BIGINT) AS xn2,
           CAST(SUM(FLOOR(CAST(qv.q[i] AS DOUBLE) * {Q_SCALE})
                    * FLOOR(CAST(qv.q[i] AS DOUBLE) * {Q_SCALE}))
                AS BIGINT) AS qn2
    FROM embeddings e, qv,
         LATERAL (SELECT UNNEST(GENERATE_SERIES(1, LEN(e.embedding))) AS i)
    WHERE e.vec_id <> {QUERY_VEC_ID}
    GROUP BY e.vec_id
),
normed AS (
    SELECT vec_id, qdot,
           (CASE WHEN (CAST(FLOOR(SQRT(CAST(xn2 * qn2 AS DOUBLE))) AS BIGINT) + 1)
                      * (CAST(FLOOR(SQRT(CAST(xn2 * qn2 AS DOUBLE))) AS BIGINT) + 1)
                      <= xn2 * qn2
                 THEN CAST(FLOOR(SQRT(CAST(xn2 * qn2 AS DOUBLE))) AS BIGINT) + 1
                 WHEN CAST(FLOOR(SQRT(CAST(xn2 * qn2 AS DOUBLE))) AS BIGINT)
                      * CAST(FLOOR(SQRT(CAST(xn2 * qn2 AS DOUBLE))) AS BIGINT)
                      > xn2 * qn2
                 THEN CAST(FLOOR(SQRT(CAST(xn2 * qn2 AS DOUBLE))) AS BIGINT) - 1
                 ELSE CAST(FLOOR(SQRT(CAST(xn2 * qn2 AS DOUBLE))) AS BIGINT)
            END) AS nrm
    FROM quant
)
SELECT vec_id,
       qdot,
       CAST(qdot * 10000 // nrm AS BIGINT) AS cos_bp
FROM normed
WHERE qdot > 0 AND qdot * 10000 >= {RANGE_T_BP} * nrm
ORDER BY cos_bp DESC, vec_id
""",
)
def similarity_range_query(spark, sf_dir):
    from cascade_spark.operators.analytics_extra import _isqrt

    e = t(spark, sf_dir, "embeddings")

    def _quant(col):
        return F.transform(col, lambda x: F.floor(x.cast("double") * Q_SCALE))

    def _idot(a, b):
        return F.aggregate(
            F.zip_with(a, b, lambda x, y: x * y),
            F.lit(0).cast("long"),
            lambda acc, x: acc + x,
        )

    query = e.filter(F.col("vec_id") == QUERY_VEC_ID).select(
        _quant(F.col("embedding")).alias("_qq")
    )
    scored = (
        e.filter(F.col("vec_id") != QUERY_VEC_ID)
        .crossJoin(F.broadcast(query))
        .select(
            "vec_id",
            _idot(_quant(F.col("embedding")), F.col("_qq")).alias("qdot"),
            _idot(
                _quant(F.col("embedding")), _quant(F.col("embedding"))
            ).alias("xn2"),
            _idot(F.col("_qq"), F.col("_qq")).alias("qn2"),
        )
    )
    normed = scored.select(
        "vec_id", "qdot", _isqrt(F.col("xn2") * F.col("qn2")).alias("nrm")
    )
    return (
        normed.filter(
            (F.col("qdot") > 0)
            & (F.col("qdot") * 10000 >= RANGE_T_BP * F.col("nrm"))
        )
        .select(
            "vec_id",
            "qdot",
            F.expr("qdot * 10000 DIV nrm").cast("long").alias("cos_bp"),
        )
        .orderBy(F.col("cos_bp").desc(), "vec_id")
    )


_PROBE_MASKS = (0, 1, 2, 4, 8, 16, 32)  # Hamming <= 1 over the 6-bit code


@register(
    "similarity_lsh_multiprobe",
    "similarity",
    doc="Multi-probe LSH (Lv et al. 2007): instead of more hash "
    "tables, probe the query bucket AND its 6 Hamming-distance-1 "
    "neighbors (code XOR in {0,1,2,4,8,16,32}) — near-misses where "
    "one hyperplane sign flipped land in adjacent buckets, so "
    "probing them recovers most of the recall a second table would "
    "buy at 1/7th the index memory. Exact cosine is scored only over "
    "the probed candidates; each hit carries its probe distance and "
    "the candidate-count contrast (multi vs single bucket) is a "
    "column, making the recall/IO trade observable. Same md5-derived "
    "planes as similarity_ann_lsh -> fully oracle-checked.",
    oracle=f"""
WITH signs AS ({_SQL_SIGNS}),
proj AS (
    SELECT e.vec_id, s.p,
           SUM(CAST(e.embedding[s.i] AS DOUBLE) * s.s) AS dot
    FROM embeddings e JOIN signs s ON TRUE
    GROUP BY e.vec_id, s.p
),
codes AS (
    SELECT vec_id,
           SUM(CASE WHEN dot > 0 THEN CAST(1 AS BIGINT) << p ELSE 0 END) AS bucket
    FROM proj GROUP BY vec_id
),
qb AS (SELECT bucket FROM codes WHERE vec_id = {QUERY_VEC_ID}),
q AS (SELECT embedding AS qv FROM embeddings WHERE vec_id = {QUERY_VEC_ID}),
cand AS (
    SELECT c.vec_id,
           CASE WHEN xor(c.bucket, qb.bucket) = 0 THEN 0 ELSE 1 END AS probe_dist
    FROM codes c, qb
    WHERE xor(c.bucket, qb.bucket) IN (0, 1, 2, 4, 8, 16, 32)
      AND c.vec_id <> {QUERY_VEC_ID}
),
nc AS (
    SELECT CAST(COUNT(*) AS BIGINT) AS n_cand_multi,
           CAST(COUNT(*) FILTER (WHERE probe_dist = 0) AS BIGINT) AS n_cand_single
    FROM cand
),
sims AS (
    SELECT e.vec_id, c.probe_dist,
           ROUND(SUM(CAST(e.embedding[i] AS DOUBLE) * CAST(q.qv[i] AS DOUBLE))
                 / (SQRT(SUM(CAST(e.embedding[i] AS DOUBLE) * CAST(e.embedding[i] AS DOUBLE)))
                    * SQRT(SUM(CAST(q.qv[i] AS DOUBLE) * CAST(q.qv[i] AS DOUBLE)))), 6)
               AS cos_sim
    FROM embeddings e JOIN cand c USING (vec_id), q,
         LATERAL (SELECT UNNEST(GENERATE_SERIES(1, LEN(e.embedding))) AS i)
    GROUP BY e.vec_id, c.probe_dist
)
SELECT s.vec_id, s.cos_sim, CAST(s.probe_dist AS BIGINT) AS probe_dist,
       nc.n_cand_multi, nc.n_cand_single
FROM sims s, nc
ORDER BY s.cos_sim DESC, s.vec_id LIMIT {TOP_K}
""",
)
def similarity_lsh_multiprobe(spark, sf_dir):
    e = t(spark, sf_dir, "embeddings")
    signs = _plane_signs(spark)
    elems = e.select("vec_id", F.posexplode("embedding").alias("pos", "x")).withColumn(
        "i", F.col("pos") + 1
    )
    proj = (
        elems.join(F.broadcast(signs), "i")
        .groupBy("vec_id", "p")
        .agg(F.sum(F.col("x").cast("double") * F.col("s")).alias("dot"))
    )
    codes = proj.groupBy("vec_id").agg(
        F.sum(
            F.when(F.col("dot") > 0, F.expr("shiftleft(CAST(1 AS BIGINT), p)")).otherwise(0)
        ).alias("bucket")
    )
    qb = codes.filter(F.col("vec_id") == QUERY_VEC_ID).select(
        F.col("bucket").alias("qbucket")
    )
    xor = F.expr("bucket ^ qbucket")
    cand = (
        codes.crossJoin(F.broadcast(qb))
        .filter(xor.isin(*_PROBE_MASKS) & (F.col("vec_id") != QUERY_VEC_ID))
        .select(
            "vec_id", F.when(xor == 0, 0).otherwise(1).alias("probe_dist")
        )
    )
    nc = cand.agg(
        F.count(F.lit(1)).cast("long").alias("n_cand_multi"),
        F.count_if(F.col("probe_dist") == 0).cast("long").alias("n_cand_single"),
    )
    query = e.filter(F.col("vec_id") == QUERY_VEC_ID).select(
        F.col("embedding").alias("_qv")
    )
    scored = (
        e.join(cand, "vec_id")
        .crossJoin(F.broadcast(query))
        .select(
            "vec_id",
            F.round(
                _dot(F.col("embedding"), F.col("_qv"))
                / (
                    F.sqrt(_dot(F.col("embedding"), F.col("embedding")))
                    * F.sqrt(_dot(F.col("_qv"), F.col("_qv")))
                ),
                6,
            ).alias("cos_sim"),
            F.col("probe_dist").cast("long").alias("probe_dist"),
        )
    )
    return (
        scored.crossJoin(F.broadcast(nc))
        .orderBy(F.col("cos_sim").desc(), "vec_id")
        .limit(TOP_K)
        .select("vec_id", "cos_sim", "probe_dist", "n_cand_multi", "n_cand_single")
    )
