"""Multimodal columns — binary payloads with typed metadata (north-star).

The fixtures carry no real media, so the *payload* is a synthesized
binary column (UTF-8 bytes of the text — an opaque blob as far as the
pipeline is concerned) while every piece of Spark-side plumbing is real:
BinaryType schema, Arrow batch transfer, ``mapInPandas`` batch iteration,
partition-friendly projections.

The decode step is a clearly-marked STUB (container has no image/audio
libs): ``decode_image_stub`` tries the real decoder import and falls
back to a deterministic fake whose outputs are pure functions of the
blob's md5 — which is exactly what lets the DuckDB oracle check the
whole path end-to-end.

At 100 TB: blobs ride in their own parquet column (column pruning keeps
metadata-only scans cheap); decode fan-out is a map-only mapInPandas
stage sized by ``spark.sql.files.maxPartitionBytes``, no shuffle.
"""

from __future__ import annotations

import hashlib

from pyspark.sql import functions as F

from cascade_spark.plans.registry import register
from cascade_spark.operators._util import t

_SCHEMA = "doc_id long, byte_len long, width long, height long, n_frames long, status string"


def decode_image_stub(blob: bytes) -> tuple[int, int, int, str]:
    """Stub decoder: (width, height, n_frames, status).

    Real implementation would be e.g. PIL.Image.open(io.BytesIO(blob));
    the container ships no media libraries, so we fall back to a
    deterministic fake derived from the blob's md5 (matching the SQL
    oracle). The fake keeps the contract: pure function blob → metadata.
    """
    try:
        import PIL.Image  # noqa: F401

        raise NotImplementedError("real image decode not wired in this container")
    except ImportError:
        h = hashlib.md5(blob).hexdigest()
        width = int(h[0:4], 16) % 1920
        height = int(h[4:8], 16) % 1080
        n_frames = int(h[8:10], 16) % 16 + 1
        return width, height, n_frames, "fake-decoded"


@register(
    "multimodal_decode",
    "multimodal",
    doc="Binary column → mapInPandas decode (stubbed, deterministic) → "
    "typed metadata. Oracle replicates the md5-derived fake in SQL, so "
    "the Arrow plumbing (schema, batching, UDF signature) is fully "
    "hash-checked.",
    oracle="""
SELECT doc_id,
       CAST(OCTET_LENGTH(ENCODE(text)) AS BIGINT) AS byte_len,
       ('0x' || SUBSTR(MD5(text), 1, 4))::BIGINT % 1920 AS width,
       ('0x' || SUBSTR(MD5(text), 5, 4))::BIGINT % 1080 AS height,
       ('0x' || SUBSTR(MD5(text), 9, 2))::BIGINT % 16 + 1 AS n_frames,
       'fake-decoded' AS status
FROM documents
ORDER BY doc_id
""",
)
def multimodal_decode(spark, sf_dir):
    import pandas as pd

    d = t(spark, sf_dir, "documents")
    # modest fan-out: enough cores for the Python decode without paying a
    # 32-way Arrow shuffle of the blobs (measured sweet spot locally)
    blobs = d.repartition(8).select("doc_id", F.col("text").cast("binary").alias("payload"))

    def decode_batches(batches):
        for pdf in batches:
            rows = []
            for doc_id, blob in zip(pdf["doc_id"], pdf["payload"]):
                blob = bytes(blob)
                w, h, nf, status = decode_image_stub(blob)
                rows.append((doc_id, len(blob), w, h, nf, status))
            yield pd.DataFrame(
                rows, columns=["doc_id", "byte_len", "width", "height", "n_frames", "status"]
            )

    return blobs.mapInPandas(decode_batches, schema=_SCHEMA).orderBy("doc_id")


@register(
    "multimodal_metadata",
    "multimodal",
    doc="Metadata-only pass over binary payloads — byte length + sha256 "
    "content address, pure JVM built-ins (the cheap scan that never "
    "touches a decoder; with blobs in their own parquet column this "
    "reads only the bytes it needs).",
    oracle="""
SELECT doc_id,
       CAST(OCTET_LENGTH(ENCODE(text)) AS BIGINT) AS byte_len,
       SHA256(text) AS content_id,
       lang, source
FROM documents
ORDER BY doc_id
""",
)
def multimodal_metadata(spark, sf_dir):
    d = t(spark, sf_dir, "documents")
    return d.select(
        "doc_id",
        F.length(F.col("text").cast("binary")).cast("long").alias("byte_len"),
        F.sha2(F.col("text").cast("binary"), 256).alias("content_id"),
        "lang",
        "source",
    ).orderBy("doc_id")


@register(
    "multimodal_frame_sample",
    "multimodal",
    doc="Frame sampling plan: decode metadata → explode a deterministic "
    "frame index per payload (every 4th frame) — the shape of a video "
    "frame-extraction pipeline with the decode stubbed.",
    oracle="""
WITH meta AS (
    SELECT doc_id,
           ('0x' || SUBSTR(MD5(text), 9, 2))::BIGINT % 16 + 1 AS n_frames
    FROM documents
)
SELECT doc_id, UNNEST(GENERATE_SERIES(0, n_frames - 1, 4)) AS frame_idx
FROM meta
ORDER BY doc_id, frame_idx
""",
)
def multimodal_frame_sample(spark, sf_dir):
    d = t(spark, sf_dir, "documents")
    n_frames = (
        F.conv(F.substring(F.md5("text"), 9, 2), 16, 10).cast("long") % 16 + 1
    )
    return (
        d.select("doc_id", n_frames.alias("nf"))
        .select(
            "doc_id",
            F.explode(F.sequence(F.lit(0).cast("long"), F.col("nf") - 1, F.lit(4).cast("long"))).alias(
                "frame_idx"
            ),
        )
        .orderBy("doc_id", "frame_idx")
    )


@register(
    "multimodal_binary_dedup",
    "multimodal",
    doc="Content-addressed dedup over the binary payload column, "
    "per source: blob count vs distinct sha256 fingerprints + byte "
    "totals — the storage-dedup audit a media lakehouse runs before "
    "re-encoding. Pure metadata aggregation: with blobs in their own "
    "parquet column this is one map-side-combinable groupBy that never "
    "leaves the JVM.",
    oracle="""
SELECT source,
       COUNT(*) AS n_blobs,
       COUNT(DISTINCT SHA256(text)) AS n_unique,
       CAST(SUM(OCTET_LENGTH(ENCODE(text))) AS BIGINT) AS total_bytes,
       CAST(MAX(OCTET_LENGTH(ENCODE(text))) AS BIGINT) AS max_bytes
FROM documents
GROUP BY source
ORDER BY source
""",
)
def multimodal_binary_dedup(spark, sf_dir):
    d = t(spark, sf_dir, "documents")
    payload = F.col("text").cast("binary")
    return (
        d.select(
            "source",
            F.sha2(payload, 256).alias("fp"),
            F.length(payload).cast("long").alias("nb"),
        )
        .groupBy("source")
        .agg(
            F.count(F.lit(1)).alias("n_blobs"),
            F.countDistinct("fp").alias("n_unique"),
            F.sum("nb").cast("long").alias("total_bytes"),
            F.max("nb").cast("long").alias("max_bytes"),
        )
        .orderBy("source")
    )
