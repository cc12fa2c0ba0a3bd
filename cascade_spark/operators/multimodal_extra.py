"""Round-8 wave-15 multimodal — geometric image transforms on the REAL
PPM decode path (rotate / mirror), extending the decode / resize /
crop-tile / equalize family with the layout-changing ops an image
training pipeline runs at ingest (orientation normalization,
augmentation mirroring):

- ``multimodal_image_rotate``: decode each synthetic P6 blob with the
  real byte parser, rotate 90 degrees clockwise and mirror
  horizontally with actual numpy index transforms, and prove BOTH
  layouts to the oracle via position-weighted checksums
  (sum_i i * p'(i) over the transformed row-major buffer) — a plain
  pixel SUM is rotation-invariant, so the weighted form is what
  actually pins the index math. The oracle replays the synthesis
  recurrence p(i) = (doc_id*31 + i) % 256 through the inverse index
  maps in pure SQL.

Reference scope: north-star multimodal surface (SURVEY §2B); the
reference engine itself is an event log (src/main.rs).

Scale (100 TB): map-only mapInPandas over the blob column — no
shuffle; the transform is per-row numpy work sized by the image, the
exact shape of a distributed re-orientation pass.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from cascade_spark.operators._util import t
from cascade_spark.plans.registry import register


def rotate90_cw_weighted(doc_id: int) -> tuple[int, int, int, int, int, int]:
    """Decode the synthetic PPM, rotate 90 CW and mirror-horizontal via
    numpy, return (w, h, out_w, out_h, rot_wsum, mir_wsum) where each
    wsum is sum_i i * buffer[i] over the transformed row-major RGB
    buffer — exact integers."""
    import numpy as np

    from cascade_spark.operators.multimodal import decode_ppm, synth_ppm

    blob = synth_ppm(doc_id)
    w, h, _mv, nb, _psum = decode_ppm(blob)
    px = np.frombuffer(blob[-nb:], dtype=np.uint8).reshape(h, w, 3)
    rot = np.rot90(px, k=-1)  # 90 degrees clockwise -> shape (w, h, 3)
    mir = px[:, ::-1, :]  # horizontal mirror -> shape (h, w, 3)
    idx_r = np.arange(rot.size, dtype=np.int64)
    idx_m = np.arange(mir.size, dtype=np.int64)
    rot_wsum = int((idx_r * rot.reshape(-1).astype(np.int64)).sum())
    mir_wsum = int((idx_m * mir.reshape(-1).astype(np.int64)).sum())
    return w, h, rot.shape[1], rot.shape[0], rot_wsum, mir_wsum


@register(
    "multimodal_image_rotate",
    "multimodal",
    doc="Rotate-90-CW + horizontal mirror on the real PPM decode path, "
    "each proven by a position-weighted checksum of the transformed "
    "row-major buffer (plain sums are rotation-invariant; the weighted "
    "sum pins the index math). Oracle replays the synthesis recurrence "
    "through the inverse index maps: rotated out index (y', x', c) "
    "reads source (x = y', y = H-1-x'); mirrored reads (x = W-1-x', "
    "y = y'). Map-only mapInPandas, no shuffle.",
    oracle="""
WITH dims AS (
    SELECT doc_id, 4 + doc_id % 13 AS w, 3 + doc_id % 7 AS h
    FROM documents
),
rot AS (
    SELECT d.doc_id,
           CAST(SUM(s.i * ((d.doc_id * 31
                + (3 * (((d.h - 1) - ((s.i // 3) % d.h)) * d.w
                        + (s.i // 3) // d.h) + s.i % 3)) % 256))
                AS BIGINT) AS rot_wsum
    FROM dims d,
         UNNEST(GENERATE_SERIES(0, 3 * d.w * d.h - 1)) AS s(i)
    GROUP BY d.doc_id
),
mir AS (
    SELECT d.doc_id,
           CAST(SUM(s.i * ((d.doc_id * 31
                + (3 * (((s.i // 3) // d.w) * d.w
                        + ((d.w - 1) - ((s.i // 3) % d.w))) + s.i % 3)) % 256))
                AS BIGINT) AS mir_wsum
    FROM dims d,
         UNNEST(GENERATE_SERIES(0, 3 * d.w * d.h - 1)) AS s(i)
    GROUP BY d.doc_id
)
SELECT dims.doc_id, CAST(dims.w AS BIGINT) AS width,
       CAST(dims.h AS BIGINT) AS height,
       CAST(dims.h AS BIGINT) AS out_width,
       CAST(dims.w AS BIGINT) AS out_height,
       rot.rot_wsum, mir.mir_wsum
FROM dims JOIN rot ON rot.doc_id = dims.doc_id
          JOIN mir ON mir.doc_id = dims.doc_id
ORDER BY dims.doc_id
""",
)
def multimodal_image_rotate(spark, sf_dir):
    import pandas as pd

    d = t(spark, sf_dir, "documents")
    ids = d.repartition(8).select("doc_id")

    def synth_rotate(batches):
        for pdf in batches:
            rows = []
            for doc_id in pdf["doc_id"]:
                w, h, ow, oh, rs, ms = rotate90_cw_weighted(int(doc_id))
                rows.append((int(doc_id), w, h, ow, oh, rs, ms))
            yield pd.DataFrame(
                rows,
                columns=[
                    "doc_id", "width", "height", "out_width", "out_height",
                    "rot_wsum", "mir_wsum",
                ],
            )

    schema = (
        "doc_id long, width long, height long, out_width long, "
        "out_height long, rot_wsum long, mir_wsum long"
    )
    return ids.mapInPandas(synth_rotate, schema=schema).orderBy("doc_id")
