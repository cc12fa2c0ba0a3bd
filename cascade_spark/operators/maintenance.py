"""Topic maintenance — compaction and schema evolution.

Streaming parquet appends produce many small files (every micro-batch ×
every partition) — the classic operational problem of a log-structured
sink at scale. ``compact_topic`` rewrites a topic directory into few
large files without changing its contents; readers see identical rows.

Schema evolution: new producer fields appear as extra columns; readers
use ``mergeSchema`` so old files surface the new column as NULL (the
intended forward-compatible form of the reference's fixed proto schema).
"""

from __future__ import annotations

from pyspark.sql import SparkSession


def compact_topic(
    spark: SparkSession, topic_dir: str, target_files: int = 4
) -> tuple[int, int]:
    """Rewrite ``topic_dir`` into ``target_files`` parquet files.
    Returns (files_before, files_after). Content-preserving: same rows,
    same schema. At 100 TB this runs per-partition-directory with a
    file-count/size trigger, not whole-topic."""
    import glob

    before = len(glob.glob(f"{topic_dir}/*.parquet"))
    df = spark.read.parquet(topic_dir)
    tmp = topic_dir.rstrip("/") + "_compacting"
    df.coalesce(target_files).write.mode("overwrite").parquet(tmp)
    # atomic-ish swap (local fs): validate row count before replacing
    n_before, n_after = df.count(), spark.read.parquet(tmp).count()
    if n_before != n_after:  # pragma: no cover - safety net
        raise RuntimeError(f"compaction row mismatch: {n_before} != {n_after}")
    import shutil

    shutil.rmtree(topic_dir)
    shutil.move(tmp, topic_dir)
    after = len(glob.glob(f"{topic_dir}/*.parquet"))
    return before, after
