"""Isolated warm timings for declared queries (bench methodology:
checksum materialization over all output columns).

Usage: python scripts/time_queries.py <reps> <query> [<query> ...]
Prints per-query: all rep timings + median of warm reps (2..n).
SF dir from $SPARK_GRAFT_SF_DIR (default sf0.1).
"""

from __future__ import annotations

import os
import statistics
import sys
import time

HERE = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, HERE)

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def main() -> None:
    from pyspark.sql import functions as F

    from cascade_spark.plans.registry import load_all
    from cascade_spark.session import get_spark

    reps = int(sys.argv[1])
    names = sys.argv[2:]
    spark = get_spark("time_queries")
    reg = load_all()
    spark.read.parquet(f"{SF_DIR}/lineitem.parquet").count()  # JVM warm

    def mat(df) -> None:
        h = F.xxhash64(*[F.col(c) for c in df.columns]) if df.columns else F.lit(0)
        df.select(h.alias("_h")).agg(F.count("_h"), F.sum("_h")).collect()

    for name in names:
        ts = []
        for _ in range(reps):
            t0 = time.perf_counter()
            mat(reg[name].builder(spark, SF_DIR))
            ts.append(round(time.perf_counter() - t0, 3))
        warm = ts[1:] or ts
        print(
            f"{name:45s} reps={ts} warm_med={statistics.median(warm):.3f}",
            flush=True,
        )


if __name__ == "__main__":
    main()
