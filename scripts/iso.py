"""Isolation timing harness (guide §1): time one or more declared
queries in a warm session with the shared persisted frames in the same
cache state the bench sees, via the noop sink, and optionally dump
.explain("formatted") to a file.

Usage:
  python scripts/iso.py [--sf DIR] [--reps N] [--explain-dir DIR] q1 q2 ...

Each query is timed `reps` times (rep 0 may pay shared-cache builds —
both figures are printed). Timing uses the same checksum materialization
as bench.py so numbers are comparable, plus a noop-sink figure.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("queries", nargs="+")
    ap.add_argument("--sf", default=os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"))
    ap.add_argument("--reps", type=int, default=3)
    ap.add_argument("--explain-dir", default=None)
    ap.add_argument("--noop", action="store_true", help="also time via noop sink")
    args = ap.parse_args()

    from cascade_spark.session import get_spark
    from cascade_spark.plans.registry import load_all
    from bench import _materialize

    registry = load_all()
    spark = get_spark("iso")
    sc = spark.sparkContext
    # warm JVM + parquet footers
    spark.read.parquet(f"{args.sf}/lineitem.parquet").count()

    out = {}
    for name in args.queries:
        ent = registry[name]
        times = []
        for rep in range(args.reps):
            sc.setJobDescription(f"iso:{name}#{rep}")
            t0 = time.perf_counter()
            df = ent.builder(spark, args.sf)
            _materialize(df)
            times.append(round(time.perf_counter() - t0, 3))
        if args.noop:
            sc.setJobDescription(f"iso-noop:{name}")
            t0 = time.perf_counter()
            df = ent.builder(spark, args.sf)
            df.write.format("noop").mode("overwrite").save()
            times.append(round(time.perf_counter() - t0, 3))
        sc.setJobDescription(None)
        out[name] = times
        print(f"{name}: {times}", flush=True)
        if args.explain_dir:
            os.makedirs(args.explain_dir, exist_ok=True)
            df = ent.builder(spark, args.sf)
            p = os.path.join(args.explain_dir, f"{name}.txt")
            with open(p, "w") as f:
                f.write(df._jdf.queryExecution().explainString(
                    spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString("formatted")))
    print(json.dumps(out))


if __name__ == "__main__":
    main()
