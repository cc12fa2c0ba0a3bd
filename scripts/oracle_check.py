"""Oracle-check a list of declared queries at one or more SF dirs.

Usage: python scripts/oracle_check.py sf0.01,sf0.1 <query> [<query> ...]
"""

from __future__ import annotations

import os
import sys
import time

HERE = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, HERE)


def main() -> None:
    from cascade_spark.plans.compare import compare
    from cascade_spark.plans.registry import load_all
    from cascade_spark.session import get_spark

    sfs = [f"/root/testdata/{s}" for s in sys.argv[1].split(",")]
    names = sys.argv[2:]
    spark = get_spark("oracle_check")
    reg = load_all()
    n_fail = 0
    for sf in sfs:
        for name in names:
            q = reg[name]
            t0 = time.perf_counter()
            if q.oracle is None:
                rows = q.builder(spark, sf).count()
                print(f"{sf.rsplit('/',1)[-1]} {name}: rows_only {rows}", flush=True)
                continue
            ok, msg = compare(q.builder(spark, sf), q.oracle, sf)
            el = time.perf_counter() - t0
            print(
                f"{sf.rsplit('/',1)[-1]} {name}: "
                + ("PASS" if ok else f"FAIL {str(msg)[:200]}")
                + f" ({el:.1f}s)",
                flush=True,
            )
            if not ok:
                n_fail += 1
    print(f"n_fail={n_fail}")
    sys.exit(1 if n_fail else 0)


if __name__ == "__main__":
    main()
