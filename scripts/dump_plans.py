"""Dump .explain('formatted') for a list of declared queries.

Usage: python scripts/dump_plans.py <suffix> <query> [<query> ...]
Writes plans/r12/<query>_<suffix>.txt under the REPO THIS SCRIPT LIVES IN
(so the round-11 worktree copy writes into the main repo's plans/r12 via
$PLANS_OUT override). SF dir from $SPARK_GRAFT_SF_DIR (default sf0.1).
"""

from __future__ import annotations

import os
import sys

HERE = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, HERE)

OUT = os.environ.get("PLANS_OUT", os.path.join(HERE, "plans", "r12"))
SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def main() -> None:
    from cascade_spark.plans.registry import load_all
    from cascade_spark.session import get_spark

    suffix = sys.argv[1]
    names = sys.argv[2:]
    spark = get_spark("dump_plans")
    reg = load_all()
    os.makedirs(OUT, exist_ok=True)
    for name in names:
        try:
            df = reg[name].builder(spark, SF_DIR)
            txt = df._jdf.queryExecution().explainString(
                spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
                    "formatted"
                )
            )
        except Exception as exc:  # noqa: BLE001 — record the failure
            txt = f"EXPLAIN FAILED: {exc}"
        with open(os.path.join(OUT, f"{name}_{suffix}.txt"), "w") as fh:
            fh.write(txt)
        print(f"wrote {name}_{suffix}.txt ({len(txt)} chars)", flush=True)


if __name__ == "__main__":
    main()
