"""Plan audit: the shuffle census for every registry query.

For each query, counts Exchanges (shuffles/broadcasts), scans, and
flags single-partition hazards in the optimized physical plan at
sf0.001 (plans are scale-invariant in shape). Use to catch a refactor
that silently de-optimizes a query — the per-family expectations live
in DESIGN.md.

    python tools/plan_audit.py [name ...]
"""

from __future__ import annotations

import os
import re
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = "/root/testdata/sf0.001"


def main(only: list[str]) -> None:
    from stockify_spark.registry import QUERIES
    from stockify_spark.session import get_spark

    spark = get_spark("plan-audit", cpus=4)
    jvm_mode = spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString("formatted")

    print(f"{'query':28s} {'shuffles':>8s} {'bcasts':>6s} {'scans':>5s} {'1-part':>6s}")
    for name in only or sorted(QUERIES):
        try:
            df = QUERIES[name](spark, SF_DIR)
            plan = df._jdf.queryExecution().explainString(jvm_mode)
        except Exception as e:  # noqa: BLE001
            print(f"{name:28s} ERROR {e}")
            continue
        # formatted mode lists each node once in the tree ("+- Exchange (5)")
        # and once in the details ("(5) Exchange"); count detail headers only
        bcasts = len(re.findall(r"^\(\d+\) BroadcastExchange", plan, re.M))
        shuffles = len(re.findall(r"^\(\d+\) Exchange", plan, re.M))
        scans = len(re.findall(r"^\(\d+\) Scan ", plan, re.M))
        # SinglePartition on a window sort is the global-order hazard;
        # on a final global aggregate it's a few partial rows (benign)
        hazard = "YES" if re.search(r"Arguments: SinglePartition", plan) and "Window" in plan else ""
        print(f"{name:28s} {shuffles:8d} {bcasts:6d} {scans:5d} {hazard:>6s}")


if __name__ == "__main__":
    main(sys.argv[1:])
