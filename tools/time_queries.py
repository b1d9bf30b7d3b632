"""Time individual registry queries at sf0.1 exactly the way
bench.py does — by importing bench's own timing loop, so the two can
never desynchronize. The per-query feedback loop for perf work
between driver bench runs.

    python tools/time_queries.py name [name ...]
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def main() -> None:
    from bench import time_query

    from stockify_spark.registry import QUERIES
    from stockify_spark.session import get_spark

    spark = get_spark("stockify-time")
    for name in sys.argv[1:]:
        print(f"{name}: {time_query(QUERIES[name], spark, SF_DIR):.3f}s")


if __name__ == "__main__":
    main()
