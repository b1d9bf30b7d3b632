"""Time individual registry queries at sf0.1 exactly the way
bench.py does (1 warm-up + 3 timed noop-write iterations, median) —
the per-query feedback loop for perf work between driver bench runs.

    python tools/time_queries.py name [name ...]
"""

from __future__ import annotations

import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def main() -> None:
    from stockify_spark.registry import QUERIES
    from stockify_spark.session import get_spark

    spark = get_spark("stockify-time")
    names = sys.argv[1:]
    for name in names:
        fn = QUERIES[name]
        fn(spark, SF_DIR).write.format("noop").mode("overwrite").save()
        samples = []
        for _ in range(3):
            t0 = time.perf_counter()
            fn(spark, SF_DIR).write.format("noop").mode("overwrite").save()
            samples.append(time.perf_counter() - t0)
        print(f"{name}: {statistics.median(samples):.3f}s  {[round(s,3) for s in samples]}")


if __name__ == "__main__":
    main()
