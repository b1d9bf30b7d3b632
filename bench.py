"""Benchmark harness (SURVEY §7.3, BASELINE.md E1/E2).

Runs the headline queries at $SPARK_GRAFT_SF_DIR (default sf0.1) on
local[$SPARK_GRAFT_CPUS], 1 warm-up + 3 timed iterations each, median
reported; plus the Experiment-3 analog (BASELINE.md E2): the same
range probe against an unsorted vs a range-sorted Parquet layout
(row-group min/max skipping — the reference's index-vs-linear-scan
comparison, stockify.cu:672-696).

Prints ONE JSON line:
  {"metric": "total_query_sec", "value": N, "unit": "sec",
   "queries": {...}, "sf": ..., "extras": {...}}
"""

from __future__ import annotations

import json
import os
import shutil
import statistics
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

# Headline set: one per operator family (SURVEY §2 + §7.6).
BENCH_QUERIES = [
    "filter_and",
    "agg_stats",
    "groupby_q1",
    "window_partitioned_sum",
    "window_moving_avg",
    "topk_orders",
    "range_scan_price",
    "join_fact_agg",
    "join_star",
    "join_asof",
    "tpch_q6",
    "tpch_q3",
    "subquery_correlated",
    "setop_union_all",
    "stream_tumbling_counts",
    "stream_session_agg",
    "window_range_frame",
    "fn_math",
    "dedup_exact",
    "text_stats",
    "dedup_minhash_lsh",
    "dedup_ngram_jaccard",
    "sim_cosine_topk",
    "sim_embedding_dup",
    "sim_ivf_topk",
]


def _force(df) -> None:
    """Run the full plan without driver-side materialization cost."""
    df.write.format("noop").mode("overwrite").save()


def time_query(fn, spark, sf_dir: str, iters: int = 3) -> float:
    _force(fn(spark, sf_dir))  # warm-up (JIT, file listing, codegen)
    samples = []
    for _ in range(iters):
        t0 = time.perf_counter()
        _force(fn(spark, sf_dir))
        samples.append(time.perf_counter() - t0)
    return statistics.median(samples)


def layout_experiment(spark, sf_dir: str) -> dict[str, float]:
    """E2: unsorted vs range-sorted layout for the range-scan probe
    (index-as-layout, SURVEY §4.3)."""
    from pyspark.sql import functions as F

    from stockify_spark.sources.io import load_table, write_sorted_layout

    li = load_table(spark, sf_dir, "lineitem")
    tmp = tempfile.mkdtemp(prefix="stockify_layout_")
    try:
        unsorted_path = os.path.join(tmp, "unsorted")
        sorted_path = os.path.join(tmp, "sorted")
        li.write.mode("overwrite").parquet(unsorted_path)
        write_sorted_layout(li, sorted_path, "l_extendedprice")

        def probe(path: str) -> float:
            df = spark.read.parquet(path).filter(F.col("l_extendedprice") >= 95000.0)
            _force(df)
            samples = []
            for _ in range(3):
                t0 = time.perf_counter()
                _force(spark.read.parquet(path).filter(F.col("l_extendedprice") >= 95000.0))
                samples.append(time.perf_counter() - t0)
            return statistics.median(samples)

        t_unsorted = probe(unsorted_path)
        t_sorted = probe(sorted_path)
        return {
            "layout_unsorted_sec": round(t_unsorted, 4),
            "layout_sorted_sec": round(t_sorted, 4),
            "layout_sorted_speedup": round(t_unsorted / t_sorted, 3) if t_sorted else 0.0,
        }
    finally:
        shutil.rmtree(tmp, ignore_errors=True)


def main() -> None:
    from stockify_spark.registry import QUERIES
    from stockify_spark.session import get_spark

    spark = get_spark("stockify-bench")
    sf = os.path.basename(SF_DIR.rstrip("/")).replace("sf", "")

    timings: dict[str, float] = {}
    for name in BENCH_QUERIES:
        timings[name] = round(time_query(QUERIES[name], spark, SF_DIR), 4)

    extras = layout_experiment(spark, SF_DIR)

    result = {
        "metric": "total_query_sec",
        "value": round(sum(timings.values()), 4),
        "unit": "sec",
        "queries": timings,
        "sf": float(sf) if sf.replace(".", "").isdigit() else sf,
        "extras": extras,
    }
    print(json.dumps(result))


if __name__ == "__main__":
    main()
