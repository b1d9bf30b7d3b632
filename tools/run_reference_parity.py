"""End-to-end parity run on the reference's ACTUAL input: extract
stocks.csv (5,613,298 rows) from /root/reference/stocks.csv.zip into a
temp dir, ingest with the schema'd CSV reader, and execute every
reference experiment (SURVEY §2 / BASELINE.md B1-B3) as its Spark
formulation, timing each. The window ops implement the CPU reference
intent (stockify.cu:513-521), not the buggy kernels (SURVEY §2.4).

    python tools/run_reference_parity.py

Prints one JSON line with per-experiment seconds and result scalars
(row counts / aggregates) so the numbers can be eyeballed against the
reference's own printouts.
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time
import zipfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

ZIP = "/root/reference/stocks.csv.zip"


def main() -> None:
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    from stockify_spark.session import get_spark
    from stockify_spark.sources.io import read_stocks_csv, with_row_id, write_sorted_layout

    tmp = tempfile.mkdtemp(prefix="stockify_ref_")
    results: dict[str, dict] = {}
    try:
        with zipfile.ZipFile(ZIP) as zf:
            zf.extract("stocks.csv", tmp)
        csv_path = os.path.join(tmp, "stocks.csv")

        spark = get_spark("reference-parity")
        t0 = time.perf_counter()
        stocks = read_stocks_csv(spark, csv_path)
        # materialize once as parquet — the production ingest shape
        # (CSV is a one-time landing format, not a query format)
        pq = os.path.join(tmp, "stocks.parquet")
        with_row_id(stocks).write.parquet(pq)
        df = spark.read.parquet(pq)
        n = df.count()
        results["ingest"] = {"sec": round(time.perf_counter() - t0, 3), "rows": n}

        def timed(name: str, fn):
            t = time.perf_counter()
            out = fn()
            results[name] = {"sec": round(time.perf_counter() - t, 3), **out}

        # B1a-B1f — filters (counts instead of the selection vector;
        # literals from stockify.cu:229,274 etc.)
        timed("b1a_filter_volume", lambda: {"hits": df.filter(F.col("volume") >= 1e6).count()})
        timed("b1b_filter_close", lambda: {"hits": df.filter(F.col("close") >= 100).count()})
        timed("b1f_filter_and", lambda: {
            "hits": df.filter((F.col("high") >= 100) & (F.col("low") >= 100)).count()
        })

        # B2a — global sum(low) (double, not float32 — SURVEY §2.3)
        timed("b2a_sum_low", lambda: {
            "sum": round(df.agg(F.sum("low")).collect()[0][0], 2)
        })

        # B2b-d — window ops over file order (row_id), frame [CUR,+9]
        w = Window.orderBy("row_id").rowsBetween(Window.currentRow, 9)

        def window_exp(agg, alias):
            def run():
                out = df.select(agg.over(w).alias(alias))
                # force full evaluation; return a stable scalar
                row = out.agg(
                    F.round(F.sum(alias), 2).alias("s"), F.count(F.lit(1)).alias("c")
                ).collect()[0]
                return {"sum": row["s"], "rows": row["c"]}

            return run

        timed("b2b_moving_avg_close", window_exp(F.avg("close"), "mavg"))
        timed("b2c_rolling_min_low", window_exp(F.min("low"), "rmin"))
        timed("b2d_rolling_max_high", window_exp(F.max("high"), "rmax"))

        # B3 — sorted layout vs linear scan, probe volume >= 1.8e6
        sorted_path = os.path.join(tmp, "stocks_sorted")
        t = time.perf_counter()
        write_sorted_layout(df, sorted_path, "volume")
        build = time.perf_counter() - t

        t = time.perf_counter()
        hits_lin = df.filter(F.col("volume") >= 1.8e6).count()
        linear = time.perf_counter() - t

        t = time.perf_counter()
        hits_idx = spark.read.parquet(sorted_path).filter(F.col("volume") >= 1.8e6).count()
        indexed = time.perf_counter() - t
        assert hits_idx == hits_lin, (hits_idx, hits_lin)
        results["b3_layout"] = {
            "build_sec": round(build, 3),
            "linear_sec": round(linear, 3),
            "indexed_sec": round(indexed, 3),
            "speedup": round(linear / indexed, 2) if indexed else None,
            "hits": hits_lin,
        }

        print(json.dumps({"metric": "reference_parity", "experiments": results}))
    finally:
        shutil.rmtree(tmp, ignore_errors=True)


if __name__ == "__main__":
    main()
