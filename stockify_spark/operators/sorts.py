"""Sort / limit / top-k / range-scan operators (SURVEY §2.5, X1-X5).

The reference builds two runtime indexes over 10M rows — a sorted
vector with ``lower_bound`` binary search (stockify.cu:659-684) and a
``std::map`` red-black tree (stockify.cu:710-727) — to answer one
query shape: ``volume >= k``. Spark's idiom is index-as-layout
(SURVEY §4.3): ``sources.io.write_sorted_layout`` persists a
range-sorted Parquet layout whose row-group min/max stats let the
scan skip everything below ``k``; ``range_scan`` is then an ordinary
pushed-down filter. ORDER BY / LIMIT / top-k are absent from the
reference (§2.5) but free: Spark plans ``orderBy().limit(k)`` as
TakeOrderedAndProject — per-partition heaps + a k-row merge on the
driver, no global sort, which is the only top-k that works at 100 TB.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def range_scan(df: DataFrame, column: str, lower: float) -> DataFrame:
    """``column >= lower`` (the Experiment-3 probe, stockify.cu:674).

    Over a range-sorted layout this prunes row groups via min/max
    stats — the distributed analog of the ``lower_bound`` seek; over
    an unsorted layout it degrades to the linear scan the reference
    benchmarks against (stockify.cu:687-696). BENCH row E2 measures
    the ratio.
    """
    return df.filter(F.col(column) >= lower)


def top_k(df: DataFrame, k: int, *order: Column) -> DataFrame:
    """Global top-k: planned as TakeOrderedAndProject (no full sort).

    Pass a deterministic ``order`` (include a tiebreaker key) so the
    result set is stable under re-execution.
    """
    return df.orderBy(*order).limit(k)


def top_k_per_group(
    df: DataFrame,
    keys: list[str],
    k: int,
    *order: Column,
    rank_alias: str = "rn",
) -> DataFrame:
    """Top-k within each group via row_number over a partitioned
    window — parallel across groups, state bounded by k per group."""
    w = Window.partitionBy(*keys).orderBy(*order)
    return (
        df.withColumn(rank_alias, F.row_number().over(w).cast("long"))
        .filter(F.col(rank_alias) <= k)
    )


def exact_kth_smallest(
    df: DataFrame,
    column: str,
    k: int | None = None,
    n_buckets: int = 4096,
    rank_threshold: int = 10_000_000,
) -> DataFrame:
    """Exact k-th smallest value (default: lower median) WITHOUT a
    global sort — the recursive distributed selection algorithm.

    Scale shape: a global ORDER BY at 100 TB is a full range-shuffle
    of the dataset to find ONE value. Instead, per level: (1) one
    min/max+count aggregate, (2) one bucket-histogram aggregate
    (map-side combined, ``n_buckets`` result rows), (3) the driver
    locates the bucket containing rank k from the bounded histogram,
    then (4) RECURSES into that bucket (expected n/n_buckets of the
    data) until it is small enough (``rank_threshold``) to rank with
    a single-partition window, or until its min == max — a run of
    identical values, where the k-th value IS that value and no rank
    pass is needed at all (the value-skew case that re-bucketing can
    never shrink). Each level multiplies selectivity by ~n_buckets,
    so 100 TB needs at most 2-3 levels before the final rank touches
    only a sliver.

    Returns one row: (kth_value, n, k).
    """
    stats = df.agg(
        F.min(column).alias("lo"),
        F.max(column).alias("hi"),
        F.count(F.lit(1)).alias("n"),
    ).collect()[0]
    n = int(stats["n"])
    if k is None:
        k = (n + 1) // 2  # lower median

    def result(value) -> DataFrame:
        spark = df.sparkSession
        return spark.createDataFrame(
            [(float(value), n, k)], "kth_value double, n long, k long"
        )

    level_df, level_k = df.select(F.col(column).alias("v")), k
    lo, hi, level_n = float(stats["lo"]), float(stats["hi"]), n
    while True:
        if lo == hi:
            # degenerate run of identical values: the answer directly
            return result(lo)
        if level_n <= rank_threshold:
            w = Window.orderBy(F.col("v").asc())
            return (
                level_df.withColumn("rn", F.row_number().over(w))
                .filter(F.col("rn") == level_k)
                .select(
                    F.col("v").alias("kth_value"),
                    F.lit(n).cast("long").alias("n"),
                    F.lit(k).cast("long").alias("k"),
                )
            )
        width = (hi - lo) / n_buckets or 1.0
        bucket = F.least(
            F.floor((F.col("v") - F.lit(lo)) / F.lit(width)).cast("long"),
            F.lit(n_buckets - 1),
        )
        hist = sorted(
            level_df.groupBy(bucket.alias("b"))
            .agg(
                F.count(F.lit(1)).alias("c"),
                F.min("v").alias("bmin"),
                F.max("v").alias("bmax"),
            )
            .collect(),
            key=lambda r: r["b"],
        )  # bounded: <= n_buckets rows
        cum = 0
        target = None
        for r in hist:
            if cum + int(r["c"]) >= level_k:
                target = r
                break
            cum += int(r["c"])
        # filter with the IDENTICAL bucket expression, not a re-derived
        # value range: float rounding at a bucket boundary could
        # otherwise assign a row to bucket b in the histogram but
        # exclude it from the range filter, off-by-one-ing the rank
        level_df = level_df.filter(bucket == F.lit(int(target["b"])))
        level_k -= cum
        level_n = int(target["c"])
        # the bucket's OWN min/max (from the histogram pass) tighten
        # the next level's range — and detect all-identical buckets
        lo, hi = float(target["bmin"]), float(target["bmax"])
