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
    df: DataFrame, column: str, k: int | None = None, n_buckets: int = 4096
) -> DataFrame:
    """Exact k-th smallest value (default: lower median) WITHOUT a
    global sort — the distributed selection algorithm.

    Scale shape: a global ORDER BY at 100 TB is a full range-shuffle
    of the dataset to find ONE value. Instead: (1) one min/max
    aggregate, (2) one bucket-histogram aggregate (map-side combined,
    ``n_buckets`` result rows), (3) the driver locates the bucket
    containing rank k from the bounded histogram, (4) a second scan
    filters to that one bucket (a pushed-down range predicate) and
    ranks only its rows — expected n/n_buckets of the data, and the
    recursion could re-bucket if a single bucket were still huge
    (value-skew with duplicates caps at one bucket of identical
    values, which step 4 answers directly). Two scans + a tiny sort
    instead of a terabyte shuffle.

    Returns one row: (kth_value, n, k).
    """
    stats = df.agg(
        F.min(column).alias("lo"),
        F.max(column).alias("hi"),
        F.count(F.lit(1)).alias("n"),
    ).collect()[0]
    lo, hi, n = float(stats["lo"]), float(stats["hi"]), int(stats["n"])
    if k is None:
        k = (n + 1) // 2  # lower median
    width = (hi - lo) / n_buckets or 1.0
    bucket = F.least(
        F.floor((F.col(column) - F.lit(lo)) / F.lit(width)).cast("long"),
        F.lit(n_buckets - 1),
    )
    hist = sorted(
        df.groupBy(bucket.alias("b")).agg(F.count(F.lit(1)).alias("c")).collect(),
        key=lambda r: r["b"],
    )  # bounded: <= n_buckets rows
    cum = 0
    target_b, before = 0, 0
    for r in hist:
        if cum + int(r["c"]) >= k:
            target_b, before = int(r["b"]), cum
            break
        cum += int(r["c"])
    # filter with the IDENTICAL bucket expression, not a re-derived
    # [lo_edge, hi_edge) range: float rounding at a bucket boundary
    # could otherwise assign a row to bucket b in the histogram but
    # exclude it from the range filter, off-by-one-ing the rank
    in_bucket = df.filter(bucket == F.lit(target_b))
    w = Window.orderBy(F.col("v").asc())
    return (
        in_bucket.select(F.col(column).alias("v"))
        .withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == k - before)
        .select(
            F.col("v").alias("kth_value"),
            F.lit(n).cast("long").alias("n"),
            F.lit(k).cast("long").alias("k"),
        )
    )
