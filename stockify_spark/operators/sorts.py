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
