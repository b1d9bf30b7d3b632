"""Aggregation operators (SURVEY §2.3, A1-A4 + keyed extensions).

The reference computes three global scalars — SUM(low) by atomicAdd
(stockify.cu:135-138), MIN(low) and MAX(high) by host loop
(stockify.cu:556-562, 599-605) — with a manual partial(device) →
final(host) reduce (stockify.cu:498-501). Spark's HashAggregate is
exactly that two-phase model, emitted automatically: partial
aggregation map-side, one shuffle of the partials, final merge. For
a global aggregate the shuffle carries one row per partition — it is
already minimal at any scale.

Float policy (SURVEY §7.4): the reference sums float32 in atomic
scheduling order — nondeterministic and lossy above 2^24. The engine
aggregates in double; the divergence is documented and tested rather
than reproduced.

GROUP BY does not exist in the reference (SURVEY §2.6); ``group_agg``
plus cube/rollup are north-star extensions (§7.6.1).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def global_agg(df: DataFrame, *aggs: Column) -> DataFrame:
    """Whole-table aggregation → single row (A1-A3 generalized)."""
    return df.agg(*aggs)


def group_agg(df: DataFrame, keys: list[str], *aggs: Column) -> DataFrame:
    """Keyed aggregation. Shuffles on ``keys``; map-side partial
    aggregation means the shuffle carries one row per (task, key) —
    the scale knob is key cardinality, not row count. Skewed keys are
    re-split at runtime by AQE (enabled in session.py)."""
    return df.groupBy(*keys).agg(*aggs)


def rollup_agg(df: DataFrame, keys: list[str], *aggs: Column) -> DataFrame:
    return df.rollup(*keys).agg(*aggs)


def cube_agg(df: DataFrame, keys: list[str], *aggs: Column) -> DataFrame:
    return df.cube(*keys).agg(*aggs)


def summary_stats(df: DataFrame, column: str) -> DataFrame:
    """The reference's full scalar surface over one column in a single
    pass (sum/min/max + the free count/avg extensions), double-typed."""
    c = F.col(column)
    return df.agg(
        F.sum(c).alias("sum"),
        F.min(c).alias("min"),
        F.max(c).alias("max"),
        F.count(c).alias("count"),
        F.avg(c).alias("avg"),
    )
