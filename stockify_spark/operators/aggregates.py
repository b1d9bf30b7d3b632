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


def exact_heavy_hitters(tokens: DataFrame, col: str, phi: float = 0.02) -> DataFrame:
    """Exact phi-heavy hitters (items with frequency >= phi * N) via a
    Misra-Gries candidate pass + exact recount.

    Scale shape: the naive plan shuffles EVERY distinct item through a
    groupBy — at 100 TB of tokens that shuffle is the job. Here each
    input partition first runs a Misra-Gries summary of capacity
    k = ceil(1/phi) inside ``mapInPandas`` (pure map-side, no shuffle);
    by the standard averaging argument any global phi-heavy item is
    phi-heavy in at least one partition, and MG with capacity k >= 1/phi
    retains every item of partition frequency > N_p/(k+1), so the union
    of partition summaries is a SUPERSET of the true heavy hitters
    (<= k rows per partition). The second pass recounts ONLY candidate
    items (broadcast semi-join before the shuffle), so the final
    aggregation shuffles at most k * n_partitions rows. The answer is
    EXACT — the sketch only prunes, it never decides.
    """
    import math

    from pyspark.sql import types as T

    k = max(1, math.ceil(1.0 / phi))
    schema = T.StructType([T.StructField("item", T.StringType(), False)])

    def mg(batches):
        import pandas as pd

        counters: dict[str, int] = {}
        for pdf in batches:
            for v in pdf[col]:
                if v in counters:
                    counters[v] += 1
                elif len(counters) < k:
                    counters[v] = 1
                else:
                    dead = [key for key in counters if counters[key] == 1]
                    for key in counters:
                        counters[key] -= 1
                    for key in dead:
                        del counters[key]
        yield pd.DataFrame({"item": list(counters.keys())})

    candidates = tokens.mapInPandas(mg, schema=schema).distinct()
    total = tokens.count()  # one scalar action; at scale this is a cached stat
    cutoff = phi * total
    return (
        tokens.join(
            F.broadcast(candidates), tokens[col] == candidates["item"], "inner"
        )
        .groupBy("item")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .filter(F.col("cnt") >= cutoff)
        .select(F.col("item").alias("word"), "cnt")
    )
