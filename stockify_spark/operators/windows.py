"""Window operators (SURVEY §2.4, W1-W3 + ranking/lag extensions).

The reference's windows are forward-looking row-frame sliding windows
over CSV file order, size 10: ``AVG/MIN/MAX(x) OVER (ORDER BY row_id
ROWS BETWEEN CURRENT ROW AND 9 FOLLOWING)`` — intent established by
the CPU moving-average loop (stockify.cu:513-521). The GPU kernels
carry two bugs we implement the *intent* of, not the behavior
(SURVEY §2.4): loop-variable shadowing (stockify.cu:146,157) and
out-of-bounds tail reads (stockify.cu:146,158,187). Tail frames here
shrink per SQL standard; callers who need the reference CPU loop's
``i < size-10`` guard filter on row_id afterwards.

Scale note (SURVEY §7.4.1): a window with no PARTITION BY funnels
every row through one task — fine at test scale, a documented hazard
at 100 TB. Every helper therefore takes ``partition_by``; production
callers partition by symbol/date-bucket so WindowExec parallelizes.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window, WindowSpec
from pyspark.sql import functions as F


def row_window(
    order_by: list[str | Column],
    partition_by: list[str | Column] | None = None,
    start: int = Window.currentRow,
    end: int = 9,
) -> WindowSpec:
    """Row-frame window spec; default frame = reference's
    [CURRENT ROW, +9 FOLLOWING] (window size 10, stockify.cu:517)."""
    w = Window.partitionBy(*partition_by) if partition_by else Window.partitionBy()
    return w.orderBy(*order_by).rowsBetween(start, end)


def sliding_agg(
    df: DataFrame,
    agg: Column,
    alias: str,
    order_by: list[str | Column],
    partition_by: list[str | Column] | None = None,
    window_size: int = 10,
    forward: bool = True,
) -> DataFrame:
    """Generic sliding aggregate over a row frame of ``window_size``.

    ``forward=True`` anchors at the current row looking ahead
    (the reference's shape); ``False`` gives the conventional
    trailing window.
    """
    if forward:
        spec = row_window(order_by, partition_by, Window.currentRow, window_size - 1)
    else:
        spec = row_window(order_by, partition_by, -(window_size - 1), Window.currentRow)
    return df.withColumn(alias, agg.over(spec))


def moving_average(
    df: DataFrame,
    value_col: str,
    order_by: list[str | Column],
    partition_by: list[str | Column] | None = None,
    window_size: int = 10,
    alias: str = "moving_avg",
) -> DataFrame:
    """W1 (getMovingAverage, stockify.cu:142-149; CPU intent 513-521)."""
    return sliding_agg(df, F.avg(value_col), alias, order_by, partition_by, window_size)


def rolling_min(
    df: DataFrame,
    value_col: str,
    order_by: list[str | Column],
    partition_by: list[str | Column] | None = None,
    window_size: int = 10,
    alias: str = "rolling_min",
) -> DataFrame:
    """W2 (getMinLowPrice, stockify.cu:153-162)."""
    return sliding_agg(df, F.min(value_col), alias, order_by, partition_by, window_size)


def rolling_max(
    df: DataFrame,
    value_col: str,
    order_by: list[str | Column],
    partition_by: list[str | Column] | None = None,
    window_size: int = 10,
    alias: str = "rolling_max",
) -> DataFrame:
    """W3 (getMaxHighPrice, stockify.cu:170-193). The reference tiles
    the block into shared memory (stockify.cu:175-183); Spark's
    WindowExec buffers partition rows — same locality idea, built in."""
    return sliding_agg(df, F.max(value_col), alias, order_by, partition_by, window_size)


def bucketed_forward_window(
    df: DataFrame,
    order_col: str,
    aggs: dict[str, Column],
    window_size: int = 10,
    bucket_size: int = 4096,
) -> DataFrame:
    """Global-order forward window WITHOUT the single global partition.

    The scale-safe parity form of W1–W3: the global-order results are
    reproduced exactly while WindowExec runs one task PER BUCKET, so
    the documented single-partition hazard of ``ORDER BY`` with no
    ``PARTITION BY`` (SURVEY §7.4.1) disappears.

    How: ``order_col`` must be a DENSE integer key (0..n-1 — the
    materialized file order the reference's windows depend on; ingest
    materializes it via ``with_row_id``). Rows bucket by
    ``id div bucket_size``; the first ``window_size - 1`` rows of each
    bucket (``id mod bucket_size <= window_size - 2``) are ALSO sent
    to the previous bucket as boundary helpers, so every row's
    forward frame is complete inside its own bucket. The frame is
    evaluated per bucket and helper copies are dropped. The global
    tail still shrinks per SQL-standard semantics (the last bucket
    has no helpers to receive). Density matters: with gaps, a
    value-range bucket could hold fewer than ``window_size`` rows and
    a frame would need to span two buckets ahead — re-key first.

    Cost: one map-side ≤2× replication of a ``window_size/bucket_size``
    fraction of rows + ONE shuffle keyed on bucket id — same shuffle
    count as any partitioned window, with bucket parallelism
    n/bucket_size instead of 1.

    ``aggs`` maps output alias → aggregate column (e.g.
    ``{"moving_avg": F.avg("value")}``); each is evaluated over the
    frame ``[CURRENT ROW, window_size - 1 FOLLOWING]``.
    """
    if window_size > bucket_size:
        raise ValueError("bucket_size must be >= window_size")
    oid = F.col(order_col)
    own = df.withColumn("_b", (oid / bucket_size).cast("long")).withColumn(
        "_owner", F.col("_b")
    )
    helpers = (
        df.withColumn("_b", (oid / bucket_size).cast("long"))
        .filter((oid % bucket_size <= window_size - 2) & (F.col("_b") > 0))
        .withColumn("_owner", F.col("_b") - 1)
    )
    spec = (
        Window.partitionBy("_owner")
        .orderBy(order_col)
        .rowsBetween(Window.currentRow, window_size - 1)
    )
    out = own.unionByName(helpers).select(
        *df.columns,
        "_b",
        "_owner",
        *[agg.over(spec).alias(alias) for alias, agg in aggs.items()],
    )
    return out.filter(F.col("_owner") == F.col("_b")).drop("_b", "_owner")


def bucketed_prefix_sum(
    df: DataFrame,
    order_col: str,
    value_col: str,
    alias: str,
    bucket_size: int = 4096,
    exclusive: bool = False,
) -> DataFrame:
    """Global running sum WITHOUT a single global partition — the
    classic two-phase parallel scan, in DataFrame form.

    Phase 1 computes per-bucket totals (``order_col div bucket_size``
    on a dense integer key; one partial/final aggregate). Phase 2
    turns the TINY bucket-total table (n/bucket_size rows) into
    exclusive running offsets with an ordinary ordered window — the
    only single-partition step, over data that shrank by
    ``bucket_size``× (recurse for the pathological case where even
    that is big). Each row then adds its within-bucket running sum
    (a bucket-partitioned window) to its bucket's offset.

    ``exclusive=True`` yields the sum of strictly-preceding rows
    (first row 0) — the form sequence packing needs.
    """
    oid = F.col(order_col)
    base = df.withColumn("_b", (oid / bucket_size).cast("long"))
    bucket_totals = base.groupBy("_b").agg(F.sum(value_col).alias("_bsum"))
    w_off = Window.orderBy("_b").rowsBetween(Window.unboundedPreceding, -1)
    offsets = bucket_totals.select(
        "_b", F.coalesce(F.sum("_bsum").over(w_off), F.lit(0)).alias("_off")
    )
    end = -1 if exclusive else Window.currentRow
    w_in = (
        Window.partitionBy("_b")
        .orderBy(order_col)
        .rowsBetween(Window.unboundedPreceding, end)
    )
    within = F.coalesce(F.sum(value_col).over(w_in), F.lit(0))
    return (
        base.join(F.broadcast(offsets), "_b")
        .withColumn(alias, (within + F.col("_off")).cast("long"))
        .drop("_b", "_off")
    )
