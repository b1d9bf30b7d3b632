"""Join operators (north-star extension, SURVEY §7.6.2 — the
reference has a single table and no join of any kind, §2.6).

Strategy guidance baked into the helpers, because at 100 TB the join
strategy IS the query plan:

  * ``dim_join`` — explicit ``broadcast()`` of the small side. The
    star-schema dims (region/nation/supplier/part) are KBs-to-MBs at
    any scale factor; broadcasting turns a cluster-wide shuffle of
    the 100 TB fact table into a map-side hash join.
  * ``fact_join`` — shuffle join on the key, left to Catalyst/AQE:
    sort-merge by default, runtime-switched to shuffled-hash or
    skew-split by AQE when partition sizes warrant.
  * ``semi_join`` / ``anti_join`` — EXISTS / NOT EXISTS without
    materializing right-side columns (no payload shuffle).
  * ``asof_join`` — the time-series join Spark lacks natively;
    composed from built-ins (union + partitioned window), so it
    shuffles each side once on (key) and never builds a range
    cross-product.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def dim_join(
    fact: DataFrame,
    dim: DataFrame,
    on: str | list[str] | Column,
    how: str = "inner",
) -> DataFrame:
    """Fact ⋈ broadcast(dim). Use when the right side fits in executor
    memory (typically < spark.sql.autoBroadcastJoinThreshold, but the
    explicit hint also covers dims Catalyst can't size-estimate)."""
    return fact.join(F.broadcast(dim), on, how)


def fact_join(
    left: DataFrame,
    right: DataFrame,
    on: str | list[str] | Column,
    how: str = "inner",
) -> DataFrame:
    """Big ⋈ big: shuffle both sides on the key; AQE picks
    sort-merge vs shuffled-hash and splits skewed partitions."""
    return left.join(right, on, how)


def semi_join(left: DataFrame, right: DataFrame, on: str | list[str] | Column) -> DataFrame:
    return left.join(right, on, "left_semi")


def anti_join(left: DataFrame, right: DataFrame, on: str | list[str] | Column) -> DataFrame:
    return left.join(right, on, "left_anti")


def asof_join(
    left: DataFrame,
    right: DataFrame,
    key: str,
    time_col: str,
    right_value_cols: list[str],
    direction: str = "backward",
) -> DataFrame:
    """As-of join: for each left row, the latest right row with
    ``right.time <= left.time`` within the same ``key`` (backward),
    or the earliest with ``>=`` (forward).

    Built as union → one window per key ordered by time → last/first
    non-null carry-forward → keep left rows. One shuffle per input on
    (key), window state is O(1) per row — no range cross-product, so
    it scales linearly where a naive non-equi join would explode.
    """
    if direction not in ("backward", "forward"):
        raise ValueError("direction must be 'backward' or 'forward'")
    from pyspark.sql import Window

    lt = left.withColumn("_side", F.lit(1))
    # right rows carry only key/time/values; left columns are null there
    rt = right.select(
        key,
        time_col,
        *right_value_cols,
    ).withColumn("_side", F.lit(0))

    left_cols = [c for c in left.columns]
    carried = [f"_r_{c}" for c in right_value_cols]

    union_cols = []
    for c in left_cols:
        union_cols.append(F.col(c) if c in lt.columns else F.lit(None).alias(c))
    unioned = lt.select(
        *left_cols,
        F.col("_side"),
        *[F.lit(None).cast(right.schema[c].dataType).alias(r) for c, r in zip(right_value_cols, carried)],
    ).unionByName(
        rt.select(
            *[
                F.col(c) if c in rt.columns else F.lit(None).cast(left.schema[c].dataType).alias(c)
                for c in left_cols
            ],
            F.col("_side"),
            *[F.col(c).alias(r) for c, r in zip(right_value_cols, carried)],
        ),
        allowMissingColumns=False,
    )

    from pyspark.sql import Window as W

    if direction == "backward":
        # right rows sort before left rows at equal timestamps so a
        # tying quote is visible to the trade (merge_asof semantics)
        w = W.partitionBy(key).orderBy(F.col(time_col).asc(), F.col("_side").asc()).rowsBetween(
            W.unboundedPreceding, 0
        )
        filled = unioned.select(
            *left_cols,
            "_side",
            *[F.last(r, ignorenulls=True).over(w).alias(r) for r in carried],
        )
    else:
        w = W.partitionBy(key).orderBy(F.col(time_col).asc(), F.col("_side").desc()).rowsBetween(
            0, W.unboundedFollowing
        )
        filled = unioned.select(
            *left_cols,
            "_side",
            *[F.first(r, ignorenulls=True).over(w).alias(r) for r in carried],
        )
    out = filled.filter(F.col("_side") == 1).drop("_side")
    for c, r in zip(right_value_cols, carried):
        out = out.withColumnRenamed(r, f"asof_{c}")
    return out


def salted_join(
    left: DataFrame,
    right: DataFrame,
    key: str,
    salt: int = 8,
    how: str = "inner",
) -> DataFrame:
    """Skew-resistant equi-join: hot keys are split across ``salt``
    sub-keys.

    Left rows get a deterministic salt in [0, salt); right rows are
    replicated once per salt value; the join key becomes (key, salt),
    so a key holding 30% of the table spreads over ``salt`` tasks
    instead of one straggler. Cost: right side is shuffled ``salt``×
    — use for fact⋈fact joins with known hot keys when AQE's runtime
    skew split isn't available (e.g. a fixed partitioning is being
    reused downstream). Result equals ``left.join(right, key, how)``.
    """
    salted_l = left.withColumn(
        "_salt", F.pmod(F.xxhash64(*[F.col(c) for c in left.columns]), F.lit(salt))
    )
    salted_r = right.withColumn(
        "_salt", F.explode(F.array(*[F.lit(i) for i in range(salt)]))
    )
    return salted_l.join(salted_r, [key, "_salt"], how).drop("_salt")


def range_join_bucketed(
    left: DataFrame,
    right: DataFrame,
    left_point: str,
    right_lo: str,
    right_hi: str,
    bucket_width: float,
    extra_on: Column | None = None,
) -> DataFrame:
    """Point-in-interval join via bucketization: explode each right
    interval into the buckets it covers, equi-join on bucket, then
    exact-filter. Turns an O(n·m) non-equi join into an equi-join
    whose fan-out is interval_width / bucket_width — the standard
    scale trick when intervals are short relative to the domain."""
    b = F.lit(bucket_width)
    lb = left.withColumn("_bucket", F.floor(F.col(left_point) / b))
    rb = right.withColumn(
        "_bucket",
        F.explode(
            F.sequence(
                F.floor(F.col(right_lo) / b),
                F.floor(F.col(right_hi) / b),
            )
        ),
    )
    cond = (
        (lb["_bucket"] == rb["_bucket"])
        & (F.col(left_point) >= F.col(right_lo))
        & (F.col(left_point) <= F.col(right_hi))
    )
    if extra_on is not None:
        cond = cond & extra_on
    return lb.join(rb, cond).select(*left.columns, *right.columns)
