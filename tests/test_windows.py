"""Window-operator properties (SURVEY §5.3): frame exactness at the
tail (where the reference's OOB bug lived, stockify.cu:146,158,187)
and the rolling/global identities used as *properties*."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from stockify_spark.operators import moving_average, rolling_min, rolling_max
from stockify_spark.sources.fixtures import stocks_ramp


@pytest.fixture(scope="module")
def stocks(spark):
    return stocks_ramp(spark, cycles=10).cache()  # 180 rows


def test_moving_average_matches_cpu_reference_loop(spark, stocks):
    """The CPU intent (stockify.cu:513-521): avg of close[i..i+9],
    guarded to i < size-10. Our frames shrink at the tail instead;
    restricting to the guarded region must reproduce the loop."""
    rows = stocks.orderBy("row_id").select("close").collect()
    close = [r[0] for r in rows]
    expected = [sum(close[i : i + 10]) / 10.0 for i in range(len(close) - 10)]

    out = (
        moving_average(stocks, "close", order_by=["row_id"], window_size=10)
        .filter(F.col("row_id") < len(close) - 10)
        .orderBy("row_id")
        .collect()
    )
    got = [r["moving_avg"] for r in out]
    assert got == pytest.approx(expected)


def test_tail_frames_shrink(spark, stocks):
    """Last row's window contains only itself — SQL-standard shrink,
    not the reference's out-of-bounds read."""
    n = stocks.count()
    out = moving_average(stocks, "close", order_by=["row_id"], window_size=10)
    last = out.filter(F.col("row_id") == n - 1).collect()[0]
    assert last["moving_avg"] == pytest.approx(last["close"])


def test_rolling_bounds_property(spark, stocks):
    """rolling_min <= moving_avg <= rolling_max, per row."""
    df = moving_average(stocks, "close", order_by=["row_id"])
    df = rolling_min(df, "close", order_by=["row_id"])
    df = rolling_max(df, "close", order_by=["row_id"])
    bad = df.filter(
        (F.col("rolling_min") > F.col("moving_avg") + 1e-9)
        | (F.col("moving_avg") > F.col("rolling_max") + 1e-9)
    ).count()
    assert bad == 0


def test_min_of_rolling_min_is_global_min(spark, stocks):
    """The reference's vacuous check (stockify.cu:582-590), legitimate
    as a property (SURVEY §5.3)."""
    df = rolling_min(stocks, "low", order_by=["row_id"])
    a = df.agg(F.min("rolling_min")).collect()[0][0]
    b = stocks.agg(F.min("low")).collect()[0][0]
    assert a == b


def test_bucketed_forward_window_matches_global_exactly(spark, stocks):
    """The bucketed parity form must be bit-identical to the global
    single-partition window — including every bucket-boundary row and
    the shrinking global tail. bucket_size=16 on 180 rows forces 12
    boundary exchanges."""
    from stockify_spark.operators.windows import bucketed_forward_window

    g = (
        moving_average(stocks, "close", order_by=["row_id"])
        .select("row_id", "moving_avg")
    )
    g = rolling_min(stocks, "close", order_by=["row_id"]).join(g, "row_id").select(
        "row_id", "moving_avg", "rolling_min"
    )
    b = bucketed_forward_window(
        stocks.select("row_id", "close"),
        "row_id",
        {"moving_avg": F.avg("close"), "rolling_min": F.min("close")},
        window_size=10,
        bucket_size=16,
    ).select("row_id", "moving_avg", "rolling_min")
    assert b.count() == stocks.count()
    assert g.subtract(b).count() == 0 and b.subtract(g).count() == 0


def test_bucketed_forward_window_rejects_undersized_buckets(spark, stocks):
    from stockify_spark.operators.windows import bucketed_forward_window

    with pytest.raises(ValueError):
        bucketed_forward_window(
            stocks, "row_id", {"m": F.avg("close")}, window_size=10, bucket_size=8
        )


def test_bucketed_prefix_sum_matches_global_window(spark, stocks):
    """The two-phase scan must equal the single-partition running sum
    exactly, inclusive and exclusive, across bucket boundaries
    (bucket_size=16 on 180 rows → 12 offsets)."""
    from pyspark.sql import Window

    from stockify_spark.operators.windows import bucketed_prefix_sum

    df = stocks.select("row_id", F.col("close").cast("long").alias("v"))
    for exclusive in (False, True):
        end = -1 if exclusive else Window.currentRow
        w = Window.orderBy("row_id").rowsBetween(Window.unboundedPreceding, end)
        g = df.select(
            "row_id", F.coalesce(F.sum("v").over(w), F.lit(0)).cast("long").alias("ps")
        )
        b = bucketed_prefix_sum(
            df, "row_id", "v", "ps", bucket_size=16, exclusive=exclusive
        ).select("row_id", "ps")
        assert g.subtract(b).count() == 0 and b.subtract(g).count() == 0, exclusive
    # exclusive: first row is 0
    first = bucketed_prefix_sum(df, "row_id", "v", "ps", 16, exclusive=True).filter(
        "row_id = 0"
    ).collect()
    assert first[0]["ps"] == 0


def test_partitioned_window_matches_global_on_single_partition(spark, stocks):
    one = stocks.withColumn("pk", F.lit(1))
    g = moving_average(stocks, "close", order_by=["row_id"]).select("row_id", "moving_avg")
    p = moving_average(one, "close", order_by=["row_id"], partition_by=["pk"]).select(
        "row_id", "moving_avg"
    )
    assert g.subtract(p).count() == 0 and p.subtract(g).count() == 0
