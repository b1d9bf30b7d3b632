"""Join-operator tests: as-of semantics vs pandas merge_asof ground
truth, bucketed range join vs naive non-equi join."""

from __future__ import annotations

import pandas as pd
import pytest
from pyspark.sql import functions as F

from stockify_spark.operators.joins import asof_join, range_join_bucketed


@pytest.fixture(scope="module")
def trades_quotes(spark):
    trades = spark.createDataFrame(
        [(1, "A", 10.0, 100), (2, "A", 20.0, 250), (3, "B", 30.0, 50), (4, "B", 40.0, 500),
         (5, "C", 50.0, 10)],
        "trade_id long, sym string, price double, t long",
    )
    quotes = spark.createDataFrame(
        [("A", 9.9, 90), ("A", 10.1, 250), ("A", 10.2, 300), ("B", 29.0, 40), ("B", 31.0, 400)],
        "sym string, quote double, t long",
    )
    return trades, quotes


def test_asof_backward_matches_merge_asof(trades_quotes):
    trades, quotes = trades_quotes
    out = asof_join(trades, quotes, key="sym", time_col="t", right_value_cols=["quote"])
    got = {r["trade_id"]: r["asof_quote"] for r in out.collect()}
    tp = trades.toPandas().sort_values("t")
    qp = quotes.toPandas().sort_values("t")
    expected = pd.merge_asof(tp, qp, on="t", by="sym", direction="backward")
    exp = {int(r.trade_id): (None if pd.isna(r.quote) else r.quote) for r in expected.itertuples()}
    assert got == exp
    assert got[2] == 10.1   # tie at t=250 included (<=)
    assert got[5] is None   # no quote for C → left-join null


def test_asof_forward(trades_quotes):
    trades, quotes = trades_quotes
    out = asof_join(
        trades, quotes, key="sym", time_col="t", right_value_cols=["quote"], direction="forward"
    )
    got = {r["trade_id"]: r["asof_quote"] for r in out.collect()}
    assert got[1] == 10.1  # earliest quote at t >= 100 is t=250
    assert got[4] is None  # nothing at t >= 500


def test_range_join_bucketed_equals_naive(spark):
    points = spark.createDataFrame([(i, float(i)) for i in range(50)], "pid long, x double")
    intervals = spark.createDataFrame(
        [(100, 3.0, 7.0), (101, 5.5, 5.9), (102, 40.0, 49.0), (103, 60.0, 70.0)],
        "iid long, lo double, hi double",
    )
    naive = points.join(
        intervals, (F.col("x") >= F.col("lo")) & (F.col("x") <= F.col("hi"))
    ).select("pid", "iid")
    bucketed = range_join_bucketed(points, intervals, "x", "lo", "hi", bucket_width=5.0).select(
        "pid", "iid"
    )
    assert {tuple(r) for r in naive.collect()} == {tuple(r) for r in bucketed.collect()}


def test_salted_join_equals_plain_join_on_skewed_data(spark):
    """salted_join is a physical rewrite: same rows as the plain
    equi-join, even when one key dominates the distribution."""
    from stockify_spark.operators.joins import salted_join

    left = spark.createDataFrame(
        [(1 if i % 10 else i, f"l{i}") for i in range(1000)], "k long, lv string"
    )
    right = spark.createDataFrame([(k, f"r{k}") for k in range(20)], "k long, rv string")
    plain = {tuple(r) for r in left.join(right, "k").collect()}
    salted = {tuple(r) for r in salted_join(left, right, "k", salt=4).collect()}
    assert salted == plain
    assert plain
