"""Aggregate-operator properties: the approximate scale paths
(quantile sketch, HyperLogLog) must land within their documented error
bounds of the exact answers they replace."""

from __future__ import annotations

from pyspark.sql import functions as F

from stockify_spark.sources.io import load_table

SF = "/root/testdata/sf0.01"


def test_percentile_approx_within_bound(spark):
    li = load_table(spark, SF, "lineitem")
    row = li.agg(
        F.expr("percentile(l_extendedprice, 0.5)").alias("exact50"),
        F.percentile_approx("l_extendedprice", 0.5, 10000).alias("approx50"),
        F.expr("percentile(l_extendedprice, 0.95)").alias("exact95"),
        F.percentile_approx("l_extendedprice", 0.95, 10000).alias("approx95"),
    ).collect()[0]
    assert abs(row["approx50"] - row["exact50"]) / row["exact50"] < 0.01
    assert abs(row["approx95"] - row["exact95"]) / row["exact95"] < 0.01


def test_approx_count_distinct_within_bound(spark):
    li = load_table(spark, SF, "lineitem")
    row = li.agg(
        F.countDistinct("l_orderkey").alias("exact"),
        F.approx_count_distinct("l_orderkey", 0.02).alias("approx"),
    ).collect()[0]
    # HLL++ at rsd=0.02: allow 3 sigma
    assert abs(row["approx"] - row["exact"]) / row["exact"] < 0.06
