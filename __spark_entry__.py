"""Driver contract for the spark-graft builder (PySpark target).

The driver's verify runs ``entry(spark)`` as a smoke check, runs
each ``queries()[name]`` at sf=0.01 and compares it against the
matching ``oracle_sql()[name]`` via DuckDB (row-count + schema +
order-insensitive value-hash → CORRECTNESS_r{N}.json).

The real surface lives in ``stockify_spark.registry``; this module
stays a thin adapter.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

SMOKE_SF_DIR = "/root/testdata/sf0.001"


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query (SURVEY §7.1): scan → pushed-down filter →
    partial/final global aggregate — experiments 1.x + 2.a of the
    reference (stockify.cu:219-504) in one declarative plan."""
    lineitem = spark.read.parquet(f"{SMOKE_SF_DIR}/lineitem.parquet")
    return (
        lineitem.filter(F.col("l_extendedprice") >= 1000.0)
        .agg(
            F.round(F.sum("l_extendedprice"), 2).alias("sum_price"),
            F.min("l_quantity").alias("min_qty"),
            F.max("l_quantity").alias("max_qty"),
            F.count(F.lit(1)).alias("cnt"),
        )
    )


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    from stockify_spark.registry import QUERIES

    return dict(QUERIES)


def oracle_sql() -> dict[str, str]:
    from stockify_spark.registry import ORACLE

    return dict(ORACLE)
