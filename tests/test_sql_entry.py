"""SQL entry point (SURVEY §3.4 B): every table is reachable as a
view, and a spark.sql formulation must produce exactly what the
DataFrame formulation produces — same Catalyst pipeline after the
parse."""

from __future__ import annotations

from stockify_spark.registry import QUERIES
from stockify_spark.sources.io import TABLES, register_views

SF = "/root/testdata/sf0.001"

Q1_SQL = """
SELECT l_returnflag, l_linestatus,
       ROUND(SUM(l_quantity), 2) AS sum_qty,
       ROUND(SUM(l_extendedprice), 2) AS sum_base_price,
       ROUND(SUM(l_extendedprice * (1 - l_discount)), 2) AS sum_disc_price,
       ROUND(SUM(l_extendedprice * (1 - l_discount) * (1 + l_tax)), 2) AS sum_charge,
       ROUND(AVG(l_quantity), 6) AS avg_qty,
       ROUND(AVG(l_extendedprice), 6) AS avg_price,
       ROUND(AVG(l_discount), 6) AS avg_disc,
       COUNT(*) AS count_order
FROM lineitem
WHERE l_shipdate <= TIMESTAMP '2000-01-01'
GROUP BY l_returnflag, l_linestatus
"""


def test_all_tables_registered_as_views(spark):
    register_views(spark, SF)
    for t in TABLES:
        assert spark.sql(f"SELECT * FROM {t} LIMIT 1").count() in (0, 1)


def test_sql_q1_matches_dataframe_q1(spark):
    register_views(spark, SF)
    via_sql = {tuple(r) for r in spark.sql(Q1_SQL).collect()}
    via_df = {tuple(r) for r in QUERIES["groupby_q1"](spark, SF).collect()}
    assert via_sql == via_df
    assert via_sql
