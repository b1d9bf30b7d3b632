"""Round-8 extension wave 62: Allen's interval algebra.

Allen (1983) proved any two intervals stand in exactly one of 13
qualitative relations (before/meets/overlaps/starts/during/finishes,
their inverses, and equals) — the vocabulary temporal reasoning,
process mining, and interval joins are specified in. The engine op:
classify every (promise-window, ship-window) pair per lineitem into
its relation and census the corpus. Pure date comparisons — a CASE
ladder over four endpoints, integer-exact, embarrassingly parallel —
and the MUTUAL EXCLUSIVITY of the 13 cases is a checkable property:
every pair classifies exactly once.

Intervals: promise window [orderdate, orderdate + orderkey%60 days]
vs ship window [shipdate, shipdate + linenumber*7 days] — the
endpoints are key-derived (the synthetic schema carries no
commit/receipt dates), spanning all 13 relations at assorted
frequencies; "did we ship within/around the promise" rendered as
temporal algebra.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from stockify_spark.registry import register, _t


def _case_sql(a1, a2, b1, b2) -> str:
    return f"""CASE
  WHEN {a2} < {b1} THEN 'before'
  WHEN {b2} < {a1} THEN 'after'
  WHEN {a2} = {b1} AND {a1} < {b1} AND {b2} > {b1} THEN 'meets'
  WHEN {b2} = {a1} AND {b1} < {a1} AND {a2} > {a1} THEN 'met_by'
  WHEN {a1} = {b1} AND {a2} = {b2} THEN 'equals'
  WHEN {a1} = {b1} AND {a2} < {b2} THEN 'starts'
  WHEN {a1} = {b1} AND {a2} > {b2} THEN 'started_by'
  WHEN {a2} = {b2} AND {a1} > {b1} THEN 'finishes'
  WHEN {a2} = {b2} AND {a1} < {b1} THEN 'finished_by'
  WHEN {a1} > {b1} AND {a2} < {b2} THEN 'during'
  WHEN {a1} < {b1} AND {a2} > {b2} THEN 'contains'
  WHEN {a1} < {b1} AND {a2} >= {b1} AND {a2} < {b2} THEN 'overlaps'
  ELSE 'overlapped_by' END"""


_ALLEN_SQL = f"""
WITH iv AS (
  SELECT o.o_orderdate AS a1,
         o.o_orderdate + INTERVAL ((o.o_orderkey % 60)) DAY AS a2,
         l.l_shipdate AS b1,
         l.l_shipdate + INTERVAL ((l.l_linenumber * 7)) DAY AS b2
  FROM lineitem l JOIN orders o ON o.o_orderkey = l.l_orderkey)
SELECT {_case_sql('a1', 'a2', 'b1', 'b2')} AS relation,
       CAST(COUNT(*) AS BIGINT) AS n
FROM iv GROUP BY 1
"""


@register("join_allen_relations", _ALLEN_SQL)
def join_allen_relations(spark, sf_dir):
    """Census of Allen relations between each lineitem's commit
    window [orderdate, commitdate] and ship window [shipdate,
    receiptdate]. The CASE ladder's exhaustiveness and mutual
    exclusivity (each pair lands in exactly one of the 13) is pinned
    in tests/test_ext73.py against an independent per-pair
    classifier plus an exhaustive sweep of all endpoint orderings.

    Scale shape: one broadcast-free equi-join (orders x lineitem on
    the fact key — the tpch join layout) and one 13-cell aggregate;
    the classification is a per-row expression inside whole-stage
    codegen. The same ladder IS the predicate vocabulary for
    interval joins (join_range_bucketed's banding generalizes to any
    subset of relations)."""
    li = _t(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_linenumber", "l_shipdate"
    )
    o = _t(spark, sf_dir, "orders").select("o_orderkey", "o_orderdate")
    iv = li.join(o, li["l_orderkey"] == o["o_orderkey"]).select(
        F.col("o_orderdate").alias("a1"),
        F.date_add(
            "o_orderdate", (F.col("l_orderkey") % 60).cast("int")
        ).alias("a2"),
        F.col("l_shipdate").alias("b1"),
        F.date_add(
            "l_shipdate", (F.col("l_linenumber") * 7).cast("int")
        ).alias("b2"),
    )
    a1, a2, b1, b2 = F.col("a1"), F.col("a2"), F.col("b1"), F.col("b2")
    rel = (
        F.when(a2 < b1, "before")
        .when(b2 < a1, "after")
        .when((a2 == b1) & (a1 < b1) & (b2 > b1), "meets")
        .when((b2 == a1) & (b1 < a1) & (a2 > a1), "met_by")
        .when((a1 == b1) & (a2 == b2), "equals")
        .when((a1 == b1) & (a2 < b2), "starts")
        .when((a1 == b1) & (a2 > b2), "started_by")
        .when((a2 == b2) & (a1 > b1), "finishes")
        .when((a2 == b2) & (a1 < b1), "finished_by")
        .when((a1 > b1) & (a2 < b2), "during")
        .when((a1 < b1) & (a2 > b2), "contains")
        .when((a1 < b1) & (a2 >= b1) & (a2 < b2), "overlaps")
        .otherwise("overlapped_by")
    )
    return iv.groupBy(rel.alias("relation")).agg(
        F.count(F.lit(1)).cast("long").alias("n")
    )
