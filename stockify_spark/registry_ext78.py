"""Round-8 extension wave 67: Kendall's tau-b.

The third rank-correlation in the classical trio (Pearson:
ml-family, Spearman: stats_spearman): tau counts CONCORDANT minus
DISCORDANT pairs — monotone association measured directly on pair
orderings, with the tau-b tie correction dividing by the geometric
mean of the untied pair counts. Everything is integer pair counting,
so the statistic is exact by construction; stats_mann_kendall uses
the same S internally for trend-vs-time, this measures two SERIES
against each other.

Series: monthly order count vs monthly revenue (the stats_granger
pair) — mechanically associated, so tau must land strongly positive.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from stockify_spark.registry import register, _t

_TAU_SQL = """
WITH m AS (
  SELECT (year(o_orderdate) * 12 + month(o_orderdate)) AS ym,
         CAST(COUNT(*) AS BIGINT) AS x,
         ROUND(SUM(o_totalprice), 2) AS y
  FROM orders GROUP BY 1),
p AS (
  SELECT CAST(SUM(CASE WHEN (a.x < b.x AND a.y < b.y)
                         OR (a.x > b.x AND a.y > b.y)
                       THEN 1 ELSE 0 END) AS BIGINT) AS nc,
         CAST(SUM(CASE WHEN (a.x < b.x AND a.y > b.y)
                         OR (a.x > b.x AND a.y < b.y)
                       THEN 1 ELSE 0 END) AS BIGINT) AS nd,
         CAST(SUM(CASE WHEN a.x = b.x AND a.y <> b.y
                       THEN 1 ELSE 0 END) AS BIGINT) AS tx,
         CAST(SUM(CASE WHEN a.y = b.y AND a.x <> b.x
                       THEN 1 ELSE 0 END) AS BIGINT) AS ty,
         CAST(COUNT(*) AS BIGINT) AS n_pairs
  FROM m a JOIN m b ON a.ym < b.ym)
SELECT nc, nd, tx, ty, n_pairs,
       ROUND((nc - nd)
             / sqrt(CAST((nc + nd + tx) AS DOUBLE) * (nc + nd + ty)),
             6) AS tau_b
FROM p
"""


@register("stats_kendall_tau", _TAU_SQL)
def stats_kendall_tau(spark, sf_dir):
    """Tau-b between monthly order count and revenue: one pair join
    over the months-sized series table, five integer pair counts,
    one closed-form division. Pinned in tests/test_ext78.py against
    an O(n^2) reimplementation and the axioms (tau(x,x)=1,
    tau(x,-x)=-1, tie-correction reducing to plain tau when no ties
    exist).

    Scale shape: the pair join is months-squared over the ROLLED-UP
    series (80 rows -> 3160 pairs), never over orders; for very long
    series the O(n log n) merge-sort inversion count drops into an
    applyInPandas without changing the contract. The fact-table work
    is one map-side-combinable aggregate."""
    m = (
        _t(spark, sf_dir, "orders")
        .groupBy(
            (F.year("o_orderdate") * 12 + F.month("o_orderdate")).alias("ym")
        )
        .agg(
            F.count(F.lit(1)).cast("long").alias("x"),
            F.round(F.sum("o_totalprice"), 2).alias("y"),
        )
    )
    a = m.select(
        F.col("ym").alias("ym_a"), F.col("x").alias("xa"), F.col("y").alias("ya")
    )
    b = m.select(
        F.col("ym").alias("ym_b"), F.col("x").alias("xb"), F.col("y").alias("yb")
    )
    pairs = a.join(b, F.col("ym_a") < F.col("ym_b"))
    conc = (
        ((F.col("xa") < F.col("xb")) & (F.col("ya") < F.col("yb")))
        | ((F.col("xa") > F.col("xb")) & (F.col("ya") > F.col("yb")))
    )
    disc = (
        ((F.col("xa") < F.col("xb")) & (F.col("ya") > F.col("yb")))
        | ((F.col("xa") > F.col("xb")) & (F.col("ya") < F.col("yb")))
    )
    p = pairs.agg(
        F.sum(F.when(conc, 1).otherwise(0)).cast("long").alias("nc"),
        F.sum(F.when(disc, 1).otherwise(0)).cast("long").alias("nd"),
        F.sum(
            F.when((F.col("xa") == F.col("xb")) & (F.col("ya") != F.col("yb")), 1).otherwise(0)
        ).cast("long").alias("tx"),
        F.sum(
            F.when((F.col("ya") == F.col("yb")) & (F.col("xa") != F.col("xb")), 1).otherwise(0)
        ).cast("long").alias("ty"),
        F.count(F.lit(1)).cast("long").alias("n_pairs"),
    )
    return p.select(
        "nc",
        "nd",
        "tx",
        "ty",
        "n_pairs",
        F.round(
            (F.col("nc") - F.col("nd"))
            / F.sqrt(
                (F.col("nc") + F.col("nd") + F.col("tx")).cast("double")
                * (F.col("nc") + F.col("nd") + F.col("ty"))
            ),
            6,
        ).alias("tau_b"),
    )
