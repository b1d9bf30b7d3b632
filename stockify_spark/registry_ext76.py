"""Round-8 extension wave 65: ABC/XYZ inventory classification.

The planner's two-axis part segmentation: ABC splits the catalog by
cumulative revenue share (A = the head that earns 80%, B to 95%,
C the tail — orders_pareto's construction applied to parts), XYZ by
demand REGULARITY — the coefficient of variation of monthly demand
(X < 0.5 steady, Y < 1.0 variable, Z erratic). The cross matrix
(AX = automate restocking ... CZ = stock to order) is the textbook
output. Everything is rounded-moment arithmetic plus explicit-rank
prefix shares; the boundary values are pinned by rounding BEFORE
classification (the orders_pareto discipline).
"""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F

from stockify_spark.registry import register, _t

_ABC_SQL = """
WITH pm AS (
  SELECT l_partkey AS part,
         (year(l_shipdate) * 12 + month(l_shipdate)) AS ym,
         ROUND(SUM(l_quantity), 6) AS q,
         ROUND(SUM(l_extendedprice), 2) AS rev
  FROM lineitem GROUP BY 1, 2),
months AS (SELECT CAST(COUNT(DISTINCT ym) AS DOUBLE) AS nm FROM pm),
p AS (
  SELECT part, ROUND(SUM(rev), 2) AS rev,
         ROUND(SUM(q), 6) AS sq, ROUND(SUM(q * q), 6) AS sqq
  FROM pm GROUP BY 1),
x AS (
  SELECT part, rev,
         sq / nm AS mu,
         sqrt(GREATEST(sqq / nm - (sq / nm) * (sq / nm), 0)) AS sigma
  FROM p CROSS JOIN months),
cum AS (
  SELECT part, rev, mu, sigma,
         ROUND(SUM(rev) OVER (ORDER BY rev DESC, part), 2) AS crev,
         ROUND(SUM(rev) OVER (), 2) AS trev
  FROM x),
cls AS (
  SELECT part,
         CASE WHEN crev <= 0.80 * trev THEN 'A'
              WHEN crev <= 0.95 * trev THEN 'B' ELSE 'C' END AS abc,
         CASE WHEN ROUND(sigma / mu, 6) < 0.5 THEN 'X'
              WHEN ROUND(sigma / mu, 6) < 1.0 THEN 'Y'
              ELSE 'Z' END AS xyz
  FROM cum)
SELECT abc, xyz, CAST(COUNT(*) AS BIGINT) AS n_parts
FROM cls GROUP BY 1, 2
"""


@register("orders_abc_xyz", _ABC_SQL)
def orders_abc_xyz(spark, sf_dir):
    """ABC x XYZ census of the part catalog: revenue prefix shares
    in (rev desc, part) order with 2dp-rounded running totals
    (orders_pareto's flip-proofing), demand CV from 6dp-rounded
    monthly moments over the FULL month grid (a part absent in a
    month counts as zero demand — the sums divide by the calendar
    month count, not the part's active months; that zero-inclusion
    is what makes intermittent demand read as erratic). CV bands are
    compared after 6dp rounding. Matrix semantics pinned in
    tests/test_ext76.py against a pandas recomputation plus
    constructed steady/erratic series.

    Scale shape: one (part, month) aggregate, one part rollup, one
    ranked prefix window over the part table (catalog-sized — the
    global-order parity convention; the two-phase distributed form
    is pipeline_token_pack's), one 9-cell census."""
    li = _t(spark, sf_dir, "lineitem").select(
        F.col("l_partkey").alias("part"),
        (F.year("l_shipdate") * 12 + F.month("l_shipdate")).alias("ym"),
        "l_quantity",
        "l_extendedprice",
    )
    pm = li.groupBy("part", "ym").agg(
        F.round(F.sum("l_quantity"), 6).alias("q"),
        F.round(F.sum("l_extendedprice"), 2).alias("rev"),
    )
    months = pm.agg(
        F.countDistinct("ym").cast("double").alias("nm")
    )
    p = pm.groupBy("part").agg(
        F.round(F.sum("rev"), 2).alias("rev"),
        F.round(F.sum("q"), 6).alias("sq"),
        F.round(F.sum(F.col("q") * F.col("q")), 6).alias("sqq"),
    )
    x = p.crossJoin(F.broadcast(months)).select(
        "part",
        "rev",
        (F.col("sq") / F.col("nm")).alias("mu"),
        F.sqrt(
            F.greatest(
                F.col("sqq") / F.col("nm")
                - (F.col("sq") / F.col("nm")) * (F.col("sq") / F.col("nm")),
                F.lit(0.0),
            )
        ).alias("sigma"),
    )
    w = Window.orderBy(F.col("rev").desc(), "part")
    wall = Window.partitionBy().rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing
    )
    cum = x.select(
        "part",
        "mu",
        "sigma",
        F.round(F.sum("rev").over(w), 2).alias("crev"),
        F.round(F.sum("rev").over(wall), 2).alias("trev"),
    )
    cv = F.round(F.col("sigma") / F.col("mu"), 6)
    cls = cum.select(
        F.when(F.col("crev") <= 0.80 * F.col("trev"), "A")
        .when(F.col("crev") <= 0.95 * F.col("trev"), "B")
        .otherwise("C")
        .alias("abc"),
        F.when(cv < 0.5, "X").when(cv < 1.0, "Y").otherwise("Z").alias("xyz"),
    )
    return cls.groupBy("abc", "xyz").agg(
        F.count(F.lit(1)).cast("long").alias("n_parts")
    )
