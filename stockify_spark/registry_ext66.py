"""Round-8 extension wave 55: price index numbers.

The index-number problem (how much of revenue growth is PRICE?) has
three classical answers: Laspeyres (base-period basket — overstates
inflation), Paasche (current basket — understates), and Fisher's
ideal index (their geometric mean, the one national statistics
agencies publish). All are ratios of basket-weighted price sums over
the parts present in both periods:

  L_t = sum(p_t * q_0) / sum(p_0 * q_0)
  P_t = sum(p_t * q_t) / sum(p_0 * q_t)
  F_t = sqrt(L_t * P_t)

Per-part monthly prices are quantity-weighted unit values (the
standard unit-value index construction when transactions, not quoted
prices, are the source).
"""

from __future__ import annotations

from pyspark.sql import functions as F

from stockify_spark.registry import register, _t

_IDX_SQL = """
WITH m AS (
  SELECT l_partkey AS part,
         (year(l_shipdate) * 12 + month(l_shipdate)) AS ym,
         ROUND(SUM(l_extendedprice), 6) / SUM(l_quantity) AS p,
         ROUND(SUM(l_quantity), 6) AS q
  FROM lineitem GROUP BY 1, 2),
base AS (
  SELECT part, p AS p0, q AS q0
  FROM m WHERE ym = (SELECT MIN(ym) FROM m)),
j AS (
  SELECT m.ym, m.part, m.p, m.q, b.p0, b.q0
  FROM m JOIN base b USING (part)
  WHERE m.ym > (SELECT MIN(ym) FROM m)),
agg AS (
  SELECT ym,
         CAST(COUNT(*) AS BIGINT) AS n_parts,
         ROUND(SUM(p * q0), 6) AS ptq0,
         ROUND(SUM(p0 * q0), 6) AS p0q0,
         ROUND(SUM(p * q), 6) AS ptqt,
         ROUND(SUM(p0 * q), 6) AS p0qt
  FROM j GROUP BY 1)
SELECT CAST(ym AS BIGINT) AS ym, n_parts,
       ROUND(ptq0 / p0q0, 6) AS laspeyres,
       ROUND(ptqt / p0qt, 6) AS paasche,
       ROUND(sqrt((ptq0 / p0q0) * (ptqt / p0qt)), 6) AS fisher
FROM agg
"""


@register("orders_price_index", _IDX_SQL)
def orders_price_index(spark, sf_dir):
    """Monthly Laspeyres/Paasche/Fisher price indexes over lineitem
    unit values, base = the first shipping month, computed over the
    parts present in both the base and the current month (the
    matched-sample convention). Fisher sits between its two bounds
    by construction (geometric mean — pinned in tests/test_ext66.py
    together with a numpy reimplementation and the homogeneity
    property: doubling all current prices doubles L and P exactly).

    Scale shape: one (part, month) aggregate over the fact table
    (map-side combinable), a broadcast-sized base join (parts
    table), and a months-sized rollup. TPC-H prices are synthetic
    and flat, so the indexes hover near 1 — the engine contract is
    the construction, and the oracle hash-checks every month."""
    li = _t(spark, sf_dir, "lineitem").select(
        F.col("l_partkey").alias("part"),
        (F.year("l_shipdate") * 12 + F.month("l_shipdate")).alias("ym"),
        "l_extendedprice",
        "l_quantity",
    )
    m = li.groupBy("part", "ym").agg(
        (
            F.round(F.sum("l_extendedprice"), 6) / F.sum("l_quantity")
        ).alias("p"),
        F.round(F.sum("l_quantity"), 6).alias("q"),
    )
    first = m.agg(F.min("ym").alias("ym0"))
    base = (
        m.crossJoin(F.broadcast(first))
        .filter(F.col("ym") == F.col("ym0"))
        .select("part", F.col("p").alias("p0"), F.col("q").alias("q0"))
    )
    j = (
        m.crossJoin(F.broadcast(first))
        .filter(F.col("ym") > F.col("ym0"))
        .join(base, "part")
    )
    agg = j.groupBy("ym").agg(
        F.count(F.lit(1)).cast("long").alias("n_parts"),
        F.round(F.sum(F.col("p") * F.col("q0")), 6).alias("ptq0"),
        F.round(F.sum(F.col("p0") * F.col("q0")), 6).alias("p0q0"),
        F.round(F.sum(F.col("p") * F.col("q")), 6).alias("ptqt"),
        F.round(F.sum(F.col("p0") * F.col("q")), 6).alias("p0qt"),
    )
    las = F.col("ptq0") / F.col("p0q0")
    paa = F.col("ptqt") / F.col("p0qt")
    return agg.select(
        F.col("ym").cast("long").alias("ym"),
        "n_parts",
        F.round(las, 6).alias("laspeyres"),
        F.round(paa, 6).alias("paasche"),
        F.round(F.sqrt(las * paa), 6).alias("fisher"),
    )
