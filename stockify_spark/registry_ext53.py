"""Round-8 extension wave 42: Holt-Winters seasonal smoothing.

The third member of the exponential family (EMA -> Holt -> Holt-
Winters; Winters 1960): level + trend + a 12-slot additive seasonal
state, the workhorse for monthly business series. The recursion
carries a season RING — s_{t-12} is consumed and s_t pushed each
step — so the oracle's recursive CTE carries a DOUBLE[12] list (the
window_dtw list-state technique applied to forecasting), while the
Spark face is the applyInPandas-per-series loop of the Holt/Kalman
family.

Float policy: the monthly inputs are ROUND(SUM, 2)-exact decimals
(2dp source data — the orders_holt_forecast argument); the three
initialization statistics (first-year mean level, year-over-year
trend, initial seasonals) are rounded ENGINE-SIDE at 6dp and fed to
the recursion as columns, so no Python rounding (banker's) ever
touches the chain; after initialization both faces run the identical
IEEE sequence and round once at the output.
"""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F

from stockify_spark.registry import register, _t

_AL, _BE, _GA = 0.3, 0.1, 0.2
_M = 12

_HW_SQL = f"""
WITH RECURSIVE rev AS (
  SELECT r.r_name AS region,
         (year(o.o_orderdate) * 12 + month(o.o_orderdate)) AS ym,
         ROUND(SUM(o.o_totalprice), 2) AS z
  FROM orders o JOIN customer c ON c.c_custkey = o.o_custkey
  JOIN nation n ON n.n_nationkey = c.c_nationkey
  JOIN region r ON r.r_regionkey = n.n_regionkey
  GROUP BY 1, 2),
base AS (
  SELECT region, ym, z,
         row_number() OVER (PARTITION BY region ORDER BY ym) AS pos
  FROM rev),
init AS (
  SELECT region,
         ROUND(SUM(CASE WHEN pos <= {_M} THEN z END) / {_M}, 6) AS l0,
         ROUND((SUM(CASE WHEN pos BETWEEN {_M + 1} AND {2 * _M} THEN z END)
                - SUM(CASE WHEN pos <= {_M} THEN z END))
               / {_M * _M}, 6) AS b0
  FROM base WHERE pos <= {2 * _M} GROUP BY 1),
seas AS (
  SELECT b.region,
         list(ROUND(b.z - i.l0, 6) ORDER BY b.pos) AS sl
  FROM base b JOIN init i USING (region) WHERE b.pos <= {_M}
  GROUP BY 1),
r AS (
  SELECT i.region, {_M} AS pos, CAST(NULL AS BIGINT) AS ym,
         CAST(NULL AS DOUBLE) AS z, CAST(NULL AS DOUBLE) AS fitted,
         i.l0 AS l, i.b0 AS b, s.sl AS sl,
         CAST(NULL AS DOUBLE) AS snew
  FROM init i JOIN seas s USING (region)
  UNION ALL
  SELECT region, pos, ym, z, fitted, lnew AS l,
         {_BE} * (lnew - l) + {1 - _BE} * b AS b,
         list_append(sl[2:{_M}], {_GA} * (z - lnew) + {1 - _GA} * sl[1]) AS sl,
         {_GA} * (z - lnew) + {1 - _GA} * sl[1] AS snew
  FROM (
    SELECT r.region, t.pos, t.ym, t.z,
           r.l + r.b + r.sl[1] AS fitted,
           {_AL} * (t.z - r.sl[1]) + {1 - _AL} * (r.l + r.b) AS lnew,
           r.l, r.b, r.sl
    FROM r JOIN base t ON t.region = r.region AND t.pos = r.pos + 1))
SELECT region, CAST(ym AS BIGINT) AS ym, z,
       ROUND(fitted, 6) AS fitted, ROUND(l, 6) AS level,
       ROUND(b, 6) AS trend, ROUND(snew, 6) AS season
FROM r WHERE pos > {_M}
"""


@register("window_holt_winters", _HW_SQL)
def window_holt_winters(spark, sf_dir):
    """Additive Holt-Winters (alpha .3, beta .1, gamma .2, season 12)
    over per-region monthly revenue: l0 = first-year mean, b0 =
    year-over-year monthly trend, s_i = first-year deviations; from
    month 13 on, each step consumes s_{t-12}, emits the one-step-
    ahead fitted value l+b+s_{t-12} (made BEFORE seeing z_t — the
    honest backtest convention of orders_forecast_eval), and pushes
    the refreshed seasonal. Seasonal recovery on a constructed
    sinusoid and fitted-error superiority over seasonless Holt are
    pinned in tests/test_ext53.py.

    Scale shape: one fact-table aggregate (broadcast dim joins),
    then applyInPandas over region series — thousands of series at
    production scale, constant state per series (2 scalars + a
    12-ring). The oracle carries the same ring as DOUBLE[12] through
    the recursive CTE."""
    import pandas as pd

    orders = _t(spark, sf_dir, "orders")
    customer = _t(spark, sf_dir, "customer")
    nation = _t(spark, sf_dir, "nation")
    region = _t(spark, sf_dir, "region")
    rev = (
        orders.join(customer, orders["o_custkey"] == customer["c_custkey"])
        .join(
            F.broadcast(nation),
            customer["c_nationkey"] == nation["n_nationkey"],
        )
        .join(
            F.broadcast(region), nation["n_regionkey"] == region["r_regionkey"]
        )
        .groupBy(
            F.col("r_name").alias("region"),
            (F.year("o_orderdate") * 12 + F.month("o_orderdate")).alias("ym"),
        )
        .agg(F.round(F.sum("o_totalprice"), 2).alias("z"))
        # ~400 rows (5 regions x ~80 months); checkpointing stops the
        # init/seasonal/series consumers from re-expanding the fact
        # join three times (plan-audit catch: 8 scans -> 1)
        .localCheckpoint(eager=False)
    )
    w = Window.partitionBy("region").orderBy("ym")
    base = rev.withColumn("pos", F.row_number().over(w))
    init = (
        base.filter(F.col("pos") <= 2 * _M)
        .groupBy("region")
        .agg(
            F.round(
                F.sum(F.when(F.col("pos") <= _M, F.col("z"))) / _M, 6
            ).alias("l0"),
            F.round(
                (
                    F.sum(
                        F.when(F.col("pos").between(_M + 1, 2 * _M), F.col("z"))
                    )
                    - F.sum(F.when(F.col("pos") <= _M, F.col("z")))
                )
                / (_M * _M),
                6,
            ).alias("b0"),
        )
    )
    df = base.join(F.broadcast(init), "region").withColumn(
        "s_init",
        F.when(F.col("pos") <= _M, F.round(F.col("z") - F.col("l0"), 6)),
    )

    def hw(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values("pos").reset_index(drop=True)
        z = pdf["z"].to_numpy()
        sl = list(pdf["s_init"].to_numpy()[:_M])
        l, b = pdf["l0"].iloc[0], pdf["b0"].iloc[0]
        out = []
        for t in range(_M, len(z)):
            fitted = l + b + sl[0]
            lnew = _AL * (z[t] - sl[0]) + (1 - _AL) * (l + b)
            bnew = _BE * (lnew - l) + (1 - _BE) * b
            snew = _GA * (z[t] - lnew) + (1 - _GA) * sl[0]
            sl = sl[1:] + [snew]
            l, b = lnew, bnew
            out.append(
                (
                    pdf["region"].iloc[0],
                    int(pdf["ym"].iloc[t]),
                    z[t],
                    fitted,
                    l,
                    b,
                    snew,
                )
            )
        return pd.DataFrame(
            out,
            columns=["region", "ym", "z", "fitted", "l", "b", "snew"],
        )

    res = df.groupBy("region").applyInPandas(
        hw,
        schema=(
            "region string, ym long, z double, fitted double,"
            " l double, b double, snew double"
        ),
    )
    return res.select(
        "region",
        "ym",
        "z",
        F.round("fitted", 6).alias("fitted"),
        F.round("l", 6).alias("level"),
        F.round("b", 6).alias("trend"),
        F.round("snew", 6).alias("season"),
    )
