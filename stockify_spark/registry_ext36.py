"""Round-8 extension wave 25: equi-depth histograms and
seasonality-adjusted anomaly flags.

Equi-depth is the histogram optimizers actually keep (equal mass per
bucket, boundaries at explicit ranks — no interpolation, the
agg_weighted_median rule); the seasonal-anomaly query composes the
hour-of-day profile with robust MAD thresholds, both sides from
PINNED moments so the flag booleans carry no drift surface."""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F

from stockify_spark.registry import register, _t

_NB = 8  # buckets

_EQUIDEPTH_SQL = f"""
WITH v AS (
  SELECT o_totalprice AS x,
         row_number() OVER (ORDER BY o_totalprice, o_orderkey) AS rn,
         COUNT(*) OVER () AS n
  FROM orders
),
b AS (
  SELECT x, rn, n,
         CAST(LEAST(({_NB} * (rn - 1)) // n, {_NB} - 1) AS BIGINT) AS bucket
  FROM v
)
SELECT bucket, CAST(COUNT(*) AS BIGINT) AS n_rows,
       MIN(x) AS lo, MAX(x) AS hi
FROM b GROUP BY bucket
"""


@register("agg_histogram_equidepth", _EQUIDEPTH_SQL)
def agg_histogram_equidepth(spark, sf_dir):
    """Equi-depth (equal-mass) histogram of order totals in 8
    buckets: bucket = floor(B·(rank−1)/n) on the (value, key)-ranked
    rows — boundaries fall at EXPLICIT ranks, so bucket populations
    differ by at most one and the lo/hi fences are actual data
    values, never interpolated. This is the histogram a cost-based
    optimizer keeps (equal mass ⇒ equal selectivity resolution
    everywhere, unlike agg_histogram's equi-width bins that starve
    dense regions). One global rank window; at scale the same
    construction runs per partition-range with merged fences."""
    orders = _t(spark, sf_dir, "orders")
    w = Window.orderBy("o_totalprice", "o_orderkey")
    v = orders.select(
        F.col("o_totalprice").alias("x"),
        F.row_number().over(w).alias("rn"),
        F.count(F.lit(1)).over(Window.partitionBy()).alias("n"),
    )
    bucket = F.least(
        F.floor(_NB * (F.col("rn") - 1) / F.col("n")), F.lit(_NB - 1)
    ).cast("long")
    return (
        v.select("x", bucket.alias("bucket"))
        .groupBy("bucket")
        .agg(
            F.count(F.lit(1)).alias("n_rows"),
            F.min("x").alias("lo"),
            F.max("x").alias("hi"),
        )
    )


_SEASONAL_SQL = """
WITH prof AS (
  SELECT event_type, CAST(hour(ts) AS BIGINT) AS hr,
         CAST(COUNT(*) AS DOUBLE) AS n,
         ROUND(SUM(value), 6) AS s1
  FROM events GROUP BY 1, 2
),
resid AS (
  SELECT e.event_type, e.event_id, e.value,
         e.value - p.s1 / p.n AS r
  FROM events e
  JOIN prof p ON p.event_type = e.event_type
             AND p.hr = CAST(hour(e.ts) AS BIGINT)
),
mad AS (
  SELECT event_type, r,
         row_number() OVER (PARTITION BY event_type ORDER BY ABS(r)) AS rn,
         COUNT(*) OVER (PARTITION BY event_type) AS n
  FROM resid
),
madv AS (
  SELECT event_type, MIN(ABS(r)) AS mad
  FROM mad
  WHERE rn IN ((n + 1) // 2, (n + 2) // 2)
  GROUP BY event_type
)
SELECT r.event_type, r.event_id, ROUND(r.r, 6) AS residual
FROM resid r JOIN madv m ON m.event_type = r.event_type
WHERE ABS(r.r) > 5 * m.mad
"""


@register("events_seasonal_anomaly", _SEASONAL_SQL)
def events_seasonal_anomaly(spark, sf_dir):
    """Seasonality-adjusted anomaly detection: residual = value
    minus the (type, hour-of-day) mean — the hourly profile from
    6dp-PINNED sums — flagged where |residual| exceeds 5× the
    type's median absolute residual (median by explicit rank
    selection, MIN over the middle pair — a deterministic robust
    scale). The de-seasonalize-then-threshold composition every
    metrics pipeline runs; profile and MAD both broadcast."""
    ev = _t(spark, sf_dir, "events")
    prof = (
        ev.groupBy("event_type", F.hour("ts").cast("long").alias("hr"))
        .agg(
            F.count(F.lit(1)).cast("double").alias("n"),
            F.round(F.sum("value"), 6).alias("s1"),
        )
        .select(
            F.col("event_type").alias("p_type"), "hr", "n", "s1"
        )
    )
    resid = (
        ev.join(
            F.broadcast(prof),
            (F.col("event_type") == F.col("p_type"))
            & (F.hour("ts").cast("long") == F.col("hr")),
        )
        .select(
            "event_type",
            "event_id",
            (F.col("value") - F.col("s1") / F.col("n")).alias("r"),
        )
        .localCheckpoint(eager=False)
    )
    wtype = Window.partitionBy("event_type")
    rk = resid.select(
        "event_type",
        "r",
        F.row_number().over(wtype.orderBy(F.abs("r"))).alias("rn"),
        F.count(F.lit(1)).over(wtype).alias("n"),
    )
    madv = (
        rk.filter(
            (F.col("rn") == F.floor((F.col("n") + 1) / 2))
            | (F.col("rn") == F.floor((F.col("n") + 2) / 2))
        )
        .groupBy("event_type")
        .agg(F.min(F.abs("r")).alias("mad"))
    )
    return (
        resid.join(F.broadcast(madv), "event_type")
        .filter(F.abs("r") > 5 * F.col("mad"))
        .select("event_type", "event_id", F.round("r", 6).alias("residual"))
    )
