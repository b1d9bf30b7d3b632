"""Round-8 extension wave 75: risk-adjusted return ratios.

The reference engine's domain is stock analytics; the numbers a
portfolio actually reports are risk-ADJUSTED: Sharpe (excess return
per unit of volatility, 1966) and Sortino (per unit of DOWNSIDE
volatility, 1994 — penalizing only losses, since upside variance is
not risk). Both are closed-form moment ratios over the return
series, annualized by the literal sqrt(252); the downside second
moment is the only asymmetric ingredient.

Series: per-event-type simple returns value_t / value_{t-1} - 1 in
(ts, event_id) order — the engine contract is the construction; on
real OHLCV the same plan runs per symbol.
"""

from __future__ import annotations

import math

from pyspark.sql import Window
from pyspark.sql import functions as F

from stockify_spark.registry import register, _t

_ANN = math.sqrt(252.0)

_RISK_SQL = f"""
WITH s AS (
  SELECT event_type,
         value / NULLIF(LAG(value) OVER (PARTITION BY event_type
                                  ORDER BY ts, event_id), 0) - 1 AS r
  FROM events),
d AS (SELECT event_type, r FROM s WHERE r IS NOT NULL),
m AS (
  SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n,
         ROUND(SUM(r), 6) AS s1,
         ROUND(SUM(r * r), 6) AS s2,
         ROUND(SUM(CASE WHEN r < 0 THEN r * r ELSE 0 END), 6) AS sdown
  FROM d GROUP BY 1)
SELECT event_type, n,
       ROUND(s1 / n, 6) AS mean_r,
       ROUND(sqrt(s2 / n - (s1 / n) * (s1 / n)), 6) AS vol,
       ROUND(sqrt(sdown / n), 6) AS downside_dev,
       ROUND((s1 / n) / sqrt(s2 / n - (s1 / n) * (s1 / n))
             * {_ANN!r}, 6) AS sharpe_ann,
       ROUND((s1 / n) / sqrt(sdown / n) * {_ANN!r}, 6) AS sortino_ann
FROM m
"""


@register("stocks_risk_ratios", _RISK_SQL)
def stocks_risk_ratios(spark, sf_dir):
    """Annualized Sharpe and Sortino per event-type return series:
    one lag window, one four-sum aggregate (6dp-rounded — the only
    order-sensitive reductions), closed-form ratios with the literal
    sqrt(252). Pinned in tests/test_ext86.py against numpy and the
    defining asymmetry: on a positively-skewed return series Sortino
    exceeds Sharpe (upside variance inflates vol but not downside
    deviation), on a negatively-skewed one the order flips, and a
    symmetric series makes downside_dev^2 approach half the raw
    second moment.

    Scale shape: the stats_granger/ar1 layout — a lag window per
    series plus a map-side-combinable aggregate; a million symbols
    are a million groups in the same two jobs."""
    ev = _t(spark, sf_dir, "events").select(
        "event_type", "ts", "event_id", "value"
    )
    w = Window.partitionBy("event_type").orderBy("ts", "event_id")
    # NULLIF guards a zero base price: at sf0.1 the events fixture
    # contains value == 0 rows, and ANSI mode makes the bare divide
    # fatal (found by the r9 full-registry scaling sweep — the sf0.01
    # driver gate never sees a zero). A zero-base return is undefined,
    # so both engines drop it via the same r IS NOT NULL filter.
    d = ev.select(
        "event_type",
        (F.col("value") / F.nullif(F.lag("value").over(w), F.lit(0)) - 1).alias("r"),
    ).filter(F.col("r").isNotNull())
    m = d.groupBy("event_type").agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.round(F.sum("r"), 6).alias("s1"),
        F.round(F.sum(F.col("r") * F.col("r")), 6).alias("s2"),
        F.round(
            F.sum(
                F.when(F.col("r") < 0, F.col("r") * F.col("r")).otherwise(0.0)
            ),
            6,
        ).alias("sdown"),
    )
    mean = F.col("s1") / F.col("n")
    vol = F.sqrt(F.col("s2") / F.col("n") - mean * mean)
    ddev = F.sqrt(F.col("sdown") / F.col("n"))
    return m.select(
        "event_type",
        "n",
        F.round(mean, 6).alias("mean_r"),
        F.round(vol, 6).alias("vol"),
        F.round(ddev, 6).alias("downside_dev"),
        F.round(mean / vol * _ANN, 6).alias("sharpe_ann"),
        F.round(mean / ddev * _ANN, 6).alias("sortino_ann"),
    )
