"""Round-8 extension wave 69: Ljung-Box portmanteau test.

window_acf reports the autocorrelations; the Ljung-Box Q statistic
(Ljung & Box 1978) answers the question they raise — "is this series
white noise?" — by pooling the first h lags:

  Q = n (n + 2) * sum_{k=1..h} rho_k^2 / (n - k)  ~  chi2(h) under H0.

The residual-whiteness check every fitted forecast model
(orders_holt_forecast, window_holt_winters, window_ar1_halflife)
owes its user. h = 3 here; the 5% chi2(3) fence 7.814728 is a
literal, so no distribution function runs in-engine.
"""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F

from stockify_spark.registry import register, _t

_H = 3
_CHI2_3_95 = 7.814728  # chi2(3) 0.95 quantile, literal

_LB_SQL = f"""
WITH s AS (
  SELECT event_type, value,
         LAG(value, 1) OVER w AS l1,
         LAG(value, 2) OVER w AS l2,
         LAG(value, 3) OVER w AS l3,
         COUNT(*) OVER (PARTITION BY event_type) AS n
  FROM events
  WINDOW w AS (PARTITION BY event_type ORDER BY ts, event_id)),
r AS (
  SELECT event_type, MAX(n) AS n,
         ROUND(corr(value, l1), 6) AS rho1,
         ROUND(corr(value, l2), 6) AS rho2,
         ROUND(corr(value, l3), 6) AS rho3
  FROM s GROUP BY 1)
SELECT event_type, CAST(n AS BIGINT) AS n, rho1, rho2, rho3,
       ROUND(n * (n + 2.0)
             * (rho1 * rho1 / (n - 1) + rho2 * rho2 / (n - 2)
                + rho3 * rho3 / (n - 3)), 6) AS q_stat,
       n * (n + 2.0)
         * (rho1 * rho1 / (n - 1) + rho2 * rho2 / (n - 2)
            + rho3 * rho3 / (n - 3)) > {_CHI2_3_95!r} AS reject_white_noise
FROM r
"""


@register("window_ljung_box", _LB_SQL)
def window_ljung_box(spark, sf_dir):
    """Ljung-Box Q (h=3) per event-type series in (ts, event_id)
    order: lag correlations rounded at 6dp BEFORE pooling (the only
    cross-engine-ordered reduction is inside corr), then the Q
    closed form and the literal chi2 fence. Pinned against a numpy
    reimplementation plus behavioral checks in tests/test_ext80.py:
    white noise passes, an AR(1) series is rejected decisively, and
    Q grows with |rho| monotonically.

    Scale shape: one window pass for the three lag columns (single
    shuffle on the series key), one corr aggregate per lag —
    map-side-combinable moment sums — and scalar arithmetic; the
    same plan at any series count."""
    ev = _t(spark, sf_dir, "events").select(
        "event_type", "ts", "event_id", "value"
    )
    w = Window.partitionBy("event_type").orderBy("ts", "event_id")
    s = ev.select(
        "event_type",
        "value",
        F.lag("value", 1).over(w).alias("l1"),
        F.lag("value", 2).over(w).alias("l2"),
        F.lag("value", 3).over(w).alias("l3"),
        F.count(F.lit(1))
        .over(Window.partitionBy("event_type"))
        .alias("n"),
    )
    r = s.groupBy("event_type").agg(
        F.max("n").alias("n"),
        F.round(F.corr("value", "l1"), 6).alias("rho1"),
        F.round(F.corr("value", "l2"), 6).alias("rho2"),
        F.round(F.corr("value", "l3"), 6).alias("rho3"),
    )
    q = (
        F.col("n")
        * (F.col("n") + 2.0)
        * (
            F.col("rho1") * F.col("rho1") / (F.col("n") - 1)
            + F.col("rho2") * F.col("rho2") / (F.col("n") - 2)
            + F.col("rho3") * F.col("rho3") / (F.col("n") - 3)
        )
    )
    return r.select(
        "event_type",
        F.col("n").cast("long").alias("n"),
        "rho1",
        "rho2",
        "rho3",
        F.round(q, 6).alias("q_stat"),
        (q > _CHI2_3_95).alias("reject_white_noise"),
    )
