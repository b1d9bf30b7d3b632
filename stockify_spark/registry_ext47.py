"""Round-8 extension wave 36: CUPED variance reduction.

The standard online-experimentation estimator (Deng, Xu, Kohavi &
Walker 2013, "Improving the sensitivity of online controlled
experiments"): adjust each unit's experiment-period metric with its
PRE-period covariate, y_cuped = y - theta * (x - mean(x)), theta =
cov(x, y) / var(x). The adjustment subtracts the predictable
between-user variance, shrinking the A/B test's CI by the squared
pre/post correlation — the cheapest sensitivity win in experiment
analytics, and a pure moments computation: two aggregates and a map.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from stockify_spark.registry import register, _t

_SPLIT = "2024-01-16 00:00:00"

_CUPED_SQL = f"""
WITH u AS (
  SELECT user_id,
         ROUND(SUM(CASE WHEN ts < TIMESTAMP '{_SPLIT}'
                        THEN value ELSE 0 END), 6) AS x,
         ROUND(SUM(CASE WHEN ts >= TIMESTAMP '{_SPLIT}'
                        THEN value ELSE 0 END), 6) AS y,
         user_id % 2 AS arm
  FROM events GROUP BY user_id),
m AS (
  SELECT COUNT(*) AS n,
         ROUND(SUM(x), 6) AS sx, ROUND(SUM(y), 6) AS sy,
         ROUND(SUM(x * x), 6) AS sxx, ROUND(SUM(x * y), 6) AS sxy
  FROM u),
t AS (
  SELECT n, sx / n AS xbar,
         (sxy / n - (sx / n) * (sy / n))
         / (sxx / n - (sx / n) * (sx / n)) AS theta
  FROM m),
adj AS (
  SELECT u.arm, u.y, u.y - t.theta * (u.x - t.xbar) AS yc
  FROM u CROSS JOIN t)
SELECT CAST(arm AS BIGINT) AS arm,
       CAST(COUNT(*) AS BIGINT) AS n_users,
       ROUND(ROUND(SUM(y), 6) / COUNT(*), 6) AS mean_y,
       ROUND(ROUND(SUM(yc), 6) / COUNT(*), 6) AS mean_y_cuped,
       ROUND(ROUND(SUM(y * y), 6) / COUNT(*)
             - POW(ROUND(SUM(y), 6) / COUNT(*), 2), 6) AS var_y,
       ROUND(ROUND(SUM(yc * yc), 6) / COUNT(*)
             - POW(ROUND(SUM(yc), 6) / COUNT(*), 2), 6) AS var_y_cuped
FROM adj GROUP BY arm
"""


@register("stats_cuped", _CUPED_SQL)
def stats_cuped(spark, sf_dir):
    """CUPED over the events stream: pre-period (Jan 1-15) per-user
    value sum as the covariate, post-period (Jan 16-30) sum as the
    metric, arms synthesized as user_id parity, theta pooled across
    arms (the standard form — theta is a nuisance parameter, not a
    per-arm estimate). Emits per-arm n, raw and adjusted means, raw
    and adjusted population variances; the variance drop equals the
    squared pre/post correlation (pinned in tests/test_ext47.py,
    along with mean preservation — CUPED must not move the pooled
    mean, only shrink the spread).

    Float policy: per-user sums round at 6dp (first order-sensitive
    reduction), the user-level moments round again at 6dp, and every
    derived quantity (theta, xbar, adjusted values) is then identical
    IEEE arithmetic on identical doubles in both engines.

    Scale shape: one user-level aggregate over the fact stream
    (map-side combinable), one 5-number moment aggregate, one scalar
    broadcast back over the user table, one per-arm rollup — the
    same two-pass moments layout as ml_ridge_closed_form, linear
    end to end."""
    split = F.lit(_SPLIT).cast("timestamp")
    ev = _t(spark, sf_dir, "events").select("user_id", "ts", "value")
    u = ev.groupBy("user_id").agg(
        F.round(
            F.sum(F.when(F.col("ts") < split, F.col("value")).otherwise(0.0)),
            6,
        ).alias("x"),
        F.round(
            F.sum(
                F.when(F.col("ts") >= split, F.col("value")).otherwise(0.0)
            ),
            6,
        ).alias("y"),
        (F.first("user_id") % 2).alias("arm"),
    )
    m = u.agg(
        F.count(F.lit(1)).alias("n"),
        F.round(F.sum("x"), 6).alias("sx"),
        F.round(F.sum("y"), 6).alias("sy"),
        F.round(F.sum(F.col("x") * F.col("x")), 6).alias("sxx"),
        F.round(F.sum(F.col("x") * F.col("y")), 6).alias("sxy"),
    )
    t = m.select(
        (F.col("sx") / F.col("n")).alias("xbar"),
        (
            (F.col("sxy") / F.col("n") - (F.col("sx") / F.col("n")) * (F.col("sy") / F.col("n")))
            / (F.col("sxx") / F.col("n") - (F.col("sx") / F.col("n")) * (F.col("sx") / F.col("n")))
        ).alias("theta"),
    )
    adj = u.crossJoin(F.broadcast(t)).select(
        "arm",
        "y",
        (F.col("y") - F.col("theta") * (F.col("x") - F.col("xbar"))).alias(
            "yc"
        ),
    )
    cnt = F.count(F.lit(1))
    return adj.groupBy(F.col("arm").cast("long").alias("arm")).agg(
        cnt.cast("long").alias("n_users"),
        F.round(F.round(F.sum("y"), 6) / cnt, 6).alias("mean_y"),
        F.round(F.round(F.sum("yc"), 6) / cnt, 6).alias("mean_y_cuped"),
        F.round(
            F.round(F.sum(F.col("y") * F.col("y")), 6) / cnt
            - F.pow(F.round(F.sum("y"), 6) / cnt, 2),
            6,
        ).alias("var_y"),
        F.round(
            F.round(F.sum(F.col("yc") * F.col("yc")), 6) / cnt
            - F.pow(F.round(F.sum("yc"), 6) / cnt, 2),
            6,
        ).alias("var_y_cuped"),
    )
