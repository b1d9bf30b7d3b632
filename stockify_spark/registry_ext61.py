"""Round-8 extension wave 50: split-conformal prediction intervals.

Conformal prediction (Vovk et al. 2005; Lei et al. 2018 split form)
is the distribution-free answer to "how wrong is my model": fit on a
train split, score absolute residuals on a held-out calibration
split, and inflate every prediction by the ceil((n+1)(1-alpha))-th
smallest calibration residual. The resulting intervals cover the
truth with probability >= 1-alpha under exchangeability alone — no
Gaussian assumption, any model. It is pure order statistics, so the
engine form is exact: an explicit-rank quantile (the
agg_histogram_equidepth discipline) over the calibration scores,
broadcast to the test rows.

Model under test: predict o_totalprice by the train-split mean of
the order's priority class — deliberately crude, because conformal's
guarantee holds regardless and the WIDTH exposes model quality.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from stockify_spark.registry import register, _t

_ALPHA = 0.1

_CONF_SQL = f"""
WITH d AS (
  SELECT o_orderkey AS k, o_orderpriority AS pri, o_totalprice AS y,
         o_orderkey % 4 AS fold
  FROM orders),
model AS (
  SELECT pri, ROUND(SUM(y), 6) / COUNT(*) AS pred
  FROM d WHERE fold IN (0, 2) GROUP BY 1),
calib AS (
  SELECT abs(d.y - m.pred) AS score
  FROM d JOIN model m USING (pri) WHERE d.fold = 1),
q AS (
  SELECT score AS qhat
  FROM (SELECT score, ROW_NUMBER() OVER (ORDER BY score) AS r,
               COUNT(*) OVER () AS n
        FROM calib)
  WHERE r = CAST(ceil((n + 1) * {1 - _ALPHA}) AS BIGINT)),
test AS (
  SELECT d.k, d.pri, d.y, m.pred
  FROM d JOIN model m USING (pri) WHERE d.fold = 3)
SELECT k AS o_orderkey, pri AS priority,
       ROUND(pred, 6) AS pred,
       ROUND(pred - qhat, 6) AS lo,
       ROUND(pred + qhat, 6) AS hi,
       (y >= pred - qhat AND y <= pred + qhat) AS covered
FROM test CROSS JOIN q
"""


@register("stats_conformal_interval", _CONF_SQL)
def stats_conformal_interval(spark, sf_dir):
    """Split-conformal 90% intervals for order totals: train on folds
    0/2 (per-priority mean), calibrate on fold 1 (absolute
    residuals), emit per-test-row (fold 3) intervals and coverage
    flags. qhat is the explicit-rank ceil((n+1)*0.9) order statistic
    — no interpolation, so both engines pick the same calibration
    row. The finite-sample guarantee (empirical coverage >= ~90% on
    the exchangeable synthetic data) and the rank rule itself are
    pinned in tests/test_ext61.py.

    Scale shape: one train aggregate (groups-sized), one calibration
    scoring pass, one rank window over calibration scores (at 100 TB
    the explicit-rank quantile is a two-phase distributed selection
    — the agg_exact_median machinery — or calibration subsamples,
    which conformal theory explicitly permits), then a map over test
    rows with two broadcast scalars."""
    d = _t(spark, sf_dir, "orders").select(
        F.col("o_orderkey").alias("k"),
        F.col("o_orderpriority").alias("pri"),
        F.col("o_totalprice").alias("y"),
        (F.col("o_orderkey") % 4).alias("fold"),
    )
    model = (
        d.filter(F.col("fold").isin(0, 2))
        .groupBy("pri")
        .agg((F.round(F.sum("y"), 6) / F.count(F.lit(1))).alias("pred"))
    )
    calib = (
        d.filter(F.col("fold") == 1)
        .join(F.broadcast(model), "pri")
        .select(F.abs(F.col("y") - F.col("pred")).alias("score"))
    )
    from pyspark.sql import Window

    ranked = calib.select(
        "score",
        F.row_number().over(Window.orderBy("score")).alias("r"),
        F.count(F.lit(1))
        .over(
            Window.partitionBy().rowsBetween(
                Window.unboundedPreceding, Window.unboundedFollowing
            )
        )
        .alias("n"),
    )
    q = ranked.filter(
        F.col("r")
        == F.ceil((F.col("n") + 1) * F.lit(1 - _ALPHA)).cast("long")
    ).select(F.col("score").alias("qhat"))
    test = d.filter(F.col("fold") == 3).join(F.broadcast(model), "pri")
    return test.crossJoin(F.broadcast(q)).select(
        F.col("k").alias("o_orderkey"),
        F.col("pri").alias("priority"),
        F.round("pred", 6).alias("pred"),
        F.round(F.col("pred") - F.col("qhat"), 6).alias("lo"),
        F.round(F.col("pred") + F.col("qhat"), 6).alias("hi"),
        (
            (F.col("y") >= F.col("pred") - F.col("qhat"))
            & (F.col("y") <= F.col("pred") + F.col("qhat"))
        ).alias("covered"),
    )
