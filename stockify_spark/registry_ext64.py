"""Round-8 extension wave 53: Granger causality (lag-1).

Granger's test (1969): x "Granger-causes" y if lagged x improves the
prediction of y beyond lagged y alone — an F-test between the
restricted model y_t ~ y_{t-1} and the full model y_t ~ y_{t-1} +
x_{t-1}. With one added regressor the whole test is closed-form
linear algebra over centered second moments (a 2x2 Cramer solve —
the ml_ridge_closed_form discipline), so both engines derive the
F statistic from ten rounded sums and identical IEEE arithmetic.

Series under test: monthly order COUNT (x, hundreds) vs monthly
revenue (y, millions) — mechanically coupled in the synthetic data
(revenue is a sum over orders). The unit scaling is load-bearing for
cross-engine exactness: raw revenue moments reach 1e18, where a
double's ulp (~128) dwarfs 6dp rounding and engine accumulation
order leaks into the centered differences; at millions the moments
sit near 1e6 and the rounding policy actually pins them. The F
statistic is invariant under the rescaling (both RSS scale by the
same factor squared).
"""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F

from stockify_spark.registry import register, _t

_GRANGER_SQL = """
WITH m AS (
  SELECT (year(o_orderdate) * 12 + month(o_orderdate)) AS ym,
         CAST(COUNT(*) AS DOUBLE) / 100 AS x,
         ROUND(SUM(o_totalprice), 2) / 1000000 AS y
  FROM orders GROUP BY 1),
l AS (
  SELECT y,
         LAG(y) OVER (ORDER BY ym) AS y1,
         LAG(x) OVER (ORDER BY ym) AS x1
  FROM m),
d AS (SELECT y, y1, x1 FROM l WHERE y1 IS NOT NULL),
s AS (
  SELECT CAST(COUNT(*) AS BIGINT) AS n,
         ROUND(SUM(y), 6) AS sy, ROUND(SUM(y1), 6) AS sy1,
         ROUND(SUM(x1), 6) AS sx1,
         ROUND(SUM(y * y), 6) AS syy,
         ROUND(SUM(y1 * y1), 6) AS sy1y1,
         ROUND(SUM(x1 * x1), 6) AS sx1x1,
         ROUND(SUM(y1 * x1), 6) AS sy1x1,
         ROUND(SUM(y * y1), 6) AS syy1,
         ROUND(SUM(y * x1), 6) AS syx1
  FROM d),
c AS (
  SELECT n,
         syy - sy * sy / n AS cyy,
         sy1y1 - sy1 * sy1 / n AS c11,
         sx1x1 - sx1 * sx1 / n AS c22,
         sy1x1 - sy1 * sx1 / n AS c12,
         syy1 - sy * sy1 / n AS r1,
         syx1 - sy * sx1 / n AS r2
  FROM s),
f AS (
  SELECT n, cyy, c11, c22, c12, r1, r2,
         (r1 * c22 - r2 * c12) / (c11 * c22 - c12 * c12) AS bf,
         (r2 * c11 - r1 * c12) / (c11 * c22 - c12 * c12) AS cf,
         r1 / c11 AS br
  FROM c)
SELECT n,
       ROUND(br, 6) AS beta_restricted,
       ROUND(bf, 6) AS beta_y_lag,
       ROUND(cf, 6) AS beta_x_lag,
       ROUND(cyy - br * r1, 6) AS rss_restricted,
       ROUND(cyy - bf * r1 - cf * r2, 6) AS rss_full,
       ROUND(((cyy - br * r1) - (cyy - bf * r1 - cf * r2))
             * (n - 3) / (cyy - bf * r1 - cf * r2), 6) AS f_stat
FROM f
"""


@register("stats_granger", _GRANGER_SQL)
def stats_granger(spark, sf_dir):
    """Lag-1 Granger test of monthly order count on monthly revenue:
    centered moments from ten 6dp-rounded sums, restricted and full
    OLS in closed form (demeaning absorbs the intercept, so the full
    model is a 2x2 Cramer solve), F = (RSS_r - RSS_f)(n-3)/RSS_f.
    Pinned against numpy lstsq in tests/test_ext64.py, including
    the two structural identities the algebra must satisfy: RSS_f <=
    RSS_r always (an extra regressor never hurts in-sample) and
    F >= 0.

    Scale shape: one monthly aggregate over the fact table, a lag
    window over the months-sized series, one 10-sum aggregate, and
    scalar arithmetic — the ml_ridge/ml_logreg moments layout; the
    data-sized work is a single map-side-combinable groupBy however
    large orders grows."""
    m = (
        _t(spark, sf_dir, "orders")
        .groupBy(
            (F.year("o_orderdate") * 12 + F.month("o_orderdate")).alias("ym")
        )
        .agg(
            (F.count(F.lit(1)).cast("double") / 100).alias("x"),
            (F.round(F.sum("o_totalprice"), 2) / 1000000).alias("y"),
        )
    )
    w = Window.orderBy("ym")
    d = (
        m.select(
            "y",
            F.lag("y").over(w).alias("y1"),
            F.lag("x").over(w).alias("x1"),
        )
        .filter(F.col("y1").isNotNull())
    )
    s = d.agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.round(F.sum("y"), 6).alias("sy"),
        F.round(F.sum("y1"), 6).alias("sy1"),
        F.round(F.sum("x1"), 6).alias("sx1"),
        F.round(F.sum(F.col("y") * F.col("y")), 6).alias("syy"),
        F.round(F.sum(F.col("y1") * F.col("y1")), 6).alias("sy1y1"),
        F.round(F.sum(F.col("x1") * F.col("x1")), 6).alias("sx1x1"),
        F.round(F.sum(F.col("y1") * F.col("x1")), 6).alias("sy1x1"),
        F.round(F.sum(F.col("y") * F.col("y1")), 6).alias("syy1"),
        F.round(F.sum(F.col("y") * F.col("x1")), 6).alias("syx1"),
    )
    c = s.select(
        "n",
        (F.col("syy") - F.col("sy") * F.col("sy") / F.col("n")).alias("cyy"),
        (F.col("sy1y1") - F.col("sy1") * F.col("sy1") / F.col("n")).alias("c11"),
        (F.col("sx1x1") - F.col("sx1") * F.col("sx1") / F.col("n")).alias("c22"),
        (F.col("sy1x1") - F.col("sy1") * F.col("sx1") / F.col("n")).alias("c12"),
        (F.col("syy1") - F.col("sy") * F.col("sy1") / F.col("n")).alias("r1"),
        (F.col("syx1") - F.col("sy") * F.col("sx1") / F.col("n")).alias("r2"),
    )
    det = F.col("c11") * F.col("c22") - F.col("c12") * F.col("c12")
    f = c.select(
        "n",
        "cyy",
        "r1",
        "r2",
        ((F.col("r1") * F.col("c22") - F.col("r2") * F.col("c12")) / det).alias(
            "bf"
        ),
        ((F.col("r2") * F.col("c11") - F.col("r1") * F.col("c12")) / det).alias(
            "cf"
        ),
        (F.col("r1") / F.col("c11")).alias("br"),
    )
    rss_r = F.col("cyy") - F.col("br") * F.col("r1")
    rss_f = F.col("cyy") - F.col("bf") * F.col("r1") - F.col("cf") * F.col("r2")
    return f.select(
        "n",
        F.round("br", 6).alias("beta_restricted"),
        F.round("bf", 6).alias("beta_y_lag"),
        F.round("cf", 6).alias("beta_x_lag"),
        F.round(rss_r, 6).alias("rss_restricted"),
        F.round(rss_f, 6).alias("rss_full"),
        F.round((rss_r - rss_f) * (F.col("n") - 3) / rss_f, 6).alias("f_stat"),
    )
