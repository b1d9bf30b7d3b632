"""Round-8 extension wave 56: AR(1) mean-reversion half-life.

The quant's first question about a series: does it revert, and how
fast? Fit v_t = a + b*v_{t-1} (one centered-moments OLS per series);
for 0 < b < 1 the deviation from equilibrium decays like b^k, so the
half-life is -ln(2)/ln(b) observations — the number pairs-trading
and inventory-policy models consume directly. b >= 1 (no reversion)
or b <= 0 (oscillation) yield a NULL half-life rather than a
misleading number.
"""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F

from stockify_spark.registry import register, _t

_AR1_SQL = """
WITH s AS (
  SELECT event_type, value,
         LAG(value) OVER (PARTITION BY event_type
                          ORDER BY ts, event_id) AS v1
  FROM events),
d AS (SELECT event_type, value AS v, v1 FROM s WHERE v1 IS NOT NULL),
m AS (
  SELECT event_type,
         CAST(COUNT(*) AS BIGINT) AS n,
         ROUND(SUM(v), 6) AS sv, ROUND(SUM(v1), 6) AS sv1,
         ROUND(SUM(v * v1), 6) AS svv1,
         ROUND(SUM(v1 * v1), 6) AS sv1v1
  FROM d GROUP BY 1),
b AS (
  SELECT event_type, n,
         (svv1 - sv * sv1 / n) / (sv1v1 - sv1 * sv1 / n) AS beta
  FROM m)
SELECT event_type, n, ROUND(beta, 6) AS beta,
       CASE WHEN beta > 0 AND beta < 1
            THEN ROUND(-ln(2) / ln(beta), 6) END AS half_life
FROM b
"""


@register("window_ar1_halflife", _AR1_SQL)
def window_ar1_halflife(spark, sf_dir):
    """Per-event-type AR(1) coefficient and mean-reversion half-life
    from centered 6dp-rounded moments ((ts, event_id) order for the
    lag). The estimator and the decay semantics — a synthetic AR(1)
    with known b recovers it, and its deviations really do halve
    every -ln2/ln(b) steps — are pinned in tests/test_ext67.py.

    Scale shape: one lag window per series plus one five-sum
    aggregate — the stats_granger layout without the second model;
    millions of series are just more groups."""
    ev = _t(spark, sf_dir, "events").select(
        "event_type", "ts", "event_id", "value"
    )
    w = Window.partitionBy("event_type").orderBy("ts", "event_id")
    d = ev.select(
        "event_type",
        F.col("value").alias("v"),
        F.lag("value").over(w).alias("v1"),
    ).filter(F.col("v1").isNotNull())
    m = d.groupBy("event_type").agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.round(F.sum("v"), 6).alias("sv"),
        F.round(F.sum("v1"), 6).alias("sv1"),
        F.round(F.sum(F.col("v") * F.col("v1")), 6).alias("svv1"),
        F.round(F.sum(F.col("v1") * F.col("v1")), 6).alias("sv1v1"),
    )
    beta = (F.col("svv1") - F.col("sv") * F.col("sv1") / F.col("n")) / (
        F.col("sv1v1") - F.col("sv1") * F.col("sv1") / F.col("n")
    )
    b = m.select("event_type", "n", beta.alias("beta"))
    return b.select(
        "event_type",
        "n",
        F.round("beta", 6).alias("beta"),
        F.when(
            (F.col("beta") > 0) & (F.col("beta") < 1),
            F.round(-F.log(F.lit(2.0)) / F.log("beta"), 6),
        ).alias("half_life"),
    )
