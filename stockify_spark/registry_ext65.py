"""Round-8 extension wave 54: changepoint localization.

window_cusum scores WHETHER a series drifted; binary segmentation
(Scott & Knott 1974, the recursion inside every changepoint library)
says WHERE: the split t maximizing the two-segment SSE reduction.
The textbook O(n^2) scan collapses to one prefix-sum pass via the
decomposition

  gain(t) = S_t^2/t + (S_n - S_t)^2/(n - t) - S_n^2/n

(S = prefix sums), so every candidate split is scored from the
running sum at that row — the same one-window-pass shape as
window_cusum, and at 100 TB one shuffle on the series key. Running
sums accumulate in frame order on both engines (the window_cusum
precedent), so gains are identical doubles; the argmax compares them
6dp-rounded with a position tie-break.
"""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F

from stockify_spark.registry import register, _t

_CPD_SQL = """
WITH s AS (
  SELECT event_type, value,
         ROW_NUMBER() OVER (PARTITION BY event_type
                            ORDER BY ts, event_id) AS t
  FROM events),
p AS (
  SELECT event_type, t,
         SUM(value) OVER (PARTITION BY event_type ORDER BY t) AS st,
         SUM(value) OVER (PARTITION BY event_type) AS sn,
         COUNT(*) OVER (PARTITION BY event_type) AS n
  FROM s),
g AS (
  SELECT event_type, t, n, st, sn,
         ROUND(st * st / t + (sn - st) * (sn - st) / (n - t)
               - sn * sn / n, 6) AS gain
  FROM p WHERE t < n),
r AS (
  SELECT event_type, t, n, st, sn, gain,
         ROW_NUMBER() OVER (PARTITION BY event_type
                            ORDER BY gain DESC, t) AS rnk
  FROM g)
SELECT event_type, CAST(n AS BIGINT) AS n, CAST(t AS BIGINT) AS t_star,
       gain,
       ROUND(st / t, 6) AS mean_left,
       ROUND((sn - st) / (n - t), 6) AS mean_right
FROM r WHERE rnk = 1
"""


@register("window_changepoint", _CPD_SQL)
def window_changepoint(spark, sf_dir):
    """Strongest mean-shift split per event-type series ((ts,
    event_id) order): the SSE-reduction argmax over all n-1 candidate
    splits, scored from one running sum. Equivalence to the explicit
    two-segment SSE scan, and exact localization on a constructed
    step series (gain peaks AT the step, reduction equals the
    closed-form n_l*n_r/n*(mu_l-mu_r)^2), are pinned in
    tests/test_ext65.py. One level of the binary-segmentation
    recursion — deeper changepoints re-run the same operator on the
    two halves, each again one pass."""
    ev = _t(spark, sf_dir, "events").select(
        "event_type", "ts", "event_id", "value"
    )
    wo = Window.partitionBy("event_type").orderBy("ts", "event_id")
    wt = Window.partitionBy("event_type").orderBy("t")
    wall = Window.partitionBy("event_type")
    s = ev.select(
        "event_type", "value", F.row_number().over(wo).alias("t")
    )
    p = s.select(
        "event_type",
        "t",
        F.sum("value").over(wt).alias("st"),
        F.sum("value").over(wall).alias("sn"),
        F.count(F.lit(1)).over(wall).alias("n"),
    )
    gain = F.round(
        F.col("st") * F.col("st") / F.col("t")
        + (F.col("sn") - F.col("st"))
        * (F.col("sn") - F.col("st"))
        / (F.col("n") - F.col("t"))
        - F.col("sn") * F.col("sn") / F.col("n"),
        6,
    )
    g = p.filter(F.col("t") < F.col("n")).select(
        "event_type", "t", "n", "st", "sn", gain.alias("gain")
    )
    r = g.withColumn(
        "rnk",
        F.row_number().over(
            Window.partitionBy("event_type").orderBy(
                F.col("gain").desc(), "t"
            )
        ),
    )
    return r.filter(F.col("rnk") == 1).select(
        "event_type",
        F.col("n").cast("long").alias("n"),
        F.col("t").cast("long").alias("t_star"),
        "gain",
        F.round(F.col("st") / F.col("t"), 6).alias("mean_left"),
        F.round((F.col("sn") - F.col("st")) / (F.col("n") - F.col("t")), 6).alias(
            "mean_right"
        ),
    )
