"""Round-8 extension wave 70: Wald-Wolfowitz runs test.

The nonparametric randomness check (Wald & Wolfowitz 1940): code
each observation as above/below the median, count RUNS (maximal
same-sign streaks); too few runs means clustering/trend, too many
means oscillation. Under randomness the run count is asymptotically
normal with

  mu = 2 n1 n2 / n + 1,
  var = 2 n1 n2 (2 n1 n2 - n) / (n^2 (n - 1)),

all INTEGER-derived, so the z statistic is exact arithmetic — the
ideal differential-oracle shape. Complements the sequential family
(SPRT stops streams, Ljung-Box pools correlations, this one reads
the sign pattern).
"""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F

from stockify_spark.registry import register, _t

_RUNS_SQL = """
WITH s AS (
  SELECT event_type, value,
         ROW_NUMBER() OVER (PARTITION BY event_type
                            ORDER BY ts, event_id) AS rn,
         COUNT(*) OVER (PARTITION BY event_type) AS n
  FROM events),
med AS (
  SELECT event_type, value AS median
  FROM (SELECT event_type, value,
               ROW_NUMBER() OVER (PARTITION BY event_type
                                  ORDER BY value, rn) AS vr,
               n
        FROM s)
  WHERE vr = (n + 1) // 2),
x AS (
  SELECT s.event_type, s.rn,
         CASE WHEN s.value > m.median THEN 1 ELSE 0 END AS above
  FROM s JOIN med m USING (event_type)),
runs AS (
  SELECT event_type,
         CAST(SUM(above) AS BIGINT) AS n1,
         CAST(SUM(1 - above) AS BIGINT) AS n2,
         CAST(1 + SUM(CASE WHEN above <> prev THEN 1 ELSE 0 END)
              AS BIGINT) AS r
  FROM (SELECT event_type, above,
               LAG(above) OVER (PARTITION BY event_type ORDER BY rn) AS prev
        FROM x)
  GROUP BY 1)
SELECT event_type, n1, n2, r,
       ROUND((r - (2.0 * n1 * n2 / (n1 + n2) + 1))
             / sqrt(2.0 * n1 * n2 * (2.0 * n1 * n2 - (n1 + n2))
                    / (CAST(n1 + n2 AS DOUBLE) * (n1 + n2)
                       * (n1 + n2 - 1))), 6) AS z
FROM runs
"""


@register("stats_runs_test", _RUNS_SQL)
def stats_runs_test(spark, sf_dir):
    """Runs test per event-type value series in (ts, event_id)
    order, dichotomized at the explicit-rank median ((n+1)//2-th by
    (value, position) — the agg_exact_median rank discipline, with
    ties going to the 'not above' side). Emits the above/below
    counts, the run count, and the normal z. The closed-form moments
    and both failure directions (a sorted series -> huge negative z,
    an alternating series -> huge positive z, a shuffled one -> |z|
    small) are pinned in tests/test_ext81.py.

    Scale shape: one rank window for the median fence, one lag
    window for run boundaries, one integer aggregate — the
    stats_sprt layout, one pass per series at any scale."""
    ev = _t(spark, sf_dir, "events").select(
        "event_type", "ts", "event_id", "value"
    )
    wt = Window.partitionBy("event_type").orderBy("ts", "event_id")
    s = ev.select(
        "event_type",
        "value",
        F.row_number().over(wt).alias("rn"),
        F.count(F.lit(1)).over(Window.partitionBy("event_type")).alias("n"),
    )
    med = (
        s.withColumn(
            "vr",
            F.row_number().over(
                Window.partitionBy("event_type").orderBy("value", "rn")
            ),
        )
        .filter(F.col("vr") == F.expr("(n + 1) div 2"))
        .select("event_type", F.col("value").alias("median"))
    )
    x = s.join(F.broadcast(med), "event_type").select(
        "event_type",
        "rn",
        F.when(F.col("value") > F.col("median"), 1).otherwise(0).alias("above"),
    )
    lagd = x.withColumn(
        "prev",
        F.lag("above").over(Window.partitionBy("event_type").orderBy("rn")),
    )
    runs = lagd.groupBy("event_type").agg(
        F.sum("above").cast("long").alias("n1"),
        F.sum(1 - F.col("above")).cast("long").alias("n2"),
        (
            1
            + F.sum(
                F.when(F.col("above") != F.col("prev"), 1).otherwise(0)
            )
        )
        .cast("long")
        .alias("r"),
    )
    n = (F.col("n1") + F.col("n2")).cast("double")
    mu = 2.0 * F.col("n1") * F.col("n2") / n + 1
    var = (
        2.0
        * F.col("n1")
        * F.col("n2")
        * (2.0 * F.col("n1") * F.col("n2") - n)
        / (n * n * (n - 1))
    )
    return runs.select(
        "event_type",
        "n1",
        "n2",
        "r",
        F.round((F.col("r") - mu) / F.sqrt(var), 6).alias("z"),
    )
