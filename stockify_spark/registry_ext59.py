"""Round-8 extension wave 48: decision stump by information gain.

The inner loop of every tree learner (CART/C4.5; Quinlan 1986):
evaluate candidate thresholds on a feature and keep the split
maximizing information gain. The scale-correct formulation never
rescans per candidate: group by distinct feature value, take ONE
cumulative pass for (count, positives) prefix sums, and every
candidate's left/right contingency is a lookup — the histogram
trick XGBoost/LightGBM build on. Candidates are the 9 decile fences
over distinct values by the explicit-rank rule (the
agg_histogram_equidepth discipline).

Entropies are computed from INTEGER contingencies with identical
expressions on both engines; gains round at 6dp before the argmax,
so the winner is decided on identical quantized values.
"""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F

from stockify_spark.registry import register, _t


def _h(p: str) -> str:
    return (
        f"CASE WHEN {p} <= 0 OR {p} >= 1 THEN 0.0 "
        f"ELSE -({p}) * log2({p}) - (1 - ({p})) * log2(1 - ({p})) END"
    )


_PL = "(CAST(kl AS DOUBLE) / nl)"
_PR = "(CAST(kk - kl AS DOUBLE) / (nn - nl))"
_PT = "(CAST(kk AS DOUBLE) / nn)"

_STUMP_SQL = f"""
WITH d AS (
  SELECT o_totalprice AS x,
         CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
              THEN 1 ELSE 0 END AS y
  FROM orders),
g AS (SELECT x, COUNT(*) AS n, SUM(y) AS k FROM d GROUP BY x),
c AS (SELECT x, SUM(n) OVER (ORDER BY x) AS cn, SUM(k) OVER (ORDER BY x) AS ck,
             ROW_NUMBER() OVER (ORDER BY x) AS rx,
             COUNT(*) OVER () AS ndist
      FROM g),
tot AS (SELECT CAST(COUNT(*) AS BIGINT) AS nn, CAST(SUM(y) AS BIGINT) AS kk
        FROM d),
cand AS (
  SELECT c.x AS thr, c.cn AS nl, c.ck AS kl, t.nn, t.kk
  FROM c CROSS JOIN tot t
  WHERE c.rx < c.ndist
    AND (c.rx * 10) // c.ndist > ((c.rx - 1) * 10) // c.ndist),
scored AS (
  SELECT thr, CAST(nl AS BIGINT) AS n_left, CAST(kl AS BIGINT) AS k_left,
         ROUND({_h(_PT)}
               - (CAST(nl AS DOUBLE) / nn) * {_h(_PL)}
               - (CAST(nn - nl AS DOUBLE) / nn) * {_h(_PR)}, 6) AS gain
  FROM cand)
SELECT thr, n_left, k_left, gain,
       ROW_NUMBER() OVER (ORDER BY gain DESC, thr) = 1 AS is_best
FROM scored
"""


@register("ml_decision_stump", _STUMP_SQL)
def ml_decision_stump(spark, sf_dir):
    """Best urgent-order split on o_totalprice: 9 decile candidate
    fences over distinct prices, each scored by information gain
    from the ONE cumulative (count, positives) pass, winner flagged
    by rounded-gain argmax with a threshold tie-break. Gain algebra
    (parent entropy minus weighted child entropies, never negative,
    zero for a label-independent split) is pinned in
    tests/test_ext59.py against a from-scratch entropy
    reimplementation.

    Scale shape: one group-by on the feature (distinct-value-sized
    output), one window prefix pass, nine constant-size lookups —
    the histogram-split layout, O(data) once regardless of candidate
    count. The naive per-candidate rescan this replaces is O(data *
    candidates), which is why tree learners invented the trick."""
    d = _t(spark, sf_dir, "orders").select(
        F.col("o_totalprice").alias("x"),
        F.when(
            F.col("o_orderpriority").isin("1-URGENT", "2-HIGH"), 1
        )
        .otherwise(0)
        .alias("y"),
    )
    g = d.groupBy("x").agg(
        F.count(F.lit(1)).alias("n"), F.sum("y").alias("k")
    )
    wx = Window.orderBy("x")
    wall = Window.partitionBy().rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing
    )
    c = g.select(
        "x",
        F.sum("n").over(wx).alias("cn"),
        F.sum("k").over(wx).alias("ck"),
        F.row_number().over(wx).alias("rx"),
        F.count(F.lit(1)).over(wall).alias("ndist"),
    )
    tot = d.agg(
        F.count(F.lit(1)).cast("long").alias("nn"),
        F.sum("y").cast("long").alias("kk"),
    )
    cand = (
        c.crossJoin(F.broadcast(tot))
        .filter(
            (F.col("rx") < F.col("ndist"))
            & (
                F.expr("(rx * 10) div ndist")
                > F.expr("((rx - 1) * 10) div ndist")
            )
        )
        .select(
            F.col("x").alias("thr"),
            F.col("cn").alias("nl"),
            F.col("ck").alias("kl"),
            "nn",
            "kk",
        )
    )

    def h(p):
        return F.when((p <= 0) | (p >= 1), 0.0).otherwise(
            -p * F.log2(p) - (1 - p) * F.log2(1 - p)
        )

    pl = F.col("kl").cast("double") / F.col("nl")
    pr = (F.col("kk") - F.col("kl")).cast("double") / (
        F.col("nn") - F.col("nl")
    )
    pt = F.col("kk").cast("double") / F.col("nn")
    gain = F.round(
        h(pt)
        - (F.col("nl").cast("double") / F.col("nn")) * h(pl)
        - ((F.col("nn") - F.col("nl")).cast("double") / F.col("nn")) * h(pr),
        6,
    )
    scored = cand.select(
        "thr",
        F.col("nl").cast("long").alias("n_left"),
        F.col("kl").cast("long").alias("k_left"),
        gain.alias("gain"),
    )
    return scored.select(
        "thr",
        "n_left",
        "k_left",
        "gain",
        (
            F.row_number().over(Window.orderBy(F.col("gain").desc(), "thr"))
            == 1
        ).alias("is_best"),
    )
