"""Round-8 extension wave 76: nearest-direction as-of join.

The asof family's third direction (pandas merge_asof: backward,
forward, NEAREST): each purchase aligns to the temporally closest
click per user within a tolerance — the sensor-fusion/trade-quote
form when causality is not one-sided. Built from the same
union + carry machinery as join_asof/_tolerance (one shuffle per
side, never a range cross-product): the backward candidate is the
running last-click struct, the forward candidate the running
first-click struct from the other end, and NEAREST is a map-side
argmin with the documented tie rule (equal gaps -> the earlier
click).
"""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F

from stockify_spark.registry import register, _t

_TOL_S = 600  # seconds

_NEAREST_SQL = f"""
WITH clicks AS (
  SELECT user_id, MAX(event_id) AS c_id, ts AS c_ts
  FROM events WHERE event_type = 'click' GROUP BY user_id, ts),
purch AS (
  SELECT event_id, user_id, ts FROM events WHERE event_type = 'purchase'),
u AS (
  SELECT user_id, NULL AS p_id, NULL AS p_ts, c_id, c_ts, c_ts AS o_ts,
         0 AS is_p
  FROM clicks
  UNION ALL
  SELECT user_id, event_id, ts, NULL, NULL, ts, 1 FROM purch),
f AS (
  SELECT user_id, p_id, p_ts, is_p,
         MAX(CASE WHEN is_p = 0 THEN struct_pack(t := c_ts, i := c_id) END)
           OVER (PARTITION BY user_id ORDER BY o_ts, is_p
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS back,
         MIN(CASE WHEN is_p = 0 THEN struct_pack(t := c_ts, i := c_id) END)
           OVER (PARTITION BY user_id ORDER BY o_ts, is_p
                 ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING) AS fwd
  FROM u),
pick AS (
  SELECT p_id AS event_id, user_id, p_ts,
         CASE
           WHEN back IS NULL AND fwd IS NULL THEN NULL
           WHEN fwd IS NULL THEN back
           WHEN back IS NULL THEN fwd
           WHEN epoch_ms(p_ts) - epoch_ms(back.t)
                <= epoch_ms(fwd.t) - epoch_ms(p_ts) THEN back
           ELSE fwd
         END AS ch
  FROM f WHERE is_p = 1)
SELECT event_id, user_id,
       ch.i AS click_id,
       CAST(abs(epoch_ms(p_ts) - epoch_ms(ch.t)) / 1000.0 AS DOUBLE)
         AS gap_s,
       CASE WHEN ch.t <= p_ts THEN 'backward' ELSE 'forward' END AS direction
FROM pick
WHERE ch IS NOT NULL
  AND abs(epoch_ms(p_ts) - epoch_ms(ch.t)) <= {_TOL_S} * 1000
"""


@register("join_asof_nearest", _NEAREST_SQL)
def join_asof_nearest(spark, sf_dir):
    """Nearest click per purchase within 10 minutes, either
    direction, ties to the earlier (backward) click: clicks
    pre-deduped per (user, ts) to the max event_id (the
    asof_tolerance convention), one union + two cumulative struct
    fills (backward max-carry, forward min-carry — struct order is
    (ts, id), so the carries pick the latest-prior and
    earliest-following rows atomically), then a map-side argmin.
    Equivalence to a brute per-purchase scan over all of the user's
    clicks, and the tie rule, are pinned in tests/test_ext87.py.

    Scale shape: one shuffle per side into the union window —
    identical cost to the backward-only asof; NEAREST adds only the
    mirrored carry in the same window pass."""
    ev = _t(spark, sf_dir, "events")
    clicks = (
        ev.filter(F.col("event_type") == "click")
        .groupBy("user_id", "ts")
        .agg(F.max("event_id").alias("c_id"))
        .select("user_id", F.col("ts").alias("c_ts"), "c_id")
    )
    purch = ev.filter(F.col("event_type") == "purchase").select(
        "event_id", "user_id", "ts"
    )
    u = clicks.select(
        "user_id",
        F.lit(None).cast("long").alias("p_id"),
        F.lit(None).cast("timestamp").alias("p_ts"),
        F.struct(F.col("c_ts").alias("t"), F.col("c_id").alias("i")).alias(
            "c"
        ),
        F.col("c_ts").alias("o_ts"),
        F.lit(0).alias("is_p"),
    ).unionAll(
        purch.select(
            "user_id",
            F.col("event_id").alias("p_id"),
            F.col("ts").alias("p_ts"),
            F.lit(None)
            .cast("struct<t:timestamp,i:long>")
            .alias("c"),
            F.col("ts").alias("o_ts"),
            F.lit(1).alias("is_p"),
        )
    )
    wb = (
        Window.partitionBy("user_id")
        .orderBy("o_ts", "is_p")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    wf = (
        Window.partitionBy("user_id")
        .orderBy("o_ts", "is_p")
        .rowsBetween(Window.currentRow, Window.unboundedFollowing)
    )
    f = u.select(
        "user_id",
        "p_id",
        "p_ts",
        "is_p",
        F.max("c").over(wb).alias("back"),
        F.min("c").over(wf).alias("fwd"),
    ).filter(F.col("is_p") == 1)
    back_gap = F.unix_millis("p_ts") - F.unix_millis(F.col("back.t"))
    fwd_gap = F.unix_millis(F.col("fwd.t")) - F.unix_millis("p_ts")
    ch = (
        F.when(F.col("back").isNull() & F.col("fwd").isNull(), F.lit(None))
        .when(F.col("fwd").isNull(), F.col("back"))
        .when(F.col("back").isNull(), F.col("fwd"))
        .when(back_gap <= fwd_gap, F.col("back"))
        .otherwise(F.col("fwd"))
    )
    pick = f.select(
        F.col("p_id").alias("event_id"),
        "user_id",
        "p_ts",
        ch.alias("ch"),
    ).filter(F.col("ch").isNotNull())
    gap_ms = F.abs(F.unix_millis("p_ts") - F.unix_millis(F.col("ch.t")))
    return pick.filter(gap_ms <= _TOL_S * 1000).select(
        "event_id",
        "user_id",
        F.col("ch.i").alias("click_id"),
        (gap_ms / 1000.0).cast("double").alias("gap_s"),
        F.when(F.col("ch.t") <= F.col("p_ts"), "backward")
        .otherwise("forward")
        .alias("direction"),
    )
