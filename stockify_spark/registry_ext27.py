"""Round-8 extension wave 16: sliding-window exact distincts and
statistical process control.

DAU/WAU/MAU is the canonical sliding-distinct problem: naive
COUNT(DISTINCT) over a 30-day window re-scans a month of raw events
per day. The bitmap-word design (agg_bitmap_distinct) makes it an
OR-mergeable window aggregate: one bitmap per (user-word, day), OR'd
over RANGE frames keyed on the integer day — per-day state is
words × 8 bytes, not user lists, and the same shape runs at 100 TB
with roaring bitmaps. The SPC query brings Western Electric control
rules (point beyond 3σ, 8-run on one side, 2-of-3 beyond 2σ) onto
the integer-exact moment machinery."""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F

from stockify_spark.registry import register, _t

_ACTIVE_SQL = """
WITH d AS (
  SELECT CAST(epoch_ms(date_trunc('day', ts)) // 86400000 AS BIGINT) AS day,
         user_id // 63 AS word,
         bit_or(1::BIGINT << CAST(user_id % 63 AS INT)) AS bits
  FROM events GROUP BY 1, 2
),
days AS (SELECT DISTINCT day FROM d),
words AS (SELECT DISTINCT word FROM d),
grid AS (
  SELECT days.day, words.word, COALESCE(d.bits, 0) AS bits
  FROM days CROSS JOIN words
  LEFT JOIN d ON d.day = days.day AND d.word = words.word
),
win AS (
  SELECT day, word, bits,
         bit_or(bits) OVER (PARTITION BY word ORDER BY day
                            RANGE BETWEEN 6 PRECEDING AND CURRENT ROW) AS w7,
         bit_or(bits) OVER (PARTITION BY word ORDER BY day
                            RANGE BETWEEN 29 PRECEDING AND CURRENT ROW) AS w30
  FROM grid
)
SELECT day,
       CAST(SUM(bit_count(bits)) AS BIGINT) AS dau,
       CAST(SUM(bit_count(w7)) AS BIGINT) AS wau,
       CAST(SUM(bit_count(w30)) AS BIGINT) AS mau
FROM win GROUP BY day
"""


@register("events_active_users", _ACTIVE_SQL)
def events_active_users(spark, sf_dir):
    """Exact DAU/WAU/MAU per day via OR-mergeable bitmap words: one
    63-bit word per (user-block, day), OR'd over integer-day RANGE
    frames (7- and 30-day trailing) on a DENSIFIED day×word grid —
    a word idle today still carries its trailing actives, which a
    sparse frame would silently drop. Sliding distinct becomes a
    window aggregate whose state is words×8 bytes instead of user
    sets; popcount sums per day finish it. The roaring-bitmap
    active-users design as pure column algebra, integer-exact on
    both engines."""
    ev = _t(spark, sf_dir, "events")
    d = ev.groupBy(
        (F.unix_millis(F.date_trunc("day", F.col("ts"))) / 86400000)
        .cast("long")
        .alias("day"),
        (F.col("user_id") / 63).cast("long").alias("word"),
    ).agg(F.bit_or(F.expr("shiftleft(1L, cast(user_id % 63 as int))")).alias("bits"))
    days = d.select("day").distinct()
    words = d.select("word").distinct()
    grid = (
        days.crossJoin(F.broadcast(words))
        .join(d, ["day", "word"], "left")
        .select("day", "word", F.coalesce(F.col("bits"), F.lit(0)).alias("bits"))
    )
    w7 = Window.partitionBy("word").orderBy("day").rangeBetween(-6, 0)
    w30 = Window.partitionBy("word").orderBy("day").rangeBetween(-29, 0)
    win = grid.select(
        "day",
        "bits",
        F.bit_or("bits").over(w7).alias("w7"),
        F.bit_or("bits").over(w30).alias("w30"),
    )
    return win.groupBy("day").agg(
        F.sum(F.bit_count("bits")).cast("long").alias("dau"),
        F.sum(F.bit_count("w7")).cast("long").alias("wau"),
        F.sum(F.bit_count("w30")).cast("long").alias("mau"),
    )


_SPC_SQL = """
WITH m AS (
  SELECT event_type, CAST(COUNT(*) AS DOUBLE) AS n,
         ROUND(SUM(value), 6) AS s1, ROUND(SUM(value * value), 4) AS s2
  FROM events GROUP BY 1
),
lim AS (
  SELECT event_type, s1 / n AS mu,
         sqrt(s2 / n - (s1 / n) * (s1 / n)) AS sigma
  FROM m
),
f AS (
  SELECT e.event_type, e.event_id, e.ts, e.value, l.mu, l.sigma,
         ABS(e.value - l.mu) > 3 * l.sigma AS rule1,
         CASE WHEN e.value > l.mu THEN 1
              WHEN e.value < l.mu THEN -1 ELSE 0 END AS side,
         CASE WHEN ABS(e.value - l.mu) > 2 * l.sigma THEN 1 ELSE 0 END AS b2
  FROM events e JOIN lim l ON l.event_type = e.event_type
),
runs AS (
  SELECT *,
         row_number() OVER (PARTITION BY event_type ORDER BY ts, event_id)
         - row_number() OVER (PARTITION BY event_type, side
                              ORDER BY ts, event_id) AS grp
  FROM f
),
rl AS (
  SELECT *, COUNT(*) OVER (PARTITION BY event_type, side, grp) AS rl
  FROM runs
),
r3 AS (
  SELECT event_type, event_id, value, rule1,
         side <> 0 AND rl >= 8 AS rule2,
         SUM(b2) OVER (PARTITION BY event_type ORDER BY ts, event_id
                       ROWS BETWEEN 2 PRECEDING AND CURRENT ROW) >= 2 AS rule3
  FROM rl
)
SELECT event_type, event_id, ROUND(value, 6) AS value, rule1, rule2, rule3
FROM r3 WHERE rule1 OR rule2 OR rule3
"""


@register("window_spc_control", _SPC_SQL)
def window_spc_control(spark, sf_dir):
    """Western Electric control-chart rules over each event type's
    value stream (time-ordered, event_id tiebreak): rule 1 = point
    beyond mu+-3sigma, rule 2 = point inside a run of 8+ on one side
    of mu (gaps-and-islands run grouping), rule 3 = 2-of-3 trailing
    points beyond 2sigma. Control limits come from 6dp/4dp-PINNED
    moment sums, so both engines compare every value against
    IDENTICAL limits and the booleans carry zero drift surface. On
    the sf0.01 stream the three rules fire at ~2%/~10%/~0.6% —
    each rule does independent selective work. Emits only flagged
    points (the alerting face); all windows partition by type."""
    ev = _t(spark, sf_dir, "events")
    m = ev.groupBy("event_type").agg(
        F.count(F.lit(1)).cast("double").alias("n"),
        F.round(F.sum("value"), 6).alias("s1"),
        F.round(F.sum(F.col("value") * F.col("value")), 4).alias("s2"),
    )
    c = F.col
    lim = m.select(
        "event_type",
        (c("s1") / c("n")).alias("mu"),
        F.sqrt(c("s2") / c("n") - (c("s1") / c("n")) * (c("s1") / c("n"))).alias(
            "sigma"
        ),
    )
    f = ev.join(F.broadcast(lim), "event_type").select(
        "event_type",
        "event_id",
        "ts",
        "value",
        (F.abs(c("value") - c("mu")) > 3 * c("sigma")).alias("rule1"),
        F.when(c("value") > c("mu"), 1)
        .when(c("value") < c("mu"), -1)
        .otherwise(0)
        .alias("side"),
        F.when(F.abs(c("value") - c("mu")) > 2 * c("sigma"), 1)
        .otherwise(0)
        .alias("b2"),
    )
    wall = Window.partitionBy("event_type").orderBy("ts", "event_id")
    wside = Window.partitionBy("event_type", "side").orderBy("ts", "event_id")
    runs = f.withColumn(
        "grp", F.row_number().over(wall) - F.row_number().over(wside)
    )
    rl = runs.withColumn(
        "rl", F.count(F.lit(1)).over(Window.partitionBy("event_type", "side", "grp"))
    )
    w3 = Window.partitionBy("event_type").orderBy("ts", "event_id").rowsBetween(-2, 0)
    r3 = rl.select(
        "event_type",
        "event_id",
        "value",
        "rule1",
        ((c("side") != 0) & (c("rl") >= 8)).alias("rule2"),
        (F.sum("b2").over(w3) >= 2).alias("rule3"),
    )
    return r3.filter(c("rule1") | c("rule2") | c("rule3")).select(
        "event_type",
        "event_id",
        F.round("value", 6).alias("value"),
        "rule1",
        "rule2",
        "rule3",
    )
