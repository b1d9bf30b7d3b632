"""Round-8 extension wave 57: two-state burst detection.

Kleinberg's burst model (2002): an event stream switches between a
base emission rate a0 and a burst rate a1 = 2*a0; each inter-arrival
gap x costs a_q*x - ln(a_q) under state q, plus a charge for
entering the burst state. events_burstiness scores HOW bursty a user
is (one number); this detector says WHEN the stream is bursting.

The engine trick that makes it cross-engine exact: with the standard
s = 2 rate ratio, the per-gap cost DIFFERENCE between states is
a0*x - ln(2) — the only transcendental is the LITERAL ln 2, so no
engine-libm ln ever runs on data. Tracking d_t = cost1_t - cost0_t
collapses the two-state DP to one scalar recursion,

  d_t = a0*x_t - ln2 + min(tau, d_{t-1}) - min(0, d_{t-1})

(tau = the burst-entry charge), and the forward-filtered burst flag
is simply d_t < 0. This is the filtered variant (state from the
past only) rather than Viterbi smoothing — the streaming-compatible
choice, documented divergence.
"""

from __future__ import annotations

import math

from pyspark.sql import Window
from pyspark.sql import functions as F

from stockify_spark.registry import register, _t

_TAU = 1.0
_LN2 = math.log(2.0)

_BURST_SQL = f"""
WITH RECURSIVE e AS (
  SELECT event_type, epoch_ms(ts) / 1000.0 AS sec,
         ROW_NUMBER() OVER (PARTITION BY event_type
                            ORDER BY ts, event_id) AS rn
  FROM events),
g AS (
  SELECT a.event_type, a.rn - 1 AS i, a.sec - b.sec AS x
  FROM e a JOIN e b ON b.event_type = a.event_type AND b.rn = a.rn - 1),
rate AS (
  SELECT event_type, ROUND((MAX(rn) - 1) / (MAX(sec) - MIN(sec)), 9) AS a0
  FROM e GROUP BY 1),
r AS (
  SELECT g.event_type, 1 AS i,
         rate.a0 * g.x - {_LN2!r}
           + LEAST({_TAU!r}, 0.0) - LEAST(0.0, 0.0) AS d
  FROM g JOIN rate USING (event_type) WHERE g.i = 1
  UNION ALL
  SELECT r.event_type, r.i + 1,
         rate.a0 * g.x - {_LN2!r}
           + LEAST({_TAU!r}, r.d) - LEAST(0.0, r.d)
  FROM r
  JOIN g ON g.event_type = r.event_type AND g.i = r.i + 1
  JOIN rate ON rate.event_type = r.event_type)
SELECT event_type,
       CAST(COUNT(*) AS BIGINT) AS n_gaps,
       CAST(SUM(CASE WHEN d < 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_burst,
       ROUND(CAST(SUM(CASE WHEN d < 0 THEN 1 ELSE 0 END) AS DOUBLE)
             / COUNT(*), 6) AS burst_frac
FROM r GROUP BY event_type
"""


@register("events_burst_detect", _BURST_SQL)
def events_burst_detect(spark, sf_dir):
    """Forward-filtered two-state burst detection per event type:
    base rate a0 = (n-1)/span (9dp-pinned), burst rate 2*a0, entry
    charge tau = 1, flag = the cost-difference recursion dipping
    below 0. Emits per type the gap count, burst-flagged gap count,
    and burst fraction. The d-recursion's equivalence to the full
    two-row DP, and the detector actually FIRING inside a planted
    burst while staying quiet on a uniform stream, are pinned in
    tests/test_ext68.py.

    Scale shape: gaps from one lag join, a0 from one aggregate, then
    an applyInPandas scalar recursion per series (the EMA/Kalman
    class — the state is ONE double, so this runs as a streaming
    operator unchanged); the oracle steps the same recursion through
    a recursive CTE."""
    import pandas as pd

    ev = _t(spark, sf_dir, "events").select("event_type", "ts", "event_id")
    w = Window.partitionBy("event_type").orderBy("ts", "event_id")
    e = ev.select(
        "event_type",
        (F.unix_millis("ts") / 1000.0).alias("sec"),
        F.row_number().over(w).alias("rn"),
    )
    rate = e.groupBy("event_type").agg(
        F.round(
            (F.max("rn") - 1) / (F.max("sec") - F.min("sec")), 9
        ).alias("a0")
    )
    gaps = (
        e.withColumn("x", F.col("sec") - F.lag("sec").over(
            Window.partitionBy("event_type").orderBy("rn")
        ))
        .filter(F.col("x").isNotNull())
        .join(F.broadcast(rate), "event_type")
        .select("event_type", "rn", "x", "a0")
    )

    def detect(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values("rn")
        a0 = pdf["a0"].iloc[0]
        d = 0.0
        n = 0
        nb = 0
        first = True
        for x in pdf["x"].to_numpy():
            if first:
                d = a0 * x - _LN2 + min(_TAU, 0.0) - min(0.0, 0.0)
                first = False
            else:
                d = a0 * x - _LN2 + min(_TAU, d) - min(0.0, d)
            n += 1
            nb += d < 0
        return pd.DataFrame(
            {
                "event_type": [pdf["event_type"].iloc[0]],
                "n_gaps": [n],
                "n_burst": [nb],
                "burst_frac": [round(nb / n, 6)],
            }
        )

    return gaps.groupBy("event_type").applyInPandas(
        detect,
        schema=(
            "event_type string, n_gaps long, n_burst long, burst_frac double"
        ),
    )
