"""Round-8 extension wave 45: sequential probability ratio test.

Wald's SPRT (1945) — the original always-valid sequential test:
observe a stream, accumulate the log-likelihood ratio between two
simple hypotheses, stop the moment it crosses ln(B) (accept H0) or
ln(A) (accept H1); error rates alpha = beta = 0.05 give the classic
fences A = 19, B = 1/19. Modern experimentation platforms run
exactly this shape for early stopping.

Determinism by construction: for a Bernoulli stream the LLR after n
observations is k*c1 + (n-k)*c0 where k is the success PREFIX COUNT
and c1/c0 are literals — so both engines derive every partial LLR
from two integers and two literals, and no float accumulation order
exists to drift.
"""

from __future__ import annotations

import math

from pyspark.sql import Window
from pyspark.sql import functions as F

from stockify_spark.registry import register, _t

_P0, _P1 = 0.5, 0.6
_THRESH = 10.0  # success := value > 10.0
_C1 = math.log(_P1 / _P0)  # LLR per success
_C0 = math.log((1 - _P1) / (1 - _P0))  # LLR per failure
_LN_A = math.log(19.0)
_LN_B = -math.log(19.0)

_SPRT_SQL = f"""
WITH s AS (
  SELECT event_type,
         CASE WHEN value > {_THRESH} THEN 1 ELSE 0 END AS x,
         ROW_NUMBER() OVER (PARTITION BY event_type
                            ORDER BY ts, event_id) AS n
  FROM events),
c AS (
  SELECT event_type, n,
         SUM(x) OVER (PARTITION BY event_type ORDER BY n) AS k
  FROM s),
l AS (
  SELECT event_type, n, k,
         k * CAST({_C1!r} AS DOUBLE)
         + (n - k) * CAST({_C0!r} AS DOUBLE) AS llr
  FROM c),
hit AS (
  SELECT event_type, n, k, llr,
         ROW_NUMBER() OVER (PARTITION BY event_type ORDER BY n) AS hitrank
  FROM l WHERE llr >= CAST({_LN_A!r} AS DOUBLE)
     OR llr <= CAST({_LN_B!r} AS DOUBLE))
SELECT event_type, CAST(n AS BIGINT) AS n_at_decision,
       CAST(k AS BIGINT) AS successes,
       ROUND(llr, 6) AS llr,
       CASE WHEN llr >= CAST({_LN_A!r} AS DOUBLE) THEN 'accept_h1'
            ELSE 'accept_h0' END AS decision
FROM hit WHERE hitrank = 1
"""


@register("stats_sprt", _SPRT_SQL)
def stats_sprt(spark, sf_dir):
    """SPRT per event type on the Bernoulli stream 1{{value > 10}}
    in (ts, event_id) order — H0: p=.5 vs H1: p=.6, fences at
    ±ln 19 (alpha = beta = .05). Emits the first crossing: sample
    size, success count, the LLR, and the verdict. The first-
    crossing row is found by ranking the crossing set, not by a
    sequential scan — the prefix-count formulation makes every
    partial LLR independently computable, which is also what makes
    the operator one window pass at 100 TB (and is pinned against a
    literal step-by-step walk in tests/test_ext56.py, including
    that no earlier prefix crosses either fence).

    Wald's guarantee is about ERROR RATES under the hypotheses, not
    this data; what the engine owes the user — and what the oracle
    checks — is the exact stopping time and verdict for the stream
    as ordered."""
    ev = _t(spark, sf_dir, "events").select("event_type", "ts", "event_id", "value")
    w = Window.partitionBy("event_type").orderBy("ts", "event_id")
    s = ev.select(
        "event_type",
        F.when(F.col("value") > _THRESH, 1).otherwise(0).alias("x"),
        F.row_number().over(w).alias("n"),
    )
    wn = Window.partitionBy("event_type").orderBy("n")
    c = s.select(
        "event_type", "n", F.sum("x").over(wn).alias("k")
    )
    llr = F.col("k") * F.lit(_C1) + (F.col("n") - F.col("k")) * F.lit(_C0)
    l = c.select("event_type", "n", "k", llr.alias("llr"))
    hit = l.filter(
        (F.col("llr") >= _LN_A) | (F.col("llr") <= _LN_B)
    ).withColumn("hitrank", F.row_number().over(wn))
    return hit.filter(F.col("hitrank") == 1).select(
        "event_type",
        F.col("n").cast("long").alias("n_at_decision"),
        F.col("k").cast("long").alias("successes"),
        F.round("llr", 6).alias("llr"),
        F.when(F.col("llr") >= _LN_A, "accept_h1")
        .otherwise("accept_h0")
        .alias("decision"),
    )
