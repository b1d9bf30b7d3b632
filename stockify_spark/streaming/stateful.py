"""Custom stateful streaming operator (north-star extension — the
reference has no streaming of any kind, SURVEY §2.6).

``applyInPandasWithState`` is Spark's arbitrary-state API: one
GroupState per key, Arrow-batched user code, watermark-driven state
expiry. The operator below keeps an O(1) per-user accumulator
(count / sum / last-seen), so state size is #active-users × a few
longs regardless of event volume — the shape that survives
100 TB/day. The batch face is a plain groupBy so the differential
contract (stream converges to batch) stays testable.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

OUTPUT_SCHEMA = "user_id bigint, n_events bigint, sum_value double"
STATE_SCHEMA = "n bigint, total double"


def _update_user_totals(
    key: tuple,
    batches: Iterator[pd.DataFrame],
    state: GroupState,
) -> Iterator[pd.DataFrame]:
    """Fold each micro-batch of one user's events into (n, total)."""
    n, total = state.get if state.exists else (0, 0.0)
    for pdf in batches:
        n += len(pdf)
        total += float(pdf["value"].sum())
    state.update((n, total))
    yield pd.DataFrame(
        {"user_id": [key[0]], "n_events": [n], "sum_value": [round(total, 6)]}
    )


def running_user_totals(events: DataFrame, streaming: bool = False) -> DataFrame:
    """Per-user running (count, sum(value)).

    Streaming: one GroupState per user via applyInPandasWithState,
    emitting the refreshed total each micro-batch (update semantics).
    Batch: the equivalent one-shot groupBy — the convergence target
    the stream must reach after processing all input.
    """
    if streaming or events.isStreaming:
        return events.groupBy("user_id").applyInPandasWithState(
            _update_user_totals,
            outputStructType=OUTPUT_SCHEMA,
            stateStructType=STATE_SCHEMA,
            outputMode="update",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    return events.groupBy("user_id").agg(
        F.count(F.lit(1)).alias("n_events"),
        F.round(F.sum("value"), 6).alias("sum_value"),
    )


# ---------------------------------------------------------------------------
# CUSUM change detector — order-sensitive per-key state
# ---------------------------------------------------------------------------

CUSUM_OUTPUT = "user_id bigint, s_final double, s_max double, alarm boolean"
CUSUM_STATE = "s double, smax double"


def _make_cusum_update(k: float, h: float):
    """Bind the reference level and alarm threshold into the
    applyInPandasWithState update function (the constants travel in
    the serialized closure, not in state)."""

    def update(
        key: tuple,
        batches: Iterator[pd.DataFrame],
        state: GroupState,
    ) -> Iterator[pd.DataFrame]:
        s, smax = state.get if state.exists else (0.0, 0.0)
        for pdf in batches:
            # order INSIDE the batch is restored here; order ACROSS
            # micro-batches is the source's contract (event-time-
            # ordered ingestion — the same assumption every online
            # CUSUM monitor makes)
            pdf = pdf.sort_values(["ms", "event_id"])
            for x in pdf["value"]:
                s = max(0.0, s + (float(x) - k))
                if s > smax:
                    smax = s
        state.update((s, smax))
        yield pd.DataFrame(
            {
                "user_id": [key[0]],
                "s_final": [round(s, 6)],
                "s_max": [round(smax, 6)],
                "alarm": [smax > h],
            }
        )

    return update


def cusum_alarms(
    events: DataFrame, k: float, h: float, streaming: bool = False
) -> DataFrame:
    """Per-user one-sided CUSUM (Page 1954): S_t = max(0, S_{t-1} +
    (x_t − k)), alarming when max_t S_t exceeds h.

    Streaming: O(1) state per user — (S, max S), two doubles —
    folded in event order via applyInPandasWithState; state size is
    #active-users regardless of volume, the 100 TB/day shape.

    Batch: the prefix identity S_t = D_t − min(0, min_{j≤t} D_j)
    with D the running sum of (x − k) turns the sequential
    recurrence into ONE window pass (running sum + running min) — no
    per-row loop, and because both engines fold each user's rows in
    the same (ts, event_id) order, the comparison is exact before
    the final 6dp round.
    """
    if streaming or events.isStreaming:
        ev = events.select(
            "user_id",
            F.unix_millis("ts").alias("ms"),
            "event_id",
            "value",
        )
        return ev.groupBy("user_id").applyInPandasWithState(
            _make_cusum_update(k, h),
            outputStructType=CUSUM_OUTPUT,
            stateStructType=CUSUM_STATE,
            outputMode="update",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    from pyspark.sql import Window

    w = Window.partitionBy("user_id").orderBy(F.unix_millis("ts"), "event_id")
    d = events.withColumn("_d", F.sum(F.col("value") - F.lit(k)).over(w))
    s = d.withColumn(
        "_s", F.col("_d") - F.least(F.lit(0.0), F.min("_d").over(w))
    )
    # s_final needs no order-dependent "last": D_n is the plain sum
    # and the global running-min equals the partition min, so the
    # final state folds out of order-free aggregates
    return s.groupBy("user_id").agg(
        # "+ 0" collapses IEEE negative zero: a series whose CUSUM
        # ends exactly at the clamp computes s_final as a tiny
        # engine-order-dependent residual that rounds to ±0.0
        (
            F.round(
                F.sum(F.col("value") - F.lit(k))
                - F.least(F.lit(0.0), F.min("_d")),
                6,
            )
            + 0
        ).alias("s_final"),
        F.round(F.max("_s"), 6).alias("s_max"),
        (F.max("_s") > h).alias("alarm"),
    )
