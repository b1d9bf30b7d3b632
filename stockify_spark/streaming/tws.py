"""transformWithState operator (Spark 4 arbitrary-state API).

``transformWithStateInPandas`` is the successor to
``applyInPandasWithState`` (streaming/stateful.py): instead of one
opaque state tuple per key it exposes TYPED state primitives —
ValueState / ListState / MapState — each stored as its own column
family in the (RocksDB-backed) state store, so a composite profile
updates without rewriting the whole blob and state size stays
O(#active keys × tracked fields) at 100 TB/day.

Operator: per-user profile (event count, distinct event types, value
sum, value max). The distinct-type set lives in a MapState — the
piece a flat tuple cannot express incrementally — and the numeric
accumulators in a ValueState. The batch face is the equivalent
one-shot groupBy (the convergence target, same dual-face contract as
running_user_totals).

Environment gate (honest boundary, same policy as llm/mp3.py): the
TWS Python worker speaks protobuf to the JVM state server
(pyspark/sql/streaming/proto/StateMessage_pb2). Where the protobuf
package is missing the streaming face raises at stream start with
Spark's ImportError; the batch face has no such dependency. The
convergence test (tests/test_streaming.py) importorskips on
google.protobuf.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.streaming import StatefulProcessor, StatefulProcessorHandle

OUTPUT_SCHEMA = (
    "user_id bigint, n_events bigint, n_types bigint, sum_value double, max_value double"
)


class UserProfileProcessor(StatefulProcessor):
    """ValueState for the numeric accumulators + MapState for the
    distinct event-type set (insert-only membership map)."""

    def init(self, handle: StatefulProcessorHandle) -> None:
        self._totals = handle.getValueState(
            "totals", "n bigint, total double, mx double"
        )
        self._types = handle.getMapState("types", "t string", "seen smallint")

    def handleInputRows(self, key, rows, timerValues) -> Iterator[pd.DataFrame]:
        n, total, mx = (
            self._totals.get() if self._totals.exists() else (0, 0.0, None)
        )
        for pdf in rows:
            n += len(pdf)
            total += float(pdf["value"].sum())
            bmax = float(pdf["value"].max())
            mx = bmax if mx is None else max(mx, bmax)
            for t in pdf["event_type"].unique():
                if not self._types.containsKey((str(t),)):
                    self._types.updateValue((str(t),), (1,))
        self._totals.update((n, total, mx))
        n_types = sum(1 for _ in self._types.keys())
        yield pd.DataFrame(
            {
                "user_id": [key[0]],
                "n_events": [n],
                "n_types": [n_types],
                "sum_value": [round(total, 6)],
                "max_value": [mx],
            }
        )

    def close(self) -> None:
        pass


def user_profile(events: DataFrame, streaming: bool = False) -> DataFrame:
    """Per-user profile; streaming face emits the refreshed profile
    each micro-batch (update semantics), batch face is the one-shot
    groupBy the stream converges to."""
    if streaming or events.isStreaming:
        return (
            events.select("user_id", "event_type", "value")
            .groupBy("user_id")
            .transformWithStateInPandas(
                UserProfileProcessor(),
                outputStructType=OUTPUT_SCHEMA,
                outputMode="Update",
                timeMode="None",
            )
        )
    return events.groupBy("user_id").agg(
        F.count(F.lit(1)).alias("n_events"),
        F.countDistinct("event_type").alias("n_types"),
        F.round(F.sum("value"), 6).alias("sum_value"),
        F.max("value").alias("max_value"),
    )
