"""Round-13 extension wave 98: partitioned-table maintenance + the
streaming CUSUM detector.

``txlog_partitioned_compact`` closes the maintenance gap wave 95
opened (partitioned tables refused table-wide compaction; the
per-partition OPTIMIZE is the correct unit there).
``stream_cusum_alarm`` adds an ORDER-SENSITIVE stateful streaming
operator next to the order-free running totals: Page's CUSUM with
O(1) per-key state, whose batch face turns the sequential recurrence
into one window pass via the prefix identity — the differential
contract a change-point monitor needs.
"""

from __future__ import annotations

import json
import os

from pyspark.sql import functions as F

from stockify_spark.registry import register, _t

# ---------------------------------------------------------------------------
# txlog_partitioned_compact — per-partition OPTIMIZE
# ---------------------------------------------------------------------------

_PC_SQL = """
SELECT pri, files_before, files_after, n_rows, sum_total
FROM (
  SELECT o_orderpriority AS pri,
         CAST(4 AS BIGINT) AS files_before,
         CAST(CASE WHEN o_orderpriority = '1-URGENT' THEN 1 ELSE 4 END
              AS BIGINT) AS files_after,
         CAST(COUNT(*) AS BIGINT) AS n_rows,
         ROUND(SUM(o_totalprice), 2) AS sum_total
  FROM orders
  WHERE o_orderpriority IN ('1-URGENT', '3-MEDIUM')
  GROUP BY o_orderpriority)
"""


@register("txlog_partitioned_compact", _PC_SQL)
def txlog_partitioned_compact(spark, sf_dir):
    """Per-partition compaction on a trickle-ingested partitioned
    table: four single-task writes leave every priority partition
    with 4 files; compact_partition('1-URGENT') rewrites exactly
    that partition to 1 file in one atomic commit — the untouched
    '3-MEDIUM' partition keeps its 4 (structural columns pinned from
    the log alone), and the data aggregates over BOTH partitions
    still match the raw orders table, read through partition-pruned
    snapshots of the post-compaction version. Time-travel to the
    pre-compaction version is exercised in
    tests/test_txlog_partitioned.py.

    Scale shape: the rewrite reads only the target partition's
    files; the commit is adds+removes for that partition only — the
    same fragmentation-tracks-cost contract as compact_small, scoped
    to the partition a streaming sink actually fragmented."""
    from stockify_spark.registry_ext7 import _scratch_table
    from stockify_spark.sources import txlog

    orders = _t(spark, sf_dir, "orders").select(
        "o_orderkey", "o_totalprice", "o_orderpriority"
    )

    def build(path: str) -> None:
        t = os.path.join(path, "t")
        txlog.create_partitioned(
            orders.filter(F.col("o_orderkey") % 4 == 0).coalesce(1),
            t,
            ["o_orderpriority"],
        )
        for r in (1, 2, 3):
            txlog.append(
                orders.filter(F.col("o_orderkey") % 4 == r).coalesce(1), t
            )
        before = {
            p: len(txlog.partition_files(t, {"o_orderpriority": p}))
            for p in ("1-URGENT", "3-MEDIUM")
        }
        txlog.compact_partition(spark, t, {"o_orderpriority": "1-URGENT"})
        after = {
            p: len(txlog.partition_files(t, {"o_orderpriority": p}))
            for p in ("1-URGENT", "3-MEDIUM")
        }
        with open(os.path.join(path, "files.json"), "w") as f:
            json.dump({"before": before, "after": after}, f)

    root = _scratch_table(sf_dir, "partcompact", build)
    t = os.path.join(root, "t")
    with open(os.path.join(root, "files.json")) as f:
        counts = json.load(f)

    pieces = []
    for p in ("1-URGENT", "3-MEDIUM"):
        snap = txlog.snapshot_partition_pruned(spark, t, {"o_orderpriority": p})
        pieces.append(
            snap.groupBy(F.col("o_orderpriority").alias("pri")).agg(
                F.lit(counts["before"][p]).cast("bigint").alias("files_before"),
                F.lit(counts["after"][p]).cast("bigint").alias("files_after"),
                F.count(F.lit(1)).cast("bigint").alias("n_rows"),
                F.round(F.sum("o_totalprice"), 2).alias("sum_total"),
            )
        )
    out = pieces[0]
    for p in pieces[1:]:
        out = out.unionByName(p)
    return out.select("pri", "files_before", "files_after", "n_rows", "sum_total")


# ---------------------------------------------------------------------------
# stream_cusum_alarm — batch face of the stateful CUSUM detector
# ---------------------------------------------------------------------------

_CUSUM_SQL = """
WITH c AS (SELECT ROUND(AVG(value), 6) AS k,
                  ROUND(2 * STDDEV_POP(value), 6) AS h
           FROM events),
d AS (SELECT user_id, value, k, h, epoch_ms(ts) AS ms, event_id,
             SUM(value - k) OVER w AS dd
      FROM events CROSS JOIN c
      WINDOW w AS (PARTITION BY user_id ORDER BY epoch_ms(ts), event_id)),
s AS (SELECT user_id, value, k, h, dd,
             dd - least(0, MIN(dd) OVER w) AS ss
      FROM d
      WINDOW w AS (PARTITION BY user_id ORDER BY ms, event_id))
SELECT user_id,
       ROUND(SUM(value) - COUNT(*) * MAX(k) - least(0, MIN(dd)), 6) + 0 AS s_final,
       ROUND(MAX(ss), 6) AS s_max,
       MAX(ss) > MAX(h) AS alarm
FROM s GROUP BY user_id
"""


@register("stream_cusum_alarm", _CUSUM_SQL)
def stream_cusum_alarm(spark, sf_dir):
    """Batch face of the per-user CUSUM change detector
    (streaming/stateful.cusum_alarms): S_t = max(0, S_{t-1} +
    (value − k)) with k the corpus mean and alarm threshold
    h = 2σ, both 6dp-quantized before use (the quantize-then-derive
    rule) so every downstream value is computed from identical
    constants on both engines. The sequential recurrence is restated
    as the prefix identity S_t = D_t − min(0, min_{j≤t} D_j) — one
    window pass (running sum + running min), no per-row loop. The
    streaming face keeps exactly (S, max S) per user and converges
    to this result (tests/test_streaming.py).

    Shape: one scalar aggregate broadcast, one shuffle on the series
    key for the two stacked windows, one per-user fold."""
    from stockify_spark.streaming.stateful import cusum_alarms

    ev = _t(spark, sf_dir, "events")
    k, h = (
        ev.agg(
            F.round(F.avg("value"), 6),
            F.round(2 * F.stddev_pop("value"), 6),
        )
        .collect()[0]
    )
    return cusum_alarms(ev, float(k), float(h))
