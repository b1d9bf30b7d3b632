"""Round-8 extension wave 30: selective OPTIMIZE (small-file
compaction) as driver-checkable evidence.

Streaming sinks and trickle appends fragment a table into KB-scale
files; the maintenance op every log-structured format needs is a
compaction that rewrites ONLY the fragments. sources/txlog.
compact_small has owned that semantics since the check-constraint
wave (unit-pinned in tests/test_txlog.py); this registers the
end-to-end lifecycle as an oracle query so the driver hash-checks
the one property maintenance must never break: the table reads back
byte-identically after OPTIMIZE.
"""

from __future__ import annotations

import os

from pyspark.sql import functions as F

from stockify_spark.registry import register, _t

_OPT_SQL = """
SELECT o_orderkey, o_totalprice FROM orders
"""


@register("txlog_optimize_small", _OPT_SQL)
def txlog_optimize_small(spark, sf_dir):
    """OPTIMIZE lifecycle: create a healthy base (even orderkeys,
    range-partitioned), trickle in six small appends (odd orderkeys
    by residue — the streaming-sink fragmentation shape), then
    txlog.compact_small. The build asserts the selective contract
    structurally — every healthy base file keeps its exact path
    (shared with older snapshots, zero rewrite cost) and the six
    fragments collapse into one — and the oracle asserts the content
    contract: the post-OPTIMIZE snapshot is exactly the orders
    table. At 100 TB selective compaction is the difference between
    a maintenance job sized to the fragmentation (MBs) and one sized
    to the table (the full 100 TB rewrite txlog.compact would do).

    Reference anchor: extends the txlog maintenance family
    (compact/zorder/vacuum/restore — SURVEY §7.6 lakehouse row)."""
    from stockify_spark.registry_ext7 import _scratch_table
    from stockify_spark.sources import txlog

    def build(path: str) -> None:
        o = _t(spark, sf_dir, "orders").select("o_orderkey", "o_totalprice")
        txlog.create(
            o.filter(F.col("o_orderkey") % 2 == 0).repartitionByRange(
                2, "o_orderkey"
            ),
            path,
        )
        base = set(txlog.live_files(path))
        for r in range(6):
            txlog.append(
                o.filter(
                    (F.col("o_orderkey") % 2 == 1)
                    & (F.col("o_orderkey") % 11 == r)
                ).coalesce(1),
                path,
            )
        txlog.append(
            o.filter(
                (F.col("o_orderkey") % 2 == 1) & (F.col("o_orderkey") % 11 >= 6)
            ).coalesce(1),
            path,
        )
        live_before = txlog.live_files(path)
        # threshold sits just under the smallest healthy file: the
        # fragments (size < every base file) qualify, the base never
        small_cut = min(os.path.getsize(f) for f in base)
        txlog.compact_small(
            spark, path, min_bytes=small_cut, target_partitions=1
        )
        live_after = set(txlog.live_files(path))
        # selective contract: healthy files share paths across the
        # compaction commit; the 7 fragments became exactly 1
        assert base <= live_after, "healthy base files were rewritten"
        assert len(live_after) == len(base) + 1, (
            len(live_before),
            len(live_after),
        )

    path = _scratch_table(sf_dir, "optsmall", build)
    return txlog.snapshot(spark, path).select("o_orderkey", "o_totalprice")
