"""Round-13 extension wave 91: the maintenance policy face.

The r12 verdict's top item: every maintenance primitive existed
(checkpoint_log, compact_small, expire_log, vacuum_orphans,
compact_gram) but each was a manual call; a real 100 TB deployment
runs them on thresholds after every ingest cycle, the way Delta's
auto-compaction and log cleanup do. ``txlog.maintain(path, policy)``
is that loop; this query states its decision table — two calls over
a scripted fragmented-ingest fixture — as a closed-form VALUES
oracle (the txlog_history precedent), including the idempotence
contract: the second call triggers NOTHING.
"""

from __future__ import annotations

import json
import os

from pyspark.sql import functions as F

from stockify_spark.registry import register, _t

# The scripted fixture: table "t" is a trickle-ingest shape — create
# + 7 single-file appends (v0..v7, 8 small files, no checkpoint) and
# one planted 2-hour-old orphan in data/. Table "gram" holds 3
# incremental-PCA partial rows. The first maintain() call must
# checkpoint (8 commits since > 3), compact (fraction 1.0 > 0.9,
# committing v8), expire commits 0..6 (keep 2, base = the fresh v7
# checkpoint), sweep the 1 orphan, and fold the gram history (3 rows
# > 1, committing v3); the second call must trigger nothing.
_MAINTAIN_SQL = """
SELECT * FROM (VALUES
  ('t',    CAST(1 AS BIGINT), 'checkpoint',     CAST(8.0 AS DOUBLE), CAST(3.0 AS DOUBLE),    TRUE,  CAST(7  AS BIGINT)),
  ('t',    CAST(1 AS BIGINT), 'compact_small',  CAST(1.0 AS DOUBLE), CAST(0.9 AS DOUBLE),    TRUE,  CAST(8  AS BIGINT)),
  ('t',    CAST(1 AS BIGINT), 'expire_log',     CAST(7.0 AS DOUBLE), CAST(2.0 AS DOUBLE),    TRUE,  CAST(7  AS BIGINT)),
  ('t',    CAST(1 AS BIGINT), 'vacuum_orphans', CAST(1.0 AS DOUBLE), CAST(3600.0 AS DOUBLE), TRUE,  CAST(1  AS BIGINT)),
  ('t',    CAST(2 AS BIGINT), 'checkpoint',     CAST(1.0 AS DOUBLE), CAST(3.0 AS DOUBLE),    FALSE, CAST(-1 AS BIGINT)),
  ('t',    CAST(2 AS BIGINT), 'compact_small',  CAST(1.0 AS DOUBLE), CAST(0.9 AS DOUBLE),    FALSE, CAST(-1 AS BIGINT)),
  ('t',    CAST(2 AS BIGINT), 'expire_log',     CAST(0.0 AS DOUBLE), CAST(2.0 AS DOUBLE),    FALSE, CAST(0  AS BIGINT)),
  ('t',    CAST(2 AS BIGINT), 'vacuum_orphans', CAST(0.0 AS DOUBLE), CAST(3600.0 AS DOUBLE), FALSE, CAST(0  AS BIGINT)),
  ('gram', CAST(1 AS BIGINT), 'compact_gram',   CAST(3.0 AS DOUBLE), CAST(1.0 AS DOUBLE),    TRUE,  CAST(3  AS BIGINT)),
  ('gram', CAST(2 AS BIGINT), 'compact_gram',   CAST(1.0 AS DOUBLE), CAST(1.0 AS DOUBLE),    FALSE, CAST(-1 AS BIGINT))
) AS m(tbl, call, action, metric, threshold, triggered, result)
"""


@register("txlog_maintain", _MAINTAIN_SQL)
def txlog_maintain(spark, sf_dir):
    """maintain(path, policy): the threshold decision table of two
    back-to-back maintenance passes over a scripted trickle-ingest
    table (+ a gram-stats table), the oracle its closed form. Proves
    the ordering contract (checkpoint BEFORE retention, so the first
    pass both writes the replay base and expires below it), the
    metric arithmetic (commits-since-checkpoint, small-file
    fraction, removable commits, aged orphans, partial rows), and
    idempotence (the second pass triggers nothing and commits
    nothing — the converged state is a fixpoint).

    Scale shape: maintenance cost tracks what's wrong with the table
    — selective compaction rewrites only fragments, retention
    unlinks only expired JSON, the gram fold collects 1+d+d² scalars
    — never table size; the decision pass itself is driver-side log
    metadata plus one count on the gram table."""
    import time

    from stockify_spark.registry_ext7 import _scratch_table
    from stockify_spark.llm.pca import gram_update
    from stockify_spark.sources import txlog

    orders = _t(spark, sf_dir, "orders").select("o_orderkey", "o_totalprice")
    emb = _t(spark, sf_dir, "embeddings").select("vec_id", "embedding")

    policy = {
        "checkpoint_commits": 3,
        "small_file_bytes": 512 << 20,
        "small_file_fraction": 0.9,
        "log_keep_versions": 2,
        "orphan_age_seconds": 3600.0,
    }

    def build(path: str) -> None:
        t = os.path.join(path, "t")
        txlog.create(orders.filter(F.col("o_orderkey") % 10 == 0).coalesce(1), t)
        for r in range(1, 8):
            txlog.append(
                orders.filter(F.col("o_orderkey") % 10 == r).coalesce(1), t
            )
        orphan = os.path.join(t, "data", "orphan_debris.parquet")
        with open(orphan, "wb") as f:
            f.write(b"crashed-writer debris")
        old = time.time() - 7200
        os.utime(orphan, (old, old))
        g = os.path.join(path, "gram")
        for v in range(3):
            gram_update(
                emb.filter(F.col("vec_id") % 3 == v), g, app_id="m91",
                batch_version=v,
            )
        rows = []
        for call in (1, 2):
            for d in txlog.maintain(spark, t, policy):
                rows.append({"tbl": "t", "call": call, **d})
            for d in txlog.maintain(spark, g, {"gram_partial_rows": 1}):
                rows.append({"tbl": "gram", "call": call, **d})
        with open(os.path.join(path, "decisions.json"), "w") as f:
            json.dump(rows, f)

    root = _scratch_table(sf_dir, "maintain", build)
    with open(os.path.join(root, "decisions.json")) as f:
        rows = json.load(f)
    return spark.createDataFrame(
        [
            (
                r["tbl"],
                r["call"],
                r["action"],
                r["metric"],
                r["threshold"],
                r["triggered"],
                r["result"],
            )
            for r in rows
        ],
        "tbl string, call long, action string, metric double,"
        " threshold double, triggered boolean, result long",
    )


# ---------------------------------------------------------------------------
# pipeline_near_ingest_indexed — the bloom-indexed near-dup ingest
# sink (llm/dedup.near_dedup_ingest_sink_indexed): the r12 verdict's
# "prove the per-batch probe is bounded by the batch, not the
# destination" item. Near-dup survivor sets are not SQL-computable
# (the banding step is a probabilistic candidate generator), so the
# oracle states the INVARIANTS the indexed form must satisfy instead:
# survivor parity with the linear-scan sink on the same scheduled
# feed, every planted cross-batch duplicate dropped, zero data files
# opened by an all-absent band-key probe, and replay idempotence on
# both the corpus and the index table.
# ---------------------------------------------------------------------------

_NEAR_IDX_SQL = """
SELECT TRUE  AS survivor_parity,
       CAST(0 AS BIGINT) AS n_only_plain,
       CAST(0 AS BIGINT) AS n_only_indexed,
       CAST(0 AS BIGINT) AS planted_dups_kept,
       CAST(0 AS BIGINT) AS absent_probe_files,
       TRUE  AS replay_noop
"""


@register("pipeline_near_ingest_indexed", _NEAR_IDX_SQL)
def pipeline_near_ingest_indexed(spark, sf_dir):
    """Near-dup dedup-against-history ingest through the bloom-
    indexed sink, checked against the linear-scan sink on the same
    4-batch documents feed (batch 3 replays a third of batch 0's
    texts under fresh ids). The indexed probe answers from a
    band-key index table (bk blooms attached incrementally per
    batch) instead of scanning every stored signature: per-batch IO
    is bounded by the batch's keys and the true collision density —
    an all-absent probe opens ZERO files — while the drop decisions
    stay IDENTICAL to the exhaustive scan (the oracle's parity
    invariant; exact-duplicate replays collide in every band, so
    their drop is deterministic, not probabilistic).

    Scale shape: the linear residual is driver-side bloom bit tests,
    O(index_files × batch_keys) with no IO; txlog.maintain's
    small-file compaction bounds index_files, and attach_bloom
    (missing_only) re-blooms compacted files batch-sized."""
    import os

    from stockify_spark.llm.dedup import (
        near_dedup_ingest_sink,
        near_dedup_ingest_sink_indexed,
    )
    from stockify_spark.registry_ext7 import _scratch_table
    from stockify_spark.sources import txlog

    docs = _t(spark, sf_dir, "documents").select("doc_id", "text")

    def build(path: str) -> None:
        plain_dst = os.path.join(path, "plain")
        idx_dst = os.path.join(path, "indexed")
        plain = near_dedup_ingest_sink(spark, plain_dst, "p", "text", "doc_id")
        indexed = near_dedup_ingest_sink_indexed(
            spark, idx_dst, "i", "text", "doc_id"
        )
        for b in range(4):
            batch = docs.filter(F.col("doc_id") % 4 == b)
            if b == 3:
                batch = batch.unionByName(
                    docs.filter(
                        (F.col("doc_id") % 4 == 0) & (F.col("doc_id") % 3 == 0)
                    ).select(
                        (F.col("doc_id") + 1_000_000).alias("doc_id"), "text"
                    )
                )
            batch = batch.localCheckpoint()
            plain(batch, b)
            indexed(batch, b)
            if b == 2:  # at-least-once replay mid-feed on the indexed
                v_dst = txlog.current_version(idx_dst)
                v_idx = txlog.current_version(idx_dst + "_bandidx")
                indexed(batch, b)
                ok = (
                    txlog.current_version(idx_dst) == v_dst
                    and txlog.current_version(idx_dst + "_bandidx") == v_idx
                )
                with open(os.path.join(path, "replay_ok"), "w") as f:
                    f.write("1" if ok else "0")

    root = _scratch_table(sf_dir, "nearidx", build, src_file="documents.parquet")
    plain_ids = txlog.snapshot(spark, os.path.join(root, "plain")).select("doc_id")
    idx_ids = txlog.snapshot(spark, os.path.join(root, "indexed")).select("doc_id")
    only_plain = plain_ids.join(idx_ids, "doc_id", "left_anti").count()
    only_idx = idx_ids.join(plain_ids, "doc_id", "left_anti").count()
    # a planted copy whose ORIGINAL survived must be dropped (exact
    # dups of a history survivor collide in every band — the drop is
    # deterministic); a copy whose original was itself dropped
    # within-batch has no such guarantee, so it is excluded here
    surviving_originals = idx_ids.filter(F.col("doc_id") < 1_000_000).select(
        (F.col("doc_id") + 1_000_000).alias("doc_id")
    )
    planted_kept = (
        idx_ids.filter(F.col("doc_id") >= 1_000_000)
        .join(surviving_originals, "doc_id", "left_semi")
        .count()
    )
    absent_files = len(
        txlog.snapshot_point_any(
            spark,
            os.path.join(root, "indexed") + "_bandidx",
            "bk",
            ["999:absent,band,key"],
        ).inputFiles()
    )
    with open(os.path.join(root, "replay_ok")) as f:
        replay_ok = f.read() == "1"
    return spark.createDataFrame(
        [
            (
                only_plain == 0 and only_idx == 0,
                only_plain,
                only_idx,
                planted_kept,
                absent_files,
                replay_ok,
            )
        ],
        "survivor_parity boolean, n_only_plain long, n_only_indexed long,"
        " planted_dups_kept long, absent_probe_files long, replay_noop boolean",
    )



# ---------------------------------------------------------------------------
# txlog_retention — log retention as a driver-facing contract: after
# expire_log trims the prefix below a checkpointed horizon, every
# in-horizon version still reads EXACTLY (counts stated by the oracle
# from the same slicing arithmetic), out-of-horizon reads raise the
# documented error, history pages over the surviving range, and the
# table keeps accepting writes. Most faces are exercised LIVE at
# query time against the cached expired fixture — not replayed from
# persisted flags.
# ---------------------------------------------------------------------------

_RETENTION_SQL = """
WITH c AS (SELECT o_orderkey % 6 AS r FROM orders)
SELECT 'earliest_version' AS face, CAST(3 AS BIGINT) AS value
UNION ALL SELECT 'snap_v3', (SELECT CAST(COUNT(*) AS BIGINT) FROM c WHERE r <= 3)
UNION ALL SELECT 'snap_v4', (SELECT CAST(COUNT(*) AS BIGINT) FROM c WHERE r <= 4)
UNION ALL SELECT 'snap_v5', (SELECT CAST(COUNT(*) AS BIGINT) FROM c WHERE r <= 5)
UNION ALL SELECT 'expired_read_raises', CAST(1 AS BIGINT)
UNION ALL SELECT 'expired_ts_raises', CAST(1 AS BIGINT)
UNION ALL SELECT 'history_rows_default', CAST(4 AS BIGINT)
UNION ALL SELECT 'history_rows_page_3_5', CAST(3 AS BIGINT)
UNION ALL SELECT 'history_rows_page_4_5', CAST(2 AS BIGINT)
UNION ALL SELECT 'post_append_head', CAST(6 AS BIGINT)
"""


@register("txlog_retention", _RETENTION_SQL)
def txlog_retention(spark, sf_dir):
    """Log retention end-to-end: a six-commit history (create + five
    appends of the o_orderkey % 6 residue slices) checkpointed at v3,
    appended to v5, then expire_log(keep_versions=3) — commits 0..2
    physically gone, v6 appended after. The oracle recomputes the
    surviving versions' exact row counts from the slicing arithmetic
    (a version-v snapshot is the residues <= v), and states the
    contract booleans: reads and timestamp resolution below the
    horizon raise VersionExpired, history defaults to the surviving
    range and pages within it, and the post-expiry append landed.

    Scale shape: retention bounds the log dir at O(keep_versions)
    JSON files and history cost at O(page); data files and every
    in-horizon read are untouched — the contract that lets a
    10⁶-commit stream table run maintain() forever."""
    import os

    from stockify_spark.registry_ext7 import _scratch_table
    from stockify_spark.sources import txlog

    orders = _t(spark, sf_dir, "orders").select("o_orderkey", "o_totalprice")

    def build(path: str) -> None:
        t = os.path.join(path, "t")
        txlog.create(orders.filter(F.col("o_orderkey") % 6 == 0).coalesce(1), t)
        for r in (1, 2, 3):
            txlog.append(
                orders.filter(F.col("o_orderkey") % 6 == r).coalesce(1), t
            )
        assert txlog.checkpoint_log(t) == 3
        for r in (4, 5):
            txlog.append(
                orders.filter(F.col("o_orderkey") % 6 == r).coalesce(1), t
            )
        removed = txlog.expire_log(t, keep_versions=3)
        assert [n for n in removed if n.endswith(".json")] and len(removed) == 3
        # the table keeps accepting writes after expiry: v6 is an
        # empty append (head advances, slice arithmetic undisturbed)
        txlog.append(
            orders.filter(F.col("o_orderkey") % 6 == 0).limit(0).coalesce(1),
            t,
        )

    root = _scratch_table(sf_dir, "retention", build)
    t = os.path.join(root, "t")
    rows = [("earliest_version", txlog.earliest_version(t))]
    for v in (3, 4, 5):
        rows.append((f"snap_v{v}", txlog.snapshot(spark, t, version=v).count()))
    try:
        txlog.snapshot(spark, t, version=2).count()
        rows.append(("expired_read_raises", 0))
    except txlog.VersionExpired:
        rows.append(("expired_read_raises", 1))
    try:
        txlog.version_at_timestamp(t, txlog.commit_timestamp(t, 3) - 1)
        rows.append(("expired_ts_raises", 0))
    except txlog.VersionExpired:
        rows.append(("expired_ts_raises", 1))
    # default range is earliest..head (v3..v6, incl. the post-expiry
    # append); explicit pages stay inside the surviving window
    rows.append(("history_rows_default", txlog.history(spark, t).count()))
    rows.append(
        ("history_rows_page_3_5", txlog.history(spark, t, start=3, end=5).count())
    )
    rows.append(
        ("history_rows_page_4_5", txlog.history(spark, t, start=4, end=5).count())
    )
    rows.append(("post_append_head", txlog.current_version(t)))
    return spark.createDataFrame(rows, "face string, value long")


# ---------------------------------------------------------------------------
# txlog_maintain_cluster — the clustered form of the maintenance
# policy (Delta's OPTIMIZE ZORDER BY as a threshold decision): the
# small-file trigger runs the full Z-ordered rewrite, the vacuum step
# reclaims the retired fragments in the same pass, and the policy
# converges (call 2 triggers nothing — the convergence gate is the
# target layout width, since at fixture scale compacted files never
# outgrow small_file_bytes). Read-time invariants prove the rewrite
# preserved every row and RESTORED multi-column skipping.
# ---------------------------------------------------------------------------

_MAINTAIN_CLUSTER_SQL = """
SELECT 'call1_compact_triggered' AS face, CAST(1 AS BIGINT) AS value
UNION ALL SELECT 'call1_compact_result', CAST(8 AS BIGINT)
UNION ALL SELECT 'call1_vacuum_result', CAST(8 AS BIGINT)
UNION ALL SELECT 'call2_compact_triggered', CAST(0 AS BIGINT)
UNION ALL SELECT 'call2_vacuum_result', CAST(0 AS BIGINT)
UNION ALL SELECT 'files_live', CAST(4 AS BIGINT)
UNION ALL SELECT 'rows', (SELECT CAST(COUNT(*) AS BIGINT) FROM orders)
UNION ALL SELECT 'pruned_lt_total', CAST(1 AS BIGINT)
"""


@register("txlog_maintain_cluster", _MAINTAIN_CLUSTER_SQL)
def txlog_maintain_cluster(spark, sf_dir):
    """Clustered maintenance end-to-end: an 8-fragment trickle table
    (o_orderkey % 8 residues, one file each) maintained with
    compact_zorder_by=(o_totalprice, o_custkey), target width 4, and
    vacuum_keep_last=1. Call 1 must Z-rewrite into 4 files (commit
    v8) AND reclaim the 8 retired fragments' bytes; call 2 must be a
    fixpoint. Live invariants at read time: 4 live files, the exact
    source row count survived the rewrite+vacuum, and a 2-D
    min-corner probe through the log's min/max boxes opens FEWER
    files than the layout width — the skipping geometry the rewrite
    exists to restore (bench E2c measures the same physics at 16
    files).

    Scale shape: the clustered form is the policy's one O(live set)
    action, gated on layout width so it cannot loop; vacuum's cost is
    O(files reclaimed); the probe is log-metadata-only pruning."""
    import json as _json
    import os

    from stockify_spark.registry_ext7 import _scratch_table
    from stockify_spark.sources import txlog

    orders = _t(spark, sf_dir, "orders").select(
        "o_orderkey", "o_totalprice", "o_custkey"
    )
    pol = {
        "small_file_bytes": 512 << 20,
        "small_file_fraction": 0.5,
        "compact_target_partitions": 4,
        "compact_zorder_by": ["o_totalprice", "o_custkey"],
        "vacuum_keep_last": 1,
    }

    def build(path: str) -> None:
        t = os.path.join(path, "t")
        txlog.create(orders.filter(F.col("o_orderkey") % 8 == 0).coalesce(1), t)
        for r in range(1, 8):
            txlog.append(
                orders.filter(F.col("o_orderkey") % 8 == r).coalesce(1), t
            )
        calls = [txlog.maintain(spark, t, pol) for _ in (1, 2)]
        with open(os.path.join(path, "decisions.json"), "w") as f:
            _json.dump(calls, f)

    root = _scratch_table(sf_dir, "maintaincluster", build)
    t = os.path.join(root, "t")
    with open(os.path.join(root, "decisions.json")) as f:
        c1, c2 = _json.load(f)
    d1 = {d["action"]: d for d in c1}
    d2 = {d["action"]: d for d in c2}
    lo_p, lo_c = orders.agg(
        F.min("o_totalprice"), F.min("o_custkey")
    ).collect()[0]
    pruned = txlog.snapshot_pruned_multi(
        spark,
        t,
        [("o_totalprice", lo_p, lo_p + 1000.0), ("o_custkey", lo_c, lo_c + 5)],
    )
    n_live = len(txlog.live_files(t))
    rows = [
        ("call1_compact_triggered", int(d1["compact_cluster"]["triggered"])),
        ("call1_compact_result", int(d1["compact_cluster"]["result"])),
        ("call1_vacuum_result", int(d1["vacuum"]["result"])),
        ("call2_compact_triggered", int(d2["compact_cluster"]["triggered"])),
        ("call2_vacuum_result", int(d2["vacuum"]["result"])),
        ("files_live", n_live),
        ("rows", txlog.snapshot(spark, t).count()),
        ("pruned_lt_total", int(len(pruned.inputFiles()) < n_live)),
    ]
    return spark.createDataFrame(rows, "face string, value long")
