"""Round-7 wave 2 behavioral tests: Bloom filter contract (no false
negatives, bounded false positives), BFS hop distances on a
hand-built graph, txlog VACUUM physical-deletion semantics, and the
resample forward-fill invariants. The differential oracle gate
(tools/check_oracle.py) covers value-exactness; these pin the
properties the oracles can't state."""

from __future__ import annotations

import os
import tempfile

from pyspark.sql import functions as F

from stockify_spark.registry import QUERIES

SF = "/root/testdata/sf0.001"


def test_bloom_no_false_negatives_and_bounded_fp_rate(spark):
    from stockify_spark.operators.bloom import bloom_build, bloom_might_contain

    members = spark.range(0, 500).select(F.col("id").alias("k"))
    bitmap = bloom_build(members, "k", m_bits=1 << 14, k=3)
    # every member must probe true (Bloom's hard guarantee)
    hits = members.filter(bloom_might_contain(bitmap, "k", m_bits=1 << 14, k=3))
    assert hits.count() == 500
    # non-members: fp rate ~ (1 - e^(-kn/m))^k ≈ 0.2% at n=500,
    # m=16384, k=3 — allow a wide margin, but it must prune almost all
    others = spark.range(10_000, 30_000).select(F.col("id").alias("k"))
    fp = others.filter(bloom_might_contain(bitmap, "k", m_bits=1 << 14, k=3)).count()
    assert fp < 200, f"false-positive rate too high: {fp}/20000"


def test_bfs_hops_hand_graph(spark):
    from stockify_spark.operators.graph import bfs_hops

    # path 0-1-2-3-4 plus a disconnected 8-9 edge; undirected
    edges = spark.createDataFrame(
        [(0, 1), (1, 2), (2, 3), (3, 4), (8, 9)], "a long, b long"
    )
    sym = edges.unionAll(edges.select(F.col("b").alias("a"), F.col("a").alias("b")))
    sources = spark.createDataFrame([(0,)], "node long")
    got = {r.node: r.hops for r in bfs_hops(sym, sources, max_hops=3).collect()}
    assert got == {0: 0, 1: 1, 2: 2, 3: 3}  # 4 is beyond max_hops; 8,9 unreachable


def test_txlog_vacuum_deletes_only_unreferenced(spark):
    from stockify_spark.sources import txlog

    path = tempfile.mkdtemp(prefix="txlog_vac_")
    df = spark.range(0, 100).select(F.col("id").alias("k"))
    v0 = txlog.create(df.repartition(2), path)
    v0_files = set(txlog.live_files(path))
    txlog.delete_where(spark, path, F.col("k") < 50)
    # COW delete: v0's files still on disk, old snapshot readable
    assert all(os.path.exists(f) for f in v0_files)
    assert txlog.snapshot(spark, path, version=v0).count() == 100
    deleted = txlog.vacuum(path, keep_last=1)
    assert deleted, "vacuum should delete the rewritten files"
    live = set(txlog.live_files(path))
    # live files untouched, every deleted file is gone and was not live
    assert all(os.path.exists(f) for f in live)
    for rel in deleted:
        fpath = os.path.join(path, rel)
        assert not os.path.exists(fpath)
        assert fpath not in live
    # the current snapshot still reads exactly the surviving rows
    assert txlog.snapshot(spark, path).count() == 50


def test_txlog_vacuum_respects_retention_window(spark):
    from stockify_spark.sources import txlog

    path = tempfile.mkdtemp(prefix="txlog_vac2_")
    df = spark.range(0, 100).select(F.col("id").alias("k"))
    v0 = txlog.create(df.repartition(2), path)
    txlog.delete_where(spark, path, F.col("k") < 50)
    # keep_last=2 retains the create version's file set: nothing deletable
    assert txlog.vacuum(path, keep_last=2) == []
    assert txlog.snapshot(spark, path, version=v0).count() == 100


def test_resample_grid_is_dense_and_fill_is_monotone(spark):
    out = QUERIES["window_resample"](spark, SF)
    one = out.filter(F.col("user_id") == 3).orderBy("day").collect()
    assert len(one) >= 2
    # dense daily grid: consecutive ISO days
    import datetime

    days = [datetime.date.fromisoformat(r.day) for r in one]
    assert all(
        (b - a).days == 1 for a, b in zip(days, days[1:])
    ), "grid must have no gaps"
    # forward fill: a filled row carries the previous row's value
    for prev, cur in zip(one, one[1:]):
        if cur.filled and prev.value_ff is not None:
            assert cur.value_ff == prev.value_ff


def test_windowed_topk_streaming_face(spark):
    """The streaming face of stream_topk_windowed: run the windowed
    aggregate under readStream + foreachBatch(rank_topk) and compare
    against the batch answer (complete output over the full file)."""
    from stockify_spark.streaming.windows import (
        rank_topk,
        stream_events,
        windowed_topk,
    )

    batch = {
        (r.window_start, r.event_type, r.n)
        for r in QUERIES["stream_topk_windowed"](spark, SF).collect()
    }
    stream = stream_events(spark, SF, max_files_per_trigger=1)
    agg = windowed_topk(stream, window="1 hour", k=3, streaming=True)
    rows = []

    def sink(df, _epoch):
        rows.append(df.collect())

    q = (
        agg.writeStream.outputMode("complete")
        .foreachBatch(sink)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    final = rows[-1]
    ranked = rank_topk(spark.createDataFrame(final, agg.schema), k=3)
    got = {(r.window_start, r.event_type, r.n) for r in ranked.collect()}
    assert got == batch
