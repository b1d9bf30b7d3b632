"""In-commit timestamps + TIMESTAMP AS OF time travel
(sources/txlog.commit_timestamp / version_at_timestamp /
snapshot(timestamp_ms=...)).

Every commit carries a strictly monotone epoch-millis timestamp
(max(now, prev+1) — Delta's In-Commit Timestamps rule), so
timestamp resolution is a binary search over the dense version
range and stays well-defined even when the wall clock steps
backwards between commits.
"""

from __future__ import annotations

import os

import pytest

from stockify_spark.sources import txlog


def _mk(spark, tmp_path, n_commits=4):
    path = os.path.join(str(tmp_path), "t")
    df0 = spark.range(0, 10).selectExpr("id", "id * 2 AS v")
    txlog.create(df0, path)
    for i in range(1, n_commits):
        txlog.append(
            spark.range(10 * i, 10 * (i + 1)).selectExpr("id", "id * 2 AS v"),
            path,
        )
    return path


def test_timestamps_strictly_monotone(spark, tmp_path):
    path = _mk(spark, tmp_path)
    ts = [txlog.commit_timestamp(path, v) for v in range(4)]
    assert ts == sorted(ts)
    assert len(set(ts)) == 4  # strict


def test_monotone_under_backwards_clock(spark, tmp_path, monkeypatch):
    path = _mk(spark, tmp_path, n_commits=2)
    t1 = txlog.commit_timestamp(path, 1)
    # clock steps back a full minute: the next commit must still be
    # strictly newer than its predecessor
    monkeypatch.setattr(txlog, "_now_ms", lambda: t1 - 60_000)
    txlog.append(spark.range(100, 110).selectExpr("id", "id * 2 AS v"), path)
    assert txlog.commit_timestamp(path, 2) == t1 + 1


def test_version_at_timestamp_resolution(spark, tmp_path):
    path = _mk(spark, tmp_path)
    ts = [txlog.commit_timestamp(path, v) for v in range(4)]
    for v in range(4):
        assert txlog.version_at_timestamp(path, ts[v]) == v
        # between commit v and v+1 resolves to v
        if v < 3 and ts[v] + 1 < ts[v + 1]:
            assert txlog.version_at_timestamp(path, ts[v] + 1) == v
    # far future resolves to head; before the first commit raises
    assert txlog.version_at_timestamp(path, ts[-1] + 10**9) == 3
    with pytest.raises(FileNotFoundError):
        txlog.version_at_timestamp(path, ts[0] - 1)


def test_snapshot_timestamp_as_of(spark, tmp_path):
    path = _mk(spark, tmp_path)
    ts1 = txlog.commit_timestamp(path, 1)
    got = txlog.snapshot(spark, path, timestamp_ms=ts1)
    assert got.count() == 20  # versions 0 and 1
    assert got.agg({"id": "max"}).collect()[0][0] == 19
    # equals the version-pinned snapshot exactly
    want = txlog.snapshot(spark, path, version=1)
    assert sorted(map(tuple, got.collect())) == sorted(map(tuple, want.collect()))
    with pytest.raises(ValueError):
        txlog.snapshot(spark, path, version=1, timestamp_ms=ts1)


def test_commit_timestamp_unknown_version(spark, tmp_path):
    path = _mk(spark, tmp_path, n_commits=1)
    with pytest.raises(FileNotFoundError):
        txlog.commit_timestamp(path, 5)


def test_resolution_survives_checkpoint(spark, tmp_path):
    """checkpoint_log collapses replay, but commit files (and their
    timestamps) stay — timestamp travel must keep resolving
    pre-checkpoint versions."""
    path = _mk(spark, tmp_path)
    txlog.checkpoint_log(path)
    txlog.append(spark.range(40, 50).selectExpr("id", "id * 2 AS v"), path)
    ts0 = txlog.commit_timestamp(path, 0)
    assert txlog.version_at_timestamp(path, ts0) == 0
    assert txlog.snapshot(spark, path, timestamp_ms=ts0).count() == 10


def test_failed_timestamp_read_cannot_brick_the_log(spark, tmp_path, monkeypatch):
    """All fallible commit work (timestamp derivation, body
    serialization) runs BEFORE the O_EXCL create: a failure there
    must leave NO empty version file, or every later replay of the
    table raises JSONDecodeError forever."""
    path = _mk(spark, tmp_path, n_commits=1)

    def boom():
        raise OSError("simulated clock failure")

    monkeypatch.setattr(txlog, "_now_ms", boom)
    with pytest.raises(OSError):
        txlog.append(spark.range(10, 20).selectExpr("id", "id * 2 AS v"), path)
    monkeypatch.undo()
    assert not os.path.exists(txlog._commit_path(path, 1))
    assert txlog.current_version(path) == 0
    assert txlog.snapshot(spark, path).count() == 10  # table intact


def test_timestamps_monotone_under_concurrent_writers(spark, tmp_path):
    """The in-commit timestamp is derived INSIDE the optimistic
    commit loop (read prev ts → atomic link-publication of the full
    body), so racing writers must still produce a strictly
    increasing ts sequence across the versions they land — the
    invariant timestamp resolution's binary search depends on."""
    import threading

    path = _mk(spark, tmp_path, n_commits=1)
    rows = [(i, i * 2) for i in range(100, 160)]
    errs = []

    def writer(i: int) -> None:
        try:
            df = spark.createDataFrame(rows[i * 10 : (i + 1) * 10], "id long, v long")
            txlog.append(df, path)
        except Exception as e:  # pragma: no cover
            errs.append(e)

    threads = [threading.Thread(target=writer, args=(i,)) for i in range(6)]
    for t in threads:
        t.start()
    for t in threads:
        t.join()
    assert not errs, errs
    head = txlog.current_version(path)
    assert head == 6
    ts = [txlog.commit_timestamp(path, v) for v in range(head + 1)]
    assert ts == sorted(ts) and len(set(ts)) == len(ts)  # strictly increasing
    # and resolution still lands on exact versions
    for v in (0, 3, head):
        assert txlog.version_at_timestamp(path, ts[v]) == v
