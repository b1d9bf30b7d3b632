"""Log retention (sources/txlog.expire_log) + history paging — the
r12 verdict's "log retention + history paging" item: commit files are
no longer retained forever; an age/version horizon trims the prefix
below a checkpoint while every in-horizon version stays readable, and
history() pages instead of walking the whole log.
"""

from __future__ import annotations

import os

import pytest

from pyspark.sql import functions as F

from stockify_spark.sources import txlog
from stockify_spark.sources.txlog import VersionExpired

from tests.conftest import SF_SMOKE


@pytest.fixture()
def tmp(tmp_path):
    return str(tmp_path)


def _orders(spark):
    return spark.read.parquet(f"{SF_SMOKE}/orders.parquet").select(
        "o_orderkey", "o_totalprice"
    )


def _build(spark, path, n_appends: int = 9) -> list[int]:
    """create (v0) + n appends (v1..vn); returns per-version counts."""
    o = _orders(spark)
    txlog.create(o.filter(F.col("o_orderkey") % 10 == 0).coalesce(1), path)
    counts = [txlog.snapshot(spark, path).count()]
    for r in range(1, n_appends + 1):
        txlog.append(o.filter(F.col("o_orderkey") % 10 == r).coalesce(1), path)
        counts.append(txlog.snapshot(spark, path).count())
    return counts


class TestExpireLog:
    def test_in_horizon_versions_survive_expiry(self, spark, tmp):
        # checkpoint at v6, then three more commits to v9
        path2 = os.path.join(tmp, "t2")
        o = _orders(spark)
        txlog.create(o.filter(F.col("o_orderkey") % 10 == 0).coalesce(1), path2)
        for r in range(1, 7):
            txlog.append(
                o.filter(F.col("o_orderkey") % 10 == r).coalesce(1), path2
            )
        assert txlog.checkpoint_log(path2) == 6
        for r in range(7, 10):
            txlog.append(
                o.filter(F.col("o_orderkey") % 10 == r).coalesce(1), path2
            )
        pre = {v: txlog.snapshot(spark, path2, version=v).count() for v in range(6, 10)}
        removed = txlog.expire_log(path2, keep_versions=4)  # horizon = 6
        # commits 0..5 gone, nothing else
        assert removed == sorted(f"{v:016d}.json" for v in range(6))
        assert txlog.earliest_version(path2) == 6
        # every in-horizon version reads exactly as before
        for v in range(6, 10):
            assert txlog.snapshot(spark, path2, version=v).count() == pre[v]
        # current reads, appends, history all keep working
        assert txlog.current_version(path2) == 9
        txlog.append(o.filter(F.col("o_orderkey") % 10 == 3).coalesce(1), path2)
        assert txlog.current_version(path2) == 10

    def test_out_of_horizon_reads_raise_documented_error(self, spark, tmp):
        path = os.path.join(tmp, "t")
        _build(spark, path, n_appends=6)
        txlog.checkpoint_log(path)  # at v6
        txlog.append(_orders(spark).limit(5).coalesce(1), path)  # v7
        txlog.expire_log(path, keep_versions=2)  # horizon 6 -> base 6
        with pytest.raises(VersionExpired, match="earliest readable"):
            txlog.snapshot(spark, path, version=3).count()
        with pytest.raises(VersionExpired):
            txlog.commit_timestamp(path, 2)
        with pytest.raises(VersionExpired):
            txlog.restore(path, 1)
        with pytest.raises(VersionExpired):
            txlog.changes(spark, path, 4)
        # a timestamp below the horizon is expired, not "before first"
        ts6 = txlog.commit_timestamp(path, 6)
        with pytest.raises(VersionExpired):
            txlog.version_at_timestamp(path, ts6 - 1)
        assert txlog.version_at_timestamp(path, ts6) == 6
        with pytest.raises(VersionExpired):
            txlog.snapshot(spark, path, timestamp_ms=ts6 - 1)

    def test_no_checkpoint_at_horizon_expires_nothing(self, spark, tmp):
        path = os.path.join(tmp, "t")
        _build(spark, path, n_appends=5)  # v0..v5, no checkpoint
        assert txlog.expire_log(path, keep_versions=2) == []
        assert txlog.earliest_version(path) == 0
        # checkpoint ABOVE the horizon doesn't qualify either
        txlog.checkpoint_log(path)  # at v5; horizon for keep=2 is 4
        assert txlog.expire_log(path, keep_versions=2) == []
        # but a keep window reaching the checkpoint does
        assert txlog.expire_log(path, keep_versions=1) == sorted(
            f"{v:016d}.json" for v in range(5)
        )

    def test_expire_is_idempotent_and_keep_all_is_noop(self, spark, tmp):
        path = os.path.join(tmp, "t")
        _build(spark, path, n_appends=4)
        txlog.checkpoint_log(path)
        txlog.append(_orders(spark).limit(3).coalesce(1), path)
        first = txlog.expire_log(path, keep_versions=1)
        assert first
        assert txlog.expire_log(path, keep_versions=1) == []
        # horizon <= 0: nothing to do on a young table
        path2 = os.path.join(tmp, "young")
        txlog.create(_orders(spark).limit(3).coalesce(1), path2)
        assert txlog.expire_log(path2, keep_versions=100) == []
        with pytest.raises(ValueError):
            txlog.expire_log(path2, keep_versions=0)

    def test_expired_metadata_survives_via_checkpoint(self, spark, tmp):
        """Constraints/renames/txn markers registered BEFORE the
        expired prefix must keep acting after expiry — the checkpoint
        collapse carries them, expire_log only trims what the
        checkpoint already summarized."""
        path = os.path.join(tmp, "t")
        o = _orders(spark)
        txlog.create(o.filter(F.col("o_orderkey") % 2 == 0).coalesce(1), path)
        txlog.rename_column(path, "o_totalprice", "price")
        txlog.set_constraint(path, "pos", "price >= 0")
        txlog.append_idempotent(
            o.filter(F.col("o_orderkey") % 2 == 1)
            .coalesce(1)
            .withColumnRenamed("o_totalprice", "price"),
            path,
            "app",
            7,
        )
        txlog.checkpoint_log(path)  # v3
        txlog.append(
            o.filter(F.col("o_orderkey") % 2 == 1)
            .limit(5)
            .coalesce(1)
            .withColumnRenamed("o_totalprice", "price"),
            path,
        )  # v4
        txlog.expire_log(path, keep_versions=2)  # base 3: drop v0..v2
        assert txlog.earliest_version(path) == 3
        # rename still folds
        assert "price" in txlog.snapshot(spark, path).columns
        # constraint still enforces
        bad = spark.createDataFrame([(1, -5.0)], "o_orderkey long, price double")
        with pytest.raises(txlog.ConstraintViolation):
            txlog.append(bad, path)
        # idempotency marker still suppresses the replay
        v = txlog.current_version(path)
        txlog.append_idempotent(
            o.limit(3).coalesce(1).withColumnRenamed("o_totalprice", "price"),
            path,
            "app",
            7,
        )
        assert txlog.current_version(path) == v

    def test_checkpoint_after_expiry_keeps_working(self, spark, tmp):
        path = os.path.join(tmp, "t")
        _build(spark, path, n_appends=4)
        txlog.checkpoint_log(path)
        txlog.append(_orders(spark).limit(3).coalesce(1), path)
        txlog.expire_log(path, keep_versions=1)
        n = txlog.snapshot(spark, path).count()
        txlog.checkpoint_log(path)
        txlog.append(_orders(spark).limit(2).coalesce(1), path)
        assert txlog.snapshot(spark, path).count() == n + 2


class TestRetentionStreamInterplay:
    def test_batch_face_below_horizon_raises_versionexpired(self, spark, tmp):
        """A batch range read whose starting_version fell below the
        retention horizon fails with the documented retention error
        (naming the earliest readable version), never a bare
        missing-file error; starting at/after the horizon works."""
        from stockify_spark.sources.txlog_stream import register_txlog_stream

        path = os.path.join(tmp, "t")
        _build(spark, path, n_appends=4)  # v0..v4
        txlog.checkpoint_log(path)
        txlog.append(_orders(spark).limit(3).coalesce(1), path)  # v5
        txlog.expire_log(path, keep_versions=2)  # base 4: v0..v3 gone
        register_txlog_stream(spark)

        def read(sv):
            return (
                spark.read.format("txlog_stream")
                .option("path", path)
                .option("starting_version", str(sv))
                .load()
            )

        with pytest.raises(Exception, match="earliest readable"):
            read(0).count()
        with pytest.raises(Exception, match="earliest readable"):
            read(2).count()
        got = read(4)
        assert set(
            r["_commit_version"]
            for r in got.select("_commit_version").distinct().collect()
        ) == {4, 5}

    def test_stream_restart_below_horizon_fails_loud(self, spark, tmp):
        """A streaming checkpoint whose committed offset fell below
        the horizon (commits expired while the stream was down) must
        fail the restart loudly — silently skipping the expired
        commits would drop data exactly-once promised to deliver."""
        from stockify_spark.sources.txlog_stream import register_txlog_stream

        path = os.path.join(tmp, "t")
        o = _orders(spark)
        txlog.create(o.filter(F.col("o_orderkey") % 10 == 0).coalesce(1), path)
        register_txlog_stream(spark)
        ckpt = os.path.join(tmp, "ckpt")
        out = os.path.join(tmp, "out")

        def run_once():
            sdf = (
                spark.readStream.format("txlog_stream")
                .option("path", path)
                .load()
            )
            q = (
                sdf.writeStream.format("parquet")
                .option("path", out)
                .option("checkpointLocation", ckpt)
                .trigger(availableNow=True)
                .start()
            )
            q.awaitTermination(120)

        run_once()  # offset now at v0
        # grow the log while the stream is down, then expire below v3
        for r in (1, 2, 3):
            txlog.append(o.filter(F.col("o_orderkey") % 10 == r).coalesce(1), path)
        txlog.checkpoint_log(path)  # at v3
        txlog.append(o.filter(F.col("o_orderkey") % 10 == 4).coalesce(1), path)
        txlog.expire_log(path, keep_versions=2)  # base 3: v1, v2 expired
        with pytest.raises(Exception, match="removed by log retention"):
            run_once()


class TestHistoryPaging:
    def test_history_pages_and_defaults_to_surviving_range(self, spark, tmp):
        path = os.path.join(tmp, "t")
        _build(spark, path, n_appends=6)  # v0..v6
        h_all = txlog.history(spark, path).collect()
        assert [r["version"] for r in h_all] == list(range(7))
        page = txlog.history(spark, path, start=2, end=4).collect()
        assert [r["version"] for r in page] == [2, 3, 4]
        # page rows equal the corresponding full-walk rows
        assert page == h_all[2:5]
        txlog.checkpoint_log(path)
        txlog.append(_orders(spark).limit(3).coalesce(1), path)  # v7
        txlog.expire_log(path, keep_versions=1)  # base 6
        h = txlog.history(spark, path).collect()
        assert [r["version"] for r in h] == [6, 7]
        with pytest.raises(VersionExpired):
            txlog.history(spark, path, start=1).collect()
        with pytest.raises(FileNotFoundError):
            txlog.history(spark, path, end=99).collect()
        with pytest.raises(ValueError):
            txlog.history(spark, path, start=7, end=6).collect()
