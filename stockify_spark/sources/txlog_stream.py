"""Streaming SOURCE over the txlog commit log — the Delta streaming
read, built on PySpark 4's Python Data Source API (north-star
extension; the reference engine is strictly one-shot batch,
stockify.cu:196-743, SURVEY §2.6).

A 100 TB pipeline doesn't poll snapshots — it TAILS tables: every
commit becomes a micro-batch, offsets are commit versions, and the
log (not a file listing) is the discovery mechanism. This module
supplies that face:

  * ``TxlogStreamDataSource`` — ``spark.readStream.format(...)``
    source emitting each commit's APPENDED rows tagged with
    ``_commit_version``. Offsets are ``{"version": N}`` (all commits
    <= N delivered), so recovery from a streaming checkpoint replays
    deterministically — composed with
    :func:`stockify_spark.sources.txlog.foreach_batch_sink` the
    table-to-table pipeline is exactly-once end to end.
  * The same planning code exposes a BATCH reader (``spark.read``)
    over a version range, so the driver's differential oracle checks
    the identical partition/read path the stream executes.

Scale shape: planning is one driver-side log read per trigger
(O(commits in the batch), never O(table)); each added file is one
input partition read executor-side with pyarrow as Arrow record
batches — no row-at-a-time Python, no driver collect of data.

Non-append commits (COW rewrites, deletion vectors) follow Delta's
streaming contract: the source RAISES by default — silently treating
a rewrite's re-added files as inserts would duplicate rows
downstream — and ``skip_change_commits=true`` (Delta's
``skipChangeCommits``) opts into ignoring them. Row-level
insert/delete feeds for such commits are the batch CDF's job
(:func:`stockify_spark.sources.txlog.changes` /
:func:`stockify_spark.sources.txlog.replicate_changes`) — and FULL
CDF streaming falls out by composition: replicate_changes renders
any table's change feed as an APPEND-ONLY audit table, which this
source streams directly (tests/test_txlog_stream.py::
TestCdfStreamingComposition).
"""

from __future__ import annotations

import json
import os
from collections.abc import Iterator, Sequence

from pyspark.sql.datasource import (
    DataSource,
    DataSourceReader,
    DataSourceStreamReader,
    InputPartition,
)
from pyspark.sql.types import LongType, StructField, StructType

from stockify_spark.sources import txlog


class _FilePartition(InputPartition):
    """One added data file of one commit. Picklable; carries
    everything ``read`` needs (including the column-mapping
    translation) so executors never touch the log."""

    def __init__(self, abs_path: str, version: int, rename: dict, dropped: list):
        self.abs_path = abs_path
        self.version = version
        self.rename = rename  # physical -> logical
        self.dropped = dropped  # tombstoned physical names


def _stats_disjoint(add: dict, bounds: dict, m: dict) -> bool:
    """True iff the file's logged min/max stats PROVE it cannot hold
    a row satisfying the pushed bounds (per-column closed intervals,
    logical names). Bounds are relaxed to closed even for strict
    comparisons and any type mismatch keeps the file — pruning is
    only ever an optimization, Spark re-applies every filter."""
    st = add.get("stats", {})
    for col, (lo, hi) in bounds.items():
        phys = m.get(col, col)
        mn = st.get("min", {}).get(phys)
        mx = st.get("max", {}).get(phys)
        if mn is None or mx is None:
            continue  # no stats for this column: conservatively keep
        try:
            if (hi is not None and mn > hi) or (lo is not None and mx < lo):
                return True
        except TypeError:
            continue  # incomparable types: keep
    return False


def _plan_commits(
    path: str,
    start_after: int,
    end: int,
    skip_change_commits: bool,
    bounds: dict | None = None,
    schema_version: int | None = None,
) -> list[_FilePartition]:
    """Driver-side planning: one partition per file added by commits
    in ``(start_after, end]``. Cost is O(commits planned) log reads.
    The column mapping (renames/drops fold) at ``schema_version``
    ships with every partition so the read surfaces the same logical
    names ``snapshot(version=schema_version)`` would. The batch face
    passes its ``end_version`` (a historical range read must match
    the snapshot at that version); the STREAMING face passes None =
    current head — a live tail surfaces today's names for yesterday's
    commits, and a checkpoint replay after a rename re-reads old
    commits under the post-rename names, consistent with the
    restart-to-pick-up-schema rule :func:`_read_partition` enforces.
    ``bounds`` (from the batch face's pushFilters) skips files whose
    logged min/max stats are provably disjoint — the txlog's
    log-level data skipping, surfaced through the datasource
    pushdown API."""
    m, dropped = txlog._fold_schema(path, schema_version)
    rename = {p: lg for lg, p in m.items()}
    bounds = bounds or {}
    # a bound on _commit_version narrows the VERSION loop itself
    if "_commit_version" in bounds:
        import math

        lo, hi = bounds["_commit_version"]
        if lo is not None:
            start_after = max(start_after, int(math.ceil(lo)) - 1)
        if hi is not None:
            end = min(end, int(math.floor(hi)))
    data_bounds = {c: b for c, b in bounds.items() if c != "_commit_version"}
    parts: list[_FilePartition] = []
    for v in range(start_after + 1, end + 1):
        cpath = txlog._commit_path(path, v)
        if not os.path.exists(cpath):
            raise ValueError(f"version {v} not found at {path}")
        with open(cpath) as f:
            actions = json.load(f)["actions"]
        is_change = any("remove" in a or "add_dv" in a or "remove_dv" in a for a in actions)
        if is_change:
            if skip_change_commits:
                continue
            raise ValueError(
                f"commit {v} at {path} rewrites or deletes data; the "
                "append stream cannot represent it as inserts. Use "
                "skip_change_commits=true to ignore such commits, or "
                "the batch change feed (txlog.changes / "
                "txlog.replicate_changes) for row-level deltas."
            )
        for a in actions:
            if "add" not in a:
                continue
            if data_bounds and _stats_disjoint(a["add"], data_bounds, m):
                continue  # provably no qualifying rows — never opened
            f_abs = txlog._abs(path, a["add"]["path"])
            if not os.path.exists(f_abs):
                raise FileNotFoundError(
                    f"data file of commit {v} was vacuumed: {a['add']['path']}; "
                    "a stream starting below the retention window cannot "
                    "replay it — raise starting_version past the vacuum"
                )
            parts.append(_FilePartition(f_abs, v, rename, sorted(dropped)))
    return parts


def _read_partition(partition: _FilePartition, n_cols: int) -> Iterator:
    """Executor-side: one parquet file → tombstoned columns dropped,
    physical names renamed to logical, a ``_commit_version`` column
    appended — Arrow record batches out. ``n_cols`` pins the data
    column count so a file written before an additive schema change
    fails loudly instead of mis-aligning positionally."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    table = pq.read_table(partition.abs_path)
    drop = [c for c in table.column_names if c in set(partition.dropped)]
    if drop:
        table = table.drop_columns(drop)
    if partition.rename:
        table = table.rename_columns(
            [partition.rename.get(c, c) for c in table.column_names]
        )
    if table.num_columns != n_cols:
        raise ValueError(
            f"file {partition.abs_path} has {table.num_columns} columns, "
            f"stream schema expects {n_cols}; the append stream does not "
            "support schema evolution mid-stream — restart the stream to "
            "pick up the widened schema"
        )
    ver = pa.array([partition.version] * table.num_rows, type=pa.int64())
    table = table.append_column("_commit_version", ver)
    yield from table.to_batches()


def _table_schema(path: str, version: int | None = None) -> StructType:
    """Table schema from a live file's parquet footer (the txlog
    source of truth — parquet footers per immutable file) with the
    column mapping applied (logical names, tombstoned columns
    excluded), plus the stream's ``_commit_version``. One footer
    read, driver-side. ``version`` (the batch face's end_version)
    folds names and live files AS OF that version so a historical
    range read matches ``snapshot(version=...)``; None = head (the
    streaming face)."""
    import pyarrow.parquet as pq

    from pyspark.sql.pandas.types import from_arrow_schema

    files = txlog.live_files(path, version)
    if not files:
        raise FileNotFoundError(f"empty txlog table at {path}")
    m, dropped = txlog._fold_schema(path, version)
    rename = {p: lg for lg, p in m.items()}
    spark_schema = from_arrow_schema(pq.read_schema(files[-1]))
    fields = [
        StructField(rename.get(f.name, f.name), f.dataType, f.nullable)
        for f in spark_schema.fields
        if f.name not in dropped
    ]
    return StructType(
        fields + [StructField("_commit_version", LongType(), False)]
    )


class _TxlogStreamReader(DataSourceStreamReader):
    def __init__(self, schema: StructType, options: dict):
        if "path" not in options:
            raise ValueError("txlog_stream requires a 'path' option")
        self._path = options["path"]
        # starting_version is INCLUSIVE (Delta's startingVersion);
        # default 0 replays the table's whole append history
        self._start = int(options.get("starting_version", 0))
        self._skip_changes = str(options.get("skip_change_commits", "false")).lower() == "true"
        self._n_cols = len(schema.fields) - 1  # minus _commit_version
        # Delta's maxFilesPerTrigger analog at the txlog's natural
        # granularity: cap each micro-batch at N COMMITS so a fresh
        # consumer of a long-history table drains the backlog in
        # bounded batches instead of one table-sized batch (at 100 TB
        # that is an OOM, not a stream).
        mx = options.get("max_commits_per_trigger")
        self._max = int(mx) if mx is not None else None
        if self._max is not None and self._max < 1:
            raise ValueError("max_commits_per_trigger must be >= 1")
        # last offset this RUN has planned up to — the cap's base.
        # The python datasource API has no admission-control
        # handshake (latestOffset takes no start offset), so the
        # reader tracks it: initialOffset pins it for FRESH streams
        # (capped from batch 0); partitions()/commit() re-sync it
        # when the engine replays a checkpointed batch after restart.
        self._base: int | None = None


    def initialOffset(self) -> dict:
        # never REWIND the cap base: the engine asks latestOffset
        # before initialOffset on a fresh stream, and that first
        # answer may already have advanced past start - 1
        if self._base is None:
            self._base = self._start - 1
        return {"version": self._start - 1}

    def latestOffset(self) -> dict:
        head = txlog.current_version(self._path)
        if self._max is None:
            return {"version": head}
        if self._base is None:
            # First offset request of this reader's life. Two cases,
            # both safe to cap from (starting_version - 1):
            #   * fresh stream — the engine asks latestOffset BEFORE
            #     initialOffset (observed pyspark 4.1.2 ordering), so
            #     this IS batch 0's end: capping here is what bounds
            #     a fresh consumer's first batch;
            #   * restart — the engine re-plans the offset log's last
            #     batch through partitions(start, end) BEFORE its
            #     first latestOffset call (observed for committed and
            #     uncommitted last batches alike), which re-syncs
            #     _base to the checkpoint, so this branch is never
            #     reached with a stale base and can never rewind the
            #     offset log below delivered commits.
            self._base = self._start - 1

        end = max(min(head, self._base + self._max), self._base)
        self._base = end
        return {"version": end}

    def partitions(self, start: dict, end: dict) -> Sequence[InputPartition]:
        e = int(end["version"])
        if self._base is None or e > self._base:
            self._base = e  # re-run of a restored uncommitted batch
        return _plan_commits(
            self._path, int(start["version"]), e, self._skip_changes
        )

    def read(self, partition: InputPartition) -> Iterator:
        return _read_partition(partition, self._n_cols)

    def commit(self, end: dict) -> None:
        # offsets live in the engine's streaming checkpoint; the log
        # itself is immutable — nothing to reclaim. Keep the cap's
        # base in sync as a defense-in-depth (partitions already did).
        e = int(end["version"])
        if self._base is None or e > self._base:
            self._base = e


class _TxlogBatchReader(DataSourceReader):
    """Batch face over the SAME plan/read path: appended rows for
    commits in [starting_version, end_version] — how the driver's
    differential oracle pins the stream's per-commit semantics.
    See :class:`_TxlogBatchReaderPushdown` for the filter-pushdown
    variant (log-level data skipping); Spark REFUSES any reader that
    merely defines ``pushFilters`` while
    ``spark.sql.python.filterPushdown.enabled`` is false, so the
    capability lives in a subclass the DataSource picks only when the
    session has it enabled — a vanilla session gets this plain reader
    and identical results."""

    def __init__(self, schema: StructType, options: dict):
        if "path" not in options:
            raise ValueError("txlog_stream requires a 'path' option")
        self._path = options["path"]
        self._start = int(options.get("starting_version", 0))
        end = options.get("end_version")
        self._end = int(end) if end is not None else txlog.current_version(options["path"])
        self._skip_changes = str(options.get("skip_change_commits", "false")).lower() == "true"
        self._n_cols = len(schema.fields) - 1
        self._bounds: dict = {}

    def partitions(self) -> Sequence[InputPartition]:
        # schema folds at end_version: a historical range read must
        # surface the names/columns snapshot(version=end) would, not
        # post-range renames/drops (version-faithful, like changes())
        return _plan_commits(
            self._path,
            self._start - 1,
            self._end,
            self._skip_changes,
            self._bounds,
            schema_version=self._end,
        )

    def read(self, partition: InputPartition) -> Iterator:
        return _read_partition(partition, self._n_cols)


class _TxlogBatchReaderPushdown(_TxlogBatchReader):
    """Batch reader with datasource filter pushdown as LOG-LEVEL DATA
    SKIPPING: comparison filters prune files by their logged min/max
    stats (and a ``_commit_version`` bound narrows the commit range
    itself); every filter is returned to Spark for re-evaluation, so
    pushdown only removes provably-disjoint IO and can never change
    results."""

    def pushFilters(self, filters):
        from pyspark.sql.datasource import (
            EqualTo,
            GreaterThan,
            GreaterThanOrEqual,
            LessThan,
            LessThanOrEqual,
        )

        for f in filters:
            if not isinstance(
                f, (EqualTo, GreaterThan, GreaterThanOrEqual, LessThan, LessThanOrEqual)
            ) or len(f.attribute) != 1:
                continue  # unsupported shape: Spark evaluates it, no pruning
            col = f.attribute[0]
            lo, hi = self._bounds.get(col, (None, None))
            v = f.value
            try:
                # strict bounds relax to closed — conservative pruning
                if isinstance(f, EqualTo):
                    lo = v if lo is None else max(lo, v)
                    hi = v if hi is None else min(hi, v)
                elif isinstance(f, (GreaterThan, GreaterThanOrEqual)):
                    lo = v if lo is None else max(lo, v)
                else:
                    hi = v if hi is None else min(hi, v)
            except TypeError:
                continue
            self._bounds[col] = (lo, hi)
        # every filter goes back to Spark: pushdown PRUNES, never decides
        return filters


class TxlogStreamDataSource(DataSource):
    """``txlog_stream`` format: register once per session with
    ``spark.dataSource.register(TxlogStreamDataSource)``, then

        spark.readStream.format("txlog_stream")
             .option("path", table_path).load()

    Options: ``path`` (required), ``starting_version`` (inclusive,
    default 0), ``skip_change_commits`` (default false — raise on
    COW/DV commits), ``max_commits_per_trigger`` (streaming face:
    cap each micro-batch at N commits — Delta's maxFilesPerTrigger
    analog — so a long backlog drains in bounded batches), and for
    the batch face ``end_version`` (inclusive, default: table head
    at planning time; the range read's schema folds as of this
    version, matching ``snapshot(version=end_version)``)."""

    @classmethod
    def name(cls) -> str:
        return "txlog_stream"

    def schema(self) -> StructType:
        # the batch face reads a version range, so its schema is the
        # fold AS OF end_version; the streaming face (no end_version
        # option) tails at head schema
        end = self.options.get("end_version")
        return _table_schema(
            self.options["path"], int(end) if end is not None else None
        )

    def streamReader(self, schema: StructType) -> DataSourceStreamReader:
        return _TxlogStreamReader(schema, self.options)

    def reader(self, schema: StructType) -> DataSourceReader:
        # the pushdown-capable reader only where the session allows
        # it: Spark raises DATA_SOURCE_PUSHDOWN_DISABLED for ANY
        # reader defining pushFilters under a false conf, so a
        # vanilla session must get the plain reader (same results,
        # no file skipping). reader() runs driver-side with the
        # active session in scope.
        try:
            from pyspark.sql import SparkSession

            sess = SparkSession.getActiveSession()
            enabled = (
                sess is not None
                and str(
                    sess.conf.get("spark.sql.python.filterPushdown.enabled", "false")
                ).lower()
                == "true"
            )
        except Exception:
            enabled = False
        cls = _TxlogBatchReaderPushdown if enabled else _TxlogBatchReader
        return cls(schema, self.options)


def register_txlog_stream(spark) -> None:
    """Idempotent per-session registration of the format."""
    spark.dataSource.register(TxlogStreamDataSource)
