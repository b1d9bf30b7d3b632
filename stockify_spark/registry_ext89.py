"""Round-10 extension: streaming CDF source, exactly-once change
replication, column-mapping schema evolution, multi-table atomic
transactions, exact substring dedup (Lee et al. 2022), and dynamic
partition pruning — the r9 verdict's items 2-3 and 5-7.

The reference engine (stockify.cu:196-743) is one-shot batch over two
hardcoded columns; everything here is north-star surface (SURVEY
§7.6) with the same evidence discipline as the rest of the registry:
every query has a DuckDB closed-form oracle, builds assert their own
invariants, and scale shapes are stated per docstring.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from stockify_spark.registry import _t, register

# ---------------------------------------------------------------------------
# Streaming source over the commit log — batch face of the SAME
# plan/read path the readStream executes (sources/txlog_stream.py;
# the streaming face runs under trigger(availableNow) with checkpoint
# resume in tests/test_txlog_stream.py).
# ---------------------------------------------------------------------------

_STREAM_APPENDS_SQL = """
SELECT o_orderkey,
       ROUND(o_totalprice, 2) AS o_totalprice,
       CAST(o_orderkey % 4 AS BIGINT) AS _commit_version
FROM orders
"""


@register("txlog_stream_appends", _STREAM_APPENDS_SQL)
def txlog_stream_appends(spark, sf_dir):
    """Tail-the-table face: commits v0..v3 each append one key
    residue class, v4 is a COW delete (a CHANGE commit). The read
    runs with skip_change_commits=true, so it must deliver exactly
    the appended rows of v0..v3 tagged with their commit version and
    ignore v4 — Delta's skipChangeCommits streaming contract. The
    build also asserts the default mode REFUSES the change commit
    (silently streaming a rewrite as inserts would duplicate rows).

    Scale shape: planning is one driver log read per trigger; each
    added file is one executor-side Arrow read. No shuffle at all —
    the source is a pure scan."""
    from stockify_spark.registry_ext7 import _scratch_table
    from stockify_spark.sources import txlog
    from stockify_spark.sources.txlog_stream import register_txlog_stream

    def build(path: str) -> None:
        o = _t(spark, sf_dir, "orders").select("o_orderkey", "o_totalprice")
        txlog.create(o.filter(F.col("o_orderkey") % 4 == 0).coalesce(1), path)
        for r in (1, 2, 3):
            txlog.append(o.filter(F.col("o_orderkey") % 4 == r).coalesce(1), path)
        txlog.delete_where(spark, path, F.col("o_totalprice") < 50000.0)  # v4
        register_txlog_stream(spark)
        try:
            spark.read.format("txlog_stream").option("path", path).load().count()
            raise AssertionError("change commit must be refused by default")
        except Exception as e:  # AnalysisException wrapping the ValueError
            assert "skip_change_commits" in str(e)

    path = _scratch_table(sf_dir, "tstream", build)
    register_txlog_stream(spark)
    df = (
        spark.read.format("txlog_stream")
        .option("path", path)
        .option("end_version", "4")
        .option("skip_change_commits", "true")
        .load()
    )
    return df.select(
        "o_orderkey",
        F.round("o_totalprice", 2).alias("o_totalprice"),
        "_commit_version",
    )


# ---------------------------------------------------------------------------
# Exactly-once change-feed replication — the end-to-end pipeline the
# r9 verdict asked for: CDF read per commit + idempotent sink, resume
# position derived from the DESTINATION's own txn markers.
# ---------------------------------------------------------------------------

_STREAM_CDF_SQL = """
WITH base AS (SELECT o_orderkey, o_totalprice FROM orders)
SELECT o_orderkey, ROUND(o_totalprice, 2) AS o_totalprice,
       'insert' AS _change_type, CAST(0 AS BIGINT) AS _src_version
FROM base WHERE o_orderkey % 3 <> 0
UNION ALL
SELECT o_orderkey, ROUND(o_totalprice, 2), 'insert', CAST(1 AS BIGINT)
FROM base WHERE o_orderkey % 3 = 0
UNION ALL
SELECT o_orderkey, ROUND(o_totalprice, 2), 'delete', CAST(2 AS BIGINT)
FROM base WHERE o_totalprice < 30000
UNION ALL
SELECT o_orderkey, ROUND(o_totalprice, 2), 'delete', CAST(3 AS BIGINT)
FROM base WHERE o_totalprice >= 30000 AND o_orderkey % 10 = 0
UNION ALL
SELECT o_orderkey, ROUND(o_totalprice, 2), 'insert', CAST(4 AS BIGINT)
FROM base WHERE o_totalprice >= 30000 AND o_orderkey % 10 = 0
"""


@register("txlog_stream_cdf", _STREAM_CDF_SQL)
def txlog_stream_cdf(spark, sf_dir):
    """Scripted history — v0 create (%3!=0), v1 append (%3==0), v2
    COW delete (<30000), v3 MOR delete (%10==0 of the survivors), v4
    restore(2) — replicated into an audit table by
    txlog.replicate_changes with a DELIBERATE mid-pipeline stop at
    v2 and a resume, plus a full replay that must be a no-op: the
    oracle pins the exact multiset of change rows, so a duplicated
    or skipped version hash-mismatches.

    Scale shape: per delivered commit, cost is O(rows the commit
    touched) (changes() reads only the commit's files/sidecars);
    resume position is one driver-side log read of the destination."""
    from stockify_spark.registry_ext7 import _scratch_table
    from stockify_spark.sources import txlog

    def build(root: str) -> None:
        import os

        src, dst = os.path.join(root, "src"), os.path.join(root, "dst")
        o = _t(spark, sf_dir, "orders").select("o_orderkey", "o_totalprice")
        txlog.create(
            o.filter(F.col("o_orderkey") % 3 != 0).repartitionByRange(2, "o_orderkey"),
            src,
        )
        txlog.append(o.filter(F.col("o_orderkey") % 3 == 0), src)
        txlog.delete_where(spark, src, F.col("o_totalprice") < 30000.0)
        txlog.delete_where_dv(spark, src, F.col("o_orderkey") % 10 == 0)
        assert txlog.restore(src, 2) == 4
        # partial delivery (simulated crash after v2), then resume
        assert txlog.replicate_changes(spark, src, dst, "cdf", to_version=2) == 2
        assert txlog.last_txn_version(dst, "cdf") == 2
        assert txlog.replicate_changes(spark, src, dst, "cdf") == 4
        n = txlog.snapshot(spark, dst).count()
        txlog.replicate_changes(spark, src, dst, "cdf")  # replay: no-op
        assert txlog.snapshot(spark, dst).count() == n

    root = _scratch_table(sf_dir, "cdfpipe", build)
    import os

    feed = txlog.snapshot(spark, os.path.join(root, "dst"))
    return feed.select(
        "o_orderkey",
        F.round("o_totalprice", 2).alias("o_totalprice"),
        "_change_type",
        "_src_version",
    )


# ---------------------------------------------------------------------------
# Column mapping — rename without rewrite (Delta's column-mapping
# mode; r9 verdict #5). The acceptance case is the POST-RENAME pruned
# read: log-level stats skipping must keep working through the
# logical→physical translation.
# ---------------------------------------------------------------------------

_COLMAP_SQL = """
SELECT o_orderkey, ROUND(o_totalprice, 2) AS price
FROM orders WHERE o_totalprice BETWEEN 30000 AND 60000
UNION ALL
SELECT o_orderkey + 10000000 AS o_orderkey, CAST(45000.0 AS DOUBLE) AS price
FROM orders WHERE o_orderkey % 100 = 0
"""


@register("txlog_column_mapping", _COLMAP_SQL)
def txlog_column_mapping(spark, sf_dir):
    """History: create → compact sorted on o_totalprice (4 range
    files) → RENAME o_totalprice→price (metadata-only: the build
    asserts the live file set is unchanged and time travel to v0
    still shows the old name) → MOR delete price<20000 via the
    LOGICAL name → append a logical-named batch (keys+10M at 45000).
    The query is a pruned range read [30000, 60000] on the NEW name;
    the build asserts files are actually skipped (pruning translates
    to the physical stat keys), and the appended rows land in-range,
    proving post-rename writes translate back to physical names.

    Scale shape: the rename is one log write at any table size; the
    pruned read opens only range-intersecting files."""
    from stockify_spark.registry_ext7 import _scratch_table
    from stockify_spark.sources import txlog

    def build(path: str) -> None:
        o = _t(spark, sf_dir, "orders").select("o_orderkey", "o_totalprice")
        txlog.create(o.repartition(2), path)
        txlog.compact(spark, path, target_partitions=4, sort_by="o_totalprice")
        files_before = sorted(txlog.live_files(path))
        assert txlog.rename_column(path, "o_totalprice", "price") == 2
        assert sorted(txlog.live_files(path)) == files_before  # zero rewrite
        assert txlog.snapshot(spark, path, 0).columns == ["o_orderkey", "o_totalprice"]
        txlog.delete_where_dv(spark, path, F.col("price") < 20000.0)
        extra = o.filter(F.col("o_orderkey") % 100 == 0).select(
            (F.col("o_orderkey") + 10_000_000).alias("o_orderkey"),
            F.lit(45000.0).alias("price"),
        )
        txlog.append(extra, path)
        pruned = txlog.snapshot_pruned(spark, path, "price", 30000.0, 60000.0)
        n_live = len(txlog.live_files(path))
        assert len(pruned.inputFiles()) < n_live, (len(pruned.inputFiles()), n_live)

    path = _scratch_table(sf_dir, "cmap", build)
    pruned = txlog.snapshot_pruned(spark, path, "price", 30000.0, 60000.0)
    return pruned.select("o_orderkey", F.round("price", 2).alias("price"))


# ---------------------------------------------------------------------------
# Multi-table atomic transaction — WAL/redo two-phase commit (r9
# verdict #7): "write features AND update the index" is
# all-or-nothing across two txlog tables.
# ---------------------------------------------------------------------------

_MTXN_SQL = """
SELECT o_custkey,
       CAST(COUNT(*) AS BIGINT) AS n_feat,
       CAST(COUNT(*) AS BIGINT) AS n_idx
FROM orders GROUP BY o_custkey
"""


@register("txlog_multi_txn", _MTXN_SQL)
def txlog_multi_txn(spark, sf_dir):
    """Three transactions, each appending a feature batch to one
    table AND its per-customer count delta to a second (the index):
    txn0 and txn1 commit cleanly; txn2 is CRASHED between the two
    per-table commits (fault injection after the manifest publish —
    features got the batch, the index did not). The build asserts the
    in-doubt state is visible (pending_multi), then recover_multi
    REDOES the missing index commit idempotently. The query joins a
    fresh per-customer recount of the features table against the
    index's maintained counts — equal columns prove cross-table
    consistency; the oracle is the closed form over orders.

    Scale shape: the manifest is O(tables × files) metadata; recovery
    replays only commits whose manifest id is absent from a table's
    log — never data work for completed tables."""
    import os

    from stockify_spark.registry_ext7 import _scratch_table
    from stockify_spark.sources import txlog

    def build(root: str) -> None:
        feat, idx = os.path.join(root, "feat"), os.path.join(root, "idx")
        o = _t(spark, sf_dir, "orders").select("o_custkey", "o_orderkey", "o_totalprice")

        def delta(batch):
            return batch.groupBy("o_custkey").agg(
                F.count(F.lit(1)).cast("long").alias("n")
            )

        b0 = o.filter(F.col("o_orderkey") % 2 == 0)
        b1 = o.filter((F.col("o_orderkey") % 2 == 1) & (F.col("o_orderkey") % 3 != 0))
        b2 = o.filter((F.col("o_orderkey") % 2 == 1) & (F.col("o_orderkey") % 3 == 0))
        txlog.commit_multi([(b0, feat), (delta(b0), idx)], root)
        txlog.commit_multi([(b1, feat), (delta(b1), idx)], root)
        assert txlog.pending_multi(root) == []
        # fault injection: crash after the features commit, before
        # the index commit — the transaction is published (manifest)
        # but only half applied
        txlog.commit_multi([(b2, feat), (delta(b2), idx)], root, _fail_after=1)
        assert len(txlog.pending_multi(root)) == 1
        n_all = o.count()
        assert txlog.snapshot(spark, feat).count() == n_all
        assert (
            txlog.snapshot(spark, idx).agg(F.sum("n")).first()[0] == n_all - b2.count()
        )
        recovered = txlog.recover_multi(root)
        assert len(recovered) == 1
        assert txlog.pending_multi(root) == []
        assert txlog.snapshot(spark, idx).agg(F.sum("n")).first()[0] == n_all
        # recovery is idempotent: a second pass changes nothing
        assert txlog.recover_multi(root) == []
        assert txlog.snapshot(spark, idx).agg(F.sum("n")).first()[0] == n_all

    root = _scratch_table(sf_dir, "mtxn", build)
    feat = txlog.snapshot(spark, os.path.join(root, "feat"))
    idx = txlog.snapshot(spark, os.path.join(root, "idx"))
    n_feat = feat.groupBy("o_custkey").agg(
        F.count(F.lit(1)).cast("long").alias("n_feat")
    )
    n_idx = idx.groupBy("o_custkey").agg(F.sum("n").cast("long").alias("n_idx"))
    # inner join: a customer missing from either side (lost or
    # duplicated commit) changes the row count and fails rows_match
    return n_feat.join(n_idx, "o_custkey").select("o_custkey", "n_feat", "n_idx")


# ---------------------------------------------------------------------------
# Exact substring dedup — Lee et al. 2022 (r9 verdict #3): maximal
# >= L-token verbatim-repeated spans, the spans that paper removes
# from training corpora. See llm/dedup.repeated_substring_spans for
# the covering-window re-expression of the paper's suffix array.
# ---------------------------------------------------------------------------

_SUBSTR_L = 15  # span threshold; the paper uses 50 on web-scale text

_SUBSTR_SQL = f"""
WITH toks AS (
  SELECT doc_id, string_split_regex(trim(lower(text)), '\\s+') AS t FROM documents),
wins AS (
  SELECT doc_id, i AS sp, array_to_string(t[i:i+{_SUBSTR_L - 1}], ' ') AS w
  FROM toks,
       LATERAL (SELECT unnest(range(1, greatest(len(t) - {_SUBSTR_L} + 2, 1))) AS i)),
dup AS (SELECT w FROM wins GROUP BY w HAVING COUNT(*) > 1),
hits AS (SELECT wins.doc_id, wins.sp FROM wins JOIN dup USING (w)),
flags AS (
  SELECT doc_id, sp,
         CASE WHEN sp > COALESCE(MAX(sp + {_SUBSTR_L - 1}) OVER (
                PARTITION BY doc_id ORDER BY sp
                ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), -1)
              THEN 1 ELSE 0 END AS nf
  FROM hits),
grp AS (
  SELECT doc_id, sp,
         SUM(nf) OVER (PARTITION BY doc_id ORDER BY sp) AS gid
  FROM flags)
SELECT doc_id,
       CAST(MIN(sp) AS BIGINT) AS span_start,
       CAST(MAX(sp) + {_SUBSTR_L - 1} AS BIGINT) AS span_end,
       CAST(MAX(sp) + {_SUBSTR_L - 1} - MIN(sp) + 1 AS BIGINT) AS span_tokens
FROM grp GROUP BY doc_id, gid
"""


@register("dedup_substring_exact", _SUBSTR_SQL)
def dedup_substring_exact(spark, sf_dir):
    """Every maximal span covered by a verbatim >= 15-token repeat
    anywhere in the documents corpus, 1-based token positions — the
    exact-substring dedup output (the family's final member beyond
    shingle/containment granularity). The oracle recomputes the
    identical span set through DuckDB list/window functions.

    Scale shape: linear in corpus tokens — map-side window
    construction, ONE shuffle keyed on the window text for the
    occurrence count (at 100 TB, keyed on xxhash64 with ids only),
    one doc-keyed shuffle for the interval merge."""
    from stockify_spark.llm.dedup import repeated_substring_spans

    docs = _t(spark, sf_dir, "documents")
    return repeated_substring_spans(docs, "text", "doc_id", _SUBSTR_L)


# ---------------------------------------------------------------------------
# Dynamic partition pruning (r9 verdict #6): fact ⋈ dim over the
# hive-partitioned layout with the selective filter on the DIM side —
# the fact scan's partition list is pruned at RUNTIME from the dim
# subquery (plan pinned in tests/test_plans.py::test_dpp).
# ---------------------------------------------------------------------------

_DPP_SQL = """
SELECT CAST(date_trunc('day', ts) AS DATE) AS p_date,
       CAST(COUNT(*) AS BIGINT) AS n,
       ROUND(SUM(value), 6) AS sum_value
FROM events
WHERE day(CAST(date_trunc('day', ts) AS DATE)) <= 7
GROUP BY 1
"""


@register("join_dpp_dates", _DPP_SQL)
def join_dpp_dates(spark, sf_dir):
    """Events written hive-partitioned by day (30 directories at this
    vintage); the dim is a (day, day-of-month) table whose filter
    ``dom <= 7`` reaches the FACT scan only through the join — static
    pruning is impossible, so Catalyst inserts a dynamic-pruning
    subquery: the dim is evaluated first (reused broadcast) and only
    the ~7 matching partition DIRECTORIES are listed and scanned. The
    build asserts the runtime plan carries dynamicpruningexpression
    in PartitionFilters.

    At 100 TB this is the difference between scanning a week and
    scanning three years — DPP is the partition-level sibling of the
    log-level stats skipping the txlog queries pin."""
    import os

    from stockify_spark.registry_ext7 import _scratch_table
    from stockify_spark.sources.io import load_table, write_date_partitioned

    def build(root: str) -> None:
        write_date_partitioned(
            load_table(spark, sf_dir, "events"),
            os.path.join(root, "fact"),
            "ts",
            "day",
        )

    root = _scratch_table(sf_dir, "dpp", build)
    fact = spark.read.parquet(os.path.join(root, "fact"))
    # bounded collect: one row per PARTITION DIRECTORY (~30 at this
    # vintage; at 100 TB a date dim is a catalog table, same shape)
    days = [r["p_date"] for r in fact.select("p_date").distinct().collect()]
    dim = spark.createDataFrame(
        [(d, d.day) for d in sorted(days)], "p_date date, dom int"
    )
    out = (
        fact.join(F.broadcast(dim.filter(F.col("dom") <= 7)), "p_date")
        .groupBy("p_date")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n"),
            F.round(F.sum("value"), 6).alias("sum_value"),
        )
    )
    plan = out._jdf.queryExecution().explainString(
        spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString("formatted")
    )
    assert "dynamicpruning" in plan.lower(), plan  # the pruning is real
    return out


# ---------------------------------------------------------------------------
# Exact substring dedup, APPLIED — the corpus Lee et al. actually
# ship: every covered token cut, per-doc removal accounting.
# ---------------------------------------------------------------------------

_SUBSTR_APPLY_SQL = f"""
WITH toks AS (
  SELECT doc_id, string_split_regex(trim(lower(text)), '\\s+') AS t FROM documents),
wins AS (
  SELECT doc_id, i AS sp, array_to_string(t[i:i+{_SUBSTR_L - 1}], ' ') AS w
  FROM toks,
       LATERAL (SELECT unnest(range(1, greatest(len(t) - {_SUBSTR_L} + 2, 1))) AS i)),
dup AS (SELECT w FROM wins GROUP BY w HAVING COUNT(*) > 1),
hits AS (SELECT wins.doc_id, wins.sp FROM wins JOIN dup USING (w)),
flags AS (
  SELECT doc_id, sp,
         CASE WHEN sp > COALESCE(MAX(sp + {_SUBSTR_L - 1}) OVER (
                PARTITION BY doc_id ORDER BY sp
                ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), -1)
              THEN 1 ELSE 0 END AS nf
  FROM hits),
grp AS (
  SELECT doc_id, sp, SUM(nf) OVER (PARTITION BY doc_id ORDER BY sp) AS gid
  FROM flags),
spans AS (
  SELECT doc_id, MIN(sp) AS s, MAX(sp) + {_SUBSTR_L - 1} AS e
  FROM grp GROUP BY doc_id, gid),
tok AS (
  SELECT doc_id, i AS pos, t[i] AS tk
  FROM toks, LATERAL (SELECT unnest(range(1, len(t) + 1)) AS i)),
kept AS (
  SELECT k.doc_id, k.pos, k.tk
  FROM tok k LEFT JOIN spans s
    ON k.doc_id = s.doc_id AND k.pos BETWEEN s.s AND s.e
  WHERE s.doc_id IS NULL),
agg AS (
  SELECT doc_id,
         string_agg(tk, ' ' ORDER BY pos) AS clean_text,
         COUNT(*) AS n_kept
  FROM kept GROUP BY doc_id)
SELECT toks.doc_id,
       COALESCE(a.clean_text, '') AS clean_text,
       CAST(len(toks.t) - COALESCE(a.n_kept, 0) AS BIGINT) AS n_tokens_removed,
       CAST(COALESCE(a.n_kept, 0) AS BIGINT) AS n_tokens_kept
FROM toks LEFT JOIN agg a USING (doc_id)
"""


@register("dedup_substring_apply", _SUBSTR_APPLY_SQL)
def dedup_substring_apply(spark, sf_dir):
    """Cut every token covered by a corpus-repeated >= 15-token span
    out of every document — the deduplicated-corpus output of the
    exact-substring method, with per-doc removal accounting. The
    oracle rebuilds every cleaned text token-by-token through the
    independent span derivation, so an off-by-one at either span
    edge changes clean_text and fails the value hash.

    Scale shape: the span detector's two linear shuffles + one join
    of the span table (rows = spans << corpus) + a map-side JVM
    higher-order cut; no Python, no explode of the token stream."""
    from stockify_spark.llm.dedup import remove_repeated_spans

    docs = _t(spark, sf_dir, "documents")
    return remove_repeated_spans(docs, "text", "doc_id", _SUBSTR_L)


# ---------------------------------------------------------------------------
# Drop column — the second half of column-mapping schema evolution:
# a metadata-only tombstone, reads exclude, time travel keeps, and
# the tombstoned physical name is write-protected.
# ---------------------------------------------------------------------------

_DROPCOL_SQL = """
SELECT o_orderkey, ROUND(o_totalprice, 2) AS o_totalprice FROM orders
UNION ALL
SELECT o_orderkey + 10000000 AS o_orderkey, ROUND(o_totalprice, 2)
FROM orders WHERE o_orderkey % 100 = 0
"""


@register("txlog_drop_column", _DROPCOL_SQL)
def txlog_drop_column(spark, sf_dir):
    """Create (o_orderkey, o_custkey, o_totalprice) → DROP o_custkey
    (the build asserts zero files rewritten, time travel to v0 still
    carries the column, and re-adding a column named o_custkey is
    REJECTED — without field ids it would resurrect the dropped
    bytes on old files) → append new rows in the narrowed logical
    schema. The snapshot must surface exactly the two surviving
    columns over both file generations.

    Scale shape: the drop is one log write at any table size; reads
    exclude the tombstoned physical column in the same zero-cost
    select that translates renames."""
    from stockify_spark.registry_ext7 import _scratch_table
    from stockify_spark.sources import txlog

    def build(path: str) -> None:
        o = _t(spark, sf_dir, "orders").select(
            "o_orderkey", "o_custkey", "o_totalprice"
        )
        txlog.create(o.repartition(2), path)
        files_before = sorted(txlog.live_files(path))
        assert txlog.drop_column(path, "o_custkey") == 1
        assert sorted(txlog.live_files(path)) == files_before  # metadata-only
        assert "o_custkey" in txlog.snapshot(spark, path, 0).columns
        try:
            txlog.append(
                o.limit(1).select("o_orderkey", "o_custkey", "o_totalprice"), path
            )
            raise AssertionError("tombstoned physical name must be rejected")
        except ValueError as e:
            assert "tombstoned" in str(e)
        extra = o.filter(F.col("o_orderkey") % 100 == 0).select(
            (F.col("o_orderkey") + 10_000_000).alias("o_orderkey"),
            "o_totalprice",
        )
        txlog.append(extra, path)

    path = _scratch_table(sf_dir, "dropcol", build)
    snap = txlog.snapshot(spark, path)
    assert snap.columns == ["o_orderkey", "o_totalprice"]
    return snap.select("o_orderkey", F.round("o_totalprice", 2).alias("o_totalprice"))


# ---------------------------------------------------------------------------
# Cross-set exact-substring decontamination — train spans verbatim-
# covered by the eval set (doc_id % 10 == 0 plays the benchmark).
# ---------------------------------------------------------------------------

_DECONTAM_L = 10

_DECONTAM_SQL = f"""
WITH toks AS (
  SELECT doc_id, string_split_regex(trim(lower(text)), '\\s+') AS t FROM documents),
wins AS (
  SELECT doc_id, i AS sp, array_to_string(t[i:i+{_DECONTAM_L - 1}], ' ') AS w
  FROM toks,
       LATERAL (SELECT unnest(range(1, greatest(len(t) - {_DECONTAM_L} + 2, 1))) AS i)),
ev AS (SELECT DISTINCT w FROM wins WHERE doc_id % 10 = 0),
hits AS (
  SELECT wins.doc_id, wins.sp FROM wins JOIN ev USING (w)
  WHERE wins.doc_id % 10 <> 0),
flags AS (
  SELECT doc_id, sp,
         CASE WHEN sp > COALESCE(MAX(sp + {_DECONTAM_L - 1}) OVER (
                PARTITION BY doc_id ORDER BY sp
                ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), -1)
              THEN 1 ELSE 0 END AS nf
  FROM hits),
grp AS (
  SELECT doc_id, sp, SUM(nf) OVER (PARTITION BY doc_id ORDER BY sp) AS gid
  FROM flags)
SELECT doc_id,
       CAST(MIN(sp) AS BIGINT) AS span_start,
       CAST(MAX(sp) + {_DECONTAM_L - 1} AS BIGINT) AS span_end,
       CAST(MAX(sp) + {_DECONTAM_L - 1} - MIN(sp) + 1 AS BIGINT) AS span_tokens
FROM grp GROUP BY doc_id, gid
"""


@register("pipeline_substring_decontam", _DECONTAM_SQL)
def pipeline_substring_decontam(spark, sf_dir):
    """Exact-substring train/eval decontamination: maximal train-doc
    spans covered by a verbatim >= 10-token window occurring anywhere
    in the eval split (doc_id % 10 == 0) — the substring-granular
    complement of pipeline_contamination's shingle report, and the
    removal set a decontamination pass feeds to remove_repeated_spans'
    cut machinery.

    Scale shape: the join is keyed on the EVAL side's distinct
    windows — benchmark-sized, not corpus-sized — so at 100 TB the
    eval window set broadcasts and the whole pass is map-side against
    the train scan, plus one doc-keyed interval merge."""
    from stockify_spark.llm.dedup import contaminated_spans

    docs = _t(spark, sf_dir, "documents")
    return contaminated_spans(
        docs.filter(F.col("doc_id") % 10 != 0),
        docs.filter(F.col("doc_id") % 10 == 0),
        "text",
        "doc_id",
        _DECONTAM_L,
    )


# ---------------------------------------------------------------------------
# Direct streaming CDF — Delta's readChangeFeed face on the stream
# source (r10 verdict stretch #6): row-level insert/delete rows for
# EVERY commit straight off the log, no replicate_changes audit-table
# hop. Same scripted history as txlog_stream_cdf, so the two faces
# are pinned to the identical multiset of change rows.
# ---------------------------------------------------------------------------

_STREAM_CDF_DIRECT_SQL = """
WITH base AS (SELECT o_orderkey, o_totalprice FROM orders)
SELECT o_orderkey, ROUND(o_totalprice, 2) AS o_totalprice,
       'insert' AS _change_type, CAST(0 AS BIGINT) AS _commit_version
FROM base WHERE o_orderkey % 3 <> 0
UNION ALL
SELECT o_orderkey, ROUND(o_totalprice, 2), 'insert', CAST(1 AS BIGINT)
FROM base WHERE o_orderkey % 3 = 0
UNION ALL
SELECT o_orderkey, ROUND(o_totalprice, 2), 'delete', CAST(2 AS BIGINT)
FROM base WHERE o_totalprice < 30000
UNION ALL
SELECT o_orderkey, ROUND(o_totalprice, 2), 'delete', CAST(3 AS BIGINT)
FROM base WHERE o_totalprice >= 30000 AND o_orderkey % 10 = 0
UNION ALL
SELECT o_orderkey, ROUND(o_totalprice, 2), 'insert', CAST(4 AS BIGINT)
FROM base WHERE o_totalprice >= 30000 AND o_orderkey % 10 = 0
"""


@register("txlog_stream_cdf_direct", _STREAM_CDF_DIRECT_SQL)
def txlog_stream_cdf_direct(spark, sf_dir):
    """Direct change-feed read (read_changes=true) over the scripted
    history v0 create (%3!=0), v1 append (%3==0), v2 COW delete
    (<30000), v3 MOR delete via deletion vectors (%10==0 of the
    survivors), v4 restore(2) — the COW diff, the DV pair diff, AND
    the restore's resurrection must all surface as row-level
    insert/delete rows tagged with their commit version, byte-equal
    to what the replicate_changes composition (txlog_stream_cdf)
    delivers for the same history.

    Scale shape: appends stay one partition per file (append-face
    parallelism); each change commit is ONE partition whose diff is
    bounded by the files that commit touched — the batch CDF's
    O(commit) contract, now without the intermediate audit table."""
    from stockify_spark.registry_ext7 import _scratch_table
    from stockify_spark.sources import txlog
    from stockify_spark.sources.txlog_stream import register_txlog_stream

    def build(path: str) -> None:
        o = _t(spark, sf_dir, "orders").select("o_orderkey", "o_totalprice")
        txlog.create(
            o.filter(F.col("o_orderkey") % 3 != 0).repartitionByRange(2, "o_orderkey"),
            path,
        )
        txlog.append(o.filter(F.col("o_orderkey") % 3 == 0), path)
        txlog.delete_where(spark, path, F.col("o_totalprice") < 30000.0)
        txlog.delete_where_dv(spark, path, F.col("o_orderkey") % 10 == 0)
        assert txlog.restore(path, 2) == 4

    path = _scratch_table(sf_dir, "cdfdirect", build)
    register_txlog_stream(spark)
    feed = (
        spark.read.format("txlog_stream")
        .option("path", path)
        .option("read_changes", "true")
        .load()
    )
    return feed.select(
        "o_orderkey",
        F.round("o_totalprice", 2).alias("o_totalprice"),
        "_change_type",
        "_commit_version",
    )


# ---------------------------------------------------------------------------
# ml_pca_power — distributed PCA (partition-Gram + power iteration)
# ---------------------------------------------------------------------------

def _pca_oracle(iters: int) -> str:
    """Unrolled power iteration over the embedding covariance —
    exactly llm/pca.pca_power's recurrence: C entries ROUND(9),
    normalized vector ROUND(9) per iteration, Rayleigh ROUND(6).
    Unrolled CTEs (the kmeans-oracle pattern) rather than a
    recursive CTE: each round needs an aggregation AND a scalar
    normalizer over its own output."""
    sql = """WITH e AS (SELECT embedding::DOUBLE[] AS v FROM embeddings),
nn AS MATERIALIZED (SELECT COUNT(*)::DOUBLE AS n, len(any_value(v)) AS d FROM e),
mu AS MATERIALIZED (SELECT i, SUM(v[i]) / (SELECT n FROM nn) AS m
       FROM e, LATERAL (SELECT unnest(range(1, len(v) + 1)) AS i) u
       GROUP BY i),
c AS MATERIALIZED (SELECT g.i, g.j,
             ROUND(g.s / (SELECT n FROM nn) - mi.m * mj.m, 9) AS c
      FROM (SELECT ui.i, uj.j, SUM(v[ui.i] * v[uj.j]) AS s
            FROM e,
                 LATERAL (SELECT unnest(range(1, len(v) + 1)) AS i) ui,
                 LATERAL (SELECT unnest(range(1, len(v) + 1)) AS j) uj
            GROUP BY ui.i, uj.j) g
      JOIN mu mi ON mi.i = g.i JOIN mu mj ON mj.i = g.j),
r0 AS (SELECT i, 1.0 / sqrt((SELECT d FROM nn)) AS r FROM mu)"""
    for t in range(1, iters + 1):
        sql += f""",
y{t} AS MATERIALIZED (SELECT c.i, SUM(c.c * r.r) AS y
         FROM c JOIN r{t-1} r ON r.i = c.j GROUP BY c.i),
r{t} AS MATERIALIZED (SELECT i,
         ROUND(y / sqrt((SELECT SUM(y * y) FROM y{t})), 9) AS r FROM y{t})"""
    return sql + f""",
ev AS (SELECT ROUND(SUM(c.c * ra.r * rb.r), 6) AS ev
       FROM c JOIN r{iters} ra ON ra.i = c.i JOIN r{iters} rb ON rb.i = c.j)
SELECT i::BIGINT AS dim, r AS loading, (SELECT ev FROM ev) AS eigenvalue
FROM r{iters}"""


@register("ml_pca_power", _pca_oracle(8))
def ml_pca_power(spark, sf_dir):
    """Top principal component of the embedding corpus: one
    Arrow-batched pass computes per-partition Gram partials (numpy
    matmul per batch — what leaves each partition is one
    (1+d+d²)-double row regardless of row count), the d×d covariance
    is model state, and 8 power-iteration rounds run on the driver
    (llm/pca.pca_power; MLlib's RowMatrix shape on the DataFrame
    API). The oracle unrolls the identical matvec/normalize/round
    chain in SQL, so loadings AND the Rayleigh eigenvalue are
    hash-checked bit-for-bit under the repo's shortest-decimal-string
    HALF_UP rounding policy."""
    from stockify_spark.llm.pca import pca_power

    return pca_power(_t(spark, sf_dir, "embeddings"), iters=8)


def _pca_front(iters: int, k: int) -> str:
    """Shared oracle front: covariance c1, then per component c the
    unrolled power rounds r{c}_{t}, Rayleigh ev{c}, and the deflated
    c{c+1} — llm/pca._power_deflate verbatim in SQL."""
    sql = """WITH e AS (SELECT embedding::DOUBLE[] AS v FROM embeddings),
nn AS MATERIALIZED (SELECT COUNT(*)::DOUBLE AS n, len(any_value(v)) AS d FROM e),
mu AS MATERIALIZED (SELECT i, SUM(v[i]) / (SELECT n FROM nn) AS m
       FROM e, LATERAL (SELECT unnest(range(1, len(v) + 1)) AS i) u
       GROUP BY i),
c1 AS MATERIALIZED (SELECT g.i, g.j,
             ROUND(g.s / (SELECT n FROM nn) - mi.m * mj.m, 9) AS c
      FROM (SELECT ui.i, uj.j, SUM(v[ui.i] * v[uj.j]) AS s
            FROM e,
                 LATERAL (SELECT unnest(range(1, len(v) + 1)) AS i) ui,
                 LATERAL (SELECT unnest(range(1, len(v) + 1)) AS j) uj
            GROUP BY ui.i, uj.j) g
      JOIN mu mi ON mi.i = g.i JOIN mu mj ON mj.i = g.j)"""
    for comp in range(1, k + 1):
        sql += f""",
r{comp}_0 AS (SELECT i, 1.0 / sqrt((SELECT d FROM nn)) AS r FROM mu)"""
        for t in range(1, iters + 1):
            sql += f""",
y{comp}_{t} AS MATERIALIZED (SELECT c.i, SUM(c.c * r.r) AS y
         FROM c{comp} c JOIN r{comp}_{t - 1} r ON r.i = c.j GROUP BY c.i),
r{comp}_{t} AS MATERIALIZED (SELECT i,
         ROUND(y / sqrt((SELECT SUM(y * y) FROM y{comp}_{t})), 9) AS r
         FROM y{comp}_{t})"""
        sql += f""",
ev{comp} AS MATERIALIZED (SELECT ROUND(SUM(c.c * ra.r * rb.r), 6) AS ev
       FROM c{comp} c JOIN r{comp}_{iters} ra ON ra.i = c.i
       JOIN r{comp}_{iters} rb ON rb.i = c.j)"""
        if comp < k:
            sql += f""",
c{comp + 1} AS MATERIALIZED (SELECT c.i, c.j,
       ROUND(c.c - (SELECT ev FROM ev{comp}) * ra.r * rb.r, 9) AS c
       FROM c{comp} c JOIN r{comp}_{iters} ra ON ra.i = c.i
       JOIN r{comp}_{iters} rb ON rb.i = c.j)"""
    return sql


def _pca_topk_oracle(k: int, iters: int) -> str:
    sel = " UNION ALL ".join(
        f"SELECT {c}::BIGINT AS component, i::BIGINT AS dim, r AS loading,"
        f" (SELECT ev FROM ev{c}) AS eigenvalue FROM r{c}_{iters}"
        for c in range(1, k + 1)
    )
    return _pca_front(iters, k) + f"\nSELECT * FROM ({sel})"


def _pca_project_oracle(k: int, iters: int) -> str:
    allr = " UNION ALL ".join(
        f"SELECT {c} AS comp, i, r FROM r{c}_{iters}" for c in range(1, k + 1)
    )
    pcols = ", ".join(
        f"MAX(CASE WHEN comp = {c} THEN p END) AS p{c}" for c in range(1, k + 1)
    )
    return _pca_front(iters, k) + f""",
allr AS MATERIALIZED ({allr}),
doc AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
proj AS (SELECT d.vec_id, rc.comp,
                ROUND(SUM((d.v[u.i] - mu.m) * rc.r), 6) AS p
         FROM doc d,
              LATERAL (SELECT unnest(range(1, len(v) + 1)) AS i) u
         JOIN mu ON mu.i = u.i
         JOIN allr rc ON rc.i = u.i
         GROUP BY d.vec_id, rc.comp)
SELECT vec_id, {pcols} FROM proj GROUP BY vec_id"""


@register("ml_pca_topk", _pca_topk_oracle(3, 8))
def ml_pca_topk(spark, sf_dir):
    """Top-3 principal components via power iteration + Hotelling
    deflation (llm/pca.pca_topk): after each component, the
    covariance is deflated C ← ROUND(C − λ v vᵀ, 9) with the ROUNDED
    eigenpair, so every matrix the next component iterates on sits
    on the cross-engine rounding grid — the oracle unrolls all
    3 × 8 rounds + 2 deflations and hash-matches every loading and
    eigenvalue."""
    from stockify_spark.llm.pca import pca_topk

    return pca_topk(_t(spark, sf_dir, "embeddings"), k=3, iters=8)


@register("ml_pca_project", _pca_project_oracle(3, 8))
def ml_pca_project(spark, sf_dir):
    """PCA APPLY: project every embedding onto the top-3 components
    (llm/pca.pca_project) — the k·d loading model + mean travel in
    the closure, the projection is one map-side Arrow pass, ROUND(6)
    per coordinate. Train face and apply face share _gram/_power_
    deflate, so the oracle's independently-derived loadings price
    the whole pipeline: a drifted component would shift every
    projection and fail the value hash on all rows."""
    from stockify_spark.llm.pca import pca_project

    return pca_project(_t(spark, sf_dir, "embeddings"), k=3, iters=8)


def _pca_blocking_oracle(k: int, iters: int, width: float) -> str:
    allr = " UNION ALL ".join(
        f"SELECT {c} AS comp, i, r FROM r{c}_{iters}" for c in range(1, k + 1)
    )
    pcols = ", ".join(
        f"MAX(CASE WHEN comp = {c} THEN p END) AS p{c}" for c in range(1, k + 1)
    )
    bcols = ", ".join(f"FLOOR(p{c} / {width!r}) AS b{c}" for c in range(1, k + 1))
    on = " AND ".join(f"a.b{c} = b.b{c}" for c in range(1, k + 1))
    d2 = " + ".join(f"(a.p{c} - b.p{c}) * (a.p{c} - b.p{c})" for c in range(1, k + 1))
    return _pca_front(iters, k) + f""",
allr AS MATERIALIZED ({allr}),
doc AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
proj AS MATERIALIZED (SELECT d.vec_id, rc.comp,
                ROUND(SUM((d.v[u.i] - mu.m) * rc.r), 6) AS p
         FROM doc d,
              LATERAL (SELECT unnest(range(1, len(v) + 1)) AS i) u
         JOIN mu ON mu.i = u.i
         JOIN allr rc ON rc.i = u.i
         GROUP BY d.vec_id, rc.comp),
cells AS MATERIALIZED (
  SELECT vec_id, {pcols} FROM proj GROUP BY vec_id),
blk AS MATERIALIZED (SELECT vec_id, {', '.join(f'p{c}' for c in range(1, k + 1))},
  {bcols} FROM cells)
SELECT a.vec_id AS id_a, b.vec_id AS id_b, ROUND({d2}, 9) AS dist2
FROM blk a JOIN blk b ON {on} AND a.vec_id < b.vec_id"""


@register("dedup_pca_blocking", _pca_blocking_oracle(3, 8, 1.0))
def dedup_pca_blocking(spark, sf_dir):
    """SemDeDup-style blocking in PCA-reduced space
    (llm/pca.pca_block_pairs): candidate near-dup pairs from shared
    grid cells over the top-3 ROUND(6) projections (cell width a
    power of two → exact division), with the exact reduced-space
    squared distance attached — the cheap pre-filter that bounds
    which pairs ever see a full-dimension verify. One map-side
    projection + one equi-join on the cell key; cost tracks
    colliding pairs, never n². The oracle re-derives loadings,
    projections, cells, and distances independently and hash-matches
    every pair and distance."""
    from stockify_spark.llm.pca import pca_block_pairs

    return pca_block_pairs(
        _t(spark, sf_dir, "embeddings"), k=3, iters=8, width=1.0
    )


@register("ml_pca_incremental", _pca_topk_oracle(1, 8))
def ml_pca_incremental(spark, sf_dir):
    """INCREMENTAL PCA through the ACID stats table
    (llm/pca.gram_update / pca_from_gram): the corpus arrives as
    three idempotent batches (vec_id thirds), each folding one
    (n, Σv, Σ v·vᵀ) partial row into a txlog table — a replayed
    batch is a no-op via the (app, version) txn marker, so the
    covariance can never double-count under at-least-once delivery.
    The model is rebuilt from the stats table alone (element-wise
    positional sums, d + d² model rows — never a corpus re-scan) and
    must hash-match the ONE-SHOT batch oracle: Gram associativity is
    the whole design, and the ROUND(9) covariance grid absorbs the
    batch-order summation difference."""
    import os

    from stockify_spark.llm.pca import gram_update, pca_from_gram
    from stockify_spark.registry_ext7 import _scratch_table

    emb = _t(spark, sf_dir, "embeddings")

    def build(path: str) -> None:
        table = os.path.join(path, "gram")
        hi = emb.agg(F.max("vec_id")).collect()[0][0]
        cut1, cut2 = hi // 3, 2 * hi // 3
        parts = [
            emb.filter(F.col("vec_id") <= cut1),
            emb.filter((F.col("vec_id") > cut1) & (F.col("vec_id") <= cut2)),
            emb.filter(F.col("vec_id") > cut2),
        ]
        for v, batch in enumerate(parts):
            gram_update(batch, table, app_id="pca-inc", batch_version=v)
        # at-least-once replay of the last batch: must be a no-op
        gram_update(parts[-1], table, app_id="pca-inc", batch_version=2)

    root = _scratch_table(sf_dir, "pcainc", build, src_file="embeddings.parquet")
    return pca_from_gram(spark, os.path.join(root, "gram"), k=1, iters=8)


def _pca_outlier_oracle(k: int, iters: int) -> str:
    allr = " UNION ALL ".join(
        f"SELECT {c} AS comp, i, r FROM r{c}_{iters}" for c in range(1, k + 1)
    )
    evs = " UNION ALL ".join(
        f"SELECT {c} AS comp, ev FROM ev{c}" for c in range(1, k + 1)
    )
    return _pca_front(iters, k) + f""",
allr AS MATERIALIZED ({allr}),
evs AS MATERIALIZED ({evs}),
doc AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
proj AS MATERIALIZED (SELECT d.vec_id, rc.comp,
                ROUND(SUM((d.v[u.i] - mu.m) * rc.r), 6) AS p
         FROM doc d,
              LATERAL (SELECT unnest(range(1, len(v) + 1)) AS i) u
         JOIN mu ON mu.i = u.i
         JOIN allr rc ON rc.i = u.i
         GROUP BY d.vec_id, rc.comp)
SELECT p.vec_id, ROUND(SUM(p.p * p.p / e.ev), 6) AS m2
FROM proj p JOIN evs e ON e.comp = p.comp
GROUP BY p.vec_id"""


@register("ml_pca_outliers", _pca_outlier_oracle(3, 8))
def ml_pca_outliers(spark, sf_dir):
    """Embedding outlier scores for corpus curation
    (llm/pca.pca_outlier_scores): reduced-space Mahalanobis
    m² = Σ p_c²/λ_c over the top-3 components — the filter that
    surfaces mislabeled/corrupted/off-domain vectors before
    training. Every input sits on the shared rounding grid
    (projections and eigenvalues ROUND(6)), so the score itself is
    cross-engine exact under ROUND(6) — the oracle re-derives the
    whole model and hash-matches every document's score."""
    from stockify_spark.llm.pca import pca_outlier_scores

    return pca_outlier_scores(_t(spark, sf_dir, "embeddings"), k=3, iters=8)


_CORR_SQL = """WITH e AS (SELECT embedding::DOUBLE[] AS v FROM embeddings),
nn AS MATERIALIZED (SELECT COUNT(*)::DOUBLE AS n FROM e),
mu AS MATERIALIZED (SELECT i, SUM(v[i]) / (SELECT n FROM nn) AS m
       FROM e, LATERAL (SELECT unnest(range(1, len(v) + 1)) AS i) u
       GROUP BY i),
c1 AS MATERIALIZED (SELECT g.i, g.j,
             ROUND(g.s / (SELECT n FROM nn) - mi.m * mj.m, 9) AS c
      FROM (SELECT ui.i, uj.j, SUM(v[ui.i] * v[uj.j]) AS s
            FROM e,
                 LATERAL (SELECT unnest(range(1, len(v) + 1)) AS i) ui,
                 LATERAL (SELECT unnest(range(1, len(v) + 1)) AS j) uj
            GROUP BY ui.i, uj.j) g
      JOIN mu mi ON mi.i = g.i JOIN mu mj ON mj.i = g.j)
SELECT dim_i::BIGINT AS dim_i, dim_j::BIGINT AS dim_j, r FROM (
  SELECT a.i AS dim_i, a.j AS dim_j,
         ROUND(a.c / sqrt(ai.c * aj.c), 6) AS r
  FROM c1 a
  JOIN c1 ai ON ai.i = a.i AND ai.j = a.i
  JOIN c1 aj ON aj.i = a.j AND aj.j = a.j
  WHERE a.i < a.j)
ORDER BY abs(r) DESC, dim_i, dim_j LIMIT 20"""


@register("ml_top_correlations", _CORR_SQL)
def ml_top_correlations(spark, sf_dir):
    """Embedding-dimension correlation profile
    (llm/pca.top_correlations): top-20 pairs by |Pearson r| from the
    one-pass ROUND(9) covariance — the profiling face of the Gram
    front (co-varying dimensions are pruning/PCA-reduction
    candidates). Tie order at the cut is (|r| DESC, dim_i, dim_j) on
    ROUND(6) values, deterministic in both engines, so the selected
    SET hash-matches."""
    from stockify_spark.llm.pca import top_correlations

    return top_correlations(_t(spark, sf_dir, "embeddings"), top=20)
