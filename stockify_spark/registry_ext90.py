"""Round-12 extension: Gram-fold checkpoint for incremental PCA
(the r11 verdict's unbounded-rebuild item) and the keep-one exact
substring dedup face.

Same evidence discipline as the rest of the registry: every query
has a DuckDB closed-form oracle, builds assert their own invariants,
scale shapes stated per docstring. North-star surface (SURVEY §7.6)
— the reference engine (stockify.cu:196-743) has no linear algebra
or dedup at all.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from stockify_spark.registry import _t, register
from stockify_spark.registry_ext89 import _pca_topk_oracle

# ---------------------------------------------------------------------------
# ml_pca_gram_compact — fold checkpoint for the incremental-PCA
# stats table (llm/pca.compact_gram): the partial-row history
# collapses to ONE summed row, bounding pca_from_gram's rebuild at
# O(d²) regardless of how many micro-batches ever appended.
# ---------------------------------------------------------------------------

_PCA_COMPACT_SQL = (
    "SELECT q.*, CAST(2 AS BIGINT) AS stats_rows FROM (\n"
    + _pca_topk_oracle(1, 8)
    + "\n) q"
)


@register("ml_pca_gram_compact", _PCA_COMPACT_SQL)
def ml_pca_gram_compact(spark, sf_dir):
    """Incremental PCA with a FOLD CHECKPOINT in the middle of the
    ingest history (llm/pca.compact_gram): batches 0-1 land, the
    stats table is COW-compacted to one summed row, both pre-fold
    batches are REPLAYED (must stay no-ops — the txn markers live in
    the log, which the rewrite leaves intact), then batch 2 lands
    and is replayed too. The model rebuilt from the folded table
    must hash-match the one-shot oracle (Gram associativity across
    the fold), and ``stats_rows`` pins the bound: 2 rows (the folded
    row + batch 2), never the 3-row batch history — on a long-lived
    stream this is the difference between O(d²) and O(batches·d²)
    rebuilds. Scale shape: the fold itself is a posexplode+groupBy
    collecting 1+d+d² scalars, model-sized regardless of history."""
    import os

    from stockify_spark.llm.pca import compact_gram, gram_update, pca_from_gram
    from stockify_spark.registry_ext7 import _scratch_table
    from stockify_spark.sources import txlog

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
        for v, batch in enumerate(parts[:2]):
            gram_update(batch, table, app_id="pca-cg", batch_version=v)
        assert txlog.snapshot(spark, table).count() == 2
        compact_gram(spark, table)
        assert txlog.snapshot(spark, table).count() == 1
        assert len(txlog.live_files(table)) == 1
        # at-least-once replays ACROSS the fold boundary: no-ops
        v_now = txlog.current_version(table)
        gram_update(parts[0], table, app_id="pca-cg", batch_version=0)
        gram_update(parts[1], table, app_id="pca-cg", batch_version=1)
        assert txlog.current_version(table) == v_now
        gram_update(parts[2], table, app_id="pca-cg", batch_version=2)
        gram_update(parts[2], table, app_id="pca-cg", batch_version=2)
        assert txlog.snapshot(spark, table).count() == 2

    root = _scratch_table(sf_dir, "pcacompact", build, src_file="embeddings.parquet")
    table = os.path.join(root, "gram")
    n_stats = txlog.snapshot(spark, table).count()
    return pca_from_gram(spark, table, k=1, iters=8).withColumn(
        "stats_rows", F.lit(int(n_stats)).cast("long")
    )


# ---------------------------------------------------------------------------
# dedup_substring_keepone — the keep-one variant of exact substring
# dedup: cut every occurrence of a corpus-repeated span EXCEPT the
# one in the lowest-(doc, pos) document (Lee et al. 2022 deploy the
# remove-all form; keep-one is the deterministic post-filter the
# remove_repeated_spans docstring promises composes on top).
# ---------------------------------------------------------------------------

_KEEPONE_L = 15  # matches dedup_substring_exact's test-scale threshold

_KEEPONE_SQL = f"""
WITH toks AS (
  SELECT doc_id, string_split_regex(trim(lower(text)), '\\s+') AS t FROM documents),
wins AS (
  SELECT doc_id, i AS sp, array_to_string(t[i:i+{_KEEPONE_L - 1}], ' ') AS w
  FROM toks,
       LATERAL (SELECT unnest(range(1, greatest(len(t) - {_KEEPONE_L} + 2, 1))) AS i)),
keep AS (SELECT w, MIN(doc_id) AS keeper FROM wins
         GROUP BY w HAVING COUNT(*) > 1),
hits AS (SELECT wins.doc_id, wins.sp FROM wins JOIN keep USING (w)
         WHERE wins.doc_id <> keep.keeper),
flags AS (
  SELECT doc_id, sp,
         CASE WHEN sp > COALESCE(MAX(sp + {_KEEPONE_L - 1}) OVER (
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
       CAST(MAX(sp) + {_KEEPONE_L - 1} AS BIGINT) AS span_end,
       CAST(MAX(sp) + {_KEEPONE_L - 1} - MIN(sp) + 1 AS BIGINT) AS span_tokens
FROM grp GROUP BY doc_id, gid
"""


@register("dedup_substring_keepone", _KEEPONE_SQL)
def dedup_substring_keepone(spark, sf_dir):
    """Keep-one exact substring dedup: the spans to cut when the
    occurrences living in the LOWEST doc_id per repeated window are
    retained — every occurrence in any other document is removed
    (the per-document keeper rule; Lee et al. 2022 §4 discuss
    retaining one copy of each duplicate). Composition of
    :func:`stockify_spark.llm.dedup.repeated_substring_spans`'s
    verified window stream with a per-window min-keeper rule
    (deterministic, so the output is an exact cross-engine set).

    Scale shape: identical to the remove-all form (hash-keyed
    exchanges, skew-safe groupBy counts) plus ONE more model-shaped
    aggregate — min(doc) per verified window text, joined back on
    the window's (text) key; the keeper table is bounded by the
    duplicated vocabulary, not the corpus. The oracle re-derives
    windows, repeats, keepers, and the interval merge in SQL."""
    from stockify_spark.llm.dedup import keepone_substring_spans

    docs = _t(spark, sf_dir, "documents").select("doc_id", "text")
    return keepone_substring_spans(docs, "text", "doc_id", _KEEPONE_L)


# ---------------------------------------------------------------------------
# pipeline_dedup_ingest_sink — dedup-against-history ingest replayed
# as a scripted 4-batch feed (llm/dedup.dedup_ingest_sink): the
# destination TABLE is the dedup state; each batch dedups within
# itself, anti-joins the accumulated fingerprints, appends
# exactly-once. The r11 verdict's "bench the ingest sinks" item —
# this face also gives the per-batch anti-join a SCALING row.
# ---------------------------------------------------------------------------

_INGEST_SINK_SQL = """
WITH feed AS (
  SELECT doc_id, text, doc_id % 4 AS batch FROM documents
  UNION ALL
  SELECT doc_id + 1000000, text, 3 AS batch FROM documents
  WHERE doc_id % 4 = 0 AND doc_id % 3 = 0
),
fp AS (
  SELECT doc_id, batch,
         md5(regexp_replace(trim(lower(text)), '\\s+', ' ', 'g')) AS fingerprint
  FROM feed
),
r AS (
  SELECT doc_id, fingerprint,
         ROW_NUMBER() OVER (PARTITION BY fingerprint
                            ORDER BY batch, doc_id) AS rn
  FROM fp
)
SELECT doc_id, fingerprint FROM r WHERE rn = 1
"""


@register("pipeline_dedup_ingest_sink", _INGEST_SINK_SQL)
def pipeline_dedup_ingest_sink(spark, sf_dir):
    """Exact dedup-against-history ingest: documents arrive as four
    micro-batches (doc_id % 4), batch 3 additionally REPLAYS a third
    of batch 0's texts under fresh ids (the cross-batch duplicates
    the anti-join must drop). Final table = first (batch, id) winner
    per fingerprint — the oracle states that closed form over the
    same schedule. Batch 2's sink call is replayed mid-feed and must
    be a no-op (the (app, batch-id) idempotency marker).

    Scale shape: per batch, ONE anti-join keyed on the 32-char md5 —
    batch-sized build side against the history scan (at 100 TB:
    bloom file-skip on the fingerprint column turns the scan side
    into bounded IO, llm/dedup.dedup_ingest_sink docstring); the
    table is the state, so restart needs no state-store bootstrap."""
    import os

    from stockify_spark.llm.dedup import dedup_ingest_sink
    from stockify_spark.registry_ext7 import _scratch_table
    from stockify_spark.sources import txlog

    docs = _t(spark, sf_dir, "documents").select("doc_id", "text")

    def build(path: str) -> None:
        dst = os.path.join(path, "corpus")
        sink = dedup_ingest_sink(spark, dst, "ingest", "text", "doc_id")
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
            sink(batch, b)
            if b == 2:  # at-least-once replay mid-feed: must be a no-op
                v = txlog.current_version(dst)
                sink(batch, b)
                assert txlog.current_version(dst) == v

    root = _scratch_table(
        sf_dir, "ingestsink", build, src_file="documents.parquet"
    )
    return txlog.snapshot(spark, os.path.join(root, "corpus")).select(
        "doc_id", "fingerprint"
    )
