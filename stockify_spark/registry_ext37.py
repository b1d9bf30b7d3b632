"""Round-8 extension wave 26: content-defined chunking dedup.

Content-defined chunking (CDC — the FastCDC/LBFS family) places
chunk boundaries where a rolling hash of the trailing W bytes hits a
divisor condition, so identical content yields identical chunks even
when its byte offset shifts (an insertion early in a document moves
every fixed-size block but only ONE content-defined chunk). This is
the storage-layer dedup primitive the fixed-stride chunkers
(doc_chunk_stride, pipeline_chunk_audit) cannot express: their
chunks break under any offset shift.

Boundary rule here: end position i (1-based, i >= W) is a cut point
iff md5int(substr(text, i-W+1, W)) % D == 0, with W=8, D=32 —
expected chunk length ~32 chars against the 48..600-char synthetic
documents. The document end is always a cut. md5int is the repo's
cross-engine uniform (first 8 md5 hex digits as a BIGINT —
agg_cms_sketch, sample_weighted), so Spark and DuckDB cut at
bit-identical positions.
"""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F

from stockify_spark.registry import register, _t

_CDC_W = 8
_CDC_D = 32

_CDC_SQL = f"""
WITH d AS (SELECT doc_id, text, length(text) AS n
           FROM documents WHERE length(text) > 0),
cuts AS (
  SELECT doc_id, text, n, i AS e
  FROM (SELECT doc_id, text, n, unnest(range({_CDC_W}, n + 1)) AS i
        FROM d WHERE n >= {_CDC_W})
  WHERE CAST(CONCAT('0x', substr(md5(substr(text, i - {_CDC_W - 1}, {_CDC_W})),
                                 1, 8)) AS BIGINT) % {_CDC_D} = 0
  UNION
  SELECT doc_id, text, n, n AS e FROM d
),
sp AS (
  SELECT doc_id, text, n, e,
         COALESCE(LAG(e) OVER (PARTITION BY doc_id ORDER BY e), 0) + 1 AS s
  FROM cuts
),
ch AS (
  SELECT doc_id, n, e - s + 1 AS clen,
         md5(substr(text, s, e - s + 1)) AS h
  FROM sp
),
occ AS (
  SELECT doc_id, n, clen,
         COUNT(*) OVER (PARTITION BY h) AS n_occ
  FROM ch
)
SELECT doc_id,
       CAST(COUNT(*) AS BIGINT) AS n_chunks,
       CAST(MAX(n) AS BIGINT) AS n_chars,
       CAST(SUM(CASE WHEN n_occ > 1 THEN clen ELSE 0 END) AS BIGINT)
         AS dup_chars,
       ROUND(CAST(SUM(CASE WHEN n_occ > 1 THEN clen ELSE 0 END) AS DOUBLE)
             / MAX(n), 6) AS dup_ratio
FROM occ GROUP BY doc_id
"""


@register("pipeline_cdc_chunk_dedup", _CDC_SQL)
def pipeline_cdc_chunk_dedup(spark, sf_dir):
    """Content-defined chunking dedup report: cut every document at
    positions where the trailing-8-char md5int hits 0 mod 32 (plus
    the document end), hash each chunk, and report per document how
    many of its characters sit in a chunk whose hash occurs more
    than once corpus-wide. Chunks cover each document exactly once
    (sum(clen) == n_chars — pinned in tests/test_ext37.py), and the
    cut positions are content-addressed, so shared passages dedup
    regardless of their byte offset.

    Scale shape: the per-position explode is a narrow map (no
    shuffle) and exists for oracle parity — a production ingest
    would fold the boundary scan into one mapInPandas pass with a
    gear rolling hash (O(1) per byte instead of an 8-byte hash per
    position) emitting (doc_id, chunk_hash, clen) directly, which
    also enforces FastCDC's min/max chunk bounds. Everything after
    the cut is two hash-partitioned exchanges: one on chunk hash for
    the occurrence count, one on doc_id for the report — both
    map-side combinable, no broadcast, no skew (md5 buckets are
    uniform), so the plan is a straight line at 100 TB."""
    d = (
        _t(spark, sf_dir, "documents")
        .select("doc_id", "text", F.length("text").alias("n"))
        .filter(F.col("n") > 0)
    )
    grams = d.filter(F.col("n") >= _CDC_W).select(
        "doc_id",
        "text",
        "n",
        F.explode(F.sequence(F.lit(_CDC_W), F.col("n"))).alias("i"),
    )
    gram = F.substring(F.col("text"), F.col("i") - (_CDC_W - 1), F.lit(_CDC_W))
    h32 = F.conv(F.substring(F.md5(gram), 1, 8), 16, 10).cast("long")
    cuts = (
        grams.filter(h32 % _CDC_D == 0)
        .select("doc_id", "text", "n", F.col("i").alias("e"))
        .union(d.select("doc_id", "text", "n", F.col("n").alias("e")))
        .distinct()
    )
    w = Window.partitionBy("doc_id").orderBy("e")
    sp = cuts.withColumn(
        "s", F.coalesce(F.lag("e").over(w), F.lit(0)) + 1
    )
    ch = sp.select(
        "doc_id",
        "n",
        (F.col("e") - F.col("s") + 1).alias("clen"),
        F.md5(
            F.substring(F.col("text"), F.col("s"), F.col("e") - F.col("s") + 1)
        ).alias("h"),
    )
    # occurrence count per chunk hash: groupBy + join-back, not a
    # window over "h" — a boilerplate chunk repeated corpus-wide is a
    # power-law key that would pin one WindowExec buffer (AQE splits
    # skewed joins, not windows; the substring-dedup lesson). The
    # checkpoint keeps the chunking scan single-pass across the
    # count side and the probe side. localCheckpoint is executor-
    # local and unreplicated (lineage truncated): fine locally; at
    # cluster scale use persist(DISK_ONLY_2) / reliable checkpoint —
    # the trade documented at llm/dedup.repeated_substring_spans.
    ch = ch.localCheckpoint()
    occ_n = ch.groupBy("h").agg(F.count(F.lit(1)).alias("n_occ"))
    occ = ch.join(occ_n, "h")
    dup = F.sum(F.when(F.col("n_occ") > 1, F.col("clen")).otherwise(F.lit(0)))
    return occ.groupBy("doc_id").agg(
        F.count(F.lit(1)).cast("long").alias("n_chunks"),
        F.max("n").cast("long").alias("n_chars"),
        dup.cast("long").alias("dup_chars"),
        F.round(dup.cast("double") / F.max("n"), 6).alias("dup_ratio"),
    )
