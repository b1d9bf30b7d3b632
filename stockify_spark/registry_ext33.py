"""Round-8 extension wave 22: chunk-reconstruction audit.

The inverse test every chunking pipeline owes its users: stitch the
sliding-window chunks (doc_chunk_stride's exact construction — 64
window, 48 stride) back into the document and verify losslessness
PER DOCUMENT inside the result. Stride-prefix stitching: every chunk
but the last contributes its first 48 tokens, the last contributes
all of its tokens — algebraically exact coverage with no
double-counted overlap."""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F

from stockify_spark.registry import register, _t
from stockify_spark.registry_ext6 import _CHUNK_S, _CHUNK_W

_AUDIT_SQL = f"""
WITH t AS (SELECT doc_id, string_split(text, ' ') AS toks FROM documents),
e AS (SELECT doc_id, toks,
             unnest(range(0, ((len(toks) - 1) // {_CHUNK_S}) + 1)) AS i
      FROM t),
contrib AS (
  SELECT doc_id, i,
         MAX(i) OVER (PARTITION BY doc_id) AS max_i,
         CASE WHEN i < MAX(i) OVER (PARTITION BY doc_id)
              THEN array_to_string(
                     list_slice(toks, i * {_CHUNK_S} + 1,
                                i * {_CHUNK_S} + {_CHUNK_S}), ' ')
              ELSE array_to_string(
                     list_slice(toks, i * {_CHUNK_S} + 1,
                                i * {_CHUNK_S} + {_CHUNK_W}), ' ')
         END AS part,
         array_to_string(toks, ' ') AS norm
  FROM e
),
rebuilt AS (
  SELECT doc_id, MAX(max_i) + 1 AS n_chunks,
         string_agg(part, ' ' ORDER BY i) AS joined,
         MAX(norm) AS norm
  FROM contrib GROUP BY doc_id
)
SELECT doc_id, CAST(n_chunks AS BIGINT) AS n_chunks,
       joined = norm AS reconstruction_ok,
       CAST(length(norm) AS BIGINT) AS n_chars
FROM rebuilt
"""


@register("pipeline_chunk_audit", _AUDIT_SQL)
def pipeline_chunk_audit(spark, sf_dir):
    """Lossless-chunking audit: re-derive doc_chunk_stride's exact
    chunks (window 64, stride 48), stitch them by stride-prefix
    (chunks 0..k-1 give their first 48 tokens, the final chunk
    gives all of its tokens — covering every token exactly once),
    and compare the rebuilt document to the normalized original IN
    the result: reconstruction_ok must be true on every row, and the
    driver hash-checks that claim. The audit is the same shape as
    the chunker (per-row slices + one per-doc window), so running it
    at 100 TB costs one extra pass over the chunk table."""
    docs = _t(spark, sf_dir, "documents")
    toks = F.split("text", " ")
    n = F.size("toks")
    e = docs.select("doc_id", toks.alias("toks")).select(
        "doc_id",
        "toks",
        F.explode(
            F.sequence(F.lit(0), F.floor((n - 1) / _CHUNK_S).cast("int"))
        ).alias("i"),
    )
    wdoc = Window.partitionBy("doc_id")
    max_i = F.max("i").over(wdoc)
    part = F.when(
        F.col("i") < max_i,
        F.concat_ws(
            " ", F.slice("toks", F.col("i") * _CHUNK_S + 1, _CHUNK_S)
        ),
    ).otherwise(
        F.concat_ws(
            " ", F.slice("toks", F.col("i") * _CHUNK_S + 1, _CHUNK_W)
        )
    )
    contrib = e.select(
        "doc_id",
        "i",
        max_i.alias("max_i"),
        part.alias("part"),
        F.concat_ws(" ", F.col("toks")).alias("norm"),
    )
    rebuilt = contrib.groupBy("doc_id").agg(
        (F.max("max_i") + 1).alias("n_chunks"),
        F.concat_ws(
            " ", F.array_sort(F.collect_list(F.struct("i", "part"))).part
        ).alias("joined"),
        F.max("norm").alias("norm"),
    )
    return rebuilt.select(
        "doc_id",
        F.col("n_chunks").cast("long").alias("n_chunks"),
        (F.col("joined") == F.col("norm")).alias("reconstruction_ok"),
        F.length("norm").cast("long").alias("n_chars"),
    )
