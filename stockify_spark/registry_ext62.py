"""Round-8 extension wave 51: Python UDTF surface.

Spark 4's user-defined TABLE functions complete the repo's UDF
inventory (scalar pandas_udf — udf_scalar_pandas; grouped
applyInPandas — udf_group_zscore; now the one-row-to-many-rows
form). A UDTF is registered once and composed in SQL with LATERAL,
which is the shape users port from Hive's explode-style UDTFs or
Postgres set-returning functions.

The honest performance note from the repo's UDF policy applies
doubly: UDTF eval is row-at-a-time Python (no Arrow batching for the
yield path in this container's config), so this surface exists for
API completeness and extensibility — the same fixed-width chunking
is expressible as pure column ops (doc_chunk_stride's family), and
THAT is the hot path. The oracle proves the UDTF's semantics equal
the declarative form exactly.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from stockify_spark.registry import register, _t

_WIDTH = 40

_UDTF_SQL = f"""
SELECT doc_id, CAST(i AS INT) AS part,
       substr(text, CAST(i * {_WIDTH} + 1 AS INT), {_WIDTH}) AS piece,
       CAST(length(substr(text, CAST(i * {_WIDTH} + 1 AS INT), {_WIDTH}))
            AS INT) AS n_chars
FROM (SELECT doc_id, text,
             unnest(range(0, (length(text) + {_WIDTH - 1}) // {_WIDTH})) AS i
      FROM documents)
"""


@register("fn_udtf_chunks", _UDTF_SQL)
def fn_udtf_chunks(spark, sf_dir):
    """Fixed-width document chunking through a registered Python
    UDTF composed with LATERAL in SQL — the table-function member of
    the UDF surface. Each input row yields ceil(len/40) output rows
    (part index, piece, piece length); empty documents yield
    nothing, matching the oracle's empty range. The UDTF/declarative
    equivalence is the oracle check itself; the row-at-a-time cost
    profile (vs the arrow-batched and pure-column chunkers) is
    documented above and in tests/test_ext62.py."""
    from pyspark.sql.functions import udtf

    @udtf(returnType=f"part int, piece string, n_chars int")
    class ChunkText:
        def eval(self, text: str):
            if not text:
                return
            for i in range(0, (len(text) + _WIDTH - 1) // _WIDTH):
                piece = text[i * _WIDTH : (i + 1) * _WIDTH]
                yield i, piece, len(piece)

    spark.udtf.register("chunk_text", ChunkText)
    _t(spark, sf_dir, "documents").createOrReplaceTempView(
        "documents_udtf_src"
    )
    return spark.sql(
        """
        SELECT d.doc_id, c.part, c.piece, c.n_chars
        FROM documents_udtf_src d, LATERAL chunk_text(d.text) c
        """
    )
