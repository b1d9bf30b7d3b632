"""Round-8 extension wave 61: lexical diversity (TTR and MATTR).

Type-token ratio — distinct words over total words — is the basic
lexical-diversity signal in corpus quality filters, but raw TTR
falls mechanically with document length (longer texts repeat), so
cross-length comparisons need the Moving-Average TTR (Covington &
McFall 2010): the mean TTR over every sliding window of fixed width.
MATTR is length-invariant by construction and all-integer exact —
each window's distinct count is an integer, the mean is a ratio of
integers — making it the rare diversity metric with a hash-exact
differential oracle.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from stockify_spark.registry import register, _t

_W = 25  # MATTR window

_MATTR_SQL = f"""
WITH t AS (SELECT doc_id, string_split(lower(text), ' ') AS toks
           FROM documents),
base AS (
  SELECT doc_id, len(toks) AS n,
         len(list_distinct(toks)) AS n_types, toks
  FROM t),
wins AS (
  SELECT doc_id,
         len(list_distinct(list_slice(toks, i, i + {_W - 1}))) AS d
  FROM (SELECT doc_id, toks, unnest(range(1, len(toks) - {_W - 2})) AS i
        FROM base WHERE n >= {_W})),
mavg AS (
  SELECT doc_id,
         ROUND(CAST(SUM(d) AS DOUBLE) / (COUNT(*) * {_W}), 6) AS mattr
  FROM wins GROUP BY 1)
SELECT b.doc_id, CAST(b.n AS BIGINT) AS n_tokens,
       CAST(b.n_types AS BIGINT) AS n_types,
       ROUND(CAST(b.n_types AS DOUBLE) / b.n, 6) AS ttr,
       m.mattr
FROM base b LEFT JOIN mavg m USING (doc_id)
"""


@register("text_mattr", _MATTR_SQL)
def text_mattr(spark, sf_dir):
    """Per-document TTR and window-25 MATTR (NULL below 25 tokens —
    the metric is undefined, not zero). Integer-exact: every
    window's type count and the total are integers; the only
    division happens once per document at output. The
    length-invariance property MATTR exists for (raw TTR falls with
    length on self-concatenated text, MATTR does not) is pinned in
    tests/test_ext72.py alongside a brute-force window recount.

    Scale shape: the window explode multiplies tokens by ~1 (each
    token enters W windows but the explode is per-START, one row per
    window), stays a narrow map, and collapses in a per-doc
    aggregate; a production form replaces list_distinct per window
    with the classic last-occurrence trick (distinct-in-window =
    count of tokens whose previous occurrence is outside — one lag
    window over positions) when W grows large."""
    docs = _t(spark, sf_dir, "documents").select(
        "doc_id", F.split(F.lower("text"), " ").alias("toks")
    )
    base = docs.select(
        "doc_id",
        F.size("toks").alias("n"),
        F.size(F.array_distinct("toks")).alias("n_types"),
        "toks",
    )
    wins = (
        base.filter(F.col("n") >= _W)
        .select(
            "doc_id",
            F.explode(
                F.sequence(F.lit(1), F.col("n") - (_W - 1))
            ).alias("i"),
            "toks",
        )
        .select(
            "doc_id",
            F.size(
                F.array_distinct(F.slice("toks", F.col("i"), _W))
            ).alias("d"),
        )
    )
    mavg = wins.groupBy("doc_id").agg(
        F.round(
            F.sum("d").cast("double") / (F.count(F.lit(1)) * _W), 6
        ).alias("mattr")
    )
    return base.join(mavg, "doc_id", "left").select(
        "doc_id",
        F.col("n").cast("long").alias("n_tokens"),
        F.col("n_types").cast("long").alias("n_types"),
        F.round(F.col("n_types").cast("double") / F.col("n"), 6).alias("ttr"),
        "mattr",
    )
