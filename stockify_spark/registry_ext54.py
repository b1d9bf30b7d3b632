"""Round-8 extension wave 43: positional proximity search (NEAR).

text_inverted_index answers "which documents contain the term";
phrase and NEAR queries need POSITIONS — the other half of an IR
index. The engine question is computing the minimum token distance
between two terms' occurrence sets without a quadratic per-document
pair join: merge both position lists in token order and take the
minimum gap over ADJACENT opposite-term pairs. That is exact — the
globally closest opposite pair can have no occurrence of either term
strictly between its endpoints (it would form a closer pair) — so
one sort-window pass replaces the occurrences-squared join.
"""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F

from stockify_spark.registry import register, _t

_NEAR_SQL = """
WITH tok AS (SELECT doc_id, string_split(lower(text), ' ') AS ts
             FROM documents),
words AS (SELECT doc_id, ts[i] AS w, i AS p
          FROM (SELECT doc_id, ts, unnest(range(1, len(ts) + 1)) AS i
                FROM tok)),
top2 AS (SELECT w, ROW_NUMBER() OVER (ORDER BY COUNT(*) DESC, w) AS rnk
         FROM words GROUP BY w),
terms AS (SELECT MAX(CASE WHEN rnk = 1 THEN w END) AS t1,
                 MAX(CASE WHEN rnk = 2 THEN w END) AS t2
          FROM top2 WHERE rnk <= 2),
occ AS (SELECT doc_id, p,
               CASE WHEN w = t1 THEN 1 ELSE 2 END AS which
        FROM words, terms WHERE w IN (t1, t2)),
adj AS (SELECT doc_id, p, which,
               LAG(p) OVER (PARTITION BY doc_id ORDER BY p) AS pp,
               LAG(which) OVER (PARTITION BY doc_id ORDER BY p) AS pw
        FROM occ)
SELECT doc_id,
       CAST(SUM(CASE WHEN which = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n1,
       CAST(SUM(CASE WHEN which = 2 THEN 1 ELSE 0 END) AS BIGINT) AS n2,
       CAST(MIN(CASE WHEN pw IS NOT NULL AND pw <> which
                     THEN p - pp END) AS BIGINT) AS min_dist
FROM adj GROUP BY doc_id
HAVING SUM(CASE WHEN which = 1 THEN 1 ELSE 0 END) > 0
   AND SUM(CASE WHEN which = 2 THEN 1 ELSE 0 END) > 0
"""


@register("text_proximity_search", _NEAR_SQL)
def text_proximity_search(spark, sf_dir):
    """NEAR query over the corpus's two most frequent words
    (count-desc, lexicographic tie-break — derived in-query, so the
    operator survives testdata regeneration): per document holding
    both, the occurrence counts and the exact minimum token distance
    via the merged-order adjacent-gap argument (brute-force-verified
    in tests/test_ext54.py). A phrase query is the min_dist = 1
    special case with term order pinned.

    Scale shape: the position explode is a narrow map; occurrences
    of the two query terms are a tiny filtered slice of it; the gap
    scan is one window over that slice partitioned by doc — no
    occurrences-squared join anywhere, which is what makes NEAR
    affordable when a stopword is one of the terms (every document,
    hundreds of positions)."""
    docs = _t(spark, sf_dir, "documents").select(
        "doc_id", F.split(F.lower("text"), " ").alias("ts")
    )
    words = docs.select(
        "doc_id", F.posexplode("ts").alias("p0", "w")
    ).select("doc_id", (F.col("p0") + 1).alias("p"), "w")
    top2 = (
        words.groupBy("w")
        .agg(F.count(F.lit(1)).alias("c"))
        .withColumn(
            "rnk",
            F.row_number().over(Window.orderBy(F.col("c").desc(), "w")),
        )
        .filter(F.col("rnk") <= 2)
    )
    terms = top2.agg(
        F.max(F.when(F.col("rnk") == 1, F.col("w"))).alias("t1"),
        F.max(F.when(F.col("rnk") == 2, F.col("w"))).alias("t2"),
    )
    occ = (
        words.crossJoin(F.broadcast(terms))
        .filter((F.col("w") == F.col("t1")) | (F.col("w") == F.col("t2")))
        .select(
            "doc_id",
            "p",
            F.when(F.col("w") == F.col("t1"), F.lit(1))
            .otherwise(F.lit(2))
            .alias("which"),
        )
    )
    w = Window.partitionBy("doc_id").orderBy("p")
    adj = occ.select(
        "doc_id",
        "p",
        "which",
        F.lag("p").over(w).alias("pp"),
        F.lag("which").over(w).alias("pw"),
    )
    return (
        adj.groupBy("doc_id")
        .agg(
            F.sum(F.when(F.col("which") == 1, 1).otherwise(0))
            .cast("long")
            .alias("n1"),
            F.sum(F.when(F.col("which") == 2, 1).otherwise(0))
            .cast("long")
            .alias("n2"),
            F.min(
                F.when(
                    F.col("pw").isNotNull() & (F.col("pw") != F.col("which")),
                    F.col("p") - F.col("pp"),
                )
            )
            .cast("long")
            .alias("min_dist"),
        )
        .filter((F.col("n1") > 0) & (F.col("n2") > 0))
    )
