"""Round-8 extension wave 46: skip-gram pairs + negative sampling.

The corpus preparation word2vec-family training actually consumes
(Mikolov et al. 2013): (center, context) co-occurrence pairs within
a +-2 token window, and the famous unigram^(3/4) negative-sampling
distribution — the 3/4 power is the published constant that lifts
rare words' sampling mass. Together with graph_random_walk (walk
corpus) and sim_* (the consumers of the resulting vectors), this
completes the embedding-training data path.
"""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F

from stockify_spark.registry import register, _t

_W = 2
_TOPN = 100

_SG_SQL = f"""
WITH tok AS (SELECT string_split(lower(text), ' ') AS ts FROM documents),
pairs AS (
  SELECT ts[i] AS center, ts[i + d] AS context
  FROM (SELECT ts, unnest(range(1, len(ts) + 1)) AS i FROM tok),
       (SELECT unnest(range(1, {_W + 1})) AS d)
  WHERE i + d <= len(ts)
  UNION ALL
  SELECT ts[i + d] AS center, ts[i] AS context
  FROM (SELECT ts, unnest(range(1, len(ts) + 1)) AS i FROM tok),
       (SELECT unnest(range(1, {_W + 1})) AS d)
  WHERE i + d <= len(ts)),
pc AS (SELECT center, context, CAST(COUNT(*) AS BIGINT) AS n
       FROM pairs GROUP BY 1, 2),
uni AS (SELECT context AS w, SUM(n) AS f FROM pc GROUP BY 1),
pw AS (SELECT w, pow(f, 0.75) AS fp FROM uni),
tot AS (SELECT ROUND(SUM(fp), 6) AS t FROM pw),
ranked AS (
  SELECT pc.center, pc.context, pc.n,
         ROUND(pw.fp / tot.t, 6) AS p_neg_context,
         ROW_NUMBER() OVER (ORDER BY pc.n DESC, pc.center, pc.context) AS rnk
  FROM pc JOIN pw ON pw.w = pc.context CROSS JOIN tot)
SELECT center, context, n, p_neg_context FROM ranked WHERE rnk <= {_TOPN}
"""


@register("text_skipgram_pairs", _SG_SQL)
def text_skipgram_pairs(spark, sf_dir):
    """Top-100 skip-gram pairs (count desc, lexicographic tie-break)
    with each context word's unigram^0.75 negative-sampling
    probability. Pair generation is symmetric by construction
    (every ordered pair is emitted for both roles), so
    sum-over-contexts of a word's pair counts equals its window-
    bounded occurrence degree — pinned in tests/test_ext57.py along
    with the 3/4-power property (rare words gain relative mass over
    the raw unigram distribution).

    Scale shape: pair explode is a narrow map (2*W rows per token);
    one (center, context) count shuffle with map-side combine —
    vocabulary^2-bounded like the bigram tables; the sampling
    distribution is one vocabulary-sized aggregate and a scalar.
    The word2vec trainer consumes exactly these two tables."""
    docs = _t(spark, sf_dir, "documents").select(
        F.split(F.lower("text"), " ").alias("ts")
    )
    # all distances and both directions in ONE array expression, so
    # the corpus is scanned once (the unioned-explode first draft
    # read documents 12 times — plan-audit catch)
    arrays = []
    for d in range(1, _W + 1):
        n = F.size("ts")
        left = F.slice("ts", 1, F.greatest(n - d, F.lit(0)))
        right = F.slice("ts", d + 1, F.greatest(n - d, F.lit(0)))
        arrays.append(
            F.zip_with(
                left,
                right,
                lambda a, b: F.struct(a.alias("x"), b.alias("y")),
            )
        )
        arrays.append(
            F.zip_with(
                left,
                right,
                lambda a, b: F.struct(b.alias("x"), a.alias("y")),
            )
        )
    pairs = docs.select(
        F.explode(F.concat(*arrays)).alias("p")
    ).select(F.col("p.x").alias("center"), F.col("p.y").alias("context"))
    pc = pairs.groupBy("center", "context").agg(
        F.count(F.lit(1)).alias("n")
    )
    uni = pc.groupBy(F.col("context").alias("w")).agg(F.sum("n").alias("f"))
    pw = uni.select("w", F.pow("f", 0.75).alias("fp"))
    tot = pw.agg(F.round(F.sum("fp"), 6).alias("t"))
    ranked = (
        pc.join(pw, pc["context"] == pw["w"])
        .crossJoin(F.broadcast(tot))
        .select(
            "center",
            "context",
            "n",
            F.round(F.col("fp") / F.col("t"), 6).alias("p_neg_context"),
            F.row_number()
            .over(Window.orderBy(F.col("n").desc(), "center", "context"))
            .alias("rnk"),
        )
    )
    return ranked.filter(F.col("rnk") <= _TOPN).select(
        "center", "context", "n", "p_neg_context"
    )
