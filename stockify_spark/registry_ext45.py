"""Round-8 extension wave 34: exact MIPS via the cosine reduction.

Maximum-inner-product search does not fit a metric index: inner
product violates the triangle inequality and even self-similarity
(a longer vector beats the query itself). The public reduction
(Bachrach et al. 2014, "Speeding up the Xbox recommender"):
augment every corpus vector with one extra coordinate
sqrt(M^2 - ||x||^2) where M is the corpus max norm, and the query
with 0. Then every augmented corpus vector has norm exactly M, so
||q' - x'||^2 = ||q||^2 + M^2 - 2<q,x> — L2 (and cosine) order in
the augmented space IS inner-product order, and any cosine-ANN
machinery (the sim_ivf/lsh/pq family) becomes a MIPS index with no
further changes.
"""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F

from stockify_spark.registry import register, _t

_MIPS_SQL = """
WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS emb FROM embeddings),
m AS (SELECT MAX(list_dot_product(emb, emb)) AS m2 FROM e),
q AS (SELECT vec_id AS query_id, emb AS qe FROM e WHERE vec_id < 5),
a AS (SELECT vec_id, emb,
             list_append(emb, sqrt(m.m2 - list_dot_product(emb, emb))) AS xa
      FROM e, m),
r AS (SELECT query_id, vec_id,
             ROUND(list_dot_product(qe, emb), 6) AS ip,
             ROW_NUMBER() OVER (PARTITION BY query_id
               ORDER BY list_cosine_similarity(list_append(qe, 0.0), xa)
                        DESC, vec_id) AS rank
      FROM q CROSS JOIN a WHERE query_id <> vec_id)
SELECT query_id, CAST(rank AS BIGINT) AS rank, vec_id, ip
FROM r WHERE rank <= 5
"""
# the ::DOUBLE[] cast is load-bearing: DuckDB's list_dot_product on a
# FLOAT[] accumulates in float32, which perturbs m2 by ~2e-7 — and the
# augmented coordinate sqrt(m2 - ||x||^2) amplifies that to ~1e-4 for
# near-max-norm vectors, flipping augmented-cosine ranks across
# engines. On DOUBLE[] both engines fold dimension-sequentially in
# float64 and the match is bit-level.


@register("sim_mips_topk", _MIPS_SQL)
def sim_mips_topk(spark, sf_dir):
    """Top-5 by inner product for 5 query vectors, ranked THROUGH the
    augmentation: corpus max squared norm (one aggregate, a scalar
    broadcast), one extra coordinate per side, cosine ordering in
    the augmented space, reported with the exact inner product. The
    rank-preservation identity (augmented-cosine order == raw-IP
    order, because every augmented corpus norm equals M) is pinned
    against direct numpy IP ranking in tests/test_ext45.py; the
    oracle pins the cross-engine implementation of the reduction
    itself. Both faces accumulate dot products dimension-
    sequentially (llm.similarity.dot's fold == DuckDB's list loops,
    the sim_cosine_topk precedent), so the hash match is exact.

    Scale shape: the augmentation is a map-only rewrite plus one
    scalar broadcast; ranking is the brute-force cosine baseline
    (bounded query set — one pass over the corpus, map-side partial
    top-k). The point of the operator is the REDUCTION: swap the
    brute-force stage for sim_ivf/lsh/pq's bucketed candidate
    generation over the augmented vectors and MIPS inherits their
    100 TB layout unchanged."""
    from stockify_spark.llm.similarity import cosine, dot

    emb = _t(spark, sf_dir, "embeddings")
    m2 = emb.agg(
        F.max(dot("embedding", "embedding")).alias("m2")
    )
    q = emb.filter(F.col("vec_id") < 5).select(
        F.col("vec_id").alias("query_id"),
        F.col("embedding").alias("qe"),
    )
    a = emb.crossJoin(F.broadcast(m2)).select(
        "vec_id",
        "embedding",
        F.concat(
            "embedding",
            F.array(F.sqrt(F.col("m2") - dot("embedding", "embedding"))),
        ).alias("xa"),
    )
    scored = (
        F.broadcast(q)
        .crossJoin(a)
        .filter(F.col("query_id") != F.col("vec_id"))
        .select(
            "query_id",
            "vec_id",
            F.round(dot("qe", "embedding"), 6).alias("ip"),
            cosine(
                F.concat("qe", F.array(F.lit(0.0))), F.col("xa")
            ).alias("aug_cos"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("aug_cos").desc(), "vec_id"
    )
    return (
        scored.withColumn("rank", F.row_number().over(w).cast("long"))
        .filter(F.col("rank") <= 5)
        .select("query_id", "rank", "vec_id", "ip")
    )
