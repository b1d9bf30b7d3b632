"""Distributed Lloyd's k-means (seeded, fixed iterations).

The ML primitive behind IVF index builds, embedding-space corpus
curation, and semantic dedup bucketing. Public algorithm (Lloyd 1982);
the reference engine has no clustering surface — this extends the
LLM-pipeline coverage (SURVEY §2) next to llm/similarity.py, whose
seeded-centroid convention (first-k vectors by id) it reuses.

Spark-first shape: ASSIGNMENT is pure map-side — the k·d centroid
model travels in the expression closure (like similarity.py's seeded
IVF model), each row computes its k distances with the
dimension-sequential fold and picks the argmin via ``array_min`` over
(dist, cluster) structs, so no shuffle and no UDF. The UPDATE step
shuffles only (cluster, dim) partial means — k·d keys regardless of
corpus size — and the new model is a bounded k·d collect (model
state, not data). Centroid means are ROUND()ed to 6dp at every
iteration boundary: that is the documented float policy that keeps
both engines' models bit-identical, which in turn keeps the
sequential distance folds bit-identical (matching DuckDB's
``list_distance`` loop).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _assign(
    e: DataFrame, cents: list[tuple[int, list[float]]], keep_vec: bool = False
) -> DataFrame:
    """Map-side argmin assignment against closure centroids.

    Arrow-batched numpy scoring with the DIMENSION-SEQUENTIAL
    accumulation of llm/similarity._seq_cosine: per element the
    squared-distance sum is the strict left-to-right float64 loop --
    bit-identical to the oracle's ``list_distance`` per-pair loop --
    while staying vectorized across rows. (Both alternatives were
    measured first: the ``aggregate``/``zip_with`` HOF fold pays
    per-element interpreted-lambda dispatch, and a flattened
    8x64-term column expression blows up Catalyst analysis --
    3.5 s / 20 s vs sub-second for this form at sf0.1.)

    np.argmin takes the FIRST minimum and ``cents`` is sorted by
    cluster id, so ties break to the lowest cluster -- exactly the
    oracle's ROW_NUMBER() ORDER BY dist, cluster. np.sqrt is applied
    (IEEE correctly rounded, same as the oracle's) so even last-ulp
    sqrt collisions tie-break identically.
    """
    import numpy as np
    import pandas as pd

    from pyspark.sql import types as T

    cids = np.array([c for c, _ in cents], dtype=np.int64)
    cmat = np.array([v for _, v in cents], dtype=np.float64)

    fields = [
        T.StructField("vec_id", T.LongType(), False),
        T.StructField("cluster", T.LongType(), False),
    ]
    if keep_vec:
        fields.append(T.StructField("v", T.ArrayType(T.DoubleType()), False))
    schema = T.StructType(fields)

    def score(batches):
        for pdf in batches:
            if len(pdf) == 0:
                continue
            mat = np.stack(pdf["v"].to_numpy()).astype(np.float64)
            dist = np.zeros((len(mat), len(cmat)))
            for d in range(cmat.shape[1]):
                diff = mat[:, d : d + 1] - cmat[None, :, d]
                dist += diff * diff
            pick = np.argmin(np.sqrt(dist), axis=1)
            out = {"vec_id": pdf["vec_id"].to_numpy(), "cluster": cids[pick]}
            if keep_vec:
                out["v"] = pdf["v"]
            yield pd.DataFrame(out)

    return e.mapInPandas(score, schema=schema)


def kmeans_assign(
    emb: DataFrame,
    k: int = 8,
    updates: int = 2,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Run ``updates`` Lloyd iterations from the first-``k``-by-id
    seeds and return the final (vec_id, cluster) assignment."""
    e = emb.select(
        F.col(id_col).alias("vec_id"),
        F.transform(vec_col, lambda x: x.cast("double")).alias("v"),
    ).persist()
    seeds = (
        e.filter(F.col("vec_id") < k)
        .select(F.col("vec_id").alias("cluster"), "v")
        .collect()
    )  # bounded: k rows of model state
    cents = sorted((int(r["cluster"]), list(r["v"])) for r in seeds)
    try:
        d = len(cents[0][1])
        for _ in range(updates):
            # mean update: d avg-aggregates in ONE groupBy on cluster —
            # partial (map-side) aggregation ships k*d partials per
            # partition, vs the posexplode alternative that shuffles
            # n*d exploded rows. keep_vec avoids re-joining the corpus.
            a = _assign(e, cents, keep_vec=True)
            means = (
                a.groupBy("cluster")
                .agg(
                    *[
                        F.round(F.avg(F.col("v")[i]), 6).alias(f"m{i}")
                        for i in range(d)
                    ]
                )
                .collect()
            )  # bounded: k rows of model state
            cents = [
                (int(r["cluster"]), [float(r[f"m{i}"]) for i in range(d)])
                for r in sorted(means, key=lambda r: r["cluster"])
            ]
        return _assign(e, cents)
    finally:
        e.unpersist()
