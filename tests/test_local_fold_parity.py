"""Local-solve / distributed-loop parity for the model-sized
iteration escapes (operators/graph.pagerank, functions/bpe,
llm/clustering.kmeans_assign).

Each of these operators gates on the size of its ITERATION state
(edge list / vocabulary / corpus rows) and, when model-sized, runs
every round in one executor-resident pass instead of one-job-per-
round. These tests pin that the two paths produce identical results
on the same input — the local pass is an execution strategy, not a
semantic fork — by forcing the distributed branch with a zero gate
and comparing row-for-row.
"""

from __future__ import annotations

import numpy as np
import pytest

from stockify_spark.functions.bpe import bpe_learn, bpe_learn_batched
from stockify_spark.llm.clustering import kmeans_assign
from stockify_spark.operators.graph import pagerank


def _rank_maps(spark, edges):
    loc = {r["node"]: r["rank"] for r in pagerank(edges, iters=8).collect()}
    dist = {
        r["node"]: r["rank"]
        for r in pagerank(edges, iters=8, local_edge_limit=0).collect()
    }
    return loc, dist


def test_pagerank_parity_weighted_digraph(spark):
    rng = np.random.RandomState(11)
    n = 12
    w = rng.randint(1, 6, size=(n, n)).astype(float)
    edges = spark.createDataFrame(
        [(i, j, float(w[i, j])) for i in range(n) for j in range(n)],
        "src int, dst int, w double",
    )
    loc, dist = _rank_maps(spark, edges)
    assert set(loc) == set(dist) == set(range(n))
    for node in loc:
        # both paths sum ≤n doubles per destination in engine-defined
        # order; agreement must be far inside the oracle's ROUND(9)
        assert loc[node] == pytest.approx(dist[node], abs=1e-12)


def test_pagerank_parity_node_dropout(spark):
    # node 2 has no in-edges so it drops out after round 1; node 3's
    # ONLY in-source is 2, so 3 receives rank in round 1 and then
    # drops out in round 2 — both paths must realize the same
    # inner-join fixed point
    edges = spark.createDataFrame(
        [(0, 1, 1.0), (1, 0, 1.0), (2, 3, 1.0)],
        "src int, dst int, w double",
    )
    loc, dist = _rank_maps(spark, edges)
    assert set(loc) == set(dist) == {0, 1}
    for node in loc:
        assert loc[node] == pytest.approx(dist[node], abs=1e-12)


def _word_table(spark):
    rows = [
        ("lower", 5),
        ("lowest", 3),
        ("newer", 6),
        ("wider", 2),
        ("new", 4),
        ("renew", 1),
        ("aaaa", 7),  # overlapping-pair scan order matters here
    ]
    return spark.createDataFrame(rows, "word string, cnt long")


def test_bpe_serial_parity(spark):
    words = _word_table(spark)
    loc = [tuple(r) for r in bpe_learn(spark, words, steps=5).collect()]
    dist = [
        tuple(r)
        for r in bpe_learn(spark, words, steps=5, local_vocab_limit=0).collect()
    ]
    assert loc == dist and len(loc) == 5


def test_bpe_batched_parity(spark):
    words = _word_table(spark)
    loc = [tuple(r) for r in bpe_learn_batched(spark, words, rounds=3, batch=4).collect()]
    dist = [
        tuple(r)
        for r in bpe_learn_batched(
            spark, words, rounds=3, batch=4, local_vocab_limit=0
        ).collect()
    ]
    assert loc == dist and len(loc) >= 3


def test_kmeans_parity(spark):
    rng = np.random.RandomState(3)
    emb = spark.createDataFrame(
        [(i, rng.rand(8).round(3).tolist()) for i in range(120)],
        "vec_id long, embedding array<double>",
    )
    loc = sorted(
        (r["vec_id"], r["cluster"]) for r in kmeans_assign(emb, k=6, updates=3).collect()
    )
    dist = sorted(
        (r["vec_id"], r["cluster"])
        for r in kmeans_assign(emb, k=6, updates=3, local_rows_limit=0).collect()
    )
    assert loc == dist and len(loc) == 120


def test_local_folds_on_empty_input(spark):
    """An empty coalesced partition yields ZERO Arrow batches —
    pd.concat([]) raises ValueError('No objects to concatenate'), so
    every local-fold closure must materialize the batch list first.
    bpe on an empty word table returns an empty merge table (the
    pre-local-fold behavior); pagerank on an empty edge list returns
    an empty rank table; kmeans raises its documented domain error."""
    words = spark.createDataFrame([], "word string, cnt long")
    assert bpe_learn(spark, words, steps=3).collect() == []
    assert bpe_learn_batched(spark, words, rounds=2, batch=2).collect() == []

    edges = spark.createDataFrame([], "src int, dst int, w double")
    assert pagerank(edges, iters=4).collect() == []

    emb = spark.createDataFrame([], "vec_id long, embedding array<double>")
    with pytest.raises(ValueError, match="no seed vectors"):
        kmeans_assign(emb, k=3, updates=2)


def test_round6_half_up_matches_spark_round(spark):
    """The local fold's model-boundary rounding must be EXACTLY
    Spark's Round(double, 6) — which rounds the shortest decimal
    string (BigDecimal.valueOf), not the binary value. The first
    value is the adversarial case: its binary double sits below the
    half boundary but its shortest string '1.0000005' rounds up."""
    from pyspark.sql import functions as F

    from stockify_spark.llm.clustering import _round6_half_up

    vals = [
        1.0000005,
        -1.0000005,
        0.0000005,
        -0.0000005,
        2.5e-7,
        1.9999995,
        0.1234565,
        7.0000004999999995,
        123.45678949999,
        0.0,
    ]
    df = spark.createDataFrame([(v,) for v in vals], "x double")
    got = [r["r"] for r in df.select(F.round("x", 6).alias("r")).collect()]
    assert got == [_round6_half_up(v) for v in vals]
