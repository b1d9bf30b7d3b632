"""PageRank tests (stockify_spark/operators/graph.py): closed-form
check on a symmetric graph, mass conservation, and agreement with a
NumPy power-iteration reference on a weighted digraph."""

from __future__ import annotations

import numpy as np
import pytest

from stockify_spark.operators.graph import pagerank


def test_symmetric_graph_is_uniform(spark):
    """On a regular symmetric graph every node must keep rank 1/n at
    every iteration (the uniform vector is the fixed point)."""
    ring = [(i, (i + 1) % 6, 1.0) for i in range(6)] + [
        ((i + 1) % 6, i, 1.0) for i in range(6)
    ]
    edges = spark.createDataFrame(ring, "src int, dst int, w double")
    rows = pagerank(edges, iters=5).collect()
    assert len(rows) == 6
    for r in rows:
        assert r["rank"] == pytest.approx(1.0 / 6, abs=1e-12)


def test_weighted_digraph_matches_numpy_power_iteration(spark):
    rng = np.random.RandomState(7)
    n, d = 10, 0.85
    w = rng.randint(1, 5, size=(n, n)).astype(float)  # dense: all nodes in+out
    edges = spark.createDataFrame(
        [(i, j, float(w[i, j])) for i in range(n) for j in range(n)],
        "src int, dst int, w double",
    )
    got = {r["node"]: r["rank"] for r in pagerank(edges, iters=8).collect()}

    p = w / w.sum(axis=1, keepdims=True)  # row-stochastic
    r = np.full(n, 1.0 / n)
    for _ in range(8):
        r = (1 - d) / n + d * (p.T @ r)
    for i in range(n):
        assert got[i] == pytest.approx(r[i], rel=1e-9)
    # stochastic matrix: total mass conserved
    assert sum(got.values()) == pytest.approx(1.0, abs=1e-9)


def test_lineage_checkpoint_keeps_many_iterations_tractable(spark):
    """20 iterations with checkpoint_every=4 must complete and agree
    with the 8-iteration result's fixed point on a strongly
    convergent graph (spectral gap ~d)."""
    edges = spark.createDataFrame(
        [(0, 1, 1.0), (1, 2, 1.0), (2, 0, 1.0), (0, 2, 1.0), (2, 1, 1.0), (1, 0, 1.0)],
        "src int, dst int, w double",
    )
    a = {r["node"]: r["rank"] for r in pagerank(edges, iters=20, checkpoint_every=4).collect()}
    assert sum(a.values()) == pytest.approx(1.0, abs=1e-9)
    for v in a.values():
        assert v == pytest.approx(1.0 / 3, abs=1e-6)  # symmetric: uniform


# --- triangles (operators/graph.triangles) ---------------------------------

def _brute_triangles(edge_set):
    import itertools

    nodes = sorted({v for e in edge_set for v in e})
    out = []
    for a, b, c in itertools.combinations(nodes, 3):
        if (a, b) in edge_set and (b, c) in edge_set and (a, c) in edge_set:
            out.append((a, b, c))
    return sorted(out)


def test_triangles_match_brute_force_on_random_graph(spark):
    import numpy as np

    rng = np.random.RandomState(11)
    n = 25
    edge_set = {
        (int(a), int(b))
        for a in range(n)
        for b in range(a + 1, n)
        if rng.rand() < 0.25
    }
    from stockify_spark.operators.graph import triangles

    edges = spark.createDataFrame(sorted(edge_set), "a long, b long")
    got = sorted(
        (r["x1"], r["x2"], r["x3"]) for r in triangles(edges).collect()
    )
    assert got == _brute_triangles(edge_set)
    assert len(got) > 10  # non-degenerate instance


def test_triangles_each_emitted_once_on_complete_graph(spark):
    """K5 has exactly C(5,3)=10 triangles; orientation must emit each
    once with sorted ids (the degree-tie path: all degrees equal)."""
    edge_set = {(a, b) for a in range(5) for b in range(a + 1, 5)}
    from stockify_spark.operators.graph import triangles

    edges = spark.createDataFrame(sorted(edge_set), "a long, b long")
    rows = [(r["x1"], r["x2"], r["x3"]) for r in triangles(edges).collect()]
    assert len(rows) == 10 == len(set(rows))
    assert all(x1 < x2 < x3 for x1, x2, x3 in rows)


def test_triangles_hub_graph_has_none(spark):
    """A star (one hub, no rim edges) is triangle-free — the case
    where naive wedge counting is quadratic in hub degree."""
    edge_set = {(0, b) for b in range(1, 40)}
    from stockify_spark.operators.graph import triangles

    edges = spark.createDataFrame(sorted(edge_set), "a long, b long")
    assert triangles(edges).count() == 0


# --- tree_depth (operators/graph.tree_depth) -------------------------------

def test_tree_depth_binary_heap_closed_form(spark):
    """In the heap tree (parent = k // 2), depth(k) = floor(log2 k)."""
    import math

    from stockify_spark.operators.graph import tree_depth

    edges = spark.createDataFrame(
        [(k, k // 2) for k in range(2, 64)], "node long, parent long"
    )
    got = {r["node"]: r["depth"] for r in tree_depth(edges, root=1).collect()}
    assert got == {k: int(math.log2(k)) for k in range(1, 64)}


def test_tree_depth_long_chain_converges_in_log_rounds(spark):
    """A 300-node chain has height 299 — pointer doubling must reach
    every depth without 299 sequential joins (wall-clock sanity) and
    return the exact depths."""
    from stockify_spark.operators.graph import tree_depth

    n = 300
    edges = spark.createDataFrame(
        [(k, k - 1) for k in range(1, n)], "node long, parent long"
    )
    got = {r["node"]: r["depth"] for r in tree_depth(edges, root=0).collect()}
    assert got == {k: k for k in range(n)}
