"""Distributed PCA (llm/pca.pca_power): known-geometry check,
partition invariance, eigen-agreement with numpy, and degenerate
inputs."""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from stockify_spark.llm.pca import pca_power


def _vecs_df(spark, mat, parts=4):
    rows = [(i, [float(x) for x in row]) for i, row in enumerate(mat)]
    return spark.createDataFrame(
        rows, "vec_id long, embedding array<double>"
    ).repartition(parts)


def test_dominant_direction_2d(spark):
    """Points spread along (1, 1) with small orthogonal noise: the
    top component must align with the diagonal and the eigenvalue
    with the large variance."""
    rng = np.random.RandomState(5)
    t = rng.randn(400) * 3.0
    noise = rng.randn(400) * 0.1
    mat = np.stack([t + noise, t - noise], axis=1) / np.sqrt(2)
    out = {r["dim"]: r for r in pca_power(_vecs_df(spark, mat)).collect()}
    l1, l2 = out[1]["loading"], out[2]["loading"]
    assert abs(abs(l1) - abs(l2)) < 0.05  # diagonal direction
    assert np.sign(l1) == np.sign(l2)
    assert l1 * l1 + l2 * l2 == pytest.approx(1.0, abs=1e-6)
    ev = out[1]["eigenvalue"]
    assert ev == pytest.approx(np.var(t), rel=0.2)


def test_partition_invariance(spark):
    """Gram partials sum in engine order — the ROUND(9) boundary must
    absorb it: 1-partition and 8-partition runs agree exactly."""
    rng = np.random.RandomState(9)
    mat = rng.rand(300, 16)
    a = sorted(map(tuple, pca_power(_vecs_df(spark, mat, parts=1)).collect()))
    b = sorted(map(tuple, pca_power(_vecs_df(spark, mat, parts=8)).collect()))
    assert a == b


def test_agrees_with_numpy_eigh(spark):
    """8 power rounds on a well-separated spectrum ~ the true top
    eigenvector (up to sign) and eigenvalue."""
    rng = np.random.RandomState(13)
    base = rng.randn(500, 6)
    base[:, 0] *= 5.0  # dominant axis
    out = pca_power(_vecs_df(spark, base)).collect()
    loadings = np.array([r["loading"] for r in sorted(out, key=lambda r: r["dim"])])
    ev = out[0]["eigenvalue"]
    cov = np.cov(base, rowvar=False, bias=True)
    w, v = np.linalg.eigh(cov)
    top = v[:, -1] * np.sign(v[np.argmax(np.abs(v[:, -1])), -1])
    got = loadings * np.sign(loadings[np.argmax(np.abs(loadings))])
    assert np.allclose(got, top, atol=5e-3)
    assert ev == pytest.approx(w[-1], rel=5e-3)


def test_empty_corpus_raises(spark):
    df = spark.createDataFrame([], "vec_id long, embedding array<double>")
    with pytest.raises(Exception, match="empty corpus"):
        pca_power(df)


def test_topk_components_orthogonal_and_ordered(spark):
    from stockify_spark.llm.pca import pca_topk

    rng = np.random.RandomState(21)
    base = rng.randn(400, 8)
    base[:, 0] *= 6.0
    base[:, 1] *= 3.0
    rows = pca_topk(_vecs_df(spark, base), k=3).collect()
    comps = {}
    evs = {}
    for r in rows:
        comps.setdefault(r["component"], {})[r["dim"]] = r["loading"]
        evs[r["component"]] = r["eigenvalue"]
    vs = [
        np.array([comps[c][d] for d in sorted(comps[c])]) for c in (1, 2, 3)
    ]
    assert evs[1] > evs[2] > evs[3] > 0  # deflation orders the spectrum
    for a in range(3):
        assert np.linalg.norm(vs[a]) == pytest.approx(1.0, abs=1e-6)
        for b in range(a + 1, 3):
            assert abs(float(vs[a] @ vs[b])) < 1e-3  # Hotelling orthogonality


def test_project_matches_manual_centering(spark):
    from stockify_spark.llm.pca import _gram, _power_deflate, pca_project

    rng = np.random.RandomState(27)
    base = rng.rand(150, 5)
    df = _vecs_df(spark, base)
    got = {r["vec_id"]: (r["p1"], r["p2"]) for r in pca_project(df, k=2).collect()}
    _, mu, cov = _gram(df, "embedding")
    w = np.stack([r for _, r in _power_deflate(cov, 2, 8)])
    want = (base - mu) @ w.T
    for i in range(len(base)):
        assert got[i][0] == pytest.approx(want[i, 0], abs=1e-6)
        assert got[i][1] == pytest.approx(want[i, 1], abs=1e-6)


def test_block_pairs_sound_and_exact(spark):
    from stockify_spark.llm.pca import _gram, _power_deflate, pca_block_pairs

    rng = np.random.RandomState(31)
    base = rng.randn(80, 4)
    df = _vecs_df(spark, base)
    got = {(r["id_a"], r["id_b"]): r["dist2"] for r in pca_block_pairs(df, k=2, width=1.0).collect()}
    # recompute blocking manually from the shared model
    from stockify_spark.llm.pca import _round_half_up

    _, mu, cov = _gram(df, "embedding")
    w = np.stack([r for _, r in _power_deflate(cov, 2, 8)])
    p = (base - mu) @ w.T
    p = np.vectorize(lambda v: _round_half_up(v, 6))(p)
    cells = {}
    for i in range(len(base)):
        cells.setdefault(tuple(np.floor(p[i] / 1.0)), []).append(i)
    want = {}
    for members in cells.values():
        for x in range(len(members)):
            for y in range(x + 1, len(members)):
                a, b = sorted((members[x], members[y]))
                want[(a, b)] = float(((p[a] - p[b]) ** 2).sum())
    assert set(got) == set(want)
    for k2, v in want.items():
        assert got[k2] == pytest.approx(v, abs=1e-9)


def test_block_pairs_rejects_non_power_of_two_width(spark):
    from stockify_spark.llm.pca import pca_block_pairs

    df = _vecs_df(spark, np.eye(4))
    with pytest.raises(ValueError, match="power of two"):
        pca_block_pairs(df, width=0.3)


def test_incremental_gram_matches_one_shot(spark, tmp_path):
    import os

    from stockify_spark.llm.pca import gram_update, pca_from_gram, pca_topk

    rng = np.random.RandomState(41)
    base = rng.rand(240, 6)
    df = _vecs_df(spark, base)
    table = os.path.join(str(tmp_path), "gram")
    for v, (lo, hi) in enumerate([(0, 80), (80, 150), (150, 240)]):
        gram_update(
            df.filter((df.vec_id >= lo) & (df.vec_id < hi)),
            table,
            batch_version=v,
        )
    inc = sorted(map(tuple, pca_from_gram(spark, table, k=2).collect()))
    one = sorted(map(tuple, pca_topk(df, k=2).collect()))
    assert inc == one  # Gram associativity on the ROUND(9) grid


def test_incremental_replay_is_noop(spark, tmp_path):
    import os

    from stockify_spark.llm.pca import gram_update, pca_from_gram
    from stockify_spark.sources import txlog

    rng = np.random.RandomState(43)
    df = _vecs_df(spark, rng.rand(60, 4))
    table = os.path.join(str(tmp_path), "gram")
    gram_update(df, table, batch_version=0)
    v1 = txlog.current_version(table)
    before = sorted(map(tuple, pca_from_gram(spark, table).collect()))
    gram_update(df, table, batch_version=0)  # at-least-once replay
    assert txlog.current_version(table) == v1  # no new commit
    after = sorted(map(tuple, pca_from_gram(spark, table).collect()))
    assert before == after


def test_incremental_through_streaming_foreachbatch(spark, tmp_path):
    """The real sink shape: a file stream of vector batches folded
    into the stats table by foreachBatch with batch_id as the txn
    version — the model from the drained stream equals the one-shot
    batch model."""
    import os

    from stockify_spark.llm.pca import gram_update, pca_from_gram, pca_topk

    rng = np.random.RandomState(47)
    base = rng.rand(90, 4)
    src = os.path.join(str(tmp_path), "src")
    for i, (lo, hi) in enumerate([(0, 30), (30, 60), (60, 90)]):
        _vecs_df(spark, base[lo:hi], parts=1).withColumn(
            "vec_id", F.col("vec_id") + lo
        ).write.parquet(os.path.join(src, f"b{i}"))
    table = os.path.join(str(tmp_path), "gram")
    stream = (
        spark.readStream.schema("vec_id long, embedding array<double>")
        .option("maxFilesPerTrigger", 1)
        .parquet(src + "/*")
    )
    q = stream.writeStream.foreachBatch(
        lambda batch, bid: gram_update(batch, table, batch_version=bid) and None
    ).option(
        "checkpointLocation", os.path.join(str(tmp_path), "ckpt")
    ).trigger(availableNow=True).start()
    q.awaitTermination(120)
    inc = sorted(map(tuple, pca_from_gram(spark, table).collect()))
    one = sorted(map(tuple, pca_topk(_vecs_df(spark, base), k=1).collect()))
    assert inc == one


def test_outlier_scores_flag_planted_outlier(spark):
    from stockify_spark.llm.pca import pca_outlier_scores

    rng = np.random.RandomState(53)
    base = rng.randn(200, 5) * 0.3
    base[7] = 25.0  # planted far-out vector
    got = {r["vec_id"]: r["m2"] for r in pca_outlier_scores(_vecs_df(spark, base), k=2).collect()}
    assert len(got) == 200
    assert max(got, key=got.get) == 7
    assert all(v >= 0 for v in got.values())


def test_top_correlations_finds_planted_pair(spark):
    from stockify_spark.llm.pca import top_correlations

    rng = np.random.RandomState(61)
    base = rng.randn(300, 6)
    base[:, 4] = base[:, 1] * 2.0 + rng.randn(300) * 0.01  # near-perfect pair
    rows = top_correlations(_vecs_df(spark, base), top=3).collect()
    assert (rows[0]["dim_i"], rows[0]["dim_j"]) == (2, 5)  # 1-based dims
    assert rows[0]["r"] > 0.99
    # numpy parity on the winner
    want = np.corrcoef(base[:, 1], base[:, 4])[0, 1]
    assert rows[0]["r"] == pytest.approx(want, abs=1e-4)


def test_top_correlations_zero_variance_raises(spark):
    from stockify_spark.llm.pca import top_correlations

    base = np.ones((50, 3))
    base[:, 0] = np.arange(50)
    with pytest.raises(ValueError, match="zero-variance"):
        top_correlations(_vecs_df(spark, base))


def test_compact_gram_bounds_rebuild_and_preserves_model(spark, tmp_path):
    """Fold checkpoint: after compact_gram the stats table holds ONE
    summed row (rebuild cost O(d²) regardless of batch history), the
    model is unchanged, and further incremental updates keep
    composing."""
    import os

    from stockify_spark.llm.pca import (
        compact_gram,
        gram_update,
        pca_from_gram,
        pca_topk,
    )
    from stockify_spark.sources import txlog

    rng = np.random.RandomState(53)
    base = rng.rand(200, 5)
    df = _vecs_df(spark, base)
    table = os.path.join(str(tmp_path), "gram")
    for v, (lo, hi) in enumerate([(0, 50), (50, 90), (90, 140), (140, 200)]):
        gram_update(
            df.filter((df.vec_id >= lo) & (df.vec_id < hi)),
            table,
            batch_version=v,
        )
    assert txlog.snapshot(spark, table).count() == 4
    before = sorted(map(tuple, pca_from_gram(spark, table, k=2).collect()))
    compact_gram(spark, table)
    snap = txlog.snapshot(spark, table)
    assert snap.count() == 1
    assert len(txlog.live_files(table)) == 1
    after = sorted(map(tuple, pca_from_gram(spark, table, k=2).collect()))
    assert before == after
    # second compact is a no-op commit-wise
    v_now = txlog.current_version(table)
    assert compact_gram(spark, table) == v_now
    # and the fold composes: more data still folds in correctly
    extra = rng.rand(60, 5)
    gram_update(
        _vecs_df(spark, extra).withColumn("vec_id", F.col("vec_id") + 200),
        table,
        batch_version=4,
    )
    inc = sorted(map(tuple, pca_from_gram(spark, table, k=2).collect()))
    one = sorted(
        map(tuple, pca_topk(_vecs_df(spark, np.vstack([base, extra])), k=2).collect())
    )
    assert inc == one


def test_compact_gram_exactly_once_across_fold_boundary(spark, tmp_path):
    """A replayed micro-batch (at-least-once foreachBatch window)
    must STAY a no-op after the fold rewrote the data files — the
    txn markers live in the log, which the COW commit leaves
    intact."""
    import os

    from stockify_spark.llm.pca import compact_gram, gram_update, pca_from_gram
    from stockify_spark.sources import txlog

    rng = np.random.RandomState(59)
    df = _vecs_df(spark, rng.rand(80, 4))
    table = os.path.join(str(tmp_path), "gram")
    gram_update(df.filter(df.vec_id < 40), table, batch_version=0)
    gram_update(df.filter(df.vec_id >= 40), table, batch_version=1)
    compact_gram(spark, table)
    before = sorted(map(tuple, pca_from_gram(spark, table).collect()))
    v_now = txlog.current_version(table)
    # replay BOTH pre-fold batches: no commit, no model change
    gram_update(df.filter(df.vec_id < 40), table, batch_version=0)
    gram_update(df.filter(df.vec_id >= 40), table, batch_version=1)
    assert txlog.current_version(table) == v_now
    assert sorted(map(tuple, pca_from_gram(spark, table).collect())) == before
    # ... and across a LOG checkpoint collapse too
    txlog.checkpoint_log(table)
    gram_update(df.filter(df.vec_id < 40), table, batch_version=1)
    assert txlog.current_version(table) == v_now
    assert sorted(map(tuple, pca_from_gram(spark, table).collect())) == before


def test_gram_tree_fold_parity(spark):
    """The >1024-partition intermediate-groupBy fold must produce the
    same model as the direct partial collect — force both branches
    with the gate parameter and compare the full query output."""
    from stockify_spark.llm.pca import _gram, _power_deflate

    rng = np.random.RandomState(61)
    mat = rng.rand(300, 8)
    df = _vecs_df(spark, mat, parts=8)
    n_a, mu_a, cov_a = _gram(df, "embedding", tree_fold_gate=0)  # forced tree fold
    n_b, mu_b, cov_b = _gram(df, "embedding", tree_fold_gate=10_000)  # direct
    assert n_a == n_b == 300
    assert np.allclose(mu_a, mu_b, atol=1e-12)
    assert cov_a.tolist() == cov_b.tolist()  # identical on the ROUND(9) grid
    a = _power_deflate(cov_a, 2, 8)
    b = _power_deflate(cov_b, 2, 8)
    assert [(lam, r.tolist()) for lam, r in a] == [(lam, r.tolist()) for lam, r in b]


def test_gram_tree_fold_empty_corpus_raises(spark):
    from stockify_spark.llm.pca import _gram

    df = spark.createDataFrame([], "vec_id long, embedding array<double>")
    with pytest.raises(Exception, match="empty corpus"):
        _gram(df, "embedding", tree_fold_gate=0)
