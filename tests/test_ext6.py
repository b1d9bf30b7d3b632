"""Round-6 wave: chunking, BPE learning, fuzzy R-S join, heavy hitters."""

from __future__ import annotations

from pyspark.sql import functions as F

from stockify_spark.registry import QUERIES

SF = "/root/testdata/sf0.001"


def test_chunk_stride_covers_every_token(spark):
    docs = QUERIES["doc_chunk_stride"](spark, SF)
    # invariant: sum of (n_tokens - overlap) + overlap of first chunk
    # reconstructs the doc token count: chunks start at 0, 48, 96...
    # so token i lives in chunk floor(i/48) (and possibly the one
    # before); the LAST chunk must end exactly at n.
    from stockify_spark.sources.io import load_table

    n_by_doc = (
        load_table(spark, SF, "documents")
        .select("doc_id", F.size(F.split("text", " ")).alias("n"))
    )
    last = docs.groupBy("doc_id").agg(
        F.max("chunk_id").alias("last_i"),
        F.max(F.col("chunk_id") * 48 + F.col("n_tokens")).alias("covered"),
    )
    bad = last.join(n_by_doc, "doc_id").filter(F.col("covered") != F.col("n"))
    assert bad.count() == 0


def test_chunk_sizes_are_clamped_windows(spark):
    from stockify_spark.sources.io import load_table

    docs = QUERIES["doc_chunk_stride"](spark, SF)
    n_by_doc = (
        load_table(spark, SF, "documents")
        .select("doc_id", F.size(F.split("text", " ")).alias("n"))
    )
    # every chunk is exactly the window clamped to the document end:
    # n_tokens == min(64, n - 48*chunk_id), and positive
    j = docs.join(n_by_doc, "doc_id")
    expect = F.least(F.lit(64), F.col("n") - 48 * F.col("chunk_id"))
    assert j.filter(F.col("n_tokens") != expect).count() == 0
    assert j.filter(F.col("n_tokens") <= 0).count() == 0


def test_bpe_merges_deterministic_and_ordered(spark):
    a = QUERIES["tokenizer_bpe_merges"](spark, SF).collect()
    b = QUERIES["tokenizer_bpe_merges"](spark, SF).collect()
    assert a == b
    assert [r.step for r in sorted(a, key=lambda r: r.step)] == [1, 2, 3, 4]
    # merge counts never increase: each merge consumes the most
    # frequent pair, and later pair counts can only be bounded by it
    counts = [r.pair_cnt for r in sorted(a, key=lambda r: r.step)]
    assert counts == sorted(counts, reverse=True)


def test_fuzzy_join_matches_bruteforce(spark):
    """Prefix-filtered R-S join recall is exactly 1.0 vs brute force."""
    from stockify_spark.llm.dedup import fuzzy_set_join
    from stockify_spark.sources.io import load_table

    names = (
        load_table(spark, SF, "part")
        .select("p_name")
        .distinct()
        .withColumn("toks", F.array_distinct(F.split("p_name", " ")))
        .withColumn("_even", F.substring(F.md5("p_name"), 1, 1).isin(*"02468ace"))
    )
    left = names.filter(F.col("_even"))
    right = names.filter(~F.col("_even"))
    fast = {
        (r.id_a, r.id_b)
        for r in fuzzy_set_join(left, right, "p_name", "toks", 0.3).collect()
    }
    inter = F.size(F.array_intersect("a.toks", "b.toks")).cast("double")
    union = (F.size("a.toks") + F.size("b.toks")).cast("double") - inter
    brute = {
        (r.id_a, r.id_b)
        for r in left.alias("a")
        .crossJoin(right.alias("b"))
        .filter(inter / union >= 0.3)
        .select(F.col("a.p_name").alias("id_a"), F.col("b.p_name").alias("id_b"))
        .collect()
    }
    assert fast == brute and len(fast) > 0


def test_heavy_hitters_candidates_are_superset(spark):
    """The MG candidate pass may over-generate but must never miss a
    true heavy hitter — repartition to force many partitions and
    compare against the exact groupBy answer."""
    from stockify_spark.operators.aggregates import exact_heavy_hitters
    from stockify_spark.sources.io import load_table

    tokens = (
        load_table(spark, SF, "documents")
        .select(F.explode(F.split(F.lower("text"), " ")).alias("tok"))
        .repartition(16)
    )
    got = {
        (r.word, r.cnt) for r in exact_heavy_hitters(tokens, "tok", 0.02).collect()
    }
    total = tokens.count()
    want = {
        (r.tok, r.cnt)
        for r in tokens.groupBy("tok")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .filter(F.col("cnt") >= 0.02 * total)
        .collect()
    }
    assert got == want and len(want) > 0


def test_kmeans_converges_and_is_deterministic(spark):
    from stockify_spark.llm.clustering import kmeans_assign
    from stockify_spark.sources.io import load_table

    emb = load_table(spark, SF, "embeddings")
    a = sorted((r.vec_id, r.cluster) for r in kmeans_assign(emb, 8, 2).collect())
    b = sorted((r.vec_id, r.cluster) for r in kmeans_assign(emb, 8, 2).collect())
    assert a == b
    clusters = {c for _, c in a}
    assert clusters <= set(range(8)) and len(clusters) > 1
    # every vector is assigned exactly once
    assert len(a) == emb.count()


def test_kmeans_iteration_reduces_inertia(spark):
    """Lloyd's step never increases total within-cluster distance."""
    from pyspark.sql import functions as F2

    from stockify_spark.llm.clustering import _assign, kmeans_assign  # noqa: F401
    from stockify_spark.sources.io import load_table

    emb = load_table(spark, SF, "embeddings")
    e = emb.select(
        "vec_id", F2.transform("embedding", lambda x: x.cast("double")).alias("v")
    )

    def inertia(assign_df, cents):
        lut = {c: v for c, v in cents}
        import math

        rows = assign_df.join(e, "vec_id").collect()
        tot = 0.0
        for r in rows:
            c = lut[r.cluster]
            tot += math.sqrt(sum((a - b) ** 2 for a, b in zip(r.v, c)))
        return tot

    seeds = sorted(
        (int(r.vec_id), list(r.v)) for r in e.filter(F2.col("vec_id") < 8).collect()
    )
    a0 = _assign(e, seeds)
    i0 = inertia(a0, seeds)
    # one mean update then re-assign: inertia must not increase
    means = (
        a0.join(e, "vec_id")
        .select("cluster", F2.posexplode("v").alias("pos", "val"))
        .groupBy("cluster", "pos")
        .agg(F2.round(F2.avg("val"), 6).alias("m"))
        .collect()
    )
    byc = {}
    for r in means:
        byc.setdefault(int(r.cluster), {})[int(r.pos)] = float(r.m)
    c1 = [(c, [d[p] for p in range(len(d))]) for c, d in sorted(byc.items())]
    i1 = inertia(_assign(e, c1), c1)
    assert i1 <= i0 + 1e-6


def test_linreg_matches_numpy(spark):
    import numpy as np

    from stockify_spark.registry import QUERIES
    from stockify_spark.sources.io import load_table

    got = {r.l_returnflag: r for r in QUERIES["ml_linreg_group"](spark, SF).collect()}
    li = load_table(spark, SF, "lineitem").select(
        "l_returnflag", "l_quantity", "l_extendedprice"
    ).toPandas()
    for flag, g in li.groupby("l_returnflag"):
        slope, intercept = np.polyfit(g.l_quantity, g.l_extendedprice, 1)
        assert abs(got[flag].slope - slope) < 1e-4
        assert abs(got[flag].intercept - intercept) < 1e-2


def test_exact_kth_smallest_various_k(spark):
    from stockify_spark.operators.sorts import exact_kth_smallest
    from stockify_spark.sources.io import load_table

    li = load_table(spark, SF, "lineitem")
    vals = sorted(r.l_extendedprice for r in li.select("l_extendedprice").collect())
    n = len(vals)
    for k in (1, 2, n // 3, (n + 1) // 2, n - 1, n):
        row = exact_kth_smallest(li, "l_extendedprice", k=k).collect()[0]
        assert row.kth_value == vals[k - 1], k
        assert row.n == n and row.k == k


def test_q2_rows_are_true_min_cost(spark):
    """Every Q2 output row's supplier is genuinely the cheapest
    EUROPE supplier for its part (semantic check independent of the
    oracle's SQL formulation)."""
    from stockify_spark.registry import QUERIES
    from stockify_spark.sources.fixtures import derive_partsupp
    from stockify_spark.sources.io import load_table

    rows = QUERIES["tpch_q2"](spark, SF).collect()
    assert rows
    ps = derive_partsupp(spark, SF)
    sup = load_table(spark, SF, "supplier")
    nat = load_table(spark, SF, "nation")
    reg = load_table(spark, SF, "region").filter(F.col("r_name") == "EUROPE")
    eu = (
        ps.join(sup, ps.ps_suppkey == sup.s_suppkey)
        .join(nat, F.col("s_nationkey") == nat.n_nationkey)
        .join(reg, F.col("n_regionkey") == reg.r_regionkey)
        .select("ps_partkey", "ps_supplycost", "s_name")
        .collect()
    )
    best = {}
    for r in eu:
        best.setdefault(r.ps_partkey, []).append((r.ps_supplycost, r.s_name))
    for r in rows:
        min_cost = min(c for c, _ in best[r.p_partkey])
        winners = {n for c, n in best[r.p_partkey] if c == min_cost}
        assert r.s_name in winners


def test_derived_partsupp_is_deterministic_and_dense(spark):
    from pyspark.sql import functions as F2

    from stockify_spark.sources.fixtures import derive_partsupp
    from stockify_spark.sources.io import load_table

    a = derive_partsupp(spark, SF)
    b = derive_partsupp(spark, SF)
    assert sorted(map(tuple, a.collect())) == sorted(map(tuple, b.collect()))
    # every lineitem (partkey, suppkey) pair has a catalog row
    li = load_table(spark, SF, "lineitem").select(
        F2.col("l_partkey").alias("ps_partkey"),
        F2.col("l_suppkey").alias("ps_suppkey"),
    )
    assert li.join(a, ["ps_partkey", "ps_suppkey"], "left_anti").count() == 0
    # attributes in range
    assert a.filter((F2.col("ps_availqty") < 1) | (F2.col("ps_availqty") > 9999)).count() == 0
    assert a.filter(F2.col("ps_supplycost") < 1.0).count() == 0


def test_weighted_sample_favors_heavy_rows(spark):
    """A-Res with weight = o_totalprice must over-represent expensive
    orders: the sample's mean price exceeds the population mean."""
    from stockify_spark.registry import QUERIES
    from stockify_spark.sources.io import load_table

    sample = QUERIES["sample_weighted"](spark, SF)
    s_mean = sample.agg(F.avg("o_totalprice")).collect()[0][0]
    p_mean = (
        load_table(spark, SF, "orders").agg(F.avg("o_totalprice")).collect()[0][0]
    )
    assert s_mean > p_mean
    assert sample.count() == 32
