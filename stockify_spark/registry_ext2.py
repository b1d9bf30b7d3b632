"""Second extension wave: subqueries (decorrelated the way Catalyst
does it — joins, not per-row probes), TPC-H query shapes, range/rank
window frames, regexp functions, multiset set ops, sliding/session
event-time windows with exact SQL oracles, and the probabilistic /
multimodal operators (rows-only checks, recall proven in tests).

Same determinism conventions as registry.py."""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F

from stockify_spark.operators.aggregates import group_agg
from stockify_spark.operators.joins import dim_join, fact_join, semi_join
from stockify_spark.registry import register, _t
from stockify_spark.streaming.windows import session_agg, sliding_counts


# ---------------------------------------------------------------------------
# Subqueries (SURVEY §2.6 — absent from the reference). Each is the
# decorrelated plan Catalyst itself would produce: scalar subquery →
# broadcast of a 1-row aggregate; IN → left-semi join; correlated
# aggregate → groupBy + equi-join. At 100 TB that means zero per-row
# subquery execution and one bounded broadcast.
# ---------------------------------------------------------------------------

@register(
    "subquery_scalar",
    "SELECT p_partkey, p_retailprice FROM part"
    " WHERE p_retailprice > (SELECT AVG(p_retailprice) FROM part)",
)
def subquery_scalar(spark, sf_dir):
    part = _t(spark, sf_dir, "part")
    threshold = part.agg(F.avg("p_retailprice").alias("_avg_price"))
    return (
        part.crossJoin(F.broadcast(threshold))
        .filter(F.col("p_retailprice") > F.col("_avg_price"))
        .select("p_partkey", "p_retailprice")
    )


@register(
    "subquery_in",
    "SELECT o_orderkey, o_custkey, o_totalprice FROM orders"
    " WHERE o_custkey IN (SELECT c_custkey FROM customer WHERE c_mktsegment = 'BUILDING')",
)
def subquery_in(spark, sf_dir):
    orders = _t(spark, sf_dir, "orders")
    building = (
        _t(spark, sf_dir, "customer")
        .filter(F.col("c_mktsegment") == "BUILDING")
        .select("c_custkey")
    )
    return semi_join(orders, F.broadcast(building), orders["o_custkey"] == F.col("c_custkey")).select(
        "o_orderkey", "o_custkey", "o_totalprice"
    )


@register(
    "subquery_correlated",
    "SELECT l1.l_orderkey, l1.l_partkey, l1.l_quantity FROM lineitem l1"
    " WHERE l1.l_quantity < (SELECT 0.2 * AVG(l2.l_quantity) FROM lineitem l2"
    " WHERE l2.l_partkey = l1.l_partkey)",
)
def subquery_correlated(spark, sf_dir):
    """TPC-H Q17 shape. Decorrelated: one pass computes per-part avg
    (partial/final agg), joined back on the part key — the correlated
    probe becomes a single shuffle keyed on l_partkey."""
    li = _t(spark, sf_dir, "lineitem")
    per_part = li.groupBy(F.col("l_partkey").alias("_pk")).agg(
        (F.lit(0.2) * F.avg("l_quantity")).alias("_qty_threshold")
    )
    return (
        fact_join(li, per_part, li["l_partkey"] == F.col("_pk"))
        .filter(F.col("l_quantity") < F.col("_qty_threshold"))
        .select("l_orderkey", "l_partkey", "l_quantity")
    )


# ---------------------------------------------------------------------------
# TPC-H query shapes (multi-operator pipelines on the star schema).
# ---------------------------------------------------------------------------

@register(
    "tpch_q6",
    "SELECT ROUND(SUM(l_extendedprice * l_discount), 2) AS revenue FROM lineitem"
    " WHERE l_shipdate >= TIMESTAMP '1996-01-01' AND l_shipdate < TIMESTAMP '1997-01-01'"
    " AND l_discount BETWEEN 0.03 AND 0.07 AND l_quantity < 24",
)
def tpch_q6(spark, sf_dir):
    """TPC-H Q6: every predicate is scan-pushable (timestamp range +
    two numeric ranges), so the 100 TB plan is a row-group-pruned scan
    feeding one partial/final agg — no shuffle of data rows at all."""
    li = _t(spark, sf_dir, "lineitem")
    return (
        li.filter(
            (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
            & (F.col("l_shipdate") < F.lit("1997-01-01").cast("timestamp"))
            & (F.col("l_discount").between(0.03, 0.07))
            & (F.col("l_quantity") < 24)
        )
        .agg(F.round(F.sum(F.col("l_extendedprice") * F.col("l_discount")), 2).alias("revenue"))
    )


@register(
    "tpch_q3",
    "SELECT l_orderkey, ROUND(SUM(l_extendedprice * (1 - l_discount)), 2) AS revenue,"
    " o_orderdate, o_orderpriority FROM customer"
    " JOIN orders ON c_custkey = o_custkey JOIN lineitem ON l_orderkey = o_orderkey"
    " WHERE c_mktsegment = 'BUILDING' AND o_orderdate < TIMESTAMP '1997-03-15'"
    " AND l_shipdate > TIMESTAMP '1997-03-15'"
    " GROUP BY l_orderkey, o_orderdate, o_orderpriority"
    " ORDER BY revenue DESC, l_orderkey LIMIT 10",
)
def tpch_q3(spark, sf_dir):
    """TPC-H Q3: filtered dims broadcast, one fact shuffle on the
    order key, grouped agg, then TakeOrderedAndProject for the top-10
    (per-partition heaps — never a global sort)."""
    cust = _t(spark, sf_dir, "customer").filter(F.col("c_mktsegment") == "BUILDING")
    orders = _t(spark, sf_dir, "orders").filter(
        F.col("o_orderdate") < F.lit("1997-03-15").cast("timestamp")
    )
    li = _t(spark, sf_dir, "lineitem").filter(
        F.col("l_shipdate") > F.lit("1997-03-15").cast("timestamp")
    )
    # orders ⋈ broadcast(filtered customers) is dim-shaped; the fact
    # join shuffles lineitem once on l_orderkey.
    joined = fact_join(
        li,
        dim_join(orders, cust, orders["o_custkey"] == cust["c_custkey"]),
        li["l_orderkey"] == F.col("o_orderkey"),
    )
    agg = group_agg(
        joined,
        ["l_orderkey", "o_orderdate", "o_orderpriority"],
        F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2).alias("revenue"),
    )
    return agg.select("l_orderkey", "revenue", "o_orderdate", "o_orderpriority").orderBy(
        F.col("revenue").desc(), F.col("l_orderkey")
    ).limit(10)


# ---------------------------------------------------------------------------
# Window frames beyond ROWS (SURVEY §2.4 note: absent in reference,
# free in Spark).
# ---------------------------------------------------------------------------

@register(
    "window_range_frame",
    "SELECT event_id, user_id, ROUND(SUM(value) OVER (PARTITION BY user_id"
    " ORDER BY epoch_ms(ts) RANGE BETWEEN 3600000 PRECEDING AND CURRENT ROW), 6)"
    " AS hour_sum FROM events",
)
def window_range_frame(spark, sf_dir):
    """RANGE frame over event-time: all events of the trailing hour,
    however many rows that is (vs the ROWS frames of W1-W3). Ordering
    key is integer epoch-millis so both engines compare exactly."""
    df = _t(spark, sf_dir, "events").select(
        "event_id", "user_id", "value", F.unix_millis("ts").alias("_ms")
    )
    w = (
        Window.partitionBy("user_id")
        .orderBy("_ms")
        .rangeBetween(-3_600_000, Window.currentRow)
    )
    return df.select(
        "event_id", "user_id", F.round(F.sum("value").over(w), 6).alias("hour_sum")
    )


@register(
    "window_partitioned_parity",
    # The ORACLE is the plain global-order window — proving the
    # bucketed Spark plan reproduces single-partition results exactly.
    "SELECT event_id, ROUND(AVG(value) OVER w, 6) AS moving_avg,"
    " MIN(value) OVER w AS rolling_min, MAX(value) OVER w AS rolling_max"
    " FROM events"
    " WINDOW w AS (ORDER BY event_id ROWS BETWEEN CURRENT ROW AND 9 FOLLOWING)",
)
def window_partitioned_parity(spark, sf_dir):
    """W1–W3 computed scale-safely: range-buckets of the dense order
    key with boundary-row exchange (operators.windows.
    bucketed_forward_window) instead of one global partition. The
    oracle runs the global-order SQL — identical output is the parity
    proof; the plan shows WindowExec partitioned by bucket
    (tests/test_plans.py pins >1-partition execution)."""
    from stockify_spark.operators.windows import bucketed_forward_window

    df = _t(spark, sf_dir, "events").select("event_id", "value")
    out = bucketed_forward_window(
        df,
        "event_id",
        {
            "moving_avg": F.avg("value"),
            "rolling_min": F.min("value"),
            "rolling_max": F.max("value"),
        },
        window_size=10,
        bucket_size=1024,
    )
    return out.select(
        "event_id",
        F.round("moving_avg", 6).alias("moving_avg"),
        "rolling_min",
        "rolling_max",
    )


@register(
    "window_ntile",
    "SELECT o_orderkey, CAST(NTILE(4) OVER w AS BIGINT) AS quartile,"
    " ROUND(PERCENT_RANK() OVER w, 6) AS pct_rank,"
    " ROUND(CUME_DIST() OVER w, 6) AS cume FROM orders"
    " WINDOW w AS (ORDER BY o_totalprice, o_orderkey)",
)
def window_ntile(spark, sf_dir):
    """Distribution functions. Global ORDER BY window — single
    partition by construction; at scale use the partitioned variants
    (window_rank) or approx percentiles (agg_percentile)."""
    w = Window.orderBy("o_totalprice", "o_orderkey")
    return _t(spark, sf_dir, "orders").select(
        "o_orderkey",
        F.ntile(4).over(w).cast("long").alias("quartile"),
        F.round(F.percent_rank().over(w), 6).alias("pct_rank"),
        F.round(F.cume_dist().over(w), 6).alias("cume"),
    )


@register(
    "window_first_last",
    "SELECT event_id, user_id,"
    " first_value(value) OVER w AS first_val,"
    " last_value(value) OVER w AS last_val,"
    " nth_value(value, 2) OVER w AS second_val FROM events"
    " WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id"
    " ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)",
)
def window_first_last(spark, sf_dir):
    df = _t(spark, sf_dir, "events")
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    )
    return df.select(
        "event_id",
        "user_id",
        F.first("value").over(w).alias("first_val"),
        F.last("value").over(w).alias("last_val"),
        F.nth_value("value", 2).over(w).alias("second_val"),
    )


# ---------------------------------------------------------------------------
# Regexp scalar functions (§7.6.4 continued).
# ---------------------------------------------------------------------------

@register(
    "fn_regexp",
    "SELECT p_partkey, regexp_extract(p_name, '([a-z]+)', 1) AS first_word,"
    " regexp_replace(p_name, '[aeiou]', '_', 'g') AS devoweled,"
    " CAST(len(regexp_extract_all(p_name, '[a-z]+')) AS BIGINT) AS n_words,"
    " starts_with(p_name, 'small') AS is_small FROM part",
)
def fn_regexp(spark, sf_dir):
    df = _t(spark, sf_dir, "part")
    return df.select(
        "p_partkey",
        F.regexp_extract("p_name", "([a-z]+)", 1).alias("first_word"),
        F.regexp_replace("p_name", "[aeiou]", "_").alias("devoweled"),
        F.expr("size(regexp_extract_all(p_name, '[a-z]+', 0))").cast("long").alias("n_words"),
        F.col("p_name").startswith("small").alias("is_small"),
    )


# ---------------------------------------------------------------------------
# Multiset set operations (§7.6.3 continued: bag semantics).
# ---------------------------------------------------------------------------

@register(
    "setop_intersect_all",
    "SELECT l_partkey FROM lineitem WHERE l_returnflag = 'R'"
    " INTERSECT ALL SELECT l_partkey FROM lineitem WHERE l_quantity >= 45",
)
def setop_intersect_all(spark, sf_dir):
    li = _t(spark, sf_dir, "lineitem")
    a = li.filter(F.col("l_returnflag") == "R").select("l_partkey")
    b = li.filter(F.col("l_quantity") >= 45).select("l_partkey")
    return a.intersectAll(b)


@register(
    "setop_except_all",
    "SELECT l_partkey FROM lineitem WHERE l_returnflag = 'R'"
    " EXCEPT ALL SELECT l_partkey FROM lineitem WHERE l_quantity >= 45",
)
def setop_except_all(spark, sf_dir):
    li = _t(spark, sf_dir, "lineitem")
    a = li.filter(F.col("l_returnflag") == "R").select("l_partkey")
    b = li.filter(F.col("l_quantity") >= 45).select("l_partkey")
    return a.exceptAll(b)


@register(
    "setop_union_by_name",
    "SELECT c_custkey AS entity_key, c_acctbal AS balance FROM customer"
    " UNION ALL SELECT s_suppkey, s_acctbal FROM supplier",
)
def setop_union_by_name(spark, sf_dir):
    """unionByName: schema aligned by column NAME (the two inputs
    project in different physical orders)."""
    cust = _t(spark, sf_dir, "customer").select(
        F.col("c_custkey").alias("entity_key"), F.col("c_acctbal").alias("balance")
    )
    supp = _t(spark, sf_dir, "supplier").select(
        F.col("s_acctbal").alias("balance"), F.col("s_suppkey").alias("entity_key")
    )
    return cust.unionByName(supp)


# ---------------------------------------------------------------------------
# Event-time windows, sliding + session (§7.6.5 continued). The same
# functions run under readStream in tests/test_streaming.py; batch
# oracles below are the exact SQL semantics.
# ---------------------------------------------------------------------------

@register(
    "stream_sliding_counts",
    # A 1h window sliding every 30min: each event belongs to exactly
    # two windows, whose starts are its 30-min bucket and the one
    # before (both engines align buckets to the epoch-origin grid).
    "SELECT window_start, event_type, COUNT(*) AS n FROM ("
    " SELECT unnest([time_bucket(INTERVAL '30 minutes', ts),"
    " time_bucket(INTERVAL '30 minutes', ts) - INTERVAL '30 minutes']) AS window_start,"
    " event_type FROM events) GROUP BY window_start, event_type",
)
def stream_sliding_counts(spark, sf_dir):
    out = sliding_counts(_t(spark, sf_dir, "events"), window="1 hour", slide="30 minutes")
    return out.select("window_start", "event_type", "n")


@register(
    "stream_session_agg",
    # Gaps-and-islands: a new session starts when the previous event
    # of the user is >= 5 minutes older (merge iff gap < 5min, which
    # is F.session_window's semantics); session end = last ts + gap.
    "WITH marked AS (SELECT user_id, ts, value, CASE WHEN"
    " ts - LAG(ts) OVER (PARTITION BY user_id ORDER BY ts) >= INTERVAL '5 minutes'"
    " OR LAG(ts) OVER (PARTITION BY user_id ORDER BY ts) IS NULL THEN 1 ELSE 0 END AS is_new"
    " FROM events), numbered AS (SELECT *, SUM(is_new) OVER (PARTITION BY user_id"
    " ORDER BY ts ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS sess FROM marked)"
    " SELECT MIN(ts) AS session_start, MAX(ts) + INTERVAL '5 minutes' AS session_end,"
    " user_id, COUNT(*) AS n_events, ROUND(SUM(value), 6) AS sum_value"
    " FROM numbered GROUP BY user_id, sess",
)
def stream_session_agg(spark, sf_dir):
    return session_agg(_t(spark, sf_dir, "events"), gap="5 minutes")


@register(
    "stream_dedup_keys",
    "SELECT DISTINCT user_id, event_type FROM events",
)
def stream_dedup_keys(spark, sf_dir):
    """Key-level exact dedup — the batch face of
    dropDuplicatesWithinWatermark (streaming path exercised in
    tests/test_streaming.py; whole-row dedup is nondeterministic in
    which row survives, so the oracle compares the key set)."""
    from stockify_spark.streaming.windows import dedup_within_watermark

    ev = _t(spark, sf_dir, "events").select("user_id", "event_type")
    return dedup_within_watermark(ev, ["user_id", "event_type"])


# ---------------------------------------------------------------------------
# Text: BPE-ish regex token counting (training-data pipeline).
# ---------------------------------------------------------------------------

_BPE_RE = " ?[A-Za-z]+| ?[0-9]+| ?[^A-Za-z0-9 ]+"


@register(
    "text_bpe_tokens",
    f"SELECT doc_id, CAST(len(regexp_extract_all(text, '{_BPE_RE}')) AS BIGINT)"
    " AS n_bpe_tokens FROM documents",
)
def text_bpe_tokens(spark, sf_dir):
    """GPT-2-style pre-tokenizer count: runs of letters / digits /
    punctuation, each optionally absorbing one leading space — the
    standard proxy for LLM token budgeting, as a pure codegen'd
    column expression (no Python in the loop)."""
    df = _t(spark, sf_dir, "documents")
    return df.select(
        "doc_id",
        F.expr(f"size(regexp_extract_all(text, '{_BPE_RE}', 0))").cast("long").alias("n_bpe_tokens"),
    )


# ---------------------------------------------------------------------------
# SQL entry point (SURVEY §3.4 B): the same engine surface through
# spark.sql over registered views — including GROUPING SETS, which
# the DataFrame API doesn't expose directly.
# ---------------------------------------------------------------------------

_GROUPING_SETS_SQL = (
    "SELECT l_returnflag, l_linestatus, COUNT(*) AS n,"
    " ROUND(SUM(l_quantity), 2) AS sum_qty FROM {table}"
    " GROUP BY GROUPING SETS ((l_returnflag), (l_linestatus), ())"
)


@register("groupby_grouping_sets", _GROUPING_SETS_SQL.format(table="lineitem"))
def groupby_grouping_sets(spark, sf_dir):
    _t(spark, sf_dir, "lineitem").createOrReplaceTempView("_gs_lineitem")
    return spark.sql(_GROUPING_SETS_SQL.format(table="_gs_lineitem"))


# ---------------------------------------------------------------------------
# ANN scale path + multimodal plumbing (rows-only driver checks;
# recall/shape proven in tests/test_similarity.py, test_multimodal.py).
# ---------------------------------------------------------------------------

@register(
    "sim_ivf_topk",
    # Deterministic sampled-seed IVF (the sim_embedding_dup recipe):
    # centroids are the first 16 vectors by id, corpus rows land in
    # their single best cell, queries probe their 4 best cells, and
    # candidates are exactly rescored — the WHOLE approximate spec is
    # ANSI SQL, so the oracle hash-checks the bucketed ANN semantics
    # themselves, not just row counts. (The fitted-k-means ivf_topk
    # stays the library path; its recall is pinned in tests.)
    "WITH c AS (SELECT vec_id AS cid, embedding AS cvec FROM embeddings WHERE vec_id < 16),"
    " s AS (SELECT vec_id, embedding, cid,"
    " ROW_NUMBER() OVER (PARTITION BY vec_id"
    " ORDER BY list_cosine_similarity(embedding, cvec) DESC, cid) AS rnk"
    " FROM embeddings CROSS JOIN c),"
    " corpus AS (SELECT vec_id AS neighbor_id, embedding AS ne, cid FROM s WHERE rnk = 1),"
    " q AS (SELECT vec_id AS query_id, embedding AS qe, cid FROM s"
    " WHERE vec_id < 5 AND rnk <= 4)"
    " SELECT query_id, neighbor_id, rank FROM ("
    " SELECT query_id, neighbor_id, ROW_NUMBER() OVER (PARTITION BY query_id"
    " ORDER BY list_cosine_similarity(qe, ne) DESC, neighbor_id) AS rank"
    " FROM q JOIN corpus USING (cid) WHERE query_id <> neighbor_id) WHERE rank <= 5",
)
def sim_ivf_topk(spark, sf_dir):
    """IVF ANN, deterministic data-seeded spec: probe 4 of 16 cells
    per query instead of the full corpus — candidate generation is an
    ids-only cell equi-join, rescoring is Arrow-batched numpy with
    the oracle's exact float association (llm/similarity.py
    seeded_ivf_topk). No per-query model fit: the centroid 'model' is
    16 corpus rows, collected once."""
    from stockify_spark.llm.similarity import seeded_ivf_topk

    emb = _t(spark, sf_dir, "embeddings")
    return seeded_ivf_topk(
        emb, emb.filter(F.col("vec_id") < 5), k=5, n_centroids=16, n_probe=4
    )


@register(
    "media_features",
    # The synthetic_media fixture is deterministic (id 0..95, kind
    # cycles image/audio/video), so the full expected row set is pure
    # SQL: the oracle checks the mapInPandas plumbing emits exactly
    # one feature row per media row with ids and kinds intact.
    "SELECT r AS media_id,"
    " CASE CAST(r % 3 AS INT) WHEN 0 THEN 'image' WHEN 1 THEN 'audio'"
    " ELSE 'video' END AS kind"
    " FROM range(96) t(r)",
)
def media_features(spark, sf_dir):
    """Multimodal decode+featurize plumbing over mapInPandas (decode
    stubbed — no codecs in this container; Arrow batch shape is
    real)."""
    from stockify_spark.llm.multimodal import extract_features, synthetic_media

    return extract_features(synthetic_media(spark, n=96)).select("media_id", "kind")


@register(
    "media_frame_plan",
    # Exact row-set oracle: video rows are id ≡ 2 (mod 3) with
    # duration_ms = 1000 + id, and the sample grid is every 250 ms.
    # Spark's sequence(0, duration-1, 250) is inclusive-end; DuckDB's
    # range(0, duration, 250) is exclusive-end — identical grids.
    "SELECT media_id, unnest(range(0, 1000 + media_id, 250)) AS frame_ts_ms"
    " FROM (SELECT 3 * r + 2 AS media_id FROM range(32) t(r))",
)
def media_frame_plan(spark, sf_dir):
    from stockify_spark.llm.multimodal import frame_sample_plan, synthetic_media

    return frame_sample_plan(synthetic_media(spark, n=96), every_ms=250)


@register(
    "media_decode_real",
    # Tolerance-of-truth oracle (the agg_approx_distinct pattern):
    # Spark decodes every payload for REAL and compares the features
    # against the pattern-derived expectations (computed pre-encode,
    # codecs not involved — multimodal.expected_media_features), so
    # the booleans assert the encode→decode round trip: exact for
    # the lossless containers, within a measured 0.02 (tol 0.05) for
    # the lossy baseline JPEG. The oracle states every row must pass.
    "SELECT r AS media_id,"
    " CASE CAST(r % 3 AS INT) WHEN 0 THEN 'image' WHEN 1 THEN 'audio'"
    " ELSE 'video' END AS kind,"
    " TRUE AS f0_ok, TRUE AS f3_ok"
    " FROM range(96) t(r)",
)
def media_decode_real(spark, sf_dir):
    """REAL decode path (no stub) for ALL THREE modalities: PNG and
    baseline JPEG (llm/png.py, llm/jpeg.py), PCM WAV (llm/wav.py),
    and Y4M video (llm/y4m.py) decode inside mapInPandas; features
    derive from actual pixels/samples/frames and are driver-checked
    against the pre-encode pattern spec (exact for lossless formats,
    |err| < 0.05 for JPEG whose measured max is 0.0184). Unsupported
    compressed containers would raise explicitly — filter-BEFORE-
    decode keeps undecodable payloads from ever deserializing."""
    from stockify_spark.llm.multimodal import (
        expected_media_features,
        extract_features,
        synthetic_media,
    )

    media = synthetic_media(spark, n=96)
    feats = extract_features(media, decode_stub=False)
    exp = spark.createDataFrame(
        expected_media_features(96), "media_id long, e0 double, e3 double"
    )
    is_jpeg = (F.col("media_id") % 3 == 0) & (F.floor(F.col("media_id") / 3) % 2 == 1)
    tol = F.when(is_jpeg, F.lit(0.05)).otherwise(F.lit(1e-9))
    return feats.join(F.broadcast(exp), "media_id").select(
        "media_id",
        "kind",
        (F.abs(F.element_at("feature", 1).cast("double") - F.col("e0")) <= tol).alias("f0_ok"),
        (F.abs(F.element_at("feature", 4).cast("double") - F.col("e3")) <= tol).alias("f3_ok"),
    )


def _video_pattern_constants(n: int = 96, seed: int = 42) -> str:
    """VALUES rows (media_id, ofs, speed, duration_ms, n_frames) for
    the synthetic video clips — the blake2b pattern offset is the only
    non-SQL ingredient of the fixture, so it is embedded as a literal
    and everything downstream of it stays declarative SQL."""
    import hashlib

    rows = []
    for i in range(2, n, 3):
        ofs = int.from_bytes(
            hashlib.blake2b(f"{seed}:{i}".encode(), digest_size=4).digest(), "big"
        )
        dur = 1000 + i
        rows.append(f"({i}, {ofs}, {1 + i % 5}, {dur}, {max(int(round(dur * 10 / 1000)), 1)})")
    return ", ".join(rows)


@register(
    "media_sample_frames",
    # Closed-form oracle for the REAL video decode: each synthetic
    # frame is the pattern (x*4 + y + ofs + t*speed*8) % 256, Y4M
    # stores luma losslessly, and the mean of 3072 uint8 pixels is an
    # exact integer sum < 2^53 followed by one IEEE division — so the
    # oracle recomputes every sampled frame's mean luma from the
    # pattern spec (codec not involved) and the decoded values must
    # match BIT-EXACTLY. frame_index = ts*10//1000 == ts//100 at
    # fps=10/1, clamped to the last frame. Durations CAN land on a
    # *.5 frame count (media_id 50: 1050 ms -> 10.5 frames at fps 10);
    # both _video_pattern_constants and _pattern_video compute
    # n_frames with Python's round() (banker's), so encoder and
    # oracle stay in lockstep — never switch one side alone to
    # plain/floor rounding.
    "WITH v(media_id, ofs, speed, duration_ms, n_frames) AS"
    " (VALUES " + _video_pattern_constants() + "),"
    " ts AS (SELECT media_id, ofs, speed, n_frames,"
    "  unnest(range(0, duration_ms, 250)) AS frame_ts_ms FROM v),"
    " fi AS (SELECT media_id, ofs, speed, frame_ts_ms,"
    "  least(frame_ts_ms // 100, n_frames - 1) AS frame_index FROM ts),"
    " px AS (SELECT x.r AS x, y.r AS y FROM range(64) x(r), range(48) y(r))"
    " SELECT media_id, frame_ts_ms, frame_index,"
    "  CAST(SUM((x * 4 + y + ofs + frame_index * speed * 8) % 256) AS DOUBLE)"
    "   / 3072.0 AS mean_luma"
    " FROM fi, px GROUP BY media_id, frame_ts_ms, frame_index",
)
def media_sample_frames(spark, sf_dir):
    """Frame sampling with REAL decode: explode timestamps BEFORE
    decode, then each row decodes only its own frame — Y4M frames sit
    at fixed offsets, so this is pointer arithmetic, not a clip scan
    (llm/multimodal.sample_frames). The oracle recomputes each mean
    luma from the synthetic pattern's closed form, so the driver
    hash-checks the whole decode path end to end (mean emitted raw:
    integer-sum/3072 is bit-identical on both engines)."""
    from stockify_spark.llm.multimodal import sample_frames, synthetic_media

    out = sample_frames(synthetic_media(spark, n=96), every_ms=250)
    return out.select("media_id", "frame_ts_ms", "frame_index", "mean_luma")


@register(
    "stream_stateful_totals",
    "SELECT user_id, COUNT(*) AS n_events, ROUND(SUM(value), 6) AS sum_value"
    " FROM events GROUP BY user_id",
)
def stream_stateful_totals(spark, sf_dir):
    """Batch face of the applyInPandasWithState running-totals
    operator (streaming/stateful.py); the streaming path converges to
    exactly this result (tests/test_streaming.py)."""
    from stockify_spark.streaming.stateful import running_user_totals

    return running_user_totals(_t(spark, sf_dir, "events"))
