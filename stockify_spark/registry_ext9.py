"""Round-7 wave 2: technical-indicator windows (Bollinger, RSI,
autocorrelation), information-theoretic aggregates (entropy), join
diagnostics and pruning (key-skew census, explicit Bloom-filter
semi-join), time-series resampling with forward fill, windowed
streaming top-k, BFS hop distance, and the txlog VACUUM lifecycle.

Each query has an exact DuckDB oracle (driver contract,
__spark_entry__.py). Reference attribution: the reference engine
(stockify.cu) is a stock-price engine whose window family
(stockify.cu:513-634) motivates the indicator windows here; the
rest extends the warehouse/pipeline surface mandated by SURVEY §2
and §7.6.
"""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F

from stockify_spark.registry import register, _t


# ---------------------------------------------------------------------------
# window_bollinger — rolling mean ± 2σ bands (the chart overlay the
# reference's moving-average window W1 feeds; stockify.cu:513-537)
# ---------------------------------------------------------------------------

_BOLL_SQL = """
SELECT event_id, user_id,
       ROUND(AVG(value) OVER w, 6) AS mid,
       ROUND(AVG(value) OVER w + 2 * STDDEV_SAMP(value) OVER w, 6) AS upper_band,
       ROUND(AVG(value) OVER w - 2 * STDDEV_SAMP(value) OVER w, 6) AS lower_band
FROM events
WINDOW w AS (PARTITION BY user_id ORDER BY epoch_ms(ts), event_id
             ROWS BETWEEN 19 PRECEDING AND CURRENT ROW)
"""


@register("window_bollinger", _BOLL_SQL)
def window_bollinger(spark, sf_dir):
    """20-row Bollinger bands per series: rolling mean ± 2 sample
    stddevs — the canonical volatility envelope over the reference's
    moving-average window. One window pass, one shuffle on user_id;
    the variance accumulates ≤20 doubles per frame so cross-engine
    sum-order drift is ~1e-15 against a 5e-7 rounding boundary.
    First row of each series: STDDEV_SAMP of one row is NULL in both
    engines, so the bands are NULL — kept, not coalesced, because a
    chart consumer needs to know the band is undefined."""
    t = _t(spark, sf_dir, "events").select(
        "event_id", "user_id", "value", F.unix_millis("ts").alias("ms")
    )
    w = Window.partitionBy("user_id").orderBy("ms", "event_id").rowsBetween(-19, 0)
    mid = F.avg("value").over(w)
    sd = F.stddev_samp("value").over(w)
    return t.select(
        "event_id",
        "user_id",
        F.round(mid, 6).alias("mid"),
        F.round(mid + 2 * sd, 6).alias("upper_band"),
        F.round(mid - 2 * sd, 6).alias("lower_band"),
    )


# ---------------------------------------------------------------------------
# window_rsi — Cutler's RSI (SMA form; the recursive Wilder smoothing
# is deliberately avoided: an SMA is windowable in one pass on any
# engine, while Wilder's EWMA needs the sequential recurrence that
# window_ewma already covers)
# ---------------------------------------------------------------------------

_RSI_SQL = """
WITH d AS (
  SELECT event_id, user_id, epoch_ms(ts) AS ms,
         value - LAG(value) OVER (PARTITION BY user_id
                                  ORDER BY epoch_ms(ts), event_id) AS diff
  FROM events)
SELECT event_id, user_id,
       CASE WHEN AVG(GREATEST(diff, 0)) OVER w + AVG(GREATEST(-diff, 0)) OVER w = 0
            THEN NULL
            ELSE ROUND(100 * AVG(GREATEST(diff, 0)) OVER w
                 / (AVG(GREATEST(diff, 0)) OVER w + AVG(GREATEST(-diff, 0)) OVER w), 6)
       END AS rsi
FROM d
WINDOW w AS (PARTITION BY user_id ORDER BY ms, event_id
             ROWS BETWEEN 13 PRECEDING AND CURRENT ROW)
"""


@register("window_rsi", _RSI_SQL)
def window_rsi(spark, sf_dir):
    """14-row relative strength index per series, in the
    division-free-of-surprises form 100·ag/(ag+al) (algebraically
    identical to 100−100/(1+ag/al) but with a single guarded
    division — the CASE keeps ANSI sessions from a divide-by-zero
    error on an all-flat frame and pins the NULL semantics both
    engines agree on). Gains/losses derive from LAG, so the first
    row's diff is NULL and both engines' AVG ignores it. Two window
    passes over the same (user_id, time) sort order — Catalyst
    collapses them into ONE Window operator, one shuffle."""
    t = _t(spark, sf_dir, "events").select(
        "event_id", "user_id", "value", F.unix_millis("ts").alias("ms")
    )
    ow = Window.partitionBy("user_id").orderBy("ms", "event_id")
    d = t.withColumn("diff", F.col("value") - F.lag("value").over(ow))
    w = ow.rowsBetween(-13, 0)
    ag = F.avg(F.greatest(F.col("diff"), F.lit(0))).over(w)
    al = F.avg(F.greatest(-F.col("diff"), F.lit(0))).over(w)
    return d.select(
        "event_id",
        "user_id",
        F.when(ag + al == 0, F.lit(None)).otherwise(
            F.round(100 * ag / (ag + al), 6)
        ).alias("rsi"),
    )


# ---------------------------------------------------------------------------
# window_acf — lag-k autocorrelation per series (the stationarity /
# seasonality probe a forecasting pipeline runs first)
# ---------------------------------------------------------------------------

_ACF_SQL = """
WITH l AS (
  SELECT user_id, value,
         LAG(value, 1) OVER w AS l1,
         LAG(value, 2) OVER w AS l2,
         LAG(value, 3) OVER w AS l3
  FROM events
  WINDOW w AS (PARTITION BY user_id ORDER BY epoch_ms(ts), event_id)),
a AS (
  SELECT user_id, corr(value, l1) AS a1, corr(value, l2) AS a2,
         corr(value, l3) AS a3
  FROM l GROUP BY user_id)
SELECT user_id, lag, ROUND(acf, 6) AS acf
FROM (SELECT user_id, 1::BIGINT AS lag, a1 AS acf FROM a
      UNION ALL SELECT user_id, 2, a2 FROM a
      UNION ALL SELECT user_id, 3, a3 FROM a)
"""


@register("window_acf", _ACF_SQL)
def window_acf(spark, sf_dir):
    """Autocorrelation of each user's value series at lags 1–3:
    corr(value, LAG(value, k)) — the overlap-pairs ACF estimator
    (both engines' corr over the identical pair set). One window
    pass builds all three lag columns (single shuffle), one groupBy
    computes the three correlations in the same aggregate, and a
    stack unpivots to (user_id, lag, acf) rows. corr's moment sums
    add ~66 doubles per group in engine order: ~1e-15 drift vs the
    5e-7 rounding boundary."""
    t = _t(spark, sf_dir, "events").select(
        "event_id", "user_id", "value", F.unix_millis("ts").alias("ms")
    )
    ow = Window.partitionBy("user_id").orderBy("ms", "event_id")
    l = t.select(
        "user_id",
        "value",
        F.lag("value", 1).over(ow).alias("l1"),
        F.lag("value", 2).over(ow).alias("l2"),
        F.lag("value", 3).over(ow).alias("l3"),
    )
    a = l.groupBy("user_id").agg(
        F.corr("value", "l1").alias("a1"),
        F.corr("value", "l2").alias("a2"),
        F.corr("value", "l3").alias("a3"),
    )
    return a.selectExpr(
        "user_id",
        "stack(3, CAST(1 AS BIGINT), a1, CAST(2 AS BIGINT), a2, CAST(3 AS BIGINT), a3) AS (lag, acf)",
    ).select("user_id", "lag", F.round("acf", 6).alias("acf"))


# ---------------------------------------------------------------------------
# agg_entropy — Shannon entropy of each user's event-type mix (the
# behavioral-diversity / source-mix statistic corpus curation uses)
# ---------------------------------------------------------------------------

_ENTROPY_SQL = """
SELECT user_id, CAST(SUM(n) AS BIGINT) AS n_events,
       ROUND(-SUM((n / s) * ln(n / s)), 6) AS entropy
FROM (SELECT user_id, event_type, CAST(COUNT(*) AS DOUBLE) AS n,
             CAST(SUM(COUNT(*)) OVER (PARTITION BY user_id) AS DOUBLE) AS s
      FROM events GROUP BY user_id, event_type)
GROUP BY user_id
"""


@register("agg_entropy", _ENTROPY_SQL)
def agg_entropy(spark, sf_dir):
    """Shannon entropy (nats) of the per-user event-type
    distribution. The inner groupBy produces exact integer counts
    (one shuffle with map-side combine); the per-user total comes
    from a window over the tiny grouped table, not a second scan;
    the entropy sum adds ≤5 terms so ln drift is ~ulp against the
    6dp round."""
    c = (
        _t(spark, sf_dir, "events")
        .groupBy("user_id", "event_type")
        .agg(F.count(F.lit(1)).cast("double").alias("n"))
        .withColumn(
            "s", F.sum("n").over(Window.partitionBy("user_id")).cast("double")
        )
    )
    p = F.col("n") / F.col("s")
    return c.groupBy("user_id").agg(
        F.sum("n").cast("long").alias("n_events"),
        F.round(-F.sum(p * F.ln(p)), 6).alias("entropy"),
    )


# ---------------------------------------------------------------------------
# dq_key_skew — join-key skew census: the diagnostic pass that decides
# whether a join needs salting (join_salted) or AQE skew handling
# ---------------------------------------------------------------------------

_SKEW_SQL = """
WITH c AS (SELECT l_partkey, CAST(COUNT(*) AS BIGINT) AS n FROM lineitem GROUP BY 1),
s AS (SELECT CAST(SUM(n) AS DOUBLE) AS tot, AVG(CAST(n AS DOUBLE)) AS avg_n FROM c)
SELECT l_partkey, n, ROUND(n / s.tot, 6) AS share, ROUND(n / s.avg_n, 6) AS skew_x
FROM c, s ORDER BY n DESC, l_partkey LIMIT 5
"""


@register("dq_key_skew", _SKEW_SQL)
def dq_key_skew(spark, sf_dir):
    """Top-5 heaviest join keys on lineitem.l_partkey with their
    share of rows and skew multiple vs the mean key. This is the
    pre-join diagnostic that justifies salting: a key with skew_x in
    the hundreds means one reducer gets hundreds of partitions'
    worth of work. Shape: one count shuffle, a broadcast scalar for
    the denominators, and a TakeOrdered top-5 (per-partition heaps,
    never a global sort)."""
    c = (
        _t(spark, sf_dir, "lineitem")
        .groupBy("l_partkey")
        .agg(F.count(F.lit(1)).cast("long").alias("n"))
    )
    s = c.agg(
        F.sum("n").cast("double").alias("tot"),
        F.avg(F.col("n").cast("double")).alias("avg_n"),
    )
    return (
        c.crossJoin(F.broadcast(s))
        .select(
            "l_partkey",
            "n",
            F.round(F.col("n") / F.col("tot"), 6).alias("share"),
            F.round(F.col("n") / F.col("avg_n"), 6).alias("skew_x"),
        )
        .orderBy(F.col("n").desc(), "l_partkey")
        .limit(5)
    )


# ---------------------------------------------------------------------------
# join_bloom_prune — explicit Bloom-filter semi-join (operators/bloom)
# ---------------------------------------------------------------------------

_BLOOM_SQL = """
SELECT o_orderpriority, CAST(COUNT(*) AS BIGINT) AS n_orders,
       ROUND(SUM(o_totalprice), 2) AS revenue
FROM orders
WHERE o_custkey IN (SELECT c_custkey FROM customer WHERE c_mktsegment = 'BUILDING')
GROUP BY o_orderpriority
"""


@register("join_bloom_prune", _BLOOM_SQL)
def join_bloom_prune(spark, sf_dir):
    """Semi-join of orders against BUILDING-segment customers with an
    explicit Bloom filter (operators/bloom) in front of the exact
    join: the bitmap (8 KiB, m=2^16, k=3) is built distributed from
    the dim keys, collected as bounded model state, and inlined into
    the fact scan's filter — so at 100 TB the overwhelming majority
    of non-matching fact rows die map-side, BEFORE the join shuffle,
    for the cost of two integer hashes per row. False positives are
    removed by the exact semi-join that follows (the filter is an
    optimization, never a semantics change — same contract as
    Catalyst's InjectRuntimeFilter, made explicit and sizable)."""
    from stockify_spark.operators.bloom import bloom_build, bloom_might_contain

    cust = _t(spark, sf_dir, "customer").filter(
        F.col("c_mktsegment") == "BUILDING"
    )
    bitmap = bloom_build(cust, "c_custkey")
    orders = _t(spark, sf_dir, "orders").filter(
        bloom_might_contain(bitmap, "o_custkey")
    )
    return (
        orders.join(
            cust.select("c_custkey"),
            orders["o_custkey"] == F.col("c_custkey"),
            "left_semi",
        )
        .groupBy("o_orderpriority")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_orders"),
            F.round(F.sum("o_totalprice"), 2).alias("revenue"),
        )
    )


# ---------------------------------------------------------------------------
# window_resample — calendar resampling + forward fill (gap-filling)
# ---------------------------------------------------------------------------

_RESAMPLE_SQL = """
WITH bounds AS (
  SELECT user_id, date_trunc('day', MIN(ts)) AS d0, date_trunc('day', MAX(ts)) AS d1
  FROM events GROUP BY user_id),
grid AS (
  SELECT user_id, CAST(unnest(generate_series(d0, d1, INTERVAL 1 DAY)) AS DATE) AS day
  FROM bounds),
daily AS (
  SELECT user_id, day, value AS v FROM (
    SELECT user_id, CAST(date_trunc('day', ts) AS DATE) AS day, value,
           ROW_NUMBER() OVER (PARTITION BY user_id, date_trunc('day', ts)
                              ORDER BY ts DESC, event_id DESC) AS rn
    FROM events) WHERE rn = 1)
SELECT g.user_id, strftime(g.day, '%Y-%m-%d') AS day,
       ROUND(last_value(d.v IGNORE NULLS)
             OVER (PARTITION BY g.user_id ORDER BY g.day), 6) AS value_ff,
       d.v IS NULL AS filled
FROM grid g LEFT JOIN daily d ON d.user_id = g.user_id AND d.day = g.day
"""


@register("window_resample", _RESAMPLE_SQL)
def window_resample(spark, sf_dir):
    """Resample each user's event series onto a dense daily grid and
    forward-fill the last observed value — the gap-filling step every
    time-series feature pipeline runs before a fixed-frequency model.
    Shape: per-user bounds (one agg), grid via sequence+explode (no
    driver loop — the calendar is generated inside the executors),
    the per-day 'last observation' via one row_number dedup (an
    arg-max by (ts, event_id), spelled identically in both engines),
    and the fill as last(ignorenulls) over the grid — one window
    pass, one shuffle on user_id. Day is emitted as an ISO string:
    the grid is data, not a timestamp, and strings hash identically
    across engines."""
    t = _t(spark, sf_dir, "events").select(
        "event_id", "user_id", "value", "ts", F.to_date("ts").alias("day")
    )
    grid = (
        t.groupBy("user_id")
        .agg(F.min("day").alias("d0"), F.max("day").alias("d1"))
        .select(
            "user_id",
            F.explode(
                F.sequence("d0", "d1", F.expr("interval 1 day"))
            ).alias("day"),
        )
    )
    dw = Window.partitionBy("user_id", "day").orderBy(
        F.col("ts").desc(), F.col("event_id").desc()
    )
    daily = (
        t.withColumn("rn", F.row_number().over(dw))
        .filter(F.col("rn") == 1)
        .select("user_id", "day", F.col("value").alias("v"))
    )
    fw = Window.partitionBy("user_id").orderBy("day")
    return (
        grid.join(daily, ["user_id", "day"], "left")
        .select(
            "user_id",
            F.date_format("day", "yyyy-MM-dd").alias("day"),
            F.round(
                F.last("v", ignorenulls=True).over(fw), 6
            ).alias("value_ff"),
            F.col("v").isNull().alias("filled"),
        )
    )


# ---------------------------------------------------------------------------
# stream_topk_windowed — top-k event types per tumbling window
# ---------------------------------------------------------------------------

_TOPK_WIN_SQL = """
SELECT window_start, event_type, n FROM (
  SELECT date_trunc('hour', ts) AS window_start, event_type,
         CAST(COUNT(*) AS BIGINT) AS n,
         ROW_NUMBER() OVER (PARTITION BY date_trunc('hour', ts)
                            ORDER BY COUNT(*) DESC, event_type) AS rn
  FROM events GROUP BY 1, 2)
WHERE rn <= 3
"""


@register("stream_topk_windowed", _TOPK_WIN_SQL)
def stream_topk_windowed(spark, sf_dir):
    """Top-3 event types per tumbling hour (streaming/windows
    .windowed_topk). Batch face of the trending-items dashboard
    query; the streaming face runs the same windowed aggregate under
    a watermark and applies the rank in foreachBatch (append-mode
    streaming cannot emit a retractable rank — the aggregate is the
    streaming state, the rank is the per-trigger readout;
    tests/test_streaming.py drives it)."""
    from stockify_spark.streaming.windows import windowed_topk

    return windowed_topk(_t(spark, sf_dir, "events"), window="1 hour", k=3)


# ---------------------------------------------------------------------------
# graph_bfs — multi-source BFS hop distance (operators/graph.bfs_hops)
# ---------------------------------------------------------------------------

_BFS_SQL = """
WITH RECURSIVE pairs AS (SELECT DISTINCT
   LEAST(l_orderkey % 80, l_partkey % 80) AS a,
   GREATEST(l_orderkey % 80, l_partkey % 80) AS b
  FROM lineitem WHERE l_orderkey % 80 <> l_partkey % 80),
e AS (SELECT a, b FROM pairs WHERE
  CAST(CONCAT('0x', substr(md5(CAST(a AS VARCHAR) || ':' ||
   CAST(b AS VARCHAR)), 1, 4)) AS BIGINT) % 100 < 12),
sym AS (SELECT a, b FROM e UNION SELECT b, a FROM e),
walk(node, d) AS (
  SELECT * FROM (VALUES (CAST(0 AS BIGINT), 0), (CAST(1 AS BIGINT), 0))
  UNION ALL
  SELECT s.b, d + 1 FROM walk JOIN sym s ON s.a = walk.node WHERE d < 4)
SELECT node, CAST(MIN(d) AS BIGINT) AS hops FROM walk GROUP BY node
"""


@register("graph_bfs", _BFS_SQL)
def graph_bfs(spark, sf_dir):
    """Hop distance from sources {0, 1} on the symmetrized md5-thinned
    residue graph (same graph as graph_triangles), bounded at 4 hops.
    The Spark side is level-synchronous frontier BFS
    (operators/graph.bfs_hops): per round, only the NEW frontier
    joins the edge list and an anti-join drops revisits — O(sum of
    frontier degrees) total, while the oracle's recursive CTE
    enumerates every bounded walk (path-count work, fine at 80 nodes,
    impossible at a billion — the exact asymmetry that makes BFS a
    required native operator)."""
    from stockify_spark.operators.graph import bfs_hops

    li = _t(spark, sf_dir, "lineitem")
    ra = (F.col("l_orderkey") % 80).cast("long")
    rb = (F.col("l_partkey") % 80).cast("long")
    pairs = (
        li.filter(ra != rb)
        .select(F.least(ra, rb).alias("a"), F.greatest(ra, rb).alias("b"))
        .distinct()
    )
    coin = F.conv(
        F.substring(
            F.md5(
                F.concat(
                    F.col("a").cast("string"), F.lit(":"), F.col("b").cast("string")
                )
            ),
            1,
            4,
        ),
        16,
        10,
    ).cast("long")
    edges = pairs.filter(coin % 100 < 12)
    sym = edges.unionAll(
        edges.select(F.col("b").alias("a"), F.col("a").alias("b"))
    ).distinct()
    sources = spark.createDataFrame([(0,), (1,)], "node long")
    return bfs_hops(sym, sources, src="a", dst="b", max_hops=4)


# ---------------------------------------------------------------------------
# txlog_vacuum — physical file cleanup through the retention window
# ---------------------------------------------------------------------------

_VACUUM_SQL = """
SELECT o_orderkey, ROUND(o_totalprice, 2) AS o_totalprice
FROM orders WHERE o_orderkey % 10 <> 0
"""


@register("txlog_vacuum", _VACUUM_SQL)
def txlog_vacuum(spark, sf_dir):
    """VACUUM on the ACID table (sources/txlog.vacuum): create →
    COW-delete (%10 keys) → vacuum(keep_last=1). The COW delete
    leaves the pre-delete files on disk for time travel; vacuum
    physically unlinks exactly the files no retained version
    references, driver-side from the log alone. The oracle states
    the surviving snapshot declaratively — hash-matching it proves
    vacuum deleted nothing the live version needs; the physical
    deletion itself (and the broken time travel below the retention
    window) is pinned by tests/test_txlog.py."""
    from stockify_spark.registry_ext7 import _scratch_table
    from stockify_spark.sources import txlog

    def build(path: str) -> None:
        o = _t(spark, sf_dir, "orders").select("o_orderkey", "o_totalprice")
        txlog.create(o.repartitionByRange(4, "o_orderkey"), path)
        txlog.delete_where(spark, path, F.col("o_orderkey") % 10 == 0)
        txlog.vacuum(path, keep_last=1)

    path = _scratch_table(sf_dir, "vacuum", build)
    snap = txlog.snapshot(spark, path)
    return snap.select(
        "o_orderkey", F.round("o_totalprice", 2).alias("o_totalprice")
    )


# ---------------------------------------------------------------------------
# agg_gini — inequality statistic over customer spend per nation
# ---------------------------------------------------------------------------

_GINI_SQL = """
WITH s AS (
  SELECT c_nationkey, o_custkey, SUM(o_totalprice) AS x
  FROM orders JOIN customer ON o_custkey = c_custkey
  GROUP BY c_nationkey, o_custkey),
r AS (
  SELECT c_nationkey, x,
         ROW_NUMBER() OVER (PARTITION BY c_nationkey ORDER BY x, o_custkey) AS i,
         COUNT(*) OVER (PARTITION BY c_nationkey) AS n
  FROM s)
SELECT c_nationkey, CAST(MAX(n) AS BIGINT) AS n_customers,
       ROUND(2.0 * SUM(i * x) / (MAX(n) * SUM(x)) - (MAX(n) + 1.0) / MAX(n), 6)
         AS gini
FROM r GROUP BY c_nationkey
"""


@register("agg_gini", _GINI_SQL)
def agg_gini(spark, sf_dir):
    """Gini coefficient of per-customer spend within each nation —
    the concentration statistic (is revenue spread across customers
    or dominated by a few?) in its rank formulation
    G = 2·Σ(i·x₍ᵢ₎)/(n·Σx) − (n+1)/n. Rank ties (equal spend) are
    broken by custkey in both engines, and since tied values are
    EQUAL the i·x sum is invariant to which tied row gets which
    rank — the formula is tie-safe by construction. Shape: one
    join+agg shuffle for per-customer spend, one window rank within
    small nation partitions, one final agg."""
    o = _t(spark, sf_dir, "orders")
    c = _t(spark, sf_dir, "customer")
    s = (
        o.join(c, o["o_custkey"] == c["c_custkey"])
        .groupBy("c_nationkey", "o_custkey")
        .agg(F.sum("o_totalprice").alias("x"))
    )
    w = Window.partitionBy("c_nationkey").orderBy("x", "o_custkey")
    r = s.select(
        "c_nationkey",
        "x",
        F.row_number().over(w).alias("i"),
        F.count(F.lit(1)).over(Window.partitionBy("c_nationkey")).alias("n"),
    )
    n = F.max("n")
    return r.groupBy("c_nationkey").agg(
        n.cast("long").alias("n_customers"),
        F.round(
            2.0 * F.sum(F.col("i") * F.col("x")) / (n * F.sum("x"))
            - (n + 1.0) / n,
            6,
        ).alias("gini"),
    )


# ---------------------------------------------------------------------------
# sim_maxsim — multi-vector late-interaction scoring (ColBERT-style)
# ---------------------------------------------------------------------------

_DOT_SQL = (
    "list_sum(list_transform(range(1, len(qe) + 1),"
    " i -> CAST(qe[i] AS DOUBLE) * CAST(embedding[i] AS DOUBLE)))"
)
_NORM_Q = "sqrt(list_sum(list_transform(qe, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE))))"
_NORM_C = "sqrt(list_sum(list_transform(embedding, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE))))"

_MAXSIM_SQL = f"""
WITH q AS (SELECT vec_id AS qid, embedding AS qe FROM embeddings WHERE vec_id < 5),
c AS (SELECT vec_id, label, embedding FROM embeddings WHERE vec_id >= 5),
m AS (SELECT qid, label, MAX({_DOT_SQL} / ({_NORM_Q} * {_NORM_C})) AS mx
      FROM q CROSS JOIN c GROUP BY qid, label)
SELECT label, ROUND(SUM(mx), 6) AS maxsim
FROM m GROUP BY label
"""


@register("sim_maxsim", _MAXSIM_SQL)
def sim_maxsim(spark, sf_dir):
    """ColBERT-style late interaction: each label's vector set is a
    multi-vector 'document'; score = Σ over query vectors of the MAX
    cosine against the document's vectors. MAX is order-insensitive
    (no float-sum drift — the only accumulation is the per-pair dot,
    dimension-sequential in both engines); the outer Σ adds 5 terms
    under a 6dp round. Shape: the 5-vector query set broadcasts, the
    (qid, label) MAX is a partial-aggregating shuffle over corpus
    partitions — at 100 TB the corpus never moves, only k·labels
    partial maxima do."""
    from stockify_spark.llm.similarity import cosine

    emb = _t(spark, sf_dir, "embeddings")
    q = emb.filter(F.col("vec_id") < 5).select(
        F.col("vec_id").alias("qid"), F.col("embedding").alias("qe")
    )
    c = emb.filter(F.col("vec_id") >= 5).select("label", "embedding")
    m = (
        c.crossJoin(F.broadcast(q))
        .groupBy("qid", "label")
        .agg(F.max(cosine("qe", "embedding")).alias("mx"))
    )
    return m.groupBy("label").agg(F.round(F.sum("mx"), 6).alias("maxsim"))


# ---------------------------------------------------------------------------
# text_collocations — corpus-level collocation mining by PMI
# ---------------------------------------------------------------------------

_COLLOC_SQL = """
WITH tok AS (
  SELECT string_split_regex(trim(lower(text)), '\\s+') AS ts FROM documents),
uni AS (
  SELECT w, CAST(COUNT(*) AS DOUBLE) AS u
  FROM (SELECT unnest(ts) AS w FROM tok) GROUP BY w),
tot AS (SELECT SUM(u) AS t FROM uni),
bi AS (
  SELECT w1, w2, CAST(COUNT(*) AS DOUBLE) AS b
  FROM (SELECT ts[i] AS w1, ts[i+1] AS w2
        FROM (SELECT ts, unnest(range(1, len(ts))) AS i FROM tok
              WHERE len(ts) >= 2))
  GROUP BY w1, w2),
btot AS (SELECT SUM(b) AS bt FROM bi)
SELECT w1, w2, CAST(b AS BIGINT) AS n_pair,
       ROUND(ln((b / bt) / ((u1.u / t) * (u2.u / t))), 6) AS pmi
FROM bi JOIN uni u1 ON u1.w = w1 JOIN uni u2 ON u2.w = w2
CROSS JOIN tot CROSS JOIN btot
WHERE b >= 5
ORDER BY pmi DESC, w1, w2 LIMIT 50
"""


@register("text_collocations", _COLLOC_SQL)
def text_collocations(spark, sf_dir):
    """Top-50 collocations (adjacent word pairs with count ≥ 5) by
    pointwise mutual information — the phrase-mining statistic
    (Church & Hanks) a tokenizer-vocabulary or keyphrase pipeline
    computes corpus-wide. Shape: one exploded token scan feeds both
    the unigram and bigram counts (compact (words, count) shuffles
    with map-side combine), the two scalar totals broadcast, and the
    top-50 is a TakeOrdered — no global sort. PMI's ln is a per-row
    op on exact-count ratios: ~ulp drift against the 6dp round."""
    d = _t(spark, sf_dir, "documents").select(
        F.split(
            F.regexp_replace(F.trim(F.lower(F.col("text"))), r"\s+", " "), " "
        ).alias("ts")
    )
    toks = d.select(F.explode("ts").alias("w"))
    uni = toks.groupBy("w").agg(F.count(F.lit(1)).cast("double").alias("u"))
    bi = (
        d.filter(F.size("ts") >= 2)
        .select(
            F.explode(
                F.zip_with(
                    F.slice(F.col("ts"), 1, F.size("ts") - 1),
                    F.slice(F.col("ts"), 2, F.size("ts") - 1),
                    lambda a, b: F.struct(a.alias("w1"), b.alias("w2")),
                )
            ).alias("g")
        )
        .select("g.w1", "g.w2")
        .groupBy("w1", "w2")
        .agg(F.count(F.lit(1)).cast("double").alias("b"))
    )
    t = uni.agg(F.sum("u").alias("t"))
    bt = bi.agg(F.sum("b").alias("bt"))
    u1 = uni.select(F.col("w").alias("w1"), F.col("u").alias("u1"))
    u2 = uni.select(F.col("w").alias("w2"), F.col("u").alias("u2"))
    return (
        bi.filter(F.col("b") >= 5)
        .join(u1, "w1")
        .join(u2, "w2")
        .crossJoin(F.broadcast(t))
        .crossJoin(F.broadcast(bt))
        .select(
            "w1",
            "w2",
            F.col("b").cast("long").alias("n_pair"),
            F.round(
                F.ln(
                    (F.col("b") / F.col("bt"))
                    / ((F.col("u1") / F.col("t")) * (F.col("u2") / F.col("t")))
                ),
                6,
            ).alias("pmi"),
        )
        .orderBy(F.col("pmi").desc(), "w1", "w2")
        .limit(50)
    )
