"""Fifth extension wave (round 6, continued): classic analytics the
reference's users reach for next — gaps-and-islands sessionization,
EWMA / drawdown time-series windows (the stock-analytics natives),
fixed-width histograms, deterministic mode, unpivot/melt, Pareto
skyline — plus degree-oriented triangle enumeration
(operators/graph.triangles), corpus normalization dedup, and
re-aggregatable HLL sketch union.

Same determinism conventions as registry.py. Two specific to this
file: EWMA uses alpha = 0.5 so every weight is an exact power of two
(weight·x is a pure exponent shift — no rounding — and the explicit
left-associated sum is bit-identical across engines), and every
ranking ties on a unique id column.
"""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F

from stockify_spark.registry import register, _t


# ---------------------------------------------------------------------------
# Gaps-and-islands sessionization (the batch twin of
# stream_session_agg): a new session starts when a user's gap from
# their previous event exceeds 30 minutes; sessions are numbered per
# user in time order and aggregated.
# ---------------------------------------------------------------------------

@register(
    "events_sessionize",
    "WITH t AS (SELECT user_id, event_id, value, epoch_ms(ts) AS ms"
    "  FROM events),"
    " flagged AS (SELECT *, CASE WHEN ms - lag(ms) OVER w > 1800000"
    "   OR lag(ms) OVER w IS NULL THEN 1 ELSE 0 END AS is_new"
    "  FROM t WINDOW w AS (PARTITION BY user_id ORDER BY ms, event_id)),"
    " sess AS (SELECT *, SUM(is_new) OVER"
    "   (PARTITION BY user_id ORDER BY ms, event_id"
    "    ROWS UNBOUNDED PRECEDING) AS session_seq FROM flagged)"
    " SELECT user_id, CAST(session_seq AS BIGINT) AS session_seq,"
    " CAST(COUNT(*) AS BIGINT) AS n_events,"
    " MIN(ms) AS first_ms, MAX(ms) AS last_ms,"
    " ROUND(SUM(value), 2) AS total_value"
    " FROM sess GROUP BY user_id, session_seq",
)
def events_sessionize(spark, sf_dir):
    """Gaps-and-islands sessionization: lag → new-session flag →
    running sum of flags = session id → per-session aggregate. One
    shuffle on user_id serves both window passes AND the final
    group-by (session_seq is a refinement of the user partition —
    Catalyst reuses the partitioning), so the whole operator is a
    single exchange of (user, event) rows. At 100 TB user_id is a
    high-cardinality key, so tasks parallelize; a pathological
    single-user skew is AQE's skew-split case."""
    t = _t(spark, sf_dir, "events").select(
        "user_id", "event_id", "value", F.unix_millis("ts").alias("ms")
    )
    w = Window.partitionBy("user_id").orderBy("ms", "event_id")
    flagged = t.withColumn(
        "is_new",
        F.when(
            (F.col("ms") - F.lag("ms").over(w) > 1800000)
            | F.lag("ms").over(w).isNull(),
            1,
        ).otherwise(0),
    )
    sess = flagged.withColumn(
        "session_seq",
        F.sum("is_new").over(w.rowsBetween(Window.unboundedPreceding, 0)),
    )
    return sess.groupBy("user_id", "session_seq").agg(
        F.count(F.lit(1)).alias("n_events"),
        F.min("ms").alias("first_ms"),
        F.max("ms").alias("last_ms"),
        F.round(F.sum("value"), 2).alias("total_value"),
    )


# ---------------------------------------------------------------------------
# EWMA — exponentially weighted moving average, the stock-chart
# smoother. alpha = 0.5 makes every weight 2^-(k+1): weight·x is an
# exact exponent shift, so the explicit 8-term left-associated sum is
# bit-identical across engines (no ROUND-policy dependence); the
# denominator renormalizes over the lags that actually exist at the
# start of each series.
# ---------------------------------------------------------------------------

_EWMA_K = 8


def _ewma_sql() -> str:
    num = " + ".join(
        f"COALESCE(lag(value, {k}) OVER w, 0) * {2.0 ** -(k + 1)!r}"
        for k in range(_EWMA_K)
    )
    den = " + ".join(
        f"CASE WHEN lag(value, {k}) OVER w IS NULL THEN 0 ELSE {2.0 ** -(k + 1)!r} END"
        for k in range(_EWMA_K)
    )
    return (
        "SELECT event_id, user_id, value,"
        f" ROUND(({num}) / ({den}), 6) AS ewma"
        " FROM events"
        " WINDOW w AS (PARTITION BY user_id ORDER BY epoch_ms(ts), event_id)"
    )


@register("window_ewma", _ewma_sql())
def window_ewma(spark, sf_dir):
    """EWMA over each user's event series as a fixed composition of
    lag() terms — a bounded-frame window, per-partition state O(K).
    The recursive form y_t = αx_t + (1-α)y_{t-1} is inherently
    sequential; the K-term truncation (weight tail < 0.4% at K=8,
    α=0.5) is the standard scale-out rewrite — every row computes
    independently inside one window pass, one shuffle on user_id."""
    t = _t(spark, sf_dir, "events").select(
        "event_id", "user_id", "value", F.unix_millis("ts").alias("ms")
    )
    w = Window.partitionBy("user_id").orderBy("ms", "event_id")
    num = F.lit(0.0)
    den = F.lit(0.0)
    for k in range(_EWMA_K):
        lagk = F.lag("value", k).over(w)
        wt = 2.0 ** -(k + 1)
        num = num + F.coalesce(lagk, F.lit(0.0)) * F.lit(wt)
        den = den + F.when(lagk.isNull(), 0.0).otherwise(wt)
    return t.select(
        "event_id", "user_id", "value", F.round(num / den, 6).alias("ewma")
    )


# ---------------------------------------------------------------------------
# Drawdown — running peak and distance-from-peak per series, the
# other stock-analytics native. Running MAX involves no float
# addition, and peak/value arithmetic is per-row IEEE — everything
# except the final display rounding is exact.
# ---------------------------------------------------------------------------

@register(
    "window_drawdown",
    "SELECT event_id, user_id, value,"
    " MAX(value) OVER w AS peak,"
    " ROUND(MAX(value) OVER w - value, 6) AS drawdown,"
    " ROUND((MAX(value) OVER w - value) / MAX(value) OVER w, 6) AS drawdown_pct"
    " FROM events"
    " WINDOW w AS (PARTITION BY user_id ORDER BY epoch_ms(ts), event_id"
    "  ROWS UNBOUNDED PRECEDING)",
)
def window_drawdown(spark, sf_dir):
    """Running peak + drawdown over each user's value series: an
    unbounded-preceding MAX frame (O(1) running state per partition,
    one shuffle on user_id) and two per-row arithmetic columns.
    events.value > 0 by construction (TESTDATA.md), so the pct
    denominator needs no guard."""
    t = _t(spark, sf_dir, "events").select(
        "event_id", "user_id", "value", F.unix_millis("ts").alias("ms")
    )
    w = (
        Window.partitionBy("user_id")
        .orderBy("ms", "event_id")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    peak = F.max("value").over(w)
    return t.select(
        "event_id",
        "user_id",
        "value",
        peak.alias("peak"),
        F.round(peak - F.col("value"), 6).alias("drawdown"),
        F.round((peak - F.col("value")) / peak, 6).alias("drawdown_pct"),
    )


# ---------------------------------------------------------------------------
# Fixed-width histogram — the width_bucket aggregation every
# profiler/BI layer needs. Bucket ids are exact integer arithmetic.
# ---------------------------------------------------------------------------

@register(
    "agg_histogram",
    "SELECT CAST(FLOOR(o_totalprice / 25000.0) AS BIGINT) AS bucket,"
    " CAST(COUNT(*) AS BIGINT) AS n,"
    " ROUND(SUM(o_totalprice), 2) AS total,"
    " MIN(o_totalprice) AS lo, MAX(o_totalprice) AS hi"
    " FROM orders GROUP BY 1",
)
def agg_histogram(spark, sf_dir):
    """20-bucket fixed-width histogram of order totals: one map-side
    bucket-id expression, one group-by with map-side combine — the
    shuffle moves |buckets| partial rows per task, scale-free. (A
    data-adaptive variant is agg_percentile_approx's quantile sketch;
    this is the exact fixed-bounds profile.)"""
    t = _t(spark, sf_dir, "orders")
    return (
        t.withColumn(
            "bucket", F.floor(F.col("o_totalprice") / 25000.0).cast("long")
        )
        .groupBy("bucket")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.round(F.sum("o_totalprice"), 2).alias("total"),
            F.min("o_totalprice").alias("lo"),
            F.max("o_totalprice").alias("hi"),
        )
    )


# ---------------------------------------------------------------------------
# Deterministic mode — most frequent value per group with a total
# tie order (count DESC, value ASC), the portable definition of the
# MODE() aggregate.
# ---------------------------------------------------------------------------

@register(
    "agg_mode",
    "WITH c AS (SELECT c_mktsegment, c_nationkey, COUNT(*) AS cnt"
    "  FROM customer GROUP BY 1, 2),"
    " r AS (SELECT *, ROW_NUMBER() OVER (PARTITION BY c_mktsegment"
    "   ORDER BY cnt DESC, c_nationkey ASC) AS rk FROM c)"
    " SELECT c_mktsegment, CAST(c_nationkey AS INT) AS mode_nation,"
    " CAST(cnt AS BIGINT) AS cnt FROM r WHERE rk = 1",
)
def agg_mode(spark, sf_dir):
    """Per-segment modal nation: count pairs (map-side combine),
    then a rank-1 window over the compact (segment, nation, count)
    table. Built-in MODE() is non-deterministic on ties in both
    engines; the explicit (cnt DESC, value ASC) order is the
    differential-testable definition. Two shuffles, both over
    |segments|×|nations| rows — group-bounded, scale-free."""
    c = (
        _t(spark, sf_dir, "customer")
        .groupBy("c_mktsegment", "c_nationkey")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )
    w = Window.partitionBy("c_mktsegment").orderBy(
        F.col("cnt").desc(), F.col("c_nationkey").asc()
    )
    return (
        c.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") == 1)
        .select(
            "c_mktsegment",
            F.col("c_nationkey").cast("int").alias("mode_nation"),
            F.col("cnt").cast("long").alias("cnt"),
        )
    )


# ---------------------------------------------------------------------------
# Unpivot / melt — wide-to-long reshape via stack(), the inverse of
# groupby_pivot. Counts stay BIGINT-exact.
# ---------------------------------------------------------------------------

@register(
    "groupby_unpivot",
    "WITH wide AS (SELECT n_nationkey,"
    "  (SELECT COUNT(*) FROM customer WHERE c_nationkey = n_nationkey)"
    "   AS customers,"
    "  (SELECT COUNT(*) FROM supplier WHERE s_nationkey = n_nationkey)"
    "   AS suppliers FROM nation)"
    " SELECT CAST(n_nationkey AS INT) AS nation, metric,"
    "  CAST(val AS BIGINT) AS val FROM ("
    "  SELECT n_nationkey, 'customers' AS metric, customers AS val FROM wide"
    "  UNION ALL"
    "  SELECT n_nationkey, 'suppliers' AS metric, suppliers AS val FROM wide)",
)
def groupby_unpivot(spark, sf_dir):
    """Melt a wide per-nation count table to (nation, metric, val)
    rows with stack() — the inverse reshape of groupby_pivot. The
    wide table is built by aggregating each fact side to |nations|
    rows FIRST and broadcast-joining onto the nation spine, so the
    unpivot itself is a zero-shuffle per-row expansion."""
    nation = _t(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("nation")
    )
    cust = (
        _t(spark, sf_dir, "customer")
        .groupBy(F.col("c_nationkey").alias("nation"))
        .agg(F.count(F.lit(1)).alias("customers"))
    )
    supp = (
        _t(spark, sf_dir, "supplier")
        .groupBy(F.col("s_nationkey").alias("nation"))
        .agg(F.count(F.lit(1)).alias("suppliers"))
    )
    wide = (
        nation.join(F.broadcast(cust), "nation", "left")
        .join(F.broadcast(supp), "nation", "left")
        .select(
            "nation",
            F.coalesce("customers", F.lit(0)).alias("customers"),
            F.coalesce("suppliers", F.lit(0)).alias("suppliers"),
        )
    )
    return wide.select(
        F.col("nation").cast("int").alias("nation"),
        F.expr(
            "stack(2, 'customers', customers, 'suppliers', suppliers)"
            " AS (metric, val)"
        ),
    ).select("nation", "metric", F.col("val").cast("long").alias("val"))


# ---------------------------------------------------------------------------
# Pareto skyline — the undominated (price DESC, quantity ASC)
# frontier, computed as a running-min scan over per-price minima.
# No float arithmetic at all: comparisons only.
# ---------------------------------------------------------------------------

@register(
    "analytics_skyline",
    "WITH pp AS (SELECT l_extendedprice AS price, MIN(l_quantity) AS qty"
    "  FROM lineitem GROUP BY 1),"
    " r AS (SELECT price, qty, MIN(qty) OVER"
    "   (ORDER BY price DESC"
    "    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS best_above"
    "  FROM pp)"
    " SELECT price, qty FROM r"
    " WHERE best_above IS NULL OR qty < best_above",
)
def analytics_skyline(spark, sf_dir):
    """2-D Pareto skyline (maximize price, minimize quantity): a
    point survives iff its quantity beats the running minimum over
    all strictly-higher prices. Group-by price collapses duplicates
    (and resolves equal-price domination exactly), then ONE ordered
    window pass replaces the quadratic dominance join — the classic
    sort-filter skyline. The global ORDER BY is a range-partitioned
    sort at scale; the running min is O(1) state. Comparisons only —
    no float arithmetic to drift."""
    pp = (
        _t(spark, sf_dir, "lineitem")
        .groupBy(F.col("l_extendedprice").alias("price"))
        .agg(F.min("l_quantity").alias("qty"))
    )
    # one exclusive-frame window (min over strictly-preceding rows)
    # instead of the nested running-min + lag pair — same semantics
    # on unique prices, one ordered pass fewer
    w = Window.orderBy(F.col("price").desc()).rowsBetween(
        Window.unboundedPreceding, -1
    )
    r = pp.withColumn("best_above", F.min("qty").over(w))
    return r.filter(
        F.col("best_above").isNull() | (F.col("qty") < F.col("best_above"))
    ).select("price", "qty")


# ---------------------------------------------------------------------------
# Triangle enumeration (operators/graph.triangles). The graph is
# data-derived but engine-portable: nodes are key residues, and the
# edge set is thinned by an md5 coin so the graph is sparse
# (≈12% of pairs) — dense graphs make triangle counting trivially
# cubic-complete and hide the orientation algorithm's point.
# ---------------------------------------------------------------------------

@register(
    "graph_triangles",
    "WITH pairs AS (SELECT DISTINCT"
    "   LEAST(l_orderkey % 80, l_partkey % 80) AS a,"
    "   GREATEST(l_orderkey % 80, l_partkey % 80) AS b"
    "  FROM lineitem WHERE l_orderkey % 80 <> l_partkey % 80),"
    " e AS (SELECT a, b FROM pairs WHERE"
    "  CAST(CONCAT('0x', substr(md5(CAST(a AS VARCHAR) || ':' ||"
    "   CAST(b AS VARCHAR)), 1, 4)) AS BIGINT) % 100 < 12)"
    " SELECT e1.a AS x1, e1.b AS x2, e2.b AS x3"
    " FROM e e1 JOIN e e2 ON e2.a = e1.b"
    " JOIN e e3 ON e3.a = e1.a AND e3.b = e2.b",
)
def graph_triangles(spark, sf_dir):
    """Triangle enumeration on an md5-thinned residue graph via
    degree orientation (operators/graph.triangles — O(m^1.5) wedge
    bound vs the oracle's naive a<b<c triple join). Output is one
    id-sorted (x1, x2, x3) row per triangle, exactly once."""
    from stockify_spark.operators.graph import triangles

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
                    F.col("a").cast("string"),
                    F.lit(":"),
                    F.col("b").cast("string"),
                )
            ),
            1,
            4,
        ),
        16,
        10,
    ).cast("long")
    edges = pairs.filter(coin % 100 < 12)
    return triangles(edges, "a", "b")


# ---------------------------------------------------------------------------
# Normalization dedup — canonicalize text (case-fold, punctuation →
# space, whitespace collapse) and group by the canonical form's
# md5. The normalization pipeline is the operator under test;
# dedup_exact covers the raw-bytes variant.
# ---------------------------------------------------------------------------

@register(
    "text_normalize",
    "SELECT md5(trim(regexp_replace(lower(text), '[^a-z0-9]+', ' ', 'g')))"
    "  AS norm_key,"
    " CAST(COUNT(*) AS BIGINT) AS n_docs,"
    " MIN(doc_id) AS keep_doc_id,"
    " CAST(MIN(length(trim(regexp_replace(lower(text), '[^a-z0-9]+', ' ', 'g'))))"
    "  AS BIGINT) AS norm_len"
    " FROM documents GROUP BY 1",
)
def text_normalize(spark, sf_dir):
    """Canonicalization dedup: lower → non-alnum runs to one space →
    trim → md5 group key, keeping the lowest doc_id as survivor.
    Pure column expressions ahead of one 16-byte-key shuffle; at
    100 TB the map side reduces each document to (hash, id, len)
    before the exchange — same shape as dedup_exact with the
    normalization pass fused into the scan."""
    t = _t(spark, sf_dir, "documents")
    norm = F.trim(
        F.regexp_replace(F.lower(F.col("text")), "[^a-z0-9]+", " ")
    )
    return (
        t.select("doc_id", F.md5(norm).alias("norm_key"), F.length(norm).alias("_len"))
        .groupBy("norm_key")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.min("doc_id").alias("keep_doc_id"),
            F.min("_len").cast("long").alias("norm_len"),
        )
    )


# ---------------------------------------------------------------------------
# Re-aggregatable HLL sketches: per-group sketches unioned to a
# global estimate — the sketch-cube pattern (build once at fine
# grain, roll up without rescanning). Tolerance-of-truth oracle, the
# agg_approx_distinct convention: estimates are engine-specific, so
# each engine asserts its own estimate against the exact answer.
# ---------------------------------------------------------------------------

@register(
    "agg_sketch_union",
    "SELECT CAST(COUNT(DISTINCT o_custkey) AS BIGINT) AS n_exact,"
    " CAST(COUNT(DISTINCT o_orderpriority) AS BIGINT) AS n_groups,"
    " TRUE AS union_estimate_ok FROM orders",
)
def agg_sketch_union(spark, sf_dir):
    """Datasketches HLL cube: one sketch per order priority
    (hll_sketch_agg — map-side mergeable state), then hll_union_agg
    rolls the five group sketches into the global estimate WITHOUT
    rescanning orders — the pre-aggregated-cube pattern that makes
    distinct-count dashboards O(groups) instead of O(rows) per
    query. The oracle is tolerance-of-truth (agg_approx_distinct
    convention): the unioned estimate must land within 10% of the
    exact global cardinality, asserted engine-side."""
    orders = _t(spark, sf_dir, "orders")
    per_group = orders.groupBy("o_orderpriority").agg(
        F.hll_sketch_agg("o_custkey").alias("sk")
    )
    unioned = per_group.agg(
        F.hll_sketch_estimate(F.hll_union_agg("sk")).alias("est"),
        F.count(F.lit(1)).alias("n_groups"),
    )
    exact = orders.agg(
        F.countDistinct("o_custkey").alias("n_exact")
    )
    return exact.crossJoin(F.broadcast(unioned)).select(
        F.col("n_exact").cast("long").alias("n_exact"),
        F.col("n_groups").cast("long").alias("n_groups"),
        (
            F.abs(F.col("est") - F.col("n_exact")) <= 0.1 * F.col("n_exact")
        ).alias("union_estimate_ok"),
    )


# ---------------------------------------------------------------------------
# Line-level boilerplate dedup (the C4/RefinedWeb cleaning pass):
# lines repeated across many documents are boilerplate (headers,
# nav, disclaimers); drop any line occurring in >= K distinct docs
# and reassemble each document from its surviving lines in order.
# ---------------------------------------------------------------------------

@register(
    "pipeline_line_dedup",
    "WITH lines AS (SELECT doc_id, i AS line_no, ln FROM ("
    "  SELECT doc_id, unnest(string_split(text, '. ')) AS ln,"
    "   unnest(range(1, len(string_split(text, '. ')) + 1)) AS i"
    "  FROM documents)),"
    " freq AS (SELECT ln, COUNT(DISTINCT doc_id) AS n_docs FROM lines"
    "  GROUP BY ln),"
    " kept AS (SELECT l.doc_id, l.line_no, l.ln FROM lines l"
    "  JOIN freq f ON f.ln = l.ln WHERE f.n_docs < 3)"
    " SELECT doc_id,"
    " CAST(COUNT(*) AS BIGINT) AS n_kept,"
    " CAST(length(string_agg(ln, '. ' ORDER BY line_no)) AS BIGINT)"
    "  AS clean_len,"
    " md5(string_agg(ln, '. ' ORDER BY line_no)) AS clean_hash"
    " FROM kept GROUP BY doc_id",
)
def pipeline_line_dedup(spark, sf_dir):
    """Boilerplate-line removal: explode documents to (doc, line_no,
    line), count DISTINCT docs per line, keep lines seen in < 3
    docs, and reassemble each doc in original line order (emitted as
    length + md5 so the output stays scalar). Scale shape: the line
    table shuffles once for the frequency count (map-side combine on
    the line text collapses within-partition repeats) and once for
    the per-doc reassembly; the frequency side joins back by line
    text — at 100 TB hash the line to a 16-byte key first. This is
    the sentence-level sibling of dedup_exact and the standard
    pre-training cleaning pass between document dedup and quality
    filtering."""
    docs = _t(spark, sf_dir, "documents")
    lines = docs.select(
        "doc_id",
        F.posexplode(F.split(F.col("text"), r"\. ")).alias("_i", "ln"),
    ).select("doc_id", (F.col("_i") + 1).alias("line_no"), "ln")
    freq = lines.groupBy("ln").agg(
        F.countDistinct("doc_id").alias("n_docs")
    )
    kept = lines.join(freq.filter(F.col("n_docs") < 3), "ln")
    reassembled = kept.groupBy("doc_id").agg(
        F.count(F.lit(1)).alias("n_kept"),
        F.array_join(
            F.transform(
                F.array_sort(
                    F.collect_list(F.struct("line_no", "ln"))
                ),
                lambda s: s["ln"],
            ),
            ". ",
        ).alias("_clean"),
    )
    return reassembled.select(
        "doc_id",
        "n_kept",
        F.length("_clean").cast("long").alias("clean_len"),
        F.md5("_clean").alias("clean_hash"),
    )


# ---------------------------------------------------------------------------
# Training-mix statistics per source — the table a data-mixing
# config is written from (docs, chars, token estimate, quality
# proxies per source, plus each source's share of the corpus).
# ---------------------------------------------------------------------------

@register(
    "pipeline_source_mix",
    "WITH s AS (SELECT source, lang,"
    "  CAST(COUNT(*) AS BIGINT) AS n_docs,"
    "  CAST(SUM(n_chars) AS BIGINT) AS total_chars,"
    "  CAST(SUM(len(list_filter(string_split_regex(lower(text),"
    "   '[^a-z0-9]+'), t -> t <> ''))) AS BIGINT) AS total_tokens"
    "  FROM documents GROUP BY source, lang)"
    " SELECT source, lang, n_docs, total_chars, total_tokens,"
    " ROUND(CAST(total_tokens AS DOUBLE)"
    "  / SUM(total_tokens) OVER (), 6) AS token_share"
    " FROM s",
)
def pipeline_source_mix(spark, sf_dir):
    """Per-(source, lang) corpus composition: docs, chars, tokens,
    and each cell's token share of the whole corpus — the input to
    any data-mixing/reweighting decision. One group-by with map-side
    combine over the scan (token counting fused as a column
    expression), then a window over the |sources|×|langs| result for
    the shares: the second pass is group-bounded, scale-free."""
    docs = _t(spark, sf_dir, "documents")
    tok_count = F.size(
        F.filter(
            F.split(F.lower(F.col("text")), "[^a-z0-9]+"),
            lambda t: t != "",
        )
    )
    s = docs.groupBy("source", "lang").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("n_chars").alias("total_chars"),
        F.sum(tok_count).cast("long").alias("total_tokens"),
    )
    return s.select(
        "source",
        "lang",
        "n_docs",
        "total_chars",
        "total_tokens",
        F.round(
            F.col("total_tokens").cast("double")
            / F.sum("total_tokens").over(Window.partitionBy()),
            6,
        ).alias("token_share"),
    )


# ---------------------------------------------------------------------------
# Deterministic split assignment — hash-based train/val/test
# bucketing that is stable under recomputation, reshuffling, and
# incremental corpus growth (the property random() splits lack).
# ---------------------------------------------------------------------------

@register(
    "pipeline_split_assign",
    "WITH assigned AS (SELECT source, doc_id,"
    "  CAST(CONCAT('0x', substr(md5('split:' || CAST(doc_id AS VARCHAR)),"
    "   1, 8)) AS BIGINT) % 100 AS bucket FROM documents)"
    " SELECT source,"
    " CASE WHEN bucket < 90 THEN 'train'"
    "  WHEN bucket < 95 THEN 'val' ELSE 'test' END AS split,"
    " CAST(COUNT(*) AS BIGINT) AS n_docs,"
    " MIN(doc_id) AS min_doc, MAX(doc_id) AS max_doc"
    " FROM assigned GROUP BY 1, 2",
)
def pipeline_split_assign(spark, sf_dir):
    """90/5/5 train/val/test assignment from an md5 coin on the
    document id: deterministic (re-runs agree), engine-portable (the
    oracle reproduces every assignment bit-for-bit), and stable as
    the corpus grows (new docs hash independently — no global sort
    or count that reshuffles old assignments, which is why the
    100 TB pipeline wants hash splits, not row_number() % N). Pure
    map-side expression ahead of one group-bounded aggregate."""
    docs = _t(spark, sf_dir, "documents")
    bucket = (
        F.conv(
            F.substring(
                F.md5(F.concat(F.lit("split:"), F.col("doc_id").cast("string"))),
                1,
                8,
            ),
            16,
            10,
        ).cast("long")
        % 100
    )
    return (
        docs.select(
            "source",
            "doc_id",
            F.when(bucket < 90, "train")
            .when(bucket < 95, "val")
            .otherwise("test")
            .alias("split"),
        )
        .groupBy("source", "split")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.min("doc_id").alias("min_doc"),
            F.max("doc_id").alias("max_doc"),
        )
    )


# ---------------------------------------------------------------------------
# Rank-distribution window functions — percent_rank / cume_dist,
# the remaining members of the ranking family (window_rank covers
# rank/dense_rank, window_ntile the quantile buckets). Both are
# rational functions of integer ranks — exact in both engines.
# ---------------------------------------------------------------------------

@register(
    "window_dist_stats",
    "SELECT l_orderkey, l_linenumber, l_returnflag, l_quantity,"
    " percent_rank() OVER w AS pct_rank,"
    " cume_dist() OVER w AS cume"
    " FROM lineitem"
    " WINDOW w AS (PARTITION BY l_returnflag ORDER BY l_quantity)",
)
def window_dist_stats(spark, sf_dir):
    """percent_rank + cume_dist per return-flag partition: one
    shuffle on the partition key, ordered scan per partition. Ties
    in l_quantity resolve by rank definition (not row order), so the
    outputs are deterministic without a tiebreaker column — exact
    integer-ratio doubles, no rounding needed."""
    t = _t(spark, sf_dir, "lineitem")
    w = Window.partitionBy("l_returnflag").orderBy("l_quantity")
    return t.select(
        "l_orderkey",
        "l_linenumber",
        "l_returnflag",
        "l_quantity",
        F.percent_rank().over(w).alias("pct_rank"),
        F.cume_dist().over(w).alias("cume"),
    )


# ---------------------------------------------------------------------------
# SCD2 dimension merge (operators/merge.merge_scd2): the warehouse
# pattern for versioned dimensions. The update set is derived
# deterministically from the data (every 10th-residue-0/1/2
# customer gets a +100 balance adjustment effective 1995-06-01).
# ---------------------------------------------------------------------------

@register(
    "merge_scd2_customers",
    "WITH dim AS (SELECT c_custkey, c_mktsegment, c_acctbal,"
    "  '1990-01-01' AS valid_from, CAST(NULL AS VARCHAR) AS valid_to"
    "  FROM customer),"
    " upd AS (SELECT c_custkey, c_mktsegment, c_acctbal + 100.0 AS c_acctbal,"
    "  '1995-06-01' AS effective_from FROM customer WHERE c_custkey % 10 < 3)"
    " SELECT c_custkey, c_mktsegment, c_acctbal, valid_from, valid_to,"
    "  valid_to IS NULL AS is_current FROM ("
    "  SELECT d.c_custkey, d.c_mktsegment, d.c_acctbal, d.valid_from,"
    "   u.effective_from AS valid_to"
    "   FROM dim d JOIN upd u USING (c_custkey)"
    "  UNION ALL"
    "  SELECT c_custkey, c_mktsegment, c_acctbal, valid_from, valid_to"
    "   FROM dim WHERE c_custkey % 10 >= 3"
    "  UNION ALL"
    "  SELECT c_custkey, c_mktsegment, c_acctbal, effective_from,"
    "   CAST(NULL AS VARCHAR) FROM upd)",
)
def merge_scd2_customers(spark, sf_dir):
    """Type-2 SCD merge: updated keys close their open row at the
    effective date and append a new open version; the oracle states
    the same three-way union declaratively. One key join (update
    side broadcast-sized) — see operators/merge.merge_scd2."""
    from stockify_spark.operators.merge import merge_scd2

    cust = _t(spark, sf_dir, "customer")
    dim = cust.select(
        "c_custkey",
        "c_mktsegment",
        "c_acctbal",
        F.lit("1990-01-01").alias("valid_from"),
        F.lit(None).cast("string").alias("valid_to"),
    )
    upd = cust.filter(F.col("c_custkey") % 10 < 3).select(
        "c_custkey",
        "c_mktsegment",
        (F.col("c_acctbal") + 100.0).alias("c_acctbal"),
        F.lit("1995-06-01").alias("effective_from"),
    )
    return merge_scd2(dim, upd, ["c_custkey"])


# ---------------------------------------------------------------------------
# Peak concurrency via sweep line: each event spans [ts, ts + value
# seconds]; the classic +1/-1 endpoint walk gives the number of
# simultaneously open intervals, maxed per event type. Endpoint tie
# order (ends before starts) is part of the spec on both sides.
# ---------------------------------------------------------------------------

@register(
    "events_concurrency",
    "WITH iv AS (SELECT event_type, epoch_ms(ts) AS s,"
    "  epoch_ms(ts) + CAST(FLOOR(value) AS BIGINT) * 1000 AS e FROM events),"
    " pts AS (SELECT event_type, s AS t, 1 AS delta FROM iv"
    "  UNION ALL SELECT event_type, e, -1 FROM iv),"
    " run AS (SELECT event_type, SUM(delta) OVER"
    "  (PARTITION BY event_type ORDER BY t, delta"
    "   ROWS UNBOUNDED PRECEDING) AS open FROM pts)"
    " SELECT event_type, CAST(MAX(open) AS BIGINT) AS peak_concurrent,"
    " CAST(COUNT(*) / 2 AS BIGINT) AS n_intervals"
    " FROM run GROUP BY event_type",
)
def events_concurrency(spark, sf_dir):
    """Peak concurrent intervals per event type by sweep line:
    explode each interval to (+1 at start, -1 at end) endpoints, one
    ordered running sum per type (ends sort before starts at equal
    timestamps, so touching intervals don't stack), then max. One
    shuffle on event_type; O(1) window state. The same construction
    range-partitioned on time (with per-boundary carry-in, the
    bucketed_prefix_sum pattern) is the scale form when one type
    dominates."""
    iv = _t(spark, sf_dir, "events").select(
        "event_type",
        F.unix_millis("ts").alias("s"),
        (F.unix_millis("ts") + F.floor("value").cast("long") * 1000).alias("e"),
    )
    pts = iv.select("event_type", F.col("s").alias("t"), F.lit(1).alias("delta")).unionAll(
        iv.select("event_type", F.col("e").alias("t"), F.lit(-1).alias("delta"))
    )
    w = (
        Window.partitionBy("event_type")
        .orderBy("t", "delta")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    run = pts.select("event_type", F.sum("delta").over(w).alias("open"))
    return run.groupBy("event_type").agg(
        F.max("open").cast("long").alias("peak_concurrent"),
        (F.count(F.lit(1)) / 2).cast("long").alias("n_intervals"),
    )


# ---------------------------------------------------------------------------
# Cohort retention — users grouped by first-active week, counted in
# each later week they return: the product-analytics matrix. All
# integer arithmetic on epoch-day / 7 weeks.
# ---------------------------------------------------------------------------

@register(
    "events_retention",
    "WITH act AS (SELECT DISTINCT user_id,"
    "  CAST(epoch_ms(ts) // 604800000 AS BIGINT) AS week FROM events),"
    " cohort AS (SELECT user_id, MIN(week) AS cohort_week FROM act"
    "  GROUP BY user_id)"
    " SELECT c.cohort_week, a.week - c.cohort_week AS week_offset,"
    " CAST(COUNT(*) AS BIGINT) AS n_active"
    " FROM act a JOIN cohort c USING (user_id)"
    " GROUP BY 1, 2",
)
def events_retention(spark, sf_dir):
    """Weekly cohort retention: distinct (user, week) activity,
    cohort = each user's first week, counts per (cohort, offset).
    Two shuffles on user_id (activity distinct + cohort agg share
    the partitioning; Catalyst reuses the exchange) and one
    group-bounded final aggregate. The activity distinct is the
    data-sized step — map-side combine collapses within-partition
    repeats before the exchange."""
    act = (
        _t(spark, sf_dir, "events")
        .select(
            "user_id",
            F.floor(F.unix_millis("ts") / 604800000).cast("long").alias("week"),
        )
        .distinct()
    )
    cohort = act.groupBy("user_id").agg(F.min("week").alias("cohort_week"))
    return (
        act.join(cohort, "user_id")
        .groupBy(
            "cohort_week", (F.col("week") - F.col("cohort_week")).alias("week_offset")
        )
        .agg(F.count(F.lit(1)).alias("n_active"))
    )


# ---------------------------------------------------------------------------
# RFM segmentation — recency / frequency / monetary quintiles per
# customer, the classic CRM scoring. ntile ties are resolved by the
# ORDER BY's unique (metric, custkey) total order on both engines.
# ---------------------------------------------------------------------------

@register(
    "orders_rfm",
    "WITH base AS (SELECT o_custkey,"
    "  MAX(epoch_ms(o_orderdate)) AS last_ms,"
    "  CAST(COUNT(*) AS BIGINT) AS frequency,"
    "  ROUND(SUM(o_totalprice), 2) AS monetary"
    "  FROM orders GROUP BY o_custkey)"
    " SELECT o_custkey, last_ms, frequency, monetary,"
    " CAST(ntile(5) OVER (ORDER BY last_ms DESC, o_custkey) AS BIGINT) AS r_score,"
    " CAST(ntile(5) OVER (ORDER BY frequency DESC, o_custkey) AS BIGINT) AS f_score,"
    " CAST(ntile(5) OVER (ORDER BY monetary DESC, o_custkey) AS BIGINT) AS m_score"
    " FROM base",
)
def orders_rfm(spark, sf_dir):
    """RFM scoring: one group-by to per-customer (recency,
    frequency, monetary), then three quintile windows over the
    compact customer table. The windows are global-order (parity
    hazard, SURVEY §7.4.1) but over |customers| aggregated rows, not
    raw orders — at 100 TB the production form range-partitions each
    ORDER BY (the bucketed boundary-exchange pattern proven by
    window_partitioned_parity)."""
    base = (
        _t(spark, sf_dir, "orders")
        .groupBy("o_custkey")
        .agg(
            F.max(F.unix_millis("o_orderdate")).alias("last_ms"),
            F.count(F.lit(1)).alias("frequency"),
            F.round(F.sum("o_totalprice"), 2).alias("monetary"),
        )
    )
    wr = Window.orderBy(F.col("last_ms").desc(), F.col("o_custkey"))
    wf = Window.orderBy(F.col("frequency").desc(), F.col("o_custkey"))
    wm = Window.orderBy(F.col("monetary").desc(), F.col("o_custkey"))
    return base.select(
        "o_custkey",
        "last_ms",
        "frequency",
        "monetary",
        F.ntile(5).over(wr).cast("long").alias("r_score"),
        F.ntile(5).over(wf).cast("long").alias("f_score"),
        F.ntile(5).over(wm).cast("long").alias("m_score"),
    )


# ---------------------------------------------------------------------------
# Corpus vocabulary statistics per source — token/type counts and
# type-token ratio (the Heaps-law inputs a corpus report needs).
# ---------------------------------------------------------------------------

@register(
    "text_vocab_stats",
    "WITH tok AS (SELECT source, unnest(list_filter("
    "  string_split_regex(lower(text), '[^a-z0-9]+'), t -> t <> ''))"
    "  AS token FROM documents)"
    " SELECT source, CAST(COUNT(*) AS BIGINT) AS n_tokens,"
    " CAST(COUNT(DISTINCT token) AS BIGINT) AS n_types,"
    " ROUND(CAST(COUNT(DISTINCT token) AS DOUBLE) / COUNT(*), 6)"
    "  AS type_token_ratio,"
    " CAST(MAX(length(token)) AS BIGINT) AS max_token_len"
    " FROM tok GROUP BY source",
)
def text_vocab_stats(spark, sf_dir):
    """Per-source vocabulary profile: token count, type (distinct
    token) count, type-token ratio, longest token. One exploded-token
    aggregate; countDistinct expands to the standard two-phase
    distinct (partial per-partition dedup before the exchange), so
    shuffle bytes track per-source vocabulary, not the token
    stream."""
    tok = _t(spark, sf_dir, "documents").select(
        "source",
        F.explode(
            F.filter(
                F.split(F.lower(F.col("text")), "[^a-z0-9]+"), lambda t: t != ""
            )
        ).alias("token"),
    )
    return tok.groupBy("source").agg(
        F.count(F.lit(1)).alias("n_tokens"),
        F.countDistinct("token").alias("n_types"),
        F.round(
            F.countDistinct("token").cast("double") / F.count(F.lit(1)), 6
        ).alias("type_token_ratio"),
        F.max(F.length("token")).cast("long").alias("max_token_len"),
    )


# ---------------------------------------------------------------------------
# Quantile sketch cube — per-segment approx medians rolled up, the
# percentile sibling of agg_sketch_union. Tolerance-of-truth oracle:
# each engine's sketch must land within 5% of ITS exact per-group
# median (both engines also emit the exact medians, hash-compared).
# ---------------------------------------------------------------------------

@register(
    "agg_quantile_cube",
    "SELECT c_mktsegment,"
    " CAST(COUNT(*) AS BIGINT) AS n,"
    " ROUND(median(c_acctbal), 2) AS exact_median,"
    " TRUE AS sketch_ok"
    " FROM customer GROUP BY c_mktsegment",
)
def agg_quantile_cube(spark, sf_dir):
    """Per-segment exact median (hash-compared) beside the
    percentile_approx sketch estimate (tolerance-asserted): the
    exact form needs a per-group sort, the sketch is fixed-size
    mergeable map-side state — at 100 TB the sketch column is the
    one that survives, same shuffle shape as any group agg. DuckDB's
    median of an even group interpolates like Spark's
    percentile(0.5), so the exact columns hash-match."""
    t = _t(spark, sf_dir, "customer")
    approx = F.percentile_approx("c_acctbal", 0.5, 1000)
    exact = F.percentile("c_acctbal", 0.5)
    return t.groupBy("c_mktsegment").agg(
        F.count(F.lit(1)).alias("n"),
        F.round(exact, 2).alias("exact_median"),
        (
            F.abs(approx - exact)
            <= F.greatest(F.abs(exact) * 0.05, F.lit(50.0))
        ).alias("sketch_ok"),
    )


# ---------------------------------------------------------------------------
# Hierarchy depth — the recursive-CTE workload Spark has no native
# operator for, via pointer doubling (operators/graph.tree_depth).
# The tree is the implicit binary heap over customer keys
# (parent = k // 2, root 1), so the oracle's recursive CTE and the
# closed form agree and every depth is integer-exact.
# ---------------------------------------------------------------------------

@register(
    "graph_tree_depth",
    "WITH RECURSIVE walk(node, cur, d) AS ("
    "  SELECT c_custkey, c_custkey, 0 FROM customer"
    "  UNION ALL"
    "  SELECT node, cur // 2, d + 1 FROM walk WHERE cur > 1)"
    " SELECT node, CAST(d AS BIGINT) AS depth,"
    " CAST(2 * node > (SELECT MAX(c_custkey) FROM customer) AS BOOLEAN)"
    "  AS is_leaf"
    " FROM walk WHERE cur = 1",
)
def graph_tree_depth(spark, sf_dir):
    """Depth of every node in the binary-heap hierarchy over
    customer keys (parent = k // 2): the org-chart / BOM-explosion
    traversal. The oracle's recursive CTE walks one hop per
    recursion level (O(height) sequential steps); the Spark side is
    pointer doubling — ⌈log₂ height⌉ self-joins of the (node, anc,
    dist) table (operators/graph.tree_depth), the only shape whose
    round count survives deep chains at cluster scale."""
    from stockify_spark.operators.graph import tree_depth

    cust = _t(spark, sf_dir, "customer")
    edges = cust.filter(F.col("c_custkey") > 1).select(
        F.col("c_custkey").alias("node"),
        (F.col("c_custkey") / 2).cast("long").alias("parent"),
    )
    depths = tree_depth(edges, root=1)
    mx = cust.agg(F.max("c_custkey").alias("_mx"))
    return depths.crossJoin(F.broadcast(mx)).select(
        "node", "depth", (2 * F.col("node") > F.col("_mx")).alias("is_leaf")
    )


# ---------------------------------------------------------------------------
# Robust statistics per group — median / MAD / IQR, the
# outlier-resistant profile. Exact interpolated percentiles on both
# engines, ROUND()ed like every multi-double aggregate.
# ---------------------------------------------------------------------------

@register(
    "agg_robust_stats",
    # discrete (order-statistic) percentiles, not interpolated ones:
    # selection returns an actual data value — bit-exact across
    # engines, where the interpolation a+(b-a)·f vs a·(1-f)+b·f
    # drifts in the last ulp and flipped a ROUND(2) boundary
    "WITH med AS (SELECT c_mktsegment,"
    "  quantile_disc(c_acctbal, 0.5) AS med,"
    "  quantile_disc(c_acctbal, 0.25) AS p25,"
    "  quantile_disc(c_acctbal, 0.75) AS p75"
    "  FROM customer GROUP BY c_mktsegment)"
    " SELECT m.c_mktsegment,"
    " m.med AS median_bal,"
    " m.p75 - m.p25 AS iqr,"
    " quantile_disc(ABS(c.c_acctbal - m.med), 0.5) AS mad"
    " FROM customer c JOIN med m USING (c_mktsegment)"
    " GROUP BY m.c_mktsegment, m.med, m.p25, m.p75",
)
def agg_robust_stats(spark, sf_dir):
    """Median / IQR / MAD per market segment — the robust location
    and spread profile (outliers move mean/stddev, not these). Two
    passes by construction (MAD needs the group median first): a
    per-group quantile aggregate, broadcast back onto the rows, then
    a second quantile over the absolute deviations. Discrete
    quantiles (order statistics) keep every output an exact data
    value. Exact quantiles sort within each group — at 100 TB swap
    in the percentile_approx sketch (agg_quantile_cube pins the
    tolerance contract) unless exactness is the requirement."""
    cust = _t(spark, sf_dir, "customer")
    med = cust.groupBy("c_mktsegment").agg(
        F.expr("percentile_disc(0.5) WITHIN GROUP (ORDER BY c_acctbal)").alias("med"),
        F.expr("percentile_disc(0.25) WITHIN GROUP (ORDER BY c_acctbal)").alias("p25"),
        F.expr("percentile_disc(0.75) WITHIN GROUP (ORDER BY c_acctbal)").alias("p75"),
    )
    joined = cust.join(F.broadcast(med), "c_mktsegment").withColumn(
        "_dev", F.abs(F.col("c_acctbal") - F.col("med"))
    )
    return (
        joined.groupBy("c_mktsegment", "med", "p25", "p75")
        .agg(
            F.expr("percentile_disc(0.5) WITHIN GROUP (ORDER BY _dev)").alias("mad")
        )
        .select(
            "c_mktsegment",
            F.col("med").alias("median_bal"),
            (F.col("p75") - F.col("p25")).alias("iqr"),
            "mad",
        )
    )


# ---------------------------------------------------------------------------
# Benford first-digit profile — the fraud-detection screen. The
# first digit comes from the integer part's decimal string (exact:
# integer-to-string is deterministic; no log10 whose last-ulp could
# flip a digit at powers of ten), and the expected Benford mass is
# a shared literal table.
# ---------------------------------------------------------------------------

_BENFORD = {1: 0.30103, 2: 0.17609, 3: 0.12494, 4: 0.09691,
            5: 0.07918, 6: 0.06695, 7: 0.05799, 8: 0.05115, 9: 0.04576}
# a plain list literal indexed 1-based by digit (DuckDB's MAP[k]
# extraction returns a one-element LIST, not the scalar)
_BENFORD_SQL = "[" + ", ".join(str(_BENFORD[d]) for d in range(1, 10)) + "]"


@register(
    "agg_benford",
    "WITH d AS (SELECT CAST(substr(CAST(CAST(FLOOR(o_totalprice) AS BIGINT)"
    "   AS VARCHAR), 1, 1) AS BIGINT) AS digit FROM orders)"
    " SELECT digit, CAST(COUNT(*) AS BIGINT) AS n,"
    " ROUND(COUNT(*) * 1.0 / SUM(COUNT(*)) OVER (), 6) AS freq,"
    f" CAST({_BENFORD_SQL}[CAST(digit AS INT)] AS DOUBLE) AS benford_expected"
    " FROM d GROUP BY digit",
)
def agg_benford(spark, sf_dir):
    """First-significant-digit distribution of order totals vs the
    Benford expectation — the classic anomaly screen over financial
    facts. Digit extraction goes through the integer part's decimal
    string (exact on both engines; floor(log10(x)) would hinge on
    libm's last ulp exactly at powers of ten). One group-bounded
    aggregate plus a window over the 9-row result."""
    t = _t(spark, sf_dir, "orders")
    digit = F.substring(
        F.floor(F.col("o_totalprice")).cast("long").cast("string"), 1, 1
    ).cast("long")
    expected = F.create_map(
        *[x for d, p in _BENFORD.items() for x in (F.lit(d), F.lit(p))]
    )
    d = t.select(digit.alias("digit"))
    return d.groupBy("digit").agg(
        F.count(F.lit(1)).alias("n"),
        F.round(
            F.count(F.lit(1)) * 1.0 / F.sum(F.count(F.lit(1))).over(Window.partitionBy()),
            6,
        ).alias("freq"),
    ).withColumn("benford_expected", expected[F.col("digit")])


# ---------------------------------------------------------------------------
# One-pass column profiler — the stats screen every engine ships
# (null %, distinct counts, extrema) emitted long-format, one row
# per profiled column.
# ---------------------------------------------------------------------------

@register(
    "profile_columns",
    "WITH s AS (SELECT"
    "  COUNT(*) AS n,"
    "  COUNT(o_custkey) AS nn_cust, COUNT(DISTINCT o_custkey) AS nd_cust,"
    "  CAST(MIN(o_custkey) AS VARCHAR) AS mn_cust,"
    "  CAST(MAX(o_custkey) AS VARCHAR) AS mx_cust,"
    "  COUNT(o_orderstatus) AS nn_st, COUNT(DISTINCT o_orderstatus) AS nd_st,"
    "  MIN(o_orderstatus) AS mn_st, MAX(o_orderstatus) AS mx_st,"
    "  COUNT(o_orderpriority) AS nn_pr, COUNT(DISTINCT o_orderpriority) AS nd_pr,"
    "  MIN(o_orderpriority) AS mn_pr, MAX(o_orderpriority) AS mx_pr"
    "  FROM orders)"
    " SELECT col, n, n_nonnull, n_distinct, min_str, max_str FROM ("
    "  SELECT 'o_custkey' AS col, n, nn_cust AS n_nonnull,"
    "   nd_cust AS n_distinct, mn_cust AS min_str, mx_cust AS max_str FROM s"
    "  UNION ALL SELECT 'o_orderstatus', n, nn_st, nd_st, mn_st, mx_st FROM s"
    "  UNION ALL SELECT 'o_orderpriority', n, nn_pr, nd_pr, mn_pr, mx_pr FROM s)",
)
def profile_columns(spark, sf_dir):
    """Column profile of orders in ONE scan: per column — non-null
    count, exact distinct, min/max (stringified for a uniform
    long-format schema). All profiled columns aggregate in a single
    pass (Catalyst expands the multi-distinct into one expand +
    aggregate), then a zero-shuffle stack() reshapes wide → long. At
    100 TB swap exact distincts for approx_count_distinct sketches
    (agg_approx_distinct pins that contract) — same single-scan
    shape."""
    t = _t(spark, sf_dir, "orders")
    s = t.agg(
        F.count(F.lit(1)).alias("n"),
        F.count("o_custkey").alias("nn_cust"),
        F.countDistinct("o_custkey").alias("nd_cust"),
        F.min("o_custkey").cast("string").alias("mn_cust"),
        F.max("o_custkey").cast("string").alias("mx_cust"),
        F.count("o_orderstatus").alias("nn_st"),
        F.countDistinct("o_orderstatus").alias("nd_st"),
        F.min("o_orderstatus").alias("mn_st"),
        F.max("o_orderstatus").alias("mx_st"),
        F.count("o_orderpriority").alias("nn_pr"),
        F.countDistinct("o_orderpriority").alias("nd_pr"),
        F.min("o_orderpriority").alias("mn_pr"),
        F.max("o_orderpriority").alias("mx_pr"),
    )
    return s.select(
        F.expr(
            "stack(3,"
            " 'o_custkey', n, nn_cust, nd_cust, mn_cust, mx_cust,"
            " 'o_orderstatus', n, nn_st, nd_st, mn_st, mx_st,"
            " 'o_orderpriority', n, nn_pr, nd_pr, mn_pr, mx_pr)"
            " AS (col, n, n_nonnull, n_distinct, min_str, max_str)"
        )
    )


# ---------------------------------------------------------------------------
# Data-quality rule screen — referential integrity, range, and
# uniqueness checks as one rule → violation-count table (what a DQ
# framework runs nightly).
# ---------------------------------------------------------------------------

@register(
    "dq_checks",
    "SELECT rule, n_violations FROM ("
    " SELECT 'lineitem_fk_orders' AS rule, CAST(("
    "  SELECT COUNT(*) FROM lineitem l WHERE NOT EXISTS"
    "   (SELECT 1 FROM orders o WHERE o.o_orderkey = l.l_orderkey))"
    "  AS BIGINT) AS n_violations"
    " UNION ALL SELECT 'orders_fk_customer', CAST(("
    "  SELECT COUNT(*) FROM orders o WHERE NOT EXISTS"
    "   (SELECT 1 FROM customer c WHERE c.c_custkey = o.o_custkey)) AS BIGINT)"
    " UNION ALL SELECT 'discount_in_range', CAST(("
    "  SELECT COUNT(*) FROM lineitem"
    "  WHERE l_discount < 0 OR l_discount > 0.1) AS BIGINT)"
    " UNION ALL SELECT 'orderkey_linenumber_unique', CAST(("
    "  SELECT COUNT(*) FROM (SELECT l_orderkey, l_linenumber FROM lineitem"
    "   GROUP BY 1, 2 HAVING COUNT(*) > 1)) AS BIGINT)"
    " UNION ALL SELECT 'totalprice_positive', CAST(("
    "  SELECT COUNT(*) FROM orders WHERE o_totalprice <= 0) AS BIGINT))",
)
def dq_checks(spark, sf_dir):
    """Five data-quality rules in one result: two referential-
    integrity checks (anti-join counts — the 100 TB shape: one key
    shuffle each, dim side broadcast when small), one domain range,
    one composite-key uniqueness (group-bounded), one positivity.
    Each rule is an independent subtree; Spark runs them as a union
    of small aggregates, each with its own pushed-down scan."""
    li = _t(spark, sf_dir, "lineitem")
    orders = _t(spark, sf_dir, "orders")
    cust = _t(spark, sf_dir, "customer")

    def one(rule, cnt_df):
        return cnt_df.select(
            F.lit(rule).alias("rule"), F.col("cnt").cast("long").alias("n_violations")
        )

    fk1 = li.join(orders, li["l_orderkey"] == orders["o_orderkey"], "left_anti").agg(
        F.count(F.lit(1)).alias("cnt")
    )
    fk2 = orders.join(cust, orders["o_custkey"] == cust["c_custkey"], "left_anti").agg(
        F.count(F.lit(1)).alias("cnt")
    )
    rng = li.filter((F.col("l_discount") < 0) | (F.col("l_discount") > 0.1)).agg(
        F.count(F.lit(1)).alias("cnt")
    )
    uniq = (
        li.groupBy("l_orderkey", "l_linenumber")
        .agg(F.count(F.lit(1)).alias("c"))
        .filter(F.col("c") > 1)
        .agg(F.count(F.lit(1)).alias("cnt"))
    )
    pos = orders.filter(F.col("o_totalprice") <= 0).agg(F.count(F.lit(1)).alias("cnt"))
    return (
        one("lineitem_fk_orders", fk1)
        .unionAll(one("orders_fk_customer", fk2))
        .unionAll(one("discount_in_range", rng))
        .unionAll(one("orderkey_linenumber_unique", uniq))
        .unionAll(one("totalprice_positive", pos))
    )


# ---------------------------------------------------------------------------
# Behavioral transition matrix — Markov counts between consecutive
# event types per user (the session-flow / next-action model input).
# ---------------------------------------------------------------------------

@register(
    "events_markov",
    "WITH seq AS (SELECT user_id, event_type,"
    "  lag(event_type) OVER (PARTITION BY user_id"
    "   ORDER BY epoch_ms(ts), event_id) AS prev_type FROM events)"
    " SELECT prev_type, event_type AS next_type,"
    " CAST(COUNT(*) AS BIGINT) AS n,"
    " ROUND(COUNT(*) * 1.0 / SUM(COUNT(*)) OVER (PARTITION BY prev_type), 6)"
    "  AS p_next"
    " FROM seq WHERE prev_type IS NOT NULL"
    " GROUP BY prev_type, event_type",
)
def events_markov(spark, sf_dir):
    """First-order Markov transition counts and row-normalized
    probabilities between consecutive event types per user: one lag
    window on the user_id partitioning, one group-bounded aggregate,
    one window over the |types|² result. The transition matrix is
    the input to next-action prediction and to anomaly screens
    (transitions with n≈0 but traffic-heavy endpoints)."""
    t = _t(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy(F.unix_millis("ts"), "event_id")
    seq = t.select(
        "user_id", "event_type", F.lag("event_type").over(w).alias("prev_type")
    ).filter(F.col("prev_type").isNotNull())
    counted = seq.groupBy("prev_type", F.col("event_type").alias("next_type")).agg(
        F.count(F.lit(1)).alias("n")
    )
    return counted.select(
        "prev_type",
        "next_type",
        "n",
        F.round(
            F.col("n") * 1.0 / F.sum("n").over(Window.partitionBy("prev_type")), 6
        ).alias("p_next"),
    )


# ---------------------------------------------------------------------------
# Rolling min-max normalization — trailing-20 feature scaling, the
# outlier/normalization screen built ONLY from order statistics
# (rolling MIN/MAX involve no float accumulation, so the comparison
# is exact; a first draft used rolling stddev z-scores, but windowed
# stddev accumulates differently across engines — DuckDB maintains a
# segment tree with subtraction, Spark recomputes per frame — and
# the drift exceeds any safe ROUND grid).
# ---------------------------------------------------------------------------

@register(
    "window_rolling_norm",
    "WITH r AS (SELECT event_id, user_id, value,"
    "  MIN(value) OVER w AS lo, MAX(value) OVER w AS hi,"
    "  COUNT(*) OVER w AS n_win"
    "  FROM events"
    "  WINDOW w AS (PARTITION BY user_id ORDER BY epoch_ms(ts), event_id"
    "   ROWS BETWEEN 19 PRECEDING AND CURRENT ROW))"
    " SELECT event_id, user_id, value, CAST(n_win AS BIGINT) AS n_win,"
    " lo, hi,"
    " CASE WHEN hi > lo THEN ROUND((value - lo) / (hi - lo), 6) END AS pos"
    " FROM r",
)
def window_rolling_norm(spark, sf_dir):
    """Trailing-20 min-max normalization per user series: one
    partitioned window pass, O(frame) state, per-row arithmetic
    after. `pos` = the value's position inside its trailing range
    (NULL on a flat window) — the streaming-friendly scaling used
    where z-scores would need a float-stable variance; min/max are
    order statistics, so every column is exact across engines. The
    n_win column makes the warm-up region explicit."""
    t = _t(spark, sf_dir, "events")
    w = (
        Window.partitionBy("user_id")
        .orderBy(F.unix_millis("ts"), "event_id")
        .rowsBetween(-19, 0)
    )
    lo = F.min("value").over(w)
    hi = F.max("value").over(w)
    return t.select(
        "event_id",
        "user_id",
        "value",
        F.count(F.lit(1)).over(w).cast("long").alias("n_win"),
        lo.alias("lo"),
        hi.alias("hi"),
        F.when(
            hi > lo, F.round((F.col("value") - lo) / (hi - lo), 6)
        ).alias("pos"),
    )


# ---------------------------------------------------------------------------
# Incremental aggregate maintenance — the materialized-view update
# pattern: combine a pre-aggregated base with a delta batch's
# partials WITHOUT rescanning base rows. The oracle is the full
# recompute, so the differential check proves incremental == batch.
# ---------------------------------------------------------------------------

@register(
    "merge_incremental_agg",
    "SELECT o_custkey, CAST(COUNT(*) AS BIGINT) AS n_orders,"
    " ROUND(SUM(o_totalprice), 2) AS total,"
    " MAX(epoch_ms(o_orderdate)) AS last_ms"
    " FROM orders GROUP BY o_custkey",
)
def merge_incremental_agg(spark, sf_dir):
    """Materialized-view maintenance: the per-customer order
    aggregate is kept as (count, sum, max) partials; a new batch
    aggregates ONLY its own rows and full-outer-merges onto the base
    by key — count+count, sum+sum, greatest(max, max). The query
    splits orders at 1997-01-01 into base/delta, runs the
    incremental path, and the oracle recomputes from scratch:
    hash-equality IS the incremental-consistency proof. At 100 TB
    this is the shape that turns a daily full rescan into a
    delta-sized job — every algebraic aggregate (sum/count/min/max,
    and avg/stddev/sketches via their partials) merges this way; the
    base side is a bucketed table co-partitioned on the key so the
    merge join doesn't reshuffle it."""
    orders = _t(spark, sf_dir, "orders")
    cut = F.lit("1997-01-01").cast("timestamp")

    def partials(df):
        return df.groupBy("o_custkey").agg(
            F.count(F.lit(1)).alias("n_orders"),
            F.sum("o_totalprice").alias("total"),
            F.max(F.unix_millis("o_orderdate")).alias("last_ms"),
        )

    base = partials(orders.filter(F.col("o_orderdate") < cut))
    delta = partials(orders.filter(F.col("o_orderdate") >= cut))
    b = base.select(
        F.col("o_custkey"),
        F.col("n_orders").alias("_bn"),
        F.col("total").alias("_bt"),
        F.col("last_ms").alias("_bm"),
    )
    d = delta.select(
        F.col("o_custkey"),
        F.col("n_orders").alias("_dn"),
        F.col("total").alias("_dt"),
        F.col("last_ms").alias("_dm"),
    )
    merged = b.join(d, "o_custkey", "full_outer")
    return merged.select(
        "o_custkey",
        (F.coalesce("_bn", F.lit(0)) + F.coalesce("_dn", F.lit(0))).alias("n_orders"),
        F.round(
            F.coalesce("_bt", F.lit(0.0)) + F.coalesce("_dt", F.lit(0.0)), 2
        ).alias("total"),
        F.greatest(
            F.coalesce("_bm", F.lit(-(1 << 62))), F.coalesce("_dm", F.lit(-(1 << 62)))
        ).alias("last_ms"),
    )


# ---------------------------------------------------------------------------
# Latency bands — P50/P95/P99 per (event type, hour): the
# observability dashboard aggregate. Discrete percentiles keep every
# figure an exact data value (the agg_robust_stats lesson).
# ---------------------------------------------------------------------------

@register(
    "events_latency_bands",
    "SELECT event_type, CAST(epoch_ms(ts) // 3600000 AS BIGINT) AS hour,"
    " CAST(COUNT(*) AS BIGINT) AS n,"
    " quantile_disc(value, 0.5) AS p50,"
    " quantile_disc(value, 0.95) AS p95,"
    " quantile_disc(value, 0.99) AS p99,"
    " MAX(value) AS pmax"
    " FROM events GROUP BY 1, 2",
)
def events_latency_bands(spark, sf_dir):
    """P50/P95/P99/max of event values per (type, hour) — the
    latency-dashboard rollup. Exact discrete percentiles sort within
    each (type, hour) group: one shuffle, group-bounded output. At
    100 TB the hourly grain keeps groups bounded and the
    percentile_approx sketch (agg_quantile_cube's contract) replaces
    the exact sort where dashboards tolerate ±ε."""
    t = _t(spark, sf_dir, "events")
    return (
        t.withColumn(
            "hour", F.floor(F.unix_millis("ts") / 3600000).cast("long")
        )
        .groupBy("event_type", "hour")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.expr("percentile_disc(0.5) WITHIN GROUP (ORDER BY value)").alias("p50"),
            F.expr("percentile_disc(0.95) WITHIN GROUP (ORDER BY value)").alias("p95"),
            F.expr("percentile_disc(0.99) WITHIN GROUP (ORDER BY value)").alias("p99"),
            F.max("value").alias("pmax"),
        )
    )


# ---------------------------------------------------------------------------
# Market-basket co-occurrence — parts bought together in one order,
# with support counts: the Apriori candidate-pair step. All exact
# integers.
# ---------------------------------------------------------------------------

@register(
    "basket_pairs",
    "WITH items AS (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem),"
    " pairs AS (SELECT a.l_partkey AS part_a, b.l_partkey AS part_b"
    "  FROM items a JOIN items b ON a.l_orderkey = b.l_orderkey"
    "  AND a.l_partkey < b.l_partkey)"
    " SELECT part_a, part_b, CAST(COUNT(*) AS BIGINT) AS support"
    " FROM pairs GROUP BY part_a, part_b HAVING COUNT(*) >= 2",
)
def basket_pairs(spark, sf_dir):
    """Frequent co-purchase pairs (support >= 2): distinct
    (order, part) items, a self-join ON the order key to form
    within-basket pairs, then pair-support counts — the candidate
    generation step of association mining. The self-join is keyed on
    l_orderkey, so pair blowup is Σ basket_size² — bounded by the
    ~4-7-line TPC-H baskets (and in general by capping basket size
    upstream, the standard Apriori guard); everything shuffles on
    keys, no cartesian."""
    li = _t(spark, sf_dir, "lineitem")
    items = li.select("l_orderkey", "l_partkey").distinct()
    a = items.select(F.col("l_orderkey"), F.col("l_partkey").alias("part_a"))
    b = items.select(F.col("l_orderkey"), F.col("l_partkey").alias("part_b"))
    pairs = a.join(b, "l_orderkey").filter(F.col("part_a") < F.col("part_b"))
    return (
        pairs.groupBy("part_a", "part_b")
        .agg(F.count(F.lit(1)).alias("support"))
        .filter(F.col("support") >= 2)
    )


# ---------------------------------------------------------------------------
# Scale-form skyline — the multi-partition proof for
# analytics_skyline's global-order flag, same construction as
# window_partitioned_parity / bucketed_prefix_sum: per-bucket local
# pass + a carry table over bucket boundaries.
# ---------------------------------------------------------------------------

@register(
    "skyline_partitioned_parity",
    # identical result spec as analytics_skyline: the oracle IS the
    # global-order formulation; the Spark side computes it bucketed
    "WITH pp AS (SELECT l_extendedprice AS price, MIN(l_quantity) AS qty"
    "  FROM lineitem GROUP BY 1),"
    " r AS (SELECT price, qty, MIN(qty) OVER"
    "   (ORDER BY price DESC"
    "    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS best_above"
    "  FROM pp)"
    " SELECT price, qty FROM r"
    " WHERE best_above IS NULL OR qty < best_above",
)
def skyline_partitioned_parity(spark, sf_dir):
    """analytics_skyline WITHOUT the single-partition global window:
    prices are range-bucketed (fixed width, so bucket order == price
    order); each bucket computes its local strictly-preceding min in
    parallel; a |buckets|-row carry table (min qty of every strictly
    higher bucket — the only global pass, over bucket AGGREGATES)
    broadcasts back, and the survivor test combines local + carried
    minima. The oracle is the global-order SQL — hash-equality
    proves the decomposition. Same pattern as
    window_partitioned_parity / bucketed_prefix_sum (SURVEY §7.4.1):
    this is how every 'global ORDER BY' analytic in this repo
    actually runs at 100 TB."""
    pp = (
        _t(spark, sf_dir, "lineitem")
        .groupBy(F.col("l_extendedprice").alias("price"))
        .agg(F.min("l_quantity").alias("qty"))
        .withColumn("bucket", F.floor(F.col("price") / 5000.0).cast("long"))
    )
    wloc = (
        Window.partitionBy("bucket")
        .orderBy(F.col("price").desc())
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    local = pp.withColumn("local_best", F.min("qty").over(wloc))
    bucket_mins = pp.groupBy("bucket").agg(F.min("qty").alias("bmin"))
    # carry: min over strictly HIGHER buckets — an exclusive-frame
    # window over the tiny bucket-aggregate table (the two-phase
    # scan's reduction step, |buckets| rows)
    wcarry = Window.orderBy(F.col("bucket").desc()).rowsBetween(
        Window.unboundedPreceding, -1
    )
    carry = bucket_mins.withColumn("carried", F.min("bmin").over(wcarry)).select(
        "bucket", "carried"
    )
    joined = local.join(F.broadcast(carry), "bucket")
    best_above = F.least(
        F.coalesce("local_best", F.lit(float("inf"))),
        F.coalesce("carried", F.lit(float("inf"))),
    )
    return joined.filter(F.col("qty") < best_above).select("price", "qty")
