"""Round-8 extension wave 9: metadata-only aggregates, BM25 ranking,
exact Shapley attribution, and literal-weight spectral power.

Two more scale idioms made first-class: answering COUNT/MIN/MAX from
the commit log's per-file statistics without opening a single data
file (the Delta metadata-only-query optimization, on the shared
lifecycle table), and the literal-weight trick for transcendental
kernels — the 18 cos/sin weights of the ramp's fundamental are
computed ONCE in Python and injected as identical literals into both
faces, so no cross-engine libm call ever happens in the hot path
(the broadcast-model-state pattern applied to DSP)."""

from __future__ import annotations

import math

from pyspark.sql import functions as F

from stockify_spark.registry import register, _t

_N_ROWS = 1800
_SERIES_LEN = 180


_META_SQL = """
SELECT COUNT(*) AS n_rows,
       MIN(o_orderkey) AS min_orderkey, MAX(o_orderkey) AS max_orderkey,
       MIN(o_totalprice) AS min_total, MAX(o_totalprice) AS max_total
FROM orders WHERE o_orderkey % 10 <> 0
"""


@register("txlog_metadata_count", _META_SQL)
def txlog_metadata_count(spark, sf_dir):
    """Metadata-only aggregates: COUNT(*)/MIN/MAX of the shared
    lifecycle table (create → append → COW-delete → compact,
    registry_ext7) answered ENTIRELY from the commit log's per-file
    statistics — txlog.table_stats opens zero data files; the one-row
    result is createDataFrame'd on the driver. The oracle recomputes
    the same numbers by scanning the source table, so the log's stats
    pipeline (footer harvest at write, merge at read, COW rewrite
    refresh) is verified end-to-end. At 100 TB this is the difference
    between one log read and a full-table scan."""
    from stockify_spark.registry_ext7 import _lifecycle_table
    from stockify_spark.sources import txlog

    path = _lifecycle_table(spark, sf_dir)
    st = txlog.table_stats(path)
    row = [
        (
            int(st["rows"]),
            int(st["min"]["o_orderkey"]),
            int(st["max"]["o_orderkey"]),
            float(st["min"]["o_totalprice"]),
            float(st["max"]["o_totalprice"]),
        )
    ]
    return spark.createDataFrame(
        row,
        "n_rows long, min_orderkey long, max_orderkey long,"
        " min_total double, max_total double",
    )


_BM25_TERMS = ("data", "spark", "query")
_TOKS20 = "string_split_regex(trim(lower(text)), '\\s+')"

_BM25_SQL = f"""
WITH tok AS (SELECT doc_id, unnest({_TOKS20}) AS tok FROM documents),
dl AS (SELECT doc_id, COUNT(*) AS dl FROM tok GROUP BY doc_id),
corpus AS (SELECT CAST(COUNT(*) AS DOUBLE) AS n_docs,
                  (SELECT CAST(SUM(dl) AS DOUBLE) FROM dl)
                    / CAST(COUNT(*) AS DOUBLE) AS avgdl
           FROM documents),
terms AS (SELECT * FROM (VALUES {", ".join(f"('{t}')" for t in _BM25_TERMS)}) t(term)),
df AS (SELECT tok AS term, CAST(COUNT(DISTINCT doc_id) AS DOUBLE) AS df
       FROM tok WHERE tok IN {_BM25_TERMS!r} GROUP BY tok),
tf AS (SELECT doc_id, tok AS term, CAST(COUNT(*) AS DOUBLE) AS tf
       FROM tok WHERE tok IN {_BM25_TERMS!r} GROUP BY doc_id, tok),
scored AS (
  SELECT tf.doc_id,
         SUM(ln((corpus.n_docs - df.df + 0.5) / (df.df + 0.5) + 1.0)
             * tf.tf * (1.2 + 1.0)
             / (tf.tf + 1.2 * (1.0 - 0.75 + 0.75 * dl.dl / corpus.avgdl)))
           AS score
  FROM tf
  JOIN df ON df.term = tf.term
  JOIN dl ON dl.doc_id = tf.doc_id
  CROSS JOIN corpus
  GROUP BY tf.doc_id
)
SELECT doc_id, ROUND(score, 6) AS bm25
FROM scored
ORDER BY ROUND(score, 6) DESC, doc_id
LIMIT 20
"""


@register("sim_bm25_search", _BM25_SQL)
def sim_bm25_search(spark, sf_dir):
    """BM25 ranking (k1=1.2, b=0.75, the Lucene-style non-negative
    idf ln((N-df+0.5)/(df+0.5)+1)) for a fixed 3-term query over the
    corpus: top-20 docs ordered by 6dp-rounded score then doc_id.
    The model side (df per term, N, avgdl) is two tiny aggregates
    that broadcast; scoring is a map-side join over only the rows
    whose token matches a query term — the inverted-index probe
    shape, no corpus-wide shuffle beyond the tf/dl groupBys."""
    from stockify_spark.functions.text import tokens

    docs = _t(spark, sf_dir, "documents")
    tok = docs.select("doc_id", F.explode(tokens("text")).alias("tok"))
    dl = tok.groupBy("doc_id").agg(F.count(F.lit(1)).alias("dl"))
    n_docs = docs.count()
    avgdl_row = dl.agg(
        (F.sum("dl").cast("double") / F.lit(float(n_docs))).alias("avgdl")
    ).collect()[0]
    avgdl = float(avgdl_row.avgdl)
    hits = tok.filter(F.col("tok").isin(*_BM25_TERMS))
    df_t = hits.groupBy(F.col("tok").alias("term")).agg(
        F.countDistinct("doc_id").cast("double").alias("df")
    )
    tf = hits.groupBy("doc_id", F.col("tok").alias("term")).agg(
        F.count(F.lit(1)).cast("double").alias("tf")
    )
    idf = F.log((float(n_docs) - F.col("df") + 0.5) / (F.col("df") + 0.5) + 1.0)
    denom = F.col("tf") + 1.2 * (1.0 - 0.75 + 0.75 * F.col("dl") / avgdl)
    scored = (
        tf.join(F.broadcast(df_t), "term")
        .join(dl, "doc_id")
        .groupBy("doc_id")
        .agg(F.sum(idf * F.col("tf") * (1.2 + 1.0) / denom).alias("score"))
    )
    return (
        scored.orderBy(F.round("score", 6).desc(), "doc_id")
        .limit(20)
        .select("doc_id", F.round("score", 6).alias("bm25"))
    )


_SHAP_SQL = """
WITH conv AS (
  SELECT user_id, MIN(ts) AS first_purchase
  FROM events WHERE event_type = 'purchase' GROUP BY user_id
),
pre AS (
  SELECT DISTINCT e.user_id, e.event_type AS channel
  FROM events e JOIN conv c ON c.user_id = e.user_id
  WHERE e.event_type <> 'purchase' AND e.ts < c.first_purchase
),
ksize AS (SELECT user_id, COUNT(*) AS k FROM pre GROUP BY user_id)
SELECT p.channel,
       COUNT(*) AS n_users,
       ROUND(SUM(1.0 / ks.k), 6) AS shapley_credit
FROM pre p JOIN ksize ks ON ks.user_id = p.user_id
GROUP BY p.channel
"""


@register("events_shapley_attribution", _SHAP_SQL)
def events_shapley_attribution(spark, sf_dir):
    """Exact Shapley-value conversion attribution: with the additive
    coalition game v(S) = #converted users whose pre-purchase channel
    set ⊆ S, the Shapley value of a channel reduces EXACTLY to
    uniform credit 1/|set| per converted user exposed to it (each
    user's unit of value splits symmetrically among the channels
    they saw — the closed form of the factorial-weighted sum for
    additive games). Channels are the non-purchase event types seen
    STRICTLY BEFORE the user's first purchase. One distinct pass +
    one small join; the integer set sizes make 1/k exact on both
    faces."""
    ev = _t(spark, sf_dir, "events")
    conv = (
        ev.filter(F.col("event_type") == "purchase")
        .groupBy("user_id")
        .agg(F.min("ts").alias("first_purchase"))
    )
    pre = (
        ev.join(conv, "user_id")
        .filter(
            (F.col("event_type") != "purchase")
            & (F.col("ts") < F.col("first_purchase"))
        )
        .select("user_id", F.col("event_type").alias("channel"))
        .distinct()
    )
    ksize = pre.groupBy("user_id").agg(F.count(F.lit(1)).alias("k"))
    return (
        pre.join(ksize, "user_id")
        .groupBy("channel")
        .agg(
            F.count(F.lit(1)).alias("n_users"),
            F.round(F.sum(1.0 / F.col("k")), 6).alias("shapley_credit"),
        )
    )


def _goertzel_weights(k: int) -> tuple[list[float], list[float]]:
    """The 18 cos/sin weights of harmonic k of the ramp period,
    computed ONCE here and injected as IDENTICAL literals into both
    faces — no cross-engine libm trig in the hot path."""
    cos = [math.cos(2.0 * math.pi * k * p / 18.0) for p in range(18)]
    sin = [math.sin(2.0 * math.pi * k * p / 18.0) for p in range(18)]
    return cos, sin


def _goertzel_oracle() -> str:
    rows = []
    for k in range(1, 6):
        cos, sin = _goertzel_weights(k)
        cos_case = " ".join(
            f"WHEN {p} THEN CAST({c!r} AS DOUBLE)" for p, c in enumerate(cos)
        )
        sin_case = " ".join(
            f"WHEN {p} THEN CAST({s!r} AS DOUBLE)" for p, s in enumerate(sin)
        )
        rows.append(
            f"SELECT symbol, {k} AS harmonic,"
            f" SUM(close * CASE pos % 18 {cos_case} END) AS cs,"
            f" SUM(close * CASE pos % 18 {sin_case} END) AS sn"
            " FROM base GROUP BY symbol"
        )
    union = " UNION ALL ".join(rows)
    return f"""
WITH stocks AS (
  SELECT i AS row_id, CAST(500 + (i % 18) * 10 AS DOUBLE) AS close
  FROM range({_N_ROWS}) t(i)
),
base AS (SELECT row_id // {_SERIES_LEN} AS symbol,
                row_id % {_SERIES_LEN} AS pos, close
         FROM stocks),
p AS ({union})
SELECT CAST(symbol AS BIGINT) AS symbol, CAST(harmonic AS BIGINT) AS harmonic,
       ROUND(cs * cs + sn * sn, 4) AS power
FROM p
"""


@register("window_goertzel_power", _goertzel_oracle())
def window_goertzel_power(spark, sf_dir):
    """Spectral power of each series at harmonics 1-5 of the known
    18-sample period: P(k) = (Σ x·cos)² + (Σ x·sin)². The trig
    weights repeat with the period, so they are precomputed in
    Python and shipped as the SAME literal doubles to both engines
    (a broadcast weight table — the literal-weight pattern): the
    only cross-engine variation left is sum order, absorbed by the
    4dp pin. The sawtooth's harmonic signature (power ∝ 1/k² shape)
    falls out, testable in closed form. One map-side multiply +
    per-series aggregation per harmonic."""
    from functools import reduce

    from stockify_spark.sources.fixtures import stocks_ramp

    base = stocks_ramp(spark, cycles=100).select(
        (F.col("row_id") / _SERIES_LEN).cast("long").alias("symbol"),
        (F.col("row_id") % _SERIES_LEN).cast("long").alias("pos"),
        "close",
    )
    outs = []
    for k in range(1, 6):
        cos, sin = _goertzel_weights(k)
        p18 = F.col("pos") % 18
        cexpr = F.when(p18 == 0, F.lit(cos[0]))
        sexpr = F.when(p18 == 0, F.lit(sin[0]))
        for p in range(1, 18):
            cexpr = cexpr.when(p18 == p, F.lit(cos[p]))
            sexpr = sexpr.when(p18 == p, F.lit(sin[p]))
        g = base.groupBy("symbol").agg(
            F.sum(F.col("close") * cexpr).alias("cs"),
            F.sum(F.col("close") * sexpr).alias("sn"),
        )
        outs.append(
            g.select(
                "symbol",
                F.lit(k).cast("long").alias("harmonic"),
                F.round(
                    F.col("cs") * F.col("cs") + F.col("sn") * F.col("sn"), 4
                ).alias("power"),
            )
        )
    return reduce(lambda x, y: x.unionAll(y), outs)
