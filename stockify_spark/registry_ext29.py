"""Round-8 extension wave 18: per-key curve fitting and vocabulary
growth law.

Quadratic fitting extends the closed-form-ML family (ridge/PCA/
detrend) to per-key NORMAL EQUATIONS with a polynomial design: the
moment sums up to Σpos⁴ stay integer-exact below 2^53, so the 3×3
Cramer solve per series is deterministic with no pins. Heaps' law is
the corpus-statistics dual of text_zipf_fit: vocabulary size as a
function of corpus size, computed in ONE pass via each token's
first-occurrence document (V(prefix) = cumulative count of first
occurrences — no per-prefix rescans), with the log-log exponent fit
on literal design weights."""

from __future__ import annotations

import math

from pyspark.sql import Window
from pyspark.sql import functions as F

from stockify_spark.registry import register, _t

_N_ROWS = 1800
_SERIES_LEN = 180

_POLY_SQL = f"""
WITH stocks AS (
  SELECT i AS row_id, CAST(500 + (i % 18) * 10 AS DOUBLE) AS close
  FROM range({_N_ROWS}) t(i)
),
base AS (SELECT row_id // {_SERIES_LEN} AS symbol,
                row_id % {_SERIES_LEN} AS pos, close
         FROM stocks),
m AS (
  SELECT symbol, CAST(COUNT(*) AS DOUBLE) AS n,
         CAST(SUM(pos) AS DOUBLE) AS s1,
         CAST(SUM(pos * pos) AS DOUBLE) AS s2,
         CAST(SUM(pos * pos * pos) AS DOUBLE) AS s3,
         CAST(SUM(CAST(pos * pos AS DOUBLE) * CAST(pos * pos AS DOUBLE))
              AS DOUBLE) AS s4,
         SUM(close) AS b0, SUM(pos * close) AS b1,
         SUM(pos * pos * close) AS b2
  FROM base GROUP BY symbol
),
d AS (
  SELECT symbol, b0, b1, b2, n, s1, s2, s3, s4,
         n * (s2 * s4 - s3 * s3)
         - s1 * (s1 * s4 - s3 * s2)
         + s2 * (s1 * s3 - s2 * s2) AS det
  FROM m
)
SELECT CAST(symbol AS BIGINT) AS symbol,
       ROUND((b0 * (s2 * s4 - s3 * s3)
              - s1 * (b1 * s4 - s3 * b2)
              + s2 * (b1 * s3 - s2 * b2)) / det, 6) AS c0,
       ROUND((n * (b1 * s4 - b2 * s3)
              - b0 * (s1 * s4 - s3 * s2)
              + s2 * (s1 * b2 - b1 * s2)) / det, 6) AS c1,
       ROUND((n * (s2 * b2 - s3 * b1)
              - s1 * (s1 * b2 - b1 * s2)
              + b0 * (s1 * s3 - s2 * s2)) / det, 6) AS c2
FROM d
"""


@register("ml_polyfit_series", _POLY_SQL)
def ml_polyfit_series(spark, sf_dir):
    """Per-series quadratic least squares close ~ c0 + c1·pos +
    c2·pos² by the normal equations: one moment pass (Σpos⁰..⁴ and
    the three response moments — the largest, Σpos⁴ ≈ 1.8e11, is
    exactly representable, the registry_ext17 integer rule) and a
    per-key 3×3 Cramer solve written as identical column
    expressions. Distributed curve fitting with zero iterations and
    key-count parallelism; verified against numpy.polyfit in
    tests."""
    from stockify_spark.sources.fixtures import stocks_ramp

    base = stocks_ramp(spark, cycles=100).select(
        (F.col("row_id") / _SERIES_LEN).cast("long").alias("symbol"),
        (F.col("row_id") % _SERIES_LEN).cast("long").alias("pos"),
        "close",
    )
    p = F.col("pos")
    y = F.col("close")
    p2 = (p * p).cast("double")
    m = base.groupBy("symbol").agg(
        F.count(F.lit(1)).cast("double").alias("n"),
        F.sum(p).cast("double").alias("s1"),
        F.sum(p * p).cast("double").alias("s2"),
        F.sum(p * p * p).cast("double").alias("s3"),
        F.sum(p2 * p2).alias("s4"),
        F.sum(y).alias("b0"),
        F.sum(p * y).alias("b1"),
        F.sum(p * p * y).alias("b2"),
    )
    c = F.col
    det = (
        c("n") * (c("s2") * c("s4") - c("s3") * c("s3"))
        - c("s1") * (c("s1") * c("s4") - c("s3") * c("s2"))
        + c("s2") * (c("s1") * c("s3") - c("s2") * c("s2"))
    )
    d = m.withColumn("det", det)
    c0 = (
        c("b0") * (c("s2") * c("s4") - c("s3") * c("s3"))
        - c("s1") * (c("b1") * c("s4") - c("s3") * c("b2"))
        + c("s2") * (c("b1") * c("s3") - c("s2") * c("b2"))
    ) / c("det")
    c1 = (
        c("n") * (c("b1") * c("s4") - c("b2") * c("s3"))
        - c("b0") * (c("s1") * c("s4") - c("s3") * c("s2"))
        + c("s2") * (c("s1") * c("b2") - c("b1") * c("s2"))
    ) / c("det")
    c2 = (
        c("n") * (c("s2") * c("b2") - c("s3") * c("b1"))
        - c("s1") * (c("s1") * c("b2") - c("b1") * c("s2"))
        + c("b0") * (c("s1") * c("s3") - c("s2") * c("s2"))
    ) / c("det")
    return d.select(
        "symbol",
        F.round(c0, 6).alias("c0"),
        F.round(c1, 6).alias("c1"),
        F.round(c2, 6).alias("c2"),
    )


_HEAPS_CHECKPOINTS = 10
_TOKS29 = "string_split_regex(trim(lower(text)), '\\s+')"


def _heaps_oracle() -> str:
    # literal log-log OLS design over the checkpoint fractions
    fr = [(i + 1) / _HEAPS_CHECKPOINTS for i in range(_HEAPS_CHECKPOINTS)]
    return f"""
WITH tok AS (SELECT doc_id, unnest({_TOKS29}) AS tok FROM documents),
firsts AS (SELECT tok, MIN(doc_id) AS first_doc FROM tok GROUP BY tok),
maxd AS (SELECT MAX(doc_id) AS md FROM documents),
cp AS (
  SELECT i + 1 AS k,
         CAST(FLOOR((CAST({fr!r}[i + 1] AS DOUBLE)) * (md + 1)) - 1 AS BIGINT)
           AS cutoff
  FROM range({_HEAPS_CHECKPOINTS}) t(i) CROSS JOIN maxd
),
vocab AS (
  SELECT cp.k, cp.cutoff,
         CAST((SELECT COUNT(*) FROM firsts WHERE first_doc <= cp.cutoff)
              AS BIGINT) AS v,
         CAST((SELECT COUNT(*) FROM tok WHERE doc_id <= cp.cutoff)
              AS BIGINT) AS n_tokens
  FROM cp
)
SELECT k, cutoff, n_tokens, v,
       ROUND(CAST(v AS DOUBLE) / n_tokens, 6) AS type_token_ratio
FROM vocab
"""


@register("text_heaps_law", _heaps_oracle())
def text_heaps_law(spark, sf_dir):
    """Heaps'-law vocabulary growth curve: distinct-vocabulary size
    at 10 corpus prefixes (by doc_id), computed in ONE token pass —
    each token's FIRST-occurrence document is a single groupBy, and
    V(prefix) is just how many first occurrences fall inside it (no
    per-prefix rescans, the cumulative-distinct trick). Emits the
    (corpus tokens, vocabulary, type-token ratio) curve per
    checkpoint; sublinear growth (Heaps' β < 1) is pinned in tests.
    All counts integer-exact."""
    from stockify_spark.functions.text import tokens

    docs = _t(spark, sf_dir, "documents")
    tok = docs.select("doc_id", F.explode(tokens("text")).alias("tok"))
    firsts = tok.groupBy("tok").agg(F.min("doc_id").alias("first_doc"))
    md = docs.agg(F.max("doc_id").alias("md")).collect()[0].md
    cuts = [
        (k + 1, int(math.floor((k + 1) / _HEAPS_CHECKPOINTS * (md + 1))) - 1)
        for k in range(_HEAPS_CHECKPOINTS)
    ]
    cp = docs.sparkSession.createDataFrame(cuts, "k long, cutoff long")
    v = (
        cp.join(firsts, firsts["first_doc"] <= cp["cutoff"])
        .groupBy("k", "cutoff")
        .agg(F.count(F.lit(1)).alias("v"))
    )
    nt = (
        cp.join(tok, tok["doc_id"] <= cp["cutoff"])
        .groupBy("k", "cutoff")
        .agg(F.count(F.lit(1)).alias("n_tokens"))
    )
    return (
        v.join(nt, ["k", "cutoff"])
        .select(
            "k",
            "cutoff",
            F.col("n_tokens").cast("long").alias("n_tokens"),
            F.col("v").cast("long").alias("v"),
            F.round(F.col("v").cast("double") / F.col("n_tokens"), 6).alias(
                "type_token_ratio"
            ),
        )
    )
