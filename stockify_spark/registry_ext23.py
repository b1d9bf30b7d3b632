"""Round-8 extension wave 12: bitmap-exact distincts, encoding
round-trips, and rescaled-range (Hurst) analysis.

The bitmap aggregation is the Druid/ClickHouse exact-distinct trick
as pure column algebra: pack user ids into 63-bit words with
shift/bit_or/bit_count — integer-exact at any scale, mergeable by
OR, and the query VERIFIES itself against COUNT(DISTINCT). Hurst R/S
is the fractal-analysis window composition (chunked cumulative-range
over std, log-log OLS slope across three chunk sizes)."""

from __future__ import annotations

import math

from pyspark.sql import Window
from pyspark.sql import functions as F

from stockify_spark.registry import register, _t

_BITMAP_SQL = """
WITH words AS (
  SELECT event_type, user_id // 63 AS word,
         bit_or(1::BIGINT << CAST(user_id % 63 AS INT)) AS bits
  FROM events GROUP BY 1, 2
),
bm AS (
  SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n_words,
         CAST(SUM(bit_count(bits)) AS BIGINT) AS bitmap_distinct
  FROM words GROUP BY 1
),
ex AS (
  SELECT event_type, COUNT(DISTINCT user_id) AS exact_distinct
  FROM events GROUP BY 1
)
SELECT bm.event_type, bm.n_words, bm.bitmap_distinct, ex.exact_distinct,
       bm.bitmap_distinct = ex.exact_distinct AS bitmap_matches
FROM bm JOIN ex ON ex.event_type = bm.event_type
"""


@register("agg_bitmap_distinct", _BITMAP_SQL)
def agg_bitmap_distinct(spark, sf_dir):
    """Exact distinct users per event type via bitmap words: ids pack
    into 63-bit words (word = id div 63, bit = id mod 63 — bit 63
    avoided so the shift never overflows the signed range on either
    engine), OR-merged per (type, word), popcounted and summed. The
    bitmap is integer-exact and OR-mergeable — each executor can own
    word ranges and a single reduce combines them, the roaring-style
    distinct-count shape — and the query verifies itself against
    COUNT(DISTINCT) in the same result (bitmap_matches must be true
    on every row)."""
    ev = _t(spark, sf_dir, "events")
    words = ev.groupBy(
        "event_type", (F.col("user_id") / 63).cast("long").alias("word")
    ).agg(
        # python F.shiftleft only takes a literal bit count; the SQL
        # form accepts a column expression for it
        F.bit_or(F.expr("shiftleft(1L, cast(user_id % 63 as int))")).alias("bits")
    )
    bm = words.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n_words"),
        F.sum(F.bit_count("bits")).cast("long").alias("bitmap_distinct"),
    )
    ex = ev.groupBy("event_type").agg(
        F.countDistinct("user_id").alias("exact_distinct")
    )
    return bm.join(ex, "event_type").select(
        "event_type",
        "n_words",
        "bitmap_distinct",
        "exact_distinct",
        (F.col("bitmap_distinct") == F.col("exact_distinct")).alias("bitmap_matches"),
    )


_B64_SQL = """
SELECT c_custkey,
       base64(encode(c_name)) AS name_b64,
       decode(from_base64(base64(encode(c_name)))) AS name_back,
       hex(c_mktsegment) AS segment_hex,
       decode(from_base64(base64(encode(c_name)))) = c_name AS roundtrip_ok
FROM customer WHERE c_custkey % 100 = 0
"""


@register("fn_base64_roundtrip", _B64_SQL)
def fn_base64_roundtrip(spark, sf_dir):
    """Binary-encoding surface: base64 encode → decode round-trip on
    customer names (must equal the input on every row) plus hex of
    the UTF-8 segment bytes — the wire-format functions an engine's
    function library owes its users. Pure column expressions."""
    cust = _t(spark, sf_dir, "customer").filter(F.col("c_custkey") % 100 == 0)
    b64 = F.base64(F.col("c_name").cast("binary"))
    back = F.unbase64(b64).cast("string")
    return cust.select(
        "c_custkey",
        b64.alias("name_b64"),
        back.alias("name_back"),
        F.hex(F.col("c_mktsegment").cast("binary")).alias("segment_hex"),
        (back == F.col("c_name")).alias("roundtrip_ok"),
    )


_N_ROWS = 1800
_SERIES_LEN = 180
_CHUNKS = (18, 45, 90)


def _hurst_oracle() -> str:
    blocks = []
    for n in _CHUNKS:
        blocks.append(
            f"""
rs{n} AS (
  SELECT symbol, AVG(r / s) AS rs
  FROM (
    SELECT symbol, chunk, MAX(z) - MIN(z) AS r,
           sqrt(SUM(d * d) / {n}.0) AS s
    FROM (
      SELECT symbol, chunk, pos, d,
             SUM(d) OVER (PARTITION BY symbol, chunk ORDER BY pos
                          ROWS UNBOUNDED PRECEDING) AS z
      FROM (
        SELECT symbol, pos // {n} AS chunk, pos,
               close - AVG(close) OVER (PARTITION BY symbol, pos // {n}) AS d
        FROM base
      )
    )
    GROUP BY symbol, chunk
  )
  GROUP BY symbol
)"""
        )
    lns = [math.log(float(n)) for n in _CHUNKS]
    um = sum(lns) / 3.0
    du = [u - um for u in lns]
    suu = sum(x * x for x in du)
    # slope = Σ (u_i - ū) ln(rs_i) / Σ (u_i - ū)²  (v̄ term cancels)
    num = " + ".join(
        f"CAST({du[i]!r} AS DOUBLE) * ln(rs{n}.rs)" for i, n in enumerate(_CHUNKS)
    )
    return f"""
WITH stocks AS (
  SELECT i AS row_id, CAST(500 + (i % 18) * 10 AS DOUBLE) AS close
  FROM range({_N_ROWS}) t(i)
),
base AS (SELECT row_id // {_SERIES_LEN} AS symbol,
                row_id % {_SERIES_LEN} AS pos, close
         FROM stocks),
{",".join(blocks)}
SELECT CAST(rs18.symbol AS BIGINT) AS symbol,
       ROUND(rs18.rs, 6) AS rs_18, ROUND(rs45.rs, 6) AS rs_45,
       ROUND(rs90.rs, 6) AS rs_90,
       ROUND(({num}) / CAST({suu!r} AS DOUBLE), 6) AS hurst
FROM rs18 JOIN rs45 ON rs45.symbol = rs18.symbol
JOIN rs90 ON rs90.symbol = rs18.symbol
"""


@register("window_hurst_rs", _hurst_oracle())
def window_hurst_rs(spark, sf_dir):
    """Rescaled-range (Hurst) analysis per series: for chunk sizes
    18/45/90, each chunk's range of the mean-adjusted cumulative sum
    over its population std, averaged per size; the Hurst exponent is
    the log-log OLS slope across the three sizes (the ln(n) design
    constants and centered weights are Python literals shared by both
    faces — the literal-weight pattern). A periodic sawtooth is
    strongly mean-reverting, so H lands well below 0.5 — pinned in
    tests. All heavy arithmetic is chunk-local window algebra; chunks
    partition by (symbol, chunk) so series count x chunk count is the
    parallelism axis."""
    from functools import reduce

    from stockify_spark.sources.fixtures import stocks_ramp

    base = stocks_ramp(spark, cycles=100).select(
        (F.col("row_id") / _SERIES_LEN).cast("long").alias("symbol"),
        (F.col("row_id") % _SERIES_LEN).cast("long").alias("pos"),
        "close",
    )
    rs_frames = []
    for n in _CHUNKS:
        chunk = (F.col("pos") / n).cast("long").alias("chunk")
        wmean = Window.partitionBy("symbol", "chunk")
        wcum = Window.partitionBy("symbol", "chunk").orderBy("pos").rowsBetween(
            Window.unboundedPreceding, 0
        )
        d = base.select("symbol", chunk, "pos", "close").select(
            "symbol", "chunk", "pos",
            (F.col("close") - F.avg("close").over(wmean)).alias("d"),
        )
        z = d.withColumn("z", F.sum("d").over(wcum))
        per_chunk = z.groupBy("symbol", "chunk").agg(
            (F.max("z") - F.min("z")).alias("r"),
            F.sqrt(F.sum(F.col("d") * F.col("d")) / float(n)).alias("s"),
        )
        rs_frames.append(
            per_chunk.groupBy("symbol").agg(
                F.avg(F.col("r") / F.col("s")).alias(f"rs_{n}")
            )
        )
    joined = reduce(lambda x, y: x.join(y, "symbol"), rs_frames)
    lns = [math.log(float(n)) for n in _CHUNKS]
    um = sum(lns) / 3.0
    du = [u - um for u in lns]
    suu = sum(x * x for x in du)
    num = None
    for i, n in enumerate(_CHUNKS):
        term = F.lit(du[i]) * F.log(F.col(f"rs_{n}"))
        num = term if num is None else num + term
    return joined.select(
        "symbol",
        F.round("rs_18", 6).alias("rs_18"),
        F.round("rs_45", 6).alias("rs_45"),
        F.round("rs_90", 6).alias("rs_90"),
        F.round(num / F.lit(suu), 6).alias("hurst"),
    )
