"""Round-8 extension wave 3: sequential-state recursions.

The EWMA family is the one window shape Catalyst genuinely cannot
express: ema_t = a*x_t + (1-a)*ema_{t-1} has unbounded dependency
depth, so window_ewma (registry_ext9) ships the TRUNCATED
lag-expansion approximation. These queries ship the EXACT recursion
instead, with the honest Spark shape for per-key sequential state:
``applyInPandas`` — distributed ACROSS series (each executor owns
whole series), an Arrow-batched float64 loop WITHIN a series. The
oracle is a DuckDB RECURSIVE CTE stepping the identical recurrence,
so both engines evaluate the same IEEE expression chain
(a*x + (1-a)*prev, same literal alphas, same association) and the
match is exact before the 6dp display rounding.

This is custom-operator tier (c) from the build rules made
first-class: semantics Spark's built-ins can't reach, implemented as
per-group Arrow state rather than a driver loop — at 100 TB the
parallelism is the number of series (symbols), the classic
time-series layout."""

from __future__ import annotations

from stockify_spark.registry import register

_N_ROWS = 1800
_SERIES_LEN = 180

_EMA_SQL = f"""
WITH RECURSIVE stocks AS (
  SELECT i AS row_id, CAST(500 + (i % 18) * 10 AS DOUBLE) AS close
  FROM range({_N_ROWS}) t(i)
),
base AS (SELECT row_id // {_SERIES_LEN} AS symbol,
                row_id % {_SERIES_LEN} AS pos, close
         FROM stocks),
r AS (
  SELECT symbol, pos, close, close AS ema FROM base WHERE pos = 0
  UNION ALL
  SELECT b.symbol, b.pos, b.close, 0.2 * b.close + 0.8 * r.ema
  FROM r JOIN base b ON b.symbol = r.symbol AND b.pos = r.pos + 1
)
SELECT CAST(symbol AS BIGINT) AS symbol, CAST(pos AS BIGINT) AS pos,
       ROUND(ema, 6) AS ema
FROM r
"""


@register("window_ema_exact", _EMA_SQL)
def window_ema_exact(spark, sf_dir):
    """Exact (non-truncated) EMA, alpha = 0.2, seeded at the first
    close of each series — the recursion window_ewma can only
    approximate. The ramp is split into 10 series of 180 rows
    (symbol = row_id // 180); each series is one applyInPandas
    group: a float64 loop computing 0.2*c + 0.8*prev, the same
    literal expression the oracle's recursive CTE steps, so the
    match is bit-level before rounding. One shuffle on symbol;
    series parallelism is the scale axis."""
    import pandas as pd

    from pyspark.sql import functions as F

    from stockify_spark.sources.fixtures import stocks_ramp

    s = stocks_ramp(spark, cycles=100).select(
        (F.col("row_id") / _SERIES_LEN).cast("long").alias("symbol"),
        (F.col("row_id") % _SERIES_LEN).cast("long").alias("pos"),
        "close",
    )

    def ema_series(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values("pos").reset_index(drop=True)
        closes = pdf["close"].to_numpy()
        out = closes.copy()
        for t in range(1, len(out)):
            out[t] = 0.2 * closes[t] + 0.8 * out[t - 1]
        return pd.DataFrame(
            {"symbol": pdf["symbol"], "pos": pdf["pos"], "ema": out}
        )

    res = s.groupBy("symbol").applyInPandas(
        ema_series, schema="symbol long, pos long, ema double"
    )
    return res.select("symbol", "pos", F.round("ema", 6).alias("ema"))


_MACD_SQL = f"""
WITH RECURSIVE stocks AS (
  SELECT i AS row_id, CAST(500 + (i % 18) * 10 AS DOUBLE) AS close
  FROM range({_N_ROWS}) t(i)
),
base AS (SELECT row_id // {_SERIES_LEN} AS symbol,
                row_id % {_SERIES_LEN} AS pos, close
         FROM stocks),
r AS (
  SELECT symbol, pos, close,
         close AS e12, close AS e26,
         CAST(0 AS DOUBLE) AS macd, CAST(0 AS DOUBLE) AS sig
  FROM base WHERE pos = 0
  UNION ALL
  SELECT b.symbol, b.pos, b.close,
         (2.0 / 13.0) * b.close + (1.0 - 2.0 / 13.0) * r.e12,
         (2.0 / 27.0) * b.close + (1.0 - 2.0 / 27.0) * r.e26,
         ((2.0 / 13.0) * b.close + (1.0 - 2.0 / 13.0) * r.e12)
           - ((2.0 / 27.0) * b.close + (1.0 - 2.0 / 27.0) * r.e26),
         (2.0 / 10.0) * (((2.0 / 13.0) * b.close
                          + (1.0 - 2.0 / 13.0) * r.e12)
                         - ((2.0 / 27.0) * b.close
                            + (1.0 - 2.0 / 27.0) * r.e26))
           + (1.0 - 2.0 / 10.0) * r.sig
  FROM r JOIN base b ON b.symbol = r.symbol AND b.pos = r.pos + 1
)
SELECT CAST(symbol AS BIGINT) AS symbol, CAST(pos AS BIGINT) AS pos,
       ROUND(macd, 6) AS macd, ROUND(sig, 6) AS signal_line,
       ROUND(macd - sig, 6) AS histogram
FROM r
"""


@register("stocks_macd", _MACD_SQL)
def stocks_macd(spark, sf_dir):
    """MACD(12, 26, 9) with exact recursive EMAs: macd = EMA12 -
    EMA26 of close, signal = EMA9 of macd, histogram = macd -
    signal — the reference domain's flagship composite indicator,
    three coupled recursions carried in one state pass. Both EMAs
    seed at the first close (macd_0 = signal_0 = 0); alphas are the
    literal expressions 2/13, 2/27, 2/10 on BOTH faces so the IEEE
    chains agree exactly. Same applyInPandas-per-series shape as
    window_ema_exact; the oracle's recursive CTE carries the
    4-tuple state through the identical recurrence."""
    import pandas as pd

    from pyspark.sql import functions as F

    from stockify_spark.sources.fixtures import stocks_ramp

    s = stocks_ramp(spark, cycles=100).select(
        (F.col("row_id") / _SERIES_LEN).cast("long").alias("symbol"),
        (F.col("row_id") % _SERIES_LEN).cast("long").alias("pos"),
        "close",
    )

    def macd_series(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values("pos").reset_index(drop=True)
        closes = pdf["close"].to_numpy()
        n = len(closes)
        macd = [0.0] * n
        sig = [0.0] * n
        e12 = closes[0]
        e26 = closes[0]
        prev_sig = 0.0
        for t in range(1, n):
            c = closes[t]
            e12 = (2.0 / 13.0) * c + (1.0 - 2.0 / 13.0) * e12
            e26 = (2.0 / 27.0) * c + (1.0 - 2.0 / 27.0) * e26
            macd[t] = e12 - e26
            prev_sig = (2.0 / 10.0) * macd[t] + (1.0 - 2.0 / 10.0) * prev_sig
            sig[t] = prev_sig
        return pd.DataFrame(
            {
                "symbol": pdf["symbol"],
                "pos": pdf["pos"],
                "macd": macd,
                "sig": sig,
            }
        )

    res = s.groupBy("symbol").applyInPandas(
        macd_series, schema="symbol long, pos long, macd double, sig double"
    )
    return res.select(
        "symbol",
        "pos",
        F.round("macd", 6).alias("macd"),
        F.round("sig", 6).alias("signal_line"),
        F.round(F.col("macd") - F.col("sig"), 6).alias("histogram"),
    )
