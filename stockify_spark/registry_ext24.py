"""Round-8 extension wave 13: pivot levels, closed-form detrending,
Zipf-law fitting, and edit-distance function parity.

Pivot points and detrending finish the reference-domain toolkit on
pure window/moment algebra (integer-exact sums, the ext17 rule); the
Zipf fit applies the literal-design-row OLS trick (Hurst/Goertzel)
to corpus rank-frequency statistics; fn_levenshtein pins the scalar
edit-distance builtin both engines ship (the primitive under
join_typo_names' banded join) against each other."""

from __future__ import annotations

import math

from pyspark.sql import Window
from pyspark.sql import functions as F

from stockify_spark.registry import register, _t

_N_ROWS = 1800
_SERIES_LEN = 180

_PIVOT_SQL = f"""
WITH stocks AS (
  SELECT i AS row_id,
         CAST(510 + (i % 18) * 10 AS DOUBLE) AS high,
         CAST(440 + (i % 18) * 10 AS DOUBLE) AS low,
         CAST(500 + (i % 18) * 10 AS DOUBLE) AS close
  FROM range({_N_ROWS}) t(i)
),
prev AS (
  SELECT row_id,
         lag(high) OVER w AS ph, lag(low) OVER w AS pl, lag(close) OVER w AS pc
  FROM stocks WINDOW w AS (ORDER BY row_id)
)
SELECT row_id,
       ROUND((ph + pl + pc) / 3, 6) AS pivot,
       ROUND(2 * ((ph + pl + pc) / 3) - pl, 6) AS r1,
       ROUND(2 * ((ph + pl + pc) / 3) - ph, 6) AS s1,
       ROUND((ph + pl + pc) / 3 + (ph - pl), 6) AS r2,
       ROUND((ph + pl + pc) / 3 - (ph - pl), 6) AS s2
FROM prev WHERE ph IS NOT NULL
"""


@register("stocks_pivot_points", _PIVOT_SQL)
def stocks_pivot_points(spark, sf_dir):
    """Floor-trader pivot levels from the prior bar: P = (H+L+C)/3,
    R1/S1 = 2P − L/H, R2/S2 = P ± (H − L). Pure lag arithmetic on
    exact decimals — identical IEEE chains, first row excluded by
    the shared NOT-NULL gate. Completes the reference domain's
    support/resistance toolkit; 1-part parity convention."""
    from stockify_spark.sources.fixtures import stocks_ramp

    s = stocks_ramp(spark, cycles=100)
    w = Window.orderBy("row_id")
    ph, pl, pc = (F.lag(c).over(w) for c in ("high", "low", "close"))
    base = s.select(
        "row_id", ph.alias("ph"), pl.alias("pl"), pc.alias("pc")
    ).filter(F.col("ph").isNotNull())
    p = (F.col("ph") + F.col("pl") + F.col("pc")) / 3
    return base.select(
        "row_id",
        F.round(p, 6).alias("pivot"),
        F.round(2 * p - F.col("pl"), 6).alias("r1"),
        F.round(2 * p - F.col("ph"), 6).alias("s1"),
        F.round(p + (F.col("ph") - F.col("pl")), 6).alias("r2"),
        F.round(p - (F.col("ph") - F.col("pl")), 6).alias("s2"),
    )


_DETREND_SQL = f"""
WITH stocks AS (
  SELECT i AS row_id, CAST(500 + (i % 18) * 10 AS DOUBLE) AS close
  FROM range({_N_ROWS}) t(i)
),
base AS (SELECT row_id // {_SERIES_LEN} AS symbol,
                row_id % {_SERIES_LEN} AS pos, close
         FROM stocks),
m AS (
  SELECT symbol,
         CAST(COUNT(*) AS DOUBLE) AS n,
         CAST(SUM(pos) AS DOUBLE) AS sx,
         CAST(SUM(pos * pos) AS DOUBLE) AS sxx,
         SUM(close) AS sy, SUM(pos * close) AS sxy,
         SUM(close * close) AS syy
  FROM base GROUP BY symbol
),
fit AS (
  SELECT symbol, n, sx, sxx, sy, sxy, syy,
         (n * sxy - sx * sy) / (n * sxx - sx * sx) AS slope,
         (sy - (n * sxy - sx * sy) / (n * sxx - sx * sx) * sx) / n AS intercept
  FROM m
)
SELECT b.symbol::BIGINT AS symbol, b.pos::BIGINT AS pos,
       ROUND(b.close - (f.intercept + f.slope * b.pos), 6) AS residual,
       ROUND(f.slope, 6) AS slope,
       ROUND(CASE WHEN f.syy - f.sy * f.sy / f.n = 0 THEN 1.0
                  ELSE (f.slope * f.slope * (f.sxx - f.sx * f.sx / f.n))
                       / (f.syy - f.sy * f.sy / f.n) END, 6) AS r2
FROM base b JOIN fit f ON f.symbol = b.symbol
"""


@register("window_linear_detrend", _DETREND_SQL)
def window_linear_detrend(spark, sf_dir):
    """Per-series linear detrend: OLS of close on position in closed
    form from one moment pass (all sums integer-valued-exact below
    2^53 — the registry_ext17 rule), then the residual series plus
    slope and R². The fit BROADCASTS back onto the rows — the
    de-seasonalization preprocessing shape for any per-key trend
    removal at scale: one aggregation, one broadcast join, no
    iteration."""
    from stockify_spark.sources.fixtures import stocks_ramp

    base = stocks_ramp(spark, cycles=100).select(
        (F.col("row_id") / _SERIES_LEN).cast("long").alias("symbol"),
        (F.col("row_id") % _SERIES_LEN).cast("long").alias("pos"),
        "close",
    )
    m = base.groupBy("symbol").agg(
        F.count(F.lit(1)).cast("double").alias("n"),
        F.sum("pos").cast("double").alias("sx"),
        F.sum(F.col("pos") * F.col("pos")).cast("double").alias("sxx"),
        F.sum("close").alias("sy"),
        F.sum(F.col("pos") * F.col("close")).alias("sxy"),
        F.sum(F.col("close") * F.col("close")).alias("syy"),
    )
    c = F.col
    slope = (c("n") * c("sxy") - c("sx") * c("sy")) / (
        c("n") * c("sxx") - c("sx") * c("sx")
    )
    fit = m.select(
        "symbol", "n", "sx", "sxx", "sy", "syy",
        slope.alias("slope"),
        ((c("sy") - slope * c("sx")) / c("n")).alias("intercept"),
    )
    sst = c("syy") - c("sy") * c("sy") / c("n")
    ssr = c("slope") * c("slope") * (c("sxx") - c("sx") * c("sx") / c("n"))
    return base.join(F.broadcast(fit), "symbol").select(
        "symbol",
        "pos",
        F.round(
            c("close") - (c("intercept") + c("slope") * c("pos")), 6
        ).alias("residual"),
        F.round("slope", 6).alias("slope"),
        F.round(
            F.when(sst == 0, F.lit(1.0)).otherwise(ssr / sst), 6
        ).alias("r2"),
    )


_ZIPF_TOP = 50
_TOKS24 = "string_split_regex(trim(lower(text)), '\\s+')"


def _zipf_oracle() -> str:
    lns = [math.log(float(r)) for r in range(1, _ZIPF_TOP + 1)]
    um = sum(lns) / _ZIPF_TOP
    du = {r: lns[r - 1] - um for r in range(1, _ZIPF_TOP + 1)}
    suu = sum(x * x for x in du.values())
    case = " ".join(
        f"WHEN {r} THEN CAST({du[r]!r} AS DOUBLE)" for r in range(1, _ZIPF_TOP + 1)
    )
    return f"""
WITH tok AS (SELECT unnest({_TOKS24}) AS tok FROM documents),
freq AS (SELECT tok, COUNT(*) AS f FROM tok GROUP BY tok),
ranked AS (
  SELECT tok, f,
         row_number() OVER (ORDER BY f DESC, tok) AS rank
  FROM freq
)
SELECT CAST({_ZIPF_TOP} AS BIGINT) AS n_ranks,
       ROUND(SUM((CASE rank {case} END) * ln(CAST(f AS DOUBLE)))
             / CAST({suu!r} AS DOUBLE), 6) AS zipf_slope,
       CAST(MAX(CASE WHEN rank = 1 THEN f END) AS BIGINT) AS top_freq
FROM ranked WHERE rank <= {_ZIPF_TOP}
"""


@register("text_zipf_fit", _zipf_oracle())
def text_zipf_fit(spark, sf_dir):
    """Zipf-law fit over the corpus rank-frequency curve: OLS slope
    of ln(frequency) on ln(rank) for the top 50 tokens (rank ties
    broken by token text on both faces). The centered ln(rank)
    design weights are Python literals shared by both engines (the
    literal-design-row pattern — the only per-row transcendental is
    ln(f) on identical integer counts). A natural corpus obeys slope
    ≈ −1; the synthetic corpus's flatter slope is pinned in tests.
    One vocabulary shuffle + a 50-row reduce."""
    from stockify_spark.functions.text import tokens

    docs = _t(spark, sf_dir, "documents")
    freq = (
        docs.select(F.explode(tokens("text")).alias("tok"))
        .groupBy("tok")
        .agg(F.count(F.lit(1)).alias("f"))
    )
    ranked = freq.withColumn(
        "rank", F.row_number().over(Window.orderBy(F.col("f").desc(), F.col("tok")))
    ).filter(F.col("rank") <= _ZIPF_TOP)
    lns = [math.log(float(r)) for r in range(1, _ZIPF_TOP + 1)]
    um = sum(lns) / _ZIPF_TOP
    du = {r: lns[r - 1] - um for r in range(1, _ZIPF_TOP + 1)}
    suu = sum(x * x for x in du.values())
    w = F.when(F.col("rank") == 1, F.lit(du[1]))
    for r in range(2, _ZIPF_TOP + 1):
        w = w.when(F.col("rank") == r, F.lit(du[r]))
    return ranked.agg(
        F.lit(_ZIPF_TOP).cast("long").alias("n_ranks"),
        F.round(
            F.sum(w * F.log(F.col("f").cast("double"))) / F.lit(suu), 6
        ).alias("zipf_slope"),
        F.max(F.when(F.col("rank") == 1, F.col("f"))).cast("long").alias("top_freq"),
    )


_LEV_SQL = """
SELECT p.p_partkey,
       levenshtein(p.p_name, p2.p_name) AS dist,
       length(p.p_name) AS len_a, length(p2.p_name) AS len_b
FROM part p JOIN part p2 ON p2.p_partkey = p.p_partkey + 1
WHERE p.p_partkey % 50 = 0
"""


@register("fn_levenshtein", _LEV_SQL)
def fn_levenshtein(spark, sf_dir):
    """Scalar edit-distance parity: both engines ship a builtin
    levenshtein — this pins them against each other on real part
    names (the primitive join_typo_names' FastSS banding
    accelerates). Integer output, map-side join on adjacent keys."""
    part = _t(spark, sf_dir, "part")
    a = part.filter(F.col("p_partkey") % 50 == 0).select(
        "p_partkey", F.col("p_name").alias("name_a")
    )
    b = part.select(
        (F.col("p_partkey") - 1).alias("p_partkey"), F.col("p_name").alias("name_b")
    )
    return a.join(b, "p_partkey").select(
        "p_partkey",
        F.levenshtein("name_a", "name_b").alias("dist"),
        F.length("name_a").alias("len_a"),
        F.length("name_b").alias("len_b"),
    )
