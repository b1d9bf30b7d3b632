"""Round-8 extension wave 4: technical-indicator completion, a
multinomial text classifier, and asymmetric containment dedup.

The indicator rows finish the reference domain's standard toolkit
(the reference computes rolling windows over OHLCV, stockify.cu:
142-193,513-634 — these are the composite indicators practitioners
derive from the same columns): Heikin-Ashi candles and Wilder's ADX
are sequential-state recursions (the ``applyInPandas``-per-series /
recursive-CTE pattern registry_ext14 established), CCI needs a
frame-local re-aggregation (mean absolute deviation around the
frame's OWN mean — a two-pass window Catalyst can't fuse, expressed
as an ordered list fold so both engines add in the same IEEE order),
and MFI is conditional bounded-frame sums. The two corpus ops extend
the LLM-pipeline surface: multinomial Naive Bayes is the classic
counts-only distributed text classifier (model = two broadcastable
aggregate tables), and shingle containment is the near-dup relation
Jaccard misses (excerpt/boilerplate inclusion)."""

from __future__ import annotations

from stockify_spark.registry import register

_N_ROWS = 1800
_SERIES_LEN = 180

# the deterministic ramp (sources/fixtures.stocks_ramp) regenerated
# in SQL: i % 18 positions map to the reference's OHLCV constants
_RAMP_OHLCV = f"""
  SELECT i AS row_id,
         CAST(450 + (i % 18) * 10 AS DOUBLE) AS open,
         CAST(510 + (i % 18) * 10 AS DOUBLE) AS high,
         CAST(440 + (i % 18) * 10 AS DOUBLE) AS low,
         CAST(500 + (i % 18) * 10 AS DOUBLE) AS close,
         CAST(1200000 + (i % 18) * 100000 AS DOUBLE) AS volume
  FROM range({_N_ROWS}) t(i)
"""

_HA_SQL = f"""
WITH RECURSIVE stocks AS ({_RAMP_OHLCV}),
base AS (SELECT row_id // {_SERIES_LEN} AS symbol,
                row_id % {_SERIES_LEN} AS pos, open, high, low, close
         FROM stocks),
r AS (
  SELECT symbol, pos, open, high, low, close,
         (open + close) / 2 AS ha_open,
         (open + high + low + close) / 4 AS ha_close
  FROM base WHERE pos = 0
  UNION ALL
  SELECT b.symbol, b.pos, b.open, b.high, b.low, b.close,
         (r.ha_open + r.ha_close) / 2,
         (b.open + b.high + b.low + b.close) / 4
  FROM r JOIN base b ON b.symbol = r.symbol AND b.pos = r.pos + 1
)
SELECT CAST(symbol AS BIGINT) AS symbol, CAST(pos AS BIGINT) AS pos,
       ROUND(ha_open, 6) AS ha_open, ROUND(ha_close, 6) AS ha_close,
       ROUND(GREATEST(high, ha_open, ha_close), 6) AS ha_high,
       ROUND(LEAST(low, ha_open, ha_close), 6) AS ha_low
FROM r
"""


@register("stocks_heikin_ashi", _HA_SQL)
def stocks_heikin_ashi(spark, sf_dir):
    """Heikin-Ashi candle transform — the smoothed-candle recursion:
    ha_close = (o+h+l+c)/4 pointwise, but ha_open_t =
    (ha_open_{t-1} + ha_close_{t-1})/2 carries unbounded sequential
    state, seeded (open_0+close_0)/2. Same shape as window_ema_exact
    (registry_ext14): ``applyInPandas`` per series — distributed
    across symbols, a float64 loop within one — against a recursive
    CTE stepping the identical IEEE expressions, so the match is
    exact before 6dp rounding. ha_high/ha_low are stateless
    GREATEST/LEAST over (raw extreme, ha_open, ha_close)."""
    import pandas as pd

    from pyspark.sql import functions as F

    from stockify_spark.sources.fixtures import stocks_ramp

    s = stocks_ramp(spark, cycles=100).select(
        (F.col("row_id") / _SERIES_LEN).cast("long").alias("symbol"),
        (F.col("row_id") % _SERIES_LEN).cast("long").alias("pos"),
        "open", "high", "low", "close",
    )

    def ha_series(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values("pos").reset_index(drop=True)
        o = pdf["open"].to_numpy()
        h = pdf["high"].to_numpy()
        lo = pdf["low"].to_numpy()
        c = pdf["close"].to_numpy()
        n = len(c)
        ha_open = [0.0] * n
        ha_close = [0.0] * n
        ha_open[0] = (o[0] + c[0]) / 2
        ha_close[0] = (o[0] + h[0] + lo[0] + c[0]) / 4
        for t in range(1, n):
            ha_open[t] = (ha_open[t - 1] + ha_close[t - 1]) / 2
            ha_close[t] = (o[t] + h[t] + lo[t] + c[t]) / 4
        return pd.DataFrame(
            {
                "symbol": pdf["symbol"],
                "pos": pdf["pos"],
                "high": h,
                "low": lo,
                "ha_open": ha_open,
                "ha_close": ha_close,
            }
        )

    res = s.groupBy("symbol").applyInPandas(
        ha_series,
        schema="symbol long, pos long, high double, low double,"
        " ha_open double, ha_close double",
    )
    return res.select(
        "symbol",
        "pos",
        F.round("ha_open", 6).alias("ha_open"),
        F.round("ha_close", 6).alias("ha_close"),
        F.round(F.greatest("high", "ha_open", "ha_close"), 6).alias("ha_high"),
        F.round(F.least("low", "ha_open", "ha_close"), 6).alias("ha_low"),
    )


_ADX_SQL = f"""
WITH RECURSIVE stocks AS ({_RAMP_OHLCV}),
base AS (SELECT row_id // {_SERIES_LEN} AS symbol,
                row_id % {_SERIES_LEN} AS pos, close, high, low
         FROM stocks),
sm AS (
  SELECT symbol, pos, close, high, low,
         high - low AS e_tr, CAST(0 AS DOUBLE) AS e_p, CAST(0 AS DOUBLE) AS e_n
  FROM base WHERE pos = 0
  UNION ALL
  SELECT b.symbol, b.pos, b.close, b.high, b.low,
         r.e_tr + (GREATEST(b.high - b.low, ABS(b.high - r.close),
                            ABS(b.low - r.close)) - r.e_tr) / 14.0,
         r.e_p + ((CASE WHEN b.high - r.high > r.low - b.low
                             AND b.high - r.high > 0
                        THEN b.high - r.high ELSE 0 END) - r.e_p) / 14.0,
         r.e_n + ((CASE WHEN r.low - b.low > b.high - r.high
                             AND r.low - b.low > 0
                        THEN r.low - b.low ELSE 0 END) - r.e_n) / 14.0
  FROM sm r JOIN base b ON b.symbol = r.symbol AND b.pos = r.pos + 1
),
dx AS (
  SELECT symbol, pos,
         100.0 * e_p / e_tr AS di_p,
         100.0 * e_n / e_tr AS di_n,
         CASE WHEN 100.0 * e_p / e_tr + 100.0 * e_n / e_tr = 0 THEN 0.0
              ELSE 100.0 * ABS(100.0 * e_p / e_tr - 100.0 * e_n / e_tr)
                   / (100.0 * e_p / e_tr + 100.0 * e_n / e_tr) END AS dx
  FROM sm
),
adx AS (
  SELECT symbol, pos, di_p, di_n, dx, CAST(0 AS DOUBLE) AS adx
  FROM dx WHERE pos = 0
  UNION ALL
  SELECT d.symbol, d.pos, d.di_p, d.di_n, d.dx, r.adx + (d.dx - r.adx) / 14.0
  FROM adx r JOIN dx d ON d.symbol = r.symbol AND d.pos = r.pos + 1
)
SELECT CAST(symbol AS BIGINT) AS symbol, CAST(pos AS BIGINT) AS pos,
       ROUND(di_p, 6) AS di_plus, ROUND(di_n, 6) AS di_minus,
       ROUND(adx, 6) AS adx
FROM adx
"""


@register("stocks_adx", _ADX_SQL)
def stocks_adx(spark, sf_dir):
    """Wilder's ADX(14): directional movement (+DM/-DM with the
    strict greater-and-positive gating), true range, Wilder
    smoothing s_t = s_{t-1} + (x_t - s_{t-1})/14 seeded at the first
    value (TR) / zero (DMs), DI± = 100*s_dm/s_tr, DX =
    100*|DI+ - DI-|/(DI+ + DI-) guarded at zero, and ADX as the
    Wilder recursion over DX. Three coupled smoothers + one
    dependent smoother — carried in a single applyInPandas state
    pass per series; the oracle chains TWO recursive CTEs (the
    e_tr/e_p/e_n tuple, then ADX over the derived DX column) through
    the same literal IEEE expressions. Extends the reference's
    rolling-extrema family (stockify.cu:142-193) with its canonical
    trend-strength composite."""
    import pandas as pd

    from pyspark.sql import functions as F

    from stockify_spark.sources.fixtures import stocks_ramp

    s = stocks_ramp(spark, cycles=100).select(
        (F.col("row_id") / _SERIES_LEN).cast("long").alias("symbol"),
        (F.col("row_id") % _SERIES_LEN).cast("long").alias("pos"),
        "close", "high", "low",
    )

    def adx_series(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values("pos").reset_index(drop=True)
        h = pdf["high"].to_numpy()
        lo = pdf["low"].to_numpy()
        c = pdf["close"].to_numpy()
        n = len(c)
        di_p = [0.0] * n
        di_n = [0.0] * n
        adx_o = [0.0] * n
        e_tr = h[0] - lo[0]
        e_p = 0.0
        e_n = 0.0
        adx = 0.0
        di_p[0] = 100.0 * e_p / e_tr
        di_n[0] = 100.0 * e_n / e_tr
        for t in range(1, n):
            up = h[t] - h[t - 1]
            dn = lo[t - 1] - lo[t]
            pdm = up if (up > dn and up > 0) else 0.0
            ndm = dn if (dn > up and dn > 0) else 0.0
            tr = max(h[t] - lo[t], abs(h[t] - c[t - 1]), abs(lo[t] - c[t - 1]))
            e_tr = e_tr + (tr - e_tr) / 14.0
            e_p = e_p + (pdm - e_p) / 14.0
            e_n = e_n + (ndm - e_n) / 14.0
            dip = 100.0 * e_p / e_tr
            din = 100.0 * e_n / e_tr
            dxv = 0.0 if dip + din == 0 else 100.0 * abs(dip - din) / (dip + din)
            adx = adx + (dxv - adx) / 14.0
            di_p[t] = dip
            di_n[t] = din
            adx_o[t] = adx
        return pd.DataFrame(
            {
                "symbol": pdf["symbol"],
                "pos": pdf["pos"],
                "di_p": di_p,
                "di_n": di_n,
                "adx": adx_o,
            }
        )

    res = s.groupBy("symbol").applyInPandas(
        adx_series,
        schema="symbol long, pos long, di_p double, di_n double, adx double",
    )
    return res.select(
        "symbol",
        "pos",
        F.round("di_p", 6).alias("di_plus"),
        F.round("di_n", 6).alias("di_minus"),
        F.round("adx", 6).alias("adx"),
    )


_CCI_SQL = f"""
WITH stocks AS ({_RAMP_OHLCV}),
tp AS (SELECT row_id, (high + low + close) / 3 AS tp FROM stocks),
fr AS (SELECT row_id, tp,
              list(tp) OVER (ORDER BY row_id
                             ROWS BETWEEN 19 PRECEDING AND CURRENT ROW) AS tps
       FROM tp),
m AS (SELECT row_id, tp, tps,
             list_reduce(tps, (a, b) -> a + b) / len(tps) AS sma
      FROM fr)
SELECT row_id, ROUND(tp, 6) AS tp, ROUND(sma, 6) AS sma_20,
       CASE WHEN list_reduce(list_transform(tps, x -> ABS(x - sma)),
                             (a, b) -> a + b) / len(tps) = 0
            THEN NULL
            ELSE ROUND((tp - sma)
                       / (0.015 * (list_reduce(list_transform(tps,
                                                  x -> ABS(x - sma)),
                                               (a, b) -> a + b) / len(tps))),
                       6)
       END AS cci_20
FROM m
"""


@register("stocks_cci", _CCI_SQL)
def stocks_cci(spark, sf_dir):
    """Commodity Channel Index (20): (tp - SMA20(tp)) / (0.015 *
    MeanAbsDev), where the deviation is measured around the frame's
    OWN mean — a frame-local two-pass no single window aggregate
    expresses. Both faces materialize the frame as an ORDERED list
    (collect_list over the running frame / DuckDB windowed list) and
    fold it left-to-right (F.aggregate seeded 0.0 / list_reduce
    seeded at the head — identical IEEE chains since 0.0 + x0 ≡ x0),
    so the sums agree bit-for-bit before 6dp rounding. The
    single-row first frame has zero deviation → NULL, guarded
    identically on both faces. Global row_id order: the documented
    1-part parity shape shared with stocks_atr; the partitioned
    production form is the window_partitioned_parity construction.
    At scale the frame list is 20 doubles per row — map-local state,
    not a shuffle."""
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    from stockify_spark.sources.fixtures import stocks_ramp

    s = stocks_ramp(spark, cycles=100)
    tp = ((F.col("high") + F.col("low") + F.col("close")) / 3).alias("tp")
    w = Window.orderBy("row_id").rowsBetween(-19, 0)
    df = s.select("row_id", tp).withColumn("tps", F.collect_list("tp").over(w))
    fold = F.aggregate("tps", F.lit(0.0), lambda a, x: a + x)
    sma = (fold / F.size("tps")).alias("sma")
    df = df.select("row_id", "tp", "tps", sma)
    dev = F.aggregate(
        F.transform("tps", lambda x: F.abs(x - F.col("sma"))),
        F.lit(0.0),
        lambda a, x: a + x,
    ) / F.size("tps")
    return df.select(
        "row_id",
        F.round("tp", 6).alias("tp"),
        F.round("sma", 6).alias("sma_20"),
        F.when(dev == 0, F.lit(None).cast("double"))
        .otherwise(F.round((F.col("tp") - F.col("sma")) / (0.015 * dev), 6))
        .alias("cci_20"),
    )


_MFI_SQL = f"""
WITH stocks AS ({_RAMP_OHLCV}),
tp AS (SELECT row_id, (high + low + close) / 3 AS tp,
              (high + low + close) / 3 * volume AS mf
       FROM stocks),
fl AS (SELECT row_id,
              CASE WHEN lag(tp) OVER w IS NOT NULL AND tp > lag(tp) OVER w
                   THEN mf ELSE 0 END AS pf,
              CASE WHEN lag(tp) OVER w IS NOT NULL AND tp < lag(tp) OVER w
                   THEN mf ELSE 0 END AS nf
       FROM tp WINDOW w AS (ORDER BY row_id)),
s AS (SELECT row_id, SUM(pf) OVER fr AS spf, SUM(nf) OVER fr AS snf
      FROM fl
      WINDOW fr AS (ORDER BY row_id ROWS BETWEEN 13 PRECEDING AND CURRENT ROW))
SELECT row_id, ROUND(spf, 4) AS pos_flow, ROUND(snf, 4) AS neg_flow,
       CASE WHEN snf = 0 THEN 100.0
            ELSE ROUND(100.0 - 100.0 / (1.0 + spf / snf), 6) END AS mfi_14
FROM s
"""


@register("stocks_mfi", _MFI_SQL)
def stocks_mfi(spark, sf_dir):
    """Money Flow Index (14): volume-weighted RSI analogue. Raw
    money flow tp*volume is classified positive/negative by the
    typical-price delta (first row contributes neither — the lag
    IS NULL gate on both faces), then 14-row bounded-frame sums feed
    100 - 100/(1 + ratio), with the all-negative-flow-zero frame
    pinned to 100 exactly. Pure lag + conditional + frame sums —
    stateless window algebra, one pass. Same 1-part parity
    convention as stocks_atr."""
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    from stockify_spark.sources.fixtures import stocks_ramp

    s = stocks_ramp(spark, cycles=100)
    tp = ((F.col("high") + F.col("low") + F.col("close")) / 3).alias("tp")
    mf = (((F.col("high") + F.col("low") + F.col("close")) / 3) * F.col("volume")).alias("mf")
    w = Window.orderBy("row_id")
    fr = Window.orderBy("row_id").rowsBetween(-13, 0)
    df = s.select("row_id", tp, mf).withColumn("ptp", F.lag("tp").over(w))
    pf = F.when(F.col("ptp").isNotNull() & (F.col("tp") > F.col("ptp")), F.col("mf")).otherwise(F.lit(0.0))
    nf = F.when(F.col("ptp").isNotNull() & (F.col("tp") < F.col("ptp")), F.col("mf")).otherwise(F.lit(0.0))
    df = df.select("row_id", pf.alias("pf"), nf.alias("nf"))
    df = df.select(
        "row_id",
        F.sum("pf").over(fr).alias("spf"),
        F.sum("nf").over(fr).alias("snf"),
    )
    return df.select(
        "row_id",
        F.round("spf", 4).alias("pos_flow"),
        F.round("snf", 4).alias("neg_flow"),
        F.when(F.col("snf") == 0, F.lit(100.0))
        .otherwise(F.round(100.0 - 100.0 / (1.0 + F.col("spf") / F.col("snf")), 6))
        .alias("mfi_14"),
    )


_TOKS15 = "string_split_regex(trim(lower(text)), '\\s+')"

_NB_SQL = f"""
WITH train AS (SELECT * FROM documents WHERE doc_id % 5 != 0),
test AS (SELECT * FROM documents WHERE doc_id % 5 = 0),
ttok AS (SELECT doc_id, lang, unnest({_TOKS15}) AS tok FROM train),
ccnt AS (SELECT lang, tok, COUNT(*) AS c FROM ttok GROUP BY lang, tok),
ctot AS (SELECT lang, COUNT(*) AS tot FROM ttok GROUP BY lang),
v AS (SELECT COUNT(DISTINCT tok) AS v FROM ttok),
prior AS (SELECT lang, COUNT(*) AS nd FROM train GROUP BY lang),
ndall AS (SELECT COUNT(*) AS nd FROM train),
stok AS (SELECT doc_id, unnest({_TOKS15}) AS tok FROM test),
scored AS (
  SELECT s.doc_id, p.lang,
         ln(CAST(p.nd AS DOUBLE) / a.nd)
           + SUM(ln((COALESCE(c.c, 0) + 1.0) / (t.tot + v.v))) AS score
  FROM stok s
  CROSS JOIN prior p
  JOIN ctot t ON t.lang = p.lang
  CROSS JOIN v
  CROSS JOIN ndall a
  LEFT JOIN ccnt c ON c.lang = p.lang AND c.tok = s.tok
  GROUP BY s.doc_id, p.lang, p.nd, t.tot, v.v, a.nd
),
pick AS (
  SELECT doc_id, lang, score,
         row_number() OVER (PARTITION BY doc_id
                            ORDER BY ROUND(score, 6) DESC, lang) AS rn
  FROM scored
)
SELECT doc_id, lang AS pred_lang, ROUND(score, 6) AS score
FROM pick WHERE rn = 1
"""


@register("ml_naive_bayes", _NB_SQL)
def ml_naive_bayes(spark, sf_dir):
    """Multinomial Naive Bayes over the documents corpus: train on
    doc_id % 5 != 0 (label = lang), classify the held-out fifth.
    Laplace-smoothed log-likelihoods ln((count+1)/(total_c + V)) +
    ln(prior); argmax per doc ordered by the 6dp-ROUNDED score then
    lang, so cross-engine ulp drift in the unordered log-sum cannot
    flip the winner. The model is counts only — two aggregate tables
    (class-token counts, class totals) that BROADCAST at any corpus
    scale: training is one shuffle of the exploded token table,
    scoring is a map-side join per test token plus one groupBy
    (doc, class). The classic distributed text classifier with zero
    iterative state."""
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    from stockify_spark.functions.text import tokens
    from stockify_spark.registry import _t

    docs = _t(spark, sf_dir, "documents")
    train = docs.filter(F.col("doc_id") % 5 != 0)
    test = docs.filter(F.col("doc_id") % 5 == 0)

    # the exploded train tokens feed FOUR model aggregates
    # (class-token counts, class totals, vocabulary, priors) —
    # materialize once instead of four explode passes
    ttok = train.select(
        "doc_id", "lang", F.explode(tokens("text")).alias("tok")
    ).localCheckpoint(eager=False)
    ccnt = ttok.groupBy("lang", "tok").agg(F.count(F.lit(1)).alias("c"))
    ctot = ttok.groupBy("lang").agg(F.count(F.lit(1)).alias("tot"))
    v = ttok.select(F.countDistinct("tok").alias("v"))
    prior = train.groupBy("lang").agg(F.count(F.lit(1)).alias("nd"))
    ndall = train.select(F.count(F.lit(1)).alias("nd_all"))

    stok = test.select("doc_id", F.explode(tokens("text")).alias("tok"))
    # model side: 5 classes x vocab — broadcast by construction
    model = (
        prior.join(ctot, "lang")
        .crossJoin(F.broadcast(v))
        .crossJoin(F.broadcast(ndall))
    )
    cmodel = ccnt.select(
        F.col("lang").alias("clang"), F.col("tok").alias("ctok"), "c"
    )
    scored = (
        stok.crossJoin(F.broadcast(model.select("lang", "nd", "tot", "v", "nd_all")))
        .join(
            F.broadcast(cmodel),
            (F.col("clang") == F.col("lang")) & (F.col("ctok") == F.col("tok")),
            "left",
        )
        .groupBy("doc_id", "lang", "nd", "tot", "v", "nd_all")
        .agg(
            F.sum(
                F.log((F.coalesce(F.col("c"), F.lit(0)) + 1.0) / (F.col("tot") + F.col("v")))
            ).alias("ll")
        )
        .select(
            "doc_id",
            "lang",
            (F.log(F.col("nd").cast("double") / F.col("nd_all")) + F.col("ll")).alias("score"),
        )
    )
    wpick = Window.partitionBy("doc_id").orderBy(
        F.round("score", 6).desc(), F.col("lang").asc()
    )
    return (
        scored.withColumn("rn", F.row_number().over(wpick))
        .filter(F.col("rn") == 1)
        .select(
            "doc_id",
            F.col("lang").alias("pred_lang"),
            F.round("score", 6).alias("score"),
        )
    )


_SHINGLES15 = (
    f"list_distinct(list_transform(range(greatest(len({_TOKS15}) - 3, 0) + 1),"
    f" i -> array_to_string({_TOKS15}[i + 1:i + 3], ' ')))"
)

_CONTAIN_SQL = f"""
WITH s AS (SELECT doc_id, {_SHINGLES15} AS sh FROM documents),
nz AS (SELECT * FROM s WHERE len(sh) > 0)
SELECT a.doc_id AS contained_id, b.doc_id AS container_id,
       ROUND(CAST(len(list_intersect(a.sh, b.sh)) AS DOUBLE) / len(a.sh), 6)
         AS containment
FROM nz a JOIN nz b ON a.doc_id != b.doc_id
WHERE CAST(len(list_intersect(a.sh, b.sh)) AS DOUBLE) / len(a.sh) >= 0.6
"""


@register("pipeline_containment_dedup", _CONTAIN_SQL)
def pipeline_containment_dedup(spark, sf_dir):
    """Asymmetric shingle-containment pairs C(A→B) = |S(A)∩S(B)| /
    |S(A)| >= 0.6 — the excerpt/boilerplate-inclusion relation
    Jaccard scores near zero (the union is dominated by the
    container). Candidates via the asymmetric prefix filter: A's
    rarest |A| - ceil(0.6|A|) + 1 shingles probe the container
    side's FULL inverted index (no length bound on B — any superset
    qualifies); recall is exactly 1.0 and the oracle brute-forces
    all ordered pairs to prove it."""
    from stockify_spark.llm.dedup import shingle_containment_pairs
    from stockify_spark.registry import _t

    return shingle_containment_pairs(
        _t(spark, sf_dir, "documents"), "text", "doc_id", k=3, threshold=0.6
    )
