"""Round-8 extension wave 5: state-space smoothing on real tables,
keyword extraction, robust regression, and network-address ops.

Extends the sequential-state family (registry_ext14/15's
``applyInPandas``-per-series / recursive-CTE pattern) in two
directions: a 1-D Kalman filter (two coupled state variables with a
data-dependent gain — the canonical state-space smoother) and Holt's
double exponential smoothing driven by a REAL aggregate series
(monthly revenue per nation off orders⋈customer⋈nation, inputs
pinned to 2dp on both faces so the recursion sees identical IEEE
operands despite unordered cross-engine sums). The corpus op is RAKE
keyword extraction (stopword-boundary phrase runs scored by word
degree/frequency — public-knowledge algorithm, Rose et al. 2010).
Theil-Sen is the robust trend estimator (median of pairwise slopes)
with the median taken by EXPLICIT rank selection so both engines
average the same two middle values instead of trusting matching
interpolation formulas (the window_rolling_median lesson)."""

from __future__ import annotations

from stockify_spark.registry import register

_N_ROWS = 1800
_SERIES_LEN = 180

_RAMP16 = f"""
  SELECT i AS row_id, CAST(500 + (i % 18) * 10 AS DOUBLE) AS close
  FROM range({_N_ROWS}) t(i)
"""

_KALMAN_SQL = f"""
WITH RECURSIVE stocks AS ({_RAMP16}),
base AS (SELECT row_id // {_SERIES_LEN} AS symbol,
                row_id % {_SERIES_LEN} AS pos, close
         FROM stocks),
r AS (
  SELECT symbol, pos, close, close AS x, CAST(1.0 AS DOUBLE) AS p,
         CAST(0.0 AS DOUBLE) AS k
  FROM base WHERE pos = 0
  UNION ALL
  SELECT b.symbol, b.pos, b.close,
         r.x + ((r.p + 0.01) / (r.p + 0.01 + 4.0)) * (b.close - r.x),
         (1.0 - (r.p + 0.01) / (r.p + 0.01 + 4.0)) * (r.p + 0.01),
         (r.p + 0.01) / (r.p + 0.01 + 4.0)
  FROM r JOIN base b ON b.symbol = r.symbol AND b.pos = r.pos + 1
)
SELECT CAST(symbol AS BIGINT) AS symbol, CAST(pos AS BIGINT) AS pos,
       ROUND(x, 6) AS estimate, ROUND(p, 6) AS variance,
       ROUND(k, 6) AS gain
FROM r
"""


@register("window_kalman", _KALMAN_SQL)
def window_kalman(spark, sf_dir):
    """1-D constant-position Kalman filter (process noise q=0.01,
    measurement noise r=4.0), seeded x0 = z0, p0 = 1: predict
    p' = p + q, gain k = p'/(p' + r), update x += k(z - x),
    p = (1-k)p'. Unlike the EMA family the smoothing weight is
    DATA-DEPENDENT state (k converges toward the steady-state gain),
    so this pins the two-coupled-recursions shape. applyInPandas per
    series vs a recursive CTE carrying (x, p, k) through the same
    literal IEEE expressions."""
    import pandas as pd

    from pyspark.sql import functions as F

    from stockify_spark.sources.fixtures import stocks_ramp

    s = stocks_ramp(spark, cycles=100).select(
        (F.col("row_id") / _SERIES_LEN).cast("long").alias("symbol"),
        (F.col("row_id") % _SERIES_LEN).cast("long").alias("pos"),
        "close",
    )

    def kalman_series(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values("pos").reset_index(drop=True)
        z = pdf["close"].to_numpy()
        n = len(z)
        xs = [0.0] * n
        ps = [0.0] * n
        ks = [0.0] * n
        x, p = z[0], 1.0
        xs[0], ps[0], ks[0] = x, p, 0.0
        for t in range(1, n):
            pp = p + 0.01
            k = pp / (pp + 4.0)
            x = x + k * (z[t] - x)
            p = (1.0 - k) * pp
            xs[t], ps[t], ks[t] = x, p, k
        return pd.DataFrame(
            {"symbol": pdf["symbol"], "pos": pdf["pos"], "x": xs, "p": ps, "k": ks}
        )

    res = s.groupBy("symbol").applyInPandas(
        kalman_series,
        schema="symbol long, pos long, x double, p double, k double",
    )
    return res.select(
        "symbol",
        "pos",
        F.round("x", 6).alias("estimate"),
        F.round("p", 6).alias("variance"),
        F.round("k", 6).alias("gain"),
    )


_HOLT_SQL = """
WITH RECURSIVE rev AS (
  SELECT n.n_name AS nation,
         (year(o.o_orderdate) * 12 + month(o.o_orderdate)) AS ym,
         ROUND(SUM(o.o_totalprice), 2) AS z
  FROM orders o JOIN customer c ON c.c_custkey = o.o_custkey
  JOIN nation n ON n.n_nationkey = c.c_nationkey
  GROUP BY 1, 2
),
base AS (
  SELECT nation, ym,
         row_number() OVER (PARTITION BY nation ORDER BY ym) - 1 AS pos, z
  FROM rev
),
r AS (
  SELECT nation, ym, pos, z, z AS l, CAST(0 AS DOUBLE) AS b
  FROM base WHERE pos = 0
  UNION ALL
  SELECT t.nation, t.ym, t.pos, t.z,
         0.3 * t.z + 0.7 * (r.l + r.b),
         0.1 * ((0.3 * t.z + 0.7 * (r.l + r.b)) - r.l) + 0.9 * r.b
  FROM r JOIN base t ON t.nation = r.nation AND t.pos = r.pos + 1
)
SELECT nation, CAST(ym AS BIGINT) AS ym, ROUND(l, 6) AS level,
       ROUND(b, 6) AS trend, ROUND(l + b, 6) AS forecast_1
FROM r
"""


@register("orders_holt_forecast", _HOLT_SQL)
def orders_holt_forecast(spark, sf_dir):
    """Holt's linear-trend smoothing (alpha=0.3, gamma=0.1) over the
    REAL monthly-revenue series per nation (orders ⋈ customer ⋈
    nation, 25 series x ~80 months): l_t = 0.3 z + 0.7 (l+b),
    b_t = 0.1 (l_t - l_{t-1}) + 0.9 b, seeded l0 = z0, b0 = 0;
    forecast_1 = l + b. The recursion steps OBSERVED months
    (row_number pos — two nations have empty months, and a gapped
    pos would strand the tail). Inputs are ROUND(SUM, 2)-pinned on
    both faces: o_totalprice is 2dp decimal data, so the rounded sum
    is the exact decimal value regardless of cross-engine float
    accumulation order — the recursion then sees bit-identical
    operands. The aggregation is one shuffle; the recursion is
    applyInPandas over 25 nation groups."""
    import pandas as pd

    from pyspark.sql import functions as F

    from stockify_spark.registry import _t

    orders = _t(spark, sf_dir, "orders")
    customer = _t(spark, sf_dir, "customer")
    nation = _t(spark, sf_dir, "nation")
    rev = (
        orders.join(customer, orders["o_custkey"] == customer["c_custkey"])
        .join(F.broadcast(nation), customer["c_nationkey"] == nation["n_nationkey"])
        .groupBy(
            F.col("n_name").alias("nation"),
            (F.year("o_orderdate") * 12 + F.month("o_orderdate")).alias("ym"),
        )
        .agg(F.round(F.sum("o_totalprice"), 2).alias("z"))
    )

    def holt_series(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values("ym").reset_index(drop=True)
        z = pdf["z"].to_numpy()
        n = len(z)
        ls = [0.0] * n
        bs = [0.0] * n
        l, b = z[0], 0.0
        ls[0], bs[0] = l, b
        for t in range(1, n):
            l_new = 0.3 * z[t] + 0.7 * (l + b)
            b = 0.1 * (l_new - l) + 0.9 * b
            l = l_new
            ls[t], bs[t] = l, b
        return pd.DataFrame(
            {"nation": pdf["nation"], "ym": pdf["ym"], "l": ls, "b": bs}
        )

    res = rev.groupBy("nation").applyInPandas(
        holt_series, schema="nation string, ym long, l double, b double"
    )
    return res.select(
        "nation",
        "ym",
        F.round("l", 6).alias("level"),
        F.round("b", 6).alias("trend"),
        F.round(F.col("l") + F.col("b"), 6).alias("forecast_1"),
    )


_STOP16 = ("the", "a", "of", "and", "to", "in", "is", "that", "it", "for")
_STOP16_SQL = "('" + "','".join(_STOP16) + "')"
_TOKS16 = "string_split_regex(trim(lower(text)), '\\s+')"

_RAKE_SQL = f"""
WITH tok AS (
  SELECT doc_id,
         CAST(generate_subscripts({_TOKS16}, 1) AS INT) AS pos,
         unnest({_TOKS16}) AS tok
  FROM documents
),
ns AS (
  SELECT doc_id, pos, tok,
         pos - row_number() OVER (PARTITION BY doc_id ORDER BY pos) AS grp
  FROM tok WHERE tok NOT IN {_STOP16_SQL}
),
ph AS (
  SELECT doc_id, grp,
         string_agg(tok, ' ' ORDER BY pos) AS phrase,
         COUNT(*) AS plen
  FROM ns GROUP BY doc_id, grp
),
pw AS (
  SELECT ns.doc_id, ns.grp, ns.tok, ph.plen
  FROM ns JOIN ph ON ph.doc_id = ns.doc_id AND ph.grp = ns.grp
),
ws AS (
  SELECT tok, CAST(SUM(plen) AS DOUBLE) / COUNT(*) AS wscore
  FROM pw GROUP BY tok
),
psc AS (
  SELECT pw.doc_id, pw.grp, SUM(ws.wscore) AS score
  FROM pw JOIN ws ON ws.tok = pw.tok
  GROUP BY pw.doc_id, pw.grp
),
ranked AS (
  SELECT ph.doc_id, ph.phrase, psc.score,
         row_number() OVER (PARTITION BY ph.doc_id
                            ORDER BY ROUND(psc.score, 6) DESC, ph.phrase) AS rn
  FROM ph JOIN psc ON psc.doc_id = ph.doc_id AND psc.grp = ph.grp
)
SELECT doc_id, CAST(rn AS BIGINT) AS rank, phrase, ROUND(score, 6) AS score
FROM ranked WHERE rn <= 3
"""


@register("text_rake", _RAKE_SQL)
def text_rake(spark, sf_dir):
    """RAKE keyword extraction (Rose et al. 2010): candidate phrases
    are maximal stopword-free token runs (the gaps-and-islands
    pos - row_number grouping); word score = degree/frequency where
    degree(w) sums the lengths of every phrase containing w; phrase
    score sums its word scores with multiplicity; top-3 phrases per
    doc ordered by 6dp-rounded score then phrase text. Corpus-wide
    word statistics are one vocabulary-keyed shuffle; everything
    else is per-doc window work. The en-stopword list is the same
    public 10-word profile lang_detect uses."""
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    from stockify_spark.functions.text import tokens
    from stockify_spark.registry import _t

    docs = _t(spark, sf_dir, "documents")
    tok = docs.select(
        "doc_id", F.posexplode(tokens("text")).alias("pos0", "tok")
    ).select("doc_id", (F.col("pos0") + 1).alias("pos"), "tok")
    # materialize the non-stopword token stream ONCE: it feeds the
    # phrase build AND the word-stat join tree, which otherwise
    # re-runs the tokenize+window pass per reference (the perplexity
    # lesson: self-referenced pre-exchange subtrees recompute —
    # ReusedExchange only dedups AFTER an exchange)
    ns = tok.filter(~F.col("tok").isin(*_STOP16)).withColumn(
        "grp",
        F.col("pos") - F.row_number().over(Window.partitionBy("doc_id").orderBy("pos")),
    ).localCheckpoint()
    ph = ns.groupBy("doc_id", "grp").agg(
        F.concat_ws(" ", F.array_sort(F.collect_list(F.struct("pos", "tok"))).tok).alias(
            "phrase"
        ),
        F.count(F.lit(1)).alias("plen"),
    ).localCheckpoint()  # phrase-level (rows = phrases), read 2x below
    pw = ns.join(ph.select("doc_id", "grp", "plen"), ["doc_id", "grp"])
    ws = pw.groupBy("tok").agg(
        (F.sum("plen").cast("double") / F.count(F.lit(1))).alias("wscore")
    )
    psc = pw.join(ws, "tok").groupBy("doc_id", "grp").agg(F.sum("wscore").alias("score"))
    ranked = ph.join(psc, ["doc_id", "grp"]).withColumn(
        "rn",
        F.row_number().over(
            Window.partitionBy("doc_id").orderBy(
                F.round("score", 6).desc(), F.col("phrase").asc()
            )
        ),
    )
    return ranked.filter(F.col("rn") <= 3).select(
        "doc_id",
        F.col("rn").cast("long").alias("rank"),
        "phrase",
        F.round("score", 6).alias("score"),
    )


_THEILSEN_SQL = f"""
WITH stocks AS ({_RAMP16}),
base AS (SELECT row_id // {_SERIES_LEN} AS symbol,
                row_id % {_SERIES_LEN} AS pos, close
         FROM stocks),
pairs AS (
  SELECT a.symbol,
         (b.close - a.close) / (b.pos - a.pos) AS slope
  FROM base a JOIN base b ON b.symbol = a.symbol AND b.pos > a.pos
),
rk AS (
  SELECT symbol, slope,
         row_number() OVER (PARTITION BY symbol ORDER BY slope) AS rn,
         COUNT(*) OVER (PARTITION BY symbol) AS n
  FROM pairs
)
SELECT CAST(symbol AS BIGINT) AS symbol, CAST(MAX(n) AS BIGINT) AS n_pairs,
       ROUND(AVG(slope), 6) AS ts_slope
FROM rk
WHERE rn IN ((n + 1) // 2, (n + 2) // 2)
GROUP BY symbol
"""


@register("stats_theil_sen", _THEILSEN_SQL)
def stats_theil_sen(spark, sf_dir):
    """Theil-Sen robust trend estimator per series: the median of
    all C(L,2) pairwise slopes (close_j - close_i)/(j - i). The
    median is taken by EXPLICIT rank selection — row_number the
    slopes, average the rows at ranks (n+1)//2 and (n+2)//2 — so
    both engines average the SAME two middle doubles instead of
    relying on matching quantile-interpolation formulas (the
    documented window_rolling_median fragility). Per-series cost is
    O(L²) with L bounded by the series length — the standard
    pair-explosion trade for a 29.3%-breakdown-point estimator; the
    pair join and both windows are partitioned on symbol, so series
    parallelism carries scale."""
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    from stockify_spark.sources.fixtures import stocks_ramp

    base = stocks_ramp(spark, cycles=100).select(
        (F.col("row_id") / _SERIES_LEN).cast("long").alias("symbol"),
        (F.col("row_id") % _SERIES_LEN).cast("long").alias("pos"),
        "close",
    )
    a = base.select("symbol", F.col("pos").alias("pa"), F.col("close").alias("ca"))
    b = base.select("symbol", F.col("pos").alias("pb"), F.col("close").alias("cb"))
    pairs = a.join(b, "symbol").filter(F.col("pb") > F.col("pa")).select(
        "symbol",
        ((F.col("cb") - F.col("ca")) / (F.col("pb") - F.col("pa"))).alias("slope"),
    )
    w = Window.partitionBy("symbol")
    rk = pairs.select(
        "symbol",
        "slope",
        F.row_number().over(w.orderBy("slope")).alias("rn"),
        F.count(F.lit(1)).over(w).alias("n"),
    )
    mid = rk.filter(
        (F.col("rn") == F.floor((F.col("n") + 1) / 2))
        | (F.col("rn") == F.floor((F.col("n") + 2) / 2))
    )
    return mid.groupBy("symbol").agg(
        F.max("n").cast("long").alias("n_pairs"),
        F.round(F.avg("slope"), 6).alias("ts_slope"),
    )


_IPCIDR_SQL = """
WITH ips AS (
  SELECT c_custkey,
         CONCAT('10.', CAST(c_custkey % 200 AS VARCHAR), '.',
                CAST((c_custkey * 7) % 256 AS VARCHAR), '.',
                CAST((c_custkey * 13) % 256 AS VARCHAR)) AS ip
  FROM customer
),
oct AS (SELECT c_custkey, ip, string_split(ip, '.') AS o FROM ips),
parsed AS (
  SELECT c_custkey, ip,
         CAST(o[1] AS BIGINT) * 16777216 + CAST(o[2] AS BIGINT) * 65536
           + CAST(o[3] AS BIGINT) * 256 + CAST(o[4] AS BIGINT) AS ip_num,
         CONCAT(o[1], '.', o[2], '.', o[3], '.0/24') AS subnet
  FROM oct
)
SELECT subnet, COUNT(*) AS n_hosts,
       MIN(ip_num) AS min_ip, MAX(ip_num) AS max_ip
FROM parsed
WHERE ip_num BETWEEN 167772160 AND 176160767
GROUP BY subnet
"""


@register("fn_ip_cidr", _IPCIDR_SQL)
def fn_ip_cidr(spark, sf_dir):
    """IPv4 parse + CIDR arithmetic: synthesize a deterministic
    dotted-quad per customer, split it BACK into octets (string
    path), rebuild the 32-bit integer, roll up to /24 subnets, and
    filter to 10.0.0.0/9 by numeric range [167772160, 176160767] —
    the network-log analytics pattern (parse, numeric containment,
    prefix aggregation) as pure column expressions."""
    from pyspark.sql import functions as F

    from stockify_spark.registry import _t

    cust = _t(spark, sf_dir, "customer")
    ips = cust.select(
        "c_custkey",
        F.concat(
            F.lit("10."),
            (F.col("c_custkey") % 200).cast("string"),
            F.lit("."),
            ((F.col("c_custkey") * 7) % 256).cast("string"),
            F.lit("."),
            ((F.col("c_custkey") * 13) % 256).cast("string"),
        ).alias("ip"),
    )
    o = F.split("ip", "\\.")
    parsed = ips.select(
        "c_custkey",
        "ip",
        (
            o.getItem(0).cast("long") * 16777216
            + o.getItem(1).cast("long") * 65536
            + o.getItem(2).cast("long") * 256
            + o.getItem(3).cast("long")
        ).alias("ip_num"),
        F.concat(
            o.getItem(0), F.lit("."), o.getItem(1), F.lit("."), o.getItem(2), F.lit(".0/24")
        ).alias("subnet"),
    )
    return (
        parsed.filter(F.col("ip_num").between(167772160, 176160767))
        .groupBy("subnet")
        .agg(
            F.count(F.lit(1)).alias("n_hosts"),
            F.min("ip_num").alias("min_ip"),
            F.max("ip_num").alias("max_ip"),
        )
    )
