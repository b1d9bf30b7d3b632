"""Round-8 extension wave 7: multiresolution transforms, sketching,
spectral/graph summaries, and the last classic indicator.

Two more determinism-by-construction designs (the registry_ext17
theme): Haar wavelet decomposition is exact halving arithmetic on
exact-decimal data (no rounding pins needed anywhere), and the HLL
sketch uses an md5-derived hash so BOTH engines build bit-identical
register arrays (the agg_cms_sketch precedent applied to
cardinality). PCA and modularity follow the pinned-moments /
integer-sums patterns respectively; Ichimoku closes out the
reference domain's indicator toolkit with pure bounded-frame
windows."""

from __future__ import annotations

from stockify_spark.registry import register

_N_ROWS = 1800
_SERIES_LEN = 180
_DWT_LEN = 128  # 2^7 — first 128 rows of each series

_RAMP18 = f"""
  SELECT i AS row_id, CAST(500 + (i % 18) * 10 AS DOUBLE) AS close,
         CAST(510 + (i % 18) * 10 AS DOUBLE) AS high,
         CAST(440 + (i % 18) * 10 AS DOUBLE) AS low
  FROM range({_N_ROWS}) t(i)
"""


def _haar_oracle_sql() -> str:
    """Chained-CTE Haar DWT: 7 exact halving levels, details emitted
    per level, the final approximation as level 8."""
    parts = [
        f"WITH stocks AS ({_RAMP18}),",
        f"lvl0 AS (SELECT row_id // {_SERIES_LEN} AS symbol,"
        f" row_id % {_SERIES_LEN} AS k, close AS a FROM stocks"
        f" WHERE row_id % {_SERIES_LEN} < {_DWT_LEN}),",
    ]
    for lv in range(1, 8):
        prev = f"lvl{lv - 1}"
        parts.append(
            f"lvl{lv} AS (SELECT symbol, k // 2 AS k,"
            f" (MAX(CASE WHEN k % 2 = 0 THEN a END)"
            f"  + MAX(CASE WHEN k % 2 = 1 THEN a END)) / 2 AS a,"
            f" (MAX(CASE WHEN k % 2 = 0 THEN a END)"
            f"  - MAX(CASE WHEN k % 2 = 1 THEN a END)) / 2 AS d"
            f" FROM {prev} GROUP BY symbol, k // 2),"
        )
    details = " UNION ALL ".join(
        f"SELECT symbol, {lv} AS level, k, d AS coef FROM lvl{lv}"
        for lv in range(1, 8)
    )
    parts.append(
        f"allc AS ({details} UNION ALL"
        f" SELECT symbol, 8 AS level, k, a AS coef FROM lvl7)"
    )
    return (
        "".join(parts)
        + " SELECT CAST(symbol AS BIGINT) AS symbol,"
        " CAST(level AS BIGINT) AS level, CAST(k AS BIGINT) AS k,"
        " ROUND(coef, 6) AS coef FROM allc"
    )


@register("window_haar_dwt", _haar_oracle_sql())
def window_haar_dwt(spark, sf_dir):
    """Haar discrete wavelet transform of the first 128 points of
    each series: level l halves level l-1 into approximations
    (a+b)/2 and details (a-b)/2; output is every detail coefficient
    (levels 1-7) plus the final approximation (level 8). All values
    are exact binary halves of exact-decimal closes, so the two
    faces agree bit-for-bit with NO rounding pins — determinism by
    arithmetic. The Spark plan is the classic log2(n) parallel
    reduction: 7 chained per-series pair aggregations (each one
    groupBy on (symbol, k/2)); at scale each level is map-side
    within a series partition."""
    from functools import reduce

    from pyspark.sql import functions as F

    from stockify_spark.sources.fixtures import stocks_ramp

    s = stocks_ramp(spark, cycles=100).select(
        (F.col("row_id") / _SERIES_LEN).cast("long").alias("symbol"),
        (F.col("row_id") % _SERIES_LEN).cast("long").alias("k"),
        F.col("close").alias("a"),
    ).filter(F.col("k") < _DWT_LEN)

    levels = []
    cur = s
    for lv in range(1, 8):
        nxt = cur.groupBy(
            "symbol", (F.col("k") / 2).cast("long").alias("k2")
        ).agg(
            (
                (
                    F.max(F.when(F.col("k") % 2 == 0, F.col("a")))
                    + F.max(F.when(F.col("k") % 2 == 1, F.col("a")))
                )
                / 2
            ).alias("a"),
            (
                (
                    F.max(F.when(F.col("k") % 2 == 0, F.col("a")))
                    - F.max(F.when(F.col("k") % 2 == 1, F.col("a")))
                )
                / 2
            ).alias("d"),
        ).withColumnRenamed("k2", "k")
        # each level feeds BOTH the detail branch of the union and the
        # next level's pair aggregation — without materializing it,
        # level k's branch re-executes every lower level and the plan
        # census counts 35 shuffles instead of 7 (measured); the
        # level outputs halve in size so the checkpoints are tiny
        nxt = nxt.localCheckpoint(eager=False)
        levels.append(
            nxt.select(
                "symbol", F.lit(lv).cast("long").alias("level"), "k",
                F.col("d").alias("coef"),
            )
        )
        cur = nxt.select("symbol", "k", "a")
    levels.append(
        cur.select(
            "symbol", F.lit(8).cast("long").alias("level"), "k",
            F.col("a").alias("coef"),
        )
    )
    out = reduce(lambda x, y: x.unionAll(y), levels)
    return out.select("symbol", "level", "k", F.round("coef", 6).alias("coef"))


_HLL_SQL = """
WITH h AS (
  SELECT CAST(CONCAT('0x', substr(md5(CAST(o_custkey AS VARCHAR)), 1, 15))
              AS BIGINT) AS hv
  FROM orders
),
reg AS (
  SELECT hv % 64 AS bucket,
         MAX(CASE WHEN hv // 64 = 0 THEN 55
                  ELSE 55 - length(ltrim(bin(hv // 64), '0')) END) AS rho
  FROM h GROUP BY hv % 64
),
allreg AS (
  SELECT i AS bucket, COALESCE(r.rho, 0) AS m
  FROM range(64) t(i) LEFT JOIN reg r ON r.bucket = i
),
z AS (
  SELECT ROUND(SUM(POWER(2.0, -m)), 12) AS zsum,
         SUM(CASE WHEN m = 0 THEN 1 ELSE 0 END) AS v
  FROM allreg
),
est AS (
  SELECT CASE WHEN (0.7213 / (1.0 + 1.079 / 64.0)) * 64.0 * 64.0 / zsum
                   <= 2.5 * 64.0 AND v > 0
              THEN 64.0 * ln(64.0 / v)
              ELSE (0.7213 / (1.0 + 1.079 / 64.0)) * 64.0 * 64.0 / zsum
         END AS e, v
  FROM z
)
SELECT CAST(64 AS BIGINT) AS n_registers,
       ROUND(e, 4) AS hll_estimate,
       (SELECT COUNT(DISTINCT o_custkey) FROM orders) AS exact_distinct,
       ROUND((e - (SELECT COUNT(DISTINCT o_custkey) FROM orders))
             / (SELECT COUNT(DISTINCT o_custkey) FROM orders), 4) AS rel_error
FROM est
"""


@register("agg_hll_sketch", _HLL_SQL)
def agg_hll_sketch(spark, sf_dir):
    """HyperLogLog cardinality sketch built from scratch with a
    CROSS-ENGINE-DETERMINISTIC hash (md5 prefix → 60-bit integer,
    the minhash/CMS precedent): 64 registers, bucket = h mod 64,
    rho = leading-zero rank of the remaining 54 bits computed by
    exact bit-string arithmetic (55 − bit_length), harmonic-mean
    estimator with the standard small-range linear-counting
    correction. Both engines materialize the IDENTICAL register
    array, so the estimate matches to the last bit — the sketch
    itself is verified, not just its error bound. One
    register-keyed aggregation (64 groups), mergeable by MAX —
    the textbook distributed-cardinality shape."""
    from pyspark.sql import functions as F

    from stockify_spark.registry import _t

    orders = _t(spark, sf_dir, "orders")
    h = orders.select(
        F.conv(F.substring(F.md5(F.col("o_custkey").cast("string")), 1, 15), 16, 10)
        .cast("long")
        .alias("hv")
    )
    w = (F.col("hv") / 64).cast("long")
    # Spark's bin() emits no leading zeros, so for w > 0 its length IS
    # the bit length (the w = 0 case is handled by the guard branch);
    # DuckDB's bin() is also unpadded, the oracle's ltrim is a no-op
    # kept for explicitness.
    rho = F.when(w == 0, F.lit(55)).otherwise(55 - F.length(F.bin(w)))
    reg = h.groupBy((F.col("hv") % 64).alias("bucket")).agg(F.max(rho).alias("rho"))
    allreg = (
        orders.sparkSession.range(64)
        .select(F.col("id").alias("bucket"))
        .join(reg, "bucket", "left")
        .select(F.coalesce(F.col("rho"), F.lit(0)).alias("m"))
    )
    z = allreg.agg(
        F.round(F.sum(F.pow(F.lit(2.0), -F.col("m"))), 12).alias("zsum"),
        F.sum(F.when(F.col("m") == 0, 1).otherwise(0)).alias("v"),
    )
    alpha_mm = (0.7213 / (1.0 + 1.079 / 64.0)) * 64.0 * 64.0
    raw = alpha_mm / F.col("zsum")
    e = F.when(
        (raw <= 2.5 * 64.0) & (F.col("v") > 0), 64.0 * F.log(64.0 / F.col("v"))
    ).otherwise(raw)
    exact = orders.agg(F.countDistinct("o_custkey").alias("x"))
    return (
        z.select(e.alias("e"))
        .crossJoin(F.broadcast(exact))
        .select(
            F.lit(64).cast("long").alias("n_registers"),
            F.round("e", 4).alias("hll_estimate"),
            F.col("x").cast("long").alias("exact_distinct"),
            F.round((F.col("e") - F.col("x")) / F.col("x"), 4).alias("rel_error"),
        )
    )


_EDGE_CTE18 = (
    "pairs AS (SELECT DISTINCT"
    "   LEAST(l_orderkey % 80, l_partkey % 80) AS a,"
    "   GREATEST(l_orderkey % 80, l_partkey % 80) AS b"
    "  FROM lineitem WHERE l_orderkey % 80 <> l_partkey % 80),"
    " e AS (SELECT a, b FROM pairs WHERE"
    "  CAST(CONCAT('0x', substr(md5(CAST(a AS VARCHAR) || ':' ||"
    "   CAST(b AS VARCHAR)), 1, 4)) AS BIGINT) % 100 < 12)"
)

_MODULARITY_SQL = f"""
WITH {_EDGE_CTE18},
und AS (SELECT a AS u, b AS v FROM e UNION ALL SELECT b AS u, a AS v FROM e),
deg AS (SELECT u, COUNT(*) AS d FROM und GROUP BY u),
m AS (SELECT CAST(COUNT(*) AS DOUBLE) AS m FROM e),
within AS (
  SELECT a % 8 AS community, COUNT(*) AS e_in
  FROM e WHERE a % 8 = b % 8 GROUP BY a % 8
),
degc AS (
  SELECT u % 8 AS community, SUM(d) AS deg_sum FROM deg GROUP BY u % 8
)
SELECT CAST(dc.community AS BIGINT) AS community,
       CAST(COALESCE(w.e_in, 0) AS BIGINT) AS edges_within,
       CAST(dc.deg_sum AS BIGINT) AS degree_sum,
       ROUND(COALESCE(w.e_in, 0) / m.m
             - (dc.deg_sum / (2.0 * m.m)) * (dc.deg_sum / (2.0 * m.m)),
             6) AS q_contribution
FROM degc dc CROSS JOIN m LEFT JOIN within w ON w.community = dc.community
"""


@register("graph_modularity", _MODULARITY_SQL)
def graph_modularity(spark, sf_dir):
    """Newman modularity of the vertex-residue partition (community
    = v mod 8) on the shared residue graph: per community,
    Q_c = e_c/m − (Σdeg_c / 2m)², summing to the partition's Q. All
    distributed sums are integer (edge counts, degree sums) — the
    graph_assortativity determinism argument — and the per-community
    result is 8 rows from two tiny aggregations over the edge
    list."""
    from pyspark.sql import functions as F

    from stockify_spark.registry import _t

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
    # localCheckpoint, not persist: e feeds three consumers (degree
    # union, m count, within filter) but persist() pins a CacheManager
    # entry per invocation with no unpersist hook — repeat invocations
    # reuse it and a long session accumulates pinned storage (the
    # llm/dedup.py minhash_lsh_pairs lesson, r14)
    e = pairs.where(coin % 100 < 12).localCheckpoint()
    und = e.select(F.col("a").alias("u")).unionAll(e.select(F.col("b").alias("u")))
    deg = und.groupBy("u").agg(F.count(F.lit(1)).alias("d"))
    m = e.count()
    within = (
        e.filter(F.col("a") % 8 == F.col("b") % 8)
        .groupBy((F.col("a") % 8).alias("community"))
        .agg(F.count(F.lit(1)).alias("e_in"))
    )
    degc = deg.groupBy((F.col("u") % 8).alias("community")).agg(
        F.sum("d").alias("deg_sum")
    )
    md = float(m)
    return (
        degc.join(within, "community", "left")
        .select(
            F.col("community").cast("long").alias("community"),
            F.coalesce(F.col("e_in"), F.lit(0)).cast("long").alias("edges_within"),
            F.col("deg_sum").cast("long").alias("degree_sum"),
            F.round(
                F.coalesce(F.col("e_in"), F.lit(0)) / md
                - (F.col("deg_sum") / (2.0 * md)) * (F.col("deg_sum") / (2.0 * md)),
                6,
            ).alias("q_contribution"),
        )
    )


_PCA_SQL = """
WITH mo AS (
  SELECT CAST(COUNT(*) AS DOUBLE) AS n,
         ROUND(SUM(l_quantity), 2) AS sx,
         ROUND(SUM(l_discount), 2) AS sy,
         ROUND(SUM(l_quantity * l_quantity), 2) AS sxx,
         ROUND(SUM(l_quantity * l_discount), 2) AS sxy,
         ROUND(SUM(l_discount * l_discount), 4) AS syy
  FROM lineitem
),
cov AS (
  SELECT n,
         sxx / n - (sx / n) * (sx / n) AS cxx,
         sxy / n - (sx / n) * (sy / n) AS cxy,
         syy / n - (sy / n) * (sy / n) AS cyy
  FROM mo
),
eig AS (
  SELECT n, cxx, cxy, cyy,
         (cxx + cyy) / 2.0
           + sqrt((cxx - cyy) * (cxx - cyy) / 4.0 + cxy * cxy) AS lam1,
         (cxx + cyy) / 2.0
           - sqrt((cxx - cyy) * (cxx - cyy) / 4.0 + cxy * cxy) AS lam2
  FROM cov
)
SELECT CAST(n AS BIGINT) AS n_rows,
       ROUND(lam1, 6) AS lambda1, ROUND(lam2, 6) AS lambda2,
       ROUND(lam1 / (lam1 + lam2), 6) AS explained_ratio,
       ROUND(cxy, 6) AS v1_x, ROUND(lam1 - cxx, 6) AS v1_y
FROM eig
"""


@register("ml_pca_2d", _PCA_SQL)
def ml_pca_2d(spark, sf_dir):
    """2-D PCA in closed form over (l_quantity, l_discount): pinned
    moment sums (the ml_ridge_closed_form pattern) → covariance
    entries → eigenvalues by the symmetric-2×2 quadratic formula
    (sqrt is IEEE-correctly-rounded, so identical operands give
    identical results — no transcendental risk), explained-variance
    ratio, and the λ1 eigenvector reported UNNORMALIZED as
    (cxy, λ1 − cxx) to avoid a second sqrt. Distributed cost: one
    map-side moment pass, zero iterations."""
    from pyspark.sql import functions as F

    from stockify_spark.registry import _t

    li = _t(spark, sf_dir, "lineitem")
    x, y = F.col("l_quantity"), F.col("l_discount")
    mo = li.agg(
        F.count(F.lit(1)).cast("double").alias("n"),
        F.round(F.sum(x), 2).alias("sx"),
        F.round(F.sum(y), 2).alias("sy"),
        F.round(F.sum(x * x), 2).alias("sxx"),
        F.round(F.sum(x * y), 2).alias("sxy"),
        F.round(F.sum(y * y), 4).alias("syy"),
    )
    c = F.col
    cov = mo.select(
        "n",
        (c("sxx") / c("n") - (c("sx") / c("n")) * (c("sx") / c("n"))).alias("cxx"),
        (c("sxy") / c("n") - (c("sx") / c("n")) * (c("sy") / c("n"))).alias("cxy"),
        (c("syy") / c("n") - (c("sy") / c("n")) * (c("sy") / c("n"))).alias("cyy"),
    )
    disc = F.sqrt((c("cxx") - c("cyy")) * (c("cxx") - c("cyy")) / 4.0 + c("cxy") * c("cxy"))
    eig = cov.select(
        "n", "cxx", "cxy", "cyy",
        ((c("cxx") + c("cyy")) / 2.0 + disc).alias("lam1"),
        ((c("cxx") + c("cyy")) / 2.0 - disc).alias("lam2"),
    )
    return eig.select(
        c("n").cast("long").alias("n_rows"),
        F.round("lam1", 6).alias("lambda1"),
        F.round("lam2", 6).alias("lambda2"),
        F.round(c("lam1") / (c("lam1") + c("lam2")), 6).alias("explained_ratio"),
        F.round("cxy", 6).alias("v1_x"),
        F.round(c("lam1") - c("cxx"), 6).alias("v1_y"),
    )


_ICHIMOKU_SQL = f"""
WITH stocks AS ({_RAMP18}),
w AS (
  SELECT row_id,
         (MAX(high) OVER w9 + MIN(low) OVER w9) / 2 AS tenkan,
         (MAX(high) OVER w26 + MIN(low) OVER w26) / 2 AS kijun,
         (MAX(high) OVER w52 + MIN(low) OVER w52) / 2 AS senkou_b_raw,
         close
  FROM stocks
  WINDOW w9 AS (ORDER BY row_id ROWS BETWEEN 8 PRECEDING AND CURRENT ROW),
         w26 AS (ORDER BY row_id ROWS BETWEEN 25 PRECEDING AND CURRENT ROW),
         w52 AS (ORDER BY row_id ROWS BETWEEN 51 PRECEDING AND CURRENT ROW)
)
SELECT row_id,
       ROUND(tenkan, 6) AS tenkan,
       ROUND(kijun, 6) AS kijun,
       ROUND(lag((tenkan + kijun) / 2, 26) OVER (ORDER BY row_id), 6)
         AS senkou_a,
       ROUND(lag(senkou_b_raw, 26) OVER (ORDER BY row_id), 6) AS senkou_b,
       ROUND(lead(close, 26) OVER (ORDER BY row_id), 6) AS chikou
FROM w
"""


@register("stocks_ichimoku", _ICHIMOKU_SQL)
def stocks_ichimoku(spark, sf_dir):
    """Ichimoku cloud: conversion/base lines as (rolling-max-high +
    rolling-min-low)/2 at 9/26 bars, leading spans A/B displaced 26
    bars forward (lag), lagging span displaced 26 back (lead) —
    NULLs at the displaced edges on both faces. Pure bounded-frame
    extrema + lag/lead; completes the reference domain's indicator
    toolkit on its own rolling-extrema primitives (stockify.cu:
    142-193). Same 1-part global-order parity convention as
    stocks_atr."""
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    from stockify_spark.sources.fixtures import stocks_ramp

    s = stocks_ramp(spark, cycles=100)
    w9 = Window.orderBy("row_id").rowsBetween(-8, 0)
    w26 = Window.orderBy("row_id").rowsBetween(-25, 0)
    w52 = Window.orderBy("row_id").rowsBetween(-51, 0)
    wo = Window.orderBy("row_id")
    tenkan = (F.max("high").over(w9) + F.min("low").over(w9)) / 2
    kijun = (F.max("high").over(w26) + F.min("low").over(w26)) / 2
    senkou_b_raw = (F.max("high").over(w52) + F.min("low").over(w52)) / 2
    base = s.select(
        "row_id",
        tenkan.alias("tenkan"),
        kijun.alias("kijun"),
        senkou_b_raw.alias("senkou_b_raw"),
        "close",
    )
    return base.select(
        "row_id",
        F.round("tenkan", 6).alias("tenkan"),
        F.round("kijun", 6).alias("kijun"),
        F.round(F.lag((F.col("tenkan") + F.col("kijun")) / 2, 26).over(wo), 6).alias(
            "senkou_a"
        ),
        F.round(F.lag("senkou_b_raw", 26).over(wo), 6).alias("senkou_b"),
        F.round(F.lead("close", 26).over(wo), 6).alias("chikou"),
    )
