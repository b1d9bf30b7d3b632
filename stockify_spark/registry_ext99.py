"""Round-13 extension wave 99: directional statistics, collinearity
audit, Katz centrality, and decomposition strength.

``window_circular_stats`` opens the directional-statistics family
(time-of-day is an angle; an arithmetic mean of hours puts 23:00 and
01:00 "far apart"). ``stats_vif`` is the multicollinearity gate run
before trusting ml_linreg_group/ml_ridge coefficients, via the
closed-form 3×3 correlation inverse. ``graph_katz_centrality``
completes the centrality trio next to pagerank (random-surfer) and
HITS (mutual reinforcement) with the attenuation-weighted walk
count. ``stats_seasonal_strength`` reduces window_seasonal's
decomposition to Hyndman-Wang trend/seasonal strength — the scalar a
forecasting pipeline actually branches on.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from stockify_spark.registry import register, _t

_TWO_PI = 6.283185307179586
_DAY_MS = 86400000.0

# ---------------------------------------------------------------------------
# window_circular_stats — time-of-day as an angle
# ---------------------------------------------------------------------------

_CIRC_SQL = f"""
WITH a AS (
  SELECT event_type,
         {_TWO_PI} * (CAST(epoch_ms(ts) % 86400000 AS DOUBLE) / {_DAY_MS})
           AS theta
  FROM events),
s AS (SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n,
             SUM(cos(theta)) AS c, SUM(sin(theta)) AS s
      FROM a GROUP BY 1)
SELECT event_type, n,
       ROUND(sqrt(c * c + s * s) / n, 6) AS r_bar,
       ROUND(1 - sqrt(c * c + s * s) / n, 6) AS circ_var,
       ROUND(fmod(atan2(s, c) + {_TWO_PI}, {_TWO_PI}) * 24 / {_TWO_PI}, 6)
         AS mean_hour
FROM s
"""


@register("window_circular_stats", _CIRC_SQL)
def window_circular_stats(spark, sf_dir):
    """Circular statistics of event time-of-day per event type
    (Fisher 1993): each timestamp becomes an angle θ = 2π·(ms of
    day)/day, the mean direction is atan2(Σsin, Σcos) mapped back to
    hours, and the resultant length R̄ = |Σe^{{iθ}}|/n measures
    concentration (circular variance = 1 − R̄). The arithmetic mean
    of hours is WRONG at the midnight wrap — this is the statistic
    that isn't.

    Shape: one map-side trig pass, one per-type aggregate of two
    sums — the minimal two-accumulator reduction; trig is per-row
    identical on both engines and the sums round at 6dp."""
    a = _t(spark, sf_dir, "events").select(
        "event_type",
        (
            _TWO_PI * ((F.unix_millis("ts") % 86400000).cast("double") / _DAY_MS)
        ).alias("theta"),
    )
    s = a.groupBy("event_type").agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.sum(F.cos("theta")).alias("c"),
        F.sum(F.sin("theta")).alias("s"),
    )
    rlen = F.sqrt(F.col("c") * F.col("c") + F.col("s") * F.col("s")) / F.col("n")
    return s.select(
        "event_type",
        "n",
        F.round(rlen, 6).alias("r_bar"),
        F.round(1 - rlen, 6).alias("circ_var"),
        F.round(
            F.pmod(F.atan2(F.col("s"), F.col("c")) + _TWO_PI, F.lit(_TWO_PI))
            * 24
            / _TWO_PI,
            6,
        ).alias("mean_hour"),
    )


# ---------------------------------------------------------------------------
# stats_vif — variance inflation factors via the correlation inverse
# ---------------------------------------------------------------------------

_VIF_SQL = """
WITH f AS (
  SELECT CAST(n_chars AS DOUBLE) AS x1,
         CAST(len(string_split(text, ' ')) AS DOUBLE) AS x2,
         CAST(n_chars AS DOUBLE) / CAST(len(string_split(text, ' ')) AS DOUBLE)
           AS x3
  FROM documents),
r AS (SELECT corr(x1, x2) AS r12, corr(x1, x3) AS r13, corr(x2, x3) AS r23
      FROM f),
d AS (SELECT r12, r13, r23,
             1 + 2 * r12 * r13 * r23 - r12 * r12 - r13 * r13 - r23 * r23
               AS det
      FROM r)
SELECT ROUND((1 - r23 * r23) / det, 6) AS vif_x1,
       ROUND((1 - r13 * r13) / det, 6) AS vif_x2,
       ROUND((1 - r12 * r12) / det, 6) AS vif_x3,
       ROUND(r12, 6) AS r12, ROUND(r13, 6) AS r13, ROUND(r23, 6) AS r23
FROM d
"""


@register("stats_vif", _VIF_SQL)
def stats_vif(spark, sf_dir):
    """Variance inflation factors for the document feature triple
    (n_chars, token count, mean token length): VIF_i is the i-th
    diagonal of the inverse CORRELATION matrix — 1/(1−R²_i) of
    regressing feature i on the others — the collinearity audit run
    before trusting any linear model's coefficients on these
    features (rule of thumb: VIF > 5 means the coefficient is
    unstable). The 3×3 inverse is closed-form off three corr
    aggregates; dq_mahalanobis_outliers uses the same features'
    COVARIANCE inverse for row-level outliers — VIF is the
    column-level companion.

    Shape: one scan, three corr aggregates, scalar arithmetic."""
    d = _t(spark, sf_dir, "documents")
    x2 = F.size(F.split(F.col("text"), " ")).cast("double")
    f = d.select(
        F.col("n_chars").cast("double").alias("x1"),
        x2.alias("x2"),
        (F.col("n_chars").cast("double") / x2).alias("x3"),
    )
    r = f.agg(
        F.corr("x1", "x2").alias("r12"),
        F.corr("x1", "x3").alias("r13"),
        F.corr("x2", "x3").alias("r23"),
    )
    det = (
        1
        + 2 * F.col("r12") * F.col("r13") * F.col("r23")
        - F.col("r12") * F.col("r12")
        - F.col("r13") * F.col("r13")
        - F.col("r23") * F.col("r23")
    )
    return r.select(
        F.round((1 - F.col("r23") * F.col("r23")) / det, 6).alias("vif_x1"),
        F.round((1 - F.col("r13") * F.col("r13")) / det, 6).alias("vif_x2"),
        F.round((1 - F.col("r12") * F.col("r12")) / det, 6).alias("vif_x3"),
        F.round("r12", 6).alias("r12"),
        F.round("r13", 6).alias("r13"),
        F.round("r23", 6).alias("r23"),
    )


# ---------------------------------------------------------------------------
# graph_katz_centrality — attenuation-weighted walk counts
# ---------------------------------------------------------------------------

_KATZ_ALPHA = 0.05
_KATZ_ROUNDS = 3


def _katz_sql(alpha: float = _KATZ_ALPHA, rounds: int = _KATZ_ROUNDS) -> str:
    base = """
WITH li AS (SELECT CAST(l_orderkey % 400 AS BIGINT) AS ra,
                   CAST(l_partkey % 400 AS BIGINT) AS rb FROM lineitem),
e AS MATERIALIZED (SELECT DISTINCT LEAST(ra, rb) AS a, GREATEST(ra, rb) AS b
      FROM li WHERE ra <> rb
        AND CAST(CONCAT('0x', substr(md5(CONCAT(CAST(LEAST(ra, rb) AS VARCHAR),
            ':', CAST(GREATEST(ra, rb) AS VARCHAR))), 1, 8)) AS BIGINT) % 100 < 8),
sym AS MATERIALIZED (SELECT a, b FROM e UNION ALL SELECT b AS a, a AS b FROM e),
x0 AS MATERIALIZED (SELECT DISTINCT a AS node, CAST(1 AS DOUBLE) AS x FROM sym)"""
    for r in range(1, rounds + 1):
        base += f""",
x{r} AS MATERIALIZED (
  SELECT s.a AS node, 1 + {alpha} * SUM(p.x) AS x
  FROM sym s JOIN x{r-1} p ON s.b = p.node
  GROUP BY s.a)"""
    return base + f"\nSELECT node, ROUND(x, 6) AS katz FROM x{rounds}"


@register("graph_katz_centrality", _katz_sql())
def graph_katz_centrality(spark, sf_dir):
    """Katz centrality (Katz 1953) on the residue graph: x ← β +
    αAx with β=1, α=0.05 (safely under 1/λ_max for this degree
    range), EXACTLY 3 rounds from x₀=1 — the bounded-round contract
    of graph_kcore/label_propagation. Counts attenuated walks of
    every length, so isolated-but-connected-to-hubs nodes score
    where raw degree doesn't; the third member of the centrality
    trio after pagerank (stochastic) and HITS (spectral pair).

    Shape per round: one (edges ⋈ scores) shuffle with map-side
    partial sums — scores are node-sized and broadcastable; the edge
    table is localCheckpointed once and reused (the pagerank lineage
    discipline)."""
    from stockify_spark.registry_ext10 import _kcore_sym_edges

    sym = _kcore_sym_edges(spark, sf_dir)
    x = sym.select(F.col("a").alias("node")).distinct().withColumn(
        "x", F.lit(1.0)
    )
    for _ in range(_KATZ_ROUNDS):
        x = (
            sym.join(
                x.withColumnRenamed("node", "b"), "b"
            )
            .groupBy(F.col("a").alias("node"))
            .agg((1 + _KATZ_ALPHA * F.sum("x")).alias("x"))
            .localCheckpoint(eager=False)
        )
    return x.select("node", F.round("x", 6).alias("katz"))


# ---------------------------------------------------------------------------
# stats_seasonal_strength — Hyndman-Wang decomposition strength
# ---------------------------------------------------------------------------

_STRENGTH_SQL = """
WITH daily AS (
  SELECT CAST(o_orderdate AS DATE) AS d, ROUND(SUM(o_totalprice), 6) AS rev
  FROM orders GROUP BY 1),
tr AS (
  SELECT d, rev,
         CASE WHEN COUNT(*) OVER w = 7 THEN AVG(rev) OVER w END AS trend
  FROM daily
  WINDOW w AS (ORDER BY d ROWS BETWEEN 3 PRECEDING AND 3 FOLLOWING)),
se AS (
  SELECT CAST(EXTRACT(dow FROM d) + 1 AS INT) AS dow,
         AVG(rev - trend) AS seasonal
  FROM tr WHERE trend IS NOT NULL GROUP BY 1),
dec AS (
  SELECT tr.rev, tr.trend, se.seasonal,
         tr.rev - tr.trend - se.seasonal AS resid
  FROM tr JOIN se ON CAST(EXTRACT(dow FROM tr.d) + 1 AS INT) = se.dow
  WHERE tr.trend IS NOT NULL)
SELECT CAST(COUNT(*) AS BIGINT) AS n_days,
       ROUND(greatest(0, 1 - VAR_POP(resid) / VAR_POP(rev - seasonal)), 6)
         AS f_trend,
       ROUND(greatest(0, 1 - VAR_POP(resid) / VAR_POP(rev - trend)), 6)
         AS f_seasonal
FROM dec
"""


@register("stats_seasonal_strength", _STRENGTH_SQL)
def stats_seasonal_strength(spark, sf_dir):
    """Hyndman-Wang strength of trend and seasonality (the tsfeatures
    measures): F_T = max(0, 1 − Var(resid)/Var(rev − seasonal)),
    F_S = max(0, 1 − Var(resid)/Var(rev − trend)) over
    window_seasonal's STL-lite decomposition of daily revenue — the
    two scalars a forecasting pipeline branches on (seasonal model
    or not; detrend or not). Reuses the decomposition EXACTLY
    (rounded daily totals, 7-day centered trend, dow seasonal index,
    Spark's 1=Sunday convention reconciled in the oracle).

    Shape: the daily rollup is the only data-sized shuffle; the
    decomposition is one ordered window over ~years-of-days rows, a
    7-row broadcast, and one variance aggregate."""
    o = _t(spark, sf_dir, "orders")
    daily = o.groupBy(F.to_date("o_orderdate").alias("d")).agg(
        F.round(F.sum("o_totalprice"), 6).alias("rev")
    )
    from pyspark.sql import Window

    w = Window.orderBy("d").rowsBetween(-3, 3)
    tr = daily.withColumn(
        "trend",
        F.when(F.count(F.lit(1)).over(w) == 7, F.avg("rev").over(w)),
    )
    se = (
        tr.filter(F.col("trend").isNotNull())
        .groupBy(F.dayofweek("d").alias("dow"))
        .agg(F.avg(F.col("rev") - F.col("trend")).alias("seasonal"))
    )
    dec = (
        tr.filter(F.col("trend").isNotNull())
        .join(F.broadcast(se), F.dayofweek(tr["d"]) == se["dow"])
        .select(
            "rev",
            "trend",
            "seasonal",
            (F.col("rev") - F.col("trend") - F.col("seasonal")).alias("resid"),
        )
    )
    return dec.agg(
        F.count(F.lit(1)).cast("bigint").alias("n_days"),
        F.round(
            F.greatest(
                F.lit(0.0),
                1 - F.var_pop("resid") / F.var_pop(F.col("rev") - F.col("seasonal")),
            ),
            6,
        ).alias("f_trend"),
        F.round(
            F.greatest(
                F.lit(0.0),
                1 - F.var_pop("resid") / F.var_pop(F.col("rev") - F.col("trend")),
            ),
            6,
        ).alias("f_seasonal"),
    )
