"""Round-13 extension wave 101: paired/blocked nonparametrics,
stratified odds, elasticity, M4 downsampling, business-day
arithmetic.

Wilcoxon signed-rank (the PAIRED complement to stats_mannwhitney),
Friedman's blocked rank test (k related samples), the
Mantel-Haenszel pooled odds ratio (the stratified-confounding
standard), log-log price elasticity (the econ regression identity),
M4 downsampling (the min/max/first/last-per-pixel time-series
rendering standard next to window_lttb), and calendar business-day
arithmetic as a pure column expression.
"""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F

from stockify_spark.registry import register, _t

# ---------------------------------------------------------------------------
# stats_wilcoxon_signed_rank — paired nonparametric test
# ---------------------------------------------------------------------------

_WSR_SQL = """
WITH p AS (
  SELECT value - LAG(value) OVER w AS d
  FROM events WHERE event_type IN ('click', 'view')
  WINDOW w AS (PARTITION BY user_id ORDER BY epoch_ms(ts), event_id)),
nz AS (SELECT d, abs(d) AS ad FROM p WHERE d IS NOT NULL AND d <> 0),
r AS (SELECT d, RANK() OVER (ORDER BY ad) AS rnk,
             COUNT(*) OVER (PARTITION BY ad) AS ties
      FROM nz),
s AS (SELECT CAST(COUNT(*) AS DOUBLE) AS n,
             SUM(CASE WHEN d > 0 THEN rnk + (ties - 1) / 2.0 ELSE 0 END)
               AS wplus
      FROM r)
SELECT CAST(n AS BIGINT) AS n_pairs,
       ROUND(wplus, 2) AS w_plus,
       ROUND((wplus - n * (n + 1) / 4)
             / sqrt(n * (n + 1) * (2 * n + 1) / 24), 6) AS z
FROM s
"""


@register("stats_wilcoxon_signed_rank", _WSR_SQL)
def stats_wilcoxon_signed_rank(spark, sf_dir, _debug: dict | None = None):
    """Wilcoxon signed-rank test on consecutive-measurement
    differences within each user's click/view series — the PAIRED
    nonparametric location test (stats_mannwhitney is the unpaired
    one; stats_ttest the parametric paired-adjacent): zero diffs
    drop (the standard treatment), |d| gets MIDRANKS (the
    stats_gini_auc tie rule), W⁺ sums positive-diff ranks, z is the
    large-sample normal score. Diffs are per-row exact; only the
    rank-sum statistics round.

    Shape (r14 rewrite, operators/ranks.py): the per-user lag
    window shuffles on user_id (parallel, unchanged); the |d|
    MIDRANK — the r13-flagged full-table global rank — now comes
    from the distinct-|d| prefix-sum: W⁺ = Σ_values
    npos(v)·midrank(v), so only |distinct diffs| rows cross the
    single-partition stage. Exact-double diffs group identically on
    both faces (the oracle already partitions by raw ad); sums are
    exact half-integers, hash-equal to the unchanged oracle."""
    from stockify_spark.operators.ranks import distinct_value_ranks

    ev = _t(spark, sf_dir, "events").filter(
        F.col("event_type").isin("click", "view")
    )
    w = Window.partitionBy("user_id").orderBy(F.unix_millis("ts"), "event_id")
    p = ev.select((F.col("value") - F.lag("value").over(w)).alias("d")).filter(
        F.col("d").isNotNull() & (F.col("d") != 0)
    )
    nz = p.withColumn("ad", F.abs("d"))
    g = distinct_value_ranks(
        nz,
        "ad",
        {
            "npos": F.sum(
                F.when(F.col("d") > 0, 1).otherwise(0)
            ).cast("long")
        },
    )
    if _debug is not None:
        _debug["rank_frame"] = g
    s = g.agg(
        F.sum("cnt").cast("double").alias("n"),
        F.sum(F.col("npos") * F.col("midrank")).alias("wplus"),
    )
    n, wplus = F.col("n"), F.col("wplus")
    return s.select(
        n.cast("bigint").alias("n_pairs"),
        F.round(wplus, 2).alias("w_plus"),
        F.round(
            (wplus - n * (n + 1) / 4) / F.sqrt(n * (n + 1) * (2 * n + 1) / 24), 6
        ).alias("z"),
    )


# ---------------------------------------------------------------------------
# stats_friedman — blocked rank test across event types
# ---------------------------------------------------------------------------

_FRIEDMAN_SQL = """
WITH cell AS (
  SELECT user_id, event_type, AVG(value) AS m
  FROM events GROUP BY 1, 2),
full_blocks AS (
  SELECT user_id FROM cell GROUP BY user_id HAVING COUNT(*) = 5),
rk AS (
  SELECT c.user_id, c.event_type,
         CAST(RANK() OVER (PARTITION BY c.user_id ORDER BY c.m, c.event_type)
              AS DOUBLE) AS r
  FROM cell c JOIN full_blocks USING (user_id)),
rs AS (SELECT event_type, AVG(r) AS rbar, CAST(COUNT(*) AS DOUBLE) AS n
       FROM rk GROUP BY 1)
SELECT CAST(MAX(n) AS BIGINT) AS n_blocks,
       CAST(COUNT(*) AS INT) AS k_treatments,
       ROUND(12 * MAX(n) / (COUNT(*) * (COUNT(*) + 1))
             * (SUM(rbar * rbar)
                - 2 * ((COUNT(*) + 1) / 2.0) * SUM(rbar)
                + COUNT(*) * ((COUNT(*) + 1) / 2.0) * ((COUNT(*) + 1) / 2.0)),
             6) AS chi2_f
FROM rs
"""


@register("stats_friedman", _FRIEDMAN_SQL)
def stats_friedman(spark, sf_dir):
    """Friedman's rank test of whether the five event types differ in
    typical value, BLOCKED by user (each user ranks their own five
    per-type means 1..5, so between-user level differences cancel —
    the repeated-measures design stats_anova ignores): χ²_F =
    12n/(k(k+1)) Σ_j (R̄_j − (k+1)/2)². Only users with all five
    types enter (complete blocks, the classical form); mean ties
    within a block break by event_type so both engines rank
    identically.

    Shape: one (user, type) aggregate, a HAVING-filtered
    completeness semi-join, per-block ranks over 5-row partitions,
    one 5-row fold."""
    cell = _t(spark, sf_dir, "events").groupBy("user_id", "event_type").agg(
        F.avg("value").alias("m")
    )
    full = cell.groupBy("user_id").agg(F.count(F.lit(1)).alias("kk")).filter(
        F.col("kk") == 5
    ).select("user_id")
    rk = cell.join(F.broadcast(full), "user_id").select(
        "user_id",
        "event_type",
        F.rank()
        .over(Window.partitionBy("user_id").orderBy("m", "event_type"))
        .cast("double")
        .alias("r"),
    )
    rs = rk.groupBy("event_type").agg(
        F.avg("r").alias("rbar"), F.count(F.lit(1)).cast("double").alias("n")
    )
    agg = rs.agg(
        F.max("n").alias("n"),
        F.count(F.lit(1)).cast("double").alias("k"),
        F.sum(F.col("rbar") * F.col("rbar")).alias("r2"),
        F.sum("rbar").alias("r1"),
    )
    n, k = F.col("n"), F.col("k")
    ss = F.col("r2") - 2 * ((k + 1) / 2.0) * F.col("r1") + k * ((k + 1) / 2.0) * (
        (k + 1) / 2.0
    )
    return agg.select(
        n.cast("bigint").alias("n_blocks"),
        k.cast("int").alias("k_treatments"),
        F.round(12 * n / (k * (k + 1)) * ss, 6).alias("chi2_f"),
    )


# ---------------------------------------------------------------------------
# orders_price_elasticity — log-log demand regression per brand
# ---------------------------------------------------------------------------

_ELAST_SQL = """
WITH d AS (
  SELECT p_brand AS brand,
         ln(l_extendedprice / l_quantity) AS lp,
         ln(l_quantity) AS lq
  FROM lineitem JOIN part ON l_partkey = p_partkey
  WHERE l_quantity > 0)
SELECT brand, CAST(COUNT(*) AS BIGINT) AS n,
       ROUND(COVAR_POP(lp, lq) / VAR_POP(lp), 6) AS elasticity,
       ROUND(AVG(lq) - (COVAR_POP(lp, lq) / VAR_POP(lp)) * AVG(lp), 6)
         AS log_intercept
FROM d GROUP BY brand
"""


@register("orders_price_elasticity", _ELAST_SQL)
def orders_price_elasticity(spark, sf_dir):
    """Own-price elasticity of demand per brand by the log-log OLS
    identity: ε = cov(ln p, ln q)/var(ln p) — the constant-elasticity
    regression every pricing team fits first (unit price from the
    extended/quantity ratio). The slope-as-moments form needs ONE
    aggregate per brand, no iterative fit (the ml_linreg_group
    identity applied to the econ question).

    Shape: one broadcast dim join (part), one per-brand moment
    aggregate with map-side combine — a single fact scan."""
    li = _t(spark, sf_dir, "lineitem").filter(F.col("l_quantity") > 0)
    pt = _t(spark, sf_dir, "part").select("p_partkey", "p_brand")
    d = li.join(F.broadcast(pt), li["l_partkey"] == pt["p_partkey"]).select(
        F.col("p_brand").alias("brand"),
        F.log(F.col("l_extendedprice") / F.col("l_quantity")).alias("lp"),
        F.log("l_quantity").alias("lq"),
    )
    slope = F.covar_pop("lp", "lq") / F.var_pop("lp")
    return d.groupBy("brand").agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.round(slope, 6).alias("elasticity"),
        F.round(F.avg("lq") - slope * F.avg("lp"), 6).alias("log_intercept"),
    )


# ---------------------------------------------------------------------------
# stats_odds_ratio_mh — Mantel-Haenszel pooled odds ratio
# ---------------------------------------------------------------------------

_MH_SQL = """
WITH med AS (SELECT median(o_totalprice) AS md FROM orders),
cell AS (
  SELECT o_orderpriority AS stratum,
         CAST(SUM(CASE WHEN o_totalprice > md AND o_orderstatus = 'F'
                       THEN 1 ELSE 0 END) AS DOUBLE) AS a,
         CAST(SUM(CASE WHEN o_totalprice > md AND o_orderstatus <> 'F'
                       THEN 1 ELSE 0 END) AS DOUBLE) AS b,
         CAST(SUM(CASE WHEN o_totalprice <= md AND o_orderstatus = 'F'
                       THEN 1 ELSE 0 END) AS DOUBLE) AS c,
         CAST(SUM(CASE WHEN o_totalprice <= md AND o_orderstatus <> 'F'
                       THEN 1 ELSE 0 END) AS DOUBLE) AS d,
         CAST(COUNT(*) AS DOUBLE) AS n
  FROM orders CROSS JOIN med GROUP BY 1)
SELECT stratum,
       ROUND((a * d) / (b * c), 6) AS stratum_or,
       ROUND(SUM(a * d / n) OVER () / SUM(b * c / n) OVER (), 6) AS mh_or
FROM cell
"""


@register("stats_odds_ratio_mh", _MH_SQL)
def stats_odds_ratio_mh(spark, sf_dir):
    """Mantel-Haenszel pooled odds ratio of (price above median) on
    (F status), STRATIFIED by order priority: OR_MH =
    Σ(aᵢdᵢ/nᵢ) / Σ(bᵢcᵢ/nᵢ) — the classic confounding-adjusted
    association measure; the per-stratum ORs ride along so Simpson
    reversals are visible in the same result. All cells are exact
    integer counts off ONE conditional-aggregate pass (plus the
    scalar median broadcast stats_mcnemar also uses).

    Shape: two scans (median + cells), then arithmetic on a 5-row
    table."""
    o = _t(spark, sf_dir, "orders")
    med = o.agg(F.percentile("o_totalprice", 0.5).alias("md"))
    hi = F.col("o_totalprice") > F.col("md")
    bad = F.col("o_orderstatus") == "F"
    cell = (
        o.crossJoin(F.broadcast(med))
        .groupBy(F.col("o_orderpriority").alias("stratum"))
        .agg(
            F.sum(F.when(hi & bad, 1).otherwise(0)).cast("double").alias("a"),
            F.sum(F.when(hi & ~bad, 1).otherwise(0)).cast("double").alias("b"),
            F.sum(F.when(~hi & bad, 1).otherwise(0)).cast("double").alias("c"),
            F.sum(F.when(~hi & ~bad, 1).otherwise(0)).cast("double").alias("d"),
            F.count(F.lit(1)).cast("double").alias("n"),
        )
    )
    wfull = Window.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    return cell.select(
        "stratum",
        F.round((F.col("a") * F.col("d")) / (F.col("b") * F.col("c")), 6).alias(
            "stratum_or"
        ),
        F.round(
            F.sum(F.col("a") * F.col("d") / F.col("n")).over(wfull)
            / F.sum(F.col("b") * F.col("c") / F.col("n")).over(wfull),
            6,
        ).alias("mh_or"),
    )


# ---------------------------------------------------------------------------
# window_downsample_m4 — the M4 time-series rendering operator
# ---------------------------------------------------------------------------

_M4_BUCKETS = 16

_M4_SQL = f"""
WITH s AS (
  SELECT user_id, value, epoch_ms(ts) AS ms, event_id,
         ROW_NUMBER() OVER w AS rn, COUNT(*) OVER (PARTITION BY user_id) AS n
  FROM events
  WINDOW w AS (PARTITION BY user_id ORDER BY epoch_ms(ts), event_id)),
b AS (SELECT user_id, value, ms, rn,
             CAST(((rn - 1) * {_M4_BUCKETS}) // n AS INT) AS bucket
      FROM s)
SELECT user_id, bucket,
       CAST(COUNT(*) AS BIGINT) AS n_in,
       MIN(value) AS v_min, MAX(value) AS v_max,
       MIN(CASE WHEN rn = brn THEN value END) AS v_first,
       MIN(CASE WHEN rn = ern THEN value END) AS v_last
FROM (SELECT *, MIN(rn) OVER (PARTITION BY user_id, bucket) AS brn,
              MAX(rn) OVER (PARTITION BY user_id, bucket) AS ern
      FROM b)
GROUP BY user_id, bucket
"""


@register("window_downsample_m4", _M4_SQL)
def window_downsample_m4(spark, sf_dir):
    """M4 downsampling (Jugel et al., VLDB 2014) of each user's
    series into 16 equal-count pixel buckets: (min, max, first,
    last) per bucket — the aggregation that makes a downsampled
    line chart PIXEL-IDENTICAL to the full-resolution rendering,
    where window_lttb optimizes perceptual area instead; together
    they are the two canonical chart-downsampling operators. Buckets
    are row-number based (deterministic (ts, event_id) order) so
    both engines cut identical pixels.

    Shape: one series-key window shuffle for the row numbers, one
    (user, bucket) aggregate — first/last come from the bucket's
    min/max row number in the same pass, no extra join."""
    ev = _t(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy(F.unix_millis("ts"), "event_id")
    s = ev.select(
        "user_id",
        "value",
        F.row_number().over(w).alias("rn"),
        F.count(F.lit(1))
        .over(Window.partitionBy("user_id"))
        .alias("n"),
    )
    b = s.withColumn(
        "bucket", F.expr(f"((rn - 1) * {_M4_BUCKETS}) div n").cast("int")
    )
    wb = Window.partitionBy("user_id", "bucket")
    b = b.withColumn("brn", F.min("rn").over(wb)).withColumn(
        "ern", F.max("rn").over(wb)
    )
    return b.groupBy("user_id", "bucket").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_in"),
        F.min("value").alias("v_min"),
        F.max("value").alias("v_max"),
        F.min(F.when(F.col("rn") == F.col("brn"), F.col("value"))).alias(
            "v_first"
        ),
        F.min(F.when(F.col("rn") == F.col("ern"), F.col("value"))).alias("v_last"),
    )


# ---------------------------------------------------------------------------
# fn_business_days — closed-form weekday arithmetic
# ---------------------------------------------------------------------------

# business days in (start, od]: full weeks contribute 5 each; the
# remainder is a run of rem consecutive days starting at Monday-index
# a = (a0_start + 1) mod 7, whose weekday count has the closed form
#   f(a, rem) = max(0, min(a+rem, 5) - min(a, 5))     (pre-wrap part)
#             + max(0, min(a+rem-7, 5))               (post-wrap part)
_BDAYS_SQL = """
WITH t0 AS (SELECT MIN(o_orderdate) AS d0 FROM orders),
d AS (
  SELECT o_orderkey,
         date_diff('day', CAST(d0 AS DATE), CAST(o_orderdate AS DATE)) AS cal,
         CAST((EXTRACT(dow FROM CAST(d0 AS DATE)) + 6) % 7 AS BIGINT) AS a0
  FROM orders CROSS JOIN t0),
e AS (SELECT o_orderkey, cal, (a0 + 1) % 7 AS a, cal % 7 AS rem FROM d)
SELECT o_orderkey, cal AS calendar_days,
       CAST((cal // 7) * 5
            + greatest(0, least(a + rem, 5) - least(a, 5))
            + greatest(0, least(a + rem - 7, 5)) AS BIGINT) AS business_days
FROM e
ORDER BY o_orderkey
LIMIT 200
"""


@register("fn_business_days", _BDAYS_SQL)
def fn_business_days(spark, sf_dir):
    """Business (Mon-Fri) days between the corpus's first order date
    and each order date, as a PURE closed-form column expression —
    no calendar explode, no UDF: full weeks times five plus a
    two-term min/max count of weekdays in the remainder run (the
    date-dimension-free form an SLA/lead-time pipeline wants at
    100 TB, where exploding a day-per-row calendar per fact row is
    the anti-pattern). First 200 orderkeys keep the differential row
    set bounded; the expression itself is exercised across every
    weekday phase because the corpus spans years.

    Shape: scalar min-date broadcast, then map-side integer
    arithmetic — a single scan, no shuffle beyond the TakeOrdered."""
    o = _t(spark, sf_dir, "orders")
    t0 = o.agg(F.min("o_orderdate").alias("d0"))
    # Monday-index of a date: Spark dayofweek is 1=Sun..7=Sat
    a0 = (F.dayofweek(F.col("d0")) + 5) % 7
    d = o.crossJoin(F.broadcast(t0)).select(
        "o_orderkey",
        F.datediff(F.col("o_orderdate"), F.col("d0")).cast("bigint").alias("cal"),
        a0.cast("bigint").alias("a0"),
    )
    e = d.select(
        "o_orderkey",
        "cal",
        ((F.col("a0") + 1) % 7).alias("a"),
        (F.col("cal") % 7).alias("rem"),
    )
    zero = F.lit(0).cast("bigint")
    bdays = (
        F.expr("cal div 7") * 5
        + F.greatest(
            zero,
            F.least(F.col("a") + F.col("rem"), F.lit(5).cast("bigint"))
            - F.least(F.col("a"), F.lit(5).cast("bigint")),
        )
        + F.greatest(
            zero,
            F.least(F.col("a") + F.col("rem") - 7, F.lit(5).cast("bigint")),
        )
    )
    return (
        e.select(
            "o_orderkey",
            F.col("cal").alias("calendar_days"),
            bdays.cast("bigint").alias("business_days"),
        )
        .orderBy("o_orderkey")
        .limit(200)
    )
