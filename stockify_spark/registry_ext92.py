"""Round-13 extension wave 92: robust/classical statistics a data
platform's experimentation + time-series layer still lacked.

Six closed-form statistics, each with an exact ANSI-SQL oracle:
a Savitzky-Golay smoother (the polynomial-preserving filter lab and
sensor pipelines run before peak detection), PACF via the
Durbin-Levinson recursion (the AR-order diagnostic next to
window_acf's MA-side), a negative-binomial method-of-moments fit
(overdispersed count modelling — per-user event counts are the
canonical NB example), a two-sample Poisson rate test (the
conditional-binomial form used for incident/defect rate comparison),
bias-corrected Cramér's V (effect size where stats_chi2 only gives
significance), and Brown-Forsythe (the robust variance-homogeneity
gate run before trusting stats_anova).

All six follow the registry float policy: aggregate statistics are
ROUND()ed identically on both sides; per-row arithmetic written in
the same IEEE order is left exact.
"""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F

from stockify_spark.registry import register, _t


# ---------------------------------------------------------------------------
# window_savitzky_golay — 5-point quadratic SG smoothing per series
# ---------------------------------------------------------------------------

# Classic 5-point quadratic/cubic Savitzky-Golay convolution weights
# (Savitzky & Golay 1964, table I): (-3, 12, 17, 12, -3) / 35.
_SG_SQL = """
SELECT event_id, user_id,
       (-3 * l2 + 12 * l1 + 17 * value + 12 * f1 - 3 * f2) / 35 AS sg
FROM (
  SELECT event_id, user_id, value,
         LAG(value, 2)  OVER w AS l2,
         LAG(value, 1)  OVER w AS l1,
         LEAD(value, 1) OVER w AS f1,
         LEAD(value, 2) OVER w AS f2
  FROM events
  WINDOW w AS (PARTITION BY user_id ORDER BY epoch_ms(ts), event_id))
WHERE l2 IS NOT NULL AND l1 IS NOT NULL
  AND f1 IS NOT NULL AND f2 IS NOT NULL
"""


@register("window_savitzky_golay", _SG_SQL)
def window_savitzky_golay(spark, sf_dir):
    """5-point quadratic Savitzky-Golay smoothing of each user's
    value series: the least-squares polynomial filter that preserves
    2nd/3rd-degree moments where a moving average flattens them
    (window_moving_avg is the degree-0 special case). Interior rows
    only — the standard treatment that avoids asymmetric edge
    weights.

    The convolution is one window pass (two lags + two leads over
    the same frame spec → a single sort within one shuffle by
    user_id), then a per-row dot product with constant weights,
    written in the identical IEEE order on both engines so the
    comparison is EXACT — no rounding needed. Scale shape: one
    hash-partition shuffle on the series key, per-partition sort,
    O(1) state per row; at 100 TB the frame never spills because the
    window is rows-bounded (±2)."""
    t = _t(spark, sf_dir, "events").select(
        "event_id", "user_id", "value", F.unix_millis("ts").alias("ms")
    )
    w = Window.partitionBy("user_id").orderBy("ms", "event_id")
    d = t.select(
        "event_id",
        "user_id",
        "value",
        F.lag("value", 2).over(w).alias("l2"),
        F.lag("value", 1).over(w).alias("l1"),
        F.lead("value", 1).over(w).alias("f1"),
        F.lead("value", 2).over(w).alias("f2"),
    )
    full = (
        F.col("l2").isNotNull()
        & F.col("l1").isNotNull()
        & F.col("f1").isNotNull()
        & F.col("f2").isNotNull()
    )
    sg = (
        -3 * F.col("l2")
        + 12 * F.col("l1")
        + 17 * F.col("value")
        + 12 * F.col("f1")
        - 3 * F.col("f2")
    ) / 35
    return d.filter(full).select("event_id", "user_id", sg.alias("sg"))


# ---------------------------------------------------------------------------
# window_pacf — partial autocorrelation, lags 1..3, Durbin-Levinson
# ---------------------------------------------------------------------------

_PACF_SQL = """
WITH l AS (
  SELECT user_id, value,
         LAG(value, 1) OVER w AS l1,
         LAG(value, 2) OVER w AS l2,
         LAG(value, 3) OVER w AS l3
  FROM events
  WINDOW w AS (PARTITION BY user_id ORDER BY epoch_ms(ts), event_id)),
a AS (
  SELECT user_id, corr(value, l1) AS a1, corr(value, l2) AS a2,
         corr(value, l3) AS a3
  FROM l GROUP BY user_id),
p2 AS (
  SELECT user_id, a1, a2, a3,
         (a2 - a1 * a1) / (1 - a1 * a1) AS phi22
  FROM a),
p3 AS (
  SELECT user_id, a1, a2, a3, phi22,
         a1 - phi22 * a1 AS phi21
  FROM p2)
SELECT user_id, lag, ROUND(pacf, 6) AS pacf
FROM (SELECT user_id, 1::BIGINT AS lag, a1 AS pacf FROM p3
      UNION ALL SELECT user_id, 2, phi22 FROM p3
      UNION ALL SELECT user_id, 3,
        (a3 - phi21 * a2 - phi22 * a1)
          / (1 - phi21 * a1 - phi22 * a2) FROM p3)
"""


@register("window_pacf", _PACF_SQL)
def window_pacf(spark, sf_dir):
    """Partial autocorrelation of each user's value series at lags
    1-3 via the Durbin-Levinson recursion over the overlap-pairs ACF
    (window_acf's estimator): phi_11 = r1; phi_22 =
    (r2 - r1^2)/(1 - r1^2); phi_33 closes the recursion with
    phi_21 = phi_11 - phi_22*phi_11. PACF is the AR-order
    identification tool (cuts off at the true AR order) where the
    ACF identifies MA order — together they are the Box-Jenkins
    pair.

    Same physical shape as window_acf: one windowed shuffle builds
    all three lag columns, one groupBy computes the three
    correlations, and the recursion is per-GROUP scalar arithmetic
    written in the same order on both engines (corr drift ~1e-15 vs
    the 5e-7 round boundary)."""
    t = _t(spark, sf_dir, "events").select(
        "event_id", "user_id", "value", F.unix_millis("ts").alias("ms")
    )
    w = Window.partitionBy("user_id").orderBy("ms", "event_id")
    l = t.select(
        "user_id",
        "value",
        F.lag("value", 1).over(w).alias("l1"),
        F.lag("value", 2).over(w).alias("l2"),
        F.lag("value", 3).over(w).alias("l3"),
    )
    a = l.groupBy("user_id").agg(
        F.corr("value", "l1").alias("a1"),
        F.corr("value", "l2").alias("a2"),
        F.corr("value", "l3").alias("a3"),
    )
    phi22 = (F.col("a2") - F.col("a1") * F.col("a1")) / (
        1 - F.col("a1") * F.col("a1")
    )
    p = a.withColumn("phi22", phi22).withColumn(
        "phi21", F.col("a1") - F.col("phi22") * F.col("a1")
    )
    phi33 = (
        F.col("a3") - F.col("phi21") * F.col("a2") - F.col("phi22") * F.col("a1")
    ) / (1 - F.col("phi21") * F.col("a1") - F.col("phi22") * F.col("a2"))
    p = p.withColumn("phi33", phi33)
    return p.selectExpr(
        "user_id",
        "stack(3, CAST(1 AS BIGINT), a1, CAST(2 AS BIGINT), phi22,"
        " CAST(3 AS BIGINT), phi33) AS (lag, pacf)",
    ).select("user_id", "lag", F.round("pacf", 6).alias("pacf"))


# ---------------------------------------------------------------------------
# stats_negbinom_mom — NB method-of-moments fit on per-user counts
# ---------------------------------------------------------------------------

_NB_SQL = """
WITH k AS (SELECT event_type, user_id, CAST(COUNT(*) AS DOUBLE) AS k
           FROM events GROUP BY 1, 2),
s AS (SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n_users,
             AVG(k) AS m, VAR_POP(k) AS v
      FROM k GROUP BY 1)
SELECT event_type, n_users, ROUND(m, 6) AS mean_k, ROUND(v, 6) AS var_k,
       CASE WHEN v > m THEN ROUND(m * m / (v - m), 6) END AS nb_r,
       CASE WHEN v > m THEN ROUND(m / v, 6) END AS nb_p
FROM s
ORDER BY event_type
"""


@register("stats_negbinom_mom", _NB_SQL)
def stats_negbinom_mom(spark, sf_dir):
    """Negative-binomial method-of-moments fit of the per-user event
    count distribution, one fit per event_type: r = m^2/(v - m),
    p = m/v (the Poisson-gamma overdispersion parameterisation;
    NULL where the data is NOT overdispersed, v <= m, and the NB
    degenerates to Poisson). Per-user activity counts are the
    textbook NB workload — a pipeline uses the fit to pick sampling
    temperature / cap heavy users.

    Shape: one exact count shuffle (user, type) with map-side
    combine, then a per-type moment aggregate over the user-sized
    table; the fit itself is scalar arithmetic per group. Moment
    sums add ~users doubles in engine order → rounded at 6dp."""
    k = (
        _t(spark, sf_dir, "events")
        .groupBy("event_type", "user_id")
        .agg(F.count(F.lit(1)).cast("double").alias("k"))
    )
    s = k.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n_users"),
        F.avg("k").alias("m"),
        F.var_pop("k").alias("v"),
    )
    over = F.col("v") > F.col("m")
    return s.select(
        "event_type",
        "n_users",
        F.round("m", 6).alias("mean_k"),
        F.round("v", 6).alias("var_k"),
        F.when(over, F.round(F.col("m") * F.col("m") / (F.col("v") - F.col("m")), 6)).alias("nb_r"),
        F.when(over, F.round(F.col("m") / F.col("v"), 6)).alias("nb_p"),
    ).orderBy("event_type")


# ---------------------------------------------------------------------------
# events_poisson_rate_test — two-sample rate comparison (click vs view)
# ---------------------------------------------------------------------------

_POIS_SQL = """
WITH s AS (SELECT
  CAST(COUNT(CASE WHEN event_type = 'click' THEN 1 END) AS DOUBLE) AS k1,
  CAST(COUNT(CASE WHEN event_type = 'view' THEN 1 END) AS DOUBLE) AS k2,
  CAST(MAX(CASE WHEN event_type = 'click' THEN epoch_ms(ts) END)
     - MIN(CASE WHEN event_type = 'click' THEN epoch_ms(ts) END) AS DOUBLE)
    / 1000 AS t1,
  CAST(MAX(CASE WHEN event_type = 'view' THEN epoch_ms(ts) END)
     - MIN(CASE WHEN event_type = 'view' THEN epoch_ms(ts) END) AS DOUBLE)
    / 1000 AS t2
 FROM events)
SELECT CAST(k1 AS BIGINT) AS k1, CAST(k2 AS BIGINT) AS k2,
       ROUND(t1, 3) AS t1_sec, ROUND(t2, 3) AS t2_sec,
       ROUND(k1 / t1, 6) AS rate1, ROUND(k2 / t2, 6) AS rate2,
       ROUND((k1 - (k1 + k2) * (t1 / (t1 + t2)))
             / sqrt((k1 + k2) * (t1 / (t1 + t2)) * (t2 / (t1 + t2))), 6)
         AS z_cond
FROM s
"""


@register("events_poisson_rate_test", _POIS_SQL)
def events_poisson_rate_test(spark, sf_dir):
    """Two-sample Poisson rate test, click vs view arrivals: given
    k1 events in exposure t1 and k2 in t2, conditional on k1+k2 the
    click count is Binomial(k1+k2, t1/(t1+t2)) under equal rates —
    z_cond is that binomial's normal score (the standard
    incident-rate / defect-rate comparison; Przyborowski & Wilenski
    1940 conditional test). Exposures are each type's observed span.

    ONE conditional aggregate over a single scan — no join, no
    second pass; the statistic is scalar arithmetic on six
    aggregates. The count sums are exact integers; only the final
    ratios are rounded."""
    ms = F.unix_millis("ts")
    click = F.col("event_type") == "click"
    view = F.col("event_type") == "view"
    s = _t(spark, sf_dir, "events").agg(
        F.count(F.when(click, 1)).cast("double").alias("k1"),
        F.count(F.when(view, 1)).cast("double").alias("k2"),
        (
            (F.max(F.when(click, ms)) - F.min(F.when(click, ms))).cast("double")
            / 1000
        ).alias("t1"),
        (
            (F.max(F.when(view, ms)) - F.min(F.when(view, ms))).cast("double")
            / 1000
        ).alias("t2"),
    )
    n = F.col("k1") + F.col("k2")
    p0 = F.col("t1") / (F.col("t1") + F.col("t2"))
    return s.select(
        F.col("k1").cast("bigint").alias("k1"),
        F.col("k2").cast("bigint").alias("k2"),
        F.round("t1", 3).alias("t1_sec"),
        F.round("t2", 3).alias("t2_sec"),
        F.round(F.col("k1") / F.col("t1"), 6).alias("rate1"),
        F.round(F.col("k2") / F.col("t2"), 6).alias("rate2"),
        F.round(
            (F.col("k1") - n * p0) / F.sqrt(n * p0 * (F.col("t2") / (F.col("t1") + F.col("t2")))),
            6,
        ).alias("z_cond"),
    )


# ---------------------------------------------------------------------------
# stats_cramers_v — bias-corrected effect size for a contingency table
# ---------------------------------------------------------------------------

_CRAMER_SQL = """
WITH obs AS (SELECT o_orderpriority AS pri,
                    CAST(EXTRACT(YEAR FROM o_orderdate) AS BIGINT) AS yr,
                    CAST(COUNT(*) AS DOUBLE) AS n
             FROM orders GROUP BY 1, 2),
rm AS (SELECT pri, SUM(n) AS rn FROM obs GROUP BY 1),
cm AS (SELECT yr, SUM(n) AS cn FROM obs GROUP BY 1),
tot AS (SELECT SUM(n) AS t FROM obs),
chi AS (
  SELECT SUM((n - rn * cn / t) * (n - rn * cn / t) / (rn * cn / t)) AS chi2,
         CAST(COUNT(DISTINCT pri) AS DOUBLE) AS r,
         CAST(COUNT(DISTINCT yr) AS DOUBLE) AS c,
         MAX(t) AS t
  FROM obs JOIN rm USING (pri) JOIN cm USING (yr) CROSS JOIN tot)
SELECT ROUND(chi2, 6) AS chi2,
       CAST(t AS BIGINT) AS n,
       CAST(r AS INT) AS n_rows,
       CAST(c AS INT) AS n_cols,
       ROUND(sqrt(chi2 / (t * least(r - 1, c - 1))), 6) AS cramers_v,
       ROUND(sqrt(
         greatest(0, chi2 / t - (r - 1) * (c - 1) / (t - 1))
         / least(r - (r - 1) * (r - 1) / (t - 1) - 1,
                 c - (c - 1) * (c - 1) / (t - 1) - 1)), 6)
         AS cramers_v_corrected
FROM chi
"""


@register("stats_cramers_v", _CRAMER_SQL)
def stats_cramers_v(spark, sf_dir):
    """Cramér's V for priority × order-year — the EFFECT SIZE the
    chi-square (stats_chi2) doesn't give — plus the Bergsma (2013)
    bias-corrected variant (phi^2 shrunk by its independence-case
    expectation, category counts shrunk likewise) that stays near 0
    on independent data where raw V inflates on many-celled tables.

    Same single-scan shape as stats_chi2: one groupBy builds the
    contingency table, marginals are rollups of that tiny table
    broadcast back, everything after the first shuffle is
    kilobytes."""
    o = _t(spark, sf_dir, "orders")
    obs = o.groupBy(
        F.col("o_orderpriority").alias("pri"),
        F.year("o_orderdate").cast("bigint").alias("yr"),
    ).agg(F.count(F.lit(1)).cast("double").alias("n"))
    rm = obs.groupBy("pri").agg(F.sum("n").alias("rn"))
    cm = obs.groupBy("yr").agg(F.sum("n").alias("cn"))
    tot = obs.agg(F.sum("n").alias("t"))
    e = F.col("rn") * F.col("cn") / F.col("t")
    chi = (
        obs.join(F.broadcast(rm), "pri")
        .join(F.broadcast(cm), "yr")
        .crossJoin(F.broadcast(tot))
        .agg(
            F.sum((F.col("n") - e) * (F.col("n") - e) / e).alias("chi2"),
            F.countDistinct("pri").cast("double").alias("r"),
            F.countDistinct("yr").cast("double").alias("c"),
            F.max("t").alias("t"),
        )
    )
    r, c, t, chi2 = F.col("r"), F.col("c"), F.col("t"), F.col("chi2")
    phi2c = F.greatest(F.lit(0), chi2 / t - (r - 1) * (c - 1) / (t - 1))
    rc = r - (r - 1) * (r - 1) / (t - 1)
    cc = c - (c - 1) * (c - 1) / (t - 1)
    return chi.select(
        F.round("chi2", 6).alias("chi2"),
        t.cast("bigint").alias("n"),
        r.cast("int").alias("n_rows"),
        c.cast("int").alias("n_cols"),
        F.round(F.sqrt(chi2 / (t * F.least(r - 1, c - 1))), 6).alias("cramers_v"),
        F.round(F.sqrt(phi2c / F.least(rc - 1, cc - 1)), 6).alias(
            "cramers_v_corrected"
        ),
    )


# ---------------------------------------------------------------------------
# stats_brown_forsythe — robust variance-homogeneity test
# ---------------------------------------------------------------------------

_BF_SQL = """
WITH med AS (SELECT o_orderpriority AS g, median(o_totalprice) AS md
             FROM orders GROUP BY 1),
z AS (SELECT g, abs(o_totalprice - md) AS z
      FROM orders JOIN med ON o_orderpriority = g),
grp AS (SELECT g, CAST(COUNT(*) AS DOUBLE) AS n, AVG(z) AS zbar,
               SUM(z) AS zsum, SUM(z * z) AS zsq
        FROM z GROUP BY 1),
gl AS (SELECT CAST(COUNT(*) AS DOUBLE) AS k, SUM(n) AS nt,
              SUM(zsum) / SUM(n) AS zg,
              SUM(zsq - n * zbar * zbar) AS den,
              SUM(n * zbar * zbar) AS s2
       FROM grp)
SELECT ROUND((nt - k) / (k - 1) * (s2 - nt * zg * zg) / den, 6) AS w_stat,
       CAST(k - 1 AS BIGINT) AS df1,
       CAST(nt - k AS BIGINT) AS df2
FROM gl
"""


@register("stats_brown_forsythe", _BF_SQL)
def stats_brown_forsythe(spark, sf_dir):
    """Brown-Forsythe test of variance homogeneity across order
    priorities (Levene's test with the MEDIAN center — the robust
    form): z_ij = |y_ij - median_j|, then the one-way-ANOVA F on the
    z's. This is the assumption gate a pipeline runs BEFORE trusting
    stats_anova's equal-variance F.

    Shape: exact group medians over a bounded-cardinality key (5
    priorities — the same sort-based percentile aggregate
    agg_exact_median already pins; per-group state is the group's
    values, acceptable only because k is tiny and documented as
    such), broadcast back for ONE |y - median| aggregation pass that
    carries (n, mean, Σz, Σz²) per group — the within-group sum of
    squares comes from the Σz² decomposition (Σ(z-z̄)² = Σz² - n·z̄²),
    so the fact table is scanned exactly twice (median pass +
    deviation pass), the floor for an exact-median center;
    mean-centered Levene would fuse to one scan at the cost of
    robustness."""
    o = _t(spark, sf_dir, "orders").select(
        F.col("o_orderpriority").alias("g"), F.col("o_totalprice").alias("y")
    )
    med = o.groupBy("g").agg(F.percentile("y", 0.5).alias("md"))
    z = o.join(F.broadcast(med), "g").select(
        "g", F.abs(F.col("y") - F.col("md")).alias("z")
    )
    grp = z.groupBy("g").agg(
        F.count(F.lit(1)).cast("double").alias("n"),
        F.avg("z").alias("zbar"),
        F.sum("z").alias("zsum"),
        F.sum(F.col("z") * F.col("z")).alias("zsq"),
    )
    # between-group sum of squares by the same decomposition:
    # Σ n(z̄_g - z̄)² = Σ n·z̄_g² - nt·z̄², so the WHOLE statistic
    # folds out of ONE aggregate over the 5-row group table — no
    # second pass over grp, no cross join
    gl = grp.agg(
        F.count(F.lit(1)).cast("double").alias("k"),
        F.sum("n").alias("nt"),
        (F.sum("zsum") / F.sum("n")).alias("zg"),
        F.sum(F.col("zsq") - F.col("n") * F.col("zbar") * F.col("zbar")).alias(
            "den"
        ),
        F.sum(F.col("n") * F.col("zbar") * F.col("zbar")).alias("s2"),
    )
    return gl.select(
        F.round(
            (F.col("nt") - F.col("k"))
            / (F.col("k") - 1)
            * (F.col("s2") - F.col("nt") * F.col("zg") * F.col("zg"))
            / F.col("den"),
            6,
        ).alias("w_stat"),
        (F.col("k") - 1).cast("bigint").alias("df1"),
        (F.col("nt") - F.col("k")).cast("bigint").alias("df2"),
    )
