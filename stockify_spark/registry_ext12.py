"""Round-8 extension wave: rank statistics, classical inference,
rolling regression, URL structure, and a stochastic oscillator.

Design rule shared by every query here: all cross-engine
accumulations are INTEGER-EXACT in double precision before any
division or sqrt — ranks are doubled into integers, prices are
turned into cents, frame sums stay under 2^53 — so the only
engine-order-sensitive step is a deterministic scalar formula
written textually identically on both faces, and ROUND(...,6) is a
display choice, not a tolerance. This is the same exactness
discipline as stats_ks (integer ECDF prefix sums) and
window_seasonal (round-before-decide), extended to U tests, ANOVA,
and Spearman rho.

Reference parity: the oscillator extends the reference's rolling
min/max family (stockify.cu:142-193, 513-634) with the canonical
%K/%D composition on the same ramp table; the remaining queries are
north-star LLM/analytics surface (SURVEY §2 extensions), each with
a full-value DuckDB oracle.
"""

from __future__ import annotations

from stockify_spark.registry import register, _t

# the reference ramp (stockify.cu:29-48), 100 cycles = 1800 rows —
# identical to sources/fixtures.stocks_ramp(cycles=100)
_RAMP12 = (
    "SELECT i AS row_id, CAST(500 + (i % 18) * 10 AS DOUBLE) AS close,"
    " CAST(510 + (i % 18) * 10 AS DOUBLE) AS high,"
    " CAST(440 + (i % 18) * 10 AS DOUBLE) AS low"
    " FROM range(1800) t(i)"
)


# ---------------------------------------------------------------------------
# stocks_stochastic — %K / %D oscillator over rolling extrema
# ---------------------------------------------------------------------------

_STOCH_SQL = f"""
WITH stocks AS ({_RAMP12}),
k AS (SELECT row_id,
             ROUND(100.0 * (close - MIN(low)  OVER w)
                         / (MAX(high) OVER w - MIN(low) OVER w), 6) AS pct_k
      FROM stocks
      WINDOW w AS (ORDER BY row_id ROWS BETWEEN 13 PRECEDING AND CURRENT ROW))
SELECT row_id, pct_k,
       ROUND(AVG(pct_k) OVER (ORDER BY row_id
                              ROWS BETWEEN 2 PRECEDING AND CURRENT ROW), 6)
         AS pct_d
FROM k
"""


@register("stocks_stochastic", _STOCH_SQL)
def stocks_stochastic(spark, sf_dir):
    """Stochastic oscillator on the reference ramp: %K = 100 *
    (close - min(low)[14]) / (max(high)[14] - min(low)[14]), %D =
    SMA-3 of %K — the canonical composition of the reference's
    rolling-min and rolling-max windows (stockify.cu:142-193) into
    one indicator. The denominator is bounded below by the same-row
    high-low spread (70 on the ramp), so no zero-division guard is
    needed; %K is rounded to 6dp BEFORE the %D average so both
    engines smooth identical values. Global row order is data
    (SURVEY §7.4 parity shape); the partitioned production form is
    the window_partitioned_parity construction."""
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    from stockify_spark.sources.fixtures import stocks_ramp

    s = stocks_ramp(spark, cycles=100)
    w = Window.orderBy("row_id").rowsBetween(-13, 0)
    k = s.select(
        "row_id",
        F.round(
            100.0
            * (F.col("close") - F.min("low").over(w))
            / (F.max("high").over(w) - F.min("low").over(w)),
            6,
        ).alias("pct_k"),
    )
    d = Window.orderBy("row_id").rowsBetween(-2, 0)
    return k.select(
        "row_id",
        "pct_k",
        F.round(F.avg("pct_k").over(d), 6).alias("pct_d"),
    )


# ---------------------------------------------------------------------------
# window_rolling_slope — rolling OLS trend over a bounded frame
# ---------------------------------------------------------------------------

_SLOPE_SQL = f"""
WITH stocks AS ({_RAMP12}),
s AS (SELECT row_id,
             COUNT(*)            OVER w AS cnt,
             SUM(CAST(row_id AS DOUBLE))          OVER w AS sx,
             SUM(close)          OVER w AS sy,
             SUM(CAST(row_id AS DOUBLE) * close)  OVER w AS sxy,
             SUM(CAST(row_id AS DOUBLE) * CAST(row_id AS DOUBLE)) OVER w
               AS sxx
      FROM stocks
      WINDOW w AS (ORDER BY row_id ROWS BETWEEN 19 PRECEDING AND CURRENT ROW))
SELECT row_id,
       ROUND((cnt * sxy - sx * sy) / NULLIF(cnt * sxx - sx * sx, 0), 6)
         AS slope,
       ROUND((sy - (cnt * sxy - sx * sy) / NULLIF(cnt * sxx - sx * sx, 0)
                   * sx) / cnt, 6) AS intercept
FROM s
"""


@register("window_rolling_slope", _SLOPE_SQL)
def window_rolling_slope(spark, sf_dir):
    """Rolling 20-row OLS trend of close against row position —
    closed-form slope/intercept from five frame sums, the windowed
    sibling of ml_linreg_group's per-group closed form. Every frame
    sum is integer-exact in double (row_id <= 1799, close a multiple
    of 10, 20-row frames: max |sxy| ~ 2.4e7 << 2^53), so both
    engines divide identical numerators; the first row's degenerate
    single-point frame yields NULL via NULLIF rather than a 0/0.
    One window pass, no shuffle beyond the documented global-order
    parity sort (SURVEY §7.4)."""
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    from stockify_spark.sources.fixtures import stocks_ramp

    s = stocks_ramp(spark, cycles=100)
    w = Window.orderBy("row_id").rowsBetween(-19, 0)
    x = F.col("row_id").cast("double")
    base = s.select(
        "row_id",
        F.count(F.lit(1)).over(w).alias("cnt"),
        F.sum(x).over(w).alias("sx"),
        F.sum("close").over(w).alias("sy"),
        F.sum(x * F.col("close")).over(w).alias("sxy"),
        F.sum(x * x).over(w).alias("sxx"),
    )
    num = F.col("cnt") * F.col("sxy") - F.col("sx") * F.col("sy")
    den = F.nullif(
        F.col("cnt") * F.col("sxx") - F.col("sx") * F.col("sx"), F.lit(0)
    )
    slope = num / den
    return base.select(
        "row_id",
        F.round(slope, 6).alias("slope"),
        F.round((F.col("sy") - slope * F.col("sx")) / F.col("cnt"), 6).alias(
            "intercept"
        ),
    )


# ---------------------------------------------------------------------------
# stats_mannwhitney — two-sample rank-sum test with tie correction
# ---------------------------------------------------------------------------

_MWU_SQL = """
WITH base AS (
  SELECT event_type, value FROM events
  WHERE event_type IN ('click', 'purchase') AND value IS NOT NULL
),
ranked AS (
  SELECT event_type,
         CAST(RANK() OVER (ORDER BY value) AS DOUBLE)
           + (CAST(COUNT(*) OVER (PARTITION BY value) AS DOUBLE) - 1) / 2.0
           AS avg_rank
  FROM base
),
ties AS (
  SELECT SUM(c * c * c - c) AS tie_sum
  FROM (SELECT CAST(COUNT(*) AS DOUBLE) AS c FROM base GROUP BY value) g
),
agg AS (
  SELECT CAST(SUM(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END) AS DOUBLE)
           AS n1,
         CAST(SUM(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END)
              AS DOUBLE) AS n2,
         SUM(CASE WHEN event_type = 'click' THEN avg_rank ELSE 0 END) AS r1
  FROM ranked
)
SELECT CAST(n1 AS BIGINT) AS n1, CAST(n2 AS BIGINT) AS n2,
       ROUND(r1 - n1 * (n1 + 1) / 2.0, 6) AS u1,
       ROUND((r1 - n1 * (n1 + 1) / 2.0 - n1 * n2 / 2.0)
             / SQRT(n1 * n2 * ((n1 + n2 + 1)
                               - tie_sum / ((n1 + n2) * (n1 + n2 - 1)))
                    / 12.0), 6) AS z
FROM agg, ties
"""


@register("stats_mannwhitney", _MWU_SQL)
def stats_mannwhitney(spark, sf_dir):
    """Mann-Whitney U (Wilcoxon rank-sum) test: are click and
    purchase event values drawn from the same distribution?
    Average-rank assignment (min-rank + (ties-1)/2) makes the rank
    of every row independent of engine sort-tie order; rank sums are
    half-integer-exact (2*R1 is an integer <= n^2 ~ 1.6e7), and the
    tie-corrected normal approximation z = (U1 - n1*n2/2) /
    sqrt(n1*n2*((n+1) - sum(c^3-c)/(n(n-1)))/12) is a deterministic
    scalar formula written identically on both faces. Completes the
    two-sample family next to stats_ttest (parametric) and stats_ks
    (distribution-free supremum): one rank shuffle + one tiny agg,
    NULL values filtered on both faces (stats_ks ADVICE precedent).
    Scale: a single sort-based rank over the filtered pair of
    cohorts; no per-row Python."""
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    base = (
        _t(spark, sf_dir, "events")
        .where(F.col("event_type").isin("click", "purchase"))
        .where(F.col("value").isNotNull())
        .select("event_type", "value")
    )
    rw = Window.orderBy("value")
    tw = Window.partitionBy("value")
    ranked = base.select(
        "event_type",
        (
            F.rank().over(rw).cast("double")
            + (F.count(F.lit(1)).over(tw).cast("double") - 1) / 2.0
        ).alias("avg_rank"),
    )
    agg = ranked.agg(
        F.sum(F.when(F.col("event_type") == "click", 1).otherwise(0))
        .cast("double")
        .alias("n1"),
        F.sum(F.when(F.col("event_type") == "purchase", 1).otherwise(0))
        .cast("double")
        .alias("n2"),
        F.sum(
            F.when(F.col("event_type") == "click", F.col("avg_rank")).otherwise(
                0.0
            )
        ).alias("r1"),
    )
    ties = (
        base.groupBy("value")
        .agg(F.count(F.lit(1)).cast("double").alias("c"))
        .agg(
            F.sum(
                F.col("c") * F.col("c") * F.col("c") - F.col("c")
            ).alias("tie_sum")
        )
    )
    j = agg.crossJoin(F.broadcast(ties))  # two 1-row frames
    n1, n2, r1, ts = (F.col(c) for c in ("n1", "n2", "r1", "tie_sum"))
    u1 = r1 - n1 * (n1 + 1) / 2.0
    n = n1 + n2
    var = n1 * n2 * ((n + 1) - ts / (n * (n - 1))) / 12.0
    return j.select(
        n1.cast("bigint").alias("n1"),
        n2.cast("bigint").alias("n2"),
        F.round(u1, 6).alias("u1"),
        F.round((u1 - n1 * n2 / 2.0) / F.sqrt(var), 6).alias("z"),
    )


# ---------------------------------------------------------------------------
# stats_anova — one-way ANOVA F across part brands
# ---------------------------------------------------------------------------

_ANOVA_SQL = """
WITH cents AS (
  SELECT p_brand, CAST(ROUND(p_retailprice * 100) AS DOUBLE) AS v
  FROM part WHERE p_retailprice IS NOT NULL
),
grp AS (
  SELECT p_brand, CAST(COUNT(*) AS DOUBLE) AS ng, SUM(v) AS sg,
         SUM(v * v) AS qg
  FROM cents GROUP BY p_brand
),
tot AS (
  SELECT CAST(COUNT(*) AS DOUBLE) AS k, SUM(ng) AS n, SUM(sg) AS s,
         SUM(qg) AS q, SUM(sg * sg / ng) AS w
  FROM grp
)
SELECT CAST(k AS BIGINT) AS k_groups, CAST(n AS BIGINT) AS n_rows,
       ROUND((w - s * s / n) / 10000.0, 2) AS ss_between,
       ROUND((q - w) / 10000.0, 2) AS ss_within,
       ROUND(((w - s * s / n) / (k - 1)) / ((q - w) / (n - k)), 6) AS f_stat
FROM tot
"""


@register("stats_anova", _ANOVA_SQL)
def stats_anova(spark, sf_dir):
    """One-way ANOVA: does mean retail price differ across the 25
    part brands? Prices become integer cents (exact in double:
    per-group sum of squares <= ~8e14 < 2^53), so the group
    statistics (n_g, S_g, Q_g) are identical integers on both
    engines and the only inexact steps are the S_g^2/n_g divisions
    and the final F — deterministic scalar arithmetic, displayed at
    6dp (sums of squares rescaled back to price^2 units at 2dp).
    F = (SSB/(k-1)) / (SSW/(n-k)) with SSB = sum S_g^2/n_g - S^2/n,
    SSW = Q - sum S_g^2/n_g. Two-level aggregation: one partial
    agg per brand (map-side combine), then a 25-row final — the
    partial->final reduce shape of SURVEY §2.3 A4 applied to
    inference."""
    from pyspark.sql import functions as F

    v = F.round(F.col("p_retailprice") * 100).cast("double")
    grp = (
        _t(spark, sf_dir, "part")
        .where(F.col("p_retailprice").isNotNull())
        .select("p_brand", v.alias("v"))
        .groupBy("p_brand")
        .agg(
            F.count(F.lit(1)).cast("double").alias("ng"),
            F.sum("v").alias("sg"),
            F.sum(F.col("v") * F.col("v")).alias("qg"),
        )
    )
    tot = grp.agg(
        F.count(F.lit(1)).cast("double").alias("k"),
        F.sum("ng").alias("n"),
        F.sum("sg").alias("s"),
        F.sum("qg").alias("q"),
        F.sum(F.col("sg") * F.col("sg") / F.col("ng")).alias("w"),
    )
    k, n, s, q, w = (F.col(c) for c in ("k", "n", "s", "q", "w"))
    ssb = w - s * s / n
    ssw = q - w
    return tot.select(
        k.cast("bigint").alias("k_groups"),
        n.cast("bigint").alias("n_rows"),
        F.round(ssb / 10000.0, 2).alias("ss_between"),
        F.round(ssw / 10000.0, 2).alias("ss_within"),
        F.round((ssb / (k - 1)) / (ssw / (n - k)), 6).alias("f_stat"),
    )


# ---------------------------------------------------------------------------
# stats_spearman — rank correlation via doubled average ranks
# ---------------------------------------------------------------------------

_SPEARMAN_SQL = """
WITH base AS (
  SELECT p_retailprice AS xv, CAST(p_size AS DOUBLE) AS yv
  FROM part WHERE p_retailprice IS NOT NULL AND p_size IS NOT NULL
),
ranked AS (
  SELECT CAST(2 * RANK() OVER (ORDER BY xv)
              + COUNT(*) OVER (PARTITION BY xv) - 1 AS DOUBLE) AS rx,
         CAST(2 * RANK() OVER (ORDER BY yv)
              + COUNT(*) OVER (PARTITION BY yv) - 1 AS DOUBLE) AS ry
  FROM base
),
s AS (
  SELECT CAST(COUNT(*) AS DOUBLE) AS n, SUM(rx) AS sx, SUM(ry) AS sy,
         SUM(rx * ry) AS sxy, SUM(rx * rx) AS sxx, SUM(ry * ry) AS syy
  FROM ranked
)
SELECT CAST(n AS BIGINT) AS n_rows,
       ROUND((n * sxy - sx * sy)
             / (SQRT(n * sxx - sx * sx) * SQRT(n * syy - sy * sy)), 6)
         AS spearman_rho
FROM s
"""


@register("stats_spearman", _SPEARMAN_SQL)
def stats_spearman(spark, sf_dir):
    """Spearman rank correlation between part retail price and part
    size — the tie-robust monotone-association measure next to
    agg_stddev_corr's Pearson. Doubled average ranks (2*minrank +
    ties - 1) are INTEGERS, so every accumulated sum (sx, sxy <=
    ~3.2e13) is exact in double and engine sum order cannot drift;
    rho is then one deterministic Pearson formula over six exact
    scalars, rho being invariant to the x2 rank scaling. Heavy
    p_size tie groups (~50 distinct sizes over 20k rows) are
    exactly what average-ranking is for.

    Shape (r14 rewrite, operators/ranks.py): the two global rank
    windows became distinct-value prefix-sums — the doubled average
    rank 2·RANK + ties − 1 = 2·minrank + cnt − 1 is a per-VALUE
    constant, so each axis ranks its distinct-value table
    (single-partition stage bounded by value cardinality, ~cents
    for price / ~50 for size) and joins back by value: two parallel
    equi-joins instead of two full-table sorts."""
    from pyspark.sql import functions as F

    from stockify_spark.operators.ranks import distinct_value_ranks

    base = (
        _t(spark, sf_dir, "part")
        .where(F.col("p_retailprice").isNotNull() & F.col("p_size").isNotNull())
        .select(
            F.col("p_retailprice").alias("xv"),
            F.col("p_size").cast("double").alias("yv"),
        )
    )

    def drank_table(col):
        return distinct_value_ranks(base.select(col), col).select(
            col,
            (2 * F.col("minrank") + F.col("cnt") - 1)
            .cast("double")
            .alias("r" + col[0]),
        )

    ranked = (
        base.join(drank_table("xv"), "xv")
        .join(drank_table("yv"), "yv")
        .select("rx", "ry")
    )
    s = ranked.agg(
        F.count(F.lit(1)).cast("double").alias("n"),
        F.sum("rx").alias("sx"),
        F.sum("ry").alias("sy"),
        F.sum(F.col("rx") * F.col("ry")).alias("sxy"),
        F.sum(F.col("rx") * F.col("rx")).alias("sxx"),
        F.sum(F.col("ry") * F.col("ry")).alias("syy"),
    )
    n, sx, sy, sxy, sxx, syy = (
        F.col(c) for c in ("n", "sx", "sy", "sxy", "sxx", "syy")
    )
    rho = (n * sxy - sx * sy) / (
        F.sqrt(n * sxx - sx * sx) * F.sqrt(n * syy - sy * sy)
    )
    return s.select(
        n.cast("bigint").alias("n_rows"),
        F.round(rho, 6).alias("spearman_rho"),
    )


# ---------------------------------------------------------------------------
# fn_url_parse — structured URL decomposition
# ---------------------------------------------------------------------------

_URL_N = 3000

_URL_SQL = f"""
WITH u AS (
  SELECT i AS row_id,
         'https://host' || (i % 7) || '.example.org/p/' || (i % 50)
           || '/doc?q=t' || (i % 13) || '&page=' || (i % 9) AS url
  FROM range({_URL_N}) t(i)
)
SELECT row_id,
       regexp_extract(url, '^([a-z]+)://', 1) AS protocol,
       regexp_extract(url, '^[a-z]+://([^/]+)', 1) AS host,
       regexp_extract(url, '^[a-z]+://[^/]+([^?]*)', 1) AS path,
       regexp_extract(url, '\\?(.*)$', 1) AS query,
       regexp_extract(url, '[?&]page=([^&]*)', 1) AS page
FROM u
"""


@register("fn_url_parse", _URL_SQL)
def fn_url_parse(spark, sf_dir):
    """Structured URL decomposition with Spark's JVM-side parse_url
    (PROTOCOL / HOST / PATH / QUERY / per-key QUERY lookup) against
    a regexp oracle — the log-ingestion cousin of fn_regexp and
    fn_json. The synthetic corpus covers 7 hosts x 50 paths x 13x9
    query-value combinations; every component is deterministic text,
    so the contract is exact string equality. parse_url stays inside
    whole-stage codegen — no Python in the pipeline."""
    from pyspark.sql import functions as F

    u = spark.range(0, _URL_N, 1, 8).select(
        F.col("id").alias("row_id"),
        F.concat(
            F.lit("https://host"),
            (F.col("id") % 7).cast("string"),
            F.lit(".example.org/p/"),
            (F.col("id") % 50).cast("string"),
            F.lit("/doc?q=t"),
            (F.col("id") % 13).cast("string"),
            F.lit("&page="),
            (F.col("id") % 9).cast("string"),
        ).alias("url"),
    )
    return u.select(
        "row_id",
        F.parse_url(F.col("url"), F.lit("PROTOCOL")).alias("protocol"),
        F.parse_url(F.col("url"), F.lit("HOST")).alias("host"),
        F.parse_url(F.col("url"), F.lit("PATH")).alias("path"),
        F.parse_url(F.col("url"), F.lit("QUERY")).alias("query"),
        F.parse_url(F.col("url"), F.lit("QUERY"), F.lit("page")).alias("page"),
    )
