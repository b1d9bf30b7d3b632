"""Round-8 extension wave 2: URL canonicalization dedup, burstiness
profiling, neighbor-set graph similarity, Kaplan-Meier survival, and
the classical mean family.

Shared exactness rule (registry_ext12 discipline): every
cross-engine aggregation accumulates integers exactly representable
in double (event counts, neighbor counts, at-risk counts), or is a
pure string transform; division / ln / exp happen only in final
scalar formulas written textually identically on both faces, with
ROUND(...,6) as display. The two log-domain queries (geometric mean,
Kaplan-Meier) accumulate logs — the one place engine sum order can
drift at the ulp level — and round at 6dp, the same tolerance-free
display policy window_seasonal established.
"""

from __future__ import annotations

from stockify_spark.registry import register, _t

# ---------------------------------------------------------------------------
# pipeline_url_dedup — canonicalize crawl URLs, collapse variants
# ---------------------------------------------------------------------------

_URLD_N = 4000

# raw corpus: same logical page appears as www/no-www, upper/lower
# host case, :443 port, shuffled query order, utm_* tracking noise,
# and #fragment variants
_URLD_RAW = f"""
  SELECT i AS row_id,
         'https://'
         || CASE WHEN i % 3 = 0 THEN 'WWW.' ELSE '' END
         || 'host' || (i % 5)
         || CASE WHEN i % 4 = 1 THEN '.EXAMPLE.com' ELSE '.example.com' END
         || CASE WHEN i % 6 = 2 THEN ':443' ELSE '' END
         || '/p/' || (i % 29)
         || '?'
         || CASE WHEN i % 2 = 0
                 THEN 'a=' || (i % 11) || '&b=' || (i % 7)
                 ELSE 'b=' || (i % 7) || '&a=' || (i % 11) END
         || CASE WHEN i % 5 = 0 THEN '&utm_source=feed' ELSE '' END
         || CASE WHEN i % 7 = 3 THEN '#sec' || (i % 3) ELSE '' END
           AS url
  FROM range({_URLD_N}) t(i)
"""

_URLD_SQL = f"""
WITH raw AS ({_URLD_RAW}),
canon AS (
  SELECT row_id, url,
         'https://'
         || regexp_replace(
              lower(regexp_extract(url, '^https://([^/]+)', 1)),
              '^www\\.|:443$', '', 'g')
         || regexp_extract(url, '^https://[^/]+([^?#]*)', 1)
         || '?'
         || array_to_string(
              list_sort(list_filter(
                string_split(
                  regexp_extract(url, '\\?([^#]*)', 1), '&'),
                x -> NOT starts_with(x, 'utm_'))), '&')
           AS canonical
  FROM raw
)
SELECT canonical, COUNT(*) AS n_variants,
       COUNT(DISTINCT url) AS n_distinct_raw,
       MIN(row_id) AS first_seen
FROM canon GROUP BY canonical
"""


@register("pipeline_url_dedup", _URLD_SQL)
def pipeline_url_dedup(spark, sf_dir):
    """Crawl-style URL canonicalization + dedup — the step every
    CommonCrawl-derived corpus runs before content dedup: lowercase
    host, strip www. and the default :443 port, drop the #fragment,
    drop utm_* tracking params, and sort the surviving query params
    so parameter order can't split a page's identity. The whole
    transform is JVM-side string/array expressions (parse-free
    regexp + higher-order filter/sort on the split query string) —
    zero Python, one hash shuffle on the canonical key, identical
    in shape to dedup_exact. 4000 raw URLs collapse to the
    5x29x11x7 true page set with every variant axis exercised."""
    from pyspark.sql import functions as F

    i = F.col("id")
    raw = spark.range(0, _URLD_N, 1, 8).select(
        i.alias("row_id"),
        F.concat(
            F.lit("https://"),
            F.when(i % 3 == 0, F.lit("WWW.")).otherwise(F.lit("")),
            F.lit("host"),
            (i % 5).cast("string"),
            F.when(i % 4 == 1, F.lit(".EXAMPLE.com")).otherwise(
                F.lit(".example.com")
            ),
            F.when(i % 6 == 2, F.lit(":443")).otherwise(F.lit("")),
            F.lit("/p/"),
            (i % 29).cast("string"),
            F.lit("?"),
            F.when(
                i % 2 == 0,
                F.concat(
                    F.lit("a="), (i % 11).cast("string"),
                    F.lit("&b="), (i % 7).cast("string"),
                ),
            ).otherwise(
                F.concat(
                    F.lit("b="), (i % 7).cast("string"),
                    F.lit("&a="), (i % 11).cast("string"),
                )
            ),
            F.when(i % 5 == 0, F.lit("&utm_source=feed")).otherwise(F.lit("")),
            F.when(
                i % 7 == 3, F.concat(F.lit("#sec"), (i % 3).cast("string"))
            ).otherwise(F.lit("")),
        ).alias("url"),
    )
    host = F.regexp_replace(
        F.lower(F.regexp_extract("url", r"^https://([^/]+)", 1)),
        r"^www\.|:443$",
        "",
    )
    path = F.regexp_extract("url", r"^https://[^/]+([^?#]*)", 1)
    params = F.array_join(
        F.array_sort(
            F.filter(
                F.split(F.regexp_extract("url", r"\?([^#]*)", 1), "&"),
                lambda x: ~x.startswith("utm_"),
            )
        ),
        "&",
    )
    canon = raw.select(
        "row_id",
        "url",
        F.concat(F.lit("https://"), host, path, F.lit("?"), params).alias(
            "canonical"
        ),
    )
    return canon.groupBy("canonical").agg(
        F.count(F.lit(1)).alias("n_variants"),
        F.countDistinct("url").alias("n_distinct_raw"),
        F.min("row_id").alias("first_seen"),
    )


# ---------------------------------------------------------------------------
# events_burstiness — per-user Fano factor over hourly buckets
# ---------------------------------------------------------------------------

_BURST_SQL = """
WITH hourly AS (
  SELECT user_id, date_trunc('hour', ts) AS h,
         CAST(COUNT(*) AS DOUBLE) AS c
  FROM events GROUP BY user_id, date_trunc('hour', ts)
),
s AS (
  SELECT user_id, CAST(COUNT(*) AS DOUBLE) AS n, SUM(c) AS sc,
         SUM(c * c) AS qc
  FROM hourly GROUP BY user_id
)
SELECT CAST(user_id AS BIGINT) AS user_id, CAST(n AS BIGINT) AS n_hours,
       CAST(sc AS BIGINT) AS n_events,
       ROUND((qc / n - (sc / n) * (sc / n)) / (sc / n), 6) AS fano
FROM s
WHERE n >= 24
ORDER BY fano DESC, user_id
LIMIT 50
"""


@register("events_burstiness", _BURST_SQL)
def events_burstiness(spark, sf_dir):
    """Per-user burstiness: the Fano factor (variance / mean of
    hourly event counts over the user's active hours) — the
    dispersion diagnostic that separates steady bots (Fano ~ 0-1,
    sub-Poisson) from bursty humans (>> 1). Counts are exact
    integers, so the per-user sums (n, S, Q) are engine-identical
    and the variance is computed from the raw-moment formula
    written identically on both faces rather than each engine's own
    var_pop accumulator. Two-level integer aggregation (hour buckets
    then user moments), top-50 by dispersion with an id tie-break —
    the same partial->final shape as stats_anova."""
    from pyspark.sql import functions as F

    hourly = (
        _t(spark, sf_dir, "events")
        .groupBy("user_id", F.date_trunc("hour", "ts").alias("h"))
        .agg(F.count(F.lit(1)).cast("double").alias("c"))
    )
    s = hourly.groupBy("user_id").agg(
        F.count(F.lit(1)).cast("double").alias("n"),
        F.sum("c").alias("sc"),
        F.sum(F.col("c") * F.col("c")).alias("qc"),
    )
    n, sc, qc = F.col("n"), F.col("sc"), F.col("qc")
    mean = sc / n
    return (
        s.where(n >= 24)
        .select(
            F.col("user_id").cast("bigint").alias("user_id"),
            n.cast("bigint").alias("n_hours"),
            sc.cast("bigint").alias("n_events"),
            F.round((qc / n - mean * mean) / mean, 6).alias("fano"),
        )
        .orderBy(F.col("fano").desc(), "user_id")
        .limit(50)
    )


# ---------------------------------------------------------------------------
# graph_jaccard — neighbor-set similarity per edge (shared fixture)
# ---------------------------------------------------------------------------

_EDGE_CTE = (
    "pairs AS (SELECT DISTINCT"
    "   LEAST(l_orderkey % 80, l_partkey % 80) AS a,"
    "   GREATEST(l_orderkey % 80, l_partkey % 80) AS b"
    "  FROM lineitem WHERE l_orderkey % 80 <> l_partkey % 80),"
    " e AS (SELECT a, b FROM pairs WHERE"
    "  CAST(CONCAT('0x', substr(md5(CAST(a AS VARCHAR) || ':' ||"
    "   CAST(b AS VARCHAR)), 1, 4)) AS BIGINT) % 100 < 12)"
)

_JACCARD_SQL = f"""
WITH {_EDGE_CTE},
und AS (SELECT a AS u, b AS v FROM e UNION ALL SELECT b AS u, a AS v FROM e),
deg AS (SELECT u, CAST(COUNT(*) AS DOUBLE) AS d FROM und GROUP BY u),
common AS (
  SELECT e.a, e.b, CAST(COUNT(*) AS DOUBLE) AS c
  FROM e
  JOIN und n1 ON n1.u = e.a
  JOIN und n2 ON n2.u = e.b AND n2.v = n1.v
  GROUP BY e.a, e.b
)
SELECT e.a, e.b,
       CAST(COALESCE(c.c, 0) AS BIGINT) AS n_common,
       ROUND(COALESCE(c.c, 0)
             / (da.d + db.d - COALESCE(c.c, 0)), 6) AS jaccard
FROM e
JOIN deg da ON da.u = e.a
JOIN deg db ON db.u = e.b
LEFT JOIN common c ON c.a = e.a AND c.b = e.b
"""


@register("graph_jaccard", _JACCARD_SQL)
def graph_jaccard(spark, sf_dir):
    """Structural edge similarity on the shared md5-thinned residue
    graph (the graph_triangles fixture): for every edge (a,b), the
    Jaccard overlap of the endpoints' neighbor sets |N(a) n N(b)| /
    (deg(a) + deg(b) - |N(a) n N(b)|) — the link-prediction /
    community-strength primitive next to graph_triangles (an edge's
    common-neighbor count is exactly its triangle support). Common
    neighbors come from one wedge join shuffled on the shared
    neighbor id (O(sum deg^2) like triangles, not all-pairs);
    degrees are a group-count broadcast back onto edges; edges with
    zero common neighbors survive via left join. All counts integer
    -> the ratio is deterministic at 6dp."""
    from pyspark.sql import functions as F

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
                    F.col("a").cast("string"),
                    F.lit(":"),
                    F.col("b").cast("string"),
                )
            ),
            1,
            4,
        ),
        16,
        10,
    ).cast("long")
    # e feeds deg, both wedge sides, and the final edge join —
    # materialize it or each branch re-derives the distinct+md5 thin
    # (census: 13 shuffles / 10 scans -> 3 / 1)
    e = pairs.where(coin % 100 < 12).localCheckpoint(eager=False)

    und = e.select(F.col("a").alias("u"), F.col("b").alias("v")).unionAll(
        e.select(F.col("b").alias("u"), F.col("a").alias("v"))
    )
    deg = und.groupBy("u").agg(F.count(F.lit(1)).cast("double").alias("d"))
    n1 = und.select(F.col("u").alias("a"), F.col("v").alias("w"))
    n2 = und.select(F.col("u").alias("b"), F.col("v").alias("w"))
    common = (
        e.join(n1, "a")
        .join(n2, ["b", "w"])
        .groupBy("a", "b")
        .agg(F.count(F.lit(1)).cast("double").alias("c"))
    )
    da = deg.select(F.col("u").alias("a"), F.col("d").alias("da"))
    db = deg.select(F.col("u").alias("b"), F.col("d").alias("db"))
    c = F.coalesce(F.col("c"), F.lit(0.0))
    return (
        e.join(F.broadcast(da), "a")
        .join(F.broadcast(db), "b")
        .join(common, ["a", "b"], "left")
        .select(
            "a",
            "b",
            c.cast("bigint").alias("n_common"),
            F.round(c / (F.col("da") + F.col("db") - c), 6).alias("jaccard"),
        )
    )


# ---------------------------------------------------------------------------
# orders_survival_km — Kaplan-Meier over inter-order gaps
# ---------------------------------------------------------------------------

_KM_SQL = """
WITH seq AS (
  SELECT o_custkey, o_orderdate,
         lead(o_orderdate) OVER (PARTITION BY o_custkey
                                 ORDER BY o_orderdate, o_orderkey) AS nxt
  FROM orders
),
horizon AS (SELECT MAX(o_orderdate) AS hmax FROM orders),
gaps AS (
  SELECT CASE WHEN nxt IS NULL
              THEN date_diff('day', o_orderdate, hmax)
              ELSE date_diff('day', o_orderdate, nxt) END AS t,
         CASE WHEN nxt IS NULL THEN 0 ELSE 1 END AS ev
  FROM seq, horizon
),
tbl AS (
  SELECT t, CAST(SUM(ev) AS DOUBLE) AS d, CAST(COUNT(*) AS DOUBLE) AS x
  FROM gaps GROUP BY t
),
risk AS (
  SELECT t, d,
         SUM(x) OVER (ORDER BY t DESC ROWS UNBOUNDED PRECEDING) AS n
  FROM tbl
)
SELECT CAST(t AS BIGINT) AS t_days, CAST(d AS BIGINT) AS d_events,
       CAST(n AS BIGINT) AS n_at_risk,
       ROUND(EXP(SUM(LN(1.0 - d / n))
                 OVER (ORDER BY t ROWS UNBOUNDED PRECEDING)), 6)
         AS survival
FROM risk
WHERE d > 0 AND d < n
ORDER BY t_days
"""


@register("orders_survival_km", _KM_SQL)
def orders_survival_km(spark, sf_dir):
    """Kaplan-Meier repurchase curve: survival of the 'time until
    next order' per customer, right-censoring each customer's final
    open interval at the dataset horizon — S(t) = prod_{t_i<=t}
    (1 - d_i/n_i). The life table is pure integer aggregation
    (events d_i per distinct gap, at-risk n_i as a DESCENDING
    cumulative count, so censored rows leave the risk set without
    ever being events); the product is taken in log space as a
    cumulative ordered sum. Rows where the last at-risk subjects all
    exit (d = n) are excluded — K-M is degenerate-zero there and
    ln(0) is engine-UB; d > 0 keeps the curve at its jump points.
    One window over customers + one tiny life-table window; the
    horizon is a broadcast scalar."""
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    o = _t(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    seq = o.select(
        "o_custkey",
        "o_orderdate",
        F.lead("o_orderdate").over(w).alias("nxt"),
    )
    horizon = o.agg(F.max("o_orderdate").alias("hmax"))
    gaps = seq.crossJoin(F.broadcast(horizon)).select(
        F.when(
            F.col("nxt").isNull(),
            F.datediff(F.col("hmax"), F.col("o_orderdate")),
        )
        .otherwise(F.datediff(F.col("nxt"), F.col("o_orderdate")))
        .alias("t"),
        F.when(F.col("nxt").isNull(), 0).otherwise(1).alias("ev"),
    )
    tbl = gaps.groupBy("t").agg(
        F.sum("ev").cast("double").alias("d"),
        F.count(F.lit(1)).cast("double").alias("x"),
    )
    wr = Window.orderBy(F.col("t").desc()).rowsBetween(
        Window.unboundedPreceding, 0
    )
    risk = tbl.select("t", "d", F.sum("x").over(wr).alias("n"))
    ws = Window.orderBy("t").rowsBetween(Window.unboundedPreceding, 0)
    surv = F.exp(F.sum(F.log(1.0 - F.col("d") / F.col("n"))).over(ws))
    return (
        risk.withColumn("survival", F.round(surv, 6))
        .where((F.col("d") > 0) & (F.col("d") < F.col("n")))
        .select(
            F.col("t").cast("bigint").alias("t_days"),
            F.col("d").cast("bigint").alias("d_events"),
            F.col("n").cast("bigint").alias("n_at_risk"),
            "survival",
        )
        .orderBy("t_days")
    )


# ---------------------------------------------------------------------------
# agg_mean_family — geometric / harmonic / quadratic means per group
# ---------------------------------------------------------------------------

_MEANS_SQL = """
SELECT o_orderpriority,
       CAST(COUNT(*) AS BIGINT) AS n,
       ROUND(SUM(o_totalprice) / COUNT(*), 6) AS mean_arith,
       ROUND(EXP(SUM(LN(o_totalprice)) / COUNT(*)), 6) AS mean_geom,
       ROUND(COUNT(*) / SUM(1.0 / o_totalprice), 6) AS mean_harm,
       ROUND(SQRT(SUM(o_totalprice * o_totalprice) / COUNT(*)), 6)
         AS mean_quad
FROM orders
WHERE o_totalprice > 0
GROUP BY o_orderpriority
"""


@register("agg_mean_family", _MEANS_SQL)
def agg_mean_family(spark, sf_dir):
    """The classical mean family per order priority — arithmetic,
    geometric (exp of mean log), harmonic (n over reciprocal sum),
    quadratic (RMS) — satisfying harm <= geom <= arith <= quad on
    positive data (the power-mean inequality, pinned in tests).
    One partial->final aggregation computing four accumulators in a
    single pass; the log/reciprocal/square transforms are JVM
    column expressions. The log- and reciprocal-domain sums are the
    documented ulp-drift surface -> 6dp display rounding."""
    from pyspark.sql import functions as F

    p = F.col("o_totalprice")
    cnt = F.count(F.lit(1)).cast("double")
    return (
        _t(spark, sf_dir, "orders")
        .where(p > 0)
        .groupBy("o_orderpriority")
        .agg(
            cnt.cast("bigint").alias("n"),
            F.round(F.sum(p) / cnt, 6).alias("mean_arith"),
            F.round(F.exp(F.sum(F.log(p)) / cnt), 6).alias("mean_geom"),
            F.round(cnt / F.sum(1.0 / p), 6).alias("mean_harm"),
            F.round(F.sqrt(F.sum(p * p) / cnt), 6).alias("mean_quad"),
        )
    )
