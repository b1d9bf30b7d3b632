"""Round-8 extension wave 27: multiple-testing control (BH-FDR).

A fleet of per-group hypothesis tests is only as good as its
multiple-comparisons story: at m=25 groups and alpha=0.05, one
false positive per screen is the EXPECTED outcome. The
Benjamini-Hochberg step-up procedure (Benjamini & Hochberg 1995)
controls the false-discovery rate: sort p-values ascending, find the
largest k with p_(k) <= q*k/m, reject hypotheses 1..k.

The engine-side trick that makes this exactly reproducible across
Spark and DuckDB: the test statistic is a z-score, and p_(i) <=
q*i/(2m) (two-sided) is equivalent to |z|_(i) >= Phi^-1(1 -
q*i/(2m)) — so instead of computing p-values (no erf/normal-CDF
builtin in either engine), both faces compare the rank-i |z| against
a LITERAL threshold ladder computed once at authoring time
(statistics.NormalDist().inv_cdf, stdlib). BH on p ascending is BH
on |z| descending; no special functions ever run inside a query.

Family under test: for each of the 25 nations, does its customers'
mean account balance differ from the global mean? One-sample z
against the global moments (null: the nation is an exchangeable
sample of the population).
"""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F

from stockify_spark.registry import register, _t

# Phi^-1(1 - 0.10*i/(2*25)) for i = 1..25 — BH step-up fence for
# two-sided z at FDR q=0.10, m=25 (see module docstring)
_BH_THR = [
    2.878162, 2.65207, 2.512144, 2.408916, 2.326348, 2.257129,
    2.197286, 2.144411, 2.096927, 2.053749, 2.014091, 1.977368,
    1.943134, 1.911036, 1.880794, 1.85218, 1.825007, 1.799118,
    1.774382, 1.750686, 1.727934, 1.706043, 1.684941, 1.664563,
    1.644854,
]

_THR_VALUES = ", ".join(
    f"({i + 1}, {t})" for i, t in enumerate(_BH_THR)
)

_FDR_SQL = f"""
WITH g AS (
  SELECT CAST(COUNT(*) AS BIGINT) AS n_all,
         ROUND(SUM(c_acctbal), 6) AS s1_all,
         ROUND(SUM(c_acctbal * c_acctbal), 6) AS s2_all
  FROM customer
),
per AS (
  SELECT c_nationkey AS nationkey,
         CAST(COUNT(*) AS BIGINT) AS n,
         ROUND(SUM(c_acctbal), 6) AS s1
  FROM customer GROUP BY 1
),
z AS (
  SELECT nationkey, n,
         ROUND((s1 / n - s1_all / n_all)
               / sqrt((s2_all / n_all - (s1_all / n_all) * (s1_all / n_all))
                      / n), 6) AS zscore
  FROM per CROSS JOIN g
),
r AS (
  SELECT nationkey, n, zscore,
         ROW_NUMBER() OVER (ORDER BY abs(zscore) DESC, nationkey) AS rnk
  FROM z
),
thr(rnk, thr) AS (VALUES {_THR_VALUES}),
hit AS (
  SELECT r.nationkey, r.n, r.zscore, r.rnk,
         CAST(thr.thr AS DOUBLE) AS thr,
         abs(r.zscore) >= CAST(thr.thr AS DOUBLE) AS over_fence
  FROM r JOIN thr USING (rnk)
),
kstar AS (
  SELECT COALESCE(MAX(CASE WHEN over_fence THEN rnk END), 0) AS k
  FROM hit
)
SELECT nationkey, n, zscore, CAST(rnk AS BIGINT) AS rnk, thr,
       rnk <= k AS rejected
FROM hit CROSS JOIN kstar
"""


@register("stats_fdr_bh", _FDR_SQL)
def stats_fdr_bh(spark, sf_dir):
    """Benjamini-Hochberg FDR screen over the 25 per-nation
    mean-balance z-tests: z-scores from globally-rounded moment sums
    (round-before-decide, the repo's cross-engine float policy),
    ranked by |z| descending with a nationkey tie-break, compared to
    the literal Phi^-1 fence ladder, and step-up rejected (every
    rank <= the deepest fence crossing, including any non-crossing
    ranks above it — the step-up property that distinguishes BH from
    per-test thresholding; pinned in tests/test_ext38.py).

    Scale shape: two aggregates over the fact table (one global, one
    per-group, both map-side combinable), then every remaining op
    runs on m=25 rows — the threshold ladder is a VALUES literal,
    the rank window and the k* maximum are group-count-sized. At
    100 TB the plan is still two scans (or one, with a grouping-sets
    rewrite) over customer and a driver-negligible tail."""
    cust = _t(spark, sf_dir, "customer")
    g = cust.agg(
        F.count(F.lit(1)).cast("long").alias("n_all"),
        F.round(F.sum("c_acctbal"), 6).alias("s1_all"),
        F.round(F.sum(F.col("c_acctbal") * F.col("c_acctbal")), 6).alias(
            "s2_all"
        ),
    )
    per = cust.groupBy(F.col("c_nationkey").alias("nationkey")).agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.round(F.sum("c_acctbal"), 6).alias("s1"),
    )
    mu = F.col("s1_all") / F.col("n_all")
    var = F.col("s2_all") / F.col("n_all") - mu * mu
    z = per.crossJoin(F.broadcast(g)).select(
        "nationkey",
        "n",
        F.round(
            (F.col("s1") / F.col("n") - mu) / F.sqrt(var / F.col("n")), 6
        ).alias("zscore"),
    )
    r = z.withColumn(
        "rnk",
        F.row_number().over(
            Window.orderBy(F.abs(F.col("zscore")).desc(), F.col("nationkey"))
        ),
    )
    thr = F.element_at(
        F.array(*[F.lit(t) for t in _BH_THR]), F.col("rnk").cast("int")
    )
    hit = r.select(
        "nationkey",
        "n",
        "zscore",
        "rnk",
        thr.alias("thr"),
        (F.abs(F.col("zscore")) >= thr).alias("over_fence"),
    )
    k = hit.agg(
        F.coalesce(
            F.max(F.when(F.col("over_fence"), F.col("rnk"))), F.lit(0)
        ).alias("k")
    )
    return hit.crossJoin(F.broadcast(k)).select(
        "nationkey",
        "n",
        "zscore",
        F.col("rnk").cast("long").alias("rnk"),
        "thr",
        (F.col("rnk") <= F.col("k")).alias("rejected"),
    )
