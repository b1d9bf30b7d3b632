"""Round-8 extension wave 35: Poisson bootstrap confidence intervals.

The classical bootstrap resamples n rows WITH replacement per
replicate — a join against random indexes, unusable at 100 TB. The
Poisson bootstrap (the public large-scale variant — Chamandy,
Muralidharan, Najmi & Naidu 2012, "Estimating uncertainty for
massive data streams") replaces the multinomial resample with an
independent Poisson(1) weight per (row, replicate): single pass, no
coordination, each replicate's weighted mean converges to the same
bootstrap distribution. Weights here are fully deterministic — the
repo's seeded-md5 uniform inverted through the Poisson(1) CDF as a
literal threshold ladder — so Spark and DuckDB draw bit-identical
resamples and the CI is exact-hash comparable.
"""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F

from stockify_spark.registry import register, _t

_B = 100  # bootstrap replicates
# cumulative Poisson(1) CDF, 12dp literals (module docstring)
_POIS_CDF = [
    0.367879441171, 0.735758882343, 0.919698602929, 0.981011843124,
    0.996340153173, 0.999405815182, 0.999916758851, 0.999989750803,
    0.999998874797,
]
# alpha = 5%: explicit-rank fences over the B sorted replicate means
_LO_RANK, _HI_RANK = 3, 98


def _case_sql(u: str) -> str:
    out = "CASE "
    for k, c in enumerate(_POIS_CDF):
        out += f"WHEN {u} < {c} THEN {k} "
    return out + f"ELSE {len(_POIS_CDF)} END"


_BOOT_SQL = f"""
WITH d AS (SELECT o_orderpriority AS pri, o_totalprice AS x, o_orderkey AS k
           FROM orders),
e AS (SELECT pri, x, k, unnest(range(1, {_B + 1})) AS b FROM d),
w AS (SELECT pri, x, b,
             {_case_sql(
                 "(CAST(CONCAT('0x', substr(md5(CONCAT(CAST(b AS VARCHAR),"
                 " '|', CAST(k AS VARCHAR))), 1, 8)) AS BIGINT)"
                 " / 4294967296.0)"
             )} AS wt
      FROM e),
rep AS (SELECT pri, b,
               ROUND(SUM(wt * x), 6) / SUM(wt) AS mean_b
        FROM w GROUP BY 1, 2 HAVING SUM(wt) > 0),
rk AS (SELECT pri, mean_b,
              ROW_NUMBER() OVER (PARTITION BY pri ORDER BY mean_b, b) AS r
       FROM rep),
pt AS (SELECT pri, ROUND(SUM(x), 6) / COUNT(*) AS point, COUNT(*) AS n
       FROM d GROUP BY 1)
SELECT pt.pri AS priority,
       CAST(pt.n AS BIGINT) AS n,
       ROUND(pt.point, 6) AS point_mean,
       ROUND(MAX(CASE WHEN r = {_LO_RANK} THEN mean_b END), 6) AS ci_lo,
       ROUND(MAX(CASE WHEN r = {_HI_RANK} THEN mean_b END), 6) AS ci_hi
FROM pt JOIN rk ON rk.pri = pt.pri
GROUP BY 1, 2, 3
"""


@register("stats_bootstrap_ci", _BOOT_SQL)
def stats_bootstrap_ci(spark, sf_dir):
    """95% Poisson-bootstrap CI for the mean order value per
    priority: 100 replicates, weight of row k in replicate b =
    PoissonCDF^-1(md5int(b|k) / 2^32) via the literal ladder, CI
    fences at explicit ranks 3 and 98 of the sorted replicate means
    (the agg_histogram_equidepth rank discipline — no interpolation
    ambiguity). Replicate numerators round to 6dp before the divide;
    the weight sum is integer-exact.

    Scale shape: the replicate explode multiplies rows by B but
    stays a narrow map; the only shuffle is the (priority, b)
    aggregate — B*groups cells, map-side combinable — and the rank
    window runs on B rows per group. No join against a resample
    index, no multinomial coordination: that single-pass property is
    the entire reason this bootstrap variant exists. Coverage
    calibration (the CI catching the true mean of held-out
    re-draws) is pinned statistically in tests/test_ext46.py."""
    from stockify_spark.functions.scale import spread_small_scan

    d = _t(spark, sf_dir, "orders").select(
        F.col("o_orderpriority").alias("pri"),
        F.col("o_totalprice").alias("x"),
        F.col("o_orderkey").alias("k"),
    )
    # spread the single-row-group orders scan BEFORE the ×B explode:
    # the md5-per-(row, replicate) map is B× the scan bytes in CPU,
    # and a one-file scan otherwise runs all of it in ONE task (the
    # agg_countmin_sketch case, functions/scale §doc; no-op at scale)
    e = spread_small_scan(d).select(
        "pri", "x", "k",
        F.explode(F.sequence(F.lit(1), F.lit(_B))).alias("b"),
    )
    u = (
        F.conv(
            F.substring(
                F.md5(
                    F.concat(
                        F.col("b").cast("string"),
                        F.lit("|"),
                        F.col("k").cast("string"),
                    )
                ),
                1,
                8,
            ),
            16,
            10,
        ).cast("long")
        / F.lit(4294967296.0)
    )
    wt = F.lit(len(_POIS_CDF))
    for k in range(len(_POIS_CDF) - 1, -1, -1):
        wt = F.when(u < _POIS_CDF[k], F.lit(k)).otherwise(wt)
    w = e.select("pri", "x", "b", wt.alias("wt"))
    rep = (
        w.groupBy("pri", "b")
        .agg(
            F.round(F.sum(F.col("wt") * F.col("x")), 6).alias("num"),
            F.sum("wt").alias("den"),
        )
        .filter(F.col("den") > 0)
        .select("pri", "b", (F.col("num") / F.col("den")).alias("mean_b"))
    )
    rk = rep.withColumn(
        "r",
        F.row_number().over(
            Window.partitionBy("pri").orderBy("mean_b", "b")
        ),
    )
    pt = d.groupBy("pri").agg(
        (F.round(F.sum("x"), 6) / F.count(F.lit(1))).alias("point"),
        F.count(F.lit(1)).alias("n"),
    )
    return (
        pt.join(rk, "pri")
        .groupBy(
            F.col("pri").alias("priority"),
            F.col("n").cast("long").alias("n"),
            F.round("point", 6).alias("point_mean"),
        )
        .agg(
            F.round(
                F.max(F.when(F.col("r") == _LO_RANK, F.col("mean_b"))), 6
            ).alias("ci_lo"),
            F.round(
                F.max(F.when(F.col("r") == _HI_RANK, F.col("mean_b"))), 6
            ).alias("ci_hi"),
        )
    )
