"""Round-8 extension wave 59: KMV sketch with set operations.

agg_hll_sketch counts distincts; the K-Minimum-Values sketch
(Bar-Yossef et al. 2002; the theta-sketch family's core) buys the
operation HLL fundamentally cannot do: INTERSECTION estimates. Keep
the K smallest hash values of a set; the K-th smallest h_(K)
estimates the distinct count as (K-1)/h_(K) (hashes ~ Uniform(0,1)),
and — the algebraic gift — the K smallest of a UNION are computable
from the two sketches alone, while each union-sketch member's
presence in both input sketches is an unbiased Jaccard sample:

  J_est = |{h in U_K : h in S_A and h in S_B}| / K
  |A u B|_est = (K-1)/theta,   |A n B|_est = J_est * |A u B|_est

Everything is md5 ranks and integer membership — cross-engine exact
by construction; the only floats are the final estimate divisions.
"""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F

from stockify_spark.registry import register, _t

_K = 64
_H = (
    "CAST(CONCAT('0x', substr(md5(CAST({v} AS VARCHAR)), 1, 8)) AS BIGINT)"
)

_KMV_SQL = f"""
WITH sets AS (
  SELECT DISTINCT r.r_name AS region, l.l_partkey AS part
  FROM lineitem l
  JOIN orders o ON o.o_orderkey = l.l_orderkey
  JOIN customer c ON c.c_custkey = o.o_custkey
  JOIN nation n ON n.n_nationkey = c.c_nationkey
  JOIN region r ON r.r_regionkey = n.n_regionkey),
h AS (SELECT region, part, {_H.format(v='part')} AS hv FROM sets),
sk AS (
  SELECT region, hv
  FROM (SELECT region, hv,
               ROW_NUMBER() OVER (PARTITION BY region ORDER BY hv) AS r
        FROM h)
  WHERE r <= {_K}),
cand AS (
  SELECT a.region AS ra, b.region AS rb, a.hv AS hv, 1 AS in_a, 0 AS in_b
  FROM sk a JOIN (SELECT DISTINCT region FROM sk) b ON a.region < b.region
  UNION ALL
  SELECT a.region, b.region, b.hv, 0, 1
  FROM (SELECT DISTINCT region FROM sk) a
  JOIN sk b ON a.region < b.region),
merged AS (
  SELECT ra, rb, hv, MAX(in_a) AS in_a, MAX(in_b) AS in_b
  FROM cand GROUP BY 1, 2, 3),
uk AS (
  SELECT ra, rb, hv, in_a, in_b,
         ROW_NUMBER() OVER (PARTITION BY ra, rb ORDER BY hv) AS r
  FROM merged),
est AS (
  SELECT ra, rb,
         MAX(CASE WHEN r = {_K} THEN hv END) AS theta,
         SUM(CASE WHEN r <= {_K} AND in_a = 1 AND in_b = 1
                  THEN 1 ELSE 0 END) AS n_both
  FROM uk GROUP BY 1, 2)
SELECT e.ra AS region_a, e.rb AS region_b,
       ROUND(({_K} - 1) * 4294967296.0 / e.theta, 6) AS est_union,
       ROUND(CAST(e.n_both AS DOUBLE) / {_K}, 6) AS est_jaccard,
       ROUND(CAST(e.n_both AS DOUBLE) / {_K}
             * ({_K} - 1) * 4294967296.0 / e.theta, 6) AS est_intersection
FROM est e
"""


@register("agg_kmv_sketch", _KMV_SQL)
def agg_kmv_sketch(spark, sf_dir):
    """KMV sketches (K=64) of each region's distinct part set, and
    the pairwise union / Jaccard / intersection ESTIMATES computed
    from sketches alone — the set algebra HLL registers cannot
    express. Estimator accuracy against the exact sets (all ten
    region pairs within the K^-1/2-scale error band) and the
    union-sketch identity (K smallest of A u B are derivable from
    the two K-sketches) are pinned in tests/test_ext70.py.

    Scale shape: building sketches is one distinct + one rank window
    per set (at 100 TB: partial top-K per partition then merge —
    TakeOrdered, no full sort); every downstream estimate touches
    only 2K rows per pair. The exact CTE exists for the oracle's
    benefit at test scale; production keeps sketches only."""
    sets = (
        _t(spark, sf_dir, "lineitem")
        .join(
            _t(spark, sf_dir, "orders"),
            F.col("l_orderkey") == F.col("o_orderkey"),
        )
        .join(
            _t(spark, sf_dir, "customer"),
            F.col("o_custkey") == F.col("c_custkey"),
        )
        .join(
            F.broadcast(_t(spark, sf_dir, "nation")),
            F.col("c_nationkey") == F.col("n_nationkey"),
        )
        .join(
            F.broadcast(_t(spark, sf_dir, "region")),
            F.col("n_regionkey") == F.col("r_regionkey"),
        )
        .select(F.col("r_name").alias("region"), F.col("l_partkey").alias("part"))
        .distinct()
    )
    hv = F.conv(
        F.substring(F.md5(F.col("part").cast("string")), 1, 8), 16, 10
    ).cast("long")
    h = sets.select("region", "part", hv.alias("hv"))
    sk = (
        h.withColumn(
            "r",
            F.row_number().over(Window.partitionBy("region").orderBy("hv")),
        )
        .filter(F.col("r") <= _K)
        .select("region", "hv")
        .localCheckpoint(eager=True)
    )
    regions = sk.select("region").distinct()
    cand = (
        sk.alias("a")
        .join(
            regions.alias("b"),
            F.col("a.region") < F.col("b.region"),
        )
        .select(
            F.col("a.region").alias("ra"),
            F.col("b.region").alias("rb"),
            F.col("a.hv").alias("hv"),
            F.lit(1).alias("in_a"),
            F.lit(0).alias("in_b"),
        )
        .unionAll(
            regions.alias("a")
            .join(sk.alias("b"), F.col("a.region") < F.col("b.region"))
            .select(
                F.col("a.region").alias("ra"),
                F.col("b.region").alias("rb"),
                F.col("b.hv").alias("hv"),
                F.lit(0).alias("in_a"),
                F.lit(1).alias("in_b"),
            )
        )
    )
    merged = cand.groupBy("ra", "rb", "hv").agg(
        F.max("in_a").alias("in_a"), F.max("in_b").alias("in_b")
    )
    uk = merged.withColumn(
        "r",
        F.row_number().over(Window.partitionBy("ra", "rb").orderBy("hv")),
    )
    est = uk.groupBy("ra", "rb").agg(
        F.max(F.when(F.col("r") == _K, F.col("hv"))).alias("theta"),
        F.sum(
            F.when(
                (F.col("r") <= _K) & (F.col("in_a") == 1) & (F.col("in_b") == 1),
                1,
            ).otherwise(0)
        ).alias("n_both"),
    )
    eu = (_K - 1) * F.lit(4294967296.0) / F.col("theta")
    ej = F.col("n_both").cast("double") / _K
    return est.select(
        F.col("ra").alias("region_a"),
        F.col("rb").alias("region_b"),
        F.round(eu, 6).alias("est_union"),
        F.round(ej, 6).alias("est_jaccard"),
        F.round(ej * eu, 6).alias("est_intersection"),
    )
