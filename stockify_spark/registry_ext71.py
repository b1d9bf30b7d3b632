"""Round-8 extension wave 60: rank-biased overlap.

Comparing two RANKINGS (two retrieval models, two scoring functions,
yesterday's top-N vs today's) needs a measure that weights the top
more than the tail and tolerates non-conjoint lists — Webber,
Moffat & Zobel 2010's RBO: with persistence p,

  RBO@k = (1 - p) * sum_{d=1..k} p^(d-1) * |A_d n B_d| / d

(A_d = the first d items of ranking A). The prefix-overlap series
|A_d n B_d| is one pass over the merged position table: an item
contributes to every depth >= max(rank_A, rank_B), so overlap@d is a
running count of items whose WORSE rank is <= d.

Rankings under test: parts by revenue vs parts by quantity — two
plausible "importance" orderings of the same catalog.
"""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F

from stockify_spark.registry import register, _t

_P = 0.9
_DEPTH = 20
# (1-p) * p^(d-1) as literals: engine pow() implementations differ by
# an ulp, which flips 6dp rounding of the running sum; identical
# literal weights parse to identical doubles on both engines
_W = [(1 - _P) * _P ** (d - 1) for d in range(1, _DEPTH + 1)]
_W_VALUES = ", ".join(f"({d + 1}, {w!r})" for d, w in enumerate(_W))

_RBO_SQL = f"""
WITH s AS (
  SELECT l_partkey AS part,
         ROUND(SUM(l_extendedprice), 2) AS rev,
         CAST(SUM(l_quantity) AS BIGINT) AS qty
  FROM lineitem GROUP BY 1),
ra AS (SELECT part, ROW_NUMBER() OVER (ORDER BY rev DESC, part) AS r
       FROM s),
rb AS (SELECT part, ROW_NUMBER() OVER (ORDER BY qty DESC, part) AS r
       FROM s),
j AS (
  SELECT ra.part, GREATEST(ra.r, rb.r) AS worse
  FROM ra JOIN rb USING (part)
  WHERE ra.r <= {_DEPTH} AND rb.r <= {_DEPTH}),
d(depth, w) AS (VALUES {_W_VALUES}),
ov AS (
  SELECT d.depth, CAST(d.w AS DOUBLE) AS w,
         CAST(COUNT(j.part) AS BIGINT) AS overlap
  FROM d LEFT JOIN j ON j.worse <= d.depth
  GROUP BY 1, 2)
SELECT CAST(depth AS BIGINT) AS depth, overlap,
       ROUND(CAST(overlap AS DOUBLE) / depth, 6) AS agreement,
       ROUND(SUM(w * CAST(overlap AS DOUBLE) / depth)
             OVER (ORDER BY depth), 7) AS rbo_at_depth
FROM ov
"""


@register("stats_rbo", _RBO_SQL)
def stats_rbo(spark, sf_dir):
    """Rank-biased overlap (p=0.9, depth 20) between the
    revenue-ranked and quantity-ranked part lists, emitted as the
    whole prefix curve (depth, overlap, agreement, cumulative RBO) —
    the diagnostic form, not just the scalar. Identities pinned in
    tests/test_ext71.py: identical rankings give agreement 1 at
    every depth and RBO -> 1 - p^k normalization, disjoint prefixes
    give 0, and the top-weighting property (an inversion at depth 2
    costs more RBO than one at depth 20).

    Scale shape: one part-level aggregate (map-side combinable), two
    top-DEPTH rankings (TakeOrdered at scale — never a full sort),
    and a DEPTH-sized overlap table; the depth join and running sum
    touch 20 rows."""
    s = (
        _t(spark, sf_dir, "lineitem")
        .groupBy(F.col("l_partkey").alias("part"))
        .agg(
            F.round(F.sum("l_extendedprice"), 2).alias("rev"),
            F.sum("l_quantity").cast("long").alias("qty"),
        )
    )
    ra = s.select(
        "part",
        F.row_number().over(Window.orderBy(F.col("rev").desc(), "part")).alias(
            "r_a"
        ),
    ).filter(F.col("r_a") <= _DEPTH)
    rb = s.select(
        "part",
        F.row_number().over(Window.orderBy(F.col("qty").desc(), "part")).alias(
            "r_b"
        ),
    ).filter(F.col("r_b") <= _DEPTH)
    j = ra.join(rb, "part").select(
        "part", F.greatest("r_a", "r_b").alias("worse")
    )
    spark_sess = _t(spark, sf_dir, "region").sparkSession
    d = spark_sess.createDataFrame(
        [(i + 1, w) for i, w in enumerate(_W)], "depth long, w double"
    )
    ov = (
        d.join(F.broadcast(j), F.col("worse") <= F.col("depth"), "left")
        .groupBy("depth", "w")
        .agg(F.count("part").alias("overlap"))
    )
    win = Window.orderBy("depth")
    return ov.select(
        F.col("depth").cast("long").alias("depth"),
        F.col("overlap").cast("long").alias("overlap"),
        F.round(F.col("overlap").cast("double") / F.col("depth"), 6).alias(
            "agreement"
        ),
        # 7dp, not the house 6dp: the p=0.9 weights are exact
        # decimals, so the running sum can land DEAD ON a 6dp
        # half-tie (0.0411885 at depth 6 on this data), where Spark's
        # shortest-repr HALF_UP and DuckDB's binary-exact rounding
        # disagree; at 7dp the value is exact and both emit it as-is
        F.round(
            F.sum(
                F.col("w") * F.col("overlap").cast("double") / F.col("depth")
            ).over(win),
            7,
        ).alias("rbo_at_depth"),
    )
