"""Round-8 extension wave 74: directed degree census + reciprocity.

The first two numbers a graph person asks of a directed network: the
in/out degree distribution (heavy tails drive every skew/partition
decision the graph family documents) and the RECIPROCITY — the share
of edges whose reverse also exists, separating mutual-link networks
from broadcast ones. Both are integer-exact one-aggregate
quantities over the edge list; reciprocity is a self-join on the
reversed key, the canonical "is the mirror present" probe.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from stockify_spark.registry import register, _t

_EDGE = """
  SELECT DISTINCT l_orderkey % 400 AS s, l_partkey % 400 AS d
  FROM lineitem
  WHERE l_orderkey % 400 <> l_partkey % 400
    AND CAST(CONCAT('0x', substr(md5(CONCAT(
          CAST(LEAST(l_orderkey % 400, l_partkey % 400) AS VARCHAR), ':',
          CAST(GREATEST(l_orderkey % 400, l_partkey % 400) AS VARCHAR))),
          1, 8)) AS BIGINT) % 100 < 8
"""

_DEG_SQL = f"""
WITH e AS ({_EDGE}),
outd AS (SELECT s AS node, CAST(COUNT(*) AS BIGINT) AS k FROM e GROUP BY 1),
ind AS (SELECT d AS node, CAST(COUNT(*) AS BIGINT) AS k FROM e GROUP BY 1),
oh AS (SELECT k AS degree, CAST(COUNT(*) AS BIGINT) AS n_out FROM outd
       GROUP BY 1),
ih AS (SELECT k AS degree, CAST(COUNT(*) AS BIGINT) AS n_in FROM ind
       GROUP BY 1),
recip AS (
  SELECT ROUND(CAST(SUM(CASE WHEN r.s IS NOT NULL THEN 1 ELSE 0 END)
                    AS DOUBLE) / COUNT(*), 6) AS reciprocity
  FROM e LEFT JOIN e r ON r.s = e.d AND r.d = e.s)
SELECT COALESCE(oh.degree, ih.degree) AS degree,
       COALESCE(oh.n_out, 0) AS n_out,
       COALESCE(ih.n_in, 0) AS n_in,
       recip.reciprocity
FROM oh FULL OUTER JOIN ih ON oh.degree = ih.degree
CROSS JOIN recip
"""


@register("graph_degree_census", _DEG_SQL)
def graph_degree_census(spark, sf_dir):
    """In/out degree histogram of the directed order->part residue
    graph (the random-walk/HITS fixture, direction preserved) with
    the graph's reciprocity carried on every row. Conservation
    identities pinned in tests/test_ext85.py: sum(degree * n_out) ==
    sum(degree * n_in) == |E|, and reciprocity recomputed by a
    brute mirror-set check (the thinning coin is symmetric in the
    endpoints, so both directions of a pair survive together —
    making reciprocity a sharp pin, not a free parameter).

    Scale shape: two edge-list aggregates, two degree-bounded
    histograms, one equi-self-join on the reversed key (hash-
    partitioned both sides, no broadcast needed at any scale)."""
    li = _t(spark, sf_dir, "lineitem").select(
        (F.col("l_orderkey") % 400).cast("long").alias("s"),
        (F.col("l_partkey") % 400).cast("long").alias("d"),
    )
    coin = (
        F.conv(
            F.substring(
                F.md5(
                    F.concat(
                        F.least("s", "d").cast("string"),
                        F.lit(":"),
                        F.greatest("s", "d").cast("string"),
                    )
                ),
                1,
                8,
            ),
            16,
            10,
        ).cast("long")
        % 100
    )
    e = (
        li.filter((F.col("s") != F.col("d")) & (coin < 8))
        .distinct()
        .localCheckpoint(eager=True)
    )
    outd = e.groupBy(F.col("s").alias("node")).agg(
        F.count(F.lit(1)).cast("long").alias("k")
    )
    ind = e.groupBy(F.col("d").alias("node")).agg(
        F.count(F.lit(1)).cast("long").alias("k")
    )
    oh = outd.groupBy(F.col("k").alias("degree")).agg(
        F.count(F.lit(1)).cast("long").alias("n_out")
    )
    ih = ind.groupBy(F.col("k").alias("degree")).agg(
        F.count(F.lit(1)).cast("long").alias("n_in")
    )
    rev = e.select(F.col("d").alias("s"), F.col("s").alias("d"), F.lit(1).alias("hit"))
    recip = (
        e.join(rev, ["s", "d"], "left")
        .agg(
            F.round(
                F.sum(F.coalesce(F.col("hit"), F.lit(0))).cast("double")
                / F.count(F.lit(1)),
                6,
            ).alias("reciprocity")
        )
    )
    return (
        oh.join(ih, "degree", "full_outer")
        .select(
            "degree",
            F.coalesce("n_out", F.lit(0)).alias("n_out"),
            F.coalesce("n_in", F.lit(0)).alias("n_in"),
        )
        .crossJoin(F.broadcast(recip))
    )
