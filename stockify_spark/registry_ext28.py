"""Round-8 extension wave 17: local clustering structure and
information-theoretic dependence.

Clustering coefficient closes the residue-graph family (triangles →
per-vertex transitivity); mutual information closes the entropy
family (marginal entropy → joint dependence). Both are integer-count
designs: the only floats are final closed forms on identical
rationals."""

from __future__ import annotations

from pyspark.sql import functions as F

from stockify_spark.registry import register, _t

_EDGE_CTE28 = (
    "pairs AS (SELECT DISTINCT"
    "   LEAST(l_orderkey % 80, l_partkey % 80) AS a,"
    "   GREATEST(l_orderkey % 80, l_partkey % 80) AS b"
    "  FROM lineitem WHERE l_orderkey % 80 <> l_partkey % 80),"
    " e AS (SELECT a, b FROM pairs WHERE"
    "  CAST(CONCAT('0x', substr(md5(CAST(a AS VARCHAR) || ':' ||"
    "   CAST(b AS VARCHAR)), 1, 4)) AS BIGINT) % 100 < 12)"
)

_CLUSTER_SQL = f"""
WITH {_EDGE_CTE28},
und AS (SELECT a AS u, b AS v FROM e UNION ALL SELECT b AS u, a AS v FROM e),
deg AS (SELECT u, COUNT(*) AS d FROM und GROUP BY u),
tri AS (
  SELECT w.u, COUNT(*) AS t2
  FROM und w
  JOIN und x ON x.u = w.v
  JOIN und y ON y.u = x.v AND y.v = w.u
  GROUP BY w.u
)
SELECT CAST(d.u AS BIGINT) AS vertex, CAST(d.d AS BIGINT) AS degree,
       CAST(COALESCE(t.t2, 0) // 2 AS BIGINT) AS n_triangles,
       CASE WHEN d.d < 2 THEN NULL
            ELSE ROUND(CAST(COALESCE(t.t2, 0) AS DOUBLE)
                       / (d.d * (d.d - 1)), 6) END AS clustering_coeff
FROM deg d LEFT JOIN tri t ON t.u = d.u
"""


@register("graph_clustering_coeff", _CLUSTER_SQL)
def graph_clustering_coeff(spark, sf_dir):
    """Local clustering coefficient on the shared residue graph:
    C(v) = triangles(v) / C(deg(v), 2). Triangles-at-v come from the
    closed-wedge walk (neighbor of neighbor that returns to v) which
    counts each triangle TWICE per vertex — the /2 and the
    2/(d(d−1)) normalization are folded into one integer-exact
    division. Degree-1 vertices have no defined coefficient (NULL on
    both faces). Same O(Σ deg²) wedge bound as graph_triangles;
    counts are integers so the ratio is deterministic."""
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
                    F.col("a").cast("string"), F.lit(":"), F.col("b").cast("string")
                )
            ),
            1,
            4,
        ),
        16,
        10,
    ).cast("long")
    e = pairs.where(coin % 100 < 12).localCheckpoint(eager=False)
    und = e.select(F.col("a").alias("u"), F.col("b").alias("v")).unionAll(
        e.select(F.col("b").alias("u"), F.col("a").alias("v"))
    )
    deg = und.groupBy("u").agg(F.count(F.lit(1)).alias("d"))
    w = und.select(F.col("u").alias("u0"), F.col("v").alias("v1"))
    x = und.select(F.col("u").alias("v1"), F.col("v").alias("v2"))
    y = und.select(F.col("u").alias("v2"), F.col("v").alias("u0"))
    tri = (
        w.join(x, "v1").join(y, ["v2", "u0"]).groupBy("u0").agg(
            F.count(F.lit(1)).alias("t2")
        )
    )
    c = F.col
    t2 = F.coalesce(c("t2"), F.lit(0))
    return (
        deg.join(tri, deg["u"] == tri["u0"], "left")
        .select(
            c("u").cast("long").alias("vertex"),
            c("d").cast("long").alias("degree"),
            F.floor(t2 / 2).cast("long").alias("n_triangles"),
            F.when(c("d") < 2, F.lit(None).cast("double"))
            .otherwise(F.round(t2.cast("double") / (c("d") * (c("d") - 1)), 6))
            .alias("clustering_coeff"),
        )
    )


_MI_SQL = """
WITH j AS (
  SELECT event_type, CAST(hour(ts) AS BIGINT) AS hr, COUNT(*) AS c
  FROM events GROUP BY 1, 2
),
tot AS (SELECT CAST(SUM(c) AS DOUBLE) AS n FROM j),
mx AS (SELECT event_type, CAST(SUM(c) AS DOUBLE) AS cx FROM j GROUP BY 1),
my AS (SELECT hr, CAST(SUM(c) AS DOUBLE) AS cy FROM j GROUP BY 1)
SELECT ROUND(SUM((j.c / tot.n)
               * ln((j.c / tot.n) / ((mx.cx / tot.n) * (my.cy / tot.n)))), 6)
         AS mutual_info,
       ROUND(-SUM((j.c / tot.n) * ln(j.c / tot.n)), 6) AS joint_entropy,
       CAST(COUNT(*) AS BIGINT) AS n_cells
FROM j
JOIN mx ON mx.event_type = j.event_type
JOIN my ON my.hr = j.hr
CROSS JOIN tot
"""


@register("stats_mutual_info", _MI_SQL)
def stats_mutual_info(spark, sf_dir):
    """Mutual information between event type and hour-of-day, plus
    the joint entropy (nats): I(X;Y) = Σ p_xy ln(p_xy/(p_x p_y))
    over the 5×24 contingency table. All probabilities are integer
    counts over one total, so both engines feed ln identical
    rationals; the 120-term sum's order drift is absorbed at 6dp.
    The contingency table is one shuffle; marginals are reductions
    of it — the dependence-mining shape for any pair of categorical
    columns at scale."""
    ev = _t(spark, sf_dir, "events")
    j = ev.groupBy(
        "event_type", F.hour("ts").cast("long").alias("hr")
    ).agg(F.count(F.lit(1)).alias("c")).localCheckpoint(eager=False)
    tot = j.agg(F.sum("c").cast("double").alias("n"))
    mx = j.groupBy("event_type").agg(F.sum("c").cast("double").alias("cx"))
    my = j.groupBy("hr").agg(F.sum("c").cast("double").alias("cy"))
    c = F.col
    p = c("c") / c("n")
    px = c("cx") / c("n")
    py = c("cy") / c("n")
    return (
        j.join(F.broadcast(mx), "event_type")
        .join(F.broadcast(my), "hr")
        .crossJoin(F.broadcast(tot))
        .agg(
            F.round(F.sum(p * F.log(p / (px * py))), 6).alias("mutual_info"),
            F.round(-F.sum(p * F.log(p)), 6).alias("joint_entropy"),
            F.count(F.lit(1)).cast("long").alias("n_cells"),
        )
    )
