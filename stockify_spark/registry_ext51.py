"""Round-8 extension wave 40: HITS hubs and authorities.

Kleinberg's HITS (1999): on a directed graph, a good HUB points at
good authorities and a good AUTHORITY is pointed at by good hubs —
the mutually recursive pair h = A·a, a = A^T·h, iterated with
normalization. Unlike PageRank (one score, random-walk semantics),
HITS separates the two roles, which is the natural reading of a
bipartite-ish order→part residue graph: orders that touch
high-demand parts are hubs, parts touched by broad orders are
authorities.

Three power iterations, L1 normalization each half-step, fixed
iteration count on both faces (the graph_kcore bounded-round
contract). Float policy: per-node sums round at 6dp (the only
order-sensitive reduction), the normalizer is a rounded sum of
rounded values, and the normalized scores round at 9dp before the
next half-step consumes them — drift cannot compound.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from stockify_spark.registry import register, _t

_ITERS = 3

_EDGE_SQL = """
SELECT DISTINCT l_orderkey % 400 AS s, l_partkey % 400 AS d
FROM lineitem
WHERE l_orderkey % 400 <> l_partkey % 400
  AND CAST(CONCAT('0x', substr(md5(CONCAT(
        CAST(LEAST(l_orderkey % 400, l_partkey % 400) AS VARCHAR), ':',
        CAST(GREATEST(l_orderkey % 400, l_partkey % 400) AS VARCHAR))),
        1, 8)) AS BIGINT) % 100 < 8
"""


def _hits_oracle(iters: int) -> str:
    sql = f"""WITH e AS ({_EDGE_SQL}),
nodes AS (SELECT s AS node FROM e UNION SELECT d FROM e),
a0 AS (SELECT node, 1.0 AS x FROM nodes)"""
    prev = "a0"
    for k in range(1, iters + 1):
        for face, src, dst in (("h", "d", "s"), ("a", "s", "d")):
            name = f"{face}{k}"
            sql += f""",
{name}r AS (SELECT e.{dst} AS node, ROUND(SUM(p.x), 6) AS v
            FROM e JOIN {prev} p ON p.node = e.{src} GROUP BY 1),
{name}t AS (SELECT ROUND(SUM(v), 6) AS t FROM {name}r),
{name} AS (SELECT n.node,
                  ROUND(COALESCE(r.v, 0) / {name}t.t, 9) AS x
           FROM nodes n LEFT JOIN {name}r r USING (node)
           CROSS JOIN {name}t)"""
            prev = name
    return sql + f"""
SELECT CAST(n.node AS BIGINT) AS node, h.x AS hub, a.x AS authority
FROM nodes n JOIN h{iters} h USING (node) JOIN a{iters} a USING (node)
"""


@register("graph_hits", _hits_oracle(_ITERS))
def graph_hits(spark, sf_dir):
    """HITS on the directed order→part residue graph (the
    graph_triangles/kcore fixture family, direction preserved):
    three h/a half-step pairs, L1-normalized, emitted per node.
    Mutual reinforcement (hub mass flowing to authorities and back)
    is pinned in tests/test_ext51.py against a numpy power
    iteration, plus the role separation a PageRank cannot express:
    pure sources get hub > 0 with authority = 0 and sinks the
    reverse.

    Scale shape: each half-step is one equi-join of the edge list
    against a node-score table plus one map-side-combinable sum —
    the graph_pagerank layout exactly, 2*K shuffles total, scores
    localCheckpointed between steps so the lineage stays linear
    (the kcore discipline). Edge list checkpointed once, read by
    all six half-steps."""
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
    nodes = (
        e.select(F.col("s").alias("node"))
        .union(e.select(F.col("d").alias("node")))
        .distinct()
        .localCheckpoint(eager=True)
    )
    score = nodes.select("node", F.lit(1.0).alias("x"))
    out = {}
    for _k in range(1, _ITERS + 1):
        for face, src, dst in (("h", "d", "s"), ("a", "s", "d")):
            r = (
                e.join(
                    score.withColumnRenamed("node", src), src
                )
                .groupBy(F.col(dst).alias("node"))
                .agg(F.round(F.sum("x"), 6).alias("v"))
            )
            t = r.agg(F.round(F.sum("v"), 6).alias("t"))
            score = (
                nodes.join(r, "node", "left")
                .crossJoin(F.broadcast(t))
                .select(
                    "node",
                    F.round(
                        F.coalesce(F.col("v"), F.lit(0.0)) / F.col("t"), 9
                    ).alias("x"),
                )
                .localCheckpoint(eager=False)
            )
            out[face] = score
    return (
        nodes.join(out["h"].withColumnRenamed("x", "hub"), "node")
        .join(out["a"].withColumnRenamed("x", "authority"), "node")
        .select(F.col("node").cast("long").alias("node"), "hub", "authority")
    )
