"""Round-8 extension wave 44: seeded random walks.

DeepWalk/node2vec (Perozzi et al. 2014; Grover & Leskovec 2016)
train embeddings on a CORPUS OF WALKS — the graph-side analogue of
the documents table, and the missing producer between the repo's
graph family and its embedding family. Production walk generation is
seeded for reproducibility; here the step choice is fully
data-keyed: from node v at step k of the walk started at s, the next
node is the (md5int(k|v|s) mod degree)-th entry of v's SORTED
neighbor list. No state machine, no RNG service — each step is one
equi-join against the adjacency-array table on both engines.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from stockify_spark.registry import register, _t

_STEPS = 4

_ADJ_SQL = """
e AS (
  SELECT DISTINCT LEAST(l_orderkey % 400, l_partkey % 400) AS a,
                  GREATEST(l_orderkey % 400, l_partkey % 400) AS b
  FROM lineitem
  WHERE l_orderkey % 400 <> l_partkey % 400
    AND CAST(CONCAT('0x', substr(md5(CONCAT(
          CAST(LEAST(l_orderkey % 400, l_partkey % 400) AS VARCHAR), ':',
          CAST(GREATEST(l_orderkey % 400, l_partkey % 400) AS VARCHAR))),
          1, 8)) AS BIGINT) % 100 < 8),
sym AS (SELECT a, b FROM e UNION ALL SELECT b, a FROM e),
adj AS (SELECT a AS node, list(b ORDER BY b) AS nbrs FROM sym GROUP BY 1)
"""


def _walk_oracle(steps: int) -> str:
    sql = f"WITH {_ADJ_SQL},\nw0 AS (SELECT node AS start, node FROM adj)"
    for k in range(1, steps + 1):
        sql += f""",
w{k} AS (
  SELECT w.start,
         a.nbrs[1 + CAST(CAST(CONCAT('0x', substr(md5(CONCAT(
             '{k}', '|', CAST(w.node AS VARCHAR), '|',
             CAST(w.start AS VARCHAR))), 1, 8)) AS BIGINT)
             % len(a.nbrs) AS INT)] AS node
  FROM w{k - 1} w JOIN adj a ON a.node = w.node)"""
    rows = " UNION ALL ".join(
        f"SELECT CAST(start AS BIGINT) AS start, CAST({k} AS BIGINT) AS step,"
        f" CAST(node AS BIGINT) AS node FROM w{k}"
        for k in range(steps + 1)
    )
    return sql + "\n" + rows


@register("graph_random_walk", _walk_oracle(_STEPS))
def graph_random_walk(spark, sf_dir):
    """One 4-step seeded walk from every node of the symmetrized
    residue graph, emitted as (start, step, node) — the walk corpus
    a skip-gram embedding trainer consumes. Choices are data-keyed
    (walk seed = step|current|start), so revisiting a node inside
    one walk or across walks redraws independently, and the corpus
    is reproducible byte-for-byte across engines and reruns —
    pinned against an independent reimplementation plus an
    edge-membership check in tests/test_ext55.py.

    Scale shape: the adjacency-array table is one groupBy over the
    edge list (degree-bounded rows); each step is one equi-join of
    the frontier against it — K joins for K steps, frontier size
    constant at |starts|, no driver state at all (contrast the
    kcore/pagerank iterations, which carry scores). A billion-node
    walk corpus is K shuffle-joins, embarrassingly wide."""
    li = _t(spark, sf_dir, "lineitem").select(
        (F.col("l_orderkey") % 400).cast("long").alias("x"),
        (F.col("l_partkey") % 400).cast("long").alias("y"),
    )
    a, b = F.least("x", "y"), F.greatest("x", "y")
    coin = (
        F.conv(
            F.substring(
                F.md5(F.concat(a.cast("string"), F.lit(":"), b.cast("string"))),
                1,
                8,
            ),
            16,
            10,
        ).cast("long")
        % 100
    )
    e = (
        li.filter((F.col("x") != F.col("y")) & (coin < 8))
        .select(a.alias("a"), b.alias("b"))
        .distinct()
    )
    sym = e.unionAll(e.select(F.col("b").alias("a"), F.col("a").alias("b")))
    adj = (
        sym.groupBy(F.col("a").alias("node"))
        .agg(F.sort_array(F.collect_list("b")).alias("nbrs"))
        .localCheckpoint(eager=True)
    )
    frontier = adj.select(F.col("node").alias("start"), "node")
    out = frontier.select("start", F.lit(0).cast("long").alias("step"), "node")
    for k in range(1, _STEPS + 1):
        h = (
            F.conv(
                F.substring(
                    F.md5(
                        F.concat(
                            F.lit(str(k)),
                            F.lit("|"),
                            F.col("node").cast("string"),
                            F.lit("|"),
                            F.col("start").cast("string"),
                        )
                    ),
                    1,
                    8,
                ),
                16,
                10,
            ).cast("long")
            % F.size("nbrs")
        )
        frontier = (
            frontier.join(adj, "node")
            .select(
                "start",
                F.element_at("nbrs", (h + 1).cast("int")).alias("node"),
            )
        )
        out = out.unionAll(
            frontier.select(
                "start", F.lit(k).cast("long").alias("step"), "node"
            )
        )
    return out.select(
        F.col("start").cast("long").alias("start"),
        "step",
        F.col("node").cast("long").alias("node"),
    )
