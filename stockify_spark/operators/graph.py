"""Iterative graph operators beyond connected components
(llm/dedup.connected_components): weighted PageRank.

The reference engine has no graph surface; this extends the
north-star iterative-algorithm family (SURVEY §7.6) with the second
classic fixed-point computation. The Spark shape is the textbook
one — rank vector joined to the edge list each round, contributions
combined map-side by destination — with ``localCheckpoint`` every
few rounds so plan depth stays bounded (the same lineage-truncation
policy as the path-doubling connected components).

Determinism note for differential testing: each destination's
contribution sum adds its in-edges in engine-defined order, so
cross-engine agreement is to ~1 ulp per round; oracles must ROUND
the final ranks (9 decimals keeps ~6 orders of margin over the
accumulated error on bounded-degree graphs).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def pagerank(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
    weight: str | None = "w",
    iters: int = 8,
    damping: float = 0.85,
    checkpoint_every: int = 4,
) -> DataFrame:
    """Weighted PageRank over an edge list; returns (node, rank).

    The node set is the distinct ``src`` set and every iteration
    keeps exactly the nodes that received in-edge contributions —
    the inner-join fixed point. On a graph where every node has both
    in- and out-edges (e.g. the dense nation trade graph below) this
    IS standard PageRank with uniform teleport; nodes without
    in-edges would drop out, identically in any engine running the
    same recurrence — callers wanting dangling-mass redistribution
    should close the graph first.

    Scale shape: building ``edges`` is the data-sized work (callers
    aggregate it from fact tables — weights are exact counts); the
    iteration joins move (node, rank) rows only. Spark broadcasts
    the rank side automatically when the node set is small; for
    billion-node graphs the same loop holds with both sides
    hash-partitioned on the join key, and ``localCheckpoint`` keeps
    the 2·iters-join lineage from accreting superlinear planning
    cost.
    """
    w = F.col(weight) if weight else F.lit(1.0)
    ew = edges.select(
        F.col(src).alias("_src"), F.col(dst).alias("_dst"), w.cast("double").alias("_w")
    )
    outw = ew.groupBy("_src").agg(F.sum("_w").alias("_ow"))
    # Materialize the normalized edge list ONCE (eager checkpoint):
    # it is referenced by every iteration, and without this each
    # round's plan re-derives it from the source — for an edge table
    # aggregated from fact joins that means re-running the joins
    # iters times (the plan audit showed 33 scans for 8 rounds).
    ew = ew.join(outw, "_src").localCheckpoint(eager=True)

    nodes = ew.select(F.col("_src").alias("node")).distinct()
    n = nodes.count()  # bounded: one scalar for the teleport term
    teleport = (1.0 - damping) / n

    ranks = nodes.withColumn("rank", F.lit(1.0 / n))
    for i in range(iters):
        contribs = (
            ranks.join(ew, ranks["node"] == ew["_src"])
            .groupBy("_dst")
            .agg(F.sum(F.col("rank") * F.col("_w") / F.col("_ow")).alias("_c"))
        )
        ranks = contribs.select(
            F.col("_dst").alias("node"),
            (F.lit(teleport) + F.lit(damping) * F.col("_c")).alias("rank"),
        )
        if checkpoint_every and (i + 1) % checkpoint_every == 0 and i + 1 < iters:
            # eager: actually truncate lineage now — a lazy checkpoint
            # materializes nothing until an action, leaving the full
            # 2·iters-join plan in place for the final one
            ranks = ranks.localCheckpoint(eager=True)
    return ranks
