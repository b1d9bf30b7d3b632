"""Round-13 extension wave 95: partitioned txlog tables + label
propagation.

``txlog_partitioned`` drives the new Hive-style partition-column
support (sources/txlog.py create_partitioned / partitionValues /
snapshot_partition_pruned — Delta's partition design: values live in
the LOG, pruning needs zero file opens). ``graph_label_propagation``
adds the community-detection primitive next to graph_pagerank /
graph_kcore, with the same bounded-round oracle contract the peel
uses.
"""

from __future__ import annotations

import json
import os

from pyspark.sql import Window
from pyspark.sql import functions as F

from stockify_spark.registry import register, _t

# ---------------------------------------------------------------------------
# txlog_partitioned — partition columns + log-level partition pruning
# ---------------------------------------------------------------------------

_PRIS = ("1-URGENT", "3-MEDIUM")

_PART_SQL = f"""
SELECT o_orderpriority AS pri,
       CAST(COUNT(*) AS BIGINT) AS n_rows,
       ROUND(SUM(o_totalprice), 2) AS sum_total,
       CAST(2 AS BIGINT) AS files_opened,
       CAST(10 AS BIGINT) AS files_total
FROM orders
WHERE o_orderpriority IN ('{_PRIS[0]}', '{_PRIS[1]}')
GROUP BY o_orderpriority
"""


@register("txlog_partitioned", _PART_SQL)
def txlog_partitioned(spark, sf_dir):
    """Partitioned txlog table end-to-end: create orders partitioned
    by priority (partition values recorded in the log's add actions,
    NOT in the files — Delta's partitionValues), append a second
    batch, then answer a per-priority aggregate from PARTITION-PRUNED
    reads. The structural columns pin the pruning contract: each
    probed priority opens exactly its own 2 files (1 per write) of
    the table's 10 — counted from the log alone before any scan.
    The oracle recomputes the aggregates straight from orders, so a
    partition value mis-parsed from the staging layout, a literal
    re-attached with the wrong type, or a pruned read that dropped a
    file changes rows or sums.

    Scale shape: pruning cost is O(live add actions) driver-side log
    metadata (the same ledger every snapshot already replays); the
    read plans one multi-file scan per matching partition. At 100 TB
    this is the difference between scanning a table and scanning a
    partition — the first lever any warehouse pulls."""
    from stockify_spark.registry_ext7 import _scratch_table
    from stockify_spark.sources import txlog

    orders = _t(spark, sf_dir, "orders").select(
        "o_orderkey", "o_totalprice", "o_orderpriority"
    )

    def build(path: str) -> None:
        t = os.path.join(path, "t")
        txlog.create_partitioned(
            orders.filter(F.col("o_orderkey") % 2 == 0).coalesce(1),
            t,
            ["o_orderpriority"],
        )
        txlog.append(orders.filter(F.col("o_orderkey") % 2 == 1).coalesce(1), t)
        counts = {
            "files_total": len(txlog.live_files(t)),
            "files_opened": {
                p: len(txlog.partition_files(t, {"o_orderpriority": p}))
                for p in _PRIS
            },
        }
        with open(os.path.join(path, "counts.json"), "w") as f:
            json.dump(counts, f)

    root = _scratch_table(sf_dir, "partitioned", build)
    t = os.path.join(root, "t")
    with open(os.path.join(root, "counts.json")) as f:
        counts = json.load(f)

    pieces = []
    for p in _PRIS:
        pruned = txlog.snapshot_partition_pruned(spark, t, {"o_orderpriority": p})
        pieces.append(
            pruned.groupBy(F.col("o_orderpriority").alias("pri")).agg(
                F.count(F.lit(1)).cast("bigint").alias("n_rows"),
                F.round(F.sum("o_totalprice"), 2).alias("sum_total"),
                F.lit(counts["files_opened"][p]).cast("bigint").alias(
                    "files_opened"
                ),
                F.lit(counts["files_total"]).cast("bigint").alias("files_total"),
            )
        )
    out = pieces[0]
    for p in pieces[1:]:
        out = out.unionByName(p)
    return out


# ---------------------------------------------------------------------------
# graph_label_propagation — bounded-round LPA on the residue graph
# ---------------------------------------------------------------------------

_LPA_ROUNDS = 2


def _lpa_sql(rounds: int = _LPA_ROUNDS) -> str:
    # same MATERIALIZED discipline as _kcore_sql: each round reads the
    # previous labels once per edge face, and DuckDB would otherwise
    # inline the md5 edge build exponentially
    base = """
WITH li AS (SELECT CAST(l_orderkey % 400 AS BIGINT) AS ra,
                   CAST(l_partkey % 400 AS BIGINT) AS rb FROM lineitem),
e AS MATERIALIZED (SELECT DISTINCT LEAST(ra, rb) AS a, GREATEST(ra, rb) AS b
      FROM li WHERE ra <> rb
        AND CAST(CONCAT('0x', substr(md5(CONCAT(CAST(LEAST(ra, rb) AS VARCHAR),
            ':', CAST(GREATEST(ra, rb) AS VARCHAR))), 1, 8)) AS BIGINT) % 100 < 8),
sym AS MATERIALIZED (SELECT a, b FROM e UNION ALL SELECT b AS a, a AS b FROM e),
l0 AS MATERIALIZED (SELECT DISTINCT a AS node, a AS label FROM sym)"""
    for r in range(1, rounds + 1):
        base += f""",
v{r} AS (SELECT s.a AS node, x.label, COUNT(*) AS n
         FROM sym s JOIN l{r-1} x ON s.b = x.node GROUP BY 1, 2),
l{r} AS MATERIALIZED (
  SELECT node, label FROM (
    SELECT node, label,
           ROW_NUMBER() OVER (PARTITION BY node ORDER BY n DESC, label) AS rnk
    FROM v{r}) WHERE rnk = 1)"""
    return base + f"\nSELECT node, label FROM l{rounds}"


@register("graph_label_propagation", _lpa_sql())
def graph_label_propagation(spark, sf_dir):
    """Synchronous label propagation (Raghavan et al. 2007) on the
    md5-thinned residue graph, the graph_kcore fixture family: every
    node starts labelled with itself; each round it adopts the most
    frequent label among its NEIGHBORS, ties broken by minimum label
    — the deterministic variant (classic LPA breaks ties randomly,
    which no differential oracle could restate). Both engines run
    EXACTLY 2 rounds — the bounded-round contract graph_kcore
    establishes: at scale you run LPA as checkpointed rounds anyway,
    and each round is one (edge ⋈ labels) shuffle + one per-node
    argmax.

    Shape per round: join edges to the label table on the b-face
    (label table is node-sized — broadcastable at any realistic
    community count), groupBy (node, label) with map-side combine,
    then a per-node row_number argmax. The edge table is
    localCheckpointed once and reused by both rounds (the pagerank
    lineage discipline)."""
    from stockify_spark.registry_ext10 import _kcore_sym_edges

    sym = _kcore_sym_edges(spark, sf_dir)
    labels = sym.select(F.col("a").alias("node")).distinct().withColumn(
        "label", F.col("node")
    )
    w = Window.partitionBy("node").orderBy(F.col("n").desc(), "label")
    for _ in range(_LPA_ROUNDS):
        votes = (
            sym.join(
                labels.withColumnRenamed("node", "b"), "b"
            )
            .groupBy(F.col("a").alias("node"), "label")
            .agg(F.count(F.lit(1)).alias("n"))
        )
        labels = (
            votes.withColumn("rnk", F.row_number().over(w))
            .filter(F.col("rnk") == 1)
            .select("node", "label")
            .localCheckpoint(eager=False)
        )
    return labels
