"""Round-7 wave: batched BPE merge selection (tokenizer-training
scale path) and txlog MERGE upsert.

Each query has an exact DuckDB oracle (driver contract,
__spark_entry__.py). Reference attribution: the reference engine
(stockify.cu) has none of these surfaces; they extend the
training-data-pipeline coverage mandated by SURVEY §2 (LLM ops).
"""

from __future__ import annotations

from pyspark.sql import functions as F

from stockify_spark.functions.bpe import bpe_learn_batched, word_frequencies
from stockify_spark.registry import register, _t

_BPE_ROUNDS, _BPE_BATCH = 3, 8

# Separator for the (pattern, replacement) strings folded by
# list_reduce in the oracle: symbols are [a-z]+ only (word filter),
# so '>' can never occur inside a pattern.
_SEP = ">"


def _bpe_batched_oracle(rounds: int, batch: int) -> str:
    """Chained-CTE reproduction of bpe_learn_batched: per round, rank
    pairs by (count DESC, l, r), keep the conservative independent
    set among the top ``batch`` (NOT EXISTS a higher-ranked top-batch
    pair sharing a symbol), and apply the selected merges as a
    list_reduce replace fold in rank order — the same fold order the
    Spark side chains."""
    sql = """WITH words AS (
  SELECT w AS word, COUNT(*)::BIGINT AS cnt
  FROM (SELECT unnest(string_split(lower(text),' ')) AS w FROM documents)
  WHERE regexp_matches(w, '^[a-z]+$') AND length(w) BETWEEN 2 AND 12
  GROUP BY w
), s0 AS (SELECT regexp_replace(word, '(.)', ',\\1,', 'g') AS s, cnt FROM words)"""
    for i in range(1, rounds + 1):
        sql += f""",
t{i} AS (
  SELECT syms[i] AS l, syms[i+1] AS r, SUM(cnt)::BIGINT AS c
  FROM (SELECT string_split(substr(s, 2, length(s)-2), ',,') AS syms, cnt FROM s{i-1}),
       LATERAL (SELECT unnest(range(1, len(syms))) AS i) u
  GROUP BY 1, 2
),
top{i} AS (
  SELECT l, r, c, ROW_NUMBER() OVER (ORDER BY c DESC, l, r) AS rn
  FROM t{i} QUALIFY rn <= {batch}
),
sel{i} AS (
  SELECT a.l, a.r, a.c, a.rn FROM top{i} a
  WHERE NOT EXISTS (
    SELECT 1 FROM top{i} b
    WHERE b.rn < a.rn AND (b.l IN (a.l, a.r) OR b.r IN (a.l, a.r)))
),
s{i} AS (
  SELECT list_reduce(
           list_prepend(s{i-1}.s, m.ms),
           (acc, x) -> replace(acc, split_part(x, '{_SEP}', 1), split_part(x, '{_SEP}', 2))
         ) AS s, cnt
  FROM s{i-1},
       (SELECT COALESCE(list(',' || l || ',,' || r || ',{_SEP},' || l || r || ',' ORDER BY rn), []) AS ms
        FROM sel{i}) m
)"""
    sel = " UNION ALL ".join(
        f"SELECT {i}::BIGINT AS round, rn::BIGINT AS rn, l AS lhs, r AS rhs, c AS pair_cnt FROM sel{i}"
        for i in range(1, rounds + 1)
    )
    return sql + f"\nSELECT * FROM ({sel}) ORDER BY round, rn"


@register("tokenizer_bpe_batched", _bpe_batched_oracle(_BPE_ROUNDS, _BPE_BATCH))
def tokenizer_bpe_batched(spark, sf_dir):
    """Batched BPE merge learning (functions/bpe.bpe_learn_batched):
    3 rounds x top-8 conservative independent set — one pair-count
    shuffle and ONE bounded driver collect per ROUND instead of per
    merge, the scale path that keeps a 30k-merge vocabulary at ~30k/m
    Spark jobs instead of 30k. Selection rule and fold order are
    reproduced exactly by the chained-CTE oracle; the divergence from
    serial BPE (within-round recount deferral) is documented on the
    function and pinned by tests/test_ext6.py property tests."""
    words = word_frequencies(_t(spark, sf_dir, "documents"))
    return bpe_learn_batched(spark, words, rounds=_BPE_ROUNDS, batch=_BPE_BATCH)


# ---------------------------------------------------------------------------
# txlog_merge — Delta-style MERGE (upsert) through the commit log
# ---------------------------------------------------------------------------

_MERGE_SQL = """
SELECT o_orderkey,
       ROUND(CASE WHEN o_orderkey % 2 = 0 THEN o_totalprice + 1000.0
                  ELSE o_totalprice END, 2) AS o_totalprice
FROM orders
WHERE o_orderkey % 3 <> 0 OR o_orderkey % 2 = 0
"""


@register("txlog_merge", _MERGE_SQL)
def txlog_merge(spark, sf_dir):
    """MERGE upsert through the ACID log (sources/txlog.merge_upsert):
    the table starts as the keys not divisible by 3; the source is
    every even key with price bumped by 1000 — so even keys UPDATE
    (or INSERT if divisible by 6) and odd non-%3 keys pass through
    untouched. Touched-file discovery is one provenance-column
    semi-join; only files containing matched keys are rewritten. The
    oracle states the merged end state declaratively over the source
    table, so the whole upsert path (COW rewrite + source append +
    commit replay) is hash-checked. Scratch table deterministic per
    sf_dir (same reuse policy as the lifecycle table)."""
    from stockify_spark.registry_ext7 import _scratch_table
    from stockify_spark.sources import txlog

    def build(path: str) -> None:
        o = _t(spark, sf_dir, "orders").select("o_orderkey", "o_totalprice")
        txlog.create(
            o.filter(F.col("o_orderkey") % 3 != 0).repartitionByRange(4, "o_orderkey"),
            path,
        )
        src = o.filter(F.col("o_orderkey") % 2 == 0).select(
            "o_orderkey", (F.col("o_totalprice") + 1000.0).alias("o_totalprice")
        )
        txlog.merge_upsert(spark, path, src, ["o_orderkey"])

    path = _scratch_table(sf_dir, "merge", build)
    snap = txlog.snapshot(spark, path)
    return snap.select(
        "o_orderkey", F.round("o_totalprice", 2).alias("o_totalprice")
    )
