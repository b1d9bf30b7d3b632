"""Round-7 wave: batched BPE merge selection (tokenizer-training
scale path).

Each query has an exact DuckDB oracle (driver contract,
__spark_entry__.py). Reference attribution: the reference engine
(stockify.cu) has none of these surfaces; they extend the
training-data-pipeline coverage mandated by SURVEY §2 (LLM ops).
"""

from __future__ import annotations

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
