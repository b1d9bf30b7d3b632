"""Round-8 extension wave 72: token-budget data selection.

The last step of every curation pipeline: given a training-token
budget, WHICH documents make the cut? Greedy selection by
value-per-token is the fractional-knapsack argument (Dantzig 1957):
optimal for the fractional relaxation, within one document of
optimal whenever documents are small against the budget — which at
corpus scale they always are. Value here is lexical diversity (the
text_mattr family's TTR), cost is token count; the selection is an
explicit-rank prefix: sort by density, admit while the running token
total fits.
"""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F

from stockify_spark.registry import register, _t

_BUDGET = 10_000  # tokens

_SEL_SQL = f"""
WITH d AS (
  SELECT doc_id, len(string_split(lower(text), ' ')) AS n_tokens,
         ROUND(CAST(len(list_distinct(string_split(lower(text), ' ')))
                    AS DOUBLE)
               / len(string_split(lower(text), ' ')), 6) AS ttr
  FROM documents),
r AS (
  SELECT doc_id, n_tokens, ttr,
         SUM(n_tokens) OVER (ORDER BY ttr DESC, doc_id) AS cum_tokens
  FROM d)
SELECT doc_id, CAST(n_tokens AS BIGINT) AS n_tokens, ttr,
       CAST(cum_tokens AS BIGINT) AS cum_tokens
FROM r WHERE cum_tokens <= {_BUDGET}
"""


@register("pipeline_budget_select", _SEL_SQL)
def pipeline_budget_select(spark, sf_dir):
    """Greedy 10k-token selection by TTR density (desc, doc_id
    tie-break): one prefix sum in selection order, admit while the
    running total fits. Budget feasibility, the density invariant
    (every admitted document's TTR >= every rejected one's, up to
    the tie-break), and greedy dominance over random same-budget
    selections are pinned in tests/test_ext83.py.

    Scale shape: doc stats are per-row expressions; the ranked
    prefix sum over the doc table is the one global-order window
    (the pipeline_token_pack parity convention; its two-phase
    distributed twin swaps in unchanged). The admitted set streams
    straight into the chunkers — this operator IS the gate between
    the scored corpus and the training run."""
    d = _t(spark, sf_dir, "documents").select(
        "doc_id", F.split(F.lower("text"), " ").alias("toks")
    ).select(
        "doc_id",
        F.size("toks").alias("n_tokens"),
        F.round(
            F.size(F.array_distinct("toks")).cast("double")
            / F.size("toks"),
            6,
        ).alias("ttr"),
    )
    w = Window.orderBy(F.col("ttr").desc(), "doc_id")
    r = d.withColumn("cum_tokens", F.sum("n_tokens").over(w))
    return r.filter(F.col("cum_tokens") <= _BUDGET).select(
        "doc_id",
        F.col("n_tokens").cast("long").alias("n_tokens"),
        "ttr",
        F.col("cum_tokens").cast("long").alias("cum_tokens"),
    )
