"""Round-8 extension wave 32: BPE encoding (tokenizer APPLY).

tokenizer_bpe_merges / tokenizer_bpe_batched learn the merge table;
this is the other half of a tokenizer — ENCODING the vocabulary with
the learned merges. Training is K shuffles + K bounded collects;
encoding is embarrassingly parallel: the merge table is driver model
state (K rows), and applying it is a chain of K literal replaces
over the comma-fenced symbol encoding (functions/bpe.py module
docstring) — one fused map stage, no shuffle at all. That asymmetry
(train once centrally, encode anywhere at 100 TB in map-only form)
is the reason production tokenizers ship as merge lists.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from stockify_spark.functions.bpe import bpe_learn, word_frequencies
from stockify_spark.registry import register, _t
from stockify_spark.registry_ext6 import _bpe_ctes

_STEPS = 4

_APPLY_SQL = _bpe_ctes(_STEPS) + f"""
SELECT replace(s, ',', '') AS word, cnt,
       array_to_string(string_split(substr(s, 2, length(s) - 2), ',,'), ' ')
         AS tokens,
       len(string_split(substr(s, 2, length(s) - 2), ',,'))::BIGINT
         AS n_tokens
FROM s{_STEPS}
"""


@register("tokenizer_bpe_apply", _APPLY_SQL)
def tokenizer_bpe_apply(spark, sf_dir):
    """Encode the corpus vocabulary with the 4 learned BPE merges:
    learn the merge table (bpe_learn — the serial-exact trainer),
    collect it as model state, and apply the merges IN LEARNED ORDER
    as literal replaces over the fenced symbol string; emit (word,
    cnt, tokens, n_tokens). The left-to-right non-overlapping
    replace on the fenced encoding reproduces serial BPE encoding
    exactly, and the oracle proves it end-to-end: DuckDB re-learns
    the same merges in chained CTEs and reads the same final symbol
    state. Merge-order dependence (applying merges out of order
    changes the encoding) is pinned in tests/test_ext43.py.

    Scale shape: training cost is vocabulary-sized (see bpe_learn);
    the encode pass is ONE narrow map over the vocabulary — at
    100 TB you encode the corpus, not the vocabulary, with the same
    replace chain applied per document, still map-only."""
    words = word_frequencies(_t(spark, sf_dir, "documents"))
    merges = sorted(
        bpe_learn(spark, words, steps=_STEPS).collect(),
        key=lambda r: r.step,
    )
    enc = words.select(
        F.regexp_replace("word", "(.)", ",$1,").alias("s"), "cnt"
    )
    for m in merges:
        enc = enc.select(
            F.replace(
                F.col("s"),
                F.lit(f",{m.lhs},,{m.rhs},"),
                F.lit(f",{m.lhs}{m.rhs},"),
            ).alias("s"),
            "cnt",
        )
    syms = F.split(F.expr("substring(s, 2, length(s)-2)"), ",,")
    return enc.select(
        F.replace(F.col("s"), F.lit(","), F.lit("")).alias("word"),
        "cnt",
        F.array_join(syms, " ").alias("tokens"),
        F.size(syms).cast("long").alias("n_tokens"),
    )
