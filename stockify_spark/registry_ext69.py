"""Round-8 extension wave 58: tokenizer fertility evaluation.

Fertility — tokens emitted per word — is THE fairness metric for a
tokenizer across languages (a BPE trained on English text fragments
other languages into near-characters, inflating their sequence
lengths and training cost). With the merge table learned by
bpe_learn and the encoded vocabulary from tokenizer_bpe_apply's
construction, fertility per language is one join: explode each
document's in-vocabulary words, attach each word's encoded token
count, and aggregate per language — occurrence-weighted, so frequent
words count as often as the model will actually see them.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from stockify_spark.registry import register, _t
from stockify_spark.registry_ext6 import _bpe_ctes

_STEPS = 4

_FERT_SQL = _bpe_ctes(_STEPS) + f""",
enc AS (
  SELECT replace(s, ',', '') AS word,
         len(string_split(substr(s, 2, length(s) - 2), ',,')) AS n_tokens
  FROM s{_STEPS}),
occ AS (
  SELECT lang, w AS word
  FROM (SELECT lang, unnest(string_split(lower(text), ' ')) AS w
        FROM documents)
  WHERE regexp_matches(w, '^[a-z]+$') AND length(w) BETWEEN 2 AND 12)
SELECT occ.lang,
       CAST(COUNT(*) AS BIGINT) AS n_word_occurrences,
       CAST(SUM(enc.n_tokens) AS BIGINT) AS n_tokens,
       ROUND(CAST(SUM(enc.n_tokens) AS DOUBLE) / COUNT(*), 6) AS fertility,
       ROUND(CAST(SUM(length(occ.word)) AS DOUBLE)
             / SUM(enc.n_tokens), 6) AS chars_per_token
FROM occ JOIN enc USING (word)
GROUP BY occ.lang
"""


@register("tokenizer_fertility", _FERT_SQL)
def tokenizer_fertility(spark, sf_dir):
    """Per-language fertility of the 4-merge BPE model:
    occurrence-weighted tokens-per-word and chars-per-token over the
    trainable vocabulary (the word_frequencies filter — same corpus
    the merges were learned on). Identities pinned in
    tests/test_ext69.py: every language's fertility sits in [word
    length bounds / merge floor], and a merge ONLY helps languages
    whose words contain it — with 4 English-corpus-dominated merges,
    en fertility must not exceed the unmerged character baseline.

    Scale shape: the model is driver state (4 merges); the encode is
    the map-only replace chain over the vocabulary; the evaluation
    is one corpus explode + a broadcast join against the encoded
    vocab (vocabulary-sized) + a languages-sized rollup."""
    from stockify_spark.functions.bpe import bpe_learn, word_frequencies

    docs = _t(spark, sf_dir, "documents")
    words = word_frequencies(docs)
    merges = sorted(
        bpe_learn(spark, words, steps=_STEPS).collect(), key=lambda r: r.step
    )
    enc = words.select(
        F.regexp_replace("word", "(.)", ",$1,").alias("s"), "word"
    )
    for m in merges:
        enc = enc.select(
            F.replace(
                F.col("s"),
                F.lit(f",{m.lhs},,{m.rhs},"),
                F.lit(f",{m.lhs}{m.rhs},"),
            ).alias("s"),
            "word",
        )
    enc = enc.select(
        "word",
        F.size(F.split(F.expr("substring(s, 2, length(s)-2)"), ",,")).alias(
            "n_tokens"
        ),
    )
    occ = (
        docs.select(
            "lang", F.explode(F.split(F.lower("text"), " ")).alias("word")
        )
        .filter(
            F.col("word").rlike("^[a-z]+$")
            & F.length("word").between(2, 12)
        )
    )
    return (
        occ.join(F.broadcast(enc), "word")
        .groupBy("lang")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_word_occurrences"),
            F.sum("n_tokens").cast("long").alias("n_tokens"),
            F.round(
                F.sum("n_tokens").cast("double") / F.count(F.lit(1)), 6
            ).alias("fertility"),
            F.round(
                F.sum(F.length("word")).cast("double") / F.sum("n_tokens"), 6
            ).alias("chars_per_token"),
        )
    )
