"""Round-8 extension wave 68: the dataset card.

Every curated corpus ships with a datasheet (Gebru et al. 2021,
"Datasheets for Datasets"); the machine-readable core is a one-row
summary a pipeline can diff between releases: scale (documents,
tokens, vocabulary), duplication (exact-dup rate under the
dedup_exact fingerprint), provenance spread (source count, language
label entropy), and shape (mean/max document length). One query,
assembled from two passes over the corpus — the release-gating
artifact the rest of the pipeline family feeds.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from stockify_spark.registry import register, _t

_CARD_SQL = """
WITH norm AS (
  SELECT doc_id, lang, source,
         md5(regexp_replace(trim(lower(text)), '\\s+', ' ', 'g')) AS fp,
         string_split(lower(text), ' ') AS toks
  FROM documents),
docstats AS (
  SELECT CAST(COUNT(*) AS BIGINT) AS n_docs,
         CAST(COUNT(DISTINCT fp) AS BIGINT) AS n_unique,
         CAST(COUNT(DISTINCT source) AS BIGINT) AS n_sources,
         CAST(SUM(len(toks)) AS BIGINT) AS n_tokens,
         CAST(MAX(len(toks)) AS BIGINT) AS max_doc_tokens
  FROM norm),
vocab AS (
  SELECT CAST(COUNT(DISTINCT w) AS BIGINT) AS vocab_size
  FROM (SELECT unnest(toks) AS w FROM norm)),
langH AS (
  SELECT ROUND(SUM(-(CAST(k AS DOUBLE) / n) * log2(CAST(k AS DOUBLE) / n)),
               6) AS lang_entropy
  FROM (SELECT lang, COUNT(*) AS k, SUM(COUNT(*)) OVER () AS n
        FROM norm GROUP BY 1))
SELECT d.n_docs, d.n_tokens, v.vocab_size, d.n_sources,
       ROUND(CAST(d.n_tokens AS DOUBLE) / d.n_docs, 6) AS mean_doc_tokens,
       d.max_doc_tokens,
       ROUND(1 - CAST(d.n_unique AS DOUBLE) / d.n_docs, 6) AS exact_dup_rate,
       l.lang_entropy
FROM docstats d CROSS JOIN vocab v CROSS JOIN langH l
"""


@register("pipeline_dataset_card", _CARD_SQL)
def pipeline_dataset_card(spark, sf_dir):
    """One-row machine-readable dataset card: document/token/
    vocabulary counts, source spread, language-label entropy
    (bits), mean/max document length, and the exact-duplicate rate
    under the dedup_exact normalization (lower, trim, whitespace
    collapse, md5). Field identities — dup rate consistent with
    dedup_exact's cluster census, entropy bounded by log2(#langs),
    token totals consistent with the raw split — are pinned in
    tests/test_ext79.py.

    Scale shape: three aggregates over the normalized frame — the
    plan re-expands the cheap per-row normalization per branch
    (3 corpus scans; a grouping-sets/observe fusion would cut it to
    one, at the cost of entangling the three contracts), and each
    branch is map-side combinable; vocabulary is the one big
    distinct, the same shuffle text_heaps_law pays. Diffing
    two releases' cards is the cheapest regression gate a 100 TB
    corpus refresh can run."""
    norm = _t(spark, sf_dir, "documents").select(
        "doc_id",
        "lang",
        "source",
        F.md5(
            F.regexp_replace(F.trim(F.lower("text")), r"\s+", " ")
        ).alias("fp"),
        F.split(F.lower("text"), " ").alias("toks"),
    )
    docstats = norm.agg(
        F.count(F.lit(1)).cast("long").alias("n_docs"),
        F.countDistinct("fp").cast("long").alias("n_unique"),
        F.countDistinct("source").cast("long").alias("n_sources"),
        F.sum(F.size("toks")).cast("long").alias("n_tokens"),
        F.max(F.size("toks")).cast("long").alias("max_doc_tokens"),
    )
    vocab = (
        norm.select(F.explode("toks").alias("w"))
        .agg(F.countDistinct("w").cast("long").alias("vocab_size"))
    )
    lk = norm.groupBy("lang").agg(F.count(F.lit(1)).alias("k"))
    lang_h = (
        lk.crossJoin(F.broadcast(lk.agg(F.sum("k").alias("n"))))
        .agg(
            F.round(
                F.sum(
                    -(F.col("k").cast("double") / F.col("n"))
                    * F.log2(F.col("k").cast("double") / F.col("n"))
                ),
                6,
            ).alias("lang_entropy")
        )
    )
    return (
        docstats.crossJoin(F.broadcast(vocab))
        .crossJoin(F.broadcast(lang_h))
        .select(
            "n_docs",
            "n_tokens",
            "vocab_size",
            "n_sources",
            F.round(
                F.col("n_tokens").cast("double") / F.col("n_docs"), 6
            ).alias("mean_doc_tokens"),
            "max_doc_tokens",
            F.round(
                1 - F.col("n_unique").cast("double") / F.col("n_docs"), 6
            ).alias("exact_dup_rate"),
            "lang_entropy",
        )
    )
