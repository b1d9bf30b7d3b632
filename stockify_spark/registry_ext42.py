"""Round-8 extension wave 31: repeated-n-gram span coverage.

The span-level duplication measure from the training-data-dedup
literature (Lee et al. 2022, "Deduplicating Training Data Makes
Language Models Better"): a document's duplication is not how many
of its shingles repeat (text_novelty_ratio's census) but how much of
its TOKEN SPAN is covered by the union of cross-document repeated
n-grams — overlapping repeats must not double-count. With fixed
8-token grams the interval union has a closed form: sort the shared
start positions, and each contributes min(8, gap-to-previous-start)
covered tokens. Integer-exact, no sweep state.
"""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F

from stockify_spark.registry import register, _t

_NG = 8

_COV_SQL = f"""
WITH t AS (SELECT doc_id, string_split(text, ' ') AS toks FROM documents),
n AS (SELECT doc_id, len(toks) AS n_tokens, toks FROM t),
g AS (
  SELECT doc_id, i AS s,
         md5(array_to_string(list_slice(toks, i, i + {_NG - 1}), ' ')) AS gh
  FROM (SELECT doc_id, toks, unnest(range(1, len(toks) - {_NG - 2})) AS i
        FROM n WHERE len(toks) >= {_NG})),
sh AS (SELECT gh FROM g GROUP BY gh HAVING COUNT(DISTINCT doc_id) > 1),
si AS (SELECT doc_id, s,
              LAG(s) OVER (PARTITION BY doc_id ORDER BY s) AS prev
       FROM g JOIN sh USING (gh)),
cov AS (SELECT doc_id,
               SUM(CASE WHEN prev IS NULL THEN {_NG}
                        ELSE LEAST({_NG}, s - prev) END) AS covered
        FROM si GROUP BY doc_id)
SELECT n.doc_id, CAST(n.n_tokens AS BIGINT) AS n_tokens,
       CAST(COALESCE(cov.covered, 0) AS BIGINT) AS covered_tokens,
       ROUND(CAST(COALESCE(cov.covered, 0) AS DOUBLE) / n.n_tokens, 6)
         AS dup_frac
FROM n LEFT JOIN cov USING (doc_id)
"""


@register("pipeline_ngram_coverage", _COV_SQL)
def pipeline_ngram_coverage(spark, sf_dir):
    """Per-document fraction of tokens covered by 8-grams that also
    occur in at least one OTHER document (within-document repeats do
    not count — the cross-document condition is a distinct-doc count
    per gram, not an occurrence count). Overlapping shared grams are
    union-merged, not summed: with sorted fixed-length intervals,
    each start adds min(8, distance to the previous start) tokens —
    the closed-form interval union pinned against a brute-force
    position-set reimplementation in tests/test_ext42.py.

    Scale shape: the gram table is a narrow explode (~tokens rows);
    the shared-gram test is one count-distinct shuffle on the md5
    gram key (uniform, skew-free — the dedup-family layout); the
    coverage pass is a per-doc window over only the SHARED positions
    (usually a small fraction); the final left join keeps fully
    novel documents at coverage 0. Nothing is quadratic in corpus
    size — the same banding discipline as dedup_exact/minhash."""
    docs = _t(spark, sf_dir, "documents").select(
        "doc_id", F.split("text", " ").alias("toks")
    )
    n = docs.select("doc_id", F.size("toks").alias("n_tokens"), "toks")
    g = (
        n.filter(F.col("n_tokens") >= _NG)
        .select(
            "doc_id",
            "toks",
            F.explode(
                F.sequence(F.lit(1), F.col("n_tokens") - (_NG - 1))
            ).alias("s"),
        )
        .select(
            "doc_id",
            "s",
            F.md5(F.concat_ws(" ", F.slice("toks", F.col("s"), _NG))).alias(
                "gh"
            ),
        )
    )
    sh = (
        g.groupBy("gh")
        .agg(F.countDistinct("doc_id").alias("nd"))
        .filter(F.col("nd") > 1)
        .select("gh")
    )
    si = g.join(sh, "gh").withColumn(
        "prev", F.lag("s").over(Window.partitionBy("doc_id").orderBy("s"))
    )
    cov = si.groupBy("doc_id").agg(
        F.sum(
            F.when(F.col("prev").isNull(), F.lit(_NG)).otherwise(
                F.least(F.lit(_NG), F.col("s") - F.col("prev"))
            )
        ).alias("covered")
    )
    return (
        n.join(cov, "doc_id", "left")
        .select(
            "doc_id",
            F.col("n_tokens").cast("long").alias("n_tokens"),
            F.coalesce(F.col("covered"), F.lit(0))
            .cast("long")
            .alias("covered_tokens"),
            F.round(
                F.coalesce(F.col("covered"), F.lit(0)).cast("double")
                / F.col("n_tokens"),
                6,
            ).alias("dup_frac"),
        )
    )
