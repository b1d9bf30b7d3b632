"""Round-8 extension wave 66: language-ID evaluation.

lang_detect ships the classifier; a curation pipeline also needs its
EVALUATION against labeled data — the confusion matrix with per-cell
marginals, which is where a stopword heuristic's failure modes
become visible (the fixture's 'zh' documents have no profile at all
and must land in 'unknown' or a false positive, never silently
vanish). Every cell carries its row recall (n / true-language total)
and column precision (n / predicted-language total), so the matrix
IS the eval report.
"""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F

from stockify_spark.registry import register, _t
from stockify_spark.registry_ext import _LANG_COUNT

_PRED_SQL = f"""CASE
 WHEN {_LANG_COUNT['de']} > GREATEST({_LANG_COUNT['en']}, {_LANG_COUNT['es']}, {_LANG_COUNT['fr']}) THEN 'de'
 WHEN {_LANG_COUNT['fr']} > GREATEST({_LANG_COUNT['en']}, {_LANG_COUNT['es']}) THEN 'fr'
 WHEN {_LANG_COUNT['es']} > {_LANG_COUNT['en']} THEN 'es'
 WHEN {_LANG_COUNT['en']} > 0 THEN 'en'
 ELSE 'unknown' END"""

_EVAL_SQL = f"""
WITH pred AS (
  SELECT lang AS true_lang, {_PRED_SQL} AS predicted FROM documents),
cm AS (
  SELECT true_lang, predicted, CAST(COUNT(*) AS BIGINT) AS n
  FROM pred GROUP BY 1, 2)
SELECT true_lang, predicted, n,
       ROUND(CAST(n AS DOUBLE)
             / SUM(n) OVER (PARTITION BY true_lang), 6) AS row_recall,
       ROUND(CAST(n AS DOUBLE)
             / SUM(n) OVER (PARTITION BY predicted), 6) AS col_precision
FROM cm
"""


@register("text_langid_eval", _EVAL_SQL)
def text_langid_eval(spark, sf_dir):
    """Confusion matrix of lang_detect's stopword argmax against the
    documents.lang labels, each cell annotated with its row recall
    and column precision. Marginal identities (recalls per true
    language sum to 1, precisions per predicted language sum to 1)
    and the no-profile honesty property ('zh' has zero correct
    predictions because no zh profile exists — the eval must say so,
    not hide it) are pinned in tests/test_ext77.py.

    Scale shape: the classifier is the per-row expression lang_id
    compiles to (one tokenizer bind, profile-count filters); the
    matrix is a languages-squared-bounded aggregate with two window
    marginals over <= 25 cells."""
    from stockify_spark.functions.text import lang_id

    pred = _t(spark, sf_dir, "documents").select(
        F.col("lang").alias("true_lang"),
        lang_id("text").alias("predicted"),
    )
    cm = pred.groupBy("true_lang", "predicted").agg(
        F.count(F.lit(1)).cast("long").alias("n")
    )
    wr = Window.partitionBy("true_lang")
    wc = Window.partitionBy("predicted")
    return cm.select(
        "true_lang",
        "predicted",
        "n",
        F.round(F.col("n").cast("double") / F.sum("n").over(wr), 6).alias(
            "row_recall"
        ),
        F.round(F.col("n").cast("double") / F.sum("n").over(wc), 6).alias(
            "col_precision"
        ),
    )
