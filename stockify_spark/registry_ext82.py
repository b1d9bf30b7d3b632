"""Round-8 extension wave 71: Cohen's kappa.

Raw accuracy flatters any classifier on skewed labels (predict the
majority class, score the majority share); Cohen's kappa (1960)
corrects for chance agreement: kappa = (po - pe) / (1 - pe), pe =
the agreement two independent raters with these marginals would
reach by luck. Applied to text_langid_eval's matrix it tells the
truth about the stopword heuristic on this corpus: high raw hit
rate on the majority 'en' label, kappa near zero because the
marginals explain nearly all of it. Pure ratios of integer counts.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from stockify_spark.registry import register, _t
from stockify_spark.registry_ext77 import _PRED_SQL

_KAPPA_SQL = f"""
WITH pred AS (
  SELECT lang AS t, {_PRED_SQL} AS p FROM documents),
cm AS (SELECT t, p, CAST(COUNT(*) AS BIGINT) AS k FROM pred GROUP BY 1, 2),
tot AS (SELECT CAST(SUM(k) AS BIGINT) AS n FROM cm),
marg AS (
  SELECT COALESCE(r.lbl, c.lbl) AS lbl,
         COALESCE(r.rk, 0) AS rk, COALESCE(c.ck, 0) AS ck
  FROM (SELECT t AS lbl, SUM(k) AS rk FROM cm GROUP BY 1) r
  FULL OUTER JOIN (SELECT p AS lbl, SUM(k) AS ck FROM cm GROUP BY 1) c
    ON r.lbl = c.lbl),
agree AS (
  SELECT (SELECT CAST(COALESCE(SUM(k), 0) AS BIGINT)
          FROM cm WHERE t = p) AS diag,
         (SELECT SUM(CAST(rk AS DOUBLE) * ck) FROM marg) AS cross_mass,
         tot.n
  FROM tot)
SELECT n,
       ROUND(CAST(diag AS DOUBLE) / n, 6) AS po,
       ROUND(cross_mass / (CAST(n AS DOUBLE) * n), 6) AS pe,
       ROUND((CAST(diag AS DOUBLE) / n - cross_mass / (CAST(n AS DOUBLE) * n))
             / (1 - cross_mass / (CAST(n AS DOUBLE) * n)), 6) AS kappa
FROM agree
"""


@register("stats_cohens_kappa", _KAPPA_SQL)
def stats_cohens_kappa(spark, sf_dir):
    """Chance-corrected agreement between documents.lang and the
    stopword classifier: observed agreement po, expected-by-marginals
    pe, and kappa — all ratios of the confusion matrix's integer
    counts (marginals from a full outer join so labels that appear
    on only one side still contribute their mass). The algebra
    (kappa = 1 on perfect agreement, 0 when agreement equals the
    marginal product, negative when below chance) and the corpus
    truth (po materially above pe only through the majority label;
    kappa far below po) are pinned in tests/test_ext82.py.

    Scale shape: one classifier pass (per-row expression), a
    labels-squared-bounded matrix, label-sized marginals, scalar
    arithmetic."""
    from stockify_spark.functions.text import lang_id

    pred = _t(spark, sf_dir, "documents").select(
        F.col("lang").alias("t"), lang_id("text").alias("p")
    )
    cm = pred.groupBy("t", "p").agg(F.count(F.lit(1)).alias("k"))
    n_df = cm.agg(F.sum("k").cast("long").alias("n"))
    rmarg = cm.groupBy(F.col("t").alias("lbl")).agg(F.sum("k").alias("rk"))
    cmarg = cm.groupBy(F.col("p").alias("lbl")).agg(F.sum("k").alias("ck"))
    marg = rmarg.join(cmarg, "lbl", "full_outer").select(
        F.coalesce("rk", F.lit(0)).alias("rk"),
        F.coalesce("ck", F.lit(0)).alias("ck"),
    )
    cross = marg.agg(
        F.sum(F.col("rk").cast("double") * F.col("ck")).alias("cross_mass")
    )
    diag = cm.filter(F.col("t") == F.col("p")).agg(
        F.coalesce(F.sum("k"), F.lit(0)).cast("long").alias("diag")
    )
    j = n_df.crossJoin(F.broadcast(cross)).crossJoin(F.broadcast(diag))
    po = F.col("diag").cast("double") / F.col("n")
    pe = F.col("cross_mass") / (F.col("n").cast("double") * F.col("n"))
    return j.select(
        "n",
        F.round(po, 6).alias("po"),
        F.round(pe, 6).alias("pe"),
        F.round((po - pe) / (1 - pe), 6).alias("kappa"),
    )
