"""Round-13 extension wave 100: scoring-model evaluation + heavy
tails + centroid classification.

WOE/IV binning (the credit-scorecard / feature-selection standard),
AUC via the Mann-Whitney rank identity (with Gini = 2·AUC − 1 — the
ranking half of model evaluation next to ml_calibration_ece's
probability half), the Hill estimator of a power-law tail exponent
(the degree-distribution diagnostic behind every skew-policy
decision in this repo), and a nearest-centroid (Rocchio) classifier
over the labelled embeddings.
"""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F

from stockify_spark.registry import register, _t

# ---------------------------------------------------------------------------
# orders_credit_scorecard — WOE / information value by price decile
# ---------------------------------------------------------------------------

_WOE_SQL = """
WITH d AS (
  SELECT CASE WHEN o_orderstatus = 'F' THEN 1 ELSE 0 END AS bad,
         o_totalprice AS x
  FROM orders),
rk AS (SELECT bad, x, NTILE(10) OVER (ORDER BY x, bad) AS bucket FROM d),
b AS (SELECT bucket,
             CAST(COUNT(*) AS DOUBLE) AS n,
             CAST(SUM(bad) AS DOUBLE) AS nbad,
             CAST(COUNT(*) - SUM(bad) AS DOUBLE) AS ngood
      FROM rk GROUP BY bucket),
t AS (SELECT SUM(nbad) AS tbad, SUM(ngood) AS tgood FROM b)
SELECT bucket,
       CAST(n AS BIGINT) AS n,
       ROUND(nbad / tbad, 6) AS pct_bad,
       ROUND(ngood / tgood, 6) AS pct_good,
       ROUND(ln((ngood / tgood) / (nbad / tbad)), 6) AS woe,
       ROUND(SUM((ngood / tgood - nbad / tbad)
                 * ln((ngood / tgood) / (nbad / tbad))) OVER (), 6) AS iv
FROM b CROSS JOIN t
"""


@register("orders_credit_scorecard", _WOE_SQL)
def orders_credit_scorecard(spark, sf_dir, _debug: dict | None = None):
    """Weight-of-evidence scorecard binning of total price against
    the F-status "bad" flag: 10 equal-count buckets (NTILE with the
    deterministic (x, bad) tie-break so both engines cut identical
    bins), per-bucket WOE = ln(%good/%bad), and the feature's
    information value IV = Σ(%good − %bad)·WOE — the credit-risk /
    feature-screening standard (IV < 0.02 useless, > 0.3 strong).
    Counts are exact integers; only the ratios round.

    Shape (r14 rewrite, operators/ranks.py): NO full-table NTILE
    window. Every (x, bad) group is homogeneous in the label, so
    NTILE's per-bucket counts depend only on which global positions
    a group's rows occupy — minrank..cum from the distinct-value
    prefix-sum — intersected with the 10 bucket fences (exact
    ⌈n/10⌉/⌊n/10⌋ spans from the one-row total). One parallel
    groupBy over the fact, a |distinct|-row prefix-sum, a
    broadcast-10-row interval-overlap join; identical counts to the
    NTILE form (ties split across fences contribute the same label
    either way), hash-equal to the unchanged oracle."""
    from stockify_spark.operators.ranks import (
        distinct_value_ranks,
        ntile_bucket_bounds,
    )

    d = _t(spark, sf_dir, "orders").select(
        F.when(F.col("o_orderstatus") == "F", 1).otherwise(0).alias("bad"),
        F.col("o_totalprice").alias("x"),
    )
    g = distinct_value_ranks(
        d.select(F.struct(F.col("x"), F.col("bad")).alias("k")), "k"
    )
    if _debug is not None:
        _debug["rank_frame"] = g
    fences = ntile_bucket_bounds(
        spark, d.agg(F.count(F.lit(1)).cast("long").alias("n_total")), 10
    )
    take = (
        F.least(F.col("cum"), F.col("b_end"))
        - F.greatest(F.col("minrank"), F.col("b_start"))
        + 1
    )
    ov = g.join(
        F.broadcast(fences),
        (F.col("minrank") <= F.col("b_end"))
        & (F.col("cum") >= F.col("b_start")),
    ).select("bucket", F.col("k.bad").alias("bad"), take.alias("take"))
    b = ov.groupBy("bucket").agg(
        F.sum("take").cast("double").alias("n"),
        F.sum(F.col("take") * F.col("bad")).cast("double").alias("nbad"),
        (F.sum("take") - F.sum(F.col("take") * F.col("bad")))
        .cast("double")
        .alias("ngood"),
    )
    t = b.agg(F.sum("nbad").alias("tbad"), F.sum("ngood").alias("tgood"))
    pg = F.col("ngood") / F.col("tgood")
    pb = F.col("nbad") / F.col("tbad")
    woe = F.log(pg / pb)
    scored = b.crossJoin(F.broadcast(t))
    return scored.select(
        "bucket",
        F.col("n").cast("bigint").alias("n"),
        F.round(pb, 6).alias("pct_bad"),
        F.round(pg, 6).alias("pct_good"),
        F.round(woe, 6).alias("woe"),
        F.round(
            F.sum((pg - pb) * woe).over(
                Window.rowsBetween(
                    Window.unboundedPreceding, Window.unboundedFollowing
                )
            ),
            6,
        ).alias("iv"),
    )


# ---------------------------------------------------------------------------
# stats_gini_auc — AUC by the Mann-Whitney rank identity
# ---------------------------------------------------------------------------

_AUC_SQL = """
WITH m AS (SELECT AVG(o_totalprice) AS mu, STDDEV_POP(o_totalprice) AS sd
           FROM orders),
p AS (SELECT CASE WHEN o_orderstatus = 'F' THEN 1 ELSE 0 END AS y,
             ROUND((o_totalprice - mu) / sd, 6) AS score
      FROM orders CROSS JOIN m),
r AS (SELECT y, RANK() OVER (ORDER BY score) AS rnk,
             COUNT(*) OVER (PARTITION BY score) AS ties
      FROM p),
s AS (SELECT CAST(SUM(CASE WHEN y = 1 THEN rnk + (ties - 1) / 2.0 END)
               AS DOUBLE) AS rsum,
             CAST(SUM(y) AS DOUBLE) AS n1,
             CAST(COUNT(*) - SUM(y) AS DOUBLE) AS n0
      FROM r)
SELECT CAST(n1 AS BIGINT) AS n_pos, CAST(n0 AS BIGINT) AS n_neg,
       ROUND((rsum - n1 * (n1 + 1) / 2) / (n1 * n0), 6) AS auc,
       ROUND(2 * ((rsum - n1 * (n1 + 1) / 2) / (n1 * n0)) - 1, 6) AS gini
FROM s
"""


@register("stats_gini_auc", _AUC_SQL)
def stats_gini_auc(spark, sf_dir, _debug: dict | None = None):
    """ROC AUC of the z-scored price against the F-status label via
    the Mann-Whitney identity AUC = (R₁ − n₁(n₁+1)/2)/(n₁n₀) with
    MIDRANKS for ties (RANK + (ties−1)/2 — the tie treatment that
    makes rank-AUC equal trapezoidal ROC area exactly), plus
    Gini = 2·AUC − 1, the scorecard industry's headline number. The
    score is 6dp-quantized first so both engines rank identical
    values (the quantize-then-derive rule). Complements
    ml_confusion_metrics (one threshold) and ml_calibration_ece
    (probability quality): AUC is the threshold-FREE ranking metric.

    Shape (r14 rewrite, operators/ranks.py): NO full-table rank.
    R₁ = Σ_values npos(v)·midrank(v), so one parallel
    groupBy(score) carries the fact; the only single-partition
    stage is the prefix-sum over the distinct 6dp-score table
    (≤ 2M rows regardless of fact size). All sums are exact
    half-integers in double, so the result is hash-equal to the
    per-row rank form and the unchanged DuckDB oracle."""
    from stockify_spark.operators.ranks import distinct_value_ranks

    o = _t(spark, sf_dir, "orders")
    m = o.agg(
        F.avg("o_totalprice").alias("mu"),
        F.stddev_pop("o_totalprice").alias("sd"),
    )
    p = o.crossJoin(F.broadcast(m)).select(
        F.when(F.col("o_orderstatus") == "F", 1).otherwise(0).alias("y"),
        F.round((F.col("o_totalprice") - F.col("mu")) / F.col("sd"), 6).alias(
            "score"
        ),
    )
    g = distinct_value_ranks(
        p, "score", {"npos": F.sum("y").cast("long")}
    )
    if _debug is not None:
        _debug["rank_frame"] = g
    s = g.agg(
        F.sum(F.col("npos") * F.col("midrank")).cast("double").alias("rsum"),
        F.sum("npos").cast("double").alias("n1"),
        F.sum(F.col("cnt") - F.col("npos")).cast("double").alias("n0"),
    )
    auc = (F.col("rsum") - F.col("n1") * (F.col("n1") + 1) / 2) / (
        F.col("n1") * F.col("n0")
    )
    return s.select(
        F.col("n1").cast("bigint").alias("n_pos"),
        F.col("n0").cast("bigint").alias("n_neg"),
        F.round(auc, 6).alias("auc"),
        F.round(2 * auc - 1, 6).alias("gini"),
    )


# ---------------------------------------------------------------------------
# events_power_law_hill — Hill estimator of the activity tail
# ---------------------------------------------------------------------------

_HILL_K = 30

_HILL_SQL = f"""
WITH k AS (SELECT user_id, CAST(COUNT(*) AS DOUBLE) AS activity
           FROM events GROUP BY user_id),
top AS (SELECT activity,
               ROW_NUMBER() OVER (ORDER BY activity DESC, user_id) AS rnk
        FROM k),
kth AS (SELECT activity AS xk FROM top WHERE rnk = {_HILL_K} + 1),
s AS (SELECT CAST(COUNT(*) AS BIGINT) AS k_used,
             SUM(ln(t.activity / kth.xk)) AS logsum,
             MAX(kth.xk) AS xk
      FROM top t CROSS JOIN kth
      WHERE t.rnk <= {_HILL_K})
SELECT k_used, ROUND(xk, 6) AS x_k,
       ROUND(k_used / logsum, 6) AS hill_alpha,
       ROUND(1 + k_used / logsum, 6) AS pareto_exponent
FROM s
"""


@register("events_power_law_hill", _HILL_SQL)
def events_power_law_hill(spark, sf_dir):
    """Hill estimator (Hill 1975) of the per-user activity tail:
    α̂ = k / Σᵢ ln(x₍ᵢ₎/x₍ₖ₊₁₎) over the k=30 largest order
    statistics — the standard tail-index tool for the power-law
    degree/activity distributions that drive every skew decision in
    this repo (DESIGN.md's skew-safe frequency-count policy exists
    BECAUSE these tails are heavy; this query measures how heavy).
    Reported with the Pareto tail exponent 1 + α̂ (the text_zipf_fit
    complement on the behavioral side).

    Shape: one per-user count shuffle, a top-(k+1) TakeOrdered over
    the user-sized table, a scalar log fold — the full table is
    never sorted."""
    k = _t(spark, sf_dir, "events").groupBy("user_id").agg(
        F.count(F.lit(1)).cast("double").alias("activity")
    )
    top = k.withColumn(
        "rnk",
        F.row_number().over(Window.orderBy(F.col("activity").desc(), "user_id")),
    ).filter(F.col("rnk") <= _HILL_K + 1)
    kth = top.filter(F.col("rnk") == _HILL_K + 1).select(
        F.col("activity").alias("xk")
    )
    s = (
        top.filter(F.col("rnk") <= _HILL_K)
        .crossJoin(F.broadcast(kth))
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("k_used"),
            F.sum(F.log(F.col("activity") / F.col("xk"))).alias("logsum"),
            F.max("xk").alias("xk"),
        )
    )
    return s.select(
        "k_used",
        F.round("xk", 6).alias("x_k"),
        F.round(F.col("k_used") / F.col("logsum"), 6).alias("hill_alpha"),
        F.round(1 + F.col("k_used") / F.col("logsum"), 6).alias(
            "pareto_exponent"
        ),
    )


# ---------------------------------------------------------------------------
# ml_nearest_centroid — Rocchio classification over the embeddings
# ---------------------------------------------------------------------------

_NC_SQL = """
WITH dims AS (SELECT unnest(range(1, 65)) AS i),
comp AS (
  SELECT label, i, AVG(embedding[i] :: DOUBLE) AS c
  FROM embeddings CROSS JOIN dims
  GROUP BY label, i),
cent AS (SELECT label AS clabel, list(c ORDER BY i) AS cv FROM comp GROUP BY label),
scored AS (
  SELECT e.vec_id, e.label AS truth, c.clabel,
         list_dot_product(e.embedding :: DOUBLE[], c.cv)
           / sqrt(list_dot_product(c.cv, c.cv)) AS score
  FROM embeddings e CROSS JOIN cent c),
best AS (
  SELECT vec_id, truth, clabel,
         ROW_NUMBER() OVER (PARTITION BY vec_id
                            ORDER BY ROUND(score, 6) DESC, clabel) AS rnk
  FROM scored)
SELECT truth AS label, clabel AS predicted,
       CAST(COUNT(*) AS BIGINT) AS n
FROM best WHERE rnk = 1
GROUP BY truth, clabel
"""


@register("ml_nearest_centroid", _NC_SQL)
def ml_nearest_centroid(spark, sf_dir):
    """Nearest-centroid (Rocchio) classification of the labelled
    embeddings: per-label mean vector, every vector assigned to the
    centroid maximizing the norm-adjusted inner product x·c/|c|
    (equivalent to nearest centroid in Euclidean distance up to the
    |x|² term, which is constant per row), reported as the confusion
    matrix. Ranking is on the 6dp-ROUNDED score with label
    tie-break (quantized-winner rule); centroid components are plain
    AVG aggregates so both engines build them from identical member
    sets.

    Shape: centroids are one per-(label, dim) aggregate —
    labels × 64 doubles, broadcast; classification is a map-side
    pass over the corpus crossed with the tiny centroid table; the
    confusion matrix is a labels²-bounded aggregate. The 100 TB form
    is identical: centroids are kilobytes no matter the corpus."""
    emb = _t(spark, sf_dir, "embeddings")
    comp = (
        emb.select(
            "label", F.posexplode("embedding").alias("i0", "v")
        )
        .groupBy("label", "i0")
        .agg(F.avg(F.col("v").cast("double")).alias("c"))
    )
    cent = (
        comp.groupBy(F.col("label").alias("clabel"))
        .agg(
            F.array_sort(
                F.collect_list(F.struct(F.col("i0"), F.col("c")))
            ).alias("pairs")
        )
        .select(
            "clabel",
            F.transform(F.col("pairs"), lambda p: p["c"]).alias("cv"),
        )
    )
    from stockify_spark.llm.similarity import dot

    scored = emb.crossJoin(F.broadcast(cent)).select(
        "vec_id",
        F.col("label").alias("truth"),
        "clabel",
        (dot("embedding", "cv") / F.sqrt(dot("cv", "cv"))).alias("score"),
    )
    best = scored.withColumn(
        "rnk",
        F.row_number().over(
            Window.partitionBy("vec_id").orderBy(
                F.round("score", 6).desc(), "clabel"
            )
        ),
    ).filter(F.col("rnk") == 1)
    return best.groupBy(
        F.col("truth").alias("label"), F.col("clabel").alias("predicted")
    ).agg(F.count(F.lit(1)).cast("bigint").alias("n"))
