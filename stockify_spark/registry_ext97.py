"""Round-13 extension wave 97: agreement statistics, errors-in-
variables regression, Fisher LDA, McNemar, and Matryoshka two-stage
ANN.

The measurement-science corner (Lin's concordance, Deming
regression, McNemar's paired test) that method-comparison and
model-comparison pipelines run, a second closed-form classifier
next to ml_logreg_newton (Fisher's discriminant with the pooled
2×2 inverse), and the truncated-dimension retrieval pattern
(Matryoshka representation learning: coarse rank on an embedding
PREFIX, exact rerank of the shortlist) that modern embedding stacks
use to cut first-stage FLOPs ~8×.
"""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F

from stockify_spark.registry import register, _t

# ---------------------------------------------------------------------------
# stats_lin_ccc — Lin's concordance correlation (repeatability)
# ---------------------------------------------------------------------------

_CCC_SQL = """
WITH p AS (
  SELECT value AS x, LAG(value) OVER w AS y
  FROM events
  WINDOW w AS (PARTITION BY user_id ORDER BY epoch_ms(ts), event_id)),
s AS (SELECT CAST(COUNT(*) AS BIGINT) AS n,
             AVG(x) AS mx, AVG(y) AS my,
             VAR_POP(x) AS sxx, VAR_POP(y) AS syy, COVAR_POP(x, y) AS sxy
      FROM p WHERE y IS NOT NULL)
SELECT n,
       ROUND(2 * sxy / (sxx + syy + (mx - my) * (mx - my)), 6) AS ccc,
       ROUND(sxy / sqrt(sxx * syy), 6) AS pearson_r,
       ROUND((2 * sxy / (sxx + syy + (mx - my) * (mx - my)))
             / (sxy / sqrt(sxx * syy)), 6) AS c_b
FROM s
"""


@register("stats_lin_ccc", _CCC_SQL)
def stats_lin_ccc(spark, sf_dir):
    """Lin's concordance correlation coefficient (Lin 1989) between
    consecutive measurements of the same user series — the
    repeatability/agreement statistic: CCC = 2·s_xy /
    (s_xx + s_yy + (x̄-ȳ)²), which penalizes both scatter (like
    Pearson) AND location/scale shift (unlike Pearson; the ratio
    c_b = CCC/r isolates that bias term). Method-comparison
    pipelines report exactly this trio.

    Shape: one windowed lag (one shuffle on the series key), one
    global moment aggregate — scalar arithmetic after that; the
    moment sums are rounded at 6dp per the float policy."""
    t = _t(spark, sf_dir, "events").select(
        "event_id", "user_id", "value", F.unix_millis("ts").alias("ms")
    )
    w = Window.partitionBy("user_id").orderBy("ms", "event_id")
    p = t.select(
        F.col("value").alias("x"), F.lag("value").over(w).alias("y")
    ).filter(F.col("y").isNotNull())
    s = p.agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.avg("x").alias("mx"),
        F.avg("y").alias("my"),
        F.var_pop("x").alias("sxx"),
        F.var_pop("y").alias("syy"),
        F.covar_pop("x", "y").alias("sxy"),
    )
    ccc = 2 * F.col("sxy") / (
        F.col("sxx")
        + F.col("syy")
        + (F.col("mx") - F.col("my")) * (F.col("mx") - F.col("my"))
    )
    r = F.col("sxy") / F.sqrt(F.col("sxx") * F.col("syy"))
    return s.select(
        "n",
        F.round(ccc, 6).alias("ccc"),
        F.round(r, 6).alias("pearson_r"),
        F.round(ccc / r, 6).alias("c_b"),
    )


# ---------------------------------------------------------------------------
# stats_deming_regression — errors-in-variables fit (λ = 1)
# ---------------------------------------------------------------------------

_DEMING_SQL = """
WITH pair AS (
  SELECT c_acctbal AS x, AVG(o_totalprice) AS y
  FROM customer JOIN orders ON o_custkey = c_custkey
  GROUP BY c_custkey, c_acctbal),
s AS (SELECT CAST(COUNT(*) AS BIGINT) AS n, AVG(x) AS mx, AVG(y) AS my,
             VAR_POP(x) AS sxx, VAR_POP(y) AS syy, COVAR_POP(x, y) AS sxy
      FROM pair)
SELECT n,
       ROUND((syy - sxx + sqrt((syy - sxx) * (syy - sxx) + 4 * sxy * sxy))
             / (2 * sxy), 6) AS slope,
       ROUND(my - ((syy - sxx + sqrt((syy - sxx) * (syy - sxx) + 4 * sxy * sxy))
             / (2 * sxy)) * mx, 2) AS intercept
FROM s
"""


@register("stats_deming_regression", _DEMING_SQL)
def stats_deming_regression(spark, sf_dir):
    """Deming regression (λ=1) of mean order value on account
    balance — the errors-in-variables fit for when BOTH axes are
    noisy measurements of the same latent quantity (customer size),
    where OLS is attenuation-biased toward zero. Closed form:
    b = (s_yy − s_xx + √((s_yy − s_xx)² + 4 s_xy²)) / (2 s_xy); the
    orthogonal-regression workhorse of method-comparison labs.

    Shape: one aggregate join (per-customer mean — shuffle on the
    join key with partial aggregation), one global moment reduce,
    scalar arithmetic. The customer dimension broadcasts into the
    join at any realistic scale."""
    c = _t(spark, sf_dir, "customer").select("c_custkey", "c_acctbal")
    o = _t(spark, sf_dir, "orders").select("o_custkey", "o_totalprice")
    pair = (
        o.join(F.broadcast(c), o["o_custkey"] == c["c_custkey"])
        .groupBy("c_custkey", "c_acctbal")
        .agg(F.avg("o_totalprice").alias("y"))
        .select(F.col("c_acctbal").alias("x"), "y")
    )
    s = pair.agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.avg("x").alias("mx"),
        F.avg("y").alias("my"),
        F.var_pop("x").alias("sxx"),
        F.var_pop("y").alias("syy"),
        F.covar_pop("x", "y").alias("sxy"),
    )
    slope = (
        F.col("syy")
        - F.col("sxx")
        + F.sqrt(
            (F.col("syy") - F.col("sxx")) * (F.col("syy") - F.col("sxx"))
            + 4 * F.col("sxy") * F.col("sxy")
        )
    ) / (2 * F.col("sxy"))
    return s.select(
        "n",
        F.round(slope, 6).alias("slope"),
        F.round(F.col("my") - slope * F.col("mx"), 2).alias("intercept"),
    )


# ---------------------------------------------------------------------------
# sim_matryoshka_topk — truncated-prefix first stage + exact rerank
# ---------------------------------------------------------------------------

_MRL_PREFIX = 8
_MRL_CAND = 32
_MRL_K = 5

_MRL_SQL = f"""
WITH q AS (SELECT vec_id AS query_id, embedding::DOUBLE[] AS qe
           FROM embeddings WHERE vec_id < 5),
s1 AS (SELECT query_id, qe, vec_id, embedding,
              ROW_NUMBER() OVER (PARTITION BY query_id ORDER BY
                list_cosine_similarity(qe[1:{_MRL_PREFIX}],
                  (embedding::DOUBLE[])[1:{_MRL_PREFIX}]) DESC, vec_id) AS crnk
       FROM embeddings CROSS JOIN q WHERE vec_id <> query_id),
s2 AS (SELECT query_id, vec_id,
              ROUND(list_cosine_similarity(qe, embedding::DOUBLE[]), 6)
                AS cos_full,
              ROW_NUMBER() OVER (PARTITION BY query_id ORDER BY
                list_cosine_similarity(qe, embedding::DOUBLE[]) DESC, vec_id)
                AS rnk
       FROM s1 WHERE crnk <= {_MRL_CAND})
SELECT query_id, CAST(rnk AS BIGINT) AS rank, vec_id, cos_full
FROM s2 WHERE rnk <= {_MRL_K}
"""


@register("sim_matryoshka_topk", _MRL_SQL)
def sim_matryoshka_topk(spark, sf_dir):
    """Matryoshka two-stage retrieval (Kusupati et al. 2022): stage 1
    ranks the corpus by cosine over the FIRST 8 of 64 dimensions (an
    MRL-trained embedding front-loads information, so the prefix is
    a legitimate coarse scorer at 1/8 the FLOPs), keeps 32
    candidates per query, stage 2 reranks the shortlist by exact
    full-dimension cosine. Both stages are stated exactly in the
    oracle, so the hash pins the bucketed SEMANTICS (the
    sim_embedding_dup discipline — never an unscalable all-pairs
    claim). Both engines fold dot products dimension-sequentially in
    float64 (the sim_mips_topk ::DOUBLE[] rule), so ranks match
    bit-level.

    Scale shape: stage 1 is the brute-force pass every ANN baseline
    here shares (bounded query set broadcast, one corpus scan,
    map-side partial top-k) at prefix cost; stage 2 touches
    queries×32 rows. Swapping stage 1 for the IVF/LSH bucketed
    generators composes — the rerank stage is unchanged."""
    from stockify_spark.llm.similarity import cosine

    emb = _t(spark, sf_dir, "embeddings")
    q = emb.filter(F.col("vec_id") < 5).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("qe")
    )
    pre_cos = cosine(
        F.slice("qe", 1, _MRL_PREFIX), F.slice("embedding", 1, _MRL_PREFIX)
    )
    s1 = (
        F.broadcast(q)
        .crossJoin(emb)
        .filter(F.col("vec_id") != F.col("query_id"))
        .withColumn(
            "crnk",
            F.row_number().over(
                Window.partitionBy("query_id").orderBy(pre_cos.desc(), "vec_id")
            ),
        )
        .filter(F.col("crnk") <= _MRL_CAND)
    )
    full_cos = cosine("qe", "embedding")
    s2 = s1.select(
        "query_id",
        "vec_id",
        F.round(full_cos, 6).alias("cos_full"),
        F.row_number()
        .over(Window.partitionBy("query_id").orderBy(full_cos.desc(), "vec_id"))
        .cast("long")
        .alias("rank"),
    )
    return s2.filter(F.col("rank") <= _MRL_K).select(
        "query_id", "rank", "vec_id", "cos_full"
    )


# ---------------------------------------------------------------------------
# ml_lda_fisher — two-class Fisher discriminant, closed form
# ---------------------------------------------------------------------------

_LDA_SQL = """
WITH raw AS (
  SELECT CASE WHEN o_orderstatus = 'F' THEN 1 ELSE 0 END AS y,
         o_totalprice AS r1,
         epoch_ms(o_orderdate) / 86400000.0 AS r2
  FROM orders),
std AS (SELECT AVG(r1) AS mu1, STDDEV_POP(r1) AS sd1,
               AVG(r2) AS mu2, STDDEV_POP(r2) AS sd2
        FROM raw),
f AS (SELECT y, ROUND((r1 - mu1) / sd1, 6) AS x1,
             ROUND((r2 - mu2) / sd2, 6) AS x2
      FROM raw CROSS JOIN std),
cls AS (SELECT y, CAST(COUNT(*) AS DOUBLE) AS n,
               AVG(x1) AS m1, AVG(x2) AS m2,
               VAR_POP(x1) * COUNT(*) AS s11,
               COVAR_POP(x1, x2) * COUNT(*) AS s12,
               VAR_POP(x2) * COUNT(*) AS s22
        FROM f GROUP BY y),
pool AS (
  SELECT MAX(CASE WHEN y = 1 THEN m1 END) - MAX(CASE WHEN y = 0 THEN m1 END) AS d1,
         MAX(CASE WHEN y = 1 THEN m2 END) - MAX(CASE WHEN y = 0 THEN m2 END) AS d2,
         (MAX(CASE WHEN y = 1 THEN m1 END) + MAX(CASE WHEN y = 0 THEN m1 END)) / 2 AS c1,
         (MAX(CASE WHEN y = 1 THEN m2 END) + MAX(CASE WHEN y = 0 THEN m2 END)) / 2 AS c2,
         SUM(s11) / (SUM(n) - 2) AS p11,
         SUM(s12) / (SUM(n) - 2) AS p12,
         SUM(s22) / (SUM(n) - 2) AS p22
  FROM cls),
wv AS (
  SELECT ROUND((p22 * d1 - p12 * d2) / (p11 * p22 - p12 * p12), 6) + 0 AS w1,
         ROUND((p11 * d2 - p12 * d1) / (p11 * p22 - p12 * p12), 6) + 0 AS w2,
         c1, c2
  FROM pool),
thr AS (SELECT w1, w2, ROUND(w1 * c1 + w2 * c2, 6) + 0 AS t FROM wv)
SELECT w1, w2, t,
       ROUND(AVG(CASE WHEN (CASE WHEN w1 * x1 + w2 * x2 > t THEN 1 ELSE 0 END) = y
                      THEN 1.0 ELSE 0.0 END), 6) AS train_acc
FROM f CROSS JOIN thr
GROUP BY w1, w2, t
"""


@register("ml_lda_fisher", _LDA_SQL)
def ml_lda_fisher(spark, sf_dir):
    """Two-class Fisher linear discriminant on (total price, order
    date): w = S_pooled⁻¹ (μ₁ − μ₀) with the 2×2 pooled within-class
    covariance inverted in closed form, threshold at the midpoint
    projection, and TRAINING accuracy of sign(wᵀx − t). The weights
    and threshold are ROUNDED at 6dp BEFORE classification, so both
    engines classify with bit-identical parameters and the per-row
    comparison — and therefore the accuracy — is exact (the
    ml_calibration_ece quantize-then-derive rule).

    Shape: one grouped moment aggregate (2 rows), scalar closed-form
    solve, one map-side classification pass with the solved weights
    broadcast — two scans total, nothing iterative (the contrast
    with ml_logreg_newton's damped iterations is the point: LDA is
    the closed-form member of the family)."""
    # features are STANDARDIZED (and the z-scores 6dp-quantized, the
    # ml_calibration_ece rule) before the solve: on raw scales the
    # price weight is O(1e-7) and the 6dp weight rounding would
    # quantize the feature away; on z-scores the weights are O(1)
    raw = _t(spark, sf_dir, "orders").select(
        F.when(F.col("o_orderstatus") == "F", 1).otherwise(0).alias("y"),
        F.col("o_totalprice").alias("r1"),
        (F.unix_millis("o_orderdate") / 86400000.0).alias("r2"),
    )
    std = raw.agg(
        F.avg("r1").alias("mu1"),
        F.stddev_pop("r1").alias("sd1"),
        F.avg("r2").alias("mu2"),
        F.stddev_pop("r2").alias("sd2"),
    )
    f = raw.crossJoin(F.broadcast(std)).select(
        "y",
        F.round((F.col("r1") - F.col("mu1")) / F.col("sd1"), 6).alias("x1"),
        F.round((F.col("r2") - F.col("mu2")) / F.col("sd2"), 6).alias("x2"),
    )
    cls = f.groupBy("y").agg(
        F.count(F.lit(1)).cast("double").alias("n"),
        F.avg("x1").alias("m1"),
        F.avg("x2").alias("m2"),
        (F.var_pop("x1") * F.count(F.lit(1))).alias("s11"),
        (F.covar_pop("x1", "x2") * F.count(F.lit(1))).alias("s12"),
        (F.var_pop("x2") * F.count(F.lit(1))).alias("s22"),
    )
    one = lambda c: F.max(F.when(F.col("y") == 1, F.col(c)))  # noqa: E731
    zero = lambda c: F.max(F.when(F.col("y") == 0, F.col(c)))  # noqa: E731
    pool = cls.agg(
        (one("m1") - zero("m1")).alias("d1"),
        (one("m2") - zero("m2")).alias("d2"),
        ((one("m1") + zero("m1")) / 2).alias("c1"),
        ((one("m2") + zero("m2")) / 2).alias("c2"),
        (F.sum("s11") / (F.sum("n") - 2)).alias("p11"),
        (F.sum("s12") / (F.sum("n") - 2)).alias("p12"),
        (F.sum("s22") / (F.sum("n") - 2)).alias("p22"),
    )
    det = F.col("p11") * F.col("p22") - F.col("p12") * F.col("p12")
    # "+ 0" collapses IEEE negative zero on the rounded weights too:
    # a coefficient that rounds to zero carries an engine-dependent
    # sign bit (Spark +0.0, DuckDB -0.0 here) the value hash sees
    wv = pool.select(
        (F.round((F.col("p22") * F.col("d1") - F.col("p12") * F.col("d2")) / det, 6) + 0).alias("w1"),
        (F.round((F.col("p11") * F.col("d2") - F.col("p12") * F.col("d1")) / det, 6) + 0).alias("w2"),
        "c1",
        "c2",
    )
    # "+ 0" collapses IEEE negative zero: the midpoint projection can
    # round to ±0.0 and the two engines disagree on the SIGN of that
    # zero, which the value hash sees as a diff
    thr = wv.select(
        "w1",
        "w2",
        (F.round(F.col("w1") * F.col("c1") + F.col("w2") * F.col("c2"), 6) + 0).alias(
            "t"
        ),
    )
    pred = F.when(
        F.col("w1") * F.col("x1") + F.col("w2") * F.col("x2") > F.col("t"), 1
    ).otherwise(0)
    return (
        f.crossJoin(F.broadcast(thr))
        .groupBy("w1", "w2", "t")
        .agg(
            F.round(
                F.avg(F.when(pred == F.col("y"), 1.0).otherwise(0.0)), 6
            ).alias("train_acc")
        )
        .select("w1", "w2", "t", "train_acc")
    )


# ---------------------------------------------------------------------------
# stats_mcnemar — paired comparison of two classifiers
# ---------------------------------------------------------------------------

_MCNEMAR_SQL = """
WITH med AS (SELECT median(o_totalprice) AS md FROM orders),
p AS (SELECT CASE WHEN o_orderstatus = 'F' THEN 1 ELSE 0 END AS y,
             CASE WHEN o_totalprice > md THEN 1 ELSE 0 END AS pa,
             CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
                  THEN 1 ELSE 0 END AS pb
      FROM orders CROSS JOIN med)
SELECT CAST(SUM(CASE WHEN pa = y AND pb <> y THEN 1 ELSE 0 END) AS BIGINT) AS b,
       CAST(SUM(CASE WHEN pa <> y AND pb = y THEN 1 ELSE 0 END) AS BIGINT) AS c,
       ROUND(AVG(CASE WHEN pa = y THEN 1.0 ELSE 0.0 END), 6) AS acc_a,
       ROUND(AVG(CASE WHEN pb = y THEN 1.0 ELSE 0.0 END), 6) AS acc_b,
       ROUND(pow(abs(SUM(CASE WHEN pa = y AND pb <> y THEN 1 ELSE 0 END)
                   - SUM(CASE WHEN pa <> y AND pb = y THEN 1 ELSE 0 END)) - 1, 2)
             / (SUM(CASE WHEN pa = y AND pb <> y THEN 1 ELSE 0 END)
                + SUM(CASE WHEN pa <> y AND pb = y THEN 1 ELSE 0 END)), 6)
         AS chi2_cc
FROM p
"""


@register("stats_mcnemar", _MCNEMAR_SQL)
def stats_mcnemar(spark, sf_dir):
    """McNemar's test with continuity correction between two
    rule classifiers of order status (price-above-median vs
    high-priority): χ² = (|b−c|−1)²/(b+c) over the DISAGREEMENT
    cells only — the correct paired comparison of two models
    evaluated on the same rows, where comparing raw accuracies
    ignores the pairing (Dietterich 1998's recommendation for
    classifier comparison). All cells are exact integer counts; one
    scalar median broadcast is the only preliminary.

    Shape: one percentile aggregate (scalar), one conditional-
    aggregate scan — two scans, no join wider than a broadcast."""
    o = _t(spark, sf_dir, "orders")
    med = o.agg(F.percentile("o_totalprice", 0.5).alias("md"))
    y = F.when(F.col("o_orderstatus") == "F", 1).otherwise(0)
    pa = F.when(F.col("o_totalprice") > F.col("md"), 1).otherwise(0)
    pb = F.when(
        F.col("o_orderpriority").isin("1-URGENT", "2-HIGH"), 1
    ).otherwise(0)
    p = o.crossJoin(F.broadcast(med)).select(
        y.alias("y"), pa.alias("pa"), pb.alias("pb")
    )
    b = F.sum(F.when((F.col("pa") == F.col("y")) & (F.col("pb") != F.col("y")), 1).otherwise(0))
    c = F.sum(F.when((F.col("pa") != F.col("y")) & (F.col("pb") == F.col("y")), 1).otherwise(0))
    return p.agg(
        b.cast("bigint").alias("b"),
        c.cast("bigint").alias("c"),
        F.round(F.avg(F.when(F.col("pa") == F.col("y"), 1.0).otherwise(0.0)), 6).alias("acc_a"),
        F.round(F.avg(F.when(F.col("pb") == F.col("y"), 1.0).otherwise(0.0)), 6).alias("acc_b"),
        F.round(F.pow(F.abs(b - c) - 1, 2) / (b + c), 6).alias("chi2_cc"),
    )
