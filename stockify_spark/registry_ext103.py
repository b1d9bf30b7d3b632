"""Round-13 extension wave 103: pipeline health reports.

Two audit queries a curation pipeline runs before anything expensive:
the dedup impact report (what exact dedup would remove, stated
before/after so the run decision is one row), and the embedding
health audit (norm distribution + degenerate-vector counts per
label — the check that catches a broken encoder before an ANN index
is built over garbage).
"""

from __future__ import annotations

from pyspark.sql import functions as F

from stockify_spark.registry import register, _t

# ---------------------------------------------------------------------------
# pipeline_dedup_impact — before/after report for exact dedup
# ---------------------------------------------------------------------------

_IMPACT_SQL = """
WITH t AS (SELECT doc_id, text, len(string_split(text, ' ')) AS toks
           FROM documents),
k AS (SELECT text, MIN(doc_id) AS keeper, CAST(COUNT(*) AS BIGINT) AS n,
             MAX(toks) AS toks
      FROM t GROUP BY text)
SELECT CAST(SUM(n) AS BIGINT) AS docs_before,
       CAST(COUNT(*) AS BIGINT) AS docs_after,
       CAST(SUM(n * toks) AS BIGINT) AS tokens_before,
       CAST(SUM(toks) AS BIGINT) AS tokens_after,
       CAST(SUM(n) - COUNT(*) AS BIGINT) AS docs_removed,
       ROUND(1 - COUNT(*) / CAST(SUM(n) AS DOUBLE), 6) AS doc_dup_ratio,
       ROUND(1 - SUM(toks) / CAST(SUM(n * toks) AS DOUBLE), 6)
         AS token_dup_ratio,
       CAST(MAX(n) AS BIGINT) AS largest_dup_group
FROM k
"""


@register("pipeline_dedup_impact", _IMPACT_SQL)
def pipeline_dedup_impact(spark, sf_dir):
    """The exact-dedup impact report: documents and whitespace tokens
    before vs after first-wins dedup on full text, the removal
    ratios on both axes (token-weighted duplication is the number
    that predicts training impact — a few duplicated long documents
    move it more than many short ones), and the largest duplicate
    group (the smoking gun a curation review opens first). States
    dedup_exact's EFFECT as one row, the form a pipeline gate
    consumes — run it before paying for the rewrite.

    Shape: one groupBy on the content key (the skew-safe exact-dedup
    shuffle dedup_exact already uses — at 100 TB the key is a
    fixed-width hash of text, same cost model), then one 8-column
    fold of the group table."""
    t = _t(spark, sf_dir, "documents").select(
        "doc_id", "text", F.size(F.split("text", " ")).alias("toks")
    )
    k = t.groupBy("text").agg(
        F.min("doc_id").alias("keeper"),
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.max("toks").alias("toks"),
    )
    return k.agg(
        F.sum("n").cast("bigint").alias("docs_before"),
        F.count(F.lit(1)).cast("bigint").alias("docs_after"),
        F.sum(F.col("n") * F.col("toks")).cast("bigint").alias("tokens_before"),
        F.sum("toks").cast("bigint").alias("tokens_after"),
        (F.sum("n") - F.count(F.lit(1))).cast("bigint").alias("docs_removed"),
        F.round(1 - F.count(F.lit(1)) / F.sum("n").cast("double"), 6).alias(
            "doc_dup_ratio"
        ),
        F.round(
            1 - F.sum("toks") / F.sum(F.col("n") * F.col("toks")).cast("double"), 6
        ).alias("token_dup_ratio"),
        F.max("n").cast("bigint").alias("largest_dup_group"),
    )


# ---------------------------------------------------------------------------
# sim_embedding_health — norm/degeneracy audit per label
# ---------------------------------------------------------------------------

_HEALTH_SQL = """
WITH n AS (
  SELECT label,
         sqrt(list_dot_product(embedding :: DOUBLE[], embedding :: DOUBLE[]))
           AS nrm,
         CAST(len(embedding) AS INT) AS dim
  FROM embeddings)
SELECT label,
       CAST(COUNT(*) AS BIGINT) AS n_vecs,
       CAST(MAX(dim) AS INT) AS dim,
       ROUND(MIN(nrm), 6) AS norm_min,
       ROUND(AVG(nrm), 6) AS norm_mean,
       ROUND(MAX(nrm), 6) AS norm_max,
       ROUND(STDDEV_POP(nrm) / AVG(nrm), 6) AS norm_cv,
       CAST(SUM(CASE WHEN nrm < 1e-6 THEN 1 ELSE 0 END) AS BIGINT)
         AS n_degenerate
FROM n GROUP BY label
"""


@register("sim_embedding_health", _HEALTH_SQL)
def sim_embedding_health(spark, sf_dir):
    """Embedding health audit per label: L2-norm distribution
    (min/mean/max and the coefficient of variation — cosine
    retrieval silently becomes dot-product retrieval when norms
    spread, so norm_cv is the number an ANN pipeline alarms on) plus
    degenerate near-zero vectors (a broken encoder's signature; a
    zero vector makes cosine undefined and poisons centroids). Run
    BEFORE building any index over sim_*'s corpus — every downstream
    operator here assumes these invariants.

    Shape: one map-side norm fold (the dimension-sequential dot both
    engines share), one per-label aggregate; nothing
    corpus-squared."""
    from stockify_spark.llm.similarity import dot

    n = _t(spark, sf_dir, "embeddings").select(
        "label",
        F.sqrt(dot("embedding", "embedding")).alias("nrm"),
        F.size("embedding").cast("int").alias("dim"),
    )
    return n.groupBy("label").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_vecs"),
        F.max("dim").cast("int").alias("dim"),
        F.round(F.min("nrm"), 6).alias("norm_min"),
        F.round(F.avg("nrm"), 6).alias("norm_mean"),
        F.round(F.max("nrm"), 6).alias("norm_max"),
        F.round(F.stddev_pop("nrm") / F.avg("nrm"), 6).alias("norm_cv"),
        F.sum(F.when(F.col("nrm") < 1e-6, 1).otherwise(0)).cast("bigint").alias(
            "n_degenerate"
        ),
    )


# ---------------------------------------------------------------------------
# stats_cohens_d — effect size for the click-vs-view comparison
# ---------------------------------------------------------------------------

_COHEN_SQL = """
WITH s AS (SELECT
  AVG(CASE WHEN event_type = 'click' THEN value END) AS m1,
  AVG(CASE WHEN event_type = 'view' THEN value END) AS m2,
  VAR_SAMP(CASE WHEN event_type = 'click' THEN value END) AS v1,
  VAR_SAMP(CASE WHEN event_type = 'view' THEN value END) AS v2,
  CAST(COUNT(CASE WHEN event_type = 'click' THEN 1 END) AS DOUBLE) AS n1,
  CAST(COUNT(CASE WHEN event_type = 'view' THEN 1 END) AS DOUBLE) AS n2
 FROM events),
d AS (SELECT n1, n2,
             (m1 - m2) / sqrt(((n1 - 1) * v1 + (n2 - 1) * v2) / (n1 + n2 - 2))
               AS d
      FROM s)
SELECT CAST(n1 AS BIGINT) AS n1, CAST(n2 AS BIGINT) AS n2,
       ROUND(d, 6) AS cohens_d,
       ROUND(d * (1 - 3 / (4 * (n1 + n2) - 9)), 6) AS hedges_g,
       ROUND(sqrt((n1 + n2) / (n1 * n2) + d * d / (2 * (n1 + n2))), 6)
         AS se_d
FROM d
"""


@register("stats_cohens_d", _COHEN_SQL)
def stats_cohens_d(spark, sf_dir):
    """Cohen's d for the click-vs-view value comparison — the EFFECT
    SIZE stats_ttest's significance doesn't give (the same
    complement relationship as stats_cramers_v to stats_chi2):
    pooled-SD standardized mean difference, the small-sample Hedges'
    g correction (×(1 − 3/(4N−9))), and the standard error of d for
    interval construction. One conditional-aggregate scan; scalar
    arithmetic after.

    Shape: single scan, one reduce — the stats_ttest shape with a
    different numerator."""
    click = F.col("event_type") == "click"
    view = F.col("event_type") == "view"
    s = _t(spark, sf_dir, "events").agg(
        F.avg(F.when(click, F.col("value"))).alias("m1"),
        F.avg(F.when(view, F.col("value"))).alias("m2"),
        F.var_samp(F.when(click, F.col("value"))).alias("v1"),
        F.var_samp(F.when(view, F.col("value"))).alias("v2"),
        F.count(F.when(click, 1)).cast("double").alias("n1"),
        F.count(F.when(view, 1)).cast("double").alias("n2"),
    )
    n1, n2 = F.col("n1"), F.col("n2")
    d = (F.col("m1") - F.col("m2")) / F.sqrt(
        ((n1 - 1) * F.col("v1") + (n2 - 1) * F.col("v2")) / (n1 + n2 - 2)
    )
    dd = s.select("n1", "n2", d.alias("d"))
    return dd.select(
        n1.cast("bigint").alias("n1"),
        n2.cast("bigint").alias("n2"),
        F.round(F.col("d"), 6).alias("cohens_d"),
        F.round(F.col("d") * (1 - 3 / (4 * (n1 + n2) - 9)), 6).alias("hedges_g"),
        F.round(
            F.sqrt(
                (n1 + n2) / (n1 * n2) + F.col("d") * F.col("d") / (2 * (n1 + n2))
            ),
            6,
        ).alias("se_d"),
    )


# ---------------------------------------------------------------------------
# stats_bland_altman — limits of agreement
# ---------------------------------------------------------------------------

_BA_SQL = """
WITH p AS (
  SELECT value AS x, LAG(value) OVER w AS y
  FROM events
  WINDOW w AS (PARTITION BY user_id ORDER BY epoch_ms(ts), event_id)),
d AS (SELECT x - y AS diff FROM p WHERE y IS NOT NULL),
s AS (SELECT CAST(COUNT(*) AS BIGINT) AS n, AVG(diff) AS bias,
             STDDEV_SAMP(diff) AS sd
      FROM d)
SELECT n,
       ROUND(bias, 6) AS bias,
       ROUND(sd, 6) AS sd_diff,
       ROUND(bias - 1.96 * sd, 6) AS loa_lower,
       ROUND(bias + 1.96 * sd, 6) AS loa_upper,
       ROUND((SELECT CAST(SUM(CASE WHEN diff >= bias - 1.96 * sd
                                    AND diff <= bias + 1.96 * sd
                                   THEN 1 ELSE 0 END) AS DOUBLE) / COUNT(*)
              FROM d CROSS JOIN s), 6) AS frac_within
FROM s
"""


@register("stats_bland_altman", _BA_SQL)
def stats_bland_altman(spark, sf_dir):
    """Bland-Altman limits of agreement on the consecutive-pair
    differences stats_lin_ccc correlates: bias (mean difference),
    SD of differences, the 95% limits bias ± 1.96·SD, and the
    observed fraction of pairs inside them (≈0.95 when differences
    are near-normal — the check Bland & Altman 1986 prescribe before
    trusting the limits). Completes the method-comparison trio: CCC
    scores agreement, Deming fits it, Bland-Altman BOUNDS it.

    Shape: one series-key window shuffle, one moment aggregate, one
    counted second pass against the broadcast limits (the price of
    the within-limits diagnostic)."""
    ev = _t(spark, sf_dir, "events")
    from pyspark.sql import Window

    w = Window.partitionBy("user_id").orderBy(F.unix_millis("ts"), "event_id")
    d = (
        ev.select((F.col("value") - F.lag("value").over(w)).alias("diff"))
        .filter(F.col("diff").isNotNull())
    )
    s = d.agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.avg("diff").alias("bias"),
        F.stddev_samp("diff").alias("sd"),
    )
    within = d.crossJoin(F.broadcast(s)).agg(
        F.round(
            F.sum(
                F.when(
                    (F.col("diff") >= F.col("bias") - 1.96 * F.col("sd"))
                    & (F.col("diff") <= F.col("bias") + 1.96 * F.col("sd")),
                    1,
                ).otherwise(0)
            ).cast("double")
            / F.count(F.lit(1)),
            6,
        ).alias("frac_within")
    )
    return s.crossJoin(within).select(
        "n",
        F.round("bias", 6).alias("bias"),
        F.round("sd", 6).alias("sd_diff"),
        F.round(F.col("bias") - 1.96 * F.col("sd"), 6).alias("loa_lower"),
        F.round(F.col("bias") + 1.96 * F.col("sd"), 6).alias("loa_upper"),
        "frac_within",
    )
