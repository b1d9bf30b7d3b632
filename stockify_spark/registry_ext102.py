"""Round-13 extension wave 102: reliability coefficients.

Cronbach's alpha and the one-way intraclass correlation over the
same complete-block (user × event type) table stats_friedman ranks:
alpha asks whether the five per-type means move together enough to
be one scale (internal consistency); ICC(1) asks how much of the
variance is BETWEEN users (rater/repeatability agreement). Together
with Cohen's kappa (stats_cohens_kappa) and Lin's CCC
(stats_lin_ccc) this completes the agreement/reliability family.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from stockify_spark.registry import register, _t

_K = 5  # event types = scale items / measurements per subject

_CELL_SQL = """
cell AS (
  SELECT user_id, event_type, AVG(value) AS m
  FROM events GROUP BY 1, 2),
full_blocks AS (
  SELECT user_id FROM cell GROUP BY user_id HAVING COUNT(*) = 5),
c AS (SELECT cell.* FROM cell JOIN full_blocks USING (user_id))
"""

_ALPHA_SQL = (
    "WITH "
    + _CELL_SQL
    + """,
item AS (SELECT event_type, VAR_POP(m) AS v FROM c GROUP BY 1),
tot AS (SELECT VAR_POP(s) AS vt FROM
        (SELECT user_id, SUM(m) AS s FROM c GROUP BY 1)),
k AS (SELECT CAST(COUNT(*) AS DOUBLE) AS k, SUM(v) AS sv FROM item)
SELECT CAST(k AS INT) AS k_items,
       ROUND(k / (k - 1) * (1 - sv / vt), 6) AS cronbach_alpha,
       ROUND(sv, 6) AS sum_item_var,
       ROUND(vt, 6) AS total_var
FROM k CROSS JOIN tot
"""
)


@register("stats_cronbach_alpha", _ALPHA_SQL)
def stats_cronbach_alpha(spark, sf_dir):
    """Cronbach's alpha of the five per-type mean values treated as
    scale items, subjects = users with complete blocks:
    α = k/(k−1) · (1 − Σσ²ᵢ/σ²_total). The internal-consistency
    coefficient every survey/metric-battery pipeline reports; values
    near 0 here are CORRECT for synthetic independent items (α
    measures shared variance, and the test pins the equivalent
    variance identity rather than a magnitude).

    Shape: one (user, type) aggregate, the complete-block semi-join,
    a per-item variance over the block table and one row-sum
    variance — everything after the first shuffle is
    users×5-bounded."""
    ev = _t(spark, sf_dir, "events")
    cell = ev.groupBy("user_id", "event_type").agg(F.avg("value").alias("m"))
    full = (
        cell.groupBy("user_id")
        .agg(F.count(F.lit(1)).alias("kk"))
        .filter(F.col("kk") == _K)
        .select("user_id")
    )
    # the complete-block table is users×5 rows and feeds THREE
    # subtrees (item variances, row sums, and full's own lineage) —
    # one eager localCheckpoint keeps the plan linear (the pagerank
    # lineage discipline; kilobytes at any scale)
    c = cell.join(F.broadcast(full), "user_id").localCheckpoint(eager=True)
    item = c.groupBy("event_type").agg(F.var_pop("m").alias("v"))
    tot = (
        c.groupBy("user_id")
        .agg(F.sum("m").alias("s"))
        .agg(F.var_pop("s").alias("vt"))
    )
    k = item.agg(
        F.count(F.lit(1)).cast("double").alias("k"), F.sum("v").alias("sv")
    )
    return k.crossJoin(F.broadcast(tot)).select(
        F.col("k").cast("int").alias("k_items"),
        F.round(
            F.col("k") / (F.col("k") - 1) * (1 - F.col("sv") / F.col("vt")), 6
        ).alias("cronbach_alpha"),
        F.round("sv", 6).alias("sum_item_var"),
        F.round("vt", 6).alias("total_var"),
    )


_ICC_SQL = (
    "WITH "
    + _CELL_SQL
    + """,
g AS (SELECT AVG(m) AS gm FROM c),
blocks AS (SELECT user_id, AVG(m) AS bm, CAST(COUNT(*) AS DOUBLE) AS k
           FROM c GROUP BY 1),
msb AS (SELECT SUM(k * (bm - gm) * (bm - gm))
               / (COUNT(*) - 1) AS msb,
               CAST(COUNT(*) AS DOUBLE) AS n
        FROM blocks CROSS JOIN g),
msw AS (SELECT SUM((c.m - b.bm) * (c.m - b.bm)) AS ssw,
               CAST(COUNT(*) AS DOUBLE) AS nk
        FROM c JOIN blocks b USING (user_id))
SELECT CAST(msb.n AS BIGINT) AS n_subjects,
       ROUND(msb.msb, 6) AS ms_between,
       ROUND(msw.ssw / (msw.nk - msb.n), 6) AS ms_within,
       ROUND((msb.msb - msw.ssw / (msw.nk - msb.n))
             / (msb.msb + (5 - 1) * (msw.ssw / (msw.nk - msb.n))), 6)
         AS icc1
FROM msb CROSS JOIN msw
"""
)


@register("stats_icc", _ICC_SQL)
def stats_icc(spark, sf_dir):
    """One-way intraclass correlation ICC(1) (Shrout & Fleiss 1979)
    over the same complete blocks: MS_between from the k-weighted
    subject-mean deviations, MS_within from the within-subject sum
    of squares over n(k−1) degrees of freedom, ICC(1) =
    (MSB − MSW)/(MSB + (k−1)·MSW) — the repeatability coefficient
    (how much of the measurement variance is the SUBJECT rather
    than the occasion). Negative values are legitimate (less
    agreement than chance) and the synthetic data sits near zero —
    the test pins the ANOVA identity, not a magnitude.

    Shape: same skeleton as stats_cronbach_alpha; the within pass is
    one join of the 5-row-per-user table to its user means."""
    ev = _t(spark, sf_dir, "events")
    cell = ev.groupBy("user_id", "event_type").agg(F.avg("value").alias("m"))
    full = (
        cell.groupBy("user_id")
        .agg(F.count(F.lit(1)).alias("kk"))
        .filter(F.col("kk") == _K)
        .select("user_id")
    )
    # same three-consumer shape as stats_cronbach_alpha: checkpoint
    # the users×5 block table once
    c = cell.join(F.broadcast(full), "user_id").localCheckpoint(eager=True)
    g = c.agg(F.avg("m").alias("gm"))
    blocks = c.groupBy("user_id").agg(
        F.avg("m").alias("bm"), F.count(F.lit(1)).cast("double").alias("k")
    )
    msb = blocks.crossJoin(F.broadcast(g)).agg(
        (
            F.sum(F.col("k") * (F.col("bm") - F.col("gm")) * (F.col("bm") - F.col("gm")))
            / (F.count(F.lit(1)) - 1)
        ).alias("msb"),
        F.count(F.lit(1)).cast("double").alias("n"),
    )
    msw = c.join(F.broadcast(blocks.select("user_id", "bm")), "user_id").agg(
        F.sum((F.col("m") - F.col("bm")) * (F.col("m") - F.col("bm"))).alias("ssw"),
        F.count(F.lit(1)).cast("double").alias("nk"),
    )
    j = msb.crossJoin(msw)
    ms_within = F.col("ssw") / (F.col("nk") - F.col("n"))
    return j.select(
        F.col("n").cast("bigint").alias("n_subjects"),
        F.round("msb", 6).alias("ms_between"),
        F.round(ms_within, 6).alias("ms_within"),
        F.round(
            (F.col("msb") - ms_within) / (F.col("msb") + (_K - 1) * ms_within), 6
        ).alias("icc1"),
    )
