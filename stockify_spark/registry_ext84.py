"""Round-8 extension wave 73: A/B power analysis (MDE).

Before an experiment runs, the design question: at this sample size
and variance, what's the smallest effect we could detect? The
minimum detectable effect at alpha = .05 (two-sided) and 80% power:

  MDE = (z_{alpha/2} + z_beta) * sqrt(sigma_A^2/n_A + sigma_B^2/n_B)

with z literals 1.959964 and 0.841621 (inverse-normal constants —
the stats_fdr_bh literal-fence discipline, no distribution function
in-engine). Closes the experimentation loop the repo already ships:
CUPED shrinks sigma, SPRT stops early, this one says whether the
test was worth starting — and quantifies CUPED's payoff as a
directly comparable MDE drop.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from stockify_spark.registry import register, _t

_ZA, _ZB = 1.959964, 0.841621  # Phi^-1(.975), Phi^-1(.80)

_MDE_SQL = f"""
WITH u AS (
  SELECT user_id, user_id % 2 AS arm,
         ROUND(SUM(value), 6) AS y
  FROM events GROUP BY 1),
m AS (
  SELECT arm, CAST(COUNT(*) AS BIGINT) AS n,
         ROUND(SUM(y), 6) AS s1, ROUND(SUM(y * y), 6) AS s2
  FROM u GROUP BY 1),
v AS (
  SELECT arm, n, s1 / n AS mean,
         (s2 - s1 * s1 / n) / (n - 1) AS var
  FROM m),
w AS (
  SELECT MAX(CASE WHEN arm = 0 THEN n END) AS n0,
         MAX(CASE WHEN arm = 1 THEN n END) AS n1,
         MAX(CASE WHEN arm = 0 THEN mean END) AS mean0,
         MAX(CASE WHEN arm = 1 THEN mean END) AS mean1,
         MAX(CASE WHEN arm = 0 THEN var END) AS var0,
         MAX(CASE WHEN arm = 1 THEN var END) AS var1
  FROM v)
SELECT n0, n1,
       ROUND(mean0, 6) AS mean_a, ROUND(mean1, 6) AS mean_b,
       ROUND(({_ZA!r} + {_ZB!r}) * sqrt(var0 / n0 + var1 / n1), 6) AS mde,
       ROUND(({_ZA!r} + {_ZB!r}) * sqrt(var0 / n0 + var1 / n1)
             / (0.5 * (mean0 + mean1)), 6) AS mde_relative
FROM w
"""


@register("stats_power_mde", _MDE_SQL)
def stats_power_mde(spark, sf_dir):
    """Minimum detectable effect for the user-parity A/B split on
    per-user total event value: sample-variance arms (6dp-rounded
    moment sums, n-1 denominator), Welch-form standard error, the
    (z_.975 + z_.80) literal multiplier, absolute and
    relative-to-grand-mean MDE. The closed form is pinned against a
    numpy recomputation and a simulation in tests/test_ext84.py: an
    injected effect of exactly one MDE is detected by the z-test in
    ~80% of resampled replicates, the definition of power.

    Scale shape: one per-user aggregate, one two-row arm rollup,
    scalar arithmetic — the stats_cuped layout minus the
    adjustment."""
    u = (
        _t(spark, sf_dir, "events")
        .groupBy("user_id")
        .agg(F.round(F.sum("value"), 6).alias("y"))
        .select((F.col("user_id") % 2).alias("arm"), "y")
    )
    m = u.groupBy("arm").agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.round(F.sum("y"), 6).alias("s1"),
        F.round(F.sum(F.col("y") * F.col("y")), 6).alias("s2"),
    )
    v = m.select(
        "arm",
        "n",
        (F.col("s1") / F.col("n")).alias("mean"),
        ((F.col("s2") - F.col("s1") * F.col("s1") / F.col("n")) / (F.col("n") - 1)).alias(
            "var"
        ),
    )
    w = v.agg(
        F.max(F.when(F.col("arm") == 0, F.col("n"))).alias("n0"),
        F.max(F.when(F.col("arm") == 1, F.col("n"))).alias("n1"),
        F.max(F.when(F.col("arm") == 0, F.col("mean"))).alias("mean0"),
        F.max(F.when(F.col("arm") == 1, F.col("mean"))).alias("mean1"),
        F.max(F.when(F.col("arm") == 0, F.col("var"))).alias("var0"),
        F.max(F.when(F.col("arm") == 1, F.col("var"))).alias("var1"),
    )
    se = F.sqrt(F.col("var0") / F.col("n0") + F.col("var1") / F.col("n1"))
    return w.select(
        F.col("n0").cast("long").alias("n0"),
        F.col("n1").cast("long").alias("n1"),
        F.round("mean0", 6).alias("mean_a"),
        F.round("mean1", 6).alias("mean_b"),
        F.round((_ZA + _ZB) * se, 6).alias("mde"),
        F.round(
            (_ZA + _ZB) * se / (0.5 * (F.col("mean0") + F.col("mean1"))), 6
        ).alias("mde_relative"),
    )
