"""Round-8 extension wave 39: differentially private count release.

The standard Laplace mechanism (Dwork, McSherry, Nissim & Smith
2006): release count + Laplace(sensitivity/epsilon) noise. The
engine question is reproducibility: production DP systems draw noise
from a SEEDED generator (auditability, replayable releases), and the
repo's seeded-md5 uniform inverted through the Laplace CDF gives a
deterministic, cross-engine-exact mechanism:

  u  = md5int(seed|key) / 2^32  in [0, 1)
  x  = -b * sign(u - 1/2) * ln(1 - 2*|u - 1/2|)

Privacy accounting for this release: the statistic is the DISTINCT-
USER count per event type (each user contributes at most 1 to each
type — contribution clipping by construction), so per-type
sensitivity is 1 under add/remove-one-user; a user can appear in all
5 types, so the release of all rows composes to 5*epsilon total.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from stockify_spark.registry import register, _t

_EPS = 0.5
_B = 1.0 / _EPS  # Laplace scale, sensitivity 1
_SEED = "dp-v1"

_DP_SQL = f"""
WITH c AS (SELECT event_type,
                  CAST(COUNT(DISTINCT user_id) AS BIGINT) AS n_users
           FROM events GROUP BY 1),
u AS (SELECT event_type, n_users,
             CAST(CONCAT('0x', substr(md5(CONCAT('{_SEED}', '|',
                  event_type)), 1, 8)) AS BIGINT) / 4294967296.0 AS uu
      FROM c)
SELECT event_type, n_users,
       ROUND(n_users
             + (-{_B}) * CASE WHEN uu >= 0.5 THEN 1.0 ELSE -1.0 END
               * ln(1 - 2 * abs(uu - 0.5)), 6) AS noisy_count,
       CAST({_EPS} AS DOUBLE) AS epsilon
FROM u
"""


@register("dq_dp_counts", _DP_SQL)
def dq_dp_counts(spark, sf_dir):
    """Epsilon-DP per-type distinct-user counts via the seeded
    Laplace mechanism (epsilon = 0.5 per row, scale b = 2). The
    inverse-CDF transform is pinned distributionally in
    tests/test_ext50.py (empirical mean |noise| -> b over a seed
    grid, symmetric sign split), and the release includes the true
    count ONLY because this is the engine's differential harness —
    a production release would project it away; the mechanism
    column is what is under test.

    Scale shape: one distinct-user aggregate (two-level: map-side
    partial distinct on (type, user), then the count — Catalyst's
    standard expansion), then per-row literal noise arithmetic. The
    noise needs no randomness service or driver coordination at any
    scale because the seed is data-keyed — the property that makes
    seeded-DP releases replayable."""
    c = (
        _t(spark, sf_dir, "events")
        .groupBy("event_type")
        .agg(F.countDistinct("user_id").cast("long").alias("n_users"))
    )
    uu = (
        F.conv(
            F.substring(
                F.md5(F.concat(F.lit(_SEED), F.lit("|"), F.col("event_type"))),
                1,
                8,
            ),
            16,
            10,
        ).cast("long")
        / F.lit(4294967296.0)
    )
    noise = (
        F.lit(-_B)
        * F.when(uu >= 0.5, F.lit(1.0)).otherwise(F.lit(-1.0))
        * F.log(1 - 2 * F.abs(uu - 0.5))
    )
    return c.select(
        "event_type",
        "n_users",
        F.round(F.col("n_users") + noise, 6).alias("noisy_count"),
        F.lit(_EPS).alias("epsilon"),
    )
