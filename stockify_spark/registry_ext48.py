"""Round-8 extension wave 37: systematic weighted resampling.

Data-mixing pipelines draw a fixed-size sample where each document's
multiplicity is proportional to its weight (quality score, domain
mixing ratio). Independent draws (the A-Res family, sample_weighted)
have multinomial variance; SYSTEMATIC resampling — the low-variance
scheme from particle filtering (Kitagawa 1996) — places m evenly
spaced probes (j + 1/2) * W / m, j = 0..m-1, over the cumulative
weight axis, so every document's multiplicity is within 1 of its
exact expectation m * w_i / W. With integer weights the probe count
per document has a pure-integer closed form:

  c(cum) = 0                                if 2*cum*m < W
           (2*cum*m - W) // (2*W) + 1       otherwise
  multiplicity_i = c(cum_i) - c(cum_{i-1})

— no floats anywhere, so the Spark face and the DuckDB oracle agree
exactly by arithmetic, not by rounding policy.
"""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F

from stockify_spark.registry import register, _t

_M = 200  # sample size (number of probes)

_SYS_SQL = f"""
WITH d AS (
  SELECT doc_id, CAST(n_chars AS BIGINT) AS w,
         SUM(CAST(n_chars AS BIGINT)) OVER (ORDER BY doc_id) AS cum,
         SUM(CAST(n_chars AS BIGINT)) OVER () AS tot
  FROM documents),
c AS (
  SELECT doc_id, w,
         CASE WHEN 2 * cum * {_M} < tot THEN 0
              ELSE (2 * cum * {_M} - tot) // (2 * tot) + 1 END AS chi,
         CASE WHEN 2 * (cum - w) * {_M} < tot THEN 0
              ELSE (2 * (cum - w) * {_M} - tot) // (2 * tot) + 1 END AS clo
  FROM d)
SELECT doc_id, w AS weight, CAST(chi - clo AS BIGINT) AS multiplicity
FROM c WHERE chi > clo
"""


@register("pipeline_systematic_resample", _SYS_SQL)
def pipeline_systematic_resample(spark, sf_dir):
    """Systematic resample of 200 probes over documents weighted by
    n_chars, documents laid on the cumulative axis in doc_id order.
    Emits (doc_id, weight, multiplicity) for selected documents.
    Two invariants pinned in tests/test_ext48.py: multiplicities
    total exactly 200, and every multiplicity is floor or ceil of
    its exact expectation 200*w/W — the low-variance guarantee that
    is the entire reason to prefer systematic over independent
    draws.

    Scale shape: one global prefix sum (at 100 TB the standard
    two-phase form — per-partition subtotals broadcast back, the
    pipeline_token_pack layout) and a map: each row computes its own
    probe count from (cum, cum - w) in closed form, so no probe list
    is ever materialized and m can be billions without a join. The
    global-order window here is the documented 1-part parity shape;
    the partitioned production twin is the token-pack construction."""
    docs = _t(spark, sf_dir, "documents").select(
        "doc_id", F.col("n_chars").cast("long").alias("w")
    )
    d = docs.select(
        "doc_id",
        "w",
        F.sum("w").over(Window.orderBy("doc_id")).alias("cum"),
        F.sum("w").over(
            Window.partitionBy().rowsBetween(
                Window.unboundedPreceding, Window.unboundedFollowing
            )
        ).alias("tot"),
    )

    def probes(cum):
        raw = F.expr(
            f"(2 * ({cum}) * {_M} - tot) div (2 * tot)"
        ) + 1
        return F.when(
            F.expr(f"2 * ({cum}) * {_M}") < F.col("tot"), F.lit(0)
        ).otherwise(raw)

    c = d.select(
        "doc_id",
        "w",
        probes("cum").alias("chi"),
        probes("cum - w").alias("clo"),
    )
    return c.filter(F.col("chi") > F.col("clo")).select(
        "doc_id",
        F.col("w").alias("weight"),
        (F.col("chi") - F.col("clo")).cast("long").alias("multiplicity"),
    )
