"""Round-8 extension wave 29: iterative ML with an exact SQL oracle.

Logistic regression trained by Newton-Raphson (equivalently IRLS) —
the canonical iterative algorithm people claim cannot be
differentially tested against a SQL engine. It can: each Newton step
is ONE aggregate over the fact table (gradient + Hessian + log
likelihood at the current coefficients), and a 2-parameter model
(intercept + one feature) has a closed-form Cramer solve for the
step, so K iterations are K chained CTEs in DuckDB and K collected
1-row aggregates in Spark. The recursion is pinned by the repo's
round-before-decide policy: the five sufficient-statistic sums and
the updated coefficients are rounded to 6dp each step, so ulp-level
exp() differences between the JVM and DuckDB's libm (each step's
per-row sigmoid) can never compound across iterations — drift enters
a sum at ~1e-11 and is quantized away at 1e-6.

Model: P(urgent order) ~ sigmoid(b0 + b1 * o_totalprice/100000),
urgent = priority 1-URGENT or 2-HIGH; three Newton steps from
(0, 0). The synthetic labels are independent of price, so b1
converges near 0 and b0 near logit(urgent share) — asserted in
tests/test_ext40.py, which also pins each step against an
independent numpy reimplementation.
"""

from __future__ import annotations

from pyspark.sql import functions as F
from pyspark.sql.types import DoubleType, LongType, StructField, StructType

from stockify_spark.registry import register, _t

_ITERS = 3

_D_SQL = """
  SELECT o_totalprice / 100000 AS x,
         CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
              THEN 1.0 ELSE 0.0 END AS y
  FROM orders
"""


def _oracle() -> str:
    ctes = [f"d AS ({_D_SQL})", "b0c AS (SELECT 0.0 AS b0, 0.0 AS b1)"]
    for k in range(_ITERS + 1):
        ctes.append(f"""s{k} AS (
  SELECT ROUND(SUM(y - p), 6) AS g0,
         ROUND(SUM(x * (y - p)), 6) AS g1,
         ROUND(SUM(p * (1 - p)), 6) AS h00,
         ROUND(SUM(x * p * (1 - p)), 6) AS h01,
         ROUND(SUM(x * x * p * (1 - p)), 6) AS h11,
         ROUND(SUM(y * ln(p) + (1 - y) * ln(1 - p)), 6) AS ll
  FROM (SELECT x, y, 1 / (1 + exp(-(b.b0 + b.b1 * x))) AS p
        FROM d CROSS JOIN b{k}c b))""")
        if k < _ITERS:
            ctes.append(f"""b{k + 1}c AS (
  SELECT ROUND(b.b0 + (h11 * g0 - h01 * g1)
               / (h00 * h11 - h01 * h01), 6) AS b0,
         ROUND(b.b1 + (h00 * g1 - h01 * g0)
               / (h00 * h11 - h01 * h01), 6) AS b1
  FROM s{k} CROSS JOIN b{k}c b)""")
    rows = " UNION ALL ".join(
        f"SELECT CAST({k} AS BIGINT) AS iter, b.b0, b.b1, s.ll "
        f"FROM b{k}c b CROSS JOIN s{k} s"
        for k in range(1, _ITERS + 1)
    )
    return "WITH " + ",\n".join(ctes) + "\n" + rows


@register("ml_logreg_newton", _oracle())
def ml_logreg_newton(spark, sf_dir):
    """Three Newton-Raphson steps of 2-parameter logistic regression
    over orders, reporting (iter, b0, b1, log-likelihood-at-those-
    coefficients) per step. Each step is one map-side-combinable
    aggregate producing six rounded sufficient statistics; the
    coefficient update is a 2x2 Cramer solve computed IN-ENGINE on
    the 1-row aggregate (Spark ROUND == DuckDB ROUND — Python's
    banker's round never touches the recursion) and collected as
    bounded model state (two doubles — the k-means/BPE precedent).

    Scale shape: K full passes over the fact table, each a single
    partial+final aggregate with no shuffle wider than one row —
    the textbook distributed-IRLS layout. At 100 TB the cost is K
    scans (or K cached-dataset passes); nothing else grows with
    data. Coefficients between steps live on the driver, 16 bytes."""
    d = _t(spark, sf_dir, "orders").select(
        (F.col("o_totalprice") / 100000).alias("x"),
        F.when(
            F.col("o_orderpriority").isin("1-URGENT", "2-HIGH"), 1.0
        )
        .otherwise(0.0)
        .alias("y"),
    )
    b0, b1 = 0.0, 0.0
    out = []
    for k in range(_ITERS + 1):
        eta = F.lit(b0) + F.lit(b1) * F.col("x")
        p = 1 / (1 + F.exp(-eta))
        stats = d.agg(
            F.round(F.sum(F.col("y") - p), 6).alias("g0"),
            F.round(F.sum(F.col("x") * (F.col("y") - p)), 6).alias("g1"),
            F.round(F.sum(p * (1 - p)), 6).alias("h00"),
            F.round(F.sum(F.col("x") * p * (1 - p)), 6).alias("h01"),
            F.round(F.sum(F.col("x") * F.col("x") * p * (1 - p)), 6).alias(
                "h11"
            ),
            F.round(
                F.sum(
                    F.col("y") * F.log(p) + (1 - F.col("y")) * F.log(1 - p)
                ),
                6,
            ).alias("ll"),
        )
        det = F.col("h00") * F.col("h11") - F.col("h01") * F.col("h01")
        row = stats.select(
            F.round(
                F.lit(b0)
                + (F.col("h11") * F.col("g0") - F.col("h01") * F.col("g1"))
                / det,
                6,
            ).alias("nb0"),
            F.round(
                F.lit(b1)
                + (F.col("h00") * F.col("g1") - F.col("h01") * F.col("g0"))
                / det,
                6,
            ).alias("nb1"),
            "ll",
        ).collect()[0]
        if k >= 1:
            out.append((k, b0, b1, row.ll))
        b0, b1 = row.nb0, row.nb1
    schema = StructType(
        [
            StructField("iter", LongType()),
            StructField("b0", DoubleType()),
            StructField("b1", DoubleType()),
            StructField("ll", DoubleType()),
        ]
    )
    return spark.createDataFrame(out, schema)
