"""Round-13 extension wave 96: the model-training/-evaluation loop.

Four queries: two rounds of gradient boosting with regression stumps
(the histogram-trick candidate machinery of ml_decision_stump, now
CHAINED through residuals — the actual GBM inner loop), the Chan
parallel-moments merge identity (the algebra that makes map-side
combine of variance CORRECT, stated as a query so the contract is
oracle-checked rather than assumed), a calibration-reliability table
with expected calibration error (the model-eval primitive next to
ml_confusion_metrics), and discounted customer value (NPV) as the
per-row-exact financial fold.
"""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F

from stockify_spark.registry import register, _t

# ---------------------------------------------------------------------------
# ml_gbt_two_stumps — two boosting rounds, squared loss
# ---------------------------------------------------------------------------

# Stage 1 splits on l_quantity, stage 2 fits stage-1 residuals on
# l_discount. Candidates are the 9 decile fences over DISTINCT values
# (the ml_decision_stump rule); gains are ROUNDED relative SSE
# reductions so both engines argmax identical quantized values.


def _stump_cte(src: str, x: str, y: str, tag: str) -> str:
    """CTE block scoring decile-fence candidates of ``x`` against
    ``y`` in relation ``src``; emits best{tag} (thr, ml, mr) and
    s{tag} (the post-split SSE)."""
    return f"""
g{tag} AS (SELECT {x} AS x, CAST(COUNT(*) AS DOUBLE) AS n, SUM({y}) AS s
           FROM {src} GROUP BY {x}),
c{tag} AS (SELECT x, SUM(n) OVER (ORDER BY x) AS cn, SUM(s) OVER (ORDER BY x) AS cs,
                  ROW_NUMBER() OVER (ORDER BY x) AS rx,
                  COUNT(*) OVER () AS ndist
           FROM g{tag}),
t{tag} AS (SELECT CAST(COUNT(*) AS DOUBLE) AS nn, SUM({y}) AS ss,
                  SUM({y} * {y}) AS sq
           FROM {src}),
cand{tag} AS (
  SELECT c.x AS thr, c.cn AS nl, c.cs AS sl, t.nn, t.ss, t.sq,
         t.sq - (c.cs * c.cs / c.cn)
              - ((t.ss - c.cs) * (t.ss - c.cs) / (t.nn - c.cn)) AS sse
  FROM c{tag} c CROSS JOIN t{tag} t
  WHERE c.rx < c.ndist
    AND (c.rx * 10) // c.ndist > ((c.rx - 1) * 10) // c.ndist),
best{tag} AS (
  SELECT thr, sl / nl AS ml, (ss - sl) / (nn - nl) AS mr, sse
  FROM (SELECT *,
          ROW_NUMBER() OVER (
            ORDER BY ROUND(1 - sse / (sq - ss * ss / nn), 6) DESC, thr) AS rnk
        FROM cand{tag})
  WHERE rnk = 1)"""


_GBT_SQL = (
    """
WITH d AS (SELECT l_quantity AS x1, l_discount AS x2,
                  l_extendedprice AS y
           FROM lineitem),"""
    + _stump_cte("d", "x1", "y", "1")
    + """,
r AS (SELECT d.x2,
             d.y - (CASE WHEN d.x1 <= b.thr THEN b.ml ELSE b.mr END) AS y
      FROM d CROSS JOIN best1 b),"""
    + _stump_cte("r", "x2", "y", "2")
    + """
SELECT b1.thr AS thr1, ROUND(b1.ml, 6) AS mean_l1, ROUND(b1.mr, 6) AS mean_r1,
       b2.thr AS thr2, ROUND(b2.ml, 6) AS mean_l2, ROUND(b2.mr, 6) AS mean_r2,
       ROUND(b1.sse / (t1.sq - t1.ss * t1.ss / t1.nn), 6) AS sse_ratio_1,
       ROUND(b2.sse / b1.sse, 6) AS sse_ratio_2
FROM best1 b1 CROSS JOIN best2 b2 CROSS JOIN t1
"""
)


@register("ml_gbt_two_stumps", _GBT_SQL)
def ml_gbt_two_stumps(spark, sf_dir):
    """Two rounds of gradient boosting with regression stumps under
    squared loss: round 1 splits l_quantity against l_extendedprice
    (SSE via the prefix-sum histogram trick — one cumulative pass
    over distinct values, every decile-fence candidate a lookup, the
    XGBoost/LightGBM shape); round 2 fits round 1's RESIDUALS on
    l_discount with the same machinery. The output is the fitted
    pair plus the SSE ratio each round leaves (both < 1: every
    boosting round provably reduces training loss — pinned in
    tests/test_ext96.py). Argmaxes are decided on 6dp-ROUNDED
    relative gains with threshold tie-break, the registry's
    quantized-winner rule.

    Shape: each round is one groupBy over distinct feature values
    (feature-cardinality-bounded), one window prefix pass over that
    tiny table, one scalar argmax broadcast back — the fact table is
    scanned once per round plus once for its moment totals; nothing
    is per-candidate. Residuals are a map-side CASE against the
    broadcast best-split row, never a materialized column store."""
    li = _t(spark, sf_dir, "lineitem").select(
        F.col("l_quantity").alias("x1"),
        F.col("l_discount").alias("x2"),
        F.col("l_extendedprice").alias("y"),
    )

    def stump(d, xcol):
        # the grouped table carries Σy² too, so the moment TOTALS are
        # a rollup of the (feature-cardinality-sized) partials — the
        # fact table is scanned ONCE per stump, not twice (plan-audit
        # catch; cross-engine sum-order drift is absorbed by the
        # 6dp-rounded gain the argmax runs on)
        g = d.groupBy(F.col(xcol).alias("x")).agg(
            F.count(F.lit(1)).cast("double").alias("n"),
            F.sum("y").alias("s"),
            F.sum(F.col("y") * F.col("y")).alias("q"),
        )
        wo = Window.orderBy("x")
        c = g.select(
            "x",
            F.sum("n").over(wo).alias("cn"),
            F.sum("s").over(wo).alias("cs"),
            F.row_number().over(wo).alias("rx"),
            F.count(F.lit(1)).over(
                Window.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
            ).alias("ndist"),
        )
        t = g.agg(
            F.sum("n").alias("nn"),
            F.sum("s").alias("ss"),
            F.sum("q").alias("sq"),
        )
        cand = (
            c.crossJoin(F.broadcast(t))
            .filter(
                (F.col("rx") < F.col("ndist"))
                & (
                    F.expr("(rx * 10) div ndist")
                    > F.expr("((rx - 1) * 10) div ndist")
                )
            )
            .select(
                F.col("x").alias("thr"),
                F.col("cn").alias("nl"),
                F.col("cs").alias("sl"),
                "nn",
                "ss",
                "sq",
                (
                    F.col("sq")
                    - (F.col("cs") * F.col("cs") / F.col("cn"))
                    - (
                        (F.col("ss") - F.col("cs"))
                        * (F.col("ss") - F.col("cs"))
                        / (F.col("nn") - F.col("cn"))
                    )
                ).alias("sse"),
            )
        )
        gain = F.round(
            1 - F.col("sse") / (F.col("sq") - F.col("ss") * F.col("ss") / F.col("nn")),
            6,
        )
        best = (
            cand.withColumn(
                "rnk",
                F.row_number().over(Window.orderBy(gain.desc(), "thr")),
            )
            .filter(F.col("rnk") == 1)
            .select(
                "thr",
                (F.col("sl") / F.col("nl")).alias("ml"),
                ((F.col("ss") - F.col("sl")) / (F.col("nn") - F.col("nl"))).alias(
                    "mr"
                ),
                "sse",
            )
        )
        return best, t

    # DuckDB's integer // floors; Spark's long-cast division above
    # must match only in the CANDIDATE SELECTION predicate, where both
    # sides compare integer-valued quantities — the fence rule.
    best1, t1 = stump(li, "x1")
    resid = li.crossJoin(F.broadcast(best1.withColumnRenamed("sse", "sse1"))).select(
        "x2",
        (
            F.col("y")
            - F.when(F.col("x1") <= F.col("thr"), F.col("ml")).otherwise(F.col("mr"))
        ).alias("y"),
    )
    best2, _t2 = stump(resid, "x2")
    b1 = best1.select(
        F.col("thr").alias("thr1"),
        F.round("ml", 6).alias("mean_l1"),
        F.round("mr", 6).alias("mean_r1"),
        F.col("sse").alias("sse1"),
    )
    b2 = best2.select(
        F.col("thr").alias("thr2"),
        F.round("ml", 6).alias("mean_l2"),
        F.round("mr", 6).alias("mean_r2"),
        F.col("sse").alias("sse2"),
    )
    tot = t1.select(
        (F.col("sq") - F.col("ss") * F.col("ss") / F.col("nn")).alias("sse0")
    )
    return (
        b1.crossJoin(b2)
        .crossJoin(F.broadcast(tot))
        .select(
            "thr1",
            "mean_l1",
            "mean_r1",
            "thr2",
            "mean_l2",
            "mean_r2",
            F.round(F.col("sse1") / F.col("sse0"), 6).alias("sse_ratio_1"),
            F.round(F.col("sse2") / F.col("sse1"), 6).alias("sse_ratio_2"),
        )
    )


# ---------------------------------------------------------------------------
# stats_moments_merge — Chan et al. parallel variance merge identity
# ---------------------------------------------------------------------------

_MERGE_SQL = """
WITH part AS (
  SELECT event_type, user_id % 4 AS bucket,
         CAST(COUNT(*) AS DOUBLE) AS n, AVG(value) AS m,
         VAR_POP(value) * COUNT(*) AS m2
  FROM events GROUP BY 1, 2),
merged AS (
  SELECT event_type,
         SUM(n) AS n, SUM(n * m) / SUM(n) AS mean
  FROM part GROUP BY 1),
m2m AS (
  SELECT p.event_type,
         (SUM(p.m2) + SUM(p.n * (p.m - g.mean) * (p.m - g.mean))) / g.n
           AS var_merged
  FROM part p JOIN merged g USING (event_type)
  GROUP BY p.event_type, g.n),
direct AS (
  SELECT event_type, VAR_POP(value) AS var_direct,
         CAST(COUNT(*) AS BIGINT) AS n_rows
  FROM events GROUP BY 1)
SELECT d.event_type, d.n_rows,
       ROUND(d.var_direct, 6) AS var_direct,
       ROUND(m.var_merged, 6) AS var_merged,
       abs(d.var_direct - m.var_merged) < 1e-6 AS merge_exact
FROM direct d JOIN m2m m USING (event_type)
"""


@register("stats_moments_merge", _MERGE_SQL)
def stats_moments_merge(spark, sf_dir):
    """The parallel-variance merge identity (Chan, Golub & LeVeque
    1983): split each event type's values into 4 disjoint buckets,
    reduce each bucket to (n, mean, M2), merge with
    M2 = Σ M2_i + Σ n_i(mean_i − mean)², and show the merged
    variance EQUALS the direct single-pass variance. This is the
    algebra Spark's partial aggregation applies implicitly on every
    var/stddev in this registry — stated as a query, the contract is
    oracle-checked instead of assumed, and the merge_exact flag is
    the regression tripwire.

    Shape: one (type, bucket) aggregate with map-side combine, one
    type-level merge over the 20-row partial table, one direct
    aggregate for the comparison — the second scan exists only
    because the IDENTITY is the subject."""
    ev = _t(spark, sf_dir, "events")
    part = ev.groupBy(
        "event_type", (F.col("user_id") % 4).alias("bucket")
    ).agg(
        F.count(F.lit(1)).cast("double").alias("n"),
        F.avg("value").alias("m"),
        (F.var_pop("value") * F.count(F.lit(1))).alias("m2"),
    )
    merged = part.groupBy("event_type").agg(
        F.sum("n").alias("ng"),
        (F.sum(F.col("n") * F.col("m")) / F.sum("n")).alias("mean"),
    )
    m2m = (
        part.join(F.broadcast(merged), "event_type")
        .groupBy("event_type", "ng")
        .agg(
            (
                (
                    F.sum("m2")
                    + F.sum(
                        F.col("n") * (F.col("m") - F.col("mean")) * (F.col("m") - F.col("mean"))
                    )
                )
                / F.first("ng")
            ).alias("var_merged")
        )
        .select("event_type", "var_merged")
    )
    direct = ev.groupBy("event_type").agg(
        F.var_pop("value").alias("var_direct"),
        F.count(F.lit(1)).cast("bigint").alias("n_rows"),
    )
    return direct.join(m2m, "event_type").select(
        "event_type",
        "n_rows",
        F.round("var_direct", 6).alias("var_direct"),
        F.round("var_merged", 6).alias("var_merged"),
        (F.abs(F.col("var_direct") - F.col("var_merged")) < 1e-6).alias(
            "merge_exact"
        ),
    )


# ---------------------------------------------------------------------------
# ml_calibration_ece — reliability table + expected calibration error
# ---------------------------------------------------------------------------

_ECE_SQL = """
WITH m AS (SELECT AVG(o_totalprice) AS mu, STDDEV_POP(o_totalprice) AS sd
           FROM orders),
p AS (SELECT CASE WHEN o_orderstatus = 'F' THEN 1.0 ELSE 0.0 END AS y,
             1 / (1 + exp(-ROUND((o_totalprice - mu) / sd, 6))) AS prob
      FROM orders CROSS JOIN m),
b AS (SELECT least(9, CAST(floor(prob * 10) AS INTEGER)) AS bucket,
             CAST(COUNT(*) AS BIGINT) AS n,
             AVG(prob) AS conf, AVG(y) AS acc
      FROM p GROUP BY 1),
e AS (SELECT SUM(n * abs(acc - conf)) / SUM(n) AS ece FROM b)
SELECT bucket, n, ROUND(conf, 6) AS conf, ROUND(acc, 6) AS acc,
       ROUND(abs(acc - conf), 6) AS gap,
       ROUND((SELECT ece FROM e), 6) AS ece
FROM b
"""


@register("ml_calibration_ece", _ECE_SQL)
def ml_calibration_ece(spark, sf_dir):
    """Reliability table + expected calibration error for a logistic
    score (σ of the z-scored total price) against the F-status label
    — the calibration half of model evaluation that
    ml_confusion_metrics' threshold half doesn't cover. ECE is the
    n-weighted mean |accuracy − confidence| over 10 equal-width
    probability buckets (Naeini et al. 2015). The z-score is rounded
    at 6dp BEFORE the sigmoid so both engines bucket identical
    probabilities — the bucket edge is a floor, where an ulp of
    drift would otherwise flip a row's bucket.

    Shape: one moment aggregate (broadcast), one map-side score +
    bucket pass, one 10-row aggregate; ECE is a rollup of the bucket
    table."""
    o = _t(spark, sf_dir, "orders")
    m = o.agg(
        F.avg("o_totalprice").alias("mu"),
        F.stddev_pop("o_totalprice").alias("sd"),
    )
    p = o.crossJoin(F.broadcast(m)).select(
        F.when(F.col("o_orderstatus") == "F", 1.0).otherwise(0.0).alias("y"),
        (
            1
            / (
                1
                + F.exp(
                    -F.round((F.col("o_totalprice") - F.col("mu")) / F.col("sd"), 6)
                )
            )
        ).alias("prob"),
    )
    b = p.groupBy(
        F.least(F.lit(9), F.floor(F.col("prob") * 10).cast("int")).alias("bucket")
    ).agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.avg("prob").alias("conf"),
        F.avg("y").alias("acc"),
    )
    e = b.agg(
        (F.sum(F.col("n") * F.abs(F.col("acc") - F.col("conf"))) / F.sum("n")).alias(
            "ece"
        )
    )
    return b.crossJoin(F.broadcast(e)).select(
        "bucket",
        "n",
        F.round("conf", 6).alias("conf"),
        F.round("acc", 6).alias("acc"),
        F.round(F.abs(F.col("acc") - F.col("conf")), 6).alias("gap"),
        F.round("ece", 6).alias("ece"),
    )


# ---------------------------------------------------------------------------
# orders_customer_npv — discounted customer value
# ---------------------------------------------------------------------------

_NPV_RATE = 0.1  # annual discount rate

_NPV_SQL = f"""
WITH t0 AS (SELECT MIN(o_orderdate) AS d0 FROM orders),
cf AS (SELECT o_custkey,
              o_totalprice
                / pow(1 + {_NPV_RATE},
                      date_diff('day', d0, o_orderdate) / 365.0) AS pv
       FROM orders CROSS JOIN t0),
npv AS (SELECT o_custkey, CAST(COUNT(*) AS BIGINT) AS n_orders,
               ROUND(SUM(pv), 2) AS npv
        FROM cf GROUP BY 1)
SELECT o_custkey, n_orders, npv
FROM (SELECT *, ROW_NUMBER() OVER (ORDER BY npv DESC, o_custkey) AS rnk
      FROM npv)
WHERE rnk <= 50
"""


@register("orders_customer_npv", _NPV_SQL)
def orders_customer_npv(spark, sf_dir):
    """Top-50 customers by net present value: every order's total
    discounted back to the first order date at 10%/year (continuous
    day-resolution compounding — the standard CLV denominator),
    summed per customer. Complements orders_cohort_ltv (undiscounted
    cohort curves) with the time-value-correct ranking. Ranking is
    on the 2dp-ROUNDED npv with custkey tie-break (quantized-winner
    rule).

    Shape: one scalar min-date broadcast, one map-side discount, one
    per-customer aggregate, TakeOrdered top-50."""
    o = _t(spark, sf_dir, "orders")
    t0 = o.agg(F.min("o_orderdate").alias("d0"))
    cf = o.crossJoin(F.broadcast(t0)).select(
        "o_custkey",
        (
            F.col("o_totalprice")
            / F.pow(
                F.lit(1 + _NPV_RATE),
                F.datediff(F.col("o_orderdate"), F.col("d0")) / 365.0,
            )
        ).alias("pv"),
    )
    npv = cf.groupBy("o_custkey").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_orders"),
        F.round(F.sum("pv"), 2).alias("npv"),
    )
    return (
        npv.withColumn(
            "rnk",
            F.row_number().over(Window.orderBy(F.col("npv").desc(), "o_custkey")),
        )
        .filter(F.col("rnk") <= 50)
        .select("o_custkey", "n_orders", "npv")
    )
