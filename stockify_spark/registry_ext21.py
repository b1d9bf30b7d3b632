"""Round-8 extension wave 10: temporal dimension joins, bivariate
rolling statistics, model evaluation, and peak detection.

The point-in-time SCD2 join is the canonical warehouse temporal
pattern (facts see the dimension version valid at event time — a
broadcast range join at any scale). Rolling correlation exploits the
ramp's integer-valued doubles: every windowed moment sum stays below
2^53 and is EXACT, so the correlation formula is deterministic with
no pins beyond display rounding. The confusion-matrix query EVALUATES
another registry operator (ml_naive_bayes) — composition as a
first-class pattern — and peak detection is the stateless
local-extremum window shape."""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F

from stockify_spark.registry import register, _t
from stockify_spark.registry_ext15 import _NB_SQL

_SCD2_DIM = """
dim AS (
  SELECT c_custkey, c_mktsegment, c_acctbal,
         DATE '1990-01-01' AS valid_from,
         CASE WHEN c_custkey % 10 < 3 THEN DATE '1995-06-01' END AS valid_to
  FROM customer
  UNION ALL
  SELECT c_custkey, c_mktsegment, c_acctbal + 100.0,
         DATE '1995-06-01', CAST(NULL AS DATE)
  FROM customer WHERE c_custkey % 10 < 3
)
"""

_PIT_SQL = f"""
WITH {_SCD2_DIM}
SELECT d.c_mktsegment AS segment, COUNT(*) AS n_orders,
       ROUND(SUM(o.o_totalprice), 2) AS revenue,
       ROUND(SUM(d.c_acctbal), 2) AS acctbal_at_order
FROM orders o
JOIN dim d ON d.c_custkey = o.o_custkey
          AND CAST(o.o_orderdate AS DATE) >= d.valid_from
          AND (d.valid_to IS NULL OR CAST(o.o_orderdate AS DATE) < d.valid_to)
GROUP BY 1
"""


@register("join_scd2_pointintime", _PIT_SQL)
def join_scd2_pointintime(spark, sf_dir):
    """Point-in-time join against a type-2 slowly-changing dimension:
    every order joins the customer VERSION valid at its order date
    (valid_from <= date < valid_to, open rows unbounded). Keys
    %10 < 3 carry two versions split at 1995-06-01 with the balance
    bumped +100 — so the summed balance-at-order-time proves the
    temporal matching, not just the key equi-join. Scale shape: the
    dimension (versions) broadcasts; the validity predicate rides
    the hash join as a residual filter — no range-explosion. Same
    dimension construction as merge_scd2_customers
    (operators/merge.merge_scd2)."""
    cust = _t(spark, sf_dir, "customer")
    dim_open = cust.select(
        "c_custkey",
        "c_mktsegment",
        "c_acctbal",
        F.lit("1990-01-01").cast("date").alias("valid_from"),
        F.when(F.col("c_custkey") % 10 < 3, F.lit("1995-06-01").cast("date")).alias(
            "valid_to"
        ),
    )
    dim_new = (
        cust.filter(F.col("c_custkey") % 10 < 3)
        .select(
            "c_custkey",
            "c_mktsegment",
            (F.col("c_acctbal") + 100.0).alias("c_acctbal"),
            F.lit("1995-06-01").cast("date").alias("valid_from"),
            F.lit(None).cast("date").alias("valid_to"),
        )
    )
    dim = dim_open.unionAll(dim_new)
    orders = _t(spark, sf_dir, "orders")
    od = F.col("o_orderdate").cast("date")
    j = orders.join(
        F.broadcast(dim),
        (F.col("c_custkey") == F.col("o_custkey"))
        & (od >= F.col("valid_from"))
        & (F.col("valid_to").isNull() | (od < F.col("valid_to"))),
    )
    return j.groupBy(F.col("c_mktsegment").alias("segment")).agg(
        F.count(F.lit(1)).alias("n_orders"),
        F.round(F.sum("o_totalprice"), 2).alias("revenue"),
        F.round(F.sum("c_acctbal"), 2).alias("acctbal_at_order"),
    )


_N_ROWS = 1800

_CORR_SQL = f"""
WITH stocks AS (
  SELECT i AS row_id, CAST(500 + (i % 18) * 10 AS DOUBLE) AS close,
         CAST(510 + (i % 18) * 10 AS DOUBLE)
           * CAST(440 + (i % 18) * 10 AS DOUBLE) AS hl
  FROM range({_N_ROWS}) t(i)
),
m AS (
  SELECT row_id,
         CAST(COUNT(*) OVER w AS DOUBLE) AS n,
         SUM(close) OVER w AS sx, SUM(hl) OVER w AS sy,
         SUM(close * hl) OVER w AS sxy,
         SUM(close * close) OVER w AS sxx,
         SUM(hl * hl) OVER w AS syy
  FROM stocks
  WINDOW w AS (ORDER BY row_id ROWS BETWEEN 29 PRECEDING AND CURRENT ROW)
)
SELECT row_id,
       CASE WHEN n * sxx - sx * sx = 0 OR n * syy - sy * sy = 0 THEN NULL
            ELSE ROUND((n * sxy - sx * sy)
                       / (sqrt(n * sxx - sx * sx) * sqrt(n * syy - sy * sy)),
                       6) END AS corr_30
FROM m
"""


@register("stocks_rolling_corr", _CORR_SQL)
def stocks_rolling_corr(spark, sf_dir):
    """Rolling 30-bar Pearson correlation of close vs the high·low
    product (QUADRATIC in the ramp position, so the pair is not
    collinear and the statistic is non-degenerate — volume would be
    affine in close and pin corr to 1). Every windowed moment sum is
    an integer-valued double below 2^53, so the sums are EXACT on both
    engines regardless of accumulation order and the correlation is
    deterministic by construction — the registry_ext17 integer-sum
    argument extended to bivariate window statistics. Zero-variance
    frames (the single-row first frame) are NULL-guarded
    identically. 1-part parity convention (stocks_atr)."""
    from stockify_spark.sources.fixtures import stocks_ramp

    s = stocks_ramp(spark, cycles=100).withColumn(
        "hl", F.col("high") * F.col("low")
    )
    w = Window.orderBy("row_id").rowsBetween(-29, 0)
    m = s.select(
        "row_id",
        F.count(F.lit(1)).over(w).cast("double").alias("n"),
        F.sum("close").over(w).alias("sx"),
        F.sum("hl").over(w).alias("sy"),
        F.sum(F.col("close") * F.col("hl")).over(w).alias("sxy"),
        F.sum(F.col("close") * F.col("close")).over(w).alias("sxx"),
        F.sum(F.col("hl") * F.col("hl")).over(w).alias("syy"),
    )
    c = F.col
    vx = c("n") * c("sxx") - c("sx") * c("sx")
    vy = c("n") * c("syy") - c("sy") * c("sy")
    corr = (c("n") * c("sxy") - c("sx") * c("sy")) / (F.sqrt(vx) * F.sqrt(vy))
    return m.select(
        "row_id",
        F.when((vx == 0) | (vy == 0), F.lit(None).cast("double"))
        .otherwise(F.round(corr, 6))
        .alias("corr_30"),
    )


_CONF_SQL = f"""
WITH nb AS ({_NB_SQL}),
truth AS (SELECT doc_id, lang FROM documents WHERE doc_id % 5 = 0),
j AS (
  SELECT t.lang AS true_lang, nb.pred_lang
  FROM truth t JOIN nb ON nb.doc_id = t.doc_id
),
per_true AS (
  SELECT true_lang, COUNT(*) AS support,
         CAST(SUM(CASE WHEN pred_lang = true_lang THEN 1 ELSE 0 END)
              AS BIGINT) AS tp
  FROM j GROUP BY true_lang
),
per_pred AS (
  SELECT pred_lang, COUNT(*) AS pred_n FROM j GROUP BY pred_lang
)
SELECT pt.true_lang AS lang, pt.support, pt.tp,
       COALESCE(pp.pred_n, 0) AS pred_n,
       ROUND(CASE WHEN COALESCE(pp.pred_n, 0) = 0 THEN 0.0
                  ELSE CAST(pt.tp AS DOUBLE) / pp.pred_n END, 6) AS precision,
       ROUND(CAST(pt.tp AS DOUBLE) / pt.support, 6) AS recall,
       ROUND(CASE WHEN COALESCE(pp.pred_n, 0) = 0 OR pt.tp = 0 THEN 0.0
                  ELSE 2.0 * (CAST(pt.tp AS DOUBLE) / pp.pred_n)
                        * (CAST(pt.tp AS DOUBLE) / pt.support)
                        / (CAST(pt.tp AS DOUBLE) / pp.pred_n
                           + CAST(pt.tp AS DOUBLE) / pt.support) END, 6) AS f1
FROM per_true pt LEFT JOIN per_pred pp ON pp.pred_lang = pt.true_lang
"""


@register("ml_confusion_metrics", _CONF_SQL)
def ml_confusion_metrics(spark, sf_dir):
    """Per-class precision/recall/F1 of the ml_naive_bayes
    classifier against the held-out truth — one registry operator
    EVALUATING another (the oracle inlines the full NB SQL as a
    CTE, so the composed pipeline is hash-checked end to end). All
    inputs are integer confusion counts; the metric divisions are
    identical rationals on both faces. Zero-prediction classes get
    precision/F1 pinned to 0."""
    from stockify_spark.registry_ext15 import ml_naive_bayes

    nb = ml_naive_bayes(spark, sf_dir).select("doc_id", "pred_lang")
    truth = (
        _t(spark, sf_dir, "documents")
        .filter(F.col("doc_id") % 5 == 0)
        .select("doc_id", F.col("lang").alias("true_lang"))
    )
    # j feeds BOTH confusion branches (per-true and per-pred); without
    # materialization each branch re-runs the full NB train+score
    # pipeline (plan census: 18 shuffles -> 10)
    j = truth.join(nb, "doc_id").localCheckpoint(eager=False)
    per_true = j.groupBy("true_lang").agg(
        F.count(F.lit(1)).alias("support"),
        F.sum(
            F.when(F.col("pred_lang") == F.col("true_lang"), 1).otherwise(0)
        ).alias("tp"),
    )
    per_pred = j.groupBy(F.col("pred_lang")).agg(F.count(F.lit(1)).alias("pred_n"))
    c = F.col
    out = per_true.join(
        per_pred, per_pred["pred_lang"] == per_true["true_lang"], "left"
    )
    pred_n = F.coalesce(c("pred_n"), F.lit(0))
    prec = F.when(pred_n == 0, F.lit(0.0)).otherwise(
        c("tp").cast("double") / c("pred_n")
    )
    rec = c("tp").cast("double") / c("support")
    f1 = F.when((pred_n == 0) | (c("tp") == 0), F.lit(0.0)).otherwise(
        2.0 * prec * rec / (prec + rec)
    )
    return out.select(
        c("true_lang").alias("lang"),
        "support",
        "tp",
        pred_n.alias("pred_n"),
        F.round(prec, 6).alias("precision"),
        F.round(rec, 6).alias("recall"),
        F.round(f1, 6).alias("f1"),
    )


_PEAK_SQL = f"""
WITH stocks AS (
  SELECT i AS row_id, CAST(500 + (i % 18) * 10 AS DOUBLE) AS close
  FROM range({_N_ROWS}) t(i)
),
n AS (
  SELECT row_id, close,
         lag(close) OVER w AS prev, lead(close) OVER w AS nxt,
         MIN(close) OVER (ORDER BY row_id
                          ROWS BETWEEN 8 PRECEDING AND 1 PRECEDING) AS lmin,
         MIN(close) OVER (ORDER BY row_id
                          ROWS BETWEEN 1 FOLLOWING AND 8 FOLLOWING) AS rmin
  FROM stocks WINDOW w AS (ORDER BY row_id)
)
SELECT row_id, close,
       ROUND(close - GREATEST(lmin, rmin), 6) AS prominence
FROM n
WHERE prev IS NOT NULL AND nxt IS NOT NULL
  AND close > prev AND close > nxt
"""


@register("window_peak_detection", _PEAK_SQL)
def window_peak_detection(spark, sf_dir):
    """Local-maximum detection with prominence: a peak is strictly
    above both neighbors (edge rows excluded by the explicit
    NOT-NULL gates, identical on both faces); prominence = height
    above the higher of the two flanking 8-bar minima. On the
    sawtooth this finds exactly the period tops (pos 17 mod 18).
    Stateless lag/lead + two one-sided frames — map-side per
    series at scale; 1-part parity convention here."""
    from stockify_spark.sources.fixtures import stocks_ramp

    s = stocks_ramp(spark, cycles=100)
    w = Window.orderBy("row_id")
    lw = Window.orderBy("row_id").rowsBetween(-8, -1)
    rw = Window.orderBy("row_id").rowsBetween(1, 8)
    n = s.select(
        "row_id",
        "close",
        F.lag("close").over(w).alias("prev"),
        F.lead("close").over(w).alias("nxt"),
        F.min("close").over(lw).alias("lmin"),
        F.min("close").over(rw).alias("rmin"),
    )
    return (
        n.filter(
            F.col("prev").isNotNull()
            & F.col("nxt").isNotNull()
            & (F.col("close") > F.col("prev"))
            & (F.col("close") > F.col("nxt"))
        )
        .select(
            "row_id",
            "close",
            F.round(
                F.col("close") - F.greatest("lmin", "rmin"), 6
            ).alias("prominence"),
        )
    )
