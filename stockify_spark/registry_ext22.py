"""Round-8 extension wave 11: stream-static enrichment, forecast
backtesting, backlog aging, and sketch mergeability.

The stream-static broadcast join is the one streaming shape the
suite didn't yet pin (dimension enrichment: static side broadcast
per micro-batch, only the windowed agg holds state — streaming face
verified in tests/test_streaming.py). The forecast backtest COMPOSES
orders_holt_forecast with the next observed actual (operator
composition, the ml_confusion_metrics pattern applied to
time-series). HLL mergeability is VERIFIED, not asserted: three
partition-built register sets max-merge to exactly the directly
built registers, the property that makes the sketch distributable."""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F

from stockify_spark.registry import register, _t
from stockify_spark.registry_ext16 import _HOLT_SQL

_ENRICH_SQL = """
WITH n AS (SELECT COUNT(*) AS nc FROM customer),
e AS (
  SELECT date_trunc('hour', ev.ts) AS window_start, c.c_mktsegment AS segment,
         ev.value
  FROM events ev
  CROSS JOIN n
  JOIN customer c ON c.c_custkey = ev.user_id % n.nc + 1
)
SELECT window_start, segment, COUNT(*) AS n,
       ROUND(SUM(value), 6) AS sum_value
FROM e GROUP BY 1, 2
"""


@register("stream_static_enrich", _ENRICH_SQL)
def stream_static_enrich(spark, sf_dir):
    """Batch face of the stream-static enrichment join (streaming
    face: streaming/windows.static_enrich with streaming=True,
    stream==batch equality pinned in tests/test_streaming.py):
    events take their segment from the static customer dimension via
    a broadcast join, then hourly tumbling count/sum per segment.
    The dimension stays out of streaming state — the standard
    enrichment topology at any scale."""
    from stockify_spark.streaming.windows import static_enrich

    ev = _t(spark, sf_dir, "events")
    cust = _t(spark, sf_dir, "customer")
    n_cust = cust.count()
    return static_enrich(ev, cust, n_cust, window="1 hour")


_FCEVAL_SQL = f"""
WITH holt AS ({_HOLT_SQL}),
rev AS (
  SELECT n.n_name AS nation,
         (year(o.o_orderdate) * 12 + month(o.o_orderdate)) AS ym,
         ROUND(SUM(o.o_totalprice), 2) AS z
  FROM orders o JOIN customer c ON c.c_custkey = o.o_custkey
  JOIN nation n ON n.n_nationkey = c.c_nationkey
  GROUP BY 1, 2
),
pos AS (
  SELECT nation, ym,
         row_number() OVER (PARTITION BY nation ORDER BY ym) - 1 AS pos, z
  FROM rev
),
j AS (
  SELECT h.nation, ABS(a.z - h.forecast_1) AS abs_err,
         ABS(a.z - h.forecast_1) / a.z AS ape
  FROM holt h
  JOIN pos p ON p.nation = h.nation AND p.ym = h.ym
  JOIN pos a ON a.nation = h.nation AND a.pos = p.pos + 1
)
SELECT nation, COUNT(*) AS n_evals,
       ROUND(AVG(abs_err), 4) AS mae,
       ROUND(AVG(ape), 6) AS mape
FROM j GROUP BY nation
"""


@register("orders_forecast_eval", _FCEVAL_SQL)
def orders_forecast_eval(spark, sf_dir):
    """One-step-ahead backtest of orders_holt_forecast: each month's
    forecast_1 is scored against the NEXT OBSERVED month's actual
    revenue (same row_number stepping as the recursion — gapped
    months pair with their successor, not a phantom calendar month).
    MAE and MAPE per nation. Forecasts enter at their published 6dp
    rounding and actuals at the 2dp pin, so both engines difference
    identical operands; the averages carry only benign sum-order
    drift absorbed by the output rounding. Composition of a registry
    operator with its own evaluation — the time-series counterpart
    of ml_confusion_metrics."""
    from stockify_spark.registry_ext16 import orders_holt_forecast

    holt = orders_holt_forecast(spark, sf_dir)
    orders = _t(spark, sf_dir, "orders")
    customer = _t(spark, sf_dir, "customer")
    nation = _t(spark, sf_dir, "nation")
    rev = (
        orders.join(customer, orders["o_custkey"] == customer["c_custkey"])
        .join(F.broadcast(nation), customer["c_nationkey"] == nation["n_nationkey"])
        .groupBy(
            F.col("n_name").alias("nation"),
            (F.year("o_orderdate") * 12 + F.month("o_orderdate")).alias("ym"),
        )
        .agg(F.round(F.sum("o_totalprice"), 2).alias("z"))
    )
    # pos feeds both the forecast-side and actual-side join branches;
    # materialize it so neither branch re-runs the 3-table aggregation
    pos = rev.withColumn(
        "pos",
        F.row_number().over(Window.partitionBy("nation").orderBy("ym")) - 1,
    ).localCheckpoint(eager=False)
    p = pos.select("nation", "ym", "pos")
    a = pos.select(
        "nation", F.col("pos").alias("apos"), F.col("z").alias("actual")
    )
    j = (
        holt.join(p, ["nation", "ym"])
        .join(a, (a["nation"] == holt["nation"]) & (F.col("apos") == F.col("pos") + 1))
        .select(
            holt["nation"].alias("nation"),
            F.abs(F.col("actual") - F.col("forecast_1")).alias("abs_err"),
            (F.abs(F.col("actual") - F.col("forecast_1")) / F.col("actual")).alias(
                "ape"
            ),
        )
    )
    return j.groupBy("nation").agg(
        F.count(F.lit(1)).alias("n_evals"),
        F.round(F.avg("abs_err"), 4).alias("mae"),
        F.round(F.avg("ape"), 6).alias("mape"),
    )


_AGING_SQL = """
WITH cutoff AS (SELECT MAX(CAST(o_orderdate AS DATE)) AS d FROM orders),
open_orders AS (
  SELECT o.o_orderstatus AS status,
         date_diff('day', CAST(o.o_orderdate AS DATE), a.d) AS age_days,
         o.o_totalprice
  FROM orders o CROSS JOIN cutoff a
  WHERE o.o_orderstatus <> 'F'
)
SELECT status,
       CASE WHEN age_days <= 365 THEN '0-1y'
            WHEN age_days <= 730 THEN '1-2y'
            ELSE '2y+' END AS age_bucket,
       COUNT(*) AS n_orders,
       ROUND(SUM(o_totalprice), 2) AS open_value
FROM open_orders
GROUP BY 1, 2
"""


@register("orders_backlog_aging", _AGING_SQL)
def orders_backlog_aging(spark, sf_dir):
    """Order-backlog aging: non-finalized orders bucketed by age in
    days as of the newest order date (the BI aging report). Integer
    day arithmetic on both faces (Spark datediff ≡ DuckDB
    date_diff('day')); the as-of scalar broadcasts."""
    orders = _t(spark, sf_dir, "orders")
    asof = orders.agg(F.max(F.col("o_orderdate").cast("date")).alias("d"))
    open_orders = (
        orders.filter(F.col("o_orderstatus") != "F")
        .crossJoin(F.broadcast(asof))
        .select(
            F.col("o_orderstatus").alias("status"),
            F.datediff(F.col("d"), F.col("o_orderdate").cast("date")).alias(
                "age_days"
            ),
            "o_totalprice",
        )
    )
    bucket = (
        F.when(F.col("age_days") <= 365, "0-1y")
        .when(F.col("age_days") <= 730, "1-2y")
        .otherwise("2y+")
    )
    return open_orders.groupBy("status", bucket.alias("age_bucket")).agg(
        F.count(F.lit(1)).alias("n_orders"),
        F.round(F.sum("o_totalprice"), 2).alias("open_value"),
    )


def _hll_reg_sql(src_filter: str) -> str:
    """Register CTE body for the md5-derived 64-register HLL over
    o_custkey rows passing ``src_filter``."""
    return (
        "SELECT hv % 64 AS bucket,"
        " MAX(CASE WHEN hv // 64 = 0 THEN 55"
        "      ELSE 55 - length(ltrim(bin(hv // 64), '0')) END) AS rho"
        " FROM (SELECT CAST(CONCAT('0x', substr(md5(CAST(o_custkey AS VARCHAR)),"
        " 1, 15)) AS BIGINT) AS hv"
        f" FROM orders WHERE {src_filter}) h GROUP BY hv % 64"
    )


_HLLM_SQL = f"""
WITH r0 AS ({_hll_reg_sql('o_orderkey % 3 = 0')}),
r1 AS ({_hll_reg_sql('o_orderkey % 3 = 1')}),
r2 AS ({_hll_reg_sql('o_orderkey % 3 = 2')}),
direct AS ({_hll_reg_sql('TRUE')}),
merged AS (
  SELECT bucket, MAX(rho) AS rho
  FROM (SELECT * FROM r0 UNION ALL SELECT * FROM r1 UNION ALL SELECT * FROM r2)
  GROUP BY bucket
),
cmp AS (
  SELECT COUNT(*) AS n_disagree
  FROM merged m FULL JOIN direct d ON d.bucket = m.bucket
  WHERE m.rho IS DISTINCT FROM d.rho
),
z AS (
  SELECT ROUND(SUM(POWER(2.0, -COALESCE(m.rho, 0))), 12) AS zsum
  FROM range(64) t(i) LEFT JOIN merged m ON m.bucket = i
)
SELECT CAST(64 AS BIGINT) AS n_registers,
       ROUND((0.7213 / (1.0 + 1.079 / 64.0)) * 64.0 * 64.0 / zsum, 4)
         AS merged_estimate,
       (SELECT n_disagree FROM cmp) AS registers_disagreeing
FROM z
"""


@register("agg_hll_merge", _HLLM_SQL)
def agg_hll_merge(spark, sf_dir):
    """HLL mergeability VERIFIED: three register sets built from
    disjoint thirds of orders max-merge into registers that must be
    IDENTICAL to the directly built whole-table registers
    (registers_disagreeing = 0) — the distributive property that
    lets each executor sketch its partition and a single reduce
    combine them at 100 TB. The merged estimate is recomputed from
    the merged registers (same estimator as agg_hll_sketch, no
    small-range branch needed at this cardinality)."""
    orders = _t(spark, sf_dir, "orders")

    def registers(src):
        h = src.select(
            F.conv(
                F.substring(F.md5(F.col("o_custkey").cast("string")), 1, 15), 16, 10
            )
            .cast("long")
            .alias("hv")
        )
        w = (F.col("hv") / 64).cast("long")
        rho = F.when(w == 0, F.lit(55)).otherwise(55 - F.length(F.bin(w)))
        return h.groupBy((F.col("hv") % 64).alias("bucket")).agg(
            F.max(rho).alias("rho")
        )

    parts = [
        registers(orders.filter(F.col("o_orderkey") % 3 == i)) for i in range(3)
    ]
    merged = (
        parts[0]
        .unionAll(parts[1])
        .unionAll(parts[2])
        .groupBy("bucket")
        .agg(F.max("rho").alias("rho"))
    )
    direct = registers(orders)
    disagree = (
        merged.alias("m")
        .join(direct.alias("d"), "bucket", "full")
        .filter(
            ~F.col("m.rho").eqNullSafe(F.col("d.rho"))
        )
        .count()
    )
    allreg = (
        orders.sparkSession.range(64)
        .select(F.col("id").alias("bucket"))
        .join(merged, "bucket", "left")
        .select(F.coalesce(F.col("rho"), F.lit(0)).alias("m"))
    )
    z = allreg.agg(
        F.round(F.sum(F.pow(F.lit(2.0), -F.col("m"))), 12).alias("zsum")
    )
    alpha_mm = (0.7213 / (1.0 + 1.079 / 64.0)) * 64.0 * 64.0
    return z.select(
        F.lit(64).cast("long").alias("n_registers"),
        F.round(alpha_mm / F.col("zsum"), 4).alias("merged_estimate"),
        F.lit(disagree).cast("long").alias("registers_disagreeing"),
    )
