"""Round-8 extension wave 23: CHECK-constraint enforcement in the
txlog ACID format.

Delta-parity table constraints: a SQL predicate registered in the
commit log that every subsequent write must satisfy row-wise.
Enforcement costs one aggregate over the WRITE BATCH (never the
table); constraints survive log checkpoints (the collapse carries
metadata actions forward — caught by construction in
sources/txlog.checkpoint_log). The query's oracle proves the
REJECTION path: two violating appends are attempted and refused
during the build, and the final hash-checked state equals exactly
the accepted writes."""

from __future__ import annotations

from pyspark.sql import functions as F

from stockify_spark.registry import register, _t

_CHECK_SQL = """
SELECT (o_orderkey % 7)::BIGINT AS bucket, COUNT(*) AS n,
       ROUND(SUM(o_totalprice), 2) AS total
FROM orders GROUP BY 1
"""


@register("txlog_check_constraint", _CHECK_SQL)
def txlog_check_constraint(spark, sf_dir):
    """CHECK-constraint lifecycle: create the table, register
    o_totalprice > 0, append three valid quarters (one of them
    AFTER a log checkpoint — constraints must survive the
    collapse), and attempt TWO violating appends (negated prices)
    that must raise ConstraintViolation and leave no trace. The
    final snapshot equals all orders exactly — had either rejected
    write landed, the %4==2 bucket would double-count with negative
    prices and the value hash would break."""
    from stockify_spark.registry_ext7 import _scratch_table
    from stockify_spark.sources import txlog

    def build(path: str) -> None:
        o = _t(spark, sf_dir, "orders").select("o_orderkey", "o_totalprice")
        txlog.create(o.filter(F.col("o_orderkey") % 4 == 0), path)
        txlog.set_constraint(path, "positive_price", "o_totalprice > 0")
        txlog.append(o.filter(F.col("o_orderkey") % 4 == 1), path)
        bad = o.filter(F.col("o_orderkey") % 4 == 2).withColumn(
            "o_totalprice", -F.col("o_totalprice")
        )
        try:
            txlog.append(bad, path)
            raise AssertionError("violating append must be rejected")
        except txlog.ConstraintViolation:
            pass
        txlog.append(o.filter(F.col("o_orderkey") % 4 == 2), path)
        txlog.checkpoint_log(path)
        try:
            txlog.append(bad.limit(5), path)
            raise AssertionError(
                "constraint must survive the checkpoint collapse"
            )
        except txlog.ConstraintViolation:
            pass
        txlog.append(o.filter(F.col("o_orderkey") % 4 == 3), path)

    path = _scratch_table(sf_dir, "check", build)
    from stockify_spark.sources import txlog

    snap = txlog.snapshot(spark, path)
    return snap.groupBy(
        (F.col("o_orderkey") % 7).cast("long").alias("bucket")
    ).agg(
        F.count(F.lit(1)).alias("n"),
        F.round(F.sum("o_totalprice"), 2).alias("total"),
    )
