"""Physical-plan assertions (SURVEY §4.2): the scale properties the
engine promises — pushdown, pruning, broadcast, top-k, partial
aggregation — must be visible in the optimized plan, not just hoped
for. These tests pin them so a refactor that silently de-optimizes a
query fails CI."""

from __future__ import annotations

import pytest

from stockify_spark.registry import QUERIES

SF_DIR = "/root/testdata/sf0.001"


def plan_of(spark, name: str, mode: str = "formatted") -> str:
    df = QUERIES[name](spark, SF_DIR)
    jmode = spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(mode)
    return df._jdf.queryExecution().explainString(jmode)


def test_filter_is_pushed_to_parquet_scan(spark):
    plan = plan_of(spark, "range_scan_price")
    pushed = [ln for ln in plan.splitlines() if "PushedFilters" in ln]
    assert pushed, plan
    assert "GreaterThanOrEqual(l_extendedprice" in pushed[0], pushed[0]


def test_scan_prunes_unused_columns(spark):
    """topk_orders touches 2 of 6 orders columns; the scan must read
    only those (ReadSchema shows the pruned struct)."""
    plan = plan_of(spark, "topk_orders")
    read_schema = [ln for ln in plan.splitlines() if "ReadSchema" in ln]
    assert read_schema, plan
    line = read_schema[0]
    assert "o_orderkey" in line and "o_totalprice" in line
    assert "o_orderdate" not in line and "o_custkey" not in line


def test_star_join_broadcasts_all_dimensions(spark):
    """join_star: customer/nation/region hops must be broadcast hash
    joins — a shuffle of the fact table per dimension would be the
    100 TB bottleneck."""
    plan = plan_of(spark, "join_star")
    assert plan.count("BroadcastHashJoin") >= 3, plan


def test_topk_avoids_global_sort(spark):
    plan = plan_of(spark, "topk_orders")
    assert "TakeOrderedAndProject" in plan, plan


def test_global_agg_is_partial_then_final(spark):
    """agg_stats must show two HashAggregate stages (partial map-side,
    final after exchange) — the reference's device-partial/host-final
    model (stockify.cu:498-501), emitted by Catalyst automatically."""
    plan = plan_of(spark, "agg_stats")
    assert plan.count("HashAggregate") >= 2, plan


def test_groupby_q1_uses_whole_stage_codegen(spark):
    """The scan→filter→partial-agg pipeline must fuse into generated
    code (one tight loop per batch), not interpreted operators. AQE is
    disabled for the assertion only — pre-execution, AdaptiveSparkPlan
    hides the codegen subtrees it will produce."""
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try:
        plan = plan_of(spark, "groupby_q1", mode="codegen")
    finally:
        spark.conf.set("spark.sql.adaptive.enabled", "true")
    assert "Found 0 WholeStageCodegen subtrees" not in plan
    assert "WholeStageCodegen" in plan, plan[:500]


def test_tpch_q6_pushes_all_predicates(spark):
    """Every Q6 predicate is scan-pushable; PushedFilters must carry
    the timestamp range and both numeric ranges."""
    plan = plan_of(spark, "tpch_q6")
    pushed = [ln for ln in plan.splitlines() if "PushedFilters" in ln]
    assert pushed, plan
    line = pushed[0]
    for col in ("l_shipdate", "l_discount", "l_quantity"):
        assert col in line, line


def test_semi_join_plans_as_semi_not_inner(spark):
    plan = plan_of(spark, "join_semi")
    assert "LeftSemi" in plan, plan


@pytest.mark.parametrize("name", ["window_partitioned_sum", "window_rank"])
def test_partitioned_windows_declare_partitioning(spark, name):
    """Partitioned window queries must not funnel to a single
    partition (the global-order hazard, SURVEY §7.4.1)."""
    plan = plan_of(spark, name, mode="simple")
    assert "partitionBy" not in plan or "Window" in plan
    # hashpartitioning on the declared keys, not SinglePartition
    assert "SinglePartition" not in plan, plan
