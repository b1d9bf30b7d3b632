"""Driver contract for the spark-graft builder (PySpark target).

The driver's verify runs ``entry(spark)`` as a smoke check, runs
each ``queries()[name]`` at sf=0.01 and compares it against the
matching ``oracle_sql()[name]`` via DuckDB (row-count + schema +
order-insensitive value-hash → CORRECTNESS_r{N}.json).

The real surface lives in ``stockify_spark.registry``; this module
stays a thin adapter.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

SMOKE_SF_DIR = "/root/testdata/sf0.001"


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query (SURVEY §7.1): scan → pushed-down filter →
    partial/final global aggregate — experiments 1.x + 2.a of the
    reference (stockify.cu:219-504) in one declarative plan."""
    lineitem = spark.read.parquet(f"{SMOKE_SF_DIR}/lineitem.parquet")
    return (
        lineitem.filter(F.col("l_extendedprice") >= 1000.0)
        .agg(
            F.round(F.sum("l_extendedprice"), 2).alias("sum_price"),
            F.min("l_quantity").alias("min_qty"),
            F.max("l_quantity").alias("max_qty"),
            F.count(F.lit(1)).alias("cnt"),
        )
    )


# Driver-facing order. The driver verifies queries in dict order and
# may budget-cap how many it checks per round (~50). Round-4 window
# policy (VERDICT r03 items 1+3): lead with the only two queries that
# have never held a green driver row — fn_array_ops (r03 ERR: raw
# array columns, now scalarized) and agg_approx_distinct (r01 ERR,
# fixed in r2, never re-windowed) — then refresh the 49 queries whose
# only green evidence is r01 (stalest-first refresh; the ten
# single-comparator filter probes sit at the window's edge since
# their pattern is proven by every sibling). After those 51 come the
# r02-green queries whose implementation was re-registered in r03
# (cosine Arrow scoring, ngram shuffle drop, embedding-dup probe) so
# correctness evidence postdates the last code change as windows
# permit.
_PRIORITY = [
    # --- never driver-green: must lead (VERDICT r03 item 1) ---
    "fn_array_ops", "agg_approx_distinct",
    # --- new in r4 (MJPEG-AVI container): new code needs driver
    # evidence more than proven-green r01 rows need refreshing ---
    "media_avi_index", "media_container_mjpeg",
    "agg_sum", "agg_min_max",
    "agg_stats", "agg_filtered", "agg_count_distinct", "window_moving_avg",
    "window_rolling_min", "window_rolling_max", "window_partitioned_sum", "window_running_total",
    "window_rank", "window_lag_lead", "topk_orders", "topk_per_group",
    "range_scan_price", "groupby_q1", "groupby_month", "groupby_having",
    "groupby_rollup", "groupby_cube", "groupby_pivot", "agg_percentile",
    "join_dim", "join_fact_agg", "join_semi", "join_anti",
    "join_star", "join_asof", "setop_union_all", "setop_intersect",
    "setop_except", "distinct_pairs", "fn_date", "fn_string",
    "fn_json", "fn_math", "fn_conditional", "fn_array",
    "stream_tumbling_counts", "filter_ge", "filter_gt", "filter_lt",
    "filter_le", "filter_eq", "filter_ne", "filter_and",
    "filter_or_not", "filter_empty", "filter_selection_vector",
    # --- r02-green but code re-registered in r03: evidence should
    # postdate the change ---
    "sim_cosine_topk", "dedup_ngram_jaccard", "sim_embedding_dup",
    # --- next-stalest (r02 evidence), in registration order ---
    "dedup_exact", "text_stats", "text_fingerprint", "doc_quality",
    "sim_quantized_topk", "subquery_scalar", "subquery_in",
    "subquery_correlated", "tpch_q6", "tpch_q3", "stream_sliding_counts",
    "stream_session_agg", "stream_dedup_keys", "groupby_grouping_sets",
    "stream_stateful_totals", "stream_interval_join", "join_left_outer",
    "join_full_outer", "join_cross", "tpch_q14", "tpch_q18",
    "pipeline_clean_corpus", "tpch_q5", "groupby_mom_change",
    "events_funnel", "tpch_q4", "tpch_q19", "tpch_q13", "tpch_q8",
    "tpch_q22", "merge_upsert_orders", "dedup_clusters", "tpch_q7",
    "tpch_q17", "tpch_q21", "dedup_embedding_clusters", "join_salted",
    "join_range_bucketed",
]


def _driver_order(d: dict) -> dict:
    head = [n for n in _PRIORITY if n in d]
    seen = set(head)
    rest = [n for n in d if n not in seen]
    # previously-green basics: keep meaning-dense ones ahead of the
    # ten single-comparator filter probes
    tail_last = [n for n in rest if n.startswith("filter_")]
    tail_first = [n for n in rest if not n.startswith("filter_")]
    return {n: d[n] for n in head + tail_first + tail_last}


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    from stockify_spark.registry import QUERIES

    return _driver_order(QUERIES)


def oracle_sql() -> dict[str, str]:
    from stockify_spark.registry import ORACLE

    return _driver_order(ORACLE)
