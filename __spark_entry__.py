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
# may budget-cap how many it checks per round (~50). Round-6 window:
# the 13 operators written this round lead (8 from registry_ext6 +
# the 5 derived-partsupp TPC-H queries — no driver evidence can
# exist yet), followed by the 39 round-5-landed queries that have
# never had a driver row (the r05 window was spent re-proving the
# regenerated-data vintage). 13 + 39 = 52 slightly overflows a
# 50-slot window, so the last ~2 of the round-5 set
# (basket_pairs, skyline_partitioned_parity) wait for r07 — new
# code outranks equally-unproven older code. Below the fold:
# stalest-evidence-first, the r07 rotation seed. The testdata
# regeneration before r05 (naive-micros timestamps → TIMESTAMP_NTZ)
# is why pre-r05 green rows are considered stale: that evidence ran
# against data that no longer exists.
_PRIORITY = [
    # --- new code round 6 session 2 (registry_ext6): BPE tokenizer
    # training, chunking, fuzzy R-S join, MG heavy hitters ---
    "tokenizer_bpe_merges", "doc_chunk_stride",
    "join_fuzzy_parts", "agg_heavy_hitters",
    "ml_kmeans_assign", "ml_linreg_group", "agg_exact_median",
    "stream_tws_profile",
    # --- TPC-H completion over derived partsupp (registry_ext7) ---
    "tpch_q2", "tpch_q9", "tpch_q11", "tpch_q16", "tpch_q20",
    # --- new code this round: Photo-JPEG MP4 container, PII
    # redaction, distinctive terms ---
    "media_mp4_index", "media_container_mp4",
    "pipeline_pii_redact", "text_tfidf_topk", "media_mp3_index",
    "graph_pagerank", "text_ngram_lm", "sim_pq_topk",
    # --- new code this round, wave 2 (registry_ext5): sessionize,
    # time-series windows, histogram/mode/unpivot/skyline, triangle
    # enumeration, normalization dedup, HLL sketch union ---
    "events_sessionize", "window_ewma", "window_drawdown",
    "agg_histogram", "agg_mode", "groupby_unpivot",
    "analytics_skyline", "graph_triangles", "text_normalize",
    "agg_sketch_union", "pipeline_line_dedup", "pipeline_source_mix",
    "pipeline_split_assign", "window_dist_stats", "merge_scd2_customers",
    "events_concurrency", "events_retention", "orders_rfm",
    "text_vocab_stats", "agg_quantile_cube", "graph_tree_depth",
    "agg_robust_stats", "agg_benford", "profile_columns", "dq_checks",
    "events_markov", "window_rolling_norm", "merge_incremental_agg",
    "events_latency_bands", "basket_pairs", "skyline_partitioned_parity",
    # --- session-2 small breadth (below the never-checked r05 set:
    # trivially-shaped, lower risk than leaving analytics unproven) ---
    "agg_group_median", "fn_bit_ops", "fn_variant", "txlog_lifecycle",
    "txlog_time_travel", "txlog_cdf", "txlog_skipping", "sample_weighted",
    # --- hard-broken by the data regeneration until the r06 fix ---
    "window_range_frame",
    # --- last green r02: evidence two data-vintages old ---
    "dedup_exact", "text_stats", "text_fingerprint", "doc_quality",
    "dedup_ngram_jaccard", "sim_cosine_topk", "sim_embedding_dup",
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
    # --- r03-green queries over the retyped timestamp columns ---
    "fn_date_arith", "groupby_time_rollup", "tpch_q10", "tpch_q12",
    "tpch_q15", "window_partitioned_parity",
    # --- r03-green remainder (r07 rotation seed) ---
    "window_ntile", "window_first_last", "fn_regexp",
    "setop_intersect_all", "setop_except_all", "setop_union_by_name",
    "text_bpe_tokens", "sim_ivf_topk", "media_features",
    "media_frame_plan", "media_decode_real", "media_sample_frames",
    "agg_stddev_corr", "agg_collect_ordered", "agg_percentile_approx",
    "fn_explode", "fn_posexplode", "fn_null_handling",
    "udf_group_zscore", "udf_scalar_pandas", "sim_lsh_topk",
    "text_winnow_fingerprints", "media_resize", "lang_detect",
    "dedup_minhash_lsh", "dedup_simhash", "filter_between_in_like",
    "setop_union_distinct", "sample_seeded", "sample_stratified",
    "fn_string2", "agg_bitwise_bool", "fn_crypto_hash",
    "stocks_filter_agg", "stocks_window_suite", "fn_trig",
    "fn_least_greatest", "agg_skew_kurt", "agg_sum_f32",
    "pipeline_token_pack", "doc_quality_gopher", "pipeline_contamination",
    "media_avi_index", "media_container_mjpeg",
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
