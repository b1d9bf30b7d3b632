"""Extension queries (SURVEY §7.6): group-by, joins, set ops, scalar
functions, streaming-equivalent windows, and the LLM-pipeline
operators. Registered into the same driver-contract registry as the
parity queries (see registry.py for the determinism conventions)."""

from __future__ import annotations

from pyspark.sql import functions as F

from stockify_spark.functions.text import (
    fingerprint,
    lang_id,
    quality_score,
    LANG_PROFILES,
)
from stockify_spark.llm.dedup import (
    exact_dedup,
    minhash_lsh_pairs,
    ngram_jaccard_pairs,
    simhash_near_dup_pairs,
)
from stockify_spark.llm.similarity import cosine_topk, embedding_dup_pairs
from stockify_spark.operators.aggregates import cube_agg, group_agg, rollup_agg
from stockify_spark.operators.joins import anti_join, asof_join, dim_join, fact_join, semi_join
from stockify_spark.operators.setops import except_, intersect, union_all
from stockify_spark.registry import register, _t
from stockify_spark.streaming.windows import tumbling_counts


# ---------------------------------------------------------------------------
# Group-by aggregation (SURVEY §7.6.1)
# ---------------------------------------------------------------------------

@register(
    "groupby_q1",
    "SELECT l_returnflag, l_linestatus, ROUND(SUM(l_quantity), 2) AS sum_qty,"
    " ROUND(SUM(l_extendedprice), 2) AS sum_base_price,"
    " ROUND(SUM(l_extendedprice * (1 - l_discount)), 2) AS sum_disc_price,"
    " ROUND(SUM(l_extendedprice * (1 - l_discount) * (1 + l_tax)), 2) AS sum_charge,"
    " ROUND(AVG(l_quantity), 6) AS avg_qty, ROUND(AVG(l_extendedprice), 6) AS avg_price,"
    " ROUND(AVG(l_discount), 6) AS avg_disc, COUNT(*) AS count_order"
    " FROM lineitem WHERE l_shipdate <= TIMESTAMP '2000-01-01'"
    " GROUP BY l_returnflag, l_linestatus",
)
def groupby_q1(spark, sf_dir):
    """TPC-H Q1 shape: the canonical scan→filter→partial-agg→final-agg
    pipeline; 8 aggregates share one shuffle keyed on a 6-value key."""
    li = _t(spark, sf_dir, "lineitem").filter(F.col("l_shipdate") <= F.lit("2000-01-01").cast("timestamp"))
    return group_agg(
        li,
        ["l_returnflag", "l_linestatus"],
        F.round(F.sum("l_quantity"), 2).alias("sum_qty"),
        F.round(F.sum("l_extendedprice"), 2).alias("sum_base_price"),
        F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2).alias("sum_disc_price"),
        F.round(
            F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount")) * (1 + F.col("l_tax"))), 2
        ).alias("sum_charge"),
        F.round(F.avg("l_quantity"), 6).alias("avg_qty"),
        F.round(F.avg("l_extendedprice"), 6).alias("avg_price"),
        F.round(F.avg("l_discount"), 6).alias("avg_disc"),
        F.count(F.lit(1)).alias("count_order"),
    )


@register(
    "groupby_month",
    "SELECT CAST(date_trunc('month', o_orderdate) AS DATE) AS order_month,"
    " COUNT(*) AS n_orders, ROUND(SUM(o_totalprice), 2) AS total"
    " FROM orders GROUP BY 1",
)
def groupby_month(spark, sf_dir):
    df = _t(spark, sf_dir, "orders")
    return group_agg(
        df.withColumn("order_month", F.to_date(F.date_trunc("month", "o_orderdate"))),
        ["order_month"],
        F.count(F.lit(1)).alias("n_orders"),
        F.round(F.sum("o_totalprice"), 2).alias("total"),
    )


@register(
    "groupby_having",
    "SELECT o_custkey, COUNT(*) AS n_orders, ROUND(SUM(o_totalprice), 2) AS spend"
    " FROM orders GROUP BY o_custkey HAVING COUNT(*) >= 15",
)
def groupby_having(spark, sf_dir):
    df = group_agg(
        _t(spark, sf_dir, "orders"),
        ["o_custkey"],
        F.count(F.lit(1)).alias("n_orders"),
        F.round(F.sum("o_totalprice"), 2).alias("spend"),
    )
    return df.filter(F.col("n_orders") >= 15)


@register(
    "groupby_rollup",
    "SELECT l_returnflag, l_linestatus, COUNT(*) AS n, ROUND(SUM(l_quantity), 2) AS sum_qty"
    " FROM lineitem GROUP BY ROLLUP(l_returnflag, l_linestatus)",
)
def groupby_rollup(spark, sf_dir):
    return rollup_agg(
        _t(spark, sf_dir, "lineitem"),
        ["l_returnflag", "l_linestatus"],
        F.count(F.lit(1)).alias("n"),
        F.round(F.sum("l_quantity"), 2).alias("sum_qty"),
    )


@register(
    "groupby_cube",
    "SELECT l_returnflag, l_linestatus, COUNT(*) AS n, ROUND(SUM(l_quantity), 2) AS sum_qty"
    " FROM lineitem GROUP BY CUBE(l_returnflag, l_linestatus)",
)
def groupby_cube(spark, sf_dir):
    return cube_agg(
        _t(spark, sf_dir, "lineitem"),
        ["l_returnflag", "l_linestatus"],
        F.count(F.lit(1)).alias("n"),
        F.round(F.sum("l_quantity"), 2).alias("sum_qty"),
    )


@register(
    "groupby_pivot",
    "SELECT l_returnflag,"
    " ROUND(SUM(CASE WHEN l_linestatus = 'O' THEN l_extendedprice END), 2) AS status_O,"
    " ROUND(SUM(CASE WHEN l_linestatus = 'F' THEN l_extendedprice END), 2) AS status_F"
    " FROM lineitem GROUP BY l_returnflag",
)
def groupby_pivot(spark, sf_dir):
    out = (
        _t(spark, sf_dir, "lineitem")
        .groupBy("l_returnflag")
        .pivot("l_linestatus", ["O", "F"])
        .agg(F.round(F.sum("l_extendedprice"), 2))
    )
    return out.select(
        "l_returnflag",
        F.col("O").alias("status_O"),
        F.col("F").alias("status_F"),
    )


@register(
    "agg_approx_distinct",
    # HLL estimates are engine-specific, so raw values can't hash-
    # match. Instead BOTH engines emit the exact cardinalities plus a
    # boolean asserting their own HLL estimate lands within 10% of
    # exact (5x the default rsd=0.05 — deterministic per engine, far
    # outside normal sketch variance). The comparison stays hash-
    # exact AND verifies each engine's sketch against ground truth.
    "SELECT COUNT(DISTINCT l_orderkey) AS n_orders,"
    " COUNT(DISTINCT l_partkey) AS n_parts,"
    " ABS(approx_count_distinct(l_orderkey) - COUNT(DISTINCT l_orderkey))"
    "  <= 0.1 * COUNT(DISTINCT l_orderkey) AS orders_estimate_ok,"
    " ABS(approx_count_distinct(l_partkey) - COUNT(DISTINCT l_partkey))"
    "  <= 0.1 * COUNT(DISTINCT l_partkey) AS parts_estimate_ok"
    " FROM lineitem",
)
def agg_approx_distinct(spark, sf_dir):
    """HyperLogLog distinct — the approximate path for 100 TB-scale
    cardinality (exact countDistinct is a full shuffle of the keys;
    the HLL sketch is a fixed-size map-side accumulator). The oracle
    checks tolerance-of-truth, not raw sketch values (see SQL)."""
    df = _t(spark, sf_dir, "lineitem")
    exact_o = F.countDistinct("l_orderkey")
    exact_p = F.countDistinct("l_partkey")
    approx_o = F.approx_count_distinct("l_orderkey")
    approx_p = F.approx_count_distinct("l_partkey")
    return df.agg(
        exact_o.alias("n_orders"),
        exact_p.alias("n_parts"),
        (F.abs(approx_o - exact_o) <= 0.1 * exact_o).alias("orders_estimate_ok"),
        (F.abs(approx_p - exact_p) <= 0.1 * exact_p).alias("parts_estimate_ok"),
    )


@register(
    "agg_percentile",
    "SELECT ROUND(median(l_extendedprice), 4) AS p50,"
    " ROUND(quantile_cont(l_extendedprice, 0.95), 4) AS p95 FROM lineitem",
)
def agg_percentile(spark, sf_dir):
    """Exact continuous percentiles (Spark ``percentile``; the scale
    path is percentile_approx — tested rows-only in tests)."""
    return _t(spark, sf_dir, "lineitem").agg(
        F.round(F.expr("percentile(l_extendedprice, 0.5)"), 4).alias("p50"),
        F.round(F.expr("percentile(l_extendedprice, 0.95)"), 4).alias("p95"),
    )


# ---------------------------------------------------------------------------
# Joins (SURVEY §7.6.2)
# ---------------------------------------------------------------------------

@register(
    "join_dim",
    "SELECT n_nationkey, n_name, r_name FROM nation JOIN region ON n_regionkey = r_regionkey",
)
def join_dim(spark, sf_dir):
    nation = _t(spark, sf_dir, "nation")
    region = _t(spark, sf_dir, "region")
    return dim_join(nation, region, nation["n_regionkey"] == region["r_regionkey"]).select(
        "n_nationkey", "n_name", "r_name"
    )


@register(
    "join_fact_agg",
    "SELECT o_orderpriority, ROUND(SUM(l_extendedprice * (1 - l_discount)), 2) AS revenue,"
    " COUNT(*) AS n_items FROM orders JOIN lineitem ON l_orderkey = o_orderkey"
    " GROUP BY o_orderpriority",
)
def join_fact_agg(spark, sf_dir):
    orders = _t(spark, sf_dir, "orders")
    li = _t(spark, sf_dir, "lineitem")
    joined = fact_join(li, orders, li["l_orderkey"] == orders["o_orderkey"])
    return group_agg(
        joined,
        ["o_orderpriority"],
        F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2).alias("revenue"),
        F.count(F.lit(1)).alias("n_items"),
    )


@register(
    "join_semi",
    "SELECT c_custkey, c_name FROM customer WHERE EXISTS"
    " (SELECT 1 FROM orders WHERE o_custkey = c_custkey)",
)
def join_semi(spark, sf_dir):
    customer = _t(spark, sf_dir, "customer")
    orders = _t(spark, sf_dir, "orders")
    return semi_join(customer, orders, customer["c_custkey"] == orders["o_custkey"]).select(
        "c_custkey", "c_name"
    )


@register(
    "join_anti",
    "SELECT c_custkey, c_name FROM customer WHERE NOT EXISTS"
    " (SELECT 1 FROM orders WHERE o_custkey = c_custkey)",
)
def join_anti(spark, sf_dir):
    customer = _t(spark, sf_dir, "customer")
    orders = _t(spark, sf_dir, "orders")
    return anti_join(customer, orders, customer["c_custkey"] == orders["o_custkey"]).select(
        "c_custkey", "c_name"
    )


@register(
    "join_star",
    "SELECT r_name, ROUND(SUM(l_extendedprice * (1 - l_discount)), 2) AS revenue"
    " FROM lineitem JOIN orders ON l_orderkey = o_orderkey"
    " JOIN customer ON o_custkey = c_custkey"
    " JOIN nation ON c_nationkey = n_nationkey"
    " JOIN region ON n_regionkey = r_regionkey"
    " GROUP BY r_name",
)
def join_star(spark, sf_dir):
    """Star-schema rollup: one shuffle join on the fact key, then
    broadcast hash joins for every dimension hop — the 100 TB plan is
    scan(lineitem) → SMJ orders → BHJ×3 → partial agg, no dimension
    shuffle anywhere."""
    li = _t(spark, sf_dir, "lineitem")
    orders = _t(spark, sf_dir, "orders")
    customer = _t(spark, sf_dir, "customer")
    nation = _t(spark, sf_dir, "nation")
    region = _t(spark, sf_dir, "region")
    joined = (
        fact_join(li, orders, li["l_orderkey"] == orders["o_orderkey"])
        .join(F.broadcast(customer), F.col("o_custkey") == customer["c_custkey"])
        .join(F.broadcast(nation), F.col("c_nationkey") == nation["n_nationkey"])
        .join(F.broadcast(region), F.col("n_regionkey") == region["r_regionkey"])
    )
    return group_agg(
        joined,
        ["r_name"],
        F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2).alias("revenue"),
    )


@register(
    "join_asof",
    "SELECT p.event_id, p.user_id, p.value, c.value AS asof_value"
    " FROM (SELECT * FROM events WHERE event_type = 'purchase') p"
    " ASOF LEFT JOIN (SELECT * FROM events WHERE event_type = 'click') c"
    " ON p.user_id = c.user_id AND p.ts >= c.ts",
)
def join_asof(spark, sf_dir):
    """As-of join (each purchase ↔ latest prior click per user) —
    composed from union + partitioned window (operators/joins.py);
    the oracle uses DuckDB's native ASOF JOIN."""
    events = _t(spark, sf_dir, "events")
    purchases = events.filter(F.col("event_type") == "purchase").select(
        "event_id", "user_id", "ts", "value"
    )
    clicks = events.filter(F.col("event_type") == "click").select("user_id", "ts", "value")
    out = asof_join(purchases, clicks, key="user_id", time_col="ts", right_value_cols=["value"])
    return out.select("event_id", "user_id", "value", "asof_value")


# ---------------------------------------------------------------------------
# Set operations (SURVEY §7.6.3)
# ---------------------------------------------------------------------------

@register(
    "setop_union_all",
    "SELECT o_orderkey, o_totalprice FROM orders WHERE o_orderstatus = 'F'"
    " UNION ALL SELECT o_orderkey, o_totalprice FROM orders WHERE o_orderstatus = 'O'",
)
def setop_union_all(spark, sf_dir):
    orders = _t(spark, sf_dir, "orders").select("o_orderkey", "o_totalprice", "o_orderstatus")
    f = orders.filter(F.col("o_orderstatus") == "F").drop("o_orderstatus")
    o = orders.filter(F.col("o_orderstatus") == "O").drop("o_orderstatus")
    return union_all(f, o)


@register(
    "setop_intersect",
    "SELECT c_custkey FROM customer WHERE c_mktsegment = 'BUILDING'"
    " INTERSECT SELECT o_custkey FROM orders",
)
def setop_intersect(spark, sf_dir):
    a = _t(spark, sf_dir, "customer").filter(F.col("c_mktsegment") == "BUILDING").select("c_custkey")
    b = _t(spark, sf_dir, "orders").select("o_custkey")
    return intersect(a, b)


@register(
    "setop_except",
    "SELECT c_custkey FROM customer WHERE c_mktsegment = 'BUILDING'"
    " EXCEPT SELECT o_custkey FROM orders",
)
def setop_except(spark, sf_dir):
    a = _t(spark, sf_dir, "customer").filter(F.col("c_mktsegment") == "BUILDING").select("c_custkey")
    b = _t(spark, sf_dir, "orders").select("o_custkey")
    return except_(a, b)


@register(
    "distinct_pairs",
    "SELECT DISTINCT l_returnflag, l_linestatus FROM lineitem",
)
def distinct_pairs(spark, sf_dir):
    return _t(spark, sf_dir, "lineitem").select("l_returnflag", "l_linestatus").distinct()


# ---------------------------------------------------------------------------
# Scalar function surface (SURVEY §7.6.4)
# ---------------------------------------------------------------------------

@register(
    "fn_date",
    "SELECT o_orderkey, CAST(year(o_orderdate) AS BIGINT) AS order_year,"
    " CAST(month(o_orderdate) AS BIGINT) AS order_month,"
    " CAST(day(o_orderdate) AS BIGINT) AS order_day,"
    " CAST(date_trunc('month', o_orderdate) AS DATE) AS month_start,"
    " CAST(date_diff('day', DATE '1995-01-01', CAST(o_orderdate AS DATE)) AS BIGINT) AS days_since"
    " FROM orders",
)
def fn_date(spark, sf_dir):
    df = _t(spark, sf_dir, "orders")
    d = F.col("o_orderdate")
    return df.select(
        "o_orderkey",
        F.year(d).cast("long").alias("order_year"),
        F.month(d).cast("long").alias("order_month"),
        F.dayofmonth(d).cast("long").alias("order_day"),
        F.to_date(F.date_trunc("month", d)).alias("month_start"),
        F.datediff(F.to_date(d), F.lit("1995-01-01").cast("date")).cast("long").alias("days_since"),
    )


@register(
    "fn_string",
    "SELECT p_partkey, UPPER(p_name) AS name_upper, CAST(LENGTH(p_name) AS BIGINT) AS name_len,"
    " SUBSTRING(p_name, 1, 5) AS name_prefix, CONCAT(p_brand, '#', p_type) AS brand_type,"
    " split_part(p_type, ' ', 1) AS type_head, p_name LIKE '%a%' AS has_a"
    " FROM part",
)
def fn_string(spark, sf_dir):
    df = _t(spark, sf_dir, "part")
    return df.select(
        "p_partkey",
        F.upper("p_name").alias("name_upper"),
        F.length("p_name").cast("long").alias("name_len"),
        F.substring("p_name", 1, 5).alias("name_prefix"),
        F.concat(F.col("p_brand"), F.lit("#"), F.col("p_type")).alias("brand_type"),
        F.split_part(F.col("p_type"), F.lit(" "), F.lit(1)).alias("type_head"),
        F.col("p_name").like("%a%").alias("has_a"),
    )


@register(
    "fn_json",
    "SELECT event_id, json_extract_string(props, '$.k') AS k_str,"
    " CAST(json_extract_string(props, '$.k') AS BIGINT) AS k_num FROM events",
)
def fn_json(spark, sf_dir):
    df = _t(spark, sf_dir, "events")
    k = F.get_json_object("props", "$.k")
    return df.select("event_id", k.alias("k_str"), k.cast("long").alias("k_num"))


@register(
    "fn_math",
    "SELECT l_orderkey, l_linenumber, ROUND(SQRT(l_extendedprice), 6) AS price_sqrt,"
    " ROUND(LN(l_extendedprice), 6) AS price_ln,"
    " ROUND(POWER(l_quantity, 2), 6) AS qty_sq,"
    " CAST(CEIL(l_discount * 100) AS BIGINT) AS disc_pct_ceil,"
    " CAST(l_orderkey % 7 AS BIGINT) AS key_mod,"
    " ROUND(ABS(l_discount - 0.05), 6) AS disc_dev FROM lineitem",
)
def fn_math(spark, sf_dir):
    df = _t(spark, sf_dir, "lineitem")
    return df.select(
        "l_orderkey",
        "l_linenumber",
        F.round(F.sqrt("l_extendedprice"), 6).alias("price_sqrt"),
        F.round(F.log("l_extendedprice"), 6).alias("price_ln"),
        F.round(F.pow("l_quantity", 2), 6).alias("qty_sq"),
        F.ceil(F.col("l_discount") * 100).cast("long").alias("disc_pct_ceil"),
        (F.col("l_orderkey") % 7).cast("long").alias("key_mod"),
        F.round(F.abs(F.col("l_discount") - 0.05), 6).alias("disc_dev"),
    )


@register(
    "fn_conditional",
    "SELECT c_custkey,"
    " CASE WHEN c_acctbal < 0 THEN 'negative' WHEN c_acctbal < 5000 THEN 'low'"
    " ELSE 'high' END AS balance_band,"
    " COALESCE(NULLIF(c_mktsegment, 'BUILDING'), 'OTHER') AS segment_or_other"
    " FROM customer",
)
def fn_conditional(spark, sf_dir):
    df = _t(spark, sf_dir, "customer")
    return df.select(
        "c_custkey",
        F.when(F.col("c_acctbal") < 0, "negative")
        .when(F.col("c_acctbal") < 5000, "low")
        .otherwise("high")
        .alias("balance_band"),
        F.coalesce(F.nullif(F.col("c_mktsegment"), F.lit("BUILDING")), F.lit("OTHER")).alias(
            "segment_or_other"
        ),
    )


@register(
    "fn_array",
    "SELECT vec_id, CAST(len(embedding) AS BIGINT) AS dim,"
    " ROUND(sqrt(list_sum(list_transform(embedding, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)))), 4) AS l2_norm,"
    " ROUND(CAST(embedding[1] AS DOUBLE), 6) AS first_component FROM embeddings",
)
def fn_array(spark, sf_dir):
    from stockify_spark.llm.similarity import norm

    df = _t(spark, sf_dir, "embeddings")
    return df.select(
        "vec_id",
        F.size("embedding").cast("long").alias("dim"),
        F.round(norm("embedding"), 4).alias("l2_norm"),
        F.round(F.col("embedding")[0].cast("double"), 6).alias("first_component"),
    )


# ---------------------------------------------------------------------------
# Streaming-equivalent windows (SURVEY §7.6.5) — the identical
# transformation runs under readStream in tests/test_streaming.py.
# ---------------------------------------------------------------------------

@register(
    "stream_tumbling_counts",
    "SELECT date_trunc('hour', ts) AS window_start, event_type, COUNT(*) AS n,"
    " ROUND(SUM(value), 6) AS sum_value FROM events GROUP BY 1, 2",
)
def stream_tumbling_counts(spark, sf_dir):
    return tumbling_counts(_t(spark, sf_dir, "events"), window="1 hour")


# ---------------------------------------------------------------------------
# LLM-pipeline operators (north star §7.6.6-7)
# ---------------------------------------------------------------------------

_TOKS_SQL = "string_split_regex(trim(lower(text)), '\\s+')"


@register(
    "dedup_exact",
    "SELECT md5(regexp_replace(trim(lower(text)), '\\s+', ' ', 'g')) AS fingerprint,"
    " MIN(doc_id) AS keeper_id, COUNT(*) AS n_copies FROM documents GROUP BY 1",
)
def dedup_exact(spark, sf_dir):
    return exact_dedup(_t(spark, sf_dir, "documents"), "text", "doc_id")


@register(
    "text_stats",
    f"WITH t AS (SELECT doc_id, {_TOKS_SQL} AS toks FROM documents)"
    " SELECT doc_id, CAST(len(toks) AS BIGINT) AS n_tokens,"
    " ROUND(list_sum(list_transform(toks, x -> CAST(length(x) AS DOUBLE))) / len(toks), 6)"
    " AS avg_token_len,"
    " ROUND(CAST(len(list_filter(toks,"
    " x -> x IN ('the','a','of','and','to','in','is','that','it','for'))) AS DOUBLE)"
    " / len(toks), 6) AS en_stopword_ratio FROM t",
)
def text_stats(spark, sf_dir):
    """r15: the token array is bound ONCE per row (the shingles()
    one-element-transform idiom) — composing token_count +
    avg_token_len + stopword_ratio re-ran the lower+trim+split chain
    5× per row (each helper evaluates its tokens() argument per
    reference; HOF lambdas get no cross-expression CSE). Identical
    arithmetic per statistic, so results are unchanged (oracled)."""
    from stockify_spark.functions.text import tokens

    df = _t(spark, sf_dir, "documents")
    sw = LANG_PROFILES["en"]

    def stats_of(ts):
        n = F.size(ts)
        return F.struct(
            n.cast("long").alias("n_tokens"),
            F.round(
                F.aggregate(
                    ts, F.lit(0).cast("double"), lambda acc, x: acc + F.length(x)
                )
                / n,
                6,
            ).alias("avg_token_len"),
            F.round(
                F.size(F.filter(ts, lambda x: x.isin(*sw))).cast("double") / n, 6
            ).alias("en_stopword_ratio"),
        )

    s = F.element_at(F.transform(F.array(tokens("text")), stats_of), 1)
    return df.select(
        "doc_id",
        s["n_tokens"].alias("n_tokens"),
        s["avg_token_len"].alias("avg_token_len"),
        s["en_stopword_ratio"].alias("en_stopword_ratio"),
    )


@register(
    "text_fingerprint",
    "SELECT doc_id, md5(regexp_replace(trim(lower(text)), '\\s+', ' ', 'g')) AS fingerprint"
    " FROM documents",
)
def text_fingerprint(spark, sf_dir):
    df = _t(spark, sf_dir, "documents")
    return df.select("doc_id", fingerprint("text").alias("fingerprint"))


@register(
    "doc_quality",
    f"SELECT doc_id, ROUND(LEAST(CAST(len({_TOKS_SQL}) AS DOUBLE) / 64.0, 1.0) *"
    f" (CASE WHEN list_sum(list_transform({_TOKS_SQL}, x -> CAST(length(x) AS DOUBLE)))"
    f" / len({_TOKS_SQL}) BETWEEN 2.0 AND 12.0 THEN 1.0 ELSE 0.5 END), 6) AS quality"
    " FROM documents",
)
def doc_quality(spark, sf_dir):
    df = _t(spark, sf_dir, "documents")
    return df.select("doc_id", quality_score("text").alias("quality"))


_IN = lambda words: "(" + ",".join(f"'{w}'" for w in words) + ")"  # noqa: E731
_LANG_COUNT = {
    lang: f"len(list_filter({_TOKS_SQL}, x -> x IN {_IN(sw)}))" for lang, sw in LANG_PROFILES.items()
}


@register(
    "lang_detect",
    "SELECT doc_id, CASE"
    f" WHEN {_LANG_COUNT['de']} > GREATEST({_LANG_COUNT['en']}, {_LANG_COUNT['es']}, {_LANG_COUNT['fr']}) THEN 'de'"
    f" WHEN {_LANG_COUNT['fr']} > GREATEST({_LANG_COUNT['en']}, {_LANG_COUNT['es']}) THEN 'fr'"
    f" WHEN {_LANG_COUNT['es']} > {_LANG_COUNT['en']} THEN 'es'"
    f" WHEN {_LANG_COUNT['en']} > 0 THEN 'en'"
    " ELSE 'unknown' END AS detected_lang FROM documents",
)
def lang_detect(spark, sf_dir):
    """Stopword-profile language heuristic; argmax with profile-order
    tie-break (the CASE in the oracle is the same argmax unrolled)."""
    df = _t(spark, sf_dir, "documents")
    return df.select("doc_id", lang_id("text").alias("detected_lang"))


_SHINGLES_SQL = (
    f"list_distinct(list_transform(range(greatest(len({_TOKS_SQL}) - 3, 0) + 1),"
    f" i -> array_to_string({_TOKS_SQL}[i + 1:i + 3], ' ')))"
)


@register(
    "dedup_ngram_jaccard",
    f"WITH s AS (SELECT doc_id, {_SHINGLES_SQL} AS sh FROM documents)"
    " SELECT a.doc_id AS id_a, b.doc_id AS id_b,"
    " ROUND(CAST(len(list_intersect(a.sh, b.sh)) AS DOUBLE)"
    " / len(list_distinct(list_concat(a.sh, b.sh))), 6) AS jaccard"
    " FROM s a JOIN s b ON a.doc_id < b.doc_id"
    " WHERE CAST(len(list_intersect(a.sh, b.sh)) AS DOUBLE)"
    " / len(list_distinct(list_concat(a.sh, b.sh))) >= 0.5",
)
def dedup_ngram_jaccard(spark, sf_dir):
    """Exact 3-gram Jaccard pairs >= 0.5 via inverted-index join; the
    oracle brute-forces all pairs, proving candidate recall is 1.0."""
    return ngram_jaccard_pairs(_t(spark, sf_dir, "documents"), "text", "doc_id", k=3, threshold=0.5)


def _minhash_oracle_sql(num_hashes: int = 32, bands: int = 16) -> str:
    """ANSI-SQL reproduction of minhash_lsh_pairs_seeded: the same
    (a_i, b_i) constants, the same md5-prefix base hash, the same
    band keys and exact-Jaccard verification — so the driver
    hash-checks which pairs band-collide AND verify."""
    from stockify_spark.llm.dedup import MINHASH_P, minhash_seed_constants

    a, b = minhash_seed_constants(num_hashes)
    r = num_hashes // bands
    mins = ", ".join(
        f"MIN(({a[i]} * hv + {b[i]}) % {MINHASH_P}) AS h{i}" for i in range(num_hashes)
    )
    bands_sql = " UNION ALL ".join(
        "SELECT doc_id, {b} AS band_id, CONCAT({key}) AS band_key FROM sig".format(
            b=bb,
            key=", ',', ".join(f"h{bb * r + j}" for j in range(r)),
        )
        for bb in range(bands)
    )
    return (
        f"WITH s AS (SELECT doc_id, {_SHINGLES_SQL} AS sh FROM documents),"
        " inv AS (SELECT doc_id, unnest(sh) AS tok FROM s),"
        " m AS (SELECT doc_id, CAST(CONCAT('0x', substr(md5(tok), 1, 15)) AS BIGINT)"
        f" % {MINHASH_P} AS hv FROM inv),"
        f" sig AS (SELECT doc_id, {mins} FROM m GROUP BY doc_id),"
        f" bands AS ({bands_sql}),"
        " cand AS (SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b FROM bands a"
        " JOIN bands b ON a.band_id = b.band_id AND a.band_key = b.band_key"
        " AND a.doc_id < b.doc_id)"
        " SELECT id_a, id_b,"
        " ROUND(CAST(len(list_intersect(sa.sh, sb.sh)) AS DOUBLE)"
        " / len(list_distinct(list_concat(sa.sh, sb.sh))), 6) AS jaccard"
        " FROM cand JOIN s sa ON sa.doc_id = id_a JOIN s sb ON sb.doc_id = id_b"
        " WHERE CAST(len(list_intersect(sa.sh, sb.sh)) AS DOUBLE)"
        " / len(list_distinct(list_concat(sa.sh, sb.sh))) >= 0.5",
    )[0]


@register("dedup_minhash_lsh", _minhash_oracle_sql())
def dedup_minhash_lsh(spark, sf_dir):
    """MinHash-LSH near-dup pairs, deterministic cross-engine hash
    family (md5-prefix base + seeded linear permutations): the LSH
    banding semantics are hash-exact-checked against the SQL oracle.
    The xxhash64-based minhash_lsh_pairs stays the library fast path;
    its banding recall vs exact Jaccard is pinned in tests."""
    from stockify_spark.llm.dedup import minhash_lsh_pairs_seeded

    return minhash_lsh_pairs_seeded(
        _t(spark, sf_dir, "documents"), "text", "doc_id", num_hashes=32, bands=16, jaccard_threshold=0.5
    )


def _simhash_oracle_sql(n_bits: int = 60, n_bands: int = 4, max_hamming: int = 10) -> str:
    """ANSI-SQL reproduction of simhash_near_dup_pairs_seeded: 60-bit
    md5-prefix token hashes, per-bit ±1 majority, 15-bit pigeonhole
    bands, bit_count(xor) verification — all integer arithmetic, so
    the comparison is hash-exact."""
    band_bits = n_bits // n_bands
    mask = (1 << band_bits) - 1
    accs = ", ".join(
        f"SUM(CASE WHEN (hv >> {b}) & 1 = 1 THEN 1 ELSE -1 END) AS a{b}"
        for b in range(n_bits)
    )
    sig = " + ".join(
        f"(CASE WHEN a{b} > 0 THEN CAST({1 << b} AS BIGINT) ELSE 0 END)"
        for b in range(n_bits)
    )
    bands = " UNION ALL ".join(
        f"SELECT doc_id, sig, {c} AS band_id, (sig >> {c * band_bits}) & {mask} AS band_val FROM sig"
        for c in range(n_bands)
    )
    return (
        "WITH toks AS (SELECT doc_id, unnest(string_split_regex(trim(lower(text)),"
        " '\\s+')) AS tok FROM documents),"
        " m AS (SELECT doc_id, CAST(CONCAT('0x', substr(md5(tok), 1, 15)) AS BIGINT)"
        " AS hv FROM toks),"
        f" acc AS (SELECT doc_id, {accs} FROM m GROUP BY doc_id),"
        f" sig AS (SELECT doc_id, {sig} AS sig FROM acc),"
        f" bands AS ({bands}),"
        " cand AS (SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b,"
        " a.sig AS sig_a, b.sig AS sig_b FROM bands a"
        " JOIN bands b ON a.band_id = b.band_id AND a.band_val = b.band_val"
        " AND a.doc_id < b.doc_id)"
        " SELECT id_a, id_b, CAST(bit_count(xor(sig_a, sig_b)) AS INTEGER) AS hamming"
        f" FROM cand WHERE bit_count(xor(sig_a, sig_b)) <= {max_hamming}"
    )


@register("dedup_simhash", _simhash_oracle_sql())
def dedup_simhash(spark, sf_dir):
    """SimHash near-dup pairs, SQL-expressible 60-bit md5-prefix
    signature: banding and hamming verification are hash-exact-
    checked against the oracle (llm/dedup.simhash_near_dup_pairs_
    seeded — pure column expressions). The vectorized blake2b
    simhash stays the library fast path, bit-exactness vs its scalar
    reference pinned in tests."""
    from stockify_spark.llm.dedup import simhash_near_dup_pairs_seeded

    return simhash_near_dup_pairs_seeded(
        _t(spark, sf_dir, "documents"), "text", "doc_id", max_hamming=10
    )


@register(
    "sim_cosine_topk",
    "WITH q AS (SELECT vec_id AS query_id, embedding AS qe FROM embeddings WHERE vec_id < 5),"
    " c AS (SELECT vec_id AS neighbor_id, embedding AS ne FROM embeddings)"
    " SELECT query_id, neighbor_id, rank FROM ("
    " SELECT query_id, neighbor_id, ROW_NUMBER() OVER (PARTITION BY query_id"
    " ORDER BY list_cosine_similarity(qe, ne) DESC, neighbor_id) AS rank"
    " FROM q, c WHERE query_id <> neighbor_id) WHERE rank <= 5",
)
def sim_cosine_topk(spark, sf_dir):
    """Brute-force cosine top-k, Arrow-batched scoring: the bounded
    query set broadcasts in the closure, every corpus batch emits its
    partial top-k, one tiny final window. Scores use the dimension-
    sequential accumulation, so they stay bit-identical to the
    oracle's ``list_cosine_similarity`` loop (the declarative
    ``cosine_topk`` HOF form remains the library baseline)."""
    from stockify_spark.llm.similarity import cosine_topk_batched

    emb = _t(spark, sf_dir, "embeddings")
    return cosine_topk_batched(emb, emb.filter(F.col("vec_id") < 5), k=5)


@register(
    "sim_embedding_dup",
    # Bucketed IVF near-dup: data-seeded centroids (vec_id < 16),
    # multi-probe top-3 cells, exact verify within shared cells. The
    # oracle reproduces the full candidate-generation spec, so the
    # comparison is a hash-exact check of the bucketed semantics —
    # not of an unscalable corpus-level all-pairs.
    "WITH c AS (SELECT vec_id AS cid, embedding AS cvec FROM embeddings WHERE vec_id < 16),"
    " s AS (SELECT vec_id, embedding, cid,"
    " ROW_NUMBER() OVER (PARTITION BY vec_id"
    " ORDER BY list_cosine_similarity(embedding, cvec) DESC, cid) AS rnk"
    " FROM embeddings CROSS JOIN c)"
    " SELECT DISTINCT a.vec_id AS id_a, b.vec_id AS id_b"
    " FROM (SELECT vec_id, embedding, cid FROM s WHERE rnk <= 3) a"
    " JOIN (SELECT vec_id, embedding, cid FROM s WHERE rnk <= 3) b"
    " ON a.cid = b.cid AND a.vec_id < b.vec_id"
    " WHERE list_cosine_similarity(a.embedding, b.embedding) >= 0.4",
)
def sim_embedding_dup(spark, sf_dir):
    """Corpus-level near-dup detection, bucketed (the 100 TB path):
    candidates from shared IVF cells, exact matmul verify per cell.
    The exact all-pairs form (embedding_dup_pairs/_blocked) remains
    the bounded-set verification baseline in tests."""
    from stockify_spark.llm.similarity import embedding_dup_pairs_bucketed

    return embedding_dup_pairs_bucketed(
        _t(spark, sf_dir, "embeddings"), threshold=0.4, n_centroids=16, n_probe=3
    )


@register(
    "sim_quantized_topk",
    # int8 symmetric quantization with half-up rounding is exactly
    # reproducible in SQL, and integer dot products are exact in
    # double (64 products <= 127^2 sum far below 2^53), so the
    # quantized ranking hash-matches across engines bit-for-bit.
    "WITH q8 AS (SELECT vec_id,"
    " [CAST(FLOOR(x * 127.0 / GREATEST(list_max(list_transform(embedding,"
    " y -> abs(y))), 1e-30) + 0.5) AS BIGINT) FOR x IN embedding] AS q"
    " FROM embeddings),"
    " qq AS (SELECT vec_id AS query_id, q AS qa FROM q8 WHERE vec_id < 5),"
    " cc AS (SELECT vec_id AS neighbor_id, q AS qb FROM q8)"
    " SELECT query_id, neighbor_id, rank FROM ("
    " SELECT query_id, neighbor_id, ROW_NUMBER() OVER (PARTITION BY query_id"
    " ORDER BY list_dot_product(qa, qb)"
    " / SQRT(list_dot_product(qa, qa) * list_dot_product(qb, qb)) DESC,"
    " neighbor_id) AS rank"
    " FROM qq, cc WHERE query_id <> neighbor_id) WHERE rank <= 5",
)
def sim_quantized_topk(spark, sf_dir):
    """int8-quantized brute-force ANN: 4x less scan traffic and
    integer inner products — the cheap first-pass ranker at corpus
    scale (float re-scoring of the short list follows). Quantized
    ranking recall vs float cosine is pinned in tests. Scoring is
    the Arrow-batched map-side-top-k form (exact integer math, so
    still hash-identical to the expression variant and the oracle)."""
    from stockify_spark.llm.similarity import quantized_topk_batched

    emb = _t(spark, sf_dir, "embeddings")
    return quantized_topk_batched(emb, emb.filter(F.col("vec_id") < 5), k=5)
