"""Third extension wave: statistical aggregates, ordered collection
aggregates, array explode/unnest, additional date arithmetic, null
handling, and the pandas-UDF surface verified against a declarative
SQL oracle. Same determinism conventions as registry.py."""

from __future__ import annotations

import pandas as pd

from pyspark.sql import functions as F

from stockify_spark.registry import register, _t


# ---------------------------------------------------------------------------
# Statistical aggregates (§7.6.1 continued) — all one-pass partial/final.
# ---------------------------------------------------------------------------

@register(
    "agg_stddev_corr",
    "SELECT ROUND(stddev_samp(l_extendedprice), 4) AS price_sd,"
    " ROUND(stddev_pop(l_extendedprice), 4) AS price_sd_pop,"
    " ROUND(var_samp(l_quantity), 4) AS qty_var,"
    " ROUND(corr(l_extendedprice, l_quantity), 6) AS price_qty_corr,"
    " ROUND(covar_samp(l_extendedprice, l_quantity), 4) AS price_qty_cov"
    " FROM lineitem",
)
def agg_stddev_corr(spark, sf_dir):
    """Moment-based aggregates: Spark computes all of them with
    single-pass merge formulas (partial/final), no second scan."""
    li = _t(spark, sf_dir, "lineitem")
    return li.agg(
        F.round(F.stddev_samp("l_extendedprice"), 4).alias("price_sd"),
        F.round(F.stddev_pop("l_extendedprice"), 4).alias("price_sd_pop"),
        F.round(F.var_samp("l_quantity"), 4).alias("qty_var"),
        F.round(F.corr("l_extendedprice", "l_quantity"), 6).alias("price_qty_corr"),
        F.round(F.covar_samp("l_extendedprice", "l_quantity"), 4).alias("price_qty_cov"),
    )


@register(
    "agg_collect_ordered",
    "SELECT l_returnflag, string_agg(DISTINCT l_linestatus, ',' ORDER BY l_linestatus)"
    " AS statuses FROM lineitem GROUP BY l_returnflag",
)
def agg_collect_ordered(spark, sf_dir):
    """Ordered collection aggregate. collect_set is unordered by
    contract — sorting before joining makes the result deterministic
    (required for any differential check)."""
    li = _t(spark, sf_dir, "lineitem")
    return li.groupBy("l_returnflag").agg(
        F.array_join(F.array_sort(F.collect_set("l_linestatus")), ",").alias("statuses")
    )


@register(
    "agg_percentile_approx",
    # tolerance-of-truth oracle (the agg_approx_distinct pattern):
    # sketch estimates are engine-specific, so BOTH engines emit the
    # exact interpolated percentiles (rounded identically) plus a
    # boolean asserting their OWN sketch lands within 2% of exact —
    # hash-exact comparison that still verifies each engine's sketch
    # against ground truth.
    "SELECT ROUND(median(l_extendedprice), 4) AS p50_exact,"
    " ROUND(quantile_cont(l_extendedprice, 0.95), 4) AS p95_exact,"
    " ABS(approx_quantile(l_extendedprice, 0.5) - median(l_extendedprice))"
    "  <= 0.02 * median(l_extendedprice) AS p50_estimate_ok,"
    " ABS(approx_quantile(l_extendedprice, 0.95) - quantile_cont(l_extendedprice, 0.95))"
    "  <= 0.02 * quantile_cont(l_extendedprice, 0.95) AS p95_estimate_ok"
    " FROM lineitem",
)
def agg_percentile_approx(spark, sf_dir):
    """The 100 TB percentile path: a mergeable quantile sketch
    (single pass, bounded memory) instead of the exact sort-based
    percentile. The oracle checks tolerance-of-truth — exact
    percentiles hash-match, each engine's sketch is asserted within
    2% of its exact value (error bound also pinned in
    tests/test_aggregates.py)."""
    li = _t(spark, sf_dir, "lineitem")
    exact50 = F.expr("percentile(l_extendedprice, 0.5)")
    exact95 = F.expr("percentile(l_extendedprice, 0.95)")
    approx50 = F.percentile_approx("l_extendedprice", F.lit(0.5), F.lit(10000))
    approx95 = F.percentile_approx("l_extendedprice", F.lit(0.95), F.lit(10000))
    return li.agg(
        F.round(exact50, 4).alias("p50_exact"),
        F.round(exact95, 4).alias("p95_exact"),
        (F.abs(approx50 - exact50) <= 0.02 * exact50).alias("p50_estimate_ok"),
        (F.abs(approx95 - exact95) <= 0.02 * exact95).alias("p95_estimate_ok"),
    )


# ---------------------------------------------------------------------------
# Array explode / unnest (§7.6.4 continued).
# ---------------------------------------------------------------------------

@register(
    "fn_explode",
    "SELECT doc_id, unnest(string_split_regex(trim(lower(text)), '\\s+')) AS token"
    " FROM documents WHERE doc_id < 50",
)
def fn_explode(spark, sf_dir):
    """Row-generating explode: one output row per token. The scale
    note is explode-early-project-late — explode only the columns the
    downstream needs, or row width multiplies by fan-out."""
    from stockify_spark.functions.text import tokens

    docs = _t(spark, sf_dir, "documents").filter(F.col("doc_id") < 50)
    return docs.select("doc_id", F.explode(tokens("text")).alias("token"))


@register(
    "fn_posexplode",
    "SELECT doc_id, CAST(generate_subscripts(string_split_regex(trim(lower(text)), '\\s+'), 1) - 1"
    " AS INT) AS pos, unnest(string_split_regex(trim(lower(text)), '\\s+')) AS token"
    " FROM documents WHERE doc_id < 50",
)
def fn_posexplode(spark, sf_dir):
    from stockify_spark.functions.text import tokens

    docs = _t(spark, sf_dir, "documents").filter(F.col("doc_id") < 50)
    return docs.select("doc_id", F.posexplode(tokens("text")).alias("pos", "token"))


# ---------------------------------------------------------------------------
# Date arithmetic beyond fn_date (§7.6.4 continued).
# ---------------------------------------------------------------------------

@register(
    "fn_date_arith",
    "SELECT o_orderkey,"
    " CAST(o_orderdate AS DATE) + INTERVAL 30 DAY AS due_date,"
    " last_day(CAST(o_orderdate AS DATE)) AS month_end,"
    # DuckDB dayofweek is 0-based (Sun=0); Spark's is 1-based (Sun=1)
    " CAST(dayofweek(o_orderdate) + 1 AS INT) AS dow,"
    " CAST(quarter(o_orderdate) AS INT) AS qtr,"
    " ROUND((CAST(epoch_ms(TIMESTAMP '2000-06-15') AS DOUBLE)"
    "  - CAST(epoch_ms(o_orderdate) AS DOUBLE)) / 86400000.0, 6) AS days_to_y2k5"
    " FROM orders",
)
def fn_date_arith(spark, sf_dir):
    df = _t(spark, sf_dir, "orders")
    d = F.to_date("o_orderdate")
    return df.select(
        "o_orderkey",
        F.date_add(d, 30).cast("timestamp").alias("due_date"),
        F.last_day(d).alias("month_end"),
        F.dayofweek("o_orderdate").cast("int").alias("dow"),
        F.quarter("o_orderdate").cast("int").alias("qtr"),
        F.round(
            (
                F.unix_millis(F.lit("2000-06-15").cast("timestamp"))
                # parquet gives TIMESTAMP_NTZ; cast to LTZ (session is
                # UTC) for the epoch-millis arithmetic
                - F.unix_millis(F.col("o_orderdate").cast("timestamp"))
            ).cast("double")
            / 86400000.0,
            6,
        ).alias("days_to_y2k5"),
    )


@register(
    "fn_null_handling",
    "SELECT c_custkey,"
    " COALESCE(NULLIF(c_acctbal, 0.0), -1.0) AS bal_or_sentinel,"
    " NULLIF(c_mktsegment, 'BUILDING') IS NULL AS is_building,"
    " ifnull(NULLIF(c_name, c_name), 'redacted') AS always_redacted"
    " FROM customer",
)
def fn_null_handling(spark, sf_dir):
    """NULL algebra (absent from the reference — NULLs do not exist
    there, SURVEY §1.1): nullif/coalesce/ifnull/isnull compose the
    three-valued logic the engine inherits from Spark SQL."""
    df = _t(spark, sf_dir, "customer")
    return df.select(
        "c_custkey",
        F.coalesce(F.nullif(F.col("c_acctbal"), F.lit(0.0)), F.lit(-1.0)).alias(
            "bal_or_sentinel"
        ),
        F.isnull(F.nullif(F.col("c_mktsegment"), F.lit("BUILDING"))).alias("is_building"),
        F.ifnull(F.nullif(F.col("c_name"), F.col("c_name")), F.lit("redacted")).alias(
            "always_redacted"
        ),
    )


# ---------------------------------------------------------------------------
# The pandas-UDF surface (§7.6.7), verified against a declarative
# oracle: the blessed extension mechanism must produce the same
# numbers as the pure-SQL formulation.
# ---------------------------------------------------------------------------

@register(
    "udf_group_zscore",
    "SELECT event_id, user_id, ROUND((value - avg_v) / NULLIF(sd_v, 0), 6) AS zscore"
    " FROM (SELECT event_id, user_id, value,"
    " AVG(value) OVER (PARTITION BY user_id) AS avg_v,"
    " stddev_samp(value) OVER (PARTITION BY user_id) AS sd_v FROM events)",
)
def udf_group_zscore(spark, sf_dir):
    """Per-user z-score via applyInPandas (grouped-map pandas UDF).
    Deliberately also expressible as a window — the oracle runs that
    formulation, proving the Arrow batch path computes identically.
    The UDF shape is the template for logic that ISN'T expressible
    declaratively (model scoring, tokenizers, custom sketches)."""
    ev = _t(spark, sf_dir, "events").select("event_id", "user_id", "value")

    def zscore(pdf: pd.DataFrame) -> pd.DataFrame:
        sd = pdf["value"].std(ddof=1)
        mean = pdf["value"].mean()
        z = (pdf["value"] - mean) / sd if sd and sd == sd else pd.Series([None] * len(pdf))
        return pd.DataFrame(
            {"event_id": pdf["event_id"], "user_id": pdf["user_id"], "zscore": z.round(6)}
        )

    return ev.groupBy("user_id").applyInPandas(
        zscore, "event_id bigint, user_id bigint, zscore double"
    )


@register(
    "udf_scalar_pandas",
    "SELECT l_orderkey, l_linenumber,"
    " ROUND(l_extendedprice * (1 - l_discount) * (1 + l_tax), 6) AS charge"
    " FROM lineitem WHERE l_quantity >= 40",
)
def udf_scalar_pandas(spark, sf_dir):
    """Scalar pandas UDF (Arrow-vectorized) vs the identical column
    expression in the oracle — same IEEE ops, same order, exact match.
    In production prefer the built-in expression (stays in codegen);
    this entry pins that the UDF boundary itself is lossless."""
    from pyspark.sql import types as T

    @F.pandas_udf(T.DoubleType())
    def charge(price: pd.Series, disc: pd.Series, tax: pd.Series) -> pd.Series:
        return (price * (1 - disc) * (1 + tax)).round(6)

    li = _t(spark, sf_dir, "lineitem").filter(F.col("l_quantity") >= 40)
    return li.select(
        "l_orderkey",
        "l_linenumber",
        charge("l_extendedprice", "l_discount", "l_tax").alias("charge"),
    )


@register(
    "sim_lsh_topk",
    # Deterministic data-seeded hyperplane LSH (the seeded-IVF
    # recipe): planes are the first 48 vectors by id, buckets are the
    # packed sign bits of the dot products (8 planes x 6 tables),
    # candidates share ANY (table, bucket) with the query and are
    # exactly rescored — the whole approximate spec is ANSI SQL, so
    # the oracle hash-checks the LSH semantics themselves. (The
    # random-plane lsh_topk stays the library path; planted-dup
    # recall pinned in tests.)
    "WITH p AS (SELECT vec_id AS pid, embedding AS pvec FROM embeddings WHERE vec_id < 48),"
    " bits AS (SELECT e.vec_id, pid // 8 AS tbl, pid % 8 AS plane,"
    " CASE WHEN list_dot_product(e.embedding, pvec) > 0 THEN 1 ELSE 0 END AS bit"
    " FROM embeddings e CROSS JOIN p),"
    " bkt AS (SELECT vec_id, tbl, CAST(SUM(bit * (1 << CAST(plane AS INTEGER))) AS BIGINT)"
    " AS bucket FROM bits GROUP BY vec_id, tbl),"
    " qb AS (SELECT vec_id AS query_id, tbl, bucket FROM bkt WHERE vec_id < 5),"
    " cand AS (SELECT DISTINCT query_id, bkt.vec_id AS neighbor_id"
    " FROM qb JOIN bkt USING (tbl, bucket) WHERE bkt.vec_id <> query_id),"
    " qv AS (SELECT vec_id AS query_id, embedding AS qe FROM embeddings WHERE vec_id < 5),"
    " cv AS (SELECT vec_id AS neighbor_id, embedding AS ne FROM embeddings)"
    " SELECT query_id, neighbor_id, rank FROM ("
    " SELECT query_id, neighbor_id, ROW_NUMBER() OVER (PARTITION BY query_id"
    " ORDER BY list_cosine_similarity(qe, ne) DESC, neighbor_id) AS rank"
    " FROM cand JOIN qv USING (query_id) JOIN cv USING (neighbor_id)) WHERE rank <= 5",
)
def sim_lsh_topk(spark, sf_dir):
    """Hyperplane LSH ANN, deterministic data-seeded spec: bucket
    keys are sign bits against the first 48 corpus vectors, so the
    candidate rule is SQL-nameable and oracle-checked hash-exact.
    One map-side pass (llm/similarity.seeded_lsh_topk); the
    random-plane lsh_topk remains the library operator."""
    from stockify_spark.llm.similarity import seeded_lsh_topk

    emb = _t(spark, sf_dir, "embeddings")
    return seeded_lsh_topk(
        emb, emb.filter(F.col("vec_id") < 5), k=5, n_planes=8, n_tables=6
    )


@register(
    "stream_interval_join",
    "SELECT p.event_id AS purchase_id, p.user_id, c.event_id AS click_id"
    " FROM (SELECT * FROM events WHERE event_type = 'purchase') p"
    " JOIN (SELECT * FROM events WHERE event_type = 'click') c"
    " ON p.user_id = c.user_id AND c.ts <= p.ts"
    " AND c.ts >= p.ts - INTERVAL '30 minutes'",
)
def stream_interval_join(spark, sf_dir):
    """Batch face of the stream-stream interval join
    (streaming/windows.purchases_with_recent_clicks); the streaming
    path with watermark-bounded state converges to this exact result
    (tests/test_streaming.py)."""
    from stockify_spark.streaming.windows import purchases_with_recent_clicks

    return purchases_with_recent_clicks(_t(spark, sf_dir, "events"))


@register(
    "text_winnow_fingerprints",
    # Exact cross-engine oracle: the md5-prefix 60-bit gram hash (the
    # MinHash/SimHash family, llm/dedup.py:141) is nameable in ANSI
    # SQL, so DuckDB reproduces every fingerprint VALUE — k-grams via
    # unnest(range(..)) (Spark's sequence() is inclusive-end, range()
    # is exclusive-end, hence the +1), min over the same 4-gram
    # sliding window, distinct. regexp_replace needs the 'g' flag in
    # DuckDB (global is Spark's default).
    "WITH n AS (SELECT doc_id,"
    "  regexp_replace(trim(lower(text)), '\\s+', ' ', 'g') AS t"
    "  FROM documents WHERE doc_id < 100),"
    " g AS (SELECT doc_id, t,"
    "  unnest(range(0, greatest(length(t) - 5, 0) + 1)) AS pos FROM n),"
    " h AS (SELECT doc_id, pos,"
    "  CAST(CONCAT('0x', substr(md5(substr(t, CAST(pos AS INT) + 1, 5)), 1, 15))"
    "   AS BIGINT) AS h FROM g),"
    " k AS (SELECT doc_id, min(h) OVER (PARTITION BY doc_id ORDER BY pos"
    "  ROWS BETWEEN CURRENT ROW AND 3 FOLLOWING) AS fingerprint FROM h)"
    " SELECT DISTINCT doc_id, fingerprint FROM k",
)
def text_winnow_fingerprints(spark, sf_dir):
    """Winnowing (MOSS) rolling-hash fingerprints: min k-gram hash per
    sliding window, distinct per doc. Uses the cross-engine md5-prefix
    hash family so the oracle checks every fingerprint value exactly
    (the xxhash64 family in functions/text.py is the faster JVM-only
    production alternative); the containment properties (identical
    docs → identical sets; shared substrings → shared fingerprints)
    are pinned in tests/test_text.py."""
    from stockify_spark.functions.text import winnow_fingerprints

    docs = _t(spark, sf_dir, "documents").filter(F.col("doc_id") < 100)
    return winnow_fingerprints(docs, "text", "doc_id", hash_family="md5")


@register(
    "media_resize",
    # Exact row-set oracle: only image rows (id ≡ 0 mod 3) may appear
    # — the filter-before-decode contract — and every one resizes to
    # the 32×24 target.
    "SELECT 3 * r AS media_id, 32 AS width, 24 AS height FROM range(32) t(r)",
)
def media_resize(spark, sf_dir):
    """Image resize plumbing over mapInPandas (decode stubbed; the
    non-image rows are filtered BEFORE any payload deserialization)."""
    from stockify_spark.llm.multimodal import resize_images, synthetic_media

    return resize_images(synthetic_media(spark, n=96)).select("media_id", "width", "height")


# ---------------------------------------------------------------------------
# Remaining join types and filter predicates (completing the algebra).
# ---------------------------------------------------------------------------

@register(
    "join_left_outer",
    "SELECT c_custkey, o_orderkey, o_totalprice FROM customer"
    " LEFT JOIN (SELECT * FROM orders WHERE o_totalprice >= 400000) o"
    " ON c_custkey = o_custkey",
)
def join_left_outer(spark, sf_dir):
    """Left outer: unmatched customers survive with null order cols —
    same broadcast shape as the inner dim join (null-extension is free
    in the hash join)."""
    cust = _t(spark, sf_dir, "customer")
    big = _t(spark, sf_dir, "orders").filter(F.col("o_totalprice") >= 400000)
    return cust.join(
        F.broadcast(big), cust["c_custkey"] == big["o_custkey"], "left"
    ).select("c_custkey", "o_orderkey", "o_totalprice")


@register(
    "join_full_outer",
    "SELECT a.k AS k_a, b.k AS k_b FROM"
    " (SELECT DISTINCT o_custkey AS k FROM orders WHERE o_orderstatus = 'F') a"
    " FULL OUTER JOIN"
    " (SELECT DISTINCT o_custkey AS k FROM orders WHERE o_orderstatus = 'O') b"
    " ON a.k = b.k",
)
def join_full_outer(spark, sf_dir):
    """Full outer join (shuffle on both sides — broadcast can't
    null-extend the broadcast side, so Catalyst plans SMJ)."""
    orders = _t(spark, sf_dir, "orders")
    a = orders.filter(F.col("o_orderstatus") == "F").select(
        F.col("o_custkey").alias("k")
    ).distinct()
    b = orders.filter(F.col("o_orderstatus") == "O").select(
        F.col("o_custkey").alias("k")
    ).distinct()
    return a.join(b, a["k"] == b["k"], "full").select(
        a["k"].alias("k_a"), b["k"].alias("k_b")
    )


@register(
    "join_cross",
    "SELECT r_name, n_name FROM region CROSS JOIN nation",
)
def join_cross(spark, sf_dir):
    """Explicit cartesian product — legitimate only when one side is
    tiny (broadcast nested loop); the planner requires the explicit
    crossJoin call, which is the API's scale guardrail."""
    region = _t(spark, sf_dir, "region").select("r_name")
    nation = _t(spark, sf_dir, "nation").select("n_name")
    return region.crossJoin(F.broadcast(nation))


@register(
    "filter_between_in_like",
    "SELECT l_orderkey, l_linenumber FROM lineitem"
    " WHERE l_quantity BETWEEN 10 AND 20 AND l_returnflag IN ('A', 'R')"
    " AND l_linestatus LIKE 'F%'",
)
def filter_between_in_like(spark, sf_dir):
    """BETWEEN / IN / LIKE — the remaining predicate forms beyond the
    comparator algebra of F1-F6; all three push down to the scan."""
    li = _t(spark, sf_dir, "lineitem")
    return li.filter(
        F.col("l_quantity").between(10, 20)
        & F.col("l_returnflag").isin("A", "R")
        & F.col("l_linestatus").like("F%")
    ).select("l_orderkey", "l_linenumber")


@register(
    "setop_union_distinct",
    "SELECT o_custkey FROM orders WHERE o_orderstatus = 'F'"
    " UNION SELECT o_custkey FROM orders WHERE o_totalprice >= 300000",
)
def setop_union_distinct(spark, sf_dir):
    """UNION (set semantics) = union all + distinct — one hash shuffle
    on the row, vs UNION ALL's zero."""
    orders = _t(spark, sf_dir, "orders")
    a = orders.filter(F.col("o_orderstatus") == "F").select("o_custkey")
    b = orders.filter(F.col("o_totalprice") >= 300000).select("o_custkey")
    return a.union(b).distinct()


@register(
    "sample_seeded",
    # Seed-independent-invariant oracle: the RNG stream is engine-
    # specific, so each engine samples with ITS OWN seeded Bernoulli
    # and emits booleans over shared invariants — sample size inside
    # 6-sigma binomial bounds (p=0.2: flake odds ~1e-9), ids distinct,
    # ids inside the corpus id range — plus the exact corpus count.
    # Hash-exact comparison that still verifies the sampler behaves.
    "WITH t AS (SELECT COUNT(*) AS n_total, MIN(doc_id) AS dmn, MAX(doc_id) AS dmx"
    " FROM documents),"
    " s AS (SELECT doc_id FROM documents USING SAMPLE 20 PERCENT (bernoulli, 42)),"
    " ss AS (SELECT COUNT(*) AS n_sample, COUNT(DISTINCT doc_id) AS n_distinct,"
    " MIN(doc_id) AS mn, MAX(doc_id) AS mx FROM s)"
    " SELECT n_total,"
    " ABS(n_sample - 0.2 * n_total) <= 6 * SQRT(n_total * 0.16) AS count_in_bounds,"
    " n_distinct = n_sample AS ids_distinct,"
    " mn >= dmn AND mx <= dmx AS ids_in_range"
    " FROM t, ss",
)
def sample_seeded(spark, sf_dir):
    """Seeded Bernoulli sampling — the corpus-downsampling primitive
    (every training-data pipeline ends in one). Deterministic for a
    fixed seed + input layout; the RNG stream is engine-specific, so
    the oracle checks seed-independent invariants (see SQL) instead
    of raw ids. The sample itself is map-side only: no shuffle."""
    docs = _t(spark, sf_dir, "documents")
    s = docs.sample(fraction=0.2, seed=42).select("doc_id")
    stats = s.agg(
        F.count(F.lit(1)).alias("n_sample"),
        F.countDistinct("doc_id").alias("n_distinct"),
        F.min("doc_id").alias("mn"),
        F.max("doc_id").alias("mx"),
    )
    tot = docs.agg(
        F.count(F.lit(1)).alias("n_total"),
        F.min("doc_id").alias("dmn"),
        F.max("doc_id").alias("dmx"),
    )
    return tot.crossJoin(stats).select(
        "n_total",
        (F.abs(F.col("n_sample") - 0.2 * F.col("n_total"))
         <= 6 * F.sqrt(F.col("n_total") * 0.16)).alias("count_in_bounds"),
        (F.col("n_distinct") == F.col("n_sample")).alias("ids_distinct"),
        ((F.col("mn") >= F.col("dmn")) & (F.col("mx") <= F.col("dmx"))).alias("ids_in_range"),
    )


@register(
    "sample_stratified",
    # Same seed-independent-invariant treatment as sample_seeded, per
    # stratum: each engine draws its OWN Bernoulli sample at the
    # per-language fraction and emits (lang, exact stratum size,
    # sample-count-within-6-sigma, ids-distinct) — hash-exact while
    # verifying the stratified sampler per group.
    "WITH f AS (SELECT lang, doc_id,"
    " CASE WHEN lang = 'en' THEN 0.1 ELSE 0.5 END AS p FROM documents),"
    " s AS (SELECT lang, doc_id, p FROM f WHERE random() < p),"
    " t AS (SELECT lang, COUNT(*) AS n_docs,"
    " CASE WHEN lang = 'en' THEN 0.1 ELSE 0.5 END AS p FROM documents GROUP BY lang),"
    " ss AS (SELECT lang, COUNT(*) AS n_sample,"
    " COUNT(DISTINCT doc_id) AS n_distinct FROM s GROUP BY lang)"
    " SELECT t.lang, n_docs,"
    " ABS(COALESCE(n_sample, 0) - t.p * n_docs)"
    "  <= 6 * SQRT(n_docs * t.p * (1 - t.p)) AS count_in_bounds,"
    " COALESCE(n_distinct, 0) = COALESCE(n_sample, 0) AS ids_distinct"
    " FROM t LEFT JOIN ss ON t.lang = ss.lang",
)
def sample_stratified(spark, sf_dir):
    """Stratified sampling by language — per-stratum fractions keep
    low-resource languages from vanishing under uniform sampling.
    The oracle checks per-stratum seed-independent invariants (see
    SQL): the RNG stream is engine-specific, the binomial bounds are
    not."""
    docs = _t(spark, sf_dir, "documents")
    langs = [r["lang"] for r in docs.select("lang").distinct().collect()]
    fractions = {lg: (0.5 if lg != "en" else 0.1) for lg in langs}
    s = docs.sampleBy("lang", fractions, seed=42).select("doc_id", "lang")
    p = F.when(F.col("lang") == "en", 0.1).otherwise(0.5)
    t = docs.groupBy("lang").agg(F.count(F.lit(1)).alias("n_docs")).withColumn("p", p)
    ss = s.groupBy("lang").agg(
        F.count(F.lit(1)).alias("n_sample"),
        F.countDistinct("doc_id").alias("n_distinct"),
    )
    joined = t.join(ss, "lang", "left")
    return joined.select(
        "lang",
        "n_docs",
        (
            F.abs(F.coalesce(F.col("n_sample"), F.lit(0)) - F.col("p") * F.col("n_docs"))
            <= 6 * F.sqrt(F.col("n_docs") * F.col("p") * (1 - F.col("p")))
        ).alias("count_in_bounds"),
        (
            F.coalesce(F.col("n_distinct"), F.lit(0))
            == F.coalesce(F.col("n_sample"), F.lit(0))
        ).alias("ids_distinct"),
    )


@register(
    "tpch_q14",
    "SELECT ROUND(100.00 * SUM(CASE WHEN p_type = 'PROMO'"
    " THEN l_extendedprice * (1 - l_discount) ELSE 0 END)"
    " / SUM(l_extendedprice * (1 - l_discount)), 4) AS promo_revenue"
    " FROM lineitem JOIN part ON l_partkey = p_partkey"
    " WHERE l_shipdate >= TIMESTAMP '1996-01-01' AND l_shipdate < TIMESTAMP '1996-02-01'",
)
def tpch_q14(spark, sf_dir):
    """TPC-H Q14: conditional aggregation over a broadcast dim join —
    the filter prunes lineitem at the scan, part is broadcast, one
    partial/final agg produces the ratio."""
    from stockify_spark.operators.joins import dim_join

    li = _t(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1996-02-01").cast("timestamp"))
    )
    part = _t(spark, sf_dir, "part")
    joined = dim_join(li, part, li["l_partkey"] == part["p_partkey"])
    rev = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return joined.agg(
        F.round(
            100.0
            * F.sum(F.when(F.col("p_type") == "PROMO", rev).otherwise(0.0))
            / F.sum(rev),
            4,
        ).alias("promo_revenue")
    )


@register(
    "tpch_q18",
    "SELECT o_orderkey, ROUND(o_totalprice, 2) AS o_totalprice, total_qty FROM orders"
    " JOIN (SELECT l_orderkey, ROUND(SUM(l_quantity), 2) AS total_qty FROM lineitem"
    " GROUP BY l_orderkey HAVING SUM(l_quantity) > 250) big"
    " ON o_orderkey = big.l_orderkey",
)
def tpch_q18(spark, sf_dir):
    """TPC-H Q18 shape (large-volume orders): grouped HAVING subquery
    joined back to orders — the aggregate side shrinks to the few
    qualifying keys before the join, so the join input is tiny."""
    li = _t(spark, sf_dir, "lineitem")
    orders = _t(spark, sf_dir, "orders")
    big = (
        li.groupBy("l_orderkey")
        .agg(F.sum("l_quantity").alias("_raw_qty"))
        # HAVING on the unrounded aggregate; round only the output
        .filter(F.col("_raw_qty") > 250)
        .select("l_orderkey", F.round("_raw_qty", 2).alias("total_qty"))
    )
    return orders.join(big, orders["o_orderkey"] == big["l_orderkey"]).select(
        "o_orderkey", F.round("o_totalprice", 2).alias("o_totalprice"), "total_qty"
    )


@register(
    "fn_string2",
    "SELECT p_partkey,"
    " rpad(p_name, 20, '.') AS name_padded,"
    " lpad(p_brand, 12, '*') AS brand_padded,"
    " translate(p_type, 'AEO', 'aeo') AS type_translated,"
    " reverse(p_name) AS name_reversed,"
    " repeat(left(p_name, 2), 3) AS prefix_thrice,"
    " right(p_type, 4) AS type_tail FROM part",
)
def fn_string2(spark, sf_dir):
    df = _t(spark, sf_dir, "part")
    return df.select(
        "p_partkey",
        F.rpad("p_name", 20, ".").alias("name_padded"),
        F.lpad("p_brand", 12, "*").alias("brand_padded"),
        F.translate("p_type", "AEO", "aeo").alias("type_translated"),
        F.reverse("p_name").alias("name_reversed"),
        F.repeat(F.substring("p_name", 1, 2), 3).alias("prefix_thrice"),
        F.substring(F.col("p_type"), -4, 4).alias("type_tail"),
    )


@register(
    "fn_array_ops",
    "SELECT p_partkey,"
    " array_to_string(words, ' ') AS words_str,"
    " CAST(len(words) AS INT) AS n_words,"
    " array_to_string(list_sort(words), '|') AS words_sorted_str,"
    " list_contains(words, 'widget') AS has_widget,"
    " CAST(COALESCE(list_position(words, 'widget'), 0) AS INT) AS widget_pos,"
    " words[1] AS first_word,"
    " array_to_string(list_sort(words), '-') AS joined"
    " FROM (SELECT p_partkey, string_split(p_name, ' ') AS words FROM part)",
)
def fn_array_ops(spark, sf_dir):
    """Array algebra over a derived array column. Ordinal conventions
    reconciled in the oracle: both engines are 1-based for element
    access; Spark's array_position returns 0 for missing where DuckDB
    returns NULL (coalesced). Array-valued intermediates (words,
    words_sorted) are scalarized with array_join before projection:
    the driver's pandas canonicalization cannot hash list cells, and
    a string rendering carries identical information for the
    differential check."""
    df = _t(spark, sf_dir, "part").select(
        "p_partkey", F.split("p_name", " ").alias("words")
    )
    return df.select(
        "p_partkey",
        F.array_join("words", " ").alias("words_str"),
        F.size("words").cast("int").alias("n_words"),
        F.array_join(F.sort_array("words"), "|").alias("words_sorted_str"),
        F.array_contains("words", "widget").alias("has_widget"),
        F.array_position("words", "widget").cast("int").alias("widget_pos"),
        F.element_at("words", 1).alias("first_word"),
        F.array_join(F.sort_array("words"), "-").alias("joined"),
    )


@register(
    "pipeline_clean_corpus",
    # language filter → quality gate → exact-dedup keeper selection,
    # as one composed plan (the end-to-end shape of a training-data
    # cleaning job)
    "WITH en AS (SELECT doc_id,"
    " md5(regexp_replace(trim(lower(text)), '\\s+', ' ', 'g')) AS fp,"
    " ROUND(LEAST(CAST(len(string_split_regex(trim(lower(text)), '\\s+')) AS DOUBLE) / 64.0, 1.0)"
    " * (CASE WHEN list_sum(list_transform(string_split_regex(trim(lower(text)), '\\s+'),"
    " x -> CAST(length(x) AS DOUBLE))) / len(string_split_regex(trim(lower(text)), '\\s+'))"
    " BETWEEN 2.0 AND 12.0 THEN 1.0 ELSE 0.5 END), 6) AS q"
    " FROM documents WHERE lang = 'en')"
    " SELECT MIN(doc_id) AS doc_id FROM en WHERE q >= 0.5 GROUP BY fp",
)
def pipeline_clean_corpus(spark, sf_dir):
    """Composed cleaning pipeline: language filter → quality gate →
    exact dedup (deterministic min-id keeper). One declarative plan:
    the filters fuse into the scan, the only shuffle is the dedup
    groupBy on the fingerprint digest — the whole pipeline costs one
    pass + one hash shuffle at any corpus size."""
    from stockify_spark.functions.text import fingerprint, quality_score

    docs = _t(spark, sf_dir, "documents").filter(F.col("lang") == "en")
    scored = docs.withColumn("q", quality_score("text")).filter(F.col("q") >= 0.5)
    return (
        scored.withColumn("fp", fingerprint("text"))
        .groupBy("fp")
        .agg(F.min("doc_id").alias("doc_id"))
        .select("doc_id")
    )


@register(
    "tpch_q5",
    "SELECT n_name, ROUND(SUM(l_extendedprice * (1 - l_discount)), 2) AS revenue"
    " FROM customer JOIN orders ON c_custkey = o_custkey"
    " JOIN lineitem ON l_orderkey = o_orderkey"
    " JOIN supplier ON l_suppkey = s_suppkey AND c_nationkey = s_nationkey"
    " JOIN nation ON s_nationkey = n_nationkey"
    " JOIN region ON n_regionkey = r_regionkey"
    " WHERE r_name = 'ASIA' AND o_orderdate >= TIMESTAMP '1996-01-01'"
    " AND o_orderdate < TIMESTAMP '1997-01-01'"
    " GROUP BY n_name",
)
def tpch_q5(spark, sf_dir):
    """TPC-H Q5 (local-supplier volume): supplier/nation/region and
    the customer dim broadcast; lineitem joins the year of orders
    WITHOUT a forced broadcast — a year of orders is fact-sized at
    scale, so the choice between broadcast and shuffle join belongs
    to AQE's runtime statistics, not a hint that would pin an
    executor-OOM plan at 100×."""
    from stockify_spark.operators.joins import fact_join

    cust = _t(spark, sf_dir, "customer")
    orders = _t(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1997-01-01").cast("timestamp"))
    )
    li = _t(spark, sf_dir, "lineitem")
    supp = _t(spark, sf_dir, "supplier")
    nation = _t(spark, sf_dir, "nation")
    region = _t(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA")

    joined = (
        fact_join(li, orders, li["l_orderkey"] == orders["o_orderkey"])
        .join(F.broadcast(cust), F.col("o_custkey") == cust["c_custkey"])
        .join(
            F.broadcast(supp),
            (F.col("l_suppkey") == supp["s_suppkey"])
            & (F.col("c_nationkey") == supp["s_nationkey"]),
        )
        .join(F.broadcast(nation), F.col("s_nationkey") == nation["n_nationkey"])
        .join(F.broadcast(region), F.col("n_regionkey") == region["r_regionkey"])
    )
    return joined.groupBy("n_name").agg(
        F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2).alias("revenue")
    )


@register(
    "tpch_q10",
    # revenue is summed in DECIMAL (exact, order-independent — a
    # double sum hit a half-cent rounding boundary where Spark and
    # DuckDB tie-break differently), ORDERED on the exact decimal,
    # and only the FINAL projected value is cast to DOUBLE: DuckDB's
    # pandas path degrades DECIMAL output to float64, so a DECIMAL
    # output column hash-mismatches the driver on identical values.
    # decimal->double is correctly rounded on both engines.
    "SELECT c_custkey, c_name, CAST(revenue AS DOUBLE) AS revenue, c_acctbal, n_name"
    " FROM (SELECT c_custkey, c_name, CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,4))"
    " * (1 - CAST(l_discount AS DECIMAL(18,4)))) AS DECIMAL(30,8)) AS revenue,"
    " c_acctbal, n_name FROM customer"
    " JOIN orders ON c_custkey = o_custkey"
    " JOIN lineitem ON l_orderkey = o_orderkey"
    " JOIN nation ON c_nationkey = n_nationkey"
    " WHERE o_orderdate >= TIMESTAMP '1996-01-01' AND o_orderdate < TIMESTAMP '1996-04-01'"
    " AND l_returnflag = 'R'"
    " GROUP BY c_custkey, c_name, c_acctbal, n_name"
    " ORDER BY revenue DESC, c_custkey LIMIT 20) t",
)
def tpch_q10(spark, sf_dir):
    """TPC-H Q10 (returned-item reporting): returned lineitems only,
    quarter of orders, grouped by customer, top-20 by revenue via
    TakeOrderedAndProject."""
    from stockify_spark.operators.joins import fact_join

    cust = _t(spark, sf_dir, "customer")
    nation = _t(spark, sf_dir, "nation")
    orders = _t(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1996-04-01").cast("timestamp"))
    )
    li = _t(spark, sf_dir, "lineitem").filter(F.col("l_returnflag") == "R")
    # no forced broadcast on orders (fact-sized at scale) — AQE picks
    joined = (
        fact_join(li, orders, li["l_orderkey"] == orders["o_orderkey"])
        .join(F.broadcast(cust), F.col("o_custkey") == cust["c_custkey"])
        .join(F.broadcast(nation), F.col("c_nationkey") == nation["n_nationkey"])
    )
    rev = F.col("l_extendedprice").cast("decimal(18,4)") * (
        F.lit(1) - F.col("l_discount").cast("decimal(18,4)")
    )
    agg = joined.groupBy("c_custkey", "c_name", "c_acctbal", "n_name").agg(
        F.sum(rev).cast("decimal(30,8)").alias("revenue")
    )
    # top-20 on the exact decimal; only the projected value goes double
    return (
        agg.orderBy(F.col("revenue").desc(), F.col("c_custkey"))
        .limit(20)
        .select(
            "c_custkey",
            "c_name",
            F.col("revenue").cast("double").alias("revenue"),
            "c_acctbal",
            "n_name",
        )
    )


@register(
    "tpch_q12",
    # SUM over integers is HUGEINT in DuckDB, which degrades to
    # float64 in the driver's pandas path while Spark emits int64 —
    # CAST AS BIGINT keeps the counters hash-type-stable.
    "SELECT l_linestatus,"
    " CAST(SUM(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH') THEN 1 ELSE 0 END)"
    " AS BIGINT) AS high_line_count,"
    " CAST(SUM(CASE WHEN o_orderpriority NOT IN ('1-URGENT', '2-HIGH') THEN 1 ELSE 0 END)"
    " AS BIGINT) AS low_line_count"
    " FROM orders JOIN lineitem ON o_orderkey = l_orderkey"
    " WHERE l_shipdate >= TIMESTAMP '1996-01-01' AND l_shipdate < TIMESTAMP '1997-01-01'"
    " GROUP BY l_linestatus",
)
def tpch_q12(spark, sf_dir):
    """TPC-H Q12 shape (priority counting): conditional counts fold
    the CASE into the partial aggregate — one scan-pruned pass, one
    group shuffle of two counters per status."""
    from stockify_spark.operators.joins import fact_join

    orders = _t(spark, sf_dir, "orders")
    li = _t(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1997-01-01").cast("timestamp"))
    )
    joined = fact_join(li, orders, li["l_orderkey"] == orders["o_orderkey"])
    is_high = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    return joined.groupBy("l_linestatus").agg(
        F.sum(F.when(is_high, 1).otherwise(0)).alias("high_line_count"),
        F.sum(F.when(~is_high, 1).otherwise(0)).alias("low_line_count"),
    )


@register(
    "groupby_mom_change",
    "WITH m AS (SELECT CAST(date_trunc('month', o_orderdate) AS DATE) AS order_month,"
    " ROUND(SUM(o_totalprice), 2) AS revenue FROM orders GROUP BY 1)"
    " SELECT order_month, revenue,"
    " ROUND(revenue - LAG(revenue) OVER (ORDER BY order_month), 2) AS mom_delta"
    " FROM m",
)
def groupby_mom_change(spark, sf_dir):
    """Aggregate→window composition: monthly revenue plus its
    month-over-month delta. The window runs over the AGGREGATED rows
    (dozens of months), so the global ORDER BY here is bounded — the
    post-aggregation cardinality, not the fact table, sets the
    window's partition size."""
    from pyspark.sql import Window

    monthly = (
        _t(spark, sf_dir, "orders")
        .groupBy(F.to_date(F.date_trunc("month", "o_orderdate")).alias("order_month"))
        .agg(F.round(F.sum("o_totalprice"), 2).alias("revenue"))
    )
    w = Window.orderBy("order_month")
    return monthly.select(
        "order_month",
        "revenue",
        F.round(F.col("revenue") - F.lag("revenue").over(w), 2).alias("mom_delta"),
    )


@register(
    "events_funnel",
    "WITH p AS (SELECT event_id, user_id, ts FROM events WHERE event_type = 'purchase'),"
    " converted AS (SELECT DISTINCT p.event_id FROM p JOIN events c"
    " ON c.event_type = 'click' AND c.user_id = p.user_id"
    " AND c.ts <= p.ts AND c.ts >= p.ts - INTERVAL '30 minutes')"
    " SELECT (SELECT COUNT(*) FROM p) AS n_purchases,"
    " (SELECT COUNT(*) FROM converted) AS n_converted,"
    " ROUND((SELECT COUNT(*) FROM converted) * 1.0 / (SELECT COUNT(*) FROM p), 6)"
    " AS conversion_rate",
)
def events_funnel(spark, sf_dir):
    """Click→purchase funnel: share of purchases preceded by a click
    from the same user within 30 minutes — a semi join on the
    time-bounded condition (state-bounded in the streaming analog,
    stream_interval_join), then one global aggregate."""
    events = _t(spark, sf_dir, "events")
    purchases = events.filter(F.col("event_type") == "purchase").select(
        "event_id", "user_id", "ts"
    )
    clicks = events.filter(F.col("event_type") == "click").select(
        F.col("user_id").alias("c_user"), F.col("ts").alias("c_ts")
    )
    converted = purchases.join(
        clicks,
        (F.col("user_id") == F.col("c_user"))
        & (F.col("c_ts") <= F.col("ts"))
        & (F.col("c_ts") >= F.col("ts") - F.expr("INTERVAL 30 minutes")),
        "left_semi",
    )
    return purchases.agg(F.count(F.lit(1)).alias("n_purchases")).crossJoin(
        converted.agg(F.count(F.lit(1)).alias("n_converted"))
    ).select(
        "n_purchases",
        "n_converted",
        F.round(F.col("n_converted") / F.col("n_purchases"), 6).alias("conversion_rate"),
    )


@register(
    "tpch_q4",
    # adapted: our lineitem has no commitdate/receiptdate, so the
    # EXISTS probes late-shipping lines (l_shipdate > o_orderdate)
    "SELECT o_orderpriority, COUNT(*) AS order_count FROM orders"
    " WHERE o_orderdate >= TIMESTAMP '1996-01-01' AND o_orderdate < TIMESTAMP '1996-04-01'"
    " AND EXISTS (SELECT 1 FROM lineitem WHERE l_orderkey = o_orderkey"
    " AND l_shipdate > o_orderdate)"
    " GROUP BY o_orderpriority",
)
def tpch_q4(spark, sf_dir):
    """TPC-H Q4 shape (order-priority checking): EXISTS → left-semi
    join, then a tiny grouped count. The semi join shuffles only the
    probe keys, never lineitem payload columns."""
    from stockify_spark.operators.joins import semi_join

    orders = _t(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1996-04-01").cast("timestamp"))
    )
    li = _t(spark, sf_dir, "lineitem").select("l_orderkey", "l_shipdate")
    qualified = semi_join(
        orders,
        li,
        (orders["o_orderkey"] == li["l_orderkey"]) & (li["l_shipdate"] > orders["o_orderdate"]),
    )
    return qualified.groupBy("o_orderpriority").agg(F.count(F.lit(1)).alias("order_count"))


@register(
    "tpch_q19",
    # adapted to our part schema: disjunctive brand/size/quantity arms
    "SELECT ROUND(SUM(l_extendedprice * (1 - l_discount)), 2) AS revenue"
    " FROM lineitem JOIN part ON p_partkey = l_partkey"
    " WHERE (p_brand = 'BRAND_1' AND p_size BETWEEN 1 AND 15 AND l_quantity >= 10)"
    " OR (p_brand = 'BRAND_2' AND p_size BETWEEN 10 AND 30 AND l_quantity >= 20)"
    " OR (p_brand = 'BRAND_3' AND p_size BETWEEN 20 AND 50 AND l_quantity >= 30)",
)
def tpch_q19(spark, sf_dir):
    """TPC-H Q19 shape (discounted revenue, disjunctive predicates):
    the OR-of-ANDs evaluates after a single broadcast join — Catalyst
    extracts the common l_quantity >= 10 bound and pushes it to the
    lineitem scan."""
    from stockify_spark.operators.joins import dim_join

    li = _t(spark, sf_dir, "lineitem")
    part = _t(spark, sf_dir, "part")
    joined = dim_join(li, part, li["l_partkey"] == part["p_partkey"])
    arm = lambda b, lo, hi, q: (  # noqa: E731
        (F.col("p_brand") == b)
        & F.col("p_size").between(lo, hi)
        & (F.col("l_quantity") >= q)
    )
    return joined.filter(
        arm("BRAND_1", 1, 15, 10) | arm("BRAND_2", 10, 30, 20) | arm("BRAND_3", 20, 50, 30)
    ).agg(F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2).alias("revenue"))


@register(
    "tpch_q13",
    "SELECT c_count, COUNT(*) AS custdist FROM"
    " (SELECT c_custkey, COUNT(o_orderkey) AS c_count FROM customer"
    " LEFT JOIN orders ON c_custkey = o_custkey GROUP BY c_custkey)"
    " GROUP BY c_count",
)
def tpch_q13(spark, sf_dir):
    """TPC-H Q13 (customer distribution): double aggregation — a
    per-customer order count (left outer join keeps zero-order
    customers; COUNT of a nullable key skips the null-extended rows),
    then a histogram over the counts. Second shuffle is O(distinct
    counts) — tiny."""
    cust = _t(spark, sf_dir, "customer")
    orders = _t(spark, sf_dir, "orders")
    per_cust = (
        cust.join(orders, cust["c_custkey"] == orders["o_custkey"], "left")
        .groupBy(cust["c_custkey"])
        .agg(F.count("o_orderkey").alias("c_count"))
    )
    return per_cust.groupBy("c_count").agg(F.count(F.lit(1)).alias("custdist"))


@register(
    "tpch_q8",
    # adapted market share: NATION_1's share of ASIA-customer revenue
    # per order year
    "SELECT CAST(year(o_orderdate) AS BIGINT) AS o_year,"
    " ROUND(SUM(CASE WHEN n_name = 'NATION_1' THEN l_extendedprice * (1 - l_discount)"
    " ELSE 0 END) / SUM(l_extendedprice * (1 - l_discount)), 6) AS mkt_share"
    " FROM lineitem JOIN orders ON l_orderkey = o_orderkey"
    " JOIN customer ON o_custkey = c_custkey"
    " JOIN nation ON c_nationkey = n_nationkey"
    " JOIN region ON n_regionkey = r_regionkey"
    " WHERE r_name = 'ASIA' GROUP BY year(o_orderdate)",
)
def tpch_q8(spark, sf_dir):
    """TPC-H Q8 shape (market share): one fact shuffle, broadcast
    dimension chain, conditional-numerator ratio per year."""
    from stockify_spark.operators.joins import fact_join

    li = _t(spark, sf_dir, "lineitem")
    orders = _t(spark, sf_dir, "orders")
    cust = _t(spark, sf_dir, "customer")
    nation = _t(spark, sf_dir, "nation")
    region = _t(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA")
    joined = (
        fact_join(li, orders, li["l_orderkey"] == orders["o_orderkey"])
        .join(F.broadcast(cust), F.col("o_custkey") == cust["c_custkey"])
        .join(F.broadcast(nation), F.col("c_nationkey") == nation["n_nationkey"])
        .join(F.broadcast(region), F.col("n_regionkey") == region["r_regionkey"])
    )
    rev = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return joined.groupBy(F.year("o_orderdate").cast("long").alias("o_year")).agg(
        F.round(
            F.sum(F.when(F.col("n_name") == "NATION_1", rev).otherwise(0.0)) / F.sum(rev), 6
        ).alias("mkt_share")
    )


@register(
    "tpch_q22",
    # adapted: rich customers (above the positive-balance average) with
    # no high-value order, counted per market segment
    "WITH threshold AS (SELECT AVG(c_acctbal) AS t FROM customer WHERE c_acctbal > 0)"
    " SELECT c_mktsegment, COUNT(*) AS numcust, ROUND(SUM(c_acctbal), 2) AS totacctbal"
    " FROM customer, threshold WHERE c_acctbal > t"
    " AND NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey"
    " AND o_totalprice > 200000)"
    " GROUP BY c_mktsegment",
)
def tpch_q22(spark, sf_dir):
    """TPC-H Q22 shape (global-sales opportunity): scalar-subquery
    threshold (1-row broadcast) + anti join against high-value orders
    + grouped count — three subquery forms composed in one plan."""
    from stockify_spark.operators.joins import anti_join

    cust = _t(spark, sf_dir, "customer")
    threshold = cust.filter(F.col("c_acctbal") > 0).agg(F.avg("c_acctbal").alias("_t"))
    rich = cust.crossJoin(F.broadcast(threshold)).filter(F.col("c_acctbal") > F.col("_t"))
    big_orders = _t(spark, sf_dir, "orders").filter(F.col("o_totalprice") > 200000)
    no_big = anti_join(rich, big_orders, rich["c_custkey"] == big_orders["o_custkey"])
    return no_big.groupBy("c_mktsegment").agg(
        F.count(F.lit(1)).alias("numcust"),
        F.round(F.sum("c_acctbal"), 2).alias("totacctbal"),
    )


@register(
    "merge_upsert_orders",
    "SELECT o_orderkey, ROUND(o_totalprice, 2) AS o_totalprice FROM orders"
    " WHERE o_orderkey % 100 <> 0"
    " UNION ALL SELECT o_orderkey, ROUND(o_totalprice * 2, 2) AS o_totalprice"
    " FROM orders WHERE o_orderkey % 100 = 0",
)
def merge_upsert_orders(spark, sf_dir):
    """MERGE semantics on plain parquet (operators/merge.py): every
    100th order is 'updated' (price doubled); the merged table keeps
    unmatched rows and takes the update side for matched keys. The
    oracle states the same MERGE as its UNION of complements."""
    from stockify_spark.operators.merge import merge_upsert

    orders = _t(spark, sf_dir, "orders").select("o_orderkey", "o_totalprice")
    updates = orders.filter(F.col("o_orderkey") % 100 == 0).select(
        "o_orderkey", (F.col("o_totalprice") * 2).alias("o_totalprice")
    )
    merged = merge_upsert(orders, updates, ["o_orderkey"])
    return merged.select("o_orderkey", F.round("o_totalprice", 2).alias("o_totalprice"))


_CLUSTER_SHINGLES = (
    "list_distinct(list_transform(range(greatest("
    "len(string_split_regex(trim(lower(text)), '\\s+')) - 3, 0) + 1),"
    " i -> array_to_string(string_split_regex(trim(lower(text)), '\\s+')[i + 1:i + 3], ' ')))"
)


@register(
    "dedup_clusters",
    # near-dup pairs (brute-force jaccard) → transitive closure via a
    # recursive CTE: min reachable doc_id = component representative
    f"WITH RECURSIVE s AS (SELECT doc_id, {_CLUSTER_SHINGLES} AS sh FROM documents),"
    " pairs AS (SELECT a.doc_id AS id_a, b.doc_id AS id_b FROM s a JOIN s b"
    " ON a.doc_id < b.doc_id WHERE CAST(len(list_intersect(a.sh, b.sh)) AS DOUBLE)"
    " / len(list_distinct(list_concat(a.sh, b.sh))) >= 0.5),"
    " edges AS (SELECT id_a AS src, id_b AS dst FROM pairs"
    " UNION ALL SELECT id_b, id_a FROM pairs),"
    " reach(node, lab) AS (SELECT src, src FROM edges"
    " UNION SELECT e.dst, r.lab FROM reach r JOIN edges e ON e.src = r.node)"
    " SELECT node AS doc_id, MIN(lab) AS component FROM reach GROUP BY node",
)
def dedup_clusters(spark, sf_dir):
    """Near-duplicate clusters: jaccard>=0.5 pair edges → connected
    components (llm/dedup.connected_components, iterative min-label
    propagation). The oracle computes the same transitive closure
    with a recursive CTE, so the graph algorithm's fixpoint is
    differentially verified."""
    from stockify_spark.llm.dedup import duplicate_clusters

    return duplicate_clusters(_t(spark, sf_dir, "documents"), "text", "doc_id")


@register(
    "agg_bitwise_bool",
    "SELECT l_returnflag,"
    " bit_and(l_linenumber) AS all_bits, bit_or(l_linenumber) AS any_bits,"
    " bit_xor(l_linenumber) AS xor_bits,"
    " bool_or(l_quantity > 49) AS any_max_qty, bool_and(l_quantity > 0) AS all_positive"
    " FROM lineitem GROUP BY l_returnflag",
)
def agg_bitwise_bool(spark, sf_dir):
    """Bitwise and boolean aggregates — all one-pass partial/final
    (each partial is a single machine word per group)."""
    li = _t(spark, sf_dir, "lineitem")
    return li.groupBy("l_returnflag").agg(
        F.bit_and("l_linenumber").alias("all_bits"),
        F.bit_or("l_linenumber").alias("any_bits"),
        F.bit_xor("l_linenumber").alias("xor_bits"),
        F.bool_or(F.col("l_quantity") > 49).alias("any_max_qty"),
        F.bool_and(F.col("l_quantity") > 0).alias("all_positive"),
    )


@register(
    "fn_crypto_hash",
    "SELECT c_custkey, md5(c_name) AS name_md5, sha256(c_name) AS name_sha256"
    " FROM customer",
)
def fn_crypto_hash(spark, sf_dir):
    """Deterministic cryptographic digests — the cross-engine-stable
    key material for fingerprinting and salting (cf. exact dedup)."""
    df = _t(spark, sf_dir, "customer")
    return df.select(
        "c_custkey",
        F.md5("c_name").alias("name_md5"),
        F.sha2("c_name", 256).alias("name_sha256"),
    )


# ---------------------------------------------------------------------------
# Reference-table parity (SURVEY §2 on the reference's OWN table
# shape): the ramp fixture is deterministic, so the oracle REGENERATES
# it inside DuckDB and both engines compute the reference experiments
# on byte-identical inputs — no stand-in table involved.
# ---------------------------------------------------------------------------

# literals like 10.0 are DECIMAL in DuckDB — CAST to DOUBLE to match
# the fixture's double columns exactly
_RAMP_SQL = (
    "SELECT i AS row_id, CAST(500 + (i % 18) * 10 AS DOUBLE) AS close,"
    " CAST(1200000 + (i % 18) * 100000 AS DOUBLE) AS volume,"
    " CAST(450 + (i % 18) * 10 AS DOUBLE) AS open,"
    " CAST(510 + (i % 18) * 10 AS DOUBLE) AS high,"
    " CAST(440 + (i % 18) * 10 AS DOUBLE) AS low"
    " FROM range(1800) t(i)"
)


@register(
    "stocks_filter_agg",
    f"WITH stocks AS ({_RAMP_SQL})"
    " SELECT COUNT(*) AS n, ROUND(SUM(low), 2) AS sum_low,"
    " MIN(low) AS min_low, MAX(high) AS max_high"
    " FROM stocks WHERE volume >= 1800000",
)
def stocks_filter_agg(spark, sf_dir):
    """Experiments 1.a + 2.a/2.c/2.d fused, on the reference's own
    table: the Experiment-3 probe literal (volume >= 1.8e6,
    stockify.cu:674) selects 12/18 of the ramp; sum in double, not
    float32 atomics (SURVEY §2.3)."""
    from stockify_spark.sources.fixtures import stocks_ramp

    s = stocks_ramp(spark, cycles=100)
    return s.filter(F.col("volume") >= 1_800_000).agg(
        F.count(F.lit(1)).alias("n"),
        F.round(F.sum("low"), 2).alias("sum_low"),
        F.min("low").alias("min_low"),
        F.max("high").alias("max_high"),
    )


@register(
    "stocks_window_suite",
    f"WITH stocks AS ({_RAMP_SQL})"
    " SELECT row_id,"
    " ROUND(AVG(close) OVER w, 6) AS moving_avg,"
    " MIN(low) OVER w AS rolling_min,"
    " MAX(high) OVER w AS rolling_max"
    " FROM stocks WINDOW w AS (ORDER BY row_id ROWS BETWEEN CURRENT ROW AND 9 FOLLOWING)",
)
def stocks_window_suite(spark, sf_dir):
    """W1+W2+W3 (stockify.cu:142-193) on the reference's own table,
    full per-row columns (not the vacuous min-of-mins check), frames
    shrinking at the tail per SQL standard — the intent of the CPU
    reference loop (stockify.cu:513-521), not the kernels' bugs."""
    from pyspark.sql import Window

    from stockify_spark.sources.fixtures import stocks_ramp

    s = stocks_ramp(spark, cycles=100)
    w = Window.orderBy("row_id").rowsBetween(Window.currentRow, 9)
    return s.select(
        "row_id",
        F.round(F.avg("close").over(w), 6).alias("moving_avg"),
        F.min("low").over(w).alias("rolling_min"),
        F.max("high").over(w).alias("rolling_max"),
    )


@register(
    "fn_trig",
    "SELECT l_orderkey, l_linenumber,"
    " ROUND(SIN(l_discount), 6) AS sin_d, ROUND(COS(l_discount), 6) AS cos_d,"
    " ROUND(ATAN2(l_quantity, l_extendedprice), 6) AS angle,"
    " ROUND(DEGREES(l_discount), 6) AS disc_deg,"
    " ROUND(EXP(l_discount), 6) AS disc_exp,"
    " ROUND(LOG10(l_extendedprice), 6) AS price_log10 FROM lineitem",
)
def fn_trig(spark, sf_dir):
    df = _t(spark, sf_dir, "lineitem")
    return df.select(
        "l_orderkey",
        "l_linenumber",
        F.round(F.sin("l_discount"), 6).alias("sin_d"),
        F.round(F.cos("l_discount"), 6).alias("cos_d"),
        F.round(F.atan2("l_quantity", "l_extendedprice"), 6).alias("angle"),
        F.round(F.degrees("l_discount"), 6).alias("disc_deg"),
        F.round(F.exp("l_discount"), 6).alias("disc_exp"),
        F.round(F.log10("l_extendedprice"), 6).alias("price_log10"),
    )


@register(
    "fn_least_greatest",
    "SELECT l_orderkey, l_linenumber,"
    " LEAST(l_quantity, l_discount * 100, l_tax * 100) AS smallest,"
    " GREATEST(l_quantity, l_discount * 100, l_tax * 100) AS largest FROM lineitem",
)
def fn_least_greatest(spark, sf_dir):
    df = _t(spark, sf_dir, "lineitem")
    return df.select(
        "l_orderkey",
        "l_linenumber",
        F.least(F.col("l_quantity"), F.col("l_discount") * 100, F.col("l_tax") * 100).alias(
            "smallest"
        ),
        F.greatest(F.col("l_quantity"), F.col("l_discount") * 100, F.col("l_tax") * 100).alias(
            "largest"
        ),
    )


@register(
    "agg_skew_kurt",
    "SELECT ROUND(skewness(l_extendedprice), 4) AS price_skew,"
    " ROUND(kurtosis(l_extendedprice), 4) AS price_kurt FROM lineitem",
)
def agg_skew_kurt(spark, sf_dir):
    """Higher-moment aggregates (one-pass partial/final). Both
    engines compute sample-adjusted skewness/excess kurtosis — the
    oracle run proves the formulas agree to 4 decimals."""
    li = _t(spark, sf_dir, "lineitem")
    return li.agg(
        F.round(F.skewness("l_extendedprice"), 4).alias("price_skew"),
        F.round(F.kurtosis("l_extendedprice"), 4).alias("price_kurt"),
    )


# ---------------------------------------------------------------------------
# Remaining feasible TPC-H shapes. The star schema has no partsupp
# table (TESTDATA.md), so Q2/Q9/Q11/Q16/Q20 cannot be posed; Q7/Q15/
# Q17/Q21 below complete every partsupp-free query. Where a TPC-H
# predicate needs a missing column, the substitution is noted.
# ---------------------------------------------------------------------------


@register(
    "tpch_q7",
    # volume accumulates in DECIMAL (exact, order-independent — a
    # ROUND(SUM(double),2) sits on the half-cent boundary class that
    # bit tpch_q10); the final value casts to DOUBLE, which is
    # correctly rounded on both engines and pandas-path-stable.
    "SELECT supp_nation, cust_nation, l_year, CAST(SUM(volume) AS DOUBLE) AS revenue"
    " FROM (SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,"
    " CAST(EXTRACT(year FROM l_shipdate) AS BIGINT) AS l_year,"
    " CAST(l_extendedprice AS DECIMAL(18,4)) * (1 - CAST(l_discount AS DECIMAL(18,4))) AS volume"
    " FROM supplier JOIN lineitem ON s_suppkey = l_suppkey"
    " JOIN orders ON o_orderkey = l_orderkey"
    " JOIN customer ON c_custkey = o_custkey"
    " JOIN nation n1 ON s_nationkey = n1.n_nationkey"
    " JOIN nation n2 ON c_nationkey = n2.n_nationkey"
    " WHERE ((n1.n_name = 'NATION_1' AND n2.n_name = 'NATION_2')"
    " OR (n1.n_name = 'NATION_2' AND n2.n_name = 'NATION_1'))"
    " AND l_shipdate >= TIMESTAMP '1995-01-01'"
    " AND l_shipdate < TIMESTAMP '1997-01-01') shipping"
    " GROUP BY supp_nation, cust_nation, l_year",
)
def tpch_q7(spark, sf_dir):
    """TPC-H Q7 (volume shipping between two nations): one fact
    shuffle on the order key; orders stays shuffle-side (fact-sized),
    customer/supplier/nation broadcast. The bidirectional nation pair
    filters AFTER the nation joins — a two-row broadcast each, so
    Catalyst folds the OR into the joined stream."""
    from stockify_spark.operators.joins import fact_join

    li = _t(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1995-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1997-01-01").cast("timestamp"))
    )
    orders = _t(spark, sf_dir, "orders")
    cust = _t(spark, sf_dir, "customer")
    supp = _t(spark, sf_dir, "supplier")
    n1 = _t(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("_n1key"), F.col("n_name").alias("supp_nation")
    )
    n2 = _t(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("_n2key"), F.col("n_name").alias("cust_nation")
    )
    pair = (F.col("supp_nation") == "NATION_1") & (F.col("cust_nation") == "NATION_2") | (
        F.col("supp_nation") == "NATION_2"
    ) & (F.col("cust_nation") == "NATION_1")
    joined = (
        fact_join(li, orders, li["l_orderkey"] == orders["o_orderkey"])
        .join(F.broadcast(cust), F.col("o_custkey") == cust["c_custkey"])
        .join(F.broadcast(supp), F.col("l_suppkey") == supp["s_suppkey"])
        .join(F.broadcast(n1), F.col("s_nationkey") == F.col("_n1key"))
        .join(F.broadcast(n2), F.col("c_nationkey") == F.col("_n2key"))
        .filter(pair)
    )
    volume = F.col("l_extendedprice").cast("decimal(18,4)") * (
        F.lit(1) - F.col("l_discount").cast("decimal(18,4)")
    )
    return joined.groupBy(
        "supp_nation", "cust_nation", F.year("l_shipdate").cast("long").alias("l_year")
    ).agg(F.sum(volume).cast("double").alias("revenue"))


@register(
    "tpch_q15",
    # revenue summed in DECIMAL: exact and order-independent, so the
    # argmax supplier (revenue = MAX(revenue)) is boundary-safe across
    # engines (a double sum could tie-break differently). Only the
    # FINAL projection casts to DOUBLE — a DECIMAL output column
    # degrades to float64 in DuckDB's pandas path and hash-mismatches
    # the driver on identical values.
    "WITH revenue AS (SELECT l_suppkey AS supplier_no,"
    " CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,4))"
    " * (1 - CAST(l_discount AS DECIMAL(18,4)))) AS DECIMAL(30,8)) AS total_revenue"
    " FROM lineitem WHERE l_shipdate >= TIMESTAMP '1996-01-01'"
    " AND l_shipdate < TIMESTAMP '1996-04-01' GROUP BY l_suppkey)"
    " SELECT s_suppkey, s_name, CAST(total_revenue AS DOUBLE) AS total_revenue"
    " FROM supplier JOIN revenue ON s_suppkey = supplier_no"
    " WHERE total_revenue = (SELECT MAX(total_revenue) FROM revenue)",
)
def tpch_q15(spark, sf_dir):
    """TPC-H Q15 (top supplier): the revenue 'view' is one partial/
    final aggregate of a quarter of lineitem; its global max is a
    1-row broadcast back onto itself; supplier is a broadcast dim.
    Revenue accumulates in DECIMAL so the max-equality is exact."""
    li = _t(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1996-04-01").cast("timestamp"))
    )
    rev = F.col("l_extendedprice").cast("decimal(18,4)") * (
        F.lit(1) - F.col("l_discount").cast("decimal(18,4)")
    )
    revenue = li.groupBy(F.col("l_suppkey").alias("supplier_no")).agg(
        F.sum(rev).cast("decimal(30,8)").alias("total_revenue")
    )
    top = revenue.agg(F.max("total_revenue").alias("_max"))
    supp = _t(spark, sf_dir, "supplier")
    return (
        revenue.join(F.broadcast(top), F.col("total_revenue") == F.col("_max"))
        .join(F.broadcast(supp), F.col("supplier_no") == supp["s_suppkey"])
        .select(
            "s_suppkey",
            "s_name",
            F.col("total_revenue").cast("double").alias("total_revenue"),
        )
    )


@register(
    "tpch_q17",
    # part has no p_container (TESTDATA.md): the brand predicate alone
    # scopes the parts, the correlated 0.2*avg(quantity) is faithful.
    # l_quantity is integral, so each engine's AVG is the same exact
    # integer sum over one division — the < boundary cannot flip.
    # the numerator accumulates in DECIMAL and casts the exact sum to
    # DOUBLE before the /7.0 — one deterministic conversion plus one
    # IEEE division on both engines, no ROUND(double) boundary.
    "SELECT CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,4))) AS DOUBLE) / 7.0"
    " AS avg_yearly FROM lineitem"
    " JOIN part ON p_partkey = l_partkey WHERE p_brand = 'Brand#4'"
    " AND l_quantity < (SELECT 0.2 * AVG(l_quantity) FROM lineitem l2"
    " WHERE l2.l_partkey = p_partkey)",
)
def tpch_q17(spark, sf_dir):
    """TPC-H Q17 (small-quantity-order revenue): the correlated
    scalar subquery decorrelates into a per-part aggregate joined
    back on partkey — one partial/final agg over lineitem + one
    broadcast of the brand-filtered part dim; no per-row re-scan,
    which is what the correlated form would naively cost."""
    li = _t(spark, sf_dir, "lineitem")
    part = _t(spark, sf_dir, "part").filter(F.col("p_brand") == "Brand#4")
    per_part = li.groupBy(F.col("l_partkey").alias("_pk")).agg(
        (F.lit(0.2) * F.avg("l_quantity")).alias("_qty_cap")
    )
    joined = (
        li.join(F.broadcast(part), li["l_partkey"] == part["p_partkey"])
        .join(per_part, li["l_partkey"] == F.col("_pk"))
        .filter(F.col("l_quantity") < F.col("_qty_cap"))
    )
    return joined.agg(
        (F.sum(F.col("l_extendedprice").cast("decimal(18,4)")).cast("double") / 7.0).alias(
            "avg_yearly"
        )
    )


@register(
    "tpch_q21",
    # lineitem has no commit/receipt dates (TESTDATA.md): the "late"
    # predicate substitutes l_returnflag = 'R'. The SHAPE is faithful:
    # multi-supplier orders where l1's supplier is the ONLY failing
    # one — EXISTS another supplier's lineitem, NOT EXISTS another
    # supplier's failing lineitem.
    "SELECT s_name, COUNT(*) AS numwait FROM supplier"
    " JOIN lineitem l1 ON s_suppkey = l1.l_suppkey"
    " JOIN orders ON o_orderkey = l1.l_orderkey"
    " JOIN nation ON s_nationkey = n_nationkey"
    " WHERE o_orderstatus = 'F' AND n_name IN ('NATION_1','NATION_2','NATION_3')"
    " AND l1.l_returnflag = 'R'"
    " AND EXISTS (SELECT 1 FROM lineitem l2 WHERE l2.l_orderkey = l1.l_orderkey"
    " AND l2.l_suppkey <> l1.l_suppkey)"
    " AND NOT EXISTS (SELECT 1 FROM lineitem l3 WHERE l3.l_orderkey = l1.l_orderkey"
    " AND l3.l_suppkey <> l1.l_suppkey AND l3.l_returnflag = 'R')"
    " GROUP BY s_name",
)
def tpch_q21(spark, sf_dir):
    """TPC-H Q21 (waiting suppliers). Spark-first decorrelation: the
    EXISTS/NOT-EXISTS pair over lineitem collapses into ONE per-order
    aggregate — distinct suppliers and distinct failing suppliers —
    joined back on the order key. l1's supplier failing plus
    n_failing = 1 plus n_suppliers >= 2 is exactly 'the only failing
    supplier in a multi-supplier order'. Two shuffles on l_orderkey
    (agg + join) replace two self-joins of the fact table."""
    from stockify_spark.operators.joins import fact_join

    li = _t(spark, sf_dir, "lineitem")
    ostats = li.groupBy("l_orderkey").agg(
        F.countDistinct("l_suppkey").alias("_n_supp"),
        F.countDistinct(
            F.when(F.col("l_returnflag") == "R", F.col("l_suppkey"))
        ).alias("_n_failed"),
    )
    orders = _t(spark, sf_dir, "orders").filter(F.col("o_orderstatus") == "F")
    supp = _t(spark, sf_dir, "supplier")
    nation = _t(spark, sf_dir, "nation").filter(
        F.col("n_name").isin("NATION_1", "NATION_2", "NATION_3")
    )
    l1 = li.filter(F.col("l_returnflag") == "R").select("l_orderkey", "l_suppkey")
    joined = (
        fact_join(l1, orders, l1["l_orderkey"] == orders["o_orderkey"])
        .join(F.broadcast(supp), l1["l_suppkey"] == supp["s_suppkey"])
        .join(F.broadcast(nation), F.col("s_nationkey") == nation["n_nationkey"])
        .join(
            ostats.withColumnRenamed("l_orderkey", "_ok"),
            F.col("l_orderkey") == F.col("_ok"),
        )
        .filter((F.col("_n_supp") >= 2) & (F.col("_n_failed") == 1))
    )
    return joined.groupBy("s_name").agg(F.count(F.lit(1)).alias("numwait"))


@register(
    "groupby_time_rollup",
    # hypertable-style continuous-aggregate shape: one pass emits the
    # day, month, year, and grand-total grains via ROLLUP. Sums ride
    # in DECIMAL (exact, order-independent) — grand-total groups sum
    # ~60k doubles, where engine summation order would drift. The
    # FINAL total casts to DOUBLE (correctly rounded on both engines)
    # because a DECIMAL output degrades to float64 in DuckDB's pandas
    # path and hash-mismatches the driver on identical values.
    "SELECT CAST(EXTRACT(year FROM ts) AS BIGINT) AS y,"
    " CAST(EXTRACT(month FROM ts) AS BIGINT) AS m,"
    " CAST(EXTRACT(day FROM ts) AS BIGINT) AS d,"
    " COUNT(*) AS n_events,"
    " CAST(CAST(SUM(CAST(value AS DECIMAL(18,6))) AS DECIMAL(38,6)) AS DOUBLE) AS total"
    " FROM events GROUP BY ROLLUP (y, m, d)",
)
def groupby_time_rollup(spark, sf_dir):
    """Time-hierarchy rollup (the hypertable/continuous-aggregate
    shape): day → month → year → total in ONE partial/final aggregate
    pass — Spark expands the rollup grouping sets map-side, so the
    shuffle carries one partial row per (grain, group), not one scan
    per grain. At 100 TB this replaces four separate aggregation jobs
    and is the natural incremental-materialization target (each grain
    is derivable from the finer one)."""
    ev = _t(spark, sf_dir, "events")
    g = ev.select(
        F.year("ts").cast("long").alias("y"),
        F.month("ts").cast("long").alias("m"),
        F.dayofmonth("ts").cast("long").alias("d"),
        F.col("value").cast("decimal(18,6)").alias("_v"),
    )
    return g.rollup("y", "m", "d").agg(
        F.count(F.lit(1)).alias("n_events"),
        F.sum("_v").cast("decimal(38,6)").cast("double").alias("total"),
    )


@register(
    "agg_sum_f32",
    # float32 fidelity mode (SURVEY §1.3): inputs quantized to REAL —
    # IEEE double->float rounding is identical in both engines, so
    # min/max are bit-exact and the double-accumulated sum agrees to
    # the rounded cent. The reference's float32-atomic accumulator
    # drift is a documented non-goal (nondeterministic on the GPU
    # itself; both SQL engines promote float sums to double).
    "SELECT ROUND(SUM(CAST(l_extendedprice AS REAL)), 2) AS sum_price_f32,"
    " MIN(CAST(l_extendedprice AS REAL)) AS min_price_f32,"
    " MAX(CAST(l_extendedprice AS REAL)) AS max_price_f32,"
    " COUNT(*) AS cnt FROM lineitem WHERE CAST(l_quantity AS REAL) >= 25",
)
def agg_sum_f32(spark, sf_dir):
    """The reference's experiment 1.x+2.a in its OWN precision: scan
    → float32-quantized filter + aggregate (sumLowPrice used float
    atomics, stockify.cu:135-138). Comparisons and min/max happen on
    the quantized values, so the float32 semantics — including any
    filter-boundary flips caused by quantization — are reproduced."""
    from stockify_spark.operators import compare, filter_rows, global_agg

    li = _t_f32(spark, sf_dir, "lineitem")
    return global_agg(
        filter_rows(li, F.col("l_quantity") >= 25.0),
        F.round(F.sum("l_extendedprice"), 2).alias("sum_price_f32"),
        F.min("l_extendedprice").alias("min_price_f32"),
        F.max("l_extendedprice").alias("max_price_f32"),
        F.count(F.lit(1)).alias("cnt"),
    )


def _t_f32(spark, sf_dir, name):
    from stockify_spark.sources.io import load_table

    return load_table(spark, sf_dir, name, float32=True)


@register(
    "dedup_embedding_clusters",
    # bucketed near-dup pairs (same deterministic IVF spec as
    # sim_embedding_dup) → transitive closure via a recursive CTE
    "WITH RECURSIVE c AS (SELECT vec_id AS cid, embedding AS cvec"
    " FROM embeddings WHERE vec_id < 16),"
    " s AS (SELECT vec_id, embedding, cid,"
    " ROW_NUMBER() OVER (PARTITION BY vec_id"
    " ORDER BY list_cosine_similarity(embedding, cvec) DESC, cid) AS rnk"
    " FROM embeddings CROSS JOIN c),"
    " pairs AS (SELECT DISTINCT a.vec_id AS id_a, b.vec_id AS id_b"
    " FROM (SELECT vec_id, embedding, cid FROM s WHERE rnk <= 3) a"
    " JOIN (SELECT vec_id, embedding, cid FROM s WHERE rnk <= 3) b"
    " ON a.cid = b.cid AND a.vec_id < b.vec_id"
    " WHERE list_cosine_similarity(a.embedding, b.embedding) >= 0.4),"
    " edges AS (SELECT id_a AS src, id_b AS dst FROM pairs"
    " UNION ALL SELECT id_b, id_a FROM pairs),"
    " reach(node, lab) AS (SELECT src, src FROM edges"
    " UNION SELECT e.dst, r.lab FROM reach r JOIN edges e ON e.src = r.node)"
    " SELECT node AS vec_id, MIN(lab) AS component FROM reach GROUP BY node",
)
def dedup_embedding_clusters(spark, sf_dir):
    """Embedding near-duplicate CLUSTERS (SemDeDup shape): bucketed
    IVF candidate pairs → connected components, so each duplicate
    group keeps one representative. The same Pregel-lite min-label
    propagation as dedup_clusters, differentially verified against
    the recursive-CTE transitive closure over the identical
    deterministic pair spec."""
    from stockify_spark.llm.dedup import connected_components
    from stockify_spark.llm.similarity import embedding_dup_pairs_bucketed

    emb = _t(spark, sf_dir, "embeddings")
    edges = embedding_dup_pairs_bucketed(emb, threshold=0.4, n_centroids=16, n_probe=3)
    return connected_components(edges).select(
        F.col("node").alias("vec_id"), "component"
    )


@register(
    "pipeline_token_pack",
    # greedy sequence packing: documents (in doc_id order) are
    # assigned to fixed-capacity context windows by their exclusive
    # running token count. Token counts are integers, so the prefix
    # sums are exact in any engine and the comparison is hash-exact.
    # the window SUM over BIGINT is HUGEINT in DuckDB, which degrades
    # to float64 in the driver's pandas path — CAST AS BIGINT keeps
    # start_tok/pack_id hash-type-stable against Spark's int64.
    "WITH t AS (SELECT doc_id,"
    " CAST(len(string_split_regex(trim(lower(text)), '\\s+')) AS BIGINT) AS n_tokens"
    " FROM documents),"
    " c AS (SELECT doc_id, n_tokens, CAST(COALESCE(SUM(n_tokens) OVER ("
    " ORDER BY doc_id ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT)"
    " AS start_tok FROM t)"
    " SELECT doc_id, n_tokens, start_tok, CAST(start_tok // 2048 AS BIGINT) AS pack_id FROM c",
)
def pipeline_token_pack(spark, sf_dir):
    """LLM-pretraining sequence packing: each document lands in the
    context window (pack) where its starting token offset falls —
    concat-and-chunk over the corpus order. The running offset comes
    from operators.windows.bucketed_prefix_sum, the two-phase
    parallel scan: per-bucket totals, running offsets over the
    bucket-total table (bucket_size× smaller), within-bucket windows
    — the ORACLE is the plain global-order window, so the
    distributed scan is proven equal to the single-partition form.
    At 100 TB the row-scale data never funnels through one task."""
    from stockify_spark.functions.text import token_count
    from stockify_spark.operators.windows import bucketed_prefix_sum

    docs = _t(spark, sf_dir, "documents").select(
        "doc_id", token_count("text").cast("long").alias("n_tokens")
    )
    out = bucketed_prefix_sum(
        docs, "doc_id", "n_tokens", "start_tok", bucket_size=128, exclusive=True
    )
    return out.select(
        "doc_id",
        "n_tokens",
        "start_tok",
        F.expr("start_tok div 2048").alias("pack_id"),
    )


@register(
    "join_salted",
    # salting is result-invariant: the oracle is the PLAIN join, so
    # the hash-exact match proves the skew rewrite changes the plan,
    # never the answer.
    "SELECT l_orderkey, l_linenumber, l_quantity, o_totalprice, o_orderstatus"
    " FROM lineitem JOIN orders ON l_orderkey = o_orderkey"
    " WHERE o_orderstatus = 'F'",
)
def join_salted(spark, sf_dir):
    """Skew-resistant fact⋈fact join (operators.joins.salted_join):
    left rows take a deterministic salt, right rows replicate once
    per salt value, the shuffle key becomes (key, salt) — a key
    holding 30% of the table spreads over `salt` tasks instead of one
    straggler. For when AQE's runtime skew split isn't available
    (e.g. a fixed partitioning is reused downstream)."""
    from stockify_spark.operators.joins import salted_join

    li = _t(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_linenumber", "l_quantity"
    )
    orders = (
        _t(spark, sf_dir, "orders")
        .filter(F.col("o_orderstatus") == "F")
        .select(
            F.col("o_orderkey").alias("l_orderkey"), "o_totalprice", "o_orderstatus"
        )
    )
    return salted_join(li, orders, "l_orderkey", salt=8)


@register(
    "join_range_bucketed",
    # point-in-interval join; intervals derive from exact MINs (no
    # summation-order noise), and the bucketed candidate pass ends in
    # an exact filter, so results hash-match the native range join.
    "WITH bands AS (SELECT p_brand, MIN(p_retailprice) AS lo,"
    " MIN(p_retailprice) + 500 AS hi FROM part GROUP BY p_brand)"
    " SELECT p.p_partkey, b.p_brand AS band_brand"
    " FROM part p JOIN bands b"
    " ON p.p_retailprice >= b.lo AND p.p_retailprice <= b.hi",
)
def join_range_bucketed(spark, sf_dir):
    """Point-in-interval join via bucketization (operators.joins.
    range_join_bucketed): each interval explodes into the width/
    bucket_width buckets it covers, candidates come from a plain
    equi-join on bucket id, then the exact predicate filters. Turns
    the O(n·m) non-equi join into a shuffle whose fan-out is bounded
    by interval width — the standard scale trick when intervals are
    short relative to the domain (DuckDB meanwhile runs its native
    IEJoin: two engines, two algorithms, one result)."""
    from stockify_spark.operators.joins import range_join_bucketed

    part = _t(spark, sf_dir, "part")
    bands = part.groupBy(F.col("p_brand").alias("band_brand")).agg(
        F.min("p_retailprice").alias("lo"),
        (F.min("p_retailprice") + 500).alias("hi"),
    )
    joined = range_join_bucketed(
        part.select("p_partkey", "p_retailprice"),
        bands,
        left_point="p_retailprice",
        right_lo="lo",
        right_hi="hi",
        bucket_width=250.0,
    )
    return joined.select("p_partkey", "band_brand")


# ---------------------------------------------------------------------------
# Round-3 training-pipeline additions: repetition-based quality
# filtering (Gopher/MassiveText) and benchmark contamination.
# ---------------------------------------------------------------------------

_TOKS3 = "string_split_regex(trim(lower(text)), '\\s+')"


@register(
    "doc_quality_gopher",
    # All fractions are single IEEE divisions of exact integer counts
    # → bit-identical cross-engine; SUM() outputs are CAST to BIGINT
    # (DuckDB HUGEINT degrades to float64 in the driver's pandas
    # path).
    f"WITH d AS (SELECT doc_id, {_TOKS3} AS l FROM documents),"
    " tc AS (SELECT doc_id, tok, COUNT(*) AS c FROM"
    "  (SELECT doc_id, unnest(l) AS tok FROM d) GROUP BY doc_id, tok),"
    " uni AS (SELECT doc_id, CAST(SUM(c) AS BIGINT) AS n_tokens,"
    "  MAX(c) AS top_c, COUNT(*) AS n_distinct FROM tc GROUP BY doc_id),"
    " bg AS (SELECT doc_id, array_to_string(l[i + 1:i + 2], ' ') AS b FROM"
    "  (SELECT doc_id, l, unnest(range(greatest(len(l) - 1, 0))) AS i FROM d)),"
    " bc AS (SELECT doc_id, b, COUNT(*) AS c FROM bg GROUP BY doc_id, b),"
    " bi AS (SELECT doc_id, CAST(SUM(c) AS BIGINT) AS n_bigrams,"
    "  MAX(c) AS top_bg_c FROM bc GROUP BY doc_id)"
    " SELECT u.doc_id, u.n_tokens,"
    "  CAST(u.top_c AS DOUBLE) / u.n_tokens AS top_token_frac,"
    "  CAST(u.n_tokens - u.n_distinct AS DOUBLE) / u.n_tokens AS dup_token_frac,"
    "  CASE WHEN coalesce(b.n_bigrams, 0) > 0"
    "   THEN CAST(b.top_bg_c AS DOUBLE) / b.n_bigrams ELSE 0.0 END"
    "   AS top_bigram_frac,"
    "  (u.n_tokens >= 30 AND CAST(u.top_c AS DOUBLE) / u.n_tokens <= 0.12"
    "   AND CAST(u.n_tokens - u.n_distinct AS DOUBLE) / u.n_tokens <= 0.6)"
    "   AS keep"
    " FROM uni u LEFT JOIN bi b USING (doc_id)",
)
def doc_quality_gopher(spark, sf_dir):
    """Gopher/MassiveText repetition filters (functions.text.
    repetition_stats): most-common-token fraction, duplicate-token
    fraction, most-common-bigram fraction, and the keep decision the
    pipeline would act on. Two partial-aggregated groupBys + one
    per-doc lead() window — nothing corpus-global."""
    from stockify_spark.functions.text import repetition_stats

    docs = _t(spark, sf_dir, "documents")
    stats = repetition_stats(docs, "text", "doc_id")
    return stats.select(
        "doc_id",
        "n_tokens",
        "top_token_frac",
        "dup_token_frac",
        "top_bigram_frac",
        (
            (F.col("n_tokens") >= 30)
            & (F.col("top_token_frac") <= 0.12)
            & (F.col("dup_token_frac") <= 0.6)
        ).alias("keep"),
    )


_SHINGLE8_SQL = (
    f"list_distinct(list_transform(range(greatest(len({_TOKS3}) - 8, 0) + 1),"
    f" i -> array_to_string({_TOKS3}[i + 1:i + 8], ' ')))"
)


@register(
    "pipeline_contamination",
    # The oracle names the identical candidate set because the
    # shingle hash is the cross-engine md5-prefix family.
    f"WITH d AS (SELECT doc_id, {_SHINGLE8_SQL} AS sh FROM documents),"
    " u AS (SELECT doc_id, CAST(CONCAT('0x', substr(md5(s), 1, 15)) AS BIGINT)"
    "  AS h FROM (SELECT doc_id, unnest(sh) AS s FROM d)),"
    " e AS (SELECT doc_id AS eval_id, h FROM u WHERE doc_id < 20),"
    " t AS (SELECT doc_id AS train_id, h FROM u WHERE doc_id >= 20)"
    " SELECT train_id, eval_id, CAST(COUNT(*) AS BIGINT) AS n_shared"
    " FROM t JOIN e USING (h) GROUP BY train_id, eval_id",
)
def pipeline_contamination(spark, sf_dir):
    """Benchmark contamination (llm/dedup.contamination_pairs): train
    docs sharing any 8-token shingle with the eval set (doc_id < 20
    plays the benchmark). The eval side broadcasts, so the training
    corpus never shuffles — the pre-training hygiene check at 100 TB
    is a map-side join against a few thousand benchmark shingles."""
    from stockify_spark.llm.dedup import contamination_pairs

    docs = _t(spark, sf_dir, "documents")
    return contamination_pairs(docs, "text", "doc_id", eval_max_id=20, k=8)


# ---------------------------------------------------------------------------
# Compressed-container video: MJPEG-in-AVI (llm/avi.py). The clips
# share ids and SOURCE pattern frames with the Y4M rows, so the same
# closed-form constants drive both oracle families.
# ---------------------------------------------------------------------------

@register(
    "media_avi_index",
    # Exact oracle: everything here comes from the RIFF headers and
    # the idx1 frame index — no entropy decode — so the values are
    # deterministic container metadata, hash-checked bit-for-bit.
    # n_frames literals come from the shared pattern-constants helper
    # (registry_ext2._video_pattern_constants; Python banker's round,
    # same as the encoder).
    None,  # filled below: needs the registry_ext2 literal helper
)
def media_avi_index(spark, sf_dir):
    """Container metadata probe over REAL MJPEG AVIs: mapInPandas
    parses RIFF headers + idx1 per payload (llm/avi.avi_info) and
    never touches frame entropy data — the filter-before-decode
    contract for compressed video, where routing/batching decisions
    read O(header) bytes of a multi-GB clip."""
    import pandas as pd

    from stockify_spark.llm.multimodal import synthetic_media_avi
    from pyspark.sql import types as T

    schema = T.StructType(
        [
            T.StructField("media_id", T.LongType(), False),
            T.StructField("width", T.IntegerType(), False),
            T.StructField("height", T.IntegerType(), False),
            T.StructField("fps_num", T.IntegerType(), False),
            T.StructField("fps_den", T.IntegerType(), False),
            T.StructField("n_frames", T.LongType(), False),
        ]
    )

    def run(batches):
        from stockify_spark.llm.avi import avi_info

        for pdf in batches:
            rows = {k.name: [] for k in schema.fields}
            for mid, content in zip(pdf["media_id"], pdf["content"]):
                w, h, fps, n = avi_info(bytes(content))
                rows["media_id"].append(mid)
                rows["width"].append(w)
                rows["height"].append(h)
                rows["fps_num"].append(fps[0])
                rows["fps_den"].append(fps[1])
                rows["n_frames"].append(n)
            yield pd.DataFrame(rows)

    return synthetic_media_avi(spark, n=96).mapInPandas(run, schema)


@register(
    "media_container_mjpeg",
    None,  # filled below: needs the registry_ext2 literal helper
)
def media_container_mjpeg(spark, sf_dir):
    """Sampled-frame decode from a COMPRESSED container: explode the
    250 ms grid BEFORE decode, then each row seeks frame k via the
    AVI idx1 index and entropy-decodes ONLY that JPEG
    (llm/multimodal.sample_frames → llm/avi.decode_avi_mjpeg).
    frame_index is exact; mean luma is tolerance-of-truth against the
    pre-encode pattern spec — JPEG quantization drifts the mean by at
    most 0.57 across all 32 clips (tol 1.5), so luma_ok == TRUE
    asserts the full container-parse → huffman → IDCT path."""
    import numpy as np

    from stockify_spark.llm.multimodal import (
        _pattern_video,
        sample_frames,
        synthetic_media_avi,
    )

    exp_rows = []
    for i in range(2, 96, 3):
        frames = _pattern_video(i, 42, duration_ms=1000 + i)
        for idx in range(len(frames)):
            exp_rows.append((i, idx, float(np.asarray(frames[idx], dtype=np.float64).mean())))
    exp = spark.createDataFrame(exp_rows, "media_id long, frame_index long, e_luma double")

    out = sample_frames(synthetic_media_avi(spark, n=96), every_ms=250)
    return out.join(F.broadcast(exp), ["media_id", "frame_index"]).select(
        "media_id",
        "frame_ts_ms",
        "frame_index",
        (F.abs(F.col("mean_luma") - F.col("e_luma")) <= 1.5).alias("luma_ok"),
    )


# ---------------------------------------------------------------------------
# Compressed-container video #2: Photo-JPEG MP4 (llm/mp4.py). Same
# clip ids and SOURCE pattern frames as the AVI family — the
# container differs (ISO BMFF stbl tables instead of RIFF idx1), the
# per-frame codec and therefore the oracle constants are identical.
# ---------------------------------------------------------------------------

@register(
    "media_mp4_index",
    None,  # filled below: needs the registry_ext2 literal helper
)
def media_mp4_index(spark, sf_dir):
    """Container metadata probe over REAL Photo-JPEG MP4s:
    mapInPandas walks the ISO BMFF moov/stbl boxes per payload
    (llm/mp4.mp4_info) and never touches mdat entropy data — the
    filter-before-decode contract where routing decisions read
    O(moov) bytes of a multi-GB clip. fps comes back as the exact
    (timescale, stts delta) rational the muxer stored."""
    import pandas as pd

    from stockify_spark.llm.multimodal import synthetic_media_mp4
    from pyspark.sql import types as T

    schema = T.StructType(
        [
            T.StructField("media_id", T.LongType(), False),
            T.StructField("width", T.IntegerType(), False),
            T.StructField("height", T.IntegerType(), False),
            T.StructField("fps_num", T.IntegerType(), False),
            T.StructField("fps_den", T.IntegerType(), False),
            T.StructField("n_frames", T.LongType(), False),
        ]
    )

    def run(batches):
        from stockify_spark.llm.mp4 import mp4_info

        for pdf in batches:
            rows = {k.name: [] for k in schema.fields}
            for mid, content in zip(pdf["media_id"], pdf["content"]):
                w, h, fps, n = mp4_info(bytes(content))
                rows["media_id"].append(mid)
                rows["width"].append(w)
                rows["height"].append(h)
                rows["fps_num"].append(fps[0])
                rows["fps_den"].append(fps[1])
                rows["n_frames"].append(n)
            yield pd.DataFrame(rows)

    return synthetic_media_mp4(spark, n=96).mapInPandas(run, schema)


@register(
    "media_container_mp4",
    None,  # filled below: needs the registry_ext2 literal helper
)
def media_container_mp4(spark, sf_dir):
    """Sampled-frame decode from the MP4 container: explode the
    250 ms grid BEFORE decode, then each row seeks sample k via the
    stbl tables and entropy-decodes ONLY that JPEG
    (llm/multimodal.sample_frames → llm/mp4.decode_mp4_mjpeg). Same
    tolerance-of-truth bound as the AVI twin: the per-frame codec is
    the identical baseline JPEG, so quantization drifts mean luma by
    at most 0.57 across all 32 clips (tol 1.5)."""
    import numpy as np

    from stockify_spark.llm.multimodal import (
        _pattern_video,
        sample_frames,
        synthetic_media_mp4,
    )

    exp_rows = []
    for i in range(2, 96, 3):
        frames = _pattern_video(i, 42, duration_ms=1000 + i)
        for idx in range(len(frames)):
            exp_rows.append((i, idx, float(np.asarray(frames[idx], dtype=np.float64).mean())))
    exp = spark.createDataFrame(exp_rows, "media_id long, frame_index long, e_luma double")

    out = sample_frames(synthetic_media_mp4(spark, n=96), every_ms=250)
    return out.join(F.broadcast(exp), ["media_id", "frame_index"]).select(
        "media_id",
        "frame_ts_ms",
        "frame_index",
        (F.abs(F.col("mean_luma") - F.col("e_luma")) <= 1.5).alias("luma_ok"),
    )


def _register_container_oracles() -> None:
    """The AVI and MP4 oracles need registry_ext2's pattern-constants
    literal helper; registering them here keeps the import one-way
    (ext3 → ext2) and the SQL single-sourced with the Y4M family.
    The MP4 oracles are textually the AVI ones: same ids, dims, fps,
    frame grid — the containers differ only in how the bytes are laid
    out, which is exactly what the queries verify."""
    from stockify_spark.registry import ORACLE
    from stockify_spark.registry_ext2 import _video_pattern_constants

    v = "WITH v(media_id, ofs, speed, duration_ms, n_frames) AS (VALUES " + _video_pattern_constants() + ")"
    index_sql = (
        v + " SELECT media_id, 64 AS width, 48 AS height,"
        " 10 AS fps_num, 1 AS fps_den, n_frames FROM v"
    )
    frames_sql = (
        v + ", ts AS (SELECT media_id, n_frames,"
        "  unnest(range(0, duration_ms, 250)) AS frame_ts_ms FROM v)"
        " SELECT media_id, frame_ts_ms,"
        "  least(frame_ts_ms // 100, n_frames - 1) AS frame_index,"
        "  TRUE AS luma_ok FROM ts"
    )
    ORACLE["media_avi_index"] = index_sql
    ORACLE["media_container_mjpeg"] = frames_sql
    ORACLE["media_mp4_index"] = index_sql
    ORACLE["media_container_mp4"] = frames_sql


_register_container_oracles()
