"""Round-6 wave: tokenizer training, chunking, entity-resolution
join, sketch-pruned exact aggregation.

Each query has an exact DuckDB oracle (driver contract,
__spark_entry__.py). Reference attribution: the reference engine
(stockify.cu) has none of these surfaces; they extend the
training-data-pipeline coverage mandated by SURVEY §2 (LLM ops).
"""

from __future__ import annotations

from pyspark.sql import Window as W
from pyspark.sql import functions as F

from stockify_spark.functions.bpe import bpe_learn, word_frequencies
from stockify_spark.llm.dedup import fuzzy_set_join
from stockify_spark.operators.aggregates import exact_heavy_hitters
from stockify_spark.registry import register, _t


# ---------------------------------------------------------------------------
# doc_chunk_stride — context-window chunking with overlap
# ---------------------------------------------------------------------------

_CHUNK_W, _CHUNK_S = 64, 48

_CHUNK_SQL = f"""
WITH t AS (SELECT doc_id, string_split(text, ' ') AS toks FROM documents),
e AS (SELECT doc_id, toks,
             unnest(range(0, ((len(toks)-1)//{_CHUNK_S})+1)) AS i FROM t)
SELECT doc_id, i::BIGINT AS chunk_id,
       array_to_string(list_slice(toks, i*{_CHUNK_S}+1, i*{_CHUNK_S}+{_CHUNK_W}), ' ') AS chunk_text,
       len(list_slice(toks, i*{_CHUNK_S}+1, i*{_CHUNK_S}+{_CHUNK_W}))::BIGINT AS n_tokens
FROM e
"""


@register("doc_chunk_stride", _CHUNK_SQL)
def doc_chunk_stride(spark, sf_dir):
    """Sliding-window document chunking: windows of 64 tokens with
    stride 48 (16-token overlap) — the standard way a long document
    becomes training-context rows. Pure per-row expressions
    (split → sequence → explode → slice): embarrassingly parallel,
    no shuffle, and the explode multiplies rows AFTER the scan so
    column pruning still reaches parquet."""
    docs = _t(spark, sf_dir, "documents")
    toks = F.split("text", " ")
    n = F.size("toks")
    return (
        docs.select("doc_id", toks.alias("toks"))
        .select(
            "doc_id",
            "toks",
            F.explode(
                F.sequence(F.lit(0), F.floor((n - 1) / _CHUNK_S).cast("int"))
            ).alias("i"),
        )
        .select(
            "doc_id",
            F.col("i").cast("long").alias("chunk_id"),
            F.array_join(
                F.slice("toks", F.col("i") * _CHUNK_S + 1, F.lit(_CHUNK_W)), " "
            ).alias("chunk_text"),
            F.size(
                F.slice("toks", F.col("i") * _CHUNK_S + 1, F.lit(_CHUNK_W))
            ).cast("long").alias("n_tokens"),
        )
    )


# ---------------------------------------------------------------------------
# tokenizer_bpe_merges — distributed BPE merge learning
# ---------------------------------------------------------------------------

def _bpe_oracle(steps: int) -> str:
    sel = " UNION ALL ".join(
        f"SELECT {i}::BIGINT AS step, l AS lhs, r AS rhs, c AS pair_cnt FROM best{i}"
        for i in range(1, steps + 1)
    )
    return _bpe_ctes(steps) + f"\nSELECT * FROM ({sel}) ORDER BY step"


def _bpe_ctes(steps: int) -> str:
    """The shared train-chain CTEs: words → s0 → (p/best/s)×steps.
    Used by the merge-learning oracle here and the encoder oracle in
    registry_ext43 (apply = read s{steps} instead of the bests)."""
    sql = """WITH words AS (
  SELECT w AS word, COUNT(*)::BIGINT AS cnt
  FROM (SELECT unnest(string_split(lower(text),' ')) AS w FROM documents)
  WHERE regexp_matches(w, '^[a-z]+$') AND length(w) BETWEEN 2 AND 12
  GROUP BY w
), s0 AS (SELECT regexp_replace(word, '(.)', ',\\1,', 'g') AS s, cnt FROM words)"""
    for i in range(1, steps + 1):
        sql += f""",
p{i} AS (
  SELECT syms[i] AS l, syms[i+1] AS r, SUM(cnt)::BIGINT AS c
  FROM (SELECT string_split(substr(s, 2, length(s)-2), ',,') AS syms, cnt FROM s{i-1}),
       LATERAL (SELECT unnest(range(1, len(syms))) AS i) u
  GROUP BY 1, 2
),
best{i} AS (SELECT l, r, c FROM p{i} ORDER BY c DESC, l, r LIMIT 1),
s{i} AS (
  SELECT replace(s, ',' || b.l || ',,' || b.r || ',', ',' || b.l || b.r || ',') AS s, cnt
  FROM s{i-1}, best{i} b
)"""
    return sql


@register("tokenizer_bpe_merges", _bpe_oracle(4))
def tokenizer_bpe_merges(spark, sf_dir):
    """First 4 BPE merges learned over the corpus vocabulary
    (functions/bpe.py). Each step is one pair-count shuffle over the
    distinct-word table + a map-side literal replace; the serial BPE
    semantics (left-to-right non-overlapping merges, count-then-lex
    tie-break) are reproduced exactly, proven by the chained-CTE
    DuckDB oracle."""
    words = word_frequencies(_t(spark, sf_dir, "documents"))
    return bpe_learn(spark, words, steps=4)


# ---------------------------------------------------------------------------
# join_fuzzy_parts — entity-resolution R-S set-similarity join
# ---------------------------------------------------------------------------

_FUZZY_SQL = """
WITH names AS (SELECT p_name, COUNT(*)::BIGINT AS c FROM part GROUP BY p_name),
r AS (SELECT p_name, c, list_distinct(string_split(p_name, ' ')) AS t FROM names
      WHERE strpos('02468ace', substr(md5(p_name), 1, 1)) > 0),
s AS (SELECT p_name, c, list_distinct(string_split(p_name, ' ')) AS t FROM names
      WHERE strpos('02468ace', substr(md5(p_name), 1, 1)) = 0),
j AS (SELECT r.p_name AS a, s.p_name AS b, (r.c * s.c)::BIGINT AS np,
             len(list_intersect(r.t, s.t))::DOUBLE AS i,
             (len(r.t) + len(s.t))::DOUBLE AS n
      FROM r, s)
SELECT a AS name_a, b AS name_b, ROUND(i / (n - i), 6) AS jaccard, np AS n_pairs
FROM j WHERE i / (n - i) >= 0.3
"""


@register("join_fuzzy_parts", _FUZZY_SQL)
def join_fuzzy_parts(spark, sf_dir):
    """Entity-resolution join on token-set Jaccard >= 0.3 between two
    hash-split halves of the part-name CATALOG (llm/dedup.
    fuzzy_set_join), with each match weighted by the number of raw
    part pairs it represents.

    Scale design — canonicalize, then fuzzy-join the distinct side:
    the raw-row fuzzy join is output-quadratic whenever names repeat
    (at sf0.1 it emits ~1.5M pairs for 64 distinct names), so the
    scalable plan aggregates to distinct names first (one shuffle,
    cardinality = |vocabulary| not |rows|), runs the prefix-filtered
    R-S similarity join on that small side, and carries the group
    sizes so the raw pair count is reported without materializing the
    pairs. The oracle is the brute-force distinct-name cross join."""
    part = _t(spark, sf_dir, "part")
    names = part.groupBy("p_name").agg(F.count(F.lit(1)).alias("c"))
    tagged = names.withColumn(
        "_even", F.substring(F.md5("p_name"), 1, 1).isin(*"02468ace")
    ).withColumn("toks", F.array_distinct(F.split("p_name", " ")))
    left = tagged.filter(F.col("_even"))
    right = tagged.filter(~F.col("_even"))
    matched = fuzzy_set_join(left, right, "p_name", "toks", threshold=0.3)
    ca = left.select(F.col("p_name").alias("id_a"), F.col("c").alias("_ca"))
    cb = right.select(F.col("p_name").alias("id_b"), F.col("c").alias("_cb"))
    return (
        matched.join(F.broadcast(ca), "id_a")
        .join(F.broadcast(cb), "id_b")
        .select(
            F.col("id_a").alias("name_a"),
            F.col("id_b").alias("name_b"),
            "jaccard",
            (F.col("_ca") * F.col("_cb")).alias("n_pairs"),
        )
    )


# ---------------------------------------------------------------------------
# agg_heavy_hitters — exact frequent items, sketch-pruned shuffle
# ---------------------------------------------------------------------------

_HH_SQL = """
WITH toks AS (SELECT unnest(string_split(lower(text),' ')) AS w FROM documents),
tot AS (SELECT COUNT(*)::BIGINT AS n FROM toks),
c AS (SELECT w, COUNT(*)::BIGINT AS cnt FROM toks GROUP BY w)
SELECT w AS word, cnt FROM c, tot WHERE cnt >= 0.02 * n
"""


@register("agg_heavy_hitters", _HH_SQL)
def agg_heavy_hitters(spark, sf_dir):
    """Exact 2%-heavy-hitter tokens via map-side Misra-Gries candidate
    summaries + an exact recount of candidates only
    (operators/aggregates.exact_heavy_hitters). The final answer is
    exact (the sketch prunes, never decides), which is what makes an
    ANSI-SQL oracle possible for a sketch-based plan."""
    docs = _t(spark, sf_dir, "documents")
    tokens = docs.select(F.explode(F.split(F.lower("text"), " ")).alias("tok"))
    return exact_heavy_hitters(tokens, "tok", phi=0.02)


# ---------------------------------------------------------------------------
# ml_kmeans_assign — distributed Lloyd's k-means (seeded, 2 updates)
# ---------------------------------------------------------------------------

def _kmeans_oracle(k: int, updates: int) -> str:
    sql = f"""WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
c0 AS (SELECT vec_id AS cluster, v AS cvec FROM e WHERE vec_id < {k})"""
    for i in range(1, updates + 1):
        sql += f""",
a{i} AS (SELECT vec_id, cluster FROM (
  SELECT e.vec_id, c.cluster,
         ROW_NUMBER() OVER (PARTITION BY e.vec_id
           ORDER BY list_distance(e.v, c.cvec) ASC, c.cluster) AS rn
  FROM e CROSS JOIN c{i-1} c) WHERE rn = 1),
c{i} AS (
  SELECT cluster, list(m ORDER BY pos) AS cvec FROM (
    SELECT a.cluster, u.pos, ROUND(AVG(e.v[u.pos]), 6) AS m
    FROM a{i} a JOIN e USING (vec_id),
         LATERAL (SELECT unnest(range(1, len(e.v)+1)) AS pos) u
    GROUP BY a.cluster, u.pos)
  GROUP BY cluster)"""
    return sql + f"""
SELECT vec_id, cluster FROM (
  SELECT e.vec_id, c.cluster,
         ROW_NUMBER() OVER (PARTITION BY e.vec_id
           ORDER BY list_distance(e.v, c.cvec) ASC, c.cluster) AS rn
  FROM e CROSS JOIN c{updates} c) WHERE rn = 1"""


@register("ml_kmeans_assign", _kmeans_oracle(8, 2))
def ml_kmeans_assign(spark, sf_dir):
    """Two Lloyd iterations of k=8 k-means over the embedding corpus
    (llm/clustering.py): map-side closure-model assignment (zero
    shuffle), k*d-key mean-update shuffle, ROUND(6) model boundary —
    the cross-engine-exact float policy. Output: final (vec_id,
    cluster) assignment."""
    from stockify_spark.llm.clustering import kmeans_assign

    return kmeans_assign(_t(spark, sf_dir, "embeddings"), k=8, updates=2)


# ---------------------------------------------------------------------------
# ml_linreg_group — closed-form OLS per group
# ---------------------------------------------------------------------------

_LINREG_SQL = """
SELECT l_returnflag,
       ROUND(regr_slope(l_extendedprice, l_quantity), 6) AS slope,
       ROUND(regr_intercept(l_extendedprice, l_quantity), 6) AS intercept,
       ROUND(corr(l_extendedprice, l_quantity) * corr(l_extendedprice, l_quantity), 6) AS r2,
       COUNT(*)::BIGINT AS n
FROM lineitem GROUP BY l_returnflag
"""


@register("ml_linreg_group", _LINREG_SQL)
def ml_linreg_group(spark, sf_dir):
    """Per-group simple linear regression (price ~ quantity) via the
    closed-form moment aggregates: slope = covar_pop/var_pop,
    intercept = mean(y) - slope*mean(x), r2 = corr^2 — one map-side-
    combined aggregation pass, no iteration, no UDF. The scalable way
    to fit millions of per-key models (one groupBy, k result rows)."""
    li = _t(spark, sf_dir, "lineitem")
    slope = F.covar_pop("l_extendedprice", "l_quantity") / F.var_pop("l_quantity")
    intercept = F.avg("l_extendedprice") - slope * F.avg("l_quantity")
    r2 = F.corr("l_extendedprice", "l_quantity") ** 2
    return li.groupBy("l_returnflag").agg(
        F.round(slope, 6).alias("slope"),
        F.round(intercept, 6).alias("intercept"),
        F.round(r2, 6).alias("r2"),
        F.count(F.lit(1)).alias("n"),
    )


# ---------------------------------------------------------------------------
# agg_exact_median — distributed selection (order statistic, no sort)
# ---------------------------------------------------------------------------

_MEDIAN_SQL = """
WITH o AS (SELECT l_extendedprice AS v,
                  ROW_NUMBER() OVER (ORDER BY l_extendedprice) AS rn,
                  COUNT(*) OVER () AS n
           FROM lineitem)
SELECT v AS kth_value, n::BIGINT AS n, ((n + 1) // 2)::BIGINT AS k
FROM o WHERE rn = (n + 1) // 2
"""


@register("agg_exact_median", _MEDIAN_SQL)
def agg_exact_median(spark, sf_dir):
    """EXACT lower median of l_extendedprice via two-phase distributed
    selection (operators/sorts.exact_kth_smallest): min/max + bucket
    histogram (map-side combined), driver picks the rank-k bucket
    from the bounded histogram, second scan ranks only that bucket —
    no global sort, no full-range shuffle. The oracle is the global
    ORDER BY it avoids."""
    from stockify_spark.operators.sorts import exact_kth_smallest

    return exact_kth_smallest(_t(spark, sf_dir, "lineitem"), "l_extendedprice")


# ---------------------------------------------------------------------------
# stream_tws_profile — transformWithState per-user profile (batch face)
# ---------------------------------------------------------------------------

_TWS_SQL = """
SELECT user_id, COUNT(*) AS n_events,
       COUNT(DISTINCT event_type)::BIGINT AS n_types,
       ROUND(SUM(value), 6) AS sum_value, MAX(value) AS max_value
FROM events GROUP BY user_id
"""


@register("stream_tws_profile", _TWS_SQL)
def stream_tws_profile(spark, sf_dir):
    """Batch face of the transformWithStateInPandas per-user profile
    (streaming/tws.py — ValueState + MapState column families); the
    streaming face converges to exactly this result where the TWS
    protobuf protocol is available (tests/test_streaming.py)."""
    from stockify_spark.streaming.tws import user_profile

    return user_profile(_t(spark, sf_dir, "events"))
