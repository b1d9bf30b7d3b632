"""Round-12 extension: Gram-fold checkpoint for incremental PCA
(the r11 verdict's unbounded-rebuild item) and the keep-one exact
substring dedup face.

Same evidence discipline as the rest of the registry: every query
has a DuckDB closed-form oracle, builds assert their own invariants,
scale shapes stated per docstring. North-star surface (SURVEY §7.6)
— the reference engine (stockify.cu:196-743) has no linear algebra
or dedup at all.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from stockify_spark.registry import _t, register
from stockify_spark.registry_ext89 import _pca_topk_oracle

# ---------------------------------------------------------------------------
# ml_pca_gram_compact — fold checkpoint for the incremental-PCA
# stats table (llm/pca.compact_gram): the partial-row history
# collapses to ONE summed row, bounding pca_from_gram's rebuild at
# O(d²) regardless of how many micro-batches ever appended.
# ---------------------------------------------------------------------------

_PCA_COMPACT_SQL = (
    "SELECT q.*, CAST(2 AS BIGINT) AS stats_rows FROM (\n"
    + _pca_topk_oracle(1, 8)
    + "\n) q"
)


@register("ml_pca_gram_compact", _PCA_COMPACT_SQL)
def ml_pca_gram_compact(spark, sf_dir):
    """Incremental PCA with a FOLD CHECKPOINT in the middle of the
    ingest history (llm/pca.compact_gram): batches 0-1 land, the
    stats table is COW-compacted to one summed row, both pre-fold
    batches are REPLAYED (must stay no-ops — the txn markers live in
    the log, which the rewrite leaves intact), then batch 2 lands
    and is replayed too. The model rebuilt from the folded table
    must hash-match the one-shot oracle (Gram associativity across
    the fold), and ``stats_rows`` pins the bound: 2 rows (the folded
    row + batch 2), never the 3-row batch history — on a long-lived
    stream this is the difference between O(d²) and O(batches·d²)
    rebuilds. Scale shape: the fold itself is a posexplode+groupBy
    collecting 1+d+d² scalars, model-sized regardless of history."""
    import os

    from stockify_spark.llm.pca import compact_gram, gram_update, pca_from_gram
    from stockify_spark.registry_ext7 import _scratch_table
    from stockify_spark.sources import txlog

    emb = _t(spark, sf_dir, "embeddings")

    def build(path: str) -> None:
        table = os.path.join(path, "gram")
        hi = emb.agg(F.max("vec_id")).collect()[0][0]
        cut1, cut2 = hi // 3, 2 * hi // 3
        parts = [
            emb.filter(F.col("vec_id") <= cut1),
            emb.filter((F.col("vec_id") > cut1) & (F.col("vec_id") <= cut2)),
            emb.filter(F.col("vec_id") > cut2),
        ]
        for v, batch in enumerate(parts[:2]):
            gram_update(batch, table, app_id="pca-cg", batch_version=v)
        assert txlog.snapshot(spark, table).count() == 2
        compact_gram(spark, table)
        assert txlog.snapshot(spark, table).count() == 1
        assert len(txlog.live_files(table)) == 1
        # at-least-once replays ACROSS the fold boundary: no-ops
        v_now = txlog.current_version(table)
        gram_update(parts[0], table, app_id="pca-cg", batch_version=0)
        gram_update(parts[1], table, app_id="pca-cg", batch_version=1)
        assert txlog.current_version(table) == v_now
        gram_update(parts[2], table, app_id="pca-cg", batch_version=2)
        gram_update(parts[2], table, app_id="pca-cg", batch_version=2)
        assert txlog.snapshot(spark, table).count() == 2

    root = _scratch_table(sf_dir, "pcacompact", build, src_file="embeddings.parquet")
    table = os.path.join(root, "gram")
    n_stats = txlog.snapshot(spark, table).count()
    return pca_from_gram(spark, table, k=1, iters=8).withColumn(
        "stats_rows", F.lit(int(n_stats)).cast("long")
    )


# ---------------------------------------------------------------------------
# dedup_substring_keepone — the keep-one variant of exact substring
# dedup: cut every occurrence of a corpus-repeated span EXCEPT those
# in the lowest-doc_id document containing it (Lee et al. 2022 deploy
# the remove-all form; keep-one is the deterministic post-filter the
# remove_repeated_spans docstring promises composes on top).
# ---------------------------------------------------------------------------

_KEEPONE_L = 15  # matches dedup_substring_exact's test-scale threshold

_KEEPONE_SQL = f"""
WITH toks AS (
  SELECT doc_id, string_split_regex(trim(lower(text)), '\\s+') AS t FROM documents),
wins AS (
  SELECT doc_id, i AS sp, array_to_string(t[i:i+{_KEEPONE_L - 1}], ' ') AS w
  FROM toks,
       LATERAL (SELECT unnest(range(1, greatest(len(t) - {_KEEPONE_L} + 2, 1))) AS i)),
keep AS (SELECT w, MIN(doc_id) AS keeper FROM wins
         GROUP BY w HAVING COUNT(*) > 1),
hits AS (SELECT wins.doc_id, wins.sp FROM wins JOIN keep USING (w)
         WHERE wins.doc_id <> keep.keeper),
flags AS (
  SELECT doc_id, sp,
         CASE WHEN sp > COALESCE(MAX(sp + {_KEEPONE_L - 1}) OVER (
                PARTITION BY doc_id ORDER BY sp
                ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), -1)
              THEN 1 ELSE 0 END AS nf
  FROM hits),
grp AS (
  SELECT doc_id, sp,
         SUM(nf) OVER (PARTITION BY doc_id ORDER BY sp) AS gid
  FROM flags)
SELECT doc_id,
       CAST(MIN(sp) AS BIGINT) AS span_start,
       CAST(MAX(sp) + {_KEEPONE_L - 1} AS BIGINT) AS span_end,
       CAST(MAX(sp) + {_KEEPONE_L - 1} - MIN(sp) + 1 AS BIGINT) AS span_tokens
FROM grp GROUP BY doc_id, gid
"""


@register("dedup_substring_keepone", _KEEPONE_SQL)
def dedup_substring_keepone(spark, sf_dir):
    """Keep-one exact substring dedup: the spans to cut when the
    occurrences living in the LOWEST doc_id per repeated window are
    retained — every occurrence in any other document is removed
    (the per-document keeper rule; Lee et al. 2022 §4 discuss
    retaining one copy of each duplicate). Composition of
    :func:`stockify_spark.llm.dedup.repeated_substring_spans`'s
    verified window stream with a per-window min-keeper rule
    (deterministic, so the output is an exact cross-engine set).

    Scale shape: identical to the remove-all form (hash-keyed
    exchanges, skew-safe groupBy counts) plus ONE more model-shaped
    aggregate — min(doc) per verified window text, joined back on
    the window's (text) key; the keeper table is bounded by the
    duplicated vocabulary, not the corpus. The oracle re-derives
    windows, repeats, keepers, and the interval merge in SQL."""
    from stockify_spark.llm.dedup import keepone_substring_spans

    docs = _t(spark, sf_dir, "documents").select("doc_id", "text")
    return keepone_substring_spans(docs, "text", "doc_id", _KEEPONE_L)


# ---------------------------------------------------------------------------
# pipeline_dedup_ingest_sink — dedup-against-history ingest replayed
# as a scripted 4-batch feed (llm/dedup.dedup_ingest_sink): the
# destination TABLE is the dedup state; each batch dedups within
# itself, anti-joins the accumulated fingerprints, appends
# exactly-once. The r11 verdict's "bench the ingest sinks" item —
# this face also gives the per-batch anti-join a SCALING row.
# ---------------------------------------------------------------------------

_INGEST_SINK_SQL = """
WITH feed AS (
  SELECT doc_id, text, doc_id % 4 AS batch FROM documents
  UNION ALL
  SELECT doc_id + 1000000, text, 3 AS batch FROM documents
  WHERE doc_id % 4 = 0 AND doc_id % 3 = 0
),
fp AS (
  SELECT doc_id, batch,
         md5(regexp_replace(trim(lower(text)), '\\s+', ' ', 'g')) AS fingerprint
  FROM feed
),
r AS (
  SELECT doc_id, fingerprint,
         ROW_NUMBER() OVER (PARTITION BY fingerprint
                            ORDER BY batch, doc_id) AS rn
  FROM fp
)
SELECT doc_id, fingerprint FROM r WHERE rn = 1
"""


@register("pipeline_dedup_ingest_sink", _INGEST_SINK_SQL)
def pipeline_dedup_ingest_sink(spark, sf_dir):
    """Exact dedup-against-history ingest: documents arrive as four
    micro-batches (doc_id % 4), batch 3 additionally REPLAYS a third
    of batch 0's texts under fresh ids (the cross-batch duplicates
    the anti-join must drop). Final table = first (batch, id) winner
    per fingerprint — the oracle states that closed form over the
    same schedule. Batch 2's sink call is replayed mid-feed and must
    be a no-op (the (app, batch-id) idempotency marker).

    Scale shape: per batch, ONE anti-join keyed on the 32-char md5 —
    batch-sized build side against the history scan (at 100 TB:
    bloom file-skip on the fingerprint column turns the scan side
    into bounded IO, llm/dedup.dedup_ingest_sink docstring); the
    table is the state, so restart needs no state-store bootstrap."""
    import os

    from stockify_spark.llm.dedup import dedup_ingest_sink
    from stockify_spark.registry_ext7 import _scratch_table
    from stockify_spark.sources import txlog

    docs = _t(spark, sf_dir, "documents").select("doc_id", "text")

    def build(path: str) -> None:
        dst = os.path.join(path, "corpus")
        sink = dedup_ingest_sink(spark, dst, "ingest", "text", "doc_id")
        for b in range(4):
            batch = docs.filter(F.col("doc_id") % 4 == b)
            if b == 3:
                batch = batch.unionByName(
                    docs.filter(
                        (F.col("doc_id") % 4 == 0) & (F.col("doc_id") % 3 == 0)
                    ).select(
                        (F.col("doc_id") + 1_000_000).alias("doc_id"), "text"
                    )
                )
            sink(batch, b)
            if b == 2:  # at-least-once replay mid-feed: must be a no-op
                v = txlog.current_version(dst)
                sink(batch, b)
                assert txlog.current_version(dst) == v

    root = _scratch_table(
        sf_dir, "ingestsink", build, src_file="documents.parquet"
    )
    return txlog.snapshot(spark, os.path.join(root, "corpus")).select(
        "doc_id", "fingerprint"
    )


# ---------------------------------------------------------------------------
# sim_rrf_fusion — reciprocal rank fusion of a lexical (BM25) ranking
# and a semantic (cosine) ranking: the standard hybrid-retrieval
# combiner (Cormack, Clarke & Büttcher 2009), and the retrieval face
# a curation pipeline uses to pick deduplication / decontamination
# review candidates from two signals at once.
# ---------------------------------------------------------------------------

_RRF_TERMS = ("data", "spark", "query")  # the sim_bm25_search query
_RRF_K = 60       # the paper's constant
_RRF_DEPTH = 50   # per-ranker candidate depth
_TOKS90 = "string_split_regex(trim(lower(text)), '\\s+')"

_RRF_SQL = f"""
WITH tok AS (SELECT doc_id, unnest({_TOKS90}) AS tok FROM documents),
dl AS (SELECT doc_id, COUNT(*) AS dl FROM tok GROUP BY doc_id),
corpus AS (SELECT CAST(COUNT(*) AS DOUBLE) AS n_docs,
                  (SELECT CAST(SUM(dl) AS DOUBLE) FROM dl)
                    / CAST(COUNT(*) AS DOUBLE) AS avgdl
           FROM documents),
df AS (SELECT tok AS term, CAST(COUNT(DISTINCT doc_id) AS DOUBLE) AS df
       FROM tok WHERE tok IN {_RRF_TERMS!r} GROUP BY tok),
tf AS (SELECT doc_id, tok AS term, CAST(COUNT(*) AS DOUBLE) AS tf
       FROM tok WHERE tok IN {_RRF_TERMS!r} GROUP BY doc_id, tok),
scored AS (
  SELECT tf.doc_id,
         SUM(ln((corpus.n_docs - df.df + 0.5) / (df.df + 0.5) + 1.0)
             * tf.tf * (1.2 + 1.0)
             / (tf.tf + 1.2 * (1.0 - 0.75 + 0.75 * dl.dl / corpus.avgdl)))
           AS score
  FROM tf
  JOIN df ON df.term = tf.term
  JOIN dl ON dl.doc_id = tf.doc_id
  CROSS JOIN corpus
  GROUP BY tf.doc_id
),
lex AS (
  SELECT doc_id, lex_rank FROM (
    SELECT doc_id, ROW_NUMBER() OVER (
      ORDER BY ROUND(score, 6) DESC, doc_id) AS lex_rank
    FROM scored) WHERE lex_rank <= {_RRF_DEPTH}
),
sem AS (
  SELECT doc_id, sem_rank FROM (
    SELECT vec_id AS doc_id, ROW_NUMBER() OVER (
      ORDER BY list_cosine_similarity(
        embedding, (SELECT embedding FROM embeddings WHERE vec_id = 0)
      ) DESC, vec_id) AS sem_rank
    FROM embeddings WHERE vec_id <> 0) WHERE sem_rank <= {_RRF_DEPTH}
),
fused AS (
  SELECT COALESCE(lex.doc_id, sem.doc_id) AS doc_id,
         lex.lex_rank, sem.sem_rank,
         ROUND(COALESCE(1.0 / ({_RRF_K} + lex.lex_rank), 0.0)
               + COALESCE(1.0 / ({_RRF_K} + sem.sem_rank), 0.0), 9) AS rrf
  FROM lex FULL OUTER JOIN sem ON lex.doc_id = sem.doc_id
)
SELECT doc_id, rrf, CAST(lex_rank AS BIGINT) AS lex_rank,
       CAST(sem_rank AS BIGINT) AS sem_rank
FROM fused ORDER BY rrf DESC, doc_id LIMIT 20
"""


@register("sim_rrf_fusion", _RRF_SQL)
def sim_rrf_fusion(spark, sf_dir):
    """Reciprocal rank fusion: top-20 docs by
    Σ_r 1/(60 + rank_r(d)) over two independent rankers — BM25 for
    the fixed 3-term query (sim_bm25_search's model) and cosine
    against doc 0's embedding (sim_cosine_topk's bit-exact
    dimension-sequential scorer), each contributing its top-50.
    Ranks are INTEGERS (ties broken by score-ROUND(6) then id), so
    the fusion is exact cross-engine arithmetic on 1/(60+r) terms
    summed in a fixed order; absent ranks contribute 0 and surface
    as NULL columns.

    Scale shape: each ranker is its own bounded top-N (BM25 probes
    only term-matching rows; cosine is the map-side partial-top-k
    batcher), the fusion is one full-outer join of two 50-row
    tables — model-sized regardless of corpus size."""
    from stockify_spark.functions.text import tokens
    from stockify_spark.llm.similarity import cosine_topk_batched

    docs = _t(spark, sf_dir, "documents")
    emb = _t(spark, sf_dir, "embeddings")

    # lexical leg: BM25 (same model as sim_bm25_search), top-50 ranks
    tok = docs.select("doc_id", F.explode(tokens("text")).alias("tok"))
    dl = tok.groupBy("doc_id").agg(F.count(F.lit(1)).alias("dl"))
    n_docs = docs.count()
    avgdl = float(
        dl.agg(
            (F.sum("dl").cast("double") / F.lit(float(n_docs))).alias("a")
        ).collect()[0]["a"]
    )
    hits = tok.filter(F.col("tok").isin(*_RRF_TERMS))
    df_t = hits.groupBy(F.col("tok").alias("term")).agg(
        F.countDistinct("doc_id").cast("double").alias("df")
    )
    tf = hits.groupBy("doc_id", F.col("tok").alias("term")).agg(
        F.count(F.lit(1)).cast("double").alias("tf")
    )
    idf = F.log((float(n_docs) - F.col("df") + 0.5) / (F.col("df") + 0.5) + 1.0)
    denom = F.col("tf") + 1.2 * (1.0 - 0.75 + 0.75 * F.col("dl") / avgdl)
    scored = (
        tf.join(F.broadcast(df_t), "term")
        .join(dl, "doc_id")
        .groupBy("doc_id")
        .agg(F.sum(idf * F.col("tf") * (1.2 + 1.0) / denom).alias("score"))
    )
    from pyspark.sql import Window as _W

    lex = (
        scored.withColumn(
            "lex_rank",
            F.row_number().over(
                _W.orderBy(F.round("score", 6).desc(), "doc_id")
            ),
        )
        .filter(F.col("lex_rank") <= _RRF_DEPTH)
        .select("doc_id", "lex_rank")
    )

    # semantic leg: bit-exact cosine ranks against doc 0's embedding
    sem = (
        cosine_topk_batched(
            emb, emb.filter(F.col("vec_id") == 0), k=_RRF_DEPTH
        )
        .select(
            F.col("neighbor_id").alias("doc_id"),
            F.col("rank").alias("sem_rank"),
        )
    )

    rrf = F.round(
        F.coalesce(1.0 / (_RRF_K + F.col("lex_rank")), F.lit(0.0))
        + F.coalesce(1.0 / (_RRF_K + F.col("sem_rank")), F.lit(0.0)),
        9,
    )
    return (
        lex.join(sem, "doc_id", "full_outer")
        .select(
            "doc_id",
            rrf.alias("rrf"),
            F.col("lex_rank").cast("long").alias("lex_rank"),
            F.col("sem_rank").cast("long").alias("sem_rank"),
        )
        .orderBy(F.col("rrf").desc(), "doc_id")
        .limit(20)
    )


# ---------------------------------------------------------------------------
# stats_jackknife — delete-one jackknife standard error from
# SUFFICIENT STATISTICS: for a statistic that is a function of
# group-level counts (here: proportion of high-value orders), the n
# leave-one-out estimates take only two distinct values, so the
# jackknife collapses to closed-form algebra on (n, s) — the 100 TB
# story: no per-row resample materialization, ever. The oracle runs
# the BRUTE per-row jackknife (a real leave-one-out estimate per
# order via window sums) to prove the closed form IS the definition.
# ---------------------------------------------------------------------------

_JACK_CUT = 150_000.0

_JACK_SQL = f"""
WITH base AS (
  SELECT o_orderpriority,
         CASE WHEN o_totalprice > {_JACK_CUT} THEN 1 ELSE 0 END AS b
  FROM orders
),
g AS (
  SELECT o_orderpriority, b,
         SUM(b) OVER (PARTITION BY o_orderpriority) AS s,
         COUNT(*) OVER (PARTITION BY o_orderpriority) AS n
  FROM base
),
loo AS (
  SELECT o_orderpriority, n, s,
         CAST(s - b AS DOUBLE) / CAST(n - 1 AS DOUBLE) AS theta_i
  FROM g
),
agg AS (
  -- θ̄ = s/n exactly (Σθ_(i) = s), carried per-row into the
  -- deviation so no aggregate nests another
  SELECT o_orderpriority,
         ANY_VALUE(n) AS n, ANY_VALUE(s) AS s,
         SUM((theta_i - CAST(s AS DOUBLE) / n)
             * (theta_i - CAST(s AS DOUBLE) / n)) AS ss
  FROM loo GROUP BY o_orderpriority
)
SELECT o_orderpriority,
       ROUND(CAST(s AS DOUBLE) / n, 6) AS prop,
       ROUND(sqrt((CAST(n - 1 AS DOUBLE) / n) * ss), 6) AS jack_se,
       CAST(n AS BIGINT) AS n
FROM agg ORDER BY o_orderpriority
"""


@register("stats_jackknife", _JACK_SQL)
def stats_jackknife(spark, sf_dir):
    """Delete-one jackknife SE of a per-group proportion (orders
    above {cut} by priority). The n leave-one-out estimates
    θ_(i) = (s − b_i)/(n − 1) take exactly TWO distinct values
    (b_i ∈ {{0, 1}}), and Σθ_(i) = s, so the whole resample collapses
    to sufficient statistics:

        θ̄ = s/n,  SS = s·((s−1)/(n−1) − s/n)² + (n−s)·(s/(n−1) − s/n)²,
        SE = √((n−1)/n · SS)

    ONE count aggregate per group — a delete-one resample over
    100 TB with zero per-row resample materialization (the same
    sufficient-statistic discipline as the Gram/PCA family). The
    oracle deliberately runs the BRUTE definition instead — a real
    θ_(i) per order via window sums, then the deviation aggregate —
    so the driver hash proves closed form == definition on every
    group."""
    cut = _JACK_CUT
    agg = (
        _t(spark, sf_dir, "orders")
        .groupBy("o_orderpriority")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(
                F.when(F.col("o_totalprice") > cut, 1).otherwise(0)
            ).alias("s"),
        )
    )
    n = F.col("n").cast("double")
    s = F.col("s").cast("double")
    d1 = (s - 1.0) / (n - 1.0) - s / n          # θ_(i) deviation, b_i = 1
    d0 = s / (n - 1.0) - s / n                  # θ_(i) deviation, b_i = 0
    ss = s * d1 * d1 + (n - s) * d0 * d0
    return agg.select(
        "o_orderpriority",
        F.round(s / n, 6).alias("prop"),
        F.round(F.sqrt(((n - 1.0) / n) * ss), 6).alias("jack_se"),
        F.col("n").cast("long").alias("n"),
    ).orderBy("o_orderpriority")


# ---------------------------------------------------------------------------
# stats_permutation_test — randomization test for a difference in
# proportions, completing the repo's resampling trio (Poisson
# bootstrap = stats_bootstrap_ci, delete-one jackknife =
# stats_jackknife, reassignment test = here). The statistic is
# INTEGER-derived (counts), so replicate statistics and the p-value
# are exact cross-engine arithmetic — no float-sum drift anywhere.
# ---------------------------------------------------------------------------

_PERM_P = 200          # replicates
_PERM_CUT = 150_000.0  # high-value order threshold

_PERM_SQL = f"""
WITH d AS (
  SELECT o_orderkey AS k,
         CASE WHEN o_orderpriority = '1-URGENT' THEN 1 ELSE 0 END AS treat,
         CASE WHEN o_totalprice > {_PERM_CUT} THEN 1 ELSE 0 END AS y
  FROM orders
),
tot AS (
  SELECT CAST(SUM(treat) AS BIGINT) AS n1,
         CAST(COUNT(*) - SUM(treat) AS BIGINT) AS n0,
         CAST(SUM(treat * y) AS BIGINT) AS s1,
         CAST(SUM((1 - treat) * y) AS BIGINT) AS s0,
         CAST(COUNT(*) AS BIGINT) AS n
  FROM d
),
obs AS (
  SELECT n1, n0,
         CAST(s1 AS DOUBLE) / n1 - CAST(s0 AS DOUBLE) / n0 AS t_obs
  FROM tot
),
e AS (SELECT k, y, unnest(range(1, {_PERM_P + 1})) AS b FROM d),
flags AS (
  SELECT b, y,
         CASE WHEN CAST(CONCAT('0x', substr(md5(CONCAT(CAST(b AS VARCHAR),
                    '|', CAST(k AS VARCHAR))), 1, 8)) AS BIGINT)
                   / 4294967296.0
              < CAST((SELECT n1 FROM tot) AS DOUBLE) / (SELECT n FROM tot)
         THEN 1 ELSE 0 END AS a
  FROM e
),
rep AS (
  SELECT b,
         CAST(SUM(a * y) AS DOUBLE) / SUM(a)
         - CAST(SUM((1 - a) * y) AS DOUBLE) / (COUNT(*) - SUM(a)) AS t_b
  FROM flags GROUP BY b
  HAVING SUM(a) > 0 AND SUM(a) < COUNT(*)
),
pv AS (
  SELECT COUNT(*) AS n_perm,
         CAST(SUM(CASE WHEN abs(t_b) >= abs((SELECT t_obs FROM obs))
                       THEN 1 ELSE 0 END) AS BIGINT) AS n_extreme
  FROM rep
)
SELECT obs.n1, obs.n0, ROUND(obs.t_obs, 6) AS t_obs,
       pv.n_extreme,
       ROUND(CAST(1 + pv.n_extreme AS DOUBLE) / (pv.n_perm + 1), 6) AS p_value
FROM obs, pv
"""


@register("stats_permutation_test", _PERM_SQL)
def stats_permutation_test(spark, sf_dir):
    """Randomization (permutation) test: is the urgent-priority
    high-value-order rate different from everyone else's? Statistic
    T = s1/n1 − s0/n0 over INTEGER counts; null replicates reassign
    each order to the treatment arm with the deterministic seeded
    Bernoulli(n1/n) draw (md5(b|k)/2³² — the stats_bootstrap_ci
    randomness discipline; the unconditional-randomization variant
    that needs NO per-replicate global rank, so it is one narrow
    map pass at any scale). Two-sided p = (1 + #{|T_b| ≥ |T_obs|})
    / (P + 1), the add-one Monte-Carlo estimator.

    Every quantity is a ratio of exact integers — replicate
    statistics, the comparison, and the p-value are bit-identical
    cross-engine with NO float-summation exposure (contrast the
    bootstrap's rounded weighted sums). Scale shape: the replicate
    explode is a narrow map ×P; the only shuffle is the P-group
    integer aggregate, map-side combinable."""
    d = _t(spark, sf_dir, "orders").select(
        F.col("o_orderkey").alias("k"),
        F.when(F.col("o_orderpriority") == "1-URGENT", 1)
        .otherwise(0)
        .alias("treat"),
        F.when(F.col("o_totalprice") > _PERM_CUT, 1).otherwise(0).alias("y"),
    )
    tot = d.agg(
        F.sum("treat").alias("n1"),
        (F.count(F.lit(1)) - F.sum("treat")).alias("n0"),
        F.sum(F.col("treat") * F.col("y")).alias("s1"),
        F.sum((1 - F.col("treat")) * F.col("y")).alias("s0"),
        F.count(F.lit(1)).alias("n"),
    ).collect()[0]
    n1, n0, s1, s0, n = (int(tot[c]) for c in ("n1", "n0", "s1", "s0", "n"))
    t_obs = s1 / n1 - s0 / n0
    u = (
        F.conv(
            F.substring(
                F.md5(
                    F.concat(
                        F.col("b").cast("string"),
                        F.lit("|"),
                        F.col("k").cast("string"),
                    )
                ),
                1,
                8,
            ),
            16,
            10,
        ).cast("long")
        / F.lit(4294967296.0)
    )
    # spread the single-row-group orders scan BEFORE the ×P explode —
    # the md5-per-(row, replicate) map otherwise runs serially in the
    # one scan task (the agg_countmin_sketch case; no-op at scale)
    from stockify_spark.functions.scale import spread_small_scan

    e = spread_small_scan(d).select(
        "k", "y", F.explode(F.sequence(F.lit(1), F.lit(_PERM_P))).alias("b")
    )
    flags = e.select(
        "b", "y", F.when(u < F.lit(n1 / n), 1).otherwise(0).alias("a")
    )
    rep = (
        flags.groupBy("b")
        .agg(
            F.sum(F.col("a") * F.col("y")).alias("sa"),
            F.sum("a").alias("na"),
            F.sum((1 - F.col("a")) * F.col("y")).alias("sb"),
            (F.count(F.lit(1)) - F.sum("a")).alias("nb"),
        )
        .filter((F.col("na") > 0) & (F.col("nb") > 0))
        .select(
            (
                F.col("sa").cast("double") / F.col("na")
                - F.col("sb").cast("double") / F.col("nb")
            ).alias("t_b")
        )
    )
    pv = rep.agg(
        F.count(F.lit(1)).alias("n_perm"),
        F.sum(
            F.when(F.abs(F.col("t_b")) >= F.lit(abs(t_obs)), 1).otherwise(0)
        ).alias("n_extreme"),
    ).collect()[0]
    n_perm, n_extreme = int(pv["n_perm"]), int(pv["n_extreme"])
    return spark.createDataFrame(
        [
            (
                n1,
                n0,
                float(_round6(t_obs)),
                n_extreme,
                float(_round6((1 + n_extreme) / (n_perm + 1))),
            )
        ],
        "n1 long, n0 long, t_obs double, n_extreme long, p_value double",
    )


def _round6(x: float) -> float:
    from stockify_spark.llm.pca import _round_half_up

    return _round_half_up(x, 6)


# ---------------------------------------------------------------------------
# doc_quality_gopher_ngrams — the REST of the Gopher/MassiveText
# repetition suite (Rae et al. 2022, table A1): fraction of
# characters in the most frequent {2,3,4}-gram, and fraction of
# characters in duplicated {5..10}-grams. doc_quality_gopher covers
# the token/bigram top fractions; this closes the n-gram family.
# ---------------------------------------------------------------------------

_GOPHER_TOKS = "string_split_regex(trim(lower(text)), '\\s+')"

_GOPHER_NG_SQL = f"""
WITH d AS (
  SELECT doc_id, {_GOPHER_TOKS} AS t,
         length(array_to_string({_GOPHER_TOKS}, ' ')) AS c
  FROM documents
),
dn AS (
  SELECT doc_id, c, t, ns.n AS n
  FROM d, LATERAL (SELECT unnest(range(2, 11)) AS n) AS ns
  WHERE len(t) >= ns.n
),
g AS (
  SELECT doc_id, c, n,
         array_to_string(t[i:i + n - 1], ' ') AS gr
  FROM dn,
       LATERAL (SELECT unnest(range(1, len(t) - n + 2)) AS i) AS pos
),
cnt AS (
  SELECT doc_id, n, gr, ANY_VALUE(c) AS c, COUNT(*) AS k
  FROM g GROUP BY doc_id, n, gr
),
top AS (
  SELECT doc_id, n, k * length(gr) AS mass FROM (
    SELECT doc_id, n, gr, k,
           ROW_NUMBER() OVER (PARTITION BY doc_id, n
                              ORDER BY k DESC, gr ASC) AS r
    FROM cnt WHERE n <= 4) WHERE r = 1
),
dup AS (
  SELECT doc_id, n,
         SUM(CASE WHEN k > 1 THEN (k - 1) * length(gr) ELSE 0 END) AS mass
  FROM cnt WHERE n >= 5 GROUP BY doc_id, n
),
m AS (
  SELECT doc_id, n, mass FROM top
  UNION ALL SELECT doc_id, n, mass FROM dup
)
SELECT d.doc_id,
  {", ".join(
    f"ROUND(COALESCE(MAX(CASE WHEN m.n = {n} THEN m.mass END), 0)"
    f" * 1.0 / d.c, 6) AS {'top' if n <= 4 else 'dup'}{n}_frac"
    for n in range(2, 11)
  )}
FROM d LEFT JOIN m ON m.doc_id = d.doc_id
WHERE d.c > 0
GROUP BY d.doc_id, d.c
"""


@register("doc_quality_gopher_ngrams", _GOPHER_NG_SQL)
def doc_quality_gopher_ngrams(spark, sf_dir):
    """Gopher repetition filters, n-gram half (Rae et al. 2022 A1):
    per doc, the fraction of characters in the MOST FREQUENT
    {2,3,4}-gram (count × gram chars / doc chars; ties broken by
    count DESC then gram ASC) and the fraction of characters in
    DUPLICATED {5..10}-grams (the repeated character mass:
    Σ over grams seen k>1 times of (k−1)·gram chars — every
    occurrence beyond the first counts, the Dolma/RedPajama
    accounting). All masses are exact integers; one division +
    ROUND(6) per cell.

    Scale shape: ONE explode produces (doc, n, gram) for all nine
    n's in a single map pass over the token arrays; one map-side-
    combined groupBy to gram counts; the top pick is a per-(doc, n)
    window over the doc's own gram vocabulary (doc-bounded, never
    corpus-keyed — the round-12 skew policy's bounded-key case);
    the final fold is one per-doc aggregate."""
    from pyspark.sql import Window as _W

    from stockify_spark.functions.text import tokens

    docs = _t(spark, sf_dir, "documents")
    t = tokens("text")
    d = docs.select(
        "doc_id",
        t.alias("t"),
        F.length(F.concat_ws(" ", t)).alias("c"),
    ).filter(F.col("c") > 0)
    g = (
        d.select(
            "doc_id",
            "c",
            "t",
            F.explode(F.sequence(F.lit(2), F.lit(10))).alias("n"),
        )
        .filter(F.size("t") >= F.col("n"))
        .select(
            "doc_id",
            "c",
            "n",
            F.explode(
                F.transform(
                    F.sequence(F.lit(1), F.size("t") - F.col("n") + 1),
                    lambda i: F.concat_ws(
                        " ", F.slice(F.col("t"), i, F.col("n"))
                    ),
                )
            ).alias("gr"),
        )
    )
    cnt = g.groupBy("doc_id", "n", "gr").agg(
        F.first("c").alias("c"), F.count(F.lit(1)).alias("k")
    )
    top = (
        cnt.filter(F.col("n") <= 4)
        .withColumn(
            "r",
            F.row_number().over(
                _W.partitionBy("doc_id", "n").orderBy(
                    F.col("k").desc(), F.col("gr").asc()
                )
            ),
        )
        .filter(F.col("r") == 1)
        .select("doc_id", "n", (F.col("k") * F.length("gr")).alias("mass"))
    )
    dup = (
        cnt.filter(F.col("n") >= 5)
        .groupBy("doc_id", "n")
        .agg(
            F.sum(
                F.when(
                    F.col("k") > 1, (F.col("k") - 1) * F.length("gr")
                ).otherwise(0)
            ).alias("mass")
        )
    )
    m = top.unionByName(dup)
    cells = [
        F.round(
            F.coalesce(
                F.max(F.when(F.col("n") == n, F.col("mass"))), F.lit(0)
            )
            * 1.0
            / F.first("c"),
            6,
        ).alias(f"{'top' if n <= 4 else 'dup'}{n}_frac")
        for n in range(2, 11)
    ]
    return (
        d.select("doc_id", "c")
        .join(m, "doc_id", "left")
        .groupBy("doc_id")
        .agg(F.first("c").alias("_c"), *[c for c in cells])
        .drop("_c")
    )


# ---------------------------------------------------------------------------
# window_distance_profile — the matrix-profile PRIMITIVE: the
# z-normalized Euclidean distance between every length-w subsequence
# of a series and one fixed query subsequence (a "distance profile",
# the inner kernel MASS/STOMP iterate). Motif/anomaly mining over
# sensor- or price-series reduces to arg-min/arg-max over this row.
# ---------------------------------------------------------------------------

_DP_W = 8
_DP_ROWS = 1800
_DP_LEN = 180

_DP_SQL = f"""
WITH s AS (
  SELECT i // {_DP_LEN} AS symbol, i % {_DP_LEN} AS pos,
         CAST(500 + (i % 18) * 10 + (i % 7) AS DOUBLE) AS x
  FROM range({_DP_ROWS}) t(i)
),
arr AS (
  SELECT symbol, pos,
         list(x) OVER (PARTITION BY symbol ORDER BY pos
                       ROWS BETWEEN CURRENT ROW AND {_DP_W - 1} FOLLOWING) AS a
  FROM s
),
w AS (SELECT symbol, pos, a FROM arr WHERE len(a) = {_DP_W}),
q AS (SELECT symbol, a AS qa FROM w WHERE pos = 0),
d AS (
  SELECT w.symbol, w.pos,
         list_sum(w.a) AS sx,
         list_sum(list_transform(w.a, v -> v * v)) AS sxx,
         list_sum(q.qa) AS sq,
         list_sum(list_transform(q.qa, v -> v * v)) AS sqq,
         list_dot_product(w.a, q.qa) AS dot
  FROM w JOIN q ON q.symbol = w.symbol
)
SELECT CAST(symbol AS BIGINT) AS symbol, CAST(pos AS BIGINT) AS pos,
       ROUND(CASE
         WHEN (sxx - sx * sx / {_DP_W}) <= 0 OR (sqq - sq * sq / {_DP_W}) <= 0
         THEN NULL
         ELSE sqrt(greatest(
           2.0 * {_DP_W} * (1.0 - (dot - sx * sq / {_DP_W})
             / sqrt((sxx - sx * sx / {_DP_W}) * (sqq - sq * sq / {_DP_W}))),
           0.0))
       END, 6) AS dist
FROM d
"""


@register("window_distance_profile", _DP_SQL)
def window_distance_profile(spark, sf_dir):
    """Distance profile (z-normalized, w = 8) of every subsequence of
    each series against that series' FIRST window — the matrix-
    profile inner kernel. The series is the reference ramp with a
    co-prime period-7 perturbation (18·7 = 126-row true period), so
    the profile has exact zeros precisely where the mixed phase
    realigns, nontrivial values elsewhere — known geometry, pinned
    in tests.

    Cross-engine exactness: the series is INTEGER-valued, so every
    window sum / sum-of-squares / dot product is exact regardless of
    either engine's summation association (Spark's sequential
    aggregate fold vs DuckDB's segment tree — the usual float-drift
    channel is closed by integrality); the remaining chain is
    identical scalar IEEE ops. Zero-variance windows surface as NULL
    in both engines rather than a div-by-zero artifact.

    Scale shape: one window pass builds the length-w frames
    (collect_list over a bounded ROWS frame, per-symbol — the
    entity-bounded window the r12 skew policy keeps), the per-symbol
    query rows broadcast, and all arithmetic is JVM higher-order
    functions over 8-element arrays — no Python, no corpus-keyed
    shuffle; parallelism = series count, the time-series layout."""
    from pyspark.sql import Window as _W

    from stockify_spark.sources.fixtures import stocks_ramp

    s = stocks_ramp(spark, cycles=_DP_ROWS // 18).select(
        (F.col("row_id") / _DP_LEN).cast("long").alias("symbol"),
        (F.col("row_id") % _DP_LEN).cast("long").alias("pos"),
        (F.col("close") + (F.col("row_id") % 7)).alias("x"),
    )
    frame = _W.partitionBy("symbol").orderBy("pos").rowsBetween(0, _DP_W - 1)
    arr = s.select(
        "symbol", "pos", F.collect_list("x").over(frame).alias("a")
    ).filter(F.size("a") == _DP_W)
    q = arr.filter(F.col("pos") == 0).select(
        "symbol", F.col("a").alias("qa")
    )
    j = arr.join(F.broadcast(q), "symbol")
    ssum = lambda c: F.aggregate(c, F.lit(0.0), lambda acc, v: acc + v)  # noqa: E731
    sx = ssum(F.col("a"))
    sxx = ssum(F.transform(F.col("a"), lambda v: v * v))
    sq = ssum(F.col("qa"))
    sqq = ssum(F.transform(F.col("qa"), lambda v: v * v))
    dot = ssum(F.zip_with(F.col("a"), F.col("qa"), lambda a, b: a * b))
    w = float(_DP_W)
    varx = sxx - sx * sx / w
    varq = sqq - sq * sq / w
    num = dot - sx * sq / w
    dist = F.when(
        (varx <= 0) | (varq <= 0), F.lit(None).cast("double")
    ).otherwise(
        F.sqrt(
            F.greatest(
                2.0 * w * (1.0 - num / F.sqrt(varx * varq)), F.lit(0.0)
            )
        )
    )
    return j.select("symbol", "pos", F.round(dist, 6).alias("dist"))


# ---------------------------------------------------------------------------
# sim_ann_recall_eval — the ANN EVALUATION harness: recall@k of the
# deterministic seeded-IVF path against brute-force ground truth,
# per query. The number a pipeline engineer needs before trusting
# the approximate path at 100 TB — and because both the bucketed
# spec and the exact spec are deterministic, the recall itself is
# an exact cross-engine quantity, not a statistical estimate.
# ---------------------------------------------------------------------------

_RECALL_K = 5
_RECALL_Q = 20

_ANN_RECALL_SQL = f"""
WITH c AS (SELECT vec_id AS cid, embedding AS cvec FROM embeddings WHERE vec_id < 16),
s AS (SELECT vec_id, embedding, cid,
      ROW_NUMBER() OVER (PARTITION BY vec_id
        ORDER BY list_cosine_similarity(embedding, cvec) DESC, cid) AS rnk
      FROM embeddings CROSS JOIN c),
corpus AS (SELECT vec_id AS neighbor_id, embedding AS ne, cid FROM s WHERE rnk = 1),
qv AS (SELECT vec_id AS query_id, embedding AS qe FROM embeddings
       WHERE vec_id < {_RECALL_Q}),
qc AS (SELECT s.vec_id AS query_id, s.cid FROM s
       WHERE s.vec_id < {_RECALL_Q} AND s.rnk <= 4),
ivf AS (
  SELECT query_id, neighbor_id FROM (
    SELECT q.query_id, corpus.neighbor_id,
           ROW_NUMBER() OVER (PARTITION BY q.query_id
             ORDER BY list_cosine_similarity(q.qe, corpus.ne) DESC,
                      corpus.neighbor_id) AS rank
    FROM (SELECT qv.query_id, qv.qe, qc.cid FROM qv JOIN qc USING (query_id)) q
    JOIN corpus USING (cid)
    WHERE q.query_id <> corpus.neighbor_id)
  WHERE rank <= {_RECALL_K}
),
brute AS (
  SELECT query_id, neighbor_id FROM (
    SELECT qv.query_id, e.vec_id AS neighbor_id,
           ROW_NUMBER() OVER (PARTITION BY qv.query_id
             ORDER BY list_cosine_similarity(qv.qe, e.embedding) DESC,
                      e.vec_id) AS rank
    FROM qv, embeddings e WHERE qv.query_id <> e.vec_id)
  WHERE rank <= {_RECALL_K}
)
SELECT b.query_id,
       CAST(COUNT(i.neighbor_id) AS BIGINT) AS n_hits,
       ROUND(COUNT(i.neighbor_id) / {_RECALL_K}.0, 6) AS recall
FROM brute b
LEFT JOIN ivf i ON i.query_id = b.query_id AND i.neighbor_id = b.neighbor_id
GROUP BY b.query_id
"""


@register("sim_ann_recall_eval", _ANN_RECALL_SQL)
def sim_ann_recall_eval(spark, sf_dir):
    """recall@5 of the seeded-IVF ANN (16 cells, probe 4) against the
    brute-force exact top-5, for the first 20 queries: per query,
    how many true neighbors the bucketed path found. Both rankings
    are bit-exact deterministic specs (dimension-sequential cosine,
    integer-rank tie-breaks), so the recall column is exact-hash
    comparable — the evaluation harness itself is differential, not
    just the operators under it.

    Scale shape: the brute leg is the partial-top-k batcher over a
    BOUNDED query set (model-sized broadcast, map-side heaps); the
    IVF leg is the cell equi-join; the comparison is one join of two
    Q·k-row tables. At 100 TB brute ground truth stays affordable
    exactly because Q is a sample — which is how recall is audited
    in production ANN systems."""
    from stockify_spark.llm.similarity import cosine_topk_batched, seeded_ivf_topk

    emb = _t(spark, sf_dir, "embeddings")
    queries = emb.filter(F.col("vec_id") < _RECALL_Q)
    brute = cosine_topk_batched(emb, queries, k=_RECALL_K).select(
        "query_id", "neighbor_id"
    )
    ivf = seeded_ivf_topk(
        emb, queries, k=_RECALL_K, n_centroids=16, n_probe=4
    ).select("query_id", F.col("neighbor_id").alias("_ivf_n"))
    return (
        brute.join(
            ivf,
            (brute["query_id"] == ivf["query_id"])
            & (brute["neighbor_id"] == ivf["_ivf_n"]),
            "left",
        )
        .groupBy(brute["query_id"].alias("query_id"))
        .agg(
            F.count("_ivf_n").alias("n_hits"),
            F.round(F.count("_ivf_n") / float(_RECALL_K), 6).alias("recall"),
        )
    )


# ---------------------------------------------------------------------------
# pipeline_dedup_threshold_sweep — the dedup OPERATING CURVE: pairs
# flagged and documents touched at every candidate Jaccard
# threshold, from ONE candidate-generation pass. The number a
# curation engineer sweeps before committing a threshold to a
# 100 TB dedup run — re-running the pair join per threshold (the
# naive sweep) multiplies the most expensive stage by the number of
# grid points; here the grid is a post-filter on the verified pairs.
# ---------------------------------------------------------------------------

_SWEEP_BASE = 0.4
_SWEEP_GRID = (0.4, 0.5, 0.6, 0.7, 0.8, 0.9)

_SWEEP_SHINGLES = (
    "list_distinct(list_transform(range(greatest(len("
    "list_filter(string_split_regex(lower(text), '[^a-z0-9]+'), t -> t <> '')"
    ") - 3, 0) + 1), i -> array_to_string("
    "list_filter(string_split_regex(lower(text), '[^a-z0-9]+'), t -> t <> '')"
    "[i + 1:i + 3], ' ')))"
)

_SWEEP_SQL = f"""
WITH s AS (SELECT doc_id, {_SWEEP_SHINGLES} AS sh FROM documents),
pairs AS (
  SELECT a.doc_id AS id_a, b.doc_id AS id_b,
         ROUND(CAST(len(list_intersect(a.sh, b.sh)) AS DOUBLE)
               / len(list_distinct(list_concat(a.sh, b.sh))), 6) AS j
  FROM s a JOIN s b ON a.doc_id < b.doc_id
  WHERE CAST(len(list_intersect(a.sh, b.sh)) AS DOUBLE)
        / len(list_distinct(list_concat(a.sh, b.sh))) >= {_SWEEP_BASE}
),
grid AS (SELECT CAST(unnest([{", ".join(str(t) for t in _SWEEP_GRID)}]) AS DOUBLE) AS threshold),
np AS (SELECT g.threshold, CAST(COUNT(p.id_a) AS BIGINT) AS n_pairs
       FROM grid g LEFT JOIN pairs p ON p.j >= g.threshold
       GROUP BY g.threshold),
nd AS (SELECT threshold, CAST(COUNT(DISTINCT doc_id) AS BIGINT) AS n_docs
       FROM (SELECT g.threshold, p.id_a AS doc_id
             FROM grid g JOIN pairs p ON p.j >= g.threshold
             UNION
             SELECT g.threshold, p.id_b
             FROM grid g JOIN pairs p ON p.j >= g.threshold)
       GROUP BY threshold)
SELECT np.threshold, np.n_pairs,
       COALESCE(nd.n_docs, 0) AS n_docs_flagged
FROM np LEFT JOIN nd ON nd.threshold = np.threshold
"""


@register("pipeline_dedup_threshold_sweep", _SWEEP_SQL)
def pipeline_dedup_threshold_sweep(spark, sf_dir):
    """Dedup threshold operating curve: (n_pairs, n_docs_flagged) at
    Jaccard thresholds 0.4..0.9, all derived from ONE prefix-filtered
    candidate join at the base threshold 0.4 — higher thresholds are
    subsets, so the sweep is a narrow post-filter of the verified
    pair table crossed with the 6-point grid (never 6 joins). The
    ROUND(6) jaccard column and identical threshold literals make
    every comparison exact cross-engine; the oracle brute-forces all
    pairs and re-derives the curve independently.

    Scale shape: candidate generation once (the AllPairs prefix
    filter of ngram_jaccard_pairs); the sweep works on the PAIR
    table (duplicated-fraction-sized), so grid resolution is free at
    any corpus size."""
    from stockify_spark.llm.dedup import ngram_jaccard_pairs

    docs = _t(spark, sf_dir, "documents")
    pairs = ngram_jaccard_pairs(
        docs, "text", "doc_id", k=3, threshold=_SWEEP_BASE
    )
    grid = spark.createDataFrame(
        [(float(t),) for t in _SWEEP_GRID], "threshold double"
    )
    hit = grid.join(pairs, pairs["jaccard"] >= grid["threshold"], "left")
    docs_per = hit.select(
        "threshold",
        F.explode(
            F.when(
                F.col("id_a").isNotNull(),
                F.array(F.col("id_a"), F.col("id_b")),
            ).otherwise(F.array().cast("array<long>"))
        ).alias("doc_id"),
    )
    n_pairs = hit.groupBy("threshold").agg(
        F.count("id_a").alias("n_pairs")
    )
    n_docs = docs_per.groupBy("threshold").agg(
        F.countDistinct("doc_id").alias("n_docs_flagged")
    )
    return (
        n_pairs.join(n_docs, "threshold", "left")
        .select(
            "threshold",
            "n_pairs",
            F.coalesce("n_docs_flagged", F.lit(0)).alias("n_docs_flagged"),
        )
    )


# ---------------------------------------------------------------------------
# txlog_history — DESCRIBE HISTORY: the log's observability face
# (sources/txlog.history). One row per commit with per-action-kind
# counts, logged byte totals, in-commit-timestamp monotonicity, and
# the derived operation kind — the first thing to read when byte
# admission or data skipping behaves unexpectedly.
# ---------------------------------------------------------------------------

_HISTORY_SQL = """
SELECT * FROM (VALUES
  (CAST(0 AS BIGINT), 'create',   CAST(2 AS BIGINT), CAST(0 AS BIGINT), CAST(0 AS BIGINT), CAST(0 AS BIGINT), CAST(0 AS BIGINT), CAST(0 AS BIGINT), FALSE, TRUE, TRUE),
  (CAST(1 AS BIGINT), 'append',   CAST(1 AS BIGINT), CAST(0 AS BIGINT), CAST(0 AS BIGINT), CAST(0 AS BIGINT), CAST(0 AS BIGINT), CAST(0 AS BIGINT), FALSE, TRUE, TRUE),
  (CAST(2 AS BIGINT), 'metadata', CAST(0 AS BIGINT), CAST(0 AS BIGINT), CAST(0 AS BIGINT), CAST(0 AS BIGINT), CAST(1 AS BIGINT), CAST(0 AS BIGINT), FALSE, FALSE, TRUE),
  (CAST(3 AS BIGINT), 'metadata', CAST(0 AS BIGINT), CAST(0 AS BIGINT), CAST(0 AS BIGINT), CAST(0 AS BIGINT), CAST(0 AS BIGINT), CAST(1 AS BIGINT), FALSE, FALSE, TRUE),
  (CAST(4 AS BIGINT), 'append',   CAST(1 AS BIGINT), CAST(0 AS BIGINT), CAST(0 AS BIGINT), CAST(1 AS BIGINT), CAST(0 AS BIGINT), CAST(0 AS BIGINT), FALSE, TRUE, TRUE),
  (CAST(5 AS BIGINT), 'delete',   CAST(0 AS BIGINT), CAST(0 AS BIGINT), CAST(1 AS BIGINT), CAST(0 AS BIGINT), CAST(0 AS BIGINT), CAST(0 AS BIGINT), TRUE,  FALSE, TRUE)
) AS t(version, operation, n_add, n_remove, n_add_dv, n_txn,
       n_schema, n_constraint, is_change_commit, bytes_logged, ts_monotone)
"""


@register("txlog_history", _HISTORY_SQL)
def txlog_history(spark, sf_dir):
    """DESCRIBE HISTORY over a scripted six-commit table: create
    (2 files) → append (1 file) → rename_column (metadata) →
    CHECK constraint (metadata) → idempotent append (1 file + txn
    marker) → MOR delete-all (ONE deletion-vector sidecar per delete
    operation — cardinality tracks deleted rows, not touched files —
    a change commit). The oracle is the closed-form VALUES of what
    a correct log must contain: per-kind action counts, operation
    classification, change-commit flag (the stream's skip/refuse
    rule), ``bytes_logged`` (add sizes present for every data
    commit — the byte-admission planning input), and in-commit
    timestamp monotonicity across the whole history.

    Scale shape: driver-side, one small JSON per commit — O(history),
    zero data IO; the face is metadata observability, not a scan."""
    import os

    from stockify_spark.registry_ext7 import _scratch_table
    from stockify_spark.sources import txlog

    orders = _t(spark, sf_dir, "orders").select(
        "o_orderkey", "o_totalprice"
    )

    def build(path: str) -> None:
        t = os.path.join(path, "t")
        txlog.create(orders.filter(F.col("o_orderkey") % 3 == 0).repartition(2), t)
        txlog.append(orders.filter(F.col("o_orderkey") % 3 == 1).coalesce(1), t)
        txlog.rename_column(t, "o_totalprice", "price")
        txlog.set_constraint(t, "pos_price", "price >= 0")
        txlog.append_idempotent(
            orders.filter(F.col("o_orderkey") % 3 == 2)
            .coalesce(1)
            .withColumnRenamed("o_totalprice", "price"),
            t,
            "hist",
            0,
        )
        txlog.delete_where_dv(spark, t, F.col("price") >= 0.0)

    root = _scratch_table(sf_dir, "history", build)
    h = txlog.history(spark, os.path.join(root, "t"))
    from pyspark.sql import Window as _W

    prev_ts = F.lag("ts_ms").over(_W.orderBy("version"))
    return h.select(
        "version",
        "operation",
        "n_add",
        "n_remove",
        "n_add_dv",
        "n_txn",
        "n_schema",
        "n_constraint",
        "is_change_commit",
        (F.col("add_bytes").isNotNull() & (F.col("add_bytes") > 0)).alias(
            "bytes_logged"
        ),
        F.coalesce(F.col("ts_ms") > prev_ts, F.lit(True)).alias("ts_monotone"),
    )
