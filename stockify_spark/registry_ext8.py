"""Round-7 wave: batched BPE merge selection (tokenizer-training
scale path) and txlog MERGE upsert.

Each query has an exact DuckDB oracle (driver contract,
__spark_entry__.py). Reference attribution: the reference engine
(stockify.cu) has none of these surfaces; they extend the
training-data-pipeline coverage mandated by SURVEY §2 (LLM ops).
"""

from __future__ import annotations

from pyspark.sql import functions as F

from stockify_spark.functions.bpe import bpe_learn_batched, word_frequencies
from stockify_spark.registry import register, _t

_BPE_ROUNDS, _BPE_BATCH = 3, 8

# Separator for the (pattern, replacement) strings folded by
# list_reduce in the oracle: symbols are [a-z]+ only (word filter),
# so '>' can never occur inside a pattern.
_SEP = ">"


def _bpe_batched_oracle(rounds: int, batch: int) -> str:
    """Chained-CTE reproduction of bpe_learn_batched: per round, rank
    pairs by (count DESC, l, r), keep the conservative independent
    set among the top ``batch`` (NOT EXISTS a higher-ranked top-batch
    pair sharing a symbol), and apply the selected merges as a
    list_reduce replace fold in rank order — the same fold order the
    Spark side chains."""
    sql = """WITH words AS (
  SELECT w AS word, COUNT(*)::BIGINT AS cnt
  FROM (SELECT unnest(string_split(lower(text),' ')) AS w FROM documents)
  WHERE regexp_matches(w, '^[a-z]+$') AND length(w) BETWEEN 2 AND 12
  GROUP BY w
), s0 AS (SELECT regexp_replace(word, '(.)', ',\\1,', 'g') AS s, cnt FROM words)"""
    for i in range(1, rounds + 1):
        sql += f""",
t{i} AS (
  SELECT syms[i] AS l, syms[i+1] AS r, SUM(cnt)::BIGINT AS c
  FROM (SELECT string_split(substr(s, 2, length(s)-2), ',,') AS syms, cnt FROM s{i-1}),
       LATERAL (SELECT unnest(range(1, len(syms))) AS i) u
  GROUP BY 1, 2
),
top{i} AS (
  SELECT l, r, c, ROW_NUMBER() OVER (ORDER BY c DESC, l, r) AS rn
  FROM t{i} QUALIFY rn <= {batch}
),
sel{i} AS (
  SELECT a.l, a.r, a.c, a.rn FROM top{i} a
  WHERE NOT EXISTS (
    SELECT 1 FROM top{i} b
    WHERE b.rn < a.rn AND (b.l IN (a.l, a.r) OR b.r IN (a.l, a.r)))
),
s{i} AS (
  SELECT list_reduce(
           list_prepend(s{i-1}.s, m.ms),
           (acc, x) -> replace(acc, split_part(x, '{_SEP}', 1), split_part(x, '{_SEP}', 2))
         ) AS s, cnt
  FROM s{i-1},
       (SELECT COALESCE(list(',' || l || ',,' || r || ',{_SEP},' || l || r || ',' ORDER BY rn), []) AS ms
        FROM sel{i}) m
)"""
    sel = " UNION ALL ".join(
        f"SELECT {i}::BIGINT AS round, rn::BIGINT AS rn, l AS lhs, r AS rhs, c AS pair_cnt FROM sel{i}"
        for i in range(1, rounds + 1)
    )
    return sql + f"\nSELECT * FROM ({sel}) ORDER BY round, rn"


@register("tokenizer_bpe_batched", _bpe_batched_oracle(_BPE_ROUNDS, _BPE_BATCH))
def tokenizer_bpe_batched(spark, sf_dir):
    """Batched BPE merge learning (functions/bpe.bpe_learn_batched):
    3 rounds x top-8 conservative independent set — one pair-count
    shuffle and ONE bounded driver collect per ROUND instead of per
    merge, the scale path that keeps a 30k-merge vocabulary at ~30k/m
    Spark jobs instead of 30k. Selection rule and fold order are
    reproduced exactly by the chained-CTE oracle; the divergence from
    serial BPE (within-round recount deferral) is documented on the
    function and pinned by tests/test_ext6.py property tests."""
    words = word_frequencies(_t(spark, sf_dir, "documents"))
    return bpe_learn_batched(spark, words, rounds=_BPE_ROUNDS, batch=_BPE_BATCH)


# ---------------------------------------------------------------------------
# txlog_merge — Delta-style MERGE (upsert) through the commit log
# ---------------------------------------------------------------------------

_MERGE_SQL = """
SELECT o_orderkey,
       ROUND(CASE WHEN o_orderkey % 2 = 0 THEN o_totalprice + 1000.0
                  ELSE o_totalprice END, 2) AS o_totalprice
FROM orders
WHERE o_orderkey % 3 <> 0 OR o_orderkey % 2 = 0
"""


@register("txlog_merge", _MERGE_SQL)
def txlog_merge(spark, sf_dir):
    """MERGE upsert through the ACID log (sources/txlog.merge_upsert):
    the table starts as the keys not divisible by 3; the source is
    every even key with price bumped by 1000 — so even keys UPDATE
    (or INSERT if divisible by 6) and odd non-%3 keys pass through
    untouched. Touched-file discovery is one provenance-column
    semi-join; only files containing matched keys are rewritten. The
    oracle states the merged end state declaratively over the source
    table, so the whole upsert path (COW rewrite + source append +
    commit replay) is hash-checked. Scratch table deterministic per
    sf_dir (same reuse policy as the lifecycle table)."""
    from stockify_spark.registry_ext7 import _scratch_table
    from stockify_spark.sources import txlog

    def build(path: str) -> None:
        o = _t(spark, sf_dir, "orders").select("o_orderkey", "o_totalprice")
        txlog.create(
            o.filter(F.col("o_orderkey") % 3 != 0).repartitionByRange(4, "o_orderkey"),
            path,
        )
        src = o.filter(F.col("o_orderkey") % 2 == 0).select(
            "o_orderkey", (F.col("o_totalprice") + 1000.0).alias("o_totalprice")
        )
        txlog.merge_upsert(spark, path, src, ["o_orderkey"])

    path = _scratch_table(sf_dir, "merge", build)
    snap = txlog.snapshot(spark, path)
    return snap.select(
        "o_orderkey", F.round("o_totalprice", 2).alias("o_totalprice")
    )


# ---------------------------------------------------------------------------
# text_perplexity — LM-based document quality scoring (CCNet-style)
# ---------------------------------------------------------------------------

_PPL_SQL = """
WITH tok AS (SELECT doc_id, string_split_regex(trim(lower(text)), '\\s+') AS ts
  FROM documents),
tri AS (SELECT doc_id, ts[i] AS w1, ts[i+1] AS w2, ts[i+2] AS w3
  FROM (SELECT doc_id, ts, unnest(range(1, len(ts) - 1)) AS i FROM tok
        WHERE len(ts) >= 3)),
tcnt AS (SELECT w1, w2, w3, COUNT(*) AS n FROM tri GROUP BY 1, 2, 3),
bcnt AS (SELECT w1, w2, COUNT(*) AS cn FROM tri GROUP BY 1, 2),
v AS (SELECT COUNT(DISTINCT w3) AS vsz FROM tri),
scored AS (
  SELECT t.doc_id, ln((c.n + 1.0) / (b.cn + v.vsz)) AS logp
  FROM tri t
  JOIN tcnt c ON c.w1 = t.w1 AND c.w2 = t.w2 AND c.w3 = t.w3
  JOIN bcnt b ON b.w1 = t.w1 AND b.w2 = t.w2
  CROSS JOIN v)
SELECT doc_id, COUNT(*)::BIGINT AS n_trigrams,
       ROUND(exp(-AVG(logp)), 4) AS ppl
FROM scored GROUP BY doc_id
"""


@register("text_perplexity", _PPL_SQL)
def text_perplexity(spark, sf_dir):
    """Per-document perplexity under an add-one-smoothed trigram LM
    trained on the corpus itself — the CCNet-style LM quality filter
    (low perplexity = fluent/common text, high = noise), the scoring
    half that text_ngram_lm's count tables feed.

    Scale shape: the trigram stream is materialized once
    (localCheckpoint — it feeds the trigram counts, the context
    counts, the vocab scalar, AND the per-instance scoring join).
    This was re-litigated in round 8: WITHOUT the checkpoint the
    executed plan shows 8 parquet scans and ZERO ReusedExchange —
    the explode recomputes per consumer, a scan multiplication local
    page cache hides but a 100 TB object store bills for — while
    local wall-clock is within noise either way, so the checkpoint
    stays (the pagerank lesson, measured not assumed). Count tables
    shuffle as compact (words, count) rows and join back on their
    keys (AQE broadcasts them while they fit); the document score is
    one groupBy(doc_id) average. Cross-engine float policy: ln/exp
    drift is ~ulp-scale while the ROUND is 4dp — the pagerank margin
    argument (DESIGN.md float policy)."""
    tok = _t(spark, sf_dir, "documents").select(
        "doc_id",
        F.split(
            F.regexp_replace(F.trim(F.lower(F.col("text"))), r"\s+", " "), " "
        ).alias("ts"),
    ).filter(F.size("ts") >= 3)
    tri = tok.select(
        "doc_id",
        F.explode(
            F.zip_with(
                F.slice(F.col("ts"), 1, F.size("ts") - 2),
                F.arrays_zip(
                    F.slice(F.col("ts"), 2, F.size("ts") - 2),
                    F.slice(F.col("ts"), 3, F.size("ts") - 2),
                ),
                lambda a, b: F.struct(
                    a.alias("w1"), b["0"].alias("w2"), b["1"].alias("w3")
                ),
            )
        ).alias("g"),
    ).select("doc_id", "g.w1", "g.w2", "g.w3").localCheckpoint()
    # ONE aggregation over the data-sized trigram stream; the context
    # counts and the vocab scalar are rollups of the (much smaller)
    # trigram-count table — counts are exact integers, so
    # SUM-of-counts == direct COUNT and COUNT(DISTINCT w3 of tcnt) ==
    # COUNT(DISTINCT w3 of tri), saving two full-stream shuffles
    tcnt = tri.groupBy("w1", "w2", "w3").agg(F.count(F.lit(1)).alias("n"))
    bcnt = tcnt.groupBy(
        F.col("w1").alias("b1"), F.col("w2").alias("b2")
    ).agg(F.sum("n").alias("cn"))
    v = tcnt.agg(F.countDistinct("w3").alias("vsz"))
    scored = (
        tri.join(tcnt, ["w1", "w2", "w3"])
        .join(bcnt, (F.col("w1") == F.col("b1")) & (F.col("w2") == F.col("b2")))
        .crossJoin(F.broadcast(v))
        .select(
            "doc_id",
            F.ln((F.col("n") + 1.0) / (F.col("cn") + F.col("vsz"))).alias("logp"),
        )
    )
    return scored.groupBy("doc_id").agg(
        F.count(F.lit(1)).cast("long").alias("n_trigrams"),
        F.round(F.exp(-F.avg("logp")), 4).alias("ppl"),
    )


# ---------------------------------------------------------------------------
# ml_knn_classify — embedding-space k-NN label prediction
# ---------------------------------------------------------------------------

_KNN_SQL = """
WITH q AS (SELECT vec_id AS qid, embedding AS qe FROM embeddings WHERE vec_id < 20),
c AS (SELECT vec_id, embedding, label FROM embeddings WHERE vec_id >= 20),
nn AS (SELECT qid, label,
       ROW_NUMBER() OVER (PARTITION BY qid
         ORDER BY list_cosine_similarity(qe, embedding) DESC, vec_id) AS rnk
       FROM q CROSS JOIN c),
votes AS (SELECT qid, label, COUNT(*)::BIGINT AS votes
          FROM nn WHERE rnk <= 5 GROUP BY 1, 2)
SELECT qid AS query_id, label AS pred_label, votes
FROM (SELECT qid, label, votes,
             ROW_NUMBER() OVER (PARTITION BY qid ORDER BY votes DESC, label) AS r
      FROM votes)
WHERE r = 1
"""


@register("ml_knn_classify", _KNN_SQL)
def ml_knn_classify(spark, sf_dir):
    """k-NN label prediction over the embedding table: each query
    vector (vec_id < 20) takes the majority label of its 5 nearest
    labeled neighbors (vec_id >= 20) by exact cosine — the standard
    embedding-quality probe (label recovery) run over a corpus.

    Scale shape: neighbor search is cosine_topk_batched's map-side
    partial top-k (every corpus batch emits <= k rows per query; the
    window ranks Q*k*batches rows, never the cross product); the vote
    is a (query, label) count + one deterministic argmax window
    (votes DESC, label ASC — bit-free integer ordering). Scores stay
    bit-identical to the oracle's list_cosine_similarity loop via the
    dimension-sequential accumulation."""
    from stockify_spark.llm.similarity import cosine_topk_batched
    from pyspark.sql import Window as W2

    emb = _t(spark, sf_dir, "embeddings")
    queries = emb.filter(F.col("vec_id") < 20)
    corpus = emb.filter(F.col("vec_id") >= 20)
    nn = cosine_topk_batched(corpus, queries, k=5, exclude_self=False)
    votes = (
        nn.join(
            corpus.select(F.col("vec_id").alias("neighbor_id"), "label"),
            "neighbor_id",
        )
        .groupBy("query_id", "label")
        .agg(F.count(F.lit(1)).alias("votes"))
    )
    w = W2.partitionBy("query_id").orderBy(F.col("votes").desc(), F.col("label"))
    return (
        votes.withColumn("_r", F.row_number().over(w))
        .filter(F.col("_r") == 1)
        .select("query_id", F.col("label").alias("pred_label"), "votes")
    )


# ---------------------------------------------------------------------------
# sample_weighted_group — per-group A-Res weighted sampling
# ---------------------------------------------------------------------------

_WSG_SQL = """
WITH keyed AS (
  SELECT source, doc_id, n_chars,
         ln((CAST(CONCAT('0x', substr(md5(CAST(doc_id AS VARCHAR)), 1, 13)) AS BIGINT) + 1.0)
            / 4503599627370497.0) / n_chars AS akey
  FROM documents
)
SELECT source, doc_id, n_chars
FROM (SELECT source, doc_id, n_chars,
             ROW_NUMBER() OVER (PARTITION BY source ORDER BY akey DESC, doc_id) AS rn
      FROM keyed)
WHERE rn <= 8
"""


@register("sample_weighted_group", _WSG_SQL)
def sample_weighted_group(spark, sf_dir):
    """Per-GROUP weighted sample without replacement: 8 documents per
    source, inclusion probability proportional to n_chars —
    Efraimidis-Spirakis A-Res keys (same seeded md5 uniform as the
    global sample_weighted) ranked inside each source partition.
    This is the partition-friendly form a stratified 100 TB corpus
    draw uses: one window per group (per-partition heaps, no global
    sort), keys computed map-side, hash-exact cross-engine."""
    from pyspark.sql import Window as W2

    d = _t(spark, sf_dir, "documents")
    u = (
        F.conv(F.substring(F.md5(F.col("doc_id").cast("string")), 1, 13), 16, 10)
        .cast("double")
        + 1.0
    ) / 4503599627370497.0
    akey = F.ln(u) / F.col("n_chars")
    w = W2.partitionBy("source").orderBy(F.col("akey").desc(), "doc_id")
    return (
        d.select("source", "doc_id", "n_chars", akey.alias("akey"))
        .withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= 8)
        .select("source", "doc_id", "n_chars")
    )


# ---------------------------------------------------------------------------
# window_vwap — volume-weighted average price, the stock-native window
# ---------------------------------------------------------------------------

_VWAP_SQL = """
SELECT event_id, user_id, value,
       ROUND(SUM(value * (event_id % 100 + 1)) OVER w
             / SUM(event_id % 100 + 1) OVER w, 6) AS vwap
FROM events
WINDOW w AS (PARTITION BY user_id ORDER BY epoch_ms(ts), event_id
             ROWS BETWEEN 9 PRECEDING AND CURRENT ROW)
"""


@register("window_vwap", _VWAP_SQL)
def window_vwap(spark, sf_dir):
    """Rolling 10-row VWAP per series — the stock-chart native the
    reference's domain implies (its W1 moving average is the
    unweighted special case, stockify.cu:513-537). Weight is a
    deterministic integer surrogate volume (event_id % 100 + 1) so
    the weighted sums are integer-scaled and cross-engine exact
    before the single display ROUND. One window pass, one shuffle on
    user_id, O(frame) running state."""
    from pyspark.sql import Window as W2

    t = _t(spark, sf_dir, "events").select(
        "event_id", "user_id", "value", F.unix_millis("ts").alias("ms")
    )
    vol = F.col("event_id") % 100 + 1
    w = W2.partitionBy("user_id").orderBy("ms", "event_id").rowsBetween(-9, 0)
    return t.select(
        "event_id",
        "user_id",
        "value",
        F.round(
            F.sum(F.col("value") * vol).over(w) / F.sum(vol).over(w), 6
        ).alias("vwap"),
    )


# ---------------------------------------------------------------------------
# join_asof_tolerance — staleness-bounded as-of join
# ---------------------------------------------------------------------------

_ASOF_TOL_SQL = """
SELECT p.event_id, p.user_id, p.value,
       CASE WHEN epoch_ms(p.ts) - epoch_ms(c.ts) <= 600000 THEN c.value END AS asof_value
FROM (SELECT * FROM events WHERE event_type = 'purchase') p
ASOF LEFT JOIN (SELECT * FROM events WHERE event_type = 'click') c
ON p.user_id = c.user_id AND p.ts >= c.ts
"""


@register("join_asof_tolerance", _ASOF_TOL_SQL)
def join_asof_tolerance(spark, sf_dir):
    """As-of join with a staleness bound: each purchase takes the
    latest prior click per user ONLY if it is at most 10 minutes old
    — the trade-quote alignment form where stale quotes must not
    leak. Same union + carry-forward window as asof_join (one shuffle
    per side, no range cross-product). The right row's (value, ts)
    ride as ONE carried struct so they fill atomically — independent
    per-column last(ignorenulls) fills would pair an older row's
    non-null value with the newest row's timestamp whenever the
    newest value is NULL (the match must be the latest ROW, exactly
    like the oracle's ASOF JOIN). Clicks are pre-deduped per
    (user, ts) to the max struct so equal-timestamp rows carry a
    deterministic winner in both engines' window orders. Tolerance
    is a map-side CASE after the fill."""
    from stockify_spark.operators.joins import asof_join

    events = _t(spark, sf_dir, "events")
    purchases = events.filter(F.col("event_type") == "purchase").select(
        "event_id", "user_id", "ts", "value"
    )
    clicks = (
        events.filter(F.col("event_type") == "click")
        .groupBy("user_id", "ts")
        .agg(
            F.max(
                F.struct(F.unix_millis("ts").alias("c_ms"), F.col("value").alias("v"))
            ).alias("q")
        )
    )
    out = asof_join(
        purchases, clicks, key="user_id", time_col="ts", right_value_cols=["q"]
    )
    tol_ok = F.unix_millis("ts") - F.col("asof_q.c_ms") <= 600000
    return out.select(
        "event_id",
        "user_id",
        "value",
        F.when(tol_ok, F.col("asof_q.v")).alias("asof_value"),
    )


# ---------------------------------------------------------------------------
# stream_txlog_upsert — CDC maintenance of the ACID table (batch face)
# ---------------------------------------------------------------------------

_CDC_SQL = """
SELECT o_orderkey,
       ROUND(CASE WHEN o_orderkey % 35 = 0 THEN 3333.0
                  WHEN o_orderkey % 7 = 0 THEN 2222.0
                  WHEN o_orderkey % 5 = 0 THEN 1111.0
                  ELSE o_totalprice END, 2) AS o_totalprice
FROM orders
"""


@register("stream_txlog_upsert", _CDC_SQL)
def stream_txlog_upsert(spark, sf_dir):
    """Incremental CDC maintenance of the ACID table: three change
    batches merge-upsert sequentially into a txlog table (keys %5 →
    1111, then %7 → 2222, then %35 → 3333), one atomic commit per
    batch — the foreachBatch sink pattern a streaming pipeline uses
    to keep a lakehouse table current (the STREAMING face runs the
    same merge_upsert under writeStream.foreachBatch in
    tests/test_streaming.py). The oracle is the last-writer-wins end
    state; hash-matching it proves the whole multi-commit replay.
    Per-batch cost is touched-files only, never table size."""
    from stockify_spark.registry_ext7 import _scratch_table
    from stockify_spark.sources import txlog

    def build(path: str) -> None:
        o = _t(spark, sf_dir, "orders").select("o_orderkey", "o_totalprice")
        txlog.create(o.repartitionByRange(4, "o_orderkey"), path)
        for mod, price in ((5, 1111.0), (7, 2222.0), (35, 3333.0)):
            batch = o.filter(F.col("o_orderkey") % mod == 0).select(
                "o_orderkey", F.lit(price).alias("o_totalprice")
            )
            txlog.merge_upsert(spark, path, batch, ["o_orderkey"])

    path = _scratch_table(sf_dir, "cdc", build)
    snap = txlog.snapshot(spark, path)
    return snap.select(
        "o_orderkey", F.round("o_totalprice", 2).alias("o_totalprice")
    )
