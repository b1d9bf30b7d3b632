"""Fourth extension wave (round 6): training-data hygiene operators
(PII redaction, distinctive-term extraction, trigram LM counts), the
MP3 frame-header probe, weighted PageRank, and product-quantized
ANN. Same determinism conventions as registry.py: every float in an
output is ROUND()ed identically on both engines, ties broken by a
total order, and regex patterns restricted to the syntax subset that
behaves identically in Java regex (Spark) and RE2 (DuckDB): no
lookaround, no backreferences, leftmost-first alternation.
"""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F

from stockify_spark.registry import register, _t


# ---------------------------------------------------------------------------
# PII redaction (pre-training hygiene). The synthetic corpus contains
# no organic PII, so the query plants a deterministic PII suffix per
# doc — identically in the Spark plan and the oracle SQL — and then
# redacts it: the MECHANISM (pattern match, count, replace, verify)
# is what's under test, with nonzero counts on every row.
# ---------------------------------------------------------------------------

# Java-regex / RE2 common-subset patterns.
_EMAIL_RE = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"
_IPV4_RE = r"\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b"
_PHONE_RE = r"\+\d{2}-\d{3}-\d{4,8}"

def _planted(doc_id):
    """The deterministic PII suffix for one doc — Spark side."""
    m = (doc_id % 250) + 1
    id7 = 1000000 + doc_id
    return F.concat(
        F.lit(" contact user"),
        doc_id.cast("string"),
        F.lit("@example-"),
        m.cast("string"),
        F.lit(".org or +49-555-"),
        id7.cast("string"),
        F.lit(" at 10."),
        m.cast("string"),
        F.lit("."),
        m.cast("string"),
        F.lit("."),
        m.cast("string"),
    )


_PLANTED_SQL = (
    "' contact user' || CAST(doc_id AS VARCHAR) || '@example-'"
    " || CAST(doc_id % 250 + 1 AS VARCHAR) || '.org or +49-555-'"
    " || CAST(1000000 + doc_id AS VARCHAR)"
    " || ' at 10.' || CAST(doc_id % 250 + 1 AS VARCHAR)"
    " || '.' || CAST(doc_id % 250 + 1 AS VARCHAR)"
    " || '.' || CAST(doc_id % 250 + 1 AS VARCHAR)"
)


@register(
    "pipeline_pii_redact",
    "WITH planted AS (SELECT doc_id,"
    f" text || {_PLANTED_SQL} AS text FROM documents),"
    " counted AS (SELECT doc_id, text,"
    f" len(regexp_extract_all(text, '{_EMAIL_RE}')) AS n_emails,"
    f" len(regexp_extract_all(text, '{_IPV4_RE}')) AS n_ips,"
    f" len(regexp_extract_all(text, '{_PHONE_RE}')) AS n_phones"
    " FROM planted)"
    " SELECT doc_id, CAST(n_emails AS BIGINT) AS n_emails,"
    " CAST(n_ips AS BIGINT) AS n_ips,"
    " CAST(n_phones AS BIGINT) AS n_phones,"
    " CAST(length(regexp_replace(regexp_replace(regexp_replace(text,"
    f" '{_EMAIL_RE}', '<EMAIL>', 'g'), '{_IPV4_RE}', '<IP>', 'g'),"
    f" '{_PHONE_RE}', '<PHONE>', 'g')) AS BIGINT) AS redacted_len,"
    " CAST(NOT regexp_matches(regexp_replace(regexp_replace("
    f" regexp_replace(text, '{_EMAIL_RE}', '<EMAIL>', 'g'),"
    f" '{_IPV4_RE}', '<IP>', 'g'), '{_PHONE_RE}', '<PHONE>', 'g'),"
    f" '{_EMAIL_RE}') AS BOOLEAN) AS clean"
    " FROM counted",
)
def pipeline_pii_redact(spark, sf_dir):
    """PII scrubbing, the standard pre-training hygiene pass (emails,
    IPv4s, phone numbers → typed placeholders). Pure column
    expressions — regexp_extract_all / regexp_replace run inside
    whole-stage codegen, zero Python, zero shuffles: at 100 TB this
    is a map-only pass whose cost is the scan itself. The `clean`
    column re-scans the redacted text for residual matches — the
    verify step a compliance pipeline needs."""
    docs = _t(spark, sf_dir, "documents").select(
        "doc_id", F.concat(F.col("text"), _planted(F.col("doc_id"))).alias("text")
    )
    redacted = F.regexp_replace(
        F.regexp_replace(
            F.regexp_replace(F.col("text"), _EMAIL_RE, "<EMAIL>"),
            _IPV4_RE,
            "<IP>",
        ),
        _PHONE_RE,
        "<PHONE>",
    )
    return docs.select(
        "doc_id",
        F.size(F.regexp_extract_all(F.col("text"), F.lit(_EMAIL_RE), F.lit(0))).cast("long").alias("n_emails"),
        F.size(F.regexp_extract_all(F.col("text"), F.lit(_IPV4_RE), F.lit(0))).cast("long").alias("n_ips"),
        F.size(F.regexp_extract_all(F.col("text"), F.lit(_PHONE_RE), F.lit(0))).cast("long").alias("n_phones"),
        F.length(redacted).cast("long").alias("redacted_len"),
        (~redacted.rlike(_EMAIL_RE)).alias("clean"),
    )


# ---------------------------------------------------------------------------
# Distinctive terms per document (tf-idf family). Ranking is kept in
# integer space — (tf DESC, df ASC, token ASC) — because ln() is not
# bit-reproducible across libm implementations; tf, df, and n_docs
# are emitted so the float tf·idf is reconstructable downstream.
# ---------------------------------------------------------------------------

_TOKS_SQL = (
    "list_filter(string_split_regex(lower(text), '[^a-z0-9]+'), t -> t <> '')"
)


@register(
    "text_tfidf_topk",
    "WITH tok AS (SELECT doc_id, unnest("
    f" {_TOKS_SQL}) AS token FROM documents),"
    " tf AS (SELECT doc_id, token, CAST(COUNT(*) AS BIGINT) AS tf"
    "  FROM tok GROUP BY doc_id, token),"
    " withdf AS (SELECT doc_id, token, tf,"
    "  CAST(COUNT(*) OVER (PARTITION BY token) AS BIGINT) AS df FROM tf),"
    " scored AS (SELECT doc_id, token, tf, df,"
    "  ROW_NUMBER() OVER (PARTITION BY doc_id"
    "   ORDER BY tf DESC, df ASC, token ASC) AS rk"
    "  FROM withdf)"
    " SELECT doc_id, token, tf, df, CAST(rk AS BIGINT) AS rk"
    " FROM scored WHERE rk <= 3",
)
def text_tfidf_topk(spark, sf_dir):
    """Top-3 distinctive terms per document: term frequency widened
    with corpus document frequency, ranked (tf DESC, df ASC, token).

    Scale shape: the raw exploded-token stream (the 100 TB-scale
    thing) is scanned ONCE into the tf aggregate (map-side combine on
    doc_id+token), which is checkpointed; document frequency is a
    vocabulary-sized groupBy over that compact result joined back on
    token (skew-safe: a stopword's df rows would pin a single
    WindowExec buffer, while the join is broadcast-able or
    AQE-skew-splittable — the substring-dedup lesson), and the top-k
    is a bounded per-doc window. The checkpoint is what keeps the
    source single-scan across the two df consumers (exchange reuse
    does not fire across differently-filtered subtrees)."""
    docs = _t(spark, sf_dir, "documents")
    tok = docs.select(
        "doc_id",
        F.explode(
            F.filter(
                F.split(F.lower(F.col("text")), "[^a-z0-9]+"),
                lambda t: t != "",
            )
        ).alias("token"),
    )
    # the raw exploded-token stream (the 100 TB thing) is scanned
    # exactly once into the compact (doc_id, token, tf) table, which
    # is checkpointed so BOTH df consumers below read the
    # materialized rows instead of re-running the explode.
    # localCheckpoint = executor-local, unreplicated, lineage
    # truncated: right for the local/bench path; at cluster scale
    # swap in persist(DISK_ONLY_2) or a reliable checkpoint() — the
    # fault-tolerance trade documented at
    # llm/dedup.repeated_substring_spans
    tf = (
        tok.groupBy("doc_id", "token")
        .agg(F.count(F.lit(1)).alias("tf"))
        .localCheckpoint()
    )
    # df: groupBy + join-back, not COUNT OVER (PARTITION BY token) —
    # token document-frequency is the canonical power-law key (a
    # stopword appears in ~every doc, putting n_docs rows in ONE
    # WindowExec buffer at corpus scale; AQE splits skewed joins,
    # not windows). The map-side partial count absorbs the hot
    # token; the df table is vocabulary-sized (broadcast-able).
    dfreq = tf.groupBy("token").agg(F.count(F.lit(1)).alias("df"))
    withdf = tf.join(dfreq, "token")
    w = Window.partitionBy("doc_id").orderBy(
        F.col("tf").desc(), F.col("df").asc(), F.col("token").asc()
    )
    return (
        withdf.select("doc_id", "token", "tf", "df", F.row_number().over(w).alias("rk"))
        .filter(F.col("rk") <= 3)
        .select("doc_id", "token", "tf", "df", F.col("rk").cast("long").alias("rk"))
    )


# ---------------------------------------------------------------------------
# Compressed-audio container probe: MP3 frame-header walk (llm/mp3.py)
# — the audio twin of media_avi_index / media_mp4_index. Sample
# decode stays an honest NotImplementedError boundary; the probe
# (frame index, duration, CBR/VBR classification) is real structure
# over structurally valid frames.
# ---------------------------------------------------------------------------

_MP3_N = 48
_MP3_KBPS_SQL = "list_value(0,32,40,48,56,64,80,96,112,128,160,192,224,256,320)"


@register(
    "media_mp3_index",
    f"WITH ids AS (SELECT unnest(range(0, {_MP3_N})) AS media_id),"
    " spec AS (SELECT media_id,"
    "  40 + (media_id % 60) AS n_frames,"
    f" {_MP3_KBPS_SQL}[(media_id % 14) + 2] AS k1,"
    f" {_MP3_KBPS_SQL}[((media_id + 5) % 14) + 2] AS k2,"
    "  CASE media_id % 3 WHEN 0 THEN 44100 WHEN 1 THEN 48000"
    "   ELSE 32000 END AS sample_rate FROM ids)"
    " SELECT media_id, CAST(n_frames AS BIGINT) AS n_frames,"
    " CAST(sample_rate AS INTEGER) AS sample_rate,"
    " CAST(n_frames * 1152 * 1000 // sample_rate AS BIGINT) AS duration_ms,"
    " CAST(CASE WHEN media_id % 2 = 0 THEN k1"
    "  ELSE ((n_frames + 1) // 2 * k1 + n_frames // 2 * k2) // n_frames"
    "  END AS INTEGER) AS mean_kbps,"
    " CAST(media_id % 2 = 1 AS BOOLEAN) AS is_vbr"
    " FROM spec",
)
def media_mp3_index(spark, sf_dir):
    """Compressed-audio metadata probe: mapInPandas walks MPEG-1
    Layer III frame headers per payload (llm/mp3.mp3_info) — frame
    count, sample rate, exact duration, mean bitrate, CBR/VBR — and
    never reads audio payload bytes. Even ids are CBR streams, odd
    ids alternate two bitrates (VBR); the oracle recomputes every
    figure closed-form from the generation spec. Sample decode is
    the documented NotImplementedError boundary (llm/mp3.decode_mp3)."""
    import pandas as pd

    from pyspark.sql import types as T

    from stockify_spark.llm.mp3 import encode_mp3_frames

    rows = []
    for i in range(_MP3_N):
        b1, b2 = (i % 14) + 1, ((i + 5) % 14) + 1
        n = 40 + (i % 60)
        pattern = [b1] * n if i % 2 == 0 else [b1, b2] * ((n + 1) // 2)
        rows.append((i, bytearray(encode_mp3_frames(pattern[:n], sr_idx=i % 3))))
    media = spark.createDataFrame(rows, "media_id long, content binary")

    schema = T.StructType(
        [
            T.StructField("media_id", T.LongType(), False),
            T.StructField("n_frames", T.LongType(), False),
            T.StructField("sample_rate", T.IntegerType(), False),
            T.StructField("duration_ms", T.LongType(), False),
            T.StructField("mean_kbps", T.IntegerType(), False),
            T.StructField("is_vbr", T.BooleanType(), False),
        ]
    )

    def run(batches):
        from stockify_spark.llm.mp3 import mp3_info

        for pdf in batches:
            out = {k.name: [] for k in schema.fields}
            for mid, content in zip(pdf["media_id"], pdf["content"]):
                n, sr, dur, mean, vbr = mp3_info(bytes(content))
                out["media_id"].append(mid)
                out["n_frames"].append(n)
                out["sample_rate"].append(sr)
                out["duration_ms"].append(dur)
                out["mean_kbps"].append(mean)
                out["is_vbr"].append(vbr)
            yield pd.DataFrame(out)

    return media.mapInPandas(run, schema)


# ---------------------------------------------------------------------------
# Iterative graph algorithm #2: weighted PageRank on the nation trade
# graph (operators/graph.py). The oracle is a DuckDB recursive CTE
# running the identical recurrence; both engines round the final
# ranks to 9 decimals (per-destination sums add ≤25 doubles in
# engine-defined order — ~1e-15 drift vs a 5e-10 rounding boundary).
# ---------------------------------------------------------------------------

@register(
    "graph_pagerank",
    "WITH RECURSIVE"
    " e AS (SELECT c_nationkey AS src, s_nationkey AS dst,"
    "  CAST(COUNT(*) AS DOUBLE) AS w"
    "  FROM lineitem JOIN orders ON l_orderkey = o_orderkey"
    "  JOIN customer ON o_custkey = c_custkey"
    "  JOIN supplier ON l_suppkey = s_suppkey"
    "  GROUP BY 1, 2),"
    " ew AS (SELECT e.*, ow.ow FROM e JOIN"
    "  (SELECT src, SUM(w) AS ow FROM e GROUP BY src) ow USING (src)),"
    " n AS (SELECT CAST(COUNT(DISTINCT src) AS DOUBLE) AS n FROM e),"
    " pr(it, node, rank) AS ("
    "  SELECT 0, src, 1.0 / (SELECT n FROM n)"
    "   FROM (SELECT DISTINCT src FROM e)"
    "  UNION ALL"
    "  SELECT it + 1, dst,"
    "   (1.0 - 0.85) / (SELECT n FROM n) + 0.85 * SUM(rank * w / ow)"
    "  FROM pr JOIN ew ON ew.src = pr.node"
    "  WHERE it < 8 GROUP BY it + 1, dst)"
    " SELECT CAST(node AS BIGINT) AS nation, ROUND(rank, 9) AS rank"
    " FROM pr WHERE it = 8",
)
def graph_pagerank(spark, sf_dir):
    """Weighted PageRank over the customer-nation → supplier-nation
    trade graph: edge weights are lineitem counts aggregated from
    the 4-way fact join (the data-sized work — one shuffle per join
    plus the edge aggregation), then 8 fixed-point rounds over the
    25-node edge list (operators/graph.pagerank, localCheckpoint
    lineage truncation). The dense trade graph gives every nation
    in- and out-edges, so the inner-join recurrence is standard
    uniform-teleport PageRank."""
    from stockify_spark.operators.graph import pagerank

    li = _t(spark, sf_dir, "lineitem")
    orders = _t(spark, sf_dir, "orders")
    cust = _t(spark, sf_dir, "customer")
    supp = _t(spark, sf_dir, "supplier")
    edges = (
        li.join(orders, li["l_orderkey"] == orders["o_orderkey"])
        .join(cust, orders["o_custkey"] == cust["c_custkey"])
        .join(supp, li["l_suppkey"] == supp["s_suppkey"])
        .groupBy(
            F.col("c_nationkey").alias("src"), F.col("s_nationkey").alias("dst")
        )
        .agg(F.count(F.lit(1)).cast("double").alias("w"))
    )
    ranks = pagerank(edges, iters=8, damping=0.85)
    return ranks.select(
        F.col("node").cast("long").alias("nation"), F.round("rank", 9).alias("rank")
    )


# ---------------------------------------------------------------------------
# N-gram language-model counts (the KenLM-style corpus statistics a
# perplexity quality filter is built from). Everything is exact
# integers — counts and continuation counts — so the comparison is
# hash-exact; downstream smoothing (Kneser-Ney etc.) is a pure
# function of these tables.
# ---------------------------------------------------------------------------

@register(
    "text_ngram_lm",
    "WITH tok AS (SELECT doc_id, string_split_regex(trim(lower(text)), '\\s+') AS ts"
    "  FROM documents),"
    " tri AS (SELECT ts[i] AS w1, ts[i+1] AS w2, ts[i+2] AS w3"
    "  FROM (SELECT ts, unnest(range(1, len(ts) - 1)) AS i FROM tok"
    "        WHERE len(ts) >= 3)),"
    " counted AS (SELECT w1, w2, w3, CAST(COUNT(*) AS BIGINT) AS n"
    "  FROM tri GROUP BY w1, w2, w3),"
    " withcont AS (SELECT w1, w2, w3, n,"
    "  CAST(COUNT(*) OVER (PARTITION BY w2, w3) AS BIGINT) AS continuations,"
    "  CAST(SUM(n) OVER (PARTITION BY w2, w3) AS BIGINT) AS bigram_total"
    "  FROM counted)"
    " SELECT w1, w2, w3, n, continuations, bigram_total"
    " FROM withcont WHERE n >= 3",
)
def text_ngram_lm(spark, sf_dir):
    """Trigram LM count table with Kneser-Ney continuation counts:
    per trigram, its count, the number of DISTINCT left contexts of
    its (w2, w3) suffix, and that suffix's total count — the exact
    integer statistics interpolated-KN smoothing needs (the n >= 3
    floor is the usual count pruning).

    Scale shape: trigrams come from a per-row array zip (no
    self-join of the token stream, which is scanned once); one
    shuffle builds the trigram counts with map-side combine, and the
    suffix statistics are window aggregates over that compact table
    re-partitioned on (w2, w3). At 100 TB the trigram table is the
    big intermediate — it shuffles as (3 words, count) rows only,
    and the count-floor prunes the long tail at the end."""
    docs = _t(spark, sf_dir, "documents")
    toks = docs.select(
        F.split(F.regexp_replace(F.trim(F.lower(F.col("text"))), r"\s+", " "), " ").alias("ts")
    ).filter(F.size("ts") >= 3)
    tri = toks.select(
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
        ).alias("g")
    ).select("g.w1", "g.w2", "g.w3")
    counted = tri.groupBy("w1", "w2", "w3").agg(F.count(F.lit(1)).alias("n"))
    # suffix statistics as window aggregates over the compact count
    # table — the join-back formulation recomputed `counted` (and its
    # upstream trigram explode) twice, same exchange-reuse miss as
    # text_tfidf_topk's first draft
    wcont = Window.partitionBy("w2", "w3")
    return (
        counted.select(
            "w1", "w2", "w3", "n",
            F.count(F.lit(1)).over(wcont).alias("continuations"),
            F.sum("n").over(wcont).alias("bigram_total"),
        )
        .filter(F.col("n") >= 3)
    )


# ---------------------------------------------------------------------------
# Product quantization ANN (llm/similarity.pq_topk) — the FAISS-style
# PQ compression made cross-engine deterministic: int8 half-up
# quantization, data-seeded codebooks (subvectors of the first 16
# corpus vectors), integer-L2 encode with ties to the lowest index,
# and exact-integer asymmetric-distance scoring, so the comparison is
# hash-exact.
# ---------------------------------------------------------------------------

@register(
    "sim_pq_topk",
    "WITH q8 AS ("
    " SELECT vec_id, list_transform(embedding,"
    "  x -> CAST(floor(CAST(x AS DOUBLE) * 127.0 /"
    "   greatest(list_max(list_transform(embedding, y -> abs(CAST(y AS DOUBLE)))), 1e-30)"
    "   + 0.5) AS BIGINT)) AS q"
    " FROM embeddings),"
    "subs AS ("
    " SELECT vec_id, m, q[m*16+1 : m*16+16] AS sub"
    " FROM q8, (SELECT unnest(range(0, 4)) AS m)),"
    "cb AS ("
    " SELECT m, vec_id AS j, sub AS csub FROM subs WHERE vec_id < 16),"
    "dists AS ("
    " SELECT s.vec_id, s.m, cb.j,"
    "  list_sum(list_transform(list_zip(s.sub, cb.csub),"
    "   p -> (p[1] - p[2]) * (p[1] - p[2]))) AS d2"
    " FROM subs s JOIN cb ON cb.m = s.m),"
    "codes AS ("
    " SELECT vec_id, m, j FROM ("
    "  SELECT vec_id, m, j, ROW_NUMBER() OVER (PARTITION BY vec_id, m ORDER BY d2, j) AS rk"
    "  FROM dists) WHERE rk = 1),"
    "adc AS ("
    " SELECT qs.vec_id AS query_id, c.vec_id AS neighbor_id,"
    "  SUM(list_sum(list_transform(list_zip(qs.sub, cb.csub), p -> p[1] * p[2]))) AS dot"
    " FROM subs qs"
    " JOIN codes c ON TRUE"
    " JOIN cb ON cb.m = qs.m AND cb.m = c.m AND cb.j = c.j"
    " WHERE qs.vec_id < 5 AND c.vec_id <> qs.vec_id"
    " GROUP BY 1, 2)"
    "SELECT query_id, neighbor_id, CAST(rank AS BIGINT) AS rank FROM ("
    " SELECT query_id, neighbor_id,"
    "  ROW_NUMBER() OVER (PARTITION BY query_id ORDER BY dot DESC, neighbor_id) AS rank"
    " FROM adc) WHERE rank <= 5",
)
def sim_pq_topk(spark, sf_dir):
    """Product-quantized ANN top-k (llm/similarity.pq_topk): 4
    subspaces x 16-entry seeded codebooks over int8 vectors, exact
    integer encode + asymmetric-distance scoring. Corpus encode and
    scoring are map-side JVM column expressions against the literal
    codebook; the only shuffle is the per-query top-k window. The
    fourth ANN variant beside brute-force, seeded-IVF, and
    hyperplane LSH — at scale the 4-byte codes are the cheap
    first-pass ranker, float re-scoring the short list."""
    from stockify_spark.llm.similarity import pq_topk

    return pq_topk(_t(spark, sf_dir, "embeddings"))
