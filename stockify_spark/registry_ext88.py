"""Round-9 extension: MP3 Layer III zero-spectrum sample decode.

r8 verdict #6 — move the MP3 honest boundary one notch inward, in the
media_flac_decode tolerance-of-truth family: the oracle RECOMPUTES
everything the decoder must produce (frame count, duration, VBR flag,
sample count, waveform stats, and a side-info digest) from the
fixture's closed forms through an independent path. The decode side
walks real MPEG-1 frame structure (padding-alternating lengths, three
sample rates), parses the 256-bit stereo side info bit-exactly, and
reconstructs the per-spec exactly-silent PCM; a mis-walked frame
boundary changes n_frames/duration, a one-bit side-info offset error
scrambles the global_gain/count1table_select digest, and a wrong
sample count or non-zero sample changes n_samples/peak/rms — each
fails the value hash. Non-silent Layer III (huffman + scalefactors +
IMDCT) stays behind decode_mp3's NotImplementedError (llm/mp3.py).
"""

from __future__ import annotations

from pyspark.sql import functions as F

from stockify_spark.registry import register, _t

_MP3_N = 18  # media ids; sr cycles all three MPEG-1 rates

# fixture closed forms shared by the Spark generator and the oracle:
#   n_frames(m)       = 6 + m % 5
#   sr(m)             = (44100, 48000, 32000)[m % 3]
#   bitrate_idx(m, j) = 1 + (m*5 + j*3) % 14
#   gain(m, j, g, c)  = (m*7 + j*11 + g*13 + c*29) % 256
#   count1(m, j, g, c)= (m + j + g + c) % 2
_MP3_SQL = f"""
WITH ids AS (SELECT unnest(range(0, {_MP3_N})) AS media_id),
spec AS (
  SELECT media_id,
         6 + media_id % 5 AS n_frames,
         CASE media_id % 3 WHEN 0 THEN 44100 WHEN 1 THEN 48000
              ELSE 32000 END AS sample_rate
  FROM ids),
frames AS (
  SELECT media_id, n_frames, sample_rate,
         unnest(range(0, n_frames)) AS j
  FROM spec),
rates AS (
  SELECT media_id,
         COUNT(DISTINCT 1 + (media_id * 5 + j * 3) % 14) AS n_rates
  FROM frames GROUP BY media_id),
cells AS (
  SELECT f.media_id, f.j, g.g, c.c
  FROM frames f,
       (SELECT unnest(range(0, 2)) AS g) g,
       (SELECT unnest(range(0, 2)) AS c) c),
digest AS (
  SELECT media_id,
         CAST(SUM(((media_id * 7 + j * 11 + g * 13 + c * 29) % 256)
                    * (1 + 2 * g + c)
                  + (media_id + j + g + c) % 2) AS BIGINT) AS side_digest
  FROM cells GROUP BY media_id)
SELECT s.media_id,
       CAST(s.n_frames AS BIGINT) AS n_frames,
       CAST(s.sample_rate AS INTEGER) AS sample_rate,
       CAST(s.n_frames * 1152 * 1000 // s.sample_rate AS BIGINT) AS duration_ms,
       r.n_rates > 1 AS is_vbr,
       CAST(s.n_frames * 1152 AS BIGINT) AS n_samples,
       d.side_digest,
       CAST(0 AS INTEGER) AS peak,
       CAST(0.0 AS DOUBLE) AS rms_r
FROM spec s
JOIN rates r USING (media_id)
JOIN digest d USING (media_id)
"""


@register("media_mp3_decode", _MP3_SQL)
def media_mp3_decode(spark, sf_dir):
    """Encode→decode MP3 silence streams inside two Arrow-batched
    stages (the 100 TB audio-corpus plumbing shape: binary column in,
    per-file stats out), then reduce the decoded PCM and parsed side
    info to the columns the closed-form oracle recomputes."""
    import pandas as pd
    from pyspark.sql import types as T

    from stockify_spark.llm.mp3 import decode_mp3, encode_mp3_silence, mp3_info

    spec = spark.createDataFrame(
        [(m, 6 + m % 5, m % 3) for m in range(_MP3_N)],
        "media_id long, n_frames long, sr_idx int",
    )

    def ingest(batches):
        for pdf in batches:
            payloads = []
            for m, nf, sr_idx in zip(pdf["media_id"], pdf["n_frames"], pdf["sr_idx"]):
                m, nf = int(m), int(nf)
                payloads.append(
                    bytearray(
                        encode_mp3_silence(
                            [1 + (m * 5 + j * 3) % 14 for j in range(nf)],
                            sr_idx=int(sr_idx),
                            gain_fn=lambda j, g, c, m=m: (m * 7 + j * 11 + g * 13 + c * 29) % 256,
                            count1_fn=lambda j, g, c, m=m: (m + j + g + c) % 2,
                        )
                    )
                )
            yield pd.DataFrame({"media_id": pdf["media_id"], "content": payloads})

    media = spec.mapInPandas(
        ingest,
        T.StructType(
            [
                T.StructField("media_id", T.LongType(), False),
                T.StructField("content", T.BinaryType(), False),
            ]
        ),
    )

    out_schema = T.StructType(
        [
            T.StructField("media_id", T.LongType(), False),
            T.StructField("n_frames", T.LongType(), False),
            T.StructField("sample_rate", T.IntegerType(), False),
            T.StructField("duration_ms", T.LongType(), False),
            T.StructField("is_vbr", T.BooleanType(), False),
            T.StructField("n_samples", T.LongType(), False),
            T.StructField("side_digest", T.LongType(), False),
            T.StructField("peak", T.IntegerType(), False),
            T.StructField("rms_r", T.DoubleType(), False),
        ]
    )

    def analyze(batches):
        for pdf in batches:
            rows = []
            for m, content in zip(pdf["media_id"], pdf["content"]):
                payload = bytes(content)
                nf, sr, dur_ms, _mean, vbr = mp3_info(payload)
                dec = decode_mp3(payload)
                samples = dec["samples"]
                n = len(samples)
                rows.append(
                    (
                        int(m),
                        nf,
                        sr,
                        dur_ms,
                        bool(vbr),
                        n,
                        dec["side_digest"],
                        max(abs(s) for s in samples),
                        (sum(s * s for s in samples) / n) ** 0.5,
                    )
                )
            yield pd.DataFrame(
                rows,
                columns=[
                    "media_id",
                    "n_frames",
                    "sample_rate",
                    "duration_ms",
                    "is_vbr",
                    "n_samples",
                    "side_digest",
                    "peak",
                    "rms_r",
                ],
            )

    return media.mapInPandas(analyze, out_schema)


# ---------------------------------------------------------------------------
# DSIR-style importance weights — data selection via importance
# resampling (hashed n-gram likelihood-ratio weighting, the standard
# recipe for matching a raw crawl to a target domain before
# pretraining). Target here: the 'de' slice of the corpus; every doc
# gets log w = Σ_tokens [ln p_target(bucket) - ln p_raw(bucket)] over
# md5-hashed unigram buckets with Laplace smoothing, and the top-50
# by weight are the selected batch.
# ---------------------------------------------------------------------------

_DSIR_B = 64  # hash buckets; model state is 2 x 64 counts

_DSIR_SQL = f"""
WITH toks AS (
  SELECT doc_id, lang, tok FROM (
    SELECT doc_id, lang,
           unnest(string_split_regex(lower(text), '[^a-z]+')) AS tok
    FROM documents)
  WHERE length(tok) > 0),
tb AS (
  SELECT doc_id, lang,
         CAST(CONCAT('0x', substr(md5(tok), 1, 8)) AS BIGINT) % {_DSIR_B} AS b
  FROM toks),
raw AS (SELECT b, COUNT(*) AS rc FROM tb GROUP BY b),
tgt AS (SELECT b, COUNT(*) AS tc FROM tb WHERE lang = 'de' GROUP BY b),
tot AS (SELECT CAST((SELECT COUNT(*) FROM tb) AS DOUBLE) AS nr,
               CAST((SELECT COUNT(*) FROM tb WHERE lang = 'de') AS DOUBLE) AS nt),
w AS (
  SELECT r.b,
         ln((COALESCE(t.tc, 0) + 0.5) / (tot.nt + {_DSIR_B} * 0.5))
         - ln((r.rc + 0.5) / (tot.nr + {_DSIR_B} * 0.5)) AS lr
  FROM raw r LEFT JOIN tgt t USING (b), tot),
sc AS (
  SELECT tb.doc_id, CAST(COUNT(*) AS BIGINT) AS n_tokens,
         ROUND(SUM(w.lr), 6) AS log_w
  FROM tb JOIN w USING (b) GROUP BY tb.doc_id)
SELECT doc_id, n_tokens, log_w
FROM sc ORDER BY log_w DESC, doc_id LIMIT 50
"""


@register("pipeline_dsir_weights", _DSIR_SQL)
def pipeline_dsir_weights(spark, sf_dir):
    """Hashed-unigram importance-resampling weights against a target
    domain (the 'de' corpus slice), top-50 selected.

    Scale shape, end to end: tokenize + bucket is one map pass; the
    target and raw bucket histograms are two bounded aggregates (64
    rows each — model state, not data); the per-bucket log-ratio
    table is built from those 64 rows and BROADCAST back; scoring is
    one broadcast-join + per-doc sum; selection is ORDER BY + LIMIT
    (TakeOrderedAndProject — per-partition top-k, never a global
    sort). Nothing in the plan collects or shuffles row-scale state
    besides the one groupBy(doc_id), so the recipe survives a 100 TB
    raw corpus with a fixed-size target sample unchanged. Float
    policy: ln ratios summed per doc, ROUND 6 after the aggregate on
    both engines."""
    from stockify_spark.registry import _t

    from stockify_spark.functions.scale import spread_small_scan

    docs = _t(spark, sf_dir, "documents")
    # spread the single-file scan: the tokenize + per-token md5 bucket
    # below is the expensive-map case functions/scale documents, and
    # it feeds BOTH corpus passes
    toks = spread_small_scan(docs.select("doc_id", "lang", "text")).select(
        "doc_id",
        "lang",
        F.explode(F.split(F.lower(F.col("text")), "[^a-z]+")).alias("tok"),
    ).filter(F.length("tok") > 0)
    tb = toks.select(
        "doc_id",
        "lang",
        (
            F.conv(F.substring(F.md5(F.col("tok")), 1, 8), 16, 10).cast("long")
            % _DSIR_B
        ).alias("b"),
    )
    # BOTH histograms in ONE corpus aggregate (raw count + target
    # count_if per bucket), checkpointed at 64 rows so the totals
    # rollup and the broadcast build don't re-run the tokenize+md5
    # pass — the plan is now exactly two corpus passes (histogram,
    # scoring), down from four
    hist = (
        tb.groupBy("b")
        .agg(
            F.count(F.lit(1)).alias("rc"),
            F.sum(F.when(F.col("lang") == "de", 1).otherwise(0)).alias("tc"),
        )
        .localCheckpoint(eager=True)
    )  # bounded: <= _DSIR_B rows of model state
    tot = hist.agg(
        F.sum("rc").cast("double").alias("nr"),
        F.sum("tc").cast("double").alias("nt"),
    )
    w = (
        hist.crossJoin(F.broadcast(tot))
        .select(
            "b",
            (
                F.log(
                    (F.col("tc") + 0.5)
                    / (F.col("nt") + _DSIR_B * 0.5)
                )
                - F.log((F.col("rc") + 0.5) / (F.col("nr") + _DSIR_B * 0.5))
            ).alias("lr"),
        )
    )
    sc = (
        tb.join(F.broadcast(w), "b")
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_tokens"),
            F.round(F.sum("lr"), 6).alias("log_w"),
        )
    )
    return sc.orderBy(F.col("log_w").desc(), "doc_id").limit(50).select(
        "doc_id", "n_tokens", "log_w"
    )


# ---------------------------------------------------------------------------
# Temperature-scaled sampling mix — the multilingual upsampling recipe
# (p_i ∝ share_i^alpha with alpha < 1 flattens the language
# distribution; alpha = 0.3 is the published mT5/XLM-R setting).
# Output per language: raw token share, temperature-scaled sampling
# probability, and the implied upsampling factor p_alpha / p_raw.
# ---------------------------------------------------------------------------

_TEMP_ALPHA = 0.3

_TEMP_MIX_SQL = f"""
WITH tok AS (
  SELECT lang,
         CAST(SUM(len(list_filter(string_split_regex(lower(text),
              '[^a-z0-9]+'), t -> t <> ''))) AS BIGINT) AS total_tokens
  FROM documents GROUP BY lang),
tot AS (SELECT CAST(SUM(total_tokens) AS DOUBLE) AS n FROM tok),
sh AS (SELECT lang, total_tokens,
              total_tokens / tot.n AS p_raw,
              POW(total_tokens / tot.n, {_TEMP_ALPHA}) AS pa_un
       FROM tok, tot),
z AS (SELECT SUM(pa_un) AS z FROM sh)
SELECT lang, total_tokens,
       ROUND(p_raw, 6) AS p_raw,
       ROUND(pa_un / z.z, 6) AS p_alpha,
       ROUND((pa_un / z.z) / p_raw, 6) AS upsample
FROM sh, z
"""


@register("pipeline_temperature_mix", _TEMP_MIX_SQL)
def pipeline_temperature_mix(spark, sf_dir):
    """Temperature sampling weights per language at alpha = 0.3.

    Scale shape: one map-side-combined aggregate over the corpus scan
    (token counting fused as a column expression — zero Python), then
    all remaining arithmetic runs on the |langs|-row table with the
    two scalar totals broadcast — model-sized state end to end. The
    published use: low-resource languages are upsampled (factor > 1)
    and the head language is downsampled, with alpha the only knob.
    Float policy: POW/divides in double, ROUND 6 after aggregation on
    both engines."""
    from stockify_spark.registry import _t

    docs = _t(spark, sf_dir, "documents")
    tok_count = F.size(
        F.filter(
            F.split(F.lower(F.col("text")), "[^a-z0-9]+"),
            lambda t: t != "",
        )
    )
    tok = docs.groupBy("lang").agg(
        F.sum(tok_count).cast("long").alias("total_tokens")
    )
    tot = tok.agg(F.sum("total_tokens").cast("double").alias("n"))
    sh = tok.crossJoin(F.broadcast(tot)).select(
        "lang",
        "total_tokens",
        (F.col("total_tokens") / F.col("n")).alias("p_raw"),
        F.pow(F.col("total_tokens") / F.col("n"), _TEMP_ALPHA).alias("pa_un"),
    )
    z = sh.agg(F.sum("pa_un").alias("z"))
    return sh.crossJoin(F.broadcast(z)).select(
        "lang",
        "total_tokens",
        F.round("p_raw", 6).alias("p_raw"),
        F.round(F.col("pa_un") / F.col("z"), 6).alias("p_alpha"),
        F.round((F.col("pa_un") / F.col("z")) / F.col("p_raw"), 6).alias("upsample"),
    )


# ---------------------------------------------------------------------------
# CCNet-style perplexity bucketing — per-language head/middle/tail
# terciles under the corpus trigram LM, with the keep decision
# (head + middle retained, tail dropped) that the CCNet pipeline
# applies before training. Builds on text_perplexity's LM scoring
# (registry_ext8) — this is the SELECTION half.
# ---------------------------------------------------------------------------

_PPL_BUCKET_SQL = f"""
WITH ppl_scored AS ({{ppl_sql}}),
with_lang AS (
  SELECT p.doc_id, d.lang, p.ppl
  FROM ppl_scored p JOIN documents d USING (doc_id)),
bucketed AS (
  SELECT lang, ppl,
         NTILE(3) OVER (PARTITION BY lang ORDER BY ppl, doc_id) AS bucket
  FROM with_lang)
SELECT lang, CAST(bucket AS BIGINT) AS bucket,
       CAST(COUNT(*) AS BIGINT) AS n_docs,
       ROUND(AVG(ppl), 4) AS mean_ppl,
       bucket <= 2 AS kept
FROM bucketed GROUP BY lang, bucket
"""


def _ppl_bucket_sql() -> str:
    from stockify_spark.registry_ext8 import _PPL_SQL

    return _PPL_BUCKET_SQL.format(ppl_sql=_PPL_SQL)


@register("pipeline_ppl_buckets", _ppl_bucket_sql())
def pipeline_ppl_buckets(spark, sf_dir):
    """Per-language perplexity terciles (head=1 / middle=2 / tail=3)
    and the CCNet keep rule (tail dropped).

    Scale shape: the LM scoring inherits text_perplexity's plan (one
    checkpointed trigram stream, count tables joined back on their
    keys); bucketing here uses NTILE over (lang) for EXACT tercile
    parity with the oracle — a per-language sort, bounded by the
    largest language. The 100 TB form replaces the sort with
    percentile_approx cutoffs per language (two bounded aggregates,
    no global order) at the cost of approximate boundaries; CCNet
    itself uses fixed percentile cutoffs computed once on a sample,
    which is exactly that form. Output is |langs| x 3 rows."""
    from stockify_spark.registry_ext8 import text_perplexity
    from stockify_spark.registry import _t
    from pyspark.sql import Window

    ppl = text_perplexity(spark, sf_dir).select("doc_id", "ppl")
    docs = _t(spark, sf_dir, "documents").select("doc_id", "lang")
    w = Window.partitionBy("lang").orderBy("ppl", "doc_id")
    bucketed = ppl.join(docs, "doc_id").select(
        "lang", "ppl", F.ntile(3).over(w).alias("bucket")
    )
    return bucketed.groupBy("lang", "bucket").agg(
        F.count(F.lit(1)).cast("long").alias("n_docs"),
        F.round(F.avg("ppl"), 4).alias("mean_ppl"),
    ).select(
        "lang",
        F.col("bucket").cast("long").alias("bucket"),
        "n_docs",
        "mean_ppl",
        (F.col("bucket") <= 2).alias("kept"),
    )


# ---------------------------------------------------------------------------
# Count-Min sketch — the streaming-frequency summary (Cormode &
# Muthukrishnan 2005): d independent hash rows of w counters; a key's
# frequency estimate is the MIN of its d counters, which can only
# OVERestimate (one-sided error <= eps*N with prob 1-delta). Built
# with the repo's seeded-md5 hash discipline so the estimate is
# cross-engine exact, and probed against the true counts so the
# no-underestimate guarantee is part of the hashed answer.
# ---------------------------------------------------------------------------

_CMS_D = 4    # hash rows
_CMS_W = 256  # counters per row; sketch state = 1024 cells total

_CMS_SQL = f"""
WITH rows_ AS (SELECT unnest(range(0, {_CMS_D})) AS r),
cells AS (
  SELECT r.r,
         CAST(CONCAT('0x', substr(md5(CONCAT(r.r, '|', o_custkey)), 1, 8))
              AS BIGINT) % {_CMS_W} AS b,
         COUNT(*) AS cnt
  FROM orders, rows_ r GROUP BY 1, 2),
probe AS (SELECT unnest(range(1, 21)) AS k),
exact AS (
  SELECT p.k, CAST(COUNT(o.o_orderkey) AS BIGINT) AS exact_cnt
  FROM probe p LEFT JOIN orders o ON o.o_custkey = p.k GROUP BY p.k),
pc AS (
  SELECT p.k, r.r,
         CAST(CONCAT('0x', substr(md5(CONCAT(r.r, '|', p.k)), 1, 8))
              AS BIGINT) % {_CMS_W} AS b
  FROM probe p, rows_ r),
est AS (
  SELECT pc.k, CAST(MIN(COALESCE(c.cnt, 0)) AS BIGINT) AS cms_est
  FROM pc LEFT JOIN cells c ON c.r = pc.r AND c.b = pc.b
  GROUP BY pc.k)
SELECT e.k AS probe_key, x.exact_cnt, e.cms_est,
       e.cms_est >= x.exact_cnt AS no_underestimate
FROM est e JOIN exact x ON x.k = e.k
"""


@register("agg_countmin_sketch", _CMS_SQL)
def agg_countmin_sketch(spark, sf_dir):
    """Count-Min over orders.o_custkey (d=4, w=256), probed on keys
    1..20 against their exact counts.

    Scale shape: the build is ONE map pass that explodes each row to
    its d (row, bucket) cells and a groupBy over at most d*w = 1024
    cells — map-side combine collapses the stream to sketch-sized
    partials, so the shuffle carries counters, never keys (the whole
    point of a sketch at 100 TB). The probe side broadcasts the
    1024-cell sketch and the 20-key exact counts are a pushed-down
    semi-scan. The min-of-d-counters estimate can only overestimate;
    that guarantee is emitted as a column so a broken hash or a lost
    cell fails the value hash, not just an eyeball."""
    from stockify_spark.registry import _t

    orders = _t(spark, sf_dir, "orders")

    def _d_cells(key):
        # the d (row, bucket) cells of one key, map-side: a literal
        # 4-element sequence explode — no broadcast join stage for
        # what is just a per-row unroll constant
        rs = F.sequence(F.lit(0), F.lit(_CMS_D - 1))
        return F.explode(
            F.transform(rs, lambda r: F.struct(
                r.cast("int").alias("r"),
                (
                    F.conv(
                        F.substring(F.md5(F.concat_ws("|", r, key)), 1, 8),
                        16,
                        10,
                    ).cast("long")
                    % _CMS_W
                ).alias("b"),
            ))
        )

    # spread the single-file scan before the d-fold md5 unroll: the
    # crypto hash is the expensive-map case functions/scale documents
    # (measured 1.2s serial → 0.69s spread at sf0.1); no-op at scale
    from stockify_spark.functions.scale import spread_small_scan

    cells = (
        spread_small_scan(orders.select("o_custkey"))
        .select(_d_cells(F.col("o_custkey")).alias("x"))
        .select("x.r", "x.b")
        .groupBy("r", "b")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )
    probe = spark.range(1, 21).select(F.col("id").alias("k"))
    # exact counts of the 20 probe keys: filter BEFORE the scan so the
    # predicate reaches parquet (row-group min/max skipping) instead of
    # left-joining the probes against a second full orders pass, then
    # re-attach zero-count probes with a broadcast left join (the
    # grouped side is <= 20 rows of model state)
    probe_counts = (
        orders.select("o_custkey")
        .filter((F.col("o_custkey") >= 1) & (F.col("o_custkey") <= 20))
        .groupBy(F.col("o_custkey").alias("k"))
        .agg(F.count(F.lit(1)).alias("_cnt"))
    )
    exact = probe.join(F.broadcast(probe_counts), "k", "left").select(
        "k", F.coalesce(F.col("_cnt"), F.lit(0)).cast("long").alias("exact_cnt")
    )
    probe_cells = probe.select(
        "k", _d_cells(F.col("k")).alias("x")
    ).select("k", "x.r", "x.b")
    est = (
        probe_cells.join(F.broadcast(cells), ["r", "b"], "left")
        .groupBy("k")
        .agg(F.min(F.coalesce(F.col("cnt"), F.lit(0))).cast("long").alias("cms_est"))
    )
    return (
        est.join(exact, "k")
        .select(
            F.col("k").alias("probe_key"),
            "exact_cnt",
            "cms_est",
            (F.col("cms_est") >= F.col("exact_cnt")).alias("no_underestimate"),
        )
    )


# ---------------------------------------------------------------------------
# Gumbel top-k — weighted sampling WITHOUT replacement as a single
# top-k: score s_i = ln(w_i) + Gumbel_i and take the k largest (the
# Gumbel-max trick; Efraimidis-Spirakis equivalent). The Gumbel draw
# is seed-keyed through the repo's md5-uniform discipline, so the
# "random" sample is deterministic, replayable, and cross-engine
# exact — the property production samplers need for auditable
# data-selection runs.
# ---------------------------------------------------------------------------

_GUMBEL_SEED = "gumbel-v1"
_GUMBEL_K = 20

_GUMBEL_SQL = f"""
WITH u AS (
  SELECT doc_id, n_chars,
         (CAST(CONCAT('0x', substr(md5(CONCAT('{_GUMBEL_SEED}', '|', doc_id)),
               1, 8)) AS BIGINT) + 0.5) / 4294967296.0 AS uu
  FROM documents),
s AS (
  SELECT doc_id, n_chars,
         ROUND(ln(CAST(n_chars AS DOUBLE)) + (-ln(-ln(uu))), 6) AS score
  FROM u)
SELECT doc_id, n_chars, score
FROM s ORDER BY score DESC, doc_id LIMIT {_GUMBEL_K}
"""


@register("pipeline_gumbel_topk", _GUMBEL_SQL)
def pipeline_gumbel_topk(spark, sf_dir):
    """Seeded Gumbel top-20 of documents with weight = n_chars.

    Scale shape: scoring is pure per-row arithmetic on the scan (no
    Python, no shuffle) and selection is ORDER BY + LIMIT —
    TakeOrderedAndProject's per-partition top-k, so the only thing
    that moves is k rows per partition. The +0.5 in the uniform keeps
    u strictly inside (0,1) so neither ln is singular. Exactly the
    shape a 100 TB budgeted sampler wants: one pass, k rows out,
    fully replayable from the seed."""
    from stockify_spark.registry import _t

    docs = _t(spark, sf_dir, "documents")
    uu = (
        F.conv(
            F.substring(
                F.md5(F.concat(F.lit(_GUMBEL_SEED), F.lit("|"), F.col("doc_id"))),
                1,
                8,
            ),
            16,
            10,
        ).cast("long")
        + F.lit(0.5)
    ) / F.lit(4294967296.0)
    scored = docs.select(
        "doc_id",
        "n_chars",
        F.round(
            F.log(F.col("n_chars").cast("double")) + (-F.log(-F.log(uu))), 6
        ).alias("score"),
    )
    return scored.orderBy(F.col("score").desc(), "doc_id").limit(_GUMBEL_K)


# ---------------------------------------------------------------------------
# Difference-in-differences — the two-period, two-group causal
# estimator: DiD = (treat_post - treat_pre) - (ctrl_post - ctrl_pre),
# with the classic four cell means and a pooled standard error. The
# one causal-inference table every experimentation platform computes
# when randomization is absent and a parallel-trends assumption is on
# the table. Treatment: even user_id; post: ts at or after the
# midpoint of the observed window.
# ---------------------------------------------------------------------------

_DID_SQL = """
WITH span AS (
  SELECT epoch_ms(MIN(ts)) AS lo, epoch_ms(MAX(ts)) AS hi FROM events),
cells AS (
  SELECT CAST(user_id % 2 = 0 AS INTEGER) AS treated,
         CAST(epoch_ms(ts) >= (span.lo + span.hi) / 2 AS INTEGER) AS post,
         value
  FROM events, span),
m AS (
  SELECT treated, post,
         CAST(COUNT(*) AS BIGINT) AS n,
         AVG(value) AS mean_v,
         VAR_SAMP(value) AS var_v
  FROM cells GROUP BY treated, post),
w AS (
  SELECT
    MAX(CASE WHEN treated = 1 AND post = 1 THEN mean_v END) AS tp,
    MAX(CASE WHEN treated = 1 AND post = 0 THEN mean_v END) AS tq,
    MAX(CASE WHEN treated = 0 AND post = 1 THEN mean_v END) AS cp,
    MAX(CASE WHEN treated = 0 AND post = 0 THEN mean_v END) AS cq,
    SUM(var_v / n) AS var_did
  FROM m)
SELECT CAST(m.treated AS BIGINT) AS treated,
       CAST(m.post AS BIGINT) AS post,
       m.n,
       ROUND(m.mean_v, 6) AS mean_v,
       ROUND((w.tp - w.tq) - (w.cp - w.cq), 6) AS did,
       ROUND(SQRT(w.var_did), 6) AS se_did
FROM m, w
"""


@register("stats_diff_in_diff", _DID_SQL)
def stats_diff_in_diff(spark, sf_dir):
    """2x2 DiD over events.value: four group-period cell means in ONE
    map-side-combined aggregate (the window midpoint is a 2-scalar
    broadcast from a min/max pre-pass), the estimate and its pooled
    SE = sqrt(Σ var_i/n_i) derived on the 4-row model table and
    repeated per cell row so the full table hashes. Nothing beyond
    the two scans and one 4-group shuffle at any corpus size."""
    from stockify_spark.registry import _t

    ev = _t(spark, sf_dir, "events")
    span = ev.agg(
        F.unix_millis(F.min("ts")).alias("lo"),
        F.unix_millis(F.max("ts")).alias("hi"),
    )
    cells = ev.crossJoin(F.broadcast(span)).select(
        (F.col("user_id") % 2 == 0).cast("int").alias("treated"),
        (
            F.unix_millis(F.col("ts")) >= (F.col("lo") + F.col("hi")) / 2
        ).cast("int").alias("post"),
        "value",
    )
    m = cells.groupBy("treated", "post").agg(
        F.count(F.lit(1)).alias("n"),
        F.avg("value").alias("mean_v"),
        F.var_samp("value").alias("var_v"),
    )
    w = m.agg(
        F.max(F.when((F.col("treated") == 1) & (F.col("post") == 1), F.col("mean_v"))).alias("tp"),
        F.max(F.when((F.col("treated") == 1) & (F.col("post") == 0), F.col("mean_v"))).alias("tq"),
        F.max(F.when((F.col("treated") == 0) & (F.col("post") == 1), F.col("mean_v"))).alias("cp"),
        F.max(F.when((F.col("treated") == 0) & (F.col("post") == 0), F.col("mean_v"))).alias("cq"),
        F.sum(F.col("var_v") / F.col("n")).alias("var_did"),
    )
    return m.crossJoin(F.broadcast(w)).select(
        F.col("treated").cast("long").alias("treated"),
        F.col("post").cast("long").alias("post"),
        F.col("n").cast("long").alias("n"),
        F.round("mean_v", 6).alias("mean_v"),
        F.round((F.col("tp") - F.col("tq")) - (F.col("cp") - F.col("cq")), 6).alias("did"),
        F.round(F.sqrt("var_did"), 6).alias("se_did"),
    )


# ---------------------------------------------------------------------------
# DV-aware change data feed — driver-facing evidence for the round-9
# ADVICE fixes: a merge-on-read delete commit must EMIT its rows as
# deletes in the CDF (previously it raised 'commit touched no
# files'), a restore that retires the sidecar must emit them back as
# inserts, and metadata COUNT must track both transitions.
# ---------------------------------------------------------------------------

_DV_CDF_SQL = """
SELECT CAST(1 AS BIGINT) AS version, o_orderkey,
       ROUND(o_totalprice, 2) AS o_totalprice,
       'delete' AS _change_type
FROM orders WHERE o_orderkey % 7 = 0
UNION ALL
SELECT CAST(2 AS BIGINT) AS version, o_orderkey,
       ROUND(o_totalprice, 2) AS o_totalprice,
       'insert' AS _change_type
FROM orders WHERE o_orderkey % 7 = 0
"""


@register("txlog_dv_change_feed", _DV_CDF_SQL)
def txlog_dv_change_feed(spark, sf_dir):
    """Change feed across a MOR-delete commit and the restore that
    rolls it back. Build: create → delete_where_dv(k%7=0) at v1 →
    restore(0) at v2 (a pure remove_dv commit). The build asserts
    the metadata row count tracks both transitions (table_stats
    subtracts active DVs — the r9 overcount fix) and that restore's
    head snapshot equals v0 exactly; the oracle pins the feed
    semantics row-for-row: v1 emits exactly the deleted rows as
    deletes, v2 emits exactly the same rows back as inserts.

    Scale shape: changes() reads only the DV sidecars (sized by
    deleted rows, broadcast) plus the files live at both versions —
    never a snapshot diff; the restore commit itself is O(log)."""
    from stockify_spark.registry_ext7 import _scratch_table
    from stockify_spark.sources import txlog

    def build(path: str) -> None:
        o = _t(spark, sf_dir, "orders").select("o_orderkey", "o_totalprice")
        n_all = o.count()
        n_del = o.filter(F.col("o_orderkey") % 7 == 0).count()
        txlog.create(o.repartitionByRange(2, "o_orderkey"), path)
        v1 = txlog.delete_where_dv(spark, path, F.col("o_orderkey") % 7 == 0)
        assert v1 == 1, v1
        assert txlog.table_stats(path)["rows"] == n_all - n_del
        v2 = txlog.restore(path, 0)
        assert v2 == 2, v2  # a files-only diff would no-op here
        assert txlog.table_stats(path)["rows"] == n_all
        assert txlog.snapshot(spark, path).count() == n_all

    path = _scratch_table(sf_dir, "dvcdf", build)
    parts = []
    for v in (1, 2):
        parts.append(
            txlog.changes(spark, path, v).select(
                F.lit(v).cast("long").alias("version"),
                "o_orderkey",
                F.round("o_totalprice", 2).alias("o_totalprice"),
                "_change_type",
            )
        )
    return parts[0].unionByName(parts[1])


# ---------------------------------------------------------------------------
# Incremental materialized-view maintenance — COUNT/SUM per customer
# maintained through append, COW delete, MOR delete, and restore by
# applying each commit's change feed as a group delta (classic IVM:
# COUNT and SUM are self-maintainable, so no commit rescans the base
# table). The build asserts the maintained view equals a fresh
# recompute at head; the oracle states the final state in closed
# form.
# ---------------------------------------------------------------------------

_MV_SQL = """
WITH final AS (
  SELECT o_custkey, o_orderkey,
         CAST(ROUND(o_totalprice * 100) AS BIGINT) AS cents
  FROM orders
  WHERE o_totalprice >= 50000)
SELECT o_custkey,
       CAST(COUNT(*) AS BIGINT) AS n_rows,
       CAST(SUM(cents) AS BIGINT) AS total
FROM final GROUP BY o_custkey
"""


@register("txlog_mv_incremental", _MV_SQL)
def txlog_mv_incremental(spark, sf_dir):
    """Commit history: v0 create (orderkey % 3 != 0) → v1 append the
    rest → v2 COW delete (totalprice < 50000) → v3 MOR delete
    (orderkey % 10 = 0) → v4 restore(2), which retires v3's sidecar —
    so the final state is exactly `totalprice >= 50000` and the view
    must walk forward AND backward through deletes. Values aggregate
    as CENTS (exact int64) per the float policy: incremental
    subtraction re-orders reductions, which is only safe in integer
    space.

    Scale shape: each maintenance step costs O(rows the commit
    changed) — the v1 append delta is the appended rows, the v2 delta
    the deleted rows, v3/v4 the DV'd rows read from sidecars — and
    the view state carried between steps is one row per live group.
    The 100 TB form persists the view as its own txlog table with
    merge_upsert applying the same delta algebra."""
    from stockify_spark.registry_ext7 import _scratch_table
    from stockify_spark.sources import txlog

    def build(path: str) -> None:
        o = _t(spark, sf_dir, "orders").select(
            "o_custkey",
            "o_orderkey",
            F.round(F.col("o_totalprice") * 100).cast("long").alias("cents"),
            "o_totalprice",
        )
        txlog.create(
            o.filter(F.col("o_orderkey") % 3 != 0).repartitionByRange(
                2, "o_orderkey"
            ),
            path,
        )
        txlog.append(o.filter(F.col("o_orderkey") % 3 == 0), path)
        txlog.delete_where(spark, path, F.col("o_totalprice") < 50000)
        txlog.delete_where_dv(spark, path, F.col("o_orderkey") % 10 == 0)
        v4 = txlog.restore(path, 2)
        assert v4 == 4, v4
        # the maintained view must equal a fresh recompute at head
        mv = txlog.incremental_mv(
            spark, path, ["o_custkey"], "cents", 0, v4
        )
        fresh = (
            txlog.snapshot(spark, path)
            .groupBy("o_custkey")
            .agg(
                F.count(F.lit(1)).cast("long").alias("n_rows"),
                F.sum("cents").cast("long").alias("total"),
            )
        )
        assert mv.exceptAll(fresh).isEmpty() and fresh.exceptAll(mv).isEmpty()

    path = _scratch_table(sf_dir, "mvinc", build)
    return txlog.incremental_mv(
        spark, path, ["o_custkey"], "cents", 0, txlog.current_version(path)
    ).select("o_custkey", "n_rows", "total")


# ---------------------------------------------------------------------------
# Idempotent streaming ingest — the exactly-once foreachBatch sink
# face of the table format (Delta's txnAppId/txnVersion): every
# batch is appended through append_idempotent WITH deliberate
# replays of already-committed batch ids interleaved; if any replay
# were applied, the oracle's row count and hash would catch the
# duplicates.
# ---------------------------------------------------------------------------

_IDEMPOTENT_SQL = """
SELECT o_orderkey, ROUND(o_totalprice, 2) AS o_totalprice
FROM orders
"""


@register("txlog_idempotent_ingest", _IDEMPOTENT_SQL)
def txlog_idempotent_ingest(spark, sf_dir):
    """Ingest orders in three batches keyed (app='ingest', version =
    0,1,2) with each batch REPLAYED once after commit — the
    at-least-once delivery window a foreachBatch sink lives in. The
    idempotency markers ride the same commit as the file adds, so
    the final state is exactly one copy of every row; a log
    checkpoint mid-history pins that the markers survive collapse.
    Scale shape: a replayed batch costs one driver-side log replay
    and zero data work."""
    from stockify_spark.registry_ext7 import _scratch_table
    from stockify_spark.sources import txlog

    def build(path: str) -> None:
        o = _t(spark, sf_dir, "orders").select("o_orderkey", "o_totalprice")
        txlog.create(o.filter(F.col("o_orderkey") % 3 == 0), path)
        for ver, residue in ((0, 1), (1, 2)):
            batch = o.filter(F.col("o_orderkey") % 3 == residue)
            v = txlog.append_idempotent(batch, path, "ingest", ver)
            # replay: same (app, version) must be a version no-op
            assert txlog.append_idempotent(batch, path, "ingest", ver) == v
            if ver == 0:
                txlog.checkpoint_log(path)  # markers survive collapse
        assert txlog.last_txn_version(path, "ingest") == 1
        n_all = o.count()
        assert txlog.snapshot(spark, path).count() == n_all

    path = _scratch_table(sf_dir, "idem", build)
    return txlog.snapshot(spark, path).select(
        "o_orderkey", F.round("o_totalprice", 2).alias("o_totalprice")
    )
