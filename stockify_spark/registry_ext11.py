"""Round-8 registry wave: H.264 Annex-B structural probe + FLAC
entropy-coded audio decode.

Extends the multimodal family (SURVEY §2 LLM ops; media_mp3_index /
media_avi_index precedent) two codecs deeper:

* llm/h264.py — real NAL-unit walking, emulation-prevention
  stripping, bit-level Exp-Golomb SPS parsing; slice decode held at
  the documented NotImplementedError boundary. Spec-echo oracle
  (media-family precedent).
* llm/flac.py — the family's first full ENTROPY-CODED codec: Rice
  residual coding over fixed predictors, lossless and
  self-verifying (CRC-8/16 + MD5). Its oracle is stronger than the
  media-family norm: it independently recomputes the decoded
  waveform's statistics from the generation formula, so a
  mis-decode fails the value hash rather than echoing a spec.

Plus two ACID-surface completions: `txlog_restore` — Delta-style
RESTORE TO VERSION as an O(log) metadata commit
(sources/txlog.restore) — and `txlog_zorder` — OPTIMIZE ZORDER BY
multi-dimensional clustering with multi-column log-level skipping
(sources/txlog.compact zorder_by + snapshot_pruned_multi).

None of these queries joins the bench ratio (the codec oracles don't
run a rival codec; the txlog queries are write-path lifecycles),
matching the correctness-only / txlog_lifecycle policies in bench.py.
"""

from __future__ import annotations

from stockify_spark.registry import register, _t

# fixture spec: dims sweep non-multiple-of-16 (cropping exercised on
# most ids), profiles alternate baseline/main, GOP density varies
_H264_N = 48


def _h264_spec(i: int) -> tuple[int, int, int, int, int, int]:
    width = 96 + 2 * (i % 17)  # 96..128, mostly non-multiple-of-16
    height = 64 + 2 * (i % 11)  # 64..84
    n_idr = 1 + i % 4
    n_non_idr = (i * 3) % 13
    profile = 66 if i % 2 == 0 else 77
    level = (30, 31, 40)[i % 3]
    return width, height, n_idr, n_non_idr, profile, level


_H264_SQL = f"""
WITH ids AS (SELECT unnest(range(0, {_H264_N})) AS media_id)
SELECT media_id,
       CAST(96 + 2 * (media_id % 17) AS INTEGER) AS width,
       CAST(64 + 2 * (media_id % 11) AS INTEGER) AS height,
       CAST(CASE WHEN media_id % 2 = 0 THEN 66 ELSE 77 END AS INTEGER)
         AS profile_idc,
       CAST(list_value(30, 31, 40)[(media_id % 3) + 1] AS INTEGER) AS level_idc,
       CAST(2 + (1 + media_id % 4) + ((media_id * 3) % 13) AS BIGINT) AS n_nal,
       CAST(1 + media_id % 4 AS BIGINT) AS n_idr,
       CAST((media_id * 3) % 13 AS BIGINT) AS n_non_idr
FROM ids
"""


@register("media_h264_probe", _H264_SQL)
def media_h264_probe(spark, sf_dir):
    """Video-corpus router probe: per payload, one mapInPandas pass
    walks Annex-B start codes, strips emulation-prevention bytes, and
    bit-parses the SPS (llm/h264.h264_probe) — exact pixel dimensions
    (through the macroblock+crop encoding: 14 of every 17 widths here
    are NOT multiples of 16), profile/level, and the NAL census that
    gives keyframe density (IDR vs non-IDR). Filter-before-decode:
    the probe reads O(start codes + SPS bits), never slice payload,
    so routing a 100 TB video corpus by resolution/profile/GOP shape
    is a map-only scan. The oracle restates the generation spec
    closed-form (media-family precedent); slice decode itself is the
    honest NotImplementedError boundary (llm/h264.decode_h264)."""
    import pandas as pd
    from pyspark.sql import types as T

    from stockify_spark.llm.h264 import encode_h264_annexb, h264_probe

    rows = [
        (i, bytearray(encode_h264_annexb(*_h264_spec(i)))) for i in range(_H264_N)
    ]
    media = spark.createDataFrame(rows, "media_id long, content binary")
    schema = T.StructType(
        [
            T.StructField("media_id", T.LongType(), False),
            T.StructField("width", T.IntegerType(), False),
            T.StructField("height", T.IntegerType(), False),
            T.StructField("profile_idc", T.IntegerType(), False),
            T.StructField("level_idc", T.IntegerType(), False),
            T.StructField("n_nal", T.LongType(), False),
            T.StructField("n_idr", T.LongType(), False),
            T.StructField("n_non_idr", T.LongType(), False),
        ]
    )

    def run(batches):
        for pdf in batches:
            infos = [h264_probe(bytes(c)) for c in pdf["content"]]
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "width": [x["width"] for x in infos],
                    "height": [x["height"] for x in infos],
                    "profile_idc": [x["profile_idc"] for x in infos],
                    "level_idc": [x["level_idc"] for x in infos],
                    "n_nal": [x["n_nal"] for x in infos],
                    "n_idr": [x["n_idr"] for x in infos],
                    "n_non_idr": [x["n_non_idr"] for x in infos],
                }
            )

    return media.mapInPandas(run, schema)


# ---------------------------------------------------------------------------
# media_flac_decode — REAL entropy-coded lossless audio decode
# ---------------------------------------------------------------------------

_FLAC_N = 24
_FLAC_RATE = 16000

# waveform formula shared by the Spark generator and the DuckDB
# oracle: x(t) = ((t*t + 7*id) % 4001) - 2000, n = 3000 + 153*id
# (streams past id 7 span multiple 4096-sample FLAC frames)
_FLAC_SQL = f"""
WITH ids AS (SELECT unnest(range(0, {_FLAC_N})) AS media_id),
s AS (SELECT media_id, 3000 + 153 * media_id AS n FROM ids),
t AS (SELECT media_id, n, unnest(range(0, n)) AS i FROM s),
v AS (SELECT media_id, n, ((i * i + 7 * media_id) % 4001) - 2000 AS x FROM t)
SELECT media_id,
       CAST(MAX(n) AS BIGINT) AS n_samples,
       CAST({_FLAC_RATE} AS INTEGER) AS sample_rate,
       CAST(MAX(ABS(x)) AS INTEGER) AS peak,
       ROUND(CAST(SUM(x) AS DOUBLE) / MAX(n), 6) AS mean_r,
       ROUND(SQRT(CAST(SUM(x * x) AS DOUBLE) / MAX(n)), 6) AS rms_r
FROM v GROUP BY media_id
"""


@register("media_flac_decode", _FLAC_SQL)
def media_flac_decode(spark, sf_dir):
    """End-to-end ENTROPY-CODED audio: each stream is synthesized
    from a closed-form waveform, FLAC-encoded (llm/flac.py —
    partitioned Rice residual coding over fixed or LPC predictors,
    CRC-8/16 framing, STREAMINFO MD5), then decoded back and reduced
    to sample
    statistics. Unlike the spec-echo media oracles, this oracle
    RECOMPUTES the statistics from the waveform formula through an
    independent path: any mis-decoded sample (wrong Rice quotient,
    bad reintegration, off-by-one at a 4096-sample frame boundary —
    streams here deliberately span it) changes SUM/SUM-of-squares
    and fails the value hash. The decoder also self-verifies every
    frame CRC and the stream MD5, so silent corruption cannot pass.
    Float policy: sums are exact int64 on both engines; one divide /
    sqrt before ROUND 6 (DESIGN.md float policy). Encode and decode
    both run inside mapInPandas over a binary column — two real
    Arrow-batched stages, the 100 TB audio-corpus plumbing shape."""
    import pandas as pd
    from pyspark.sql import types as T

    from stockify_spark.llm.flac import decode_flac, encode_flac

    spec = spark.createDataFrame(
        [(i, 3000 + 153 * i) for i in range(_FLAC_N)], "media_id long, n long"
    )

    def ingest(batches):
        for pdf in batches:
            payloads = []
            for i, n in zip(pdf["media_id"], pdf["n"]):
                wave = [((t * t + 7 * int(i)) % 4001) - 2000 for t in range(int(n))]
                payloads.append(bytearray(encode_flac(wave, _FLAC_RATE)))
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
            T.StructField("n_samples", T.LongType(), False),
            T.StructField("sample_rate", T.IntegerType(), False),
            T.StructField("peak", T.IntegerType(), False),
            T.StructField("mean_r", T.DoubleType(), False),
            T.StructField("rms_r", T.DoubleType(), False),
        ]
    )

    def analyze(batches):
        for pdf in batches:
            rows = []
            for i, content in zip(pdf["media_id"], pdf["content"]):
                samples, rate = decode_flac(bytes(content))
                n = len(samples)
                ssum = sum(samples)  # exact int
                ssq = sum(s * s for s in samples)
                # NOT rounded here: Python round() is banker's, DuckDB
                # ROUND is half-away — the 6dp round happens Spark-side
                # (F.round, HALF_UP) below so both engines agree at
                # exact half-ulp boundaries
                rows.append(
                    (
                        int(i),
                        n,
                        rate,
                        max(abs(s) for s in samples),
                        ssum / n,
                        (ssq / n) ** 0.5,
                    )
                )
            yield pd.DataFrame(
                rows,
                columns=[
                    "media_id",
                    "n_samples",
                    "sample_rate",
                    "peak",
                    "mean_r",
                    "rms_r",
                ],
            )

    from pyspark.sql import functions as F

    return media.mapInPandas(analyze, out_schema).select(
        "media_id",
        "n_samples",
        "sample_rate",
        "peak",
        F.round("mean_r", 6).alias("mean_r"),
        F.round("rms_r", 6).alias("rms_r"),
    )


# ---------------------------------------------------------------------------
# txlog_restore — RESTORE TO VERSION as a new commit
# ---------------------------------------------------------------------------

_RESTORE_SQL = """
SELECT o_orderkey, o_totalprice FROM orders
"""


@register("txlog_restore", _RESTORE_SQL)
def txlog_restore(spark, sf_dir):
    """Version rollback through the commit log (sources/txlog.restore):
    the scratch table runs create(evens) → append(odds) →
    COW-delete(%10==0) → RESTORE to the pre-delete version, and the
    final snapshot must equal the FULL orders projection — i.e. the
    restore exactly resurrected what the delete removed, via one
    O(log) metadata commit that re-adds the pre-delete files (original
    stats entries included, so skipping still works) and removes the
    delete's rewrites. No data movement: restore is the operation that
    makes 'oops' recovery on a 100 TB table a metadata-only act.
    History stays append-only — the rollback is itself a commit with a
    change feed (deletes of rolled-back rows, inserts of resurrected
    ones; pinned in tests/test_txlog.py along with the
    vacuum-blocks-restore guard)."""
    from stockify_spark.registry_ext7 import _scratch_table
    from stockify_spark.sources import txlog

    from pyspark.sql import functions as F

    def build(path: str) -> None:
        o = _t(spark, sf_dir, "orders").select("o_orderkey", "o_totalprice")
        txlog.create(
            o.filter(F.col("o_orderkey") % 2 == 0).repartitionByRange(4, "o_orderkey"),
            path,
        )
        v_full = txlog.append(
            o.filter(F.col("o_orderkey") % 2 == 1).repartitionByRange(4, "o_orderkey"),
            path,
        )
        assert v_full == 1, v_full
        v_del = txlog.delete_where(spark, path, F.col("o_orderkey") % 10 == 0)
        assert v_del == 2, v_del
        v_restored = txlog.restore(path, v_full)
        assert v_restored == 3, v_restored

    path = _scratch_table(sf_dir, "restore", build)
    return txlog.snapshot(spark, path).select("o_orderkey", "o_totalprice")


# ---------------------------------------------------------------------------
# txlog_zorder — multi-dimensional clustering + 2-D pruned probe
# ---------------------------------------------------------------------------

_ZORDER_SQL = """
SELECT o_orderkey, o_totalprice
FROM orders
WHERE o_orderkey BETWEEN 1000 AND 3000
  AND o_totalprice BETWEEN 100000 AND 200000
"""


@register("txlog_zorder", _ZORDER_SQL)
def txlog_zorder(spark, sf_dir):
    """OPTIMIZE ZORDER BY through the commit log: the scratch table
    is compacted on the Morton interleave of (o_orderkey,
    o_totalprice) — each column rank-bucketized to 256 equal-
    population quantile buckets (bounded driver model state, the
    centroid precedent), bits interleaved in one closed-form column
    expression, one repartitionByRange + local sort, no UDF. The
    query is then a 2-D range probe through multi-column log-level
    skipping (txlog.snapshot_pruned_multi): a file opens only if its
    stored min/max box intersects BOTH ranges. On a 1-D-sorted table
    the second column cannot prune at all; on the Z-layout both
    prune to ~sqrt-tight boxes (tests/test_txlog.py measures the
    file counts; bench E2c times it). Results are exact regardless
    of layout — pruning only skips provably-disjoint files and the
    residual filter always runs — which is what the plain-SQL oracle
    checks."""
    from stockify_spark.registry_ext7 import _scratch_table
    from stockify_spark.sources import txlog

    def build(path: str) -> None:
        o = _t(spark, sf_dir, "orders").select("o_orderkey", "o_totalprice")
        txlog.create(o, path)
        txlog.compact(
            spark,
            path,
            target_partitions=16,
            zorder_by=["o_orderkey", "o_totalprice"],
        )

    path = _scratch_table(sf_dir, "zorder", build)
    return txlog.snapshot_pruned_multi(
        spark,
        path,
        [("o_orderkey", 1000, 3000), ("o_totalprice", 100000.0, 200000.0)],
    ).select("o_orderkey", "o_totalprice")


# ---------------------------------------------------------------------------
# pipeline_gzip_ingest — compressed text-shard ingestion
# ---------------------------------------------------------------------------

_GZIP_SQL = """
SELECT doc_id, CAST(LENGTH(text) AS BIGINT) AS n_chars,
       md5(text) AS content_md5
FROM documents
"""


@register("pipeline_gzip_ingest", _GZIP_SQL)
def pipeline_gzip_ingest(spark, sf_dir):
    """Compressed corpus ingestion: every document is gzip'd by
    STDLIB gzip (the independent reference encoder) in one
    mapInPandas stage, then decompressed by the from-scratch RFC
    1951/1952 decoder (llm/deflate.gunzip — dynamic-Huffman inflate,
    CRC-32 + ISIZE verified) in a second, and reduced to
    (n_chars, md5) which the oracle recomputes from the PLAIN text —
    so a single wrong inflate byte anywhere in the corpus fails the
    value hash. This is the only codec in the family with an
    in-container independent implementation on the other side of the
    differential; the 147-case level-crossed round trip lives in
    tests/test_deflate.py. Scale shape: gzip members are not
    splittable, so the parallel unit is the member (one binary cell
    per task batch) — exactly how WARC/.gz shards ingest at 100 TB,
    and why both codec passes are map-only Arrow stages with zero
    shuffles."""
    import hashlib

    import gzip as _gzip

    import pandas as pd
    from pyspark.sql import types as T

    from stockify_spark.llm.deflate import gunzip

    docs = _t(spark, sf_dir, "documents").select("doc_id", "text")

    def pack(batches):
        for pdf in batches:
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "gz": [
                        bytearray(_gzip.compress(t.encode("utf-8"), 6))
                        for t in pdf["text"]
                    ],
                }
            )

    packed = docs.mapInPandas(
        pack,
        T.StructType(
            [
                T.StructField("doc_id", T.LongType(), False),
                T.StructField("gz", T.BinaryType(), False),
            ]
        ),
    )

    def unpack(batches):
        for pdf in batches:
            rows = []
            for i, gz in zip(pdf["doc_id"], pdf["gz"]):
                raw = gunzip(bytes(gz))
                rows.append(
                    (int(i), len(raw.decode("utf-8")), hashlib.md5(raw).hexdigest())
                )
            yield pd.DataFrame(rows, columns=["doc_id", "n_chars", "content_md5"])

    return packed.mapInPandas(
        unpack,
        T.StructType(
            [
                T.StructField("doc_id", T.LongType(), False),
                T.StructField("n_chars", T.LongType(), False),
                T.StructField("content_md5", T.StringType(), False),
            ]
        ),
    )


# ---------------------------------------------------------------------------
# txlog_bloom_lookup — point lookups through the log-stored Bloom index
# ---------------------------------------------------------------------------

_BLOOM_SQL = """
SELECT l_orderkey, l_partkey, l_quantity
FROM lineitem
WHERE l_orderkey IN (SELECT MIN(l_orderkey) FROM lineitem
                     UNION SELECT MAX(l_orderkey) FROM lineitem)
"""


@register("txlog_bloom_lookup", _BLOOM_SQL)
def txlog_bloom_lookup(spark, sf_dir):
    """Point lookups on a NON-clustered column through the per-file
    Bloom index committed to the log (sources/txlog.attach_bloom /
    snapshot_point): the scratch table is price-sorted, so min/max
    stats are useless for orderkey probes (every file's key range
    overlaps everything); the 8192-bit/6-hash filter answers
    membership per file from the log alone — an ABSENT key opens
    ZERO files (the ingest-dedup / CDC-anti-join hot path at 100 TB,
    where almost every probed id is new), a present key opens only
    its bloom-hit files, and the residual equality filter keeps
    results exact through any false positive. Probe keys are the min
    and max orderkey — computed identically by both engines, so the
    oracle is plain SQL. Bench E2d reports files_read for present
    and absent probes vs the stats-only path."""
    from stockify_spark.registry_ext7 import _scratch_table
    from stockify_spark.sources import txlog

    from pyspark.sql import functions as F

    def build(path: str) -> None:
        li = _t(spark, sf_dir, "lineitem").select(
            "l_orderkey", "l_partkey", "l_quantity", "l_extendedprice"
        )
        txlog.create(li, path)
        txlog.compact(spark, path, target_partitions=8, sort_by="l_extendedprice")
        txlog.attach_bloom(spark, path, "l_orderkey")

    path = _scratch_table(sf_dir, "bloomidx", build)
    li = _t(spark, sf_dir, "lineitem")
    (row,) = li.agg(
        F.min("l_orderkey").alias("lo"), F.max("l_orderkey").alias("hi")
    ).collect()  # bounded: two probe keys of model state
    parts = [
        txlog.snapshot_point(spark, path, "l_orderkey", k).select(
            "l_orderkey", "l_partkey", "l_quantity"
        )
        for k in dict.fromkeys([row["lo"], row["hi"]])
    ]
    out = parts[0]
    for p in parts[1:]:
        out = out.unionAll(p)
    return out


# ---------------------------------------------------------------------------
# window_interpolate — linear interpolation onto a dense daily grid
# ---------------------------------------------------------------------------

_INTERP_SQL = """
WITH bounds AS (
  SELECT user_id, date_trunc('day', MIN(ts)) AS d0, date_trunc('day', MAX(ts)) AS d1
  FROM events GROUP BY user_id),
grid AS (
  SELECT user_id, CAST(unnest(generate_series(d0, d1, INTERVAL 1 DAY)) AS DATE) AS day
  FROM bounds),
daily AS (
  SELECT user_id, day, value AS v FROM (
    SELECT user_id, CAST(date_trunc('day', ts) AS DATE) AS day, value,
           ROW_NUMBER() OVER (PARTITION BY user_id, date_trunc('day', ts)
                              ORDER BY ts DESC, event_id DESC) AS rn
    FROM events) WHERE rn = 1),
j AS (
  SELECT g.user_id, g.day, d.v,
         CASE WHEN d.v IS NOT NULL THEN g.day END AS obs_day
  FROM grid g LEFT JOIN daily d ON d.user_id = g.user_id AND d.day = g.day),
w AS (
  SELECT user_id, day, v,
         last_value(v IGNORE NULLS) OVER
           (PARTITION BY user_id ORDER BY day) AS pv,
         last_value(obs_day IGNORE NULLS) OVER
           (PARTITION BY user_id ORDER BY day) AS pd,
         first_value(v IGNORE NULLS) OVER
           (PARTITION BY user_id ORDER BY day
            ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING) AS nv,
         first_value(obs_day IGNORE NULLS) OVER
           (PARTITION BY user_id ORDER BY day
            ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING) AS nd
  FROM j)
SELECT user_id, strftime(day, '%Y-%m-%d') AS day,
       ROUND(CASE WHEN v IS NOT NULL THEN v
                  ELSE pv + (nv - pv) * (CAST(date_diff('day', pd, day) AS DOUBLE)
                                         / CAST(date_diff('day', pd, nd) AS DOUBLE))
             END, 6) AS value_li,
       CASE WHEN v IS NOT NULL THEN 'obs' ELSE 'interp' END AS kind
FROM w
"""


@register("window_interpolate", _INTERP_SQL)
def window_interpolate(spark, sf_dir):
    """Linear interpolation of each user's irregular series onto a
    dense daily grid — the gap-filler for models that need straight
    lines between observations rather than window_resample's step
    function. Same grid construction (per-user bounds, executor-side
    sequence+explode, arg-max per-day dedup); then ONE forward and
    ONE backward window pass carry the bracketing observation
    (value, day) to every grid point, and the interpolation is pure
    arithmetic: pv + (nv - pv) * (Δprev / Δspan), spelled in the
    SAME IEEE operation order in both engines so the 6dp round is
    drift-free (integer day arithmetic feeds one divide, one
    multiply, one add). Grid edges cannot extrapolate by
    construction: every user's grid spans min(ts)..max(ts), so both
    brackets always exist. Two window passes over one user_id
    shuffle — the same scale shape as resample."""
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    t = _t(spark, sf_dir, "events").select(
        "event_id", "user_id", "value", "ts", F.to_date("ts").alias("day")
    )
    grid = (
        t.groupBy("user_id")
        .agg(F.min("day").alias("d0"), F.max("day").alias("d1"))
        .select(
            "user_id",
            F.explode(F.sequence("d0", "d1", F.expr("interval 1 day"))).alias(
                "day"
            ),
        )
    )
    dw = Window.partitionBy("user_id", "day").orderBy(
        F.col("ts").desc(), F.col("event_id").desc()
    )
    daily = (
        t.withColumn("rn", F.row_number().over(dw))
        .filter(F.col("rn") == 1)
        .select("user_id", "day", F.col("value").alias("v"))
    )
    j = grid.join(daily, ["user_id", "day"], "left").withColumn(
        "obs_day", F.when(F.col("v").isNotNull(), F.col("day"))
    )
    fw = Window.partitionBy("user_id").orderBy("day")
    bw = (
        Window.partitionBy("user_id")
        .orderBy("day")
        .rowsBetween(Window.currentRow, Window.unboundedFollowing)
    )
    w = (
        j.withColumn("pv", F.last("v", ignorenulls=True).over(fw))
        .withColumn("pd", F.last("obs_day", ignorenulls=True).over(fw))
        .withColumn("nv", F.first("v", ignorenulls=True).over(bw))
        .withColumn("nd", F.first("obs_day", ignorenulls=True).over(bw))
    )
    frac = F.datediff(F.col("day"), F.col("pd")).cast("double") / F.datediff(
        F.col("nd"), F.col("pd")
    ).cast("double")
    li = F.when(F.col("v").isNotNull(), F.col("v")).otherwise(
        F.col("pv") + (F.col("nv") - F.col("pv")) * frac
    )
    return w.select(
        "user_id",
        F.date_format("day", "yyyy-MM-dd").alias("day"),
        F.round(li, 6).alias("value_li"),
        F.when(F.col("v").isNotNull(), "obs").otherwise("interp").alias("kind"),
    )


# ---------------------------------------------------------------------------
# events_anomaly_mad — robust per-user outlier scoring (median/MAD)
# ---------------------------------------------------------------------------

_MAD_SQL = """
WITH med AS (SELECT user_id, MEDIAN(value) AS m FROM events GROUP BY 1),
dev AS (SELECT e.event_id, e.user_id, e.value, med.m,
               ABS(e.value - med.m) AS d
        FROM events e JOIN med USING (user_id)),
mad AS (SELECT user_id, MEDIAN(d) AS mad FROM dev GROUP BY 1)
SELECT dev.event_id, dev.user_id,
       ROUND(CASE WHEN mad.mad > 0
                  THEN dev.d / (1.4826 * mad.mad) END, 6) AS score,
       CASE WHEN mad.mad > 0
            THEN ROUND(dev.d / (1.4826 * mad.mad), 6) > 3.0 END AS is_outlier
FROM dev JOIN mad USING (user_id)
"""


@register("events_anomaly_mad", _MAD_SQL)
def events_anomaly_mad(spark, sf_dir):
    """Robust per-user outlier scores: |x - median| / (1.4826 * MAD)
    — the estimator that, unlike mean/stddev z-scores, a single
    extreme value cannot drag (the anomaly would mask itself; 1.4826
    is the standard normal-consistency constant). Two grouped exact
    medians (Spark F.median == DuckDB MEDIAN's quantile_cont(0.5))
    with the per-user scalars broadcast back to the event stream —
    two small aggregates + two broadcast joins over one data-sized
    scan. Cross-engine discipline: the score is ROUNDed to 6dp and
    the outlier FLAG compares the ROUNDED score on BOTH faces, so an
    ulp of interpolation drift cannot flip a boundary row (the
    window_rolling_median lesson applied to a derived boolean);
    degenerate users (MAD = 0) emit NULL score and flag on both."""
    from pyspark.sql import functions as F

    ev = _t(spark, sf_dir, "events").select("event_id", "user_id", "value")
    med = ev.groupBy("user_id").agg(F.median("value").alias("m"))
    dev = ev.join(F.broadcast(med), "user_id").withColumn(
        "d", F.abs(F.col("value") - F.col("m"))
    )
    mad = dev.groupBy("user_id").agg(F.median("d").alias("mad"))
    scored = dev.join(F.broadcast(mad), "user_id")
    raw = F.col("d") / (F.lit(1.4826) * F.col("mad"))
    score = F.when(F.col("mad") > 0, F.round(raw, 6))
    return scored.select(
        "event_id",
        "user_id",
        score.alias("score"),
        F.when(F.col("mad") > 0, F.round(raw, 6) > 3.0).alias("is_outlier"),
    )


# ---------------------------------------------------------------------------
# geo_knn_suppliers — exact k-nearest suppliers per customer
# ---------------------------------------------------------------------------

_HAV = """2 * 6371.0 * asin(sqrt(
         sin(radians(s.lat - c.lat) / 2) * sin(radians(s.lat - c.lat) / 2)
         + cos(radians(c.lat)) * cos(radians(s.lat))
           * sin(radians(s.lon - c.lon) / 2) * sin(radians(s.lon - c.lon) / 2)))"""

_KNN_GEO_SQL = f"""
WITH c AS (SELECT c_custkey, ((c_custkey * 7919) % 18000) / 100.0 - 90.0 AS lat,
                  ((c_custkey * 104729) % 36000) / 100.0 - 180.0 AS lon
           FROM customer),
s AS (SELECT s_suppkey, ((s_suppkey * 7919) % 18000) / 100.0 - 90.0 AS lat,
             ((s_suppkey * 104729) % 36000) / 100.0 - 180.0 AS lon
      FROM supplier),
d AS (SELECT c_custkey, s_suppkey, ROUND({_HAV}, 6) AS dist_km
      FROM c CROSS JOIN s),
r AS (SELECT c_custkey, s_suppkey, dist_km,
             CAST(ROW_NUMBER() OVER (PARTITION BY c_custkey
                                     ORDER BY dist_km, s_suppkey) AS BIGINT) AS rk
      FROM d)
SELECT c_custkey, s_suppkey, dist_km, rk FROM r WHERE rk <= 3
"""


@register("geo_knn_suppliers", _KNN_GEO_SQL)
def geo_knn_suppliers(spark, sf_dir):
    """Exact 3-nearest suppliers per customer (haversine over the
    geo fixture family's key-derived coordinates) — WITHOUT the
    oracle's cross join.

    Round-9 rewrite: BOTH sides here scale with the corpus, so the
    original broadcast-cross-join was the repo's one measured
    superlinear query (SCALING.md r9: 33x on 10x data — the |C|x|S|
    pair stream showing). The scale path is grid pruning with an
    EXACT certificate and per-customer fallback:

      * suppliers land in one 10-degree (lat, lon) cell each;
        customers probe +-1 lat cells x a LATITUDE-ADAPTIVE +-k_lon
        lon span (k_lon <= 5, chosen so the excluded-by-longitude
        haversine lower bound — computed with the SMALLEST cosine
        product reachable in the band, the honest direction — is at
        least D_LAT = R*radians(10); polar customers, |lat| > 70,
        probe the +-1 LAT BANDS across all longitudes, where the
        lon metric degenerates), as cell equi-joins. Any supplier
        OUTSIDE the probe set is therefore provably >= D_LAT away.
      * a customer is CERTIFIED when its candidate top-3 exists and
        d3 + 1e-3 km < D_LAT (the margin absorbs the 6dp output
        rounding and suppkey tie-breaks); certified answers are
        exact by the bound argument, never by sampling luck.
      * uncertified customers — sparse cells, polar edge cases —
        take the brute broadcast scan, but only they do.

    Pair volume drops from |C|x|S| to ~|C|x|S|x(9/648) + polar band
    probes + the fallback residue; the certificate keeps the result
    bit-identical to the cross-join oracle (parity is pinned on two
    SFs in tests/test_ext88.py). Cross-engine discipline unchanged:
    distances ROUNDed to 6dp BEFORE the rank, ties by s_suppkey."""
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    def pts(df, key):
        return df.select(
            key,
            (((F.col(key) * 7919) % 18000) / 100.0 - 90.0).alias("lat"),
            (((F.col(key) * 104729) % 36000) / 100.0 - 180.0).alias("lon"),
        )

    from stockify_spark.registry_ext10 import _haversine_km

    CELL = 10.0  # degrees; 18 lat bands x 36 lon cells
    N_LON = 36
    POLAR = 70.0
    R_KM = 6371.0
    import math

    D_LAT_BOUND = R_KM * math.radians(CELL)  # ~1111.95 km

    # spread the single-file customer scan: everything up to the
    # rank window's exchange — the ±k_lon cell explode, the
    # broadcast cell join, and one haversine per candidate pair —
    # runs INSIDE the scan stage, i.e. on ONE core for a one-row-
    # group input (r14; the agg_countmin_sketch trig/crypto-map
    # case, no-op at scale — see functions/scale)
    from stockify_spark.functions.scale import spread_small_scan

    cust = pts(spread_small_scan(_t(spark, sf_dir, "customer")), "c_custkey")
    sup = pts(_t(spark, sf_dir, "supplier"), "s_suppkey").select(
        "s_suppkey",
        F.col("lat").alias("s_lat"),
        F.col("lon").alias("s_lon"),
        F.floor((F.col("lat") + 90.0) / CELL).alias("s_clat"),
        F.floor((F.col("lon") + 180.0) / CELL).alias("s_clon"),
    )

    dlat_off = F.explode(F.array(F.lit(-1), F.lit(0), F.lit(1))).alias("dlat")
    base = cust.select(
        "c_custkey",
        "lat",
        "lon",
        F.floor((F.col("lat") + 90.0) / CELL).alias("clat"),
        F.floor((F.col("lon") + 180.0) / CELL).alias("clon"),
    )
    nonpolar = base.filter(F.abs(F.col("lat")) <= POLAR)
    polar = base.filter(F.abs(F.col("lat")) > POLAR)
    # LATITUDE-ADAPTIVE longitude probe span: a supplier excluded by
    # k lon cells has dlon > 10k deg, hence distance >=
    # 2R*asin(sin(5k deg)*sqrt(cos phi * cos(|phi|+10))). Choose the
    # smallest k making that >= D_LAT (= 2R*asin(sin 5 deg)), i.e.
    # sin(5k) >= sin(5)/sqrt(cos phi * cos(|phi|+10)) — then the
    # certificate bound is uniformly D_LAT and high-latitude
    # customers stop flunking certification into the brute fallback
    # (at sf0.1 the fixed 3x3 probe sent 45% of non-polar customers
    # to the fallback because the honest lon bound shrinks with
    # latitude). For |phi| <= 70 the needed k is at most 5, so the
    # wrapped span 2k+1 <= 11 < 36 never self-overlaps.
    phi_np = F.radians(F.abs(F.col("lat")))
    phi_out_np = F.radians(F.least(F.abs(F.col("lat")) + CELL, F.lit(90.0)))
    need = F.lit(math.sin(math.radians(CELL / 2))) / F.sqrt(
        F.cos(phi_np) * F.cos(phi_out_np)
    )
    k_lon = F.least(
        F.ceil(F.degrees(F.asin(F.least(F.lit(1.0), need))) / (CELL / 2)),
        F.lit(5),
    ).cast("int")
    probes_np = (
        nonpolar.withColumn("k_lon", k_lon)
        .select("*", dlat_off)
        .select(
            "*",
            F.explode(F.sequence(-F.col("k_lon"), F.col("k_lon"))).alias("dlon"),
        )
        .select(
            "c_custkey",
            "lat",
            "lon",
            (F.col("clat") + F.col("dlat")).alias("p_clat"),
            ((F.col("clon") + F.col("dlon") + N_LON) % N_LON).alias("p_clon"),
        )
    )
    lon_cells = F.explode(
        F.sequence(F.lit(0), F.lit(N_LON - 1))
    ).alias("p_clon")
    probes_po = (
        polar.select("*", dlat_off)
        .select(
            "c_custkey",
            "lat",
            "lon",
            (F.col("clat") + F.col("dlat")).alias("p_clat"),
            lon_cells,
        )
    )
    probes = probes_np.unionByName(probes_po)
    cand = probes.join(
        sup,
        (probes.p_clat == sup.s_clat) & (probes.p_clon == sup.s_clon),
    ).select(
        "c_custkey",
        "lat",
        "lon",
        "s_suppkey",
        _haversine_km(
            F.col("lat"), F.col("lon"), F.col("s_lat"), F.col("s_lon")
        ).alias("d_exact"),
    )
    w = Window.partitionBy("c_custkey").orderBy(
        F.round("d_exact", 6), "s_suppkey"
    )
    # candidate top-3 is consumed THREE times (certificate, certified
    # output, fallback anti-join); at 3 rows/customer it is
    # model-sized, so pin it once instead of re-running the cell join
    # per consumer (the text_perplexity localCheckpoint lesson)
    top = (
        cand.withColumn("rk", F.row_number().over(w).cast("long"))
        .filter(F.col("rk") <= 3)
        .localCheckpoint()
    )
    # certificate per customer: 3 candidates found AND the 3rd
    # distance clears the excluded-supplier lower bound with margin.
    # Exclusion from the probe set means dlat >= 10 deg (distance >=
    # D_LAT directly) or, for non-polar customers, dlon > 10*k_lon
    # deg — whose haversine lower bound (with the MINIMUM cosine
    # product reachable in the +-10-deg band, the r9 review fix; the
    # first draft used the band MAXIMUM and could wrongly certify)
    # is >= D_LAT by the construction of k_lon above. Polar
    # customers probe every longitude, so only the lat bound
    # applies. The bound is therefore uniformly D_LAT.
    per_cust = top.groupBy("c_custkey", "lat").agg(
        F.count(F.lit(1)).alias("n3"), F.max("d_exact").alias("d3")
    )
    certified = per_cust.filter(
        (F.col("n3") == 3) & (F.col("d3") + 1e-3 < F.lit(D_LAT_BOUND))
    ).select("c_custkey").localCheckpoint()
    fallback_cust = base.join(certified, "c_custkey", "left_anti").select(
        "c_custkey", "lat", "lon"
    )
    fb = fallback_cust.crossJoin(
        F.broadcast(sup.select("s_suppkey", "s_lat", "s_lon"))
    ).select(
        "c_custkey",
        "s_suppkey",
        _haversine_km(
            F.col("lat"), F.col("lon"), F.col("s_lat"), F.col("s_lon")
        ).alias("d_exact"),
    )
    fb_top = (
        fb.withColumn("rk", F.row_number().over(w).cast("long"))
        .filter(F.col("rk") <= 3)
    )
    keep = top.join(certified, "c_custkey").select(
        "c_custkey", "s_suppkey", "d_exact", "rk"
    )
    return (
        keep.unionByName(
            fb_top.select("c_custkey", "s_suppkey", "d_exact", "rk")
        )
        .select(
            "c_custkey",
            "s_suppkey",
            F.round("d_exact", 6).alias("dist_km"),
            "rk",
        )
    )


# ---------------------------------------------------------------------------
# pipeline_dedup_incremental — incoming batch vs existing corpus
# ---------------------------------------------------------------------------

_INCR_SQL = """
WITH fp AS (SELECT doc_id,
                   md5(regexp_replace(trim(lower(text)), '\\s+', ' ', 'g')) AS f
            FROM documents),
corpus AS (SELECT f, CAST(COUNT(*) AS BIGINT) AS n_corpus,
                  MIN(doc_id) AS first_seen
           FROM fp WHERE doc_id % 10 <> 0 GROUP BY f),
incoming AS (SELECT doc_id, f FROM fp WHERE doc_id % 10 = 0)
SELECT i.doc_id, i.f AS fingerprint,
       c.f IS NULL AS is_new,
       COALESCE(c.n_corpus, 0) AS n_corpus,
       c.first_seen
FROM incoming i LEFT JOIN corpus c ON c.f = i.f
"""


@register("pipeline_dedup_incremental", _INCR_SQL)
def pipeline_dedup_incremental(spark, sf_dir):
    """Ingest-time dedup: an incoming batch (doc_id % 10 == 0)
    checked against the EXISTING corpus (the rest) by normalized-text
    fingerprint — the decision every incremental training-data
    pipeline makes per shard ("is this document already in the
    lake?"). The corpus side reduces to one (fingerprint, count,
    first_seen) row per distinct text BEFORE the join, so the join
    moves corpus-distinct rows, not corpus rows; at 100 TB the
    corpus fingerprint table is the thing you maintain incrementally
    (txlog merge) and probe (exactly what the per-file Bloom index
    accelerates: most incoming fingerprints are absent, and an
    absent probe opens zero files). Left join keeps never-seen
    incoming docs with is_new=true and NULL provenance."""
    from pyspark.sql import functions as F

    from stockify_spark.functions.text import fingerprint

    fp = _t(spark, sf_dir, "documents").select(
        "doc_id", fingerprint("text").alias("f")
    )
    corpus = (
        fp.filter(F.col("doc_id") % 10 != 0)
        .groupBy("f")
        .agg(
            F.count(F.lit(1)).alias("n_corpus"),
            F.min("doc_id").alias("first_seen"),
        )
        .withColumnRenamed("f", "cf")
    )
    incoming = fp.filter(F.col("doc_id") % 10 == 0)
    return (
        incoming.join(corpus, incoming["f"] == corpus["cf"], "left")
        .select(
            "doc_id",
            F.col("f").alias("fingerprint"),
            F.col("cf").isNull().alias("is_new"),
            F.coalesce("n_corpus", F.lit(0)).alias("n_corpus"),
            "first_seen",
        )
    )


# ---------------------------------------------------------------------------
# agg_winsorized_stats — P5/P95-clipped robust moments per group
# ---------------------------------------------------------------------------

_WINSOR_SQL = """
WITH q AS (SELECT l_returnflag,
                  quantile_cont(l_extendedprice, 0.05) AS lo,
                  quantile_cont(l_extendedprice, 0.95) AS hi
           FROM lineitem GROUP BY 1),
w AS (SELECT l.l_returnflag,
             LEAST(GREATEST(l.l_extendedprice, q.lo), q.hi) AS v
      FROM lineitem l JOIN q USING (l_returnflag))
SELECT l_returnflag, CAST(COUNT(*) AS BIGINT) AS n,
       ROUND(AVG(v), 4) AS win_mean,
       ROUND(stddev_samp(v), 4) AS win_std
FROM w GROUP BY l_returnflag
"""


@register("agg_winsorized_stats", _WINSOR_SQL)
def agg_winsorized_stats(spark, sf_dir):
    """Winsorized mean/std per group: values clipped to the group's
    [P5, P95] before the moments — the robust-stats middle ground
    between raw moments (tail-dragged) and median/MAD (throws away
    magnitude). Two passes: one grouped exact-percentile aggregate
    (the proven percentile == quantile_cont convention,
    agg_percentile), thresholds broadcast back, clip as a LEAST/
    GREATEST column expression, one moments aggregate — no sort of
    the data, no per-row Python. Clip thresholds may differ by an
    ulp across engines (interpolated quantiles), which perturbs a
    clipped SUM by ~1e-10 relative — far inside the 4dp ROUND, same
    margin argument as the sibling robust aggregates."""
    from pyspark.sql import functions as F

    li = _t(spark, sf_dir, "lineitem").select("l_returnflag", "l_extendedprice")
    q = li.groupBy("l_returnflag").agg(
        F.expr("percentile(l_extendedprice, 0.05)").alias("lo"),
        F.expr("percentile(l_extendedprice, 0.95)").alias("hi"),
    )
    w = li.join(F.broadcast(q), "l_returnflag").select(
        "l_returnflag",
        F.least(F.greatest("l_extendedprice", F.col("lo")), F.col("hi")).alias("v"),
    )
    return w.groupBy("l_returnflag").agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.round(F.avg("v"), 4).alias("win_mean"),
        F.round(F.stddev_samp("v"), 4).alias("win_std"),
    )


# ---------------------------------------------------------------------------
# orders_cohort_ltv — cohort lifetime-value curves
# ---------------------------------------------------------------------------

_LTV_SQL = """
WITH firstm AS (SELECT o_custkey,
                       MIN(date_trunc('month', o_orderdate)) AS cohort
                FROM orders GROUP BY 1),
x AS (SELECT f.cohort,
             date_diff('month', f.cohort, date_trunc('month', o.o_orderdate)) AS age,
             o.o_totalprice
      FROM orders o JOIN firstm f USING (o_custkey)),
g AS (SELECT cohort, age, CAST(COUNT(*) AS BIGINT) AS n_orders,
             ROUND(SUM(o_totalprice), 6) AS revenue
      FROM x GROUP BY 1, 2)
SELECT strftime(cohort, '%Y-%m') AS cohort, CAST(age AS BIGINT) AS age,
       n_orders, revenue,
       ROUND(SUM(revenue) OVER (PARTITION BY cohort ORDER BY age), 6)
         AS cum_revenue
FROM g
"""


@register("orders_cohort_ltv", _LTV_SQL)
def orders_cohort_ltv(spark, sf_dir):
    """Cohort lifetime-value curves: customers grouped by first-order
    month, revenue accumulated by cohort age in months — the LTV
    matrix behind every retention-economics dashboard. One customer
    first-month aggregate joined back to the fact stream (broadcast:
    one row per customer), one (cohort, age) rollup, then the
    cumulative curve as an ordered window over the ROLLED-UP table
    (months-count rows per cohort, not order-scale). Float policy:
    the data-sized SUM rounds to 6dp BEFORE the running total, so
    the cumulative accumulation runs over identical doubles in
    identical (age) order on both engines — the orders_pareto
    discipline for prefix sums over unordered aggregates."""
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    orders = _t(spark, sf_dir, "orders").select(
        "o_custkey", "o_totalprice", F.trunc("o_orderdate", "month").alias("m")
    )
    firstm = orders.groupBy("o_custkey").agg(F.min("m").alias("cohort"))
    x = orders.join(F.broadcast(firstm), "o_custkey").select(
        "cohort",
        F.months_between("m", "cohort").cast("long").alias("age"),
        "o_totalprice",
    )
    g = x.groupBy("cohort", "age").agg(
        F.count(F.lit(1)).cast("long").alias("n_orders"),
        F.round(F.sum("o_totalprice"), 6).alias("revenue"),
    )
    w = Window.partitionBy("cohort").orderBy("age")
    return g.select(
        F.date_format("cohort", "yyyy-MM").alias("cohort"),
        "age",
        "n_orders",
        "revenue",
        F.round(F.sum("revenue").over(w), 6).alias("cum_revenue"),
    )


# ---------------------------------------------------------------------------
# stocks_atr / stocks_obv — reference-domain indicators on the ramp
# ---------------------------------------------------------------------------

_RAMP_SQL11 = (
    "SELECT i AS row_id, CAST(500 + (i % 18) * 10 AS DOUBLE) AS close,"
    " CAST(1200000 + (i % 18) * 100000 AS DOUBLE) AS volume,"
    " CAST(510 + (i % 18) * 10 AS DOUBLE) AS high,"
    " CAST(440 + (i % 18) * 10 AS DOUBLE) AS low"
    " FROM range(1800) t(i)"
)

_ATR_SQL = f"""
WITH stocks AS ({_RAMP_SQL11}),
tr AS (SELECT row_id,
              CASE WHEN lag(close) OVER w IS NULL THEN high - low
                   ELSE GREATEST(high - low,
                                 ABS(high - lag(close) OVER w),
                                 ABS(low - lag(close) OVER w)) END AS tr
       FROM stocks WINDOW w AS (ORDER BY row_id))
SELECT row_id, ROUND(tr, 6) AS tr,
       ROUND(AVG(tr) OVER (ORDER BY row_id
                           ROWS BETWEEN 13 PRECEDING AND CURRENT ROW), 6)
         AS atr_14
FROM tr
"""


@register("stocks_atr", _ATR_SQL)
def stocks_atr(spark, sf_dir):
    """Average True Range (SMA-14 variant) on the reference's own
    ramp table — the volatility indicator that extends the
    reference's rolling min/max family (stockify.cu:142-193) with
    the gap-aware true range: max(high-low, |high-prev_close|,
    |low-prev_close|), first row falling back to high-low. One lag +
    one bounded-frame mean over the deterministic global order
    (row_id IS data, SURVEY §7.4) — the documented 1-part parity
    shape on the 1800-row ramp; the partitioned production form is
    the window_partitioned_parity construction."""
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    from stockify_spark.sources.fixtures import stocks_ramp

    s = stocks_ramp(spark, cycles=100)
    w = Window.orderBy("row_id")
    pc = F.lag("close").over(w)
    tr = F.when(pc.isNull(), F.col("high") - F.col("low")).otherwise(
        F.greatest(
            F.col("high") - F.col("low"),
            F.abs(F.col("high") - pc),
            F.abs(F.col("low") - pc),
        )
    )
    t = s.select("row_id", tr.alias("tr"))
    fw = Window.orderBy("row_id").rowsBetween(-13, 0)
    return t.select(
        "row_id",
        F.round("tr", 6).alias("tr"),
        F.round(F.avg("tr").over(fw), 6).alias("atr_14"),
    )


_OBV_SQL = f"""
WITH stocks AS ({_RAMP_SQL11}),
s AS (SELECT row_id, volume,
             CASE WHEN lag(close) OVER w IS NULL THEN 0
                  WHEN close > lag(close) OVER w THEN 1
                  WHEN close < lag(close) OVER w THEN -1
                  ELSE 0 END AS sgn
      FROM stocks WINDOW w AS (ORDER BY row_id))
SELECT row_id,
       ROUND(SUM(sgn * volume) OVER (ORDER BY row_id
                                     ROWS UNBOUNDED PRECEDING), 2) AS obv
FROM s
"""


@register("stocks_obv", _OBV_SQL)
def stocks_obv(spark, sf_dir):
    """On-balance volume on the ramp: the running sum of
    direction-signed volume (up-day +v, down-day -v, flat 0) — the
    flow indicator pairing the reference's close and volume columns.
    Prefix sum over the global row order: the documented 1-part
    parity shape; the ramp's volumes are integer-valued doubles, so
    the ordered accumulation is integer-exact on both engines before
    the display round."""
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    from stockify_spark.sources.fixtures import stocks_ramp

    s = stocks_ramp(spark, cycles=100)
    w = Window.orderBy("row_id")
    pc = F.lag("close").over(w)
    sgn = (
        F.when(pc.isNull(), 0)
        .when(F.col("close") > pc, 1)
        .when(F.col("close") < pc, -1)
        .otherwise(0)
    )
    t = s.select("row_id", (sgn * F.col("volume")).alias("sv"))
    rw = Window.orderBy("row_id").rowsBetween(Window.unboundedPreceding, 0)
    return t.select(
        "row_id", F.round(F.sum("sv").over(rw), 2).alias("obv")
    )
