"""Round-13 extension wave 94: two new REAL codec paths.

GIF89a closes the LZW gap in the codec suite (llm/gif.py — the
variable-width dictionary coder none of png/jpeg/flac/deflate
exercises; deflate's LZ77+huffman is a different design), decoded
per-frame through the animation extensions. IMA ADPCM (llm/adpcm.py)
is the suite's first LOSSY audio codec — 4-bit differential
quantization with the standard step/index tables — whose oracle pins
the format's EXACT guarantees (counts, block structure, verbatim
block-header samples, compressed size) and states the reconstruction
contract as deterministic booleans, the honest shape for a lossy
path (BASELINE.md's tolerance-of-truth policy).

Both run encode AND decode inside mapInPandas over binary columns —
the Arrow-batched 100 TB media-corpus shape shared by the whole
suite (llm/multimodal.py).
"""

from __future__ import annotations

import math

from pyspark.sql import functions as F  # noqa: F401  (parity with sibling waves)
from pyspark.sql import types as T

from stockify_spark.registry import register

_GIF_N = 16
_GIF_FRAMES = 3
_GIF_DELAY = 4

# pixel(x, y, f) = (7x + 13y + 5*id + 11f) % 256 over w×h, 3 frames;
# the oracle re-derives every statistic from this formula through an
# independent path, so any LZW mis-decode (wrong width bump, bad
# KwKwK, sub-block seam) shifts the position-weighted hash.
_GIF_SQL = f"""
WITH ids AS (SELECT unnest(range(0, {_GIF_N})) AS media_id),
dims AS (SELECT media_id, 32 + 2 * (media_id % 8) AS w,
                24 + (media_id % 6) AS h
         FROM ids),
px AS (SELECT media_id, w, h,
              unnest(range(0, w * h * {_GIF_FRAMES})) AS pos
       FROM dims),
v AS (SELECT media_id, w, h, pos,
             ((pos % (w * h)) % w) * 7
           + ((pos % (w * h)) // w) * 13
           + 5 * media_id + 11 * (pos // (w * h)) AS raw
      FROM px)
SELECT media_id,
       CAST(MAX(w) AS INTEGER) AS width,
       CAST(MAX(h) AS INTEGER) AS height,
       CAST({_GIF_FRAMES} AS INTEGER) AS n_frames,
       CAST({_GIF_FRAMES * _GIF_DELAY} AS BIGINT) AS delay_cs_total,
       CAST(COUNT(*) AS BIGINT) AS n_pixels,
       CAST(SUM(raw % 256) AS BIGINT) AS pix_sum,
       CAST(MIN(raw % 256) AS INTEGER) AS pix_min,
       CAST(MAX(raw % 256) AS INTEGER) AS pix_max,
       CAST(SUM((raw % 256) * (pos + 1)) % 2147483647 AS BIGINT) AS pix_whash
FROM v GROUP BY media_id
"""


@register("media_gif_decode", _GIF_SQL)
def media_gif_decode(spark, sf_dir):
    """End-to-end LZW: per stream, synthesize 3 grayscale frames from
    a closed-form pattern, encode as an animated GIF89a (llm/gif.py —
    real LZW with width growth, table-overflow Clears, 255-byte
    sub-blocks, Graphic Control Extensions), decode back, and reduce
    to pixel statistics INCLUDING a position-weighted hash
    (sum of v·(pos+1) over the frame-major pixel order) so a decode
    that produces the right multiset of pixels in the wrong order
    still fails. The oracle recomputes everything from the pattern
    formula — it never sees the codec.

    Plumbing: encode and decode are two mapInPandas stages over a
    binary column; per-row work is bounded by frame area so Arrow
    batches stay O(batch·area) — the shape that holds when the
    corpus is 100 TB of real GIFs."""
    import pandas as pd

    from stockify_spark.llm.gif import decode_gif, encode_gif

    spec = spark.createDataFrame(
        [(i, 32 + 2 * (i % 8), 24 + (i % 6)) for i in range(_GIF_N)],
        "media_id long, w int, h int",
    )

    def ingest(batches):
        for pdf in batches:
            payloads = []
            for i, w, h in zip(pdf["media_id"], pdf["w"], pdf["h"]):
                i, w, h = int(i), int(w), int(h)
                frames = [
                    bytes(
                        (x * 7 + y * 13 + 5 * i + 11 * f) % 256
                        for y in range(h)
                        for x in range(w)
                    )
                    for f in range(_GIF_FRAMES)
                ]
                payloads.append(bytearray(encode_gif(frames, w, h, _GIF_DELAY)))
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
            T.StructField("width", T.IntegerType(), False),
            T.StructField("height", T.IntegerType(), False),
            T.StructField("n_frames", T.IntegerType(), False),
            T.StructField("delay_cs_total", T.LongType(), False),
            T.StructField("n_pixels", T.LongType(), False),
            T.StructField("pix_sum", T.LongType(), False),
            T.StructField("pix_min", T.IntegerType(), False),
            T.StructField("pix_max", T.IntegerType(), False),
            T.StructField("pix_whash", T.LongType(), False),
        ]
    )

    def analyze(batches):
        for pdf in batches:
            rows = []
            for i, content in zip(pdf["media_id"], pdf["content"]):
                g = decode_gif(bytes(content))
                stream = b"".join(g["frames"])
                whash = sum(v * (p + 1) for p, v in enumerate(stream)) % 2147483647
                rows.append(
                    (
                        int(i),
                        g["width"],
                        g["height"],
                        len(g["frames"]),
                        sum(g["delays_cs"]),
                        len(stream),
                        sum(stream),
                        min(stream),
                        max(stream),
                        whash,
                    )
                )
            yield pd.DataFrame(
                rows,
                columns=[
                    "media_id",
                    "width",
                    "height",
                    "n_frames",
                    "delay_cs_total",
                    "n_pixels",
                    "pix_sum",
                    "pix_min",
                    "pix_max",
                    "pix_whash",
                ],
            )

    return media.mapInPandas(analyze, out_schema)


# ---------------------------------------------------------------------------
# media_adpcm_roundtrip — lossy 4-bit IMA ADPCM with an exactness +
# error-contract oracle
# ---------------------------------------------------------------------------

_ADPCM_N = 20
_BLK = 506  # 1 header sample + 505 body samples per block
_ERR_BOUND = 256   # measured worst 79 on this family; 3x margin
_SNR_FLOOR = 35.0  # measured worst 44.02 dB; 9 dB margin

# triangle wave: x(t) = 60*(abs(((t + 3*id) % 100) - 50) - 25),
# n = 2000 + 37*id (spans 4-5 blocks; the phase offset makes every
# stream hit block boundaries at different waveform slopes)
_ADPCM_SQL = f"""
WITH ids AS (SELECT unnest(range(0, {_ADPCM_N})) AS media_id),
s AS (SELECT media_id, 2000 + 37 * media_id AS n FROM ids),
blk AS (SELECT media_id, n,
               unnest(range(0, (n + {_BLK} - 1) // {_BLK})) AS b
        FROM s),
bb AS (SELECT media_id, n, b,
              least({_BLK - 1}, n - {_BLK} * b - 1) AS body
       FROM blk)
SELECT media_id,
       CAST(MAX(n) AS BIGINT) AS n_samples,
       CAST(COUNT(*) AS BIGINT) AS n_blocks,
       CAST(60 * (abs((3 * MAX(media_id)) % 100 - 50) - 25) AS INTEGER)
         AS first_sample,
       CAST(SUM(6 + (body + 1) // 2) AS BIGINT) AS n_bytes,
       TRUE AS headers_exact,
       TRUE AS max_err_le_{_ERR_BOUND},
       TRUE AS snr_db_ge_{int(_SNR_FLOOR)}
FROM bb GROUP BY media_id
"""


@register("media_adpcm_roundtrip", _ADPCM_SQL)
def media_adpcm_roundtrip(spark, sf_dir):
    """Lossy 4-bit IMA ADPCM, encode → decode → contract check. The
    oracle restates everything the FORMAT guarantees exactly — sample
    count, block count, the verbatim first sample, the compressed
    byte count (6-byte state header + ceil(body/2) nibble bytes per
    block, ~4:1 vs 16-bit PCM) — and the codec's reconstruction
    contract as booleans computed Spark-side from the REAL decode:
    every block-header sample exact, max |error| <= 256 (measured 79
    on this family), SNR >= 35 dB (measured 44). A broken step-table
    update, nibble order, or index clamp blows the error bound and
    flips a boolean; a mis-framed block shifts n_bytes/n_blocks.

    Same two-stage mapInPandas shape as the rest of the suite; ADPCM
    state is strictly per-block, so blocks — and therefore Arrow
    batches — decode independently: the property that makes the
    format splittable at 100 TB."""
    import pandas as pd

    from stockify_spark.llm.adpcm import BLOCK_SAMPLES, decode_ima, encode_ima

    spec = spark.createDataFrame(
        [(i, 2000 + 37 * i) for i in range(_ADPCM_N)], "media_id long, n long"
    )

    def ingest(batches):
        for pdf in batches:
            payloads = []
            for i, n in zip(pdf["media_id"], pdf["n"]):
                i, n = int(i), int(n)
                wave = [
                    60 * (abs(((t + 3 * i) % 100) - 50) - 25) for t in range(n)
                ]
                payloads.append(bytearray(encode_ima(wave)))
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
            T.StructField("n_blocks", T.LongType(), False),
            T.StructField("first_sample", T.IntegerType(), False),
            T.StructField("n_bytes", T.LongType(), False),
            T.StructField("headers_exact", T.BooleanType(), False),
            T.StructField(f"max_err_le_{_ERR_BOUND}", T.BooleanType(), False),
            T.StructField(f"snr_db_ge_{int(_SNR_FLOOR)}", T.BooleanType(), False),
        ]
    )

    def analyze(batches):
        for pdf in batches:
            rows = []
            for i, content in zip(pdf["media_id"], pdf["content"]):
                i = int(i)
                raw = bytes(content)
                dec = decode_ima(raw)
                n = len(dec)
                wave = [
                    60 * (abs(((t + 3 * i) % 100) - 50) - 25) for t in range(n)
                ]
                stride = BLOCK_SAMPLES + 1
                headers_exact = all(
                    dec[b] == wave[b] for b in range(0, n, stride)
                )
                max_err = max(abs(a - b) for a, b in zip(wave, dec))
                sig = sum(x * x for x in wave)
                noise = sum((a - b) ** 2 for a, b in zip(wave, dec))
                snr = 10 * math.log10(sig / noise) if noise else float("inf")
                rows.append(
                    (
                        i,
                        n,
                        (n + stride - 1) // stride,
                        wave[0],
                        len(raw),
                        headers_exact,
                        max_err <= _ERR_BOUND,
                        snr >= _SNR_FLOOR,
                    )
                )
            yield pd.DataFrame(
                rows,
                columns=[f.name for f in out_schema.fields],
            )

    return media.mapInPandas(analyze, out_schema)
