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

from stockify_spark.registry import register

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
