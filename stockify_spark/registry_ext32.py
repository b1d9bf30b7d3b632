"""Round-8 extension wave 21: decodable H.264 — the I_PCM subset.

Moves the video-codec boundary from "structural probe only" to REAL
sample decode for the decodable subset of H.264: streams whose
macroblocks are I_PCM (raw 8-bit samples inside a fully standard
Annex-B/SPS/PPS/slice-header wrapper — the lossless escape hatch
every AVC profile includes). The encoder and decoder share only the
bitstream spec, exercising Exp-Golomb slice headers, PCM byte
alignment, and wire-level emulation prevention end to end. Coded
(CAVLC/intra-predicted) macroblocks remain the honest
NotImplementedError boundary (llm/h264.decode_h264)."""

from __future__ import annotations

from stockify_spark.registry import register

_IPCM_N = 6


def _ipcm_spec(i: int) -> tuple[int, int, int, int, int]:
    # 32x32 frames; luma_base + x + 2y stays under 256 for base <= 162
    return 32, 32, 16 + 8 * i, 120 + i, 60 + 2 * i


_IPCM_SQL = f"""
WITH ids AS (SELECT unnest(range(0, {_IPCM_N})) AS media_id)
SELECT media_id,
       CAST(32 AS INTEGER) AS width, CAST(32 AS INTEGER) AS height,
       CAST(4 AS BIGINT) AS n_mb,
       ROUND(CAST(16 + 8 * media_id AS DOUBLE) + 15.5 + 31.0, 4) AS mean_luma,
       CAST(120 + media_id AS INTEGER) AS cb0,
       CAST(60 + 2 * media_id AS INTEGER) AS cr0
FROM ids
"""


@register("media_h264_ipcm_decode", _IPCM_SQL)
def media_h264_ipcm_decode(spark, sf_dir):
    """REAL H.264 decode of the I_PCM subset: per payload, one
    mapInPandas pass splits NALs, parses SPS/PPS and the IDR
    slice header (Exp-Golomb), walks the macroblock loop and
    reconstructs the raw PCM planes — the decoded luma mean and
    chroma DCs are checked against the closed-form generation spec
    (media-family oracle precedent: the ramp pattern
    luma = base + x + 2y has mean base + 46.5 on a 32x32 frame).
    Every byte crosses the emulation-prevention layer on the wire.
    Filter-before-decode still applies at scale: h264_probe routes,
    this decodes only what the router admits."""
    from pyspark.sql import types as T

    import pandas as pd

    from stockify_spark.llm.h264 import decode_h264_ipcm, encode_h264_ipcm

    rows = [
        (i, bytearray(encode_h264_ipcm(*_ipcm_spec(i)))) for i in range(_IPCM_N)
    ]
    media = spark.createDataFrame(rows, "media_id long, content binary")
    schema = T.StructType(
        [
            T.StructField("media_id", T.LongType(), False),
            T.StructField("width", T.IntegerType(), False),
            T.StructField("height", T.IntegerType(), False),
            T.StructField("n_mb", T.LongType(), False),
            T.StructField("mean_luma", T.DoubleType(), False),
            T.StructField("cb0", T.IntegerType(), False),
            T.StructField("cr0", T.IntegerType(), False),
        ]
    )

    def run(batches):
        for pdf in batches:
            out = []
            for mid, content in zip(pdf["media_id"], pdf["content"]):
                f = decode_h264_ipcm(bytes(content))
                out.append(
                    (
                        int(mid),
                        f["width"],
                        f["height"],
                        f["n_mb"],
                        round(sum(f["luma"]) / len(f["luma"]), 4),
                        f["cb0"],
                        f["cr0"],
                    )
                )
            yield pd.DataFrame(
                out,
                columns=[
                    "media_id", "width", "height", "n_mb",
                    "mean_luma", "cb0", "cr0",
                ],
            )

    return media.mapInPandas(run, schema)
