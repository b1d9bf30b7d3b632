"""Round-8 registry wave: H.264 Annex-B structural probe.

Extends the multimodal family (SURVEY §2 LLM ops; media_mp3_index /
media_avi_index precedent) one codec deeper: real NAL-unit walking,
emulation-prevention stripping, and bit-level Exp-Golomb SPS parsing
(llm/h264.py), with slice decode held at the documented
NotImplementedError boundary. Oracle style follows the media family:
a closed-form spec of what a correct parse recovers (flagged
correctness-only for the bench ratio — the oracle is a statement of
the construction, not a rival parser).
"""

from __future__ import annotations

from stockify_spark.registry import register

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
