"""MJPEG-in-AVI container tests (stockify_spark/llm/avi.py): RIFF
round trip, idx1-indexed frame access, index-less and absolute-offset
fallbacks, honest codec boundaries, and the Spark end-to-end paths
(sample_frames + extract_features) over the compressed container."""

from __future__ import annotations

import struct

import numpy as np
import pytest

from stockify_spark.llm.avi import (
    _chunk,
    _walk_chunks,
    avi_info,
    decode_avi_mjpeg,
    encode_avi_mjpeg,
    frame_count,
)
from stockify_spark.llm.multimodal import _pattern_video


@pytest.fixture(scope="module")
def clip():
    frames = _pattern_video(2, 42, duration_ms=1400, fps=10)
    return frames, encode_avi_mjpeg(frames, fps=(10, 1))


def test_roundtrip_metadata_and_lossy_bound(clip):
    frames, data = clip
    assert avi_info(data) == (64, 48, (10, 1), 14)
    assert frame_count(data) == 14
    dec, fps = decode_avi_mjpeg(data)
    assert fps == (10, 1)
    assert dec.shape == frames.shape and dec.dtype == np.uint8
    # lossy but bounded: JPEG quality-50 keeps the frame mean within
    # 1.5 luma units of the source (measured max 0.57 over 32 clips)
    mean_err = np.abs(
        dec.astype(np.float64).mean(axis=(1, 2)) - frames.astype(np.float64).mean(axis=(1, 2))
    )
    assert mean_err.max() < 1.5


def test_indexed_access_equals_full_decode_slice(clip):
    _, data = clip
    full, _ = decode_avi_mjpeg(data)
    some, _ = decode_avi_mjpeg(data, frame_indices=[0, 5, 13])
    assert np.array_equal(some, full[[0, 5, 13]])
    with pytest.raises(IndexError):
        decode_avi_mjpeg(data, frame_indices=[14])


def _strip_idx1(data: bytes) -> bytes:
    """Remove the idx1 chunk (keeping RIFF size consistent) to force
    the movi header-walk fallback."""
    out = bytearray()
    riff_size = struct.unpack_from("<I", data, 4)[0]
    end = 8 + riff_size
    pos, kept = 12, []
    for fourcc, body, size in _walk_chunks(data, pos, end):
        if fourcc != b"idx1":
            kept.append(data[body - 8 : body + size + (size % 2)])
    body_bytes = b"".join(kept)
    out += b"RIFF" + struct.pack("<I", 4 + len(body_bytes)) + b"AVI " + body_bytes
    return bytes(out)


def test_indexless_file_takes_movi_scan_fallback(clip):
    _, data = clip
    stripped = _strip_idx1(data)
    assert b"idx1" not in stripped
    assert frame_count(stripped) == 14
    a, _ = decode_avi_mjpeg(data, frame_indices=[3])
    b, _ = decode_avi_mjpeg(stripped, frame_indices=[3])
    assert np.array_equal(a, b)


def test_absolute_offset_idx1_variant(clip):
    """Some muxers write idx1 offsets as absolute file positions
    rather than movi-relative; the probe must accept both."""
    _, data = clip
    mut = bytearray(data)
    riff_size = struct.unpack_from("<I", data, 4)[0]
    movi_fourcc_pos = idx_body = idx_size = None
    for fourcc, body, size in _walk_chunks(data, 12, 8 + riff_size):
        if fourcc == b"LIST" and data[body : body + 4] == b"movi":
            movi_fourcc_pos = body
        elif fourcc == b"idx1":
            idx_body, idx_size = body, size
    for e in range(idx_body, idx_body + idx_size, 16):
        rel = struct.unpack_from("<I", mut, e + 8)[0]
        struct.pack_into("<I", mut, e + 8, movi_fourcc_pos + rel)
    a, _ = decode_avi_mjpeg(data)
    b, _ = decode_avi_mjpeg(bytes(mut))
    assert np.array_equal(a, b)


def test_header_probe_never_touches_entropy_data(clip):
    """avi_info reads headers + idx1 only: corrupting every JPEG's
    entropy bytes must leave the probe intact while decode fails."""
    _, data = clip
    info = avi_info(data)
    mut = bytearray(data)
    riff_size = struct.unpack_from("<I", data, 4)[0]
    for fourcc, body, size in _walk_chunks(data, 12, 8 + riff_size):
        if fourcc == b"LIST" and data[body : body + 4] == b"movi":
            for sub, sbody, ssize in _walk_chunks(data, body + 4, body + size):
                if sub == b"00dc":
                    # zero the scan tail, keeping the JPEG headers
                    mut[sbody + ssize - 64 : sbody + ssize] = b"\x00" * 64
    assert avi_info(bytes(mut)) == info
    with pytest.raises(ValueError):
        decode_avi_mjpeg(bytes(mut), frame_indices=[0])


def test_rejections_and_chunk_padding():
    with pytest.raises(ValueError, match="RIFF"):
        avi_info(b"JUNK" + b"\x00" * 20)
    # non-MJPEG video stream: honest NotImplementedError, not junk
    frames = _pattern_video(2, 42, duration_ms=300, fps=10)
    data = bytearray(encode_avi_mjpeg(frames, fps=(10, 1)))
    pos = data.index(b"vids") + 4
    data[pos : pos + 4] = b"H264"
    with pytest.raises(NotImplementedError, match="H264"):
        avi_info(bytes(data))
    # odd-size payloads get a pad byte excluded from the size field
    blob = _chunk(b"00dc", b"xyz")
    assert len(blob) == 12 and blob[-1] == 0
    [(fourcc, body, size)] = list(_walk_chunks(blob, 0, len(blob)))
    assert (fourcc, size, blob[body : body + size]) == (b"00dc", 3, b"xyz")


def test_rgb_mjpeg_frames_reduce_to_luma():
    """Color MJPEG streams decode via the BT.601 luma reduction —
    a neutral-gray RGB frame must round-trip to its gray level."""
    from stockify_spark.llm.jpeg import encode_jpeg

    rgb = np.full((48, 64, 3), 128, dtype=np.uint8)
    jpeg = encode_jpeg(rgb)
    # splice the color JPEG into a 1-frame AVI
    gray = encode_avi_mjpeg(np.full((1, 48, 64), 0, dtype=np.uint8), fps=(10, 1))
    head, _, tail = gray.partition(b"00dc")
    old_size = struct.unpack_from("<I", tail, 0)[0]
    old_total = 4 + old_size + (old_size % 2)
    body = b"00dc" + struct.pack("<I", len(jpeg)) + jpeg + b"\x00" * (len(jpeg) % 2)
    rest = tail[old_total:]
    # drop the now-stale idx1 so the movi scan finds the new chunk
    idx_at = rest.index(b"idx1")
    data = head + body + rest[:idx_at]
    dec, _ = decode_avi_mjpeg(_rebuild_sizes(data))
    assert dec.shape == (1, 48, 64)
    assert np.abs(dec.astype(float) - 128.0).max() < 3


def _rebuild_sizes(data: bytes) -> bytes:
    """Recompute the RIFF and movi LIST sizes after splicing chunks
    (test helper for hand-mutated containers)."""
    out = bytearray(data)
    struct.pack_into("<I", out, 4, len(data) - 8)
    movi_at = data.index(b"movi") - 8  # LIST header position
    struct.pack_into("<I", out, movi_at + 4, len(data) - (movi_at + 8))
    return bytes(out)


def test_spark_sample_frames_from_avi(spark):
    """End-to-end explode-before-decode over the compressed
    container: frame_index exact, mean luma within the JPEG bound."""
    from stockify_spark.llm.multimodal import sample_frames, synthetic_media_avi

    media = synthetic_media_avi(spark, n=12)  # clips 2, 5, 8, 11
    rows = sample_frames(media, every_ms=500).orderBy("media_id", "frame_ts_ms").collect()
    assert [r["media_id"] for r in rows[:3]] == [2, 2, 2]
    for r in rows:
        assert r["frame_index"] == min(r["frame_ts_ms"] // 100, frame_count_of(r["media_id"]) - 1)
        src = _pattern_video(r["media_id"], 42, duration_ms=1000 + r["media_id"])
        assert abs(r["mean_luma"] - float(src[r["frame_index"]].mean())) < 1.5


def frame_count_of(i: int) -> int:
    return max(int(round((1000 + i) * 10 / 1000)), 1)


def test_spark_real_features_from_avi(spark):
    """extract_features(decode_stub=False) decodes video/x-msvideo
    for real; n_frames (feature[0]) and fps (feature[1]) are exact."""
    from stockify_spark.llm.multimodal import extract_features, synthetic_media_avi

    media = synthetic_media_avi(spark, n=12)
    rows = extract_features(media, decode_stub=False).orderBy("media_id").collect()
    assert [r["media_id"] for r in rows] == [2, 5, 8, 11]
    for r in rows:
        assert r["feature"][0] == frame_count_of(r["media_id"])
        assert r["feature"][1] == 10.0
