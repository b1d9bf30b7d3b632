"""Photo-JPEG MP4 container tests (stockify_spark/llm/mp4.py): ISO
BMFF round trip, stbl-indexed frame access, multi-sample chunks and
co64/largesize variants, honest codec boundaries, and the Spark
end-to-end paths (sample_frames + extract_features) over the second
compressed container."""

from __future__ import annotations

import struct

import numpy as np
import pytest

from stockify_spark.llm.mp4 import (
    _box,
    _walk_boxes,
    decode_mp4_mjpeg,
    encode_mp4_mjpeg,
    frame_count,
    mp4_info,
)
from stockify_spark.llm.multimodal import _pattern_video


@pytest.fixture(scope="module")
def clip():
    frames = _pattern_video(2, 42, duration_ms=1400, fps=10)
    return frames, encode_mp4_mjpeg(frames, fps=(10, 1))


def test_roundtrip_metadata_and_lossy_bound(clip):
    frames, data = clip
    assert mp4_info(data) == (64, 48, (10, 1), 14)
    assert frame_count(data) == 14
    dec, fps = decode_mp4_mjpeg(data)
    assert fps == (10, 1)
    assert dec.shape == frames.shape and dec.dtype == np.uint8
    # lossy but bounded: same JPEG profile as the AVI twin, so the
    # same measured bound applies (max mean-luma drift 0.57, tol 1.5)
    mean_err = np.abs(
        dec.astype(np.float64).mean(axis=(1, 2)) - frames.astype(np.float64).mean(axis=(1, 2))
    )
    assert mean_err.max() < 1.5


def test_indexed_access_equals_full_decode_slice(clip):
    _, data = clip
    full, _ = decode_mp4_mjpeg(data)
    some, _ = decode_mp4_mjpeg(data, frame_indices=[0, 5, 13])
    assert np.array_equal(some, full[[0, 5, 13]])
    with pytest.raises(IndexError):
        decode_mp4_mjpeg(data, frame_indices=[14])


def _remux(data: bytes, transform) -> bytes:
    """Apply ``transform(boxtype, payload) -> payload`` to each
    top-level box and reassemble (test helper)."""
    out = bytearray()
    for t, body, size in _walk_boxes(data, 0, len(data)):
        out += _box(t, transform(t, data[body : body + size]))
    return bytes(out)


def test_co64_offsets_parse(clip):
    """Rewrite stco as co64 (64-bit chunk offsets) — real muxers emit
    co64 for >4 GB files; the parser must accept both."""
    _, data = clip
    stco_at = data.index(b"stco") - 4
    size = struct.unpack_from(">I", data, stco_at)[0]
    body = stco_at + 8
    n = struct.unpack_from(">I", data, body + 4)[0]
    offs = struct.unpack_from(f">{n}I", data, body + 8)
    # co64 payload is 8 bytes longer per entry; offsets shift by the
    # growth for boxes AFTER mdat — but our writer puts moov last, so
    # sample offsets are unaffected by moov growing.
    co64 = (
        struct.pack(">I", 8 + 4 + 4 + 8 * n)
        + b"co64"
        + data[body : body + 4]  # version/flags
        + struct.pack(">I", n)
        + b"".join(struct.pack(">Q", o) for o in offs)
    )
    mut = data[:stco_at] + co64 + data[stco_at + size :]
    # fix enclosing box sizes (stbl, minf, mdia, trak, moov grew by
    # 4*n bytes each)
    grow = len(co64) - size
    mut = bytearray(mut)
    for fourcc in (b"moov", b"trak", b"mdia", b"minf", b"stbl"):
        at = mut.index(fourcc) - 4
        struct.pack_into(">I", mut, at, struct.unpack_from(">I", mut, at)[0] + grow)
    a, _ = decode_mp4_mjpeg(data)
    b, _ = decode_mp4_mjpeg(bytes(mut))
    assert np.array_equal(a, b)


def test_multi_sample_chunks_expand_via_stsc():
    """A muxer may pack several samples per chunk: collapse our
    one-sample chunks into one big chunk and verify the stsc run
    expansion still finds every frame."""
    frames = _pattern_video(5, 42, duration_ms=500, fps=10)
    data = encode_mp4_mjpeg(frames, fps=(10, 1))
    n = len(frames)
    # first sample offset = start of mdat payload; samples are
    # contiguous, so a single chunk at that offset with
    # samples_per_chunk=n describes the same bytes
    stco_at = data.index(b"stco") - 4
    stco_size = struct.unpack_from(">I", data, stco_at)[0]
    first_off = struct.unpack_from(">I", data, stco_at + 8 + 4 + 4)[0]
    new_stco = (
        struct.pack(">I", 8 + 4 + 4 + 4)
        + b"stco"
        + b"\x00" * 4
        + struct.pack(">II", 1, first_off)
    )
    stsc_at = data.index(b"stsc") - 4
    stsc_size = struct.unpack_from(">I", data, stsc_at)[0]
    new_stsc = (
        struct.pack(">I", 8 + 4 + 4 + 12)
        + b"stsc"
        + b"\x00" * 4
        + struct.pack(">IIII", 1, 1, n, 1)
    )
    mut = bytearray(
        data[:stsc_at] + new_stsc + data[stsc_at + stsc_size : stco_at] + new_stco + data[stco_at + stco_size :]
    )
    grow = (len(new_stsc) - stsc_size) + (len(new_stco) - stco_size)
    for fourcc in (b"moov", b"trak", b"mdia", b"minf", b"stbl"):
        at = mut.index(fourcc) - 4
        struct.pack_into(">I", mut, at, struct.unpack_from(">I", mut, at)[0] + grow)
    a, _ = decode_mp4_mjpeg(data)
    b, _ = decode_mp4_mjpeg(bytes(mut))
    assert np.array_equal(a, b)


def test_header_probe_never_touches_entropy_data(clip):
    """mp4_info reads moov only: corrupting every sample's entropy
    bytes must leave the probe intact while decode fails."""
    _, data = clip
    info = mp4_info(data)
    mut = bytearray(data)
    for t, body, size in _walk_boxes(data, 0, len(data)):
        if t == b"mdat":
            # zero scan tails in the middle of the payload, keeping
            # the leading JPEG headers of the first sample intact
            mut[body + size // 2 : body + size // 2 + 256] = b"\x00" * 256
    assert mp4_info(bytes(mut)) == info
    with pytest.raises(ValueError):
        decode_mp4_mjpeg(bytes(mut))


def test_rejections(clip):
    with pytest.raises(ValueError, match="unexpected leading box"):
        mp4_info(b"JUNKJUNKJUNKJUNK")
    with pytest.raises(ValueError, match="no moov"):
        mp4_info(_box(b"ftyp", b"isom") + _box(b"mdat", b"x" * 10))
    # non-JPEG codec: honest NotImplementedError, not junk output
    _, data = clip
    mut = bytearray(data)
    at = mut.index(b"jpeg", mut.index(b"stsd"))
    mut[at : at + 4] = b"avc1"
    with pytest.raises(NotImplementedError, match="avc1"):
        mp4_info(bytes(mut))


def test_largesize_box_parses(clip):
    """size==1 + 64-bit largesize on mdat (what muxers write past
    4 GB) must walk correctly; moov offsets shift by the 8 inserted
    bytes, so patch stco to match."""
    _, data = clip
    mdat_at = data.index(b"mdat") - 4
    size = struct.unpack_from(">I", data, mdat_at)[0]
    payload = data[mdat_at + 8 : mdat_at + size]
    big = struct.pack(">I", 1) + b"mdat" + struct.pack(">Q", 16 + len(payload)) + payload
    mut = bytearray(data[:mdat_at] + big + data[mdat_at + size :])
    stco_at = mut.index(b"stco") - 4
    n = struct.unpack_from(">I", mut, stco_at + 12)[0]
    for e in range(n):
        p = stco_at + 16 + 4 * e
        struct.pack_into(">I", mut, p, struct.unpack_from(">I", mut, p)[0] + 8)
    a, _ = decode_mp4_mjpeg(data)
    b, _ = decode_mp4_mjpeg(bytes(mut))
    assert np.array_equal(a, b)


def frame_count_of(i: int) -> int:
    return max(int(round((1000 + i) * 10 / 1000)), 1)


def test_spark_sample_frames_from_mp4(spark):
    """End-to-end explode-before-decode over the MP4 container:
    frame_index exact, mean luma within the JPEG bound."""
    from stockify_spark.llm.multimodal import sample_frames, synthetic_media_mp4

    media = synthetic_media_mp4(spark, n=12)  # clips 2, 5, 8, 11
    rows = sample_frames(media, every_ms=500).orderBy("media_id", "frame_ts_ms").collect()
    assert [r["media_id"] for r in rows[:3]] == [2, 2, 2]
    for r in rows:
        assert r["frame_index"] == min(r["frame_ts_ms"] // 100, frame_count_of(r["media_id"]) - 1)
        src = _pattern_video(r["media_id"], 42, duration_ms=1000 + r["media_id"])
        assert abs(r["mean_luma"] - float(src[r["frame_index"]].mean())) < 1.5


def test_spark_real_features_from_mp4(spark):
    """extract_features(decode_stub=False) decodes video/mp4 for
    real; n_frames (feature[0]) and fps (feature[1]) are exact."""
    from stockify_spark.llm.multimodal import extract_features, synthetic_media_mp4

    media = synthetic_media_mp4(spark, n=12)
    rows = extract_features(media, decode_stub=False).orderBy("media_id").collect()
    assert [r["media_id"] for r in rows] == [2, 5, 8, 11]
    for r in rows:
        assert r["feature"][0] == frame_count_of(r["media_id"])
        assert r["feature"][1] == 10.0
