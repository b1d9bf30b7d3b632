"""MP3 frame-level parser tests (stockify_spark/llm/mp3.py): header
walk, CBR/VBR classification, padding-bit lengths, ID3v2 tolerance,
truncation handling, and the honest sample-decode boundary."""

from __future__ import annotations

import pytest

from stockify_spark.llm.mp3 import (
    BITRATES_KBPS,
    SAMPLE_RATES,
    decode_mp3,
    encode_mp3_frames,
    frame_length,
    mp3_info,
    parse_frames,
)


def test_cbr_stream_metadata():
    data = encode_mp3_frames([5] * 40, sr_idx=0)
    n, sr, dur, mean, vbr = mp3_info(data)
    assert (n, sr, mean, vbr) == (40, 44100, BITRATES_KBPS[5], False)
    assert dur == 40 * 1152 * 1000 // 44100
    # frame lengths alternate with the padding bit
    frames = parse_frames(data)
    assert len(frames) == 40
    assert frames[0][1] == frame_length(64, 44100, 0)
    assert frames[1][1] == frame_length(64, 44100, 1)
    # offsets chain exactly: header walk = sum of computed lengths
    for (o1, n1, _), (o2, _, _) in zip(frames, frames[1:]):
        assert o2 == o1 + n1


def test_vbr_stream_mean_and_flag():
    data = encode_mp3_frames([5, 9] * 20, sr_idx=1)
    n, sr, dur, mean, vbr = mp3_info(data)
    assert (n, sr, vbr) == (40, 48000, True)
    assert mean == (20 * BITRATES_KBPS[5] + 20 * BITRATES_KBPS[9]) // 40


def test_id3v2_prefix_and_trailing_garbage():
    data = encode_mp3_frames([3] * 7, sr_idx=2)
    tag = b"ID3" + bytes([4, 0, 0]) + bytes([0, 0, 0, 10]) + b"x" * 10
    assert mp3_info(tag + data) == mp3_info(data)
    # trailing non-frame bytes end the walk instead of corrupting it
    assert mp3_info(data + b"\x00garbage")[0] == 7
    # a truncated final frame is dropped, not misparsed
    assert mp3_info(data[:-5])[0] == 6


def test_rejections_and_boundaries():
    with pytest.raises(ValueError, match="no valid"):
        mp3_info(b"\x00" * 32)
    # reserved bitrate index (0xF) rejected
    bad = bytearray(encode_mp3_frames([5] * 2))
    bad[2] = 0xF0 | (bad[2] & 0x0F)
    with pytest.raises(ValueError, match="reserved"):
        mp3_info(bytes(bad))
    # MPEG-2 / other layers: honest NotImplementedError
    v2 = bytearray(encode_mp3_frames([5] * 2))
    v2[1] = 0xF3  # version bits -> MPEG-2
    with pytest.raises(NotImplementedError, match="MPEG-1 Layer III"):
        mp3_info(bytes(v2))
    with pytest.raises(NotImplementedError, match="sample decode"):
        decode_mp3(encode_mp3_frames([5]))


def test_sample_rates_table():
    for sr_idx, sr in enumerate(SAMPLE_RATES):
        data = encode_mp3_frames([8] * 10, sr_idx=sr_idx)
        assert mp3_info(data)[1] == sr
