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
    # r9: zero-main-data frames are now INSIDE the decodable subset
    # (silence by the spec's arithmetic); the boundary moved to
    # non-silent granules — pinned in
    # test_decode_refuses_main_data_and_reservoir
    assert decode_mp3(encode_mp3_frames([5]))["n_frames"] == 1


def test_sample_rates_table():
    for sr_idx, sr in enumerate(SAMPLE_RATES):
        data = encode_mp3_frames([8] * 10, sr_idx=sr_idx)
        assert mp3_info(data)[1] == sr


def test_silence_stream_decodes_with_side_digest():
    """r9: the zero-spectrum subset is REAL decodable Layer III —
    bit-exact side-info walk, exact silent PCM, closed-form digest."""
    from stockify_spark.llm.mp3 import decode_mp3, encode_mp3_silence

    gain = lambda j, g, c: (7 * j + 13 * g + 29 * c) % 256  # noqa: E731
    sel = lambda j, g, c: (j + g + c) % 2  # noqa: E731
    data = encode_mp3_silence([3, 5, 3, 8, 14, 1], sr_idx=1,
                              gain_fn=gain, count1_fn=sel)
    out = decode_mp3(data)
    assert out["n_frames"] == 6
    assert out["sample_rate"] == 48000
    assert out["channels"] == 2
    assert len(out["samples"]) == 6 * 1152
    assert all(s == 0 for s in out["samples"])
    expect = sum(
        gain(j, g, c) * (1 + 2 * g + c) + sel(j, g, c)
        for j in range(6) for g in range(2) for c in range(2)
    )
    assert out["side_digest"] == expect


def test_legacy_zero_filled_frames_also_decode():
    from stockify_spark.llm.mp3 import decode_mp3, encode_mp3_frames

    out = decode_mp3(encode_mp3_frames([5, 5, 5]))
    assert out["side_digest"] == 0 and len(out["samples"]) == 3 * 1152


def test_side_info_parse_is_bit_exact():
    """Every field round-trips through the writer/reader pair, and
    the reader consumes exactly 256 bits."""
    from stockify_spark.llm.mp3 import (
        _side_info_stereo,
        parse_side_info_stereo,
    )

    gains = [[200, 3], [77, 254]]
    sel = [[1, 0], [0, 1]]
    frame = b"\xff\xfb\x52\x00" + _side_info_stereo(gains, sel) + b"\x00" * 8
    info = parse_side_info_stereo(frame)
    assert info["main_data_begin"] == 0
    for g in range(2):
        for c in range(2):
            d = info["granules"][g][c]
            assert d["part2_3_length"] == 0
            assert d["global_gain"] == gains[g][c]
            assert d["count1table_select"] == sel[g][c]
            assert d["window_switching_flag"] == 0


def test_decode_refuses_main_data_and_reservoir():
    """The honest boundary: any granule with part2_3_length > 0, or a
    bit reservoir, raises instead of guessing."""
    import pytest

    from stockify_spark.llm.mp3 import SIDE_INFO_BYTES_STEREO, decode_mp3, encode_mp3_silence

    data = bytearray(encode_mp3_silence([5, 5]))
    # set gr0/ch0 part2_3_length's top bit: side info starts at byte 4,
    # after main_data_begin(9)+private(3)+scfsi(8) = bit 20
    data[4 + 2] |= 0x08  # bit 20 of the side info region
    with pytest.raises(NotImplementedError, match="main data"):
        decode_mp3(bytes(data))
    data = bytearray(encode_mp3_silence([5, 5]))
    data[4] |= 0x80  # main_data_begin high bit
    with pytest.raises(NotImplementedError, match="reservoir"):
        decode_mp3(bytes(data))
    assert SIDE_INFO_BYTES_STEREO == 32


def test_decode_refuses_crc_protected_frames():
    """protection_bit=0 puts a 16-bit CRC before the side info; the
    decoder must refuse rather than parse every field 2 bytes early
    (r9 review finding)."""
    import pytest

    from stockify_spark.llm.mp3 import decode_mp3, encode_mp3_silence

    data = bytearray(encode_mp3_silence([5, 5]))
    data[1] &= 0xFE  # clear protection_bit -> CRC present
    with pytest.raises(NotImplementedError, match="CRC"):
        decode_mp3(bytes(data))


def test_bitwriter_rejects_out_of_range_fields():
    import pytest

    from stockify_spark.llm.mp3 import encode_mp3_silence

    with pytest.raises(ValueError, match="does not fit"):
        encode_mp3_silence([5], gain_fn=lambda j, g, c: 256)
