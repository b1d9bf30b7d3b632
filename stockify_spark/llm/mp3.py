"""Pure-Python MP3 (MPEG-1 Audio Layer III) frame-level parser —
stdlib only.

The audio twin of the container probes in llm/avi.py / llm/mp4.py:
an MP3 file is a bare sequence of frames, each starting with a
4-byte header (11-bit sync + version/layer/bitrate/samplerate/
padding fields, ISO/IEC 11172-3) whose byte length is computable
from the header alone::

    frame_bytes = 144 * bitrate / sample_rate + padding   (Layer III)

so a single header walk yields the frame index, duration, and
CBR/VBR classification without touching any audio payload — the
filter-before-decode contract for compressed audio, where a corpus
router reads O(headers) of a multi-hour file.

Scope: frame HEADERS and structure only. Actual sample
reconstruction (huffman + scalefactors + IMDCT + synthesis
polyphase) genuinely needs a full psychoacoustic decoder and raises
NotImplementedError — the honest-boundary policy of
llm/multimodal.py unchanged. The writer emits structurally valid
frames (correct headers, correct lengths, zeroed main data) so
container-level tests and oracles run on real structure; it makes
no claim the payload is decodable audio.
"""

from __future__ import annotations

import struct

# MPEG-1 Layer III tables (ISO 11172-3): bitrate index → kbit/s,
# sample-rate index → Hz.
BITRATES_KBPS = (0, 32, 40, 48, 56, 64, 80, 96, 112, 128, 160, 192, 224, 256, 320)
SAMPLE_RATES = (44100, 48000, 32000)

SAMPLES_PER_FRAME = 1152  # MPEG-1 Layer III


def frame_length(bitrate_kbps: int, sample_rate: int, padding: int) -> int:
    return (144 * bitrate_kbps * 1000) // sample_rate + padding


def _header(bitrate_idx: int, sr_idx: int, padding: int) -> bytes:
    """MPEG-1 Layer III header: sync=0x7FF, version=11 (MPEG-1),
    layer=01 (III), no CRC, stereo."""
    b0 = 0xFF
    b1 = 0xFB  # sync tail + MPEG-1 + Layer III + no-CRC
    b2 = (bitrate_idx << 4) | (sr_idx << 2) | (padding << 1)
    b3 = 0x00  # stereo, no mode extension/copyright/original
    return bytes([b0, b1, b2, b3])


def encode_mp3_frames(
    bitrate_indices: list[int], sr_idx: int = 0
) -> bytes:
    """Emit one structurally valid frame per bitrate index (zeroed
    main data). Mixed indices produce a VBR stream; identical ones a
    CBR stream. No audio claim — see module docstring."""
    sr = SAMPLE_RATES[sr_idx]
    out = bytearray()
    for i, bi in enumerate(bitrate_indices):
        if not 1 <= bi <= 14:
            raise ValueError(f"bitrate index {bi} out of range 1..14")
        padding = i % 2  # exercise the padding-bit length variation
        n = frame_length(BITRATES_KBPS[bi], sr, padding)
        out += _header(bi, sr_idx, padding)
        out += b"\x00" * (n - 4)
    return bytes(out)


def parse_frames(data: bytes) -> list[tuple[int, int, int]]:
    """Walk the frame sequence: [(offset, frame_bytes, bitrate_kbps)].
    Tolerates an ID3v2 prefix (tag length from its syncsafe header)
    and stops at trailing garbage that is not a valid header."""
    try:
        return _parse_frames_unchecked(data)
    except (struct.error, IndexError, OverflowError) as exc:
        raise ValueError(f"corrupt MP3: {exc!r}") from exc


def _parse_frames_unchecked(data: bytes) -> list[tuple[int, int, int]]:
    data = bytes(data)
    pos = 0
    if data[:3] == b"ID3" and len(data) >= 10:
        syncsafe = data[6:10]
        tag_len = (
            (syncsafe[0] << 21) | (syncsafe[1] << 14) | (syncsafe[2] << 7) | syncsafe[3]
        )
        pos = 10 + tag_len
    frames = []
    while pos + 4 <= len(data):
        b0, b1, b2, _b3 = data[pos : pos + 4]
        if b0 != 0xFF or (b1 & 0xE0) != 0xE0:
            break  # lost sync: end of frame sequence
        version = (b1 >> 3) & 0x3
        layer = (b1 >> 1) & 0x3
        if version != 0b11 or layer != 0b01:
            raise NotImplementedError(
                "only MPEG-1 Layer III frame headers are parsed"
            )
        bitrate_idx = b2 >> 4
        sr_idx = (b2 >> 2) & 0x3
        padding = (b2 >> 1) & 0x1
        if bitrate_idx in (0, 15) or sr_idx == 3:
            raise ValueError(f"corrupt MP3: reserved header field at {pos}")
        n = frame_length(BITRATES_KBPS[bitrate_idx], SAMPLE_RATES[sr_idx], padding)
        if pos + n > len(data):
            break  # truncated final frame
        frames.append((pos, n, BITRATES_KBPS[bitrate_idx]))
        pos += n
    if not frames:
        raise ValueError("not an MP3: no valid MPEG-1 Layer III frame")
    return frames


def mp3_info(data: bytes) -> tuple[int, int, int, int, bool]:
    """(n_frames, sample_rate, duration_ms, mean_bitrate_kbps, is_vbr)
    from one header walk — no payload access. duration is
    n_frames·1152/rate, the exact figure players derive the same
    way."""
    data = bytes(data)
    frames = parse_frames(data)
    first = frames[0][0]
    b2 = data[first + 2]
    sr = SAMPLE_RATES[(b2 >> 2) & 0x3]
    rates = [kbps for _, _, kbps in frames]
    duration_ms = len(frames) * SAMPLES_PER_FRAME * 1000 // sr
    mean = sum(rates) // len(rates)
    return len(frames), sr, duration_ms, mean, len(set(rates)) > 1


def decode_mp3(data: bytes):
    """Sample reconstruction is out of scope — a Layer III decoder
    needs huffman tables, scalefactor logic, IMDCT and the synthesis
    filterbank; stub policy per llm/multimodal.py."""
    raise NotImplementedError(
        "MP3 sample decode needs a full Layer III decoder; only frame-level"
        " parsing (llm/mp3.mp3_info, parse_frames) is implemented"
    )
