"""H.264 Annex-B probe tests (llm/h264.py): emulation-prevention
round-trip under fuzz, bit-exact SPS recovery including
non-multiple-of-16 cropping, NAL census, wire-level EP exercise
(slice stubs contain fake start codes by construction), and the
honest slice-decode boundary. The registry query's value-exactness
is covered by the differential gate (tools/check_oracle.py)."""

from __future__ import annotations

import random

import pytest

from stockify_spark.llm.h264 import (
    decode_h264,
    ebsp_to_rbsp,
    encode_h264_annexb,
    h264_probe,
    parse_sps,
    rbsp_to_ebsp,
)


def test_emulation_prevention_round_trip_fuzz():
    rnd = random.Random(7)
    for _ in range(2000):
        rbsp = bytes(
            rnd.choice([0, 0, 0, 1, 2, 3, 255]) for _ in range(rnd.randint(0, 40))
        )
        assert ebsp_to_rbsp(rbsp_to_ebsp(rbsp)) == rbsp
    # the EP'd wire form can never contain a start code or a bare
    # 00 00 00 run — that is the property EP exists to guarantee
    for _ in range(500):
        e = rbsp_to_ebsp(bytes(rnd.choice([0, 0, 0, 1]) for _ in range(60)))
        assert b"\x00\x00\x01" not in e and b"\x00\x00\x00" not in e


def test_probe_recovers_spec_and_exercises_ep():
    ep_on_wire = 0
    for w, h, ni, nn, p, lv in [
        (100, 60, 1, 0, 66, 30),  # cropped both dims, no non-IDR
        (112, 64, 3, 11, 77, 40),  # exact macroblock dims
        (1918, 1080, 2, 5, 66, 31),  # big + cropped width
    ]:
        data = encode_h264_annexb(w, h, ni, nn, p, lv)
        ep_on_wire += data.count(b"\x00\x00\x03")
        assert h264_probe(data) == {
            "width": w,
            "height": h,
            "profile_idc": p,
            "level_idc": lv,
            "n_nal": 2 + ni + nn,
            "n_idr": ni,
            "n_non_idr": nn,
        }
    # slice stubs embed fake start codes, so EP bytes MUST appear on
    # the wire — without stripping, the NAL walk would split mid-NAL
    assert ep_on_wire > 0


def test_sps_cropping_math():
    """A 100x60 frame stores 7x4 macroblocks (112x64) plus a crop
    rectangle in 2-pixel units; the parse must undo exactly that."""
    data = encode_h264_annexb(100, 60, 1, 0)
    nal_bodies = data.split(b"\x00\x00\x00\x01")
    sps_ebsp = nal_bodies[1][1:]  # first long-start NAL is the SPS
    info = parse_sps(ebsp_to_rbsp(sps_ebsp))
    assert (info["width"], info["height"]) == (100, 60)


def test_writer_rejects_odd_dims_and_high_profile():
    with pytest.raises(ValueError):
        encode_h264_annexb(101, 60, 1, 1)
    with pytest.raises(ValueError):
        encode_h264_annexb(100, 60, 1, 1, profile_idc=100)


def test_slice_decode_is_honest_boundary():
    with pytest.raises(NotImplementedError):
        decode_h264(encode_h264_annexb(112, 64, 1, 1))


def test_registry_query_executes(spark):
    from stockify_spark.registry import QUERIES

    rows = QUERIES["media_h264_probe"](spark, "/root/testdata/sf0.001").collect()
    assert len(rows) == 48
    by_id = {r.media_id: r for r in rows}
    assert by_id[0].profile_idc == 66 and by_id[1].profile_idc == 77
    # widths sweep even values, mostly not multiples of 16
    assert sum(1 for r in rows if r.width % 16 != 0) > 30
