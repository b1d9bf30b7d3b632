"""Vectorized grid rounding (_round_half_up_np) must be EXACTLY the
scalar shortest-decimal-string HALF_UP (_round_half_up) — the r11
verdict watch item: the PCA apply faces built one Decimal object per
output value; the numpy form is only admissible if bit-equal on the
reachable domain. These tests pin equality on the adversarial
boundary family (shortest repr above/below the binary half) and on
wide random sweeps, at both the 6dp apply grid and the 9dp model
grid.
"""

from __future__ import annotations

import numpy as np
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from stockify_spark.llm.pca import _round_half_up, _round_half_up_np

ADVERSARIAL = [
    # shortest decimal string sits ON the half boundary while the
    # binary double is below it — the case binary-value rounding gets
    # wrong and repr-based HALF_UP gets right
    1.0000005,
    -1.0000005,
    0.0000005,
    -0.0000005,
    2.5e-7,
    -2.5e-7,
    1.9999995,
    0.1234565,
    7.0000004999999995,
    123.45678949999,
    -123.45678949999,
    # exact representables around the grid
    0.0,
    -0.0,
    1.5e-6,
    -1.5e-6,
    1e-7,
    -1e-7,
    # magnitudes where ulp(x*1e6) crosses the old fixed band
    1234567.8901234,
    -987654321.123456,
    1e12 + 0.3333335,
    # subnormal-adjacent and tiny
    5e-324,
    1e-300,
    -1e-300,
    # large: spacing(y) > 1 — everything is on the grid already
    1e18,
    -1e18,
]


@pytest.mark.parametrize("nd", [6, 9])
def test_adversarial_boundaries_match_scalar(nd):
    got = _round_half_up_np(np.array(ADVERSARIAL), nd)
    want = [_round_half_up(v, nd) for v in ADVERSARIAL]
    assert got.tolist() == want


@pytest.mark.parametrize("nd", [6, 9])
def test_dense_half_boundary_sweep(nd):
    # every value of the form k/10^nd + 5/10^(nd+1) near the tie, for
    # k spanning sign and magnitude — the densest tie neighborhood
    ks = np.concatenate(
        [np.arange(-50, 51), np.arange(999950, 1000050), -np.arange(999950, 1000050)]
    )
    base = ks / (10.0 ** nd) + 5.0 / (10.0 ** (nd + 1))
    # nudge one ulp each way too: ties, just-below, just-above
    vals = np.concatenate([base, np.nextafter(base, -np.inf), np.nextafter(base, np.inf)])
    got = _round_half_up_np(vals, nd)
    want = [_round_half_up(float(v), nd) for v in vals]
    assert got.tolist() == want


@settings(max_examples=300, deadline=None)
@given(
    st.lists(
        st.floats(
            allow_nan=False, allow_infinity=False, min_value=-1e15, max_value=1e15
        ),
        min_size=1,
        max_size=50,
    ),
    st.sampled_from([6, 9]),
)
def test_random_floats_match_scalar(vals, nd):
    got = _round_half_up_np(np.array(vals, dtype=np.float64), nd)
    want = [_round_half_up(float(v), nd) for v in vals]
    assert got.tolist() == want


def test_shape_preserved_and_2d():
    a = np.array([[1.2345675, -1.2345665], [0.5e-6, 2.0]])
    got = _round_half_up_np(a, 6)
    assert got.shape == (2, 2)
    want = [[_round_half_up(float(v), 6) for v in row] for row in a]
    assert got.tolist() == want


def test_signed_zero_matches_scalar():
    """The Decimal form rounds tiny negatives to -0.0; the vector
    form must reproduce the SIGN bit (a '-0' vs '0' formatted-value
    difference otherwise)."""
    import math

    vals = [-1e-9, 1e-9, -0.0, 0.0, -4.9e-7, 4.9e-7, -1e-300]
    got = _round_half_up_np(np.array(vals), 6)
    for g, v in zip(got.tolist(), vals):
        w = _round_half_up(v, 6)
        assert g == w and math.copysign(1.0, g) == math.copysign(1.0, w), (v, g, w)
