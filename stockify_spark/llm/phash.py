"""Perceptual-hash (pHash) image dedup: DCT fingerprints over the
REAL PNG decode path, near-duplicate pairs via banded Hamming join.

The classic pHash pipeline (public domain — Zauner's 2010 thesis /
the pHash.org scheme): grayscale → 32×32 → 2-D DCT-II → keep the
top-left 8×8 low-frequency block → threshold each coefficient
against the block median → 64 bits. Two deliberate deviations, both
load-bearing for the differential oracle:

* the DC coefficient is EXCLUDED (63-bit hash). A uniform brightness
  shift adds a constant image, and the 2-D DCT of a constant is
  exactly one DC term — so with DC dropped, brightness variants hash
  IDENTICALLY by construction. That analytic invariance is what lets
  the oracle state the expected duplicate pairs in closed form
  instead of re-running a decoder.
* coefficients are rounded to 9 decimals before the median/threshold
  step. The invariance argument is exact in real arithmetic but the
  float64 matmul picks up ~1e-12 of non-linearity per coefficient;
  rounding far above the noise floor and far below coefficient scale
  (O(10..1000)) makes the brightness-variant hash equality hold in
  floats, not just on paper.

Scale shape (the SimHash playbook, llm/dedup.py): hashes are
computed map-only inside mapInPandas (Arrow batches, no shuffle),
then candidates come from a 4-band × ~16-bit pigeonhole equi-join —
any pair within Hamming distance ≤ 3 disagrees in at most 3 bands
and therefore agrees EXACTLY on at least one — followed by a
one-shuffle groupBy that dedups band collisions and carries both
hashes, and an exact popcount(xor) verify. No all-pairs comparison
at any stage; candidate volume is governed by band-bucket sizes,
the same at 60 images or 60 billion.

Reference parity: the reference engine (stockify.cu) has no media
surface; this extends SURVEY §7.6's multimodal mandate alongside
llm/multimodal.py.
"""

from __future__ import annotations

import hashlib

import numpy as np
from pyspark.sql import DataFrame, functions as F

PHASH_BITS = 63
PHASH_THRESHOLD = 3
# (shift, width): 4 bands cover bits 0..62; 3-band-disagreement bound
# needs BANDS > THRESHOLD, i.e. threshold ≤ 3 for 4 bands.
PHASH_BANDS = ((0, 16), (16, 16), (32, 16), (48, 15))


# ---------------------------------------------------------------------------
# fixture: seeded random images + provable brightness near-duplicates
# ---------------------------------------------------------------------------


def _pattern_pixels(i: int, seed: int = 77, w: int = 32, h: int = 32) -> np.ndarray:
    """Deterministic pseudorandom grayscale image from a blake2b
    counter stream (NOT the gradient pattern of llm/multimodal —
    gradients with different offsets are brightness shifts of each
    other mod 256 and would make every image a near-dup of every
    other). Values in [0, 200] so a +10 brightness variant never
    clips (clipping would break the constant-shift argument)."""
    raw = b"".join(
        hashlib.blake2b(f"{seed}:{i}:{blk}".encode(), digest_size=64).digest()
        for blk in range((w * h + 63) // 64)
    )
    a = np.frombuffer(raw, dtype=np.uint8)[: w * h].reshape(h, w)
    return (a % 201).astype(np.uint8)


def synthetic_phash_media(spark, n_base: int = 24, seed: int = 77) -> DataFrame:
    """n_base independent random images, each paired with a +10
    uniform-brightness variant at media_id + 1000. The expected
    near-duplicate set is EXACTLY {(i, i+1000)}: variants hash
    identically (DC-excluded pHash), and unrelated seeded-random
    images sit ~PHASH_BITS/2 bits apart (the probability two
    independent 63-bit sign patterns land within Hamming 3 is
    ~2^-44 — and the fixture is frozen by seed, so 'improbable'
    is actually 'fixed and verified by test')."""
    from stockify_spark.llm.png import encode_png

    rows = []
    for i in range(n_base):
        pix = _pattern_pixels(i, seed)
        rows.append((i, bytearray(encode_png(pix))))
        rows.append(
            (i + 1000, bytearray(encode_png((pix + 10).astype(np.uint8))))
        )
    return spark.createDataFrame(rows, "media_id long, content binary")


# ---------------------------------------------------------------------------
# hash
# ---------------------------------------------------------------------------

_DCT_CACHE: dict[int, np.ndarray] = {}


def _dct_matrix(n: int = 32) -> np.ndarray:
    """Orthonormal DCT-II matrix (built once per process; the hash
    runs inside executors, so the cache is per-worker)."""
    d = _DCT_CACHE.get(n)
    if d is None:
        k = np.arange(n)
        d = np.sqrt(2.0 / n) * np.cos(
            np.pi * (2 * k[None, :] + 1) * k[:, None] / (2 * n)
        )
        d[0, :] = np.sqrt(1.0 / n)
        _DCT_CACHE[n] = d
    return d


def phash63(pix: np.ndarray) -> int:
    """63-bit DCT perceptual hash of a grayscale image (any size;
    non-32×32 inputs are nearest-neighbor resized first)."""
    if pix.ndim == 3:  # RGB(A) → luma-ish mean; fixture is grayscale
        pix = pix[:, :, : min(3, pix.shape[2])].mean(axis=2)
    if pix.shape != (32, 32):
        from stockify_spark.llm.png import resize_nearest

        pix = resize_nearest(pix.astype(np.uint8), 32, 32)
    x = pix.astype(np.float64)
    d = _dct_matrix(32)
    coef = d @ x @ d.T
    block = np.round(coef[:8, :8].flatten()[1:], 9)  # drop DC, kill fp noise
    med = np.median(block)
    v = 0
    for bit in block > med:
        v = (v << 1) | int(bit)
    return v


# ---------------------------------------------------------------------------
# the operator
# ---------------------------------------------------------------------------


def phash_hashes(media: DataFrame) -> DataFrame:
    """(media_id, phash): real decode + DCT hash, map-only inside
    mapInPandas — Arrow batches in, one long per image out. The 63-bit
    value is non-negative, so bitwise ops downstream never meet the
    sign bit."""
    import pandas as pd

    def _hash(batches):
        from stockify_spark.llm.png import decode_png

        for pdf in batches:
            ids, hs = [], []
            for mid, content in zip(pdf["media_id"], pdf["content"]):
                ids.append(mid)
                hs.append(phash63(decode_png(bytes(content))))
            yield pd.DataFrame(
                {"media_id": ids, "phash": np.array(hs, dtype=np.int64)}
            )

    return media.mapInPandas(_hash, "media_id long, phash long")


def phash_dup_pairs(
    media: DataFrame, threshold: int = PHASH_THRESHOLD
) -> DataFrame:
    """Near-duplicate image pairs (id_a < id_b, Hamming ≤ threshold)
    via 4-band pigeonhole candidates + exact popcount verify. The
    groupBy on (id_a, id_b) does double duty — dedups pairs that
    collide in several bands AND carries both hashes to the verify —
    in ONE shuffle (the round-6 simhash lesson: dropDuplicates plus
    a re-join paid that shuffle twice)."""
    if threshold >= len(PHASH_BANDS):
        raise ValueError(
            f"threshold {threshold} needs > {threshold} bands for the "
            f"pigeonhole recall guarantee; have {len(PHASH_BANDS)}"
        )
    hashed = phash_hashes(media)
    bands = hashed.select(
        "media_id",
        "phash",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(i).alias("band_idx"),
                        (
                            F.shiftrightunsigned(F.col("phash"), shift)
                            % (1 << width)
                        ).alias("band_val"),
                    )
                    for i, (shift, width) in enumerate(PHASH_BANDS)
                ]
            )
        ).alias("b"),
    ).select("media_id", "phash", "b.band_idx", "b.band_val")
    a = bands.select(
        F.col("media_id").alias("id_a"),
        F.col("phash").alias("hash_a"),
        "band_idx",
        "band_val",
    )
    b = bands.select(
        F.col("media_id").alias("id_b"),
        F.col("phash").alias("hash_b"),
        "band_idx",
        "band_val",
    )
    cand = (
        a.join(b, ["band_idx", "band_val"])
        .filter(F.col("id_a") < F.col("id_b"))
        .groupBy("id_a", "id_b")
        .agg(F.first("hash_a").alias("hash_a"), F.first("hash_b").alias("hash_b"))
    )
    hamming = F.bit_count(F.col("hash_a").bitwiseXOR(F.col("hash_b")))
    return cand.filter(hamming <= threshold).select(
        "id_a", "id_b", hamming.cast("int").alias("hamming")
    )
