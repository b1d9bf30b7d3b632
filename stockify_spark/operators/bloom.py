"""Bloom-filter join pruning — the shuffle-avoidance pattern for
semi-joins whose build side is too big to broadcast as an exact set
but whose MEMBERSHIP fits in a few KiB of bits.

At 100 TB the expensive part of ``fact ⋉ dim`` is shuffling the fact
table; a Bloom filter built from the dim keys and broadcast to every
scan task discards the vast majority of non-matching fact rows
MAP-SIDE, before the shuffle, at the cost of a bounded
false-positive rate that a final exact semi-join removes. Spark's
own runtime row-group filters (InjectRuntimeFilter) apply the same
idea inside Catalyst; this operator makes it explicit, sizable, and
usable on any column expression.

The reference engine has no join surface at all (SURVEY §2/§4);
this belongs to the warehouse-scale operator family the north star
mandates.

Everything is JVM-side column arithmetic: ``xxhash64`` for the k
probes (seed folded in as an extra hashed column), a ``bit_or``
aggregate packs the bit positions into ``m/64`` longs, and the
bitmap rides into the probe expression as an array literal — no
Python in the hot path, and the only driver materialization is the
bitmap itself (bounded model state: 8 KiB at m=2^16).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _positions(col, m_bits: int, k: int) -> list[Column]:
    """k bit positions for one key: xxhash64 over (key, seed_i).
    Folding the seed in as a second hashed column gives k independent
    hash functions from the one primitive (the standard
    Kirsch-Mitzenmacher-style derivation)."""
    return [
        F.pmod(F.xxhash64(col, F.lit(i)), F.lit(m_bits)).cast("long")
        for i in range(k)
    ]


def bloom_build(df: DataFrame, col, m_bits: int = 1 << 16, k: int = 3) -> list[int]:
    """Build the bitmap distributed: explode each key to its k bit
    positions, pack per 64-bit word with ``bit_or`` (map-side partial
    aggregation makes the shuffle at most m/64 rows per task), and
    collect the <= m/64 (word, bits) rows. Returns the dense bitmap
    as a list of m/64 Python ints."""
    c = F.col(col) if isinstance(col, str) else col
    words = (
        df.select(F.explode(F.array(*_positions(c, m_bits, k))).alias("_pos"))
        .select(
            (F.col("_pos") / 64).cast("long").alias("_word"),
            # shiftleft's python wrapper only takes a literal shift;
            # the SQL function takes any expression
            F.expr("shiftleft(CAST(1 AS BIGINT), CAST(_pos % 64 AS INT))").alias(
                "_bit"
            ),
        )
        .groupBy("_word")
        .agg(F.bit_or("_bit").alias("_bits"))
        .collect()
    )
    bitmap = [0] * (m_bits // 64)
    for r in words:
        bitmap[r["_word"]] = r["_bits"]
    return bitmap


def bloom_might_contain(
    bitmap: list[int], col, m_bits: int = 1 << 16, k: int = 3
) -> Column:
    """Probe expression: true iff all k bits are set. The bitmap is
    inlined as an array<long> literal (the broadcast — a driver
    constant every executor evaluates locally); each probe is two
    integer ops and an array index, fully codegen'd."""
    c = F.col(col) if isinstance(col, str) else col
    # one true array Literal — NOT F.array(*lits), whose CreateArray
    # node is a 1024-child expression tree that bloats codegen and
    # shows up as whole-plan compile+eval overhead
    arr = F.lit(bitmap).cast("array<long>")
    test = F.lit(True)
    for pos in _positions(c, m_bits, k):
        word = F.element_at(arr, ((pos / 64).cast("int") + 1))
        test = test & (F.getbit(word, (pos % 64).cast("int")) == 1)
    return test
