"""Scan-parallelism helper for map-heavy operators.

A small or single-file parquet scan (single row group — byte-range
splitting cannot parallelize it) arrives in fewer partitions than the
session has slots, which serializes any expensive map pass that runs
BEFORE the operator's first shuffle. These operators call
:func:`spread_small_scan` at their input boundary: a conditional
round-robin repartition that is a NO-OP whenever the input already
has at least slot-count partitions — i.e., always at warehouse scale,
where inputs arrive in thousands of splits and adding a corpus-sized
shuffle would be a defect. The condition, not the repartition, is the
design: pay one small-table shuffle to engage all cores at bench
scale, add zero exchanges at 100 TB.

Measured boundary (r11, sf0.1): this pays ONLY where the serial map
pass dwarfs the repartition — the substring-dedup family's
interpreted per-position slice+hash (4.5s -> 1.7s). For cheap
whole-stage-codegen token explodes (perplexity, DSIR, ngram LM, BPE
word counts) the added shuffle plus lost scan fusion made queries
10-30% SLOWER, so those call sites deliberately do NOT spread.
Measure before adding a call site.
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def spread_small_scan(df: DataFrame) -> DataFrame:
    """Repartition ``df`` to the session's default parallelism ONLY
    when it currently has fewer partitions than that (see module
    docstring). Safe anywhere a row-wise map pass follows."""
    try:
        # sparkContext/.rdd are unsupported on Spark Connect sessions
        # — degrade to a no-op there rather than crash the operator
        sc = df.sparkSession.sparkContext
        n = df.rdd.getNumPartitions()
    except Exception:
        return df
    if n < sc.defaultParallelism:
        return df.repartition(sc.defaultParallelism)
    return df
