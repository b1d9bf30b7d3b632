"""Oracle-vs-Spark column TYPE agreement for every registered query.

r8 verdict #2: a DuckDB oracle column typed DECIMAL (e.g. a bare
``0.5 AS x`` literal) where Spark emits DOUBLE can repr-mismatch
through the driver's value hash. This pins type-kind agreement for
ALL 387 pairs without executing a single query: DuckDB ``DESCRIBE``
plans the oracle, Spark's lazy schema types the DataFrame
(tools/type_audit.py holds the kind collapse)."""

from __future__ import annotations

import sys

sys.path.insert(0, "/root/repo/tools")


def test_all_oracles_type_agree_with_spark(spark):
    from type_audit import audit

    mismatches = audit()
    assert not mismatches, "\n".join(
        f"{n}.{c}: {why}" for n, c, why in mismatches
    )
